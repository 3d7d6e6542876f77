"""Serving-layer load benchmark (VERDICT round-1 item 6).

Boots the aiohttp server in-process over a corpus on the active backend
(real TPU under axon, CPU with --cpu), then drives /search with N
concurrent httpx clients sending DISTINCT query vectors (the axon runtime
dedups identical dispatches).  Reports server-level QPS / p50 / p99 for:

  * sequential single-query calls (the 25 ms/call dispatch-bound floor)
  * concurrent singles through the QueryBatcher (coalesced into batched
    TPU dispatches transparently)
  * client-side search/batch calls (the explicit batch ceiling)

Reference number to beat: 8,498 QPS hnswlib serving (notes_benchmark.txt:31).
"""

import argparse
import asyncio
import json
import socket
import threading
import time

import numpy as np


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class ServerThread:
    def __init__(self, tmp="/tmp/srv_load"):
        from aiohttp import web
        from fastpyvectordb_tpu.server.app import create_app
        self.port = free_port()
        self.loop = asyncio.new_event_loop()
        self.started = threading.Event()

        def run():
            asyncio.set_event_loop(self.loop)
            app = create_app(db_path=tmp, embedding_provider="hashing",
                             graph_path=tmp + "_graph")
            self.app = app
            runner = web.AppRunner(app)
            self.loop.run_until_complete(runner.setup())
            site = web.TCPSite(runner, "127.0.0.1", self.port)
            self.loop.run_until_complete(site.start())
            self.started.set()
            self.loop.run_forever()

        self.thread = threading.Thread(target=run, daemon=True)
        self.thread.start()
        assert self.started.wait(30)


async def drive_concurrent(base, queries, concurrency, k):
    """N workers, each sending its slice of distinct queries serially."""
    import httpx
    lat = []
    done = [0]

    async def worker(wq):
        async with httpx.AsyncClient(base_url=base, timeout=120) as c:
            for q in wq:
                t0 = time.perf_counter()
                r = await c.post("/collections/load/search",
                                 json={"vector": q.tolist(), "k": k})
                r.raise_for_status()
                lat.append(time.perf_counter() - t0)
                done[0] += 1

    per = len(queries) // concurrency
    slices = [queries[i * per:(i + 1) * per] for i in range(concurrency)]
    t0 = time.perf_counter()
    await asyncio.gather(*[worker(s) for s in slices])
    wall = time.perf_counter() - t0
    arr = np.asarray(sorted(lat))
    return {"qps": round(done[0] / wall, 1),
            "p50_ms": round(float(arr[len(arr) // 2]) * 1e3, 2),
            "p99_ms": round(float(arr[int(len(arr) * 0.99)]) * 1e3, 2),
            "n": done[0]}


async def drive_batched(base, queries, batch, k):
    import httpx
    t0 = time.perf_counter()
    total = 0
    async with httpx.AsyncClient(base_url=base, timeout=300) as c:
        for s in range(0, len(queries), batch):
            chunk = queries[s: s + batch]
            r = await c.post("/collections/load/search/batch",
                             json={"vectors": [q.tolist() for q in chunk],
                                   "k": k})
            r.raise_for_status()
            total += len(chunk)
    wall = time.perf_counter() - t0
    return {"qps": round(total / wall, 1), "n": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import httpx
    srv = ServerThread()
    base = f"http://127.0.0.1:{srv.port}"
    rng = np.random.default_rng(0)

    print(json.dumps({"exp": "setup", "rows": args.rows, "dims": args.dims,
                      "platform": jax.devices()[0].platform}), flush=True)
    httpx.post(f"{base}/collections",
               json={"name": "load", "dimensions": args.dims,
                     "metric": "cosine"}, timeout=60).raise_for_status()
    # measure API-path ingest on a slice (JSON-bound), then bulk-fill the
    # rest in-process — this benchmark targets SEARCH serving, and 1M rows
    # of 768-d JSON would dominate the run without informing it
    api_rows = min(20_000, args.rows)
    vecs = rng.standard_normal((api_rows, args.dims)).astype(np.float32)
    t0 = time.perf_counter()
    # chunked: 20k x 768-d rows are ~300 MB of JSON, over the server's
    # 256 MB request cap (app.py client_max_size)
    with httpx.Client(base_url=base, timeout=600) as c:
        for s in range(0, api_rows, 5000):
            e = min(s + 5000, api_rows)
            r = c.post("/collections/load/vectors/batch",
                       json={"vectors": vecs[s:e].tolist(),
                             "ids": [f"v{i}" for i in range(s, e)]})
            r.raise_for_status()
    print(json.dumps({"exp": "api_ingest",
                      "rows": api_rows,
                      "rows_per_s": round(api_rows
                                          / (time.perf_counter() - t0), 1)}),
          flush=True)
    col = srv.app["state"]["db"].get_collection("load")
    t0 = time.perf_counter()
    inserted = api_rows
    while inserted < args.rows:
        n = min(250_000, args.rows - inserted)
        block = rng.standard_normal((n, args.dims)).astype(np.float32)
        col.insert_batch(block, [f"v{inserted + i}" for i in range(n)])
        inserted += n
        print(f"\r  filled {inserted:,}/{args.rows:,} "
              f"({(inserted - api_rows)/(time.perf_counter()-t0):,.0f}/s)",
              end="", flush=True)
    print()

    queries = [rng.standard_normal(args.dims).astype(np.float32)
               for _ in range(args.queries)]

    # warmup (compile): cover the coalesced-batch pow2 buckets so the
    # measured pass never hits a fresh XLA compile mid-flight
    for conc in (1, 4, 16, 64):
        asyncio.run(drive_concurrent(base, queries[: 2 * conc], conc, args.k))

    out = {"exp": "sequential_singles",
           **asyncio.run(drive_concurrent(base, queries[:256], 1, args.k))}
    print(json.dumps(out), flush=True)
    seq_qps = out["qps"]

    for conc in (16, 64, 128):
        asyncio.run(drive_concurrent(base, queries[: 4 * conc], conc,
                                     args.k))  # bucket warmup
        out = {"exp": f"concurrent_singles_c{conc}",
               **asyncio.run(drive_concurrent(base, queries, conc, args.k))}
        out["vs_sequential"] = round(out["qps"] / max(seq_qps, 1e-9), 2)
        print(json.dumps(out), flush=True)

    out = {"exp": "client_batched_b256",
           **asyncio.run(drive_batched(base, queries, 256, args.k))}
    out["vs_sequential"] = round(out["qps"] / max(seq_qps, 1e-9), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
