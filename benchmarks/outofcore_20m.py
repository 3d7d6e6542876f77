"""Out-of-core validation at >HBM scale (round-1 verdict item 9).

20M x 768 f32 = 57.2 GB — ~3.6x the chip's 16 GB HBM — streamed from host
RAM through OutOfCoreSearcher's tile pipeline with a running device top-k.
Measures end-to-end QPS and verifies correctness on planted exact-match
queries (the global argmin must be found regardless of which tile holds it).

Usage: python benchmarks/outofcore_20m.py [--rows 20000000] [--batch 64]
"""

import argparse
import json
import sys
import time

import jax
if "--cpu" in sys.argv:  # must precede backend init (sitecustomize
    jax.config.update("jax_platforms", "cpu")  # forces axon otherwise)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from fastpyvectordb_tpu.core.outofcore import OutOfCoreSearcher


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--tile", type=int, default=1_048_576)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--big", action="store_true",
                    help="run the BigCollection 10M part instead")
    ap.add_argument("--memmap", default="/tmp/ooc_corpus.f32",
                    help="disk-backed corpus path (round-2 verdict item 7: "
                         "bound host RSS to the tile window); '' keeps the "
                         "corpus in host RAM")
    ap.add_argument("--scans", type=int, default=4,
                    help="warm timed scans (first is warmup)")
    ap.add_argument("--codec", default="",
                    help="stream QUANTIZED codes instead of f32/bf16 tiles "
                         "(int8 = 4x less transfer, binary = 32x) with an "
                         "exact host re-rank — QuantizedOutOfCoreSearcher")
    ap.add_argument("--rerank", type=int, default=32)
    ap.add_argument("--recall-vs-exact", action="store_true",
                    help="also run one exact streamed pass for recall@k")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-init above)")
    args = ap.parse_args()
    if args.big:
        bigcollection(batch=args.batch, k=args.k)
        return
    n, d, b = args.rows, args.dims, args.batch

    emit(exp="setup", rows=n, dims=d, batch=b, tile=args.tile,
         corpus_gb=round(n * d * 4 / 2**30, 1),
         backing="memmap" if args.memmap else "ram")
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    if args.memmap:
        import os
        if (os.path.exists(args.memmap)
                and os.path.getsize(args.memmap) == n * d * 4):
            corpus = np.memmap(args.memmap, np.float32, "r", shape=(n, d))
            emit(exp="corpus_reused", path=args.memmap)
        else:
            corpus = np.memmap(args.memmap, np.float32, "w+", shape=(n, d))
            for s in range(0, n, 1_000_000):
                e = min(s + 1_000_000, n)
                x = rng.standard_normal((e - s, d)).astype(np.float32)
                corpus[s:e] = x / np.linalg.norm(x, axis=1, keepdims=True)
            corpus.flush()
            emit(exp="corpus_built", s=round(time.perf_counter() - t0, 1))
            # reopen read-only: dirty w+ pages would pin RSS until flushed
            corpus = np.memmap(args.memmap, np.float32, "r", shape=(n, d))
    else:
        corpus = np.empty((n, d), np.float32)
        for s in range(0, n, 1_000_000):
            e = min(s + 1_000_000, n)
            x = rng.standard_normal((e - s, d)).astype(np.float32)
            corpus[s:e] = x / np.linalg.norm(x, axis=1, keepdims=True)
        emit(exp="corpus_built", s=round(time.perf_counter() - t0, 1))

    if args.codec:
        from fastpyvectordb_tpu.core.outofcore import (
            QuantizedOutOfCoreSearcher,
        )
        codes_path = (args.memmap + f".{args.codec}.npy"
                      if args.memmap else None)
        t0 = time.perf_counter()
        searcher = QuantizedOutOfCoreSearcher(
            corpus, metric="cosine", codec=args.codec,
            tile_rows=args.tile, rerank=args.rerank,
            codes_path=codes_path, codes_reuse=True)
        bytes_per_row = (d if args.codec == "int8"
                         else searcher._pq_m if args.codec == "pq"
                         else (d + 7) // 8)
        emit(exp="codes_encoded", s=round(time.perf_counter() - t0, 1),
             codec=args.codec,
             codes_gb=round(n * bytes_per_row / 2**30, 2),
             stream_ratio_vs_f32=round(4 * d / bytes_per_row, 1))
    else:
        searcher = OutOfCoreSearcher(corpus, metric="cosine",
                                     tile_rows=args.tile,
                                     compute_dtype="bfloat16")

    # correctness: plant queries equal to rows spread across tiles
    planted = np.linspace(0, n - 1, b, dtype=np.int64)
    qexact = corpus[planted]
    t0 = time.perf_counter()
    vals, rows = searcher.search(qexact, k=args.k)
    dt_first = time.perf_counter() - t0
    hit = float(np.mean(rows[:, 0] == planted))
    emit(exp="planted_exact_match", top1_hit_rate=hit,
         first_pass_s=round(dt_first, 1))

    # throughput: distinct random batches (runtime dedups identical work),
    # one JSON row PER SCAN with anonymous-RSS so retention regressions
    # show up as a slope, not just a final max (round-2 verdict item 7:
    # two 20M attempts host-OOMed in the warm pass; the fix must show
    # flat RSS across >=3 scans)
    def rss_gb():
        anon = total = 0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    total = int(line.split()[1]) / 2**20
                elif line.startswith("RssAnon:"):
                    anon = int(line.split()[1]) / 2**20
        return round(anon, 2), round(total, 2)

    scans = max(args.scans, 2)
    batches = [rng.standard_normal((b, d)).astype(np.float32)
               for _ in range(scans)]
    dts = []
    for i, q in enumerate(batches):
        t0 = time.perf_counter()
        searcher.search(q, k=args.k)
        dt = time.perf_counter() - t0
        anon, total = rss_gb()
        emit(exp=f"scan{i}{'_warmup' if i == 0 else ''}",
             s=round(dt, 1), rss_anon_gb=anon, rss_total_gb=total)
        if i > 0:
            dts.append(dt)
    dt = sum(dts) / len(dts)
    rows_per_s = n / dt
    tag = f"_{args.codec}" if args.codec else ""
    stream_bytes = (n * d if args.codec == "int8"
                    else n * ((d + 7) // 8) if args.codec == "binary"
                    else n * searcher._pq_m if args.codec == "pq"
                    else n * d * 2)  # bf16 wire
    emit(exp=f"outofcore_search{tag}_{n // 1_000_000}Mx{d}",
         s_per_batch=round(dt, 2),
         qps=round(b / dt, 2),
         host_to_device_gbps=round(stream_bytes / dt / 2**30, 3),
         rows_per_s_m=round(rows_per_s / 1e6, 3))

    if args.codec and args.recall_vs_exact:
        q = batches[-1]
        vals, rows = searcher.search(q, k=args.k)
        ex = OutOfCoreSearcher(corpus, metric="cosine",
                               tile_rows=args.tile,
                               compute_dtype="bfloat16")
        _, erows = ex.search(q, k=args.k)
        rec = np.mean([len(set(a) & set(bb)) / args.k
                       for a, bb in zip(rows.tolist(), erows.tolist())])
        emit(exp=f"outofcore_recall{tag}", recall_at_k=round(float(rec), 4),
             k=args.k, rerank=args.rerank)




def bigcollection(rows=10_000_000, dims=768, batch=64, k=10):
    """BigCollection at 10M x 768 (28.6 GB f32 host + 2.9 GB device codes):
    device binary coarse scan over ALL rows -> host gather of candidates ->
    exact re-rank.  Usage: python outofcore_20m.py --big"""
    import numpy as np
    from fastpyvectordb_tpu.core.bigcollection import BigCollection
    emit(exp="bigcollection_setup", rows=rows, dims=dims,
         host_gb=round(rows * dims * 4 / 2**30, 1))
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    big = BigCollection(dims=dims, metric="cosine", codec="binary",
                        rerank=64)
    tile = min(500_000, rows)
    for s in range(0, rows, tile):
        x = rng.standard_normal((tile, dims)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        big.insert_batch(x, [f"v{s + i}" for i in range(tile)])
        if (s // tile) % 4 == 0:
            print(f"\r  ingested {s + tile:,}/{rows:,}", end="", flush=True)
    print()
    emit(exp="bigcollection_ingest", s=round(time.perf_counter() - t0, 1),
         rows_per_s=round(rows / (time.perf_counter() - t0), 1))

    # planted correctness: exact rows must surface as top-1
    idx = np.linspace(0, rows - 1, 16, dtype=np.int64)
    planted = np.stack([np.asarray(big._vectors[i]) for i in idx])
    res = big.search_batch(planted, k=3)
    hit = float(np.mean([r[0].id == f"v{i}" for r, i in zip(res, idx)]))
    emit(exp="bigcollection_planted_top1", hit_rate=hit)

    reps = 5
    batches = [rng.standard_normal((batch, dims)).astype(np.float32)
               for _ in range(reps)]
    big.search_batch(batches[0], k=k)
    t0 = time.perf_counter()
    for q in batches[1:]:
        big.search_batch(q, k=k)
    dt = (time.perf_counter() - t0) / (reps - 1)
    emit(exp=f"bigcollection_search_{rows//10**6}Mx{dims}",
         ms=round(dt * 1e3, 2), qps=round(batch / dt, 1))


if __name__ == "__main__":
    main()
