"""Collection-API overhead probe (round-2 VERDICT item #2).

Measures, at 1M x 768 on the active backend, warm per-batch time at the
four layers between the wire and the MXU:

  kernel        store.search(return_device=True) + block_until_ready
  store         store.search() with the single host sync
  arrays        Collection.search_arrays (adds lock, id gather, masking)
  api           Collection.search_batch (adds SearchResult assembly)

Every iteration uses DISTINCT query batches (the axon runtime dedups
identical dispatches — TECHNICAL_MANUAL section 2).  The reference's API
overhead is ~0 because hnswlib returns label arrays directly
(vectordb_optimized.py:610); the round-2 gap here was 6.4x
(crossover_exact_bf16_b1024 146 ms vs kernel 23 ms).
"""

import argparse
import json
import time

import numpy as np


def bench(fn, batches, iters):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(batches[i % len(batches)])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dims", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving config (compute+storage bfloat16, "
                         "topk auto) — the deployment default")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from fastpyvectordb_tpu import Collection, CollectionConfig

    rng = np.random.default_rng(7)
    kw = (dict(compute_dtype="bfloat16", storage_dtype="bfloat16",
               topk="auto") if args.bf16 else {})
    cfg = CollectionConfig(name="apiov", dimensions=args.dims,
                           metric="cosine", **kw)
    col = Collection(cfg)
    t0 = time.perf_counter()
    bs = 250_000
    for s in range(0, args.rows, bs):
        n = min(bs, args.rows - s)
        col.insert_batch(rng.standard_normal((n, args.dims), dtype=np.float32),
                         [f"v{s + i}" for i in range(n)])
    print(json.dumps({"exp": "setup", "rows": args.rows,
                      "platform": jax.devices()[0].platform,
                      "fill_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    store = col._store
    metric = col.config.metric

    for b in (1, 16, 64, 256, 1024):
        nb = max(4, min(args.iters, 8))
        host_batches = [
            rng.standard_normal((b, args.dims), dtype=np.float32)
            for _ in range(nb)]
        dev_batches = [jnp.asarray(x) for x in host_batches]
        row = {"exp": f"b{b}"}

        def kernel(q):
            v, r = store.search(q, 10, metric,
                                compute_dtype=col.config.compute_dtype,
                                topk=col.config.topk, return_device=True)
            # true barrier: block_until_ready is unreliable through the
            # axon tunnel (benchmarks/ivfg_pallas_lab.py)
            np.asarray(jax.device_get(v.ravel()[:1]))
        # warm (compile) then measure
        kernel(dev_batches[0])
        row["kernel_ms"] = round(bench(kernel, dev_batches, args.iters) * 1e3, 2)

        # pure host->device upload of the query block, in the dtype the
        # store actually ships (bf16 serving demotes on the host): this
        # attributes the store-vs-kernel gap to the transfer link, which
        # on a remote-attached chip (~30-45 MB/s tunnel) dominates — on
        # local PCIe the same transfer is sub-millisecond
        import ml_dtypes
        wire_dtype = (ml_dtypes.bfloat16
                      if col.config.compute_dtype == "bfloat16"
                      else np.float32)
        wire_batches = [x.astype(wire_dtype) for x in host_batches]

        def upload(x):
            d = jnp.asarray(x)
            np.asarray(jax.device_get(d.ravel()[:1]))
        upload(wire_batches[0])
        row["upload_ms"] = round(
            bench(upload, wire_batches, args.iters) * 1e3, 2)
        row["upload_mb"] = round(wire_batches[0].nbytes / 2**20, 3)

        def store_host(q):
            store.search(q, 10, metric,
                         compute_dtype=col.config.compute_dtype,
                         topk=col.config.topk)
        store_host(host_batches[0])
        row["store_ms"] = round(
            bench(store_host, host_batches, args.iters) * 1e3, 2)

        def arrays(q):
            col.search_arrays(q, 10)
        arrays(host_batches[0])
        row["arrays_ms"] = round(
            bench(arrays, host_batches, args.iters) * 1e3, 2)

        def api(q):
            col.search_batch(q, 10)
        api(host_batches[0])
        row["api_ms"] = round(bench(api, host_batches, args.iters) * 1e3, 2)

        row["api_over_kernel"] = round(row["api_ms"] / row["kernel_ms"], 2)
        row["api_qps"] = round(b / (row["api_ms"] / 1e3), 1)
        row["kernel_qps"] = round(b / (row["kernel_ms"] / 1e3), 1)

        # pipelined stream (round-4 verdict #5): depth-2 upload/compute
        # overlap; amortized per-batch over a longer stream so the fill
        # bubble washes out
        def stream_amortized(wire):
            stream_n = 3 * nb
            seq = [host_batches[i % nb] for i in range(stream_n)]
            g = col.search_arrays_stream(iter(seq), 10, wire_dtype=wire)
            next(g)  # warm-up: includes any remaining compile
            t0 = time.perf_counter()
            got = sum(1 for _ in g)
            return (time.perf_counter() - t0) / max(got, 1)

        row2 = {"exp": f"stream_b{b}"}
        row2["stream_ms"] = round(stream_amortized(None) * 1e3, 2)
        row2["stream_over_kernel"] = round(
            row2["stream_ms"] / row["kernel_ms"], 2)
        row2["stream_qps"] = round(b / (row2["stream_ms"] / 1e3), 1)
        row2["stream_int8_ms"] = round(stream_amortized("int8") * 1e3, 2)
        row2["stream_int8_over_kernel"] = round(
            row2["stream_int8_ms"] / row["kernel_ms"], 2)
        row2["stream_int8_qps"] = round(b / (row2["stream_int8_ms"] / 1e3), 1)
        # int8 query-wire fidelity: overlap@10 vs the default wire on the
        # same batch (one probe per batch size)
        _, _, r_ref = col.search_arrays(host_batches[0], 10)
        _, _, r_i8 = next(col.search_arrays_stream(
            iter([host_batches[0]]), 10, wire_dtype="int8"))
        row2["int8_wire_overlap_at_10"] = round(float(np.mean([
            len(set(a.tolist()) & set(e.tolist())) / 10
            for a, e in zip(r_i8, r_ref)])), 4)
        print(json.dumps(row2), flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
