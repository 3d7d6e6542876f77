"""TPU validation + microbenchmarks for the hot kernels.

Run on the real chip:  python benchmarks/tpu_validate.py
Prints one JSON line per experiment.

All timings use DISTINCT inputs per iteration — the runtime deduplicates
identical dispatches, which silently inflates repeated-args measurements.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K


def timed_distinct(fn, inputs):
    """Warm on inputs[0], then time fn over the remaining distinct inputs."""
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(inputs) - 1)


def qbatches(b, d, n_batches=7, seed=100):
    return [jax.random.normal(jax.random.PRNGKey(seed + i), (b, d),
                              dtype=jnp.float32) for i in range(n_batches)]


def main():
    key = jax.random.PRNGKey(0)
    n, d, b, k = 1_000_000, 768, 256, 10
    kv, _ = jax.random.split(key)
    v32 = jax.random.normal(kv, (n, d), dtype=jnp.float32)
    stats = K.corpus_stats(v32)
    sq_n, rinv = stats["sq"], stats["rinv"]
    v16 = v32.astype(jnp.bfloat16)
    mask = jnp.ones((n,), dtype=bool)
    qs256 = qbatches(256, d)

    # exact ground truth for recall measurements
    _, rows_exact = K.search_kernel(qs256[0][:64], v32, sq_n, rinv, mask,
                                    metric=DistanceMetric.COSINE, k=k,
                                    compute_dtype="float32")
    rows_exact = np.asarray(rows_exact)

    def recall(rows):
        rows = np.asarray(rows)[:64]
        return float(np.mean([len(set(a.tolist()) & set(e.tolist())) / k
                              for a, e in zip(rows, rows_exact)]))

    # 1) bf16 paths
    for approx in (False, True):
        f = lambda qq: K.search_kernel(qq, v16, sq_n, rinv, mask,
                                       metric=DistanceMetric.COSINE, k=k,
                                       compute_dtype="bfloat16",
                                       approx=approx)
        dt = timed_distinct(f, qs256)
        out = f(qs256[0])
        print(json.dumps({
            "exp": f"bf16_{'approx' if approx else 'exact'}_topk_b256",
            "ms": round(dt * 1e3, 3), "qps": round(256 / dt, 1),
            "recall": recall(out[1])}))
    fa = lambda qq: K.search_kernel(qq, v16, sq_n, rinv, mask,
                                    metric=DistanceMetric.COSINE, k=k,
                                    compute_dtype="bfloat16", approx=True)
    dt = timed_distinct(fa, qbatches(1024, d))
    print(json.dumps({"exp": "bf16_approx_topk_b1024",
                      "ms": round(dt * 1e3, 3), "qps": round(1024 / dt, 1)}))

    # 2) end-to-end fused quantized search (QuantizedScan) at 1M.
    # Clustered corpus: quantizers exploit structure; pure Gaussian noise is
    # the degenerate worst case (the reference's own recall claims are on
    # structured data, README.md:504-508).
    from fastpyvectordb_tpu import Collection, CollectionConfig
    from fastpyvectordb_tpu.quant.scan import QuantizedScan

    kc, kq2 = jax.random.split(kv)
    centers = jax.random.normal(kc, (1024, d), dtype=jnp.float32) * 2.0
    assign_c = jax.random.randint(kq2, (n,), 0, 1024)
    vc = centers[assign_c] + jax.random.normal(kv, (n, d), dtype=jnp.float32)
    cstats = K.corpus_stats(vc)

    col = Collection(CollectionConfig(name="q", dimensions=d,
                                      metric="cosine",
                                      compute_dtype="bfloat16"))
    # build the store from the device corpus without a host round-trip
    import fastpyvectordb_tpu.core.store as store_mod
    st = store_mod.DeviceVectorStore(d, capacity=n)
    st.vectors = vc
    st.valid = mask
    st.sq, st.rinv = cstats["sq"], cstats["rinv"]
    st.count = st.n_valid = n
    col._store = st
    col._row_to_id = [str(i) for i in range(n)]
    col._id_to_row = {}
    col._metadata = [None] * n

    # clustered queries + exact ground truth on the clustered corpus
    cq = centers[jax.random.randint(kq2, (256,), 0, 1024)] + \
        jax.random.normal(kq2, (256, d), dtype=jnp.float32)
    _, rows_exact_c = K.search_kernel(cq[:64], vc, cstats["sq"],
                                      cstats["rinv"], mask,
                                      metric=DistanceMetric.COSINE, k=k,
                                      compute_dtype="float32")
    rows_exact_c = np.asarray(rows_exact_c)

    def recall_c(rows):
        rows = np.asarray(rows)[:64]
        return float(np.mean([len(set(a.tolist()) & set(e.tolist())) / k
                              for a, e in zip(rows, rows_exact_c)]))

    npq = [np.asarray(q) for q in qbatches(256, d, seed=500)]
    npq = [np.asarray(centers[jax.random.randint(
        jax.random.PRNGKey(600 + i), (256,), 0, 1024)]) + q * 0.5
        for i, q in enumerate(npq)]
    npq[0][:64] = np.asarray(cq[:64])

    scan = QuantizedScan.build(col, kind="int8")
    f = lambda qq: scan.search(qq, k=10, rerank=4)
    dt = timed_distinct(f, npq)
    d_, r_ = scan.search(npq[0][:64], k=10, rerank=4)
    print(json.dumps({"exp": "int8_fused_2stage_1M_b256",
                      "ms": round(dt * 1e3, 3), "qps": round(256 / dt, 1),
                      "recall": recall_c(r_)}))

    # 3) binary fused 2-stage at 1M
    scan_b = QuantizedScan.build(col, kind="binary")
    f = lambda qq: scan_b.search(qq, k=10, rerank=16)
    dt = timed_distinct(f, npq)
    d_, r_ = scan_b.search(npq[0][:64], k=10, rerank=16)
    print(json.dumps({"exp": "binary_fused_2stage_1M_b256",
                      "ms": round(dt * 1e3, 3), "qps": round(256 / dt, 1),
                      "recall": recall_c(r_)}))


if __name__ == "__main__":
    main()
