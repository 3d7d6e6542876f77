"""TPU validation + microbenchmarks for the hot kernels.

Run on the real chip:  python benchmarks/tpu_validate.py
Prints one JSON line per experiment.  Used to pick bench.py's configuration
and to validate the Pallas paths compile + agree with the XLA reference
paths on hardware.
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


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    key = jax.random.PRNGKey(0)
    n, d, b, k = 1_000_000, 768, 256, 10
    kv, kq = jax.random.split(key)
    v32 = jax.random.normal(kv, (n, d), dtype=jnp.float32)
    stats = K.corpus_stats(v32)
    sq_n, rinv = stats["sq"], stats["rinv"]
    v16 = v32.astype(jnp.bfloat16)
    mask = jnp.ones((n,), dtype=bool)
    q = jax.random.normal(kq, (b, d), dtype=jnp.float32)

    # exact ground truth for recall measurements
    _, rows_exact = K.search_kernel(q[:64], v32, sq_n, rinv, mask,
                                    metric=DistanceMetric.COSINE, k=k,
                                    compute_dtype="float32")
    rows_exact = np.asarray(rows_exact)

    def recall(rows):
        rows = np.asarray(rows)[:64]
        return float(np.mean([len(set(a.tolist()) & set(e.tolist())) / k
                              for a, e in zip(rows, rows_exact)]))

    # 1) bf16 + exact top_k (current bench configuration)
    f = lambda qq: K.search_kernel(qq, v16, sq_n, rinv, mask,
                                   metric=DistanceMetric.COSINE, k=k,
                                   compute_dtype="bfloat16")
    dt, out = timed(f, q)
    print(json.dumps({"exp": "bf16_exact_topk_b256", "ms": dt * 1e3,
                      "qps": b / dt, "recall": recall(out[1])}))

    # 2) bf16 + approx top_k
    fa = lambda qq: K.search_kernel(qq, v16, sq_n, rinv, mask,
                                    metric=DistanceMetric.COSINE, k=k,
                                    compute_dtype="bfloat16", approx=True)
    dt, out = timed(fa, q)
    print(json.dumps({"exp": "bf16_approx_topk_b256", "ms": dt * 1e3,
                      "qps": b / dt, "recall": recall(out[1])}))

    # 3) batch scaling with approx top-k
    for bb in (1024,):
        qb = jax.random.normal(kq, (bb, d), dtype=jnp.float32)
        dt, _ = timed(fa, qb)
        print(json.dumps({"exp": f"bf16_approx_topk_b{bb}", "ms": dt * 1e3,
                          "qps": bb / dt}))

    # 4) SQ int8 scans: Pallas dequant-matmul vs native int8 MXU matmul
    from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
    sqz = ScalarQuantizer()
    sqz.train(np.asarray(v32[:100_000]))
    codes = sqz.encode(np.asarray(v32[:262_144]))  # 256k rows on device
    qn = np.asarray(q)
    small = np.asarray(sqz.distances(qn[:8], codes[:2048], "l2",
                                     use_pallas=True))
    ref = np.asarray(sqz.distances(qn[:8], codes[:2048], "l2",
                                   use_pallas=False))
    ok = bool(np.allclose(small, ref, rtol=2e-2, atol=2e-2))
    fsq = lambda qq: sqz.distances(qq, codes, "l2", use_pallas=True)
    dt, _ = timed(fsq, qn, iters=10)
    print(json.dumps({"exp": "sq_pallas_scan_256k_b256", "ms": dt * 1e3,
                      "qps": b / dt, "matches_xla": ok,
                      "max_err": float(np.abs(small - ref).max())}))

    # 4b) int8 MXU matmul path at full 1M scale
    codes_1m = sqz.encode(np.asarray(v32))
    stats = sqz.corpus_stats(codes_1m)
    small2 = np.asarray(sqz.distances(qn[:8], codes_1m[:2048], "l2",
                                      mode="int8mm"))
    ok2 = bool(np.allclose(
        small2,
        np.asarray(sqz.distances(qn[:8], codes_1m[:2048], "l2",
                                 mode="chunked")),
        rtol=3e-2, atol=3e-2))
    fmm = lambda qq: sqz.distances(qq, codes_1m, "l2", mode="int8mm",
                                   stats=stats)
    dt, _ = timed(fmm, qn, iters=10)
    print(json.dumps({"exp": "sq_int8mm_scan_1M_b256", "ms": dt * 1e3,
                      "qps": b / dt, "matches_xla": ok2}))

    # 5) BQ Hamming Pallas scan at 5M x 768 (batch 64 keeps the (B, N)
    # int32 output within HBM next to the corpus copies)
    from fastpyvectordb_tpu.quant.binary import BinaryQuantizer
    bq = BinaryQuantizer()
    bq.train(np.asarray(v32[:50_000]))
    del codes
    n_big = 5_000_000
    bh = 64
    w = bq.n_words
    codes_t = jax.random.bits(kv, (w, n_big), dtype=jnp.uint32)
    qcodes = bq.encode(qn[:bh])
    small_t = np.asarray(bq.hamming_distances_t(qcodes[:8],
                                                codes_t[:, :2048]))
    ref_h = np.asarray(bq.hamming_distances(
        qn[:8], np.asarray(codes_t[:, :2048]).T, use_pallas=False))
    okh = bool(np.array_equal(small_t, ref_h))
    fh = lambda qc: bq.hamming_distances_t(qc, codes_t)
    dt, _ = timed(fh, qcodes, iters=10)
    print(json.dumps({"exp": "bq_pallas_hamming_5M_b64", "ms": dt * 1e3,
                      "qps": bh / dt, "matches_xla": okh}))


if __name__ == "__main__":
    main()
