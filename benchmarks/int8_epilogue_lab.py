"""Experiment lab: closing the int8 two-stage composition gap (ROADMAP #1).

Measured in round 1 at 1M x 768, B=256, cosine: the raw s8 x s8 matmul is
10.1 ms, but the fused two-stage pipeline is ~110 ms.  Hypothesis: the
scale-folding f32 epilogue + the pad->reshape->3-D approx_max_k candidate
selection (_masked_candidates_chunked) break XLA's matmul->reduction fusion
and materialize multi-GB (B, N) intermediates.

Variants (all end-to-end: coarse -> candidates -> gather -> exact rerank):
  v0_current    the shipped _int8_two_stage
  v1_direct     same epilogue, but approx_max_k directly on the (B, N)
                scores (no pad/reshape hierarchy)
  v2_rawint     normalized-corpus trick: encode L2-normalized rows, then
                cosine ranking is monotonic in the raw int32 cross product
                (exact in f32: |cross| <= 127*127*768 < 2^24) — no f32
                epilogue at all before selection
  raw_matmul    reference point: the bare s8 x s8 matmul + checksum

Distinct query batches per iteration (the axon runtime dedups identical
dispatches).  Prints one JSON line per variant as it completes.
"""

import functools
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels.distances import MASKED
from fastpyvectordb_tpu.quant.scan import _int8_two_stage, _rerank_body
from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer

N, D, B, K, RERANK = 1_000_000, 768, 256, 10, 4
C = K * RERANK
REPS = 8


@functools.partial(jax.jit, static_argnames=("metric", "k", "c"))
def v3_bf16_scores(q, codes, vmin, scale, vsq, rinv, vectors, mask, *,
                   metric, k, c):
    """Like v1 but the (B, N) coarse scores are cast to bf16 BEFORE the
    approx_max_k — if XLA materializes the score matrix between the matmul
    and the reduction, this halves the HBM bytes (4 GB -> 2 GB at B=1024).
    The bf16 rounding only reorders candidates whose int8 scores already
    tie within 2^-8 relative — the exact re-rank restores them."""
    from fastpyvectordb_tpu.quant.scalar import _distances_int8_matmul
    s = _distances_int8_matmul(q, codes, vmin, scale, vsq, rinv,
                               metric=metric)
    if mask is not None:
        s = jnp.where(mask[None, :], s, MASKED)
    neg, crows = jax.lax.approx_max_k((-s).astype(jnp.bfloat16), c,
                                      recall_target=0.95)
    cand_vecs = jnp.take(vectors, crows, axis=0)
    return _rerank_body(q, cand_vecs, crows,
                        (-neg).astype(jnp.float32) < MASKED * 0.5, metric,
                        k, "bfloat16")


@functools.partial(jax.jit, static_argnames=("metric", "c"))
def v5_coarse_only(q, codes, vmin, scale, vsq, rinv, mask, *, metric, c):
    """Coarse scan + candidate selection only (no gather / re-rank):
    isolates how much of the two-stage time the re-rank tail costs."""
    from fastpyvectordb_tpu.quant.scalar import _distances_int8_matmul
    s = _distances_int8_matmul(q, codes, vmin, scale, vsq, rinv,
                               metric=metric)
    if mask is not None:
        s = jnp.where(mask[None, :], s, MASKED)
    neg, crows = jax.lax.approx_max_k(-s, c, recall_target=0.95)
    return -neg, crows


def timed(fn, batches):
    jax.block_until_ready(fn(batches[0]))
    t0 = time.perf_counter()
    outs = [fn(q) for q in batches[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(batches) - 1)


def report(name, dt, rows, exact_rows):
    rec = np.mean([len(set(a.tolist()) & set(e.tolist())) / K
                   for a, e in zip(np.asarray(rows), exact_rows)])
    print(json.dumps({"exp": name, "ms": round(dt * 1e3, 2),
                      "qps": round(B / dt, 1), "recall@10": round(float(rec), 4)}),
          flush=True)


@functools.partial(jax.jit, static_argnames=("metric", "k", "c"))
def v1_direct(q, codes, vmin, scale, vsq, rinv, vectors, mask, *,
              metric, k, c):
    from fastpyvectordb_tpu.quant.scalar import _distances_int8_matmul
    s = _distances_int8_matmul(q, codes, vmin, scale, vsq, rinv, metric=metric)
    if mask is not None:
        s = jnp.where(mask[None, :], s, MASKED)
    neg, crows = jax.lax.approx_max_k(-s, c, recall_target=0.95)
    cand_vecs = jnp.take(vectors, crows, axis=0)
    return _rerank_body(q, cand_vecs, crows, -neg < MASKED * 0.5, metric, k,
                        "bfloat16")


@functools.partial(jax.jit, static_argnames=("metric", "k", "c"))
def v2_rawint(q, codes, rs_vmin_qconst_dummy, rs, vectors, mask, *,
              metric, k, c):
    """Corpus rows are L2-normalized before encoding, so cosine rank is
    monotonic in the raw int32 cross product: fold scales into the query,
    quantize it, ONE int8 matmul, approx_max_k on the (exact-in-f32) int32
    scores, gather, exact re-rank."""
    qf = q.astype(jnp.float32)
    qs = qf * rs[None, :]
    qmax = jnp.max(jnp.abs(qs), axis=1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-30) / 127.0
    qi = jnp.clip(jnp.round(qs / qscale), -127, 127).astype(jnp.int8)
    cross_i = jax.lax.dot_general(
        qi, codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = cross_i.astype(jnp.float32)  # exact: |cross_i| < 2^24
    if mask is not None:
        s = jnp.where(mask[None, :], s, -MASKED)
    neg, crows = jax.lax.approx_max_k(s, c, recall_target=0.95)
    cand_vecs = jnp.take(vectors, crows, axis=0)
    return _rerank_body(q, cand_vecs, crows,
                        jnp.ones_like(crows, dtype=bool), metric, k,
                        "bfloat16")


def main():
    import sys
    global B
    args = [a for a in sys.argv[1:] if not a.startswith("b=")]
    for a in sys.argv[1:]:
        if a.startswith("b="):
            B = int(a[2:])
    want = set(args) or {"raw", "v0", "v1", "v2"}
    metric = DistanceMetric.COSINE
    rng = np.random.default_rng(0)
    print(json.dumps({"exp": "setup", "n": N, "d": D, "b": B, "c": C}),
          flush=True)
    v = rng.standard_normal((N, D), dtype=np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vdev = jnp.asarray(v)
    vbf16 = vdev.astype(jnp.bfloat16)

    qz = ScalarQuantizer().train(v[:200_000])
    codes = qz.encode(v)
    vsq, rinv = qz.corpus_stats(codes)
    mask = jnp.ones((N,), dtype=bool)
    rs = (qz.scale / 255.0).astype(jnp.float32)
    jax.block_until_ready((codes, vsq, rinv, vbf16))

    batches = [jnp.asarray(
        rng.standard_normal((B, D)).astype(np.float32)) for _ in range(REPS)]

    # exact ground truth (bf16 scan) for recall
    from fastpyvectordb_tpu.kernels import distances as Kd
    stats = Kd.corpus_stats(vdev)
    gt = []
    for q in batches:
        _, r = Kd.search_kernel(q, vbf16, stats["sq"], stats["rinv"], mask,
                                metric=metric, k=K, compute_dtype="bfloat16",
                                approx=True)
        gt.append(np.asarray(r))
    gt_last = gt[-1]
    print(json.dumps({"exp": "ground_truth_ready"}), flush=True)

    if "raw" in want:
        # raw matmul reference point (codes as an ARGUMENT: a closed-over
        # corpus becomes a multi-GB constant in the compile payload and
        # overflows the remote-compile request limit)
        @jax.jit
        def raw_mm_arg(q, cds):
            qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
            ci = jax.lax.dot_general(
                qi, cds, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return jnp.sum(ci, axis=1)  # force materialization cheaply

        raw_mm = lambda q: raw_mm_arg(q, codes)
        dt = timed(raw_mm, batches)
        print(json.dumps({"exp": "raw_s8s8_matmul",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    if "v0" in want:
        # v0: shipped pipeline (post-fix this equals v1's structure; the
        # round-1 hierarchical-selection pipeline measured 110 ms here)
        f0 = lambda q: _int8_two_stage(
            q, codes, qz.vmin, qz.scale, vsq, rinv, vbf16, mask,
            metric=metric, k=K, c=C, approx=True, rerank_dtype="bfloat16")
        dt = timed(f0, batches)
        report("v0_current", dt, f0(batches[-1])[1], gt_last)

    if "v1" in want:
        # v1: direct approx_max_k on fused scores
        f1 = lambda q: v1_direct(q, codes, qz.vmin, qz.scale, vsq, rinv,
                                 vbf16, mask, metric=metric, k=K, c=C)
        dt = timed(f1, batches)
        report("v1_direct", dt, f1(batches[-1])[1], gt_last)

    if "v2" in want:
        # v2: raw-int32 ranking (normalized corpus)
        f2 = lambda q: v2_rawint(q, codes, None, rs, vbf16, mask,
                                 metric=metric, k=K, c=C)
        dt = timed(f2, batches)
        report("v2_rawint", dt, f2(batches[-1])[1], gt_last)

    if "v3" in want:
        # v3: bf16 scores into the approx_max_k (halved reduction bytes)
        f3 = lambda q: v3_bf16_scores(q, codes, qz.vmin, qz.scale, vsq,
                                      rinv, vbf16, mask, metric=metric,
                                      k=K, c=C)
        dt = timed(f3, batches)
        report(f"v3_bf16_scores_b{B}", dt, f3(batches[-1])[1], gt_last)

    if "v5" in want:
        # v5: coarse + selection only (no rerank tail)
        f5 = lambda q: v5_coarse_only(q, codes, qz.vmin, qz.scale, vsq,
                                      rinv, mask, metric=metric, c=C)
        dt = timed(f5, batches)
        print(json.dumps({"exp": f"v5_coarse_only_b{B}",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    if "exact" in want:
        # reference: the exact bf16 + hardware-approx serving scan
        fx = lambda q: Kd.search_kernel(
            q, vbf16, stats["sq"], stats["rinv"], mask, metric=metric,
            k=K, compute_dtype="bfloat16", approx=True)
        dt = timed(fx, batches)
        report(f"exact_bf16_b{B}", dt, fx(batches[-1])[1], gt_last)


if __name__ == "__main__":
    main()
