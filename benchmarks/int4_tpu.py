"""int4 vs int8 vs exact-bf16 on chip — does halving the coarse-scan
bytes pay at 1M and at 5M x 768?

The int4 Pallas kernel (kernels/pallas_quant.py:int4_scores) streams
N x D/2 bytes per batch — half of the int8 coarse scan, a quarter of the
bf16 exact scan.  ROADMAP #2 established the 1M/B=1024 regime is
MXU-bound for int8 (raw s8xs8 matmul 8.6 ms of 11.4 total), so the open
question this script answers is where the int4 byte saving turns into
wall-clock: small batches (HBM-bound) and >=5M corpora.

Rows (all cosine, k=10, clustered 1024-center corpus, fused
single-dispatch two-stage pipelines from quant/scan.py):

  exact_bf16_b{B}          serving scan baseline
  int8_2stage_rr4_b{B}     c = 4k candidates, bf16 re-rank
  int4_2stage_rr{R}_b{B}   R in {4, 8, 16} — the 16-level ordering is
                           coarser, so measure the recall/latency knee

Env: Q4_N (default 1_000_000), Q4_D (768), Q4_B ("64,1024").
HBM at 5M: bf16 store 7.7 GB + int8 3.8 GB + int4 codes+padded ~2.7 GB
come in under 16 GB only if int8 is dropped — Q4_SKIP_INT8=1 does that.

Run serially on the chip:  python benchmarks/int4_tpu.py
"""

import json
import os
import time
import sys

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as Kd
from fastpyvectordb_tpu.quant.int4 import Int4Quantizer
from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
from fastpyvectordb_tpu.quant.scan import _int4_two_stage, _int8_two_stage

N = int(os.environ.get("Q4_N", 1_000_000))
D = int(os.environ.get("Q4_D", 768))
BS = [int(x) for x in os.environ.get("Q4_B", "64,1024").split(",")]
SKIP_INT8 = os.environ.get("Q4_SKIP_INT8") == "1"
K = 10
REPS = 8
N_CENTERS = 1024
METRIC = DistanceMetric.COSINE


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fetch1(o):
    # true barrier: block_until_ready is unreliable through the axon
    # tunnel; fetching one element of the LAST output drains the
    # in-order dispatch queue (benchmarks/ivfg_pallas_lab.py)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def timed(run, qbatches):
    out0 = run(qbatches[0])
    fetch1(out0)
    t0 = time.perf_counter()
    fetch1(out0)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(q) for q in qbatches[1:]]
    fetch1(outs[-1])
    wall = time.perf_counter() - t0
    return (wall - min(rtt, 0.5 * wall)) / (len(qbatches) - 1)


def main():
    if "--cpu" in sys.argv:
        # sitecustomize pins the axon backend; only jax.config can force
        # CPU (and only before backend init) — needed for smoke tests
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "axon")
    emit(exp="config", n=N, d=D, bs=BS, platform=platform)
    key = jax.random.PRNGKey(0)
    kc, kv, ka = jax.random.split(key, 3)
    centers = 2.0 * jax.random.normal(kc, (N_CENTERS, D), dtype=jnp.float32)
    # device-generated clustered corpus in chunks (host gen at 5M is slow)
    blocks = []
    step = 1_000_000
    for s in range(0, N, step):
        m = min(step, N - s)
        kk1, kk2 = jax.random.split(jax.random.PRNGKey(1000 + s))
        a = jax.random.randint(kk1, (m,), 0, N_CENTERS)
        blk = centers[a] + jax.random.normal(kk2, (m, D), dtype=jnp.float32)
        blk = blk / jnp.linalg.norm(blk, axis=1, keepdims=True)
        blocks.append(blk.astype(jnp.bfloat16))
        del blk
    v16 = jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
    del blocks
    mask = jnp.ones((N,), dtype=bool)
    st = Kd.corpus_stats(v16)
    sq, rinv = st["sq"], st["rinv"]

    # train both codecs on a strided sample (f32) without a full f32 corpus
    t_idx = jnp.asarray(np.arange(0, N, max(1, N // 200_000),
                                  dtype=np.int64)[:200_000])
    sample = jnp.take(v16, t_idx, axis=0).astype(jnp.float32)

    qz4 = Int4Quantizer().train(sample)
    codes4 = qz4.encode(v16)
    vsq4, rinv4 = qz4.corpus_stats(codes4)
    lay4 = qz4.pallas_layout(codes4)
    w4 = int(codes4.shape[1])
    if lay4[0] is not codes4:
        # padded copy supersedes; drop the original to save HBM at 5M
        del codes4
    emit(exp="int4_ready", words=w4)

    if not SKIP_INT8:
        qz8 = ScalarQuantizer().train(sample)
        codes8 = qz8.encode(v16)
        vsq8, rinv8 = qz8.corpus_stats(codes8)
        emit(exp="int8_ready")
    del sample

    for B in BS:
        qbatches = []
        for i in range(REPS + 1):
            k1, k2 = jax.random.split(jax.random.PRNGKey(7000 + 31 * B + i))
            qa = jax.random.randint(k1, (B,), 0, N_CENTERS)
            q = centers[qa] + 0.5 * jax.random.normal(k2, (B, D),
                                                      dtype=jnp.float32)
            qbatches.append(q)

        # ground truth: exact top_k over bf16 scores (f32 accumulate) on
        # 2 batches, chunked so the (chunk, N) grid fits beside the store
        gt = []
        for q in qbatches[:2]:
            parts = []
            for s in range(0, B, 64):
                _, rows = Kd.search_kernel(
                    q[s:s + 64], v16, sq, rinv, mask, metric=METRIC, k=K,
                    compute_dtype="bfloat16", approx=False)
                parts.append(np.asarray(rows))
            gt.append(np.concatenate(parts))

        def recall_of(run):
            recs = []
            for gi, g in enumerate(gt):
                rr = np.asarray(run(qbatches[gi])[1])
                recs.append(np.mean([
                    len(set(a.tolist()) & set(e.tolist())) / K
                    for a, e in zip(rr, g)]))
            return round(float(np.mean(recs)), 4)

        # HBM cap on the (B, N) score block: at 5M a B=1024 dispatch is
        # 20 GB (the pallas kernel writes scores as a kernel output, so
        # fusion cannot elide it — r5 int4_5m rc=1).  Mirror the serving
        # path's fix (QuantizedScan._score_hbm_budget): pow2 sub-batches
        # under ~4 GB, chained per client batch (1M x 1024 = 4 GB
        # stays single-dispatch as measured in r4/r5).
        cap = max(8, int((4 << 30) // (N * 4)))
        sub = 8
        while sub * 2 <= min(B, cap):
            sub *= 2

        def chunked(fn):
            if B <= sub:
                return fn
            def run(q):
                outs = [fn(q[s:s + sub]) for s in range(0, B, sub)]
                return (jnp.concatenate([o[0] for o in outs]),
                        jnp.concatenate([o[1] for o in outs]))
            return run
        if sub < B:
            emit(exp=f"sub_batch_b{B}", sub=sub,
                 note="score-block HBM cap (serving splits identically)")

        def run_exact(q):
            return Kd.search_kernel(q, v16, sq, rinv, mask, metric=METRIC,
                                    k=K, compute_dtype="bfloat16",
                                    approx=True)
        # exact/int8 stay UNCHUNKED: their XLA matmul->top-k fuses and
        # the (B, N) scores never materialize (wave-C/E cross-check:
        # unchunked exact b1024@5M = 43.7 ms vs 82.1 ms chunked).  Only
        # the pallas int4 kernel writes scores as a kernel output and
        # must pay the sub-batch cost — that IS its serving cost there.
        dt = timed(run_exact, qbatches)
        emit(exp=f"exact_bf16_b{B}", ms=round(dt * 1e3, 2),
             qps=round(B / dt, 1), recall=recall_of(run_exact))

        if not SKIP_INT8:
            def run_i8(q):
                return _int8_two_stage(
                    q, codes8, qz8.vmin, qz8.scale, vsq8, rinv8, v16, mask,
                    metric=METRIC, k=K, c=4 * K, approx=True,
                    rerank_dtype="bfloat16")
            dt = timed(run_i8, qbatches)
            emit(exp=f"int8_2stage_rr4_b{B}", ms=round(dt * 1e3, 2),
                 qps=round(B / dt, 1), recall=recall_of(run_i8))

        for rr in (4, 8, 16):
            def run_i4(q, rr=rr):
                q_lay = qz4.pallas_query(q, w4)
                return _int4_two_stage(
                    q, q_lay, lay4[0], lay4[1], lay4[2], vsq4, rinv4,
                    v16, mask, metric=METRIC, k=K, c=rr * K, approx=True,
                    rerank_dtype="bfloat16", use_pallas=on_accel)
            run_i4 = chunked(run_i4)
            dt = timed(run_i4, qbatches)
            emit(exp=f"int4_2stage_rr{rr}_b{B}", ms=round(dt * 1e3, 2),
                 qps=round(B / dt, 1), recall=recall_of(run_i4))


if __name__ == "__main__":
    main()
