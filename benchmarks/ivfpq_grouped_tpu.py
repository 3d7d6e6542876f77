"""Grouped (cell-major) IVF-PQ on chip — 1M x 768 default, env-scalable.

The round-2 verdict called IVF-PQ "not servable": the per-query kernel's
ADC one-hot streams (B, nprobe, cmax, M, K) bf16 through HBM (~37 MB per
query at the 4-bit defaults), capping sub-batches at ~56 queries and
landing at 584 QPS @ recall 0.95 (rr256, B=256) vs 89.6k QPS for the
int8 two-stage.  The grouped dispatch expands each probed cell's codes
ONCE per batch inside VMEM and contracts them against the flattened ADC
tables of every query probing the cell (kernels/pallas_ivf.py:
grouped_cell_scores_pq) — MXU work proportional to the probed fraction,
HBM reads of M bytes/row (192 B vs 1536 B bf16).

Rows emitted (JSON lines):
  exact_bf16_*           serving-scan baseline
  ivfpq_pq_np*_rr*       per-query kernel (the round-2 path)
  ivfpq_grouped_np*_rr*  cell-major dispatch, same settings

Usage: python benchmarks/ivfpq_grouped_tpu.py [--cpu]
  env: PQG_N (rows, default 1_000_000), PQG_B (batch, default 1024),
       PQG_NLIST (default 4096), PQG_NP (default "8,16")
"""

import argparse
import json
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("PQG_N", 1_000_000))
D = int(os.environ.get("PQG_D", 768))
B = int(os.environ.get("PQG_B", 1024))
K = 10
REPS = 6
N_CENTERS = 1024


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars cannot: "
                         "sitecustomize pins axon)")
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fastpyvectordb_tpu import Collection, CollectionConfig
    from fastpyvectordb_tpu.core.types import DistanceMetric
    from fastpyvectordb_tpu.kernels import distances as Kd

    nlist = int(os.environ.get("PQG_NLIST", 4096))
    nprobes = [int(x) for x in os.environ.get("PQG_NP", "8,16").split(",")]

    rng = np.random.default_rng(0)
    centers = (2.0 * rng.standard_normal((N_CENTERS, D))).astype(np.float32)

    col = Collection(CollectionConfig(
        name="pqg", dimensions=D, metric="cosine",
        compute_dtype="bfloat16", storage_dtype="bfloat16", topk="auto"))
    t0 = time.perf_counter()
    bs = 250_000
    for s in range(0, N, bs):
        m = min(bs, N - s)
        block = centers[rng.integers(0, N_CENTERS, m)] \
            + rng.standard_normal((m, D)).astype(np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        col.insert_batch(block, [f"v{s + i}" for i in range(m)])
    emit(exp="filled", n=N, s=round(time.perf_counter() - t0, 1))

    qbatches = []
    for _ in range(REPS + 1):
        q = centers[rng.integers(0, N_CENTERS, B)] \
            + 0.5 * rng.standard_normal((B, D)).astype(np.float32)
        qbatches.append(jnp.asarray(q.astype(np.float32)))

    store = col._store
    validmask = store.valid
    v16 = store.vectors
    stats = Kd.corpus_stats(v16)
    sq, rinv = stats["sq"], stats["rinv"]

    # exact ground truth on 2 batches (f32-accumulated bf16, full top_k)
    gt = []
    for q in qbatches[:2]:
        rows_parts = []
        for s in range(0, B, 64):
            _, rows = Kd.search_kernel(q[s:s + 64], v16, sq, rinv,
                                       validmask,
                                       metric=DistanceMetric.COSINE, k=K,
                                       compute_dtype="bfloat16",
                                       approx=False)
            rows_parts.append(np.asarray(rows))
        gt.append(np.concatenate(rows_parts))
    emit(exp="ground_truth_ready")

    def recall_of(run):
        recs = []
        for gi, g in enumerate(gt):
            rr = np.asarray(run(qbatches[gi])[1])
            recs.append(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / K
                for a, e in zip(rr, g)]))
        return float(np.mean(recs))

    def fetch1(o):
        # block_until_ready is unreliable through the axon tunnel —
        # fetch one element of the LAST output to drain the queue
        np.asarray(jax.device_get(o[0].ravel()[:1]))

    def timed(run):
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

    if not args.skip_exact:
        def run_exact(q):
            return Kd.search_kernel(q, v16, sq, rinv, validmask,
                                    metric=DistanceMetric.COSINE, k=K,
                                    compute_dtype="bfloat16", approx=True)
        dt = timed(run_exact)
        emit(exp=f"exact_bf16_{N//1_000_000}M_b{B}", ms=round(dt * 1e3, 2),
             qps=round(B / dt, 1), recall=round(recall_of(run_exact), 4))

    t0 = time.perf_counter()
    build_kw = {}
    if os.environ.get("PQG_PQK"):
        build_kw["pq_k"] = int(os.environ["PQG_PQK"])
    if os.environ.get("PQG_M"):
        build_kw["m"] = int(os.environ["PQG_M"])
    col.build_ann(kind="ivfpq", nlist=nlist, nprobe=max(nprobes), iters=6,
                  pq_iters=8, tune=False, **build_kw)
    st = col._ann.stats()
    emit(exp="built", s=round(time.perf_counter() - t0, 1), **st)
    emit(exp="memory", **col._ann.memory_usage())

    idx = col._ann
    from fastpyvectordb_tpu.ann.ivfpq import (_grouped_ivfpq_search_kernel,
                                              _ivfpq_search_kernel)
    from fastpyvectordb_tpu.ann.ivf_grouped import grouped_qcap
    from fastpyvectordb_tpu.kernels import pallas_quant
    from fastpyvectordb_tpu.ann.ivf import ok_slot_masks
    okc, oko = ok_slot_masks(idx)
    codes_t = idx._codes_t_cached()
    cmax = idx.row_table.shape[1]
    m = idx.codes.shape[2]
    kk = idx.codebooks.shape[1]
    use_pallas = (pallas_quant.on_tpu() and cmax % 128 == 0
                  and (m * kk) % 128 == 0 and m % 32 == 0)
    emit(exp="pallas_gate", use_pallas=bool(use_pallas), cmax=cmax,
         m=m, kk=kk)

    rr_list = [int(x) for x in
               os.environ.get("PQG_RR", "0,8,16").split(",")]
    skip_pq = os.environ.get("PQG_SKIP_PQ") == "1"
    for nprobe in nprobes:
        qcap = grouped_qcap(B, nprobe, nlist, cmax)
        for rr in rr_list:
            # per-query kernel: the sub-batch cap the one-hot forces
            per_q = max(nprobe * cmax * m * 2 * kk, 1)
            safe_b = max(8, int((2 << 30) // per_q) // 8 * 8)
            sub = min(B, safe_b)

            def run_pq(q, rr=rr, sub=sub, nprobe=nprobe):
                outs_d, outs_r = [], []
                for s in range(0, B, sub):
                    dd, r_ = _ivfpq_search_kernel(
                        q[s:s + sub], idx.centroids, idx.codebooks,
                        idx.codes, idx.norms, idx.row_table,
                        idx.overflow_vecs, idx.overflow_rows, okc, oko,
                        store.vectors, metric=DistanceMetric.COSINE,
                        k=K, c=max(K, K * max(rr, 1)), nprobe=nprobe,
                        rerank_dtype="bfloat16", do_rerank=rr > 0)
                    outs_d.append(dd)
                    outs_r.append(r_)
                return jnp.concatenate(outs_d), jnp.concatenate(outs_r)

            if not skip_pq:
                dt = timed(run_pq)
                emit(exp=f"ivfpq_pq_np{nprobe}_rr{rr}_b{B}_sub{sub}",
                     ms=round(dt * 1e3, 2), qps=round(B / dt, 1),
                     recall=round(recall_of(run_pq), 4))

            # grouped lutq bound (same rule as IVFPQIndex._search_grouped):
            # the (U, qcap, M*K) bf16 slot-LUT tensor scales with M*K, so
            # large-K codebooks sub-batch the query block
            sub_lut = max(8, int((2 << 30)
                                 // max(nprobe * 32 * m * kk * 2, 1))
                          // 8 * 8)
            gsub = min(B, sub_lut)

            def run_g(q, rr=rr, nprobe=nprobe, gsub=gsub):
                outs_d, outs_r = [], []
                for s in range(0, B, gsub):
                    sq_ = q[s:s + gsub]
                    d_, r_, _ = _grouped_ivfpq_search_kernel(
                        sq_, idx.centroids, idx.codebooks, codes_t,
                        idx.norms, idx.row_table, idx.overflow_vecs,
                        idx.overflow_rows, okc, oko,
                        store.vectors if rr else None,
                        metric=DistanceMetric.COSINE, k=K, nprobe=nprobe,
                        qcap=grouped_qcap(int(sq_.shape[0]), nprobe, nlist,
                                          cmax),
                        rerank=rr, compute_dtype="bfloat16",
                        use_pallas=use_pallas)
                    outs_d.append(d_)
                    outs_r.append(r_)
                return jnp.concatenate(outs_d), jnp.concatenate(outs_r)

            dt = timed(run_g)
            emit(exp=f"ivfpq_grouped_np{nprobe}_rr{rr}_b{B}_sub{gsub}",
                 ms=round(dt * 1e3, 2), qps=round(B / dt, 1),
                 recall=round(recall_of(run_g), 4))


if __name__ == "__main__":
    main()
