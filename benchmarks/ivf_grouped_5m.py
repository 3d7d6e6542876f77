"""Grouped IVF at 5M x 768 — the HBM-bound regime where pruning pays.

At 1M/B=1024 the exact bf16 scan is MXU-bound (~12 ms) and the grouped
IVF's cell-tensor read (~2.4 GB incl. padding) cancels the flops saved.
At 5M the exact scan reads 7.7 GB and spends ~8e12 matmul flops per
batch (r2: config5 exact 4,231 QPS at B=64-equivalent), while grouped
IVF with int8 cells reads ~5 GB ONCE per batch and does ~40x fewer
flops.  This script measures, on chip, at B=1024 / k=10 / cosine:

  exact_bf16        the serving scan (corpus resident bf16)
  grouped_int8      ann/ivf_grouped.py with int8 cells, nprobe sweep

Ground truth is the f32-accumulated bf16 exact top-k (full top_k, no
approx) on 2 of the batches: at 5M a true f32 corpus never fits HBM.

HBM budget: bf16 store 7.9 GB + int8 cells ~5 GB + norms/overflow
~0.3 GB + score tensors <1 GB. Corpus generation is host-side chunked.
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

from fastpyvectordb_tpu import Collection, CollectionConfig
from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as Kd

N = int(os.environ.get("IVFG_N", 5_000_000))
D = int(os.environ.get("IVFG_D", 768))
B = int(os.environ.get("IVFG_B", 1024))
K = 10
REPS = 6
N_CENTERS = 1024


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--np", dest="nprobes", default="8,16,32")
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--factor", type=float, default=1.25)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars cannot: "
                         "sitecustomize pins axon)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    nprobes = [int(x) for x in args.nprobes.split(",")]

    rng = np.random.default_rng(0)
    centers = (2.0 * rng.standard_normal((N_CENTERS, D))).astype(np.float32)

    col = Collection(CollectionConfig(
        name="ivfg5", dimensions=D, metric="cosine",
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
    for i in range(REPS + 1):
        q = centers[rng.integers(0, N_CENTERS, B)] \
            + 0.5 * rng.standard_normal((B, D)).astype(np.float32)
        qbatches.append(jnp.asarray(q.astype(np.float32)))

    store = col._store
    validmask = store.valid
    v16 = store.vectors
    stats = Kd.corpus_stats(v16)
    sq, rinv = stats["sq"], stats["rinv"]

    # ground truth: exact top_k over bf16 scores (f32 accumulate), chunked
    gt = []
    for q in qbatches[:2]:
        rows_parts = []
        # 64-query chunks: at 5M the (chunk, N) score grid + the exact
        # TopK's temps must fit beside the 9.7 GB bf16 store
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
            out = run(qbatches[gi])
            rr = np.asarray(out[1])
            recs.append(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / K
                for a, e in zip(rr, g)]))
        return float(np.mean(recs))

    def fetch1(o):
        # true barrier: block_until_ready is unreliable through the axon
        # tunnel (measured returning before execution — ivfg_pallas_lab);
        # fetching one element of the LAST output drains the in-order queue
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
    col.build_ann(nlist=args.nlist, nprobe=max(nprobes), iters=6,
                  cell_dtype="int8", max_cell_factor=args.factor)
    emit(exp="built", s=round(time.perf_counter() - t0, 1),
         **col._ann.stats())

    idx = col._ann
    from fastpyvectordb_tpu.ann.ivf_grouped import grouped_ivf_search_kernel
    nlist, cmax = idx.row_table.shape
    cnorms = idx._cell_norms_cached()
    okc, oko = idx._ok_cached()
    from fastpyvectordb_tpu.ann.ivf_grouped import grouped_qcap
    for nprobe in nprobes:
        qcap = grouped_qcap(B, nprobe, nlist, cmax)

        for rr in (0, 4):
            def run(q, rr=rr):
                d_, r_, _ = grouped_ivf_search_kernel(
                    q, idx.centroids, idx.cells, idx.row_table,
                    idx.overflow_vecs, idx.overflow_rows, okc, oko,
                    idx.quantizer.vmin, idx.quantizer.scale, cnorms,
                    col._store.vectors if rr else None,
                    metric=DistanceMetric.COSINE, k=K, nprobe=nprobe,
                    qcap=qcap, compute_dtype="bfloat16", rerank=rr)
                return d_, r_
            dt = timed(run)
            emit(exp=f"grouped_int8_{N//1_000_000}M_np{nprobe}_q{qcap}"
                     f"_rr{rr}_b{B}",
                 ms=round(dt * 1e3, 2), qps=round(B / dt, 1),
                 recall=round(recall_of(run), 4))


if __name__ == "__main__":
    main()
