"""Grouped (cell-major) IVF on chip: QPS + recall at 1M x 768, B=1024.

The large-batch IVF question (VERDICT r2: IVF lost to the exact scan at
every batch size because the per-query gather moves ~nprobe*cmax*D bytes
PER QUERY).  ann/ivf_grouped.py flips the dispatch cell-major: one
batched MXU matmul, each cell read once per batch.  This bench measures
it at the headline configuration (clustered 1024-center corpus, cosine,
B=1024, k=10) against exact-f32 ground truth, for bf16 and int8 cells
across nprobe.

Run serially on the chip (tunnel relay is single-tenant):
  PYTHONPATH=/root/repo python benchmarks/ivf_grouped_tpu.py [--int8] [--np 8,16]
"""

import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu import Collection, CollectionConfig
from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as Kd

import os

N = int(os.environ.get("IVFG_N", 1_000_000))
D = int(os.environ.get("IVFG_D", 768))
B = int(os.environ.get("IVFG_B", 1024))
K = 10
REPS = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--np", dest="nprobes", default="8,16,32")
    ap.add_argument("--nlist", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars cannot: "
                         "sitecustomize pins axon)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    nprobes = [int(x) for x in args.nprobes.split(",")]

    key = jax.random.PRNGKey(0)
    kv, kc, ka = jax.random.split(key, 3)
    n_centers = 1024
    centers = 2.0 * jax.random.normal(kc, (n_centers, D), dtype=jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_centers)
    v32 = centers[assign] + jax.random.normal(kv, (N, D), dtype=jnp.float32)
    v32 = v32 / jnp.linalg.norm(v32, axis=1, keepdims=True)
    jax.block_until_ready(v32)
    emit(exp="corpus_ready", n=N, d=D)

    # distinct query batches + exact f32 ground truth on the first two
    qbatches = []
    for i in range(REPS + 1):
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
        qa = jax.random.randint(k1, (B,), 0, n_centers)
        qbatches.append(centers[qa] + 0.5 * jax.random.normal(
            k2, (B, D), dtype=jnp.float32))
    stats = Kd.corpus_stats(v32)
    mask_all = jnp.ones((N,), dtype=bool)
    gt = []
    for q in qbatches[:2]:
        # chunk the f32 GT scan: a (B, N) f32 score matrix at B=1024 is
        # 4 GB on top of the 3 GB f32 corpus — halves keep peak HBM sane
        rows_parts = []
        for s in range(0, B, 256):
            _, rows = Kd.search_kernel(q[s:s + 256], v32, stats["sq"],
                                       stats["rinv"], mask_all,
                                       metric=DistanceMetric.COSINE,
                                       k=K, compute_dtype="float32")
            rows_parts.append(np.asarray(rows))
        gt.append(np.concatenate(rows_parts))
    emit(exp="ground_truth_ready")

    host_v = np.asarray(v32)
    del v32, stats
    col = Collection(CollectionConfig(
        name="ivfg", dimensions=D, metric="cosine",
        compute_dtype="bfloat16", storage_dtype="bfloat16", topk="auto"))
    bs = 250_000
    t0 = time.perf_counter()
    for s in range(0, N, bs):
        col.insert_batch(host_v[s:s + bs],
                         [f"v{s + i}" for i in range(min(bs, N - s))])
    emit(exp="filled", s=round(time.perf_counter() - t0, 1))
    del host_v

    t0 = time.perf_counter()
    col.build_ann(nlist=args.nlist, nprobe=max(nprobes), iters=8,
                  cell_dtype="int8" if args.int8 else None)
    emit(exp="built", s=round(time.perf_counter() - t0, 1),
         **col._ann.stats())

    idx = col._ann
    from fastpyvectordb_tpu.ann.ivf_grouped import grouped_ivf_search_kernel
    nlist, cmax = idx.row_table.shape
    if idx.quantizer is not None:
        vmin, scale = idx.quantizer.vmin, idx.quantizer.scale
    else:
        vmin = jnp.zeros((D,), jnp.float32)
        scale = jnp.ones((D,), jnp.float32)
    cnorms = idx._cell_norms_cached()
    okc, oko = idx._ok_cached()
    dev_batches = [jnp.asarray(q) for q in qbatches]

    for nprobe in nprobes:
        from fastpyvectordb_tpu.ann.ivf_grouped import grouped_qcap
        qcap = grouped_qcap(B, nprobe, nlist, cmax)

        def run(q):
            return grouped_ivf_search_kernel(
                q, idx.centroids, idx.cells, idx.row_table,
                idx.overflow_vecs, idx.overflow_rows, okc, oko,
                vmin, scale, cnorms, metric=DistanceMetric.COSINE,
                k=K, nprobe=nprobe, qcap=qcap,
                compute_dtype="bfloat16")

        def fetch1(o):
            # true barrier: block_until_ready is unreliable through the
            # axon tunnel (measured returning before execution,
            # benchmarks/ivfg_pallas_lab.py); a host fetch of one element
            # of the LAST output drains the in-order dispatch queue
            np.asarray(jax.device_get(o[0].ravel()[:1]))

        fetch1(run(dev_batches[0]))
        # recall on the GT batches
        recs, drops = [], []
        for gi, g in enumerate(gt):
            dd, rr, dropped = run(dev_batches[gi])
            rr = np.asarray(rr)
            drops.append(int(dropped))
            recs.append(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / K
                for a, e in zip(rr, g)]))
        # tunnel round-trip floor (fetch of an already-computed output),
        # subtracted from the timed wall below
        out0 = run(dev_batches[0])
        fetch1(out0)
        t0 = time.perf_counter()
        fetch1(out0)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [run(q) for q in dev_batches[1:]]
        fetch1(outs[-1])
        wall = time.perf_counter() - t0
        dt = (wall - min(rtt, 0.5 * wall)) / (len(dev_batches) - 1)
        emit(exp=f"grouped_{'int8' if args.int8 else 'bf16'}"
                 f"_np{nprobe}_q{qcap}_b{B}",
             ms=round(dt * 1e3, 2), qps=round(B / dt, 1),
             recall=round(float(np.mean(recs)), 4), dropped=drops)


if __name__ == "__main__":
    main()
