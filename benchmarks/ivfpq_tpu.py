"""IVF-PQ on-chip benchmark + binary rerank-depth sweep (round 2).

Part 1: IVFPQIndex at 1M x 768 clustered — build time, memory, and the
(nprobe, rerank) recall/latency surface vs the exact bf16 scan at small
and large batch.  The index's promise is ~30x less HBM than bf16 cells;
this measures what that costs in recall/latency on real hardware.

Part 2: the binary 2-stage rerank-depth sweep motivated by the crossover
finding (r2_raw.jsonl: recall@10 ~0.50 at c=16k on the clustered corpus).
Finds the candidate depth where Hamming+rerank clears 0.9/0.95.

One JSON line per measurement.
"""

import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from _data import clustered_corpus, clustered_queries

from fastpyvectordb_tpu.core.collection import Collection
from fastpyvectordb_tpu.core.types import CollectionConfig

REPS = 6


def emit(**kw):
    print(json.dumps(kw), flush=True)


def recall(rows, gt, k=10):
    return round(float(np.mean(
        [len(set(a.tolist()[:k]) & set(e.tolist()[:k])) / k
         for a, e in zip(rows, gt)])), 4)


def build_collection(n, d, seed=4):
    v, centers = clustered_corpus(n, d, seed=seed)
    col = Collection(CollectionConfig(
        name="pq", dimensions=d, metric="cosine", compute_dtype="bfloat16",
        topk="approx"))
    tile = 500_000
    for s in range(0, n, tile):
        col.insert_batch(v[s:s + tile],
                         [f"v{i}" for i in range(s, min(s + tile, n))])
    return col, centers


def ivfpq(n=1_000_000, d=768, k=10):
    col, centers = build_collection(n, d)
    emit(exp="ivfpq_setup", n=n, d=d)

    # exact ground truth per batch size
    qsets = {b: [np.asarray(clustered_queries(centers, b, seed=7000 + 31 * b + i))
                 for i in range(REPS)] for b in (1, 8, 64, 256)}
    gt = {}
    for b, batches in qsets.items():
        gt[b] = [col._store.search(q, k, col.config.metric,
                                   compute_dtype="bfloat16",
                                   topk="approx")[1] for q in batches]

    t0 = time.perf_counter()
    # 4-bit default layout (pq_k=16, m=d/4): ADC runs as a one-hot MXU
    # einsum; the first on-chip run measured the 8-bit gather form at
    # 775 ms/B=64 with recall capped ~0.74 by shallow rerank
    col.build_ann(kind="ivfpq", nlist=2048, nprobe=8, iters=8, pq_iters=10)
    build_s = time.perf_counter() - t0
    st = col._ann.stats()
    mu = col._ann.memory_usage()
    emit(exp=f"ivfpq_build_{n//1000}kx{d}", s=round(build_s, 1), **{
        kk: st[kk] for kk in ("nlist", "cmax", "m", "overflow_rows")},
        index_mb=round(mu["index_bytes"] / 2**20, 1),
        compression=round(mu["compression_ratio"], 1))

    for nprobe in (8, 16):
        for rr in (16, 64, 256):
            for b in (1, 8, 64, 256):
                batches = qsets[b]
                try:
                    col._ann.search(batches[0], k, nprobe=nprobe, rerank=rr)
                    t0 = time.perf_counter()
                    outs = [col._ann.search(q, k, nprobe=nprobe, rerank=rr)
                            for q in batches[1:]]
                    dt = (time.perf_counter() - t0) / (len(batches) - 1)
                    rec = np.mean([recall(o[1], g) for o, g in
                                   zip(outs, gt[b][1:])])
                    emit(exp=f"ivfpq_np{nprobe}_rr{rr}_b{b}",
                         ms=round(dt * 1e3, 3), qps=round(b / dt, 1),
                         recall=round(float(rec), 4))
                except Exception as e:
                    emit(exp=f"ivfpq_np{nprobe}_rr{rr}_b{b}",
                         error=type(e).__name__, detail=str(e)[:160])


def binary_sweep(n=1_000_000, d=768, k=10):
    col, centers = build_collection(n, d)
    emit(exp="binary_sweep_setup", n=n, d=d)
    scan = col.enable_quantized_scan("binary")
    b = 64
    batches = [np.asarray(clustered_queries(centers, b, seed=9000 + i))
               for i in range(REPS)]
    gt = [col._store.search(q, k, col.config.metric,
                            compute_dtype="bfloat16", topk="approx")[1]
          for q in batches]
    for rr in (16, 32, 64, 128, 256):
        try:
            scan.search(batches[0], k, rerank=rr)
            t0 = time.perf_counter()
            outs = [scan.search(q, k, rerank=rr) for q in batches[1:]]
            dt = (time.perf_counter() - t0) / (len(batches) - 1)
            rec = np.mean([recall(o[1], g) for o, g in zip(outs, gt[1:])])
            emit(exp=f"binary_2stage_rr{rr}_b{b}", ms=round(dt * 1e3, 3),
                 qps=round(b / dt, 1), recall=round(float(rec), 4))
        except Exception as e:
            emit(exp=f"binary_2stage_rr{rr}_b{b}", error=type(e).__name__,
                 detail=str(e)[:160])
    # tuned-default check: what factor does tune_rerank pick?
    try:
        t0 = time.perf_counter()
        f = scan.tune_rerank(batches[0][:16], target_recall=0.95, k=k)
        emit(exp="binary_tune_rerank", factor=f,
             tune_s=round(time.perf_counter() - t0, 1))
    except Exception as e:
        emit(exp="binary_tune_rerank", error=type(e).__name__,
             detail=str(e)[:160])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("parts", nargs="*", default=["ivfpq", "binary_sweep"])
    args = ap.parse_args()
    for p in args.parts:
        globals()[p]()




def ivf_int8(n=1_000_000, d=768, k=10):
    """bf16-cell vs int8-cell IVF at 1M x 768: same routing, 2x less
    probe bandwidth.  Also the B=1 latency story vs the exact scan."""
    col, centers = build_collection(n, d)
    emit(exp="ivf_int8_setup", n=n, d=d)
    qsets = {b: [np.asarray(clustered_queries(centers, b, seed=4000 + 13 * b + i))
                 for i in range(REPS)] for b in (1, 64, 256)}
    gt = {b: [col._store.search(q, k, col.config.metric,
                                compute_dtype="bfloat16", topk="approx")[1]
              for q in batches] for b, batches in qsets.items()}
    for dtype_arg, tag in ((None, "bf16cells"), ("int8", "int8cells")):
        t0 = time.perf_counter()
        col.build_ann(kind="ivf", nlist=2048, nprobe=8, iters=8,
                      cell_dtype=dtype_arg)
        emit(exp=f"ivf_{tag}_build", s=round(time.perf_counter() - t0, 1),
             cells_mb=round(col._ann.stats()["cells_bytes"] / 2**20))
        for nprobe in (8, 32):
            for b in (1, 64, 256):
                batches = qsets[b]
                try:
                    col._ann.search(batches[0], k, nprobe=nprobe)
                    t0 = time.perf_counter()
                    outs = [col._ann.search(q, k, nprobe=nprobe)
                            for q in batches[1:]]
                    dt = (time.perf_counter() - t0) / (len(batches) - 1)
                    rec = np.mean([recall(o[1], g) for o, g in
                                   zip(outs, gt[b][1:])])
                    emit(exp=f"ivf_{tag}_np{nprobe}_b{b}",
                         ms=round(dt * 1e3, 3), qps=round(b / dt, 1),
                         recall=round(float(rec), 4))
                except Exception as e:
                    emit(exp=f"ivf_{tag}_np{nprobe}_b{b}",
                         error=type(e).__name__, detail=str(e)[:160])
        col._ann = None


if __name__ == "__main__":
    main()
