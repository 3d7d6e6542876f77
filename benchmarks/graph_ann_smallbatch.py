"""Graph ANN at small batch (round-1 verdict item 10).

At B=1-8 the exact scan cannot amortize its full-corpus GEMM across
queries, so the beam-search ANN has its natural regime.  Sweeps
(beam, iters) at B in {1, 8} over 1M x 768, measuring per-query latency
and recall@10 vs the exact bf16 scan, alongside the exact scan and IVF
at the same batch sizes for the crossover table.

Usage: python benchmarks/graph_ann_smallbatch.py [combo ...]
  combos: exact ivf g32x8 g64x12 g128x16 ...  (gBEAMxITERS)
"""

import json
import re
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

from fastpyvectordb_tpu.core.collection import Collection
from fastpyvectordb_tpu.core.types import CollectionConfig, DistanceMetric

N, D, K, REPS = 1_000_000, 768, 10, 9
BATCHES = (1, 8)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench(call, batches):
    call(batches[0])  # warm/compile
    t0 = time.perf_counter()
    for q in batches[1:]:
        call(q)
    return (time.perf_counter() - t0) / (len(batches) - 1)


def main():
    from _data import clustered_corpus, clustered_queries
    want = sys.argv[1:] or ["exact", "ivf", "g64x12", "g128x16"]
    v, centers = clustered_corpus(N, D, seed=7)
    col = Collection(CollectionConfig(name="g", dimensions=D, metric="cosine",
                                      compute_dtype="bfloat16",
                                      topk="approx"))
    for s in range(0, N, 500_000):
        e = min(s + 500_000, N)
        col.insert_batch(v[s:e], [f"v{i}" for i in range(s, e)])
    emit(exp="ingested", rows=col.count())

    # per-batch-size query sets + exact ground truth for recall
    qsets = {b: [clustered_queries(centers, b, seed=10 * b + i)
                 for i in range(REPS)] for b in BATCHES}
    gt = {}
    for b in BATCHES:
        if "exact" in want:
            dt = bench(lambda q: col._store.search(
                q, K, DistanceMetric.COSINE, compute_dtype="bfloat16",
                topk="approx"), qsets[b])
            emit(exp=f"exact_bf16_b{b}", ms=round(dt * 1e3, 3),
                 ms_per_query=round(dt * 1e3 / b, 3), qps=round(b / dt, 1))
        gt[b] = [np.asarray(col._store.search(
            q, K, DistanceMetric.COSINE, compute_dtype="bfloat16",
            topk="approx")[1]) for q in qsets[b]]

    def recall_of(call, b):
        hits = []
        for q, g in zip(qsets[b], gt[b]):
            _, r = call(q)
            hits.append(np.mean([len(set(a.tolist()) & set(e.tolist())) / K
                                 for a, e in zip(np.asarray(r), g)]))
        return float(np.mean(hits))

    if "ivf" in want:
        t0 = time.perf_counter()
        col.build_ann(kind="ivf")
        emit(exp="ivf_build", s=round(time.perf_counter() - t0, 1))
        for b in BATCHES:
            dt = bench(lambda q: col._ann.search(q, K), qsets[b])
            emit(exp=f"ivf_b{b}", ms=round(dt * 1e3, 3),
                 ms_per_query=round(dt * 1e3 / b, 3), qps=round(b / dt, 1),
                 recall=round(recall_of(lambda q: col._ann.search(q, K), b),
                              4))

    gcombos = [(int(m.group(1)), int(m.group(2)),
                int(m.group(3) or 0) or None) for c in want
               if (m := re.fullmatch(r"g(\d+)x(\d+)(?:e(\d+))?", c))]
    if gcombos:
        t0 = time.perf_counter()
        col.build_ann(kind="graph")
        emit(exp="graph_build", s=round(time.perf_counter() - t0, 1))
        for beam, iters, expand in gcombos:
            for b in BATCHES:
                call = lambda q: col._ann.search(q, K, beam=beam,
                                                 iters=iters, expand=expand)
                dt = bench(call, qsets[b])
                tag = f"e{expand}" if expand else ""
                emit(exp=f"graph_beam{beam}_iters{iters}{tag}_b{b}",
                     ms=round(dt * 1e3, 3),
                     ms_per_query=round(dt * 1e3 / b, 3),
                     qps=round(b / dt, 1),
                     recall=round(recall_of(call, b), 4))


if __name__ == "__main__":
    main()
