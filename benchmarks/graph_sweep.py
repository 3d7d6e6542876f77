"""Graph ANN wide-expand/fewer-iters sweep (ROADMAP #22, round-2 verdict #9).

The round-2 measurement showed graph ANN losing to the exact bf16 scan at
every batch size at 1M x 768: 16 serial beam iterations leave the MXU idle
while each one gathers only E*R = 256 candidate rows per query.  The sweep
explores the other corner of the (beam W, expand E, iters T, entries I)
space — wider expansion with fewer serial rounds at the same total
candidate budget (E*T ~ const), plus more entry points (I) so the walk
starts closer and needs fewer hops:

  total candidates scored = I + T * E * R
  serial depth            = T          (the latency lever at small batch)

All timings use the fetch-barrier pattern (block_until_ready is unreliable
through the axon tunnel — benchmarks/ivfg_pallas_lab.py): fetch one element
of the last output to drain the in-order queue, subtract a measured RTT
floor, and time over DISTINCT query batches (the runtime dedups identical
dispatches).

Usage: python benchmarks/graph_sweep.py [--cpu] [combo ...]
  combos: gBEAMxITERSeEXPAND[iINIT], e.g. g128x4e32 g256x5e32i64
  env: GSWEEP_N (corpus rows, default 1_000_000)
"""

import json
import re
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import os  # noqa: E402

N = int(os.environ.get("GSWEEP_N", 1_000_000))
D, K, REPS = 768, 10, 7
BATCHES = (1, 8, 64)

DEFAULT = ["g128x16e8",            # round-2 baseline shape
           "g128x8e16", "g128x4e32", "g128x6e32",
           "g128x3e64i64", "g256x5e32i64", "g64x4e32"]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from _data import clustered_corpus, clustered_queries
    from fastpyvectordb_tpu.core.collection import Collection
    from fastpyvectordb_tpu.core.types import CollectionConfig, DistanceMetric
    from fastpyvectordb_tpu.kernels import distances as Kd

    combos = []
    for c in sys.argv[1:] or DEFAULT:
        m = re.fullmatch(r"g(\d+)x(\d+)e(\d+)(?:i(\d+))?", c)
        if not m:
            raise SystemExit(f"bad combo {c!r} (want gBEAMxITERSeEXPAND[iN])")
        combos.append((int(m.group(1)), int(m.group(2)), int(m.group(3)),
                       int(m.group(4) or 0) or None))

    v, centers = clustered_corpus(N, D, seed=7)
    col = Collection(CollectionConfig(name="gs", dimensions=D,
                                      metric="cosine",
                                      compute_dtype="bfloat16",
                                      storage_dtype="bfloat16",
                                      topk="approx"))
    for s in range(0, N, 250_000):
        e = min(s + 250_000, N)
        col.insert_batch(v[s:e], [f"v{i}" for i in range(s, e)])
    emit(exp="ingested", rows=col.count(), platform=jax.devices()[0].platform)

    store = col._store
    stats = Kd.corpus_stats(store.vectors)
    sq, rinv = stats["sq"], stats["rinv"]
    validmask = store.valid

    qsets = {b: [clustered_queries(centers, b, seed=100 * b + i)
                 for i in range(REPS + 1)] for b in BATCHES}

    def fetch1(o):
        np.asarray(jax.device_get(o[-1].ravel()[:1]))

    def timed(run, b):
        out0 = run(qsets[b][0])            # warm / compile
        fetch1(out0)
        t0 = time.perf_counter()
        fetch1(out0)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [run(q) for q in qsets[b][1:]]
        fetch1(outs[-1])
        wall = time.perf_counter() - t0
        return (wall - min(rtt, 0.5 * wall)) / (len(qsets[b]) - 1)

    # ground truth (exact full top_k) on the first 2 timed batches per B
    gt = {b: [np.asarray(Kd.search_kernel(
        q, store.vectors, sq, rinv, validmask,
        metric=DistanceMetric.COSINE, k=K, compute_dtype="bfloat16",
        approx=False)[1]) for q in qsets[b][1:3]] for b in BATCHES}
    emit(exp="ground_truth_ready")

    def recall_of(run, b):
        recs = []
        for qi, g in enumerate(gt[b]):
            rr = np.asarray(run(qsets[b][qi + 1])[1])
            recs.append(np.mean([len(set(a.tolist()) & set(e.tolist())) / K
                                 for a, e in zip(rr, g)]))
        return float(np.mean(recs))

    # exact serving scan (the bar to clear at each batch size)
    for b in BATCHES:
        def run_exact(q):
            return Kd.search_kernel(q, store.vectors, sq, rinv, validmask,
                                    metric=DistanceMetric.COSINE, k=K,
                                    compute_dtype="bfloat16", approx=True)
        dt = timed(run_exact, b)
        emit(exp=f"exact_bf16_b{b}", ms=round(dt * 1e3, 3),
             ms_per_query=round(dt * 1e3 / b, 3), qps=round(b / dt, 1),
             recall=round(recall_of(run_exact, b), 4))

    t0 = time.perf_counter()
    col.build_ann(kind="graph")
    emit(exp="graph_build", s=round(time.perf_counter() - t0, 1),
         **col._ann.stats())

    for beam, iters, expand, n_init in combos:
        cand = (n_init or col._ann.n_init) + iters * expand * 32
        for b in BATCHES:
            def run(q, beam=beam, iters=iters, expand=expand, n_init=n_init):
                return col._ann.search(q, K, beam=beam, iters=iters,
                                       expand=expand, n_init=n_init,
                                       device_out=True)
            dt = timed(run, b)
            tag = f"i{n_init}" if n_init else ""
            emit(exp=f"graph_b{beam}_x{iters}_e{expand}{tag}_b{b}",
                 ms=round(dt * 1e3, 3),
                 ms_per_query=round(dt * 1e3 / b, 3),
                 qps=round(b / dt, 1), cand_budget=cand,
                 recall=round(recall_of(run, b), 4))


if __name__ == "__main__":
    main()
