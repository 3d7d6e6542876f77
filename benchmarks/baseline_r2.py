"""BASELINE.json benchmark configs 1, 2 and 5 + the method-crossover table.

Round-1 measured only the 1M x 768 configs; this script covers the rest
(BASELINE.md:39-41) and produces the crossover table the round-1 verdict
asked for: which method wins at which (corpus, batch) point.

  config1    10k x 384 brute force, batch 32
  config2    100k x 384 exact scan with fused where-filter masks
  config5    5M x 768 binary-Hamming prefilter -> exact bf16 re-rank
             (+ hybrid graph rescoring of the final top-k);
             at 5M the f32 corpus (15.4 GB) no longer fits HBM — the
             serving copy is bf16 (7.7 GB) and the prefilter runs on
             1-bit codes (480 MB)
  crossover  (exact bf16 | int8 2-stage | binary 2-stage | IVF) x
             (B = 1, 8, 64, 256) at 1M x 768

Every iteration uses DISTINCT query batches (the axon runtime dedups
identical dispatches).  One JSON line per measurement.
"""

import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K

REPS = 6


def timed(fn, inputs):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs[1:]]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(inputs) - 1)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def qbatches(rng, n, b, d):
    return [jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
            for _ in range(n)]


def recall(rows, gt, k):
    return float(np.mean([len(set(a.tolist()[:k]) & set(e.tolist()[:k])) / k
                          for a, e in zip(np.asarray(rows), gt)]))


# ---------------------------------------------------------------------------
def config1():
    """10k x 384 brute force @ B=32 (BASELINE config 1)."""
    n, d, b, k = 10_000, 384, 32, 10
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    stats = K.corpus_stats(v)
    mask = jnp.ones((n,), bool)
    f = lambda q: K.search_kernel(q, v, stats["sq"], stats["rinv"], mask,
                                  metric=DistanceMetric.COSINE, k=k,
                                  compute_dtype="float32")
    dt = timed(f, qbatches(rng, REPS, b, d))
    emit(exp="config1_bruteforce_10kx384_b32", ms=round(dt * 1e3, 3),
         qps=round(b / dt, 1),
         ref_blas_qps=167, vs_ref=round(b / dt / 167, 1))


def config2():
    """100k x 384 exact with fused filter masks (BASELINE config 2)."""
    n, d, b, k = 100_000, 384, 64, 10
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    stats = K.corpus_stats(v)
    for name, sel in (("none", None), ("50pct", 0.5), ("1pct", 0.01)):
        if sel is None:
            mask = jnp.ones((n,), bool)
        else:
            m = np.zeros((n,), bool)
            m[rng.choice(n, int(n * sel), replace=False)] = True
            mask = jnp.asarray(m)
        f = lambda q: K.search_kernel(q, v, stats["sq"], stats["rinv"],
                                      mask, metric=DistanceMetric.COSINE,
                                      k=k, compute_dtype="bfloat16")
        dt = timed(f, qbatches(rng, REPS, b, d))
        emit(exp=f"config2_filtered_100kx384_b64_{name}",
             ms=round(dt * 1e3, 3), qps=round(b / dt, 1))


# ---------------------------------------------------------------------------
# recall-bearing configs use the clustered corpus (quantizers/ANN exploit
# structure; see benchmarks/_data.py)
from _data import clustered_corpus, clustered_queries  # noqa: E402


def config5(n=5_000_000, b=64, k=10, rerank=128):
    """5M x 768 binary prefilter -> exact bf16 re-rank -> graph rescoring."""
    from fastpyvectordb_tpu.quant.binary import BinaryQuantizer, _BQ_TILE_N
    from fastpyvectordb_tpu.quant.scan import _binary_two_stage

    d = 768
    rng = np.random.default_rng(2)
    emit(exp="config5_setup", n=n, d=d, b=b, rerank=rerank)
    v, centers = clustered_corpus(n, d, seed=2)

    # serving copy: bf16 on device (f32 would be 15.4 GB > HBM).
    # Stage carefully — the first attempt held ~4 corpus copies at once
    # (f32 staging temporaries + bf16 parts + the concatenated result =
    # 28.6 GB of live arguments, r2_run.log OOM).  Host-cast to bf16
    # before transfer and write tiles into one donated device buffer so
    # the peak stays at corpus + one tile.
    import functools
    import ml_dtypes
    tile = 500_000

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write(buf, t, start):
        return jax.lax.dynamic_update_slice(buf, t, (start, 0))

    vbf16 = jnp.zeros((n, d), jnp.bfloat16)
    for s in range(0, n, tile):
        t = jnp.asarray(v[s:s + tile].astype(ml_dtypes.bfloat16))
        vbf16 = _write(vbf16, t, jnp.int32(s))
        jax.block_until_ready(vbf16)
        del t
    qz = BinaryQuantizer().train(v[:200_000])
    # encode in tiles (device); block per tile so f32 staging frees
    cparts = []
    for s in range(0, n, tile):
        cp = qz.encode(v[s:s + tile])
        jax.block_until_ready(cp)
        cparts.append(cp)
    codes = jnp.concatenate(cparts)
    jax.block_until_ready(codes)
    del cparts
    codes_t = codes.T
    pad = (-n) % _BQ_TILE_N
    codes_tp = jnp.pad(codes_t, ((0, 0), (0, pad))) if pad else codes_t
    maskp = jnp.concatenate([jnp.ones((n,), bool),
                             jnp.zeros((pad,), bool)]) if pad else \
        jnp.ones((n,), bool)
    jax.block_until_ready((vbf16, codes_tp))
    emit(exp="config5_resident_gb",
         bf16_gb=round(vbf16.nbytes / 2**30, 2),
         codes_gb=round(codes_tp.nbytes / 2**30, 2))

    batches = [jnp.asarray(clustered_queries(centers, b, seed=100 + i))
               for i in range(REPS)]
    c = k * rerank

    def pipeline(q):
        return _binary_two_stage(
            q, qz.thresholds, codes_tp, vbf16, maskp, dims=d,
            metric=DistanceMetric.COSINE, k=k, c=c,
            rerank_dtype="bfloat16")

    # ground truth: exact bf16 scan (for recall)
    stats = K.corpus_stats(vbf16)
    gt = []
    gtf = lambda q: K.search_kernel(q, vbf16, stats["sq"], stats["rinv"],
                                    maskp[:n], metric=DistanceMetric.COSINE,
                                    k=k, compute_dtype="bfloat16",
                                    approx=True)
    dt_exact = timed(gtf, batches)
    for q in batches:
        gt.append(np.asarray(gtf(q)[1]))
    emit(exp="config5_exact_bf16_5Mx768", ms=round(dt_exact * 1e3, 2),
         qps=round(b / dt_exact, 1))

    dt = timed(pipeline, batches)
    _, rows = pipeline(batches[-1])
    rec = recall(rows, gt[-1], k)
    emit(exp="config5_binary_prefilter_rerank_5Mx768",
         ms=round(dt * 1e3, 2), qps=round(b / dt, 1),
         recall_at_10_vs_bf16=round(rec, 4),
         vs_exact=round(dt_exact / dt, 2))

    # hybrid graph rescoring of the final top-k (host-side decay formula,
    # graphdb/hybrid.py: vw*seed/(1+hop) + gw/hop) over a 100k-node entity
    # graph — measures the added cost on top of the device pipeline
    from fastpyvectordb_tpu.graphdb import GraphDB
    g = GraphDB()
    hop_of = {}
    ring = 100_000
    grng = np.random.default_rng(3)
    hops = grng.integers(1, 4, ring)
    for i in range(0, ring, 997):  # sparse node sample is enough for cost
        g.create_node(["Entity"], {"row": int(i)}, id=f"e{i}")
    t0 = time.perf_counter()
    reps = 0
    for q in batches[1:]:
        vals, rows = pipeline(q)
        vals, rows = np.asarray(vals), np.asarray(rows)
        hop = hops[rows % ring]  # hop distance lookup per hit
        rescored = 0.6 * (1.0 - vals) / (1 + hop) + 0.4 / np.maximum(hop, 1)
        order = np.argsort(-rescored, axis=1)
        _ = np.take_along_axis(rows, order, axis=1)
        reps += 1
    dt_g = (time.perf_counter() - t0) / reps
    emit(exp="config5_plus_graph_rescoring", ms=round(dt_g * 1e3, 2),
         qps=round(b / dt_g, 1),
         rescoring_overhead_ms=round((dt_g - dt) * 1e3, 3))


def config5_int8(n=5_000_000, b=64, k=10, rerank=16):
    """5M x 768 int8 two-stage vs the exact bf16 scan — the 1M champion
    (bench.py: int8 beats exact 108.7k vs 97.2k QPS) tested at the scale
    where the binary prefilter needs recall-killing depth (rr384 run:
    0.972 recall at 0.76x exact).  int8 codes stream half the bytes of
    the bf16 corpus with far better coarse ordering than 1-bit."""
    from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
    from fastpyvectordb_tpu.quant.scan import _int8_two_stage

    d = 768
    rng = np.random.default_rng(2)
    emit(exp="config5_int8_setup", n=n, d=d, b=b, rerank=rerank)
    v, centers = clustered_corpus(n, d, seed=2)
    import functools
    import ml_dtypes
    tile = 500_000

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write(buf, t, start):
        return jax.lax.dynamic_update_slice(buf, t, (start, 0))

    vbf16 = jnp.zeros((n, d), jnp.bfloat16)
    for st in range(0, n, tile):
        t = jnp.asarray(v[st:st + tile].astype(ml_dtypes.bfloat16))
        vbf16 = _write(vbf16, t, jnp.int32(st))
        jax.block_until_ready(vbf16)
        del t
    qz = ScalarQuantizer().train(v[:500_000])
    codes = jnp.zeros((n, d), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _write8(buf, t, start):
        return jax.lax.dynamic_update_slice(buf, t, (start, 0))

    for st in range(0, n, tile):
        cp = qz.encode(v[st:st + tile])
        codes = _write8(codes, cp, jnp.int32(st))
        jax.block_until_ready(codes)
        del cp
    vsq, rinv = qz.corpus_stats(codes)
    jax.block_until_ready((vsq, rinv))
    mask = jnp.ones((n,), bool)
    emit(exp="config5_int8_resident_gb",
         bf16_gb=round(vbf16.nbytes / 2**30, 2),
         codes_gb=round(codes.nbytes / 2**30, 2))

    batches = [jnp.asarray(clustered_queries(centers, b, seed=100 + i))
               for i in range(REPS)]
    stats = K.corpus_stats(vbf16)
    gtf = lambda q: K.search_kernel(q, vbf16, stats["sq"], stats["rinv"],
                                    mask, metric=DistanceMetric.COSINE,
                                    k=k, compute_dtype="bfloat16",
                                    approx=True)
    dt_exact = timed(gtf, batches)
    gt = [np.asarray(gtf(q)[1]) for q in batches]
    emit(exp="config5_int8_exactref", ms=round(dt_exact * 1e3, 2),
         qps=round(b / dt_exact, 1))

    for rr in (4, 16):
        c = k * rr
        pipe = lambda q: _int8_two_stage(
            q, codes, qz.vmin, qz.scale, vsq, rinv, vbf16, mask,
            metric=DistanceMetric.COSINE, k=k, c=c, approx=True,
            rerank_dtype="bfloat16")
        dt = timed(pipe, batches)
        _, rows = pipe(batches[-1])
        rec = recall(rows, gt[-1], k)
        emit(exp=f"config5_int8_2stage_rr{rr}_5Mx768",
             ms=round(dt * 1e3, 2), qps=round(b / dt, 1),
             recall_at_10_vs_bf16=round(rec, 4),
             vs_exact=round(dt_exact / dt, 2))


# ---------------------------------------------------------------------------
def crossover(n=1_000_000, k=10):
    """Method x batch-size crossover at 1M x 768."""
    from fastpyvectordb_tpu.core.collection import Collection
    from fastpyvectordb_tpu.core.types import CollectionConfig

    d = 768
    emit(exp="crossover_setup", n=n, d=d)
    v, centers = clustered_corpus(n, d, seed=4)
    col = Collection(CollectionConfig(
        name="x", dimensions=d, metric="cosine", compute_dtype="bfloat16",
        topk="approx"))
    tile = 500_000
    for s in range(0, n, tile):
        col.insert_batch(v[s:s + tile],
                         [f"v{i}" for i in range(s, min(s + tile, n))])
    emit(exp="crossover_ingested", rows=col.count())

    # clustered queries per batch size + exact ground truth for recall
    qsets = {b: [clustered_queries(centers, b, seed=1000 * b + i)
                 for i in range(REPS)]
             for b in (1, 8, 64, 256, 1024)}
    gt_last = {}

    def bench(name, call, b, recall_vs=None):
        batches = qsets[b]
        try:
            call(batches[0])  # warm/compile
            t0 = time.perf_counter()
            for q in batches[1:]:
                out = call(q)
            dt = (time.perf_counter() - t0) / (len(batches) - 1)
            row = {"exp": f"crossover_{name}_b{b}", "ms": round(dt * 1e3, 3),
                   "qps": round(b / dt, 1)}
            rows = np.asarray(out[1])
            if recall_vs is not None:
                gt = recall_vs[b]
                row["recall"] = round(float(np.mean(
                    [len(set(a.tolist()) & set(e.tolist())) / k
                     for a, e in zip(rows, gt)])), 4)
            else:
                gt_last[b] = rows  # exact pass doubles as ground truth
            emit(**row)
        except Exception as e:  # OOM at the largest batches: record, go on
            emit(exp=f"crossover_{name}_b{b}", error=f"{type(e).__name__}",
                 detail=str(e)[:200])

    # exact bf16 (B=1024 is the headline bench.py config)
    for b in (1, 8, 64, 256, 1024):
        bench("exact_bf16", lambda q: col._store.search(
            q, k, DistanceMetric.COSINE, compute_dtype="bfloat16",
            topk="approx"), b)

    # int8 two-stage — the int8 MXU path is 2x bf16 peak and streams half
    # the bytes, so at large batch it can overtake the exact bf16 scan
    col.enable_quantized_scan("int8")
    for b in (1, 8, 64, 256, 1024):
        bench("int8_2stage", lambda q: col._quantized.search(q, k, rerank=4),
              b, recall_vs=gt_last)

    # binary two-stage
    col.enable_quantized_scan("binary")
    for b in (1, 8, 64, 256):
        bench("binary_2stage",
              lambda q: col._quantized.search(q, k, rerank=16), b,
              recall_vs=gt_last)

    # IVF (drop the quantized snapshot first — the cell tensor is another
    # 1.5 GB and HBM is 16 GB)
    col._quantized = None
    t0 = time.perf_counter()
    col.build_ann(kind="ivf")
    emit(exp="crossover_ivf_build", s=round(time.perf_counter() - t0, 1),
         **{kk: vv for kk, vv in col._ann.stats().items()
            if kk in ("nlist", "cmax", "nprobe")})
    for b in (1, 8, 64, 256):
        bench("ivf", lambda q: col._ann.search(q, k), b, recall_vs=gt_last)


def crossover_kernel(n=1_000_000, k=10):
    """Kernel-level method x batch crossover: device-staged query batches,
    direct kernel calls — the hardware truth with the dev-tunnel dispatch
    overhead (~30 ms + ~60 ms/MB H2D in this environment) factored out.
    Shapes match the API-level crossover so compiles are cache hits."""
    from fastpyvectordb_tpu.core.collection import Collection
    from fastpyvectordb_tpu.core.types import CollectionConfig
    from fastpyvectordb_tpu.kernels import distances as Kd
    from fastpyvectordb_tpu.quant.scan import (_binary_two_stage,
                                               _int8_two_stage)

    d = 768
    emit(exp="crossover_kernel_setup", n=n, d=d)
    v, centers = clustered_corpus(n, d, seed=4)
    col = Collection(CollectionConfig(
        name="xk", dimensions=d, metric="cosine", compute_dtype="bfloat16",
        topk="approx"))
    tile = 500_000
    for s in range(0, n, tile):
        col.insert_batch(v[s:s + tile],
                         [f"v{i}" for i in range(s, min(s + tile, n))])
    store = col._store
    metric = DistanceMetric.COSINE

    def qsets(b):
        # pad to the store's pow2 bucket so compiles are shared
        bp = max(8, 1 << (b - 1).bit_length())
        outs = []
        for i in range(REPS):
            q = clustered_queries(centers, b, seed=1000 * b + i)
            outs.append(jnp.asarray(np.pad(q, ((0, bp - b), (0, 0)))))
        jax.block_until_ready(outs)
        return outs

    def run(name, fn, b):
        batches = qsets(b)
        try:
            jax.block_until_ready(fn(batches[0]))
            t0 = time.perf_counter()
            outs = [fn(q) for q in batches[1:]]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / (len(batches) - 1)
            emit(exp=f"kernel_{name}_b{b}", ms=round(dt * 1e3, 3),
                 qps=round(b / dt, 1))
        except Exception as e:
            emit(exp=f"kernel_{name}_b{b}", error=type(e).__name__,
                 detail=str(e)[:160])

    for b in (1, 8, 64, 256, 1024):
        run("exact_bf16", lambda q: Kd.search_kernel(
            q, store.vectors, store.sq, store.rinv, store.valid,
            metric=metric, k=k, compute_dtype="bfloat16", approx=True), b)

    scan = col.enable_quantized_scan("int8")
    qz = scan.quantizer
    vsq, rinv = qz.corpus_stats(scan.codes)
    codes = jnp.asarray(scan.codes)
    m = store.valid[:n]
    for b in (1, 8, 64, 256, 1024):
        run("int8_2stage", lambda q: _int8_two_stage(
            q, codes, qz.vmin, qz.scale, vsq, rinv, store.vectors, m,
            metric=metric, k=k, c=4 * k, approx=True,
            rerank_dtype="bfloat16"), b)

    scan = col.enable_quantized_scan("binary")
    scan._ensure_binary_tpu_layout(n)
    bq = scan.quantizer
    mp = scan._mask_padded(m)
    ct = scan._codes_t_padded
    for b in (1, 8, 64, 256, 1024):
        run("binary_2stage", lambda q: _binary_two_stage(
            q, bq.thresholds, ct, store.vectors, mp, dims=d, metric=metric,
            k=k, c=16 * k, rerank_dtype="bfloat16"), b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*",
                    default=["config1", "config2", "config5", "crossover"])
    ap.add_argument("--rerank", type=int, default=None,
                    help="candidate-depth override for config5")
    args = ap.parse_args()
    for c in args.configs:
        if c == "config5" and args.rerank is not None:
            config5(rerank=args.rerank)
        else:
            globals()[c]()


if __name__ == "__main__":
    main()
