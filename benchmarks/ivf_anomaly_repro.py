"""Minimal repro for ROADMAP #14: IVF batch-256 returned worse results than
batch-64 on IDENTICAL queries at 1M x 768 in round 1.

Round-2 findings so far:
  * the corpus must be CLUSTERED (r1's setup) — on uniform Gaussian data
    IVF recall is legitimately poor at any batch size and the comparison
    is meaningless;
  * at r1's default nprobe=32 with nlist=2000 the B=256 block gather is
    (256, 32, cmax, 768) bf16 ~ 18 GB and the compile simply OOMs HBM —
    large batches are a capacity cliff, not a silent-wrong-answer mode.
    This repro uses r1's measured anomaly config (nlist=2048, nprobe=8,
    gather ~2.3 GB) where B=256 compiles, to test for a true mismatch.

Bisects: batch size (64/128/256) x approx/exact final top-k, plus the
cell gather isolated with checksums.  One JSON line per measurement.
"""

import json

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from _data import clustered_corpus, clustered_queries
from fastpyvectordb_tpu.ann.ivf import _ivf_search_kernel
from fastpyvectordb_tpu.core.collection import Collection
from fastpyvectordb_tpu.core.types import CollectionConfig, DistanceMetric

N, D, K, NLIST, NPROBE = 1_000_000, 768, 10, 2048, 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    v, centers = clustered_corpus(N, D, seed=0)
    col = Collection(CollectionConfig(name="r", dimensions=D,
                                      metric="cosine",
                                      compute_dtype="bfloat16"))
    for s in range(0, N, 500_000):
        e = min(s + 500_000, N)
        col.insert_batch(v[s:e], [f"v{i}" for i in range(s, e)])
    col.build_ann(kind="ivf", nlist=NLIST, nprobe=NPROBE)
    ivf = col._ann
    emit(exp="setup", nlist=int(ivf.centroids.shape[0]),
         cmax=int(ivf.row_table.shape[1]), nprobe=NPROBE,
         gather_gb=round(256 * NPROBE * ivf.row_table.shape[1] * D * 2
                         / 2**30, 2))

    q = clustered_queries(centers, 256, seed=1)
    # exact ground truth
    _, gt = col._store.search(q, K, DistanceMetric.COSINE,
                              compute_dtype="bfloat16", topk="approx")
    gt = np.asarray(gt)

    def run(mqb, approx):
        outs = []
        for s in range(0, 256, mqb):
            sub = jnp.asarray(q[s: s + mqb])
            import jax.numpy as jnp2
            dd_ = ivf.centroids.shape[1]
            _, r = _ivf_search_kernel(
                sub, ivf.centroids, ivf.cells, ivf.row_table,
                ivf.overflow_vecs, ivf.overflow_rows, *ivf._ok_cached(),
                jnp2.zeros((dd_,), jnp2.float32),
                jnp2.ones((dd_,), jnp2.float32),
                jnp2.zeros((1, 1), jnp2.float32),
                metric=DistanceMetric.COSINE,
                k=min(K, ivf.row_table.shape[1] * NPROBE), nprobe=NPROBE,
                compute_dtype="bfloat16", approx=approx)
            outs.append(np.asarray(r))
        return np.concatenate(outs)

    base = run(64, True)
    rec_base = np.mean([len(set(a.tolist()) & set(e.tolist())) / K
                        for a, e in zip(base, gt)])
    emit(exp="baseline_mqb64_approx", recall=round(float(rec_base), 4))

    for mqb in (128, 256):
        for approx in (True, False):
            try:
                rows = run(mqb, approx)
            except Exception as e:
                emit(exp=f"mqb{mqb}_{'approx' if approx else 'exact'}",
                     error=type(e).__name__, detail=str(e)[:160])
                continue
            rec = np.mean([len(set(a.tolist()) & set(e.tolist())) / K
                           for a, e in zip(rows, gt)])
            agree = np.mean([len(set(a.tolist()) & set(b.tolist())) / K
                             for a, b in zip(rows, base)])
            emit(exp=f"mqb{mqb}_{'approx' if approx else 'exact'}",
                 recall=round(float(rec), 4),
                 agree_with_mqb64=round(float(agree), 4))

    # isolate the big gather: checksum of gathered candidate rows must be
    # identical for the same query regardless of batch size
    @jax.jit
    def gather_checksum(sub):
        qf = sub.astype(jnp.float32)
        cn = ivf.centroids / jnp.maximum(
            jnp.linalg.norm(ivf.centroids, axis=1, keepdims=True), 1e-30)
        qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True),
                              1e-30)
        croute = -jnp.dot(qn, cn.T, preferred_element_type=jnp.float32)
        _, probe = jax.lax.top_k(-croute, NPROBE)
        vecs = jnp.take(ivf.cells, probe, axis=0)
        return jnp.sum(vecs.astype(jnp.float32), axis=(1, 2, 3)), probe

    cs64, pr64 = [], []
    for s in range(0, 256, 64):
        c, p = gather_checksum(jnp.asarray(q[s: s + 64]))
        cs64.append(np.asarray(c))
        pr64.append(np.asarray(p))
    cs64 = np.concatenate(cs64)
    pr64 = np.concatenate(pr64)
    c256, p256 = gather_checksum(jnp.asarray(q))
    c256, p256 = np.asarray(c256), np.asarray(p256)
    emit(exp="gather_isolation",
         probe_rows_identical=bool((pr64 == p256).all()),
         checksum_max_abs_diff=float(np.abs(cs64 - c256).max()),
         checksum_rel_diff=float(np.abs(cs64 - c256).max()
                                 / max(np.abs(cs64).max(), 1e-9)))


if __name__ == "__main__":
    main()
