"""Stage decomposition for the grouped IVF dispatch (ann/ivf_grouped.py).

First on-chip run measured 46 ms at np8/q32 — 4x the exact scan it is
supposed to beat.  This lab times cumulative prefixes of the pipeline so
the slow stage is identified by subtraction, all at the benchmark
configuration (1M x 768 clustered, B=1024, nlist=2048).

  s1_route      centroid matmul + top_k(nprobe)
  s2_invert     + sort/rank/scatter slot table
  s3_gather     + query-slot gather (nlist, qcap, D)
  s4_matmul     + batched cell matmul (nlist, qcap, cmax) + epilogue
  s5_topk       + per-slot top-k
  s6_full       + regroup + overflow + final merge  (== the kernel)

Run serially on the chip.
"""

import functools
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
from fastpyvectordb_tpu.kernels.distances import MASKED, matmul_precision

N = int(os.environ.get("IVFG_N", 1_000_000))
D = int(os.environ.get("IVFG_D", 768))
B = int(os.environ.get("IVFG_B", 1024))
K = 10
NLIST = int(os.environ.get("IVFG_NLIST", 2048))
NPROBE = int(os.environ.get("IVFG_NPROBE", 8))
QCAP = int(os.environ.get("IVFG_QCAP", 32))
REPS = 6


def emit(**kw):
    print(json.dumps(kw), flush=True)


@functools.partial(jax.jit, static_argnames=("metric", "nprobe", "qcap",
                                             "stage", "k"))
def staged(q, centroids, cells, row_table, validmask, cell_norms, *,
           metric, k, nprobe, qcap, stage):
    b, d = q.shape
    nlist, cmax = row_table.shape
    prec = matmul_precision("bfloat16")
    qf = q.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30)
    cn = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    croute = -jnp.dot(qn, cn.T, preferred_element_type=jnp.float32,
                      precision=prec)
    _, probe = jax.lax.top_k(-croute, nprobe)
    if stage == 1:
        return probe
    m = b * nprobe
    flat_cell = probe.reshape(-1).astype(jnp.int32)
    flat_q = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nprobe)
    prank = jnp.tile(jnp.arange(nprobe, dtype=jnp.int32), b)
    order = jnp.argsort(flat_cell * nprobe + prank)
    scell = flat_cell[order]
    squery = flat_q[order]
    pos = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), scell[1:] != scell[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0))
    rank = pos - run_start
    keep = rank < qcap
    qslot = jnp.full((nlist, qcap), -1, jnp.int32)
    qslot = qslot.at[scell, rank].set(squery, mode="drop")
    inv = jnp.zeros((m,), jnp.int32).at[order].set(pos)
    pair_rank = rank[inv]
    pair_keep = keep[inv]
    if stage == 2:
        return qslot, pair_rank, pair_keep
    slot_q = jnp.maximum(qslot, 0)
    qblk = jnp.take(qf.astype(jnp.bfloat16), slot_q.reshape(-1),
                    axis=0).reshape(nlist, qcap, d)
    if stage == 3:
        return qblk
    cross = jax.lax.dot_general(
        qblk, cells, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)
    qsq = jnp.einsum("bd,bd->b", qf, qf, preferred_element_type=jnp.float32)
    qinv = 1.0 / jnp.maximum(jnp.sqrt(qsq), 1e-30)
    rinv = jax.lax.rsqrt(jnp.maximum(cell_norms, 1e-30))
    s = 1.0 - cross * jnp.take(qinv, slot_q, axis=0)[:, :, None] \
        * rinv[:, None, :]
    okc = (row_table >= 0) & jnp.take(validmask,
                                      jnp.maximum(row_table, 0), axis=0)
    s = jnp.where(okc[:, None, :], s, MASKED)
    if stage == 4:
        return jnp.sum(s, axis=(1, 2))  # cheap forced materialization
    t = min(k, cmax)
    neg, lidx = jax.lax.top_k(-s.reshape(nlist * qcap, cmax), t)
    slot_vals = -neg
    cellid = jnp.repeat(jnp.arange(nlist, dtype=jnp.int32), qcap)
    slot_rows = row_table[cellid[:, None], lidx]
    if stage == 5:
        return slot_vals, slot_rows
    flat_slot = flat_cell * qcap + jnp.minimum(pair_rank, qcap - 1)
    pv = jnp.take(slot_vals, flat_slot, axis=0)
    pr = jnp.take(slot_rows, flat_slot, axis=0)
    pv = jnp.where(pair_keep[:, None], pv, MASKED)
    cand_vals = pv.reshape(b, nprobe * t)
    cand_rows = pr.reshape(b, nprobe * t)
    neg, posk = jax.lax.top_k(-cand_vals, k)
    return -neg, jnp.take_along_axis(cand_rows, posk, axis=1)


def main():
    key = jax.random.PRNGKey(0)
    kv, kc, ka = jax.random.split(key, 3)
    n_centers = 1024
    centers = 2.0 * jax.random.normal(kc, (n_centers, D), dtype=jnp.float32)
    assign = jax.random.randint(ka, (N,), 0, n_centers)
    v32 = centers[assign] + jax.random.normal(kv, (N, D), dtype=jnp.float32)
    v32 = v32 / jnp.linalg.norm(v32, axis=1, keepdims=True)
    host_v = np.asarray(v32)
    del v32
    col = Collection(CollectionConfig(
        name="ivfl", dimensions=D, metric="cosine",
        compute_dtype="bfloat16", storage_dtype="bfloat16", topk="auto"))
    for s in range(0, N, 250_000):
        col.insert_batch(host_v[s:s + 250_000],
                         [f"v{s + i}" for i in range(min(250_000, N - s))])
    del host_v
    t0 = time.perf_counter()
    col.build_ann(nlist=NLIST, nprobe=NPROBE, iters=8)
    emit(exp="built", s=round(time.perf_counter() - t0, 1),
         **col._ann.stats())
    idx = col._ann
    cnorms = idx._cell_norms_cached()
    validmask = col._store.valid
    qb = []
    for i in range(REPS + 1):
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
        qa = jax.random.randint(k1, (B,), 0, n_centers)
        qb.append(centers[qa] + 0.5 * jax.random.normal(
            k2, (B, D), dtype=jnp.float32))

    for stage in (1, 2, 3, 4, 5, 6):
        def run(q):
            return staged(q, idx.centroids, idx.cells, idx.row_table,
                          validmask, cnorms, metric=DistanceMetric.COSINE,
                          k=K, nprobe=NPROBE, qcap=QCAP, stage=stage)
        jax.block_until_ready(run(qb[0]))
        t0 = time.perf_counter()
        outs = [run(q) for q in qb[1:]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / (len(qb) - 1)
        emit(exp=f"s{stage}", ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
