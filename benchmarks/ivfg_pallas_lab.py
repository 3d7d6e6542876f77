"""Stage decomposition of the PALLAS grouped-IVF dispatch on synthetic
tensors shaped like the 4M x 768 build (nlist=4096, cmax=1280, qcap=8).

HISTORICAL RECORD (2026-08-18): the ``staged`` copy below reproduces the
PRE-FIX pipeline that computed ``validmask[row_table]`` per call — the
decomposition it produced (s4 = 40 of 43 ms; everything else 1.4 ms) is
the evidence behind ann/ivf.py:ok_slot_masks.  The shipped kernel now
takes the precomputed mask (full_kernel row: 2.65 ms at this shape).

The 4M/B=256 run measured 51 ms for a pipeline whose roofline is ~4 ms;
an isolated-inputs probe put the pallas score stage at 6.5 ms and the
route/invert/gather prologue at 0.05 ms, so ~44 ms hides in what's left:
the validity-mask gather (okc: a 5.2M-element take from the capacity
mask), the score regroup, and the final merge.  This lab times
cumulative prefixes of a faithful copy of ann/ivf_grouped.py's pallas
path as separate dispatches; stage costs fall out by subtraction.

  s1  route (centroid matmul + top_k)
  s2  + invert/compact (sort, rank, slot tables)
  s3  + qblk/qstat/sscale/sconst gathers (pallas inputs except okf)
  s4  + okc gather (row_table -> validmask take) + okf cast
  s5  + pallas grouped_cell_scores_i8
  s6  + regroup + final top-k (== full kernel, no overflow)

Variants:
  s4_norowvalid   okc = (row_table >= 0) only — prices the validmask take
  full            the shipped grouped_ivf_search_kernel (no overflow)

Run serially on the chip:  python benchmarks/ivfg_pallas_lab.py
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

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.ann.ivf_grouped import grouped_ivf_search_kernel
from fastpyvectordb_tpu.kernels.distances import MASKED
from fastpyvectordb_tpu.kernels.pallas_ivf import grouped_cell_scores_i8

NLIST = int(os.environ.get("LAB_NLIST", 4096))
CMAX = int(os.environ.get("LAB_CMAX", 1280))
D = int(os.environ.get("LAB_D", 768))
B = int(os.environ.get("LAB_B", 256))
NPROBE = int(os.environ.get("LAB_NPROBE", 8))
QCAP = int(os.environ.get("LAB_QCAP", 8))
CAP = 1 << 23
K = 10
REPS = 6


def emit(**kw):
    print(json.dumps(kw), flush=True)


_RTT_MS = 0.0


def _first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def _fetch(out):
    """Force completion by pulling one element to the host.

    jax.block_until_ready is UNRELIABLE through the axon tunnel: it
    sometimes returns before the dispatch has executed (measured 0.03 ms
    for a 6.5 ms pallas call, 2026-08-18 probe).  A host fetch of any
    output element is a true barrier: the device executes dispatches in
    submission order, so fetching the LAST output drains the pipeline.
    """
    leaf = _first_leaf(out)
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def measure_rtt(x):
    """Round-trip floor: fetch a tiny pre-existing device array."""
    global _RTT_MS
    _fetch(x)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _fetch(x)
    _RTT_MS = (time.perf_counter() - t0) / reps * 1e3
    return _RTT_MS


def timed(run, qs):
    _fetch(run(qs[0]))
    t0 = time.perf_counter()
    out = None
    for q in qs[1:]:
        out = run(q)
    _fetch(out)
    wall = (time.perf_counter() - t0) * 1e3
    return max(wall - _RTT_MS, 0.0) / (len(qs) - 1)


@functools.partial(jax.jit, static_argnames=(
    "nprobe", "qcap", "k", "stage", "rowvalid_only"))
def staged(q, centroids, cells, row_table, validmask, cell_norms,
           vmin, scale, *, nprobe, qcap, k, stage, rowvalid_only=False):
    """Faithful copy of the ann/ivf_grouped.py pallas path, cut at
    `stage`.  Cosine metric, int8 cells."""
    b, d = q.shape
    nlist, cmax = row_table.shape
    qf = q.astype(jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30)
    cn = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
    croute = -jnp.dot(qn, cn.T, preferred_element_type=jnp.float32)
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
    dropped = jnp.sum(~keep).astype(jnp.int32)
    inv = jnp.zeros((m,), jnp.int32).at[order].set(pos)
    pair_rank = rank[inv]
    pair_keep = keep[inv]
    u = min(nlist, m)
    u_idx = (jnp.cumsum(is_start) - 1).astype(jnp.int32)
    n_uniq = (u_idx[-1] + 1).astype(jnp.int32)
    compact_cells = jnp.zeros((u,), jnp.int32).at[u_idx].set(
        scell, mode="drop")
    cell_list = jnp.concatenate([n_uniq[None], compact_cells])
    qslot_c = jnp.full((u, qcap), -1, jnp.int32).at[u_idx, rank].set(
        squery, mode="drop")
    slot_qc = jnp.maximum(qslot_c, 0)
    cid_pair = u_idx[inv]
    if stage == 2:
        return cell_list, slot_qc, pair_rank, dropped
    qsq = jnp.einsum("bd,bd->b", qf, qf, preferred_element_type=jnp.float32)
    qinv = 1.0 / jnp.maximum(jnp.sqrt(qsq), 1e-30)
    qstat = jnp.take(qinv, slot_qc, axis=0)
    rs = scale / 255.0
    qsc = qf * rs[None, :]
    const = jnp.dot(qf, 128.0 * rs + vmin,
                    preferred_element_type=jnp.float32)
    qmax = jnp.max(jnp.abs(qsc), axis=1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-30) / 127.0
    qi = jnp.clip(jnp.round(qsc / qscale), -127, 127).astype(jnp.int8)
    qblk = jnp.take(qi, slot_qc.reshape(-1), axis=0).reshape(u, qcap, d)
    sscale = jnp.take(qscale[:, 0], slot_qc, axis=0)
    sconst = jnp.take(const, slot_qc, axis=0)
    if stage == 3:
        return qblk, qstat, sscale, sconst
    if rowvalid_only:
        okc = row_table >= 0
    else:
        okc = (row_table >= 0) & jnp.take(
            validmask, jnp.maximum(row_table, 0), axis=0)
    okf = okc.astype(jnp.float32)
    if stage == 4:
        return jnp.sum(okf)
    s = grouped_cell_scores_i8(
        cell_list, qblk, cells, cell_norms, okf, sscale, sconst, qstat,
        metric=DistanceMetric.COSINE)
    if stage == 5:
        return jnp.sum(s, axis=(1, 2))
    flat_slot = cid_pair * qcap + jnp.minimum(pair_rank, qcap - 1)
    pv = jnp.take(s.reshape(u * qcap, cmax), flat_slot, axis=0)
    pr = jnp.take(row_table, flat_cell, axis=0)
    pv = jnp.where(pair_keep[:, None], pv, MASKED)
    cand_vals = pv.reshape(b, nprobe * cmax)
    cand_rows = pr.reshape(b, nprobe * cmax)
    kk = min(k, cand_vals.shape[1])
    neg, posk = jax.lax.top_k(-cand_vals, kk)
    return -neg, jnp.take_along_axis(cand_rows, posk, axis=1)


def main():
    rng = np.random.default_rng(0)
    n_homes = 1024
    centers = rng.standard_normal((n_homes, D)).astype(np.float32)
    reps = max(NLIST // n_homes, 1)
    centroids = (np.repeat(centers, reps, axis=0)[:NLIST]
                 + 0.3 * rng.standard_normal((NLIST, D))).astype(np.float32)
    cells = rng.integers(-127, 128, (NLIST, CMAX, D), dtype=np.int8)
    fill = (rng.random((NLIST, CMAX)) < 0.8)
    row_table = np.where(fill, rng.integers(0, CAP, (NLIST, CMAX)),
                         -1).astype(np.int32)
    cell_norms = (D / 3.0 * (1.0 + 0.1 * rng.standard_normal(
        (NLIST, CMAX)))).astype(np.float32)

    d_centroids = jnp.asarray(centroids)
    d_cells = jnp.asarray(cells)
    d_rows = jnp.asarray(row_table)
    d_norms = jnp.asarray(cell_norms)
    d_valid = jnp.ones((CAP,), dtype=bool)
    vmin = jnp.full((D,), -4.0, jnp.float32)
    scale = jnp.full((D,), 8.0, jnp.float32)
    overflow_vecs = jnp.zeros((0, D), jnp.bfloat16)
    overflow_rows = jnp.zeros((0,), jnp.int32)

    qs = []
    for i in range(REPS + 1):
        homes = rng.integers(0, n_homes, B)
        qs.append(jnp.asarray(
            (centers[homes] + 0.5 * rng.standard_normal((B, D))
             ).astype(np.float32)))

    emit(exp="setup", nlist=NLIST, cmax=CMAX, d=D, b=B, nprobe=NPROBE,
         qcap=QCAP, cells_gb=round(cells.nbytes / 2**30, 2))
    emit(exp="rtt", ms=round(measure_rtt(vmin), 2))

    def runner(stage, rowvalid_only=False):
        return lambda q: staged(
            q, d_centroids, d_cells, d_rows, d_valid, d_norms, vmin, scale,
            nprobe=NPROBE, qcap=QCAP, k=K, stage=stage,
            rowvalid_only=rowvalid_only)

    for stage in (1, 2, 3, 4, 5, 6):
        ms = timed(runner(stage), qs)
        emit(exp=f"s{stage}", ms=round(ms, 2))
    ms = timed(runner(4, rowvalid_only=True), qs)
    emit(exp="s4_norowvalid", ms=round(ms, 2))
    ms = timed(runner(6, rowvalid_only=True), qs)
    emit(exp="s6_norowvalid", ms=round(ms, 2))

    # shipped kernel, post-fix signature: ok-mask precomputed by the caller
    okc = (d_rows >= 0) & jnp.take(d_valid, jnp.maximum(d_rows, 0), axis=0)
    oko = jnp.zeros((0,), bool)
    ms = timed(lambda q: grouped_ivf_search_kernel(
        q, d_centroids, d_cells, d_rows, overflow_vecs, overflow_rows,
        okc, oko, vmin, scale, d_norms, metric=DistanceMetric.COSINE,
        k=K, nprobe=NPROBE, qcap=QCAP, compute_dtype="bfloat16"), qs)
    emit(exp="full_kernel", ms=round(ms, 2))


if __name__ == "__main__":
    main()
