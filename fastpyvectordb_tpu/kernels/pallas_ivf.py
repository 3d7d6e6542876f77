"""Pallas TPU kernel for the grouped (cell-major) IVF score stage.

XLA lowers the batched cell matmul

    (nlist, qcap, D) x (nlist, cmax, D) -> (nlist, qcap, cmax)

as nlist independent tiny matmuls and measured 15+ ms at the 1M
benchmark shape (nlist=2048, qcap=32, cmax=736, D=768 — see
benchmarks/ivf_grouped_lab.py s4-s3), ~5x over roofline even counting
the M=qcap MXU row underutilization.  This kernel runs the same
computation as ONE pallas_call with a grid over cells: each step streams
one cell block (and its slot-query block) HBM->VMEM through the
automatic grid pipeline, runs the (qcap, D) x (D, cmax) contraction on
the MXU, applies the metric epilogue + validity mask on the VPU in
VMEM, and writes the finished (qcap, cmax) score tile.

**Dynamic cell selection via scalar prefetch.**  The grid walks the
batch's COMPACT probed-cell list (``cell_ids``, scalar-prefetched), not
the full cell table: the cells/norms/ok BlockSpec index maps read
``cell_ids[1 + i]``, so only cells some query actually probes are
fetched from HBM.  ``cell_ids[0]`` carries the batch's TRUE unique-cell
count: compact slots past it alias cell 0 (the pipeline only re-fetches
a block when its index CHANGES between consecutive grid steps, so the
padding tail costs one fetch) and their matmul/epilogue/store is
skipped entirely via ``pl.when`` — their output tiles are never read
back (ann/ivf_grouped.py gathers only real pair slots).
At 4M x 768 / nlist=4096 the undiscriminating grid streamed the whole
4 GB cell tensor per batch (benchmarks/r3_ivf_grouped_4m.jsonl); with
clustered queries the unique probed set is a fraction of that.

Shapes must be lane/sublane aligned: D and cmax multiples of 128, qcap a
multiple of 8 (the IVF build rounds cell capacity to 128 —
ann/ivf.py:build).  Off-TPU callers use interpret mode (tests) or the
XLA fallback path in ann/ivf_grouped.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import DistanceMetric
from .distances import MASKED


def _epilogue(cross, norms, ok, qstat, metric):
    """cross (qcap, cmax) f32 -> masked metric scores (lower = closer).
    norms/ok: (cmax,) f32; qstat: (qcap,) f32 (cosine: 1/||q||, l2:
    ||q||^2, dot: unused)."""
    if metric == DistanceMetric.COSINE:
        rinv = jax.lax.rsqrt(jnp.maximum(norms, 1e-30))
        s = 1.0 - cross * qstat[:, None] * rinv[None, :]
    elif metric == DistanceMetric.L2:
        s = jnp.maximum(qstat[:, None] + norms[None, :] - 2.0 * cross, 0.0)
    else:
        s = -cross
    return jnp.where(ok[None, :] > 0.5, s, MASKED)


def _kernel_f(cids_ref, q_ref, c_ref, norms_ref, ok_ref, qstat_ref,
              out_ref, *, metric: DistanceMetric):
    @pl.when(pl.program_id(0) < cids_ref[0])  # skip the padding tail
    def _():
        cross = jax.lax.dot_general(
            q_ref[0], c_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] = _epilogue(cross, norms_ref[0, 0], ok_ref[0, 0],
                               qstat_ref[0, 0], metric)


def _kernel_i8(cids_ref, q_ref, c_ref, norms_ref, ok_ref, sscale_ref,
               sconst_ref, qstat_ref, out_ref, *, metric: DistanceMetric):
    @pl.when(pl.program_id(0) < cids_ref[0])
    def _():
        cross_i = jax.lax.dot_general(
            q_ref[0], c_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        cross = (cross_i.astype(jnp.float32) * sscale_ref[0, 0][:, None]
                 + sconst_ref[0, 0][:, None])
        out_ref[0] = _epilogue(cross, norms_ref[0, 0], ok_ref[0, 0],
                               qstat_ref[0, 0], metric)


def _cell_spec(shape):
    """BlockSpec over a full-table input, block chosen by cell_ids[1+i]
    (slot 0 of the prefetch array carries the unique-cell count)."""
    return pl.BlockSpec(shape, lambda i, cids: (cids[i + 1], 0, 0),
                        memory_space=pltpu.VMEM)


def _slot_spec(shape):
    """BlockSpec over a compact (U, ...) input, block = grid step."""
    return pl.BlockSpec(shape, lambda i, cids: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def grouped_cell_scores(cell_ids: jnp.ndarray,  # (U+1,) int32: [n_uniq,
                        #   compact->cell...]; slots >= n_uniq are skipped
                        qblk: jnp.ndarray,     # (U, qcap, D) bf16/f32
                        cells: jnp.ndarray,    # (nlist, cmax, D) same dtype
                        norms: jnp.ndarray,    # (nlist, cmax) f32 ||x||^2
                        okf: jnp.ndarray,      # (nlist, cmax) f32 1.0=valid
                        qstat: jnp.ndarray,    # (U, qcap) f32
                        *, metric: DistanceMetric,
                        interpret: bool = False) -> jnp.ndarray:
    u, qcap, d = qblk.shape
    cmax = cells.shape[1]
    kernel = functools.partial(_kernel_f, metric=metric)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(u,),
        in_specs=[
            _slot_spec((1, qcap, d)),
            _cell_spec((1, cmax, d)),
            _cell_spec((1, 1, cmax)),
            _cell_spec((1, 1, cmax)),
            _slot_spec((1, 1, qcap)),
        ],
        out_specs=pl.BlockSpec((1, qcap, cmax), lambda i, cids: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u, qcap, cmax), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * u * qcap * cmax * d,
            bytes_accessed=(u * cmax * d * cells.dtype.itemsize
                            + qblk.size * qblk.dtype.itemsize
                            + u * qcap * cmax * 4),
            transcendentals=u * cmax),
        interpret=interpret,
    )(cell_ids, qblk, cells, norms[:, None, :], okf[:, None, :],
      qstat[:, None, :])


def _kernel_pq(cids_ref, lutq_ref, codes_ref, out_ref, *, kk: int):
    @pl.when(pl.program_id(0) < cids_ref[0])  # skip the padding tail
    def _():
        ct = codes_ref[0].astype(jnp.int32)            # (M, CT)
        m, c = ct.shape
        # one-hot expansion lives ONLY in VMEM: onehot[m, k, c] =
        # (codes[m, c] == k), reshaped to the (M*K, CT) matmul operand.
        # This is the whole point of the grouped PQ dispatch — the
        # per-query kernel materializes the same expansion per (query,
        # probe) pair through HBM (ann/ivfpq.py:_adc_sum), ~37 MB/query.
        # tiny (1, K, 1) iota broadcast against (M, 1, CT) codes: the only
        # materialized intermediate is the (M, K, CT) one-hot itself, not
        # a full-size int32 index tensor
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, kk, 1), 1)
        onehot = (ct[:, None, :] == iota_k).astype(jnp.bfloat16)
        out_ref[0] = jax.lax.dot_general(
            lutq_ref[0], onehot.reshape(m * kk, c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def pq_cmax_tile(cmax: int, m: int, kk: int,
                 budget_bytes: int = 4 << 20) -> int:
    """Largest 128-multiple divisor of cmax whose in-kernel one-hot
    ((M, K, CT) bf16 + its int32 iota) stays under ~3x budget_bytes of
    VMEM.  cmax is always a multiple of 128 (ann/ivf.py rounds cell
    capacity up)."""
    best = 128
    t = 128
    while t <= cmax:
        if cmax % t == 0 and m * kk * t * 2 <= budget_bytes:
            best = t
        t += 128
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_cell_scores_pq(cell_ids: jnp.ndarray,  # (U+1,) int32:
                           #   [n_uniq, compact->cell ids...]
                           lutq: jnp.ndarray,     # (U, qcap, M*K) bf16 —
                           #   per-slot flattened ADC tables
                           codes_t: jnp.ndarray,  # (nlist, M, cmax) uint8
                           #   TRANSPOSED cell-major PQ codes
                           *, interpret: bool = False) -> jnp.ndarray:
    """Raw ADC cross-products for the grouped IVF-PQ dispatch:

        out[u, s, c] = sum_m lutq[u, s, m*K + codes_t[cell_ids[1+u], m, c]]

    computed as ONE (qcap, M*K) x (M*K, CT) MXU matmul per (cell, cmax-
    tile) grid step, with the codes' one-hot expansion done on the VPU in
    VMEM.  The metric epilogue (q-centroid term, reconstruction norms,
    validity) is applied by the caller at the regroup stage — this kernel
    only produces the code-dependent residual term, so it needs no
    per-cell norm/ok blocks.

    Alignment: cmax % 128 == 0 (cell build guarantees), M*K % 128 == 0,
    qcap % 8 == 0.  K is recovered from M*K / M.
    """
    u, qcap, mk = lutq.shape
    nlist, m, cmax = codes_t.shape
    kk = mk // m
    ct = pq_cmax_tile(cmax, m, kk)
    kernel = functools.partial(_kernel_pq, kk=kk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # j (cmax tiles) minor: the lutq block index stays (i, 0, 0)
        # across the inner loop, so each slot block is fetched once
        grid=(u, cmax // ct),
        in_specs=[
            pl.BlockSpec((1, qcap, mk), lambda i, j, cids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, ct), lambda i, j, cids: (cids[i + 1], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qcap, ct), lambda i, j, cids: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u, qcap, cmax), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * u * qcap * cmax * mk,
            bytes_accessed=(u * m * cmax            # codes, once per cell
                            + lutq.size * 2
                            + u * qcap * cmax * 4),
            transcendentals=0),
        interpret=interpret,
    )(cell_ids, lutq, codes_t)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def grouped_cell_scores_i8(cell_ids: jnp.ndarray,  # (U+1,) int32:
                           #   [n_uniq, compact->cell...]
                           qblk: jnp.ndarray,    # (U, qcap, D) int8
                           cells: jnp.ndarray,   # (nlist, cmax, D) int8
                           norms: jnp.ndarray,   # (nlist, cmax) f32
                           okf: jnp.ndarray,     # (nlist, cmax) f32
                           sscale: jnp.ndarray,  # (U, qcap) f32
                           sconst: jnp.ndarray,  # (U, qcap) f32
                           qstat: jnp.ndarray,   # (U, qcap) f32
                           *, metric: DistanceMetric,
                           interpret: bool = False) -> jnp.ndarray:
    u, qcap, d = qblk.shape
    cmax = cells.shape[1]
    kernel = functools.partial(_kernel_i8, metric=metric)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(u,),
        in_specs=[
            _slot_spec((1, qcap, d)),
            _cell_spec((1, cmax, d)),
            _cell_spec((1, 1, cmax)),
            _cell_spec((1, 1, cmax)),
            _slot_spec((1, 1, qcap)),
            _slot_spec((1, 1, qcap)),
            _slot_spec((1, 1, qcap)),
        ],
        out_specs=pl.BlockSpec((1, qcap, cmax), lambda i, cids: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((u, qcap, cmax), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * u * qcap * cmax * d,
            bytes_accessed=(u * cmax * d + qblk.size
                            + u * qcap * cmax * 4),
            transcendentals=u * cmax),
        interpret=interpret,
    )(cell_ids, qblk, cells, norms[:, None, :], okf[:, None, :],
      sscale[:, None, :], sconst[:, None, :], qstat[:, None, :])
