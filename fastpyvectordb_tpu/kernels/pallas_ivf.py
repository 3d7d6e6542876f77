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


def _kernel_f(q_ref, c_ref, norms_ref, ok_ref, qstat_ref, out_ref, *,
              metric: DistanceMetric):
    cross = jax.lax.dot_general(
        q_ref[0], c_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = _epilogue(cross, norms_ref[0, 0], ok_ref[0, 0],
                           qstat_ref[0, 0], metric)


def _kernel_i8(q_ref, c_ref, norms_ref, ok_ref, sscale_ref, sconst_ref,
               qstat_ref, out_ref, *, metric: DistanceMetric):
    cross_i = jax.lax.dot_general(
        q_ref[0], c_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    cross = (cross_i.astype(jnp.float32) * sscale_ref[0, 0][:, None]
             + sconst_ref[0, 0][:, None])
    out_ref[0] = _epilogue(cross, norms_ref[0, 0], ok_ref[0, 0],
                           qstat_ref[0, 0], metric)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def grouped_cell_scores(qblk: jnp.ndarray,     # (nlist, qcap, D) bf16/f32
                        cells: jnp.ndarray,    # (nlist, cmax, D) same dtype
                        norms: jnp.ndarray,    # (nlist, cmax) f32 ||x||^2
                        okf: jnp.ndarray,      # (nlist, cmax) f32 1.0=valid
                        qstat: jnp.ndarray,    # (nlist, qcap) f32
                        *, metric: DistanceMetric,
                        interpret: bool = False) -> jnp.ndarray:
    nlist, qcap, d = qblk.shape
    cmax = cells.shape[1]
    kernel = functools.partial(_kernel_f, metric=metric)
    return pl.pallas_call(
        kernel,
        grid=(nlist,),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmax, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qcap, cmax), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nlist, qcap, cmax), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nlist * qcap * cmax * d,
            bytes_accessed=(cells.size * cells.dtype.itemsize
                            + qblk.size * qblk.dtype.itemsize
                            + nlist * qcap * cmax * 4),
            transcendentals=nlist * cmax),
        interpret=interpret,
    )(qblk, cells, norms[:, None, :], okf[:, None, :], qstat[:, None, :])


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def grouped_cell_scores_i8(qblk: jnp.ndarray,    # (nlist, qcap, D) int8
                           cells: jnp.ndarray,   # (nlist, cmax, D) int8
                           norms: jnp.ndarray,   # (nlist, cmax) f32
                           okf: jnp.ndarray,     # (nlist, cmax) f32
                           sscale: jnp.ndarray,  # (nlist, qcap) f32
                           sconst: jnp.ndarray,  # (nlist, qcap) f32
                           qstat: jnp.ndarray,   # (nlist, qcap) f32
                           *, metric: DistanceMetric,
                           interpret: bool = False) -> jnp.ndarray:
    nlist, qcap, d = qblk.shape
    cmax = cells.shape[1]
    kernel = functools.partial(_kernel_i8, metric=metric)
    return pl.pallas_call(
        kernel,
        grid=(nlist,),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmax, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qcap, cmax), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nlist, qcap, cmax), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nlist * qcap * cmax * d,
            bytes_accessed=(cells.size + qblk.size
                            + nlist * qcap * cmax * 4),
            transcendentals=nlist * cmax),
        interpret=interpret,
    )(qblk, cells, norms[:, None, :], okf[:, None, :], sscale[:, None, :],
      sconst[:, None, :], qstat[:, None, :])
