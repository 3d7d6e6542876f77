"""Pallas TPU kernels for quantized distance scans.

These are the hot compressed-search paths (BASELINE.json north star:
"SQ -> int8 matmul path; BQ -> XOR+popcount kernel on packed uint32
lanes"):

  * ``sq_scores``: int8-quantized corpus scan.  Each grid step DMAs one
    (TILE_N, D) int8 tile into VMEM, dequantizes it in-register with the
    per-dimension scale/offset, and runs the metric matmul on the MXU —
    the f32 corpus never exists in HBM, so the scan runs at 1/4 the
    HBM traffic of the float path.  (The reference's int8 path decodes
    whole arrays to f32 in host memory, quantization.py:154-174.)
  * ``hamming_scores``: binary-quantized scan over bit-packed codes laid
    out word-major (W, N) so the corpus axis rides the 128-wide vector
    lanes; XOR + population_count + accumulate per word on the VPU with
    no unpacking (the reference unpacks every byte per query,
    quantization.py:356-374).

Both kernels fall back to interpreter mode off-TPU so the same code path is
unit-tested on the CPU suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import DistanceMetric


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# int8 dequantize-and-matmul scan
# ---------------------------------------------------------------------------

def _sq_kernel(q_ref, codes_ref, vmin_ref, rscale_ref, qsq_ref, out_ref, *,
               metric: DistanceMetric):
    """One (TILE_N, D) int8 tile -> (B, TILE_N) scores.

    q_ref: (B, D) f32 — pre-normalized for cosine.
    vmin_ref/rscale_ref: (1, D) f32; rscale = scale/255.
    qsq_ref: (B, 1) f32 squared query norms (L2 only; zeros otherwise).
    """
    v = (codes_ref[:].astype(jnp.float32) + 128.0) * rscale_ref[:] \
        + vmin_ref[:]
    q = q_ref[:]
    # bf16 operands keep the MXU on its single-pass fast path (f32 inputs
    # select the multi-pass f32 matmul); dot_general contracting the last
    # dims avoids materializing v.T (an expensive cross-lane relayout)
    cross = jax.lax.dot_general(
        q.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if metric == DistanceMetric.COSINE:
        vsq = jnp.sum(v * v, axis=1, keepdims=True)          # (TN, 1)
        rinv = jax.lax.rsqrt(jnp.maximum(vsq, 1e-30))
        out_ref[:] = 1.0 - cross * rinv.T
    elif metric == DistanceMetric.L2:
        vsq = jnp.sum(v * v, axis=1, keepdims=True)
        out_ref[:] = jnp.maximum(qsq_ref[:] + vsq.T - 2.0 * cross, 0.0)
    else:
        out_ref[:] = -cross


@functools.partial(jax.jit,
                   static_argnames=("metric", "tile_n", "interpret"))
def sq_scores(queries: jnp.ndarray, codes: jnp.ndarray, vmin: jnp.ndarray,
              scale: jnp.ndarray, *, metric: DistanceMetric,
              tile_n: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """(B, D) f32 x (N, D) int8 -> (B, N) f32 scores (lower = closer).

    N must be padded to a multiple of ``tile_n`` by the caller (padding rows
    score garbage; mask them downstream).
    """
    b, d = queries.shape
    n = codes.shape[0]
    q = queries.astype(jnp.float32)
    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        q_in, qsq = qn, jnp.zeros((b, 1), jnp.float32)
    elif metric == DistanceMetric.L2:
        q_in = q
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
    else:
        q_in, qsq = q, jnp.zeros((b, 1), jnp.float32)

    grid = (_cdiv(n, tile_n),)
    kernel = functools.partial(_sq_kernel, metric=metric)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=n * d + b * d * 4 + b * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(q_in, codes, vmin.reshape(1, d), (scale / 255.0).reshape(1, d), qsq)


# ---------------------------------------------------------------------------
# int4 unpack-dequantize-and-matmul scan
# ---------------------------------------------------------------------------

def _int4_kernel(q_ref, codes_ref, vmin_ref, rscale_ref, qsq_ref, out_ref, *,
                 metric: DistanceMetric):
    """One (TILE_N, W) packed-uint8 int4 tile -> (B, TILE_N) scores.

    Halves packing (quant/int4.py): byte w holds dim w (low nibble) and
    dim w + W (high nibble), so the unpack is one lane-contiguous concat —
    no cross-lane shuffle.  The tile streams HALF of int8's HBM bytes and
    unpacks in VMEM at B-independent cost.

    q_ref: (B, 2W) f32 — pre-normalized for cosine.
    vmin_ref/rscale_ref: (1, 2W) f32; rscale = scale/15.
    qsq_ref: (B, 1) f32 squared query norms (L2 only; zeros otherwise).
    """
    c = codes_ref[:].astype(jnp.int32)                    # (TN, W)
    codes = jnp.concatenate([c & 0xF, c >> 4], axis=1)    # (TN, 2W)
    v = codes.astype(jnp.float32) * rscale_ref[:] + vmin_ref[:]
    q = q_ref[:]
    cross = jax.lax.dot_general(
        q.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if metric == DistanceMetric.COSINE:
        vsq = jnp.sum(v * v, axis=1, keepdims=True)
        rinv = jax.lax.rsqrt(jnp.maximum(vsq, 1e-30))
        out_ref[:] = 1.0 - cross * rinv.T
    elif metric == DistanceMetric.L2:
        vsq = jnp.sum(v * v, axis=1, keepdims=True)
        out_ref[:] = jnp.maximum(qsq_ref[:] + vsq.T - 2.0 * cross, 0.0)
    else:
        out_ref[:] = -cross


@functools.partial(jax.jit,
                   static_argnames=("metric", "tile_n", "interpret"))
def int4_scores(queries: jnp.ndarray, packed: jnp.ndarray, vmin: jnp.ndarray,
                scale: jnp.ndarray, *, metric: DistanceMetric,
                tile_n: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """(B, 2W) f32 x (N, W) packed-int4 uint8 -> (B, N) f32 scores.

    Caller pads: N to tile_n, W to the 128-lane width, B to 8 (see
    quant/int4.py:_distances_pallas); vmin/scale span the unpacked 2W dims
    in the halves layout."""
    b, de = queries.shape
    n, w = packed.shape
    q = queries.astype(jnp.float32)
    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        q_in, qsq = qn, jnp.zeros((b, 1), jnp.float32)
    elif metric == DistanceMetric.L2:
        q_in = q
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
    else:
        q_in, qsq = q, jnp.zeros((b, 1), jnp.float32)

    grid = (_cdiv(n, tile_n),)
    kernel = functools.partial(_int4_kernel, metric=metric)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, de), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, de), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * de,
            bytes_accessed=n * w + b * de * 4 + b * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(q_in, packed, vmin.reshape(1, de), (scale / 15.0).reshape(1, de), qsq)


# ---------------------------------------------------------------------------
# packed-bit Hamming scan
# ---------------------------------------------------------------------------

def _hamming_mxu_kernel(qpm_ref, c_ref, out_ref, *, w: int):
    """MXU Hamming: hamming(a,b) = (bits - a_pm . b_pm) / 2.

    qpm_ref: (B, W*32) bf16 query sign bits as +-1.
    c_ref:   (W, TN) uint32 packed corpus tile.
    out_ref: (B, TN) f32 Hamming distances.

    The corpus tile unpacks to +-1 bf16 in VMEM (cost independent of B) and
    one bf16 MXU matmul serves the whole query batch — at B >= 32 this is
    an order of magnitude faster than the VPU XOR+popcount scan, whose
    cost scales with B.  Shared zero padding bits match on both sides and
    cancel out of the difference count exactly.
    """
    tile = c_ref[:]                                    # (W, TN) uint32
    # 2-D-only unpack (Mosaic-friendly): one (W, TN) bit-plane per shift,
    # concatenated along sublanes => BIT-MAJOR dim order d' = j*W + w.
    # The caller permutes the query bits to match; a shared permutation
    # leaves the dot product unchanged.
    planes = [
        pltpu.bitcast((tile >> jnp.uint32(j)) & jnp.uint32(1), jnp.int32)
        for j in range(32)
    ]
    bits_i = jnp.concatenate(planes, axis=0)           # (32*W, TN) int32 0/1
    pm = (2.0 * bits_i.astype(jnp.float32) - 1.0).astype(jnp.bfloat16)
    dot = jnp.dot(qpm_ref[:], pm, preferred_element_type=jnp.float32)
    out_ref[:] = (jnp.float32(w * 32) - dot) * 0.5


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def hamming_mxu_scores(qpm: jnp.ndarray, codes_t: jnp.ndarray, *,
                       tile_n: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, W*32) +-1 bf16 x (W, N) packed uint32 -> (B, N) f32 Hamming.

    B must be a multiple of 8 and N of ``tile_n``.
    """
    b, d32 = qpm.shape
    w, n = codes_t.shape
    assert d32 == w * 32, (d32, w)
    # permute query dims from word-major (w*32 + j) to the kernel's
    # bit-major (j*W + w) order
    qpm = qpm.reshape(b, w, 32).transpose(0, 2, 1).reshape(b, d32)
    grid = (_cdiv(n, tile_n),)
    kernel = functools.partial(_hamming_mxu_kernel, w=w)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d32), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d32 + 34 * n * d32,
            bytes_accessed=n * w * 4 + b * d32 * 2 + b * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(qpm, codes_t)


def _hamming_kernel(q_ref, c_ref, out_ref):
    """q_ref (W, B) uint32 (full), c_ref (W, TN) uint32 -> out (B, TN).

    Word-major layout keeps the big N axis on the 128-wide lanes; the W
    (word) axis is a short unrolled loop; the whole (small) query block
    stays resident in VMEM across the N grid.
    """
    w = q_ref.shape[0]
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for i in range(w):
        x = jnp.bitwise_xor(q_ref[i, :][:, None], c_ref[i, :][None, :])
        acc = acc + jax.lax.population_count(x.astype(jnp.int32))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def hamming_scores(qcodes_t: jnp.ndarray, codes_t: jnp.ndarray, *,
                   tile_n: int = 2048,
                   interpret: bool = False) -> jnp.ndarray:
    """(W, B) x (W, N) packed uint32 -> (B, N) int32 Hamming distances.

    Both inputs are word-major (transposed); B must be a multiple of 8 and
    N of ``tile_n`` (pad + mask downstream).
    """
    w, b = qcodes_t.shape
    n = codes_t.shape[1]
    grid = (_cdiv(n, tile_n),)
    return pl.pallas_call(
        _hamming_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, b), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * n * w, bytes_accessed=(b + n) * w * 4 + b * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(qcodes_t, codes_t)
