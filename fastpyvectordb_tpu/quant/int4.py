"""Int4 scalar quantization — 8x compression.

The codec BETWEEN int8 (4x, quant/scalar.py) and binary (32x,
quant/binary.py) on the compression ladder: per-dimension min/max training
like the reference's ScalarQuantizer (quantization.py:64-213) but 16-level
codes packed two-per-byte.  Positioning on TPU:

  * **bandwidth**: the coarse scan streams N x D/2 bytes — half of int8.
    In the HBM-bound regimes (>=5M rows, small batches) and in the
    transfer-bound streamed out-of-core tier (core/outofcore.py, where the
    codec byte ratio IS the QPS ratio) that is a direct ~2x.
  * **capacity**: device-resident codes for 2x the corpus per HBM
    (BigCollection-class deployments).
  * **recall**: 16 levels/dim is far coarser than int8's 256 — the coarse
    ordering loosens, and the exact re-rank (deeper default, tune_rerank)
    restores recall; on hard clustered corpora prefer int8 unless memory
    or bandwidth is the binding constraint.

Packing layout: dims are split in HALVES, not interleaved — the low
nibble of byte ``w`` holds dim ``w``, the high nibble holds dim ``w + W``
(W = ceil(D/2)).  Unpacking is then a lane-contiguous
``concat(c & 0xF, c >> 4)`` with no cross-lane shuffle, which is what the
Pallas kernel (kernels/pallas_quant.py:int4_scores) needs to stay on the
VPU's cheap path.  Odd D pads one phantom dim (vmin=0, scale=eps, query
padded with 0 — contributes nothing to any metric).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DistanceMetric
from ..kernels import pallas_quant
from ..kernels.topk import masked_top_k
from ..persist.format import load_container, save_container

CHUNK = 16384
_I4_TILE = 1024


def _padded_dims(d: int) -> int:
    return d + (d % 2)


@jax.jit
def _train(data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    data = data.astype(jnp.float32)
    vmin = jnp.min(data, axis=0)
    vmax = jnp.max(data, axis=0)
    scale = jnp.maximum(vmax - vmin, 1e-8)
    return vmin, scale


@jax.jit
def _encode(data: jnp.ndarray, vmin: jnp.ndarray, scale: jnp.ndarray
            ) -> jnp.ndarray:
    """(N, De) f32 -> (N, De/2) packed uint8 (halves layout)."""
    data = data.astype(jnp.float32)
    c = jnp.clip(jnp.round((data - vmin[None, :]) / scale[None, :] * 15.0),
                 0.0, 15.0).astype(jnp.uint8)
    w = c.shape[1] // 2
    return c[:, :w] | (c[:, w:] << 4)


def _unpack(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, W) packed uint8 -> (N, 2W) int8 codes in [0, 15]."""
    c = packed.astype(jnp.int32)
    return jnp.concatenate([c & 0xF, c >> 4], axis=-1).astype(jnp.int8)


@jax.jit
def _decode(packed: jnp.ndarray, vmin: jnp.ndarray, scale: jnp.ndarray
            ) -> jnp.ndarray:
    c = _unpack(packed).astype(jnp.float32)
    return c / 15.0 * scale[None, :] + vmin[None, :]


@functools.partial(jax.jit, static_argnames=("metric", "chunk"))
def _distances(queries: jnp.ndarray, packed: jnp.ndarray, vmin: jnp.ndarray,
               scale: jnp.ndarray, *, metric: DistanceMetric,
               chunk: int = CHUNK) -> jnp.ndarray:
    """Chunked XLA fallback: unpack + dequantize one tile at a time."""
    n, w = packed.shape
    de = 2 * w
    pad = (-n) % chunk
    codes_p = jnp.pad(packed, ((0, pad), (0, 0))) if pad else packed
    tiles = codes_p.reshape(-1, chunk, w)
    q = jnp.pad(queries.astype(jnp.float32),
                ((0, 0), (0, de - queries.shape[1])))

    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(
            jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)

    def body(_, tile):
        v = (_unpack(tile).astype(jnp.float32) / 15.0 * scale[None, :]
             + vmin[None, :])
        if metric == DistanceMetric.COSINE:
            vn = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True),
                                 1e-30)
            s = 1.0 - jnp.dot(qn, vn.T, preferred_element_type=jnp.float32)
        elif metric == DistanceMetric.L2:
            vsq = jnp.einsum("nd,nd->n", v, v,
                             preferred_element_type=jnp.float32)
            qsq = jnp.einsum("bd,bd->b", q, q,
                             preferred_element_type=jnp.float32)
            s = jnp.maximum(
                qsq[:, None] + vsq[None, :]
                - 2.0 * jnp.dot(q, v.T, preferred_element_type=jnp.float32),
                0.0)
        else:
            s = -jnp.dot(q, v.T, preferred_element_type=jnp.float32)
        return None, s

    _, parts = jax.lax.scan(body, None, tiles)
    return jnp.moveaxis(parts, 0, 1).reshape(q.shape[0], -1)[:, :n]


@functools.partial(jax.jit, static_argnames=("metric",))
def _distances_int4_matmul(queries: jnp.ndarray, packed: jnp.ndarray,
                           vmin: jnp.ndarray, scale: jnp.ndarray,
                           vsq: jnp.ndarray, rinv: jnp.ndarray, *,
                           metric: DistanceMetric) -> jnp.ndarray:
    """Folded int4 scan: unpack to int8 codes and run ONE s8 x s8 MXU
    matmul, with the dequantization folded into the query exactly like
    the int8 path (quant/scalar.py:_distances_int8_matmul):

        q . dequant(c) = (q * rs) . c + q . vmin,   rs = scale / 15

    In XLA the unpacked (N, De) int8 tensor materializes transiently, so
    this path matches int8's HBM traffic — the bandwidth win needs the
    Pallas kernel (pallas_quant.int4_scores) which unpacks in VMEM.
    Correctness path for every backend; coarse stage only (re-rank
    restores exact ordering).
    """
    w = packed.shape[1]
    de = 2 * w
    q = jnp.pad(queries.astype(jnp.float32),
                ((0, 0), (0, de - queries.shape[1])))
    rs = (scale / 15.0).astype(jnp.float32)
    qs = q * rs[None, :]
    const = q @ vmin                                     # (B,)
    qmax = jnp.max(jnp.abs(qs), axis=1, keepdims=True)
    qscale = jnp.maximum(qmax, 1e-30) / 127.0
    qi = jnp.clip(jnp.round(qs / qscale), -127, 127).astype(jnp.int8)
    codes = _unpack(packed)                              # (N, De) int8 0..15
    cross_i = jax.lax.dot_general(
        qi, codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    cross = cross_i.astype(jnp.float32) * qscale + const[:, None]
    if metric == DistanceMetric.COSINE:
        qn = jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        return 1.0 - (cross / qn) * rinv[None, :]
    if metric == DistanceMetric.L2:
        qsq = jnp.einsum("bd,bd->b", q, q, preferred_element_type=jnp.float32)
        return jnp.maximum(qsq[:, None] + vsq[None, :] - 2.0 * cross, 0.0)
    return -cross


@functools.partial(jax.jit, static_argnames=("chunk",))
def _dequant_row_stats(packed: jnp.ndarray, vmin: jnp.ndarray,
                       scale: jnp.ndarray, chunk: int = 16384):
    """(vsq, rinv) of the dequantized corpus, tile-by-tile."""
    n, w = packed.shape
    pad = (-n) % chunk
    codes_p = jnp.pad(packed, ((0, pad), (0, 0))) if pad else packed

    def body(_, tile):
        v = (_unpack(tile).astype(jnp.float32) / 15.0 * scale[None, :]
             + vmin[None, :])
        return None, jnp.einsum("nd,nd->n", v, v,
                                preferred_element_type=jnp.float32)

    _, sq = jax.lax.scan(body, None, codes_p.reshape(-1, chunk, w))
    sq = sq.reshape(-1)[:n]
    rinv = jnp.where(sq > 0, jax.lax.rsqrt(jnp.maximum(sq, 1e-30)), 0.0)
    return sq, rinv


class Int4Quantizer:
    """Per-dimension min/max int4 quantizer (8x compression)."""

    def __init__(self, dims: Optional[int] = None):
        self.dims = dims            # true dims; internal arrays use _de
        self.vmin: Optional[jnp.ndarray] = None
        self.scale: Optional[jnp.ndarray] = None

    @property
    def _de(self) -> int:
        return _padded_dims(self.dims)

    @property
    def n_words(self) -> int:
        return self._de // 2

    @property
    def is_trained(self) -> bool:
        return self.vmin is not None

    def train(self, vectors) -> "Int4Quantizer":
        data = vectors if isinstance(vectors, jnp.ndarray) else \
            jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        self.dims = int(data.shape[1])
        vmin, scale = _train(data)
        if self._de != self.dims:   # phantom pad dim: never contributes
            vmin = jnp.pad(vmin, (0, 1))
            scale = jnp.pad(scale, (0, 1), constant_values=1e-8)
        self.vmin, self.scale = vmin, scale
        return self

    def _pad_data(self, data: jnp.ndarray) -> jnp.ndarray:
        if data.shape[1] == self._de:
            return data
        return jnp.pad(data, ((0, 0), (0, self._de - data.shape[1])))

    def encode(self, vectors) -> jnp.ndarray:
        self._check()
        data = vectors if isinstance(vectors, jnp.ndarray) else \
            jnp.asarray(np.ascontiguousarray(vectors, dtype=np.float32))
        return _encode(self._pad_data(data), self.vmin, self.scale)

    def decode(self, packed) -> np.ndarray:
        self._check()
        out = np.asarray(_decode(jnp.asarray(packed), self.vmin, self.scale))
        return out[:, : self.dims]

    def corpus_stats(self, packed) -> tuple:
        """One-time (vsq, rinv) of the dequantized corpus."""
        self._check()
        return _dequant_row_stats(jnp.asarray(packed), self.vmin, self.scale)

    def distances(self, queries: np.ndarray, packed,
                  metric: DistanceMetric = DistanceMetric.L2,
                  mode: str = "auto",
                  stats: Optional[tuple] = None) -> jnp.ndarray:
        """Quantized-domain distances.  Modes: pallas (in-VMEM unpack,
        half of int8's HBM bytes) | int4mm (XLA unpack + s8 MXU matmul) |
        chunked (XLA scan fallback)."""
        self._check()
        metric = DistanceMetric.parse(metric)
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        packed = jnp.asarray(packed)
        if mode == "auto":
            mode = "pallas" if pallas_quant.on_tpu() else "chunked"
        if mode == "pallas":
            return self._distances_pallas(
                jnp.asarray(q), packed, metric,
                interpret=not pallas_quant.on_tpu())
        if mode == "int4mm":
            vsq, rinv = stats if stats is not None \
                else self.corpus_stats(packed)
            return _distances_int4_matmul(jnp.asarray(q), packed, self.vmin,
                                          self.scale, vsq, rinv,
                                          metric=metric)
        return _distances(jnp.asarray(q), packed, self.vmin, self.scale,
                          metric=metric)

    def pallas_layout(self, packed, tile_n: int = _I4_TILE) -> tuple:
        """Pad (codes, vmin, scale) for ``pallas_quant.int4_scores``:
        rows to ``tile_n``, words to the 128-lane width; vmin/scale
        re-assemble per the halves layout ([lo | pad | hi | pad]).
        Returns ``(codes_p, vmin_p, scale_p)``; scores slice ``[:, :n]``.
        """
        packed = jnp.asarray(packed)
        n, w = packed.shape
        npad = (-n) % tile_n
        wp = (-w) % 128
        if wp:
            codes_p = jnp.pad(packed, ((0, npad), (0, wp)))
            vmin = jnp.concatenate([
                self.vmin[:w], jnp.zeros((wp,), jnp.float32),
                self.vmin[w:], jnp.zeros((wp,), jnp.float32)])
            scale = jnp.concatenate([
                self.scale[:w], jnp.full((wp,), 1e-8, jnp.float32),
                self.scale[w:], jnp.full((wp,), 1e-8, jnp.float32)])
        else:
            codes_p = jnp.pad(packed, ((0, npad), (0, 0))) if npad \
                else packed
            vmin, scale = self.vmin, self.scale
        return codes_p, vmin, scale

    def pallas_query(self, q: jnp.ndarray, w: int) -> jnp.ndarray:
        """Lay a (B, dims) f32 query block out to match ``pallas_layout``:
        dim padding, then per-half lane padding ([lo | 0s | hi | 0s])."""
        qp = self._pad_data(q.astype(jnp.float32))
        wp = (-w) % 128
        if wp:
            b = qp.shape[0]
            qp = jnp.concatenate([
                qp[:, :w], jnp.zeros((b, wp), jnp.float32),
                qp[:, w:], jnp.zeros((b, wp), jnp.float32)], axis=1)
        return qp

    def _distances_pallas(self, q: jnp.ndarray, packed: jnp.ndarray,
                          metric: DistanceMetric,
                          interpret: bool = False) -> jnp.ndarray:
        n, w = packed.shape
        b = q.shape[0]
        bp = max(8, -(-b // 8) * 8)
        codes_p, vmin, scale = self.pallas_layout(packed)
        qp = self.pallas_query(jnp.pad(q.astype(jnp.float32),
                                       ((0, bp - b), (0, 0))), w)
        out = pallas_quant.int4_scores(qp, codes_p, vmin, scale,
                                       metric=metric, tile_n=_I4_TILE,
                                       interpret=interpret)
        return out[:b, :n]

    def search(self, queries: np.ndarray, packed, k: int = 10,
               metric: DistanceMetric = DistanceMetric.L2,
               mask: Optional[np.ndarray] = None):
        d = self.distances(queries, packed, metric)
        m = jnp.asarray(mask) if mask is not None else None
        vals, idx = masked_top_k(d, min(k, d.shape[1]), m)
        return np.asarray(vals), np.asarray(idx)

    def memory_usage(self, n_vectors: int) -> dict:
        self._check()
        orig = n_vectors * self.dims * 4
        quant = n_vectors * self.n_words + self._de * 8
        return {"original_bytes": orig, "quantized_bytes": quant,
                "compression_ratio": orig / max(quant, 1)}

    def save(self, path) -> None:
        self._check()
        save_container(Path(path), {
            "vmin": np.asarray(self.vmin),
            "scale": np.asarray(self.scale),
        }, meta={"kind": "int4_quantizer", "dims": self.dims})

    @classmethod
    def load(cls, path) -> "Int4Quantizer":
        c = load_container(path)
        qz = cls(dims=c.meta["dims"])
        qz.vmin = jnp.asarray(np.asarray(c.read("vmin")))
        qz.scale = jnp.asarray(np.asarray(c.read("scale")))
        return qz

    def _check(self) -> None:
        if not self.is_trained:
            raise RuntimeError("Int4Quantizer is not trained")
