"""Two-stage quantized scan: compressed first pass -> exact f32 re-rank.

This is the TPU rendition of the reference's hybrid pipelines — BQ/SQ
pre-filter followed by exact re-ranking (parallel_search.py:895-947,
examples/benchmark_quantization.py:321-362) — with both stages on device:

  stage 1: quantized distances over all rows (int8 dequant-matmul, packed
           Hamming, or PQ ADC) + masked top-(k*rerank) candidate selection;
  stage 2: gather the candidates' f32 rows and apply the exact metric,
           then final top-k.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DistanceMetric
from ..kernels.distances import MASKED
from ..kernels.topk import masked_top_k
from .binary import BinaryQuantizer
from .product import ProductQuantizer
from .scalar import ScalarQuantizer


def _pow2ge(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@functools.partial(jax.jit, static_argnames=("metric", "k", "approx"))
def _int8_coarse_topk(q, codes, vmin, scale, vsq, rinv, mask, *,
                      metric: DistanceMetric, k: int, approx: bool):
    """Fused int8-MXU scan + masked top-k: the (B, N) score matrix never
    reaches HBM."""
    from .scalar import _distances_int8_matmul
    s = _distances_int8_matmul(q, codes, vmin, scale, vsq, rinv,
                               metric=metric)
    if mask is not None:
        s = jnp.where(mask[None, :], s, MASKED)
    if approx:
        neg, rows = jax.lax.approx_max_k(-s, k, recall_target=0.99)
    else:
        neg, rows = jax.lax.top_k(-s, k)
    return -neg, rows


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _masked_topk(s, mask, *, k: int, approx: bool):
    if mask is not None:
        s = jnp.where(mask[None, :], s, MASKED)
    if approx:
        neg, rows = jax.lax.approx_max_k(-s, k, recall_target=0.99)
    else:
        neg, rows = jax.lax.top_k(-s, k)
    return -neg, rows


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _hamming_coarse_topk(qcodes_t, codes_t, mask, *, k: int,
                         chunk: int = 262_144):
    """Packed-Hamming scan + masked top-k, chunked over N with per-chunk
    local top-k and a final merge — bounded memory at any corpus size."""
    w, b = qcodes_t.shape
    n = codes_t.shape[1]
    pad = (-n) % chunk
    codes_p = jnp.pad(codes_t, ((0, 0), (0, pad))) if pad else codes_t
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    mask_p = jnp.pad(mask, (0, pad)) if pad else mask
    tiles = codes_p.reshape(w, -1, chunk)
    mtiles = mask_p.reshape(-1, chunk)
    kk = min(k, chunk)

    def body(_, tm):
        tile, m = tm  # (W, chunk), (chunk,)
        # word-by-word accumulation: keeps every intermediate at (B, chunk)
        # so XLA fuses the chain instead of materializing a (W, B, chunk)
        # broadcast in HBM
        acc = jnp.zeros((b, tile.shape[1]), jnp.int32)
        for i in range(w):
            x = jnp.bitwise_xor(qcodes_t[i, :][:, None], tile[i, :][None, :])
            acc = acc + jax.lax.population_count(x.astype(jnp.int32))
        s = jnp.where(m[None, :], acc.astype(jnp.float32), MASKED)
        neg, idx = jax.lax.top_k(-s, kk)
        return None, (-neg, idx)

    _, (vals, idx) = jax.lax.scan(body, None,
                                  (jnp.moveaxis(tiles, 1, 0), mtiles))
    t = vals.shape[0]
    offs = (jnp.arange(t, dtype=jnp.int32) * chunk)[:, None, None]
    vals_f = jnp.moveaxis(vals, 0, 1).reshape(b, t * kk)
    idx_f = jnp.moveaxis(idx + offs, 0, 1).reshape(b, t * kk)
    neg, pos = jax.lax.top_k(-vals_f, min(k, t * kk))
    return -neg, jnp.take_along_axis(idx_f, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _rerank(queries: jnp.ndarray, cand_vecs: jnp.ndarray,
            cand_rows: jnp.ndarray, cand_ok: jnp.ndarray, *,
            metric: DistanceMetric, k: int):
    """Exact metric over gathered candidates.

    queries (B, D); cand_vecs (B, C, D); cand_rows (B, C); cand_ok (B, C).
    Returns (dists (B, k), rows (B, k)).
    """
    q = queries.astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST  # exact f32 re-ranking even on the MXU
    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        vn = cand_vecs / jnp.maximum(
            jnp.linalg.norm(cand_vecs, axis=-1, keepdims=True), 1e-30)
        s = 1.0 - jnp.einsum("bd,bcd->bc", qn, vn,
                             preferred_element_type=jnp.float32, precision=hp)
    elif metric == DistanceMetric.L2:
        diff = cand_vecs - q[:, None, :]
        s = jnp.sqrt(jnp.maximum(
            jnp.einsum("bcd,bcd->bc", diff, diff,
                       preferred_element_type=jnp.float32, precision=hp), 0.0))
    else:
        s = -jnp.einsum("bd,bcd->bc", q, cand_vecs,
                        preferred_element_type=jnp.float32, precision=hp)
    s = jnp.where(cand_ok, s, MASKED)
    neg, pos = jax.lax.top_k(-s, k)
    return -neg, jnp.take_along_axis(cand_rows, pos, axis=1)


class QuantizedScan:
    """Compressed snapshot of a collection's live rows + 2-stage search."""

    def __init__(self, kind: str, quantizer, codes: jnp.ndarray,
                 store, metric: DistanceMetric):
        self.kind = kind
        self.quantizer = quantizer
        self.codes = codes
        self._store = store
        self.metric = metric

    @classmethod
    def build(cls, collection, kind: str = "int8", **kwargs) -> "QuantizedScan":
        store = collection._store
        n = store.count
        vecs = np.asarray(store.vectors[:max(n, 1)], dtype=np.float32)[:n]
        if kind in ("int8", "sq", "scalar"):
            qz = ScalarQuantizer().train(vecs)
            codes = qz.encode(vecs)
            kind = "int8"
        elif kind in ("binary", "bq", "hamming"):
            qz = BinaryQuantizer().train(vecs, **kwargs)
            codes = qz.encode(vecs)
            kind = "binary"
        elif kind in ("pq", "product"):
            qz = ProductQuantizer(m=kwargs.pop("m", 8),
                                  k=kwargs.pop("k", 256))
            qz.train(vecs, **kwargs)
            codes = qz.encode(vecs)
            kind = "pq"
        else:
            raise ValueError(f"unknown quantized scan kind {kind!r}")
        return cls(kind, qz, codes, store, collection.config.metric)

    def coarse_distances(self, q: np.ndarray) -> jnp.ndarray:
        from ..kernels import pallas_quant
        if self.kind == "int8":
            if not hasattr(self, "_sq_stats"):
                # one-time dequantized row stats for the int8-matmul path
                self._sq_stats = self.quantizer.corpus_stats(self.codes)
            return self.quantizer.distances(q, self.codes, metric=self.metric,
                                            stats=self._sq_stats)
        if self.kind == "binary":
            if pallas_quant.on_tpu():
                if not hasattr(self, "_codes_t"):
                    # cache the word-major layout the Pallas kernel scans
                    self._codes_t = jnp.asarray(self.codes).T
                qcodes = self.quantizer.encode(q)
                return self.quantizer.hamming_distances_t(
                    qcodes, self._codes_t).astype(jnp.float32)
            return self.quantizer.hamming_distances(q, self.codes
                                                    ).astype(jnp.float32)
        return self.quantizer.distances(q, self.codes)

    def search(self, queries: np.ndarray, k: int, rerank: int = 4,
               mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        from ..kernels import pallas_quant
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        n = self.codes.shape[0]
        # combine the caller's filter mask with store validity (tombstones)
        valid = self._store.valid[:n]
        if mask is not None:
            m = jnp.asarray(mask[:n]) & valid
        else:
            m = valid
        c = min(max(k * max(rerank, 1), k), n)
        # fused scan+top-k paths: the (B, N) coarse matrix never hits HBM
        if self.kind == "int8":
            if not hasattr(self, "_sq_stats"):
                self._sq_stats = self.quantizer.corpus_stats(self.codes)
            vsq, rinv = self._sq_stats
            qz = self.quantizer
            cvals, crows = _int8_coarse_topk(
                jnp.asarray(q), jnp.asarray(self.codes), qz.vmin, qz.scale,
                vsq, rinv, m, metric=self.metric, k=c,
                approx=pallas_quant.on_tpu())
        elif self.kind == "binary":
            if not hasattr(self, "_codes_t"):
                self._codes_t = jnp.asarray(self.codes).T
            qcodes = self.quantizer.encode(q)
            if pallas_quant.on_tpu():
                # Pallas VPU scan + hardware approx top-k; the (B, N) int32
                # matrix round-trips HBM once.  Column-chunked beyond ~2M
                # rows to bound that buffer, partials merged.
                col_chunk = 2_097_152
                if n <= col_chunk:
                    s = self.quantizer.hamming_distances_t(
                        qcodes, self._codes_t).astype(jnp.float32)
                    cvals, crows = _masked_topk(s, m, k=c, approx=True)
                else:
                    parts_v, parts_r = [], []
                    for s0 in range(0, n, col_chunk):
                        s1 = min(s0 + col_chunk, n)
                        sc = self.quantizer.hamming_distances_t(
                            qcodes, self._codes_t[:, s0:s1]
                        ).astype(jnp.float32)
                        pv, pr = _masked_topk(sc, m[s0:s1],
                                              k=min(c, s1 - s0), approx=True)
                        parts_v.append(pv)
                        parts_r.append(pr + s0)
                    cvals, crows = masked_top_k(
                        jnp.concatenate(parts_v, axis=1), c)
                    crows = jnp.take_along_axis(
                        jnp.concatenate(parts_r, axis=1), crows, axis=1)
            else:
                cvals, crows = _hamming_coarse_topk(
                    qcodes.T, self._codes_t, m, k=c,
                    chunk=int(min(262_144, _pow2ge(n))))
        else:
            coarse = self.coarse_distances(q)
            cvals, crows = masked_top_k(coarse, c, m)
        if rerank <= 1:
            return np.asarray(cvals)[:, :k], np.asarray(crows)[:, :k]
        cand_ok = cvals < MASKED * 0.5
        cand_vecs = jnp.take(self._store.vectors, crows, axis=0)
        dists, rows = _rerank(jnp.asarray(q), cand_vecs.astype(jnp.float32),
                              crows, jnp.asarray(cand_ok),
                              metric=self.metric, k=min(k, c))
        return np.asarray(dists), np.asarray(rows)

    def memory_usage(self) -> dict:
        return self.quantizer.memory_usage(self.codes.shape[0])
