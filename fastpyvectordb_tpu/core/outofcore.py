"""Out-of-core search: corpora larger than HBM, streamed tile-by-tile.

The reference's answer to big corpora is an np.memmap file scanned in
100k-row chunks with host-side merge (parallel_search.py:427-750).  The TPU
rendition keeps the corpus on host RAM/disk (any array-like, including a
memmap or a persist.format.StreamingVectorReader) and pipelines fixed-size
tiles into HBM, maintaining a running top-k on device:

    for each tile: host -> device copy | distance kernel | merge top-k

Tiles are power-of-two row counts so one kernel compile serves every tile;
the final ragged tile is zero-padded and masked.  Transfers overlap compute
naturally through JAX's async dispatch (tile t+1's host->device copy is
issued while tile t computes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DistanceMetric
from ..kernels.distances import MASKED, matmul_precision


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "compute_dtype"))
def _tile_step(queries, tile, tile_mask, row_offset, best_vals, best_rows, *,
               metric: DistanceMetric, k: int, compute_dtype: str):
    """Score one tile and fold it into the running top-k."""
    prec = matmul_precision(compute_dtype)
    cd = jnp.dtype(compute_dtype)
    q = queries.astype(jnp.float32)
    v = tile.astype(jnp.float32)

    def mm(a, bmat):
        return jnp.dot(a.astype(cd), bmat.astype(cd).T,
                       preferred_element_type=jnp.float32, precision=prec)

    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        vsq = jnp.einsum("nd,nd->n", v, v, preferred_element_type=jnp.float32)
        rinv = jnp.where(vsq > 0, jax.lax.rsqrt(jnp.maximum(vsq, 1e-30)), 0.0)
        s = 1.0 - mm(qn, v) * rinv[None, :]
    elif metric == DistanceMetric.L2:
        vsq = jnp.einsum("nd,nd->n", v, v, preferred_element_type=jnp.float32)
        qsq = jnp.einsum("bd,bd->b", q, q, preferred_element_type=jnp.float32)
        s = jnp.maximum(qsq[:, None] + vsq[None, :] - 2.0 * mm(q, v), 0.0)
    else:
        s = -mm(q, v)
    s = jnp.where(tile_mask[None, :], s, MASKED)
    neg, idx = jax.lax.top_k(-s, min(k, s.shape[1]))
    tile_vals = -neg
    tile_rows = idx + row_offset
    # merge with running best
    all_vals = jnp.concatenate([best_vals, tile_vals], axis=1)
    all_rows = jnp.concatenate([best_rows, tile_rows], axis=1)
    neg, pos = jax.lax.top_k(-all_vals, k)
    return -neg, jnp.take_along_axis(all_rows, pos, axis=1)


class OutOfCoreSearcher:
    """Streamed exact search over a host-resident (N, D) array-like."""

    def __init__(self, corpus, metric: "DistanceMetric | str" = "cosine",
                 tile_rows: int = 262_144, compute_dtype: str = "float32"):
        self.corpus = corpus
        self.n = corpus.shape[0]
        self.dims = corpus.shape[1]
        self.metric = DistanceMetric.parse(metric)
        self.tile_rows = tile_rows
        self.compute_dtype = compute_dtype

    def search(self, queries: np.ndarray, k: int = 10,
               mask: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (dists (B, k), rows (B, k)) over the full corpus."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        qd = jnp.asarray(q)
        kk = min(k, self.n)
        best_vals = jnp.full((b, kk), MASKED, dtype=jnp.float32)
        best_rows = jnp.zeros((b, kk), dtype=jnp.int32)
        t = self.tile_rows
        # bf16 serving: demote tiles on the HOST so each host->device copy
        # moves half the bytes — the transfer, not the matmul, bounds
        # streamed search
        wire_dtype = (jnp.bfloat16 if jnp.dtype(self.compute_dtype)
                      == jnp.bfloat16 else np.float32)
        pending = []
        for ti, start in enumerate(range(0, self.n, t)):
            stop = min(start + t, self.n)
            rows = stop - start
            # cast to the wire dtype FIRST, pad after: padding the f32
            # intermediate doubles the host bytes touched per tile
            tile_np = np.asarray(self.corpus[start:stop],
                                 dtype=np.float32).astype(wire_dtype)
            tile_mask = np.zeros((t,), dtype=bool)
            if mask is not None:
                tile_mask[:rows] = mask[start:stop]
            else:
                tile_mask[:rows] = True
            if rows < t:
                tile_np = np.pad(tile_np, ((0, t - rows), (0, 0)))
            tile_dev = jnp.asarray(tile_np)
            pending.append(tile_dev)
            best_vals, best_rows = _tile_step(
                qd, tile_dev, jnp.asarray(tile_mask),
                jnp.int32(start), best_vals, best_rows,
                metric=self.metric, k=kk, compute_dtype=self.compute_dtype)
            if ti % 2 == 1:
                # double-buffer, not unbounded: JAX's async dispatch lets
                # Python race ahead of a slow transfer link, pinning every
                # queued tile's host staging at once — a 20M-row corpus
                # OOM-killed the HOST that way (130 GB RSS).  Blocking
                # every other tile keeps copy/compute overlap while
                # bounding in-flight memory to ~2 tiles; deleting the
                # consumed tile buffers explicitly releases any
                # transfer-runtime retention (second 20M attempt grew by
                # ~one corpus of host bytes per repeated scan without it).
                jax.block_until_ready(best_vals)
                for td in pending:
                    try:
                        td.delete()
                    except Exception:
                        pass
                pending = []
        vals = np.asarray(best_vals)
        if self.metric == DistanceMetric.L2:
            good = vals < MASKED / 2
            vals = np.where(good, np.sqrt(np.maximum(vals, 0.0)), vals)
        return vals, np.asarray(best_rows)
