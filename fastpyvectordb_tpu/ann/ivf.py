"""IVF-Flat ANN index — the TPU-friendly replacement for hnswlib's HNSW.

The reference delegates ANN to hnswlib's pointer-chasing C++ graph
(vectordb_optimized.py:271-280, 540, 610), which is hostile to the TPU
execution model (data-dependent traversal, dynamic shapes).  IVF inverts
the structure into fixed shapes the compiler can tile:

  * k-means partitions the corpus into ``nlist`` cells (quant/kmeans.py,
    trained on device);
  * rows are laid out in a padded ``(nlist, cmax)`` int32 table (pad = -1);
  * a query scores all centroids with one small MXU matmul, picks ``nprobe``
    cells, gathers their rows, and runs the exact metric on the candidates —
    every stage is a static-shape jitted kernel.

Recall is controlled by ``nprobe`` (and the cell-balance of k-means);
`tune_nprobe` picks the cheapest setting that clears a recall target
against exact ground truth, mirroring the reference benchmarks' recall@k
oracle (examples/benchmark_quantization.py:249-259).

Note: on TPU the *exact* flat scan is already extremely fast (one fused
GEMM); IVF pays off for very large corpora or small query batches, and the
crossover is measured in benchmarks/bench_ann.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import DistanceMetric
from ..kernels.distances import MASKED, matmul_precision
from ..quant.kmeans import assign_chunked, kmeans_fit


@functools.partial(jax.jit,
                   static_argnames=("metric", "k", "nprobe", "compute_dtype"))
def _ivf_search_kernel(
    q: jnp.ndarray,            # (B, D) f32
    centroids: jnp.ndarray,    # (nlist, D) f32
    row_table: jnp.ndarray,    # (nlist, cmax) int32, -1 = padding
    vectors: jnp.ndarray,      # (cap, D) storage dtype
    validmask: jnp.ndarray,    # (cap,) bool (store validity AND filter mask)
    *,
    metric: DistanceMetric,
    k: int,
    nprobe: int,
    compute_dtype: str = "float32",
):
    b, d = q.shape
    prec = matmul_precision(compute_dtype)
    # ---- stage 1: route queries to cells ---------------------------------
    if metric == DistanceMetric.COSINE:
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        cn = centroids / jnp.maximum(
            jnp.linalg.norm(centroids, axis=1, keepdims=True), 1e-30)
        croute = -jnp.dot(qn, cn.T, preferred_element_type=jnp.float32,
                          precision=prec)
    elif metric == DistanceMetric.DOT:
        # route by direction: cells are L2-clustered, dot queries follow
        # the nearest-centroid geometry
        croute = -jnp.dot(q, centroids.T, preferred_element_type=jnp.float32,
                          precision=prec)
    else:
        csq = jnp.einsum("kd,kd->k", centroids, centroids,
                         preferred_element_type=jnp.float32)
        croute = csq[None, :] - 2.0 * jnp.dot(
            q, centroids.T, preferred_element_type=jnp.float32, precision=prec)
    _, probe = jax.lax.top_k(-croute, nprobe)          # (B, nprobe)

    # ---- stage 2: gather candidates and score exactly --------------------
    cand = jnp.take(row_table, probe, axis=0).reshape(b, -1)  # (B, C)
    safe = jnp.maximum(cand, 0)
    vecs = jnp.take(vectors, safe, axis=0).astype(jnp.float32)  # (B, C, D)
    ok = (cand >= 0) & jnp.take(validmask, safe, axis=0)

    qf = q.astype(jnp.float32)
    if metric == DistanceMetric.COSINE:
        qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-30)
        vn = vecs / jnp.maximum(
            jnp.linalg.norm(vecs, axis=-1, keepdims=True), 1e-30)
        s = 1.0 - jnp.einsum("bd,bcd->bc", qn, vn,
                             preferred_element_type=jnp.float32, precision=prec)
    elif metric == DistanceMetric.L2:
        diff = vecs - qf[:, None, :]
        s = jnp.sqrt(jnp.maximum(jnp.einsum(
            "bcd,bcd->bc", diff, diff, preferred_element_type=jnp.float32,
            precision=prec), 0.0))
    else:
        s = -jnp.einsum("bd,bcd->bc", qf, vecs,
                        preferred_element_type=jnp.float32, precision=prec)
    s = jnp.where(ok, s, MASKED)
    neg, pos = jax.lax.top_k(-s, k)
    return -neg, jnp.take_along_axis(cand, pos, axis=1)


class IVFIndex:
    """Inverted-file flat index over a collection's device store."""

    def __init__(self, centroids: jnp.ndarray, row_table: jnp.ndarray,
                 collection, nprobe: int):
        self.centroids = centroids
        self.row_table = row_table        # (nlist, cmax) int32
        self._collection = collection
        self.nprobe = nprobe
        self.stale = False
        self._built_count = collection._store.count

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, collection, nlist: Optional[int] = None,
              nprobe: Optional[int] = None, iters: int = 10,
              seed: int = 0, max_query_batch: int = 16) -> "IVFIndex":
        store = collection._store
        n = store.count
        if n == 0:
            raise ValueError("cannot build IVF index over an empty collection")
        vectors = store.vectors[:n].astype(jnp.float32)
        if nlist is None:
            nlist = int(min(max(int(math.sqrt(n)) * 2, 8), 8192, max(n // 4, 1)))
        nlist = max(1, min(nlist, n))
        if nprobe is None:
            nprobe = max(1, min(nlist, collection.config.ivf_nprobe))
        centroids = kmeans_fit(vectors, jax.random.PRNGKey(seed), k=nlist,
                               iters=iters,
                               chunk=int(min(16384, _pow2_at_least(n))))
        assign = np.asarray(assign_chunked(
            vectors, centroids, chunk=int(min(65536, _pow2_at_least(n)))))
        # host-side bucket layout: (nlist, cmax) padded row table
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        counts = np.bincount(assign, minlength=nlist)
        cmax = int(max(counts.max(), 1))
        cmax = ((cmax + 7) // 8) * 8  # tile-friendly padding
        table = np.full((nlist, cmax), -1, dtype=np.int32)
        starts = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        for c in range(nlist):
            rows = order[starts[c]: starts[c + 1]]
            table[c, : rows.size] = rows
        idx = cls(centroids, jnp.asarray(table), collection, nprobe)
        idx._cell_counts = counts
        return idx

    # ------------------------------------------------------------------
    def search(self, queries: np.ndarray, k: int,
               mask: Optional[np.ndarray] = None, overfetch: int = 1,
               nprobe: Optional[int] = None,
               max_query_batch: int = 16) -> Tuple[np.ndarray, np.ndarray]:
        if self.stale:
            # rows were added/removed since build: refresh the structure
            rebuilt = IVFIndex.build(self._collection,
                                     nlist=self.centroids.shape[0],
                                     nprobe=self.nprobe)
            self.__dict__.update(rebuilt.__dict__)
        store = self._collection._store
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        nprobe = int(min(nprobe or self.nprobe, self.centroids.shape[0]))
        validmask = store.valid
        if mask is not None:
            m = np.zeros((store.capacity,), dtype=bool)
            m[: mask.shape[0]] = mask
            validmask = jnp.logical_and(validmask, jnp.asarray(m))
        cfg = self._collection.config
        outs_d, outs_r = [], []
        # bound per-dispatch gather memory: process queries in sub-batches
        for s in range(0, q.shape[0], max_query_batch):
            sub = q[s: s + max_query_batch]
            pad = (-sub.shape[0]) % min(max_query_batch, 8)
            if pad:
                sub = np.pad(sub, ((0, pad), (0, 0)))
            d, r = _ivf_search_kernel(
                jnp.asarray(sub), self.centroids, self.row_table,
                store.vectors, validmask,
                metric=cfg.metric, k=min(k, self.row_table.shape[1] * nprobe),
                nprobe=nprobe, compute_dtype=cfg.compute_dtype)
            outs_d.append(np.asarray(d)[: q[s: s + max_query_batch].shape[0]])
            outs_r.append(np.asarray(r)[: q[s: s + max_query_batch].shape[0]])
        return np.concatenate(outs_d), np.concatenate(outs_r)

    # ------------------------------------------------------------------
    def mark_stale(self) -> None:
        self.stale = True

    def stats(self) -> dict:
        counts = getattr(self, "_cell_counts", None)
        return {
            "nlist": int(self.centroids.shape[0]),
            "cmax": int(self.row_table.shape[1]),
            "nprobe": self.nprobe,
            "built_count": self._built_count,
            "cell_balance": (float(counts.std() / max(counts.mean(), 1e-9))
                             if counts is not None else None),
        }

    # -- persistence ---------------------------------------------------
    def export_sections(self) -> tuple:
        """(sections, meta) for the collection's FPVT container
        (parity: hnswlib's save_index, vectordb_optimized.py:306-331)."""
        return ({"ann_centroids": np.asarray(self.centroids),
                 "ann_row_table": np.asarray(self.row_table)},
                {"kind": "ivf", "nprobe": self.nprobe,
                 "built_count": self._built_count})

    @classmethod
    def from_sections(cls, collection, sections: dict, meta: dict
                      ) -> "IVFIndex":
        idx = cls(jnp.asarray(np.asarray(sections["ann_centroids"])),
                  jnp.asarray(np.asarray(sections["ann_row_table"])),
                  collection, int(meta["nprobe"]))
        idx._built_count = int(meta["built_count"])
        idx.stale = idx._built_count != collection._store.count
        return idx

    def tune_nprobe(self, queries: np.ndarray, target_recall: float = 0.95,
                    k: int = 10, max_nprobe: Optional[int] = None) -> int:
        """Find the smallest nprobe whose recall@k vs the exact path clears
        ``target_recall`` on the given query sample; sets and returns it."""
        store = self._collection._store
        cfg = self._collection.config
        exact_d, exact_r = store.search(queries, k, cfg.metric,
                                        compute_dtype=cfg.compute_dtype)
        limit = max_nprobe or self.centroids.shape[0]
        nprobe = max(1, self.nprobe // 4)
        while nprobe <= limit:
            _, r = self.search(queries, k, nprobe=nprobe)
            hits = np.mean([
                len(set(a.tolist()) & set(e.tolist())) / k
                for a, e in zip(r, exact_r)])
            if hits >= target_recall:
                self.nprobe = nprobe
                return nprobe
            nprobe *= 2
        self.nprobe = limit
        return limit


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p
