"""IVF-PQ codebook-quality lab (round-5 verdict, Missing #3 / task 4).

Round-4 measurement: the shipped 4-bit residual PQ (m=D/4, K=16) orders
candidates near-randomly past IVF routing on the clustered corpus —
rr0 recall@10 0.186 (results_r4 `ivfpq_grouped`), so the 0.95-recall
operating point leans entirely on a deep exact rerank (rr128).  The
reference claims 90-95% recall@10 at 8-16x compression
(/root/reference/README.md:508, quantization.py:414-615).

This lab isolates CODEBOOK ordering quality from kernels and serving:
routing (nearest-centroid top-np cells) is shared across variants; each
variant encodes the residuals its own way; the metric is survival of
the true top-10 into the approx-ordered top-c of the probed candidate
pool — exactly the recall an exact rerank of depth c/k would serve.

Variants:
  pq4          m=D/4, K=16   (shipped default; 16x vs f32, MXU one-hot ADC)
  pq4_it30     same, pq_iters=30 (does Lloyd convergence matter?)
  pq8          m=D/8, K=256  (classic 8-bit PQ; 32x)
  pq8_wide     m=D/4, K=256  (8 bits per 4 dims; 16x)
  pq4_m384     m=D/2, K=16   (4 bits per 2 dims; 8x)
  int4r        scalar int4 on residuals (4 bits/dim; 8x packed)
  int8r        scalar int8 on residuals (8 bits/dim; 4x — upper bound)

Each row reports recall@10 after exact rerank depth c in {10,40,160,320}
(i.e. rr0/rr4/rr16/rr32) plus the residual-space quantization error
ratio err_var/resid_var — the scalar that predicts ordering quality.

Usage: python benchmarks/pq_quality_lab.py [--cpu] [--n 100000] ...
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.quant.kmeans import assign_chunked, kmeans_fit
from fastpyvectordb_tpu.quant.product import _encode as pq_encode


def emit(**kw):
    print(json.dumps(kw), flush=True)


def pq_train_encode(resid, m, kk, iters, seed):
    """Train per-subspace codebooks on (a sample of) resid and encode all
    of it.  Returns (codes (N, m) uint8, codebooks (m, kk, ds))."""
    n, d = resid.shape
    ds = d // m
    sub = jnp.moveaxis(jnp.asarray(resid).reshape(n, m, ds), 1, 0)
    keys = jax.random.split(jax.random.PRNGKey(seed), m)
    cbs = jax.vmap(lambda x, key: kmeans_fit(
        x, key, k=kk, iters=iters, chunk=min(16384, max(256, n))))(sub, keys)
    codes = pq_encode(jnp.asarray(resid), cbs)
    return np.asarray(codes), cbs


def pq_decode(codes, cbs):
    m = codes.shape[1]
    dec = jax.vmap(lambda cb, col: jnp.take(cb, col.astype(jnp.int32),
                                            axis=0),
                   in_axes=(0, 1))(cbs, jnp.asarray(codes))  # (m, N, ds)
    return np.asarray(jnp.moveaxis(dec, 0, 1).reshape(codes.shape[0], -1))


def scalar_resid(resid, bits, lo_p=0.5, hi_p=99.5):
    """Per-dim scalar quantization of residuals at `bits` bits/dim;
    returns the dequantized reconstruction."""
    levels = (1 << bits) - 1
    vmin = np.percentile(resid, lo_p, axis=0)
    vmax = np.percentile(resid, hi_p, axis=0)
    step = np.maximum((vmax - vmin) / levels, 1e-12)
    codes = np.clip(np.round((resid - vmin) / step), 0, levels)
    return codes * step + vmin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=0, help="0 = 2*sqrt(n)")
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--kmeans-iters", type=int, default=6)
    ap.add_argument("--pq-iters", type=int, default=12)
    ap.add_argument("--variants", default=(
        "pq4,pq4_it30,pq8,pq8_wide,pq4_m384,int4r,int8r"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n, d, k = args.n, args.d, 10
    nlist = args.nlist or int(2 * np.sqrt(n))
    platform = jax.devices()[0].platform
    t0 = time.time()

    # clustered corpus — same construction as bench.py / benchmarks/_data.py
    key = jax.random.PRNGKey(0)
    kv, kq, kc, ka, kaq = jax.random.split(key, 5)
    n_centers = min(1024, max(8, n // 64))
    centers = 2.0 * jax.random.normal(kc, (n_centers, d), dtype=jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    v = centers[assign] + jax.random.normal(kv, (n, d), dtype=jnp.float32)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    qassign = jax.random.randint(kaq, (args.queries,), 0, n_centers)
    q = centers[qassign] + 0.5 * jax.random.normal(
        kq, (args.queries, d), dtype=jnp.float32)
    q = np.asarray(q / jnp.linalg.norm(q, axis=1, keepdims=True))

    # shared IVF routing: nearest-centroid assignment (spill/balance are
    # second-order for codebook ranking and identical across variants)
    cents = kmeans_fit(v, jax.random.PRNGKey(7), k=nlist,
                       iters=args.kmeans_iters, chunk=min(16384, n))
    cell_of = np.asarray(assign_chunked(v, cents, chunk=min(65536, n)))
    cn = np.asarray(cents / jnp.linalg.norm(cents, axis=1, keepdims=True))
    probe = np.argsort(-(q @ cn.T), axis=1)[:, :args.nprobe]  # (Q, np)

    v_np = np.asarray(v)
    resid = v_np - np.asarray(cents)[cell_of]
    resid_var = float(np.mean(resid ** 2))

    # exact oracle (full corpus) + routed candidate pools
    exact_scores = q @ v_np.T
    oracle = np.argsort(-exact_scores, axis=1)[:, :k]
    pools = [np.nonzero(np.isin(cell_of, probe[i]))[0]
             for i in range(q.shape[0])]
    routed = float(np.mean([len(set(oracle[i]) & set(pools[i])) / k
                            for i in range(q.shape[0])]))
    emit(exp="pq_lab_setup", n=n, d=d, nlist=nlist, nprobe=args.nprobe,
         resid_var=round(resid_var, 5), routing_recall=round(routed, 4),
         build_s=round(time.time() - t0, 1), platform=platform)

    def eval_recon(name, xhat, bytes_per_row):
        """Recall@10 after exact rerank depth c, using approx ordering by
        cosine(q, xhat) within the probed pool."""
        err = float(np.mean((xhat - v_np) ** 2))
        xn = np.linalg.norm(xhat, axis=1)
        out = {"exp": "pq_lab", "variant": name,
               "bytes_per_row": bytes_per_row,
               "compression_vs_f32": round(4 * d / bytes_per_row, 1),
               "err_over_resid_var": round(err / max(resid_var, 1e-12), 4)}
        for c in (k, 4 * k, 16 * k, 32 * k):
            recs = []
            for i in range(q.shape[0]):
                pool = pools[i]
                if pool.size == 0:
                    recs.append(0.0)
                    continue
                s = xhat[pool] @ q[i] / np.maximum(xn[pool], 1e-12)
                top = pool[np.argsort(-s)[:min(c, pool.size)]]
                recs.append(len(set(oracle[i]) & set(top)) / k)
            out[f"recall_rr{c // k - 1}"] = round(float(np.mean(recs)), 4)
        out["platform"] = platform
        emit(**out)

    base = np.asarray(cents)[cell_of]
    variants = set(args.variants.split(","))

    if "pq4" in variants:
        codes, cbs = pq_train_encode(resid, d // 4, 16, args.pq_iters, 1)
        eval_recon("pq4_m192_k16", base + pq_decode(codes, cbs), d // 4)
    if "pq4_it30" in variants:
        codes, cbs = pq_train_encode(resid, d // 4, 16, 30, 1)
        eval_recon("pq4_it30", base + pq_decode(codes, cbs), d // 4)
    if "pq8" in variants:
        codes, cbs = pq_train_encode(resid, d // 8, 256, args.pq_iters, 2)
        eval_recon("pq8_m96_k256", base + pq_decode(codes, cbs), d // 8)
    if "pq8_wide" in variants:
        codes, cbs = pq_train_encode(resid, d // 4, 256, args.pq_iters, 3)
        eval_recon("pq8_wide_m192_k256", base + pq_decode(codes, cbs),
                   d // 4)
    if "pq4_m384" in variants:
        codes, cbs = pq_train_encode(resid, d // 2, 16, args.pq_iters, 4)
        eval_recon("pq4_m384_k16", base + pq_decode(codes, cbs), d // 2)
    if "int4r" in variants:
        eval_recon("int4_resid", base + scalar_resid(resid, 4), d // 2)
    if "int8r" in variants:
        eval_recon("int8_resid", base + scalar_resid(resid, 8), d)

    emit(exp="pq_lab_done", total_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
