"""Single-query (B=1) IVF latency at the 1M x 768 headline shape.

Round-4 verdict, Missing #2: the best B=1 on-device latency at 1M x 768
was the exact scan's 2.15 ms — an HBM-streaming floor (1.5 GB of bf16
corpus per dispatch).  hnswlib's defining strength is exactly this
regime (knn_query, /root/reference/vectordb_optimized.py:540, p50
0.110 ms @ 100k x 128).  An IVF B=1 probe reads only
~nprobe * cmax * D int8 bytes (~4.7 MB at np8/cmax768) — microseconds
of HBM traffic — so the per-query (non-grouped) IVF kernel should beat
the exact floor by an order of magnitude.  This bench measures it
honestly:

  device_b1_ms   a lax.scan chain of SCAN_LEN sequential B=1 IVF
                 searches, each query data-dependent on the previous
                 result (the top-1 row's vector perturbs the next
                 query), all inside ONE dispatch — wall / SCAN_LEN is
                 the on-device per-query latency with zero host
                 involvement (same methodology as b1_latency.py)
  recall@10      per (nprobe, rerank) config vs exact f32 ground truth
                 on the clustered corpus (the hard case)
  exact_b1_ms    the same chain around the exact bf16 scan, same run,
                 same corpus — the 2.15 ms floor re-measured for an
                 apples-to-apples ratio
  batch sweep    per-query IVF vs exact at B=8/64 (crossover table)

Usage: python benchmarks/b1_ivf_1m.py [--cpu] [--n 1000000] ...
"""

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.ann.ivf import (_assign_topm, _balanced_assignment,
                                        _encode_cells, _ivf_search_kernel,
                                        kmeans_fit)
from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K
from fastpyvectordb_tpu.quant.scalar import _train


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fetch1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def recall_of(rows, oracle, k):
    return float(np.mean([
        len(set(a.tolist()) & set(e.tolist())) / k
        for a, e in zip(np.asarray(rows), np.asarray(oracle))]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=2048)
    ap.add_argument("--nprobes", default="4,8,16")
    ap.add_argument("--rerank", type=int, default=4)
    ap.add_argument("--kmeans-iters", type=int, default=6)
    ap.add_argument("--scan-len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--batches", default="8,64")
    ap.add_argument("--diag", action="store_true",
                    help="run the fixed-cost isolation chains (approx "
                         "selection / rr0 / int8-two-stage at B=1)")
    ap.add_argument("--diag-filter", default="",
                    help="run only diag variants whose name contains "
                         "this substring (saves chip time)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n, d, k = args.n, args.d, 10
    nlist = min(args.nlist, max(8, n // 8))
    metric = DistanceMetric.COSINE
    platform = jax.devices()[0].platform
    t_start = time.time()

    # clustered corpus — same construction as bench.py / benchmarks/_data.py
    key = jax.random.PRNGKey(0)
    kv, kq, kc, ka, kaq = jax.random.split(key, 5)
    n_centers = min(1024, max(8, n // 64))
    centers = 2.0 * jax.random.normal(kc, (n_centers, d), dtype=jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    v32 = centers[assign] + jax.random.normal(kv, (n, d), dtype=jnp.float32)
    v32 = v32 / jnp.linalg.norm(v32, axis=1, keepdims=True)
    v16 = v32.astype(jnp.bfloat16)
    stats = K.corpus_stats(v32)
    sq, rinv = stats["sq"], stats["rinv"]
    fullmask = jnp.ones((n,), dtype=bool)

    # ---- IVF build (int8 cells; the bench.py grouped-candidate recipe) --
    cents = kmeans_fit(v32, jax.random.PRNGKey(7), k=nlist,
                       iters=args.kmeans_iters,
                       chunk=int(min(16384, n)), n=n)
    topm = np.asarray(_assign_topm(v32, cents, m=min(8, nlist), n=n))
    cap = int(max(128, -(-int(1.25 * n / nlist) // 128) * 128))
    table, _counts, overflow = _balanced_assignment(topm, nlist, cap)
    safe = jnp.maximum(jnp.asarray(table), 0)
    vmin, scale = _train(v32[:: max(1, n // 200_000)][:200_000])
    blk = max(1, min(nlist, -(-100_000 // cap)))
    cells_i8, cnorms = _encode_cells(v32, safe, vmin, scale, blk=blk)
    tbl_d = jnp.asarray(table)
    cnorms = jnp.where(tbl_d >= 0, cnorms, 0.0)
    opad = (-overflow.size) % 8
    orows = (np.concatenate([overflow.astype(np.int32),
                             np.full(opad, -1, np.int32)])
             if (overflow.size or opad) else overflow.astype(np.int32))
    orows_d = jnp.asarray(orows)
    ovecs = (jnp.take(v16, jnp.maximum(orows_d, 0), axis=0)
             if orows.size else jnp.zeros((0, d), jnp.bfloat16))
    okc = tbl_d >= 0
    oko = orows_d >= 0
    emit(exp="b1_ivf_setup", n=n, d=d, nlist=nlist, cap=cap,
         overflow=int((orows >= 0).sum()), build_s=round(time.time()
                                                         - t_start, 1),
         platform=platform)

    # recall oracle: exact f32 over 64 clustered queries
    qassign = jax.random.randint(kaq, (64,), 0, n_centers)
    qchk = centers[qassign] + 0.5 * jax.random.normal(
        kq, (64, d), dtype=jnp.float32)
    _, rows_exact = K.search_kernel(qchk, v32, sq, rinv, fullmask,
                                    metric=metric, k=k,
                                    compute_dtype="float32")

    # --- tunnel RTT floor ------------------------------------------------
    one = jnp.zeros((1,))
    fetch1(one)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fetch1(one)
    rtt = (time.perf_counter() - t0) / args.reps

    def chain_time(chain_fn, *chain_args, **chain_kw):
        """Compile + time a scan chain; returns per-query ms."""
        fetch1(chain_fn(*chain_args, **chain_kw))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fetch1(chain_fn(*chain_args, **chain_kw))
        wall = (time.perf_counter() - t0) / args.reps
        return max(wall - rtt, 0.0) / args.scan_len * 1e3

    # --- exact-scan B=1 chain (the floor, re-measured same-run) ----------
    @jax.jit
    def exact_chain(q0, vv, vsq, vrinv, vmask):
        def body(q, _):
            dists, rows = K.search_kernel(
                q[None], vv, vsq, vrinv, vmask, metric=metric, k=k,
                compute_dtype="bfloat16", approx=True)
            top = jnp.take(vv, rows[0, 0], axis=0).astype(jnp.float32)
            qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
            return qn / jnp.linalg.norm(qn), dists[0, 0]
        return jax.lax.scan(body, q0, None, length=args.scan_len)

    exact_ms = chain_time(exact_chain, qchk[0], v16, sq, rinv, fullmask)
    emit(exp="b1_exact_floor", n=n, d=d, device_b1_ms=round(exact_ms, 4),
         rtt_ms=round(rtt * 1e3, 3), scan_len=args.scan_len,
         platform=platform)

    # --- diagnostic chains (--diag): isolate the fixed ~3.2 ms the first
    # r5 run measured FLAT across nprobe 4..32 (vs the 2.08 ms exact
    # floor).  Suspects: (a) exact lax.top_k over ~56k candidate columns
    # (np*cmax + 51k overflow rows scanned per query) while the exact
    # scan gets approx_max_k; (b) the fused rerank's row gather.
    if args.diag:
        def _want(tag):
            return (not args.diag_filter) or args.diag_filter in tag
        from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
        from fastpyvectordb_tpu.quant.scan import _int8_two_stage
        for name, kw in (
                ("approx_rr4", dict(approx=True, rerank=args.rerank)),
                ("approx_rr0", dict(approx=True, rerank=0)),
                ("exact_rr0", dict(approx=False, rerank=0))):
            if args.diag_filter and args.diag_filter not in name:
                continue
            def diag_fn(q0, cents_, cells_, tbl_, ovecs_, orows_, okc_,
                        oko_, vmin_, scale_, cnorms_, vv, *, kw=tuple(
                            sorted(kw.items()))):
                kw_ = dict(kw)
                def body(q, _):
                    dists, rows = _ivf_search_kernel(
                        q[None], cents_, cells_, tbl_, ovecs_, orows_,
                        okc_, oko_, vmin_, scale_, cnorms_, vv,
                        metric=metric, k=k, nprobe=8,
                        compute_dtype="bfloat16", **kw_)
                    safe_row = jnp.maximum(rows[0, 0], 0)
                    top = jnp.take(vv, safe_row, axis=0).astype(jnp.float32)
                    qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
                    return qn / jnp.linalg.norm(qn), dists[0, 0]
                return jax.lax.scan(body, q0, None, length=args.scan_len)
            ms = chain_time(jax.jit(diag_fn), qchk[0], cents, cells_i8,
                            tbl_d, ovecs, orows_d, okc, oko, vmin, scale,
                            cnorms, v16)
            dd, rr_rows = _ivf_search_kernel(
                jnp.asarray(qchk), cents, cells_i8, tbl_d, ovecs, orows_d,
                okc, oko, vmin, scale, cnorms, v16, metric=metric, k=k,
                nprobe=8, compute_dtype="bfloat16",
                **dict(tuple(sorted(kw.items()))))
            emit(exp=f"b1_ivf_diag_{name}", n=n, nprobe=8,
                 device_b1_ms=round(ms, 4),
                 recall_at_10=round(recall_of(rr_rows, rows_exact, k), 4),
                 vs_exact_floor=round(exact_ms / max(ms, 1e-9), 2),
                 platform=platform)

        if _want("no_overflow"):
            # no-overflow variant: round-2 diag showed the 3.2 ms is flat
            # across nprobe AND selection algorithm AND rerank — the one
            # np-independent stage left is the 51k-row overflow block scanned
            # exactly per query.  Slice it off (recall drops, that's fine for
            # a diagnostic) and re-measure.
            empty_o = jnp.zeros((0, d), jnp.bfloat16)
            empty_r = jnp.zeros((0,), jnp.int32)
            empty_ok = jnp.zeros((0,), bool)

            @jax.jit
            def noov_chain(q0, cents_, cells_, tbl_, okc_, vmin_, scale_,
                           cnorms_, vv):
                def body(q, _):
                    dists, rows = _ivf_search_kernel(
                        q[None], cents_, cells_, tbl_, empty_o, empty_r,
                        okc_, empty_ok, vmin_, scale_, cnorms_, vv,
                        metric=metric, k=k, nprobe=8,
                        compute_dtype="bfloat16", approx=True, rerank=4)
                    safe_row = jnp.maximum(rows[0, 0], 0)
                    top = jnp.take(vv, safe_row, axis=0).astype(jnp.float32)
                    qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
                    return qn / jnp.linalg.norm(qn), dists[0, 0]
                return jax.lax.scan(body, q0, None, length=args.scan_len)

            ms = chain_time(noov_chain, qchk[0], cents, cells_i8, tbl_d, okc,
                            vmin, scale, cnorms, v16)
            _, r_no = _ivf_search_kernel(
                jnp.asarray(qchk), cents, cells_i8, tbl_d, empty_o, empty_r,
                okc, empty_ok, vmin, scale, cnorms, v16, metric=metric, k=k,
                nprobe=8, compute_dtype="bfloat16", approx=True, rerank=4)
            emit(exp="b1_ivf_diag_no_overflow", n=n, nprobe=8,
                 device_b1_ms=round(ms, 4),
                 recall_at_10=round(recall_of(r_no, rows_exact, k), 4),
                 vs_exact_floor=round(exact_ms / max(ms, 1e-9), 2),
                 platform=platform)

        if _want("route_only"):
            # routing-only floor: centroid matmul + top-nprobe, no gather,
            # no scoring — the irreducible per-dispatch cost of the kernel's
            # stage 1 inside the same chain harness
            @jax.jit
            def route_chain(q0, cents_):
                cn_ = cents_ / jnp.maximum(
                    jnp.linalg.norm(cents_, axis=1, keepdims=True), 1e-30)
                def body(q, _):
                    r = jnp.dot(q[None] / jnp.linalg.norm(q), cn_.T,
                                preferred_element_type=jnp.float32)
                    _, probe = jax.lax.top_k(r, 8)
                    top = jnp.take(cn_, probe[0, 0], axis=0)
                    qn = q + 1e-3 * top
                    return qn / jnp.linalg.norm(qn), probe[0, 0]
                return jax.lax.scan(body, q0, None, length=args.scan_len)

            ms = chain_time(route_chain, qchk[0], cents)
            emit(exp="b1_ivf_diag_route_only", n=n,
                 device_b1_ms=round(ms, 4), platform=platform)

        if _want("grouped"):
            # grouped (cell-major pallas) kernel in the same B=1 chain:
            # round-3 diag showed the per-query path's ~3.1 ms survives
            # removing overflow, rerank, and exact selection — the XLA
            # cell gather + scoring stage itself carries the fixed cost.
            # The grouped kernel DMAs cells into VMEM by prefetched cell id
            # (kernels/pallas_ivf.py) instead of an XLA gather; if it is
            # fast at B=1, the serving dispatch just flips its heuristic.
            from fastpyvectordb_tpu.ann.ivf_grouped import (
                grouped_ivf_search_kernel, grouped_qcap)
            qcap1 = grouped_qcap(8, 8, nlist, int(cells_i8.shape[1]))

            @jax.jit
            def grouped_chain(q0, cents_, cells_, tbl_, ovecs_, orows_, okc_,
                              oko_, vmin_, scale_, cnorms_, vv):
                def body(q, _):
                    dists, rows, _drop = grouped_ivf_search_kernel(
                        jnp.broadcast_to(q[None], (8, q.shape[0])), cents_,
                        cells_, tbl_, ovecs_, orows_, okc_, oko_, vmin_,
                        scale_, cnorms_, vv, metric=metric, k=k, nprobe=8,
                        qcap=qcap1, compute_dtype="bfloat16", rerank=4)
                    safe_row = jnp.maximum(rows[0, 0], 0)
                    top = jnp.take(vv, safe_row, axis=0).astype(jnp.float32)
                    qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
                    return qn / jnp.linalg.norm(qn), dists[0, 0]
                return jax.lax.scan(body, q0, None, length=args.scan_len)

            ms = chain_time(grouped_chain, qchk[0], cents, cells_i8, tbl_d,
                            ovecs, orows_d, okc, oko, vmin, scale, cnorms,
                            v16)
            dd_g, rr_g, _ = grouped_ivf_search_kernel(
                jnp.asarray(qchk), cents, cells_i8, tbl_d, ovecs, orows_d,
                okc, oko, vmin, scale, cnorms, v16, metric=metric, k=k,
                nprobe=8, qcap=grouped_qcap(qchk.shape[0], 8, nlist,
                                            int(cells_i8.shape[1])),
                compute_dtype="bfloat16", rerank=4)
            emit(exp="b1_ivf_diag_grouped", n=n, nprobe=8,
                 device_b1_ms=round(ms, 4),
                 recall_at_10=round(recall_of(rr_g, rows_exact, k), 4),
                 vs_exact_floor=round(exact_ms / max(ms, 1e-9), 2),
                 platform=platform)

        if _want("int8"):
            # int8 flat two-stage at B=1: 768 MB of codes + rerank — the
            # serving default's own single-query latency
            qz = ScalarQuantizer().train(np.asarray(v32[:200_000]))
            codes8 = qz.encode(np.asarray(v32))
            cvsq, crinv = qz.corpus_stats(codes8)

            @jax.jit
            def i8_chain(q0, codes_, v_):
                def body(q, _):
                    dists, rows = _int8_two_stage(
                        q[None], codes_, qz.vmin, qz.scale, cvsq, crinv, v_,
                        fullmask, metric=metric, k=k, c=4 * k, approx=True,
                        rerank_dtype="bfloat16")
                    safe_row = jnp.maximum(rows[0, 0], 0)
                    top = jnp.take(v_, safe_row, axis=0).astype(jnp.float32)
                    qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
                    return qn / jnp.linalg.norm(qn), dists[0, 0]
                return jax.lax.scan(body, q0, None, length=args.scan_len)

            ms = chain_time(i8_chain, qchk[0], codes8, v16)
            _, r8 = _int8_two_stage(jnp.asarray(qchk), codes8, qz.vmin,
                                    qz.scale, cvsq, crinv, v16, fullmask,
                                    metric=metric, k=k, c=4 * k, approx=True,
                                    rerank_dtype="bfloat16")
            emit(exp="b1_int8_2stage", n=n, device_b1_ms=round(ms, 4),
                 recall_at_10=round(recall_of(r8, rows_exact, k), 4),
                 vs_exact_floor=round(exact_ms / max(ms, 1e-9), 2),
                 platform=platform)

    # --- per-query IVF chains, one per (nprobe) ---------------------------
    for nprobe in (int(x) for x in args.nprobes.split(",")):
        nprobe = min(nprobe, nlist)
        # recall via the actual serving kernel (rerank fused)
        dd, rr_rows = _ivf_search_kernel(
            jnp.asarray(qchk), cents, cells_i8, tbl_d, ovecs, orows_d,
            okc, oko, vmin, scale, cnorms, v16, metric=metric, k=k,
            nprobe=nprobe, compute_dtype="bfloat16", approx=False,
            rerank=args.rerank)
        rec = recall_of(rr_rows, rows_exact, k)

        def ivf_chain_fn(q0, cents_, cells_, tbl_, ovecs_, orows_, okc_,
                         oko_, vmin_, scale_, cnorms_, vv, *, nprobe):
            def body(q, _):
                dists, rows = _ivf_search_kernel(
                    q[None], cents_, cells_, tbl_, ovecs_, orows_, okc_,
                    oko_, vmin_, scale_, cnorms_, vv, metric=metric,
                    k=k, nprobe=nprobe, compute_dtype="bfloat16",
                    approx=False, rerank=args.rerank)
                safe_row = jnp.maximum(rows[0, 0], 0)
                top = jnp.take(vv, safe_row, axis=0).astype(jnp.float32)
                qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
                return qn / jnp.linalg.norm(qn), dists[0, 0]
            return jax.lax.scan(body, q0, None, length=args.scan_len)

        ivf_chain = jax.jit(ivf_chain_fn, static_argnames=("nprobe",))
        ivf_ms = chain_time(ivf_chain, qchk[0], cents, cells_i8, tbl_d,
                            ovecs, orows_d, okc, oko, vmin, scale, cnorms,
                            v16, nprobe=nprobe)
        emit(exp="b1_ivf_1m", n=n, d=d, nlist=nlist, nprobe=nprobe,
             rerank=args.rerank, recall_at_10=round(rec, 4),
             device_b1_ms=round(ivf_ms, 4),
             vs_exact_floor=round(exact_ms / max(ivf_ms, 1e-9), 2),
             scan_len=args.scan_len, rtt_ms=round(rtt * 1e3, 3),
             platform=platform)

    # --- small-batch crossover: per-query IVF vs exact at B=8/64 ---------
    for b in (int(x) for x in args.batches.split(",")):
        qb = []
        for i in range(args.reps + 1):
            k1, k2 = jax.random.split(jax.random.PRNGKey(500 + 31 * i + b))
            qa = jax.random.randint(k1, (b,), 0, n_centers)
            qb.append(centers[qa] + 0.5 * jax.random.normal(
                k2, (b, d), dtype=jnp.float32))

        def timed(run):
            out0 = run(qb[0])
            fetch1(out0)
            t0 = time.perf_counter()
            fetch1(out0)
            r = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [run(x) for x in qb[1:]]
            fetch1(outs[-1])
            wall = time.perf_counter() - t0
            return (wall - min(r, 0.5 * wall)) / args.reps / b * 1e3

        np_mid = int(args.nprobes.split(",")[len(args.nprobes.split(","))
                                             // 2])
        ivf_b = timed(lambda q: _ivf_search_kernel(
            q, cents, cells_i8, tbl_d, ovecs, orows_d, okc, oko, vmin,
            scale, cnorms, v16, metric=metric, k=k,
            nprobe=min(np_mid, nlist), compute_dtype="bfloat16",
            approx=False, rerank=args.rerank))
        exact_b = timed(lambda q: K.search_kernel(
            q, v16, sq, rinv, fullmask, metric=metric, k=k,
            compute_dtype="bfloat16", approx=True))
        emit(exp="b1_ivf_crossover", n=n, d=d, batch=b,
             nprobe=min(np_mid, nlist),
             ivf_ms_per_q=round(ivf_b, 4), exact_ms_per_q=round(exact_b, 4),
             speedup=round(exact_b / max(ivf_b, 1e-9), 2),
             platform=platform)

    emit(exp="b1_ivf_done", total_s=round(time.time() - t_start, 1))


if __name__ == "__main__":
    main()
