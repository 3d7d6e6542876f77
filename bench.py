"""Headline benchmark: search QPS at recall@10 >= 0.95 on a CLUSTERED
1M x 768-d corpus (1024 centers — benchmarks/_data.py construction).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}

Baseline: the reference's fastest full-scan path is the batched BLAS GEMM at
1.66 ms/query for 100k x 128-d (BASELINE.md, notes_benchmark.txt:47-54).
Scaled by FLOPs to this benchmark's 1M x 768-d corpus that is
1.66 ms * 10 * 6 = 99.6 ms/query => 10.04 QPS.  (The reference's HNSW path
has no published numbers at this scale; the BLAS scan is the honest
exact-search baseline, per BASELINE.json's north star.)

The measured configuration is the engine's serving path: corpus resident in
HBM as bfloat16 (storage_dtype=bfloat16, halving bandwidth), fused
distance-matmul + masked top-k (kernels/distances.py:search_kernel),
batch=256 queries.  Recall@10 is validated against exact float32
(Precision.HIGHEST) ground truth on a query subsample; the headline QPS
only counts if recall >= 0.95.
"""

import json
import os
import time

import jax

if os.environ.get("BENCH_FORCE_CPU") == "1":
    # last-resort fallback when the TPU tunnel is down at record time:
    # the CPU run is honestly labeled (platform field) and FLOPs-scaled,
    # and beats recording a crashed artifact.  Must precede backend init
    # (sitecustomize pins the axon platform otherwise).
    jax.config.update("jax_platforms", "cpu")

# TPU compiles through the axon tunnel are slow (minutes); cache them across
# bench runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K

BASELINE_QPS = 10.04  # reference batch-GEMM BLAS scan, FLOPs-scaled to 1Mx768


def main():
    import os
    platform = jax.devices()[0].platform
    on_accelerator = platform in ("tpu", "axon")
    # BENCH_ALL=1 exercises every candidate on the CPU fallback (testing)
    force_all = os.environ.get("BENCH_ALL") == "1"
    n = 1_000_000 if on_accelerator else 100_000
    d = 768
    batch = 1024 if on_accelerator else 256
    k = 10
    metric = DistanceMetric.COSINE

    key = jax.random.PRNGKey(0)
    kv, kq, kc, ka, kaq = jax.random.split(key, 5)
    # CLUSTERED corpus (round-2 verdict item 10): 1024 centers at 2x scale
    # + unit noise, rows normalized, queries near centers — the same
    # construction as benchmarks/_data.py, generated on device.  Gaussian
    # noise is the *easy* case for approximate top-k and quantizers
    # (uniform norms); clustered data is where candidate orderings
    # actually collapse, so the headline recall is earned there.
    n_centers = 1024
    centers = 2.0 * jax.random.normal(kc, (n_centers, d), dtype=jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    v32 = centers[assign] + jax.random.normal(kv, (n, d), dtype=jnp.float32)
    v32 = v32 / jnp.linalg.norm(v32, axis=1, keepdims=True)
    stats = K.corpus_stats(v32)
    sq, rinv = stats["sq"], stats["rinv"]
    v16 = v32.astype(jnp.bfloat16)
    mask = jnp.ones((n,), dtype=bool)
    qassign = jax.random.randint(kaq, (batch,), 0, n_centers)
    queries = (centers[qassign]
               + 0.5 * jax.random.normal(kq, (batch, d), dtype=jnp.float32))

    # ---- recall@10 of the serving path (bf16 + hardware approx top-k)
    # against exact f32 ground truth -------------------------------------
    n_check = 64
    qchk = queries[:n_check]
    _, rows_exact = K.search_kernel(qchk, v32, sq, rinv, mask, metric=metric,
                                    k=k, compute_dtype="float32")
    _, rows_fast = K.search_kernel(qchk, v16, sq, rinv, mask, metric=metric,
                                   k=k, compute_dtype="bfloat16", approx=True)
    rows_exact = np.asarray(rows_exact)
    rows_fast = np.asarray(rows_fast)
    recall = float(np.mean([
        len(set(a.tolist()) & set(e.tolist())) / k
        for a, e in zip(rows_fast, rows_exact)]))

    # serving config: fastest mode that clears the 0.95 recall bar
    if recall >= 0.95:
        compute_dtype, vv, approx = "bfloat16", v16, True
    else:
        compute_dtype, vv, approx = "float32", v32, False
        recall = 1.0

    def run_exact(q):
        return K.search_kernel(q, vv, sq, rinv, mask, metric=metric, k=k,
                               compute_dtype=compute_dtype, approx=approx)

    candidates = {"exact_" + compute_dtype: (run_exact, recall)}

    # second candidate (accelerator only): the fused int8 two-stage
    # pipeline — s8xs8 MXU coarse scan over 4x-smaller codes, then an
    # exact bf16 re-rank of the top-4k candidates.  On chip this streams
    # a quarter of the bytes of the bf16 scan and measured FASTER than it
    # at every batch size (r2 kernel crossover: 13.2 ms vs 23.0 ms at
    # B=1024 over an f32 store); recall is gated the same way.
    if (on_accelerator or force_all) and recall >= 0.95:
        try:
            from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer
            from fastpyvectordb_tpu.quant.scan import _int8_two_stage
            qz = ScalarQuantizer().train(np.asarray(v32[:200_000]))
            codes = qz.encode(np.asarray(v32))
            cvsq, crinv = qz.corpus_stats(codes)

            def run_int8(q):
                return _int8_two_stage(
                    q, codes, qz.vmin, qz.scale, cvsq, crinv, v16, mask,
                    metric=metric, k=k, c=4 * k, approx=True,
                    rerank_dtype="bfloat16")

            _, rows_i8 = run_int8(qchk)
            recall_i8 = float(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / k
                for a, e in zip(np.asarray(rows_i8), rows_exact)]))
            if recall_i8 >= 0.95:
                candidates["int8_2stage"] = (run_int8, recall_i8)
        except Exception as e:  # noqa: BLE001 - degrade to exact, not fail
            print(f"int8 candidate skipped ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)

    # int4 candidate (accelerator only): the fused int4 two-stage — the
    # Pallas kernel unpacks nibbles in VMEM so the coarse scan streams
    # HALF of int8's HBM bytes (quant/int4.py).  The 16-level ordering is
    # coarser, so the candidate pool is 2x deeper (c=8k vs int8's 4k);
    # recall is gated the same way.
    if (on_accelerator or force_all) and recall >= 0.95:
        try:
            from fastpyvectordb_tpu.quant.int4 import Int4Quantizer
            from fastpyvectordb_tpu.quant.scan import _int4_two_stage
            qz4 = Int4Quantizer().train(np.asarray(v32[:200_000]))
            codes4 = qz4.encode(v32)
            vsq4, rinv4 = qz4.corpus_stats(codes4)
            lay4 = qz4.pallas_layout(codes4)
            w4 = int(codes4.shape[1])

            def run_int4(q):
                q_lay = qz4.pallas_query(q, w4)
                return _int4_two_stage(
                    q, q_lay, lay4[0], lay4[1], lay4[2], vsq4, rinv4,
                    v16, mask, metric=metric, k=k, c=8 * k, approx=True,
                    rerank_dtype="bfloat16", use_pallas=on_accelerator)

            _, rows_i4 = run_int4(qchk)
            recall_i4 = float(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / k
                for a, e in zip(np.asarray(rows_i4), rows_exact)]))
            if recall_i4 >= 0.95:
                candidates["int4_2stage"] = (run_int4, recall_i4)
            else:
                print(f"int4 candidate recall {recall_i4:.4f} < 0.95; "
                      "skipped", file=__import__("sys").stderr)
        except Exception as e:  # noqa: BLE001 - degrade to exact, not fail
            print(f"int4 candidate skipped ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)

    # third candidate (accelerator only): grouped (cell-major) IVF over
    # int8 cells with an exact bf16 re-rank — prunes ~nprobe/nlist of the
    # corpus reads instead of scanning everything.  At 4M x 768 this
    # measured 3.1x the exact bf16 scan (benchmarks/results_r3_tpu.json
    # ivf_grouped_4m); the recall gate below decides whether the pruned
    # candidate set survives on this corpus.
    if (on_accelerator or force_all) and recall >= 0.95:
        try:
            from fastpyvectordb_tpu.ann.ivf import (
                _assign_topm, _balanced_assignment, _encode_cells,
                kmeans_fit)
            from fastpyvectordb_tpu.ann.ivf_grouped import (
                grouped_ivf_search_kernel)
            from fastpyvectordb_tpu.quant.scalar import _train

            nlist, nprobe, rr = 2048, 8, 4
            cents = kmeans_fit(v32, jax.random.PRNGKey(7), k=nlist,
                               iters=6, chunk=16384, n=n)
            topm = np.asarray(_assign_topm(v32, cents, m=8, n=n))
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
                     if (overflow.size or opad)
                     else overflow.astype(np.int32))
            orows_d = jnp.asarray(orows)
            ovecs = (jnp.take(v16, jnp.maximum(orows_d, 0), axis=0)
                     if orows.size else jnp.zeros((0, d), jnp.bfloat16))
            okc = tbl_d >= 0            # bench corpus has no tombstones
            oko = orows_d >= 0
            from fastpyvectordb_tpu.ann.ivf_grouped import grouped_qcap
            qcap = grouped_qcap(batch, nprobe, nlist, cap)

            def run_ivfg(q):
                return grouped_ivf_search_kernel(
                    q, cents, cells_i8, tbl_d, ovecs, orows_d, okc, oko,
                    vmin, scale, cnorms, v16, metric=metric, k=k,
                    nprobe=nprobe, qcap=qcap, compute_dtype="bfloat16",
                    rerank=rr)

            _, rows_g, _ = run_ivfg(qchk)
            recall_g = float(np.mean([
                len(set(a.tolist()) & set(e.tolist())) / k
                for a, e in zip(np.asarray(rows_g), rows_exact)]))
            if recall_g >= 0.95:
                candidates["ivf_grouped_int8_rr4"] = (run_ivfg, recall_g)
            else:
                print(f"ivf_grouped candidate recall {recall_g:.4f} < 0.95;"
                      " skipped", file=__import__("sys").stderr)
        except Exception as e:  # noqa: BLE001 - degrade, not fail
            print(f"ivf_grouped candidate skipped ({type(e).__name__}: {e})",
                  file=__import__("sys").stderr)

    del v32  # 3 GB: serving uses the bf16 copy / int8 codes only

    # warm up compile + measure over DISTINCT query batches (the runtime
    # deduplicates identical dispatches, which would inflate QPS)
    iters = 16 if on_accelerator else 3
    qbatches = []
    for i in range(iters + 1):
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
        qa = jax.random.randint(k1, (batch,), 0, n_centers)
        qbatches.append(centers[qa] + 0.5 * jax.random.normal(
            k2, (batch, d), dtype=jnp.float32))
    def fetch1(o):
        # true barrier: block_until_ready is unreliable through the axon
        # tunnel (measured returning before execution — see
        # benchmarks/ivfg_pallas_lab.py); fetching one element of the LAST
        # output drains the in-order dispatch queue
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(o)[0].ravel()[:1]))

    results = {}
    for mode, (run, rec) in candidates.items():
        out0 = run(qbatches[0])
        fetch1(out0)
        t0 = time.perf_counter()
        fetch1(out0)
        rtt = time.perf_counter() - t0      # tunnel round-trip floor
        t0 = time.perf_counter()
        outs = [run(qb) for qb in qbatches[1:]]
        fetch1(outs[-1])
        wall = time.perf_counter() - t0
        # subtract at most half the wall: if the RTT floor dominates, the
        # measurement is RTT-bound and a full subtraction would underflow
        # to absurd QPS and mis-pick the winning mode
        dt = wall - min(rtt, 0.5 * wall)
        results[mode] = (iters * batch / dt, rec, dt)

    best = max(results, key=lambda m: results[m][0])
    qps, recall, dt = results[best]

    # scale the measured QPS to the canonical 1Mx768 config when running on
    # a small-corpus fallback host so vs_baseline stays comparable
    scale = n / 1_000_000
    qps_canonical = qps * scale

    print(json.dumps({
        "metric": "search_qps_1Mx768_recall@10>=0.95",
        "value": round(qps_canonical, 2),
        "unit": "qps",
        "vs_baseline": round(qps_canonical / BASELINE_QPS, 2),
        "recall_at_10": round(recall, 4),
        "corpus_kind": "clustered_1024c",
        "mode": best,
        "all_modes_qps": {m: round(v[0] * scale, 1)
                          for m, v in results.items()},
        "corpus": n,
        "dims": d,
        "batch": batch,
        "ms_per_query": round(1000.0 * dt / (iters * batch), 4),
        "platform": platform,
    }))


def _wait_for_device(max_wait_s: float) -> bool:
    """Block until the backend answers a tiny dispatch, up to max_wait_s.

    Probes in a SUBPROCESS so a dead tunnel cannot poison this process's
    backend state (the round-1/2 MULTICHIP artifacts died to exactly that).
    The round-3 outage showed the tunnel can stay down for hours — a single
    120 s retry is not enough insurance for the recorded run.  Returns
    whether the device answered.
    """
    import subprocess
    import sys
    import time as _t

    if max_wait_s <= 0:
        return True
    probe = ("import jax, numpy as np; "
             "np.asarray(jax.device_get(jax.numpy.ones((8, 8)).sum()))")
    deadline = _t.monotonic() + max_wait_s
    while True:
        try:
            rc = subprocess.run([sys.executable, "-c", probe],
                                capture_output=True, timeout=120).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if _t.monotonic() >= deadline:
            print("device probe still failing at deadline",
                  file=sys.stderr)
            return False
        wait = min(60.0, max(1.0, deadline - _t.monotonic()))
        print(f"device down; re-probing in {wait:.0f}s", file=sys.stderr)
        _t.sleep(wait)


if __name__ == "__main__":
    import os as _os
    import time as _time

    # the TPU tunnel occasionally drops mid-compile ("broken pipe") and
    # recovers within minutes — or, once observed, hours.  Wait (bounded)
    # for the device before burning the recorded attempt, then keep the
    # one-retry policy for mid-run drops.
    # Default wait is deliberately SHORT: the round-3 artifact died rc=124
    # because a 30-min wait out-lived the driver's own kill budget.  9 min
    # of probing + the CPU fallback run stays inside any sane driver
    # timeout; an honestly-labeled CPU line beats a timed-out run.
    up = _wait_for_device(float(_os.environ.get("BENCH_DEVICE_WAIT_S", 540)))
    if not up and _os.environ.get("BENCH_FORCE_CPU") != "1":
        # the recorded artifact must be a valid JSON line even through a
        # tunnel outage: re-exec on the CPU backend (honestly labeled via
        # the "platform" field; value FLOPs-scaled like any CPU run)
        import subprocess as _sp
        import sys as _sys
        env = dict(_os.environ)
        env["BENCH_FORCE_CPU"] = "1"
        env["BENCH_DEVICE_WAIT_S"] = "0"
        print("falling back to the CPU backend for the recorded line",
              file=_sys.stderr)
        raise SystemExit(_sp.run([_sys.executable, __file__],
                                 env=env).returncode)
    try:
        main()
    except Exception as e:  # noqa: BLE001 - transient backend errors vary
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              "retrying in 120s", file=__import__("sys").stderr)
        _time.sleep(120)
        main()
