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
batch=1024 queries.  Recall@10 is validated against exact float32
(Precision.HIGHEST) ground truth on a query subsample; the headline QPS
only counts if recall >= 0.95.

Robustness contract (round-5 redesign after two rc=124 rounds): the
measurement runs in a CHILD process that appends one JSON row per measured
candidate to a partial file the moment that candidate finishes.  The parent
enforces a hard wall-clock budget (BENCH_TIME_BUDGET_S, default 540 s
total including device wait), kills the child at the deadline, and prints
the headline line from whatever rows landed.  Candidates run in value
order — exact bf16 first, the int8 two-stage second (the usual winner),
int4 / grouped IVF only with time remaining — so a slow or contended chip
still yields a recorded artifact instead of rc=124.
"""

import json
import os
import sys
import time

BASELINE_QPS = 10.04  # reference batch-GEMM BLAS scan, FLOPs-scaled to 1Mx768
_T0 = time.monotonic()


def _budget() -> float:
    return float(os.environ.get("BENCH_TIME_BUDGET_S", "540"))


def _remaining() -> float:
    return _budget() - (time.monotonic() - _T0)


# --------------------------------------------------------------------------
# child: the actual measurement.  Emits one JSON row per candidate to the
# file named by BENCH_EMIT_PATH as soon as it is measured, then exits 0.
# --------------------------------------------------------------------------

_CHILD_ROWS: list = []
_PARENT_PID = os.getppid()


def _emit(row: dict) -> None:
    path = os.environ["BENCH_EMIT_PATH"]
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")
        f.flush()
        os.fsync(f.fileno())
    # ALSO print the best-so-far headline to stdout immediately: if the
    # DRIVER's own timeout kills the parent before the run completes, the
    # last line already printed is a valid recorded artifact (the r3/r4
    # rc=124 losses both left stdout empty).  The parent re-prints the
    # final line at the end; a parser taking the last JSON line sees the
    # same thing either way.
    _CHILD_ROWS.append(row)
    _print_headline(_CHILD_ROWS)


def _orphaned() -> bool:
    """Parent gone (driver timeout killed it): stop measuring so the
    detached child can't squat the chip into the next consumer."""
    return os.getppid() != _PARENT_PID


def child_main() -> None:
    import jax

    if os.environ.get("BENCH_FORCE_CPU") == "1":
        # last-resort fallback when the TPU tunnel is down at record time:
        # the CPU run is honestly labeled (platform field) and FLOPs-scaled,
        # and beats recording a crashed artifact.  Must precede backend init
        # (sitecustomize pins the axon platform otherwise).
        jax.config.update("jax_platforms", "cpu")

    # TPU compiles through the axon tunnel are slow (minutes); cache them
    # across bench runs.  The round primes this cache early (prime.py).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from fastpyvectordb_tpu.core.types import DistanceMetric
    from fastpyvectordb_tpu.kernels import distances as K

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

    def recall_of(rows) -> float:
        return float(np.mean([
            len(set(a.tolist()) & set(e.tolist())) / k
            for a, e in zip(np.asarray(rows), rows_exact)]))

    recall = recall_of(rows_fast)

    # serving config: fastest mode that clears the 0.95 recall bar
    if recall >= 0.95:
        compute_dtype, vv, approx = "bfloat16", v16, True
    else:
        compute_dtype, vv, approx = "float32", v32, False
        recall = 1.0

    # measurement harness -------------------------------------------------
    iters = 16 if on_accelerator else 3
    qbatches = []
    for i in range(iters + 1):
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
        qa = jax.random.randint(k1, (batch,), 0, n_centers)
        # DISTINCT query batches: the axon runtime deduplicates identical
        # dispatches, which would inflate QPS
        qbatches.append(centers[qa] + 0.5 * jax.random.normal(
            k2, (batch, d), dtype=jnp.float32))

    def fetch1(o):
        # true barrier: block_until_ready is unreliable through the axon
        # tunnel (measured returning before execution — see
        # benchmarks/ivfg_pallas_lab.py); fetching one element of the LAST
        # output drains the in-order dispatch queue
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(o)[0].ravel()[:1]))

    scale = n / 1_000_000  # FLOPs-scale small-corpus fallback QPS to 1Mx768

    def measure(mode: str, run, rec: float) -> None:
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
        _emit({"mode": mode, "qps": iters * batch / dt * scale,
               "recall": rec, "dt": dt, "corpus": n, "dims": d,
               "batch": batch, "iters": iters, "platform": platform,
               "ms_per_query": 1000.0 * dt / (iters * batch)})

    # candidate 1: the exact scan — ALWAYS measured first so a partial run
    # still records a valid headline
    def run_exact(q):
        return K.search_kernel(q, vv, sq, rinv, mask, metric=metric, k=k,
                               compute_dtype=compute_dtype, approx=approx)

    measure("exact_" + compute_dtype, run_exact, recall)

    # candidate 2 (accelerator only): the fused int8 two-stage pipeline —
    # s8xs8 MXU coarse scan over 4x-smaller codes, then an exact bf16
    # re-rank of the top-4k.  The usual winner (r4logs/bench.log: 133k QPS
    # vs exact's 117k), so it runs SECOND, before any optional candidate.
    min_left = float(os.environ.get("BENCH_MIN_CANDIDATE_S", "60"))
    if (on_accelerator or force_all) and recall >= 0.95 and not _orphaned():
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
            recall_i8 = recall_of(rows_i8)
            if recall_i8 >= 0.95:
                measure("int8_2stage", run_int8, recall_i8)
        except Exception as e:  # noqa: BLE001 - degrade to exact, not fail
            print(f"int8 candidate skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # optional candidates: only attempted with wall-clock budget remaining
    # (each can cost minutes of encode/build on a cold or contended chip)
    if (on_accelerator or force_all) and recall >= 0.95 \
            and _remaining() > 2 * min_left and not _orphaned():
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
            recall_i4 = recall_of(rows_i4)
            if recall_i4 >= 0.95:
                measure("int4_2stage", run_int4, recall_i4)
            else:
                print(f"int4 candidate recall {recall_i4:.4f} < 0.95; "
                      "skipped", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"int4 candidate skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # grouped (cell-major) IVF over int8 cells + exact bf16 re-rank — the
    # most expensive build (a 6-iter 1M k-means), so it goes LAST and only
    # with generous budget left
    if (on_accelerator or force_all) and recall >= 0.95 \
            and _remaining() > 3 * min_left and not _orphaned():
        try:
            from fastpyvectordb_tpu.ann.ivf import (
                _assign_topm, _balanced_assignment, _encode_cells,
                kmeans_fit)
            from fastpyvectordb_tpu.ann.ivf_grouped import (
                grouped_ivf_search_kernel, grouped_qcap)
            from fastpyvectordb_tpu.quant.scalar import _train

            nlist, nprobe, rr = 2048, 8, 4
            cents = kmeans_fit(v32, jax.random.PRNGKey(7), k=nlist,
                               iters=6, chunk=16384, n=n)
            topm = np.asarray(_assign_topm(v32, cents, m=8, n=n))
            cap = int(max(128, -(-int(1.25 * n / nlist) // 128) * 128))
            table, _counts, overflow = _balanced_assignment(topm, nlist, cap)
            safe = jnp.maximum(jnp.asarray(table), 0)
            vmin, scale8 = _train(v32[:: max(1, n // 200_000)][:200_000])
            blk = max(1, min(nlist, -(-100_000 // cap)))
            cells_i8, cnorms = _encode_cells(v32, safe, vmin, scale8, blk=blk)
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
            qcap = grouped_qcap(batch, nprobe, nlist, cap)

            def run_ivfg(q):
                return grouped_ivf_search_kernel(
                    q, cents, cells_i8, tbl_d, ovecs, orows_d, okc, oko,
                    vmin, scale8, cnorms, v16, metric=metric, k=k,
                    nprobe=nprobe, qcap=qcap, compute_dtype="bfloat16",
                    rerank=rr)

            _, rows_g, _ = run_ivfg(qchk)
            recall_g = recall_of(rows_g)
            if recall_g >= 0.95:
                measure("ivf_grouped_int8_rr4", run_ivfg, recall_g)
            else:
                print(f"ivf_grouped candidate recall {recall_g:.4f} < 0.95;"
                      " skipped", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"ivf_grouped candidate skipped ({type(e).__name__}: {e})",
                  file=sys.stderr)


# --------------------------------------------------------------------------
# parent: budget enforcement + headline assembly
# --------------------------------------------------------------------------

def _read_rows(path: str) -> list:
    rows = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass  # torn tail from a killed child
    except FileNotFoundError:
        pass
    return rows


def _print_headline(rows: list) -> None:
    best = max(rows, key=lambda r: r["qps"])
    print(json.dumps({
        "metric": "search_qps_1Mx768_recall@10>=0.95",
        "value": round(best["qps"], 2),
        "unit": "qps",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 2),
        "recall_at_10": round(best["recall"], 4),
        "corpus_kind": "clustered_1024c",
        "mode": best["mode"],
        "all_modes_qps": {r["mode"]: round(r["qps"], 1) for r in rows},
        "corpus": best["corpus"],
        "dims": best["dims"],
        "batch": best["batch"],
        "ms_per_query": round(best["ms_per_query"], 4),
        "platform": best["platform"],
    }), flush=True)


def _run_child(env_extra: dict, deadline_s: float, emit_path: str) -> list:
    """Run the measurement child under a hard deadline; return its rows."""
    import signal
    import subprocess

    env = dict(os.environ)
    env.update(env_extra)
    env["BENCH_EMIT_PATH"] = emit_path
    # the child budgets its OPTIONAL candidates against the same clock the
    # parent kills on, minus a safety margin for the kill itself
    env["BENCH_TIME_BUDGET_S"] = str(max(30.0, deadline_s - 30.0))
    try:
        os.remove(emit_path)
    except FileNotFoundError:
        pass
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"], env=env,
        start_new_session=True)
    try:
        proc.wait(timeout=max(10.0, deadline_s))
    except subprocess.TimeoutExpired:
        print(f"bench child exceeded {deadline_s:.0f}s deadline; killing "
              "and recording partial results", file=sys.stderr)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait(timeout=30)
    return _read_rows(emit_path)


def _wait_for_device(max_wait_s: float) -> bool:
    """Block until the backend answers a tiny dispatch, up to max_wait_s.

    Probes in a SUBPROCESS so a dead tunnel cannot poison this process's
    backend state (the round-1/2 MULTICHIP artifacts died to exactly that).
    Returns whether the device answered.
    """
    import subprocess

    if max_wait_s <= 0:
        return True
    probe = ("import jax, numpy as np; "
             "np.asarray(jax.device_get(jax.numpy.ones((8, 8)).sum()))")
    # the probe's own tiny compile goes through the remote tunnel and can
    # take 60-120+ s COLD; route it through the persistent cache (warm
    # probes then cost one RTT) and size the timeout for the cold case
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    deadline = time.monotonic() + max_wait_s
    while True:
        left = deadline - time.monotonic()
        if left <= 0:
            print("device probe still failing at deadline", file=sys.stderr)
            return False
        try:
            rc = subprocess.run([sys.executable, "-c", probe],
                                capture_output=True, env=env,
                                timeout=min(180, max(10, left))).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if time.monotonic() >= deadline:
            print("device probe still failing at deadline", file=sys.stderr)
            return False
        wait = min(30.0, max(1.0, deadline - time.monotonic()))
        print(f"device down; re-probing in {wait:.0f}s", file=sys.stderr)
        time.sleep(wait)


def parent_main() -> None:
    emit_path = os.environ.get(
        "BENCH_PARTIAL_PATH", f"/tmp/bench_partial_{os.getpid()}.jsonl")

    force_cpu = os.environ.get("BENCH_FORCE_CPU") == "1"
    if not force_cpu:
        # bounded device wait: an honestly-labeled CPU line beats a
        # timed-out run, so the wait shares the TOTAL budget rather than
        # adding to it
        wait_s = float(os.environ.get("BENCH_DEVICE_WAIT_S", "150"))
        up = _wait_for_device(min(wait_s, max(0.0, _remaining() - 120.0)))
        if up:
            rows = _run_child({}, max(30.0, _remaining() - 45.0), emit_path)
            if rows:
                _print_headline(rows)
                return
            print("accelerator run produced no rows; falling back to CPU",
                  file=sys.stderr)
        else:
            print("falling back to the CPU backend for the recorded line",
                  file=sys.stderr)

    # CPU fallback (or forced): small corpus, FLOPs-scaled, honest platform
    rows = _run_child({"BENCH_FORCE_CPU": "1"},
                      max(60.0, _remaining() - 15.0), emit_path)
    if rows:
        _print_headline(rows)
        return
    # absolute last resort: a valid JSON line that says the run failed —
    # parseable beats rc=124
    print(json.dumps({
        "metric": "search_qps_1Mx768_recall@10>=0.95", "value": 0.0,
        "unit": "qps", "vs_baseline": 0.0, "error": "no_candidate_measured",
    }), flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
    else:
        parent_main()
