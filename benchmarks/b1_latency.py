"""Single-query (B=1) latency, with the tunnel RTT isolated out.

The reference serves one query at p50 0.110 ms via hnswlib
(/root/reference/notes_benchmark.txt:31-33) — its strongest regime, and
the one the round-3 verdict flagged as "dark" here: every measured B=1
number on this rig includes a ~20-30 ms remote-tunnel round trip per
dispatch, so the on-device latency was never quantified.

Three measurements per config:

  rtt_ms        fetch of a 1-element device array (pure tunnel floor)
  api_b1_ms     one search dispatch + fetch, over DISTINCT queries —
                what a remote client actually experiences end-to-end
  device_b1_ms  a lax.scan chain of SCAN_LEN sequential B=1 searches,
                each query data-dependent on the previous result (the
                top-1 row's vector perturbs the next query), all inside
                ONE dispatch.  The device must serialize the chain, so
                wall / SCAN_LEN is the honest on-device per-query
                latency with zero host involvement — the number to put
                against hnswlib's 0.110 ms.

Configs: the reference's own benchmark shape (100k x 128) and this
repo's headline shape (1M x 768), both exact bf16 serving scans.

Usage: python benchmarks/b1_latency.py [--cpu]
"""

import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K

SCAN_LEN = 256
REPS = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fetch1(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def measure(n, d, metric=DistanceMetric.COSINE, k=10):
    key = jax.random.PRNGKey(0)
    kv, kq = jax.random.split(key)
    v32 = jax.random.normal(kv, (n, d), dtype=jnp.float32)
    v32 = v32 / jnp.linalg.norm(v32, axis=1, keepdims=True)
    stats = K.corpus_stats(v32)
    sq, rinv = stats["sq"], stats["rinv"]
    v16 = v32.astype(jnp.bfloat16)
    mask = jnp.ones((n,), dtype=bool)
    queries = jax.random.normal(kq, (REPS + 1, d), dtype=jnp.float32)

    # NOTE: the corpus must be a jit ARGUMENT everywhere below — a
    # closed-over device array is embedded in the shipped HLO as a
    # constant, and at 1M x 768 the 1.5 GB body blows the remote-compile
    # relay's request limit (HTTP 413; see ROADMAP #34)
    def search1(q, vv, vsq, vrinv, vmask):
        return K.search_kernel(q[None, :], vv, vsq, vrinv, vmask,
                               metric=metric, k=k,
                               compute_dtype="bfloat16", approx=True)

    # --- tunnel RTT floor: fetch of a resident 1-element array ---------
    one = jnp.zeros((1,))
    fetch1(one)
    t0 = time.perf_counter()
    for _ in range(REPS):
        fetch1(one)
    rtt = (time.perf_counter() - t0) / REPS

    # --- end-to-end API B=1 (what a remote caller sees) ----------------
    jit1 = jax.jit(search1)
    fetch1(jit1(queries[0], v16, sq, rinv, mask))  # compile
    t0 = time.perf_counter()
    for i in range(REPS):
        fetch1(jit1(queries[i + 1], v16, sq, rinv, mask))
    api_b1 = (time.perf_counter() - t0) / REPS

    # --- on-device B=1: data-dependent scan chain, one dispatch --------
    @jax.jit
    def chain(q0, vv, vsq, vrinv, vmask):
        def body(q, _):
            dists, rows = search1(q, vv, vsq, vrinv, vmask)
            # the NEXT query depends on THIS result: gather the top-1
            # row's vector and fold it in — no pipelining possible
            top = jnp.take(vv, rows[0, 0], axis=0).astype(jnp.float32)
            qn = q + 1e-3 * top + 1e-6 * dists[0, 0]
            qn = qn / jnp.linalg.norm(qn)
            return qn, dists[0, 0]
        qf, ds = jax.lax.scan(body, q0, None, length=SCAN_LEN)
        return qf, ds

    fetch1(chain(queries[0], v16, sq, rinv, mask))  # compile
    t0 = time.perf_counter()
    for i in range(REPS):
        fetch1(chain(queries[i + 1], v16, sq, rinv, mask))
    dev_chain = (time.perf_counter() - t0) / REPS
    # subtract the fetch RTT once per chain call; SCAN_LEN searches ran
    dev_b1 = max(dev_chain - rtt, 0.0) / SCAN_LEN

    emit(exp=f"b1_latency_{n}x{d}", n=n, d=d,
         rtt_ms=round(rtt * 1e3, 3),
         api_b1_ms=round(api_b1 * 1e3, 3),
         device_b1_ms=round(dev_b1 * 1e3, 4),
         scan_len=SCAN_LEN,
         platform=jax.devices()[0].platform,
         note="device_b1_ms = data-dependent scan chain / SCAN_LEN; "
              "api_b1_ms includes the remote-tunnel round trip")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", default="100000x128,1000000x768",
                    help="comma list of NxD corpus shapes to measure")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # default: the reference's own benchmark shape, then the headline one
    for cfg in args.configs.split(","):
        n, d = (int(x) for x in cfg.split("x"))
        measure(n, d)


if __name__ == "__main__":
    main()
