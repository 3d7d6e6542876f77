"""Timing sanity check on the axon tunnel: identical dispatches appear to be
deduplicated, so every iteration must use distinct inputs.  Establishes the
true per-batch latency of the headline kernels.
"""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.kernels import distances as K


def timed_distinct(fn, batches, fetch=False):
    """One warmup, then time over distinct input batches."""
    out = jax.block_until_ready(fn(batches[0]))
    t0 = time.perf_counter()
    outs = []
    for qb in batches[1:]:
        o = fn(qb)
        outs.append(o)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (len(batches) - 1)
    if fetch:
        _ = np.asarray(outs[-1][0])
    return dt


def main():
    key = jax.random.PRNGKey(0)
    n, d, k = 1_000_000, 768, 10
    kv, kq = jax.random.split(key)
    v32 = jax.random.normal(kv, (n, d), dtype=jnp.float32)
    stats = K.corpus_stats(v32)
    v16 = v32.astype(jnp.bfloat16)
    mask = jnp.ones((n,), dtype=bool)

    for b in (256, 1024):
        batches = [jax.random.normal(jax.random.PRNGKey(i + 1), (b, d),
                                     dtype=jnp.float32) for i in range(9)]
        for approx in (False, True):
            f = lambda qq: K.search_kernel(
                qq, v16, stats["sq"], stats["rinv"], mask,
                metric=DistanceMetric.COSINE, k=k,
                compute_dtype="bfloat16", approx=approx)
            dt = timed_distinct(f, batches)
            print(json.dumps({
                "exp": f"bf16_{'approx' if approx else 'exact'}_topk_b{b}"
                       "_distinct_inputs",
                "ms": round(dt * 1e3, 3), "qps": round(b / dt, 1)}))


if __name__ == "__main__":
    main()
