"""Micro-bench: which matmul forms hit the fast MXU paths on this chip.

Decides the layout for the int8 quantized scan (quant/scalar.py int8mm).
"""

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

N, D, B, K = 1_000_000, 768, 256, 40


def timed(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, D), -127, 127, dtype=jnp.int8)
    codes_t = jnp.asarray(np.asarray(codes[:D * 128]).T) if False else codes.T
    codes_t = jax.block_until_ready(codes_t)
    qi = jax.random.randint(key, (B, D), -127, 127, dtype=jnp.int8)
    qb = qi.astype(jnp.bfloat16)
    vb_t = codes_t.astype(jnp.bfloat16)
    vb_t = jax.block_until_ready(vb_t)

    @jax.jit
    def i8_nd(q, c):      # contraction (1,1) on (N, D) codes
        return jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def i8_dn(q, ct):     # standard (B,D)@(D,N)
        return jax.lax.dot_general(q, ct, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def bf16_dn(q, ct):
        return jax.lax.dot_general(q, ct, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def i8_dn_topk(q, ct):  # fused scan + approx top-k (no (B,N) write)
        s = jax.lax.dot_general(q, ct, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jax.lax.approx_max_k(-s.astype(jnp.float32), K,
                                    recall_target=0.99)

    @jax.jit
    def i8_nd_topk(q, c):
        s = jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jax.lax.approx_max_k(-s.astype(jnp.float32), K,
                                    recall_target=0.99)

    for name, fn, args in [
        ("i8_(N,D)_contract11", i8_nd, (qi, codes)),
        ("i8_(D,N)_standard", i8_dn, (qi, codes_t)),
        ("bf16_(D,N)_standard", bf16_dn, (qb, vb_t)),
        ("i8_(D,N)_fused_topk", i8_dn_topk, (qi, codes_t)),
        ("i8_(N,D)_fused_topk", i8_nd_topk, (qi, codes)),
    ]:
        dt = timed(fn, *args)
        print(json.dumps({"exp": name, "ms": round(dt * 1e3, 3),
                          "qps": round(B / dt, 1)}))


if __name__ == "__main__":
    main()
