"""Shared benchmark corpora.

Quantizers and ANN indexes exploit structure; pure Gaussian noise is the
degenerate worst case for both (every neighbor list is spread uniformly
over cells).  The reference's own recall claims are on structured data
(README.md:504-508), so recall-bearing benchmarks use a clustered corpus:
1024 centers at 2x scale + unit noise, queries near centers — the same
construction round 1 measured with (benchmarks/tpu_validate.py).
"""

import numpy as np

N_CENTERS = 1024


def clustered_corpus(n: int, d: int, seed: int = 0, normalize: bool = True,
                     chunk: int = 500_000):
    rng = np.random.default_rng(seed)
    centers = (rng.standard_normal((N_CENTERS, d)) * 2.0).astype(np.float32)
    out = np.empty((n, d), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        assign = rng.integers(0, N_CENTERS, e - s)
        x = centers[assign] + rng.standard_normal((e - s, d)).astype(
            np.float32)
        if normalize:
            x /= np.linalg.norm(x, axis=1, keepdims=True)
        out[s:e] = x
    return out, centers


def clustered_queries(centers: np.ndarray, b: int, seed: int = 1,
                      noise: float = 0.5):
    rng = np.random.default_rng(seed)
    q = centers[rng.integers(0, centers.shape[0], b)] + \
        noise * rng.standard_normal((b, centers.shape[1])).astype(np.float32)
    return np.ascontiguousarray(q, dtype=np.float32)
