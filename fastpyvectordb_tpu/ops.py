"""Alias namespace: `ops` -> the kernel layer.

The canonical modules live in `fastpyvectordb_tpu.kernels` (distance
matmuls, masked top-k, Pallas quantized scans).  This alias exists for
discoverability under the conventional `ops/` name.
"""
from .kernels import distances, pallas_quant, topk  # noqa: F401
from .kernels.distances import (  # noqa: F401
    MASKED,
    corpus_stats,
    mask_scores,
    scores,
    search_kernel,
)
from .kernels.topk import masked_top_k, merge_top_k, valid_hits  # noqa: F401
