"""Alias namespace: `utils` -> persistence + profiling utilities.

Canonical modules: `fastpyvectordb_tpu.persist.format` (FPVT container,
streaming IO, compression) and `fastpyvectordb_tpu.profiling`.
"""
from .persist.format import (  # noqa: F401
    Container,
    StreamingVectorReader,
    StreamingVectorWriter,
    compress_vectors,
    decompress_vectors,
    load_container,
    save_container,
)
from .profiling import QueryTimer, annotate, trace  # noqa: F401


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (n <= 1 -> 1).  The single shared
    implementation behind store capacity buckets, IVF chunk sizing, and
    quantized-scan chunking."""
    p = 1
    while p < n:
        p <<= 1
    return p
