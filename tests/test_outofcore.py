"""Out-of-core streamed search tests (parity: parallel_search.py mmap
chunked search)."""

import numpy as np
import pytest

from fastpyvectordb_tpu.core.outofcore import OutOfCoreSearcher
from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.persist.format import (
    StreamingVectorReader,
    StreamingVectorWriter,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(21)
    return rng.standard_normal((1000, 16)).astype(np.float32), \
        rng.standard_normal((4, 16)).astype(np.float32)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_matches_in_memory_exact(corpus, metric):
    v, q = corpus
    s = OutOfCoreSearcher(v, metric=metric, tile_rows=256)  # ragged last tile
    vals, rows = s.search(q, k=7)
    if metric == DistanceMetric.COSINE:
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        d = 1 - qn @ vn.T
    elif metric == DistanceMetric.L2:
        d = np.linalg.norm(q[:, None] - v[None], axis=-1)
    else:
        d = -(q @ v.T)
    want_rows = np.argsort(d, axis=1, kind="stable")[:, :7]
    for got, want, dd in zip(rows, want_rows, d):
        assert set(got.tolist()) == set(want.tolist()) or np.allclose(
            sorted(dd[got]), sorted(dd[want]), atol=1e-4)


def test_mask(corpus):
    v, q = corpus
    mask = np.zeros(len(v), dtype=bool)
    mask[300:400] = True
    s = OutOfCoreSearcher(v, metric="l2", tile_rows=128)
    _, rows = s.search(q, k=20, mask=mask)
    assert ((rows >= 300) & (rows < 400)).all()


def test_streaming_file_backend(corpus, tmp_path):
    v, q = corpus
    path = tmp_path / "big.fpvs"
    with StreamingVectorWriter(path, dims=16) as w:
        w.append_batch(v)
    with StreamingVectorReader(path) as r:
        s = OutOfCoreSearcher(r._mm, metric="cosine", tile_rows=512)
        vals, rows = s.search(q[:1], k=1)
    qn = q[0] / np.linalg.norm(q[0])
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    assert rows[0, 0] == int(np.argmax(vn @ qn))


def test_k_larger_than_corpus():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((10, 8)).astype(np.float32)
    s = OutOfCoreSearcher(v, metric="l2", tile_rows=8)
    vals, rows = s.search(v[:2], k=50)
    assert vals.shape == (2, 10)
    assert rows[0, 0] == 0 and rows[1, 0] == 1


def test_memmap_backed_corpus_matches(tmp_path, corpus):
    """A disk-backed np.memmap corpus (the >RAM deployment shape, used by
    benchmarks/outofcore_20m.py --memmap) must stream identically to the
    in-RAM array."""
    v, q = corpus
    path = tmp_path / "corpus.f32"
    mm = np.memmap(path, np.float32, "w+", shape=v.shape)
    mm[:] = v
    mm.flush()
    ro = np.memmap(path, np.float32, "r", shape=v.shape)
    s_ram = OutOfCoreSearcher(v, metric="l2", tile_rows=256)
    s_mm = OutOfCoreSearcher(ro, metric="l2", tile_rows=256)
    vr, rr = s_ram.search(q, k=5)
    vm, rm = s_mm.search(q, k=5)
    np.testing.assert_allclose(vm, vr, atol=1e-5)
    np.testing.assert_array_equal(rm, rr)
