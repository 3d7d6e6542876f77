"""Pallas quantized-scan kernels vs reference jnp implementations
(interpreter mode on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastpyvectordb_tpu.core.types import DistanceMetric
from fastpyvectordb_tpu.quant.binary import BinaryQuantizer, _hamming
from fastpyvectordb_tpu.quant.scalar import ScalarQuantizer, _distances


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    v = rng.standard_normal((300, 40)).astype(np.float32)
    q = rng.standard_normal((5, 40)).astype(np.float32)
    return v, q


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_sq_pallas_matches_jnp(data, metric):
    v, q = data
    sq = ScalarQuantizer().train(v)
    codes = sq.encode(v)
    want = np.asarray(_distances(jnp.asarray(q), codes, sq.vmin, sq.scale,
                                 metric=metric))
    got = np.asarray(sq.distances(q, codes, metric, use_pallas=True))
    assert got.shape == want.shape == (5, 300)
    # the kernel's matmul runs in bf16 (MXU fast path): ~0.5% relative
    tol = 2e-2 * max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=tol)


def test_sq_pallas_ranking_consistency(data):
    # pallas top-1 must score within bf16 noise of the jnp top-1
    v, q = data
    sq = ScalarQuantizer().train(v)
    codes = sq.encode(v)
    a = np.asarray(sq.distances(q, codes, "l2", use_pallas=True))
    b = np.asarray(sq.distances(q, codes, "l2", use_pallas=False))
    top_a = b[np.arange(len(b)), a.argmin(1)]
    top_b = b.min(1)
    np.testing.assert_allclose(top_a, top_b, atol=2e-2 * np.abs(b).max())


def test_hamming_pallas_matches_jnp(data):
    v, q = data
    bq = BinaryQuantizer().train(v)
    codes = bq.encode(v)
    want = np.asarray(_hamming(bq.encode(q), codes))
    got = np.asarray(bq.hamming_distances(q, codes, use_pallas=True))
    np.testing.assert_array_equal(got, want)


def test_hamming_pallas_nonaligned_dims():
    # 70 dims -> 3 words; 13 queries, 100 rows: all tile paddings exercised
    rng = np.random.default_rng(9)
    v = rng.standard_normal((100, 70)).astype(np.float32)
    q = rng.standard_normal((13, 70)).astype(np.float32)
    bq = BinaryQuantizer().train(v)
    codes = bq.encode(v)
    want = np.asarray(_hamming(bq.encode(q), codes))
    got = np.asarray(bq.hamming_distances(q, codes, use_pallas=True))
    np.testing.assert_array_equal(got, want)
    assert got[0].min() >= 0 and got.shape == (13, 100)


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_sq_int8_matmul_matches_reference(data, metric):
    """The int8-MXU scan path (query-side scale folding) must rank like the
    full dequantized computation."""
    v, q = data
    sq = ScalarQuantizer().train(v)
    codes = sq.encode(v)
    want = np.asarray(_distances(jnp.asarray(q), codes, sq.vmin, sq.scale,
                                 metric=metric))
    got = np.asarray(sq.distances(q, codes, metric, mode="int8mm"))
    # query quantization adds <1% relative error
    tol = 2e-2 * max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=tol)
    # rank stability: top-1 score per the reference matrix is near-optimal
    top = want[np.arange(len(want)), got.argmin(1)]
    np.testing.assert_allclose(top, want.min(1), atol=tol)


def test_hamming_mxu_matches_exact(data):
    """The MXU +-1-matmul Hamming kernel is exact (integer dot in f32)."""
    from fastpyvectordb_tpu.kernels.pallas_quant import hamming_mxu_scores
    v, q = data
    bq = BinaryQuantizer().train(v)
    codes_t = jnp.asarray(bq.encode(v)).T  # (W, 300)
    npad = (-300) % 128
    codes_tp = jnp.pad(codes_t, ((0, 0), (0, npad)))
    w = codes_t.shape[0]
    bits = (q > np.asarray(bq.thresholds)[None, :])
    bits = np.pad(bits, ((0, 3), (0, w * 32 - 40)))  # pad B 5->8, D 40->w*32
    qpm = jnp.asarray((2.0 * bits - 1.0), dtype=jnp.bfloat16)
    got = np.asarray(hamming_mxu_scores(qpm, codes_tp, tile_n=128,
                                        interpret=True))[:5, :300]
    want = np.asarray(_hamming(bq.encode(q), bq.encode(v)))
    np.testing.assert_array_equal(got.astype(np.int32), want)
