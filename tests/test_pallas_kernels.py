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


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_int4_pallas_matches_chunked(data, metric):
    """int4_scores (in-VMEM nibble unpack, interpret mode) vs the XLA
    chunked unpack+dequantize reference (quant/int4.py:_distances)."""
    from fastpyvectordb_tpu.quant.int4 import Int4Quantizer, _distances as _i4d
    v, q = data
    qz = Int4Quantizer().train(v)
    codes = qz.encode(v)
    want = np.asarray(_i4d(jnp.asarray(q), codes, qz.vmin, qz.scale,
                           metric=metric))
    got = np.asarray(qz.distances(q, codes, metric, mode="pallas"))
    assert got.shape == want.shape == (5, 300)
    # bf16 MXU cross-term: ~0.5% relative
    tol = 2e-2 * max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=tol)
    # rank stability: pallas top-1 scores near-optimal per the reference
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


@pytest.mark.parametrize("metric", list(DistanceMetric))
def test_grouped_ivf_scores_pallas_matches_xla(metric):
    """grouped_cell_scores (interpret mode) vs the XLA epilogue formula
    used by the ann/ivf_grouped.py fallback path."""
    import jax
    from fastpyvectordb_tpu.kernels.distances import MASKED
    from fastpyvectordb_tpu.kernels.pallas_ivf import grouped_cell_scores
    rng = np.random.default_rng(9)
    nlist, u, qcap, cmax, d = 6, 4, 8, 128, 128
    # compact probed-cell list: a strict subset of the cell table, sorted
    # ascending the way ivf_grouped.py builds it
    cell_ids = np.array([u, 0, 2, 3, 5], np.int32)  # [n_uniq, ids...]
    qblk = rng.standard_normal((u, qcap, d)).astype(np.float32)
    cells = rng.standard_normal((nlist, cmax, d)).astype(np.float32)
    norms = np.einsum("ncd,ncd->nc", cells, cells).astype(np.float32)
    ok = (rng.random((nlist, cmax)) > 0.2).astype(np.float32)
    if metric == DistanceMetric.COSINE:
        qstat = 1.0 / np.maximum(
            np.linalg.norm(qblk, axis=2), 1e-30).astype(np.float32)
    elif metric == DistanceMetric.L2:
        qstat = np.einsum("nqd,nqd->nq", qblk, qblk).astype(np.float32)
    else:
        qstat = np.zeros((u, qcap), np.float32)
    got = np.asarray(grouped_cell_scores(
        jnp.asarray(cell_ids), jnp.asarray(qblk, jnp.bfloat16),
        jnp.asarray(cells, jnp.bfloat16),
        jnp.asarray(norms), jnp.asarray(ok), jnp.asarray(qstat),
        metric=metric, interpret=True))
    csel = cells[cell_ids[1:]]
    nsel = norms[cell_ids[1:]]
    oksel = ok[cell_ids[1:]]
    cross = np.einsum("nqd,ncd->nqc",
                      np.asarray(jnp.asarray(qblk, jnp.bfloat16),
                                 np.float32),
                      np.asarray(jnp.asarray(csel, jnp.bfloat16),
                                 np.float32))
    if metric == DistanceMetric.COSINE:
        rinv = 1.0 / np.sqrt(np.maximum(nsel, 1e-30))
        want = 1.0 - cross * qstat[:, :, None] * rinv[:, None, :]
    elif metric == DistanceMetric.L2:
        want = np.maximum(qstat[:, :, None] + nsel[:, None, :]
                          - 2.0 * cross, 0.0)
    else:
        want = -cross
    want = np.where(oksel[:, None, :] > 0.5, want, MASKED)
    tol = 2e-2 * max(np.abs(want[want < MASKED / 2]).max(), 1.0)
    m = want < MASKED / 2
    np.testing.assert_allclose(got[m], want[m], atol=tol)
    assert np.all(got[~m] >= MASKED / 2)
    # padding-tail skip: dropping n_uniq to u-1 must not disturb the
    # real tiles (the last tile's contents become unspecified)
    cut = cell_ids.copy()
    cut[0] = u - 1
    got2 = np.asarray(grouped_cell_scores(
        jnp.asarray(cut), jnp.asarray(qblk, jnp.bfloat16),
        jnp.asarray(cells, jnp.bfloat16),
        jnp.asarray(norms), jnp.asarray(ok), jnp.asarray(qstat),
        metric=metric, interpret=True))
    np.testing.assert_array_equal(got2[:u - 1], got[:u - 1])


def test_grouped_ivf_scores_i8_pallas_matches_xla():
    """int8 grouped kernel (interpret) vs the query-side scale-folded
    reference epilogue."""
    from fastpyvectordb_tpu.kernels.distances import MASKED
    from fastpyvectordb_tpu.kernels.pallas_ivf import grouped_cell_scores_i8
    rng = np.random.default_rng(11)
    nlist, u, qcap, cmax, d = 4, 3, 8, 128, 128
    cell_ids = np.array([u, 0, 1, 3], np.int32)  # [n_uniq, ids...]
    qblk = rng.integers(-127, 128, (u, qcap, d)).astype(np.int8)
    cells = rng.integers(-127, 128, (nlist, cmax, d)).astype(np.int8)
    norms = rng.random((nlist, cmax)).astype(np.float32) * 50 + 1
    ok = np.ones((nlist, cmax), np.float32)
    sscale = rng.random((u, qcap)).astype(np.float32) * 0.01
    sconst = rng.standard_normal((u, qcap)).astype(np.float32)
    qstat = np.einsum("nqd,nqd->nq", qblk.astype(np.float32),
                      qblk.astype(np.float32)).astype(np.float32)
    got = np.asarray(grouped_cell_scores_i8(
        jnp.asarray(cell_ids), jnp.asarray(qblk), jnp.asarray(cells),
        jnp.asarray(norms),
        jnp.asarray(ok), jnp.asarray(sscale), jnp.asarray(sconst),
        jnp.asarray(qstat), metric=DistanceMetric.L2, interpret=True))
    cross = (np.einsum("nqd,ncd->nqc", qblk.astype(np.int64),
                       cells[cell_ids[1:]].astype(np.int64)
                       ).astype(np.float32)
             * sscale[:, :, None] + sconst[:, :, None])
    want = np.maximum(qstat[:, :, None] + norms[cell_ids[1:]][:, None, :]
                      - 2.0 * cross, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


def test_grouped_pq_scores_pallas_matches_formula():
    """grouped_cell_scores_pq (interpret mode) vs the ADC definition:

        out[u, s, c] = sum_m lutq[u, s, m*K + codes_t[cid_u, m, c]]

    including a padding tail (cell_ids[0] < U rows) that the kernel
    must skip — the regroup stage masks those slots via pair_keep."""
    from fastpyvectordb_tpu.kernels.pallas_ivf import grouped_cell_scores_pq
    rng = np.random.default_rng(13)
    nlist, u, qcap, cmax, m, kk = 6, 4, 8, 128, 32, 16
    mk = m * kk
    n_uniq = 3                                   # one padded tail row
    cell_ids = np.array([n_uniq, 0, 2, 5, 0], np.int32)
    lutq = jnp.asarray(
        rng.standard_normal((u, qcap, mk)).astype(np.float32),
        jnp.bfloat16)
    codes_t = rng.integers(0, kk, (nlist, m, cmax)).astype(np.uint8)
    got = np.asarray(grouped_cell_scores_pq(
        jnp.asarray(cell_ids), lutq, jnp.asarray(codes_t),
        interpret=True))
    assert got.shape == (u, qcap, cmax)
    lut_f = np.asarray(lutq, np.float32)
    for ui in range(n_uniq):
        cid = int(cell_ids[1 + ui])
        idx = (np.arange(m)[:, None] * kk
               + codes_t[cid].astype(np.int64))          # (m, cmax)
        want = lut_f[ui][:, idx].sum(axis=1)             # (qcap, cmax)
        np.testing.assert_allclose(got[ui], want, rtol=2e-2, atol=0.5)
