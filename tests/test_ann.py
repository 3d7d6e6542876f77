"""IVF ANN index tests: recall vs exact ground truth, filters, staleness."""

import numpy as np
import pytest

from fastpyvectordb_tpu import Collection, CollectionConfig, Filter


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    n, d = 4000, 24
    centers = rng.standard_normal((32, d)).astype(np.float32) * 2
    v = centers[rng.integers(0, 32, n)] + 0.3 * rng.standard_normal(
        (n, d)).astype(np.float32)
    col = Collection(CollectionConfig(name="ann", dimensions=d, metric="l2"))
    col.insert_batch(v, [f"v{i}" for i in range(n)],
                     [{"g": i % 4} for i in range(n)])
    col.build_ann(nlist=64, nprobe=8, iters=6)
    q = centers[rng.integers(0, 32, 16)] + 0.3 * rng.standard_normal(
        (16, d)).astype(np.float32)
    return col, v, q


def ids_of(res):
    return [[h.id for h in hits] for hits in res]


def test_recall_vs_exact(built):
    col, v, q = built
    exact = ids_of(col.search_batch(q, k=10, exact=True))
    approx = ids_of(col.search_batch(q, k=10, exact=False))
    recall = np.mean([len(set(a) & set(e)) / 10 for a, e in zip(approx, exact)])
    assert recall >= 0.9, f"IVF recall@10 {recall:.3f} < 0.9"


def test_higher_nprobe_raises_recall(built):
    col, v, q = built
    exact = ids_of(col.search_batch(q, k=10, exact=True))
    lo_d, lo_r = col._ann.search(q, 10, nprobe=1)
    hi_d, hi_r = col._ann.search(q, 10, nprobe=32)
    def rec(rows):
        out = []
        for b, e in zip(rows, exact):
            ids = {col._row_to_id[int(r)] for r in b if r >= 0}
            out.append(len(ids & set(e)) / 10)
        return np.mean(out)
    assert rec(hi_r) >= rec(lo_r)
    assert rec(hi_r) >= 0.95


def test_filtered_ann(built):
    col, v, q = built
    res = col.search_batch(q[:4], k=8, filter=Filter.eq("g", 2), exact=False)
    assert all(h.metadata["g"] == 2 for hits in res for h in hits)


def test_tune_nprobe(built):
    col, v, q = built
    np_tuned = col._ann.tune_nprobe(q, target_recall=0.95, k=10)
    assert 1 <= np_tuned <= 64
    exact = ids_of(col.search_batch(q, k=10, exact=True))
    approx = ids_of(col.search_batch(q, k=10, exact=False))
    recall = np.mean([len(set(a) & set(e)) / 10 for a, e in zip(approx, exact)])
    assert recall >= 0.9


def test_stale_rebuild_after_insert(built, rng):
    col, v, q = built
    col.insert(rng.standard_normal(24).astype(np.float32) * 0.01, id="new1")
    assert col._ann.stale
    # search after mutation must still work (auto-rebuild) and see new row
    d, r = col._ann.search(np.zeros((1, 24), dtype=np.float32), k=1)
    assert not col._ann.stale
    hits = col.search(col.get("new1", include_vector=True)["vector"], k=1,
                      exact=False)
    assert hits[0].id == "new1"
