"""Vector vs BM25 vs fused comparison (reference parity:
examples/hybrid_demo.py).  Shows where each system wins and how alpha
blends them.
"""

import numpy as np

from fastpyvectordb_tpu import CollectionConfig
from fastpyvectordb_tpu.embeddings import HashingEmbedder
from fastpyvectordb_tpu.hybrid import HybridCollection

DOCS = {
    "ml-1": "Gradient descent minimizes a loss function over parameters",
    "ml-2": "Backpropagation computes gradients layer by layer",
    "db-1": "B-tree indexes keep database lookups logarithmic",
    "db-2": "Write-ahead logging makes transactions durable",
    "mix":  "Gradient boosting for database query optimization",
}

emb = HashingEmbedder(256)
col = HybridCollection(CollectionConfig(name="h", dimensions=256),
                       text_fields=["text"])
col.insert_batch(np.stack([emb.embed(t) for t in DOCS.values()]),
                 list(DOCS), [{"text": t} for t in DOCS.values()])

QUERY = "gradient methods for databases"
qvec = emb.embed(QUERY)

print(f"query: {QUERY!r}\n")
print("-- vector only (alpha=1.0) --")
for r in col.hybrid_search(qvec, QUERY, k=3, alpha=1.0):
    print(f"  {r.id:5s} score={r.score:.3f}")
print("-- keyword only (alpha=0.0) --")
for r in col.hybrid_search(qvec, QUERY, k=3, alpha=0.0):
    print(f"  {r.id:5s} score={r.score:.3f}")
print("-- fused (alpha=0.5) --")
for r in col.hybrid_search(qvec, QUERY, k=3, alpha=0.5):
    print(f"  {r.id:5s} score={r.score:.3f} "
          f"(v={r.vector_score:.2f} kw={r.keyword_score:.2f})")

best = col.hybrid_search(qvec, QUERY, k=1, alpha=0.5)[0]
assert best.id == "mix", best.id
print(f"\nfusion surfaces the doc both systems half-like: {best.id}")
