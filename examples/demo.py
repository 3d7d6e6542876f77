"""Full-framework tour: core engine, quantized scan, ANN, hybrid BM25,
property graph, graph+vector, realtime events.

Mirrors the reference's examples/demo.py scope on the TPU-native stack.
"""

import numpy as np

import fastpyvectordb_tpu as fvdb
from fastpyvectordb_tpu.core.types import CollectionConfig
from fastpyvectordb_tpu.embeddings import HashingEmbedder
from fastpyvectordb_tpu.graphdb import GraphDB
from fastpyvectordb_tpu.graphdb.hybrid import HybridGraphVectorDB
from fastpyvectordb_tpu.hybrid import HybridCollection
from fastpyvectordb_tpu.realtime import EventBus, ObservableCollection

rng = np.random.default_rng(0)
emb = HashingEmbedder(128)

print("=== core engine ===")
col = fvdb.Collection(CollectionConfig(name="demo", dimensions=128))
docs = {
    "jax": "JAX compiles numerical python to XLA",
    "tpu": "TPUs accelerate matrix multiplication",
    "cnn": "convolutional networks for image recognition",
    "soup": "a warming soup for cold evenings",
    "stock": "stock markets react to interest rates",
}
col.insert_batch(np.stack([emb.embed(t) for t in docs.values()]),
                 list(docs), [{"text": t, "len": len(t)}
                              for t in docs.values()])
hits = col.search(emb.embed("hardware for fast matrix math"), k=2)
print("search:", [(h.id, round(h.score, 3)) for h in hits])
hits = col.search(emb.embed("networks"), k=5,
                  filter=fvdb.Filter.gt("len", 35))
print("filtered:", [h.id for h in hits])

print("\n=== quantized two-stage scan ===")
res = col.search_quantized(emb.embed("compiling python"), k=2, rerank=4)
print("int8+rerank:", [h.id for h in res[0]])

print("\n=== graph ANN (beam search) ===")
big = rng.standard_normal((2000, 128)).astype(np.float32)
col2 = fvdb.Collection(CollectionConfig(name="big", dimensions=128,
                                        metric="l2"))
col2.insert_batch(big, [f"v{i}" for i in range(2000)])
col2.build_ann(kind="graph", r=16, chunk=1024)
print("graph ANN top-1 self:",
      col2.search(big[42], k=1, exact=False)[0].id)

print("\n=== hybrid BM25 + vector ===")
hyb = HybridCollection(CollectionConfig(name="h", dimensions=128),
                       text_fields=["text"])
hyb.insert_batch(np.stack([emb.embed(t) for t in docs.values()]),
                 list(docs), [{"text": t} for t in docs.values()])
res = hyb.hybrid_search(emb.embed("markets and rates"),
                        "stock interest rates", k=2, alpha=0.5)
print("fused:", [(r.id, round(r.score, 3)) for r in res])
print("bm25 backend:", hyb._bm25.stats().get("backend", "python"))

print("\n=== property graph + cypher ===")
g = GraphDB()
g.create_node(["Person"], {"name": "Ada", "age": 36}, id="ada")
g.create_node(["Person"], {"name": "Bob", "age": 29}, id="bob")
g.create_node(["Lab"], {"name": "TPU Lab"}, id="lab")
g.create_edge("ada", "bob", "MENTORS")
g.create_edge("ada", "lab", "WORKS_AT")
print("cypher:", g.query(
    "MATCH (p:Person) WHERE p.age > 30 RETURN p.name"))
print("path ada->bob:", g.shortest_path("ada", "bob"))

print("\n=== graph + vector ===")
hg = HybridGraphVectorDB(dimensions=128)
for nid, text in docs.items():
    hg.add_node_with_embedding(["Doc"], {"text": text}, emb.embed(text),
                               id=nid)
hg.graph.create_edge("jax", "tpu", "RUNS_ON")
hg.graph.create_edge("cnn", "tpu", "TRAINED_ON")
res = hg.semantic_graph_search(emb.embed("XLA compiler"), k=3,
                               expand_hops=1)
print("semantic graph:", [(r.node.id, round(r.score, 3), r.hops)
                          for r in res])

print("\n=== realtime events ===")
bus = EventBus()
seen = []
bus.subscribe(lambda e: seen.append(f"{e.type.value}:{e.data.get('id')}"))
bus.start()
obs = ObservableCollection(col, bus.publish)
obs.insert(emb.embed("new doc"), "fresh")
obs.delete("fresh")
import time
time.sleep(0.2)
bus.stop()
print("events:", seen)
