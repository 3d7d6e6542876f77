"""RAG application over a synthetic document corpus — the full pipeline.

Reference parity: /root/reference/examples/rag_demo.py (853 LoC) — the
same application arc: generate a synthetic corpus with authors /
categories / tags, index it into a vector collection plus a quantized
store plus a knowledge graph, expose a multi-method ``search()``
(exact | quantized | ann | hybrid-with-graph-expansion), run an in-app
latency benchmark, and finish with copy-paste API examples.  Rebuilt on
this framework's TPU-native engine: the "parallel search" method of the
reference maps to the fused batch kernel, and quantized search is the
two-stage int8 scan rather than a host-side numpy loop.

    python examples/rag_app.py              # full demo
    python examples/rag_app.py --docs 300   # smaller corpus
"""

import argparse
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from fastpyvectordb_tpu import CollectionConfig, Filter
from fastpyvectordb_tpu.core.collection import Collection
from fastpyvectordb_tpu.embeddings import HashingEmbedder
from fastpyvectordb_tpu.graphdb import GraphDB
from fastpyvectordb_tpu.profiling import QueryTimer

BAR = "=" * 68


# ---------------------------------------------------------------------------
# Synthetic corpus
# ---------------------------------------------------------------------------
@dataclass
class Document:
    id: str
    title: str
    content: str
    author: str
    category: str
    tags: List[str] = field(default_factory=list)


TOPICS = {
    "programming": (
        ["python", "testing", "debugging", "refactoring", "typing"],
        "The {tag} workflow rewards small steps: write a failing case, "
        "make it pass, then clean up. Teams that practice {tag} daily "
        "ship fewer regressions and read each other's code faster."),
    "ml": (
        ["embeddings", "transformers", "finetuning", "evaluation", "rag"],
        "Modern {tag} systems hinge on data quality. A careful eval set "
        "tells you more than another architecture tweak; {tag} pipelines "
        "should log every prediction they ship."),
    "infrastructure": (
        ["kubernetes", "observability", "caching", "queues", "serverless"],
        "Operating {tag} at scale is mostly about limits: quotas, "
        "backpressure, and budgets. Good {tag} dashboards show "
        "saturation before users feel it."),
    "databases": (
        ["indexes", "sharding", "replication", "transactions", "vectors"],
        "A database earns trust through {tag} done boringly well. "
        "Recovery drills and checksum scrubs make {tag} failures a "
        "non-event instead of an outage."),
    "hardware": (
        ["accelerators", "memory", "interconnects", "compilers", "power"],
        "Performance work on {tag} starts from the roofline: know your "
        "peak FLOPs and bandwidth, then measure where {tag} actually "
        "spends its cycles."),
}
AUTHORS = ["ada", "grace", "edsger", "barbara", "donald",
           "radia", "ken", "frances"]


def generate_synthetic_corpus(n_docs: int = 1000,
                              seed: int = 0) -> List[Document]:
    """Deterministic fake corpus with correlated metadata, so filters,
    graph edges, and retrieval quality all have real structure to find."""
    rng = random.Random(seed)
    docs = []
    cats = list(TOPICS)
    for i in range(n_docs):
        cat = cats[i % len(cats)]
        tags_pool, template = TOPICS[cat]
        tags = rng.sample(tags_pool, k=2)
        author = AUTHORS[(i * 7) % len(AUTHORS)]
        title = f"{tags[0].title()} notes #{i}"
        body = " ".join(template.format(tag=t) for t in tags)
        docs.append(Document(
            id=f"doc{i}", title=title,
            content=f"{title}. {body}",
            author=author, category=cat, tags=tags))
    return docs


# ---------------------------------------------------------------------------
# The application
# ---------------------------------------------------------------------------
class RAGApplication:
    """Vector collection + quantized scan + ANN + knowledge graph, behind
    one ``search(method=...)`` facade (reference RAGApplication:
    rag_demo.py:235-611)."""

    def __init__(self, dimensions: int = 256, use_quantization: bool = True,
                 use_graph: bool = True, use_ann: bool = True):
        self.embedder = HashingEmbedder(dimensions)
        self.collection = Collection(CollectionConfig(
            name="rag_app", dimensions=dimensions, metric="cosine"))
        self.documents: Dict[str, Document] = {}
        self.graph = GraphDB() if use_graph else None
        self.use_quantization = use_quantization
        self.use_ann = use_ann

    # -- indexing -----------------------------------------------------------
    def index_documents(self, documents: List[Document],
                        show_progress: bool = True) -> None:
        vecs = self.embedder.embed_batch([d.content for d in documents])
        self.collection.insert_batch(
            np.asarray(vecs),
            [d.id for d in documents],
            [{"title": d.title, "author": d.author, "category": d.category,
              "tags": ",".join(d.tags), "text": d.content}
             for d in documents])
        for d in documents:
            self.documents[d.id] = d
        if show_progress:
            print(f"  indexed {len(documents)} documents "
                  f"({self.collection.count()} total)")
        if self.use_quantization:
            self.collection.enable_quantized_scan("int8")
            print("  int8 quantized scan enabled (4x memory cut)")
        if self.use_ann:
            nlist = max(8, int(len(documents) ** 0.5) // 2)
            self.collection.build_ann(kind="ivf", nlist=nlist,
                                      nprobe=max(2, nlist // 8), iters=4)
            print(f"  IVF ANN index built (nlist={nlist})")
        if self.graph is not None:
            self._build_knowledge_graph(documents)

    def _build_knowledge_graph(self, documents: List[Document]) -> None:
        """Doc -> Author and Doc -> Tag edges (reference:
        rag_demo.py:385-447); expansion walks them in reverse."""
        g = self.graph
        for d in documents:
            g.create_node(["Document"], {"title": d.title}, id=d.id)
        for a in {d.author for d in documents}:
            g.create_node(["Author"], {"name": a}, id=f"author:{a}")
        for t in {t for d in documents for t in d.tags}:
            g.create_node(["Tag"], {"name": t}, id=f"tag:{t}")
        for d in documents:
            g.create_edge(d.id, f"author:{d.author}", "WRITTEN_BY")
            for t in d.tags:
                g.create_edge(d.id, f"tag:{t}", "TAGGED")
        s = g.stats()
        print(f"  knowledge graph: {s['nodes']} nodes, {s['edges']} edges")

    # -- retrieval ----------------------------------------------------------
    def search(self, query: str, k: int = 5, method: str = "exact",
               filter_dict: Optional[dict] = None,
               expand_graph: bool = False) -> List[dict]:
        """methods: exact (fused scan) | quantized (int8 two-stage) |
        ann (IVF) | hybrid (exact + graph expansion)."""
        qv = self.embedder.embed(query)
        f = Filter.from_dict(filter_dict) if filter_dict else None

        if method == "quantized":
            hits = self.collection.search_quantized(
                qv[None, :], k=k, filter=f)[0]
        elif method == "ann":
            hits = self.collection.search(qv, k=k, filter=f, exact=False)
        else:  # exact and the seed stage of hybrid
            hits = self.collection.search(qv, k=k, filter=f)
        results = [{"id": h.id, "score": float(h.score),
                    "document": self.documents[h.id]} for h in hits]

        if method == "hybrid" and expand_graph and self.graph is not None:
            have = {r["id"] for r in results}
            related = []
            for r in results:
                for hub in self.graph.neighbors(r["id"], direction="out"):
                    kind = ("Author" if "Author" in hub.labels else
                            "Tag" if "Tag" in hub.labels else None)
                    if kind is None:
                        continue
                    for doc in self.graph.neighbors(hub.id, direction="in"):
                        if doc.id not in have and doc.id in self.documents:
                            have.add(doc.id)
                            related.append({
                                "id": doc.id, "score": r["score"] + 0.5,
                                "document": self.documents[doc.id],
                                "via": f"{kind.lower()}:{hub.id}"})
            results.extend(related[:k])
        return results

    def answer(self, question: str, k: int = 3) -> str:
        """Prompt assembly + extractive 'generation' (offline stand-in
        for the LLM call; the context block is the real deliverable)."""
        hits = self.search(question, k=k)
        context = "\n".join(f"[{r['id']}] {r['document'].content[:160]}"
                            for r in hits)
        best = hits[0]["document"] if hits else None
        answer = best.content.split(". ", 1)[-1][:200] if best else "(none)"
        return (f"Context:\n{context}\n\n"
                f"Answer (extractive, from {best.id if best else '-'}): "
                f"{answer}")

    # -- measurement --------------------------------------------------------
    def benchmark(self, n_queries: int = 50) -> Dict[str, dict]:
        """Per-method latency on distinct queries (reference:
        rag_demo.py:574-610)."""
        rng = random.Random(1)
        tags = [t for pool, _ in TOPICS.values() for t in pool]
        queries = [f"{rng.choice(tags)} in production systems #{i}"
                   for i in range(n_queries)]
        out = {}
        methods = ["exact"] + (["quantized"] if self.use_quantization else
                               []) + (["ann"] if self.use_ann else [])
        for method in methods:
            timer = QueryTimer()
            self.search(queries[0], method=method)  # warm the compile
            for q in queries:
                with timer.measure():
                    self.search(q, k=5, method=method)
            s = timer.summary()
            out[method] = {kk: round(s[kk], 2)
                           for kk in ("mean_ms", "p50_ms", "p99_ms", "qps")
                           if kk in s}
        return out


# ---------------------------------------------------------------------------
# Demo runner
# ---------------------------------------------------------------------------
def run_demo(n_docs: int = 1000) -> RAGApplication:
    print(BAR + f"\n RAG APPLICATION DEMO — {n_docs} synthetic docs\n" + BAR)
    docs = generate_synthetic_corpus(n_docs)
    app = RAGApplication()
    print("\nIndexing:")
    app.index_documents(docs)

    print(f"\n{BAR}\n Multi-method retrieval\n{BAR}")
    query = "sharding and replication for reliable databases"
    for method in ("exact", "quantized", "ann"):
        res = app.search(query, k=3, method=method)
        print(f"\n  [{method}] {query!r}")
        for r in res:
            d = r["document"]
            print(f"    {r['id']:8s} [{d.category}] {d.title} "
                  f"(score {r['score']:.3f})")
    # The template corpus is tie-heavy (near-duplicate docs score
    # identically), so methods may legitimately pick different members of
    # a tie; quality parity means matching top-3 *scores*, not ids.
    exact3 = [r["score"] for r in app.search(query, k=3, method="exact")]
    quant3 = [r["score"] for r in app.search(query, k=3, method="quantized")]
    assert all(abs(a - b) < 0.02 for a, b in zip(exact3, quant3)), (
        exact3, quant3)

    print(f"\n{BAR}\n Filtered retrieval\n{BAR}")
    res = app.search("evaluation pipelines", k=3,
                     filter_dict={"category": "ml"})
    for r in res:
        print(f"    {r['id']:8s} by {r['document'].author} "
              f"[{r['document'].category}]")
    assert all(r["document"].category == "ml" for r in res)

    print(f"\n{BAR}\n Graph-expanded retrieval\n{BAR}")
    res = app.search("observability dashboards", k=3, method="hybrid",
                     expand_graph=True)
    seeds = [r for r in res if "via" not in r]
    expanded = [r for r in res if "via" in r]
    for r in seeds:
        print(f"    seed     {r['id']:8s} {r['document'].title}")
    for r in expanded[:4]:
        print(f"    expanded {r['id']:8s} via {r['via']}")
    assert expanded, "graph expansion surfaced nothing"

    print(f"\n{BAR}\n Question answering (prompt assembly)\n{BAR}")
    print(app.answer("how should teams approach testing?"))

    print(f"\n{BAR}\n In-app latency benchmark\n{BAR}")
    for method, stats in app.benchmark(n_queries=30).items():
        print(f"    {method:10s} {stats}")

    show_api_examples()
    print(f"\n{BAR}\n DEMO COMPLETE\n{BAR}")
    return app


def show_api_examples() -> None:
    print(f"\n{BAR}\n Copy-paste API examples\n{BAR}")
    print("""
  app = RAGApplication(dimensions=256)
  app.index_documents(generate_synthetic_corpus(1000))

  app.search("vector indexes", k=5)                      # exact
  app.search("vector indexes", method="quantized")       # int8 2-stage
  app.search("vector indexes", method="ann")             # IVF
  app.search("vector indexes", method="hybrid",
             expand_graph=True)                          # + graph hops
  app.search("vector indexes",
             filter_dict={"category": "databases"})      # filtered
  app.answer("how do I shard a database?")               # RAG prompt
  app.benchmark(n_queries=100)                           # latency table""")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1000)
    args = ap.parse_args(argv)
    run_demo(args.docs)


if __name__ == "__main__":
    main()
