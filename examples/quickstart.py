"""Quickstart: the canonical API walkthrough.

Mirrors the reference's examples/quickstart.py:27-307 flow (basic usage,
filtering, CRUD, batch ops, multi-collection, peek) on the TPU-native
engine.  Runs offline with the hashing embedder; pass --provider to use
sentence-transformers / OpenAI.
"""

import argparse

import numpy as np

from fastpyvectordb_tpu.api import Client


def main(provider: str = "hashing", path: str = "./quickstart_data"):
    print("=== 1. Client + collection ===")
    client = Client(path=path, embedding_provider=provider)
    col = client.get_or_create_collection("articles")
    print(f"collection 'articles' ({col._collection.config.dimensions}-d)")

    print("\n=== 2. Add documents ===")
    if col.count:  # re-runnable: clear previous contents
        col.delete(ids=col._collection.all_ids())
    ids = col.add(
        documents=[
            "JAX traces Python functions and compiles them with XLA",
            "The TPU matrix unit multiplies 128x128 tiles per cycle",
            "Good pasta water should taste like the sea",
            "Index funds passively track a market benchmark",
            "Attention layers mix information across sequence positions",
        ],
        ids=["jax", "tpu", "pasta", "funds", "attention"],
        metadatas=[
            {"topic": "ml", "year": 2024},
            {"topic": "hw", "year": 2023},
            {"topic": "food", "year": 2020},
            {"topic": "finance", "year": 2022},
            {"topic": "ml", "year": 2024},
        ])
    print(f"added {len(ids)} docs; count={col.count}")

    print("\n=== 3. Semantic query ===")
    res = col.query("how does the TPU hardware multiply matrices?",
                    n_results=2)
    for rid, doc, dist in zip(res.ids[0], res.documents[0],
                              res.distances[0]):
        print(f"  {rid:10s} d={dist:.3f}  {doc[:60]}")

    print("\n=== 4. Filtered query ===")
    res = col.query("machine learning", n_results=5,
                    where={"topic": "ml", "year": {"$gte": 2024}})
    print("  ml/2024+:", res.ids[0])

    print("\n=== 5. Get / update / upsert / delete ===")
    print("  get:", col.get(ids="pasta").documents)
    col.update("pasta", metadatas=[{"stars": 5}])
    print("  updated meta:", col.get(ids="pasta").metadatas)
    col.upsert(documents=["Risotto requires patience and stirring"],
               ids=["pasta"])
    print("  upserted:", col.get(ids="pasta").documents)
    col.delete(ids="funds")
    print("  count after delete:", col.count)

    print("\n=== 6. Batch + peek ===")
    col.add(documents=[f"filler document number {i}" for i in range(20)])
    print("  peek:", col.peek(limit=3).ids)

    print("\n=== 7. Multi-collection ===")
    client.get_or_create_collection("scratch").add(documents=["tmp"])
    print("  collections:", client.list_collections())
    client.delete_collection("scratch")

    client.persist()
    print("\npersisted to", path)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--provider", default="hashing")
    p.add_argument("--path", default="./quickstart_data")
    a = p.parse_args()
    main(a.provider, a.path)
