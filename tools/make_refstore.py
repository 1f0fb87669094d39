#!/usr/bin/env python3
"""Generate fixtures/refstore — a reference-format store written by the
REFERENCE'S OWN CODE (vector_db.disk_store.DiskVectorStore), so the Spark
engine's import path is gated on bytes the reference actually produced,
not on our own idea of the format.

Deterministic: fixed entity UUIDs (uuid5), fixed timestamps, embeddings
taken from /root/testdata/sf0.001/embeddings.parquet, LSH matrix seeded
(random_state=7). Re-running reproduces the identical store.

The reference package __init__ imports fastapi (absent here); we install
a stub package object pointing at the reference dir so the storage-layer
modules (entities/indexes/disk_store — pydantic + numpy only) load
without it.
"""
import json
import pathlib
import shutil
import sys
import types
from datetime import datetime, timezone
from uuid import uuid5, NAMESPACE_URL

pkg = types.ModuleType("vector_db")
pkg.__path__ = ["/root/reference/vector_db"]
sys.modules["vector_db"] = pkg

from vector_db.disk_store import DiskVectorStore          # noqa: E402
from vector_db.entities import Chunk, Document, Library   # noqa: E402

import pyarrow.parquet as pq                              # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "refstore"
DIM = 64


def uid(name: str):
    return uuid5(NAMESPACE_URL, f"graft-refstore/{name}")


def ts(i: int):
    return datetime(2024, 1, 1, 0, 0, i % 60, i * 1000 % 1000000,
                    tzinfo=timezone.utc)


def main():
    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    vecs = {int(v): [float(x) for x in e]
            for v, e in zip(emb.column("vec_id").to_pylist(),
                            emb.column("embedding").to_pylist())}

    if OUT.exists():
        shutil.rmtree(OUT)
    store = DiskVectorStore(OUT)

    lib_flat = store.add_library(Library(
        id=uid("lib/flat"), created_at=ts(0), updated_at=ts(0),
        name="corpus-flat", description="flat cosine fixture",
        metadata={"team": "a", "version": 1},
        embedding_dimension=DIM, distance_metric="cosine",
        index_kind="flat"))
    lib_lsh = store.add_library(Library(
        id=uid("lib/lsh"), created_at=ts(1), updated_at=ts(1),
        name="corpus-lsh", description=None, metadata={},
        embedding_dimension=DIM, distance_metric="euclidean",
        index_kind="random_projection"))
    # random_state must be set BEFORE vectors are added; the stock
    # constructor path uses random_state=None, so rebuild the index
    # deterministically (the store created it on add_library).
    from vector_db.indexes import RandomProjectionIndex
    store._vector_index[lib_lsh.id] = RandomProjectionIndex(
        dimension=DIM, num_projections=8, random_state=7)
    lib_empty = store.add_library(Library(
        id=uid("lib/empty"), created_at=ts(2), updated_at=ts(2),
        name="empty-lib", description="no documents", metadata={},
        embedding_dimension=DIM, distance_metric="dot_product",
        index_kind="flat"))

    docs = {}
    for key, lib, meta in [
            ("doc/f1", lib_flat, {"source": "web", "crawl": 3}),
            ("doc/f2", lib_flat, {}),
            ("doc/f3-empty", lib_flat, {"note": "zero chunks"}),
            ("doc/l1", lib_lsh, {"source": "books"})]:
        docs[key] = store.add_document(Document(
            id=uid(key), created_at=ts(3), updated_at=ts(3),
            library_id=lib.id, name=key.split("/")[1], metadata=meta))

    def chunk_meta(i: int):
        if i % 7 == 0:
            return {}
        m = {"lang": "en" if i % 3 else "de", "page": i,
             "score": i / 4.0, "good": i % 2 == 0}
        if i % 5 == 0:
            m["page_str"] = str(i)  # the typed trap: "10" must not match 10
        return m

    n = 0
    for key, doc, count in [("f1", docs["doc/f1"], 20),
                            ("f2", docs["doc/f2"], 10),
                            ("l1", docs["doc/l1"], 28)]:
        for j in range(count):
            store.add_chunk(Chunk(
                id=uid(f"chunk/{key}/{j}"), created_at=ts(10 + n),
                updated_at=ts(10 + n), document_id=doc.id,
                text=f"chunk {key} {j} :: lorem ipsum dolor",
                embedding=vecs[n], metadata=chunk_meta(n), chunk_index=j))
            n += 1

    # The store's count-increment hooks stamp parent updated_at with NOW,
    # which would churn the committed bytes on every regeneration. Pin
    # every updated_at to its entity's created_at (cosmetic: same format,
    # same writer), then prove the reference still loads the result.
    for sub in ("libraries", "documents", "chunks"):
        for f in sorted((OUT / sub).glob("*.json")):
            data = json.loads(f.read_text())
            data["updated_at"] = data["created_at"]
            f.write_text(json.dumps(data, indent=2))
    reloaded = DiskVectorStore(OUT)
    assert len(reloaded.list_libraries()) == 3
    got = reloaded.search(lib_flat.id, vecs[0], k=5)
    assert len(got) == 5, got

    # pretty-print a manifest the specs can use for stable lookups
    manifest = {
        "libraries": {"flat": str(lib_flat.id), "lsh": str(lib_lsh.id),
                      "empty": str(lib_empty.id)},
        "documents": {k: str(d.id) for k, d in docs.items()},
        "dim": DIM, "n_chunks": n,
        "query_vec_id": 0,
    }
    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"wrote {OUT}: {n} chunks,",
          sum(1 for _ in (OUT / 'chunks').glob('*.json')), "chunk files")


if __name__ == "__main__":
    main()
