#!/usr/bin/env python3
"""Validate an exportReferenceStore output with the REFERENCE'S OWN code.

Usage: check_export.py <exported_dir> [<original_dir>]

Loads the exported directory through vector_db.disk_store.DiskVectorStore
(the reference's storage layer, imported from /root/reference with the
same fastapi-free package shim as make_refstore.py), runs a search per
library, and — when an original store is given — asserts the results
match it. This is the "a reference deployment can take the store back"
proof for bidirectional migration.
"""
import pathlib
import sys
import types

pkg = types.ModuleType("vector_db")
pkg.__path__ = ["/root/reference/vector_db"]
sys.modules["vector_db"] = pkg

from vector_db.disk_store import DiskVectorStore  # noqa: E402


def top(store, lib, q, k=5):
    return [(cid, round(d, 6)) for cid, d in store.search(lib.id, q, k=k)]


def main():
    exported = DiskVectorStore(pathlib.Path(sys.argv[1]))
    original = (DiskVectorStore(pathlib.Path(sys.argv[2]))
                if len(sys.argv) > 2 else None)
    n_checked = 0
    for lib in exported.list_libraries():
        chunks = exported.list_chunks(library_id=lib.id)
        print(f"{lib.name}: kind={lib.index_kind} metric={lib.distance_metric} "
              f"docs={lib.document_count} chunks={lib.chunk_count}")
        if not chunks:
            continue
        q = chunks[0].embedding
        got = top(exported, lib, q)
        print(f"  top-5: {[(str(c)[:8], d) for c, d in got]}")
        if original is not None:
            want = top(original, lib, q)
            assert got == want, f"{lib.name}: exported {got} != original {want}"
            n_checked += 1
    if original is not None:
        print(f"OK: {n_checked} libraries search-identical to the original")


if __name__ == "__main__":
    main()
