#!/usr/bin/env python3
"""Generate fixtures/substr_docs.parquet — a small corpus (doc_id, text)
for the substring-level exact dedup operator
(TrainingData.removeDuplicatedSubstrings, the ExactSubstr analog of
Lee et al. 2022).

Planted shapes, at the gate's minLen = 20 tokens:

- docs 1 & 2 share one 30-token passage embedded at DIFFERENT positions
  inside otherwise-unique text: exactly the 30 passage tokens must drop
  from both (windows straddling the passage boundary contain unique
  filler and stay unduplicated — coverage must not bleed outward);
- doc 3 repeats a 25-token span TWICE within the one document separated
  by unique filler (occurrence counting, not doc counting: both copies
  drop);
- docs 4 & 5 share only a 10-token span — BELOW minLen, so no 20-token
  window is duplicated and both docs pass through untouched;
- doc 6 is unique filler only (untouched);
- docs 7 & 8 are byte-identical 24-token documents: every window is
  duplicated, both become empty husks (n_kept 0);
- doc 9 is empty text (the pinned tokenizer maps "" to [""]: one token,
  shorter than any window — passes through).

Unique filler words are `u<doc>w<i>` so no two documents (and no two
positions) collide outside the planted passages. Deterministic,
hand-written. Re-running reproduces identical bytes.
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "substr_docs.parquet"


def filler(doc, start, n):
    return [f"u{doc}w{i}" for i in range(start, start + n)]


PASSAGE30 = [f"shared{i}" for i in range(30)]   # docs 1 & 2
SPAN25 = [f"rep{i}" for i in range(25)]          # doc 3, twice
SPAN10 = [f"tiny{i}" for i in range(10)]         # docs 4 & 5 (below minLen)
DUP24 = [f"whole{i}" for i in range(24)]         # docs 7 & 8, full dup

docs = [
    (1, " ".join(filler(1, 0, 12) + PASSAGE30 + filler(1, 12, 15))),
    (2, " ".join(filler(2, 0, 4) + PASSAGE30 + filler(2, 4, 28))),
    (3, " ".join(filler(3, 0, 6) + SPAN25 + filler(3, 6, 9) + SPAN25
                 + filler(3, 15, 5))),
    (4, " ".join(filler(4, 0, 18) + SPAN10 + filler(4, 18, 7))),
    (5, " ".join(SPAN10 + filler(5, 0, 22))),
    (6, " ".join(filler(6, 0, 26))),
    (7, " ".join(DUP24)),
    (8, " ".join(DUP24)),
    (9, ""),
]

table = pa.table({
    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
    "text": pa.array([d[1] for d in docs], pa.string()),
})
pq.write_table(table, OUT)
print(f"wrote {OUT}: {table.num_rows} rows")
