#!/usr/bin/env python3
"""Generate fixtures/ccnet_docs.parquet — a multilingual, paragraph-
structured corpus (doc_id, text) for the CCNet pipeline rungs
(Wenzek et al. 2020): paragraph-level dedup (§4.2) and PER-LANGUAGE
perplexity bucketing (§4.3).

Why a dedicated fixture: the sf documents are single-line and predict
one language under the stopword argmax, so over them a per-language
tercile cut degenerates to the global one and the paragraph splitter
never fires — the gate would verify nothing.

Shape (seeded, deterministic — re-running reproduces identical bytes):

- 90 docs, 30 per language (en / de / fr), language signalled by
  stopwords EXCLUSIVE to that language's TextAnalysis.LangProfiles
  entry (en: the/a/of/to/and/is; de: der/die/das/und/ist;
  fr: le/les/et/est — shared words like 'de'/'la'/'un' are avoided so
  the argmax, ties-break-earlier rule predicts each group exactly);
- per-language score strata the bigram LM separates: en docs repeat a
  corpus-common phrase (high score), de docs mix common and doc-unique
  tokens (middle), fr docs are mostly doc-unique rare tokens (low) —
  so GLOBAL terciles shunt ~all fr into 'tail' while PER-LANGUAGE
  terciles split each language ~10/10/10: the two cuts genuinely
  disagree, which is exactly what pipeline_ccnet_buckets_lang gates;
- WITHIN each language, doc-unique token mass varies by doc index, so
  per-language terciles are non-degenerate;
- paragraphs joined by '\n\n' (a few docs use '\n\n\n' — the \n{2,}
  splitter contract): per-language boilerplate paragraphs planted in
  20 of 30 docs per language (corpus-duplicated -> paragraph dedup
  drops them), one GLOBAL boilerplate in 2 docs of different
  languages, and one doc whose EVERY paragraph is boilerplate (empty
  husk); content paragraphs are doc-unique;
- doc 89 has a single paragraph only (no separator at all).
"""
import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = (pathlib.Path(__file__).resolve().parent.parent / "fixtures"
       / "ccnet_docs.parquet")

rng = random.Random(17)

STOP = {
    "en": ["the", "a", "of", "to", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "et", "est"],
}
COMMON_PHRASE = {
    "en": ["data", "table", "row", "scan", "query", "join"],
    "de": ["daten", "tabelle", "zeile", "abfrage"],
    "fr": ["tableau", "ligne", "requete"],
}
BOILER = {
    "en": "the footer of the site and the legal links",
    "de": "das impressum und die rechtlichen hinweise der seite",
    "fr": "le pied de page et les mentions legales du site",
}
GLOBAL_BOILER = "copyright 2026 example corp all rights reserved"
# doc-unique rare-token share per language: fr is OOV-heavy (low LM
# score), en is corpus-typical (high), de in between
UNIQUE_SHARE = {"en": 0.1, "de": 0.45, "fr": 0.85}


def content_paragraph(lang, doc, p, n_tokens, unique_share):
    toks = []
    for i in range(n_tokens):
        r = rng.random()
        if r < unique_share:
            toks.append(f"x{lang}{doc}p{p}w{i}")
        elif r < unique_share + 0.25:
            toks.append(rng.choice(STOP[lang]))
        else:
            phrase = COMMON_PHRASE[lang]
            # emit a common BIGRAM (two adjacent phrase words), so the
            # bigram model — not just unigrams — separates the strata
            j = rng.randrange(len(phrase) - 1)
            toks.extend(phrase[j:j + 2])
    return " ".join(toks)


rows = []
doc_id = 0
for lang in ("en", "de", "fr"):
    for k in range(30):
        # unique-token share drifts across the 30 docs of a language so
        # per-language terciles have real variance to cut
        share = min(0.95, UNIQUE_SHARE[lang] + (k - 15) * 0.012)
        n_paras = rng.choice([2, 3, 3, 4])
        paras = [content_paragraph(lang, doc_id, p, rng.randint(14, 26),
                                   share)
                 for p in range(n_paras)]
        if k < 20:                       # per-language boilerplate
            paras.insert(rng.randrange(len(paras) + 1), BOILER[lang])
        if (lang, k) in (("en", 0), ("fr", 1)):   # global boilerplate
            paras.append(GLOBAL_BOILER)
        sep = "\n\n\n" if k % 11 == 3 else "\n\n"
        rows.append((doc_id, sep.join(paras)))
        doc_id += 1
# doc 90: every paragraph is corpus-duplicated boilerplate -> empty husk
rows.append((doc_id, BOILER["en"] + "\n\n" + GLOBAL_BOILER))
doc_id += 1
# doc 91: single paragraph, no separator
rows.append((doc_id, "the lone single paragraph of this a document and"))

table = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "text": pa.array([r[1] for r in rows], pa.string()),
})
OUT.parent.mkdir(parents=True, exist_ok=True)
pq.write_table(table, OUT)
print(f"wrote {OUT}: {len(rows)} docs")
