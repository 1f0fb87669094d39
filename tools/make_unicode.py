#!/usr/bin/env python3
"""Generate fixtures/unicode_docs.parquet — a small multilingual corpus
exercising the pinned Unicode tokenization contract (NFC + per-code-point
simple lowercase + explicit whitespace class) that every text kernel and
every DuckDB oracle replay share.

Planted near-duplicate structure (what dedup_near_unicode gates):
  - Turkish: mixed-case twin pairs crossing the dotted/dotless-I mapping
    (İ -> i under SIMPLE case mapping — the full/locale mapping would
    produce i + combining dot and silently split these groups)
  - CJK: identical word sequences separated by ASCII space vs
    IDEOGRAPHIC SPACE (U+3000) — the explicit whitespace class treats
    both as separators; Java/RE2 \\s would not
  - French: NFC vs NFD encodings of the same accented text — byte-level
    different, token-identical after normalization
  - Greek: uppercase text vs its simple-lowercased twin (medial sigma
    everywhere — simple mapping never emits final sigma)
  - German: uppercase ẞ (U+1E9E) lowering to ß
  - NBSP/thin-space separators vs ASCII space

Deterministic: content is hand-written, no randomness. Re-running
reproduces identical bytes (pyarrow stable encoding).
"""
import pathlib
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

OUT = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "unicode_docs.parquet"

IDEO = "　"   # ideographic space
NBSP = " "
THIN = " "

docs = [
    # --- Turkish group: 1 ~ 2 (case twins), 3 near-variant -------------
    (1, "İstanbul şehri büyük ve güzel bir yer burada yaşamak çok keyifli"),
    (2, "ISTANBUL ŞEHRİ BÜYÜK VE GÜZEL BİR YER BURADA YAŞAMAK ÇOK KEYİFLİ"),
    (3, "İstanbul şehri büyük ve güzel bir yer burada gezmek çok keyifli"),
    (4, "ankara başkenti resmi kurumları ve bakanlıkları barındıran yerdir"),
    # --- CJK group: 5 ~ 6 (space-kind twins), 7 near-variant -----------
    (5, "机器 学习 模型 需要 大量 高 质量 训练 数据 支持"),
    (6, IDEO.join("机器 学习 模型 需要 大量 高 质量 训练 数据 支持".split(" "))),
    (7, "机器 学习 模型 需要 大量 高 质量 标注 样本 支持"),
    (8, "自然 语言 处理 技术 正在 快速 发展 并且 应用 广泛"),
    # --- French group: 9 ~ 10 (NFC/NFD twins), 11 near-variant ---------
    (9, "le café près du musée est très agréable en été dit on"),
    (10, unicodedata.normalize(
        "NFD", "le café près du musée est très agréable en été dit on")),
    (11, "le café près du musée est très agréable en hiver dit on"),
    (12, "la bibliothèque nationale conserve des manuscrits anciens rares"),
    # --- Greek group: 13 ~ 14 (case twins, medial sigma), 15 variant ---
    (13, "Η ΓΛΩΣΣΑ ΕΙΝΑΙ ΠΛΟΥΣΙΑ ΚΑΙ ΑΡΧΑΙΑ ΜΕ ΙΣΤΟΡΙΑ ΜΕΓΑΛΗ"),
    (14, "η γλωσσα ειναι πλουσια και αρχαια με ιστορια μεγαλη"),
    (15, "Η ΓΛΩΣΣΑ ΕΙΝΑΙ ΠΛΟΥΣΙΑ ΚΑΙ ΝΕΑ ΜΕ ΙΣΤΟΡΙΑ ΜΕΓΑΛΗ"),
    (16, "ΛΟΓΟΣ ΚΑΛΟΣ ΦΕΡΝΕΙ ΤΙΜΗ ΣΤΟΝ ΑΝΘΡΩΠΟ ΠΑΝΤΑ"),
    # --- separator group: 17 ~ 18 (NBSP/thin-space twins), 19 variant --
    (17, "data pipeline quality matters at scale every single day here"),
    (18, "data" + NBSP + "pipeline" + THIN + "quality matters at scale"
         + NBSP + "every single day here"),
    (19, "data pipeline quality matters at scale every single night here"),
    # full-width letters lower to full-width (NOT ASCII) — shares only
    # the ASCII tail with 17, below the confirm threshold
    (20, "ＤＡＴＡ ＰＩＰＥＬＩＮＥ Ｑｕａｌｉｔｙ matters at scale every single day here"),
    # --- German group: 21 ~ 22 (ẞ/ß twins) -----------------------------
    (21, "die große straße führt durch die alte stadt am fluss entlang"),
    (22, "DIE GROẞE STRAẞE FÜHRT DURCH DIE ALTE STADT AM FLUSS ENTLANG"),
    # --- fillers: distinct vocabularies, no planted pairs --------------
    (23, "каждый регион хранит свою историю в старинных зданиях города"),
    (24, "العلم نور يضيء طريق المستقبل لكل الأجيال القادمة دائما"),
    (25, "toda persona merece acceso libre a la educación pública superior"),
    (26, "vento forte soprava sobre as colinas verdes ao amanhecer cedo"),
    (27, "हर भाषा अपनी संस्कृति की कहानी कहती है हमेशा"),
    (28, "un viaggio lungo comincia sempre con un piccolo passo avanti"),
    (29, "vår natur behöver skydd från alla som bor här tillsammans"),
    (30, "古い 寺院 は 静かな 山 の 中 に ある そうです"),
]

table = pa.table({
    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
    "text": pa.array([d[1] for d in docs], pa.string()),
    "source": pa.array(["uni"] * len(docs), pa.string()),
})
pq.write_table(table, OUT)
print(f"wrote {OUT} ({len(docs)} docs)")
