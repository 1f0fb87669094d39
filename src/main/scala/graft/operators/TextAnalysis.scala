package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis toolkit for training-data pipelines: tokenization, term
  * statistics, quality scoring, n-gram-stopword language ID, and document
  * fingerprinting. All pure Column compositions (codegen-friendly, no
  * UDFs) with arithmetic a SQL oracle can replicate exactly.
  */
object TextAnalysis {

  /** Canonical analysis tokens: NFC-normalized, simple-lowercased,
    * space-trimmed, split on the pinned whitespace class — ONE kernel
    * ([[graft.functions.TextHash.tokensCol]]) shared with the shingle /
    * n-gram hash paths, so lang-ID, quality scoring, BM25, BPE, and
    * dedup can never tokenize two different ways on non-ASCII text.
    * The DuckDB oracle twin is TextQueries.tokSql
    * (`string_split_regex(trim(lower(nfc_normalize(text))), ws+)`). */
  def tokens(text: Column): Column = graft.functions.TextHash.tokensCol(text)

  /** Small per-language stopword profiles for the lang-ID heuristic. The
    * ORDER of this list is the deterministic argmax tie-break. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "est"),
  )

  val Stopwords: Seq[String] = LangProfiles.head._2

  /** Number of tokens matching a word list. */
  def matchCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Predicted language: argmax of per-profile stopword hits, ties broken
    * by LangProfiles order (first wins). A doc matching no profile at all
    * still deterministically yields the first profile's language. */
  def predictedLang(toks: Column): Column = {
    val scores = LangProfiles.map { case (lang, words) =>
      lang -> matchCount(toks, words)
    }
    // profile i wins iff its score >= every LATER score (an earlier
    // profile that tied or beat it has already won): a when-chain
    val conds = scores.zipWithIndex.init.map { case ((lang, score), i) =>
      (scores.drop(i + 1).map(score >= _._2).reduce(_ && _), lang)
    }
    conds.foldRight(lit(scores.last._1)) { case ((cond, lang), rest) =>
      when(cond, lit(lang)).otherwise(rest)
    }
  }

  /** Script ranges for the non-Latin half of language ID — ORDERED
    * (first present wins): kana before the CJK ideograph block because
    * Japanese text mixes both, Hangul/ideographs/Cyrillic/Arabic/
    * Devanagari/Greek by presence. The same class strings run in Java
    * regex (Spark) and RE2 (DuckDB) — `\x{...}` ranges mean the same
    * thing in both — so the oracle replays the decision verbatim. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "ja" -> "[\\x{3040}-\\x{30FF}]",
    "ko" -> "[\\x{AC00}-\\x{D7AF}]",
    "zh" -> "[\\x{4E00}-\\x{9FFF}]",
    "ru" -> "[\\x{0400}-\\x{04FF}]",
    "ar" -> "[\\x{0600}-\\x{06FF}]",
    "hi" -> "[\\x{0900}-\\x{097F}]",
    "el" -> "[\\x{0370}-\\x{03FF}]",
  )

  /** Script-aware language ID: non-Latin scripts decide by presence
    * (a Unicode code-point range match — stopword lists cannot see
    * CJK/Cyrillic/Arabic text at all and would call everything by the
    * Latin fallback); Latin-script text falls through to the
    * stopword-profile argmax ([[predictedLang]]). A deterministic
    * heuristic, not a model: mixed-script documents resolve by the
    * declared range order. */
  def predictedLangScript(text: Column, toks: Column): Column =
    ScriptRanges.foldRight(predictedLang(toks)) { case ((code, cls), rest) =>
      when(regexp_count(text, lit(cls)) > 0, lit(code)).otherwise(rest)
    }

  /** Default keep threshold for the language-ID confidence gate — the
    * CCNet rule's analogue (Wenzek et al. 2020 §4.3 keep a page only if
    * the fastText language score is >= 0.5; this heuristic's confidence
    * lives on a different scale, so the shipped cut is calibrated to
    * it: natural prose hits ~0.17-0.45 on the stopword fraction and
    * script text ~0.5-1.0 on the script-char fraction, while
    * keyword soup / wrong-alphabet text sits at 0). ONE home — specs,
    * query rows, and the pipeline wire this constant. */
  val LangIdMinConfidence = 0.15

  /** Deterministic language-ID CONFIDENCE in [0, 1] beside
    * [[predictedLangScript]] (the argmax alone keeps everything — CCNet
    * gates on the score, not the argmax, which is what drops
    * keyword-soup and wrong-alphabet pages): for a document decided by
    * a SCRIPT range, the fraction of non-whitespace code points in the
    * winning range; for the Latin stopword fallback, the WINNING
    * profile's hit count (= the max over profiles — exactly what the
    * argmax maximized) over the token count. Rounded to 6, the
    * cross-engine contract; the decision chain mirrors
    * [[predictedLangScript]] range-for-range so (lang, confidence)
    * always describe the same decision. */
  def langScriptConfidence(text: Column, toks: Column): Column = {
    val ws = graft.functions.TextHash.WsClassJava
    val nonWs = length(regexp_replace(text, s"$ws+", "")).cast("double")
    val latin = greatest(LangProfiles.map { case (_, words) =>
      matchCount(toks, words) }: _*).cast("double") / size(toks)
    val conf = ScriptRanges.foldRight(latin) { case ((_, cls), rest) =>
      when(regexp_count(text, lit(cls)) > 0,
        regexp_count(text, lit(cls)).cast("double") / nonWs).otherwise(rest)
    }
    round(conf, 6) + lit(0.0d)
  }

  /** Ratio of stopword tokens (quality signal: natural text has some;
    * keyword soup and boilerplate sit at the extremes). */
  def stopwordRatio(toks: Column): Column =
    matchCount(toks, Stopwords).cast("double") / size(toks)

  /** Mean token length. */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)

  /** Type-token ratio (vocabulary diversity). */
  def uniqueRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Composite quality score in [0, 1]: diversity + non-stopword mass +
    * saturating length credit. Weights are part of the operator contract
    * and live HERE only — every SQL oracle fragment is generated from
    * these constants (TextQueries.qualitySqlOf), so the five replay
    * sites cannot drift from the Column operator. */
  val QualityUniqueWeight = 0.3
  val QualityStopWeight = 0.4
  val QualityLenWeight = 0.3
  val QualityLenCap = 100.0

  def qualityScore(toks: Column): Column =
    lit(QualityUniqueWeight) * uniqueRatio(toks) +
      lit(QualityStopWeight) * (lit(1.0) - stopwordRatio(toks)) +
      lit(QualityLenWeight) *
        least(size(toks).cast("double") / QualityLenCap, lit(1.0))

  // ---------------- Gopher rule panel ----------------

  /** Gopher quality-rule constants (Rae et al. 2021, Table A1 — the
    * published thresholds, applied to the pinned token stream). The
    * contract lives HERE only; SQL oracle fragments are generated from
    * these values so the two engines cannot drift. */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherMinMeanWordLen = 3.0
  val GopherMaxMeanWordLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMaxBulletLineFrac = 0.9
  val GopherMaxEllipsisLineFrac = 0.3
  val GopherMinAlphaWordFrac = 0.8
  val GopherMinStopwords = 2
  /** The paper's required-stopword list ("the, be, to, of, and, that,
    * have, with" — §A1.1), distinct from the lang-ID profiles. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule panel (Rae et al. 2021, Table A1): the
    * seven published document filters as one row of metrics + the
    * composite pass flag —
    *
    *   1. GopherMinWords <= word count <= GopherMaxWords
    *   2. mean word length in [GopherMinMeanWordLen, GopherMaxMeanWordLen]
    *   3. symbol-to-word ratio ('#' and ellipsis — '…' or '...') <=
    *      GopherMaxSymbolRatio
    *   4. <= GopherMaxBulletLineFrac of lines start with a bullet
    *      ('•', '-', '*', after the pinned whitespace trim)
    *   5. <= GopherMaxEllipsisLineFrac of lines end with an ellipsis
    *   6. >= GopherMinAlphaWordFrac of words contain a letter (Unicode
    *      \\p{L} over the NFC-lowercased token stream)
    *   7. >= GopherMinStopwords DISTINCT required stopwords present
    *
    * All comparisons run on the ROUNDED (6-decimal) ratios both engines
    * print, so a boundary document flags identically everywhere. Counts
    * of '…'/'...' use non-overlapping left-to-right replace arithmetic
    * (identical semantics in the JVM and the oracle engine).
    *
    * Scale shape: a pure projection — one tokenize, one line split, a
    * few regex/replace passes per document; zero shuffles, zero joins,
    * scan-cost at any corpus size.
    *
    * Output: (id, n_words, mean_word_len, symbol_ratio,
    * bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    * n_stopwords, passes) with passes an int 0/1. */
  def gopherQualityFlags(df: org.apache.spark.sql.DataFrame, id: Column,
                         text: Column): org.apache.spark.sql.DataFrame = {
    val ws = graft.functions.TextHash.WsClassJava
    def r6(c: Column): Column = round(c, 6) + lit(0.0d)
    def occurrences(t: Column, needle: String): Column =
      ((length(t) - length(regexp_replace(t, java.util.regex.Pattern.quote(needle), "")))
        / lit(needle.length)).cast("long")
    val base = df.select(id.as("id"), text.as("__x"),
      tokens(text).as("__t"), split(text, "\n").as("__l"))
    val trimmedLines = transform(col("__l"),
      l => regexp_replace(l, s"^$ws+|$ws+$$", ""))
    base.select(
        col("id"),
        size(col("__t")).cast("long").as("n_words"),
        r6(aggregate(col("__t"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(col("__t"))).as("mean_word_len"),
        r6((occurrences(col("__x"), "#") + occurrences(col("__x"), "…") +
            occurrences(col("__x"), "...")).cast("double") / size(col("__t")))
          .as("symbol_ratio"),
        r6(size(filter(trimmedLines, l => l.rlike("^[•*-]")))
          .cast("double") / size(col("__l"))).as("bullet_line_frac"),
        r6(size(filter(trimmedLines, l => l.rlike("(\\.\\.\\.|…)$")))
          .cast("double") / size(col("__l"))).as("ellipsis_line_frac"),
        r6(size(filter(col("__t"), t => t.rlike("\\p{L}")))
          .cast("double") / size(col("__t"))).as("alpha_word_frac"),
        size(array_intersect(array_distinct(col("__t")),
          array(GopherStopwords.map(lit): _*))).cast("long").as("n_stopwords"))
      .withColumn("passes",
        (col("n_words").between(GopherMinWords, GopherMaxWords) &&
          col("mean_word_len").between(GopherMinMeanWordLen, GopherMaxMeanWordLen) &&
          col("symbol_ratio") <= GopherMaxSymbolRatio &&
          col("bullet_line_frac") <= GopherMaxBulletLineFrac &&
          col("ellipsis_line_frac") <= GopherMaxEllipsisLineFrac &&
          col("alpha_word_frac") >= GopherMinAlphaWordFrac &&
          col("n_stopwords") >= GopherMinStopwords).cast("long"))
  }

  /** Document fingerprint: min of the seeded shingle hashes over word
    * bigrams — a 1-wide MinHash (rolling-hash-style content signature). */
  def fingerprint(text: Column): Column =
    array_min(transform(NearDup.shingles(text, 2), s => NearDup.seededHash(0, s)))

  /** PII redaction patterns, ordered and ENGINE-PORTABLE (no
    * lookaround, no backreferences — every construct means the same
    * thing to Java regex, RE2/DuckDB, and python `re`, which is what
    * lets a SQL oracle replay the redaction byte-for-byte). The ORDER
    * is load-bearing: URLs redact first, so an email-shaped substring
    * inside a query string becomes part of `<URL>`, not a spurious
    * `<EMAIL>`; each category counts its matches against the text state
    * AFTER the previous categories redacted. (name, pattern,
    * replacement). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^\\s]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    // STRUCTURED phone shape (four digit groups, >= 9 digits total,
    // single optional separators) — a bare [\d .-]{9,} run would also
    // eat ISO dates, ISBNs, and spaced thousands ("1 000 000"), which
    // this deliberately does not match. Residual false positive,
    // accepted and documented: an unbroken 9+-digit run ("pi digits")
    // is phone-shaped by any lookaround-free definition.
    ("phone",
      "\\+?\\d{1,3}[ .-]?\\(?\\d{2,4}\\)?[ .-]?\\d{3,4}[ .-]?\\d{3,4}",
      "<PHONE>"))

  /** PII scrubbing — the pre-release redaction pass a training corpus
    * runs before anything leaves the pipeline: URLs, emails, IPv4s and
    * phone-shaped digit runs replaced by typed placeholders, with a
    * per-category match count for the redaction report. One stateless
    * projection per document (codegen regex kernels, zero shuffles —
    * scan-shaped at any corpus size).
    *
    * Output: (id, n_url, n_email, n_ipv4, n_phone, clean_text). */
  def redactPii(df: org.apache.spark.sql.DataFrame, id: Column,
                text: Column): org.apache.spark.sql.DataFrame = {
    val redacted = PiiPatterns.foldLeft(
        df.select(id.as("id"), text.as("__s"))) {
      case (frame, (name, pat, repl)) =>
        frame.withColumn(s"n_$name", regexp_count(col("__s"), lit(pat)))
          .withColumn("__s", regexp_replace(col("__s"), pat, repl))
    }
    redacted.select(col("id") +:
      PiiPatterns.map { case (name, _, _) => col(s"n_$name") } :+
      col("__s").as("clean_text"): _*)
  }
}
