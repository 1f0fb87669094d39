package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis toolkit for training-data pipelines: tokenization, term
  * statistics, quality scoring, n-gram-stopword language ID, and document
  * fingerprinting. All pure Column compositions (codegen-friendly, no
  * UDFs) with arithmetic a SQL oracle can replicate exactly.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

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
    * (the oracle replicates them verbatim). */
  def qualityScore(toks: Column): Column =
    lit(0.3) * uniqueRatio(toks) +
      lit(0.4) * (lit(1.0) - stopwordRatio(toks)) +
      lit(0.3) * least(size(toks).cast("double") / 100.0, lit(1.0))

  /** Document fingerprint: min of the seeded shingle hashes over word
    * bigrams — a 1-wide MinHash (rolling-hash-style content signature). */
  def fingerprint(text: Column): Column =
    array_min(transform(NearDup.shingles(text, 2), s => NearDup.seededHash(0, s)))
}
