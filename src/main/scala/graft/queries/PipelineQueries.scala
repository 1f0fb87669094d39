package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{NearDup, TextAnalysis}
import graft.operators.TextAnalysis._

/** The composite training-data pipeline — what the whole engine exists
  * for, as one oracle-gated query: quality-gate the corpus, keep the
  * target language, drop near-duplicates (greedy keep-first), and report
  * the surviving token budget. Every stage is an operator proven green on
  * its own; this row proves they compose. */
object PipelineQueries {

  private val QualityMin = 0.68

  private val trainingSet: QueryFn = (s, dir) => {
    val docs = table(s, dir, "documents")
    val t = tokens(col("text"))
    val losers = NearDup.nearDupPairs(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
      .select(col("id_b"))
    docs
      .where(qualityScore(t) >= QualityMin)
      .where(predictedLang(t) === "en")
      .join(losers, docs("doc_id") === col("id_b"), "left_anti")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(ceil(length(trim(col("text"))).cast("double") / 4.0).cast("long"))
          .as("total_tokens_est"),
        sum(col("n_chars")).as("total_chars"))
  }

  private val trainingSetSql: String = {
    val inList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    def score(words: Seq[String]) =
      s"len(list_filter(t, x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"
    val scores = LangProfiles.map { case (lang, words) => lang -> score(words) }
    val whens = scores.zipWithIndex.init.map { case ((lang, sc), i) =>
      val later = scores.drop(i + 1).map(o => s"$sc >= ${o._2}").mkString(" AND ")
      s"WHEN $later THEN '$lang'"
    }.mkString(" ")
    s"""WITH ${DedupQueries.jaccardPairs},
       |keep AS (
       |  SELECT doc_id, text, n_chars,
       |    ${TextQueries.tokSql} AS t
       |  FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_b FROM p WHERE j >= 0.5)),
       |scored AS (
       |  SELECT doc_id, text, n_chars,
       |    0.3 * (len(list_distinct(t))::DOUBLE / len(t)) +
       |    0.4 * (1.0 - len(list_filter(t, x -> x IN ($inList)))::DOUBLE / len(t)) +
       |    0.3 * least(len(t)::DOUBLE / 100.0, 1.0) AS quality,
       |    CASE $whens ELSE '${LangProfiles.last._1}' END AS lang
       |  FROM keep)
       |SELECT count(*) AS n_docs,
       |  sum(ceil(len(trim(text))::DOUBLE / 4.0)::BIGINT)::BIGINT AS total_tokens_est,
       |  sum(n_chars)::BIGINT AS total_chars
       |FROM scored WHERE quality >= $QualityMin AND lang = 'en'""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pipeline_training_set", trainingSet, Some(trainingSetSql)),
  )
}
