package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Training-data deduplication over the `documents` table — the first-class
  * scale extension (builder brief; SURVEY.md §2.9). Exact dedup here;
  * MinHash / SimHash / n-gram Jaccard / embedding near-dup live in their
  * own query files.
  */
object DedupQueries {

  /** Exact dedup: hash-groupBy on content digest, keep min id
    * (one shuffle on the digest; at 100TB this is the cheapest possible
    * exact pass — the digest is 128 bits regardless of document size). */
  private val exactGroups: QueryFn = (s, dir) =>
    Dedup.exactGroups(table(s, dir, "documents"), col("text"), col("doc_id"))
      .orderBy(col("text_hash"))

  private val exactGroupsSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** The surviving rows after exact dedup (keeper = min doc_id per digest). */
  private val exactSurvivors: QueryFn = (s, dir) =>
    Dedup.exact(table(s, dir, "documents"), col("text"), col("doc_id"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  private val exactSurvivorsSql: String =
    """SELECT doc_id, source FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
      |ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dedup_exact_groups", exactGroups, Some(exactGroupsSql)),
    Q("dedup_exact_survivors", exactSurvivors, Some(exactSurvivorsSql)),
  )
}
