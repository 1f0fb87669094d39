package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.MetadataFunctions._
import graft.functions.VectorFunctions._

/** P1 typed metadata filtering (reference: vector_db/vector_store.py:250-265)
  * over a real MAP column with the typed-prefix encoding (SURVEY.md §7.4
  * item 3).
  *
  * The map is derived declaratively from the embeddings table so the DuckDB
  * oracle can recompute the same semantics from the raw columns: the `tag`
  * key holds the SAME digits as an int for even vec_id and as a string for
  * odd vec_id — so a typed int-3 filter and a typed "3" filter select
  * disjoint row sets. An untyped MAP<STRING,STRING> would conflate them.
  */
object MetadataQueries {

  private def withMeta(df: DataFrame): DataFrame =
    df.withColumn("metadata", map(
      lit("tag"),
      when(pmod(col("vec_id"), lit(2)) === 0, encodeIntCol(col("label")))
        .otherwise(encodeStrCol(col("label").cast("string"))),
      lit("parity"),
      encodeStrCol(when(pmod(col("vec_id"), lit(2)) === 0, lit("even"))
        .otherwise(lit("odd")))))

  /** k-NN under a typed metadata pre-filter: tag == int 3 (matches only the
    * int-encoded rows). The filter is applied before any distance work,
    * exactly like the reference's allowed_ids pre-pass. */
  private val knnMetaTyped: QueryFn = (s, dir) => {
    val emb = withMeta(table(s, dir, "embeddings"))
    val q = table(s, dir, "embeddings").where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    emb.where(filterPredicate(col("metadata"), Map("tag" -> 3)))
      .crossJoin(broadcast(q))
      .withColumn("distance",
        round(cosineDistance(col("embedding"), col("qvec")), 6) + lit(0.0d))
      .select(col("vec_id"), col("distance"))
      .orderBy(col("distance"), col("vec_id"))
      .limit(10)
  }

  private val knnMetaTypedSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${VectorSearchQueries.distSql("cosine", "embedding::DOUBLE[]", "qv")}, 6) + 0 AS distance
       |FROM embeddings, q WHERE label = 3 AND vec_id % 2 = 0
       |ORDER BY distance, vec_id LIMIT 10""".stripMargin

  /** The int-vs-string trap, probed directly: the same digit filtered as
    * int 3 vs string "3" must match disjoint row sets (reference:
    * vector_store.py:261-265 — typed equality). */
  private val metaTypedTrap: QueryFn = (s, dir) => {
    val emb = withMeta(table(s, dir, "embeddings"))
    def n(pred: Column): Column = sum(when(pred, 1).otherwise(0))
    emb.agg(
      n(filterPredicate(col("metadata"), Map("tag" -> 3))).as("n_int_match"),
      n(filterPredicate(col("metadata"), Map("tag" -> "3"))).as("n_str_match"),
      n(filterPredicate(col("metadata"),
        Map("tag" -> 3, "parity" -> "even"))).as("n_conj_match"))
  }

  private val metaTypedTrapSql: String =
    """SELECT
      |  sum(CASE WHEN label = 3 AND vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_int_match,
      |  sum(CASE WHEN label = 3 AND vec_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_str_match,
      |  sum(CASE WHEN label = 3 AND vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_conj_match
      |FROM embeddings""".stripMargin

  val all: Seq[Q] = Seq(
    Q("knn_meta_typed", knnMetaTyped, Some(knnMetaTypedSql)),
    Q("meta_typed_trap", metaTypedTrap, Some(metaTypedTrapSql)),
  )
}
