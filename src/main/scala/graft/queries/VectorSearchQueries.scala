package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The reference's core query surface — k-NN over an embedding column —
  * expressed as declarative DataFrame plans (SURVEY.md §2.2/§2.3/§2.4/§2.6).
  *
  * Test mapping onto the driver tables: `embeddings(vec_id, embedding, label)`
  * is the chunks-with-vectors fact table; `label` plays the metadata map
  * (typed equality pre-filter, reference vector_db/vector_store.py:250-265);
  * the query vector is itself a row of the table (vec_id = 0), so both the
  * Spark plan and the DuckDB oracle derive it declaratively — no driver-side
  * collect.
  *
  * Physical shape at scale: the one-row query side is broadcast, the fact
  * scan prunes to (vec_id, embedding[, label]), distance is a codegen'd
  * Column composition, and orderBy+limit plans TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, no full shuffle.
  */
object VectorSearchQueries {

  /** Deterministic total order: (rounded distance, id) — SURVEY.md §7.4(2). */
  private def knn(metric: String, k: Int, labelFilter: Option[Int]): QueryFn =
    (s, dir) => {
      val emb = table(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qvec"))
      val base = labelFilter.fold(emb)(l => emb.where(col("label") === l))
      base.crossJoin(broadcast(q))
        .withColumn("distance",
          round(distance(metric)(col("embedding"), col("qvec")), 6))
        .select(col("vec_id"), col("distance"))
        .orderBy(col("distance"), col("vec_id"))
        .limit(k)
    }

  private def dotSql(a: String, b: String) = s"list_dot_product($a, $b)"

  private def distSql(metric: String, v: String, q: String): String =
    metric match {
      case "cosine" =>
        s"case when sqrt(${dotSql(v, v)}) = 0 or sqrt(${dotSql(q, q)}) = 0 then 'infinity'::DOUBLE " +
          s"else 1 - ${dotSql(v, q)} / (sqrt(${dotSql(v, v)}) * sqrt(${dotSql(q, q)})) end"
      case "euclidean"   => s"list_distance($v, $q)"
      case "dot_product" => s"-${dotSql(v, q)}"
    }

  private def knnSql(metric: String, k: Int, where: String = ""): String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${distSql(metric, "embedding::DOUBLE[]", "qv")}, 6) AS distance
       |FROM embeddings, q $where
       |ORDER BY distance, vec_id LIMIT $k""".stripMargin

  /** P2/J2: restrict search to an allow-set via LEFT SEMI JOIN
    * (reference: vector_db/indexes.py:73-80 allowed_ids). */
  private val knnAllowed: QueryFn = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    val allowed = emb.where(col("vec_id") % 7 === 0).select("vec_id")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    emb.join(allowed, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .withColumn("distance",
        round(cosineDistance(col("embedding"), col("qvec")), 6))
      .select(col("vec_id"), col("distance"))
      .orderBy(col("distance"), col("vec_id"))
      .limit(10)
  }

  /** J3 batch variant: many queries x all vectors, top-k per query via a
    * ranking window (reference has only 1-query search; this is the shape
    * that scales — BroadcastNestedLoopJoin with the small query side
    * broadcast, then per-query top-k). */
  private val knnBatch: QueryFn = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = table(s, dir, "embeddings")
    val qs = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("vec_id"))
    emb.crossJoin(broadcast(qs))
      .withColumn("distance",
        round(cosineDistance(col("embedding"), col("qvec")), 6))
      .select(col("query_id"), col("vec_id"), col("distance"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .drop("rn")
      .orderBy(col("query_id"), col("distance"), col("vec_id"))
  }

  private val knnBatchSql: String =
    s"""WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 4),
       |d AS (SELECT query_id, vec_id,
       |        round(${distSql("cosine", "embedding::DOUBLE[]", "qv")}, 6) AS distance
       |      FROM embeddings, qs),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rn FROM d)
       |SELECT query_id, vec_id, distance FROM r WHERE rn <= 5
       |ORDER BY query_id, distance, vec_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("knn_flat_cosine", knn("cosine", 10, None),
      Some(knnSql("cosine", 10))),
    Q("knn_flat_euclidean", knn("euclidean", 10, None),
      Some(knnSql("euclidean", 10))),
    Q("knn_flat_dot", knn("dot_product", 10, None),
      Some(knnSql("dot_product", 10))),
    Q("knn_meta_filter", knn("cosine", 10, Some(3)),
      Some(knnSql("cosine", 10, "WHERE label = 3"))),
    Q("knn_allowed_ids", knnAllowed,
      Some(knnSql("cosine", 10, "WHERE vec_id % 7 = 0"))),
    Q("knn_batch_topk", knnBatch, Some(knnBatchSql)),
  )
}
