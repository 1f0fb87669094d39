package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Engine lifecycle end-to-end through the oracle gate (SURVEY.md §2.8):
  * create -> bulk ingest -> cascade delete -> derived counts, and a full
  * persistence round-trip (save -> reopen -> search) for both index kinds.
  *
  * The engine state is BUILT from the driver's `embeddings` table
  * (documents = one per label, chunks = one per vector, ids derived from
  * vec_id/label), so every final state is a deterministic function of the
  * input parquet that DuckDB can recompute directly.
  */
object EngineQueries {

  /** Build an engine holding the embeddings table as one library:
    * documents doc-<label>, chunks c<vec_id>; then cascade-delete doc-7. */
  private def buildEngine(s: SparkSession, dir: String, kind: String,
                          deleteDoc7: Boolean): (VectorEngine, String) = {
    val eng = VectorEngine.create(s)
    val lib = eng.createLibrary("embeddings", dim = 64, metric = "cosine",
      indexKind = kind, id = Some("lib0"),
      lshProjections = LshQueries.config.numProjections,
      lshSeed = LshQueries.config.seed)
    eng.addDocumentsDf(lib.id, table(s, dir, "embeddings")
      .select(concat(lit("doc-"), col("label")).as("id"))
      .distinct()
      .select(col("id"), col("id").as("name"),
        typedLit(Map.empty[String, String]).as("metadata")))
    val chunkDf = table(s, dir, "embeddings").select(
      concat(lit("c"), col("vec_id")).as("id"),
      concat(lit("doc-"), col("label")).as("document_id"),
      concat(lit("vec "), col("vec_id")).as("text"),
      col("embedding"),
      typedLit(Map.empty[String, String]).as("metadata"),
      col("vec_id").cast("int").as("chunk_index"))
    eng.addChunksDf(lib.id, chunkDf)
    if (deleteDoc7) eng.deleteDocument("doc-7")
    (eng, lib.id)
  }

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    table(s, dir, "embeddings").where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  /** A2/J6: derived chunk counts per document after a cascade delete —
    * counts are a groupBy at read time, so the cascade can never leave a
    * drifted counter behind. */
  private val cascadeCounts: QueryFn = (s, dir) => {
    val (eng, _) = buildEngine(s, dir, VectorEngine.IndexKindFlat, deleteDoc7 = true)
    eng.chunksDf.groupBy(col("document_id"))
      .agg(count(lit(1)).as("n_chunks"))
      .orderBy(col("document_id"))
  }

  private val cascadeCountsSql: String =
    """SELECT 'doc-' || label AS document_id, count(*)::BIGINT AS n_chunks
      |FROM embeddings WHERE label <> 7
      |GROUP BY label ORDER BY document_id""".stripMargin

  /** S2-S5 + §3.1: full persistence round-trip — build, cascade-delete,
    * save, REOPEN, then search the reopened engine (mirrors
    * test_disk_persistence.py:240-271 as an oracle row). */
  private val searchPersisted: QueryFn = (s, dir) => {
    val (eng, lib) = buildEngine(s, dir, VectorEngine.IndexKindFlat, deleteDoc7 = true)
    val state = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
    eng.save(state)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val searchPersistedSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT 'c' || vec_id AS chunk_id,
       |  round(${VectorSearchQueries.distSql("cosine", "embedding::DOUBLE[]", "qv")}, 6) + 0 AS distance
       |FROM embeddings, q WHERE label <> 7
       |ORDER BY distance, chunk_id LIMIT 10""".stripMargin

  /** Same round-trip for a random_projection library: the persisted
    * projection matrix must reproduce identical buckets after reopen (S4 +
    * S5), and the bucketed probe must agree with the oracle's two-phase
    * SQL at any scale. */
  private val lshPersisted: QueryFn = (s, dir) => {
    val (eng, lib) = buildEngine(s, dir, VectorEngine.IndexKindLsh, deleteDoc7 = false)
    val state = java.nio.file.Files.createTempDirectory("graft-lifecycle-lsh").toString
    eng.save(state)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val lshPersistedSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv, ${LshQueries.bucketSql("embedding::DOUBLE[]")} AS qb
       |           FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v,
       |             ${LshQueries.bucketSql("embedding::DOUBLE[]")} AS b
       |      FROM embeddings),
       |cand AS (SELECT e.chunk_id, e.v, q.qv FROM e, q WHERE e.b = q.qb),
       |base AS (
       |  SELECT chunk_id, v, qv FROM cand WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT e.chunk_id, e.v, q.qv FROM e, q WHERE (SELECT count(*) FROM cand) < 10
       |)
       |SELECT chunk_id, round(${VectorSearchQueries.distSql("cosine", "v", "qv")}, 6) + 0 AS distance
       |FROM base ORDER BY distance, chunk_id LIMIT 10""".stripMargin

  /** Facade batch search on an LSH library: 4 queries in ONE plan, with
    * the two-phase bucket-probe/fallback decided PER QUERY. The oracle
    * replays per-query candidate counts and the conditional fallback in
    * SQL, so whichever phase each query takes at any scale factor, both
    * sides agree. */
  private val batchSearch: QueryFn = (s, dir) => {
    val (eng, lib) = buildEngine(s, dir, VectorEngine.IndexKindLsh, deleteDoc7 = false)
    val qs = table(s, dir, "embeddings").where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    eng.searchBatch(lib, qs, k = 5)
  }

  private val batchSearchSql: String = {
    val bucket = LshQueries.bucketSql("embedding::DOUBLE[]")
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, $bucket AS qb
       |           FROM embeddings WHERE vec_id < 4),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v, $bucket AS b
       |      FROM embeddings),
       |cand AS (SELECT q.query_id, e.chunk_id, e.v, q.qv FROM e JOIN q ON e.b = q.qb),
       |counts AS (SELECT query_id, count(*) AS n FROM cand GROUP BY query_id),
       |base AS (
       |  SELECT c.query_id, c.chunk_id, c.v, c.qv
       |  FROM cand c JOIN counts t ON c.query_id = t.query_id WHERE t.n >= 5
       |  UNION ALL
       |  SELECT q.query_id, e.chunk_id, e.v, q.qv FROM e, q
       |  WHERE coalesce((SELECT n FROM counts WHERE counts.query_id = q.query_id), 0) < 5
       |),
       |r AS (SELECT query_id, chunk_id, round($cos, 6) + 0 AS distance,
       |        row_number() OVER (PARTITION BY query_id
       |                           ORDER BY round($cos, 6) + 0, chunk_id) AS rn
       |      FROM base)
       |SELECT query_id, chunk_id, distance FROM r WHERE rn <= 5
       |ORDER BY query_id, distance, chunk_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("lifecycle_cascade_counts", cascadeCounts, Some(cascadeCountsSql)),
    Q("lifecycle_search_persisted", searchPersisted, Some(searchPersistedSql)),
    Q("lifecycle_lsh_persisted", lshPersisted, Some(lshPersistedSql)),
    Q("lifecycle_batch_search", batchSearch, Some(batchSearchSql)),
  )
}
