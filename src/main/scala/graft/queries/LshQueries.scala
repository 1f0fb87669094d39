package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.LshIndex

/** LSH (random-projection) index search end-to-end
  * (reference: vector_db/indexes.py:165-242 — RandomProjectionIndex):
  * bucket build, bucketed candidate probe, and the `< k` exhaustive
  * fallback, including the allow-set variant (indexes.py:223-224 falls back
  * to the full allow-set, not all vectors).
  *
  * The oracle replicates bucket assignment exactly: the seeded projection
  * matrix is inlined into the DuckDB SQL as double literals (round-trippable
  * `Double.toString`), and the two-phase fallback becomes a data-dependent
  * UNION ALL guarded by the candidate count — so the oracle is correct at
  * ANY scale factor, whichever phase wins.
  */
object LshQueries {

  /** 4 projections -> 16 buckets: at sf0.01 (500 vectors) an unfiltered
    * bucket holds ~31 candidates (>= k=10, bucket path), while a per-label
    * slice holds ~3 (< k, fallback path) — both phases get exercised.
    * dim=64 is fixed across all driver scale factors (TESTDATA.md). */
  private val cfg = LshIndex.Config(numProjections = 4, dim = 64, seed = 42L)

  private def fmt(d: Double): String = java.lang.Double.toString(d)

  private def rowLit(row: Array[Double]): String =
    row.map(fmt).mkString("[", ",", "]") + "::DOUBLE[]"

  /** The engine's lifecycle queries reuse the same seeded matrix so their
    * oracle SQL reproduces engine bucket assignment exactly. */
  private[queries] def config: LshIndex.Config = cfg

  /** Same sign-bit hash as VectorFunctions.lshBucket, in DuckDB SQL. */
  private[queries] def bucketSql(v: String): String =
    cfg.matrix.zipWithIndex.map { case (row, i) =>
      s"(CASE WHEN ${VectorSearchQueries.dotSql(v, rowLit(row))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def lshSql(k: Int, where: String,
                     candPred: String = "e.b = q.qb"): String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv, ${bucketSql("embedding::DOUBLE[]")} AS qb
       |           FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v, ${bucketSql("embedding::DOUBLE[]")} AS b
       |      FROM embeddings $where),
       |cand AS (SELECT e.vec_id, e.v, q.qv FROM e, q WHERE $candPred),
       |base AS (
       |  SELECT vec_id, v, qv FROM cand WHERE (SELECT count(*) FROM cand) >= $k
       |  UNION ALL
       |  SELECT e.vec_id, e.v, q.qv FROM e, q WHERE (SELECT count(*) FROM cand) < $k
       |)
       |SELECT vec_id, round(${VectorSearchQueries.distSql("cosine", "v", "qv")}, 6) + 0 AS distance
       |FROM base ORDER BY distance, vec_id LIMIT $k""".stripMargin

  /** J4: bucketed probe — candidates come from the query's bucket only. */
  private val lshBucket: QueryFn = (s, dir) => {
    val indexed = LshIndex.withBucket(
      table(s, dir, "embeddings"), col("embedding"), cfg)
    val q = indexed.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 10)
  }

  /** J5: the `< k` fallback, allow-set variant — the label pre-filter is
    * the allow-set; its per-bucket slice is tiny, so phase 1 comes up
    * short and the scan falls back to the full allow-set (never all
    * vectors — reference: vector_db/indexes.py:223-224). */
  private val lshFallback: QueryFn = (s, dir) => {
    val indexed = LshIndex.withBucket(
      table(s, dir, "embeddings"), col("embedding"), cfg)
      .where(col("label") === 5)
    val q = LshIndex.withBucket(
      table(s, dir, "embeddings"), col("embedding"), cfg)
      .where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 10)
  }

  /** Multi-probe variant: candidates come from the query's bucket and
    * every Hamming-distance-1 bucket (the recall remedy for sign-bit
    * LSH); the oracle expresses the probe set as bit_count(xor) <= 1,
    * which is exactly membership in the P+1 flipped-bit values. */
  private val lshMultiProbe: QueryFn = (s, dir) => {
    val indexed = LshIndex.withBucket(
      table(s, dir, "embeddings"), col("embedding"), cfg)
    val q = indexed.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    LshIndex.searchMultiProbe(indexed, q, "embedding", "cosine", 10,
      cfg.numProjections)
  }

  val all: Seq[Q] = Seq(
    Q("knn_lsh_bucket", lshBucket, Some(lshSql(10, ""))),
    Q("knn_lsh_fallback", lshFallback, Some(lshSql(10, "WHERE label = 5"))),
    Q("knn_lsh_multiprobe", lshMultiProbe,
      Some(lshSql(10, "", candPred = "bit_count(xor(e.b, q.qb)) <= 1"))),
  )
}
