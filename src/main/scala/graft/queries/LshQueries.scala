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

  /** Same sign-bit hash as VectorFunctions.lshBucket, in DuckDB SQL —
    * generated for any seeded config (the retrain row replays a
    * RE-DERIVED matrix, not the build-time one). */
  private[queries] def bucketSql(v: String,
                                 c: LshIndex.Config = cfg): String =
    c.matrix.zipWithIndex.map { case (row, i) =>
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

  /** QUERY-DIRECTED ADAPTIVE probing (LshIndex.searchAdaptive): buckets
    * ordered by flipped-margin cost, probed until the prefix holds
    * k * AdaptiveMultiplier candidates. The oracle replays the WHOLE
    * selection — margins, per-bucket costs, the (cost, bucket)-ordered
    * cumulative histogram, and the prefix cut — in SQL, so the
    * data-dependent probe set itself is gated, not just the final
    * distances. Margins/costs are bit-identical cross-engine (same
    * left-to-right double folds as the bucket sign bits the other LSH
    * oracles already rely on).
    *
    * The gate pins multiplier=20 (target 200 candidates), BELOW the row
    * count at every driver scale factor >= 0.01, so the prefix cut is
    * genuinely partial — the default multiplier's larger target would
    * degenerate to a full scan on the small gate tables and leave the
    * selection logic unexercised. */
  private val AdaptiveGateMult = 20

  private val lshAdaptive: QueryFn = (s, dir) => {
    val indexed = LshIndex.withBucket(
      table(s, dir, "embeddings"), col("embedding"), cfg)
    val q = table(s, dir, "embeddings").where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    LshIndex.searchAdaptive(indexed, q, cfg.matrix, "cosine", 10,
      multiplier = AdaptiveGateMult)
  }

  /** Margin columns of the single query row (vec_id = 0): m_i = P_i . qv,
    * same element order as LshIndex.margins. */
  private[queries] def marginColsSql: String = marginColsSql(cfg)

  private[queries] def marginColsSql(c: LshIndex.Config): String =
    c.matrix.zipWithIndex.map { case (row, i) =>
      s"${VectorSearchQueries.dotSql("embedding::DOUBLE[]", rowLit(row))} AS m$i"
    }.mkString(", ")

  /** Flip-cost of bucket `h.b` vs query bucket `q.qb`: same term order as
    * LshIndex.probePrefix's loop (i ascending, each non-flipped bit
    * contributing an exact +0). */
  private[queries] def costSql: String = costSql(cfg)

  private[queries] def costSql(c: LshIndex.Config): String =
    c.matrix.indices.map { i =>
      s"(CASE WHEN (xor(h.b, q.qb) & ${1L << i}) <> 0 THEN abs(q.m$i) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Full adaptive-probe replay over the embeddings table, parameterized
    * on the output id expression so the engine-lifecycle gate (chunk ids
    * 'c' || vec_id) reuses it: margins -> costed bucket histogram ->
    * (cost, bucket)-ordered cumulative prefix cut -> exact top-k over the
    * selected buckets. `eWhere` restricts the searched rows — a filtered
    * search aggregates the ALLOW-SET's histogram (the engine's
    * adaptiveHist-None path), which this replays by filtering `e` before
    * the histogram is built. */
  private[queries] def adaptiveSql(idSql: String, idAlias: String,
                                   target: Long, k: Int,
                                   eWhere: String = "",
                                   c: LshIndex.Config = cfg): String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv, ${bucketSql("embedding::DOUBLE[]", c)} AS qb,
       |           ${marginColsSql(c)}
       |           FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT $idSql AS $idAlias, embedding::DOUBLE[] AS v, ${bucketSql("embedding::DOUBLE[]", c)} AS b
       |      FROM embeddings $eWhere),
       |hist AS (SELECT b, count(*) AS n FROM e GROUP BY b),
       |cost AS (SELECT h.b, h.n, ${costSql(c)} AS cost FROM hist h, q),
       |sel AS (SELECT b FROM (
       |          SELECT b, n, cost,
       |                 sum(n) OVER (ORDER BY cost, b
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS cum_before
       |          FROM cost) WHERE cum_before < $target)
       |SELECT $idAlias, round(${VectorSearchQueries.distSql("cosine", "v", "qv")}, 6) + 0 AS distance
       |FROM e, q WHERE e.b IN (SELECT b FROM sel)
       |ORDER BY distance, $idAlias LIMIT $k""".stripMargin

  private val lshAdaptiveSql: String =
    adaptiveSql("vec_id", "vec_id", 10L * AdaptiveGateMult, 10)

  val all: Seq[Q] = Seq(
    Q("knn_lsh_bucket", lshBucket, Some(lshSql(10, ""))),
    Q("knn_lsh_fallback", lshFallback, Some(lshSql(10, "WHERE label = 5"))),
    Q("knn_lsh_multiprobe", lshMultiProbe,
      Some(lshSql(10, "", candPred = "bit_count(xor(e.b, q.qb)) <= 1"))),
    Q("knn_lsh_adaptive", lshAdaptive, Some(lshAdaptiveSql)),
  )
}
