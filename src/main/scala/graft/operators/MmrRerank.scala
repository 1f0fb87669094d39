package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
  * SIGIR): diversify a top-k answer by iteratively selecting
  *
  *   argmax over remaining candidates d of
  *     lambda * sim(q, d) - (1 - lambda) * max over selected s of sim(d, s)
  *
  * — the standard retrieval trick when the raw top-k is a wall of
  * near-duplicates (which, on a crawl corpus, it usually is).
  *
  * Scale shape: the DISTRIBUTED part is the candidate pool — a plain
  * top-`poolSize` by rounded cosine distance (TakeOrderedAndProject:
  * per-partition heaps, poolSize-row merge, no shuffle of the corpus, and
  * it composes with any of the engine's index funnels). The greedy
  * selection then runs driver-side over the BOUNDED pool (O(poolSize^2)
  * rounded pair similarities — poolSize is a request parameter in the
  * tens, the same driver-data class as the k-means samples or the BM25
  * query-term stats). MMR's sequential argmax is inherently iterative;
  * distributing k scans of a ~30-row set would add k scheduling
  * round-trips for nothing.
  *
  * Cross-engine contract (SQL-replayable, `knn_mmr_rerank`):
  *   - similarities are 1 - (cosine distance rounded to 6) — pair
  *     similarities computed with the same left-to-right double
  *     accumulation as the fused Column kernel; a pair (or a relevance)
  *     involving a ZERO-NORM vector has undefined cosine and scores the
  *     NEUTRAL similarity 0.0, so every MMR score stays finite at any
  *     lambda (an infinite distance fed through mu * penalty would
  *     produce NaN at mu = 0 and an infinite diversity credit otherwise);
  *   - the argmax compares the UNROUNDED score lambda*rel - mu*penalty
  *     built from those rounded inputs (every op IEEE-deterministic),
  *     ties to the smaller id; the FIRST pick compares raw relevance
  *     (argmax-equivalent for lambda > 0, and at lambda = 0 it matches
  *     the SQL twin's relevance-ordered recursive base case instead of
  *     degenerating to an all-zero tie) and its penalty is 0;
  *   - `mu` is literally `1.0 - lambda` in IEEE arithmetic, and the SQL
  *     twin prints THAT double (1 - 0.7 is 0.30000000000000004, not 0.3 —
  *     a hand-written 0.3 would diverge);
  *   - output (rank, id, relevance, mmr) with relevance and mmr rounded
  *     to 6.
  */
object MmrRerank {

  /** Round-half-up to 6 with Double.toString decimalization — the exact
    * semantics of Catalyst's Round (BigDecimal.valueOf) and the engine's
    * `round(x, 6) + 0.0` convention; -0.0 normalized. */
  private def round6(x: Double): Double = {
    if (x.isInfinite || x.isNaN) return x
    val r = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (r == 0.0d) 0.0d else r
  }

  /** Driver twin of the fused cosine-distance kernel: left-to-right
    * double accumulation over float inputs, +Inf on a zero norm, rounded
    * to 6 ([[IvfIndex.nearestCentroids]] keeps the same convention). */
  private[graft] def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0d || nb == 0.0d) Double.PositiveInfinity
    else round6(1.0d - dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private def litVec(v: Array[Float]): Column =
    array(v.toIndexedSeq.map(x => lit(x)): _*).cast("array<float>")

  /** MMR top-`k` over the `poolSize` nearest candidates to `query`.
    * Output: (rank, id, relevance, mmr), rank 1..k in selection order.
    * Fewer than `k` pool rows select them all. */
  def rerank(df: DataFrame, id: Column, emb: Column, query: Array[Float],
             k: Int, poolSize: Int, lambda: Double): DataFrame = {
    require(k > 0 && poolSize >= k, "need 0 < k <= poolSize")
    require(lambda >= 0.0d && lambda <= 1.0d, "lambda must be in [0, 1]")
    val pool = df
      .select(id.as("id"), emb.cast("array<float>").as("emb"))
      .withColumn("distance",
        round(VectorFunctions.cosineDistance(col("emb"), litVec(query)), 6) +
          lit(0.0d))
      .orderBy(col("distance"), col("id"))
      .limit(poolSize)
      // zero-norm convention (see scaladoc): +Inf distance -> rel 0.0,
      // keeping every MMR score finite for any lambda
      .select(col("id"), col("emb"),
        when(col("distance") === Double.PositiveInfinity, lit(0.0d))
          .otherwise(lit(1.0d) - col("distance")).as("rel"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val selected = greedySelect(pool.map(_._1).toIndexedSeq,
      pool.map(_._3), pool.map(_._2), k, lambda)
    val spark = df.sparkSession
    import spark.implicits._
    selected.map { case (i, score, r) =>
      (r, pool(i)._1, round6(pool(i)._3), round6(score))
    }.toDF("rank", "id", "relevance", "mmr")
  }

  /** The greedy MMR selection core over a bounded pool, shared by the
    * standalone operator and the engine facade (`searchMmr` — String
    * chunk ids there, Long ids here; tie-breaks use the id ORDERING, so
    * both engines' binary string compare agrees for ASCII ids).
    * Returns (pool index, unrounded score, rank) in selection order. */
  private[graft] def greedySelect[T](ids: IndexedSeq[T], rel: Array[Double],
      embs: Array[Array[Float]], k: Int, lambda: Double)
      (implicit ord: Ordering[T]): Seq[(Int, Double, Int)] = {
    val mu = 1.0d - lambda
    val n = ids.length
    val sim = Array.tabulate(n, n) { (i, j) =>
      if (i == j) Double.NaN
      else {
        val d = cosDist(embs(i), embs(j))
        // zero-norm convention: an undefined (infinite-distance) pair
        // contributes a NEUTRAL similarity, never an infinite penalty
        // credit (mu * -Inf would poison the scores with NaN at mu = 0
        // and +Inf rewards otherwise)
        if (d.isInfinite) 0.0d else 1.0d - d
      }
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val inSel = new Array[Boolean](n)
    while (selected.length < math.min(k, n)) {
      // The FIRST pick compares raw relevance, not lambda * rel: the two
      // are argmax-equivalent for lambda > 0, but at lambda = 0 every
      // lambda * rel ties at 0.0 and the id tie-break would win, while
      // the SQL twin's recursive base case (ORDER BY rel DESC, id) picks
      // top relevance — so pin top relevance on both engines. The
      // RECORDED score stays lambda * rel (penalty 0), matching the SQL
      // twin's output recomputation.
      val firstPick = selected.isEmpty
      var best = -1; var bestScore = 0.0d; var bestKey = 0.0d
      var i = 0
      while (i < n) {
        if (!inSel(i)) {
          var pen = 0.0d
          var first = true
          selected.foreach { case (s, _) =>
            val v = sim(i)(s)
            if (first || v > pen) { pen = v; first = false }
          }
          val score = lambda * rel(i) - mu * (if (first) 0.0d else pen)
          val key = if (firstPick) rel(i) else score
          // strict >: ties keep the candidate with the SMALLER id — the
          // pool is already (distance, id)-sorted but ids are re-compared
          // explicitly since rel order need not be id order
          if (best < 0 || key > bestKey ||
              (key == bestKey && ord.lt(ids(i), ids(best)))) {
            best = i; bestScore = score; bestKey = key
          }
        }
        i += 1
      }
      selected += ((best, bestScore))
      inSel(best) = true
    }
    selected.toSeq.zipWithIndex.map { case ((i, s), r) => (i, s, r + 1) }
  }

  /** Public rounding hook for facade output columns (the engine's
    * searchMmr rounds with the same semantics). */
  private[graft] def round6Out(x: Double): Double = round6(x)

  /** The decimal text of `1.0 - lambda` — what any SQL twin must embed
    * (see the object scaladoc). */
  def muSql(lambda: Double): String = (1.0d - lambda).toString
}
