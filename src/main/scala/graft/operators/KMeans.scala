package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared k-means machinery for the two codebook trainers (IVF coarse
  * centroids — `IvfIndex.train` — and per-subspace PQ codebooks —
  * `ProductQuantization.train`): a bounded deterministic sample draw plus
  * a seeded local k-means++/Lloyd fit.
  *
  * WHY sample-based: codebook quality saturates at a few hundred training
  * points per centroid (the published FAISS practice —
  * `max_points_per_centroid` defaults to 256; Jégou et al. TPAMI 2011
  * train PQ on subsamples), so full-corpus Lloyd sweeps only add cost:
  * one bounded collect replaces `iters` full-table aggregation jobs, the
  * driver data is O(sample x dim) at ANY corpus size, and the fit is
  * fully deterministic under any partitioning (java.util.Random's
  * specified LCG + fixed-order double accumulation), where distributed
  * mean aggregation leaves low bits to reduction order. */
private[graft] object KMeans {

  /** Ceiling on the local training sample (rows). 128k x dim 64 floats
    * is ~32 MB of driver data — the same budget class as the other
    * bounded collects (histograms, models). A centroid count whose
    * 256-per-centroid budget exceeds this trains distributed instead
    * (see IvfIndex.train). */
  val MaxLocalSample = 131072

  /** Deterministic bounded sample: the `n` rows with the smallest seeded
    * content hash. Partitioning-independent (the hash is of the VALUE),
    * one Spark job (TakeOrdered — each partition contributes at most n
    * rows), and duplicate vectors keep their natural weight, so heavy
    * values weight the k-means objective exactly as they should. */
  def sampleVectors(df: DataFrame, emb: Column, n: Int,
                    seed: Long): Array[Array[Float]] =
    df.select(emb.cast("array<float>").as("emb"))
      .withColumn("h", xxhash64(lit(seed), col("emb")))
      .orderBy(col("h"))
      .limit(n)
      .select("emb").collect().map(_.getSeq[Float](0).toArray)

  /** Seeded k-means++ init + Lloyd on an in-memory point set.
    * Deterministic: java.util.Random's fully-specified LCG, strict-<
    * argmin (smallest index wins ties — the NearestCellExpr convention),
    * double accumulation in index order. Returns fewer than k centers
    * when the points have fewer than k distinct values (k-means++
    * exhausts the positive-weight points); empty Lloyd cells keep their
    * previous center. */
  def fit(pts: Array[Array[Float]], k: Int, iters: Int,
          seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    val n = pts.length
    val dim = pts(0).length
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0d; var i = 0
      while (i < dim) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    // k-means++: next center drawn with probability proportional to the
    // squared distance to the nearest already-chosen center
    val centers = scala.collection.mutable.ArrayBuffer(pts(rng.nextInt(n)).clone())
    val minD = Array.fill(n)(Double.PositiveInfinity)
    var exhausted = false
    while (centers.length < k && !exhausted) {
      val last = centers.last
      var total = 0.0d
      var i = 0
      while (i < n) {
        val d = d2(pts(i), last)
        if (d < minD(i)) minD(i) = d
        total += minD(i); i += 1
      }
      if (total == 0.0d) exhausted = true // < k distinct points
      else {
        var r = rng.nextDouble() * total
        var j = 0
        while (j < n - 1 && r >= minD(j)) { r -= minD(j); j += 1 }
        // float-edge guard: never pick a zero-weight point (a duplicate
        // of an existing center); total > 0 guarantees a positive one
        while (minD(j) == 0.0d) j = (j + 1) % n
        centers += pts(j).clone()
      }
    }
    val kEff = centers.length
    val cents = centers.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(kEff, dim)(0.0d)
      val counts = new Array[Long](kEff)
      var i = 0
      while (i < n) {
        var best = Double.PositiveInfinity
        var bi = 0
        var c = 0
        while (c < kEff) {
          val d = d2(pts(i), cents(c))
          if (d < best) { best = d; bi = c }
          c += 1
        }
        val s = sums(bi)
        val p = pts(i)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(bi) += 1
        i += 1
      }
      var c = 0
      while (c < kEff) {
        if (counts(c) > 0)
          cents(c) = Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
        c += 1
      }
    }
    cents
  }
}
