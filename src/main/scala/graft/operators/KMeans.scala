package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex.Centroid

/** Shared k-means machinery for the two codebook trainers (IVF coarse
  * centroids — `IvfIndex.train` — and per-subspace PQ codebooks —
  * `ProductQuantization.train`): a bounded deterministic weighted sample
  * draw plus a seeded local k-means++/Lloyd fit.
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

  /** Ceiling on the local training sample (distinct rows). 128k x dim 64
    * floats is ~32 MB of driver data — the same budget class as the
    * other bounded collects (histograms, models). A centroid count whose
    * 256-per-centroid budget exceeds this trains distributed instead
    * (see IvfIndex.train / ProductQuantization.train — neither clamps
    * silently). */
  val MaxLocalSample = 131072

  /** Deterministic bounded WEIGHTED sample: the `n` DISTINCT values with
    * the smallest seeded content hash, each carrying its exact duplicate
    * count as weight. Distinct-first matters: hashing raw rows would
    * include duplicate values as all-or-nothing hash-adjacent groups, so
    * a handful of heavily duplicated vectors (a zero-vector from a failed
    * embedder, a default "empty document" embedding) could monopolize the
    * whole sample and collapse the codebook. Sampling the distinct table
    * guarantees up to `n` distinct training points whatever the skew,
    * while the weights keep duplicates' exact pull on the k-means
    * objective. Partitioning-independent (the hash is of the VALUE), one
    * Spark job: partial-agg'd groupBy(value) then TakeOrdered(n) on the
    * hash. */
  def sampleWeighted(df: DataFrame, emb: Column, n: Int,
                     seed: Long): (Array[Array[Float]], Array[Long]) = {
    val rows = df.select(emb.cast("array<float>").as("emb"))
      .groupBy("emb").agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(lit(seed), col("emb")))
      .orderBy(col("h"))
      .limit(n)
      .select("emb", "w").collect()
    (rows.map(_.getSeq[Float](0).toArray), rows.map(_.getLong(1)))
  }

  /** Seeded weighted k-means++ init + Lloyd on an in-memory point set.
    * Deterministic: java.util.Random's fully-specified LCG, strict-<
    * argmin (smallest index wins ties — the NearestCellExpr convention),
    * double accumulation in index order. Returns fewer than k centers
    * when there are fewer than k distinct points (k-means++ exhausts the
    * positive-weight mass); empty Lloyd cells keep their previous
    * center. Lloyd stops early once assignments stabilize (means are
    * then a fixed point), so a generous `iters` costs only what
    * convergence needs. */
  def fit(pts: Array[Array[Float]], weights: Array[Long], k: Int,
          iters: Int, seed: Long): Array[Array[Float]] = {
    require(pts.length == weights.length && pts.nonEmpty,
      "need non-empty points with one weight each")
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
    // weighted k-means++: first center by weight, each next drawn with
    // probability proportional to weight x squared distance to the
    // nearest already-chosen center
    val totalW = weights.map(_.toDouble).sum
    val first = {
      var r = rng.nextDouble() * totalW
      var j = 0
      while (j < n - 1 && r >= weights(j)) { r -= weights(j); j += 1 }
      j
    }
    val centers = scala.collection.mutable.ArrayBuffer(pts(first).clone())
    val minD = Array.fill(n)(Double.PositiveInfinity)
    var exhausted = false
    while (centers.length < k && !exhausted) {
      val last = centers.last
      var total = 0.0d
      var i = 0
      while (i < n) {
        val d = d2(pts(i), last)
        if (d < minD(i)) minD(i) = d
        total += weights(i) * minD(i); i += 1
      }
      if (total == 0.0d) exhausted = true // < k distinct points
      else {
        var r = rng.nextDouble() * total
        var j = 0
        while (j < n - 1 && r >= weights(j) * minD(j)) {
          r -= weights(j) * minD(j); j += 1
        }
        // float-edge guard: never pick a zero-weight point (a duplicate
        // of an existing center); total > 0 guarantees a positive one
        while (minD(j) == 0.0d) j = (j + 1) % n
        centers += pts(j).clone()
      }
    }
    val kEff = centers.length
    val cents = centers.toArray
    val assign = Array.fill(n)(-1)
    var pass = 0
    var changed = true
    while (pass < iters && changed) {
      changed = false
      val sums = Array.fill(kEff, dim)(0.0d)
      val counts = new Array[Double](kEff)
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
        if (assign(i) != bi) { assign(i) = bi; changed = true }
        val s = sums(bi)
        val p = pts(i)
        val w = weights(i).toDouble
        var j = 0
        while (j < dim) { s(j) += w * p(j); j += 1 }
        counts(bi) += w
        i += 1
      }
      if (changed) {
        var c = 0
        while (c < kEff) {
          if (counts(c) > 0)
            cents(c) = Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
          c += 1
        }
      }
      pass += 1
    }
    cents
  }

  /** Weighted quantization error — the Lloyd objective the fit minimizes:
    * sum_i w_i * min_c ||p_i - c||². The comparable across restarts. */
  def quantizationError(pts: Array[Array[Float]], weights: Array[Long],
                        cents: Array[Array[Float]]): Double = {
    var acc = 0.0d
    var i = 0
    while (i < pts.length) {
      val p = pts(i)
      var best = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val ct = cents(c)
        var d = 0.0d
        var j = 0
        while (j < p.length) {
          val x = p(j).toDouble - ct(j).toDouble; d += x * x; j += 1
        }
        if (d < best) best = d
        c += 1
      }
      acc += weights(i) * best
      i += 1
    }
    acc
  }

  /** Default restart count for a COARSE quantizer fit (IvfIndex.train).
    * k-means++ is seed-sensitive: a single unlucky seed placement was
    * measured to move narrow-probe recall 0.48 -> 0.60 on the same data
    * (SCALING.md telemetry), and with few centroids one fit is cheap —
    * N tries over the same bounded sample cost N x driver CPU, zero new
    * Spark jobs. The window is sized from a measured 16-seed scan at
    * sf0.1 (c=8): per-seed quantization error spans only ±0.1% (the
    * "equally-converged optima" the round-11 telemetry described), the
    * QE minimum of the scan lands at offset 11 and no later seed beats
    * it — 12 restarts reach that minimum, 8 stop short of it. Selection
    * is by the Lloyd objective itself, never by downstream recall.
    * Per-subspace PQ codebook training keeps restarts = 1: it runs
    * numSub independent fits already (seed variance averages out across
    * subspaces) and K=256 makes each fit ~50x the coarse one. */
  val DefaultRestarts = 12

  /** Best-of-N seeding: `restarts` independent k-means++/Lloyd fits over
    * the SAME sample under derived seeds (seed, seed+1, ...), keeping the
    * lowest weighted quantization error; strict < keeps the EARLIEST on
    * ties, so the result is deterministic and `restarts = 1` is exactly
    * `fit(..., seed)`. */
  def fitBest(pts: Array[Array[Float]], weights: Array[Long], k: Int,
              iters: Int, seed: Long, restarts: Int): Array[Array[Float]] = {
    require(restarts >= 1, "need restarts >= 1")
    var best: Array[Array[Float]] = null
    var bestErr = Double.PositiveInfinity
    var r = 0
    while (r < restarts) {
      val cents = fit(pts, weights, k, iters, seed + r)
      val err = quantizationError(pts, weights, cents)
      if (best == null || err < bestErr) { best = cents; bestErr = err }
      r += 1
    }
    best
  }

  /** `fitBest` wrapped into the index-ordered `Centroid` form every
    * install site requires (ids exactly 0..kEff-1 — the invariant
    * `setPqCodebooks`/`setIvfCentroids` validate) — ONE home for the
    * wrapping instead of each caller re-implementing it. */
  def fitCentroids(pts: Array[Array[Float]], weights: Array[Long], k: Int,
                   iters: Int, seed: Long, restarts: Int = 1): Seq[Centroid] =
    fitBest(pts, weights, k, iters, seed, restarts)
      .zipWithIndex.map { case (v, i) => Centroid(i.toLong, v) }.toSeq
}
