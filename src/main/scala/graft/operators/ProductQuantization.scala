package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.operators.IvfIndex.Centroid

/** Product quantization (PQ) for embedding columns — the compression rung
  * past SQ8 on the ANN ladder (as published for FAISS's IndexPQ; Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): the vector is cut into `numSub` contiguous subvectors and
  * each is replaced by the id of its nearest per-subspace centroid —
  * storage is `numSub` small ints per vector (vs dim x 4 bytes float32;
  * at dim=64, M=8 that is a 32x reduction, vs SQ8's 4x).
  *
  * Everything reuses the machinery the engine already trusts:
  *   - TRAIN: one seeded `IvfIndex.train` k-means per subspace over the
  *     SLICED column (assignment projection + one K-group aggregate per
  *     sweep — no new iteration code);
  *   - ENCODE: one `NearestCellExpr` per subspace over `slice(emb, ...)`
  *     (fused codegen argmin, O(1) plan nodes per subspace), combined
  *     into a stored `pq_codes` array — ingest-time, like the SQ8 codes
  *     and the LSH bucket column;
  *   - SEARCH: asymmetric distance computation (ADC) — the query is NOT
  *     quantized: a driver-side lookup table lut[m][c] = ||q_m - C_m[c]||²
  *     (numSub x K doubles, plan literals) turns the approximate distance
  *     into `numSub` array lookups + adds per row, whole-stage codegen,
  *     scanning ONLY the codes column; the top-`rescore` survivors are
  *     rescored exactly against float32, top-k — the same two-phase shape
  *     as `Quantization.search`.
  *
  * EUCLIDEAN is the metric by construction: ADC sums per-subspace squared
  * L2 distances, which decompose over concatenated subvectors (cosine/dot
  * do not decompose against per-subspace codebooks without per-query
  * normalization terms; the reference metric set stays covered by the
  * flat/LSH/SQ8 paths). The approximate value omits the final sqrt —
  * monotonic, so the candidate ORDER is identical and the plan is
  * cheaper. All LUT arithmetic is double, accumulated ascending (i then
  * m), so a SQL oracle reproduces every approximate value bit-for-bit
  * and the candidate SET — not just the final distances — is gated.
  */
object ProductQuantization {

  /** model(m) = subspace m's K centroids (cid 0..K-1, each of dim/numSub). */
  type Model = Seq[Seq[Centroid]]

  private def litVec(v: Array[Float]): Column =
    array(v.toIndexedSeq.map(x => lit(x)): _*).cast("array<float>")

  /** Per-subspace codebook training: seeded k-means on each slice. Seeds
    * are decorrelated per subspace (seed + m) so identical subvector
    * distributions still draw different inits. */
  def train(df: DataFrame, emb: Column, dim: Int, numSub: Int, k: Int,
            iters: Int = 3, seed: Long = 42L): Model = {
    require(numSub > 0 && dim % numSub == 0,
      s"dim $dim must divide into numSub $numSub subspaces")
    val dsub = dim / numSub
    (0 until numSub).map { m =>
      IvfIndex.train(df, slice(emb, m * dsub + 1, dsub), c = k,
        iters = iters, seed = seed + m)
    }
  }

  /** The codes expression: element m = nearest centroid id of subvector
    * m (array<bigint>, one fused argmin kernel per subspace). */
  def codesColumn(emb: Column, model: Model): Column = {
    val dsub = model.head.head.vec.length
    array(model.zipWithIndex.map { case (cb, m) =>
      val sorted = cb.sortBy(_.id)
      VectorExpressions.nearestCell(slice(emb, m * dsub + 1, dsub),
        sorted.map(_.id).toArray, sorted.map(_.vec).toArray)
    }: _*)
  }

  /** Stored-codes column under the conventional `pq_codes` name. */
  def encode(df: DataFrame, emb: Column, model: Model): DataFrame =
    df.withColumn("pq_codes", codesColumn(emb, model))

  /** Driver-side twin of [[codesColumn]] for single-row adds — the same
    * per-subspace sqrt'd-distance argmin with strict < (smallest cid wins
    * ties) as the NearestCellExpr kernel, so a chunk added singly and one
    * ingested in bulk carry identical codes. */
  def encodeLocal(model: Model, v: Seq[Float]): Seq[Int] = {
    val dsub = model.head.head.vec.length
    model.zipWithIndex.map { case (cb, m) =>
      var best = Double.PositiveInfinity
      var bestId = 0L
      cb.sortBy(_.id).foreach { c =>
        var acc = 0.0d
        var i = 0
        while (i < dsub) {
          val d = v(m * dsub + i).toDouble - c.vec(i).toDouble
          acc += d * d
          i += 1
        }
        val dist = math.sqrt(acc)
        if (dist < best) { best = dist; bestId = c.id }
      }
      bestId.toInt
    }
  }

  /** ADC lookup table: lut(m)(c) = squared L2 distance of query subvector
    * m to centroid c of subspace m — double accumulation ascending i,
    * the exact arithmetic any SQL oracle replays. */
  def adcLut(model: Model, query: Array[Float]): Array[Array[Double]] = {
    val dsub = model.head.head.vec.length
    require(query.length == dsub * model.length,
      s"query dimension ${query.length} != ${dsub * model.length}")
    model.zipWithIndex.map { case (cb, m) =>
      cb.sortBy(_.id).map { c =>
        var acc = 0.0d
        var i = 0
        while (i < dsub) {
          val d = query(m * dsub + i).toDouble - c.vec(i).toDouble
          acc += d * d
          i += 1
        }
        acc
      }.toArray
    }.toArray
  }

  /** Two-phase ADC search over a table with STORED `pq_codes`: phase 1
    * scans ONLY the codes (numSub lookups + adds per row, codegen'd; at
    * scale that is numSub bytes-ish per row instead of dim x 4), phase 2
    * rescores the `rescore` survivors exactly (euclidean, rounded like
    * every other search path). Output: (idCol, distance). */
  def search(encoded: DataFrame, embCol: String, idCol: String,
             model: Model, query: Array[Float], k: Int,
             rescore: Int, codesCol: String = "pq_codes"): DataFrame = {
    require(k > 0 && rescore >= k, "need k > 0 and rescore >= k")
    val lut = adcLut(model, query)
    // sum over subspaces, ascending m, left-associated — the oracle's
    // explicit + chain adds in the same order
    val approx = lut.zipWithIndex.map { case (l, m) =>
      element_at(array(l.toIndexedSeq.map(lit): _*),
        col(codesCol).getItem(m).cast("int") + lit(1))
    }.reduce(_ + _)
    val candidates = encoded
      .select(col(idCol), col(codesCol))
      .withColumn("approx", approx)
      .orderBy(col("approx"), col(idCol))
      .limit(rescore)
      .select(col(idCol))
    encoded.join(broadcast(candidates), Seq(idCol), "left_semi")
      .withColumn("distance",
        round(graft.functions.VectorFunctions.distance("euclidean")(
          col(embCol), litVec(query)), 6) + lit(0.0d))
      .select(col(idCol), col("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
