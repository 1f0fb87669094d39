package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF-style approximate nearest-neighbor search: vectors are assigned to
  * the cell of their nearest centroid; a query probes only the `nprobe`
  * nearest cells. The scale path beyond LSH for embedding search.
  *
  * Centroids are index metadata (tiny: C x dim), so cell assignment is a
  * PURE PROJECTION — `least()` over C (distance, id) structs inlined as
  * literals — no join, no shuffle, fully inside whole-stage codegen. At
  * 100 TB the cell is computed once at ingest, stored, and the table is
  * partitioned by it, making a probe a partition-pruned scan of
  * nprobe/C of the data; here it is computed inline and filtered.
  *
  * Centroid selection here is a deterministic id-based sample; at scale
  * substitute a k-means pass — the search operator is unchanged.
  */
object IvfIndex {

  final case class Centroid(id: Long, vec: Array[Float])

  private def litVec(v: Array[Float]): Column =
    array(v.toIndexedSeq.map(x => lit(x)): _*).cast("array<float>")

  /** Cell id = argmin over centroids of euclidean distance, ties broken by
    * centroid id (struct comparison is lexicographic on (distance, id)). */
  def cellColumn(v: Column, centroids: Seq[Centroid]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val structs = centroids.map(c =>
      struct(euclideanDistance(v, litVec(c.vec)).as("d"), lit(c.id).as("cid")))
    val best =
      if (structs.size == 1) structs.head else least(structs: _*)
    best.getField("cid")
  }

  /** Driver-side twin of the cell assignment for the query vector: the
    * same left-to-right double accumulation as the Column kernel. */
  def nearestCentroids(q: Array[Float], centroids: Seq[Centroid],
                       nprobe: Int): Seq[Long] = {
    def dist(c: Array[Float]): Double = {
      var acc = 0.0d; var i = 0
      while (i < c.length) {
        val d = q(i).toDouble - c(i).toDouble; acc += d * d; i += 1
      }
      math.sqrt(acc)
    }
    centroids.map(c => (dist(c.vec), c.id)).sorted.take(nprobe).map(_._2)
  }

  /** Probe-limited top-k: assign cells inline, keep only the probed
    * cells, score with `metric`, take k. Output: (idCol, distance). */
  def search(df: DataFrame, embCol: String, idCol: String,
             centroids: Seq[Centroid], query: Array[Float],
             nprobe: Int, metric: String, k: Int): DataFrame = {
    val probed = nearestCentroids(query, centroids, nprobe)
    df.withColumn("cell", cellColumn(col(embCol), centroids))
      .where(col("cell").isin(probed: _*))
      .withColumn("distance",
        round(distance(metric)(col(embCol), litVec(query)), 6) + lit(0.0d))
      .select(col(idCol), col("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
