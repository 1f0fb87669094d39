package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embedding generator — the honest-recall
  * fixture: the driver testdata's near-uniform vectors make every ANN
  * telemetry number optimistic-looking-but-uninformative (SCALING.md
  * concedes LSH's low recall there "says little"), while real embedding
  * spaces are strongly clustered. A mixture of Gaussians is the
  * standard synthetic stand-in: `clusters` centers drawn uniform in
  * [-1, 1]^dim, each point = its center + sigma * N(0, 1) noise.
  *
  * Everything derives from xxhash64 column arithmetic (uniforms) and a
  * Box-Muller transform (normals) — pure deterministic projection, no
  * RNG state, identical on every run/partitioning, generated
  * distributedly at any row count. */
object SyntheticEmbeddings {

  /** (vec_id, embedding float[dim]) with vec_id in [0, n); cluster of a
    * point is vec_id % clusters. */
  def clustered(spark: SparkSession, n: Long, dim: Int, clusters: Int,
                sigma: Double = 0.15, seed: Long = 42L): DataFrame = {
    require(n > 0 && dim > 0 && clusters > 0 && sigma >= 0.0)
    val cluster = col("vec_id") % clusters
    // uniform in (0, 1]: never 0, so ln() below is finite
    def u(tag: Int, i: Column): Column =
      (pmod(xxhash64(lit(seed), lit(tag), col("vec_id"), i), lit(1000000L))
        .cast("double") + 1.0) / 1000000.0
    // center component: uniform [-1, 1] per (cluster, dimension)
    def center(i: Column): Column =
      pmod(xxhash64(lit(seed), lit(99), cluster, i), lit(2001L))
        .cast("double") / 1000.0 - 1.0
    // Box-Muller: N(0,1) from two uniforms
    def normal(i: Column): Column =
      sqrt(lit(-2.0) * log(u(1, i))) * cos(lit(2.0 * math.Pi) * u(2, i))
    spark.range(n).select(col("id").as("vec_id"))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          i => (center(i) + lit(sigma) * normal(i)).cast("float"))
          .as("embedding"))
  }
}
