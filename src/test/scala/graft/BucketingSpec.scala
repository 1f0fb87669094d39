package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the zero-shuffle repeated-join shape at
  * scale: two tables bucketed by the join key into the same bucket count
  * hash-partition identically ON DISK, so every equi-join between them
  * needs NO Exchange on either side (only per-bucket sorts). This is the
  * storage layout the engine's chunks table would use on a cluster for
  * repeated chunk↔embedding-feature joins (SCALING.md "Knobs at real
  * scale"); local[32] proves the plan property, which is
  * scale-independent. */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("join of two tables bucketed on the key runs with ZERO exchanges") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and the session is shared across suites.
    // The in-memory catalog forgets tables across JVMs but the warehouse
    // DIRECTORIES persist: remove both, or create fails on the leftovers.
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete(); ()
    }
    Seq("b_vectors", "b_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.select("vec_id", "embedding").write
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("b_vectors")
    emb.select(col("vec_id"), col("label")).write
      .bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("b_meta")
    // disable broadcast: at real scale neither side fits in a broadcast,
    // and the property under test is the SHUFFLE-FREE sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_vectors")
        .join(spark.table("b_meta"), "vec_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == emb.count())
      // the same join WITHOUT bucketing shuffles both sides — the
      // contrast that makes the property meaningful
      val unbucketed = emb.select("vec_id", "embedding")
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_vectors")
      spark.sql("DROP TABLE IF EXISTS b_meta")
    }
  }
}
