package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are declared per domain under graft.queries; each carries its
  * DuckDB oracle SQL. Coverage of SURVEY.md §2 is tracked in the domain
  * files' scaladoc.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    VectorSearchQueries.all ++
      LshQueries.all ++
      AnnQueries.all ++
      MetadataQueries.all ++
      EngineQueries.all ++
      ImportQueries.all ++
      RelationalQueries.all ++
      DedupQueries.all ++
      TextQueries.all ++
      MultimodalQueries.all ++
      PipelineQueries.all ++
      WebQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's core operation — k-NN cosine search (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_flat_cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
