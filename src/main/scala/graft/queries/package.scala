package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: (session, sf-dir) => result DataFrame. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** Load one driver-generated test table (TESTDATA.md). */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** A named query together with its DuckDB oracle SQL (None => the driver
    * records a weaker rows-only check). */
  final case class Q(name: String, fn: QueryFn, oracle: Option[String])
}
