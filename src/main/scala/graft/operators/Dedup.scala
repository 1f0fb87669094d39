package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants follow the same scale discipline: never compare documents
  * pairwise across the whole corpus — reduce each document to a small key
  * (digest / band hash / bucket), shuffle once on that key, and only
  * compare within buckets.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content digest with the
    * surviving id (min) and the multiplicity. Single hash shuffle. */
  def exactGroups(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content).as("text_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the min-id row per distinct content. Implemented as
    * groups -> semi join back on the keeper id (two stages, both hash
    * shuffles on small keys — no row data moves twice). */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame = {
    val keepers = exactGroups(df, content, id).select(col("keep_id"))
    df.join(keepers, id === col("keep_id"), "left_semi")
  }
}
