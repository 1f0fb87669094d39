package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with `right.ts <= left.ts` within the same key (the standard
  * enrich-with-latest-state operator; Spark has no native ASOF JOIN).
  *
  * NOT implemented as a range join: a `l.ts >= r.ts` theta-join explodes
  * to O(|L|·|R|) per key before aggregation, and Spark plans it as a
  * nested-loop. Instead the two sides are UNION'd, hash-partitioned by
  * key, sorted by (ts, side), and the latest right payload is carried
  * forward with `last(_, ignoreNulls)` over a running frame — ONE shuffle
  * whose size is |L| + |R| rows, no pair blowup, scaling with key
  * cardinality exactly like a windowed aggregate. Right rows sort before
  * left rows at equal ts, so a right row AT the left timestamp matches
  * (`>=` semantics, same as SQL `ASOF JOIN ... ON l.ts >= r.ts`).
  *
  * Determinism contract: the right side must be unique per (key, ts) —
  * pre-aggregate ties upstream (e.g. keep max id) or the carried row
  * among equal timestamps is partition-order-dependent.
  */
object AsOfJoin {

  /** Left-join semantics: every left row survives; the attached columns
    * (payloadCols, each renamed `prefix + name`) are null when no right
    * row precedes it. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               payloadCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val rightSide = right.select(
      col(keyCol).as("__key"), col(rightTsCol).as("__ts"), lit(0).as("__tag"),
      struct(payloadCols.map(col): _*).as("__payload"))
    val payloadType = rightSide.schema("__payload").dataType
    val leftRowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val leftSide = left.select(
      col(keyCol).as("__key"), col(leftTsCol).as("__ts"), lit(1).as("__tag"),
      lit(null).cast(payloadType).as("__payload"),
      struct(left.columns.map(col): _*).as("__row"))
    val unioned = rightSide
      .withColumn("__row", lit(null).cast(leftRowType))
      .unionByName(leftSide)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    out.select(col("__row.*") +:
      payloadCols.map(c => col(s"__carried.$c").as(prefix + c)): _*)
  }
}
