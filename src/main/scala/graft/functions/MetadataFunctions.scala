package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed metadata map — the reference's `Metadata = Dict[str, str|int|float|bool]`
  * with TYPED equality (reference: vector_db/entities.py:9-10,
  * vector_db/vector_store.py:261-265 — `1` must NOT match `"1"`).
  *
  * Encoding decision (SURVEY.md §7.4 item 3): `MAP<STRING,STRING>` whose
  * values carry a one-letter type prefix — `"s:…"`, `"i:…"`, `"f:…"`,
  * `"b:…"`. Equality on the encoded value is then typed equality: the
  * int 1 encodes to `"i:1"` and the string "1" to `"s:1"`, which never
  * collide. A plain MAP<STRING,STRING> without the prefix would erase the
  * type and make `1 == "1"` — the exact trap the reference's typed filter
  * avoids.
  */
object MetadataFunctions {

  /** Canonical typed encoding of a metadata value (driver-side literal). */
  def encodeValue(v: Any): String = v match {
    case s: String  => "s:" + s
    case b: Boolean => "b:" + b
    case i: Int     => "i:" + i
    case l: Long    => "i:" + l
    case f: Float   => "f:" + f.toDouble
    case d: Double  => "f:" + d
    case other =>
      throw new IllegalArgumentException(
        s"unsupported metadata value type: ${other.getClass.getName}")
  }

  /** Column-side typed encoding for building metadata maps from typed
    * columns: prefix an int/long column with "i:", etc. */
  def encodeIntCol(c: Column): Column = concat(lit("i:"), c.cast("long"))
  def encodeStrCol(c: Column): Column = concat(lit("s:"), c)
  def encodeBoolCol(c: Column): Column = concat(lit("b:"), c.cast("boolean"))
  def encodeFloatCol(c: Column): Column = concat(lit("f:"), c.cast("double"))

  /** One typed equality: `metadata[key] == value` with the value's runtime
    * type respected (reference: vector_store.py:261-265). */
  def typedEquals(meta: Column, key: String, value: Any): Column =
    meta(key) === lit(encodeValue(value))

  /** Conjunctive filter: every (k, v) must match — the reference applies
    * the whole filter map before any distance work
    * (vector_store.py:250-258). Empty filter = match everything. */
  def filterPredicate(meta: Column, filters: Map[String, Any]): Column =
    if (filters.isEmpty) lit(true)
    else filters.map { case (k, v) => typedEquals(meta, k, v) }.reduce(_ && _)
}
