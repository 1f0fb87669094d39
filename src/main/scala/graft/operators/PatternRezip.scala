package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Split-and-rezip decoding: replace every match of a one-capture
  * `pattern` in a string column with a COMPUTED replacement —
  * engine-portably. Spark has no regexp_replace with a computed
  * replacement, so the text splits on the pattern (limit -1 keeps
  * trailing empty segments) and re-concatenates segment/decoded pairs
  * left-to-right; per-row cost is O(text + matches), never
  * O(text × matches) (the segments materialize once in the split).
  * Shared by the HTML numeric-reference decode and the URL
  * percent-encoding canonicalization, so the two cannot drift in
  * shape. The twin generator mirrors it for DuckDB with all
  * arithmetic INLINE in the lambda (DuckDB forbids subqueries there).
  */
object PatternRezip {

  /** `decodeOne` receives the capture-group text of one match. A text
    * with no matches passes through untouched (and sequence(1, 0)
    * never materializes — Spark's sequence would run DESCENDING
    * there). */
  def rezip(c: Column, pattern: String, decodeOne: Column => Column): Column = {
    val parts = split(c, pattern, -1)
    val ents = regexp_extract_all(c, lit(pattern), lit(1))
    when(size(ents) === 0, c).otherwise(
      concat(element_at(parts, 1),
        aggregate(sequence(lit(1), size(ents)), lit(""), (acc, i) =>
          concat(acc, decodeOne(element_at(ents, i)),
            element_at(parts, i + 1)))))
  }

  /** DuckDB twin: `oneSql` maps a SQL expression for one capture text
    * to the SQL of its replacement (inline — no subqueries). */
  def rezipSql(x: String, pattern: String,
               oneSql: String => String): String = {
    val pat = "'" + pattern.replace("'", "''") + "'"
    s"""(SELECT CASE WHEN len(ents) = 0 THEN s ELSE
       |   parts[1] || list_reduce(list_prepend('',
       |     list_transform(range(1, len(ents) + 1), i ->
       |       ${oneSql("ents[i]")} || parts[i + 1])),
       |     (a, b) -> a || b) END
       | FROM (SELECT $x AS s, string_split_regex($x, $pat) AS parts,
       |              regexp_extract_all($x, $pat, 1) AS ents))""".stripMargin
  }
}
