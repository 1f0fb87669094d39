package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the front door of a crawl-to-training-set
  * pipeline (the engine's other text operators start from clean text;
  * real corpora start from crawled markup). Deterministic and
  * dependency-free: a fixed, ORDERED sequence of regex stages plus a
  * named-entity core set, every construct meaning the same thing to
  * Java regex (Spark) and RE2 (DuckDB) — no lookaround, no
  * backreferences — so a SQL oracle replays the extraction
  * byte-for-byte ([[extractSql]] GENERATES the DuckDB twin from the
  * same stage constants; the two cannot drift).
  *
  * Contract (and its documented limits):
  *   1. script / style elements vanish with their content; comments
  *      vanish.
  *   2. Block-level tags (p, div, br, headings, list items, table
  *      cells, …) become newlines — the paragraph structure chunkers
  *      key on; every other tag is stripped inline.
  *   3. The named core entities (&amp; &lt; &gt; &quot; &apos;
  *      &nbsp;) decode, ampersand LAST so double-encoded text
  *      single-decodes (`&amp;lt;` → `&lt;`, never `<`). Numeric
  *      entities pass through as literal text.
  *   4. Whitespace normalizes: space/tab/CR runs collapse to one
  *      space, spaces around newlines trim, newline runs collapse,
  *      edges trim.
  *
  * Regex-based extraction cannot parse pathological markup (a quoted
  * `>` inside an attribute value ends the tag early); that is the
  * standard trade for an engine-portable, oracle-replayable contract.
  * Scale shape: a pure projection (a chain of codegen'd regexp_replace
  * nodes), zero shuffles — extracting 100 TB of HTML costs one scan.
  */
object HtmlExtract {

  private val BlockTags =
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|blockquote|" +
      "section|article|header|footer|main|nav|aside|pre|title|form|hr"

  /** A tag NAME must end here: '>' immediately, or an attribute/self-
    * close section opened by whitespace or '/'. Without this anchor the
    * block alternation would PREFIX-match unrelated tags ('<progress>'
    * matching block tag 'p' and injecting a paragraph break
    * mid-sentence). Explicit whitespace chars, not \s — Java and RE2
    * disagree on \s. */
  private val TagEnd = "(>|[ \\t\\n\\r/][^>]*>)"

  /** Ordered regex stages (pattern, replacement). Replacements are
    * limited to "", " ", "\n" so the SQL generator can map them. */
  val Stages: Seq[(String, String)] = Seq(
    (s"(?is)<script$TagEnd.*?</script>", " "),
    (s"(?is)<style$TagEnd.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    (s"(?i)</?($BlockTags)$TagEnd", "\n"),
    ("<[^>]*>", ""),
  )

  /** Ordered literal entity decodes; `&amp;` LAST (single-decode). */
  val Entities: Seq[(String, String)] = Seq(
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&apos;", "'"),
    ("&amp;", "&"),
  )

  /** Ordered whitespace-normalization stages (after entity decode, so a
    * decoded &nbsp; collapses like any space). */
  val WsStages: Seq[(String, String)] = Seq(
    ("[ \\t\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n+", "\n"),
    ("^[ \\n]+|[ \\n]+$", ""),
  )

  /** The extraction as one Column — a chain of codegen regexp_replace /
    * replace nodes over the stage constants above. */
  def extract(html: Column): Column = {
    val stripped = Stages.foldLeft(html) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val decoded = Entities.foldLeft(stripped) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    WsStages.foldLeft(decoded) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def sqlRepl(s: String): String = s match {
    case "\n" => "chr(10)"
    case other => sqlLit(other)
  }

  /** DuckDB twin, GENERATED from the same constants: nested
    * regexp_replace(..., 'g') / replace calls around `column`. */
  def extractSql(column: String): String = {
    val stripped = Stages.foldLeft(column) { case (x, (pat, repl)) =>
      s"regexp_replace($x, ${sqlLit(pat)}, ${sqlRepl(repl)}, 'g')"
    }
    val decoded = Entities.foldLeft(stripped) { case (x, (from, to)) =>
      s"replace($x, ${sqlLit(from)}, ${sqlRepl(to)})"
    }
    WsStages.foldLeft(decoded) { case (x, (pat, repl)) =>
      s"regexp_replace($x, ${sqlLit(pat)}, ${sqlRepl(repl)}, 'g')"
    }
  }
}
