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
  *   3. The named entities decode — the XML core set (&amp; &lt;
  *      &gt; &quot; &apos; &nbsp;) plus the HTML4 typography/symbol
  *      names real crawls hit constantly ([[Entities]]) — ampersand
  *      LAST so double-encoded text single-decodes (`&amp;lt;` →
  *      `&lt;`, never `<`). NUMERIC
  *      character references (`&#39;` decimal, `&#x27;` hex) decode
  *      to their Unicode code point over the full plane minus the
  *      invalid range (0, surrogates D800-DFFF, > 10FFFF — those pass
  *      through as literal text), BETWEEN the named decodes and the
  *      final `&amp;` pass, so double-encoded `&amp;#39;`
  *      single-decodes to `&#39;`, never `'`. Residual edge, out of
  *      contract: a numeric AMPERSAND immediately followed by a
  *      decodable entity tail (`&#38;lt;`) re-decodes — no pairwise
  *      replace order can fix that; it needs a single-pass tokenizer.
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

  /** Named entity decodes BEFORE the numeric pass; `&amp;` runs in
    * [[AmpEntity]] AFTER it (single-decode: `&amp;#39;` must reach the
    * numeric pass still spelled `&amp;#39;`, which the numeric pattern
    * does not match). Beyond the XML core set, the list carries the
    * typography/symbol entities ubiquitous in real crawl data (HTML4
    * names; each is one literal replace node — scan-shaped however
    * many). Names are case-sensitive, as in the HTML spec's table. */
  val Entities: Seq[(String, String)] = Seq(
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&apos;", "'"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&hellip;", "…"),
    ("&bull;", "•"),
    ("&middot;", "·"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&deg;", "°"),
    ("&plusmn;", "±"),
    ("&times;", "×"),
    ("&divide;", "÷"),
    ("&laquo;", "«"),
    ("&raquo;", "»"),
    ("&sect;", "§"),
    ("&para;", "¶"),
    ("&euro;", "€"),
    ("&pound;", "£"),
    ("&yen;", "¥"),
    ("&cent;", "¢"),
    // soft hyphen: an invisible line-break HINT, not content — dropped
    // so it cannot split tokens/shingles downstream
    ("&shy;", ""),
  )

  /** The LAST entity pass (see [[Entities]]). */
  val AmpEntity: (String, String) = ("&amp;", "&")

  /** Numeric character reference: decimal (`&#8212;`) or hex
    * (`&#x27;`, either case marker). Digit counts are BOUNDED so the
    * captured value always fits a long with headroom; longer digit
    * runs simply do not match and pass through as text. The capture
    * keeps the x-marker so the decoder can tell the bases apart and
    * can reconstruct the original text for invalid code points. */
  val NumEntityPattern = "&#([0-9]{1,8}|[xX][0-9a-fA-F]{1,7});"

  /** Ordered whitespace-normalization stages (after entity decode, so a
    * decoded &nbsp; collapses like any space). */
  val WsStages: Seq[(String, String)] = Seq(
    ("[ \\t\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n+", "\n"),
    ("^[ \\n]+|[ \\n]+$", ""),
  )

  /** One decoded numeric reference: `g` is the capture of
    * [[NumEntityPattern]] ("8212" or "x27"/"X27"). Valid code points
    * (1..10FFFF minus the surrogate block) become their character via
    * a 4-byte big-endian UTF-32 decode (Spark has no code-point chr;
    * DuckDB's twin uses chr directly — same code point, same string);
    * anything else reconstructs the original entity text. */
  private def decodeOneNumeric(g: Column): Column = {
    val isHex = lower(substring(g, 1, 1)) === "x"
    val code = when(isHex, conv(substring(g, 2, 7), 16, 10).cast("long"))
      .otherwise(g.cast("long"))
    val valid = code.between(1L, 0x10FFFFL) && !code.between(0xD800L, 0xDFFFL)
    when(valid, decode(unhex(lpad(hex(code), 8, "0")), "UTF-32"))
      .otherwise(concat(lit("&#"), g, lit(";")))
  }

  /** Decode every numeric character reference in `c` — the
    * [[PatternRezip]] split-and-rezip shape. */
  def decodeNumericEntities(c: Column): Column =
    PatternRezip.rezip(c, NumEntityPattern, decodeOneNumeric)

  /** The extraction as one Column — a chain of codegen regexp_replace /
    * replace nodes over the stage constants above. */
  def extract(html: Column): Column = {
    val stripped = Stages.foldLeft(html) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val named = Entities.foldLeft(stripped) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    val decoded = replace(decodeNumericEntities(named),
      lit(AmpEntity._1), lit(AmpEntity._2))
    WsStages.foldLeft(decoded) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def sqlRepl(s: String): String = s match {
    case "\n" => "chr(10)"
    case other => sqlLit(other)
  }

  /** DuckDB twin of [[decodeNumericEntities]], generated from the same
    * pattern constant: split/extract on the pattern, left-to-right
    * re-zip via a string list_reduce, hex parsed with DuckDB's
    * '0x'-prefixed cast, chr() for the code point (same character the
    * Spark side's UTF-32 decode yields). */
  private def decodeNumericSql(x: String): String = {
    // code-point arithmetic INLINE per use (PatternRezip's lambda
    // cannot hold subqueries in DuckDB)
    def cp(e: String) = s"(CASE WHEN lower($e[1:1]) = 'x'" +
      s" THEN ('0x' || $e[2:])::BIGINT ELSE $e::BIGINT END)"
    def one(e: String) =
      s"(CASE WHEN ${cp(e)} BETWEEN 1 AND 1114111" +
        s" AND ${cp(e)} NOT BETWEEN 55296 AND 57343" +
        s" THEN chr(${cp(e)}::INT) ELSE '&#' || $e || ';' END)"
    PatternRezip.rezipSql(x, NumEntityPattern, one)
  }

  /** DuckDB twin, GENERATED from the same constants: nested
    * regexp_replace(..., 'g') / replace calls around `column`, with
    * the numeric-reference pass between the named decodes and the
    * final `&amp;` replace — the exact stage order of [[extract]]. */
  def extractSql(column: String): String = {
    val stripped = Stages.foldLeft(column) { case (x, (pat, repl)) =>
      s"regexp_replace($x, ${sqlLit(pat)}, ${sqlRepl(repl)}, 'g')"
    }
    val named = Entities.foldLeft(stripped) { case (x, (from, to)) =>
      s"replace($x, ${sqlLit(from)}, ${sqlRepl(to)})"
    }
    val decoded = s"replace(${decodeNumericSql(named)}, " +
      s"${sqlLit(AmpEntity._1)}, ${sqlLit(AmpEntity._2)})"
    WsStages.foldLeft(decoded) { case (x, (pat, repl)) =>
      s"regexp_replace($x, ${sqlLit(pat)}, ${sqlRepl(repl)}, 'g')"
    }
  }
}
