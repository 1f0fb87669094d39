package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-loop twins of the NearDup shingle/hash kernels as Catalyst
  * expressions. The Column compositions (`transform`/`aggregate` over
  * `md5`/`conv`) are semantically identical but run interpreted with one
  * boxed expression-tree walk PER SHINGLE; these run one JIT-compiled
  * Scala loop per row (CodegenFallback — the row-level virtual call is
  * noise next to the per-element interpretation it replaces).
  *
  * Hash contract (shared with the DuckDB oracle, see DedupQueries):
  *   base hash   = first 15 hex chars of md5("0:" + shingle) as a long
  *   minhash_i   = min over shingles of (a_i * (h mod 2^30) + b_i) mod p
  *   simhash bit j = sign of sum of +-1 votes from bit j of each h
  */
object TextHash {

  /** First 60 bits of md5(prefix + s): identical to
    * conv(substring(md5(concat(seed, ':', s)), 1, 15), 16, 10). */
  private[functions] def md5Prefix60(digest: java.security.MessageDigest,
                                     s: String): Long = {
    digest.reset()
    val b = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Pinned whitespace class — the SAME explicit code-point set in Java
    * regex here, Spark `split` (TextChunker), and RE2/DuckDB oracle SQL
    * ([[graft.queries.TextQueries.wsClassSql]]): ASCII \t \n \x0B \f \r
    * space, NEL (U+0085), the Zs category frozen as an explicit list
    * (NBSP, OGHAM, U+2000..200A, NNBSP, MMSP, IDEOGRAPHIC SPACE), and
    * the Zl/Zp separators U+2028/U+2029. Explicit because the engines'
    * `\s` classes genuinely differ (Java \s has \x0B, RE2 \s does not;
    * neither matches Unicode spaces) — an implicit class is exactly the
    * kind of silent cross-engine drift this contract exists to kill. */
  val WsClassJava: String =
    "[\\t\\n\\u000B\\f\\r \\u0085\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"

  private val WsPattern = java.util.regex.Pattern.compile(WsClassJava + "+")

  /** Three code points whose Unicode-13 simple lowercase mappings (Java
    * 17) are unknown to the oracle engine's utf8proc (DuckDB `lower`
    * leaves them unchanged) — pinned to the ORACLE's behavior, identity,
    * because an empirical full-plane diff showed these are the ONLY
    * divergent points between Character.toLowerCase and DuckDB lower
    * across U+0020..U+2FFFF: the medievalist letters U+A7C7 / U+A7C9 /
    * U+A7F5 added in Unicode 12.1/13. */
  private def pinnedLowerCp(cp: Int): Int =
    if (cp == 0xA7C7 || cp == 0xA7C9 || cp == 0xA7F5) cp
    else Character.toLowerCase(cp)

  /** NFC-normalize + per-code-point simple lowercase — the pinned
    * Unicode case contract, byte-identical to DuckDB
    * `lower(nfc_normalize(x))` (full-plane diff: zero divergent code
    * points for NFC, the three [[pinnedLowerCp]] identities for lower).
    * Per-CODE-POINT simple mappings, NOT String.toLowerCase: the full
    * mappings (İ → i + combining dot, final sigma contextual ς) are
    * locale/context-sensitive and do NOT match utf8proc, which is what
    * silently split duplicate groups on multilingual corpora before
    * this contract existed. ASCII input short-circuits (NFC and the
    * exotic mappings are identity there) — the 100 TB-corpus hot path
    * pays one scan and an in-place lowercase, nothing more. */
  def canonLower(text: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < text.length) {
      if (text.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) {
      var j = 0
      while (j < text.length &&
        !(text.charAt(j) >= 'A' && text.charAt(j) <= 'Z')) j += 1
      if (j == text.length) text
      else {
        val a = text.toCharArray
        while (j < a.length) {
          val c = a(j)
          if (c >= 'A' && c <= 'Z') a(j) = (c + 32).toChar
          j += 1
        }
        new String(a)
      }
    } else {
      val nfc = java.text.Normalizer.normalize(
        text, java.text.Normalizer.Form.NFC)
      val sb = new java.lang.StringBuilder(nfc.length)
      var k = 0
      while (k < nfc.length) {
        val cp = nfc.codePointAt(k)
        sb.appendCodePoint(pinnedLowerCp(cp))
        k += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /** ONE tokenization for every text kernel in this file — NFC +
    * pinned lowercase ([[canonLower]]), trim spaces (ASCII 0x20 only,
    * matching Spark/DuckDB trim), split on the pinned whitespace class.
    * Shared so the shingle, n-gram, and token kernels cannot drift
    * apart: the DuckDB oracles replay one tokenization contract
    * (`string_split_regex(trim(lower(nfc_normalize(text))), ws+)`),
    * not two. ExpressionEquivalenceSpec pins golden non-ASCII cases
    * whose expected token arrays were computed BY DuckDB, plus a
    * generative ASCII property locking the fast path to the regex
    * semantics below.
    *
    * ASCII texts (the 100 TB hot path) take a fused single-pass
    * scanner — lowercase + trim + split with zero regex work and no
    * intermediate strings; this measurably beats both the regex path
    * and the Spark-builtin split/lower composition it replaced. */
  private[functions] def tokenize(text: String): Array[String] = {
    var i = 0
    var ascii = true
    while (ascii && i < text.length) {
      if (text.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) tokenizeAscii(text)
    else {
      val lowered = canonLower(text)
      val trimmed = {
        var st = 0; var en = lowered.length
        while (st < en && lowered.charAt(st) == ' ') st += 1
        while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
        lowered.substring(st, en)
      }
      // limit -1: KEEP trailing empty fields — Spark SQL split and
      // DuckDB string_split_regex both do, and the oracles replay their
      // semantics; Java's default limit 0 silently drops them, which
      // would desynchronize gram positions (and hashes) from the SQL
      // twins for whitespace-terminated texts
      WsPattern.split(trimmed, -1)
    }
  }

  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Fused ASCII path: identical semantics to trim(0x20) +
    * WsPattern.split(-1) + per-char lowercase, in one scan — including
    * the regex-split edge behavior (leading/trailing separator runs
    * yield empty edge fields, an empty input yields [""]). */
  private def tokenizeAscii(text: String): Array[String] = {
    var st = 0; var en = text.length
    while (st < en && text.charAt(st) == ' ') st += 1
    while (en > st && text.charAt(en - 1) == ' ') en -= 1
    if (st == en) return Array("")
    val out = new java.util.ArrayList[String](8)
    if (isAsciiWs(text.charAt(st))) out.add("")
    var i = st
    while (i < en) {
      while (i < en && isAsciiWs(text.charAt(i))) i += 1
      if (i == en) out.add("")
      else {
        val s0 = i
        var hasUpper = false
        while (i < en && !isAsciiWs(text.charAt(i))) {
          val c = text.charAt(i)
          if (c >= 'A' && c <= 'Z') hasUpper = true
          i += 1
        }
        if (!hasUpper) out.add(text.substring(s0, i))
        else {
          val a = new Array[Char](i - s0)
          var k = 0
          while (k < a.length) {
            val c = text.charAt(s0 + k)
            a(k) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
            k += 1
          }
          out.add(new String(a))
        }
      }
    }
    out.toArray(new Array[String](out.size))
  }

  /** Append the space-joined gram toks(i..i+n-1) to `sb` (which may
    * already hold a prefix, e.g. the hash seed). */
  private def appendGram(sb: java.lang.StringBuilder, toks: Array[String],
                         i: Int, n: Int): Unit = {
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks(i + k))
      k += 1
    }
  }

  /** Distinct hashed word n-gram shingles of one text — the Scala twin of
    * NearDup.shingles(text, n) + seededHash(0, _). */
  private[functions] def hashedShingles(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val digest = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      sb.append("0:")
      appendGram(sb, toks, i, n)
      seen.add(md5Prefix60(digest, sb.toString))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Non-distinct contiguous word n-grams — the repetition-signal twin of
    * [[hashedShingles]]: same [[tokenize]] contract by construction,
    * every occurrence kept (repetition measures exactly the duplication
    * the shingle set throws away), grams joined with a single space. */
  private[functions] def ngrams(text: String, n: Int): Array[UTF8String] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val out = new Array[UTF8String](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      appendGram(sb, toks, i, n)
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  /** Per-document hashed-feature BUCKET HISTOGRAM — the DSIR/classifier
    * feature stream (unigram + bigram occurrences WITH multiplicity,
    * seeded-md5 hashed, mod `buckets`) folded into one length-`buckets`
    * count array in a single tokenize pass. Index = bucket id; values
    * are occurrence counts. Bit-identical to exploding
    * concat(tokens, ngrams(2)) through seededHash(seed, _) % buckets
    * and counting per (doc, bucket) — which is exactly what the DuckDB
    * oracle still replays — but it turns the scoring side of DSIR and
    * the NB classifier into a pure projection: no (id, bucket) shuffle,
    * no model join, no per-doc collect_list fold (the r18 driver bench
    * measured that shuffle as the 100x-tier bound breaker:
    * dsir_weights@100x 162x vs the x150 bound). */
  private[functions] def featureBucketHistogram(text: String, seed: Int,
                                                buckets: Int): Array[Long] = {
    val toks = tokenize(text)
    val digest = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](buckets)
    val sb = new java.lang.StringBuilder()
    val prefix = seed.toString + ":"
    var i = 0
    while (i < toks.length) { // unigrams, every occurrence
      sb.setLength(0)
      sb.append(prefix).append(toks(i))
      out((md5Prefix60(digest, sb.toString) % buckets).toInt) += 1L
      i += 1
    }
    i = 0
    while (i + 1 < toks.length) { // bigrams, every occurrence
      sb.setLength(0)
      sb.append(prefix)
      appendGram(sb, toks, i, 2)
      out((md5Prefix60(digest, sb.toString) % buckets).toInt) += 1L
      i += 1
    }
    out
  }

  /** Every GRAM statistic of the Gopher repetition panel (Rae et al.
    * 2021 Table A1) for ONE document in ONE local pass — repetition is
    * an intra-document property, so nothing about it needs a shuffle:
    * the (id, n, gram) aggregations and the two document-keyed window
    * sorts the first implementation paid (the whole corpus shuffled
    * twice and sorted twice for a per-row statistic) collapse into this
    * kernel and the operator becomes a pure projection.
    *
    * Layout (9 longs): [0..2] top n-gram products for n = 2..4 —
    * occurrences × token-chars of the winner, count ties broken to the
    * LONGER gram, chars clamped below 1e6 exactly like the SQL twin's
    * integer packing; [3..8] duplicated n-gram COVERAGE for n = 5..10 —
    * token characters covered by any n-gram occurring ≥ 2 times in the
    * document, overlaps counted once. All char counts are CODE POINTS
    * (Spark `length` / DuckDB `len` semantics), tokens come from the
    * one pinned [[tokenize]], grams are space-joined like [[ngrams]] —
    * so the values are bit-identical to the shuffle formulation and the
    * unchanged DuckDB oracle. Documents shorter than n tokens report 0
    * for that n (the join-was-null → coalesce(0) path of the old plan).
    *
    * [9] total token chars (code points — the fraction denominator);
    * [10..13] LINE unit stats (occurrences, distinct, occurrence chars,
    * distinct chars — '\n' units under the pinned-whitespace trim,
    * blanks excluded) and [14..17] the same for PARAGRAPHS (`\n{2,}`
    * units): the Column formulation re-evaluated the interpreted
    * split + per-element trim lambda for each of its four aggregates
    * (~8 evaluations per unit type per row — measured 3× the kernel's
    * whole cost at sf0.1), where one pass here computes all eight
    * numbers. Split/trim semantics are the exact Java-regex patterns
    * Spark's split/regexp_replace evaluate, so values are unchanged. */
  private val GopherTrim =
    java.util.regex.Pattern.compile(s"^$WsClassJava+|$WsClassJava+$$")
  private val GopherLine = java.util.regex.Pattern.compile("\n")
  private val GopherPara = java.util.regex.Pattern.compile("\n{2,}")

  private def unitStatsInto(text: String, p: java.util.regex.Pattern,
                            out: Array[Long], off: Int): Unit = {
    val parts = p.split(text, -1)
    val seen = new java.util.HashSet[String](64)
    var occ = 0L; var dst = 0L; var occChars = 0L; var dstChars = 0L
    var i = 0
    while (i < parts.length) {
      val t = GopherTrim.matcher(parts(i)).replaceAll("")
      if (t.nonEmpty) {
        val cp = t.codePointCount(0, t.length).toLong
        occ += 1; occChars += cp
        if (seen.add(t)) { dst += 1; dstChars += cp }
      }
      i += 1
    }
    out(off) = occ; out(off + 1) = dst
    out(off + 2) = occChars; out(off + 3) = dstChars
  }

  private[functions] def gopherGramStats(text: String): Array[Long] = {
    val toks = tokenize(text)
    val T = toks.length
    val cp = new Array[Long](T)
    var i = 0
    while (i < T) {
      cp(i) = toks(i).codePointCount(0, toks(i).length).toLong
      i += 1
    }
    val out = new Array[Long](18)
    var tc = 0L
    i = 0
    while (i < T) { tc += cp(i); i += 1 }
    out(9) = tc
    unitStatsInto(text, GopherLine, out, 10)
    unitStatsInto(text, GopherPara, out, 14)
    val Pack = 1000000L
    val sb = new java.lang.StringBuilder()
    val plusOne = new java.util.function.BiFunction[Integer, Integer, Integer] {
      override def apply(a: Integer, b: Integer): Integer =
        Integer.valueOf(a.intValue + b.intValue)
    }
    // top n-gram packed product, n = 2..4
    var idx = 0
    var n = 2
    while (n <= 4) {
      if (T >= n) {
        val counts = new java.util.HashMap[String, Integer](64)
        var p = 0
        while (p <= T - n) {
          sb.setLength(0); appendGram(sb, toks, p, n)
          counts.merge(sb.toString, Integer.valueOf(1), plusOne)
          p += 1
        }
        var best = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val g = e.getKey
          val chars = (g.codePointCount(0, g.length) - (n - 1)).toLong
          val clamped = if (chars < Pack - 1L) chars else Pack - 1L
          val packed = e.getValue.longValue * Pack + clamped
          if (packed > best) best = packed
        }
        out(idx) = (best / Pack) * (best % Pack)
      }
      idx += 1; n += 1
    }
    // duplicated n-gram coverage, n = 5..10 (overlaps counted once)
    val covered = new Array[Boolean](T)
    n = 5
    while (n <= 10) {
      if (T >= n) {
        java.util.Arrays.fill(covered, false)
        val counts = new java.util.HashMap[String, Integer](64)
        val grams = new Array[String](T - n + 1)
        var p = 0
        while (p <= T - n) {
          sb.setLength(0); appendGram(sb, toks, p, n)
          grams(p) = sb.toString
          counts.merge(grams(p), Integer.valueOf(1), plusOne)
          p += 1
        }
        p = 0
        while (p <= T - n) {
          if (counts.get(grams(p)).intValue >= 2) {
            var q = p
            while (q < p + n) { covered(q) = true; q += 1 }
          }
          p += 1
        }
        var cov = 0L
        var q = 0
        while (q < T) { if (covered(q)) cov += cp(q); q += 1 }
        out(idx) = cov
      }
      idx += 1; n += 1
    }
    out
  }

  /** Per-document DISTINCT ADJACENT-TOKEN-PAIR RUNS — one document's
    * bigram multiset as (prev, cur, cnt) structs, distinct pairs with
    * occurrence counts, sorted by (prev, cur) in UTF8-BINARY order (the
    * exact comparator Spark's array_sort uses on string structs, so a
    * downstream fold over the array ordinal replays the identical
    * float-addition order the old sort-by-strings fold produced).
    * Bit-identical to exploding arrays_zip(slice(tokens, 1, n-1),
    * slice(tokens, 2, n-1)) and counting per (doc, prev, cur) — which
    * is exactly what the DuckDB oracle still replays — but it turns
    * the bigram-LM scoring side into kernel + posexplode + broadcast
    * model joins + ONE narrow (id, pos, contrib) fold shuffle: no
    * (id, prev, cur) string-keyed corpus shuffle, no per-doc
    * collect_list(struct(prev, cur, contrib)) wide state (the r19
    * driver bench measured that shuffle pair as the 10x tier's
    * lm_bigram bound breaker: 22.4x vs the x15 bound under full-suite
    * memory pressure). Tokens come from the one pinned [[tokenize]].
    * Documents with fewer than two tokens yield an empty array. */
  private[functions] def bigramRunsData(text: String): ArrayData = {
    val toks = tokenize(text)
    val T = toks.length
    if (T < 2) return new GenericArrayData(Array.empty[Any])
    val u = new Array[UTF8String](T)
    var i = 0
    while (i < T) { u(i) = UTF8String.fromString(toks(i)); i += 1 }
    val idx = new Array[Integer](T - 1)
    i = 0
    while (i < T - 1) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val ai = a.intValue; val bi = b.intValue
        val c = u(ai).compareTo(u(bi))
        if (c != 0) c else u(ai + 1).compareTo(u(bi + 1))
      }
    })
    val rows = new java.util.ArrayList[Any](T - 1)
    var p = 0
    while (p < T - 1) {
      val s = idx(p).intValue
      var cnt = 1
      while (p + cnt < T - 1 && {
        val t = idx(p + cnt).intValue
        u(s).equals(u(t)) && u(s + 1).equals(u(t + 1))
      }) cnt += 1
      rows.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](u(s), u(s + 1), cnt)))
      p += cnt
    }
    new GenericArrayData(rows.toArray)
  }

  def bigramRunsCol(text: Column): Column =
    ColumnBridge.column(BigramRunsExpr(ColumnBridge.expression(text)))

  def gopherGramStatsCol(text: Column): Column =
    ColumnBridge.column(GopherGramStatsExpr(ColumnBridge.expression(text)))

  def featureBucketsCol(text: Column, seed: Int, buckets: Int): Column =
    ColumnBridge.column(
      FeatureBucketsExpr(ColumnBridge.expression(text), seed, buckets))

  /** [[tokenize]] packaged for Catalyst (called from TokensExpr's
    * generated code through the object's static forwarder). */
  def tokensArrayData(s: UTF8String): ArrayData = {
    val toks = tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def tokensCol(text: Column): Column =
    ColumnBridge.column(TokensExpr(ColumnBridge.expression(text)))

  def hashedShinglesCol(text: Column, n: Int): Column =
    ColumnBridge.column(HashedShinglesExpr(ColumnBridge.expression(text), n))

  def ngramsCol(text: Column, n: Int): Column =
    ColumnBridge.column(NgramsExpr(ColumnBridge.expression(text), n))

  def minhashSignatureCol(hsh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSignatureExpr(ColumnBridge.expression(hsh), numHashes))

  def simhashCol(hsh: Column, bits: Int): Column =
    ColumnBridge.column(SimhashExpr(ColumnBridge.expression(hsh), bits))
}

/** The canonical token array itself — [[TextHash.tokenize]] surfaced as
  * a Column so EVERY Spark-side consumer (TextAnalysis.tokens → lang-ID,
  * quality, BM25, BPE, token counts) tokenizes through the one pinned
  * kernel instead of a parallel `split(trim(lower(text)))` composition
  * whose Unicode semantics Spark, not this engine, would define.
  *
  * Unlike its CodegenFallback siblings (whose per-row virtual call is
  * noise next to the per-ELEMENT interpretation they replaced), this
  * one replaced a fully-codegen'd builtin chain on the hottest text
  * path, so it carries real codegen: one static call into the shared
  * kernel, keeping the surrounding projection inside whole-stage
  * codegen. */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "canon_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHash.tokensArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHash.tokensArrayData($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class HashedShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "hashed_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.hashedShingles(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NgramsExpr(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.ngrams(input.asInstanceOf[UTF8String].toString, n)
        .asInstanceOf[Array[Any]])

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextHash.featureBucketHistogram]] as a Catalyst expression — the
  * DSIR/NB-classifier feature-bucket histogram in one per-row kernel
  * call; the per-row virtual call is noise next to the per-gram md5
  * work inside, so CodegenFallback like the other gram kernels. */
case class FeatureBucketsExpr(child: Expression, seed: Int, buckets: Int)
  extends UnaryExpression with CodegenFallback {

  require(buckets >= 1, "bucket count must be >= 1")
  override def prettyName: String = "feature_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHash.featureBucketHistogram(
      input.asInstanceOf[UTF8String].toString, seed, buckets))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextHash.bigramRunsData]] as a Catalyst expression — one
  * per-document call replacing the bigram-LM scoring side's
  * (id, prev, cur) string-keyed count shuffle and its wide per-doc
  * fold state; the per-row virtual call is noise next to the per-pair
  * sort work inside, so CodegenFallback like the other gram kernels. */
case class BigramRunsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bigram_runs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = false),
    StructField("cur", StringType, nullable = false),
    StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHash.bigramRunsData(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[TextHash.gopherGramStats]] as a Catalyst expression — one
  * per-document call replacing two corpus shuffles and two window
  * sorts; the per-row virtual call is noise next to the gram hashmap
  * work inside, so CodegenFallback like the other gram kernels. */
case class GopherGramStatsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "gopher_gram_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.gopherGramStats(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MinhashSignatureExpr(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, "numHashes must be >= 1")
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  private lazy val coeffs: Array[(Long, Long)] =
    Array.tabulate(numHashes)(graft.operators.NearDup.minhashCoeffs)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = hs.getLong(i) % (1L << 30)
      var j = 0
      while (j < numHashes) {
        val (a, b) = coeffs(j)
        val h = (a * x + b) % graft.operators.NearDup.MinhashPrime
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class SimhashExpr(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
  override def prettyName: String = "simhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < m) {
      val x = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((x >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) { if (votes(j) >= 0L) sim |= 1L << j; j += 1 }
    sim
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
