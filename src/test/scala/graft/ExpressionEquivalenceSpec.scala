package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.operators.NearDup

/** The codegen/JIT expression kernels must be BIT-IDENTICAL to the
  * declarative Column compositions they replaced — the oracle hash gate
  * depends on it. These tests evaluate both forms on the same data and
  * require exact equality. */
class ExpressionEquivalenceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private val vecs = (0L until 50L).map(i =>
    (i, Seq.fill(16)(rng.nextFloat() * 2 - 1))).toDF("id", "v")
  private val q = Seq.fill(16)(rng.nextFloat() * 2 - 1)

  // the original higher-order compositions, kept here as the spec
  private def hofDot(v: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
    aggregate(zip_with(v.cast("array<double>"), q.cast("array<double>"), _ * _),
      lit(0.0d), _ + _)

  private def qCol = array(q.map(x => lit(x)): _*).cast("array<float>")

  test("cosine expression == HOF composition, bit for bit") {
    val nv = sqrt(hofDot(col("v"), col("v")))
    val nq = sqrt(hofDot(qCol, qCol))
    val hof = when(nv === 0.0d || nq === 0.0d, lit(Double.PositiveInfinity))
      .otherwise(lit(1.0d) - hofDot(col("v"), qCol) / (nv * nq))
    val rows = vecs.select(cosineDistance(col("v"), qCol).as("e"), hof.as("h"))
      .as[(Double, Double)].collect()
    assert(rows.forall { case (e, h) =>
      java.lang.Double.doubleToRawLongBits(e) == java.lang.Double.doubleToRawLongBits(h)
    })
  }

  test("euclidean expression == HOF composition, bit for bit") {
    val hof = sqrt(aggregate(
      zip_with(col("v").cast("array<double>"), qCol.cast("array<double>"),
        (a, b) => (a - b) * (a - b)), lit(0.0d), _ + _))
    val rows = vecs.select(euclideanDistance(col("v"), qCol).as("e"), hof.as("h"))
      .as[(Double, Double)].collect()
    assert(rows.forall { case (e, h) =>
      java.lang.Double.doubleToRawLongBits(e) == java.lang.Double.doubleToRawLongBits(h)
    })
  }

  private def sq8Decoded = transform(col("codes"), cc =>
    col("qmin") + (cc.cast("double") * (col("qmax") - col("qmin"))) / lit(255.0))

  test("sq8 asymmetric euclidean expression == decode-then-HOF, bit for bit") {
    import graft.operators.Quantization
    val encoded = Quantization.encode(vecs, col("v"))
    val hof = sqrt(aggregate(
      zip_with(qCol.cast("array<double>"), sq8Decoded, (a, b) => (a - b) * (a - b)),
      lit(0.0d), _ + _))
    val rows = encoded.select(
      graft.functions.VectorExpressions.sq8Distance(
        col("codes"), col("qmin"), col("qmax"), q.toArray, "euclidean").as("e"),
      hof.as("h")).as[(Double, Double)].collect()
    assert(rows.forall { case (e, h) =>
      java.lang.Double.doubleToRawLongBits(e) == java.lang.Double.doubleToRawLongBits(h)
    })
  }

  test("sq8 cosine / dot kernels == decode-then-HOF, bit for bit") {
    import graft.operators.Quantization
    val encoded = Quantization.encode(vecs, col("v"))
    val qd = qCol.cast("array<double>")
    def hofDotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)
    val dotH = -hofDotD(sq8Decoded, qd)
    val cosH = {
      val d1 = sqrt(hofDotD(sq8Decoded, sq8Decoded))
      val d2 = sqrt(hofDotD(qd, qd))
      when(d1 === 0.0d || d2 === 0.0d, lit(Double.PositiveInfinity))
        .otherwise(lit(1.0d) - hofDotD(sq8Decoded, qd) / (d1 * d2))
    }
    val rows = encoded.select(
      graft.functions.VectorExpressions.sq8Distance(
        col("codes"), col("qmin"), col("qmax"), q.toArray, "cosine").as("ce"),
      cosH.as("ch"),
      graft.functions.VectorExpressions.sq8Distance(
        col("codes"), col("qmin"), col("qmax"), q.toArray, "dot_product").as("de"),
      dotH.as("dh")).as[(Double, Double, Double, Double)].collect()
    assert(rows.forall { case (ce, ch, de, dh) =>
      java.lang.Double.doubleToRawLongBits(ce) == java.lang.Double.doubleToRawLongBits(ch) &&
        java.lang.Double.doubleToRawLongBits(de) == java.lang.Double.doubleToRawLongBits(dh)
    })
  }

  test("sq8 batch kernel (query as COLUMN) == per-query constant kernel, " +
    "bit for bit, every metric") {
    import graft.operators.Quantization
    val encoded = Quantization.encode(vecs, col("v"))
    for (metric <- Seq("euclidean", "cosine", "dot_product")) {
      val rows = encoded.select(
        graft.functions.VectorExpressions.sq8DistanceBatch(
          col("codes"), col("qmin"), col("qmax"), qCol, metric).as("b"),
        graft.functions.VectorExpressions.sq8Distance(
          col("codes"), col("qmin"), col("qmax"), q.toArray, metric).as("s"))
        .as[(Double, Double)].collect()
      assert(rows.forall { case (b, s) =>
        java.lang.Double.doubleToRawLongBits(b) == java.lang.Double.doubleToRawLongBits(s)
      }, s"metric=$metric")
    }
  }

  test("dot-product expression == HOF composition, bit for bit") {
    val rows = vecs.select(dotProductDistance(col("v"), qCol).as("e"),
      (-hofDot(col("v"), qCol)).as("h")).as[(Double, Double)].collect()
    assert(rows.forall { case (e, h) => e == h })
  }

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  Mixed   CASE and    extra whitespace   "),
    (3L, "one two"),
    (4L, "single"),
    // trailing NON-SPACE whitespace: trim (space-only) keeps it, and
    // Spark split keeps the trailing empty token — the JIT kernel must
    // split with limit -1 to agree (Java's default drops it)
    (5L, "ends with newline\n"),
    (6L, "tab\tseparated words\t"),
  ).toDF("id", "text")

  // HOF twin of hashedShingles ON THE ASCII DOMAIN: the pre-unification
  // Spark-builtin tokenization (split/trim/lower) — kept inline here as
  // the regression spec that the pinned Unicode kernel did not move a
  // single ASCII hash (NFC, the pinned case mappings, and the explicit
  // whitespace class are all identity/equal-to-\s on ASCII text)
  private def asciiShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val t = split(trim(lower(text)), "\\s+")
    val grams =
      if (n == 1) t
      else when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  private def hofHashedShingles(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(asciiShingles(text, n),
      s => NearDup.seededHash(0, s)))

  test("hashedShingles expression == HOF composition (values and order)") {
    for (n <- Seq(1, 2, 3)) {
      val rows = texts.select(
        NearDup.hashedShingles(col("text"), n).as("e"),
        hofHashedShingles(col("text"), n).as("h"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.foreach { case (e, h) => assert(e == h, s"n=$n") }
    }
  }

  // Golden cross-engine pins for the Unicode tokenization contract:
  // every expected array below was computed BY DUCKDB
  // (string_split_regex(trim(lower(nfc_normalize(text))), wsClass+)) and
  // hard-coded here, so this spec is a genuine two-implementation gate
  // that runs without DuckDB: if the JIT kernel's NFC step, pinned
  // simple-lowercase, or whitespace class drifts from the oracle
  // engine's, a case below breaks.
  private val goldenTokens: Seq[(String, Seq[String])] = Seq(
    // Turkish dotted/dotless I: SIMPLE mapping sends İ -> i (the full
    // mapping's i + combining-dot would split these tokens from ASCII i)
    ("İstanbul ŞEHRİ Güzel BİR yer",
      Seq("istanbul", "şehri", "güzel", "bir", "yer")),
    // NFD input: combining marks compose before hashing
    ("café déjà vu", Seq("café", "déjà", "vu")),
    // Greek: simple mapping yields MEDIAL sigma everywhere (never ς)
    ("ΛΟΓΟΣ ΚΑΛΟΣ", Seq("λογοσ", "καλοσ")),
    // NBSP / ideographic space / thin space are separators
    ("a b　c d", Seq("a", "b", "c", "d")),
    // uppercase ẞ (U+1E9E) lowers to ß
    ("GROẞE Straße", Seq("große", "straße")),
    // the three pinned identity code points (utf8proc lacks their
    // Unicode-13 mappings; Character.toLowerCase would map them +1)
    ("Ꟈx Ꟊy Ꟶz", Seq("Ꟈx", "Ꟊy", "Ꟶz")),
    // trailing non-space whitespace keeps its empty token
    ("ends with newline\n", Seq("ends", "with", "newline", "")),
    // full-width letters lower to full-width (NFC is not NFKC)
    ("ＡＢＣ ＤＥＦ", Seq("ａｂｃ", "ｄｅｆ")),
    // ligatures survive (compatibility decompositions are NOT applied)
    ("ﬁn ﬂow", Seq("ﬁn", "ﬂow")),
    // KELVIN SIGN: canonical singleton decomposition to K, then k
    ("Ｋ KK", Seq("ｋ", "kk")),
  )

  test("canonical tokens kernel == DuckDB-computed golden cases " +
    "(the cross-engine Unicode contract)") {
    val df = goldenTokens.zipWithIndex
      .map { case ((t, _), i) => (i, t) }.toDF("i", "text")
    val got = df.select(col("i"),
        graft.functions.TextHash.tokensCol(col("text")).as("t"))
      .as[(Int, Seq[String])].collect().toMap
    goldenTokens.zipWithIndex.foreach { case ((text, want), i) =>
      assert(got(i) == want, s"text=${text}")
    }
  }

  test("fused ASCII tokenizer == the regex-split contract (generative: " +
    "random whitespace-run/edge/case shapes)") {
    val rng = new scala.util.Random(7)
    val alphabet = "aAzZ09 .!\t\n\u000B\f\r "
    val samples = (0 until 400).map { _ =>
      (0 until rng.nextInt(24))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }.distinct
    // reference: the contract stated in SQL terms — lowercase, trim
    // ASCII spaces, regex-split on the explicit class keeping empties
    def ref(s: String): Seq[String] = {
      val lowered = s.toLowerCase(java.util.Locale.ROOT)
      val t = lowered.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      t.split("[\\t\\n\\u000B\\f\\r ]+", -1).toSeq
    }
    val got = samples.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "text")
      .select(col("i"), graft.functions.TextHash.tokensCol(col("text")).as("t"))
      .as[(Int, Seq[String])].collect().toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == ref(s), s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("analysis tokens and n-gram kernels share the tokenization on " +
    "non-ASCII input (one contract, not two)") {
    val df = goldenTokens.map(_._1).zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("i", "text")
    val rows = df.select(
        graft.operators.TextAnalysis.tokens(col("text")).as("a"),
        graft.operators.TrainingData.ngrams(col("text"), 1).as("g"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (a, g) => assert(a == g) }
  }

  // HOF twin of TrainingData.ngrams: NON-distinct contiguous grams
  private def hofNgrams(text: org.apache.spark.sql.Column, n: Int) = {
    val t = split(trim(lower(text)), "\\s+")
    if (n == 1) t
    else when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  test("ngrams expression == HOF composition (values and order, " +
    "duplicates kept)") {
    for (n <- Seq(1, 2, 3)) {
      val rows = texts.select(
        graft.operators.TrainingData.ngrams(col("text"), n).as("e"),
        hofNgrams(col("text"), n).as("h"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (e, h) => assert(e == h, s"n=$n") }
    }
  }

  test("minhash signature expression == per-hash affine HOF") {
    val hof = array((0 until 8).map { i =>
      val (a, b) = NearDup.minhashCoeffs(i)
      array_min(transform(col("hsh"), x =>
        (lit(a) * pmod(x, lit(1L << 30)) + lit(b)) % lit(NearDup.MinhashPrime)))
    }: _*)
    val base = texts.select(NearDup.hashedShingles(col("text"), 2).as("hsh"))
      .where(size(col("hsh")) > 0)
    val rows = base.select(NearDup.minhashSignature(col("hsh"), 8).as("e"),
      hof.as("h")).as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (e, h) => assert(e == h) }
  }

  test("bigramRuns kernel == explode-zip-groupBy-sort composition " +
    "(distinct pairs, counts, and the (prev, cur) UTF8-BINARY order — " +
    "including supplementary-plane tokens where UTF-16 and UTF-8 " +
    "orders diverge)") {
    val gen = new scala.util.Random(23)
    //  (U+F8FF) sorts AFTER 😀 (U+1F600) in UTF-16
    // code units but BEFORE it in UTF-8 bytes: the kernel must take
    // the UTF-8 side, because array_sort on string structs does
    val adversarial = " 😀  😀 zz "
    val texts = (Seq(
      "the cat sat on the mat the cat sat",
      "a a a a", "single", "", "  ", "Mixed CASE tokens mixed case",
      adversarial) ++
      (0 until 40).map(_ => Seq.fill(3 + gen.nextInt(40))(
        "t" + gen.nextInt(7)).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val kernel = texts.select(col("id"),
        posexplode(graft.functions.TextHash.bigramRunsCol(col("text")))
          .as(Seq("pos", "p")))
      .select(col("id"), col("pos"), col("p.prev"), col("p.cur"),
        col("p.cnt").cast("long"))
      .as[(Long, Int, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val hof = texts
      .select(col("id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("__t"))
      .select(col("id"), explode(arrays_zip(
          slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1))).as("z"))
      .select(col("id"), col("z.0").as("prev"), col("z.1").as("cur"))
      .groupBy(col("id"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(
        struct(col("prev"), col("cur"), col("cnt")))).as("a"))
      .select(col("id"), posexplode(col("a")).as(Seq("pos", "p")))
      .select(col("id"), col("pos"), col("p.prev"), col("p.cur"),
        col("p.cnt"))
      .as[(Long, Int, String, String, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(kernel.length == hof.length, s"${kernel.length} vs ${hof.length}")
    kernel.zip(hof).foreach { case (k, h) => assert(k == h, s"$k vs $h") }
    assert(kernel.nonEmpty)
  }

  test("simhash expression == array-accumulator HOF") {
    val bits = 16
    val masks = array((0 until bits).map(j => lit(1L << j)): _*)
    val zeros = array_repeat(lit(0L), bits)
    val votes = aggregate(col("hsh"), zeros,
      (acc, x) => zip_with(acc, masks, (a, m) =>
        a + when(x.bitwiseAND(m) =!= 0L, lit(1L)).otherwise(lit(-1L))))
    val hof = aggregate(
      zip_with(votes, masks, (v, m) => when(v >= 0L, m).otherwise(lit(0L))),
      lit(0L), _ + _)
    val base = texts.select(NearDup.hashedShingles(col("text"), 2).as("hsh"))
    val rows = base.select(NearDup.simhash(col("hsh"), bits).as("e"), hof.as("h"))
      .as[(Long, Long)].collect()
    rows.foreach { case (e, h) => assert(e == h) }
  }
}
