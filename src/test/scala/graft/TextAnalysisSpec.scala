package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis._

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](text: String,
                                                   c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(Tuple1(text)).toDF("text").select(c(col("text")).as("v")).as[T].head()

  test("tokens: lowercased, whitespace-split, trimmed") {
    val t = one[Seq[String]]("  The Quick  Fox ", c => tokens(c))
    assert(t == Seq("the", "quick", "fox"))
  }

  test("stopword ratio counts profile words") {
    val r = one[Double]("the cat is on a mat", c => stopwordRatio(tokens(c)))
    // "the", "is", "a" of 6 tokens
    assert(math.abs(r - 0.5) < 1e-12)
  }

  test("unique ratio is type-token ratio") {
    val r = one[Double]("a a b b", c => uniqueRatio(tokens(c)))
    assert(r == 0.5)
  }

  test("avg token length") {
    val r = one[Double]("ab abcd", c => avgTokenLen(tokens(c)))
    assert(r == 3.0)
  }

  test("quality score is within [0, 1] and penalizes stopword soup") {
    val good = one[Double]("neural networks learn distributed representations quickly",
      c => qualityScore(tokens(c)))
    val soup = one[Double]("the the the the a a a of of to",
      c => qualityScore(tokens(c)))
    assert(good > soup)
    assert(good >= 0 && good <= 1 && soup >= 0 && soup <= 1)
  }

  test("langScriptConfidence mirrors the decision chain: script-char " +
    "fraction for script docs, winning-profile hit fraction for Latin, " +
    "zero for keyword soup the argmax still labels 'en'") {
    def conf(s: String): Double =
      one[Double](s, c => langScriptConfidence(c, tokens(c)))
    // pure CJK: every non-whitespace code point in the winning range
    assert(conf("机器 学习 模型") == 1.0)
    // mixed ja: kana decides (range order), confidence < 1 (kanji mass)
    val ja = conf("古い 寺院 は 静かな 山")
    assert(ja > 0.0 && ja < 1.0)
    // Latin prose: winning profile hits / tokens ("der","die","und","ist" = 4/7)
    assert(conf("der hund und die katze ist da") == 0.571429)
    // keyword soup: argmax says 'en' (tie at zero) but confidence is 0 —
    // exactly what the CCNet keep rule exists to drop
    assert(one[String]("data pipeline quality matters",
      c => predictedLangScript(c, tokens(c))) == "en")
    assert(conf("data pipeline quality matters") == 0.0)
    // empty text: one empty token, zero hits
    assert(conf("") == 0.0)
  }

  test("language ID picks the profile with most hits; first profile wins ties") {
    assert(one[String]("der hund und die katze ist da", c => predictedLang(tokens(c))) == "de")
    assert(one[String]("el perro y la casa que es un", c => predictedLang(tokens(c))) == "es")
    assert(one[String]("the cat and the dog is it", c => predictedLang(tokens(c))) == "en")
    // zero hits everywhere -> deterministic first profile
    assert(one[String]("xyzzy plugh", c => predictedLang(tokens(c))) == "en")
  }

  test("fingerprint is stable and content-sensitive") {
    val a = one[Long]("the quick brown fox", c => fingerprint(c))
    val b = one[Long]("the quick brown fox", c => fingerprint(c))
    val d = one[Long]("a different text entirely", c => fingerprint(c))
    assert(a == b && a != d)
  }

  test("redactPii: pinned category order (URL swallows its embedded " +
    "email), word boundaries guard IPv4s, counts are per stage") {
    import org.apache.spark.sql.functions.col
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val rows = Seq(
      (1L, "mail me@x.com via https://a.b/?r=you@y.de now"),
      (2L, "v1.2.3.4beta is NOT an ip but 8.8.8.8 is"),
      (3L, "call +1 (555) 123-4567 today"),
      (4L, "clean")).toDF("id", "text")
    val got = graft.operators.TextAnalysis.redactPii(rows, col("id"), col("text"))
      .orderBy("id")
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq
    assert(got(0) == ((1L, 1, 1, 0, 0,
      "mail <EMAIL> via <URL> now"))) // the URL's email counts as URL
    assert(got(1) == ((2L, 0, 0, 1, 0,
      "v1.2.3.4beta is NOT an ip but <IP> is")))
    assert(got(2) == ((3L, 0, 0, 0, 1, "call <PHONE> today")))
    assert(got(3) == ((4L, 0, 0, 0, 0, "clean")))
  }

  test("gopherQualityFlags: a clean document passes; each rule fails " +
    "exactly the document built to violate it") {
    // 60 words, mean len in range, letters, stopwords, no symbols
    val good = (1 to 30).map(i => s"the wording$i").mkString(" ") + " of that have"
    val docs = Seq(
      (1L, good),                                      // passes all 7
      (2L, "the of short text"),                       // rule 1: < 50 words
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the of"), // rule 2: mean len < 3
      (4L, good + " " + (1 to 30).map(_ => "#").mkString(" ")), // rule 3: symbols
      (5L, (1 to 60).map(i => s"- the w$i item").mkString("\n")), // rule 4: bullets
      (6L, (1 to 60).map(i => s"the w$i more...").mkString("\n")), // rule 5: ellipses
      (7L, (1 to 26).map(_ => "the of 12345 67890").mkString(" ")), // rule 6: digits
      (8L, (1 to 30).map(i => s"word$i item$i").mkString(" ")))     // rule 7: no stopwords
      .toDF("id", "text")
    val got = gopherQualityFlags(docs, col("id"), col("text"))
      .select("id", "passes").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L, got)
    (2L to 8L).foreach(i => assert(got(i) == 0L, s"doc $i should fail"))
  }

  test("gopherQualityFlags metrics: exact values on a hand corpus") {
    val docs = Seq((1L, "the cat\n- bullet line\ntail line...")).toDF("id", "text")
    val r = gopherQualityFlags(docs, col("id"), col("text"))
      .select("n_words", "mean_word_len", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "n_stopwords")
      .as[(Long, Double, Double, Double, Double, Long)].head()
    // tokens: the, cat, -, bullet, line, tail, line... (7 tokens)
    assert(r._1 == 7L)
    assert(r._2 == 4.0) // (3+3+1+6+4+4+7)/7
    assert(r._3 == 0.333333) // 1 of 3 lines starts with a bullet
    assert(r._4 == 0.333333) // 1 of 3 lines ends with ...
    assert(r._5 == 0.857143) // 6 of 7 tokens have a letter ("-" does not)
    assert(r._6 == 1L)       // only "the"
  }

  test("gopherQualityFlags: empty and whitespace-only documents yield " +
    "finite zero ratios and a clean fail — never nulls (the panel " +
    "divides by size(tokens) and size(lines); the pinned tokenizer's " +
    "''->[''] single-token contract is what keeps those denominators " +
    ">= 1, and THIS case is the guard against a tokenizer change " +
    "silently breaking it)") {
    val docs = Seq((1L, ""), (2L, "   \t  "), (3L, " \n \n ")).toDF("id", "text")
    val rows = gopherQualityFlags(docs, col("id"), col("text"))
      .select("id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stopwords", "passes")
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Long)]
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // "" -> [""] (one empty token); inner non-space whitespace
      // survives the ASCII-space trim and splits to empty EDGE tokens —
      // either way the denominator is >= 1, never 0
      assert(r._2 >= 1L, r)
      // every ratio is a real 0.0 — a null would have thrown in the
      // non-nullable decode above, and passes must be a definite 0
      assert(r._3 == 0.0 && r._4 == 0.0 && r._5 == 0.0 && r._6 == 0.0, r)
      assert(r._7 == 0.0 && r._8 == 0L && r._9 == 0L, r)
    }
    assert(rows.find(_._1 == 1L).get._2 == 1L) // "" is exactly one token
  }
}
