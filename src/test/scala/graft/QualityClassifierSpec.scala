package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityClassifier

/** Trained two-class quality classifier contract
  * (operators/QualityClassifier.scala): the per-class smoothed bucket
  * model + prior, the rounded-logistic score, and the GPT-3 Pareto keep
  * rule. */
class QualityClassifierSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 16

  // curated exemplars: a distinctive "reference" vocabulary
  private val posDocs = Seq(
    (1L, "theorem proof lemma corollary theorem proof"),
    (2L, "lemma theorem axiom proof corollary"),
    (3L, "proof axiom theorem lemma"),
  ).toDF("doc_id", "text")
  // raw crawl stand-in: junk vocabulary
  private val negDocs = Seq(
    (10L, "click here buy now free offer"),
    (11L, "subscribe click offer buy free now now"),
    (12L, "winner click free buy offer"),
    (13L, "now free click buy subscribe"),
  ).toDF("doc_id", "text")
  // held-out: one doc of each flavor plus a mixed one
  private val heldOut = Seq(
    (20L, "theorem lemma proof axiom corollary proof"),
    (21L, "click buy free offer subscribe now"),
    (22L, "theorem click proof buy"),
  ).toDF("doc_id", "text")

  test("trainModel: one row per bucket, lprior = ln(n_pos/n_neg) on " +
    "every row; validations reject empty classes and bad bucket counts") {
    val m = QualityClassifier.trainModel(posDocs, negDocs, col("doc_id"),
      col("text"), B)
    val rows = m.select("bucket", "w", "lprior")
      .as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet == (0L until B.toLong).toSet)
    val expectedPrior = math.log(3.0 / 4.0)
    assert(rows.forall(_._3 == expectedPrior))
    intercept[IllegalArgumentException] {
      QualityClassifier.trainModel(posDocs, negDocs, col("doc_id"),
        col("text"), buckets = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.trainModel(posDocs.where(lit(false)), negDocs,
        col("doc_id"), col("text"), B)
    }
  }

  test("identical classes collapse the ratio: every w ~ 0 and the score " +
    "reduces to the (rounded) prior probability") {
    val m = QualityClassifier.trainModel(posDocs, posDocs, col("doc_id"),
      col("text"), B)
    assert(m.select("w").as[Double].collect().forall(w => math.abs(w) < 1e-12))
    val s = QualityClassifier.score(posDocs, col("doc_id"), col("text"), m, B)
      .select("llr", "prob").as[(Double, Double)].collect()
    // lprior = ln(1) = 0 -> llr 0, prob sigmoid(0) = 0.5
    assert(s.forall(r => r._1 == 0.0 && r._2 == 0.5))
  }

  test("separability on the planted fixture: reference-like held-out " +
    "docs score far above crawl-like ones, the mixed doc in between; " +
    "every input row appears; deterministic across runs") {
    val m = QualityClassifier.trainModel(posDocs, negDocs, col("doc_id"),
      col("text"), B)
    def run() = QualityClassifier.score(heldOut, col("doc_id"), col("text"),
        m, B)
      .select("id", "n_feats", "llr", "prob")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val s = run()
    assert(s.keySet == Set(20L, 21L, 22L))
    assert(s(20L)._4 > 0.9, s(20L))   // reference-like: confident keep
    assert(s(21L)._4 < 0.1, s(21L))   // crawl-like: confident drop
    assert(s(22L)._4 > s(21L)._4 && s(22L)._4 < s(20L)._4)
    assert(run().toSeq.sortBy(_._1) == s.toSeq.sortBy(_._1))
    // 6 tokens + 5 bigrams
    assert(s(20L)._2 == 11L)
  }

  test("score rejects a bucket count the model was not trained with") {
    val m = QualityClassifier.trainModel(posDocs, negDocs, col("doc_id"),
      col("text"), B)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.score(heldOut, col("doc_id"), col("text"), m, B * 2)
        .collect()
    }
    assert(e.getMessage.contains("ONE bucket count"))
  }

  test("paretoKeep: prob 1 always keeps, prob 0 keeps only the rare " +
    "extreme draws (the published tail-preserving behavior), " +
    "deterministic, and monotone in prob for a FIXED id") {
    val ids = (1L to 2000L).toDF("id")
    def kept(p: Double): Long = ids
      .where(QualityClassifier.paretoKeep(col("id"), lit(p)))
      .count()
    assert(kept(1.0) == 2000L)
    val k0 = kept(0.0)
    assert(k0 < 30L, s"prob 0 kept $k0 of 2000") // P(draw > 1) = 2^-9-ish
    val kMid = kept(0.9)
    assert(k0 < kMid && kMid < 2000L)
    assert(kept(0.9) == kMid) // pure function of (id, prob)
  }
}
