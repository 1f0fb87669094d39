package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ImportanceSampling

/** DSIR contract (operators/ImportanceSampling.scala): the hashed-bucket
  * log-ratio model, per-document weights, and Gumbel top-k selection. */
class ImportanceSamplingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = 16

  // two clearly different token distributions
  private val rawDocs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "delta epsilon zeta delta epsilon"),
    (3L, "alpha beta alpha beta"),
    (4L, "eta theta iota"),
    (5L, ""),
  ).toDF("doc_id", "text")
  private val targetDocs = Seq(
    (10L, "alpha beta alpha"),
    (11L, "beta alpha beta gamma"),
  ).toDF("doc_id", "text")

  test("bucketModel: one row per bucket; target == raw collapses lam to ~0") {
    val m = ImportanceSampling.bucketModel(rawDocs, rawDocs,
      col("doc_id"), col("text"), B)
    val rows = m.select("bucket", "lam").as[(Long, Double)].collect().toMap
    assert(rows.keySet == (0L until B.toLong).toSet)
    assert(rows.values.forall(v => math.abs(v) < 1e-12))
  }

  test("weights: every raw doc appears; empty text = the kernel's single empty token") {
    val w = ImportanceSampling.importanceWeights(rawDocs, targetDocs,
      col("doc_id"), col("text"), B)
      .select("id", "n_feats", "logweight")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, lw) => id -> ((n, lw)) }.toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // the pinned tokenization kernel maps "" to [""] in BOTH engines, so
    // the empty document carries exactly one (empty-unigram) feature
    assert(w(5L)._1 == 1L)
    // doc 1's features: 4 unigrams + 3 bigrams
    assert(w(1L)._1 == 7L)
  }

  test("weights: target-like documents outscore target-unlike ones") {
    val w = ImportanceSampling.importanceWeights(rawDocs, targetDocs,
      col("doc_id"), col("text"), B)
      .select("id", "logweight").as[(Long, Double)].collect().toMap
    // docs 1 and 3 share the target's alpha/beta mass; 2 and 4 share none
    assert(w(1L) > w(2L) && w(1L) > w(4L))
    assert(w(3L) > w(2L) && w(3L) > w(4L))
  }

  test("resample: k rows drawn from the raw ids, deterministic across runs") {
    def run() = ImportanceSampling.importanceResample(rawDocs, targetDocs,
      col("doc_id"), col("text"), k = 3, B)
      .select("id", "key").as[(Long, Double)].collect().toSeq
    val a = run(); val b = run()
    assert(a == b)
    assert(a.size == 3)
    assert(a.map(_._1).toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
    // keys are emitted in descending order (ties by id)
    assert(a.map(_._2) == a.map(_._2).sorted.reverse)
  }

  test("scoreWithModel rejects a bucket count the model was not trained " +
    "with (a mismatch would silently drop feature mass, not error)") {
    val model = ImportanceSampling.bucketModel(rawDocs, targetDocs,
      col("doc_id"), col("text"), B)
    val e = intercept[IllegalArgumentException] {
      ImportanceSampling.scoreWithModel(rawDocs, col("doc_id"), col("text"),
        model, B * 2).collect()
    }
    assert(e.getMessage.contains("ONE bucket count"))
    // the matching count scores fine
    assert(ImportanceSampling.scoreWithModel(rawDocs, col("doc_id"),
      col("text"), model, B).count() == 5)
  }

  test("NULL text scores (n_feats 0, logweight 0.0) — the defensive " +
    "contract the projection rewrite must preserve (a null kernel " +
    "output must not propagate null scores)") {
    val withNull = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = ImportanceSampling.bucketModel(rawDocs, targetDocs,
      col("doc_id"), col("text"), B)
    val got = ImportanceSampling.scoreWithModel(withNull, col("doc_id"),
        col("text"), model, B)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(got(1) == ((2L, 0L, 0.0d)), s"null-text row scored ${got(1)}")
    assert(got(0)._2 > 0L)
    // the classifier twin: null text scores the bare (rounded) prior
    val qc = graft.operators.QualityClassifier.trainModel(targetDocs,
      rawDocs, col("doc_id"), col("text"), B)
    val lprior = qc.select(col("lprior")).head().getDouble(0)
    val prior6 = BigDecimal(lprior)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0d
    val llr = graft.operators.QualityClassifier.score(withNull,
        col("doc_id"), col("text"), qc, B)
      .where(col("id") === 2L).select(col("llr")).head().getDouble(0)
    assert(llr == prior6, s"null-text llr $llr != bare prior $prior6")
  }

  test("a malformed model with DUPLICATE bucket ids fails loudly even " +
    "when the row count matches (a dup would silently zero the missing " +
    "bucket)") {
    val bad = (0 until B).map(i =>
        (if (i == B - 1) (B - 2).toLong else i.toLong, 0.1d))
      .toDF("bucket", "lam")
    val e = intercept[IllegalArgumentException] {
      ImportanceSampling.scoreWithModel(rawDocs, col("doc_id"),
        col("text"), bad, B).collect()
    }
    assert(e.getMessage.contains("distinct bucket ids"))
  }

  test("importanceWeights is STATELESS: repeated calls and repeated " +
    "materializations agree, equal scoreWithModel over the lazy model, " +
    "and leave no block-store residue (no checkpoint/persist pins)") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val sc = spark.sparkContext
    val rddsBefore = sc.getPersistentRDDs.keySet
    val dfA = ImportanceSampling.importanceWeights(
      rawDocs, targetDocs, col("doc_id"), col("text"), B)
    val a1 = collect(dfA)
    val a2 = collect(dfA) // re-materialization: pure recompute, same rows
    val b = collect(ImportanceSampling.importanceWeights(
      rawDocs, targetDocs, col("doc_id"), col("text"), B))
    assert(a1 == a2 && a1 == b)
    // the literal-model path scores identically to scoreWithModel over
    // the LAZY model frame (the doubles round-trip the driver bit-exact)
    val m = ImportanceSampling.bucketModel(rawDocs, targetDocs,
      col("doc_id"), col("text"), B)
    assert(collect(ImportanceSampling.scoreWithModel(rawDocs,
      col("doc_id"), col("text"), m, B)) == a1)
    // nothing was persisted or checkpointed by any of the above: the
    // r17 scale-killer was exactly this residue
    assert(sc.getPersistentRDDs.keySet == rddsBefore)
  }

  test("sf0.001: mean logweight of the target language exceeds the rest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = ImportanceSampling.importanceWeights(docs,
        docs.where(col("lang") === "de"), col("doc_id"), col("text"))
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
    val means = w.groupBy(col("lang") === "de")
      .agg(avg(col("logweight"))).as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false))
  }
}
