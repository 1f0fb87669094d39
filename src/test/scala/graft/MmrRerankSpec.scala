package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MmrRerank

/** MMR re-ranking contract (operators/MmrRerank.scala). */
class MmrRerankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val q = Array(1f, 0f, 0f)

  // 1 and 2 are near-duplicates aligned with the query; 3 is less
  // relevant but diverse; 4 is orthogonal
  private def pool = Seq(
    (1L, Seq(1f, 0.01f, 0f)),
    (2L, Seq(1f, 0.02f, 0f)),
    (3L, Seq(0.7f, 0.7f, 0f)),
    (4L, Seq(0f, 0f, 1f)),
  ).toDF("vec_id", "embedding")

  private def ranks(lambda: Double, k: Int = 3): Seq[Long] =
    MmrRerank.rerank(pool, col("vec_id"), col("embedding"), q,
        k = k, poolSize = 10, lambda = lambda)
      .orderBy("rank").select("id").as[Long].collect().toSeq

  test("lambda=1 is pure relevance order (distance, id)") {
    assert(ranks(1.0, k = 4) == Seq(1L, 2L, 3L, 4L))
  }

  test("diversity: a moderate lambda demotes the near-duplicate") {
    // after picking 1, candidate 2's penalty (sim to 1 ~ 1.0) sinks its
    // score below even the orthogonal 4 (penalty 0); 3 is mid-relevance
    // but its sim to 1 (~0.71) still outweighs the relevance edge, so the
    // order is 1, 4 (fully diverse), then 2 back in on relevance
    assert(ranks(0.5) == Seq(1L, 4L, 2L))
    // pure relevance would have been 1, 2, 3 — the duplicate IS demoted
  }

  test("k larger than the pool selects the whole pool, in MMR order") {
    val out = MmrRerank.rerank(pool, col("vec_id"), col("embedding"), q,
      k = 4, poolSize = 10, lambda = 0.5)
    assert(out.count() == 4)
    assert(out.select("rank").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("deterministic across runs; mmr scores are non-increasing in rank " +
    "only when diversity does not bind (scores may interleave), but rank 1 " +
    "is always the top-relevance candidate") {
    val a = ranks(0.7); val b = ranks(0.7)
    assert(a == b)
    assert(a.head == 1L)
  }

  test("exact-duplicate candidates: the smaller id wins its slot") {
    val dup = Seq(
      (7L, Seq(1f, 0f, 0f)),
      (5L, Seq(1f, 0f, 0f)),
      (9L, Seq(0f, 1f, 0f)),
    ).toDF("vec_id", "embedding")
    // at lambda=0.5 the duplicate 7 and the orthogonal 9 TIE at score 0
    // (0.5*1 - 0.5*1 == 0.5*0 - 0.5*0): the smaller id (7) wins the slot
    val tied = MmrRerank.rerank(dup, col("vec_id"), col("embedding"), q,
        k = 2, poolSize = 5, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(tied == Seq(5L, 7L))
    // at lambda=0.4 diversity outweighs: the duplicate scores -0.2 and
    // the orthogonal 9 takes rank 2
    val diverse = MmrRerank.rerank(dup, col("vec_id"), col("embedding"), q,
        k = 2, poolSize = 5, lambda = 0.4)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(diverse == Seq(5L, 9L))
  }

  test("zero-norm vectors: neutral similarity, finite scores at any lambda") {
    val withZero = Seq(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 0f)), // zero-norm: rel 0.0, pair sims 0.0
      (3L, Seq(0.5f, 0.5f, 0f)),
    ).toDF("vec_id", "embedding")
    for (lam <- Seq(0.0, 0.5, 1.0)) {
      val out = MmrRerank.rerank(withZero, col("vec_id"), col("embedding"), q,
          k = 3, poolSize = 5, lambda = lam)
        .select("id", "relevance", "mmr").as[(Long, Double, Double)]
        .collect()
      assert(out.length == 3)
      assert(out.forall { case (_, r, m) => !r.isNaN && !r.isInfinite &&
        !m.isNaN && !m.isInfinite }, s"lambda=$lam: $out")
      // the zero-norm row's relevance is the neutral 0.0
      assert(out.find(_._1 == 2L).get._2 == 0.0d)
    }
    // determinism across runs with the zero-norm row present
    def run() = MmrRerank.rerank(withZero, col("vec_id"), col("embedding"), q,
      k = 3, poolSize = 5, lambda = 0.5).select("id").as[Long].collect().toSeq
    assert(run() == run())
  }

  test("lambda=0: rank 1 is the TOP-RELEVANCE candidate (the SQL twin's " +
    "relevance-ordered base case), not the smallest id of an all-zero tie") {
    val out = MmrRerank.rerank(pool, col("vec_id"), col("embedding"), q,
        k = 3, poolSize = 10, lambda = 0.0)
      .orderBy("rank").select("id", "mmr").as[(Long, Double)]
      .collect().toSeq
    // top relevance is id 1 (nearest to q); with lambda=0 its RECORDED
    // score is still lambda*rel = 0.0 (penalty 0 on the first pick)
    assert(out.head == (1L, 0.0d), out)
    // after rank 1, pure-diversity selection (lambda=0) picks the
    // candidate farthest from everything selected: the orthogonal 4
    assert(out(1)._1 == 4L, out)
  }

  test("sf0.001: output is k rows drawn from the pool, rank 1 = query itself") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val out = MmrRerank.rerank(emb, col("vec_id"), col("embedding"), query,
        k = 5, poolSize = 20, lambda = 0.7)
      .orderBy("rank")
      .select("id", "relevance", "mmr").as[(Long, Double, Double)]
      .collect().toSeq
    assert(out.size == 5)
    assert(out.head._1 == 0L && out.head._2 == 1.0d)
    // rank-1 score is lambda * relevance with zero penalty
    assert(out.head._3 == 0.7d)
  }
}
