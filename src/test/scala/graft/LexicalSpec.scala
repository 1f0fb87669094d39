package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Lexical

/** Parameterized lexical-retrieval operators (operators.Lexical), driven
  * with DIFFERENT queries/corpora than the oracle-gated bench constants —
  * the point of the promotion is that a user can call BM25 / RRF with
  * their own terms. */
class LexicalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    ("d1", "spark shuffles data across the cluster"),
    ("d2", "spark spark spark everywhere spark"),
    ("d3", "a quiet document about gardens"),
    ("d4", "cluster computing with big data and more data"),
    ("d5", "")).toDF("id", "text")

  test("bm25: term presence ranks above absence; rare terms outweigh " +
    "common ones; scores are bounded and deterministic") {
    val scores = Lexical.bm25(corpus, "id", "text", Seq("spark"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.size == 5) // every doc scored, including the no-match ones
    assert(scores("d2") > scores("d1")) // higher tf wins (saturating, not linear)
    assert(scores("d1") > 0.0 && scores("d3") == 0.0 && scores("d5") == 0.0)

    // two-term query: 'gardens' (df=1) carries more idf weight than
    // 'data' (df=2), so the gardens-only doc outranks a one-data doc
    val two = Lexical.bm25(corpus, "id", "text", Seq("data", "gardens"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(two("d3") > two("d1"))
    // d4 matches 'data' twice -> best 'data'-only score
    assert(two("d4") > two("d1"))

    // determinism: same input, same bytes
    val again = Lexical.bm25(corpus, "id", "text", Seq("data", "gardens"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(two == again)

    // guards
    intercept[IllegalArgumentException] {
      Lexical.bm25(corpus, "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Lexical.bm25(corpus, "id", "text", Seq("a", "a"))
    }
    // empty corpus scores nothing (no NaN avg-length blowup)
    assert(Lexical.bm25(corpus.where(lit(false)), "id", "text",
      Seq("spark")).count() == 0)
  }

  test("hybridRrf: agreement on both rankers wins; single-ranker hits " +
    "fuse with exactly 1/(rrfK+rank); ranks come from candidate sets") {
    val lex = Seq(("a", 5.0), ("b", 4.0), ("c", 3.0), ("d", 2.0))
      .toDF("id", "score")
    val vec = Seq(("a", 0.1), ("e", 0.2), ("b", 0.3))
      .toDF("id", "distance")
    val fused = Lexical.hybridRrf(lex, vec, "id", k = 10, candidates = 10,
      rrfK = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    // 'a' is rank 1 in BOTH rankers: rrf = 2/61
    assert(fused.head._1 == "a")
    assert(math.abs(fused.head._2 -
      BigDecimal(2.0 / 61.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // 'e' appears only in the vector ranking (rank 2): rrf = 1/62
    val e = fused.toMap.apply("e")
    assert(math.abs(e - BigDecimal(1.0 / 62.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // every input id surfaces (full-outer fusion), capped by k
    assert(fused.map(_._1).toSet == Set("a", "b", "c", "d", "e"))

    // candidate cut: with candidates = 1 only each ranker's top-1 fuses
    val cut = Lexical.hybridRrf(lex, vec, "id", k = 1, candidates = 1,
      rrfK = 60).collect().map(_.getString(0)).toSeq
    assert(cut == Seq("a"))

    intercept[IllegalArgumentException] {
      Lexical.hybridRrf(lex, vec, "id", k = 5, candidates = 3)
    }
  }

  test("bm25Batch: each query's scores equal the single-query bm25 " +
    "exactly (the batch is an execution strategy, not a variant)") {
    val queries = Seq(1L -> Seq("spark", "data"), 2L -> Seq("gardens"),
      3L -> Seq("cluster", "quiet", "missing"))
    val batch = Lexical.bm25Batch(corpus, "id", "text", queries)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    for ((qid, terms) <- queries) {
      val single = Lexical.bm25(corpus, "id", "text", terms)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      single.foreach { case (id, sc) =>
        assert(batch((qid, id)) == sc, s"query $qid doc $id")
      }
    }
    // guards: empty query list, duplicate ids, per-query term guards
    intercept[IllegalArgumentException] {
      Lexical.bm25Batch(corpus, "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Lexical.bm25Batch(corpus, "id", "text",
        Seq(1L -> Seq("a"), 1L -> Seq("b")))
    }
    intercept[IllegalArgumentException] {
      Lexical.bm25Batch(corpus, "id", "text", Seq(1L -> Seq.empty[String]))
    }
    intercept[IllegalArgumentException] {
      Lexical.bm25Batch(corpus, "id", "text", Seq(1L -> Seq("a", "a")))
    }
    // empty corpus: zero rows, no NaN
    assert(Lexical.bm25Batch(corpus.where(lit(false)), "id", "text",
      queries).count() == 0)
  }

  test("query terms canonicalize through the pinned Unicode contract: " +
    "a dotted-I / NFD / uppercase-ẞ query matches the indexed tokens") {
    import spark.implicits._
    val uni = Seq(
      ("a", "İSTANBUL GROẞE café"),            // what the crawl contained
      ("b", "unrelated words entirely here")).toDF("id", "text")
    // raw query terms in three different representations of the same
    // canonical tokens (NFD café included via decomposed composition)
    val scores = Lexical.bm25(uni, "id", "text",
        Seq("İstanbul", "GROẞE", "café"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("a") > 0.0, "canonicalized terms must match")
    assert(scores("b") == 0.0)
    // canonicalization can MAKE duplicates — loud, not silent
    intercept[IllegalArgumentException] {
      Lexical.bm25(uni, "id", "text", Seq("İstanbul", "istanbul"))
    }
  }

  test("bm25Batch crossing the projection-chunk boundary scores " +
    "identically to the single-projection path (one stats pass, " +
    "bounded generated code)") {
    // more queries than Bm25ProjectionBatch => at least two scoring
    // projections unioned behind ONE tokenize/tf/df pass
    val n = Lexical.Bm25ProjectionBatch + 7
    val vocab = Seq("spark", "data", "gardens", "cluster", "quiet",
      "jobs", "grow", "city")
    val queries = (1 to n).map(i =>
      i.toLong -> Seq(vocab(i % vocab.size), vocab((i + 3) % vocab.size)))
    val batch = Lexical.bm25Batch(corpus, "id", "text", queries)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // sample queries from the first chunk, the boundary, and the tail
    for (qid <- Seq(1L, Lexical.Bm25ProjectionBatch.toLong,
        Lexical.Bm25ProjectionBatch + 1L, n.toLong)) {
      val terms = queries(qid.toInt - 1)._2
      val single = Lexical.bm25(corpus, "id", "text", terms)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      single.foreach { case (id, sc) =>
        assert(batch((qid, id)) == sc, s"query $qid doc $id")
      }
    }
  }

  test("hybridRrfBatch fuses each group exactly like per-query hybridRrf") {
    val lex = Seq((1L, "a", 5.0), (1L, "b", 4.0), (1L, "c", 3.0),
      (2L, "b", 9.0), (2L, "d", 1.0))
      .toDF("qid", "id", "score")
    val vec = Seq((1L, "a", 0.1), (1L, "e", 0.2),
      (2L, "d", 0.05), (2L, "b", 0.5))
      .toDF("qid", "id", "distance")
    val batch = Lexical.hybridRrfBatch(lex, vec, "qid", "id", k = 10,
        candidates = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    for (q <- Seq(1L, 2L)) {
      val single = Lexical.hybridRrf(
          lex.where(col("qid") === q).drop("qid"),
          vec.where(col("qid") === q).drop("qid"),
          "id", k = 10, candidates = 10, rrfK = 60)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(batch.filter(_._1._1 == q).map { case ((_, id), v) => id -> v } ==
        single, s"group $q")
    }
  }
}
