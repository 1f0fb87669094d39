package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTokenizer
import graft.operators.BpeTokenizer.Merge

class BpeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeOnce is left-to-right and non-overlapping (the string-" +
    "replace semantics the SQL oracle replays)") {
    def m(toks: String*)(a: String, b: String): Seq[String] =
      BpeTokenizer.mergeOnce(toks.toArray, a, b).toSeq
    assert(m("x", "x", "x")("x", "x") == Seq("xx", "x"))
    assert(m("x", "x", "x", "x")("x", "x") == Seq("xx", "xx"))
    // a freshly merged token is NOT re-consumed as the left operand
    assert(m("x", "xx", "xx")("x", "xx") == Seq("xxx", "xx"))
    assert(m("a", "b", "a", "b")("a", "b") == Seq("ab", "ab"))
    assert(m("a", "b")("b", "a") == Seq("a", "b"))
  }

  test("trainMerges learns the most frequent pair first, breaks ties by " +
    "(lhs, rhs), and stops early when no pair repeats") {
    // 'ab' occurs 3x as a word, 'cd' twice: pair (a,b) weight 3 beats
    // (c,d) weight 2; after both merge nothing repeats
    val docs = Seq("ab ab cd", "ab cd").toDF("text")
    val merges = BpeTokenizer.trainMerges(docs, col("text"), numMerges = 10)
    assert(merges == Seq(Merge(1, "a", "b"), Merge(2, "c", "d")))
    // all-singleton corpus: nothing repeats, zero merges
    val lone = Seq("ab cd ef").toDF("text")
    assert(BpeTokenizer.trainMerges(lone, col("text")).isEmpty)
    // tie: 'ab' and 'cd' both twice -> (a,b) wins lexicographically
    val tied = Seq("ab cd", "cd ab").toDF("text")
    assert(BpeTokenizer.trainMerges(tied, col("text"), numMerges = 1) ==
      Seq(Merge(1, "a", "b")))
  }

  test("tokenCountOf applies merges in rank order to ANY trainable word " +
    "(not just the training vocabulary) and counts code points otherwise") {
    val merges = Seq(Merge(1, "a", "b"), Merge(2, "ab", "c"))
    assert(BpeTokenizer.tokenCountOf("abc", merges) == 1L)   // ab, then abc
    assert(BpeTokenizer.tokenCountOf("abcabc", merges) == 2L)
    assert(BpeTokenizer.tokenCountOf("xyz", merges) == 3L)   // no merges hit
    assert(BpeTokenizer.tokenCountOf("ababq", merges) == 3L) // ab ab q
    // non-ASCII: one token per CODE POINT (the cross-engine length())
    assert(BpeTokenizer.tokenCountOf("héllo", merges) == 5L)
    assert(BpeTokenizer.tokenCountOf("日本語", merges) == 3L)
    assert(BpeTokenizer.tokenCountOf("😀", merges) == 1L) // emoji
    assert(BpeTokenizer.tokenCountOf("", merges) == 0L)
  }

  test("tokenCounts (distributed) equals the driver-side computation " +
    "word by word") {
    val docs = Seq(
      (1L, "the cat sat the cat"),
      (2L, "the the the"),
      (3L, "Héllo wörld the")).toDF("id", "text")
    val merges = BpeTokenizer.trainMerges(docs, col("text"), numMerges = 8)
    val got = BpeTokenizer.tokenCounts(docs, col("id"), col("text"), merges)
      .orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq(
      (1L, "the cat sat the cat"),
      (2L, "the the the"),
      (3L, "héllo wörld the")).map { case (id, t) =>
      val words = t.trim.split("\\s+").toSeq
      (id, words.size.toLong,
        words.map(w => BpeTokenizer.tokenCountOf(w, merges)).sum)
    }
    assert(got == expected)
    // with enough repetition 'the' should have merged to one token
    assert(BpeTokenizer.tokenCountOf("the", merges) == 1L)
  }

  test("tokenize concatenates back to the word; encodedTokens flattens " +
    "subtokens in word order (distributed == driver-side)") {
    val docs = Seq(
      (1L, "the cat the cat sat"),
      (2L, "Héllo the"),
      (3L, "the the the the")).toDF("id", "text")
    val merges = BpeTokenizer.trainMerges(docs, col("text"), numMerges = 6)
    // reassembly invariant: subtokens concatenate to the original word
    for (w <- Seq("the", "cat", "hello", "héllo", "unseen"))
      assert(BpeTokenizer.tokenize(w, merges).mkString == w)
    val got = BpeTokenizer.encodedTokens(docs, col("id"), col("text"), merges)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    val expected = Seq(
      (1L, "the cat the cat sat"), (2L, "héllo the"),
      (3L, "the the the the")).map { case (id, t) =>
      (id, t.split(" ").toSeq.flatMap(w =>
        BpeTokenizer.tokenize(w, merges).toSeq))
    }
    assert(got == expected)
  }

  test("training is deterministic: two runs over a shuffled corpus " +
    "yield identical merge lists") {
    val base = (0 until 50).map(i => s"alpha beta gamma delta w$i")
    val a = BpeTokenizer.trainMerges(base.toDF("text"), col("text"))
    val b = BpeTokenizer.trainMerges(
      scala.util.Random.shuffle(base).toDF("text").repartition(5),
      col("text"))
    assert(a == b && a.nonEmpty)
  }
}
