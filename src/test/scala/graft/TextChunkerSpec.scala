package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextChunker

class TextChunkerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private case class Chunk(index: Int, start: Int, text: String, n: Int)

  private def chunksOf(text: String, maxTokens: Int,
                       overlap: Int): Seq[Chunk] =
    TextChunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), maxTokens, overlap)
      .orderBy("chunk_index")
      .collect()
      .map(r => Chunk(r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
      .toSeq

  test("short text yields one chunk; exact-fit text yields one chunk") {
    assert(chunksOf("a b c", 6, 2) == Seq(Chunk(0, 0, "a b c", 3)))
    assert(chunksOf("a b c d e f", 6, 2) == Seq(Chunk(0, 0, "a b c d e f", 6)))
  }

  test("chunks stride by maxTokens - overlap; the trailing chunk is never " +
    "fully contained in its predecessor") {
    // 7 tokens, max 6, overlap 2 -> chunks at 0 and 4; the stop rule must
    // NOT emit a third chunk at 8
    val got = chunksOf("t1 t2 t3 t4 t5 t6 t7", 6, 2)
    assert(got == Seq(
      Chunk(0, 0, "t1 t2 t3 t4 t5 t6", 6),
      Chunk(1, 4, "t5 t6 t7", 3)))
  }

  test("invariants hold for every token count: stride-spaced starts, " +
    "exactly-overlap shared tokens, full coverage, drop-overlap round-trip") {
    val maxTokens = 6
    val overlap = 2
    val stride = maxTokens - overlap
    for (n <- 1 to 40) {
      val toks = (1 to n).map(i => s"w$i")
      val got = chunksOf(toks.mkString(" "), maxTokens, overlap)
      val expected = 1 + math.ceil(math.max(0, n - maxTokens).toDouble / stride).toInt
      assert(got.length == expected, s"n=$n chunk count")
      got.zipWithIndex.foreach { case (c, i) =>
        assert(c.index == i && c.start == i * stride, s"n=$n start arithmetic")
        assert(c.n == math.min(maxTokens, n - c.start), s"n=$n chunk length")
        assert(c.text == toks.slice(c.start, c.start + c.n).mkString(" "),
          s"n=$n chunk text")
      }
      // coverage: the last chunk reaches the end
      assert(got.last.start + got.last.n == n, s"n=$n coverage")
      // round-trip: drop the first `overlap` tokens of every non-first
      // chunk and the token stream reassembles exactly
      val rebuilt = got.head.text.split(" ").toSeq ++
        got.tail.flatMap(_.text.split(" ").drop(overlap))
      assert(rebuilt == toks, s"n=$n round-trip")
    }
  }

  test("case and inner punctuation are preserved; whitespace is normalized") {
    assert(chunksOf("  The  Quick,\tFox! ", 6, 2) ==
      Seq(Chunk(0, 0, "The Quick, Fox!", 3)))
  }

  test("all-whitespace text yields the single empty chunk the split " +
    "convention implies, never zero rows") {
    assert(chunksOf("   ", 6, 2) == Seq(Chunk(0, 0, "", 1)))
  }

  test("zero overlap degrades to disjoint windows") {
    val got = chunksOf("a b c d e", 2, 0)
    assert(got == Seq(
      Chunk(0, 0, "a b", 2), Chunk(1, 2, "c d", 2), Chunk(2, 4, "e", 1)))
  }

  test("invalid parameters are rejected loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextChunker.chunk(df, col("doc_id"), col("text"), 0, 0)
    }
    intercept[IllegalArgumentException] {
      TextChunker.chunk(df, col("doc_id"), col("text"), 4, 4)
    }
  }
}
