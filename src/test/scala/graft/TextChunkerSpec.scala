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

  private case class SChunk(index: Int, text: String, nSents: Long, nToks: Long)

  private def sentChunks(text: String, budget: Int): Seq[SChunk] =
    TextChunker.chunkBySentences(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), budget)
      .orderBy("chunk_index")
      .collect()
      .map(r => SChunk(r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("sentence chunking: sentences are atomic — each lands in the " +
    "bucket of its first token, never split") {
    // 3 sentences of 4/4/3 tokens with budget 6: s1 starts at 0 (bucket
    // 0), s2 at 4 (bucket 0), s3 at 8 (bucket 1)
    val got = sentChunks(
      "One two three four. Five six seven eight. Nine ten eleven.", 6)
    assert(got == Seq(
      SChunk(0, "One two three four. Five six seven eight.", 2, 8),
      SChunk(1, "Nine ten eleven.", 1, 3)))
  }

  test("sentence chunking: an over-budget sentence occupies its bucket " +
    "alone and chunk indices stay dense") {
    // s1 = 7 tokens (budget 3): bucket floor skips values 1..2; the
    // renumber must keep chunk_index dense 0,1
    val got = sentChunks("a b c d e f g. h i.", 3)
    assert(got.map(_.index) == Seq(0, 1))
    assert(got(0).text == "a b c d e f g." && got(0).nToks == 7)
    assert(got(1).text == "h i." && got(1).nToks == 2)
  }

  test("sentence chunking: terminator runs and terminator-free tails " +
    "both count as sentences; empty text emits no rows") {
    val got = sentChunks("Really?! Yes... no terminator tail", 100)
    assert(got.length == 1 && got.head.nSents == 3)
    assert(got.head.text == "Really?! Yes... no terminator tail")
    assert(sentChunks("", 10).isEmpty)
  }

  test("sentence chunking: multi-doc bucketing is per-document") {
    val df = Seq((1L, "a b. c d."), (2L, "e f g h i j. k."))
      .toDF("doc_id", "text")
    val got = TextChunker.chunkBySentences(df, col("doc_id"), col("text"), 4)
      .orderBy("id", "chunk_index")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 0, "a b. c d."),
      (2L, 0, "e f g h i j."), (2L, 1, "k.")))
  }

  test("invalid parameters are rejected loudly") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextChunker.chunk(df, col("doc_id"), col("text"), 0, 0)
    }
    intercept[IllegalArgumentException] {
      TextChunker.chunk(df, col("doc_id"), col("text"), 4, 4)
    }
    intercept[IllegalArgumentException] {
      TextChunker.chunkBySentences(df, col("doc_id"), col("text"), 0)
    }
  }
}
