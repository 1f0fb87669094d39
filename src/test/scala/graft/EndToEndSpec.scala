package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** The reference's flagship end-to-end flow (tests/test_api.py:12-75),
  * translated: create library -> document -> chunks -> search ->
  * filtered search -> no-match filter -> pagination math -> LSH
  * index_kind passthrough -> cascade teardown, all through the facade. */
class EndToEndSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("full library -> document -> chunk -> search lifecycle") {
    val e = VectorEngine.create(spark)

    // create (defaults: cosine / flat — api.py:229-236)
    val lib = e.createLibrary("e2e", dim = 3,
      metadata = Map("owner" -> "tests", "priority" -> 1))
    assert(lib.distance_metric == "cosine" && lib.index_kind == "flat")

    val doc = e.createDocument(lib.id, "doc-1", Map("topic" -> "greetings"))
    assert(e.documentCount(lib.id) == 1)

    // batch insert with typed metadata
    e.addChunksBatch(doc.id, Seq(
      ChunkInput("hello world", vec(1, 0, 0), Map("lang" -> "en", "rank" -> 1), 0, Some("h0")),
      ChunkInput("bonjour monde", vec(0, 1, 0), Map("lang" -> "fr", "rank" -> 2), 1, Some("h1")),
      ChunkInput("hallo welt", vec(0, 0, 1), Map("lang" -> "de", "rank" -> 1), 2, Some("h2"))))
    assert(e.chunkCount(lib.id) == 3)

    // search: nearest to (1, 0.1, 0) is h0
    val hits = e.search(lib.id, vec(1, 0.1, 0), k = 2).collect()
    assert(hits.length == 2 && hits.head.getString(0) == "h0")

    // filtered search: only the fr chunk (typed equality)
    val fr = e.search(lib.id, vec(1, 0.1, 0), k = 5, Map("lang" -> "fr")).collect()
    assert(fr.map(_.getString(0)).toSeq == Seq("h1"))
    // int-typed filter
    val rank1 = e.search(lib.id, vec(1, 0.1, 0), k = 5, Map("rank" -> 1))
      .collect().map(_.getString(0)).toSet
    assert(rank1 == Set("h0", "h2"))
    // no-match filter -> empty, not error (vector_store.py:256-258)
    assert(e.search(lib.id, vec(1, 0, 0), k = 5, Map("lang" -> "zz")).count() == 0)

    // pagination math (test_api.py:102-129)
    val page = e.listChunks(doc.id, skip = 1, limit = 1)
    assert(page.total == 3 && page.items.map(_.id) == Seq("h1") && page.hasMore)
    val lastPage = e.listChunks(doc.id, skip = 2, limit = 1)
    assert(!lastPage.hasMore)

    // LSH index_kind passthrough (test_api.py:86-99)
    val lsh = e.createLibrary("e2e-lsh", dim = 3, indexKind = "random_projection",
      lshProjections = 2, lshSeed = 5L)
    val ldoc = e.createDocument(lsh.id, "ld")
    e.addChunk(ldoc.id, ChunkInput("x", vec(0.5, 0.5, 0), id = Some("lx")))
    assert(e.getLibrary(lsh.id).index_kind == "random_projection")
    assert(e.getChunk("lx").bucket.isDefined)
    assert(e.search(lsh.id, vec(0.5, 0.5, 0), 1).collect().head.getString(0) == "lx")

    // orphan document rejected (test_api.py:78-84)
    intercept[NotFoundError] { e.createDocument("no-such-lib", "orphan") }

    // cascade teardown (api.py:263-266)
    e.deleteLibrary(lib.id)
    intercept[NotFoundError] { e.getChunk("h0") }
    assert(e.librariesDf.count() == 1) // only the LSH library remains
  }
}
