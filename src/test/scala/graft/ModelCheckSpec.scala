package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** Model-based random-walk check of the engine's CRUD + cascade + search
  * semantics: a seeded sequence of operations is applied BOTH to the
  * engine and to a trivial in-memory reference model (plain maps — the
  * same shape the reference implementation uses, vector_store.py:20-30),
  * then the full visible state must agree: entity id sets, derived
  * counts, cascade effects, and a flat search against brute force over
  * the model. A save + reopen happens MID-WALK at a random step, so
  * persistence is exercised under an arbitrary mutation history, not
  * just the hand-built states the targeted specs use.
  *
  * Seeded and deterministic — a failure reproduces exactly. */
class ModelCheckSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private case class MChunk(id: String, docId: String, libId: String,
                            text: String, emb: Seq[Float], idx: Int)

  test("300-op random walk: engine state == reference model state " +
    "(ids, counts, cascades, search), with a mid-walk save/reopen") {
    val rng = new scala.util.Random(20260813L)
    var e = VectorEngine.create(spark)
    // reference model
    var mLibs = Set.empty[String]
    var mDocs = Map.empty[String, String]            // doc -> lib
    var mChunks = Map.empty[String, MChunk]
    var nextId = 0
    def fresh(prefix: String): String = { nextId += 1; s"$prefix$nextId" }
    def randVec(): Seq[Float] = Seq.fill(4)(rng.nextFloat() * 2 - 1)
    def pick[T](xs: Iterable[T]): Option[T] =
      if (xs.isEmpty) None else Some(xs.toSeq(rng.nextInt(xs.size)))

    val reopenAt = 100 + rng.nextInt(100)
    (0 until 300).foreach { step =>
      if (step == reopenAt) {
        // persistence under an arbitrary history: save, reopen, continue
        val dir = java.nio.file.Files.createTempDirectory("graft-walk").toString
        e.save(dir)
        e = VectorEngine.open(spark, dir)
      }
      rng.nextInt(10) match {
        case 0 | 1 =>
          val id = fresh("L")
          e.createLibrary(s"lib-$id", dim = 4, id = Some(id))
          mLibs += id
        case 2 | 3 =>
          pick(mLibs).foreach { lib =>
            val id = fresh("D")
            e.createDocument(lib, s"doc-$id", id = Some(id))
            mDocs += id -> lib
          }
        case 4 | 5 | 6 =>
          pick(mDocs.keys).foreach { doc =>
            val id = fresh("C")
            val v = randVec()
            e.addChunksBatch(doc, Seq(
              ChunkInput(s"text $id", v, Map.empty, nextId, Some(id))))
            mChunks += id -> MChunk(id, doc, mDocs(doc), s"text $id", v, nextId)
          }
        case 7 =>
          pick(mChunks.keys).foreach { id =>
            val v = randVec()
            e.patchChunk(id, embedding = Some(v))
            mChunks += id -> mChunks(id).copy(emb = v)
          }
        case 8 =>
          pick(mChunks.keys).foreach { id =>
            e.deleteChunk(id)
            mChunks -= id
          }
        case 9 =>
          if (rng.nextBoolean())
            pick(mDocs.keys).foreach { doc =>
              e.deleteDocument(doc)
              mDocs -= doc
              mChunks = mChunks.filterNot(_._2.docId == doc)
            }
          else
            pick(mLibs).foreach { lib =>
              e.deleteLibrary(lib)
              mLibs -= lib
              mDocs = mDocs.filterNot(_._2 == lib)
              mChunks = mChunks.filterNot(_._2.libId == lib)
            }
      }
    }
    // full-state agreement
    assert(e.librariesDf.select("id").collect().map(_.getString(0)).toSet
      == mLibs)
    assert(e.documentsDf.select("id").collect().map(_.getString(0)).toSet
      == mDocs.keySet)
    assert(e.chunksDf.select("id").collect().map(_.getString(0)).toSet
      == mChunks.keySet)
    // derived counts per library (cascades cannot leave drift behind)
    mLibs.foreach { lib =>
      assert(e.documentCount(lib) == mDocs.count(_._2 == lib), s"docs of $lib")
      assert(e.chunkCount(lib) == mChunks.count(_._2.libId == lib),
        s"chunks of $lib")
    }
    // search every non-empty library == brute force over the model
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]): Double =
        x.zip(y).foldLeft(0.0d) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      val (na, nb) = (math.sqrt(dot(a, a)), math.sqrt(dot(b, b)))
      if (na == 0.0d || nb == 0.0d) Double.PositiveInfinity
      else 1.0d - dot(a, b) / (na * nb)
    }
    mLibs.filter(lib => mChunks.values.exists(_.libId == lib)).foreach { lib =>
      val q = randVec()
      val got = e.search(lib, q, k = 5).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      val want = mChunks.values.filter(_.libId == lib)
        .map(c => (c.id, math.rint(cosine(c.emb, q) * 1e6) / 1e6 + 0.0d))
        .toSeq.sortBy(p => (p._2, p._1)).take(5)
      assert(got.map(_._1) == want.map(_._1), s"search ranking in $lib")
    }
    info(s"final state: ${mLibs.size} libraries, ${mDocs.size} documents, " +
      s"${mChunks.size} chunks; reopened at step $reopenAt")
  }
}
