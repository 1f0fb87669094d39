package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.VectorEngine

/** Lifecycle of the harness-side per-dir engine caches
  * (queries/EngineQueries.cachedEngine — VERDICT r16/r17 carry-over):
  * an engine is session-bound, so entries owned by a REPLACED session
  * are unusable and must be evicted instead of accumulating for the
  * process lifetime across all dirs. */
class EngineCacheSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("cachedEngine: same-session hits reuse the instance; a call from " +
    "a NEWER session evicts every stale entry across ALL dirs, not just " +
    "the one being rebuilt") {
    val cache = scala.collection.mutable.HashMap[
      String, (org.apache.spark.sql.SparkSession, VectorEngine)]()
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession): VectorEngine = {
      builds += 1; VectorEngine.create(s)
    }
    val a = graft.queries.EngineQueries.cachedEngine(cache, s1, "dirA")(build(s1))
    val a2 = graft.queries.EngineQueries.cachedEngine(cache, s1, "dirA")(build(s1))
    assert((a eq a2) && builds == 1, "same (session, dir) must hit")
    graft.queries.EngineQueries.cachedEngine(cache, s1, "dirB")(build(s1))
    assert(cache.keySet == Set("dirA", "dirB") && builds == 2)
    // a NEWER session arrives: both of s1's entries (dirA AND dirB) are
    // stale — the build of dirA under s2 must drop them both
    graft.queries.EngineQueries.cachedEngine(cache, s2, "dirA")(build(s2))
    assert(builds == 3)
    assert(cache.keySet == Set("dirA"),
      s"stale s1 entries must be evicted, got ${cache.keySet}")
    assert(cache("dirA")._1 eq s2)
    // the production maps exist and share the helper's type
    assert(graft.queries.EngineQueries.curatedEngines != null)
    assert(graft.queries.EngineQueries.dsirEngines != null)
  }
}
