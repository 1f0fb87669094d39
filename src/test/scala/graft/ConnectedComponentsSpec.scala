package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxIters: Int = 20): Map[Long, Long] =
    ConnectedComponents.components(
        edges.toDF("a", "b"), "a", "b", maxIters)
      .as[(Long, Long)].collect().toMap

  test("chains close transitively, separate clusters stay separate, " +
    "non-edge nodes are absent") {
    val got = run(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("label direction does not matter (min flows against edge order)") {
    // min id at the END of the chain, edges pointing away from it
    val got = run(Seq((9L, 4L), (4L, 2L), (2L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("random graph matches a union-find reference") {
    val rng = new scala.util.Random(42L)
    val edges = Seq.fill(80)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    // union-find roots are path-dependent; normalize to min-of-component
    val byRoot = expected.groupBy(_._2).map { case (_, m) => m.keys.min -> m.keys }
    val want = byRoot.flatMap { case (mn, ns) => ns.map(_ -> mn) }.toMap
    assert(run(edges) == want)
  }

  test("a round bound too small for the diameter throws instead of " +
    "returning unconverged labels — and the throw path leaks no " +
    "persisted generation (the unreturned final frame is released too)") {
    // path graph of diameter 5 cannot settle in 2 rounds
    val chain = (1L until 6L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    intercept[IllegalStateException] { run(chain, maxIters = 2) }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.filterNot(before)
    assert(leaked.isEmpty, s"throw path left ${leaked.size} persisted RDDs")
    assert(run(chain).values.toSet == Set(1L)) // default bound converges
  }

  test("maxIters sized exactly to the change-round count converges — the " +
    "certification round is granted beyond the bound, not charged to it") {
    // path 1-2-3-4-5-6: the min label needs 5 propagation rounds to reach
    // node 6, so labels change in rounds 1..5 and round 6 only certifies.
    // maxIters = 5 must therefore PASS (a bound that throws here forces
    // every caller to secretly size diameter+1).
    val chain = (1L until 6L).map(i => (i, i + 1))
    assert(run(chain, maxIters = 5).values.toSet == Set(1L))
    intercept[IllegalStateException] { run(chain, maxIters = 4) }
  }

  test("superseded checkpoint generations are released: a run leaves at " +
    "most one label generation (plus whatever was persisted before) in " +
    "the block store") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val got = run((1L until 8L).map(i => (i, i + 1))) // 7 change rounds
    assert(got.values.toSet == Set(1L))
    val added = sc.getPersistentRDDs.keySet.filterNot(before)
    // without release: sym + initial labels + one RDD per round ≈ 10+;
    // with release: only the returned final generation survives
    assert(added.size <= 1, s"leaked ${added.size} persisted RDD generations")
  }
}
