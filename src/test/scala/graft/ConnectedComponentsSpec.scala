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
    "returning unconverged labels") {
    // path graph of diameter 5 cannot settle in 2 rounds
    val chain = (1L until 6L).map(i => (i, i + 1))
    intercept[IllegalStateException] { run(chain, maxIters = 2) }
    assert(run(chain).values.toSet == Set(1L)) // default bound converges
  }
}
