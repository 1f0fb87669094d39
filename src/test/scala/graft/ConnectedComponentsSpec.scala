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

  test("skew stress: a 50k-edge hub-and-spoke mega-component (one hot " +
    "grouping key) converges in ONE round in both variants with bounded " +
    "peak storage") {
    val sc = spark.sparkContext
    val n = 50000L
    // every edge lands on node 0: the degenerate-skew shape — 50k rows
    // funnel through a single groupBy key in every propagation round
    val hub = spark.range(1L, n + 1L)
      .select(lit(0L).as("a"), col("id").as("b"))
    // hash-min: a star has diameter 2 but min-eccentricity 1 — maxIters=1
    // pins the round count (the loud guard throws if a second
    // label-change round were needed)
    val before1 = sc.getPersistentRDDs.keySet.toSet
    val got = ConnectedComponents.components(hub, "a", "b", maxIters = 1)
    assert(got.where(col("comp") =!= 0L).limit(1).count() == 0)
    assert(got.count() == n + 1L)
    val added1 = sc.getPersistentRDDs.keySet.filterNot(before1)
    assert(added1.size <= 1,
      s"hash-min leaked ${added1.size} persisted generations under skew")
    // large-star/small-star: a star IS the fixpoint form — one round
    // proves it (maxIters=1 throws otherwise); readout + node universe
    // may stay pinned, but never one generation per round
    val before2 = sc.getPersistentRDDs.keySet.toSet
    val gotStar = ConnectedComponents.componentsStar(hub, "a", "b", maxIters = 1)
    assert(gotStar.where(col("comp") =!= 0L).limit(1).count() == 0)
    assert(gotStar.count() == n + 1L)
    val added2 = sc.getPersistentRDDs.keySet.filterNot(before2)
    assert(added2.size <= 2,
      s"componentsStar leaked ${added2.size} persisted generations under skew")
  }

  // ---- large-star/small-star variant (adversarial diameters) ----

  private def runStar(edges: Seq[(Long, Long)], maxIters: Int = 40): Map[Long, Long] =
    ConnectedComponents.componentsStar(
        edges.toDF("a", "b"), "a", "b", maxIters)
      .as[(Long, Long)].collect().toMap

  test("componentsStar: an adversarially long path converges in the " +
    "O(log n) bound where hash-min's default diameter bound throws") {
    // 200-node path: diameter 199 — hash-min needs 199 change rounds
    val path = (1L until 200L).map(i => (i, i + 1))
    intercept[IllegalStateException] { run(path) } // default maxIters = 20
    val got = runStar(path) // default 40 rounds covers log2(200) easily
    assert(got.size == 200 && got.values.toSet == Set(1L))
    // and a tight log-scale bound suffices: 2 * ceil(log2 200) = 16
    assert(runStar(path, maxIters = 16).values.toSet == Set(1L))
  }

  test("componentsStar ≡ hash-min on random graphs (equivalence property)") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
        .filter { case (a, b) => a != b }
      assert(runStar(edges) == run(edges, maxIters = 80),
        s"variant mismatch at seed $seed")
    }
  }

  test("componentsStar: chains, separate clusters, min against edge " +
    "direction, self-loop-only nodes") {
    assert(runStar(Seq((1L, 2L), (2L, 3L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    assert(runStar(Seq((9L, 4L), (4L, 2L), (2L, 1L))).values.toSet == Set(1L))
    // self-loops connect nothing but the node still gets a row
    assert(runStar(Seq((3L, 3L), (1L, 2L))) ==
      Map(3L -> 3L, 1L -> 1L, 2L -> 1L))
  }

  test("null edge endpoints throw loudly in both variants instead of " +
    "silently vanishing through the joins") {
    val edges = Seq((Some(1L), Some(2L)), (Some(2L), None))
      .toDF("a", "b")
    val e1 = intercept[Exception] {
      ConnectedComponents.components(edges, "a", "b").collect()
    }
    assert(e1.getMessage.contains("null edge endpoint") ||
      Option(e1.getCause).exists(_.getMessage.contains("null edge endpoint")))
    val e2 = intercept[Exception] {
      ConnectedComponents.componentsStar(edges, "a", "b").collect()
    }
    assert(e2.getMessage.contains("null edge endpoint") ||
      Option(e2.getCause).exists(_.getMessage.contains("null edge endpoint")))
  }
}
