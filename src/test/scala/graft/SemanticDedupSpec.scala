package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, SemanticDedup}
import graft.operators.IvfIndex.Centroid

/** SemDeDup contract (operators/SemanticDedup.scala): cell-blocked pairs,
  * the farthest-from-centroid keep rule, and the rep-level optimization's
  * equivalence with the member-level contract — including the adversarial
  * cases the optimization reasons about (exact-duplicate groups, rounded
  * cdist ties, zero-norm embeddings). */
class SemanticDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // two well-separated centroids on the axes
  private val cents = Seq(
    Centroid(0L, Array(1f, 0f)),
    Centroid(1L, Array(0f, 1f)))

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  private def survivorIds(rows: (Long, Seq[Float])*): Seq[Long] =
    SemanticDedup.survivors(df(rows: _*), col("vec_id"), col("embedding"),
        cents, threshold = 0.3)
      .select("id").as[Long].collect().toSeq

  /** Brute-force MEMBER-LEVEL evaluation of the documented contract:
    * all pairs, same cell, rounded cosine <= threshold, drop the
    * dominated endpoint (larger rounded cdist wins, ties keep the
    * smaller id). */
  private def bruteForce(rows: Seq[(Long, Seq[Float])],
                         threshold: Double): Seq[Long] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def nrm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (na, nb) = (nrm(a), nrm(b))
      if (na == 0.0d || nb == 0.0d) return Double.PositiveInfinity
      val raw = 1.0d - dot(a, b) / (na * nb)
      val r = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      if (r == 0.0d) 0.0d else r // normalize -0.0 like round(x,6)+0.0
    }
    def cell(v: Seq[Float]): Long =
      cents.map(c => (math.sqrt(c.vec.zip(v).map { case (x, y) =>
        val d = x.toDouble - y.toDouble; d * d }.sum), c.id)).min._2
    val st = rows.map { case (id, v) =>
      (id, v, cell(v), cos(v, cents(cell(v).toInt).vec.toSeq))
    }
    st.filter { case (id, v, c, cd) =>
      !st.exists { case (id2, v2, c2, cd2) =>
        id2 != id && c2 == c && cos(v, v2) <= threshold &&
          (cd2 > cd || (cd2 == cd && id2 < id))
      }
    }.map(_._1).sorted
  }

  test("pairs: only within-cell pairs under the threshold, both orders collapsed") {
    val d = df(
      1L -> Seq(1f, 0.05f), 2L -> Seq(1f, 0.06f), // cell 0, near
      3L -> Seq(0.05f, 1f),                        // cell 1
      4L -> Seq(-1f, 0.2f))                        // cell 1, far from 3
    val pairs = SemanticDedup.pairs(d, col("vec_id"), col("embedding"),
        cents, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("exact duplicates pair at distance 0.0 and expand over members") {
    val d = df(1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f), 3L -> Seq(1f, 0f))
    val pairs = SemanticDedup.pairs(d, col("vec_id"), col("embedding"),
        cents, threshold = 0.0)
      .select("id_a", "id_b", "distance").as[(Long, Long, Double)]
      .collect().toSet
    assert(pairs == Set((1L, 2L, 0.0d), (2L, 3L, 0.0d), (1L, 3L, 0.0d)))
  }

  test("survivors: farthest-from-centroid wins, not smallest id") {
    // 2 is farther from centroid 0 than 1; they are near-dups -> 1 drops
    val d = df(1L -> Seq(1f, 0.05f), 2L -> Seq(1f, 0.3f), 3L -> Seq(0f, 1f))
    assert(survivorIds(1L -> Seq(1f, 0.05f), 2L -> Seq(1f, 0.3f),
      3L -> Seq(0f, 1f)) == Seq(2L, 3L))
    val out = SemanticDedup.survivors(d, col("vec_id"), col("embedding"),
        cents, threshold = 0.3)
      .select("id", "cell").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 0L), (3L, 1L)))
  }

  test("survivors: exact-duplicate group keeps the smallest id") {
    assert(survivorIds(5L -> Seq(1f, 0f), 9L -> Seq(1f, 0f),
      7L -> Seq(1f, 0f)) == Seq(5L))
  }

  test("zero-norm embeddings never qualify as duplicates — all survive") {
    assert(survivorIds(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f),
      3L -> Seq(1f, 0f)) == Seq(1L, 2L, 3L))
  }

  test("cross-cell near vectors are NOT paired (the method's cluster scoping)") {
    // on the decision boundary: nearly identical vectors in different cells
    val a = Seq(1f, 0.999f); val b = Seq(0.999f, 1f)
    val d = df(1L -> a, 2L -> b)
    val pairs = SemanticDedup.pairs(d, col("vec_id"), col("embedding"),
      cents, threshold = 0.5).count()
    assert(pairs == 0)
    assert(survivorIds(1L -> a, 2L -> b) == Seq(1L, 2L))
  }

  test("property: rep-level survivors == brute-force member-level contract") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      // adversarial pool: duplicates, zero vectors, boundary points, and
      // scaled copies (same direction -> cosine 0, same cell, cdist tie)
      val pool = Seq(
        Seq(1f, 0f), Seq(0f, 1f), Seq(0f, 0f), Seq(1f, 1f),
        Seq(1f, 0.1f), Seq(0.1f, 1f), Seq(2f, 0f), Seq(0.5f, 0f),
        Seq(-1f, 0.2f), Seq(0.2f, -1f))
      val n = 6 + rnd.nextInt(6)
      val rows = (1 to n).map(i =>
        (rnd.nextInt(100).toLong * 2 + (i % 2), pool(rnd.nextInt(pool.size))))
        .groupBy(_._1).map(_._2.head).toSeq // distinct ids
      val got = survivorIds(rows: _*)
      val want = bruteForce(rows, 0.3)
      assert(got == want, s"trial $trial rows=$rows")
    }
  }

  test("sf0.001: survivors + dropped partition the corpus; pairs only drop") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = graft.queries.AnnQueries.fixtureCentroids(spark)
    val total = emb.count()
    val surv = SemanticDedup.survivors(emb, col("vec_id"), col("embedding"),
      model, threshold = 0.6)
    assert(surv.count() <= total)
    // every dropped row has a qualifying dominating partner in the pairs
    val pairs = SemanticDedup.pairs(emb, col("vec_id"), col("embedding"),
      model, threshold = 0.6)
    val paired = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().as[Long].collect().toSet
    val dropped = emb.select(col("vec_id")).as[Long].collect().toSet --
      surv.select("id").as[Long].collect().toSet
    assert(dropped.subsetOf(paired))
  }
}
