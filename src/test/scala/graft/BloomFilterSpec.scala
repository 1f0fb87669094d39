package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomFilter

/** The Bloom seen-key gate: the no-false-negative guarantee (the property
  * that makes it safe as a pre-filter), packed-word equivalence to plain
  * position-set membership, the gate's candidate/definite-new routing,
  * and the scan-shape claim (the membership test is a pure projection —
  * no join in its plan). */
class BloomFilterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpusKeys =
    (1 to 40).map(i => s"https://seen.example.com/page/$i")
  private val corpus = corpusKeys.toDF("key")

  test("no false negatives: every corpus key tests positive, at any m/k") {
    for ((m, k) <- Seq((64, 2), (256, 3), (1024, 4))) {
      val words = BloomFilter.build(corpus, col("key"), m, k)
      val negs = corpus
        .where(!BloomFilter.mightContain(col("key"), words, m, k))
        .count()
      assert(negs == 0L, s"false negatives at m=$m k=$k")
    }
  }

  test("packed words are exactly position-set membership: mightContain " +
    "agrees with a driver-side recomputation over the raw positions") {
    val m = 128; val k = 3
    val words = BloomFilter.build(corpus, col("key"), m, k)
    // reference: the set of positions, no packing
    val posSet = corpus
      .select(explode(array((0 until k).map(j =>
        BloomFilter.position(j, col("key"), m)): _*)).as("p"))
      .distinct().as[Long].collect().toSet
    val probes = ((1 to 40).map(i => s"https://seen.example.com/page/$i") ++
      (1 to 60).map(i => s"https://new.example.org/item/$i")).toDF("key")
    val got = probes
      .select(col("key"),
        array((0 until k).map(j =>
          BloomFilter.position(j, col("key"), m)): _*).as("poss"),
        BloomFilter.mightContain(col("key"), words, m, k).as("hit"))
      .as[(String, Seq[Long], Boolean)].collect()
    got.foreach { case (key, poss, hit) =>
      assert(hit == poss.forall(posSet.contains),
        s"packed/set divergence on $key")
    }
    assert(got.count(_._3) >= 40, "all corpus probes must hit")
  }

  test("gate: seen keys are bloom-positive AND is_seen; unseen keys are " +
    "either definite-new or a false positive the exact confirm rejects") {
    val m = 64; val k = 2 // deliberately undersized: false positives likely
    val words = BloomFilter.build(corpus, col("key"), m, k)
    val batch = (Seq(5, 17).map(i => (i.toLong, corpusKeys(i - 1))) ++
      (100L to 140L).map(i => (i, s"https://new.example.org/item/$i")))
      .toDF("id", "key")
    val out = BloomFilter.gate(batch, col("key"), corpus, words, m, k)
      .select(col("id"), col("bloom_positive"), col("is_seen"))
      .as[(Long, Boolean, Boolean)].collect()
      .map { case (id, b, s) => id -> ((b, s)) }
      .toMap // id -> (bloom_positive, is_seen)
    assert(out(5L) == ((true, true)) && out(17L) == ((true, true)),
      "seen keys must be positive and confirmed")
    val newIds = (100L to 140L)
    assert(newIds.forall(i => !out(i)._2), "no new key may be is_seen")
    // no false negatives anywhere; false positives (if any) carry
    // bloom_positive=true, is_seen=false — both shapes legal for new keys
    assert(out.values.forall { case (b, s) => b || !s },
      "is_seen without bloom_positive is impossible by construction")
  }

  test("gate: a batch already carrying a reserved column name fails " +
    "LOUDLY instead of being silently clobbered (ADVICE r19 — the " +
    "no-collision contract is a require, not a scaladoc note)") {
    val m = 64; val k = 2
    val words = BloomFilter.build(corpus, col("key"), m, k)
    for (bad <- Seq("__key", "bloom_positive", "is_seen")) {
      val batch = Seq((1L, "https://x.example.com/1", true))
        .toDF("id", "key", bad)
      val err = intercept[IllegalArgumentException] {
        BloomFilter.gate(batch, col("key"), corpus, words, m, k)
      }
      assert(err.getMessage.contains(bad), s"message must name $bad")
    }
  }

  test("mightContain is a pure projection: no join, no exchange, no " +
    "subquery in its plan — the definite-new path never touches the corpus") {
    val m = 256; val k = 3
    val words = BloomFilter.build(corpus, col("key"), m, k)
    val plan = corpus
      .select(BloomFilter.mightContain(col("key"), words, m, k))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"membership test must be scan-side:\n$plan")
  }

  test("sizeFor: textbook sizing — word-aligned m, sane k, and the " +
    "realized false-positive rate is near the target") {
    val (m, k) = BloomFilter.sizeFor(1000, 0.01)
    assert(m % 64 == 0 && m > 9000 && m < 10100, s"m=$m")
    assert(k >= 6 && k <= 8, s"k=$k")
    val keys = (1 to 1000).map(i => s"corpus-key-$i").toDF("key")
    val words = BloomFilter.build(keys, col("key"), m, k)
    val fresh = (1 to 2000).map(i => s"fresh-key-$i").toDF("key")
    val fp = fresh.where(BloomFilter.mightContain(col("key"), words, m, k))
      .count()
    assert(fp <= 60, s"~1% target, got $fp/2000") // generous 3x headroom
  }
}
