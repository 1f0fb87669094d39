package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash + banded
  * LSH candidate generation with exact n-gram-Jaccard confirmation, and a
  * SimHash fingerprint variant.
  *
  * Scale discipline (the whole point at 100 TB): candidates come from ONE
  * shuffle on a small band key — documents are compared only within a
  * band bucket, never all-pairs. The confirm step touches only candidate
  * pairs. All hashes are md5-derived so a SQL oracle (DuckDB) can
  * recompute every stage bit-for-bit.
  */
object NearDup {

  /** Distinct lowercase word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val t = split(trim(lower(text)), "\\s+")
    val grams =
      if (n == 1) t
      else when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** Deterministic 60-bit hash of a shingle under hash function `seed`:
    * the first 15 hex chars of md5("<seed>:<shingle>") — chosen over
    * Spark's murmur `hash()` precisely so non-Spark engines can replicate
    * it (`('0x' || substr(md5(...), 1, 15))::BIGINT` in DuckDB). */
  def seededHash(seed: Int, s: Column): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), s)), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature: element i = min over shingles of hash_i. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => seededHash(i, s)))): _*)

  /** Banded-LSH candidate pairs: one row per (band, minhash) key, one
    * shuffle on that key, pairs formed only within buckets. With r=1 row
    * per band and H bands, a pair with Jaccard s collides with
    * probability 1-(1-s)^H — at s=0.5, H=16 that is 1 - 1.5e-5, so the
    * exact-confirm step sees essentially every true pair. */
  def bandedCandidates(df: DataFrame, idCol: String, sigCol: String): DataFrame = {
    val bands = df.select(col(idCol), posexplode(col(sigCol)).as(Seq("band", "v")))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two (distinct-element) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** End-to-end near-dup pairs: shingle -> minhash -> banded candidates ->
    * exact Jaccard confirm at `threshold`. Output: (id_a, id_b, jaccard)
    * with id_a < id_b. */
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
                   n: Int = 2, numHashes: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    val sh = df.select(id.as("id"), shingles(text, n).as("sh"))
    val sig = sh.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    val cand = bandedCandidates(sig, "id", "sig")
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** `bits`-wide SimHash over the hashed shingle set: bit j is set iff the
    * sum of (+1/-1 votes from bit j of each shingle hash) is >= 0. */
  def simhash(sh: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    val hs = transform(sh, s => seededHash(0, s))
    (0 until bits).map { j =>
      val bitsum = aggregate(hs, lit(0L), (acc, x) =>
        acc + when(shiftright(x, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(bitsum >= 0L, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at Hamming distance <= maxHamming, banded: the
    * fingerprint is split into `numBands` sub-keys; by pigeonhole any pair
    * within maxHamming <= numBands - 1 shares at least one exact sub-key,
    * so the band join loses nothing while comparing only within buckets. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
                   shingleN: Int = 2, bits: Int = 32, numBands: Int = 8,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= numBands - 1,
      "pigeonhole guarantee needs maxHamming <= numBands - 1")
    val bandBits = bits / numBands
    val sims = df.select(id.as("id"), simhash(shingles(text, shingleN), bits).as("sim"))
    val banded = sims.select(col("id"), col("sim"),
      posexplode(array((0 until numBands).map(k =>
        shiftright(col("sim"), k * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "key")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming(col("x.sim"), col("y.sim")).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
