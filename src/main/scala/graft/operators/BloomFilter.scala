package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership gate for incremental ingest — the "have we
  * seen this key?" front door a 100 TB crawl runs before ANY exact
  * dedup work (Bloom 1970; RefinedWeb-scale crawls keep exactly this
  * structure over previously-fetched URLs).
  *
  * Why a sketch and not the exact anti-join the incremental dedup rows
  * already have: the exact join must ship (or broadcast) the full seen-key
  * set every batch — at billions of URLs that is a corpus-sized shuffle
  * per increment. The Bloom filter is a FIXED m-bit summary built in one
  * corpus scan and then reused across every arriving batch as a
  * stateless scan-side projection: definite-new keys (the vast majority
  * of a healthy crawl) never touch the corpus again, and only the
  * bloom-positive sliver pays the exact confirm join. False positives
  * are possible (sized by [[sizeFor]]), false negatives are not — so the
  * gate is safe to use as a filter IN FRONT of the exact path.
  *
  * Determinism contract: bit positions come from the same seeded-md5
  * kernel as every other hash in this library ([[NearDup.seededHash]]),
  * so a DuckDB oracle replays the filter bit-for-bit from the parquet
  * bytes alone — the packed word representation is semantically
  * identical to position-set membership, which is what the oracle
  * checks.
  *
  * Scale shape: build = one scan + one distinct on ≤ m positions + one
  * 64-way pack groupBy (map-side bit_or partials), collected as ≤ m/64
  * longs — bounded by the PARAMETER, not the corpus (m = 2^30 bits is
  * 16 MB of words: broadcast material). Gate = pure projection over two
  * bounded literal arrays; no join, no shuffle, whole-stage codegen.
  */
object BloomFilter {

  /** The j-th bit position of `key` in an m-bit filter: the shared
    * seeded-md5 kernel mod m (the 60-bit hash is non-negative, so `%`
    * and `pmod` agree — the oracle replays plain `%`). */
  def position(j: Int, key: Column, m: Int): Column =
    NearDup.seededHash(j, key) % m

  /** Largest whole-word bit count addressable by an Int index:
    * the greatest multiple of 64 <= Int.MaxValue. Sizing clamps here
    * for very large n — past ~2^31 bits the realized false-positive
    * rate DEGRADES below the requested target (document the tradeoff
    * or shard the key space across several filters). */
  val MaxBits: Int = (Int.MaxValue / 64) * 64

  /** Textbook sizing: bits per key and hash count for a target
    * false-positive rate p (m = -n ln p / ln²2, k = (m/n) ln 2),
    * rounded up to whole words. Clamps to [[MaxBits]] — the largest
    * multiple of 64 that fits an Int, preserving the whole-word
    * alignment the packed representation depends on; when the clamp
    * binds, the realized FP rate is worse than `targetFp` (k is
    * re-derived from the CLAMPED m, the optimum for the bits actually
    * available). */
  def sizeFor(n: Long, targetFp: Double): (Int, Int) = {
    require(n > 0 && targetFp > 0 && targetFp < 1, "need n > 0, 0 < p < 1")
    val ln2 = math.log(2)
    val mRaw = math.ceil(-n * math.log(targetFp) / (ln2 * ln2)).toLong
    val m = (((mRaw + 63) / 64) * 64).min(MaxBits.toLong).toInt
    val k = math.max(1, math.round(m.toDouble / n * ln2).toInt)
    (m, k)
  }

  /** Build the filter over `corpus`'s key column: returns the packed
    * bit words (little-endian within each 64-bit word, word w holds
    * positions [64w, 64w+63]). One corpus scan; the distinct and the
    * pack groupBy are bounded by m, not by the corpus; the collect is
    * ≤ m/64 longs — the same bounded-model discipline as the DSIR /
    * classifier literal models. */
  def build(corpus: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    require(m > 0 && k > 0, "need m > 0, k > 0")
    val words = new Array[Long]((m + 63) / 64)
    val positions = array((0 until k).map(j => position(j, key, m)): _*)
    corpus
      // a NULL key hashes to null positions and would NPE the word read
      // below; it carries no membership information either way — skip it
      // (the gate treats null-keyed rows as definite-new, consistently)
      .where(key.isNotNull)
      .select(explode(positions).as("pos"))
      .distinct()
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  // one literal 2^b table so the gate needs no column-shift expression:
  // element_at is codegen'd and the array is 64 longs regardless of m
  private val PowersOfTwo: Seq[Long] = (0 until 64).map(1L << _)

  /** Membership test as a pure projection: true iff ALL k bit positions
    * of `key` are set in `words`. No false negatives by construction;
    * false positives at the [[sizeFor]] rate. */
  def mightContain(key: Column, words: Array[Long], m: Int, k: Int): Column = {
    val wordsLit = typedlit(words.toSeq)
    val powLit = typedlit(PowersOfTwo)
    (0 until k).map { j =>
      val p = position(j, key, m)
      val word = element_at(wordsLit, (p / 64).cast("int") + 1)
      val bit = element_at(powLit, pmod(p, lit(64)).cast("int") + 1)
      word.bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** The full incremental gate over arriving rows: `bloom_positive`
    * (the sketch's verdict) and `is_seen` (the exact confirm, evaluated
    * ONLY for bloom-positive rows — definite-new rows skip the corpus
    * join entirely, which is the point of the sketch). `seenKeys` is
    * the corpus's distinct canonical key frame with one column.
    *
    * NULL keys (a malformed/unnormalizable URL) are DEFINITE-NEW by
    * contract: the membership test yields NULL on them, and without the
    * coalesce the row would fail BOTH branch predicates and silently
    * vanish from the output — neither seen nor new. [[build]] skips
    * null keys symmetrically, so the two verdicts cannot drift.
    *
    * Every batch column PASSES THROUGH (r19 — the facade ingest gates
    * need the full rows, not just verdicts), so `batch` must not
    * already carry `bloom_positive`/`is_seen`/`__key` columns. */
  def gate(batch: DataFrame, key: Column,
           seenKeys: DataFrame, words: Array[Long],
           m: Int, k: Int): DataFrame = {
    // loud guard, not a scaladoc-only contract (ADVICE r19): withColumn
    // would silently CLOBBER a caller column of the same name and the
    // verdicts downstream would be wrong with no error
    val reserved = Seq("__key", "bloom_positive", "is_seen")
      .filter(batch.columns.contains)
    require(reserved.isEmpty,
      s"bloom gate reserves column name(s) ${reserved.mkString(", ")} — " +
        "rename them in the batch before gating")
    val keyed = batch.withColumn("__key", key)
      .withColumn("bloom_positive",
        coalesce(mightContain(col("__key"), words, m, k), lit(false)))
    val seen = seenKeys.toDF("__seen_key").distinct()
    val candidates = keyed.where(col("bloom_positive"))
      .join(seen, col("__key") === col("__seen_key"), "left")
      .withColumn("is_seen", col("__seen_key").isNotNull)
      .drop("__seen_key")
    val definiteNew = keyed.where(!col("bloom_positive"))
      .withColumn("is_seen", lit(false))
    candidates.unionByName(definiteNew).drop("__key")
  }
}
