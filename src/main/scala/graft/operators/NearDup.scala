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

  /** Distinct lowercase word n-gram shingles of a text column.
    *
    * ASCII assumption: this Column path (Spark `lower`/`split`) and its
    * JIT twin `TextHash.hashedShingles` (Java `toLowerCase(Locale.ROOT)` /
    * `String.split`) agree on ASCII text but can diverge on non-ASCII
    * input (locale-sensitive case mappings such as İ/ı, regex-engine
    * differences). Mixed use of the two paths on a non-ASCII corpus would
    * drift silently; normalize such corpora upstream, or route both
    * sides through the same expression kernel. */
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

  /** Distinct hashed shingle set: the md5 runs ONCE per shingle; every
    * downstream hash (minhash family, simhash bits) derives from the
    * 60-bit value with cheap integer arithmetic. Backed by a JIT-compiled
    * expression (graft.functions.TextHash) — the equivalent
    * array_distinct(transform(shingles, md5...)) composition evaluates
    * interpreted per shingle and dominated the near-dup wall-clock. */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.TextHash.hashedShinglesCol(text, n)

  /** Affine minhash family over the base hash: h_i(x) = (a_i * (x mod 2^30)
    * + b_i) mod p with p = 1e9+7 — coefficients are fixed formulas so any
    * SQL oracle can regenerate them; products stay under 2^61 (no
    * overflow). One md5 per shingle total, vs one per shingle PER HASH for
    * a seeded-md5 family (16x the digest work at H=16). */
  def minhashCoeffs(i: Int): (Long, Long) =
    (1664525L + 2L * i + 1L, 1013904223L + 7L * i)

  val MinhashPrime = 1000000007L

  /** MinHash signature over a hashed shingle array: element i = min over
    * shingles of h_i (JIT-compiled loop; an empty shingle set yields the
    * Long.MaxValue sentinel signature, which can only ever pair with
    * another empty doc and is rejected by the exact confirm). */
  def minhashSignature(hsh: Column, numHashes: Int): Column =
    graft.functions.TextHash.minhashSignatureCol(hsh, numHashes)

  /** (id, band, key) rows for the banded join. The join key must be a
    * SCALAR: joining on the raw array<long> slice is not
    * hash-partitionable and silently degrades to a nested-loop join
    * (measured 331s vs 2s on 5k docs). hash() of the slice is a
    * Spark-internal bucketing detail — a collision only adds a candidate
    * pair for the exact confirm to reject, never loses one. */
  private def bandKeys(df: DataFrame, idCol: String, sigCol: String,
                       rowsPerBand: Int): DataFrame = {
    val numBands = (size(col(sigCol)) / rowsPerBand).cast("int")
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0), numBands - 1),
        k => hash(slice(col(sigCol), k * rowsPerBand + 1, lit(rowsPerBand)))))
      .as(Seq("band", "key")))
  }

  /** Banded-LSH candidate pairs: the signature is cut into bands of
    * `rowsPerBand` minhashes; the band slice is the join key (one shuffle,
    * pairs formed only within buckets — never all-pairs).
    *
    * Tuning is the recall/bucket-size dial: a pair with Jaccard s agrees
    * on one band with probability s^r, on any of b bands with
    * 1-(1-s^r)^b. r=1 maximizes recall but degenerates on self-similar
    * corpora (a common shingle's global-min hash puts a large fraction of
    * all documents into ONE bucket); r=2 drops an unrelated pair
    * (s<=0.1) to <=1% per band while a true near-dup at s=0.9 still
    * collides with probability 1-(1-0.81)^8 = 1 - 1.7e-6. */
  def bandedCandidates(df: DataFrame, idCol: String, sigCol: String,
                       rowsPerBand: Int = 1): DataFrame = {
    val bands = bandKeys(df, idCol, sigCol, rowsPerBand)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two (distinct-element) shingle arrays.
    * |A∪B| is derived as |A|+|B|-|A∩B| (exact for distinct-element
    * inputs), so no union array is ever materialized — one array op per
    * pair on the confirm hot path. Two EMPTY sets score 0.0, not NaN:
    * 0/0 under Spark's NaN ordering (NaN > everything) would make
    * `jaccard >= threshold` TRUE and pair every pair of too-short
    * documents as confirmed dups — and DuckDB's x/0 = NULL would
    * silently disagree. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0d)).otherwise(inter.cast("double") / union)
  }

  /** End-to-end near-dup pairs: shingle -> minhash -> banded candidates ->
    * exact Jaccard confirm at `threshold`. Output: (id_a, id_b, jaccard)
    * with id_a < id_b.
    *
    * The confirm compares HASHED shingle sets (array<long>), not the
    * string arrays — the Jaccard value is identical (same deterministic
    * hash on both sides of any oracle) and long-array intersection is far
    * cheaper than string-array intersection on wide candidate sets. */
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
                   n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    // localCheckpoint materializes the small per-doc index artifacts
    // (hashed shingle sets + signatures) so the three consumers below —
    // band explode, a-side join, b-side join — do not each re-run the
    // shingling/hashing scan. At larger scale this artifact would be
    // written to storage once at index-build time (same role as the
    // chunks table's bucket column).
    val hashed = df.select(id.as("id"), hashedShingles(text, n).as("hsh"))
      .localCheckpoint()
    val sig = hashed.select(col("id"),
      minhashSignature(col("hsh"), numHashes).as("sig"))
    val cand = bandedCandidates(sig, "id", "sig", rowsPerBand)
    confirmPairs(cand, hashed, hashed, "id_a", "id_b", threshold)
  }

  /** Exact-Jaccard confirm shared by the batch and incremental paths:
    * attach both sides' hashed shingle sets to the candidate pairs and
    * keep those at or above `threshold`.
    * Output: (leftCol, rightCol, jaccard). */
  private def confirmPairs(cand: DataFrame, left: DataFrame, right: DataFrame,
                           leftCol: String, rightCol: String,
                           threshold: Double): DataFrame =
    cand
      .join(left.select(col("id").as(leftCol), col("hsh").as("__hsh_l")), leftCol)
      .join(right.select(col("id").as(rightCol), col("hsh").as("__hsh_r")), rightCol)
      .withColumn("jaccard", jaccard(col("__hsh_l"), col("__hsh_r")))
      .where(col("jaccard") >= threshold)
      .select(col(leftCol), col(rightCol), col("jaccard"))

  /** INCREMENTAL near-dup — the continuously-growing-corpus shape: which
    * ARRIVING documents near-duplicate any EXISTING document. The
    * existing side's hashed shingles + signatures are the persisted index
    * artifact of the corpus; each arriving micro-batch band-joins against
    * it (candidates only — one shuffle on scalar band keys), confirms
    * with exact Jaccard, and the survivors are what gets appended.
    * Existing x existing and arriving x arriving pairs are never formed:
    * per-batch cost is O(batch x collisions), not O(corpus^2).
    * Output: (arriving_id, existing_id, jaccard) — every confirmed
    * reason-to-drop pair. */
  def incrementalNearDupPairs(existing: DataFrame, arriving: DataFrame,
                              id: Column, text: Column, n: Int = 3,
                              numHashes: Int = 16, rowsPerBand: Int = 2,
                              threshold: Double = 0.5): DataFrame = {
    def index(df: DataFrame) =
      df.select(id.as("id"), hashedShingles(text, n).as("hsh"))
        .localCheckpoint()
    val hx = index(existing)
    val hy = index(arriving)
    def sigs(h: DataFrame) = h.select(col("id"),
      minhashSignature(col("hsh"), numHashes).as("sig"))
    val cand = bandKeys(sigs(hx), "id", "sig", rowsPerBand).as("x")
      .join(bandKeys(sigs(hy), "id", "sig", rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("existing_id"), col("y.id").as("arriving_id"))
      .distinct()
    confirmPairs(cand, hx, hy, "existing_id", "arriving_id", threshold)
      .select(col("arriving_id"), col("existing_id"), col("jaccard"))
  }

  /** `bits`-wide SimHash over the hashed shingle set: bit j is set iff the
    * sum of (+1/-1 votes from bit j of each shingle hash) is >= 0.
    *
    * Single-pass shape: ONE aggregate over the shingle hashes with an
    * array-of-counters accumulator (zip_with against a bit-mask literal
    * array). A naive per-bit formulation would inline — and re-evaluate —
    * the md5 of every shingle `bits` times and push the expression tree
    * past the codegen method-size limit into interpreted mode; this form
    * hashes each shingle exactly once. */
  def simhash(hsh: Column, bits: Int): Column =
    graft.functions.TextHash.simhashCol(hsh, bits)

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rounded cosine pair distance between the `l`- and `r`-aliased sides
    * of a joined pair frame (each side carrying `emb` + precomputed `nrm`
    * columns): +Inf on a zero norm, ONE fused dot product per pair,
    * `round(raw, 6) + 0.0` — the distance contract shared by the batch
    * and incremental embedding near-dup variants (the threshold compares
    * the ROUNDED value, so results reproduce bit-for-bit across
    * engines; IEEE -0.0 is normalized away). */
  private def pairDistance(l: String, r: String): Column = {
    import graft.functions.VectorExpressions
    val raw = when(col(s"$l.nrm") === 0.0d || col(s"$r.nrm") === 0.0d,
        lit(Double.PositiveInfinity))
      .otherwise(lit(1.0d) -
        VectorExpressions.dotProduct(col(s"$l.emb"), col(s"$r.emb")) /
          (col(s"$l.nrm") * col(s"$r.nrm")))
    round(raw, 6) + lit(0.0d)
  }

  /** Embedding-cosine near-dup pairs with NO blocking column required: the
    * block key is a derived sign-bit LSH bucket of the embedding itself
    * (the same kernel the vector index uses), so the operator runs on any
    * corpus — a real 100 TB corpus has no labels. Output:
    * (id_a, id_b, distance) with id_a < id_b and rounded cosine distance
    * <= threshold.
    *
    * Candidate generation is multi-probe: side B is replicated to its own
    * bucket plus every bucket at Hamming distance 1 (numProjections + 1
    * probes), so any pair whose buckets differ in at most ONE projection
    * sign is compared — recovering most of the recall a single-bucket
    * block loses, at a bounded (P+1)x fan-out instead of all-pairs. For a
    * fixed (a, b) row pair at most one probe value equals a's bucket, so
    * no pair is emitted twice and no distinct() is needed.
    *
    * Scale shape: ONE shuffle, hash equi-join on (bucket, salt) — never a
    * cartesian/BNL join. Side A is salted and side B replicated to every
    * salt value, fanning each bucket's pairs over `salt` reduce slots
    * (sign-bit buckets are coarse at small P; salting keeps the reducers
    * busy even when one bucket dominates). L2 norms are precomputed per
    * row BEFORE the join, so the pair distance is one fused dot-product
    * kernel instead of three array folds.
    *
    * The distance is `round(raw, 6) + 0.0` and the threshold compares the
    * ROUNDED value — part of the operator contract so results are
    * reproducible bit-for-bit across engines (any SQL oracle applies the
    * same rounding; IEEE -0.0 is normalized away). */
  def embeddingNearDupPairs(df: DataFrame, id: Column, emb: Column,
                            matrix: Array[Array[Double]], threshold: Double,
                            salt: Int = 8, multiProbe: Boolean = true): DataFrame = {
    import graft.functions.VectorExpressions
    // materialized once: both join sides (and the multi-probe explode)
    // reuse the bucket+norm projection instead of recomputing it per side
    val base = df.select(id.as("id"), emb.as("emb"))
      .withColumn("bucket", VectorExpressions.lshBucket(col("emb"), matrix))
      .withColumn("nrm",
        sqrt(VectorExpressions.dotProduct(col("emb"), col("emb"))))
      .localCheckpoint()
    val a = base.withColumn("salt",
      pmod(hash(col("id")), lit(salt)).cast("long"))
    val probes =
      if (multiProbe) LshIndex.hamming1Probes(col("bucket"), matrix.length)
      else array(col("bucket"))
    val b = base.withColumn("probe", explode(probes))
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
    a.as("a").join(b.as("b"),
        col("a.bucket") === col("b.probe") && col("a.salt") === col("b.salt") &&
          col("a.id") < col("b.id"))
      .withColumn("distance", pairDistance("a", "b"))
      .where(col("distance") <= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("distance"))
  }

  /** INCREMENTAL embedding near-dup — the growing-corpus shape of
    * [[embeddingNearDupPairs]]: which ARRIVING vectors sit within cosine
    * `threshold` of any EXISTING vector. The existing side's `bucket`
    * column is the corpus's persisted LSH index artifact — pass
    * `existingBucket` to reuse it (the engine stores exactly this column
    * beside the embedding); when absent it is derived with the same
    * kernel.
    *
    * Scale shape: the arriving micro-batch is replicated to its
    * multi-probe set (own bucket + every Hamming-1 neighbour — (P+1)x a
    * SMALL batch) and BROADCAST, so the corpus side is never shuffled and
    * never replicated: per-batch cost is one corpus scan streamed against
    * a broadcast hash table — O(batch x collisions) pair work — and on
    * the engine's bucket-clustered at-rest layout the scan's `bucket`
    * equi-condition is row-group-prunable. Existing x existing and
    * arriving x arriving pairs are never formed (the reason this beats
    * re-running the batch operator on corpus+batch every time). For a
    * fixed (existing, arriving) row pair at most one probe value equals
    * the existing row's bucket, so no pair is emitted twice.
    *
    * Output: (arriving_id, existing_id, distance) — every confirmed
    * reason-to-drop pair, distance rounded exactly like
    * [[embeddingNearDupPairs]]. */
  def incrementalEmbeddingNearDupPairs(existing: DataFrame, arriving: DataFrame,
                                       id: Column, emb: Column,
                                       matrix: Array[Array[Double]],
                                       threshold: Double,
                                       existingBucket: Option[Column] = None,
                                       multiProbe: Boolean = true): DataFrame = {
    import graft.functions.VectorExpressions
    def nrm(c: Column) = sqrt(VectorExpressions.dotProduct(c, c))
    val ex = existing.select(id.as("id"), emb.as("emb"),
        existingBucket.getOrElse(VectorExpressions.lshBucket(emb, matrix))
          .as("bucket"))
      .withColumn("nrm", nrm(col("emb")))
    val probes =
      if (multiProbe) LshIndex.hamming1Probes(col("bucket"), matrix.length)
      else array(col("bucket"))
    val arr = arriving.select(id.as("id"), emb.as("emb"))
      .withColumn("bucket", VectorExpressions.lshBucket(col("emb"), matrix))
      .withColumn("nrm", nrm(col("emb")))
      .withColumn("probe", explode(probes))
    ex.as("e").join(broadcast(arr.as("a")), col("e.bucket") === col("a.probe"))
      .withColumn("distance", pairDistance("e", "a"))
      .where(col("distance") <= threshold)
      .select(col("a.id").as("arriving_id"), col("e.id").as("existing_id"),
        col("distance"))
  }

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
    // materialized once: both sides of the self-join reuse it
    val sims = df.select(id.as("id"),
      simhash(hashedShingles(text, shingleN), bits).as("sim"))
      .localCheckpoint()
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
