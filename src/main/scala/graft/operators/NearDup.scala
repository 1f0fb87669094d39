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

  /** Distinct lowercase word n-gram shingles of a text column — routed
    * through the SAME pinned tokenization kernel as every other text
    * path (graft.functions.TextHash: NFC + per-code-point simple
    * lowercase + explicit whitespace class), so the string-shingle and
    * hashed-shingle sides of a near-dup run can never tokenize
    * differently on non-ASCII text. The DuckDB oracle replays the
    * identical contract (`lower(nfc_normalize(...))` — a full-plane
    * code-point diff pinned the two engines equal; the
    * `dedup_near_unicode` row gates it on CJK/Turkish/combining-mark
    * data). */
  def shingles(text: Column, n: Int): Column =
    array_distinct(graft.functions.TextHash.ngramsCol(text, n))

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

  // ---------------- exact-duplicate collapse ----------------

  /** Digest-collapse pre-step shared by every BATCH near-dup variant: one
    * row per DISTINCT text, grouped on a 128-bit content digest,
    * carrying the min-id representative.
    *
    * Why this exists: real corpora repeat identical documents millions of
    * times (boilerplate pages), and every minhash/simhash artifact is a
    * pure function of the text — so a group of m byte-identical documents
    * collides in EVERY band and a per-row banded self-join emits
    * m(m-1)/2 candidate pairs per group before any confirm can run. After
    * the collapse the banded join sees ONE row per distinct text (the
    * candidate relation is unchanged: signatures depend only on content,
    * so rep pair (A,B) shares a band iff every member pair does) and
    * group members are re-attached afterwards — O(m) star edges via
    * [[nearDupEdges]], or output-bound pair expansion via [[nearDupPairs]].
    *
    * Returns (members, reps): members = (id, grp) for every input row,
    * reps = (grp, text) one row per distinct text — where `grp` is the
    * group's MIN MEMBER ID, not the digest (round 21): the group key
    * rides every downstream stage (the prefix window's partition key,
    * the candidate equi-join, the distinct, the confirm joins, the
    * member expansions), and an id-typed key (a long for every declared
    * query) shuffles/compares at a fraction of the 32-char hex digest's
    * cost — the digest itself exists only inside this method (the
    * r20 string-keyed machinery measured ~2x the r19 wall-clock at
    * sf0.1 purely on key width; VERDICT r20 task 3). Members are NOT
    * materialized here: multi-consumer callers (the pair expansions
    * read it four times) checkpoint it themselves, single-consumer
    * callers (the per-micro-batch incremental path) skip the eager
    * job. Partial aggregation collapses the rep agg map-side, so at
    * most one text copy per group per input partition ever shuffles;
    * the members side re-attaches the min-id over the narrow
    * (id, digest) projection (AQE broadcasts the rep side when it fits,
    * a plain digest equi-join otherwise). A null text yields a null
    * digest: null digests aggregate into one group but its members
    * never survive the equi-join back (null never equi-joins), so
    * null-text rows pair with nothing — exactly the pre-collapse
    * behavior. */
  private[graft] def collapseByDigest(df: DataFrame, id: Column, text: Column)
      : (DataFrame, DataFrame) = {
    // TWO independently-seeded xxhash64 values = a 128-bit composite
    // digest (16-byte fixed-width group keys): the digest is INTERNAL
    // plumbing no oracle ever sees (the trainBigramLm precedent), so the
    // md5 hex string r20 shuffled here (32-char keys, and an md5 per
    // document text) buys nothing — one 64-bit key alone would make
    // collision-merged groups EXPECTED at the 10^10-document scale this
    // targets (n^2/2^65), and a merged group would invent identical-text
    // pairs; at 128 bits the probability is ~1e-19 (heuristic — both
    // halves are the same XXH64 chain differing in seed).
    // a null text keeps a NULL digest (xxhash64 would otherwise skip the
    // null and hash the seed alone, grouping every null-text row
    // together): null group keys never survive the members equi-join, so
    // null-text rows pair with nothing — the pinned pre-collapse contract
    val keyed = df.select(id.as("id"), text.as("text"))
      .withColumn("__dg1",
        when(col("text").isNotNull, xxhash64(lit(17L), col("text"))))
      .withColumn("__dg2",
        when(col("text").isNotNull, xxhash64(lit(29L), col("text"))))
    val reps0 = keyed.groupBy(col("__dg1"), col("__dg2"))
      .agg(min(col("id")).as("grp"), any_value(col("text")).as("text"))
    val members = keyed.select(col("id"), col("__dg1"), col("__dg2"))
      .join(reps0.select(col("__dg1"), col("__dg2"), col("grp")),
        Seq("__dg1", "__dg2"))
      .select(col("id"), col("grp"))
    (members, reps0.select(col("grp"), col("text")))
  }

  /** Re-attach exact-duplicate group members to rep-level results.
    * crossPairs: (grp_a, grp_b, value) confirmed pairs of DISTINCT texts;
    * withinGroups: (grp, value) — the groups whose identical-member pairs
    * qualify, with the value such a pair scores. Output (id_a, id_b,
    * value) with id_a < id_b; every unordered pair appears exactly once
    * (groups are disjoint: a cross pair's members come from different
    * groups, a within pair's from one). Both expansions are equi-joins on
    * the digest that emit exactly the OUTPUT rows — the quadratic
    * within-group row count exists only in the pair output itself, which
    * is inherent to the pair contract; consumers that need only
    * connectivity or drop decisions take [[nearDupEdges]] instead. */
  private[operators] def expandPairs(members: DataFrame, crossPairs: DataFrame,
                          withinGroups: DataFrame, valueName: String): DataFrame = {
    val cross = crossPairs
      .join(members.select(col("grp").as("grp_a"), col("id").as("__a")), "grp_a")
      .join(members.select(col("grp").as("grp_b"), col("id").as("__b")), "grp_b")
      .select(least(col("__a"), col("__b")).as("id_a"),
        greatest(col("__a"), col("__b")).as("id_b"), col(valueName))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.grp") === col("y.grp") && col("x.id") < col("y.id"))
      .join(withinGroups.select(col("grp").as("__wg"), col(valueName)),
        col("x.grp") === col("__wg"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col(valueName))
    cross.unionByName(within)
  }

  /** [[expandPairs]]' ORDERED twin for asymmetric pair relations
    * (containment): crossPairs are ORDERED rep pairs (grp_a, grp_b,
    * value) — both directions arrive as separate rows, each with its
    * own directional value — and each expands to every (member of A,
    * member of B) ordered pair verbatim; withinGroups (grp, value)
    * expands to all ordered member pairs x != y (both directions, the
    * same value — identical texts are symmetric). Output (id_a, id_b,
    * value); every ordered pair appears exactly once (groups are
    * disjoint). Same output-bound shape as [[expandPairs]]. */
  private[operators] def expandOrderedPairs(members: DataFrame,
      crossPairs: DataFrame, withinGroups: DataFrame,
      valueName: String): DataFrame = {
    val cross = crossPairs
      .join(members.select(col("grp").as("grp_a"), col("id").as("id_a")),
        "grp_a")
      .join(members.select(col("grp").as("grp_b"), col("id").as("id_b")),
        "grp_b")
      .select(col("id_a"), col("id_b"), col(valueName))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.grp") === col("y.grp") && col("x.id") =!= col("y.id"))
      .join(withinGroups.select(col("grp").as("__wg"), col(valueName)),
        col("x.grp") === col("__wg"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col(valueName))
    cross.unionByName(within)
  }

  /** Rep-level minhash near-dup: hashed shingles for DISTINCT texts only
    * (checkpointed — the band explode and both confirm sides reuse it; at
    * larger scale this artifact would be written to storage once at
    * index-build time), banded candidates over reps, exact-Jaccard
    * confirm. `grp` IS the group's min member id (see
    * [[collapseByDigest]]). Returns (hashed reps (grp, hsh), confirmed
    * rep pairs (grp_a, grp_b, jaccard)). */
  private def repNearDupPairs(reps: DataFrame, n: Int, numHashes: Int,
                              rowsPerBand: Int, threshold: Double)
      : (DataFrame, DataFrame) = {
    val hashed = reps.select(col("grp"),
      hashedShingles(col("text"), n).as("hsh")).localCheckpoint()
    val sig = hashed.select(col("grp").as("id"),
      minhashSignature(col("hsh"), numHashes).as("sig"))
    val cand = bandedCandidates(sig, "id", "sig", rowsPerBand)
      .withColumnRenamed("id_a", "grp_a").withColumnRenamed("id_b", "grp_b")
    val byGrp = hashed.select(col("grp").as("id"), col("hsh"))
    (hashed, confirmPairs(cand, byGrp, byGrp, "grp_a", "grp_b", threshold))
  }

  /** The jaccard two identical documents score: 1.0 when the shingle set
    * is nonempty, 0.0 when empty — the same convention [[jaccard]] uses,
    * with no per-pair arithmetic. */
  private def identicalJaccard: Column =
    when(size(col("hsh")) > 0, lit(1.0d)).otherwise(lit(0.0d))

  /** End-to-end near-dup pairs: exact-duplicate collapse -> shingle ->
    * minhash -> banded candidates over DISTINCT texts -> exact Jaccard
    * confirm at `threshold` -> member expansion. Output: (id_a, id_b,
    * jaccard) with id_a < id_b — identical to the pre-collapse contract
    * (within-group pairs score the identical-text jaccard; cross-group
    * member pairs inherit their reps' jaccard, which IS their jaccard).
    *
    * The confirm compares HASHED shingle sets (array<long>), not the
    * string arrays — the Jaccard value is identical (same deterministic
    * hash on both sides of any oracle) and long-array intersection is far
    * cheaper than string-array intersection on wide candidate sets. */
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
                   n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    val (members0, reps) = collapseByDigest(df, id, text)
    val members = members0.localCheckpoint() // expandPairs reads it 4x
    val (hashed, repPairs) = repNearDupPairs(reps, n, numHashes, rowsPerBand,
      threshold)
    val withinGroups = hashed.select(col("grp"), identicalJaccard.as("jaccard"))
      .where(col("jaccard") >= threshold)
    expandPairs(members, repPairs, withinGroups, "jaccard")
  }

  /** Scale-shape near-dup edge set: the SAME connectivity and the SAME
    * greedy smaller-id drop relation as [[nearDupPairs]]'s full pair set,
    * in O(m) rows per exact-duplicate group instead of m(m-1)/2:
    *
    *   - STAR edges (group min -> each other member) for every group
    *     whose identical-member jaccard (1.0 nonempty / 0.0 empty)
    *     clears the threshold, and
    *   - one REPRESENTATIVE edge (min(A), min(B)) per confirmed
    *     cross-group pair of distinct texts.
    *
    * Equivalence (what the survivors/components consumers rely on):
    * components — members reach their group min via star edges and
    * related groups' mins are edged, exactly the full pair graph's
    * transitive closure. Greedy drop (doc d dropped iff some pair partner
    * has a smaller id) — a non-min member's star partner is its group min
    * (< it); a group min's only possible smaller witness in the full
    * graph is a member of a related group B below min(A), which exists
    * iff min(B) < min(A), and min(B) is its representative-edge partner.
    *
    * Output (id_a, id_b) with id_a < id_b. */
  def nearDupEdges(df: DataFrame, id: Column, text: Column,
                   n: Int = 3, numHashes: Int = 16, rowsPerBand: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    val (members, reps) = collapseByDigest(df, id, text)
    val (hashed, repPairs) = repNearDupPairs(reps, n, numHashes, rowsPerBand,
      threshold)
    // grp IS the rep id (collapseByDigest keys groups by min member id),
    // so star edges need one semi-shaped join against the qualifying
    // groups and rep edges need NO id re-attachment at all (r21 — the
    // previous digest-keyed shape paid two extra joins here)
    val qualifying = hashed.where(identicalJaccard >= threshold)
      .select(col("grp"))
    val star = members.join(qualifying, "grp")
      .where(col("id") =!= col("grp"))
      .select(col("grp").as("id_a"), col("id").as("id_b"))
    val repEdges = repPairs
      .select(least(col("grp_a"), col("grp_b")).as("id_a"),
        greatest(col("grp_a"), col("grp_b")).as("id_b"))
    star.unionByName(repEdges)
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
    // existing side: per-row signature artifacts, as persisted
    val hx = existing.select(id.as("id"), hashedShingles(text, n).as("hsh"))
      .localCheckpoint()
    // arriving side: exact-duplicate collapse — a crawl batch repeats the
    // same boilerplate page thousands of times, and every copy carries
    // the same signature; band DISTINCT arriving texts only, expand the
    // confirmed matches back over members (output-bound: each expanded
    // row is a real confirmed pair)
    val (members, reps) = collapseByDigest(arriving, id, text)
    val hy = reps.select(col("grp"),
      hashedShingles(col("text"), n).as("hsh")).localCheckpoint()
    def sigs(h: DataFrame, key: String) = h.select(col(key).as("id"),
      minhashSignature(col("hsh"), numHashes).as("sig"))
    val cand = bandKeys(sigs(hx, "id"), "id", "sig", rowsPerBand).as("x")
      .join(bandKeys(sigs(hy, "grp"), "id", "sig", rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("existing_id"), col("y.id").as("grp"))
      .distinct()
    val repPairs = cand
      .join(hx.select(col("id").as("existing_id"), col("hsh").as("__hsh_l")),
        "existing_id")
      .join(hy.select(col("grp"), col("hsh").as("__hsh_r")), "grp")
      .withColumn("jaccard", jaccard(col("__hsh_l"), col("__hsh_r")))
      .where(col("jaccard") >= threshold)
    repPairs.join(members, "grp")
      .select(col("id").as("arriving_id"), col("existing_id"), col("jaccard"))
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
    // Exact-duplicate collapse, embedding edition: the group key is the
    // raw vector itself (exact equality — a hashed key could merge two
    // distinct embeddings and invent distance-0 pairs) and the group id
    // is the min member id. Identical vectors share a bucket, so a group
    // of m copies would otherwise meet itself in the bucket join and emit
    // m(m-1)/2 pairs; after the collapse the join sees one row per
    // distinct vector. Salting still spreads HOT BUCKETS (many distinct-
    // but-close vectors) over reduce slots — collapse and salt fix
    // different skews.
    val keyed = df.select(id.as("id"), emb.as("emb"))
    val groups = keyed.groupBy(col("emb")).agg(min(col("id")).as("grp"))
    val members = keyed.join(groups, "emb").select(col("id"), col("grp"))
      .localCheckpoint()
    // materialized once: both join sides (and the multi-probe explode)
    // reuse the bucket+norm projection instead of recomputing it per side
    val reps = groups.select(col("grp").as("id"), col("emb"))
      .withColumn("bucket", VectorExpressions.lshBucket(col("emb"), matrix))
      .withColumn("nrm",
        sqrt(VectorExpressions.dotProduct(col("emb"), col("emb"))))
      .localCheckpoint()
    val a = reps.withColumn("salt",
      pmod(hash(col("id")), lit(salt)).cast("long"))
    val probes =
      if (multiProbe) LshIndex.hamming1Probes(col("bucket"), matrix.length)
      else array(col("bucket"))
    val b = reps.withColumn("probe", explode(probes))
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
    val repPairs = a.as("a").join(b.as("b"),
        col("a.bucket") === col("b.probe") && col("a.salt") === col("b.salt") &&
          col("a.id") < col("b.id"))
      .withColumn("distance", pairDistance("a", "b"))
      .where(col("distance") <= threshold)
      .select(col("a.id").as("grp_a"), col("b.id").as("grp_b"), col("distance"))
    // two identical NONZERO vectors sit at rounded cosine distance exactly
    // 0.0 (zero-norm pairs are +Inf pre-collapse and stay excluded)
    val withinGroups = reps
      .where(col("nrm") > 0.0d && lit(0.0d) <= threshold)
      .select(col("id").as("grp"), lit(0.0d).as("distance"))
    expandPairs(members, repPairs, withinGroups, "distance")
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
    // exact-duplicate collapse of the ARRIVING batch (raw-vector key):
    // identical vectors probe identical buckets, so the broadcast probe
    // set carries one representative per distinct vector and confirmed
    // matches expand back over members afterwards — a duplicate-heavy
    // batch broadcasts and compares O(distinct), not O(batch)
    val keyed = arriving.select(id.as("id"), emb.as("emb"))
    val groups = keyed.groupBy(col("emb")).agg(min(col("id")).as("grp"))
    // broadcast: groups <= the (small) batch — keeps the whole arriving
    // side shuffle-free, like the probe set itself
    val members = keyed.join(broadcast(groups), "emb")
      .select(col("id"), col("grp"))
    val arr = groups.select(col("grp"), col("emb"))
      .withColumn("bucket", VectorExpressions.lshBucket(col("emb"), matrix))
      .withColumn("nrm", nrm(col("emb")))
      .withColumn("probe", explode(probes))
    val repPairs = ex.as("e")
      .join(broadcast(arr.as("a")), col("e.bucket") === col("a.probe"))
      .withColumn("distance", pairDistance("e", "a"))
      .where(col("distance") <= threshold)
      .select(col("a.grp").as("grp"), col("e.id").as("existing_id"),
        col("distance"))
    repPairs.join(broadcast(members), "grp")
      .select(col("id").as("arriving_id"), col("existing_id"), col("distance"))
  }

  /** Corpus-level MinHash signature per GROUP (source/shard/snapshot):
    * element j = min over the group's DISTINCT hashed `n`-gram shingles
    * of the affine family h_j — the identical arithmetic
    * [[minhashSignature]] applies per document, lifted to group scope.
    *
    * Scale shape: one scan explodes hashed shingles (the JIT kernel, one
    * md5 per shingle), one distinct on (group, hash), then H plain MIN
    * aggregates with map-side partials — the group's shingle SET is
    * never materialized as an array and no row carries more than one
    * hash. Output: (group, sig array<bigint>); groups with no n-grams
    * (every text shorter than n tokens) are absent. */
  def minhashGroupSignatures(df: DataFrame, group: Column, text: Column,
                             n: Int, numHashes: Int): DataFrame = {
    val hs = df.select(group.as("grp"),
        explode(hashedShingles(text, n)).as("h"))
      .distinct()
      .withColumn("x", col("h") % (1L << 30))
    val aggs = (0 until numHashes).map { j =>
      val (a, b) = minhashCoeffs(j)
      min((lit(a) * col("x") + lit(b)) % MinhashPrime).as(s"m$j")
    }
    hs.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
      .select(col("grp"),
        array((0 until numHashes).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Cross-source corpus OVERLAP estimation (Broder 1997's resemblance,
    * at corpus granularity): for every unordered pair of groups, the
    * fraction of agreeing minhash positions — an unbiased estimate of
    * the n-gram-set Jaccard between the two corpora, from H numbers per
    * source instead of a set intersection over everything. The standard
    * cheap answer to "how much does source A duplicate source B?" when
    * planning which sources to dedup against each other.
    *
    * The pair join runs over G signature rows (G = #sources — tiny),
    * never over the corpus. Output: (grp_a, grp_b, agreements,
    * est_jaccard) with grp_a < grp_b, est rounded to 6. Estimator
    * variance is ~sqrt(J(1-J)/H) — NearDupSpec checks it against exact
    * Jaccard on the test corpus. */
  def sourceOverlap(df: DataFrame, group: Column, text: Column,
                    n: Int = 3, numHashes: Int = 16): DataFrame = {
    require(numHashes > 0, "need at least one hash")
    val sigs = minhashGroupSignatures(df, group, text, n, numHashes)
    val agree = size(filter(zip_with(col("a.sig"), col("b.sig"),
      (x, y) => x === y), p => p))
    sigs.as("a").join(sigs.as("b"), col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        agree.cast("long").as("agreements"),
        (round(agree.cast("double") / numHashes, 6) + lit(0.0d))
          .as("est_jaccard"))
  }

  /** All-pairs CONTAINMENT join with EXACT prefix filtering (the
    * PPJoin family — Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008):
    * every ORDERED pair (id_a, id_b), a ≠ b, whose hashed n-gram
    * shingle containment |S_a ∩ S_b| / |S_a| ≥ threshold. Containment
    * is the ONE-SIDED overlap that catches a document quoted inside a
    * much larger one — a case symmetric Jaccard scores ≈ |S_a|/|S_b|
    * and the MinHash bands therefore never surface.
    *
    * Exactness (no recall dial, unlike the banded MinHash path): a
    * pair at containment ≥ t shares ≥ ceil(t·|S_a|) of S_a's shingles,
    * so by pigeonhole at least one lies in S_a's PREFIX of length
    * |S_a| − ceil(t·|S_a|) + 1 under ANY fixed global shingle order —
    * probing only prefixes against the full posting lists generates
    * every qualifying pair. The all-pairs DuckDB oracle hash-gates
    * that no pair is lost. (The in-plan ceil subtracts 1e-9 first: if
    * the t·|S| double rounds a hair ABOVE an exact integer the prefix
    * would come up one short and silently drop bound-exact pairs;
    * erring long costs a few extra candidates, never recall.)
    *
    * Scale shape: one scan for shingle sets (stateless — recomputed
    * per use rather than pinned), one shuffle for global document
    * frequencies, a bounded per-doc sort (each doc orders its OWN
    * shingles by (freq asc, hash) — rarest first, so prefixes hold the
    * rare shingles and posting lists joined against stay short; a
    * corpus-common shingle reaches a prefix only in a nearly-all-
    * boilerplate doc), one (prefix × posting) equi-join on the scalar
    * hash, and the exact confirm only on candidates. No all-pairs
    * product anywhere. */
  /** Shared candidate machinery of [[containmentPairs]] and
    * [[jaccardPairs]] — ONE home for the exactness-critical pieces
    * (the rarest-first global order and the epsilon'd pigeonhole
    * prefix length), so a fix to either cannot silently diverge the
    * other's losslessness: returns (sets = (id, hsh), prefixes =
    * (id_a, __sza, h) — each doc's |S| − ceil(t·|S|) + 1 rarest
    * shingles, with its set size carried for callers' length filters).
    * The in-plan `- 1e-9` before the ceil errs the prefix LONG when
    * t·|S| rounds a hair above an exact integer — a few extra
    * candidates, never lost recall. */
  private def prefixCandidateSides(df: DataFrame, id: Column, text: Column,
                                   n: Int, threshold: Double)
      : (DataFrame, DataFrame) = {
    val sets = df.select(id.as("id"), hashedShingles(text, n).as("hsh"))
      .where(size(col("hsh")) > 0)
    val freq = sets.select(explode(col("hsh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("__f"))
    // rarest-first order per doc as a ROW_NUMBER window over narrow
    // (id, sz, h, f) rows — NEVER a per-doc collect_list multiset
    // (VERDICT r19 task 1b: the wide aggregation buffer was the 10x
    // tier's worst spiller under full-suite memory pressure; the window
    // sorts fixed-width rows and spills gracefully instead). The order
    // (__f asc, h asc) is EXACTLY the tie the old array_sort(struct(__f,
    // h)) version produced, so the prefix SET is unchanged. `hsh` is
    // distinct per doc, so row_number is deterministic.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__f"), col("h"))
    val prefixes = sets
      .select(col("id"), size(col("hsh")).as("__sz"),
        explode(col("hsh")).as("h"))
      .join(freq, "h")
      .withColumn("__rn", row_number().over(w))
      // prefix long enough by pigeonhole (same epsilon'd ceil as ever)
      .where(col("__rn") <= greatest(lit(1), col("__sz") -
        ceil(lit(threshold) * col("__sz") - lit(1e-9)).cast("int") +
        lit(1)))
      .select(col("id").as("id_a"), col("__sz").as("__sza"), col("h"))
    (sets, prefixes)
  }

  def containmentPairs(df: DataFrame, id: Column, text: Column,
                       n: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0d && threshold <= 1.0d,
      "containment threshold must be in (0, 1]")
    // exact-copy collapse (round 20 — the jaccardPairs discipline):
    // byte-identical texts share a shingle set, so a group of m copies
    // would push all m(m-1) ORDERED identity pairs through the
    // candidate join and the confirm; post-collapse the machinery sees
    // one row per distinct text and the quadratic within-group row
    // count exists only in the pair OUTPUT. Shingle frequencies then
    // count DISTINCT texts — a different (but still fixed) global
    // order, and the pigeonhole completeness proof is
    // order-INDEPENDENT, so the output pair set is unchanged.
    // Within-group ordered pairs score containment 1.0 exactly
    // (identical nonempty sets; empty-set docs pair with nothing, as
    // ever); cross-group member pairs inherit their reps' directional
    // containment, which IS theirs.
    val (members0, reps) = collapseByDigest(df, id, text)
    val members = members0.localCheckpoint() // ordered expansion reads it 4x
    val (sets, prefixes) =
      prefixCandidateSides(reps, col("grp"), col("text"), n, threshold)
    val postings = sets.select(col("id").as("id_b"),
      explode(col("hsh")).as("h"))
    val candidates = prefixes.join(postings, "h")
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val confirm = candidates
      .join(sets.select(col("id").as("id_a"), col("hsh").as("__ha")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hsh").as("__hb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(col("__ha")).cast("double")).as("__c"))
    val crossPairs = confirm.where(col("__c") >= threshold)
      .select(col("id_a").as("grp_a"), col("id_b").as("grp_b"),
        (round(col("__c"), 6) + lit(0.0d)).as("containment"))
    val withinGroups = sets.select(col("id").as("grp"),
      lit(1.0d).as("containment"))
    expandOrderedPairs(members, crossPairs, withinGroups, "containment")
  }

  /** All-pairs EXACT Jaccard join — the exact-verification rung the
    * banded MinHash path estimates: every UNORDERED pair (id_a < id_b)
    * whose hashed n-gram shingle Jaccard |S_a ∩ S_b| / |S_a ∪ S_b| ≥
    * threshold, with the exact similarity. Completes the dedup ladder:
    * MinHash bands (approximate, recall dial), SimHash (Hamming),
    * containment (one-sided), and THIS — exact symmetric overlap with
    * no dial at all.
    *
    * Exactness: J(A,B) ≥ t implies containment C(A→B) ≥ t (|A∪B| ≥
    * |A|), so [[containmentPairs]]' pigeonhole prefix — length
    * |S| − ceil(t·|S|) + 1 under the rarest-first global order — from
    * EITHER side generates every qualifying pair; probing only the
    * smaller id's prefix suffices for the unordered output. Two
    * additional candidate cuts, both exactness-preserving:
    * PPJoin's LENGTH FILTER (J ≥ t forces t·|S_b| ≤ |S_a| within the
    * pair — evaluated in the same double-division form as the confirm,
    * so FP rounding can never drop a pair the confirm would keep:
    * real-arithmetic monotonicity min/max ≥ ∩/∪ survives rounding) and
    * the id order itself. The all-pairs DuckDB oracle hash-gates zero
    * lost pairs.
    *
    * Scale shape: [[containmentPairs]]' prefix machinery run over
    * DISTINCT TEXTS only — exact copies collapse FIRST
    * ([[collapseByDigest]], r19 verdict task 3: a group of m identical
    * boilerplate pages would otherwise push all m(m-1)/2 identity pairs
    * through the candidate join and the confirm; post-collapse the
    * machinery sees ONE row per distinct text and the quadratic
    * within-group row count exists only in the pair OUTPUT itself,
    * which is inherent to the pair contract — [[nearDupPairs]]'
    * expansion, verbatim). One shingle scan over reps, one frequency
    * shuffle, the narrow-row prefix window, the (prefix × posting)
    * equi-join with the length cut applied BEFORE the distinct, the
    * exact confirm on rep candidates only (ONE intersect per candidate
    * — Catalyst does not CSE the ∩ across the numerator and the union
    * denominator, so it is computed once and reused), then the
    * output-bound member expansion: within-group pairs score the
    * identical-text jaccard 1.0 (nonempty shingle sets only — empty
    * docs pair with nothing, as ever), cross-group member pairs
    * inherit their reps' jaccard, which IS their jaccard. */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
                   n: Int = 3, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0d && threshold <= 1.0d,
      "jaccard threshold must be in (0, 1]")
    val (members0, reps) = collapseByDigest(df, id, text)
    val members = members0.localCheckpoint() // expandPairs reads it 4x
    val (sets, prefixes) =
      prefixCandidateSides(reps, col("grp"), col("text"), n, threshold)
    val candidates = prefixes
      .join(sets.select(col("id").as("id_b"),
          size(col("hsh")).as("__szb"), explode(col("hsh")).as("h")), "h")
      .where(col("id_a") < col("id_b"))
      // length filter in the confirm's own double-division form:
      // min/max >= t is NECESSARY for J >= t and rounding-monotone
      .where(least(col("__sza"), col("__szb")).cast("double") /
        greatest(col("__sza"), col("__szb")).cast("double") >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
    val confirm = candidates
      .join(sets.select(col("id").as("id_a"), col("hsh").as("__ha")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hsh").as("__hb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ha"), col("__hb"))).as("__ix"),
        (size(col("__ha")) + size(col("__hb"))).as("__sum"))
      .select(col("id_a"), col("id_b"),
        (col("__ix").cast("double") /
          (col("__sum") - col("__ix")).cast("double")).as("__j"))
    val crossPairs = confirm.where(col("__j") >= threshold)
      .select(col("id_a").as("grp_a"), col("id_b").as("grp_b"),
        (round(col("__j"), 6) + lit(0.0d)).as("jaccard"))
    // identical texts: J = 1.0 by definition; `sets` already excludes
    // empty shingle sets, so empty-text groups emit nothing (the exact
    // behavior of the pre-collapse plan) and 1.0 >= threshold always
    val withinGroups = sets.select(col("id").as("grp"),
      lit(1.0d).as("jaccard"))
    expandPairs(members, crossPairs, withinGroups, "jaccard")
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
    // exact-duplicate collapse: identical texts have identical
    // fingerprints, so a group of m copies would collide in every band —
    // band over distinct texts only, expand members back afterwards
    val (members0, reps) = collapseByDigest(df, id, text)
    val members = members0.localCheckpoint() // expandPairs reads it 4x
    // materialized once: both sides of the self-join reuse it
    val sims = reps.select(col("grp"),
      simhash(hashedShingles(col("text"), shingleN), bits).as("sim"))
      .localCheckpoint()
    val banded = sims.select(col("grp"), col("sim"),
      posexplode(array((0 until numBands).map(k =>
        shiftright(col("sim"), k * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "key")))
    val repPairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.grp") < col("y.grp"))
      .select(col("x.grp").as("grp_a"), col("y.grp").as("grp_b"),
        hamming(col("x.sim"), col("y.sim")).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    // identical texts: hamming 0 by definition (constant-folded keep test)
    val withinGroups = sims
      .where(lit(0) <= lit(maxHamming))
      .select(col("grp"), lit(0).cast("int").as("hamming"))
    expandPairs(members, repPairs, withinGroups, "hamming")
  }
}
