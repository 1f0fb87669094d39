package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, NearDup, SemanticDedup}
import graft.functions.VectorFunctions._

/** Training-data deduplication over the `documents` table — the first-class
  * scale extension (builder brief; SURVEY.md §2.9): exact digest dedup,
  * MinHash-banded near-dup with exact n-gram-Jaccard confirm, SimHash
  * fingerprint pairs, and embedding-cosine near-dup with blocked self-join.
  *
  * Every oracle recomputes the SAME md5-derived hashes in DuckDB SQL, so
  * the gate checks the full pipeline (shingling, hashing, banding,
  * confirmation), not just the final arithmetic.
  */
object DedupQueries {

  // ---------------- shared DuckDB fragments ----------------

  /** DuckDB twin of NearDup.seededHash. */
  private[queries] def hashSql(seed: Int, s: String): String =
    s"('0x' || substr(md5('$seed:' || $s), 1, 15))::BIGINT"

  /** DuckDB twin of NearDup.shingles(text, 2) over documents. */
  private val bigramShingles: String =
    s"""SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
      |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE []::VARCHAR[] END) AS sh
      |  FROM (SELECT doc_id, ${TextQueries.tokSql} AS t
      |        FROM documents)""".stripMargin

  /** DuckDB twin of NearDup.shingles(text, 3) hashed with seededHash(0)
    * — the confirm compares hashed trigram sets, exactly like the Spark
    * operator. Parameterized by source relation so the multilingual
    * fixture row replays the identical contract. */
  private[queries] def hashedTrigramSetsFrom(rel: String): String =
    s"""SELECT doc_id, list_distinct(list_transform(sh, s -> ${hashSql(0, "s")})) AS hsh
       |  FROM (SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE []::VARCHAR[] END) AS sh
       |    FROM (SELECT doc_id, ${TextQueries.tokSql} AS t
       |          FROM $rel))""".stripMargin

  private[queries] val hashedTrigramSets: String =
    hashedTrigramSetsFrom("documents")

  /** DuckDB twin of the exact-Jaccard confirm over all pairs (the oracle
    * may go all-pairs; the engine under test must not). */
  private[queries] def jaccardPairsFrom(rel: String): String =
    s"""s AS (${hashedTrigramSetsFrom(rel)}),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        len(list_intersect(a.hsh, b.hsh))::DOUBLE / len(list_distinct(a.hsh || b.hsh)) AS j
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id)""".stripMargin

  private[queries] val jaccardPairs: String = jaccardPairsFrom("documents")

  /** Exact dedup: hash-groupBy on content digest, keep min id
    * (one shuffle on the digest; at 100TB this is the cheapest possible
    * exact pass — the digest is 128 bits regardless of document size). */
  private val exactGroups: QueryFn = (s, dir) =>
    Dedup.exactGroups(table(s, dir, "documents"), col("text"), col("doc_id"))
      .orderBy(col("text_hash"))

  private val exactGroupsSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** The surviving rows after exact dedup (keeper = min doc_id per digest). */
  private val exactSurvivors: QueryFn = (s, dir) =>
    Dedup.exact(table(s, dir, "documents"), col("text"), col("doc_id"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  private val exactSurvivorsSql: String =
    """SELECT doc_id, source FROM documents
      |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
      |ORDER BY doc_id""".stripMargin

  /** MinHash-banded near-dup pairs, exact-Jaccard-confirmed at 0.5 over
    * hashed TRIGRAM sets. Trigrams (not bigrams) because this corpus has a
    * tiny vocabulary: unrelated trigram Jaccard tops out at 0.067 while
    * planted dups sit at >= 0.90 — so r=2 banding keeps buckets small
    * (bigram minhash with r=1 drops a large share of the corpus into one
    * bucket and goes quadratic). Miss probability for a true pair at
    * s=0.9: (1 - 0.81)^8 = 1.7e-6. */
  private val nearPairs: QueryFn = (s, dir) =>
    NearDup.nearDupPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), n = 3, numHashes = 16, rowsPerBand = 2,
        threshold = 0.5)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        (round(col("jaccard"), 6) + lit(0.0d)).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val nearPairsSql: String =
    s"""WITH $jaccardPairs
       |SELECT doc_a, doc_b, round(j, 6) + 0 AS jaccard FROM p
       |WHERE j >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** Greedy near-dup survivors: drop any doc that near-matches a
    * smaller-id doc (keep-first, the standard corpus-dedup policy). */
  private val nearSurvivors: QueryFn = (s, dir) => {
    val docs = table(s, dir, "documents")
    // the drop decision needs only the O(m)-per-group edge set (star +
    // representative edges — same greedy smaller-id drop relation as the
    // full pair list), never the expanded pairs: a group of m identical
    // boilerplate pages costs m-1 edges here, not m(m-1)/2
    val losers = NearDup.nearDupEdges(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5).select(col("id_b"))
    docs.join(losers, docs("doc_id") === col("id_b"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  private val nearSurvivorsSql: String =
    s"""WITH $jaccardPairs
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM p WHERE j >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** SimHash fingerprint pairs at Hamming distance <= 5: 48-bit
    * fingerprints over BIGRAM shingles, banded into 6 8-bit sub-keys
    * (pigeonhole-lossless for <= numBands-1 = 5 differing bits; 8-bit
    * keys keep per-bucket fan-in bounded where 4-bit nibbles would not).
    * At sf0.01 planted dups sit at hamming <= 5 and the nearest unrelated
    * pair at 7 — a clean gap. Unigram simhash degenerates on this small
    * shared vocabulary; bigrams restore diversity. */
  private val simhashPairs: QueryFn = (s, dir) =>
    NearDup.simhashPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), shingleN = 2, bits = 48, numBands = 6,
        maxHamming = 5)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val simhashPairsSql: String = {
    val hash0 = hashSql(0, "s")
    val bitTerms = (0 until 48).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x >> $j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"""WITH s AS ($bigramShingles),
       |toks AS (SELECT doc_id, list_distinct(list_transform(sh, s -> $hash0)) AS hs FROM s),
       |h AS (SELECT doc_id, $bitTerms::BIGINT AS sim FROM toks)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.sim, b.sim))::INT AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Embedding-cosine near-dup, PRE-BLOCKED variant: when the corpus
    * already carries a low-cardinality partition key (label/topic/shard),
    * pairs are compared only within a block. The LABEL-FREE general
    * operator — the 100 TB path for corpora with no such key — is
    * `dedup_embedding_near_lsh` below (NearDup.embeddingNearDupPairs,
    * blocking on a derived LSH bucket). The left side is SALTED and the
    * right side replicated to every salt value — with only ~10 distinct
    * labels a bare label join would squeeze all pairs through 10 reduce
    * slots; salting fans the same exact pair set out over label x salt
    * cells (each unordered pair lands exactly once, in the left row's
    * salt cell). */
  private val embeddingNear: QueryFn = (s, dir) => {
    val SALT = 8
    val e = table(s, dir, "embeddings").select(
      col("vec_id"), col("label"), col("embedding"))
    // Precompute each row's L2 norm BEFORE the join: the pair distance
    // then needs one dot product instead of three array folds — same
    // arithmetic as cosineDistance (1 - dot/(na*nb), +Inf on zero norm),
    // so the oracle is unchanged. Dot products use the fused codegen
    // expression (bit-identical to the HOF fold).
    import graft.functions.VectorExpressions
    val withNorm = e.withColumn("nrm",
      sqrt(VectorExpressions.dotProduct(col("embedding"), col("embedding"))))
    val a = withNorm.withColumn("salt", pmod(col("vec_id"), lit(SALT)))
    val b = withNorm.withColumn("salt",
      explode(sequence(lit(0), lit(SALT - 1)).cast("array<bigint>")))
    val rawDist = when(col("a.nrm") === 0.0d || col("b.nrm") === 0.0d,
        lit(Double.PositiveInfinity))
      .otherwise(lit(1.0d) -
        VectorExpressions.dotProduct(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
    a.as("a").join(b.as("b"),
        col("a.label") === col("b.label") && col("a.salt") === col("b.salt") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("distance", round(rawDist, 6) + lit(0.0d))
      .where(col("distance") <= 0.6)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("distance"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  private val embeddingNearSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "a.v", "b.v")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round($cos, 6) + 0 AS distance
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round($cos, 6) + 0 <= 0.6
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Label-FREE embedding near-dup: blocks on a derived LSH bucket of the
    * embedding itself (multi-probe to Hamming distance 1), so the operator
    * needs nothing but (id, embedding) — the shape a real corpus has. The
    * oracle inlines the same seeded projection matrix (LshQueries.bucketSql)
    * and replays the blocking as an all-pairs bit_count(xor) <= 1 filter —
    * checking bucket assignment, the multi-probe contract, AND the
    * distances, not just the arithmetic. */
  private val embeddingNearLsh: QueryFn = (s, dir) =>
    NearDup.embeddingNearDupPairs(
        table(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        LshQueries.config.matrix, threshold = 0.6)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("distance"))
      .orderBy(col("vec_a"), col("vec_b"))

  private val embeddingNearLshSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "a.v", "b.v")
    val bucket = LshQueries.bucketSql("embedding::DOUBLE[]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |                  ($bucket)::BIGINT AS b
       |           FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round($cos, 6) + 0 AS distance
       |FROM e a JOIN e b
       |  ON a.vec_id < b.vec_id AND bit_count(xor(a.b, b.b)) <= 1
       |WHERE round($cos, 6) + 0 <= 0.6
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Incremental dedup: documents 0..399 are the existing corpus, 400+
    * are an arriving batch; an arrival survives iff NO existing document
    * confirms at trigram-Jaccard >= 0.5. The oracle recomputes ALL cross
    * pairs (no banding), so this row also gates banding recall: a true
    * cross pair the bands missed would flip a survivor and fail the
    * hash. */
  private val IncrSplit = 400

  private val incrementalSurvivors: QueryFn = (s, dir) => {
    val docs = table(s, dir, "documents")
    val dropped = NearDup.incrementalNearDupPairs(
        docs.where(col("doc_id") < IncrSplit),
        docs.where(col("doc_id") >= IncrSplit),
        col("doc_id"), col("text"), n = 3, numHashes = 16, rowsPerBand = 2,
        threshold = 0.5)
      .select(col("arriving_id").as("doc_id"))
    docs.where(col("doc_id") >= IncrSplit)
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  private val incrementalSurvivorsSql: String =
    s"""WITH $jaccardPairs
       |SELECT doc_id FROM documents
       |WHERE doc_id >= $IncrSplit AND doc_id NOT IN (
       |  SELECT doc_b FROM p WHERE doc_a < $IncrSplit AND doc_b >= $IncrSplit
       |    AND j >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** Incremental EMBEDDING dedup: vectors 0..IncrSplit-1 are the indexed
    * corpus (their stored bucket column is the reused index artifact),
    * IncrSplit+ an arriving batch; every (arriving, existing) pair within
    * cosine 0.6 under the multi-probe contract is a reason-to-drop. The
    * oracle inlines the seeded projection matrix and replays the blocking
    * as bit_count(xor) <= 1 over the cross split — gating bucket
    * assignment, the probe contract, AND the distances. */
  private val incrementalEmbedding: QueryFn = (s, dir) => {
    val e = table(s, dir, "embeddings")
    // the corpus side arrives WITH its stored bucket column, exactly as a
    // reopened engine would hand it over
    val existing = e.where(col("vec_id") < IncrSplit)
      .withColumn("bucket", lshBucket(col("embedding"), LshQueries.config.matrix))
    NearDup.incrementalEmbeddingNearDupPairs(
        existing, e.where(col("vec_id") >= IncrSplit),
        col("vec_id"), col("embedding"), LshQueries.config.matrix,
        threshold = 0.6, existingBucket = Some(col("bucket")))
      .select(col("arriving_id"), col("existing_id"), col("distance"))
      .orderBy(col("arriving_id"), col("existing_id"))
  }

  private val incrementalEmbeddingSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "x.v", "a.v")
    val bucket = LshQueries.bucketSql("embedding::DOUBLE[]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |                  ($bucket)::BIGINT AS b
       |           FROM embeddings)
       |SELECT a.vec_id AS arriving_id, x.vec_id AS existing_id,
       |  round($cos, 6) + 0 AS distance
       |FROM e x JOIN e a
       |  ON x.vec_id < $IncrSplit AND a.vec_id >= $IncrSplit
       | AND bit_count(xor(x.b, a.b)) <= 1
       |WHERE round($cos, 6) + 0 <= 0.6
       |ORDER BY arriving_id, existing_id""".stripMargin
  }

  /** Transitive duplicate CLUSTERS: near-dup pairs are edges, a cluster
    * is a connected component, the canonical doc is the component's min
    * id. This is the semantics a corpus dedup wants — the greedy
    * keep-first policy above (`dedup_near_survivors`) KEEPS a doc whose
    * only matches have larger ids even when those matches chain to a
    * smaller canonical doc, so chains of drift (A~B, B~C, A!~C) leak
    * near-dups through pairwise dedup. Every doc gets a component
    * (isolated docs are their own). The oracle shingles and
    * exact-Jaccard-confirms ALL pairs — no banding replay, same contract
    * as the other near-dup rows ([[jaccardPairs]]) — so a banding recall
    * miss on the Spark side SHOWS UP as a missing edge here; the
    * transitive closure is then a recursive CTE over those edges. */
  private val dedupComponents: QueryFn = (s, dir) => {
    val docs = table(s, dir, "documents")
    // star + representative edges: identical connectivity to the full
    // pair graph at O(m) edges per exact-duplicate group — the closure
    // oracle below still replays ALL pairs, gating the equivalence
    val pairs = NearDup.nearDupEdges(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
    val comp = graft.operators.ConnectedComponents.components(
      pairs.select(col("id_a"), col("id_b")), "id_a", "id_b")
    docs.select(col("doc_id"))
      .join(comp, docs("doc_id") === comp("node"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
      .orderBy(col("doc_id"))
  }

  /** The SAME clusters through the large-star/small-star variant
    * (ConnectedComponents.componentsStar — O(log n) rounds at any
    * component diameter): identical output contract, identical oracle.
    * Putting the variant under the DuckDB hash gate means both CC
    * implementations are gated on real data, not only on the spec's
    * equivalence property. */
  private val dedupComponentsStar: QueryFn = (s, dir) => {
    val docs = table(s, dir, "documents")
    val pairs = NearDup.nearDupEdges(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
    val comp = graft.operators.ConnectedComponents.componentsStar(
      pairs.select(col("id_a"), col("id_b")), "id_a", "id_b")
    docs.select(col("doc_id"))
      .join(comp, docs("doc_id") === comp("node"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
      .orderBy(col("doc_id"))
  }

  /** Shared transitive-closure fragment over the confirmed pairs `p`:
    * symmetrized edges `e` (MATERIALIZED, so the recursion re-reads the
    * stored edge set instead of re-evaluating the all-pairs join per
    * step — 634 s → 300 s at sf0.1) and reachability `r` seeding every
    * doc with its own id. ONE definition for both cluster oracles, so a
    * threshold or closure change cannot desynchronize the two gates. */
  private[queries] val closureCtes: String =
    s"""e AS MATERIALIZED (SELECT doc_a AS sn, doc_b AS dn FROM p WHERE j >= 0.5
       |      UNION ALL SELECT doc_b, doc_a FROM p WHERE j >= 0.5),
       |r AS (SELECT doc_id AS node, doc_id AS comp FROM documents
       |      UNION
       |      SELECT e.dn, r.comp FROM r JOIN e ON r.node = e.sn)""".stripMargin

  private val dedupComponentsSql: String =
    s"""WITH RECURSIVE $jaccardPairs,
       |$closureCtes
       |SELECT node AS doc_id, min(comp) AS component FROM r
       |GROUP BY node ORDER BY doc_id""".stripMargin

  /** One survivor per duplicate cluster: the docs that ARE their
    * component's canonical id. */
  private val clusterSurvivors: QueryFn = (s, dir) =>
    dedupComponents(s, dir)
      .where(col("doc_id") === col("component"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  private val clusterSurvivorsSql: String =
    s"""WITH RECURSIVE $jaccardPairs,
       |$closureCtes
       |SELECT node AS doc_id FROM r
       |GROUP BY node HAVING node = min(comp) ORDER BY doc_id""".stripMargin

  /** CONTAINMENT pairs with exact prefix filtering (PPJoin family):
    * ordered pairs whose trigram-set containment |Sa∩Sb|/|Sa| clears
    * 0.9 — the one-sided overlap a quoted-subset duplicate shows when
    * symmetric Jaccard does not. The oracle goes ALL-PAIRS over the
    * identical hashed trigram sets, so a prefix one shingle too short
    * on the Spark side (a lost candidate) hash-mismatches the row —
    * the filter's exactness is the thing under gate, recall has no
    * dial here. */
  private val containmentPairsQ: QueryFn = (s, dir) =>
    NearDup.containmentPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), n = 3, threshold = 0.9)
      .orderBy(col("id_a"), col("id_b"))

  private val containmentPairsSql: String =
    s"""WITH s AS ($hashedTrigramSets),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        len(list_intersect(a.hsh, b.hsh))::DOUBLE / len(a.hsh) AS c
       |      FROM s a JOIN s b ON a.doc_id <> b.doc_id
       |      WHERE len(a.hsh) > 0)
       |SELECT id_a, id_b, round(c, 6) + 0 AS containment FROM p
       |WHERE c >= 0.9 ORDER BY id_a, id_b""".stripMargin

  /** EXACT Jaccard pair join (the exact-verification rung beside the
    * MinHash ESTIMATE of dedup_near_pairs): the oracle brute-forces all
    * unordered pairs over the same hashed trigram sets and recomputes
    * exact |∩|/|∪| — a prefix or length filter that loses even one
    * qualifying pair hash-mismatches the row. Threshold 0.5 keeps the
    * row's pair set distinct from the containment row's (quoted-doc
    * pairs drop, symmetric twins stay). */
  private val jaccardPairsQ: QueryFn = (s, dir) =>
    NearDup.jaccardPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  private val jaccardPairsExactSql: String =
    s"""WITH s AS ($hashedTrigramSets),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        len(list_intersect(a.hsh, b.hsh))::DOUBLE /
       |          (len(a.hsh) + len(b.hsh) -
       |           len(list_intersect(a.hsh, b.hsh))) AS j
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id
       |      WHERE len(a.hsh) > 0 AND len(b.hsh) > 0)
       |SELECT id_a, id_b, round(j, 6) + 0 AS jaccard FROM p
       |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** Multilingual near-dup over the committed unicode fixture — the
    * gate for the PINNED Unicode tokenization contract (NFC +
    * per-code-point simple lowercase + explicit whitespace class):
    * every planted twin pair crosses a representation boundary ASCII
    * testdata cannot exercise — Turkish İ/I case folding, NFC-vs-NFD
    * accents, ideographic/NBSP separators, Greek sigma, uppercase ẞ.
    * Same operator parameters as dedup_near_pairs; the oracle replays
    * the identical trigram-Jaccard contract in DuckDB over the same
    * parquet bytes, so a single divergent code-point mapping between
    * the JIT kernel and utf8proc hash-mismatches the row. */
  private val UnicodeFixture: String =
    s"${AnnQueries.FixturesDir}/unicode_docs.parquet"

  private val nearUnicode: QueryFn = (s, _) =>
    NearDup.nearDupPairs(s.read.parquet(UnicodeFixture),
        col("doc_id"), col("text"), n = 3, numHashes = 16, rowsPerBand = 2,
        threshold = 0.5)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        (round(col("jaccard"), 6) + lit(0.0d)).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val nearUnicodeSql: String =
    s"""WITH ${jaccardPairsFrom(s"read_parquet('$UnicodeFixture')")}
       |SELECT doc_a, doc_b, round(j, 6) + 0 AS jaccard FROM p
       |WHERE j >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  // ---------------- substring-level exact dedup (ExactSubstr) --------

  /** TrainingData.removeDuplicatedSubstrings over the planted-passage
    * fixture (tools/make_substr.py): the oracle re-derives the pinned
    * token stream, every positional minLen-window md5, the >= 2
    * occurrence cut (occurrences, not documents — the intra-doc pair in
    * doc 3 must drop), the trailing-ROWS-window coverage, and the
    * in-order reassembly; the full-dup pair leaves empty husks and the
    * below-minLen shared span must survive untouched. */
  private val SubstrFixture: String =
    s"${AnnQueries.FixturesDir}/substr_docs.parquet"
  private val SubstrMinLen = 20

  private val substrDedup: QueryFn = (s, _) =>
    graft.operators.TrainingData.removeDuplicatedSubstrings(
        s.read.parquet(SubstrFixture), col("doc_id"), col("text"),
        minLen = SubstrMinLen)
      .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  private val substrDedupSql: String = {
    val k = SubstrMinLen
    s"""WITH d AS (SELECT doc_id, ${TextQueries.tokSql} AS t
       |  FROM read_parquet('$SubstrFixture')),
       |occ AS (
       |  SELECT doc_id, i - 1 AS p, t[i] AS tok,
       |    CASE WHEN i + $k - 1 <= len(t)
       |         THEN md5(array_to_string(t[i : i + $k - 1], ' ')) END AS h
       |  FROM d, unnest(range(1, len(t) + 1)) AS u(i)),
       |dup AS (SELECT h FROM occ WHERE h IS NOT NULL
       |        GROUP BY h HAVING count(*) >= 2),
       |cov AS (
       |  SELECT o.doc_id, o.p, o.tok,
       |    max(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY o.doc_id ORDER BY o.p
       |            ROWS BETWEEN $k - 1 PRECEDING AND CURRENT ROW) AS c
       |  FROM occ o LEFT JOIN dup ON o.h = dup.h),
       |kept AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY p) AS clean_text
       |  FROM cov WHERE c = 0 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       |  (len(d.t) - coalesce(k.n_kept, 0))::BIGINT AS n_removed,
       |  md5(coalesce(k.clean_text, '')) AS clean_md5
       |FROM d LEFT JOIN kept k USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------- cross-source corpus overlap ----------------

  /** MinHash corpus-overlap estimate between sources (Broder
    * resemblance at corpus granularity): the oracle re-derives the
    * per-source distinct trigram-hash sets, replays the SAME affine
    * minhash family (coefficients generated from
    * NearDup.minhashCoeffs — one Scala home, the SQL cannot drift), and
    * recomputes the per-pair agreement counts and rounded estimates. */
  private val OverlapHashes = 16

  private val sourceOverlap: QueryFn = (s, dir) =>
    NearDup.sourceOverlap(table(s, dir, "documents"), col("source"),
        col("text"), n = 3, numHashes = OverlapHashes)
      .select(col("grp_a").as("source_a"), col("grp_b").as("source_b"),
        col("agreements"), col("est_jaccard"))
      .orderBy(col("source_a"), col("source_b"))

  private val sourceOverlapSql: String = {
    val mins = (0 until OverlapHashes).map { j =>
      val (a, b) = NearDup.minhashCoeffs(j)
      s"min(($a * x + $b) % ${NearDup.MinhashPrime}) AS m$j"
    }.mkString(", ")
    val agreeTerms = (0 until OverlapHashes).map(j =>
      s"(CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH s AS ($hashedTrigramSets),
       |ds AS (SELECT doc_id, source FROM documents),
       |hs AS (SELECT DISTINCT ds.source, h % 1073741824 AS x
       |       FROM (SELECT doc_id, unnest(hsh) AS h FROM s) e
       |       JOIN ds USING (doc_id)),
       |sig AS (SELECT source, $mins FROM hs GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  ($agreeTerms)::BIGINT AS agreements,
       |  round(($agreeTerms)::DOUBLE / $OverlapHashes, 6) + 0 AS est_jaccard
       |FROM sig a JOIN sig b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin
  }

  // ---------------- SemDeDup: semantic dedup over k-means cells ----------------

  /** SemDeDup (Abbas et al. 2023): pairs compared only within their
    * k-means cell (the committed IVF centroid fixture — the SAME coarse
    * model the `ann_ivf_*` gates replay); among duplicates keep the row
    * FARTHEST from its centroid. The oracle replays cell assignment, the
    * centroid-distance keep priority, the within-cell pair distances, and
    * the domination rule — the whole method, not just the arithmetic. */
  private val SemThreshold = 0.6

  /** Shared CTE chain: fixture centroids -> euclidean-argmin cell
    * assignment (ties to the smaller cid — the `ann_ivf_topk` contract)
    * -> rounded cosine keep-priority `cdist`. */
  private def semanticCellsSql: String = {
    val cosCent = VectorSearchQueries.distSql("cosine", "v", "cv")
    s"""c AS (SELECT cid, cv::DOUBLE[] AS cv FROM ${AnnQueries.FixtureSql}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |asgn AS (SELECT e.vec_id, e.v, c.cid, c.cv,
       |        row_number() OVER (PARTITION BY e.vec_id
       |                           ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
       |      FROM e, c),
       |cell AS (SELECT vec_id, v, cid, round($cosCent, 6) + 0 AS cdist
       |         FROM asgn WHERE rn = 1)""".stripMargin
  }

  private val semanticPairs: QueryFn = (s, dir) =>
    SemanticDedup.pairs(table(s, dir, "embeddings"), col("vec_id"),
        col("embedding"), AnnQueries.fixtureCentroids(s), SemThreshold)
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("distance"))
      .orderBy(col("vec_a"), col("vec_b"))

  private val semanticPairsSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "x.v", "y.v")
    s"""WITH $semanticCellsSql,
       |p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |        round($cos, 6) + 0 AS distance
       |      FROM cell x JOIN cell y ON x.cid = y.cid AND x.vec_id < y.vec_id)
       |SELECT vec_a, vec_b, distance FROM p WHERE distance <= $SemThreshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  private val semanticSurvivors: QueryFn = (s, dir) =>
    SemanticDedup.survivors(table(s, dir, "embeddings"), col("vec_id"),
        col("embedding"), AnnQueries.fixtureCentroids(s), SemThreshold)
      .select(col("id").as("vec_id"), col("cell"), col("cdist"))
      .orderBy(col("vec_id"))

  private val semanticSurvivorsSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "x.v", "y.v")
    s"""WITH $semanticCellsSql,
       |p AS (SELECT x.vec_id AS a, x.cdist AS ca, y.vec_id AS b, y.cdist AS cb,
       |        round($cos, 6) + 0 AS d
       |      FROM cell x JOIN cell y ON x.cid = y.cid AND x.vec_id <> y.vec_id),
       |dropped AS (SELECT a FROM p
       |            WHERE d <= $SemThreshold AND (cb > ca OR (cb = ca AND b < a)))
       |SELECT vec_id, cid AS cell, cdist FROM cell
       |WHERE vec_id NOT IN (SELECT a FROM dropped)
       |ORDER BY vec_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("dedup_substring", substrDedup, Some(substrDedupSql)),
    Q("dedup_source_overlap", sourceOverlap, Some(sourceOverlapSql)),
    Q("dedup_semantic_pairs", semanticPairs, Some(semanticPairsSql)),
    Q("dedup_semantic_survivors", semanticSurvivors, Some(semanticSurvivorsSql)),
    Q("dedup_near_unicode", nearUnicode, Some(nearUnicodeSql)),
    Q("dedup_exact_groups", exactGroups, Some(exactGroupsSql)),
    Q("dedup_incremental_survivors", incrementalSurvivors, Some(incrementalSurvivorsSql)),
    Q("dedup_incremental_embedding", incrementalEmbedding, Some(incrementalEmbeddingSql)),
    Q("dedup_exact_survivors", exactSurvivors, Some(exactSurvivorsSql)),
    Q("dedup_near_pairs", nearPairs, Some(nearPairsSql)),
    Q("dedup_near_survivors", nearSurvivors, Some(nearSurvivorsSql)),
    Q("dedup_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    Q("dedup_containment_pairs", containmentPairsQ, Some(containmentPairsSql)),
    Q("dedup_jaccard_exact", jaccardPairsQ, Some(jaccardPairsExactSql)),
    Q("dedup_embedding_near", embeddingNear, Some(embeddingNearSql)),
    Q("dedup_embedding_near_lsh", embeddingNearLsh, Some(embeddingNearLshSql)),
    Q("dedup_components", dedupComponents, Some(dedupComponentsSql)),
    Q("dedup_components_star", dedupComponentsStar, Some(dedupComponentsSql)),
    Q("dedup_cluster_survivors", clusterSurvivors, Some(clusterSurvivorsSql)),
  )
}
