package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, NearDup}
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
  private def hashSql(seed: Int, s: String): String =
    s"('0x' || substr(md5('$seed:' || $s), 1, 15))::BIGINT"

  /** DuckDB twin of NearDup.shingles(text, 2) over documents. */
  private val bigramShingles: String =
    """SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
      |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE []::VARCHAR[] END) AS sh
      |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |        FROM documents)""".stripMargin

  /** DuckDB twin of the exact-Jaccard confirm over all pairs (the oracle
    * may go all-pairs; the engine under test must not). */
  private val jaccardPairs: String =
    s"""s AS ($bigramShingles),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(a.sh || b.sh)) AS j
       |      FROM s a JOIN s b ON a.doc_id < b.doc_id)""".stripMargin

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

  /** MinHash-banded near-dup pairs, exact-Jaccard-confirmed at 0.5
    * (the sf data plants ~25 pairs at j >= 0.97; nothing sits in
    * [0.3, 0.8), so the threshold is far from any boundary). */
  private val nearPairs: QueryFn = (s, dir) =>
    NearDup.nearDupPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), n = 2, numHashes = 16, threshold = 0.5)
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
    val losers = NearDup.nearDupPairs(docs, col("doc_id"), col("text"),
      n = 2, numHashes = 16, threshold = 0.5).select(col("id_b"))
    docs.join(losers, docs("doc_id") === col("id_b"), "left_anti")
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  private val nearSurvivorsSql: String =
    s"""WITH $jaccardPairs
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_b FROM p WHERE j >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** SimHash fingerprint pairs at Hamming distance <= 3, banded into 8
    * 4-bit sub-keys (pigeonhole-lossless for <= numBands-1 = 7 differing
    * bits). 32-bit fingerprints over BIGRAM shingles: unigram simhash
    * degenerates on a small shared vocabulary (every doc collides);
    * bigrams restore diversity — 24 pairs at sf0.01, all planted dups. */
  private val simhashPairs: QueryFn = (s, dir) =>
    NearDup.simhashPairs(table(s, dir, "documents"),
        col("doc_id"), col("text"), shingleN = 2, bits = 32, numBands = 8,
        maxHamming = 3)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val simhashPairsSql: String = {
    val hash0 = hashSql(0, "s")
    val bitTerms = (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x >> $j) & 1 = 1 THEN 1 ELSE -1 END)) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"""WITH s AS ($bigramShingles),
       |toks AS (SELECT doc_id, list_transform(sh, s -> $hash0) AS hs FROM s),
       |h AS (SELECT doc_id, $bitTerms::BIGINT AS sim FROM toks)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.sim, b.sim))::INT AS hamming
       |FROM h a JOIN h b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Embedding-cosine near-dup: label-blocked self-join (the blocking key
    * IS the scale story — one shuffle on label, pairs only within a
    * block; at 100 TB the block key is a coarse cluster/LSH bucket). */
  private val embeddingNear: QueryFn = (s, dir) => {
    val e = table(s, dir, "embeddings").select(
      col("vec_id"), col("label"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("distance",
        round(cosineDistance(col("a.embedding"), col("b.embedding")), 6) + lit(0.0d))
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

  val all: Seq[Q] = Seq(
    Q("dedup_exact_groups", exactGroups, Some(exactGroupsSql)),
    Q("dedup_exact_survivors", exactSurvivors, Some(exactSurvivorsSql)),
    Q("dedup_near_pairs", nearPairs, Some(nearPairsSql)),
    Q("dedup_near_survivors", nearSurvivors, Some(nearSurvivorsSql)),
    Q("dedup_simhash_pairs", simhashPairs, Some(simhashPairsSql)),
    Q("dedup_embedding_near", embeddingNear, Some(embeddingNearSql)),
  )
}
