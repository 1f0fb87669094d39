package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Engine lifecycle end-to-end through the oracle gate (SURVEY.md §2.8):
  * create -> bulk ingest -> cascade delete -> derived counts, and a full
  * persistence round-trip (save -> reopen -> search) for both index kinds.
  *
  * The engine state is BUILT from the driver's `embeddings` table
  * (documents = one per label, chunks = one per vector, ids derived from
  * vec_id/label), so every final state is a deterministic function of the
  * input parquet that DuckDB can recompute directly.
  */
object EngineQueries {

  /** Build an engine holding the embeddings table as one library:
    * documents doc-<label>, chunks c<vec_id>; then cascade-delete doc-7.
    * An `ivf` library gets the committed fixture centroid model installed
    * BEFORE ingest, so bulk ingest derives and stores the cell column. */
  private def buildEngine(s: SparkSession, dir: String, kind: String,
                          deleteDoc7: Boolean,
                          metric: String = "cosine",
                          storage: String = VectorEngine.StorageFloat32): (VectorEngine, String) = {
    val eng = VectorEngine.create(s)
    val lib = eng.createLibrary("embeddings", dim = 64, metric = metric,
      indexKind = kind, id = Some("lib0"),
      lshProjections = LshQueries.config.numProjections,
      lshSeed = LshQueries.config.seed,
      storage = storage)
    if (kind == VectorEngine.IndexKindIvf)
      eng.setIvfCentroids(lib.id,
        AnnQueries.fixtureCentroids(s).map(c => c.id -> c.vec.toSeq))
    if (storage == VectorEngine.StoragePq)
      // an ivf+pq library residual-encodes (classic IVFADC), so it gets
      // the codebooks trained on residuals; flat pq gets the raw ones
      eng.setPqCodebooks(lib.id,
        if (kind == VectorEngine.IndexKindIvf) AnnQueries.fixturePqResidualRows(s)
        else AnnQueries.fixturePqRows(s))
    eng.addDocumentsDf(lib.id, table(s, dir, "embeddings")
      .select(concat(lit("doc-"), col("label")).as("id"))
      .distinct()
      .select(col("id"), col("id").as("name"),
        typedLit(Map.empty[String, String]).as("metadata")))
    // typed parity metadata on every chunk (the DF bulk path takes
    // PRE-ENCODED values) so the filtered-funnel rows below can reuse the
    // same cached states; rows that ignore metadata are unaffected
    val chunkDf = table(s, dir, "embeddings").select(
      concat(lit("c"), col("vec_id")).as("id"),
      concat(lit("doc-"), col("label")).as("document_id"),
      concat(lit("vec "), col("vec_id")).as("text"),
      col("embedding"),
      map(lit("parity"),
        graft.functions.MetadataFunctions.encodeIntCol(col("vec_id") % 2))
        .as("metadata"),
      col("vec_id").cast("int").as("chunk_index"))
    eng.addChunksDf(lib.id, chunkDf)
    if (deleteDoc7) eng.deleteDocument("doc-7")
    (eng, lib.id)
  }

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    table(s, dir, "embeddings").where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  /** Built-and-saved engine states, one per distinct configuration per
    * process. Every lifecycle row's DELIVERABLE is the reopen-from-disk +
    * search path; the create + bulk ingest + save prologue is a pure
    * function of (session, sf dir, kind, delete flag, metric, storage),
    * so it runs ONCE and each row (and each timed bench pass) opens the
    * saved state fresh. That is also the honest split at scale: ingest is
    * a pipeline job, open + search is the serving path being measured.
    * Single global lock: builds are rare (<= 5 per process) and the
    * cached engines are only ever read after construction. */
  private val stateCache = scala.collection.mutable.HashMap[
    (SparkSession, String, String, Boolean, String, String),
    (VectorEngine, String, String)]()

  private def builtState(s: SparkSession, dir: String, kind: String,
                         deleteDoc7: Boolean, metric: String = "cosine",
                         storage: String = VectorEngine.StorageFloat32)
      : (VectorEngine, String, String) = stateCache.synchronized {
    stateCache.getOrElseUpdate((s, dir, kind, deleteDoc7, metric, storage), {
      val (eng, lib) = buildEngine(s, dir, kind, deleteDoc7, metric, storage)
      val state = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
      eng.save(state)
      (eng, lib, state)
    })
  }

  /** A2/J6: derived chunk counts per document after a cascade delete —
    * counts are a groupBy at read time, so the cascade can never leave a
    * drifted counter behind. */
  private val cascadeCounts: QueryFn = (s, dir) => {
    val (eng, _, _) = builtState(s, dir, VectorEngine.IndexKindFlat, deleteDoc7 = true)
    eng.chunksDf.groupBy(col("document_id"))
      .agg(count(lit(1)).as("n_chunks"))
      .orderBy(col("document_id"))
  }

  private val cascadeCountsSql: String =
    """SELECT 'doc-' || label AS document_id, count(*)::BIGINT AS n_chunks
      |FROM embeddings WHERE label <> 7
      |GROUP BY label ORDER BY document_id""".stripMargin

  /** S2-S5 + §3.1: full persistence round-trip — build, cascade-delete,
    * save, REOPEN, then search the reopened engine (mirrors
    * test_disk_persistence.py:240-271 as an oracle row). */
  private val searchPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindFlat, deleteDoc7 = true)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val searchPersistedSql: String =
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT 'c' || vec_id AS chunk_id,
       |  round(${VectorSearchQueries.distSql("cosine", "embedding::DOUBLE[]", "qv")}, 6) + 0 AS distance
       |FROM embeddings, q WHERE label <> 7
       |ORDER BY distance, chunk_id LIMIT 10""".stripMargin

  /** MMR at the facade over the PERSISTED flat library (cascade delete
    * applied): the funnel produces the pool (top-20 exact cosine over the
    * surviving chunks), then the greedy diversity selection — the oracle
    * replays pool cut, pair similarities, the sequential argmax (recursive
    * CTE), string-id tie-breaks, and the rounded output scores. */
  private val MmrLcK = 5
  private val MmrLcPool = 20
  private val MmrLcLambda = 0.7

  private val mmrPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindFlat, deleteDoc7 = true)
    val eng2 = VectorEngine.open(s, state)
    eng2.searchMmr(lib, queryVec(s, dir), k = MmrLcK, poolSize = MmrLcPool,
        lambda = MmrLcLambda)
      .orderBy(col("rank"))
  }

  private val mmrPersistedSql: String = {
    val lam = MmrLcLambda.toString
    val mu = graft.operators.MmrRerank.muSql(MmrLcLambda)
    val relDist = VectorSearchQueries.distSql("cosine", "embedding::DOUBLE[]", "qv")
    val pairDist = VectorSearchQueries.distSql("cosine", "a.v", "b.v")
    s"""WITH RECURSIVE q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |pool AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v,
       |           CASE WHEN isinf(round($relDist, 6) + 0) THEN 0.0
       |                ELSE 1 - (round($relDist, 6) + 0) END AS rel
       |         FROM embeddings, q WHERE label <> 7
       |         ORDER BY round($relDist, 6) + 0, 'c' || vec_id LIMIT $MmrLcPool),
       |sims AS (SELECT a.chunk_id AS a, b.chunk_id AS b,
       |           CASE WHEN isinf(round($pairDist, 6) + 0) THEN 0.0
       |                ELSE 1 - (round($pairDist, 6) + 0) END AS sim
       |         FROM pool a JOIN pool b ON a.chunk_id <> b.chunk_id),
       |sel(rank, sel) AS (
       |  SELECT 1, [(SELECT chunk_id FROM pool ORDER BY rel DESC, chunk_id LIMIT 1)]
       |  UNION ALL
       |  SELECT rank + 1, list_append(sel, (
       |    SELECT p.chunk_id FROM pool p WHERE NOT list_contains(sel, p.chunk_id)
       |    ORDER BY $lam * p.rel - $mu * (SELECT max(s.sim) FROM sims s
       |               WHERE s.a = p.chunk_id AND list_contains(sel, s.b)) DESC,
       |             p.chunk_id
       |    LIMIT 1))
       |  FROM sel WHERE rank < $MmrLcK),
       |picks AS (SELECT unnest(sel) AS chunk_id, generate_subscripts(sel, 1) AS rank
       |          FROM (SELECT sel FROM sel WHERE rank = $MmrLcK))
       |SELECT pk.rank::INT AS rank, pk.chunk_id, round(p.rel, 6) + 0 AS relevance,
       |  round($lam * p.rel - $mu * coalesce((SELECT max(s.sim) FROM sims s
       |     WHERE s.a = pk.chunk_id
       |       AND s.b IN (SELECT chunk_id FROM picks p2 WHERE p2.rank < pk.rank)),
       |     0.0), 6) + 0 AS mmr
       |FROM picks pk JOIN pool p USING (chunk_id)
       |ORDER BY rank""".stripMargin
  }

  /** Same round-trip for a random_projection library: the persisted
    * projection matrix must reproduce identical buckets after reopen (S4 +
    * S5). The facade's DEFAULT probe is now ADAPTIVE, so the oracle
    * replays the full query-directed selection (margins -> costed
    * histogram -> prefix cut at k * AdaptiveMultiplier) over the chunk
    * ids — at small scale factors the prefix covers every bucket (= the
    * exhaustive fallback), at larger ones it is genuinely partial; the
    * replay is correct either way. */
  private val lshPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindLsh, deleteDoc7 = false)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val lshPersistedSql: String =
    LshQueries.adaptiveSql("'c' || vec_id", "chunk_id",
      10L * graft.operators.LshIndex.AdaptiveMultiplier, 10)

  /** LSH maintenance at the index level (the lsh twin of
    * `lifecycle_ivf_retrain`): a REOPENED random_projection library is
    * re-projected to MORE projections (the installation path of
    * `reprojectLshIndexIfCrowded`, with the new count pinned so the
    * oracle can replay the re-derived seeded matrix; the
    * occupancy-triggered policy itself is spec-gated by LshSpec /
    * EngineSpec — it is data-dependent and so not SQL-expressible as
    * one static statement). Gates what a re-projection must preserve:
    * every stored bucket re-derived under the wider matrix in one
    * projection, the histogram rebuilt, and the adaptive probe (the
    * facade default) selecting over the NEW buckets/margins with
    * results exact over the re-keyed index. */
  private val LshRetrainP = 8

  private val lshRetrained: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindLsh,
      deleteDoc7 = false)
    val eng2 = VectorEngine.open(s, state)
    eng2.setLshProjections(lib, LshRetrainP)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val lshRetrainedSql: String =
    LshQueries.adaptiveSql("'c' || vec_id", "chunk_id",
      10L * graft.operators.LshIndex.AdaptiveMultiplier, 10,
      c = graft.operators.LshIndex.Config(LshRetrainP,
        LshQueries.config.dim, LshQueries.config.seed))

  /** Facade batch search on an LSH library: 4 queries in ONE plan, each
    * with its own ADAPTIVE probe set (the facade default). The oracle
    * replays the per-query selection — per-query margins/costs over the
    * shared bucket histogram, a PARTITION BY query_id cumulative prefix
    * cut, then per-query top-k — so each query's data-dependent probe set
    * is gated at any scale factor. */
  private val batchSearch: QueryFn = (s, dir) => {
    // same built state as lshPersisted, but searched through the REOPENED
    // engine too: batch search must work against loaded state, not only
    // against the engine that ingested the data
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindLsh, deleteDoc7 = false)
    val eng = VectorEngine.open(s, state)
    val qs = table(s, dir, "embeddings").where(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toSeq.sortBy(_._1)
    eng.searchBatch(lib, qs, k = 5)
  }

  private val batchSearchSql: String = {
    val bucket = LshQueries.bucketSql("embedding::DOUBLE[]")
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    val target = 5L * graft.operators.LshIndex.AdaptiveMultiplier
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, $bucket AS qb,
       |           ${LshQueries.marginColsSql}
       |           FROM embeddings WHERE vec_id < 4),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v, $bucket AS b
       |      FROM embeddings),
       |hist AS (SELECT b, count(*) AS n FROM e GROUP BY b),
       |cost AS (SELECT q.query_id, h.b, h.n, ${LshQueries.costSql} AS cost FROM hist h, q),
       |sel AS (SELECT query_id, b FROM (
       |          SELECT query_id, b, n, cost,
       |                 sum(n) OVER (PARTITION BY query_id ORDER BY cost, b
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS cum_before
       |          FROM cost) WHERE cum_before < $target),
       |base AS (SELECT q.query_id, e.chunk_id, e.v, q.qv
       |         FROM e JOIN sel ON e.b = sel.b
       |                JOIN q ON q.query_id = sel.query_id),
       |r AS (SELECT query_id, chunk_id, round($cos, 6) + 0 AS distance,
       |        row_number() OVER (PARTITION BY query_id
       |                           ORDER BY round($cos, 6) + 0, chunk_id) AS rn
       |      FROM base)
       |SELECT query_id, chunk_id, distance FROM r WHERE rn <= 5
       |ORDER BY query_id, distance, chunk_id""".stripMargin
  }

  /** Full persistence round-trip for an IVF library (the scale index as a
    * first-class library index_kind): fixture centroid model installed at
    * create time, cells stored at bulk ingest, model persisted as
    * centroids.parquet beside the LSH matrices, cells re-derived on
    * reopen, then an nprobe-cell probe search with the `< k` exhaustive
    * fallback. The oracle replays cell assignment, probe selection, the
    * conditional fallback, and scoring from the same fixture parquet. */
  private val ivfPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindIvf, deleteDoc7 = false)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  /** IVF maintenance at the model level: a REOPENED ivf library gets a
    * NEW centroid model installed (the retrain path of
    * `retrainIvfIndexIfSkewed`, with the model pinned to a
    * deterministic transform — the NEGATED fixture — so the oracle can
    * replay it; k-means quality itself is spec-gated by IvfSpec).
    * Gates what a retrain must preserve: every stored cell re-derived
    * under the new model in one projection, probe selection and the
    * `< k` fallback running against the NEW cells, search results
    * exact over the reassigned index. */
  private val ivfRetrained: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindIvf, deleteDoc7 = false)
    val eng2 = VectorEngine.open(s, state)
    eng2.setIvfCentroids(lib,
      AnnQueries.fixtureCentroids(s).map(c => c.id -> c.vec.map(x => -x).toSeq))
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val ivfRetrainedSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    s"""WITH c AS (SELECT cid, list_transform(cv::DOUBLE[], x -> -x) AS cv
       |           FROM ${AnnQueries.FixtureSql}),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (SELECT e.chunk_id, e.v, c.cid,
       |        row_number() OVER (PARTITION BY e.chunk_id
       |                           ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
       |      FROM e, c),
       |cell AS (SELECT chunk_id, v, cid FROM a WHERE rn = 1),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cid FROM c, q
       |          ORDER BY list_distance(qv, cv), cid LIMIT ${VectorEngine.DefaultIvfNProbe}),
       |cand AS (SELECT cell.chunk_id, cell.v, q.qv FROM cell, q
       |         WHERE cid IN (SELECT cid FROM probe)),
       |base AS (
       |  SELECT chunk_id, v, qv FROM cand WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT cell.chunk_id, cell.v, q.qv FROM cell, q
       |  WHERE (SELECT count(*) FROM cand) < 10
       |)
       |SELECT chunk_id, round($cos, 6) + 0 AS distance
       |FROM base ORDER BY distance, chunk_id LIMIT 10""".stripMargin
  }

  private val ivfPersistedSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    s"""WITH c AS (SELECT cid, cv::DOUBLE[] AS cv FROM ${AnnQueries.FixtureSql}),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v FROM embeddings),
       |a AS (SELECT e.chunk_id, e.v, c.cid,
       |        row_number() OVER (PARTITION BY e.chunk_id
       |                           ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
       |      FROM e, c),
       |cell AS (SELECT chunk_id, v, cid FROM a WHERE rn = 1),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cid FROM c, q
       |          ORDER BY list_distance(qv, cv), cid LIMIT ${VectorEngine.DefaultIvfNProbe}),
       |cand AS (SELECT cell.chunk_id, cell.v, q.qv FROM cell, q
       |         WHERE cid IN (SELECT cid FROM probe)),
       |base AS (
       |  SELECT chunk_id, v, qv FROM cand WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT cell.chunk_id, cell.v, q.qv FROM cell, q
       |  WHERE (SELECT count(*) FROM cand) < 10
       |)
       |SELECT chunk_id, round($cos, 6) + 0 AS distance
       |FROM base ORDER BY distance, chunk_id LIMIT 10""".stripMargin
  }

  /** Full persistence round-trip for an ivf library with storage="sq8"
    * under `metric` — the
    * billion-vector library shape: uint8 codes derived INSIDE the bulk
    * ingest plan and persisted in-row, cells + centroid model persisted as
    * before, then a reopened `search()` runs the whole funnel — nprobe
    * cell prune (with the `< k` exhaustive fallback), approximate COSINE
    * top-R over the decoded codes only, exact O(R) cosine rescore. The
    * oracle replays every stage: cell assignment, probe selection, the
    * fallback decision, the encode, the approx cut, and the rescore.
    * Parameterized by metric so the engine-level funnel is gated under
    * BOTH the reference's default (cosine) AND euclidean — not just
    * whichever one the operator-level ann_* rows happen to use. */
  private def ivfSq8Persisted(metric: String): QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindIvf,
      deleteDoc7 = false, metric = metric, storage = VectorEngine.StorageSq8)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private def ivfSq8PersistedSql(metric: String, eFilter: String = ""): String = {
    val nprobe = VectorEngine.DefaultIvfNProbe
    val r = VectorEngine.DefaultSq8Rescore
    val approxCos = VectorSearchQueries.distSql(metric, "dec", "qv")
    val exactCos = VectorSearchQueries.distSql(metric, "base.v", "q.qv")
    s"""WITH c AS (SELECT cid, cv::DOUBLE[] AS cv FROM ${AnnQueries.FixtureSql}),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v,
       |             list_min(embedding::DOUBLE[]) AS mn,
       |             list_max(embedding::DOUBLE[]) AS mx
       |      FROM embeddings $eFilter),
       |a AS (SELECT e.chunk_id, e.v, e.mn, e.mx, c.cid,
       |        row_number() OVER (PARTITION BY e.chunk_id
       |                           ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
       |      FROM e, c),
       |cell AS (SELECT chunk_id, v, mn, mx, cid FROM a WHERE rn = 1),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cid FROM c, q
       |          ORDER BY list_distance(qv, cv), cid LIMIT $nprobe),
       |cand AS (SELECT chunk_id, v, mn, mx FROM cell
       |         WHERE cid IN (SELECT cid FROM probe)),
       |base AS (
       |  SELECT chunk_id, v, mn, mx FROM cand
       |  WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT chunk_id, v, mn, mx FROM cell
       |  WHERE (SELECT count(*) FROM cand) < 10
       |),
       |enc AS (SELECT chunk_id, v, mn, mx,
       |          CASE WHEN mx = mn THEN list_transform(v, x -> 0)
       |               ELSE list_transform(v, x ->
       |                 floor((x - mn) * 255.0 / (mx - mn) + 0.5)::INT) END AS codes
       |        FROM base),
       |dc AS (SELECT enc.chunk_id, list_transform(codes, cc ->
       |         mn + (cc * (mx - mn)) / 255.0) AS dec, qv
       |       FROM enc, q),
       |d AS (SELECT chunk_id, $approxCos AS approx FROM dc),
       |r AS (SELECT chunk_id FROM d ORDER BY approx, chunk_id LIMIT $r)
       |SELECT base.chunk_id, round($exactCos, 6) + 0 AS distance
       |FROM base, q WHERE base.chunk_id IN (SELECT chunk_id FROM r)
       |ORDER BY distance, chunk_id LIMIT 10""".stripMargin
  }

  /** Full persistence round-trip for a flat library with storage="bq" —
    * the 1-bit scan rung as a first-class storage kind: sign bits packed
    * 31/int word into the shared codes column INSIDE the bulk-ingest
    * plan and persisted in-row, then a reopened `search()` runs the
    * two-phase funnel — Hamming top-R over the stored words only, exact
    * cosine rescore at the storage kind's default depth. The oracle
    * replays the 31-bit MSB-first packing fold, the per-word XOR
    * bit_count, the (hamming, id) cut at R, and the rescore. */
  private val bqPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindFlat,
      deleteDoc7 = false, metric = "cosine", storage = VectorEngine.StorageBq)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val bqPersistedSql: String = {
    import graft.operators.BinaryQuantization.{encodeWordsIntSql, hammingSql}
    val dim = 64
    val r = VectorEngine.DefaultBqRescore
    val exactCos = VectorSearchQueries.distSql("cosine", "e.v", "q.qv")
    s"""WITH e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v
       |           FROM embeddings),
       |enc AS (SELECT chunk_id, v,
       |    ${encodeWordsIntSql("v", dim)} AS codes
       |  FROM e),
       |qe AS (SELECT codes AS qc FROM enc WHERE chunk_id = 'c0'),
       |ham AS (SELECT enc.chunk_id,
       |    ${hammingSql("enc.codes", "qe.qc", dim)} AS h
       |  FROM enc, qe),
       |surv AS (SELECT chunk_id FROM ham ORDER BY h, chunk_id LIMIT $r),
       |q AS (SELECT v AS qv FROM e WHERE chunk_id = 'c0')
       |SELECT e.chunk_id, round($exactCos, 6) + 0 AS distance
       |FROM e, q WHERE e.chunk_id IN (SELECT chunk_id FROM surv)
       |ORDER BY distance, chunk_id LIMIT 10""".stripMargin
  }

  /** Metadata-FILTERED search through the full ivf+sq8 funnel (P1 x the
    * quantized scale path): the typed filter scopes the chunk set BEFORE
    * the index is consulted, so every later stage — the probed-cell
    * candidate set, the `< k` fallback decision, the SQ8 approx cut, the
    * exact rescore — runs on the allow set. The oracle replays the whole
    * funnel over the filtered rows, so a regression that applied the
    * filter after the ADC cut (returning fewer than k survivors) or
    * counted unfiltered candidates in the fallback decision would
    * hash-mismatch. Reuses the lifecycle_ivf_sq8_persisted built state
    * (parity metadata is ingested on every chunk). */
  private val filteredIvfSq8: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindIvf,
      deleteDoc7 = false, metric = "cosine", storage = VectorEngine.StorageSq8)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10, filters = Map("parity" -> 0))
  }

  private val filteredIvfSq8Sql: String =
    ivfSq8PersistedSql("cosine", eFilter = "WHERE vec_id % 2 = 0")

  /** Metadata-FILTERED adaptive LSH search: with a filter present the
    * engine has no maintained histogram to trust (it counts rows the
    * filter excludes, which would under-probe), so it aggregates the
    * ALLOW-SET's histogram and runs the query-directed prefix cut over
    * that. The oracle replays margins -> filtered histogram -> cut ->
    * exact top-k over the filtered buckets. Reuses the
    * lifecycle_lsh_persisted built state. */
  private val filteredLshAdaptive: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindLsh,
      deleteDoc7 = false)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10, filters = Map("parity" -> 1))
  }

  private val filteredLshAdaptiveSql: String =
    LshQueries.adaptiveSql("'c' || vec_id", "chunk_id",
      10L * graft.operators.LshIndex.AdaptiveMultiplier, 10,
      eWhere = "WHERE vec_id % 2 = 1")

  /** Full persistence round-trip for an ivf library with storage="pq" —
    * the IVFPQ engine shape (RESIDUAL-encoded, classic IVFADC): centroid
    * model + residual codebooks installed BEFORE ingest (codes derived
    * inside the bulk-ingest plan off the just-derived cell and persisted
    * in-row in the shared codes column), both persisted as index
    * metadata, then a reopened `search()` runs the full funnel — nprobe
    * cell prune (with the `< k` exhaustive fallback), per-cell
    * residual-LUT ADC top-R over the stored codes only, exact O(R)
    * euclidean rescore. The oracle replays every stage, including the
    * float32 residual each stored code quantizes. */
  private val ivfPqPersisted: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindIvf,
      deleteDoc7 = false, metric = "euclidean", storage = VectorEngine.StoragePq)
    val eng2 = VectorEngine.open(s, state)
    eng2.search(lib, queryVec(s, dir), k = 10)
  }

  private val ivfPqPersistedSql: String = {
    // the engine defaults the Spark side's `search(lib, qv, k = 10)`
    // resolves for a RESIDUAL-pq (ivf x pq) library — the oracle replays
    // the SAME probe width and short-list depth or the candidate cut
    // diverges
    val nprobe = VectorEngine.DefaultIvfPqNProbe
    val r = VectorEngine.DefaultIvfPqRescore
    val dsub = 8
    val numSub = 8
    val termChain = (1 to dsub)
      .map(i => s"(qs[$i]-cv[$i])*(qs[$i]-cv[$i])").mkString(" + ")
    val approxChain = (1 to numSub).map(m => s"ts[$m]").mkString(" + ")
    s"""WITH c AS (SELECT cid, cv::DOUBLE[] AS cv FROM ${AnnQueries.FixtureSql}),
       |cb AS (SELECT sub, cid, cv::DOUBLE[] AS cv FROM ${AnnQueries.PqResidualFixtureSql}),
       |e AS (SELECT 'c' || vec_id AS chunk_id, embedding::DOUBLE[] AS v FROM embeddings),
       |a0 AS (SELECT e.chunk_id, e.v, c.cid,
       |         row_number() OVER (PARTITION BY e.chunk_id
       |                            ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
       |       FROM e, c),
       |cell AS (SELECT chunk_id, v, cid FROM a0 WHERE rn = 1),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cid FROM c, q
       |          ORDER BY list_distance(qv, cv), cid LIMIT $nprobe),
       |cand AS (SELECT chunk_id, v, cid FROM cell
       |         WHERE cid IN (SELECT cid FROM probe)),
       |base AS (
       |  SELECT chunk_id, v, cid FROM cand WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT chunk_id, v, cid FROM cell WHERE (SELECT count(*) FROM cand) < 10
       |),
       |pr AS (SELECT cand.chunk_id, cand.cid,
       |         list_transform(range(1, 65),
       |           i -> CAST(CAST(cand.v[i] - c.cv[i] AS FLOAT) AS DOUBLE)) AS rv
       |       FROM cand JOIN c ON cand.cid = c.cid),
       |a AS (SELECT pr.chunk_id, pr.cid AS pcid, cb.sub, cb.cv,
       |        row_number() OVER (PARTITION BY pr.chunk_id, cb.sub
       |          ORDER BY list_distance(list_slice(pr.rv, cb.sub*$dsub+1, cb.sub*$dsub+$dsub), cb.cv), cb.cid) AS rn
       |      FROM pr, cb),
       |sel AS (SELECT chunk_id, pcid, sub, cv FROM a WHERE rn = 1),
       |t0 AS (SELECT sel.chunk_id, sel.sub, sel.cv,
       |         list_transform(range(sel.sub*$dsub+1, sel.sub*$dsub+$dsub+1),
       |           i -> q.qv[i] - c.cv[i]) AS qs
       |       FROM sel JOIN c ON sel.pcid = c.cid, q),
       |t AS (SELECT chunk_id, sub, $termChain AS term FROM t0),
       |l AS (SELECT chunk_id, list(term ORDER BY sub) AS ts FROM t GROUP BY chunk_id),
       |d AS (SELECT chunk_id, 0.0 + $approxChain AS approx FROM l),
       |r AS (SELECT chunk_id FROM d ORDER BY approx, chunk_id LIMIT $r),
       |surv AS (
       |  -- the engine's `< k` fallback is the EXACT scan (no ADC cut):
       |  -- every row survives to the exact rescore
       |  SELECT chunk_id FROM r WHERE (SELECT count(*) FROM cand) >= 10
       |  UNION ALL
       |  SELECT chunk_id FROM cell WHERE (SELECT count(*) FROM cand) < 10
       |)
       |SELECT base.chunk_id, round(list_distance(base.v, q.qv), 6) + 0 AS distance
       |FROM base, q WHERE base.chunk_id IN (SELECT chunk_id FROM surv)
       |ORDER BY distance, chunk_id LIMIT 10""".stripMargin
  }

  /** Facade HYBRID search through a REOPENED engine (no reference analog
    * — extension surface): BM25 over the library's chunk texts fused with
    * the library's exact cosine funnel by RRF, with the typed metadata
    * filter applied to BOTH rankers (the P1 contract — term '7' matches
    * chunk c7's text but parity=0 excludes it from the lexical corpus
    * itself, not just the output). The oracle replays the whole
    * composition — allow-set BM25 stats (N, avgLen, df over the FILTERED
    * corpus only), both top-candidates cuts, rank assignment, and the
    * fused rrf — at the facade's default candidates/rrfK. */
  private val HybridTerms = Seq("7", "42")

  private val hybridSearch: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindFlat,
      deleteDoc7 = true)
    val eng2 = VectorEngine.open(s, state)
    eng2.searchHybrid(lib, HybridTerms, queryVec(s, dir), k = 10,
      filters = Map("parity" -> 0))
  }

  private val hybridSearchSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    val (k1, b) = (graft.operators.Lexical.DefaultK1, graft.operators.Lexical.DefaultB)
    val rrfK = graft.operators.Lexical.DefaultRrfK
    val cands = graft.operators.Lexical.DefaultCandidates
    val inList = HybridTerms.map(t => s"'$t'").mkString(", ")
    val pivCols = HybridTerms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = '$t' THEN tf END) AS tf$i"
    }.mkString(", ")
    def idfSql(t: String) =
      s"round(ln((s.n - coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5)" +
        s" / (coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5) + 1.0), 6)"
    val scoreTerms = HybridTerms.zipWithIndex.map { case (t, i) =>
      s"coalesce(${idfSql(t)} * tf$i / (tf$i + $k1 * " +
        s"(1.0 - $b + $b * len / s.avglen)), 0.0)"
    }.mkString(" + ")
    s"""WITH ch AS (SELECT 'c' || vec_id AS chunk_id, 'vec ' || vec_id AS text,
       |                   embedding::DOUBLE[] AS v
       |            FROM embeddings WHERE label <> 7 AND vec_id % 2 = 0),
       |toks AS (SELECT chunk_id, ${TextQueries.tokSql} AS t FROM ch),
       |lens AS (SELECT chunk_id, len(t)::INT AS len FROM toks),
       |s AS (SELECT count(*)::BIGINT::DOUBLE AS n, avg(len) AS avglen FROM lens),
       |terms AS (SELECT chunk_id, unnest(t) AS term FROM toks),
       |tf AS (SELECT chunk_id, term, count(*)::BIGINT AS tf FROM terms
       |       WHERE term IN ($inList) GROUP BY chunk_id, term),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |piv AS (SELECT chunk_id, $pivCols FROM tf GROUP BY chunk_id),
       |bm AS (SELECT l.chunk_id, round($scoreTerms, 6) + 0 AS score
       |       FROM lens l LEFT JOIN piv USING (chunk_id), s),
       |lt AS (SELECT chunk_id, score FROM bm ORDER BY score DESC, chunk_id LIMIT $cands),
       |lr AS (SELECT chunk_id,
       |         row_number() OVER (ORDER BY score DESC, chunk_id) AS lrank FROM lt),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |vt AS (SELECT chunk_id, round($cos, 6) + 0 AS distance FROM ch, q
       |       ORDER BY distance, chunk_id LIMIT $cands),
       |vr AS (SELECT chunk_id,
       |         row_number() OVER (ORDER BY distance, chunk_id) AS vrank FROM vt)
       |SELECT coalesce(lr.chunk_id, vr.chunk_id) AS chunk_id,
       |  round(coalesce(1::DOUBLE / ($rrfK + lrank), 0::DOUBLE)
       |      + coalesce(1::DOUBLE / ($rrfK + vrank), 0::DOUBLE), 6) + 0 AS rrf
       |FROM lr FULL OUTER JOIN vr ON lr.chunk_id = vr.chunk_id
       |ORDER BY rrf DESC, chunk_id LIMIT 10""".stripMargin
  }

  /** BATCH hybrid retrieval through a REOPENED engine: three queries
    * with distinct term sets and query vectors share one BM25 stats
    * pass and one vectorized distance funnel, fused per query. The
    * oracle replays each query's BM25 (document frequencies over the
    * UNION of all six terms — computed once, exactly like the engine),
    * its distance ranking, and its fusion independently, then unions
    * the per-query top-10s — so cross-query contamination (a stats pass
    * leaking one query's terms into another's score, a rank computed
    * over the wrong group) hash-mismatches. */
  private val HybridBatch: Seq[(Long, Seq[String], Long)] = Seq(
    (0L, Seq("7", "42"), 0L),
    (1L, Seq("vec", "100"), 1L),
    (2L, Seq("2", "17", "42"), 2L))

  private val hybridBatchSearch: QueryFn = (s, dir) => {
    val (_, lib, state) = builtState(s, dir, VectorEngine.IndexKindFlat,
      deleteDoc7 = true)
    val eng2 = VectorEngine.open(s, state)
    val vecs = table(s, dir, "embeddings")
      .where(col("vec_id").isin(HybridBatch.map(_._3): _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    eng2.searchHybridBatch(lib,
      HybridBatch.map { case (qid, terms, vid) => (qid, terms, vecs(vid)) },
      k = 10, filters = Map("parity" -> 0))
  }

  private val hybridBatchSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    val (k1, b) = (graft.operators.Lexical.DefaultK1,
      graft.operators.Lexical.DefaultB)
    val rrfK = graft.operators.Lexical.DefaultRrfK
    val cands = graft.operators.Lexical.DefaultCandidates
    val allTerms = HybridBatch.flatMap(_._2).distinct
    val idx = allTerms.zipWithIndex.toMap
    val inList = allTerms.map(t => s"'$t'").mkString(", ")
    val pivCols = allTerms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = '$t' THEN tf END) AS tf$i"
    }.mkString(", ")
    def idfSql(t: String) =
      s"round(ln((s.n - coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5)" +
        s" / (coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5) + 1.0), 6)"
    def scoreTerms(terms: Seq[String]) = terms.map { t =>
      val i = idx(t)
      s"coalesce(${idfSql(t)} * tf$i / (tf$i + $k1 * " +
        s"(1.0 - $b + $b * len / s.avglen)), 0.0)"
    }.mkString(" + ")
    val perQuery = HybridBatch.map { case (qid, terms, vid) =>
      s"""bm$qid AS (SELECT l.chunk_id, round(${scoreTerms(terms)}, 6) + 0 AS score
         |       FROM lens l LEFT JOIN piv USING (chunk_id), s),
         |lt$qid AS (SELECT chunk_id, score FROM bm$qid ORDER BY score DESC, chunk_id LIMIT $cands),
         |lr$qid AS (SELECT chunk_id,
         |         row_number() OVER (ORDER BY score DESC, chunk_id) AS lrank FROM lt$qid),
         |q$qid AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $vid),
         |vt$qid AS (SELECT chunk_id, round($cos, 6) + 0 AS distance FROM ch, q$qid
         |       ORDER BY distance, chunk_id LIMIT $cands),
         |vr$qid AS (SELECT chunk_id,
         |         row_number() OVER (ORDER BY distance, chunk_id) AS vrank FROM vt$qid),
         |f$qid AS (SELECT $qid::BIGINT AS query_id,
         |         coalesce(lr$qid.chunk_id, vr$qid.chunk_id) AS chunk_id,
         |         round(coalesce(1::DOUBLE / ($rrfK + lrank), 0::DOUBLE)
         |             + coalesce(1::DOUBLE / ($rrfK + vrank), 0::DOUBLE), 6) + 0 AS rrf
         |       FROM lr$qid FULL OUTER JOIN vr$qid ON lr$qid.chunk_id = vr$qid.chunk_id
         |       ORDER BY rrf DESC, chunk_id LIMIT 10)""".stripMargin
    }.mkString(",\n")
    val union = HybridBatch.map(q => s"SELECT * FROM f${q._1}")
      .mkString(" UNION ALL ")
    s"""WITH ch AS (SELECT 'c' || vec_id AS chunk_id, 'vec ' || vec_id AS text,
       |                   embedding::DOUBLE[] AS v
       |            FROM embeddings WHERE label <> 7 AND vec_id % 2 = 0),
       |toks AS (SELECT chunk_id, ${TextQueries.tokSql} AS t FROM ch),
       |lens AS (SELECT chunk_id, len(t)::INT AS len FROM toks),
       |s AS (SELECT count(*)::BIGINT::DOUBLE AS n, avg(len) AS avglen FROM lens),
       |terms AS (SELECT chunk_id, unnest(t) AS term FROM toks),
       |tf AS (SELECT chunk_id, term, count(*)::BIGINT AS tf FROM terms
       |       WHERE term IN ($inList) GROUP BY chunk_id, term),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |piv AS (SELECT chunk_id, $pivCols FROM tf GROUP BY chunk_id),
       |$perQuery
       |SELECT * FROM ($union)
       |ORDER BY query_id, rrf DESC, chunk_id""".stripMargin
  }

  /** The batch curation composition at the facade, end-to-end through a
    * MANAGED library: raw documents (minus the eval source) are chunked
    * into overlapping 6-token windows, quality- and repetition-gated,
    * decontaminated against the eval source's 4-grams, embedded by a
    * deterministic per-chunk stage, and ingested through the streaming
    * path's dedup gates. The oracle replays chunking, BOTH gates
    * (quality score arithmetic and the bigram dup fraction), and the
    * decontamination overlap in SQL and predicts the exact surviving
    * chunk rows — so a drifted gate threshold, a mis-derived chunk id,
    * or an over/under-aggressive ingest gate all hash-mismatch. The
    * dedup gates are pass-through BY CONSTRUCTION here (distinct
    * xxhash-derived embeddings at threshold 0) — their cutting behavior
    * is gated by events_dedup_gated / dedup_incremental_embedding. */
  private val CurateMax = 6
  private val CurateOverlap = 2
  private val CurateQualityMin = 0.6
  private val CurateMaxDup = 0.5

  // One curated engine per (session, sf dir) — the builtState
  // convention: the chunk+gate+ingest prologue is a deterministic
  // pipeline job (at sf0.1 it ingests ~65k gated chunks), so it runs
  // ONCE per process and each invocation (and each timed bench pass)
  // reads the resulting library — the serving path. Correctness is
  // unaffected: the oracle predicts the final library contents either
  // way, and the e2e pipeline itself is exercised by the build plus
  // the EngineSpec composition test.
  // Keyed by dir with the owning session alongside the VALUE (not in
  // the key): an engine is session-bound, so a (session, dir) KEY
  // would strongly retain every stopped session's engine for the JVM
  // lifetime — the exact hazard bpeMergeCache's dir-only key avoids.
  // A call from a NEWER session replaces (and so releases) the stale
  // entry instead of accumulating beside it.
  private[graft] val curatedEngines = scala.collection.mutable.HashMap[
    String, (SparkSession, VectorEngine)]()

  /** Shared lookup for the per-dir engine caches: a hit requires the
    * SAME owning session; any miss first EVICTS every entry owned by a
    * different session — an engine is session-bound, so entries of a
    * replaced session (and their ingested state) are unusable and would
    * otherwise accumulate for the process lifetime, across ALL dirs,
    * not just the one being rebuilt. */
  private[graft] def cachedEngine(
      cache: scala.collection.mutable.HashMap[String, (SparkSession, VectorEngine)],
      s: SparkSession, dir: String)(build: => VectorEngine): VectorEngine =
    cache.synchronized {
      cache.get(dir) match {
        case Some((owner, e)) if owner eq s => e
        case _ =>
          cache.filterInPlace { case (_, (owner, _)) => owner eq s }
          val e = build
          cache(dir) = (s, e)
          e
      }
    }

  private val curateIngest: QueryFn = (s, dir) => {
    val eng = cachedEngine(curatedEngines, s, dir)(buildCuratedEngine(s, dir))
    eng.chunksDf.where(col("library_id") === "curlib")
      .select(col("id").as("chunk_id"), col("chunk_index"), col("text"))
      .orderBy(col("chunk_id"))
  }

  private def buildCuratedEngine(s: SparkSession, dir: String): VectorEngine = {
    val docs = table(s, dir, "documents")
    val e = VectorEngine.create(s)
    val lib = e.createLibrary("curated", dim = 4,
      indexKind = VectorEngine.IndexKindLsh, id = Some("curlib"))
    val doc = e.createDocument(lib.id, "crawl-batch")
    e.curateAndIngest(lib.id, doc.id,
      docs.where(col("source") =!= "src0"), col("doc_id"), col("text"),
      embed = df => df.withColumn("embedding", array((1 to 4).map(i =>
        (pmod(xxhash64(col("id"), lit(i)), lit(2001L)).cast("double")
          / 1000.0 - 1.0).cast("float")): _*)),
      benchmark = docs.where(col("source") === "src0"),
      benchText = col("text"),
      maxTokens = CurateMax, overlap = CurateOverlap,
      qualityMin = CurateQualityMin, maxDupNgramFrac = CurateMaxDup,
      n = 4, threshold = 0.0)
    e
  }

  /** The DSIR-gated batch curation at the facade — lifecycle twin of
    * lifecycle_curate_ingest for the data-SELECTION gate: raw documents
    * (minus the eval source) chunk into 6-token windows, every chunk is
    * scored against a PRE-TRAINED DSIR bucket model (raw = the non-eval
    * corpus, target = the 'de' documents — "keep what looks German"),
    * chunks whose rounded logweight falls below 0.0 drop, survivors
    * embed and ingest through the streaming path's dedup gates. The
    * quality/repetition/decontamination gates are pass-through BY
    * CONSTRUCTION (their cutting behavior is lifecycle_curate_ingest's
    * job); the oracle retrains the model, rescores every chunk with the
    * bucket-ordered fold, and predicts the exact surviving chunk rows —
    * a drifted smoothing constant, hash seed, fold order, or gate
    * comparison all hash-mismatch. Batch ≡ streaming parity of the gate
    * itself is pinned by StreamingSpec (ingestDsirGatedBatch is the ONE
    * shared implementation both paths call). */
  private val DsirIngestBuckets = 64

  private[graft] val dsirEngines = scala.collection.mutable.HashMap[
    String, (SparkSession, VectorEngine)]()

  private val dsirIngest: QueryFn = (s, dir) => {
    val eng = cachedEngine(dsirEngines, s, dir)(buildDsirEngine(s, dir))
    eng.chunksDf.where(col("library_id") === "dsirlib")
      .select(col("id").as("chunk_id"), col("chunk_index"), col("text"))
      .orderBy(col("chunk_id"))
  }

  private def buildDsirEngine(s: SparkSession, dir: String): VectorEngine = {
    val docs = table(s, dir, "documents")
    val e = VectorEngine.create(s)
    val lib = e.createLibrary("dsir-curated", dim = 4,
      indexKind = VectorEngine.IndexKindLsh, id = Some("dsirlib"))
    val doc = e.createDocument(lib.id, "dsir-batch")
    val model = graft.operators.ImportanceSampling.bucketModel(
      docs.where(col("source") =!= "src0"),
      docs.where(col("lang") === "de"),
      col("doc_id"), col("text"), DsirIngestBuckets)
    e.curateAndIngest(lib.id, doc.id,
      docs.where(col("source") =!= "src0"), col("doc_id"), col("text"),
      embed = df => df.withColumn("embedding", array((1 to 4).map(i =>
        (pmod(xxhash64(col("id"), lit(i)), lit(2001L)).cast("double")
          / 1000.0 - 1.0).cast("float")): _*)),
      benchmark = docs.where(lit(false)), // decontamination: no-op here
      benchText = col("text"),
      maxTokens = CurateMax, overlap = CurateOverlap,
      qualityMin = 0.0, maxDupNgramFrac = 1.0, // pass-through gates
      n = 4, threshold = 0.0,
      dsirModel = Some(model), dsirBuckets = DsirIngestBuckets,
      dsirMinLogweight = 0.0)
    e
  }

  /** The Bloom-fronted incremental ingest at the facade (r18 verdict
    * task 3): a library ingests batch 1 (doc_id % 3 == 0), opts into
    * the seen-chunk-id Bloom gate with a DELIBERATELY undersized filter
    * (m=128, k=2 — so the fixture forces all three outcomes: true
    * replays confirmed-and-dropped, definite-new rows that never touch
    * the corpus join, and likely false positives the exact confirm
    * rejects), then batch 2 (doc_id % 3 <= 1 — replays + new rows)
    * arrives through the streaming path's gated ingest. The row pins
    * the PRE-INGEST per-id verdicts from the engine's live filter
    * (bit-for-bit — the oracle rebuilds the position set from batch 1's
    * ids with the same seeded md5), plus the n_bloom_definite_new
    * accounting and the ingested count. Capped at doc_id < 100 so the
    * filter's fill factor is sf-independent. */
  private val BloomIngestM = 128
  private val BloomIngestK = 2
  private val BloomIngestCap = 100

  private[graft] val bloomEngines = scala.collection.mutable.HashMap[
    String, (SparkSession, VectorEngine, DataFrame, Long, Long)]()

  private def cachedBloomBuild(s: SparkSession, dir: String)
      : (VectorEngine, DataFrame, Long, Long) = bloomEngines.synchronized {
    bloomEngines.get(dir) match {
      case Some((owner, e, v, a, b)) if owner eq s => (e, v, a, b)
      case _ =>
        bloomEngines.filterInPlace { case (_, (owner, _, _, _, _)) => owner eq s }
        val r = buildBloomEngine(s, dir)
        bloomEngines(dir) = (s, r._1, r._2, r._3, r._4)
        r
    }
  }

  private def buildBloomEngine(s: SparkSession, dir: String)
      : (VectorEngine, DataFrame, Long, Long) = {
    val docs = table(s, dir, "documents")
    val e = VectorEngine.create(s)
    val lib = e.createLibrary("bloom-gated", dim = 4,
      indexKind = VectorEngine.IndexKindLsh, id = Some("bloomlib"))
    val doc = e.createDocument(lib.id, "bloom-batch")
    def chunkFrame(cond: org.apache.spark.sql.Column): DataFrame =
      docs.where(col("doc_id") < BloomIngestCap && cond)
        .select(concat(lit("b-"), col("doc_id")).as("id"),
          lit(doc.id).as("document_id"),
          concat(lit("doc "), col("doc_id")).as("text"),
          array((1 to 4).map(i =>
            (pmod(xxhash64(col("doc_id"), lit(i)), lit(2001L)).cast("double")
              / 1000.0 - 1.0).cast("float")): _*).as("embedding"),
          typedLit(Map.empty[String, String]).as("metadata"),
          col("doc_id").cast("int").as("chunk_index"))
    e.addChunksDf(lib.id, chunkFrame(col("doc_id") % 3 === 0))
    e.enableBloomGateSized(lib.id, BloomIngestM, BloomIngestK)
    val batch2 = chunkFrame(col("doc_id") % 3 <= 1)
    // PRE-INGEST per-id verdicts: bloomGateState returns a defensive
    // COPY of the words (addChunksDf mutates the live array in place
    // below), and the frame pins eagerly, so the captured verdicts are
    // exactly what the gated ingest saw
    val bs = e.bloomGateState(lib.id).get
    val verdicts = graft.operators.BloomFilter.gate(
        batch2.select(col("id")), col("id"),
        e.chunksDf.where(col("library_id") === lib.id).select(col("id")),
        bs.words, bs.m, bs.k)
      .localCheckpoint()
    val report = graft.streaming.StreamingIngest
      .ingestDedupGatedBatchReport(e, lib.id, batch2, threshold = 0.0)
    (e, verdicts, report.n_bloom_definite_new, report.n_ingested)
  }

  private val bloomIngest: QueryFn = (s, dir) => {
    val (_, verdicts, nDefNew, nIngested) = cachedBloomBuild(s, dir)
    verdicts.select(col("id").as("chunk_id"), col("bloom_positive"),
        col("is_seen"))
      .withColumn("n_bloom_definite_new", lit(nDefNew))
      .withColumn("n_ingested", lit(nIngested))
      .orderBy(col("chunk_id"))
  }

  private val bloomIngestSql: String = {
    val m = BloomIngestM
    val posList = (e: String) =>
      (0 until BloomIngestK).map(j =>
        s"${DedupQueries.hashSql(j, e)} % $m").mkString("[", ", ", "]")
    s"""WITH b1 AS (SELECT 'b-' || doc_id::VARCHAR AS id FROM documents
       |            WHERE doc_id < $BloomIngestCap AND doc_id % 3 = 0),
       |b2 AS (SELECT 'b-' || doc_id::VARCHAR AS id, doc_id % 3 = 0 AS seen
       |       FROM documents
       |       WHERE doc_id < $BloomIngestCap AND doc_id % 3 <= 1),
       |bits AS (SELECT list(DISTINCT p) AS ps
       |         FROM (SELECT unnest(${posList("id")}) AS p FROM b1)),
       |v AS (SELECT b2.id,
       |        list_has_all(bits.ps, ${posList("b2.id")}) AS bloom_positive,
       |        b2.seen AS is_seen
       |      FROM b2, bits),
       |agg AS (SELECT
       |          count(*) FILTER (WHERE NOT bloom_positive)::BIGINT AS ndn,
       |          count(*) FILTER (WHERE NOT is_seen)::BIGINT AS ni
       |        FROM v)
       |SELECT v.id AS chunk_id, v.bloom_positive, v.is_seen,
       |  agg.ndn AS n_bloom_definite_new, agg.ni AS n_ingested
       |FROM v, agg ORDER BY chunk_id""".stripMargin
  }

  private val dsirIngestSql: String = {
    val stride = CurateMax - CurateOverlap
    val seed = graft.operators.ImportanceSampling.FeatureHashSeed
    val B = DsirIngestBuckets
    def bigramsOf(t: String) =
      s"""CASE WHEN len($t) >= 2
         |      THEN list_transform(range(1, len($t)), i -> $t[i] || ' ' || $t[i+1])
         |      ELSE []::VARCHAR[] END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, ${TextQueries.splitSqlOf("text")} AS t
       |  FROM documents WHERE source <> 'src0'),
       |shaped AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    (1 + ceil(greatest(0, len(t) - $CurateMax)::DOUBLE / $stride))::INT AS n_chunks
       |  FROM toks),
       |idx AS (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS k FROM shaped),
       |chunks AS (
       |  SELECT doc_id || '-c' || k AS chunk_id, k::INT AS chunk_index,
       |    array_to_string(t[k * $stride + 1 : least(k * $stride + $CurateMax, n)], ' ') AS text
       |  FROM idx),
       |dtok AS (SELECT doc_id, lang, source, ${TextQueries.tokSql} AS t
       |         FROM documents),
       |dfb AS (SELECT lang, source,
       |    ${DedupQueries.hashSql(seed, "gram")} % $B AS bucket
       |  FROM (SELECT lang, source, unnest(t || ${bigramsOf("t")}) AS gram
       |        FROM dtok)),
       |tcnt AS (SELECT bucket, count(*) AS tc FROM dfb WHERE lang = 'de' GROUP BY 1),
       |rcnt AS (SELECT bucket, count(*) AS rc FROM dfb WHERE source <> 'src0' GROUP BY 1),
       |bk AS (SELECT unnest(range($B)) AS bucket),
       |m AS (SELECT bk.bucket, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
       |      FROM bk LEFT JOIN tcnt USING (bucket) LEFT JOIN rcnt USING (bucket)),
       |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM m),
       |lam AS (SELECT bucket,
       |    ln((tc + 1)::DOUBLE / (tt + $B)) - ln((rc + 1)::DOUBLE / (rt + $B)) AS lam
       |  FROM m, tot),
       |ctok AS (SELECT chunk_id, chunk_index, text, ${TextQueries.tokSql} AS tq
       |         FROM chunks),
       |cb AS (SELECT chunk_id,
       |    ${DedupQueries.hashSql(seed, "gram")} % $B AS bucket
       |  FROM (SELECT chunk_id, unnest(tq || ${bigramsOf("tq")}) AS gram
       |        FROM ctok)),
       |db AS (SELECT chunk_id, bucket, count(*) AS cnt FROM cb GROUP BY 1, 2),
       |ctb AS (SELECT db.chunk_id, db.bucket, db.cnt::DOUBLE * lam.lam AS contrib
       |        FROM db JOIN lam USING (bucket)),
       |sc AS (SELECT chunk_id,
       |         round(list_reduce(list_prepend(0.0::DOUBLE,
       |           list(contrib ORDER BY bucket)), (a, b) -> a + b), 6) + 0 AS lw
       |       FROM ctb GROUP BY chunk_id)
       |SELECT c.chunk_id, c.chunk_index, c.text
       |FROM ctok c JOIN sc USING (chunk_id)
       |WHERE sc.lw >= 0.0
       |ORDER BY chunk_id""".stripMargin
  }

  private val curateIngestSql: String = {
    val stride = CurateMax - CurateOverlap
    val gram4 = "tq[i] || ' ' || tq[i+1] || ' ' || tq[i+2] || ' ' || tq[i+3]"
    s"""WITH toks AS (
       |  SELECT doc_id, ${TextQueries.splitSqlOf("text")} AS t
       |  FROM documents WHERE source <> 'src0'),
       |shaped AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    (1 + ceil(greatest(0, len(t) - $CurateMax)::DOUBLE / $stride))::INT AS n_chunks
       |  FROM toks),
       |idx AS (SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS k FROM shaped),
       |chunks AS (
       |  SELECT doc_id || '-c' || k AS chunk_id, k::INT AS chunk_index,
       |    array_to_string(t[k * $stride + 1 : least(k * $stride + $CurateMax, n)], ' ') AS text
       |  FROM idx),
       |ctoks AS (
       |  SELECT chunk_id, chunk_index, text,
       |    ${TextQueries.tokSql} AS tq
       |  FROM chunks),
       |gated AS (
       |  SELECT chunk_id, chunk_index, text, tq FROM ctoks
       |  WHERE ${TextQueries.qualitySqlOf("tq")} >= $CurateQualityMin
       |    AND (len(tq) < 2 OR
       |      round(1.0 - len(list_distinct(list_transform(range(1, len(tq)),
       |            i -> tq[i] || ' ' || tq[i+1])))::DOUBLE / (len(tq) - 1), 6) + 0
       |        <= $CurateMaxDup)),
       |bench AS (
       |  SELECT DISTINCT unnest(list_transform(
       |    list_distinct(CASE WHEN len(tq) >= 4
       |      THEN list_transform(range(1, len(tq) - 2), i -> $gram4)
       |      ELSE []::VARCHAR[] END),
       |    s -> ${DedupQueries.hashSql(0, "s")})) AS h
       |  FROM (SELECT ${TextQueries.tokSql} AS tq
       |        FROM documents WHERE source = 'src0')),
       |cgrams AS (
       |  SELECT chunk_id, unnest(list_transform(
       |    list_distinct(CASE WHEN len(tq) >= 4
       |      THEN list_transform(range(1, len(tq) - 2), i -> $gram4)
       |      ELSE []::VARCHAR[] END),
       |    s -> ${DedupQueries.hashSql(0, "s")})) AS h
       |  FROM gated),
       |contaminated AS (SELECT DISTINCT chunk_id FROM cgrams JOIN bench USING (h))
       |SELECT chunk_id, chunk_index, text
       |FROM gated ANTI JOIN contaminated USING (chunk_id)
       |ORDER BY chunk_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("lifecycle_curate_ingest", curateIngest, Some(curateIngestSql)),
    Q("lifecycle_dsir_ingest", dsirIngest, Some(dsirIngestSql)),
    Q("lifecycle_bloom_ingest", bloomIngest, Some(bloomIngestSql)),
    Q("lifecycle_cascade_counts", cascadeCounts, Some(cascadeCountsSql)),
    Q("lifecycle_hybrid", hybridSearch, Some(hybridSearchSql)),
    Q("lifecycle_hybrid_batch", hybridBatchSearch, Some(hybridBatchSql)),
    Q("lifecycle_search_persisted", searchPersisted, Some(searchPersistedSql)),
    Q("lifecycle_mmr", mmrPersisted, Some(mmrPersistedSql)),
    Q("lifecycle_lsh_persisted", lshPersisted, Some(lshPersistedSql)),
    Q("lifecycle_lsh_retrain", lshRetrained, Some(lshRetrainedSql)),
    Q("lifecycle_ivf_persisted", ivfPersisted, Some(ivfPersistedSql)),
    Q("lifecycle_ivf_retrain", ivfRetrained, Some(ivfRetrainedSql)),
    Q("lifecycle_ivf_sq8_persisted", ivfSq8Persisted("cosine"),
      Some(ivfSq8PersistedSql("cosine"))),
    Q("lifecycle_ivf_sq8_euclidean", ivfSq8Persisted("euclidean"),
      Some(ivfSq8PersistedSql("euclidean"))),
    Q("lifecycle_ivf_pq_persisted", ivfPqPersisted, Some(ivfPqPersistedSql)),
    Q("lifecycle_bq_persisted", bqPersisted, Some(bqPersistedSql)),
    Q("lifecycle_filtered_ivf_sq8", filteredIvfSq8, Some(filteredIvfSq8Sql)),
    Q("lifecycle_filtered_lsh", filteredLshAdaptive, Some(filteredLshAdaptiveSql)),
    Q("lifecycle_batch_search", batchSearch, Some(batchSearchSql)),
  )
}
