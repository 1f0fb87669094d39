package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis._

/** Text-analysis operators over the `documents` table (builder brief;
  * SURVEY.md §2.9): token statistics, global term stats, quality scoring,
  * language ID, and content fingerprinting. The oracle SQL is GENERATED
  * from the same profiles/weights the Column operators use, so the two
  * sides cannot drift apart silently.
  */
object TextQueries {

  /** RE2/DuckDB twin of graft.functions.TextHash.WsClassJava — the
    * pinned explicit whitespace class. Explicit because Java `\s` and
    * RE2 `\s` genuinely differ (\x0B) and neither matches Unicode
    * spaces; the two constants list the SAME code points. */
  private[queries] val wsClassSql =
    """[\t\n\x0B\f\r \x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"""

  /** DuckDB twin of the pinned tokenization contract
    * (TextHash.tokenize): NFC normalize, lowercase (DuckDB's utf8proc
    * simple mappings — the Scala kernel pins per-code-point
    * Character.toLowerCase to them), trim ASCII spaces, split on the
    * explicit whitespace class keeping empty edge fields. */
  private[queries] def tokSqlOf(column: String): String =
    s"string_split_regex(trim(lower(nfc_normalize($column))), '$wsClassSql+')"

  /** Case-PRESERVING tokenization twin (TextChunker): same whitespace
    * class, no case mapping, no NFC (chunker output passes the original
    * text through; normalization never touches whitespace, so token
    * boundaries agree with the analysis tokenizer's). */
  private[queries] def splitSqlOf(column: String): String =
    s"string_split_regex(trim($column), '$wsClassSql+')"

  private[queries] val tokSql = tokSqlOf("text")

  /** Per-document token statistics. */
  private val tokenStats: QueryFn = (s, dir) => {
    val t = tokens(col("text"))
    table(s, dir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_unique"),
      // BPE-ish budget estimate: ~4 chars per subword token, the standard
      // LLM-context heuristic (the real tokenizer is model-specific)
      ceil(length(trim(col("text"))).cast("double") / 4.0).cast("long")
        .as("n_tokens_bpe_est"),
      (round(avgTokenLen(t), 6) + lit(0.0d)).as("avg_token_len"),
      (round(stopwordRatio(t), 6) + lit(0.0d)).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  private val tokenStatsSql: String = {
    val inList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_unique,
       |  ceil(len(trim(text))::DOUBLE / 4.0)::BIGINT AS n_tokens_bpe_est,
       |  round(list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t), 6) + 0 AS avg_token_len,
       |  round(len(list_filter(t, x -> x IN ($inList)))::DOUBLE / len(t), 6) + 0 AS stopword_ratio
       |FROM (SELECT doc_id, text, $tokSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  /** Global term frequencies, top 20 (count desc, term asc — total order).
    * Classic explode -> groupBy: map-side partial aggregation, one shuffle
    * on the term. */
  private val termStats: QueryFn = (s, dir) =>
    table(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)

  private val termStatsSql: String =
    s"""SELECT term, count(*) AS n
       |FROM (SELECT unnest($tokSql) AS term FROM documents)
       |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin

  /** Composite quality score (weights are the operator contract). */
  private val quality: QueryFn = (s, dir) => {
    val t = tokens(col("text"))
    table(s, dir, "documents").select(
      col("doc_id"),
      (round(qualityScore(t), 6) + lit(0.0d)).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of TextAnalysis.qualityScore over a token list named
    * `t` — GENERATED from the same weight constants the Column operator
    * uses, the ONE SQL home for the formula (five gate queries replay
    * it; a hand-copied drift broke parity only on whichever query
    * exercised the stale copy). */
  private[queries] def qualitySqlOf(t: String): String = {
    import graft.operators.TextAnalysis._
    val inList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"($QualityUniqueWeight * (len(list_distinct($t))::DOUBLE / len($t)) + " +
      s"$QualityStopWeight * (1.0 - len(list_filter($t, x -> x IN ($inList)))::DOUBLE / len($t)) + " +
      s"$QualityLenWeight * least(len($t)::DOUBLE / $QualityLenCap, 1.0))"
  }

  private val qualitySql: String =
    s"""SELECT doc_id, round(${qualitySqlOf("t")}, 6) + 0 AS quality
       |FROM (SELECT doc_id, $tokSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Stopword-profile language ID (argmax, profile order breaks ties). */
  private val langId: QueryFn = (s, dir) =>
    table(s, dir, "documents").select(
      col("doc_id"), predictedLang(tokens(col("text"))).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** DuckDB twin of predictedLang over a token list `t` — generated from
    * the SAME LangProfiles the Column operator uses. */
  private[queries] def langCaseSql: String = {
    def score(words: Seq[String]) =
      s"len(list_filter(t, x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"
    val scores = LangProfiles.map { case (lang, words) => lang -> score(words) }
    val whens = scores.zipWithIndex.init.map { case ((lang, sc), i) =>
      val later = scores.drop(i + 1).map(o => s"$sc >= ${o._2}").mkString(" AND ")
      s"WHEN $later THEN '$lang'"
    }.mkString(" ")
    s"CASE $whens ELSE '${LangProfiles.last._1}' END"
  }

  private val langIdSql: String =
    s"""SELECT doc_id,
       |  $langCaseSql AS predicted_lang
       |FROM (SELECT doc_id, $tokSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Deterministic STRATIFIED downsampling — the corpus-rebalance pass of
    * a training-data pipeline (low-quality sources downweighted, curated
    * sources kept): keep a document iff its seeded 60-bit hash falls
    * under its stratum's rate threshold. Hash-thresholding (not
    * `sample()`) so the selection is reproducible run-to-run,
    * engine-to-engine, and partitioning-independent — the properties a
    * curation pipeline needs for audits. Source tier k (k = src-number
    * div 5, four tiers) samples at (k+1)/4: thresholds are pure INTEGER
    * arithmetic ((k+1) * 2^58 vs the 60-bit hash) — no float boundary
    * anywhere. Pure projection + one aggregate; scales as a scan. */
  private val StratSeed = 7

  private val stratifiedSample: QueryFn = (s, dir) => {
    import graft.operators.NearDup
    val tier = expr("cast(substring(source, 4, 10) as int) div 5")
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("u", NearDup.seededHash(StratSeed, col("doc_id").cast("string")))
      .withColumn("threshold", (tier + lit(1)).cast("long") * lit(1L << 58))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u") < col("threshold"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  private val stratifiedSampleSql: String =
    s"""WITH h AS (SELECT doc_id, source,
       |        ('0x' || substr(md5('$StratSeed:' || doc_id), 1, 15))::BIGINT AS u,
       |        ((substr(source, 4)::INT // 5) + 1)::BIGINT * ${1L << 58} AS threshold
       |      FROM documents)
       |SELECT source, count(*) AS n_docs,
       |  sum(CASE WHEN u < threshold THEN 1 ELSE 0 END)::BIGINT AS n_sampled
       |FROM h GROUP BY source ORDER BY source""".stripMargin

  /** MinHash-1 content fingerprint (rolling-hash-style signature). */
  private val fingerprintQ: QueryFn = (s, dir) =>
    table(s, dir, "documents").select(
      col("doc_id"), fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  private val fingerprintSql: String =
    s"""SELECT doc_id,
       |  list_min(list_transform(
       |    list_distinct(CASE WHEN len(t) >= 2
       |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
       |      ELSE []::VARCHAR[] END),
       |    s -> ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT)) AS fingerprint
       |FROM (SELECT doc_id, $tokSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** X6 / W4: document reconstruction through the chunk model — split
    * every text into 5-token chunks with a chunk_index, explode to one
    * row per chunk, then reassemble in chunk_index order (the reference's
    * `chunk_index` contract, entities.py:54-58). The oracle hashes the
    * ORIGINAL text: the reconstruction hash only matches if chunk order
    * is really restored.
    *
    * Reassembly is ONE partial-agg'd shuffle:
    * `array_sort(collect_list(struct(chunk_index, chunk_text)))` orders
    * within each doc after grouping. The ordered-window formulation it
    * replaces carried the FULL parts array on every chunk row
    * (O(chunks x doc_len) materialized bytes) before discarding all but
    * one copy — measurably slower and strictly more shuffle width. */
  private val docReconstruct: QueryFn = (s, dir) => {
    val ChunkTokens = 5
    val t = tokens(col("text"))
    val chunked = table(s, dir, "documents")
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), ceil(size(t) / ChunkTokens.toDouble).cast("int") - 1),
          k => concat_ws(" ", slice(t, k * ChunkTokens + 1, lit(ChunkTokens)))))
        .as(Seq("chunk_index", "chunk_text")))
    chunked
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("chunk_index"), col("chunk_text")))),
          c => c.getField("chunk_text")))).as("reconstructed_hash"))
      .orderBy(col("doc_id"))
  }

  private val docReconstructSql: String =
    s"""SELECT doc_id, ceil(len(t) / 5.0)::BIGINT AS n_chunks,
       |  md5(array_to_string(t, ' ')) AS reconstructed_hash
       |FROM (SELECT doc_id, $tokSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Overlapping token-window chunking — the documents→chunks front
    * half of the reference's chunk model (the inverse of
    * `window_doc_reconstruct`): 6-token windows with a 2-token overlap,
    * one output row per chunk. The oracle replays the window rule
    * (`1 + ceil(max(0, n-max)/stride)` chunks, stride-spaced starts,
    * list-sliced chunk text) in SQL, so an off-by-one in the start
    * arithmetic, a lost trailing chunk, or a wrong overlap all
    * hash-mismatch. Case is PRESERVED (chunks feed an embedder);
    * the pure-projection plan shape is asserted in PlanSpec. */
  private val ChunkMax = 6
  private val ChunkOverlap = 2

  private val chunkOverlap: QueryFn = (s, dir) =>
    graft.operators.TextChunker.chunk(
        table(s, dir, "documents"), col("doc_id"), col("text"),
        maxTokens = ChunkMax, overlap = ChunkOverlap)
      .orderBy(col("id"), col("chunk_index"))

  private val chunkOverlapSql: String = {
    val stride = ChunkMax - ChunkOverlap
    s"""WITH toks AS (
       |  SELECT doc_id, ${splitSqlOf("text")} AS t
       |  FROM documents),
       |shaped AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    (1 + ceil(greatest(0, len(t) - $ChunkMax)::DOUBLE / $stride))::INT AS n_chunks
       |  FROM toks),
       |idx AS (
       |  SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS k FROM shaped)
       |SELECT doc_id AS id, k::INT AS chunk_index,
       |  (k * $stride)::INT AS start_token,
       |  array_to_string(t[k * $stride + 1 : least(k * $stride + $ChunkMax, n)], ' ') AS chunk_text,
       |  least($ChunkMax, n - k * $stride)::INT AS n_tokens
       |FROM idx ORDER BY id, chunk_index""".stripMargin
  }

  /** Sentence-aligned chunking: sentences packed into 40-token budget
    * buckets (a sentence is atomic — it lands where its first token
    * falls), buckets renumbered densely per document. The oracle
    * replays the whole pipeline — the shared lookaround-free sentence
    * regex, the running token count, the bucket floor, the ordered
    * reassembly and the dense renumber — in SQL, so a sentence split
    * across chunks, an off-by-one in the running sum, or a lost
    * over-budget sentence all hash-mismatch. */
  private val SentenceBudget = 40

  private val chunkSentences: QueryFn = (s, dir) =>
    graft.operators.TextChunker.chunkBySentences(
        table(s, dir, "documents"), col("doc_id"), col("text"),
        budgetTokens = SentenceBudget)
      .orderBy(col("id"), col("chunk_index"))

  private val chunkSentencesSql: String = {
    val pat = graft.operators.TextChunker.SentencePattern
    s"""WITH sents AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(regexp_extract_all(text, '$pat')) + 1)) AS i,
       |    unnest(regexp_extract_all(text, '$pat')) AS s
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id, i, s,
       |    len(${splitSqlOf("s")})::BIGINT AS n_toks
       |  FROM sents),
       |bucketed AS (
       |  SELECT *, floor((sum(n_toks) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks)
       |      / $SentenceBudget)::BIGINT AS bucket
       |  FROM counted),
       |chunks AS (
       |  SELECT doc_id, bucket,
       |    string_agg(trim(s), ' ' ORDER BY i) AS chunk_text,
       |    count(*) AS n_sentences, sum(n_toks)::BIGINT AS n_tokens
       |  FROM bucketed GROUP BY doc_id, bucket)
       |SELECT doc_id AS id,
       |  (row_number() OVER (PARTITION BY doc_id ORDER BY bucket) - 1)::INT
       |    AS chunk_index,
       |  chunk_text, n_sentences, n_tokens
       |FROM chunks ORDER BY id, chunk_index""".stripMargin
  }

  /** BM25 lexical retrieval (Robertson/Spärck Jones; the Lucene-style
    * +1-inside-the-log idf) for a fixed 3-term query — retrieval without
    * embeddings, the lexical half of a hybrid-search stack. Shapes:
    * explode→filter(query terms)→ONE (doc,term) groupBy; df is a 3-row
    * driver collect; the per-term scores pivot to fixed columns so the
    * final sum has a DETERMINISTIC add order (float addition does not
    * commute across engines). The only transcendental (ln in idf) is
    * rounded to 6dp on both sides; every other operation is rational
    * arithmetic in the same order, so the oracle hash-matches. */
  private val Bm25Query = Seq("data", "window", "dup")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** (doc_id, score) for every document — the parameterized operator
    * (operators.Lexical.bm25) applied with the gate's fixed query; shared
    * by the top-k query and the hybrid RRF fusion. LexicalSpec exercises
    * the operator with DIFFERENT terms/corpora than this constant. */
  private[queries] def bm25Scores(s: org.apache.spark.sql.SparkSession,
                                  dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.Lexical.bm25(table(s, dir, "documents"),
      "doc_id", "text", Bm25Query, k1 = Bm25K1, b = Bm25B)

  private val bm25: QueryFn = (s, dir) =>
    bm25Scores(s, dir).orderBy(col("score").desc, col("doc_id")).limit(10)

  /** SELECT producing (doc_id, score) for every document — the SQL twin
    * of bm25Scores. */
  private[queries] val bm25ScoresSql: String = {
    val inList = Bm25Query.map(t => s"'$t'").mkString(", ")
    def tfCol(i: Int) = s"tf$i"
    val pivCols = Bm25Query.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN term = '$t' THEN tf END) AS ${tfCol(i)}"
    }.mkString(", ")
    def idfSql(t: String) =
      s"round(ln((s.n - coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5)" +
        s" / (coalesce((SELECT df FROM df WHERE term = '$t'), 0) + 0.5) + 1.0), 6)"
    val scoreTerms = Bm25Query.zipWithIndex.map { case (t, i) =>
      s"coalesce(${idfSql(t)} * ${tfCol(i)} / (${tfCol(i)} + $Bm25K1 * " +
        s"(1.0 - $Bm25B + $Bm25B * len / s.avglen)), 0.0)"
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |lens AS (SELECT doc_id, len(t)::INT AS len FROM toks),
       |s AS (SELECT count(*)::BIGINT::DOUBLE AS n, avg(len) AS avglen FROM lens),
       |terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms
       |       WHERE term IN ($inList) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |piv AS (SELECT doc_id, $pivCols FROM tf GROUP BY doc_id)
       |SELECT l.doc_id, round($scoreTerms, 6) + 0 AS score
       |FROM lens l LEFT JOIN piv USING (doc_id), s""".stripMargin
  }

  private val bm25Sql: String =
    s"""WITH bm AS ($bm25ScoresSql)
       |SELECT doc_id, score FROM bm ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** HYBRID retrieval — reciprocal-rank fusion of the BM25 lexical
    * ranking and the vector cosine ranking over the EMBEDDED subset of
    * the corpus (doc_id == vec_id where an embedding exists; at some
    * scale factors only part of the document table is embedded, and
    * fusing rankers over different collections silently degrades to
    * single-ranker scoring — both sides therefore restrict to documents
    * that have a vector): rrf = 1/(60+lex_rank) + 1/(60+vec_rank), the
    * standard fusion for hybrid search stacks. Scale shape: each ranker
    * contributes only its top-50 via TakeOrderedAndProject (no global
    * window over the corpus); ranks are assigned within the tiny
    * candidate sets, and fusion is a 50x50 full-outer join. RRF is pure
    * integer-rank arithmetic — no cross-engine float risk beyond the
    * final rounded division sum, whose add order is fixed. */
  private val RrfK = 60
  private val RrfCandidates = 50

  private val hybridRrf: QueryFn = (s, dir) => {
    val emb = table(s, dir, "embeddings")
    // both rankers restricted to the embedded subset (see scaladoc above)
    val lexScores = bm25Scores(s, dir)
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val qv = emb.where(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0)
    val vecScores = emb
      .withColumn("distance",
        round(graft.functions.VectorExpressions.cosineDistance(col("embedding"),
          array(qv.map(x => lit(x)): _*).cast("array<float>")), 6) + lit(0.0d))
      .select(col("vec_id").as("doc_id"), col("distance"))
    graft.operators.Lexical.hybridRrf(lexScores, vecScores, "doc_id",
      k = 10, candidates = RrfCandidates, rrfK = RrfK)
  }

  private val hybridRrfSql: String = {
    val cos = VectorSearchQueries.distSql("cosine", "v", "qv")
    s"""WITH bm AS ($bm25ScoresSql),
       |lt AS (SELECT doc_id, score FROM bm
       |       WHERE doc_id IN (SELECT vec_id FROM embeddings)
       |       ORDER BY score DESC, doc_id LIMIT $RrfCandidates),
       |lr AS (SELECT doc_id,
       |         row_number() OVER (ORDER BY score DESC, doc_id) AS lrank FROM lt),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |vt AS (SELECT vec_id, round($cos, 6) + 0 AS distance FROM e, q
       |       ORDER BY distance, vec_id LIMIT $RrfCandidates),
       |vr AS (SELECT vec_id AS doc_id,
       |         row_number() OVER (ORDER BY distance, vec_id) AS vrank FROM vt)
       |SELECT coalesce(lr.doc_id, vr.doc_id) AS doc_id,
       |  round(coalesce(1::DOUBLE / ($RrfK + lrank), 0::DOUBLE)
       |      + coalesce(1::DOUBLE / ($RrfK + vrank), 0::DOUBLE), 6) + 0 AS rrf
       |FROM lr FULL OUTER JOIN vr ON lr.doc_id = vr.doc_id
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }

  /** Gopher-style repetition signals over word bigrams: dominant-bigram
    * fraction and duplicate-bigram fraction per document (the boilerplate
    * / degenerate-text filters). The oracle replays the full
    * explode-count-rollup in SQL. */
  private val repetition: QueryFn = (s, dir) =>
    graft.operators.TrainingData.repetitionStats(
        table(s, dir, "documents"), col("doc_id"), col("text"), n = 2)
      .select(col("id").as("doc_id"), col("top_ngram_frac"),
        col("dup_ngram_frac"))
      .orderBy(col("doc_id"))

  private val repetitionSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
       |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
       |      ELSE []::VARCHAR[] END) AS gram
       |  FROM (SELECT doc_id, $tokSql AS t FROM documents)),
       |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
       |SELECT doc_id,
       |  round(max(cnt)::DOUBLE / sum(cnt)::DOUBLE, 6) + 0 AS top_ngram_frac,
       |  round(1.0 - count(*)::DOUBLE / sum(cnt)::DOUBLE, 6) + 0 AS dup_ngram_frac
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Corpus-trained unigram-LM quality score at a 20-term vocabulary cap
    * (the full vocab is 31, so the OOV floor path is genuinely
    * exercised). The oracle retrains the same model and replays the
    * SAME deterministic term-sorted left fold — an unordered SUM would
    * drift in the last ULP. */
  private val lmQuality: QueryFn = (s, dir) =>
    graft.operators.TrainingData.unigramLogProbs(
        table(s, dir, "documents"), col("doc_id"), col("text"), vocabCap = 20)
      .select(col("id").as("doc_id"), col("n_tokens"), col("avg_logprob"))
      .orderBy(col("doc_id"))

  private val lmQualitySql: String =
    s"""WITH tok AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
       |tc AS (SELECT term, count(*)::DOUBLE AS c FROM tok GROUP BY 1),
       |tot AS (SELECT sum(c)::DOUBLE AS total FROM tc),
       |vocab AS (SELECT term, ln(c / (SELECT total FROM tot)) AS lp
       |          FROM tc ORDER BY c DESC, term LIMIT 20),
       |dt AS (SELECT doc_id, term, count(*)::DOUBLE AS cnt
       |       FROM tok GROUP BY 1, 2),
       |ctb AS (SELECT d.doc_id, d.term, d.cnt,
       |         d.cnt * coalesce(v.lp, (SELECT ln(1.0 / total) FROM tot))
       |           AS contrib
       |       FROM dt d LEFT JOIN vocab v USING (term)),
       |agg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
       |         list_reduce(list_prepend(0.0::DOUBLE,
       |           list(contrib ORDER BY term)), (a, b) -> a + b) AS s
       |       FROM ctb GROUP BY 1)
       |SELECT doc_id, n_tokens, round(s / n_tokens, 6) + 0 AS avg_logprob
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Interpolated bigram LM quality (the CCNet-style rung above
    * text_lm_quality) at a 20-term unigram vocab and a 500-bigram table
    * — both caps bind at sf0.01, so the OOV floor, the out-of-model
    * bigram backoff, AND the in-model path are all genuinely exercised.
    * The oracle retrains both models in SQL (including the
    * deterministic (count desc, prev, cur) cap cut), replays the
    * interpolation with the PRINTED lambda / 1-lambda doubles, and the
    * same (prev, cur)-sorted fold with the first-token unigram term
    * added last. */
  private val BgVocabCap = 20
  private val BgBigramCap = 500
  private val BgLambda = 0.9

  private val lmBigram: QueryFn = (s, dir) =>
    graft.operators.TrainingData.bigramLogProbs(
        table(s, dir, "documents"), col("doc_id"), col("text"),
        vocabCap = BgVocabCap, bigramCap = BgBigramCap, lambda = BgLambda)
      .select(col("id").as("doc_id"), col("n_tokens"), col("avg_logprob"))
      .orderBy(col("doc_id"))

  /** Shared CTE chain retraining the interpolated bigram model in SQL
    * over relation `src` (any FROM-able expression with doc_id + text),
    * ending in `scored(doc_id, n_tokens, avg_logprob)` — consumed by
    * text_lm_bigram, replayed verbatim by pipeline_ccnet_buckets, and
    * re-instantiated over the ccnet fixture (and its paragraph-deduped
    * form) by the per-language rows. */
  private[queries] def lmBigramChainSqlOf(src: String, vocabCap: Int,
                                          bigramCap: Int,
                                          lambda: Double): String = {
    val lam = lambda.toString
    val mu = (1.0d - lambda).toString
    s"""tok AS (SELECT doc_id, $tokSql AS t FROM $src),
       |u AS (SELECT doc_id, unnest(t) AS term FROM tok),
       |tc AS (SELECT term, count(*)::DOUBLE AS c FROM u GROUP BY 1),
       |tot AS (SELECT sum(c)::DOUBLE AS total FROM tc),
       |vocab AS (SELECT term, c / (SELECT total FROM tot) AS pug
       |          FROM tc ORDER BY c DESC, term LIMIT $vocabCap),
       |pr AS (SELECT doc_id, t[i] AS prev, t[i+1] AS cur
       |       FROM tok, unnest(range(1, len(t))) AS r(i)),
       |bc AS (SELECT prev, cur, count(*)::DOUBLE AS cbg FROM pr GROUP BY 1, 2),
       |cx AS (SELECT prev, count(*)::DOUBLE AS cctx FROM pr GROUP BY 1),
       |bm AS (SELECT b.prev, b.cur, b.cbg / cx.cctx AS pbg
       |       FROM (SELECT * FROM bc ORDER BY cbg DESC, prev, cur
       |             LIMIT $bigramCap) b JOIN cx USING (prev)),
       |dp AS (SELECT doc_id, prev, cur, count(*)::DOUBLE AS cnt
       |       FROM pr GROUP BY 1, 2, 3),
       |ctb AS (SELECT dp.doc_id, dp.prev, dp.cur,
       |         dp.cnt * ln($lam * coalesce(bm.pbg, 0.0) +
       |           $mu * coalesce(v.pug, (SELECT 1.0 / total FROM tot)))
       |           AS contrib
       |        FROM dp LEFT JOIN bm USING (prev, cur)
       |             LEFT JOIN vocab v ON v.term = dp.cur),
       |agg AS (SELECT doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE,
       |           list(contrib ORDER BY prev, cur)), (a, b) -> a + b) AS s
       |        FROM ctb GROUP BY 1),
       |fst AS (SELECT tok.doc_id, len(t)::BIGINT AS n_tokens,
       |         ln(coalesce(v.pug, (SELECT 1.0 / total FROM tot))) AS lp1
       |        FROM tok LEFT JOIN vocab v ON v.term = t[1]),
       |scored AS (
       |  SELECT f.doc_id, f.n_tokens,
       |    round((f.lp1 + coalesce(a.s, 0.0)) / f.n_tokens, 6) + 0
       |      AS avg_logprob
       |  FROM fst f LEFT JOIN agg a USING (doc_id))""".stripMargin
  }

  private val lmBigramChainSql: String =
    lmBigramChainSqlOf("documents", BgVocabCap, BgBigramCap, BgLambda)

  private val lmBigramSql: String =
    s"""WITH $lmBigramChainSql
       |SELECT doc_id, n_tokens, avg_logprob FROM scored
       |ORDER BY doc_id""".stripMargin

  /** Gopher rule panel (Rae et al. 2021, Table A1): all seven document
    * filters recomputed in SQL from the SAME constants — tokenizer,
    * line trim, replace-arithmetic symbol counts, regex letter/bullet/
    * ellipsis classes, the stopword set, and the rounded-ratio
    * comparisons behind the composite pass flag. */
  private val gopherRules: QueryFn = (s, dir) =>
    graft.operators.TextAnalysis.gopherQualityFlags(
        table(s, dir, "documents"), col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("bullet_line_frac"),
        col("ellipsis_line_frac"), col("alpha_word_frac"),
        col("n_stopwords"), col("passes"))
      .orderBy(col("doc_id"))

  private val gopherRulesSql: String = {
    import graft.operators.TextAnalysis._
    val stop = GopherStopwords.map(w => s"'$w'").mkString(", ")
    def occ(needle: String, nLen: Int) =
      s"(len(text) - len(replace(text, '$needle', ''))) // $nLen"
    s"""WITH m AS (
       |  SELECT doc_id,
       |    len(t)::BIGINT AS n_words,
       |    round(list_reduce(list_prepend(0, list_transform(t, w -> len(w))),
       |          (a, b) -> a + b)::DOUBLE / len(t), 6) + 0 AS mean_word_len,
       |    round((${occ("#", 1)} + ${occ("…", 1)} + ${occ("...", 3)})::DOUBLE
       |          / len(t), 6) + 0 AS symbol_ratio,
       |    round(len(list_filter(ls, l -> regexp_matches(
       |            regexp_replace(l, '^$wsClassSql+|$wsClassSql+$$', '', 'g'),
       |            '^[•*-]')))::DOUBLE / len(ls), 6) + 0 AS bullet_line_frac,
       |    round(len(list_filter(ls, l -> regexp_matches(
       |            regexp_replace(l, '^$wsClassSql+|$wsClassSql+$$', '', 'g'),
       |            '(\\.\\.\\.|…)$$')))::DOUBLE / len(ls), 6) + 0
       |      AS ellipsis_line_frac,
       |    round(len(list_filter(t, w -> regexp_matches(w, '\\p{L}')))::DOUBLE
       |          / len(t), 6) + 0 AS alpha_word_frac,
       |    len(list_intersect(list_distinct(t), [$stop]))::BIGINT AS n_stopwords
       |  FROM (SELECT doc_id, text, $tokSql AS t,
       |          string_split(text, chr(10)) AS ls
       |        FROM documents))
       |SELECT *,
       |  (CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |         AND mean_word_len BETWEEN $GopherMinMeanWordLen
       |                               AND $GopherMaxMeanWordLen
       |         AND symbol_ratio <= $GopherMaxSymbolRatio
       |         AND bullet_line_frac <= $GopherMaxBulletLineFrac
       |         AND ellipsis_line_frac <= $GopherMaxEllipsisLineFrac
       |         AND alpha_word_frac >= $GopherMinAlphaWordFrac
       |         AND n_stopwords >= $GopherMinStopwords
       |        THEN 1 ELSE 0 END)::BIGINT AS passes
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** CCNet head/middle/tail perplexity terciles over the bigram-LM
    * scores, thresholds from the md5-deterministic capped sample (the
    * cap of 200 genuinely binds at sf0.01's 500 documents, so the
    * sample CUT — not just the bucketing — is gated). The oracle
    * replays the whole LM chain, the sample order-and-limit, the
    * rank-based tercile thresholds, and the CASE. */
  private val CcnetSampleCap = 200

  private val ccnetBuckets: QueryFn = (s, dir) =>
    graft.operators.TrainingData.perplexityBuckets(
        table(s, dir, "documents"), col("doc_id"), col("text"),
        vocabCap = BgVocabCap, bigramCap = BgBigramCap, lambda = BgLambda,
        sampleCap = CcnetSampleCap)
      .select(col("id").as("doc_id"), col("n_tokens"), col("avg_logprob"),
        col("ppl_bucket"))
      .orderBy(col("doc_id"))

  private val ccnetBucketsSql: String =
    s"""WITH $lmBigramChainSql,
       |samp AS (
       |  SELECT doc_id, avg_logprob FROM scored
       |  ORDER BY ('0x' || substr(md5('ppl:' || doc_id::VARCHAR), 1, 8))::BIGINT
       |             % 1000000, doc_id
       |  LIMIT $CcnetSampleCap),
       |ranked AS (
       |  SELECT avg_logprob AS sc,
       |    row_number() OVER (ORDER BY avg_logprob, doc_id) AS rn,
       |    count(*) OVER () AS m
       |  FROM samp),
       |thr AS (
       |  SELECT max(CASE WHEN rn = floor((m + 2) / 3)::BIGINT THEN sc END) AS t1,
       |         max(CASE WHEN rn = floor((2 * m + 2) / 3)::BIGINT THEN sc END) AS t2
       |  FROM ranked)
       |SELECT doc_id, n_tokens, avg_logprob,
       |  CASE WHEN avg_logprob <= t1 THEN 'tail'
       |       WHEN avg_logprob <= t2 THEN 'middle'
       |       ELSE 'head' END AS ppl_bucket
       |FROM scored, thr
       |ORDER BY doc_id""".stripMargin

  // ---------------- CCNet pipeline over the multilingual fixture ------
  // (tools/make_ccnet.py: 92 paragraph-structured docs over three
  // stopword-identified languages with per-language score strata — the
  // sf documents are single-line and predict ONE language, so over them
  // the per-language cut degenerates to the global one and the
  // paragraph splitter never fires)

  private[queries] val CcnetFixture =
    s"${AnnQueries.FixturesDir}/ccnet_docs.parquet"
  private val CcnetFixtureSql = s"read_parquet('$CcnetFixture')"
  private val CLVocabCap = 150
  private val CLBigramCap = 300
  private val CLLambda = 0.8
  private val CLSampleCapPerLang = 20

  /** Full script-then-stopword language CASE over columns `text` and
    * `t` — the text_langid_script decision chain as a reusable
    * fragment, generated from the SAME ScriptRanges + LangProfiles. */
  private[queries] def langScriptCaseSql: String = {
    val whens = ScriptRanges.map { case (code, cls) =>
      s"WHEN len(regexp_extract_all(text, '$cls')) > 0 THEN '$code'"
    }.mkString(" ")
    s"CASE $whens ELSE $langCaseSql END"
  }

  /** Shared per-language tercile tail: `scoredl(doc_id, lang, n_tokens,
    * avg_logprob)` -> per-language md5 sample (cap applies to EACH
    * language), per-language rank thresholds, CASE per (lang, score). */
  private def perLangBucketSql(cap: Int): String =
    s"""samp AS (
       |  SELECT lang, doc_id, avg_logprob,
       |    row_number() OVER (PARTITION BY lang ORDER BY
       |      ('0x' || substr(md5('ppl:' || doc_id::VARCHAR), 1, 8))::BIGINT
       |        % 1000000, doc_id) AS sr
       |  FROM scoredl),
       |ranked AS (
       |  SELECT lang, avg_logprob AS sc,
       |    row_number() OVER (PARTITION BY lang ORDER BY avg_logprob, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS m
       |  FROM samp WHERE sr <= $cap),
       |thr AS (
       |  SELECT lang,
       |    max(CASE WHEN rn = floor((m + 2) / 3)::BIGINT THEN sc END) AS t1,
       |    max(CASE WHEN rn = floor((2 * m + 2) / 3)::BIGINT THEN sc END) AS t2
       |  FROM ranked GROUP BY lang)""".stripMargin

  /** Paragraph-level corpus dedup (CCNet §4.2) over the fixture: the
    * \\n{2,} split contract, trim-normalized paragraph identity, the
    * distinct-doc frequency cut, in-order reassembly with the canonical
    * separator — all replayed in SQL (clean_md5 gates the bytes). */
  private val removeParagraphs: QueryFn = (s, _) =>
    graft.operators.TrainingData.removeCommonParagraphs(
        s.read.parquet(CcnetFixture), col("doc_id"), col("text"),
        minDocFreq = 2)
      .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  /** CTE chain of the paragraph dedup, ending in `clean(doc_id, n_kept,
    * n_removed, clean_text)` — consumed by pipeline_remove_paragraphs
    * and composed into the e2e row. */
  private val paragraphChainSql: String = {
    val hashT = DedupQueries.hashSql(0, "t")
    s"""d AS (
       |  -- DuckDB string_split_regex('') = [] where the Spark split keeps
       |  -- ['']: pinned to the Spark side (the c4CleanSql rule — an empty
       |  -- doc has ONE empty paragraph, exempt from the frequency cut)
       |  SELECT doc_id,
       |    CASE WHEN text = '' THEN ['']::VARCHAR[]
       |         ELSE string_split_regex(text, '\\n{2,}') END AS gs
       |  FROM $CcnetFixtureSql),
       |occ AS (
       |  SELECT doc_id, p, para,
       |    CASE WHEN t = '' THEN NULL ELSE $hashT END AS h
       |  FROM (SELECT doc_id, i - 1 AS p, para,
       |          regexp_replace(para, '^$wsClassSql+|$wsClassSql+$$', '', 'g') AS t
       |        FROM (SELECT doc_id, gs[i] AS para, i
       |              FROM d, unnest(range(1, len(gs) + 1)) AS u(i)))),
       |common AS (
       |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM occ WHERE h IS NOT NULL)
       |  GROUP BY h HAVING count(*) >= 2),
       |kept AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(para, chr(10) || chr(10) ORDER BY p) AS clean_text
       |  FROM occ ANTI JOIN common USING (h) GROUP BY doc_id),
       |clean AS (
       |  SELECT d.doc_id, coalesce(kept.n_kept, 0)::BIGINT AS n_kept,
       |    (len(d.gs) - coalesce(kept.n_kept, 0))::BIGINT AS n_removed,
       |    coalesce(kept.clean_text, '') AS clean_text
       |  FROM d LEFT JOIN kept USING (doc_id))""".stripMargin
  }

  private val removeParagraphsSql: String =
    s"""WITH $paragraphChainSql
       |SELECT doc_id, n_kept, n_removed, md5(clean_text) AS clean_md5
       |FROM clean ORDER BY doc_id""".stripMargin

  /** PER-LANGUAGE CCNet bucketing (Wenzek et al. 2020 §4.3's faithful
    * form) over the RAW fixture: language from the script-then-stopword
    * chain, tercile thresholds cut per language from per-language
    * capped samples (the cap of 20 binds — each language has 30 docs).
    * The oracle replays langid, the LM retrain, the per-language
    * sample ranks, the per-language thresholds, and the CASE.
    * TrainingDataSpec pins that these buckets genuinely DISAGREE with
    * the corpus-global cut on this fixture (the paper's point: global
    * cuts shunt low-resource languages into 'tail' wholesale). */
  private val ccnetBucketsLang: QueryFn = (s, _) => {
    val t = col("text")
    graft.operators.TrainingData.perplexityBucketsByLang(
        s.read.parquet(CcnetFixture), col("doc_id"), t,
        predictedLangScript(t, tokens(t)),
        vocabCap = CLVocabCap, bigramCap = CLBigramCap, lambda = CLLambda,
        sampleCapPerLang = CLSampleCapPerLang)
      .select(col("id").as("doc_id"), col("lang"), col("n_tokens"),
        col("avg_logprob"), col("ppl_bucket"))
      .orderBy(col("doc_id"))
  }

  private val ccnetBucketsLangSql: String =
    s"""WITH ${lmBigramChainSqlOf(CcnetFixtureSql, CLVocabCap, CLBigramCap,
          CLLambda)},
       |dl AS (SELECT doc_id, $langScriptCaseSql AS lang
       |       FROM (SELECT doc_id, text, $tokSql AS t FROM $CcnetFixtureSql)),
       |scoredl AS (SELECT s.doc_id, dl.lang, s.n_tokens, s.avg_logprob
       |            FROM scored s JOIN dl USING (doc_id)),
       |${perLangBucketSql(CLSampleCapPerLang)}
       |SELECT s.doc_id, s.lang, s.n_tokens, s.avg_logprob,
       |  CASE WHEN s.avg_logprob <= t.t1 THEN 'tail'
       |       WHEN s.avg_logprob <= t.t2 THEN 'middle'
       |       ELSE 'head' END AS ppl_bucket
       |FROM scoredl s JOIN thr t USING (lang)
       |ORDER BY doc_id""".stripMargin

  /** The CCNet pipeline END-TO-END (dedup -> langid -> per-language
    * perplexity buckets, §4.2 then §4.3): paragraph dedup feeds the LM
    * — boilerplate paragraphs must stop contributing corpus-typical
    * mass BEFORE scoring — and language is identified on the CLEANED
    * text. The oracle composes the full paragraph chain with the LM
    * chain re-instantiated over the cleaned relation. */
  private val ccnetE2e: QueryFn = (s, _) =>
    graft.operators.TrainingData.ccnetPipeline(
        s.read.parquet(CcnetFixture), col("doc_id"), col("text"),
        minDocFreq = 2,
        vocabCap = CLVocabCap, bigramCap = CLBigramCap, lambda = CLLambda,
        sampleCapPerLang = CLSampleCapPerLang)
      .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
        col("lang"), col("n_tokens"), col("avg_logprob"), col("ppl_bucket"))
      .orderBy(col("doc_id"))

  private val ccnetE2eSql: String = {
    val cleanSrc = "(SELECT doc_id, clean_text AS text FROM clean)"
    s"""WITH $paragraphChainSql,
       |${lmBigramChainSqlOf(cleanSrc, CLVocabCap, CLBigramCap, CLLambda)},
       |dl AS (SELECT doc_id, $langScriptCaseSql AS lang
       |       FROM (SELECT doc_id, text, $tokSql AS t FROM $cleanSrc)),
       |scoredl AS (SELECT s.doc_id, dl.lang, s.n_tokens, s.avg_logprob
       |            FROM scored s JOIN dl USING (doc_id)),
       |${perLangBucketSql(CLSampleCapPerLang)}
       |SELECT s.doc_id, c.n_kept, c.n_removed, s.lang, s.n_tokens,
       |  s.avg_logprob,
       |  CASE WHEN s.avg_logprob <= t.t1 THEN 'tail'
       |       WHEN s.avg_logprob <= t.t2 THEN 'middle'
       |       ELSE 'head' END AS ppl_bucket
       |FROM scoredl s JOIN thr t USING (lang) JOIN clean c USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** The Gopher REPETITION panel (Rae et al. 2021 Table A1's other
    * half): thirteen within-document repetition filters — duplicate
    * line/paragraph fractions (occurrence + character basis), top
    * 2/3/4-gram character fractions, duplicated 5..10-gram coverage
    * fractions — recomputed in SQL from the SAME thresholds, tokenizer,
    * trim class, integer tie-break packing, and trailing-ROWS coverage
    * windows. The sf corpus genuinely exercises the gram metrics (word
    * soup repeats heavily); the line/paragraph and planted-coverage
    * edges are pinned by TrainingDataSpec on crafted docs. */
  private val gopherRepetition: QueryFn = (s, dir) =>
    graft.operators.TrainingData.gopherRepetitionStats(
        table(s, dir, "documents"), col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val gopherRepetitionSql: String = {
    import graft.operators.TrainingData._
    val ws = wsClassSql
    def gramsOf(n: Int): String = {
      val parts = (0 until n).map(k => s"t[i + $k]").mkString(" || ' ' || ")
      s"CASE WHEN len(t) >= $n THEN list_transform(range(1, len(t) - ${n - 2}), i -> $parts) ELSE []::VARCHAR[] END"
    }
    def unitsOf(splitExpr: String): String =
      s"list_filter(list_transform($splitExpr, u -> regexp_replace(u, '^$ws+|$ws+$$', '', 'g')), u -> u <> '')"
    def unitFracs(col: String, tag: String): String =
      s"""CASE WHEN len($col) = 0 THEN 0.0::DOUBLE
         |    ELSE round((len($col) - len(list_distinct($col)))::DOUBLE / len($col), 6) + 0 END AS dup_${tag}_frac,
         |  CASE WHEN coalesce(list_sum(list_transform($col, x -> len(x))), 0) = 0 THEN 0.0::DOUBLE
         |    ELSE round((list_sum(list_transform($col, x -> len(x))) -
         |        list_sum(list_transform(list_distinct($col), x -> len(x))))::DOUBLE
         |      / list_sum(list_transform($col, x -> len(x))), 6) + 0 END AS dup_${tag}_char_frac""".stripMargin
    val topNs = GopherMaxTopGramCharFrac.map(_._1)
    val dupNs = GopherMaxDupGramCharFrac.map(_._1)
    val topUnion = topNs.map(n =>
      s"SELECT doc_id, $n AS n, unnest(${gramsOf(n)}) AS gram FROM d")
      .mkString("\n       UNION ALL ")
    val pgUnion = dupNs.map(n =>
      s"""SELECT doc_id, $n AS n, i - 1 AS p, g[i] AS gram
         |     FROM (SELECT doc_id, ${gramsOf(n)} AS g FROM d),
         |          unnest(range(1, len(g) + 1)) AS u(i)""".stripMargin)
      .mkString("\n       UNION ALL ")
    val flagCols = dupNs.map(n =>
      s"max(CASE WHEN n = $n THEN 1 ELSE 0 END) AS s$n").mkString(", ")
    val covWindows = dupNs.map(n =>
      s"max(coalesce(s$n, 0)) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS c$n")
      .mkString(",\n         ")
    val covSums = dupNs.map(n =>
      s"sum(l * c$n)::DOUBLE AS cov$n").mkString(", ")
    val topPivot = topNs.map(n =>
      s"max(CASE WHEN n = $n THEN (m // 1000000) * (m % 1000000) END) AS top$n")
      .mkString(", ")
    def frac(num: String, name: String): String =
      s"CASE WHEN b.chars = 0 THEN 0.0::DOUBLE ELSE round(coalesce($num, 0)::DOUBLE / b.chars, 6) + 0 END AS $name"
    val fracCols =
      (topNs.map(n => frac(s"tp.top$n", s"top_${n}gram_char_frac")) ++
        dupNs.map(n => frac(s"cv.cov$n", s"dup_${n}gram_char_frac")))
        .mkString(",\n  ")
    val passTerms =
      (Seq(s"dup_line_frac <= $GopherMaxDupLineFrac",
        s"dup_line_char_frac <= $GopherMaxDupLineCharFrac",
        s"dup_para_frac <= $GopherMaxDupParaFrac",
        s"dup_para_char_frac <= $GopherMaxDupParaCharFrac") ++
        GopherMaxTopGramCharFrac.map { case (n, t) =>
          s"top_${n}gram_char_frac <= $t" } ++
        GopherMaxDupGramCharFrac.map { case (n, t) =>
          s"dup_${n}gram_char_frac <= $t" }).mkString(" AND ")
    s"""WITH d AS (SELECT doc_id, text, $tokSql AS t FROM documents),
       |b AS (SELECT doc_id,
       |    coalesce(list_sum(list_transform(t, x -> len(x))), 0)::DOUBLE AS chars,
       |  ${unitFracs(s"${unitsOf("string_split(text, chr(10))")}", "line")},
       |  ${unitFracs(s"${unitsOf("string_split_regex(text, '\\n{2,}')")}", "para")}
       |  FROM d),
       |tg AS ($topUnion),
       |tc AS (SELECT doc_id, n, gram, count(*) AS cnt FROM tg GROUP BY 1, 2, 3),
       |tm AS (SELECT doc_id, n,
       |         -- chars clamped to Pack-1, mirroring the Scala twin: a
       |         -- >= 1M-char gram must not overflow into the count field
       |         max(cnt * 1000000 + least(len(gram) - (n - 1), 999999)) AS m
       |       FROM tc GROUP BY 1, 2),
       |tp AS (SELECT doc_id, $topPivot FROM tm GROUP BY 1),
       |pg AS ($pgUnion),
       |dup AS (SELECT doc_id, n, p FROM (
       |         SELECT doc_id, n, p,
       |           count(*) OVER (PARTITION BY doc_id, n, gram) AS c
       |         FROM pg) WHERE c >= 2),
       |fl AS (SELECT doc_id, p, $flagCols FROM dup GROUP BY 1, 2),
       |pt AS (SELECT doc_id, i - 1 AS p, len(t[i]) AS l
       |       FROM d, unnest(range(1, len(t) + 1)) AS u(i)),
       |cw AS (SELECT pt.doc_id, pt.p, pt.l,
       |         $covWindows
       |       FROM pt LEFT JOIN fl USING (doc_id, p)),
       |cv AS (SELECT doc_id, $covSums FROM cw GROUP BY 1),
       |o AS (SELECT b.doc_id, b.dup_line_frac, b.dup_line_char_frac,
       |  b.dup_para_frac, b.dup_para_char_frac,
       |  $fracCols
       |FROM b LEFT JOIN tp USING (doc_id) LEFT JOIN cv USING (doc_id))
       |SELECT *, ($passTerms)::BIGINT AS passes
       |FROM o ORDER BY doc_id""".stripMargin
  }

  /** The C4 cleaning heuristics (Raffel et al. 2020 §2.2) over a
    * crafted fixture defined ONCE here and embedded identically in both
    * engines (the sf documents are single-line word soup with no
    * terminal punctuation — every line would drop and the gate would
    * verify nothing): each rule gets a document built to trip exactly
    * it, plus a clean page that passes all of them. */
  private val C4Fixture: Seq[(Long, String)] = Seq(
    (1L, "The first sentence is here. Another good line follows it!\n" +
      "Does a question also count? It certainly does here.\n" +
      "A fifth sentence closes the clean page."),      // passes everything
    (2L, "no terminal punctuation on this line\n" +
      "this one neither\nBut this one has an ending."), // 2 lines drop
    (3L, "Too short.\nA line with enough words ends properly."), // rule 2
    (4L, "Enable javascript to view this page.\n" +
      "A perfectly fine sentence stays right here."),   // rule 4 line drop
    (5L, "Lorem Ipsum dolor sit amet filler text lives here.\n" +
      "A real sentence follows the placeholder block."), // page flag
    (6L, "function f() { return 1; }\nA sentence after the code block."),
    (7L, "This page mentions nsfw content somewhere inside.\n" +
      "Otherwise the page reads completely normally."),  // blocklist
    (8L, "One sentence only lives here, quite alone.\n" +
      "\"A quoted ending also counts as terminal.\""),   // < 5 sentences
    (9L, ""))                                            // empty page

  private val c4Clean: QueryFn = (s, _) => {
    import s.implicits._
    graft.operators.TrainingData.c4Clean(C4Fixture.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select(col("id").as("doc_id"), col("n_lines"), col("n_lines_kept"),
        col("n_sentences"), col("has_lorem"), col("has_brace"),
        col("has_blocked"), col("passes"), md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val c4CleanSql: String = {
    import graft.operators.TrainingData.{C4SentencePattern, DefaultC4Blocklist, DefaultC4MinLineWords, DefaultC4MinSentences}
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val values = C4Fixture.map { case (i, t) =>
      s"($i, ${q(t)})" }.mkString(",\n    ")
    val block = DefaultC4Blocklist.map(w => s"'$w'").mkString(", ")
    // a kept line: trimmed, ends in terminal punct, >= 3 tokens, no
    // 'javascript' — the trim/tokenize contracts shared with every gate
    val keepLine =
      s"""l -> regexp_matches(regexp_replace(l, '^$wsClassSql+|$wsClassSql+$$', '', 'g'), '[.!?"]$$')
         |      AND len(${tokSqlOf(s"regexp_replace(l, '^$wsClassSql+|$wsClassSql+$$', '', 'g')")}) >= 3
         |      AND NOT contains(lower(regexp_replace(l, '^$wsClassSql+|$wsClassSql+$$', '', 'g')), 'javascript')""".stripMargin
    s"""WITH f(doc_id, text) AS (VALUES
       |    $values),
       |c AS (
       |  -- DuckDB string_split('') = [] where the JVM split keeps [''],
       |  -- and array_to_string([]) = NULL: both pinned to the Spark side
       |  SELECT doc_id, text,
       |    CASE WHEN text = '' THEN ['']::VARCHAR[]
       |         ELSE string_split(text, chr(10)) END AS ls,
       |    coalesce(array_to_string(list_filter(
       |      CASE WHEN text = '' THEN ['']::VARCHAR[]
       |           ELSE string_split(text, chr(10)) END,
       |      $keepLine), chr(10)), '') AS clean
       |  FROM f)
       |SELECT doc_id::BIGINT AS doc_id,
       |  len(ls)::BIGINT AS n_lines,
       |  len(list_filter(ls, $keepLine))::BIGINT AS n_lines_kept,
       |  len(regexp_extract_all(clean, '$C4SentencePattern'))::BIGINT
       |    AS n_sentences,
       |  contains(lower(text), 'lorem ipsum')::BIGINT AS has_lorem,
       |  contains(text, '{')::BIGINT AS has_brace,
       |  (len(list_intersect(list_distinct($tokSql), [$block])) > 0)::BIGINT
       |    AS has_blocked,
       |  (len(regexp_extract_all(clean, '$C4SentencePattern')) >= $DefaultC4MinSentences
       |    AND NOT contains(lower(text), 'lorem ipsum')
       |    AND NOT contains(text, '{')
       |    AND len(list_intersect(list_distinct($tokSql), [$block])) = 0
       |  )::BIGINT AS passes,
       |  md5(clean) AS clean_md5
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** C4-style boilerplate fraction over trigrams at doc-freq >= 5 (151
    * of 16k distinct trigrams clear it at sf0.01 — a real common set).
    * The oracle re-derives the same hashed trigram sets, the same
    * doc-frequency cut, and the same hit fractions. */
  private val boilerplate: QueryFn = (s, dir) =>
    graft.operators.TrainingData.boilerplateFraction(
        table(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, minDocFreq = 5)
      .select(col("id").as("doc_id"), col("n_grams"), col("common_frac"))
      .orderBy(col("doc_id"))

  private val boilerplateSql: String =
    s"""WITH s AS (${DedupQueries.hashedTrigramSets}),
       |e AS (SELECT doc_id, unnest(hsh) AS h FROM s),
       |cm AS (SELECT h FROM (SELECT h, count(*) AS df FROM e GROUP BY 1)
       |       WHERE df >= 5),
       |ht AS (SELECT doc_id, count(*) AS hits
       |       FROM e JOIN cm USING (h) GROUP BY 1)
       |SELECT s.doc_id, len(s.hsh)::BIGINT AS n_grams,
       |  CASE WHEN len(s.hsh) = 0 THEN 0.0::DOUBLE
       |       ELSE round(coalesce(ht.hits, 0)::DOUBLE / len(s.hsh), 6) + 0
       |       END AS common_frac
       |FROM s LEFT JOIN ht USING (doc_id) ORDER BY doc_id""".stripMargin

  /** PII redaction over a crafted fixture defined ONCE here and
    * embedded identically in both engines (the sf corpus contains no
    * PII, so gating over it would verify nothing): URLs/emails/IPv4s/
    * phone runs redact in the pinned order with per-category counts.
    * The fixture exercises the order traps — an email inside a URL
    * query string, an IPv4 embedded in a version string (word-boundary
    * miss), international and bare-digit phone shapes. A python `re`
    * third implementation confirmed the same bytes before the patterns
    * shipped. */
  private val PiiFixture: Seq[(Long, String)] = Seq(
    (1L, "contact me at jane.doe+spam@example.co.uk for details"),
    (2L, "see https://ex.com/path?u=me@x.com&y=1 and http://b.io"),
    (3L, "server at 10.0.255.7 rebooted; version v1.2.3.4beta unaffected"),
    (4L, "call +1 (555) 123-4567 or 5551234567 now"),
    (5L, "perfectly clean organic text"),
    (6L, "mixed: a@b.de near 192.168.0.1 via https://c.d/e +49 30 901820"),
    (7L, "digits 123456789012 end"),
    // NON-PII digit structures the structured phone pattern must NOT
    // eat: ISO dates, ISBNs, spaced thousands
    (8L, "released on 2026-08-14, ISBN 978-0-306-40615-7, 1 000 000 users"))

  private val redactPiiQ: QueryFn = (s, _) => {
    import s.implicits._
    graft.operators.TextAnalysis.redactPii(PiiFixture.toDF("id", "text"),
        col("id"), col("text"))
      .orderBy("id")
  }

  private val redactPiiSql: String = {
    def q(x: String) = "'" + x.replace("'", "''") + "'"
    val values = PiiFixture.map { case (i, t) => s"($i, ${q(t)})" }
      .mkString(",\n    ")
    var state = "s"
    val sel = graft.operators.TextAnalysis.PiiPatterns.map { case (name, pat, repl) =>
      val c = s"len(regexp_extract_all($state, ${q(pat)}))::INT AS n_$name"
      state = s"regexp_replace($state, ${q(pat)}, ${q(repl)}, 'g')"
      c
    }
    s"""WITH f(id, s) AS (VALUES
       |    $values)
       |SELECT id::BIGINT AS id, ${sel.mkString(", ")},
       |  $state AS clean_text
       |FROM f ORDER BY id""".stripMargin
  }

  /** Token statistics + content fingerprint over the multilingual
    * fixture — gates [[TextAnalysis.tokens]] (and every consumer:
    * lang-ID, quality, BM25, BPE word splitting) on non-ASCII text the
    * sf tables never exercise: token COUNTS prove the whitespace-class
    * agreement (NBSP/ideographic-space separators), n_unique and the
    * md5 fingerprint prove the case/NFC mapping agreement hash-exactly
    * (one divergent code point changes a token, its bigrams, and the
    * min-hash). */
  private val unicodeTokens: QueryFn = (s, _) => {
    val t = tokens(col("text"))
    s.read.parquet(s"${AnnQueries.FixturesDir}/unicode_docs.parquet").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_unique"),
      (round(avgTokenLen(t), 6) + lit(0.0d)).as("avg_token_len"),
      fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  private val unicodeTokensSql: String =
    s"""SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_unique,
       |  round(list_sum(list_transform(t, x -> len(x)))::DOUBLE / len(t), 6) + 0 AS avg_token_len,
       |  list_min(list_transform(
       |    list_distinct(CASE WHEN len(t) >= 2
       |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
       |      ELSE []::VARCHAR[] END),
       |    s -> ('0x' || substr(md5('0:' || s), 1, 15))::BIGINT)) AS fingerprint
       |FROM (SELECT doc_id, $tokSql AS t
       |      FROM read_parquet('${AnnQueries.FixturesDir}/unicode_docs.parquet'))
       |ORDER BY doc_id""".stripMargin

  /** Script-aware language ID over the multilingual fixture: the
    * non-Latin scripts (CJK/kana/Hangul/Cyrillic/Arabic/Devanagari/
    * Greek) decide by code-point-range presence, Latin text falls back
    * to the stopword argmax — the oracle replays the exact ordered
    * decision chain, both generated from TextAnalysis.ScriptRanges. */
  private val langIdScript: QueryFn = (s, _) =>
    s.read.parquet(s"${AnnQueries.FixturesDir}/unicode_docs.parquet").select(
        col("doc_id"),
        predictedLangScript(col("text"), tokens(col("text")))
          .as("predicted_lang"))
      .orderBy(col("doc_id"))

  private val langIdScriptSql: String = {
    val whens = ScriptRanges.map { case (code, cls) =>
      s"WHEN len(regexp_extract_all(text, '$cls')) > 0 THEN '$code'"
    }.mkString("\n       |    ")
    s"""SELECT doc_id,
       |  CASE $whens
       |    ELSE $langCaseSql END AS predicted_lang
       |FROM (SELECT doc_id, text, $tokSql AS t
       |      FROM read_parquet('${AnnQueries.FixturesDir}/unicode_docs.parquet'))
       |ORDER BY doc_id""".stripMargin
  }

  /** Language-ID CONFIDENCE + the CCNet keep rule over the multilingual
    * fixture: beside the argmax prediction, the deterministic confidence
    * (script-char fraction for script-decided docs, winning-profile hit
    * fraction for the Latin fallback) and the `kept` flag at the shipped
    * LangIdMinConfidence cut. The fixture forces the distinction the
    * rule exists for: keyword-soup docs the argmax happily labels 'en'
    * (zero stopword hits) and wrong-profile Latin docs (Turkish) carry
    * confidence 0 and DROP, while genuine prose in the profiled
    * languages and script-decided docs keep. The oracle replays the
    * decision chain, both fractions, the rounding, and the cut. */
  private val langIdConf: QueryFn = (s, _) => {
    val t = tokens(col("text"))
    val conf = graft.operators.TextAnalysis
      .langScriptConfidence(col("text"), t)
    s.read.parquet(s"${AnnQueries.FixturesDir}/unicode_docs.parquet").select(
        col("doc_id"),
        predictedLangScript(col("text"), t).as("predicted_lang"),
        conf.as("lang_conf"),
        (conf >= graft.operators.TextAnalysis.LangIdMinConfidence)
          .cast("long").as("kept"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of TextAnalysis.langScriptConfidence over columns
    * `text` and `t` — generated from the SAME ScriptRanges +
    * LangProfiles so the chain cannot drift. */
  private def langConfSqlOf: String = {
    val whens = ScriptRanges.map { case (_, cls) =>
      s"WHEN len(regexp_extract_all(text, '$cls')) > 0 THEN " +
        s"len(regexp_extract_all(text, '$cls'))::DOUBLE / " +
        s"len(regexp_replace(text, '$wsClassSql+', '', 'g'))"
    }.mkString("\n       |    ")
    val scores = LangProfiles.map { case (_, words) =>
      s"len(list_filter(t, x -> x IN (${words.map(w => s"'$w'").mkString(", ")})))"
    }
    s"""round(CASE $whens
       |    ELSE greatest(${scores.mkString(", ")})::DOUBLE / len(t) END, 6) + 0"""
      .stripMargin
  }

  private val langIdConfSql: String =
    s"""SELECT doc_id,
       |  $langScriptCaseSql AS predicted_lang,
       |  $langConfSqlOf AS lang_conf,
       |  ($langConfSqlOf >=
       |    ${graft.operators.TextAnalysis.LangIdMinConfidence})::BIGINT AS kept
       |FROM (SELECT doc_id, text, $tokSql AS t
       |      FROM read_parquet('${AnnQueries.FixturesDir}/unicode_docs.parquet'))
       |ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("text_langid_script", langIdScript, Some(langIdScriptSql)),
    Q("text_langid_conf", langIdConf, Some(langIdConfSql)),
    Q("text_tokens_unicode", unicodeTokens, Some(unicodeTokensSql)),
    Q("text_redact_pii", redactPiiQ, Some(redactPiiSql)),
    Q("text_token_stats", tokenStats, Some(tokenStatsSql)),
    Q("text_repetition", repetition, Some(repetitionSql)),
    Q("text_lm_quality", lmQuality, Some(lmQualitySql)),
    Q("text_lm_bigram", lmBigram, Some(lmBigramSql)),
    Q("pipeline_ccnet_buckets", ccnetBuckets, Some(ccnetBucketsSql)),
    Q("pipeline_remove_paragraphs", removeParagraphs, Some(removeParagraphsSql)),
    Q("pipeline_c4_clean", c4Clean, Some(c4CleanSql)),
    Q("text_gopher_repetition", gopherRepetition, Some(gopherRepetitionSql)),
    Q("pipeline_ccnet_buckets_lang", ccnetBucketsLang, Some(ccnetBucketsLangSql)),
    Q("pipeline_ccnet_e2e", ccnetE2e, Some(ccnetE2eSql)),
    Q("text_gopher_rules", gopherRules, Some(gopherRulesSql)),
    Q("text_boilerplate", boilerplate, Some(boilerplateSql)),
    Q("text_bm25_topk", bm25, Some(bm25Sql)),
    Q("search_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    Q("text_term_stats", termStats, Some(termStatsSql)),
    Q("text_quality", quality, Some(qualitySql)),
    Q("text_langid", langId, Some(langIdSql)),
    Q("pipeline_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Q("text_fingerprint", fingerprintQ, Some(fingerprintSql)),
    Q("text_chunk_overlap", chunkOverlap, Some(chunkOverlapSql)),
    Q("text_chunk_sentences", chunkSentences, Some(chunkSentencesSql)),
    Q("window_doc_reconstruct", docReconstruct, Some(docReconstructSql)),
  )
}
