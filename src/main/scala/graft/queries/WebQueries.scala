package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{HtmlExtract, TextChunker, TrainingData, WebDomains}

/** Crawl-side operators over the committed web fixture
  * (fixtures/web_docs.parquet — doc_id, url, html written by
  * tools/make_web.py): HTML→text extraction, extraction composed with
  * chunking, URL-exact dedup after normalization, and domain-aware
  * mixture rebalancing over registered domains. Every oracle replays
  * the full contract in DuckDB SQL GENERATED from the same constants
  * the Column operators use (HtmlExtract.extractSql /
  * WebDomains.*Sql), so the two sides cannot drift.
  */
object WebQueries {

  private val Fixture: String = s"${AnnQueries.FixturesDir}/web_docs.parquet"
  private val FixtureSql: String = s"read_parquet('$Fixture')"

  /** HTML → text with token accounting: the extraction contract
    * (script/style/comment drop, block-tag newlines, inline strip,
    * single-decode entities, whitespace normalization) gated
    * hash-exactly — one moved stage, one reordered entity, or one
    * whitespace rule flips the md5. */
  private val extractHtml: QueryFn = (s, _) => {
    val text = HtmlExtract.extract(col("html"))
    s.read.parquet(Fixture).select(
        col("doc_id"),
        md5(text).as("text_md5"),
        length(text).cast("long").as("n_chars"),
        size(graft.operators.TextAnalysis.tokens(text)).cast("long")
          .as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  private val extractHtmlSql: String = {
    val ex = HtmlExtract.extractSql("html")
    s"""SELECT doc_id, md5(x) AS text_md5, len(x)::BIGINT AS n_chars,
       |  len(${TextQueries.tokSqlOf("x")})::BIGINT AS n_tokens
       |FROM (SELECT doc_id, $ex AS x FROM $FixtureSql)
       |ORDER BY doc_id""".stripMargin
  }

  /** Extraction composed with overlapping-window chunking — the first
    * two stages of a crawl-to-training pipeline in one plan (HTML in,
    * embedder-ready chunks out), both contracts replayed end-to-end. */
  private val ChunkMax = 8
  private val ChunkOverlap = 2

  private val extractChunks: QueryFn = (s, _) =>
    TextChunker.chunk(
        s.read.parquet(Fixture)
          .select(col("doc_id"), HtmlExtract.extract(col("html")).as("text")),
        col("doc_id"), col("text"),
        maxTokens = ChunkMax, overlap = ChunkOverlap)
      .orderBy(col("id"), col("chunk_index"))

  private val extractChunksSql: String = {
    val stride = ChunkMax - ChunkOverlap
    s"""WITH toks AS (
       |  SELECT doc_id, ${TextQueries.splitSqlOf(HtmlExtract.extractSql("html"))} AS t
       |  FROM $FixtureSql),
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

  /** URL-exact dedup after normalization (the C4/RefinedWeb first
    * pass): group by the canonical URL, keep the smallest doc_id. The
    * fixture plants case/port/fragment/trailing-slash variants that
    * MUST collapse and querystring variants that must NOT. */
  private val urlExact: QueryFn = (s, _) => {
    val norm = WebDomains.normalizeUrl(col("url"))
    s.read.parquet(Fixture)
      .groupBy(norm.as("norm_url"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("norm_url"))
  }

  private val urlExactSql: String =
    s"""SELECT ${WebDomains.normalizeUrlSql("url")} AS norm_url,
       |  min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM $FixtureSql
       |GROUP BY 1 ORDER BY norm_url""".stripMargin

  /** RefinedWeb-style URL blocklist cut at the crawl front door: pages
    * whose CANONICAL URL's registered domain is blocklisted drop before
    * any fetch-side work (WebDomains.dropBlockedUrls — normalization
    * first, so the fixture's case/port variants of the blocked domain
    * cannot sneak past). The oracle replays normalization, host and
    * registered-domain extraction, and the anti-join against the same
    * literal blocklist; survivors carry their domain so an over- or
    * under-aggressive cut hash-mismatches. */
  private val BlockedDomains: Seq[String] = Seq("news.com.au")

  private val urlBlocklistQ: QueryFn = (s, _) => {
    val bl = s.createDataFrame(BlockedDomains.map(Tuple1(_))).toDF("domain")
    WebDomains.dropBlockedUrls(s.read.parquet(Fixture), col("url"),
        bl, col("domain"))
      .select(col("doc_id"),
        WebDomains.registeredDomain(
          WebDomains.host(WebDomains.normalizeUrl(col("url")))).as("domain"))
      .orderBy(col("doc_id"))
  }

  private val urlBlocklistSql: String = {
    val bl = BlockedDomains.map(d => s"('$d')").mkString(", ")
    s"""WITH bl(domain) AS (VALUES $bl),
       |n AS (SELECT doc_id, ${WebDomains.normalizeUrlSql("url")} AS nu
       |      FROM $FixtureSql),
       |d AS (SELECT doc_id,
       |        ${WebDomains.registeredDomainSql(WebDomains.hostSql("nu"))} AS domain
       |      FROM n)
       |SELECT doc_id, domain FROM d ANTI JOIN bl USING (domain)
       |ORDER BY doc_id""".stripMargin
  }

  /** Domain-aware mixture rebalancing: registered domains become the
    * mixture groups (per-domain caps — the standard guard against one
    * crawl-heavy host dominating a corpus), reusing the purpose-salted
    * md5 keep rule of pipeline_mixture_sample. Untargeted domains
    * drop; the oracle recomputes host → registered domain → cap →
    * rates → bucket rule entirely in SQL. */
  private val DomainTargets: Map[String, Double] =
    Map("example.co.uk" -> 0.5, "news.com.au" -> 0.25, "example.com" -> 0.25)

  /** Per-domain crawl quality panel (WebDomains.domainQualityStats):
    * extraction, tokenization, the quality score, the digest-distinct
    * count, and both means replayed in generated SQL — the quality mean
    * as the same exact integer micro-unit sum (order-free: no per-page
    * list on either engine). */
  private val domainStats: QueryFn = (s, _) =>
    WebDomains.domainQualityStats(s.read.parquet(Fixture),
        col("url"), col("html"))
      .orderBy(col("domain"))

  private val domainStatsSql: String = {
    val ex = HtmlExtract.extractSql("html")
    val qual = s"round(${TextQueries.qualitySqlOf("t")}, 6) + 0"
    s"""WITH p AS (SELECT url,
       |    ${WebDomains.registeredDomainSql(WebDomains.hostSql("url"))} AS domain,
       |    $ex AS x
       |  FROM $FixtureSql),
       |per AS (SELECT domain, md5(x) AS m,
       |    len(${TextQueries.tokSqlOf("x")})::BIGINT AS ntok,
       |    (SELECT $qual FROM (SELECT ${TextQueries.tokSqlOf("x")} AS t)) AS q
       |  FROM p)
       |SELECT domain, count(*)::BIGINT AS n_pages,
       |  count(DISTINCT m)::BIGINT AS n_unique_texts,
       |  round(sum(ntok)::DOUBLE / count(*), 6) + 0 AS avg_tokens,
       |  round(sum(round(q * 1000000.0, 0)::BIGINT)::DOUBLE / 1000000.0
       |        / count(*), 6) + 0 AS avg_quality
       |FROM per GROUP BY domain ORDER BY domain""".stripMargin
  }

  private val domainMixture: QueryFn = (s, _) => {
    val dom = WebDomains.registeredDomain(WebDomains.host(col("url")))
    TrainingData.mixtureSample(
        s.read.parquet(Fixture).withColumn("domain", dom),
        col("doc_id"), col("domain"), DomainTargets)
      .select(col("doc_id"), col("domain"))
      .orderBy(col("doc_id"))
  }

  private val domainMixtureSql: String = {
    val tgt = DomainTargets.toSeq.sortBy(_._1)
      .map { case (d, t) => s"('$d', $t::DOUBLE)" }.mkString(", ")
    s"""WITH tgt(domain, target) AS (VALUES $tgt),
       |docs AS (
       |  SELECT doc_id,
       |    ${WebDomains.registeredDomainSql(WebDomains.hostSql("url"))} AS domain
       |  FROM $FixtureSql),
       |cnt AS (SELECT domain, count(*)::DOUBLE AS n FROM docs GROUP BY 1),
       |cap AS (SELECT min(n / target) AS cap FROM cnt JOIN tgt USING (domain)),
       |rates AS (SELECT domain, least(1.0::DOUBLE, target * cap / n) AS rate
       |          FROM cnt JOIN tgt USING (domain), cap)
       |SELECT d.doc_id, d.domain
       |FROM docs d JOIN rates r USING (domain)
       |WHERE ('0x' || substr(md5('mix:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
       |        % 1000000
       |      < floor(r.rate * 1000000)
       |ORDER BY doc_id""".stripMargin
  }

  /** Line-level boilerplate removal composed over EXTRACTED text — the
    * CCNet/RefinedWeb pass in its natural position: HtmlExtract emits
    * block structure as newlines, removeCommonLines drops every line
    * recurring in >= 2 distinct documents (the fixture plants two
    * full-duplicate page pairs whose lines all vanish — the empty-husk
    * path — plus unique pages that must survive untouched). The
    * content hash gates reassembly order and the trim-insensitive
    * line identity. */
  private val removeLines: QueryFn = (s, _) =>
    TrainingData.removeCommonLines(
        s.read.parquet(Fixture)
          .select(col("doc_id"), HtmlExtract.extract(col("html")).as("text")),
        col("doc_id"), col("text"), minDocFreq = 2)
      .select(col("id").as("doc_id"), col("n_kept"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))

  private val removeLinesSql: String = {
    val ws = TextQueries.wsClassSql
    val hashT = DedupQueries.hashSql(0, "t")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(${HtmlExtract.extractSql("html")}, chr(10)) AS ls
       |  FROM $FixtureSql),
       |occ AS (
       |  SELECT doc_id, p, line,
       |    CASE WHEN t = '' THEN NULL ELSE $hashT END AS h
       |  FROM (SELECT doc_id, i - 1 AS p, line,
       |          regexp_replace(line, '^$ws+|$ws+$$', '', 'g') AS t
       |        FROM (SELECT doc_id, ls[i] AS line, i
       |              FROM d, unnest(range(1, len(ls) + 1)) AS u(i)))),
       |common AS (
       |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM occ WHERE h IS NOT NULL)
       |  GROUP BY h HAVING count(*) >= 2),
       |kept AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(line, chr(10) ORDER BY p) AS clean_text
       |  FROM occ ANTI JOIN common USING (h) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(kept.n_kept, 0)::BIGINT AS n_kept,
       |  (len(d.ls) - coalesce(kept.n_kept, 0))::BIGINT AS n_removed,
       |  md5(coalesce(kept.clean_text, '')) AS clean_md5
       |FROM d LEFT JOIN kept USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Bloom-filter seen-URL gate at the crawl front door (Bloom 1970;
    * the structure RefinedWeb-scale crawls keep over fetched URLs):
    * the filter is built over the CANONICAL URLs of the already-crawled
    * corpus (doc_id <= BloomSplit) and each arriving page is gated by a
    * pure scan-side projection — only bloom-positive pages pay the
    * exact confirm join. The fixture filter is deliberately UNDERSIZED
    * (m=32, k=2 over ~20 keys, ~72% fill) so the row pins all three
    * outcomes at once: the true positive the exact confirm keeps
    * (doc 23 — its canonical twin doc 22 is in the corpus), a FALSE
    * positive the confirm rejects (doc 27), and definite-new negatives
    * that never touch the corpus (24/25/26). The oracle rebuilds the
    * position set from the same seeded md5 and replays set membership —
    * semantically identical to the packed-word bit test. */
  private val BloomSplit = 22
  private val BloomM = 32
  private val BloomK = 2

  private val bloomUrlGate: QueryFn = (s, _) => {
    val pages = s.read.parquet(Fixture)
    val norm = WebDomains.normalizeUrl(col("url"))
    val corpusKeys = pages.where(col("doc_id") <= BloomSplit)
      .select(norm.as("key")).distinct()
    val words = graft.operators.BloomFilter.build(
      corpusKeys, col("key"), BloomM, BloomK)
    graft.operators.BloomFilter.gate(
        pages.where(col("doc_id") > BloomSplit),
        norm, corpusKeys, words, BloomM, BloomK)
      .select(col("doc_id"), col("bloom_positive"), col("is_seen"))
      .orderBy(col("doc_id"))
  }

  private val bloomUrlGateSql: String = {
    val posOf = (j: Int, e: String) => s"${DedupQueries.hashSql(j, e)} % $BloomM"
    val posList = (e: String) =>
      (0 until BloomK).map(j => posOf(j, e)).mkString("[", ", ", "]")
    s"""WITH n AS (SELECT doc_id, ${WebDomains.normalizeUrlSql("url")} AS nu
       |           FROM $FixtureSql),
       |c AS (SELECT DISTINCT nu FROM n WHERE doc_id <= $BloomSplit),
       |bits AS (SELECT list(DISTINCT p) AS ps
       |         FROM (SELECT unnest(${posList("nu")}) AS p FROM c)),
       |b AS (SELECT doc_id, nu, ${posList("nu")} AS poss
       |      FROM n WHERE doc_id > $BloomSplit)
       |SELECT b.doc_id,
       |  list_has_all(bits.ps, b.poss) AS bloom_positive,
       |  (list_has_all(bits.ps, b.poss) AND
       |   b.nu IN (SELECT nu FROM c)) AS is_seen
       |FROM b, bits ORDER BY b.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("pipeline_remove_lines", removeLines, Some(removeLinesSql)),
    Q("dedup_bloom_url_gate", bloomUrlGate, Some(bloomUrlGateSql)),
    Q("text_extract_html", extractHtml, Some(extractHtmlSql)),
    Q("text_extract_chunks", extractChunks, Some(extractChunksSql)),
    Q("dedup_url_exact", urlExact, Some(urlExactSql)),
    Q("dedup_url_blocklist", urlBlocklistQ, Some(urlBlocklistSql)),
    Q("pipeline_domain_mixture", domainMixture, Some(domainMixtureSql)),
    Q("pipeline_domain_stats", domainStats, Some(domainStatsSql)),
  )
}
