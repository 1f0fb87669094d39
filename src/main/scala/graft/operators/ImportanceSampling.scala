package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET corpus' bag-of-n-grams model
  * than under the raw corpus' own, then resample with Gumbel top-k — the
  * standard trick for picking "looks like the target distribution" data
  * out of a web-scale crawl without training a classifier.
  *
  * Features are unigram + bigram occurrences (WITH multiplicity — DSIR is
  * a bag model) of the pinned tokenization kernel, hashed into `buckets`
  * buckets with the md5-derived 60-bit hash every dedup stage shares
  * ([[NearDup.seededHash]]), so a SQL oracle replays tokenization,
  * hashing, both smoothed models, the per-document log-ratio sum, AND the
  * Gumbel keys bit-for-bit.
  *
  * Scale shape: the bucket model is O(buckets) — two aggregations with
  * map-side partials (target side is the SMALL curated exemplar set; the
  * raw side is the 100 TB corpus scanned once) — broadcast back as a
  * `buckets`-row frame. Per-document scoring is one (id, bucket) count
  * shuffle followed by a broadcast join; the fold over a document's
  * buckets is ordered (bucket-sorted), so the float sum is deterministic
  * under any partitioning. Selection is a TakeOrdered top-k, never a
  * global sort.
  */
object ImportanceSampling {

  /** Hash-function id for the feature hash (md5("<seed>:<gram>") — a
    * DEDICATED seed so DSIR buckets are independent of the dedup
    * shingle hashes that use seed 0). */
  val FeatureHashSeed = 13

  /** Default bucket count. DSIR's published configuration is 10k for
    * web-scale English; the contract holds for any positive value. */
  val DefaultBuckets = 64

  /** One row per feature OCCURRENCE: (id, bucket). Unigrams keep
    * multiplicity ([[TextAnalysis.tokens]] occurrences, not the distinct
    * shingle set) and bigrams come from the duplicate-preserving
    * [[TrainingData.ngrams]] kernel. A token never contains whitespace,
    * so a unigram can never collide with a bigram string. */
  private[operators] def featureBuckets(df: DataFrame, id: Column,
                                        text: Column,
                                        buckets: Int): DataFrame =
    df.select(id.as("id"),
        explode(concat(TextAnalysis.tokens(text),
          TrainingData.ngrams(text, 2))).as("gram"))
      .select(col("id"),
        pmod(NearDup.seededHash(FeatureHashSeed, col("gram")), lit(buckets.toLong))
          .as("bucket"))

  /** The smoothed log-ratio model: (bucket, lam) for EVERY bucket in
    * [0, buckets), with
    * lam_b = ln((target_b + 1) / (target_total + buckets))
    *       - ln((raw_b + 1) / (raw_total + buckets))
    * (add-one smoothing over the bucket space, so buckets unseen on
    * either side still carry finite mass). O(buckets) rows — broadcast
    * material, exactly like the BM25 stats or the unigram-LM vocab. */
  def bucketModel(raw: DataFrame, target: DataFrame, id: Column,
                  text: Column, buckets: Int = DefaultBuckets): DataFrame =
    bucketModelFrom(
      featureBuckets(raw, id, text, buckets)
        .groupBy(col("bucket")).agg(count(lit(1)).as("rc")),
      target, id, text, buckets)

  /** [[bucketModel]] with the raw side's bucket counts ALREADY computed
    * (column `rc`): [[importanceWeights]] derives them from its own
    * per-document count frame, so the 100 TB raw corpus is tokenized and
    * md5-hashed exactly ONCE per call — rescanning it for the model
    * would double the dominant per-gram hash cost. */
  private def bucketModelFrom(rawCounts: DataFrame, target: DataFrame,
                              id: Column, text: Column,
                              buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = rawCounts.sparkSession
    import spark.implicits._
    val all = (0L until buckets.toLong).toDF("bucket")
    val t = featureBuckets(target, id, text, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("tc"))
    val r = rawCounts
    val joined = all.join(t, Seq("bucket"), "left").join(r, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    // totals attach via a global window over the B-row model frame — NOT
    // a scalar crossJoin (plans as BroadcastNestedLoopJoin; a constant
    // equi-key gets folded back to one). Single-partition is fine here:
    // the frame is exactly `buckets` rows, and the sums are exact
    // integer arithmetic, so partitioning cannot move a bit.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    joined
      .withColumn("tt", sum(col("tc")).over(w))
      .withColumn("rt", sum(col("rc")).over(w))
      .select(col("bucket"),
        (log((col("tc") + lit(1L)).cast("double") /
            (col("tt") + lit(buckets.toLong)).cast("double")) -
          log((col("rc") + lit(1L)).cast("double") /
            (col("rt") + lit(buckets.toLong)).cast("double"))).as("lam"))
  }

  /** Per-document importance weight under the model: (id, n_feats,
    * logweight) for EVERY raw document. (The pinned kernel tokenizes
    * empty text to one empty-string token, so in practice every document
    * carries at least one feature; the defensive left join still maps a
    * feature-less row to n_feats 0, logweight 0.0.) `logweight` =
    * sum over the document's feature occurrences of lam_bucket, folded in
    * bucket order (deterministic float sum), rounded to 6 — the
    * cross-engine contract every other score column follows. */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: Column,
                        text: Column,
                        buckets: Int = DefaultBuckets): DataFrame = {
    // The shared (id, bucket) pass is pinned with localCheckpoint here,
    // NOT the releasable variant's persist: a persist() entry lives in
    // Spark's CacheManager (strong references) until an explicit
    // unpersist, so a plain caller that discards the release hook would
    // leak one cache/disk-resident entry PER CALL for the JVM lifetime.
    // Checkpoint blocks are ContextCleaner-collectable once the frame
    // is unreachable — the right default for callers with no lifecycle
    // hook. Callers that score repeatedly and want deterministic
    // reclamation use [[importanceWeightsReleasable]] and call the hook.
    val docBuckets = featureBuckets(raw, id, text, buckets)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    weightsFromDocBuckets(docBuckets, raw, target, id, text, buckets)
  }

  /** Monotone per-call tag: Spark's CacheManager substitutes a cached
    * plan into ANY later query whose canonicalized subplan matches, so
    * without a per-call distinguisher two separate importanceWeights
    * calls over the same input would silently share one cache — fine
    * for results (identical values) but wrong for lifecycle (call A's
    * release would yank call B's data) and for anyone timing the calls. */
  private val passCounter = new java.util.concurrent.atomic.AtomicLong()

  /** [[importanceWeights]] plus an EXPLICIT release hook for the
    * shared-pass (id, bucket) count cache. The single-scan design
    * materializes an O(docs x buckets) intermediate consumed by both the
    * model's raw-side totals and the scoring join; it is held as an
    * evictable CACHE (not a pinned checkpoint — blocks a checkpoint
    * retains are freed only by the ContextCleaner after GC, which in a
    * long-lived JVM lets dead intermediates crowd later work, and a
    * released checkpoint's lineage is truncated so the frame would die
    * with it — the cache recomputes instead). Each call's cache entry is
    * PRIVATE (per-call plan tag, see [[passCounter]]). Callers MUST call
    * the hook once the output is materialized: a CacheManager entry is
    * held by strong reference until its unpersist, so an uncalled hook
    * is a JVM-lifetime leak (the plain [[importanceWeights]] pins with
    * localCheckpoint instead, exactly so hook-less callers cannot
    * leak). */
  def importanceWeightsReleasable(raw: DataFrame, target: DataFrame,
                                  id: Column, text: Column,
                                  buckets: Int = DefaultBuckets)
      : (DataFrame, () => Unit) = {
    val docBuckets = featureBuckets(raw, id, text, buckets)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("__pass", lit(passCounter.incrementAndGet()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (weightsFromDocBuckets(docBuckets.drop("__pass"), raw, target, id,
        text, buckets),
      () => { docBuckets.unpersist(blocking = true); () })
  }

  /** Shared tail of both weight entry points, taking the PINNED
    * (id, bucket, cnt) frame: ONE tokenize+hash pass over the raw corpus
    * — the per-document counts feed the scoring join below AND roll up
    * (an exact integer second-stage aggregate over at most
    * |docs| x buckets rows) into the model's raw-side bucket totals —
    * identical values to counting occurrences directly, at none of the
    * rescan cost. */
  private def weightsFromDocBuckets(docBuckets: DataFrame, raw: DataFrame,
                                    target: DataFrame, id: Column,
                                    text: Column, buckets: Int): DataFrame = {
    val rawCounts = docBuckets.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("rc"))
    val model = bucketModelFrom(rawCounts, target, id, text, buckets)
    scoreCounts(docBuckets, raw.select(id.as("id")), model)
  }

  /** Score a frame against an ALREADY-TRAINED bucket model — the
    * streaming/incremental shape: the model is fixed for the life of a
    * stream (trained once from (raw, target) like the decontamination
    * gate's benchmark shingles), and each arriving micro-batch pays one
    * tokenize+hash pass plus a broadcast join. Output contract identical
    * to [[importanceWeights]]. */
  def scoreWithModel(df: DataFrame, id: Column, text: Column,
                     model: DataFrame,
                     buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // the model is exactly one row per bucket by construction; a caller
    // passing a DIFFERENT bucket count would hash features into buckets
    // the model has no rows for, and the scoring join would SILENTLY
    // drop that feature mass — systematically wrong logweights with no
    // error. One tiny aggregate over the B-row frame catches it loudly.
    val mRows = model.agg(count(lit(1)), max(col("bucket"))).head()
    require(mRows.getLong(0) == buckets.toLong &&
        (buckets == 0 || mRows.getLong(1) == buckets.toLong - 1L),
      s"model has ${mRows.getLong(0)} buckets (max id ${mRows.get(1)}) but " +
        s"scoring was asked for $buckets — train and score with ONE bucket count")
    val docBuckets = featureBuckets(df, id, text, buckets)
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("cnt"))
    scoreCounts(docBuckets, df.select(id.as("id")), model)
  }

  /** Shared scoring tail: (id, bucket, cnt) counts x broadcast (bucket,
    * lam) model -> bucket-ordered contribution fold -> every input doc
    * (feature-less rows score 0.0 through the defensive left join). */
  private def scoreCounts(docBuckets: DataFrame, allDocs: DataFrame,
                          model: DataFrame): DataFrame = {
    val perDoc = docBuckets
      .join(broadcast(model), "bucket")
      .select(col("id"), col("bucket"), col("cnt"),
        (col("cnt").cast("double") * col("lam")).as("contrib"))
    val scored = perDoc.groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_feats"),
        aggregate(
          transform(array_sort(collect_list(struct(col("bucket"), col("contrib")))),
            x => x.getField("contrib")),
          lit(0.0d), (acc, x) => acc + x).as("__s"))
      .select(col("id"), col("n_feats"),
        (round(col("__s"), 6) + lit(0.0d)).as("logweight"))
    allDocs.join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logweight"), lit(0.0d)).as("logweight"))
  }

  /** Gumbel top-`k` importance resample (the paper's selection rule:
    * adding i.i.d. Gumbel noise to the log-weights and taking the top k
    * samples WITHOUT replacement from the softmax of the weights). The
    * noise is derived from the id (`u = (h + 0.5) / 2^30` with h the
    * md5 bucket [[TrainingData.hashBucket]] under the "dsir:" salt — u
    * strictly inside (0,1), so the Gumbel `-ln(-ln(u))` is always
    * finite), making selection a pure function of (corpus, target, id):
    * re-runs and other engines agree row-by-row.
    *
    * Output: (id, logweight, key) for the k selected documents, key
    * descending (ties by id), key rounded to 6 for the cross-engine
    * contract — the CUT itself compares unrounded keys, the
    * [[TrainingData.weightedSample]] precedent. */
  def importanceResample(raw: DataFrame, target: DataFrame, id: Column,
                         text: Column, k: Int,
                         buckets: Int = DefaultBuckets): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (TrainingData.hashBucket("dsir:", col("id"), 1L << 30)
      .cast("double") + 0.5d) / lit((1L << 30).toDouble)
    importanceWeights(raw, target, id, text, buckets)
      .withColumn("__key", col("logweight") - log(-log(u)))
      .orderBy(col("__key").desc, col("id"))
      .limit(k)
      .select(col("id"), col("logweight"),
        (round(col("__key"), 6) + lit(0.0d)).as("key"))
  }
}
