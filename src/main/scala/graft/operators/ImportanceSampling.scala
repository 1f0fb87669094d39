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
  * map-side partials (target side is the SMALL curated exemplar set;
  * the per-doc histogram kernel caps each document's shuffle input at
  * `buckets` rows) — materialized EAGERLY to the driver as a
  * `buckets`-length literal array (the same bounded-model collect class
  * as the IVF centroids and the BM25 stats). Per-document scoring is a
  * PROJECTION-ONLY scan — the histogram kernel + an in-row fold over
  * the (count, lam) zip in bucket order, so the float sum is
  * deterministic under any partitioning and NOTHING shuffles (the
  * former (id, bucket) count shuffle was the r18 driver bench's
  * 100x-tier bound breaker). Selection is a TakeOrdered top-k, never a
  * global sort.
  *
  * Storage discipline (round 18): NOTHING corpus-sized is pinned. The
  * raw corpus pays two linear tokenize+hash passes per end-to-end run —
  * one eager pass training the model, one lazy pass scoring — instead of
  * the previous one-pass design that materialized the O(docs x buckets)
  * (id, bucket) counts into the block store (localCheckpoint / tagged
  * persist). That intermediate is itself roughly corpus-token-sized, so
  * "saving" the second scan spent comparable I/O writing and re-reading
  * spill blocks whose reclamation was GC-timing-dependent (ContextCleaner)
  * or hook-dependent — the round-17 driver bench measured exactly that
  * pressure (pipeline_dsir_sample 13.2 s vs 2.5 s; dsir_weights@100x
  * 126x). Two stateless scans are the same asymptotic cost with zero
  * executor-storage footprint and nothing for a long-lived JVM to leak.
  */
object ImportanceSampling {

  /** Hash-function id for the feature hash (md5("<seed>:<gram>") — a
    * DEDICATED seed so DSIR buckets are independent of the dedup
    * shingle hashes that use seed 0). */
  val FeatureHashSeed = 13

  /** Default bucket count. DSIR's published configuration is 10k for
    * web-scale English; the contract holds for any positive value. */
  val DefaultBuckets = 64

  /** Per-row feature-bucket HISTOGRAM (length-`buckets` long array,
    * index = bucket, value = occurrence count): unigrams keep
    * multiplicity ([[TextAnalysis.tokens]] occurrences, not the distinct
    * shingle set) and bigrams come from the duplicate-preserving
    * [[TrainingData.ngrams]] stream; hashing is seededHash(13, gram) %
    * buckets, all folded in ONE tokenize pass by the JIT kernel
    * ([[graft.functions.TextHash.featureBucketsCol]]). A token never
    * contains whitespace, so a unigram can never collide with a bigram
    * string. Bit-identical to exploding the gram stream through the
    * shared md5 kernel — which is what the DuckDB oracle replays. */
  private[operators] def bucketHistogram(text: Column, buckets: Int): Column =
    graft.functions.TextHash.featureBucketsCol(text, FeatureHashSeed, buckets)

  /** Per-document bucket counts: (id, bucket, cnt) with cnt >= 1 — the
    * relational unroll of [[bucketHistogram]] for the TRAINING
    * aggregations (at most `buckets` rows per document reach the
    * shuffle, vs one row per token occurrence in the exploded-gram
    * formulation). */
  private[operators] def featureBucketCounts(df: DataFrame, id: Column,
                                             text: Column,
                                             buckets: Int): DataFrame =
    df.select(id.as("id"),
        posexplode(bucketHistogram(text, buckets)).as(Seq("bucket", "cnt")))
      .where(col("cnt") > 0L)
      .select(col("id"), col("bucket").cast("long").as("bucket"), col("cnt"))

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
      featureBucketCounts(raw, id, text, buckets)
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("rc")),
      target, id, text, buckets)

  /** [[bucketModel]] with the raw side's bucket counts ALREADY computed
    * (column `rc`) — the smoothing/totals/log-ratio tail shared by any
    * caller that aggregated the raw side itself. */
  private def bucketModelFrom(rawCounts: DataFrame, target: DataFrame,
                              id: Column, text: Column,
                              buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = rawCounts.sparkSession
    import spark.implicits._
    val all = (0L until buckets.toLong).toDF("bucket")
    val t = featureBucketCounts(target, id, text, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("tc"))
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

  /** EAGERLY collect a (bucket, lam) model frame into a dense
    * bucket-indexed array: O(buckets) rows — bounded collect, the
    * IVF-centroid/BM25-stats class. Doubles round-trip the driver
    * bit-exactly (the Row carries the IEEE value), so the literal array
    * scores identically to the frame it came from. Validates the model
    * shape loudly: a caller passing a DIFFERENT bucket count would hash
    * features into buckets the model has no values for — systematically
    * wrong logweights with no error otherwise. */
  private[operators] def lamArray(model: DataFrame, valueCol: String,
                                  buckets: Int): Array[Double] = {
    val rows = model.select(col("bucket").cast("long"), col(valueCol))
      .collect()
    // the DISTINCT id set must be exactly [0, buckets): a row-count
    // check alone admits duplicate ids, silently zeroing the missing
    // bucket and taking a collect-order-dependent value for the
    // duplicated one — the exact silent-wrong-scores failure this
    // guard exists to make loud
    require(rows.length == buckets &&
        rows.map(_.getLong(0)).toSet == (0L until buckets.toLong).toSet,
      s"model has ${rows.length} rows over " +
        s"${rows.map(_.getLong(0)).distinct.length} distinct bucket ids " +
        s"but scoring was asked for $buckets — train and score with ONE " +
        "bucket count")
    val out = new Array[Double](buckets)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getDouble(1))
    out
  }

  /** The shared PROJECTION-ONLY scoring tail: per row, the
    * [[bucketHistogram]] kernel builds the bucket counts in one
    * tokenize pass and the contribution fold runs over the
    * (count, lam) zip in bucket order — the IDENTICAL float sequence
    * as the former (id, bucket) shuffle + broadcast-join +
    * collect_list fold (contributions cnt*lam for cnt >= 1 buckets,
    * ascending bucket, left fold from 0.0), so hashes are unchanged —
    * at ZERO shuffles: the r18 driver bench measured the old shuffle
    * as the 100x-tier bound breaker (dsir_weights@100x 162x vs the
    * x150 bound). Returns (n_feats, logweight_unrounded) columns. */
  private[operators] def scoreColumns(text: Column, lam: Array[Double],
                                      buckets: Int): (Column, Column) = {
    // NULL-text rows score (0, 0.0) — the old defensive-left-join
    // contract: the kernel returns null for a null child, and without
    // this coalesce the folds would propagate null n_feats/logweight
    // (and null llr/prob in the classifier) instead of the documented
    // feature-less zeros
    val hist = coalesce(bucketHistogram(text, buckets),
      typedlit(Seq.fill(buckets)(0L)))
    val lamLit = typedlit(lam.toSeq)
    val contribs = filter(
      zip_with(hist, lamLit, (c, l) =>
        when(c > lit(0L), c.cast("double") * l)),
      x => x.isNotNull)
    val s = aggregate(contribs, lit(0.0d), (acc, x) => acc + x)
    val nFeats = aggregate(hist, lit(0L), (acc, x) => acc + x)
    (nFeats, s)
  }

  /** Per-document importance weight under the model: (id, n_feats,
    * logweight) for EVERY raw document (the pinned kernel tokenizes
    * empty text to one empty-string token, so every document carries at
    * least one feature; a hypothetical feature-less row folds to 0.0).
    * `logweight` = sum over the document's feature occurrences of
    * lam_bucket, folded in bucket order (deterministic float sum),
    * rounded to 6 — the cross-engine contract every other score column
    * follows.
    *
    * Execution shape: the model trains EAGERLY at call time (one linear
    * tokenize+hash pass over each side, collected to a `buckets`-length
    * literal array); the RETURNED plan is one stateless projection-only
    * corpus scan — no (id, bucket) shuffle, no join, nothing pinned, so
    * repeated calls and materializations leave zero executor-storage
    * residue. */
  def importanceWeights(raw: DataFrame, target: DataFrame, id: Column,
                        text: Column,
                        buckets: Int = DefaultBuckets): DataFrame = {
    val lam = lamArray(bucketModel(raw, target, id, text, buckets),
      "lam", buckets)
    scoreProjection(raw, id, text, lam, buckets)
  }

  /** Score a frame against an ALREADY-TRAINED bucket model — the
    * streaming/incremental shape: the model is fixed for the life of a
    * stream (trained once from (raw, target) like the decontamination
    * gate's benchmark shingles, collected ONCE to a bounded literal
    * array), and each arriving micro-batch pays one tokenize+hash
    * projection pass. Output contract identical to
    * [[importanceWeights]]. */
  def scoreWithModel(df: DataFrame, id: Column, text: Column,
                     model: DataFrame,
                     buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    scoreProjection(df, id, text, lamArray(model, "lam", buckets), buckets)
  }

  /** [[scoreColumns]] packaged as the (id, n_feats, logweight) frame. */
  private def scoreProjection(df: DataFrame, id: Column, text: Column,
                              lam: Array[Double], buckets: Int): DataFrame = {
    val (nFeats, s) = scoreColumns(text, lam, buckets)
    df.select(id.as("id"), nFeats.as("n_feats"),
      (round(s, 6) + lit(0.0d)).as("logweight"))
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
