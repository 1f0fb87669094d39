package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained two-class quality classifier — the GPT-3 recipe's filter rung
  * (Brown et al. 2020, Appendix A: a classifier trained to separate
  * "looks like the curated corpus" from "looks like raw crawl", kept
  * documents drawn by the published Pareto rule; the LLaMA pipeline's
  * Wikipedia-reference classifier is the same shape). This is the
  * Naive-Bayes form over the SAME hashed unigram+bigram feature buckets
  * as DSIR ([[ImportanceSampling.bucketHistogram]], seed 13): per-class
  * add-one-smoothed bucket likelihoods, a document's score is the
  * class-prior log-odds plus the bucket-ordered sum of per-occurrence
  * log-likelihood ratios, squashed to a probability.
  *
  * Everything is engine-replayable: the feature hash is the shared md5
  * kernel, both class models retrain in SQL, the per-document fold is
  * bucket-ordered, the logistic runs on the ALREADY-ROUNDED score (so
  * the exp input is the identical double on every engine), and the
  * Pareto draw derives from the id under a dedicated salt.
  *
  * Scale shape: training scans each class once into O(buckets) rows
  * (map-side partials over per-doc histogram counts — at most `buckets`
  * rows per document reach the shuffle; the positive exemplar set is
  * small, the negative side is a bounded crawl sample — NOT the whole
  * corpus); the model collects to a bounded literal array. Scoring is a
  * PROJECTION-ONLY scan — the shared histogram kernel + the in-row
  * bucket-ordered fold, zero shuffles — the DSIR scoring shape exactly.
  */
object QualityClassifier {

  /** Default Pareto shape — the published GPT-3 value (alpha = 9). */
  val DefaultAlpha = 9.0

  /** Train the two-class bucket model: one row per bucket in
    * [0, buckets) with
    *   w_b   = ln((pos_b + 1) / (pos_total + buckets))
    *         - ln((neg_b + 1) / (neg_total + buckets))
    * plus the class-prior log-odds `lprior` = ln(|pos docs| / |neg
    * docs|) carried on every row (the model frame is self-contained —
    * a facade can persist and re-attach it like the DSIR model).
    * EAGER on the two document counts only (1-row reads, the literal-
    * attach rule); the bucket totals attach via the global window over
    * the B-row frame (exact integer sums).
    *
    * Output: (bucket, w, lprior). */
  def trainModel(pos: DataFrame, neg: DataFrame, id: Column, text: Column,
                 buckets: Int = ImportanceSampling.DefaultBuckets): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val nPos = pos.count()
    val nNeg = neg.count()
    require(nPos > 0 && nNeg > 0,
      s"both classes need documents (pos=$nPos, neg=$nNeg)")
    val lprior = math.log(nPos.toDouble / nNeg.toDouble)
    val spark = pos.sparkSession
    import spark.implicits._
    val all = (0L until buckets.toLong).toDF("bucket")
    val p = ImportanceSampling.featureBucketCounts(pos, id, text, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("pc"))
    val n = ImportanceSampling.featureBucketCounts(neg, id, text, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("nc"))
    val joined = all.join(p, Seq("bucket"), "left").join(n, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("pc"), lit(0L)).as("pc"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    joined
      .withColumn("pt", sum(col("pc")).over(w))
      .withColumn("nt", sum(col("nc")).over(w))
      .select(col("bucket"),
        (log((col("pc") + lit(1L)).cast("double") /
            (col("pt") + lit(buckets.toLong)).cast("double")) -
          log((col("nc") + lit(1L)).cast("double") /
            (col("nt") + lit(buckets.toLong)).cast("double"))).as("w"),
        lit(lprior).as("lprior"))
  }

  /** Score every document of `df` against a trained model: `llr` =
    * round(lprior + bucket-ordered sum of cnt_b * w_b, 6), `prob` =
    * round(sigmoid(llr), 6) — the logistic runs on the ROUNDED llr so
    * both engines feed exp the same double. A feature-less row (the
    * pinned tokenizer makes it unreachable in practice) folds to 0.0
    * and scores the bare prior.
    *
    * Execution shape: the model is collected ONCE into a bounded
    * `buckets`-length literal array (O(buckets) — the DSIR precedent)
    * and scoring is a PROJECTION-ONLY scan: the shared histogram kernel
    * plus the in-row bucket-ordered fold — the identical float sequence
    * as the former (id, bucket) shuffle + broadcast join +
    * collect_list fold, at zero shuffles.
    *
    * Output: (id, n_feats, llr, prob) for EVERY input document. */
  def score(df: DataFrame, id: Column, text: Column, model: DataFrame,
            buckets: Int = ImportanceSampling.DefaultBuckets): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // ONE bounded collect for weights AND prior (a second action would
    // re-run the training scans behind a lazy model frame); the shape
    // guard is loud — a wrong bucket count would silently hash feature
    // mass into buckets the model has no weights for
    val rows = model
      .select(col("bucket").cast("long"), col("w"), col("lprior")).collect()
    // distinct-id coverage of [0, buckets), not just a row count — a
    // duplicate id would silently zero the missing bucket (see
    // ImportanceSampling.lamArray)
    require(rows.length == buckets &&
        rows.map(_.getLong(0)).toSet == (0L until buckets.toLong).toSet,
      s"model has ${rows.length} rows over " +
        s"${rows.map(_.getLong(0)).distinct.length} distinct bucket ids " +
        s"but scoring was asked for $buckets — train and score with ONE " +
        "bucket count")
    val w = new Array[Double](buckets)
    rows.foreach(r => w(r.getLong(0).toInt) = r.getDouble(1))
    val lprior = rows.head.getDouble(2)
    val (nFeats, s) = ImportanceSampling.scoreColumns(text, w, buckets)
    df.select(id.as("id"), nFeats.as("n_feats"),
        (round(lit(lprior) + s, 6) + lit(0.0d)).as("llr"))
      .withColumn("prob",
        round(lit(1.0d) / (lit(1.0d) + exp(-col("llr"))), 6) + lit(0.0d))
  }

  /** The GPT-3 stochastic keep rule (Brown et al. 2020, Appendix A:
    * keep a document iff `pareto(alpha) > 1 - score`): the Pareto draw
    * is the inverse CDF (1+x)^(-alpha) applied to the md5-uniform
    * u = (h + 0.5) / 2^30 under the dedicated "qc:" salt — selection is
    * a pure function of (model, id), reproducible everywhere. The draw
    * is rounded to 6 before the comparison (pow is the one
    * transcendental here; rounding pins the boundary on both engines).
    * Low-probability docs still keep with small chance — the published
    * behavior (it keeps the crawl's tail from vanishing entirely). */
  def paretoKeep(id: Column, prob: Column,
                 alpha: Double = DefaultAlpha): Column = {
    require(alpha > 0.0, "alpha must be positive")
    val u = (TrainingData.hashBucket("qc:", id, 1L << 30)
      .cast("double") + 0.5d) / lit((1L << 30).toDouble)
    val draw = round(pow(u, lit(-1.0d / alpha)) - lit(1.0d), 6) + lit(0.0d)
    draw > (lit(1.0d) - prob)
  }
}
