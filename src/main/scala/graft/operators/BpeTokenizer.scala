package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Deterministic corpus-trained byte-pair-encoding tokenizer — the
  * subword token counter a pretraining pipeline budgets with (whitespace
  * tokens over-count code/CJK and under-count long compounds; packing
  * budgets, mixture caps, and repetition windows all want SUBWORD
  * counts). No reference analog (the reference tokenizes nothing);
  * the algorithm is the classic BPE of Sennrich et al. 2016 trained at
  * the word level, with every rule pinned so a SQL oracle can replay
  * BOTH training and application exactly:
  *
  *   - words: [[TextAnalysis.tokens]] (whitespace split of the
  *     lowercased, trimmed text)
  *   - trainable words: printable-ASCII only (`^[!-~]+$`) — character
  *     identity, comparison order, and concatenation are then identical
  *     across engines (UTF-16 vs UTF-8 code-unit differences vanish)
  *   - training vocabulary: top-`vocabTop` trainable word types by
  *     (count DESC, term ASC)
  *   - each iteration merges the adjacent token pair with the highest
  *     occurrence-weighted count (ties: smallest left, then smallest
  *     right, binary string order), stopping early when no pair occurs
  *     at least twice; merging replaces pair occurrences LEFT-TO-RIGHT,
  *     non-overlapping (the exact semantics of a string `replace` over
  *     sentinel-wrapped tokens — which is how the SQL oracle replays it)
  *   - application: every word applies the merge list in rank order with
  *     the same replace semantics; non-trainable words count one token
  *     per code point
  *
  * Scale shape: training state is the top-`vocabTop` word-count table —
  * BOUNDED driver memory by construction (the same discipline as
  * [[TrainingData.unigramLogProbs]]'s vocabCap broadcast; classic BPE
  * trainers are dictionary-based for the same reason), reached by one
  * corpus-scan aggregation + a vocabTop-row TakeOrderedAndProject.
  * Application never collects: distinct terms tokenize per-partition
  * with the merge list in the task closure, then join back to the
  * (doc, term) counts on the high-cardinality term key. The corpus text
  * is scanned once per pass and never shuffled.
  */
object BpeTokenizer {

  val DefaultVocabTop = 2048
  val DefaultMerges = 32
  val TrainableRe = "^[!-~]+$"
  // precompiled: tokenize runs once per distinct term per task on the
  // application hot path — String.matches would re-compile per call
  private val TrainablePattern = java.util.regex.Pattern.compile(TrainableRe)

  /** One learned merge: at `rank`, adjacent tokens (`lhs`, `rhs`)
    * combine into `lhs + rhs`. */
  final case class Merge(rank: Int, lhs: String, rhs: String)

  /** One left-to-right, non-overlapping pass merging adjacent (a, b)
    * into a+b — the token-array twin of `replace` over
    * sentinel-wrapped tokens (both consume matched tokens and rescan
    * from the character after the replacement). */
  def mergeOnce(toks: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Train the merge list on `df`'s text corpus. One distributed
    * aggregation (word-type counts, map-side partials) cut to
    * `vocabTop` rows via TakeOrderedAndProject, then a driver loop over
    * that BOUNDED table — the only driver-sized state, ≤ vocabTop rows
    * regardless of corpus size. */
  def trainMerges(df: DataFrame, text: Column,
                  vocabTop: Int = DefaultVocabTop,
                  numMerges: Int = DefaultMerges): Seq[Merge] = {
    require(vocabTop > 0, "vocabTop must be positive")
    require(numMerges >= 0, "numMerges must be non-negative")
    val top = df.select(explode(TextAnalysis.tokens(text)).as("term"))
      .where(col("term").rlike(TrainableRe))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabTop)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var state: Array[(Array[String], Long)] =
      top.map { case (t, c) => (t.toCharArray.map(_.toString), c) }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    while (merges.length < numMerges && !done) {
      val weights = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((toks, c) <- state) {
        var i = 0
        while (i < toks.length - 1) {
          val k = (toks(i), toks(i + 1))
          weights(k) = weights.getOrElse(k, 0L) + c
          i += 1
        }
      }
      // max by (weight DESC, lhs ASC, rhs ASC); pairs seen fewer than
      // twice never merge (they would only memorize hapaxes)
      val best = weights.iterator.filter(_._2 >= 2L)
        .reduceOption { (x, y) =>
          val ((xa, xb), xw) = x; val ((ya, yb), yw) = y
          val yWins = yw > xw || (yw == xw &&
            (ya < xa || (ya == xa && yb < xb)))
          if (yWins) y else x
        }
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += Merge(merges.length + 1, a, b)
          state = state.map { case (t, c) => (mergeOnce(t, a, b), c) }
      }
    }
    merges.toSeq
  }

  /** Subword tokens of one word under a trained merge list: trainable
    * words split to characters and apply every merge in rank order;
    * anything else (non-ASCII, control chars) yields one token per CODE
    * POINT (code points, not UTF-16 units — the cross-engine contract
    * with DuckDB's codepoint semantics); the empty word yields no
    * tokens. */
  def tokenize(term: String, merges: Seq[Merge]): Array[String] =
    if (TrainablePattern.matcher(term).matches()) {
      var toks = term.toCharArray.map(_.toString)
      merges.foreach(m => toks = mergeOnce(toks, m.lhs, m.rhs))
      toks
    } else term.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))

  /** Subword token count of one word — `tokenize(term).length`. */
  def tokenCountOf(term: String, merges: Seq[Merge]): Long =
    tokenize(term, merges).length.toLong

  /** Per-document token budget under a trained merge list:
    * (id, n_tokens, n_bpe_tokens) — whitespace-token count and the
    * subword count that a packing/budgeting stage should use.
    *
    * Scale shape: (doc, term) counts aggregate with map-side partials;
    * the DISTINCT term set (vocabulary-sized, not corpus-sized)
    * tokenizes per-partition with the merge list riding the task
    * closure; the join back to the per-doc counts is an equi-join on
    * the high-cardinality term key. Nothing is collected. */
  /** Per-document SUBWORD TOKEN SEQUENCES under a trained merge list:
    * (id, toks array<string>) — every word's subtokens in word order,
    * the real tokenized stream a packing stage cuts into training
    * sequences.
    *
    * Scale shape: words explode with their positions; the DISTINCT term
    * set tokenizes per-partition (vocabulary-sized, merge list in the
    * task closure) and equi-joins back on the term key; per-document
    * reassembly is one aggregation whose state is bounded by the
    * document's own token array (the same bound any per-doc operator
    * carries). Nothing is collected. */
  /** Broadcast ceiling for the distinct-term BPE table: below it the
    * term→subtokens join is map-side (no shuffle of the corpus-sized
    * exploded frame); above it the join falls back to the shuffled
    * equi-join on the term key. 500k terms ≈ tens of MB — real corpora
    * (even 100 TB ones) usually sit under it because the table is
    * VOCABULARY-sized, but id-like/typo-heavy corpora can exceed any
    * fixed vocabulary bound, so the fallback stays. Measured at the
    * bench's 100x doc tier: the broadcast path removes the only
    * corpus-sized shuffle pair (groupBy(id, term) + join-repartition),
    * leaving one partial-aggregated groupBy(id). */
  val MaxBroadcastTerms = 500000L

  def encodedTokens(df: DataFrame, id: Column, text: Column,
                    merges: Seq[Merge]): DataFrame = {
    val words = df.select(id.as("id"),
      posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "term")))
    val session = df.sparkSession
    import session.implicits._
    // replayed ONCE over the pinned distinct-term set (vocabulary-sized)
    val termToks = words.select(col("term")).distinct()
      .as[String]
      .mapPartitions(_.map(t => (t, tokenize(t, merges).toSeq)))
      .toDF("term", "tl")
      .localCheckpoint()
    val joined =
      if (termToks.count() <= MaxBroadcastTerms)
        words.join(broadcast(termToks), "term")
      else words.join(termToks, "term")
    joined.groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("tl")))),
        x => x.getField("tl"))).as("toks"))
  }

  def tokenCounts(df: DataFrame, id: Column, text: Column,
                  merges: Seq[Merge]): DataFrame = {
    val exploded = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("term"))
    // replayed ONCE over the pinned distinct-term set (vocabulary-sized)
    val termBpe = exploded.select(col("term")).distinct()
      .select(col("term")).as(Encoders.STRING)
      .mapPartitions(_.map(t => (t, tokenCountOf(t, merges))))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("term", "nbpe")
      .localCheckpoint()
    if (termBpe.count() <= MaxBroadcastTerms)
      // vocabulary fits the broadcast bound: ONE shuffle total — the
      // exploded tokens take the nbpe weight map-side and partial-agg
      // straight into the per-doc sums (sum of nbpe over occurrences
      // == sum of c * nbpe over (doc, term) groups, exactly)
      exploded.join(broadcast(termBpe), "term")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("nbpe")).as("n_bpe_tokens"))
    else {
      // unbounded vocabulary: aggregate (doc, term) counts first so the
      // shuffled equi-join carries one row per (doc, term), not one per
      // occurrence
      val perDocTerm = exploded.groupBy(col("id"), col("term"))
        .agg(count(lit(1)).as("c"))
      perDocTerm.join(termBpe, "term")
        .groupBy(col("id"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("nbpe")).as("n_bpe_tokens"))
    }
  }
}
