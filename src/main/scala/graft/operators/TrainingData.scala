package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond dedup: benchmark
  * decontamination, token-budget sequence packing, deterministic split
  * assignment, and intra-document repetition signals.
  *
  * These are the LLM-pipeline stages the reference has no analog for
  * (builder brief; SURVEY.md §2.9) — each is designed shuffle-first for
  * the 100 TB shape and each carries arithmetic a SQL oracle can replay
  * exactly (md5-derived hashes, integer window sums, IEEE divisions).
  */
object TrainingData {

  // ---------------- benchmark decontamination ----------------

  /** Per-document contamination hits against a benchmark/eval corpus: for
    * every corpus document sharing at least one word `n`-gram with ANY
    * benchmark document, the number of distinct shared `n`-grams.
    * Documents with zero hits are absent (the common case — the caller
    * anti-joins to drop contaminated docs, so absence IS the clean set).
    *
    * This is the standard eval-set decontamination pass (n-gram collision
    * against held-out benchmarks) run before training-set freezes.
    *
    * Scale shape: the benchmark side is SMALL by construction (eval sets
    * are MBs; the corpus is the 100 TB side), so its distinct shingle
    * hashes are broadcast — the corpus is scanned once, its exploded
    * shingles hash-joined map-side against the broadcast set, and the
    * only shuffle is the final per-doc count (partial-aggregated, at most
    * one row per (doc, partition)). The corpus is never repartitioned and
    * never self-joined. Shingles are the 60-bit md5-derived hashes shared
    * with [[NearDup]] ([[NearDup.hashedShingles]]), so the broadcast set
    * is 8 bytes per benchmark n-gram and any SQL oracle can recompute
    * every stage.
    *
    * Output: (id, n_hits) — one row per contaminated corpus document. */
  def contaminationHits(corpus: DataFrame, id: Column, text: Column,
                        benchmark: DataFrame, benchText: Column,
                        n: Int = 5): DataFrame =
    contaminationHitsAgainst(corpus, id, text,
      benchmarkShingles(benchmark, benchText, n), n)

  /** The benchmark's distinct hashed `n`-gram set — the PRECOMPUTABLE
    * half of [[contaminationHits]]: a streaming or repeated-batch caller
    * derives it once (and pins it with localCheckpoint) instead of
    * re-shingling the eval set per micro-batch. Output: (h). */
  def benchmarkShingles(benchmark: DataFrame, text: Column,
                        n: Int): DataFrame =
    benchmark.select(explode(NearDup.hashedShingles(text, n)).as("h"))
      .distinct()

  /** [[contaminationHits]] against an already-derived
    * [[benchmarkShingles]] frame.
    *
    * PRECONDITION: `benchGrams` must be DISTINCT on `h` (as
    * [[benchmarkShingles]] guarantees). A non-distinct gram frame
    * multiplies join rows and inflates `n_hits` — harmless for callers
    * that only anti-join on the ids, wrong for anyone consuming the
    * counts. */
  def contaminationHitsAgainst(corpus: DataFrame, id: Column, text: Column,
                               benchGrams: DataFrame, n: Int): DataFrame =
    corpus.select(id.as("id"), explode(NearDup.hashedShingles(text, n)).as("h"))
      .join(broadcast(benchGrams), "h")
      // hashedShingles is distinct per doc, so count(*) = distinct shared
      // n-grams without a count(distinct) shuffle
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))

  // ---------------- token-budget sequence packing ----------------

  /** Concat-and-chunk packing assignments: documents are concatenated in
    * ascending numeric-id order into one global token stream, and the
    * stream is cut every `budget` tokens into fixed-size training
    * sequences (the standard pretraining batch layout — a document may
    * straddle a sequence boundary). For each document:
    *
    *   - `offset`    global token offset of its first token
    *   - `seq_first` sequence index holding that token (offset / budget)
    *   - `seq_pos`   position within that sequence (offset % budget)
    *   - `seq_last`  sequence index of its LAST token (empty docs:
    *                 seq_first — they occupy no tokens)
    *
    * Scale shape — the global prefix sum is the crux: a bare
    * `Window.orderBy(id)` computes it on ONE partition (the classic
    * driver-shaped scale-killer). Instead, a two-phase distributed
    * prefix sum: (1) ids are bucketed into `shards` ORDER-PRESERVING
    * ranges (boundaries from approx quantiles — boundary placement
    * affects only physical grouping, never the output: any monotone cut
    * yields the same global offsets); (2) each shard computes its local
    * exclusive cumsum under a PARTITIONED window while the per-shard
    * totals (exactly `shards` rows) are rolled into exclusive shard
    * bases and broadcast back. Every stage is O(rows/shards) per task.
    *
    * Contract: `id` must be numeric (quantile boundaries) and unique
    * (ties would make the concatenation order — hence offsets —
    * ambiguous). `nTokens` must be non-negative.
    *
    * Cost note: the quantile boundary pre-pass is an EAGER extra scan of
    * the (id, n_tokens) projection before the main plan runs — two scans
    * total. At the 100 TB shape, cache or localCheckpoint that two-column
    * projection before calling (it is ~16 bytes/row), or accept the
    * second columnar scan — boundary placement only affects physical
    * grouping, so a stale or sampled projection would even be safe for
    * the boundaries themselves. */
  def packAssignments(df: DataFrame, id: Column, nTokens: Column,
                      budget: Long, shards: Int = 32): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    require(shards > 0, "shards must be positive")
    val keyed = df.select(id.as("id"), nTokens.cast("long").as("n_tokens"))
    val bounds =
      if (shards == 1) Array.empty[Double]
      else keyed.stat.approxQuantile("id",
        (1 until shards).map(_.toDouble / shards).toArray, 0.001)
    // shard = number of boundaries strictly below id — monotone in id, so
    // (shard asc, id asc) IS global id order. One shallow higher-order
    // expression over a boundary-array literal: a folded when-chain
    // nests S-1 levels deep and overflows Catalyst's recursive converter
    // at a few hundred shards
    val shardCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.map(lit(_)): _*),
        b => col("id").cast("double") > b))
    val sharded = keyed.withColumn("shard", shardCol)
    // exactly `shards` rows: the only driver-sized structure in the plan
    val totals = sharded.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).as("shard_total"))
    val baseW = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = broadcast(totals
      .withColumn("shard_base", coalesce(sum(col("shard_total")).over(baseW), lit(0L)))
      .select(col("shard"), col("shard_base")))
    val localW = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(localW), lit(0L)))
      .join(bases, "shard")
      .withColumn("offset", col("shard_base") + col("local_off"))
      // integer DIV, not double division: long/long promotes to double,
      // and past 2^53 a k*budget-1 offset rounds UP to exactly k — an
      // off-by-one sequence index at precisely the scale this operator
      // exists for
      .withColumn("seq_first", expr(s"offset DIV ${budget}L"))
      .withColumn("seq_pos", col("offset") % budget)
      .withColumn("seq_last",
        expr(s"(offset + greatest(n_tokens, 1L) - 1) DIV ${budget}L"))
      .select(col("id"), col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_pos"), col("seq_last"))
  }

  /** WHOLE-DOCUMENT greedy packing — the no-cross-document-attention
    * alternative to [[packAssignments]]' concat-and-chunk: documents
    * are packed in ascending id order into fixed-`budget` sequences
    * and NEVER SPLIT — a document that does not fit the open sequence
    * closes it and opens a new one; a document longer than the budget
    * occupies a sequence alone (`oversize` = true — the caller
    * truncates or routes it). The layout training stacks use when
    * attention must not cross document boundaries (padding replaces
    * the split tail; the trade is the padding fraction, observable as
    * budget − max(seq_pos + n_tokens) per sequence).
    *
    * Greedy fill is a SEQUENTIAL RECURRENCE (the break position
    * depends on every prior fill — no window or prefix sum expresses
    * it), so this is the library's one legitimate per-group imperative
    * fold: ids bucket by integer range (`id DIV bucketDocs` — an
    * integer range of width B holds at most B distinct ids, so
    * per-group state is PARAMETER-bounded, never corpus-bounded), each
    * bucket's ≤ `bucketDocs` docs sort and fold in memory, and global
    * sequence ids attach via an exclusive prefix sum over the
    * O(buckets) per-bucket sequence counts (broadcast back — the
    * [[packAssignments]] two-phase discipline). Bucket boundaries
    * close the open sequence — the standard distributed-packing
    * approximation, costing at most one partial sequence per bucket,
    * and exactly what makes the layout a pure function of
    * (ids, budget, bucketDocs) that any engine replays.
    *
    * Output: (id, n_tokens, seq, seq_pos, oversize) — one row per doc;
    * `seq` is the global sequence index, `seq_pos` the doc's first
    * token slot inside it. `id` must be NON-NEGATIVE integral and
    * unique — guarded IN-PLAN and loudly: Spark's integer DIV truncates
    * toward zero while SQL engines floor, so a negative id would both
    * break the ≤ bucketDocs-per-group bound (the range around zero
    * doubles up) and diverge from any floor-division oracle replay. */
  def packWholeDocs(df: DataFrame, id: Column, nTokens: Column,
                    budget: Long, bucketDocs: Int = 4096): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    require(bucketDocs > 0, "bucketDocs must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val guardedId = when(id.cast("long") < 0L,
        raise_error(concat(lit("packWholeDocs: negative id "),
          id.cast("string"),
          lit(" — ids must be non-negative (trunc-vs-floor DIV)"))))
      .otherwise(id.cast("long"))
    val keyed = df.select(guardedId.as("id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"id DIV ${bucketDocs}L"))
    val local = keyed.select(col("id"), col("n_tokens"), col("bucket"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (bucket: Long, rows: Iterator[(Long, Long, Long)]) =>
        // ≤ bucketDocs rows by the integer-range argument: safe to sort
        // in memory; ascending id is the pinned packing order
        val docs = rows.map(r => (r._1, r._2)).toArray.sortInPlaceBy(_._1)
        var seq = -1L
        var fill = 0L
        docs.iterator.map { case (docId, n) =>
          if (seq < 0 || fill + n > budget) { seq += 1; fill = 0L }
          val pos = fill
          fill += n
          (bucket, seq, docId, n, pos, n > budget)
        }
      }
      .toDF("bucket", "local_seq", "id", "n_tokens", "seq_pos", "oversize")
    // O(id_span / bucketDocs) rows — PARAMETER-damped but still
    // CORPUS-DEPENDENT (a sparse 1e12 id span at the default bucketDocs
    // is ~244M buckets), so the numbering side carries NO strategy hint
    // (the removeRepeatedSpans convention): stats/AQE broadcast it when
    // it fits and fall back to a shuffle join when it does not. The
    // exclusive prefix sum below IS a single-partition window — the
    // accepted bound is O(buckets) rows of two longs, the same
    // one-reducer prefix-sum bound packAssignments accepts over its
    // `shards` rows; callers with astronomically sparse id spans
    // densify ids first (the negative-id guard already forces ids
    // through a cast).
    val perBucket = local.groupBy(col("bucket"))
      .agg((max(col("local_seq")) + 1L).as("n_seqs"))
    val baseW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = perBucket
      .withColumn("seq_base",
        coalesce(sum(col("n_seqs")).over(baseW), lit(0L)))
      .select(col("bucket"), col("seq_base"))
    local.join(bases, "bucket")
      .select(col("id"), col("n_tokens"),
        (col("seq_base") + col("local_seq")).as("seq"),
        col("seq_pos"), col("oversize"))
  }

  /** Materialized WHOLE-DOC sequence payloads — the training sequences
    * of the [[packWholeDocs]] layout (the [[packedTokenSequences]] twin
    * without document straddle): one row per sequence, member docs'
    * token arrays concatenated in seq_pos order, never split. An
    * oversize sequence carries its single doc's FULL token stream
    * (n_tokens > budget, `oversize` = true) — truncation is the
    * caller's policy, stated not hidden.
    *
    * Scale shape: [[packWholeDocs]]' two-phase layout, one id equi-join
    * binding token arrays to their assignments, and ONE output-bound
    * groupBy(seq) whose per-group state is bounded by `budget` tokens
    * (plus the one oversize doc case).
    *
    * Output: (seq, n_docs, n_tokens, oversize, tokens). */
  def packedWholeDocSequences(df: DataFrame, id: Column, toks: Column,
                              budget: Long,
                              bucketDocs: Int = 4096): DataFrame = {
    val docs = df.select(id.as("id"), toks.as("__toks"))
    val packed = packWholeDocs(docs, col("id"), size(col("__toks")),
        budget, bucketDocs)
      .select(col("id"), col("seq"), col("seq_pos"), col("oversize"))
    docs.join(packed, "id")
      .groupBy(col("seq"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        max(col("oversize")).as("oversize"),
        flatten(transform(
          array_sort(collect_list(struct(col("seq_pos"), col("__toks")))),
          x => x.getField("__toks"))).as("tokens"))
      .select(col("seq"), col("n_docs"),
        size(col("tokens")).cast("long").as("n_tokens"),
        col("oversize"), col("tokens"))
  }

  /** One-row efficiency report over a [[packWholeDocs]] layout — the
    * number that decides between whole-doc packing and concat-and-chunk
    * for a given corpus: every non-oversize sequence pads its unfilled
    * tail, so `padding_frac` IS the throughput tax of keeping attention
    * inside documents. Oversize sequences are excluded from padding
    * (they are truncation decisions, not padding) and reported
    * separately.
    *
    * Scale shape: one constant-state aggregation per sequence (sum +
    * max over its docs) and one global rollup — O(seqs) intermediate,
    * nothing collected.
    *
    * Output: (n_docs, n_seqs, n_oversize, packed_tokens, padded_tokens,
    * padding_frac) — fractions rounded to 6, the cross-engine
    * convention. */
  def packingEfficiency(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val perSeq = packed.groupBy(col("seq"))
      .agg(count(lit(1)).as("__docs"),
        sum(col("n_tokens")).as("__mass"),
        max(col("oversize").cast("int")).as("__over"))
    // coalesce every sum: over an EMPTY layout the group-less aggregate
    // emits one row of null sums (ADVICE r19) — the documented contract
    // is the zero counters (0, 0, 0, 0, 0, 0.0), not nulls
    perSeq.agg(
      coalesce(sum(col("__docs")), lit(0L)).cast("long").as("n_docs"),
      count(lit(1)).cast("long").as("n_seqs"),
      coalesce(sum(col("__over")), lit(0L)).cast("long").as("n_oversize"),
      coalesce(sum(col("__mass")), lit(0L)).cast("long").as("packed_tokens"),
      coalesce(sum(when(col("__over") === 0, lit(budget) - col("__mass"))
        .otherwise(lit(0L))), lit(0L)).cast("long").as("padded_tokens"))
      .select(col("n_docs"), col("n_seqs"), col("n_oversize"),
        col("packed_tokens"), col("padded_tokens"),
        when((col("n_seqs") - col("n_oversize")) === 0, lit(0.0d))
          .otherwise(round(col("padded_tokens").cast("double") /
            ((col("n_seqs") - col("n_oversize")).cast("double") * budget), 6)
            + lit(0.0d))
          .as("padding_frac"))
  }

  /** Per-(sequence, document) slice rows of a [[packWholeDocs]] layout
    * — [[sequenceRows]]' twin for the no-cross-attention layout (r19
    * verdict task 4: the whole-doc path now reaches [[writeShards]]'
    * physical artifact exactly like concat-and-chunk does). A document
    * is never split here, so the frame is a pure PROJECTION of the
    * layout: exactly one row per token-bearing document, `slice_start`
    * 0, `slice_len` the doc's full token count, `seq_pos` its slot.
    * Token-less documents are dropped (they contribute no slice — the
    * [[sequenceRows]] contract); an oversize sequence carries its
    * single doc's full stream (truncation is the caller's policy,
    * stated not hidden). Output: (seq, id, slice_start, slice_len,
    * seq_pos) — [[writeShards]]' input contract, token column
    * `slice_len`. */
  def wholeDocSequenceRows(packed: DataFrame): DataFrame =
    packed.where(col("n_tokens") > 0)
      .select(col("seq"), col("id"), lit(0L).as("slice_start"),
        col("n_tokens").as("slice_len"), col("seq_pos"))

  // ---------------- training-shard sink ----------------

  /** Per-(sequence, document) slice rows from a [[packAssignments]]
    * frame — the materialized layout of the packed token stream: one
    * row for every (training sequence, contributing document) pair,
    * with the document-relative slice it contributes.
    *
    *   - `seq`         sequence index
    *   - `id`          contributing document
    *   - `slice_start` first contributed token, document-relative
    *   - `slice_len`   tokens contributed to THIS sequence
    *   - `seq_pos`     where the slice lands inside the sequence
    *
    * Token-less documents are dropped (they contribute no slice).
    * Scale shape: a pure projection + explode whose fan-out is
    * output-bound — each document yields exactly its spanned-sequence
    * count (n_tokens/budget + at most 2), never a cross join. */
  def sequenceRows(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    packed.where(col("n_tokens") > 0)
      .select(col("id"), col("n_tokens"), col("offset"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .withColumn("__start", greatest(col("offset"), col("seq") * budget))
      .withColumn("__end",
        least(col("offset") + col("n_tokens"), (col("seq") + 1) * budget))
      .select(col("seq"), col("id"),
        (col("__start") - col("offset")).as("slice_start"),
        (col("__end") - col("__start")).as("slice_len"),
        (col("__start") - col("seq") * budget).as("seq_pos"))
  }

  /** Packed sequence PAYLOADS — the materialized training sequences
    * themselves, not just assignments: given per-document token ARRAYS
    * (whitespace tokens, or [[BpeTokenizer.encodedTokens]] subwords),
    * concatenate in ascending id order and cut every `budget` tokens:
    * one row per training sequence, with its tokens in stream order.
    *
    *   - `seq`      sequence index
    *   - `n_tokens` tokens in this sequence (= budget except the last)
    *   - `tokens`   the token array, in global stream order
    *
    * Scale shape: offsets come from [[packAssignments]]'s two-phase
    * prefix sum (never a global window); the token explode is
    * output-bound (one row per corpus token — the volume a sequence
    * writer necessarily materializes); assembly is ONE shuffle keyed by
    * the high-cardinality `seq`, and per-sequence state is bounded by
    * `budget` tokens. `toks` must not be null (empty arrays are fine —
    * they occupy no tokens and appear in no sequence). */
  def packedTokenSequences(df: DataFrame, id: Column, toks: Column,
                           budget: Long, shards: Int = 32): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val docs = df.select(id.as("id"), toks.as("__toks"))
    val offsets = packAssignments(docs, col("id"), size(col("__toks")),
        budget, shards)
      .select(col("id"), col("offset"))
    docs.join(offsets, "id")
      .select(col("id"), col("offset"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .withColumn("__g", col("offset") + col("__pos"))
      .withColumn("seq", expr(s"__g DIV ${budget}L"))
      .withColumn("__spos", col("__g") % budget)
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_tokens"),
        transform(array_sort(collect_list(struct(col("__spos"), col("__tok")))),
          x => x.getField("__tok")).as("tokens"))
  }

  /** The LAST MILE of the packing pipeline: write [[sequenceRows]] as
    * fixed-size Parquet training shards and return the per-shard
    * manifest. Shard assignment is deterministic arithmetic — shard =
    * seq DIV `seqsPerShard` — so every shard except the last holds
    * exactly `seqsPerShard` training sequences, re-runs place every row
    * identically, and any engine recomputes the layout from the ids
    * alone (no stored assignment).
    *
    * Layout: parquet files under `outDir/shard=N`, rows sorted by (seq, id)
    * within files, file row counts capped by `maxRecordsPerFile` (the
    * reader-side memory bound). The manifest — (shard, n_rows, n_seqs,
    * n_tokens), written to `outDir/_graft_manifest` as parquet — is
    * aggregated from the WRITTEN files, not the input plan: the sink is
    * the ground truth a training job consumes.
    *
    * Scale shape: one range-shuffle on the monotone shard key (range
    * partitioning keeps shards contiguous, so a shard's files land in
    * one task and maxRecordsPerFile splits locally), a local sort, and
    * a manifest aggregation over the written data. The manifest is
    * O(#shards) rows and stays distributed end-to-end. */
  def writeShards(seqRows: DataFrame, outDir: String, seqsPerShard: Int,
                  maxRecordsPerFile: Int = 1 << 20,
                  tokenCol: String = "slice_len"): DataFrame = {
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    // fail BEFORE the write, not in the manifest aggregation after the
    // full range-shuffle + parquet encode already ran
    require(seqRows.columns.contains("seq"),
      "writeShards input needs a 'seq' column")
    require(seqRows.columns.contains(tokenCol),
      s"writeShards token column '$tokenCol' is not in the input " +
        s"(payload frames pass tokenCol = \"n_tokens\")")
    // a [[sequenceRows]] frame sorts within (seq) by the contributing
    // doc id; a [[packedTokenSequences]] payload frame (one row per
    // sequence) has no id — seq alone is already a total order there
    val tieBreak =
      if (seqRows.columns.contains("id")) Seq(col("seq"), col("id"))
      else Seq(col("seq"))
    seqRows
      .withColumn("shard", expr(s"seq DIV ${seqsPerShard}L"))
      .repartitionByRange(col("shard"))
      .sortWithinPartitions(col("shard") +: tieBreak: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard")
      .parquet(outDir)
    val manifest = seqRows.sparkSession.read.parquet(outDir)
      // the partition column reads back as its narrowest inferred type;
      // pin long so the manifest schema is run-invariant
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("seq")).as("n_seqs"),
        sum(col(tokenCol)).as("n_tokens"))
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_graft_manifest")
    manifest
  }

  // ---------------- repeated-span REMOVAL ----------------

  /** Remove corpus-repeated spans from every document — the MUTATING
    * twin of [[boilerplateFraction]] (which only scores): any token
    * covered by a word `n`-gram occurring in at least `minDocFreq`
    * DISTINCT documents is dropped, and the remaining tokens reassemble
    * in order (the RefinedWeb/MassiveText repeated-span dedup shape —
    * navigation chrome and license headers vanish from every document
    * at once, instead of whole documents being kept or dropped).
    *
    * Exact semantics (pinned for the SQL oracle): tokens are the
    * normalized [[TextAnalysis.tokens]] stream (clean_text is therefore
    * whitespace-and-case normalized); gram starts are 0-based; token
    * position p is covered iff some common gram starts in
    * (p-n, p]; documents shorter than `n` tokens have no grams and pass
    * through unchanged; a fully-covered document yields an EMPTY
    * clean_text (n_kept 0) rather than disappearing — the caller
    * decides whether empty husks are dropped.
    *
    * Scale shape — LINEAR in corpus tokens, honestly counted: two
    * tokenize scans of the text (one for positional grams via the
    * [[ngrams]] JIT kernel, one for the token stream — the same
    * two-scan budget as [[boilerplateFraction]]); the common-gram set
    * is CORPUS-DEPENDENT (the df >= minDocFreq cut bounds it by
    * G/minDocFreq with G the total gram occurrences — which still
    * grows linearly with the corpus, so it is NOT broadcast-safe at
    * every scale) and joins back with no strategy hint, the
    * [[removeCommonLines]]/[[removeCommonParagraphs]] convention:
    * stats/AQE pick broadcast when it fits and a shuffle join when it
    * does not; coverage is ONE per-document ROWS window over dense
    * positions (max of the common flag over the trailing n-1 rows —
    * the [[removeDuplicatedSubstrings]] shape, round 21: the previous
    * formulation exploded each common start into n covered positions,
    * ran a DISTINCT over that n-amplified frame, and dropped tokens
    * via an (id, position) anti-join — three shuffles of the corpus'
    * covered mass where the window needs one pass over (id, p, flag)
    * rows with ZERO amplification; measured 3.4 s → 2.x s at sf0.1
    * with the output hash unchanged).
    * TEXT NEVER RIDES THE SHUFFLES (round 19, the substring-dedup
    * discipline): every joined/aggregated row is (id, position, hash)
    * narrow — token positions come from the padded positional
    * posexplode, not a token explode — and reassembly
    * element_at-indexes the surviving positions into the document's
    * own token array, so the corpus text crosses exactly ONE shuffle,
    * packed as one array per document in the final id join. Nothing
    * corpus-sized is collected.
    *
    * Output: (id, n_kept, n_removed, clean_text). */
  def removeRepeatedSpans(df: DataFrame, id: Column, text: Column,
                          n: Int = 4, minDocFreq: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    require(minDocFreq >= 2, "minDocFreq must be at least 2")
    val base = df.select(id.as("id"), TextAnalysis.tokens(text).as("__t"),
      ngrams(text, n).as("__g"))
    // positional gram rows padded to TOKEN length: position p carries
    // the gram STARTING at p (ngrams keeps every occurrence in order,
    // so the array index IS the 0-based start), null for the trailing
    // n-1 positions where no gram starts. The hash runs per ROW after
    // the explode (codegen; a transform(...) lambda would evaluate the
    // md5 interpreted per element) and a null gram yields a null hash,
    // which never matches the common-set equi-join below. The gram
    // string never crosses a shuffle — it is projected away here.
    val occ = base.select(col("id"),
        posexplode(slice(
          concat(col("__g"), array_repeat(lit(null).cast("string"), n - 1)),
          lit(1), size(col("__t")))).as(Seq("p", "gram")))
      .select(col("id"), col("p"), NearDup.seededHash(0, col("gram")).as("h"))
    val common = occ.where(col("h").isNotNull)
      .select(col("id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("h"), lit(1).as("__dup"))
    // position p is covered iff a common gram starts in (p-n, p]:
    // positions are dense, so a trailing ROWS window over the common
    // flag covers the union of overlapping spans in one pass
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(-(n - 1), 0)
    val keptPos = occ.join(common, Seq("h"), "left")
      .withColumn("__cov", max(coalesce(col("__dup"), lit(0))).over(win))
      .where(col("__cov") === 0)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("p"))).as("__kp"))
    base.select(col("id"), col("__t"), size(col("__t")).as("__n"))
      .join(keptPos, Seq("id"), "left") // fully-covered docs: empty husk
      .withColumn("__kp",
        coalesce(col("__kp"), array().cast("array<int>")))
      .select(col("id"),
        size(col("__kp")).cast("long").as("n_kept"),
        (col("__n") - size(col("__kp"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(col("__kp"), p => element_at(col("__t"), p + lit(1))))
          .as("clean_text"))
  }

  /** Substring-level exact dedup — the ExactSubstr rung of the dedup
    * ladder (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): any token inside a substring of at least
    * `minLen` tokens that occurs MORE THAN ONCE anywhere in the corpus
    * (a second document OR a second position in the same document) is
    * dropped. This is what [[removeRepeatedSpans]] cannot express: its
    * doc-frequency threshold needs a span common to >= minDocFreq
    * documents, while a 500-token passage pasted into exactly TWO
    * documents — the normal shape of real web duplication — sails
    * through; here occurrence count 2 is the trigger and `minLen` (the
    * paper's 50 tokens) is what keeps coincidental overlap out.
    *
    * Exact semantics (pinned for the SQL oracle): windows are the
    * `minLen`-token contiguous [[ngrams]] of the pinned token stream,
    * identified by the md5 of the space-joined window (tokens contain
    * no whitespace, so the join is unambiguous; 128 bits makes a false
    * collision astronomically unlikely — the honest delta vs the
    * paper's byte-exact suffix array). A window is DUPLICATED when its
    * md5 occurs >= 2 times corpus-wide, occurrences counted, not
    * documents. Token position p is covered iff some duplicated window
    * starts in (p - minLen, p] — equivalently, iff p lies inside SOME
    * duplicated substring of length >= minLen: every window fully
    * inside a duplicated passage is itself duplicated, so window
    * coverage IS substring coverage, with no explicit outward-extension
    * step. Documents shorter than `minLen` tokens have no windows and
    * pass through; a fully-duplicated document leaves an empty husk
    * (n_kept 0), the caller's call to drop.
    *
    * Scale shape — linear in corpus tokens, no candidate-pair stage at
    * all, and TEXT NEVER RIDES THE WIDE SHUFFLES: one tokenize scan
    * materializes positional window digests (each window pays an
    * O(minLen) md5 — the same O(n·k) the paper spends building its
    * suffix array; digests travel as 16-byte BINARY, not 32-char hex);
    * ONE shuffle on the digest counts occurrences (map-side partials);
    * duplicated digests join back on the digest key over NARROW
    * (id, p, h) rows (no broadcast hint — the duplicated-window set is
    * corpus-dependent; AQE picks); coverage is ONE per-document ROWS
    * window over dense positions (max of the duplicated flag over the
    * trailing minLen-1 rows — ZERO amplification, unlike exploding each
    * duplicated start into minLen covered positions, which would
    * rewrite the corpus' entire duplicated mass x minLen through a
    * shuffle) carrying only (id, p, flag); reassembly indexes the
    * surviving POSITIONS into the document's own token array
    * (element_at — O(kept) per doc), so the corpus text crosses exactly
    * ONE shuffle, packed as one array per document in the final id
    * join. (The previous formulation shipped every token as its own row
    * through BOTH the digest join and the coverage window — under the
    * all-duplicated 10x stress shape those two wide sorts spilled and
    * the driver bench read 26.5x vs the x15 near-linear bound.)
    * Nothing corpus-sized is collected.
    *
    * Output: (id, n_kept, n_removed, clean_text) — [[removeCommonLines]]'
    * contract at token granularity (clean_text is whitespace-and-case
    * normalized by the token stream, the [[removeRepeatedSpans]]
    * precedent). */
  def removeDuplicatedSubstrings(df: DataFrame, id: Column, text: Column,
                                 minLen: Int = 50): DataFrame = {
    require(minLen >= 2, "minLen must be at least 2 tokens")
    val base = df.select(id.as("id"), TextAnalysis.tokens(text).as("__t"),
      transform(ngrams(text, minLen), g => unhex(md5(g))).as("__w"))
    // positional digest rows padded to TOKEN length: position p carries
    // its window digest for p <= n - minLen, null for the trailing
    // minLen-1 positions (no window starts there; slice handles the
    // shorter-than-minLen doc, whose window array is empty). Tokens
    // deliberately do NOT ride these rows.
    val occ = base.select(col("id"),
        posexplode(slice(
          concat(col("__w"),
            array_repeat(lit(null).cast("binary"), minLen - 1)),
          lit(1), size(col("__t")))).as(Seq("p", "h")))
    val dup = occ.where(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2)
      .select(col("h"), lit(1).as("__dup"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(-(minLen - 1), 0) // positions are dense: ROWS = RANGE
    val keptPos = occ.join(dup, Seq("h"), "left")
      .withColumn("__cov", max(coalesce(col("__dup"), lit(0))).over(win))
      .where(col("__cov") === 0)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("p"))).as("__kp"))
    base.select(col("id"), col("__t"), size(col("__t")).as("__n"))
      .join(keptPos, Seq("id"), "left") // fully-duplicated docs: empty husk
      .withColumn("__kp",
        coalesce(col("__kp"), array().cast("array<int>")))
      .select(col("id"),
        size(col("__kp")).cast("long").as("n_kept"),
        (col("__n") - size(col("__kp"))).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(col("__kp"), p => element_at(col("__t"), p + lit(1))))
          .as("clean_text"))
  }

  /** LINE-level boilerplate removal — the CCNet/RefinedWeb pass that
    * [[removeRepeatedSpans]]'s token-window twin cannot express: whole
    * LINES (nav bars, cookie banners, footers — the structure
    * [[HtmlExtract]] emits as newline-separated blocks) that recur in
    * at least `minDocFreq` distinct documents vanish; surviving lines
    * reassemble in order, joined by newlines. Line identity is the
    * seeded md5 hash of the line with LEADING/TRAILING WHITESPACE of
    * the pinned class stripped — spaces, tabs, AND carriage returns,
    * so a CRLF crawl and an LF crawl of the same boilerplate hash
    * identically (plain `trim` strips spaces only and would let a
    * `\r`-suffixed copy escape removal). BLANK lines (whitespace-only)
    * are exempt from commonality entirely — the CCNet/RefinedWeb
    * convention: two documents that both contain an empty line must
    * not turn every paragraph boundary in the corpus into
    * "boilerplate". A SQL oracle replays every stage.
    *
    * Scale shape: one shuffle on the 60-bit line hash for the
    * distinct-doc frequency, one hash equi-join back (no broadcast
    * hint — the common-line set is corpus-dependent; AQE picks the
    * strategy), one reassembly aggregation keyed by document. TEXT
    * NEVER RIDES THE SHUFFLES (round 19): the anti-join and the
    * reassembly aggregation carry narrow (id, position, hash) rows,
    * and surviving positions element_at-index back into the document's
    * own line array — the corpus text crosses exactly ONE shuffle,
    * packed per document in the final id join. A doc whose every line
    * is boilerplate survives as an empty husk (n_kept = 0) — the
    * caller's call to drop.
    *
    * Output: (id, n_kept, n_removed, clean_text). */
  def removeCommonLines(df: DataFrame, id: Column, text: Column,
                        minDocFreq: Int = 2): DataFrame =
    removeCommonUnits(df, id, split(text, "\n"), minDocFreq, "\n")

  /** Shared narrow-row unit-removal core of [[removeCommonLines]]
    * (units = lines) and [[removeCommonParagraphs]] (units =
    * paragraphs): drop units whose pinned-whitespace-trimmed content
    * recurs in >= minDocFreq distinct documents, reassemble survivors
    * in order joined by `sep`. Blank units are commonality-exempt
    * (null hash never matches the anti-join). */
  private def removeCommonUnits(df: DataFrame, id: Column, units: Column,
                                minDocFreq: Int, sep: String): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq must be at least 2")
    val ws = graft.functions.TextHash.WsClassJava
    val base = df.select(id.as("id"), units.as("__l"))
    // narrow (id, p, h) rows: the unit string exists only transiently
    // inside the hash projection, never in a shuffled row
    val occ = base.select(col("id"),
        posexplode(col("__l")).as(Seq("p", "line")))
      .withColumn("__t", regexp_replace(col("line"), s"^$ws+|$ws+$$", ""))
      .select(col("id"), col("p"),
        when(col("__t") === "", lit(null).cast("long"))   // blank: exempt
          .otherwise(NearDup.seededHash(0, col("__t"))).as("h"))
    val common = occ.where(col("h").isNotNull)
      .select(col("id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("h"))
    // null hashes (blank units) never match in the anti-join: kept
    val keptPos = occ.join(common, Seq("h"), "left_anti")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("p"))).as("__kp"))
    base.select(col("id"), col("__l"), size(col("__l")).as("__n"))
      .join(keptPos, Seq("id"), "left")
      .withColumn("__kp",
        coalesce(col("__kp"), array().cast("array<int>")))
      .select(col("id"),
        size(col("__kp")).cast("long").as("n_kept"),
        (col("__n") - size(col("__kp"))).cast("long").as("n_removed"),
        concat_ws(sep,
          transform(col("__kp"), p => element_at(col("__l"), p + lit(1))))
          .as("clean_text"))
  }

  /** PARAGRAPH-level corpus dedup — CCNet's step 1 (Wenzek et al. 2020
    * §4.2: deduplicate at paragraph granularity against the corpus
    * BEFORE perplexity filtering — boilerplate shared across pages is
    * exactly what an LM scores as fluent): drop every paragraph whose
    * trim-normalized content recurs in at least `minDocFreq` DISTINCT
    * documents, reassemble the survivors in original order.
    *
    * The paragraph contract (pinned, both engines): paragraphs split on
    * runs of >= 2 literal newlines (`\n{2,}` — a "blank" line that
    * contains spaces is part of its paragraph, not a separator, which
    * keeps the class Java/RE2-portable), identity is the pinned-
    * whitespace-class trim of the paragraph ([[removeCommonLines]]'
    * convention — no case folding: dedup must not merge paragraphs an
    * LM would score differently), whitespace-only paragraphs are exempt
    * from commonality, and reassembly joins with the CANONICAL '\n\n'
    * (a 3-newline separator normalizes on output).
    *
    * Scale shape: identical to [[removeCommonLines]] — one shuffle on
    * the 60-bit paragraph hash for the distinct-doc frequency, one hash
    * equi-join back, one reassembly aggregation keyed by document.
    * Strictly cheaper than the line pass (fewer, larger units).
    *
    * Output: (id, n_kept, n_removed, clean_text). */
  def removeCommonParagraphs(df: DataFrame, id: Column, text: Column,
                             minDocFreq: Int = 2): DataFrame =
    removeCommonUnits(df, id, split(text, "\n{2,}"), minDocFreq, "\n\n")

  // ---------------- C4 cleaning rules ----------------

  /** "Sentence" for the C4 minimum-sentence rule: a maximal run of
    * non-terminal characters followed by at least ONE terminal mark
    * (the [[TextChunker.SentencePattern]] with the trailing `*`
    * tightened to `+` — a fragment with no terminal punctuation is not
    * a sentence under this rule). Java-regex == RE2 semantics. */
  val C4SentencePattern = "[^.!?]+[.!?]+"

  /** Neutral default stand-in for the rule-4 word list: the published
    * pipeline uses the externally-maintained "List of Dirty, Naughty,
    * Obscene..." blocklist, which a deployment passes in verbatim; the
    * operator's contract only needs SOME pinned list. Matching is
    * whole-TOKEN over the pinned tokenizer (substring matching is the
    * classic over-blocking bug). */
  val DefaultC4Blocklist: Seq[String] = Seq("nsfw", "xxx")

  /** Rule constants (the published values), the ONE home the SQL twin
    * is generated from. */
  val DefaultC4MinSentences = 5
  val DefaultC4MinLineWords = 3

  /** The C4 cleaning heuristics (Raffel et al. 2020 §2.2 — the other
    * canonical published filter set beside the Gopher panel), pinned:
    *
    *   - LINE filters (lines split on '\n', identity = the pinned
    *     whitespace-class trim): keep a line iff it ends in a terminal
    *     punctuation mark ('.', '!', '?', or a closing '"'), carries at
    *     least `minLineWords` tokens, and does not contain the word
    *     "javascript" (case-insensitive, the paper's rule 4);
    *   - PAGE flags, computed on the ORIGINAL text: `has_lorem`
    *     ("lorem ipsum", case-insensitive), `has_brace` (any '{'),
    *     `has_blocked` (any pinned-tokenizer TOKEN in `blocklist`);
    *   - `n_sentences` counts [[C4SentencePattern]] matches over the
    *     CLEANED text (the retained lines joined by '\n' — a page
    *     whose sentences all lived in dropped boilerplate lines fails
    *     the rule, which is the rule's point);
    *   - `passes` = n_sentences >= `minSentences` and none of the
    *     three page flags.
    *
    * Scale shape: a pure projection — one line split, per-line token
    * counts, a few regex containment checks; zero shuffles, zero
    * joins, scan-cost at any corpus size (the Gopher-panel shape).
    *
    * Output: (id, n_lines, n_lines_kept, n_sentences, has_lorem,
    * has_brace, has_blocked, passes, clean_text) — flags and passes as
    * 0/1 longs, the cross-engine column convention. */
  def c4Clean(df: DataFrame, id: Column, text: Column,
              minSentences: Int = DefaultC4MinSentences,
              minLineWords: Int = DefaultC4MinLineWords,
              blocklist: Seq[String] = DefaultC4Blocklist): DataFrame = {
    require(minSentences >= 0, "minSentences must be >= 0")
    require(minLineWords >= 1, "minLineWords must be >= 1")
    require(blocklist.nonEmpty, "blocklist must be non-empty")
    val ws = graft.functions.TextHash.WsClassJava
    val kept = filter(split(text, "\n"), l => {
      val t = regexp_replace(l, s"^$ws+|$ws+$$", "")
      t.rlike("[.!?\"]$") &&
        size(TextAnalysis.tokens(t)) >= minLineWords &&
        !lower(t).contains("javascript")
    })
    val clean = concat_ws("\n", kept)
    df.select(id.as("id"), text.as("__x"), kept.as("__k"), clean.as("__c"))
      .select(
        col("id"),
        size(split(col("__x"), "\n")).cast("long").as("n_lines"),
        size(col("__k")).cast("long").as("n_lines_kept"),
        size(regexp_extract_all(col("__c"), lit(C4SentencePattern), lit(0)))
          .cast("long").as("n_sentences"),
        lower(col("__x")).contains("lorem ipsum").cast("long").as("has_lorem"),
        col("__x").contains("{").cast("long").as("has_brace"),
        (size(array_intersect(array_distinct(TextAnalysis.tokens(col("__x"))),
          array(blocklist.map(lit): _*))) > 0).cast("long").as("has_blocked"),
        col("__c").as("clean_text"))
      .withColumn("passes",
        (col("n_sentences") >= minSentences && col("has_lorem") === 0L &&
          col("has_brace") === 0L && col("has_blocked") === 0L).cast("long"))
      .select(col("id"), col("n_lines"), col("n_lines_kept"),
        col("n_sentences"), col("has_lorem"), col("has_brace"),
        col("has_blocked"), col("passes"), col("clean_text"))
  }

  // ---------------- quality + repetition gate ----------------

  /** The shared quality/repetition gate of the curation compositions —
    * ONE home for the semantics (`VectorEngine.curateAndIngest` and
    * `StreamingIngest.ingestCurationGatedBatch` both call it, so the
    * batch and streaming paths cannot drift): keep rows whose
    * [[TextAnalysis.qualityScore]] over `textCol`'s tokens is at least
    * `qualityMin` AND whose bigram dup_ngram_frac
    * ([[repetitionStats]]; rows too short for bigrams pass) is at most
    * `maxDupNgramFrac`. The DEFAULTS return the input frame untouched —
    * no projection, no join — so pass-through callers pay nothing.
    * `df` must carry an `id` column (the repetition join key). */
  def qualityRepetitionGate(df: DataFrame, textCol: Column,
                            qualityMin: Double,
                            maxDupNgramFrac: Double): DataFrame =
    if (qualityMin <= 0.0 && maxDupNgramFrac >= 1.0) df
    else {
      val toks = TextAnalysis.tokens(textCol)
      val rep = repetitionStats(df, col("id"), textCol, n = 2)
        .select(col("id"), col("dup_ngram_frac"))
      df.where(TextAnalysis.qualityScore(toks) >= qualityMin)
        .join(rep, Seq("id"), "left")
        .where(coalesce(col("dup_ngram_frac"), lit(0.0d)) <= maxDupNgramFrac)
        .drop("dup_ngram_frac")
    }

  // ---------------- deterministic split assignment ----------------

  /** Stable hash bucket in [0, buckets): the first 8 hex chars of
    * md5(salt + id). md5 (not Spark's murmur `hash()`) so the assignment
    * is engine-portable — any system holding the id reproduces it
    * without Spark (the DuckDB twin is
    * `('0x' || substr(md5('<salt>' || id::VARCHAR), 1, 8))::BIGINT %
    * buckets`).
    *
    * The SALT is load-bearing: every deterministic-selection operator
    * here derives randomness from this hash, and two stages salted
    * identically are perfectly correlated, not independent — e.g. an
    * unsalted mixture filter at keep-rate r ≤ 90/10⁶ followed by an
    * unsalted 90/5/5 split would leave val and test EMPTY (the
    * survivors' buckets are exactly the low ones the split labels
    * 'train'). Each operator passes its own purpose salt, restoring
    * pairwise independence of composed stages. */
  def hashBucket(salt: String, id: Column, buckets: Long): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** [[hashBucket]] under the split salt ("split:"). */
  def splitBucket(id: Column, buckets: Int = 100): Column =
    hashBucket("split:", id, buckets.toLong)

  /** Deterministic train/val/test label from the id alone — membership is
    * a pure function of the id, so re-runs, backfills, and other engines
    * agree row-by-row with no stored assignment table, and new documents
    * never reshuffle old ones (the property random-split lacks).
    * `trainPct` + `valPct` must leave room for test. */
  def assignSplit(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "split percentages must partition [0, 100)")
    val b = splitBucket(id, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  // ---------------- mixture rebalancing ----------------

  /** Deterministic down-sampling to a TARGET DOMAIN MIXTURE: given desired
    * proportions per group value (web/books/code/…), keep the largest
    * corpus whose group shares match `targets`, selecting rows by the
    * same md5-bucket rule as [[assignSplit]] so membership is a pure
    * function of (id, targets) — re-runs agree row-by-row and no
    * assignment table exists.
    *
    * The feasible cap is min over targeted groups of n_g / target_g
    * (the binding group keeps everything — its rate is within one
    * bucket of 1.0: t·cap/n is computed in floating point, so a
    * non-dyadic target can land 1 ulp below 1 and floor(rate·buckets)
    * then excludes the single topmost bucket, dropping ~1/buckets of
    * the binding group; the SQL oracle shares the identical IEEE
    * arithmetic, so selections still agree row-by-row); each group g
    * then keeps rows with bucket < floor(rate_g · buckets), giving
    * E[kept_g] = target_g · cap. Groups absent from `targets` are
    * dropped (target 0). Hash-threshold selection is approximate in
    * COUNT (binomial around the target share) but exact in RULE — the
    * property that matters for reproducibility and for the SQL oracle.
    *
    * Scale shape: one tiny groupBy-count (G rows — the only aggregated
    * state), rates derived in-plan and broadcast-joined back, then a
    * stateless filter on the scan. The corpus is read once and never
    * repartitioned. A targeted group with ZERO corpus rows throws
    * loudly at execution (in-plan guard): silently ignoring it would
    * un-constrain the cap and ship a mixture nothing like the request
    * (the documented formula gives cap 0 — an empty result — not
    * "rebalance among whatever is present"). */
  def mixtureSample(df: DataFrame, id: Column, group: Column,
                    targets: Map[String, Double],
                    buckets: Int = 1000000): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive proportions")
    val targetCol = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (g, t)) => when(col("__grp") === g, lit(t)).otherwise(acc)
    }
    val counts = df.select(group.as("__grp"))
      .groupBy(col("__grp")).agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__target", targetCol)
      .where(col("__target").isNotNull)
    val cap = counts
      .agg(min(col("__n") / col("__target")).as("__cap"),
        count(lit(1)).as("__present"))
      .select(when(col("__present") =!= targets.size,
          raise_error(lit("mixtureSample: a targeted group has no corpus " +
            "rows — the requested mixture is infeasible")))
        .otherwise(col("__cap")).as("__cap"))
    val rates = counts.crossJoin(cap)
      .select(col("__grp"),
        least(lit(1.0d), col("__target") * col("__cap") / col("__n"))
          .as("__rate"))
    df.withColumn("__grp", group)
      .join(broadcast(rates), "__grp")
      .where(hashBucket("mix:", id, buckets.toLong) <
        floor(col("__rate") * buckets))
      .drop("__grp", "__rate")
  }

  /** Temperature-scaled mixture sampling — the multilingual-LM practice
    * (Conneau & Lample 2019 XLM eq. 1; mC4/mT5): derive the target
    * proportions from the corpus itself as q_g = p_g^alpha / Z with
    * p_g the group's corpus share and alpha in (0, 1] flattening the head
    * so low-resource groups are upsampled relative to their raw share.
    * The materialized sample is then the LARGEST deterministic subset
    * honoring q (the [[mixtureSample]] cap/rate rule: cap = min_g
    * n_g / q_g, rate_g = q_g * cap / n_g, keep by md5 id bucket under the
    * dedicated "mixt:" salt). Rows whose group is NULL are excluded from
    * the model UP FRONT — counts, total, Z, and cap see only groups whose
    * rows can actually be kept (the final equi-join drops null keys
    * regardless, so counting them would distort the delivered mixture vs
    * the documented q ∝ p^alpha formula, and a large null group could
    * even become the binding cap).
    *
    * Fully in-plan — counts, the alpha power, normalization, cap, and
    * rates are one G-row aggregate broadcast back; no driver math, so a
    * SQL oracle replays everything. Cross-engine float discipline: p_g
    * and every later step are single IEEE divisions/multiplications
    * (bit-deterministic in any engine); the two spots where engines
    * could drift — the libm `pow` and the sum order of Z — are pinned by
    * rounding p_g^alpha to 12 decimals and folding Z in group order.
    * alpha = 1 means the corpus already IS the mixture: every group's
    * rate computes to 1.0 up to one ulp — for non-dyadic shares
    * q * (n/q) / n can round one ulp UNDER 1.0, in which case
    * floor(rate * buckets) shaves the single top md5 bucket (~1/buckets
    * of the group), the same one-bucket flooring hazard
    * [[mixtureSample]] has always documented. alpha -> 0 approaches the
    * uniform mixture. */
  def temperatureMixture(df: DataFrame, id: Column, group: Column,
                         alpha: Double, buckets: Int = 1000000): DataFrame = {
    require(alpha > 0.0d && alpha <= 1.0d, "alpha must be in (0, 1]")
    require(buckets > 0, "buckets must be positive")
    val counts = df.select(group.as("__grp"))
      .where(col("__grp").isNotNull)
      .groupBy(col("__grp")).agg(count(lit(1)).cast("double").as("__n"))
    // corpus total: an exact integer sum in double (order-independent)
    val tot = counts.agg(sum(col("__n")).as("__tot"))
    val pw = counts.crossJoin(broadcast(tot))
      .select(col("__grp"), col("__n"),
        round(pow(col("__n") / col("__tot"), lit(alpha)), 12).as("__pa"))
    // Z folded in group order — a plain SUM's order drifts in the last ulp
    val z = pw.agg(aggregate(
      transform(array_sort(collect_list(struct(col("__grp"), col("__pa")))),
        x => x.getField("__pa")),
      lit(0.0d), (acc, x) => acc + x).as("__z"))
    val q = pw.crossJoin(broadcast(z))
      .select(col("__grp"), col("__n"), (col("__pa") / col("__z")).as("__q"))
    val cap = q.agg(min(col("__n") / col("__q")).as("__cap"))
    val rates = q.crossJoin(broadcast(cap))
      .select(col("__grp"),
        least(lit(1.0d), col("__q") * col("__cap") / col("__n")).as("__rate"))
    df.withColumn("__grp", group)
      .join(broadcast(rates), "__grp")
      .where(hashBucket("mixt:", id, buckets.toLong) <
        floor(col("__rate") * buckets))
      .drop("__grp", "__rate")
  }

  /** Data-constrained token-budget PLAN (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": repeating data up to
    * ~4 epochs costs almost nothing vs fresh tokens, and returns decay
    * rapidly beyond — so a budget allocator caps per-group repetition
    * rather than letting a small high-priority source loop forever):
    * given a total token `budget`, desired per-group shares `targets`,
    * and a per-row token count, emit ONE PLANNING ROW PER TARGET GROUP:
    *
    *   - `n_docs`, `avail_tokens` — the group's corpus mass,
    *   - `quota_tokens` — share × budget (what the mixture wants),
    *   - `epochs` — min(maxEpochs, quota / avail): how many passes over
    *     the group the budget buys, clipped at the published utility
    *     cliff,
    *   - `alloc_tokens` — round(avail × epochs): what the plan actually
    *     delivers,
    *   - `shortfall_tokens` — quota − alloc (> 0 iff the epoch cap
    *     binds: the group is too small for its share and the trainer
    *     must re-weight or backfill from elsewhere).
    *
    * Groups absent from `targets` are dropped (untargeted sources),
    * like [[mixtureSample]]. Cross-engine float discipline: quota and
    * epochs are single IEEE multiply/divides rounded to 6; alloc is a
    * round-to-long of one product — every step replays bit-exactly in
    * the SQL oracle.
    *
    * Scale shape: one groupBy with CONSTANT aggregation state (count +
    * long sum), a broadcast literal target table, pure projections
    * after — the plan output is O(groups) rows, broadcast material for
    * the sampler that consumes it. */
  def tokenBudgetPlan(df: DataFrame, group: Column, tokens: Column,
                      budget: Long, targets: Map[String, Double],
                      maxEpochs: Double): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(maxEpochs > 0.0d, "maxEpochs must be positive")
    require(targets.nonEmpty && targets.values.forall(_ > 0.0d),
      "targets must be non-empty with positive shares")
    val spark = df.sparkSession
    val tgt = broadcast(
      spark.createDataFrame(targets.toSeq.sortBy(_._1))
        .toDF("__grp", "__share"))
    df.select(group.as("__grp"), tokens.cast("long").as("__tok"))
      .where(col("__grp").isNotNull)
      .groupBy(col("__grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("avail_tokens"))
      .join(tgt, "__grp")
      .select(col("__grp").as("group"), col("n_docs"), col("avail_tokens"),
        round(col("__share") * budget, 6).as("quota_tokens"),
        (least(lit(maxEpochs),
          round(col("__share") * budget /
            col("avail_tokens").cast("double"), 6)) + lit(0.0d))
          .as("epochs"))
      .select(col("group"), col("n_docs"), col("avail_tokens"),
        (col("quota_tokens") + lit(0.0d)).as("quota_tokens"),
        col("epochs"),
        round(col("avail_tokens").cast("double") * col("epochs"), 0)
          .cast("long").as("alloc_tokens"))
      .select(col("group"), col("n_docs"), col("avail_tokens"),
        col("quota_tokens"), col("epochs"), col("alloc_tokens"),
        (round(col("quota_tokens") -
          col("alloc_tokens").cast("double"), 6) + lit(0.0d))
          .as("shortfall_tokens"))
  }

  /** APPLY a [[tokenBudgetPlan]]: emit one (id, group, epoch) row per
    * scheduled pass over each document — epochs 0..⌊e⌋−1
    * unconditionally, plus epoch ⌊e⌋ for the md5-sampled fraction of
    * the group that fills the non-integer remainder (Muennighoff et
    * al.'s repeat-then-sample shape: a group at e = 3.4 sees every doc
    * 3 times and a deterministic 40% of docs a 4th). Selection is a
    * pure function of (plan, id) — purpose-salted like every other
    * deterministic-selection stage, so backfills replay and the epoch
    * draw is independent of split/mixture/sample draws on the same id.
    *
    * Scale shape: the plan is O(groups) broadcast; the corpus pays one
    * scan and the explode multiplies rows only by the epochs the plan
    * already budgeted — there is no shuffle at all. */
  def tokenBudgetSample(df: DataFrame, id: Column, group: Column,
                        plan: DataFrame): DataFrame =
    epochExpanded(df.select(id.as("id"), group.as("__grp")), plan)
      .select(col("id"), col("__grp").as("group"), col("epoch"))

  /** The shared epoch-expansion core of [[tokenBudgetSample]] and
    * [[tokenBudgetPack]]: `docs` must carry (id, __grp) plus any
    * passthrough columns, all of which survive alongside the new
    * `epoch` column — ONE home for the fractional-epoch draw so the
    * sample and the pack cannot drift. */
  private def epochExpanded(docs: DataFrame, plan: DataFrame): DataFrame = {
    val p = broadcast(plan.select(col("group").as("__grp"),
      col("epochs").as("__e")))
    val full = floor(col("__e")).cast("int")
    // ROUND, not floor: epochs is already quantized to 6 decimals by
    // the plan, so round reproduces the nominal fraction exactly, while
    // floor on the FP representation can land one bucket short (e.g.
    // frac 0.9 -> 899999 buckets, a 1e-6 drift from the plan).
    val fracBuckets =
      round((col("__e") - full.cast("double")) * 1000000L).cast("long")
    val keepExtra = hashBucket("epoch:", col("id"), 1000000L) < fracBuckets
    docs.join(p, "__grp")
      .withColumn("epoch",
        explode(filter(sequence(lit(0), full),
          e => e < full || keepExtra)))
      .drop("__e")
  }

  /** COMPOSE a token-budget plan into the packing sink: the
    * (id, group, epoch) stream [[tokenBudgetSample]] schedules is
    * packed by [[packAssignments]] into fixed-`budget` training
    * sequences — the end-to-end artifact the data-constrained recipe
    * (Muennighoff et al. 2023) exists for: planned epochs become
    * actual sequence coordinates a shard writer consumes.
    *
    * Concatenation order is EPOCH-MAJOR, id-minor — training consumes
    * full passes in sequence (epoch 0's whole stream, then epoch 1's,
    * …), the repeat-then-sample reading order. The instance key is the
    * pure arithmetic `epoch * (max_id + 1) + id`, so any engine
    * replays the exact global token stream from the ids alone and the
    * doc/epoch coordinates decode back arithmetically — no stored
    * mapping, no extra join after the prefix sum.
    *
    * Scale shape: one bounded 1-row max(id) scan (the literal-attach
    * class), the plan collected ONCE to an O(groups) literal (reused
    * for the sample join and the overflow guard — no double plan
    * evaluation), then [[tokenBudgetSample]]'s broadcast-join + explode
    * and [[packAssignments]]'s two-phase prefix sum. Nothing
    * corpus-sized is collected; the explode multiplies rows only by the
    * epochs the plan already budgeted.
    *
    * Output: (id, epoch, n_tokens, offset, seq_first, seq_pos,
    * seq_last) — [[packAssignments]]' contract per document INSTANCE;
    * feed through [[sequenceRows]] / [[writeShards]] for the physical
    * shard layout. `id` must be a non-negative numeric; `plan` is a
    * [[tokenBudgetPlan]] frame.
    *
    * DETERMINISTIC-INPUT REQUIREMENT (ADVICE r19): `df` is evaluated by
    * THREE independent consumers — the eager id-span aggregate, the
    * epoch-sampled side inside [[tokenBudgetSample]], and the n_tokens
    * equi-join — without pinning, because pinning here would
    * localCheckpoint the FULL CORPUS projection (the block-store
    * residue class SCALING.md §r17 bans from operators; the facades pin
    * their own bounded batches instead). A non-deterministic source
    * (sampled/rand()-derived frames) could therefore desync the draw
    * from the span guard: callers must pass a deterministic frame —
    * table-backed reads and pure projections are; localCheckpoint at
    * the CALL SITE if yours is not. */
  def tokenBudgetPack(df: DataFrame, id: Column, group: Column,
                      nTokens: Column, plan: DataFrame, budget: Long,
                      shards: Int = 32): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val spark = df.sparkSession
    val docs = df.select(id.cast("long").as("id"), group.as("__grp"),
      nTokens.cast("long").as("n_tokens"))
    val maxId = docs.agg(max(col("id")), min(col("id"))).head()
    require(!maxId.isNullAt(0), "tokenBudgetPack needs at least one document")
    require(maxId.getLong(1) >= 0, "document ids must be non-negative")
    val span = maxId.getLong(0) + 1L
    // the plan is O(groups): collect ONCE, reuse as a literal for both
    // the epoch join and the key-overflow guard (a second action on a
    // lazy plan frame would re-run the corpus aggregation behind it)
    val planRows = plan.select(col("group").cast("string"), col("epochs"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    require(planRows.nonEmpty, "token-budget plan is empty")
    val maxEpochs = planRows.map(r => math.ceil(r._2).toLong).max
    require(maxEpochs + 1 <= Long.MaxValue / span,
      s"instance key overflow: (max epoch $maxEpochs + 1) * id span $span " +
        "exceeds Long range — repartition the id space")
    val planLit = spark.createDataFrame(planRows).toDF("group", "epochs")
    val inst = tokenBudgetSample(docs, col("id"), col("__grp"), planLit)
      .join(docs.select(col("id"), col("n_tokens")), "id")
      .select((col("epoch").cast("long") * lit(span) + col("id")).as("ikey"),
        col("n_tokens"))
    packAssignments(inst, col("ikey"), col("n_tokens"), budget, shards)
      // packAssignments names its key column "id" = the instance key;
      // decode (id, epoch) back arithmetically — no join
      .select((col("id") % lit(span)).as("doc"),
        expr(s"id DIV ${span}L").cast("int").as("epoch"),
        col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_pos"), col("seq_last"))
      .withColumnRenamed("doc", "id")
  }

  // ---------------- weighted sampling ----------------

  /** Deterministic weighted sampling without replacement, top-`k` of the
    * Efraimidis-Spirakis keys: row i gets u_i uniform in (0, 1] from the
    * md5 bucket of its id and key ln(u_i)/w_i — a monotone transform of
    * the classic u^(1/w), kept in log space so the arithmetic is exact
    * enough for cross-engine replay. Higher-weight rows are
    * proportionally likelier to rank in the top k (A-ES reservoir
    * semantics), yet the draw is a pure function of the id, so backfills
    * reproduce the same sample.
    *
    * Scale shape: one stateless projection + global top-k
    * (TakeOrderedAndProject: per-partition heaps, k-row merge — no
    * shuffle of the corpus). Weights must be strictly positive — guarded
    * IN-PLAN and loudly: a zero weight makes the key NaN, and NaN sorts
    * greatest under Spark's ordering, so a silent zero-weight row would
    * ALWAYS win a sample slot. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, "sample size must be positive")
    val u = (hashBucket("samp:", id, 1L << 30).cast("double") + 1.0d) /
      lit((1L << 30).toDouble)
    // guard the CASTED value: a non-numeric string weight try_casts to
    // null (isNull on the raw column would miss it — null <=> false
    // through the three-valued comparisons — and the row would silently
    // get a null key instead of raising; try_cast rather than cast so
    // ANSI mode raises OUR message, not a generic CAST_INVALID_INPUT)
    val wd = weight.try_cast("double")
    val w = when(wd.isNull || isnan(wd) || wd <= 0.0d,
        raise_error(concat(lit("weightedSample: nonpositive, NaN, or " +
          "non-numeric weight for id "), id.cast("string"))))
      .otherwise(wd)
    df.withColumn("__key", log(u) / w)
      .orderBy(col("__key").desc, id)
      .limit(k)
      .drop("__key")
  }

  // ---------------- corpus-frequent boilerplate detection ----------------

  /** Per-document boilerplate fraction: the share of a document's
    * distinct word `n`-grams that occur in at least `minDocFreq`
    * documents corpus-wide (the C4-style repeated-span signal —
    * navigation chrome, license headers, and template text recur across
    * documents while organic content does not).
    *
    * Scale shape: the corpus-common gram set is bounded by
    * G / minDocFreq (sum of doc-frequencies equals total gram
    * occurrences G) — but G grows LINEARLY with the corpus, so the cut
    * set is corpus-dependent and must NOT be force-broadcast (at 100 TB
    * with a small minDocFreq it is a sizeable fraction of the distinct
    * gram space). Two aggregations: gram doc frequency (8-byte hashed
    * keys, map-side partials) cut to the common set, then per-doc hit
    * counts joined back with NO strategy hint — stats/AQE broadcast it
    * while it fits and fall back to a shuffle join when it doesn't, the
    * [[removeCommonLines]] convention. The corpus text is scanned once
    * per pass and never self-joined.
    *
    * Output: (id, n_grams, common_frac) — one row per document;
    * documents with fewer than `n` tokens have no grams and score 0.0.
    * Fraction rounded to 6, the cross-engine convention. */
  def boilerplateFraction(df: DataFrame, id: Column, text: Column,
                          n: Int = 3, minDocFreq: Int = 5): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq must be at least 2")
    val docs = df.select(id.as("id"), NearDup.hashedShingles(text, n).as("hsh"))
    val exploded = docs.select(col("id"), explode(col("hsh")).as("h"))
    // hsh is distinct per doc, so count(*) per h IS the doc frequency
    val common = exploded.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("h"))
    val hits = exploded.join(common, "h")
      .groupBy(col("id")).agg(count(lit(1)).as("__hits"))
    // project the gram COUNT before the join: joining the full hashed
    // arrays would shuffle 8 bytes per gram per row just to take size()
    // afterwards
    docs.select(col("id"), size(col("hsh")).cast("long").as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        when(col("n_grams") === 0, lit(0.0d))
          .otherwise(round(coalesce(col("__hits"), lit(0L)).cast("double") /
            col("n_grams"), 6) + lit(0.0d))
          .as("common_frac"))
  }

  // ---------------- unigram-LM quality scoring ----------------

  /** Corpus-trained unigram language-model score per document: train
    * token probabilities on the corpus itself (MLE count/total over the
    * top-`vocabCap` terms; out-of-vocabulary tokens take the 1/total
    * floor), then score each document by its mean token log-probability —
    * the classic perplexity-style quality filter (gibberish scores far
    * below the corpus norm, degenerate boilerplate far above it).
    *
    * Scale shape: two aggregations — global term counts (output bounded
    * by `vocabCap` after the top-k cut, so the broadcast model is
    * bounded no matter how large the real vocabulary grows) and
    * (doc, term) counts (high-cardinality keys, map-side partials) —
    * plus a broadcast join of the model. Nothing corpus-sized is
    * collected or re-shuffled. The corpus token TOTAL is an eager
    * 1-row count attached as a LITERAL (the [[Lexical.bm25]] stats
    * precedent — one extra tokenize scan, linear): the per-row OOV
    * floor ln(1/total) needs a scalar, and a 1-row
    * `crossJoin(broadcast(...))` attach plans a
    * BroadcastNestedLoopJoin — linear here, but the node class the
    * stress plan guard rightly forbids, and a constant equi-key folds
    * back to the same node.
    *
    * Determinism (the cross-engine contract): the per-document sum folds
    * LEFT-TO-RIGHT over contributions SORTED BY TERM — float addition is
    * not associative, so an unordered SUM would differ in the last ULP
    * between engines and break hash gates. Any SQL oracle replays the
    * identical fold (DuckDB: `list_reduce(list_prepend(0.0,
    * list(contrib ORDER BY term)), (a, b) -> a + b)`).
    *
    * Output: (id, n_tokens, avg_logprob) with avg_logprob rounded to 6
    * (the [[NearDup]] reproducibility convention). */
  def unigramLogProbs(df: DataFrame, id: Column, text: Column,
                      vocabCap: Int = 65536): DataFrame = {
    require(vocabCap > 0, "vocabCap must be positive")
    val exploded = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("term"))
    // exact integer (token-event count) — the same double the old 1-row
    // sum-of-term-counts frame carried, now a literal (see scaladoc)
    val total = exploded.count().toDouble
    val termCounts = exploded.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("c"))
    val vocab = termCounts
      .orderBy(col("c").desc, col("term")).limit(vocabCap)
      .select(col("term"), log(col("c") / lit(total)).as("lp"))
    val perDocTerm = exploded.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val contribs = perDocTerm
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col("id"), col("term"), col("cnt"),
        (col("cnt") * coalesce(col("lp"), log(lit(1.0d) / lit(total))))
          .as("contrib"))
    contribs.groupBy(col("id"))
      .agg(sum(col("cnt")).cast("long").as("n_tokens"),
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("contrib")))),
            x => x.getField("contrib")),
          lit(0.0d), (acc, x) => acc + x).as("__s"))
      .select(col("id"), col("n_tokens"),
        (round(col("__s") / col("n_tokens"), 6) + lit(0.0d)).as("avg_logprob"))
  }

  /** Corpus-trained INTERPOLATED BIGRAM language-model score per
    * document — the CCNet-style perplexity-filter rung above
    * [[unigramLogProbs]] (Wenzek et al. 2020 gate on a KenLM n-gram
    * model; the standard interpolation backoff is Jelinek-Mercer,
    * Chen & Goodman 1999): each token position contributes
    *
    *   log( lambda * P_bg(w_i | w_{i-1}) + (1 - lambda) * P_ug(w_i) )
    *
    * with P_bg the ML bigram probability count(prev, cur) /
    * count(prev, *) over the top-`bigramCap` bigrams (0 when the bigram
    * is outside the model — the interpolation then IS the backoff to
    * the unigram term), and P_ug the [[unigramLogProbs]] unigram model
    * (top-`vocabCap` MLE, out-of-vocabulary tokens at the 1/total
    * floor, which also keeps every interpolated probability strictly
    * positive — no log(0) path exists). The FIRST token of a document
    * has no bigram context and contributes its unigram term alone.
    * A repetitive doc ("the the the…") now scores HIGH only if its
    * bigrams are corpus-typical — the signal the unigram rung cannot
    * see.
    *
    * Scale shape (r19 — NARROW rows everywhere): the corpus pays
    * token-event aggregations only, ALL keyed on 128-bit composite
    * seeded-`xxhash64` keys (fixed-width shuffle rows; strings join
    * back only for the cap-bounded survivors — see [[trainBigramLm]]) — term counts (cut to vocabCap), bigram counts
    * (cut to bigramCap by (count desc, prev, cur) — a total order, so
    * the cut is deterministic), context counts joined to the CAPPED
    * frame (the uncapped context table is vocabulary-sized but only
    * ever joins broadcast against bigramCap rows) — and scoring's
    * per-doc distinct-pair counting happens IN-ROW
    * ([[graft.functions.TextHash.bigramRunsData]]), so the only
    * corpus-sized shuffle anywhere is the (id, pos, contrib) fold.
    * Both models broadcast (bounded by the caps, never by the real
    * vocabulary). Nothing corpus-sized is collected. The token TOTAL
    * is an eager 1-row aggregate attached as a LITERAL, exactly as in
    * [[unigramLogProbs]] (the alternative 1-row crossJoin attach plans
    * the BroadcastNestedLoopJoin node class the stress plan guard
    * forbids).
    *
    * Determinism: the per-document sum folds LEFT-TO-RIGHT over bigram
    * contributions SORTED BY (prev, cur) with the first-token unigram
    * term added LAST, outside the fold — `lp1 + fold` — so any SQL
    * twin replays the identical addition order; lambda and 1 - lambda
    * are single Scala doubles a twin must print verbatim (the
    * [[graft.operators.MmrRerank.muSql]] rule: 1 - 0.9 is
    * 0.09999999999999998, not 0.1).
    *
    * Output: (id, n_tokens, avg_logprob) — [[unigramLogProbs]]'
    * contract, avg over ALL n positions, rounded to 6. */
  def bigramLogProbs(df: DataFrame, id: Column, text: Column,
                     vocabCap: Int = 65536, bigramCap: Int = 262144,
                     lambda: Double = 0.9): DataFrame =
    bigramScoreWithLm(df, id, text,
      trainBigramLm(df, id, text, vocabCap, bigramCap), lambda)

  /** A trained interpolated-bigram LM held as BOUNDED literal frames:
    * `vocab` (term, pug) <= vocabCap rows, `bigrams` (prev, cur, pbg)
    * <= bigramCap rows, plus the exact corpus token total. Both frames
    * live on the driver (the bounded-model collect class — IVF
    * centroids, BPE merges, BM25 stats), so a plan scoring against them
    * re-materializes at ONE corpus scan instead of re-training the
    * model on every action, and nothing corpus-sized is ever pinned. */
  final case class BigramLm(total: Double, vocab: DataFrame,
                            bigrams: DataFrame)

  /** Train the [[BigramLm]] EAGERLY: term counts cut to the top
    * `vocabCap` (count desc, term — a total order, deterministic cut),
    * bigram counts cut to the top `bigramCap` by (count desc, prev,
    * cur), context counts joined broadcast against the CAPPED bigram
    * frame only. Doubles round-trip the driver bit-exactly, so
    * literal-model scoring is hash-identical to the in-plan model it
    * replaces.
    *
    * Scale shape (r19 verdict task 1a — the NARROW-KEY rewrite): every
    * corpus-event aggregation keys on TWO independently-seeded
    * `xxhash64` values of its unit (a 128-bit composite — 16-byte
    * fixed-width shuffle keys, map-side partials; collision-merged
    * counts would be EXPECTED at 10^10 distinct bigrams under one
    * 64-bit key, and xxhash64 rather than the md5-backed seededHash
    * because the hash here is INTERNAL plumbing the oracle never
    * sees, and md5 per token event measured 5x the cost of the very
    * shuffle it narrows), NEVER on the strings — the string-keyed groupBys here were the
    * driver bench's lm_bigram/ccnet_lang 10x-tier bound breakers
    * (22.4x/17.4x vs the x15 bound: wide partial-agg hash maps spill
    * under full-suite memory pressure). Strings join back ONLY for the
    * rows surviving the cap threshold — boilerplateFraction's trick —
    * with an EXACT-CUT epilogue so the model set (and so every
    * downstream hash) is unchanged: the threshold (the count at
    * multiset rank `cap`, tie-order independent) keeps all definite
    * winners plus the boundary-tie group, the join-back is un-hinted
    * (the survivor side is cap + ties — stats/AQE broadcast it; a
    * forced hint on a corpus-derived set is the banned class), and the
    * original (count desc, unit) orderBy + limit then applies the
    * identical deterministic tie-break over that bounded frame. Context
    * totals count on the hashed prev and join BROADCAST against the
    * cap-BOUNDED model frame only (a legitimate parameter-bounded
    * hint). Bigram events come pre-collapsed per document by the
    * [[graft.functions.TextHash.bigramRunsData]] kernel (distinct
    * pairs with counts — sum(cnt) ≡ the event count). */
  def trainBigramLm(df: DataFrame, id: Column, text: Column,
                    vocabCap: Int = 65536,
                    bigramCap: Int = 262144): BigramLm = {
    require(vocabCap > 0, "vocabCap must be positive")
    require(bigramCap > 0, "bigramCap must be positive")
    val spark = df.sparkSession
    // ONE narrow hash-count shuffle per unit kind, STAGED to scratch
    // parquet ([[Scratch]] — the sanctioned multi-consumer
    // materialization): the token total, the cap threshold, the
    // candidate filter, and the context totals all re-read the staged
    // counts, so the corpus pays exactly FOUR tokenize scans (term
    // counts, term strings, bigram counts, bigram strings) — the same
    // scan budget as the string-keyed original — while every
    // corpus-event shuffle carries fixed-width rows.
    val termEvents = df.select(explode(TextAnalysis.tokens(text)).as("term"))
    // TWO independently-seeded xxhash64 values per unit = a 128-bit
    // composite key: one 64-bit key silently merges colliding units'
    // counts, and at the 10^10-distinct-bigram scale this operator
    // targets the birthday bound makes that EXPECTED (n^2/2^65), which
    // would break the exact-cut "model set unchanged" contract; at
    // 128 bits the probability is ~1e-19 — and the rows stay
    // fixed-width (16-byte keys)
    val termCounts = Scratch.stage(
      termEvents.select(xxhash64(lit(21L), col("term")).as("ht1"),
          xxhash64(lit(31L), col("term")).as("ht2"))
        .groupBy(col("ht1"), col("ht2")).agg(count(lit(1)).as("c")),
      "bigramlm-termcounts")
    // exact integer token-event count (the OOV-floor literal): the sum
    // of per-term counts IS the event count — no extra corpus scan
    val total = termCounts.agg(coalesce(sum(col("c")), lit(0L)))
      .head().getLong(0).toDouble
    // count value at multiset rank `cap` (desc) of a staged count frame
    // — independent of hash tie order among equal counts; None if empty
    def capThreshold(counts: DataFrame, c: Column, cap: Int)
        : Option[Long] = {
      val r = counts.orderBy(c.desc).limit(cap).agg(min(c)).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    // ---- unigram model: MLE over the top-vocabCap terms ----
    val vocabRows = capThreshold(termCounts, col("c"), vocabCap) match {
      case None => Seq.empty[(String, Double)]
      case Some(th) =>
        termEvents
          .select(col("term"), xxhash64(lit(21L), col("term")).as("ht1"),
            xxhash64(lit(31L), col("term")).as("ht2"))
          .join(termCounts.where(col("c") >= lit(th)), Seq("ht1", "ht2"))
          .select(col("term"), col("c")).distinct()
          .orderBy(col("c").desc, col("term")).limit(vocabCap)
          .select(col("term"),
            (col("c").cast("double") / lit(total)).as("pug"))
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    // ---- bigram model over per-doc kernel runs ----
    val pairRuns = df.select(
        explode(graft.functions.TextHash.bigramRunsCol(text)).as("p"))
      .select(col("p").getField("prev").as("prev"),
        col("p").getField("cur").as("cur"),
        col("p").getField("cnt").cast("long").as("cnt"))
    def pairH(seed: Long, prev: Column, cur: Column): Column =
      xxhash64(lit(seed), prev, cur)
    // the pair key carries its prev key along (the pair determines
    // prev, so first() is THE value): context totals then derive from
    // the staged counts alone — cctx(prev) = sum of cbg over prev's
    // bigrams, the exact event count — with zero further corpus scans
    val bgCounts = Scratch.stage(
      pairRuns.select(pairH(22L, col("prev"), col("cur")).as("hb1"),
          pairH(32L, col("prev"), col("cur")).as("hb2"),
          xxhash64(lit(23L), col("prev")).as("hp1"),
          xxhash64(lit(33L), col("prev")).as("hp2"), col("cnt"))
        .groupBy(col("hb1"), col("hb2"))
        .agg(sum(col("cnt")).as("cbg"),
          first(col("hp1")).as("hp1"), first(col("hp2")).as("hp2")),
      "bigramlm-bgcounts")
    val bgRows = capThreshold(bgCounts, col("cbg"), bigramCap) match {
      case None => Seq.empty[(String, String, Double)]
      case Some(th) =>
        val capped = pairRuns
          .select(col("prev"), col("cur"),
            pairH(22L, col("prev"), col("cur")).as("hb1"),
            pairH(32L, col("prev"), col("cur")).as("hb2"))
          .join(bgCounts.where(col("cbg") >= lit(th))
            .select(col("hb1"), col("hb2"), col("cbg")), Seq("hb1", "hb2"))
          .select(col("prev"), col("cur"), col("cbg")).distinct()
          .orderBy(col("cbg").desc, col("prev"), col("cur")).limit(bigramCap)
        val ctx = bgCounts.groupBy(col("hp1"), col("hp2"))
          .agg(sum(col("cbg")).as("cctx"))
        ctx.join(broadcast(capped
            .withColumn("hp1", xxhash64(lit(23L), col("prev")))
            .withColumn("hp2", xxhash64(lit(33L), col("prev")))),
          Seq("hp1", "hp2"))
          .select(col("prev"), col("cur"),
            (col("cbg").cast("double") / col("cctx").cast("double"))
              .as("pbg"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    }
    BigramLm(total,
      spark.createDataFrame(vocabRows).toDF("term", "pug"),
      spark.createDataFrame(bgRows).toDF("prev", "cur", "pbg"))
  }

  /** Score `df` against an ALREADY-TRAINED [[BigramLm]] — the LAZY half
    * of [[bigramLogProbs]] (identical output contract). One stateless
    * plan: per-doc DISTINCT (prev, cur) counts computed IN-ROW by the
    * [[graft.functions.TextHash.bigramRunsData]] kernel (posexplode
    * attaches each pair's ordinal in the kernel's (prev, cur)
    * UTF8-binary sort), two broadcast literal-model joins, then ONE
    * narrow (id, pos, contrib) fold shuffle whose per-doc state is
    * (int, double) structs. The ordinal encodes the exact string sort,
    * so the fold replays the identical float-addition order the old
    * sort-by-(prev, cur) fold produced — hashes unchanged — while the
    * (id, prev, cur) string-keyed corpus shuffle and the wide per-doc
    * collect_list(struct(prev, cur, contrib)) state (the r19 driver
    * bench's lm_bigram 10x bound breaker) are gone. The first-token
    * unigram term is added last, outside the fold. Nothing is pinned;
    * re-running the plan costs one corpus scan, not a model retrain. */
  def bigramScoreWithLm(df: DataFrame, id: Column, text: Column,
                        lm: BigramLm, lambda: Double = 0.9): DataFrame = {
    require(lambda > 0.0d && lambda < 1.0d, "lambda must be in (0, 1)")
    val mu = 1.0d - lambda
    // the OOV floor 1/total is constant-folded to the identical double
    // the executor-side division produced
    val floorPu = lit(1.0d) / lit(lm.total)
    val toks = df.select(id.as("id"), TextAnalysis.tokens(text).as("__t"))
    // per-doc distinct pairs with counts + sort ordinal, zero shuffles
    val ev = df.select(id.as("id"),
        posexplode(graft.functions.TextHash.bigramRunsCol(text))
          .as(Seq("pos", "p")))
      .select(col("id"), col("pos"),
        col("p").getField("prev").as("prev"),
        col("p").getField("cur").as("cur"),
        col("p").getField("cnt").cast("double").as("cnt"))
    val contribs = ev
      .join(broadcast(lm.bigrams), Seq("prev", "cur"), "left")
      .join(broadcast(lm.vocab.withColumnRenamed("term", "cur")),
        Seq("cur"), "left")
      .select(col("id"), col("pos"),
        (col("cnt") * log(lit(lambda) * coalesce(col("pbg"), lit(0.0d)) +
          lit(mu) * coalesce(col("pug"), floorPu)))
          .as("contrib"))
    val folded = contribs.groupBy(col("id"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("pos"),
          col("contrib")))), x => x.getField("contrib")),
        lit(0.0d), (acc, x) => acc + x).as("__s"))
    // first token: unigram term alone (no context exists)
    val first = toks
      .select(col("id"), size(col("__t")).cast("long").as("n_tokens"),
        element_at(col("__t"), 1).as("cur"))
      .join(broadcast(lm.vocab.withColumnRenamed("term", "cur")),
        Seq("cur"), "left")
      .select(col("id"), col("n_tokens"),
        log(coalesce(col("pug"), floorPu)).as("__lp1"))
    first.join(folded, Seq("id"), "left") // single-token docs: no pairs
      .select(col("id"), col("n_tokens"),
        (round((col("__lp1") + coalesce(col("__s"), lit(0.0d))) /
          col("n_tokens"), 6) + lit(0.0d)).as("avg_logprob"))
  }

  /** CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): split the
    * corpus into HEAD / MIDDLE / TAIL terciles by language-model score —
    * the published recipe trains on head+middle and drops (or
    * down-weights) the tail. Scores come from [[bigramLogProbs]] (higher
    * avg token log-probability = lower perplexity = better); the tercile
    * THRESHOLDS come from a bounded deterministic sample, exactly as
    * CCNet computes its percentile cutoffs on a sample rather than
    * sorting the corpus:
    *
    *   - sample = the `sampleCap` documents with the smallest md5 draw
    *     under the dedicated "ppl:" salt (ties by id) — a pure function
    *     of the id set, so re-runs and other engines agree row-by-row;
    *   - t1 / t2 = the sample scores at ascending ranks ceil(m/3) and
    *     ceil(2m/3) (m = actual sample size — the cap, or the corpus
    *     when smaller);
    *   - bucket: score <= t1 -> 'tail', score <= t2 -> 'middle', else
    *     'head'. Sub-tercile corpora (m < 3) degenerate deterministically
    *     (everything at or below the single threshold is 'tail').
    *
    * Scale shape (r18 — NOTHING pinned): the LM trains ONCE, eagerly,
    * into cap-bounded literal frames ([[trainBigramLm]]); scoring
    * against the literal model is a stateless one-scan plan
    * ([[bigramScoreWithLm]]). The md5 sample draw is a pure function of
    * the id, so the sample id set comes from an id-column-only
    * TakeOrdered(sampleCap) (per-partition heaps, cap-row merge — no
    * global sort, no per-doc scoring), and only the sampleCap sample
    * documents pay LM scoring inside the EAGER threshold job (broadcast
    * semi-join on the bounded id set). On top: rank/count windows over
    * the cap-BOUNDED sample frame (the G-row-frame convention), a 1-row
    * eager threshold read attached as LITERALS (the same
    * no-BroadcastNestedLoopJoin rule as the LM totals), and a scan-side
    * CASE over the lazy full-corpus scoring plan. The corpus pays two
    * linear scoring-side passes end-to-end (threshold job restricted to
    * the sample + the output scan) and zero block-store residue — the
    * previous design localCheckpointed the scored corpus frame and
    * relied on GC to reclaim it, the round-17 driver bench's measured
    * scale-killer (ccnet_buckets 32x at 10x inflation).
    *
    * Output: (id, n_tokens, avg_logprob, ppl_bucket). */
  def perplexityBuckets(df: DataFrame, id: Column, text: Column,
                        vocabCap: Int = 65536, bigramCap: Int = 262144,
                        lambda: Double = 0.9,
                        sampleCap: Int = 10000): DataFrame = {
    require(sampleCap > 0, "sampleCap must be positive")
    val lm = trainBigramLm(df, id, text, vocabCap, bigramCap)
    // sample id set: pure function of the id column — cheap columnar cut
    val sampleIds = df.select(id.as("__sid"),
        hashBucket("ppl:", id, 1000000L).as("__d"))
      .orderBy(col("__d"), col("__sid")).limit(sampleCap)
      .select(col("__sid"))
    val sampleScored = bigramScoreWithLm(
      df.join(broadcast(sampleIds), id === col("__sid"), "left_semi"),
      id, text, lm, lambda)
    bucketByThresholds(bigramScoreWithLm(df, id, text, lm, lambda),
      perplexityThresholds(sampleScored, sampleCap))
  }

  /** The CCNet tercile thresholds (t1, t2) of a scored frame
    * (`id`, `avg_logprob`): computed EAGERLY from the
    * md5-deterministic `sampleCap`-row sample (see [[perplexityBuckets]]
    * for the contract). None only for an EMPTY frame (no rows to
    * bucket). This runs a job — callers pass a frame whose per-row cost
    * is already SAMPLE-BOUNDED (the smallest-draw cut inside is then an
    * identity reorder over the same <= sampleCap rows), so nothing needs
    * pinning. */
  private[graft] def perplexityThresholds(scored: DataFrame,
                                          sampleCap: Int)
      : Option[(Double, Double)] = {
    val sample = scored
      .select(col("id"), col("avg_logprob"),
        hashBucket("ppl:", col("id"), 1000000L).as("__d"))
      .orderBy(col("__d"), col("id")).limit(sampleCap)
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("avg_logprob"), col("id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    // windows over the <= sampleCap frame only: bounded single-partition
    // work by construction, never the corpus
    val ranked = sample
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .withColumn("__m", count(lit(1)).over(wAll))
    val thr = ranked.agg(
      max(when(col("__rn") ===
        floor((col("__m") + lit(2L)) / lit(3L)), col("avg_logprob")))
        .as("__t1"),
      max(when(col("__rn") ===
        floor((col("__m") * lit(2L) + lit(2L)) / lit(3L)), col("avg_logprob")))
        .as("__t2")).head()
    // both ranks are >= 1 whenever the sample has >= 1 row, so the
    // thresholds are null only for an empty frame
    if (thr.isNullAt(0) || thr.isNullAt(1)) None
    else Some((thr.getDouble(0), thr.getDouble(1)))
  }

  /** Scan-side CASE over literal tercile thresholds. */
  private def bucketByThresholds(scored: DataFrame,
                                 thr: Option[(Double, Double)]): DataFrame = {
    val bucket = thr match {
      case Some((t1, t2)) =>
        when(col("avg_logprob") <= lit(t1), lit("tail"))
          .when(col("avg_logprob") <= lit(t2), lit("middle"))
          .otherwise(lit("head"))
      case None => lit("head") // empty frame: no rows carry the value
    }
    scored.select(col("id"), col("n_tokens"), col("avg_logprob"),
      bucket.as("ppl_bucket"))
  }

  /** PER-LANGUAGE CCNet bucketing — the faithful form of
    * [[perplexityBuckets]]: Wenzek et al. 2020 §4.3 compute their
    * perplexity percentile cutoffs PER LANGUAGE, because LM scores are
    * systematically lower for languages the model covers thinly
    * (vocabulary coverage, not quality) — a corpus-GLOBAL cut shunts
    * whole low-resource languages into 'tail'. Here every document is
    * keyed by `lang` (typically
    * [[TextAnalysis.predictedLangScript]] — any deterministic Column
    * over `df`'s columns works), the deterministic md5 sample is drawn
    * per language (`sampleCapPerLang` applies to EACH language), and
    * the tercile thresholds t1/t2 cut each language's own score
    * distribution.
    *
    * A NULL language key is coalesced to the ISO-639 sentinel 'und'
    * (undetermined) BEFORE any join, so null-lang documents land in
    * their own bucket distribution instead of silently vanishing
    * through the inner equi-joins (ADVICE r17;
    * [[TextAnalysis.predictedLangScript]] never yields null, but an
    * arbitrary caller-supplied column can).
    *
    * Scale shape (r18 — NOTHING pinned): the LM trains ONCE, eagerly,
    * into cap-bounded literal frames ([[trainBigramLm]]); all further
    * pieces are one lazy plan. The per-language deterministic sample
    * cuts on the (id, lang, draw) PROJECTION — no per-doc scoring —
    * with the TWO-PHASE window: phase 1 ranks within (input-partition,
    * lang) so the hot language (English is half the web) spreads over
    * every partition instead of funneling one reducer, and the exact
    * global per-language smallest-k must survive its own partition's
    * cut, so the phase-2 window runs over a frame bounded by
    * partitions x languages x cap, never the corpus. Only the bounded
    * sample survivors pay LM scoring (broadcast semi-join on the sample
    * id set); thresholds are a languages-row frame attached by
    * BROADCAST equi-join on lang (no scalar attach anywhere). The
    * corpus pays two linear scoring passes (sample-restricted + output)
    * and zero block-store residue — the previous design
    * localCheckpointed the scored corpus frame, the round-17 driver
    * bench's measured scale-killer.
    *
    * Output: (id, lang, n_tokens, avg_logprob, ppl_bucket). */
  def perplexityBucketsByLang(df: DataFrame, id: Column, text: Column,
                              lang: Column,
                              vocabCap: Int = 65536,
                              bigramCap: Int = 262144,
                              lambda: Double = 0.9,
                              sampleCapPerLang: Int = 10000): DataFrame = {
    require(sampleCapPerLang > 0, "sampleCapPerLang must be positive")
    import org.apache.spark.sql.expressions.Window
    val langSafe = coalesce(lang.cast("string"), lit("und"))
    val docLang = df.select(id.as("id"), langSafe.as("lang"))
    val lm = trainBigramLm(df, id, text, vocabCap, bigramCap)
    val scored = bigramScoreWithLm(df, id, text, lm, lambda)
      .join(docLang, Seq("id"))
    // per-language sample: the draw is a pure function of the id, so
    // the cut runs over the narrow (id, lang, draw) projection
    val drawn = docLang
      .withColumn("__d", hashBucket("ppl:", col("id"), 1000000L))
      .withColumn("__p", spark_partition_id())
    val wLocal = Window.partitionBy(col("__p"), col("lang"))
      .orderBy(col("__d"), col("id"))
    val localCut = drawn
      .withColumn("__lr", row_number().over(wLocal))
      .where(col("__lr") <= sampleCapPerLang)
    // phase 2: exact per-language smallest-sampleCap over the BOUNDED
    // survivor frame
    val wSample = Window.partitionBy(col("lang"))
      .orderBy(col("__d"), col("id"))
    val sample = localCut
      .withColumn("__sr", row_number().over(wSample))
      .where(col("__sr") <= sampleCapPerLang)
      .select(col("id"), col("lang"))
    // only the sample survivors pay LM scoring for the thresholds
    val sampleScored = bigramScoreWithLm(
        df.join(broadcast(sample.select(col("id").as("__sid"))),
          id === col("__sid"), "left_semi"),
        id, text, lm, lambda)
      .join(sample, Seq("id"))
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("avg_logprob"), col("id"))
    val wLang = Window.partitionBy(col("lang"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val ranked = sampleScored
      .withColumn("__rn", row_number().over(wRank).cast("long"))
      .withColumn("__m", count(lit(1)).over(wLang))
    val thr = ranked.groupBy(col("lang")).agg(
      max(when(col("__rn") ===
        floor((col("__m") + lit(2L)) / lit(3L)), col("avg_logprob")))
        .as("__t1"),
      max(when(col("__rn") ===
        floor((col("__m") * lit(2L) + lit(2L)) / lit(3L)), col("avg_logprob")))
        .as("__t2"))
    // every language present in scored has >= 1 sample row (the sample
    // draws from the same docLang frame), so the inner broadcast join
    // drops nothing
    scored.join(broadcast(thr), Seq("lang"))
      .select(col("id"), col("lang"), col("n_tokens"), col("avg_logprob"),
        when(col("avg_logprob") <= col("__t1"), lit("tail"))
          .when(col("avg_logprob") <= col("__t2"), lit("middle"))
          .otherwise(lit("head")).as("ppl_bucket"))
  }

  /** The CCNet pipeline end-to-end (Wenzek et al. 2020): paragraph-
    * level corpus dedup (§4.2, [[removeCommonParagraphs]]) feeding
    * per-language perplexity bucketing (§4.3,
    * [[perplexityBucketsByLang]] keyed by
    * [[TextAnalysis.predictedLangScript]] over the CLEANED text — the
    * paper identifies language after dedup too). Documents whose every
    * paragraph was corpus-duplicated survive as empty husks and score
    * through the pinned one-empty-token path — dropping them is the
    * caller's call, as everywhere else in the dedup family.
    *
    * `minLangConf > 0` adds the paper's language-SCORE keep rule
    * (Wenzek et al. gate on fastText confidence >= 0.5, not the
    * argmax): documents whose [[TextAnalysis.langScriptConfidence]]
    * over the CLEANED text falls below the cut are dropped AFTER dedup
    * and BEFORE the LM sees them — a dropped page must neither train
    * the LM nor receive a bucket. The default 0.0 compiles to the
    * pre-existing plan (no filter node).
    *
    * Output: (id, n_kept, n_removed, lang, n_tokens, avg_logprob,
    * ppl_bucket). */
  def ccnetPipeline(df: DataFrame, id: Column, text: Column,
                    minDocFreq: Int = 2,
                    vocabCap: Int = 65536, bigramCap: Int = 262144,
                    lambda: Double = 0.9,
                    sampleCapPerLang: Int = 10000,
                    minLangConf: Double = 0.0): DataFrame = {
    require(minLangConf >= 0.0 && minLangConf <= 1.0,
      "minLangConf must be in [0, 1]")
    val cleaned = removeCommonParagraphs(df, id, text, minDocFreq)
    val gated =
      if (minLangConf <= 0.0) cleaned
      else cleaned.where(TextAnalysis.langScriptConfidence(
        col("clean_text"), TextAnalysis.tokens(col("clean_text")))
        >= minLangConf)
    // STAGED to scratch parquet (r18): the LM chain references its
    // input ~12 times (train scans, the sample cut, sample + output
    // scoring, the n_kept join) — over a raw parquet scan that is
    // scan-shaped, but re-running the 3-shuffle dedup subplan per
    // reference is not. Staging computes the dedup ONCE and makes
    // every re-read a plain pruned columnar scan, with a deterministic
    // one-copy storage bound — unlike the previous localCheckpoint,
    // whose corpus-sized blocks only the ContextCleaner could reclaim
    // (the GC-timing dependence the r17 driver bench flagged across
    // this operator family). This is the stage-to-storage shape a
    // 100 TB pipeline uses between phases anyway.
    val deduped = Scratch.stage(gated, "ccnet-dedup")
    val clean = col("clean_text")
    perplexityBucketsByLang(deduped, col("id"), clean,
        TextAnalysis.predictedLangScript(clean, TextAnalysis.tokens(clean)),
        vocabCap, bigramCap, lambda, sampleCapPerLang)
      .join(deduped.select(col("id"), col("n_kept"), col("n_removed")),
        Seq("id"))
      .select(col("id"), col("n_kept"), col("n_removed"), col("lang"),
        col("n_tokens"), col("avg_logprob"), col("ppl_bucket"))
  }

  // ---------------- intra-document repetition signals ----------------

  /** Contiguous word `n`-grams WITH duplicates — unlike
    * [[NearDup.shingles]] this keeps every occurrence, because repetition
    * signals measure exactly the duplication `shingles`' distinct throws
    * away. Backed by the JIT kernel
    * (`graft.functions.TextHash.ngramsCol`): the equivalent
    * transform/element_at composition evaluates interpreted and
    * re-derives the token array per element — measured 6.1 s vs sub-second
    * for `text_repetition` at sf0.1 (the same trap
    * [[NearDup.hashedShingles]] documents). */
  def ngrams(text: Column, n: Int): Column =
    graft.functions.TextHash.ngramsCol(text, n)

  /** Per-document repetition quality signals over word `n`-grams (the
    * Gopher-style repetition filters: boilerplate and degenerate text
    * show up as a dominant n-gram or a collapsed distinct ratio long
    * before a human label would):
    *
    *   - `top_ngram_frac` occurrences of the most frequent n-gram /
    *     total n-grams (ties don't matter — only the max count is read)
    *   - `dup_ngram_frac` fraction of n-gram occurrences that are
    *     repeats: 1 - distinct/total
    *
    * Scale shape: ONE shuffle on (id, gram) with map-side partial
    * counts, then a per-id rollup — both keys are high-cardinality, so
    * the work spreads over every reducer; nothing is collected and no
    * per-doc data structure exceeds its own n-gram multiset. Documents
    * with fewer than `n` tokens have no n-grams and are absent from the
    * output (nothing to measure).
    *
    * Fractions are `round(x, 6) + 0.0` — the same cross-engine
    * bit-reproducibility contract as [[NearDup]]'s distances. */
  def repetitionStats(df: DataFrame, id: Column, text: Column,
                      n: Int = 2): DataFrame = {
    def frac(c: Column): Column = round(c, 6) + lit(0.0d)
    df.select(id.as("id"), explode(ngrams(text, n)).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(max(col("cnt")).as("max_cnt"), sum(col("cnt")).as("total"),
        count(lit(1)).as("n_distinct"))
      .select(col("id"),
        frac(col("max_cnt").cast("double") / col("total")).as("top_ngram_frac"),
        frac(lit(1.0d) - col("n_distinct").cast("double") / col("total"))
          .as("dup_ngram_frac"))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, Table A1 — the
    * repetition half; the non-repetition rules live in
    * [[TextAnalysis.gopherQualityFlags]]). ONE Scala home, the SQL twin
    * is generated from these values. */
  val GopherMaxDupLineFrac = 0.30
  val GopherMaxDupParaFrac = 0.30
  val GopherMaxDupLineCharFrac = 0.20
  val GopherMaxDupParaCharFrac = 0.20
  val GopherMaxTopGramCharFrac: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val GopherMaxDupGramCharFrac: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The Gopher REPETITION panel (Rae et al. 2021 Table A1's other
    * half, completing [[TextAnalysis.gopherQualityFlags]]): thirteen
    * within-document repetition filters —
    *
    *   - duplicate LINE / PARAGRAPH fractions (occurrence basis:
    *     (occurrences − distinct) / occurrences) and their CHARACTER
    *     fractions (characters in every occurrence beyond the first of
    *     each distinct unit / characters in all occurrences). Units are
    *     '\n' lines / `\n{2,}` paragraphs under the pinned-whitespace
    *     trim; BLANK units are excluded from both bases;
    *   - top n-gram character fractions for n = 2..4: the most frequent
    *     word n-gram's occurrences × its token characters, over the
    *     document's token characters (ties on count break to the
    *     LONGER gram — deterministic via integer packing);
    *   - duplicate n-gram character fractions for n = 5..10: the
    *     fraction of TOKEN characters covered by any n-gram occurring
    *     at least twice in the document (positional coverage via a
    *     trailing ROWS window — the ExactSubstr trick — so overlapping
    *     duplicates never double-count, the paper's "taking care not
    *     to count characters multiple times").
    *
    * Pinned deviations from the paper, stated: all gram bases are
    * TOKEN characters (the pinned tokenizer does not keep original
    * byte offsets, so separator bytes are excluded on both sides of
    * every ratio), and `passes` compares the ROUNDED 6-decimal
    * fractions, the cross-engine boundary convention.
    *
    * Scale shape (round 18): a PURE PROJECTION — repetition is an
    * intra-document property, so every gram statistic comes from the
    * one-pass JIT kernel
    * ([[graft.functions.TextHash.gopherGramStats]]: per-document gram
    * hashmaps, count ties to the longer gram via the same integer
    * packing, coverage overlaps counted once) and the line/paragraph
    * block is array arithmetic. Zero shuffles, zero windows, nothing
    * collected — the first formulation shuffled the corpus twice
    * (keyed (id, n, gram)) and sorted it twice (document-keyed window
    * frames) for a per-row statistic; the kernel shape measured ~1.7×
    * faster same-box at sf0.1, and at 100 TB it is the difference
    * between a scan and four corpus-wide exchanges. Values are
    * bit-identical (the unchanged DuckDB oracle gates that), including
    * the ADVICE-r17 char clamp below 1e6 inside the packing.
    *
    * Output: (id, dup_line_frac, dup_line_char_frac, dup_para_frac,
    * dup_para_char_frac, top_2gram_char_frac .. top_4gram_char_frac,
    * dup_5gram_char_frac .. dup_10gram_char_frac, passes). */
  def gopherRepetitionStats(df: DataFrame, id: Column,
                            text: Column): DataFrame = {
    def r6(c: Column): Column = round(c, 6) + lit(0.0d)
    val topNs = GopherMaxTopGramCharFrac.map(_._1)
    val dupNs = GopherMaxDupGramCharFrac.map(_._1)
    val base = df.select(id.as("id"),
      graft.functions.TextHash.gopherGramStatsCol(text).as("__rep"))
    // kernel layout: [1..3] top products n=2..4, [4..9] coverage
    // n=5..10, [10] token chars, [11..14]/[15..18] line/para unit stats
    def at(i: Int): Column = element_at(col("__rep"), i).cast("double")
    def ratio(num: Column, den: Column): Column =
      r6(when(den === 0.0d, lit(0.0d)).otherwise(num / den))
    def unitCols(off: Int, tag: String): Seq[Column] = {
      val (occ, dst, occChars, dstChars) =
        (at(off), at(off + 1), at(off + 2), at(off + 3))
      Seq(ratio(occ - dst, occ).as(s"dup_${tag}_frac"),
        ratio(occChars - dstChars, occChars).as(s"dup_${tag}_char_frac"))
    }
    val withFracs = base.select(
      (Seq(col("id")) ++ unitCols(11, "line") ++ unitCols(15, "para") ++
        topNs.zipWithIndex.map { case (n, i) =>
          ratio(at(i + 1), at(10)).as(s"top_${n}gram_char_frac") } ++
        dupNs.zipWithIndex.map { case (n, i) =>
          ratio(at(topNs.size + i + 1), at(10))
            .as(s"dup_${n}gram_char_frac") }): _*)
    val passCond = (
      Seq(col("dup_line_frac") <= GopherMaxDupLineFrac,
        col("dup_line_char_frac") <= GopherMaxDupLineCharFrac,
        col("dup_para_frac") <= GopherMaxDupParaFrac,
        col("dup_para_char_frac") <= GopherMaxDupParaCharFrac) ++
        GopherMaxTopGramCharFrac.map { case (n, t) =>
          col(s"top_${n}gram_char_frac") <= t } ++
        GopherMaxDupGramCharFrac.map { case (n, t) =>
          col(s"dup_${n}gram_char_frac") <= t })
      .reduce(_ && _)
    withFracs.withColumn("passes", passCond.cast("long"))
  }

  /** Corpus datasheet — the release artifact a training-data pipeline
    * ships with its freeze (Datasheets for Datasets, Gebru et al.
    * 2018): ONE row summarizing the corpus. Columns:
    *
    *   - `n_docs`, `n_tokens`, `n_chars` — volume
    *   - `n_unique_texts` — distinct content digests (exact-dup rate =
    *     1 − unique/docs, left to the reader as integers hash cleaner
    *     than ratios)
    *   - `lang_<code>` — stopword-profile language distribution
    *   - `q_lo / q_mid / q_hi / q_top` — quality-score histogram over
    *     [0,.25) [.25,.5) [.5,.75) [.75,∞) (bin compares run on the
    *     SAME doubles both engines compute, so no boundary rounding)
    *   - `pii_url / pii_email / pii_ipv4 / pii_phone` — total PII
    *     matches under the ordered sequential-redaction counting
    *     semantics of [[TextAnalysis.redactPii]]
    *   - `near_dup_pairs` — confirmed near-duplicate pairs at the
    *     standard trigram-Jaccard parameters
    *   - `contaminated_docs` — documents sharing ≥ 1 hashed 4-gram
    *     with the benchmark frame
    *
    * Scale shape: the volume/lang/quality/PII block is ONE scan and one
    * aggregation; the dedup and contamination blocks reuse the banded /
    * broadcast plans of their standalone operators (never all-pairs);
    * the three one-row frames cross-join at the end — three scans
    * total, each scan-shaped at 100 TB. */
  def corpusDatasheet(df: DataFrame, id: Column, text: Column,
                      benchmark: DataFrame, benchText: Column,
                      nearDupThreshold: Double = 0.5): DataFrame = {
    import TextAnalysis._
    // id feeds the dedup/contamination panels below; the stats panel is
    // id-free by construction
    val base = df.select(text.as("__text"))
    val t = TextAnalysis.tokens(col("__text"))
    val q = when(size(t) > 0, qualityScore(t)).otherwise(lit(0.0d))
    val piiCols = {
      var state: Column = col("__text")
      PiiPatterns.map { case (name, pat, repl) =>
        val c = regexp_count(state, lit(pat)).as(s"__pii_$name")
        state = regexp_replace(state, pat, repl)
        c
      }
    }
    val perDoc = base.select(Seq(
      md5(col("__text")).as("__digest"),
      size(t).cast("long").as("__ntok"),
      length(col("__text")).cast("long").as("__nchar"),
      // SCRIPT-aware: the Latin-stopword argmax alone would label every
      // CJK/Cyrillic/Arabic document with the Latin fallback — exactly
      // wrong in the release artifact of a multilingual corpus
      predictedLangScript(col("__text"), t).as("__lang"),
      q.as("__q")) ++ piiCols: _*)
    val langCols =
      (ScriptRanges.map(_._1) ++ LangProfiles.map(_._1)).map { code =>
        sum(when(col("__lang") === code, 1L).otherwise(0L)).as(s"lang_$code")
      }
    val piiSums = PiiPatterns.map { case (name, _, _) =>
      sum(col(s"__pii_$name")).as(s"pii_$name")
    }
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      (Seq(
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nchar")).as("n_chars"),
        countDistinct(col("__digest")).as("n_unique_texts"),
        sum(when(col("__q") < 0.25, 1L).otherwise(0L)).as("q_lo"),
        sum(when(col("__q") >= 0.25 && col("__q") < 0.5, 1L).otherwise(0L))
          .as("q_mid"),
        sum(when(col("__q") >= 0.5 && col("__q") < 0.75, 1L).otherwise(0L))
          .as("q_hi"),
        sum(when(col("__q") >= 0.75, 1L).otherwise(0L)).as("q_top"))
        ++ langCols ++ piiSums): _*)
    val nearDups = NearDup.nearDupPairs(df, id, text, n = 3, numHashes = 16,
        rowsPerBand = 2, threshold = nearDupThreshold)
      .agg(count(lit(1)).as("near_dup_pairs"))
    val contaminated = contaminationHits(df, id, text, benchmark, benchText,
        n = 4)
      .agg(count(lit(1)).as("contaminated_docs"))
    stats.crossJoin(nearDups).crossJoin(contaminated)
  }
}
