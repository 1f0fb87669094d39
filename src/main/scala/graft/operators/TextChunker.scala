package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for embedding pipelines: split each text into
  * overlapping token windows — the front half of the reference's
  * document→chunk data model (`entities.py:54-58` stores pre-chunked
  * text with a `chunk_index`; producing those chunks is left to the
  * caller there, and is a first-class operator here).
  *
  * Scale shape: a pure projection (tokenize → window arithmetic →
  * posexplode), no shuffle, whole-stage codegen end to end — chunking
  * 100 TB of documents costs exactly one scan. The inverse operation
  * (reassembly in chunk_index order) is `window_doc_reconstruct`.
  */
object TextChunker {

  /** Overlapping token-window chunks of each document.
    *
    * Window rule: chunks start every `maxTokens - overlap` tokens
    * (the stride) and carry up to `maxTokens` tokens; emission stops
    * with the first chunk that reaches the end of the document, so no
    * trailing chunk is ever fully contained in its predecessor —
    * `1 + ceil(max(0, n - maxTokens) / stride)` chunks for an n-token
    * document. Consecutive chunks share exactly `overlap` tokens, and
    * dropping the first `overlap` tokens of every non-first chunk
    * reconstructs the token stream (the round-trip invariant the spec
    * pins).
    *
    * Tokenization is whitespace splitting with the ORIGINAL case kept
    * (chunks feed an embedder; lowercasing is the analysis-side
    * convention of [[TextAnalysis.tokens]], not wanted here), so
    * chunk_text is the whitespace-NORMALIZED source text. Like the
    * analysis tokenizer, an all-whitespace text yields the single
    * empty token `split` produces — one empty chunk, never zero rows,
    * on both Spark and any SQL oracle.
    *
    * Output: (id, chunk_index, start_token, chunk_text, n_tokens),
    * one row per chunk. */
  def chunk(df: DataFrame, id: Column, text: Column,
            maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap for maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    // the regex split is materialized ONCE per row in its own projection:
    // referencing the split expression from inside the transform lambda
    // would re-run the tokenizer per chunk (subexpression elimination does
    // not reach across the lambda boundary) — O(chunks) regex passes over
    // every document instead of one
    // pinned whitespace class (TextHash.WsClassJava), not \s: Java and
    // RE2 \s differ (\x0B) and neither matches Unicode spaces — the
    // explicit class makes Spark's split and the DuckDB oracle's
    // string_split_regex agree on any input. No NFC/lowercase here:
    // chunk_text passes the ORIGINAL text through, and normalization
    // never creates or consumes whitespace, so token boundaries (and
    // counts) already agree with the analysis tokenizer's.
    val toks = df.select(id.as("id"),
      split(trim(text), graft.functions.TextHash.WsClassJava + "+").as("__t"))
    val t = col("__t")
    val n = size(t)
    val nChunks = (lit(1) +
      ceil(greatest(lit(0), n - maxTokens).cast("double") / stride)).cast("int")
    toks.select(col("id"), posexplode(
        transform(sequence(lit(0), nChunks - 1), k => struct(
          (k * stride).as("start_token"),
          concat_ws(" ", slice(t, k * stride + 1, lit(maxTokens)))
            .as("chunk_text"),
          least(lit(maxTokens), n - k * stride).cast("int").as("n_tokens"))))
        .as(Seq("chunk_index", "c")))
      .select(col("id"), col("chunk_index"),
        col("c.start_token").as("start_token"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))
  }

  /** Sentence pattern shared with any SQL oracle: greedy runs of
    * non-terminator characters plus their trailing `.!?` terminators —
    * deliberately lookaround-free so RE2 engines (DuckDB) and Java
    * regex agree byte-for-byte. */
  val SentencePattern = "[^.!?]+[.!?]*"

  /** Sentence-aligned chunking: documents split into sentences
    * (SentencePattern), sentences packed into budget-bucketed chunks —
    * a sentence lands in the chunk where its first token falls
    * (`floor(tokens_before / budgetTokens)`), so sentences are ATOMIC:
    * no sentence is ever split across chunks, and a sentence longer
    * than the budget occupies its bucket alone rather than being cut.
    * Bucket indices are then renumbered densely per document (an
    * over-budget sentence can make `floor` skip bucket values).
    *
    * Scale shape: one narrow shuffle keyed by document for the running
    * token count (the window), one aggregation keyed by (document,
    * bucket) for reassembly — both scale with document cardinality,
    * never corpus size; the final renumber window runs over chunk rows
    * (output-sized). Compare [[chunk]], which is shuffle-free but cuts
    * mid-sentence.
    *
    * Output: (id, chunk_index, chunk_text, n_sentences, n_tokens) with
    * chunk_text = trimmed sentences joined by single spaces in document
    * order. A document with no sentence matches (empty text) emits no
    * rows. */
  def chunkBySentences(df: DataFrame, id: Column, text: Column,
                       budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val sents = df.select(id.as("id"), posexplode(
        regexp_extract_all(text, lit(SentencePattern), lit(0)))
        .as(Seq("sent_index", "sentence")))
      .withColumn("n_toks",
        size(split(trim(col("sentence")),
          graft.functions.TextHash.WsClassJava + "+")).cast("long"))
    val w = Window.partitionBy(col("id")).orderBy(col("sent_index"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = sents
      .withColumn("bucket",
        floor((sum(col("n_toks")).over(w) - col("n_toks")) / budgetTokens))
    val chunks = bucketed.groupBy(col("id"), col("bucket"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("sent_index"),
            trim(col("sentence")).as("s")))),
          c => c.getField("s"))).as("chunk_text"),
        count(lit(1)).as("n_sentences"),
        sum(col("n_toks")).as("n_tokens"))
    val renumber = Window.partitionBy(col("id")).orderBy(col("bucket"))
    chunks
      .withColumn("chunk_index",
        (row_number().over(renumber) - 1).cast("int"))
      .select(col("id"), col("chunk_index"), col("chunk_text"),
        col("n_sentences"), col("n_tokens"))
  }
}
