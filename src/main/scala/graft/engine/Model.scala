package graft.engine

import java.sql.Timestamp

/** Canonical engine schemas (SURVEY.md §1.4) as case classes — the typed
  * `Dataset` surface of the three entity tables. Metadata values use the
  * typed-prefix encoding (graft.functions.MetadataFunctions). */
/** `storage` is the vector representation kept per chunk: "float32" (the
  * reference's only option) or "sq8" — uint8 scalar-quantized codes stored
  * BESIDE the float32 embedding at ingest, searched two-phase (approx on
  * codes, exact rescore). Immutable after create. */
final case class LibraryRow(
    id: String,
    name: String,
    description: String,
    metadata: Map[String, String],
    embedding_dimension: Int,
    distance_metric: String,
    index_kind: String,
    storage: String,
    created_at: Timestamp,
    updated_at: Timestamp)

final case class DocumentRow(
    id: String,
    library_id: String,
    name: String,
    metadata: Map[String, String],
    created_at: Timestamp,
    updated_at: Timestamp)

/** `library_id` is denormalized onto chunks for partition pruning
  * (SURVEY.md §1.4); `bucket` is non-null only in random_projection /
  * ivf-with-model libraries; `qmin`/`qmax`/`codes` are non-null only in
  * storage="sq8" libraries (the per-row SQ8 quantization — kept in-row so
  * the approximate search phase is pure column pruning: it reads the int8
  * codes and never the float32 embedding bytes). */
final case class ChunkRow(
    id: String,
    document_id: String,
    library_id: String,
    text: String,
    embedding: Seq[Float],
    metadata: Map[String, String],
    chunk_index: Int,
    bucket: Option[Long],
    qmin: Option[Double],
    qmax: Option[Double],
    codes: Option[Seq[Int]],
    created_at: Timestamp,
    updated_at: Timestamp)

/** Caller-side chunk payload (id optional — uuid4-style default, like
  * reference entities.py:16). */
final case class ChunkInput(
    text: String,
    embedding: Seq[Float],
    metadata: Map[String, Any] = Map.empty,
    chunkIndex: Int = 0,
    id: Option[String] = None)

/** Pagination envelope (reference: schemas.py:77-83 — total computed over
  * the full set, has_more = skip + limit < total). */
final case class Page[T](items: Seq[T], total: Long, skip: Int, limit: Int) {
  def hasMore: Boolean = skip + limit < total
}
