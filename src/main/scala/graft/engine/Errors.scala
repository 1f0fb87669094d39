package graft.engine

/** Sealed error taxonomy mirroring the reference's exception hierarchy
  * (reference: vector_db/exceptions.py:8-177 — NotFound/404,
  * Validation/400, Conflict/409, Storage/500, Search/400; HTTP mapping at
  * vector_db/api.py:122-207). The engine is a library, so the HTTP status
  * is carried as a code for any serving layer to map.
  */
sealed abstract class VectorDbError(val httpStatus: Int, msg: String)
  extends RuntimeException(msg)

/** Entity lookup failed (exceptions.py — *NotFoundError). */
final case class NotFoundError(entity: String, id: String)
  extends VectorDbError(404, s"$entity not found: $id")

/** Input failed a validation predicate (P5-P7; exceptions.py — ValidationError). */
final case class ValidationError(message: String)
  extends VectorDbError(400, message)

/** Mutation conflicts with engine state — duplicate id, immutable field
  * change, dimension/index change on a non-empty library
  * (vector_store.py:59-65,124-125,196-197). */
final case class ConflictError(message: String)
  extends VectorDbError(409, message)

/** Persistence failure (exceptions.py — StorageError). */
final case class StorageError(message: String)
  extends VectorDbError(500, message)

/** Bad search parameters — k <= 0, wrong query dimension
  * (services.py:171-175). */
final case class SearchError(message: String)
  extends VectorDbError(400, message)
