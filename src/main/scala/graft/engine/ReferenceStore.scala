package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Parsers for the REFERENCE's on-disk store layout, feeding
  * [[VectorEngine.importReferenceStore]] — the migration entry point for a
  * user moving a store written by the reference's DiskVectorStore onto
  * this engine.
  *
  * Layout being read (reference: vector_db/disk_store.py:37-43 directory
  * structure, :100-116 per-entity JSON writes; index sidecars
  * indexes.py:125-146 flat / :262-287 random_projection — a `<library
  * id>.json` metadata file beside `.npy` numpy arrays):
  *
  * {{{
  *   <dir>/libraries/<uuid>.json      one Library per file
  *   <dir>/documents/<uuid>.json      one Document per file
  *   <dir>/chunks/<uuid>.json         one Chunk per file (embedding inline)
  *   <dir>/indexes/<library>.json     index metadata (+ buckets for LSH)
  *   <dir>/indexes/<library>.projections.npy   LSH projection matrix (<f4)
  * }}}
  *
  * The entity JSON is read DISTRIBUTED (spark.read.json over the entity
  * directories — a store can hold millions of chunk files); only the
  * per-library index sidecars are driver-parsed, which is bounded: one
  * JSON + one P x dim matrix per library, the same O(index metadata) the
  * engine already holds for its own libraries.
  */
object ReferenceStore {

  /** Entity schemas — explicit, so a malformed store fails loudly instead
    * of being schema-inferred into something else. `metadata` is read as
    * StringType: the JSON source hands back the field's raw JSON text,
    * which [[encodeMetaCol]] then maps to the engine's typed-prefix
    * encoding inside the plan (no driver parsing of per-row metadata). */
  val LibrarySchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("metadata", StringType),
    StructField("document_count", LongType),
    StructField("chunk_count", LongType),
    StructField("embedding_dimension", IntegerType),
    StructField("distance_metric", StringType),
    StructField("index_kind", StringType)))

  val DocumentSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("library_id", StringType),
    StructField("name", StringType),
    StructField("metadata", StringType),
    StructField("chunk_count", LongType)))

  val ChunkSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("document_id", StringType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(DoubleType)),
    StructField("metadata", StringType),
    StructField("chunk_index", IntegerType)))

  private val SidecarSchema: StructType = StructType(Seq(
    StructField("dimension", IntegerType),
    StructField("num_projections", IntegerType),
    StructField("random_state", LongType),
    StructField("vector_ids", ArrayType(StringType)),
    StructField("buckets", MapType(StringType, ArrayType(StringType)))))

  /** One entity directory as a DataFrame — each pretty-printed JSON file
    * is one record (multiLine). The schema is pinned; `columnNameOfCorruptRecord`
    * rows surface as all-null ids and fail the importer's id guards. */
  def readEntityDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(dir)

  /** Map a raw metadata JSON object string to the engine's typed-prefix
    * MAP<STRING,STRING> (graft.functions.MetadataFunctions): the
    * reference's `Metadata = Dict[str, str | int | float | bool]`
    * (entities.py:9-10) keeps TYPED equality after import — the int 10
    * becomes `"i:10"` and the string "10" becomes `"s:10"`, so a filter
    * can never conflate them. Runs inside the plan via the VARIANT type
    * (parse once, dispatch on `schema_of_variant`); any other JSON value
    * type (nested object/array/null) is a store the reference could not
    * have written and raises. */
  def encodeMetaCol(raw: Column): Column = {
    val parsed = parse_json(raw)
    val topType = schema_of_variant(parsed)
    val asMap = parsed.cast("map<string,variant>")
    val mapped = transform_values(asMap, (_, v) => {
      val t = schema_of_variant(v)
      when(t === "STRING", concat(lit("s:"), v.cast("string")))
        .when(t === "BOOLEAN", concat(lit("b:"), v.cast("string")))
        .when(t.isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
          concat(lit("i:"), v.cast("long").cast("string")))
        // an integer wider than the JSON-int range parses as a scale-0
        // DECIMAL: it is still an INT to the reference, so keep the
        // typed-equality contract — the long cast throws (ANSI) on
        // values no engine long can hold, rather than silently
        // retyping them to lossy f: doubles
        .when(t.rlike("^DECIMAL\\([0-9]+,0\\)$"),
          concat(lit("i:"), v.cast("long").cast("string")))
        .when(t === "DOUBLE" || t.startsWith("DECIMAL"),
          concat(lit("f:"), v.cast("double").cast("string")))
        .otherwise(raise_error(concat(
          lit("reference store: unsupported metadata value type "), t)))
    })
    // a missing field is pydantic's default {}; any non-object JSON value
    // is a store the reference could not have written — name it instead
    // of surfacing the map cast's opaque INVALID_VARIANT_CAST
    when(raw.isNull, map().cast("map<string,string>"))
      .when(topType.startsWith("OBJECT"), mapped)
      .otherwise(raise_error(concat(
        lit("reference store: metadata is not a JSON object but "), topType))
        .cast("map<string,string>"))
  }

  /** A parsed LSH index sidecar: the projection matrix adopted verbatim
    * from `.projections.npy` plus the stored bucket assignment (trusted on
    * import exactly like the engine trusts its own stored index keys on
    * open — `rebuildIndexKeys()` is the explicit heal). */
  final case class LshSidecar(
      dimension: Int,
      numProjections: Int,
      randomState: Option[Long],
      vectorIds: Seq[String],
      buckets: Map[Long, Seq[String]],
      matrix: Array[Array[Double]])

  /** Read one library's LSH sidecar pair (`<lib>.json` +
    * `<lib>.projections.npy`). */
  def readLshSidecar(spark: SparkSession, indexesDir: Path,
                     libraryId: String): LshSidecar = {
    val jsonPath = indexesDir.resolve(s"$libraryId.json")
    val npyPath = indexesDir.resolve(s"$libraryId.projections.npy")
    if (!Files.isRegularFile(jsonPath) || !Files.isRegularFile(npyPath))
      throw StorageError(
        s"reference store: missing LSH index sidecar for library $libraryId")
    val row = spark.read.schema(SidecarSchema).option("multiLine", true)
      .json(jsonPath.toString).head()
    // checked extraction: a structurally corrupt sidecar must fail as a
    // named StorageError, not a raw NPE out of an Integer unbox
    def reqInt(field: String): Int =
      if (row.isNullAt(row.fieldIndex(field)))
        throw StorageError(
          s"reference store: sidecar for $libraryId missing '$field'")
      else row.getAs[Int](field)
    val dim = reqInt("dimension")
    val np = reqInt("num_projections")
    // the engine packs the bucket as sign bits of ONE Long (same layout as
    // indexes.py:236-242: bit i = sign of projection i)
    if (np <= 0 || np > 63)
      throw StorageError(
        s"reference store: num_projections $np outside supported range 1..63")
    val matrix = readNpyMatrix(npyPath)
    if (matrix.length != np || matrix.exists(_.length != dim))
      throw StorageError(
        s"reference store: projections.npy shape (${matrix.length}, " +
          s"${matrix.headOption.map(_.length).getOrElse(0)}) does not match " +
          s"sidecar ($np, $dim) for library $libraryId")
    // Row collections come back as scala.collection.Seq (mutable
    // ArraySeq) — convert explicitly, never cast to immutable
    val bucketsRaw =
      Option(row.getAs[Map[String, scala.collection.Seq[String]]]("buckets"))
        .getOrElse(Map.empty)
    val buckets = bucketsRaw.map { case (k, ids) =>
      val b = try k.toLong catch {
        case _: NumberFormatException =>
          throw StorageError(s"reference store: non-numeric bucket id '$k'")
      }
      b -> ids.toSeq
    }
    LshSidecar(dim, np,
      if (row.isNullAt(row.fieldIndex("random_state"))) None
      else Some(row.getAs[Long]("random_state")),
      Option(row.getAs[scala.collection.Seq[String]]("vector_ids"))
        .map(_.toSeq).getOrElse(Seq.empty),
      buckets, matrix)
  }

  /** Minimal NPY (numpy .npy format v1/v2) matrix reader — little-endian
    * float32/float64, C order, 2-D — the exact shape the reference writes
    * for its projection matrices (indexes.py:285, np.save of an
    * (num_projections, dimension) float32 array). Values widen to double
    * (exact for <f4, identity for <f8 — so an engine-exported <f8
    * projection matrix round-trips double-exact). Public format spec:
    * numpy/lib/format.py. Driver-side and O(P x dim) — index metadata,
    * not data. */
  def readNpyMatrix(path: Path): Array[Array[Double]] = {
    val bytes = Files.readAllBytes(path)
    def fail(msg: String): Nothing =
      throw StorageError(s"reference store: $path: $msg")
    if (bytes.length < 10 || bytes(0) != 0x93.toByte ||
        new String(bytes, 1, 5, StandardCharsets.US_ASCII) != "NUMPY")
      fail("not an NPY file")
    val major = bytes(6).toInt
    val (headerLen, headerStart) = major match {
      case 1 =>
        val b = ByteBuffer.wrap(bytes, 8, 2).order(ByteOrder.LITTLE_ENDIAN)
        ((b.getShort & 0xffff, 10))
      case 2 | 3 =>
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      case v => fail(s"unsupported NPY version $v")
    }
    if (headerLen < 0 || headerStart.toLong + headerLen > bytes.length)
      fail("truncated or corrupt NPY header")
    val header = new String(bytes, headerStart, headerLen, StandardCharsets.US_ASCII)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(fail("no descr in header"))
    val fortran = "'fortran_order':\\s*(True|False)".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(fail("no fortran_order in header"))
    if (fortran == "True") fail("fortran_order arrays are unsupported")
    val shape = "'shape':\\s*\\((\\d+),\\s*(\\d+)\\s*\\)".r
      .findFirstMatchIn(header)
      .map(m => (m.group(1).toInt, m.group(2).toInt))
      .getOrElse(fail("shape is not 2-D"))
    val (rows, cols) = shape
    val dataOff = headerStart + headerLen
    val buf = ByteBuffer.wrap(bytes, dataOff, bytes.length - dataOff)
      .order(ByteOrder.LITTLE_ENDIAN)
    val out = Array.ofDim[Double](rows, cols)
    descr match {
      case "<f4" =>
        if (bytes.length - dataOff < rows.toLong * cols * 4) fail("truncated data")
        val fb = buf.asFloatBuffer()
        var i = 0
        while (i < rows) {
          var j = 0
          while (j < cols) { out(i)(j) = fb.get().toDouble; j += 1 }
          i += 1
        }
      case "<f8" =>
        if (bytes.length - dataOff < rows.toLong * cols * 8) fail("truncated data")
        val db = buf.asDoubleBuffer()
        var i = 0
        while (i < rows) {
          db.get(out(i)); i += 1
        }
      case d => fail(s"unsupported dtype $d (expected <f4 or <f8)")
    }
    out
  }

  /** What [[VectorEngine.importReferenceStore]] returns. */
  final case class ImportSummary(
      libraries: Long, documents: Long, chunks: Long, lshIndexes: Int)

  // -------------------------------------------------------------------
  // Write side (VectorEngine.exportReferenceStore)
  // -------------------------------------------------------------------

  /** JSON string escape (same contract as Verify's writer: backslash,
    * quote, all control chars). */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Typed-prefix metadata value back to its JSON form — the exact
    * inverse of the import mapping (and of MetadataFunctions.encodeValue):
    * `s:` -> JSON string, `i:`/`f:` -> JSON number (the stored text IS a
    * valid JSON number for every finite value the engine accepts),
    * `b:` -> JSON boolean. Non-finite floats have no JSON representation
    * (the reference could never have stored one) — loud error. */
  def metaValueToJson(v: String): String = {
    if (v.length < 2 || v.charAt(1) != ':')
      throw StorageError(s"unprefixed metadata value '$v'")
    val body = v.substring(2)
    v.charAt(0) match {
      case 's' => jsonStr(body)
      case 'i' => body
      case 'f' =>
        if (body == "NaN" || body.endsWith("Infinity"))
          throw StorageError(s"non-finite metadata value '$v' has no JSON form")
        body
      case 'b' => body
      case _ => throw StorageError(s"unknown metadata type prefix in '$v'")
    }
  }

  /** A metadata map as a JSON object (keys sorted for determinism). */
  def metaToJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jsonStr(k)}: ${metaValueToJson(v)}" }
      .mkString("{", ", ", "}")

  /** ISO-8601 UTC instant — pydantic parses any ISO precision, and the
    * import side casts it back to the identical timestamp. */
  def isoTs(t: java.sql.Timestamp): String = t.toInstant.toString

  /** Embedding floats as JSON numbers: widening float->double and taking
    * the shortest double repr gives a JSON number that parses back to the
    * identical float32, so export -> reference -> re-import is
    * VALUE-exact. (Not byte-exact: Java and python format some magnitudes
    * differently — 1.0E22 vs 1e+22 — which parses identically but would
    * fail a byte diff. The tests and the oracle gate value equality,
    * which is the contract.) */
  def embeddingToJson(e: Seq[Float]): String =
    e.map(f => {
      val d = f.toDouble
      if (d.isNaN || d.isInfinite)
        throw StorageError("non-finite embedding value has no JSON form")
      d.toString // shortest double repr — always a valid JSON number
    }).mkString("[", ", ", "]")

  /** The fixed 128-byte NPY v1.0 header for a 2-D little-endian C-order
    * array (magic + version + HEADERLEN 118 + padded dict) — ONE home
    * for the layout so both writers share the loud overflow guard: a
    * shape whose dict exceeds the 117-char slot raises a named
    * StorageError instead of a padding surprise. Unreachable for any
    * matrix this engine produces today (a (Long, Int) shape dict tops out
    * well under the slot), guarded anyway. */
  private[graft] def npyHeader(descr: String, n: Long, dim: Int): ByteBuffer = {
    val header =
      s"{'descr': '$descr', 'fortran_order': False, 'shape': ($n, $dim), }"
    if (header.length > 117)
      throw StorageError(
        s"npy header overflow: shape ($n, $dim) dict exceeds the fixed 128-byte slot")
    val padded = header + (" " * (128 - 10 - header.length - 1)) + "\n"
    val hb = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
    hb.put(1.toByte).put(0.toByte)
    hb.putShort(118.toShort)
    hb.put(padded.getBytes(StandardCharsets.US_ASCII))
    hb.flip()
    hb
  }

  /** Minimal NPY v1.0 writer (little-endian, C order, 2-D) — the inverse
    * of [[readNpyMatrix]]. `descr` is "<f4" for vector payloads (exact:
    * the engine stores float32) and "<f8" for the adopted projection
    * matrix (doubles — numpy's load handles either). */
  def writeNpy(path: Path, rows: Iterator[Array[Float]], dim: Int,
               descr: String = "<f4"): Long = {
    try {
      // NPY needs the shape in the header but the row count is only known
      // after streaming, so the data lands first after a FIXED 128-byte
      // header slot and the shape is patched in afterwards (128 bytes
      // holds any shape this engine can produce).
      val ch = java.nio.channels.FileChannel.open(path,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        ch.position(128L)
        val elem = if (descr == "<f8") 8 else 4
        val buf = ByteBuffer.allocate(dim * elem).order(ByteOrder.LITTLE_ENDIAN)
        var n = 0L
        rows.foreach { r =>
          require(r.length == dim, s"row dim ${r.length} != $dim")
          buf.clear()
          if (descr == "<f8") r.foreach(f => buf.putDouble(f.toDouble))
          else r.foreach(buf.putFloat)
          buf.flip()
          while (buf.hasRemaining) ch.write(buf)
          n += 1
        }
        val hb = npyHeader(descr, n, dim)
        ch.position(0L)
        while (hb.hasRemaining) ch.write(hb)
        n
      } finally ch.close()
    } catch {
      case e: IllegalArgumentException => throw e
      case e: VectorDbError => throw e
      case e: Exception => throw StorageError(s"npy write failed: ${e.getMessage}")
    }
  }

  /** Double-matrix variant for the projection sidecar. */
  def writeNpyDoubles(path: Path, rows: Seq[Array[Double]]): Unit = {
    val dim = rows.headOption.map(_.length).getOrElse(0)
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      val header = npyHeader("<f8", rows.length.toLong, dim)
      val body = ByteBuffer.allocate(rows.length * dim * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      rows.foreach(_.foreach(body.putDouble))
      body.flip()
      while (header.hasRemaining) ch.write(header)
      while (body.hasRemaining) ch.write(body)
    } finally ch.close()
  }
}
