package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video payloads ride as opaque BINARY columns with typed metadata
  * structs; decode/feature-extraction runs per partition over batches.
  *
  * The decode step is a STUB — the real codec libraries (image/audio) are
  * not available in this environment, so `decodeStub` derives
  * deterministic fake dimensions from a content hash. Everything around
  * it — the binary column, the metadata schema, the per-partition batch
  * shape, the frame sampling arithmetic — is real Spark plumbing, tested
  * and oracle-checked, and the stub swaps for a real codec without
  * touching the plan structure.
  */
object Multimodal {

  /** Decoded-asset metadata (what a real image decode would emit). */
  final case class AssetMeta(id: Long, modality: String, n_bytes: Long,
                             sha: String, width: Int, height: Int,
                             n_frames: Long)

  val FrameBytes = 16

  /** Deterministic fake "decode": dimensions derived from the sha256 of
    * the payload. REPLACE with a real codec (e.g. javax.imageio /
    * ffmpeg bindings) in production — the signature is the contract. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    (1 + (sha(0) & 0x3f), 1 + (sha(1) & 0x3f))
  }

  /** Column twin of decodeStub (same sha256-prefix arithmetic) so the
    * whole feature projection can also run without leaving codegen. */
  def fakeWidth(content: Column): Column =
    (conv(substring(sha2(content, 256), 1, 2), 16, 10).cast("int")
      .bitwiseAND(lit(0x3f)) + 1).cast("int")

  def fakeHeight(content: Column): Column =
    (conv(substring(sha2(content, 256), 3, 2), 16, 10).cast("int")
      .bitwiseAND(lit(0x3f)) + 1).cast("int")

  /** Feature projection over a binary `content` column: byte length,
    * content hash, stub-decoded dimensions, frame count (fixed-size
    * frame sampling arithmetic). Pure projection — scales as a scan. */
  def features(df: DataFrame, id: Column, content: Column,
               modality: Column): DataFrame =
    df.select(
      id.as("id"),
      modality.as("modality"),
      length(content).cast("long").as("n_bytes"),
      sha2(content, 256).as("sha"),
      fakeWidth(content).as("width"),
      fakeHeight(content).as("height"),
      ceil(length(content).cast("double") / FrameBytes).cast("long").as("n_frames"))

  /** Per-partition decode path (the Scala analog of a batched Pandas UDF):
    * the executor sees an iterator of rows per partition and can hold one
    * codec context per partition — the right shape for native decoders.
    * Uses decodeStub today. */
  def decodePartitions(ds: Dataset[(Long, String, Array[Byte])]): Dataset[AssetMeta] = {
    implicit val enc: Encoder[AssetMeta] = Encoders.product[AssetMeta]
    ds.mapPartitions { rows =>
      // one digest instance per partition, reused across the batch
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { case (id, modality, bytes) =>
        val (w, h) = decodeStub(bytes)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        AssetMeta(id, modality, bytes.length.toLong, sha, w, h,
          math.ceil(bytes.length.toDouble / FrameBytes).toLong)
      }
    }
  }

  /** Fixed-size frame sampling: slice the payload into FrameBytes-wide
    * frames, exploded with their index — the plumbing a video
    * frame-sampler needs (slice boundaries, order, per-frame rows). */
  def sampleFrames(df: DataFrame, id: Column, content: Column): DataFrame = {
    val nFrames = ceil(length(content).cast("double") / FrameBytes).cast("int")
    val frames = when(col("n") > 0,
      transform(sequence(lit(0), col("n") - 1),
        i => col("content").substr(i * FrameBytes + lit(1), lit(FrameBytes))))
      .otherwise(array().cast("array<binary>"))
    df.select(id.as("id"), content.as("content"), nFrames.as("n"))
      .select(col("id"), posexplode(frames).as(Seq("frame_index", "frame")))
  }
}
