package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns plus typed metadata, with decode / feature-extract implemented as
 * partition-local typed transforms.
 *
 * The actual codec step is STUBBED (this container has no image/audio
 * libraries): `decodeStub` derives deterministic fake metadata from the raw
 * bytes. Everything around it — schema, batch shape, partition-local
 * execution, the typed Dataset API — is the real plumbing a production decode
 * (JNI codec / ONNX feature extractor) would drop into.
 *
 * Scale design: decode runs via `mapPartitions` so per-partition
 * setup (codec init) amortizes across rows; binary payloads never shuffle —
 * repartitioning happens BEFORE attaching heavy columns, and extracted
 * features are small fixed-size vectors.
 */
object MultimodalOps {

  /** One media row: opaque payload + envelope metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted metadata/features (what a real decoder would emit). */
  final case class MediaMeta(
      media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB decode: deterministic pseudo-metadata from payload bytes.
    * A real implementation replaces only this function (per-partition codec
    * handle, same signature). */
  def decodeStub(r: MediaRow): MediaMeta = {
    val len = r.payload.length
    // FNV-1a over the payload — cheap deterministic checksum
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < len) { h = (h ^ (r.payload(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    val w = 16 + math.floorMod(h, 640L).toInt
    MediaMeta(r.media_id, r.kind, len,
      width = w,
      height = 16 + math.floorMod(h >>> 16, 480L).toInt,
      n_frames = if (r.kind == "video") 1 + math.floorMod(h >>> 32, 300L).toInt else 1,
      checksum = h)
  }

  /** Decode a media table: binary in, typed metadata out. Partition-local,
    * no shuffle; real decoder slots into `decodeStub`. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame index up
    * to n_frames — the Spark-side shape of a frame-extraction fan-out
    * (explode AFTER decode, so the binary never multiplies). */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Build a deterministic media table from a text corpus (test/bench
    * stand-in: payload = utf8 bytes). Demonstrates the binary-column schema. */
  def mediaFromDocs(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col(idCol)), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
