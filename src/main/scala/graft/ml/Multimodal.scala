package graft.ml

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary payloads
  * with typed metadata, and a decode → feature-extract stage shaped the way
  * a real pipeline would run it at 100 TB:
  *
  *  - payloads stay binary end-to-end (never stringified);
  *  - work happens in `mapPartitions` so a real decoder would amortize
  *    per-batch init (codec contexts, model weights) across a partition —
  *    the JVM twin of `mapInPandas` batch semantics;
  *  - records are co-partitioned by `media_id` before feature extraction so
  *    a downstream join against labels/captions is shuffle-free.
  *
  * The codec itself is a STUB: this container has no image/audio libraries,
  * so `decodeStub` derives a deterministic fake "signal" from the bytes.
  * Swap `decodeStub` for a real decoder (JNI/ffmpeg/ImageIO) without
  * touching any of the Spark plumbing — that boundary is the point.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      // fixed-dim feature vector a real encoder would emit
      features: Array[Float],
      // per-frame/chunk sample offsets ("frame sampling")
      frame_offsets: Array[Long])

  val FeatureDim = 16

  /** STUB decode: a real implementation would decode pixels/samples here.
    * Deterministic fake: fold the byte histogram into FeatureDim buckets
    * and L2-normalize — stable across runs and partitionings.
    */
  private[ml] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val norm = math.sqrt(acc.map(v => v.toDouble * v).sum).toFloat
    if (norm == 0f) acc else acc.map(_ / norm)
  }

  /** "Frame sampling": n evenly spaced byte offsets (a video decoder would
    * seek keyframes; the offsets contract is identical).
    */
  private[ml] def sampleOffsets(size: Long, n: Int): Array[Long] =
    if (size <= 0 || n <= 0) Array.empty
    else Array.tabulate(n)(i => i * size / n)

  /** The featurize stage. Narrow (no shuffle) unless `coPartitions` is set,
    * in which case records are hash-repartitioned by media_id first (do
    * this when the next stage joins on media_id at scale).
    */
  def featurize(records: Dataset[MediaRecord], frames: Int = 4,
      coPartitions: Option[Int] = None): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    val partitioned = coPartitions
      .map(n => records.repartition(n, col("media_id")))
      .getOrElse(records)
    partitioned.mapPartitions { it =>
      // per-partition init of a real codec would happen HERE, once
      it.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.payload.length.toLong,
          features = decodeStub(r.payload),
          frame_offsets = sampleOffsets(r.payload.length.toLong, frames))
      }
    }
  }

  /** Demo source: wrap the documents table's text bytes as fake media
    * payloads (the container has no real media files).
    */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }
}
