package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque binary columns plus typed metadata, and
  * decode/feature-extract runs per partition so a real codec would
  * amortize its init cost across a partition's rows.
  *
  * The container has no image/audio libraries, so [[StubDecoder]] is a
  * clearly-marked deterministic fake; everything around it — schema,
  * Dataset encoders, mapPartitions batch shape, partition-level
  * decoder lifecycle — is the real pipeline a codec would drop into.
  */
object MediaPipeline {

  /** A media record as it enters the pipeline. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      media_type: String
  )

  /** Extracted features (what a decoder + featurizer would emit). */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double
  )

  /** STUB: stands in for an image/audio decoder (none installed in
    * this environment). Deterministic in the payload bytes so tests
    * and reruns agree. A real implementation would decode the payload
    * and measure the actual frame.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      val w = 1 + (if (n == 0) 0 else (payload(0) & 0xff)) * 7 % 640
      val h = 1 + n * 13 % 480
      var sum = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      (w, h, 3, mean)
    }
  }

  /** documents → media records (text bytes standing in for payloads). */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    import documents.sparkSession.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("image/fake").as("media_type")
      )
      .as[MediaRecord]
  }

  /** Decode + featurize, one decoder per partition (the expensive
    * init a real codec needs happens once per partition, not per row).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (w, h, c, mean) = StubDecoder.decode(r.payload)
        MediaFeatures(r.media_id, r.payload.length, w, h, c, mean)
      }
    }
  }

  /** Resized media (STUB: a real impl re-encodes the payload; the fake
    * clamps the stub dimensions and keeps the payload opaque). The
    * Spark-side shape — per-partition transform preserving the binary
    * column — is the real thing.
    */
  final case class ResizedMedia(
      media_id: Long,
      payload: Array[Byte],
      width: Int,
      height: Int
  )

  def resize(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _, _) = StubDecoder.decode(r.payload)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        ResizedMedia(
          r.media_id,
          r.payload, // STUB: a real resize would re-encode
          math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt)
        )
      }
    }
  }

  /** Frame sampling for video-like payloads (STUB decode): emit every
    * k-th fixed-size chunk of the payload as a "frame" row — one input
    * row fans out to many, the shape a video pipeline needs.
    */
  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], chunkSize: Int, everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload
        .grouped(chunkSize)
        .zipWithIndex
        .collect { case (chunk, i) if i % everyK == 0 => Frame(r.media_id, i, chunk) }
    }
  }
}
