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
}
