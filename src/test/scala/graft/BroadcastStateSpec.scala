package graft

import graft.operators.MediaPipeline
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicReference

/** Broadcast-state pattern (reference DataStream.broadcast /
  * BroadcastState: a control stream updates replicated state that a
  * data stream reads) — in Spark the idiomatic analog is a per-
  * micro-batch refreshed broadcast side inside foreachBatch. Plus the
  * media resize / frame-sample plumbing.
  */
class BroadcastStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:${m}%02d:00")

  test("broadcast-state pattern: per-batch refreshed dim enriches the stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // mutable "control state" the driver refreshes between batches
    val rules = new AtomicReference[Map[String, Double]](Map("click" -> 1.0))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]

    val in = MemoryStream[Event]
    val q = in.toDF().writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // re-broadcast the current rules each micro-batch
      val dim = batch.sparkSession
        .createDataFrame(rules.get().toSeq)
        .toDF("event_type", "weight")
      val scored = batch
        .join(broadcast(dim), Seq("event_type"), "left")
        .select(col("event_id"), coalesce(col("weight"), lit(0.0)).as("w"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      collected.synchronized { collected ++= scored }
      ()
    }.start()
    try {
      in.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(1), 1, "view", 0))
      q.processAllAvailable()
      rules.set(Map("click" -> 1.0, "view" -> 5.0)) // control update
      in.addData(Event(3, ts(2), 1, "view", 0))
      q.processAllAvailable()
    } finally q.stop()
    val byId = collected.toMap
    assert(byId(1L) == 1.0) // known rule
    assert(byId(2L) == 0.0) // unknown at batch-1 time
    assert(byId(3L) == 5.0) // sees the refreshed broadcast state
  }

  test("media resize clamps dimensions and keeps payload opaque") {
    val docs = Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val media = MediaPipeline.mediaFromDocuments(docs)
    val resized = MediaPipeline.resize(media, maxW = 100, maxH = 100).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width <= 100 && r.height <= 100 && r.width >= 1 && r.height >= 1)
      assert(r.payload.nonEmpty)
    }
  }

  test("frame sampling fans one payload into every-k chunks") {
    val docs = Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val media = MediaPipeline.mediaFromDocuments(docs)
    val frames = MediaPipeline.sampleFrames(media, chunkSize = 32, everyK = 2)
    val byMedia = frames.collect().groupBy(_.media_id)
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      assert(fs.map(_.frame_no).forall(_ % 2 == 0))
      assert(fs.forall(_.frame_bytes.length <= 32))
    }
  }
}
