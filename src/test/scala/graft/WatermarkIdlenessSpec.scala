package graft

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Watermark idleness (reference `WatermarkStrategy.java:133-182`
  * `withIdleness` — an idle source is excluded from the combined
  * watermark so it cannot stall event time forever). Spark's
  * equivalent knob is `spark.sql.streaming.multipleWatermarkPolicy`:
  * with the default `min`, a silent input holds the global watermark
  * at its last value (Flink WITHOUT idleness — safe, stalls); with
  * `max`, the active input drives the watermark forward (Flink WITH
  * idleness — live, late rows from the idle side may be dropped).
  * These tests pin both behaviors on a two-source union so the
  * mapping is verified, not just documented.
  *
  * The mapping is deliberately LOOSER than the reference's: Flink's
  * withIdleness only excludes a source after its idle timeout elapses
  * and re-admits it on the next record, whereas `max` ALWAYS lets the
  * fastest source advance the global watermark — including past an
  * ACTIVE-but-slower source, whose in-flight late rows are then
  * dropped. Flink without idleness never drops those. Pipelines whose
  * sources run at genuinely different event-time speeds must stay on
  * `min` (and accept stalls) or debounce the slow source upstream.
  */
class WatermarkIdlenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  /** Windowed count over the union of an active and an idle stream;
    * returns the append-mode (closed-window) output rows.
    */
  private def closedWindows(policy: String, name: String): Seq[(Long, Long)] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
    try {
      val active = MemoryStream[Event]
      val idle = MemoryStream[Event]
      val u = active.toDF().withWatermark("ts", "0 seconds")
        .unionByName(idle.toDF().withWatermark("ts", "0 seconds"))
      val agg = u
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("w"), col("n"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        active.addData(Event(1, ts(5), 1, "click", 1.0),
          Event(2, ts(15), 1, "click", 1.0))
        q.processAllAvailable()
        // active side's watermark sails past both windows; idle side
        // has never produced a row
        active.addData(Event(3, ts(65), 1, "click", 1.0))
        q.processAllAvailable()
      } finally q.stop()
      spark.sql(s"SELECT w, n FROM $name ORDER BY w").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    } finally
      spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
  }

  test("default min policy: an idle input stalls the combined watermark") {
    assert(closedWindows("min", "idle_min").isEmpty)
  }

  test("max policy = withIdleness: the active input advances the watermark") {
    val rows = closedWindows("max", "idle_max")
    assert(rows.map(_._2) === Seq(1L, 1L)) // [0,10) and [10,20) closed
  }
}
