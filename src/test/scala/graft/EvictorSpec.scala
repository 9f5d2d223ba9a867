package graft

import graft.operators.EvictorQueries
import graft.streaming.Evictors
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Evictor semantics: the streaming buffered-window operator must
  * match the batch ranking/window-max formulation (the DuckDB-checked
  * oracle queries), and the trigger surface includes processing-time
  * continuous firing.
  */
class EvictorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val dir = "/root/testdata/sf0.001"
  private val hourMs = 3600L * 1000

  test("pure evictors keep the contracted elements") {
    def ev(id: Long, m: Int, v: Double) =
      Event(id, Timestamp.valueOf(f"2024-01-01 00:${m}%02d:00"), 1, "a", v)
    val evs = Seq(ev(1, 0, 1.0), ev(2, 10, 2.0), ev(3, 20, 3.0), ev(4, 30, 4.0))
    assert(Evictors.evictCount(evs, 2).map(_.event_id) == Seq(3L, 4L))
    assert(Evictors.evictTime(evs, 15L * 60 * 1000).map(_.event_id).sorted == Seq(3L, 4L))
    // delta vs the last element (value 4.0): keep within 2.0
    assert(Evictors.evictDelta(evs, 2.0).map(_.event_id).sorted == Seq(3L, 4L))
    assert(Evictors.evictCount(Seq.empty, 2).isEmpty)
    assert(Evictors.evictTime(Seq.empty, 1000L).isEmpty)
    assert(Evictors.evictDelta(Seq.empty, 1.0).isEmpty)
  }

  test("streaming delta evictor equals the batch last-value formulation") {
    val got = runStreaming(Evictors.evictDelta(_, 50.0), "evict_delta_out")
    val expected = batchExpected("q_evictor_delta")
    assert(got.size == expected.size, s"${got.size} windows vs ${expected.size}")
    expected.foreach { case (k, (n, sv)) =>
      val (gn, gsv) = got(k)
      assert(gn == n, s"window $k kept $gn vs $n")
      assert(math.abs(gsv - sv) < 1e-3, s"window $k sum $gsv vs $sv")
    }
  }

  private def runStreaming(
      evict: Seq[Event] => Seq[Event],
      queryName: String
  ): Map[(Long, Long), (Long, Double)] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val all = Engine.Tables(spark, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val mid = all(all.length / 2).ts
    // sentinel far past the data pushes the watermark so every real
    // window closes; its own (far-future) window never emits
    val sentinel =
      Event(-1L, new Timestamp(all.last.ts.getTime + 30L * 24 * hourMs), 999999L, "x", 0.0)
    val in = MemoryStream[Event]
    val q = Evictors
      .evictedTumblingAggregate(in.toDS(), hourMs, "10 minutes", evict)
      .writeStream.format("memory").queryName(queryName).outputMode("append").start()
    try {
      in.addData(all.filter(!_.ts.after(mid)).toIndexedSeq)
      q.processAllAvailable()
      in.addData(all.filter(_.ts.after(mid)).toIndexedSeq)
      q.processAllAvailable()
      in.addData(sentinel)
      q.processAllAvailable()
      // one more empty-ish pass so timers see the final watermark
      in.addData(sentinel.copy(event_id = -2L))
      q.processAllAvailable()
      spark
        .sql(s"SELECT user_id, win_start, n_kept, sv FROM $queryName")
        .collect()
        .filter(_.getLong(0) != 999999L)
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
    } finally q.stop()
  }

  private def batchExpected(name: String): Map[(Long, Long), (Long, Double)] =
    EvictorQueries.defs
      .find(_.name == name).get
      .builder(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap

  test("streaming count evictor equals the batch ranking formulation") {
    val got = runStreaming(Evictors.evictCount(_, 3), "evict_count_out")
    val expected = batchExpected("q_evictor_count")
    assert(got.size == expected.size, s"${got.size} windows vs ${expected.size}")
    expected.foreach { case (k, (n, sv)) =>
      val (gn, gsv) = got(k)
      assert(gn == n, s"window $k kept $gn vs $n")
      assert(math.abs(gsv - sv) < 1e-3, s"window $k sum $gsv vs $sv")
    }
  }

  test("streaming time evictor equals the batch window-max formulation") {
    val got = runStreaming(Evictors.evictTime(_, 10L * 60 * 1000), "evict_time_out")
    val expected = batchExpected("q_evictor_time")
    assert(got.size == expected.size, s"${got.size} windows vs ${expected.size}")
    expected.foreach { case (k, (n, sv)) =>
      val (gn, gsv) = got(k)
      assert(gn == n, s"window $k kept $gn vs $n")
      assert(math.abs(gsv - sv) < 1e-3, s"window $k sum $gsv vs $sv")
    }
  }

  test("processing-time continuous trigger fires periodically") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ev(id: Long, m: Int, v: Double) =
      Event(id, Timestamp.valueOf(f"2024-01-01 00:${m}%02d:00"), 1, "a", v)
    val in = MemoryStream[Event]
    // the SS ProcessingTime trigger is the engine-level analog of the
    // reference's ContinuousProcessingTimeTrigger: emit current window
    // contents every interval regardless of event time
    val q = StreamingOps.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("cont_out")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(ev(1, 0, 1.0), ev(2, 5, 2.0))
      q.processAllAvailable()
      val afterFirst = spark.sql("SELECT sum(n) FROM cont_out").collect()(0).getLong(0)
      assert(afterFirst == 2L)
      in.addData(ev(3, 10, 3.0))
      q.processAllAvailable()
      val afterSecond = spark.sql("SELECT sum(n) FROM cont_out").collect()(0).getLong(0)
      assert(afterSecond == 3L) // complete mode re-emits the refreshed window
    } finally q.stop()
  }
}
