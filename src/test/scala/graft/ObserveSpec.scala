package graft

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Pipeline observability — the Spark analog of the reference's
  * operator metrics/accumulators: `Dataset.observe` attaches metric
  * expressions to a plan node and reports them with the SAME pass that
  * computes the query (no second scan — the 100 TB way to count
  * dropped rows, null rates, or bytes seen per stage of a prep
  * pipeline).
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("batch observation reports stage metrics from the computing pass") {
    val t = Engine.Tables(spark, "/root/testdata/sf0.01")
    val obs = Observation("prep_stage")
    // metrics ride the filter stage: rows surviving + quantity mass +
    // null rate of a column the pipeline depends on
    val kept = t.lineitem
      .filter(col("l_quantity") >= 25)
      .observe(obs,
        count(lit(1)).as("rows_kept"),
        sum(col("l_quantity")).as("qty_mass"),
        sum(when(col("l_returnflag").isNull, 1).otherwise(0)).as("null_flags"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val grouped = kept.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = obs.get
    // observed metrics equal an independent recount
    val expectRows = t.lineitem.filter(col("l_quantity") >= 25).count()
    assert(m("rows_kept") == expectRows)
    assert(m("null_flags") == 0L)
    assert(grouped.values.sum == expectRows,
      "observed stage and query output disagree")
    assert(m("qty_mass").asInstanceOf[Double] > 0)
  }

  test("streaming observed metrics surface per micro-batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val df = in.toDF()
      .observe("ingest", count(lit(1)).as("rows"),
        sum(col("value")).as("value_mass"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = df.writeStream.format("memory").queryName("obs_out")
      .outputMode("complete").start()
    try {
      in.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(2), 1, "view", 2.5))
      q.processAllAvailable()
      in.addData(Event(3, ts(3), 2, "click", 4.0))
      q.processAllAvailable()
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest")))
        .map(r => (r.getAs[Long]("rows"), r.getAs[Double]("value_mass")))
      // two non-empty batches, each reporting its own ingest counts
      assert(observed.contains((2L, 3.5)), s"batch-1 metrics missing: $observed")
      assert(observed.contains((1L, 4.0)), s"batch-2 metrics missing: $observed")
    } finally q.stop()
  }
}
