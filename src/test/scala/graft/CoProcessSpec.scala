package graft

import graft.operators.MiscQueries.{CoOrder, CoSegment}
import graft.streaming.CoProcess
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Two-input keyed coprocess: shared per-key state visible from both
  * sides, control-before-data ordering within a batch, and state
  * updates taking effect across micro-batches.
  */
class CoProcessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("coprocess enriches a data stream from control-stream state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val orders = MemoryStream[CoOrder]
    val controls = MemoryStream[CoSegment]
    val q = CoProcess
      .connect(orders.toDS(), controls.toDS())(_.o_custkey, _.c_custkey)(
        onLeft = (k, o, st: Option[String]) =>
          (st, Seq((o.o_orderkey, k, st.getOrElse("unknown"), o.o_totalprice))),
        onRight = (_, c, _: Option[String]) =>
          (Some(c.c_mktsegment), Seq.empty[(Long, Long, String, Double)])
      )
      .toDF("order_key", "cust_key", "segment", "total")
      .writeStream.format("memory").queryName("coproc_out").outputMode("append").start()
    try {
      // batch 1: order before any control → unknown; control for key 2
      orders.addData(CoOrder(100, 1, 10.0))
      controls.addData(CoSegment(2, "BUILDING"))
      q.processAllAvailable()
      // batch 2: key 2's order sees the state set last batch; key 1
      // still has none
      orders.addData(CoOrder(101, 2, 20.0), CoOrder(102, 1, 30.0))
      q.processAllAvailable()
      // batch 3: control update overrides key 2, order in the SAME
      // batch sees the new value (control-before-data ordering)
      controls.addData(CoSegment(2, "MACHINERY"))
      orders.addData(CoOrder(103, 2, 40.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT order_key, segment FROM coproc_out ORDER BY order_key")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq(
        (100L, "unknown"),
        (101L, "BUILDING"),
        (102L, "unknown"),
        (103L, "MACHINERY")
      ))
    } finally q.stop()
  }

  test("both sides can emit and clear state") {
    import spark.implicits._
    // bounded run: right side emits an ack per control row; left side
    // clears state after consuming it once
    val left = Seq(CoOrder(1, 7, 1.0), CoOrder(2, 7, 2.0)).toDS()
    val right = Seq(CoSegment(7, "AUTOMOBILE")).toDS()
    val out = CoProcess
      .connect(left, right)(_.o_custkey, _.c_custkey)(
        onLeft = (_, o, st: Option[String]) =>
          (Option.empty[String], Seq(s"order:${o.o_orderkey}:${st.getOrElse("none")}")),
        onRight = (k, c, _: Option[String]) => (Some(c.c_mktsegment), Seq(s"ack:$k"))
      )
      .collect().sorted
    // first order consumes the state and clears it; second sees none
    assert(out.toSeq == Seq("ack:7", "order:1:AUTOMOBILE", "order:2:none"))
  }
}
