package graft

import graft.functions.{MGSummary, MisraGriesAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitters sketch: the classic guarantees hold
  * regardless of partitioning/merge order, and the propose-then-verify
  * query built on it (q_text_heavy_hitters) is exactly deterministic.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val Capacity = 256
  private val Phi = 0.01

  private def words(sf: String) = {
    val t = Engine.Tables(spark, s"/root/testdata/$sf")
    t.documents
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
  }

  private def sketch(sf: String, parts: Int): MGSummary = {
    val mg = udaf(new MisraGriesAgg(Capacity))
    words(sf)
      .repartition(parts)
      .agg(mg(col("word")).as("sk"))
      .selectExpr("sk.total AS total", "sk.counts AS counts")
      .as[MGSummary](org.apache.spark.sql.Encoders.product[MGSummary])
      .head()
  }

  private def exactCounts(sf: String): Map[String, Long] =
    words(sf).groupBy(col("word")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("candidate set contains every true phi-heavy hitter; size <= capacity") {
    val sk = sketch("sf0.001", 7)
    val exact = exactCounts("sf0.001")
    val n = exact.values.sum
    assert(sk.total == n, s"sketch total ${sk.total} != $n")
    assert(sk.counts.size <= Capacity)
    val heavy = exact.filter { case (_, c) => c >= Phi * n }.keySet
    assert(heavy.nonEmpty, "test corpus should have >=1 heavy hitter")
    val missed = heavy -- sk.counts.keySet
    assert(missed.isEmpty, s"MG guarantee violated, missed: $missed")
  }

  test("per-candidate undercount bounded by n/capacity; never overcounts") {
    val sk = sketch("sf0.001", 7)
    val exact = exactCounts("sf0.001")
    val bound = sk.total.toDouble / Capacity
    sk.counts.foreach { case (w, est) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est <= truth, s"$w: est $est > exact $truth")
      assert(truth - est <= bound, s"$w: undercount ${truth - est} > $bound")
    }
  }

  test("streaming MG aggregation upholds the guarantees across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val mg = org.apache.spark.sql.functions.udaf(new MisraGriesAgg(Capacity))
    val agg = in.toDF().toDF("word")
      .agg(mg(col("word")).as("sk"))
      .selectExpr("sk.total AS total", "map_keys(sk.counts) AS cands")
    val q = agg.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    val all = words("sf0.001").collect().map(_.getString(0))
    val (b1, b2) = all.splitAt(all.length / 2)
    try {
      in.addData(b1.toSeq)
      q.processAllAvailable()
      in.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val row = spark.sql("SELECT total, cands FROM mg_stream").collect()(0)
    val exact = exactCounts("sf0.001")
    val n = exact.values.sum
    assert(row.getLong(0) == n, "streaming sketch lost rows across batches")
    val heavy = exact.filter { case (_, c) => c >= Phi * n }.keySet
    val cands = row.getSeq[String](1).toSet
    assert((heavy -- cands).isEmpty,
      s"streaming MG missed heavy hitters: ${heavy -- cands}")
    assert(cands.size <= Capacity)
  }

  test("verified heavy-hitter output is partitioning-invariant and exact") {
    def verified(parts: Int): Set[(String, Long)] = {
      val sk = sketch("sf0.001", parts)
      val cands = sk.counts.keySet.toSeq
      words("sf0.001")
        .filter(col("word").isin(cands: _*))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= lit(Phi) * lit(sk.total.toDouble))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val a = verified(3)
    val b = verified(13)
    assert(a == b, "verified output differs across partitionings")
    val exact = exactCounts("sf0.001")
    val n = exact.values.sum
    val truth = exact.collect {
      case (w, c) if c >= Phi * n => (w, c)
    }.toSet
    assert(a == truth, "verified output != exact heavy hitters")
  }
}
