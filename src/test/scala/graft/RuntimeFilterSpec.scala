package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst runtime bloom-filter injection (InjectRuntimeFilter): on a
  * shuffle join whose creation side carries a selective predicate, the
  * optimizer builds a bloom filter of the dim keys and pushes a
  * might_contain probe onto the fact scan — rows that cannot join are
  * dropped BEFORE the shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~1% that survives
  * the dim filter; the engine relies on Catalyst for it (delegation,
  * not reimplementation), and this spec pins down that the delegation
  * actually fires under the engine's session configuration.
  *
  * The thresholds are test-scale overrides: the application-side scan
  * must look "big" (default gate is 10 GB) for injection to trigger.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.get

  private def shape(s: SparkSession): DataFrame = {
    val orders = s.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("bloom runtime filter is injected on the fact side of a shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val df = shape(spark)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom-filter probe in:\n$optimized")
      val withFilter = df.collect().map(_.toString).sorted.toSeq

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = shape(spark)
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      val withoutFilter = plain.collect().map(_.toString).sorted.toSeq
      assert(withFilter == withoutFilter, "bloom filter must not change results")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
