package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the point of Morton-interleaving two dimensions is
  * that EVERY bucket stays narrow on BOTH columns — that is what makes
  * parquet footer min/max stats skip files for predicates on either
  * dimension. A single-column sort gives narrow buckets on that column
  * and full-range buckets on the other.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("z-order buckets are narrow on BOTH dimensions; 1-dim sort is not") {
    val stats = SparkEntry.queries("q_layout_zorder")(spark, dir)
      .collect()
    assert(stats.length > 100, s"expected many z-buckets, got ${stats.length}")
    val li = Engine.Tables(spark, dir).lineitem.select(
      datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01")))
        .cast("long").as("d_day"),
      col("l_partkey").as("pk"))
    val g = li.agg(
      (max(col("d_day")) - min(col("d_day"))).as("day_range"),
      (max(col("pk")) - min(col("pk"))).as("pk_range")).collect()(0)
    val dayRange = g.getLong(0).toDouble
    val pkRange = g.getLong(1).toDouble
    def avgSpread(minC: String, maxC: String): Double = {
      val s = stats.map(r => (r.getAs[Long](maxC) - r.getAs[Long](minC)).toDouble)
      s.sum / s.length
    }
    // a bucket fixes the top 5 quantized bits of each dim -> ~1/32 of
    // each range; demand well under 20%
    val daySpread = avgSpread("min_day", "max_day") / dayRange
    val pkSpread = avgSpread("min_pk", "max_pk") / pkRange
    assert(daySpread < 0.2, s"z-order day spread $daySpread")
    assert(pkSpread < 0.2, s"z-order pk spread $pkSpread")
    // contrast: bucket the day-SORTED table into the same bucket count
    // — pk stays unclustered (near the full range per bucket)
    val nBuckets = stats.length
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("d_day"))
    val sorted1d = li
      .withColumn("grp", pmod(col("pk"), lit(1)))   // single group
      .withColumn("rn", row_number().over(w))
    val total = li.count()
    val perBucket = math.max(1L, total / nBuckets)
    val sortedStats = sorted1d
      .groupBy(((col("rn") - 1) / lit(perBucket)).cast("long").as("b"))
      .agg((max(col("pk")) - min(col("pk"))).as("spread"))
      .agg(avg(col("spread"))).collect()(0).getDouble(0)
    assert(sortedStats / pkRange > 0.5,
      s"1-dim sort unexpectedly clustered pk: ${sortedStats / pkRange}")
  }

  test("z-ordered WRITE produces parquet files narrow on both dimensions") {
    import graft.functions.ZOrder
    val li = Engine.Tables(spark, dir).lineitem.select(
      datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01")))
        .cast("long").as("d_day"),
      col("l_partkey").as("pk"))
    val out = "/tmp/graft_zorder_write_spec"
    // the public operator surface: bounds pass + Morton value +
    // range-partition + in-partition sort, one parquet file per
    // partition — each file's footer min/max stays narrow on BOTH
    // columns
    ZOrder.writeZOrdered(li, "d_day", "pk", out, bits = 8, numFiles = 32)
    val written = spark.read.parquet(out)
    // the layout column is internal: the written schema is the input's
    assert(written.columns.sorted.toSeq == Seq("d_day", "pk"))
    val perFile = written
      .groupBy(input_file_name().as("f"))
      .agg(
        (max(col("d_day")) - min(col("d_day"))).as("day_spread"),
        (max(col("pk")) - min(col("pk"))).as("pk_spread"))
      .collect()
    assert(perFile.length >= 16, s"expected many files, got ${perFile.length}")
    val g = li.agg(
      (max(col("d_day")) - min(col("d_day"))).as("dr"),
      (max(col("pk")) - min(col("pk"))).as("pr")).collect()(0)
    def avgOf(c: String) =
      perFile.map(_.getAs[Long](c).toDouble).sum / perFile.length
    val dayFrac = avgOf("day_spread") / g.getLong(0)
    val pkFrac = avgOf("pk_spread") / g.getLong(1)
    // 32 range partitions over a 16-bit z: each file spans ~1/sqrt(32)
    // of each dimension's range at worst; demand well under 40%
    assert(dayFrac < 0.4, s"file day spread $dayFrac")
    assert(pkFrac < 0.4, s"file pk spread $pkFrac")
  }
}
