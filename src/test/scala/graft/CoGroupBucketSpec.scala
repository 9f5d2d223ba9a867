package graft

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 coGroup (KeyValueGroupedDataset.cogroup) and §2.10 bucketed
  * tables for shuffle-free co-located joins.
  */
class CoGroupBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("partitioning primitives: keyBy/rebalance/global/custom partitioner") {
    import spark.implicits._
    val t = Engine.Tables(spark, "/root/testdata/sf0.001")
    val orders = t.orders.select(col("o_orderkey"), col("o_custkey"))

    // keyBy → repartition(col): same key lands in one partition
    val keyed = orders.repartition(8, col("o_custkey"))
    val spread = keyed
      .groupBy(col("o_custkey"), spark_partition_id().as("pid"))
      .count()
      .groupBy(col("o_custkey")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(spread == 1L, "a key must map to exactly one partition")

    // rebalance → round-robin repartition(n): near-uniform partitions
    val rebalanced = orders.repartition(8)
    val sizes = rebalanced
      .groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max - sizes.min <= math.max(2, sizes.max / 10),
      s"rebalance imbalance: ${sizes.mkString(",")}")

    // global → repartition(1)
    assert(orders.repartition(1).rdd.getNumPartitions == 1)

    // partitionCustom → RDD partitionBy with a custom Partitioner
    val custom = new org.apache.spark.Partitioner {
      def numPartitions: Int = 4
      def getPartition(key: Any): Int =
        (key.asInstanceOf[Long] % 2).toInt * 2 // only partitions 0 and 2
    }
    val parted = orders
      .select(col("o_custkey"), col("o_orderkey"))
      .as[(Long, Long)].rdd
      .partitionBy(custom)
    assert(parted.getNumPartitions == 4)
    val usedParts = parted
      .mapPartitionsWithIndex((i, it) => Iterator.single((i, it.nonEmpty)))
      .collect().filter(_._2).map(_._1).toSet
    assert(usedParts == Set(0, 2), s"custom partitioner routed to $usedParts")
  }

  test("cogroup merges two keyed streams like the join-based rewrite") {
    import spark.implicits._
    val t = Engine.Tables(spark, "/root/testdata/sf0.001")
    val events = t.events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val signups = events.filter(_.event_type == "signup").groupByKey(_.user_id)
    val purchases = events.filter(_.event_type == "purchase").groupByKey(_.user_id)
    val viaCogroup = signups
      .cogroup(purchases) { (user, s, p) =>
        val ns = s.size; val np = p.size
        if (ns > 0 || np > 0) Iterator.single((user, ns, np)) else Iterator.empty
      }
      .collect()
      .toSet
    val viaAgg = t.events
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("ns"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("np")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt))
      .toSet
    assert(viaCogroup == viaAgg)
  }

  test("bucketed tables join without a shuffle") {
    // warehouse.dir is a static conf — tables land in the default
    // ./spark-warehouse (gitignored) and are dropped at the end; also
    // clear leftover locations (in-memory catalog forgets the tables
    // between JVMs but the directories survive)
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    for (d <- Seq("spark-warehouse/orders_bkt", "spark-warehouse/customer_bkt")) {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
    val t = Engine.Tables(spark, "/root/testdata/sf0.001")
    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    t.customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // the dim is small enough to auto-broadcast (which would be the
    // right plan in production); disable broadcast so the test shows
    // the bucketed SMJ path a large-dim join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try {
        val joined = spark.table("orders_bkt")
          .join(spark.table("customer_bkt"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
        joined.collect()
        joined.queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // co-located bucketed join: no Exchange on the join keys anywhere
    // (the aggregation above the join still shuffles on its own key)
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still shuffles on the join keys:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans not bucketed:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
  }
}
