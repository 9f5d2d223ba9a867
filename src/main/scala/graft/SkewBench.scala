package graft

import graft.skew.{AdaptiveReshape, AdaptiveSalter, ReshapeConfig, SaltedAggregation, SkewMonitor}
import org.apache.spark.sql.functions._

/** Skew micro-benchmark mirroring the reference's experiment (zipf-
  * keyed join-with-static; BASELINE.md "Skew micro-benchmark"): runs
  * the hot-key workload with mitigation off and on, asserts
  * result-identity, and reports the load-balance metrics the Reshape
  * controller optimizes (max/mean partition load). Prints one JSON
  * line.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-skewbench")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Engine.Tables(spark, sfDir)

    // zipf-keyed stream: ~75% of events collapse onto key 0
    val keyed = t.events
      .withColumn(
        "k",
        when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id"))
      )
      .select(col("k"), col("event_id"), col("value"))

    // ---- unmitigated: partition load of a plain hash shuffle on k
    val parts = 16
    def loadStats(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): (Long, Double) = {
      val sizes = df
        .repartition(parts, cols.map(col): _*)
        .mapPartitions(it => Iterator.single(it.size.toLong))(
          org.apache.spark.sql.Encoders.scalaLong
        )
        .collect()
      (sizes.max, sizes.sum.toDouble / parts)
    }
    val (maxPlain, meanPlain) = loadStats(keyed, Seq("k"))

    // ---- mitigated: salt spreads the hot key (the reroute analog)
    // salt range = 4x partitions so the hot key's buckets spread
    // smoothly over partitions (16 buckets into 16 partitions would
    // re-create balls-into-bins imbalance)
    val salted = keyed.withColumn("salt", pmod(hash(col("k"), col("event_id")), lit(parts * 4)))
    val (maxSalted, meanSalted) = loadStats(salted, Seq("k", "salt"))

    // ---- result-identity: salted two-stage agg == plain agg
    val plainRes = keyed
      .groupBy("k")
      .agg(round(sum(col("value")), 4).as("sv"), count(lit(1)).as("n"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val saltedRes = SaltedAggregation
      .aggregate(keyed, Seq("k"), SaltedAggregation.Spec(sums = Seq("value")), parts)
      .select(col("k"), round(col("sum_value"), 4).as("sv"), col("cnt"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val identical = plainRes.sameElements(saltedRes)

    // ---- drifting-skew phase: the closed control loop across batches.
    // Batch 0 is uniform (controller must hold salt=1), batches 1+ are
    // hot-keyed; the salter reads the previous batch's task metrics and
    // re-salts — the micro-batch analog of the reference controller's
    // timer ticks re-reading busy ratios (ControllerSimulator.scala:52-87).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val settings = ReshapeConfig.from(spark)
    val monitor = new SkewMonitor(settings)
    spark.sparkContext.addSparkListener(monitor)
    val salter = new AdaptiveSalter(monitor, settings)
    var driftIdentical = true
    val body = AdaptiveReshape.foreachBatchBody(
      Seq("k"),
      SaltedAggregation.Spec(sums = Seq("value"), counts = true, collects = Seq("event_id")),
      salter,
      awaitEvidenceMs = 5000L
    ) { (agg, _, _) =>
      val merged = agg
        .agg(round(sum(col("sum_value")), 4), sum(col("cnt")), sum(size(col("collect_event_id"))))
        .collect()(0)
      driftIdentical &&= merged.getLong(1) == merged.getLong(2) // every record collected once
    }
    val uniformBatch = t.events
      .select(col("event_id").as("k"), col("event_id"), col("value"))
    val driftBatches = Seq(uniformBatch, keyed, keyed.limit(20000))
    driftBatches.zipWithIndex.foreach { case (b, i) => body(b, i.toLong) }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.sparkContext.removeSparkListener(monitor)
    val saltHistory = salter.saltHistory
    val adapted = saltHistory.head == 1 && saltHistory.last > 1

    val skewPlain = maxPlain / meanPlain
    val skewSalted = maxSalted / meanSalted
    println(
      f"""{"metric":"skew_mitigation","resultsIdentical":$identical,"maxOverMeanPlain":$skewPlain%.2f,"maxOverMeanSalted":$skewSalted%.2f,"improvement":${skewPlain / skewSalted}%.2f,"saltHistory":${saltHistory.mkString("[", ",", "]")},"saltAdapted":$adapted,"driftResultsOk":$driftIdentical,"sf":"$sfDir"}"""
    )
    spark.stop()
    if (!identical || skewSalted * 2 > skewPlain || !adapted || !driftIdentical) sys.exit(1)
  }
}
