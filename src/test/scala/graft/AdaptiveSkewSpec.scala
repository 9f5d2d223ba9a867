package graft

import graft.skew.{AdaptiveReshape, AdaptiveSalter, ReshapeConfig, SaltedAggregation, SkewMonitor}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** The closed Reshape control loop across micro-batches: observe
  * (SkewMonitor on task metrics) → decide (AdaptiveSalter per batch
  * tick) → act (SaltedAggregation with the decided salt), mirroring
  * the reference's controller timer loop feeding worker routing
  * tables (reference: ControllerSimulator.scala:52-87 →
  * WorkerSimulator.assignRouting). The invariant under test is the
  * reference's: mitigation adapts the *plan* (salt factor) between
  * batches while the *results* stay identical to the unmitigated
  * aggregation.
  */
class AdaptiveSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private val nKeys = 3200L

  /** Uniform phase: every key gets the same weight — no free/busy
    * spread, so the controller must NOT act.
    */
  private def uniformRows(n: Long): DataFrame =
    spark.range(n).select(
      pmod(col("id"), lit(nKeys)).as("k"),
      (col("id") % 97).cast("double").as("v")
    )

  /** Drifted phase: ~80% of rows collapse onto key 0. */
  private def skewedRows(n: Long): DataFrame =
    spark.range(n).select(
      when(pmod(col("id"), lit(5)) =!= 0, lit(0L))
        .otherwise(pmod(col("id"), lit(nKeys)))
        .as("k"),
      (col("id") % 97).cast("double").as("v")
    )

  private def plainAgg(df: DataFrame): Map[Long, (Double, Long)] =
    df.groupBy("k")
      .agg(round(sum(col("v")), 4).as("sv"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2))))
      .toMap

  private def saltedToMap(rows: Array[Row]): Map[Long, (Double, Long)] =
    rows.map { r =>
      (r.getAs[Long]("k"),
        (BigDecimal(r.getAs[Double]("sum_v")).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
          r.getAs[Long]("cnt")))
    }.toMap

  test("closed loop: salt adapts to drifting skew across micro-batches, results identical") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val settings = ReshapeConfig.from(spark)
    val monitor = new SkewMonitor(settings)
    spark.sparkContext.addSparkListener(monitor)
    // At test scale AQE coalesces the whole reduce side into ONE task
    // (everything fits one 64MB target partition), which erases the
    // per-task load spread the monitor reads. Real deployments keep
    // multi-task reduce stages; pin that shape for the test.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      val salter = new AdaptiveSalter(monitor, settings, aggressiveSalt = 32)
      val results = ArrayBuffer.empty[Array[Row]]
      // collect aggregates so the hot key's partial keeps its size
      // through the shuffle (algebraic partials collapse map-side and
      // would hide the skew from the byte signal)
      val spec = SaltedAggregation.Spec(sums = Seq("v"), counts = true, collects = Seq("v"))
      val body = AdaptiveReshape.foreachBatchBody(Seq("k"), spec, salter,
        awaitEvidenceMs = 4000L) { (agg, _, _) => results += agg.collect() }

      val in = MemoryStream[(Long, Double)]
      val q = in.toDF().toDF("k", "v").writeStream.foreachBatch(body).start()
      try {
        // batch 0: uniform — no evidence yet, salt must stay 1
        val b0 = uniformRows(6400).collect().map(r => (r.getLong(0), r.getDouble(1)))
        in.addData(b0.toIndexedSeq); q.processAllAvailable()
        // a concurrent FOREIGN job with genuinely skewed shuffle load:
        // the monitor is scoped to the streaming query's job group, so
        // this must never count as evidence (pre-scoping it would have
        // raised the salt at the batch-1 tick)
        spark.sparkContext.setJobGroup("foreign-skew", "foreign skewed job")
        try skewedRows(20000).groupBy("k").agg(collect_list(col("v"))).collect()
        finally spark.sparkContext.clearJobGroup()
        Thread.sleep(500) // let async listener delivery land before the next tick
        val foreignStages = spark.sparkContext.statusTracker
          .getJobIdsForGroup("foreign-skew")
          .flatMap(id => spark.sparkContext.statusTracker.getJobInfo(id))
          .flatMap(_.stageIds()).toSet
        assert(foreignStages.nonEmpty, "foreign job must have run stages")

        // batch 1: skew arrives — but the only in-scope evidence is
        // batch 0's uniform load, so the controller must still not act
        val b1 = skewedRows(20000).collect().map(r => (r.getLong(0), r.getDouble(1)))
        in.addData(b1.toIndexedSeq); q.processAllAvailable()
        assert(
          monitor.stageReports.keySet.intersect(foreignStages).isEmpty,
          "foreign-group stages must be excluded from scoped evidence")
        // batch 2: batch 1's skewed stages are now visible — salt rises
        val b2 = skewedRows(4000).collect().map(r => (r.getLong(0), r.getDouble(1)))
        in.addData(b2.toIndexedSeq); q.processAllAvailable()

        val history = salter.saltHistory
        assert(history.size == 3, s"expected 3 batch ticks, got $history")
        assert(history(0) == 1, s"batch 0 must run unsalted (no evidence): $history")
        assert(history(1) == 1, s"uniform evidence must not trigger salting: $history")
        assert(history(2) > 1, s"skew evidence must raise the salt: $history")

        // result-identity per batch vs the unmitigated aggregation
        val inputs = Seq(b0, b1, b2)
        for ((batchRows, i) <- inputs.zipWithIndex) {
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(batchRows.toIndexedSeq.map(t => Row(t._1, t._2))),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("v",
                org.apache.spark.sql.types.DoubleType, nullable = false)
            ))
          )
          val expected = plainAgg(df)
          val got = saltedToMap(results(i))
          assert(got.size == expected.size, s"batch $i row count")
          for ((k, (sv, n)) <- expected) {
            val (gsv, gn) = got(k)
            assert(gn == n, s"batch $i key $k count")
            assert(math.abs(gsv - sv) < 1e-6, s"batch $i key $k sum: $gsv vs $sv")
          }
          // the collect-merge path: hot key's merged list holds every value
          val hot = results(i).find(_.getAs[Long]("k") == 0L).get
          assert(hot.getSeq[Double](hot.fieldIndex("collect_v")).size == expected(0L)._2)
        }
      } finally q.stop()
    } finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      spark.sparkContext.removeSparkListener(monitor)
    }
  }

  test("adaptive salted join body re-salts per batch with identical results") {
    val settings = ReshapeConfig.from(spark)
    val monitor = new SkewMonitor(settings)
    val salter = new AdaptiveSalter(monitor, settings)
    val fact = skewedRows(4000)
    val dim = fact.select(col("k")).distinct()
      .withColumn("tag", pmod(col("k"), lit(7)))
    val expected = fact.join(dim, "k")
      .groupBy("tag").agg(round(sum(col("v")), 4).as("sv"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val results = ArrayBuffer.empty[Map[Long, Double]]
    val salts = ArrayBuffer.empty[Int]
    val body = AdaptiveReshape.foreachBatchJoinBody(dim, Seq("k"), salter) {
      (joined, _, salt) =>
        salts += salt
        results += joined.groupBy("tag").agg(round(sum(col("v")), 4).as("sv"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    }
    // invoked directly: the body is a plain (DataFrame, Long) function
    body(fact, 0L)
    body(fact, 1L)
    assert(salts.size == 2 && salts.forall(_ >= 1))
    results.foreach(r => assert(r == expected))
  }

  test("salter is sticky: balanced post-mitigation stages keep the raised salt") {
    val settings = ReshapeConfig.from(spark)
    val monitor = new SkewMonitor(settings)
    val salter = new AdaptiveSalter(monitor, settings, aggressiveSalt = 16)
    // no listener attached: simulate ticks with no fresh evidence after
    // a manual raise — the salt must not decay (routing tables persist
    // in the reference's workers)
    assert(salter.nextSalt() == 1)
    assert(salter.nextSalt() == 1)
    assert(salter.saltHistory == Seq(1, 1))
  }

  test("salted aggregation merges collect_list partials losslessly") {
    val df = skewedRows(5000)
    val plain = df.groupBy("k").agg(collect_list(col("v")).as("vs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).sorted)).toMap
    val salted = SaltedAggregation
      .aggregate(df, Seq("k"), SaltedAggregation.Spec(counts = false, collects = Seq("v")), 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).sorted)).toMap
    assert(salted == plain)
  }
}
