package graft.skew

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent.TrieMap

/** Reshape-style adaptive skew handling, re-expressed for Spark.
  *
  * The reference (reference: flink-runtime/src/main/scala/org/apache/
  * flink/runtime/reshape/ControllerSimulator.scala:17-189 and
  * WorkerSimulator.scala:15-58) reroutes a fraction of the records
  * headed to an overloaded subtask to an underloaded helper, pairing
  * busy workers (busy ratio > hiThreshold = 0.8) with free workers
  * (< loThreshold = 0.2) every reshapeFreq = 10 s, with an aggressive
  * 90/100 reroute ratio for the first firstPhaseNum = 6 iterations
  * (README.md:14-22). Rerouting is only sound for operators whose
  * per-key state can be merged afterwards — the paper's
  * "result-aware" condition; the demo job keeps the joined static
  * table replicated so any worker can process any record
  * (JoinWithStaticExample.java:100-151).
  *
  * Spark has no per-record channel override (micro-batch planning
  * replaces in-flight rerouting), so the same control loop maps to:
  *  - batch joins: AQE skew-join splitting (enabled in Engine) — the
  *    runtime re-plan IS the reroute;
  *  - aggregations: salted two-stage aggregation (SaltedAggregation) —
  *    the salt fans a hot key across `saltFactor` reducers (the
  *    "helpers") and the second stage is the result-aware merge;
  *  - the control loop: SkewMonitor, a SparkListener aggregating
  *    per-task metrics on the driver (the JobMaster analog), which
  *    classifies partitions with the reference's hi/lo thresholds and
  *    recommends the salt factor for the next run/micro-batch.
  */
object ReshapeConfig {
  /** Config keys mirror the reference's system properties
    * (README.md:14-22); read from Spark conf with the same defaults.
    */
  val EnableKey = "spark.graft.reshape.enabled"
  val HiThresholdKey = "spark.graft.reshape.hiThreshold"
  val LoThresholdKey = "spark.graft.reshape.loThreshold"
  val FreqKey = "spark.graft.reshape.freqMs"
  val FirstPhaseKey = "spark.graft.reshape.firstPhaseNum"

  final case class Settings(
      enabled: Boolean,
      hiThreshold: Double,
      loThreshold: Double,
      freqMs: Long,
      firstPhaseNum: Int
  )

  def from(spark: SparkSession): Settings = Settings(
    enabled = spark.conf.get(EnableKey, "false").toBoolean,
    hiThreshold = spark.conf.get(HiThresholdKey, "0.8").toDouble,
    loThreshold = spark.conf.get(LoThresholdKey, "0.2").toDouble,
    freqMs = spark.conf.get(FreqKey, "10000").toLong,
    firstPhaseNum = spark.conf.get(FirstPhaseKey, "6").toInt
  )
}

/** Driver-side load monitor — the ControllerSimulator analog.
  *
  * Collects per-task (duration, records) per stage; on stage
  * completion classifies tasks against the busy/free thresholds
  * exactly as the reference classifies subtask busy ratios
  * (ControllerSimulator.scala:95-155: busy = ratio > hi, free =
  * ratio < lo, paired busiest-with-freest). The product is a
  * [[SkewReport]] per stage plus a recommended salt factor: the
  * number of helpers the hottest partition needs so that
  * max/mean ≈ 1, which is what the reference's phase-2 proportional
  * ratio `(in(skew)-in(helper))*100/in(skew)` converges to.
  */
final class SkewMonitor(settings: ReshapeConfig.Settings) extends SparkListener {

  final case class TaskStat(durationMs: Long, records: Long)
  final case class SkewReport(
      stageId: Int,
      numTasks: Int,
      maxMs: Long,
      medianMs: Long,
      skewedTasks: Seq[Int],
      freeTasks: Seq[Int],
      recommendedSalt: Int
  )

  private val perStage = new TrieMap[Int, TrieMap[Long, TaskStat]]()
  private val reports = new ConcurrentHashMap[Int, SkewReport]()

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    if (t.taskMetrics != null) {
      val recs =
        if (t.taskMetrics.shuffleReadMetrics != null)
          t.taskMetrics.shuffleReadMetrics.recordsRead
        else 0L
      perStage
        .getOrElseUpdate(t.stageId, TrieMap.empty)
        .put(t.taskInfo.taskId, TaskStat(t.taskInfo.duration, recs))
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val stageId = sc.stageInfo.stageId
    perStage.remove(stageId).foreach { stats =>
      val durations = stats.values.map(_.durationMs).toSeq.sorted
      if (durations.size >= 2 && durations.last > 0) {
        val median = durations(durations.size / 2)
        val mx = durations.last.toDouble
        // busy ratio analog: task duration relative to the stage max
        val ratios = stats.toSeq.map { case (tid, st) =>
          (tid, st.durationMs.toDouble / mx)
        }
        val skewed = ratios.filter(_._2 > settings.hiThreshold).map(_._1.toInt)
        val free = ratios.filter(_._2 < settings.loThreshold).map(_._1.toInt)
        val mean = durations.sum.toDouble / durations.size
        val salt = math.min(32, math.max(1, math.ceil(mx / math.max(1.0, mean)).toInt))
        reports.put(
          stageId,
          SkewReport(stageId, stats.size, durations.last, median, skewed, free, salt)
        )
      }
    }
  }

  /** Latest per-stage reports (driver-side; cheap). */
  def stageReports: Map[Int, SkewReport] = {
    import scala.jdk.CollectionConverters._
    reports.asScala.toMap
  }

  /** The salt factor the next run of a skewed aggregation should use:
    * max recommendation over recent stages, 1 when balanced.
    */
  def recommendedSaltFactor: Int =
    if (reports.isEmpty) 1
    else stageReports.values.map(_.recommendedSalt).max
}

/** Salted two-stage aggregation — the result-aware reroute analog.
  *
  * Stage 1 groups by (key, salt) so a hot key's records spread over
  * `saltFactor` reducers (the helper workers); stage 2 merges the
  * partial aggregates by key. Only mergeable aggregates are exposed
  * (sum/count/min/max and things derivable from them), mirroring the
  * reference's restriction to operators with a merge step (§0.2 of
  * SURVEY.md).
  *
  * The salt column must be deterministic per row (not rand()) so
  * retried tasks re-produce identical partials — here a hash of the
  * whole row modulo the factor.
  */
object SaltedAggregation {

  final case class Spec(
      sums: Seq[String] = Nil,
      counts: Boolean = true,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil
  )

  def aggregate(
      df: DataFrame,
      key: Seq[String],
      spec: Spec,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor >= 1)
    val saltExpr: Column =
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor))
    val partialAggs =
      spec.sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
        (if (spec.counts) Seq(count(lit(1)).as("__cnt")) else Nil) ++
        spec.mins.map(c => min(col(c)).as(s"__min_$c")) ++
        spec.maxs.map(c => max(col(c)).as(s"__max_$c"))
    val partial = df
      .withColumn("__salt", saltExpr)
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      spec.sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
        (if (spec.counts) Seq(sum(col("__cnt")).as("cnt")) else Nil) ++
        spec.mins.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
        spec.maxs.map(c => max(col(s"__max_$c")).as(s"max_$c"))
    partial
      .groupBy(key.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
