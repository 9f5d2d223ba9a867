package graft.skew

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
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

  final case class TaskStat(durationMs: Long, records: Long, bytes: Long)

  /** When set, only stages belonging to this job group count as
    * evidence. A SparkListener is session-wide, so without a scope the
    * monitor would read *foreign* load — an oracle query, another
    * stream, even the result collect of the job it feeds — as skew in
    * the monitored pipeline (the reference's controller only ever sees
    * its own job's subtasks, ControllerSimulator.scala:95-155).
    */
  @volatile private var jobGroup: Option[String] = None
  private val stageGroups = new TrieMap[Int, String]()

  def scopeTo(group: String): Unit = { jobGroup = Some(group) }

  /** Scope evidence to the calling thread's job group — inside a
    * foreachBatch body that is the owning streaming query's execution
    * group (StreamExecution sets it to the run id). No-op when the
    * caller has no group (direct batch invocation stays unscoped).
    */
  def scopeToCallingGroup(sc: SparkContext): Unit =
    Option(sc.getLocalProperty("spark.jobGroup.id")).foreach(scopeTo)

  override def onJobStart(j: SparkListenerJobStart): Unit = {
    val g = Option(j.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    g.foreach(gr => j.stageIds.foreach(sid => stageGroups.put(sid, gr)))
  }
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
      val (recs, bytes) =
        if (t.taskMetrics.shuffleReadMetrics != null)
          (t.taskMetrics.shuffleReadMetrics.recordsRead,
            t.taskMetrics.shuffleReadMetrics.totalBytesRead)
        else (0L, 0L)
      perStage
        .getOrElseUpdate(t.stageId, TrieMap.empty)
        .put(t.taskInfo.taskId, TaskStat(t.taskInfo.duration, recs, bytes))
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val stageId = sc.stageInfo.stageId
    val group = stageGroups.remove(stageId)
    perStage.remove(stageId).foreach { stats =>
      val inScope = jobGroup.forall(g => group.contains(g))
      val durations = stats.values.map(_.durationMs).toSeq.sorted
      if (inScope && durations.size >= 2 && durations.last > 0) {
        val median = durations(durations.size / 2)
        // Load signal, in preference order: shuffle-read BYTES — the
        // per-channel input volume the reference's controller reads
        // (ControllerSimulator.scala:95-155), and the only signal that
        // survives map-side partial aggregation (partials for a hot key
        // collapse to one record per map task, but a wide partial like
        // a collect buffer keeps its size) — then records, then task
        // durations for map stages. Counts/bytes are deterministic
        // where millisecond durations are noise at micro-batch scale.
        val byteTotal = stats.values.map(_.bytes).sum
        val recTotal = stats.values.map(_.records).sum
        val loads: Seq[(Long, Double)] =
          if (byteTotal > 0) stats.toSeq.map { case (tid, st) => (tid, st.bytes.toDouble) }
          else if (recTotal > 0) stats.toSeq.map { case (tid, st) => (tid, st.records.toDouble) }
          else stats.toSeq.map { case (tid, st) => (tid, st.durationMs.toDouble) }
        val mx = math.max(1.0, loads.map(_._2).max)
        // Duration is the least reliable signal: sub-500ms tasks are
        // scheduler noise, not load (the reference's busy ratios are
        // averaged over a 10 s window — ControllerSimulator timer).
        // Record such stages but never flag them skewed.
        val reliable = byteTotal > 0 || recTotal > 0 || durations.last >= 500
        val ratios = loads.map { case (tid, l) => (tid, l / mx) }
        val skewed =
          if (reliable) ratios.filter(_._2 > settings.hiThreshold).map(_._1.toInt) else Nil
        val free =
          if (reliable) ratios.filter(_._2 < settings.loThreshold).map(_._1.toInt) else Nil
        val mean = loads.map(_._2).sum / loads.size
        val salt =
          if (reliable)
            math.min(32, math.max(1, math.ceil(mx / math.max(1.0, mean)).toInt))
          else 1
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

/** Per-tick salt controller — the timer loop of the reference's
  * controller (reference: ControllerSimulator.scala:52-87), re-expressed
  * for micro-batches: one `nextSalt()` call per batch plays the role of
  * one timer tick.
  *
  * Policy, mirroring the reference:
  *  - a tick acts only on *fresh* evidence (stages completed since the
  *    last tick), like the controller re-reading current metrics;
  *  - evidence is actionable only when a busy task coexists with a free
  *    one (busy > hiThreshold while another < loThreshold) — the
  *    reference pairs skewed-with-helper, never acts on uniform load;
  *  - the first `firstPhaseNum` skew-positive ticks use the aggressive
  *    salt (the 90/100 phase-1 reroute ratio analog), later ticks use
  *    the proportional recommendation (phase 2's
  *    `(in(skew)-in(helper))*100/in(skew)`);
  *  - the salt is sticky: once raised it stays for the loop's lifetime,
  *    because a balanced post-mitigation stage means the salting is
  *    working, not that the underlying key skew vanished — the analog
  *    of the reference's routing tables persisting in the workers
  *    (WorkerSimulator.assignRouting).
  */
final class AdaptiveSalter(
    val monitor: SkewMonitor,
    settings: ReshapeConfig.Settings,
    aggressiveSalt: Int = 32
) {
  @volatile private var lastStageSeen: Int = -1
  @volatile private var salt: Int = 1
  private var ticked: Boolean = false
  private var skewTicks: Int = 0
  private val history = scala.collection.mutable.ArrayBuffer.empty[Int]

  def currentSalt: Int = salt

  /** Salt decisions made so far, one per `nextSalt()` call. */
  def saltHistory: Seq[Int] = synchronized(history.toSeq)

  /** Decide the salt for the next batch. `awaitEvidenceMs > 0` polls
    * briefly for listener events from the previous batch to land
    * (SparkListener delivery is async); leave 0 when an extra decision
    * latency of one batch is acceptable.
    */
  def nextSalt(awaitEvidenceMs: Long = 0L): Int = synchronized {
    // first tick: no monitored batch has run yet, so no evidence can
    // ever land — polling would only burn the full awaitEvidenceMs
    // as dead decision latency on every query start
    val wait = if (ticked) awaitEvidenceMs else 0L
    ticked = true
    val deadline = System.currentTimeMillis() + wait
    var fresh = monitor.stageReports.filter(_._1 > lastStageSeen)
    while (fresh.isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(25)
      fresh = monitor.stageReports.filter(_._1 > lastStageSeen)
    }
    if (fresh.nonEmpty) {
      lastStageSeen = fresh.keys.max
      val actionable = fresh.values.filter(r =>
        r.skewedTasks.nonEmpty && r.freeTasks.nonEmpty && r.recommendedSalt > 1)
      if (actionable.nonEmpty) {
        skewTicks += 1
        val proportional = actionable.map(_.recommendedSalt).max
        val next =
          if (skewTicks <= settings.firstPhaseNum) math.max(proportional, aggressiveSalt)
          else proportional
        salt = math.max(salt, next)
      }
    }
    history += salt
    salt
  }
}

/** The closed loop: a Structured Streaming aggregation whose salt
  * factor is re-read from the monitor every micro-batch — observe
  * (SkewMonitor) → decide (AdaptiveSalter) → act (SaltedAggregation),
  * the full Reshape control cycle across batches.
  */
object AdaptiveReshape {

  /** A foreachBatch body that re-salts each micro-batch with the
    * controller's current decision. `onResult` receives the *merged*
    * (post-second-stage) aggregate for the batch plus the salt used,
    * and owns delivery (upsert sink, memory table, …).
    */
  def foreachBatchBody(
      key: Seq[String],
      spec: SaltedAggregation.Spec,
      salter: AdaptiveSalter,
      awaitEvidenceMs: Long = 0L
  )(onResult: (DataFrame, Long, Int) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      // the body runs on the owning query's execution thread: scope the
      // monitor to that query's job group so concurrent foreign jobs
      // (oracle reads, other streams) never count as skew evidence
      salter.monitor.scopeToCallingGroup(batch.sparkSession.sparkContext)
      val salt = salter.nextSalt(awaitEvidenceMs)
      onResult(SaltedAggregation.aggregate(batch, key, spec, salt), batchId, salt)
  }

  /** The same closed loop for the join path: each micro-batch of the
    * fact stream joins the dim with the controller's current salt —
    * the streaming stand-in for AQE's runtime skew split, which is
    * unavailable inside a streaming query. With salt 1 the join is a
    * plain equi-join (zero replication cost until skew is observed).
    */
  def foreachBatchJoinBody(
      dim: DataFrame,
      key: Seq[String],
      salter: AdaptiveSalter,
      awaitEvidenceMs: Long = 0L
  )(onResult: (DataFrame, Long, Int) => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      salter.monitor.scopeToCallingGroup(batch.sparkSession.sparkContext)
      val salt = salter.nextSalt(awaitEvidenceMs)
      onResult(SaltedJoin.join(batch, dim, key, salt), batchId, salt)
  }
}

/** Salted skew join — the manual replicate-and-salt mitigation for a
  * skewed equi-join, for the cases AQE's runtime skew split cannot
  * reach (streaming joins, or when the build side must stay
  * partitioned). The fact side gets a deterministic per-row salt; the
  * dim side is replicated `saltFactor` times so every (key, salt)
  * bucket finds its match. Results are identical to the unsalted join
  * (the reference's result-awareness invariant), the hot key's rows
  * just land on `saltFactor` reducers instead of one.
  *
  * Cost model: dim-side rows are duplicated saltFactor times — the
  * right mitigation when dim << fact (the reference's
  * join-with-static shape, JoinWithStaticExample.java:100-151), wrong
  * for fact-fact joins (use AQE skew split there).
  */
object SaltedJoin {

  def join(
      fact: DataFrame,
      dim: DataFrame,
      key: Seq[String],
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor >= 1)
    val saltExpr: Column =
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(saltFactor))
    val saltedFact = fact.withColumn("__salt", saltExpr)
    val replicatedDim = dim.withColumn(
      "__salt",
      explode(array((0 until saltFactor).map(lit): _*))
    )
    saltedFact
      .join(replicatedDim, key :+ "__salt")
      .drop("__salt")
  }
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
      maxs: Seq[String] = Nil,
      /** collect_list columns, merged by flattening in stage 2 (order
        * is partition-dependent, like any collect_list; sort downstream
        * if determinism is needed). These are the aggregates where
        * salting genuinely pays: algebraic partials (sum/count/min/max)
        * collapse a hot key on the map side, but a collect buffer keeps
        * its full size through the shuffle.
        */
      collects: Seq[String] = Nil
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
        spec.maxs.map(c => max(col(c)).as(s"__max_$c")) ++
        spec.collects.map(c => collect_list(col(c)).as(s"__col_$c"))
    val partial = df
      .withColumn("__salt", saltExpr)
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      spec.sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
        (if (spec.counts) Seq(sum(col("__cnt")).as("cnt")) else Nil) ++
        spec.mins.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
        spec.maxs.map(c => max(col(s"__max_$c")).as(s"max_$c")) ++
        spec.collects.map(c => flatten(collect_list(col(s"__col_$c"))).as(s"collect_$c"))
    partial
      .groupBy(key.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
