package graft.streaming

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming OVER aggregates and the remaining §2.9 stream utilities.
  *
  * Spark has no streaming WindowExec (reference
  * StreamExecOverAggregate.java:82, ProcTimeUnboundedPrecedingFunction
  * / RowTimeRowsBoundedPrecedingFunction), so per-key ordered
  * aggregation state lives in flatMapGroupsWithState:
  *  - [[runningAggregate]]: UNBOUNDED PRECEDING sum/count per key —
  *    state is O(1) per key (sum, count).
  *  - [[boundedPrecedingAggregate]]: ROWS BETWEEN n-1 PRECEDING AND
  *    CURRENT ROW — state is the last n values per key (bounded ring).
  * Events are processed in event-time order within each batch;
  * cross-batch order is arrival order (watermark-sort upstream for
  * strict event-time).
  */
object StreamingOver {

  final case class RunState(sum: Double, n: Long)
  final case class RunOut(user_id: Long, event_id: Long, run_sum: Double, run_n: Long)

  def runningAggregate(events: Dataset[Event]): Dataset[RunOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[RunState]) =>
          var st = state.getOption.getOrElse(RunState(0.0, 0L))
          val out = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .map { e =>
              st = RunState(st.sum + e.value, st.n + 1)
              RunOut(key, e.event_id, st.sum, st.n)
            }
          state.update(st)
          out.iterator
      }
  }

  final case class RingState(values: Seq[Double])
  final case class BoundedOut(user_id: Long, event_id: Long, win_sum: Double, win_n: Int)

  def boundedPrecedingAggregate(events: Dataset[Event], n: Int): Dataset[BoundedOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[RingState]) =>
          var ring = state.getOption.map(_.values).getOrElse(Seq.empty)
          val out = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .map { e =>
              ring = (ring :+ e.value).takeRight(n)
              BoundedOut(key, e.event_id, ring.sum, ring.size)
            }
          state.update(RingState(ring))
          out.iterator
      }
  }

  final case class TimedVal(micros: Long, value: Double)
  final case class RangeState(buf: Seq[TimedVal])
  final case class RangeOut(user_id: Long, event_id: Long, range_sum: Double, range_n: Long)

  /** RANGE BETWEEN INTERVAL x PRECEDING AND CURRENT ROW over event
    * time, per key (reference: flink-table-runtime-blink/.../over/
    * RowTimeRangeBoundedPrecedingFunction.java:1-296). State is the
    * time-bounded buffer of (timestamp, value) pairs inside the frame;
    * each incoming event evicts entries older than `rangeMs`, joins the
    * buffer, and emits the frame aggregate. Rows tied on the timestamp
    * share one frame (SQL RANGE semantics: the frame bound is a time
    * predicate, so all peers of the current row are inside it), which
    * is why events are processed per distinct timestamp, exactly like
    * the reference's per-timestamp record lists.
    *
    * State per key is bounded by the range width — the streaming analog
    * of a 100 TB-safe windowed buffer. Cross-batch order is arrival
    * order; pair with [[temporalSort]] upstream for strict event-time.
    */
  def rangePrecedingAggregate(events: Dataset[Event], rangeMs: Long): Dataset[RangeOut] = {
    import events.sparkSession.implicits._
    val rangeMicros = rangeMs * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[RangeState]) =>
          var buf = state.getOption.map(_.buf).getOrElse(Seq.empty)
          val sorted = rows.toSeq
            .map(e => (e.ts.getTime * 1000L + (e.ts.getNanos % 1000000) / 1000, e))
            .sortBy { case (us, e) => (us, e.event_id) }
          val out = Seq.newBuilder[RangeOut]
          // consecutive runs of equal timestamps form one frame update
          var i = 0
          while (i < sorted.size) {
            val ts = sorted(i)._1
            var j = i
            while (j < sorted.size && sorted(j)._1 == ts) j += 1
            val tied = sorted.slice(i, j)
            buf = buf.filter(_.micros >= ts - rangeMicros) ++
              tied.map { case (us, e) => TimedVal(us, e.value) }
            val s = buf.map(_.value).sum
            val n = buf.size.toLong
            tied.foreach { case (_, e) => out += RangeOut(key, e.event_id, s, n) }
            i = j
          }
          if (buf.isEmpty) state.remove() else state.update(RangeState(buf))
          out.result().iterator
      }
  }

  /** Late-data side output (reference WindowedStream.sideOutputLateData
    * — Structured Streaming silently drops late rows, so the capture
    * is an explicit split): rows older than the high-watermark minus
    * the delay go to the late channel, the rest to the main channel.
    * Batch-computable per micro-batch inside foreachBatch.
    */
  def splitLate(df: DataFrame, tsCol: String, delay: String): (DataFrame, DataFrame) = {
    // the high-watermark scalar comes from a 1-row broadcast aggregate
    // joined back to the batch — an empty-partition OVER() window would
    // funnel the entire micro-batch through one WindowExec task, the
    // slowest task in the stage by construction at scale
    val hwm = df.agg(max(col(tsCol)).as("__hwm"))
    val tagged = df
      .crossJoin(broadcast(hwm))
      .withColumn("__late", col(tsCol) < col("__hwm") - expr(s"INTERVAL $delay"))
    (tagged.filter(!col("__late")).drop("__late", "__hwm"),
      tagged.filter(col("__late")).drop("__late", "__hwm"))
  }

  final case class SortBuffer(events: Seq[Event])

  /** Keyed event-time sorted emit (reference StreamExecTemporalSort /
    * RowTimeSortOperator): buffer events in keyed state and release
    * them in timestamp order once the watermark passes them — late
    * reordering is corrected up to the watermark delay. Emitted rows
    * are in event-time order per key across micro-batches.
    */
  def temporalSort(events: Dataset[Event], watermarkDelay: String): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      // EventTimeTimeout: a key with no new data must still be revisited
      // when the watermark passes its buffered events (NoTimeout would
      // only fire on new input for the key and strand the buffer)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[Event], state: GroupState[SortBuffer]) =>
          val buffered = state.getOption.map(_.events).getOrElse(Seq.empty) ++ rows
          val sorted = buffered.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          val wm = state.getCurrentWatermarkMs()
          val (ripe, young) = sorted.partition(_.ts.getTime <= wm)
          if (young.isEmpty) state.remove()
          else {
            state.update(SortBuffer(young))
            // wake when the watermark reaches the earliest buffered event
            state.setTimeoutTimestamp(math.max(young.head.ts.getTime, wm + 1))
          }
          ripe.iterator
      }
  }

  /** Async I/O analog (reference AsyncDataStream): per-partition
    * concurrent lookups with bounded in-flight futures; results keep
    * partition order. The `lookup` callback runs on the executor.
    */
  def asyncMapPartitions[T, U](
      ds: Dataset[T],
      parallelism: Int
  )(lookup: T => U)(implicit enc: org.apache.spark.sql.Encoder[U]): Dataset[U] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    ds.mapPartitions { rows =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val out = rows
        .grouped(parallelism * 4)
        .flatMap { batch =>
          val futs = batch.map(t => Future(lookup(t)))
          futs.map(f => Await.result(f, Duration.Inf))
        }
      new Iterator[U] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) pool.shutdown()
          h
        }
        def next(): U = out.next()
      }
    }
  }
}
