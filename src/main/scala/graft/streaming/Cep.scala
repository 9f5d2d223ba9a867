package graft.streaming

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP subset — the reference's MATCH_RECOGNIZE / Pattern API core
  * (reference: flink-libraries/flink-cep/.../pattern/Pattern.java:
  * 128-477 NFA engine, SQL node StreamExecMatch.java:90). Scope per
  * SURVEY.md §2.9: sequence patterns over a keyed stream with strict
  * (`next`) or relaxed (`followedBy`) contiguity, a `within` time
  * bound, and fixed `times(n)` quantifiers. No optional/greedy
  * looping modes yet.
  *
  * The NFA is a pure function over a key's time-ordered events, so one
  * implementation serves both modes:
  *  - batch: flatMapGroups, each key's full history in one pass;
  *  - streaming: flatMapGroupsWithState keeping the set of partial
  *    matches per key as state; each micro-batch advances them.
  * Partial-match state is bounded by `within` (expired partials are
  * pruned on every event), so state can't grow unboundedly on a hot
  * key.
  */
object Cep {

  /** One pattern step; `times` (Flink Pattern.times quantifier) asks
    * for that many consecutive occurrences of the predicate.
    */
  final case class Step(name: String, predicate: Event => Boolean, times: Int = 1) {
    require(times >= 1)
  }

  /** A sequence pattern: steps matched in order; `strict` demands the
    * very next event match the next step (Flink `next`), otherwise
    * non-matching events in between are skipped (`followedBy`).
    * Quantified steps are expanded to `times` consecutive copies.
    */
  final case class SequencePattern(
      steps: Seq[Step],
      withinMs: Long,
      strict: Boolean
  ) {
    require(steps.nonEmpty)
    /** steps with quantifiers unrolled — what the NFA actually runs */
    val expanded: Seq[Step] =
      steps.flatMap(s => Seq.fill(s.times)(s.copy(times = 1)))
  }

  final case class PartialMatch(stepIdx: Int, startTs: Long, eventIds: Seq[Long])
  final case class NfaState(partials: Seq[PartialMatch])
  final case class Match(key: Long, start_ts: Long, end_ts: Long, event_ids: Seq[Long])

  /** Advance the NFA over time-ordered events, returning completed
    * matches and the surviving partials.
    */
  def advance(
      pattern: SequencePattern,
      key: Long,
      events: Seq[Event],
      initial: Seq[PartialMatch]
  ): (Seq[Match], Seq[PartialMatch]) = {
    var partials = initial
    val out = Seq.newBuilder[Match]
    events.foreach { e =>
      val ts = e.ts.getTime
      // prune expired partials, then try to extend each
      val alive = partials.filter(p => ts - p.startTs <= pattern.withinMs)
      val extended = Seq.newBuilder[PartialMatch]
      alive.foreach { p =>
        if (pattern.expanded(p.stepIdx).predicate(e)) {
          val np = PartialMatch(p.stepIdx + 1, p.startTs, p.eventIds :+ e.event_id)
          if (np.stepIdx == pattern.expanded.size)
            out += Match(key, np.startTs, ts, np.eventIds)
          else extended += np
        } else if (!pattern.strict) {
          extended += p // relaxed: keep waiting
        } // strict: partial dies on a non-matching event
      }
      // can this event start a new partial?
      if (pattern.expanded.head.predicate(e)) {
        if (pattern.expanded.size == 1)
          out += Match(key, ts, ts, Seq(e.event_id))
        else extended += PartialMatch(1, ts, Seq(e.event_id))
      }
      partials = extended.result()
    }
    (out.result(), partials)
  }

  private def ordered(rows: Iterator[Event]): Seq[Event] =
    // getNanos carries sub-millisecond precision getTime drops
    rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))

  /** Batch detection: each key's events processed in event-time order.
    * Works on a bounded Dataset (flatMapGroups = one NFA pass per key).
    */
  def detectBatch(events: Dataset[Event], pattern: SequencePattern): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (key: Long, rows: Iterator[Event]) =>
        advance(pattern, key, ordered(rows), Seq.empty)._1.iterator
      }
  }

  /** Streaming detection: partial matches survive across micro-batches
    * in keyed state. Events are ordered within each batch; cross-batch
    * order is arrival order (pair with a watermark-sorted upstream for
    * strict event-time guarantees).
    */
  def detectStream(events: Dataset[Event], pattern: SequencePattern): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[NfaState]) =>
          val initial = state.getOption.map(_.partials).getOrElse(Seq.empty)
          val (matches, partials) = advance(pattern, key, ordered(rows), initial)
          if (partials.isEmpty) state.remove() else state.update(NfaState(partials))
          matches.iterator
      }
  }
}
