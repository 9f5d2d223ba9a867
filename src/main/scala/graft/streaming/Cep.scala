package graft.streaming

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP — the reference's MATCH_RECOGNIZE / Pattern API core
  * (reference: flink-libraries/flink-cep/.../pattern/Pattern.java:
  * 128-477, SQL node StreamExecMatch.java:90, after-match skip
  * strategies under flink-cep/.../nfa/aftermatch/). Scope: sequence
  * patterns over a keyed stream with strict (`next`) or relaxed
  * (`followedBy`) contiguity, a `within` time bound, `times(n)`,
  * `optional`, `oneOrMore` (reluctant or `greedy`) quantifiers, and
  * NO_SKIP / SKIP_TO_NEXT / SKIP_PAST_LAST_EVENT strategies.
  *
  * The NFA is a pure function over a key's time-ordered events, so one
  * implementation serves both modes:
  *  - batch: flatMapGroups, each key's full history in one pass plus an
  *    end-of-input flush for pending greedy loops;
  *  - streaming: flatMapGroupsWithState keeping the set of partial
  *    matches per key as state; each micro-batch advances them.
  *    Pending greedy loops emit when the loop breaks or `within`
  *    expires (an unbounded stream has no end-of-input).
  * Partial-match state is bounded by `within` (expired partials are
  * retired on every event), so state can't grow unboundedly on a hot
  * key.
  *
  * Quantifier semantics follow the reference NFA:
  *  - reluctant `oneOrMore` emits a match at every loop length (the
  *    NFA branches on each loop event: stay-in-loop vs exit);
  *  - `greedy` consumes every event the loop predicate accepts (the
  *    loop branch wins over the exit branch) and emits only the
  *    maximal match, when the loop resolves;
  *  - `optional` is an epsilon edge past the step.
  * Skip strategies (reference: AfterMatchSkipStrategy.java):
  *  - NoSkip: every match, overlaps allowed;
  *  - SkipToNext: at most one match per start event (partials sharing
  *    the emitted match's start are discarded);
  *  - SkipPastLastEvent: after a match, every partial overlapping it
  *    is discarded and its last event cannot start a new partial.
  */
object Cep {

  /** One pattern step. `times` (Pattern.times) asks for that many
    * consecutive occurrences — with `timesMax > times` it becomes the
    * range quantifier times(n, m) (n required + up to m-n more);
    * `optional` (Pattern.optional) lets the step match zero events;
    * `oneOrMore` (Pattern.oneOrMore) loops the step, reluctantly
    * unless `greedy` (Pattern.greedy).
    */
  final case class Step(
      name: String,
      predicate: Event => Boolean,
      times: Int = 1,
      optional: Boolean = false,
      oneOrMore: Boolean = false,
      greedy: Boolean = false,
      timesMax: Int = 0,
      /** Pattern.until: a oneOrMore loop stops accepting elements once
        * an event matches this condition (checked before the loop
        * predicate; the until event itself is never consumed by the
        * loop).
        */
      until: Option[Event => Boolean] = None,
      /** Negative step (Pattern.notNext / Pattern.notFollowedBy,
        * reference flink-libraries/flink-cep/.../pattern/Pattern.java:
        * 273,304): the predicate names the FORBIDDEN event. Under
        * strict contiguity this is notNext (the immediate next event
        * must not match); relaxed it is notFollowedBy (no matching
        * event may occur before the following step consumes). A
        * forbidden event kills the partial; a trailing negation
        * resolves positively at within-expiry or end-of-input flush —
        * the reference's rule that a pattern cannot END with
        * notFollowedBy unless a within() bounds it.
        */
      negated: Boolean = false,
      /** Non-deterministic relaxed successor (Pattern.followedByAny,
        * reference flink-libraries/flink-cep/.../pattern/Pattern.java:
        * 322): after this step consumes a candidate, the partial ALSO
        * stays behind waiting at the step, so EVERY later candidate
        * within the horizon forks its own match — where plain
        * followedBy advances on the first candidate only. The NFA
        * ignore-edge becomes a self-loop that survives a take.
        */
      anyMatch: Boolean = false,
      /** Loop contiguity pinned STRICT (Pattern.consecutive, reference
        * flink-libraries/flink-cep/.../pattern/Pattern.java:437): once
        * a oneOrMore loop has consumed an element, ANY event the loop
        * does not consume closes the loop permanently — where the
        * default relaxed loop skips non-matching events and keeps
        * accepting later matching ones. Suppresses the loop's
        * ignore-edge.
        */
      consecutive: Boolean = false,
      /** Non-deterministic loop contiguity (Pattern.allowCombinations,
        * reference Pattern.java:477): between loop iterations a
        * MATCHING event may also be skipped — the partial forks into
        * take and not-take branches, so every order-preserving
        * combination of loop elements sharing the first one emits. The
        * loop's ignore-edge also accepts matching events.
        */
      combinations: Boolean = false
  ) {
    require(times >= 1)
    require(times == 1 || (!optional && !oneOrMore),
      "times(n) cannot combine with optional/oneOrMore on one step")
    require(timesMax == 0 || timesMax >= times,
      "times(n, m) needs m >= n")
    require(until.isEmpty || oneOrMore, "until only applies to oneOrMore loops")
    require(!negated || (times == 1 && timesMax == 0 && !optional && !oneOrMore),
      "a negated step consumes nothing and cannot be quantified")
    require(!anyMatch || (times == 1 && timesMax == 0 && !optional &&
      !oneOrMore && !negated),
      "followedByAny applies to plain single steps (quantify with " +
        "oneOrMore/times instead of combining them with anyMatch)")
    require(!consecutive || oneOrMore,
      "consecutive() pins loop contiguity — it applies to oneOrMore steps")
    require(!combinations || oneOrMore,
      "allowCombinations() relaxes loop contiguity — it applies to oneOrMore steps")
    require(!(consecutive && combinations),
      "consecutive and allowCombinations are opposite contiguity modes")
    require(!(combinations && greedy),
      "a greedy loop consumes maximally; combining it with allowCombinations " +
        "is contradictory")
  }

  sealed trait SkipStrategy
  case object NoSkip extends SkipStrategy
  case object SkipToNext extends SkipStrategy
  case object SkipPastLastEvent extends SkipStrategy

  /** A sequence pattern: steps matched in order; `strict` demands the
    * very next event match (Flink `next`), otherwise non-matching
    * events in between are skipped (`followedBy`). Quantified
    * `times(n)` steps are expanded to n consecutive copies.
    */
  final case class SequencePattern(
      steps: Seq[Step],
      withinMs: Long,
      strict: Boolean,
      skip: SkipStrategy = NoSkip
  ) {
    require(steps.nonEmpty)
    require(!steps.head.negated,
      "a pattern cannot start with a negation (nothing precedes it)")
    require(!steps.head.anyMatch,
      "followedByAny describes the edge INTO a step; the first step has none")
    require(!strict || !steps.exists(_.anyMatch),
      "followedByAny is relaxed contiguity; it cannot appear in a strict (next) pattern")
    require(!steps.iterator.sliding(2).withPartial(false)
      .exists(w => w.head.negated && w(1).negated),
      "two adjacent negated steps are ambiguous — merge the predicates")
    /** steps with times(n[, m]) unrolled — n required copies plus
      * m - n optional ones — what the NFA actually runs
      */
    val expanded: Seq[Step] =
      steps.flatMap { s =>
        val mx = if (s.timesMax > 0) s.timesMax else s.times
        Seq.fill(s.times)(s.copy(times = 1, timesMax = 0)) ++
          Seq.fill(mx - s.times)(s.copy(times = 1, timesMax = 0, optional = true))
      }
  }

  /** A live partial match. `inLoop` marks a oneOrMore step that has
    * consumed at least one event and may consume more; `startSeq` /
    * `lastSeq` are per-key event sequence numbers for skip-strategy
    * overlap checks.
    */
  final case class PartialMatch(
      stepIdx: Int,
      inLoop: Boolean,
      startTs: Long,
      lastTs: Long,
      startSeq: Long,
      lastSeq: Long,
      eventIds: Seq[Long],
      labels: Seq[String]
  )
  final case class NfaState(partials: Seq[PartialMatch], nextSeq: Long)
  final case class Match(key: Long, start_ts: Long, end_ts: Long, event_ids: Seq[Long],
      step_names: Seq[String])

  private final case class Emit(startSeq: Long, lastSeq: Long, m: Match)

  /** Advance the NFA over time-ordered events, returning completed
    * matches (in emission order) and the surviving state.
    */
  def advance(
      pattern: SequencePattern,
      key: Long,
      events: Seq[Event],
      initial: NfaState
  ): (Seq[Match], NfaState) = {
    val steps = pattern.expanded
    val n = steps.size
    var partials = initial.partials
    var seq = initial.nextSeq
    val out = Seq.newBuilder[Match]

    // positions reachable without consuming an event: exit a satisfied
    // loop, skip optional steps. Linear chain — each position has at
    // most one epsilon edge.
    def closure(idx: Int, inLoop: Boolean): Seq[(Int, Boolean)] = {
      val acc = Seq.newBuilder[(Int, Boolean)]
      var i = idx
      var loop = inLoop
      acc += ((i, loop))
      var go = true
      while (go && i < n) {
        if (loop) { i += 1; loop = false; acc += ((i, false)) }
        else if (steps(i).optional) { i += 1; acc += ((i, false)) }
        else go = false
      }
      acc.result()
    }

    def completable(p: PartialMatch): Boolean =
      closure(p.stepIdx, p.inLoop).exists(_._1 == n)

    // a retired greedy loop (expired / strict-broken / flushed) emits
    // its maximal match now; reluctant loops already emitted per length
    def retirementEmit(p: PartialMatch): Option[Emit] =
      if (p.inLoop && p.stepIdx < n && steps(p.stepIdx).greedy && completable(p))
        Some(Emit(p.startSeq, p.lastSeq, Match(key, p.startTs, p.lastTs, p.eventIds, p.labels)))
      else None

    def negationPending(p: PartialMatch): Boolean =
      p.stepIdx < n && steps(p.stepIdx).negated

    // a partial waiting at a TRAILING negation (only optional steps
    // after it) whose within expired without the forbidden event: the
    // negation resolves positively — the match ends at its last
    // consumed event
    def negationExpiryEmit(p: PartialMatch): Option[Emit] =
      if (negationPending(p) && closure(p.stepIdx + 1, false).exists(_._1 == n))
        Some(Emit(p.startSeq, p.lastSeq, Match(key, p.startTs, p.lastTs, p.eventIds, p.labels)))
      else None

    /** Try to consume `e` from partial `p`. Returns (consumed,
      * successors, emits). A greedy in-loop partial whose loop
      * predicate accepts takes only the loop branch.
      */
    // Pattern.until: the loop at step i refuses e once the stop
    // condition matches (the until event is never consumed by the loop)
    def untilHit(i: Int, e: Event): Boolean = steps(i).until.exists(f => f(e))

    def consume(p: PartialMatch, e: Event, ts: Long, s: Long): (Boolean, Seq[PartialMatch], Seq[Emit]) = {
      val succ = Seq.newBuilder[PartialMatch]
      val emits = Seq.newBuilder[Emit]
      var consumed = false
      // greedy loop branch wins outright — unless the stop condition
      // closes the loop, in which case the exit positions take over
      val greedyLoop = p.inLoop && steps(p.stepIdx).greedy &&
        steps(p.stepIdx).predicate(e) && !untilHit(p.stepIdx, e)
      val positions =
        if (greedyLoop) Seq((p.stepIdx, true)) else closure(p.stepIdx, p.inLoop)
      positions.foreach { case (i, _) =>
        if (i < n && steps(i).predicate(e) &&
          !(steps(i).oneOrMore && untilHit(i, e))) {
          consumed = true
          val ids = p.eventIds :+ e.event_id
          val labs = p.labels :+ steps(i).name
          if (steps(i).oneOrMore) {
            val looping =
              p.copy(stepIdx = i, inLoop = true, lastTs = ts, lastSeq = s,
                eventIds = ids, labels = labs)
            succ += looping
            // allowCombinations: between iterations the loop may also
            // SKIP this matching event and take a later one — keep a
            // not-take branch so every combination sharing the loop's
            // first element forks its own match
            if (steps(i).combinations && p.inLoop && i == p.stepIdx)
              succ += p
            // reluctant loop that can already exit to the accept state
            // emits at this length too
            if (!steps(i).greedy && closure(i, true).exists(_._1 == n))
              emits += Emit(p.startSeq, s, Match(key, p.startTs, ts, ids, labs))
          } else {
            val next =
              p.copy(stepIdx = i + 1, inLoop = false, lastTs = ts, lastSeq = s,
                eventIds = ids, labels = labs)
            if (closure(i + 1, false).exists(_._1 == n))
              emits += Emit(p.startSeq, s, Match(key, p.startTs, ts, ids, labs))
            if (i + 1 < n) succ += next
            // followedByAny: the take did not consume the ignore edge —
            // keep a branch pinned AT this step (epsilon moves already
            // applied) so every later candidate forks its own match
            if (steps(i).anyMatch)
              succ += p.copy(stepIdx = i, inLoop = false)
          }
        }
      }
      (consumed, succ.result(), emits.result())
    }

    events.foreach { e =>
      val ts = e.ts.getTime
      val s = seq
      seq += 1

      // retire expired partials; a completable greedy loop emits its
      // (already fully-within-bound) match on retirement, and a
      // trailing negation that saw no forbidden event resolves as a
      // match
      val (alive, expired) = partials.partition(p => ts - p.startTs <= pattern.withinMs)
      val emitsB = Seq.newBuilder[Emit]
      expired.foreach(p =>
        retirementEmit(p).orElse(negationExpiryEmit(p)).foreach(emitsB += _))

      val nextPartials = Seq.newBuilder[PartialMatch]
      alive.foreach { p =>
        if (negationPending(p)) {
          val i = p.stepIdx
          if (steps(i).predicate(e)) {
            // the forbidden event arrived inside the negation window:
            // the partial dies silently (both notNext and notFollowedBy)
          } else if (pattern.strict) {
            // notNext: the immediate-next event is not the forbidden
            // one — the negation resolves NOW. A trailing negation
            // completes (the resolving event is not part of the match);
            // a mid-pattern negation hands this same event to the
            // continuation (error notNext(x) next(b): b checks the very
            // event that cleared the notNext).
            if (closure(i + 1, false).exists(_._1 == n))
              emitsB += Emit(p.startSeq, p.lastSeq, Match(key, p.startTs, p.lastTs, p.eventIds, p.labels))
            if (i + 1 < n) {
              val p2 = p.copy(stepIdx = i + 1)
              val (consumed2, succ2, emits2) = consume(p2, e, ts, s)
              if (consumed2) { nextPartials ++= succ2; emitsB ++= emits2 }
              // not consumed → the strict continuation dies with the
              // negation already resolved above
            }
          } else {
            // notFollowedBy: the negation stays pending until the
            // following step consumes (which resolves it — the required
            // event arrived before any forbidden one) or the within
            // horizon passes
            val p2 = p.copy(stepIdx = i + 1)
            val (consumed2, succ2, emits2) =
              if (i + 1 < n) consume(p2, e, ts, s)
              else (false, Seq.empty[PartialMatch], Seq.empty[Emit])
            if (consumed2) { nextPartials ++= succ2; emitsB ++= emits2 }
            else nextPartials += p
          }
        } else {
          val (consumed, succ, emits) = consume(p, e, ts, s)
          if (consumed) {
            nextPartials ++= succ
            emitsB ++= emits
          } else if (pattern.strict) {
            // strict contiguity: the partial dies; a pending greedy loop
            // emits its maximal match first (the run just ended)
            retirementEmit(p).foreach(emitsB += _)
          } else {
            // relaxed: keep waiting; an until-hit permanently closes an
            // open loop — as does ANY unconsumed event when the loop is
            // `consecutive` (strict between iterations) — a terminal
            // greedy loop emits its maximal match, a mid-pattern loop
            // continues from the exit position
            if (p.inLoop && p.stepIdx < n && steps(p.stepIdx).oneOrMore
              && (untilHit(p.stepIdx, e) || steps(p.stepIdx).consecutive)) {
              if (p.stepIdx + 1 == n) retirementEmit(p).foreach(emitsB += _)
              else nextPartials += p.copy(stepIdx = p.stepIdx + 1, inLoop = false)
            } else nextPartials += p
          }
        }
      }

      // can this event start a new partial?
      val fresh = PartialMatch(0, inLoop = false, ts, ts, s, s, Seq.empty, Seq.empty)
      val (startedHere, freshSucc, freshEmits) = consume(fresh, e, ts, s)
      emitsB ++= freshEmits
      var pending = nextPartials.result()
      var candidates = emitsB.result().sortBy(em => (em.startSeq, em.lastSeq))
      var freshAllowed = startedHere

      // after-match skip strategy
      pattern.skip match {
        case NoSkip =>
          candidates.foreach(em => out += em.m)
        case SkipToNext =>
          // at most one match per start event; drop partials sharing an
          // emitted start (including the fresh one born this event)
          val seen = scala.collection.mutable.Set.empty[Long]
          candidates.foreach { em =>
            if (!seen.contains(em.startSeq)) {
              seen += em.startSeq
              out += em.m
              pending = pending.filterNot(_.startSeq == em.startSeq)
            }
          }
          if (seen.contains(s)) freshAllowed = false
        case SkipPastLastEvent =>
          // emit the earliest candidate, prune everything overlapping
          // it (candidates and live partials), repeat — same loop as
          // flush(). Multiple candidates can retire on one event with
          // disjoint spans (e.g. two within-expired greedy loops from
          // separate bursts); emitting only the head silently dropped
          // the later ones.
          var rest = candidates
          while (rest.nonEmpty) {
            val em = rest.head
            out += em.m
            // discard everything overlapping the match, including
            // fresh partials born on its last event
            pending = pending.filter(_.startSeq > em.lastSeq)
            if (em.lastSeq >= s) freshAllowed = false
            rest = rest.tail.filter(_.startSeq > em.lastSeq)
          }
      }
      partials = if (freshAllowed) pending ++ freshSucc else pending
    }

    (out.result(), NfaState(partials, seq))
  }

  private def ordered(rows: Iterator[Event]): Seq[Event] =
    // getNanos carries sub-millisecond precision getTime drops
    rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))

  /** Batch detection: each key's events processed in event-time order,
    * then pending greedy loops flushed at end-of-input (bounded data
    * has a real end).
    *
    * Hot-key safe: instead of flatMapGroups (which would materialize a
    * key's FULL event history in one task's memory — a hot key with
    * 10^8 events is an OOM, the skew shape Reshape exists for), the
    * events are secondary-sorted (repartition by key, disk-backed
    * sortWithinPartitions by key/time) and scanned per partition with
    * one per-event NFA step. Working memory is the NFA's live partials
    * (bounded by `within`), never the key's event list.
    */
  def detectBatch(events: Dataset[Event], pattern: SequencePattern): Dataset[Match] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    events
      .repartition(col("user_id"))
      // Timestamp columns order by micros == (getTime, getNanos) here
      // (Catalyst precision is micros), so this matches ordered()
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { rows =>
        new Iterator[Match] {
          private var buf: Iterator[Match] = Iterator.empty
          private var curKey = 0L
          private var open = false
          private var st = NfaState(Seq.empty, 0L)
          private def fill(): Unit = {
            while (!buf.hasNext && (rows.hasNext || open)) {
              if (rows.hasNext) {
                val e = rows.next()
                if (open && e.user_id == curKey) {
                  val (m, s) = advance(pattern, curKey, Seq(e), st)
                  st = s
                  buf = m.iterator
                } else {
                  val tail = if (open) flush(pattern, curKey, st) else Nil
                  curKey = e.user_id
                  open = true
                  val (m, s) =
                    advance(pattern, curKey, Seq(e), NfaState(Seq.empty, 0L))
                  st = s
                  buf = (tail ++ m).iterator
                }
              } else {
                // end of partition: flush the last open key
                buf = flush(pattern, curKey, st).iterator
                open = false
              }
            }
          }
          override def hasNext: Boolean = { fill(); buf.hasNext }
          override def next(): Match = {
            if (!hasNext) throw new NoSuchElementException("empty iterator")
            buf.next()
          }
        }
      }
  }

  /** End-of-input flush: retire every pending partial, emitting
    * completable greedy loops under the pattern's skip strategy.
    */
  def flush(pattern: SequencePattern, key: Long, st: NfaState): Seq[Match] = {
    val steps = pattern.expanded
    val n = steps.size
    def completableFrom(idx: Int, inLoop: Boolean): Boolean = {
      var i = idx
      var loop = inLoop
      var go = true
      while (go && i < n) {
        if (loop) { i += 1; loop = false }
        else if (steps(i).optional) i += 1
        else go = false
      }
      i == n
    }
    // pending greedy loops emit their maximal run; partials waiting at
    // a trailing negation resolve positively — bounded input ended
    // without the forbidden event (matches the within-expiry path in
    // advance())
    val emits = st.partials
      .filter(p =>
        (p.inLoop && p.stepIdx < n && steps(p.stepIdx).greedy
          && completableFrom(p.stepIdx, p.inLoop)) ||
        (p.stepIdx < n && steps(p.stepIdx).negated
          && completableFrom(p.stepIdx + 1, false)))
      .map(p => Emit(p.startSeq, p.lastSeq, Match(key, p.startTs, p.lastTs, p.eventIds, p.labels)))
      .sortBy(em => (em.startSeq, em.lastSeq))
    pattern.skip match {
      case NoSkip => emits.map(_.m)
      case SkipToNext =>
        emits.groupBy(_.startSeq).toSeq.sortBy(_._1).map(_._2.head.m)
      case SkipPastLastEvent =>
        // emit the earliest, drop overlaps, repeat
        val out = Seq.newBuilder[Match]
        var rest = emits
        while (rest.nonEmpty) {
          val head = rest.head
          out += head.m
          rest = rest.filter(_.startSeq > head.lastSeq)
        }
        out.result()
    }
  }

  /** Streaming detection: partial matches survive across micro-batches
    * in keyed state. Events are ordered within each batch; cross-batch
    * order is arrival order (pair with a watermark-sorted upstream for
    * strict event-time guarantees). Pending greedy loops emit when the
    * loop breaks or `within` expires — an unbounded stream never ends.
    */
  def detectStream(events: Dataset[Event], pattern: SequencePattern): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[NfaState]) =>
          val initial = state.getOption.getOrElse(NfaState(Seq.empty, 0L))
          val (matches, st) = advance(pattern, key, ordered(rows), initial)
          // no live partials → drop the key's state entirely; the seq
          // counter may reset, which is safe because skip-strategy
          // comparisons only ever involve live partials
          if (st.partials.isEmpty) state.remove() else state.update(st)
          matches.iterator
      }
  }

  /** [[detectStream]] with watermark-driven state expiry: a key that
    * stops receiving events still retires its partials once the
    * watermark passes their `within` horizon — pending greedy loops
    * emit their match, everything else is dropped, and the key's state
    * cell is freed. Without this a dead key would hold partial-match
    * state forever (the reference clears NFA state through the same
    * within timers its PatternStream registers).
    */
  def detectStreamExpiring(
      events: Dataset[Event],
      pattern: SequencePattern,
      watermarkDelay: String
  ): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[NfaState]) =>
          val initial = state.getOption.getOrElse(NfaState(Seq.empty, 0L))
          val wm = state.getCurrentWatermarkMs()
          // retire partials the watermark has expired (covers both the
          // timeout path and stale partials on a data batch)
          val (expired, alive) =
            initial.partials.partition(p => wm - p.startTs > pattern.withinMs)
          val expiredMatches = flush(pattern, key, NfaState(expired, initial.nextSeq))
          val (matches, st) =
            if (state.hasTimedOut) (Seq.empty[Match], NfaState(alive, initial.nextSeq))
            else advance(pattern, key, ordered(rows), NfaState(alive, initial.nextSeq))
          if (st.partials.isEmpty) state.remove()
          else {
            state.update(st)
            // wake when the earliest partial's within horizon passes
            val earliest = st.partials.map(_.startTs + pattern.withinMs).min
            state.setTimeoutTimestamp(math.max(earliest, wm + 1))
          }
          (expiredMatches ++ matches).iterator
      }
  }

  /** Keyed state for [[detectStreamOrdered]]: the not-yet-ripe event
    * buffer plus the NFA over the already-released prefix.
    */
  final case class OrderedNfaState(buffer: Seq[Event], nfa: NfaState)

  /** Out-of-order streaming CEP: one stateful operator that buffers
    * each key's events until the watermark passes them, releases them
    * into the NFA in strict event-time order, and expires partials per
    * `within` — the reference CepOperator's design, which buffers
    * out-of-order elements internally and processes them on watermark
    * (reference: flink-cep/.../operator/CepOperator.java
    * bufferEvent/processElement + onEventTime advancing the NFA in
    * timestamp order). Arrival order within the watermark delay no
    * longer affects the match set; events later than the delay are
    * dropped by the watermark like any late data.
    *
    * Buffered state per key is bounded by the watermark delay; NFA
    * partials are bounded by `within` — nothing grows with the
    * stream's length.
    */
  def detectStreamOrdered(
      events: Dataset[Event],
      pattern: SequencePattern,
      watermarkDelay: String
  ): Dataset[Match] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[OrderedNfaState]) =>
          val st0 = state.getOption
            .getOrElse(OrderedNfaState(Seq.empty, NfaState(Seq.empty, 0L)))
          val wm = state.getCurrentWatermarkMs()
          // merge new arrivals into the sort buffer; release the ripe
          // prefix (watermark guarantees nothing earlier can arrive)
          val sorted = (st0.buffer ++ rows)
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          val (ripe, young) = sorted.partition(_.ts.getTime <= wm)
          // expire partials whose within horizon the watermark passed
          // (pending greedy loops / trailing negations emit)
          val (expired, alive) =
            st0.nfa.partials.partition(p => wm - p.startTs > pattern.withinMs)
          val expiredMatches = flush(pattern, key, NfaState(expired, st0.nfa.nextSeq))
          val (matches, nfa1) =
            advance(pattern, key, ripe, NfaState(alive, st0.nfa.nextSeq))
          if (young.isEmpty && nfa1.partials.isEmpty) state.remove()
          else {
            state.update(OrderedNfaState(young, nfa1))
            // wake at whichever comes first: the earliest buffered
            // event ripening, or the earliest partial's within expiry
            val wakes =
              young.headOption.map(_.ts.getTime).toSeq ++
                (if (nfa1.partials.nonEmpty)
                   Seq(nfa1.partials.map(_.startTs + pattern.withinMs).min)
                 else Nil)
            state.setTimeoutTimestamp(math.max(wakes.min, wm + 1))
          }
          (expiredMatches ++ matches).iterator
      }
  }
}
