package graft

import graft.operators.MediaPipeline
import graft.streaming.Cep
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** CEP NFA semantics (batch + streaming cross-batch state) and the
  * multimodal pipeline plumbing.
  */
class CepMediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  private val errPair = Cep.SequencePattern(
    Seq(Cep.Step("e1", _.event_type == "error"), Cep.Step("e2", _.event_type == "error")),
    withinMs = 30L * 60 * 1000,
    strict = true
  )

  test("NFA strict pattern: contiguity, within-bound, overlap semantics") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    // e1,e2 adjacent errors → match; e3 click kills; e4,e5 errors but
    // 40min apart → no match; e5,e6 adjacent errors → match
    val events = Seq(
      ev(1, 0, "error"), ev(2, 5, "error"), ev(3, 10, "click"),
      ev(4, 20, "error"), ev(5, 60, "error"), ev(6, 65, "error")
    )
    val (matches, st) = Cep.advance(errPair, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L), Seq(5L, 6L)))
    assert(st.partials.nonEmpty) // e6 starts a fresh partial
  }

  test("NFA times(n) quantifier expands to consecutive occurrences") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", times = 3)),
      withinMs = 60L * 60 * 1000,
      strict = true
    )
    // 4 consecutive errors → overlapping triples (1,2,3) and (2,3,4);
    // the click then kills all partials
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"),
      ev(4, 3, "error"), ev(5, 4, "click"), ev(6, 5, "error")
    )
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
  }

  test("NFA relaxed pattern skips non-matching events") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(Cep.Step("s", _.event_type == "signup"), Cep.Step("p", _.event_type == "purchase")),
      withinMs = 30L * 60 * 1000,
      strict = false
    )
    val events = Seq(ev(1, 0, "signup"), ev(2, 5, "click"), ev(3, 10, "purchase"))
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 3L)))
  }

  test("streaming CEP carries partial matches across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Cep
      .detectStream(in.toDS(), errPair)
      .writeStream.format("memory").queryName("cep_out")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 7, "error", 0.0)) // partial only
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_out").count() == 0)
      in.addData(Event(2, ts(5), 7, "error", 0.0)) // completes across batches
      q.processAllAvailable()
      val m = spark.sql("SELECT event_ids FROM cep_out").collect()
      assert(m.length == 1 && m(0).getSeq[Long](0) == Seq(1L, 2L))
    } finally q.stop()
  }

  test("NFA reluctant oneOrMore emits a match per loop length") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", oneOrMore = true)),
      withinMs = 60L * 60 * 1000,
      strict = true
    )
    val events = Seq(ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"))
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    // every (start, length) combination: 1; 1,2; 2; 1,2,3; 2,3; 3
    assert(matches.map(_.event_ids).toSet == Set(
      Seq(1L), Seq(1L, 2L), Seq(2L), Seq(1L, 2L, 3L), Seq(2L, 3L), Seq(3L)))
  }

  test("NFA greedy oneOrMore emits only the maximal run, when it breaks") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", oneOrMore = true, greedy = true)),
      withinMs = 60L * 60 * 1000,
      strict = true,
      skip = Cep.SkipPastLastEvent
    )
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"),
      ev(4, 3, "click"), ev(5, 4, "error")
    )
    val (matches, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    // run 1-3 emitted when the click broke it; e5's run is still open
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L, 3L)))
    assert(Cep.flush(p, 1L, st).map(_.event_ids) == Seq(Seq(5L)))
  }

  test("NFA greedy loop followed by a next step consumes the whole run") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("errs", _.event_type == "error", oneOrMore = true, greedy = true),
        Cep.Step("rec", _.event_type != "error")
      ),
      withinMs = 60L * 60 * 1000,
      strict = true,
      skip = Cep.SkipPastLastEvent
    )
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"), ev(4, 3, "click"),
      ev(5, 4, "error"), ev(6, 5, "view")
    )
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L, 3L, 4L), Seq(5L, 6L)))
  }

  test("NFA optional step matches with and without the middle event") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("s", _.event_type == "signup"),
        Cep.Step("e", _.event_type == "error", optional = true),
        Cep.Step("p", _.event_type == "purchase")
      ),
      withinMs = 60L * 60 * 1000,
      strict = true
    )
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 1, "purchase"),             // skip the optional
      ev(3, 2, "signup"), ev(4, 3, "error"), ev(5, 4, "purchase"), // take it
      ev(6, 5, "signup"), ev(7, 6, "click"), ev(8, 7, "purchase")  // no match
    )
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L), Seq(3L, 4L, 5L)))
  }

  test("NFA times(n, m) range quantifier emits every admissible length") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", times = 2, timesMax = 3)),
      withinMs = 60L * 60 * 1000,
      strict = true
    )
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"),
      ev(4, 3, "error"), ev(5, 4, "click"))
    val (matches, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids).toSet == Set(
      Seq(1L, 2L), Seq(1L, 2L, 3L),
      Seq(2L, 3L), Seq(2L, 3L, 4L),
      Seq(3L, 4L)))
  }

  test("NFA until stops a loop without consuming the stop event") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    // clicks accumulate until a purchase; the purchase closes the loop
    // and is consumed by the NEXT step, not the loop
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("clicks", _.event_type == "click", oneOrMore = true, greedy = true,
          until = Some(_.event_type == "purchase")),
        Cep.Step("buy", _.event_type == "purchase")
      ),
      withinMs = 60L * 60 * 1000,
      strict = true,
      skip = Cep.SkipPastLastEvent
    )
    val events = Seq(
      ev(1, 0, "click"), ev(2, 1, "click"), ev(3, 2, "purchase"),
      ev(4, 3, "click"), ev(5, 4, "view"))
    val (matches, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L, 3L)))
    // a greedy TERMINAL loop closed by until emits its maximal run
    val p2 = Cep.SequencePattern(
      Seq(Cep.Step("clicks", _.event_type == "click", oneOrMore = true, greedy = true,
        until = Some(_.event_type == "purchase"))),
      withinMs = 60L * 60 * 1000,
      strict = false,
      skip = Cep.SkipPastLastEvent
    )
    val (matches2, _) = Cep.advance(p2, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches2.map(_.event_ids) == Seq(Seq(1L, 2L)))
  }

  test("NFA followedByAny forks a match per successor candidate") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 2, "click"), ev(3, 5, "purchase"),
      ev(4, 10, "purchase"), ev(5, 50, "purchase") // 50min: outside within
    )
    def pat(any: Boolean) = Cep.SequencePattern(
      Seq(
        Cep.Step("s", _.event_type == "signup"),
        Cep.Step("p", _.event_type == "purchase", anyMatch = any)
      ),
      withinMs = 30L * 60 * 1000,
      strict = false
    )
    // plain followedBy: first candidate only
    val (fb, _) = Cep.advance(pat(any = false), 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(fb.map(_.event_ids) == Seq(Seq(1L, 3L)))
    // followedByAny: every in-horizon candidate; the 50-minute one is
    // excluded by within-expiry of the stay-behind branch
    val (fba, st) = Cep.advance(pat(any = true), 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(fba.map(_.event_ids) == Seq(Seq(1L, 3L), Seq(1L, 4L)))
    assert(st.partials.isEmpty) // nothing survives past the horizon
  }

  test("NFA followedByAny under SkipToNext collapses to one match per start") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 1, "signup"),
      ev(3, 5, "purchase"), ev(4, 10, "purchase")
    )
    val pat = Cep.SequencePattern(
      Seq(
        Cep.Step("s", _.event_type == "signup"),
        Cep.Step("p", _.event_type == "purchase", anyMatch = true)
      ),
      withinMs = 30L * 60 * 1000,
      strict = false,
      skip = Cep.SkipToNext
    )
    val (ms, _) = Cep.advance(pat, 1L, events, Cep.NfaState(Seq.empty, 0L))
    // both signups match their FIRST purchase; the anyMatch fork for
    // purchase 4 is pruned by the skip strategy (one match per start)
    assert(ms.map(_.event_ids).toSet == Set(Seq(1L, 3L), Seq(2L, 3L)))
  }

  test("followedByAny cannot combine with strict contiguity or quantifiers") {
    intercept[IllegalArgumentException] {
      Cep.SequencePattern(
        Seq(Cep.Step("a", _ => true), Cep.Step("b", _ => true, anyMatch = true)),
        withinMs = 1000L, strict = true)
    }
    intercept[IllegalArgumentException] {
      Cep.Step("b", _ => true, anyMatch = true, oneOrMore = true)
    }
    intercept[IllegalArgumentException] {
      Cep.SequencePattern(
        Seq(Cep.Step("a", _ => true, anyMatch = true)),
        withinMs = 1000L, strict = false)
    }
  }

  test("NFA skip strategies prune overlapping matches") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    def pat(skip: Cep.SkipStrategy) = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", times = 2)),
      withinMs = 60L * 60 * 1000,
      strict = true,
      skip = skip
    )
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "error"), ev(4, 3, "error"))
    val init = Cep.NfaState(Seq.empty, 0L)
    // NoSkip: every adjacent pair
    assert(Cep.advance(pat(Cep.NoSkip), 1L, events, init)._1.map(_.event_ids) ==
      Seq(Seq(1L, 2L), Seq(2L, 3L), Seq(3L, 4L)))
    // SkipPastLastEvent: non-overlapping pairs
    assert(Cep.advance(pat(Cep.SkipPastLastEvent), 1L, events, init)._1.map(_.event_ids) ==
      Seq(Seq(1L, 2L), Seq(3L, 4L)))
    // SkipToNext on times(2) keeps one match per start event — same as
    // NoSkip here (each start yields one pair), the pruning shows on
    // looping patterns
    val loop = Cep.SequencePattern(
      Seq(Cep.Step("e", _.event_type == "error", oneOrMore = true)),
      withinMs = 60L * 60 * 1000, strict = true, skip = Cep.SkipToNext)
    val loopMatches = Cep.advance(loop, 1L, events, init)._1.map(_.event_ids)
    // one match per start event: the shortest from each start
    assert(loopMatches == Seq(Seq(1L), Seq(2L), Seq(3L), Seq(4L)))
  }

  test("streaming CEP: greedy run spanning micro-batches emits once on break") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("errs", _.event_type == "error", oneOrMore = true, greedy = true),
        Cep.Step("rec", _.event_type != "error")
      ),
      withinMs = 60L * 60 * 1000,
      strict = true,
      skip = Cep.SkipPastLastEvent
    )
    val in = MemoryStream[Event]
    val q = Cep.detectStream(in.toDS(), p)
      .writeStream.format("memory").queryName("cep_greedy_out")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 9, "error", 0.0), Event(2, ts(2), 9, "error", 0.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_greedy_out").count() == 0) // loop still open
      in.addData(Event(3, ts(4), 9, "error", 0.0), Event(4, ts(6), 9, "view", 0.0))
      q.processAllAvailable()
      val m = spark.sql("SELECT event_ids FROM cep_greedy_out").collect()
      assert(m.length == 1 && m(0).getSeq[Long](0) == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  // Both steps optional: an expired greedy loop retires with a PAST
  // lastSeq on the same event where a fresh single-event match
  // completes — two candidates with disjoint spans on one event.
  // SkipPastLastEvent must emit both (emit earliest, prune overlaps,
  // repeat — the flush() loop); emitting only the head drops the
  // second match.
  private val disjointRetirePat = Cep.SequencePattern(
    Seq(
      Cep.Step("errs", _.event_type == "error",
        oneOrMore = true, greedy = true, optional = true),
      Cep.Step("view", _.event_type == "view", optional = true)
    ),
    withinMs = 4L * 60 * 1000,
    strict = false,
    skip = Cep.SkipPastLastEvent
  )

  test("NFA SkipPastLastEvent emits all disjoint candidates retiring on one event") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    // error@0 opens a greedy loop; view@5 expires it (within=4m) AND
    // completes its own fresh single-event match: candidates (0,0) and
    // (1,1) retire on the same event, non-overlapping
    val events = Seq(ev(1, 0, "error"), ev(2, 5, "view"))
    val (matches, st) = Cep.advance(disjointRetirePat, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(1L), Seq(2L)))
    assert(st.partials.isEmpty)
  }

  test("streaming CEP SkipPastLastEvent matches batch on cross-batch disjoint retirements") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val evs = Seq(Event(1, ts(0), 11, "error", 0.0), Event(2, ts(5), 11, "view", 0.0))
    val batchMatches = Cep
      .detectBatch(spark.createDataset(evs), disjointRetirePat)
      .collect().map(_.event_ids).toSet
    val in = MemoryStream[Event]
    val q = Cep.detectStream(in.toDS(), disjointRetirePat)
      .writeStream.format("memory").queryName("cep_disjoint_out")
      .outputMode("append").start()
    try {
      in.addData(evs.head)
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_disjoint_out").count() == 0) // loop open
      in.addData(evs(1))
      q.processAllAvailable()
      val streamMatches = spark.sql("SELECT event_ids FROM cep_disjoint_out")
        .collect().map(_.getSeq[Long](0)).toSet
      assert(streamMatches == Set(Seq(1L), Seq(2L)))
      assert(streamMatches == batchMatches)
    } finally q.stop()
  }

  test("streaming CEP with expiry emits pending greedy matches and frees dead keys") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val p = Cep.SequencePattern(
      Seq(Cep.Step("errs", _.event_type == "error", oneOrMore = true, greedy = true)),
      withinMs = 30L * 60 * 1000,
      strict = true,
      skip = Cep.SkipPastLastEvent
    )
    val in = MemoryStream[Event]
    val q = Cep.detectStreamExpiring(in.toDS(), p, "1 minute")
      .writeStream.format("memory").queryName("cep_exp_out")
      .outputMode("append").start()
    try {
      // key 7: an open greedy run, then silence
      in.addData(Event(1, ts(0), 7, "error", 0.0), Event(2, ts(5), 7, "error", 0.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_exp_out").count() == 0) // loop still open
      // key 8's much later events push the watermark past key 7's
      // within horizon; key 7 gets NO new events
      in.addData(Event(3, ts(120), 8, "view", 0.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(125), 8, "view", 0.0)) // extra batch: timers fire
      q.processAllAvailable()
      val m = spark.sql("SELECT key, event_ids FROM cep_exp_out").collect()
      assert(m.length == 1 && m(0).getLong(0) == 7L &&
        m(0).getSeq[Long](1) == Seq(1L, 2L))
    } finally q.stop()
  }

  test("NFA notFollowedBy: forbidden event kills, expiry/flush resolve") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("s", _.event_type == "signup"),
        Cep.Step("no_buy", _.event_type == "purchase", negated = true)
      ),
      withinMs = 30L * 60 * 1000,
      strict = false
    )
    // signup@0 → purchase@5 kills it; signup@10 → expiry at @50 emits;
    // signup@45 → pending at end-of-input, flush emits
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 5, "purchase"),
      ev(3, 10, "signup"), ev(4, 20, "click"),
      ev(5, 50, "view"), ev(6, 55, "signup")
    )
    val (matches, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(3L)))
    assert(Cep.flush(p, 1L, st).map(_.event_ids) == Seq(Seq(6L)))
    // batch = advance + flush
    import spark.implicits._
    val all = Cep.detectBatch(spark.createDataset(events), p)
      .collect().map(_.event_ids).toSet
    assert(all == Set(Seq(3L), Seq(6L)))
  }

  test("NFA notNext: immediate successor resolves or kills; mid-pattern continues") {
    def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("err", _.event_type == "error"),
        Cep.Step("no_click", _.event_type == "click", negated = true)
      ),
      withinMs = Long.MaxValue,
      strict = true
    )
    // error@0 → click@1 kills; error@2 → view@3 resolves (emit, match =
    // just the error); error@4 → end of input, flush resolves
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "click"),
      ev(3, 2, "error"), ev(4, 3, "view"), ev(5, 4, "error")
    )
    val (matches, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(matches.map(_.event_ids) == Seq(Seq(3L)))
    assert(Cep.flush(p, 1L, st).map(_.event_ids) == Seq(Seq(5L)))

    // mid-pattern notNext: error notNext(click) next(view) — the event
    // clearing the negation is the one the continuation must match
    val pMid = Cep.SequencePattern(
      Seq(
        Cep.Step("err", _.event_type == "error"),
        Cep.Step("no_click", _.event_type == "click", negated = true),
        Cep.Step("rec", _.event_type == "view")
      ),
      withinMs = Long.MaxValue,
      strict = true
    )
    val (midMatches, _) = Cep.advance(pMid, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(midMatches.map(_.event_ids) == Seq(Seq(3L, 4L)))
  }

  test("streaming CEP negation: cross-batch kill and watermark expiry") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val p = Cep.SequencePattern(
      Seq(
        Cep.Step("s", _.event_type == "signup"),
        Cep.Step("no_buy", _.event_type == "purchase", negated = true)
      ),
      withinMs = 30L * 60 * 1000,
      strict = false
    )
    val in = MemoryStream[Event]
    val q = Cep.detectStreamExpiring(in.toDS(), p, "1 minute")
      .writeStream.format("memory").queryName("cep_neg_out")
      .outputMode("append").start()
    try {
      // key 21: signup then a later-batch purchase inside the window →
      // killed across batches. key 22: signup, then only foreign-key
      // events push the watermark past its horizon → emitted.
      in.addData(Event(1, ts(0), 21, "signup", 0.0), Event(2, ts(0), 22, "signup", 0.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(10), 21, "purchase", 0.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM cep_neg_out").count() == 0)
      in.addData(Event(4, ts(120), 23, "view", 0.0)) // watermark push
      q.processAllAvailable()
      in.addData(Event(5, ts(125), 23, "view", 0.0)) // timers fire
      q.processAllAvailable()
      val m = spark.sql("SELECT key, event_ids FROM cep_neg_out").collect()
      assert(m.length == 1 && m(0).getLong(0) == 22L &&
        m(0).getSeq[Long](1) == Seq(2L))
    } finally q.stop()
  }

  test("out-of-order streaming CEP equals the batch match set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // key 3 timeline: err@2, err@4 (match), click@6 kills, err@8,
    // err@9 (match) — delivered SCRAMBLED within the watermark delay
    val evs = Seq(
      Event(1, ts(2), 3, "error", 0.0), Event(2, ts(4), 3, "error", 0.0),
      Event(3, ts(6), 3, "click", 0.0), Event(4, ts(8), 3, "error", 0.0),
      Event(5, ts(9), 3, "error", 0.0)
    )
    val in = MemoryStream[Event]
    val q = Cep.detectStreamOrdered(in.toDS(), errPair, "10 minutes")
      .writeStream.format("memory").queryName("cep_ooo_out")
      .outputMode("append").start()
    try {
      in.addData(evs(1), evs(0)); q.processAllAvailable()
      in.addData(evs(3), evs(2)); q.processAllAvailable()
      in.addData(evs(4)); q.processAllAvailable()
      // sentinel key pushes the watermark past everything; extra batch
      // lets event-time timers fire
      in.addData(Event(99, ts(600), 9, "view", 0.0)); q.processAllAvailable()
      in.addData(Event(100, ts(605), 9, "view", 0.0)); q.processAllAvailable()
      val got = spark.sql("SELECT key, event_ids FROM cep_ooo_out").collect()
        .filter(_.getLong(0) == 3L).map(_.getSeq[Long](1)).toSet
      val batch = Cep.detectBatch(evs.toDS(), errPair)
        .collect().map(_.event_ids).toSet
      assert(batch == Set(Seq(1L, 2L), Seq(4L, 5L)))
      assert(got == batch, s"out-of-order stream diverged: $got vs $batch")
    } finally q.stop()
  }

  test("media pipeline decodes deterministically per partition") {
    val docs = Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val media = MediaPipeline.mediaFromDocuments(docs)
    val feats = MediaPipeline.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.n_bytes > 0 && f.width >= 1 && f.width <= 640 &&
        f.height >= 1 && f.height <= 480 && f.channels == 3 &&
        f.mean_intensity > 0)
    }
    // determinism: same input → same features
    val again = MediaPipeline.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }
}
