package graft

import graft.streaming.{Cep, CepCore, MatchRecognize}
import graft.streaming.StreamingOps.Event
import org.scalatest.funsuite.AnyFunSuite

/** The three round-9 CEP surfaces: PREV navigation in DEFINE (physical
  * previous-row semantics, including across micro-batches), group
  * patterns `(A B)+` (reference GroupPattern.java), and the
  * generic-relation MATCH_RECOGNIZE front-end (reference
  * StreamExecMatch runs over any RowType).
  */
class CepGenericSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
  private def ev(id: Long, m: Int, t: String, v: Double = 0.0) =
    Event(id, ts(m), 1, t, v)

  // ---- PREV ----------------------------------------------------------

  test("PREV in DEFINE: physical previous row, NULL at partition start") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (U{2})
      DEFINE U AS value > PREV(value))"""
    val p = MatchRecognize.parse(spark, sql)
    val events = Seq(
      ev(1, 0, "x", 1.0), ev(2, 1, "x", 3.0), ev(3, 2, "x", 2.0),
      ev(4, 3, "x", 5.0), ev(5, 4, "x", 7.0), ev(6, 5, "x", 1.0))
    val (m, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    val all = (m ++ Cep.flush(p, 1L, st)).map(_.event_ids)
    // rises: id2 (3>1), id4 (5>2), id5 (7>5); the only consecutive
    // pair is (4, 5). id1 has PREV = NULL -> 1.0 > NULL is not true.
    assert(all == Seq(Seq(4L, 5L)))
  }

  test("StepPrev Scala API matches the SQL PREV compile") {
    val p = Cep.SequencePattern(
      Seq(Cep.StepPrev("U", (prev, cur) => prev.exists(_.value < cur.value),
        times = 2)),
      withinMs = Long.MaxValue, strict = true, skip = Cep.SkipToNext)
    val events = Seq(
      ev(1, 0, "x", 1.0), ev(2, 1, "x", 3.0), ev(3, 2, "x", 2.0),
      ev(4, 3, "x", 5.0), ev(5, 4, "x", 7.0), ev(6, 5, "x", 1.0))
    val (m, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(m.map(_.event_ids) == Seq(Seq(4L, 5L)))
  }

  test("PREV carries across micro-batches in streaming state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = MatchRecognize
      .detectStream(in.toDS(), """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (U{2})
        DEFINE U AS value > PREV(value))""")
      .writeStream.format("memory").queryName("prev_out")
      .outputMode("append").start()
    try {
      // batch 1 ends at value 2.0; batch 2 opens with a rise 5.0 > 2.0
      // that is only visible if prev survives in state
      in.addData(Event(1, ts(0), 7, "x", 1.0), Event(2, ts(1), 7, "x", 3.0),
        Event(3, ts(2), 7, "x", 2.0))
      q.processAllAvailable()
      in.addData(Event(4, ts(3), 7, "x", 5.0), Event(5, ts(4), 7, "x", 7.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT event_ids FROM prev_out").collect()
        .map(_.getSeq[Long](0)).toSeq
      assert(got == Seq(Seq(4L, 5L)))
    } finally q.stop()
  }

  // ---- group patterns ------------------------------------------------

  test("(A B)+ C finds multi-iteration matches a single-step loop cannot") {
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"), ev(3, 2, "error"),
      ev(4, 3, "view"), ev(5, 4, "purchase"))
    def run(p: Cep.SequencePattern): Set[Seq[Long]] = {
      val (m, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
      (m ++ Cep.flush(p, 1L, st)).map(_.event_ids).toSet
    }
    val e = Cep.Step("E", _.event_type == "error")
    val v = Cep.Step("V", _.event_type == "view")
    val pch = Cep.Step("P", _.event_type == "purchase")
    // group loop: (E V)+ P — two iterations from id1, one from id3
    val grouped = Cep.SequencePattern(
      Seq(Cep.Group(Seq(e, v), oneOrMore = true), pch),
      withinMs = Long.MaxValue, strict = true, skip = Cep.NoSkip)
    assert(run(grouped) == Set(Seq(1L, 2L, 3L, 4L, 5L), Seq(3L, 4L, 5L)))
    // contrast: E V+ P loops only V, so the e3 in the middle kills the
    // partial from id1 — only the short match remains
    val singleLoop = Cep.SequencePattern(
      Seq(e, v.copy(oneOrMore = true), pch),
      withinMs = Long.MaxValue, strict = true, skip = Cep.NoSkip)
    assert(run(singleLoop) == Set(Seq(3L, 4L, 5L)))
  }

  test("(A B){2} repeats the whole group exactly twice") {
    val e = Cep.Step("E", _.event_type == "error")
    val v = Cep.Step("V", _.event_type == "view")
    val pch = Cep.Step("P", _.event_type == "purchase")
    val p = Cep.SequencePattern(
      Seq(Cep.Group(Seq(e, v), times = 2), pch),
      withinMs = Long.MaxValue, strict = true, skip = Cep.NoSkip)
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"), ev(3, 2, "error"),
      ev(4, 3, "view"), ev(5, 4, "purchase"))
    val (m, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    assert(m.map(_.event_ids) == Seq(Seq(1L, 2L, 3L, 4L, 5L)))
    // labels alternate through both iterations
    assert(m.head.step_names == Seq("E", "V", "E", "V", "P"))
  }

  test("group loop labels and step_names stay per-variable") {
    val e = Cep.Step("A", _.event_type == "error")
    val v = Cep.Step("B", _.event_type == "view")
    val p = Cep.SequencePattern(
      Seq(Cep.Group(Seq(e, v), oneOrMore = true)),
      withinMs = Long.MaxValue, strict = true, skip = Cep.NoSkip)
    val events = Seq(ev(1, 0, "error"), ev(2, 1, "view"),
      ev(3, 2, "error"), ev(4, 3, "view"))
    val (m, _) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    // reluctant: every completed iteration count emits
    assert(m.map(_.event_ids).toSet ==
      Set(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L), Seq(3L, 4L)))
    assert(m.forall(x => x.step_names ==
      Seq.fill(x.event_ids.size / 2)(Seq("A", "B")).flatten))
  }

  test("group constraints are enforced loudly") {
    val a = Cep.Step("A", _.event_type == "error")
    val opt = Cep.Step("B", _.event_type == "view", optional = true)
    intercept[IllegalArgumentException] {
      Cep.Group(Seq(a, opt), oneOrMore = true)
    }
    intercept[IllegalArgumentException] {
      Cep.Group(Seq(a), oneOrMore = true, times = 2)
    }
  }

  // ---- generic relations ---------------------------------------------

  test("detectRelation: pattern over a non-Event relation (order status runs)") {
    import spark.implicits._
    val orders = Seq(
      // cust 1: F F O F O — two matches
      (1L, 101L, "F", java.sql.Date.valueOf("2024-01-01")),
      (1L, 102L, "F", java.sql.Date.valueOf("2024-01-02")),
      (1L, 103L, "O", java.sql.Date.valueOf("2024-01-03")),
      (1L, 104L, "F", java.sql.Date.valueOf("2024-01-04")),
      (1L, 105L, "O", java.sql.Date.valueOf("2024-01-05")),
      // cust 2: O F — no match (no O after the F)
      (2L, 201L, "O", java.sql.Date.valueOf("2024-01-01")),
      (2L, 202L, "F", java.sql.Date.valueOf("2024-01-02"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val out = MatchRecognize.detectRelation(orders, """MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (F+ O)
        DEFINE F AS o_orderstatus = 'F', O AS o_orderstatus = 'O')""")
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("match_no"), r.getAs[Long]("row_in_match"),
        r.getAs[String]("classifier")))
      .toSet
    assert(out == Set(
      (1L, 101L, 1L, 1L, "F"), (1L, 102L, 1L, 2L, "F"), (1L, 103L, 1L, 3L, "O"),
      (1L, 104L, 2L, 1L, "F"), (1L, 105L, 2L, 2L, "O")))
  }

  test("detectRelation: PREV works over arbitrary schemas") {
    import spark.implicits._
    val ticks = Seq(
      ("acme", 1L, 10.0), ("acme", 2L, 12.0), ("acme", 3L, 11.0),
      ("acme", 4L, 13.0), ("acme", 5L, 15.0),
      ("beta", 1L, 5.0), ("beta", 2L, 4.0)
    ).toDF("sym", "seqno", "price")
    val out = MatchRecognize.detectRelation(ticks, """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY seqno
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (UP{2})
        DEFINE UP AS price > PREV(price))""")
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("seqno"),
        r.getAs[String]("classifier")))
      .toSet
    // acme rises at 2, 4, 5 -> only (4, 5) is consecutive
    assert(out == Set(("acme", 4L, "UP"), ("acme", 5L, "UP")))
  }

  test("detectRelation: binary partition keys group by value, not reference") {
    import spark.implicits._
    // two rows sharing the same BYTES (distinct arrays) must be ONE
    // key group — reference equality would split them per-row and
    // never match the two-step pattern
    val df = Seq(
      (Array[Byte](1, 2), 1L, "a"),
      (Array[Byte](1, 2), 2L, "b"),
      (Array[Byte](9, 9), 1L, "a")
    ).toDF("bkey", "seqno", "tag")
    val out = MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY bkey ORDER BY seqno
        PATTERN (A B)
        DEFINE A AS tag = 'a', B AS tag = 'b')""")
      .collect()
    assert(out.length == 2) // the (1,2)-keyed pair matched; (9,9) did not
  }

  test("input columns with the reserved __prev_ prefix are rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3.0)).toDF("k", "o", "__prev_x")
    val e = intercept[IllegalArgumentException] {
      MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY o PATTERN (A) DEFINE A AS __prev_x > 0)""")
    }
    assert(e.getMessage.contains("__prev_"))
  }

  test("detectRelationWithMeasures: ONE ROW PER MATCH over any schema") {
    import spark.implicits._
    val orders = Seq(
      (1L, 101L, "F", java.sql.Date.valueOf("2024-01-01")),
      (1L, 102L, "F", java.sql.Date.valueOf("2024-01-02")),
      (1L, 103L, "O", java.sql.Date.valueOf("2024-01-03")),
      (1L, 104L, "F", java.sql.Date.valueOf("2024-01-04")),
      (1L, 105L, "O", java.sql.Date.valueOf("2024-01-05"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val out = MatchRecognize.detectRelationWithMeasures(orders, """MATCH_RECOGNIZE (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        MEASURES COUNT(F.*) AS nf, FIRST(F.o_orderkey) AS first_f,
                 LAST(O.o_orderdate) AS close_date, MAX(F.o_orderkey) AS max_f
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (F+ O)
        DEFINE F AS o_orderstatus = 'F', O AS o_orderstatus = 'O')""")
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("match_no"),
        r.getAs[Long]("nf"), r.getAs[Long]("first_f"),
        r.getAs[java.sql.Date]("close_date").toString,
        r.getAs[Long]("max_f")))
      .toSet
    assert(out == Set(
      (1L, 1L, 2L, 101L, "2024-01-03", 102L),
      (1L, 2L, 1L, 104L, "2024-01-05", 104L)))
  }

  test("detectRelation: SQL group (A B)+ and alternation run generically") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "e"), (1L, 2L, "v"), (1L, 3L, "e"), (1L, 4L, "v"),
      (1L, 5L, "p"),
      (2L, 1L, "s"), (2L, 2L, "q")
    ).toDF("k", "seqno", "t")
    val grp = MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seqno
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((E V)+ P)
        DEFINE E AS t = 'e', V AS t = 'v', P AS t = 'p')""")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("seqno"))).toSet
    assert(grp == Set((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    val alt = MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY seqno
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E V | S Q)
        DEFINE E AS t = 'e', V AS t = 'v', S AS t = 's', Q AS t = 'q')""")
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("seqno"),
        r.getAs[String]("classifier"))).toSet
    assert(alt == Set(
      (1L, 1L, "E"), (1L, 2L, "V"), (1L, 3L, "E"), (1L, 4L, "V"),
      (2L, 1L, "S"), (2L, 2L, "Q")))
  }

  test("detectRelationStream equals detectRelation on out-of-order input") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sql = """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (UP{2})
        DEFINE UP AS price > PREV(price))"""
    val rows = Seq( // arrival order is scrambled vs event time
      ("acme", t(3), 3L, 11.0), ("acme", t(1), 1L, 10.0),
      ("acme", t(5), 5L, 15.0), ("acme", t(2), 2L, 12.0),
      ("acme", t(4), 4L, 13.0))
    val batch = MatchRecognize
      .detectRelation(rows.toDF("sym", "ts", "seqno", "price"), sql)
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("seqno"),
        r.getAs[Long]("match_no"), r.getAs[Long]("row_in_match"),
        r.getAs[String]("classifier"))).toSet
    val in = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val q = MatchRecognize
      .detectRelationStream(in.toDS().toDF("sym", "ts", "seqno", "price"),
        sql, "30 seconds")
      .writeStream.format("memory").queryName("rel_stream_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      // sentinels on another key push the watermark so acme's buffered
      // rows ripen and its timers fire
      in.addData(("zzz", t(60), 0L, 0.0))
      q.processAllAvailable()
      in.addData(("zzz", t(120), 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT sym, seqno, match_no, row_in_match, classifier " +
          "FROM rel_stream_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("grouped alternation (A|B)+ runs generically and streaming equals batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // ordered-choice loop over an arbitrary relation: runs of ups-or-
    // flats closed by a drop, each row labeled with the choice taken
    val sql = """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((UP|FLAT)+ DN)
        DEFINE UP AS price > PREV(price),
               FLAT AS price = PREV(price),
               DN AS price < PREV(price))"""
    val rows = Seq(
      ("acme", t(1), 1L, 10.0), ("acme", t(2), 2L, 12.0),
      ("acme", t(3), 3L, 12.0), ("acme", t(4), 4L, 13.0),
      ("acme", t(5), 5L, 9.0), ("acme", t(6), 6L, 11.0),
      ("acme", t(7), 7L, 8.0))
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("sym"), r.getAs[Long]("seqno"),
        r.getAs[Long]("match_no"), r.getAs[Long]("row_in_match"),
        r.getAs[String]("classifier"))
    val batch = MatchRecognize
      .detectRelation(rows.toDF("sym", "ts", "seqno", "price"), sql)
      .collect().map(keyOf).toSet
    // per-row choice labels: the first match is UP FLAT UP DN
    assert(batch.map(x => (x._2, x._5)) ==
      Set((2L, "UP"), (3L, "FLAT"), (4L, "UP"), (5L, "DN"), (6L, "UP"), (7L, "DN")))
    val in = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val q = MatchRecognize
      .detectRelationStream(in.toDS().toDF("sym", "ts", "seqno", "price"),
        sql, "30 seconds")
      .writeStream.format("memory").queryName("rel_stream_choice")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData(("zzz", t(60), 0L, 0.0))
      q.processAllAvailable()
      in.addData(("zzz", t(120), 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM rel_stream_choice").collect().map(keyOf).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("detectRelationStreamWithMeasures equals batch measures on out-of-order input") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sql = """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY ts
        MEASURES COUNT(S.*) AS n_all, SUM(UP.price) AS sum_up,
                 FIRST(UP.seqno) AS first_seq, LAST(UP.price) AS last_p,
                 MAX(UP.price) AS max_p
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (UP{2})
        SUBSET S = (UP)
        DEFINE UP AS price > PREV(price))"""
    val rows = Seq( // arrival order scrambled vs event time
      ("acme", t(3), 3L, 11.0), ("acme", t(1), 1L, 10.0),
      ("acme", t(5), 5L, 15.0), ("acme", t(2), 2L, 12.0),
      ("acme", t(4), 4L, 13.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("sym"), r.getAs[Long]("match_no"),
        r.getAs[Long]("n_all"), r.getAs[Double]("sum_up"),
        r.getAs[Long]("first_seq"), r.getAs[Double]("last_p"),
        r.getAs[Double]("max_p"))
    val batch = MatchRecognize
      .detectRelationWithMeasures(rows.toDF("sym", "ts", "seqno", "price"), sql)
      .collect().map(key).toSet
    val in = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val q = MatchRecognize
      .detectRelationStreamWithMeasures(
        in.toDS().toDF("sym", "ts", "seqno", "price"), sql, "30 seconds")
      .writeStream.format("memory").queryName("rel_stream_ms_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData(("zzz", t(60), 0L, 0.0))
      q.processAllAvailable()
      in.addData(("zzz", t(120), 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM rel_stream_ms_out")
        .collect().map(key).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("detectRelation: loud errors for unknown columns and bad WITHIN") {
    import spark.implicits._
    val df = Seq((1L, "a", "x")).toDF("k", "o", "v")
    val unknown = intercept[IllegalArgumentException] {
      MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY nope ORDER BY o PATTERN (A) DEFINE A AS v = 'x')""")
    }
    assert(unknown.getMessage.contains("nope"))
    // ORDER BY over a string column cannot drive a WITHIN clock
    val badWithin = intercept[IllegalArgumentException] {
      MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY o
        PATTERN (A B) WITHIN INTERVAL '10' MINUTE
        DEFINE A AS v = 'x')""")
    }
    assert(badWithin.getMessage.contains("WITHIN"))
  }
}
