package graft

import graft.streaming.{Cep, MatchRecognize}
import graft.streaming.StreamingOps.Event
import org.scalatest.funsuite.AnyFunSuite

/** FIRST/LAST logical navigation inside MATCH_RECOGNIZE DEFINE — the
  * reference's canonical iterative-condition surface (reference:
  * flink-table-planner-blink/.../codegen/MatchCodeGenerator.scala
  * visitCall FIRST|LAST + generateDefinePatternVariableExp's addCurrent
  * rule; runtime/stream/sql/MatchRecognizeITCase.scala exercises
  * `DOWN AS price < LAST(DOWN.price, 1) OR LAST(DOWN.price, 1) IS
  * NULL` and cross-variable `UP AS price > LAST(DOWN.price)`).
  * Physical offsets beyond PREV(col) and NEXT are rejected, as in the
  * reference ("Flink does not support physical offsets within
  * partition").
  */
class CepNavigationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
  private def ev(id: Long, m: Int, t: String, v: Double = 0.0) =
    Event(id, ts(m), 1, t, v)

  private def run(sql: String, events: Seq[Event]): Seq[Seq[Long]] = {
    val p = MatchRecognize.parse(spark, sql)
    val (m, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    (m ++ Cep.flush(p, 1L, st)).map(_.event_ids)
  }

  test("rising run: U{3} with value > LAST(U.value, 1) (self navigation)") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (U{3})
      DEFINE U AS value > LAST(U.value, 1) OR LAST(U.value, 1) IS NULL)"""
    // LAST(U.value, 1): the current row joins U's own list, so offset 1
    // is the PREVIOUS U row; the first U sees NULL and accepts any row
    val events = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 12), ev(3, 2, "t", 15),
      ev(4, 3, "t", 14), ev(5, 4, "t", 16), ev(6, 5, "t", 20))
    // rising triples: (1,2,3) and (4,5,6); (2,3,4) breaks at 14<15,
    // (3,4,5) at 14<15
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
  }

  test("V-shape with cross-variable LAST and mixed PREV (reference ITCase shape)") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      PATTERN (STRT DOWN+ UP+)
      DEFINE
        DOWN AS value < LAST(DOWN.value, 1) OR LAST(DOWN.value, 1) IS NULL,
        UP AS value > LAST(DOWN.value) AND value > PREV(value))"""
    val prices = Seq(19.0, 17, 13, 16, 20, 22, 25, 19, 15, 14, 18)
    val events = prices.zipWithIndex.map { case (p, i) =>
      ev(i + 1L, i, "tick", p)
    }
    // match 1: STRT=19, DOWN 17,13 (each below the previous DOWN),
    // UP 16,20,22,25 (above the bottom 13 AND rising); 19@8 breaks the
    // rise, retiring the greedy UP run. match 2: STRT=19@8, DOWN 15,14,
    // UP 18 (flush emits the pending greedy loop).
    assert(run(sql, events) ==
      Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L), Seq(8L, 9L, 10L, 11L)))
  }

  test("FIRST with offsets over another variable's history") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (W{3} P)
      DEFINE P AS value > FIRST(W.value) AND value < FIRST(W.value, 1))"""
    // P must exceed the first W but stay below the second
    val events = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 30), ev(3, 2, "t", 20),
      ev(4, 3, "t", 15))
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L, 4L)))
    // violating the upper bound kills the match
    val miss = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 30), ev(3, 2, "t", 20),
      ev(4, 3, "t", 35))
    assert(run(sql, miss).isEmpty)
  }

  test("bare qualified reference V.col = LAST(V.col, 0); self-qualifier is the current row") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (A B C)
      DEFINE A AS event_type = 'view',
             B AS value > A.value,
             C AS C.value > B.value)"""
    val events = Seq(
      ev(1, 0, "view", 5), ev(2, 1, "t", 7), ev(3, 2, "t", 9),
      ev(4, 3, "view", 9), ev(5, 4, "t", 8))
    // 1,2,3 matches; the window starting at 4 dies (8 < 9)
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L)))
  }

  test("unqualified LAST(col, n) navigates ALL matched rows (universal variable)") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (A B C)
      DEFINE C AS value > LAST(value, 1) AND value > LAST(value, 2))"""
    // LAST(value, 1)/(value, 2): current row included → offsets 1 and 2
    // are the B and A rows
    val events = Seq(
      ev(1, 0, "t", 5), ev(2, 1, "t", 7), ev(3, 2, "t", 9),
      ev(4, 3, "t", 6))
    // (1,2,3): 9>7,9>5 ok; (2,3,4): 6<9 fails
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L)))
  }

  test("LAST over a variable that matched nothing is NULL (optional B)") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (A B? C)
      DEFINE A AS event_type = 'view',
             B AS event_type = 'promo',
             C AS event_type = 'click' AND
                 ((LAST(B.value) IS NULL AND value > 0)
                  OR value > LAST(B.value)))"""
    // no promo: B skipped, LAST(B.value) IS NULL arm accepts
    assert(run(sql, Seq(ev(1, 0, "view", 5), ev(2, 1, "click", 3)))
      == Seq(Seq(1L, 2L)))
    // promo present: C must exceed it
    assert(run(sql, Seq(ev(1, 0, "view", 5), ev(2, 1, "promo", 4),
      ev(3, 2, "click", 3))).isEmpty)
    assert(run(sql, Seq(ev(1, 0, "view", 5), ev(2, 1, "promo", 4),
      ev(3, 2, "click", 6))) == Seq(Seq(1L, 2L, 3L)))
  }

  test("self-qualified PREV equals bare PREV (canonical UP.price > PREV(UP.price))") {
    def sql(define: String) = s"""MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (U{2})
      DEFINE U AS $define)"""
    // PREV is PHYSICAL: the first U must also rise vs its predecessor
    // (same semantics the q_cep_sql_updown lag() oracle checks)
    val events = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 12), ev(3, 2, "t", 13),
      ev(4, 3, "t", 9), ev(5, 4, "t", 11), ev(6, 5, "t", 14))
    val bare = run(sql("value > PREV(value)"), events)
    val qualified = run(sql("U.value > PREV(U.value)"), events)
    assert(bare == qualified)
    assert(bare == Seq(Seq(2L, 3L), Seq(5L, 6L)))
  }

  test("navigation works on the generic relation path (detectRelation)") {
    import spark.implicits._
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sql = """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (D{2} R)
        DEFINE D AS price < LAST(D.price, 1) OR LAST(D.price, 1) IS NULL,
               R AS price > FIRST(D.price))"""
    val rows = Seq(
      ("acme", t(1), 1L, 20.0), ("acme", t(2), 2L, 15.0),
      ("acme", t(3), 3L, 25.0), ("acme", t(4), 4L, 10.0),
      ("acme", t(5), 5L, 9.0), ("acme", t(6), 6L, 9.5))
    val got = MatchRecognize
      .detectRelation(rows.toDF("sym", "ts", "seqno", "price"), sql)
      .collect()
      .map(r => (r.getAs[Long]("seqno"), r.getAs[String]("classifier")))
      .toSet
    // (20,15,25): 25 > FIRST(D)=20 → match; (10,9,9.5): 9.5 < 10 → no
    assert(got == Set((1L, "D"), (2L, "D"), (3L, "R")))
  }

  test("relation streaming equals batch with navigation (out-of-order input)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val sql = """MATCH_RECOGNIZE (
        PARTITION BY sym
        ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (U{3})
        DEFINE U AS price > LAST(U.price, 1) OR LAST(U.price, 1) IS NULL)"""
    val rows = Seq( // scrambled arrival vs event time
      ("acme", t(3), 3L, 13.0), ("acme", t(1), 1L, 10.0),
      ("acme", t(5), 5L, 9.0), ("acme", t(2), 2L, 12.0),
      ("acme", t(4), 4L, 15.0), ("acme", t(6), 6L, 11.0),
      ("acme", t(7), 7L, 14.0))
    val df = rows.toDF("sym", "ts", "seqno", "price")
    val batch = MatchRecognize.detectRelation(df, sql)
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("seqno"),
        r.getAs[Long]("row_in_match")))
      .toSet
    assert(batch.nonEmpty)
    val in = MemoryStream[(String, java.sql.Timestamp, Long, Double)]
    val q = MatchRecognize
      .detectRelationStream(in.toDS().toDF("sym", "ts", "seqno", "price"),
        sql, "30 seconds")
      .writeStream.format("memory").queryName("nav_stream_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData(("zzz", t(60), 0L, 0.0))
      q.processAllAvailable()
      in.addData(("zzz", t(120), 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT sym, seqno, row_in_match FROM nav_stream_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("MEASURES offset navigation: ONE ROW whole-match FIRST/LAST with n") {
    import spark.implicits._
    val events = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 12), ev(3, 2, "t", 15)).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """
      MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(U.event_id, 1) AS f1,
                 LAST(U.event_id, 1) AS l1,
                 LAST(U.event_id, 5) AS oob
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (U{3})
        DEFINE U AS value > LAST(U.value, 1) OR LAST(U.value, 1) IS NULL)
      """).collect()
    assert(out.length == 1)
    // both offset-1 navigations address the middle row of the triple;
    // offset past the match is NULL, not an error
    assert(out(0).getAs[Long]("f1") == 2L)
    assert(out(0).getAs[Long]("l1") == 2L)
    assert(out(0).isNullAt(out(0).fieldIndex("oob")))
  }

  test("MEASURES offset navigation: ALL ROWS RUNNING vs FINAL semantics") {
    import spark.implicits._
    val events = Seq(
      ev(1, 0, "t", 10), ev(2, 1, "t", 12), ev(3, 2, "t", 15)).toDS()
    val out = MatchRecognize.detectBatchAllRowsWithMeasures(events, """
      MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES LAST(U.event_id, 1) AS run_l1,
                 FINAL LAST(U.event_id, 1) AS fin_l1
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (U{3})
        DEFINE U AS value > LAST(U.value, 1) OR LAST(U.value, 1) IS NULL)
      """).orderBy(org.apache.spark.sql.functions.col("row_in_match"))
      .collect()
    assert(out.length == 3)
    // RUNNING: prefix navigation — row 1 has no offset-1 predecessor
    // (NULL), row 2 sees row 1, row 3 sees row 2; FINAL: whole match
    // on every row (always the middle row, event 2)
    val runL1 = out.map(r =>
      if (r.isNullAt(r.fieldIndex("run_l1"))) None
      else Some(r.getAs[Long]("run_l1")))
    assert(runL1.toSeq == Seq(None, Some(1L), Some(2L)))
    assert(out.forall(_.getAs[Long]("fin_l1") == 2L))
  }

  test("pattern variable colliding with a struct column is rejected at compile") {
    import org.apache.spark.sql.functions.{col, struct}
    import spark.implicits._
    // relation input with a STRUCT column named 'a' — PATTERN (A ...)
    // would make `a.field` ambiguous between struct access and
    // pattern-variable navigation
    val df = Seq((1L, 10.0, "x")).toDF("user_id", "v", "tag")
      .withColumn("a", struct(col("v"), col("tag")))
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
    val ex = intercept[IllegalArgumentException] {
      MatchRecognize.detectRelation(df, """
        MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          PATTERN (A B)
          DEFINE A AS v > 0, B AS v > a.v)
        """).collect()
    }
    assert(ex.getMessage.contains("collides with struct column"),
      s"wrong error: ${ex.getMessage}")
  }

  test("rejections: NEXT, PREV offsets, PREV of another variable, expressions inside navigation") {
    def bad(define: String): String = intercept[IllegalArgumentException] {
      run(s"""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        PATTERN (A B)
        DEFINE B AS $define)""", Seq(ev(1, 0, "t", 1)))
    }.getMessage
    assert(bad("value > NEXT(value)").contains("NEXT"))
    assert(bad("value > PREV(value, 2)").contains("offset"))
    assert(bad("value > PREV(A.value)").contains("CURRENT row"))
    assert(bad("value > LAST(A.value + 1)").contains("plain column"))
    assert(bad("value > LAST(Z.value)").contains("not a pattern variable"))
    assert(bad("value > FIRST(A.missing)").contains("unknown column"))
    // navigation inside grouped alternation is rejected loudly
    val msg = intercept[IllegalArgumentException] {
      run("""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        PATTERN ((A|B)+)
        DEFINE A AS value > LAST(A.value, 1))""", Seq(ev(1, 0, "t", 1)))
    }.getMessage
    assert(msg.contains("alternation"))
  }
}
