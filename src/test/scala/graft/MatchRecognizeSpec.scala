package graft

import graft.streaming.{Cep, MatchRecognize}
import graft.streaming.StreamingOps.Event
import org.scalatest.funsuite.AnyFunSuite

/** SQL MATCH_RECOGNIZE front-end: the parsed pattern must behave
  * exactly like the hand-built Scala SequencePattern, and DEFINE
  * predicates must follow Spark SQL semantics (coercion, functions,
  * null handling) because they ARE Spark-compiled expressions.
  */
class MatchRecognizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
  private def ev(id: Long, m: Int, t: String, v: Double = 0.0) =
    Event(id, ts(m), 1, t, v)

  private def run(sql: String, events: Seq[Event]): Seq[Seq[Long]] = {
    val p = MatchRecognize.parse(spark, sql)
    val (m, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    (m ++ Cep.flush(p, 1L, st)).map(_.event_ids)
  }

  test("two-step pattern with WITHIN equals the Scala API") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (A B) WITHIN INTERVAL '30' MINUTE
      DEFINE A AS event_type = 'error', B AS event_type = 'error')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 5, "error"), ev(3, 10, "click"),
      ev(4, 20, "error"), ev(5, 60, "error"), ev(6, 65, "error"))
    assert(run(sql, events) == Seq(Seq(1L, 2L), Seq(5L, 6L)))
  }

  test("greedy + with SKIP PAST LAST ROW: maximal runs, non-overlapping") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      PATTERN (E+ R)
      DEFINE E AS event_type = 'error', R AS event_type <> 'error')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "view"),
      ev(4, 3, "error"), ev(5, 4, "view"))
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L), Seq(4L, 5L)))
  }

  test("reluctant +?, optional ?, times {n} and {n,m} quantifiers") {
    val rel = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (E+? R)
      DEFINE E AS event_type = 'error', R AS event_type = 'view')"""
    // reluctant: E run then view — shortest completion per start
    assert(run(rel, Seq(ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "view")))
      == Seq(Seq(1L, 2L, 3L), Seq(2L, 3L)))
    val opt = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (S P? B)
      DEFINE S AS event_type = 'signup', P AS event_type = 'promo',
             B AS event_type = 'purchase')"""
    assert(run(opt, Seq(ev(1, 0, "signup"), ev(2, 1, "purchase")))
      == Seq(Seq(1L, 2L)))
    assert(run(opt, Seq(ev(1, 0, "signup"), ev(2, 1, "promo"), ev(3, 2, "purchase")))
      == Seq(Seq(1L, 2L, 3L)))
    val times = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (E{2})
      DEFINE E AS event_type = 'error')"""
    assert(run(times, Seq(ev(1, 0, "error"), ev(2, 1, "error"),
      ev(3, 2, "error"), ev(4, 3, "error")))
      == Seq(Seq(1L, 2L), Seq(3L, 4L)))
    val range = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (E{1,2} R)
      DEFINE E AS event_type = 'error', R AS event_type = 'view')"""
    // from e1: {e1,e2,view} (2 errors) and the 1-error branch can't
    // reach view strictly; from e2: {e2,view}
    assert(run(range, Seq(ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "view"))).toSet
      == Set(Seq(1L, 2L, 3L), Seq(2L, 3L)))
  }

  test("DEFINE is real Spark SQL: coercion, functions, undefined var = any row") {
    val sql = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (BIGV ANYROW)
      DEFINE BIGV AS value > 100 AND upper(event_type) LIKE 'P%')"""
    // value > 100: int literal coerced against double column; ANYROW
    // has no DEFINE -> matches any row (SQL-standard rule)
    val events = Seq(
      ev(1, 0, "purchase", 150.5), ev(2, 1, "view", 999.0),
      ev(3, 2, "purchase", 50.0), ev(4, 3, "view", 1.0))
    assert(run(sql, events) == Seq(Seq(1L, 2L)))
  }

  test("zero-or-more * spans none or many") {
    val sql = """MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (S E* B)
      DEFINE S AS event_type = 'signup', E AS event_type = 'error',
             B AS event_type = 'purchase')"""
    assert(run(sql, Seq(ev(1, 0, "signup"), ev(2, 1, "purchase")))
      == Seq(Seq(1L, 2L)))
    assert(run(sql, Seq(ev(1, 0, "signup"), ev(2, 1, "error"),
      ev(3, 2, "error"), ev(4, 3, "purchase")))
      == Seq(Seq(1L, 2L, 3L, 4L)))
  }

  test("parse errors are loud: unknown column, bad partition key") {
    val badCol = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts PATTERN (A)
        DEFINE A AS no_such_col = 1)""")
    }
    assert(badCol.getMessage.contains("no_such_col"))
    val badKey = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, """MATCH_RECOGNIZE (
        PARTITION BY other_key ORDER BY ts PATTERN (A)
        DEFINE A AS value > 0)""")
    }
    assert(badKey.getMessage.contains("other_key"))
  }

  test("streaming path: SQL text carries partials across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = graft.streaming.MatchRecognize
      .detectStream(in.toDS(), """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (E1 E2) WITHIN INTERVAL '30' MINUTE
        DEFINE E1 AS event_type = 'error', E2 AS event_type = 'error')""")
      .writeStream.format("memory").queryName("mr_out")
      .outputMode("append").start()
    try {
      in.addData(Event(1, ts(0), 7, "error", 0.0)) // partial only
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM mr_out").count() == 0)
      in.addData(Event(2, ts(5), 7, "error", 0.0)) // completes across batches
      q.processAllAvailable()
      val m = spark.sql("SELECT event_ids FROM mr_out").collect()
      assert(m.length == 1 && m(0).getSeq[Long](0) == Seq(1L, 2L))
    } finally q.stop()
  }

  test("distributed path: SQL text equals the Scala API on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // sf0.01: the smallest SF with actual double-error sequences
    val events = Engine.Tables(spark, "/root/testdata/sf0.01").events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    val viaSql = MatchRecognize.detectBatch(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (E1 E2) WITHIN INTERVAL '30' MINUTE
        DEFINE E1 AS event_type = 'error', E2 AS event_type = 'error')""")
      .select(col("key"), col("event_ids")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val viaApi = Cep.detectBatch(events, Cep.SequencePattern(
      Seq(Cep.Step("e1", _.event_type == "error"),
        Cep.Step("e2", _.event_type == "error")),
      withinMs = 30L * 60 * 1000, strict = true, skip = Cep.SkipToNext))
      .select(col("key"), col("event_ids")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("MEASURES: per-variable FIRST/LAST/COUNT/SUM/AVG/MIN/MAX on a known burst") {
    import spark.implicits._
    // user 9: error(2.0) error(4.0) error(6.0) ok(9.0) — one E+ R match
    val events = Seq(
      Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "error", 4.0),
      Event(3, ts(2), 9, "error", 6.0),
      Event(4, ts(3), 9, "ok", 9.0)
    ).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(E.value) AS fv, LAST(E.value) AS lv,
                 COUNT(E.*) AS ne, SUM(E.value) AS sv, AVG(E.value) AS av,
                 MIN(E.value) AS mn, MAX(E.value) AS mx,
                 FIRST(R.event_id) AS rid
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("fv") == 2.0 && r.getAs[Double]("lv") == 6.0)
    assert(r.getAs[Long]("ne") == 3L)
    assert(r.getAs[Double]("sv") == 12.0 && r.getAs[Double]("av") == 4.0)
    assert(r.getAs[Double]("mn") == 2.0 && r.getAs[Double]("mx") == 6.0)
    assert(r.getAs[Long]("rid") == 4L)
  }

  test("ALL ROWS PER MATCH: measures are RUNNING — per-row prefix aggregates") {
    import spark.implicits._
    // user 9: error(2.0) error(4.0) error(6.0) ok(9.0) — one E+ R match
    val events = Seq(
      Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "error", 4.0),
      Event(3, ts(2), 9, "error", 6.0),
      Event(4, ts(3), 9, "ok", 9.0)
    ).toDS()
    val out = MatchRecognize.detectBatchAllRowsWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(E.*) AS ne, SUM(E.value) AS se, LAST(E.value) AS le,
                 FIRST(R.value) AS fr
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .orderBy("row_in_match")
      .collect()
      .map(r => (r.getAs[Long]("row_in_match"), r.getAs[String]("classifier"),
        r.getAs[Long]("ne"), Option(r.getAs[java.lang.Double]("se")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("le")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("fr")).map(_.toDouble)))
      .toSeq
    assert(out == Seq(
      (1L, "E", 1L, Some(2.0), Some(2.0), None),
      (2L, "E", 2L, Some(6.0), Some(4.0), None),
      (3L, "E", 3L, Some(12.0), Some(6.0), None),
      (4L, "R", 3L, Some(12.0), Some(6.0), Some(9.0))))
  }

  test("MEASURES: unsupported items are rejected, absent clause is empty") {
    intercept[IllegalArgumentException] {
      MatchRecognize.parseMeasures(
        "MATCH_RECOGNIZE (MEASURES PREV(A.value) AS x PATTERN (A))")
    }
    assert(MatchRecognize.parseMeasures(
      "MATCH_RECOGNIZE (PATTERN (A) DEFINE A AS value > 0)").isEmpty)
  }

  test("unsupported PATTERN syntax is rejected loudly, not reinterpreted") {
    def bad(pattern: String): String = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, s"""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        PATTERN ($pattern)
        DEFINE A AS event_type = 'a', B AS event_type = 'b')""")
    }.getMessage
    // reluctant star must not silently become greedy star
    assert(bad("B*?").contains("?"))
    // PERMUTE without parentheses is malformed, not a variable name
    assert(bad("PERMUTE A B").contains("PERMUTE"))
    // PERMUTE over 6 distinct terms would expand to 720 alternatives
    // (duplicate terms dedup for free: .permutations is distinct)
    assert(bad("PERMUTE(A,B,C,D,E,F)").contains("720"))
    // an empty PERMUTE argument is malformed
    assert(bad("PERMUTE(A,,B)").contains("empty"))
    // open-ended {n,} must not silently lose its quantifier
    assert(bad("A{2,}").contains("{2,}"))
    // nested groups are outside the one-level subset
    assert(bad("((A B)+ C)").contains("("))
    // a '*'- or '?'-quantified group is not expressible as a Group
    assert(bad("(A B)*").contains("*"))
    // grouped alternation is supported for SINGLE-variable
    // alternatives only; multi-variable alternatives must be rewritten
    // as top-level alternation, not silently reassociated
    assert(bad("(A B | A) C").contains("single bare"))
    assert(bad("(A | B B) C").contains("single bare"))
    // a range-quantified group sub-step breaks the loop back-edge
    assert(bad("(A{1,2} B)+").contains("{1,2}"))
  }

  test("PERMUTE expands to alternation of every permutation, in definition order") {
    // reference semantics: PERMUTE(p1..pn) = alternation of all
    // permutations, lexicographic in definition order (Calcite row-
    // pattern grammar; Flink compiles the same expansion)
    assert(MatchRecognize.expandPermute("PERMUTE(A, B)") == Seq("A B", "B A"))
    assert(MatchRecognize.expandPermute("S PERMUTE(A, B+) E") ==
      Seq("S A B+ E", "S B+ A E"))
    // nested PERMUTE expands recursively; duplicates collapse
    assert(MatchRecognize.expandPermute("PERMUTE(PERMUTE(A, B), C)").toSet ==
      Set("A B C", "B A C", "C A B", "C B A"))
    // a PERMUTE-free alternative passes through untouched
    assert(MatchRecognize.expandPermute("A B+ C") == Seq("A B+ C"))
    // end-to-end: the parsed pattern carries one branch per permutation
    val p = MatchRecognize.parse(spark, """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      PATTERN (PERMUTE(A, B))
      DEFINE A AS event_type = 'a', B AS event_type = 'b')""")
    assert(p.orElse.size == 1) // A B primary + B A branch
  }

  test("strict PARTITION BY / ORDER BY parsing: trailing tokens are rejected") {
    // 'ORDER BY ts DESC' must not silently order ascending, and a
    // qualified 'PARTITION BY a.b' must not silently key by 'a'
    def bad(clause: String): String = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, s"""MATCH_RECOGNIZE (
        $clause
        PATTERN (A B)
        DEFINE A AS event_type = 'a', B AS event_type = 'b')""")
    }.getMessage
    assert(bad("PARTITION BY user_id ORDER BY ts DESC").contains("DESC"))
    assert(bad("PARTITION BY e.user_id ORDER BY ts").contains("e.user_id"))
  }

  test("SQL PATTERN alternation A | B: each alternative is an NFA branch") {
    // (S P | E R): signup-promo OR error-recovery pairs, per start
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (S P | E R)
      DEFINE S AS event_type = 'signup', P AS event_type = 'promo',
             E AS event_type = 'error',  R AS event_type = 'view')"""
    val events = Seq(
      ev(1, 0, "signup"), ev(2, 1, "promo"),
      ev(3, 2, "error"), ev(4, 3, "view"),
      ev(5, 4, "signup"), ev(6, 5, "view"))
    assert(run(sql, events) == Seq(Seq(1L, 2L), Seq(3L, 4L)))
  }

  test("SQL PATTERN group (A B)+ equals the Scala Group API") {
    // textual (E V)+ P == Cep.Group(Seq(E, V), oneOrMore) :+ P
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN ((E V)+ P)
      DEFINE E AS event_type = 'error', V AS event_type = 'view',
             P AS event_type = 'purchase')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"),
      ev(3, 2, "error"), ev(4, 3, "view"), ev(5, 4, "purchase"))
    val viaSql = run(sql, events)
    val pattern = Cep.SequencePattern(
      Seq(
        Cep.Group(Seq(
          Cep.Step("E", _.event_type == "error"),
          Cep.Step("V", _.event_type == "view")), oneOrMore = true),
        Cep.Step("P", _.event_type == "purchase")),
      withinMs = Long.MaxValue, strict = true, skip = Cep.SkipToNext)
    val (m, st) = Cep.advance(pattern, 1L, events, Cep.NfaState(Seq.empty, 0L))
    val viaApi = (m ++ Cep.flush(pattern, 1L, st)).map(_.event_ids)
    assert(viaSql == viaApi)
    assert(viaSql == Seq(Seq(1L, 2L, 3L, 4L, 5L), Seq(3L, 4L, 5L)))
  }

  test("SQL grouped alternation (E|V)+ equals the Scala Choice API") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN ((E|V)+ P)
      DEFINE E AS event_type = 'error', V AS event_type = 'view',
             P AS event_type = 'purchase')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"), ev(3, 2, "error"),
      ev(4, 3, "purchase"))
    val viaSql = run(sql, events)
    val pattern = Cep.SequencePattern(
      Seq(
        Cep.Choice(Seq(
          "E" -> ((e: Event) => e.event_type == "error"),
          "V" -> ((e: Event) => e.event_type == "view")),
          oneOrMore = true, greedy = true),
        Cep.Step("P", _.event_type == "purchase")),
      withinMs = Long.MaxValue, strict = true, skip = Cep.SkipToNext)
    val (m, st) = Cep.advance(pattern, 1L, events, Cep.NfaState(Seq.empty, 0L))
    val viaApi = (m ++ Cep.flush(pattern, 1L, st)).map(_.event_ids)
    assert(viaSql == viaApi)
    assert(viaSql == Seq(Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L), Seq(3L, 4L)))
    // per-row labels follow the choice taken, in both surfaces
    assert((m ++ Cep.flush(pattern, 1L, st)).head.step_names ==
      Seq("E", "V", "E", "P"))
  }

  test("SQL PATTERN group with times (A B){2}") {
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN ((E V){2})
      DEFINE E AS event_type = 'error', V AS event_type = 'view')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"),
      ev(3, 2, "error"), ev(4, 3, "view"),
      ev(5, 4, "error"), ev(6, 5, "view"))
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L, 4L)))
  }

  test("grouped alternation (E|V)+: mixed iterations, per-row choice labels") {
    // each loop iteration may take a DIFFERENT variable, and every
    // consumed row is labeled with the choice that matched it
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN ((E|V)+ P)
      DEFINE E AS event_type = 'error', V AS event_type = 'view',
             P AS event_type = 'purchase')"""
    val events = Seq(
      ev(1, 0, "error"), ev(2, 1, "view"), ev(3, 2, "error"),
      ev(4, 3, "purchase"), ev(5, 4, "view"), ev(6, 5, "purchase"))
    val p = MatchRecognize.parse(spark, sql)
    val (m, st) = Cep.advance(p, 1L, events, Cep.NfaState(Seq.empty, 0L))
    val all = m ++ Cep.flush(p, 1L, st)
    assert(all.map(_.event_ids) == Seq(
      Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L), Seq(3L, 4L), Seq(5L, 6L)))
    assert(all.map(_.step_names.mkString("")) ==
      Seq("EVEP", "VEP", "EP", "VP"))
    // a quantified choice group unrolls into that many choice steps
    val twice = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN ((E|V){2})
      DEFINE E AS event_type = 'error', V AS event_type = 'view')"""
    val p2 = MatchRecognize.parse(spark, twice)
    val (m2, st2) = Cep.advance(p2, 1L, events, Cep.NfaState(Seq.empty, 0L))
    val all2 = m2 ++ Cep.flush(p2, 1L, st2)
    assert(all2.map(_.event_ids) == Seq(Seq(1L, 2L)))
    assert(all2.head.step_names == Seq("E", "V"))
  }

  test("SUBSET union variable as a skip target") {
    // SKIP TO LAST U with U = (E, V): boundary is the last row matched
    // to ANY member — stride 2 over a mixed error/view run
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO LAST U
      PATTERN ((E|V){3})
      SUBSET U = (E, V)
      DEFINE E AS event_type = 'error', V AS event_type = 'view')"""
    val events = Seq(ev(1, 0, "error"), ev(2, 1, "view"), ev(3, 2, "view"),
      ev(4, 3, "error"), ev(5, 4, "view"), ev(6, 5, "purchase"))
    assert(run(sql, events) == Seq(Seq(1L, 2L, 3L), Seq(3L, 4L, 5L)))
    // an undefined subset member still throws at resolution
    val e = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO LAST U
        PATTERN (E V)
        SUBSET U = (E, Z)
        DEFINE E AS event_type = 'error', V AS event_type = 'view')""")
    }
    assert(e.getMessage.contains("undefined pattern variable Z"))
  }

  test("quote-aware clause extraction: literals with parens and keywords") {
    // a DEFINE literal containing ')' must not truncate the body, and
    // one containing the word PATTERN must not misdirect the clause scan
    val sql = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (A B)
      DEFINE A AS event_type = ':-)' , B AS event_type <> 'PATTERN (X)')"""
    val events = Seq(ev(1, 0, ":-)"), ev(2, 1, "ok"))
    assert(run(sql, events) == Seq(Seq(1L, 2L)))
  }

  test("keyword inside an identifier does not misdirect the PATTERN scan") {
    import spark.implicits._
    // MEASURES alias `pattern_count` contains the word PATTERN — the
    // clause scan must find the real PATTERN clause, not the alias
    val events = Seq(
      Event(1, ts(0), 3, "error", 1.0),
      Event(2, ts(1), 3, "error", 2.0),
      Event(3, ts(2), 3, "ok", 9.0)).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(E.*) AS pattern_count, SUM(E.value) AS s
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("pattern_count") == 2L)
    assert(out.head.getAs[Double]("s") == 3.0)
  }

  test("lowercase pattern variables: MEASURES and CLASSIFIER still resolve") {
    import spark.implicits._
    // identifiers are case-insensitive in SQL: labels normalize to
    // upper case so measures over `e`/`r` see the matched rows
    val events = Seq(
      Event(1, ts(0), 4, "error", 2.0),
      Event(2, ts(1), 4, "error", 4.0),
      Event(3, ts(2), 4, "ok", 9.0)).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(e.*) AS ne, SUM(e.value) AS sv, LAST(r.event_id) AS rid
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (e+ r)
        DEFINE e AS event_type = 'error', r AS event_type <> 'error')""")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("ne") == 2L)
    assert(r.getAs[Double]("sv") == 6.0)
    assert(r.getAs[Long]("rid") == 3L)
  }

  test("SUM/AVG over a variable that matched zero rows is NULL, COUNT is 0") {
    import spark.implicits._
    // optional P matches nothing: SUM(P.value)/AVG must be SQL NULL
    val events = Seq(
      Event(1, ts(0), 5, "signup", 1.0),
      Event(2, ts(1), 5, "purchase", 8.0)).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(P.*) AS np, SUM(P.value) AS sp, AVG(P.value) AS ap
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S P? B)
        DEFINE S AS event_type = 'signup', P AS event_type = 'promo',
               B AS event_type = 'purchase')""")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("np") == 0L)
    assert(r.isNullAt(r.fieldIndex("sp")))
    assert(r.isNullAt(r.fieldIndex("ap")))
  }

  test("step_names label every matched row with its pattern variable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val events = Engine.Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    val ms = MatchRecognize.detectBatch(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .select(col("event_ids"), col("step_names")).collect()
    assert(ms.nonEmpty)
    ms.foreach { r =>
      val ids = r.getSeq[Long](0)
      val labs = r.getSeq[String](1)
      assert(ids.length == labs.length)
      assert(labs.init.forall(_ == "E") && labs.last == "R")
    }
  }

  test("SUBSET union variables aggregate over all member labels") {
    import spark.implicits._
    // one E+ R match: errors 2,4,6 then ok 9 — S = (E, R) sees all 4
    val events = Seq(
      Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "error", 4.0),
      Event(3, ts(2), 9, "error", 6.0),
      Event(4, ts(3), 9, "ok", 9.0)
    ).toDS()
    val out = MatchRecognize.detectBatchWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(S.*) AS ns, SUM(S.value) AS ss,
                 FIRST(S.value) AS fs, LAST(S.event_id) AS lid,
                 COUNT(E.*) AS ne
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        SUBSET S = (E, R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("ns") == 4L && r.getAs[Double]("ss") == 21.0)
    assert(r.getAs[Double]("fs") == 2.0 && r.getAs[Long]("lid") == 4L)
    assert(r.getAs[Long]("ne") == 3L)
  }

  test("FINAL vs RUNNING measures in ALL ROWS PER MATCH") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "error", 4.0),
      Event(3, ts(2), 9, "error", 6.0),
      Event(4, ts(3), 9, "ok", 9.0)
    ).toDS()
    val out = MatchRecognize.detectBatchAllRowsWithMeasures(events, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES FINAL SUM(E.value) AS sef, RUNNING SUM(E.value) AS ser,
                 FINAL COUNT(S.*) AS nsf, COUNT(S.*) AS nsr
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E+ R)
        SUBSET S = (E, R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')""")
      .orderBy("row_in_match")
      .collect()
      .map(r => (r.getAs[Long]("row_in_match"), r.getAs[Double]("sef"),
        r.getAs[Double]("ser"), r.getAs[Long]("nsf"), r.getAs[Long]("nsr")))
      .toSeq
    // FINAL sees the whole match on every row; RUNNING the prefix
    assert(out == Seq(
      (1L, 12.0, 2.0, 4L, 1L),
      (2L, 12.0, 6.0, 4L, 2L),
      (3L, 12.0, 12.0, 4L, 3L),
      (4L, 12.0, 12.0, 4L, 4L)))
  }

  test("unknown MEASURES variables and malformed SUBSETs are rejected loudly") {
    import spark.implicits._
    val events = Seq(Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "ok", 9.0)).toDS()
    def sql(measures: String, subset: String = ""): String =
      s"""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES $measures
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E R)
        $subset
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')"""
    // a typo'd variable must not silently aggregate over zero rows
    val e1 = intercept[IllegalArgumentException] {
      MatchRecognize.detectBatchWithMeasures(
        events, sql("COUNT(X.*) AS n")).collect()
    }
    assert(e1.getMessage.contains("unknown variable X"))
    // subset members must be defined pattern variables
    val e2 = intercept[IllegalArgumentException] {
      MatchRecognize.detectBatchWithMeasures(
        events, sql("COUNT(S.*) AS n", "SUBSET S = (E, Z)")).collect()
    }
    assert(e2.getMessage.contains("undefined pattern variable Z"))
    // a subset may not shadow a pattern variable
    val e3 = intercept[IllegalArgumentException] {
      MatchRecognize.detectBatchWithMeasures(
        events, sql("COUNT(E.*) AS n", "SUBSET E = (R)")).collect()
    }
    assert(e3.getMessage.contains("shadows a pattern variable"))
    // duplicate subset names and malformed items are parse errors
    intercept[IllegalArgumentException] {
      MatchRecognize.parseSubsets(
        "MATCH_RECOGNIZE (PATTERN (A B) SUBSET S = (A), S = (B) DEFINE A AS 1=1)")
    }
    intercept[IllegalArgumentException] {
      MatchRecognize.parseSubsets(
        "MATCH_RECOGNIZE (PATTERN (A B) SUBSET S = A DEFINE A AS 1=1)")
    }
    // ONE ROW PER MATCH collapses RUNNING and FINAL: both parse
    val ms = MatchRecognize.parseMeasures(
      "MATCH_RECOGNIZE (MEASURES RUNNING COUNT(A.*) AS r, FINAL SUM(A.value) AS f PATTERN (A))")
    assert(ms.map(m => (m.func, m.isFinal)) == Seq(("COUNT", false), ("SUM", true)))
  }

  test("{- -} exclusion omits rows from ALL ROWS output but not from matching") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "error", 4.0),
      Event(3, ts(2), 9, "error", 6.0),
      Event(4, ts(3), 9, "ok", 9.0)
    ).toDS()
    def sql(pattern: String): String = s"""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(E.*) AS ne, SUM(E.value) AS se
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ($pattern)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')"""
    // excluded E rows: only R emitted, but its RUNNING measures saw
    // every E (ne = 3, se = 12), and row_in_match keeps position 4
    val out = MatchRecognize
      .detectBatchAllRowsWithMeasures(events, sql("{- E+ -} R"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("classifier") == "R")
    assert(r.getAs[Long]("row_in_match") == 4L)
    assert(r.getAs[Long]("ne") == 3L && r.getAs[Double]("se") == 12.0)
    // ONE ROW PER MATCH ignores exclusion: the match still spans all 4
    val one = MatchRecognize.detectBatch(events, sql("{- E+ -} R")).collect()
    assert(one.length == 1 && one.head.event_ids == Seq(1L, 2L, 3L, 4L))
    // plain ALL ROWS (no measures): same single R row
    val plain = MatchRecognize.detectBatchAllRows(events, sql("{- E+ -} R"))
      .select("classifier").collect().map(_.getString(0)).toSeq
    assert(plain == Seq("R"))
    // malformed exclusions are loud
    intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("{- E+ R"))
    }
    intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("{- {- E+ -} -} R"))
    }
    // a variable both inside and outside an exclusion is ambiguous
    intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("{- E -} E R"))
    }
  }

  test("unparseable WITHIN / AFTER MATCH clauses throw, not silently default") {
    def sql(clause: String): String = s"""MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      $clause
      PATTERN (A B)
      DEFINE A AS event_type = 'error', B AS event_type = 'error')"""
    // WEEK is outside the unit subset: must NOT fall back to unbounded
    val e1 = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("WITHIN INTERVAL '2' WEEK"))
    }
    assert(e1.getMessage.contains("WITHIN"))
    // an AFTER MATCH form outside the subset must NOT fall back to
    // the default skip strategy
    val e2 = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("AFTER MATCH SKIP 2 ROWS"))
    }
    assert(e2.getMessage.contains("AFTER MATCH"))
    // 'SKIP TO NEXT MATCH' parses the bare skip-to-variable prefix
    // 'TO NEXT'; the trailing 'MATCH' is stray text — still a loud
    // rejection, never a silent fallback
    val e2b = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, sql("AFTER MATCH SKIP TO NEXT MATCH"))
    }
    assert(e2b.getMessage.contains("unrecognized text"))
    // the bare SQL-standard shorthand SKIP TO <var> = SKIP TO LAST <var>
    assert(MatchRecognize.parse(spark, sql("AFTER MATCH SKIP TO B")).skip ==
      graft.streaming.CepCore.SkipToLast("B", Set("B")))
    // the supported forms still parse
    MatchRecognize.parse(spark, sql("WITHIN INTERVAL '30' MINUTE"))
    MatchRecognize.parse(spark, sql("AFTER MATCH SKIP TO NEXT ROW"))
    // and a quoted literal containing the keyword is not a clause
    MatchRecognize.parse(spark, s"""MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      PATTERN (A)
      DEFINE A AS event_type = 'within after match')""")
    // stray text between clauses (a typo'd or unsupported clause) is
    // rejected by full-coverage validation, not silently skipped
    val e3 = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark,
        sql("WITHIN INTERVAL '30' MINUTE MEASURS COUNT(A.*) AS n"))
    }
    assert(e3.getMessage.contains("unrecognized text"))
    val e4 = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark,
        sql("WITHIN INTERVAL '30' MINUTE ALL ROW PER MATCH"))
    }
    assert(e4.getMessage.contains("unrecognized text"))
  }

  test("ONE ROW / ALL ROWS PER MATCH clause is validated against the API called") {
    import spark.implicits._
    val events = Seq(Event(1, ts(0), 9, "error", 2.0),
      Event(2, ts(1), 9, "ok", 9.0)).toDS()
    def sql(mode: String): String = s"""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(E.*) AS ne
        $mode
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (E R)
        DEFINE E AS event_type = 'error', R AS event_type <> 'error')"""
    // a matching clause is accepted by both surfaces
    assert(MatchRecognize
      .detectBatchAllRowsWithMeasures(events, sql("ALL ROWS PER MATCH"))
      .count() == 2)
    assert(MatchRecognize
      .detectBatchWithMeasures(events, sql("ONE ROW PER MATCH"))
      .count() == 1)
    // a contradicting clause throws instead of being silently ignored
    val e1 = intercept[IllegalArgumentException] {
      MatchRecognize.detectBatchWithMeasures(events, sql("ALL ROWS PER MATCH"))
    }
    assert(e1.getMessage.contains("ONE ROW PER MATCH"))
    intercept[IllegalArgumentException] {
      MatchRecognize.detectBatchAllRows(events, sql("ONE ROW PER MATCH"))
    }
    intercept[IllegalArgumentException] {
      MatchRecognize.detectBatch(events, sql("ALL ROWS PER MATCH"))
    }
  }

  test("AFTER MATCH SKIP TO FIRST/LAST <var> resumes at the variable's row") {
    // SKIP TO LAST X on X{3}: a 6-error run chains with stride 2
    val last = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO LAST X
      PATTERN (X{3})
      DEFINE X AS event_type = 'error')"""
    val errs = (1 to 6).map(i => ev(i, i, "error")) :+ ev(7, 7, "view")
    assert(run(last, errs) == Seq(Seq(1L, 2L, 3L), Seq(3L, 4L, 5L)))
    // SKIP TO FIRST B on (A B{2}) with A = any row: the boundary is
    // the first B, one row past the start — overlapping chains allowed
    val first = """MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      AFTER MATCH SKIP TO FIRST B
      PATTERN (A B{2})
      DEFINE B AS event_type = 'error')"""
    val mixed = Seq(ev(1, 1, "view"), ev(2, 2, "error"), ev(3, 3, "error"),
      ev(4, 4, "error"))
    assert(run(first, mixed) == Seq(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
    // an undefined skip variable is a parse error
    val e1 = intercept[IllegalArgumentException] {
      MatchRecognize.parse(spark, """MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO LAST Z
        PATTERN (X{3})
        DEFINE X AS event_type = 'error')""")
    }
    assert(e1.getMessage.contains("undefined pattern variable Z"))
    // a boundary at the match's own start cannot make progress
    val e2 = intercept[IllegalArgumentException] {
      run("""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO FIRST X
        PATTERN (X{3})
        DEFINE X AS event_type = 'error')""", errs)
    }
    assert(e2.getMessage.contains("match's own start"))
    // a skip variable that matched no row of the emitted match throws
    val e3 = intercept[IllegalArgumentException] {
      run("""MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO LAST B
        PATTERN (A B?)
        DEFINE A AS event_type = 'error', B AS event_type = 'promo')""",
        Seq(ev(1, 1, "error"), ev(2, 2, "view")))
    }
    assert(e3.getMessage.contains("matched no row"))
  }

  test("{- -} exclusion applies to generic relations too") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "a", 20.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "b", 30.0)
    ).toDF("uid", "t", "cat", "amt")
    val out = MatchRecognize.detectRelation(df, """MATCH_RECOGNIZE (
        PARTITION BY uid ORDER BY t
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ({- A+ -} B)
        DEFINE A AS cat = 'a', B AS cat = 'b')""")
      .collect()
    assert(out.map(_.getAs[String]("classifier")).toSeq == Seq("B"))
    assert(out.head.getAs[Long]("row_in_match") == 3L)
  }
}
