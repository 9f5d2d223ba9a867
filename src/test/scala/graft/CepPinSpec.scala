package graft

import graft.streaming.{Cep, CepCore}
import org.scalatest.funsuite.AnyFunSuite

/** r22: the CEP key-exchange partition pin is consumer-conditional —
  * MEASURES entry points skip it for patterns whose NFA is not the
  * CPU-dominant phase. This spec pins the classifier the decision
  * rides on (CepCore.SequencePattern.cpuBoundNfa): alternation,
  * grouped ordered choice and unbounded oneOrMore loops are cpu-bound;
  * plain sequences and bounded times(n) unrolls are not.
  */
class CepPinSpec extends AnyFunSuite {

  private def step(name: String) =
    CepCore.Step[Int](name, (_, _) => true)

  test("plain bounded sequences are not cpu-bound") {
    val plain = CepCore.SequencePattern[Int](
      Seq(step("a"), step("b")), withinMs = 1000L, strict = true)
    assert(!plain.cpuBoundNfa)
    // times(n) unrolls statically — bounded work per row (the
    // nav_measures U{3} shape)
    val times = CepCore.SequencePattern[Int](
      Seq(step("u").copy(times = 3)), withinMs = 1000L, strict = true)
    assert(!times.cpuBoundNfa)
    // times(n, m) adds optional copies — still a bounded unroll
    val range = CepCore.SequencePattern[Int](
      Seq(step("u").copy(times = 2, timesMax = 4)),
      withinMs = 1000L, strict = true)
    assert(!range.cpuBoundNfa)
  }

  test("alternation, choices and oneOrMore loops are cpu-bound") {
    // PATTERN alternation (A B | C)
    val alt = CepCore.SequencePattern[Int](
      Seq(step("a"), step("b")), withinMs = 1000L, strict = false,
      orElse = Seq(Seq(step("c"))))
    assert(alt.cpuBoundNfa)
    // grouped ordered choice (E|V)+ — one choice step, looping
    val choice = CepCore.SequencePattern[Int](
      Seq(step("ev").copy(oneOrMore = true,
        choices = Seq(
          "E" -> ((_: Option[Int], _: Int) => true),
          "V" -> ((_: Option[Int], _: Int) => false))), step("p")),
      withinMs = 1000L, strict = false)
    assert(choice.cpuBoundNfa)
    // plain unbounded loop
    val loop = CepCore.SequencePattern[Int](
      Seq(step("a").copy(oneOrMore = true)), withinMs = 1000L,
      strict = false)
    assert(loop.cpuBoundNfa)
    // group loop compiles to a back-edge on its last expanded step
    val groupLoop = CepCore.SequencePattern[Int](
      Seq(CepCore.Group[Int](Seq(step("a"), step("b")), oneOrMore = true)),
      withinMs = 1000L, strict = false)
    assert(groupLoop.cpuBoundNfa)
  }

  test("the parsed MATCH_RECOGNIZE patterns classify as measured") {
    val spark = SparkTestSession.get
    // group_alt's (E|V)+ P — cpu-bound (keeps the pin)
    val groupAlt = graft.streaming.MatchRecognize.parse(spark, """
      MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN ((E|V)+ P)
        DEFINE E AS event_type = 'error',
               V AS event_type = 'view',
               P AS event_type = 'purchase')
    """)
    assert(groupAlt.cpuBoundNfa)
    // nav_measures' U{3} — bounded (its MEASURES caller skips the pin)
    val nav = graft.streaming.MatchRecognize.parse(spark, """
      MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (U{3})
        DEFINE U AS value > LAST(U.value, 1) OR LAST(U.value, 1) IS NULL)
    """)
    assert(!nav.cpuBoundNfa)
  }

  test("pinParallelism does not change detectBatch results") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val events = Seq(
      graft.streaming.StreamingOps.Event(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "error", 1.0),
      graft.streaming.StreamingOps.Event(2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "error", 2.0),
      graft.streaming.StreamingOps.Event(3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 8L, "error", 3.0),
      graft.streaming.StreamingOps.Event(4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 8L, "error", 4.0)
    ).toDS()
    val pat = Cep.SequencePattern(
      steps = Seq(Cep.Step("e1", _.event_type == "error"),
        Cep.Step("e2", _.event_type == "error")),
      withinMs = 60000L, strict = true)
    def run(pin: Boolean) =
      Cep.detectBatch(events, pat, pinParallelism = pin)
        .collect().map(m => (m.key, m.event_ids)).sortBy(_._1).toSeq
    assert(run(true) == run(false))
  }
}
