package graft

import graft.streaming.Cep
import graft.streaming.StreamingOps.Event
import org.scalatest.funsuite.AnyFunSuite

/** Loop-contiguity modifiers (reference
  * flink-libraries/flink-cep/.../pattern/Pattern.java:437 consecutive,
  * :477 allowCombinations): the same one-or-more loop run in all three
  * modes over one input must produce three different match sets —
  *  - consecutive: strict inside the loop; a gap event closes it →
  *    maximal uninterrupted runs;
  *  - default relaxed: gaps ignored; later matching events rejoin the
  *    loop → one bridge match per key;
  *  - allowCombinations: matching events may also be SKIPPED between
  *    iterations → every order-preserving combination.
  */
class CepContiguitySpec extends AnyFunSuite {

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
  private def ev(id: Long, m: Int, t: String) = Event(id, ts(m), 1, t, 0.0)

  // E E V E P E E : runs {1,2}, {4}, {6,7} separated by view/purchase
  private val input = Seq(
    ev(1, 0, "error"), ev(2, 1, "error"), ev(3, 2, "view"),
    ev(4, 3, "error"), ev(5, 4, "purchase"), ev(6, 5, "error"),
    ev(7, 6, "error")
  )

  private def loop(
      consecutive: Boolean,
      combinations: Boolean,
      greedy: Boolean,
      skip: Cep.SkipStrategy = Cep.SkipPastLastEvent) =
    Cep.SequencePattern(
      Seq(Cep.Step("errs", _.event_type == "error", oneOrMore = true,
        greedy = greedy, consecutive = consecutive, combinations = combinations)),
      withinMs = Long.MaxValue,
      strict = false,
      skip = skip
    )

  private def run(p: Cep.SequencePattern): Seq[Seq[Long]] = {
    val (matches, st) = Cep.advance(p, 1L, input, Cep.NfaState(Seq.empty, 0L))
    (matches ++ Cep.flush(p, 1L, st)).map(_.event_ids)
  }

  test("consecutive: a gap event closes the loop — maximal uninterrupted runs") {
    assert(run(loop(consecutive = true, combinations = false, greedy = true)) ==
      Seq(Seq(1L, 2L), Seq(4L), Seq(6L, 7L)))
  }

  test("default relaxed: the loop bridges gaps — one maximal match per key") {
    assert(run(loop(consecutive = false, combinations = false, greedy = true)) ==
      Seq(Seq(1L, 2L, 4L, 6L, 7L)))
  }

  test("allowCombinations: matching events may be skipped between iterations") {
    val got =
      run(loop(consecutive = false, combinations = true, greedy = false, Cep.NoSkip)).toSet
    // every non-empty ordered combination of {1,2,4,6,7} keyed by its
    // first element: sum over starts of 2^(later elements) = 16+8+4+2+1
    val errs = Seq(1L, 2L, 4L, 6L, 7L)
    val expected = errs.indices.flatMap { i =>
      val rest = errs.drop(i + 1)
      rest.indices.inclusive.flatMap(k => rest.combinations(k))
        .map(c => errs(i) +: c)
    }.map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 31)
    // default relaxed reluctant loop (no combinations) only ever GROWS
    // its run — prefixes of each suffix-run, no skipped elements
    val plain =
      run(loop(consecutive = false, combinations = false, greedy = false, Cep.NoSkip)).toSet
    assert(plain.contains(Seq(1L, 2L, 4L)) && !plain.contains(Seq(1L, 4L)))
    assert(plain.subsetOf(got))
  }

  test("oracle shape: q_cep_consecutive equals islands-by-run SQL semantics") {
    // crafted key with a trailing run (flush path) and an isolated error
    val in2 = Seq(
      ev(10, 0, "view"), ev(11, 1, "error"), ev(12, 2, "purchase"),
      ev(13, 3, "error"), ev(14, 4, "error"), ev(15, 5, "error")
    )
    val p = loop(consecutive = true, combinations = false, greedy = true)
    val (m, st) = Cep.advance(p, 9L, in2, Cep.NfaState(Seq.empty, 0L))
    val all = (m ++ Cep.flush(p, 9L, st)).map(_.event_ids)
    assert(all == Seq(Seq(11L), Seq(13L, 14L, 15L)))
  }
}
