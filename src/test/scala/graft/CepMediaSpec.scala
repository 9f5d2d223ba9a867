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
    val (matches, partials) = Cep.advance(errPair, 1L, events, Seq.empty)
    assert(matches.map(_.event_ids) == Seq(Seq(1L, 2L), Seq(5L, 6L)))
    assert(partials.nonEmpty) // e6 starts a fresh partial
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
    val (matches, _) = Cep.advance(p, 1L, events, Seq.empty)
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
    val (matches, _) = Cep.advance(p, 1L, events, Seq.empty)
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
