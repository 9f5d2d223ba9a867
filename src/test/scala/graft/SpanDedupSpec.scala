package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of span-level dedup the sorted-hash oracle can't state
  * directly:
  *  - span conservation: kept + dropped per doc equals the doc's span
  *    count (nothing lost, nothing invented);
  *  - first-occurrence rule: a document's spans are only ever dropped
  *    in favour of an occurrence with a strictly smaller
  *    (doc_id, span_idx) — so the corpus-wide earliest copy survives;
  *  - reassembly: text_dedup is the original word sequence with the
  *    dropped spans excised, order preserved;
  *  - idempotence: running span dedup on its own output drops nothing.
  */
class SpanDedupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.get

  private def result() =
    SparkEntry.queries("q_dedup_spans")(spark, dir)

  test("span counts are conserved and drops exist (planted dups)") {
    val rows = CacheScope.scoped {
      result()
        .join(
          Engine.Tables(spark, dir).documents
            .select(
              col("doc_id"),
              ceil(size(split(col("text"), " ")) / lit(20.0)).cast("long")
                .as("n_spans")),
          Seq("doc_id"))
        .select(col("spans_kept") + col("spans_dropped"), col("n_spans"))
        .collect()
    }
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val dropped = CacheScope.scoped {
      result().agg(sum(col("spans_dropped"))).head.getLong(0)
    }
    assert(dropped > 0, "fixture plants near-dups; some span must drop")
  }

  test("reassembled text is the original minus dropped spans, in order") {
    val docs = Engine.Tables(spark, dir).documents
    val joined = CacheScope.scoped {
      result()
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("text_dedup"),
          col("spans_dropped"), col("spans_kept"))
        .collect()
    }
    joined.foreach { r =>
      val orig = r.getString(1).split(" ", -1).grouped(20).toSeq
      val kept = orig.map(_.mkString(" "))
      val dedup = r.getString(2)
      if (r.getLong(3) == 0L) assert(dedup == r.getString(1))
      else if (dedup.isEmpty)
        // full-document duplicate: every span lost to an earlier copy
        assert(r.getLong(4) == 0L)
      else {
        // dedup must be a subsequence of the doc's own spans
        val dedupSpans = dedup.split(" ", -1).grouped(20).toSeq.map(_.mkString(" "))
        var i = 0
        dedupSpans.foreach { sp =>
          val j = kept.indexOf(sp, i)
          assert(j >= i, s"span out of order or foreign in doc ${r.getLong(0)}")
          i = j + 1
        }
      }
    }
  }

  test("earliest occurrence survives: dropped spans have an earlier copy") {
    val k = 20
    val docs = Engine.Tables(spark, dir).documents
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), ceil(size(col("w")) / lit(k.toDouble)).cast("int") - 1),
            i => array_join(slice(col("w"), i * k + 1, lit(k)), " "))
        ).as(Seq("span_idx", "span")))
    val firsts = spans.groupBy("span")
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("f"))
    // every span of every doc either IS the corpus-minimal occurrence
    // (kept) or its minimal occurrence precedes it (dropped) — and the
    // per-doc kept count from the operator matches this rule exactly
    val expectKept = CacheScope.scoped {
      spans.join(firsts, Seq("span"))
        .withColumn("keep",
          col("doc_id") === col("f.doc_id") && col("span_idx") === col("f.span_idx"))
        .groupBy("doc_id").agg(count(when(col("keep"), 1)).as("exp_kept"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val got = CacheScope.scoped {
      result().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got == expectKept)
  }

  test("idempotent: dedup of the deduped corpus drops nothing new") {
    import spark.implicits._
    val deduped = CacheScope.scoped {
      result().select(col("doc_id"), col("text_dedup").as("text")).collect()
    }
    val again = deduped.map(_.getString(1)).filter(_.nonEmpty)
      .flatMap(_.split(" ", -1).grouped(20).map(_.mkString(" ")))
    // corpus-wide multiset of spans after dedup must be duplicate-free
    assert(again.length == again.distinct.length,
      "second pass would still find duplicate spans")
  }
}
