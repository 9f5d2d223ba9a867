package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks q_corpus_funnel against the standalone stage operators
  * it composes: the funnel must not redefine any predicate. The oracle
  * pins the exact counts; this spec pins the *provenance* — each
  * stage's survivors recomputed from the independent q_text_* outputs
  * and a distinct-key count, plus the chaining invariant
  * docs_in(k+1) == docs_out(k).
  */
class FunnelSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.get

  test("funnel counts chain and agree with the standalone stage queries") {
    val rows = CacheScope.scoped {
      SparkEntry.queries("q_corpus_funnel")(spark, dir)
        .collect()
        .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
        .toMap
    }
    assert(rows.keySet == Set(1, 2, 3, 4))
    // chaining: each stage starts with the previous stage's survivors
    (2 to 4).foreach(k => assert(rows(k)._2 == rows(k - 1)._3,
      s"stage $k docs_in != stage ${k - 1} docs_out"))

    val docs = Engine.Tables(spark, dir).documents
    val allow = docs.filter(col("lang").isin("en", "de", "fr"))
      .select(col("doc_id"))

    // stage 1 from raw metadata
    assert(rows(1)._3 == CacheScope.scoped(allow.count()))

    // stage 2 from the standalone quality operator's own keep verdict
    val qualityKeep = CacheScope.scoped {
      SparkEntry.queries("q_text_quality")(spark, dir)
        .filter(col("keep"))
        .select(col("doc_id"))
        .join(allow, Seq("doc_id"))
        .count()
    }
    assert(rows(2)._3 == qualityKeep)

    // stage 3 from the standalone repetition operator's verdict
    val repKeep = CacheScope.scoped {
      SparkEntry.queries("q_text_repetition")(spark, dir)
        .filter(!col("repetitive"))
        .select(col("doc_id"))
        .join(
          SparkEntry.queries("q_text_quality")(spark, dir)
            .filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"))
        .join(allow, Seq("doc_id"))
        .count()
    }
    assert(rows(3)._3 == repKeep)

    // stage 4 = one survivor per distinct head span among stage-3
    // survivors (keep-first implies exactly the distinct-key count)
    val keyOf = array_join(slice(split(col("text"), " "), 1, 20), " ")
    val stage3Ids = SparkEntry.queries("q_text_repetition")(spark, dir)
      .filter(!col("repetitive")).select(col("doc_id"))
      .join(SparkEntry.queries("q_text_quality")(spark, dir)
        .filter(col("keep")).select(col("doc_id")), Seq("doc_id"))
      .join(allow, Seq("doc_id"))
    val distinctHeads = CacheScope.scoped {
      docs.join(stage3Ids, Seq("doc_id"))
        .select(keyOf.as("k")).distinct().count()
    }
    assert(rows(4)._3 == distinctHeads)
  }
}
