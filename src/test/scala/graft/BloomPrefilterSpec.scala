package graft

import graft.functions.BloomExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the Bloom-prefiltered reference-corpus dedup:
  * no false negatives (every reference member must hit the filter —
  * otherwise the prefilter silently loses duplicates), exactness of
  * the composed operator vs a plain anti-join, and the prefilter
  * actually pruning (the might-contain remainder must be a small
  * fraction of the batch, or the exact confirm join would still see
  * everything at 100 TB).
  */
class BloomPrefilterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.get

  test("builder and expression agree byte-for-byte: zero false negatives") {
    BloomExpressions.register(spark)
    val docs = Engine.Tables(spark, dir).documents
    val ref = docs.filter(pmod(col("doc_id"), lit(7L)) === 0).select(col("text"))
    val bloom = ref.stat.bloomFilter("text", math.max(ref.count(), 1L), 0.03)
    // every member of the build side must test positive through the
    // codegen'd expression (stat.bloomFilter putString == our
    // mightContainBinary over UTF8String bytes)
    val misses = ref
      .withColumn("hit", BloomExpressions.bloom_might_contain(col("text"), bloom))
      .filter(!col("hit"))
      .count()
    assert(misses == 0L, s"$misses reference texts missed their own filter")
  }

  test("composed prefilter+confirm equals the plain anti-join, and prunes") {
    BloomExpressions.register(spark)
    val docs = Engine.Tables(spark, dir).documents
    val ref = docs.filter(pmod(col("doc_id"), lit(7L)) === 0).select(col("text"))
    val batch = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0)
    val expected = batch
      .join(ref, Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val got = CacheScope.scoped {
      SparkEntry
        .queries("q_dedup_bloom_prefilter")(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(got == expected, "bloom-prefiltered dedup diverged from exact anti-join")

    // the pruning claim: the confirm join's input (might-contain rows)
    // must be far smaller than the batch — fpp 3% plus true members
    val bloom = ref.stat.bloomFilter("text", math.max(ref.count(), 1L), 0.03)
    val maybe = batch
      .withColumn("m", BloomExpressions.bloom_might_contain(col("text"), bloom))
      .filter(col("m")).count()
    val total = batch.count()
    assert(maybe.toDouble / total < 0.25,
      s"prefilter passed $maybe of $total rows — not pruning")
  }
}
