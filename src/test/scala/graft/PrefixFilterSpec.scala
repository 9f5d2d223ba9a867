package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered similarity join: exactness (identical pairs to the
  * all-shingles inverted-index join) plus the property that justifies
  * it at scale — the prefix index generates strictly fewer candidate
  * pairs than the full index.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix filtering returns exactly the full-index join's pairs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val t = Engine.Tables(spark, dir)
      val full = CacheScope.scoped { pairSet(DedupQueries.jaccardPairs(t, 0.8)) }
      val pref = CacheScope.scoped { pairSet(DedupQueries.prefixFilterPairs(t)) }
      assert(pref == full,
        s"$dir: prefix ${pref.size} pairs != full ${full.size}; " +
          s"missing=${(full -- pref).take(3)} extra=${(pref -- full).take(3)}")
      assert(full.nonEmpty, s"$dir: trivial corpus (no near-dup pairs)")
    }
  }

  test("prefix index generates fewer candidates than the full index") {
    val t = Engine.Tables(spark, "/root/testdata/sf0.01")
    CacheScope.scoped {
      graft.functions.SketchExpressions.register(spark)
      val sh = t.documents
        .select(col("doc_id"),
          graft.functions.SketchExpressions.word_shingles(col("text")).as("shingles"))
        .filter(size(col("shingles")) > 0)
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
      def candCount(idx: org.apache.spark.sql.DataFrame): Long = idx.as("a")
        .join(idx.as("b"), "sh")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val fullCands = candCount(ex)
      val dfc = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      val prefix = ex.join(dfc, "sh")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ord"),
          count(lit(1)).as("sz"))
        .withColumn("p",
          col("sz") - floor((lit(4) * col("sz") + lit(4)) / lit(5)).cast("long") + 1)
        .select(col("doc_id"),
          explode(slice(transform(col("ord"), _.getField("sh")),
            lit(1), col("p").cast("int"))).as("sh"))
      val prefCands = candCount(prefix)
      assert(prefCands < fullCands,
        s"prefix $prefCands !< full $fullCands candidates")
      assert(prefCands.toDouble / fullCands < 0.5,
        s"prefix index barely prunes: $prefCands / $fullCands")
    }
  }
}
