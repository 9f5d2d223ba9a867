package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sketch operators (Jaccard, MinHash-LSH, SimHash, LSH/IVF ANN)
  * persist intermediates that several joins re-read. Their lifecycle is
  * scoped to the consuming action via [[CacheScope]] — after the action
  * finishes, no persisted RDD may remain (a leak here pins the banded /
  * signature tables in executor storage across every invocation).
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private val sketchQueries = Seq(
    "q_dedup_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_ann_lsh",
    "q_ann_ivf"
  )

  test("sketch queries release every cache with the consuming action") {
    // baseline: other suites sharing this session may hold their own
    // caches; this spec asserts the sketch queries add none
    val before = spark.sparkContext.getPersistentRDDs.keySet
    sketchQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      CacheScope.scoped {
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      }
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked persisted RDDs: $leaked")
    }
  }

  test("caches are live inside the scope and released even on failure") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException] {
      CacheScope.scoped {
        val d = CacheScope.cached(Seq(1, 2, 3).toDS())
        d.count()
        assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
        throw new RuntimeException("boom")
      }
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
