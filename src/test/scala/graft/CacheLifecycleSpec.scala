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

  test("bare globalRank is refused; scoped globalRank releases its cache") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 1000).map(i => (i * 7 % 1000, i)).toDF("k", "uniq")
    // a bare call would pin the range-partitioned input until session
    // end (the two rank passes need identical partitioner boundaries),
    // so the contract is asserted, not silently leaked
    val e = intercept[IllegalArgumentException] {
      plans.DistributedRank.globalRank(df, "r", col("k"), col("uniq"))
    }
    assert(e.getMessage.contains("CacheScope.scoped"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.scoped {
      val (ranked, n) = plans.DistributedRank.globalRank(df, "r", col("k"), col("uniq"))
      assert(n == 1000L)
      assert(ranked.agg(max(col("r")), countDistinct(col("r"))).as[(Long, Long)]
        .head() == ((1000L, 1000L)))
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("nested scopes: inner exit must not release the outer scope's caches") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.scoped {
      val outer = CacheScope.cached(Seq(1, 2, 3).toDS())
      outer.count()
      CacheScope.scoped { CacheScope.cached(Seq(4).toDS()).count() }
      // outer cache still live after the inner scope closed
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
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
