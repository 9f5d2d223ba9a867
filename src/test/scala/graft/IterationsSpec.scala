package graft

import graft.plans.Iterations
import org.scalatest.funsuite.AnyFunSuite

class IterationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("connected components converge to min labels") {
    import spark.implicits._
    // two chains and one isolated pair:
    //   1-2-3-4 (component 1), 10-11 (component 10), 20-21-22 (component 20)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (21L, 20L), (21L, 22L)
    ).toDF("src", "dst")
    val comps = Iterations
      .connectedComponents(edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L
    ))
  }

  test("CC loops restore the caller's AQE conf (r22 loop-scoped disable)") {
    import spark.implicits._
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    assert(before == "true", "engine default expected for the test premise")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    // min-label path
    Iterations.connectedComponents(edges).collect()
    assert(spark.conf.get(key) == "true",
      "minLabelCore must restore spark.sql.adaptive.enabled")
    // star path (wrapped independently)
    Iterations.connectedComponentsStar(edges).collect()
    assert(spark.conf.get(key) == "true",
      "connectedComponentsStar must restore spark.sql.adaptive.enabled")
  }

  test("checkpointed partitioning is preserved — iteration joins add no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the mechanism pageRank/connectedComponents rely on: repartition
    // on the join key + localCheckpoint → LogicalRDD keeps the hash
    // partitioning, so a subsequent join on that key plans with no
    // Exchange under either side
    val left = (1L to 1000L).map(i => (i, i * 2)).toDF("src", "payload")
      .repartition(col("src")).localCheckpoint()
    val right = (1L to 1000L).map(i => (i, i * 3)).toDF("vertex", "rank")
      .repartition(col("vertex")).localCheckpoint()
    val joined = left.join(right, left("src") === right("vertex"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"expected no exchange, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == 1000)
  }

  test("repartition-then-dedup pays exactly one exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the iteration-prep discipline: HashPartitioning(src) satisfies
    // the dedup aggregation's ClusteredDistribution(src, dst), so the
    // dedup runs in place — distinct().repartition(src) would pay two
    val df = (1 to 1000).map(i => (i.toLong % 97, i.toLong % 31))
      .toDF("src", "dst")
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
    // the AQE wrapper hides its children from collect(); count the
    // Exchange nodes in the rendered plan instead
    val planStr = df.queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected one exchange, got:\n$planStr")
    assert(df.count() == df.select(col("src"), col("dst")).distinct().count())
  }

  test("long chain needs several iterations and still converges") {
    import spark.implicits._
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val comps = Iterations.connectedComponents(edges, maxIter = 50).collect()
    assert(comps.forall(_.getLong(1) == 1L))
    assert(comps.length == n)
  }

  test("star CC matches min-label CC and converges in O(log n) rounds on a 64-chain") {
    import spark.implicits._
    // planted worst case for label propagation: one 64-vertex chain —
    // min-label needs ~diameter rounds (one hop per round), the
    // alternating large-star/small-star contraction needs O(log n)
    val n = 64
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val (starLabels, starRounds) =
      Iterations.connectedComponentsStarWithRounds(edges, maxIter = 80)
    val (minLabels, minRounds) =
      Iterations.connectedComponentsWithRounds(edges, maxIter = 80)
    val star = starLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ml = minLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == ml, "star CC must produce identical min-id labels")
    assert(star.values.forall(_ == 1L) && star.size == n)
    assert(minRounds >= n / 2, s"min-label should pay ~diameter rounds, got $minRounds")
    assert(starRounds <= 12, s"star should converge in O(log n) rounds, got $starRounds")
  }

  test("adaptive CC = min-label labels on both short-diameter and long-chain graphs") {
    import spark.implicits._
    // long chain: forces the contraction + star phase
    val chain = (1 until 64).map(i => (i.toLong, (i + 1).toLong))
    // plus a short-diameter blob (converges inside the label phase) and
    // a lone pair
    val edges = (chain ++ Seq((100L, 101L), (100L, 102L), (101L, 103L),
      (200L, 201L))).toDF("src", "dst")
    val adaptive = Iterations.connectedComponentsAdaptive(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ml = Iterations.connectedComponents(edges, maxIter = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(adaptive == ml)
    assert(adaptive(64L) == 1L && adaptive(103L) == 100L && adaptive(201L) == 200L)
  }

  test("star CC handles forests, shuffled ids, self-loops and duplicate edges") {
    import spark.implicits._
    val edges = Seq(
      (7L, 3L), (3L, 9L), (9L, 1L),      // component 1 via reversed/shuffled ids
      (10L, 11L), (11L, 10L), (10L, 11L), // duplicate + reversed duplicate
      (20L, 20L),                         // self-loop-only vertex
      (30L, 31L), (31L, 32L), (30L, 32L)  // triangle
    ).toDF("src", "dst")
    val comps = Iterations.connectedComponentsStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps == Map(
      1L -> 1L, 3L -> 1L, 7L -> 1L, 9L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L
    ))
  }
}
