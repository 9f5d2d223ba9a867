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

  test("long chain needs several iterations and still converges") {
    import spark.implicits._
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val comps = Iterations.connectedComponents(edges, maxIter = 50).collect()
    assert(comps.forall(_.getLong(1) == 1L))
    assert(comps.length == n)
  }
}
