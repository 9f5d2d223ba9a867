package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and return a sane schema at
  * sf0.001, and every oracle key must reference a registered query.
  * (Value-level correctness is the driver's DuckDB gate + tools/
  * check.py; this spec catches regressions cheaply in sbt test.)
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are all registered queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("bench headline names are all registered queries, without duplicates") {
    // a headline typo would surface only as a per-query bench failure
    // count at sf0.1; catch it statically here
    val unknown = Bench.headline.toSet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"headline entries without queries: $unknown")
    val dups = Bench.headline.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicate headline entries: $dups")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      // scoped like every consuming surface: releases operator-internal
      // caches per query instead of accreting them across 139 tests
      CacheScope.scoped {
        val df = fn(spark, dir)
        assert(df.columns.nonEmpty)
        // count() exercises the full plan; most queries must be non-empty
        val n = df.count()
        assert(n >= 0)
      }
    }
  }

  test("partitioned scan prunes partitions dynamically") {
    val df = SparkEntry.queries("q_scan_partition_pruned")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the scan must carry a runtime partition filter from the dim join
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [("),
      s"no dynamic partition filter in plan:\n${plan.take(2000)}")
  }
}
