package graft

/** Dev tool: audits physical plans of the headline queries for the
  * properties that matter at cluster scale — filter/projection
  * pushdown into the parquet scan, broadcast joins for dimension
  * tables, whole-stage codegen coverage, and absence of accidental
  * cartesian products. Prints a per-query summary plus the full
  * formatted plan when a check fails.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val broadcastExpected = Set(
      "q_join_multiway", "q_join_broadcast_dim", "q_join_static_contains",
      "q_ann_brute_force"
    )
    // NLJ is the *intended* strategy for the contains-join (theta
    // predicate), the brute-force ANN (deliberate small cross), the
    // idle-customers scalar subquery (1-row broadcast avg joined to
    // every candidate row), and the IVF codebook assignment (k-row
    // broadcast argmin against every vector).
    val crossAllowed = Set(
      "q_join_static_contains", "q_join_cross", "q_ann_brute_force", "q_ann_lsh",
      "q_flagship_idle_customers", "q_ann_ivf",
      // 1-row broadcast scalar subqueries (threshold / max)
      "q_flagship_important_stock", "q_flagship_top_supplier"
    )

    var failures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val formatted = org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")
        val full = df.queryExecution.explainString(formatted)
        val hasScan = plan.contains("FileScan") || plan.contains("Scan parquet")
        val codegen = plan.contains("WholeStageCodegen") || full.contains("WholeStageCodegen")
        val cartesian = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        val broadcast = plan.contains("BroadcastHashJoin") ||
          plan.contains("BroadcastExchange")
        val pushed = full.contains("PushedFilters: [") &&
          !full.replaceAll("PushedFilters: \\[\\]", "").contains("PushedFilters: []")

        val problems = Seq.newBuilder[String]
        if (cartesian && !crossAllowed(name)) problems += "unexpected-cartesian/BNLJ"
        if (broadcastExpected(name) && !broadcast) problems += "missing-broadcast"
        val ps = problems.result()
        if (ps.nonEmpty) {
          failures += 1
          println(s"[AUDIT-FAIL] $name: ${ps.mkString(",")}")
          println(full.linesIterator.take(60).mkString("\n"))
        } else {
          println(
            f"[audit] $name%-28s scan=$hasScan%-5s codegen=$codegen%-5s " +
              f"broadcast=$broadcast%-5s filterPushdown=$pushed"
          )
        }
      } catch {
        case e: Throwable =>
          failures += 1
          println(s"[AUDIT-ERROR] $name: ${e.getMessage}")
      }
    }
    println(s"[audit] failures=$failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
