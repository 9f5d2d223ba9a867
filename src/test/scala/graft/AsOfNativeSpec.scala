package graft

import graft.plans.AsOfJoinNative
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator must (a) actually plan as AsOfJoinExec —
  * not fall back to a cartesian with a constant-true marker — and
  * (b) agree with the window-based AsOfJoin on real data.
  */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def build(dir: String) = {
    val t = Engine.Tables(spark, dir)
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = t.events
      .filter(col("event_type") === "signup")
      .select(
        col("user_id").as("s_user"),
        col("ts").as("s_ts"),
        col("value").as("signup_value")
      )
    AsOfJoinNative.asof(purchases, signups,
      col("user_id"), col("s_user"), col("ts"), col("s_ts"))
  }

  test("plans as AsOfJoinExec, no cartesian fallback") {
    val df = build("/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan (AQE hides it pre-execution)
    val plan = df.queryExecution.executedPlan.toString
    // the exec node prints as "AsOfJoin" (TreeNode strips the Exec suffix)
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"fell back to cross join:\n$plan")
  }

  test("native as-of equals window-based as-of") {
    val native = build("/root/testdata/sf0.001")
      .select(col("event_id"), col("signup_value"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSet
    val viaWindow = SparkEntry
      .queries("q_join_asof")(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("signup_value"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSet
    assert(native == viaWindow)
    assert(native.nonEmpty)
  }
}
