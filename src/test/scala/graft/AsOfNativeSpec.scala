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

  test("left outer: unmatched left rows kept with null right columns") {
    import spark.implicits._
    // user 2's purchase precedes any signup (the dim row "doesn't exist
    // yet"); user 3 has no signup at all — both must survive with nulls.
    val purchases = Seq((1L, 1L, 100L, 5.0), (2L, 2L, 50L, 7.0), (3L, 3L, 10L, 9.0))
      .toDF("event_id", "user_id", "ts", "value")
    val signups = Seq((1L, 90L, 1.5), (2L, 60L, 2.5))
      .toDF("s_user", "s_ts", "signup_value")
    val out = AsOfJoinNative
      .asof(purchases, signups, col("user_id"), col("s_user"), col("ts"), col("s_ts"),
        joinType = "left_outer")
      .select(col("event_id"), col("signup_value"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(1L -> Some(1.5), 2L -> None, 3L -> None))
    // inner drops them
    val inner = AsOfJoinNative
      .asof(purchases, signups, col("user_id"), col("s_user"), col("ts"), col("s_ts"))
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(inner == Set(1L))
  }

  test("left outer on real data: row count equals left side, inner rows identical") {
    val t = Engine.Tables(spark, "/root/testdata/sf0.001")
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = t.events
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("value").as("signup_value"))
    val outer = AsOfJoinNative.asof(purchases, signups,
      col("user_id"), col("s_user"), col("ts"), col("s_ts"), joinType = "left")
    assert(outer.count() == purchases.count())
    val matchedViaOuter = outer.filter(col("signup_value").isNotNull)
      .select(col("event_id"), col("signup_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val inner = build("/root/testdata/sf0.001")
      .select(col("event_id"), col("signup_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(matchedViaOuter == inner)
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
