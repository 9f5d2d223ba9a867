package graft.operators

import graft.{QueryDef, QueryModule}
import graft.skew.SaltedAggregation
import org.apache.spark.sql.functions._

/** Skew-handling queries: the salted two-stage aggregation and an
  * AQE-mitigated skewed join, both oracle-checked for result
  * equivalence with their unmitigated formulations — the reference's
  * core invariant (mitigation must not change results, only balance;
  * ControllerSimulator reroutes records but the demo operator's merge
  * makes outputs identical).
  */
object SkewQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // Salted two-stage aggregation over a skewed-ish key. Oracle is
    // the PLAIN group-by: mitigation must be result-identical.
    QueryDef(
      "q_skew_salted_agg",
      (s, dir) => {
        val t = tables(s, dir)
        val salted = SaltedAggregation.aggregate(
          t.events.select(col("user_id"), col("value")),
          key = Seq("user_id"),
          spec = SaltedAggregation.Spec(
            sums = Seq("value"),
            counts = true,
            mins = Seq("value"),
            maxs = Seq("value")
          ),
          saltFactor = 8
        )
        salted.select(
          col("user_id"),
          round(col("sum_value"), 4).as("sv"),
          col("cnt").as("n"),
          col("min_value").as("mn"),
          col("max_value").as("mx")
        )
      },
      Some("""
        SELECT user_id, round(sum(value), 4) AS sv, count(*) AS n,
               min(value) AS mn, max(value) AS mx
        FROM events GROUP BY user_id
      """)
    ),
    // Skewed join: 3/4 of all events collapse onto one synthetic hot
    // key (the reference's experiment shape — zipf-keyed stream joined
    // with a small table). AQE splits the hot partition at runtime;
    // the oracle asserts the mitigated plan is result-identical.
    QueryDef(
      "q_skew_join",
      (s, dir) => {
        val t = tables(s, dir)
        val keyed = t.events.withColumn(
          "skew_key",
          when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id"))
        )
        val dim = keyed
          .select(col("skew_key"))
          .distinct()
          .withColumn("cohort", pmod(col("skew_key"), lit(5)))
        keyed
          .join(dim, "skew_key")
          .groupBy(col("cohort"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sv")
          )
      },
      Some("""
        WITH keyed AS (
          SELECT *, CASE WHEN event_id % 4 != 0 THEN 0 ELSE user_id END AS skew_key
          FROM events
        ), dim AS (
          SELECT DISTINCT skew_key, skew_key % 5 AS cohort FROM keyed
        )
        SELECT cohort, count(*) AS n, round(sum(value), 4) AS sv
        FROM keyed JOIN dim USING (skew_key)
        GROUP BY cohort
      """)
    ),
    // Manual salted join over the same skewed shape: the mitigation
    // for engines/stages where AQE's runtime skew split cannot act
    // (streaming joins, pinned partitionings). The dim side is
    // replicated per salt; the oracle is the identical unsalted join.
    QueryDef(
      "q_skew_salted_join",
      (s, dir) => {
        val t = tables(s, dir)
        val keyed = t.events
          .withColumn(
            "skew_key",
            when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id"))
          )
          .select(col("skew_key"), col("event_id"), col("value"))
        val dim = keyed
          .select(col("skew_key"))
          .distinct()
          .withColumn("cohort", pmod(col("skew_key"), lit(5)))
        graft.skew.SaltedJoin
          .join(keyed, dim, Seq("skew_key"), saltFactor = 8)
          .groupBy(col("cohort"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 4).as("sv")
          )
      },
      Some("""
        WITH keyed AS (
          SELECT CASE WHEN event_id % 4 != 0 THEN 0 ELSE user_id END AS skew_key,
                 event_id, value
          FROM events
        ), dim AS (
          SELECT DISTINCT skew_key, skew_key % 5 AS cohort FROM keyed
        )
        SELECT cohort, count(*) AS n, round(sum(value), 4) AS sv
        FROM keyed JOIN dim USING (skew_key)
        GROUP BY cohort
      """)
    )
  )
}
