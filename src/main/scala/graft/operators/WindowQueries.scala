package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 OVER aggregates + §2.6 sort/limit/top-n.
  *
  * Reference operators: BatchExecOverAggregate.java:73 (all frame
  * types under operators/over/frame/), StreamExecRank.java:69 /
  * AppendOnlyTopNFunction (Top-N), BatchExecSortLimit.java:45,
  * BatchExecLimit.java:35.
  *
  * Determinism: every ORDER BY ends in a unique key (orderkey /
  * event_id / custkey) so rank/row_number/frames are reproducible
  * across engines; doubles that pass through multi-row frames are
  * rounded.
  *
  * Scale notes: WindowExec shuffles once on partitionBy and sorts
  * within partitions — no driver involvement. Top-N per group is
  * row_number + filter, which Spark runs with a partial sort; the
  * global sort-limit queries use TakeOrderedAndProjectExec (heap of k
  * per partition, merge on driver — O(k), not a full sort).
  */
object WindowQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // rank / dense_rank / row_number per nation by acctbal.
    QueryDef(
      "q_over_rank",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t.customer.select(
          col("c_nationkey"),
          col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn")
        )
      },
      Some("""
        SELECT c_nationkey, c_custkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               row_number() OVER w AS rn
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      """)
    ),
    // Running (unbounded preceding) sum/count per customer.
    QueryDef(
      "q_over_running_sum",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.orders.select(
          col("o_custkey"),
          col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 4).as("run_total"),
          count(lit(1)).over(w).as("run_n")
        )
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER w, 4) AS run_total,
               count(*) OVER w AS run_n
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
      """)
    ),
    // Bounded ROWS frame (2 preceding .. current) + frame of the
    // following rows + first/last value.
    QueryDef(
      "q_over_frames",
      (s, dir) => {
        val t = tables(s, dir)
        // (l_orderkey, l_linenumber) alone is NOT unique in this
        // generator at sf>=0.1 — extend the ordering until rows that
        // differ anywhere differ in a sort key, or frames are
        // arbitrary for the tied rows
        val base = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        t.lineitem.select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          round(
            sum(col("l_quantity")).over(base.rowsBetween(-2, 0)),
            4
          ).as("sum_prev3"),
          round(
            avg(col("l_quantity")).over(base.rowsBetween(0, 2)),
            4
          ).as("avg_next3"),
          first(col("l_quantity"))
            .over(base.rowsBetween(Window.unboundedPreceding, 0))
            .as("first_qty"),
          last(col("l_quantity"))
            .over(base.rowsBetween(0, Window.unboundedFollowing))
            .as("last_qty")
        )
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS sum_prev3,
               round(avg(l_quantity) OVER (w ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING), 4) AS avg_next3,
               first_value(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_qty,
               last_value(l_quantity) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber,
                              l_partkey, l_quantity, l_extendedprice)
      """)
    ),
    // IGNORE NULLS navigation over a sparse column — the gap-fill /
    // last-observation-carried-forward shape (last_value + first_value
    // + nth_value, all skipping nulls). Same per-partition running
    // frame as q_over_frames, so it shuffles once on l_suppkey and
    // streams each partition in sorted order — no extra pass for the
    // null-skipping (Spark evaluates it inside the running frame).
    QueryDef(
      "q_over_ignore_nulls",
      (s, dir) => {
        val t = tables(s, dir)
        val base = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val flagged = when(col("l_discount") >= 0.03, col("l_extendedprice"))
        t.lineitem.select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          last(flagged, ignoreNulls = true).over(base).as("locf_price"),
          first(flagged, ignoreNulls = true).over(base).as("first_seen"),
          nth_value(flagged, 2, ignoreNulls = true).over(base).as("second_seen")
        )
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               last_value(flagged IGNORE NULLS) OVER w AS locf_price,
               first_value(flagged IGNORE NULLS) OVER w AS first_seen,
               nth_value(flagged, 2 IGNORE NULLS) OVER w AS second_seen
        FROM (SELECT *, CASE WHEN l_discount >= 0.03 THEN l_extendedprice END
                          AS flagged
              FROM lineitem)
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber,
                              l_partkey, l_quantity, l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      """)
    ),
    // RANGE frame over a numeric ordering column.
    QueryDef(
      "q_over_range_frame",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("event_type"))
          .orderBy(col("value"))
          .rangeBetween(-5L, 0L)
        t.events.select(
          col("event_id"),
          col("event_type"),
          count(lit(1)).over(w).as("n_within_5")
        )
      },
      Some("""
        SELECT event_id, event_type,
               count(*) OVER (PARTITION BY event_type ORDER BY value
                              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
        FROM events
      """)
    ),
    // LEAD / LAG (reference OffsetOverFrame.java).
    QueryDef(
      "q_over_lead_lag",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t.events.select(
          col("user_id"),
          col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          lag(col("event_type"), 2, "none").over(w).as("prev2_type")
        )
      },
      Some("""
        SELECT user_id, event_id,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               coalesce(lag(event_type, 2) OVER w, 'none') AS prev2_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      """)
    ),
    // ntile / percent_rank / cume_dist — a GLOBAL ranking, which must
    // not plan as a partitionless WindowExec (single task for the
    // whole table). DistributedRank range-partitions on the sort keys,
    // ranks per partition, and adds broadcast cumulative offsets; the
    // unique (o_totalprice, o_orderkey) tiebreak makes ntile /
    // percent_rank / cume_dist pure arithmetic on the global rank.
    QueryDef(
      "q_over_distribution",
      (s, dir) => {
        import graft.plans.DistributedRank
        val t = tables(s, dir)
        val (ranked, n) = DistributedRank.globalRank(
          t.orders.select(col("o_orderkey"), col("o_totalprice")),
          "__rank",
          col("o_totalprice"),
          col("o_orderkey")
        )
        ranked.select(
          col("o_orderkey"),
          DistributedRank.ntileFromRank(col("__rank"), n, 4).as("quartile"),
          round(DistributedRank.percentRankFromRank(col("__rank"), n), 6).as("pct_rank"),
          round(DistributedRank.cumeDistFromRank(col("__rank"), n), 6).as("cume")
        )
      },
      Some("""
        SELECT o_orderkey,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
      """)
    ),
    // Top-N per group (reference Top-N rank pushdown).
    QueryDef(
      "q_topn_per_group",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t.orders
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_totalprice"),
            row_number().over(w).as("rn")
          )
          .filter(col("rn") <= 3)
      },
      Some("""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
      """)
    ),
    // Window Top-N: top 2 events per hour bucket
    // (reference StreamExecWindowRank.java:67).
    QueryDef(
      "q_window_topn",
      (s, dir) => {
        val t = tables(s, dir)
        val bucketed = t.events
          .withColumn("wstart", unix_timestamp(date_trunc("hour", col("ts"))))
        val w = Window
          .partitionBy(col("wstart"))
          .orderBy(col("value").desc, col("event_id"))
        bucketed
          .select(
            col("wstart"),
            col("event_id"),
            col("value"),
            row_number().over(w).as("rn")
          )
          .filter(col("rn") <= 2)
      },
      Some("""
        SELECT * FROM (
          SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
                 event_id, value,
                 row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 2
      """)
    ),
    // Global sort + limit → TakeOrderedAndProjectExec.
    QueryDef(
      "q_sort_limit",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .orderBy(
            col("l_extendedprice").desc,
            col("l_orderkey"),
            col("l_linenumber")
          )
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .limit(20)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20
      """)
    ),
    // LIMIT + OFFSET pagination.
    QueryDef(
      "q_limit_offset",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .offset(20)
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20
      """)
    ),
    // Multi-key global sort returned in full (driver sorts rows anyway,
    // so the check is on the *content* of an ordered projection).
    QueryDef(
      "q_sort_multikey",
      (s, dir) => {
        val t = tables(s, dir)
        t.part
          .orderBy(col("p_brand"), col("p_size").desc, col("p_partkey"))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
      },
      Some("""
        SELECT p_partkey, p_brand, p_size FROM part
        ORDER BY p_brand, p_size DESC, p_partkey
      """)
    )
  )
}
