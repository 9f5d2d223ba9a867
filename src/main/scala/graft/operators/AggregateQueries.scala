package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** §2.4 aggregations: hash agg, distinct agg, stats, grouping sets /
  * rollup / cube, collect, min_by/max_by, and the time-window family
  * (tumble / hop / session — reference Flink operators
  * StreamExecGroupWindowAggregate / StreamExecWindowAggregate,
  * flink-table-planner-blink .../exec/stream/StreamExecWindowAggregate.java:74
  * and .../window/slicing/SliceAssigners.java).
  *
  * All aggregation here is declarative groupBy/agg so Catalyst plans
  * partial (map-side) + final HashAggregate pairs — the local/global
  * two-phase agg of the reference (StreamExecLocalGroupAggregate /
  * StreamExecGlobalGroupAggregate) is native in Spark.
  */
object AggregateQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // TPC-H Q1 flavor: the canonical wide hash aggregate.
    QueryDef(
      "q_agg_pricing_summary",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .filter(col("l_quantity") < 50)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // the wide sums accumulate exact long cents (Money.scala):
            // at sf>=0.1 their magnitude (1e9+) makes double
            // summation-order drift visible past round(4), and decimal
            // accumulators cost ~3x vs primitive longs.
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            Money.sumPrice(col("l_extendedprice")).as("sum_base_price"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("sum_disc_price"),
            Money.sumCharge(col("l_extendedprice"), col("l_discount"),
              col("l_tax")).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               ${Money.sumPriceSql("l_extendedprice")} AS sum_base_price,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS sum_disc_price,
               ${Money.sumChargeSql("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_quantity < 50
        GROUP BY l_returnflag, l_linestatus
      """)
    ),
    // COUNT/SUM DISTINCT — Catalyst RewriteDistinctAggregates (Expand).
    QueryDef(
      "q_agg_distinct",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("uniq_cust"),
            countDistinct(col("o_orderpriority")).as("uniq_prio"),
            // exact long-cents accumulation (Money.scala) — double
            // summation order drifts past round(4) at this magnitude;
            // distinct classes on cents == distinct 2-decimal values
            Money.sumDistinctPrice(col("o_totalprice")).as("sum_dist_price"),
            count(lit(1)).as("n")
          )
      },
      Some(s"""
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS uniq_cust,
               count(DISTINCT o_orderpriority) AS uniq_prio,
               ${Money.sumDistinctPriceSql("o_totalprice")} AS sum_dist_price,
               count(*) AS n
        FROM orders GROUP BY o_orderstatus
      """)
    ),
    // HLL++ approximate distinct — the cardinality tool that replaces
    // exact countDistinct at 100 TB: the sketch is a fixed-size,
    // merge-commutative register array, so partials merge map-side and
    // the answer is PARTITIONING-INVARIANT (the spec proves the same
    // value under repartition). rsd=0.01 keeps the error well inside
    // the 2% band the spec bounds vs the exact count. Rows-only check:
    // DuckDB's approx_count_distinct is a different sketch, so there is
    // no cross-engine hash oracle by construction.
    QueryDef(
      "q_agg_approx_distinct",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders
          .groupBy(col("o_orderstatus"))
          .agg(
            approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"),
            count(lit(1)).as("n")
          )
      },
      None // sketch-specific value — spec-bounded vs exact instead
    ),
    // Approximate percentiles (Greenwald-Khanna): the quantile tool at
    // scale — a bounded-size mergeable summary instead of a full sort.
    // Sketch-specific values (DuckDB's approx_quantile is t-digest), so
    // rows-only; SketchAccuracySpec bounds the error vs the exact
    // percentile.
    QueryDef(
      "q_agg_approx_percentiles",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(5000))
              .as("p50"),
            percentile_approx(col("l_extendedprice"), lit(0.95), lit(5000))
              .as("p95"),
            count(lit(1)).as("n")
          )
      },
      None // sketch-specific value — spec-bounded vs exact instead
    ),
    // Statistical aggregates.
    QueryDef(
      "q_agg_stats",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("value")), 4).as("avg_v"),
            round(stddev_samp(col("value")), 4).as("sd_samp"),
            round(stddev_pop(col("value")), 4).as("sd_pop"),
            round(var_samp(col("value")), 4).as("var_s"),
            round(var_pop(col("value")), 4).as("var_p"),
            min(col("value")).as("min_v"),
            max(col("value")).as("max_v"),
            count(lit(1)).as("n")
          )
      },
      Some("""
        SELECT event_type,
               round(avg(value), 4) AS avg_v,
               round(stddev_samp(value), 4) AS sd_samp,
               round(stddev_pop(value), 4) AS sd_pop,
               round(var_samp(value), 4) AS var_s,
               round(var_pop(value), 4) AS var_p,
               min(value) AS min_v,
               max(value) AS max_v,
               count(*) AS n
        FROM events GROUP BY event_type
      """)
    ),
    // COLLECT (multiset agg) — order-normalized to a sorted string.
    QueryDef(
      "q_agg_collect",
      (s, dir) => {
        val t = tables(s, dir)
        t.documents
          .groupBy(col("lang"))
          .agg(
            array_join(sort_array(collect_set(col("source"))), ",")
              .as("sources"),
            count(lit(1)).as("n_docs")
          )
      },
      Some("""
        SELECT lang,
               array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
               count(*) AS n_docs
        FROM documents GROUP BY lang
      """)
    ),
    // min_by / max_by with a unique BIGINT ordering key (value has
    // 2-decimal ties; round(value*100)*1e6+event_id is collision-free).
    QueryDef(
      "q_agg_minmax_by",
      (s, dir) => {
        val t = tables(s, dir)
        val ord = (round(col("value") * 100, 0).cast("long") * 1000000L +
          col("event_id")).as("ord")
        t.events
          .select(col("user_id"), col("event_id"), ord)
          .groupBy(col("user_id"))
          .agg(
            max_by(col("event_id"), col("ord")).as("top_event"),
            min_by(col("event_id"), col("ord")).as("bottom_event")
          )
      },
      Some("""
        SELECT user_id,
               max_by(event_id, CAST(round(value * 100, 0) AS BIGINT) * 1000000 + event_id) AS top_event,
               min_by(event_id, CAST(round(value * 100, 0) AS BIGINT) * 1000000 + event_id) AS bottom_event
        FROM events GROUP BY user_id
      """)
    ),
    // Exact percentiles (linear interpolation — Spark percentile() and
    // DuckDB quantile_cont share the definition) + median.
    QueryDef(
      "q_agg_percentiles",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95"),
            round(expr("percentile(value, array(0.25, 0.75))[0]"), 4).as("p25"),
            round(median(col("value")), 4).as("med")
          )
      },
      Some("""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(median(value), 4) AS med
        FROM events GROUP BY event_type
      """)
    ),
    // Boolean aggregates.
    QueryDef(
      "q_agg_boolean",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(col("user_id"))
          .agg(
            bool_and(col("value") > 0).as("all_positive"),
            bool_or(col("event_type") === "error").as("any_error"),
            count_if(col("value") > 150).as("n_big")
          )
      },
      Some("""
        SELECT user_id,
               bool_and(value > 0) AS all_positive,
               bool_or(event_type = 'error') AS any_error,
               CAST(count_if(value > 150) AS BIGINT) AS n_big
        FROM events GROUP BY user_id
      """)
    ),
    // Bitwise aggregates (reference BIT_AND/BIT_OR/BIT_XOR in
    // FlinkSqlOperatorTable).
    QueryDef(
      "q_agg_bitwise",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            bit_and(col("l_suppkey")).as("band"),
            bit_or(col("l_suppkey")).as("bor"),
            bit_xor(col("l_suppkey")).as("bxor"),
            count(lit(1)).as("n")
          )
      },
      Some("""
        SELECT l_returnflag,
               bit_and(l_suppkey) AS band,
               bit_or(l_suppkey) AS bor,
               bit_xor(l_suppkey) AS bxor,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
      """)
    ),
    // LISTAGG (reference BuiltInFunctionDefinitions.LISTAGG): string
    // aggregation, made deterministic by sorting the collected values
    // before joining.
    QueryDef(
      "q_agg_listagg",
      (s, dir) => {
        val t = tables(s, dir)
        t.supplier
          .groupBy(col("s_nationkey"))
          .agg(
            array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
            count(lit(1)).as("n")
          )
      },
      Some("""
        SELECT s_nationkey,
               string_agg(s_name, ',' ORDER BY s_name) AS names,
               count(*) AS n
        FROM supplier GROUP BY s_nationkey
      """)
    ),
    // PIVOT: rows→columns reshaping over an explicit value list (the
    // explicit list matters at scale — it keeps the plan static instead
    // of a two-pass distinct scan; Spark compiles it to one hash
    // aggregate with a CASE per cell, no shuffle beyond the groupBy).
    QueryDef(
      "q_agg_pivot",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .withColumn("bucket", pmod(col("user_id"), lit(8)))
          .groupBy(col("bucket"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(round(sum(col("value")), 4))
      },
      Some("""
        SELECT user_id % 8 AS bucket,
               round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
               round(sum(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
               round(sum(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
               round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        FROM events GROUP BY 1
      """)
    ),
    // UNPIVOT: columns→rows reshaping (inverse of PIVOT; reference
    // models this as a Correlate over an inline VALUES — Spark compiles
    // `Dataset.unpivot` to a single Expand node: one pass, no shuffle,
    // output = rows × measures, so it scales linearly with the scan).
    QueryDef(
      "q_agg_unpivot",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .filter(col("l_orderkey") < 200)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_quantity").as("qty"),
            col("l_extendedprice").as("price"),
            col("l_discount").as("disc"),
            col("l_tax").as("tax")
          )
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("qty"), col("price"), col("disc"), col("tax")),
            "metric",
            "val"
          )
      },
      Some("""
        SELECT l_orderkey, l_linenumber, metric, val
        FROM (SELECT l_orderkey, l_linenumber,
                     l_quantity AS qty, l_extendedprice AS price,
                     l_discount AS disc, l_tax AS tax
              FROM lineitem WHERE l_orderkey < 200)
        UNPIVOT (val FOR metric IN (qty, price, disc, tax))
      """)
    ),
    // GROUPING SETS via the SQL surface (Catalyst Expand node —
    // reference StreamExecExpand.java:38).
    QueryDef(
      "q_agg_grouping_sets",
      (s, dir) => {
        tables(s, dir).orders.createOrReplaceTempView("orders_gs")
        // same long-cents arithmetic on both sides; only the integer
        // division spelling differs (Spark `div` vs DuckDB `//`)
        s.sql(s"""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS prio,
                 count(*) AS n,
                 ${Money.sumPriceSqlSpark("o_totalprice")} AS total
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """)
      },
      Some(s"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      """)
    ),
    QueryDef(
      "q_agg_rollup",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Money.sumPrice(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"),
            col("total")
          )
      },
      Some(s"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      """)
    ),
    QueryDef(
      "q_agg_cube",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n")
          )
      },
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      """)
    ),
    // Tumbling event-time window (1h) — reference group window agg.
    QueryDef(
      "q_agg_window_tumble",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
          .select(
            unix_timestamp(col("window.start")).as("wstart"),
            col("event_type"),
            col("n"),
            col("sv")
          )
      },
      Some("""
        SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
               event_type, count(*) AS n, round(sum(value), 4) AS sv
        FROM events GROUP BY 1, 2
      """)
    ),
    // Hopping window (1h size / 30m slide): each event lands in 2
    // windows; oracle expands via a 2-row offsets table.
    QueryDef(
      "q_agg_window_hop",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
          .select(
            unix_timestamp(col("window.start")).as("wstart"),
            col("n"),
            col("sv")
          )
      },
      Some("""
        SELECT CAST(floor(epoch(time_bucket(INTERVAL 30 MINUTE, ts))) AS BIGINT)
                 - 1800 * k AS wstart,
               count(*) AS n, round(sum(value), 4) AS sv
        FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
        GROUP BY 1
      """)
    ),
    // Dynamic session gap (reference DynamicEventTimeSessionWindows):
    // error events extend the session only 10 minutes, others 30.
    // Spark merges overlapping [ts, ts+gap(event)) intervals per key;
    // the oracle is gaps-and-islands on the running max of interval
    // ends.
    QueryDef(
      "q_agg_window_session_dynamic",
      (s, dir) => {
        val t = tables(s, dir)
        val gap = when(col("event_type") === "error", "10 minutes")
          .otherwise("30 minutes")
        t.events
          .groupBy(session_window(col("ts"), gap), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(
            unix_timestamp(col("session_window.start")).as("sess_start"),
            col("user_id"),
            col("n")
          )
      },
      Some("""
        WITH g AS (
          SELECT user_id, ts, event_id,
                 ts + CASE WHEN event_type = 'error' THEN INTERVAL 10 MINUTE
                           ELSE INTERVAL 30 MINUTE END AS iend
          FROM events
        ), marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN max(iend) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                        OR ts >= max(iend) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS brk
          FROM g
        ), sess AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
               user_id, count(*) AS n
        FROM sess GROUP BY user_id, sid
      """)
    ),
    // Session window (30m gap) per user — reference session window
    // assigner (EventTimeSessionWindows.java); oracle is the classic
    // gaps-and-islands rewrite. New session starts when the gap to the
    // previous event is >= 30m (Spark merges only while ts < prev+gap).
    QueryDef(
      "q_agg_window_session",
      (s, dir) => {
        val t = tables(s, dir)
        t.events
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
          .select(
            unix_timestamp(col("session_window.start")).as("sess_start"),
            col("user_id"),
            col("n"),
            col("sv")
          )
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
               user_id, count(*) AS n, round(sum(value), 4) AS sv
        FROM sess GROUP BY user_id, sid
      """)
    )
  )
}
