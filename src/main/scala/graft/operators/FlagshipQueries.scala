package graft.operators

import graft.{QueryDef, QueryModule}
import graft.functions.GapFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-shaped flagship queries (the reference validates against the
  * TPC-H/TPC-DS harnesses — flink-end-to-end-tests/flink-tpch-test,
  * TpcdsTestProgram.java) plus the gap scalar functions and grouping
  * metadata functions.
  */
object FlagshipQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // Q3 analog — shipping priority: join, filtered agg, top-10 by
    // revenue.
    QueryDef(
      "q_flagship_shipping_priority",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING")
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("odate"))
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue")
          )
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)
    ),
    // Q10 analog — returned-item losses per customer, top 20.
    QueryDef(
      "q_flagship_returned_items",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .filter(col("l_returnflag") === "R")
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("lost_revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy(col("lost_revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, n_name,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS lost_revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
      """)
    ),
    // Q18 analog — large-volume orders: agg subquery in a semi-join.
    QueryDef(
      "q_flagship_big_orders",
      (s, dir) => {
        val t = tables(s, dir)
        val big = t.lineitem
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 4).as("total_qty"))
          .filter(col("total_qty") > 100)
        t.orders
          .join(big, col("o_orderkey") === big("l_orderkey"))
          .select(
            col("o_orderkey"),
            col("o_totalprice"),
            col("total_qty")
          )
      },
      Some("""
        SELECT o_orderkey, o_totalprice, total_qty
        FROM orders
        JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 4) > 100) big
          ON o_orderkey = big.l_orderkey
      """)
    ),
    // Q12 analog — shipmode line counts by priority class.
    QueryDef(
      "q_flagship_priority_class",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(
              when(
                col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                1L
              ).otherwise(0L)
            ).as("high_line_count"),
            sum(
              when(
                !col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                1L
              ).otherwise(0L)
            ).as("low_line_count")
          )
      },
      Some("""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_linestatus
      """)
    ),
    // Q14 analog — promo revenue share: conditional agg ratio.
    QueryDef(
      "q_flagship_promo_share",
      (s, dir) => {
        val t = tables(s, dir)
        // exact integer units for BOTH ratio sides: the numerator and
        // denominator are order-insensitive long sums, so the final
        // double division is bit-identical across partitionings
        val revUnits = Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(
              Money.sumWideUnits(
                when(col("p_type").startsWith("PROMO"), revUnits).otherwise(0L)
              ) * 100.0 /
                Money.sumWideUnits(revUnits),
              4
            ).as("promo_share_pct"),
            count(lit(1)).as("n")
          )
      },
      Some(s"""
        SELECT p_brand,
               round(${Money.sumWideUnitsSql(
                 s"CASE WHEN p_type LIKE 'PROMO%' THEN ${Money
                   .discPriceUnitsSql("l_extendedprice", "l_discount")} ELSE 0 END")} * 100.0 /
                     ${Money.sumWideUnitsSql(
                       Money.discPriceUnitsSql("l_extendedprice", "l_discount"))}, 4) AS promo_share_pct,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
      """)
    ),
    // Gap scalar functions (the reference-only scalars, SURVEY §7.1):
    // IS_DECIMAL / IS_DIGIT / IS_ALPHA / SPLIT_INDEX /
    // TEMPORAL_OVERLAPS.
    QueryDef(
      "q_fn_gap_functions",
      (s, dir) => {
        val t = tables(s, dir)
        val k = get_json_object(col("props"), "$.k")
        t.events.select(
          col("event_id"),
          GapFunctions.is_decimal(k).as("k_is_decimal"),
          GapFunctions.is_digit(k).as("k_is_digit"),
          GapFunctions.is_alpha(col("event_type")).as("type_is_alpha"),
          GapFunctions.split_index(col("event_type"), "i", 0).as("before_i"),
          GapFunctions
            .temporal_overlaps(
              col("ts"),
              col("ts") + expr("INTERVAL 1 HOUR"),
              lit("2024-02-01 00:00:00").cast("timestamp"),
              lit("2024-02-02 00:00:00").cast("timestamp")
            )
            .as("in_feb1")
        )
      },
      Some("""
        SELECT event_id,
               regexp_matches(json_extract_string(props, '$.k'),
                 '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS k_is_decimal,
               regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$') AS k_is_digit,
               regexp_matches(event_type, '^[A-Za-z]+$') AS type_is_alpha,
               CASE WHEN len(string_split(event_type, 'i')) > 0
                    THEN string_split(event_type, 'i')[1] END AS before_i,
               (ts < TIMESTAMP '2024-02-02 00:00:00'
                AND TIMESTAMP '2024-02-01 00:00:00' < ts + INTERVAL 1 HOUR) AS in_feb1
        FROM events
      """)
    ),
    // GROUPING / GROUPING_ID metadata over rollup (reference
    // FlinkSqlOperatorTable GROUP_ID/GROUPING/GROUPING_ID).
    QueryDef(
      "q_agg_grouping_id",
      (s, dir) => {
        tables(s, dir).orders.createOrReplaceTempView("orders_gid")
        s.sql("""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS prio,
                 CAST(grouping(o_orderstatus) AS INT) AS g_status,
                 CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
                 count(*) AS n
          FROM orders_gid
          GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """)
      },
      Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
               count(*) AS n
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      """)
    ),
    // hex/bin/format encodings.
    QueryDef(
      "q_fn_encodings",
      (s, dir) => {
        val t = tables(s, dir)
        t.part.select(
          col("p_partkey"),
          hex(col("p_partkey")).as("key_hex"),
          bin(col("p_partkey")).as("key_bin"),
          format_string("part-%05d", col("p_partkey")).as("padded"),
          base64(col("p_brand").cast("binary")).as("brand_b64")
        )
      },
      Some("""
        SELECT p_partkey,
               hex(p_partkey) AS key_hex,
               bin(p_partkey) AS key_bin,
               format('part-{:05d}', p_partkey) AS padded,
               to_base64(p_brand::BLOB) AS brand_b64
        FROM part
      """)
    ),
    // Q5 analog — local-supplier revenue: 6-way join where customer
    // and supplier must sit in the same nation, region-filtered.
    // nation/region broadcast (truly tiny); customer/orders/supplier
    // shuffle on their keys — at TPC-H scale those sides are large,
    // and AQE upgrades them to broadcasts at small SF on its own.
    QueryDef(
      "q_flagship_local_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(
            t.supplier,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey")
          )
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"),
            count(lit(1)).as("n_items")
          )
      },
      Some(s"""
        SELECT n_name,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
      """)
    ),
    // Q19 analog — discounted revenue under disjunctive brand/size/
    // quantity predicates: the planner must push the OR-of-ANDs into
    // the join without falling back to a cartesian.
    QueryDef(
      "q_flagship_disjunctive",
      (s, dir) => {
        val t = tables(s, dir)
        val cond1 = col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
        val cond2 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
        val cond3 = col("p_brand") === "Brand#34" &&
          col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(cond1 || cond2 || cond3)
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"),
            count(lit(1)).as("n_items")
          )
      },
      Some(s"""
        SELECT ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
      """)
    ),
    // Q21 analog — suppliers who kept a multi-supplier order waiting:
    // late supplier (semi-join: another supplier exists on the order)
    // with no other late supplier (anti-join). The semi+anti chain on
    // one fact table is the planner shape under test.
    QueryDef(
      "q_flagship_waiting_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        val li = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
        val late = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val l1 = late.as("l1")
        val withOther = l1.join(
          li.as("o2"),
          col("l1.l_orderkey") === col("o2.l_orderkey") &&
            col("l1.l_suppkey") =!= col("o2.l_suppkey"),
          "left_semi"
        )
        val soleLate = withOther.join(
          late.as("o3"),
          col("l1.l_orderkey") === col("o3.l_orderkey") &&
            col("l1.l_suppkey") =!= col("o3.l_suppkey"),
          "left_anti"
        )
        soleLate
          .join(broadcast(t.supplier), col("l1.l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        WITH late AS (
          SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem o2
                      WHERE o2.l_orderkey = l1.l_orderkey
                        AND o2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late o3
                          WHERE o3.l_orderkey = l1.l_orderkey
                            AND o3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
      """)
    ),
    // Q22 analog — promising idle customers: name-suffix code in a
    // set, balance above the positive-balance average (scalar
    // subquery), and no urgent orders (NOT EXISTS / anti-join; this
    // synthetic set gives every customer *some* order, so the classic
    // "no orders at all" predicate would be vacuous).
    QueryDef(
      "q_flagship_idle_customers",
      (s, dir) => {
        val t = tables(s, dir)
        // the scalar average stays in the plan as a broadcast 1-row
        // cross join — no driver round-trip. Computed from an exact
        // long-cents sum so the comparison threshold is the same
        // double under any partitioning (avg(double) is
        // summation-order-dependent).
        val avgBal = t.customer
          .filter(col("c_acctbal") > 0)
          .agg(
            (sum(Money.cents(col("c_acctbal"))).cast("double") /
              (count(lit(1)).cast("double") * lit(100.0))).as("__avg")
          )
        val codes = Seq("01", "13", "25", "37", "49")
        t.customer
          .withColumn("code", substring(col("c_name"), -2, 2))
          .filter(col("code").isInCollection(codes))
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("__avg"))
          .join(
            t.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .groupBy(col("code"))
          .agg(
            count(lit(1)).as("numcust"),
            Money.sumPrice(col("c_acctbal")).as("totacctbal")
          )
      },
      Some(s"""
        SELECT substring(c_name, length(c_name) - 1, 2) AS code,
               count(*) AS numcust,
               ${Money.sumPriceSql("c_acctbal")} AS totacctbal
        FROM customer c
        WHERE substring(c_name, length(c_name) - 1, 2)
                IN ('01', '13', '25', '37', '49')
          AND c_acctbal > (SELECT CAST(sum(${Money.centsSql("c_acctbal")}) AS DOUBLE)
                                  / (CAST(count(*) AS DOUBLE) * 100.0)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY code
      """)
    ),
    // Q4 analog — order-priority checking: orders with at least one
    // late lineitem (EXISTS → left-semi), counted per priority.
    QueryDef(
      "q_flagship_priority_check",
      (s, dir) => {
        val t = tables(s, dir)
        val lateKeys = t.lineitem
          .join(
            t.orders.select(col("o_orderkey").as("ok"), col("o_orderdate").as("od")),
            col("l_orderkey") === col("ok")
          )
          .filter(col("l_shipdate") > col("od") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"))
        t.orders
          .join(lateKeys, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
      """)
    ),
    // Q7 analog — volume shipping between two nations: supplier nation
    // and customer nation joined independently (the two-alias nation
    // join shape), yearly revenue for both directions of one pair.
    QueryDef(
      "q_flagship_two_nation_volume",
      (s, dir) => {
        val t = tables(s, dir)
        val n1 = t.nation
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = t.nation
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        t.lineitem
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(
            (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
              (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3")
          )
          .groupBy(
            col("supp_nation"),
            col("cust_nation"),
            year(col("l_shipdate")).as("l_year")
          )
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue")
          )
      },
      Some(s"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(sum(volume) AS DOUBLE) / 10000.0 AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 ${Money.discPriceUnitsSql("l_extendedprice", "l_discount")} AS volume
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        )
        GROUP BY supp_nation, cust_nation, l_year
      """)
    ),
    // Q9 analog — product-type profit by nation and year. No partsupp
    // table in this set, so supply cost is proxied from p_retailprice.
    QueryDef(
      "q_flagship_profit",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(col("p_name").contains("red"))
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
          .agg(
            // profit in exact 1e-4-dollar units: price*(1-disc) is
            // cents*(100-disc_cents); retail*0.5*qty dollars is
            // retail_cents*50*qty in the same units (qty is integral).
            // Signed units, so this stays a single long sum (the wide
            // split needs non-negative units); |units| <= ~2e11/row
            // with the p_name filter keeps groups exact past sf10k.
            (sum(
              Money.discPriceUnits(col("l_extendedprice"), col("l_discount")) -
                Money.cents(col("p_retailprice")) * lit(50L) * col("l_quantity").cast("long")
            ).cast("double") / lit(10000.0)).as("profit")
          )
      },
      Some(s"""
        SELECT n_name, CAST(year(l_shipdate) AS INT) AS o_year,
               CAST(sum(${Money.discPriceUnitsSql("l_extendedprice", "l_discount")}
                         - ${Money.centsSql("p_retailprice")} * 50 * CAST(trunc(l_quantity) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
      """)
    ),
    // Q13 analog — customer order-count distribution: left outer join
    // with a filtered ON clause, two stacked aggregations.
    QueryDef(
      "q_flagship_order_distribution",
      (s, dir) => {
        val t = tables(s, dir)
        val perCust = t.customer
          .join(
            t.orders.filter(!col("o_orderpriority").startsWith("1")),
            col("c_custkey") === col("o_custkey"),
            "left_outer"
          )
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
          GROUP BY c_custkey
        )
        GROUP BY c_count
      """)
    ),
    // Q16 analog — supplier diversity per part class: NOT-IN exclusion
    // subquery + count(DISTINCT) (lineitem stands in for partsupp).
    QueryDef(
      "q_flagship_supplier_diversity",
      (s, dir) => {
        val t = tables(s, dir)
        val badSupp = t.supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        t.lineitem
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(col("p_brand") =!= "Brand#45" && col("p_size").isin(1, 4, 9, 16, 25, 36))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 9, 16, 25, 36)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
      """)
    ),
    // Q17 analog — small-quantity-order revenue: correlated per-part
    // average (decorrelated to an aggregate join), single-row answer.
    QueryDef(
      "q_flagship_small_quantity",
      (s, dir) => {
        val t = tables(s, dir)
        val partAvg = t.lineitem
          .groupBy(col("l_partkey").as("pk"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(col("p_brand") === "Brand#23")
          .join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(round(Money.sumPrice(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
      },
      Some(s"""
        SELECT round(${Money.sumPriceSql("l_extendedprice")} / 7.0, 4) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
      """)
    ),
    // Q2 analog — minimum-cost supplier per part: correlated min over
    // the part-supplier association (lineitem stands in for partsupp;
    // unit price for supply cost), joined back on the rounded minimum.
    QueryDef(
      "q_flagship_min_cost_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        // floor-scaling instead of round(): the engines' round()
        // implementations disagree on representation-boundary halfway
        // cases, while floor over identical IEEE arithmetic is
        // bit-identical — and this value feeds an equality join
        val offers = t.lineitem
          .select(
            col("l_partkey"),
            col("l_suppkey"),
            (floor(col("l_extendedprice") / col("l_quantity") * 10000 + 0.5) / 10000.0)
              .as("unit")
          )
        val minUnit = offers
          .groupBy(col("l_partkey").as("pk"))
          .agg(min(col("unit")).as("min_unit"))
        offers
          .join(minUnit, col("l_partkey") === col("pk") && col("unit") === col("min_unit"))
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .filter(col("p_size") === 11)
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_name"), col("min_unit"))
          .distinct()
      },
      Some("""
        WITH offers AS (
          SELECT l_partkey, l_suppkey,
                 floor(l_extendedprice / l_quantity * 10000 + 0.5) / 10000.0 AS unit
          FROM lineitem
        ),
        mu AS (SELECT l_partkey AS pk, min(unit) AS min_unit
               FROM offers GROUP BY l_partkey)
        SELECT DISTINCT p_partkey, s_name, min_unit
        FROM offers
        JOIN mu ON l_partkey = pk AND unit = min_unit
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size = 11
      """)
    ),
    // Q8 analog — market share: one nation's share of yearly revenue
    // among orders from customers of one region (conditional aggregate
    // over a 6-way join).
    QueryDef(
      "q_flagship_market_share",
      (s, dir) => {
        val t = tables(s, dir)
        val sn = t.nation
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val cn = t.nation
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("c_region"))
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
          .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
          .join(broadcast(t.region), col("c_region") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            // both ratio sides as exact long units (see promo_share)
            round(
              Money.sumWideUnits(
                when(col("supp_nation") === "NATION_5",
                  Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
                  .otherwise(0L)
              ) /
                Money.sumWideUnits(
                  Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))),
              6
            ).as("mkt_share")
          )
      },
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               round(${Money.sumWideUnitsSql(
                 s"CASE WHEN n1.n_name = 'NATION_5' THEN ${Money
                   .discPriceUnitsSql("l_extendedprice", "l_discount")} ELSE 0 END")}
                     / ${Money.sumWideUnitsSql(
                       Money.discPriceUnitsSql("l_extendedprice", "l_discount"))}, 6) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY o_year
      """)
    ),
    // Q11 analog — important stock: per-part inventory value from one
    // nation's suppliers, kept only when above a scalar fraction of
    // the total (HAVING against a scalar subquery).
    QueryDef(
      "q_flagship_important_stock",
      (s, dir) => {
        val t = tables(s, dir)
        val natSupp = t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_2")
          .select(col("s_suppkey"))
        // per-part value kept as exact long cents until AFTER the
        // threshold comparison — the grand total and the compare are
        // then partition-order-invariant
        val base = t.lineitem
          .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum(Money.priceQtyUnits(col("l_extendedprice"), col("l_quantity")))
            .as("__units"))
        val threshold = base
          .agg((Money.sumWideUnits(col("__units")) * lit(0.001)).as("__thr"))
        base
          .crossJoin(broadcast(threshold))
          .filter(col("__units").cast("double") > col("__thr"))
          .select(col("l_partkey"), (col("__units").cast("double") / lit(100.0)).as("value"))
      },
      Some(s"""
        WITH base AS (
          SELECT l_partkey,
                 sum(${Money.priceQtyUnitsSql("l_extendedprice", "l_quantity")}) AS u
          FROM lineitem
          WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                              JOIN nation ON s_nationkey = n_nationkey
                              WHERE n_name = 'NATION_2')
          GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(u AS DOUBLE) / 100.0 AS value FROM base
        WHERE CAST(u AS DOUBLE) > (SELECT ${Money.sumWideUnitsSql("u")} * 0.001 FROM base)
      """)
    ),
    // Q15 analog — top supplier(s): revenue per supplier over one
    // quarter, returning every supplier matching the scalar max.
    QueryDef(
      "q_flagship_top_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        val rev = t.lineitem
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp")
          )
          .groupBy(col("l_suppkey"))
          .agg(
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("total_revenue")
          )
        val mx = rev.agg(max(col("total_revenue")).as("__mx"))
        rev
          .crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("__mx"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      },
      Some(s"""
        WITH rev AS (
          SELECT l_suppkey,
                 ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      """)
    ),
    // Q20 analog — suppliers with surplus of a part family: nested IN
    // chain (suppliers → parts shipped in quantity above a floor; this
    // part catalog's color vocabulary has red, not green).
    QueryDef(
      "q_flagship_surplus_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        val redParts = t.part.filter(col("p_name").contains("red"))
          .select(col("p_partkey"))
        val heavy = t.lineitem
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 90)
          .select(col("l_suppkey"))
          .distinct()
        t.supplier
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      Some("""
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%red%')
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 90
        )
      """)
    ),
    // TPC-DS Q27/Q36 shape — ROLLUP over a multi-join star: revenue
    // and average quantity by nation x market segment with subtotal
    // and grand-total rows (Expand node over the joined fact). The
    // dims broadcast; the rollup's Expand multiplies rows AFTER the
    // pre-aggregation, so at 100 TB the shuffle carries group cells,
    // not fact rows.
    QueryDef(
      "q_flagship_ds_rollup",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"),
            round(avg(col("l_quantity")), 4).as("avg_qty")
          )
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("gid"), col("n"), col("revenue"), col("avg_qty")
          )
      },
      Some(s"""
        SELECT coalesce(n_name, 'ALL') AS nation,
               coalesce(c_mktsegment, 'ALL') AS segment,
               CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
               count(*) AS n,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue,
               round(avg(l_quantity), 4) AS avg_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)
      """)
    ),
    // TPC-DS Q71/Q76 shape — multi-channel UNION ALL aggregate: three
    // derived sales channels from the same fact, unioned with a
    // channel tag, aggregated per channel x brand. The union is
    // scan-parallel (no shuffle until the final group-by on tiny
    // (channel, brand) keys) and the part dim broadcasts.
    QueryDef(
      "q_flagship_ds_channels",
      (s, dir) => {
        val t = tables(s, dir)
        // r21 optimization (guide §2.4): the three channel predicates
        // partition the fact rows, so the UNION of three filtered
        // scans is ONE scan with a CASE channel tag — same rows, same
        // aggregate, two fewer full fact scans. The WHEN chain mirrors
        // the original filters exactly (a NULL returnflag/linestatus
        // row matched no branch, so the isNotNull guard keeps the row
        // set identical).
        val channel =
          when(col("l_returnflag") === "R", "returned")
            .when(col("l_returnflag") =!= "R" && col("l_linestatus") === "F",
              "fulfilled")
            .when(col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F",
              "open")
        t.lineitem
          .select(channel.as("channel"), col("l_partkey"),
            col("l_extendedprice"), col("l_discount"))
          .filter(col("channel").isNotNull)
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("channel"), col("p_brand"))
          .agg(
            count(lit(1)).as("n"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue")
          )
      },
      Some(s"""
        WITH channels AS (
          SELECT 'returned' AS channel, l_partkey, l_extendedprice, l_discount
          FROM lineitem WHERE l_returnflag = 'R'
          UNION ALL
          SELECT 'fulfilled', l_partkey, l_extendedprice, l_discount
          FROM lineitem WHERE l_returnflag <> 'R' AND l_linestatus = 'F'
          UNION ALL
          SELECT 'open', l_partkey, l_extendedprice, l_discount
          FROM lineitem WHERE l_returnflag <> 'R' AND l_linestatus <> 'F'
        )
        SELECT channel, p_brand, count(*) AS n,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue
        FROM channels JOIN part ON l_partkey = p_partkey
        GROUP BY channel, p_brand
      """)
    ),
    // TPC-DS Q35/Q69 shape — multi-EXISTS customer census: a semi
    // channel (urgent orders), a DISJUNCTION of two exists channels
    // (returned lineitems OR open orders), and an anti channel (no
    // low-priority orders), aggregated per (nation, segment).
    // Decorrelation breadth is the point: Catalyst rewrites the
    // conjunct EXISTS to a LeftSemi, the OR'd pair to ExistenceJoins
    // (flag columns OR'd in the filter — the rewrite a disjunction
    // forces, since a semi-join can't express OR), and the NOT EXISTS
    // to a LeftAnti; every orders-side build broadcasts at dim scale
    // and the lineitem probe stays a shuffle join. At 100 TB each
    // channel is one hash join keyed on custkey — no correlated
    // re-execution per row (reference
    // flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-86).
    QueryDef(
      "q_flagship_ds_exists_census",
      (s, dir) => {
        val t = tables(s, dir)
        t.customer.createOrReplaceTempView("customer_census")
        t.orders.createOrReplaceTempView("orders_census")
        t.lineitem.createOrReplaceTempView("lineitem_census")
        s.sql("""
          SELECT c_nationkey AS nation, c_mktsegment AS segment,
                 count(*) AS n,
                 -- exact long-cents avg, rounded to 4 decimals IN
                 -- INTEGER ARITHMETIC: round(x, 4) on a double diverges
                 -- between engines when the exact quotient sits on a
                 -- .00005 boundary (Spark rounds the shortest decimal
                 -- repr, DuckDB the binary value — bit on sf1 group 58);
                 -- half-up on the exact rational can't
                 (CAST((200 * sum(CAST(round(c_acctbal*100) AS BIGINT))
                        + count(*)) div (2 * count(*)) AS DOUBLE)
                  / 10000.0) AS avg_bal,
                 min(c_acctbal) AS min_bal,
                 max(c_acctbal) AS max_bal
          FROM customer_census c
          WHERE EXISTS (SELECT 1 FROM orders_census o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
            AND (EXISTS (SELECT 1 FROM orders_census o
                         JOIN lineitem_census l ON l.l_orderkey = o.o_orderkey
                         WHERE o.o_custkey = c.c_custkey
                           AND l.l_returnflag = 'R')
                 OR EXISTS (SELECT 1 FROM orders_census o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'O'))
            AND NOT EXISTS (SELECT 1 FROM orders_census o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '5-LOW')
          GROUP BY c_nationkey, c_mktsegment
        """)
      },
      Some("""
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               count(*) AS n,
               (CAST((200 * sum(CAST(round(c_acctbal*100) AS BIGINT))
                      + count(*)) // (2 * count(*)) AS DOUBLE)
                / 10000.0) AS avg_bal,
               min(c_acctbal) AS min_bal,
               max(c_acctbal) AS max_bal
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
          AND (EXISTS (SELECT 1 FROM orders o
                       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                       WHERE o.o_custkey = c.c_custkey
                         AND l.l_returnflag = 'R')
               OR EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'O'))
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        GROUP BY c_nationkey, c_mktsegment
      """)
    ),
    // TPC-DS Q23 shape — frequent items × best customers: a HAVING
    // subquery channel (parts sold in >= 8 lineitems), a nested-
    // aggregate scalar subquery (max over per-customer lifetime
    // totals), and an IN channel correlated THROUGH that scalar
    // (customers above half the max). Decorrelation is the point:
    // Catalyst turns both INs into semi joins (the part channel a
    // shuffle semi on the big key set, the customer channel a
    // broadcast semi on the tiny "best" set), and the scalar max into
    // a one-row subquery broadcast into the totals filter — zero
    // correlated re-execution. The totals CTE is computed ONCE and
    // reused by both the scalar and the IN (Catalyst CTE reuse). Money
    // sums in exact long cents so sf1 partial-agg order can't drift
    // the comparison against 0.5*max (reference
    // flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-86).
    QueryDef(
      "q_flagship_ds_frequent",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders.createOrReplaceTempView("orders_freq")
        t.lineitem.createOrReplaceTempView("lineitem_freq")
        val revenue = Money.sumWideUnitsSqlSpark(
          Money.discPriceUnitsSql("l.l_extendedprice", "l.l_discount")) +
          " / 10000.0"
        s.sql(s"""
          WITH freq AS (
            SELECT l_partkey FROM lineitem_freq
            GROUP BY l_partkey HAVING count(*) >= 8
          ),
          totals AS (
            SELECT o_custkey, ${Money.sumPriceSqlSpark("o_totalprice")} AS total
            FROM orders_freq GROUP BY o_custkey
          )
          SELECT o.o_orderpriority AS priority,
                 count(*) AS n_items,
                 $revenue AS revenue
          FROM lineitem_freq l JOIN orders_freq o
            ON l.l_orderkey = o.o_orderkey
          WHERE l.l_partkey IN (SELECT l_partkey FROM freq)
            AND o.o_custkey IN (SELECT o_custkey FROM totals
                                WHERE total > 0.5 * (SELECT max(total)
                                                     FROM totals))
          GROUP BY o.o_orderpriority
        """)
      },
      Some(s"""
        WITH freq AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING count(*) >= 8
        ),
        totals AS (
          SELECT o_custkey, ${Money.sumPriceSql("o_totalprice")} AS total
          FROM orders GROUP BY o_custkey
        )
        SELECT o.o_orderpriority AS priority,
               count(*) AS n_items,
               ${Money.sumWideUnitsSql(
                 Money.discPriceUnitsSql("l.l_extendedprice", "l.l_discount")
               )} / 10000.0 AS revenue
        FROM lineitem l JOIN orders o
          ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey IN (SELECT l_partkey FROM freq)
          AND o.o_custkey IN (SELECT o_custkey FROM totals
                              WHERE total > 0.5 * (SELECT max(total)
                                                   FROM totals))
        GROUP BY o.o_orderpriority
      """)
    ),
    // TPC-DS Q64 shape — cross-sale: the same (customer, part) bought
    // in BOTH 1995 and 1996, with the two yearly revenues side by
    // side. The spec shape (and Q64 itself) is a self-join of two
    // filtered aggregates over the same fact; the Spark-first plan
    // fuses them into ONE scan with conditional per-year sums and a
    // HAVING-both-present filter — the same 2-scans→1-scan rewrite as
    // the Q88 multirange (half the I/O, one shuffle on the compound
    // key, no join at all). Money long-cent sums keep both yearly
    // revenues exact; the oracle keeps the fused form so both engines
    // aggregate identical integers.
    QueryDef(
      "q_flagship_ds_crosssale",
      (s, dir) => {
        val t = tables(s, dir)
        val rev = Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val y = year(col("o_orderdate").cast("date"))
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .filter(y.isin(1995, 1996))
          .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .agg(
            (Money.sumWideUnits(when(y === 1995, rev).otherwise(lit(0L)))
              / lit(10000.0)).as("rev_1995"),
            (Money.sumWideUnits(when(y === 1996, rev).otherwise(lit(0L)))
              / lit(10000.0)).as("rev_1996"),
            count(when(y === 1995, lit(1))).as("n_1995"),
            count(when(y === 1996, lit(1))).as("n_1996"))
          .filter(col("n_1995") > 0 && col("n_1996") > 0)
          .select(
            col("cust"), col("part"),
            col("rev_1995"), col("rev_1996"),
            round(col("rev_1996") / col("rev_1995"), 4).as("yoy"))
      },
      Some(s"""
        SELECT o_custkey AS cust, l_partkey AS part,
               ${Money.sumWideUnitsSql(
                 s"CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995 THEN ${
                   Money.discPriceUnitsSql("l_extendedprice", "l_discount")
                 } ELSE 0 END")} / 10000.0 AS rev_1995,
               ${Money.sumWideUnitsSql(
                 s"CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996 THEN ${
                   Money.discPriceUnitsSql("l_extendedprice", "l_discount")
                 } ELSE 0 END")} / 10000.0 AS rev_1996,
               round((${Money.sumWideUnitsSql(
                 s"CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996 THEN ${
                   Money.discPriceUnitsSql("l_extendedprice", "l_discount")
                 } ELSE 0 END")} / 10000.0) /
                 (${Money.sumWideUnitsSql(
                 s"CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995 THEN ${
                   Money.discPriceUnitsSql("l_extendedprice", "l_discount")
                 } ELSE 0 END")} / 10000.0), 4) AS yoy
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        GROUP BY o_custkey, l_partkey
        HAVING count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
                          THEN 1 END) > 0
           AND count(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
                          THEN 1 END) > 0
      """)
    ),
    // TPC-DS Q88 shape — multi-range census: eight time-window counts
    // with per-window predicates, presented as one row. The spec text
    // (and the oracle below) writes this as EIGHT scalar subqueries
    // cross-joined — eight scans. The Spark-first plan fuses them into
    // ONE scan with conditional aggregation (count(CASE)), which is the
    // rewrite that matters at 100 TB: 1× the I/O, map-side partials,
    // zero shuffle beyond the single-row final agg.
    QueryDef(
      "q_flagship_ds_multirange",
      (s, dir) => {
        val t = tables(s, dir)
        val e = t.events
          .filter(col("event_type") === "click")
          .select(hour(col("ts")).as("h"), col("value"))
        def bucket(i: Int): Column = {
          val lo = i * 3
          val hi = lo + 2
          val thr = i * 25.0
          count(when(col("h").between(lo, hi) && col("value") > thr, 1))
            .as(s"h$i")
        }
        e.agg(bucket(0), bucket(1), bucket(2), bucket(3),
              bucket(4), bucket(5), bucket(6), bucket(7))
      },
      Some {
        val subs = (0 until 8).map { i =>
          val lo = i * 3
          val hi = lo + 2
          val thr = i * 25.0
          s"""(SELECT count(*) AS h$i FROM events
               WHERE event_type = 'click'
                 AND extract(hour FROM ts) BETWEEN $lo AND $hi
                 AND value > $thr)"""
        }
        s"SELECT * FROM ${subs.mkString(", ")}"
      }
    ),
    // TPC-DS Q67-ish shape — OVER-window share-of-total on an
    // aggregate: part revenue within its brand, each part's share of
    // the brand total and brand-local rank, top 3 per brand. The
    // window partitions by brand over the ALREADY-AGGREGATED relation
    // (one row per part), so the window state at 100 TB is per-brand
    // group cells, not fact rows.
    QueryDef(
      "q_flagship_ds_share",
      (s, dir) => {
        val t = tables(s, dir)
        // the share's numerator/denominator stay INTEGER-VALUED doubles
        // (1e-4-dollar units): the window sum is then order-independent
        // and both engines divide identical operands — no fp-summation
        // drift through the round(6). (Past ~2^53 total units per brand
        // — far beyond these SFs — the two-pass groupBy+sumWideUnits
        // join is the exact alternative.)
        val perPart = t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_partkey"))
          .agg(
            Money.sumWideUnits(
              Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
            ).as("units")
          )
        val w = Window.partitionBy(col("p_brand"))
        val rankW = w.orderBy(col("units").desc, col("p_partkey"))
        perPart
          .withColumn("brand_total", sum(col("units")).over(w))
          .withColumn("share", round(col("units") / col("brand_total"), 6))
          .withColumn("rnk", row_number().over(rankW).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("p_brand"), col("p_partkey"),
            (col("units") / 10000.0).as("revenue"), col("share"), col("rnk"))
      },
      Some(s"""
        WITH per_part AS (
          SELECT p_brand, p_partkey,
                 ${Money.sumWideUnitsSql(
        Money.discPriceUnitsSql("l_extendedprice", "l_discount"))} AS units
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, p_partkey
        )
        SELECT p_brand, p_partkey, units / 10000.0 AS revenue, share, rnk FROM (
          SELECT p_brand, p_partkey, units,
                 round(units / sum(units) OVER (PARTITION BY p_brand), 6) AS share,
                 CAST(row_number() OVER (PARTITION BY p_brand
                      ORDER BY units DESC, p_partkey) AS BIGINT) AS rnk
          FROM per_part)
        WHERE rnk <= 3
      """)
    ),
    // TPC-DS Q31-ish shape — period-over-period ratio on an aggregate:
    // revenue per nation x order-year, each year's ratio to the
    // previous year via lag() over the aggregated relation (the
    // self-join-on-consecutive-periods shape, expressed as the window
    // Catalyst turns it into). Ratio numerator/denominator are exact
    // integer-valued cent totals, so both engines divide identical
    // operands.
    QueryDef(
      "q_flagship_ds_yoy",
      (s, dir) => {
        val t = tables(s, dir)
        val perYear = t.orders
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
          .agg(Money.sumWideUnits(Money.cents(col("o_totalprice"))).as("units"))
        val w = Window.partitionBy(col("n_name")).orderBy(col("yr"))
        perYear
          .withColumn("prev_units", lag(col("units"), 1).over(w))
          .select(
            col("n_name"),
            col("yr"),
            (col("units") / 100.0).as("revenue"),
            round(col("units") / col("prev_units"), 6).as("yoy")
          )
      },
      Some(s"""
        WITH per_year AS (
          SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
                 ${Money.sumWideUnitsSql(Money.centsSql("o_totalprice"))} AS units
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
        )
        SELECT n_name, yr, units / 100.0 AS revenue,
               round(units / lag(units, 1) OVER (PARTITION BY n_name ORDER BY yr), 6)
                 AS yoy
        FROM per_year
      """)
    ),
    // TPC-DS Q47-ish shape — deviation-from-mean with neighbor
    // context: monthly brand revenue joined against its own yearly
    // average (a whole-partition window), kept when it strays >20%
    // from the mean, with the adjacent months via lag/lead for trend
    // context. One fact scan, one shuffle on the brand key; the year
    // mean is a window over <= 12 rows per (brand, year) cell and the
    // sums are exact integer cents, so the ratio is engine-identical.
    QueryDef(
      "q_flagship_ds_deviation",
      (s, dir) => {
        val t = tables(s, dir)
        val monthly = t.lineitem
          .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(Money.sumWideUnits(Money.cents(col("l_extendedprice"))).as("units"))
        val wYear = Window.partitionBy(col("p_brand"), col("yr"))
        val wSeq = Window.partitionBy(col("p_brand")).orderBy(col("yr"), col("mo"))
        monthly
          .withColumn("avg_units", avg(col("units")).over(wYear))
          .withColumn("ratio", round(col("units") / col("avg_units"), 6))
          .withColumn("prev_units", lag(col("units"), 1).over(wSeq))
          .withColumn("next_units", lead(col("units"), 1).over(wSeq))
          .filter(col("ratio") > 1.2 || col("ratio") < 0.8)
          .select(col("p_brand"), col("yr"), col("mo"),
            (col("units") / 100.0).as("revenue"), col("ratio"),
            (col("prev_units") / 100.0).as("prev_revenue"),
            (col("next_units") / 100.0).as("next_revenue"))
      },
      Some(s"""
        WITH monthly AS (
          SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mo,
                 ${Money.sumWideUnitsSql(Money.centsSql("l_extendedprice"))} AS units
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2, 3
        ), scored AS (
          SELECT p_brand, yr, mo, units,
                 round(units / avg(units) OVER (PARTITION BY p_brand, yr), 6) AS ratio,
                 lag(units, 1)  OVER (PARTITION BY p_brand ORDER BY yr, mo) AS prev_units,
                 lead(units, 1) OVER (PARTITION BY p_brand ORDER BY yr, mo) AS next_units
          FROM monthly
        )
        SELECT p_brand, yr, mo, units / 100.0 AS revenue, ratio,
               prev_units / 100.0 AS prev_revenue,
               next_units / 100.0 AS next_revenue
        FROM scored WHERE ratio > 1.2 OR ratio < 0.8
      """)
    ),
    // TPC-DS Q88-ish shape — multi-band census in ONE scan: eight
    // conditional counts over disjoint quantity bands (each also
    // discount-bounded), emitted as one row. The alternative — eight
    // filtered subqueries — scans the fact table eight times; here the
    // bands are conditional aggregates inside a single hash-agg, so at
    // 100 TB the fact is read once and each band is a map-side partial.
    QueryDef(
      "q_flagship_ds_bands",
      (s, dir) => {
        val t = tables(s, dir)
        def band(lo: Int, hi: Int) = count(
          when(col("l_quantity") >= lo && col("l_quantity") < hi &&
            col("l_discount") <= 0.05, 1))
        t.lineitem.agg(
          band(1, 7).as("b1"), band(7, 13).as("b2"),
          band(13, 19).as("b3"), band(19, 25).as("b4"),
          band(25, 31).as("b5"), band(31, 37).as("b6"),
          band(37, 43).as("b7"), band(43, 51).as("b8")
        )
      },
      Some("""
        SELECT
          count(*) FILTER (WHERE l_quantity >= 1  AND l_quantity < 7  AND l_discount <= 0.05) AS b1,
          count(*) FILTER (WHERE l_quantity >= 7  AND l_quantity < 13 AND l_discount <= 0.05) AS b2,
          count(*) FILTER (WHERE l_quantity >= 13 AND l_quantity < 19 AND l_discount <= 0.05) AS b3,
          count(*) FILTER (WHERE l_quantity >= 19 AND l_quantity < 25 AND l_discount <= 0.05) AS b4,
          count(*) FILTER (WHERE l_quantity >= 25 AND l_quantity < 31 AND l_discount <= 0.05) AS b5,
          count(*) FILTER (WHERE l_quantity >= 31 AND l_quantity < 37 AND l_discount <= 0.05) AS b6,
          count(*) FILTER (WHERE l_quantity >= 37 AND l_quantity < 43 AND l_discount <= 0.05) AS b7,
          count(*) FILTER (WHERE l_quantity >= 43 AND l_quantity < 51 AND l_discount <= 0.05) AS b8
        FROM lineitem
      """)
    ),
    // TPC-DS Q34/Q73 shape — basket-band groupBy-then-join-back: count
    // items per order (map-side partial combine on l_orderkey), keep
    // only baskets in a band, then join the surviving ~order-count-
    // sized relation back to orders (SMJ sharing the orderkey shuffle)
    // and to the customer dim. At 100 TB the band filter runs BEFORE
    // the join, so the join input is the band's orders, not the fact.
    QueryDef(
      "q_flagship_ds_basket",
      (s, dir) => {
        val t = tables(s, dir)
        val baskets = t.lineitem
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("item_cnt"))
          .filter(col("item_cnt").between(6, 7))
        t.orders
          .join(baskets, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("item_cnt"))
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, t.item_cnt
        FROM (SELECT l_orderkey, count(*) AS item_cnt
              FROM lineitem GROUP BY l_orderkey
              HAVING count(*) BETWEEN 6 AND 7) t
        JOIN orders ON o_orderkey = t.l_orderkey
        JOIN customer ON c_custkey = o_custkey
      """)
    ),
    // TPC-DS Q51 shape — cumulative-window full-outer over two
    // channels: per-user daily sums for two event channels, each with
    // a running cumulative window, FULL OUTER joined on (user, day),
    // then a second window forward-fills the missing channel's
    // cumulative before comparing. Two shuffles on (user_id) + one
    // well-spread join; the windows are per-user sequential scans.
    // Daily sums round to 4dp before the running sum so both engines
    // fold the identical value sequence.
    QueryDef(
      "q_flagship_ds_cumulative",
      (s, dir) => {
        val t = tables(s, dir)
        def channel(tag: String, alias: String) = t.events
          .filter(col("event_type") === tag)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(round(sum(col("value")), 4).as(alias))
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val web = channel("purchase", "wd")
          .withColumn("web_cum", round(sum(col("wd")).over(w), 4))
          .select(col("user_id"), col("d"), col("web_cum"))
        val store = channel("view", "vd")
          .withColumn("view_cum", round(sum(col("vd")).over(w), 4))
          .select(col("user_id"), col("d"), col("view_cum"))
        web.join(store, Seq("user_id", "d"), "full_outer")
          .withColumn("web_fill", max(col("web_cum")).over(w))
          .withColumn("view_fill", max(col("view_cum")).over(w))
          .filter(col("web_fill") > col("view_fill"))
          .select(col("user_id"), col("d"), col("web_fill"), col("view_fill"))
      },
      Some("""
        WITH web_day AS (
          SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 4) AS wd
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        web AS (
          SELECT user_id, d,
                 round(sum(wd) OVER (PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS web_cum
          FROM web_day
        ),
        view_day AS (
          SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 4) AS vd
          FROM events WHERE event_type = 'view' GROUP BY 1, 2
        ),
        views AS (
          SELECT user_id, d,
                 round(sum(vd) OVER (PARTITION BY user_id ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS view_cum
          FROM view_day
        ),
        j AS (
          SELECT coalesce(w.user_id, v.user_id) AS user_id,
                 coalesce(w.d, v.d) AS d, w.web_cum, v.view_cum
          FROM web w FULL OUTER JOIN views v
            ON w.user_id = v.user_id AND w.d = v.d
        ),
        f AS (
          SELECT user_id, d,
                 max(web_cum) OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS web_fill,
                 max(view_cum) OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS view_fill
          FROM j
        )
        SELECT user_id, d, web_fill, view_fill
        FROM f WHERE web_fill > view_fill
      """)
    ),
    // TPC-DS Q5 shape — ROLLUP over a multi-channel UNION: three
    // channels unioned with a tag, dims joined, then profit rolled up
    // per (channel, nation) with subtotals. In real Q5 the channels
    // are distinct fact TABLES (store/catalog/web sales), so the union
    // is the mandatory plan shape; here three disjoint fact partitions
    // emulate it. The combination under test is union -> broadcast dim
    // joins -> rollup, which no existing query covers (ds_rollup has
    // no union, ds_channels has no rollup). Each union branch keeps
    // its returnflag/linestatus predicate in the parquet scan; the
    // rollup's Expand runs AFTER the join tree, so the fact crosses
    // the shuffle once per grouping-set batch, not per channel.
    QueryDef(
      "q_flagship_ds_union_profit",
      (s, dir) => {
        val t = tables(s, dir)
        // r21 optimization (guide §2.4): the three channel filters are
        // disjoint and exhaustive over the fact, so the 3-channel
        // UNION (3 lineitem scans + 3 orders joins) collapses to ONE
        // scan + ONE orders join with a CASE channel tag — identical
        // rows into the identical rollup (NULL-flag rows matched no
        // original branch; the isNotNull guard preserves that).
        val channel =
          when(col("l_returnflag") === "R", "returned")
            .when(col("l_returnflag") =!= "R" && col("l_linestatus") === "F",
              "fulfilled")
            .when(col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F",
              "open")
        val u = t.lineitem
          .select(channel.as("channel"), col("l_orderkey"),
            col("l_extendedprice"), col("l_discount"))
          .filter(col("channel").isNotNull)
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .select(col("channel"), col("n_name"),
            col("l_extendedprice"), col("l_discount"))
        u.rollup(col("channel"), col("n_name"))
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"))
          .select(
            coalesce(col("channel"), lit("ALL")).as("channel"),
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            col("gid"), col("n"), col("revenue"))
      },
      Some(s"""
        WITH base AS (
          SELECT CASE WHEN l_returnflag = 'R' THEN 'returned'
                      WHEN l_linestatus = 'F' THEN 'fulfilled'
                      ELSE 'open' END AS channel,
                 n_name, l_extendedprice, l_discount
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT coalesce(channel, 'ALL') AS channel,
               coalesce(n_name, 'ALL') AS nation,
               CAST(GROUPING(channel) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
               count(*) AS n,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue
        FROM base GROUP BY ROLLUP(channel, n_name)
      """)
    ),
    // TPC-DS Q21/Q39 shape — date-bracketed before/after ratio: one
    // bracketed fact scan (the [d1, d3) range lands in PushedFilters),
    // a conditional split at the pivot date inside ONE aggregate (no
    // second scan, no self-join), and a ratio band filter. l_quantity
    // is integral so both sums are exact longs and the ratio is a
    // correctly-rounded IEEE division of exact integers — hash-stable.
    QueryDef(
      "q_flagship_ds_inventory_ratio",
      (s, dir) => {
        val t = tables(s, dir)
        val d1 = lit("1997-01-01").cast("timestamp")
        val d2 = lit("1998-01-01").cast("timestamp")
        val d3 = lit("1999-01-01").cast("timestamp")
        t.lineitem
          .filter(col("l_shipdate") >= d1 && col("l_shipdate") < d3)
          .groupBy(col("l_suppkey"))
          .agg(
            sum(when(col("l_shipdate") < d2, col("l_quantity"))
              .otherwise(lit(0.0))).cast("long").as("qty_before"),
            sum(when(col("l_shipdate") >= d2, col("l_quantity"))
              .otherwise(lit(0.0))).cast("long").as("qty_after"))
          .filter(col("qty_before") > 0 && col("qty_after") > 0)
          .withColumn("ratio",
            round(col("qty_before").cast("double")
              / col("qty_after").cast("double"), 6))
          .filter(col("ratio") >= 0.5 && col("ratio") <= 1.5)
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("qty_before"), col("qty_after"), col("ratio"))
      },
      Some("""
        WITH b AS (
          SELECT l_suppkey,
                 CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01'
                               THEN l_quantity ELSE 0.0 END) AS BIGINT)
                   AS qty_before,
                 CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                               THEN l_quantity ELSE 0.0 END) AS BIGINT)
                   AS qty_after
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1999-01-01'
          GROUP BY l_suppkey
        ),
        r AS (
          SELECT *, round(CAST(qty_before AS DOUBLE)
                          / CAST(qty_after AS DOUBLE), 6) AS ratio
          FROM b WHERE qty_before > 0 AND qty_after > 0
        )
        SELECT s_suppkey, s_name, qty_before, qty_after, ratio
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE ratio >= 0.5 AND ratio <= 1.5
      """)
    ),
    // TPC-DS Q38/Q87 shape — multi-period repeat customers via
    // INTERSECT of grouped sets: distinct active customers of three
    // consecutive years intersected, then counted per segment. Spark
    // plans each INTERSECT as a distinct + left-semi hash join on the
    // same key, so the three branches co-partition and the date
    // predicates stay in each branch's scan.
    QueryDef(
      "q_flagship_ds_repeat",
      (s, dir) => {
        val t = tables(s, dir)
        def active(y1: String, y2: String) = t.orders
          .filter(col("o_orderdate") >= lit(y1).cast("timestamp") &&
            col("o_orderdate") < lit(y2).cast("timestamp"))
          .select(col("o_custkey"))
          .distinct()
        active("1996-01-01", "1997-01-01")
          .intersect(active("1997-01-01", "1998-01-01"))
          .intersect(active("1998-01-01", "1999-01-01"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_repeat"))
          .select(col("c_mktsegment").as("segment"), col("n_repeat"))
      },
      Some("""
        WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate <  TIMESTAMP '1997-01-01'),
        y97 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                  AND o_orderdate <  TIMESTAMP '1998-01-01'),
        y98 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                  AND o_orderdate <  TIMESTAMP '1999-01-01'),
        rep AS (
          SELECT o_custkey FROM y96
          INTERSECT SELECT o_custkey FROM y97
          INTERSECT SELECT o_custkey FROM y98
        )
        SELECT c_mktsegment AS segment, count(*) AS n_repeat
        FROM rep JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
      """)
    ),
    // TPC-DS Q83 shape — dual-fact ratio join: two independent
    // aggregations of the fact (returned quantity / total quantity per
    // part) joined on their shared group key, ratio-banded, brand from
    // the broadcast dim. Both aggregates hash-partition on l_partkey,
    // so the join of the two is co-partitioned — no third shuffle; at
    // 100 TB the plan cost is exactly two fact scans (one pruned by
    // the returnflag predicate) and one dim broadcast.
    QueryDef(
      "q_flagship_ds_returns_ratio",
      (s, dir) => {
        val t = tables(s, dir)
        val ret = t.lineitem
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity")).cast("long").as("ret_qty"))
        val tot = t.lineitem
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity")).cast("long").as("tot_qty"))
        ret.join(tot, "l_partkey")
          .withColumn("ratio",
            round(col("ret_qty").cast("double")
              / col("tot_qty").cast("double"), 6))
          .filter(col("ratio") >= 0.5)
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey").as("partkey"), col("p_brand"),
            col("ret_qty"), col("tot_qty"), col("ratio"))
      },
      Some("""
        WITH ret AS (
          SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS ret_qty
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
        ),
        tot AS (
          SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS tot_qty
          FROM lineitem GROUP BY l_partkey
        ),
        j AS (
          SELECT ret.l_partkey, ret_qty, tot_qty,
                 round(CAST(ret_qty AS DOUBLE)
                       / CAST(tot_qty AS DOUBLE), 6) AS ratio
          FROM ret JOIN tot ON ret.l_partkey = tot.l_partkey
        )
        SELECT j.l_partkey AS partkey, p_brand, ret_qty, tot_qty, ratio
        FROM j JOIN part ON j.l_partkey = p_partkey
        WHERE ratio >= 0.5
      """)
    ),
    // TPC-DS Q87 EXCEPT leg — lapsed customers: active in 1997 but
    // absent in 1998 via EXCEPT of grouped sets, counted per nation.
    // Complements ds_repeat's INTERSECT with the anti-shaped set op
    // (Spark plans EXCEPT as distinct + left-anti on the same key).
    QueryDef(
      "q_flagship_ds_lapsed",
      (s, dir) => {
        val t = tables(s, dir)
        def active(y1: String, y2: String) = t.orders
          .filter(col("o_orderdate") >= lit(y1).cast("timestamp") &&
            col("o_orderdate") < lit(y2).cast("timestamp"))
          .select(col("o_custkey"))
          .distinct()
        active("1997-01-01", "1998-01-01")
          .except(active("1998-01-01", "1999-01-01"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_lapsed"))
          .select(col("n_name").as("nation"), col("n_lapsed"))
      },
      Some("""
        WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                       AND o_orderdate <  TIMESTAMP '1998-01-01'),
        y98 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                  AND o_orderdate <  TIMESTAMP '1999-01-01'),
        lapsed AS (
          SELECT o_custkey FROM y97
          EXCEPT SELECT o_custkey FROM y98
        )
        SELECT n_name AS nation, count(*) AS n_lapsed
        FROM lapsed
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
      """)
    ),
    // TPC-DS Q14 shape — INTERSECT as a semi-filter inside a bigger
    // aggregate: the brand set present in ALL THREE channels (an
    // INTERSECT chain over distinct projections) filters the main
    // revenue rollup via a left-semi join. Unlike ds_repeat (where the
    // INTERSECT IS the result) the set here is an intermediate whose
    // product feeds a second aggregate — Q14's cross_items pattern. The
    // brand set is tiny (distinct brands), so AQE turns the semi join
    // into a broadcast.
    QueryDef(
      "q_flagship_ds_cross_channel_items",
      (s, dir) => {
        val t = tables(s, dir)
        val fact = t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_returnflag"), col("l_linestatus"),
            col("l_extendedprice"), col("l_discount"))
        def brandsOf(cond: Column) =
          fact.filter(cond).select(col("p_brand")).distinct()
        val common = brandsOf(col("l_returnflag") === "R")
          .intersect(brandsOf(
            col("l_returnflag") =!= "R" && col("l_linestatus") === "F"))
          .intersect(brandsOf(
            col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F"))
        fact
          .join(common, Seq("p_brand"), "left_semi")
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"))
      },
      Some(s"""
        WITH fact AS (
          SELECT p_brand, l_returnflag, l_linestatus,
                 l_extendedprice, l_discount
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        common AS (
          SELECT DISTINCT p_brand FROM fact WHERE l_returnflag = 'R'
          INTERSECT
          SELECT DISTINCT p_brand FROM fact
          WHERE l_returnflag <> 'R' AND l_linestatus = 'F'
          INTERSECT
          SELECT DISTINCT p_brand FROM fact
          WHERE l_returnflag <> 'R' AND l_linestatus <> 'F'
        )
        SELECT p_brand, count(*) AS n,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue
        FROM fact
        WHERE p_brand IN (SELECT p_brand FROM common)
        GROUP BY p_brand
      """)
    ),
    // TPC-DS Q33/Q56/Q60 shape — aggregate -> UNION ALL -> re-aggregate:
    // per-brand revenue computed independently in three disjoint ship
    // windows (each a pruned scan + its own two-phase agg), the three
    // AGGREGATED relations unioned and re-aggregated. Differs from
    // ds_union_profit, which unions FACT rows before one aggregate.
    // Exactness at any scale: each branch keeps the two-accumulator
    // (hi, lo) long split of Money.sumWideUnits THROUGH the union, so
    // the outer sum is still integer-only and the single double
    // reconstruction happens once at the end — the re-agg never sums
    // doubles.
    QueryDef(
      "q_flagship_ds_union_of_aggs",
      (s, dir) => {
        val t = tables(s, dir)
        val wide = 1000000L
        def win(d1: String, d2: String) = {
          val units =
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
          val lo = pmod(units, lit(wide))
          t.lineitem
            .filter(col("l_shipdate") >= lit(d1).cast("timestamp") &&
              col("l_shipdate") < lit(d2).cast("timestamp"))
            .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
            .groupBy(col("p_brand"))
            .agg(
              sum(((units - lo) / lit(wide)).cast("long")).as("uh"),
              sum(lo).as("ul"))
        }
        win("1996-01-01", "1996-07-01")
          .unionByName(win("1997-01-01", "1997-07-01"))
          .unionByName(win("1998-01-01", "1998-07-01"))
          .groupBy(col("p_brand"))
          .agg(sum(col("uh")).as("h"), sum(col("ul")).as("l"),
            count(lit(1)).cast("long").as("n_windows"))
          .select(col("p_brand"), col("n_windows"),
            round((col("h").cast("double") * lit(wide.toDouble)
              + col("l").cast("double")) / lit(10000.0), 4).as("revenue"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def winSql(d1: String, d2: String) = s"""
          SELECT p_brand,
                 sum(($units) // 1000000) AS uh,
                 sum(($units) % 1000000) AS ul
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '$d1'
            AND l_shipdate <  TIMESTAMP '$d2'
          GROUP BY p_brand"""
        s"""
        WITH u AS (
          ${winSql("1996-01-01", "1996-07-01")}
          UNION ALL ${winSql("1997-01-01", "1997-07-01")}
          UNION ALL ${winSql("1998-01-01", "1998-07-01")}
        )
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n_windows,
               round((CAST(sum(uh) AS DOUBLE) * 1000000.0
                      + CAST(sum(ul) AS DOUBLE)) / 10000.0, 4) AS revenue
        FROM u GROUP BY p_brand
      """
      }
    ),
    // TPC-DS Q58 shape — band join of two aggregates: per-brand revenue
    // in two channels (fulfilled vs open), the two aggregated relations
    // joined on brand where each side sits within ±20% of the other.
    // The band predicate runs on EXACT integer unit totals (10·a vs
    // 8·b / 12·b), so the cut is order-independent; both aggs hash on
    // p_brand and co-partition into the join.
    QueryDef(
      "q_flagship_ds_band_join",
      (s, dir) => {
        val t = tables(s, dir)
        def chan(alias: String, cond: Column) = t.lineitem
          .filter(cond)
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(Money.sumWideUnits(
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
            .as(alias))
        val a = chan("ua",
          col("l_returnflag") =!= "R" && col("l_linestatus") === "F")
        val b = chan("ub",
          col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F")
        a.join(b, "p_brand")
          .filter(col("ua") * 10 >= col("ub") * 8 &&
            col("ua") * 10 <= col("ub") * 12)
          .select(col("p_brand"),
            round(col("ua") / 10000.0, 4).as("rev_fulfilled"),
            round(col("ub") / 10000.0, 4).as("rev_open"),
            round(col("ua") / col("ub"), 6).as("ratio"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH a AS (
          SELECT p_brand, ${Money.sumWideUnitsSql(units)} AS ua
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_returnflag <> 'R' AND l_linestatus = 'F'
          GROUP BY p_brand
        ),
        b AS (
          SELECT p_brand, ${Money.sumWideUnitsSql(units)} AS ub
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_returnflag <> 'R' AND l_linestatus <> 'F'
          GROUP BY p_brand
        )
        SELECT a.p_brand, round(ua / 10000.0, 4) AS rev_fulfilled,
               round(ub / 10000.0, 4) AS rev_open,
               round(ua / ub, 6) AS ratio
        FROM a JOIN b ON a.p_brand = b.p_brand
        WHERE ua * 10 >= ub * 8 AND ua * 10 <= ub * 12
      """
      }
    ),
    // TPC-DS Q54 shape — two-level aggregate into a histogram: exact
    // revenue per customer (level 1), customers bucketed into $500
    // bands by INTEGER division of the unit total (level 2), customer
    // count per band. The band boundary is integer arithmetic on exact
    // 1e-4-dollar units — no float can straddle a bucket edge. Level 2
    // aggregates one row per customer, so the second shuffle is
    // customer-cardinality, not fact-cardinality.
    QueryDef(
      "q_flagship_ds_revenue_bands",
      (s, dir) => {
        val t = tables(s, dir)
        val perCust = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(Money.sumWideUnits(
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
            .as("units"))
        perCust
          .select(expr("CAST(units AS BIGINT) div 5000000").as("band"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_customers"))
          .select(col("band"), (col("band") * 500.0).as("band_lo_dollars"),
            col("n_customers"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH per_cust AS (
          SELECT o_custkey, ${Money.sumWideUnitsSql(units)} AS units
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey
        )
        SELECT band, band * 500.0 AS band_lo_dollars,
               count(*) AS n_customers
        FROM (SELECT CAST(units AS BIGINT) // 5000000 AS band FROM per_cust)
        GROUP BY band
      """
      }
    ),
    // TPC-DS Q93 shape — returns-adjusted net sales: the fact LEFT
    // JOINs its own returned subset on the COMPOSITE line identity
    // (orderkey, linenumber) and nets out refunds via coalesce
    // arithmetic. In Q93 the right side is the store_returns fact; the
    // returned-lines subset plays that role here. The composite-key
    // fact-fact left join hash-partitions both sides on the same two
    // columns, and the returnflag predicate prunes the right-side scan.
    QueryDef(
      "q_flagship_ds_returns_net",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val ret = t.lineitem
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_orderkey"),
            col("l_linenumber").as("r_linenumber"),
            // refund = the discounted line amount (full-line return)
            units.as("refund_units"))
        val net = t.lineitem
          .join(ret,
            col("l_orderkey") === col("r_orderkey") &&
              col("l_linenumber") === col("r_linenumber"),
            "left_outer")
          .select(col("l_suppkey"),
            (units - coalesce(col("refund_units"), lit(0L))).as("net_units"))
        net
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_lines"),
            (Money.sumWideUnits(col("net_units")) / 10000.0).as("net_sales"))
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_lines"),
            col("net_sales"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH ret AS (
          SELECT l_orderkey AS r_orderkey, l_linenumber AS r_linenumber,
                 $units AS refund_units
          FROM lineitem WHERE l_returnflag = 'R'
        ),
        net AS (
          SELECT l_suppkey,
                 ($units) - coalesce(refund_units, 0) AS net_units
          FROM lineitem LEFT JOIN ret
            ON l_orderkey = r_orderkey AND l_linenumber = r_linenumber
        ),
        agg AS (
          SELECT l_suppkey, count(*) AS n_lines,
                 ${Money.sumWideUnitsSql("net_units")} / 10000.0 AS net_sales
          FROM net GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, n_lines, net_sales
        FROM agg JOIN supplier ON l_suppkey = s_suppkey
      """
      }
    ),
    // TPC-DS Q49 shape — rank window over a UNION of channel
    // aggregates: each channel aggregates per brand, the three
    // AGGREGATED relations union with a channel tag, then ONE window
    // partitioned by channel ranks brands inside each channel and
    // keeps the top 5. The window runs over group cells (3 channels ×
    // |brands| rows), never fact rows; differs from ds_union_of_aggs
    // (re-aggregate, no window) and ds_share (single relation, no
    // union).
    QueryDef(
      "q_flagship_ds_rank_union",
      (s, dir) => {
        val t = tables(s, dir)
        def chan(tag: String, cond: Column) = t.lineitem
          .filter(cond)
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(Money.sumWideUnits(
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
            .as("units"))
          .select(lit(tag).as("channel"), col("p_brand"), col("units"))
        val u = chan("returned", col("l_returnflag") === "R")
          .unionByName(chan("fulfilled",
            col("l_returnflag") =!= "R" && col("l_linestatus") === "F"))
          .unionByName(chan("open",
            col("l_returnflag") =!= "R" && col("l_linestatus") =!= "F"))
        val w = Window.partitionBy(col("channel"))
          .orderBy(col("units").desc, col("p_brand"))
        u.withColumn("chan_rank", row_number().over(w))
          .filter(col("chan_rank") <= 5)
          .select(col("channel"), col("p_brand"),
            round(col("units") / 10000.0, 4).as("revenue"), col("chan_rank"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def chanSql(tag: String, cond: String) = s"""
          SELECT '$tag' AS channel, p_brand,
                 ${Money.sumWideUnitsSql(units)} AS units
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE $cond
          GROUP BY p_brand"""
        s"""
        WITH u AS (
          ${chanSql("returned", "l_returnflag = 'R'")}
          UNION ALL ${chanSql("fulfilled",
            "l_returnflag <> 'R' AND l_linestatus = 'F'")}
          UNION ALL ${chanSql("open",
            "l_returnflag <> 'R' AND l_linestatus <> 'F'")}
        )
        SELECT channel, p_brand, revenue, chan_rank FROM (
          SELECT channel, p_brand,
                 round(units / 10000.0, 4) AS revenue,
                 CAST(row_number() OVER (PARTITION BY channel
                      ORDER BY units DESC, p_brand) AS INT) AS chan_rank
          FROM u
        ) WHERE chan_rank <= 5
      """
      }
    ),
    // TPC-DS Q65 shape — per-group minimum re-joined with a band: part
    // revenue per (brand, part), the BRAND-level minimum of those part
    // revenues (an aggregate OF the aggregate), and the parts sitting
    // within 110% of their brand's floor. Two-level agg + join-back is
    // the distinct combination (ds_share windows over one level;
    // top_supplier's max is a global 1-row broadcast — this key is
    // per-group). The band cut runs on exact integer units (10·u vs
    // 11·min), and both join sides hash on p_brand.
    QueryDef(
      "q_flagship_ds_floor_band",
      (s, dir) => {
        val t = tables(s, dir)
        val perPart = t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_partkey"))
          .agg(Money.sumWideUnits(
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
            .as("u"))
        val floorPerBrand = perPart
          .groupBy(col("p_brand"))
          .agg(min(col("u")).as("mu"))
        perPart.join(floorPerBrand, "p_brand")
          .filter(col("u") * 10 <= col("mu") * 11)
          .select(col("p_brand"), col("p_partkey"),
            round(col("u") / 10000.0, 4).as("revenue"),
            round(col("mu") / 10000.0, 4).as("brand_floor"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH per_part AS (
          SELECT p_brand, p_partkey, ${Money.sumWideUnitsSql(units)} AS u
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, p_partkey
        ),
        floor_per_brand AS (
          SELECT p_brand, min(u) AS mu FROM per_part GROUP BY p_brand
        )
        SELECT pp.p_brand, p_partkey,
               round(u / 10000.0, 4) AS revenue,
               round(mu / 10000.0, 4) AS brand_floor
        FROM per_part pp
        JOIN floor_per_brand f ON pp.p_brand = f.p_brand
        WHERE u * 10 <= mu * 11
      """
      }
    ),
    // TPC-DS Q37/Q82 shape — dim-banded census over a date-bracketed
    // semi join: parts in a size/price band that actually shipped
    // inside a one-year window (left-semi against the bracketed fact),
    // counted per brand. The dim predicates (size, retailprice) and
    // the fact bracket (shipdate) each land in their own scan's
    // PushedFilters; the semi join carries no fact payload — at 100 TB
    // the probe side is one pruned column.
    QueryDef(
      "q_flagship_ds_banded_census",
      (s, dir) => {
        val t = tables(s, dir)
        val shipped = t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_partkey"))
        t.part
          .filter(col("p_size").between(2, 6) &&
            col("p_retailprice") >= 500.0 && col("p_retailprice") < 1500.0)
          .join(shipped, col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"),
            Money.sumPrice(col("p_retailprice")).as("retail_total"))
      },
      Some(s"""
        SELECT p_brand, count(*) AS n_parts,
               ${Money.sumPriceSql("p_retailprice")} AS retail_total
        FROM part
        WHERE p_size BETWEEN 2 AND 6
          AND p_retailprice >= 500.0 AND p_retailprice < 1500.0
          AND p_partkey IN (
            SELECT l_partkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01')
        GROUP BY p_brand
      """)
    ),
    // TPC-DS Q66 shape — wide monthly pivot in ONE aggregate: per
    // supplier, twelve conditional monthly revenue sums over one
    // bracketed fact scan (the classic warehouse-by-month pivot).
    // Each cell keeps the exact integer unit arithmetic; one scan,
    // one shuffle on s_suppkey, twelve codegen'd long-sum pairs —
    // the shape real reporting pipelines fan out to hundreds of
    // conditional columns.
    QueryDef(
      "q_flagship_ds_monthly_pivot",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val mcols = (1 to 12).map { m =>
          (Money.sumWideUnits(
            when(month(col("l_shipdate")) === m, units).otherwise(lit(0L)))
            / 10000.0).as(f"rev_m$m%02d")
        }
        t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(mcols.head, mcols.tail: _*)
          .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey") +: col("s_name") +:
            (1 to 12).map(m => col(f"rev_m$m%02d")): _*)
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        val cells = (1 to 12).map { m =>
          val cond = s"CASE WHEN month(l_shipdate) = $m THEN $units ELSE 0 END"
          f"${Money.sumWideUnitsSql(cond)} / 10000.0 AS rev_m$m%02d"
        }.mkString(",\n                 ")
        s"""
        WITH agg AS (
          SELECT l_suppkey,
                 $cells
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ${(1 to 12).map(m => f"rev_m$m%02d").mkString(", ")}
        FROM agg JOIN supplier ON l_suppkey = s_suppkey
      """
      }
    ),
    // TPC-DS Q95 shape — group-level universal quantifier: multi-line
    // orders whose lines ALL shipped from one supplier (count distinct
    // == 1 with count > 1 — a HAVING on the order group), then a
    // census per that supplier's nation. The quantifier is ONE
    // aggregate over the bracketed fact (no per-order subquery or
    // self-join); min(l_suppkey) is the witness key because the
    // distinct count pins it unique.
    QueryDef(
      "q_flagship_ds_single_supplier",
      (s, dir) => {
        val t = tables(s, dir)
        val perOrder = t.lineitem
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(col("l_orderkey"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            count(lit(1)).as("n_lines"),
            min(col("l_suppkey")).as("the_supp"))
          .filter(col("n_supp") === 1 && col("n_lines") > 1)
        perOrder
          .join(broadcast(t.supplier), col("the_supp") === col("s_suppkey"))
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("n_lines")).as("n_lines_total"))
          .select(col("n_name").as("nation"), col("n_orders"),
            col("n_lines_total"))
      },
      Some("""
        WITH per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(*) AS n_lines,
                 min(l_suppkey) AS the_supp
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_orderkey
        )
        SELECT n_name AS nation,
               count(*) AS n_orders,
               CAST(sum(n_lines) AS BIGINT) AS n_lines_total
        FROM per_order
        JOIN supplier ON the_supp = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_supp = 1 AND n_lines > 1
        GROUP BY n_name
      """)
    ),
    // TPC-DS Q23 shape — multi-level CTE feeding a top-k semi-filter
    // into a second aggregate. Level-1 CTE counts lines per (part,
    // quarter); level-2 keeps parts with >= 4 lines in >= 2 distinct
    // quarters (a CTE over a CTE — the multi-level bit ds_frequent's
    // single-level HAVING lacks). Best customers are an exact TOP-50
    // by long-cent spend via sort-limit (TakeOrderedAndProject — a
    // distributed top-k with per-partition pruning, deliberately NOT a
    // partitionless row_number, which would funnel the corpus through
    // one task; ties break on custkey so the 50-boundary is
    // engine-identical). The 50-row best set broadcasts into its semi
    // join; the frequent-part semi shuffles (its key set scales with
    // |part|). Final aggregate: yearly line count + exact revenue over
    // lines passing BOTH filters.
    QueryDef(
      "q_flagship_ds_topk_semi",
      (s, dir) => {
        val t = tables(s, dir)
        val perQuarter = t.lineitem
          .groupBy(col("l_partkey"),
            year(col("l_shipdate")).cast("long").as("yr"),
            quarter(col("l_shipdate")).cast("long").as("qtr"))
          .agg(count(lit(1)).as("cnt"))
        val freq = perQuarter
          .filter(col("cnt") >= 4)
          .groupBy(col("l_partkey"))
          .agg(countDistinct(col("yr") * 4 + col("qtr")).as("nq"))
          .filter(col("nq") >= 2)
          .select(col("l_partkey").as("fk"))
        val best = t.orders
          .groupBy(col("o_custkey"))
          .agg(Money.sumWideUnits(Money.cents(col("o_totalprice"))).as("spend"))
          .orderBy(col("spend").desc, col("o_custkey"))
          .limit(50)
          .select(col("o_custkey").as("bk"))
        val bestOrders = t.orders
          .join(broadcast(best), col("o_custkey") === col("bk"), "left_semi")
          .select(col("o_orderkey"))
        t.lineitem
          .join(freq, col("l_partkey") === col("fk"), "left_semi")
          .join(bestOrders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(year(col("l_shipdate")).cast("long").as("yr"))
          .agg(
            count(lit(1)).as("n_items"),
            (Money.sumWideUnits(
              Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
              / 10000.0).as("revenue"))
      },
      Some(s"""
        WITH per_q AS (
          SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS yr,
                 CAST(quarter(l_shipdate) AS BIGINT) AS qtr, count(*) AS cnt
          FROM lineitem GROUP BY 1, 2, 3
        ),
        freq AS (
          SELECT l_partkey FROM per_q WHERE cnt >= 4
          GROUP BY l_partkey HAVING count(DISTINCT (yr*4) + qtr) >= 2
        ),
        best AS (
          SELECT o_custkey FROM (
            SELECT o_custkey,
                   ${Money.sumWideUnitsSql(Money.centsSql("o_totalprice"))} AS spend
            FROM orders GROUP BY 1)
          ORDER BY spend DESC, o_custkey LIMIT 50
        )
        SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
               count(*) AS n_items,
               ${Money.sumWideUnitsSql(
                 Money.discPriceUnitsSql("l_extendedprice", "l_discount")
               )} / 10000.0 AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey IN (SELECT l_partkey FROM freq)
          AND o.o_custkey IN (SELECT o_custkey FROM best)
        GROUP BY 1
      """)
    ),
    // TPC-DS Q51 shape PLUS a ranking layer — a window over the FULL
    // OUTER join of two cumulative aggregates, then a second rank
    // window over the joined output. Channels are the returnflag R/N
    // partitions of the fact (Q51's web/store fact pair), grain
    // (supplier, ship month): each channel aggregates to exact
    // long-cent month cells, takes a per-supplier running sum, the
    // two cumulative series FULL OUTER join on (supplier, month),
    // max-over-window forward-fills the channel that has no row that
    // month, months where cumulative returns exceed cumulative net
    // sales survive, and a row_number over the per-supplier gap keeps
    // the 3 widest months. All window inputs are exact integer units
    // carried in doubles, so every running sum, fill, comparison and
    // tie-break is engine-identical. Two shuffles (one per channel
    // grain) + the join; windows are per-supplier sequential scans.
    QueryDef(
      "q_flagship_ds_cumulative_rank",
      (s, dir) => {
        val t = tables(s, dir)
        def chan(flag: String, alias: String) = t.lineitem
          .filter(col("l_returnflag") === flag)
          .groupBy(col("l_suppkey"),
            date_trunc("month", col("l_shipdate")).as("mo"))
          .agg(Money.sumWideUnits(
            Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
            .as(alias))
        val w = Window.partitionBy(col("l_suppkey")).orderBy(col("mo"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ret = chan("R", "ru")
          .withColumn("ret_cum", sum(col("ru")).over(w))
          .select(col("l_suppkey"), col("mo"), col("ret_cum"))
        val net = chan("N", "nu")
          .withColumn("net_cum", sum(col("nu")).over(w))
          .select(col("l_suppkey"), col("mo"), col("net_cum"))
        val wr = Window.partitionBy(col("l_suppkey"))
          .orderBy((col("ret_fill") - col("net_fill")).desc, col("mo"))
        ret.join(net, Seq("l_suppkey", "mo"), "full_outer")
          .withColumn("ret_fill", max(col("ret_cum")).over(w))
          .withColumn("net_fill", max(col("net_cum")).over(w))
          .filter(col("ret_fill") > col("net_fill"))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk") <= 3)
          .select(col("l_suppkey"), col("mo"),
            (col("ret_fill") / 10000.0).as("ret_cum_rev"),
            (col("net_fill") / 10000.0).as("net_cum_rev"),
            col("rnk"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def chanCte(flag: String, cte: String, alias: String, cum: String) = s"""
        ${cte}_day AS (
          SELECT l_suppkey, date_trunc('month', l_shipdate) AS mo,
                 ${Money.sumWideUnitsSql(units)} AS $alias
          FROM lineitem WHERE l_returnflag = '$flag' GROUP BY 1, 2
        ),
        $cte AS (
          SELECT l_suppkey, mo,
                 sum($alias) OVER (PARTITION BY l_suppkey ORDER BY mo
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS $cum
          FROM ${cte}_day
        )"""
        s"""
        WITH ${chanCte("R", "ret", "ru", "ret_cum")},
        ${chanCte("N", "net", "nu", "net_cum")},
        j AS (
          SELECT coalesce(r.l_suppkey, n.l_suppkey) AS l_suppkey,
                 coalesce(r.mo, n.mo) AS mo, r.ret_cum, n.net_cum
          FROM ret r FULL OUTER JOIN net n
            ON r.l_suppkey = n.l_suppkey AND r.mo = n.mo
        ),
        f AS (
          SELECT l_suppkey, mo,
                 max(ret_cum) OVER (PARTITION BY l_suppkey ORDER BY mo
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ret_fill,
                 max(net_cum) OVER (PARTITION BY l_suppkey ORDER BY mo
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS net_fill
          FROM j
        ),
        g AS (
          SELECT l_suppkey, mo, ret_fill, net_fill,
                 CAST(row_number() OVER (PARTITION BY l_suppkey
                      ORDER BY ret_fill - net_fill DESC, mo) AS INT) AS rnk
          FROM f WHERE ret_fill > net_fill
        )
        SELECT l_suppkey, mo, ret_fill / 10000.0 AS ret_cum_rev,
               net_fill / 10000.0 AS net_cum_rev, rnk
        FROM g WHERE rnk <= 3
      """
      }
    ),
    // TPC-DS Q64 shape — two dated fact snapshots JOINED TO EACH OTHER
    // under a wide multi-dim enrichment: per-(part, supplier) revenue
    // + quantity aggregated separately for 1995 and 1996 (each branch
    // scans the fact once with its orderdate bracket pushed into the
    // ORDERS scan — the two-scans shape is Q64's mandatory plan, like
    // Q5's union; ds_crosssale's fused single-scan variant is the
    // rewrite, this is the join), the snapshots equi-join on the
    // compound key (co-partitioned: both sides shuffle on the same
    // (partkey, suppkey)), growth pairs survive, and part + supplier +
    // nation dims broadcast onto the survivors AFTER the fact-fact
    // join (dims enrich the small result, not the big input).
    QueryDef(
      "q_flagship_ds_two_snapshots",
      (s, dir) => {
        val t = tables(s, dir)
        def snap(y: Int) = t.lineitem
          .join(
            t.orders
              .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
                col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
              .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(
            Money.sumWideUnits(
              Money.discPriceUnits(col("l_extendedprice"), col("l_discount")))
              .as(s"units_$y"),
            sum(col("l_quantity").cast("long")).as(s"qty_$y"))
        snap(1995).join(snap(1996), Seq("l_partkey", "l_suppkey"))
          .filter(col("units_1996") > col("units_1995"))
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t.supplier.select(
            col("s_suppkey"), col("s_name"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("p_brand"), col("s_name"), col("n_name").as("nation"),
            col("l_partkey"), col("l_suppkey"),
            (col("units_1995") / 10000.0).as("rev_1995"),
            (col("units_1996") / 10000.0).as("rev_1996"),
            col("qty_1995"), col("qty_1996"),
            round(col("units_1996") / col("units_1995"), 6).as("growth"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def snapCte(y: Int) = s"""
        snap$y AS (
          SELECT l_partkey, l_suppkey,
                 ${Money.sumWideUnitsSql(units)} AS units_$y,
                 CAST(sum(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS qty_$y
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderdate >= TIMESTAMP '$y-01-01'
            AND o_orderdate <  TIMESTAMP '${y + 1}-01-01'
          GROUP BY 1, 2
        )"""
        s"""
        WITH ${snapCte(1995)},
        ${snapCte(1996)}
        SELECT p_brand, s_name, n_name AS nation,
               a.l_partkey, a.l_suppkey,
               units_1995 / 10000.0 AS rev_1995,
               units_1996 / 10000.0 AS rev_1996,
               qty_1995, qty_1996,
               round(units_1996 / units_1995, 6) AS growth
        FROM snap1995 a
        JOIN snap1996 b ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey
        JOIN part ON a.l_partkey = p_partkey
        JOIN supplier ON a.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE units_1996 > units_1995
      """
      }
    ),
    // TPC-DS Q11/Q74 shape — per-customer year-over-year growth RATIO
    // comparison across two channels: spend per (customer, year,
    // channel) for 1995/1996 with the high/low order-priority split as
    // the store/web channel pair, customers active in all four cells,
    // kept when the high-priority channel grew FASTER than the
    // low-priority one (the cross-ratio filter that makes Q11/Q74 more
    // than two YoY queries glued together). Spark-first plan: the four
    // cells are conditional long-cent sums inside ONE hash aggregate
    // over one bracket-pruned fact scan (Q74's four CTEs + three
    // self-joins collapse into a single shuffle on custkey), and the
    // customer dim broadcasts onto the few survivors. Both growth
    // ratios round to 6dp before the comparison so the keep/drop
    // decision is engine-identical.
    QueryDef(
      "q_flagship_ds_yoy_channels",
      (s, dir) => {
        val t = tables(s, dir)
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val yr = year(col("o_orderdate"))
        val cents = Money.cents(col("o_totalprice"))
        def cell(cond: Column, name: String) =
          Money.sumWideUnits(when(cond, cents).otherwise(lit(0L))).as(name)
        t.orders
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(
            cell(hi && yr === 1995, "hi95"),
            cell(hi && yr === 1996, "hi96"),
            cell(!hi && yr === 1995, "lo95"),
            cell(!hi && yr === 1996, "lo96"))
          .filter(col("hi95") > 0 && col("hi96") > 0 &&
            col("lo95") > 0 && col("lo96") > 0)
          .withColumn("hi_growth", round(col("hi96") / col("hi95"), 6))
          .withColumn("lo_growth", round(col("lo96") / col("lo95"), 6))
          .filter(col("hi_growth") > col("lo_growth"))
          .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"),
            (col("hi95") / 100.0).as("hi_1995"),
            (col("hi96") / 100.0).as("hi_1996"),
            (col("lo95") / 100.0).as("lo_1995"),
            (col("lo96") / 100.0).as("lo_1996"),
            col("hi_growth"), col("lo_growth"))
      },
      Some {
        val cents = Money.centsSql("o_totalprice")
        def cell(cond: String, name: String) =
          s"${Money.sumWideUnitsSql(s"CASE WHEN $cond THEN $cents ELSE 0 END")} AS $name"
        val hi = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
        s"""
        WITH cells AS (
          SELECT o_custkey,
                 ${cell(s"$hi AND year(o_orderdate) = 1995", "hi95")},
                 ${cell(s"$hi AND year(o_orderdate) = 1996", "hi96")},
                 ${cell(s"NOT ($hi) AND year(o_orderdate) = 1995", "lo95")},
                 ${cell(s"NOT ($hi) AND year(o_orderdate) = 1996", "lo96")}
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
          GROUP BY 1
        ),
        scored AS (
          SELECT o_custkey, hi95, hi96, lo95, lo96,
                 round(hi96 / hi95, 6) AS hi_growth,
                 round(lo96 / lo95, 6) AS lo_growth
          FROM cells
          WHERE hi95 > 0 AND hi96 > 0 AND lo95 > 0 AND lo96 > 0
        )
        SELECT c_custkey, c_name,
               hi95 / 100.0 AS hi_1995, hi96 / 100.0 AS hi_1996,
               lo95 / 100.0 AS lo_1995, lo96 / 100.0 AS lo_1996,
               hi_growth, lo_growth
        FROM scored JOIN customer ON o_custkey = c_custkey
        WHERE hi_growth > lo_growth
      """
      }
    ),
    // TPC-DS Q45 shape — a DISJUNCTION of a dim predicate and an
    // IN-subquery ("zip in list OR item in hot set"): the OR means
    // neither branch can filter alone, so Catalyst plans the subquery
    // as an ExistenceJoin (a semi join emitting an exists flag instead
    // of filtering) feeding the disjunctive filter — the one join
    // variant no other registered query exercises. SQL-text Spark side
    // (the DataFrame API cannot express OR-of-semi); the hot-part set
    // scales with |part| so its existence join shuffles, while the dim
    // chain rides broadcasts.
    QueryDef(
      "q_flagship_ds_or_semi",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem.createOrReplaceTempView("lineitem_orsemi")
        t.orders.createOrReplaceTempView("orders_orsemi")
        t.supplier.createOrReplaceTempView("supplier_orsemi")
        t.nation.createOrReplaceTempView("nation_orsemi")
        val revenue = Money.sumWideUnitsSqlSpark(
          Money.discPriceUnitsSql("l.l_extendedprice", "l.l_discount")) +
          " / 10000.0"
        s.sql(s"""
          WITH hotparts AS (
            SELECT l_partkey FROM lineitem_orsemi
            GROUP BY l_partkey HAVING count(*) >= 12
          )
          SELECT n.n_name AS nation,
                 CAST(year(o.o_orderdate) AS BIGINT) AS yr,
                 count(*) AS n_lines,
                 $revenue AS revenue
          FROM lineitem_orsemi l
          JOIN orders_orsemi o ON l.l_orderkey = o.o_orderkey
          JOIN supplier_orsemi s ON l.l_suppkey = s.s_suppkey
          JOIN nation_orsemi n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_name IN ('FRANCE', 'GERMANY')
             OR l.l_partkey IN (SELECT l_partkey FROM hotparts)
          GROUP BY 1, 2
        """)
      },
      Some(s"""
        WITH hotparts AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING count(*) >= 12
        )
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS yr,
               count(*) AS n_lines,
               ${Money.sumWideUnitsSql(
                 Money.discPriceUnitsSql("l.l_extendedprice", "l.l_discount")
               )} / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('FRANCE', 'GERMANY')
           OR l.l_partkey IN (SELECT l_partkey FROM hotparts)
        GROUP BY 1, 2
      """)
    ),
    // TPC-DS Q59 shape — a JOIN OF TWO PIVOTED AGGREGATES: weekly (here
    // monthly) revenue spread across day-of-week columns per supplier,
    // one pivot per year, the two pivots self-joined on (supplier,
    // month-of-year) and compared column by column. Each pivot is ONE
    // hash aggregate with 7 conditional long-cent sums over a
    // bracket-pruned scan; the join keys are (suppkey, month) so both
    // pivots shuffle on the same compound key. Per-day comparisons are
    // exact integer DIFFS (a ratio would hit empty 0-cells and emit
    // NULL/NaN floats — the one thing the bit-exact float hash cannot
    // absorb); the single total ratio is guarded by the both-positive
    // filter. Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6,
    // so the oracle maps dayofweek(x)+1.
    QueryDef(
      "q_flagship_ds_week_pivot_yoy",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        def pivotYear(y: Int) = {
          val cells = (1 to 7).map { d =>
            Money.sumWideUnits(
              when(dayofweek(col("l_shipdate")) === d, units).otherwise(lit(0L)))
              .as(s"rev${y}_d$d")
          }
          val tot = Money.sumWideUnits(units).as(s"tot_$y")
          t.lineitem
            .filter(col("l_shipdate") >= lit(s"$y-01-01").cast("timestamp") &&
              col("l_shipdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
            .groupBy(col("l_suppkey"), month(col("l_shipdate")).cast("long").as("mo"))
            .agg(cells.head, cells.tail :+ tot: _*)
        }
        val diffs = (1 to 7).map(d =>
          ((col(s"rev1996_d$d") - col(s"rev1995_d$d")) / 10000.0).as(s"diff_d$d"))
        pivotYear(1995).join(pivotYear(1996), Seq("l_suppkey", "mo"))
          .filter(col("tot_1995") > 0 && col("tot_1996") > 0)
          .select(col("l_suppkey") +: col("mo") +: diffs :+
            round(col("tot_1996") / col("tot_1995"), 6).as("tot_growth"): _*)
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def pivotCte(y: Int) = {
          val cells = (1 to 7).map { d =>
            val cond = s"CASE WHEN dayofweek(l_shipdate) + 1 = $d THEN $units ELSE 0 END"
            s"${Money.sumWideUnitsSql(cond)} AS rev${y}_d$d"
          }.mkString(",\n                 ")
          s"""
        piv$y AS (
          SELECT l_suppkey, CAST(month(l_shipdate) AS BIGINT) AS mo,
                 $cells,
                 ${Money.sumWideUnitsSql(units)} AS tot_$y
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '$y-01-01'
            AND l_shipdate <  TIMESTAMP '${y + 1}-01-01'
          GROUP BY 1, 2
        )"""
        }
        val diffs = (1 to 7)
          .map(d => s"(rev1996_d$d - rev1995_d$d) / 10000.0 AS diff_d$d")
          .mkString(",\n               ")
        s"""
        WITH ${pivotCte(1995)},
        ${pivotCte(1996)}
        SELECT a.l_suppkey, a.mo,
               $diffs,
               round(tot_1996 / tot_1995, 6) AS tot_growth
        FROM piv1995 a JOIN piv1996 b
          ON a.l_suppkey = b.l_suppkey AND a.mo = b.mo
        WHERE tot_1995 > 0 AND tot_1996 > 0
      """
      }
    ),
    // TPC-DS Q31 shape — a THREE-QUARTER CHAIN of self-joins with a
    // dual-channel ratio filter: per (nation, 1995-quarter) exact cent
    // sums for the returned (R) and net (N) channels in ONE aggregate
    // (conditional cells — the fact is scanned once, not once per
    // channel), then the quarter table self-joins into a q→q+1→q+2
    // chain per nation, and only nations whose RETURNS grew faster
    // than net sales across BOTH steps survive. Ratios round to 6dp
    // before comparison; denominators are guarded positive so no
    // NULL/NaN floats reach the output. The cells table (|nation| × 4
    // rows) is cached so the chain's three references cost one fact
    // scan, and the q2/q3 sides are small enough to broadcast.
    QueryDef(
      "q_flagship_ds_quarter_chain",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val cells = graft.CacheScope.cached(t.lineitem
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), quarter(col("l_shipdate")).cast("long").as("qtr"))
          .agg(
            Money.sumWideUnits(
              when(col("l_returnflag") === "R", units).otherwise(lit(0L))).as("r_units"),
            Money.sumWideUnits(
              when(col("l_returnflag") === "N", units).otherwise(lit(0L))).as("n_units")))
        def q(i: Int) = cells
          .filter(col("qtr") === i)
          .select(col("n_name"),
            col("r_units").as(s"r$i"), col("n_units").as(s"n$i"))
        q(1).join(q(2), Seq("n_name")).join(q(3), Seq("n_name"))
          .filter(col("r1") > 0 && col("r2") > 0 &&
            col("n1") > 0 && col("n2") > 0 && col("n3") > 0)
          .withColumn("r_g12", round(col("r2") / col("r1"), 6))
          .withColumn("n_g12", round(col("n2") / col("n1"), 6))
          .withColumn("r_g23", round(col("r3") / col("r2"), 6))
          .withColumn("n_g23", round(col("n3") / col("n2"), 6))
          .filter(col("r_g12") > col("n_g12") && col("r_g23") > col("n_g23"))
          .select(col("n_name").as("nation"),
            col("r_g12"), col("n_g12"), col("r_g23"), col("n_g23"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def cell(flag: String, name: String) =
          s"${Money.sumWideUnitsSql(
            s"CASE WHEN l_returnflag = '$flag' THEN $units ELSE 0 END")} AS $name"
        s"""
        WITH cells AS (
          SELECT n_name, CAST(quarter(l_shipdate) AS BIGINT) AS qtr,
                 ${cell("R", "r_units")},
                 ${cell("N", "n_units")}
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate <  TIMESTAMP '1996-01-01'
          GROUP BY 1, 2
        ),
        chained AS (
          SELECT q1.n_name,
                 q1.r_units AS r1, q1.n_units AS n1,
                 q2.r_units AS r2, q2.n_units AS n2,
                 q3.r_units AS r3, q3.n_units AS n3
          FROM cells q1
          JOIN cells q2 ON q1.n_name = q2.n_name AND q2.qtr = 2
          JOIN cells q3 ON q1.n_name = q3.n_name AND q3.qtr = 3
          WHERE q1.qtr = 1
        ),
        scored AS (
          SELECT n_name,
                 round(r2 / r1, 6) AS r_g12, round(n2 / n1, 6) AS n_g12,
                 round(r3 / r2, 6) AS r_g23, round(n3 / n2, 6) AS n_g23
          FROM chained
          WHERE r1 > 0 AND r2 > 0 AND n1 > 0 AND n2 > 0 AND n3 > 0
        )
        SELECT n_name AS nation, r_g12, n_g12, r_g23, n_g23
        FROM scored
        WHERE r_g12 > n_g12 AND r_g23 > n_g23
      """
      }
    ),
    // TPC-DS Q16 shape — DUAL group quantifier: orders shipped from at
    // least TWO distinct suppliers (existential, Q16's "exists another
    // warehouse") with ZERO returned lines (the negated quantifier,
    // Q16's "not exists returns"), both folded into ONE aggregate over
    // the bracketed fact (count distinct + conditional count as group
    // HAVING — no per-order subquery, no self-join, no anti join), then
    // a census per order priority with the exact order totals. The
    // complement of ds_single_supplier's universal quantifier (== 1).
    QueryDef(
      "q_flagship_ds_multi_supplier_clean",
      (s, dir) => {
        val t = tables(s, dir)
        val perOrder = t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_orderkey"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            count(when(col("l_returnflag") === "R", lit(1))).as("n_returned"))
          .filter(col("n_supp") >= 2 && col("n_returned") === 0)
        perOrder
          .join(t.orders.select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice")), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(
            count(lit(1)).as("n_orders"),
            Money.sumPrice(col("o_totalprice")).as("total"))
      },
      Some(s"""
        WITH per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_orderkey
        )
        SELECT o_orderpriority AS priority,
               count(*) AS n_orders,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM per_order JOIN orders ON l_orderkey = o_orderkey
        WHERE n_supp >= 2 AND n_returned = 0
        GROUP BY 1
      """)
    ),
    // TPC-DS Q36/Q70/Q86 shape — RANK WINDOW PARTITIONED BY GROUPING
    // LEVEL over a ROLLUP: return-margin per (nation, segment) rolled
    // up with subtotals, then rank() partitioned by (grouping level,
    // parent key) — segments rank within their nation, nation
    // subtotals rank against each other, the grand total ranks alone
    // (Q36's `PARTITION BY lochierarchy, CASE WHEN GROUPING(class)=0
    // THEN category END`). The margin is a ratio of exact long-cent
    // conditional sums rounded to 6dp before ranking, so rank ties
    // land identically in both engines (and rank(), not row_number,
    // keeps ties order-independent). One fact scan; the rollup's
    // Expand and the rank shuffle both run on post-aggregate rows.
    QueryDef(
      "q_flagship_ds_rollup_rank",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val cells = t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(
            grouping_id().cast("long").as("gid"),
            Money.sumWideUnits(
              when(col("l_returnflag") === "R", units).otherwise(lit(0L)))
              .as("r_units"),
            Money.sumWideUnits(units).as("t_units"))
          .withColumn("margin", round(col("r_units") / col("t_units"), 6))
        val w = Window
          .partitionBy(col("gid"),
            when(col("gid") === 0, col("n_name")).otherwise(lit("ALL")))
          .orderBy(col("margin").desc)
        cells
          .withColumn("rnk", rank().over(w))
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("gid"), col("margin"), col("rnk"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH cells AS (
          SELECT n_name, c_mktsegment,
                 GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS gid_i,
                 ${Money.sumWideUnitsSql(
                   s"CASE WHEN l_returnflag = 'R' THEN $units ELSE 0 END")} AS r_units,
                 ${Money.sumWideUnitsSql(units)} AS t_units
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY ROLLUP(n_name, c_mktsegment)
        ),
        scored AS (
          SELECT coalesce(n_name, 'ALL') AS nation,
                 coalesce(c_mktsegment, 'ALL') AS segment,
                 CAST(gid_i AS BIGINT) AS gid,
                 round(r_units / t_units, 6) AS margin,
                 CASE WHEN gid_i = 0 THEN n_name ELSE 'ALL' END AS pkey
          FROM cells
        )
        SELECT nation, segment, gid, margin,
               CAST(rank() OVER (PARTITION BY gid, pkey
                    ORDER BY margin DESC) AS INT) AS rnk
        FROM scored
      """
      }
    ),
    // TPC-DS Q78 shape — LEFT join of two channel aggregates with a
    // NULL-extended disjunctive filter: per-part net-sales (N) totals
    // left-joined to returned (R) totals, keeping parts with NO return
    // row at all OR net sales more than double the returns — the
    // "customer bought, never returned, or returns are dwarfed"
    // pattern where the null branch IS part of the predicate (an inner
    // join or a ratio would silently drop exactly the most interesting
    // rows). Both aggregates shuffle on the same part key; the part
    // dim broadcasts onto the survivors. No division anywhere near a
    // NULL: the returns side surfaces as a coalesced exact value plus
    // an explicit no_returns flag.
    QueryDef(
      "q_flagship_ds_channel_gap",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        def chan(flag: String, pfx: String) = t.lineitem
          .filter(col("l_returnflag") === flag)
          .groupBy(col("l_partkey"))
          .agg(Money.sumWideUnits(units).as(s"${pfx}_units"),
            count(lit(1)).as(s"${pfx}_lines"))
        chan("N", "n")
          .join(chan("R", "r"), Seq("l_partkey"), "left_outer")
          .filter(col("r_units").isNull || col("n_units") > col("r_units") * 2)
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_partkey"),
            (col("n_units") / 10000.0).as("net_rev"),
            (coalesce(col("r_units"), lit(0.0)) / 10000.0).as("ret_rev"),
            col("n_lines"),
            coalesce(col("r_lines"), lit(0L)).as("r_lines"),
            col("r_units").isNull.as("no_returns"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        def chanCte(flag: String, pfx: String) = s"""
        chan_$pfx AS (
          SELECT l_partkey, ${Money.sumWideUnitsSql(units)} AS ${pfx}_units,
                 count(*) AS ${pfx}_lines
          FROM lineitem WHERE l_returnflag = '$flag' GROUP BY 1
        )"""
        s"""
        WITH ${chanCte("N", "n")},
        ${chanCte("R", "r")}
        SELECT p_brand, a.l_partkey,
               n_units / 10000.0 AS net_rev,
               coalesce(r_units, CAST(0 AS DOUBLE)) / 10000.0 AS ret_rev,
               n_lines,
               coalesce(r_lines, 0) AS r_lines,
               r_units IS NULL AS no_returns
        FROM chan_n a
        LEFT JOIN chan_r b ON a.l_partkey = b.l_partkey
        JOIN part ON a.l_partkey = p_partkey
        WHERE r_units IS NULL OR n_units > 2 * r_units
      """
      }
    ),
    // TPC-DS Q44 shape — TWO OPPOSITE-DIRECTION GLOBAL RANKINGS JOINED
    // ON THE RANK POSITION: suppliers ranked best-first (lowest return
    // margin) and worst-first (highest), the two top-10 lists zipped on
    // the rank index so each row pairs rank i's best with rank i's
    // worst. A naive Q44 is two partitionless OVER (ORDER BY) windows —
    // a single-task funnel PlanAudit rejects; both rankings here run
    // through DistributedRank.globalRank (range-repartition + local
    // rank + broadcast offsets — every stage parallel, the same
    // operator the hybrid-RRF retrieval fuses two rankings with).
    // Margins are 6dp-rounded ratios of exact long-cent sums with a
    // suppkey tiebreak, so both engines rank identical values in an
    // identical total order.
    QueryDef(
      "q_flagship_ds_rank_pair",
      (s, dir) => {
        import graft.plans.DistributedRank
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        // cached: both globalRank passes (best-first and worst-first)
        // consume this aggregate — without the cache each ranking
        // would re-scan and re-aggregate the whole fact
        val base = graft.CacheScope.cached(t.lineitem
          .groupBy(col("l_suppkey"))
          .agg(
            Money.sumWideUnits(
              when(col("l_returnflag") === "R", units).otherwise(lit(0L)))
              .as("r_units"),
            Money.sumWideUnits(units).as("t_units"))
          .withColumn("margin", round(col("r_units") / col("t_units"), 6))
          .select(col("l_suppkey"), col("margin")))
        // r21 optimization (guide §2.4): only the top-10 of each
        // direction is consumed, so each side is a TakeOrderedAndProject
        // (per-partition top-10 + constant-size merge) over the cached
        // aggregate instead of a FULL range-repartition + count pass +
        // window per direction. globalRank then numbers just those 10
        // rows — same rnk values/types (the 10 rows ARE the global
        // top-10 in the same total order), every stage parallel.
        val (best, _) = DistributedRank.globalRank(
          base.orderBy(col("margin").asc, col("l_suppkey").asc).limit(10),
          "rnk", col("margin").asc, col("l_suppkey").asc)
        val (worst, _) = DistributedRank.globalRank(
          base.orderBy(col("margin").desc, col("l_suppkey").asc).limit(10),
          "rnk", col("margin").desc, col("l_suppkey").asc)
        best.filter(col("rnk") <= 10)
          .select(col("rnk"),
            col("l_suppkey").as("best_suppkey"), col("margin").as("best_margin"))
          .join(
            worst.filter(col("rnk") <= 10)
              .select(col("rnk"),
                col("l_suppkey").as("worst_suppkey"),
                col("margin").as("worst_margin")),
            Seq("rnk"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH base AS (
          SELECT l_suppkey,
                 round(${Money.sumWideUnitsSql(
                   s"CASE WHEN l_returnflag = 'R' THEN $units ELSE 0 END")}
                       / ${Money.sumWideUnitsSql(units)}, 6) AS margin
          FROM lineitem GROUP BY 1
        ),
        best AS (
          SELECT CAST(row_number() OVER (ORDER BY margin ASC, l_suppkey ASC)
                 AS BIGINT) AS rnk,
                 l_suppkey AS best_suppkey, margin AS best_margin
          FROM base
        ),
        worst AS (
          SELECT CAST(row_number() OVER (ORDER BY margin DESC, l_suppkey ASC)
                 AS BIGINT) AS rnk,
                 l_suppkey AS worst_suppkey, margin AS worst_margin
          FROM base
        )
        SELECT b.rnk, best_suppkey, best_margin, worst_suppkey, worst_margin
        FROM best b JOIN worst w ON b.rnk = w.rnk
        WHERE b.rnk <= 10
      """
      }
    ),
    // TPC-DS Q72 shape — DATE-BANDED INEQUALITY FACT-FACT JOIN under
    // dims: for every returned line ("demand"), the non-returned
    // shipments of the SAME part that shipped within the following 30
    // days ("supply" — the inventory restock emulation; this testdata's
    // lineitem has no commit/receipt dates, so the two fact roles are
    // returnflag slices of one fact). The join predicate class is the
    // one nothing else registered exercises: an equi key (partkey)
    // PLUS a row-level date-band inequality between two FACT tables —
    // not a band of two aggregates (ds_band_join) and not a binned
    // range join (q_join_range_binned). Catalyst extracts the equi
    // conjunct, so the plan is a sort-merge join SHUFFLED ON PARTKEY
    // with the band as the join residual — per-key pair work is
    // (lines-per-part)^2 x band-fraction, flat as data scales with
    // part cardinality, never an all-pairs cross. Both returnflag
    // slices and the p_size dim cut reach their scans as pushed
    // filters; the part dim broadcasts. Lag total is an exact integer
    // day sum; the demand-line count is a distinct count on the
    // (orderkey, linenumber) line id folded into one BIGINT.
    QueryDef(
      "q_flagship_ds_restock_lag",
      (s, dir) => {
        val t = tables(s, dir)
        // r22 (guide §3.2: reduce the big side BEFORE shuffling it):
        // the p_size <= 25 dim cut used to apply AFTER the band join,
        // so both fact slices shuffled and band-paired rows whose part
        // the dim join would drop anyway. p_partkey is unique (part
        // pk), so attaching the dim to demand (inner, no duplication)
        // and semi-filtering supply on the same broadcast key set
        // before the band join keeps the output row set identical
        // while cutting BOTH band-join inputs by the dim selectivity —
        // the per-key pair work falls quadratically in it.
        val pdim = t.part
          .filter(col("p_size") <= 25)
          .select(col("p_partkey"), col("p_brand"))
        val demand = t.lineitem
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("d_orderkey"),
            col("l_linenumber").as("d_linenumber"),
            col("l_partkey").as("d_partkey"),
            col("l_shipdate").as("d_shipdate"))
          .join(broadcast(pdim), col("d_partkey") === col("p_partkey"))
        val supply = t.lineitem
          .filter(col("l_returnflag") =!= "R")
          .select(col("l_partkey").as("s_partkey"),
            col("l_shipdate").as("s_shipdate"))
          .join(broadcast(pdim.select(col("p_partkey"))),
            col("s_partkey") === col("p_partkey"), "left_semi")
        demand
          .join(supply,
            col("d_partkey") === col("s_partkey") &&
              col("s_shipdate") > col("d_shipdate") &&
              col("s_shipdate") <= col("d_shipdate") + expr("INTERVAL 30 DAYS"))
          .groupBy(col("p_brand"), year(col("d_shipdate")).cast("long").as("yr"))
          .agg(
            count(lit(1)).as("n_pairs"),
            countDistinct(col("d_orderkey") * 10 + col("d_linenumber"))
              .as("n_demand"),
            sum(datediff(col("s_shipdate"), col("d_shipdate")).cast("long"))
              .as("lag_days"))
      },
      Some("""
        WITH demand AS (
          SELECT l_orderkey AS d_orderkey, l_linenumber AS d_linenumber,
                 l_partkey AS d_partkey, l_shipdate AS d_shipdate
          FROM lineitem WHERE l_returnflag = 'R'
        ),
        supply AS (
          SELECT l_partkey AS s_partkey, l_shipdate AS s_shipdate
          FROM lineitem WHERE l_returnflag != 'R'
        )
        SELECT p_brand, CAST(year(d_shipdate) AS BIGINT) AS yr,
               count(*) AS n_pairs,
               CAST(count(DISTINCT d_orderkey * 10 + d_linenumber) AS BIGINT)
                 AS n_demand,
               CAST(sum(date_diff('day', d_shipdate, s_shipdate)) AS BIGINT)
                 AS lag_days
        FROM demand
        JOIN supply ON d_partkey = s_partkey
          AND s_shipdate > d_shipdate
          AND s_shipdate <= d_shipdate + INTERVAL 30 DAY
        JOIN part ON d_partkey = p_partkey
        WHERE p_size <= 25
        GROUP BY 1, 2
      """)
    ),
    // TPC-DS Q2/Q59 shape — PERIOD-SHIFT SELF-JOIN: weekly revenue per
    // supplier, the aggregate joined TO ITSELF on an ARITHMETIC OFFSET
    // of the join key (week w vs week w+53 — Q2's literal "WEEK_SEQ +
    // 53" next-year alignment), keeping the x2 movers. Distinct from
    // ds_week_pivot_yoy, which joins two separately-bracketed pivots
    // on an unshifted compound key: here ONE unbracketed aggregate is
    // computed once (cached — both join sides consume it), and the
    // offset lives in the join key itself. The aggregate shuffles on
    // (suppkey, wk); re-keying one side to wk-53 forces exactly one
    // more hash exchange of the (small) aggregate, never a second
    // fact scan. The mover cut is an exact-integer x2 band on the
    // wide-sum units (order-independent), and the result closes with
    // a per-supplier rollup of the mover weeks (counts by direction +
    // the 6dp-rounded extreme ratio) — the row-level mover set is
    // supplier x weeks (~1M rows at sf1, growing with both axes), and
    // a scale-honest query never ships that as the artifact when the
    // question is per-supplier. Supplier dim broadcasts onto the
    // rollup; the week index is a floor-division day count from the
    // corpus epoch (non-negative, so DuckDB's truncating // equals
    // floor).
    QueryDef(
      "q_flagship_ds_week_shift",
      (s, dir) => {
        val t = tables(s, dir)
        val units =
          Money.discPriceUnits(col("l_extendedprice"), col("l_discount"))
        val wk = floor(
          datediff(col("l_shipdate"), lit("1995-01-02").cast("date")) / 7)
          .cast("long")
        val base = graft.CacheScope.cached(t.lineitem
          .groupBy(col("l_suppkey"), wk.as("wk"))
          .agg(Money.sumWideUnits(units).as("u")))
        val shifted = base.select(col("l_suppkey"),
          (col("wk") - 53).as("wk"), col("u").as("u_next"))
        base.join(shifted, Seq("l_suppkey", "wk"))
          .filter(col("u_next") > col("u") * 2 || col("u_next") * 2 < col("u"))
          .groupBy(col("l_suppkey"))
          .agg(
            count(lit(1)).as("n_movers"),
            sum(when(col("u_next") > col("u") * 2, 1L).otherwise(0L))
              .as("n_up"),
            sum(when(col("u_next") * 2 < col("u"), 1L).otherwise(0L))
              .as("n_down"),
            max(round(col("u_next") / col("u"), 6)).as("top_ratio"))
          .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("n_movers"), col("n_up"),
            col("n_down"), col("top_ratio"))
      },
      Some {
        val units = Money.discPriceUnitsSql("l_extendedprice", "l_discount")
        s"""
        WITH base AS (
          -- floor(), not `//`: DuckDB's // truncates toward zero, which
          -- agrees with Spark's floor() only for non-negative day
          -- counts — a fixture with dates before the 1995-01-02 epoch
          -- would silently shift its negative weeks by one
          SELECT l_suppkey,
                 CAST(floor(CAST(date_diff('day', DATE '1995-01-02', l_shipdate)
                      AS DOUBLE) / 7) AS BIGINT) AS wk,
                 ${Money.sumWideUnitsSql(units)} AS u
          FROM lineitem GROUP BY 1, 2
        )
        , movers AS (
          SELECT a.l_suppkey, a.u AS u, b.u AS u_next
          FROM base a
          JOIN base b ON a.l_suppkey = b.l_suppkey AND a.wk + 53 = b.wk
          WHERE b.u > 2 * a.u OR 2 * b.u < a.u
        )
        SELECT s_name,
               count(*) AS n_movers,
               CAST(sum(CASE WHEN u_next > 2 * u THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_up,
               CAST(sum(CASE WHEN 2 * u_next < u THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_down,
               max(round(u_next / u, 6)) AS top_ratio
        FROM movers JOIN supplier ON l_suppkey = s_suppkey
        -- group by the KEY, not the name: the Spark side aggregates per
        -- l_suppkey and only then joins the name on, and s_name is NOT
        -- unique in the scaled fixtures (sf1 carries 10000 suppkeys
        -- over 1000 distinct names) — grouping by name alone would
        -- collapse 10 suppliers into one row
        GROUP BY l_suppkey, s_name
      """
      }
    ),
    // TPC-DS Q4 shape — THREE-CHANNEL RATIO-OF-RATIOS: the 6-cell
    // extension of ds_yoy_channels (which stops at 2 channels x 2
    // years). Three order-priority channels x two years = six
    // conditional wide-sums inside ONE hash aggregate over one
    // bracket-pruned scan (Q4's six CTEs + five self-joins collapse
    // into a single shuffle), cohorts kept only when present in all
    // six cells, surviving when BOTH the high- and mid-priority
    // channels grew faster than the low-priority one — the
    // two-inequality ratio-of-ratios cut that makes Q4 more than Q11
    // with an extra column. Cohort grain is (nation, segment) rather
    // than Q4's per-customer: at the test SFs a customer with all six
    // cells populated is nearly nonexistent (1 survivor at sf0.01), so
    // the per-customer oracle would be vacuous; the cohort keeps every
    // cell dense while preserving the identical plan shape. Both
    // growth ratios round to 6dp before comparison so the keep/drop
    // decision is engine-identical; customer and nation dims ride
    // broadcasts on either side of the aggregate.
    QueryDef(
      "q_flagship_ds_tri_channel_growth",
      (s, dir) => {
        val t = tables(s, dir)
        val cents = Money.cents(col("o_totalprice"))
        val yr = year(col("o_orderdate"))
        val chHi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val chMid = col("o_orderpriority") === "3-MEDIUM"
        val chLo = col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
        def cell(cond: Column, name: String) =
          Money.sumWideUnits(when(cond, cents).otherwise(lit(0L))).as(name)
        t.orders
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(t.customer.select(
              col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(
            cell(chHi && yr === 1995, "hi95"), cell(chHi && yr === 1996, "hi96"),
            cell(chMid && yr === 1995, "mid95"), cell(chMid && yr === 1996, "mid96"),
            cell(chLo && yr === 1995, "lo95"), cell(chLo && yr === 1996, "lo96"))
          .filter(col("hi95") > 0 && col("hi96") > 0 && col("mid95") > 0 &&
            col("mid96") > 0 && col("lo95") > 0 && col("lo96") > 0)
          .withColumn("growth_hi", round(col("hi96") / col("hi95"), 6))
          .withColumn("growth_mid", round(col("mid96") / col("mid95"), 6))
          .withColumn("growth_lo", round(col("lo96") / col("lo95"), 6))
          .filter(col("growth_hi") > col("growth_lo") &&
            col("growth_mid") > col("growth_lo"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("c_mktsegment"),
            (col("hi95") / 100.0).as("hi_1995"),
            (col("hi96") / 100.0).as("hi_1996"),
            (col("mid95") / 100.0).as("mid_1995"),
            (col("mid96") / 100.0).as("mid_1996"),
            (col("lo95") / 100.0).as("lo_1995"),
            (col("lo96") / 100.0).as("lo_1996"),
            col("growth_hi"), col("growth_mid"), col("growth_lo"))
      },
      Some {
        val cents = Money.centsSql("o_totalprice")
        def cell(cond: String, name: String) =
          s"${Money.sumWideUnitsSql(s"CASE WHEN $cond THEN $cents ELSE 0 END")} AS $name"
        val hi = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
        val mid = "o_orderpriority = '3-MEDIUM'"
        val lo = "o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')"
        s"""
        WITH cells AS (
          SELECT c_nationkey, c_mktsegment,
                 ${cell(s"$hi AND year(o_orderdate) = 1995", "hi95")},
                 ${cell(s"$hi AND year(o_orderdate) = 1996", "hi96")},
                 ${cell(s"$mid AND year(o_orderdate) = 1995", "mid95")},
                 ${cell(s"$mid AND year(o_orderdate) = 1996", "mid96")},
                 ${cell(s"$lo AND year(o_orderdate) = 1995", "lo95")},
                 ${cell(s"$lo AND year(o_orderdate) = 1996", "lo96")}
          FROM orders JOIN customer ON o_custkey = c_custkey
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT *,
                 round(hi96 / hi95, 6) AS growth_hi,
                 round(mid96 / mid95, 6) AS growth_mid,
                 round(lo96 / lo95, 6) AS growth_lo
          FROM cells
          WHERE hi95 > 0 AND hi96 > 0 AND mid95 > 0
            AND mid96 > 0 AND lo95 > 0 AND lo96 > 0
        )
        SELECT n_name, c_mktsegment,
               hi95 / 100.0 AS hi_1995, hi96 / 100.0 AS hi_1996,
               mid95 / 100.0 AS mid_1995, mid96 / 100.0 AS mid_1996,
               lo95 / 100.0 AS lo_1995, lo96 / 100.0 AS lo_1996,
               growth_hi, growth_mid, growth_lo
        FROM scored JOIN nation ON c_nationkey = n_nationkey
        WHERE growth_hi > growth_lo AND growth_mid > growth_lo
      """
      }
    ),
    // TPC-DS Q6 shape — CORRELATED AVERAGE PER CATEGORY + HAVING
    // COUNT: parts priced at least 5% above the average retail price
    // of THEIR OWN type (Q6's "1.2 * avg price of same-category
    // items"; this testdata's prices are uniform within ~10% of the
    // type mean, so 1.2x selects nothing — 1.05x keeps ~2.5% of parts
    // and the correlated cut stays load-bearing), then the nations
    // whose customers bought those pricey parts, kept only above a
    // purchase-count floor (Q6's HAVING cnt >= 10, by nation as the
    // state analog). The correlated subquery is decorrelated
    // Spark-first: the 6-row per-type stats aggregate broadcasts back
    // onto the part scan, and the price-vs-average comparison runs in
    // EXACT integer cents cross-multiplied (cents*n*20 > sum*21), so
    // no float average ever decides membership. The pricey key set
    // broadcasts onto the fact scan (part-scaled: a few % of |part| —
    // at extreme scale AQE would shuffle this semi instead), the
    // orderdate bracket reaches the orders scan, and customer/nation
    // dims broadcast above the fact-fact sort-merge join.
    QueryDef(
      "q_flagship_ds_pricey_type_census",
      (s, dir) => {
        val t = tables(s, dir)
        val pcents = Money.cents(col("p_retailprice"))
        val typeStats = t.part.groupBy(col("p_type"))
          .agg(sum(pcents).as("sc"), count(lit(1)).as("nc"))
        val pricey = t.part
          .select(col("p_partkey"), col("p_type"), pcents.as("pc"))
          .join(broadcast(typeStats), Seq("p_type"))
          .filter(col("pc") * col("nc") * 20 > col("sc") * 21)
          .select(col("p_partkey"))
        t.lineitem
          .join(broadcast(pricey), col("l_partkey") === col("p_partkey"))
          .join(t.orders
              .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_purchases"),
            countDistinct(col("o_custkey")).as("n_customers"),
            Money.sumDiscPrice(col("l_extendedprice"), col("l_discount"))
              .as("revenue"))
          .filter(col("n_purchases") >= 30)
      },
      Some(s"""
        WITH type_stats AS (
          SELECT p_type,
                 CAST(sum(${Money.centsSql("p_retailprice")}) AS BIGINT) AS sc,
                 count(*) AS nc
          FROM part GROUP BY 1
        ),
        pricey AS (
          SELECT p_partkey FROM part JOIN type_stats USING (p_type)
          WHERE ${Money.centsSql("p_retailprice")} * nc * 20 > sc * 21
        )
        SELECT n_name, count(*) AS n_purchases,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               ${Money.sumDiscPriceSql("l_extendedprice", "l_discount")} AS revenue
        FROM lineitem
        JOIN pricey ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY 1 HAVING count(*) >= 30
      """)
    ),
    // TPC-DS Q47/Q57 shape — RANK OVER A DERIVED DEVIATION OVER A
    // PARTITION AGGREGATE: q_flagship_ds_deviation keeps the months
    // that stray >20% from their brand-year mean; this closes the
    // family's last uncovered OVER combination by RANKING each
    // brand-year's months by |deviation from the year mean| and
    // keeping the top 2 — Q47's "rank months by deviation from the
    // yearly average within (brand)". Distinct from
    // q_flagship_ds_cumulative_rank, which ranks by a difference of
    // two cumulative window sums; here the rank input is a deviation
    // from a whole-partition aggregate. The keep/drop decision is
    // exact: the deviation is compared as |units*cnt - total| (integer
    // cross-multiplication, no float mean ever ordered on), with the
    // month as tie-break, so the row_number is engine-identical. One
    // fact scan, one shuffle on (brand) — the two window functions and
    // the rank share the same partitioning — and the part dim rides a
    // broadcast.
    QueryDef(
      "q_flagship_ds_deviation_rank",
      (s, dir) => {
        val t = tables(s, dir)
        val monthly = t.lineitem
          .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"),
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(Money.sumWideUnits(Money.cents(col("l_extendedprice"))).as("units"))
        val wYear = Window.partitionBy(col("p_brand"), col("yr"))
        val wRank = Window.partitionBy(col("p_brand"), col("yr"))
          .orderBy(col("dev").desc, col("mo"))
        monthly
          .withColumn("total", sum(col("units")).over(wYear))
          .withColumn("cnt", count(lit(1)).over(wYear))
          .withColumn("dev", abs(col("units") * col("cnt") - col("total")))
          .withColumn("rnk", row_number().over(wRank))
          .filter(col("rnk") <= 2)
          .select(col("p_brand"), col("yr"), col("mo"),
            (col("units") / 100.0).as("revenue"),
            round(col("units") * col("cnt") / col("total"), 6).as("ratio"),
            col("rnk"))
      },
      Some(s"""
        WITH monthly AS (
          SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mo,
                 ${Money.sumWideUnitsSql(Money.centsSql("l_extendedprice"))} AS units
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2, 3
        ), scored AS (
          SELECT p_brand, yr, mo, units,
                 CAST(sum(units) OVER (PARTITION BY p_brand, yr) AS BIGINT) AS total,
                 count(*) OVER (PARTITION BY p_brand, yr) AS cnt
          FROM monthly
        ), ranked AS (
          SELECT p_brand, yr, mo, units, cnt, total,
                 CAST(row_number() OVER (PARTITION BY p_brand, yr
                      ORDER BY abs(units * cnt - total) DESC, mo) AS INT) AS rnk
          FROM scored
        )
        SELECT p_brand, yr, mo, units / 100.0 AS revenue,
               round(units * cnt / total, 6) AS ratio, rnk
        FROM ranked WHERE rnk <= 2
      """)
    )
  )
}
