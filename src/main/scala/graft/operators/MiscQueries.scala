package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Remaining §2 surface: subqueries (scalar/correlated/IN — Catalyst
  * decorrelation, reference FlinkSubQueryRemoveRule), keyed
  * deduplicate keep-first/last (reference StreamExecDeduplicate.java:
  * 70), count windows (KeyedStream.countWindow), and the UDF surface
  * (§2.11: ScalarFunction → udf.register, AggregateFunction →
  * Aggregator, TableFunction → explode of an array-returning udf).
  *
  * UDx queries are oracle-checked by re-expressing the function logic
  * in SQL — that checks the registration/execution path end-to-end.
  */
object MiscQueries extends QueryModule {

  /** Typed UDAF for q_udaf_geomean. Top-level object with
    * session-free Encoders on purpose: an anonymous Aggregator built
    * inside the query closure captures the SparkSession through the
    * implicit-encoder lookup, and the session rides into every task's
    * serialized closure — which breaks outright the moment any
    * non-serializable session field (e.g. the observation manager) is
    * instantiated by an unrelated query in the same session.
    */
  private object GeoMeanAgg
      extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  def defs: Seq[QueryDef] = Seq(
    // Uncorrelated scalar subquery.
    QueryDef(
      "q_subquery_scalar",
      (s, dir) => {
        tables(s, dir).orders.createOrReplaceTempView("orders_sq")
        s.sql("""
          SELECT o_orderkey,
                 round(o_totalprice - (SELECT avg(o_totalprice) FROM orders_sq), 4)
                   AS delta_from_avg
          FROM orders_sq WHERE o_totalprice >
            (SELECT avg(o_totalprice) FROM orders_sq)
        """)
      },
      Some("""
        SELECT o_orderkey,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4)
                 AS delta_from_avg
        FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      """)
    ),
    // Correlated scalar subquery (decorrelated to an aggregate join).
    QueryDef(
      "q_subquery_correlated",
      (s, dir) => {
        val t = tables(s, dir)
        t.customer.createOrReplaceTempView("customer_sq")
        t.orders.createOrReplaceTempView("orders_sq2")
        s.sql("""
          SELECT c_custkey,
                 (SELECT count(*) FROM orders_sq2 WHERE o_custkey = c_custkey
                  AND o_totalprice > 250000) AS n_big
          FROM customer_sq
        """)
      },
      Some("""
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey
                AND o_totalprice > 250000) AS n_big
        FROM customer
      """)
    ),
    // IN / NOT IN subqueries (semi/anti rewrites).
    QueryDef(
      "q_subquery_in",
      (s, dir) => {
        val t = tables(s, dir)
        t.part.createOrReplaceTempView("part_sq")
        t.lineitem.createOrReplaceTempView("lineitem_sq")
        s.sql("""
          SELECT p_partkey, p_brand FROM part_sq
          WHERE p_partkey IN (SELECT l_partkey FROM lineitem_sq
                              WHERE l_quantity >= 49)
        """)
      },
      Some("""
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      """)
    ),
    // LATERAL correlated table subquery (reference models this as a
    // Correlate over a TableFunction; ANSI LATERAL is the SQL surface).
    // Catalyst decorrelates the per-row ORDER BY ... LIMIT 3 into a
    // ranked window join — one shuffle on the join key, no nested-loop
    // re-execution per outer row, which is what makes the shape safe at
    // 100 TB (a literal per-row subquery re-scan would be O(N·M)).
    QueryDef(
      "q_lateral_topn",
      (s, dir) => {
        val t = tables(s, dir)
        t.customer.createOrReplaceTempView("customer_lat")
        t.orders.createOrReplaceTempView("orders_lat")
        s.sql("""
          SELECT c_custkey, o_orderkey, o_totalprice
          FROM customer_lat,
               LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                        WHERE o_custkey = c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
        """)
      },
      Some("""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
             LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                      WHERE o_custkey = c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
      """)
    ),
    // Keyed deduplicate keep-first / keep-last (batch formulation of
    // StreamExecDeduplicate; the streaming form is
    // StreamingOps.dedupeKeepFirst).
    QueryDef(
      "q_dedup_keep_first_last",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        t.events
          .select(
            col("user_id"),
            col("event_type"),
            col("event_id"),
            row_number().over(w).as("rn_first"),
            count(lit(1)).over(
              Window.partitionBy(col("user_id"), col("event_type"))
            ).as("n_in_key")
          )
          .filter(col("rn_first") === 1)
          .select(
            col("user_id"),
            col("event_type"),
            col("event_id").as("first_event"),
            col("n_in_key")
          )
      },
      Some("""
        SELECT user_id, event_type, event_id AS first_event, n_in_key
        FROM (SELECT user_id, event_type, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id, event_type) AS n_in_key
              FROM events)
        WHERE rn = 1
      """)
    ),
    // Count windows (KeyedStream.countWindow): fixed-size batches of 5
    // events per user in event order.
    QueryDef(
      "q_count_window",
      (s, dir) => {
        val t = tables(s, dir)
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t.events
          .select(
            col("user_id"),
            col("value"),
            ((row_number().over(w) - 1) / 5).cast("long").as("batch_id")
          )
          .groupBy(col("user_id"), col("batch_id"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        SELECT user_id, batch_id, count(*) AS n, round(sum(value), 4) AS sv
        FROM (SELECT user_id, value,
                     CAST(floor((row_number() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS batch_id
              FROM events)
        GROUP BY user_id, batch_id
      """)
    ),
    // Table aggregate / UDTAF (reference TableAggregateFunction.java:
    // 156 — one group in, many rows out): per-user top-2 values
    // emitted from a typed flatMapGroups.
    QueryDef(
      "q_table_aggregate",
      (s, dir) => {
        import s.implicits._
        val t = tables(s, dir)
        t.events
          .select(col("user_id"), col("event_id"), col("value"))
          .as[(Long, Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (user: Long, rows: Iterator[(Long, Long, Double)]) =>
            rows.toSeq
              .sortBy { case (_, id, v) => (-v, id) }
              .take(2)
              .zipWithIndex
              .map { case ((_, id, v), i) => (user, i + 1, id, v) }
              .iterator
          }
          .toDF("user_id", "rnk", "event_id", "value")
      },
      Some("""
        SELECT user_id, CAST(rnk AS INT) AS rnk, event_id, value
        FROM (SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rnk
              FROM events)
        WHERE rnk <= 2
      """)
    ),
    // Scalar UDF (reference ScalarFunction.java:92): registered and
    // invoked through the SQL surface.
    QueryDef(
      "q_udf_scalar",
      (s, dir) => {
        val taxed = udf((price: Double, tax: Double) => price * (1.0 + tax))
        s.udf.register("graft_taxed", taxed)
        tables(s, dir).lineitem.createOrReplaceTempView("lineitem_udf")
        s.sql("""
          SELECT l_orderkey, l_linenumber,
                 graft_taxed(l_extendedprice, l_tax) AS taxed_price
          FROM lineitem_udf
        """)
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 + l_tax) AS taxed_price
        FROM lineitem
      """)
    ),
    // Typed UDAF (reference AggregateFunction.java:192 with merge):
    // geometric mean via Aggregator[Double, (Double, Long), Double].
    QueryDef(
      "q_udaf_geomean",
      (s, dir) => {
        s.udf.register("graft_geomean", udaf(GeoMeanAgg))
        tables(s, dir).events.createOrReplaceTempView("events_udaf")
        s.sql("""
          SELECT event_type, round(graft_geomean(value + 1.0), 4) AS geo
          FROM events_udaf GROUP BY event_type
        """)
      },
      Some("""
        SELECT event_type, round(exp(avg(ln(value + 1.0))), 4) AS geo
        FROM events GROUP BY event_type
      """)
    ),
    // Table function / UDTF (reference TableFunction.java:135): an
    // array-returning function exploded laterally — word bigrams.
    QueryDef(
      "q_udtf_bigrams",
      (s, dir) => {
        val bigrams = udf { text: String =>
          val w = text.split(" ", -1)
          (0 until math.max(0, w.length - 1)).map(i => w(i) + ">" + w(i + 1))
        }
        s.udf.register("graft_bigrams", bigrams)
        tables(s, dir).documents.createOrReplaceTempView("documents_udtf")
        s.sql("""
          SELECT bigram, count(*) AS n
          FROM documents_udtf
          LATERAL VIEW explode(graft_bigrams(text)) t AS bigram
          GROUP BY bigram
        """)
      },
      Some("""
        SELECT bigram, count(*) AS n
        FROM (SELECT unnest([words[i] || '>' || words[i+1]
                             for i in range(1, len(words))]) AS bigram
              FROM (SELECT string_split(text, ' ') AS words FROM documents))
        GROUP BY bigram
      """)
    ),
    // Two-input keyed coprocess (reference ConnectedStreams /
    // KeyedCoProcessFunction): a control stream of customer segments
    // feeds per-key state; the order stream reads it to enrich each
    // order. Control-before-data ordering makes the bounded run equal
    // a left join, which is the oracle.
    // Batch iteration (reference DataStream.iterate): transitive
    // reachability over the order–supplier bipartite graph, BFS in a
    // driver loop with distributed steps. The oracle is DuckDB's
    // recursive CTE over the same edge list — the iteration fixpoint
    // checked exactly.
    QueryDef(
      "q_iterations_reachability",
      (s, dir) => {
        val t = tables(s, dir)
        // supplier nodes get negative ids to keep the two vertex
        // domains disjoint
        val edges = t.lineitem
          .filter(col("l_suppkey") < 10 && col("l_orderkey") <= 2000)
          .select(
            col("l_orderkey").as("src"),
            (-(col("l_suppkey") + 1)).as("dst")
          )
          .distinct()
        val source = edges.agg(min(col("src"))).collect()(0).getLong(0)
        graft.plans.Iterations.reachableFrom(edges, source)
      },
      Some("""
        WITH RECURSIVE edges AS (
          SELECT DISTINCT l_orderkey AS src, -(l_suppkey + 1) AS dst
          FROM lineitem WHERE l_suppkey < 10 AND l_orderkey <= 2000
        ),
        reach(node) AS (
          SELECT min(src) FROM edges
          UNION
          SELECT CASE WHEN e.src = r.node THEN e.dst ELSE e.src END AS node
          FROM reach r JOIN edges e ON e.src = r.node OR e.dst = r.node
        )
        SELECT node FROM reach
      """)
    ),
    QueryDef(
      "q_coprocess_enrich",
      (s, dir) => {
        import s.implicits._
        val t = tables(s, dir)
        val orders = t.orders
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .as[CoOrder]
        val controls = t.customer
          .select(col("c_custkey"), col("c_mktsegment"))
          .as[CoSegment]
        graft.streaming.CoProcess
          .connect(orders, controls)(_.o_custkey, _.c_custkey)(
            onLeft = (k, o, st: Option[String]) =>
              (st, Seq(CoEnriched(o.o_orderkey, k, st.getOrElse("unknown"), o.o_totalprice))),
            onRight = (_, c, _: Option[String]) =>
              (Some(c.c_mktsegment), Seq.empty[CoEnriched])
          )
          .toDF()
      },
      Some("""
        SELECT o.o_orderkey AS order_key, o.o_custkey AS cust_key,
               coalesce(c.c_mktsegment, 'unknown') AS segment,
               o.o_totalprice AS total
        FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      """)
    )
  )

  final case class CoOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  final case class CoSegment(c_custkey: Long, c_mktsegment: String)
  final case class CoEnriched(order_key: Long, cust_key: Long, segment: String, total: Double)
}
