package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-verifiable evictor semantics (reference flink-streaming-java/
  * .../windowing/evictors/{CountEvictor,TimeEvictor}.java): a tumbling
  * window whose elements are evicted before the aggregate evaluates.
  * In batch the evict-then-apply contract is exactly a ranking (count
  * evictor) or window-max (time evictor) predicate inside each (key,
  * window) group — fully SQL-expressible, which is the oracle. The
  * streaming buffered-window form of the same semantics lives in
  * streaming/Evictors and is spec-checked against these.
  */
object EvictorQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // CountEvictor.of(3): aggregate only the last 3 events (event-time
    // order) of each hourly window.
    QueryDef(
      "q_evictor_count",
      (s, dir) => {
        val t = tables(s, dir)
        val win = date_trunc("hour", col("ts"))
        val w = Window
          .partitionBy(col("user_id"), win)
          .orderBy(col("ts").desc, col("event_id").desc)
        t.events
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .groupBy(col("user_id"), unix_timestamp(win).as("win_start"))
          .agg(count(lit(1)).as("n_kept"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
               count(*) AS n_kept, round(sum(value), 4) AS sv
        FROM (
          SELECT user_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn <= 3
        GROUP BY user_id, win_start
      """)
    ),
    // TimeEvictor.of(10 min): aggregate only events within 10 minutes
    // of each hourly window's max timestamp.
    QueryDef(
      "q_evictor_time",
      (s, dir) => {
        val t = tables(s, dir)
        val win = date_trunc("hour", col("ts"))
        val w = Window.partitionBy(col("user_id"), win)
        t.events
          .withColumn("mx", max(col("ts")).over(w))
          .filter(col("ts") >= col("mx") - expr("INTERVAL 10 MINUTES"))
          .groupBy(col("user_id"), unix_timestamp(win).as("win_start"))
          .agg(count(lit(1)).as("n_kept"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
               count(*) AS n_kept, round(sum(value), 4) AS sv
        FROM (
          SELECT user_id, ts, value,
                 max(ts) OVER (PARTITION BY user_id, date_trunc('hour', ts)) AS mx
          FROM events
        )
        WHERE ts >= mx - INTERVAL 10 MINUTE
        GROUP BY user_id, win_start
      """)
    ),
    // DeltaEvictor.of(50, |a-b|): keep only elements within 50.0 of
    // the window's last element's value.
    QueryDef(
      "q_evictor_delta",
      (s, dir) => {
        val t = tables(s, dir)
        val win = date_trunc("hour", col("ts"))
        val w = Window
          .partitionBy(col("user_id"), win)
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t.events
          .withColumn("lastv", last(col("value")).over(w))
          .filter(abs(col("value") - col("lastv")) < 50.0)
          .groupBy(col("user_id"), unix_timestamp(win).as("win_start"))
          .agg(count(lit(1)).as("n_kept"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
               count(*) AS n_kept, round(sum(value), 4) AS sv
        FROM (
          SELECT user_id, ts, value,
                 last_value(value) OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lastv
          FROM events
        )
        WHERE abs(value - lastv) < 50.0
        GROUP BY user_id, win_start
      """)
    )
  )
}
