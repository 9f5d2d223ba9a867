package graft.operators

import graft.{QueryDef, QueryModule}
import graft.streaming.ChangelogOps
import org.apache.spark.sql.functions._

/** Changelog / CDC queries (batch-verifiable slice of the _change
  * convention) + the CUMULATE window TVF and lookup join.
  */
object ChangelogQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // ChangelogNormalize: events become a synthetic changelog keyed by
    // (user_id, event_type): every 10th event is a delete, the rest
    // are upserts; final state = latest surviving row per key.
    QueryDef(
      "q_changelog_normalize",
      (s, dir) => {
        val t = tables(s, dir)
        val changelog = t.events.select(
          col("user_id"),
          col("event_type"),
          col("event_id"),
          col("value"),
          when(col("event_id") % 10 === 9, lit(ChangelogOps.Delete))
            .otherwise(lit(ChangelogOps.UpdateAfter))
            .as(ChangelogOps.ChangeCol)
        )
        ChangelogOps
          .normalize(changelog, Seq("user_id", "event_type"), Seq(col("event_id")))
          .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      },
      Some("""
        WITH changelog AS (
          SELECT user_id, event_type, event_id, value,
                 CASE WHEN event_id % 10 = 9 THEN '-D' ELSE '+U' END AS chg
          FROM events
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY event_id DESC) AS rn
          FROM changelog
        )
        SELECT user_id, event_type, event_id, value
        FROM ranked WHERE rn = 1 AND chg != '-D'
      """)
    ),
    // SCD Type-2 dimension build: the same synthetic changelog, but
    // instead of collapsing to latest state (normalize), keep every
    // version with its validity interval — deletes close the previous
    // version's interval and emit nothing. The standard CDC→warehouse
    // materialization of the reference's changelog semantics.
    QueryDef(
      "q_changelog_scd2",
      (s, dir) => {
        val t = tables(s, dir)
        val changelog = t.events.select(
          col("user_id"),
          col("event_type"),
          col("event_id"),
          col("value"),
          when(col("event_id") % 10 === 9, lit(ChangelogOps.Delete))
            .otherwise(lit(ChangelogOps.UpdateAfter))
            .as(ChangelogOps.ChangeCol)
        )
        ChangelogOps
          .scd2(changelog, Seq("user_id", "event_type"), col("event_id"))
          .select(
            col("user_id"), col("event_type"), col("event_id"), col("value"),
            col("effective_from"), col("effective_to"), col("is_current"))
      },
      Some("""
        WITH changelog AS (
          SELECT user_id, event_type, event_id, value,
                 CASE WHEN event_id % 10 = 9 THEN '-D' ELSE '+U' END AS chg
          FROM events
        ), seq AS (
          SELECT *, lead(event_id) OVER (PARTITION BY user_id, event_type
                                         ORDER BY event_id) AS effective_to
          FROM changelog
        )
        SELECT user_id, event_type, event_id, value,
               event_id AS effective_from, effective_to,
               effective_to IS NULL AS is_current
        FROM seq WHERE chg != '-D'
      """)
    ),
    // CUMULATE window TVF (reference StreamExecWindowAggregate with
    // cumulative slices): expanding windows from a 1h base, growing in
    // 20-min steps — each event lands in every cumulation step whose
    // end is after it. Implemented as explode over steps (exactly the
    // reference's slice expansion) + group-by.
    QueryDef(
      "q_agg_window_cumulate",
      (s, dir) => {
        val t = tables(s, dir)
        val stepSec = 1200L
        val steps = 3 // 20m, 40m, 60m
        val hourStart = unix_timestamp(date_trunc("hour", col("ts")))
        val offsetInHour = unix_timestamp(col("ts")) - hourStart
        t.events
          .select(
            col("event_type"),
            col("value"),
            hourStart.as("wstart"),
            explode(
              filter(
                array((1 to steps).map(k => lit(k * stepSec)): _*),
                winEnd => winEnd > offsetInHour
              )
            ).as("wlen")
          )
          .groupBy(col("wstart"), col("wlen"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        WITH expanded AS (
          SELECT event_type, value,
                 CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
                 k * 1200 AS wlen,
                 floor(epoch(ts)) - floor(epoch(date_trunc('hour', ts))) AS off
          FROM events CROSS JOIN (VALUES (1), (2), (3)) s(k)
        )
        SELECT wstart, wlen, event_type, count(*) AS n, round(sum(value), 4) AS sv
        FROM expanded WHERE wlen > off
        GROUP BY wstart, wlen, event_type
      """)
    ),
    // Lookup join, broadcast strategy (dim fits): events → user cohort.
    QueryDef(
      "q_lookup_join",
      (s, dir) => {
        val t = tables(s, dir)
        val dim = t.events
          .groupBy(col("user_id"))
          .agg(min(col("event_id")).as("first_event"))
          .withColumn("cohort", pmod(col("first_event"), lit(7)))
          .select(col("user_id"), col("cohort"))
        graft.plans.LookupJoin
          .broadcastLookup(
            t.events.select(col("event_id"), col("user_id"), col("value")),
            dim,
            "user_id"
          )
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      },
      Some("""
        WITH dim AS (
          SELECT user_id, CAST(min(event_id) % 7 AS BIGINT) AS cohort
          FROM events GROUP BY user_id
        )
        SELECT cohort, count(*) AS n, round(sum(value), 4) AS sv
        FROM events JOIN dim USING (user_id)
        GROUP BY cohort
      """)
    )
  )
}
