package graft.operators

import graft.{QueryDef, QueryModule}
import graft.streaming.ChangelogOps
import org.apache.spark.sql.functions._

/** Changelog / CDC queries (batch-verifiable slice of the _change
  * convention) + the CUMULATE window TVF and lookup join.
  */
object ChangelogQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // Batch MERGE INTO (upsert) emulation — WHEN MATCHED THEN UPDATE /
    // WHEN NOT MATCHED THEN INSERT, expressed as a full outer join with
    // coalesce resolution (the plan a table format's MERGE compiles to
    // minus the file-level commit). One shuffle on the merge key; the
    // update set derives deterministically from the table itself so
    // both engines build the identical source.
    QueryDef(
      "q_merge_upsert",
      (s, dir) => {
        val t = tables(s, dir)
        val target = t.orders.select(
          col("o_orderkey").as("key"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        // updates: every odd key < 2000 flips to status 'U' with a flat
        // +1000.00 price adjustment (additive => bit-exact in both
        // engines; a multiplicative bump rounds differently at decimal
        // boundaries); inserts: five synthetic keys beyond the domain
        val updates = t.orders
          .filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") < 2000)
          .select(col("o_orderkey").as("ukey"), lit("U").as("ustatus"),
            (col("o_totalprice") + 1000.0).as("uprice"))
          .unionByName(
            s.range(1, 6).toDF("i").select(
              (col("i") + 90000000L).as("ukey"), lit("N").as("ustatus"),
              (col("i") * 100.0).as("uprice")))
        target.join(updates, col("key") === col("ukey"), "full_outer")
          .select(
            coalesce(col("key"), col("ukey")).as("key"),
            coalesce(col("ustatus"), col("status")).as("status"),
            coalesce(col("uprice"), col("price")).as("price"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            Money.sumPrice(col("price")).as("total"))
      },
      Some(s"""
        WITH target AS (
          SELECT o_orderkey AS key, o_orderstatus AS status,
                 o_totalprice AS price
          FROM orders
        ),
        updates AS (
          SELECT o_orderkey AS ukey, 'U' AS ustatus,
                 o_totalprice + 1000.0 AS uprice
          FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey < 2000
          UNION ALL
          SELECT i + 90000000, 'N', i * 100.0
          FROM range(1, 6) r(i)
        ),
        merged AS (
          SELECT coalesce(key, ukey) AS key,
                 coalesce(ustatus, status) AS status,
                 coalesce(uprice, price) AS price
          FROM target FULL OUTER JOIN updates ON key = ukey
        )
        SELECT status, count(*) AS n,
               ${Money.sumPriceSql("price")} AS total
        FROM merged GROUP BY status
      """)
    ),
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
