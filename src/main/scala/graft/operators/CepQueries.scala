package graft.operators

import graft.{QueryDef, QueryModule}
import graft.streaming.Cep
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.functions._

/** CEP pattern detection exposed as verifiable batch queries (the
  * streaming form of the same NFA is covered by CepSpec). The strict
  * 2-step pattern has an exact SQL rewrite via lag(), which is the
  * oracle.
  */
object CepQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // Strict contiguity: two consecutive 'error' events of one user
    // within 30 minutes (MATCH_RECOGNIZE PATTERN (E1 E2) semantics).
    QueryDef(
      "q_cep_double_error",
      (s, dir) => {
        import s.implicits._
        val t = tables(s, dir)
        val events = t.events
          .select("event_id", "ts", "user_id", "event_type", "value")
          .as[Event]
        val pattern = Cep.SequencePattern(
          steps = Seq(
            Cep.Step("e1", _.event_type == "error"),
            Cep.Step("e2", _.event_type == "error")
          ),
          withinMs = 30L * 60 * 1000,
          strict = true
        )
        Cep
          .detectBatch(events, pattern)
          .toDF()
          .select(
            col("key").as("user_id"),
            element_at(col("event_ids"), 1).as("m1"),
            element_at(col("event_ids"), 2).as("m2")
          )
      },
      Some("""
        WITH o AS (
          SELECT user_id, event_id, ts, event_type,
                 lag(event_id) OVER w AS p_id,
                 lag(event_type) OVER w AS p_type,
                 lag(ts) OVER w AS p_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, p_id AS m1, event_id AS m2
        FROM o
        WHERE event_type = 'error' AND p_type = 'error'
          AND ts - p_ts <= INTERVAL 30 MINUTE
      """)
    ),
    // Relaxed contiguity (followedBy): signup followed by a purchase
    // within 30 minutes, ignoring events in between — first purchase
    // completes the match and the NFA emits exactly one match per
    // signup (each signup starts one partial). Oracle: for each
    // signup, the earliest later purchase within the bound.
    QueryDef(
      "q_cep_signup_purchase",
      (s, dir) => {
        import s.implicits._
        val t = tables(s, dir)
        val events = t.events
          .select("event_id", "ts", "user_id", "event_type", "value")
          .as[Event]
        val pattern = Cep.SequencePattern(
          steps = Seq(
            Cep.Step("signup", _.event_type == "signup"),
            Cep.Step("purchase", _.event_type == "purchase")
          ),
          withinMs = 30L * 60 * 1000,
          strict = false
        )
        Cep
          .detectBatch(events, pattern)
          .toDF()
          .select(
            col("key").as("user_id"),
            element_at(col("event_ids"), 1).as("signup_id"),
            element_at(col("event_ids"), 2).as("purchase_id")
          )
      },
      Some("""
        WITH s AS (SELECT user_id, event_id AS signup_id, ts AS s_ts
                   FROM events WHERE event_type = 'signup'),
        cand AS (
          SELECT s.user_id, s.signup_id, p.event_id AS purchase_id,
                 row_number() OVER (PARTITION BY s.user_id, s.signup_id
                                    ORDER BY p.ts, p.event_id) AS rn
          FROM s JOIN events p
            ON p.user_id = s.user_id AND p.event_type = 'purchase'
           AND (p.ts > s.s_ts OR (p.ts = s.s_ts AND p.event_id > s.signup_id))
           AND p.ts - s.s_ts <= INTERVAL 30 MINUTE
        )
        SELECT user_id, signup_id, purchase_id FROM cand WHERE rn = 1
      """)
    )
  )
}
