package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** §2.8 collection types (MAP / ROW / FLATTEN / GET), the §2.4
  * COLLECT multiset aggregate, and the §2.3 window join. Map/struct
  * values don't hash stably across engines, so queries project them
  * back to scalars / sorted strings; the oracle computes the same
  * answers straight from the source columns — the check verifies the
  * construct→access round trip.
  */
object CollectionQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    // MAP construction + access: str_to_map, create_map, map_keys.
    QueryDef(
      "q_fn_map",
      (s, dir) => {
        val t = tables(s, dir)
        val serialized = concat(
          lit("type:"), col("event_type"), lit(",user:"), col("user_id")
        )
        val m = str_to_map(serialized, lit(","), lit(":"))
        val direct = map(
          lit("t"), col("event_type"),
          lit("u"), col("user_id").cast("string")
        )
        t.events.select(
          col("event_id"),
          element_at(m, "type").as("parsed_type"),
          element_at(m, "user").cast("long").as("parsed_user"),
          size(map_keys(m)).as("n_keys"),
          element_at(direct, "t").as("direct_type"),
          array_join(sort_array(map_keys(direct)), ",").as("key_list")
        )
      },
      Some("""
        SELECT event_id,
               event_type AS parsed_type,
               user_id AS parsed_user,
               2 AS n_keys,
               event_type AS direct_type,
               't,u' AS key_list
        FROM events
      """)
    ),
    // ROW/struct: named_struct, field GET, FLATTEN via .*.
    QueryDef(
      "q_fn_struct",
      (s, dir) => {
        val t = tables(s, dir)
        val packed = named_struct(
          lit("key"), col("o_orderkey"),
          lit("price"), col("o_totalprice"),
          lit("status"), col("o_orderstatus")
        )
        t.orders
          .select(packed.as("row"))
          .select(
            col("row.key").as("o_key"),
            col("row.price").as("o_price"),
            col("row.*")
          )
          .select(
            col("o_key"),
            col("o_price"),
            col("status").as("o_status")
          )
      },
      Some("""
        SELECT o_orderkey AS o_key, o_totalprice AS o_price,
               o_orderstatus AS o_status
        FROM orders
      """)
    ),
    // COLLECT multiset (reference BuiltInFunctionDefinitions COLLECT →
    // multiset = element→count): word histogram per lang, serialized
    // deterministically.
    QueryDef(
      "q_agg_multiset",
      (s, dir) => {
        val t = tables(s, dir)
        t.documents
          .select(col("lang"), explode(split(col("text"), " ")).as("word"))
          .groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("lang"))
          .agg(
            array_join(
              sort_array(collect_list(concat(col("word"), lit(":"), col("n")))),
              ","
            ).as("multiset"),
            count(lit(1)).as("n_distinct_words")
          )
      },
      Some("""
        WITH counts AS (
          SELECT lang, word, count(*) AS n
          FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
          GROUP BY lang, word
        )
        SELECT lang,
               array_to_string(list_sort(list(word || ':' || n)), ',') AS multiset,
               count(*) AS n_distinct_words
        FROM counts GROUP BY lang
      """)
    ),
    // Window join (reference DataStream.join.where.equalTo.window):
    // same-user signup × purchase inside the same 1h tumbling window —
    // an equality join on (key, time bucket).
    QueryDef(
      "q_join_window",
      (s, dir) => {
        val t = tables(s, dir)
        val sig = t.events
          .filter(col("event_type") === "signup")
          .select(
            col("user_id"),
            window(col("ts"), "1 hour").as("w"),
            col("event_id").as("s_id")
          )
        val pur = t.events
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"),
            window(col("ts"), "1 hour").as("w"),
            col("event_id").as("p_id")
          )
        sig
          .join(pur, Seq("user_id", "w"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""
        SELECT s.user_id AS user_id, count(*) AS n_pairs
        FROM (SELECT user_id, date_trunc('hour', ts) AS w, event_id
              FROM events WHERE event_type = 'signup') s
        JOIN (SELECT user_id, date_trunc('hour', ts) AS w, event_id
              FROM events WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id AND s.w = p.w
        GROUP BY s.user_id
      """)
    )
  )
}
