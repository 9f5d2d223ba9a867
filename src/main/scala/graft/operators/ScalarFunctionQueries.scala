package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** §2.8 scalar function catalog (reference
  * BuiltInFunctionDefinitions.java:83-1497 / FlinkSqlOperatorTable
  * .java:112-1183): string, math, temporal, conditional, collection,
  * JSON — exercised per-row over full tables so both engines evaluate
  * the same expression tree on every row. Per-row arithmetic is kept
  * exact (no rounding) — IEEE ops in identical order are bit-equal;
  * only transcendentals (libm differs between JVM and C) are rounded.
  * Also §2.2 Correlate/UNNEST (explode) and §2.1 Values.
  */
object ScalarFunctionQueries extends QueryModule {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_fn_string",
      (s, dir) => {
        val t = tables(s, dir)
        t.part.select(
          col("p_partkey"),
          length(col("p_name")).as("name_len"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_type"), 1, 5).as("sub5"),
          concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "#").as("rp"),
          trim(lit("  pad  ")).as("trimmed"),
          regexp_replace(col("p_type"), " ", "_").as("no_space"),
          reverse(col("p_brand")).as("rev"),
          col("p_name").substr(lit(1), lit(3)).as("l3"),
          instr(col("p_name"), "a").as("pos_a"),
          repeat(col("p_brand"), 2).as("rep2"),
          ascii(col("p_brand")).as("first_ascii"),
          split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
          md5(col("p_name")).as("name_md5"),
          sha2(col("p_name"), 256).as("name_sha"),
          translate(col("p_brand"), "Bd#", "bD_").as("trans"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_alpha"),
          col("p_name").like("%a%").as("has_a"),
          col("p_name").rlike("^[a-z]").as("starts_alpha")
        )
      },
      Some("""
        SELECT p_partkey,
               length(p_name) AS name_len,
               upper(p_name) AS up,
               lower(p_brand) AS lo,
               substring(p_type, 1, 5) AS sub5,
               concat_ws('-', p_brand, p_type) AS joined,
               lpad(p_brand, 12, '*') AS lp,
               rpad(p_brand, 12, '#') AS rp,
               trim('  pad  ') AS trimmed,
               regexp_replace(p_type, ' ', '_', 'g') AS no_space,
               reverse(p_brand) AS rev,
               substring(p_name, 1, 3) AS l3,
               instr(p_name, 'a') AS pos_a,
               repeat(p_brand, 2) AS rep2,
               ascii(p_brand) AS first_ascii,
               split_part(p_type, ' ', 1) AS first_word,
               md5(p_name) AS name_md5,
               sha256(p_name) AS name_sha,
               translate(p_brand, 'Bd#', 'bD_') AS trans,
               regexp_extract(p_name, '([a-z]+)', 1) AS first_alpha,
               p_name LIKE '%a%' AS has_a,
               regexp_matches(p_name, '^[a-z]') AS starts_alpha
        FROM part
      """)
    ),
    QueryDef(
      "q_fn_math",
      (s, dir) => {
        val t = tables(s, dir)
        t.lineitem.select(
          col("l_orderkey"),
          col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          ceil(col("l_extendedprice")).as("ceil_p"),
          floor(col("l_extendedprice")).as("floor_p"),
          round(col("l_discount") * 100, 0).as("disc_pct"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(log(col("l_quantity") + 1), 6).as("ln_q"),
          round(log(10.0, col("l_extendedprice")), 6).as("log10_p"),
          round(pow(col("l_quantity"), 2), 4).as("q_sq"),
          pmod(col("l_orderkey"), lit(7)).as("mod7"),
          signum(col("l_quantity") - 25).as("sgn"),
          round(sin(col("l_discount")), 6).as("sin_d"),
          round(atan2(col("l_quantity"), col("l_tax") + 1), 6).as("at2"),
          round(degrees(col("l_discount")), 6).as("deg"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_discount") * 100).as("le")
        )
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS abs_dev,
               CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
               CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
               round(l_discount * 100, 0) AS disc_pct,
               round(sqrt(l_quantity), 6) AS sqrt_q,
               round(exp(l_discount), 6) AS exp_d,
               round(ln(l_quantity + 1), 6) AS ln_q,
               round(log10(l_extendedprice), 6) AS log10_p,
               round(power(l_quantity, 2), 4) AS q_sq,
               l_orderkey % 7 AS mod7,
               CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
               round(sin(l_discount), 6) AS sin_d,
               round(atan2(l_quantity, l_tax + 1), 6) AS at2,
               round(degrees(l_discount), 6) AS deg,
               greatest(l_quantity, l_discount * 100) AS gr,
               least(l_quantity, l_discount * 100) AS le
        FROM lineitem
      """)
    ),
    QueryDef(
      "q_fn_datetime",
      (s, dir) => {
        val t = tables(s, dir)
        t.orders.select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          weekofyear(col("o_orderdate")).as("woy"),
          hour(col("o_orderdate")).as("h"),
          minute(col("o_orderdate")).as("mi"),
          second(col("o_orderdate")).as("sec"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
          col("o_orderdate").cast("date").as("d"),
          last_day(col("o_orderdate")).as("eom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("date").as("plus30"),
          datediff(
            col("o_orderdate").cast("date"),
            lit("2024-01-01").cast("date")
          ).as("days_since")
        )
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(dayofyear(o_orderdate) AS INT) AS doy,
               CAST(dayofweek(o_orderdate) AS INT) AS dow,
               CAST(weekofyear(o_orderdate) AS INT) AS woy,
               CAST(hour(o_orderdate) AS INT) AS h,
               CAST(minute(o_orderdate) AS INT) AS mi,
               CAST(second(o_orderdate) AS INT) AS sec,
               strftime(o_orderdate, '%Y-%m-%d') AS fmt,
               CAST(o_orderdate AS DATE) AS d,
               last_day(CAST(o_orderdate AS DATE)) AS eom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
               CAST(datediff('day', DATE '2024-01-01',
                             CAST(o_orderdate AS DATE)) AS INT) AS days_since
        FROM orders
      """)
    ),
    QueryDef(
      "q_fn_conditional",
      (s, dir) => {
        val t = tables(s, dir)
        t.events.select(
          col("event_id"),
          when(col("value") > 150, "high")
            .when(col("value") > 50, "mid")
            .otherwise("low")
            .as("bucket"),
          coalesce(
            when(col("event_type") === "error", col("value")),
            lit(0.0)
          ).as("err_value"),
          nullif(col("event_type"), lit("click")).as("non_click"),
          (col("value").isNotNull && col("user_id") > 100).as("flag"),
          col("event_type").isin("purchase", "signup").as("is_conv")
        )
      },
      Some("""
        SELECT event_id,
               CASE WHEN value > 150 THEN 'high'
                    WHEN value > 50 THEN 'mid'
                    ELSE 'low' END AS bucket,
               coalesce(CASE WHEN event_type = 'error' THEN value END, 0.0)
                 AS err_value,
               nullif(event_type, 'click') AS non_click,
               (value IS NOT NULL AND user_id > 100) AS flag,
               event_type IN ('purchase', 'signup') AS is_conv
        FROM events
      """)
    ),
    // Collection functions over the tokenized documents.
    QueryDef(
      "q_fn_array",
      (s, dir) => {
        val t = tables(s, dir)
        val words = split(col("text"), " ")
        t.documents.select(
          col("doc_id"),
          size(words).as("n_words"),
          size(array_distinct(words)).as("n_uniq"),
          array_contains(words, "join").as("has_join"),
          element_at(words, 1).as("first_word"),
          element_at(words, -1).as("last_word"),
          array_join(slice(words, 1, 3), "_").as("first3"),
          array_join(sort_array(array_distinct(words)), ",").as("sorted_uniq"),
          array_position(words, "data").cast("int").as("data_pos"),
          size(array_intersect(words, array(lit("join"), lit("merge"), lit("hash"))))
            .as("n_marker"),
          size(array_union(array_distinct(words), array(lit("zzz"))))
            .as("n_union"),
          size(array_remove(words, "the")).as("n_nothe")
        )
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
               list_contains(string_split(text, ' '), 'join') AS has_join,
               string_split(text, ' ')[1] AS first_word,
               string_split(text, ' ')[-1] AS last_word,
               array_to_string(list_slice(string_split(text, ' '), 1, 3), '_') AS first3,
               array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS sorted_uniq,
               CAST(coalesce(list_position(string_split(text, ' '), 'data'), 0) AS INT) AS data_pos,
               CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                       ['join','merge','hash'])) AS INT) AS n_marker,
               CAST(len(list_distinct(list_concat(string_split(text, ' '), ['zzz']))) AS INT) AS n_union,
               CAST(len(list_filter(string_split(text, ' '), w -> w != 'the')) AS INT) AS n_nothe
        FROM documents
      """)
    ),
    // Higher-order functions: transform / filter / aggregate (fold) /
    // zip_with — the lambda surface Flink exposes via UDFs.
    QueryDef(
      "q_fn_higher_order",
      (s, dir) => {
        val t = tables(s, dir)
        val words = split(col("text"), " ")
        t.documents.select(
          col("doc_id"),
          aggregate(
            transform(words, w => length(w).cast("long")),
            lit(0L),
            (acc, x) => acc + x
          ).as("total_chars"),
          size(filter(words, w => length(w) > 4)).as("n_long"),
          aggregate(
            filter(words, w => w === "the"),
            lit(0L),
            (acc, _) => acc + 1
          ).as("n_the")
        )
      },
      Some("""
        SELECT doc_id,
               list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
                            w -> CAST(length(w) AS BIGINT))), (a, x) -> a + x) AS total_chars,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> length(w) > 4)) AS INT) AS n_long,
               list_reduce(list_prepend(0, list_transform(
                     list_filter(string_split(text, ' '), w -> w = 'the'),
                     w -> CAST(1 AS BIGINT))), (a, x) -> a + x) AS n_the
        FROM documents
      """)
    ),
    // Null semantics: null-safe equality (<=> / IS NOT DISTINCT FROM),
    // null propagation through comparisons, nvl2-style branching.
    QueryDef(
      "q_fn_null_semantics",
      (s, dir) => {
        val t = tables(s, dir)
        val maybeNull = nullif(col("event_type"), lit("click"))
        t.events.select(
          col("event_id"),
          maybeNull.eqNullSafe(lit("view")).as("nullsafe_eq_view"),
          maybeNull.eqNullSafe(nullif(lit("x"), lit("x"))).as("nullsafe_eq_null"),
          (maybeNull === "view").isNull.as("plain_eq_is_null"),
          coalesce(maybeNull, lit("was_click")).as("filled"),
          when(maybeNull.isNull, "nullcase").otherwise(maybeNull).as("branched")
        )
      },
      Some("""
        SELECT event_id,
               nullif(event_type, 'click') IS NOT DISTINCT FROM 'view' AS nullsafe_eq_view,
               nullif(event_type, 'click') IS NOT DISTINCT FROM NULL AS nullsafe_eq_null,
               (nullif(event_type, 'click') = 'view') IS NULL AS plain_eq_is_null,
               coalesce(nullif(event_type, 'click'), 'was_click') AS filled,
               CASE WHEN nullif(event_type, 'click') IS NULL THEN 'nullcase'
                    ELSE nullif(event_type, 'click') END AS branched
        FROM events
      """)
    ),
    // Array construction helpers: sequence, array_repeat, flatten,
    // arrays_zip round-tripped to scalars.
    QueryDef(
      "q_fn_array_construct",
      (s, dir) => {
        val t = tables(s, dir)
        t.part.select(
          col("p_partkey"),
          size(sequence(lit(1), col("p_size"))).as("seq_len"),
          element_at(sequence(lit(0), col("p_size"), lit(2)), -1).as("last_even"),
          size(array_repeat(col("p_brand"), 3)).as("rep_len"),
          size(flatten(array(split(col("p_type"), " "), array(col("p_brand")))))
            .as("flat_len"),
          aggregate(
            zip_with(
              sequence(lit(1), lit(4)),
              sequence(lit(10), lit(40), lit(10)),
              (a, b) => a * b
            ),
            lit(0L),
            (acc, x) => acc + x
          ).as("zip_dot")
        )
      },
      Some("""
        SELECT p_partkey,
               CAST(p_size AS INT) AS seq_len,
               CAST((p_size // 2) * 2 AS BIGINT) AS last_even,
               3 AS rep_len,
               CAST(len(string_split(p_type, ' ')) + 1 AS INT) AS flat_len,
               CAST(1*10 + 2*20 + 3*30 + 4*40 AS BIGINT) AS zip_dot
        FROM part
      """)
    ),
    QueryDef(
      "q_fn_json",
      (s, dir) => {
        val t = tables(s, dir)
        t.events.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
          get_json_object(col("props"), "$.missing").as("prop_missing"),
          // schema-declared structured parse (from_json), not just
          // path extraction
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k").as("parsed_k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).isNotNull.as("parse_ok")
        )
      },
      Some("""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
               json_extract_string(props, '$.missing') AS prop_missing,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS parsed_k,
               props IS NOT NULL AS parse_ok
        FROM events
      """)
    ),
    // Trim variants with explicit trim characters.
    QueryDef(
      "q_fn_trim_variants",
      (s, dir) => {
        val t = tables(s, dir)
        val padded = concat(lit("xx"), col("p_brand"), lit("yy"))
        t.part.select(
          col("p_partkey"),
          ltrim(padded, "x").as("left_trimmed"),
          rtrim(padded, "y").as("right_trimmed"),
          btrim(padded, lit("xy")).as("both_trimmed"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("ws_trimmed")
        )
      },
      Some("""
        SELECT p_partkey,
               ltrim('xx' || p_brand || 'yy', 'x') AS left_trimmed,
               rtrim('xx' || p_brand || 'yy', 'y') AS right_trimmed,
               trim('xx' || p_brand || 'yy', 'xy') AS both_trimmed,
               trim('  ' || p_brand || '  ') AS ws_trimmed
        FROM part
      """)
    ),
    // Correlate / UNNEST (reference StreamExecCorrelate.java:45,
    // LogicalUnnestRule): explode tokens → global word histogram.
    QueryDef(
      "q_explode_unnest",
      (s, dir) => {
        val t = tables(s, dir)
        t.documents
          .select(explode(split(col("text"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY word
      """)
    ),
    // posexplode — UNNEST WITH ORDINALITY.
    QueryDef(
      "q_explode_with_position",
      (s, dir) => {
        val t = tables(s, dir)
        t.documents
          .filter(col("doc_id") < 100)
          .select(
            col("doc_id"),
            posexplode(split(col("text"), " "))
          )
          .select(
            col("doc_id"),
            (col("pos") + 1).cast("int").as("pos1"),
            col("col").as("word")
          )
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
                   FROM documents WHERE doc_id < 100),
             p AS (SELECT doc_id, words,
                          unnest(generate_series(1, len(words))) AS pos
                   FROM w)
        SELECT doc_id, CAST(pos AS INT) AS pos1, words[pos] AS word FROM p
      """)
    ),
    // Inline VALUES table (reference StreamExecValues.java:31).
    QueryDef(
      "q_values_inline",
      (s, dir) => {
        val codes = s
          .createDataFrame(
            Seq(("A", 1, 1.5), ("B", 2, 2.5), ("C", 3, 3.5), ("D", 4, 4.5))
          )
          .toDF("code", "rank_no", "weight")
        codes.filter(col("rank_no") > 1)
      },
      Some("""
        SELECT code, CAST(rank_no AS INT) AS rank_no, weight
        FROM (VALUES ('A', 1, 1.5), ('B', 2, 2.5), ('C', 3, 3.5), ('D', 4, 4.5))
             v(code, rank_no, weight)
        WHERE rank_no > 1
      """)
    ),
    // PARSE_URL + OVERLAY (reference BuiltInFunctionDefinitions
    // PARSE_URL / OVERLAY). DuckDB has neither, so the oracle rebuilds
    // them from regexp/substr primitives — which also pins down the
    // exact component semantics being claimed.
    QueryDef(
      "q_fn_url_overlay",
      (s, dir) => {
        val t = tables(s, dir)
        val url = concat(
          lit("https://ex"), pmod(col("p_partkey"), lit(5)),
          lit(".org/p/"), col("p_partkey"),
          lit("?id="), col("p_partkey"), lit("&x=1")
        )
        t.part.select(
          col("p_partkey"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY"), lit("id")).as("qid"),
          overlay(col("p_brand"), lit("XX"), lit(2)).as("brand_patched")
        )
      },
      Some("""
        WITH u AS (
          SELECT p_partkey, p_brand,
                 'https://ex' || (p_partkey % 5) || '.org/p/' || p_partkey
                   || '?id=' || p_partkey || '&x=1' AS url
          FROM part
        )
        SELECT p_partkey,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?&]id=([^&]*)', 1) AS qid,
               substr(p_brand, 1, 1) || 'XX' || substr(p_brand, 4) AS brand_patched
        FROM u
      """)
    ),
    // The murmur3 collision escape hatch, DRIVEN END-TO-END through
    // DuckDB every round: Catalyst's hash(array<long>, int) — the
    // band-bucket key the MinHash oracles would switch to if a
    // cross-tuple band collision ever tripped the hot-bucket census —
    // against the Murmur3Sql.hashLongSql/hashIntSql staged-SQL replay.
    // The chain (seed 42 → hashLong(doc_id) → hashLong(negative long)
    // → hashInt(band)) exercises the high-word split, the arithmetic
    // >>-with-mask on a NEGATIVE long, and both fmix lengths, so the
    // builders' bit-exactness vs DuckDB is pinned by the oracle gate,
    // not a one-off manual check (Murmur3SqlSpec pins the same
    // arithmetic to the JVM kernel). Stages chain via one projected
    // column each — textually nesting the builders blows up
    // exponentially (the mix builders duplicate their seed text).
    QueryDef(
      "q_fn_hash_chain",
      (s, dir) => {
        val t = tables(s, dir)
        t.documents.select(
          col("doc_id"),
          hash(array(col("doc_id"), col("doc_id") - lit(3000000000L)),
            pmod(col("doc_id"), lit(16)).cast("int")).as("bucket")
        )
      },
      Some {
        val m = Murmur3Sql
        s"""
        SELECT doc_id,
               CAST(${m.signed32(m.hashIntSql("band", "s2"))} AS INTEGER) AS bucket
        FROM (
          SELECT doc_id, band, ${m.hashLongSql("x2", "s1")} AS s2
          FROM (
            SELECT doc_id, x2, band, ${m.hashLongSql("doc_id", "42")} AS s1
            FROM (
              -- positive mod on BOTH sides (Spark uses pmod): DuckDB's
              -- plain % keeps the dividend's sign, so a negative doc_id
              -- would diverge (r20 ADVICE — the week_shift fixture-luck
              -- class); doc_id is non-negative today, this pins it
              SELECT doc_id, doc_id - 3000000000 AS x2,
                     ((doc_id % 16) + 16) % 16 AS band
              FROM documents)))
      """
      }
    )
  )
}
