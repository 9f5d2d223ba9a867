package graft.streaming

import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, InterpretedPredicate}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL MATCH_RECOGNIZE front-end over the [[Cep]] NFA — the textual
  * entry point the reference exposes through its planner (reference:
  * flink-table-planner-blink/.../exec/stream/StreamExecMatch.java:90,
  * MATCH_RECOGNIZE operators FlinkSqlOperatorTable.java:1147-1151).
  * The Scala Pattern API ([[Cep.SequencePattern]]) covers the
  * semantics; this parses the SQL surface into it so a MATCH_RECOGNIZE
  * query migrates as text.
  *
  * Supported subset (each maps 1:1 onto a SequencePattern feature):
  *
  * {{{
  * MATCH_RECOGNIZE (
  *   PARTITION BY user_id
  *   ORDER BY ts
  *   [AFTER MATCH SKIP TO NEXT ROW | AFTER MATCH SKIP PAST LAST ROW]
  *   PATTERN ( A B+ C? D{2} E{1,3} [B+? reluctant] )
  *   [WITHIN INTERVAL 'n' SECOND|MINUTE|HOUR|DAY]
  *   DEFINE A AS <sql predicate>, B AS <sql predicate> ...
  * )
  * }}}
  *
  *  - Row-pattern variables quantified `+` (one-or-more, greedy as in
  *    SQL regex; `+?` reluctant), `?` (optional), `{n}` / `{n,m}`
  *    (times). Variables without a DEFINE default to TRUE (any row) —
  *    the SQL-standard rule.
  *  - Contiguity is strict (MATCH_RECOGNIZE is a regex over adjacent
  *    rows once partitioned and ordered).
  *  - AFTER MATCH SKIP PAST LAST ROW is the SQL default; SKIP TO NEXT
  *    ROW maps to [[Cep.SkipToNext]].
  *  - DEFINE predicates are per-row conditions over the event columns,
  *    compiled by Spark's own SQL parser + analyzer (so type coercion,
  *    function library and null semantics are exactly Spark SQL's) and
  *    evaluated as an interpreted Catalyst predicate per event.
  *    PREV/NEXT navigation inside DEFINE is out of scope — the Scala
  *    API's richer combinators cover those shapes.
  *  - MEASURES: FIRST/LAST/COUNT/SUM/AVG/MIN/MAX over `VAR.column`
  *    (see [[parseMeasures]]/[[withMeasures]]): the NFA emits the
  *    per-step label of every matched row (`Match.step_names`), and
  *    each measure compiles to a collection expression over the
  *    label-filtered, row-ordered match — no second pattern pass.
  *
  * Output is the NFA's match relation (key, start_ts, end_ts,
  * event_ids) — ONE ROW PER MATCH semantics with the matched row ids,
  * from which MEASURES-style projections are ordinary selects.
  */
object MatchRecognize {

  /** The Event row-type the NFA runs over, as Catalyst attributes. */
  private val eventAttrs: Seq[AttributeReference] = Seq(
    AttributeReference("event_id", LongType)(),
    AttributeReference("ts", TimestampType)(),
    AttributeReference("user_id", LongType)(),
    AttributeReference("event_type", StringType)(),
    AttributeReference("value", DoubleType)()
  )

  /** A DEFINE predicate: Spark-parsed, analyzer-coerced, interpreted
    * per event. The bound Catalyst expression serializes into task
    * closures; the predicate instance is rebuilt lazily per executor.
    */
  private final class SqlPredicate(bound: Expression)
      extends (Event => Boolean) with Serializable {
    @transient private lazy val pred = InterpretedPredicate(bound)
    @transient private lazy val row = new GenericInternalRow(5)
    override def apply(e: Event): Boolean = {
      row.update(0, e.event_id)
      row.update(1, if (e.ts == null) null else DateTimeUtils.fromJavaTimestamp(e.ts))
      row.update(2, e.user_id)
      row.update(3, UTF8String.fromString(e.event_type))
      row.update(4, e.value)
      pred.eval(row.asInstanceOf[InternalRow])
    }
  }

  /** Compile one DEFINE condition: parse → resolve + coerce against
    * the Event schema through the real analyzer (a LocalRelation
    * carrier plan) → bind ordinals.
    */
  def compilePredicate(spark: SparkSession, sql: String): Event => Boolean = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    parsed.foreach {
      case u: UnresolvedAttribute
        if !eventAttrs.exists(_.name.equalsIgnoreCase(u.name)) =>
        throw new IllegalArgumentException(
          s"DEFINE references unknown column '${u.name}' " +
            s"(event columns: ${eventAttrs.map(_.name).mkString(", ")})")
      case _ => ()
    }
    val carrier = Filter(parsed, LocalRelation(eventAttrs))
    val analyzed = spark.sessionState.analyzer.execute(carrier)
    spark.sessionState.analyzer.checkAnalysis(analyzed)
    val cond = analyzed.collectFirst { case Filter(c, _) => c }.getOrElse(
      throw new IllegalStateException(s"predicate did not analyze to a filter: $sql"))
    val bound =
      BindReferences.bindReference(cond, eventAttrs.asInstanceOf[Seq[Attribute]])
    new SqlPredicate(bound)
  }

  // ---- text parsing ---------------------------------------------------

  /** Index of the first occurrence of `keyword` as a whole word outside
    * single-quoted literals, or -1. Word-boundary matching keeps an
    * identifier like `pattern_count` from being mistaken for the
    * PATTERN clause; the quote-parity check keeps a string literal
    * containing the keyword from misdirecting the clause scan.
    */
  private def keywordAt(sql: String, keyword: String): Int = {
    val re = raw"(?is)\b${java.util.regex.Pattern.quote(keyword)}\b".r
    re.findAllMatchIn(sql)
      .map(_.start)
      .find(at => sql.substring(0, at).count(_ == '\'') % 2 == 0)
      .getOrElse(-1)
  }

  /** Extract the balanced-paren body following the keyword. Paren
    * counting is quote-aware, so a DEFINE string literal containing
    * `(` or `)` cannot truncate or unbalance the extracted body.
    */
  private def balancedBody(sql: String, keyword: String): String = {
    val at = keywordAt(sql, keyword)
    require(at >= 0, s"$keyword not found")
    var open = at + keyword.length
    while (open < sql.length && sql(open).isWhitespace) open += 1
    require(open < sql.length && sql(open) == '(',
      s"$keyword must be followed by (...)")
    var depth = 0
    var i = open
    var inQuote = false
    while (i < sql.length) {
      sql(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote =>
          depth -= 1
          if (depth == 0) return sql.substring(open + 1, i)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses after $keyword")
  }

  /** Split on top-level commas (ignores commas inside parens/quotes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inQuote = false
    var start = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote => depth -= 1
        case ',' if !inQuote && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val quantified = raw"(?s)([A-Za-z_][A-Za-z_0-9]*)(\{\s*\d+\s*(?:,\s*\d+\s*)?\}|\+\??|\*|\?)?".r

  private val withinRe =
    raw"(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)".r

  private val skipRe =
    raw"(?is)AFTER\s+MATCH\s+SKIP\s+(TO\s+NEXT\s+ROW|PAST\s+LAST\s+ROW)".r

  private val partitionRe = raw"(?is)PARTITION\s+BY\s+([A-Za-z_][A-Za-z_0-9]*)".r
  private val orderRe = raw"(?is)ORDER\s+BY\s+([A-Za-z_][A-Za-z_0-9]*)".r

  /** Parse MATCH_RECOGNIZE text into a [[Cep.SequencePattern]]. */
  def parse(spark: SparkSession, sql: String): Cep.SequencePattern = {
    val body = balancedBody(sql, "MATCH_RECOGNIZE")

    partitionRe.findFirstMatchIn(body).foreach { m =>
      require(m.group(1).equalsIgnoreCase("user_id"),
        s"this engine keys MATCH_RECOGNIZE by user_id; got PARTITION BY ${m.group(1)}")
    }
    orderRe.findFirstMatchIn(body).foreach { m =>
      require(m.group(1).equalsIgnoreCase("ts"),
        s"this engine orders MATCH_RECOGNIZE by ts; got ORDER BY ${m.group(1)}")
    }

    val skip = skipRe.findFirstMatchIn(body) match {
      case Some(m) if m.group(1).toUpperCase.startsWith("TO") => Cep.SkipToNext
      case _ => Cep.SkipPastLastEvent // SQL default: SKIP PAST LAST ROW
    }

    val withinMs = withinRe.findFirstMatchIn(body) match {
      case Some(m) =>
        val n = m.group(1).toLong
        m.group(2).toUpperCase match {
          case "SECOND" => n * 1000L
          case "MINUTE" => n * 60000L
          case "HOUR" => n * 3600000L
          case "DAY" => n * 86400000L
        }
      case None => Long.MaxValue // unbounded — matches the Scala API's inert bound
    }

    // DEFINE var AS predicate, ...  (terminates at end of body or the
    // next clause keyword — DEFINE is last in our subset)
    val defineAt = keywordAt(body, "DEFINE") match {
      case -1 => None
      case at => Some(at + "DEFINE".length)
    }
    val defines: Map[String, Event => Boolean] = defineAt match {
      case Some(end) =>
        splitTopLevel(body.substring(end)).map { item =>
          val asSplit = raw"(?is)\s+AS\s+".r.findFirstMatchIn(item).getOrElse(
            throw new IllegalArgumentException(s"DEFINE item missing AS: $item"))
          val name = item.substring(0, asSplit.start).trim
          val pred = compilePredicate(spark, item.substring(asSplit.end).trim)
          name.toUpperCase -> pred
        }.toMap
      case None => Map.empty
    }

    val patBody = balancedBody(body, "PATTERN")
    val steps = splitPattern(patBody).map { case (name, quant) =>
      // SQL identifiers are case-insensitive: labels normalize to upper
      // case so DEFINE lookup, MEASURES filtering and CLASSIFIER output
      // agree regardless of how the query writes the variable
      val uname = name.toUpperCase
      // SQL-standard rule: an undefined variable matches any row
      val pred = defines.getOrElse(uname, (_: Event) => true)
      quant match {
        case None => Cep.Step(uname, pred)
        case Some("?") => Cep.Step(uname, pred, optional = true)
        case Some("+") => Cep.Step(uname, pred, oneOrMore = true, greedy = true)
        case Some("+?") => Cep.Step(uname, pred, oneOrMore = true, greedy = false)
        case Some("*") =>
          Cep.Step(uname, pred, oneOrMore = true, greedy = true, optional = true)
        case Some(braces) =>
          val nums = raw"\d+".r.findAllIn(braces).map(_.toInt).toSeq
          nums match {
            case Seq(n) => Cep.Step(uname, pred, times = n)
            case Seq(n, mx) => Cep.Step(uname, pred, times = n, timesMax = mx)
            case _ => throw new IllegalArgumentException(s"bad quantifier $braces")
          }
      }
    }
    Cep.SequencePattern(steps, withinMs, strict = true, skip = skip)
  }

  /** Tokenize the PATTERN body into (variable, quantifier) pairs.
    * The tokens must cover the ENTIRE body (whitespace excepted):
    * syntax outside the supported subset — alternation `A | B`,
    * grouping `( )`, PERMUTE, reluctant star `*?`, open-ended `{n,}` —
    * is rejected loudly rather than silently reinterpreted (an
    * uncovered `|` would otherwise turn alternation into
    * concatenation, a different query with no error).
    */
  private def splitPattern(patBody: String): Seq[(String, Option[String])] = {
    val ms = quantified.findAllMatchIn(patBody)
      .filter(m => m.group(1) != null && m.group(1).nonEmpty)
      .toSeq
    val covered = new Array[Boolean](patBody.length)
    ms.foreach(m => java.util.Arrays.fill(covered, m.start, m.end, true))
    val leftover = patBody.zipWithIndex
      .map { case (c, i) => if (covered(i)) ' ' else c }
      .mkString.trim
    if (leftover.nonEmpty)
      throw new IllegalArgumentException(
        s"unsupported PATTERN syntax '$leftover' in: $patBody — supported " +
          "subset is sequences of VAR[+ | +? | * | ? | {n} | {n,m}] " +
          "(no alternation '|', grouping '()', PERMUTE, reluctant '*?', " +
          "or open-ended '{n,}')")
    require(ms.nonEmpty, "PATTERN body is empty")
    ms.map(m => (m.group(1), Option(m.group(2)).map(_.replaceAll("\\s", ""))))
  }

  /** Run a MATCH_RECOGNIZE text over a batch of events. */
  def detectBatch(events: Dataset[Event], sql: String): Dataset[Cep.Match] =
    Cep.detectBatch(events, parse(events.sparkSession, sql))

  /** Streaming form — same parse, the NFA's keyed-state path. */
  def detectStream(events: Dataset[Event], sql: String): Dataset[Cep.Match] =
    Cep.detectStream(events, parse(events.sparkSession, sql))

  // ---- MEASURES -------------------------------------------------------

  /** One MEASURES item: FUNC(VAR.col) AS alias. */
  final case class Measure(func: String, variable: String, column: String,
      alias: String)

  private val measureItemRe =
    raw"(?is)^(FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*([A-Za-z_][A-Za-z_0-9]*)\.(\*|[A-Za-z_][A-Za-z_0-9]*)\s*\)\s+AS\s+([A-Za-z_][A-Za-z_0-9]*)$$".r

  /** Parse the MEASURES clause (empty if absent). Subset: FIRST / LAST
    * / COUNT / SUM / AVG / MIN / MAX over `VAR.column` (COUNT also
    * takes `VAR.*`) — the SQL-standard running/final distinction
    * collapses because graft emits ONE ROW PER MATCH, where every
    * measure is final (reference semantics: StreamExecMatch.java
    * MEASURES on the match relation).
    */
  def parseMeasures(sql: String): Seq[Measure] = {
    val body = balancedBody(sql, "MATCH_RECOGNIZE")
    val at = raw"(?is)\bMEASURES\b".r.findFirstMatchIn(body) match {
      case Some(m) => m.end
      case None => return Seq.empty
    }
    val end = raw"(?is)\b(AFTER\s+MATCH|PATTERN|ONE\s+ROW|WITHIN)\b".r
      .findFirstMatchIn(body.substring(at))
      .map(_.start + at)
      .getOrElse(body.length)
    splitTopLevel(body.substring(at, end)).map { item =>
      measureItemRe.findFirstMatchIn(item) match {
        case Some(m) =>
          Measure(m.group(1).toUpperCase, m.group(2).toUpperCase,
            m.group(3).toLowerCase, m.group(4))
        case None => throw new IllegalArgumentException(
          s"unsupported MEASURES item (subset is FUNC(VAR.col) AS alias): $item")
      }
    }
  }

  /** Compute MEASURES over a match relation: one equi join of the
    * exploded (event_id, step_name) pairs back to the events, one
    * groupBy per match collecting the row-ordered (pos, label, fields)
    * structs, then each measure is a pure collection expression over
    * that array — FIRST/LAST by position, COUNT/SUM/AVG/MIN/MAX over
    * the variable's rows. No driver state; the shuffle keys are
    * event_id (join) and the match id (re-group), both well-spread.
    */
  def withMeasures(
      matches: DataFrame,
      events: DataFrame,
      measures: Seq[Measure]
  ): DataFrame = {
    import org.apache.spark.sql.Column
    require(measures.nonEmpty, "MEASURES clause is empty")
    val m = matches.withColumn("__mid", monotonically_increasing_id())
    val ex = m
      .select(
        col("__mid"), col("key"), col("start_ts"), col("end_ts"),
        posexplode(arrays_zip(col("event_ids"), col("step_names")))
          .as(Seq("__pos", "__z"))
      )
      .select(
        col("__mid"), col("key"), col("start_ts"), col("end_ts"),
        col("__pos"),
        col("__z.event_ids").as("__eid"),
        col("__z.step_names").as("__lab")
      )
    val ev = events.select(
      col("event_id").as("__eid"),
      col("ts").as("__ts"),
      col("event_type").as("__etype"),
      col("value").as("__value")
    )
    val grouped = ex
      .join(ev, Seq("__eid"))
      .groupBy(col("__mid"), col("key"), col("start_ts"), col("end_ts"))
      .agg(
        sort_array(collect_list(struct(
          col("__pos"), col("__lab"), col("__eid"), col("__ts"),
          col("__etype"), col("__value")
        ))).as("__arr")
      )
    def fieldOf(x: Column, c: String): Column = c match {
      case "event_id" => x.getField("__eid")
      case "ts" => x.getField("__ts")
      case "event_type" => x.getField("__etype")
      case "value" => x.getField("__value")
      case other => throw new IllegalArgumentException(
        s"unknown event column in MEASURES: $other")
    }
    val cols = measures.map { ms =>
      val rows = filter(col("__arr"), x => x.getField("__lab") === ms.variable)
      def vals = transform(rows, x => fieldOf(x, ms.column))
      def nums = transform(rows, x => fieldOf(x, ms.column).cast("double"))
      val c = ms.func match {
        case "FIRST" => element_at(vals, 1)
        case "LAST" => element_at(vals, -1)
        case "COUNT" => size(rows).cast("long")
        // SQL aggregate semantics: SUM/AVG over zero rows (a variable
        // that matched nothing, e.g. optional) is NULL, not 0 — the
        // non-null fold seed must not leak out for empty arrays
        case "SUM" =>
          when(size(rows) > 0, aggregate(nums, lit(0.0), (acc, x) => acc + x))
        case "AVG" =>
          when(size(rows) > 0,
            aggregate(nums, lit(0.0), (acc, x) => acc + x) / size(rows))
        case "MIN" => array_min(vals)
        case "MAX" => array_max(vals)
      }
      c.as(ms.alias)
    }
    grouped.select(
      col("key") +: col("start_ts") +: col("end_ts") +: cols: _*)
  }

  /** Run a MATCH_RECOGNIZE text with a MEASURES clause over a batch of
    * events: one row per match with (key, start_ts, end_ts) plus the
    * measure columns.
    */
  def detectBatchWithMeasures(events: Dataset[Event], sql: String): DataFrame =
    withMeasures(
      detectBatch(events, sql).toDF(),
      events.toDF(),
      parseMeasures(sql))

  /** ALL ROWS PER MATCH output mode (SQL-standard counterpart of the
    * default ONE ROW PER MATCH): one output row per MATCHED INPUT ROW,
    * carrying CLASSIFIER() (the row's pattern variable — the NFA's
    * step label) and MATCH_NUMBER() (1-based per partition, in match
    * order). match_number is a per-key window (keys are the partition
    * column — well spread; no global ordering exists, matching the
    * standard's per-partition numbering).
    */
  def detectBatchAllRows(events: Dataset[Event], sql: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = detectBatch(events, sql).toDF()
    val w = Window
      .partitionBy(col("key"))
      .orderBy(
        col("start_ts"), element_at(col("event_ids"), 1),
        col("end_ts"), element_at(col("event_ids"), -1))
    m.withColumn("match_no", row_number().over(w).cast("long"))
      .select(
        col("key"),
        col("match_no"),
        posexplode(arrays_zip(col("event_ids"), col("step_names")))
          .as(Seq("__pos", "__z"))
      )
      .select(
        col("key"),
        col("match_no"),
        (col("__pos") + 1).cast("long").as("row_in_match"),
        col("__z.event_ids").as("event_id"),
        col("__z.step_names").as("classifier")
      )
  }
}
