package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scalar functions the reference has and Spark lacks as
  * built-ins (SURVEY.md §7.1 / §2.8: IS_DECIMAL / IS_DIGIT /
  * IS_ALPHA, SPLIT_INDEX, TEMPORAL_OVERLAPS — reference
  * BuiltInFunctionDefinitions.java and FlinkSqlOperatorTable.java).
  * Each composes codegen'd built-ins, so they stay inside whole-stage
  * codegen with no UDF boundary.
  */
object GapFunctions {

  /** TRUE iff the string parses as a SQL decimal number. */
  def is_decimal(c: Column): Column =
    c.rlike("^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$")

  /** TRUE iff every character is a digit (non-empty). */
  def is_digit(c: Column): Column = c.rlike("^[0-9]+$")

  /** TRUE iff every character is a letter (non-empty). */
  def is_alpha(c: Column): Column = c.rlike("^[A-Za-z]+$")

  /** Flink SPLIT_INDEX(str, sep, idx) — idx is 0-based; null when out
    * of range (element_at is 1-based and throws/nulls differently).
    */
  def split_index(str: Column, sep: String, idx: Int): Column = {
    val arr = split(str, java.util.regex.Pattern.quote(sep))
    when(size(arr) > idx, element_at(arr, idx + 1))
  }

  /** TEMPORAL_OVERLAPS: [s1, e1) and [s2, e2) share any instant —
    * SQL's (s1,e1) OVERLAPS (s2,e2).
    */
  def temporal_overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 < e2 && s2 < e1
}
