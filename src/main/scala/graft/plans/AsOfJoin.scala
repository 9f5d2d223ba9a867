package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the columns of the
  * latest right row with the same key and `right.time <= left.time`
  * (inclusive). Inner semantics — left rows with no prior right row are
  * dropped.
  *
  * Reference semantics: Flink temporal/versioned join
  * (flink-table/flink-table-planner-blink/.../exec/stream/
  * StreamExecTemporalJoin.java:67, runtime operators/join/temporal/
  * TemporalRowTimeJoinOperator.java).
  *
  * Spark-first design — NOT a per-row lookup: both sides are unioned
  * with a side tag, shuffled ONCE on the key, and a per-key ordered
  * window propagates the most recent right-side values onto left rows
  * via `last(_, ignoreNulls = true)`. This is a single shuffle + one
  * per-partition sort regardless of data size, the same asymptotics as
  * a sort-merge join; at cluster scale it never builds a per-key map
  * and never collects anything to the driver. Ties at identical
  * timestamps: the right row sorts first (tag 0 < 1), so an equal-time
  * right row IS visible to the left row, matching `l.ts >= r.ts`.
  *
  * `rightCols` must not collide with left column names (rename before
  * calling).
  */
object AsOfJoin {
  private val TAG = "__asof_tag"

  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightCols: Seq[String]
  ): DataFrame = {
    require(
      rightCols.forall(c => !left.columns.contains(c)),
      s"rightCols ${rightCols.mkString(",")} must not collide with left columns"
    )
    val l = left.withColumn(TAG, lit(1))
    val r = right
      .select((Seq(key, time) ++ rightCols).map(col): _*)
      .withColumn(TAG, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time), col(TAG))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(TAG) === 1 && rightCols.map(col(_).isNotNull).reduce(_ && _))
      .drop(TAG)
  }

  /** Forward as-of: attach the EARLIEST right row with `right.time >=
    * left.time` (inclusive). Same single-shuffle window mechanism,
    * time-descending; at equal timestamps the right row sorts first so
    * it is visible to the left row, matching `l.ts <= r.ts`.
    */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightCols: Seq[String]
  ): DataFrame = {
    require(
      rightCols.forall(c => !left.columns.contains(c)),
      s"rightCols ${rightCols.mkString(",")} must not collide with left columns"
    )
    val l = left.withColumn(TAG, lit(1))
    val r = right
      .select((Seq(key, time) ++ rightCols).map(col): _*)
      .withColumn(TAG, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time).desc, col(TAG))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(TAG) === 1 && rightCols.map(col(_).isNotNull).reduce(_ && _))
      .drop(TAG)
  }
}
