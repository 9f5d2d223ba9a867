package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join — the scale-correct plan for a range
  * predicate with NO equi key (point ∈ [start, end]), e.g. ship-date
  * vs promo windows, IP vs CIDR blocks, reading-frame overlaps.
  *
  * The naive plan is a nested-loop/cartesian (O(N·M) at 100 TB, the
  * classic silent killer). The banded rewrite (the shape behind
  * Databricks' RANGE_JOIN hint and Flink's interval-join bucketing):
  *
  *   1. pick a bin width ~ the typical interval length,
  *   2. explode each interval into the bins it covers
  *      (ceil(len/width) + 1 rows — bounded fan-out),
  *   3. map each point to its single bin (exactly one, so no dedup is
  *      needed: a qualifying pair meets in precisely the point's bin),
  *   4. equi-join on the bin — a plain shuffled hash join —
  *   5. re-check the exact range predicate on the collisions.
  *
  * Cost: |points| + |intervals|·avg_bins shuffled rows, and only
  * same-bin pairs are compared. Correctness is structural: the point's
  * bin is covered by every interval containing the point.
  */
object RangeJoin {

  /** Join `points` (with long column `point`) to `intervals` (with
    * long columns `start`, `end`, inclusive) on
    * start <= point <= end. Column name sets must be disjoint.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn(
      "__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long")))
    )
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
