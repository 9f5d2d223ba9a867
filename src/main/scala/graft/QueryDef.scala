package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark-side builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same tables. Queries without an oracle get a weaker
  * rows-only check from the driver and a dedicated ScalaTest spec here.
  *
  * Determinism contract (so the driver's sorted-hash compare passes):
  *  - every computed column is aliased identically on both sides;
  *  - aggregate doubles are `round(x, 4)` (fp summation order differs
  *    between engines); pure per-row arithmetic is left exact (IEEE ops
  *    in the same order are bit-identical);
  *  - timestamps are never returned raw — always epoch seconds
  *    (BIGINT) or DATE (events.ts is ns in parquet, µs in Spark);
  *  - rankings order by a unique composite key, never a bare double;
  *  - any rounded score column that can straddle zero normalizes
  *    signed zero on the oracle side (`round(...) + 0.0`): libm round
  *    emits -0.0 for a tiny negative, Spark's BigDecimal round emits
  *    +0.0 — equal under `==`, different under the driver's raw-bit
  *    hash (see README "Determinism contract", signed-zero rule).
  */
final case class QueryDef(
    name: String,
    builder: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

trait QueryModule {
  def defs: Seq[QueryDef]
  protected def tables(spark: SparkSession, dir: String): Engine.Tables =
    Engine.Tables(spark, dir)

  /** r21 (guide §2.5 "input skew"): input-parallelism floor for
    * CPU-heavy per-row passes. A single-row-group parquet file scans
    * as ONE task no matter the split size, serializing shingling /
    * rolling-hash / sketch passes on one core. Repartition ONLY when
    * the scan's parallelism is below the cluster's default — at
    * deployment scale (thousands of splits) the branch is a no-op and
    * the exchange never enters the plan. Applied selectively to passes
    * whose per-row CPU dominates; the measured engine-wide variant
    * taxed every scan-light consumer with a payload shuffle and was
    * reverted (OPTIMIZATION_r21.md).
    *
    * CONTRACT (r21 ADVICE): `df` must be a RAW TABLE SCAN. The
    * partition-count probe below builds df's physical RDD eagerly at
    * query-construction time — cheap for a parquet scan (file split
    * math), but a silent planning/execution cost if ever applied to a
    * derived or cached DataFrame.
    */
  protected def ensureParallelInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
