package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable replacement for a
  * partitionless OVER (ORDER BY ...) window, which plans a single-task
  * WindowExec funneling the entire table through one reducer.
  *
  * Pattern: range-repartition on the sort keys (cross-partition order
  * guaranteed), rank locally inside each partition, then add the
  * cumulative row-count offset of the preceding partitions via a
  * broadcast join. The only driver-side state is one row count per
  * partition (≤ numShufflePartitions values — same legitimacy class as
  * an IVF codebook). Every stage is parallel; nothing is single-task.
  *
  * Requires the key tuple to be UNIQUE (append a unique tiebreaker
  * column) — with unique keys, rank() == row_number(), and
  * percent_rank / cume_dist / ntile all derive from the global row
  * number arithmetically.
  */
object DistributedRank {

  /** Returns (df + `rankCol` with the 1-based global row number over
    * `keys`, total row count). The input is cached for the lifetime of
    * the consuming action (graft.CacheScope) because the partition
    * boundaries sampled by the range partitioner must be identical
    * between the offset-count pass and the ranking pass — the cache
    * inherently outlives this method, so the caller MUST run the
    * consuming action inside `CacheScope.scoped { ... }` (asserted
    * below; the alternative is a silent session-lifetime leak).
    */
  def globalRank(df: DataFrame, rankCol: String, keys: Column*): (DataFrame, Long) = {
    require(
      graft.CacheScope.isActive,
      "DistributedRank.globalRank pins a range-partitioned cache until the " +
        "consuming action runs; wrap the action in graft.CacheScope.scoped { ... } " +
        "so the cache is released deterministically"
    )
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parted = graft.CacheScope.cached(
      df.repartitionByRange(nPart, keys: _*)
        .withColumn("__pid", spark_partition_id())
    )
    val counts = parted
      .groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val row = (pid, acc); acc += c; row }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val local = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val ranked = parted
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, row_number().over(local) + col("__off"))
      .drop("__pid", "__off")
    (ranked, acc)
  }

  /** SQL-standard ntile bucket from a global rank: the first (n mod b)
    * buckets get ceil(n/b) rows, the rest floor(n/b).
    */
  def ntileFromRank(rank: Column, n: Long, buckets: Int): Column = {
    val q = n / buckets
    val r = n % buckets
    val big = q + 1
    if (q == 0) rank.cast("int")
    else
      when(rank <= r * big, ((rank - 1) / lit(big)).cast("long") + 1)
        .otherwise(lit(r) + ((rank - 1 - r * big) / lit(q)).cast("long") + 1)
        .cast("int")
  }

  /** percent_rank from a global rank over UNIQUE keys. */
  def percentRankFromRank(rank: Column, n: Long): Column =
    if (n <= 1) lit(0.0) else (rank - 1).cast("double") / lit((n - 1).toDouble)

  /** cume_dist from a global rank over UNIQUE keys. */
  def cumeDistFromRank(rank: Column, n: Long): Column =
    rank.cast("double") / lit(n.toDouble)
}
