package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers for multi-dimensional data layout.
  *
  * At 100 TB the dominant scan cost is files that cannot be skipped: a
  * table laid out by one column prunes on that column only. Writing in
  * Z-value order clusters BOTH dimensions into every file, so parquet
  * min/max footer stats stay narrow on each and predicates on either
  * column skip most files (the Delta/Iceberg OPTIMIZE ZORDER BY
  * technique, from Morton 1966).
  *
  * Everything here is integer arithmetic — quantization is integral
  * division against broadcast 1-row min/max bounds and the interleave
  * is shifts and adds of disjoint bits — so Z-values are bit-identical
  * across engines and the layout stats are exactly oracle-checkable.
  */
object ZOrder {

  /** Quantize an integral column onto [0, 2^bits): scale the offset
    * from `min` by the value range using integer arithmetic only.
    * `min`/`max` are columns (typically 1-row broadcast scalars).
    */
  def quantize(x: Column, min: Column, max: Column, bits: Int): Column = {
    // ((x - min) * buckets) div (range + 1): integral and exact — the
    // numerator is reduced to an exact multiple before dividing, so
    // the double division is exact (q*b / b == q for q, b < 2^53)
    // instead of a truncation that could land one off at a boundary
    val num = (x - min) * lit(1L << bits)
    val den = max - min + lit(1L)
    ((num - pmod(num, den)) / den).cast("long")
  }

  /** Interleave the low `bits` bits of two quantized dims into a
    * 2·bits Z-value: bit j of `a` lands at 2j, of `b` at 2j+1. The
    * per-bit terms occupy disjoint positions, so plain addition
    * assembles the word.
    */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits)
      .map { j =>
        shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 2 * j) +
          shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 2 * j + 1)
      }
      .reduce(_ + _)

  /** Three-dimensional Morton interleave: bit j of `a` lands at 3j,
    * of `b` at 3j+1, of `c` at 3j+2. Same disjoint-positions argument
    * as the 2-D form; with 8-bit quantization the word stays well
    * under 63 bits (3·bits ≤ 24).
    */
  def interleave3(a: Column, b: Column, c: Column, bits: Int): Column =
    (0 until bits)
      .map { j =>
        shiftleft(shiftright(a, j).bitwiseAND(lit(1L)), 3 * j) +
          shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), 3 * j + 1) +
          shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), 3 * j + 2)
      }
      .reduce(_ + _)

  /** DuckDB mirror of [[interleave3]] (for oracles). */
  def interleave3Sql(a: String, b: String, c: String, bits: Int): String =
    (0 until bits)
      .map(j => s"((($a >> $j) & 1) << ${3 * j}) + " +
        s"((($b >> $j) & 1) << ${3 * j + 1}) + " +
        s"((($c >> $j) & 1) << ${3 * j + 2})")
      .mkString("(", " + ", ")")

  /** Write `df` to parquet in Z-order on two LONG-castable columns —
    * the OPTIMIZE ZORDER BY operator surface (Delta/Iceberg's data
    * layout command; reference: the same file-skipping goal the
    * engine's clustered sinks serve). One extra aggregate pass
    * computes the global min/max bounds (broadcast as a 1-row frame,
    * the same shape OPTIMIZE uses); rows are then range-partitioned
    * and sorted on the Morton value so every output file's parquet
    * footer min/max stays narrow on BOTH dimensions and predicates on
    * either column skip most files. At 100 TB, `numFiles` derives
    * from data volume / target file size (e.g. 1 GB files); the
    * Z-value computation itself is pure per-row column arithmetic —
    * no extra shuffle beyond the one range partitioning any ordered
    * write needs. Proven by ZOrderSpec: per-file narrowness on both
    * dimensions via this entry point.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      bits: Int = 8, numFiles: Int = 32): Unit = {
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val bounds = df.agg(
      min(a).as("__amin"), max(a).as("__amax"),
      min(b).as("__bmin"), max(b).as("__bmax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave(
        quantize(a, col("__amin"), col("__amax"), bits),
        quantize(b, col("__bmin"), col("__bmax"), bits), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The same quantize+interleave in DuckDB SQL (for oracles). */
  def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits)
      .map(j => s"((($a >> $j) & 1) << ${2 * j}) + ((($b >> $j) & 1) << ${2 * j + 1})")
      .mkString("(", " + ", ")")

  def quantizeSql(x: String, min: String, max: String, bits: Int): String =
    s"((($x) - ($min)) * ${1L << bits} // (($max) - ($min) + 1))"
}
