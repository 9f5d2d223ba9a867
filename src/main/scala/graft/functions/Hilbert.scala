package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hilbert-curve data layout — the second space-filling curve next to
  * [[ZOrder]] (Iceberg's OPTIMIZE supports both; Hilbert preserves
  * locality strictly better than Morton: consecutive curve positions
  * are ALWAYS grid-adjacent, so per-file bounding boxes after a sorted
  * write are tighter on average).
  *
  * The index needs per-level rotation state (the classic iterative
  * xy→d walk), so unlike Morton it is not a per-bit shift/add formula;
  * it runs as a native Catalyst expression whose generated code calls
  * the static kernel — one JIT'd call per row inside whole-stage
  * codegen, zero shuffle. No SQL engine exposes Hilbert, so there is
  * no DuckDB oracle; HilbertSpec proves the defining properties
  * (bijection, unit-step adjacency, agreement with an independent
  * per-level table-driven implementation) and the same per-file
  * narrowness ZOrderSpec proves for Morton.
  *
  * Reference scope: data-layout write path (the same file-skipping
  * goal the reference's clustered sinks serve); curve construction
  * from Hilbert 1891 via the standard bit-twiddling walk (Hamilton,
  * "Compact Hilbert Indices", 2006 — public algorithm).
  */
object Hilbert {

  /** Map grid cell (x, y) in [0, 2^order)² to its position along the
    * order-`order` Hilbert curve. Iterative top-down walk: at each
    * level the quadrant contributes s² cells and the frame is
    * rotated/reflected for the next level.
    */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk d → (x, y); spec-only (bijection proof). */
  def d2xy(order: Int, dIn: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index",
      es => HilbertIndex(es(0), es(1), es(2).eval().asInstanceOf[Int]),
      "built-in"
    )

  /** Column API (requires register() on the session first): Hilbert
    * position of two already-quantized long columns (use
    * [[ZOrder.quantize]] for the quantization — same bounds pattern).
    */
  def hilbert_index(a: Column, b: Column, order: Int): Column =
    call_function("hilbert_index", a, b, lit(order))

  /** Write `df` to parquet in Hilbert order on two LONG-castable
    * columns — same surface as [[ZOrder.writeZOrdered]], same single
    * bounds pass + range partitioning, different curve.
    */
  def writeHilbertOrdered(df: DataFrame, colA: String, colB: String,
      path: String, bits: Int = 8, numFiles: Int = 32): Unit = {
    register(df.sparkSession)
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val bounds = df.agg(
      min(a).as("__amin"), max(a).as("__amax"),
      min(b).as("__bmin"), max(b).as("__bmax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__h", hilbert_index(
        ZOrder.quantize(a, col("__amin"), col("__amax"), bits),
        ZOrder.quantize(b, col("__bmin"), col("__bmax"), bits), bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__amin", "__amax", "__bmin", "__bmax", "__h")
      .write.mode("overwrite").parquet(path)
  }
}

/** hilbert_index(x, y, order): curve position of a quantized cell. */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order > 0 && order <= 31, s"order must be in [1,31], got $order")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects two bigint, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(order, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert.xy2d($order, $a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
