package graft

import graft.operators.Money
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Overflow hardening of the exact money sums: every Money aggregate
  * accumulates quotient/remainder-by-1e6 in two primitive longs, so a
  * group stays exact far past the ~7e7 rows where a single long of
  * 1e-6-dollar charge units would wrap (Money.scala header).
  */
class MoneyWideSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("sumCharge is exact on a 1e8-row group past single-long overflow") {
    val rows = 100000000L
    // max-magnitude charge: price 99999.99, no discount, 19% tax
    // per-row units = 9999999 * 100 * 119 = 118_999_988_100
    //               = 118999 * 1e6 + 988100
    assert(
      BigInt(118999988100L) * rows > BigInt(Long.MaxValue),
      "test must exceed the single-long accumulator range"
    )
    val df = spark.range(rows).select(
      lit(99999.99).as("p"), lit(0.0).as("d"), lit(0.19).as("t"))
    val got = df
      .agg(Money.sumCharge(col("p"), col("d"), col("t")).as("c"))
      .head().getDouble(0)
    // same two-term reconstruction the engine (and the DuckDB mirror)
    // evaluates, on the analytically-known accumulator totals
    val expected =
      ((118999L * rows).toDouble * 1e6 + (988100L * rows).toDouble) / 1e6
    assert(got == expected)
  }

  test("wide sum equals a decimal-exact sum on random 2-decimal prices") {
    val df = spark.range(1000000).select(
      round(rand(7) * 100000, 2).as("p"),
      round(rand(11) * 0.10, 2).as("d"))
    val wide = df
      .agg(Money.sumDiscPrice(col("p"), col("d")).as("s"))
      .head().getDouble(0)
    val exact = df
      .agg((sum(Money.discPriceUnits(col("p"), col("d")).cast("decimal(38,0)"))
        .cast("double") / lit(10000.0)).as("s"))
      .head().getDouble(0)
    assert(wide == exact)
  }

  test("wide sum is invariant to partitioning") {
    val df = spark.range(1000000).select(round(rand(3) * 100000, 2).as("p"))
    val a = df.repartition(1)
      .agg(Money.sumPrice(col("p"))).head().getDouble(0)
    val b = df.repartition(17)
      .agg(Money.sumPrice(col("p"))).head().getDouble(0)
    assert(a == b)
  }
}
