package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money accumulation on long cents.
  *
  * The TPC-H-ish price/rate columns are exact 2-decimal values stored
  * as doubles (verified: max |x*100 - round(x*100)| < 1e-8 across the
  * testdata SFs). Summing them as doubles drifts with partitioning /
  * summation order past round(4) at 1e9+ magnitudes; summing as
  * decimal is exact but costs ~3x (UnsafeRow decimal accumulators,
  * round 2 bench). Instead: scale to integers once per row
  * (`round(x*100)` → long, exact), sum as longs (codegen-friendly,
  * map-side partial agg stays on primitives), divide back once at the
  * end. `price*(1-disc)` is exact in 1e-4 dollars and
  * `price*(1-disc)*(1+tax)` in 1e-6 dollars, since disc/tax are also
  * 2-decimal.
  *
  * Overflow bound: charge micro-units are <= ~1.2e11/row, so a long
  * sum is exact to ~7e7 rows *per group* (sf~50 for the 4-group Q1
  * shape). Past that, switch the accumulator to decimal(38,6) or add
  * a second-level reaggregation — at the tested SFs (and the driver's
  * sf0.01/sf0.1/sf1) long is provably exact.
  *
  * Every builder has a `...Sql` mirror producing the *same* arithmetic
  * in SQL text that parses identically in Spark SQL and DuckDB (DuckDB
  * sums BIGINT into HUGEINT — no overflow on the oracle side — and its
  * double→BIGINT cast rounds where Spark truncates, but both apply to
  * an already-integral double here).
  */
object Money {

  /** Exact integer cents / hundredths of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  def centsSql(c: String): String = s"CAST(round(($c)*100) AS BIGINT)"

  /** sum(price) exactly, returned as double dollars. */
  def sumPrice(c: Column): Column =
    sum(cents(c)).cast("double") / lit(100.0)

  def sumPriceSql(c: String): String =
    s"CAST(sum(${centsSql(c)}) AS DOUBLE) / 100.0"

  /** sum(DISTINCT price) exactly — distinct classes on cents coincide
    * with distinct classes on the 2-decimal values. */
  def sumDistinctPrice(c: Column): Column =
    sum_distinct(cents(c)).cast("double") / lit(100.0)

  def sumDistinctPriceSql(c: String): String =
    s"CAST(sum(DISTINCT ${centsSql(c)}) AS DOUBLE) / 100.0"

  /** Row-level exact units: price * (1 - disc) in 1e-4 dollars. Use
    * when a query needs the pre-aggregation value — e.g. conditional
    * sums or num/denom ratios where both sides must stay integral
    * until the final division. */
  def discPriceUnits(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))

  def discPriceUnitsSql(price: String, disc: String): String =
    s"${centsSql(price)} * (100 - ${centsSql(disc)})"

  /** sum(price * (1 - disc)) exactly (1e-4-dollar units internally). */
  def sumDiscPrice(price: Column, disc: Column): Column =
    sum(discPriceUnits(price, disc)).cast("double") / lit(10000.0)

  def sumDiscPriceSql(price: String, disc: String): String =
    s"CAST(sum(${discPriceUnitsSql(price, disc)}) AS DOUBLE) / 10000.0"

  /** Row-level exact units: price * quantity in cents. Quantity must
    * be an integral-valued column (the TPC-H-ish l_quantity is);
    * Spark's double→long cast truncates where DuckDB's rounds, but
    * both agree on an already-integral double. */
  def priceQtyUnits(price: Column, qty: Column): Column =
    cents(price) * qty.cast("long")

  def priceQtyUnitsSql(price: String, qty: String): String =
    s"${centsSql(price)} * CAST($qty AS BIGINT)"

  /** sum(price * quantity) exactly, returned as double dollars. */
  def sumPriceQty(price: Column, qty: Column): Column =
    sum(priceQtyUnits(price, qty)).cast("double") / lit(100.0)

  def sumPriceQtySql(price: String, qty: String): String =
    s"CAST(sum(${priceQtyUnitsSql(price, qty)}) AS DOUBLE) / 100.0"

  /** sum(price * (1 - disc) * (1 + tax)) exactly (1e-6-dollar units). */
  def sumCharge(price: Column, disc: Column, tax: Column): Column =
    sum(cents(price) * (lit(100L) - cents(disc)) * (lit(100L) + cents(tax)))
      .cast("double") / lit(1000000.0)

  def sumChargeSql(price: String, disc: String, tax: String): String =
    s"CAST(sum(${centsSql(price)} * (100 - ${centsSql(disc)}) * (100 + ${centsSql(tax)})) AS DOUBLE) / 1000000.0"
}
