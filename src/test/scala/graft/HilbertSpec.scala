package graft

import graft.functions.Hilbert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert curve layout: defining properties of the index (bijection
  * over the grid, unit-step adjacency — the property Morton does NOT
  * have), codegen participation, and the same per-file narrowness
  * proof ZOrderSpec runs for the Morton write path.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("xy2d is a bijection on the 2^order x 2^order grid") {
    val order = 5
    val n = 1 << order
    val seen = new Array[Boolean](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = Hilbert.xy2d(order, x, y)
      assert(d >= 0 && d < n * n, s"($x,$y) -> $d out of range")
      assert(!seen(d.toInt), s"collision at d=$d")
      seen(d.toInt) = true
      // and the inverse walk returns home
      assert(Hilbert.d2xy(order, d) == ((x.toLong, y.toLong)))
    }
  }

  test("consecutive curve positions are always grid-adjacent") {
    // THE Hilbert property (Morton fails it at quadrant seams): cells
    // d and d+1 differ by exactly one unit step in exactly one axis
    val order = 6
    val n = 1 << order
    var d = 0L
    var prev = Hilbert.d2xy(order, 0L)
    while (d < n.toLong * n - 1) {
      d += 1
      val cur = Hilbert.d2xy(order, d)
      val dist = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(dist == 1, s"step $d jumps $dist (${prev} -> ${cur})")
      prev = cur
    }
  }

  test("hilbert_index expression codegens and agrees with the kernel") {
    import org.apache.spark.sql.execution.debug._
    Hilbert.register(spark)
    val df = spark.range(0, 256)
      .select((col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
      .select(col("x"), col("y"), Hilbert.hilbert_index(col("x"), col("y"), 4).as("h"))
    val code = codegenString(df.queryExecution.executedPlan)
    assert(code.contains("Hilbert.xy2d"), "hilbert_index not codegen'd")
    df.collect().foreach { r =>
      assert(r.getLong(2) == Hilbert.xy2d(4, r.getLong(0), r.getLong(1)))
    }
  }

  test("hilbert-ordered WRITE produces parquet files narrow on both dimensions") {
    val li = Engine.Tables(spark, dir).lineitem.select(
      datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01")))
        .cast("long").as("d_day"),
      col("l_partkey").as("pk"))
    val out = "/tmp/graft_hilbert_write_spec"
    Hilbert.writeHilbertOrdered(li, "d_day", "pk", out, bits = 8, numFiles = 32)
    val written = spark.read.parquet(out)
    assert(written.columns.sorted.toSeq == Seq("d_day", "pk"))
    assert(written.count() == li.count())
    val perFile = written
      .groupBy(input_file_name().as("f"))
      .agg(
        (max(col("d_day")) - min(col("d_day"))).as("day_spread"),
        (max(col("pk")) - min(col("pk"))).as("pk_spread"))
      .collect()
    assert(perFile.length >= 16, s"expected many files, got ${perFile.length}")
    val g = li.agg(
      (max(col("d_day")) - min(col("d_day"))).as("dr"),
      (max(col("pk")) - min(col("pk"))).as("pr")).collect()(0)
    def avgOf(c: String) =
      perFile.map(_.getAs[Long](c).toDouble).sum / perFile.length
    val dayFrac = avgOf("day_spread") / g.getLong(0)
    val pkFrac = avgOf("pk_spread") / g.getLong(1)
    assert(dayFrac < 0.4, s"file day spread $dayFrac")
    assert(pkFrac < 0.4, s"file pk spread $pkFrac")
  }
}
