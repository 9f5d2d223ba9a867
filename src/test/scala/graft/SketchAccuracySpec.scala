package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates (HLL count-distinct, approximate quantiles)
  * have no exact oracle by construction — these specs bound their
  * error against the exact answers instead.
  */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  test("sketch expressions participate in whole-stage codegen (no fallback)") {
    import org.apache.spark.sql.execution.debug._
    graft.functions.SketchExpressions.register(spark)
    val docs = Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val df = docs.select(
      graft.functions.SketchExpressions
        .minhash_signature(graft.functions.SketchExpressions.word_shingles(col("text")))
        .as("sig"),
      graft.functions.SketchExpressions
        .simhash64(split(col("text"), " ")).as("sh")
    )
    val code = codegenString(df.queryExecution.executedPlan)
    // the generated projection calls the static kernels — i.e. the
    // expressions compiled instead of triggering CodegenFallback
    assert(code.contains("MinHashSignature.compute"), "minhash not codegen'd")
    assert(code.contains("WordShingles.compute"), "shingles not codegen'd")
    assert(code.contains("SimHash64.compute"), "simhash not codegen'd")
    assert(!code.contains("CodegenFallback"), "fallback present in plan")
    // and the codegen'd path computes the same values as eval
    assert(df.limit(5).collect().forall(r => r.getSeq[Long](0).nonEmpty))
  }

  test("struct_term_sum: codegen'd, bit-identical to the interpreted ordered fold") {
    graft.functions.SketchExpressions.register(spark)
    val docs = Engine.Tables(spark, "/root/testdata/sf0.001").documents
    // per-doc sorted (word, term) structs — the exact shape the
    // bm25 score fold feeds it
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("word"),
        (col("c") * lit(0.1234567) - lit(0.7)).as("term"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("word"), col("term")))).as("arr"))
    val both = terms.select(
      graft.functions.SketchExpressions.struct_term_sum(col("arr")).as("native"),
      aggregate(col("arr"), lit(0.0), (acc, x) => acc + x.getField("term"))
        .as("interp"))
    // bit-identical, not approximately equal: same seed, same order
    assert(both.collect().forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    import org.apache.spark.sql.execution.debug._
    val code = codegenString(
      terms.select(graft.functions.SketchExpressions.struct_term_sum(col("arr")))
        .queryExecution.executedPlan)
    assert(!code.contains("CodegenFallback"), "struct_term_sum fell back")
  }

  test("approx_count_distinct within 5% of exact") {
    val t = Engine.Tables(spark, "/root/testdata/sf0.01")
    val row = t.lineitem
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx")
      )
      .collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within 2% of exact percentile") {
    val t = Engine.Tables(spark, "/root/testdata/sf0.01")
    val row = t.events
      .agg(
        expr("percentile(value, 0.9)").as("exact"),
        percentile_approx(col("value"), lit(0.9), lit(5000)).as("approx")
      )
      .collect()(0)
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / math.max(1.0, exact) < 0.02,
      s"approx=$approx exact=$exact")
  }

  test("q_agg_approx_distinct: within 2% of exact and partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        r.getAs[Long]("approx_cust")).toMap
    val exact = Engine.Tables(spark, dir).orders
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("uniq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    rows.foreach { case (k, approx) =>
      val e = exact(k)
      assert(math.abs(approx - e).toDouble / e < 0.02,
        s"status $k: approx=$approx exact=$e")
    }
    // the HLL registers merge commutatively: any partitioning of the
    // same rows must sketch to the same value (the scale guarantee)
    val repart = Engine.Tables(spark, dir).orders
      .repartition(7, col("o_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx_cust"))
      .collect().map(r => r.getAs[String]("o_orderstatus") ->
        r.getAs[Long]("approx_cust")).toMap
    assert(repart == rows, "sketch value changed under repartitioning")
  }

  test("q_agg_approx_percentiles: within 2% of the exact per-group percentiles") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_agg_approx_percentiles")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val exact = Engine.Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k p50 approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$k p95 approx=$a95 exact=$e95")
    }
  }

  test("HLL inclusion-exclusion set overlap within 5% of exact") {
    // sketch algebra: |A ∩ B| ≈ |A| + |B| − |A ∪ B| from three HLL
    // estimates — the corpus-overlap estimation a 100 TB dedup pass
    // runs before committing to an exact join (each side one sketch,
    // no shuffle of the raw keys)
    import org.apache.spark.sql.functions._
    val t = Engine.Tables(spark, "/root/testdata/sf0.01")
    val a = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val b = col("o_orderstatus") === "O"
    val row = t.orders.agg(
      approx_count_distinct(when(a, col("o_custkey")), 0.01).as("ca"),
      approx_count_distinct(when(b, col("o_custkey")), 0.01).as("cb"),
      approx_count_distinct(when(a || b, col("o_custkey")), 0.01).as("cu"),
      // exact SET sizes (note: a set-intersection membership test
      // cannot be a row-level `a && b` — a customer is in A ∩ B via
      // DIFFERENT rows; exact inclusion-exclusion gets it right)
      countDistinct(when(a, col("o_custkey"))).as("ea"),
      countDistinct(when(b, col("o_custkey"))).as("eb"),
      countDistinct(when(a || b, col("o_custkey"))).as("eu")
    ).collect()(0)
    val est = row.getLong(0) + row.getLong(1) - row.getLong(2)
    val exact = (row.getLong(3) + row.getLong(4) - row.getLong(5)).toDouble
    assert(exact > 0, "test data should have overlap")
    // three 1%-rsd sketches compound: allow 5% on the difference
    assert(math.abs(est - exact) / exact < 0.05,
      s"overlap est=$est exact=$exact")
  }
}
