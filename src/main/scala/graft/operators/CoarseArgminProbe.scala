package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (r22, VERDICT watch item): measures the kept
  * coarse-quantizer argmin — ONE interpreted `transform`/`array_min`
  * projection over a k-entry broadcast codebook array — against the
  * pre-r21 codegen crossJoin + row_number-window form, at the LARGE k
  * the local corpora never reach (SemDeDup's cap is 65536 lists; the
  * sf0.1 path derives k = 32). The r21 keep was measured at k ≈ 16-32;
  * this probe answers whether the interpreted k-dot-product loop still
  * holds up when k grows by orders of magnitude, and documents the
  * revert threshold. Synthetic deterministic vectors (hash-derived, no
  * RNG), codebook = the first k vectors — the arithmetic and
  * tie-breaks are the production kernel's own
  * (SimilarityQueries.nearestListId). Diagnostic only: never feeds the
  * published bench/verify JSON.
  *
  *   sbt "runMain graft.operators.CoarseArgminProbe [n] [dim] [k1,k2,...]"
  */
object CoarseArgminProbe {

  private def timeNoop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val ks = (if (args.length > 2) args(2) else "32,1024,8192")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SketchExpressions.register(spark)
    import graft.functions.SketchExpressions.dot_product

    // deterministic synthetic corpus: v[j] = (xxhash64(id, j) mod 1000)/1000
    val e = spark.range(0L, n, 1L, cpus.toInt)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => (pmod(xxhash64(col("id"), j), lit(1000L)) / lit(1000.0)))
          .as("v"))
      .withColumn("n2", dot_product(col("v"), col("v")))
      .localCheckpoint() // time the assignment, not the synthesis

    ks.foreach { k =>
      val cents = e.filter(col("vec_id") < k)
        .select(col("vec_id"), col("v"), col("n2"))
        .collect()
        .sortBy(_.getLong(0))
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1), r.getDouble(2)) }
        .toSeq

      // (a) kept form: 1-row broadcast codebook array, array_min projection
      import spark.implicits._
      val cb = cents.toDF("list_id", "cv", "cn2")
        .agg(array_sort(collect_list(
          struct(col("list_id"), col("cv"), col("cn2")))).as("cb"))
      val proj = e.crossJoin(broadcast(cb))
        .select(col("vec_id"),
          SimilarityQueries.nearestListId(col("cb"), col("v"), col("n2"))
            .as("list_id"))

      // (b) pre-r21 form: k-row broadcast crossJoin fanout + window argmin
      import org.apache.spark.sql.expressions.Window
      val cdf = cents.toDF("list_id", "cv", "cn2")
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("rd"), col("list_id"))
      val win = e.crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("list_id"),
          round(col("n2") - lit(2.0) * dot_product(col("v"), col("cv"))
            + col("cn2"), 6).as("rd"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("list_id"))

      // alternate a/b twice each; report min
      val times = (1 to 2).map { _ =>
        (timeNoop(proj), timeNoop(win))
      }
      val pa = times.map(_._1).min
      val pb = times.map(_._2).min
      println(f"[argmin-probe] n=$n dim=$dim k=$k " +
        f"projection=$pa%.2f s window=$pb%.2f s ratio=${pa / pb}%.2f")
    }
    spark.stop()
  }
}
