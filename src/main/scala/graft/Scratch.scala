package graft

import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t = Engine.Tables(spark, dir)
    graft.functions.SketchExpressions.register(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val words = split(col("text"), " ")
    val shingleCol = when(size(words) < 3, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(0), size(words) - 3),
        i => concat_ws(" ", element_at(words, i + 1), element_at(words, i + 2), element_at(words, i + 3)))))
    val shingled = t.documents.select(col("doc_id"), shingleCol.as("shingles"))
      .filter(size(col("shingles")) > 0)

    time("shingles only")(shingled.write.format("noop").mode("overwrite").save())
    val sig = shingled.select(col("doc_id"), col("shingles"),
      graft.functions.SketchExpressions.minhash_signature(col("shingles")).as("sig"))
    time("shingles+sig")(sig.write.format("noop").mode("overwrite").save())
    val bandHashes = (0 until 16).map(b => hash(slice(col("sig"), b * 4 + 1, 4), lit(b)))
    val banded = sig.select(col("doc_id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("d1"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("d2"))
    val cand = l.join(r, Seq("band", "bucket")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    println("[scratch] candidates: " + time("cand join")(cand.count()))
    val full = operators.DedupQueries.defs.find(_.name == "q_dedup_minhash_lsh").get
    time("full pipeline")(full.builder(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
