package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-prep funnel's scan-local stages
  * (PipelineQueries.corpusFlags: language allowlist, quality,
  * repetition, head-span dedup key) run UNCHANGED on a stream — no
  * shuffle, no state — so streaming corpus ingest filters rows with
  * the exact batch semantics, and head-span dedup becomes Spark's
  * watermark-bounded dropDuplicates. This spec pins batch/stream
  * parity of the flags and the streaming dedup on the dedup_key.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("stage flags agree batch vs stream on the same documents") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val docs = Engine.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val batch = CacheScope.scoped {
      operators.PipelineQueries.corpusFlags(docs)
        .select(col("doc_id"), col("s1"), col("s2"), col("s3"))
        .collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
        .toMap
    }

    val rows = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    in.addData(rows.toIndexedSeq: _*)
    val flagged = operators.PipelineQueries.corpusFlags(
      in.toDF().toDF("doc_id", "text", "lang"))
      .select(col("doc_id"), col("s1"), col("s2"), col("s3"))
    val q = flagged.writeStream.format("memory")
      .queryName("funnel_flags_out").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.sql("SELECT * FROM funnel_flags_out").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.values.exists(_._3) && batch.values.exists(!_._3))
  }

  test("streaming head-span dedup keeps one doc per dedup_key") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val words20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    in.addData(
      (1L, s"$words20 tail one", ts(0)),   // first occurrence of the head
      (2L, s"$words20 other tail", ts(1)), // same head span → dropped
      (3L, "completely different head text", ts(2))
    )
    val deduped = in.toDF().toDF("doc_id", "text", "ingest_ts")
      .withColumn("dedup_key",
        array_join(slice(split(col("text"), " "), 1, 20), " "))
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("dedup_key")
    val q = deduped.writeStream.format("memory")
      .queryName("funnel_dedup_out").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val kept = spark.sql("SELECT doc_id FROM funnel_dedup_out")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("whole funnel as ONE streaming query: survivors == batch, out-of-order") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val docs = Engine.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("lang"))
    // batch truth: the s3 survivor key set (one keeper per key — the
    // funnel's n4 is exactly its size)
    val batchKeys = CacheScope.scoped {
      operators.PipelineQueries.corpusFlags(docs).filter(col("s3"))
        .select(col("dedup_key")).distinct()
        .collect().map(_.getString(0)).toSet
    }

    // stream the same docs with event times DECOUPLED from arrival
    // order (out-of-order delivery across two micro-batches)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = docs.collect().map { r =>
      val id = r.getLong(0)
      (id, r.getString(1), r.getString(2),
        new java.sql.Timestamp(base.getTime + (id % 97) * 60000L))
    }
    val scrambled = rows.sortBy(t => (t._1 * 2654435761L) % 1000003L)
    val in = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val out = operators.PipelineQueries.streamingFunnel(
      in.toDF().toDF("doc_id", "text", "lang", "ingest_ts"), "2 hours")
      .select(col("dedup_key"))
    val q = out.writeStream.format("memory")
      .queryName("funnel_stream_out").outputMode("append").start()
    try {
      val (a, b) = scrambled.splitAt(scrambled.length / 2)
      in.addData(a.toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql("SELECT dedup_key FROM funnel_stream_out")
      .collect().map(_.getString(0))
    // exactly one survivor per key, and the same key set as batch
    assert(streamed.length == batchKeys.size)
    assert(streamed.toSet == batchKeys)
    assert(batchKeys.nonEmpty)
  }
}
