package graft

import graft.functions.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: a fragmented directory is rewritten into few files with
  * byte-identical content (same rows, same aggregate fingerprint) and
  * the swap never loses data.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def fingerprint(path: String) =
    spark.read.parquet(path)
      .agg(
        count(lit(1)).as("n"),
        sum(hash(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")).cast("long")).as("h"))
      .collect()(0)

  test("compact rewrites many small files into few, content-identical") {
    val dir = "/tmp/graft_compaction_spec"
    val li = Engine.Tables(spark, "/root/testdata/sf0.01").lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    // simulate an over-parallel write: 64 tiny files
    li.repartition(64).write.mode("overwrite").parquet(dir)
    val before = fingerprint(dir)
    val report = Compaction.compact(spark, dir, targetBytes = 4L * 1024 * 1024)
    val after = fingerprint(dir)
    assert(report.filesBefore == 64, s"expected 64 source files, ${report.filesBefore}")
    assert(report.filesAfter < 8, s"still fragmented: ${report.filesAfter} files")
    assert(report.rows == before.getLong(0))
    assert(after == before, "content changed by compaction")
    // tmp/backup dirs are gone
    assert(!new java.io.File(dir + "_graft_compact_tmp").exists())
    assert(!new java.io.File(dir + "_graft_pre_compact").exists())
  }

  test("compact is a no-op-safe idempotent maintenance job") {
    val dir = "/tmp/graft_compaction_spec_idem"
    val li = Engine.Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    li.repartition(16).write.mode("overwrite").parquet(dir)
    val r1 = Compaction.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    val r2 = Compaction.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(r1.rows == r2.rows)
    assert(r2.filesBefore == r1.filesAfter)
    assert(r2.filesAfter == r1.filesAfter, "second compaction changed layout")
  }
}
