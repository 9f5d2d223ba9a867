package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the OPTIMIZE-compact half of the layout
  * maintenance family ([[ZOrder]]/[[Hilbert]] are the clustering
  * half). Streaming sinks and over-parallel writes leave thousands of
  * KB-sized parquet files; at 100 TB that turns every scan's task
  * scheduling and footer-reading into the bottleneck. Compaction
  * rewrites a directory into ~targetBytes files:
  *
  *   1. list the directory (Hadoop FS — works on HDFS/S3A/local),
  *   2. choose numFiles = ceil(totalBytes / targetBytes),
  *   3. rewrite via repartition(numFiles) into a sibling tmp dir,
  *   4. verify the rewritten row count equals the source,
  *   5. swap directories (move-aside, then rename into place).
  *
  * The swap is rename-based: atomic on HDFS/local, best-effort on
  * object stores (a table format's metadata commit is the real fix
  * there — out of scope). The verify step runs BEFORE the swap, so a
  * failed rewrite never replaces good data; a crash between the two
  * renames leaves the `_graft_pre_compact` backup next to the data.
  */
object Compaction {

  final case class Report(
      filesBefore: Int,
      filesAfter: Int,
      bytesBefore: Long,
      bytesAfter: Long,
      rows: Long)

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(d: Path) =
      fs.listStatus(d).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))

    val before = dataFiles(p)
    val bytesBefore = before.map(_.getLen).sum
    val numFiles = math.max(1, math.ceil(bytesBefore.toDouble / targetBytes).toInt)

    val src = spark.read.parquet(dir)
    val srcRows = src.count()
    val tmp = new Path(dir + "_graft_compact_tmp")
    fs.delete(tmp, true)
    src.repartition(numFiles).write.parquet(tmp.toString)

    val rewrittenRows = spark.read.parquet(tmp.toString).count()
    require(rewrittenRows == srcRows,
      s"compaction row mismatch: src=$srcRows rewritten=$rewrittenRows — aborting before swap")

    val backup = new Path(dir + "_graft_pre_compact")
    fs.delete(backup, true)
    if (!fs.rename(p, backup))
      throw new java.io.IOException(s"could not move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(backup, p) // restore
      throw new java.io.IOException(s"could not move compacted dir into place")
    }
    fs.delete(backup, true)

    val after = dataFiles(p)
    Report(before.length, after.length, bytesBefore, after.map(_.getLen).sum, srcRows)
  }
}
