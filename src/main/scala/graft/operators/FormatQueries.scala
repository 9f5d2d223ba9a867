package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 source/sink formats beyond parquet: CSV, JSON, ORC (reference
  * flink-formats/{flink-csv,flink-json,flink-orc}). Each query writes
  * a projection of a parquet table to the format under a scratch dir,
  * reads it back with a declared schema (schemas are declared, not
  * inferred — the reference's DDL model), and aggregates. The oracle
  * aggregates the original table: the check passes iff the round-trip
  * is lossless.
  */
object FormatQueries extends QueryModule {

  private def scratch(fmt: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_fmt/$fmt"

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)
  ))

  private def roundTrip(s: SparkSession, dir: String, fmt: String) = {
    val src = tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val path = scratch(fmt)
    src.write.mode("overwrite").format(fmt).save(path)
    val back = fmt match {
      case "csv" => s.read.schema(schema).option("header", "false").csv(path)
      case "json" => s.read.schema(schema).json(path)
      case other => s.read.format(other).load(path)
    }
    back
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        // exact long-cents accumulation (Money.scala): double summation
        // order differs between engines and partitionings, and at 1e10
        // magnitude the drift survives round(4)
        Money.sumPrice(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  private val oracle = s"""
    SELECT o_orderstatus, count(*) AS n,
           ${Money.sumPriceSql("o_totalprice")} AS total,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
  """

  /** XML round-trip (reference flink-formats; Spark 4 bundles the XML
    * source in spark-sql with the short name "xml" registered). rowTag
    * is mandatory on both sides — the writer wraps rows in it, the
    * reader splits on it; doubles survive exactly via the default
    * java.lang.Double round-trip text form.
    */
  private def xmlRoundTrip(s: SparkSession, dir: String) = {
    val src = tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val path = scratch("xml")
    src.write.mode("overwrite").option("rowTag", "order").format("xml").save(path)
    val back = s.read.schema(schema).option("rowTag", "order")
      .format("xml").load(path)
    back
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        Money.sumPrice(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  /** JDBC source/sink (reference flink-connector-jdbc) against the
    * embedded Derby that ships with Spark: write over JDBC, read back
    * over JDBC, aggregate.
    */
  private def jdbcRoundTrip(s: SparkSession, dir: String) = {
    // per-JVM database path: embedded Derby takes an exclusive
    // filesystem lock, so a shared path makes concurrently-running
    // harnesses (Verify + PlanAudit + sbt test) fail each other with
    // 'Failed to start database'
    val url = s"jdbc:derby:${scratch("derby")}_${java.lang.ProcessHandle.current().pid()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").jdbc(url, "orders_jdbc", props)
    s.read
      .jdbc(url, "orders_jdbc", props)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        // exact long-cents accumulation (Money.scala): double summation
        // order differs between engines and partitionings, and at 1e10
        // magnitude the drift survives round(4)
        Money.sumPrice(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  /** Gzip-compressed CSV round-trip (reference
    * flink-formats compression support / StandardDeCompressors): the
    * writer produces .csv.gz part files; the reader's codec inference
    * decompresses transparently.
    */
  private def compressedRoundTrip(s: SparkSession, dir: String) = {
    val src = tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val path = scratch("csv_gz")
    src.write.mode("overwrite").option("compression", "gzip").csv(path)
    s.read.schema(schema).csv(path)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        // exact long-cents accumulation (Money.scala): double summation
        // order differs between engines and partitionings, and at 1e10
        // magnitude the drift survives round(4)
        Money.sumPrice(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  /** Hadoop SequenceFile round-trip (reference
    * flink-formats/flink-sequence-file): key = orderkey, value = a
    * tab-separated record, via the RDD API (SequenceFiles are a
    * Hadoop-native container with no DSv2 reader; this is the one
    * place the RDD bridge is the idiomatic Spark surface).
    */
  private def sequenceFileRoundTrip(s: SparkSession, dir: String) = {
    import s.implicits._
    val path = scratch("seq")
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[(Long, String, Double)]
      .rdd
      .map { case (k, st, price) => (k, s"$st\t$price") }
      .saveAsSequenceFile(path)
    s.sparkContext
      .sequenceFile[Long, String](path)
      .map { case (k, v) =>
        val Array(st, price) = v.split("\t")
        (k, st, price.toDouble)
      }
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        // exact long-cents accumulation (Money.scala): double summation
        // order differs between engines and partitionings, and at 1e10
        // magnitude the drift survives round(4)
        Money.sumPrice(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  /** Partitioned-directory scan with dynamic partition pruning: orders
    * written as a hive-layout directory partitioned on priority, then
    * joined to a filtered dim so only the matching partitions are read
    * (the DPP subquery shows up in the scan's partition filters). The
    * 100 TB read-path feature the flat test parquet cannot show.
    */
  /** Content fingerprint of the source orders table: file names, sizes
    * and mtimes. The scratch partition layout is only reusable while
    * the source it was derived from is unchanged — keying the cache on
    * `_SUCCESS` alone would silently serve a stale copy after the
    * testdata is regenerated and diverge from the oracle's fresh read.
    */
  private def sourceFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(dir, "orders.parquet"))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  private def partitionPrunedScan(s: SparkSession, dir: String) = {
    // keyed by SF so a test at sf0.001 and Verify at sf0.01 don't
    // reuse each other's partition layout
    val path = scratch("orders_part_" + new java.io.File(dir).getName)
    val fp = sourceFingerprint(dir)
    val fpFile = new java.io.File(path, "_GRAFT_SRC_FINGERPRINT")
    val cachedFp =
      if (fpFile.exists())
        new String(java.nio.file.Files.readAllBytes(fpFile.toPath), "UTF-8")
      else ""
    if (cachedFp != fp) {
      tables(s, dir).orders
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(path)
      java.nio.file.Files.write(fpFile.toPath, fp.getBytes("UTF-8"))
    }
    // DPP only plants its pruning subquery when the dim side is a real
    // scan with a selective predicate (a VALUES relation folds the
    // filter away and never qualifies), so the dim is derived from the
    // base parquet
    val dim = tables(s, dir).orders
      .select(col("o_orderpriority").as("prio"))
      .filter(col("prio").isin("1-URGENT", "2-HIGH"))
      .distinct()
    s.read.parquet(path)
      .join(dim, col("o_orderpriority") === col("prio"))
      .groupBy(col("prio"))
      .agg(
        count(lit(1)).as("n"),
        Money.sumPrice(col("o_totalprice")).as("total")
      )
  }

  /** Raw line-oriented text source/sink — the rawest ingestion format a
    * crawl pipeline sees (one document per line). Write orders rows as
    * pipe-delimited lines, read them back with `spark.read.text`, parse
    * with column expressions, re-aggregate; the oracle recomputes from
    * the table, so the line round-trip is value-checked.
    */
  private def textRoundTrip(s: SparkSession, dir: String) = {
    val path = scratch("textlines_" + new java.io.File(dir).getName)
    tables(s, dir).orders
      .select(concat_ws("|",
        col("o_orderkey"), col("o_orderstatus"),
        // integer cents via Money.cents (round-then-cast — a bare
        // cast truncates the binary .9999 tail and drops cents);
        // double->string formatting differs across engines, longs don't
        Money.cents(col("o_totalprice")).cast("string")).as("value"))
      .write.mode("overwrite").text(path)
    val parts = split(col("value"), "\\|")
    s.read.text(path)
      .select(
        parts.getItem(0).cast("long").as("o_orderkey"),
        parts.getItem(1).as("o_orderstatus"),
        parts.getItem(2).cast("long").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        Money.sumPrice(col("cents") / 100.0).as("total"))
  }

  /** Schema evolution across parquet batches (the long-lived-pipeline
    * reality: yesterday's files have 3 columns, today's have 4).
    * Two generations are written to one directory; `mergeSchema`
    * reconciles the footer schemas and old rows surface the new column
    * as null. The aggregate exercises exactly the null-vs-present
    * split, and the oracle recomputes it from the orders table with
    * the same generation rule — so the merge path is value-checked,
    * not just "it loaded".
    */
  private def schemaEvolutionRead(s: SparkSession, dir: String) = {
    val path = scratch("schema_evo_" + new java.io.File(dir).getName)
    val base = tables(s, dir).orders
    // generation 1 (even keys): no o_orderpriority column yet
    base.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(path)
    // generation 2 (odd keys): adds the priority column
    base.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("append").parquet(path)
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("prio"))
      .agg(
        count(lit(1)).as("n"),
        Money.sumPrice(col("o_totalprice")).as("total"))
  }

  /** binaryFile source — the multimodal ingestion front door (§2.1 +
    * the media pipeline's opaque-binary contract): raw files on disk
    * become (path, modificationTime, length, content) rows. Payload
    * files are derived deterministically from orders keys (integer
    * text — formatting-identical across engines), written once per
    * source dir, then read back through the binaryFile source; the
    * oracle recomputes the same aggregate from the orders table
    * directly, so the check covers the full write→scan→decode path.
    * At 100 TB this source partitions by file and never materializes
    * more than a split per task — the standard image/audio shard
    * ingest shape.
    */
  private def binaryFileIngest(s: SparkSession, dir: String) = {
    val path = scratch("binfiles_" + new java.io.File(dir).getName)
    val d = new java.io.File(path)
    d.mkdirs()
    val keys = tables(s, dir).orders
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).limit(64)
      .collect().map(_.getLong(0))
    // drop leftovers from any earlier run against different source
    // data — a stale extra file would silently inflate the aggregate
    val expected = keys.map(k => s"$k.bin").toSet
    Option(d.listFiles()).getOrElse(Array.empty)
      .filterNot(f => expected(f.getName)).foreach(_.delete())
    keys.foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path, s"$k.bin"),
        k.toString.getBytes("UTF-8"))
    }
    s.read.format("binaryFile").load(path)
      .select(
        decode(col("content"), "UTF-8").cast("long").as("key"),
        col("length"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("key")).as("key_sum"),
        sum(col("length")).as("total_bytes"))
  }

  /** Avro round-trip (reference flink-formats/flink-avro). Spark 4.1
    * bundles the Avro FileFormat classes inside spark-sql but ships no
    * DataSourceRegister service entry for the short name "avro" in this
    * distribution, so the format is addressed by its full class name —
    * same reader/writer code path the short name would resolve to.
    */
  private val avroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_source_csv_roundtrip", (s, dir) => roundTrip(s, dir, "csv"), Some(oracle)),
    QueryDef("q_source_avro_roundtrip", (s, dir) => roundTrip(s, dir, avroFormat), Some(oracle)),
    QueryDef("q_source_json_roundtrip", (s, dir) => roundTrip(s, dir, "json"), Some(oracle)),
    QueryDef("q_source_orc_roundtrip", (s, dir) => roundTrip(s, dir, "orc"), Some(oracle)),
    QueryDef("q_source_xml_roundtrip", (s, dir) => xmlRoundTrip(s, dir), Some(oracle)),
    QueryDef(
      "q_source_text_roundtrip",
      (s, dir) => textRoundTrip(s, dir),
      Some(s"""
        SELECT o_orderstatus, count(*) AS n,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM orders GROUP BY o_orderstatus
      """)
    ),
    QueryDef(
      "q_source_schema_evolution",
      (s, dir) => schemaEvolutionRead(s, dir),
      Some(s"""
        SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
                    ELSE 'LEGACY' END AS prio,
               count(*) AS n,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM orders GROUP BY 1
      """)
    ),
    QueryDef(
      "q_source_binaryfile",
      (s, dir) => binaryFileIngest(s, dir),
      Some("""
        SELECT count(*) AS n_files,
               CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
               CAST(sum(length(CAST(o_orderkey AS VARCHAR))) AS BIGINT) AS total_bytes
        FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 64)
      """)
    ),
    QueryDef("q_source_jdbc_roundtrip", (s, dir) => jdbcRoundTrip(s, dir), Some(oracle)),
    QueryDef(
      "q_source_csv_gzip_roundtrip",
      (s, dir) => compressedRoundTrip(s, dir),
      Some(oracle)
    ),
    QueryDef(
      "q_source_sequencefile_roundtrip",
      (s, dir) => sequenceFileRoundTrip(s, dir),
      Some(oracle)
    ),
    QueryDef(
      "q_scan_partition_pruned",
      (s, dir) => partitionPrunedScan(s, dir),
      Some(s"""
        SELECT prio, count(*) AS n,
               ${Money.sumPriceSql("o_totalprice")} AS total
        FROM orders
        JOIN (SELECT DISTINCT o_orderpriority AS prio FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) d
          ON o_orderpriority = prio
        GROUP BY prio
      """)
    )
  )
}
