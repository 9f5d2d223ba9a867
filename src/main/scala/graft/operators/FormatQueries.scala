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
        round(sum(col("o_totalprice")), 4).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  private val oracle = """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 4) AS total,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
  """

  /** JDBC source/sink (reference flink-connector-jdbc) against the
    * embedded Derby that ships with Spark: write over JDBC, read back
    * over JDBC, aggregate.
    */
  private def jdbcRoundTrip(s: SparkSession, dir: String) = {
    val url = s"jdbc:derby:${scratch("derby")};create=true"
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
        round(sum(col("o_totalprice")), 4).as("total"),
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
        round(sum(col("o_totalprice")), 4).as("total"),
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
        round(sum(col("o_totalprice")), 4).as("total"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key")
      )
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_source_csv_roundtrip", (s, dir) => roundTrip(s, dir, "csv"), Some(oracle)),
    QueryDef("q_source_json_roundtrip", (s, dir) => roundTrip(s, dir, "json"), Some(oracle)),
    QueryDef("q_source_orc_roundtrip", (s, dir) => roundTrip(s, dir, "orc"), Some(oracle)),
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
    )
  )
}
