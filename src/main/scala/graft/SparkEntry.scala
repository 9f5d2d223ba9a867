package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.operators.* modules as QueryDefs; this
  * object just assembles the registry.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.AggregateQueries,
    operators.JoinQueries,
    operators.WindowQueries,
    operators.SetOpQueries,
    operators.ScalarFunctionQueries,
    operators.DedupQueries,
    operators.SimilarityQueries,
    operators.TextQueries,
    operators.SkewQueries,
    operators.MiscQueries,
    operators.FormatQueries,
    operators.CepQueries,
    operators.ChangelogQueries,
    operators.FlagshipQueries,
    operators.CollectionQueries,
    operators.EvictorQueries,
    operators.PipelineQueries,
    operators.StateQueries,
    operators.GraphQueries
  )

  private lazy val all: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dups = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.builder).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
