package graft

/** Dev tool: run only the Sf1Gates skew-split gate against an existing
  * sf1 probe dir and print the result (iterating on the gate without
  * re-running the full VerifySf1 sweep).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Engine.session("graft-skew-probe", "local[16]")
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_SKEW_GATE_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    // dump per-partition shuffle sizes of the gate join's stages
    if (sys.env.contains("GRAFT_SKEW_GATE_DEBUG")) {
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val events = Engine.Tables(spark, dir).events
      val keyed = events.withColumn(
        "skew_key",
        when(col("event_id") % 4 =!= 0, lit(0L)).otherwise(col("user_id")))
      val dim = spark.read.parquet(s"$dir/__skew_gate_dim.parquet")
      val joined = keyed.join(dim, "skew_key").groupBy(col("cohort"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          s.mapStats.foreach { ms =>
            val sizes = ms.bytesByPartitionId
            println(s"[probe] stage=${s.id} parts=${sizes.length} " +
              s"max=${sizes.max} sum=${sizes.sum} " +
              s"top5=${sizes.sorted.reverse.take(5).mkString(",")}")
          }
          walk(s.plan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ =>
      }
      walk(finalPlan)
    }
    val gates = try Sf1Gates.run(spark, dir, only = Set("aqe_skew_split_sf1"))
    finally spark.stop()
    gates.foreach(g =>
      println(s"[sf1-gate] ${if (g.pass) "PASS" else "FAIL"} ${g.name}: ${g.detail}"))
    sys.exit(if (gates.exists(!_.pass)) 1 else 0)
  }
}
