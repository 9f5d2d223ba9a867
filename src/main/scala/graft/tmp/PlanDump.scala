package graft.tmp
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.configure(SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
