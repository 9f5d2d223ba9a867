package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch iteration (reference DataStream.iterate / IterativeStream —
  * SURVEY.md scopes streaming iterations out and maps batch iteration
  * to a driver loop). The loop body is fully distributed; the driver
  * only checks convergence counts. localCheckpoint every iteration
  * truncates lineage so plans don't grow exponentially — the standard
  * Spark iterative-algorithm pattern.
  */
object Iterations {

  /** Connected components by min-label propagation over an undirected
    * edge list (`src`, `dst` columns). Returns (vertex, component)
    * where component = the minimum vertex id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val bidir = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    val vertices = bidir.select(col("src").as("vertex")).distinct()
    var labels = vertices
      .withColumn("component", col("vertex"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each vertex adopts min(own component, neighbors' components).
      // The vertex's own (previous) label rides the union under a
      // self-flag, so ONE aggregation yields both the new label and
      // the old one — the convergence check is then a shuffle-free
      // count over the checkpointed result instead of a join against
      // the previous labels (one fewer shuffle per iteration).
      val compType = labels.schema("component").dataType
      val fromNeighbors = bidir
        .join(labels, bidir("dst") === labels("vertex"))
        .select(bidir("src").as("vertex"), col("component"),
          lit(null).cast(compType).as("prev"))
      // the convergence count rides the checkpoint job as an observed
      // metric — ONE Spark job per iteration (materialize + count
      // fused), instead of a second scan over the checkpointed result
      val obs = org.apache.spark.sql.Observation(s"cc_changed_$iter")
      val next = labels
        .select(col("vertex"), col("component"),
          col("component").as("prev"))
        .union(fromNeighbors)
        .groupBy(col("vertex"))
        .agg(
          min(col("component")).as("component"),
          // every vertex appears exactly once with a non-null prev
          max(col("prev")).as("prev"))
        .observe(obs,
          sum(when(col("component") =!= col("prev"), 1L).otherwise(0L))
            .as("changed"))
        .localCheckpoint() // truncate lineage every iteration (eager)
      val changed = obs.get("changed") match {
        case null => 0L
        case n: Number => n.longValue()
      }
      labels = next.select(col("vertex"), col("component"))
      converged = changed == 0
      iter += 1
    }
    bidir.unpersist()
    labels
  }

  /** Transitive reachability from a source vertex over an undirected
    * edge list — BFS frontier expansion as a driver loop, each step
    * fully distributed (the oracle-checkable face of the iteration
    * primitive: DuckDB verifies it with a recursive CTE).
    */
  def reachableFrom(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val bidir = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var reach = Seq(source).toDF("node").localCheckpoint()
    var size = 1L
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // frontier size observed during the checkpoint job itself —
      // one job per BFS round, no separate count scan
      val obs = org.apache.spark.sql.Observation(s"bfs_size_$iter")
      val expanded = reach
        .union(
          bidir.join(reach, bidir("src") === reach("node")).select(col("dst").as("node"))
        )
        .distinct()
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val nextSize = obs.get("n") match {
        case null => 0L
        case n: Number => n.longValue()
      }
      converged = nextSize == size
      size = nextSize
      reach = expanded
      iter += 1
    }
    bidir.unpersist()
    reach
  }
}
