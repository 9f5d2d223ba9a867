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
    // dst-partitioned once: the per-iteration neighbor join probes
    // bidir on dst, so the (big) edge side never re-shuffles — labels
    // arrive vertex-partitioned from the previous round's aggregation
    // and the union→groupBy pays the round's single shuffle
    val bidir = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
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

  /** PageRank with a FIXED iteration count over a directed edge list
    * (`src`, `dst`), the third face of the batch-iteration primitive
    * (reference DataStream.iterate — flink-examples PageRank is the
    * reference's own canonical iterate demo). Fixed iterations (not
    * convergence) keep the whole computation DuckDB-expressible as
    * chained CTEs, so the iteration loop is oracle-checked exactly.
    *
    * rank_{k+1}(v) = teleport/N + damping * Σ_{(u,v)∈E} rank_k(u)/outdeg(u)
    *
    * Dangling vertices (no out-edges) contribute nothing — mass leaks,
    * the simplified convention the oracle mirrors term for term.
    * Fully distributed: ranks and contributions are shuffled joins on
    * vertex id, the edge+outdeg table is materialized once and reused
    * every iteration, localCheckpoint truncates lineage per round. The
    * only driver-side values are N and the loop counter.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      teleport: Double = 0.15): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    // Loop-invariant tables are hash-partitioned on their join keys
    // ONCE before checkpointing — LogicalRDD preserves the output
    // partitioning, so the per-iteration joins (edges⋈ranks on src,
    // vertices⋈contribs on vertex) insert NO exchange on these sides.
    // Each iteration then shuffles exactly once: the contribution
    // aggregation onto dst. On a skewed graph that one shuffle is
    // AQE's to split; everything else stays in place.
    // N rides the vertex materialization as an observed metric — no
    // separate count job (same fusion as connectedComponents)
    val obs = org.apache.spark.sql.Observation("pagerank_n")
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .repartition(col("vertex"))
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint()
    val n = (obs.get("n") match {
      case null => 0L
      case x: Number => x.longValue()
    }).toDouble
    // (src, dst, deg) — each edge annotated with its source's
    // out-degree, computed once; every iteration joins ranks against
    // this single materialized table
    val withDeg = e
      .join(e.groupBy(col("src"))
        .agg(count(lit(1)).cast("double").as("deg")), "src")
      .repartition(col("src"))
      .localCheckpoint()
    // ranks inherit the vertex partitioning (projection preserves it,
    // and so does every checkpoint in the loop); the initial ranks are
    // a pure projection of the checkpointed vertices — no job of
    // their own
    var ranks = vertices.withColumn("rank", lit(1.0 / n))
    var iter = 0
    while (iter < iters) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("vertex"))
        .select(col("dst").as("vertex"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("vertex"))
        .agg(sum(col("c")).as("in"))
      ranks = vertices
        .join(contribs, Seq("vertex"), "left")
        .select(col("vertex"),
          (lit(teleport / n) +
            lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"))
        .localCheckpoint()
      iter += 1
    }
    ranks
  }

  /** Weighted PageRank — [[pageRank]] generalized to a weighted edge
    * list (`src`, `dst`, `w`): contributions are rank·w/Σw_out instead
    * of rank/outdeg. Same loop shape, same partitioning contract, same
    * fixed-iterations-for-the-oracle design.
    */
  def pageRankWeighted(edges: DataFrame, iters: Int,
      damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
    val obs = org.apache.spark.sql.Observation("pagerank_w_n")
    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex")))
      .distinct()
      .repartition(col("vertex"))
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint()
    val n = (obs.get("n") match {
      case null => 0L
      case x: Number => x.longValue()
    }).toDouble
    val withW = e
      .join(e.groupBy(col("src")).agg(sum(col("w")).as("ow")), "src")
      .repartition(col("src"))
      .localCheckpoint()
    var ranks = vertices.withColumn("rank", lit(1.0 / n))
    var iter = 0
    while (iter < iters) {
      val contribs = withW
        .join(ranks, withW("src") === ranks("vertex"))
        .select(col("dst").as("vertex"),
          (col("rank") * col("w") / col("ow")).as("c"))
        .groupBy(col("vertex"))
        .agg(sum(col("c")).as("in"))
      ranks = vertices
        .join(contribs, Seq("vertex"), "left")
        .select(col("vertex"),
          (lit(teleport / n) +
            lit(damping) * coalesce(col("in"), lit(0.0))).as("rank"))
        .localCheckpoint()
      iter += 1
    }
    ranks
  }

  /** Single-source shortest paths, Bellman–Ford with a FIXED round
    * count over a weighted edge list (`src`, `dst`, `w` — integer
    * weights keep the min-plus arithmetic exact): round k relaxes
    * every edge once, dist = min(dist, dist[src] + w). The reference's
    * own canonical graph-library example (flink-gelly
    * SingleSourceShortestPaths). Fixed rounds (not convergence) so
    * DuckDB replays the loop exactly; k rounds = exact distances for
    * every path of ≤ k hops. Same loop contract as pageRank: the edge
    * table is src-partitioned and checkpointed once, each round is one
    * relax join + one min aggregation.
    */
  def shortestPaths(edges: DataFrame, source: Long, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src"))
      .localCheckpoint()
    var dist = Seq((source, 0L)).toDF("vertex", "dist")
      .repartition(col("vertex"))
      .localCheckpoint()
    var iter = 0
    while (iter < iters) {
      val relaxed = e
        .join(dist, e("src") === dist("vertex"))
        .select(e("dst").as("vertex"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("vertex"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      iter += 1
    }
    dist
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
