package graft.operators

import graft.{QueryDef, QueryModule}
import org.apache.spark.sql.functions._

/** §2.7 set operations: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL].
  *
  * Reference: StreamExecUnion.java:38 / BatchExecUnion.java:33 plus the
  * rewrite rules ReplaceIntersectWithSemiJoinRule /
  * ReplaceMinusWithAntiJoinRule / RewriteIntersectAllRule /
  * RewriteMinusAllRule (FlinkBatchRuleSets.scala). Spark implements the
  * same rewrites natively (intersect→left_semi+distinct, except→
  * left_anti+distinct, *All via row-count expansion).
  *
  * Operands: per-nation key sets from customer vs supplier — supplier
  * covers few nations, so every op has a non-trivial result; the *All
  * variants additionally exercise duplicate multiplicity.
  */
object SetOpQueries extends QueryModule {

  private def cust(s: org.apache.spark.sql.SparkSession, dir: String) =
    tables(s, dir).customer.select(col("c_nationkey").cast("int").as("nk"))
  private def supp(s: org.apache.spark.sql.SparkSession, dir: String) =
    tables(s, dir).supplier.select(col("s_nationkey").cast("int").as("nk"))

  private val custSql = "SELECT CAST(c_nationkey AS INT) AS nk FROM customer"
  private val suppSql = "SELECT CAST(s_nationkey AS INT) AS nk FROM supplier"

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_setop_union_all",
      (s, dir) => cust(s, dir).unionAll(supp(s, dir)),
      Some(s"$custSql UNION ALL $suppSql")
    ),
    QueryDef(
      "q_setop_union_distinct",
      (s, dir) => cust(s, dir).union(supp(s, dir)).distinct(),
      Some(s"$custSql UNION $suppSql")
    ),
    QueryDef(
      "q_setop_intersect",
      (s, dir) => cust(s, dir).intersect(supp(s, dir)),
      Some(s"$custSql INTERSECT $suppSql")
    ),
    QueryDef(
      "q_setop_intersect_all",
      (s, dir) => cust(s, dir).intersectAll(supp(s, dir)),
      Some(s"$custSql INTERSECT ALL $suppSql")
    ),
    QueryDef(
      "q_setop_except",
      (s, dir) => cust(s, dir).except(supp(s, dir)),
      Some(s"$custSql EXCEPT $suppSql")
    ),
    QueryDef(
      "q_setop_except_all",
      (s, dir) => cust(s, dir).exceptAll(supp(s, dir)),
      Some(s"$custSql EXCEPT ALL $suppSql")
    ),
    // Schema-drift union: two generations of the same feed with
    // different column sets, reconciled BY NAME with nulls for the
    // missing side (`unionByName(allowMissingColumns)` — the batch
    // twin of the mergeSchema read in q_source_schema_evolution).
    QueryDef(
      "q_setop_union_by_name",
      (s, dir) => {
        val t = tables(s, dir)
        val gen1 = t.orders
          .filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"))
        val gen2 = t.orders
          .filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("key"),
            col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"))
        gen1.unionByName(gen2, allowMissingColumns = true)
          .groupBy(coalesce(col("prio"), lit("LEGACY")).as("prio"), col("status"))
          .agg(count(lit(1)).as("n"), min(col("key")).as("min_key"))
      },
      Some("""
        SELECT coalesce(prio, 'LEGACY') AS prio, status,
               count(*) AS n, min(key) AS min_key
        FROM (
          SELECT o_orderkey AS key, o_orderstatus AS status
          FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL BY NAME
          SELECT o_orderkey AS key, o_orderstatus AS status,
                 o_orderpriority AS prio
          FROM orders WHERE o_orderkey % 2 = 1
        )
        GROUP BY 1, 2
      """)
    )
  )
}
