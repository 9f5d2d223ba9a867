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
    )
  )
}
