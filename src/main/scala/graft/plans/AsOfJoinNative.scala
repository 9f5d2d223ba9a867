package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, EqualTo, Expression, JoinedRow, Literal, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join: a full custom operator — LogicalPlan + rewrite
  * Rule + SparkStrategy + SparkPlan — registered through
  * SparkSessionExtensions (SURVEY.md §7.5; reference operator
  * StreamExecTemporalJoin / TemporalRowTimeJoinOperator).
  *
  * Entry is the marker-predicate pattern (the Column constructor is
  * private in Spark 4, so a custom logical node can't be built
  * directly from user code): the user writes
  * `left.crossJoin(right).where(asof_marker(lk, rk, lt, rt))` via
  * [[AsOfJoinNative.asof]]; an injected optimizer rule rewrites
  * Filter(marker, Join(Cross)) into [[AsOfJoinPlan]], which the
  * injected strategy plans as [[AsOfJoinExec]] — a sort-merge as-of:
  * both sides hash-clustered on the key (one shuffle each, enforced
  * by requiredChildDistribution) and sorted (key, time) in-partition
  * (requiredChildOrdering), then a single linear merge per partition
  * attaches the latest right row with rightTime <= leftTime. Inner
  * semantics.
  */
object AsOfJoinNative {

  /** Boolean marker carrying the as-of condition through analysis. */
  case class AsOfMarker(
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression
  ) extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(leftKey, rightKey, leftTime, rightTime)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = true // never executed post-rewrite
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "asof_marker",
      es => AsOfMarker(es(0), es(1), es(2), es(3)),
      "built-in"
    )

  /** User-facing entry: as-of join `left` to `right` (latest right row
    * per key with rightTime <= leftTime). `joinType` "inner" drops
    * unmatched left rows; "left"/"left_outer" keeps them with null
    * right columns — the reference's isLeftOuterJoin mode
    * (TemporalRowTimeJoinOperator.java:88,134). Right columns must
    * not collide with left's.
    *
    * The outer-ness rides on the JOIN TYPE of the marker join, not on
    * the marker: Join(LeftOuter).output marks right attributes nullable
    * at ANALYSIS time, so downstream projections bind null-checked
    * references. (Flipping nullability later, inside the optimizer
    * rewrite, is too late — consumers have already captured
    * non-nullable refs and would read nulls as 0.)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      joinType: String = "inner"
  ): DataFrame = {
    register(left.sparkSession)
    val marker = call_function("asof_marker", leftKey, rightKey, leftTime, rightTime)
    joinType.toLowerCase.replace("_outer", "") match {
      case "inner" => left.crossJoin(right).where(marker)
      case "left"  => left.join(right, marker, "left_outer")
      case other   => throw new IllegalArgumentException(
        s"as-of joinType must be inner or left/left_outer, got $other")
    }
  }

  /** Logical node produced by the rewrite. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      leftOuter: Boolean = false
  ) extends BinaryNode {
    override def output: Seq[Attribute] =
      if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
      else left.output ++ right.output
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
      copy(left = l, right = r)
  }

  /** Filter(AsOfMarker, Join(Cross)) → AsOfJoinPlan. Runs in the
    * optimizer, after resolution.
    */
  object RewriteAsOfMarker extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      // the main optimizer may have folded the filter into the join
      // condition (cross → inner) before user rules run — match both.
      // A LeftOuter marker join is the left-outer as-of entry.
      case j @ Join(l, r, jt, Some(cond), _) =>
        val outer = jt == org.apache.spark.sql.catalyst.plans.LeftOuter
        rewrite(l, r, cond, outer).getOrElse(j)
      case f @ Filter(cond, Join(l, r, _, None, _)) =>
        rewrite(f.child.asInstanceOf[Join].left, f.child.asInstanceOf[Join].right, cond,
          leftOuter = false)
          .getOrElse(f)
    }

    private def rewrite(
        l: LogicalPlan,
        r: LogicalPlan,
        cond: Expression,
        leftOuter: Boolean): Option[LogicalPlan] = {
      val (markers, rest) = splitConjuncts(cond).partition(_.isInstanceOf[AsOfMarker])
      markers match {
        case Seq(m: AsOfMarker) =>
          // extra conjuncts in an OUTER join condition would change which
          // rows match (not which rows survive) — our entry point never
          // produces that shape, and silently treating it as a post-filter
          // would be wrong, so fail loudly if it ever appears
          if (leftOuter && rest.nonEmpty) {
            throw new IllegalStateException(
              "as-of left-outer marker join must carry the marker as its only condition; " +
                s"found extra conjuncts: $rest")
          }
          val asOf =
            AsOfJoinPlan(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime, leftOuter)
          Some(
            if (rest.isEmpty) asOf
            else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), asOf)
          )
        case _ => None
      }
    }

    private def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        splitConjuncts(a) ++ splitConjuncts(b)
      case other => Seq(other)
    }
  }

  object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer) :: Nil
      case _ => Nil
    }
  }

  /** Sort-merge as-of exec. Inner or left-outer (unmatched left rows
    * emitted with null right columns).
    */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      leftOuter: Boolean = false
  ) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
      else left.output ++ right.output
    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] = Seq(
      ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey))
    )

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending))
    )

    override protected def doExecute(): RDD[InternalRow] = {
      val lk = BindReferences.bindReference(leftKey, left.output)
      val lt = BindReferences.bindReference(leftTime, left.output)
      val rk = BindReferences.bindReference(rightKey, right.output)
      val rt = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val outSchema = output
      val outer = leftOuter
      val rightWidth = right.output.size
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(outSchema, outSchema)
        val joined = new JoinedRow()
        val nullRight: InternalRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
        val rBuf = rIter.buffered
        // last right row (copied) whose (key,time) <= current left
        var held: InternalRow = null
        var heldKey: Any = null
        lIter.flatMap { lRow =>
          val k = lk.eval(lRow)
          val t = lt.eval(lRow)
          // advance right while its key < k, or key == k and time <= t
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rk.eval(head)
            val cmp = keyOrd.compare(hk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
            if (cmp < 0) {
              rBuf.next() // earlier key: drop through (no need to hold)
              held = null; heldKey = null
            } else if (cmp == 0 &&
              timeOrd.compare(rt.eval(head).asInstanceOf[AnyRef], t.asInstanceOf[AnyRef]) <= 0) {
              held = rBuf.next().copy(); heldKey = hk
            } else continue = false
          }
          val matches = held != null && heldKey != null &&
            keyOrd.compare(heldKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          if (matches) Iterator.single(proj(joined(lRow, held)))
          else if (outer) Iterator.single(proj(joined(lRow, nullRight)))
          else Iterator.empty
        }
      }
    }

    override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
      copy(left = l, right = r)
  }

  /** SparkSessionExtensions hook — use with
    * SparkSession.builder().withExtensions(new GraftExtensions).
    */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit = {
      e.injectOptimizerRule(_ => RewriteAsOfMarker)
      e.injectPlannerStrategy(_ => AsOfStrategy)
    }
  }
}
