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
    * per key with rightTime <= leftTime; inner). Right columns must
    * not collide with left's.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column
  ): DataFrame = {
    register(left.sparkSession)
    left
      .crossJoin(right)
      .where(call_function("asof_marker", leftKey, rightKey, leftTime, rightTime))
  }

  /** Logical node produced by the rewrite. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression
  ) extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ right.output
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
      copy(left = l, right = r)
  }

  /** Filter(AsOfMarker, Join(Cross)) → AsOfJoinPlan. Runs in the
    * optimizer, after resolution.
    */
  object RewriteAsOfMarker extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      // the main optimizer may have folded the filter into the join
      // condition (cross → inner) before user rules run — match both
      case j @ Join(l, r, _, Some(cond), _) =>
        rewrite(l, r, cond).getOrElse(j)
      case f @ Filter(cond, Join(l, r, _, None, _)) =>
        rewrite(f.child.asInstanceOf[Join].left, f.child.asInstanceOf[Join].right, cond)
          .getOrElse(f)
    }

    private def rewrite(l: LogicalPlan, r: LogicalPlan, cond: Expression): Option[LogicalPlan] = {
      val (markers, rest) = splitConjuncts(cond).partition(_.isInstanceOf[AsOfMarker])
      markers match {
        case Seq(m: AsOfMarker) =>
          val asOf = AsOfJoinPlan(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime)
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
      case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  /** Sort-merge as-of exec. */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression
  ) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output ++ right.output
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
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(outSchema, outSchema)
        val joined = new JoinedRow()
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
