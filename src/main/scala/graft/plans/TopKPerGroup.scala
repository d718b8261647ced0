package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim

/** Grouped top-k as a first-class operator (SURVEY.md §2.2 #18's
  * scale path): `ORDER BY ... LIMIT k` within every group, executed
  * with bounded per-group heaps instead of the window-function plan
  * (`row_number().over(partitionBy...)` physically sorts every whole
  * partition). This operator shuffles on the group key like the
  * window does, but then does one O(n log k) pass holding only
  * groups×k rows — at 100 TB the difference between "sort 100 TB"
  * and "scan 100 TB keeping a few KB per group".
  *
  * Wired the full custom-operator way: logical node → planner
  * strategy → physical exec with a declared required distribution,
  * injectable via `SparkSessionExtensions` (GraftExtensions) or
  * `spark.experimental.extraStrategies`.
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a group must meet in one partition — Spark inserts
    * the hash exchange exactly as it would for the window plan.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = new InterpretedOrdering(order, childOutput)
      // per group: a max-heap (reverse of the requested order) whose
      // head is the worst retained row — O(log k) replace
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Optimizer rule (the injected-`Rule[LogicalPlan]` extension rung):
  * rewrites the ubiquitous
  * `withColumn("rn", row_number().over(partitionBy(..).orderBy(..)))
  *  .filter(rn <= k).drop("rn")`
  * pattern into [[TopKPerGroupPlan]] whenever the rank column is
  * dropped afterwards — turning the full per-partition sort the
  * window plan needs into the bounded-heap scan. Fires only on the
  * exact shape (single row_number window expression, `rn <= lit` /
  * `rn = 1` predicate, rank absent from the surviving projection), so
  * it is semantics-preserving by construction.
  */
object RewriteWindowTopK extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => WindowNode}

  private def limitOf(cond: Expression, rankId: ExprId): Option[Int] = {
    def isRank(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == rankId
      case Cast(inner, _, _, _) => isRank(inner)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(r, Literal(k: Int, _)) if isRank(r) => Some(k)
      case LessThanOrEqual(r, Literal(k: Long, _)) if isRank(r) => Some(k.toInt)
      case LessThan(r, Literal(k: Int, _)) if isRank(r) => Some(k - 1)
      case EqualTo(r, Literal(1, _)) if isRank(r) => Some(1)
      case EqualTo(r, Literal(1L, _)) if isRank(r) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond, WindowNode(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _)))
        if limitOf(cond, al.exprId).exists(_ > 0) &&
          projList.forall(e => e.references.subsetOf(child.outputSet)) =>
      Project(projList,
        TopKPerGroupPlan(partitionSpec, orderSpec, limitOf(cond, al.exprId).get, child))
  }
}

object TopK {

  /** Top-k rows per group: the first k rows of each group in the
    * given (column, ascending?) order. Equivalent to
    * `row_number().over(Window.partitionBy(groupCols).orderBy(...)) <= k`
    * minus the rank column, but executed heap-bounded.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = Shim.analyzedPlan(df)
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    Shim.ofRows(spark, TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = Shim.experimentalStrategies(spark)
    if (!strategies.contains(TopKStrategy)) {
      Shim.addStrategy(spark, TopKStrategy)
    }
  }
}
