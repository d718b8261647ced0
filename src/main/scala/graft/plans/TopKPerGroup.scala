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
    // partitionSpec must be non-empty: ClusteredDistribution(Nil) is
    // rejected by Spark's constructor, and a global top-k is better
    // served by the window plan (single partition either way).
    case p @ Project(projList,
        Filter(cond, WindowNode(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && limitOf(cond, al.exprId).exists(_ > 0) &&
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

  /** Also inject [[RewriteWindowTopK]] into the session's optimizer
    * (idempotent) — the `extraOptimizations` path for sessions not
    * bootstrapped with GraftExtensions.
    */
  def ensureRuleRegistered(spark: SparkSession): Unit = {
    ensureRegistered(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ RewriteWindowTopK
    }
  }

  /** §2.2#53 oracle surface: top-5 lineitems per return flag by exact
    * integer cents (orderkey/linenumber tie-break), executed by the
    * heap operator instead of the window sort.
    */
  def topkPerGroupQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        graft.analytics.Money.priceC.as("price_c"))
    perGroup(li, Seq("l_returnflag"),
      Seq(("price_c", false), ("l_orderkey", true), ("l_linenumber", true)), 5)
      .orderBy(col("l_returnflag"), col("price_c").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.2#81 oracle surface: the naive row_number-filter-drop pattern
    * written the naive way — the injected rule rewrites it to the heap
    * operator, and the result must still match the window-form oracle.
    */
  def rewriteWindowTopkQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    ensureRuleRegistered(spark)
    val o = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .orderBy(col("o_custkey"), col("price_c").desc, col("o_orderkey"))
  }
}
