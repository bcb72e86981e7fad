package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Grouped top-k as a first-class operator — the option-(c)
  * demonstration (custom `LogicalPlan` + `Strategy` + `SparkPlan`).
  *
  * The built-in formulation (`row_number over (partition by g order by
  * v) <= k`, used by the declared `window_topk` query) SORTS every
  * group's full row set: O(n log n) per partition and the whole input
  * buffered through the sort. This operator keeps a k-bounded heap per
  * group: O(n log k) time, O(groups × k) memory, single pass, no sort —
  * the difference between sorting 100 TB and streaming over it.
  *
  * Plumbing is the standard extension recipe: `requiredChildDistribution`
  * asks Catalyst for clustering on the group key (Spark inserts — or,
  * for bucketed inputs, elides — the exchange); the strategy registers
  * via the public `spark.experimental.extraStrategies`; the logical node
  * enters the plan through the one `private[sql]` access in the project
  * (`graftshim.PlanShim.ofRows`, the standard third-party-operator
  * mechanism).
  */
case class GroupedTopK(
    groupExprs: Seq[Expression], orderExpr: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

case class GroupedTopKExec(
    groupExprs: Seq[Expression], orderExpr: Expression, k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = orderExpr
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val bound = BindReferences.bindReference(orderE, childOutput)
      // heap keeps the k LARGEST by order value; min at the head so the
      // smallest of the kept k is evicted first
      implicit val ord: Ordering[(Double, UnsafeRow)] =
        Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Double, UnsafeRow)]]()
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val v = bound.eval(row) match {
          case null => Double.NegativeInfinity
          case d: java.lang.Double => d.doubleValue()
          case l: java.lang.Long => l.toDouble
          case i: java.lang.Integer => i.toDouble
          case other => other.toString.toDouble
        }
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[(Double, UnsafeRow)]
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < limit) heap.enqueue((v, row.copy()))
        else if (v > heap.head._1) { heap.dequeue(); heap.enqueue((v, row.copy())) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator.map(_._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      GroupedTopKExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Register the planner strategy once per session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies = cur :+ GroupedTopKStrategy
  }

  /** Top-k rows per group by `orderCol` (largest first; numeric order
    * column). Output order within/across groups is unspecified — append
    * an `orderBy` for deterministic presentation.
    */
  def of(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val dt = df.schema(orderCol).dataType
    require(dt == DoubleType || dt == LongType || dt == IntegerType,
      s"numeric order column required, got $dt")
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Expression =
      analyzed.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val plan = GroupedTopK(
      groupCols.map(attr), attr(orderCol), k, analyzed)
    org.apache.spark.sql.graftshim.PlanShim.ofRows(spark, plan)
  }
}
