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
  * group: O(n log k) time, single pass, no sort — the difference
  * between sorting 100 TB and streaming over it.
  *
  * The strategy plans it like an aggregation, in TWO phases (top-k is
  * mergeable: top-k of a union = top-k of per-part top-ks):
  *
  *   partial GroupedTopKExec   (map side, no distribution requirement)
  *     → Exchange on the group key (Catalyst-inserted, or elided over
  *       bucketed/pre-clustered input)
  *   final GroupedTopKExec     (requires ClusteredDistribution)
  *
  * so the shuffle carries ≤ partitions × groups × k rows instead of
  * the full input. The partial phase is memory-bounded: when its heap
  * map reaches `flushGroups` distinct groups it EMITS everything held
  * and starts a fresh epoch — correct under merge, so a task never
  * holds more than flushGroups × k rows regardless of group
  * cardinality or ordering (the spill-safety analog of a sort-based
  * aggregation fallback, without the sort). The final phase holds the
  * post-shuffle groups of one partition — the irreducible state of the
  * operator's contract.
  *
  * Plumbing is the standard extension recipe: the strategy registers
  * via the public `spark.experimental.extraStrategies`; the logical
  * node enters the plan through the one `private[sql]` access in the
  * project (`graftshim.PlanShim.ofRows`, the standard third-party
  * -operator mechanism).
  */
case class GroupedTopK(
    groupExprs: Seq[Expression], orderExpr: Expression, k: Int,
    flushGroups: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1)
  require(flushGroups >= 1)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

case class GroupedTopKExec(
    groupExprs: Seq[Expression], orderExpr: Expression, k: Int,
    partial: Boolean, flushGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial || groupExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = orderExpr
    val limit = k
    val childOutput = child.output
    // only the partial (pre-shuffle) phase flushes: its epochs merge in
    // the final phase; the final phase must see each group whole
    val flushAt = if (partial) flushGroups else Int.MaxValue
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val bound = BindReferences.bindReference(orderE, childOutput)
      // heap keeps the k LARGEST by order value; min at the head so the
      // smallest of the kept k is evicted first
      implicit val ord: Ordering[(Double, UnsafeRow)] =
        Ordering.by[(Double, UnsafeRow), Double](_._1).reverse
      type Heap = scala.collection.mutable.PriorityQueue[(Double, UnsafeRow)]

      new Iterator[InternalRow] {
        private val heaps = new java.util.HashMap[UnsafeRow, Heap]()
        private var drain: Iterator[InternalRow] = Iterator.empty

        private def add(row: UnsafeRow): Unit = {
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

        private def drainAndClear(): Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          val hs = heaps.values().asScala.toArray
          heaps.clear()
          hs.iterator.flatMap(_.iterator.map(_._2))
        }

        override def hasNext: Boolean = {
          while (!drain.hasNext) {
            if (!it.hasNext && heaps.isEmpty) return false
            // fill until the epoch bound (new groups only grow the map)
            // or the input ends, then emit the epoch
            while (it.hasNext && heaps.size < flushAt) {
              add(it.next().asInstanceOf[UnsafeRow])
            }
            drain = drainAndClear()
          }
          true
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          drain.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, flush, child) =>
      val pre = GroupedTopKExec(g, o, k, partial = true, flush, planLater(child))
      GroupedTopKExec(g, o, k, partial = false, flush, pre) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Partial-phase epoch bound: at most this many distinct groups (×k
    * rows each) held per map task before an emit-and-reset.
    */
  val DefaultFlushGroups: Int = 1 << 17

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
  def of(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int,
         flushGroups: Int = DefaultFlushGroups): DataFrame = {
    // ungrouped (global) top-k is not this operator: with no group key
    // both exec phases report UnspecifiedDistribution, no exchange is
    // inserted, and each partition would emit its own k rows. Spark's
    // own orderBy(...).limit(k) plans the global case optimally
    // (TakeOrderedAndProject) — use that instead.
    require(groupCols.nonEmpty,
      "GroupedTopK requires at least one group column; " +
        "for global top-k use orderBy(desc).limit(k)")
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
      groupCols.map(attr), attr(orderCol), k, flushGroups, analyzed)
    org.apache.spark.sql.graftshim.PlanShim.ofRows(spark, plan)
  }
}
