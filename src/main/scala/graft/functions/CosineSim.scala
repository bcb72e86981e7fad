package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native cosine similarity of two double arrays.
  *
  * Arithmetic is ordered exactly like the composed-builtin form
  * (`aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, +)` folded left-to-right,
  * norms the same way, then dot/(√·√)) so results are bit-identical to
  * both the composed Column version and DuckDB's list_reduce oracle —
  * the similarity_topk hash-match stays exact. The one deliberate
  * deviation: a zero-norm input yields 0.0 (not NaN) — NaN sorts above
  * every double in Spark, so a degenerate all-zero embedding would
  * otherwise beat genuine neighbors in every threshold/top-k path.
  * [[graft.ops.Similarity.cosineComposed]] carries the same guard.
  *
  * Why native: the composed form allocates a zipped array and makes two
  * boxed lambda calls per element per pair; candidate re-rank evaluates
  * cosine hundreds of thousands of times per task, making interpreted
  * lambda overhead the whole cost. This is a single primitive loop.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // null in -> null out (nullSafeEval): lets constraint inference use
  // isnotnull(children) instead of duplicating this expression in filters
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  /** Whole-stage-codegen body: the same primitive loop, emitted inline —
    * no per-row virtual call, no boxing (the CodegenFallback route would
    * box the Double and break the surrounding codegen region).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $x.getDouble($i);
         |  final double $yi = $y.getDouble($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0
         |  : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    // Zero-norm guard: a degenerate all-zero vector would otherwise give
    // NaN, which Spark orders ABOVE every double — it would pass every
    // `cos >= threshold` filter and rank first in top-k windows.
    if (nx == 0.0 || ny == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSim(exprs(0), exprs(1)), "built-in")

  /** Column-API entry point. The casts are analysis-time no-ops on
    * array<double> inputs and coerce array<float>/other numerics —
    * instead of a mid-job ClassCastException or silent getDouble
    * misreads on non-double arrays.
    */
  def cos(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine",
      a.cast(ArrayType(DoubleType)), b.cast(ArrayType(DoubleType)))
  }
}
