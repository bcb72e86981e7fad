package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature of a double vector:
  * `numPlanes` sign bits of ⟨v, plane_p⟩ packed into a long, planes
  * `planeOffset until planeOffset+numPlanes`.
  *
  * Bit-for-bit identical to the composed-builtin formula
  * (`graft.ops.Similarity` spec cross-checks):
  * component(p,i) = pmod(xxhash64(p, i), 100000)/100000.0 − 0.5 with
  * xxhash64's seed-chaining (seed 42 → hash p → hash i), projection
  * folded left-to-right.
  *
  * Why native: the composed form re-derives every plane component by
  * hashing per row — planes×dims hashes per vector (48×64 here), inside
  * interpreted lambda folds. This expression derives the plane matrix
  * once per task and projects in a tight primitive loop. `doGenCode`
  * emits one call into [[project]] via an embedded reference — the
  * whole-stage span stays unbroken and the per-instance plane-matrix
  * cache is shared by the generated code.
  */
case class HyperplaneSig(child: Expression, numPlanes: Int, planeOffset: Int)
    extends UnaryExpression {

  // null in -> null out (nullSafeEval): declaring null intolerance lets
  // Catalyst's constraint inference rewrite isnotnull(f(x)) to
  // isnotnull(x) instead of pushing a duplicated evaluation of this
  // expression into a scan-level Filter.
  override def nullIntolerant: Boolean = true

  require(numPlanes >= 1 && numPlanes <= 64, "numPlanes in [1, 64]")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  // Plane matrix cache, built when the input dimensionality is first
  // seen. Expression instances are task-local after plan serialization;
  // a rebuild race would produce identical values, so a stale read is
  // harmless.
  @transient private var matrix: Array[Double] = _
  @transient private var dims: Int = -1

  private def component(plane: Int, dim: Int): Double = {
    val h1 = XxHash64Function.hash(plane, IntegerType, 42L)
    val h2 = XxHash64Function.hash(dim, IntegerType, h1)
    (((h2 % 100000L) + 100000L) % 100000L).toDouble / 100000.0 - 0.5
  }

  private def planeMatrix(n: Int): Array[Double] = {
    var m = matrix
    if (m == null || dims != n) {
      m = new Array[Double](numPlanes * n)
      var p = 0
      while (p < numPlanes) {
        var i = 0
        while (i < n) {
          m(p * n + i) = component(planeOffset + p, i)
          i += 1
        }
        p += 1
      }
      matrix = m
      dims = n
    }
    m
  }

  /** Kernel shared by interpreted eval and generated code. */
  def project(arr: ArrayData): Long = {
    val n = arr.numElements()
    val m = planeMatrix(n)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arr.getDouble(i) * m(p * n + i)
        i += 1
      }
      if (acc >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(project(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHplane", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.project($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Idempotent per-session registration (plane count/offset arrive as
    * int literals and are folded into the expression instance).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_sig",
      exprs => {
        val np = exprs(1) match { case Literal(v: Int, IntegerType) => v }
        val off = exprs(2) match { case Literal(v: Int, IntegerType) => v }
        HyperplaneSig(Cast(exprs(0), ArrayType(DoubleType)), np, off)
      },
      "built-in")

  /** Column-API entry point. */
  def sig(spark: SparkSession, v: Column, numPlanes: Int, planeOffset: Int): Column = {
    register(spark)
    // cast → analysis-time coercion (no-op on array<double>) instead of
    // a mid-job ClassCastException on other element types
    call_function("graft_hyperplane_sig",
      v.cast(ArrayType(DoubleType)), lit(numPlanes), lit(planeOffset))
  }
}
