package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types._

/** Native nearest-centroid assignment: index (0-based) of the centroid
  * with the smallest squared Euclidean distance to the input vector.
  * Centroids ride INSIDE the expression (task-serialized with the plan,
  * like [[HyperplaneSig]]'s plane matrix) — the cluster-assignment step
  * of SemDeDup ([[graft.ops.Dedup.semanticPairs]]) becomes a narrow,
  * embarrassingly parallel projection over the full corpus instead of a
  * `KMeansModel.transform` chained onto the pinned fit input.
  *
  * Ties break to the LOWEST index (strict `<` scan), matching
  * spark.ml's `EuclideanDistanceMeasure.findClosest`, so assignments
  * agree with what `KMeansModel.transform` would produce on the same
  * centers. `doGenCode` emits one call into [[nearest]] via an embedded
  * reference — the whole-stage span stays unbroken and the flattened
  * centroid matrix is shared by the generated code.
  */
case class NearestCentroid(child: Expression, k: Int, flat: Seq[Double])
    extends UnaryExpression {

  require(k >= 1 && flat.nonEmpty && flat.length % k == 0,
    s"centroid matrix (${flat.length} values) must be k=$k rows of equal width")

  // null in -> null out: constraint inference rewrites isnotnull(f(x))
  // to isnotnull(x) instead of duplicating this expression in a Filter.
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val m: Array[Double] = flat.toArray
  @transient private lazy val dims: Int = flat.length / k

  /** Kernel shared by interpreted eval and generated code. A vector
    * whose width differs from the centroids' is a malformed corpus row:
    * fail loudly rather than assign it by prefix distance — a
    * plausible-but-wrong cell is the silent-corruption failure mode.
    */
  def nearest(arr: ArrayData): Int = {
    val d = dims
    if (arr.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_nearest_centroid: vector has ${arr.numElements()} dims, centroids have $d")
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * d
      var acc = 0.0
      var i = 0
      while (i < d) {
        val diff = arr.getDouble(i) - m(base + i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; best = c }
      c += 1
    }
    best
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(nearest(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNearest", this, classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.nearest($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Extract a constant double matrix from the registration argument:
    * a folded array literal (the Column facade's `typedlit`) or a
    * not-yet-folded `array(...)` of numeric literals (the SQL surface —
    * function builders run before constant folding).
    */
  private[graft] def flatLiteral(e: Expression): Seq[Double] = e match {
    case Literal(ad: ArrayData, ArrayType(DoubleType, _)) =>
      ad.toDoubleArray().toSeq
    case ca: org.apache.spark.sql.catalyst.expressions.CreateArray
        if ca.children.forall(_.isInstanceOf[Literal]) =>
      ca.children.map { case Literal(v, _) => v.toString.toDouble }
    case other => throw new IllegalArgumentException(
      s"centroid matrix must be an array<double> literal, got $other")
  }

  /** Idempotent per-session registration. The centroid matrix and k
    * arrive as literals and are folded into the expression instance at
    * analysis time (same pattern as [[HyperplaneSig]]'s plane count).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid",
      exprs => {
        val k = exprs(1) match { case Literal(v: Int, IntegerType) => v }
        NearestCentroid(Cast(exprs(0), ArrayType(DoubleType)), k,
          flatLiteral(exprs(2)))
      },
      "built-in")

  /** Column-API entry point: assign `v` to the nearest of `centers`
    * (each center one row of the matrix, all the same width).
    */
  def nearestCentroid(spark: SparkSession, v: Column,
                      centers: Array[Array[Double]]): Column = {
    register(spark)
    val k = centers.length
    val flat: Seq[Double] = centers.flatten.toSeq
    call_function("graft_nearest_centroid",
      v.cast(ArrayType(DoubleType)), lit(k), typedlit(flat))
  }
}
