package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram shingles of a text column, as xxhash64 longs,
  * in one pass.
  *
  * Value-compatible with the composed form
  * `transform(array_distinct(transform(sequence(...), slice+concat_ws)),
  * xxhash64)` (`graft.ops.Dedup.shingles` — spec cross-checked):
  * whitespace tokenization matches Spark's `split(trim(c), "\\s+")`
  * (Java regex, limit −1), shingle text is the space-joined token
  * window, hash is Spark's `xxhash64` (seed 42). Distinctness is by
  * hash rather than by string — indistinguishable below ~2⁻⁶⁴
  * intra-document collision odds, which the composed form already
  * carries downstream.
  *
  * Why native: the composed tree is 7 nested higher-order expressions
  * deep; per document it allocates a token array, an index sequence, a
  * slice per shingle, a joined string per shingle, and a distinct pass —
  * all through interpreted lambda calls. This is one tokenizer loop,
  * one StringBuilder per shingle, one hash set.
  *
  * Codegen: one call into [[compute]] via an embedded reference (the
  * Spark regexp-expression shape) — keeps the whole-stage span unbroken
  * while the kernel stays a JIT-compiled JVM loop.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  // null in -> null out (nullSafeEval): declaring null intolerance lets
  // Catalyst's constraint inference rewrite isnotnull(f(x)) to
  // isnotnull(x) instead of pushing a duplicated evaluation of this
  // expression into a scan-level Filter.
  override def nullIntolerant: Boolean = true

  require(n >= 1, "shingle size >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** Kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String): ArrayData = {
    val text = input.toString.trim
    val toks = ws.split(text, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftShingles", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => {
        val n = exprs(1) match { case Literal(v: Int, IntegerType) => v }
        ShingleHashes(Cast(exprs(0), StringType), n)
      },
      "built-in")

  /** Column-API entry point. The cast makes a non-string argument an
    * analysis-time no-op/cast instead of a mid-job ClassCastException
    * (ExpectsInputTypes is unavailable — AbstractDataType is
    * private[sql] in Spark 4).
    */
  def shingleHashes(spark: SparkSession, c: Column, n: Int = 3): Column = {
    register(spark)
    call_function("graft_shingle_hashes", c.cast(StringType), lit(n))
  }
}
