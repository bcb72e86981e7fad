package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation with a LEARNED merge table — the
  * real thing behind `token_bpe`'s fixed ≤4-char-piece budget stand-in:
  * each regex pre-token (graft.ops.Text.BpePattern, the GPT-2 shape)
  * starts as characters and greedily applies the lowest-rank adjacent
  * merge until none applies — the standard BPE tokenizer inner loop
  * (Sennrich et al., ACL 2016; GPT-2's tokenizer).
  *
  * The merge table rides inside the expression (task-serialized; the
  * rank map builds once per executor via lazy val). At a production
  * ~50k-merge vocabulary that is still only a few hundred KB — the same
  * payload every tokenizer worker ships. Output is array<array<string>>
  * (pieces per pre-token), so both counting (budget accounting) and
  * adjacent-pair statistics (training) read from one expression.
  *
  * CodegenFallback: the per-row work is a data-dependent loop over a
  * hash map — no codegen win available; the surrounding projection
  * still compiles.
  */
case class BpePieces(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  // null in -> null out (nullSafeEval): declaring null intolerance lets
  // Catalyst's constraint inference rewrite isnotnull(f(x)) to
  // isnotnull(x) instead of pushing a duplicated evaluation of this
  // expression into a scan-level Filter.
  override def nullIntolerant: Boolean = true

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_bpe_pieces"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  @transient private lazy val pretokenRe =
    java.util.regex.Pattern.compile(graft.ops.Text.BpePattern)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val m = pretokenRe.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val tok = m.group()
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < tok.length) { pieces += tok.substring(i, i + 1); i += 1 }
      var done = pieces.length < 2
      while (!done) {
        var best = Int.MaxValue
        var bestI = -1
        var j = 0
        while (j < pieces.length - 1) {
          val r = rank.getOrElse((pieces(j), pieces(j + 1)), Int.MaxValue)
          if (r < best) { best = r; bestI = j }
          j += 1
        }
        if (bestI < 0) done = true
        else {
          pieces(bestI) = pieces(bestI) + pieces(bestI + 1)
          pieces.remove(bestI + 1)
          done = pieces.length < 2
        }
      }
      out += new GenericArrayData(
        pieces.map(p => UTF8String.fromString(p): Any).toArray)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

object BpePieces {

  /** Per-session registration binding THIS merge table; the function
    * name carries a caller tag so several tables can coexist.
    */
  def pieces(spark: SparkSession, c: Column,
             merges: Seq[(String, String)], tag: String = "default"): Column = {
    val fn = s"graft_bpe_pieces_$tag"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn, exprs => BpePieces(exprs.head, merges), "built-in")
    call_function(fn, c.cast(StringType))
  }
}
