package graft.plans

import graft.pipeline.VariantShred
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SHRED SUBSTITUTION — the read-side transparency rule for
  * [[VariantShred variant shredding]]: a query that spells
  * `variant_get(v, '$.k', 'long')` over a shredded table silently
  * reads the MATERIALIZED `_shred_k` column instead of re-walking the
  * variant encoding per row. This is what turns shredding from an
  * API convention into a table property: SQL users (and BI tools)
  * keep writing the standard variant accessor, and because the
  * substituted reference is an ordinary typed column, BOTH pruning
  * layers engage for free — parquet row-group min/max under the
  * pushed filter, and the manifest's file-level data skipping.
  *
  * Post-resolution analyzer rule (injected from [[GraftExtensions]]),
  * which is the altitude that makes it sound: at analysis time no
  * column pruning has run, so the relation's full output — including
  * the shreds — is still in scope beneath every operator; the
  * substitution then lets Catalyst's own ColumnPruning drop the
  * variant column when nothing else needs it.
  *
  * Soundness contract: `_shred_<path>` is the writer-reserved
  * namespace ([[VariantShred.shredName]]) — each shred was computed
  * at write time by EXACTLY the expression being substituted, over
  * the same rows. The rule requires (a) the accessor's path is a
  * literal, (b) a UNIQUE in-scope attribute carries the shred name,
  * (c) its type equals the accessor's target type — anything else
  * leaves the expression untouched.
  */
case class ShredSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case node if node.childrenResolved =>
        val childOut = node.children.flatMap(_.output)
        if (childOut.isEmpty) node
        else node.transformExpressionsUp {
          case vg @ VariantGet(_: AttributeReference,
              Literal(p: UTF8String, StringType), _, _, _) if vg.resolved =>
            val name = VariantShred.shredName(p.toString)
            childOut.filter(a =>
              a.name == name && a.dataType == vg.dataType) match {
              case Seq(shred) => shred
              case _ => vg
            }
        }
    }
}
