package graft

import graft.pipeline.{ManifestTable, VariantShred}
import org.apache.spark.sql.functions._

/** Variant shredding (round 17): declared typed paths materialize at
  * write time with footer stats — shredded-path reads skip the
  * variant walk, range predicates prune files, unshredded paths stay
  * readable from the stored variant.
  */
class VariantShredSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def fixture = spark.range(200).toDF("id")
    .withColumn("v", expr(
      """parse_json(concat('{"k":', id % 50, ',"s":"x', id, '"}'))"""))

  test("shreds equal the variant walk row-for-row; spec recorded; variant stays whole") {
    val path = tmp("graft_vs_a")
    VariantShred.write(fixture, path, "v",
      Seq("$.k" -> "long", "$.s" -> "string"))
    assert(VariantShred.shreddedPaths(spark, path) ===
      Map("$.k" -> "long", "$.s" -> "string"))
    val back = ManifestTable.read(spark, path)
    assert(back.columns.toSet.contains("_shred_k"))
    // every shred equals the live variant extraction of the same row
    val mismatched = back.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")) ||
        !(col("_shred_s") <=> expr("variant_get(v, '$.s', 'string')")))
      .count()
    assert(mismatched === 0L)
    // unshredded paths still walk the stored variant
    assert(back.selectExpr("count(try_variant_get(v, '$.zzz', 'long'))")
      .as[Long].head() === 0L)
  }

  test("range layout + footer stats prune files; pruned read is content-complete") {
    val path = tmp("graft_vs_b")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"),
      rangeLayoutOn = Some("$.k"), rangePartitions = 8)
    val (touched, total) = VariantShred.pruneCount(spark, path, "$.k", 5, 9)
    assert(total >= 8 - 1, s"range layout should stage ~8 files, got $total")
    assert(touched < total, s"stats must prune: $touched/$total")
    val pruned = VariantShred.readPathRange(spark, path, "$.k", 5, 9)
      .filter(col("_shred_k").between(5, 9))
    // 200 ids over k = id % 50 -> 4 rows per k, 5 k-values in range
    assert(pruned.count() === 20L)
    // identical to the unpruned filter (pruning never drops content)
    val full = ManifestTable.read(spark, path)
      .filter(col("_shred_k").between(5, 9))
    assert(pruned.select(sum(col("id"))).as[Long].head() ===
      full.select(sum(col("id"))).as[Long].head())
  }

  test("ShredSubstitution: variant_get over a shredded table reads the shred column and pushes the filter") {
    val path = tmp("graft_vs_d")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"),
      rangeLayoutOn = Some("$.k"), rangePartitions = 4)
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val q = ManifestTable.read(s, path)
        .filter(expr("variant_get(v, '$.k', 'long')").between(5, 9))
        .agg(sum(expr("variant_get(v, '$.k', 'long')")).as("ksum"),
          count(lit(1)).as("n"))
      // every variant_get was substituted by the materialized shred AT
      // ANALYSIS (the optimizer plan is checked via the pushed filter
      // below — Spark's own PushVariantIntoScan rewrites any RESIDUAL
      // variant_get there, so the analyzed plan is where this rule's
      // effect is observable)
      val survivors = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
        })
      }.flatten
      assert(survivors.isEmpty,
        s"variant_get must substitute to _shred_k, found: $survivors")
      // the substituted predicate reaches the parquet scan
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("_shred_k"),
        s"pushed filter must reference the shred column:\n$plan")
      // 200 ids, k = id % 50 -> 4 rows per k; k in [5,9] -> 20 rows
      val row = q.head()
      assert(row.getLong(1) === 20L)
      assert(row.getLong(0) === 4L * (5 + 6 + 7 + 8 + 9))
      // a NON-shredded path with the same spelling stays a live
      // variant access (kept as VariantGet at analysis; the optimizer
      // may then serve it via its own scan-level variant pushdown)
      val untouched = ManifestTable.read(s, path)
        .select(expr("variant_get(v, '$.s', 'string')").as("s"))
      val walks = untouched.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
        })
      }.flatten
      assert(walks.nonEmpty, "unshredded path must keep the variant walk")
      assert(untouched.filter(col("s").startsWith("x")).count() === 200L)
    }
  }

  test("append recomputes shreds from the recorded spec; hand-built shreds refuse") {
    val path = tmp("graft_vs_e")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    // a raw batch (no shred columns) appends and gets its shreds
    val batch = spark.range(200, 250).toDF("id")
      .withColumn("v", expr(
        """parse_json(concat('{"k":', id % 50, ',"s":"x', id, '"}'))"""))
    VariantShred.append(batch, path, "v")
    val back = ManifestTable.read(spark, path)
    assert(back.count() === 250L)
    val mismatched = back.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')"))).count()
    assert(mismatched === 0L)
    // hand-built shred columns are refused (they could disagree)
    val e = intercept[IllegalArgumentException] {
      VariantShred.append(batch.withColumn("_shred_k", lit(0L)), path, "v")
    }
    assert(e.getMessage.contains("RAW variant column"))
    // an unshredded table refuses append-with-recompute loudly
    val plain = tmp("graft_vs_f")
    ManifestTable.write(fixture, plain)
    val e2 = intercept[IllegalArgumentException] {
      VariantShred.append(batch, plain, "v")
    }
    assert(e2.getMessage.contains("no recorded shred spec"))
  }

  test("ShredSubstitution soundness: same-child scoping — self-joins substitute per side, cross-table never borrows a shred, type mismatches walk") {
    val pa = tmp("graft_vs_g")
    val pb = tmp("graft_vs_h")
    VariantShred.write(fixture, pa, "v", Seq("$.k" -> "long"))
    VariantShred.write(fixture, pb, "v", Seq("$.k" -> "long"))
    graft.GraftSession.withSqlExtensions(spark) { s =>
      def gets(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.analyzed.collect {
          case n => n.expressions.flatMap(_.collect {
            case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
          })
        }.flatten
      // a self-join carries TWO _shred_k attributes, one per side —
      // same-child scoping resolves each accessor to ITS side's shred
      val a = ManifestTable.read(s, pa).as("a")
      val b = ManifestTable.read(s, pb).as("b")
      val joined = a.join(b, col("a.id") === col("b.id"))
        .select(col("a.id"),
          expr("variant_get(a.v, '$.k', 'long')").as("k"))
      assert(gets(joined).isEmpty,
        "self-join sides must substitute their own shred")
      assert(joined.agg(sum(col("k"))).head().getLong(0) ===
        (0 until 200).map(_ % 50).sum.toLong)
      // a join of a SHREDDED table with an UNSHREDDED variant-bearing
      // frame: the accessor over the unshredded side must NOT borrow
      // the shredded side's (unique in scope!) _shred_k — row-source
      // identity. The raw side's k values are shifted (+1) so a wrong
      // substitution changes the answer, not just the plan.
      val raw = s.range(200).toDF("id")
        .withColumn("w", expr(
          """parse_json(concat('{"k":', (id + 1) % 50, '}'))"""))
        .as("r")
      val crossed = ManifestTable.read(s, pa).as("a2")
        .join(raw, col("a2.id") === col("r.id"))
        .select(expr("variant_get(r.w, '$.k', 'long')").as("rk"))
      assert(gets(crossed).nonEmpty,
        "unshredded side must keep its variant walk")
      assert(crossed.agg(sum(col("rk"))).head().getLong(0) ===
        (0 until 200).map(i => (i + 1) % 50).sum.toLong)
      // a type-mismatched accessor (string read of a long shred)
      // must keep the variant walk
      val typed = ManifestTable.read(s, pa)
        .select(expr("variant_get(v, '$.k', 'string')").as("ks"))
      assert(gets(typed).nonEmpty,
        "type-mismatched accessor must NOT substitute")
      assert(typed.filter(col("ks") === "7").count() === 4L)
      // a projection that DROPPED the shred: the producer still has
      // it, but substituting would dangle — the visibility guard
      // keeps the walk and the query answers
      val dropped = ManifestTable.read(s, pa).select(col("id"), col("v"))
        .filter(expr("variant_get(v, '$.k', 'long')") === 7L)
      assert(gets(dropped).nonEmpty,
        "dropped-shred scope must NOT substitute")
      assert(dropped.count() === 4L)
    }
  }

  test("pathCol serves the shred when present, falls back to variant_get when not") {
    val path = tmp("graft_vs_c")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    val back = ManifestTable.read(spark, path)
    // shredded: resolves to the materialized column
    val viaShred = back.select(
      VariantShred.pathCol(back, "v", "$.k", "long").as("k"))
    // not shredded: same values through the variant walk
    val viaWalk = back.select(
      VariantShred.pathCol(back, "v", "$.s", "string").as("s"))
    assert(viaShred.agg(sum(col("k"))).as[Long].head() ===
      back.selectExpr("sum(variant_get(v, '$.k', 'long'))").as[Long].head())
    assert(viaWalk.filter(col("s").startsWith("x")).count() === 200L)
  }
}
