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

  test("SOUNDNESS: plain ManifestTable.append of a raw-variant batch lands correctly shredded files WITH stats — in ONE commit lifecycle") {
    val path = tmp("graft_vs_i")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"),
      rangeLayoutOn = Some("$.k"), rangePartitions = 4)
    // the initial write is ONE commit: data + generated declarations +
    // spec properties + stats schema all at v1 (no crash window
    // between "data landed" and "spec recorded")
    assert(ManifestTable.currentVersion(spark, path) === Some(1L))
    assert(ManifestTable.generatedColumns(spark, path)
      .contains("_shred_k"))
    assert(ManifestTable.tableProperties(spark, path)
      .get(VariantShred.ShredColProp) === Some("v"))
    val (_, totalBefore) = VariantShred.pruneCount(spark, path, "$.k", 60, 70)
    // a PLAIN append (no VariantShred API in sight) of a raw batch:
    // the generated-column guard computes the shreds inside the commit
    val batch = spark.range(1000, 1050).toDF("id")
      .withColumn("v", expr(
        """parse_json(concat('{"k":', 60 + id % 10, ',"s":"y', id, '"}'))"""))
    ManifestTable.append(batch, path)
    val back = ManifestTable.read(spark, path)
    assert(back.count() === 250L)
    assert(back.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")))
      .count() === 0L)
    // the appended files carry footer stats on the shred (persistent
    // stats schema — no caller passed statsCols): the k∈[60,70] read
    // touches ONLY the appended files, pruning every original file
    val (touched, total) = VariantShred.pruneCount(spark, path, "$.k", 60, 70)
    assert(total > totalBefore, "append must add files")
    assert(touched === total - totalBefore,
      s"appended-file stats must confine the range read: $touched of " +
        s"$total files (original $totalBefore must all prune)")
    // and substitution still fires on the grown table
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val q = ManifestTable.read(s, path)
        .filter(expr("variant_get(v, '$.k', 'long')") >= 60)
      val walks = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
        })
      }.flatten
      assert(walks.isEmpty, "substitution must survive plain appends")
      assert(q.count() === 50L)
    }
  }

  test("SOUNDNESS: a DIVERGENT hand-built shred on a plain append fails the write loudly; a correct one is accepted") {
    val path = tmp("graft_vs_j")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    val batch = spark.range(300, 320).toDF("id")
      .withColumn("v", expr("""parse_json(concat('{"k":', id % 50, '}'))"""))
    // wrong values: the generated-column equality guard kills the job
    // BEFORE any file lands — a wrong shred can never be committed
    val vBefore = ManifestTable.currentVersion(spark, path)
    val e = intercept[Exception] {
      ManifestTable.append(batch.withColumn("_shred_k", lit(-1L)), path)
    }
    assert(e.getMessage != null && e.getMessage.contains("_shred_k"),
      s"divergent shred must name the column: ${e.getMessage}")
    assert(ManifestTable.currentVersion(spark, path) === vBefore,
      "a refused batch must not commit")
    // byte-equal values pass the enforcement (a faithful table copy)
    ManifestTable.append(
      batch.withColumn("_shred_k", expr("variant_get(v, '$.k', 'long')")),
      path)
    assert(ManifestTable.read(spark, path).count() === 220L)
  }

  test("SOUNDNESS: UPDATE on the variant recomputes the shred; UPDATE SET on a shred column refuses; MERGE of a raw source recomputes") {
    val path = tmp("graft_vs_k")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    // predicate UPDATE rewrites v for ids < 10: the stripped+recomputed
    // shred must track the NEW variant, not the old one
    ManifestTable.updateWhere(spark, path,
      Seq("v" -> expr("""parse_json(concat('{"k":', id + 500, '}'))""")),
      col("id") < 10)
    val upd = ManifestTable.read(spark, path).filter(col("id") < 10)
    assert(upd.filter(col("_shred_k") =!= col("id") + 500).count() === 0L)
    assert(upd.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")))
      .count() === 0L)
    // a shred column is generated — direct SET refuses
    val e = intercept[IllegalArgumentException] {
      ManifestTable.updateWhere(spark, path,
        Seq("_shred_k" -> lit(0L)), col("id") < 5)
    }
    assert(e.getMessage.contains("generated"))
    // keyed MERGE with a RAW source (id + v only, no shred columns):
    // the staging pass computes the shred for upserted rows
    val src = spark.range(5, 15).toDF("id")
      .withColumn("v", expr("""parse_json(concat('{"k":', id + 900, '}'))"""))
    ManifestTable.merge(src, path, "id")
    val merged = ManifestTable.read(spark, path)
      .filter(col("id") >= 5 && col("id") < 15)
    assert(merged.filter(col("_shred_k") =!= col("id") + 900).count() === 0L)
  }

  test("SOUNDNESS: COPY INTO a shredded table computes shreds for ingested files (schema alignment leaves them absent, the guard fills them)") {
    val path = tmp("graft_vs_ci")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    // an external dump: raw variant rows, NO shred columns
    val dump = java.nio.file.Files.createTempDirectory("graft_vs_dump").toString
    spark.range(500, 530).toDF("id")
      .withColumn("v", expr("""parse_json(concat('{"k":', id % 50, '}'))"""))
      .coalesce(1).write.mode("overwrite").parquet(dump)
    val (_, n) = ManifestTable.copyInto(spark, path, dump)
    assert(n >= 1)
    val back = ManifestTable.read(spark, path)
    assert(back.count() === 230L)
    assert(back.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")))
      .count() === 0L, "COPY INTO must land computed shreds")
    // re-run is the file-level no-op it always was
    val (_, n2) = ManifestTable.copyInto(spark, path, dump)
    assert(n2 === 0)
  }

  test("SOUNDNESS: clause merges (mergeMulti) recompute unassigned shreds — an UPDATE SET on the variant cannot strand a stale shred") {
    val path = tmp("graft_vs_mm")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    // clause merge assigns the VARIANT but not the shred: the
    // generated-column fill must recompute _shred_k from the NEW v
    val src = spark.range(0, 20).toDF("id")
      .withColumn("nv", expr("""parse_json(concat('{"k":', id + 700, '}'))"""))
    ManifestTable.mergeMulti(src, path, "id",
      matched = Seq(ManifestTable.MergeUpdate(None,
        Seq("v" -> col("nv")))),
      notMatched = Nil)
    val merged = ManifestTable.read(spark, path).filter(col("id") < 20)
    assert(merged.count() === 20L)
    assert(merged.filter(col("_shred_k") =!= col("id") + 700).count() === 0L)
    assert(merged.filter(
      !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")))
      .count() === 0L)
    // untouched rows keep their original shreds
    val rest = ManifestTable.read(spark, path).filter(col("id") >= 20)
    assert(rest.filter(col("_shred_k") =!= col("id") % 50).count() === 0L)
    // direct SET on the shred column refuses (generated — Delta's
    // no-assigning-generated-columns merge rule)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.mergeMulti(src, path, "id",
        matched = Seq(ManifestTable.MergeUpdate(None,
          Seq("_shred_k" -> lit(0L)))), notMatched = Nil)
    }
    assert(e.getMessage.contains("generated"))
  }

  test("SOUNDNESS: substitution is WRITER-BOUND — user-minted _shred_ columns and re-derived variants never substitute") {
    val path = tmp("graft_vs_l")
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "long"))
    graft.GraftSession.withSqlExtensions(spark) { s =>
      def gets(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.analyzed.collect {
          case n => n.expressions.flatMap(_.collect {
            case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
          })
        }.flatten
      // (1) a user MINTS a _shred_k over a plain frame: name+type match
      // the old convention, but there is no binding metadata — the
      // accessor must keep the live walk and answer from the variant
      val minted = s.range(100).toDF("id")
        .withColumn("v", expr("""parse_json(concat('{"k":', id, '}'))"""))
        .withColumn("_shred_k", lit(-7L))
        .filter(expr("variant_get(v, '$.k', 'long')") === 3L)
      assert(gets(minted).nonEmpty,
        "user-minted _shred_ column must never substitute")
      assert(minted.count() === 1L)
      // (2) the ADVICE r17 stale-value scenario: re-derive the variant
      // while the real shreds stay in scope — the new v carries no
      // writer marker, so the accessor walks the NEW variant and sees
      // the post-transform values, never the stale shred
      val rederived = ManifestTable.read(s, path)
        .withColumn("v",
          expr("""parse_json(concat('{"k":', id + 10000, '}'))"""))
      val q = rederived.select(
        expr("variant_get(v, '$.k', 'long')").as("k"))
      assert(gets(q).nonEmpty,
        "re-derived variant must NOT serve the stale shred")
      assert(q.agg(min(col("k"))).head().getLong(0) === 10000L)
      // (3) the genuine attribute still substitutes through an
      // explicit projection that KEEPS the shred (and a rename of the
      // shred falls back to the walk — conservative, still correct)
      val projected = ManifestTable.read(s, path)
        .select(col("id"), col("v"), col("_shred_k"))
        .filter(expr("variant_get(v, '$.k', 'long')") === 3L)
      assert(gets(projected).isEmpty,
        "binding metadata must survive an explicit projection")
      assert(projected.count() === 4L)
      val renamed = ManifestTable.read(s, path)
        .select(col("id"), col("v"), col("_shred_k").as("kk"))
        .filter(expr("variant_get(v, '$.k', 'long')") === 3L)
      assert(renamed.count() === 4L,
        "a renamed shred must still answer correctly (via the walk)")
    }
  }

  test("spec validation: name-encoding collisions, delimiter characters, and _shred_ inputs refuse at write") {
    val path = tmp("graft_vs_m")
    // $.a.b and $.a_b encode to the same _shred_a_b — silent
    // overwrite refused loudly
    val e1 = intercept[IllegalArgumentException] {
      VariantShred.write(fixture, path, "v",
        Seq("$.a.b" -> "long", "$.a_b" -> "long"))
    }
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      VariantShred.write(fixture, path, "v", Seq("$.a;b" -> "long"))
    }
    assert(e2.getMessage.contains("delimiter"))
    val e3 = intercept[IllegalArgumentException] {
      VariantShred.write(fixture.withColumn("_shred_x", lit(1)),
        path, "v", Seq("$.k" -> "long"))
    }
    assert(e3.getMessage.contains("RAW variant"))
    // types with commas (decimal precision) round-trip through the
    // ';'-delimited spec
    VariantShred.write(fixture, path, "v", Seq("$.k" -> "decimal(10,2)"))
    assert(VariantShred.shreddedPaths(spark, path) ===
      Map("$.k" -> "decimal(10,2)"))
    // the shred keys are VERB-MANAGED: a bare SET TBLPROPERTIES could
    // record a spec whose generated shreds were never declared — a
    // spec plain writes would not honor — so it refuses loudly
    val e4 = intercept[IllegalArgumentException] {
      ManifestTable.setProperties(spark, path,
        Map(VariantShred.ShredProp -> "$.z:long"))
    }
    assert(e4.getMessage.contains("reserved"))
  }

  test("ARRAY shredding: an array path materializes as array<T>, substitutes for the typed accessor, and recomputes on plain appends") {
    val path = tmp("graft_vs_arr")
    val arrFixture = spark.range(100).toDF("id")
      .withColumn("v", expr(
        "parse_json(to_json(named_struct('k', id % 10, " +
          "'tags', transform(sequence(0, cast(id % 3 as int)), " +
          "i -> id + i))))"))
    VariantShred.write(arrFixture, path, "v",
      Seq("$.k" -> "long", "$.tags" -> "array<long>"))
    // the array shred equals the live walk row-for-row
    val back = ManifestTable.read(spark, path)
    assert(back.schema("_shred_tags").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))
    assert(back.filter(!(col("_shred_tags") <=>
      expr("variant_get(v, '$.tags', 'array<long>')"))).count() === 0L)
    // array shreds carry NO footer stats (min/max is meaningless);
    // the scalar sibling keeps the stats schema
    val stCols = ManifestTable.resolveState(spark, path,
      ManifestTable.currentVersion(spark, path).get).statsSchemaCols
    assert(stCols.contains("_shred_k") && !stCols.contains("_shred_tags"),
      s"stats schema: $stCols")
    // substitution serves the typed array; explode runs over it
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val q = ManifestTable.read(s, path)
        .select(explode(
          expr("variant_get(v, '$.tags', 'array<long>')")).as("e"))
      val walks = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
        })
      }.flatten
      assert(walks.isEmpty, "array accessor must substitute")
      assert(q.count() === (0 until 100).map(_ % 3 + 1).sum.toLong)
    }
    // a plain append recomputes the array shred too
    ManifestTable.append(spark.range(100, 120).toDF("id")
      .withColumn("v", expr(
        "parse_json(to_json(named_struct('k', id % 10, " +
          "'tags', transform(sequence(0, cast(id % 3 as int)), " +
          "i -> id + i))))")), path)
    val grown = ManifestTable.read(spark, path)
    assert(grown.count() === 120L)
    assert(grown.filter(!(col("_shred_tags") <=>
      expr("variant_get(v, '$.tags', 'array<long>')"))).count() === 0L)
  }

  test("SQL verb: ALTER TABLE ... SHRED VARIANT retrofits shredding in one rewrite commit; malformed pairs and re-shredding refuse") {
    val path = tmp("graft_vs_sql")
    ManifestTable.write(fixture, path)
    graft.GraftSession.withSqlExtensions(spark) { s =>
      val v = s.sql(s"""ALTER TABLE '$path' SHRED VARIANT v
                        ON ('$$.k' 'long', '$$.s' 'string')
                        RANGE LAYOUT ON '$$.k' PARTITIONS 4""").collect()
      assert(v.head.getLong(0) === 2L, "one rewrite commit on v1")
      assert(VariantShred.shreddedPaths(s, path) ===
        Map("$.k" -> "long", "$.s" -> "string"))
      assert(ManifestTable.generatedColumns(s, path).keySet ===
        Set("_shred_k", "_shred_s"))
      val back = ManifestTable.read(s, path)
      assert(back.filter(
        !(col("_shred_k") <=> expr("variant_get(v, '$.k', 'long')")))
        .count() === 0L)
      // the range layout landed: the k range read prunes files
      val (touched, total) = VariantShred.pruneCount(s, path, "$.k", 5, 9)
      assert(touched < total, s"$touched/$total")
      // substitution fires on the retrofitted table
      val q = ManifestTable.read(s, path)
        .filter(expr("variant_get(v, '$.k', 'long')") === 7L)
      val walks = q.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect {
          case vg: org.apache.spark.sql.catalyst.expressions.variant.VariantGet => vg
        })
      }.flatten
      assert(walks.isEmpty && q.count() === 4L)
      // plain append onto the retrofitted table auto-shreds
      ManifestTable.append(s.range(200, 210).toDF("id")
        .withColumn("v", expr(
          """parse_json(concat('{"k":', id % 50, ',"s":"x', id, '"}'))""")),
        path)
      assert(ManifestTable.read(s, path).count() === 210L)
      // re-shredding refuses (declarations immutable)
      val e1 = intercept[Exception] {
        s.sql(s"ALTER TABLE '$path' SHRED VARIANT v ON ('$$.z' 'long')")
          .collect()
      }
      assert(e1.getMessage.contains("already has a shred spec"))
      // malformed pair list refuses loudly
      val e2 = intercept[Exception] {
        s.sql(s"ALTER TABLE '$path' SHRED VARIANT v ON ('$$.k' long)")
          .collect()
      }
      assert(e2.getMessage.contains("pairs"))
      // paren-bearing quoted types parse (the pairs group is greedy)
      val p2 = tmp("graft_vs_sql2")
      ManifestTable.write(fixture, p2)
      s.sql(s"""ALTER TABLE '$p2' SHRED VARIANT v
                ON ('$$.k' 'decimal(10,2)')""").collect()
      assert(VariantShred.shreddedPaths(s, p2) ===
        Map("$.k" -> "decimal(10,2)"))
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

  test("legacy ','-delimited spec bridges on read — paren-bearing types stay whole") {
    import graft.pipeline.VariantShred
    // r17 tables recorded "$.a:long,$.b:string"; the r18 writer
    // switched to ';' — reading the old format must parse each entry
    // (not one entry with a comma-bearing type), and a legacy
    // decimal(p,s) type must not split at its own precision comma
    val legacy = Map(VariantShred.ShredProp ->
      "$.a:long,$.b:decimal(10,2),$.c:string")
    assert(VariantShred.specOf(legacy) === Seq(
      "$.a" -> "long", "$.b" -> "decimal(10,2)", "$.c" -> "string"))
    // the current ';' format is authoritative when present
    val cur = Map(VariantShred.ShredProp ->
      "$.a:long;$.b:decimal(10,2)")
    assert(VariantShred.specOf(cur) === Seq(
      "$.a" -> "long", "$.b" -> "decimal(10,2)"))
    // single-entry specs (no delimiter at all) parse in both eras
    assert(VariantShred.specOf(Map(VariantShred.ShredProp ->
      "$.only:decimal(10,2)")) === Seq("$.only" -> "decimal(10,2)"))
  }
}
