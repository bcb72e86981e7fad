package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 MERGE schema auto-evolution — delta-spark's
  * `withSchemaEvolution()` / `MERGE WITH SCHEMA EVOLUTION INTO`:
  * additive source columns (and lossless widenings) evolve the
  * committed schema IN the merge commit; untouched files read the new
  * columns as NULL; CDC and time travel cross the boundary.
  */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("additive source column evolves the table in the merge commit; untouched files read NULL") {
    val path = java.nio.file.Files.createTempDirectory("graft_mev1")
      .toString + "/t"
    // two files so one stays UNTOUCHED by the merge
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .repartitionByRange(2, col("k")), path, statsCols = Seq("k"))
    val v1Files = ManifestTable.manifestFiles(spark, path, 1L)
    assert(v1Files.size === 2)
    // source carries every table column PLUS `score`
    val upd = Seq((2L, "B", 0.5), (3L, "c", 0.9)).toDF("k", "v", "score")
    intercept[IllegalArgumentException] {
      ManifestTable.merge(upd, path, "k") // without evolution: refused
    }
    val v2 = ManifestTable.merge(upd, path, "k", schemaEvolution = true)
    val got = ManifestTable.read(spark, path)
      .select("k", "v", "score").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some(0.5)),
      (3L, "c", Some(0.9))),
      s"evolved merge content wrong: $got")
    // the untouched file is carried byte-identical (same relative ref)
    val v2Files = ManifestTable.manifestFiles(spark, path, v2)
    assert(v1Files.toSet.intersect(v2Files.toSet).nonEmpty,
      "merge must carry the untouched file, not rewrite the table")
    // committed schema evolved; pre-evolution version still reads OLD
    assert(ManifestTable.manifestSchema(spark, path, v2).get.fieldNames
      .toSeq === Seq("k", "v", "score"))
    assert(ManifestTable.readVersion(spark, path, 1L).schema.fieldNames
      .toSeq === Seq("k", "v"), "time travel keeps the old schema")
    // CDC crosses the boundary: the evolved version's changes carry
    // the new column, unioning with older versions aligns by name
    val chg = ManifestTable.changesForVersion(spark, path, v2)
    assert(chg.schema.fieldNames.contains("score"))
    // missing-source-column (non-additive) is refused with evolution
    intercept[IllegalArgumentException] {
      ManifestTable.merge(Seq((1L, 1.0)).toDF("k", "score"), path, "k",
        schemaEvolution = true)
    }
  }

  test("lossless widening evolves the committed type; narrower base files read up") {
    val path = java.nio.file.Files.createTempDirectory("graft_mev2")
      .toString + "/t"
    ManifestTable.write(Seq((1L, 7), (2L, 8)).toDF("k", "n"), path) // n INT
    val upd = Seq((2L, 99L), (3L, 100L)).toDF("k", "n")             // n LONG
    ManifestTable.merge(upd, path, "k", schemaEvolution = true)
    val sch = ManifestTable.read(spark, path).schema
    assert(sch("n").dataType === org.apache.spark.sql.types.LongType,
      s"committed type must widen: $sch")
    assert(ManifestTable.read(spark, path).select("k", "n")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq ===
      Seq((1L, 7L), (2L, 99L), (3L, 100L)))
  }

  test("evolution on a COLUMN-MAPPED table assigns a fresh physical name") {
    val path = java.nio.file.Files.createTempDirectory("graft_mev3")
      .toString + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v0"), path)
    ManifestTable.renameColumn(spark, path, "v0", "v") // mapping ON
    val upd = Seq((2L, "B", 5L), (3L, "c", 6L)).toDF("k", "v", "extra")
    ManifestTable.merge(upd, path, "k", schemaEvolution = true)
    val got = ManifestTable.read(spark, path)
      .select("k", "v", "extra").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some(5L)),
      (3L, "c", Some(6L))), s"mapped evolution content wrong: $got")
    // drop the evolved column, re-add it: old values must NOT resurrect
    ManifestTable.dropColumn(spark, path, "extra")
    val upd2 = Seq((1L, "a", 77L)).toDF("k", "v", "extra")
    ManifestTable.merge(upd2, path, "k", schemaEvolution = true)
    val re = ManifestTable.read(spark, path)
      .select("k", "extra").as[(Long, Option[Long])].collect().toMap
    assert(re === Map(1L -> Some(77L), 2L -> None, 3L -> None),
      s"dropped-then-re-added column resurrected old data: $re")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only evolution, zero file churn, mapped resurrection guard") {
    val path = java.nio.file.Files.createTempDirectory("graft_mev5")
      .toString + "/t"
    ManifestTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val v1Files = ManifestTable.manifestFiles(spark, path, 1L)
    val v2 = ManifestTable.addColumns(spark, path,
      org.apache.spark.sql.types.StructType.fromDDL(
        "score DOUBLE, tagc STRING"))
    // METADATA-ONLY: same file set, evolved schema, old rows NULL
    assert(ManifestTable.manifestFiles(spark, path, v2) === v1Files,
      "ADD COLUMNS must touch zero data files")
    val got = ManifestTable.read(spark, path)
      .select("k", "v", "score", "tagc")
      .as[(Long, String, Option[Double], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", None, None), (2L, "b", None, None)))
    // duplicates refused; time travel keeps the old schema
    intercept[IllegalArgumentException] {
      ManifestTable.addColumns(spark, path,
        org.apache.spark.sql.types.StructType.fromDDL("v STRING"))
    }
    assert(ManifestTable.readVersion(spark, path, 1L)
      .schema.fieldNames.toSeq === Seq("k", "v"))
    // mapped table: dropped-then-re-added via ADD COLUMNS never
    // resurrects old file data
    val p2 = java.nio.file.Files.createTempDirectory("graft_mev6")
      .toString + "/t"
    ManifestTable.write(Seq((1L, 7L)).toDF("k", "payload"), p2)
    ManifestTable.renameColumn(spark, p2, "payload", "pay") // mapping ON
    ManifestTable.dropColumn(spark, p2, "pay")
    ManifestTable.addColumns(spark, p2,
      org.apache.spark.sql.types.StructType.fromDDL("pay BIGINT"))
    assert(ManifestTable.read(spark, p2).select("pay")
      .as[Option[Long]].head() === None,
      "re-added column must read NULL, not the dropped column's bytes")
  }

  test("SQL: MERGE WITH SCHEMA EVOLUTION INTO ... INSERT * evolves; star-form requirement enforced") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    SparkSession.setActiveSession(s)
    try {
      val path = java.nio.file.Files.createTempDirectory("graft_mev4")
        .toString + "/t"
      ManifestTable.write(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), path)
      s.createDataFrame(Seq((2L, 21L, "x"), (3L, 30L, "y")))
        .toDF("id", "v", "tagc").createOrReplaceTempView("mev_src")
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$path' AS t
            USING mev_src AS u ON t.id = u.id
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
      val got = ManifestTable.read(s, path)
        .select("id", "v", "tagc").as[(Long, Long, Option[String])]
        .collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, 10L, None), (2L, 21L, Some("x")),
        (3L, 30L, Some("y"))), s"SQL evolution wrong: $got")
      // explicit assignment list + evolution, no new targets: plain
      // update, schema unchanged (r16: the star-forms-only refusal is
      // lifted — delta evolves on explicit lists too)
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$path' AS t
            USING mev_src AS u ON t.id = u.id
            WHEN MATCHED THEN UPDATE SET v = u.v + 1""")
      assert(ManifestTable.read(s, path).schema.fieldNames.toSeq ===
        Seq("id", "v", "tagc"))
      assert(ManifestTable.read(s, path).filter($"id" === 2L)
        .select("v").as[Long].head() === 22L)
      // explicit assignment to a column the target LACKS evolves the
      // schema in the merge commit — delta's assignment-list evolution
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO '$path' AS t
            USING mev_src AS u ON t.id = u.id
            WHEN MATCHED AND u.id = 2 THEN UPDATE SET src_tag = u.tagc""")
      val evolved = ManifestTable.read(s, path)
      assert(evolved.schema.fieldNames.toSeq ===
        Seq("id", "v", "tagc", "src_tag"))
      val tags = evolved.select("id", "src_tag")
        .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
      assert(tags === Seq((1L, None), (2L, Some("x")), (3L, None)),
        s"assignment-list evolution wrong: $tags")
      // WITHOUT the evolution keyword the same statement still refuses
      intercept[Exception] {
        s.sql(
          s"""MERGE INTO '$path' AS t
              USING mev_src AS u ON t.id = u.id
              WHEN MATCHED THEN UPDATE SET brand_new = u.tagc""")
      }
      // the metadata-only SQL spelling
      s.sql(s"ALTER TABLE '$path' ADD COLUMNS (note STRING)")
      assert(ManifestTable.read(s, path).schema.fieldNames.toSeq ===
        Seq("id", "v", "tagc", "src_tag", "note"))
    } finally SparkSession.setActiveSession(base)
  }
}
