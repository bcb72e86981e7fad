package graft

import graft.sources.{Csv, Jsonl}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv roundtrip: explicit-schema read returns exactly what was written") {
    val src = Tables.nation(spark, sfTiny)
    val dir = tmpDir("graft_csv")
    Csv.write(src, dir)
    val back = Csv.read(spark, dir, src.schema)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    // value-exact: anti-join in both directions is empty
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("csv inferred read recovers row count and key column") {
    val src = Tables.region(spark, sfTiny)
    val dir = tmpDir("graft_csv_inf")
    Csv.write(src, dir)
    val back = Csv.readInferred(spark, dir)
    assert(back.count() === src.count())
    assert(back.columns.toSeq === src.columns.toSeq)
    assert(
      back.agg(sum("r_regionkey")).head.getLong(0) ===
        src.agg(sum("r_regionkey")).head.getLong(0))
  }

  test("csv roundtrip survives quoting hazards (commas, quotes, JSON payloads)") {
    val src = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("event_type"), col("props"))
    val dir = tmpDir("graft_csv_quote")
    Csv.write(src, dir)
    val back = Csv.read(spark, dir, src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("quarantining csv read isolates malformed rows without losing clean ones") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft_csv_dirty")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      """id,qty,price
        |1,5,10.5
        |2,not_a_number,3.25
        |3,7,oops
        |4,2,99.0
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType),
      StructField("price", DoubleType)))
    val df = Csv.readQuarantining(spark, dir, schema).cache()
    val clean = df.filter(col("_corrupt").isNull)
    val quarantined = df.filter(col("_corrupt").isNotNull)
    assert(clean.count() === 2)
    assert(quarantined.count() === 2)
    assert(clean.select(sum("qty")).head.getLong(0) === 7)
    // the corrupt column preserves the raw line for forensic replay
    assert(quarantined.select("_corrupt").collect()
      .forall(_.getString(0).nonEmpty))
    df.unpersist()
  }

  test("quarantining bronze ingest end-to-end: clean rows land in bronze, corrupt in quarantine") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft_csv_dirty2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "feed.csv"),
      """id,qty,price
        |1,5,10.5
        |2,not_a_number,3.25
        |3,7,oops
        |4,2,99.0
        |5,1,1.0
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType),
      StructField("price", DoubleType)))
    val out = tmpDir("graft_bronze_q")
    val (nClean, nBad) = graft.pipeline.Medallion.ingestCsvQuarantined(
      spark, dir, schema, s"$out/bronze", s"$out/quarantine")
    assert(nClean === 3 && nBad === 2)
    // bronze round-trips with the pinned schema, no corrupt column
    val bronze = spark.read.parquet(s"$out/bronze")
    assert(bronze.columns.toSeq === Seq("id", "qty", "price"))
    assert(bronze.select(sum("qty")).head.getLong(0) === 8)
    // quarantine preserves the raw lines for forensic replay
    val q = spark.read.json(s"$out/quarantine")
    assert(q.count() === 2)
    assert(q.select("raw_line").collect().map(_.getString(0)).toSet
      === Set("2,not_a_number,3.25", "3,7,oops"))
    // the ledger audit twin: every feed row accounted for, rate exact
    val audit = graft.pipeline.Medallion.quarantineAudit(spark, dir, schema)
      .collect()(0)
    assert(audit.getLong(0) === 5 && audit.getLong(1) === 3 &&
      audit.getLong(2) === 2)
    assert(audit.getDouble(3) === 0.4)
    assert(nClean + nBad === audit.getLong(0),
      "ingest counts must reconcile with the feed ledger")
  }

  test("orc roundtrip preserves values and prunes columns like parquet") {
    val dir = tmpDir("graft_orc")
    val src = Tables.orders(spark, sfTiny)
    graft.sources.Orc.write(src, dir)
    val back = graft.sources.Orc.read(spark, dir)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0 && src.exceptAll(back).count() === 0)
    // pushdown parity with parquet: pruned read schema + pushed filter
    val plan = back.filter(col("o_orderkey") === 1L).select("o_totalprice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && !plan.contains("o_comment"),
      "ORC scan must push filters and prune columns")
  }

  test("binaryFile ingest: a blob directory becomes a multimodal binary-column table") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val dir = tmpDir("graft_blobs")
    def png(name: String, w: Int, h: Int): Unit =
      assert(ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB),
        "png", new java.io.File(dir, name)))
    png("a.png", 17, 9)
    png("b.png", 5, 7)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "notes.txt"), "not an image")
    val blobs = graft.sources.BinaryDir.read(spark, dir, glob = "*.png")
    val rows = blobs.collect().map(r =>
      r.getString(0) -> ((r.getAs[Array[Byte]](1), r.getLong(2)))).toMap
    // the glob filter keeps the listing to matching files only
    assert(rows.keySet === Set("a.png", "b.png"))
    rows.foreach { case (_, (bytes, n)) => assert(bytes.length.toLong === n) }
    // the blob column feeds the multimodal decode kernel unchanged
    val withIds = blobs.select(
      when(col("doc_id") === "a.png", 1L).otherwise(2L).as("doc_id"),
      col("media").as("payload"))
    val dims = graft.ops.Multimodal.decodeMeta(spark, withIds)
      .collect().map(m => m.doc_id -> ((m.width, m.height))).toMap
    assert(dims(1L) === ((17, 9)) && dims(2L) === ((5, 7)))
  }

  test("jsonl roundtrip preserves values including nested-ish string props") {
    val src = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
    val dir = tmpDir("graft_jsonl")
    Jsonl.write(src, dir)
    val back = Jsonl.read(spark, dir, src.schema)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
  }
}
