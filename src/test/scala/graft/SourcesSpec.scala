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
