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
