package graft

import graft.pipeline.CorpusExport
import org.apache.spark.sql.functions._

class CorpusExportSpec extends SparkSpec {

  test("export_manifest: shards partition the corpus exactly, deterministically") {
    val m = CorpusExport.exportManifest(spark, sfTiny).collect()
    val docs = Tables.documents(spark, sfTiny)
    val total = docs.count()
    assert(m.map(_.getAs[Int]("shard")).toSeq === (0 until 8),
      "every shard id present, ordered")
    assert(m.map(_.getAs[Long]("n_docs")).sum === total,
      "shard doc counts must sum to the corpus")
    assert(m.map(_.getAs[Long]("doc_checksum")).sum ===
      docs.agg(sum("doc_id")).head.getLong(0),
      "doc_id checksums must sum to the corpus checksum")
    // equal-width md5 buckets: no shard dominates (loose 3x bound at
    // 500 docs / 8 shards — catches a broken ladder, not sampling noise)
    val counts = m.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= 3 * counts.min.max(1),
      s"shard skew: ${counts.toSeq}")
    // pure function of doc_id: a second evaluation is identical
    assert(CorpusExport.exportManifest(spark, sfTiny).collect().toSeq ===
      m.toSeq)
  }

  test("exportShards: stable shard directories + manifest, rerun-identical") {
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString + "/corpus"
    val m1 = CorpusExport.exportShards(spark, sfTiny, out).collect()
    val back = spark.read.parquet(out)
    val docs = Tables.documents(spark, sfTiny)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count(),
      "each doc must land in exactly one shard")
    // partition pruning works on the shard layout: one shard's read
    // matches its manifest row
    val m0 = m1.find(_.getAs[Int]("shard") === 0).get
    assert(back.filter(col("shard") === 0).count() === m0.getAs[Long]("n_docs"))
    // the written manifest agrees with the returned one
    val written = spark.read.json(s"$out/_manifest")
      .select("shard", "n_docs", "n_tokens", "doc_checksum")
    assert(written.count() === 8)
    assert(written.agg(sum("n_docs")).head.getLong(0) === docs.count())
    // re-export overwrites to the identical state (resume/reproduce)
    val m2 = CorpusExport.exportShards(spark, sfTiny, out).collect()
    assert(m2.toSeq === m1.toSeq)
    assert(spark.read.parquet(out).agg(sum("doc_id")).head.getLong(0) ===
      docs.agg(sum("doc_id")).head.getLong(0))
  }

  test("exportShards: JSONL shards for data-loader consumption") {
    val out = java.nio.file.Files.createTempDirectory("graft_export_jsonl").toString + "/corpus"
    CorpusExport.exportShards(spark, sfTiny, out, numShards = 4, format = "json")
    val back = spark.read.json(out)
    assert(back.count() === Tables.documents(spark, sfTiny).count())
    assert(back.select("shard").distinct().count() === 4)
  }

  test("shard ladder beyond 4096: arithmetic form equals the flat threshold definition") {
    val docs = Tables.documents(spark, sfTiny)

    // (a) where both physical forms are defined they are the same
    // function — checked value-by-value on the whole fixture (64 is
    // the CASE form's cap; deeper when/otherwise chains overflow
    // Spark 4's column-node converter)
    val both = docs.select(col("doc_id"),
        CorpusExport.shardColLadder(64).as("ladder"),
        CorpusExport.shardColArith(64).as("arith"))
      .filter(col("ladder") =!= col("arith"))
    assert(both.count() === 0, "ladder and arithmetic forms diverge at n=64")

    // (b) 10k shards: the arithmetic form matches the LITERAL flat
    // definition (count of thresholds t_k = floor(k*2^32/n) at or below
    // the prefix), recomputed independently on the driver per doc
    val n = 10000
    val got = docs.select(col("doc_id"), CorpusExport.shardCol(n).as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (docId, shard) =>
      val hex = md.digest(s"shard:$docId".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      val u = java.lang.Long.parseLong(hex, 16)
      val flat = (1 until n).count(k => (k.toLong << 32) / n <= u)
      assert(shard === flat, s"doc $docId: arith=$shard flat=$flat")
    }
    // (c) shard ids cover [0, n) and stay in range
    assert(got.values.forall(s => s >= 0 && s < n))
  }

  test("export -> re-ingest loop: quarantining JSONL read surfaces a corrupt line") {
    import org.apache.spark.sql.types._
    val out = java.nio.file.Files.createTempDirectory("graft_export_rt").toString + "/corpus"
    CorpusExport.exportShards(spark, sfTiny, out, numShards = 2, format = "json")
    // a truncated upload landing in shard 0 as its own part file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/shard=0/part-zz-truncated.json"),
      "{\"doc_id\": 13, \"text\": \"unterminat")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = graft.sources.Jsonl
      .readQuarantining(spark, s"$out/shard=0", schema).cache()
    val bad = back.filter(col("_corrupt").isNotNull)
    assert(bad.count() === 1, "the corrupt line must surface, not vanish")
    val clean = back.filter(col("_corrupt").isNull).drop("_corrupt")
    val m = CorpusExport.exportManifest(spark, sfTiny, numShards = 2)
      .filter(col("shard") === 0).head()
    assert(clean.count() === m.getAs[Long]("n_docs"),
      "clean rows must match the shard manifest")
    assert(clean.agg(sum("doc_id")).head.getLong(0) ===
      m.getAs[Long]("doc_checksum"))
    back.unpersist()
  }
}
