package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DEEP CLONE (r14): files copied under the clone's own root via the
  * distributed copy job — the clone must survive anything that happens
  * to the source (vacuum, drop), unlike the shallow clone whose refs
  * pin the source's retention.
  */
class DeepCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def isExternal(rel: String): Boolean =
    rel.startsWith("/") || rel.matches("[a-zA-Z][a-zA-Z0-9+.-]*:/.*")

  private def liveRefs(path: String): Seq[String] = {
    val v = ManifestTable.currentVersion(spark, path).get
    val st = ManifestTable.resolveState(spark, path, v)
    st.files ++ st.dvFiles ++ st.bloomFiles ++ st.ndvFiles
  }

  private def rmrf(dir: String): Unit = {
    def walk(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(walk))
      f.delete(): Unit
    }
    walk(new java.io.File(dir))
  }

  test("deep clone: content equal, refs local, clone survives source DROP") {
    val root = tmp("graft_dc1")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ManifestTable.write(
      spark.range(0, 500).select(col("id"), (col("id") % 7).as("g")),
      src, statsCols = Seq("id"))
    ManifestTable.append(
      spark.range(500, 600).select(col("id"), (col("id") % 7).as("g")), src)
    assert(ManifestTable.cloneDeep(spark, src, dst) === 1L)
    assert(liveRefs(dst).nonEmpty && liveRefs(dst).forall(!isExternal(_)),
      "every deep-clone ref lives under the clone's own root")
    val srcSum = ManifestTable.read(spark, src).agg(sum("id")).head().getLong(0)
    assert(ManifestTable.read(spark, dst).agg(sum("id")).head().getLong(0)
      === srcSum)
    // the whole point: dropping the source cannot dangle the clone
    rmrf(src)
    assert(ManifestTable.read(spark, dst).count() === 600)
  }

  test("deep clone of a PARTITIONED table: k=v rel paths carry, partition pruning works") {
    val root = tmp("graft_dc2")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ManifestTable.write(
      spark.range(0, 300).select(col("id"), (col("id") % 3).as("p")),
      src, partitionCols = Seq("p"))
    ManifestTable.cloneDeep(spark, src, dst)
    assert(liveRefs(dst).forall(r => !isExternal(r) && r.contains("p=")),
      "partition segments survive in the local rel refs")
    rmrf(src)
    val one = ManifestTable.read(spark, dst).filter(col("p") === 1)
    assert(one.count() === 100)
    assert(ManifestTable.read(spark, dst).count() === 300)
  }

  test("deep clone LOCALIZES a shallow clone: external refs become ext-i local copies") {
    val root = tmp("graft_dc3")
    val src = s"$root/src"
    val mid = s"$root/shallow"
    val dst = s"$root/deep"
    ManifestTable.write(
      spark.range(0, 200).select(col("id"), (col("id") % 4).as("p")),
      src, partitionCols = Seq("p"))
    ManifestTable.cloneShallow(spark, src, mid)
    assert(liveRefs(mid).exists(isExternal), "shallow refs are external")
    ManifestTable.cloneDeep(spark, mid, dst)
    assert(liveRefs(dst).forall(!isExternal(_)))
    assert(liveRefs(dst).forall(_.contains("p=")),
      "k=v chain preserved inside the synthesized ext-<i> paths")
    rmrf(src); rmrf(mid)
    assert(ManifestTable.read(spark, dst).count() === 200)
    assert(ManifestTable.read(spark, dst).filter(col("p") === 2).count() === 50)
  }

  test("deep clone VERSION AS OF + metadata carry (properties, constraints, stats pruning)") {
    val root = tmp("graft_dc4")
    val src = s"$root/src"
    val dst = s"$root/dst"
    ManifestTable.write(spark.range(0, 100).toDF("id"), src,
      statsCols = Seq("id"))
    ManifestTable.setProperties(spark, src, Map("team" -> "core"))
    ManifestTable.addCheckConstraint(spark, src, "id_nonneg", "id >= 0")
    val vAtThree = ManifestTable.currentVersion(spark, src).get
    ManifestTable.append(spark.range(100, 150).toDF("id"), src)
    ManifestTable.cloneDeep(spark, src, dst, Some(vAtThree))
    assert(ManifestTable.read(spark, dst).count() === 100,
      "the pinned version's content, not the current one")
    assert(ManifestTable.tableProperties(spark, dst) === Map("team" -> "core"))
    val e = intercept[Exception] {
      ManifestTable.append(Seq(-5L).toDF("id"), dst)
    }
    assert(e.getMessage.contains("id_nonneg"), e.getMessage)
  }

  test("declared-partition metadata carries through both clone flavors (r14)") {
    val root = tmp("graft_dc6")
    val src = s"$root/src"
    // empty declared-partitioned table (the CREATE TABLE ...
    // PARTITIONED BY shape): the first write inherits the layout
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    ManifestTable.write(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      src, partitionColsDecl = Seq("p"))
    Seq("deep", "shal").foreach { kind =>
      val dst = s"$root/$kind"
      if (kind == "deep") ManifestTable.cloneDeep(spark, src, dst)
      else ManifestTable.cloneShallow(spark, src, dst)
      ManifestTable.write(
        Seq((1L, "a"), (2L, "b")).toDF("id", "p"), dst)
      assert(liveRefs(dst).nonEmpty && liveRefs(dst).forall(_.contains("p=")),
        s"$kind clone's first write inherits the declared partitioning")
    }
  }

  test("SQL: CREATE TABLE ... DEEP CLONE ... ; shallow verb unchanged") {
    val root = tmp("graft_dc5")
    val src = s"$root/src"
    ManifestTable.write(spark.range(0, 50).toDF("id"), src)
    val base = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = try SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    finally {
      SparkSession.setDefaultSession(base); SparkSession.setActiveSession(base)
    }
    SparkSession.setActiveSession(s)
    try {
      s.sql(s"CREATE TABLE '$root/deep' DEEP CLONE '$src'")
      s.sql(s"CREATE TABLE '$root/shal' SHALLOW CLONE '$src'")
      rmrf(src)
      assert(ManifestTable.read(s, s"$root/deep").count() === 50)
      val ex = intercept[Exception] {
        ManifestTable.read(s, s"$root/shal").count()
      }
      assert(ex != null, "shallow clone dangles once the source is gone")
    } finally SparkSession.setActiveSession(base)
  }
}
