package graft.streaming

import graft.SparkSpec
import graft.pipeline.ManifestTable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit, sum}

/** The synthesized state group key must be COLLISION-SAFE: a `|` in a
  * string key value or a NULL key component must never merge two
  * distinct groups (concat_ws would do both, silently).
  */
class StateKeySpec extends SparkSpec {

  private def mergeFn(cur: DataFrame, delta: DataFrame): DataFrame =
    cur.unionByName(delta).groupBy("k1", "k2").agg(sum("cnt").as("cnt"))

  test("state group keys survive '|' in values and NULL components") {
    import spark.implicits._
    val statePath =
      java.nio.file.Files.createTempDirectory("graft_gkey").toString + "/state"
    // three DISTINCT groups a separator-joined key would conflate:
    // ("a|b","x") and ("a","b|x") both concat_ws to "a|b|x"; the NULL
    // group would silently collapse onto ("y") spellings
    val d1 = Seq(
      (Option("a|b"), "x", 1L),
      (Option("a"), "b|x", 2L),
      (None: Option[String], "y", 4L)).toDF("k1", "k2", "cnt")
    TableFeedSource.commitStateDelta(spark, statePath, d1, mergeFn,
      lit(true), Seq("k1", "k2"), "b0")
    val s1 = ManifestTable.read(spark, statePath)
    assert(s1.count() === 3, "distinct groups must stay distinct")
    // small-state path (below stateMergeBytes): read-merge-write
    val d2 = Seq(
      (Option("a|b"), "x", 10L),
      (None: Option[String], "y", 40L)).toDF("k1", "k2", "cnt")
    TableFeedSource.commitStateDelta(spark, statePath, d2, mergeFn,
      lit(true), Seq("k1", "k2"), "b1")
    // keyed-merge path (stateMergeBytes=0 forces it)
    spark.conf.set("spark.graft.stateMergeBytes", "0")
    try {
      val d3 = Seq((Option("a"), "b|x", 20L)).toDF("k1", "k2", "cnt")
      TableFeedSource.commitStateDelta(spark, statePath, d3, mergeFn,
        lit(true), Seq("k1", "k2"), "b2")
    } finally spark.conf.unset("spark.graft.stateMergeBytes")
    val fin = ManifestTable.read(spark, statePath)
      .select("k1", "k2", "cnt").collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
      .toSet
    assert(fin === Set(
      (Option("a|b"), "x", 11L),
      (Option("a"), "b|x", 22L),
      (None, "y", 44L)), s"state rows wrong: $fin")
  }

  test("NULL key encodes distinct from empty string and from 'n;' text") {
    import spark.implicits._
    val statePath =
      java.nio.file.Files.createTempDirectory("graft_gkey2").toString + "/state"
    val d = Seq(
      (None: Option[String], 1L),
      (Option(""), 2L),
      (Option("n;"), 4L)).toDF("k1", "cnt")
    def m(cur: DataFrame, delta: DataFrame): DataFrame =
      cur.unionByName(delta).groupBy("k1").agg(sum("cnt").as("cnt"))
    TableFeedSource.commitStateDelta(spark, statePath, d, m,
      lit(true), Seq("k1"), "b0")
    TableFeedSource.commitStateDelta(spark, statePath, d, m,
      lit(true), Seq("k1"), "b1")
    val rows = ManifestTable.read(spark, statePath)
      .select("k1", "cnt").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(rows === Set((None, 2L), (Option(""), 4L), (Option("n;"), 8L)),
      s"NULL / '' / literal-sentinel groups must not merge: $rows")
  }
}
