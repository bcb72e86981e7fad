package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions makes native functions callable from pure SQL") {
    // force the shared context to exist first, then build an extended
    // session on the same SparkContext (getOrCreate would return the
    // shared session, bypassing extensions)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended =
      try SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }

    val r = extended.sql(
      """SELECT graft_simhash64('the quick brown fox') AS sh,
                graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
                graft_hyperplane_sig(array(0.5d, -0.5d), 4, 0) AS hp,
                graft_zorder(3, 5) AS zk,
                graft_zorder(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS zk_big""").head
    assert(r.getDouble(1) === 1.0)
    assert(r.getLong(3) ===
      graft.functions.ZOrderKey(
        org.apache.spark.sql.catalyst.expressions.Literal(3),
        org.apache.spark.sql.catalyst.expressions.Literal(5))
        .eval(null).asInstanceOf[Long])
    // BIGINT args coerce like the Column facade (previously interpreted
    // eval threw ClassCastException while codegen truncated — divergent)
    assert(r.getLong(4) === r.getLong(3))
    // cross-check against the Column-API entry points on the base session
    import org.apache.spark.sql.functions._
    import base.implicits._
    val viaApi = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.GraftFunctions.simhash64(base, col("t"))).head.getLong(0)
    assert(r.getLong(0) === viaApi)

    // round-5 additions: shingle hashes, nearest centroid, and the
    // Misra–Gries aggregate — the full native surface from pure SQL
    val r2 = extended.sql(
      """SELECT sort_array(graft_shingle_hashes('a b c d', 3)) AS sh,
                graft_nearest_centroid(array(0.9d, 0.1d), 2,
                  array(0.0d, 0.0d, 1.0d, 0.0d)) AS nc""").head
    assert(r2.getSeq[Long](0).length === 2)
    assert(r2.getInt(1) === 1)
    val hh = extended.sql(
      """SELECT graft_heavy_hitters(x, 2, 16) AS top
         FROM VALUES ('a'),('a'),('a'),('b'),('b'),('c') AS t(x)""").head
    val top = hh.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getString(0) === "a" && top.head.getLong(1) === 3L)

    // round-9 addition: the log-bin quantile sketch aggregate — both
    // the DECIMAL (0.01) and DOUBLE (0.01d) alpha spellings must bind
    val dd = extended.sql(
      """SELECT graft_dd_sketch(x, 0.01, 2048) AS sk,
                graft_dd_sketch(x, 0.01d, 2048) AS sk2
         FROM VALUES (1.0d),(10.0d),(100.0d),(100.0d) AS t(x)""").head
    val cells = dd.getSeq[org.apache.spark.sql.Row](0)
    assert(cells.map(_.getLong(1)).sum === 4L, "sketch must count every row")
    assert(dd.getSeq[org.apache.spark.sql.Row](1) === cells,
      "decimal and double alpha literals must build the same sketch")
    SparkSession.setActiveSession(base)
  }
}
