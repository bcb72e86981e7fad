package graft

import graft.ops.{Aggregates, Curate, Similarity, Star, TimeSeries}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Planted-data gates for the round-4 late additions: span_scrub,
  * funnel_conversion, cohort_retention, embedding_quantize, gap_fill.
  */
class NewOpsR4Spec extends SparkSpec {
  import spark.implicits._

  private def seg(prefix: String): String =
    (1 to 8).map(i => s"$prefix$i").mkString(" ")

  test("spanScrub removes later occurrences of duplicated segments only") {
    val docs = Seq(
      (1L, s"${seg("a")} ${seg("b")}"),          // both first occurrences
      (2L, s"${seg("a")} ${seg("c")} x y z"),    // seg a duplicated from doc 1
      (3L, "short text only"),                   // under one segment
      (4L, s"${seg("d")} ${seg("d")}")           // in-doc duplicate
    ).toDF("doc_id", "text")
    val out = Curate.spanScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 2L, s"${seg("a")} ${seg("b")}")))
    assert(out(2L) == ((2L, 1L, s"${seg("c")} x y z")))
    assert(out(3L) == ((0L, 0L, "short text only")))
    assert(out(4L) == ((2L, 1L, seg("d"))))
  }

  test("spanScrub is partition-invariant on the fixture corpus") {
    val docs = Tables.documents(spark, sfTiny)
    val a = Curate.spanScrub(docs.repartition(2)).collect().toSeq
    val b = Curate.spanScrub(docs.repartition(7)).collect().toSeq
    assert(a == b && a.nonEmpty)
    // scrubbing never grows a document and keeps every singleton corpus
    a.foreach { r => assert(r.getLong(2) <= r.getLong(1)) }
    // conservation: total segments = Σ floor(len/8), and exactly ONE
    // copy of every distinct segment survives the scrub
    val toks = split(col("text"), " ")
    val segExpr = when(size(toks) >= 8,
      transform(sequence(lit(0), floor(size(toks) / 8).cast("int") - 1),
        k => concat_ws(" ", slice(toks, k * 8 + 1, lit(8)))))
    val segs = docs.select(explode_outer(segExpr).as("s"))
      .filter(col("s").isNotNull)
    assert(a.map(_.getLong(1)).sum === segs.count())
    assert(a.map(_.getLong(2)).sum === segs.distinct().count())
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnelPerUser enforces stage order view -> click -> purchase") {
    val ev = Seq(
      // u1: full funnel in order
      (1L, 10L, ts("2025-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2025-01-01 10:05:00"), "click"),
      (1L, 12L, ts("2025-01-01 10:10:00"), "purchase"),
      // u2: click precedes the first view -> no qualifying click
      (2L, 20L, ts("2025-01-01 09:00:00"), "click"),
      (2L, 21L, ts("2025-01-01 09:30:00"), "view"),
      (2L, 22L, ts("2025-01-01 09:45:00"), "purchase"),
      // u3: purchase between view and click -> no qualifying purchase
      (3L, 30L, ts("2025-01-01 08:00:00"), "view"),
      (3L, 31L, ts("2025-01-01 08:10:00"), "purchase"),
      (3L, 32L, ts("2025-01-01 08:20:00"), "click"),
      // u4: purchase only
      (4L, 40L, ts("2025-01-01 07:00:00"), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val rows = Star.funnelPerUser(ev).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows(1L)._1.isDefined && rows(1L)._2.isDefined && rows(1L)._3.isDefined)
    assert(rows(2L)._1.isDefined && rows(2L)._2.isEmpty && rows(2L)._3.isEmpty)
    assert(rows(3L)._1.isDefined && rows(3L)._2.isDefined && rows(3L)._3.isEmpty)
    assert(rows(4L)._1.isEmpty && rows(4L)._2.isEmpty && rows(4L)._3.isEmpty)
  }

  test("cohortRetentionOf builds the retention triangle") {
    val orders = Seq(
      (1L, ts("2025-01-05 00:00:00")), (1L, ts("2025-02-10 00:00:00")),
      (1L, ts("2025-04-01 00:00:00")),
      (2L, ts("2025-01-20 00:00:00")),
      (3L, ts("2025-02-03 00:00:00")), (3L, ts("2025-04-15 00:00:00"))
    ).toDF("o_custkey", "o_orderdate")
    val got = Aggregates.cohortRetentionOf(orders).collect()
      .map(r => (r.getTimestamp(0).toString.take(7), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("2025-01", 0, 2L, 2L, 1.0), ("2025-01", 1, 1L, 2L, 0.5),
      ("2025-01", 3, 1L, 2L, 0.5),
      ("2025-02", 0, 1L, 1L, 1.0), ("2025-02", 2, 1L, 1L, 1.0)))
  }

  test("quantizeInt8 maps each dimension to [0,255]; constant dims to 0") {
    val emb = Seq(
      (1L, Seq(0f, 10f), 0), (2L, Seq(5f, 10f), 0), (3L, Seq(10f, 10f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.quantizeInt8(emb).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // dim0 calibrates to [0,10] -> codes 0 / floor(127.5)=127 / 255; dim1 constant -> 0
    assert(got.toSeq == Seq(
      (1L, 2, 0L, 0L, 0L), (2L, 2, 127L, 0L, 127L), (3L, 2, 255L, 0L, 255L)))
  }

  test("quantizeInt8 is partition-invariant and bounded on fixture vectors") {
    val emb = Tables.embeddings(spark, sfTiny)
    val a = Similarity.quantizeInt8(emb.repartition(2)).collect().toSeq
    assert(a == Similarity.quantizeInt8(emb.repartition(5)).collect().toSeq)
    a.foreach { r =>
      assert(r.getInt(2) == 64)
      assert(r.getLong(4) >= 0L && r.getLong(5) <= 255L)
    }
  }

  test("vocabOovOf scores docs against the deterministic top-V vocabulary") {
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "b z q")
    ).toDF("doc_id", "text")
    // counts: a=3, b=2, c=z=q=1 → top-2 vocab {a, b}
    val got = graft.ops.Text.vocabOovOf(docs, vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0.0), (2L, 2L, 1L, 0.5), (3L, 3L, 2L, 2.0 / 3)))
  }

  test("vocabOov is partition-invariant; vocabulary ties break on token text") {
    val docs = Tables.documents(spark, sfTiny)
    val a = graft.ops.Text.vocabOovOf(docs.repartition(2)).collect().toSeq
    assert(a == graft.ops.Text.vocabOovOf(docs.repartition(7)).collect().toSeq)
    assert(a.nonEmpty)
  }

  test("supplierProfit line counts reconcile with an independent plain join") {
    val got = graft.ops.Star.supplierProfit(spark, sfTiny)
    val lines = got.agg(sum("lines")).collect()(0).getLong(0)
    val expected = Tables.lineitem(spark, sfTiny)
      .join(Tables.part(spark, sfTiny).filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfTiny), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(lines === expected && lines > 0)
    // every (nation, year) row carries a finite profit
    got.collect().foreach(r => assert(!r.getDouble(2).isNaN))
  }

  test("orderEventReconcile partitions keys into both/orders_only/events_only exactly") {
    val got = graft.ops.Star.orderEventReconcile(spark, sfTiny).collect()
    val byPresence = got.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    val orderKeys = Tables.orders(spark, sfTiny)
      .select("o_custkey").distinct().count()
    val eventKeys = Tables.events(spark, sfTiny)
      .select("user_id").distinct().count()
    assert(byPresence.getOrElse("both", 0) + byPresence.getOrElse("orders_only", 0)
      === orderKeys)
    assert(byPresence.getOrElse("both", 0) + byPresence.getOrElse("events_only", 0)
      === eventKeys)
    // counts reconcile to the source totals
    assert(got.map(_.getLong(1)).sum === Tables.orders(spark, sfTiny).count())
    assert(got.map(_.getLong(2)).sum === Tables.events(spark, sfTiny).count())
  }

  test("gapFillDaily zero-fills gaps and carries the last average forward") {
    val ev = Seq(
      ("A", ts("2025-03-01 05:00:00"), 1.0), ("A", ts("2025-03-01 06:00:00"), 3.0),
      ("A", ts("2025-03-03 05:00:00"), 5.0),
      ("B", ts("2025-03-02 09:00:00"), 7.0)
    ).toDF("event_type", "ts", "value")
    val got = TimeSeries.gapFillDaily(ev).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getLong(2), r.getDouble(3), r.getBoolean(4), Option(r.get(5))))
    assert(got.toSeq == Seq(
      ("A", "2025-03-01", 2L, 4.0, false, Some(2.0)),
      ("A", "2025-03-02", 0L, 0.0, true, Some(2.0)),   // filled, avg carried
      ("A", "2025-03-03", 1L, 5.0, false, Some(5.0)),
      ("B", "2025-03-01", 0L, 0.0, true, None),        // before B's first obs
      ("B", "2025-03-02", 1L, 7.0, false, Some(7.0)),
      ("B", "2025-03-03", 0L, 0.0, true, Some(7.0))))
  }
}
