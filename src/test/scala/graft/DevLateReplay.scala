package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: adversarial LATE-REPLAY measurement for the r19 SCD1
  * no-claim-pre-join removal (r19 verdict "What's wrong #2").
  *
  * Question: with the pre-join gone, mergeMultiKeyed's base-slice
  * prune derives its key bounds from the PRE-claim batch — does a
  * mostly-late replay widen the resolution scan materially vs (a) the
  * ideal post-claim bounds and (b) the r16 pre-join shape's cost (a
  * full 2-column dimension scan per batch)?
  *
  * Method: 40-file SCD1 dimension with range-tight key stats; one
  * 95%-late batch (late keys spread over the whole key range, fresh
  * keys confined to the lowest 2.5%); input bytes + records measured
  * via listener for (1) the late-heavy apply as-is — current shape,
  * (2) the same apply with late events pre-dropped — the ideal
  * post-claim bound, (3) a 2-column full-dimension scan — what the
  * r16 pre-join paid on EVERY batch regardless of lateness.
  *
  * Run: sbt "Test/runMain graft.DevLateReplay"
  */
object DevLateReplay {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val recs = new java.util.concurrent.atomic.AtomicLong(0)
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
          ()
        }
      }
    })
    def measured[A](label: String)(f: => A): A = {
      Thread.sleep(200); bytes.set(0); recs.set(0)
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"LATE $label%-34s wall=$s%6.2f s  input=${bytes.get() / 1e6}%9.2f MB  records=${recs.get()}%10d")
      r
    }

    val n = 400000L
    val root = java.nio.file.Files.createTempDirectory("graft_late").toString

    def freshDim(tag: String): String = {
      val p = s"$root/$tag"
      val dim = spark.range(n).select(col("id"),
          concat(lit("v"), col("id")).as("attr"))
        .repartitionByRange(40, col("id"))
      pipeline.ApplyChanges.initializeScd1(dim, p, seq0 = 10L,
        statsCols = Seq("id"))
      p
    }

    // one batch: 38k late events spread over the WHOLE key range
    // (seq 1 < stored 10 — every one is withheld by the clause gate),
    // 2k fresh updates confined to keys [0, 10000)
    val late = spark.range(38000).select(
      ((col("id") * 10L) % n).as("id"),
      lit("stale").as("attr"), lit(1L).as("seq"))
    val fresh = spark.range(2000).select(
      (col("id") * 5L).as("id"),
      concat(lit("new"), col("id")).as("attr"), lit(20L).as("seq"))
    val batch = late.unionByName(fresh)
    val batchFreshOnly = fresh

    // (1) current shape: pre-claim bounds span the whole key range
    val p1 = freshDim("d1")
    measured("replay-95pct-late (current)") {
      pipeline.ApplyChanges.applyScd1(spark, p1, "id", batch,
        sequenceBy = "seq")
    }
    // (2) ideal post-claim bounds: the same semantic apply with the
    // late events already gone — lower bound for any prune design
    val p2 = freshDim("d2")
    measured("same-apply, late pre-dropped (ideal)") {
      pipeline.ApplyChanges.applyScd1(spark, p2, "id", batchFreshOnly,
        sequenceBy = "seq")
    }
    // (3) what the r16 pre-join shape paid on EVERY batch: one
    // column-pruned (id, _seq) scan of the full dimension + the
    // narrow resolution (approximated by (2)'s apply)
    val p3 = freshDim("d3")
    measured("r16 pre-join cost model: 2-col full scan") {
      pipeline.ManifestTable.read(spark, p3)
        .select(col("id"), col("_seq"))
        .write.format("noop").mode("overwrite").save()
    }
    // (4) an all-fresh batch of the same size, full key range — the
    // NON-pathological case where the r19 shape strictly wins
    val p4 = freshDim("d4")
    val allFresh = spark.range(40000).select(
      ((col("id") * 10L) % n).as("id"),
      concat(lit("nf"), col("id")).as("attr"), lit(20L).as("seq"))
    measured("all-fresh full-range batch (current)") {
      pipeline.ApplyChanges.applyScd1(spark, p4, "id", allFresh,
        sequenceBy = "seq")
    }
    // (5) the r20 scale gate forced ON: conditional (key,_seq)
    // high-water pre-join drops late events before the resolution scan
    spark.conf.set("spark.graft.applyChanges.latePruneMinFiles", "1")
    val p5 = freshDim("d5")
    measured("replay-95pct-late (gated pre-join)") {
      pipeline.ApplyChanges.applyScd1(spark, p5, "id", batch,
        sequenceBy = "seq")
    }
    val p6 = freshDim("d6")
    measured("all-fresh full-range (gated pre-join)") {
      pipeline.ApplyChanges.applyScd1(spark, p6, "id", allFresh,
        sequenceBy = "seq")
    }
    spark.conf.unset("spark.graft.applyChanges.latePruneMinFiles")
    spark.stop()
  }
}
