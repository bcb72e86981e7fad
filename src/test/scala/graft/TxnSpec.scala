package graft

import graft.pipeline.ManifestTable

/** Writer-transaction versions — Delta's `txnAppId`/`txnVersion`
  * idempotent-writer options: versions are MONOTONE per app (a stale
  * or replayed batch skips), stricter than txnTag's exact-replay
  * match; the map rides checkpoints (vacuum-proof) and never rolls
  * back (the high-water philosophy).
  */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  test("monotone skip: at-or-below versions no-op, above lands; apps independent") {
    val path = java.nio.file.Files.createTempDirectory("graft_txn1")
      .toString + "/t"
    val v1 = ManifestTable.write(Seq(1L).toDF("id"), path,
      txn = Some(("etl", 1L)))
    assert(v1 === 1L)
    // exact replay and a STALE version both skip without committing
    assert(ManifestTable.append(Seq(2L).toDF("id"), path,
      txn = Some(("etl", 1L))) === 1L)
    assert(ManifestTable.append(Seq(2L).toDF("id"), path,
      txn = Some(("etl", 0L))) === 1L)
    assert(ManifestTable.currentVersion(spark, path) === Some(1L))
    // the next version lands; an unrelated app is independent
    assert(ManifestTable.append(Seq(2L).toDF("id"), path,
      txn = Some(("etl", 2L))) === 2L)
    assert(ManifestTable.append(Seq(3L).toDF("id"), path,
      txn = Some(("other", 1L))) === 3L)
    assert(ManifestTable.read(spark, path).as[Long].collect().toSet
      === Set(1L, 2L, 3L))
    // the resume point an idempotent writer reads before its next batch
    assert(ManifestTable.txnVersion(spark, path, "etl") === Some(2L))
    assert(ManifestTable.txnVersion(spark, path, "other") === Some(1L))
    assert(ManifestTable.txnVersion(spark, path, "absent") === None)
  }

  test("txn map survives vacuum via the checkpoint; restore never rolls it back") {
    val path = java.nio.file.Files.createTempDirectory("graft_txn2")
      .toString + "/t"
    ManifestTable.write(Seq(1L).toDF("id"), path, txn = Some(("j", 1L)))
    ManifestTable.append(Seq(2L).toDF("id"), path, txn = Some(("j", 2L)))
    ManifestTable.vacuum(spark, path, keep = 1)
    assert(ManifestTable.append(Seq(9L).toDF("id"), path,
      txn = Some(("j", 2L))) === 2L,
      "vacuum must not forget writer-transaction versions")
    // restore to v... the txn high water NEVER rolls back: a replay of
    // batch 2 after the rollback must still skip (double-landing the
    // batch would be the exact duplicate the option exists to prevent)
    val p2 = java.nio.file.Files.createTempDirectory("graft_txn3")
      .toString + "/t"
    ManifestTable.write(Seq(1L).toDF("id"), p2, txn = Some(("j", 1L)))
    ManifestTable.append(Seq(2L).toDF("id"), p2, txn = Some(("j", 2L)))
    ManifestTable.restore(spark, p2, 1L)
    assert(ManifestTable.append(Seq(2L).toDF("id"), p2,
      txn = Some(("j", 2L))) === 3L,
      "post-restore replay of batch 2 must skip (txns are monotone)")
    assert(ManifestTable.read(spark, p2).as[Long].collect().toSet
      === Set(1L))
  }

  test("format options: txnAppId/txnVersion on write/append; must arrive together") {
    val path = java.nio.file.Files.createTempDirectory("graft_txn4")
      .toString + "/t"
    graft.GraftSession.withSqlExtensions(spark) { s =>
      import s.implicits._
      Seq(1L).toDF("id").write.format("graft").mode("overwrite")
        .option("txnAppId", "job").option("txnVersion", "5").save(path)
      // a stale redeploy replays version 5 — silent no-op
      Seq(99L).toDF("id").write.format("graft").mode("append")
        .option("txnAppId", "job").option("txnVersion", "5").save(path)
      assert(ManifestTable.read(s, path).as[Long].collect().toSet
        === Set(1L))
      Seq(2L).toDF("id").write.format("graft").mode("append")
        .option("txnAppId", "job").option("txnVersion", "6").save(path)
      assert(ManifestTable.read(s, path).as[Long].collect().toSet
        === Set(1L, 2L))
      intercept[IllegalArgumentException] {
        Seq(3L).toDF("id").write.format("graft").mode("append")
          .option("txnAppId", "job").save(path)
      }
    }
  }
}
