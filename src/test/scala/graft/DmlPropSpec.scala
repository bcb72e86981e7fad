package graft

import graft.pipeline.ManifestTable
import org.apache.spark.sql.functions._

/** Randomized model check for the keyless DML verbs: random sequences
  * of UPDATE WHERE / DELETE WHERE / append / replaceWhere over a small
  * table must agree row-for-row with a plain-Scala fold of the same
  * operations — including the SQL old-row semantics (`SET a = b,
  * b = a` swaps: every RHS reads the pre-update row) and the
  * replaceWhere contract (slice replaced, complement carried).
  * Deterministic seed; failures print the op trace.
  */
class DmlPropSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class Upd(k: Int) extends Op        // v%3==k: v=v+b, b=v
  private case class Del(k: Int) extends Op        // delete v%3==k
  private case class App(n: Int, seed: Int) extends Op
  private case class Repl(k: Int, seed: Int) extends Op // replace v%3==k slice

  test("updateWhere/deleteWhere/append/overwriteWhere agree with the model over 12 random op sequences") {
    val rnd = new scala.util.Random(887)
    val root = java.nio.file.Files.createTempDirectory("graft_dmlprop").toString
    (0 until 12).foreach { case_i =>
      val path = s"$root/t$case_i"
      var nextId = 0L
      def fresh(n: Int, seed: Int): Seq[(Long, Long, Long)] = {
        val r2 = new scala.util.Random(seed)
        (0 until n).map { _ =>
          val row = (nextId, r2.nextInt(30).toLong, r2.nextInt(30).toLong)
          nextId += 1
          row
        }
      }
      // model state: id -> (v, b)
      val model = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      val init = fresh(6 + rnd.nextInt(10), rnd.nextInt())
      init.foreach { case (i, v, b) => model(i) = (v, b) }
      ManifestTable.write(init.toDF("id", "v", "b"), path,
        statsCols = Seq("id", "v"))
      val ops = (0 until 4 + rnd.nextInt(4)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => Upd(rnd.nextInt(3))
          case 1 => Del(rnd.nextInt(3))
          case 2 => App(1 + rnd.nextInt(5), rnd.nextInt())
          case _ => Repl(rnd.nextInt(3), rnd.nextInt())
        }
      }
      ops.foreach {
        case Upd(k) =>
          // engine: both RHS read the OLD row (SQL semantics)
          ManifestTable.updateWhere(spark, path,
            Seq("v" -> (col("v") + col("b")), "b" -> col("v")),
            pmod(col("v"), lit(3L)) === k.toLong): Unit
          model.keys.toSeq.foreach { id =>
            val (v, b) = model(id)
            if (Math.floorMod(v, 3L) == k.toLong) model(id) = (v + b, v)
          }
        case Del(k) =>
          ManifestTable.deleteWhere(spark, path,
            pmod(col("v"), lit(3L)) === k.toLong): Unit
          model.keys.toSeq.foreach { id =>
            if (Math.floorMod(model(id)._1, 3L) == k.toLong)
              model.remove(id): Unit
          }
        case App(n, seed) =>
          val rows = fresh(n, seed)
          ManifestTable.append(rows.toDF("id", "v", "b"), path): Unit
          rows.foreach { case (i, v, b) => model(i) = (v, b) }
        case Repl(k, seed) =>
          val rows = fresh(2 + new scala.util.Random(seed).nextInt(3), seed)
            // the replacement slice must itself satisfy the predicate
            .map { case (i, v, b) => (i, v - Math.floorMod(v, 3L) + k, b) }
          ManifestTable.overwriteWhere(rows.toDF("id", "v", "b"), path,
            pmod(col("v"), lit(3L)) === k.toLong): Unit
          model.keys.toSeq.foreach { id =>
            if (Math.floorMod(model(id)._1, 3L) == k.toLong)
              model.remove(id): Unit
          }
          rows.foreach { case (i, v, b) => model(i) = (v, b) }
      }
      val got = ManifestTable.read(spark, path)
        .select("id", "v", "b").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = model.toSeq.map { case (i, (v, b)) => (i, v, b) }
        .sortBy(_._1)
      assert(got === want, s"case $case_i ops=$ops init=$init")
    }
  }
}
