package graft

import graft.pipeline.ManifestTable
import graft.pipeline.ManifestTable.{MergeDelete, MergeInsert, MergeMatched, MergeUpdate}
import org.apache.spark.sql.functions._

/** Randomized model check for the multi-clause MERGE: a plain-Scala
  * reference implementation evaluates the same clause lists over the
  * same rows (first-clause-wins, NULL-condition-reads-false, star vs
  * explicit images, unassigned-insert-NULL), and every generated case
  * must agree row-for-row with [[ManifestTable.mergeMulti]]. Cases
  * with BY SOURCE clauses run under BOTH resolution strategies
  * (broadcast anti / fused full-outer) — the gate is part of the
  * search space, not just the dedicated parity test's fixed point.
  *
  * The third column `w` tags image PROVENANCE: base rows carry B<id>,
  * source rows S<id>, so a star update that must take the whole
  * source row, an explicit update that must keep the target's
  * untouched columns, and an explicit insert that must NULL-fill are
  * all distinguishable in the output, not just v's arithmetic.
  *
  * Deterministic seed: failures reproduce and print the full case.
  */
class MergePropSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait MClause { def k: Option[Int] }
  private case class MUpd(k: Option[Int], star: Boolean) extends MClause
  private case class MDel(k: Option[Int]) extends MClause

  // clause condition: v % 3 === k over the side the clause may read
  private def colCond(k: Option[Int], c: String): Option[
      org.apache.spark.sql.Column] =
    k.map(kk => pmod(col(c), lit(3L)) === kk.toLong)

  private def holds(k: Option[Int], v: Long): Boolean =
    k.forall(kk => Math.floorMod(v, 3L) == kk.toLong)

  test("mergeMulti agrees with the reference model over 24 random clause/table cases") {
    val rnd = new scala.util.Random(421)
    val root = java.nio.file.Files.createTempDirectory("graft_mprop").toString
    (0 until 24).foreach { case_i =>
      // --- generate a case ------------------------------------------
      val baseIds = (0L until (8 + rnd.nextInt(16)).toLong)
      val base = baseIds.map(i => i -> rnd.nextInt(40).toLong).toMap
      val srcIds = (baseIds.filter(_ => rnd.nextBoolean()) ++
        (100L until (100L + rnd.nextInt(8)).toLong)).distinct
      val src = srcIds.map(i => i -> rnd.nextInt(40).toLong).toMap

      def genSide(n: Int, allowStarUpd: Boolean): Seq[MClause] =
        (0 until n).map { j =>
          val last = j == n - 1
          // reachability: only the LAST clause may be unconditional
          val k = if (last && rnd.nextBoolean()) None else Some(rnd.nextInt(3))
          if (rnd.nextBoolean())
            MUpd(k, star = allowStarUpd && rnd.nextBoolean())
          else MDel(k)
        }
      val matchedM = genSide(rnd.nextInt(3), allowStarUpd = true)
      val nInsert = rnd.nextInt(3)
      val insertM = (0 until nInsert).map { j =>
        val last = j == nInsert - 1
        val k = if (last && rnd.nextBoolean()) None else Some(rnd.nextInt(3))
        (k, rnd.nextBoolean()) // (condition, star?)
      }
      val bySourceM = genSide(rnd.nextInt(3), allowStarUpd = false)
      if (matchedM.nonEmpty || insertM.nonEmpty || bySourceM.nonEmpty) {
        // --- reference model: id -> (v, w) --------------------------
        val out = scala.collection.mutable.Map.empty[Long, (Long, Option[String])]
        base.foreach { case (id, bv) =>
          if (src.contains(id)) {
            val sv = src(id)
            matchedM.find(c => holds(c.k, sv)) match {
              case Some(MUpd(_, true))  => out(id) = (sv, Some(s"S$id"))
              case Some(MUpd(_, false)) => out(id) = (sv + 1000L, Some(s"B$id"))
              case Some(MDel(_))        => () // deleted
              case None                 => out(id) = (bv, Some(s"B$id"))
            }
          } else {
            bySourceM.find(c => holds(c.k, bv)) match {
              case Some(MUpd(_, _)) => out(id) = (bv - 500L, Some(s"B$id"))
              case Some(MDel(_))    => ()
              case None             => out(id) = (bv, Some(s"B$id"))
            }
          }
        }
        src.foreach { case (id, sv) =>
          if (!base.contains(id))
            insertM.find(c => holds(c._1, sv)).foreach {
              case (_, true)  => out(id) = (sv, Some(s"S$id")) // INSERT *
              case (_, false) => out(id) = (sv, None)          // w NULL-fills
            }
        }
        // --- engine -------------------------------------------------
        val matchedE: Seq[MergeMatched] = matchedM.map {
          case MUpd(k, true)  => MergeUpdate(colCond(k, "v"))
          case MUpd(k, false) => MergeUpdate(colCond(k, "v"),
            Seq("v" -> (col("v") + 1000L)))
          case MDel(k)        => MergeDelete(colCond(k, "v"))
        }
        val insertE: Seq[MergeInsert] = insertM.map {
          case (k, true)  => MergeInsert(colCond(k, "v"))
          case (k, false) => MergeInsert(colCond(k, "v"),
            Seq("id" -> col("id"), "v" -> col("v"))) // w unassigned
        }
        val bySourceE: Seq[MergeMatched] = bySourceM.map {
          case MUpd(k, _) => MergeUpdate(colCond(k, "_b_v"),
            Seq("v" -> (col("_b_v") - 500L)))
          case MDel(k)    => MergeDelete(colCond(k, "_b_v"))
        }
        val baseDf = base.toSeq.map { case (i, v) => (i, v, s"B$i") }
          .toDF("id", "v", "w")
        val srcDf = src.toSeq.map { case (i, v) => (i, v, s"S$i") }
          .toDF("id", "v", "w")
        val want = out.toSeq.sortBy(_._1)
          .map { case (id, (v, w)) => (id, v, w) }
        val gates = if (bySourceE.isEmpty) Seq("default")
          else Seq("0", "1000000")
        gates.foreach { gate =>
          val path = s"$root/c${case_i}_$gate"
          ManifestTable.write(baseDf, path)
          if (gate != "default")
            spark.conf.set("spark.graft.bySourceBroadcastRows", gate)
          try ManifestTable.mergeMulti(srcDf, path, "id",
            matchedE, insertE, notMatchedBySource = bySourceE): Unit
          finally if (gate != "default")
            spark.conf.unset("spark.graft.bySourceBroadcastRows")
          val got = ManifestTable.read(spark, path)
            .select("id", "v", "w").as[(Long, Long, Option[String])]
            .collect().sortBy(_._1).toSeq
          assert(got === want,
            s"case $case_i gate=$gate matched=$matchedM insert=$insertM " +
              s"bySource=$bySourceM\nbase=$base\nsrc=$src")
        }
      }
    }
  }
}
