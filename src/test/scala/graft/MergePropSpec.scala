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

  /** Round-15 extension (verdict item #6): the SAME clause algebra,
    * but every case also draws a random TABLE-FEATURE vector —
    * partitioning, column mapping, deletion vectors, row tracking,
    * column defaults, generated columns, and the large-source shuffle
    * regime. Cross-feature interactions are where the next bug class
    * lives; the reference model only has to know two facts: an
    * unassigned insert column takes the declared default, and a
    * generated column always equals its expression.
    */
  test("mergeMulti × random table-feature vectors agrees with the model over 28 cases") {
    val rnd = new scala.util.Random(1337)
    val root = java.nio.file.Files.createTempDirectory("graft_mfeat").toString
    var featureHits = Map.empty[String, Int].withDefaultValue(0)
    (0 until 28).foreach { case_i =>
      // --- features ---------------------------------------------------
      val partitioned = rnd.nextBoolean()
      val mapped      = rnd.nextBoolean()
      val rowTrack    = rnd.nextBoolean()
      val dv          = rnd.nextBoolean()
      val defaults    = rnd.nextBoolean()
      val generated   = rnd.nextBoolean()
      val shuffleGate = rnd.nextBoolean() // force the non-broadcast regime
      Seq("part" -> partitioned, "map" -> mapped, "rt" -> rowTrack,
        "dv" -> dv, "def" -> defaults, "gen" -> generated,
        "shuf" -> shuffleGate).foreach { case (n, on) =>
        if (on) featureHits += n -> (featureHits(n) + 1) }

      // --- data -------------------------------------------------------
      val baseIds = (0L until (8 + rnd.nextInt(16)).toLong)
      val base = baseIds.map(i => i -> rnd.nextInt(40).toLong).toMap
      val srcIds = (baseIds.filter(_ => rnd.nextBoolean()) ++
        (100L until (100L + rnd.nextInt(8)).toLong)).distinct
      val src = srcIds.map(i => i -> rnd.nextInt(40).toLong).toMap

      // --- clauses (same generator shape as the base test) -------------
      def genSide(n: Int, allowStarUpd: Boolean): Seq[MClause] =
        (0 until n).map { j =>
          val last = j == n - 1
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
        (k, rnd.nextBoolean())
      }
      val bySourceM = genSide(rnd.nextInt(3), allowStarUpd = false)
      if (matchedM.isEmpty && insertM.isEmpty && bySourceM.isEmpty) ()
      else {
        // --- reference model: id -> (v, w) ------------------------------
        val out = scala.collection.mutable.Map.empty[Long, (Long, Option[String])]
        base.foreach { case (id, bv) =>
          if (src.contains(id)) {
            val sv = src(id)
            matchedM.find(c => holds(c.k, sv)) match {
              case Some(MUpd(_, true))  => out(id) = (sv, Some(s"S$id"))
              case Some(MUpd(_, false)) => out(id) = (sv + 1000L, Some(s"B$id"))
              case Some(MDel(_))        => ()
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
              case (_, true)  => out(id) = (sv, Some(s"S$id"))
              case (_, false) =>
                // unassigned insert column: declared DEFAULT, else NULL
                out(id) = (sv, if (defaults) Some("DFLT") else None)
            }
        }

        // --- engine ------------------------------------------------------
        val matchedE: Seq[MergeMatched] = matchedM.map {
          case MUpd(k, true)  => MergeUpdate(colCond(k, "v"))
          case MUpd(k, false) => MergeUpdate(colCond(k, "v"),
            Seq("v" -> (col("v") + 1000L)))
          case MDel(k)        => MergeDelete(colCond(k, "v"))
        }
        // explicit insert assigns the partition column too (a NULL
        // partition value is a different, hostile case)
        val explicitInsCols: Seq[(String, org.apache.spark.sql.Column)] =
          Seq("id" -> col("id"), "v" -> col("v")) ++
            (if (partitioned) Seq("grp" -> col("grp")) else Nil)
        val insertE: Seq[MergeInsert] = insertM.map {
          case (k, true)  => MergeInsert(colCond(k, "v"))
          case (k, false) => MergeInsert(colCond(k, "v"), explicitInsCols)
        }
        val bySourceE: Seq[MergeMatched] = bySourceM.map {
          case MUpd(k, _) => MergeUpdate(colCond(k, "_b_v"),
            Seq("v" -> (col("_b_v") - 500L)))
          case MDel(k)    => MergeDelete(colCond(k, "_b_v"))
        }

        def frame(rows: Map[Long, Long], tag: String) = {
          var df = rows.toSeq.map { case (i, v) => (i, v, s"$tag$i") }
            .toDF("id", "v", if (mapped) "w0" else "w")
          if (mapped) df = df.withColumnRenamed("w0", "w") // source stays logical
          if (partitioned) df = df.withColumn("grp", pmod(col("id"), lit(3L)))
          if (generated) df = df.withColumn("g", col("id") * 2L)
          df
        }
        val path = s"$root/c$case_i"
        if (rowTrack) ManifestTable.enableRowTracking(spark, path)
        // the TABLE writes under the physical name w0 when mapped,
        // then renames to the logical w (enables column mapping)
        var baseDf = base.toSeq.map { case (i, v) => (i, v, s"B$i") }
          .toDF("id", "v", if (mapped) "w0" else "w")
        if (partitioned)
          baseDf = baseDf.withColumn("grp", pmod(col("id"), lit(3L)))
        if (generated) baseDf = baseDf.withColumn("g", col("id") * 2L)
        ManifestTable.write(baseDf, path,
          partitionCols = if (partitioned) Seq("grp") else Nil,
          statsCols = Seq("id"))
        if (mapped) ManifestTable.renameColumn(spark, path, "w0", "w"): Unit
        if (defaults)
          ManifestTable.setColumnDefault(spark, path, "w", "'DFLT'"): Unit
        if (generated)
          ManifestTable.addGeneratedColumn(spark, path, "g", "id * 2"): Unit
        val srcDf = frame(src, "S")

        if (shuffleGate) spark.conf.set("spark.graft.mergeBroadcastRows", "0")
        try ManifestTable.mergeMulti(srcDf, path, "id",
          matchedE, insertE, notMatchedBySource = bySourceE,
          deleteVectors = dv): Unit
        finally if (shuffleGate)
          spark.conf.unset("spark.graft.mergeBroadcastRows")

        val want = out.toSeq.sortBy(_._1)
          .map { case (id, (v, w)) => (id, v, w) }
        val got = ManifestTable.read(spark, path)
          .select("id", "v", "w").as[(Long, Long, Option[String])]
          .collect().sortBy(_._1).toSeq
        val features = s"part=$partitioned map=$mapped rt=$rowTrack " +
          s"dv=$dv def=$defaults gen=$generated shuf=$shuffleGate"
        assert(got === want,
          s"case $case_i [$features] matched=$matchedM insert=$insertM " +
            s"bySource=$bySourceM\nbase=$base\nsrc=$src")
        // feature-specific invariants ride the same case
        if (partitioned) {
          val badGrp = ManifestTable.read(spark, path)
            .filter(col("grp") =!= pmod(col("id"), lit(3L))).count()
          assert(badGrp === 0L, s"case $case_i [$features] grp drifted")
        }
        if (generated) {
          val badG = ManifestTable.read(spark, path)
            .filter(col("g") =!= col("id") * 2L).count()
          assert(badG === 0L, s"case $case_i [$features] generated g drifted")
        }
        if (rowTrack) {
          val idsDf = ManifestTable.readWithRowIds(spark, path)
            .select(col(ManifestTable.RowIdCol)).as[Long].collect()
          assert(idsDf.length === idsDf.distinct.length,
            s"case $case_i [$features] duplicate row ids")
        }
      }
    }
    // the vector draw must actually exercise every feature somewhere
    Seq("part", "map", "rt", "dv", "def", "gen", "shuf").foreach(f =>
      assert(featureHits(f) >= 5, s"feature $f drawn ${featureHits(f)} times"))
  }
}
