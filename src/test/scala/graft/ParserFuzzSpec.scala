package graft

import graft.plans._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Generative fuzz over the graft SQL verb grammar (round-15 verdict
  * item #3): the regex dialect has survived rounds of hand-found
  * edge cases (aliases named `target`, columns named `matched`,
  * props-parens ambiguity) — this spec converts that bug class into
  * seeded property checks. Invariants, per generated statement:
  *
  *  1. a graft-shaped statement NEVER silently delegates to Spark's
  *     parser (parse ≡ Some(command) or a loud refusal);
  *  2. the dispatched command carries exactly the intended structure
  *     (path, keys, clause kinds in order, rewritten conditions);
  *  3. hazard content — reserved words as identifiers, clause-head
  *     text inside string literals, ON/JOIN inside USING subqueries,
  *     random case and whitespace — never corrupts the split.
  *
  * Pure string → LogicalPlan: no SparkSession, so the 240+ cases run
  * in milliseconds.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private def parse(sql: String) =
    GraftSqlStatements.parse(GraftSqlStatements.rewriteNames(sql))

  /** Random keyword casing (the grammar is (?i)). */
  private def kc(r: Random, s: String): String =
    s.map(c => if (r.nextBoolean()) c.toUpper else c.toLower)

  /** Random inter-token whitespace. */
  private def ws(r: Random): String =
    Seq(" ", "  ", "\n", " \n ", "\t ", "\n\t")(r.nextInt(6))

  // identifier pool: hazard words (reserved-ish) + normal names
  private val hazardIds =
    Seq("matched", "when", "using", "source", "default", "merge", "delete")
  private val normalIds = Seq("v", "w", "amount", "ver", "grp", "flag")
  private val keyPool = Seq("k", "id", "k2", "code")

  // ---------------------------------------------------------------
  // MERGE structural fuzz
  // ---------------------------------------------------------------

  private case class Expect(keys: Seq[String], residual: Option[String],
                            matched: Seq[(String, Option[String])],
                            inserts: Seq[Option[String]],
                            bySource: Seq[(String, Option[String])],
                            evo: Boolean)

  /** One random well-formed MERGE; returns (sql, expectation). */
  private def genMerge(r: Random, hazard: Boolean): (String, Expect) = {
    val path = Seq("/tmp/fz/a", "/tmp/fz/b b", "/tmp/fz/c-1.2")(r.nextInt(3))
    val tAlias = Seq(None, Some("t"), Some("tgt"), Some("trg"))(r.nextInt(4))
    // a source aliased `target` turns the target. convenience OFF —
    // only generate it alongside a declared target alias
    val sAlias = Seq(None, Some("s"), Some("src"),
      if (tAlias.isDefined) Some("target") else Some("s"))(r.nextInt(4))
    val tq = tAlias.getOrElse(
      if (sAlias.contains("target")) "" else "target")
    def tref(c: String): String = if (tq.isEmpty) s"_b_$c" else s"$tq.$c"
    def trefExpected(c: String): String = s"_b_$c"
    val sq = sAlias.map(_ + ".").getOrElse("")
    val evo = !hazard && r.nextInt(8) == 0

    val keys = r.shuffle(keyPool).take(1 + r.nextInt(3)).sorted
    val onTerms = keys.map { k =>
      r.nextInt(3) match {
        case 0 => k
        case 1 => s"${tAlias.getOrElse("t")}.$k = ${sAlias.getOrElse("s")}.$k"
        case _ => s"$k = $k"
      }
    }
    val residual =
      if (evo || r.nextInt(3) != 0) None
      else Some(s"${if (tq.isEmpty) "_b_ver" else s"$tq.ver"} < 100")
    val residualExpected = residual.map(_ => "(_b_ver < 100)")
    val on = (r.shuffle(onTerms) ++ residual.toSeq)
      .mkString(s"${ws(r)}${kc(r, "AND")}${ws(r)}")

    val hazardLit = "'WHEN MATCHED THEN DELETE'"
    def cond(i: Int): String =
      if (hazard && r.nextBoolean()) s"${pickId(r)} = $hazardLit"
      else if (r.nextBoolean()) s"${tref(pickId(r))} > $i"
      else s"$sq${pickId(r)} = $i"
    def condExpected(c: String): String = {
      // mirror rewriteRefs: word-bounded alias rewriting (a source
      // aliased `target` must not be chewed by a target alias `t`)
      val t = if (tq.nonEmpty)
        c.replaceAll(
          s"(?i)\\b${java.util.regex.Pattern.quote(tq)}\\.", "_b_")
      else c
      sAlias.map(a => t.replaceAll(
          s"(?i)\\b${java.util.regex.Pattern.quote(a)}\\.", ""))
        .getOrElse(t)
    }
    def pickId(rr: Random): String =
      (hazardIds ++ normalIds)(rr.nextInt(hazardIds.size + normalIds.size))

    // matched clauses: 0-3, conditions on all but (maybe) the last
    val nM = r.nextInt(4)
    val matched = (1 to nM).map { i =>
      val kind = if (r.nextBoolean()) "UPDATE" else "DELETE"
      val c = if (i < nM || r.nextBoolean()) Some(cond(i)) else None
      (kind, c)
    }
    val nI = r.nextInt(3)
    val inserts = (1 to nI).map { i =>
      if (i < nI || r.nextBoolean()) Some(cond(10 + i)) else None
    }
    val nBs = if (evo) 0 else r.nextInt(3)
    val bySource = (1 to nBs).map { i =>
      val kind = if (r.nextBoolean()) "UPDATE" else "DELETE"
      val c = if (i < nBs || r.nextBoolean())
        Some(s"${tref("ver")} > ${20 + i}") else None
      (kind, c)
    }
    if (matched.isEmpty && inserts.isEmpty && bySource.isEmpty)
      return genMerge(r, hazard) // at least one clause required

    def updPayload(): String =
      if (evo || r.nextBoolean()) s"${kc(r, "UPDATE SET")} *"
      else s"${kc(r, "UPDATE SET")} v = ${tref("v")} + 1," +
        s"${ws(r)}w = ${if (hazard) hazardLit else "'x'"}"
    def insPayload(): String =
      if (evo || r.nextBoolean()) kc(r, "INSERT *")
      else s"${kc(r, "INSERT")}${ws(r)}(${keys.head}, v)${ws(r)}" +
        s"${kc(r, "VALUES")}${ws(r)}(1, ${if (hazard) hazardLit else "2"})"
    def bsPayload(): String =
      s"${kc(r, "UPDATE SET")} w = 'stale'"

    val clauseTexts =
      matched.map { case (kind, c) =>
        s"${kc(r, "WHEN MATCHED")}" +
          c.map(x => s"${ws(r)}${kc(r, "AND")} $x").getOrElse("") +
          s"${ws(r)}${kc(r, "THEN")}${ws(r)}" +
          (if (kind == "UPDATE") updPayload() else kc(r, "DELETE"))
      } ++ inserts.map { c =>
        s"${kc(r, "WHEN NOT MATCHED")}" +
          (if (r.nextBoolean()) s"${ws(r)}${kc(r, "BY TARGET")}" else "") +
          c.map(x => s"${ws(r)}${kc(r, "AND")} $x").getOrElse("") +
          s"${ws(r)}${kc(r, "THEN")}${ws(r)}" + insPayload()
      } ++ bySource.map { case (kind, c) =>
        s"${kc(r, "WHEN NOT MATCHED BY SOURCE")}" +
          c.map(x => s"${ws(r)}${kc(r, "AND")} $x").getOrElse("") +
          s"${ws(r)}${kc(r, "THEN")}${ws(r)}" +
          (if (kind == "UPDATE") bsPayload() else kc(r, "DELETE"))
      }

    val srcText = r.nextInt(if (hazard) 4 else 3) match {
      case 0 => "src_view"
      case 1 => "db1.sv2"
      case 2 => s"(${kc(r, "SELECT")} * ${kc(r, "FROM")} sv " +
        s"${kc(r, "WHERE")} x ${kc(r, "IN")} (1, 2))"
      case _ => // USING subquery containing JOIN ... ON and a hazard literal
        s"(${kc(r, "SELECT")} a.k, b.v ${kc(r, "FROM")} a " +
          s"${kc(r, "JOIN")} b ${kc(r, "ON")} a.k = b.k " +
          s"${kc(r, "WHERE")} note = $hazardLit)"
    }
    val srcWithAlias = srcText +
      sAlias.map(a => s"${ws(r)}${if (r.nextBoolean()) kc(r, "AS") + ws(r) else ""}$a")
        .getOrElse("")

    val sql =
      s"${ws(r)}${kc(r, "MERGE")}${ws(r)}" +
        (if (evo) kc(r, "WITH SCHEMA EVOLUTION") + ws(r) else "") +
        s"${kc(r, "INTO")}${ws(r)}'$path'" +
        tAlias.map(a => s"${ws(r)}${kc(r, "AS")}${ws(r)}$a").getOrElse("") +
        s"${ws(r)}${kc(r, "USING")}${ws(r)}$srcWithAlias" +
        s"${ws(r)}${kc(r, "ON")}${ws(r)}$on${ws(r)}" +
        clauseTexts.mkString(ws(r)) + (if (r.nextBoolean()) ";" else "")

    (sql, Expect(keys, residualExpected,
      matched.map { case (k, c) => (k, c.map(condExpected)) },
      inserts.map(_.map(condExpected)),
      bySource.map { case (k, c) => (k, c.map(condExpected)) },
      evo))
  }

  test("MERGE fuzz: 160 seeded structural cases dispatch with exact keys/clauses/conditions") {
    val r = new Random(20260815L)
    var structural = 0
    (1 to 160).foreach { i =>
      val hazard = i % 4 == 0
      val (sql, exp) = genMerge(r, hazard)
      val plan = try parse(sql) catch {
        case e: Exception =>
          fail(s"case $i refused a WELL-FORMED merge: ${e.getMessage}\n$sql")
      }
      assert(plan.isDefined, s"case $i silently delegated:\n$sql")
      val cmd = plan.get match {
        case m: GraftMergeCommand => m
        case other => fail(s"case $i misrouted to ${other.getClass}:\n$sql")
      }
      assert(cmd.keys.sorted === exp.keys, s"case $i keys:\n$sql")
      assert(cmd.residual.isDefined === exp.residual.isDefined,
        s"case $i residual presence:\n$sql")
      exp.residual.foreach(er =>
        assert(cmd.residual.get.trim === er, s"case $i residual:\n$sql"))
      assert(cmd.schemaEvolution === exp.evo, s"case $i evo:\n$sql")
      assert(cmd.matched.map(_._1) === exp.matched.map(_._1),
        s"case $i matched kinds:\n$sql")
      assert(cmd.notMatched.size === exp.inserts.size,
        s"case $i insert count:\n$sql")
      assert(cmd.bySource.map(_._1) === exp.bySource.map(_._1),
        s"case $i by-source kinds:\n$sql")
      // conditions survive the alias rewriting exactly (modulo trim)
      cmd.matched.map(_._2).zip(exp.matched.map(_._2)).foreach {
        case (got, want) =>
          assert(got.map(_.trim) === want.map(_.trim),
            s"case $i matched cond:\n$sql")
          structural += 1
      }
      cmd.notMatched.map(_._1).zip(exp.inserts).foreach {
        case (got, want) =>
          assert(got.map(_.trim) === want.map(_.trim),
            s"case $i insert cond:\n$sql")
      }
    }
    assert(structural > 50, "generator degenerated — too few conditions")
  }

  // ---------------------------------------------------------------
  // Non-merge verbs
  // ---------------------------------------------------------------

  test("verb fuzz: 60 seeded UPDATE/DELETE/OPTIMIZE/VACUUM/RESTORE/ALTER cases") {
    val r = new Random(77001L)
    (1 to 60).foreach { i =>
      val path = s"/tmp/fz v$i"
      i % 6 match {
        case 0 =>
          val sql = s"${kc(r, "DELETE FROM")}${ws(r)}'$path'" +
            s"${ws(r)}${kc(r, "WHERE")} v = 'a''b' ${kc(r, "AND")} w > 1;"
          parse(sql).get match {
            case d: GraftDeleteCommand =>
              assert(d.path === path)
              assert(d.cond.contains("'a''b'"))
            case o => fail(s"case $i misrouted: $o")
          }
        case 1 =>
          val sql = s"${kc(r, "UPDATE")}${ws(r)}'$path'${ws(r)}" +
            s"${kc(r, "SET")} ${hazardIds(r.nextInt(hazardIds.size))} = " +
            s"concat('x,y', w),${ws(r)}v = 2" +
            s"${ws(r)}${kc(r, "WHERE")} grp ${kc(r, "IN")} (1,2)"
          parse(sql).get match {
            case u: GraftUpdateCommand =>
              assert(u.path === path)
              assert(u.set.size === 2, s"comma inside call split: ${u.set}")
              assert(u.set.head._2 === "concat('x,y', w)")
            case o => fail(s"case $i misrouted: $o")
          }
        case 2 =>
          val sql = s"${kc(r, "OPTIMIZE")}${ws(r)}'$path'${ws(r)}" +
            s"${kc(r, "INTO")} 7 ${kc(r, "FILES")}${ws(r)}" +
            s"${kc(r, "ZORDER BY")}${ws(r)}(a, b)"
          parse(sql).get match {
            case oc: GraftOptimizeCommand =>
              assert(oc.path === path)
              assert(oc.zorderCols === Seq("a", "b"))
            case o => fail(s"case $i misrouted: $o")
          }
        case 3 =>
          val sql = s"${kc(r, "VACUUM")}${ws(r)}'$path'${ws(r)}" +
            s"${kc(r, "RETAIN")} 3 ${kc(r, "VERSIONS")}" +
            (if (r.nextBoolean()) s"${ws(r)}${kc(r, "DRY RUN")}" else "")
          parse(sql).get match {
            case v: GraftVacuumCommand => assert(v.path === path)
            case o => fail(s"case $i misrouted: $o")
          }
        case 4 =>
          val sql = s"${kc(r, "RESTORE TABLE")}${ws(r)}'$path'${ws(r)}" +
            s"${kc(r, "TO VERSION AS OF")} ${i % 9}"
          parse(sql).get match {
            case rc: GraftRestoreCommand =>
              assert(rc.path === path && rc.version.contains((i % 9).toLong))
            case o => fail(s"case $i misrouted: $o")
          }
        case _ =>
          // ALTER COLUMN SET DEFAULT with an expression containing AND
          val sql = s"${kc(r, "ALTER TABLE")}${ws(r)}'$path'${ws(r)}" +
            s"${kc(r, "ALTER COLUMN")} ${normalIds(r.nextInt(normalIds.size))} " +
            s"${kc(r, "SET DEFAULT")} abs(-7) + 1"
          parse(sql).get match {
            case a: GraftAlterCommand =>
              assert(a.verb === "set_default" && a.args(1) === "abs(-7) + 1")
            case o => fail(s"case $i misrouted: $o")
          }
      }
    }
  }

  test("EXPECTATION DDL fuzz: 24 seeded cases — paren-bearing conditions, optional ON VIOLATION, random case/whitespace") {
    val r = new Random(77019L)
    val actions = Seq(
      None -> "warn",
      Some("ON VIOLATION WARN") -> "warn",
      Some("ON VIOLATION DROP ROW") -> "drop",
      Some("ON VIOLATION FAIL UPDATE") -> "fail")
    (1 to 24).foreach { i =>
      val path = s"/tmp/fz e$i"
      val name = s"rule_$i"
      // conditions with nested parens and commas — the greedy capture
      // must keep them whole
      val cond = Seq("v > 0", "coalesce(v, 0) > 0 AND w <> 'P'",
        "round(v, 2) <= 400000.0")(i % 3)
      val (clause, want) = actions(i % 4)
      val sql = s"${kc(r, "ALTER TABLE")}${ws(r)}'$path'${ws(r)}" +
        s"${kc(r, "ADD EXPECTATION")} $name${ws(r)}" +
        s"${kc(r, "EXPECT")}${ws(r)}($cond)" +
        clause.map(c => s"${ws(r)}${kc(r, c)}").getOrElse("") +
        (if (r.nextBoolean()) ";" else "")
      parse(sql).get match {
        case a: GraftAlterCommand =>
          assert(a.verb === "add_expectation", s"case $i: $a")
          assert(a.args === Seq(name, cond, want),
            s"case $i structure: ${a.args}")
        case o => fail(s"case $i misrouted: $o")
      }
      val drop = s"${kc(r, "ALTER TABLE")}${ws(r)}'$path'${ws(r)}" +
        s"${kc(r, "DROP EXPECTATION")} $name"
      parse(drop).get match {
        case a: GraftAlterCommand =>
          assert(a.verb === "drop_expectation" && a.args === Seq(name))
        case o => fail(s"case $i drop misrouted: $o")
      }
    }
  }

  test("CREATE PIPELINE fuzz: 20 seeded cases — ';' inside literals never splits defs, paren-bearing EXPECT conditions stay whole") {
    val r = new Random(77023L)
    (1 to 20).foreach { i =>
      val root = s"/tmp/fz p$i"
      // the SELECT carries a ';' and an EXPECT-shaped word inside a
      // string literal — the def split and the expect scan must both
      // ignore them; the EXPECT condition nests parens and commas
      val sql =
        s"""${kc(r, "CREATE PIPELINE")} pz$i ${kc(r, "AS")}
            ${kc(r, "TABLE")} b ${kc(r, "AT")} '$root/b'
              ${kc(r, "AS COPY FROM")} '$root/src;dir' ;
            ${kc(r, "TABLE")} s ${kc(r, "AT")} '$root/s'
              ${kc(r, "EXPECT")} ok (coalesce(v, round(x, 2)) > 0)
                ${kc(r, "ON VIOLATION DROP ROW")}
              ${kc(r, "INCREMENTAL FROM")} b ${kc(r, "AS")}
                SELECT id, 'a;EXPECT z(' AS tagx, v FROM b ;
            ${kc(r, "TABLE")} g ${kc(r, "AT")} '$root/g'
              ${kc(r, "MATERIALIZED FROM")} s ${kc(r, "AS")}
                SELECT tagx, COUNT(*) AS n FROM s GROUP BY tagx"""
      parse(sql).get match {
        case c: GraftCreatePipelineCommand =>
          assert(c.defs.size === 3, s"case $i def split: ${c.defs.map(_.name)}")
          assert(c.defs.map(_.name) === Seq("b", "s", "g"))
          assert(c.defs.head.flow ===
            PipeCopy(s"$root/src;dir", "parquet", "*"))
          val sdef = c.defs(1)
          assert(sdef.expectations ===
            Seq(("ok", "coalesce(v, round(x, 2)) > 0", "drop")),
            s"case $i expectations: ${sdef.expectations}")
          assert(sdef.flow.asInstanceOf[PipeIncr].select
            .contains("'a;EXPECT z('"), s"case $i literal mangled")
          assert(c.defs(2).flow.asInstanceOf[PipeMat].of === Seq("s"))
        case o => fail(s"case $i misrouted: $o")
      }
      val rr = s"${kc(r, "REFRESH PIPELINE")} pz$i ${kc(r, "RUN")} $i"
      parse(rr).get match {
        case cmd: GraftRefreshPipelineCommand =>
          assert(cmd.name === s"pz$i" && cmd.runId.contains(i.toLong) &&
            !cmd.full)
        case o => fail(s"case $i refresh misrouted: $o")
      }
      // the FULL form, with and without a TABLES subset / RUN
      val rf = r.nextInt(3) match {
        case 0 => s"${kc(r, "REFRESH PIPELINE")} pz$i ${kc(r, "FULL")}"
        case 1 => s"${kc(r, "REFRESH PIPELINE")} pz$i " +
          s"${kc(r, "FULL TABLES")} ( s , g ) ${kc(r, "RUN")} $i"
        case _ => s"${kc(r, "REFRESH PIPELINE")} pz$i " +
          s"${kc(r, "FULL")} ${kc(r, "RUN")} $i"
      }
      parse(rf).get match {
        case cmd: GraftRefreshPipelineCommand =>
          assert(cmd.full, s"case $i FULL lost: $rf")
          assert(cmd.fullTables.isEmpty ||
            cmd.fullTables === Seq("s", "g"),
            s"case $i tables: ${cmd.fullTables}")
        case o => fail(s"case $i full refresh misrouted: $o")
      }
    }
  }

  test("pipeline console-verb fuzz: 24 seeded cases — EXTERNAL/SNAPSHOT defs, DESCRIBE EXTENDED, RESTORE FROM, VACUUM EVENTS") {
    val r = new Random(88031L)
    (1 to 24).foreach { i =>
      val root = s"/tmp/fz c$i"
      // EXTERNAL source + snapshot edge, optional TRACK HISTORY
      val tracked = r.nextBoolean()
      val sql =
        s"""${kc(r, "CREATE PIPELINE")} pc$i
            ${kc(r, "EVENT LOG AT")} '$root/_ev' ${kc(r, "AS")}
            ${kc(r, "TABLE")} src ${kc(r, "AT")} '$root/src'
              ${kc(r, "EXTERNAL")} ;
            ${kc(r, "TABLE")} dim ${kc(r, "AT")} '$root/dim'
              ${kc(r, "APPLY CHANGES FROM SNAPSHOT")} src
              ${kc(r, "KEYS")} ( id )""" +
          (if (tracked) s" ${kc(r, "TRACK HISTORY ON")} ( a , b )"
           else "")
      parse(sql).get match {
        case c: GraftCreatePipelineCommand =>
          assert(c.defs.map(_.name) === Seq("src", "dim"),
            s"case $i defs: ${c.defs.map(_.name)}")
          assert(c.defs.head.flow === PipeExternal)
          val snap = c.defs(1).flow.asInstanceOf[PipeSnapCdc]
          assert(snap.of === "src" && snap.key === "id")
          assert(snap.tracked ===
            (if (tracked) Some(Seq("a", "b")) else None),
            s"case $i tracked: ${snap.tracked}")
          assert(c.rawSql === sql,
            s"case $i must persist the verbatim DDL")
        case o => fail(s"case $i misrouted: $o")
      }
      parse(s"${kc(r, "DESCRIBE PIPELINE EXTENDED")} pc$i").get match {
        case cmd: GraftDescribePipelineCommand =>
          assert(cmd.name === s"pc$i" && cmd.extended)
        case o => fail(s"case $i describe-ext misrouted: $o")
      }
      parse(s"${kc(r, "DESCRIBE PIPELINE")} pc$i").get match {
        case cmd: GraftDescribePipelineCommand =>
          assert(cmd.name === s"pc$i" && !cmd.extended)
        case o => fail(s"case $i describe misrouted: $o")
      }
      parse(s"${kc(r, "RESTORE PIPELINE FROM")} '$root/_ev'").get match {
        case cmd: GraftRestorePipelineCommand =>
          assert(cmd.path === s"$root/_ev")
        case o => fail(s"case $i restore misrouted: $o")
      }
      parse(s"${kc(r, "VACUUM PIPELINE")} pc$i " +
          s"${kc(r, "EVENTS KEEP")} ${i % 9 + 1} ${kc(r, "RUNS")}")
        .get match {
        case cmd: GraftVacuumPipelineEventsCommand =>
          assert(cmd.name === s"pc$i" &&
            cmd.keepRuns === (i % 9 + 1).toLong)
        case o => fail(s"case $i vacuum misrouted: $o")
      }
      parse(s"${kc(r, "START PIPELINE")} pc$i " +
          s"${kc(r, "CHECKPOINT AT")} '$root/_ck'").get match {
        case cmd: GraftStartPipelineCommand =>
          assert(cmd.name === s"pc$i" &&
            cmd.checkpoint === s"$root/_ck")
        case o => fail(s"case $i start misrouted: $o")
      }
      parse(s"${kc(r, "STOP PIPELINE")} pc$i").get match {
        case cmd: GraftStopPipelineCommand =>
          assert(cmd.name === s"pc$i")
        case o => fail(s"case $i stop misrouted: $o")
      }
    }
    // an empty-but-present TABLES list must refuse, not silently
    // widen to the rebuild-everything default
    val e = intercept[IllegalArgumentException] {
      parse("REFRESH PIPELINE p FULL TABLES ( )")
    }
    assert(e.getMessage.contains("names no tables"))
  }

  test("APPLY CHANGES fuzz: 40 seeded cases — optional clauses, hazard literals, random case/whitespace") {
    val r = new Random(77017L)
    (1 to 40).foreach { i =>
      val path = s"/tmp/fz ac$i"
      val key = keyPool(r.nextInt(keyPool.size))
      val seqc = normalIds(r.nextInt(normalIds.size))
      val src =
        if (r.nextBoolean()) "cdc_src"
        else "(SELECT * FROM cdc_src WHERE op <> 'KEYS (x)')"
      // DELETE WHEN payload sometimes carries clause-head text as DATA
      val delWhen = r.nextInt(3) match {
        case 0 => None
        case 1 => Some("flag")
        case _ => Some("op = 'STORED AS SCD TYPE 2'")
      }
      val scd2 = r.nextInt(3) == 0
      // TRUNCATE WHEN only composes with SCD TYPE 1 (the command
      // refuses it under TYPE 2 at run time; here we fuzz the parse);
      // its payload sometimes carries clause-head text as DATA too
      val truncWhen =
        if (scd2) None
        else r.nextInt(3) match {
          case 0 => None
          case 1 => Some("op = 'TRUNCATE'")
          case _ => Some("op = 'STORED AS SCD TYPE 1'")
        }
      val sql = s"${kc(r, "APPLY CHANGES INTO")}${ws(r)}'$path'${ws(r)}" +
        s"${kc(r, "FROM")}${ws(r)}$src${ws(r)}" +
        s"${kc(r, "KEYS")}${ws(r)}($key)${ws(r)}" +
        s"${kc(r, "SEQUENCE BY")} $seqc" +
        delWhen.map(d =>
          s"${ws(r)}${kc(r, "APPLY AS DELETE WHEN")} $d").getOrElse("") +
        truncWhen.map(t =>
          s"${ws(r)}${kc(r, "APPLY AS TRUNCATE WHEN")} $t").getOrElse("") +
        (if (scd2)
          s"${ws(r)}${kc(r, "STORED AS SCD TYPE")} 2" +
            s"${ws(r)}${kc(r, "TRACK HISTORY ON")}${ws(r)}(v, w)" +
            s"${ws(r)}${kc(r, "AT")} ${i % 9}"
        else if (r.nextBoolean())
          s"${ws(r)}${kc(r, "STORED AS SCD TYPE")} 1"
        else "") + (if (r.nextBoolean()) ";" else "")
      parse(sql).get match {
        case a: GraftApplyChangesCommand =>
          assert(a.path === path, s"case $i path: ${a.path}")
          assert(a.key === key && a.seqCol === seqc)
          assert(a.deleteWhen === delWhen, s"case $i del: ${a.deleteWhen}")
          assert(a.truncateWhen === truncWhen,
            s"case $i trunc: ${a.truncateWhen}")
          assert(a.scdType === (if (scd2) 2 else 1))
          if (scd2) {
            assert(a.tracked === Seq("v", "w"))
            assert(a.at.contains((i % 9).toLong))
          }
          assert(a.source === src.trim)
        case o => fail(s"case $i misrouted: $o")
      }
    }
  }

  // ---------------------------------------------------------------
  // Negative cases: loud refusal, never silent misroute
  // ---------------------------------------------------------------

  test("negative fuzz: malformed graft-shaped merges refuse loudly, never silently delegate") {
    val bad = Seq(
      // INSERT on the matched side
      "MERGE INTO '/tmp/fz/n1' USING sv ON k WHEN MATCHED THEN INSERT *",
      // UPDATE on the not-matched (by target) side
      "MERGE INTO '/tmp/fz/n2' USING sv ON k WHEN NOT MATCHED THEN UPDATE SET *",
      // unconditional matched clause not last
      "MERGE INTO '/tmp/fz/n3' USING sv ON k " +
        "WHEN MATCHED THEN DELETE WHEN MATCHED AND v > 1 THEN UPDATE SET *",
      // pure-residual ON: no equi-key conjunct
      "MERGE INTO '/tmp/fz/n4' USING sv ON t.v > s.v WHEN MATCHED THEN DELETE",
      // BY SOURCE INSERT is nonsense
      "MERGE INTO '/tmp/fz/n5' USING sv ON k " +
        "WHEN NOT MATCHED BY SOURCE THEN INSERT *",
      // INSERT column/value arity mismatch
      "MERGE INTO '/tmp/fz/n6' USING sv ON k " +
        "WHEN NOT MATCHED THEN INSERT (a, b) VALUES (1)",
      // no WHEN clause at all (regex can't even see a clause head)
      "MERGE INTO '/tmp/fz/n7' USING sv ON k")
    bad.zipWithIndex.foreach { case (sql, i) =>
      val outcome = try Left(parse(sql)) catch { case e: Exception => Right(e) }
      outcome match {
        case Right(_) => () // loud refusal: the contract
        case Left(None) if i == bad.size - 1 =>
          () // the clauseless form never matches mergeRe; Spark's own
             // MERGE parse error is the loud surface there
        case Left(None) =>
          fail(s"negative case $i SILENTLY delegated to Spark:\n$sql")
        case Left(Some(p)) =>
          fail(s"negative case $i dispatched anyway to $p:\n$sql")
      }
    }
  }

  test("backslash-escaped quotes inside literals never desynchronize the mask (r15 advice)") {
    // Spark's default literal syntax (escapedStringLiterals=false)
    // keeps \' INSIDE the literal — a naive quote-toggle scanner
    // reads the remainder of the value as top-level text and
    // mis-splits on the embedded clause keywords
    val sql =
      """MERGE INTO '/tmp/bs t' AS t USING src AS s ON t.k = s.k
         WHEN MATCHED AND s.name = 'O\'Brien WHEN MATCHED THEN DELETE'
           THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT *"""
    val cmd = parse(sql).get.asInstanceOf[GraftMergeCommand]
    assert(cmd.matched.size === 1 && cmd.matched.head._1.equalsIgnoreCase("update"),
      s"matched clauses corrupted: ${cmd.matched}")
    assert(cmd.notMatched.size === 1)
    assert(cmd.matched.head._2.get.contains("O\\'Brien"),
      s"condition must carry the escaped literal: ${cmd.matched.head._2}")
    // UPDATE ... SET with an escaped quote + ' WHERE ' inside the value
    val upd = parse(
      """UPDATE '/tmp/bs t' SET note = 'it\'s WHERE clauses hide'
         WHERE k = 1""").get.asInstanceOf[GraftUpdateCommand]
    assert(upd.cond.trim === "k = 1",
      s"SET/WHERE split corrupted by the escaped quote: '${upd.cond}'")
    assert(upd.set === Seq("note" -> "'it\\'s WHERE clauses hide'"),
      s"SET value corrupted: ${upd.set}")
    // doubled-quote escaping still composes with backslashes
    val cmd2 = parse(
      """MERGE INTO '/tmp/bs t' AS t USING src AS s ON t.k = s.k
         WHEN MATCHED AND s.a = 'x''y\'z WHEN MATCHED' THEN DELETE"""
    ).get.asInstanceOf[GraftMergeCommand]
    assert(cmd2.matched.size === 1 && cmd2.matched.head._1.equalsIgnoreCase("delete"),
      s"got ${cmd2.matched}")
  }
}
