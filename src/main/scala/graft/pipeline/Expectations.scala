package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** DLT-style EXPECTATIONS — the declarative data-quality gate
  * (`CONSTRAINT name EXPECT (cond) [ON VIOLATION DROP ROW | FAIL
  * UPDATE]`, reference ecosystem: DLT expectations / delta-spark
  * docs): each rule is a boolean SQL condition over the batch with
  * one of three actions —
  *
  *  - WARN (DLT's bare `expect`): violating rows are KEPT; the
  *    violation count is recorded;
  *  - DROP (`expect_or_drop`): violating rows are dropped from the
  *    gated output; counts recorded;
  *  - FAIL (`expect_or_fail`): the first violating row FAILS the
  *    whole update — nothing lands (the engine's CHECK-constraint
  *    behavior, available pre-write).
  *
  * A NULL condition result counts as a VIOLATION (DLT's reading: the
  * expectation passes only when the condition is true).
  *
  * Spark-first metrics: [[gate]] rides `Dataset.observe` — the
  * per-rule pass/violation counts accumulate DURING the gated
  * frame's own action (one pass, batch or streaming micro-batch; no
  * second scan), exactly the mechanism DLT's event-log metrics use.
  * [[metrics]] is the deterministic relational twin (one standalone
  * agg) for oracles and reports.
  *
  * Scale shape: the gate is a per-row projection + filter fused into
  * whatever action consumes the frame — zero extra scans, zero
  * shuffles; the observe metrics are an AccumulatorV2 under the
  * hood (driver-side constant size: one long pair per rule).
  */
object Expectations {

  sealed trait Action { def name: String }
  case object Warn extends Action { val name = "warn" }
  case object Drop extends Action { val name = "drop" }
  case object Fail extends Action { val name = "fail" }

  /** One expectation: a name (for metrics/errors), a boolean SQL
    * condition that must read TRUE for the row to pass, an action. */
  final case class Expectation(name: String, condSql: String,
                               action: Action) {
    require(name.nonEmpty && !name.contains(";"),
      s"expectation name '$name' must be non-empty without ';'")
    private[Expectations] def passCol: Column =
      coalesce(expr(condSql), lit(false))
  }

  def expect(name: String, condSql: String): Expectation =
    Expectation(name, condSql, Warn)
  def expectOrDrop(name: String, condSql: String): Expectation =
    Expectation(name, condSql, Drop)
  def expectOrFail(name: String, condSql: String): Expectation =
    Expectation(name, condSql, Fail)

  /** Gate a batch through `rules`: returns the gated frame and an
    * [[Observation]] whose metrics (`<name>_violations`,
    * `<name>_passed` per rule, plus `rows_observed`) materialize
    * when the gated frame's FIRST action completes — one pass, no
    * second scan. FAIL rules arm a per-row `assert_true` (the first
    * violating row kills the job, nothing lands); WARN/DROP counts
    * observe BEFORE drop filtering, so dropped rows are counted. */
  private def validated(rules: Seq[Expectation]): Unit = {
    require(rules.nonEmpty, "expectations gate needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be distinct")
  }

  private def failGuard(df: DataFrame,
                        rules: Seq[Expectation]): DataFrame =
    rules.filter(_.action == Fail).foldLeft(df) { (d, r) =>
      d.filter(assert_true(r.passCol,
        concat(lit(s"EXPECT '${r.name}' (${r.condSql}) ON VIOLATION " +
          "FAIL UPDATE violated by row: "),
          to_json(struct(df.columns.map(col).toSeq: _*)))).isNull)
    }

  private def metricCols(rules: Seq[Expectation]): Seq[Column] =
    rules.flatMap { r =>
      Seq(sum(when(!r.passCol, 1L).otherwise(0L))
            .as(s"${r.name}_violations"),
        sum(when(r.passCol, 1L).otherwise(0L)).as(s"${r.name}_passed"))
    } :+ count(lit(1)).as("rows_observed")

  private def dropFilter(df: DataFrame,
                         rules: Seq[Expectation]): DataFrame =
    rules.filter(_.action == Drop).foldLeft(df)((d, r) => d.filter(r.passCol))

  def gate(df: DataFrame, rules: Seq[Expectation],
           observationName: String = "expectations")
      : (DataFrame, Observation) = {
    validated(rules)
    // FAIL rules first: DLT evaluates each row against all
    // expectations independently — a dropped row still fails a FAIL
    // rule it violates. Arming fail before drop keeps that reading.
    val failGuarded = failGuard(df, rules)
    val obs = new Observation(observationName)
    val mc = metricCols(rules)
    val observed = failGuarded.observe(obs, mc.head, mc.tail: _*)
    (dropFilter(observed, rules), obs)
  }

  /** Streaming twin of [[gate]]: `Observation` is batch-only in
    * Spark, so the streaming spelling attaches the SAME metric
    * columns via the string-named `observe` — per-micro-batch values
    * surface through each `StreamingQueryProgress.observedMetrics
    * (name)`, exactly DLT's per-flow expectation metrics. FAIL and
    * DROP rules behave identically to the batch gate. */
  def gateStream(df: DataFrame, rules: Seq[Expectation],
                 observationName: String = "expectations"): DataFrame = {
    validated(rules)
    val mc = metricCols(rules)
    dropFilter(
      failGuard(df, rules).observe(observationName, mc.head, mc.tail: _*),
      rules)
  }

  /** The rows the DROP subset of `rules` would filter, each tagged
    * with `_violated` = the comma-joined names of every DROP rule it
    * violates (NULL condition = violation, the gate's reading) — the
    * quarantine feed of DLT's documented invalid-record pattern. One
    * filter over `df`, no shuffle; the caller lands it next to the
    * gated write. Refuses when no DROP rule exists (nothing could
    * ever quarantine — a dead table declared is a mistake). */
  def quarantined(df: DataFrame,
                  rules: Seq[Expectation]): DataFrame = {
    val drops = rules.filter(_.action == Drop)
    require(drops.nonEmpty,
      "quarantine needs at least one ON VIOLATION DROP ROW rule — " +
        "WARN keeps rows and FAIL kills the update; neither feeds a " +
        "quarantine")
    val flags = drops.map(r => r.name -> !r.passCol)
    df.filter(flags.map(_._2).reduce(_ || _))
      .withColumn("_violated", concat_ws(",",
        flags.map { case (n, c) => when(c, lit(n)) }: _*))
  }

  // ------------------------------------------------------------------
  // Persisted (table-bound) expectations — the manifest wire format and
  // the commit staging-pass gate ManifestTable applies to every
  // write/append/COPY INTO on a table with declared rules.
  // ------------------------------------------------------------------

  /** Wire format of one persisted rule (the manifest `expectations`
    * map value): `<action>:<condSql>` — action names never contain
    * ':', the condition may. */
  private[pipeline] def encode(action: String, condSql: String): String = {
    require(Set("warn", "drop", "fail").contains(action),
      s"expectation action must be warn|drop|fail, got '$action'")
    s"$action:$condSql"
  }

  private[pipeline] def fromPersisted(
      persisted: Map[String, String]): Seq[Expectation] =
    persisted.toSeq.sortBy(_._1).map { case (name, v) =>
      val i = v.indexOf(':')
      require(i > 0, s"malformed persisted expectation '$name': '$v'")
      val action = v.substring(0, i) match {
        case "warn" => Warn
        case "drop" => Drop
        case "fail" => Fail
        case other => throw new IllegalArgumentException(
          s"unknown expectation action '$other' for rule '$name'")
      }
      Expectation(name, v.substring(i + 1), action)
    }

  /** The commit staging-pass gate over persisted rules: the gated
    * frame, the observation (metrics materialize with the staging
    * write itself), and the rule names for metric extraction. */
  private[pipeline] def commitGate(df: DataFrame,
                                   persisted: Map[String, String],
                                   obsName: String)
      : (DataFrame, Observation, Seq[String]) = {
    val rules = fromPersisted(persisted)
    val (gated, obs) = gate(df, rules, obsName)
    (gated, obs, rules.map(_.name))
  }

  /** Per-rule (violated, passed) counts from a completed observation —
    * an empty batch observes NULL sums, which read as 0. */
  private[pipeline] def metricsOf(obs: Observation,
                                  names: Seq[String])
      : Map[String, (Long, Long)] = {
    val got = obs.get
    def l(k: String): Long = got.get(k) match {
      case Some(v: Number) => v.longValue()
      case _ => 0L
    }
    names.map(n =>
      n -> (l(s"${n}_violations"), l(s"${n}_passed"))).toMap
  }

  /** Relational metrics twin: per rule one row
    * (rule, action, violated, passed) from a single agg over `df` —
    * the deterministic form oracles and quality reports consume. */
  def metrics(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectations metrics needs at least one rule")
    val aggs = rules.flatMap { r =>
      Seq(sum(when(!r.passCol, 1L).otherwise(0L))
            .as(s"${r.name}__v"),
        sum(when(r.passCol, 1L).otherwise(0L)).as(s"${r.name}__p"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { r =>
      struct(lit(r.name).as("rule"), lit(r.action.name).as("action"),
        coalesce(col(s"${r.name}__v"), lit(0L)).as("violated"),
        coalesce(col(s"${r.name}__p"), lit(0L)).as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("m")).select("m.*")
  }

  /** Declared EXPECTATIONS query: the orders batch gated through all
    * three actions — a WARN rule (violations counted, rows kept), a
    * DROP rule (the 'P' slice removed), and a passing FAIL rule —
    * with the gated slice's row count and key checksum folded into
    * the output, so the oracle hash-gates BOTH the metric counts and
    * the drop semantics. The in-query require cross-checks the
    * `observe`-path metrics against the relational twin — one gated
    * action, two independent counting mechanisms, forced to agree.
    */
  def expectationsGate(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, sfDir)
    val rules = Seq(
      expect("reasonable_price", "o_totalprice <= 400000.0"),
      expectOrDrop("not_pending", "o_orderstatus <> 'P'"),
      expectOrFail("key_present", "o_orderkey IS NOT NULL"))
    val (kept, obs) = gate(orders, rules)
    val keptRow = kept.agg(
      count(lit(1)).as("n"),
      sum(col("o_orderkey")).as("key_sum")).head()
    // the observe metrics materialized with the action above; they
    // must agree with the relational twin exactly
    val got = obs.get
    val rel = metrics(orders, rules).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    rules.foreach { r =>
      val o = (got(s"${r.name}_violations").asInstanceOf[Long],
        got(s"${r.name}_passed").asInstanceOf[Long])
      require(o == rel(r.name),
        s"observe metrics diverge from relational for '${r.name}': " +
          s"$o vs ${rel(r.name)}")
    }
    // output built from the ALREADY-collected twin rows — exactly two
    // scans total (the gated action + one relational agg); r18 re-ran
    // the relational agg a second time for the output
    spark.createDataFrame(rules.map(r =>
        (r.name, r.action.name, rel(r.name)._1, rel(r.name)._2)))
      .toDF("rule", "action", "violated", "passed")
      .unionByName(spark.range(1).select(
        lit("_gated_").as("rule"), lit("kept").as("action"),
        lit(keptRow.getLong(0)).as("violated"),
        lit(keptRow.getLong(1)).as("passed")))
      .orderBy(col("rule"))
  }
}
