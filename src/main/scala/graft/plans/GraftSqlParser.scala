package graft.plans

import graft.pipeline.ManifestTable

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** SQL surface for the ACID table verbs — the user-facing layer the
  * reference's platform exposes over its Delta tables
  * (`/root/reference/src/etl_pipeline.py:36-37` wires the Delta SQL
  * extension; a data engineer drives MERGE/OPTIMIZE/RESTORE from a SQL
  * console, not a Scala API). Injected via the public
  * `SparkSessionExtensions.injectParser` hook from [[GraftExtensions]].
  *
  * Tables are addressed BY PATH as a single-quoted string — the
  * path-table idiom (Delta's `delta.`/path``) without requiring a
  * catalog: standard SQL can never parse `MERGE INTO '<path>'`, so
  * interception is unambiguous and EVERY other statement delegates
  * byte-identical to Spark's parser. Statements:
  *
  *   DESCRIBE HISTORY '<path>'
  *   DESCRIBE DETAIL '<path>'
  *   SHOW PARTITIONS '<path>'
  *   OPTIMIZE '<path>' [INTO n FILES] [ZORDER BY (c1, c2 [, ...])]
  *   OPTIMIZE '<path>' [INTO n FILES] WHERE <partition cond>
  *   RESTORE [TABLE] '<path>' TO VERSION AS OF n
  *   RESTORE [TABLE] '<path>' TO TIMESTAMP AS OF '<ts>'
  *   VACUUM '<path>' [RETAIN n VERSIONS|HOURS] [DRY RUN]
  *   DELETE FROM '<path>' WHERE <cond>
  *   UPDATE '<path>' SET c = e [, ...] WHERE <cond>
  *   MERGE INTO '<path>' USING <table|(subquery)> [AS] [alias] ON <key>
  *     [WHEN MATCHED [AND <cond>] THEN UPDATE SET *|SET c = e [, ...]]
  *     [WHEN MATCHED [AND <cond>] THEN DELETE]
  *     [WHEN NOT MATCHED [AND <cond>] THEN INSERT *|(cols) VALUES (es)]
  *   APPLY CHANGES INTO '<path>' FROM <table|(subquery)> KEYS (k)
  *     SEQUENCE BY seq [APPLY AS DELETE WHEN <expr>]
  *     [STORED AS SCD TYPE 1|2] [TRACK HISTORY ON (c1, c2)] [AT n]
  *   ALTER TABLE '<path>' RENAME COLUMN a TO b
  *   ALTER TABLE '<path>' DROP COLUMN a
  *   ALTER TABLE '<path>' ADD CONSTRAINT name CHECK (<expr>)
  *   ALTER TABLE '<path>' DROP CONSTRAINT name
  *   ALTER TABLE '<path>' ADD EXPECTATION name EXPECT (<expr>)
  *                        [ON VIOLATION WARN | DROP ROW | FAIL UPDATE]
  *   ALTER TABLE '<path>' DROP EXPECTATION name
  *   CREATE PIPELINE name [EVENT LOG AT '<path>'] AS
  *     TABLE t1 AT '<path>' AS COPY FROM '<dir>' [FORMAT f] [PATTERN 'g'] ;
  *     TABLE t2 AT '<path>' [EXPECT r (<cond>) [ON VIOLATION ...]]...
  *       [QUARANTINE AT '<path>'] INCREMENTAL FROM t1 AS SELECT ... ;
  *     TABLE t3 AT '<path>' MATERIALIZED FROM t2 [, tN] AS SELECT ... ;
  *     TABLE t4 AT '<path>' APPLY CHANGES FROM t1 KEYS (k) SEQUENCE BY s
  *       [APPLY AS DELETE WHEN d] [TRACK HISTORY ON (c1 [, c2])] ;
  *     TABLE t5 AT '<path>' AGGREGATE FROM t2 GROUP BY (k1 [, k2])
  *       AGG (SUM(expr) AS a, COUNT(*) AS n [, COUNT(expr) AS m])
  *       -- compiles to the exact mergeable-state incremental fold
  *     TABLE t6 AT '<path>' EXTERNAL ;  -- unmanaged source location
  *     TABLE t7 AT '<path>' APPLY CHANGES FROM SNAPSHOT t6 KEYS (k)
  *       [TRACK HISTORY ON (c1 [, c2])]  -- upstream version = sequence
  *   REFRESH PIPELINE name [FULL [TABLES (a [, b])]] [RUN n]
  *   START PIPELINE name CHECKPOINT AT '<root>'  -- continuous mode
  *   STOP PIPELINE name
  *   DESCRIBE PIPELINE [EXTENDED] name
  *   RESTORE PIPELINE FROM '<event log path>'
  *   VACUUM PIPELINE name EVENTS KEEP n RUNS
  *   DROP PIPELINE name
  *   ALTER TABLE '<path>' ALTER COLUMN c SET|DROP NOT NULL
  *   ALTER TABLE '<path>' SET TBLPROPERTIES ('k' = 'v' [, ...])
  *   ALTER TABLE '<path>' UNSET TBLPROPERTIES [IF EXISTS] ('k' [, ...])
  *   SHOW TBLPROPERTIES '<path>'
  *   GENERATE symlink_format_manifest FOR TABLE '<path>'
  *   CREATE TABLE '<dst>' SHALLOW CLONE '<src>' [VERSION AS OF n]
  *   ANALYZE [TABLE] '<path>' FOR COLUMNS a, b
  *   ALTER TABLE '<path>' SET STATS COLUMNS a, b
  *   ALTER TABLE '<path>' CLUSTER BY (a, b)
  *   INSERT INTO '<path>' SELECT ...        -- transactional append
  *   INSERT OVERWRITE '<path>' SELECT ...   -- snapshot replace
  *   INSERT OVERWRITE '<path>' WHERE <cond> SELECT ...  -- replaceWhere
  *   CREATE TABLE '<path>' AS SELECT ...    -- CTAS (must not exist)
  *
  * CATALOG NAMES (round 12): every verb target also accepts the
  * name spelling `graft.db.t` / `graft.t` (normalized by
  * [[GraftSqlStatements.rewriteNames]] to a `graft:db.t` spec and
  * resolved through [[graft.catalog.GraftCatalog]] at run time), plus
  * the catalog-admin verbs:
  *
  *   CREATE TABLE graft.db.t LOCATION '<path>'  -- adopt external
  *   DROP TABLE graft.db.t [PURGE]
  *   SHOW TABLES IN graft[.db]
  *
  * Name READS (`SELECT ... FROM graft.db.t`, `spark.table`) resolve
  * through the injected analyzer rule [[GraftNameResolution]], not
  * this parser.
  *
  * MERGE clause order follows SQL/Delta FIRST-CLAUSE-WINS: a row
  * claimed by an earlier matched clause never reaches a later one;
  * any number of clauses per kind (round 13); an unconditional
  * clause must be the last on its match side.
  *
  * Reads, including time travel, go through the injected TABLE
  * FUNCTIONS (`graft_table`, `graft_table_at` — see
  * [[GraftExtensions]]), plus parser sugar rewriting the Delta-ish
  * spelling `graft.'<path>' [VERSION AS OF n | TIMESTAMP AS OF '<ts>']`
  * into those calls anywhere in a statement, so full SELECT syntax
  * (joins, CTEs, windows) composes over path tables:
  *
  *   SELECT * FROM graft.'/data/events' VERSION AS OF 3 WHERE ...
  *
  * MERGE clause conditions may reference source columns bare (or via
  * the source alias) and target columns as `target.<col>` (or via the
  * target alias) — rewritten to [[ManifestTable.mergeConditional]]'s
  * resolved-frame names (`_b_<col>`). Only `UPDATE SET *` / `INSERT *`
  * forms are supported: the source must carry exactly the table's
  * columns (the schema contract of keyed merge).
  *
  * Each verb compiles to a `LeafRunnableCommand` — driver-side O(1)
  * dispatch into the existing ManifestTable operators, which do the
  * distributed work; no second execution path to keep correct.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlStatements.parse(GraftSqlStatements.rewriteNames(sqlText))
      .getOrElse(delegate.parsePlan(GraftSqlStatements.rewriteReads(sqlText)))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(GraftSqlStatements.rewriteReads(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Statement recognition for [[GraftSqlParser]] — anchored regex
  * dispatch (a verb keyword + a quoted path can never prefix-collide
  * with standard SQL), then per-verb field extraction. Conditions and
  * SET expressions stay TEXT here and compile with Spark's own
  * `expr()` at run time, so the full Spark expression language is
  * available inside every verb.
  */
object GraftSqlStatements {

  private val P = "'([^']+)'" // quoted path capture

  private val describeHistoryRe =
    s"(?is)^\\s*DESCRIBE\\s+HISTORY\\s+$P\\s*;?\\s*$$".r
  private val showPartitionsRe =
    s"(?is)^\\s*SHOW\\s+PARTITIONS\\s+$P\\s*;?\\s*$$".r
  private val describeDetailRe =
    s"(?is)^\\s*DESCRIBE\\s+DETAIL\\s+$P\\s*;?\\s*$$".r
  private val optimizeRe =
    s"(?is)^\\s*OPTIMIZE\\s+$P(?:\\s+INTO\\s+(\\d+)\\s+FILES)?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$".r
  private val restoreVersionRe =
    s"(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*$$".r
  private val restoreTimestampRe =
    s"(?is)^\\s*RESTORE\\s+(?:TABLE\\s+)?$P\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*$$".r
  private val vacuumRe =
    s"(?is)^\\s*VACUUM\\s+$P(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS))?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$".r
  private val setNotNullRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+(SET|DROP)\\s+NOT\\s+NULL\\s*;?\\s*$$".r
  private val setDefaultRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+SET\\s+DEFAULT\\s+(.+?)\\s*;?\\s*$$".r
  private val dropDefaultRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+DROP\\s+DEFAULT\\s*;?\\s*$$".r
  private val deleteRe =
    s"(?is)^\\s*DELETE\\s+FROM\\s+$P(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$".r
  private val updateRe =
    s"(?is)^\\s*UPDATE\\s+$P\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?\\s*;?\\s*$$".r
  // APPLY CHANGES INTO '<path>' FROM <table|(subquery)> KEYS (k)
  // SEQUENCE BY seq [APPLY AS DELETE WHEN <expr>]
  // [APPLY AS TRUNCATE WHEN <expr>]
  // [STORED AS SCD TYPE 1|2] [TRACK HISTORY ON (c1, c2)] [AT n] —
  // DLT's declarative CDC verb over pipeline/ApplyChanges. The FROM
  // part is lazy up to the mandatory KEYS; the DELETE/TRUNCATE WHEN
  // expressions are lazy up to the next optional clause head or end.
  private val applyChangesRe =
    ("(?is)^\\s*APPLY\\s+CHANGES\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\s+" + P +
      "\\s+FROM\\s+(.+?)\\s+KEYS\\s*\\((\\w+)\\)" +
      "\\s+SEQUENCE\\s+BY\\s+(\\w+)" +
      "(?:\\s+APPLY\\s+AS\\s+DELETE\\s+WHEN\\s+" +
      "(.+?(?=\\s+APPLY\\s+AS\\s+TRUNCATE|\\s+STORED\\s+AS|\\s+TRACK\\s+HISTORY|\\s+AT\\s+\\d|\\s*;?\\s*$)))?" +
      "(?:\\s+APPLY\\s+AS\\s+TRUNCATE\\s+WHEN\\s+" +
      "(.+?(?=\\s+STORED\\s+AS|\\s+TRACK\\s+HISTORY|\\s+AT\\s+\\d|\\s*;?\\s*$)))?" +
      "(?:\\s+STORED\\s+AS\\s+SCD\\s+TYPE\\s+(1|2))?" +
      "(?:\\s+TRACK\\s+HISTORY\\s+ON\\s*\\(([^)]*)\\))?" +
      "(?:\\s+AT\\s+(\\d+))?" +
      "\\s*;?\\s*$").r

  // MERGE only matches its HEAD by regex; the USING/ON/WHEN split is
  // done by a paren- and literal-aware scanner ([[splitMergeTail]]) —
  // a lazy regex split at the first " ON " broke USING subqueries
  // containing JOIN ... ON, and literals containing clause-head text
  // broke the WHEN split (both found by ParserFuzzSpec).
  private val mergeHeadRe =
    ("(?is)^\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\s+" +
      s"$P(?:\\s+(?:AS\\s+)?(\\w+))?\\s+USING\\s+(.+)$$").r
  // ALTER TABLE '<path>' SHRED VARIANT v ON ('$.k' 'long', ...)
  // [RANGE LAYOUT ON '$.k' [PARTITIONS n]] — declares variant
  // shredding on an existing table: ONE rewrite commit lands the
  // recomputed snapshot + generated-column declarations + spec
  // properties + stats schema (pipeline/VariantShred.write). The SQL
  // surface for the verb-managed shred keys (a bare SET TBLPROPERTIES
  // refuses them — see ManifestTable.TunableProps).
  private val shredRe =
    // the pairs group is GREEDY: a quoted type may itself contain
    // parens (decimal(10,2)) — the closing paren that ends the list
    // is the LAST one before the optional RANGE clause / end
    (s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+SHRED\\s+VARIANT\\s+(\\w+)" +
      "\\s+ON\\s*\\((.+)\\)" +
      "(?:\\s+RANGE\\s+LAYOUT\\s+ON\\s+'([^']+)'" +
      "(?:\\s+PARTITIONS\\s+(\\d+))?)?" +
      "\\s*;?\\s*$").r
  private val shredPairRe = "'([^']+)'\\s+'([^']+)'".r
  private val renameColRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)\\s*;?\\s*$$".r
  private val dropColRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*$$".r
  private val addConstraintRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*$$".r
  private val dropConstraintRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+CONSTRAINT\\s+(\\w+)\\s*;?\\s*$$".r
  // DLT's expectation DDL (`CONSTRAINT name EXPECT (cond) ON
  // VIOLATION DROP ROW | FAIL UPDATE`), spelled as an ALTER verb:
  // bare (no ON VIOLATION) = WARN, DLT's `expect`
  private val addExpectationRe =
    (s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+EXPECTATION\\s+(\\w+)" +
      "\\s+EXPECT\\s*\\((.+)\\)" +
      "(?:\\s+ON\\s+VIOLATION\\s+(WARN|DROP\\s+ROW|FAIL\\s+UPDATE))?" +
      "\\s*;?\\s*$").r
  private val dropExpectationRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+DROP\\s+EXPECTATION\\s+(\\w+)\\s*;?\\s*$$".r
  // Declarative pipeline (DLT's product shape, SQL spelling): one
  // statement declares the whole graph — ';'-separated TABLE defs,
  // each naming its storage path, optional EXPECT rules, and a flow:
  //   AS COPY FROM '<dir>'            (ledger-driven file ingest)
  //   INCREMENTAL FROM <up> AS SELECT (row-wise over NEW upstream rows
  //                                    — the upstream name denotes the
  //                                    change batch inside the SELECT)
  //   MATERIALIZED FROM <a[, b]> AS SELECT   (full recompute)
  //   APPLY CHANGES FROM <up> KEYS (k) SEQUENCE BY s
  //     [APPLY AS DELETE WHEN d] [TRACK HISTORY ON (c1[, c2])]
  private val createPipelineRe =
    (s"(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?PIPELINE\\s+(\\w+)" +
      s"(?:\\s+EVENT\\s+LOG\\s+AT\\s+$P)?\\s+AS\\s+(.+)$$").r
  private val refreshPipelineRe =
    ("(?is)^\\s*REFRESH\\s+PIPELINE\\s+(\\w+)" +
      "(?:\\s+(FULL)(?:\\s+TABLES\\s*\\(([\\w\\s,]+)\\))?)?" +
      "(?:\\s+RUN\\s+(\\d+))?\\s*;?\\s*$").r
  private val describePipelineRe =
    "(?is)^\\s*DESCRIBE\\s+PIPELINE\\s+(\\w+)\\s*;?\\s*$".r
  private val describePipelineExtRe =
    "(?is)^\\s*DESCRIBE\\s+PIPELINE\\s+EXTENDED\\s+(\\w+)\\s*;?\\s*$".r
  private val dropPipelineRe =
    "(?is)^\\s*DROP\\s+PIPELINE\\s+(\\w+)\\s*;?\\s*$".r
  private val showPipelinesRe =
    "(?is)^\\s*SHOW\\s+PIPELINES\\s*;?\\s*$".r
  private val restorePipelineRe =
    s"(?is)^\\s*RESTORE\\s+PIPELINE\\s+FROM\\s+$P\\s*;?\\s*$$".r
  private val startPipelineRe =
    ("(?is)^\\s*START\\s+PIPELINE\\s+(\\w+)\\s+CHECKPOINT\\s+AT\\s+" +
      "'([^']+)'\\s*;?\\s*$").r
  private val stopPipelineRe =
    "(?is)^\\s*STOP\\s+PIPELINE\\s+(\\w+)\\s*;?\\s*$".r
  private val vacuumPipelineEventsRe =
    ("(?is)^\\s*VACUUM\\s+PIPELINE\\s+(\\w+)\\s+EVENTS\\s+KEEP\\s+" +
      "(\\d+)\\s+RUNS\\s*;?\\s*$").r
  private val pipeDefHeadRe =
    s"(?is)^\\s*TABLE\\s+(\\w+)\\s+AT\\s+$P\\s+(.+)$$".r
  private val pipeCopyRe =
    ("(?is)^AS\\s+COPY\\s+FROM\\s+'([^']+)'(?:\\s+FORMAT\\s+(\\w+))?" +
      "(?:\\s+PATTERN\\s+'([^']+)')?\\s*$").r
  private val pipeIncrRe =
    "(?is)^INCREMENTAL\\s+FROM\\s+(\\w+)\\s+AS\\s+((?:SELECT|WITH)\\s+.+)$".r
  private val pipeMatRe =
    "(?is)^MATERIALIZED\\s+FROM\\s+([\\w\\s,]+?)\\s+AS\\s+((?:SELECT|WITH)\\s+.+)$".r
  private val pipeAggRe =
    ("(?is)^AGGREGATE\\s+FROM\\s+(\\w+)\\s+GROUP\\s+BY\\s*" +
      "\\(([\\w\\s,]+)\\)\\s+AGG\\s*\\((.+)\\)\\s*$").r
  private val pipeAggItemRe =
    "(?is)^(SUM|COUNT)\\s*\\((.+)\\)\\s+AS\\s+(\\w+)$".r
  private val pipeCdcRe =
    ("(?is)^APPLY\\s+CHANGES\\s+FROM\\s+(\\w+)\\s+KEYS\\s*\\((\\w+)\\)" +
      "\\s+SEQUENCE\\s+BY\\s+(\\w+)" +
      "(?:\\s+APPLY\\s+AS\\s+DELETE\\s+WHEN\\s+(\\w+))?" +
      "(?:\\s+TRACK\\s+HISTORY\\s+ON\\s*\\(([\\w\\s,]+)\\))?\\s*$").r
  private val pipeSnapCdcRe =
    ("(?is)^APPLY\\s+CHANGES\\s+FROM\\s+SNAPSHOT\\s+(\\w+)\\s+KEYS" +
      "\\s*\\(\\s*(\\w+)\\s*\\)" +
      "(?:\\s+TRACK\\s+HISTORY\\s+ON\\s*\\(([\\w\\s,]+)\\))?\\s*$").r
  private val pipeExternalRe = "(?is)^EXTERNAL\\s*$".r
  private val pipeExpectHeadRe = "(?is)^\\s*EXPECT\\s+(\\w+)\\s*\\(".r
  private val pipeViolRe =
    "(?is)^\\s*ON\\s+VIOLATION\\s+(WARN|DROP\\s+ROW|FAIL\\s+UPDATE)".r
  private val pipeQuarRe =
    "(?is)^QUARANTINE\\s+AT\\s+'([^']+)'\\s+(.+)$".r

  /** Split the CREATE PIPELINE body at top-level ';' (a ';' inside a
    * string literal never splits). */
  private def splitPipeDefs(body: String): Seq[String] = {
    val masked = maskLiterals(body)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < body.length) {
      if (masked.charAt(i) == ';') {
        out += body.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += body.substring(start)
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def parsePipeDef(s: String): PipeDef = s match {
    case pipeDefHeadRe(name, path, rest0) =>
      var rest = rest0.trim
      val exps = scala.collection.mutable
        .ArrayBuffer.empty[(String, String, String)]
      var m = pipeExpectHeadRe.findPrefixMatchOf(rest)
      while (m.isDefined) {
        val open = m.get.end - 1 // the '(' the head regex ends on
        val masked = maskLiterals(rest)
        var depth = 0; var close = -1; var i = open
        while (i < rest.length && close < 0) {
          masked.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        require(close > open,
          s"unbalanced EXPECT condition in pipeline table '$name'")
        val cond = rest.substring(open + 1, close).trim
        var tail = rest.substring(close + 1)
        val act = pipeViolRe.findPrefixMatchOf(tail) match {
          case Some(vm) =>
            tail = tail.substring(vm.end)
            vm.group(1).trim.split("\\s+")(0).toLowerCase
          case None => "warn"
        }
        exps += ((m.get.group(1), cond, act))
        rest = tail.trim
        m = pipeExpectHeadRe.findPrefixMatchOf(rest)
      }
      // optional quarantine landing for the DROP rules' rejects
      val quarantine = rest match {
        case pipeQuarRe(qp, tail2) => rest = tail2.trim; Some(qp)
        case _ => None
      }
      val flow = rest match {
        case pipeCopyRe(dir, fmt, pat) =>
          PipeCopy(dir, Option(fmt).map(_.toLowerCase)
            .getOrElse("parquet"), Option(pat).getOrElse("*"))
        case pipeIncrRe(up, sel) => PipeIncr(up, sel.trim)
        case pipeMatRe(ups, sel) =>
          val ins = ups.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(ins.nonEmpty,
            s"MATERIALIZED FROM needs at least one input in '$name'")
          PipeMat(ins, sel.trim)
        case pipeAggRe(up, keys, aggList) =>
          val items = splitTopLevel(aggList).map {
            case pipeAggItemRe(fn, arg, alias) =>
              (fn.toLowerCase, arg.trim, alias)
            case bad => throw new IllegalArgumentException(
              s"AGG entry must be SUM(expr)|COUNT(*)|COUNT(expr) AS " +
                s"name, got: $bad")
          }
          PipeAgg(up,
            keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq, items)
        case pipeSnapCdcRe(up, key, tracked) =>
          PipeSnapCdc(up, key,
            Option(tracked).map(_.split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq))
        case pipeCdcRe(up, key, seqBy, del, tracked) =>
          PipeCdc(up, key, seqBy, Option(del),
            Option(tracked).map(_.split(",").map(_.trim)
              .filter(_.nonEmpty).toSeq))
        case pipeExternalRe() => PipeExternal
        case other => throw new IllegalArgumentException(
          s"pipeline table '$name' has no recognizable flow — " +
            "expected AS COPY FROM / INCREMENTAL FROM / MATERIALIZED " +
            "FROM / APPLY CHANGES FROM [SNAPSHOT] / AGGREGATE FROM / " +
            s"EXTERNAL, got: ${other.take(80)}")
      }
      PipeDef(name, path, exps.toSeq, flow, quarantine)
    case other => throw new IllegalArgumentException(
      "malformed pipeline TABLE definition (want TABLE <name> AT " +
        s"'<path>' ...): ${other.take(80)}")
  }
  private val cloneRe =
    s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$P(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*$$".r
  private val createLikeRe =
    s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s+LIKE\\s+$P\\s*;?\\s*$$".r
  private val insertRe =
    s"(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+$P\\s+(SELECT\\s+.+|TABLE\\s+.+|VALUES\\s+.+|WITH\\s+.+)$$".r
  // INSERT with an explicit column list: absent columns fill from
  // their declared DEFAULT (NULL otherwise), resolution POSITIONAL
  // against the list — the SQL standard's reading
  private val insertColsRe =
    (s"(?is)^\\s*INSERT\\s+(INTO|OVERWRITE)\\s+$P\\s*\\(([\\w\\s,]+)\\)\\s+" +
      "(SELECT\\s+.+|TABLE\\s+.+|VALUES\\s+.+|WITH\\s+.+)$").r
  private val insertOverwriteWhereRe =
    s"(?is)^\\s*INSERT\\s+OVERWRITE\\s+$P\\s+WHERE\\s+(.+?)\\s+(SELECT\\s+.+|TABLE\\s+.+|VALUES\\s+.+|WITH\\s+.+)$$".r
  private val ctasRe =
    s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s+AS\\s+(SELECT\\s+.+|WITH\\s+.+)$$".r
  private val analyzeRe =
    s"(?is)^\\s*ANALYZE\\s+(?:TABLE\\s+)?$P\\s+FOR\\s+COLUMNS\\s+([\\w\\s,]+?)\\s*;?\\s*$$".r
  private val clusterByRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+CLUSTER\\s+BY\\s*\\(([\\w\\s,]+)\\)\\s*;?\\s*$$".r
  private val setStatsRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+SET\\s+STATS\\s+COLUMNS\\s+([\\w\\s,]*?)\\s*;?\\s*$$".r
  private val identityRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+IDENTITY\\s+COLUMN\\s+(\\w+)(?:\\s+START\\s+WITH\\s+(-?\\d+))?(?:\\s+STEP\\s+(\\d+))?\\s*;?\\s*$$".r
  private val addColumnsRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*;?\\s*$$".r
  private val createLocationRe =
    s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s+LOCATION\\s+$P\\s*;?\\s*$$".r
  private val dropTableRe =
    s"(?is)^\\s*DROP\\s+TABLE\\s+$P(\\s+PURGE)?\\s*;?\\s*$$".r
  // Empty-table DDL: the WITH-partitioning alternative is tried first
  // so the greedy column group cannot swallow the PARTITIONED BY
  // clause (column DDL may contain parens — DECIMAL(10,2) — so the
  // group must stay greedy).
  // The TBLPROPERTIES-carrying alternatives are tried before their
  // bare twins for the same greediness reason: the mandatory
  // `TBLPROPERTIES (` anchor stops the greedy column group from
  // swallowing the property list's parens.
  private val createSchemaPartPropsRe =
    (s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s*\\((.+)\\)\\s*(?:USING\\s+\\w+\\s+)?" +
      "PARTITIONED\\s+BY\\s*\\(([\\w\\s,]+)\\)\\s*" +
      "TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val createSchemaPartRe =
    (s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s*\\((.+)\\)\\s*(?:USING\\s+\\w+\\s+)?" +
      "PARTITIONED\\s+BY\\s*\\(([\\w\\s,]+)\\)\\s*;?\\s*$").r
  private val createSchemaPropsRe =
    (s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s*\\((.+)\\)\\s*(?:USING\\s+\\w+\\s+)?" +
      "TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$").r
  private val createSchemaRe =
    s"(?is)^\\s*CREATE\\s+TABLE\\s+$P\\s*\\((.+)\\)\\s*(?:USING\\s+\\w+)?\\s*;?\\s*$$".r
  private val renameTableRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+RENAME\\s+TO\\s+(?:graft\\.)?([\\w.]+)\\s*;?\\s*$$".r
  private val showCreateRe =
    s"(?is)^\\s*SHOW\\s+CREATE\\s+TABLE\\s+$P\\s*;?\\s*$$".r
  private val describeExtRe =
    s"(?is)^\\s*DESCRIBE\\s+EXTENDED\\s+$P\\s*;?\\s*$$".r
  private val showTablesRe =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+graft(?:\\.(\\w+))?\\s*;?\\s*$".r
  private val copyIntoRe =
    (s"(?is)^\\s*COPY\\s+INTO\\s+$P\\s+FROM\\s+'([^']+)'" +
      "(?:\\s+FILEFORMAT\\s*=\\s*(\\w+))?" +
      "(?:\\s+PATTERN\\s*=\\s*'([^']+)')?\\s*;?\\s*$$").r
  private val convertRe =
    s"(?is)^\\s*CONVERT\\s+TO\\s+GRAFT\\s+$P\\s*;?\\s*$$".r
  private val setPropsRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*$$".r
  private val unsetPropsRe =
    s"(?is)^\\s*ALTER\\s+TABLE\\s+$P\\s+UNSET\\s+TBLPROPERTIES\\s*(?:IF\\s+EXISTS\\s+)?\\((.+)\\)\\s*;?\\s*$$".r
  private val showPropsRe =
    s"(?is)^\\s*SHOW\\s+TBLPROPERTIES\\s+$P\\s*;?\\s*$$".r
  private val generateRe =
    s"(?is)^\\s*GENERATE\\s+(\\w+)\\s+FOR\\s+TABLE\\s+$P\\s*;?\\s*$$".r

  /** Recognize a graft verb; None delegates to Spark's parser. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case describeHistoryRe(path) => Some(GraftDescribeHistoryCommand(path))
    case describeDetailRe(path) => Some(GraftDescribeDetailCommand(path))
    case showPartitionsRe(path) => Some(GraftShowPartitionsCommand(path))
    case restoreVersionRe(path, v) =>
      Some(GraftRestoreCommand(path, Some(v.toLong), None))
    case restoreTimestampRe(path, ts) =>
      Some(GraftRestoreCommand(path, None, Some(ts)))
    case vacuumRe(path, keep, unit, dry) =>
      Some(GraftVacuumCommand(path, Option(keep).map(_.toInt).getOrElse(1),
        dryRun = dry != null,
        hours = Option(unit).exists(_.equalsIgnoreCase("HOURS"))))
    case identityRe(path, colName, start, step) =>
      Some(GraftAlterCommand(path, "identity",
        Seq(colName, Option(start).getOrElse("1"),
          Option(step).getOrElse("1"))))
    case setNotNullRe(path, colName, verb) =>
      Some(GraftAlterCommand(path,
        if (verb.equalsIgnoreCase("SET")) "set_not_null" else "drop_not_null",
        Seq(colName)))
    case setDefaultRe(path, colName, exprText) =>
      Some(GraftAlterCommand(path, "set_default", Seq(colName, exprText)))
    case dropDefaultRe(path, colName) =>
      Some(GraftAlterCommand(path, "drop_default", Seq(colName)))
    case optimizeRe(path, n, zcols, where) =>
      Some(GraftOptimizeCommand(path, Option(n).map(_.toInt),
        Option(zcols).map(_.split(",").map(_.trim).toSeq.filter(_.nonEmpty))
          .getOrElse(Nil), Option(where)))
    // an absent WHERE is SQL's all-rows form (DELETE = truncate)
    case deleteRe(path, cond) =>
      Some(GraftDeleteCommand(path, Option(cond).getOrElse("true")))
    case UpdateStmt(path, setPairs, cond) =>
      Some(GraftUpdateCommand(path, setPairs, cond))
    case mergeHeadRe(evo, path, alias, tail) =>
      val (source, on, clauses) = splitMergeTail(tail)
      Some(parseMerge(path, Option(alias), source, on,
        clauses, schemaEvolution = evo != null))
    case ApplyChangesStmt(evolve, path, source, key, seqCol, delWhen,
        truncWhen, scdType, tracked, at) =>
      Some(GraftApplyChangesCommand(path, source.trim, key, seqCol,
        delWhen.map(_.trim),
        scdType.map(_.toInt).getOrElse(1),
        tracked.map(_.split(",").map(_.trim).toSeq
          .filter(_.nonEmpty)).getOrElse(Nil),
        at.map(_.toLong),
        truncateWhen = truncWhen.map(_.trim),
        schemaEvolution = evolve))
    case shredRe(path, vCol, pairsRaw, rangeOn, parts) =>
      val pairs = shredPairRe.findAllMatchIn(pairsRaw)
        .map(m => m.group(1) -> m.group(2)).toSeq
      // loud refusal on malformed entries: stripping the matched
      // pairs must leave only separators — a bare-word type or an
      // unquoted path would silently drop otherwise
      val residue = shredPairRe.replaceAllIn(pairsRaw, "")
        .replaceAll("[,\\s]", "")
      require(pairs.nonEmpty && residue.isEmpty,
        s"SHRED VARIANT ON expects ('<path>' '<type>', ...) pairs, " +
          s"got: $pairsRaw")
      Some(GraftShredCommand(path, vCol, pairs, Option(rangeOn),
        Option(parts).map(_.toInt)))
    case renameColRe(path, from, to) =>
      Some(GraftAlterCommand(path, "rename", Seq(from, to)))
    case dropColRe(path, name) =>
      Some(GraftAlterCommand(path, "drop_column", Seq(name)))
    case addConstraintRe(path, name, check) =>
      Some(GraftAlterCommand(path, "add_constraint", Seq(name, check.trim)))
    case addExpectationRe(path, name, cond, action) =>
      val act = Option(action)
        .map(_.trim.split("\\s+")(0).toLowerCase).getOrElse("warn")
      Some(GraftAlterCommand(path, "add_expectation",
        Seq(name, cond.trim, act)))
    case dropExpectationRe(path, name) =>
      Some(GraftAlterCommand(path, "drop_expectation", Seq(name)))
    case createPipelineRe(name, eventLog, body) =>
      val defs = splitPipeDefs(body).map(parsePipeDef)
      require(defs.nonEmpty, "CREATE PIPELINE needs at least one TABLE")
      Some(GraftCreatePipelineCommand(name, Option(eventLog), defs,
        rawSql = sqlText))
    case refreshPipelineRe(name, full, fullTables, run) =>
      val tables = Option(fullTables).map(_.split(",")
        .map(_.trim).filter(_.nonEmpty).toSeq)
      // an empty-but-PRESENT TABLES list must not silently widen to
      // "rebuild everything" (the no-TABLES default) — refuse
      require(tables.forall(_.nonEmpty),
        "FULL TABLES (...) names no tables — omit the TABLES clause " +
          "to rebuild every derived table, or name at least one")
      Some(GraftRefreshPipelineCommand(name, Option(run).map(_.toLong),
        full = full != null, fullTables = tables.getOrElse(Nil)))
    case describePipelineExtRe(name) =>
      Some(GraftDescribePipelineCommand(name, extended = true))
    case describePipelineRe(name) =>
      Some(GraftDescribePipelineCommand(name))
    case restorePipelineRe(path) =>
      Some(GraftRestorePipelineCommand(path))
    case vacuumPipelineEventsRe(name, keep) =>
      Some(GraftVacuumPipelineEventsCommand(name, keep.toLong))
    case startPipelineRe(name, ckpt) =>
      Some(GraftStartPipelineCommand(name, ckpt))
    case stopPipelineRe(name) =>
      Some(GraftStopPipelineCommand(name))
    case dropPipelineRe(name) =>
      Some(GraftDropPipelineCommand(name))
    case showPipelinesRe() =>
      Some(GraftShowPipelinesCommand())
    case addColumnsRe(path, colsDdl) =>
      Some(GraftAlterCommand(path, "add_columns", Seq(colsDdl.trim)))
    case dropConstraintRe(path, name) =>
      Some(GraftAlterCommand(path, "drop_constraint", Seq(name)))
    case cloneRe(dst, kind, src, v) =>
      Some(GraftCloneCommand(dst, src, Option(v).map(_.toLong),
        deep = kind.equalsIgnoreCase("DEEP")))
    case createLikeRe(dst, src) => Some(GraftCreateLikeCommand(dst, src))
    case createLocationRe(name, location) =>
      Some(GraftRegisterTableCommand(name, location))
    case createSchemaPartPropsRe(name, cols, parts, props) =>
      Some(GraftCreateTableCommand(name, cols,
        parts.split(",").map(_.trim).toSeq.filter(_.nonEmpty),
        parsePropList(props)))
    case createSchemaPartRe(name, cols, parts) =>
      Some(GraftCreateTableCommand(name, cols,
        parts.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
    case createSchemaPropsRe(name, cols, props)
        if !cols.trim.toUpperCase.startsWith("SELECT") =>
      Some(GraftCreateTableCommand(name, cols, Nil, parsePropList(props)))
    case createSchemaRe(name, cols)
        if !cols.trim.toUpperCase.startsWith("SELECT") =>
      Some(GraftCreateTableCommand(name, cols, Nil))
    case renameTableRe(name, newName) =>
      Some(GraftRenameTableCommand(name, newName))
    case showCreateRe(name) => Some(GraftShowCreateCommand(name))
    case describeExtRe(name) => Some(GraftDescribeExtendedCommand(name))
    case dropTableRe(name, purge) =>
      Some(GraftDropTableCommand(name, purge != null))
    case showTablesRe(db) =>
      Some(GraftShowTablesCommand(Option(db).getOrElse("default")))
    case copyIntoRe(path, dir, fmt, pattern) =>
      Some(GraftCopyIntoCommand(path, dir,
        Option(fmt).getOrElse("parquet"),
        Option(pattern).getOrElse("*")))
    case convertRe(path) => Some(GraftConvertCommand(path))
    case setPropsRe(path, kvs) =>
      Some(GraftSetPropertiesCommand(path, parsePropList(kvs)))
    case unsetPropsRe(path, keys) =>
      Some(GraftUnsetPropertiesCommand(path,
        splitTopLevel(keys).map(unquoteProp)))
    case showPropsRe(path) => Some(GraftShowPropertiesCommand(path))
    case generateRe(mode, path) => Some(GraftGenerateCommand(path, mode))
    case insertOverwriteWhereRe(path, cond, query) =>
      Some(GraftInsertCommand(path, query.trim, overwrite = true,
        replaceCond = Some(cond.trim)))
    case insertColsRe(mode, path, cols, query) =>
      Some(GraftInsertCommand(path, query.trim,
        overwrite = mode.equalsIgnoreCase("OVERWRITE"),
        cols = cols.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
    case insertRe(mode, path, query) =>
      Some(GraftInsertCommand(path, query.trim,
        overwrite = mode.equalsIgnoreCase("OVERWRITE")))
    case ctasRe(path, query) =>
      Some(GraftInsertCommand(path, query.trim, overwrite = true,
        mustBeNew = true))
    case analyzeRe(path, cols) =>
      Some(GraftAlterCommand(path, "analyze",
        cols.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
    case setStatsRe(path, cols) =>
      Some(GraftAlterCommand(path, "set_stats",
        cols.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
    case clusterByRe(path, cols) =>
      Some(GraftAlterCommand(path, "cluster_by",
        cols.split(",").map(_.trim).toSeq.filter(_.nonEmpty)))
    case _ => None
  }

  /** Normalize CATALOG-NAME spellings (`graft.db.t` / `graft.t` —
    * bare identifiers, not the quoted-path sugar) in verb TARGET
    * position into `'graft:db.t'` path-spec targets the verb regexes
    * capture like any path;
    * [[graft.catalog.GraftCatalog.resolvePathSpec]] maps them to
    * storage paths at command run time. POSITIONAL on purpose: only a
    * name directly following a verb keyword rewrites, so names in a
    * verb's inner QUERY (`INSERT INTO graft.dst SELECT ... FROM
    * graft.src`) stay bare for the injected analyzer rule to resolve
    * — one resolution path for reads everywhere. Never inside string
    * literals; never when another dot follows (a qualified column
    * reference — alias the table instead).
    */
  private val targetKeywords = Seq(
    "MERGE\\s+INTO", "MERGE\\s+WITH\\s+SCHEMA\\s+EVOLUTION\\s+INTO",
    "APPLY\\s+CHANGES\\s+INTO",
    "INSERT\\s+INTO", "INSERT\\s+OVERWRITE", "UPDATE",
    "DELETE\\s+FROM", "OPTIMIZE", "RESTORE(?:\\s+TABLE)?", "VACUUM",
    "DESCRIBE\\s+HISTORY", "DESCRIBE\\s+DETAIL", "SHOW\\s+PARTITIONS",
    "DESCRIBE\\s+EXTENDED", "SHOW\\s+CREATE\\s+TABLE",
    "ALTER\\s+TABLE", "CREATE\\s+TABLE", "ANALYZE(?:\\s+TABLE)?",
    "SHALLOW\\s+CLONE", "DEEP\\s+CLONE", "DROP\\s+TABLE", "COPY\\s+INTO",
    "SHOW\\s+TBLPROPERTIES", "GENERATE\\s+\\w+\\s+FOR\\s+TABLE",
    // the LIKE schema-template verb: `CREATE TABLE x LIKE graft.db.t`
    // (a string-pattern LIKE never precedes a bare graft.<ident>, and
    // quoted literals are protected by mapOutsideQuotes)
    "LIKE")

  def rewriteNames(sqlText: String): String = {
    if (!sqlText.toLowerCase.contains("graft.")) return sqlText
    mapOutsideQuotes(sqlText) { seg =>
      targetKeywords.foldLeft(seg) { (t, kw) =>
        t.replaceAll(
          s"(?i)\\b($kw)\\s+graft\\.(\\w+(?:\\.\\w+)?)(?![\\w.])",
          "$1 'graft:$2'")
      }
    }
  }

  /** Rewrite the read sugar `graft.'<path>' [VERSION AS OF n |
    * TIMESTAMP AS OF 'ts']` into the injected table functions anywhere
    * in a statement; everything else passes through untouched.
    */
  def rewriteReads(sqlText: String): String = {
    if (!sqlText.toLowerCase.contains("graft.'")) return sqlText
    // Scanner, not global replaceAll: `graft.'...'` inside an ORDINARY
    // string literal is data and must pass through untouched, so the
    // sugar only triggers when the quote it opens is the sugar's own.
    val ts = s"(?is)^graft\\.$P\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'".r
    val v = s"(?is)^graft\\.$P\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)".r
    val bare = s"(?is)^graft\\.$P".r
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val n = sqlText.length
    while (i < n) {
      val c = sqlText.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < n) { sb += c; sb += sqlText.charAt(i + 1); i += 2 }
        else { sb += c; if (c == '\'') inStr = false; i += 1 }
      }
      else if (sqlText.regionMatches(true, i, "graft.'", 0, 7)) {
        val rest = sqlText.substring(i)
        val hit = ts.findPrefixMatchOf(rest).map(m =>
            (s"graft_table_at('${m.group(1)}', '${m.group(2)}')", m.end))
          .orElse(v.findPrefixMatchOf(rest).map(m =>
            (s"graft_table('${m.group(1)}', ${m.group(2)})", m.end)))
          .orElse(bare.findPrefixMatchOf(rest).map(m =>
            (s"graft_table('${m.group(1)}')", m.end)))
        hit match {
          case Some((repl, len)) => sb ++= repl; i += len
          case None => sb += c; i += 1
        }
      } else { sb += c; if (c == '\'') inStr = true; i += 1 }
    }
    sb.toString
  }

  /** Split on top-level commas (never inside parens or quotes). */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var esc = false
    s.foreach { c =>
      if (esc) { cur += c; esc = false }
      else if (inStr) {
        cur += c
        if (c == '\\') esc = true else if (c == '\'') inStr = false
      }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def parseAssign(a: String): (String, String) = {
    val i = a.indexOf('=')
    require(i > 0, s"malformed SET assignment: '$a'")
    (a.take(i).trim, a.drop(i + 1).trim)
  }

  /** UPDATE's SET…WHERE split over the LITERAL-MASKED statement (a
    * SET value containing the word ` WHERE ` is data, not a boundary —
    * fuzz finding); groups slice the ORIGINAL text. */
  /** APPLY CHANGES matched over the LITERAL-MASKED text (clause-head
    * words inside a string literal — `DELETE WHEN op = 'STORED AS'` —
    * are data, not boundaries), groups sliced from the ORIGINAL. */
  private object ApplyChangesStmt {
    def unapply(sql: String): Option[(Boolean, String, String, String,
        String, Option[String], Option[String], Option[String],
        Option[String], Option[String])] = {
      val masked = maskLiterals(sql)
      applyChangesRe.findFirstMatchIn(masked).map { m =>
        def orig(g: Int): Option[String] =
          Option(m.group(g)).map(_ => sql.substring(m.start(g), m.end(g)))
        (m.group(1) != null, orig(2).get, orig(3).get, orig(4).get,
          orig(5).get, orig(6), orig(7), orig(8), orig(9), orig(10))
      }
    }
  }

  private object UpdateStmt {
    def unapply(sql: String): Option[(String, Seq[(String, String)], String)] = {
      val masked = maskLiterals(sql)
      updateRe.findFirstMatchIn(masked).map { m =>
        def orig(g: Int): Option[String] =
          Option(m.group(g)).map(_ => sql.substring(m.start(g), m.end(g)))
        (orig(1).get, splitTopLevel(orig(2).get).map(parseAssign),
          orig(3).getOrElse("true"))
      }
    }
  }

  /** Same-length copy of `s` with string-literal CONTENTS blanked
    * (quotes kept): regex/keyword scans over the mask never see
    * clause keywords inside data, and every match position slices the
    * ORIGINAL text 1:1. Spark's default literal syntax
    * (escapedStringLiterals=false) treats backslash as an escape, so
    * `\'` stays INSIDE the literal — both chars are blanked; `''`
    * doubling composes as two adjacent literal spans. */
  private[plans] def maskLiterals(s: String): String = {
    val sb = new StringBuilder(s)
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) {
          sb.setCharAt(i, ' '); sb.setCharAt(i + 1, ' '); i += 1
        } else if (c == '\'') inStr = false
        else sb.setCharAt(i, ' ')
      }
      else if (c == '\'') inStr = true
      i += 1
    }
    sb.toString
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** First index ≥ `from` where word `kw` occurs OUTSIDE parens and
    * string literals (case-insensitive, word-bounded); -1 if none. */
  private def topLevelKeyword(masked: String, kw: String,
                              from: Int = 0): Int = {
    var depth = 0
    var i = from
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && masked.regionMatches(true, i, kw, 0, kw.length)
          && (i == 0 || !isWordChar(masked.charAt(i - 1)))
          && (i + kw.length == masked.length ||
            !isWordChar(masked.charAt(i + kw.length))))
        return i
      i += 1
    }
    -1
  }

  /** Split a MERGE statement's post-USING tail into (source, on,
    * clauses): the ON keyword is the first TOP-LEVEL one (a JOIN ...
    * ON inside a USING subquery stays inside its parens), and the
    * clause list starts at the first top-level `WHEN [NOT] MATCHED`
    * head (a `CASE WHEN ... THEN` inside the ON residual, or
    * clause-head TEXT inside a string literal, never splits). */
  private def splitMergeTail(tail: String): (String, String, String) = {
    val masked = maskLiterals(tail)
    val onIdx = topLevelKeyword(masked, "ON")
    require(onIdx > 0, "MERGE needs an ON condition after USING")
    val afterOnStart = onIdx + 2
    val headRe = "(?is)^WHEN\\s+(?:NOT\\s+)?MATCHED\\b".r
    var whenIdx = -1
    var probe = topLevelKeyword(masked, "WHEN", afterOnStart)
    while (whenIdx < 0 && probe >= 0) {
      if (headRe.findFirstIn(masked.substring(probe)).isDefined)
        whenIdx = probe
      else probe = topLevelKeyword(masked, "WHEN", probe + 4)
    }
    require(whenIdx > afterOnStart,
      "MERGE needs at least one WHEN [NOT] MATCHED clause")
    val clauses = tail.substring(whenIdx).trim
      .replaceAll(";\\s*$", "").trim
    (tail.substring(0, onIdx).trim,
      tail.substring(afterOnStart, whenIdx).trim, clauses)
  }

  /** Split on top-level `AND` keywords (never inside parens or
    * quotes) — the MERGE ON condition's conjunct structure. */
  private[plans] def splitTopLevelAnd(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < s.length) { cur += c; cur += s.charAt(i + 1); i += 2 }
        else { cur += c; if (c == '\'') inStr = false; i += 1 }
      }
      else if (c == '\'') { inStr = true; cur += c; i += 1 }
      else if (c == '(') { depth += 1; cur += c; i += 1 }
      else if (c == ')') { depth -= 1; cur += c; i += 1 }
      else if (depth == 0 && (c == 'a' || c == 'A') && i + 3 <= s.length &&
          s.substring(i, i + 3).equalsIgnoreCase("and") &&
          (i == 0 || !isWordChar(s.charAt(i - 1))) &&
          (i + 3 == s.length || !isWordChar(s.charAt(i + 3)))) {
        out += cur.toString; cur.clear(); i += 3
      } else { cur += c; i += 1 }
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** `'key' = 'value', ...` (keys/values single-quoted à la Spark, or
    * bare words) → ordered pairs. splitTopLevel keeps commas inside
    * quoted values intact; the assignment `=` is located OUTSIDE
    * quotes so keys/values may contain `=` themselves. */
  private def parsePropList(kvs: String): Seq[(String, String)] =
    splitTopLevel(kvs).map { kv =>
      var i = 0
      var inStr = false
      var eq = -1
      while (i < kv.length && eq < 0) {
        val c = kv.charAt(i)
        if (inStr && c == '\\') i += 1
        else if (c == '\'') inStr = !inStr
        else if (c == '=' && !inStr) eq = i
        i += 1
      }
      require(eq > 0, s"malformed TBLPROPERTIES entry: '$kv'")
      (unquoteProp(kv.take(eq)), unquoteProp(kv.drop(eq + 1)))
    }

  private def unquoteProp(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1)
    else t
  }

  // The clause-boundary lookahead requires a FULL clause head —
  // `WHEN [NOT] MATCHED [AND ...] THEN <action keyword>` — not just
  // `WHEN ... MATCHED`, so an UPDATE SET payload containing
  // `CASE WHEN matched THEN 1 ...` (a column literally named
  // `matched`) is not truncated mid-expression: the CASE arm's THEN
  // is followed by a value, never by UPDATE SET/DELETE/INSERT.
  private val whenRe =
    ("(?is)WHEN\\s+(NOT\\s+)?MATCHED(?:\\s+BY\\s+(SOURCE|TARGET))?" +
      "(?:\\s+AND\\s+(.+?))?\\s+THEN\\s+" +
      "(UPDATE\\s+SET\\s+.+?|DELETE|INSERT\\s+\\*|" +
      "INSERT\\s*\\(.+?\\)\\s*VALUES\\s*\\(.+?\\))\\s*" +
      "(?=WHEN\\s+(?:NOT\\s+)?MATCHED(?:\\s+BY\\s+\\w+)?" +
      "(?:\\s+AND\\s+.+?)?\\s+THEN\\s+" +
      "(?:UPDATE\\s+SET|DELETE|INSERT)|$)").r

  private def parseMerge(path: String, targetAlias: Option[String],
                         source: String, on: String,
                         clauses: String,
                         schemaEvolution: Boolean = false): LogicalPlan = {
    // ON: a conjunction of top-level AND terms. Each term is either an
    // equi-key (`k`, `t.k = s.k`, `k = k` — the shared column name on
    // both sides) or a RESIDUAL predicate (`t.date > s.start`,
    // `s.amount >= 100`, ...) applied in match-state resolution —
    // Delta's arbitrary-ON surface over the engine's keyed carry. At
    // least one equi-key term is required (a pure theta merge has no
    // key to address rows by).
    val onIdent = "(?s)^\\s*(?:(\\w+)\\.)?(\\w+)\\s*$".r
    val onEq =
      "(?s)^\\s*(?:(\\w+)\\.)?(\\w+)\\s*=\\s*(?:(\\w+)\\.)?(\\w+)\\s*$".r
    val terms = splitTopLevelAnd(on)
    val (keyTerms, residualTerms) = terms.partition {
      case onIdent(_, _)       => true
      case onEq(_, k1, _, k2)  => k1 == k2
      case _                   => false
    }
    val keys = keyTerms.map {
      case onIdent(_, k)    => k
      case onEq(_, k, _, _) => k
    }.distinct
    require(keys.nonEmpty,
      s"MERGE ON needs at least one equi-key conjunct equating one " +
        s"shared column name (`t.k = s.k` or `k`), got '$on'")
    // source: bare table/view name or parenthesized subquery (run-time
    // resolution via the session — full Spark SQL inside)
    val (srcSql, srcAlias) = {
      // (?i): `as`/`As` alias keywords are as legal as `AS` (first
      // fuzz-spec finding — the statement-level regexes are (?is) but
      // these two were case-sensitive, refusing lowercase aliases)
      val sub = "(?is)^\\((.+)\\)(?:\\s+(?:AS\\s+)?(\\w+))?\\s*$".r
      val tbl = "(?is)^([\\w.]+)(?:\\s+(?:AS\\s+)?(\\w+))?\\s*$".r
      source match {
        case sub(q, a) => (Left(q.trim): Either[String, String], Option(a))
        case tbl(t, a) => (Right(t): Either[String, String], Option(a))
        case other => throw new IllegalArgumentException(
          s"MERGE USING expects a table name or (subquery), got '$other'")
      }
    } match { case (e, a) => (e, a) }
    // Clauses in STATEMENT order — SQL/Delta first-clause-wins,
    // evaluated exactly as written by ManifestTable.mergeMulti (any
    // number of clauses per kind since round 13). A clause with no
    // condition must be the LAST on its match side (anything after it
    // is unreachable) — Delta's own rule.
    final case class Clause(not: Boolean, bySource: Boolean,
                            cond: Option[String],
                            action: String, payload: String)
    // the clause splitter scans the LITERAL-MASKED text (clause-head
    // words inside a string literal are data, not boundaries — fuzz
    // finding) and slices conditions/payloads from the ORIGINAL
    val maskedClauses = GraftSqlStatements.maskLiterals(clauses)
    def orig(m: scala.util.matching.Regex.Match, g: Int): Option[String] =
      Option(m.group(g)).map(_ => clauses.substring(m.start(g), m.end(g)))
    val parsed = whenRe.findAllMatchIn(maskedClauses).map { m =>
      val action = orig(m, 4).get.trim
      val up = GraftSqlStatements.maskLiterals(action)
        .toUpperCase.replaceAll("\\s+", " ").trim
      val kind =
        if (up.startsWith("UPDATE SET")) "UPDATE"
        else if (up == "DELETE") "DELETE"
        else "INSERT"
      val by = Option(m.group(2)).map(_.toUpperCase)
      val not = m.group(1) != null
      require(by.isEmpty || not,
        "BY SOURCE/TARGET qualifies NOT MATCHED clauses only")
      Clause(not, by.contains("SOURCE"),
        orig(m, 3).map(_.trim), kind, action)
    }.toSeq
    require(parsed.nonEmpty, "MERGE needs at least one WHEN clause")
    parsed.foreach { c =>
      val wantInsert = c.not && !c.bySource
      require(wantInsert == (c.action == "INSERT"),
        s"MERGE clause ${c.action} on the wrong match side " +
          "(UPDATE/DELETE need MATCHED or NOT MATCHED BY SOURCE, " +
          "INSERT needs NOT MATCHED [BY TARGET])") }
    // Delta's reachability rule, per match side (mergeMulti re-checks;
    // failing here reports BEFORE the source query runs)
    Seq(parsed.filter(!_.not), parsed.filter(c => c.not && !c.bySource),
        parsed.filter(_.bySource)).foreach(_.dropRight(1).foreach(c =>
      require(c.cond.isDefined,
        s"WHEN ${if (c.not) "NOT " else ""}MATCHED" +
          s"${if (c.bySource) " BY SOURCE" else ""} THEN ${c.action} " +
          "without a condition must be the last clause on its match " +
          "side — later clauses are unreachable")))
    val rw: String => String = rewriteRefs(_, targetAlias, srcAlias)
    // UPDATE SET payload: `*` keeps the schema-contract image; an
    // assignment list compiles per-column expressions
    def updateSetOf(c: Clause): Seq[(String, String)] = {
      val body = c.payload.replaceFirst("(?is)^UPDATE\\s+SET\\s*", "").trim
      if (body == "*") Nil
      else splitTopLevel(body).map(parseAssign).map { case (l, r) =>
        (stripQualifier(l, targetAlias, srcAlias), rw(r))
      }
    }
    def insertValuesOf(c: Clause): Seq[(String, String)] = {
      if (c.payload.toUpperCase.replaceAll("\\s+", " ") == "INSERT *") Nil
      else {
        val ivRe = "(?is)^INSERT\\s*\\((.+?)\\)\\s*VALUES\\s*\\((.+)\\)\\s*$".r
        c.payload match {
          case ivRe(cols, vals) =>
            val cs = splitTopLevel(cols)
              .map(stripQualifier(_, targetAlias, srcAlias))
            val vs = splitTopLevel(vals).map(rw)
            require(cs.size == vs.size,
              s"INSERT column list (${cs.size}) and VALUES list " +
                s"(${vs.size}) differ in length")
            cs.zip(vs)
          case other => throw new IllegalArgumentException(
            s"malformed MERGE INSERT clause: '$other'")
        }
      }
    }
    // Clause lists in STATEMENT order — mergeMulti evaluates them
    // first-clause-wins, exactly SQL's reading; any number of clauses
    // per kind (Delta's full surface since round 13, including
    // WHEN NOT MATCHED BY SOURCE)
    val matchedSpecs = parsed.filter(!_.not).map { c =>
      (c.action, c.cond.map(rw),
        if (c.action == "UPDATE") updateSetOf(c) else Nil)
    }
    val insertSpecs = parsed.filter(c => c.not && !c.bySource).map { c =>
      (c.cond.map(rw), insertValuesOf(c))
    }
    val bySourceSpecs = parsed.filter(_.bySource).map { c =>
      (c.action, c.cond.map(rw),
        if (c.action == "UPDATE") updateSetOf(c) else Nil)
    }
    // residual ON conjuncts run over the resolved frame: the same
    // target/source rewriting clause conditions get
    val residual =
      if (residualTerms.isEmpty) None
      else Some(residualTerms.map(t => s"(${rw(t)})").mkString(" AND "))
    GraftMergeCommand(path, srcSql, keys, matchedSpecs, insertSpecs,
      bySourceSpecs, schemaEvolution, residual)
  }

  /** Strip a `target.`/alias qualifier off an assignment LHS. An LHS
    * always names a TARGET column, so the declared alias strips; the
    * literal `target.` convenience spelling strips only while it is
    * unclaimed (same ownership rule as [[rewriteRefs]]). */
  private def stripQualifier(name: String, targetAlias: Option[String],
                             srcAlias: Option[String] = None): String = {
    val t = java.util.regex.Pattern.quote(targetAlias.getOrElse("target"))
    val stripped = name.trim.replaceAll(s"(?i)^$t\\.", "")
    if (literalTargetFree(targetAlias, srcAlias))
      stripped.replaceAll("(?i)^target\\.", "")
    else stripped
  }

  /** The literal `target.` spelling is a CONVENIENCE, not a binding: it
    * reads as "the merge target" only while no declared name CLAIMS it.
    * A source aliased `target` (USING s AS target) owns the prefix —
    * rewriting it to `_b_` would silently resolve source references
    * against the wrong side, so the convenience spelling turns off on
    * that collision. It stays ON alongside an explicit target alias
    * (users mix `t.col` and `target.col` freely — the pre-r14
    * behavior every existing query relies on); a source STRUCT column
    * literally named `target` therefore needs the source aliased to
    * disambiguate, which is also Delta's answer. */
  private def literalTargetFree(targetAlias: Option[String],
                                srcAlias: Option[String]): Boolean =
    !srcAlias.exists(_.equalsIgnoreCase("target"))

  /** Clause conditions run over [[ManifestTable.mergeConditional]]'s
    * resolved frame: source columns bare, target columns `_b_<col>`.
    * Users write `target.<col>` (or the declared aliases); rewrite both
    * spellings — OUTSIDE string literals only (a literal `'target.x'`
    * is data, not a reference) — except where a declared name claims
    * the `target.` prefix (see [[literalTargetFree]]).
    */
  private def rewriteRefs(c: String, targetAlias: Option[String],
                          srcAlias: Option[String]): String =
    mapOutsideQuotes(c) { seg =>
      val t = java.util.regex.Pattern.quote(targetAlias.getOrElse("target"))
      val withDeclared = seg.replaceAll(s"(?i)\\b$t\\.", "_b_")
      val withTarget =
        if (literalTargetFree(targetAlias, srcAlias))
          withDeclared.replaceAll("(?i)\\btarget\\.", "_b_")
        else withDeclared
      srcAlias.fold(withTarget)(s =>
        withTarget.replaceAll(
          s"(?i)\\b${java.util.regex.Pattern.quote(s)}\\.", ""))
    }

  /** Apply `f` to the spans of `s` OUTSIDE single-quoted string
    * literals (SQL quote-doubling composes naturally: the closing and
    * reopening quotes are two adjacent literal spans). */
  private[plans] def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inStr = false
    var esc = false
    s.foreach { ch =>
      if (esc) { out += ch; esc = false }
      else if (inStr) {
        out += ch
        if (ch == '\\') esc = true else if (ch == '\'') inStr = false
      }
      else if (ch == '\'') {
        out ++= f(seg.toString); seg.clear(); out += ch; inStr = true
      } else seg += ch
    }
    out ++= f(seg.toString)
    out.toString
  }
}

/** DESCRIBE HISTORY '<path>' — the operator console row set, straight
  * from [[ManifestTable.history]] (driver-side O(versions), like the
  * operator it fronts). */
case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    ManifestTable.historySchema.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(session: SparkSession): Seq[Row] =
    ManifestTable.history(session,
      GraftSqlCommands.rp(session, path)).collect().toSeq
}

case class GraftRestoreCommand(path: String, version: Option[Long],
                               timestamp: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    val target = version.getOrElse {
      val ms = GraftSqlCommands.parseTimestampMillis(timestamp.get)
      ManifestTable.versionAsOfTimestamp(session, tp, ms).getOrElse(
        throw new IllegalArgumentException(
          s"no committed version at or before '${timestamp.get}' at $tp"))
    }
    Seq(Row(ManifestTable.restore(session, tp, target)))
  }
}

case class GraftVacuumCommand(path: String, keep: Int,
                              dryRun: Boolean = false,
                              hours: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("swept_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    ((hours, dryRun) match {
      case (true, true)   => ManifestTable.vacuumHoursDryRun(session, tp, keep)._1
      case (true, false)  => ManifestTable.vacuumHours(session, tp, keep)
      case (false, true)  => ManifestTable.vacuumDryRun(session, tp, keep)._1
      case (false, false) => ManifestTable.vacuum(session, tp, keep = keep)
    }).map(Row(_))
  }
}

/** COPY INTO '<path>' FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
  * [PATTERN = '<glob>'] — idempotent file-level ingest
  * ([[ManifestTable.copyInto]]): files already in the table's ledger
  * are skipped, new files land as one append commit. Returns
  * (version, files_copied). */
case class GraftCopyIntoCommand(path: String, sourceDir: String,
                                format: String, pattern: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_copied", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = ManifestTable.copyInto(session,
      GraftSqlCommands.rp(session, path), sourceDir, format, pattern)
    Seq(Row(v, n.toLong))
  }
}

/** CONVERT TO GRAFT '<path>' — adopt a plain-parquet directory as a
  * managed table IN PLACE ([[ManifestTable.convertInPlace]]): one
  * manifest write referencing the existing files, zero data moved. */
case class GraftConvertCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.convertInPlace(session,
      GraftSqlCommands.rp(session, path))))
}

/** SHOW PARTITIONS '<path>' — distinct partition-value tuples of the
  * current version, straight from the manifest's file paths (driver
  * metadata, zero data scan); one `partition` string per row in the
  * k=v/k=v dir spelling, logical column names. Empty result for flat
  * tables. */
case class GraftShowPartitionsCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    ManifestTable.showPartitions(session,
      GraftSqlCommands.rp(session, path)).map(Row(_))
}

/** DESCRIBE DETAIL '<path>' — the one-row table summary. */
case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    ManifestTable.describeDetailSchema.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(session: SparkSession): Seq[Row] =
    ManifestTable.describeDetail(session,
      GraftSqlCommands.rp(session, path)).collect().toSeq
}

case class GraftOptimizeCommand(path: String, targetFiles: Option[Int],
                                zorderCols: Seq[String],
                                where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    val v = (zorderCols, where) match {
      case (Nil, Some(cond)) =>
        // partition-scoped bin-pack: only matching partitions rewrite
        ManifestTable.compactWhere(session, tp, expr(cond),
          targetFiles.getOrElse(1))
      case (_, Some(_)) => throw new IllegalArgumentException(
        "OPTIMIZE ... WHERE composes with bin-packing only (no ZORDER)")
      case (zc, None) => zc match {
      case Nil =>
        val clustered = ManifestTable.currentVersion(session, tp)
          .exists(cv => ManifestTable
            .resolveState(session, tp, cv).clusterCols.nonEmpty)
        if (clustered)
          // Delta semantics: OPTIMIZE on a clustered table runs the
          // INCREMENTAL recluster, not a bin-pack
          ManifestTable.optimizeClustered(session, tp,
            targetFiles.getOrElse(0))
        else targetFiles match {
          case Some(n) => ManifestTable.compact(session, tp, targetFiles = n)
          case None => // Delta's default OPTIMIZE shape: bin-pack to ~128 MiB
            ManifestTable.compactToFileSize(session, tp, 128L << 20)
        }
      case Seq(c1, c2) =>
        ManifestTable.optimizeZOrder(session, tp, c1, c2,
          targetFiles.getOrElse(currentFileCount(session, tp)))
      case cols =>
        ManifestTable.optimizeZOrderN(session, tp, cols,
          targetFiles.getOrElse(currentFileCount(session, tp)))
      }
    }
    Seq(Row(v))
  }
  private def currentFileCount(session: SparkSession, tp: String): Int = {
    val cur = ManifestTable.currentVersion(session, tp).getOrElse(
      throw new IllegalStateException(s"no committed version at $tp"))
    math.max(1, ManifestTable.manifestFiles(session, tp, cur).size)
  }
}

case class GraftDeleteCommand(path: String, cond: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.deleteWhere(session,
      GraftSqlCommands.rp(session, path), expr(cond))))
}

case class GraftUpdateCommand(path: String, set: Seq[(String, String)],
                              cond: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    // SQL's `SET c = DEFAULT` keyword: the column's declared DEFAULT
    // (a validated constant), NULL where none is declared — the
    // standard's reading. Assignment targets resolve
    // case-INSENSITIVELY like any SQL identifier (canonicalized to
    // the schema's spelling here; unknown names pass through so the
    // engine's own error fires).
    val canon = ManifestTable.read(session, tp).schema.fieldNames
      .map(n => n.toLowerCase -> n).toMap
    val defaults = ManifestTable.columnDefaults(session, tp)
      .map { case (k, v) => k.toLowerCase -> v }
    def rhs(c: String, e: String) =
      if (e.trim.equalsIgnoreCase("DEFAULT"))
        defaults.get(c.toLowerCase).map(expr)
          .getOrElse(org.apache.spark.sql.functions.lit(null))
      else expr(e)
    Seq(Row(ManifestTable.updateWhere(session, tp,
      set.map { case (c, e) =>
        (canon.getOrElse(c.toLowerCase, c), rhs(c, e)) }, expr(cond))))
  }
}

/** ALTER TABLE '<path>' SHRED VARIANT v ON ('<path>' '<type>', ...)
  * — the SQL spelling of [[graft.pipeline.VariantShred.write]]: ONE
  * rewrite commit lands the current snapshot with materialized shred
  * columns, their generated-column declarations, the spec
  * properties, and the stats schema. The rewrite is the honest cost
  * of retrofitting a layout (same class as OPTIMIZE ZORDER); tables
  * built shredded from the start pay nothing extra. Already-shredded
  * tables refuse (declarations are immutable). Returns the committed
  * version.
  */
case class GraftShredCommand(path: String, vCol: String,
                             paths: Seq[(String, String)],
                             rangeLayoutOn: Option[String],
                             rangePartitions: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    val snapshot = graft.pipeline.ManifestTable.read(session, tp)
    Seq(Row(graft.pipeline.VariantShred.write(snapshot, tp, vCol, paths,
      rangeLayoutOn = rangeLayoutOn,
      rangePartitions = rangePartitions.getOrElse(8))))
  }
}

/** APPLY CHANGES INTO '<path>' — DLT's declarative CDC verb over
  * [[graft.pipeline.ApplyChanges]]: FROM a table name or (subquery),
  * KEYS (k), SEQUENCE BY seq ordering, optional APPLY AS DELETE WHEN
  * expression (any Spark boolean expression over the source; under
  * SCD TYPE 1 a delete removes the row, under TYPE 2 it closes the
  * open row with history retained), optional APPLY AS TRUNCATE WHEN
  * (full-table truncate at the highest truncate-flagged sequence —
  * DLT's rule: SCD TYPE 1 only), STORED AS SCD TYPE 1 (default)
  * or 2 (requires TRACK HISTORY ON (cols) for the tracked attributes
  * and AT n for the validity timestamp). Returns the committed
  * version.
  */
case class GraftApplyChangesCommand(path: String, source: String,
                                    key: String, seqCol: String,
                                    deleteWhen: Option[String],
                                    scdType: Int, tracked: Seq[String],
                                    at: Option[Long],
                                    truncateWhen: Option[String] = None,
                                    schemaEvolution: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    require(truncateWhen.isEmpty || scdType == 1,
      "APPLY AS TRUNCATE WHEN is supported for SCD TYPE 1 only " +
        "(DLT's rule — SCD TYPE 2 retains history)")
    require(!schemaEvolution || scdType == 1,
      "WITH SCHEMA EVOLUTION is supported for SCD TYPE 1 only — the " +
        "SCD TYPE 2 tracked-column set is declared, not inferred")
    val sub = "(?is)^\\((.+)\\)\\s*$".r
    val src = source match {
      case sub(q) => session.sql(q.trim)
      case t if t.matches("(?s)[\\w.]+") => session.table(t)
      case other => throw new IllegalArgumentException(
        s"APPLY CHANGES FROM expects a table name or (subquery), got '$other'")
    }
    val version = scdType match {
      case 1 =>
        val (df, delCol) = deleteWhen match {
          case Some(e) =>
            (src.withColumn("_ac_sql_delete", expr(e)),
              Some("_ac_sql_delete"))
          case None => (src, None)
        }
        val (df2, truncCol) = truncateWhen match {
          case Some(e) =>
            (df.withColumn("_ac_sql_truncate", expr(e)),
              Some("_ac_sql_truncate"))
          case None => (df, None)
        }
        graft.pipeline.ApplyChanges.applyScd1(session, tp, key, df2,
          sequenceBy = seqCol, deleteWhen = delCol,
          truncateWhen = truncCol, schemaEvolution = schemaEvolution)
      case 2 =>
        require(tracked.nonEmpty,
          "SCD TYPE 2 needs TRACK HISTORY ON (col, ...) — the tracked " +
            "attribute columns (or ON (*) for every non-key column, " +
            "DLT's default)")
        // TRACK HISTORY ON (*): every business column except the key
        // (and the validity range) tracks — DLT's default spelling
        val trackedCols =
          if (tracked == Seq("*"))
            graft.pipeline.ManifestTable.read(session, tp)
              .schema.fieldNames.filterNot(n =>
                n == key || n == graft.pipeline.Scd2.ValidFrom ||
                  n == graft.pipeline.Scd2.ValidTo ||
                  n == graft.pipeline.ApplyChanges.SeqCol).toSeq
          else tracked
        val ts = at.getOrElse(throw new IllegalArgumentException(
          "SCD TYPE 2 needs AT <n> — the validity timestamp the batch " +
            "opens/closes at"))
        val (df, delCol) = deleteWhen match {
          case Some(e) =>
            (src.withColumn("_ac_sql_delete", expr(e)),
              Some("_ac_sql_delete"))
          case None => (src, None)
        }
        graft.pipeline.ApplyChanges.applyScd2(session, tp, key, df,
          trackedCols, sequenceBy = seqCol, ts = ts, deleteWhen = delCol)
    }
    Seq(Row(version))
  }
}

/** MERGE INTO '<path>' — clause conditions are compiled with `expr()`
  * at run time over the conditional-merge resolved frame; the source
  * resolves through the live session (table/view name or subquery), so
  * whatever SQL can SELECT can drive a merge.
  */
case class GraftMergeCommand(path: String, source: Either[String, String],
                             keys: Seq[String],
                             matched: Seq[(String, Option[String], Seq[(String, String)])],
                             notMatched: Seq[(Option[String], Seq[(String, String)])],
                             bySource: Seq[(String, Option[String], Seq[(String, String)])] = Nil,
                             schemaEvolution: Boolean = false,
                             residual: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = source match {
      case Left(subquery) => session.sql(subquery)
      case Right(table)   => session.table(table)
    }
    def toMatched(specs: Seq[(String, Option[String], Seq[(String, String)])])
        : Seq[ManifestTable.MergeMatched] = specs.map {
      case ("UPDATE", cond, set) => ManifestTable.MergeUpdate(
        cond.map(expr), set.map { case (c, e) => (c, expr(e)) })
      case ("DELETE", cond, _) => ManifestTable.MergeDelete(cond.map(expr))
      case (other, _, _) => throw new IllegalStateException(
        s"unknown matched clause kind $other")
    }
    val nm = notMatched.map { case (cond, values) =>
      ManifestTable.MergeInsert(cond.map(expr),
        values.map { case (c, e) => (c, expr(e)) })
    }
    Seq(Row(ManifestTable.mergeMultiKeyed(src,
      GraftSqlCommands.rp(session, path), keys, toMatched(matched), nm,
      notMatchedBySource = toMatched(bySource),
      schemaEvolution = schemaEvolution,
      residual = residual.map(expr))))
  }
}

/** ALTER TABLE ... SET TBLPROPERTIES — user keys land in the table's
  * property map (one metadata commit, zero data I/O); RESERVED
  * `graft.` keys route to their engine feature exactly the way
  * delta-spark routes `delta.`-prefixed properties:
  *
  *   graft.minReaderVersion / graft.minWriterVersion →
  *     [[ManifestTable.upgradeProtocol]] (set together or the current
  *     value carries; downgrades refused there)
  *   graft.enableRowTracking = 'true' →
  *     [[ManifestTable.enableRowTracking]]
  *
  * Unknown `graft.` keys are refused loudly — a misspelled feature
  * property silently landing as an inert user key is the Delta
  * footgun this guards against.
  */
case class GraftSetPropertiesCommand(path: String,
                                     props: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    // ONE routing for reserved graft.* keys — the same validated
    // split the V2 catalog paths use (name set, integer-ness AND
    // protocol ceiling checked before anything commits; the two
    // copies had already diverged in strictness before r14 unified
    // them here)
    val (reserved, user) = graft.catalog.GraftCatalogPlugin
      .splitValidated(props.toMap, allowRowTracking = true)
    var v = -1L
    if (reserved.nonEmpty) {
      graft.catalog.GraftCatalogPlugin.applyReserved(session, tp, reserved)
      v = ManifestTable.currentVersion(session, tp).getOrElse(-1L)
    }
    if (user.nonEmpty)
      v = ManifestTable.setProperties(session, tp, user)
    Seq(Row(v))
  }
}

/** GENERATE symlink_format_manifest FOR TABLE — Delta's external-reader
  * export verb; the mode name is validated here so a typo fails loudly
  * instead of silently generating nothing. */
case class GraftGenerateCommand(path: String, mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("manifests", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(mode.equalsIgnoreCase("symlink_format_manifest"),
      s"unknown GENERATE mode '$mode' — supported: symlink_format_manifest")
    Seq(Row(ManifestTable.generateSymlinkManifest(session,
      GraftSqlCommands.rp(session, path)).toLong))
  }
}

/** ALTER TABLE ... UNSET TBLPROPERTIES [IF EXISTS] ('k', ...). */
case class GraftUnsetPropertiesCommand(path: String, keys: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(ManifestTable.unsetProperties(session,
      GraftSqlCommands.rp(session, path), keys)))
}

/** SHOW TBLPROPERTIES — (key, value) rows, key-sorted (deterministic;
  * engine-managed features surface under their reserved names the way
  * Delta surfaces `delta.*`). */
case class GraftShowPropertiesCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val tp = GraftSqlCommands.rp(session, path)
    val st = ManifestTable.currentVersion(session, tp)
      .map(ManifestTable.resolveState(session, tp, _))
    val engine = st.toSeq.flatMap { s =>
      Seq("graft.minReaderVersion" -> s.minReader.toString,
        "graft.minWriterVersion" -> s.minWriter.toString) ++
        (if (s.rowTracking) Seq("graft.enableRowTracking" -> "true")
         else Nil)
    }
    val user = st.map(_.properties).getOrElse(Map.empty)
    (engine ++ user.toSeq).sortBy(_._1).map { case (k, v) => Row(k, v) }
  }
}

/** ALTER TABLE family + ANALYZE — metadata-only verbs over one
  * dispatch (each maps 1:1 onto a ManifestTable call; the variants
  * share the version-returning shape). */
/** Parsed flow of one CREATE PIPELINE table definition. */
sealed trait PipeFlowSpec
final case class PipeCopy(dir: String, format: String,
                          pattern: String) extends PipeFlowSpec
final case class PipeIncr(of: String, select: String) extends PipeFlowSpec
final case class PipeMat(of: Seq[String], select: String)
    extends PipeFlowSpec
final case class PipeCdc(of: String, key: String, seqBy: String,
                         deleteWhen: Option[String],
                         tracked: Option[Seq[String]]) extends PipeFlowSpec
final case class PipeAgg(of: String, groupBy: Seq[String],
                         aggs: Seq[(String, String, String)])
    extends PipeFlowSpec
final case class PipeSnapCdc(of: String, key: String,
                             tracked: Option[Seq[String]])
    extends PipeFlowSpec
case object PipeExternal extends PipeFlowSpec

/** One parsed CREATE PIPELINE table definition: name, storage path,
  * EXPECT rules as (name, condition, warn|drop|fail), the flow, and
  * the optional `QUARANTINE AT '<path>'` landing for the DROP rules'
  * rejects. */
final case class PipeDef(name: String, path: String,
                         expectations: Seq[(String, String, String)],
                         flow: PipeFlowSpec,
                         quarantine: Option[String] = None)

/** CREATE PIPELINE — compile the parsed graph to a
  * [[graft.pipeline.Dag]] and register it under `name`
  * ([[graft.pipeline.Pipelines]]). SQL SELECTs bind by TEMP VIEW: an
  * INCREMENTAL definition's upstream name denotes the NEW-ROWS batch
  * of that refresh; a MATERIALIZED definition's inputs denote full
  * table reads. Graph validation (cycles, unknown inputs, duplicate
  * names, expectation placement) happens here, at CREATE time. */
case class GraftCreatePipelineCommand(name: String,
                                      eventLog: Option[String],
                                      defs: Seq[PipeDef],
                                      rawSql: String = "")
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("pipeline", StringType, nullable = false)(),
    AttributeReference("tables", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import graft.pipeline.{Dag, Expectations}
    val tdefs = defs.map { pd =>
      val exps = pd.expectations.map { case (n, c, a) => a match {
        case "warn" => Expectations.expect(n, c)
        case "drop" => Expectations.expectOrDrop(n, c)
        case _      => Expectations.expectOrFail(n, c)
      }}
      val flow: Dag.Flow = pd.flow match {
        case PipeCopy(dir, fmt, pat) => Dag.CopyFrom(dir, fmt, pat)
        case PipeIncr(up, sel) => Dag.Transform(up, batch => {
          batch.createOrReplaceTempView(up)
          batch.sparkSession.sql(sel)
        })
        case PipeMat(ups, sel) => Dag.Materialize(ups, inputs => {
          inputs.foreach { case (n, df) =>
            df.createOrReplaceTempView(n) }
          inputs.valuesIterator.next().sparkSession.sql(sel)
        })
        case PipeCdc(up, key, seqBy, del, tracked) =>
          Dag.Cdc(up, key, seqBy, del, tracked)
        case PipeSnapCdc(up, key, tracked) =>
          Dag.SnapshotCdc(up, key, tracked)
        case PipeExternal => Dag.External()
        case PipeAgg(up, keys, aggs) =>
          Dag.aggregateOf(up, keys, aggs)
      }
      Dag.TableDef(pd.name, GraftSqlCommands.rp(session, pd.path),
        flow, exps,
        quarantineAt = pd.quarantine.map(GraftSqlCommands.rp(session, _)))
    }
    val dag = Dag(tdefs, eventLog.map(GraftSqlCommands.rp(session, _)))
    // with an event log the definition PERSISTS beside the runs (the
    // event-log table is created empty so there is somewhere to put
    // it before any refresh) and the auto run counter resumes from
    // the log's high run — a fresh JVM re-running the same CREATE
    // DDL (or RESTORE PIPELINE) must not restart at run 1, whose
    // idempotency tags would silently no-op every flow
    val floor = dag.ensureEventLog(session) match {
      case Some(ep) =>
        val mt = graft.pipeline.ManifestTable
        if (rawSql.nonEmpty &&
            !mt.pipelineDefinition(session, ep).contains((name, rawSql)))
          mt.setPipelineDefinition(session, ep, name, rawSql): Unit
        dag.maxLoggedRun(session)
      case None => 0L
    }
    graft.pipeline.Pipelines.register(name, dag, runFloor = floor)
    Seq(Row(name, defs.size.toLong))
  }
}

/** REFRESH PIPELINE — one topological refresh pass; returns one row
  * per table (the [[graft.pipeline.Dag.Refreshed]] audit record).
  * Without RUN, an auto-incrementing per-registration id is used;
  * replaying an explicit RUN id no-ops the run-tagged flows. With
  * FULL (optionally `FULL TABLES (a, b)`), the named derived tables —
  * default all of them — REBUILD from their upstreams' current
  * content under the current rules while the rest refresh
  * incrementally in the same pass ([[graft.pipeline.Dag.refreshFull]]
  * — imperative: replaying a FULL refresh rebuilds again). */
case class GraftRefreshPipelineCommand(name: String,
                                       runId: Option[Long],
                                       full: Boolean = false,
                                       fullTables: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("flow", StringType, nullable = false)(),
    AttributeReference("outcome", StringType, nullable = false)(),
    AttributeReference("upstream_version", LongType, nullable = false)(),
    AttributeReference("versions_processed", LongType, nullable = false)(),
    AttributeReference("files_read", LongType, nullable = false)(),
    AttributeReference("rows_observed", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)(),
    AttributeReference("expect_metrics", StringType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    val run = runId.getOrElse(graft.pipeline.Pipelines.nextRun(name))
    val dag = graft.pipeline.Pipelines.get(name)
    val rs =
      if (full) dag.refreshFull(session, run, fullTables.toSet)
      else dag.refresh(session, run)
    rs.map(r =>
      Row(r.table, r.flowKind, r.outcome, r.upstreamVersion,
        r.versionsProcessed, r.filesRead, r.rowsObserved,
        r.committedVersion, r.expectMetrics))
  }
}

/** DESCRIBE PIPELINE — the declared graph, one row per table in
  * refresh order. EXTENDED joins each table's LAST event-log record
  * (run, outcome, committed version, expectation metrics; NULLs when
  * the log has no row for it) — the pipeline console's status view,
  * [[graft.pipeline.Dag.describeExtended]]. */
case class GraftDescribePipelineCommand(name: String,
                                        extended: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("flow", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("inputs", StringType, nullable = false)(),
    AttributeReference("expectations", StringType, nullable = false)()) ++
    (if (extended) Seq(
      AttributeReference("last_run", LongType, nullable = true)(),
      AttributeReference("last_outcome", StringType, nullable = true)(),
      AttributeReference("last_version", LongType, nullable = true)(),
      AttributeReference("last_metrics", StringType, nullable = true)())
    else Nil)
  override def run(session: SparkSession): Seq[Row] = {
    val dag = graft.pipeline.Pipelines.get(name)
    if (extended)
      dag.describeExtended(session).collect().toSeq
    else
      dag.ordered.map(d =>
        Row(d.name, d.flow.kind, d.path, d.flow.inputs.mkString(","),
          d.expectations.map(e => s"${e.name}:${e.action.name}")
            .mkString(",")))
  }
}

/** RESTORE PIPELINE FROM '<event log>' — re-register a pipeline from
  * the definition `CREATE PIPELINE` persisted on its event-log table
  * ([[graft.pipeline.ManifestTable.pipelineDefinition]]): the stored
  * SQL re-parses and re-runs, so a fresh session recovers the graph
  * without the DDL at hand, and the auto run counter resumes from the
  * log's high run (the CREATE path's floor). */
case class GraftRestorePipelineCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("pipeline", StringType, nullable = false)(),
    AttributeReference("tables", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val ep = GraftSqlCommands.rp(session, path)
    val (nm, sql) = graft.pipeline.ManifestTable
      .pipelineDefinition(session, ep).getOrElse(
        throw new IllegalArgumentException(
          s"no pipeline definition persisted at '$path' — only " +
            "pipelines CREATEd with EVENT LOG AT carry one"))
    GraftSqlStatements.parse(sql) match {
      case Some(c: GraftCreatePipelineCommand) => c.run(session)
      case other => throw new IllegalStateException(
        s"persisted definition for pipeline '$nm' no longer parses " +
          s"as CREATE PIPELINE (got $other) — the stored SQL may " +
          "predate a grammar change; re-run the original DDL")
    }
  }
}

/** START PIPELINE name CHECKPOINT AT '<root>' — run the pipeline
  * CONTINUOUSLY ([[graft.pipeline.Dag.continuous]]): one streaming
  * query per watermark-driven derived edge, returned one row per
  * started query. The registry tracks them so STOP PIPELINE (and
  * DROP PIPELINE) can find them; starting an already-running pipeline
  * refuses. */
case class GraftStartPipelineCommand(name: String, checkpoint: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("query", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.pipeline.Pipelines.start(name, session,
      GraftSqlCommands.rp(session, checkpoint)).map(Row(_))
}

/** STOP PIPELINE name — stop the running continuous queries (empty
  * result when none were running). */
case class GraftStopPipelineCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("stopped", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.pipeline.Pipelines.stop(name).map(Row(_))
}

/** VACUUM PIPELINE ... EVENTS KEEP n RUNS — event-log retention:
  * deletes event rows more than `n` runs behind the log's high run
  * (one ACID DELETE commit on the events table; the rows of the kept
  * runs and the table's own history semantics are untouched).
  * DESCRIBE PIPELINE EXTENDED reports NULLs for tables whose last
  * event fell past the horizon. */
case class GraftVacuumPipelineEventsCommand(name: String,
                                            keepRuns: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("pipeline", StringType, nullable = false)(),
    AttributeReference("kept_from_run", LongType, nullable = false)(),
    AttributeReference("events_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(keepRuns >= 1, "KEEP needs at least 1 run")
    val dag = graft.pipeline.Pipelines.get(name)
    val ep = dag.eventLog.getOrElse(throw new IllegalStateException(
      s"pipeline '$name' declared no event log — nothing to vacuum"))
    val from = math.max(1L, dag.maxLoggedRun(session) - keepRuns + 1L)
    val v =
      if (from > 1L)
        graft.pipeline.ManifestTable.deleteWhere(session, ep,
          org.apache.spark.sql.functions.col("run_id") < from)
      else graft.pipeline.ManifestTable
        .currentVersion(session, ep).getOrElse(-1L)
    Seq(Row(name, from, v))
  }
}

/** SHOW PIPELINES — every registered pipeline with its table count,
  * event-log location, and the count of live continuous queries
  * (0 = triggered-only / stopped). */
case class GraftShowPipelinesCommand()
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("pipeline", StringType, nullable = false)(),
    AttributeReference("tables", LongType, nullable = false)(),
    AttributeReference("event_log", StringType, nullable = true)(),
    AttributeReference("running_queries", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.pipeline.Pipelines.names.map { n =>
      val dag = graft.pipeline.Pipelines.get(n)
      Row(n, dag.defs.size.toLong, dag.eventLog.orNull,
        graft.pipeline.Pipelines.runningQueries(n).size.toLong)
    }
}

/** DROP PIPELINE — unregister (tables and event log stay on disk). */
case class GraftDropPipelineCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dropped", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(graft.pipeline.Pipelines.drop(name)))
}

case class GraftAlterCommand(path: String, verb: String, args: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val path = GraftSqlCommands.rp(session, this.path)
    val v = verb match {
      case "rename" =>
        ManifestTable.renameColumn(session, path, args(0), args(1))
      case "drop_column" =>
        ManifestTable.dropColumn(session, path, args(0))
      case "add_constraint" =>
        ManifestTable.addCheckConstraint(session, path, args(0), args(1))
      case "add_columns" =>
        // Delta refuses ADD COLUMN ... DEFAULT: a default only governs
        // FUTURE writes, while existing rows read NULL — silently
        // different values for "the same default" is the trap. Refuse
        // with the honest two-step instead of a cryptic DDL parse
        // error. Detection is positional (the keyword after a column's
        // name/type, outside string literals and <...> type arguments),
        // so a column literally NAMED `default` or a COMMENT containing
        // the word is never spuriously refused.
        require(!GraftSqlCommands.hasDefaultClause(args(0)),
          "ADD COLUMNS does not take DEFAULT (existing rows would read " +
            "NULL regardless — Delta's rule): add the column, then " +
            "ALTER COLUMN ... SET DEFAULT for future writes")
        ManifestTable.addColumns(session, path,
          StructType.fromDDL(args(0)))
      case "drop_constraint" =>
        ManifestTable.dropCheckConstraint(session, path, args(0))
      case "add_expectation" =>
        ManifestTable.addExpectation(session, path, args(0), args(1),
          onViolation = args(2))
      case "drop_expectation" =>
        ManifestTable.dropExpectation(session, path, args(0))
      case "analyze" =>
        ManifestTable.setNdvStats(session, path, args)
      case "set_stats" =>
        ManifestTable.setStatsColumns(session, path, args)
      case "cluster_by" =>
        ManifestTable.setClusterColumns(session, path, args)
      case "identity" =>
        ManifestTable.setIdentityColumn(session, path, args(0),
          startWith = args(1).toLong, step = args(2).toLong)
      case "set_not_null" =>
        ManifestTable.setNotNull(session, path, args(0))
      case "drop_not_null" =>
        ManifestTable.dropNotNull(session, path, args(0))
      case "set_default" =>
        ManifestTable.setColumnDefault(session, path, args(0), args(1))
      case "drop_default" =>
        ManifestTable.dropColumnDefault(session, path, args(0))
      case other => throw new IllegalStateException(s"unknown verb $other")
    }
    Seq(Row(v))
  }
}

/** INSERT INTO/OVERWRITE '<path>' <query> and CREATE TABLE '<path>'
  * AS <query> — the everyday write verbs. The query is resolved by
  * the live session (its text may itself read path tables through the
  * graft_table sugar, which the parser rewrites before this command is
  * built), so SQL pipelines compose end-to-end: read a path table,
  * transform, land in another, all in one statement. INSERT INTO is a
  * transactional APPEND (O(new files) commit); OVERWRITE replaces the
  * snapshot; CTAS additionally requires the table to not exist.
  * Column resolution is BY NAME (the append/evolve contract — an
  * unknown column evolves additively), not by position; alias inline
  * rows accordingly.
  */
case class GraftInsertCommand(path: String, query: String,
                              overwrite: Boolean,
                              mustBeNew: Boolean = false,
                              replaceCond: Option[String] = None,
                              cols: Seq[String] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val tp = GraftSqlCommands.rp(session, path)
    if (mustBeNew)
      require(ManifestTable.versions(session, tp).isEmpty,
        s"CREATE TABLE AS: $tp already has committed versions " +
          "(use INSERT OVERWRITE)")
    val raw = session.sql(query)
    // explicit column list: POSITIONAL resolution against the list,
    // absent table columns fill from their declared DEFAULT, NULL
    // otherwise — the SQL standard's INSERT (cols) semantics
    val df = if (cols.isEmpty) raw else {
      require(raw.columns.length == cols.length,
        s"INSERT column list (${cols.length}) and query output " +
          s"(${raw.columns.length}) differ in length")
      val schema = ManifestTable.read(session, tp).schema
      // case-INSENSITIVE resolution, like every other Spark SQL
      // identifier: the column list canonicalizes to the schema's
      // spelling before projection
      val canon = schema.fieldNames.map(n => n.toLowerCase -> n).toMap
      val colsC = cols.map(c => canon.getOrElse(c.toLowerCase,
        throw new IllegalArgumentException(
          s"INSERT targets unknown column '$c' at $tp")))
      val defaults = ManifestTable.columnDefaults(session, tp)
      val renamed = raw.toDF(colsC: _*)
      renamed.select(schema.fields.toSeq.map { f =>
        if (colsC.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else defaults.get(f.name)
          .map(s => expr(s).cast(f.dataType).as(f.name))
          .getOrElse(lit(null).cast(f.dataType).as(f.name))
      }: _*)
    }
    val v = replaceCond match {
      case Some(cond) => ManifestTable.overwriteWhere(df, tp, expr(cond))
      case None =>
        if (overwrite) ManifestTable.write(df, tp)
        else ManifestTable.append(df, tp)
    }
    Seq(Row(v))
  }
}

/** CREATE TABLE '<dst>' SHALLOW|DEEP CLONE '<src>' [VERSION AS OF n]. */
case class GraftCloneCommand(dst: String, src: String,
                             version: Option[Long],
                             deep: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val clone = if (deep) ManifestTable.cloneDeep _
                else ManifestTable.cloneShallow _
    Seq(Row(clone(session,
      GraftSqlCommands.rp(session, src),
      GraftSqlCommands.rp(session, dst), version)))
  }
}

/** `CREATE TABLE <dst> LIKE <src>` — an EMPTY table with the source's
  * declared surface: schema (logical names), partition layout,
  * CHECK + NOT NULL constraints, column DEFAULTs, generated columns,
  * clustering and stats-schema declarations, user TBLPROPERTIES.
  * NO data, NO history — the schema-template verb (clone copies
  * content; LIKE copies shape). Driver metadata only: one empty
  * commit plus one commit per declaration class.
  */
case class GraftCreateLikeCommand(dst: String, src: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("created", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val sp = GraftSqlCommands.rp(session, src)
    val v = ManifestTable.currentVersion(session, sp).getOrElse(
      throw new IllegalStateException(s"no committed version at $sp"))
    val st = ManifestTable.resolveState(session, sp, v)
    val schema = ManifestTable.manifestSchema(session, sp, v)
      .getOrElse(ManifestTable.read(session, sp).schema)
    val partCols =
      if (st.partitionColsDecl.nonEmpty) st.partitionColsDecl
      else Option(ManifestTable.describeDetail(session, sp).head()
          .getAs[String]("partition_columns"))
        .filter(_.nonEmpty).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Nil)
    val dp =
      if (dst.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix)) {
        val name = GraftSqlCommands.nameOf(dst)
        graft.catalog.GraftCatalog.createTable(session, name, schema,
          partCols)
        graft.catalog.GraftCatalog.tablePath(session, name)
      } else {
        require(ManifestTable.versions(session, dst).isEmpty,
          s"CREATE TABLE LIKE: $dst already has committed versions")
        val empty = session.createDataFrame(
          session.sparkContext.emptyRDD[Row], schema)
        ManifestTable.write(empty, dst, partitionColsDecl = partCols): Unit
        dst
      }
    st.constraints.toSeq.sortBy(_._1).foreach { case (n, e) =>
      ManifestTable.addCheckConstraint(session, dp, n, e): Unit }
    st.defaults.toSeq.sortBy(_._1).foreach { case (c, e) =>
      ManifestTable.setColumnDefault(session, dp, c, e): Unit }
    st.generated.toSeq.sortBy(_._1).foreach { case (c, e) =>
      ManifestTable.addGeneratedColumn(session, dp, c, e): Unit }
    // cluster/stats declarations store PHYSICAL names; the template is
    // a fresh UNMAPPED table, so they carry by their LOGICAL names
    if (st.clusterCols.nonEmpty)
      ManifestTable.setClusterColumns(session, dp,
        st.clusterCols.map(st.logical)): Unit
    if (st.statsSchemaCols.nonEmpty)
      ManifestTable.setStatsColumns(session, dp,
        st.statsSchemaCols.map(st.logical)): Unit
    if (st.properties.nonEmpty)
      ManifestTable.setProperties(session, dp, st.properties): Unit
    // row tracking is declarable on the empty template (ids start
    // fresh at 0 — the clone-vs-template distinction). Identity
    // declarations are NOT copied: the source's START WITH is not
    // recoverable from state (only step + high water), and silently
    // guessing it would mint colliding ids downstream.
    if (st.rowTracking)
      ManifestTable.enableRowTracking(session, dp): Unit
    Seq(Row(dp))
  }
}

/** CREATE TABLE graft.db.t LOCATION '<path>' — adopt an existing
  * path table under a catalog name (external registration; one tiny
  * registry write, zero data I/O). */
case class GraftRegisterTableCommand(nameSpec: String, location: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("registered", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val name = GraftSqlCommands.nameOf(nameSpec)
    graft.catalog.GraftCatalog.registerExternal(session, name, location)
    Seq(Row(name))
  }
}

/** DROP TABLE graft.db.t [PURGE]. */
case class GraftDropTableCommand(nameSpec: String, purge: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("dropped", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val name = GraftSqlCommands.nameOf(nameSpec)
    graft.catalog.GraftCatalog.dropTable(session, name, purge)
    Seq(Row(name))
  }
}

/** SHOW TABLES IN graft[.db] — (table, location) rows, name-sorted. */
case class GraftShowTablesCommand(db: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.catalog.GraftCatalog.listTables(session, db)
      .map { case (t, p) => Row(t, p) }
}

/** `CREATE TABLE graft.db.t (col TYPE [NOT NULL], ...) [USING graft]
  * [PARTITIONED BY (cols)]` — the Delta declare-schema-then-ingest
  * norm: one EMPTY manifest commit carrying the schema (plus one
  * metadata commit per NOT NULL invariant), so constraints / identity
  * / clustering can be declared before the first data write.
  */
case class GraftCreateTableCommand(nameSpec: String, colsDdl: String,
                                   partCols: Seq[String],
                                   props: Seq[(String, String)] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("created", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val name = GraftSqlCommands.nameOf(nameSpec)
    // declared TBLPROPERTIES validate BEFORE anything commits (a bad
    // reserved key must not leave a half-created table); reserved keys
    // route to engine features, the table being empty by construction
    // (row tracking is declarable here)
    val (reserved, user) = graft.catalog.GraftCatalogPlugin
      .splitValidated(props.toMap, allowRowTracking = true)
    val notNull = scala.collection.mutable.ArrayBuffer[String]()
    val defaults = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val defaultRe = "(?is)^(.+?)\\s+DEFAULT\\s+(.+)$".r
    val cleaned = GraftSqlStatements.splitTopLevel(colsDdl).map { e =>
      // column DDL suffixes in either order: [DEFAULT expr] [NOT NULL]
      var t = e.trim
      var nn = false
      val afterNn = t.replaceAll("(?is)\\s+NOT\\s+NULL\\s*$", "")
      if (afterNn != t) { nn = true; t = afterNn }
      t match {
        case defaultRe(head, dflt) =>
          defaults += head.trim.split("\\s+").head -> dflt.trim
          t = head.trim
        case _ => ()
      }
      val afterNn2 = t.replaceAll("(?is)\\s+NOT\\s+NULL\\s*$", "")
      if (afterNn2 != t) { nn = true; t = afterNn2 }
      if (nn) notNull += t.trim.split("\\s+").head
      t
    }
    val schema = StructType.fromDDL(cleaned.mkString(", "))
    // inline DEFAULTs validate BEFORE the empty-schema commit publishes
    // — the same no-half-created-table rule the TBLPROPERTIES
    // validation above follows
    defaults.foreach { case (c, d) =>
      require(schema.fieldNames.contains(c),
        s"DEFAULT declared on unknown column '$c'")
      ManifestTable.validateColumnDefault(session, c, d,
        schema(c).dataType)
    }
    graft.catalog.GraftCatalog.createTable(session, name, schema, partCols)
    val path = graft.catalog.GraftCatalog.tablePath(session, name)
    notNull.foreach(c => ManifestTable.setNotNull(session, path, c): Unit)
    defaults.foreach { case (c, d) =>
      ManifestTable.setColumnDefault(session, path, c, d): Unit }
    graft.catalog.GraftCatalogPlugin.applyReserved(session, path, reserved)
    if (user.nonEmpty)
      ManifestTable.setProperties(session, path, user): Unit
    Seq(Row(name))
  }
}

/** ALTER TABLE graft.db.t RENAME TO [graft.]db2.t2. */
case class GraftRenameTableCommand(nameSpec: String, newName: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("renamed", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    graft.catalog.GraftCatalog.renameTable(session,
      GraftSqlCommands.nameOf(nameSpec), newName)
    Seq(Row(newName))
  }
}

/** SHOW CREATE TABLE — one deterministic `createtab_stmt` row (no
  * timestamps) reconstructing the declared surface: columns with
  * NOT NULL / IDENTITY / GENERATED annotations, partitioning,
  * clustering, location for externals, CHECK constraints as
  * `graft.constraints.*` properties (Delta's convention).
  */
case class GraftShowCreateCommand(nameSpec: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("createtab_stmt", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(GraftSqlCommands.renderCreate(session, nameSpec)))
}

/** DESCRIBE EXTENDED — Spark's (col_name, data_type, comment) shape:
  * the columns, then a `# Detailed Table Information` section from
  * manifest metadata only (deterministic — no timestamps).
  */
case class GraftDescribeExtendedCommand(nameSpec: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    GraftSqlCommands.describeExtendedRows(session, nameSpec)
}

object GraftSqlCommands {
  /** Resolve a verb target: a literal path passes through, a
    * `graft:db.t` name spec maps through the catalog. */
  def rp(session: SparkSession, spec: String): String =
    graft.catalog.GraftCatalog.resolvePathSpec(session, spec)

  /** Whether a column-DDL text carries a `DEFAULT` CLAUSE — the
    * keyword in suffix position after a column's name (never the
    * column name itself, a COMMENT string, or a struct field inside
    * `<...>` type arguments). Used to refuse `ADD COLUMNS (c T
    * DEFAULT e)` with the honest two-step message instead of either a
    * cryptic parse error or a spurious refusal of a column literally
    * named `default`. */
  private[plans] def hasDefaultClause(ddl: String): Boolean = {
    // drop string literals (quote-doubling collapses with them) and
    // balanced <...> type-argument groups; neither can host a clause
    val noStr = {
      val sb = new StringBuilder; var inStr = false; var esc = false
      ddl.foreach { ch =>
        if (esc) esc = false
        else if (inStr) {
          if (ch == '\\') esc = true else if (ch == '\'') inStr = false
        }
        else if (ch == '\'') inStr = true
        else sb += ch }
      sb.toString
    }
    val noAngle = {
      val sb = new StringBuilder; var depth = 0
      noStr.foreach { ch =>
        if (ch == '<') depth += 1
        else if (ch == '>' && depth > 0) depth -= 1
        else if (depth == 0) sb += ch }
      sb.toString
    }
    noAngle.split(",").exists { colSpec =>
      val toks = colSpec.trim.split("\\s+").filter(_.nonEmpty)
      toks.drop(1).exists(_.equalsIgnoreCase("default"))
    }
  }

  /** A `graft:db.t` spec → the `db.t` name; refuses plain paths where
    * a catalog NAME is required (DROP TABLE / CREATE ... LOCATION). */
  def nameOf(spec: String): String = {
    require(spec.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix),
      s"this verb needs a catalog name (graft.db.t), got '$spec'")
    spec.stripPrefix(graft.catalog.GraftCatalog.PathSpecPrefix)
  }

  /** Shared metadata snapshot for the introspection verbs — one state
    * resolution, zero data I/O. */
  private def tableMeta(session: SparkSession, nameSpec: String) = {
    val path = rp(session, nameSpec)
    val v = ManifestTable.currentVersion(session, path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    val st = ManifestTable.resolveState(session, path, v)
    val schema = ManifestTable.manifestSchema(session, path, v)
      .getOrElse(ManifestTable.read(session, path).schema)
    val detail = ManifestTable.describeDetail(session, path).head()
    (path, v, st, schema, detail)
  }

  private def displayName(session: SparkSession, nameSpec: String): String =
    if (nameSpec.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix))
      s"graft.${nameSpec.stripPrefix(graft.catalog.GraftCatalog.PathSpecPrefix)}"
    else s"graft.'$nameSpec'"

  private def isExternal(session: SparkSession, nameSpec: String): Boolean =
    nameSpec.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix) && {
      val (db, t) = graft.catalog.GraftCatalog.splitName(
        nameSpec.stripPrefix(graft.catalog.GraftCatalog.PathSpecPrefix))
      graft.catalog.GraftCatalog.externals(session, db).contains(t)
    }

  private def columnAnnotations(session: SparkSession, path: String)
      : (Set[String], Map[String, String], Option[(String, Long, Long)]) =
    (ManifestTable.notNullColumns(session, path).toSet,
      ManifestTable.generatedColumns(session, path),
      ManifestTable.identityInfo(session, path))

  def renderCreate(session: SparkSession, nameSpec: String): String = {
    val (path, _, st, schema, detail) = tableMeta(session, nameSpec)
    val (nn, gen, ident) = columnAnnotations(session, path)
    val cols = schema.fields.map { f =>
      val base = s"  ${f.name} ${f.dataType.sql}"
      val idPart = ident match {
        case Some((c, step, _)) if c == f.name || st.logical(c) == f.name =>
          s" GENERATED BY DEFAULT AS IDENTITY" +
            (if (step != 1L) s" (STEP $step)" else "")
        case _ => ""
      }
      val genPart = gen.get(f.name).map(e => s" GENERATED ALWAYS AS ($e)")
        .getOrElse("")
      val defPart = st.defaults.get(f.name).map(e => s" DEFAULT ($e)")
        .getOrElse("")
      base + idPart + genPart + defPart +
        (if (nn.contains(f.name)) " NOT NULL" else "")
    }.mkString(",\n")
    val partLine = Option(detail.getAs[String]("partition_columns"))
      .filter(_.nonEmpty).map(p => s"\nPARTITIONED BY ($p)").getOrElse("")
    val clusterLine = Option(detail.getAs[String]("cluster_columns"))
      .filter(_.nonEmpty).map(c => s"\nCLUSTER BY ($c)").getOrElse("")
    val locLine =
      if (isExternal(session, nameSpec) ||
          !nameSpec.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix))
        s"\nLOCATION '$path'"
      else ""
    val checkProps = st.constraints.toSeq
      .filterNot(_._1.startsWith(ManifestTable.NotNullPrefix))
      .sortBy(_._1)
      .map { case (n, e) => s"  'graft.constraints.$n' = '$e'" } ++
      st.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"  '$k' = '$v'" }
    val propLine =
      if (checkProps.isEmpty) ""
      else checkProps.mkString("\nTBLPROPERTIES (\n", ",\n", ")")
    s"CREATE TABLE ${displayName(session, nameSpec)} (\n$cols)\n" +
      s"USING graft$partLine$clusterLine$locLine$propLine"
  }

  def describeExtendedRows(session: SparkSession,
                           nameSpec: String): Seq[Row] = {
    val (path, v, st, schema, detail) = tableMeta(session, nameSpec)
    val (nn, gen, ident) = columnAnnotations(session, path)
    val colRows = schema.fields.map { f =>
      val notes = Seq(
        if (nn.contains(f.name)) Some("not null") else None,
        ident.collect { case (c, step, _)
            if c == f.name || st.logical(c) == f.name =>
          s"identity(step=$step)" },
        gen.get(f.name).map(e => s"generated: $e"),
        st.defaults.get(f.name).map(e => s"default: $e")).flatten
      Row(f.name, f.dataType.simpleString, notes.mkString("; "))
    }.toSeq
    val checks = st.constraints.toSeq
      .filterNot(_._1.startsWith(ManifestTable.NotNullPrefix))
      .sortBy(_._1).map { case (n, e) => s"$n CHECK ($e)" }
    def kv(k: String, value: String) = Row(k, value, "")
    colRows ++ Seq(
      Row("", "", ""),
      Row("# Detailed Table Information", "", ""),
      kv("Name", displayName(session, nameSpec)),
      kv("Type",
        if (!nameSpec.startsWith(graft.catalog.GraftCatalog.PathSpecPrefix))
          "PATH"
        else if (isExternal(session, nameSpec)) "EXTERNAL" else "MANAGED"),
      kv("Location", path),
      kv("Provider", "graft"),
      kv("Version", v.toString),
      kv("Num Files", detail.getAs[Long]("num_files").toString),
      kv("Partition Columns", detail.getAs[String]("partition_columns")),
      kv("Cluster Columns", detail.getAs[String]("cluster_columns")),
      kv("Stats Columns", detail.getAs[String]("stats_columns")),
      kv("Constraints", checks.mkString("; ")),
      kv("Row Tracking", st.rowTracking.toString),
      kv("Column Mapping", st.mapped.toString),
      kv("Protocol",
        s"minReader=${st.minReader} minWriter=${st.minWriter}"))
  }

  /** `'yyyy-MM-dd HH:mm:ss[.fff]'` (or with a 'T') or epoch millis. */
  def parseTimestampMillis(ts: String): Long = {
    val t = ts.trim.replace("T", " ")
    if (t.matches("\\d+")) t.toLong
    else if (t.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.sql.Timestamp.valueOf(t + " 00:00:00").getTime
    else java.sql.Timestamp.valueOf(t).getTime
  }
}
