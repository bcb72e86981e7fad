package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same engine posture as Bench/GraftSession: AQE applies inside
      // cached plans (results unaffected; see Bench.main)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Schema-drift canary (round 7: a regenerated fixture flipped
    // events.ts from INT64 nanos to TIMESTAMP(MICROS); 20 queries broke
    // with a cryptic analysis error). One line per table so the NEXT
    // regeneration is DIAGNOSABLE at a glance: physical types are
    // reported, not asserted, because loaders adapt
    // (graft.Tables.rawEventsSchema). Missing/renamed columns are
    // REPORTED (DRIFT line), not enforced — the run continues so the
    // unaffected queries still produce a partial correctness record;
    // the affected queries' own failures carry the enforcement.
    val expectedCols = Map(
      "region" -> "r_regionkey r_name",
      "nation" -> "n_nationkey n_name n_regionkey",
      "customer" -> "c_custkey c_name c_nationkey c_acctbal c_mktsegment",
      "supplier" -> "s_suppkey s_name s_nationkey s_acctbal",
      "part" -> "p_partkey p_name p_brand p_type p_size p_retailprice",
      "orders" -> "o_orderkey o_custkey o_orderstatus o_totalprice o_orderdate o_orderpriority",
      "lineitem" -> "l_orderkey l_partkey l_suppkey l_linenumber l_quantity l_extendedprice l_discount l_tax l_returnflag l_linestatus l_shipdate",
      "events" -> "event_id ts user_id event_type value props",
      "documents" -> "doc_id text lang source n_chars",
      "embeddings" -> "vec_id embedding label")
    expectedCols.toSeq.sortBy(_._1).foreach { case (t, want) =>
      try {
        val s = Tables.rawSchemaOf(spark, s"$sfDir/$t.parquet")
        val got = s.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
        println(s"[schema] $t ${got.mkString(" ")}")
        val missing = want.split(" ").filterNot(s.fieldNames.contains)
        if (missing.nonEmpty)
          System.err.println(
            s"[schema] DRIFT $t missing/renamed columns: ${missing.mkString(", ")}")
      } catch { case e: Throwable =>
        System.err.println(s"[schema] DRIFT $t unreadable: ${e.getMessage}")
      }
    }
    // Dev loop: SPARK_GRAFT_QUERIES=a,b,c restricts the dump (and the
    // oracle json) to a subset. The driver leaves it unset → full run.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // free storage leaked by finished queries (localCheckpoint blocks
      // are otherwise only freed on driver GC)
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
