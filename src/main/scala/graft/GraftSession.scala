package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory encoding the engine's scale guidance —
  * one place where the spill/shuffle sizing story lives instead of
  * per-app copy-paste.
  *
  * Rationale per setting (targets: ~128 MiB-class tasks that fit
  * executor memory at any input scale):
  *
  *  - `shuffle.partitions = max(2×cores, inputGB·8)` — two waves of
  *    tasks minimum (stragglers overlap), and ~128 MiB per shuffle
  *    partition at the declared input size so sorts/aggregations don't
  *    spill. AQE coalesces the excess at runtime, so oversizing is
  *    cheap; undersizing (the 100 TB failure mode) is not.
  *  - `files.maxPartitionBytes = 128 MiB` — scan-task granularity.
  *  - AQE on, with skew-join splitting (oversized post-shuffle
  *    partitions split automatically) and partition coalescing.
  *  - `autoBroadcastJoinThreshold = 64 MiB` — dimension tables broadcast
  *    aggressively; fact-fact joins never qualify.
  *  - session timezone pinned UTC: timestamp semantics must not depend
  *    on cluster locale (oracle determinism and cross-DC correctness).
  */
object GraftSession {

  /** The sizing rules as data — what [[builder]] applies. */
  def settings(cores: Int, expectedInputGB: Double): Map[String, String] = {
    val shufflePartitions = math.max(2 * cores, (expectedInputGB * 8).toInt)
    Map(
      "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
      "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // AQE inside cached plans: the engine pins merge sources and feed
      // deltas with persist(); Spark's default (false) disables AQE for
      // the whole cached subtree, leaving every inner shuffle at the
      // static partition count with no runtime coalescing. Coalescing
      // under this flag stays advisory-size-driven — scale-adaptive.
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
  }

  def builder(appName: String, cores: Int,
              expectedInputGB: Double = 1.0): SparkSession.Builder =
    settings(cores, expectedInputGB).foldLeft(
      SparkSession.builder().appName(appName)) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Local development/test variant. */
  def local(appName: String, cores: Int): SparkSession.Builder =
    builder(appName, cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")

  @volatile private var extCache: Option[SparkSession] = None

  /** Run `f` against a session on the SAME SparkContext as `base` but
    * with graft's SQL extensions applied (parser verbs + table
    * functions — [[graft.plans.GraftExtensions]]), for apps whose base
    * session was built without `.withExtensions`. Extensions bind at
    * session CREATION, so `getOrCreate` on the base session can never
    * acquire them — this builds one extended sibling (cached for the
    * JVM; sessions are cheap, contexts are not) and restores the
    * active/default sessions afterwards.
    */
  def withSqlExtensions[A](base: SparkSession)(f: SparkSession => A): A = {
    // Build+swap runs under the object lock: getOrCreate consults the
    // JVM-GLOBAL default-session slot, so the clear/build/restore window
    // must not interleave with a concurrent builder (which could hand
    // back the wrong session or observe no default at all) — and the
    // check-then-act on extCache must not build duplicate siblings.
    val ext = this.synchronized {
      extCache match {
        case Some(s) if s.sparkContext eq base.sparkContext => s
        case _ =>
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          val s =
            try SparkSession.builder()
              .withExtensions(new graft.plans.GraftExtensions)
              .getOrCreate()
            finally {
              SparkSession.setDefaultSession(base)
              SparkSession.setActiveSession(base)
            }
          extCache = Some(s)
          s
      }
    }
    // Only the THREAD-LOCAL active session swaps for the call window —
    // the global default stays `base`, so concurrent threads running
    // queries on the base session never observe the extended sibling.
    SparkSession.setActiveSession(ext)
    try f(ext)
    finally SparkSession.setActiveSession(base)
  }
}
