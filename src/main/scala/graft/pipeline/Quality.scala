package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-pass data-quality observability: named metrics attached to a plan
  * with `Dataset.observe`, computed INSIDE whatever job already runs
  * over the data — no second scan. At 100 TB a quality gate that
  * re-aggregates the table doubles ingest cost; observed metrics ride
  * the existing pass and arrive with the action's result (batch:
  * `Observation.get`; streaming: `StreamingQueryProgress
  * .observedMetrics`, same expressions unchanged).
  *
  * The expressions must be aggregate functions without DISTINCT —
  * that's the `observe` contract — so rates are emitted as
  * (numerator, denominator) pairs and divided by the reader.
  */
object Quality {

  /** The bronze-ingest quality battery over an events frame:
    * row count, null/negative-value rows, null-key rows, event-time
    * bounds (a feed stuck in the past or jumping to 1970 surfaces here
    * — the round-7 failure class, observable in production).
    */
  def eventMetrics: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("rows"),
    sum(when(col("value").isNull || col("value") < 0, 1L).otherwise(0L))
      .as("bad_value_rows"),
    sum(when(col("event_id").isNull || col("user_id").isNull, 1L)
      .otherwise(0L)).as("null_key_rows"),
    min(col("ts")).as("min_ts"),
    max(col("ts")).as("max_ts"))

  /** Attach the battery to a batch plan. Read `obs.get` AFTER an action
    * has run the plan; `get` blocks until then.
    */
  def observedEvents(events: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    (events.observe(obs, eventMetrics.head, eventMetrics.tail: _*), obs)
  }

  /** Attach the battery to a STREAMING plan under a stable name; each
    * micro-batch's metrics arrive in that batch's
    * `StreamingQueryProgress.observedMetrics(name)` — per-batch
    * freshness monitoring without a second aggregation stage.
    */
  def observedEventsStream(events: DataFrame,
                           name: String = "bronze_quality"): DataFrame =
    events.observe(name, eventMetrics.head, eventMetrics.tail: _*)

  /** The documents-feed quality battery (the corpus-pipeline twin of
    * [[eventMetrics]]): row count, null/empty text, null keys, text
    * length bounds, malformed language tags, and an estimated language
    * cardinality (`approx_count_distinct` — HLL, no DISTINCT keyword,
    * so it satisfies the observe contract). A feed that silently
    * truncates text, drops languages, or ships empty rows surfaces in
    * the same pass that curates it.
    */
  def documentMetrics: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("rows"),
    sum(when(col("text").isNull || length(col("text")) === 0, 1L)
      .otherwise(0L)).as("empty_text_rows"),
    sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("null_key_rows"),
    sum(when(col("lang").isNull || length(col("lang")) =!= 2, 1L)
      .otherwise(0L)).as("bad_lang_rows"),
    min(length(col("text")).cast("long")).as("min_chars"),
    max(length(col("text")).cast("long")).as("max_chars"),
    approx_count_distinct(col("lang")).as("lang_est"))

  /** Attach the documents battery to a batch plan (read `obs.get` after
    * an action — the corpus pipeline rides it on its existing pass).
    */
  def observedDocuments(docs: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    (docs.observe(obs, documentMetrics.head, documentMetrics.tail: _*), obs)
  }
}
