package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: every purchase event joined to the
  * SAME user's view events in the preceding 24 hours (left outer — an
  * unattributed purchase still comes out, with nulls). This is the
  * attribution shape every event pipeline runs, and the one core
  * Structured Streaming capability the other components don't
  * exercise: a watermarked self-join where BOTH sides are unbounded.
  *
  * Why it scales: the interval condition plus the two watermarks let
  * Spark bound the join state — view rows are evicted once the
  * watermark passes `v_ts + 24 h` (they can no longer match any
  * future purchase), purchases once matched or expired, so state is
  * proportional to one attribution window of traffic per user, NOT
  * the stream history. The join itself shuffles both sides on `user_id` once.
  *
  * The same function runs UNCHANGED on batch DataFrames (watermarks
  * are a no-op in batch) — that batch twin is the `events_attribution`
  * registry entry, fully DuckDB-oracled, and the spec holds the
  * streamed output to field-level parity with it.
  */
object AttributionStream {

  /** `events` must carry (event_id, ts: timestamp, user_id,
    * event_type, value). Output: one row per (purchase, prior view
    * within 24 h) pair, plus a null-view row for unattributed
    * purchases. */
  def attribute(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_event_id"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_event_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(views,
      col("v_user") === col("user_id") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"),
      "leftOuter")
      .select(col("purchase_event_id"), col("user_id"), col("p_ts"),
        col("value"), col("view_event_id"), col("v_ts"))
  }

  /** The batch registry twin (`events_attribution`): [[attribute]]
    * over the static events table, epochs + e2 value for the oracle
    * boundary, deterministic output order. */
  def eventsAttribution(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    attribute(graft.core.Tables.events(spark, dir))
      .select(col("purchase_event_id"), col("user_id"),
        unix_timestamp(col("p_ts")).as("purchase_epoch"),
        graft.core.Stab.e2(col("value")).as("value_e2"),
        col("view_event_id"),
        unix_timestamp(col("v_ts")).as("view_epoch"))
      .orderBy(col("purchase_event_id"), col("view_event_id"))
  }

  val eventsAttributionSql: String =
    s"""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
       |v AS (SELECT * FROM events WHERE event_type = 'view')
       |SELECT p.event_id AS purchase_event_id, p.user_id,
       |  CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       |  ${graft.core.Stab.sqlE2("p.value")} AS value_e2,
       |  v.event_id AS view_event_id,
       |  CAST(FLOOR(epoch(v.ts)) AS BIGINT) AS view_epoch
       |FROM p LEFT JOIN v
       |  ON v.user_id = p.user_id
       |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 24 HOURS
       |ORDER BY purchase_event_id, view_event_id""".stripMargin
}
