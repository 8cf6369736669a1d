package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same logical ops as the batch
  * `events_window_agg` / `events_sessionize` queries, expressed as
  * streams — `readStream` → watermarked windowed agg, and
  * `flatMapGroupsWithState` gap-sessionization with event-time
  * timeout. The batch/stream pair share semantics, so a backfill and
  * the live pipeline produce consistent tables.
  */
object EventStream {

  /** events.parquet on-disk schema (ts is raw TIMESTAMP(NANOS) →
    * read as long, converted in [[normalize]]). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.readStream.schema(rawSchema).parquet(dir))
  }

  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Watermarked tumbling 1-hour aggregation (streaming twin of
    * `events_window_agg`). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long, sum_value: Double)

  /** Gap-based sessionization (30 min) via flatMapGroupsWithState:
    * a session closes when its event-time timeout fires or a gap
    * appears inside a batch. Streaming twin of `events_sessionize`. */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.last, s.n, s.sum))
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
