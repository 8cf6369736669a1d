package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the same logical ops as the batch
  * `events_window_agg` / `events_sessionize` queries, expressed as
  * streams — `readStream` → watermarked windowed agg here, and
  * `flatMapGroupsWithState` gap-sessionization in [[SessionStream]].
  * The batch/stream pairs share semantics, so a backfill and the live
  * pipeline produce consistent tables.
  */
object EventStream {

  /** events.parquet on-disk schema. `ts` is parquet TIMESTAMP(NANOS):
    * Spark ≥ 4.1 reads it natively as TIMESTAMP_NTZ (micros
    * truncation) and IGNORES the `nanosAsLong` legacy conf — an
    * explicit LongType field here would silently misread on those
    * builds, so the declared type is NTZ and [[normalize]] converts
    * to plain TIMESTAMP (value-exact under the UTC sessions this
    * library pins), keeping one `ts` type contract with the batch
    * loader `Tables.events`. */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    // pre-4.1 readers need the legacy conf (nanos surface as raw
    // longs); 4.1+ ignores it and reads NTZ. The declared streaming
    // schema must match whichever this BUILD does, so probe the
    // column's batch-read type once (a footer read) instead of
    // hardcoding either era's answer.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NonFatal only: a fatal JVM error must propagate, and a failed
    // probe is WARNed (not swallowed) before defaulting to the 4.1+
    // answer — on a pre-4.1 build that guess would mis-declare the
    // nanosAsLong long column and the probe failure is the real story.
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case scala.util.control.NonFatal(e) =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"ts-type probe failed for $dir; assuming TimestampNTZ (4.1+)", e)
          TimestampNTZType
      }
    normalize(spark.readStream.schema(rawSchema(tsType)).parquet(dir))
  }

  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
    case _ => raw
  }

  /** Watermarked tumbling 1-hour aggregation (streaming twin of
    * `events_window_agg`). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

}
