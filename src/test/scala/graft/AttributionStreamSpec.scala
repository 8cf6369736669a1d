package graft

import graft.streaming.AttributionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The watermarked stream-stream interval join must produce EXACTLY
  * the batch join's rows — including the left-outer (unattributed)
  * purchases, which a streaming left join only emits once the global
  * watermark passes their expiry. The spec drives the full sf corpus
  * through a MemoryStream, then advances the watermark with sentinel
  * events on BOTH sides (the global watermark is the min across the
  * two watermark operators, so a view-only sentinel would not move
  * it) and checks field-level parity.
  */
class AttributionStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private type Ev = (Long, Long, Long, String, Double) // id, ts_us, user, type, value

  test("streamed interval-join attribution equals the batch twin, left rows included") {
    val events = graft.core.Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id",
        $"event_type", $"value")
      .as[Ev].collect()
    val maxUs = events.map(_._2).max

    val stream = MemoryStream[Ev](spark)
    val streamed = AttributionStream.attribute(
      stream.toDF().toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us"))
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("attribution_stream").start()
    try {
      stream.addData(events.toSeq: _*)
      q.processAllAvailable()
      // sentinels in LATER batches: one per side (negative users never
      // join real traffic), 48 h / 72 h past the corpus, so the global
      // watermark passes every real purchase's 24 h expiry and the
      // left-outer rows flush
      stream.addData(
        (-1L, maxUs + 48L * 3600L * 1000000L, -1L, "view", 0.0),
        (-2L, maxUs + 48L * 3600L * 1000000L, -2L, "purchase", 0.0))
      q.processAllAvailable()
      stream.addData(
        (-3L, maxUs + 72L * 3600L * 1000000L, -1L, "view", 0.0),
        (-4L, maxUs + 72L * 3600L * 1000000L, -2L, "purchase", 0.0))
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row): (Long, Option[Long]) =
        (r.getAs[Long]("purchase_event_id"),
          if (r.isNullAt(r.fieldIndex("view_event_id"))) None
          else Some(r.getAs[Long]("view_event_id")))
      val got = spark.table("attribution_stream")
        .filter($"user_id" >= 0).collect().map(key).toSet
      val want = AttributionStream.attribute(graft.core.Tables.events(spark, sf))
        .collect().map(key).toSet
      assert(want.nonEmpty && got == want,
        s"stream/batch mismatch: ${(want -- got).take(5)} missing, ${(got -- want).take(5)} extra")
      // both semantics arms are load-bearing on this corpus
      assert(want.exists(_._2.isEmpty), "no unattributed purchases")
      assert(want.exists(_._2.nonEmpty), "no attributed purchases")
      // multi-view attribution happens (interval join, not as-of)
      val multi = want.toSeq.filter(_._2.nonEmpty).groupBy(_._1).values.map(_.size)
      assert(multi.exists(_ > 1), "no purchase with several views in-window")
    } finally q.stop()
  }

  test("batch attribution joins on the user_id equality key, never a cartesian") {
    val plan = AttributionStream.attribute(graft.core.Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a product:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"no equi-join in the attribution plan:\n${plan.take(2000)}")
  }
}
