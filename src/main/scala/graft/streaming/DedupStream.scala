package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication — the live twin of the batch dedup family:
  * at-least-once sources (replayed files, retried producers) are
  * collapsed to exactly-once rows by key inside the watermark window.
  *
  * `dropDuplicatesWithinWatermark` bounds state by event time: a key
  * is remembered only until the watermark passes it, so state is
  * O(keys per window), not O(all keys ever) — the property that makes
  * this viable on an unbounded 100 TB/day stream where a plain
  * `dropDuplicates` would accumulate state forever.
  */
object DedupStream {

  /** Deduplicate an events stream by `event_id`, tolerating
    * duplicates that arrive up to `delay` apart in event time. */
  def dedupEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
}
