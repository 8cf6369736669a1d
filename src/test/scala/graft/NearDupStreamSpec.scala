package graft

import graft.streaming.NearDupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup candidates: one-batch output must EXACTLY equal
  * the batch MinHash operator's pair table (same sketch, same bands,
  * same estimate arithmetic); replayed doc_ids emit nothing; and a
  * bucket the watermark has passed is gone — a late near-dup of an
  * expired document finds no state. */
class NearDupStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private type Doc = (Long, String, java.sql.Timestamp)

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def corpus: Seq[(Long, String)] =
    graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

  test("single-batch stream output equals the batch MinHash pair table") {
    val stream = MemoryStream[Doc](spark)
    val q = NearDupStream.candidates(
        stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream").start()
    try {
      val t0 = 1700000000000L
      stream.addData(corpus.map { case (id, tx) => (id, tx, ts(t0)) }: _*)
      q.processAllAvailable()
      val got = spark.table("neardup_stream")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("n_bands"), max($"est_jaccard_e6").as("est_jaccard_e6"))
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("n_bands"), r.getAs[Long]("est_jaccard_e6"))).toSet
      val want = graft.dedup.Dedup.minhash(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("n_bands"), r.getAs[Long]("est_jaccard_e6"))).toSet
      assert(want.nonEmpty, "batch operator found no pairs — vacuous corpus")
      assert(got == want,
        s"stream/batch mismatch: extra=${got -- want} missing=${want -- got}")

      // replay: the same documents again produce NO new candidates
      val before = spark.table("neardup_stream").count()
      stream.addData(corpus.map { case (id, tx) => (id, tx, ts(t0 + 1000L)) }: _*)
      q.processAllAvailable()
      assert(spark.table("neardup_stream").count() == before,
        "replayed doc_ids emitted candidates")
    } finally q.stop()
  }

  test("expired buckets are dropped: a late near-dup finds no state") {
    val delayMs = 3600000L // 1 h
    val stream = MemoryStream[Doc](spark)
    val q = NearDupStream.candidates(
        stream.toDF().toDF("doc_id", "text", "ts"), delayMs = delayMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_expiry").start()
    try {
      val t0 = 1700000000000L
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      stream.addData((1L, text, ts(t0)))
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past
      // t0 + delay, the second lets the (dataless) timeout fire and
      // remove doc 1's buckets
      stream.addData((900L, "one unrelated sentinel document here", ts(t0 + 10 * delayMs)))
      q.processAllAvailable()
      stream.addData((901L, "another unrelated sentinel document here", ts(t0 + 11 * delayMs)))
      q.processAllAvailable()
      // doc 2 is an exact near-dup of doc 1, but arrives after expiry
      stream.addData((2L, text, ts(t0 + 12 * delayMs)))
      q.processAllAvailable()
      val latePairs = spark.table("neardup_expiry")
        .filter($"doc_a" === 1L && $"doc_b" === 2L).count()
      assert(latePairs == 0L, "expired bucket still matched a late arrival")
      // control: a fresh near-dup INSIDE the window does match
      stream.addData((3L, text, ts(t0 + 12 * delayMs + 1000L)))
      q.processAllAvailable()
      val freshPairs = spark.table("neardup_expiry")
        .filter($"doc_a" === 2L && $"doc_b" === 3L).count()
      assert(freshPairs > 0L, "in-window near-dup not matched")
    } finally q.stop()
  }
}
