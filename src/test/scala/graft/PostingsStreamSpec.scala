package graft

import graft.streaming.PostingsStream
import graft.text.Bm25
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Continuous lexical-index maintenance: a document mutation stream
  * driven through [[PostingsStream]] must converge the postings store
  * to exactly the batch derivation of the same corpus (hash-exact
  * BM25 parity), keep exact-long corpus stats under replaces and
  * deletes, and skip replayed batch ids outright. */
class PostingsStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private type Mutation = (Long, String, String)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed store converges to hash-exact BM25 parity with the batch path") {
    val store = tmp("graft-postings-store")
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val (evens, odds) = docs.partition(_._1 % 2 == 0)
    // batch 0: the even docs, doc 1 with WRONG text (replaced later),
    // and a junk doc that must vanish again
    val b0 = evens.map { case (id, t) => (id, t, "upsert") } ++ Seq(
      (1L, "totally wrong placeholder text", "upsert"),
      (999999L, "junk junk junk spark data data", "upsert"))
    // batch 1: the odd docs (doc 1's upsert REPLACES the wrong text),
    // junk doc deleted, plus a delete of a never-present id (no-op)
    val b1 = odds.map { case (id, t) => (id, t, "upsert") } ++ Seq(
      (999999L, "", "delete"), (888888L, "", "delete"))
    PostingsStream.applyBatch(b0.toSeq.toDF("doc_id", "text", "op"), 0L, store)
    PostingsStream.applyBatch(b1.toSeq.toDF("doc_id", "text", "op"), 1L, store)
    // stats: exactly the corpus constants, despite replace + delete
    val expTokens = graft.text.TextOps.textTokens(spark, sf)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens_ws")).head().getLong(0)
    assert(PostingsStream.readStats(spark, store) == (docs.length.toLong, expTokens))
    // serving from the store == the batch entry, row for row
    val served = PostingsStream.serve(spark, store).collect().map(_.toSeq)
    val batch = Bm25.ranked(spark, sf).collect().map(_.toSeq)
    assert(served.toSeq == batch.toSeq)
  }

  test("replayed batch id leaves store, stats, and ranking untouched") {
    val store = tmp("graft-postings-replay")
    val b0 = Seq((10L, "spark join filter data", "upsert"),
      (11L, "window agg stream data", "upsert"))
    PostingsStream.applyBatch(b0.toDF("doc_id", "text", "op"), 0L, store)
    val stats0 = PostingsStream.readStats(spark, store)
    val served0 = PostingsStream.serve(spark, store).collect().map(_.toSeq)
    // replay id 0 with DIFFERENT (hostile) content: must be skipped
    PostingsStream.applyBatch(
      Seq((10L, "", "delete"), (12L, "sneaky replay doc", "upsert"))
        .toDF("doc_id", "text", "op"), 0L, store)
    assert(PostingsStream.readStats(spark, store) == stats0)
    assert(PostingsStream.serve(spark, store).collect().map(_.toSeq).toSeq
      == served0.toSeq)
    // the NEXT id applies normally
    PostingsStream.applyBatch(
      Seq((10L, "", "delete")).toDF("doc_id", "text", "op"), 1L, store)
    assert(PostingsStream.readStats(spark, store)._1 == 1L)
  }

  test("maintain() drives the store through a real MemoryStream sink") {
    val store = tmp("graft-postings-mem")
    val stream = MemoryStream[Mutation](spark)
    val q = PostingsStream.maintain(
        stream.toDF().toDF("doc_id", "text", "op"), store)
      .option("checkpointLocation", tmp("graft-postings-ckpt"))
      .start()
    try {
      stream.addData((0L, "spark join filter and data table", "upsert"),
        (1L, "window agg stream and data join", "upsert"))
      q.processAllAvailable()
      assert(PostingsStream.readStats(spark, store)._1 == 2L)
      stream.addData((0L, "", "delete"))
      q.processAllAvailable()
      assert(PostingsStream.readStats(spark, store)._1 == 1L)
      val served = PostingsStream.serve(spark, store).collect()
      assert(served.nonEmpty)
      assert(served.forall(_.getAs[Long]("doc_id") == 1L))
    } finally q.stop()
  }
}
