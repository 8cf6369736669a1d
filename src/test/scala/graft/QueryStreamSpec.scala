package graft

import graft.index.IvfIndex
import graft.streaming.{IndexStream, QueryStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous ANN serving: streamed query batches must get exactly
  * the batch probe-search answers, replayed batch ids must rewrite
  * their own output directory idempotently, and a mutation applied by
  * [[IndexStream]] must be visible to the NEXT query batch on the
  * same layout — the full maintain-and-serve composition on one
  * durable index. */
class QueryStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private type Query = (Long, Array[Float])

  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")
  private lazy val base = emb.filter($"vec_id" >= 50)
  private lazy val vecs: Map[Long, Array[Float]] =
    emb.filter($"vec_id" < 60).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readOut(out: String) =
    spark.read.option("basePath", out).parquet(out)

  private def hitKey(r: org.apache.spark.sql.Row): (Long, Long, Long, Long) =
    (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Long]("score_e6"), r.getAs[Long]("rank"))

  test("streamed query batches get hash-exact batch answers, one directory per batch") {
    val dir = tmp("graft-qstream-ivf")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val out = tmp("graft-qstream-out")
    val stream = MemoryStream[Query](spark)
    val q = QueryStream.serveIvf(stream.toDF().toDF("q_id", "q_vec"), dir, out)
      .option("checkpointLocation", tmp("graft-qstream-ckpt"))
      .start()
    try {
      stream.addData((50L, vecs(50L)), (51L, vecs(51L)))
      q.processAllAvailable()
      stream.addData((52L, vecs(52L)))
      q.processAllAvailable()
      val got = readOut(out).collect()
      // batch boundaries preserved: batch 0 carries q 50+51, batch 1
      // q 52 (partition discovery types the dir column as int)
      assert(got.filter(_.getAs[Int]("batch") == 0)
        .map(_.getAs[Long]("q_id")).toSet == Set(50L, 51L))
      assert(got.filter(_.getAs[Int]("batch") == 1)
        .map(_.getAs[Long]("q_id")).toSet == Set(52L))
      // value-exact vs the batch path on the same layout
      val expected = IvfIndex.searchPersisted(spark, dir,
        Seq((50L, vecs(50L)), (51L, vecs(51L)), (52L, vecs(52L)))
          .toDF("q_id", "q_vec")).collect()
      assert(got.map(hitKey).sorted.toSeq == expected.map(hitKey).sorted.toSeq,
        "streamed answers differ from the batch probe search")
      // each query's own vector leads at exact score (it is in the index)
      val top1 = got.filter(_.getAs[Long]("rank") == 1L)
      assert(top1.forall(r => r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id")
        && r.getAs[Long]("score_e6") == 1000000L))
    } finally q.stop()
  }

  test("replayed batch id rewrites its own directory idempotently") {
    val dir = tmp("graft-qstream-replay")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val out = tmp("graft-qstream-replay-out")
    val batch = Seq((50L, vecs(50L)), (51L, vecs(51L))).toDF("q_id", "q_vec")
    QueryStream.serveBatch(batch, 0L, dir, out, IvfIndex.defaultNProbe, 10)
    val first = readOut(out).collect().map(hitKey).sorted.toSeq
    QueryStream.serveBatch(batch, 0L, dir, out, IvfIndex.defaultNProbe, 10)
    val second = readOut(out).collect().map(hitKey).sorted.toSeq
    assert(second == first, "replayed batch id duplicated or changed output")
  }

  test("a mutation applied by IndexStream is visible to the next query batch") {
    val dir = tmp("graft-qstream-fresh")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val out = tmp("graft-qstream-fresh-out")
    // vec 0 is NOT in the base index: the pre-mutation query must not
    // find it as its own neighbor...
    QueryStream.serveBatch(Seq((0L, vecs(0L))).toDF("q_id", "q_vec"),
      0L, dir, out, IvfIndex.defaultNProbe, 10)
    val before = readOut(out).filter($"batch" === 0L).collect()
    assert(before.nonEmpty && !before.exists(_.getAs[Long]("neighbor_id") == 0L))
    // ...the maintenance stream upserts it...
    IndexStream.applyIvfBatch(
      Seq((0L, vecs(0L), "upsert")).toDF("vec_id", "embedding", "op"),
      batchId = 0L, dir)
    // ...and the NEXT query batch on the same layout serves it at 1.0
    QueryStream.serveBatch(Seq((0L, vecs(0L))).toDF("q_id", "q_vec"),
      1L, dir, out, IvfIndex.defaultNProbe, 10)
    val after = readOut(out).filter($"batch" === 1L)
      .filter($"rank" === 1L).collect()
    assert(after.length == 1 && after.head.getAs[Long]("neighbor_id") == 0L
      && after.head.getAs[Long]("score_e6") == 1000000L,
      "post-upsert query batch does not see the streamed-in vector")
  }
}
