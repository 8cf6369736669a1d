package graft

import graft.streaming.DriftStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming drift monitor's final table must EXACTLY equal the
  * batch `embedding_drift` rows — field-level parity including the
  * z scores — after the odd-half stream fully arrives, and it must
  * update incrementally (the mid-stream table is a valid verdict
  * over the rows seen so far, not a partial artifact).
  */
class DriftStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("final streamed drift table equals the batch twin field-for-field") {
    val d = java.nio.file.Files.createTempDirectory("graft-drift-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val emb = graft.core.Tables.embeddings(spark, sf)
    val base = DriftStream.baseline(spark, sf)
    val stream = spark.readStream.schema(emb.schema).parquet(d.toString)
    val q = DriftStream.drift(stream, base)
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("drift_stream")
      val want = graft.operators.EmbeddingStats.embeddingDrift(spark, sf)
      assert(got.count() == want.count() && want.count() > 0)
      assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    } finally q.stop()
  }

  test("mid-stream verdicts cover only the arrived slice and stay bounded") {
    // two files arriving one at a time: after the first, the monitor
    // must report n_b = |odd rows of file 1| per dim — a valid
    // verdict over what arrived, never a partial/corrupt row
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val half1 = emb.filter($"vec_id" < 250)
    val d = java.nio.file.Files.createTempDirectory("graft-drift-stream2")
    half1.coalesce(1).write.parquet(d.toString + "/p1")
    val base = DriftStream.baseline(spark, sf)
    val stream = spark.readStream.schema(emb.schema)
      .parquet(d.toString + "/p*")
    val q = DriftStream.drift(stream, base)
      .writeStream.outputMode("complete")
      .format("memory").queryName("drift_stream_mid").start()
    try {
      q.processAllAvailable()
      val n1 = half1.filter($"vec_id" % 2 === 1).count()
      val mid = spark.table("drift_stream_mid").collect()
      assert(mid.nonEmpty && mid.forall(_.getAs[Long]("n_b") == n1))
      // second half arrives; the SAME query's table converges to full
      emb.filter($"vec_id" >= 250).coalesce(1)
        .write.parquet(d.toString + "/p2")
      q.processAllAvailable()
      val fin = spark.table("drift_stream_mid").collect()
      val nAll = emb.filter($"vec_id" % 2 === 1).count()
      assert(fin.forall(_.getAs[Long]("n_b") == nAll))
    } finally q.stop()
  }
}
