package graft

import graft.streaming.ClusterStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming exemplar router is stateless, so its output over a
  * file-sourced embeddings stream must EXACTLY equal the batch
  * assignment of the same rows — field-level parity including the
  * stabilized scores and tie-breaks. */
class ClusterStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming assignment has field-level parity with the batch twin") {
    val d = java.nio.file.Files.createTempDirectory("graft-cluster-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val emb = graft.core.Tables.embeddings(spark, sf)
    val ex = ClusterStream.exemplars(spark, sf)
    val stream = spark.readStream.schema(emb.schema).parquet(d.toString)
    val q = ClusterStream.assign(stream, ex)
      .writeStream.outputMode("append")
      .format("memory").queryName("cluster_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cluster_stream")
      val want = ClusterStream.assign(emb, ex)
      assert(got.count() == want.count() && want.count() > 0)
      assert(got.except(want).count() == 0 && want.except(got).count() == 0)
      // the router actually spreads load: more than one cluster used
      assert(got.select("cluster_id").distinct().count() > 1)
    } finally q.stop()
  }
}
