package graft

import graft.streaming.QualityStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming quality gate is stateless, so its output over a
  * file-sourced documents stream must EXACTLY equal the batch twin
  * applied to the same rows — field-level parity, not just counts. */
class QualityStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming quality gate has field-level parity with the batch twin") {
    val d = java.nio.file.Files.createTempDirectory("graft-quality-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      d.resolve("documents.parquet"))
    val docs = graft.core.Tables.documents(spark, sf)
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(d.toString)
    val q = QualityStream.qualityGate(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("quality_stream")
      val want = QualityStream.qualityGate(docs)
      assert(got.count() == want.count() && want.count() > 0)
      assert(got.except(want).count() == 0 && want.except(got).count() == 0)
      // the gate actually rejects something on this corpus
      assert(want.count() < docs.count())
    } finally q.stop()
  }
}
