package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("same-bucketed tables join with zero Exchange (shuffle-free co-location)") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val docs = graft.core.Tables.documents(spark, sf).select($"doc_id", $"source")
    val chunks = graft.operators.Collections.chunkDocuments(spark, sf)
      .select($"doc_id", $"chunk_idx", $"chunk_len")
    Bucketed.write(docs, "docs_b", s"$base/docs", "doc_id", nBuckets = 4)
    Bucketed.write(chunks, "chunks_b", s"$base/chunks", "doc_id", nBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path so the assertion targets the
      // co-location property, not the small-table special case
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.colocatedJoin(spark, "docs_b", "chunks_b", "doc_id")
        .groupBy($"source").agg(count(lit(1)).as("n"))
      // correctness: same result as the plain join
      val expected = chunks.join(docs, Seq("doc_id"))
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == expected)
      // plan: the join itself reads bucket-aligned splits — no
      // Exchange below the join (the groupBy above it may shuffle)
      val plan = Bucketed.colocatedJoin(spark, "docs_b", "chunks_b", "doc_id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n${plan.take(2000)}")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n${plan.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS chunks_b")
    }
  }
}
