package graft

import graft.embed.Embedder
import graft.functions.vectors._
import graft.operators.Collections
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-granular /query parity: the brute path must equal an
  * independently assembled exact top-k over the chunk embeddings, and
  * the ANN variants must search the same chunk corpus (overlap with
  * the exact result, full k rows, chunk-granular ids). */
class ChunkQuerySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def bruteExpected(k: Int = 10): Seq[(Long, Long)] = {
    val qVec = spark.range(1)
      .select(Embedder.embedText(lit(Collections.DemoQueryText)).as("q"))
      .as[Array[Float]].head()
    Collections.chunkDocuments(spark, sf)
      .select($"doc_id", $"chunk_idx",
        graft.core.Stab.e6(cosineSim(Embedder.embedText($"chunk_text"), typedlit(qVec)))
          .as("score_e6"))
      .as[(Long, Long, Long)].collect().toSeq
      .sortBy { case (d, c, s) => (-s, d * 1000L + c) }
      .take(k).map { case (d, c, _) => (d, c) }
  }

  test("brute chunk query equals the exact top-k over chunk embeddings, ranked 1..k") {
    val res = Collections.queryTextChunks(spark, sf)
      .select($"doc_id", $"chunk_idx", $"rank").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._3)
    assert(res.map(_._3) == (1L to 10L))
    assert(res.map(r => (r._1, r._2)) == bruteExpected())
  }

  test("ivf and nsw chunk variants return k chunk hits overlapping the exact top-k") {
    val exact = bruteExpected().toSet
    for (idx <- Seq("ivf", "nsw")) {
      val hits = Collections.queryTextChunks(spark, sf, idx)
        .select($"doc_id", $"chunk_idx").as[(Long, Long)].collect().toSeq
      assert(hits.size == 10, s"$idx: expected k rows")
      assert(hits.distinct.size == 10, s"$idx: duplicate chunk hits")
      assert(hits.toSet.intersect(exact).size >= 5,
        s"$idx: chunk hits share <5 of the exact top-10 — wrong corpus or broken search")
    }
  }
}
