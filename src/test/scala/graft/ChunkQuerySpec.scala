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

  test("generational chunk query: answers through the pointer pre- and post-cutover, no session rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft-chunk-gen-spec")
      .toString + "/root"
    val corpus = Collections.chunkEmbeddings(spark, sf)
    // generation 1 fits the vec_id % 5 != 0 slice; the remaining fifth
    // lands as delta batch 1
    graft.index.SnapshotLayout.initGen(
      graft.index.IvfIndex.build(spark,
        corpus.filter(pmod($"vec_id", lit(5L)) =!= 0L)), root)
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = corpus.filter(pmod($"vec_id", lit(5L)) === 0L),
      deletes = corpus.limit(0).select($"vec_id"))
    // a DELTA chunk's own text as the query: its embedding is
    // identical, so a serve that can see it must rank it top-1 exact
    // packed chunk id = doc_id * 1e6 + chunk_idx (Collections'
    // packedChunkId base)
    val delta = Collections.chunkDocuments(spark, sf)
      .filter(pmod($"doc_id" * 1000000L + $"chunk_idx", lit(5L)) === 0L)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .orderBy($"doc_id", $"chunk_idx").limit(1)
      .as[(Long, Long, String)].head()
    def top1(asOf: Long): (Long, Long, Long) =
      Collections.queryTextChunksGen(spark, root, sf,
          queryText = delta._3, k = 5, asOf = asOf)
        .filter($"rank" === 1L)
        .select($"doc_id", $"chunk_idx", $"confidence_e6")
        .as[(Long, Long, Long)].head()
    // PRE-cutover: the pointer serves generation 1 + its delta log —
    // the beam-linked delta chunk is already servable at head
    val pre = top1(Long.MaxValue)
    assert(pre == (delta._1, delta._2, 1000000L), s"pre-cutover head: $pre")
    // cutover: a fresh fit over everything into generation 2
    assert(graft.index.SnapshotLayout.newGeneration(spark, root) == 2)
    // POST-cutover: the same call (no rebuild, no session state) now
    // routes to the successor and still answers exactly
    val post = top1(Long.MaxValue)
    assert(post == (delta._1, delta._2, 1000000L), s"post-cutover head: $post")
    assert(graft.index.Generations.route(spark, root, Long.MaxValue)
      .endsWith("generation=2"))
    // the HISTORICAL as-of routes to generation 1's base, where the
    // delta chunk does not exist yet
    val old = Collections.queryTextChunksGen(spark, root, sf,
        queryText = delta._3, k = 5, asOf = 0L)
      .select($"doc_id", $"chunk_idx").as[(Long, Long)].collect()
    assert(old.length == 5 && !old.contains((delta._1, delta._2)),
      s"as-of 0 leaked the delta chunk: ${old.toSeq}")
    assert(graft.index.Generations.route(spark, root, 0L)
      .endsWith("generation=1"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
  }
}
