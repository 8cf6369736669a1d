package graft

import graft.index.NswIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph family's compressed serving tier: the ADC-scored beam
  * walk ([[NswIndex.searchPersistedPq]]) navigates on the m-byte PQ
  * codes instead of full-width floats and exact-reranks only its
  * shortlist. The quantized walk must still FIND the right
  * neighborhood (the measured recall bar — also served nightly as
  * `index_recall_eval`'s `nsw_pq` row), and what it serves must be
  * EXACT (rerank scores recomputed from raw vectors, never ADC
  * leakage). The PqEncode/PqAdc expressions' interpreted-vs-codegen
  * parity is PqSpec's; this suite covers the walk built on them.
  */
class NswPqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  private def layout(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nsw-pq-spec")
      .toString
    NswIndex.persist(emb, NswIndex.edgesCached(spark, sf), dir)
    NswIndex.persistPq(spark, dir)
    dir
  }

  test("ADC beam walk clears recall@5 >= 0.85 vs brute force; self is top-1 exact") {
    val dir = layout()
    // 25 probes: a 5-probe recall estimate sits on the bar (the PqSpec
    // discipline) — widen the sample
    val queries = emb.filter($"vec_id" < 25)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      .localCheckpoint(true)
    val got = NswIndex.searchPersistedPq(spark, dir, queries)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val brute = emb.crossJoin(broadcast(queries))
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.core.Stab.e6(
          graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6"))
    val want = graft.operators.KnnSearch.topK(brute, 5, asc = false)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recall = want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }.sum / want.size
    assert(recall >= 0.85, s"NSW-PQ recall@5 $recall < 0.85")
    // every query vector survives the quantized walk and reranks to
    // its own exact top-1
    val top1 = NswIndex.searchPersistedPq(spark, dir, queries, k = 1).collect()
    assert(top1.length == 25)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id") &&
        r.getAs[Long]("score_e6") == 1000000L,
        s"q=${r.getAs[Long]("q_id")} top1 not exact self")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("served scores are the exact cosine, not the ADC approximation; the walk is deterministic") {
    val dir = layout()
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      .localCheckpoint(true)
    val hits = NswIndex.searchPersistedPq(spark, dir, queries)
      .localCheckpoint(true)
    // recompute each served (q, neighbor) score from raw vectors: the
    // exact-rerank contract is byte-equality on the stabilized score
    val recomputed = hits
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding"), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select($"q_id", $"neighbor_id", $"score_e6",
        graft.core.Stab.e6(graft.functions.vectors.cosineSim(
          $"embedding", $"q_vec")).as("exact_e6"))
    assert(recomputed.filter($"score_e6" =!= $"exact_e6").isEmpty,
      "a served score diverged from the exact cosine")
    // deterministic: a second walk over the same layout serves the
    // identical rows (codes and LUTs are deterministic, ties pinned)
    val again = NswIndex.searchPersistedPq(spark, dir, queries)
    assert(graft.index.SnapshotLayout.serveDiffCount(hits, again, "n")
      .collect().head.getLong(0) == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
