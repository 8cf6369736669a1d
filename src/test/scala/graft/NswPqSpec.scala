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

  test("filtered ADC walk: pre-filter semantics, recall@10 >= 0.85 vs the brute filtered oracle") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val dir = java.nio.file.Files.createTempDirectory("graft-nsw-pqf-spec")
      .toString
    NswIndex.persist(all, NswIndex.edgesCached(spark, sf), dir,
      metaCols = Seq("label"))
    NswIndex.persistPq(spark, dir)
    val queries = all.filter($"vec_id" < 25)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
      .localCheckpoint(true)
    val hits = NswIndex.searchPersistedPqFiltered(spark, dir, queries,
      col("label") === col("q_label")).localCheckpoint(true)
    // pre-filter semantics: every query serves exactly k legal rows
    val labels = all.select($"vec_id".as("neighbor_id"), $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qLabels = queries.select($"q_id", $"q_label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQ = hits.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 25 && byQ.values.forall(_.length == 10),
      "a filtered query came up short of k")
    byQ.foreach { case (q, rs) =>
      assert(rs.forall(r => labels(r.getAs[Long]("neighbor_id")) == qLabels(q)),
        s"q=$q served an illegal neighbor")
    }
    // recall vs the brute FILTERED oracle
    val brute = all.crossJoin(broadcast(queries))
      .filter($"label" === $"q_label")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.core.Stab.e6(
          graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6"))
    val want = graft.operators.KnnSearch.topK(brute, 10, asc = false)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val got = byQ.map { case (q, rs) =>
      q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recall = want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }.sum / want.size
    assert(recall >= 0.85, s"filtered NSW-PQ recall@10 $recall < 0.85")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("versioned graph sidecar: deltas encode, rollback prunes codes, compaction folds them, as-of serves version") {
    val path = java.nio.file.Files.createTempDirectory("graft-nsw-vpq")
      .toString + "/nsw"
    val base = emb.filter($"vec_id" >= 50).localCheckpoint(true)
    graft.index.NswSnapshotLayout.init(base,
      NswIndex.buildEdgesLsh(base), path)
    graft.index.NswSnapshotLayout.initPq(spark, path)
    // batch 1: upserts — applyBatch must encode them with the frozen
    // codebooks, or they are invisible to the ADC walk
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 10),
      deletes = emb.limit(0).select($"vec_id"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/pq/codes/batch_id=1")), "delta batch not encoded")
    // the walk serves the delta rows: a delta probe finds itself
    val q3 = emb.filter($"vec_id" === 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val head = graft.index.NswSnapshotLayout
      .searchAsOfPq(spark, path, Long.MaxValue, q3).collect()
    assert(head.exists(r => r.getAs[Long]("neighbor_id") == 3L &&
      r.getAs[Long]("score_e6") == 1000000L), s"${head.toSeq}")
    // batch 2: delete id 3 — the as-of serves version both ways
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.limit(0),
      deletes = emb.filter($"vec_id" === 3).select($"vec_id"))
    val at2 = graft.index.NswSnapshotLayout
      .searchAsOfPq(spark, path, Long.MaxValue, q3).collect()
    assert(!at2.exists(_.getAs[Long]("neighbor_id") == 3L),
      "tombstoned id served from the compressed tier")
    val at1 = graft.index.NswSnapshotLayout
      .searchAsOfPq(spark, path, 1L, q3).collect()
    assert(at1.exists(r => r.getAs[Long]("neighbor_id") == 3L &&
      r.getAs[Long]("score_e6") == 1000000L), "as-of 1 lost the live row")
    // rollback kills the delete AND its codes stay consistent
    graft.index.NswSnapshotLayout.rollback(spark, path, 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/pq/codes/batch_id=2")))
    val back = graft.index.NswSnapshotLayout
      .searchAsOfPq(spark, path, Long.MaxValue, q3).collect()
    assert(back.exists(_.getAs[Long]("neighbor_id") == 3L))
    graft.core.Checkpoints.free(base)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("versioned filtered ADC walk: predicate on live code rows, all k legal at any as-of point") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val path = java.nio.file.Files.createTempDirectory("graft-nsw-vpqf")
      .toString + "/nsw"
    val base = all.filter($"vec_id" >= 50).localCheckpoint(true)
    graft.index.NswSnapshotLayout.init(base,
      NswIndex.buildEdgesLsh(base.select($"vec_id", $"embedding")), path)
    graft.index.NswSnapshotLayout.initPq(spark, path)
    // the delta's labels ride its encode (applyBatch mirrors metadata
    // into the code rows) — a filtered as-of serve can see them
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 10),
      deletes = all.limit(0).select($"vec_id"))
    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
      .localCheckpoint(true)
    val labels = all.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def checkLegal(hits: Array[org.apache.spark.sql.Row], where: String): Unit = {
      val byQ = hits.groupBy(_.getAs[Long]("q_id"))
      assert(byQ.size == 5 && byQ.values.forall(_.length == 10),
        s"$where: a filtered query came up short of k")
      byQ.foreach { case (q, rs) =>
        assert(rs.forall(r =>
          labels(r.getAs[Long]("neighbor_id")) == labels(q)),
          s"$where: q=$q served an illegal neighbor")
      }
    }
    val head = graft.index.NswSnapshotLayout.searchAsOfPqFiltered(spark,
      path, Long.MaxValue, queries, col("label") === col("q_label"))
      .collect()
    checkLegal(head, "head")
    // the probes' own (label-matching) delta rows rerank to exact self
    assert((0L until 5L).forall(q => head.exists(r =>
      r.getAs[Long]("q_id") == q && r.getAs[Long]("neighbor_id") == q &&
        r.getAs[Long]("score_e6") == 1000000L)), "self not served at head")
    // as of batch 0 the delta ids do not exist — still all-legal, no leak
    val old = graft.index.NswSnapshotLayout.searchAsOfPqFiltered(spark,
      path, 0L, queries, col("label") === col("q_label")).collect()
    checkLegal(old, "asof0")
    assert(!old.exists(_.getAs[Long]("neighbor_id") < 10L),
      "as-of 0 leaked a delta row through the filtered quantized serve")
    graft.core.Checkpoints.free(base)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("generational graph sidecar: the cutover carries the PQ geometry; the ADC walk routes across generations") {
    val root = java.nio.file.Files.createTempDirectory("graft-nsw-gpq")
      .toString + "/root"
    val base = emb.filter($"vec_id" >= 50 && $"vec_id" < 170)
      .localCheckpoint(true)
    graft.index.NswSnapshotLayout.initGen(base,
      NswIndex.buildEdgesLsh(base), root)
    graft.index.NswSnapshotLayout.initPq(spark,
      graft.index.Generations.genPath(root, 1))
    graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    assert(graft.index.NswSnapshotLayout.newGeneration(spark, root) == 2)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"${graft.index.Generations.genPath(root, 2)}/pq/codes")),
      "cutover dropped the sidecar")
    val q2 = emb.filter($"vec_id" === 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // head routes to the successor's fresh fit + fresh sidecar
    val head = graft.index.NswSnapshotLayout
      .searchAsOfPqGen(spark, root, Long.MaxValue, q2).collect()
    assert(head.exists(r => r.getAs[Long]("neighbor_id") == 2L &&
      r.getAs[Long]("score_e6") == 1000000L), s"${head.toSeq}")
    // a pre-cutover as-of routes to generation 1's sidecar, where the
    // delta id does not exist at batch 0
    val old = graft.index.NswSnapshotLayout
      .searchAsOfPqGen(spark, root, 0L, q2).collect()
    assert(old.nonEmpty && !old.exists(_.getAs[Long]("neighbor_id") == 2L),
      s"as-of 0 leaked the delta row: ${old.toSeq}")
    graft.core.Checkpoints.free(base)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
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
