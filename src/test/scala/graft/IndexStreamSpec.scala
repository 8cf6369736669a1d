package graft

import graft.index.{IndexMeta, IvfIndex, NswIndex}
import graft.streaming.IndexStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous index maintenance (VERDICT r4 #1b): a mutation stream
  * driven through [[IndexStream]] must apply deletes before upserts
  * within a micro-batch (a batch carrying both ops for one id
  * converges to "present"), keep the layout id-unique under replayed
  * batches with a frozen drift counter, and fire the drift-envelope
  * rebuild mid-stream when a batch pushes accumulated drift past the
  * threshold — the streaming twin of the reference's mutating
  * endpoints (/root/reference/src/models/ivf_index.py:90-137,
  * nsw_index.py:54-113).
  */
class IndexStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private type Mutation = (Long, Array[Float], String)

  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")
  private lazy val base = emb.filter($"vec_id" >= 50) // 450 rows → envelope 45
  private lazy val vecs: Map[Long, Array[Float]] =
    emb.filter($"vec_id" < 50).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def meta(path: String): IndexMeta.Meta =
    IndexMeta.read(spark, path).getOrElse(fail(s"no sidecar at $path"))

  private def storedIds(path: String): Map[Long, Long] =
    spark.read.parquet(s"$path/vectors").groupBy($"vec_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def up(id: Long): Mutation = (id, vecs(id), "upsert")
  private def del(id: Long): Mutation = (id, vecs(id), "delete")

  test("IVF stream: mixed batches, delete-before-upsert, replay leaves state and counter fixed") {
    val dir = tmp("graft-ivf-stream")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val stream = MemoryStream[Mutation](spark)
    val q = IndexStream.maintainIvf(
        stream.toDF().toDF("vec_id", "embedding", "op"), dir)
      .option("checkpointLocation", tmp("graft-ivf-stream-ckpt"))
      .start()
    try {
      // batch 1: three new upserts land and are drift
      stream.addData(up(0L), up(1L), up(2L))
      q.processAllAvailable()
      val ids1 = storedIds(dir)
      assert(Seq(0L, 1L, 2L).forall(ids1.get(_).contains(1L)))
      assert(ids1.size == 453 && meta(dir) == IndexMeta.Meta(450L, 3L))

      // batch 2: delete(2) applies; delete(1)+upsert(1) in ONE batch
      // converges to present — deletes run before upserts
      stream.addData(del(2L), del(1L), up(1L))
      q.processAllAvailable()
      val ids2 = storedIds(dir)
      assert(!ids2.contains(2L), "deleted id still served")
      assert(ids2.get(1L).contains(1L), "delete+upsert of one id did not converge to present")
      // drift: removes counted 2 present ids, the re-upsert of 1 counted
      // 1 (it was absent after the in-batch delete)
      assert(meta(dir) == IndexMeta.Meta(450L, 6L))

      // batch 3: a replay of already-applied mutations — layout
      // byte-identical state, drift counter frozen
      stream.addData(up(1L), up(0L), del(2L))
      q.processAllAvailable()
      assert(storedIds(dir) == ids2)
      assert(meta(dir) == IndexMeta.Meta(450L, 6L))

      // the maintained layout actually serves: a streamed-in vector is
      // its own exact nearest neighbor
      val probe = emb.filter($"vec_id" === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val hit = IvfIndex.searchPersisted(spark, dir, probe, k = 3)
        .filter($"q_id" === $"neighbor_id").collect()
      assert(hit.length == 1 && hit.head.getAs[Long]("score_e6") == 1000000L)
    } finally q.stop()
  }

  test("IVF stream: a batch pushing drift past the envelope rebuilds mid-stream") {
    val dir = tmp("graft-ivf-stream-rebuild")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val stream = MemoryStream[Mutation](spark)
    val q = IndexStream.maintainIvf(
        stream.toDF().toDF("vec_id", "embedding", "op"), dir)
      .option("checkpointLocation", tmp("graft-ivf-stream-rebuild-ckpt"))
      .start()
    try {
      // 46 new rows in one trigger: 46/450 > 10% → the policy must
      // re-fit instead of appending a delta
      stream.addData((0L until 46L).map(up): _*)
      q.processAllAvailable()
      assert(meta(dir) == IndexMeta.Meta(496L, 0L),
        "over-envelope streamed batch did not reset the sidecar via rebuild")
      assert(storedIds(dir).size == 496)
    } finally q.stop()
  }

  test("mixed delete+upsert replay of one batch id: layout AND drift counter move by exactly 0") {
    // The replay shape the byte-identity drift logic alone could not
    // absorb (a delete+upsert pair for an applied id re-executes as
    // delete-present +1, re-upsert +1). The batch-id sidecar makes it
    // exactly-once: a redelivered id is skipped outright. MemoryStream
    // never redelivers, so the replay drives the sink's own batch
    // entry point with the SAME batch id.
    val dir = tmp("graft-ivf-mixed-replay")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val mixed = Seq(del(1L), up(1L)).toDF("vec_id", "embedding", "op")
    IndexStream.applyIvfBatch(mixed, batchId = 0L, dir)
    // first delivery: the delete sees id 1 absent (0), the upsert adds it (+1)
    assert(meta(dir) == IndexMeta.Meta(450L, 1L))
    val ids = storedIds(dir)
    assert(ids.get(1L).contains(1L))
    assert(IndexStream.lastAppliedBatch(spark, dir).contains(0L))
    IndexStream.applyIvfBatch(mixed, batchId = 0L, dir) // replay: skipped whole
    assert(storedIds(dir) == ids, "replayed mixed batch changed the layout")
    assert(meta(dir) == IndexMeta.Meta(450L, 1L),
      "replayed batch id moved the drift counter")
    IndexStream.applyIvfBatch(mixed, batchId = 0L, dir) // and again
    assert(storedIds(dir) == ids)
    assert(meta(dir) == IndexMeta.Meta(450L, 1L))
    // a NEW batch id still applies: the skip keys on the id, not the data
    IndexStream.applyIvfBatch(
      Seq(del(1L)).toDF("vec_id", "embedding", "op"), batchId = 1L, dir)
    assert(!storedIds(dir).contains(1L))
    assert(meta(dir) == IndexMeta.Meta(450L, 2L))
  }

  test("IVF stream sink bounds partition file counts via auto-compaction") {
    val dir = tmp("graft-ivf-stream-compact")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def maxFiles: Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/vectors"))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cluster_id="))
        .map(d => fs.listStatus(d.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))).max
    val bound = 2
    (0 until 20).foreach { b =>
      val ids = Seq(b * 2L, b * 2L + 1L).filter(_ < 40L)
      IndexStream.applyIvfBatch(
        ids.map(up).toDF("vec_id", "embedding", "op"),
        batchId = b.toLong, dir, compactFileBound = bound)
      assert(maxFiles <= bound,
        s"after batch $b a partition holds $maxFiles files (> $bound)")
    }
    // everything streamed in is still served exactly once
    val stored = storedIds(dir)
    assert((0L until 40L).forall(stored.get(_).contains(1L)))
    assert(stored.size == 490)
  }

  test("NSW stream sink bounds flat-table file counts via auto-compaction") {
    val dir = tmp("graft-nsw-stream-compact")
    NswIndex.persist(base, NswIndex.buildEdges(base), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(sub: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub"))
        .count(_.getPath.getName.endsWith(".parquet"))
    val bound = 2
    (0 until 10).foreach { b =>
      val ids = Seq(b * 2L, b * 2L + 1L).filter(_ < 20L)
      IndexStream.applyNswBatch(
        ids.map(up).toDF("vec_id", "embedding", "op"),
        batchId = b.toLong, dir, compactFileBound = bound)
      Seq("vectors", "edges").foreach { sub =>
        assert(files(sub) <= bound,
          s"after batch $b $sub holds ${files(sub)} files (> $bound)")
      }
    }
    // everything streamed in is stored exactly once and still serves
    val stored = storedIds(dir)
    assert((0L until 20L).forall(stored.get(_).contains(1L)))
    assert(stored.size == 470)
    val probes = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val hits = NswIndex.searchPersisted(spark, dir, probes, k = 3)
      .filter($"q_id" === $"neighbor_id").collect()
    assert(hits.length == 2 && hits.forall(_.getAs[Long]("score_e6") == 1000000L),
      "compacted NSW layout no longer serves streamed-in nodes")
  }

  test("NSW stream: upserts beam-link and serve; deletes drop vectors and edges") {
    val dir = tmp("graft-nsw-stream")
    NswIndex.persist(base, NswIndex.buildEdges(base), dir)
    val stream = MemoryStream[Mutation](spark)
    val q = IndexStream.maintainNsw(
        stream.toDF().toDF("vec_id", "embedding", "op"), dir)
      .option("checkpointLocation", tmp("graft-nsw-stream-ckpt"))
      .start()
    try {
      stream.addData(up(0L), up(1L))
      q.processAllAvailable()
      assert(meta(dir) == IndexMeta.Meta(450L, 2L))
      val probes = emb.filter($"vec_id" < 2)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val hits = NswIndex.searchPersisted(spark, dir, probes, k = 3)
        .filter($"q_id" === $"neighbor_id").collect()
      assert(hits.length == 2 && hits.forall(_.getAs[Long]("score_e6") == 1000000L),
        "streamed-in NSW nodes not self-servable")

      stream.addData(del(0L))
      q.processAllAvailable()
      assert(meta(dir) == IndexMeta.Meta(450L, 3L))
      assert(spark.read.parquet(s"$dir/vectors").filter($"vec_id" === 0).count() == 0)
      assert(spark.read.parquet(s"$dir/edges")
        .filter($"src" === 0 || $"dst" === 0).count() == 0)
    } finally q.stop()
  }

  test("versioned IVF stream: manifests per batch, as-of serving, replay skip, crash repair") {
    val dir = tmp("graft-ivf-vstream")
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), dir)
    val stream = MemoryStream[Mutation](spark)
    val q = IndexStream.maintainIvfVersioned(
        stream.toDF().toDF("vec_id", "embedding", "op"), dir)
      .option("checkpointLocation", tmp("graft-ivf-vstream-ckpt"))
      .start()
    def live(b: Long): Set[Long] =
      graft.index.SnapshotLayout.asOfAssigned(spark, dir, b)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
    try {
      // stream batch 0 -> layout batch 1: three upserts
      stream.addData(up(0L), up(1L), up(2L))
      q.processAllAvailable()
      assert(graft.index.SnapshotLayout.manifestIds(spark, dir) == Seq(0L, 1L))
      assert(Seq(0L, 1L, 2L).forall(live(1L).contains))

      // stream batch 1 -> layout batch 2: delete(2), delete+upsert(1)
      stream.addData(del(2L), del(1L), up(1L))
      q.processAllAvailable()
      assert(graft.index.SnapshotLayout.manifestIds(spark, dir) == Seq(0L, 1L, 2L))
      val head = live(Long.MaxValue)
      assert(!head.contains(2L), "deleted id still live at head")
      assert(head.contains(1L), "same-batch delete+upsert did not converge to present")
      // AS-OF batch 1 still serves the pre-delete state — the whole
      // point of streaming into the versioned layout
      assert(live(1L).contains(2L))
    } finally q.stop()

    // replay of a completed batch: manifest marker skips it whole
    val replay = Seq(up(0L), up(1L)).toDF("vec_id", "embedding", "op")
    val before = live(Long.MaxValue)
    IndexStream.applyVersionedBatch(replay, streamBatchId = 1L, dir)
    assert(live(Long.MaxValue) == before)
    assert(graft.index.SnapshotLayout.manifestIds(spark, dir) == Seq(0L, 1L, 2L))

    // crash repair: a partial batch-3 apply (files on disk, NO
    // manifest) must be purged by the rollback step and re-applied
    Seq((5L, vecs(5L)) ).toDF("vec_id", "embedding")
      .withColumn("cluster_id", lit(0)).withColumn("batch_id", lit(3L))
      .write.mode("append").partitionBy("cluster_id", "batch_id")
      .parquet(s"$dir/vectors")
    IndexStream.applyVersionedBatch(
      Seq(up(7L)).toDF("vec_id", "embedding", "op"), streamBatchId = 2L, dir)
    val after = live(Long.MaxValue)
    assert(after.contains(7L), "repaired batch 3 not applied")
    assert(!after.contains(5L), "partial pre-crash rows survived the repair")
    assert(graft.index.SnapshotLayout.manifestIds(spark, dir) == Seq(0L, 1L, 2L, 3L))
  }

  test("versioned NSW stream: manifests per batch, as-of serving, deletes drop edges live") {
    val dir = tmp("graft-nsw-vstream")
    val baseCp = base.localCheckpoint(true)
    graft.index.NswSnapshotLayout.init(
      baseCp, NswIndex.buildEdgesLsh(baseCp), dir)
    val stream = MemoryStream[Mutation](spark)
    val q = IndexStream.maintainNswVersioned(
        stream.toDF().toDF("vec_id", "embedding", "op"), dir)
      .option("checkpointLocation", tmp("graft-nsw-vstream-ckpt"))
      .start()
    def liveIds(b: Long): Set[Long] =
      graft.index.NswSnapshotLayout.asOfVectors(spark, dir, b)
        .select($"vec_id").collect().map(_.getLong(0)).toSet
    try {
      stream.addData(up(0L), up(1L), up(2L))
      q.processAllAvailable()
      assert(graft.index.SnapshotLayout.manifestIds(spark, dir) == Seq(0L, 1L))
      assert(Seq(0L, 1L, 2L).forall(liveIds(1L).contains))
      // the streamed-in vector serves from the as-of graph at 1.0
      val probe = emb.filter($"vec_id" === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val hit = graft.index.NswSnapshotLayout
        .searchAsOf(spark, dir, Long.MaxValue, probe, k = 3)
        .filter($"q_id" === $"neighbor_id").collect()
      assert(hit.length == 1 && hit.head.getAs[Long]("score_e6") == 1000000L)

      stream.addData(del(2L))
      q.processAllAvailable()
      assert(!liveIds(Long.MaxValue).contains(2L))
      assert(liveIds(1L).contains(2L), "as-of 1 must still see the later-deleted id")
      // the deleted node's edges left survivors' adjacency
      val (_, edges) = graft.index.NswSnapshotLayout.asOfGraph(spark, dir, Long.MaxValue)
      assert(edges.filter($"src" === 2L || $"dst" === 2L).count() == 0L)
    } finally q.stop()
    // replay of a completed stream batch is a whole no-op
    val before = liveIds(Long.MaxValue)
    IndexStream.applyNswVersionedBatch(
      Seq(up(5L)).toDF("vec_id", "embedding", "op"), streamBatchId = 1L, dir)
    assert(liveIds(Long.MaxValue) == before)
  }

  test("versioned sink compaction cadence bounds batch count; serves identical across it") {
    // a long-running stream: 6 micro-batches against maxBatches=3 /
    // retain=1 — without the cadence the layout would accumulate 7
    // manifests and directory sets; with it, both stay bounded and
    // every serve the retained window answers is IDENTICAL to an
    // uncompacted twin's
    val dir = tmp("graft-ivf-vcomp")
    val twin = tmp("graft-ivf-vcomp-twin")
    val built = IvfIndex.build(spark, base)
    graft.index.SnapshotLayout.init(built, dir)
    graft.index.SnapshotLayout.init(built, twin)
    def mutations(sid: Long): Seq[Mutation] = {
      val ups = (5 * sid until 5 * sid + 5).map(up)
      if (sid == 3L) ups :+ del(0L) else ups
    }
    def manifests(p: String) = graft.index.SnapshotLayout.manifestIds(spark, p)
    def serve(p: String, b: Long): Seq[(Long, Long, Long, Long)] = {
      val qs = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      graft.index.SnapshotLayout.searchAsOf(spark, p, b, qs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    var asof4: Seq[(Long, Long, Long, Long)] = Seq.empty
    (0L to 5L).foreach { sid =>
      val batch = mutations(sid).toDF("vec_id", "embedding", "op")
      IndexStream.applyVersionedBatch(batch, sid, dir, maxBatches = 3, retain = 1)
      IndexStream.applyVersionedBatch(batch, sid, twin, maxBatches = 100, retain = 1)
      assert(manifests(dir).size <= 3,
        s"after stream batch $sid: ${manifests(dir)} exceeds the bound")
      // capture as-of-4 right after its batch lands (sid=3 → layout 4,
      // manifests {2,3,4}): the NEXT batch compacts up to 4, folding
      // this very snapshot into the consolidated base — the serve must
      // not move across that
      if (sid == 3L) asof4 = serve(dir, 4L)
    }
    // bounded structure: manifests are the retained tail, vector batch
    // dirs carry no id below the compaction floor
    val ms = manifests(dir)
    assert(ms == Seq(4L, 5L, 6L), s"unexpected retained manifests: $ms")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/vectors"))
      .filter(_.isDirectory)
      .flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong))
      .toSet
    assert(batchDirs.forall(_ >= 4L), s"stale batch dirs survive: $batchDirs")
    // serve identity across the mid-stream compaction: the captured
    // as-of-4 rows still serve bit-identically now that batch 4 IS the
    // consolidated base, and head matches the never-compacted twin
    assert(serve(dir, 4L) == asof4, "as-of serve moved across compaction")
    assert(manifests(twin) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    assert(serve(dir, Long.MaxValue) == serve(twin, Long.MaxValue),
      "compacted head serve diverges from the uncompacted twin")
    // the deleted id stays dead through compaction
    assert(!graft.index.SnapshotLayout.asOfAssigned(spark, dir, Long.MaxValue)
      .select($"vec_id").collect().map(_.getLong(0)).contains(0L))

    // a replayed ANCIENT batch id — a stream restarted with a fresh
    // checkpoint restarts ids at 0 — has no manifest once compaction
    // folded it away, so without the floor guard it would re-append
    // its rows BELOW the consolidated base with the tombstones gone:
    // id 0 (upserted at layout 1, deleted at 4, folded) would
    // resurrect at head. The guard skips the whole batch instead.
    val headFinal = serve(dir, Long.MaxValue)
    IndexStream.applyVersionedBatch(
      mutations(0L).toDF("vec_id", "embedding", "op"), 0L, dir,
      maxBatches = 3, retain = 1)
    assert(serve(dir, Long.MaxValue) == headFinal,
      "ancient replay moved the head serve")
    assert(manifests(dir) == Seq(4L, 5L, 6L))
    assert(!graft.index.SnapshotLayout.asOfAssigned(spark, dir, Long.MaxValue)
      .select($"vec_id").collect().map(_.getLong(0)).contains(0L),
      "compacted-away tombstone's id resurrected by an ancient replay")
  }

  test("versioned sink + PQ sidecar: every micro-batch encodes, the cadence folds codes, ADC serves match raw") {
    // the round-10 coupling under its operational consumer: a
    // sidecar-bearing versioned layout driven by the streaming sink,
    // with the compaction cadence firing mid-stream — the code table
    // must stay batch-for-batch with the raw rows through encode,
    // fold, and floor-skip, or the ADC serve silently diverges
    val dir = tmp("graft-ivf-vpq") + "/ivf"
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), dir)
    graft.index.SnapshotLayout.initPq(spark, dir)
    def mutations(sid: Long): Seq[Mutation] = {
      val ups = (5 * sid until 5 * sid + 5).map(up)
      if (sid == 3L) ups :+ del(0L) else ups
    }
    (0L to 5L).foreach { sid =>
      IndexStream.applyVersionedBatch(
        mutations(sid).toDF("vec_id", "embedding", "op"), sid, dir,
        maxBatches = 3, retain = 1)
    }
    val qs = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // at exhaustive rerank the ADC serve equals the raw as-of serve at
    // every point the retained window answers — across two inline
    // compactions the stream already ran
    Seq(4L, 5L, 6L, Long.MaxValue).foreach { b =>
      assert(
        rows(graft.index.SnapshotLayout.searchAsOfPq(spark, dir, b, qs,
          rerank = 1000000)) ==
          rows(graft.index.SnapshotLayout.searchAsOf(spark, dir, b, qs)),
        s"streamed ADC as-of-$b diverges from raw")
    }
    // the code table's directory set is bounded by the same floor
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codeDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/pq/codes"))
      .filter(_.isDirectory)
      .flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong))
      .toSet
    assert(codeDirs.forall(_ >= 4L), s"stale code batch dirs survive: $codeDirs")
    // the mid-stream deleted id owns no live code row
    assert(graft.index.SnapshotLayout.asOfCodes(spark, dir, Long.MaxValue)
      .filter($"vec_id" === 0L).count() == 0L,
      "deleted id still owns a live code row after the streamed fold")
  }

  test("versioned sink passes mutation metadata through to a meta-bearing layout") {
    // a meta-bearing layout's applyBatch REQUIRES its metadata
    // columns on every batch — the sink must forward the mutation
    // frame's extra columns (here `label`) instead of projecting the
    // upsert side down to (vec_id, embedding), or every meta-bearing
    // stream fails fast even when the mutations carry the labels
    val dir = tmp("graft-ivf-vmeta") + "/ivf"
    val embL = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    graft.index.SnapshotLayout.init(
      IvfIndex.build(spark, embL.filter($"vec_id" >= 50),
        metaCols = Seq("label")), dir)
    val labels: Map[Long, Int] = embL.filter($"vec_id" < 5).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val batch = Seq(0L, 1L, 2L)
      .map(id => (id, vecs(id), labels(id), "upsert"))
      .toDF("vec_id", "embedding", "label", "op")
    IndexStream.applyVersionedBatch(batch, streamBatchId = 0L, dir)
    val live = graft.index.SnapshotLayout.asOfAssigned(spark, dir, Long.MaxValue)
      .filter($"vec_id" < 3).select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(live == labels.filter(_._1 < 3),
      s"streamed metadata did not ride the reconstruction: $live")
    // and the filtered as-of serve sees the streamed labels in-scan
    val q = embL.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val hits = graft.index.SnapshotLayout.searchAsOfFiltered(
        spark, dir, Long.MaxValue, q, col("label") === col("q_label"), k = 3)
      .filter($"q_id" === $"neighbor_id").collect()
    assert(hits.length == 1 && hits.head.getAs[Long]("score_e6") == 1000000L,
      "streamed-in labeled vector not servable through the filtered as-of path")
  }

  test("persisted sink passes mutation metadata through to a meta-bearing layout") {
    // the in-place twin of the versioned case: applyIvfBatch must
    // forward the mutation frame's metadata to addDeltaRows (which
    // fails fast without it), and the delta rows' labels must land in
    // the posting table for the filtered serve to read
    val dir = tmp("graft-ivf-pmeta")
    val embL = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    IvfIndex.persist(
      IvfIndex.build(spark, embL.filter($"vec_id" >= 50),
        metaCols = Seq("label")), dir)
    val labels: Map[Long, Int] = embL.filter($"vec_id" < 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val batch = labels.toSeq
      .map { case (id, l) => (id, vecs(id), l, "upsert") }
      .toDF("vec_id", "embedding", "label", "op")
    IndexStream.applyIvfBatch(batch, 1L, dir, streamId = "pmeta")
    val stored = spark.read.parquet(s"$dir/vectors")
      .filter($"vec_id" < 3).select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stored == labels, s"delta metadata did not land: $stored")
  }

  test("generational IVF sink: drift trips the envelope mid-stream and the sink cuts over") {
    val root = tmp("graft-gen-sink") + "/root"
    // base fit over 450 rows -> envelope threshold 0.10 = 45 delta rows
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    def mutBatch(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, vecs(i.toLong), "upsert"))
        .toDF("vec_id", "embedding", "op")
    // batch 0: 25 upserts — under the envelope, no cutover
    IndexStream.applyIvfGenBatch(mutBatch(0 until 25), 0L, root)
    assert(graft.index.Generations.current(spark, root) == 1)
    // batch 1: 25 more — 50 > 45 trips the envelope, the sink cuts over
    IndexStream.applyIvfGenBatch(mutBatch(25 until 50), 1L, root)
    assert(graft.index.Generations.current(spark, root) == 2,
      "envelope trip did not cut over")
    val gen2 = graft.index.Generations.genPath(root, 2)
    // the successor's gauge is reset and its fit covers the whole head
    val m = IndexMeta.read(spark, gen2).get
    assert(m.deltaSinceFit == 0L && m.fittedN == 500L, s"$m")
    // a batch replayed from BEFORE the cutover skips whole (its id is
    // at/below the successor's base)
    val rows = spark.read.parquet(s"$gen2/vectors").count()
    IndexStream.applyIvfGenBatch(mutBatch(25 until 50), 1L, root)
    assert(spark.read.parquet(s"$gen2/vectors").count() == rows)
    // ingestion continues into the successor's log...
    IndexStream.applyIvfGenBatch(
      Seq((7L, vecs(7L), "delete")).toDF("vec_id", "embedding", "op"),
      2L, root)
    assert(graft.index.SnapshotLayout.manifestIds(spark, gen2) == Seq(2L, 3L))
    assert(graft.index.SnapshotLayout
      .asOfAssignedGen(spark, root, Long.MaxValue)
      .filter($"vec_id" === 7).isEmpty)
    // ...while pre-cutover as-ofs stay answerable through the root
    assert(graft.index.SnapshotLayout.asOfAssignedGen(spark, root, 1L)
      .count() == 475L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
  }

  test("generational NSW sink: the graph family cuts over on drift and serves through the root") {
    val root = tmp("graft-gen-sink-nsw") + "/root"
    val nswBase = emb.filter($"vec_id" >= 50 && $"vec_id" < 170)
      .localCheckpoint(true) // 120 rows -> envelope 12
    graft.index.NswSnapshotLayout.initGen(nswBase,
      NswIndex.buildEdgesLsh(nswBase), root)
    val batch = (0 until 15)
      .map(i => (i.toLong, vecs(i.toLong), "upsert"))
      .toDF("vec_id", "embedding", "op")
    IndexStream.applyNswGenBatch(batch, 0L, root)
    assert(graft.index.Generations.current(spark, root) == 2,
      "graph envelope trip did not cut over")
    val gen2 = graft.index.Generations.genPath(root, 2)
    val m = IndexMeta.read(spark, gen2).get
    assert(m.deltaSinceFit == 0L && m.fittedN == 135L, s"$m")
    // the successor serves the streamed rows through the root
    val q = emb.filter($"vec_id" === 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val hits = graft.index.NswSnapshotLayout
      .searchAsOfGen(spark, root, Long.MaxValue, q).collect()
    assert(hits.exists(r => r.getAs[Long]("neighbor_id") == 3L &&
      r.getAs[Long]("score_e6") == 1000000L))
    graft.core.Checkpoints.free(nswBase)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
  }

  private def drainChanges(path: String, out: String): Unit = {
    val q = IndexStream.changesIvf(spark, path, out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def feedRows(out: String): Set[(Long, Long, String)] = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/data")))
      Set.empty
    else spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getAs[Number]("to_b").longValue(),
        r.getAs[Long]("vec_id"), r.getAs[String]("change"))).toSet
  }

  test("changes stream: per-manifest diffs, exactly-once across restarts, late batches picked up") {
    val path = tmp("graft-cdc") + "/ivf"
    val out = tmp("graft-cdc-out")
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), path)
    graft.index.SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out)
    // batch 0 anchored silently; 0→1 emitted the five adds
    val first = feedRows(out)
    assert(first == (0L until 5L).map(i => (1L, i, "added")).toSet, s"$first")
    // restart with nothing new: the file-source checkpoint redelivers
    // nothing, the feed is unchanged (exactly-once)
    drainChanges(path, out)
    assert(feedRows(out) == first)
    // late batches: a delete+re-upsert lands as its own legs
    graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.limit(0),
      deletes = emb.filter($"vec_id" === 3).select($"vec_id"))
    graft.index.SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = emb.filter($"vec_id" === 3),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out)
    assert(feedRows(out) == first +
      ((2L, 3L, "deleted")) + ((3L, 3L, "added")))
    // a replayed foreachBatch (crash between rows and anchor) is
    // idempotent: re-emitting the last batch overwrites its partition
    graft.index.SnapshotLayout.asOfDiff(spark, path, 2L, 3L)
      .write.mode("overwrite").parquet(s"$out/data/to_b=3")
    assert(feedRows(out) == first +
      ((2L, 3L, "deleted")) + ((3L, 3L, "added")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("generational sink: a replayed trigger completes a cutover crashed between apply and pointer commit") {
    val root = tmp("graft-gen-crashcut") + "/root"
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    val batch = (0 until 50)
      .map(i => (i.toLong, vecs(i.toLong), "upsert"))
      .toDF("vec_id", "embedding", "op")
    // simulate the crash window: the batch's manifest is written (the
    // envelope is tripped: 50 > 45) but the sink died before cutover
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = batch.select($"vec_id", $"embedding"),
      deletes = emb.limit(0).select($"vec_id"))
    assert(graft.index.Generations.current(spark, root) == 1)
    // the stream restarts and REPLAYS the same trigger: the batch
    // itself must skip (already manifested), but the pending cutover
    // must fire — deferring it to "the next non-replay batch" starves
    // it forever on a stream that then goes quiet
    IndexStream.applyIvfGenBatch(batch, 0L, root)
    assert(graft.index.Generations.current(spark, root) == 2,
      "replayed trigger did not complete the crashed cutover")
    val m = IndexMeta.read(spark,
      graft.index.Generations.genPath(root, 2)).get
    assert(m.deltaSinceFit == 0L && m.fittedN == 500L, s"$m")
    // and the replayed batch applied exactly once: every id lives once
    val dup = graft.index.SnapshotLayout
      .asOfAssignedGen(spark, root, Long.MaxValue)
      .groupBy($"vec_id").count().filter($"count" > 1L).count()
    assert(dup == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
  }

  test("changes stream: rollback of a live-tailed layout refuses at the next trigger instead of diverging") {
    val path = tmp("graft-cdc4") + "/ivf"
    val out = tmp("graft-cdc4-out")
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), path)
    graft.index.SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.filter($"vec_id" >= 5 && $"vec_id" < 8),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out) // anchor = 2
    // the layout owner rolls back below the anchor and re-applies a
    // DIFFERENT batch 2 — its manifest path is recreated, which the
    // file-source checkpoint never redelivers; without the rollback
    // marker the feed would silently miss the new content forever
    graft.index.SnapshotLayout.rollback(spark, path, 1L)
    graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.filter($"vec_id" >= 8 && $"vec_id" < 11),
      deletes = emb.limit(0).select($"vec_id"))
    graft.index.SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = emb.filter($"vec_id" === 40),
      deletes = emb.limit(0).select($"vec_id"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainChanges(path, out)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("rolled back to batch 1")),
      s"unexpected failure: ${msgs(ex)}")
    // a rollback at/above the anchor is benign: nothing emitted is
    // rewritten, the feed continues (fresh consumer dir to get past
    // the now-poisoned checkpoint)
    val out2 = tmp("graft-cdc4-out2")
    drainChanges(path, out2) // anchors at the current head
    graft.index.SnapshotLayout.rollback(spark, path, 3L)
    graft.index.SnapshotLayout.applyBatch(spark, path, 4L,
      upserts = emb.filter($"vec_id" === 41),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out2)
    assert(feedRows(out2).contains((4L, 41L, "added")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
  }

  test("generational sink retention: cutovers retire generations beyond the window; retired as-ofs refuse loudly") {
    val root = tmp("graft-gen-retain") + "/root"
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    def mutBatch(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, vecs(i.toLong), "upsert"))
        .toDF("vec_id", "embedding", "op")
    // base 450 rows -> envelope 45; each 50-row batch trips a cutover
    IndexStream.applyIvfGenBatch(mutBatch(0 until 50), 0L, root,
      retainGens = 1)
    assert(graft.index.Generations.current(spark, root) == 2)
    // retain=1 keeps generation 1 after the FIRST cutover...
    assert(graft.index.Generations.list(spark, root) == Seq(1, 2))
    // 50 deletes + 1 re-upsert = 51 drift rows > the 0.10 × 500 bar
    val del = ((0 until 50).map(i => (i.toLong, vecs(i.toLong), "delete")) :+
      ((0L, vecs(0L), "upsert")))
      .toDF("vec_id", "embedding", "op")
    IndexStream.applyIvfGenBatch(del, 1L, root, retainGens = 1)
    assert(graft.index.Generations.current(spark, root) == 3)
    // ...and retires it on the SECOND: only {2, 3} survive
    assert(graft.index.Generations.list(spark, root) == Seq(2, 3))
    // a retired as-of refuses at routing instead of aliasing a head
    val ex = intercept[IllegalArgumentException] {
      graft.index.SnapshotLayout.asOfAssignedGen(spark, root, 0L)
    }
    assert(ex.getMessage.contains("predates every generation's floor"))
    // recent as-ofs and head still serve: generation 2's base (the
    // first cutover point, batch 1) and the post-delete head (500
    // minus the 50 deletes plus the one same-batch re-upsert)
    assert(graft.index.SnapshotLayout.asOfAssignedGen(spark, root, 1L)
      .count() == 500L)
    assert(graft.index.SnapshotLayout
      .asOfAssignedGen(spark, root, Long.MaxValue).count() == 451L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root).getParentFile)
  }

  private def drainGen(root: String, out: String): Unit = {
    val q = IndexStream.changesIvfGen(spark, root, out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("two-phase retirement: tombstones refuse at routing with files intact; next cutover purges; readers skip retired manifests") {
    val root = tmp("graft-gen-2phase") + "/root"
    val out = tmp("graft-gen-2phase-out")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def gen(g: Int) = new org.apache.hadoop.fs.Path(s"$root/generation=$g")
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    def mut(ids: Range, op: String): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, vecs(i.toLong), op)).toDF("vec_id", "embedding", "op")
    drainGen(root, out) // anchor = 0 (generation 1's base manifest)
    // cutover #1 (fitted 450, 50 upserts > 45): retainGens=1 keeps 1
    IndexStream.applyIvfGenBatch(mut(0 until 50, "upsert"), 0L, root,
      retainGens = 1)
    assert(graft.index.Generations.current(spark, root) == 2)
    drainGen(root, out) // diff 0→1 routes to the still-live generation 1
    assert(feedRows(out).contains((1L, 0L, "added")))
    // cutover #2 (fitted 500, 50 deletes + 1 re-upsert = 51 > 50):
    // generation 1 falls out of the window — PHASE 1 only
    val del50 = ((0 until 50).map(i => (i.toLong, vecs(i.toLong), "delete")) :+
      ((0L, vecs(0L), "upsert"))).toDF("vec_id", "embedding", "op")
    IndexStream.applyIvfGenBatch(del50, 1L, root, retainGens = 1)
    assert(graft.index.Generations.current(spark, root) == 3)
    // tombstoned: files intact (an in-flight reader's listing stays
    // readable), but logically gone — list skips it, routing refuses
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/generation=1/_snapshots/batch-0.json")),
      "phase-1 retirement must leave the retired manifests readable")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/generation=1/_retired.json")))
    assert(graft.index.Generations.list(spark, root) == Seq(2, 3))
    val ex = intercept[IllegalArgumentException] {
      graft.index.SnapshotLayout.asOfAssignedGen(spark, root, 0L)
    }
    assert(ex.getMessage.contains("predates every generation's floor"))
    // the anchored reader (anchor 1, covered by live generation 2)
    // keeps feeding across the retirement — no failed trigger
    drainGen(root, out)
    assert(feedRows(out).contains((2L, 1L, "deleted")))
    // a FRESH reader sees the tombstoned generation's manifests on
    // disk but SKIPS them (the live-ids filter): it anchors at the
    // live floor instead of anchoring at 0 and refusing on diff 0→1
    val out2 = tmp("graft-gen-2phase-out2")
    drainGen(root, out2)
    assert(IndexStream.readAnchor(spark, out2).contains(2L),
      "fresh reader must anchor at the live head, not retired history")
    // cutover #3 (fitted 451, re-adding 49 deleted ids > 45.1):
    // PHASE 2 — the previous cycle's tombstone is purged, and
    // generation 2 is tombstoned in its place
    IndexStream.applyIvfGenBatch(mut(1 until 50, "upsert"), 2L, root,
      retainGens = 1)
    assert(graft.index.Generations.current(spark, root) == 4)
    assert(!fs.exists(gen(1)), "second cutover must purge the tombstoned dir")
    assert(fs.exists(gen(2)) && graft.index.Generations
      .isRetired(fs, root, 2))
    assert(graft.index.Generations.list(spark, root) == Seq(3, 4))
    // and the feed still follows
    drainGen(root, out)
    assert(feedRows(out).contains((3L, 1L, "added")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
  }

  test("generational changes stream: the feed follows the pointer across cutovers, restart included") {
    val root = tmp("graft-cdc-gen") + "/root"
    val out = tmp("graft-cdc-gen-out")
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    drainGen(root, out)
    val leg1 = (0L until 5L).map(i => (1L, i, "added")).toSet
    assert(feedRows(out) == leg1, s"${feedRows(out)}")
    // no duplicate rows hiding inside the set
    assert(spark.read.parquet(s"$out/data").count() == 5L)
    // CUTOVER: new manifests now land in generation 2 — the same
    // reader (same checkpoint, same anchor) must keep delivering
    assert(graft.index.SnapshotLayout.newGeneration(spark, root) == 2)
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 2L,
      upserts = emb.filter($"vec_id" >= 5 && $"vec_id" < 8),
      deletes = emb.filter($"vec_id" === 0).select($"vec_id"))
    drainGen(root, out) // a restart ACROSS the boundary
    val leg2 = leg1 ++ (5L until 8L).map(i => (2L, i, "added")) +
      ((2L, 0L, "deleted"))
    assert(feedRows(out) == leg2, s"${feedRows(out)}")
    // the successor's base manifest (id 1 under a new path) skipped at
    // the anchor: exactly 9 rows, no boundary noise, no dups
    assert(spark.read.parquet(s"$out/data").count() == 9L)
    // restart with nothing new: unchanged
    drainGen(root, out)
    assert(spark.read.parquet(s"$out/data").count() == 9L)
    // a SECOND cutover: the feed keeps following
    assert(graft.index.SnapshotLayout.newGeneration(spark, root) == 3)
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 3L,
      upserts = emb.filter($"vec_id" === 0),
      deletes = emb.limit(0).select($"vec_id"))
    drainGen(root, out)
    assert(feedRows(out) == leg2 + ((3L, 0L, "added")), s"${feedRows(out)}")
    // retirement below a consumer's anchor refuses at routing instead
    // of aliasing an older head: a consumer anchored at 0 needs
    // generation 1 (the only one whose floor covers 0) for its next
    // diff, and generation 1 is gone
    val out2 = tmp("graft-cdc-gen-out2")
    IndexStream.writeAnchor(spark, out2, 0L)
    graft.index.Generations.dropGeneration(spark, root, 1)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainGen(root, out2)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("predates every generation's floor")),
      s"unexpected failure: ${msgs(ex)}")
    // the original consumer (anchor 3, covered by generation 3) is
    // untouched by the retirement
    graft.index.SnapshotLayout.applyBatchGen(spark, root, 4L,
      upserts = emb.filter($"vec_id" === 40),
      deletes = emb.limit(0).select($"vec_id"))
    drainGen(root, out)
    assert(feedRows(out).contains((4L, 40L, "added")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
  }

  test("end-to-end lifecycle: generational sink ingests and auto-cuts-over while the pointer-following reader feeds") {
    val root = tmp("graft-e2e-gen") + "/root"
    val out = tmp("graft-e2e-gen-out")
    // base 450 rows → envelope 45
    graft.index.SnapshotLayout.initGen(IvfIndex.build(spark, base), root)
    def mut(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, vecs(i.toLong), "upsert"))
        .toDF("vec_id", "embedding", "op")
    // trigger 0: 5 upserts — under the envelope
    IndexStream.applyIvfGenBatch(mut(0 until 5), 0L, root)
    drainGen(root, out)
    val leg1 = (0L until 5L).map(i => (1L, i, "added")).toSet
    assert(feedRows(out) == leg1, s"${feedRows(out)}")
    // trigger 1: 45 more — trips the envelope INSIDE the sink, which
    // cuts over to generation 2 on the same trigger
    IndexStream.applyIvfGenBatch(mut(5 until 50), 1L, root)
    assert(graft.index.Generations.current(spark, root) == 2)
    // the SAME reader (same checkpoint, same anchor) sees the batch's
    // diff AND crosses the boundary without noise: the 1→2 diff
    // routes from=1 to generation 1 and to=2 to generation 2
    drainGen(root, out)
    val leg2 = leg1 ++ (5L until 50L).map(i => (2L, i, "added"))
    assert(feedRows(out) == leg2, s"${feedRows(out)}")
    assert(spark.read.parquet(s"$out/data").count() == 50L, "dup rows")
    // trigger 2: a delete lands in the successor's log; the feed
    // keeps following
    IndexStream.applyIvfGenBatch(
      Seq((7L, vecs(7L), "delete")).toDF("vec_id", "embedding", "op"),
      2L, root)
    drainGen(root, out)
    assert(feedRows(out) == leg2 + ((3L, 7L, "deleted")), s"${feedRows(out)}")
    // and the layout itself serves coherently at every point
    assert(graft.index.SnapshotLayout
      .asOfAssignedGen(spark, root, Long.MaxValue).count() == 499L)
    assert(graft.index.SnapshotLayout
      .asOfAssignedGen(spark, root, 1L).count() == 455L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("generational changes stream: the NSW twin follows a graph cutover") {
    val root = tmp("graft-cdc-gen-nsw") + "/root"
    val out = tmp("graft-cdc-gen-nsw-out")
    val nswBase = emb.filter($"vec_id" >= 50 && $"vec_id" < 170)
      .localCheckpoint(true)
    graft.index.NswSnapshotLayout.initGen(nswBase,
      NswIndex.buildEdgesLsh(nswBase), root)
    graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    def drain(): Unit = {
      val q = IndexStream.changesNswGen(spark, root, out)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(feedRows(out) == (0L until 5L).map(i => (1L, i, "added")).toSet)
    assert(graft.index.NswSnapshotLayout.newGeneration(spark, root) == 2)
    graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 2L,
      upserts = emb.limit(0),
      deletes = emb.filter($"vec_id" === 3).select($"vec_id"))
    drain()
    assert(feedRows(out) == (0L until 5L).map(i => (1L, i, "added")).toSet +
      ((2L, 3L, "deleted")), s"${feedRows(out)}")
    graft.core.Checkpoints.free(nswBase)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("changes stream: a corrupt anchor refuses instead of silently re-anchoring; stray manifest tmps are invisible") {
    val path = tmp("graft-cdc3") + "/ivf"
    val out = tmp("graft-cdc3-out")
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), path)
    graft.index.SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    // a crashed manifest stage (the dot-tmp) must be hidden from BOTH
    // the manifest listing and the feed's file source
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = new org.apache.hadoop.fs.Path(
      s"$path/_snapshots/.batch-9.json.tmp")
    val o = fs.create(stray, true)
    o.write("{\"batch_id\":9".getBytes); o.close()
    assert(graft.index.SnapshotLayout.manifestIds(spark, path) == Seq(0L, 1L))
    drainChanges(path, out)
    assert(feedRows(out).map(_._1) == Set(1L), "stray tmp leaked into the feed")
    // corrupt the consumer anchor: the feed must REFUSE, not re-anchor
    // over lost history
    val anchor = new org.apache.hadoop.fs.Path(
      s"$out/_graft_changes_anchor.json")
    val o2 = fs.create(anchor, true)
    o2.write("garbage".getBytes); o2.close()
    graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.filter($"vec_id" === 40),
      deletes = emb.limit(0).select($"vec_id"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainChanges(path, out)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("corrupt change-feed anchor")),
      s"unexpected failure: ${msgs(ex)}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("changes stream: compaction at or below the anchor is invisible; an outrun anchor fails loudly") {
    val path = tmp("graft-cdc2") + "/ivf"
    val out = tmp("graft-cdc2-out")
    graft.index.SnapshotLayout.init(IvfIndex.build(spark, base), path)
    graft.index.SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 5),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out) // anchor = 1
    graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = emb.filter($"vec_id" >= 5 && $"vec_id" < 8),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out) // anchor = 2
    // compact exactly to the reader's position: nothing to re-read,
    // the next batch diffs (2, 3) which the folded log still answers
    graft.index.SnapshotLayout.compact(spark, path, 2L)
    graft.index.SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = emb.filter($"vec_id" === 40),
      deletes = emb.limit(0).select($"vec_id"))
    drainChanges(path, out)
    assert(feedRows(out).contains((3L, 40L, "added")))
    // a SECOND reader whose anchor is below the (new) compaction
    // floor: floor-refusal, not a silently-wrong feed
    val out2 = tmp("graft-cdc2-out2")
    IndexStream.writeAnchor(spark, out2, 1L)
    graft.index.SnapshotLayout.compact(spark, path, 3L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainChanges(path, out2)
    }
    assert(ex.getMessage.contains("compaction floor") ||
      Option(ex.getCause).exists(_.getMessage.contains("compaction floor")),
      s"unexpected failure: ${ex.getMessage}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path).getParentFile)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
  }
}
