package graft

import graft.index.{IndexMeta, IvfIndex, SnapshotLayout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The versioned IVF layout: apply → snapshot → corrupt → rollback →
  * byte-identical serve, plus the append-only guarantees the rollback
  * story rests on (no file of a surviving batch is ever touched).
  */
class SnapshotSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def listFiles(path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Map.empty
    else {
      val it = fs.listFiles(root, true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          b += (s.getPath.toString.stripPrefix("file:") -> s.getLen)
      }
      b.result()
    }
  }

  test("apply -> snapshot -> corrupt -> rollback -> byte-identical serve") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-snaptest").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25),
      deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    assert(SnapshotLayout.manifestIds(spark, path) == Seq(0L, 1L, 2L))
    val meta2 = IndexMeta.read(spark, path).get
    val files2 = listFiles(path)
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serveHead() = SnapshotLayout
      .searchAsOf(spark, path, Long.MaxValue, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val goodServe = serveHead()

    // corrupt: a bad delta zeroes the < 10 embeddings at batch 3
    SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = all.filter($"vec_id" < 10)
        .select($"vec_id", transform($"embedding", _ => lit(0.0f)).as("embedding")),
      deletes = all.limit(0).select($"vec_id"))
    val corrupted = serveHead()
    assert(corrupted != goodServe, "the corrupt batch must change head serves")
    // ...but batches <= 2 are untouched on disk: append-only means the
    // corrupt batch added files without rewriting any surviving one
    val files3 = listFiles(path)
    files2.foreach { case (f, len) =>
      assert(files3.get(f).contains(len), s"batch<=2 file rewritten: $f")
    }
    // as-of-2 still serves the good results while batch 3 is at head
    val asof2 = SnapshotLayout.searchAsOf(spark, path, 2L, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(asof2 == goodServe)

    // rollback: head serves return byte-identical to pre-corruption
    SnapshotLayout.rollback(spark, path, 2L)
    assert(serveHead() == goodServe)
    assert(listFiles(path).keySet == files2.keySet,
      "rollback must restore exactly the batch<=2 file set")
    assert(IndexMeta.read(spark, path).get == meta2, "sidecar not restored")
    assert(SnapshotLayout.manifestIds(spark, path) == Seq(0L, 1L, 2L))

    // the registry grid is all-true end-to-end
    val grid = SnapshotLayout.ivfSearchAsof(spark, sf).collect()
    assert(grid.nonEmpty)
    Seq("self_found", "top1_exact", "tombstone_hides", "asof1_predates",
      "rollback_identical", "sidecar_restored").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("compact folds history <= upTo: serves at/after identical, below truncated") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-snapcomp").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = all.filter($"vec_id" < 3), deletes = all.limit(0).select($"vec_id"))
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serve(b: Long) = SnapshotLayout.searchAsOf(spark, path, b, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val asof2Before = serve(2L)
    val headBefore = serve(Long.MaxValue)

    SnapshotLayout.compact(spark, path, 2L)
    // serves at and after the compaction point are identical
    assert(serve(2L) == asof2Before)
    assert(serve(Long.MaxValue) == headBefore)
    // the directory structure collapsed: vector batches are {2, 3},
    // tombstones <= 2 are gone, manifests below 2 truncated
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/vectors"))
      .filter(_.isDirectory)
      .flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong))
      .toSet
    assert(batchDirs == Set(2L, 3L), s"unexpected batch dirs: $batchDirs")
    val tombDirs =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones"))) Set.empty[Long]
      else fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/tombstones"))
        .filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).toSet
    assert(tombDirs.forall(_ > 2L), s"stale tombstones survive: $tombDirs")
    assert(SnapshotLayout.manifestIds(spark, path) == Seq(2L, 3L))
    // rollback to a compacted-away batch REFUSES instead of deleting
    // the consolidated base and every later batch (the guard: no
    // manifest → nothing restorable)
    val filesBefore = listFiles(path)
    intercept[IllegalArgumentException] {
      SnapshotLayout.rollback(spark, path, 1L)
    }
    assert(listFiles(path) == filesBefore,
      "refused rollback must not touch a single file")
    // rollback to the compaction point still works afterwards
    SnapshotLayout.rollback(spark, path, 2L)
    assert(serve(Long.MaxValue) == asof2Before)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("compaction is crash-safe: pre-plan, post-plan, and mid-commit crashes all repair") {
    import org.apache.spark.sql.functions.lit
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val src = java.nio.file.Files.createTempDirectory("graft-crash").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), src)
    SnapshotLayout.applyBatch(spark, src, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, src, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, src, 3L,
      upserts = all.filter($"vec_id" < 3), deletes = all.limit(0).select($"vec_id"))
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serve(p: String, b: Long) = SnapshotLayout.searchAsOf(spark, p, b, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val asof2 = serve(src, 2L)
    val head = serve(src, Long.MaxValue)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def copyTo(dst: String): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(src), new java.io.File(dst))
    }
    def stage(p: String, upTo: Long): Seq[Int] = {
      SnapshotLayout.asOfAssigned(spark, p, upTo)
        .withColumn("batch_id", lit(upTo))
        .write.mode("overwrite").partitionBy("cluster_id", "batch_id")
        .parquet(s"$p/_compact_tmp/vectors")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/_compact_tmp/vectors"))
        .filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("cluster_id=").toInt).toSeq.sorted
    }
    def assertCompacted(p: String): Unit = {
      assert(serve(p, 2L) == asof2, s"$p as-of-2 serve diverged post-repair")
      assert(serve(p, Long.MaxValue) == head, s"$p head serve diverged post-repair")
      assert(SnapshotLayout.manifestIds(spark, p) == Seq(2L, 3L))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$p/_compact_tmp")),
        s"$p tmp not cleaned up")
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/vectors"))
        .filter(_.isDirectory)
        .flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory)
          .map(_.getPath.getName.stripPrefix("batch_id=").toLong))
      assert(dirs.forall(_ >= 2L), s"$p stale batch dirs: ${dirs.toSet}")
    }

    // crash A — mid-stage (tmp data, NO plan): the layout is intact;
    // repair abandons the garbage and serves the UNCOMPACTED state
    val a = src.stripSuffix("/ivf") + "/a"
    copyTo(a)
    stage(a, 2L)
    assert(serve(a, 2L) == asof2 && serve(a, Long.MaxValue) == head)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$a/_compact_tmp")),
      "pre-plan tmp not abandoned by the read path")
    assert(SnapshotLayout.manifestIds(spark, a) == Seq(0L, 1L, 2L, 3L))

    // crash B — right after the plan (commit point reached, zero
    // commit progress): the next read finishes the whole commit
    val b = src.stripSuffix("/ivf") + "/b"
    copyTo(b)
    val clustersB = stage(b, 2L)
    SnapshotLayout.writeCompactPlan(fs, b, 2L, clustersB)
    assertCompacted(b)

    // crash C — mid-commit: one staged cluster already swapped, one
    // old dir of another already deleted; repair finishes the rest
    val c = src.stripSuffix("/ivf") + "/c"
    copyTo(c)
    val clustersC = stage(c, 2L)
    SnapshotLayout.writeCompactPlan(fs, c, 2L, clustersC)
    val c0 = clustersC.head
    val c0dir = new org.apache.hadoop.fs.Path(s"$c/vectors/cluster_id=$c0")
    if (fs.exists(c0dir))
      fs.listStatus(c0dir).filter(_.isDirectory)
        .filter(_.getPath.getName.stripPrefix("batch_id=").toLong <= 2L)
        .foreach(d => fs.delete(d.getPath, true))
    else fs.mkdirs(c0dir)
    fs.rename(
      new org.apache.hadoop.fs.Path(s"$c/_compact_tmp/vectors/cluster_id=$c0/batch_id=2"),
      new org.apache.hadoop.fs.Path(s"$c/vectors/cluster_id=$c0/batch_id=2"))
    clustersC.lift(1).foreach { c1 =>
      val d1 = new org.apache.hadoop.fs.Path(s"$c/vectors/cluster_id=$c1/batch_id=0")
      if (fs.exists(d1)) fs.delete(d1, true)
    }
    assertCompacted(c)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(src).getParentFile)
  }

  test("ivf_compact / nsw_compact registry grids are all-true") {
    val ivf = SnapshotLayout.ivfCompactChecked(spark, sf).collect()
    assert(ivf.nonEmpty)
    Seq("serve2_identical", "head_identical", "history_truncated",
      "tombstones_gone", "dirs_bounded", "guard_refuses", "rollback_works")
      .foreach { c =>
        assert(ivf.forall(_.getAs[Boolean](c)), s"ivf_compact column $c not all-true")
      }
    // the NSW grid also pins the HEALED re-add wart: ids dead at the
    // compaction point and re-added later lose their stale-position
    // edges physically (stale_healed), and the check is non-vacuous
    val nsw = graft.index.NswSnapshotLayout.nswCompactChecked(spark, sf).collect()
    assert(nsw.nonEmpty)
    Seq("serve2_identical", "stale_healed", "heal_nonvacuous",
      "history_truncated", "tombstones_gone", "dirs_bounded",
      "guard_refuses", "rollback_works")
      .foreach { c =>
        assert(nsw.forall(_.getAs[Boolean](c)), s"nsw_compact column $c not all-true")
      }
  }

  test("NSW versioned layout: corrupt batch -> rollback -> byte-identical serve; grid all-true") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-nswsnap").toString + "/nsw"
    val base = all.filter($"vec_id" >= 50).localCheckpoint(true)
    graft.index.NswSnapshotLayout.init(
      base, graft.index.NswIndex.buildEdgesLsh(base), path)
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25),
      deletes = all.limit(0).select($"vec_id"))
    val files1 = listFiles(path)
    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serveHead() = graft.index.NswSnapshotLayout
      .searchAsOf(spark, path, Long.MaxValue, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val good = serveHead()
    // every probe finds itself at 1.0 through its beam links
    assert(good.count { case (q, n, s, _) => q == n && s == 1000000L } == 5)

    // corrupt batch 2, then roll back
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" < 5)
        .select($"vec_id", transform($"embedding", _ => lit(0.0f)).as("embedding")),
      deletes = all.limit(0).select($"vec_id"))
    assert(serveHead() != good, "corrupt batch must change head serves")
    val files2 = listFiles(path)
    files1.foreach { case (f, len) =>
      assert(files2.get(f).contains(len), s"batch<=1 file rewritten: $f")
    }
    graft.index.NswSnapshotLayout.rollback(spark, path, 1L)
    assert(serveHead() == good)
    assert(listFiles(path).keySet == files1.keySet)

    // compaction on the graph: apply one more batch, compact at 2,
    // serves at/after identical, structure collapsed
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 30),
      deletes = all.filter($"vec_id" === 10).select($"vec_id"))
    val head2 = serveHead()
    graft.index.NswSnapshotLayout.compact(spark, path, 2L)
    assert(serveHead() == head2, "compacted head serve changed")
    val fsN = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("vectors", "edges").foreach { sub =>
      val dirs = fsN.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub"))
        .filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).toSet
      assert(dirs == Set(2L), s"$sub batch dirs after compact: $dirs")
    }
    assert(graft.index.NswSnapshotLayout.asOfVectors(spark, path, Long.MaxValue)
      .filter($"vec_id" === 10).count() == 0L, "compacted tombstone resurrected")

    // the registry grid end-to-end
    val grid = graft.index.NswSnapshotLayout.nswSearchAsof(spark, sf).collect()
    assert(grid.nonEmpty)
    Seq("self_found", "top1_exact", "tombstone_hides", "asof1_predates",
      "rollback_identical", "sidecar_restored").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("versioned PQ sidecar: as-of ADC identity at every point, codes ride compaction, rollback, and crash repair") {
    import org.apache.spark.sql.functions.lit
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-vpq").toString
    val src = s"$root/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), src)
    SnapshotLayout.initPq(spark, src)
    SnapshotLayout.applyBatch(spark, src, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, src, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, src, 3L,
      upserts = all.filter($"vec_id" < 3), deletes = all.limit(0).select($"vec_id"))
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serveRaw(p: String, b: Long) = SnapshotLayout.searchAsOf(spark, p, b, queries)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def serveAdc(p: String, b: Long) =
      SnapshotLayout.searchAsOfPq(spark, p, b, queries, rerank = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // at exhaustive rerank the ADC serve must equal the raw as-of
    // serve at EVERY as-of point — the live code set, the winner
    // join, and the direct-address rerank reconstruct the raw state
    Seq(0L, 1L, 2L, 3L, Long.MaxValue).foreach { b =>
      assert(serveAdc(src, b) == serveRaw(src, b), s"ADC as-of-$b diverges from raw")
    }
    val asof2 = serveAdc(src, 2L)

    // compaction folds the code sidecar with the raw rows
    val c = s"$root/compacted"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(src), new java.io.File(c))
    SnapshotLayout.compact(spark, c, 2L)
    assert(serveAdc(c, 2L) == asof2, "compacted ADC as-of-2 serve diverged")
    assert(serveAdc(c, Long.MaxValue) == serveRaw(c, Long.MaxValue))
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def codeDirs(p: String): Set[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/pq/codes"))
        .filter(_.isDirectory)
        .flatMap(cc => fs.listStatus(cc.getPath).filter(_.isDirectory)
          .map(_.getPath.getName.stripPrefix("batch_id=").toLong)).toSet
    assert(codeDirs(c).forall(_ >= 2L), s"stale code dirs: ${codeDirs(c)}")
    // rollback prunes the rolled-back batch's codes with its raw rows
    SnapshotLayout.rollback(spark, c, 2L)
    assert(codeDirs(c) == Set(2L), s"rolled-back code dirs: ${codeDirs(c)}")
    assert(serveAdc(c, Long.MaxValue) == asof2)

    // crash mid-commit WITH staged codes: vectors of one cluster
    // already swapped, codes not yet — the read path's repair must
    // finish BOTH tables and serve identically to an uncrashed run
    val x = s"$root/crash"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(src), new java.io.File(x))
    SnapshotLayout.asOfAssigned(spark, x, 2L).withColumn("batch_id", lit(2L))
      .write.mode("overwrite").partitionBy("cluster_id", "batch_id")
      .parquet(s"$x/_compact_tmp/vectors")
    SnapshotLayout.asOfCodes(spark, x, 2L).withColumn("batch_id", lit(2L))
      .write.mode("overwrite").partitionBy("cluster_id", "batch_id")
      .parquet(s"$x/_compact_tmp/codes/pq")
    val clusters = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$x/_compact_tmp/vectors"))
      .filter(_.isDirectory)
      .map(_.getPath.getName.stripPrefix("cluster_id=").toInt).toSeq.sorted
    SnapshotLayout.writeCompactPlan(fs, x, 2L, clusters)
    val c0 = clusters.head
    val c0dir = new org.apache.hadoop.fs.Path(s"$x/vectors/cluster_id=$c0")
    fs.listStatus(c0dir).filter(_.isDirectory)
      .filter(_.getPath.getName.stripPrefix("batch_id=").toLong <= 2L)
      .foreach(d => fs.delete(d.getPath, true))
    fs.rename(
      new org.apache.hadoop.fs.Path(s"$x/_compact_tmp/vectors/cluster_id=$c0/batch_id=2"),
      new org.apache.hadoop.fs.Path(s"$x/vectors/cluster_id=$c0/batch_id=2"))
    assert(serveAdc(x, 2L) == asof2, "post-crash repair ADC serve diverged")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$x/_compact_tmp")))
    assert(codeDirs(x).forall(_ >= 2L), s"crash repair left stale codes: ${codeDirs(x)}")

    // the registry grid end-to-end
    val grid = SnapshotLayout.ivfSearchAsofPq(spark, sf).collect()
    assert(grid.nonEmpty)
    Seq("self_found", "top1_exact", "tombstone_hides", "matches_raw",
      "compact_identical", "dirs_bounded", "rollback_prunes").foreach { col =>
      assert(grid.forall(_.getAs[Boolean](col)), s"grid column $col not all-true")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("filtered as-of serving: metadata rides the versioned layout; raw and ADC filtered serves agree") {
    import org.apache.spark.sql.functions.col
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val root = java.nio.file.Files.createTempDirectory("graft-vfilt").toString
    val path = s"$root/ivf"
    SnapshotLayout.init(
      IvfIndex.build(spark, all.filter($"vec_id" >= 50), metaCols = Seq("label")),
      path)
    SnapshotLayout.initPq(spark, path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    // a meta-less batch against a meta-bearing layout fails FAST
    val err = intercept[IllegalArgumentException] {
      SnapshotLayout.applyBatch(spark, path, 3L,
        upserts = all.filter($"vec_id" === 30L).select($"vec_id", $"embedding"),
        deletes = all.limit(0).select($"vec_id"))
    }
    assert(err.getMessage.contains("label"))

    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val pred = col("label") === col("q_label")
    val labelOf = all.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    Seq(0L, 1L, 2L, Long.MaxValue).foreach { b =>
      val raw = rows(SnapshotLayout.searchAsOfFiltered(spark, path, b, queries, pred))
      // pre-filter shape: full top-10 per query, every hit legal
      assert(raw.size == queries.count() * 10, s"as-of-$b filtered serve short")
      raw.foreach { case (q, n, _, _) =>
        assert(labelOf(n) == labelOf(q), s"as-of-$b hit violates the predicate")
      }
      // the ADC filtered serve at exhaustive rerank agrees exactly
      val adc = rows(SnapshotLayout.searchAsOfPqFiltered(spark, path, b, queries,
        pred, rerank = 1000000))
      assert(adc == raw, s"filtered ADC as-of-$b diverges from filtered raw")
    }
    // metadata survives compaction (the consolidated rows carry it)
    val before = rows(SnapshotLayout.searchAsOfFiltered(spark, path, 2L, queries, pred))
    SnapshotLayout.compact(spark, path, 1L)
    assert(spark.read.parquet(s"$path/vectors").columns.contains("label"))
    assert(spark.read.parquet(s"$path/pq/codes").columns.contains("label"))
    assert(rows(SnapshotLayout.searchAsOfFiltered(spark, path, 2L, queries, pred)) == before,
      "filtered as-of serve moved across compaction")

    // the registry grid end-to-end
    val grid = SnapshotLayout.ivfSearchAsofFiltered(spark, sf).collect()
    assert(grid.nonEmpty)
    Seq("k_results", "all_match_label", "self_found", "top1_exact",
      "monotone", "adc_matches_raw").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("NSW filtered as-of: metadata rides the graph layout; walk serves all-legal rows at any point") {
    import org.apache.spark.sql.functions.col
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val root = java.nio.file.Files.createTempDirectory("graft-nswfilt").toString
    val path = s"$root/nsw"
    val base = all.filter($"vec_id" >= 50).localCheckpoint(true)
    graft.index.NswSnapshotLayout.init(base,
      graft.index.NswIndex.buildEdgesLsh(base.select($"vec_id", $"embedding")), path)
    graft.index.NswSnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25),
      deletes = all.filter($"vec_id" >= 50 && $"vec_id" % 11 === 0).select($"vec_id"))
    // meta-less batch fails fast
    val err = intercept[IllegalArgumentException] {
      graft.index.NswSnapshotLayout.applyBatch(spark, path, 2L,
        upserts = all.filter($"vec_id" === 30L).select($"vec_id", $"embedding"),
        deletes = all.limit(0).select($"vec_id"))
    }
    assert(err.getMessage.contains("label"))

    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val pred = col("label") === col("q_label")
    val labelOf = all.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    Seq(1L, Long.MaxValue).foreach { b =>
      val rows = graft.index.NswSnapshotLayout
        .searchAsOfFiltered(spark, path, b, queries, pred).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.length == 5 * 10, s"as-of-$b filtered walk served ${rows.length} rows")
      rows.foreach { case (q, n, _, _) =>
        assert(labelOf(n) == labelOf(q), s"as-of-$b walk hit violates the predicate")
      }
      // each query's own (live, label-matching) vector leads at 1.0
      queries.select($"q_id").collect().map(_.getLong(0)).foreach { q =>
        val top = rows.filter(_._1 == q).minBy(_._4)
        assert(top._2 == q && top._3 == 1000000L, s"as-of-$b self not top-1 for q=$q")
      }
    }
    // the registry grid end-to-end
    val grid = graft.index.NswSnapshotLayout.nswSearchAsofFiltered(spark, sf).collect()
    assert(grid.nonEmpty)
    Seq("k_results", "all_match_label", "self_found", "top1_exact",
      "monotone").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"nsw grid column $c not all-true")
    }
    graft.core.Checkpoints.free(base)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("tombstone then revive: a deleted id comes back with a later upsert") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-snaptest2").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 10)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.limit(0), deletes = all.filter($"vec_id" === 20).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" === 20), deletes = all.limit(0).select($"vec_id"))
    def liveAt(b: Long) = SnapshotLayout.asOfAssigned(spark, path, b)
      .filter($"vec_id" === 20).count()
    assert(liveAt(0L) == 1L) // in the base
    assert(liveAt(1L) == 0L) // tombstoned
    assert(liveAt(2L) == 1L) // revived
    // same-batch delete+upsert converges to present (deletes first)
    SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = all.filter($"vec_id" === 20),
      deletes = all.filter($"vec_id" === 20).select($"vec_id"))
    assert(liveAt(3L) == 1L)
    // a direct replay of a completed batch id is a whole-batch no-op
    // (the manifest is the applied marker): rows and sidecar frozen
    val metaBefore = IndexMeta.read(spark, path).get
    val rowsBefore = spark.read.parquet(s"$path/vectors").count()
    SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = all.filter($"vec_id" === 21),
      deletes = all.limit(0).select($"vec_id"))
    assert(spark.read.parquet(s"$path/vectors").count() == rowsBefore)
    assert(IndexMeta.read(spark, path).get == metaBefore)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("as-of diff: payload semantics — metadata-only change is updated, cluster move alone is not") {
    // a tiny meta-bearing layout: id 1 changes ONLY its label between
    // batches (payload change → updated); ids 2..4 are untouched; id 5
    // arrives (added); id 3 is tombstoned (deleted). The differ must
    // also ignore the physical cluster assignment: identical content
    // re-upserted is NOT a change to a consumer, even though the
    // re-upserted row carries a fresh batch_id (and, under a drifted
    // centroid fit, could land elsewhere).
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val path = java.nio.file.Files
      .createTempDirectory("graft-snapdiff").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark,
      emb.filter(($"vec_id" >= 1 && $"vec_id" <= 4) || $"vec_id" >= 50),
        metaCols = Seq("label")), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" === 1)
          .select($"vec_id", $"embedding", ($"label" + 1000).cast("int").as("label"))
        .unionByName(emb.filter($"vec_id" === 2)) // identical re-upsert
        .unionByName(emb.filter($"vec_id" === 5)),
      deletes = emb.filter($"vec_id" === 3).select($"vec_id"))
    val feed = SnapshotLayout.diffLiveSets(
        SnapshotLayout.asOfAssigned(spark, path, 0L),
        SnapshotLayout.asOfAssigned(spark, path, 1L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feed == Map(1L -> "updated", 3L -> "deleted", 5L -> "added"),
      s"unexpected change feed: $feed")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("layout debt gauge: compaction folds superseded rows, dead ids, and tombstones away") {
    // the gauge must read the scenario's documented debt before
    // compaction and show exactly the fold afterwards: only the 8
    // genuinely double-written ids (<10 minus the two that were dead
    // at the compaction point) stay superseded, everything else —
    // dead ids, tombstones, pre-compaction history — is gone
    val n = graft.core.Tables.embeddings(spark, sf).count()
    val work = java.nio.file.Files
      .createTempDirectory("graft-debt").toString + "/ivf"
    SnapshotLayout.copyLayout(spark,
      SnapshotLayout.pristineScenario(spark, sf), work)
    def debt() = SnapshotLayout.layoutDebt(spark, work).collect().head
      .toSeq.map(_.asInstanceOf[Long])
    // drift columns: base fit over n-50 rows; batches bumped
    // 25 + (25+4) + 10 = 64 — compaction folds STORAGE, not semantic
    // drift, so the refit signal must survive it unchanged
    assert(debt() == Seq(4L, n + 10, n - 2, 12L, 2L, 4L, n - 50, 64L),
      s"pre-compaction debt off: ${debt()}")
    // the CDC read survives compaction for answerable endpoints...
    val feedBefore = SnapshotLayout.asOfDiff(spark, work, 2L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    SnapshotLayout.compact(spark, work, 2L)
    assert(debt() == Seq(2L, n + 6, n - 2, 8L, 0L, 0L, n - 50, 64L),
      s"post-compaction debt off: ${debt()}")
    val feedAfter = SnapshotLayout.asOfDiff(spark, work, 2L, 3L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feedAfter == feedBefore,
      "change feed at the compaction point diverged across the fold")
    // ...and REFUSES endpoints below the compaction floor instead of
    // emitting a silently-wrong everything-is-added feed
    intercept[IllegalArgumentException] {
      SnapshotLayout.asOfDiff(spark, work, 1L, 3L)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(work).getParentFile)
  }

  test("mid-history initPq: code coverage stays complete through batches and compaction") {
    // the IVF compaction commit distinguishes already-swapped from
    // staged-empty via the raw plan's cluster list, which is only
    // sound while live code rows mirror live raw rows cluster-for-
    // cluster. That invariant holds because initPq encodes the ENTIRE
    // stored tree at call time and applyBatch encodes every later
    // delta — this test drives the one shape that could break it
    // (sidecar created mid-history, then a later batch, then a fold)
    // and asserts zero live raw rows without a live code row
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-midpq").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 20),
      deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.initPq(spark, path) // mid-history: batches 0 and 1 exist
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 20 && $"vec_id" < 40),
      deletes = all.filter($"vec_id" < 10).select($"vec_id"))
    def uncovered(b: Long): Long =
      SnapshotLayout.asOfAssigned(spark, path, b)
        .join(SnapshotLayout.asOfCodes(spark, path, b)
          .select($"vec_id".as("cv")), $"vec_id" === $"cv", "left_anti")
        .count()
    assert(uncovered(1L) == 0L, "live raw rows without codes as of 1")
    assert(uncovered(Long.MaxValue) == 0L, "live raw rows without codes at head")
    SnapshotLayout.compact(spark, path, 2L)
    assert(uncovered(Long.MaxValue) == 0L,
      "compaction broke raw/code coverage parity")
    // and the fold bounded the code history like the raw history
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codeDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/pq/codes"))
      .filter(_.isDirectory)
      .flatMap(c => fs.listStatus(c.getPath).filter(_.isDirectory)
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong)).toSet
    assert(codeDirs.forall(_ >= 2L), s"stale code batch dirs survive: $codeDirs")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("stray non-conforming dirs/files never brick rollback or compaction") {
    val all = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-snapstray").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 3L,
      upserts = all.filter($"vec_id" < 3), deletes = all.limit(0).select($"vec_id"))

    // drop strays of the fragility class the raw .toLong parses had:
    // EMPTY backup dirs with non-conforming names (invisible to
    // Spark's leaf-file-driven partition discovery, so reads are
    // unaffected — but listStatus-driven destructive walks see them)
    // plus a dot-file (ignored by reads per FileInputFormat rules)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val clusterDir = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/vectors"))
      .filter(_.isDirectory).head.getPath
    val strays = Seq(
      new org.apache.hadoop.fs.Path(clusterDir, "batch_id=backup"),
      new org.apache.hadoop.fs.Path(clusterDir, "stray_dir"),
      new org.apache.hadoop.fs.Path(s"$path/vectors/cluster_backup"),
      new org.apache.hadoop.fs.Path(s"$path/tombstones/batch_id=old.bak"))
    strays.foreach(fs.mkdirs)
    val strayFile = new org.apache.hadoop.fs.Path(clusterDir, ".notes.txt.swp")
    val out = fs.create(strayFile)
    out.write("stray".getBytes("UTF-8")); out.close()

    val queries = all.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serveHead() = SnapshotLayout
      .searchAsOf(spark, path, Long.MaxValue, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // rollback walks the listings deciding what to DELETE: it must
    // skip what it did not write, not throw NumberFormatException
    SnapshotLayout.rollback(spark, path, 2L)
    assert(SnapshotLayout.manifestIds(spark, path) == Seq(0L, 1L, 2L))
    (strays :+ strayFile).foreach(p =>
      assert(fs.exists(p), s"rollback deleted a stray it did not own: $p"))
    val afterRollback = serveHead()
    assert(afterRollback.nonEmpty)

    // compaction's commit walk has the same discipline
    SnapshotLayout.compact(spark, path, 1L)
    assert(serveHead() == afterRollback,
      "compaction with strays present changed head serves")
    (strays :+ strayFile).foreach(p =>
      assert(fs.exists(p), s"compaction deleted a stray it did not own: $p"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }
}