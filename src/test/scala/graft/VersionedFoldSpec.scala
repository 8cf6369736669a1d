package graft

import graft.index.{IvfIndex, NswSnapshotLayout, SnapshotLayout}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fold-equivalence property for the versioned layouts: for ARBITRARY
  * batch histories (random delete/upsert sets per batch, driven by
  * fixed seeds), the layout's as-of reconstruction must equal a
  * straight in-memory fold of the same history — deletes before
  * upserts within a batch, latest batch wins, tombstones hide until a
  * later upsert revives. The deterministic grids (`ivf_search_asof`,
  * `ivf_compact`) pin ONE history; this pins the space of them,
  * including the shapes the grids don't reach (multiple deletes of
  * one id across batches, upsert-after-compact, delete of a
  * never-present id, empty batches), with a mid-history compaction
  * and an ancient-replay attempt interleaved.
  */
class VersionedFoldSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dim = 4
  private val nIds = 24L

  /** Deterministic embedding for (id, batch) — a re-upsert at a later
    * batch MOVES the vector, so stale-row bugs can't hide behind
    * identical values. */
  private def emb(id: Long, b: Long): Array[Float] =
    Array(id + 1f, b + 1f, ((id * 3 + b) % 7) + 1f, 1f)

  private case class Op(deletes: Set[Long], upserts: Set[Long])

  private def history(seed: Long, nBatches: Int): Seq[Op] = {
    val subset = Gen.listOfN(nIds.toInt, Gen.choose(0, 9)).map(_.zipWithIndex)
    (1 to nBatches).map { b =>
      val rolls = subset.pureApply(Gen.Parameters.default, Seed(seed * 1000 + b))
      Op(
        deletes = rolls.collect { case (r, id) if r < 2 => id.toLong }.toSet,
        upserts = rolls.collect { case (r, id) if r >= 2 && r < 5 => id.toLong }.toSet)
    }
  }

  /** In-memory reference fold: state after batches ≤ b. */
  private def fold(base: Map[Long, Seq[Float]], ops: Seq[Op],
      b: Long): Map[Long, Seq[Float]] =
    ops.take(b.toInt).zipWithIndex.foldLeft(base) { case (st, (op, i)) =>
      val batchId = i + 1L
      (st -- op.deletes) ++
        op.upserts.map(id => id -> emb(id, batchId).toSeq)
    }

  private def toDf(ids: Set[Long], b: Long) =
    ids.toSeq.sorted.map(id => (id, emb(id, b))).toDF("vec_id", "embedding")

  private def emptyUps = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  private def liveMap(path: String, b: Long): Map[Long, Seq[Float]] =
    SnapshotLayout.asOfAssigned(spark, path, b)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap

  test("IVF versioned layout == in-memory fold for random histories with mid-history compaction") {
    for (seed <- 1L to 2L) {
      val ops = history(seed, nBatches = 6)
      val baseIds = (8L until nIds).toSet
      val base = baseIds.map(id => id -> emb(id, 0L).toSeq).toMap
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-fold-$seed").toString + "/ivf"
      SnapshotLayout.init(IvfIndex.build(spark, toDf(baseIds, 0L), k = 2), path)
      val compactAt = 2L + (seed % 2L) // 3 for seed 1, 2 for seed 2
      ops.zipWithIndex.foreach { case (op, i) =>
        val b = i + 1L
        SnapshotLayout.applyBatch(spark, path, b,
          upserts = toDf(op.upserts, b),
          deletes = toDf(op.deletes, b).select($"vec_id"))
        if (b == compactAt + 1) {
          SnapshotLayout.compact(spark, path, compactAt)
          // ancient replay straight after the floor moved: must skip
          // whole (the ghost-resurrection guard), so the fold is
          // checked AGAINST it for the rest of the history
          SnapshotLayout.applyBatch(spark, path, 1L,
            upserts = toDf((0L until 8L).toSet, 1L), deletes = emptyUps.select($"vec_id"))
        }
      }
      // every as-of point at/after the compaction floor equals the fold
      for (b <- compactAt to ops.length.toLong) {
        val want = fold(base, ops, b)
        val got = liveMap(path, b)
        assert(got.keySet == want.keySet,
          s"seed=$seed asof=$b live ids diverge: " +
            s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
        want.foreach { case (id, v) =>
          assert(got(id) == v, s"seed=$seed asof=$b id=$id value diverged")
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(path).getParentFile)
    }
  }

  test("NSW versioned layout: vector fold equivalence + no edge touches a dead endpoint") {
    val seed = 3L
    val ops = history(seed, nBatches = 4)
    val baseIds = (8L until nIds).toSet
    val base = baseIds.map(id => id -> emb(id, 0L).toSeq).toMap
    val path = java.nio.file.Files
      .createTempDirectory("graft-fold-nsw").toString + "/nsw"
    val baseDf = toDf(baseIds, 0L)
    NswSnapshotLayout.init(baseDf, graft.index.NswIndex.buildEdgesLsh(baseDf), path)
    ops.zipWithIndex.foreach { case (op, i) =>
      val b = i + 1L
      NswSnapshotLayout.applyBatch(spark, path, b,
        upserts = toDf(op.upserts, b),
        deletes = toDf(op.deletes, b).select($"vec_id"))
    }
    for (b <- 1L to ops.length.toLong) {
      val want = fold(base, ops, b)
      val got = NswSnapshotLayout.asOfVectors(spark, path, b)
        .select($"vec_id", $"embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
      assert(got == want, s"nsw asof=$b fold diverged")
      // reconstruction invariant: both endpoints of every served edge
      // are live at b (a dead node's edges leave survivors' adjacency)
      val (live, edges) = NswSnapshotLayout.asOfGraph(spark, path, b)
      val liveIds = live.select($"vec_id").collect().map(_.getLong(0)).toSet
      val bad = edges.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
        .filter { case (s, d) => !liveIds(s) || !liveIds(d) }
      assert(bad.isEmpty, s"nsw asof=$b edges touch dead endpoints: ${bad.take(5).toSeq}")
      graft.core.Checkpoints.free(live)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }
}
