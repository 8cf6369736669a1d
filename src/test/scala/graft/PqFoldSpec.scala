package graft

import graft.index.IvfIndex
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fold-equivalence property for the PERSISTED layout's PQ sidecars —
  * the maintenance analog of VersionedFoldSpec: for ARBITRARY
  * upsert/remove histories (random per-batch sets, fixed seeds),
  * after every batch BOTH code sidecars must mirror an in-memory fold
  * of the history id-for-id, with no duplicate code rows and with
  * each code row's metadata equal to the fold's CURRENT label (a
  * re-upsert changes the label, so a stale meta row can't hide behind
  * a matching id — the meta twin of VersionedFoldSpec's moved
  * vectors). A mid-history `compactPersisted` must preserve all of
  * it, and the filtered quantized serve must find every probed live
  * id through its current label at exact score. PqSpec's scripted
  * maintenance test pins one history; this pins the space of them
  * (remove-then-re-add, double removes, removes of absent ids, empty
  * batches, meta flips).
  */
class PqFoldSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val nIds = 24L

  /** Deterministic embedding for (id, batch) — a re-upsert MOVES the
    * vector so stale code rows can't hide behind equal values. */
  private def emb(id: Long, b: Long): Array[Float] =
    Array(id + 1f, b + 1f, ((id * 3 + b) % 7) + 1f, 1f)

  /** Deterministic label for (id, batch) — a re-upsert FLIPS the
    * label so stale sidecar metadata can't hide behind a live id. */
  private def lab(id: Long, b: Long): Int = ((id + b) % 3L).toInt

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

  private def toDf(ids: Set[Long], b: Long) =
    ids.toSeq.sorted.map(id => (id, emb(id, b), lab(id, b)))
      .toDF("vec_id", "embedding", "label")

  test("PQ sidecars == in-memory fold for random maintenance histories with mid-history compaction") {
    for (seed <- 1L to 2L) {
      val ops = history(seed, nBatches = 5)
      val baseIds = (8L until nIds).toSet
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-pqfold-$seed").toString
      IvfIndex.persist(
        IvfIndex.build(spark, toDf(baseIds, 0L), k = 2, metaCols = Seq("label")),
        dir)
      IvfIndex.persistPq(spark, dir, m = 2, codes = 8)
      IvfIndex.persistPq(spark, dir, m = 2, codes = 8, rotate = true, sub = "pqr")

      var state: Map[Long, (Seq[Float], Int)] =
        baseIds.map(id => id -> (emb(id, 0L).toSeq, lab(id, 0L))).toMap
      ops.zipWithIndex.foreach { case (op, i) =>
        val b = i + 1L
        // deletes before upserts within a batch, like the versioned
        // sinks; removes of absent ids and empty sets are legal
        if (op.deletes.nonEmpty)
          IvfIndex.removeDeltaPersisted(spark, dir,
            op.deletes.toSeq.sorted.toDF("vec_id"))
        if (op.upserts.nonEmpty)
          IvfIndex.addDeltaPersisted(spark, dir, toDf(op.upserts, b))
        state = (state -- op.deletes) ++
          op.upserts.map(id => id -> (emb(id, b).toSeq, lab(id, b)))

        if (b == 3L) IvfIndex.compactPersisted(spark, dir, maxFilesPerPartition = 1)

        val stored = spark.read.parquet(s"$dir/vectors")
          .select($"vec_id", $"embedding", $"label").collect()
          .map(r => r.getLong(0) -> (r.getSeq[Float](1).toSeq, r.getInt(2))).toMap
        assert(stored == state, s"seed=$seed batch=$b: posting rows diverge from fold")
        Seq("pq", "pqr").foreach { sub =>
          val codeRows = spark.read.parquet(s"$dir/$sub/codes")
            .select($"vec_id", $"label").collect()
            .map(r => (r.getLong(0), r.getInt(1)))
          assert(codeRows.length == codeRows.map(_._1).distinct.length,
            s"seed=$seed batch=$b: $sub carries duplicate code rows")
          assert(codeRows.map(_._1).toSet == state.keySet,
            s"seed=$seed batch=$b: $sub ids diverge from fold")
          codeRows.foreach { case (id, l) =>
            assert(l == state(id)._2,
              s"seed=$seed batch=$b: $sub stale label for id=$id ($l != ${state(id)._2})")
          }
        }
      }

      // the filtered quantized serve finds every probed live id
      // through its CURRENT label at exact score — end-to-end proof
      // the maintained sidecar + metadata actually serve
      val probeIds = state.keySet.toSeq.sorted.take(3)
      val queries = probeIds.map(id => (id, state(id)._1, state(id)._2))
        .toDF("q_id", "q_vec", "q_label")
      val top1 = IvfIndex.searchPersistedPqFiltered(spark, dir, queries,
        col("label") === col("q_label"), k = 1).collect()
      assert(top1.length == probeIds.length)
      top1.foreach(r => assert(
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id") &&
          r.getAs[Long]("score_e6") == 1000000L,
        s"seed=$seed: live id not servable through the filtered quantized path"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
