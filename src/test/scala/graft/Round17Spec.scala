package graft

import graft.core.Tables
import graft.index.{IvfIndex, RecallEval, SnapshotLayout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins for the tuner-off-the-serve-path rework (VERDICT r16
  * #1):
  *
  *  - the single-scan sweep is VALUE-IDENTICAL to the per-grid-point
  *    serves it replaced: each tau's recall derived from one
  *    per-(query, cell) top-k scan must equal the recall measured by
  *    running [[IvfIndex.search]] at that tau against the full-probe
  *    exact serve — the `probe_mass_tune` oracle pins the chosen tau,
  *    so an equivalence break would flip a driver hash;
  *  - the tuning SIDECAR makes the choice a per-fit cost: a version
  *    bump re-reads the persisted tau instead of re-sweeping, and a
  *    re-persist (new fit) clears it so the next zero-conf serve
  *    retunes.
  */
class Round17Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("single-scan sweep equals the per-tau serves it replaced (VERDICT r16 #1)") {
    val built = IvfIndex.buildCached(spark, sf)
    val fast = RecallEval.sweepBuilt(spark, built)
    // the old measurement, re-derived from the serve paths directly:
    // one full-probe exact serve + one mass serve per grid point,
    // recall from the intersected top-k id sets
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val n = built.assigned.count()
    val qMod = math.max(1L, n / 100L)
    val queries = built.assigned.filter(pmod($"vec_id", lit(qMod)) === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      .localCheckpoint(true)
    val masses = built.assigned.groupBy($"cluster_id")
      .agg(count(lit(1)).as("cmass")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kAll = built.centroids.count().toInt
    val exact = sets(IvfIndex.search(built, queries, nProbe = kAll))
    val den = exact.values.map(_.size).sum
    val slow = RecallEval.massTuneTaus.map { tau =>
      val got = sets(IvfIndex.search(built, queries, probeMass = Some(tau),
        cellMasses = Some(masses)))
      val num = exact.map { case (q, w) =>
        got.getOrElse(q, Set.empty).intersect(w).size }.sum
      (math.round(tau * 100).toInt,
        math.floorDiv(num.toLong * 1000000L, math.max(1L, den.toLong)))
    }
    info(s"fast sweep: ${fast.mkString(", ")}")
    assert(fast == slow,
      "the single-scan sweep must reproduce the serve-derived recalls exactly")
  }

  test("tuning sidecar: tuned once per fit, bump re-reads, re-persist retunes") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val path = tmp("graft-r17-sidecar") + "/ivf"
    IvfIndex.persist(IvfIndex.build(spark, emb), path)
    assert(RecallEval.readTauSidecar(spark, path).isEmpty,
      "a fresh layout carries no tuning sidecar until first tuned")
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // first zero-conf serve tunes AND persists the choice
    val first = IvfIndex.searchPersisted(spark, path, q).collect()
    val tau = RecallEval.readTauSidecar(spark, path)
    assert(tau.isDefined && RecallEval.massTuneTaus.contains(tau.get),
      "the first zero-conf serve must persist the tuner's grid-point choice")
    // a version bump must NOT re-sweep: corrupt the would-be sweep by
    // planting a sentinel tau in the sidecar — if the serve re-reads
    // the sidecar (and does not re-sweep), it serves the sentinel
    RecallEval.writeTauSidecar(spark, path, 0.10)
    graft.store.IndexVersions.bump(path)
    val cells = spark.read.parquet(s"$path/vectors")
      .groupBy($"cluster_id").agg(count(lit(1)).as("cmass")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sentinelServe = IvfIndex.searchPersisted(spark, path, q).collect()
    val explicitThin = IvfIndex.search(
      IvfIndex.Built(spark.read.parquet(s"$path/vectors"),
        spark.read.parquet(s"$path/centroids")),
      q, probeMass = Some(0.10), cellMasses = Some(cells)).collect()
    assert(sentinelServe.map(_.toSeq).toSeq == explicitThin.map(_.toSeq).toSeq,
      "after a bump the serve must read the persisted tau, not re-sweep")
    // a re-persist (new fit) clears the sidecar: the sentinel is gone
    // and the next serve retunes to a real grid choice
    IvfIndex.persist(IvfIndex.build(spark, emb), path)
    assert(RecallEval.readTauSidecar(spark, path).isEmpty,
      "persist() must clear the previous fit's tuning sidecar")
    val retuned = IvfIndex.searchPersisted(spark, path, q).collect()
    assert(RecallEval.readTauSidecar(spark, path) == tau,
      "same corpus, same fit seed -> the retune re-derives the same tau")
    assert(retuned.map(_.toSeq).toSeq == first.map(_.toSeq).toSeq)
  }

  test("as-of serves keep the head-tuned tau across applyBatch (no per-batch sweep)") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val none = emb.limit(0).select($"vec_id")
    val path = tmp("graft-r17-asof") + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, emb.filter($"vec_id" >= 50)), path)
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SnapshotLayout.searchAsOf(spark, path, Long.MaxValue, q).collect()
    val tuned = RecallEval.readTauSidecar(spark, path)
    assert(tuned.isDefined, "the first zero-conf as-of serve persists its tau")
    // plant a sentinel, apply a batch (bump): the serve must come back
    // reading the sidecar — a re-sweep would overwrite the sentinel
    RecallEval.writeTauSidecar(spark, path, 0.10)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = emb.filter($"vec_id" < 25), deletes = none)
    SnapshotLayout.searchAsOf(spark, path, Long.MaxValue, q).collect()
    assert(RecallEval.readTauSidecar(spark, path).contains(0.10),
      "applyBatch must not retune: the fit is frozen, the sidecar stands")
  }
}
