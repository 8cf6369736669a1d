package graft

import graft.core.Stab
import graft.functions.vectors._
import graft.index.{IndexMeta, IvfIndex, NswIndex}
import graft.operators.KnnSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The drift-envelope maintenance policy (VERDICT r4 #1): `maintain`/
  * `maintainRemove` must take the cheap delta path inside the measured
  * ~10% envelope and flip to a full rebuild past it, with the
  * [[IndexMeta]] sidecar accounting exactly for applied drift — only
  * rows the fit has never seen (replays and re-adds of identical rows
  * count 0; removes count only ids actually present), a rebuild
  * resetting the counter, and a sidecar-less layout rebuilding on
  * first contact. Reference contract: the per-record `add`/`remove`
  * endpoints vs explicit `rebuild`
  * (/root/reference/src/models/ivf_index.py:56-137,
  * nsw_index.py:54-113). Search must hold the ≥0.9 recall bar on BOTH
  * branches.
  */
class MaintenanceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = graft.core.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")
  // 500 vectors at sf0.001: base 450 → 10% envelope = 45 rows
  private lazy val base = emb.filter($"vec_id" >= 50)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def meta(path: String): IndexMeta.Meta =
    IndexMeta.read(spark, path).getOrElse(fail(s"no sidecar at $path"))

  private def vectorCount(path: String): Long =
    spark.read.parquet(s"$path/vectors").count()

  private def topIds(df: DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(col("rank") <= k).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  private def recall(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double =
    want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }.sum / want.size

  /** Exact brute-force truth over an arbitrary (current) corpus — the
    * mid-maintenance corpus differs from any `SparkEntry` query's, so
    * the truth is computed directly. */
  private def bruteTop(corpus: DataFrame, queries: DataFrame, k: Int): Map[Long, Set[Long]] =
    topIds(KnnSearch.topK(
      corpus.crossJoin(broadcast(queries))
        .select($"q_id", $"vec_id".as("neighbor_id"),
          Stab.e6(cosineSim($"embedding", $"q_vec")).as("score_e6")),
      k, asc = false), k)

  private def queriesFrom(df: DataFrame) =
    df.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))

  test("IVF maintain: delta path inside the envelope, rebuild past it, recall holds on both") {
    val dir = tmp("graft-ivf-maintain")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    assert(meta(dir) == IndexMeta.Meta(450L, 0L))

    // 20/450 = 4.4% < 10% → delta branch; sidecar accumulates
    val b1 = emb.filter($"vec_id" < 20)
    assert(!IvfIndex.maintain(spark, dir, b1), "4.4% batch triggered a rebuild")
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
    assert(vectorCount(dir) == 470L)
    // delta-branch recall vs exact truth over the CURRENT 470-row corpus
    val q1 = queriesFrom(b1.filter($"vec_id" < 5))
    val r1 = recall(
      topIds(IvfIndex.searchPersisted(spark, dir, q1, k = 10), 10),
      bruteTop(base.unionByName(b1), q1, 10))
    assert(r1 >= 0.9, s"delta-branch recall $r1 < 0.9")

    // +30 → 50/450 = 11.1% > 10% → rebuild; counter resets, fit covers all
    val b2 = emb.filter($"vec_id" >= 20 && $"vec_id" < 50)
    assert(IvfIndex.maintain(spark, dir, b2), "11.1% accumulated drift did not rebuild")
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
    assert(vectorCount(dir) == 500L)
    val qAll = queriesFrom(emb.filter($"vec_id" < 5))
    val r2 = recall(
      topIds(IvfIndex.searchPersisted(spark, dir, qAll, k = 10), 10),
      bruteTop(emb, qAll, 10))
    assert(r2 >= 0.9, s"rebuilt-branch recall $r2 < 0.9")

    // fresh envelope after the rebuild: a small batch is a delta again
    // (re-adds of now-stored rows count 0 drift → nothing accumulates)
    assert(!IvfIndex.maintain(spark, dir, b1))
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
  }

  test("IVF drift counter is replay-idempotent: identical re-adds count 0") {
    val dir = tmp("graft-ivf-replay")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val b1 = emb.filter($"vec_id" < 20)
    assert(!IvfIndex.maintain(spark, dir, b1))
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
    // the same batch replayed: state converges, counter does not move
    assert(!IvfIndex.maintain(spark, dir, b1))
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
    assert(vectorCount(dir) == 470L)
    // a batch of rows the fit already saw (stored base rows) adds 0 too
    assert(!IvfIndex.maintain(spark, dir, base.filter($"vec_id" < 100)))
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
  }

  test("IVF sidecar-less layout counts as unknown drift and rebuilds") {
    val dir = tmp("graft-ivf-nosidecar")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_graft_meta.json"))
    assert(IvfIndex.maintain(spark, dir, emb.filter($"vec_id" === 0)),
      "pre-sidecar layout took the delta path on unknown drift")
    assert(meta(dir) == IndexMeta.Meta(451L, 0L))
  }

  test("IVF maintainRemove: absent ids count 0; present removals accumulate to a rebuild") {
    val dir = tmp("graft-ivf-mremove")
    IvfIndex.persist(IvfIndex.build(spark, emb), dir)
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
    // retried/foreign remove: no present ids → zero drift, no rewrite
    val absent = spark.range(900000, 900010).select($"id".as("vec_id"))
    assert(!IvfIndex.maintainRemove(spark, dir, absent))
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
    assert(vectorCount(dir) == 500L)
    // 20/500 = 4% → partition-pruned removal
    assert(!IvfIndex.maintainRemove(spark, dir, emb.filter($"vec_id" < 20).select($"vec_id")))
    assert(meta(dir) == IndexMeta.Meta(500L, 20L))
    assert(vectorCount(dir) == 480L)
    // +31 → 51/500 = 10.2% > 10% → re-fit on the survivors
    assert(IvfIndex.maintainRemove(spark, dir,
      emb.filter($"vec_id" >= 20 && $"vec_id" < 51).select($"vec_id")))
    assert(meta(dir) == IndexMeta.Meta(449L, 0L))
    assert(vectorCount(dir) == 449L)
    // 25 probe queries, not 5: the refit KMeans recall per query sits
    // around 0.9-0.98 and a 5-query mean occasionally dips under the
    // bar on unlucky cells (observed 0.88 once when an unrelated conf
    // change perturbed the fit's row order) — the wider set estimates
    // the same quantity with tolerable variance
    val qs = queriesFrom(emb.filter($"vec_id" >= 51 && $"vec_id" < 76))
    val survivors = emb.filter($"vec_id" >= 51)
    val r = recall(
      topIds(IvfIndex.searchPersisted(spark, dir, qs, k = 10), 10),
      bruteTop(survivors, qs, 10))
    // epsilon: a mean landing EXACTLY on the bar (22.5/25 hits) reads
    // 0.8999999999999999 in IEEE754 and must not flake the suite —
    // observed once under full-suite scheduling, green in isolation
    assert(r >= 0.9 - 1e-9, s"post-remove-rebuild recall $r < 0.9")
  }

  test("IVF direct persisted deltas are visible to the drift envelope (sidecar bumps)") {
    val dir = tmp("graft-ivf-direct")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    // 40 new rows applied OUTSIDE maintain — the envelope must see them
    IvfIndex.addDeltaPersisted(spark, dir, emb.filter($"vec_id" < 40))
    assert(meta(dir) == IndexMeta.Meta(450L, 40L))
    // a 6-row maintain batch crosses 45: 40+6 = 46/450 > 10% → rebuild
    assert(IvfIndex.maintain(spark, dir,
      emb.filter($"vec_id" >= 40 && $"vec_id" < 46)),
      "maintain under-counted drift applied by direct addDeltaPersisted")
    assert(meta(dir) == IndexMeta.Meta(496L, 0L))
    // direct removes bump too — and only for ids actually present
    IvfIndex.removeDeltaPersisted(spark, dir,
      emb.filter($"vec_id" < 10).select($"vec_id").unionByName(
        spark.range(900000, 900005).select($"id".as("vec_id"))))
    assert(meta(dir) == IndexMeta.Meta(496L, 10L))
  }

  test("NSW maintain: delta path, rebuild past the envelope, removals; recall holds") {
    val dir = tmp("graft-nsw-maintain")
    NswIndex.persist(base, NswIndex.buildEdges(base), dir)
    assert(meta(dir) == IndexMeta.Meta(450L, 0L))

    // 20/450 → beam-link delta; new nodes must be genuinely servable
    val b1 = emb.filter($"vec_id" < 20)
    assert(!NswIndex.maintain(spark, dir, b1), "4.4% batch triggered a graph rebuild")
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
    val q1 = queriesFrom(b1.filter($"vec_id" < 5))
    val self = NswIndex.searchPersisted(spark, dir, q1, k = 3)
      .filter($"q_id" === $"neighbor_id").collect()
    assert(self.length == 5 && self.forall(_.getAs[Long]("score_e6") == 1000000L),
      "delta-branch nodes not self-servable at cosine 1.0")
    // replayed batch: counter frozen, no duplicate rows
    assert(!NswIndex.maintain(spark, dir, b1))
    assert(meta(dir) == IndexMeta.Meta(450L, 20L))
    assert(vectorCount(dir) == 470L)

    // +30 → 50/450 > 10% → LSH+NN-descent rebuild over the full corpus
    val b2 = emb.filter($"vec_id" >= 20 && $"vec_id" < 50)
    assert(NswIndex.maintain(spark, dir, b2), "11.1% accumulated drift did not rebuild")
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
    val qAll = queriesFrom(emb.filter($"vec_id" < 5))
    val r = recall(
      topIds(NswIndex.searchPersisted(spark, dir, qAll, k = 5), 5),
      bruteTop(emb, qAll, 5))
    assert(r >= 0.9, s"rebuilt-graph recall@5 $r < 0.9")

    // remove side: absent ids are free; present removals accumulate
    assert(!NswIndex.maintainRemove(spark, dir,
      spark.range(900000, 900010).select($"id".as("vec_id"))))
    assert(meta(dir) == IndexMeta.Meta(500L, 0L))
    assert(!NswIndex.maintainRemove(spark, dir,
      emb.filter($"vec_id" < 20).select($"vec_id")))
    assert(meta(dir) == IndexMeta.Meta(500L, 20L))
    assert(NswIndex.maintainRemove(spark, dir,
      emb.filter($"vec_id" >= 20 && $"vec_id" < 51).select($"vec_id")))
    assert(meta(dir) == IndexMeta.Meta(449L, 0L))
    // no vector row, no edge touches a removed id after the rebuild
    assert(spark.read.parquet(s"$dir/vectors").filter($"vec_id" < 51).count() == 0)
    assert(spark.read.parquet(s"$dir/edges")
      .filter($"src" < 51 || $"dst" < 51).count() == 0)
  }

  test("drift probe never shuffles the stored index — both joins ride explicit broadcasts") {
    val dir = tmp("graft-drift-plan")
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    val stored = spark.read.parquet(s"$dir/vectors")
    val delta = emb.filter($"vec_id" < 20)
    // with auto-broadcast off, any join NOT riding an explicit
    // broadcast hint falls back to SMJ — i.e. a full hash-shuffle of
    // the stored side, the exact plan the drift probe must never take
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val frame = IvfIndex.driftFrame(stored, delta)
      val plan = frame.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"drift probe shuffled the stored index:\n${plan.take(2000)}")
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(bhj == 2, s"expected 2 broadcast joins (id semi + byte anti), got $bhj:\n${plan.take(2000)}")
      // and the probe still counts correctly through the new plan:
      // 20 fresh rows drift, a replay of stored rows drifts 0
      assert(frame.count() == 20L)
      assert(IvfIndex.driftFrame(stored, base.filter($"vec_id" < 100)).count() == 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("NSW sidecar-less layout rebuilds on first maintenance") {
    val dir = tmp("graft-nsw-nosidecar")
    NswIndex.persist(base, NswIndex.buildEdges(base), dir)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_graft_meta.json"))
    assert(NswIndex.maintain(spark, dir, emb.filter($"vec_id" === 0)))
    assert(meta(dir) == IndexMeta.Meta(451L, 0L))
  }
}
