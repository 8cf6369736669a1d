package graft

import graft.core.Tables
import graft.index.{IvfIndex, RecallEval, SnapshotLayout}
import graft.store.{IndexVersions, VersionedMemo}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins for the ADVICE-r15 fixes and the auto probe policy
  * (VERDICT r15 #1/#7):
  *
  *  - the FILTERED mass serve keeps the query frame's meta columns
  *    (the r15 high finding: `massProbes` projected a fixed trio and
  *    the filtered branch then dropped `q_vec`, so any filtered serve
  *    under the mass policy failed at analysis) — pinned by τ=1.0
  *    parity against the full-count filtered probe, persisted AND
  *    as-of, with a predicate that references a query meta column;
  *  - `probeMass` UNSET resolves to the tuner's memoized τ
  *    ([[RecallEval.autoTauFor]]), retuned on layout version bumps —
  *    the resolution-rule grid is the oracled `probe_mass_auto`;
  *  - an out-of-range mass conf no longer fails explicit-nProbe
  *    serves that discard it;
  *  - eviction hygiene: the big cached-plan memo users release
  *    executor memory through their eviction hooks (a long-lived
  *    serving session is the 100 TB steady state);
  *  - the LRU trim never victimizes a just-touched entry (brief
  *    overshoot is tolerated instead — the r15 concurrent-thrash
  *    finding).
  */
class Round16Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def withMass[T](v: String)(body: => T): T = {
    val old = spark.conf.getOption(IvfIndex.probeMassConfKey)
    spark.conf.set(IvfIndex.probeMassConfKey, v)
    try body
    finally {
      spark.conf.unset(IvfIndex.probeMassConfKey)
      old.foreach(spark.conf.set(IvfIndex.probeMassConfKey, _))
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("filtered mass serve keeps query meta columns: tau=1.0 == full-count (ADVICE r15 high)") {
    val emb = Tables.embeddings(spark, sf)
    val built = IvfIndex.buildCachedFor(s"ivf_meta:$sf", spark,
      emb.select($"vec_id", $"embedding", $"label"), sf,
      metaCols = Seq("label"))
    val kAll = built.centroids.count().toInt
    val q5 = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val pred = col("label") === col("q_label")
    // the r15 bug: this exact shape (mass conf + nProbe sentinel +
    // a predicate referencing a query meta column) failed with an
    // AnalysisException before the fix
    val massServe = withMass("1.0")(
      rows(IvfIndex.searchFiltered(built, q5, pred)))
    assert(massServe == rows(IvfIndex.searchFiltered(built, q5, pred,
        nProbe = kAll)),
      "filtered mass serve at tau=1.0 must equal the full-count filtered probe")
  }

  test("filtered AS-OF mass serve: tau=1.0 == full-count at every as-of point") {
    val emb = Tables.embeddings(spark, sf)
    val all = emb.select($"vec_id", $"embedding", $"label")
    val none = all.limit(0).select($"vec_id")
    val path = tmp("graft-r16-massfiltered") + "/ivf"
    SnapshotLayout.init(
      IvfIndex.build(spark, all.filter($"vec_id" >= 50), metaCols = Seq("label")),
      path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = none)
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.limit(0),
      deletes = all.filter($"vec_id" >= 25 && $"vec_id" < 30).select($"vec_id"))
    val kAll = spark.read.parquet(s"$path/centroids").count().toInt
    val q5 = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val pred = col("label") === col("q_label")
    for (b <- Seq(1L, Long.MaxValue)) {
      assert(withMass("1.0")(
          rows(SnapshotLayout.searchAsOfFiltered(spark, path, b, q5, pred))) ==
        rows(SnapshotLayout.searchAsOfFiltered(spark, path, b, q5, pred,
          nProbe = kAll)),
        s"filtered as-of mass serve at batch $b must be exact at tau=1.0")
    }
  }

  test("auto policy: unset conf resolves the tuner's tau, memoized, retuned on bump") {
    val built = IvfIndex.buildCached(spark, sf)
    // the resolved tau is a tuner grid point and clears the bar rule
    val tau = IvfIndex.autoTauOf(built)
    assert(tau.isDefined, "a buildCached Built must carry a tuning identity")
    assert(RecallEval.massTuneTaus.contains(tau.get))
    // the memo discipline, instrumented directly: one sweep per
    // version, a bump retunes
    val dir = tmp("graft-r16-autotau")
    var sweeps = 0
    def tune(): Double = RecallEval.autoTauFor(spark, "r16-autotau", dir) {
      sweeps += 1; built
    }
    val t1 = tune()
    assert(sweeps == 1 && tune() == t1 && sweeps == 1,
      "an unchanged layout must serve the memoized tau")
    IndexVersions.bump(dir)
    assert(tune() == t1 && sweeps == 2,
      "a layout mutation must retune (same corpus -> same choice)")
    // ad-hoc Builts have no tuning context and keep the count policy
    val adHoc = IvfIndex.Built(built.assigned, built.centroids)
    assert(IvfIndex.autoTauOf(adHoc).isEmpty)
    // an out-of-range conf fails mass serves naming the key, but must
    // NOT fail an explicit-nProbe serve that discards it (ADVICE r15)
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    withMass("7.5") {
      val kAll = built.centroids.count().toInt
      assert(IvfIndex.search(built, queries, nProbe = kAll).count() > 0,
        "explicit-nProbe serves must ignore a bad mass conf")
      val e = intercept[IllegalArgumentException] {
        IvfIndex.search(built, queries).collect()
      }
      assert(e.getMessage.contains(IvfIndex.probeMassConfKey))
    }
  }

  test("eviction hygiene: buildCached's hook unpersists the evicted plan (VERDICT r15 #7)") {
    // a private corpus dir so bumping it cannot disturb the shared
    // session memos other suites rely on
    val dir = tmp("graft-r16-evict")
    Tables.embeddings(spark, sf).filter($"vec_id" < 200)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val b1 = IvfIndex.buildCached(spark, dir)
    b1.assigned.count()
    assert(b1.assigned.storageLevel != StorageLevel.NONE,
      "a memoized build serves from a cached plan")
    // a store write under the dir invalidates the entry; the replace
    // must release the old plan's executor memory through the hook
    IndexVersions.bump(dir)
    val b2 = IvfIndex.buildCached(spark, dir)
    assert(b2.assigned ne b1.assigned)
    assert(b1.assigned.storageLevel == StorageLevel.NONE,
      "the evicted build's cached plan must be unpersisted")
  }

  test("LRU trim spares just-touched entries, tolerating brief overshoot (ADVICE r15)") {
    var evicted = List.empty[Int]
    val memo = new VersionedMemo[Int](
      onEvict = (v: Int) => evicted ::= v, maxEntries = 2)
    val dir = tmp("graft-r16-lru")
    def get(label: Int): Int = memo.get(spark, s"e$label", dir)(label)
    // a fast burst: every entry was touched within the grace window,
    // so nothing is evictable yet — the memo overshoots its cap
    // instead of victimizing an entry another thread just got back
    assert(get(1) == 1 && get(2) == 2 && get(3) == 3)
    assert(memo.size == 3, "a burst of fresh entries must overshoot, not thrash")
    assert(evicted.isEmpty)
    // age the burst by touching entry 1 repeatedly, then insert: the
    // stale entries (2, 3) are past the grace window and trim away,
    // while the hot entry 1 survives
    (1 to 6).foreach(_ => get(1))
    assert(get(4) == 4)
    assert(memo.size <= 2, s"stale entries must trim back to the cap: ${memo.size}")
    assert(evicted.toSet == Set(2, 3))
    assert(get(1) == 1 && evicted.size == 2, "the hot entry must have survived")
  }
}
