package graft

import graft.index.{IvfIndex, NswIndex, NswSnapshotLayout, SnapshotLayout}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 plan-shape and contract pins: the CDC diff's fingerprinted
  * exchange (no embedding array through the shuffle), the per-family
  * payload-column contract, the preserved null-flip semantics, and the
  * fail-loud endpoints/gauge guards.
  */
class Round11PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  test("index_asof_diff: no exchange carries an array column — the diff shuffles fingerprints, not embeddings") {
    // AQE wraps exchanges in query stages the tree collect can't see;
    // the static physical plan has the real ShuffleExchange nodes
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (df, exchanges) =
      try {
        val d = SnapshotLayout.indexAsofDiff(spark, dir)
        (d, d.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        })
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(exchanges.nonEmpty, "diff plan has no shuffle at all — plan shape changed?")
    exchanges.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"diff exchange carries array columns ${arrays.map(_.name).mkString(",")}:\n$e")
    }
    // and the classification still works end-to-end
    assert(!df.isEmpty)
  }

  test("NSW diff: a USER metadata column named cluster_id is payload — its changes ride the feed") {
    val all = graft.core.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
    val base = all.filter($"vec_id" >= 50 && $"vec_id" < 110)
      .withColumn("cluster_id", ($"vec_id" % 3).cast("int"))
      .localCheckpoint(true)
    val path = java.nio.file.Files.createTempDirectory("graft-plan11a")
      .toString + "/nsw"
    NswSnapshotLayout.init(base,
      NswIndex.buildEdgesLsh(base.select($"vec_id", $"embedding")), path)
    NswSnapshotLayout.applyBatch(spark, path, 1L,
      upserts = base.filter($"vec_id" === 50)
        .withColumn("cluster_id", lit(99).cast("int")),
      deletes = base.limit(0).select($"vec_id"))
    val changes = NswSnapshotLayout.asOfDiff(spark, path, 0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((50L, "updated")),
      s"user cluster_id change dropped from the NSW feed: $changes")
    graft.core.Checkpoints.free(base)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("diff null-flip: a metadata field flipping to NULL still classifies updated under the fingerprint") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val base = emb.filter($"vec_id" >= 50 && $"vec_id" < 110)
      .select($"vec_id", $"embedding", $"label")
    val path = java.nio.file.Files.createTempDirectory("graft-plan11b")
      .toString + "/ivf"
    SnapshotLayout.init(
      IvfIndex.build(spark, base, metaCols = Seq("label")), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = base.filter($"vec_id" === 55)
        .select($"vec_id", $"embedding",
          lit(null).cast(base.schema("label").dataType).as("label")),
      deletes = base.limit(0).select($"vec_id"))
    val changes = SnapshotLayout.asOfDiff(spark, path, 0L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((55L, "updated")),
      s"label -> NULL flip not classified updated: $changes")
    // IVF physical cluster_id stays non-payload: re-ingesting an
    // identical row is no change even if KMeans re-places it
    val none = SnapshotLayout.asOfDiff(spark, path, 1L, Long.MaxValue)
    assert(none.isEmpty, "head-vs-head diff not empty")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("asOfDiff endpoints: above-head refused unless the explicit Long.MaxValue head alias") {
    val scenario = SnapshotLayout.pristineScenario(spark, dir)
    intercept[IllegalArgumentException] {
      SnapshotLayout.asOfDiff(spark, scenario, 1L, 99L)
    }
    // the explicit head alias still answers
    assert(SnapshotLayout.asOfDiff(spark, scenario, 3L, Long.MaxValue).isEmpty)
  }

  test("debt gauge: refuses a directory with no snapshot manifests") {
    val path = java.nio.file.Files.createTempDirectory("graft-plan11c")
      .toString + "/notalayout"
    // some parquet under vectors/ but NO manifests — the torn shape
    // the guard exists for
    Seq((1L, Array(0.1f), 0L)).toDF("vec_id", "embedding", "batch_id")
      .write.partitionBy("batch_id").parquet(s"$path/vectors")
    intercept[IllegalArgumentException] {
      SnapshotLayout.layoutDebt(spark, path).collect()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }
}
