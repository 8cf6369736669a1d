package graft

import graft.index.{IvfIndex, SnapshotLayout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-9 operators — each scaladoc's
  * 100 TB claim checked against the EXECUTED plan.
  */
class Round9PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("crud_asof: constant-state fingerprint agg — no collect_list anywhere") {
    val df = graft.operators.Collections.crudAsof(spark, dir)
    val p = plan(df)
    // the round-9 contract: XOR fingerprint with constant per-group
    // state; the old single-buffer shape would show collect_list +
    // array_sort in the aggregate
    assert(!p.contains("collect_list"), s"collect_list back in crud_asof:\n$p")
    assert(p.contains("partial_"), s"no partial (map-side) aggregation:\n$p")
  }

  test("as-of serve: batch_id bound prunes the versioned scan at the partition level") {
    val all = graft.core.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-planspec").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.limit(0).select($"vec_id"))
    val asof1 = SnapshotLayout.asOfAssigned(spark, path, 1L)
    val p = plan(asof1)
    // batch_id is a PARTITION column: the ≤ bound must appear as a
    // partition filter on the vectors scan (directory pruning), not a
    // post-scan row filter
    assert(p.contains("PartitionFilters") &&
      p.matches("(?s).*PartitionFilters: \\[[^\\]]*batch_id[^\\]]*\\].*"),
      s"batch_id bound not a partition filter:\n$p")
    // and batch 2's rows genuinely never load: as-of-1 sees no 25..49
    assert(asof1.filter($"vec_id" >= 25 && $"vec_id" < 50).count() == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("nsw_search_filtered: no cartesian product; the one crossJoin side is the broadcast seed set") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val edges = graft.index.NswIndex.edgesCached(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"label".as("q_label"))
    val df = graft.index.NswIndex.searchFiltered(emb, edges, queries,
      col("label") === col("q_label"), metaCols = Seq("label"))
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the filtered beam plan:\n$p")
    // the final accepted-set cut must still be a per-query window
    // (the predicate runs before the top-k rank)
    assert(p.contains("Window"), s"no rank window in filtered serve:\n$p")
  }

  test("bpe_train_batched: one training loop per session (memo), table equals bpe-sequential prefix shape") {
    // two invocations in one session must not retrain: the second is a
    // pure memo read, so its wall time is bounded by plan construction
    val warm = graft.text.BpeTrain.bpeTrainBatched(spark, dir).collect()
    val t0 = System.nanoTime()
    val again = graft.text.BpeTrain.bpeTrainBatched(spark, dir).collect()
    val dtMs = (System.nanoTime() - t0) / 1e6
    assert(again.sameElements(warm))
    assert(dtMs < 2000.0, s"second batched train took ${dtMs}ms — memo not hit")
    // ranks dense, counts positive
    assert(warm.map(_.getLong(0)).toSeq == (1L to warm.length.toLong))
    assert(warm.forall(_.getLong(4) > 0L))
  }

  test("opq rotation column is codegen-friendly (no UDF nodes in the encode plan)") {
    val emb = graft.core.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val rot = graft.index.PqCodebooks.fitRotation(emb)
    val df = emb.select(graft.index.PqCodebooks.rotateCol($"embedding", rot).as("r"))
    val p = plan(df)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"UDF in the rotation plan:\n$p")
  }
}
