package graft

import graft.index.{IvfIndex, SnapshotLayout}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-10 compressed-tier couplings —
  * each scaladoc's 100 TB claim checked against the EXECUTED plan.
  */
class Round10PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filtered ADC serve: the predicate evaluates in the probed code scan, no corpus metadata join") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val base = IvfIndex.pqLayoutFor(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val df = IvfIndex.searchPersistedPqFiltered(spark, base, queries,
      col("label") === col("q_label"))
    val p = plan(df)
    // the predicate must NOT cost a join against corpus-sized
    // metadata: the only joins in the serve are broadcasts (probe
    // frame, candidate ids, query vectors) — label rides the code
    // rows, so a SortMergeJoin or shuffled hash join anywhere means
    // the sidecar metadata design regressed
    assert(!p.contains("SortMergeJoin"), s"shuffle join in the filtered ADC serve:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"shuffle join in the filtered ADC serve:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the filtered ADC serve:\n$p")
    // and the label equality is a plain filter over the scanned rows
    assert(p.contains("BroadcastHashJoin"), s"probe broadcast missing:\n$p")
  }

  test("versioned ADC serve: batch_id bound prunes the codes scan; winners scan never reads embeddings") {
    val all = graft.core.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-plan10").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.initPq(spark, path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    SnapshotLayout.applyBatch(spark, path, 2L,
      upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
      deletes = all.limit(0).select($"vec_id"))
    val live1 = SnapshotLayout.asOfCodes(spark, path, 1L)
    val p = plan(live1)
    // the ≤ bound must reach BOTH versioned scans (codes and the
    // keys-only winners side) as a partition filter — directory
    // pruning, not a post-scan row filter
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*batch_id[^\\]]*\\].*"),
      s"batch_id bound not a partition filter on the codes scan:\n$p")
    // the merge-on-read window's claim: keys only — no scan in the
    // live-codes reconstruction reads the embedding payload
    val vectorScans = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/vectors"))
      .toSeq
    assert(vectorScans.nonEmpty, s"no vectors scan found:\n$p")
    vectorScans.foreach { l =>
      assert(!l.contains("embedding"),
        s"winners scan reads the embedding payload:\n$l")
    }
    // live set correctness rides the fold/snapshot specs; here just
    // pin that the reconstruction serves the batch-1 state
    assert(live1.filter($"vec_id" >= 25 && $"vec_id" < 50).count() == 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("versioned ADC rerank: direct-address fetch — no window over the raw corpus in the serve") {
    val all = graft.core.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-plan10b").toString + "/ivf"
    SnapshotLayout.init(IvfIndex.build(spark, all.filter($"vec_id" >= 50)), path)
    SnapshotLayout.initPq(spark, path)
    SnapshotLayout.applyBatch(spark, path, 1L,
      upserts = all.filter($"vec_id" < 25), deletes = all.limit(0).select($"vec_id"))
    val queries = all.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val df = SnapshotLayout.searchAsOfPq(spark, path, 1L, queries)
    val p = plan(df)
    // exactly four windows belong in this serve: the probe's centroid
    // ranking, the keys-only winner argmax, the ADC rerank cut, and
    // topK's rank — the raw-vector side must join by
    // (cluster_id, vec_id, batch_id) address; a FIFTH window would
    // mean the rerank re-windows the corpus (the raw as-of serve's
    // merge-on-read cost creeping back in)
    val windows = p.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 4, s"unexpected extra windows ($windows) in the ADC serve:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the versioned ADC serve:\n$p")
    // serves correctly end-to-end (identity is SnapshotSpec's job)
    val rows = df.collect()
    assert(rows.nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(path).getParentFile)
  }

  test("observability plans: debt gauge never reads embeddings; diff joins on keys, no nested loop") {
    // both entries claim 100 TB shapes in their scaladoc: the debt
    // gauge is a KEY-ONLY scan + argmax window (an embedding column in
    // any of its scans would push the payload through the shuffle),
    // and the change feed is one equi-keyed full-outer join (a
    // BroadcastNestedLoopJoin or cartesian would mean the join key was
    // lost and the diff went quadratic)
    val scenario = SnapshotLayout.pristineScenario(spark, dir)
    val debtPlan = plan(SnapshotLayout.layoutDebt(spark, scenario))
    debtPlan.linesIterator.filter(_.contains("FileScan parquet")).foreach { l =>
      assert(!l.contains("embedding"),
        s"debt gauge scan reads the embedding payload:\n$l")
    }
    val diffPlan = plan(SnapshotLayout.indexAsofDiff(spark, dir))
    assert(!diffPlan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the change feed:\n$diffPlan")
    assert(!diffPlan.contains("CartesianProduct"),
      s"cartesian in the change feed:\n$diffPlan")
  }
}
