package graft.streaming

import graft.index.{IvfIndex, NswIndex}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous index maintenance — the live twin of the batch
  * incremental paths, mirroring the reference's mutating endpoints
  * (`add`/`remove` records against a served index,
  * /root/reference/src/models/ivf_index.py:90-137,
  * nsw_index.py:54-113) as a Structured Streaming sink.
  *
  * A mutation stream `(vec_id, embedding, op)` with `op ∈ {upsert,
  * delete}` drives one bounded maintenance call per micro-batch via
  * `foreachBatch`: deletes through `maintainRemove`, upserts through
  * `maintain`, so the drift-envelope rebuild policy fires under
  * continuous ingestion exactly as it does in batch — most batches
  * cost one delta append; the occasional batch that pushes
  * accumulated drift past the threshold pays the full re-fit.
  *
  * Exactly-once: `foreachBatch` is at-least-once, so each sink keys
  * application on the batch id — a sidecar (`_graft_stream_batch_
  * <streamId>.json` under the layout path) records the highest
  * FULLY-applied batch id, written only after the maintenance completes,
  * and a replayed id is skipped outright. A replayed batch therefore
  * moves neither the layout nor the drift counter (IndexStreamSpec
  * pins both, including the mixed delete+upsert case whose
  * re-execution used to inflate the counter +2 per replay). The
  * remaining at-least-once window is a crash BETWEEN finishing the
  * maintenance and writing the sidecar: that batch re-executes, the
  * layout converges anyway (add is an id-upsert with stale rows
  * dropped first; remove is idempotent), and the counter's only
  * exposure is the mixed-ops case — one-sided, an early rebuild at
  * worst, and only for the single batch in flight at the crash.
  *
  * Deletes apply before upserts within a batch, so a batch carrying
  * both ops for one id converges to "present" — the order a client
  * replacing a record expects.
  */
object IndexStream {

  /** Mutation stream → persisted IVF layout ([[IvfIndex.persist]]'s
    * contract at `path`). Start with e.g.
    * `.trigger(...).start()` on the returned writer. */
  def maintainIvf(mutations: DataFrame, path: String,
      threshold: Double = IvfIndex.rebuildThreshold,
      streamId: String = "default"): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) => applyIvfBatch(b, id, path, threshold, streamId))

  /** Mutation stream → persisted NSW graph layout
    * ([[NswIndex.persist]]'s contract at `path`). */
  def maintainNsw(mutations: DataFrame, path: String,
      threshold: Double = NswIndex.rebuildThreshold,
      streamId: String = "default"): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) => applyNswBatch(b, id, path, threshold, streamId))

  /** One IVF micro-batch, exactly as [[maintainIvf]]'s sink applies
    * it — `private[graft]` so the spec can drive a true same-batch-id
    * replay (MemoryStream never redelivers an id). */
  /** File-count bound under continuous ingestion: every delta batch
    * appends one file per touched `cluster_id=` directory, so a
    * long-running stream would otherwise accumulate unbounded small
    * files. After each applied batch the sink compacts any directory
    * past this bound ([[IvfIndex.compactPersisted]]) — compaction
    * moves no rows and never touches the drift sidecar, so the
    * exactly-once batch accounting is unaffected, and the check is a
    * directory listing (no job) on the batches that compact nothing. */
  val streamCompactFileBound = 16

  private[graft] def applyIvfBatch(batch: DataFrame, batchId: Long, path: String,
      threshold: Double = IvfIndex.rebuildThreshold,
      streamId: String = "default",
      compactFileBound: Int = streamCompactFileBound): Unit = {
    applyBatch(batch, batchId, path, streamId,
      del => IvfIndex.maintainRemove(batch.sparkSession, path, del, threshold),
      ups => IvfIndex.maintain(batch.sparkSession, path, ups, threshold))
    IvfIndex.compactPersisted(batch.sparkSession, path, compactFileBound)
  }

  private[graft] def applyNswBatch(batch: DataFrame, batchId: Long, path: String,
      threshold: Double = NswIndex.rebuildThreshold,
      streamId: String = "default",
      compactFileBound: Int = streamCompactFileBound): Unit = {
    applyBatch(batch, batchId, path, streamId,
      del => NswIndex.maintainRemove(batch.sparkSession, path, del, threshold),
      ups => NswIndex.maintain(batch.sparkSession, path, ups, threshold))
    NswIndex.compactPersisted(batch.sparkSession, path, compactFileBound,
      targetFiles = math.max(1, compactFileBound / 4))
  }

  /** Mutation stream → the VERSIONED IVF layout
    * ([[graft.index.SnapshotLayout]]'s contract at `path`): every
    * micro-batch lands APPEND-ONLY as layout batch `streamBatchId + 1`
    * (layout batch 0 is the base fit), with a snapshot manifest per
    * batch — so a live stream gets as-of serving for free and a bad
    * batch rolls back with `SnapshotLayout.rollback` instead of the
    * full rebuild the in-place layout would need.
    *
    * Exactly-once WITHOUT a separate applied-batch sidecar: the
    * manifest IS the marker (applyBatch writes it LAST). A replayed
    * id whose manifest exists is skipped outright; a crash mid-apply
    * leaves a batch with NO manifest, and the repair step purges its
    * partial directories by rolling back to the last manifested batch
    * before re-applying — the rollback machinery doubling as the
    * stream's crash recovery. */
  /** Compaction cadence for the versioned sinks: without one, a
    * long-running stream appends one `batch_id=` directory set (and
    * one manifest) per micro-batch FOREVER — unbounded directory
    * count and an as-of argmax window that grows without bound. Once
    * the layout carries more than [[versionedCompactMaxBatches]]
    * manifested batches, the sink compacts up to the batch that
    * leaves [[versionedCompactRetain]] most recent ones un-folded
    * (post-compaction: retain+1 manifests — the consolidated base
    * plus the retained tail). The retained tail is the rollback/as-of
    * window a bad-batch recovery needs; history below it is
    * deliberately truncated, the standard log-structured retention
    * trade. The threshold check is a manifest-directory listing (no
    * job) on the batches that compact nothing, and the manifest-keyed
    * exactly-once accounting is unaffected — compaction never touches
    * manifests ≥ upTo, and the crash-repair step already tolerates a
    * compacted floor (it rolls back to the LAST manifested batch,
    * which compaction always keeps). */
  val versionedCompactMaxBatches = 8
  val versionedCompactRetain = 4

  def maintainIvfVersioned(mutations: DataFrame, path: String,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) =>
        applyVersionedBatch(b, id, path, maxBatches, retain))

  private[graft] def applyVersionedBatch(batch: DataFrame, streamBatchId: Long,
      path: String, maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain): Unit =
    versionedSink(batch, streamBatchId, path,
      (spark, id, ups, dels) =>
        graft.index.SnapshotLayout.applyBatch(spark, path, id, ups, dels),
      (spark, last) => graft.index.SnapshotLayout.rollback(spark, path, last),
      (spark, upTo) => graft.index.SnapshotLayout.compact(spark, path, upTo),
      maxBatches, retain)

  /** The NSW twin: mutation stream → the versioned GRAPH layout
    * ([[graft.index.NswSnapshotLayout]]'s contract) — same manifest-
    * keyed exactly-once, rollback-as-crash-repair, and compaction
    * cadence. */
  def maintainNswVersioned(mutations: DataFrame, path: String,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) =>
        applyNswVersionedBatch(b, id, path, maxBatches, retain))

  private[graft] def applyNswVersionedBatch(batch: DataFrame, streamBatchId: Long,
      path: String, maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain): Unit =
    versionedSink(batch, streamBatchId, path,
      (spark, id, ups, dels) =>
        graft.index.NswSnapshotLayout.applyBatch(spark, path, id, ups, dels),
      (spark, last) => graft.index.NswSnapshotLayout.rollback(spark, path, last),
      (spark, upTo) => graft.index.NswSnapshotLayout.compact(spark, path, upTo),
      maxBatches, retain)

  private def versionedSink(batch: DataFrame, streamBatchId: Long, path: String,
      apply: (org.apache.spark.sql.SparkSession, Long, DataFrame, DataFrame) => Unit,
      repair: (org.apache.spark.sql.SparkSession, Long) => Unit,
      compact: (org.apache.spark.sql.SparkSession, Long) => Unit,
      maxBatches: Int, retain: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val layoutId = streamBatchId + 1
    val applied = graft.index.SnapshotLayout.manifestIds(spark, path)
    if (applied.contains(layoutId)) return // replay of a completed batch
    // crash repair: anything on disk beyond the last manifested batch
    // is a partial apply — purge it before re-applying
    applied.lastOption.filter(_ < layoutId).foreach(last => repair(spark, last))
    val b = batch.localCheckpoint(true)
    // apply() persists everything it derives from the batch (parquet
    // writes + the manifest), so the pinned micro-batch is garbage the
    // moment it returns — a long-running stream must not accumulate
    // one pinned checkpoint per trigger (the free-after-supersede
    // discipline)
    // the upsert side keeps EVERY mutation column except `op`: a
    // meta-bearing layout's applyBatch requires its metadata columns
    // (and drops extras), so projecting down to (vec_id, embedding)
    // here would fail every meta-bearing stream even when the
    // mutations carry the labels the layout needs
    val upCols = b.columns.toSeq.filterNot(_ == "op").map(col)
    try apply(spark, layoutId,
      b.filter(col("op") === "upsert").select(upCols: _*),
      b.filter(col("op") === "delete").select(col("vec_id")))
    finally graft.core.Checkpoints.free(b)
    // scheduled compaction: bound the un-compacted batch count
    val after = graft.index.SnapshotLayout.manifestIds(spark, path)
    if (after.size > maxBatches && retain >= 0 && retain < after.size - 1)
      compact(spark, after(after.size - 1 - retain))
  }

  // ---- generational sinks: the full lifecycle under ingestion ---------

  /** Mutation stream → a GENERATIONAL versioned IVF root
    * ([[graft.index.Generations]]; initialize with
    * [[graft.index.SnapshotLayout.initGen]]), closing the lifecycle
    * loop the debt gauge opened: batches land append-only in the
    * CURRENT generation with the versioned sink's manifest-keyed
    * exactly-once and rollback crash repair, the in-generation
    * compaction cadence bounds the merge-on-read window, and when a
    * batch pushes `delta_since_fit` past `threshold × fitted_n` the
    * sink CUTS OVER — `newGeneration` re-fits from head into
    * generation N+1 and swaps the pointer, so the drift signal
    * becomes the drift ACTION under continuous ingestion (the
    * persisted path's envelope-rebuild policy, expressed as a cutover
    * that keeps every old as-of answerable instead of rewriting in
    * place).
    *
    * Crash windows: a cutover that dies before its pointer commit is
    * invisible (the envelope is still tripped, so the NEXT trigger —
    * replay or not — retries it); a batch replayed from before a
    * cutover sits at or below the successor's base and skips whole
    * (the floor discipline). */
  /** Generation retention cadence: every generation is a FULL layout
    * (vectors + code sidecars), so a sink that cuts over forever
    * without retiring accumulates corpus-sized copies without bound —
    * at scale that is the dominant storage line item. A sink given a
    * finite `retainGens` keeps, after each cutover, the current
    * generation plus that many most-recent predecessors and retires
    * the rest via [[graft.index.Generations.dropGeneration]] — retired
    * as-ofs REFUSE at routing (the routing-gap guard) instead of
    * silently aliasing an older head, the same explicit retention
    * trade the versioned compaction cadence already makes within a
    * generation. Retirement runs only on the triggers that cut over:
    * zero cost on the steady-state path.
    *
    * The DEFAULT is the no-retirement sentinel: retirement DELETES
    * DATA (historical as-of reads and CDC consumers anchored in a
    * retired generation start refusing), so it is opt-in — an operator
    * upgrading an existing root keeps every generation until they pass
    * a finite `retainGens` deliberately. */
  val generationRetain: Int = Int.MaxValue

  def maintainIvfGenerational(mutations: DataFrame, root: String,
      threshold: Double = IvfIndex.rebuildThreshold,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain,
      retainGens: Int = generationRetain): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) =>
        applyIvfGenBatch(b, id, root, threshold, maxBatches, retain, retainGens))

  private[graft] def applyIvfGenBatch(batch: DataFrame, streamBatchId: Long,
      root: String, threshold: Double = IvfIndex.rebuildThreshold,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain,
      retainGens: Int = generationRetain): Unit =
    generationalSink(batch, streamBatchId, root,
      (spark, cur, id, ups, dels) =>
        graft.index.SnapshotLayout.applyBatch(spark, cur, id, ups, dels),
      (spark, cur, last) => graft.index.SnapshotLayout.rollback(spark, cur, last),
      (spark, cur, upTo) => graft.index.SnapshotLayout.compact(spark, cur, upTo),
      spark => graft.index.SnapshotLayout.newGeneration(spark, root): Unit,
      threshold, maxBatches, retain, retainGens)

  /** The NSW twin: generational graph root with automatic cutover —
    * the cutover's clean graph rebuild also heals accumulated
    * beam-link drift and re-add warts, so a long-running graph stream
    * no longer degrades without bound. */
  def maintainNswGenerational(mutations: DataFrame, root: String,
      threshold: Double = NswIndex.rebuildThreshold,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain,
      retainGens: Int = generationRetain): DataStreamWriter[Row] =
    mutations.writeStream.foreachBatch(
      (b: DataFrame, id: Long) =>
        applyNswGenBatch(b, id, root, threshold, maxBatches, retain, retainGens))

  private[graft] def applyNswGenBatch(batch: DataFrame, streamBatchId: Long,
      root: String, threshold: Double = NswIndex.rebuildThreshold,
      maxBatches: Int = versionedCompactMaxBatches,
      retain: Int = versionedCompactRetain,
      retainGens: Int = generationRetain): Unit =
    generationalSink(batch, streamBatchId, root,
      (spark, cur, id, ups, dels) =>
        graft.index.NswSnapshotLayout.applyBatch(spark, cur, id, ups, dels),
      (spark, cur, last) =>
        graft.index.NswSnapshotLayout.rollback(spark, cur, last),
      (spark, cur, upTo) =>
        graft.index.NswSnapshotLayout.compact(spark, cur, upTo),
      spark => graft.index.NswSnapshotLayout.newGeneration(spark, root): Unit,
      threshold, maxBatches, retain, retainGens)

  private def generationalSink(batch: DataFrame, streamBatchId: Long,
      root: String,
      apply: (org.apache.spark.sql.SparkSession, String, Long, DataFrame, DataFrame) => Unit,
      repair: (org.apache.spark.sql.SparkSession, String, Long) => Unit,
      compact: (org.apache.spark.sql.SparkSession, String, Long) => Unit,
      cutover: org.apache.spark.sql.SparkSession => Unit,
      threshold: Double, maxBatches: Int, retain: Int,
      retainGens: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    def curPath = graft.index.Generations.genPath(root,
      graft.index.Generations.current(spark, root))
    // the envelope: past the threshold, the gauge's signal becomes
    // the action (one sidecar JSON read on the batches that don't).
    // Checked BEFORE the replay early-return as well as after the
    // apply: a crash between a batch's apply (manifest written) and
    // its cutover replays as a skip, and deferring the pending
    // cutover to "the next non-replay batch" starves it forever on a
    // stream that then goes quiet — the replayed trigger itself must
    // complete the crashed cutover.
    def envelopeCutover(): Unit =
      graft.index.IndexMeta.read(spark, curPath).foreach { m =>
        if (m.fittedN > 0 && m.deltaSinceFit.toDouble / m.fittedN > threshold) {
          cutover(spark)
          // retention, on the cutover trigger only, in TWO PHASES so a
          // live change-feed trigger never reads a vanished file:
          // purge the PREVIOUS cycle's tombstones first (they have
          // been refusing at routing for a full envelope period — no
          // reader can still hold a listing of their files), then
          // tombstone the generations that just fell out of the
          // window (as-ofs refuse immediately; files linger until the
          // next cutover's purge)
          graft.index.Generations.purgeRetired(spark, root)
          val cur = graft.index.Generations.current(spark, root)
          // long arithmetic: the Int.MaxValue no-retirement sentinel
          // must not underflow into accidental retirement
          graft.index.Generations.list(spark, root)
            .filter(_.toLong < cur.toLong - retainGens.toLong)
            .foreach(g =>
              graft.index.Generations.retireGeneration(spark, root, g))
        }
      }
    envelopeCutover()
    val cur = curPath // re-resolved: a completed pending cutover moved it
    val layoutId = streamBatchId + 1
    val applied = graft.index.SnapshotLayout.manifestIds(spark, cur)
    // replays skip whole: a manifested id, or one at/below the current
    // generation's floor (applied before a cutover or compaction)
    if (applied.contains(layoutId) ||
        applied.headOption.exists(layoutId <= _)) return
    // crash repair within the current generation: anything on disk
    // beyond its last manifested batch is a partial apply
    applied.lastOption.filter(_ < layoutId).foreach(last =>
      repair(spark, cur, last))
    val b = batch.localCheckpoint(true)
    val upCols = b.columns.toSeq.filterNot(_ == "op").map(col)
    try apply(spark, cur, layoutId,
      b.filter(col("op") === "upsert").select(upCols: _*),
      b.filter(col("op") === "delete").select(col("vec_id")))
    finally graft.core.Checkpoints.free(b)
    val after = graft.index.SnapshotLayout.manifestIds(spark, cur)
    if (after.size > maxBatches && retain >= 0 && retain < after.size - 1)
      compact(spark, cur, after(after.size - 1 - retain))
    envelopeCutover()
  }

  /** `index_generation_stream`: the AUTOMATED lifecycle driver-checked
    * for both families — a mutation batch big enough to trip the drift
    * envelope must make the generational sink cut over on its own,
    * reset the successor's gauge, skip a replayed pre-cutover batch
    * whole, keep ingesting into the successor's log, and leave every
    * pre-cutover as-of answerable through the root. The scenario uses
    * a FIXED 200-row base slice at every SF: the grid certifies sink
    * LOGIC (cutover firing, replay, routing), which is scale-invariant
    * — the layout operations' own scale curves carry the data-
    * proportional story. Serving through the cutover is certified by
    * the `ivf_generation`/`nsw_generation` grids; this one pins the
    * STREAM wiring (reconstruction counts, manifests, gauge). */
  /** Session memo of each family's PRISTINE pre-cutover generational
    * root (the pristineScenario discipline): the base fits are built
    * once per (session, dir) and every invocation drives the sink
    * over a cheap filesystem copy — the per-invocation cost is the
    * thing under test (the envelope-tripping apply and the automatic
    * cutover), not a rebuild of the starting state. */
  private val genStreamCache = new graft.store.VersionedMemo[String](p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p).getParentFile))

  private def pristineGenRoot(spark: org.apache.spark.sql.SparkSession,
      dir: String, family: String)(init: String => Unit): String =
    genStreamCache.get(spark, s"genstream_$family:$dir", dir) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-genstream-$family").toString + "/root"
      init(path)
      path
    }

  def indexGenerationStream(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val emb = graft.core.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val slice = emb.filter(col("vec_id") >= 50 && col("vec_id") < 175)
    val baseRoot = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
      s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/genstream"
    def mut(df: DataFrame, op: String) =
      df.select(col("vec_id"), col("embedding"), lit(op).as("op"))
    // 15 delta rows > the 0.10 × 125 envelope: the sink must cut over
    val batch0 = mut(emb.filter(col("vec_id") < 15), "upsert")
    val batch1 = mut(emb.filter(col("vec_id") === 7), "delete")
    def drive(family: String, init: String => Unit,
        apply: (DataFrame, Long, String) => Unit,
        liveCount: (String, Long) => Long): DataFrame = {
      val root = s"$baseRoot/$family"
      graft.index.SnapshotLayout.copyLayout(spark,
        pristineGenRoot(spark, dir, family)(init), root)
      apply(batch0, 0L, root)
      val fired = graft.index.Generations.current(spark, root) == 2
      val gen2 = graft.index.Generations.genPath(root, 2)
      // the successor gauge as VALUES (round 13): fitted_n is the
      // cutover-time live count — the base slice plus batch 0's
      // upserts — and the delta resets to 0; both SQL-recomputable
      // from the scenario's slice arithmetic, so the oracle derives
      // them instead of pinning a folded constant-true boolean
      val gauge = graft.index.IndexMeta.read(spark, gen2)
      val gen2FittedN = gauge.map(_.fittedN).getOrElse(-1L)
      val gen2Delta = gauge.map(_.deltaSinceFit).getOrElse(-1L)
      val rows = spark.read.parquet(s"$gen2/vectors").count()
      apply(batch0, 0L, root) // a replay from before the cutover
      val replaySkips = spark.read.parquet(s"$gen2/vectors").count() == rows
      apply(batch1, 1L, root)
      // the VALUE columns below are recomputed by the SQL oracle from
      // the embeddings table (manifest list, gauge, live counts per
      // as-of) — the grid-oracle depth discipline: where a value is
      // SQL-derivable, emit the value and make the oracle recompute
      // it rather than pin a constant `true`
      val gen2Manifests = graft.index.SnapshotLayout
        .manifestIds(spark, gen2).mkString(",")
      spark.range(1).select(lit(family).as("family"),
        lit(fired).as("cutover_fired"),
        lit(gen2FittedN).as("gen2_fitted_n"),
        lit(gen2Delta).as("gen2_delta_since_fit"),
        lit(replaySkips).as("replay_skips"),
        lit(gen2Manifests).as("gen2_manifests"),
        lit(liveCount(root, Long.MaxValue)).as("head_live"),
        lit(liveCount(root, 0L)).as("old_asof_live"))
    }
    val ivf = drive("ivf",
      root => graft.index.SnapshotLayout.initGen(
        graft.index.IvfIndex.build(spark, slice), root),
      (b, id, root) => applyIvfGenBatch(b, id, root),
      (root, b) =>
        graft.index.SnapshotLayout.asOfAssignedGen(spark, root, b).count())
    val nsw = drive("nsw",
      root => graft.index.NswSnapshotLayout.initGen(slice,
        NswIndex.buildEdgesLsh(slice), root),
      (b, id, root) => applyNswGenBatch(b, id, root),
      (root, b) =>
        graft.index.NswSnapshotLayout.asOfVectorsGen(spark, root, b).count())
    ivf.unionByName(nsw).orderBy(col("family"))
  }

  /** The oracle recomputes the live counts AND the successor gauge
    * from the embeddings table (base slice 50..174, 15 upserts
    * `< 15`, one delete of id 7; fitted_n = the cutover-time live
    * count, delta resets to 0) and pins the successor's manifest id
    * list — value-recomputing where SQL can express the value,
    * constant-true only for the stream-machinery booleans whose real
    * coverage is IndexStreamSpec. */
  val indexGenerationStreamSql: String =
    """SELECT f.family, true AS cutover_fired,
      |  (SELECT COUNT(*) FROM embeddings
      |   WHERE (vec_id >= 50 AND vec_id < 175) OR vec_id < 15)
      |    AS gen2_fitted_n,
      |  CAST(0 AS BIGINT) AS gen2_delta_since_fit,
      |  true AS replay_skips, '1,2' AS gen2_manifests,
      |  (SELECT COUNT(*) FROM embeddings
      |   WHERE ((vec_id >= 50 AND vec_id < 175) OR vec_id < 15)
      |     AND vec_id <> 7) AS head_live,
      |  (SELECT COUNT(*) FROM embeddings
      |   WHERE vec_id >= 50 AND vec_id < 175) AS old_asof_live
      |FROM (SELECT 'ivf' AS family UNION ALL SELECT 'nsw') f
      |ORDER BY f.family""".stripMargin

  // ---- streaming CDC: the change feed as a readStream ------------------

  /** Continuous change feed over a versioned IVF layout — the
    * streaming twin of [[graft.index.SnapshotLayout.asOfDiff]] (the
    * Delta-CDF analog): a downstream consumer of a versioned sink no
    * longer polls manifests; each newly-manifested batch B emits
    * `asOfDiff(prev, B)` rows under `outPath/data/to_b=B/`.
    *
    * Mechanics: the per-batch snapshot manifests ARE the changelog,
    * so the source is a plain file stream over `_snapshots/` — the
    * file-source checkpoint (under `outPath/_checkpoint`) gives
    * exactly-once manifest DISCOVERY across restarts for free. Each
    * delivered manifest id then advances a consumer anchor
    * (`outPath/_graft_changes_anchor.json`, written AFTER the batch's
    * rows): the very first manifest anchors the feed and emits
    * nothing; ids at or below the anchor are replays and skip; a
    * replayed foreachBatch that crashed between rows and anchor
    * overwrites its own `to_b=B` directory — idempotent either way.
    *
    * Compaction mid-stream: folding history the reader has ALREADY
    * passed is invisible (its anchor is at or above the new floor).
    * A reader whose anchor fell BELOW the compaction floor cannot be
    * answered — the truncated log cannot reconstruct its `from` point
    * — and the stream fails loudly via the asOfDiff floor guard
    * instead of emitting a silently-wrong feed.
    *
    * Rollback of a live-tailed layout is NOT survivable in place:
    * rollback deletes manifests above its target and re-applied
    * batches recreate the same `batch-N.json` paths, which the
    * file-source checkpoint never redelivers — new content at reused
    * ids would emit nothing and already-emitted diffs for the undone
    * batches are never retracted. The reader therefore fails loudly
    * whenever the manifest log's head has regressed below its anchor
    * (the compaction-floor guard's twin); after a rollback below the
    * anchor, reset the consumer dir (checkpoint + anchor) and
    * re-anchor explicitly. A rollback the trigger never observes
    * mid-regression (target re-reached before the next manifest
    * lands) is the same divergence — treat any rollback of a tailed
    * layout as requiring a consumer reset.
    *
    * Generational roots: use [[changesIvfGen]]/[[changesNswGen]],
    * which follow the pointer across cutovers. Pointing THIS reader
    * at a single generation directory (`root/generation=N`) still
    * works — each generation is its own manifest log — but the feed
    * goes quiet at the next cutover. */
  def changesIvf(spark: org.apache.spark.sql.SparkSession, path: String,
      outPath: String): DataStreamWriter[Row] =
    changes(spark, s"$path/_snapshots", outPath,
      (from, to) => graft.index.SnapshotLayout.asOfDiff(spark, path, from, to),
      () => graft.index.SnapshotLayout.manifestIds(spark, path))

  /** The NSW twin: change feed over a versioned GRAPH layout. */
  def changesNsw(spark: org.apache.spark.sql.SparkSession, path: String,
      outPath: String): DataStreamWriter[Row] =
    changes(spark, s"$path/_snapshots", outPath,
      (from, to) =>
        graft.index.NswSnapshotLayout.asOfDiff(spark, path, from, to),
      () => graft.index.SnapshotLayout.manifestIds(spark, path))

  /** Continuous change feed over a GENERATIONAL versioned root — the
    * streaming twin of [[graft.index.SnapshotLayout.asOfDiffGen]],
    * closing the loop [[changesIvf]]'s single-generation reader left
    * open (after a cutover, new manifests land in the successor and a
    * per-generation feed goes silent). The source is the text stream
    * over the glob `root/generation=<any>/_snapshots`: the file source
    * re-expands the glob every trigger (GlobProbeSpec pins this), so
    * a successor's manifest log joins the feed the moment the cutover
    * commits — no re-pointing, no fresh checkpoint, and therefore no
    * silent re-anchor (the dropped-changes channel the corrupt-anchor
    * guard exists to close).
    *
    * The anchor discipline carries over UNCHANGED because batch ids
    * are globally monotonic across generations: a consumer's anchor
    * from generation N stays valid through a cutover, the successor's
    * base manifest (the predecessor's head id under a NEW path —
    * which the source does deliver) skips as a replay at the anchor,
    * and the first diff whose endpoints straddle the boundary routes
    * each side to the generation that answers it
    * ([[graft.index.SnapshotLayout.asOfDiffGen]] — the boundary
    * itself is an empty diff by construction, the
    * `boundary_live_identical` grid pin). Retiring a generation at or
    * below a consumer's anchor refuses loudly at routing (the
    * retired-coverage guard) instead of aliasing an older head.
    * Retirement itself cannot fail an in-flight trigger: the sink
    * retires in two phases ([[graft.index.Generations
    * .retireGeneration]] tombstones — files stay readable, routing
    * refuses at once, this reader skips the tombstoned manifests via
    * its live-ids filter — and the NEXT cutover purges), so a reader
    * would have to hold one listing across two cutovers to observe a
    * vanished file. */
  def changesIvfGen(spark: org.apache.spark.sql.SparkSession, root: String,
      outPath: String): DataStreamWriter[Row] =
    changes(spark, s"$root/generation=*/_snapshots", outPath,
      (from, to) =>
        graft.index.SnapshotLayout.asOfDiffGen(spark, root, from, to),
      () => genManifestIds(spark, root), filterToLive = true)

  /** The NSW twin: generational change feed over a graph root. */
  def changesNswGen(spark: org.apache.spark.sql.SparkSession, root: String,
      outPath: String): DataStreamWriter[Row] =
    changes(spark, s"$root/generation=*/_snapshots", outPath,
      (from, to) =>
        graft.index.NswSnapshotLayout.asOfDiffGen(spark, root, from, to),
      () => genManifestIds(spark, root), filterToLive = true)

  /** All manifest ids visible under a generational root (the
    * head-regression guard's view): per generation bounded by the
    * pointer, deduped at the cutover boundaries. */
  private def genManifestIds(spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[Long] =
    graft.index.Generations.list(spark, root)
      .flatMap(g => graft.index.SnapshotLayout.manifestIds(spark,
        graft.index.Generations.genPath(root, g)))
      .distinct.sorted

  private val ManifestIdPattern = """.*"batch_id":(\d+).*""".r

  private val RollbackMarkerPattern = """.*"rolled_back_to":(\d+).*""".r

  private def changes(spark: org.apache.spark.sql.SparkSession,
      sourceGlob: String, outPath: String, diff: (Long, Long) => DataFrame,
      liveIds: () => Seq[Long],
      filterToLive: Boolean = false): DataStreamWriter[Row] =
    spark.readStream.text(sourceGlob)
      .writeStream
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        // a trigger's worth of manifest FILES — tiny by construction
        // (one small JSON per maintenance batch), processed ascending
        // so multi-manifest batches emit consecutive diffs in order
        val lines = b.collect().iterator.map(_.getString(0).trim).toSeq
        val rawIds = lines
          .collect { case ManifestIdPattern(id) => id.toLong }
          .distinct.sorted
        // generational readers: a TOMBSTONED generation's manifests
        // are still on disk (deferred purge) and still match the
        // glob, but its history is logically retired — delivering
        // them would anchor a fresh reader into history whose diffs
        // refuse at routing. Restrict to ids some LIVE generation
        // still manifests (exactly the post-purge view).
        val ids =
          if (!filterToLive) rawIds
          else { val live = liveIds().toSet; rawIds.filter(live) }
        var anchor = readAnchor(spark, outPath)
        // a rollback below the anchor rewrote history this feed
        // already emitted — the checkpoint will never redeliver the
        // recreated batch paths, so continuing would silently drop
        // every change at reused ids and never retract the undone
        // diffs. Two detectors, both refusing loudly (the compaction-
        // floor guard's twin): the rollback MARKER (a fresh file path
        // every rollback writes, so the source always delivers it —
        // catches the case where re-applies restored the head before
        // this trigger ran) and the head-regression check (catches
        // external manifest deletion that wrote no marker). Recovery:
        // reset the consumer dir (checkpoint + anchor) and re-anchor
        // explicitly.
        anchor.foreach { a =>
          lines.collect { case RollbackMarkerPattern(t) => t.toLong }
            .filter(_ < a).foreach { t =>
              throw new IllegalStateException(
                s"the layout tailed by $outPath was rolled back to batch $t, " +
                  s"below this consumer's anchor $a — history the feed " +
                  "already emitted was rewritten; reset the consumer dir " +
                  "(checkpoint + anchor) and re-anchor explicitly instead " +
                  "of reading a silently-diverged feed")
            }
          val head = liveIds().lastOption.getOrElse(Long.MinValue)
          require(head >= a,
            s"manifest log tailed by $outPath regressed below the consumer " +
              s"anchor $a (head is now $head): history the feed already " +
              "emitted was rewritten — reset the consumer dir (checkpoint + " +
              "anchor) and re-anchor explicitly")
        }
        ids.foreach { id =>
          anchor match {
            case Some(a) if id <= a => // replayed manifest: already emitted
            case Some(a) =>
              val dir = new org.apache.hadoop.fs.Path(s"$outPath/data/to_b=$id")
              diff(a, id).write.mode("overwrite").parquet(dir.toString)
              // a no-change batch writes no part files; its empty
              // directory would break schema inference for a consumer
              // reading data/ before any non-empty batch lands — an
              // absent to_b dir carries the same information
              val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
              if (!fs.listStatus(dir).exists(f =>
                  f.getPath.getName.endsWith(".parquet")))
                fs.delete(dir, true)
              writeAnchor(spark, outPath, id)
              anchor = Some(id)
            case None =>
              // the first manifest a reader ever sees anchors the
              // feed (there is nothing before it to diff against)
              writeAnchor(spark, outPath, id)
              anchor = Some(id)
          }
        }
      }

  private def anchorPath(outPath: String) =
    new org.apache.hadoop.fs.Path(s"$outPath/_graft_changes_anchor.json")

  private val AnchorPattern = """\{"anchor_batch_id":(-?\d+)\}""".r

  private[graft] def readAnchor(spark: org.apache.spark.sql.SparkSession,
      outPath: String): Option[Long] = {
    val p = anchorPath(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      body.trim match {
        case AnchorPattern(n) => Some(n.toLong)
        // a corrupt anchor must NOT read as "never anchored" — that
        // would silently re-anchor at the next manifest and drop every
        // change since the real anchor from a feed whose contract is
        // fail-loud. (The tmp+rename writer below makes this state
        // unreachable by crash; refusing covers external damage too.)
        case other => throw new IllegalStateException(
          s"corrupt change-feed anchor at $p: '$other' — refusing to " +
            "re-anchor over lost history; restore or delete the consumer dir")
      }
    }
  }

  private[graft] def writeAnchor(spark: org.apache.spark.sql.SparkSession,
      outPath: String, batchId: Long): Unit = {
    val p = anchorPath(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$outPath/._graft_changes_anchor.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"anchor_batch_id":$batchId}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p), s"could not commit change-feed anchor $p")
    }
  }

  /** Session memo of the pristine GENERATIONAL CDC scenario: the
    * four-batch history of
    * [[graft.index.SnapshotLayout.pristineScenario]] re-expressed
    * across a cutover — batches 0-2 land in generation 1, an explicit
    * `newGeneration` cuts over at head 2, and the corrupt zero-vector
    * batch 3 lands in generation 2. The changeLOG is identical to the
    * single-generation scenario's by construction (the cutover is a
    * re-addressing, not a data change), so the generational feed leg
    * shares the families' SQL oracle while its 1→2 diff genuinely
    * routes its endpoints to DIFFERENT generations and its boundary
    * manifest (id 2 under a new path) must skip at the anchor. */
  private val genCdcCache = new graft.store.VersionedMemo[String](p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p).getParentFile))

  private[graft] def pristineGenCdcRoot(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    genCdcCache.get(spark, s"gen_cdc_scenario:$dir", dir) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-cdc-gen").toString + "/root"
      val all = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      graft.index.SnapshotLayout.initGen(
        graft.index.IvfIndex.build(spark, all.filter(col("vec_id") >= 50)),
        root)
      graft.index.SnapshotLayout.applyBatchGen(spark, root, 1L,
        upserts = all.filter(col("vec_id") < 25),
        deletes = all.limit(0).select(col("vec_id")))
      graft.index.SnapshotLayout.applyBatchGen(spark, root, 2L,
        upserts = all.filter(col("vec_id") >= 25 && col("vec_id") < 50),
        deletes = all.filter(col("vec_id") < 25 && col("vec_id") % 7 === 0)
          .select(col("vec_id")))
      graft.index.SnapshotLayout.newGeneration(spark, root)
      graft.index.SnapshotLayout.applyBatchGen(spark, root, 3L,
        upserts = all.filter(col("vec_id") < 10)
          .select(col("vec_id"),
            transform(col("embedding"), _ => lit(0.0f)).as("embedding")),
        deletes = all.limit(0).select(col("vec_id")))
      root
    }

  /** The NSW twin of [[pristineGenCdcRoot]]: the same four-batch
    * history over a generational GRAPH root — base graph in
    * generation 1, cutover (a clean LSH rebuild of the head) after
    * batch 2, corrupt batch 3 in generation 2. The changelog is again
    * identical to the single-generation scenario's by construction,
    * so the `gen_nsw` feed leg shares the families' SQL oracle while
    * exercising [[changesNswGen]]'s family-specific differ
    * ([[graft.index.NswSnapshotLayout.asOfDiffGen]]) across a real
    * boundary — a graph-differ regression now flips a CORRECTNESS
    * row, not just NswSnapshotSpec. */
  private val genCdcNswCache = new graft.store.VersionedMemo[String](p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p).getParentFile))

  private[graft] def pristineGenCdcRootNsw(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    genCdcNswCache.get(spark, s"gen_cdc_scenario_nsw:$dir", dir) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-cdc-gen-nsw").toString + "/root"
      val all = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val base = all.filter(col("vec_id") >= 50).localCheckpoint(true)
      graft.index.NswSnapshotLayout.initGen(base,
        graft.index.NswIndex.buildEdgesLsh(base), root)
      graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 1L,
        upserts = all.filter(col("vec_id") < 25),
        deletes = all.limit(0).select(col("vec_id")))
      graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 2L,
        upserts = all.filter(col("vec_id") >= 25 && col("vec_id") < 50),
        deletes = all.filter(col("vec_id") < 25 && col("vec_id") % 7 === 0)
          .select(col("vec_id")))
      graft.index.NswSnapshotLayout.newGeneration(spark, root)
      graft.index.NswSnapshotLayout.applyBatchGen(spark, root, 3L,
        upserts = all.filter(col("vec_id") < 10)
          .select(col("vec_id"),
            transform(col("embedding"), _ => lit(0.0f)).as("embedding")),
        deletes = all.limit(0).select(col("vec_id")))
      graft.core.Checkpoints.free(base)
      root
    }

  /** `index_changes_stream`: the streaming CDC feed certified for
    * both families PLUS both generational readers — each leg drains
    * the deterministic scenario's manifests with an availableNow
    * trigger into a fresh consumer dir, and the collected feed must
    * equal the pure-SQL changelog: batch 0 anchors silently, 0→1
    * emits the batch-1 upserts as `added`, 1→2 and 2→3 match
    * `index_asof_diff`'s legs. The `gen`/`gen_nsw` legs run the same
    * history across a CUTOVER ([[pristineGenCdcRoot]] /
    * [[pristineGenCdcRootNsw]]): their 1→2 diffs straddle the
    * generation boundary and the successor's base manifest must skip
    * at the anchor — the feed a consumer reads across a cutover
    * contains exactly the real changes, nothing else, on BOTH
    * families' differs. Read-only over the memoized pristine
    * scenarios (the consumer state — checkpoint, anchor, data —
    * lives in the per-invocation temp dir, never under the
    * layout). */
  def indexChangesStream(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val ivfPath = graft.index.SnapshotLayout.pristineScenario(spark, dir)
    val nswPath = graft.index.NswSnapshotLayout.pristineScenario(spark, dir)
    val genRoot = pristineGenCdcRoot(spark, dir)
    val genNswRoot = pristineGenCdcRootNsw(spark, dir)
    // deterministic per-app dir, cleared on entry — a fresh temp per
    // invocation would leak one checkpoint+data tree per bench repeat
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
      s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/changes"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    def run(family: String, w: DataStreamWriter[Row], sub: String): DataFrame = {
      val q = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$out/$sub/data")
        .select(lit(family).as("family"), col("to_b").cast("long").as("to_b"),
          col("vec_id"), col("change"))
    }
    run("gen", changesIvfGen(spark, genRoot, s"$out/gen"), "gen")
      .unionByName(
        run("gen_nsw", changesNswGen(spark, genNswRoot, s"$out/gen_nsw"), "gen_nsw"))
      .unionByName(run("ivf", changesIvf(spark, ivfPath, s"$out/ivf"), "ivf"))
      .unionByName(run("nsw", changesNsw(spark, nswPath, s"$out/nsw"), "nsw"))
      .orderBy(col("family"), col("to_b"), col("vec_id"))
  }

  val indexChangesStreamSql: String =
    """SELECT f.family, d.to_b, d.vec_id, d.change
      |FROM (SELECT 'gen' AS family UNION ALL SELECT 'gen_nsw'
      |      UNION ALL SELECT 'ivf' UNION ALL SELECT 'nsw') f
      |CROSS JOIN (
      |  SELECT CAST(1 AS BIGINT) AS to_b, vec_id, 'added' AS change
      |  FROM embeddings WHERE vec_id < 25
      |  UNION ALL
      |  SELECT 2, vec_id, 'added'
      |  FROM embeddings WHERE vec_id >= 25 AND vec_id < 50
      |  UNION ALL
      |  SELECT 2, vec_id, 'deleted'
      |  FROM embeddings WHERE vec_id < 25 AND vec_id % 7 = 0
      |  UNION ALL
      |  SELECT 3, vec_id, 'added'
      |  FROM embeddings WHERE vec_id < 10 AND vec_id % 7 = 0
      |  UNION ALL
      |  SELECT 3, vec_id, 'updated'
      |  FROM embeddings WHERE vec_id < 10 AND vec_id % 7 <> 0
      |) d
      |ORDER BY f.family, d.to_b, d.vec_id""".stripMargin

  /** Split one micro-batch into its delete and upsert sides and apply
    * each through the index's policy entry point — unless the batch
    * id is already recorded as fully applied, in which case the whole
    * batch is a no-op (replay skip; the sidecar write is the LAST
    * step, so a partially-applied crash re-executes). The batch is
    * tiny relative to the index (it's a trigger interval of
    * mutations) but is read twice (split + the maintenance joins), so
    * it rides a localCheckpoint rather than re-running the source. */
  private def applyBatch(batch: DataFrame, batchId: Long, path: String,
      streamId: String,
      applyDeletes: DataFrame => Unit,
      applyUpserts: DataFrame => Unit): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (lastAppliedBatch(spark, path, streamId).exists(_ >= batchId)) return
    val b = batch.localCheckpoint(true)
    try {
      val deletes = b.filter(col("op") === "delete").select(col("vec_id"))
      // the upsert side keeps every mutation column except `op`: a
      // meta-bearing persisted layout's delta path REQUIRES its
      // metadata columns (and both maintain entry points drop extras),
      // so projecting down to (vec_id, embedding) here would fail
      // meta-bearing streams whose mutations carry the labels
      val upserts = b.filter(col("op") === "upsert")
        .select(b.columns.toSeq.filterNot(_ == "op").map(col): _*)
      if (!deletes.isEmpty) applyDeletes(deletes)
      if (!upserts.isEmpty) applyUpserts(upserts)
      writeAppliedBatch(spark, path, streamId, batchId)
    } finally graft.core.Checkpoints.free(b)
  }

  /** The applied-batch sidecar: one tiny JSON object via the Hadoop
    * FS API (the [[graft.index.IndexMeta]] discipline — local disk,
    * HDFS, or object store; reading a long must not cost a job).
    * Batch ids are monotonic PER CHECKPOINT, so the sidecar is keyed
    * by `streamId`: a query restarted from its checkpoint resumes the
    * same id sequence and dedups correctly, while a NEW query over an
    * already-maintained layout (fresh checkpoint → ids restart at 0)
    * must pass a fresh `streamId`, or its first batches would be
    * mistaken for replays. */
  private def batchPath(path: String, streamId: String) =
    new org.apache.hadoop.fs.Path(s"$path/_graft_stream_batch_$streamId.json")

  private val BatchPattern = """\{"last_batch_id":(-?\d+)\}""".r

  private[graft] def lastAppliedBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, streamId: String = "default"): Option[Long] = {
    val p = batchPath(path, streamId)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      body.trim match {
        case BatchPattern(n) => Some(n.toLong)
        case _ => None
      }
    }
  }

  private[graft] def writeAppliedBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, streamId: String, batchId: Long): Unit = {
    val p = batchPath(path, streamId)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"last_batch_id":$batchId}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
