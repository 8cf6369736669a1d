package graft.index

import graft.core.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned NSW graph layout — [[SnapshotLayout]]'s append-only
  * batch discipline applied to the graph family, so BOTH persisted
  * index families carry the as-of/rollback operational story:
  *
  *  - `vectors/batch_id=B/` — (vec_id, embedding) appended per batch
  *    (batch 0 = the base corpus slice under the base graph build);
  *  - `edges/batch_id=B/` — (src, dst): batch 0 is the full kNN
  *    graph; batch B > 0 holds the beam-linked FORWARD edges of that
  *    batch's upserts against the then-current head graph (the
  *    addDelta contract — reverse reachability comes from the
  *    traversal's undirected expansion, so appending forward edges
  *    suffices);
  *  - `tombstones/batch_id=B/` — deleted ids; SHARED manifest /
  *    rollback machinery ([[SnapshotLayout]]'s helpers — the manifest
  *    written last is the applied marker, replays skip whole).
  *
  * AS-OF B: vectors reconstruct by the latest-event-wins window
  * (tombstones hide until a later upsert revives); edges are every
  * row with `batch_id ≤ B` whose BOTH endpoints are live at B (two
  * semi-joins against the live set — a tombstoned node's edges
  * disappear from survivors' adjacency without any file rewrite,
  * the removeDelta semantics expressed as reconstruction instead of
  * mutation). Append-only honesty note: a RE-ADDED id's pre-move
  * edges remain in older batches and reappear at reconstruction —
  * they reference live endpoints at stale positions, a bounded
  * navigability (recall) effect identical in kind to the delta-drift
  * the [[IndexMeta]] envelope already meters, never a correctness
  * one (every visited node exact-rescored). Self-links from re-adds
  * are filtered at link time.
  *
  * ROLLBACK = delete `batch_id > B` directories + restore the
  * sidecar from B's manifest, exactly as the IVF twin — byte-
  * identical serves afterwards (spec-pinned). */
object NswSnapshotLayout {

  /** Initialize: base vectors + the base graph as batch `baseBatch`
    * (0 for a standalone layout; a generation cutover passes the
    * predecessor's head batch id — the IVF twin's contract). Metadata
    * columns of `emb` (anything beyond vec_id/embedding) ride the
    * stored rows — the filtered as-of serving shape; batches must
    * then carry the same columns ([[applyBatch]] fails fast). */
  def init(emb: DataFrame, edges: DataFrame, path: String,
      baseBatch: Long = 0L): Unit = {
    val spark = emb.sparkSession
    val metaCols = emb.columns.toSeq
      .filterNot(Set("vec_id", "embedding", "batch_id"))
    emb.select(col("vec_id") +: col("embedding") +: metaCols.map(col): _*)
      .withColumn("batch_id", lit(baseBatch))
      .write.mode("overwrite").partitionBy("batch_id").parquet(s"$path/vectors")
    edges.select(col("src"), col("dst"))
      .withColumn("batch_id", lit(baseBatch))
      .write.mode("overwrite").partitionBy("batch_id").parquet(s"$path/edges")
    val n = spark.read.parquet(s"$path/vectors").count()
    IndexMeta.write(spark, path, IndexMeta.Meta(n, 0L))
    SnapshotLayout.writeManifest(spark, path, baseBatch, IndexMeta.Meta(n, 0L))
  }

  /** Apply one batch append-only: tombstones, then beam-link the
    * upserts against the current HEAD graph (deletes-before-upserts:
    * the tombstones land first, so links never target just-deleted
    * nodes), then vectors + forward edges under `batch_id`, sidecar
    * bump, manifest LAST. Idempotent per batch id via the manifest
    * marker. */
  def applyBatch(spark: SparkSession, path: String, batchId: Long,
      upserts: DataFrame, deletes: DataFrame): Unit = {
    repairCompaction(spark, path)
    // manifest marker + compaction-floor guard, exactly as the IVF
    // twin: an id at or below the oldest surviving manifest was
    // applied before compaction and must skip, or its re-appended
    // rows would sit below the consolidated base with their
    // tombstones gone (ghost resurrection at head)
    if (SnapshotLayout.readManifest(spark, path, batchId).isDefined ||
        SnapshotLayout.manifestIds(spark, path).headOption.exists(batchId <= _))
      return
    // a meta-bearing layout's batches must carry its metadata — the
    // IVF twin's fail-fast discipline (meta-less rows would be
    // invisible to every filtered as-of serve). Validation runs
    // BEFORE the tombstone write so a rejected batch is
    // side-effect-free (its deletes must not apply at head)
    val storedCols = spark.read.parquet(s"$path/vectors").columns.toSeq
    val keep = storedCols.filterNot(Set("batch_id"))
    // one counting pass per side serves emptiness checks AND the
    // drift gauge below — the IVF twin's round-17 job-count trim
    val nUps = upserts.count()
    val nDels = deletes.count()
    val hasUpserts = nUps > 0
    if (hasUpserts) {
      val missing = keep.filterNot(upserts.columns.contains)
      require(missing.isEmpty,
        s"versioned batch missing layout columns ${missing.mkString(", ")}: " +
          "a meta-bearing layout's batches must carry its metadata")
    }
    if (nDels > 0)
      deletes.select(col("vec_id")).withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("batch_id")
        .parquet(s"$path/tombstones")
    if (hasUpserts) {
      val (headVecs, headEdges) = asOfGraph(spark, path, Long.MaxValue)
      val queries = upserts
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val linked = NswIndex.beamSearch(
          headVecs.select(col("vec_id"), col("embedding")), headEdges, queries,
          k = NswIndex.degreeFor(spark, headVecs.count()))
        .select(col("q_id").as("src"), col("neighbor_id").as("dst"))
        // a re-added id finds its own still-live old row — never
        // self-link
        .filter(col("src") =!= col("dst"))
        .localCheckpoint(true)
      // the walk materialized its own hop checkpoints and `linked` is
      // pinned — the head reconstruction checkpoint is now garbage
      // (the sample_kcenter free discipline)
      graft.core.Checkpoints.free(headVecs)
      linked.withColumn("batch_id", lit(batchId))
        .write.mode("append").partitionBy("batch_id").parquet(s"$path/edges")
      val rows = upserts.select(keep.map(col): _*)
        .withColumn("batch_id", lit(batchId))
      val subs = IvfIndex.pqSubdirs(spark, path)
      if (subs.isEmpty)
        rows.write.mode("append").partitionBy("batch_id")
          .parquet(s"$path/vectors")
      else {
        // a graph layout carrying PQ sidecars ([[initPq]]) encodes
        // every batch with the FROZEN codebooks in the same versioned
        // batch scheme — the IVF twin's discipline: a delta row with
        // no code is invisible to the ADC walk's scoring scan
        val mat = rows.localCheckpoint(true)
        try {
          mat.write.mode("append").partitionBy("batch_id")
            .parquet(s"$path/vectors")
          IvfIndex.encodeDeltaPq(spark, path, mat,
            partitionCols = Seq("batch_id"))
        } finally graft.core.Checkpoints.free(mat)
      }
      graft.core.Checkpoints.free(linked)
    }
    val drift = nUps + nDels
    IndexMeta.bumpDelta(spark, path, drift)
    val meta = IndexMeta.read(spark, path).getOrElse(IndexMeta.Meta(0L, 0L))
    SnapshotLayout.writeManifest(spark, path, batchId, meta)
    // the IVF twin's discipline: an applied batch invalidates every
    // memo keyed under this layout (head-addressed fine alphabets
    // would otherwise survive the append with a constant key)
    graft.store.IndexVersions.bump(path)
  }

  /** Live (vec_id, embedding) as of `batchId` — the latest-event
    * window over upsert rows and tombstones. */
  def asOfVectors(spark: SparkSession, path: String, batchId: Long): DataFrame = {
    // read path self-heals a crashed compaction commit (one FS check)
    repairCompaction(spark, path)
    val stored = spark.read.parquet(s"$path/vectors")
    // a meta-bearing layout's metadata rides the reconstruction — the
    // filtered as-of serve evaluates its predicate on these rows
    val metaFields = stored.schema.fields.toSeq
      .filterNot(f => Set("vec_id", "embedding", "batch_id")(f.name))
    val ups = stored
      .filter(col("batch_id") <= batchId)
      .select(Seq(col("vec_id"), col("embedding")) ++
        metaFields.map(f => col(f.name)) ++
        Seq(col("batch_id"), lit(1).as("is_upsert")): _*)
    val tombRoot = new Path(s"$path/tombstones")
    val fs = tombRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasTombs = fs.exists(tombRoot) &&
      fs.listStatus(tombRoot).exists(d =>
        d.isDirectory && SnapshotLayout.batchDirId(d.getPath.getName).isDefined)
    val tombs =
      if (!hasTombs) ups.limit(0)
      else spark.read.parquet(s"$path/tombstones")
        .filter(col("batch_id") <= batchId)
        .select(Seq(col("vec_id"),
          lit(null).cast("array<float>").as("embedding")) ++
          metaFields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
          Seq(col("batch_id"), lit(0).as("is_upsert")): _*)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("batch_id").desc, col("is_upsert").desc)
    ups.unionByName(tombs)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("is_upsert") === 1)
      .select(Seq(col("vec_id"), col("embedding")) ++
        metaFields.map(f => col(f.name)): _*)
  }

  /** (live vectors, live edges) as of `batchId`: edges of batches
    * ≤ B restricted to live endpoints on both sides. The live set is
    * checkpointed once — three consumers (two semi-joins + the beam's
    * vector side) must not each replay the reconstruction window. */
  def asOfGraph(spark: SparkSession, path: String,
      batchId: Long): (DataFrame, DataFrame) = {
    val live = asOfVectors(spark, path, batchId).localCheckpoint(true)
    val edges = spark.read.parquet(s"$path/edges")
      .filter(col("batch_id") <= batchId)
      .select(col("src"), col("dst"))
      .join(live.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .join(live.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
    (live, edges)
  }

  /** Beam serve from the as-of graph. The walk runs eagerly (its
    * hops checkpoint as they go) and its result reads only those hop
    * checkpoints — the reconstruction checkpoint frees on return. */
  def searchAsOf(spark: SparkSession, path: String, batchId: Long,
      queries: DataFrame, k: Int = 5): DataFrame = {
    val (vecs, edges) = asOfGraph(spark, path, batchId)
    val out = NswIndex.beamSearch(
      vecs.select(col("vec_id"), col("embedding")), edges, queries, k)
    graft.core.Checkpoints.free(vecs)
    out
  }

  // ---- versioned compressed tier (PQ sidecar over the graph log) -------

  /** Add a PQ sidecar to the versioned GRAPH layout: codebooks
    * trained once (frozen — the centroid discipline on the compressed
    * tier) and every stored row encoded under the same `batch_id=`
    * scheme as the raw rows. Batches applied AFTER this call are
    * encoded by [[applyBatch]] automatically; calling at [[init]]
    * time gives full-history coverage, calling later back-fills
    * everything present (the encode pass reads all batches). */
  def initPq(spark: SparkSession, path: String,
      m: Int = PqCodebooks.defaultM, codes: Int = PqCodebooks.defaultCodes,
      seed: Long = 42L, rotate: Boolean = false, sub: String = "pq"): Unit =
    IvfIndex.persistPq(spark, path, m, codes, seed, rotate, sub,
      partitionCols = Seq("batch_id"))

  /** ADC beam walk served AS OF `batchId` from the versioned code
    * sidecar — the graph family's compressed tier composed with time
    * travel. CHEAPER than the raw [[searchAsOf]] in exactly the IVF
    * twin's two ways, plus the walk's own: the merge-on-read argmax
    * runs over KEYS ([[SnapshotLayout.asOfWinners]]), the live-edge
    * restriction semi-joins those keys (no embedding reconstruction
    * at all before the rerank), every superstep scores m-byte codes
    * instead of full-width floats, and the exact rerank
    * direct-addresses the winning raw rows — the surviving code row's
    * (vec_id, batch_id) IS the winning raw row's partition address,
    * so the fetch is a partition-pruned broadcast of
    * `rerank × |queries|` keys. */
  private def searchAsOfPqImpl(spark: SparkSession, path: String,
      batchId: Long, queries: DataFrame,
      pred: Option[org.apache.spark.sql.Column], k: Int, rerank: Int,
      beamW: Int, sub: String): DataFrame = {
    repairCompaction(spark, path)
    val winners = SnapshotLayout.asOfWinners(spark, path, batchId)
      .localCheckpoint(true)
    // live code set, re-read per superstep → checkpointed once; the
    // mirrored metadata rides it so a filtered walk's predicate
    // evaluates on the quantized rows
    val codesRaw = spark.read.parquet(s"$path/$sub/codes")
    val metaCols = codesRaw.columns.toSeq
      .filterNot(Set("vec_id", "code", "batch_id"))
    val codes = codesRaw
      .filter(col("batch_id") <= batchId)
      .join(winners, Seq("vec_id", "batch_id"))
      .select(col("vec_id").as("node") +: col("code") +: col("batch_id") +:
        metaCols.map(col): _*)
      .localCheckpoint(true)
    val edges = spark.read.parquet(s"$path/edges")
      .filter(col("batch_id") <= batchId)
      .select(col("src"), col("dst"))
      .join(winners.select(col("vec_id").as("src")), Seq("src"), "left_semi")
      .join(winners.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
    val edgeSel = edges.select(col("src").as("node"), col("dst"))
      .unionByName(edges.select(col("dst").as("node"), col("src").as("dst")))
      .localCheckpoint(true)
    val (lutBc, qIdx) = NswIndex.pqWalkState(spark, path, queries, sub)
    val qExtra = queries.columns.toSeq.filterNot(Set("q_id", "q_vec"))
    val qFrame =
      if (qExtra.isEmpty) qIdx
      else qIdx.join(broadcast(queries.drop("q_vec")), Seq("q_id"))
    // the walk runs eagerly (its hops checkpoint as they go); the
    // returned shortlist reads only those hop checkpoints, so the
    // reconstruction checkpoints free on return — carrying `batch_id`
    // through so the rerank can direct-address the winning raw rows
    val cand = NswIndex.adcWalk(codes, edgeSel, lutBc, qFrame, rerank, beamW,
      NswIndex.hops, NswIndex.entrySeedMod,
      carryCols = "batch_id" +: metaCols, qExtraCols = qExtra,
      acceptPred = pred)
      .select(col("q_id"), col("node"), col("batch_id"))
    graft.core.Checkpoints.free(winners)
    graft.core.Checkpoints.free(codes)
    graft.core.Checkpoints.free(edgeSel)
    val raw = spark.read.parquet(s"$path/vectors")
    val scored = raw
      .join(broadcast(cand.withColumnRenamed("node", "vec_id")),
        Seq("vec_id", "batch_id"))
      .join(broadcast(queries.select(col("q_id"), col("q_vec"))), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        graft.core.Stab.e6(graft.functions.vectors.cosineSim(
          col("embedding"), col("q_vec"))).as("score_e6"))
    graft.operators.KnnSearch.topK(scored, k, asc = false)
  }

  /** PRE-filter ADC beam walk at an as-of point — the graph twin of
    * [[SnapshotLayout.searchAsOfPqFiltered]], closing the versioned ×
    * filtered × ADC cell: the metadata [[applyBatch]]'s delta encode
    * mirrors into every code row rides the LIVE code reconstruction,
    * so the predicate evaluates on quantized rows at any as-of point
    * with [[NswIndex.searchFiltered]]'s semantics — navigation
    * unfiltered, accepted-set shortlist before the rerank quota, all
    * k served rows legal. */
  def searchAsOfPqFiltered(spark: SparkSession, path: String, batchId: Long,
      queries: DataFrame, pred: org.apache.spark.sql.Column, k: Int = 10,
      rerank: Int = NswIndex.pqRerank, beamW: Int = NswIndex.pqBeamWidth,
      sub: String = "pq"): DataFrame =
    searchAsOfPqImpl(spark, path, batchId, queries, Some(pred), k, rerank,
      beamW, sub)

  def searchAsOfPq(spark: SparkSession, path: String, batchId: Long,
      queries: DataFrame, k: Int = 5, rerank: Int = NswIndex.pqRerank,
      beamW: Int = NswIndex.pqBeamWidth, sub: String = "pq"): DataFrame =
    searchAsOfPqImpl(spark, path, batchId, queries, None, k, rerank, beamW,
      sub)

  /** ADC beam walk routed across generations — the graph twin of
    * [[SnapshotLayout.searchAsOfPqGen]]: the compressed tier survives
    * a cutover ([[newGeneration]] re-inits each sidecar at its
    * configured geometry on the successor). */
  def searchAsOfPqGen(spark: SparkSession, root: String, batchId: Long,
      queries: DataFrame, k: Int = 5, rerank: Int = NswIndex.pqRerank,
      beamW: Int = NswIndex.pqBeamWidth, sub: String = "pq"): DataFrame =
    searchAsOfPq(spark, Generations.route(spark, root, batchId), batchId,
      queries, k, rerank, beamW, sub)

  /** The filtered ADC walk routed across generations — metadata rides
    * the cutover re-fit and the carried sidecar's fresh encode, so
    * the filtered-quantized mode survives a cutover too. */
  def searchAsOfPqFilteredGen(spark: SparkSession, root: String,
      batchId: Long, queries: DataFrame, pred: org.apache.spark.sql.Column,
      k: Int = 10, rerank: Int = NswIndex.pqRerank,
      beamW: Int = NswIndex.pqBeamWidth, sub: String = "pq"): DataFrame =
    searchAsOfPqFiltered(spark, Generations.route(spark, root, batchId),
      batchId, queries, pred, k, rerank, beamW, sub)

  /** Public CDC read over a versioned GRAPH layout — the NSW twin of
    * [[SnapshotLayout.asOfDiff]]: the change feed is a function of
    * the event log, so the shared differ runs over this family's
    * vector reconstructions (edges are derived state and never part
    * of the payload a consumer diffs). Endpoints below the compaction
    * floor are refused — the truncated log cannot reconstruct them. */
  def asOfDiff(spark: SparkSession, path: String, fromBatch: Long,
      toBatch: Long): DataFrame = {
    repairCompaction(spark, path)
    SnapshotLayout.requireAnswerable(spark, path, fromBatch)
    SnapshotLayout.requireAnswerable(spark, path, toBatch)
    SnapshotLayout.diffFingerprints(
      SnapshotLayout.asOfFingerprints(spark, path, fromBatch, nswNonPayload, "b_fp"),
      SnapshotLayout.asOfFingerprints(spark, path, toBatch, nswNonPayload, "a_fp"))
  }

  /** This family has no physical cluster_id, so only vec_id is
    * structural — a user metadata column named cluster_id is payload
    * here and its changes must ride the feed. */
  private[index] val nswNonPayload = Set("vec_id")

  /** Merge-on-read debt of a versioned GRAPH layout — the NSW twin of
    * [[SnapshotLayout.layoutDebt]]: this family's crash repair first
    * (the two compaction plan formats differ), then the shared
    * family-neutral key-only scan. */
  def layoutDebt(spark: SparkSession, path: String): DataFrame = {
    repairCompaction(spark, path)
    SnapshotLayout.debtScan(spark, path)
  }

  /** Filtered beam serve from the as-of graph — the graph twin of
    * [[SnapshotLayout.searchAsOfFiltered]]: the metadata a
    * meta-bearing layout's batches carry rides the reconstruction
    * ([[asOfVectors]]), so [[NswIndex.searchFiltered]]'s pre-filter
    * walk semantics (navigation unfiltered, accepted-set top-k, the
    * compensated beam) apply at any as-of point. The as-of edge set
    * is label-independent, exactly like the persisted graph. */
  def searchAsOfFiltered(spark: SparkSession, path: String, batchId: Long,
      queries: DataFrame, pred: org.apache.spark.sql.Column,
      k: Int = 10): DataFrame = {
    val (vecs, edges) = asOfGraph(spark, path, batchId)
    val metaCols = vecs.columns.toSeq.filterNot(Set("vec_id", "embedding"))
    val out = NswIndex.searchFiltered(vecs, edges, queries, pred, metaCols, k)
    graft.core.Checkpoints.free(vecs)
    out
  }

  /** Compact history ≤ `upTo` into one consolidated base — the IVF
    * twin's contract on the graph: the as-of live VECTORS and live
    * EDGES (both endpoints alive) are materialized once and rewritten
    * under `batch_id = upTo`; older vector/edge/tombstone directories
    * and manifests below the point are removed. Serves and rollbacks
    * at ≥ upTo are identical before/after (the edge restriction is
    * idempotent: re-restricting the already-live edge set changes
    * nothing) — EXCEPT for an id dead at `upTo` that a LATER batch
    * re-adds: pre-compaction its pre-delete edges reappear at
    * reconstruction once the re-add revives the id (the documented
    * append-only wart), post-compaction they are physically gone, so
    * an as-of serve past the re-add batch can navigate differently.
    * That divergence is the HEALED direction — stale-position edges
    * removed, every visited node still exact-rescored, a bounded
    * recall effect and never a score error — but it does mean the
    * identical-serve claim holds unconditionally only for histories
    * with no post-upTo re-add of an id tombstoned at ≤ upTo
    * (SnapshotSpec pins both the identity and the healed re-add
    * case). */
  /** Crash-safe via [[SnapshotLayout]]'s stage-then-commit protocol
    * applied to this layout's two roots: the consolidated live
    * vectors AND live edges stage under `_compact_tmp` while the
    * layout is untouched, the plan marker is the commit point, and
    * the commit swaps each root's `batch_id ≤ upTo` dirs for its
    * staged consolidated dir with an atomic rename gated on the
    * stage dir's existence — so a crash anywhere is finished
    * idempotently by [[repairCompaction]], which every mutation and
    * reconstruction entry point runs first. */
  def compact(spark: SparkSession, path: String, upTo: Long): Unit = {
    repairCompaction(spark, path)
    // the IVF twin's guard: an unmanifested compaction point would
    // truncate every manifest below it and strand rollback, crash
    // repair, and the replay floor
    require(SnapshotLayout.readManifest(spark, path, upTo).isDefined,
      s"compaction point batch $upTo has no manifest under $path/_snapshots " +
        "(never applied, or crashed mid-apply) — refusing to truncate " +
        "history below an unrestorable batch")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (live, liveEdges) = asOfGraph(spark, path, upTo)
    val liveV = live.withColumn("batch_id", lit(upTo)).localCheckpoint(true)
    val liveE = liveEdges.withColumn("batch_id", lit(upTo)).localCheckpoint(true)
    graft.core.Checkpoints.free(live)
    fs.delete(new Path(s"$path/_compact_tmp"), true)
    liveV.write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$path/_compact_tmp/vectors")
    liveE.write.mode("overwrite").partitionBy("batch_id")
      .parquet(s"$path/_compact_tmp/edges")
    graft.core.Checkpoints.free(liveV)
    graft.core.Checkpoints.free(liveE)
    // code sidecars fold with the raw rows (the IVF twin's rule: a
    // compacted layout whose ADC tier still pays — or mis-resolves —
    // the folded history would be wrong); live code rows stage under
    // the same uniform path scheme as the two base roots
    IvfIndex.pqSubdirs(spark, path).foreach { sub =>
      SnapshotLayout.asOfCodes(spark, path, upTo, sub)
        .withColumn("batch_id", lit(upTo))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$path/_compact_tmp/$sub/codes")
    }
    // the plan's slot records WHICH roots actually staged a
    // consolidated dir (0=vectors, 1=edges, 2+=code sidecars in
    // pqSubdirs' sorted order — stable across crashes because
    // compaction never touches codebooks): a root whose live set at
    // upTo is EMPTY writes no batch_id dir, and the commit must still
    // drop its old dirs — without the record, "stage dir absent"
    // would be ambiguous between already-swapped and staged-empty
    val staged = allRoots(spark, path).zipWithIndex.collect {
      case (sub, i) if fs.exists(
        new Path(s"$path/_compact_tmp/$sub/batch_id=$upTo")) => i
    }
    SnapshotLayout.writeCompactPlan(fs, path, upTo, staged)
    commitCompaction(spark, path, upTo, staged)
  }

  /** This layout's batch-partitioned roots: the two base tables plus
    * every code sidecar, in a deterministic order the compaction
    * plan's slots index into. */
  private def allRoots(spark: SparkSession, path: String): Seq[String] =
    Seq("vectors", "edges") ++
      IvfIndex.pqSubdirs(spark, path).map(sub => s"$sub/codes")

  /** Finish (or abandon) an in-flight compaction commit — the IVF
    * twin's repair contract on this layout's roots. */
  private[graft] def repairCompaction(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$path/_compact_tmp"))) return
    SnapshotLayout.readCompactPlan(fs, path) match {
      case None => fs.delete(new Path(s"$path/_compact_tmp"), true)
      case Some((upTo, staged)) => commitCompaction(spark, path, upTo, staged)
    }
  }

  private def commitCompaction(spark: SparkSession, path: String,
      upTo: Long, staged: Seq[Int]): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    allRoots(spark, path).zipWithIndex.foreach { case (sub, i) =>
      val root = new Path(s"$path/$sub")
      def dropLe(): Unit =
        if (fs.exists(root))
          fs.listStatus(root).filter(_.isDirectory)
            .filter(d => SnapshotLayout.batchDirId(d.getPath.getName).exists(_ <= upTo))
            .foreach(d => fs.delete(d.getPath, true))
      val stage = new Path(s"$path/_compact_tmp/$sub/batch_id=$upTo")
      if (!staged.contains(i)) dropLe() // staged-empty root: old rows all dead
      else if (fs.exists(stage)) {      // not yet swapped (re-runs skip)
        dropLe()
        if (!fs.exists(root)) fs.mkdirs(root)
        fs.rename(stage, new Path(s"$path/$sub/batch_id=$upTo"))
      }
    }
    val tombRoot = new Path(s"$path/tombstones")
    if (fs.exists(tombRoot)) {
      fs.listStatus(tombRoot).filter(_.isDirectory)
        .filter(d => SnapshotLayout.batchDirId(d.getPath.getName).exists(_ <= upTo))
        .foreach(d => fs.delete(d.getPath, true))
      if (!fs.listStatus(tombRoot).exists(_.isDirectory))
        fs.delete(tombRoot, true)
    }
    SnapshotLayout.manifestIds(spark, path).filter(_ < upTo).foreach { id =>
      fs.delete(new Path(s"$path/_snapshots/batch-$id.json"), false)
    }
    fs.delete(new Path(s"$path/_compact_tmp"), true)
    graft.store.IndexVersions.bump(path)
  }

  /** Roll back to `batchId` — the IVF twin's contract: later batch
    * directories deleted (vectors, edges, tombstones), sidecar
    * restored from the target's manifest. */
  def rollback(spark: SparkSession, path: String, batchId: Long): Unit = {
    repairCompaction(spark, path)
    // same guard as the IVF twin: no manifest → nothing restorable →
    // deleting later batches would destroy the index, not roll it back
    require(SnapshotLayout.readManifest(spark, path, batchId).isDefined,
      s"rollback target batch $batchId has no manifest under $path/_snapshots " +
        "(compacted away, never applied, or crashed mid-apply) — refusing to " +
        "delete newer batches with no restorable target")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a rolled-back batch's CODES die with its raw rows — the IVF
    // twin's rule (a surviving stale code row would keep feeding the
    // ADC walk candidates whose raw rows are gone)
    (Seq("vectors", "edges", "tombstones") ++
        IvfIndex.pqSubdirs(spark, path).map(sub => s"$sub/codes"))
      .foreach { sub =>
      val root = new Path(s"$path/$sub")
      if (fs.exists(root))
        fs.listStatus(root).filter(_.isDirectory)
          .filter(d => SnapshotLayout.batchDirId(d.getPath.getName).exists(_ > batchId))
          .foreach(d => fs.delete(d.getPath, true))
    }
    SnapshotLayout.manifestIds(spark, path).filter(_ > batchId).foreach { id =>
      fs.delete(new Path(s"$path/_snapshots/batch-$id.json"), false)
    }
    SnapshotLayout.readManifest(spark, path, batchId).foreach(m =>
      IndexMeta.write(spark, path, m))
    SnapshotLayout.writeRollbackMarker(spark, path, batchId)
    graft.store.IndexVersions.bump(path)
  }

  /** `nsw_search_asof`: the graph layout's as-of/rollback contract as
    * the same deterministic four-batch grid as `ivf_search_asof` —
    * base graph over `vec_id >= 50` (batch 0), upsert `< 25` (batch
    * 1), delete its `% 7 = 0` ids + upsert `25..49` (batch 2), a
    * corrupt zero-vector batch 3; serve AS OF batch 2, then roll back
    * and re-serve head. Columns: `self_found`/`top1_exact` per probe
    * (the beam-linked delta genuinely serves at the good snapshot),
    * `tombstone_hides` (deleted ids and their edges are gone at 2 —
    * including from SURVIVORS' adjacency), `asof1_predates`,
    * `rollback_identical`, `sidecar_restored`. */
  /** Session memo of the pristine four-batch graph scenario — the
    * [[SnapshotLayout.pristineScenario]] twin: built once per
    * (session, dir), served from per-invocation filesystem copies so
    * the destructive steps (rollback, compaction) never touch the
    * original, invalidated by store writes under `dir`. The three
    * beam-linking applyBatch calls — a 10-hop BSP loop each, the
    * dominant cost of the old rebuild-per-invocation shape — now run
    * once per session. */
  private val scenarioCache = new graft.store.VersionedMemo[String](p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p).getParentFile))

  private[graft] def pristineScenario(spark: SparkSession, dir: String): String =
    scenarioCache.get(spark, s"nsw_asof_scenario:$dir", dir) {
      import spark.implicits._
      // meta-bearing since round 10 (`label` rides the stored rows and
      // every reconstruction), so the scenario serves the filtered
      // as-of entry too
      val all = Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding", $"label")
      val path = java.nio.file.Files
        .createTempDirectory("graft-asof-nsw").toString + "/pristine"
      val base = all.filter($"vec_id" >= 50).localCheckpoint(true)
      // the base graph builds directly from the pinned slice; init
      // persists both, so the checkpoint is garbage once the batches
      // are applied (everything after reconstructs from the layout) —
      // free it instead of pinning one copy per scenario build
      init(base, NswIndex.buildEdgesLsh(base.select($"vec_id", $"embedding")), path)
      applyBatch(spark, path, 1L,
        upserts = all.filter($"vec_id" < 25),
        deletes = all.limit(0).select($"vec_id"))
      applyBatch(spark, path, 2L,
        upserts = all.filter($"vec_id" >= 25 && $"vec_id" < 50),
        deletes = all.filter($"vec_id" < 25 && $"vec_id" % 7 === 0).select($"vec_id"))
      applyBatch(spark, path, 3L,
        upserts = all.filter($"vec_id" < 10)
          .select($"vec_id", transform($"embedding", _ => lit(0.0f)).as("embedding"),
            $"label"),
        deletes = all.limit(0).select($"vec_id"))
      graft.core.Checkpoints.free(base)
      path
    }

  def nswSearchAsof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
      s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/nsw"
    SnapshotLayout.copyLayout(spark, pristineScenario(spark, dir), path)
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val asof2 = searchAsOf(spark, path, 2L, queries).localCheckpoint(true)
    val perProbe = asof2.groupBy($"q_id").agg(
      (max(when($"neighbor_id" === $"q_id", 1)).isNotNull).as("self_found"),
      (max($"score_e6") === 1000000L).as("top1_exact"))
    val (live2, edges2) = asOfGraph(spark, path, 2L)
    val deadAt2 = ($"vec_id" < 25 && $"vec_id" % 7 === 0)
    val tombOk = live2.filter(deadAt2).agg(count(lit(1)).as("n_dead_live"))
      .crossJoin(edges2
        .filter(($"src" < 25 && $"src" % 7 === 0) ||
          ($"dst" < 25 && $"dst" % 7 === 0))
        .agg(count(lit(1)).as("n_dead_edges")))
    val live1 = asOfVectors(spark, path, 1L)
    val asof1Ok = live1.agg(
      count(when($"vec_id" >= 25 && $"vec_id" < 50, 1)).as("n_future_live"))
    rollback(spark, path, 2L)
    val headAfter = searchAsOf(spark, path, Long.MaxValue, queries)
    val identical = SnapshotLayout.serveDiffCount(asof2, headAfter, "n_diff")
    val meta = IndexMeta.read(spark, path).getOrElse(IndexMeta.Meta(-1L, -1L))
    val manifest = SnapshotLayout.readManifest(spark, path, 2L)
      .getOrElse(IndexMeta.Meta(-2L, -2L))
    val globals = tombOk.crossJoin(asof1Ok).crossJoin(identical)
      .select(
        ($"n_dead_live" === 0L && $"n_dead_edges" === 0L).as("tombstone_hides"),
        ($"n_future_live" === 0L).as("asof1_predates"),
        ($"n_diff" === 0L).as("rollback_identical"),
        lit(meta == manifest).as("sidecar_restored"))
    perProbe.crossJoin(broadcast(globals))
      .select($"q_id", $"self_found", $"top1_exact", $"tombstone_hides",
        $"asof1_predates", $"rollback_identical", $"sidecar_restored")
      .orderBy($"q_id")
  }

  val nswSearchAsofSql: String =
    """SELECT vec_id AS q_id, true AS self_found, true AS top1_exact,
      |  true AS tombstone_hides, true AS asof1_predates,
      |  true AS rollback_identical, true AS sidecar_restored
      |FROM embeddings WHERE vec_id < 5 AND vec_id % 7 <> 0
      |ORDER BY q_id""".stripMargin

  /** `nsw_compact`: the graph family's compaction contract as a
    * driver-checked grid over a copy of [[pristineScenario]],
    * `compact(upTo = 2)`. The scenario deliberately CONTAINS the
    * append-only re-add wart (ids 0 and 7 are tombstoned at batch 2
    * and re-added by the corrupt batch 3), so the grid pins BOTH
    * sides of the narrowed contract (see [[compact]]):
    *  - `serve2_identical`: the as-of-2 SERVE INPUT — live
    *    fingerprint set + live edge set, which the deterministic beam
    *    walk is a pure function of — is set-identical before/after
    *    (round 11: implies the old walk-level identity and pays no
    *    walks; [[graphStateAt]]);
    *  - `stale_healed`: post-compaction, every surviving edge touching
    *    a dead-at-2-then-re-added id comes from batch 3 (its re-add
    *    links) — the batch-1 stale-position edges that pre-compaction
    *    head reconstruction would have revived are PHYSICALLY gone;
    *  - `heal_nonvacuous`: those stale edges existed pre-compaction
    *    (otherwise `stale_healed` would pass on an empty check);
    *  - `history_truncated` / `tombstones_gone` / `dirs_bounded`:
    *    manifests == {2, 3}, no tombstone list ≤ 2, no vector/edge
    *    directory below 2;
    *  - `guard_refuses`: rollback to the compacted-away batch 1
    *    throws instead of deleting the consolidated base;
    *  - `rollback_works`: rollback to 2 serves the as-of-2 rows. */
  /** The full SERVE INPUT at an as-of point, keys + hashes only: the
    * (vec_id, payload-fingerprint) live set and the materialized live
    * edge set. The beam serve is a deterministic function of exactly
    * these two sets (+ the query frame), so set identity here IMPLIES
    * serve identity — the round-11 floor trim: the compact grid used
    * to prove identity by running three full beam walks; comparing
    * the walks' inputs is strictly stronger and pays no walk. */
  private def graphStateAt(spark: SparkSession, path: String,
      batchId: Long): (DataFrame, DataFrame) = {
    val fps = SnapshotLayout.asOfFingerprints(spark, path, batchId,
      nswNonPayload, "fp").localCheckpoint(true)
    val (live, edges) = asOfGraph(spark, path, batchId)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    graft.core.Checkpoints.free(live)
    (fps, e)
  }

  private def stateDiff(spark: SparkSession,
      a: (DataFrame, DataFrame), b: (DataFrame, DataFrame)): Long = {
    def d(x: DataFrame, y: DataFrame) = SnapshotLayout
      .rowSetDiffCount(x, y, "n").collect().head.getLong(0)
    d(a._1, b._1) + d(a._2, b._2)
  }

  def nswCompactChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
      s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/nsw_compact"
    SnapshotLayout.copyLayout(spark, pristineScenario(spark, dir), path)
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // dead at upTo=2, re-added by batch 3: `< 10 && % 7 == 0`
    val deadReAdded = (c: org.apache.spark.sql.Column) =>
      c < 10 && c % 7 === 0
    val staleBefore = spark.read.parquet(s"$path/edges")
      .filter($"batch_id" <= 2 && (deadReAdded($"src") || deadReAdded($"dst")))
      .count()
    val state2Before = graphStateAt(spark, path, 2L)
    compact(spark, path, 2L)
    val state2After = graphStateAt(spark, path, 2L)
    // ONE end-to-end beam serve of the COMPACTED layout (the IVF
    // twin's discipline): input identity implies serve identity only
    // if the walk still runs on the compacted tree
    val served = searchAsOf(spark, path, 2L, queries).localCheckpoint(true)
    val perProbe = served.groupBy($"q_id").agg(
      (max(when($"neighbor_id" === $"q_id", 1)).isNotNull).as("self_found"),
      (max($"score_e6") === 1000000L).as("top1_exact"))
    val staleAfter = spark.read.parquet(s"$path/edges")
      .filter($"batch_id" =!= 3 && (deadReAdded($"src") || deadReAdded($"dst")))
      .count()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batchIdsOf(sub: String): Set[Long] = {
      val root = new Path(s"$path/$sub")
      if (!fs.exists(root)) Set.empty
      else fs.listStatus(root).filter(_.isDirectory)
        .flatMap(d => SnapshotLayout.batchDirId(d.getPath.getName)).toSet
    }
    val manifests = SnapshotLayout.manifestIds(spark, path)
    val guardOk =
      try { rollback(spark, path, 1L); false }
      catch { case _: IllegalArgumentException => true }
    rollback(spark, path, 2L)
    val headRolled = graphStateAt(spark, path, Long.MaxValue)
    val serve2Id = stateDiff(spark, state2Before, state2After) == 0L
    val rolledId = stateDiff(spark, state2Before, headRolled) == 0L
    Seq(state2Before, state2After, headRolled).foreach { case (v, e) =>
      graft.core.Checkpoints.free(v); graft.core.Checkpoints.free(e)
    }
    val globals = broadcast(spark.range(1).select(
      lit(serve2Id).as("serve2_identical"),
      lit(staleAfter == 0L).as("stale_healed"),
      lit(staleBefore > 0L).as("heal_nonvacuous"),
      lit(manifests == Seq(2L, 3L)).as("history_truncated"),
      lit(batchIdsOf("tombstones").forall(_ > 2L)).as("tombstones_gone"),
      lit(batchIdsOf("vectors").forall(_ >= 2L) &&
        batchIdsOf("edges").forall(_ >= 2L)).as("dirs_bounded"),
      lit(guardOk).as("guard_refuses"),
      lit(rolledId).as("rollback_works")))
    perProbe.crossJoin(globals)
      .select($"q_id", $"self_found", $"top1_exact", $"serve2_identical",
        $"stale_healed", $"heal_nonvacuous", $"history_truncated",
        $"tombstones_gone", $"dirs_bounded", $"guard_refuses",
        $"rollback_works")
      .orderBy($"q_id")
  }

  val nswCompactCheckedSql: String =
    """SELECT vec_id AS q_id, true AS self_found, true AS top1_exact,
      |  true AS serve2_identical, true AS stale_healed,
      |  true AS heal_nonvacuous, true AS history_truncated,
      |  true AS tombstones_gone, true AS dirs_bounded,
      |  true AS guard_refuses, true AS rollback_works
      |FROM embeddings WHERE vec_id < 5 AND vec_id % 7 <> 0
      |ORDER BY q_id""".stripMargin

  /** `nsw_search_asof_filtered`: the graph family's filtered × time
    * travel cell — [[searchAsOfFiltered]] over the meta-bearing
    * scenario as of the good batch, pushed through the standard
    * filtered invariant grid (`nsw_search_filtered`'s shape):
    * `k_results` (pre-filter walk semantics at the compensated beam),
    * `all_match_label` (labels re-derived from the TABLE so stale
    * reconstruction metadata flips the hash), `self_found` /
    * `top1_exact` (the good batch-1/2 embeddings serve even though
    * corrupt batch 3 exists at head), `monotone`. */
  def nswSearchAsofFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    // read-only over the scenario — serves straight from the
    // pristine memo (the copy discipline is for destructive entries)
    val path = pristineScenario(spark, dir)
    val queries = emb.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val hits = searchAsOfFiltered(spark, path, 2L, queries,
      col("label") === col("q_label")).localCheckpoint(true)
    ContractGrids.filteredServeGrid(spark, dir, hits)
  }

  val nswSearchAsofFilteredSql: String =
    """SELECT vec_id AS q_id, true AS k_results, true AS all_match_label,
      |  true AS self_found, true AS top1_exact, true AS monotone
      |FROM embeddings WHERE vec_id < 5 AND vec_id % 7 <> 0
      |ORDER BY q_id""".stripMargin

  /** Session memo of the PQ-AUGMENTED graph scenario:
    * [[pristineScenario]] copied once per session with a
    * full-coverage sidecar ([[initPq]] back-fills every batch's rows
    * at their own batch_id), so the versioned compressed entry pays
    * codebook training once and each invocation copies file bytes
    * only. */
  private val pqScenarioCache = new graft.store.VersionedMemo[String](p =>
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p).getParentFile))

  private[graft] def pristineScenarioPq(spark: SparkSession,
      dir: String): String =
    pqScenarioCache.get(spark, s"nsw_asof_pq_scenario:$dir", dir) {
      val path = java.nio.file.Files
        .createTempDirectory("graft-asof-nsw-pq").toString + "/pristine"
      SnapshotLayout.copyLayout(spark, pristineScenario(spark, dir), path)
      initPq(spark, path)
      path
    }

  /** `nsw_search_asof_pq`: the versioned GRAPH compressed tier —
    * [[searchAsOfPq]] over the sidecar-bearing scenario, pushed
    * through an invariant grid (per-invocation copy; compaction and
    * rollback are destructive). The IVF twin's `matches_raw` identity
    * does NOT transfer — the quantized walk legitimately visits a
    * different node set than the raw walk — so the grid pins the
    * identities that DO hold:
    *  - `self_found` / `top1_exact`: the production ADC serve as of
    *    batch 2 finds each probe's own GOOD embedding at 1.0 (batch
    *    3's corrupt codes exist at head but must not serve — the code
    *    rows version correctly);
    *  - `codes_cover_live`: every live row as of 2 owns exactly one
    *    live code row (delta coverage is complete — a row without a
    *    code is invisible to the walk);
    *  - `tombstone_hides`: no deleted id owns a live code row as of 2;
    *  - `compact_identical`: the as-of-2 ADC serve is row-identical
    *    across `compact(2)` — the walk is a deterministic function of
    *    (live codes, live edges, LUTs), all three reconstruction-
    *    idempotent under the fold;
    *  - `dirs_bounded` / `rollback_prunes`: the code sidecar's batch
    *    directories fold with compaction and die with rollback;
    *  - `filtered_k_legal`: the FILTERED as-of ADC serve
    *    ([[searchAsOfPqFiltered]] on the sidecar's mirrored labels,
    *    as of 2) returns a full k rows per probe, every one
    *    satisfying the predicate RE-DERIVED from the embeddings
    *    table — the versioned × filtered × ADC cell, driver-checked
    *    (a stale sidecar label or a post-filter shortfall flips it). */
  def nswSearchAsofPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", $"label")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
      s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/nsw_asof_pq"
    SnapshotLayout.copyLayout(spark, pristineScenarioPq(spark, dir), path)
    val queries = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // every serve/stat materializes EAGERLY before the destructive
    // steps delete or rewrite files its lazy plan would still list
    val prod2 = searchAsOfPq(spark, path, 2L, queries).localCheckpoint(true)
    // the filtered composition, same as-of point: label-constrained
    // quantized serve with the labels judged from the TABLE
    val qf = all.filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val filteredHits = searchAsOfPqFiltered(spark, path, 2L, qf,
      col("label") === col("q_label")).localCheckpoint(true)
    val trueLabels = all.select($"vec_id".as("neighbor_id"),
      $"label".as("true_label"))
    val filteredOk = filteredHits
      .join(broadcast(qf.select($"q_id", $"q_label")), Seq("q_id"))
      .join(trueLabels, Seq("neighbor_id"))
      .groupBy($"q_id").agg(
        (count(lit(1)) === 10L &&
          count(when($"true_label" =!= $"q_label", 1)) === 0L).as("ok"))
      .agg((count(when(!$"ok", 1)) === 0L &&
        count(lit(1)) === queries.count()).as("filtered_k_legal"))
      .localCheckpoint(true)
    val liveCodes2 = SnapshotLayout.asOfCodes(spark, path, 2L)
      .localCheckpoint(true)
    val nLive2 = asOfVectors(spark, path, 2L).count()
    val coverOk = liveCodes2.count() == nLive2 &&
      liveCodes2.select($"vec_id").distinct().count() == nLive2
    val tombOk = liveCodes2.filter($"vec_id" < 25 && $"vec_id" % 7 === 0)
      .isEmpty
    val perProbe = prod2.groupBy($"q_id").agg(
      (max(when($"neighbor_id" === $"q_id", 1)).isNotNull).as("self_found"),
      (max($"score_e6") === 1000000L).as("top1_exact"))
    compact(spark, path, 2L)
    val prod2After = searchAsOfPq(spark, path, 2L, queries)
      .localCheckpoint(true)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def codeBatchDirs(): Set[Long] =
      fs.listStatus(new Path(s"$path/pq/codes")).filter(_.isDirectory)
        .flatMap(d => SnapshotLayout.batchDirId(d.getPath.getName)).toSet
    val boundedOk = codeBatchDirs().forall(_ >= 2L)
    rollback(spark, path, 2L)
    val prunedOk = codeBatchDirs().forall(_ <= 2L)
    val globals = SnapshotLayout.serveDiffCount(prod2, prod2After, "n_diff_c")
      .crossJoin(filteredOk)
      .select(
        lit(coverOk).as("codes_cover_live"),
        lit(tombOk).as("tombstone_hides"),
        ($"n_diff_c" === 0L).as("compact_identical"),
        lit(boundedOk).as("dirs_bounded"),
        lit(prunedOk).as("rollback_prunes"),
        $"filtered_k_legal")
    perProbe.crossJoin(broadcast(globals))
      .select($"q_id", $"self_found", $"top1_exact", $"codes_cover_live",
        $"tombstone_hides", $"compact_identical", $"dirs_bounded",
        $"rollback_prunes", $"filtered_k_legal")
      .orderBy($"q_id")
  }

  val nswSearchAsofPqSql: String =
    """SELECT vec_id AS q_id, true AS self_found, true AS top1_exact,
      |  true AS codes_cover_live, true AS tombstone_hides,
      |  true AS compact_identical, true AS dirs_bounded,
      |  true AS rollback_prunes, true AS filtered_k_legal
      |FROM embeddings WHERE vec_id < 5 AND vec_id % 7 <> 0
      |ORDER BY q_id""".stripMargin

  // ---- generation lifecycle (the IVF twin's contract on the graph) ----

  /** Initialize a GENERATIONAL graph root: base graph as generation 1. */
  def initGen(emb: DataFrame, edges: DataFrame, root: String): Unit = {
    init(emb, edges, Generations.genPath(root, 1))
    Generations.writePointer(emb.sparkSession, root, 1)
  }

  /** Cut over to a fresh generation: rebuild the GRAPH from the
    * current generation's head reconstruction into `generation=N+1`
    * (base batch = the predecessor's head batch id), atomic pointer
    * swap, old generation readable for as-of — the drift-envelope
    * action on the graph family. The rebuild also heals every
    * append-only wart at once: stale-position edges of re-added ids
    * and beam-link drift both vanish, because the successor's edges
    * come from a clean [[NswIndex.buildEdgesLsh]] over the live set. */
  def newGeneration(spark: SparkSession, root: String): Int = {
    val g = Generations.current(spark, root)
    val cur = Generations.genPath(root, g)
    repairCompaction(spark, cur)
    val headId = SnapshotLayout.manifestIds(spark, cur).last
    val live = asOfVectors(spark, cur, Long.MaxValue).localCheckpoint(true)
    // the IVF twin's guard: an all-deleted head has nothing to rebuild
    if (live.isEmpty) {
      graft.core.Checkpoints.free(live)
      throw new IllegalArgumentException(
        s"generation $g's head live set under $root is empty — nothing to " +
          "re-fit; a cutover of an emptied index is an operator decision " +
          "(drop the root), not a rebuild")
    }
    val next = Generations.genPath(root, g + 1)
    val fs = new Path(next)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(next), true) // a crashed prior cutover's garbage
    init(live,
      NswIndex.buildEdgesLsh(live.select(col("vec_id"), col("embedding"))),
      next, baseBatch = headId)
    graft.core.Checkpoints.free(live)
    // PQ sidecars carry over at their configured geometry (the IVF
    // twin's refreshPqSidecars discipline: recovered from the stored
    // codebooks, re-fit on the successor at the default seed)
    IvfIndex.pqSubdirs(spark, cur).foreach { sub =>
      val books = IvfIndex.readCodebooks(spark, cur, sub)
      require(books.nonEmpty && books.head.nonEmpty,
        s"sidecar $sub has no codebooks under $cur — cannot carry its " +
          "geometry across the generation cutover")
      initPq(spark, next, m = books.length, codes = books.head.length,
        rotate = IvfIndex.readRotation(spark, cur, sub).isDefined, sub = sub)
    }
    Generations.writePointer(spark, root, g + 1)
    g + 1
  }

  /** Apply a maintenance batch to the CURRENT generation (ids at or
    * below its base are replays and skip — the floor discipline). */
  def applyBatchGen(spark: SparkSession, root: String, batchId: Long,
      upserts: DataFrame, deletes: DataFrame): Unit =
    applyBatch(spark,
      Generations.genPath(root, Generations.current(spark, root)),
      batchId, upserts, deletes)

  /** As-of vector reconstruction routed across generations. */
  def asOfVectorsGen(spark: SparkSession, root: String,
      batchId: Long): DataFrame =
    asOfVectors(spark, Generations.route(spark, root, batchId), batchId)

  /** Beam serve routed across generations. */
  def searchAsOfGen(spark: SparkSession, root: String, batchId: Long,
      queries: DataFrame, k: Int = 5): DataFrame =
    searchAsOf(spark, Generations.route(spark, root, batchId), batchId,
      queries, k)

  /** PRE-filter beam serve routed across generations — the graph
    * family's filtered mode survives a cutover (metadata rides the
    * successor's vectors; the rebuilt edge set is label-independent,
    * exactly like every graph layout). */
  def searchAsOfFilteredGen(spark: SparkSession, root: String, batchId: Long,
      queries: DataFrame, pred: org.apache.spark.sql.Column,
      k: Int = 10): DataFrame =
    searchAsOfFiltered(spark, Generations.route(spark, root, batchId),
      batchId, queries, pred, k)

  /** CDC routed across generations — the IVF twin's contract with
    * this family's payload set. */
  def asOfDiffGen(spark: SparkSession, root: String, fromBatch: Long,
      toBatch: Long): DataFrame = {
    def side(batchId: Long, as: String): DataFrame = {
      val p = Generations.route(spark, root, batchId)
      repairCompaction(spark, p)
      SnapshotLayout.requireAnswerable(spark, p, batchId)
      SnapshotLayout.asOfFingerprints(spark, p, batchId, nswNonPayload, as)
    }
    SnapshotLayout.diffFingerprints(side(fromBatch, "b_fp"),
      side(toBatch, "a_fp"))
  }

  /** Rollback within the CURRENT generation only — the IVF twin's
    * cross-generation refusal. */
  def rollbackGen(spark: SparkSession, root: String, batchId: Long): Unit = {
    val g = Generations.current(spark, root)
    val p = Generations.genPath(root, g)
    val floor = SnapshotLayout.manifestIds(spark, p).headOption
    require(floor.exists(batchId >= _),
      s"rollback across a generation boundary refused: batch $batchId " +
        s"predates generation $g's base/floor ${floor.getOrElse(-1L)} under " +
        s"$root — a cutover is not reversible by rollback (older " +
        "generations stay readable via as-of)")
    rollback(spark, p, batchId)
  }

  /** Per-generation debt gauge — this family's repair per generation,
    * then the shared scan ([[SnapshotLayout.layoutDebtGen]]'s shape). */
  def layoutDebtGen(spark: SparkSession, root: String): DataFrame = {
    val cur = Generations.current(spark, root)
    Generations.list(spark, root).map { g =>
      layoutDebt(spark, Generations.genPath(root, g))
        .withColumn("generation", lit(g.toLong))
        .withColumn("is_current", lit(g == cur))
    }.reduce(_ unionByName _)
  }

  /** `nsw_generation`: the graph family's cutover contract —
    * `ivf_generation`'s grid (including `retired_refuses`: drop
    * generation 1 last, pin the loud refusal) with the fresh-build
    * identity on the EDGE set (the successor's base graph must equal
    * a fresh LSH build over the head live rows, set-level) and
    * `sidecar_carried` pinned at STORED geometry: generation 1 gets a
    * deliberately non-default 4×8 PQ sidecar, and the cutover's carry
    * must re-fit the successor's sidecar as 4×8 with its base codes
    * covering the boundary live set — a carry that re-defaulted its
    * geometry (or skipped the encode) flips the column, which the IVF
    * twin's exists-check could not see. Cost discipline: the grid is
    * beam-walk fixed-cost dominated, so `old_asof_served` compares the
    * routed reconstruction STATE (fingerprints + the route resolving
    * to generation 1) instead of running two walks whose inputs it
    * is — the one head serve keeps the end-to-end walk proof. */
  /** The lifecycle's captured verdicts plus the finished root — plain
    * driver values, so the session memo stores nothing plan-bound. */
  private[graft] case class GenLifecycle(root: String,
      matchesFresh: Boolean, boundaryIdentical: Boolean,
      oldAsofServed: Boolean, gaugeReset: Boolean, crossRefused: Boolean,
      postCutoverApplies: Boolean, sidecarCarried: Boolean,
      retiredRefuses: Boolean)

  /** Session memo of the FULL generational lifecycle (VERDICT r14 #3:
    * the old rebuild-per-invocation grid mixed a measured 54 s cold
    * build into an 18-20 s steady state and the bench floor landed
    * anywhere in between — the persist_chunks_build precedent applies:
    * the lifecycle is now a labeled one-time build, `nsw_generation_
    * build`, and the serve key floors the steady-state head walk over
    * the finished root). Every grid verdict is captured HERE, at the
    * lifecycle step that proves it (the fingerprint diffs must read
    * generation 1 before retirement drops it). */
  private val genLifecycleCache = new graft.store.VersionedMemo[GenLifecycle]()

  private[graft] def genLifecycle(spark: SparkSession, dir: String): GenLifecycle =
    genLifecycleCache.get(spark, s"nsw_gen_lifecycle:$dir", dir) {
      import spark.implicits._
      val all = Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding", $"label")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-snap-" +
        s"${spark.sparkContext.applicationId}-${math.abs(dir.hashCode)}/nsw_gen"
      val gen1 = Generations.genPath(root, 1)
      val fs = new Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(root), true)
      SnapshotLayout.copyLayout(spark, pristineScenario(spark, dir), gen1)
      Generations.writePointer(spark, root, 1)
      rollback(spark, gen1, 2L) // head := the good batch
      // a PQ sidecar at NON-default geometry (m=4, codes=8): the
      // cutover must re-fit the carried sidecar at its STORED geometry
      // (newGeneration recovers m/codes from the predecessor's
      // codebooks) — a carry that silently re-defaulted to 8×16 flips
      // `sidecar_carried` below, which an exists-check would miss
      initPq(spark, gen1, m = 4, codes = 8)
      // pre-cutover as-of-1 state, CAPTURED (checkpoint) so the
      // post-cutover comparison cannot silently read post-cutover files
      val asof1Before = SnapshotLayout
        .asOfFingerprints(spark, gen1, 1L, nswNonPayload, "fp")
        .localCheckpoint(true)
      // fresh-build identity on the successor's base: vectors are the
      // head live set (the boundary fingerprint diff below) and edges a
      // fresh LSH build. The comparator is MEMOIZED from the pristine
      // scenario's as-of-2 reconstruction — identical content (rollback
      // restores the byte-identical layout, and the copy preserves
      // bytes, so both builds read the same file set) on a stable
      // session-lived path the cached frame can safely re-evaluate from.
      // Round 17: the comparator build depends only on the (static)
      // pristine scenario, not on the cutover — the lifecycle's two
      // heavy graph builds (this one and newGeneration's fresh rebuild)
      // run CONCURRENTLY from driver threads (guide §2.6), halving the
      // serial wall of its slowest phase; the count() inside the future
      // forces the cached edge table so the overlap does real work
      val freshEdgesF = {
        import scala.concurrent.Future
        import scala.concurrent.ExecutionContext.Implicits.global
        Future {
          val e = NswIndex.edgesCachedFor(s"nsw_gen_fresh:$dir",
            asOfVectors(spark, pristineScenario(spark, dir), 2L)
              .select($"vec_id", $"embedding"), dir)
          e.count()
          e
        }
      }
      val newGen = newGeneration(spark, root)
      val gen2 = Generations.genPath(root, 2)
      val freshEdges = scala.concurrent.Await.result(freshEdgesF,
        scala.concurrent.duration.Duration.Inf)
      val storedEdges = spark.read.parquet(s"$gen2/edges")
        .filter($"batch_id" === 2L).select($"src", $"dst")
      val matchesFresh = SnapshotLayout.rowSetDiffCount(
        freshEdges.select($"src", $"dst"), storedEdges, "n_edges_diff")
        .collect()(0).getLong(0) == 0L
      val boundaryIdentical = SnapshotLayout.diffFingerprints(
          SnapshotLayout.asOfFingerprints(spark, gen1, 2L, nswNonPayload, "b_fp"),
          SnapshotLayout.asOfFingerprints(spark, gen2, 2L, nswNonPayload, "a_fp"))
        .count() == 0L
      // old as-ofs answerable through the root: the route must resolve
      // to generation 1 AND its batch-1 reconstruction must be intact
      // (the walk is a deterministic function of that state, so state
      // identity implies the old serve-level identity — two beam walks
      // saved; the serve key's per-probe head walk still proves the
      // machinery end-to-end through the generational route)
      val routed = Generations.route(spark, root, 1L)
      val asof1After = SnapshotLayout
        .asOfFingerprints(spark, routed, 1L, nswNonPayload, "fp")
      val oldAsofServed = routed == gen1 &&
        SnapshotLayout.rowSetDiffCount(asof1Before, asof1After, "n_old_diff")
          .collect()(0).getLong(0) == 0L
      val debts = layoutDebtGen(spark, root).collect()
      val gen2Row = debts.find(_.getAs[Long]("generation") == 2L)
      val gaugeReset = newGen == 2 && Generations.current(spark, root) == 2 &&
        gen2Row.exists(r =>
          r.getAs[Boolean]("is_current") && r.getAs[Long]("n_batches") == 1L &&
            r.getAs[Long]("delta_since_fit") == 0L &&
            r.getAs[Long]("fitted_n") == r.getAs[Long]("live_rows")) &&
        debts.count(_.getAs[Boolean]("is_current")) == 1
      val crossRefused =
        try { rollbackGen(spark, root, 1L); false }
        catch { case _: IllegalArgumentException => true }
      // sidecar carried AT ITS STORED GEOMETRY: the successor's
      // codebooks re-fit as 4 subspaces × 8 codes (not the 8×16
      // default), and its base codes cover the boundary live set
      // exactly — checked BEFORE batch 3 appends post-cutover codes
      val gen2Books = IvfIndex.readCodebooks(spark, gen2, "pq")
      val gen2BaseLive = spark.read.parquet(s"$gen2/vectors")
        .filter($"batch_id" === 2L).count()
      val sidecarCarried = gen2Books.length == 4 &&
        gen2Books.forall(_.length == 8) &&
        spark.read.parquet(s"$gen2/pq/codes")
          .filter($"batch_id" === 2L).count() == gen2BaseLive
      applyBatchGen(spark, root, 3L,
        upserts = all.filter($"vec_id" === 14 || $"vec_id" === 21),
        deletes = all.limit(0).select($"vec_id"))
      val postCutoverApplies = asOfVectorsGen(spark, root, Long.MaxValue)
        .filter($"vec_id" === 14 || $"vec_id" === 21).count() == 2L &&
        SnapshotLayout.manifestIds(spark, gen2) == Seq(2L, 3L)
      // retirement (the IVF grid's contract on the graph): every
      // generation-1-reading verdict is already collected above, so
      // the drop is safe — then pin the loud refusal at routing
      Generations.dropGeneration(spark, root, 1)
      val retiredRefuses =
        (try { Generations.route(spark, root, 1L); false }
        catch { case _: IllegalArgumentException => true }) &&
          Generations.list(spark, root) == Seq(2)
      GenLifecycle(root, matchesFresh, boundaryIdentical, oldAsofServed,
        gaugeReset, crossRefused, postCutoverApplies, sidecarCarried,
        retiredRefuses)
    }

  /** `nsw_generation_build`: the one-time generational lifecycle
    * surfaced as its OWN labeled entry (VERDICT r14 #3, the
    * persist_chunks_build precedent) — forces [[genLifecycle]] and
    * reports its verdict grid; the oracle pins all-true. */
  def nswGenerationBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = genLifecycle(spark, dir)
    Seq(
      ("boundary_live_identical", g.boundaryIdentical),
      ("cross_rollback_refused", g.crossRefused),
      ("gauge_reset", g.gaugeReset),
      ("matches_fresh", g.matchesFresh),
      ("old_asof_served", g.oldAsofServed),
      ("post_cutover_applies", g.postCutoverApplies),
      ("retired_refuses", g.retiredRefuses),
      ("sidecar_carried", g.sidecarCarried))
      .toDF("flag", "ok").orderBy($"flag")
  }

  val nswGenerationBuildSql: String =
    """SELECT t.flag, true AS ok
      |FROM (VALUES ('boundary_live_identical'), ('cross_rollback_refused'),
      |  ('gauge_reset'), ('matches_fresh'), ('old_asof_served'),
      |  ('post_cutover_applies'), ('retired_refuses'), ('sidecar_carried'))
      |  t(flag)
      |ORDER BY flag""".stripMargin

  /** `nsw_generation`: the graph family's cutover contract —
    * `ivf_generation`'s grid (including `retired_refuses`: drop
    * generation 1 last, pin the loud refusal) with the fresh-build
    * identity on the EDGE set (the successor's base graph must equal
    * a fresh LSH build over the head live rows, set-level) and
    * `sidecar_carried` pinned at STORED geometry. The lifecycle runs
    * once per session under its own build label ([[genLifecycle]] /
    * `nsw_generation_build`); THIS key is the steady-state serve — a
    * per-probe beam walk at head through the generational route, with
    * the captured lifecycle verdicts attached as the grid's global
    * columns (same output contract as the pre-split key). */
  def nswGeneration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = genLifecycle(spark, dir)
    val queries = Tables.embeddings(spark, dir)
      .filter($"vec_id" < 5 && $"vec_id" % 7 =!= 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val head = searchAsOfGen(spark, g.root, Long.MaxValue, queries)
    head.groupBy($"q_id").agg(
        (max(when($"neighbor_id" === $"q_id", 1)).isNotNull).as("self_found"),
        (max($"score_e6") === 1000000L).as("top1_exact"))
      .select($"q_id", $"self_found", $"top1_exact",
        lit(g.matchesFresh).as("matches_fresh"),
        lit(g.boundaryIdentical).as("boundary_live_identical"),
        lit(g.oldAsofServed).as("old_asof_served"),
        lit(g.gaugeReset).as("gauge_reset"),
        lit(g.crossRefused).as("cross_rollback_refused"),
        lit(g.postCutoverApplies).as("post_cutover_applies"),
        lit(g.sidecarCarried).as("sidecar_carried"),
        lit(g.retiredRefuses).as("retired_refuses"))
      .orderBy($"q_id")
  }

  val nswGenerationSql: String =
    """SELECT vec_id AS q_id, true AS self_found, true AS top1_exact,
      |  true AS matches_fresh, true AS boundary_live_identical,
      |  true AS old_asof_served, true AS gauge_reset,
      |  true AS cross_rollback_refused, true AS post_cutover_applies,
      |  true AS sidecar_carried, true AS retired_refuses
      |FROM embeddings WHERE vec_id < 5 AND vec_id % 7 <> 0
      |ORDER BY q_id""".stripMargin
}
