package graft.streaming

import graft.text.Bm25
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Continuous LEXICAL-index maintenance: the BM25 postings store kept
  * current under a document mutation stream — the sparse-leg twin of
  * [[IndexStream]]'s vector-index maintenance, with the same
  * exactly-once discipline (batch-id sidecar written last, replayed
  * ids skipped outright).
  *
  * Layout at `path`:
  *  - `postings/pbucket=NN/` — parquet rows `(doc_id, dl, term, tf)`
  *    hash-partitioned into [[nBuckets]] doc buckets, so a micro-batch
  *    rewrites ONLY the buckets its doc_ids land in (dynamic partition
  *    overwrite; the untouched buckets keep their files — the
  *    [[graft.index.IvfIndex]] `cluster_id=` rewrite discipline
  *    applied to a term index).
  *  - `_graft_postings_stats.json` — exact-long corpus constants
  *    (n_docs, sum_dl) maintained incrementally per batch; serving
  *    never scans the store to recover them.
  *  - `_graft_stream_batch_<streamId>.json` — the applied-batch
  *    sidecar shared with [[IndexStream]].
  *
  * A mutation stream `(doc_id, text, op)` with `op ∈ {upsert,
  * delete}` applies deletes before upserts within a batch (a batch
  * carrying both for one id converges to "present", the replace
  * semantics a client expects). Every affected doc's old rows leave
  * the store and the stats move by exact long deltas, so a replaced
  * document can never double-count its tokens.
  *
  * Serving ([[serve]]) runs [[Bm25.rankedOver]] — the IDENTICAL
  * scorer the batch entry uses — over the store; PostingsStreamSpec
  * pins hash-exact parity between a streamed-in corpus and the batch
  * derivation of the same documents.
  */
object PostingsStream {

  /** Doc-hash partition count. 64 buckets bounds a micro-batch's
    * rewrite to |affected buckets| ≤ min(batch docs, 64) directories;
    * a real deployment sizes this to its ingest rate the same way the
    * IVF layout sizes k. */
  val nBuckets = 64

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dl", LongType),
    StructField("term", StringType), StructField("tf", LongType),
    StructField("pbucket", IntegerType)))

  def maintain(docs: DataFrame, path: String,
      streamId: String = "default"): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch(
      (b: DataFrame, id: Long) => applyBatch(b, id, path, streamId))

  /** One micro-batch against the store — `private[graft]` so the spec
    * can drive a true same-batch-id replay. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long, path: String,
      streamId: String = "default"): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (IndexStream.lastAppliedBatch(spark, path, streamId).exists(_ >= batchId)) return
    val b = batch.localCheckpoint(true)
    val upserts = b.filter(col("op") === "upsert").select(col("doc_id"), col("text"))
    // every mentioned doc's old rows leave the store (delete, or the
    // replace half of an upsert); only upserted docs come back
    val affectedIds = b.select(col("doc_id")).distinct()
      .withColumn("pbucket", pmod(col("doc_id"), lit(nBuckets.toLong)).cast(IntegerType))
      .localCheckpoint(true)
    val existing = readPostings(spark, path)
    // bounded: ≤ one row per affected doc (bucket-pruned scan — the
    // broadcast id set's pbucket rides the join key)
    val oldDocs = existing
      .join(broadcast(affectedIds), Seq("pbucket", "doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .localCheckpoint(true)
    val newRows = Bm25.toPostings(upserts)
      .withColumn("pbucket", pmod(col("doc_id"), lit(nBuckets.toLong)).cast(IntegerType))
    // rewrite = affected buckets minus affected docs plus new rows
    val buckets = broadcast(affectedIds.select(col("pbucket")).distinct())
    val rewritten = existing
      .join(buckets, Seq("pbucket"), "left_semi")
      .join(broadcast(affectedIds.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .select(postingsSchema.fieldNames.map(col): _*)
      .union(newRows.select(postingsSchema.fieldNames.map(col): _*))
      .localCheckpoint(true)
    val affectedBuckets = affectedIds.select(col("pbucket")).distinct()
      .collect().map(_.getAs[Int]("pbucket")).toSet
    if (rewritten.isEmpty) {
      // dynamic overwrite writes nothing for an empty frame — emptied
      // buckets must drop their directories explicitly
      dropBuckets(spark, path, affectedBuckets)
    } else {
      rewritten.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pbucket").parquet(s"$path/postings")
      val survivors = rewritten.select(col("pbucket")).distinct()
        .collect().map(_.getAs[Int]("pbucket")).toSet
      dropBuckets(spark, path, affectedBuckets -- survivors)
    }
    // exact-long stats deltas: docs removed (all affected that were
    // present) and docs (re)added (the upserts)
    val old = oldDocs.agg(
      count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    val nw = newRows.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s")).head()
    val (n0, s0) = readStats(spark, path)
    writeStats(spark, path,
      n0 - old.getAs[Long]("n") + nw.getAs[Long]("n"),
      s0 - old.getAs[Long]("s") + nw.getAs[Long]("s"))
    IndexStream.writeAppliedBatch(spark, path, streamId, batchId)
  }

  /** BM25 over the maintained store — same scorer, same workload as
    * the batch `text_bm25` entry. */
  def serve(spark: SparkSession, path: String, k: Int = 10): DataFrame = {
    val (nDocs, sumDl) = readStats(spark, path)
    import spark.implicits._
    val stats = Seq((nDocs.toDouble, sumDl.toDouble)).toDF("n_docs", "sum_dl")
    Bm25.rankedOver(readPostings(spark, path).drop("pbucket"), stats, k)
  }

  private def readPostings(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(s"$path/postings")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(postingsSchema).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], postingsSchema)
  }

  private def dropBuckets(spark: SparkSession, path: String, buckets: Set[Int]): Unit = {
    if (buckets.isEmpty) return
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    buckets.foreach { bkt =>
      fs.delete(new Path(s"$path/postings/pbucket=$bkt"), true)
    }
  }

  // stats sidecar: the IndexMeta JSON-via-FS discipline (no Spark job
  // to read two longs)
  private def statsPath(path: String) = new Path(s"$path/_graft_postings_stats.json")
  private val StatsPattern = """\{"n_docs":(-?\d+),"sum_dl":(-?\d+)\}""".r

  private[graft] def readStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = statsPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      val in = fs.open(p)
      val body = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      body.trim match {
        case StatsPattern(n, s) => (n.toLong, s.toLong)
        case _ => (0L, 0L)
      }
    }
  }

  private def writeStats(spark: SparkSession, path: String, nDocs: Long, sumDl: Long): Unit = {
    val p = statsPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"n_docs":$nDocs,"sum_dl":$sumDl}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
