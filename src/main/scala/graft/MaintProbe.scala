package graft

import graft.core.Tables
import graft.index.{Generations, IvfIndex, SnapshotLayout}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only instrument for the versioned layouts' MAINTENANCE
  * economics on concentrated data (round-15 pointer 2's remaining
  * half): on a given embeddings dir, builds the same three-batch
  * history (90% base, 10% append, mod-17 deletes), reports the debt
  * gauge, then times `compact(2)` and a generational cutover
  * (`newGeneration`). Run on the clustered slice AND a same-size
  * uniform replica: cell-mass skew concentrates superseded rows and
  * partition sizes in the heavy cells, which is where a compaction
  * or cutover would first go super-linear. The Tune convention — not
  * driver-facing. */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_clustered")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").cache()
    val n = emb.count()
    println(s"MAINTPROBE dir=$dir n=$n")
    def timed[T](label: String)(fn: => T): T = {
      val t0 = System.nanoTime(); val r = fn
      println(f"MAINT $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // versioned layout: history + debt + compaction
    val vpath = java.nio.file.Files
      .createTempDirectory("graft-maint").toString + "/ivf"
    timed("init(90%)") {
      SnapshotLayout.init(
        IvfIndex.build(spark, emb.filter(pmod($"vec_id", lit(10L)) =!= 0L)), vpath) }
    timed("applyBatch(+10%)") {
      SnapshotLayout.applyBatch(spark, vpath, 1L,
        upserts = emb.filter(pmod($"vec_id", lit(10L)) === 0L),
        deletes = emb.limit(0).select($"vec_id")) }
    timed("applyBatch(deletes)") {
      SnapshotLayout.applyBatch(spark, vpath, 2L,
        upserts = emb.limit(0),
        deletes = emb.filter(pmod($"vec_id", lit(17L)) === 0L).select($"vec_id")) }
    val debt = SnapshotLayout.layoutDebt(spark, vpath).collect()(0)
    println(s"MAINT debt: $debt")
    // per-cell physical-row skew: the heavy-cell concentration a
    // uniform corpus cannot show
    val cells = spark.read.parquet(s"$vpath/vectors")
      .groupBy($"cluster_id").count().select($"count").collect().map(_.getLong(0))
    println(f"MAINT cellRows max=${cells.max} p50=${cells.sorted.apply(cells.length / 2)} " +
      f"skew=${cells.max.toDouble / math.max(1L, cells.sorted.apply(cells.length / 2))}%.1f")
    timed("compact(upTo=2)") { SnapshotLayout.compact(spark, vpath, 2L) }
    val head = SnapshotLayout.searchAsOf(spark, vpath, Long.MaxValue,
      emb.filter($"vec_id" < 5 && $"vec_id" % 17 =!= 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec")))
    println(s"MAINT post-compact head serve rows=${head.count()}")

    // generational root: cutover wall (successor re-fit included)
    val root = java.nio.file.Files
      .createTempDirectory("graft-maintgen").toString + "/gen"
    SnapshotLayout.initGen(
      IvfIndex.build(spark, emb.filter(pmod($"vec_id", lit(10L)) =!= 0L)), root)
    SnapshotLayout.applyBatchGen(spark, root, 1L,
      upserts = emb.filter(pmod($"vec_id", lit(10L)) === 0L),
      deletes = emb.limit(0).select($"vec_id"))
    val newGen = timed("newGeneration") { SnapshotLayout.newGeneration(spark, root) }
    println(s"MAINT cutover -> generation $newGen, " +
      s"current=${Generations.current(spark, root)}")
    spark.stop()
  }
}
