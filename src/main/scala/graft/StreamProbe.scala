package graft

import org.apache.spark.sql.SparkSession

/** Dev-only component timer for the streaming CDC / generation keys
  * (round 17 — VERDICT r16 #4: `index_changes_stream` at 54 s with no
  * established cause). Times each leg of the key separately: the four
  * scenario-root builds, then each family's availableNow drain. Not
  * part of the driver contract. Usage: runMain graft.StreamProbe [sfDir]. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STREAMPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // component timing of the IVF scenario build, replicated step by
    // step on a throwaway path (the memoized scenario then re-pays the
    // same steps — timed as scenario_ivf below)
    {
      import org.apache.spark.sql.functions._
      val all = graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label"))
      val path = java.nio.file.Files
        .createTempDirectory("graft-probe-ivf").toString + "/pristine"
      val base = all.filter(col("vec_id") >= 50)
      val built = time("cmp_kmeans_build") {
        val b = graft.index.IvfIndex.build(spark, base, metaCols = Seq("label"))
        b.assigned.count(); b }
      time("cmp_init_write") { graft.index.SnapshotLayout.init(built, path) }
      time("cmp_init_pq") { graft.index.SnapshotLayout.initPq(spark, path) }
      time("cmp_batch1") { graft.index.SnapshotLayout.applyBatch(spark, path, 1L,
        upserts = all.filter(col("vec_id") < 25),
        deletes = all.limit(0).select(col("vec_id"))) }
      time("cmp_batch2") { graft.index.SnapshotLayout.applyBatch(spark, path, 2L,
        upserts = all.filter(col("vec_id") >= 25 && col("vec_id") < 50),
        deletes = all.filter(col("vec_id") < 25 && col("vec_id") % 7 === 0)
          .select(col("vec_id"))) }
      time("cmp_batch3") { graft.index.SnapshotLayout.applyBatch(spark, path, 3L,
        upserts = all.filter(col("vec_id") < 10)
          .select(col("vec_id"),
            transform(col("embedding"), _ => lit(0.0f)).as("embedding"),
            col("label")),
        deletes = all.limit(0).select(col("vec_id"))) }
    }

    // the four scenario roots indexChangesStream reads
    val ivfPath = time("scenario_ivf") {
      graft.index.SnapshotLayout.pristineScenario(spark, sfDir) }
    val nswPath = time("scenario_nsw") {
      graft.index.NswSnapshotLayout.pristineScenario(spark, sfDir) }
    val genRoot = time("scenario_gen_ivf") {
      graft.streaming.IndexStream.pristineGenCdcRoot(spark, sfDir) }
    val genNswRoot = time("scenario_gen_nsw") {
      graft.streaming.IndexStream.pristineGenCdcRootNsw(spark, sfDir) }

    val out = s"${System.getProperty("java.io.tmpdir")}/graft-streamprobe/changes"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    import org.apache.spark.sql.streaming.Trigger
    def drain(label: String,
        w: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
        sub: String): Unit = time(s"drain_$label") {
      val q = w.trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$out/$sub/data").count()
    }
    drain("gen", graft.streaming.IndexStream.changesIvfGen(spark, genRoot, s"$out/gen"), "gen")
    drain("gen_nsw", graft.streaming.IndexStream.changesNswGen(spark, genNswRoot, s"$out/gen_nsw"), "gen_nsw")
    drain("ivf", graft.streaming.IndexStream.changesIvf(spark, ivfPath, s"$out/ivf"), "ivf")
    drain("nsw", graft.streaming.IndexStream.changesNsw(spark, nswPath, s"$out/nsw"), "nsw")

    // second drains from fresh consumer dirs re-pay only the stream
    // machinery (scenarios now memoized) — the steady-state floor
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    drain("gen2nd", graft.streaming.IndexStream.changesIvfGen(spark, genRoot, s"$out/gen"), "gen")
    drain("ivf2nd", graft.streaming.IndexStream.changesIvf(spark, ivfPath, s"$out/ivf"), "ivf")
    spark.stop()
  }
}
