package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B probe for the Spark 4.1.2 cold-build regression
  * (VERDICT r7 #4): sort-heavy one-time builds measured 3-6× slower
  * after the engine swap while warm serves stayed flat. This main
  * separates the candidate causes inside ONE JVM:
  *
  *   - cold vs repeat runs of the SAME uncached build plan → JVM/JIT/
  *     codegen warmup vs steady-state execution cost;
  *   - the build's sub-plans (cross-score without the rank window,
  *     the rank window alone over a materialized pair frame) → which
  *     operator regressed;
  *   - runtime-settable conf A/Bs (AQE on/off, radix sort on/off,
  *     shuffle partitions) on the dominant sub-plan.
  *
  * Static `spark.shuffle.*` confs can't flip inside a session — drive
  * those via SPARK_GRAFT_CONF="k=v;k=v" across separate invocations.
  * Usage: runMain graft.Regress [sfDir]. Not part of the driver
  * contract.
  */
object Regress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .config(extra)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"REGRESS $label%-34s $s%8.2fs  rows=$n")
      s
    }

    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    emb.count() // footer/scan warmup outside all timings

    // ---- A: same plan, cold then repeated (no memo, no cache) ----
    time("nsw_build_exact_run1_cold") {
      graft.index.NswIndex.buildEdges(emb).count()
    }
    time("nsw_build_exact_run2") {
      graft.index.NswIndex.buildEdges(emb).count()
    }
    time("nsw_build_exact_run3") {
      graft.index.NswIndex.buildEdges(emb).count()
    }

    // ---- B: sub-plans of the exact build ----
    // Deliberate O(n²) crossJoin: this mirrors nsw_build's EXACT
    // build (whose scale path is nsw_build_lsh) so the A/B can
    // isolate which sub-operator regressed. Test instrument only —
    // never lift this shape into a production path; the cap makes a
    // misuse on a real corpus fail fast instead of running for days.
    require(emb.count() <= 100000L,
      "graft.Regress is a dev instrument: its exact O(n²) sub-plans are " +
        "capped at 100k vectors — point it at a test-SF dir")
    val pairsScored = emb.select(col("vec_id").as("src"), col("embedding").as("src_vec"))
      .crossJoin(emb.select(col("vec_id").as("dst"), col("embedding").as("dst_vec")))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        graft.core.Stab.e6(graft.functions.vectors.cosineSim(
          col("src_vec"), col("dst_vec"))).as("score_e6"))
    time("cross_score_no_window") { pairsScored.count() }
    val mat = pairsScored.localCheckpoint(true)
    time("rank_window_over_materialized") {
      import org.apache.spark.sql.expressions.Window
      mat.withColumn("rank", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("score_e6").desc, col("dst").asc)))
        .filter(col("rank") <= graft.index.NswIndex.graphDegree).count()
    }

    // ---- C: conf A/Bs on the full build (runtime-settable only) ----
    def withConf(k: String, v: String)(label: String): Unit = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      time(label) { graft.index.NswIndex.buildEdges(emb).count() }
      old match {
        case Some(o) => spark.conf.set(k, o)
        case None => spark.conf.unset(k)
      }
    }
    withConf("spark.sql.adaptive.enabled", "false")("build_aqe_off")
    withConf("spark.sql.sort.enableRadixSort", "false")("build_radix_off")
    withConf("spark.sql.shuffle.partitions", "128")("build_shufpart_128")
    withConf("spark.sql.codegen.wholeStage", "false")("build_codegen_off")

    // ---- D: LSH build cold/warm (the 100 TB path that regressed) ----
    time("nsw_build_lsh_run1_cold") {
      graft.index.NswIndex.buildEdgesLsh(emb).count()
    }
    time("nsw_build_lsh_run2") {
      graft.index.NswIndex.buildEdgesLsh(emb).count()
    }

    // ---- E: persist_chunks_build phases (these summed to the
    // pre-swap shape, which is how the official19/20 inflation was
    // traced to host contention, not the engine — SURVEY §6 r8) ----
    val base = java.nio.file.Files.createTempDirectory("graft-regress").toString
    val chunkEmb = graft.operators.Collections.chunkEmbeddings(spark, sfDir)
    time("phase_chunk_embed_memo") { chunkEmb.count() }
    time("phase_bucketed_write_docs") {
      graft.sources.Bucketed.write(
        graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text")),
        "graft_regress_docs", s"$base/documents", "doc_id", 32); 1L
    }
    time("phase_bucketed_write_chunks") {
      graft.sources.Bucketed.write(
        graft.operators.Collections.chunksRaw(spark, sfDir),
        "graft_regress_chunks", s"$base/chunks", "doc_id", 32); 1L
    }
    time("phase_emb_parquet_write") {
      chunkEmb.write.mode("overwrite").parquet(s"$base/chunk_embeddings"); 1L
    }
    val corpus = spark.read.parquet(s"$base/chunk_embeddings")
    time("phase_ivf_build_persist") {
      graft.index.IvfIndex.persist(
        graft.index.IvfIndex.build(spark, corpus), s"$base/ivf"); 1L
    }
    time("phase_nsw_lsh_corpus_build") {
      graft.index.NswIndex.buildEdgesLsh(corpus).count()
    }
    time("phase_nsw_persist_bucketed") {
      graft.index.NswIndex.persistBucketed(spark, corpus,
        graft.index.NswIndex.buildEdgesLsh(corpus), s"$base/nsw",
        "graft_regress_nsw", 32); 1L
    }
    spark.stop()
  }
}
