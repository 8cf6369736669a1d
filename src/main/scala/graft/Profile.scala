package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: times the sub-plans of a slow query so
  * perf work targets the actual bottleneck. Not part of the driver
  * contract. Usage: runMain graft.Profile [sfDir]. */
object Profile {
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
    import org.apache.spark.sql.functions._
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs = graft.core.Tables.documents(spark, sfDir)
    time("documents_scan") { docs.count() }
    time("tokenize_only") {
      docs.select($"doc_id", graft.functions.hashes.hashedWordShingles($"text", 3).as("hs")).count()
    }
    val shd = docs
      .select($"doc_id", explode(graft.functions.hashes.hashedWordShingles($"text", 3)).as("h"))
      .select($"doc_id", ($"h" % 2147483647L).as("x"))
    time("shingles_explode") { shd.count() }
    time("shingles_distinct") { shd.distinct().count() }
    val sig = shd.distinct()
      .groupBy($"doc_id").agg(collect_list($"x").as("xs"))
      .select($"doc_id", graft.functions.hashes.minHashSignature($"xs", 32).as("sig"))
    time("signatures") { sig.count() }
    time("sig_forced_uncached") {
      sig.agg(sum(element_at($"sig", 1))).collect(); 1L
    }
    time("collect_list_only") {
      shd.distinct().groupBy($"doc_id").agg(collect_list($"x").as("xs"))
        .agg(sum(size($"xs"))).collect(); 1L
    }
    val sigC = sig.cache()
    time("signatures_cached") { sigC.count() }
    val bands = sigC.select($"doc_id", explode(sequence(lit(0), lit(7))).as("b"), $"sig")
      .select($"doc_id", $"b",
        array_join(slice($"sig", $"b" * 4 + 1, lit(4)), ",").as("key"))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
    time("band_join_pairs") { pairs.count() }
    time("full_minhash") { graft.dedup.Dedup.minhash(spark, sfDir).count() }
    time("full_minhash_again") { graft.dedup.Dedup.minhash(spark, sfDir).count() }

    // ANN family in bench-like session order (the NSW/graph builds
    // are eager — buildEdgesLsh checkpoints refine rounds at call
    // time — so per-query timers here capture the true cost)
    time("nsw_build_q") { SparkEntry.queries("nsw_build")(spark, sfDir).count() }
    time("nsw_search_q") { SparkEntry.queries("nsw_search")(spark, sfDir).count() }
    time("nsw_build_lsh_q") { SparkEntry.queries("nsw_build_lsh")(spark, sfDir).count() }
    time("query_index_nsw_q") { SparkEntry.queries("query_index_nsw")(spark, sfDir).count() }
    time("qwi_nsw_raw") { graft.operators.Collections.queryWithIndex(spark, sfDir, "nsw").count() }
    time("qic_nsw_checked_again") { SparkEntry.queries("query_index_nsw")(spark, sfDir).count() }
    time("query_text_ivf_q") { SparkEntry.queries("query_text_ivf")(spark, sfDir).count() }
    time("query_text_nsw_q") { SparkEntry.queries("query_text_nsw")(spark, sfDir).count() }
    spark.stop()
  }
}
