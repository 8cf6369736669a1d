package graft

import org.apache.spark.sql.SparkSession

/** Dev-only controlled A/B for the `bpe_train` floor jump (VERDICT r9
  * "what's wrong" #2): the round-9 relabel to cold-first moved
  * `bpe_train` to the FRONT of the bench pass (build-first order,
  * alphabetically first among the build entries), so its floor rose
  * 2.58 s → 8.79 s. The hypothesis is cold-JVM warmup (C2 compilation
  * of the codegen'd pair-count loop, MLlib/parquet class loading),
  * not a loop regression. This main isolates the channel inside ONE
  * JVM:
  *
  *  - `cold_first_s`: bpe_train as the first query after session
  *    build — exactly the bench's cold-first position;
  *  - `warm_jvm_s`: the SAME training loop, JVM warmed by a handful
  *    of unrelated queries, memo-cold via a copy of the corpus dir
  *    under a different path (the VersionedMemo key is the dir, so
  *    the copy re-trains from scratch while every JIT-compiled
  *    method stays hot) — the r8 mid-pass position;
  *  - `memo_warm_s`: the memo hit, for scale.
  *
  * cold_first_s / warm_jvm_s >> 1 with warm_jvm_s ≈ the r8 floor
  * confirms warmup; warm_jvm_s ≈ cold_first_s would mean a genuine
  * regression. Not part of the driver contract.
  * Usage: runMain graft.BpeAb [sfDir]
  */
object BpeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }
    val coldFirst = time(SparkEntry.queries("bpe_train")(spark, sfDir).count())
    val memoWarm = time(SparkEntry.queries("bpe_train")(spark, sfDir).count())
    // broad JVM warmup: the query mix that used to run BEFORE
    // bpe_train in the pre-memoization alphabetical pass
    Seq("q1_agg", "q3_join", "text_tokens", "text_ngram_stats",
      "dedup_minhash", "chunk_documents")
      .foreach(q => SparkEntry.queries(q)(spark, sfDir).count())
    // memo-cold + JVM-warm: same corpus under a different dir key
    val copy = java.nio.file.Files.createTempDirectory("graft-bpe-ab").toString
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(sfDir), new java.io.File(copy))
    val warmJvm = time(SparkEntry.queries("bpe_train")(spark, copy).count())
    println(f"""{"metric":"bpe_ab","cold_first_s":$coldFirst%.2f,"warm_jvm_s":$warmJvm%.2f,"memo_warm_s":$memoWarm%.2f,"sf":"$sfDir"}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(copy))
    spark.stop()
  }
}
