package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query runner: executes named `SparkEntry.queries`
  * against a data dir with per-query markers, so log output (task
  * binary sizes, shuffle warnings, timings) can be attributed to one
  * query. Not part of the driver contract.
  * Usage: runMain graft.RunQ <sfDir> <query> [query ...]
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      println(s"===== RUNQ BEGIN $name =====")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"===== RUNQ END   $name  ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n =====")
    }
    spark.stop()
  }
}
