package graft

import graft.core.Tables
import graft.index.NswIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only instrument for the NSW BUILD slope (VERDICT r15 #6 /
  * r16 #6): wall clock of the LSH + NN-descent graph build
  * ([[NswIndex.buildEdgesLsh]]) at the corpus-derived auto degree,
  * across replica scales — is the build super-linear in n? Prints
  * one line per dir: n, auto degree, build wall, edge count, and the
  * wall/n slope against the previous point. Not driver-facing.
  * Usage: runMain graft.NswBuildSlope dir1 [dir2 ...]
  */
object NswBuildSlope {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var prev: Option[(Long, Double)] = None
    dirs.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val n = emb.count()
      val deg = NswIndex.degreeFor(spark, n)
      val t0 = System.nanoTime()
      val edges = NswIndex.buildEdgesLsh(emb).localCheckpoint(true)
      val nEdges = edges.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val slope = prev.map { case (pn, pw) =>
        f" slope_vs_prev=${(wall / pw) / (n.toDouble / pn)}%.2f" }.getOrElse("")
      println(f"NSWBUILDSLOPE dir=$dir n=$n deg=$deg wall=$wall%.1f s " +
        s"edges=$nEdges$slope")
      graft.core.Checkpoints.free(edges)
      graft.core.Checkpoints.free(emb)
    }
    spark.stop()
  }
}
