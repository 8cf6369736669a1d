package graft

import graft.core.Tables
import graft.index.{IvfIndex, LshIndex, NswIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only parameter sweep for the ANN recall bars: prints IVF
  * recall@10 across (k, nProbe) and NSW-LSH edge agreement across
  * (tables, bits, refine rounds) so the index defaults are chosen
  * from measurement, not guesses. Not part of the driver contract. */
object Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir).cache()
    val nVec = emb.count()
    println(s"TUNE n=$nVec dir=$sfDir")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec")).cache()
    queries.count()

    def neighborSets(df: DataFrame, k: Int): Map[Long, Set[Long]] =
      df.filter(col("rank") <= k).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    def recall(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double = {
      val per = want.map { case (q, w) =>
        got.getOrElse(q, Set.empty).intersect(w).size.toDouble / w.size }
      per.sum / per.size
    }

    val brute = neighborSets(
      SparkEntry.queries("knn_brute_cosine")(spark, sfDir), 10)

    for (init <- Seq("k-means||", "random"); nProbe <- Seq(10, 11, 12)) {
      val t0 = System.nanoTime()
      val built = IvfIndex.build(spark, emb, initMode = init)
      built.assigned.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val r = recall(neighborSets(IvfIndex.search(built, queries, nProbe = nProbe), 10), brute)
      println(f"IVF init=$init%-10s nProbe=$nProbe%-3d buildSec=$dt%.2f recall=$r%.3f")
    }

    val exact = NswIndex.buildEdges(emb).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    for ((t, b, rounds) <- Seq((6, 3, 2), (8, 3, 2), (10, 3, 2))) {
      val lsh = NswIndex.buildEdgesLsh(emb, nTables = t, nBits = b, refineRounds = rounds)
        .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
      val agree = lsh.intersect(exact).size.toDouble / exact.size
      println(f"NSWLSH tables=$t%-2d bits=$b rounds=$rounds agree=$agree%.3f")
    }

    // Hops-cap sweep (VERDICT r6 #7): with the convergence cuts, a
    // higher cap should cost nothing once the beam converges — measure
    // whether recall moves and what the warm batch serve pays.
    val brute5 = neighborSets(
      SparkEntry.queries("knn_brute_cosine")(spark, sfDir), 5)
    val edgesLsh = NswIndex.buildEdgesLsh(emb).localCheckpoint(true)
    for (h <- Seq(4, 6, 8, 10, 12)) {
      def run(): (Double, Double) = {
        val t0 = System.nanoTime()
        val got = neighborSets(
          NswIndex.beamSearch(emb, edgesLsh, queries, maxHops = h), 5)
        ((System.nanoTime() - t0) / 1e9, recall(got, brute5))
      }
      run() // warm the plan/caches once
      val (dt, r) = run()
      println(f"NSWHOPS maxHops=$h%-3d warmSec=$dt%.2f recall@5=$r%.3f")
    }
    spark.stop()
  }
}
