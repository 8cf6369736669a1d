package graft

import graft.core.Tables
import graft.index.NswIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only instrument for the round-15 NSW knob wiring (VERDICT r14
  * #2): on a given embeddings dir — the 10× replica is the target —
  * builds the LSH graph once and measures recall@10 + warm wall for
  * the beam walk at the static floor (16), the corpus-derived auto
  * width ([[NswIndex.beamFor]]), and two wider points, so the auto
  * default's recall at scale is a MEASURED ≥-bar claim, not an
  * extrapolation. The Tune/ScaleCurve convention: not driver-facing.
  */
object NswProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    // SPARK_GRAFT_CONF="k=v;k=v" (the ScaleCurve convention): sweep
    // the graph knobs (degree/hops/beam confs) without a code edit
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .config(extra)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding").cache()
    val n = emb.count()
    val qMod = math.max(1L, n / 100L)
    val queries = emb.filter(pmod($"vec_id", lit(qMod)) === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec")).cache()
    println(s"NSWPROBE dir=$dir n=$n queries=${queries.count()} " +
      s"autoBeam=${NswIndex.beamFor(spark, n)} " +
      s"autoHops=${NswIndex.hopsFor(spark, n)} " +
      s"autoDegree=${NswIndex.degreeFor(spark, n)}")

    def neighborSets(df: DataFrame, kk: Int): Map[Long, Set[Long]] =
      df.filter(col("rank") <= kk).collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    def recall(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double = {
      val per = want.map { case (q, w) =>
        got.getOrElse(q, Set.empty).intersect(w).size.toDouble / w.size }
      per.sum / per.size
    }
    val brute = neighborSets(graft.operators.KnnSearch.topK(
      emb.crossJoin(broadcast(queries))
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(
            graft.functions.vectors.cosineSim($"embedding", $"q_vec"))
            .as("score_e6")),
      10, asc = false), 10)

    val t0 = System.nanoTime()
    val edges = NswIndex.buildEdgesLsh(emb).localCheckpoint(true)
    println(f"NSWPROBE lsh build ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"edges=${edges.count()}")

    val autoBeam = NswIndex.beamFor(spark, n)
    for (b <- Seq(16, autoBeam, 24, 32).distinct.sorted) {
      def run(): (Double, Double) = {
        val t = System.nanoTime()
        val got = neighborSets(
          NswIndex.beamSearch(emb, edges, queries, k = 10, beamW = b), 10)
        ((System.nanoTime() - t) / 1e9, recall(got, brute))
      }
      run() // warm plans/caches
      val (dt, r) = run()
      val tag = if (b == autoBeam) " (auto)" else ""
      println(f"NSWBEAM beam=$b%-3d$tag%-7s warmSec=$dt%.2f recall@10=$r%.3f")
    }
    spark.stop()
  }
}
