package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.Normalizer
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where does an 8-second KMeans fit on 2,000 rows go?
  * Times the fit's stages under different partitionings of the train
  * input. Not part of the driver contract.
  * Usage: runMain graft.KmProbe [sfDir]. */
object KmProbe {
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
      println(f"KMPROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val feat = new Normalizer().setInputCol("raw_features")
      .setOutputCol("features").setP(2.0)
      .transform(emb.withColumn("raw_features", array_to_vector(col("embedding"))))
    time("feat_count") { feat.count() }
    println(s"KMPROBE partitions = ${feat.rdd.getNumPartitions}")
    def fit(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val m = time(s"fit_$label") {
        new KMeans().setK(16).setSeed(42L).setFeaturesCol("features")
          .setInitMode("random").fit(df)
      }
      println(s"KMPROBE   first center head = ${m.clusterCenters.head.toArray.take(3).mkString(",")}")
    }
    fit("cold_default", feat)
    fit("warm_default", feat)
    fit("coalesce1", feat.coalesce(1))
    fit("repart4", feat.repartition(4))
    val cached = feat.cache(); cached.count()
    fit("cached_default", cached)
    fit("cached_again", cached)
    // transform (assignment) cost on the full table
    val model = new KMeans().setK(16).setSeed(42L).setFeaturesCol("features")
      .setInitMode("random").fit(cached)
    time("transform_count") { model.transform(feat).count() }
    spark.stop()
  }
}
