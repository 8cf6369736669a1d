package graft.index

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import graft.operators.KnnSearch
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index: the Spark re-expression of the
  * reference's `IVFIndex` (/root/reference/src/models/ivf_index.py) —
  * sklearn KMeans becomes MLlib KMeans at build time; the per-query
  * "probe the n nearest centroids, brute-force only those clusters"
  * (ivf_index.py:139-185) becomes a centroid-ranked semi-join.
  *
  * Scale shape (100 TB): KMeans trains on a bounded sample; cluster
  * assignment is a broadcast map over one scan; the persisted layout
  * is `partitionBy(cluster_id)` so a probe is a partition-pruned read
  * of n_probe/k of the data. The search never shuffles the vectors
  * table: centroids (tiny) broadcast to the queries, the probe pairs
  * (q_id × n_probe rows) broadcast to the vectors.
  */
object IvfIndex {

  val defaultK = 16
  // The reference probes 3 of 100 clusters (ivf_index.py:158); with
  // k=16 here, 4 probes ≈ the same scanned fraction / recall balance.
  val defaultNProbe = 4

  case class Built(assigned: DataFrame, centroids: DataFrame)

  /** Session-scoped index memo: the reference builds each index once
    * and serves all queries from it (main.py:35-40 add_index);
    * rebuilding a KMeans fit per query would be the one thing slower
    * than the reference. Keyed by source dir. */
  private val builtCache =
    new java.util.concurrent.ConcurrentHashMap[String, Built]()

  def buildCached(spark: SparkSession, dir: String): Built =
    builtCache.computeIfAbsent(dir, _ => {
      val b = build(spark, Tables.embeddings(spark, dir))
      Built(b.assigned.cache(), b.centroids)
    })

  /** Train centroids (on a sample at scale; whole table here) and
    * assign each vector its cluster id. */
  def build(spark: SparkSession, emb: DataFrame, k: Int = defaultK,
      seed: Long = 42L): Built = {
    import spark.implicits._
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(feat)
    val assigned = model.transform(feat)
      .select($"vec_id", $"embedding", $"prediction".cast("int").as("cluster_id"))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }).toDF("cluster_id", "centroid")
    Built(assigned, centroids)
  }

  /** Probe search: rank centroids per query, keep nProbe, semi-join
    * into the assigned table (partition-pruned at scale), brute-force
    * cosine within the probed clusters, top-k. */
  def search(built: Built, queries: DataFrame, nProbe: Int = defaultNProbe,
      k: Int = 10): DataFrame = {
    val probes = queries.crossJoin(broadcast(built.centroids))
      .withColumn("cdist", l2Distance(col("q_vec"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cdist").asc, col("cluster_id").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cluster_id"))
    val scored = built.assigned.join(broadcast(probes), Seq("cluster_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Stab.e6(cosineSim(col("embedding"), col("q_vec"))).as("score_e6"))
    KnnSearch.topK(scored, k, asc = false)
  }

  /** Persist the index in its scale layout: the vectors table
    * partitioned by `cluster_id` (a probe then reads n_probe/k of the
    * files) plus the tiny centroids table. */
  def persist(built: Built, path: String): Unit = {
    built.assigned.write.mode("overwrite")
      .partitionBy("cluster_id").parquet(s"$path/vectors")
    built.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe search against a persisted layout. The probe pairs are
    * broadcast into a join on the partition column, so Spark's
    * dynamic partition pruning restricts the scan to the probed
    * `cluster_id=` directories instead of the whole index. */
  def searchPersisted(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int = defaultNProbe, k: Int = 10): DataFrame = {
    val built = Built(
      assigned = spark.read.parquet(s"$path/vectors"),
      centroids = spark.read.parquet(s"$path/centroids"))
    search(built, queries, nProbe, k)
  }

  /** `ivf_build` query: cluster histogram (k rows). Rows-only check —
    * DuckDB has no KMeans; the ScalaTest spec asserts recall against
    * brute force instead. */
  def ivfBuild(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val built = buildCached(spark, dir)
    built.assigned.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy($"cluster_id")
  }

  /** `ivf_search` query: probe search for the fixed query set. */
  def ivfSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val built = buildCached(spark, dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    search(built, queries)
  }
}
