package graft.index

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import graft.operators.KnnSearch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH — the 100 TB similarity-search path.
  *
  * Every vector gets a `nBits`-bit bucket id (sign of the dot product
  * with `nBits` fixed pseudo-random hyperplanes). Search probes the
  * query's bucket plus all single-bit-flip neighbors (multi-probe),
  * so the candidate set is bucket-local: the big table is hit with an
  * equality join on `bucket`, a linear shuffle — never a full scan
  * per query, never n². Bucket skew is bounded by the bit count and
  * AQE's skew split.
  *
  * Hyperplanes are seed-fixed (deterministic across runs/engines) and
  * broadcast as literals into the plan.
  */
object LshIndex {

  val defaultTables = 4

  /** Bit depth must scale with corpus size — a constant bucket count
    * means unbounded bucket size at 100 TB. `ceil(log2(n /
    * targetBucket))` keeps the expected bucket population near
    * `targetBucket` at any n (search wants small buckets + many
    * probes; graph builds want larger buckets for candidate
    * coverage — pick `targetBucket` accordingly). */
  def adaptiveBits(n: Long, targetBucket: Int): Int =
    math.max(2, math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** Seed-fixed hyperplanes: dim × nBits floats in [-0.5, 0.5). */
  def planes(dim: Int, nBits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextFloat() - 0.5f))
  }

  /** Bucket id column: bit p = (dot(v, plane_p) >= 0). Each plane is
    * ONE array literal (`typedlit`), not 64 scalar literals — the
    * compact expression tree matters: CacheManager canonicalizes
    * every query plan against every cached plan, and a
    * 64-literals-per-plane tree (×bits ×tables) made late-session
    * planning cost seconds per action. */
  def bucketOf(v: Column, ps: Array[Array[Float]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      val plane = typedlit(p)
      when(dotProduct(v, plane) >= 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table salted candidate pairs over a (vec_id, embedding)
    * frame — the shared candidate generator for the NSW graph build
    * and LSH-bucketed near-dup: all tables' buckets in one pass
    * (posexplode), ONE self-join on (table, bucket, salt). Hot
    * buckets (sign-LSH cannot split near-codirectional vectors, so a
    * clustered corpus piles into one bucket per table) are salted
    * into ceil(size/cap) deterministic sub-buckets, bounding the
    * candidate count at n·cap·tables on ANY data. Emits both (a,b)
    * and (b,a); callers dedup/orient as needed. */
  def saltedCandidatePairs(emb: DataFrame, nTables: Int, nBits: Int,
      bucketCap: Int, seedBase: Long,
      dim: Int = graft.embed.Embedder.DefaultDim): DataFrame = {
    // `dim` must match the embedding width: DotProduct truncates to
    // the shorter operand, so an undersized plane would silently hash
    // on a prefix of the vector.
    val bucketCols = (0 until nTables).map { t =>
      bucketOf(col("embedding"), planes(dim, nBits, seed = seedBase + t))
    }
    // cache() the tagged rows: the sizes aggregate, the join probe,
    // and both self-join sides reference them, and each reference
    // would otherwise recompute the nTables × nBits hyperplane dot
    // products per row. Evictable cache, not a checkpoint — same
    // rationale as the substringSpans span table: plain (long, int,
    // long) rows, recomputable under memory pressure.
    val tagged = emb.select(col("vec_id"),
      posexplode(array(bucketCols: _*)).as(Seq("t", "bucket")))
      .cache()
    // Bucket sizes via groupBy + equi-join, NOT a window: salting
    // exists precisely for corpora where one bucket holds a large
    // fraction of the table, and `count().over(partitionBy(t,
    // bucket))` would shuffle that entire hot bucket into ONE task
    // before the salt can split it. The aggregate is one row per
    // (table, bucket) — tiny — so AQE broadcasts it and the join adds
    // no shuffle of the tagged rows.
    val sizes = tagged.groupBy(col("t"), col("bucket"))
      .agg(count(lit(1)).as("bsize"))
    val salted = tagged.join(sizes, Seq("t", "bucket"))
      .withColumn("salt", pmod(hash(col("vec_id"), col("t")),
        greatest(lit(1L), ceil(col("bsize") / lit(bucketCap)).cast("long"))))
      .drop("bsize")
    salted.as("x").join(salted.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.salt") === col("y.salt") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"))
  }

  /** `ann_lsh_bucketed`: bucketed ANN for the fixed query set —
    * `defaultTables` independent hash tables (standard LSH recall
    * amplification), each probed at the query bucket plus all
    * single-bit flips. Candidates are deduped before top-k. Rows-only
    * check (+ recall spec). */
  def annLshBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val embRaw = Tables.embeddings(spark, dir)
    // search wants small buckets (≈8) amplified by many probes+tables
    val nBits = adaptiveBits(embRaw.count(), targetBucket = 8)
    val flips = array((lit(0L) +: (0 until nBits).map(i => lit(1L << i))): _*)
    // planes must span the full embedding width (DotProduct truncates
    // to the shorter operand — an undersized plane silently hashes a
    // prefix), so the dim tracks the embedder like saltedCandidatePairs
    val scoredPerTable = (0 until defaultTables).map { t =>
      val ps = planes(graft.embed.Embedder.DefaultDim, nBits, seed = 42L + t)
      val emb = embRaw.select($"vec_id", $"embedding",
        bucketOf($"embedding", ps).as("bucket"))
      val probed = emb.filter($"vec_id" < 5)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"bucket".as("q_bucket"),
          explode(flips).as("flip"))
        .select($"q_id", $"q_vec", $"q_bucket".bitwiseXOR($"flip").as("bucket"))
      emb.join(broadcast(probed), Seq("bucket"))
        .select($"q_id", $"vec_id".as("neighbor_id"),
          Stab.e6(cosineSim($"embedding", $"q_vec")).as("score_e6"))
    }
    // same (q_id, neighbor) from different tables scores identically →
    // distinct is an exact dedup
    val scored = scoredPerTable.reduce(_ unionByName _).distinct()
    KnnSearch.topK(scored, 10, asc = false)
  }
}
