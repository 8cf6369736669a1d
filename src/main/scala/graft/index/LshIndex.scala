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
  * ride a broadcast consumed by the [[graft.functions.HyperplaneBuckets]]
  * expression — never plan literals (the literal encoding serialized
  * multi-MiB task binaries and scales with dim × bits × tables).
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

  /** All tables' planes as one broadcast, shaped [table][bit][dim] —
    * the single payload [[graft.functions.HyperplaneBuckets]] consumes.
    * Table `t` keeps its historical seed `seedBase + t`, so bucket ids
    * are bit-identical to the former per-table literal encoding. */
  private def planesBroadcast(spark: org.apache.spark.sql.SparkSession,
      nTables: Int, nBits: Int, seedBase: Long, dim: Int)
      : org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]] =
    spark.sparkContext.broadcast(
      Array.tabulate(nTables)(t => planes(dim, nBits, seed = seedBase + t)))

  /** A candidate-pair frame plus the handle that releases its cached
    * bucket-tagging scratch. The tagged rows are referenced by several
    * parts of the pair plan (sizes aggregate, salt join, both self-join
    * sides), so they are cached — callers MUST call `release()` once
    * the pairs (or anything derived from them) are materialized, or
    * the InMemoryRelation stays pinned for the session. */
  final case class CandidatePairs(pairs: DataFrame, release: () => Unit)

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
      dim: Int = graft.embed.Embedder.DefaultDim): CandidatePairs = {
    // `dim` must match the embedding width: the bucket expression's
    // dot product truncates to the shorter operand, so an undersized
    // plane would silently hash on a prefix of the vector.
    val bc = planesBroadcast(emb.sparkSession, nTables, nBits, seedBase, dim)
    // cache() the tagged rows: the sizes aggregate, the join probe,
    // and both self-join sides reference them, and each reference
    // would otherwise recompute the nTables × nBits hyperplane dot
    // products per row. Evictable cache, not a checkpoint — same
    // rationale as the substringSpans span table: plain (long, int,
    // long) rows, recomputable under memory pressure — and released
    // through the returned handle once the caller has materialized.
    val tagged = emb.select(col("vec_id"),
      posexplode(graft.functions.lsh.hyperplaneBuckets(col("embedding"), bc))
        .as(Seq("t", "bucket")))
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
    val pairs = salted.as("x").join(salted.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.salt") === col("y.salt") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src"), col("y.vec_id").as("dst"))
    CandidatePairs(pairs, () => { tagged.unpersist(); bc.unpersist() })
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
    // planes must span the full embedding width (the bucket dot
    // product truncates to the shorter operand — an undersized plane
    // silently hashes a prefix), so the dim tracks the embedder
    val bc = planesBroadcast(spark, defaultTables,
      nBits, seedBase = 42L, dim = graft.embed.Embedder.DefaultDim)
    // ONE corpus pass tags all tables' buckets (the expression emits
    // the whole array per row); the per-table candidate joins collapse
    // into a single equality join keyed by (table, bucket)
    // cache(): the probe derivation AND the corpus side of the
    // candidate join both read this frame — uncached, the corpus is
    // hyperplane-hashed twice per query
    val tagged = embRaw.select($"vec_id", $"embedding",
      posexplode(graft.functions.lsh.hyperplaneBuckets($"embedding", bc))
        .as(Seq("t", "bucket")))
      .cache()
    val flips = array((lit(0L) +: (0 until nBits).map(i => lit(1L << i))): _*)
    val probed = tagged.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"t",
        $"bucket".as("q_bucket"), explode(flips).as("flip"))
      .select($"q_id", $"q_vec", $"t", $"q_bucket".bitwiseXOR($"flip").as("bucket"))
    // same (q_id, neighbor) from different tables scores identically →
    // distinct is an exact dedup
    val scored = tagged.join(broadcast(probed), Seq("t", "bucket"))
      .select($"q_id", $"vec_id".as("neighbor_id"),
        Stab.e6(cosineSim($"embedding", $"q_vec")).as("score_e6"))
      .distinct()
    // materialize the (tiny) top-k, then release the scratch — the
    // same discipline as saltedCandidatePairs' release handle:
    // unreleased, each invocation pins one plane broadcast and one
    // corpus-tagging InMemoryRelation for the session
    val out = KnnSearch.topK(scored, 10, asc = false).localCheckpoint(true)
    tagged.unpersist()
    bc.unpersist()
    out
  }
}
