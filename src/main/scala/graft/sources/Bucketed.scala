package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage layout — the co-located-join path for tables that
  * are joined on the same key again and again (documents ⋈ chunks on
  * `doc_id`, vectors ⋈ edges on `vec_id`).
  *
  * `bucketBy(n, key)` hashes rows into n files per partition ON
  * WRITE; a join of two tables bucketed the same way reads
  * bucket-aligned splits and needs NO Exchange on either side — at
  * 100 TB that converts the dominant repeated cost (shuffling the
  * fact table per join) into a one-time write-layout cost. The
  * tradeoff is a fixed bucket count: pick n ≈ table-size /
  * target-split (and re-bucket when the table outgrows it).
  */
object Bucketed {

  /** Write `df` as a bucketed table registered in the session
    * catalog (external parquet at `path`). */
  def write(df: DataFrame, table: String, path: String, key: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With aligned
    * bucket counts the physical plan is a sort-merge join with zero
    * Exchange operators (verified by BucketedSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
