package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed collection with the reference's CRUD semantics
  * (/root/reference/src/models/collection.py):
  *
  *  - `add`/`update` → [[upsert]]: update-else-insert on the key;
  *    `created_at_ms` of existing rows is preserved, `updated_at_ms`
  *    bumps to the batch time (collection.py:121-155 does this one
  *    record at a time; here it is one anti-join + union for the
  *    whole batch).
  *  - `delete` → [[delete]]: left-anti join on the key set.
  *  - Uniqueness comes from the key column, not one-file-per-record
  *    (collection.py:58-60) — at 100 TB the store would be
  *    `partitionBy(bucket(key))` and upserts rewrite only touched
  *    partitions; the algebra is identical.
  *
  * Writes go to a staging dir then swap via rename, so a failed job
  * never corrupts the current snapshot (the reference's
  * write-then-verify-then-cleanup, collection.py:86-110).
  */
class CollectionStore(spark: SparkSession, path: String, keyCol: String) {
  import spark.implicits._

  def load(): DataFrame = spark.read.parquet(path)

  def isEmpty: Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(new Path(path))
  }

  /** Atomically replace the snapshot with `df`, and bump the path's
    * index version so memoized indexes/sketches over this data rebuild
    * on their next lookup (stale-read prevention — the reference sees
    * every write because it rebuilds per search,
    * collection.py:195-200). */
  private def swapIn(df: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    val target = new Path(path)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(staging, target)
    IndexVersions.bump(path)
  }

  /** Update-else-insert `batch` (must carry `keyCol` plus payload
    * columns). `nowMs` is the logical batch timestamp. */
  def upsert(batch: DataFrame, nowMs: Long): Unit = {
    val stamped = batch
      .withColumn("created_at_ms", lit(nowMs))
      .withColumn("updated_at_ms", lit(nowMs))
    if (isEmpty) {
      swapIn(stamped)
    } else {
      val current = load()
      // existing keys keep their created_at_ms (reference preserves
      // created_at on update, collection.py:135-138)
      val createdAt = current.select(col(keyCol), col("created_at_ms").as("_created"))
      val updated = stamped.drop("created_at_ms")
        .join(createdAt, Seq(keyCol), "left")
        .withColumn("created_at_ms", coalesce(col("_created"), lit(nowMs)))
        .drop("_created")
        .select(stamped.columns.map(col).toIndexedSeq: _*)
      val kept = current.join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
      swapIn(kept.unionByName(updated))
    }
  }

  /** Partial update with column-merge semantics: for keys present in
    * `batch`, non-null batch columns overwrite and null columns keep
    * the stored value (the reference's `update` ignores `None` fields
    * and preserves `id`/`created_at` — collection.py:134-142).
    * Unknown keys are ignored (update, not upsert); `updated_at_ms`
    * bumps only for touched rows. */
  def updateMerge(batch: DataFrame, nowMs: Long): Unit = {
    if (isEmpty) return
    val current = load()
    val payload = batch.columns.filter(_ != keyCol)
    // one update per key: a duplicate-key batch would multiply rows
    // through the inner join below, silently breaking the store's
    // one-row-per-key invariant (winner is arbitrary, as in the
    // reference's last-file-write-wins)
    val deduped = batch.dropDuplicates(keyCol)
    val renamed = payload.foldLeft(deduped)((d, c) => d.withColumnRenamed(c, s"_u_$c"))
    val touched = current.join(renamed, Seq(keyCol), "inner")
    val merged = payload.foldLeft(touched)((d, c) =>
        d.withColumn(c, coalesce(col(s"_u_$c"), col(c))))
      .withColumn("updated_at_ms", lit(nowMs))
      .select(current.columns.map(col).toIndexedSeq: _*)
    val untouched = current.join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
    swapIn(untouched.unionByName(merged))
  }

  /** Delete every row whose key appears in `keys`. */
  def delete(keys: DataFrame): Unit =
    if (!isEmpty) swapIn(load().join(keys.select(col(keyCol)), Seq(keyCol), "left_anti"))

  /** Reset: replace the whole snapshot with `seed` (the reference's
    * /reset cleans the data dir and reseeds, main.py:80-85 + 198-202
    * — one overwrite here). */
  def reset(seed: DataFrame, nowMs: Long): Unit =
    swapIn(seed
      .withColumn("created_at_ms", lit(nowMs))
      .withColumn("updated_at_ms", lit(nowMs)))

  def count(): Long = if (isEmpty) 0L else load().count()
}
