package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's persistence format as a Spark source/sink: each
  * collection is a directory of JSON records
  * (/root/reference/src/models/collection.py:27-100 writes one JSON
  * file per record; main.py:33-44 mounts three such collections).
  *
  * Spark's JSON source reads a whole directory of record files as one
  * DataFrame, so migrating a reference deployment is
  * `importRecords(dir)` → parquet/bucketed layout; `exportRecords`
  * writes JSON-lines back for tools that still expect the JSON form.
  * An explicit schema keeps the read single-pass (no inference scan)
  * and stable when a directory is empty or a record is missing
  * fields.
  */
object JsonRecords {

  /** Read a directory of JSON record files (one object per file, the
    * reference layout — or JSON-lines; Spark handles both). */
  def importRecords(spark: SparkSession, dir: String, schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema).option("multiLine", multiLine).json(dir)

  /** Write records as JSON lines (the batch-friendly export shape —
    * n files, not one file per record; a downstream consumer of the
    * reference's per-record files reads these identically). */
  def exportRecords(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(dir)
}
