package graft

import graft.operators.SkewJoin
import graft.sources.JsonRecords
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("JSON records round-trip: export then import preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    JsonRecords.exportRecords(docs, dir)
    val back = JsonRecords.importRecords(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    val diff = docs.exceptAll(back).count() + back.exceptAll(docs).count()
    assert(diff == 0, s"$diff rows differ after JSON round-trip")
  }

  test("per-record JSON files (the reference layout) import as one DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json-rec")
    // three single-object files, one per record — collection.py:58-60
    Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2, "text": "beta"}""",
      """{"doc_id": 3, "text": "gamma"}""").zipWithIndex.foreach { case (s, i) =>
      java.nio.file.Files.write(dir.resolve(s"rec_$i.json"), s.getBytes("UTF-8"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = JsonRecords.importRecords(spark, dir.toString, schema)
    assert(df.count() == 3)
    assert(df.filter($"doc_id" === 2).select($"text").as[String].head() == "beta")
  }

  test("salted join matches the plain join on a skewed dataset") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000)
      .select($"id",
        when($"id" % 10 === 0, concat(lit("cold"), ($"id" % 7).cast("string")))
          .otherwise(lit("hot")).as("key"))
    val small = Seq(("hot", 1L), ("cold0", 10L), ("cold1", 11L), ("cold2", 12L),
      ("cold3", 13L), ("cold4", 14L), ("cold5", 15L), ("cold6", 16L))
      .toDF("key", "weight")
    val plain = big.join(small, Seq("key"))
      .agg(sum($"weight"), count(lit(1))).collect()(0)
    val salted = SkewJoin.saltedJoin(big, small, "key",
        bigSaltSource = $"id", buckets = 8)
      .agg(sum($"weight"), count(lit(1))).collect()(0)
    assert(salted == plain)
  }
}
