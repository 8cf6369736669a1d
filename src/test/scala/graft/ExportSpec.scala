package graft

import graft.operators.Libraries
import org.scalatest.funsuite.AnyFunSuite

/** `export_manifest` vs an INDEPENDENT plain-Scala recomputation of
  * the whole manifest (regex tokenizer → doc_id-ordered cumsum →
  * floor shard assignment → MessageDigest 60-bit XOR fingerprints) at
  * sf0.001 — the written-files manifest must equal the from-source
  * derivation exactly, and the shards must partition the corpus.
  */
class ExportSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("export_manifest matches the independent from-source manifest") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def nTokens(s: String): Long =
      s.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong
    var cum = 0L
    val rows = docs.map { case (id, text) =>
      val n = nTokens(text)
      cum += n
      val shard = math.max(0L, ((cum - 1) / 2000.0).toLong)
      (shard, id, n, hash60(text))
    }
    val want = rows.groupBy(_._1).toSeq.map { case (shard, rs) =>
      (shard, rs.length.toLong, rs.map(_._3).sum,
        rs.map(_._2).min, rs.map(_._2).max,
        rs.map(_._4).reduce(_ ^ _))
    }.sortBy(_._1)
    val got = Libraries.exportManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the shards partition the corpus: counts sum to |docs| and the
    // shard ids are the consecutive prefix 0..max
    assert(got.map(_._2).sum == docs.length.toLong)
    assert(got.map(_._1) == (0L until got.length.toLong))
  }
}
