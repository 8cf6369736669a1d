package graft

import graft.operators.Libraries
import org.scalatest.funsuite.AnyFunSuite

/** `sample_reservoir` vs an INDEPENDENT recomputation (MessageDigest
  * md5 → 60-bit uniform → Math.log exponential keys → top-k), plus
  * the statistical property the method exists for: weighted
  * inclusion — the sampled docs must be longer on average than the
  * corpus.
  */
class ReservoirSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sample_reservoir matches the independent exponential-keys top-k") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, nc) =>
      val h = java.lang.Long.parseLong(md5hex(s"rsv:$id").take(15), 16)
      val u = (h.toDouble + 1.0) / 1152921504606846976.0
      val key = math.floor(math.log(u) / math.max(nc, 1L).toDouble * 1000000.0 + 0.5).toLong
      (id, nc, key)
    }
    val want = keyed.sortBy { case (id, _, k) => (-k, id) }.take(100).toSeq
    val got = Libraries.sampleReservoir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // weighted inclusion: the A-ES keys favor heavy (long) docs
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
