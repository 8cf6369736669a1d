package graft

import graft.dedup.Dedup
import graft.operators.{AnalyticsExtra, GraphOps, TpchExtra}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave: graph_pagerank, stats_corr, dedup_containment and
  * q12_shipmode vs INDEPENDENT plain-Scala recomputations at
  * sf0.001 — the pagerank recurrence replayed over an adjacency map,
  * the correlation matrix from BigInt moments, containment top-5
  * from raw shingle sets, and the Q12 split from collected rows.
  */
class GraphCorrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def e6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  test("graph_pagerank replays the integer recurrence over the pair graph") {
    // pairs from the (separately specced) minhash candidates
    val pairs = Dedup.minhash(spark, dir)
      .filter($"est_jaccard_e6" >= GraphOps.minEstJaccardE6)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs.map { case (a, b) => (a, b) } ++
      pairs.map { case (a, b) => (b, a) }).groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._2).toSeq }
    val deg = adj.map { case (s, ds) => s -> ds.size.toLong }
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    (1 to GraphOps.iterations).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (src, dsts) =>
        val c = rank(src) / deg(src) // truncating, non-negative ⇒ ≡ div
        dsts.foreach(d => in(d) += c)
      }
      rank = deg.map { case (n, _) => n -> (150000L + 85L * in(n) / 100L) }
    }
    val want = deg.keys.toSeq.sorted.map(n => (n, deg(n), rank(n)))
    val got = GraphOps.graphPagerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
    // damped ranks stay within the theoretical band
    assert(got.forall { case (_, _, rk) => rk >= 150000L && rk <= 1000000L * deg.size })
  }

  test("stats_corr matches BigInt-moment recomputation") {
    val feats = spark.read.parquet(s"$dir/documents.parquet")
      .select($"n_chars", $"text").collect()
      .map { r =>
        val t = tokens(r.getString(1))
        (r.getLong(0), t.size.toLong, t.distinct.size.toLong)
      }
    val cols = Map(
      "chars" -> feats.map(_._1), "tokens" -> feats.map(_._2),
      "types" -> feats.map(_._3))
    val n = BigInt(feats.length)
    def corr(a: String, b: String): Long = {
      val (xa, xb) = (cols(a), cols(b))
      val sx = xa.map(BigInt(_)).sum; val sy = xb.map(BigInt(_)).sum
      val sxx = xa.map(v => BigInt(v) * v).sum
      val syy = xb.map(v => BigInt(v) * v).sum
      val sxy = xa.zip(xb).map { case (x, y) => BigInt(x) * y }.sum
      val num = (n * sxy - sx * sy).toDouble
      val va = (n * sxx - sx * sx).toDouble
      val vb = (n * syy - sy * sy).toDouble
      e6(num / (math.sqrt(va) * math.sqrt(vb)))
    }
    val want = Seq(
      ("chars", "tokens", feats.length.toLong, corr("chars", "tokens")),
      ("chars", "types", feats.length.toLong, corr("chars", "types")),
      ("tokens", "types", feats.length.toLong, corr("tokens", "types")))
    val got = AnalyticsExtra.statsCorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // chars and tokens of the same generator are strongly correlated
    assert(got.head._4 > 900000L)
  }

  test("dedup_containment top-5 matches shingle-set recomputation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet).toMap
    val want = docs.keys.filter(_ % 100 == 0).toSeq.sorted.flatMap { qid =>
      val qs = docs(qid)
      val cands = docs.toSeq.filter(_._1 != qid).flatMap { case (did, ds) =>
        val shared = (qs & ds).size
        if (shared == 0) None
        else Some((did, shared.toLong, qs.size.toLong, ds.size.toLong,
          e6(shared.toDouble / qs.size), e6(shared.toDouble / ds.size)))
      }
      cands.sortBy { case (did, _, _, _, cq, cd) => (-cq, -cd, did) }
        .take(5).zipWithIndex.map { case ((did, sh, nq, nd, cq, cd), i) =>
          (qid, (i + 1).toLong, did, sh, nq, nd, cq, cd)
        }
    }
    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q12_shipmode matches collected recomputation") {
    // NTZ-safe: epoch millis via the UTC session cast (value-exact)
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", unix_millis($"o_orderdate".cast("timestamp")),
        $"o_orderpriority").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val t96 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime
    val t97 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_returnflag",
        unix_millis($"l_shipdate".cast("timestamp"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hi = Set("1-URGENT", "2-HIGH")
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((0L, 0L))
    li.foreach { case (ok, rf, ship) =>
      if ((rf == "A" || rf == "R") && ship >= t96 && ship < t97) {
        val (odate, pri) = ord(ok)
        if (ship > odate + 60L * 86400000L) {
          val (h, l) = agg(rf)
          agg(rf) = if (hi(pri)) (h + 1, l) else (h, l + 1)
        }
      }
    }
    val want = agg.toSeq.sortBy(_._1).map { case (rf, (h, l)) => (rf, h, l) }
    val got = TpchExtra.q12Shipmode(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
  }
}
