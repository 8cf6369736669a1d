package graft

import graft.functions.{bits, HammingWords, PackSignBits}
import graft.index.BqIndex
import graft.operators.KnnSearch
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Binary quantization: the PackSignBits/HammingWords expressions'
  * interpreted and codegen paths must agree with an independent plain
  * -Scala reimplementation — including boundary values (strict `>`),
  * lengths not divisible by 32, empty and mismatched inputs — and the
  * end-to-end Hamming-prerank + exact-rerank serve must clear a
  * measured recall@10 bar vs the exact brute cosine scan, with a
  * hamming-0 exact self-hit at rank 1.
  */
class BqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- independent reference implementation (no shared code) ----------

  private def refPack(v: Array[Float], thr: Array[Double]): Array[Long] = {
    val n = math.min(v.length, thr.length)
    val out = new Array[Long]((n + 31) / 32)
    (0 until n).foreach { i =>
      if (v(i).toDouble > thr(i)) out(i / 32) |= 1L << (i % 32)
    }
    out
  }

  private def refHamming(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum

  private val rng = new scala.util.Random(11L)
  private def randVec(d: Int): Array[Float] = Array.fill(d)(rng.nextFloat() * 2f - 1f)

  test("PackSignBits: interpreted, codegen, and the reference impl agree") {
    val thr = Array.fill(64)(rng.nextDouble() * 0.5 - 0.25)
    val vecs: Seq[Array[Float]] = Seq(
      randVec(64), randVec(64),
      randVec(40),                  // not a multiple of 32
      randVec(3),                   // shorter than one word
      Array[Float](),               // empty
      thr.map(_.toFloat))           // ≈boundary values (strict > decides)
    val expected = vecs.map(refPack(_, thr))
    val got = vecs.zipWithIndex.map { case (v, i) => (i, v, thr) }
      .toDF("i", "v", "t")
      .select($"i", bits.packSignBits($"v", $"t").as("sig"))
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Long](1).toArray)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.sameElements(e), s"codegen row $i: ${g.toSeq} != ${e.toSeq}")
    }
    vecs.zip(expected).foreach { case (v, e) =>
      val out = PackSignBits(
        Literal.create(v, ArrayType(FloatType)),
        Literal.create(thr, ArrayType(DoubleType)))
        .eval(null).asInstanceOf[ArrayData].toLongArray()
      assert(out.sameElements(e), s"interpreted: ${out.toSeq} != ${e.toSeq}")
    }
  }

  test("PackSignBits is strict: a value equal to its threshold stays 0") {
    val thr = Array(0.5, -0.5)
    val v = Array(0.5f, -0.5f) // exactly representable, so == threshold
    val out = PackSignBits(
      Literal.create(v, ArrayType(FloatType)),
      Literal.create(thr, ArrayType(DoubleType)))
      .eval(null).asInstanceOf[ArrayData].toLongArray()
    assert(out.sameElements(Array(0L)))
  }

  test("HammingWords: interpreted, codegen, and the reference impl agree") {
    val pairs: Seq[(Array[Long], Array[Long])] = Seq(
      (Array(0L, 0L), Array(-1L, -1L)),             // all 128 bits differ
      (Array(0x5555555555555555L), Array(0xAAAAAAAAAAAAAAAAL)),
      (Array(7L, 9L), Array(7L, 9L)),               // identical → 0
      (Array(1L, 2L, 4L), Array(1L)),               // mismatched length: min
      (Array[Long](), Array[Long]()))               // empty → 0
    val expected = pairs.map { case (a, b) =>
      refHamming(a.take(math.min(a.length, b.length)),
        b.take(math.min(a.length, b.length)))
    }
    val got = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select($"i", bits.hammingWords($"a", $"b").as("h"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(got.toSeq == expected)
    pairs.zip(expected).foreach { case ((a, b), e) =>
      val out = HammingWords(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null)
      assert(out == e)
    }
  }

  test("knn_brute_bq: recall@10 vs exact brute cosine, exact self-hit") {
    val dir = SparkTestSession.sf
    val exact = KnnSearch.bruteCosine(spark, dir)
      .select($"q_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val bq = BqIndex.knnBruteBq(spark, dir).collect()
    val got = bq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got.keySet == exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      (got(q) & ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.80, s"mean recall@10 $mean below the measured bar")
    // rank-1 is the query itself: hamming 0 against its own signature
    // and an exact 1.0 stabilized cosine
    bq.filter(_.getLong(4) == 1L).foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"rank-1 not self: $r")
      assert(r.getLong(2) == 0L, s"self hamming nonzero: $r")
      assert(r.getLong(3) == 1000000L, s"self cosine not exact: $r")
    }
  }

  test("ivf_search_bq: recall@10 vs exact brute cosine") {
    val dir = SparkTestSession.sf
    val exact = KnnSearch.bruteCosine(spark, dir)
      .select($"q_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = BqIndex.ivfSearchBq(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(got.keySet == exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      (got(q) & ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.80, s"mean recall@10 $mean below the measured bar")
    // every query returns exactly k ranked hits
    assert(got.values.forall(_.size == 10))
  }
}
