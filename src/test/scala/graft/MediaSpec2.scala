package graft

import graft.operators.{Media, MediaCodec}
import org.scalatest.funsuite.AnyFunSuite

/** mm_phash: the banded pair join is pinned against a driver-side
  * brute recompute; the hash itself against sensitivity/identity
  * properties a perceptual hash must hold. */
class PhashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("mm_phash pair table equals a brute banded-hamming recompute") {
    val hashed = Media.phashFrame(spark, sf)
      .as[(Long, Long)].collect().sortBy(_._1)
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(hashed.length == docs - 1, "corrupt row must drop from the hash frame")
    def bands(h: Long): Set[(Int, Long)] =
      (0 until 4).map(b => b -> ((h >>> (b * 16)) & 0xffffL)).toSet
    // the same degenerate-band df-cap the operator applies
    val pop = hashed.flatMap { case (_, h) => bands(h) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val live = (h: Long) => bands(h).filter(pop(_) <= Media.phashBucketCap)
    val expected = (for {
      i <- hashed.indices.iterator
      j <- (i + 1) until hashed.length
      (da, ha) = hashed(i); (db, hb) = hashed(j)
      if live(ha).intersect(live(hb)).nonEmpty
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= 6
    } yield (da, db, ham.toLong)).toSet
    val got = Media.mmPhashPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("phash64 is identity-stable and perturbation-sensitive") {
    val text = "the quick brown fox jumps over the lazy dog, repeatedly and at length"
    val d1 = MediaCodec.decode(MediaCodec.encode(text, 2)).get
    val d2 = MediaCodec.decode(MediaCodec.encode(text, 4)).get
    // frame 0 decides the hash: frame-count variants collide at hamming 0
    assert(MediaCodec.phash64(d1) == MediaCodec.phash64(d2))
    // a localized pixel perturbation moves FEW bits, not none, not many
    val px = d1.pixels.clone()
    var i = 0
    while (i < d1.width) { px(i) = 255.toByte; i += 1 } // repaint one row
    val hp = MediaCodec.phash64(MediaCodec.Decoded(d1.width, d1.height, d1.frames, px))
    val ham = java.lang.Long.bitCount(MediaCodec.phash64(d1) ^ hp)
    assert(ham > 0, "perceptual hash blind to a repainted row")
    assert(ham <= 16, s"localized edit moved $ham bits — hash not local")
    // golden pins: the Scala hash reproduces the independent Python values
    val pins = Map(0L -> 71777218556133369L, 7L -> 2251816993554240L, 123L -> 72057589759732160L)
    val sf001 = Media.phashFrame(spark, "/root/testdata/sf0.01")
      .as[(Long, Long)].collect().toMap
    pins.foreach { case (id, h) => assert(sf001(id) == h, s"pin drift for doc $id") }
  }

  test("mm_scene_cuts per-doc table matches a from-text recomputation; steps are bimodal") {
    // independent recompute: encode formula applied directly to the
    // raw text (never through MediaCodec), per-frame average hash,
    // successive steps, cut >= 8 — the golden_phash.py scenes logic
    def framePhash(b: Array[Byte], w: Int, h: Int, f: Int): Long = {
      val px = Array.tabulate(w * h)(i =>
        (((if (b.isEmpty) 0 else b(i % b.length) & 0xff) + 31 * f + i) % 256))
      val sums = new Array[Long](64); val counts = new Array[Long](64)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * 8 / h) * 8 + x * 8 / w
        sums(c) += px(y * w + x); counts(c) += 1
      }
      val means = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
      val mean = means.sum / 64.0
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (means(i) > mean) acc | (1L << i) else acc)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val allSteps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val want = docs.filter(_._1 != 13L).map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val w = 8 + b.length % 24; val h = 4 + b.length % 12
      val frames = 1 + (id % 4).toInt
      val ph = (0 until frames).map(f => framePhash(b, w, h, f))
      val steps = ph.sliding(2).filter(_.size == 2)
        .map(p => java.lang.Long.bitCount(p(0) ^ p(1))).toSeq
      allSteps ++= steps
      (id, frames.toLong, steps.count(_ >= 8).toLong,
        if (steps.isEmpty) 0L else steps.max.toLong)
    }.sortBy(_._1).toSeq
    val got = Media.sceneFrame(spark, sf).filter($"valid")
      .select($"doc_id", $"n_frames", $"n_cuts", $"max_step")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    // the threshold sits in a real gap: both modes present
    assert(allSteps.exists(_ < 8) && allSteps.exists(_ >= 8))
    // the served contract (pins + total) aggregates this same table
    val served = Media.mmSceneCuts(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val totalRow = served.find(_._1 == -1L).get
    assert(totalRow._2 == want.map(_._2).sum &&
      totalRow._3 == want.map(_._3).sum &&
      totalRow._4 == want.map(_._4).max)
  }
}
