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
}
