package graft

import graft.operators.{Media, MediaCodec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("codec round-trips: decode(encode(text)) recovers the pixel grid") {
    val enc = MediaCodec.encode("the quick brown fox", frames = 3)
    val d = MediaCodec.decode(enc).get
    assert(d.frames == 3 && d.width > 0 && d.height > 0)
    assert(d.pixels.length == d.frames * d.width * d.height)
    // deterministic: same text → same bytes
    assert(MediaCodec.encode("the quick brown fox", 3).sameElements(enc))
    // distinct frames differ (frame index is mixed into pixels)
    val f0 = d.pixels.slice(0, d.width * d.height)
    val f1 = d.pixels.slice(d.width * d.height, 2 * d.width * d.height)
    assert(!f0.sameElements(f1))
  }

  test("decoder rejects corrupt payloads instead of failing the task") {
    assert(MediaCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.decode(Array.fill[Byte](32)(0)).isEmpty)
    val good = MediaCodec.encode("x", 1)
    assert(MediaCodec.decode(good.dropRight(1)).isEmpty) // truncated
  }

  test("mm_features decodes every document; the planted corrupt row is flagged") {
    // the LIBRARY frame (full corpus) — the registry key serves the
    // golden-pinned projection whose oracle the driver hash-checks
    val out = graft.operators.Media.mmFeatures(spark, sf).cache()
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(out.count() == docs)
    val bad = out.filter(!$"ok").select($"doc_id").as[Long].collect()
    assert(bad.toSeq == Seq(13L))
    // decoded dims are real header values, and pixel stats are sane
    assert(out.filter($"ok").filter(
      $"n_pixels" =!= $"width" * $"height" * $"n_frames").count() == 0)
    assert(out.filter($"ok").filter(
      $"pixel_min" < 0 || $"pixel_max" > 255 ||
        $"pixel_mean" < $"pixel_min" || $"pixel_mean" > $"pixel_max").count() == 0)
  }

  test("mm_frame_sample emits only every 2nd frame, matching the decoded frame count") {
    val frames = graft.operators.Media.mmFrameSample(spark, sf).cache()
    assert(frames.filter($"frame_idx" % 2 =!= 0).count() == 0)
    // per-doc sampled count = ceil(n_frames / 2) from mm_features
    val feats = graft.operators.Media.mmFeatures(spark, sf)
      .filter($"ok").select($"doc_id", $"n_frames")
    val joined = frames.groupBy($"doc_id").count()
      .join(feats, Seq("doc_id"))
      .filter($"count" =!= ceil($"n_frames" / lit(2.0)).cast("long"))
    assert(joined.count() == 0)
  }

  test("mm_dedup: corpus summary consistent; injected duplicates fire every dup arm") {
    // corpus run: totals line up with the document table; this corpus
    // has no duplicate texts so the dup arms read zero
    val row = SparkEntry.queries("mm_dedup")(spark, sf).collect().head
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(row.getAs[Long]("n_payloads") == docs)
    assert(row.getAs[Long]("n_valid") == docs - 1) // the corrupt row
    assert(row.getAs[Long]("n_distinct_payloads") == docs - 1)
    assert(row.getAs[Long]("n_dup_groups") == 0L &&
      row.getAs[Long]("n_dup_members") == 0L && row.getAs[Long]("bytes_saved") == 0L)
    assert(row.getAs[Long]("bytes_total") > 0L)
    // injected duplicates: 3 copies of one payload, 2 of another, one
    // corrupt row, one singleton — every output arm is load-bearing
    val pa = MediaCodec.encode("duplicated payload alpha", 2)
    val pb = MediaCodec.encode("duplicated payload beta", 1)
    val pc = MediaCodec.encode("singleton payload", 3)
    val recs = spark.createDataset(Seq(
      graft.operators.MediaRecord(1L, pa, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(2L, pa, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(3L, pa, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(4L, pb, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(5L, pb, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(6L, pc, graft.operators.MMMeta(0L, 0L, "s")),
      graft.operators.MediaRecord(7L, Array[Byte](9, 9, 9), graft.operators.MMMeta(0L, 0L, "s"))))
    val s = Media.payloadDedupStats(Media.payloadFrame(recs)).collect().head
    assert(s.getAs[Long]("n_payloads") == 7L && s.getAs[Long]("n_valid") == 6L)
    assert(s.getAs[Long]("n_distinct_payloads") == 3L)
    assert(s.getAs[Long]("n_dup_groups") == 2L && s.getAs[Long]("n_dup_members") == 5L)
    assert(s.getAs[Long]("bytes_total") ==
      3L * pa.length + 2L * pb.length + pc.length + 3L)
    assert(s.getAs[Long]("bytes_saved") == 2L * pa.length + pb.length)
  }
}
