package graft

import org.scalatest.funsuite.AnyFunSuite

/** `bpe_train_batched`: the batched merge-selection trainer vs an
  * INDEPENDENT plain-Scala replay of the documented algorithm at
  * sf0.001 — per round: rank pairs by (-count, a, b), greedily keep up
  * to m mutually non-interacting pairs (no shared symbol, no pair
  * touching another's merged token), apply in rank order. Where picks
  * don't interact the old counts are exact, so each batch equals that
  * many sequential rounds — both halves of that claim are asserted
  * directly (non-interaction of every round's picks; each recorded
  * pair_count equals the TRUE count at that pick's own application
  * point, i.e. what a sequential round would have counted).
  */
class BpeBatchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val numMerges = 32
  private val batch = 8

  /** Plain-Scala replay: returns (merge table, per-round pick counts,
    * the pair-count maps captured just before each pick applied). */
  private def replay(): (Seq[(Long, String, String, String, Long)], Seq[Int], Seq[Long]) = {
    val freq = graft.core.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    def pairCounts(): Map[(String, String), Long] = {
      val m = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, c) <- freq; Seq(a, b) <- vocab(w).sliding(2))
        m((a, b)) = m.getOrElse((a, b), 0L) + c
      m.toMap
    }
    def apply1(a: String, b: String): Unit =
      vocab = vocab.map { case (w, syms) =>
        val res = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            res += (a + b); i += 2
          } else { res += syms(i); i += 1 }
        }
        w -> res.result()
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    val roundSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val atApplyCounts = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rank = 1
    while (rank <= numMerges) {
      val pairs = pairCounts()
      if (pairs.isEmpty) return (out.toSeq, roundSizes.toSeq, atApplyCounts.toSeq)
      val ranked = pairs.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
        .take(8 * batch)
      val budget = math.min(batch, numMerges - rank + 1)
      val touched = scala.collection.mutable.Set.empty[String]
      val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      ranked.foreach { case ((a, b), n) =>
        if (picked.size < budget && !Seq(a, b, a + b).exists(touched.contains)) {
          picked += ((a, b, n)); touched ++= Seq(a, b, a + b)
        }
      }
      roundSizes += picked.size
      picked.foreach { case (a, b, n) =>
        // the TRUE count at this pick's own application point — what a
        // sequential round starting from the current vocab would count
        atApplyCounts += pairCounts().getOrElse((a, b), 0L)
        out += ((rank.toLong, a, b, a + b, n)); rank += 1
        apply1(a, b)
      }
    }
    (out.toSeq, roundSizes.toSeq, atApplyCounts.toSeq)
  }

  test("batched trainer equals the independent replay; picks are exact sequential-equivalents") {
    val (want, roundSizes, atApply) = replay()
    val got = graft.text.BpeTrain.bpeTrainBatched(spark, sf, numMerges, batch)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == want)
    // batching is real: at least one round carries more than one pick,
    // so M merges genuinely cost fewer than M driver rounds
    assert(roundSizes.exists(_ > 1),
      s"no round batched more than one pick: $roundSizes")
    // non-interaction ⇒ exactness: every recorded pair_count equals the
    // true count at that pick's own application point — each batched
    // pick IS the pair a sequential round would have counted identically
    want.map(_._5).zip(atApply).zipWithIndex.foreach { case ((rec, act), i) =>
      assert(rec == act,
        s"pick ${i + 1}: recorded count $rec != at-apply count $act — interacting picks slipped through")
    }
    // ranks are dense 1..numMerges
    assert(got.map(_._1) == (1L to numMerges.toLong))
  }

  test("batchSize=1 degenerates to the sequential trainer exactly") {
    val seq20 = graft.text.BpeTrain.bpeTrain(spark, sf, 20)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val b1 = graft.text.BpeTrain.trainedMerges(spark, sf, 20, 1)
    assert(b1 == seq20)
  }
}
