package graft

import graft.index.RecallEval
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-6 ops: the filtered-ANN selectivity curve's MEASURED values,
  * the salted join's identity + plan shape, and the quality P/R
  * curve vs an independent from-scratch scorer — all at sf0.001.
  */
class CurveOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  test("ann_filtered_curve: full-probe identity, bounded production recall") {
    val curve = RecallEval.annFilteredCurve(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getBoolean(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    println(s"ann_filtered_curve measured: $curve")
    assert(curve.size == RecallEval.filterMods.size * 2)
    // full probe + pre-filter IS the exact filtered scan — per selectivity
    RecallEval.filterMods.foreach { m =>
      assert(curve((m, true))._2 == 1000000L, s"full probe at mod $m")
    }
    // production probe: bounded, and the unfiltered point meets the
    // plain-IVF serving bar
    RecallEval.filterMods.foreach { m =>
      val r = curve((m, false))._2
      assert(r >= 0L && r <= 1000000L)
    }
    assert(curve((1L, false))._2 >= 800000L)
    // the phenomenon the curve exists to measure: at a fixed nProbe,
    // the tightest filter (5%) loses recall vs the unfiltered point
    // (measured 0.94 → 0.72 on this corpus)
    assert(curve((20L, false))._2 < curve((1L, false))._2)
  }

  test("join_salted equals the plain join and plans the salted explode") {
    val got = SkewJoin.joinSalted(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // plain unsalted twin, same measure
    val ev = graft.core.Tables.events(spark, dir)
    val dim = ev.select($"event_type").distinct()
      .withColumn("weight", length($"event_type").cast("long"))
    val want = ev.join(dim, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(graft.core.Stab.e6($"value") * $"weight").as("weighted_e6"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
    // the salted rewrite is actually IN the plan: the dim side is
    // exploded over the salt sequence before the join
    val plan = SkewJoin.joinSalted(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"no salted explode in:\n$plan")
  }

  test("quality_pr_curve equals an independent from-scratch P/R sweep") {
    val B = graft.text.Quality.buckets
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def features(t: String): Map[Long, Long] = {
      val w = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val grams = w.toSeq ++
        (if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty)
      grams.groupBy(g => hash60(g) % B).view.mapValues(_.size.toLong).toMap
    }
    val perDoc = graft.core.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      .sortBy(_._1)
      .map { case (id, lang, t) =>
        (id, if (lang == "en") 1L else -1L, features(t))
      }
    val m = perDoc.length.toLong / graft.text.Quality.trainCap + 1L
    val sample = perDoc.filter { case (id, _, _) => hash60(id.toString) % m == 0L }
    val w = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    var bias = 0L
    (1 to graft.text.Quality.epochs).foreach { _ =>
      sample.foreach { case (_, y, fs) =>
        val s = bias + fs.iterator.map { case (b, tf) => w(b) * tf }.sum
        if ((if (s > 0L) 1L else -1L) != y) {
          fs.foreach { case (b, tf) => w(b) = w(b) + y * tf }
          bias += y
        }
      }
    }
    val scores = perDoc.filter(_._3.nonEmpty).map { case (_, y, fs) =>
      (y, bias + fs.iterator.map { case (b, tf) => w(b) * tf }.sum)
    }
    val want = graft.text.Quality.prThresholds.map { t =>
      val tp = scores.count { case (y, s) => s > t && y == 1L }.toLong
      val fp = scores.count { case (y, s) => s > t && y == -1L }.toLong
      val fn = scores.count { case (y, s) => s <= t && y == 1L }.toLong
      (t, tp, fp, fn,
        tp * 1000000L / math.max(tp + fp, 1L),
        tp * 1000000L / math.max(tp + fn, 1L))
    }
    val got = graft.text.Quality.qualityPrCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the sweep genuinely trades precision for recall on this corpus
    assert(got.head._6 > got.last._6) // recall falls as thresh rises
  }
}
