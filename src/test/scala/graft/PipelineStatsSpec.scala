package graft

import graft.operators.AnalyticsExtra
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-8 ops vs independent plain-Scala recomputations at sf0.001:
  * embedding_drift (Welch z from raw floats), doc_len_hist (bucket
  * counts + cumulative shares), text_bigram_ll (add-1 bigram LM from
  * raw text with exact prefix totals).
  */
class PipelineStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  private def e6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  test("embedding_drift matches a raw-float Welch-z recomputation") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val d = embs.head._2.length
    val want = (1 to d).map { dim =>
      def moments(slice: Long) = {
        val qs = embs.filter(_._1 % 2 == slice)
          .map(e => e6(e._2(dim - 1).toDouble))
        val n = qs.length.toLong
        val s = qs.sum
        val ss = qs.map(q => q * q).sum
        (n, s, n * ss - s * s)
      }
      val (na, sa, va) = moments(0L)
      val (nb, sb, vb) = moments(1L)
      val z = (sa.toDouble / na - sb.toDouble / nb) /
        math.sqrt(va.toDouble / (na.toDouble * na * na) +
          vb.toDouble / (nb.toDouble * nb * nb))
      (dim.toLong, na, nb, sa, sb, va, vb, e6(z), math.abs(e6(z)) >= 3000000L)
    }
    val got = graft.operators.EmbeddingStats.embeddingDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
      .toSeq
    assert(got == want)
    // random halves of one generator must NOT read as drifted
    assert(got.count(_._9) == 0)
  }

  test("doc_len_hist matches bucket recomputation; cumulative ends at 1") {
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select($"n_chars").collect().map(_.getLong(0))
    val total = lens.length.toLong
    val byBucket = lens.groupBy(_ / AnalyticsExtra.histBucketChars)
      .view.mapValues(_.length.toLong).toMap
    var cum = 0L
    val want = byBucket.keys.toSeq.sorted.map { b =>
      val n = byBucket(b)
      cum += n
      (b, b * AnalyticsExtra.histBucketChars, n, n * 1000000L / total,
        cum, cum * 1000000L / total)
    }
    val got = AnalyticsExtra.docLenHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.last._5 == total && got.last._6 == 1000000L)
  }

  test("corpus_mix matches a collected recomputation; shares sum to ~1") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"source", $"lang", $"text").as[(String, String, String)].collect()
      .map { case (s, l, t) =>
        ((s, l), t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong) }
    val cells = docs.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val total = cells.values.map(_._2).sum
    val want = cells.toSeq.map { case ((s, l), (nd, nt)) =>
      (s, l, nd, nt, nt * 1000000L / total)
    }.sortBy(x => (x._1, x._2))
    val got = graft.operators.AnalyticsExtra.corpusMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    val shareSum = got.map(_._5).sum
    assert(shareSum >= 1000000L - got.size && shareSum <= 1000000L)
  }

  test("tok_fertility rolls up exactly to bpe_apply's corpus total") {
    val fert = graft.text.BpeTrain.tokFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = graft.text.BpeTrain.bpeApply(spark, dir).collect()
      .find(_.getLong(0) == -1L).get
    // per-lang partition of the same encode: sums must match the
    // corpus-total row field-for-field
    assert(fert.map(_._2).sum == total.getLong(1))
    assert(fert.map(_._3).sum == total.getLong(2))
    assert(fert.map(_._4).sum == total.getLong(3))
    // fertility ≥ 1 (a word is at least one token) and every ratio
    // consistent with its own integer definition
    fert.foreach { case (_, w, c, t, f, cpt) =>
      assert(f >= 1000000L && f == t * 1000000L / w)
      assert(cpt == c * 1000000L / t)
    }
    assert(fert.map(_._1).toSeq == fert.map(_._1).toSeq.sorted)
  }

  test("events_dau_wau matches a set-based recomputation; WAU bounds DAU") {
    val du = graft.core.Tables.events(spark, dir)
      .select(expr("unix_timestamp(date_trunc('day', ts)) div 86400"), $"user_id")
      .distinct().as[(Long, Long)].collect()
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val d0 = byDay.keys.min; val d1 = byDay.keys.max
    val want = ((d0 + 6) to d1).map { day =>
      val dau = byDay.getOrElse(day, Set.empty).size.toLong
      val wau = (day - 6 to day)
        .flatMap(d => byDay.getOrElse(d, Set.empty)).toSet.size.toLong
      (day, dau, wau, dau * 1000000L / wau)
    }.filter(_._2 > 0)
    val got = graft.operators.AnalyticsExtra.eventsDauWau(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall { case (_, dau, wau, s) =>
      wau >= dau && s <= 1000000L })
  }

  test("events_transitions matches a per-user replay; shares sum to ~1 per from_type") {
    val ev = graft.core.Tables.events(spark, dir)
      .select($"user_id", unix_millis($"ts".cast("timestamp")), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val steps = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val counts = steps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val want = counts.toSeq.map { case ((f, t), n) =>
      (f, t, n, n * 1000000L / out(f))
    }.sortBy(x => (x._1, x._2))
    val got = graft.operators.AnalyticsExtra.eventsTransitions(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want)
    // per from_type the shares account for (within rounding) all steps
    got.groupBy(_._1).values.foreach { rows =>
      val s = rows.map(_._4).sum
      assert(s >= 1000000L - rows.size && s <= 1000000L)
    }
  }

  test("text_keywords matches a TF-IDF recomputation; top terms are doc-specific") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq }
    val tf = docs.map { case (id, w) =>
      id -> w.groupBy(identity).view.mapValues(_.size.toLong).toMap }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val n = docs.length.toDouble
    val want = tf.toSeq.flatMap { case (id, tfs) =>
      tfs.toSeq.map { case (term, c) =>
        (term, c, dfm(term), c * e6(math.log(n / dfm(term))))
      }.sortBy { case (term, _, _, s) => (-s, term) }
        .take(3).zipWithIndex.map { case ((term, c, d, s), i) =>
          (id, (i + 1).toLong, term, c, d, s) }
    }.sortBy(x => (x._1, x._2))
    val got = graft.operators.AnalyticsExtra.textKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // keywords discriminate: not every doc shares one global top term
    assert(got.filter(_._2 == 1L).map(_._3).distinct.size > 1)
  }

  test("crud_asof reconstructs each snapshot's exact content") {
    // the op's order-independent fingerprint: bit_xor of 60-bit text
    // hashes (constant per-group aggregation state — no collect_list)
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    // replay the documented log by hand per as-of point
    def snapshot(asof: Long): Map[Long, String] = {
      var st = Map.empty[Long, String]
      if (asof >= 1000) st = docs
      if (asof >= 2000) st = st ++ docs.collect {
        case (id, t) if id % 10 == 0 => id -> t.toUpperCase }
      if (asof >= 2100) st = st -- docs.keys.filter(_ % 7 == 0)
      if (asof >= 3000) st = st ++ docs.collect {
        case (id, t) if id % 7 == 0 => id -> (t + "!") }
      st
    }
    val want = Seq(1500L, 2500L, 3500L).map { a =>
      val st = snapshot(a)
      (a, st.size.toLong, st.values.map(hash60).fold(0L)(_ ^ _))
    }
    val got = graft.operators.Collections.crudAsof(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the three snapshots genuinely differ in CONTENT (the revival
    // restores the count to 500 but with '!'-suffixed texts)
    assert(want.map(_._3).distinct.size == 3)
  }

  test("text_bigram_ll matches an add-1 bigram LM recomputation") {
    // keys are hash60 longs, matching the op's fixed-width join keys
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val perDocBg = docs.map { case (id, w) =>
      id -> w.sliding(2).filter(_.size == 2)
        .map(p => (hash60(p.mkString(" ")), hash60(p.head))).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    // counts keyed on the (bg, prefix) hash PAIR — the op's join key
    val bc = perDocBg.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cc = perDocBg.values.flatten
      .groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val v = docs.flatMap(_._2).map(hash60).distinct.length.toDouble
    val want = perDocBg.toSeq.filter(_._2.nonEmpty).map { case (id, tfs) =>
      val n = tfs.values.sum
      val lp = tfs.iterator.map { case (k @ (_, pfx), tf) =>
        tf * e6(math.log((bc(k) + 1).toDouble / (cc(pfx) + v)))
      }.sum
      (id, n, lp)
    }.sortBy(_._1)
    val gN = want.map(_._2).sum
    val gSum = want.map(_._3).sum
    val wantKeep = want.map { case (id, n, lp) =>
      (id, n, lp, BigInt(lp) * gN >= BigInt(gSum) * n)
    }
    val got = graft.text.TextOps.textBigramLl(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got == wantKeep)
    // the gate genuinely splits the corpus
    assert(got.exists(_._4) && got.exists(!_._4))
  }
}
