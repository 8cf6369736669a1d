package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side references for the two data-selection ops
  * added in r7: `doc_embed_pool` is checked value-for-value against a
  * plain Scala mean over the same chunk embeddings, `dsir_importance`
  * against a from-scratch reimplementation of the hashed-ngram
  * log-ratio scoring (own tokenizer, own md5 hashing, own smoothing
  * arithmetic) — both tiny at the spec SF but computed by a different
  * code path than the operator under test. */
class DataSelectionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("doc_embed_pool equals a driver-side mean of the chunk embeddings, renormalized") {
    val dim = graft.embed.Embedder.DefaultDim
    // chunk embeddings via the public chunker + embedder (the same
    // inputs the operator consumes), pooled independently in Scala
    val chunkEmbs = graft.operators.Collections.chunkDocuments(spark, sf)
      .select($"doc_id", graft.embed.Embedder.embedText($"chunk_text").as("emb"))
      .as[(Long, Array[Float])].collect()
    val expected = chunkEmbs.groupBy(_._1).map { case (doc, rows) =>
      val n = rows.length
      val mean = Array.tabulate(dim)(i => rows.map(_._2(i).toDouble).sum / n)
      val norm = math.sqrt(mean.map(v => v * v).sum)
      val unit =
        if (norm > 0.0) mean.map(v => (v / norm).toFloat) else mean.map(_ => 0f)
      doc -> ((n.toLong, unit))
    }
    val pooled = graft.operators.Collections.pooledVectors(
        graft.operators.Collections.chunkDocuments(spark, sf)
          .select($"doc_id", graft.embed.Embedder.embedText($"chunk_text").as("emb")),
        dim)
      .as[(Long, Long, Array[Float])].collect()
      .map { case (d, n, v) => d -> ((n, v)) }.toMap
    assert(pooled.keySet == expected.keySet && pooled.nonEmpty)
    expected.foreach { case (doc, (n, want)) =>
      val (gotN, got) = pooled(doc)
      assert(gotN == n, s"doc $doc chunk count")
      want.zip(got).zipWithIndex.foreach { case ((w, g), i) =>
        assert(math.abs(w - g) < 1e-6f, s"doc $doc component $i: $w vs $g")
      }
    }
    // pooling is load-bearing: some doc has >1 chunk, and for those the
    // pooled vector differs from any single chunk's embedding
    assert(expected.values.exists(_._1 > 1))
    // the registry projection holds its contract on every row
    val grid = graft.operators.Collections.docEmbedPool(spark, sf).collect()
    assert(grid.length == expected.size)
    grid.foreach { r =>
      assert(r.getAs[Long]("dim") == dim.toLong)
      assert(r.getAs[Long]("unit_e6") == 1000000L,
        s"doc ${r.getAs[Long]("doc_id")} not unit after renorm")
    }
  }

  test("dsir_importance equals an independent hashed-ngram log-ratio scorer") {
    val B = graft.text.TextOps.dsirBuckets
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    def toks(t: String): Array[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def features(t: String): Seq[Long] = {
      val w = toks(t)
      val unis = w.toSeq
      val bis = if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      (unis ++ bis).map(g => hash60(g) % B)
    }
    val perDoc = docs.map { case (id, lang, text) =>
      (id, lang == "en", features(text).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val tgtCnt = new scala.collection.mutable.HashMap[Long, Long]()
    val rawCnt = new scala.collection.mutable.HashMap[Long, Long]()
    perDoc.foreach { case (_, isT, fs) =>
      fs.foreach { case (b, tf) =>
        rawCnt(b) = rawCnt.getOrElse(b, 0L) + tf
        if (isT) tgtCnt(b) = tgtCnt.getOrElse(b, 0L) + tf
      }
    }
    val tn = tgtCnt.values.sum.toDouble
    val rn = rawCnt.values.sum.toDouble
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val sums = perDoc.map { case (id, _, fs) =>
      val nf = fs.values.sum
      val slr = fs.map { case (b, tf) =>
        tf * (e6(math.log((tgtCnt.getOrElse(b, 0L) + 1.0) / (tn + B))) -
          e6(math.log((rawCnt(b) + 1.0) / (rn + B))))
      }.sum
      (id, nf, slr)
    }
    val totFeats = sums.map(_._2).sum
    val totLr = sums.map(_._3).sum
    val expected = sums.map { case (id, nf, slr) =>
      id -> ((nf, slr, slr * totFeats > nf * totLr))
    }.toMap
    val got = graft.text.TextOps.dsirImportance(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, nf, slr, k) => id -> ((nf, slr, k)) }.toMap
    assert(got == expected)
    // the verdict is load-bearing on this corpus: both arms fire, and
    // the target slice itself scores likelier-under-target on average
    // (the method's sanity property)
    val kept = expected.valuesIterator.count(_._3)
    assert(kept > 0 && kept < expected.size)
    val bySrc = docs.map { case (id, lang, _) => (lang == "en", expected(id)._3) }
    val tgtKeepRate = { val t = bySrc.filter(_._1); t.count(_._2).toDouble / t.length }
    val otherKeepRate = { val o = bySrc.filterNot(_._1); o.count(_._2).toDouble / o.length }
    assert(tgtKeepRate > otherKeepRate,
      s"target keep rate $tgtKeepRate not above non-target $otherKeepRate — scoring inert")
  }

  test("quality classifier equals an independent perceptron; model discriminates") {
    val B = graft.text.Quality.buckets
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      .sortBy(_._1)
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
    val perDoc = docs.map { case (id, lang, t) =>
      (id, if (lang == "en") 1L else -1L, features(t))
    }
    // independent perceptron (same documented conventions, own code)
    val m = docs.length.toLong / graft.text.Quality.trainCap + 1L
    val sample = perDoc.filter { case (id, _, _) => hash60(id.toString) % m == 0L }
    val w = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    var bias = 0L
    var mistakes = 0L
    (1 to graft.text.Quality.epochs).foreach { _ =>
      sample.foreach { case (_, y, fs) =>
        val s = bias + fs.iterator.map { case (b, tf) => w(b) * tf }.sum
        if ((if (s > 0L) 1L else -1L) != y) {
          mistakes += 1
          fs.foreach { case (b, tf) => w(b) = w(b) + y * tf }
          bias += y
        }
      }
    }
    val nz = w.filter(_._2 != 0L)
    // quality_train head equals the independent model
    val gotTrain = graft.text.Quality.qualityTrain(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val expTop = nz.toSeq.sortBy { case (b, wt) => (-math.abs(wt), b) }.take(32)
    assert(gotTrain.head == ((0L, -1L, bias, mistakes)))
    assert(gotTrain.tail.map(r => (r._2, r._3)).toSeq == expTop)
    // quality_score equals the independent scorer on every pinned row
    val expScores = perDoc.collect { case (id, _, fs) if fs.nonEmpty =>
      val nf = fs.values.sum
      val s = bias + fs.iterator.map { case (b, tf) => nz.getOrElse(b, 0L) * tf }.sum
      (id, nf, s, s > 0L)
    }
    val expHead = expScores.filter(_._1 < 8).toSeq
    val expTotal = (-1L, expScores.map(_._2).sum, expScores.map(_._3).sum,
      expScores.count(_._4) * 2 > expScores.length)
    val gotScore = graft.text.Quality.qualityScore(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(gotScore.toSeq == (expTotal +: expHead).sortBy(_._1).toSeq)
    // the gate is load-bearing: a non-trivial model, both verdicts
    // present, and the target slice keeps at a higher rate
    assert(nz.size > 10, "degenerate model")
    val keptByLang = docs.map { case (id, lang, t) =>
      val fs = features(t)
      val s = bias + fs.iterator.map { case (b, tf) => nz.getOrElse(b, 0L) * tf }.sum
      (lang == "en", s > 0L)
    }
    assert(keptByLang.exists(_._2) && keptByLang.exists(!_._2), "gate inert")
    val tRate = { val t = keptByLang.filter(_._1); t.count(_._2).toDouble / t.length }
    val oRate = { val o = keptByLang.filterNot(_._1); o.count(_._2).toDouble / o.length }
    assert(tRate > oRate,
      s"target keep rate $tRate not above non-target $oRate — classifier inert")
  }

  test("dedup_ensemble equals the per-method union; the methods genuinely disagree") {
    import graft.dedup.Dedup
    val mh = Dedup.minhash(spark, sf).filter($"est_jaccard_e6" >= 500000L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val sh = Dedup.simhash(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val ss = Dedup.substringSpans(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (mh ++ sh ++ ss).map { p =>
      val mask = (if (mh(p)) 1L else 0L) + (if (sh(p)) 2L else 0L) + (if (ss(p)) 4L else 0L)
      p -> ((mask, java.lang.Long.bitCount(mask).toLong))
    }.toMap
    val got = Dedup.ensemble(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, m, n) => (a, b) -> ((m, n)) }.toMap
    assert(got == expected && got.nonEmpty)
    // the ensemble is load-bearing: at least one pair that only a
    // single method catches AND at least one multi-method agreement
    assert(expected.values.exists(_._2 == 1L), "no single-method pair — union inert")
    assert(expected.values.exists(_._2 >= 2L), "no multi-method agreement")
  }

  test("dedup_threshold_sweep is monotone and genuinely discriminates thresholds") {
    val rows = graft.dedup.Dedup.thresholdSweep(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == graft.dedup.Dedup.sweepThresholds.sorted)
    // raising the threshold can only shrink the pair and doc sets
    rows.sliding(2).foreach { case Array((_, pA, dA, _), (_, pB, dB, _)) =>
      assert(pA >= pB && dA >= dB)
    }
    // the sweep is load-bearing: the counts actually change somewhere
    assert(rows.map(_._2).distinct.length > 1, "sweep flat — thresholds don't discriminate")
    // the share column is the exact floor division of touched by corpus
    val docs = graft.core.Tables.documents(spark, sf).count()
    rows.foreach { case (_, _, d, share) => assert(share == d * 1000000L / docs) }
  }
}
