package graft

import graft.operators.{Hybrid, KnnSearch, Rerank}
import graft.text.Bm25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator surface: radius search, BM25, hybrid RRF fusion,
  * MMR diversity rerank, filtered ANN, unigram-LM scoring. Value-level
  * truth is the DuckDB oracle (SparkEntry.oracleSql); these specs pin
  * the semantic contracts the oracle's hash can't articulate. */
class RetrievalOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("range_search returns exactly the neighbors above the radius, ranked") {
    val out = KnnSearch.rangeSearch(spark, sf).collect()
    assert(out.nonEmpty)
    // every row clears the threshold; each query's self-match leads at 1.0
    assert(out.forall(_.getAs[Long]("score_e6") >= 250000L))
    (0L until 5L).foreach { q =>
      val mine = out.filter(_.getAs[Long]("q_id") == q)
        .sortBy(_.getAs[Long]("rank"))
      assert(mine.head.getAs[Long]("neighbor_id") == q)
      assert(mine.head.getAs[Long]("score_e6") == 1000000L)
      // ranks contiguous from 1, scores non-increasing
      assert(mine.map(_.getAs[Long]("rank")).toSeq == (1L to mine.length).toSeq)
      val scores = mine.map(_.getAs[Long]("score_e6")).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // completeness: count matches an independent brute-force filter
    val brute = KnnSearch.topK(
      graft.core.Tables.embeddings(spark, sf).crossJoin(
        broadcast(graft.core.Tables.embeddings(spark, sf)
          .filter($"vec_id" < 5)
          .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))))
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6")),
      Int.MaxValue, asc = false)
      .filter($"score_e6" >= 250000L).count()
    assert(out.length.toLong == brute)
  }

  test("text_bm25 ranks only docs containing a query term, scores positive") {
    val out = Bm25.ranked(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("score_e6") > 0L))
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val qterms = Bm25.queries.toMap.view.mapValues(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet).toMap
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
        .toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      assert(qterms(r.getAs[Long]("q_id")).exists(toks.contains),
        s"doc ${r.getAs[Long]("doc_id")} has no term of query ${r.getAs[Long]("q_id")}")
    }
    // per-query: 10 contiguous ranks, non-increasing scores
    Bm25.queries.map(_._1).foreach { q =>
      val mine = out.filter(_.getAs[Long]("q_id") == q).sortBy(_.getAs[Long]("rank"))
      assert(mine.map(_.getAs[Long]("rank")).toSeq == (1L to mine.length).toSeq)
      val s = mine.map(_.getAs[Long]("score_e6")).toSeq
      assert(s == s.sorted.reverse)
    }
  }

  test("bm25: a doc repeating a query term outranks one mentioning it once") {
    // tiny corpus in the documents.parquet layout where the fixed
    // workload term 'data' (query 3) appears with tf 3 / 1 / 0
    val tmp = java.nio.file.Files.createTempDirectory("bm25spec").toString
    Seq(
      (0L, "data data data filler words here", "en", "t", 30L),
      (1L, "data filler words here more words", "en", "t", 30L),
      (2L, "filler words only nothing else at", "en", "t", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val out = Bm25.ranked(spark, tmp, k = 10)
      .filter($"q_id" === 3L) // "customer data query slow" — only 'data' matches
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L),
      "tf=3 doc must outrank tf=1 doc; tf=0 doc must be absent")
    assert(out(0).getAs[Long]("score_e6") > out(1).getAs[Long]("score_e6"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("hybrid_rrf grid is all-true and fusion actually mixes both legs") {
    val grid = Hybrid.hybridRrfChecked(spark, sf).collect()
    assert(grid.length == Bm25.queries.length * 10)
    Seq("doc_in_corpus", "bm25_leg_ok", "vec_leg_ok", "rrf_consistent",
      "monotone_ok").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    val fused = Hybrid.hybridRrf(spark, sf).collect()
    // a doc present in BOTH legs must outscore the same ranks' singles:
    // at minimum, both legs contribute somewhere in the fused top-10
    assert(fused.exists(_.getAs[Long]("bm25_rank") != -1L))
    assert(fused.exists(_.getAs[Long]("vec_rank") != -1L))
    // two-leg rows exist and carry the sum of both contributions
    val both = fused.filter(r =>
      r.getAs[Long]("bm25_rank") != -1L && r.getAs[Long]("vec_rank") != -1L)
    both.foreach { r =>
      val e6 = (x: Long) => math.floor(1.0 / (60.0 + x) * 1000000.0 + 0.5).toLong
      assert(r.getAs[Long]("rrf_e6") ==
        e6(r.getAs[Long]("bm25_rank")) + e6(r.getAs[Long]("vec_rank")))
    }
  }

  test("knn_filtered returns only same-label neighbors and the filter is load-bearing") {
    val out = KnnSearch.knnFiltered(spark, sf).collect()
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    out.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) == labels(r.getAs[Long]("q_id")))
    }
    // the unfiltered top-10 must contain other-label rows — otherwise
    // this spec would pass with the filter silently dropped
    val unfiltered = KnnSearch.bruteCosine(spark, sf).collect()
    assert(unfiltered.exists(r =>
      labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("q_id"))))
    // and consequently the filtered result sets differ
    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getAs[Long]("q_id")).view
        .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(sets(out) != sets(unfiltered))
  }

  test("ivf_search_filtered: grid all-true and recall@10 >= 0.9 vs brute filtered") {
    val grid = graft.index.IvfIndex.ivfSearchFiltered(spark, sf).collect()
    assert(grid.length == 5)
    Seq("k_results", "all_match_label", "self_found", "top1_exact", "monotone")
      .foreach { c =>
        assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
      }
    val brute = KnnSearch.knnFiltered(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val emb = graft.core.Tables.embeddings(spark, sf)
    val built = graft.index.IvfIndex.buildCachedFor(s"ivf_meta:$sf", spark,
      emb.select($"vec_id", $"embedding", $"label"), sf, metaCols = Seq("label"))
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"label".as("q_label"))
    val ivf = graft.index.IvfIndex.searchFiltered(built, queries,
      col("label") === col("q_label"), nProbe = 13).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      ivf(q).intersect(brute(q)).size.toDouble / brute(q).size
    }
    info(f"filtered IVF recall@10 per query: ${recalls.map(r => f"$r%.2f").mkString(", ")}")
    val mean = recalls.sum / recalls.size
    info(f"mean filtered recall@10 = $mean%.3f")
    assert(mean >= 0.9, f"mean filtered recall $mean%.3f below bar")
  }

  test("nsw_search_filtered: grid all-true and recall@10 >= 0.9 vs brute filtered") {
    val grid = graft.index.NswIndex.nswSearchFiltered(spark, sf).collect()
    assert(grid.length == 5)
    Seq("k_results", "all_match_label", "self_found", "top1_exact", "monotone")
      .foreach { c =>
        assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
      }
    val brute = KnnSearch.knnFiltered(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val emb = graft.core.Tables.embeddings(spark, sf)
    val edges = graft.index.NswIndex.edgesCached(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"label".as("q_label"))
    val nsw = graft.index.NswIndex.searchFiltered(emb, edges, queries,
      col("label") === col("q_label"), metaCols = Seq("label")).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      nsw(q).intersect(brute(q)).size.toDouble / brute(q).size
    }
    info(f"filtered NSW recall@10 per query: ${recalls.map(r => f"$r%.2f").mkString(", ")}")
    val mean = recalls.sum / recalls.size
    info(f"mean filtered NSW recall@10 = $mean%.3f")
    assert(mean >= 0.9, f"mean filtered NSW recall $mean%.3f below bar")
    // the unfiltered beam (same walk, no predicate) would serve
    // other-label rows for these queries — the filter is load-bearing
    val unfiltered = graft.index.NswIndex.beamSearch(emb, edges,
        queries.drop("q_label"), k = 10).collect()
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    assert(unfiltered.exists(r =>
      labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("q_id"))))
  }

  test("text_unigram_ll: keep flag exact, discriminative, consistent with token counts") {
    val out = graft.text.TextOps.textUnigramLl(spark, sf).collect()
    assert(out.length == 500)
    out.foreach { r =>
      // keep is pure long arithmetic over the returned columns
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("sum_lp_e6") >= -3450000L * r.getAs[Long]("n_tokens")))
      assert(r.getAs[Long]("sum_lp_e6") < 0L) // log-probs are negative
    }
    // the threshold actually splits this corpus
    assert(out.exists(_.getAs[Boolean]("keep")))
    assert(out.exists(!_.getAs[Boolean]("keep")))
    // n_tokens agrees with the tokenizer's whitespace count
    val wsCounts = graft.text.TextOps.textTokens(spark, sf)
      .select($"doc_id", $"n_tokens_ws").as[(Long, Long)].collect().toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == wsCounts(r.getAs[Long]("doc_id")))
    }
  }

  test("knn_join_ivf: grid all-true, recall@5 >= 0.85 vs exact join, probe ranking map-side") {
    val grid = graft.index.IvfIndex.knnJoinIvfChecked(spark, sf).collect()
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(grid.length.toLong == n * 5, "every corpus vector must get exactly 5 ranked hits")
    Seq("neighbor_in_corpus", "not_self", "score_exact", "monotone").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    val emb = graft.core.Tables.embeddings(spark, sf)
    val exact = KnnSearch.topK(
      emb.crossJoin(broadcast(emb.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6")),
      5, asc = false).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val joined = graft.index.IvfIndex.knnJoinIvf(
      graft.index.IvfIndex.buildCached(spark, sf))
    // the reason this is not search(queries=corpus): centroid ranking
    // must NOT spend a window (shuffle of n×kClusters rows) — the only
    // Window in the plan is the final per-query top-k rank
    val plan = joined.queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1,
      s"expected exactly one Window (top-k rank), got $windows:\n${plan.take(3000)}")
    val approx = joined.collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.keys.toSeq.sorted.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"knn_join_ivf mean recall@5 vs exact = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.85, f"mean recall $mean%.3f below bar")
  }

  test("mmr_rerank picks the top-relevance candidate first, then diversifies") {
    val out = Rerank.mmrRerank(spark, sf).orderBy($"rank").collect()
    assert(out.length == 10)
    val ids = out.map(_.getAs[Long]("neighbor_id"))
    assert(ids.distinct.length == 10)
    assert(!ids.contains(0L)) // query itself excluded
    // rank 1 = argmax relevance with mmr = 7·rel
    val first = out.head
    assert(first.getAs[Long]("mmr_x10_e6") == 7L * first.getAs[Long]("relevance_e6"))
    assert(out.forall(r => r.getAs[Long]("relevance_e6") <= first.getAs[Long]("relevance_e6")))
    // diversity does work on this corpus: the MMR order is NOT the pure
    // relevance order (deterministic data, pinned by the oracle too)
    val byRel = out.sortBy(r => (-r.getAs[Long]("relevance_e6"), r.getAs[Long]("neighbor_id")))
      .map(_.getAs[Long]("neighbor_id"))
    assert(!ids.sameElements(byRel))
  }

  test("knn_brute_sq: codes match an independent quantizer; recall@10 >= 0.9 vs exact dot") {
    import graft.index.SqIndex
    // independent reference quantizer + scorer in plain Scala
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    val d = vecs.head._2.length
    val mns = Array.tabulate(d)(i => vecs.map(_._2(i)).min)
    val mxs = Array.tabulate(d)(i => vecs.map(_._2(i)).max)
    def codeOf(v: Array[Float]): Array[Long] = Array.tabulate(d) { i =>
      val (mn, mx) = (mns(i).toDouble, mxs(i).toDouble)
      if (mx == mn) 0L
      else math.min(255L, math.max(0L,
        math.floor((v(i).toDouble - mn) * 255.0 / (mx - mn) + 0.5).toLong))
    }
    def sqScore(q: Array[Float], code: Array[Long]): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        val (mn, mx) = (mns(i).toDouble, mxs(i).toDouble)
        val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
        s += q(i).toDouble * (mn + code(i) * step)
        i += 1
      }
      s
    }
    val got = SqIndex.knnBruteSq(spark, sf)
      .select($"q_id", $"neighbor_id", $"score_e6", $"rank")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 5 * 10)
    // operator's ranked lists equal the reference quantizer's
    val queries = vecs.filter(_._1 < 5)
    val codes = vecs.map { case (id, v) => id -> codeOf(v) }
    for ((qid, qv) <- queries) {
      val expTop = codes.map { case (id, c) =>
        (id, math.floor(sqScore(qv, c) * 1e6 + 0.5).toLong) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
      val gotTop = got.filter(_._1 == qid).sortBy(_._4).map(t => (t._2, t._3))
      assert(gotTop.toSeq == expTop.toSeq, s"query $qid mismatch")
    }
    // quantization keeps retrieval quality: recall@10 vs the EXACT dot
    val recalls = queries.map { case (qid, qv) =>
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < d) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
      }
      val exact = vecs.map { case (id, v) =>
        (id, math.floor(dot(qv, v) * 1e6 + 0.5).toLong) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val approx = got.filter(_._1 == qid).map(_._2).toSet
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"SQ8 recall@10 vs exact dot per query: ${recalls.map(r => f"$r%.2f").mkString(", ")}")
    info(f"mean SQ8 recall@10 = $mean%.3f")
    assert(mean >= 0.9, f"mean SQ8 recall $mean%.3f below bar")
  }

  test("mine_triplets equals a brute per-anchor scan; both suspect arms fire; top-1 is group-limited") {
    import spark.implicits._
    val df = graft.operators.KnnSearch.mineTriplets(spark, sf)
    // the per-(anchor, side) top-1 must run as a WindowGroupLimit
    // (per-partition 1-row heaps before the only shuffle), not a full
    // per-group sort of every scored corpus row
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "top-1 cut is not group-limited — full corpus rows would cross the window shuffle")
    val got = df.collect().map(r => r.getAs[Long]("q_id") ->
      ((r.getAs[Long]("pos_id"), r.getAs[Long]("pos_score_e6"),
        r.getAs[Long]("neg_id"), r.getAs[Long]("neg_score_e6"),
        r.getAs[Long]("margin_e6"), r.getAs[Boolean]("label_suspect")))).toMap
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val anchors = vecs.filter(_._1 < 8)
    assert(got.keySet == anchors.map(_._1).toSet)
    anchors.foreach { case (qid, qv, qlab) =>
      def best(samelabel: Boolean) = vecs
        .filter(v => v._1 != qid && (v._3 == qlab) == samelabel)
        .map(v => (v._1, math.floor(cos(v._2, qv) * 1e6 + 0.5).toLong))
        .minBy { case (id, s) => (-s, id) }
      val (pid, ps) = best(samelabel = true)
      val (nid, ns) = best(samelabel = false)
      assert(got(qid) == ((pid, ps, nid, ns, ps - ns, ps - ns < -100000L)),
        s"anchor $qid mismatch: got ${got(qid)}, expected ${(pid, ps, nid, ns)}")
    }
    // the suspect flag must be load-bearing on this corpus: some
    // anchors flagged, some not — otherwise the threshold is
    // decorative and the oracle can't catch a broken comparison
    assert(got.valuesIterator.exists(_._6) && got.valuesIterator.exists(!_._6),
      s"label_suspect flag not discriminative: ${got.valuesIterator.map(_._6).toSeq}")
  }

  test("label_knn_eval equals a brute leave-one-out vote; overall row sums the labels") {
    import spark.implicits._
    val df = graft.operators.KnnSearch.labelKnnEval(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    val got = df.collect().map(r => r.getAs[Long]("label") ->
      ((r.getAs[Long]("n_eval"), r.getAs[Long]("n_correct"), r.getAs[Long]("acc_e6")))).toMap
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    // same capped hash-sample predicate as the operator (evalCap
    // pattern — md5-60-bit of the id string, modulo n/cap+1)
    val m = vecs.length.toLong / graft.operators.KnnSearch.evalCap + 1L
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val preds = vecs.filter(v => hash60(v._1.toString) % m == 0L)
      .map { case (qid, qv, qlab) =>
      val top5 = vecs.filter(_._1 != qid)
        .map(v => (v._1, v._3, math.floor(cos(v._2, qv) * 1e6 + 0.5).toLong))
        .sortBy { case (id, _, s) => (-s, id) }.take(5)
      val pred = top5.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (lab, n) => (-n, lab) }._1
      (qlab.toLong, pred == qlab)
    }
    val expPerLabel = preds.groupBy(_._1).map { case (lab, rs) =>
      lab -> ((rs.size.toLong, rs.count(_._2).toLong)) }
    expPerLabel.foreach { case (lab, (n, c)) =>
      assert(got(lab) == ((n, c, c * 1000000L / n)), s"label $lab mismatch")
    }
    // the -1 overall row is exactly the per-label sums
    val (totN, totC) = (preds.size.toLong, preds.count(_._2).toLong)
    assert(got(-1L) == ((totN, totC, totC * 1000000L / totN)))
    assert(got.size == expPerLabel.size + 1)
    // the eval must be discriminative on this corpus: neither 0% nor 100%
    assert(totC > 0L && totC < totN, s"degenerate accuracy $totC/$totN")
  }

  test("embedding_dim_stats equals a brute per-dim pass; map-side partial agg in the plan") {
    import spark.implicits._
    val df = graft.operators.EmbeddingStats.embeddingDimStats(spark, sf)
    // the corpus-sized explode must partial-aggregate before its one
    // shuffle — a plan that ships raw (dim, component) pairs is the
    // 100 TB failure mode
    assert(df.queryExecution.executedPlan.toString.contains("partial_"),
      "no partial aggregation before the shuffle")
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .select($"embedding").as[Array[Float]].collect()
    val d = vecs.head.length
    val got = df.collect()
    assert(got.map(_.getAs[Long]("dim")).toSeq == (1 to d).map(_.toLong))
    got.foreach { r =>
      val dim = r.getAs[Long]("dim").toInt - 1
      val qs = vecs.map(v => math.floor(v(dim).toDouble * 1e6 + 0.5).toLong)
      val (n, s, s2) = (qs.length.toLong, qs.sum, qs.map(q => q * q).sum)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("sum_e6") == s &&
        r.getAs[Long]("sumsq_e12") == s2)
      assert(r.getAs[Long]("min_e6") == qs.min && r.getAs[Long]("max_e6") == qs.max)
      assert(r.getAs[Long]("var_num") == n * s2 - s * s)
      assert(r.getAs[Long]("var_num") >= 0L)
    }
  }

  test("query_text_maxsim equals a driver-side brute MaxSim over the same chunk embeddings") {
    val k = 10
    // independent recompute: chunk embeddings via the public chunker +
    // embedder, per-term max cosine summed per doc, e6 per-term floors
    val chunkEmbs = graft.operators.Collections.chunkDocuments(spark, sf)
      .select($"doc_id", graft.embed.Embedder.embedText($"chunk_text").as("emb"))
      .as[(Long, Array[Float])].collect()
    val terms = graft.operators.Collections.DemoQueryText.toLowerCase
      .split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    val qvecs = terms.toSeq.toDF("t")
      .select(graft.embed.Embedder.embedText($"t")).as[Array[Float]].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val expected = chunkEmbs.groupBy(_._1).map { case (doc, rows) =>
      doc -> qvecs.map(q => rows.map(r => e6(cos(r._2, q))).max).sum
    }.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
    val got = graft.operators.Collections.queryTextMaxsim(spark, sf, k = k)
      .select($"rank", $"doc_id", $"confidence_e6")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == k)
    got.zip(expected).zipWithIndex.foreach { case (((rank, doc, score), (wDoc, wScore)), i) =>
      assert(rank == i + 1)
      assert(doc == wDoc && score == wScore,
        s"rank ${i + 1}: got ($doc, $score) want ($wDoc, $wScore)")
    }
    // late interaction is load-bearing: MaxSim's ranking differs from
    // the pooled single-vector ranking somewhere in the top k
    val pooledTop = {
      val full = graft.core.Tables.documents(spark, sf)
        .select($"doc_id", graft.embed.Embedder.embedText(lit(
          graft.operators.Collections.DemoQueryText)).as("q"),
          graft.embed.Embedder.embedText($"text").as("d"))
        .select($"doc_id", graft.functions.vectors.cosineSim($"q", $"d").as("c"))
        .as[(Long, Double)].collect()
      full.sortBy { case (d, c) => (-e6(c), d) }.take(k).map(_._1).toSeq
    }
    assert(got.map(_._2).toSeq != pooledTop,
      "MaxSim ranking identical to pooled ranking — late interaction inert")
    // the checked grid the registry serves is all-true
    val grid = graft.operators.Collections.queryTextMaxsimChecked(spark, sf).collect()
    assert(grid.length == k)
    grid.foreach { r =>
      assert(r.getAs[Boolean]("id_in_corpus") && r.getAs[Boolean]("content_ok") &&
        r.getAs[Boolean]("score_bounded") && r.getAs[Boolean]("next_not_higher"))
    }
    // the persisted-layout serve returns the identical ranking — the
    // durable corpus IS the memoized corpus, made parquet
    val persisted = graft.operators.Collections.queryTextMaxsimPersisted(spark, sf, k = k)
      .select($"rank", $"doc_id", $"confidence_e6")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(persisted.toSeq == got.toSeq,
      "persisted MaxSim serve diverges from the memoized corpus serve")
  }
}
