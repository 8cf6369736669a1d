package graft

class MixingOpsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("pack_shards two-pass prefix sum equals a global window cumsum; no global window in the plan") {
    import spark.implicits._
    val df = graft.operators.Libraries.packShards(spark, sf)
    // every Window in the executed plan must carry a non-empty
    // partition spec — the whole point is that the global cumsum
    // never funnels the corpus through one task. WindowExec prints
    // "windowspecdefinition(<partition cols..., > <order col> ASC"
    // — an empty partition spec starts directly with the order col.
    val plan = df.queryExecution.executedPlan.toString
    "windowspecdefinition\\(([^)]*)".r.findAllMatchIn(plan).foreach { m =>
      assert(m.group(1).contains(","),
        s"global (unpartitioned) window found in plan:\n${plan.take(3000)}")
    }
    val got = df.collect()
    // naive single-window global cumsum on the same inputs
    val naive = graft.core.Tables.documents(spark, sf)
      .select($"doc_id",
        size(graft.text.TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum($"n_tokens").over(
        org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("shard", greatest(lit(0L),
        floor(($"cum_tokens" - lit(1)) / lit(2000.0)).cast("long")))
      .select($"doc_id", $"n_tokens", $"cum_tokens", $"shard")
      .orderBy($"doc_id").collect()
    assert(got.length == naive.length && got.length > 0)
    got.zip(naive).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    // shards are actually packed: more than one shard, budget respected
    val byShard = got.groupBy(_.getAs[Long]("shard"))
    assert(byShard.size > 1)
  }

  test("sample_temperature upsamples low-resource languages under the token budget") {
    val out = graft.operators.Libraries.sampleTemperature(spark, sf).collect()
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(out.length == docs)
    // per-language (t_lang, rate): rate must be non-increasing in t_lang
    // (that IS the temperature flattening) and inside (0, 1]
    val perLang = out.groupBy(_.getAs[String]("lang")).map { case (l, rows) =>
      (l, rows.map(_.getAs[Long]("n_tokens")).sum, rows.head.getAs[Long]("rate_e6"))
    }.toSeq.sortBy(_._2)
    assert(perLang.forall { case (_, _, r) => r > 0L && r <= 1000000L })
    perLang.sliding(2).foreach { case Seq((_, tA, rA), (_, tB, rB)) =>
      assert(tA <= tB && rA >= rB, s"rate not monotone: t=$tA r=$rA vs t=$tB r=$rB")
    }
    assert(perLang.map(_._3).distinct.length > 1, "all rates equal — temperature inert")
    // expected kept tokens land under (≈) the half-corpus budget
    val totalTokens = out.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val expectedKept = perLang.map { case (_, t, r) => t * (r / 1e6) }.sum
    assert(expectedKept <= 0.55 * totalTokens && expectedKept >= 0.3 * totalTokens,
      s"expected kept $expectedKept vs total $totalTokens outside the budget band")
    // the hash draws actually split the corpus
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < docs)
  }

  test("sample_weighted respects per-source quotas and keeps the WindowGroupLimit pushdown") {
    val df = SparkEntry.queries("sample_weighted")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val quota = rs.head.getAs[Long]("quota")
      val expectedQuota = src match {
        case "src0" => 20L
        case "src1" => 10L
        case _ => 5L
      }
      assert(quota == expectedQuota, s"$src quota $quota")
      assert(rs.length <= quota, s"$src exceeded quota: ${rs.length}")
      assert(rs.map(_.getAs[Long]("rn")).sorted.sameElements(1L to rs.length.toLong))
    }
    // the constant pre-cut keeps the bounded-heap plan (no full sort)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown:\n${plan.take(2000)}")
  }

  test("dedup_boilerplate reports exactly the df >= 3 span population") {
    val rows = SparkEntry.queries("dedup_boilerplate")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_docs") >= 3L))
    assert(rows.forall(r => r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc")))
    // n_docs is non-increasing down the report
    val ns = rows.map(_.getAs[Long]("n_docs"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side references for the pipeline hygiene ops:
  * `dedup_components` is checked against a union-find over the same
  * pair set, `contamination_check` against a brute-force shingle
  * intersection — both tiny at the spec SF but computed by a
  * different algorithm than the operator under test. */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("dedup_components equals union-find over the thresholded minhash pairs") {
    val pairs = Dedup.minhash(spark, sf)
      .filter($"est_jaccard_e6" >= 500000L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect()
    // union-find with path compression — a different algorithm than
    // the operator's label propagation
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = docs.map(d => (d, find(d))).toMap
    val got = Dedup.components(spark, sf)
      .select($"doc_id", $"component").as[(Long, Long)].collect().toMap
    assert(got.size == docs.length)
    assert(got == expected)
    // keep flags exactly the component minima
    val keeps = Dedup.components(spark, sf)
      .filter($"keep" === 1L).select($"doc_id").as[Long].collect().toSet
    assert(keeps == expected.values.toSet)
  }

  test("dedup_substring equals brute-force shared-20-token-span pairs with the df cap") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def spans(text: String): Set[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length < 20) Set.empty
      else toks.sliding(20).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, t) => (id, spans(t)) }
    val df = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val keep = df.filter(_._2 <= 100).keySet
    val expected = (for {
      (a, sa) <- perDoc; (b, sb) <- perDoc if a < b
      shared = sa.intersect(sb).count(keep.contains) if shared > 0
    } yield ((a, b), shared.toLong)).toMap
    val got = Dedup.substringSpans(spark, sf)
      .select($"doc_a", $"doc_b", $"n_spans").as[(Long, Long, Long)]
      .collect().map { case (a, b, n) => ((a, b), n) }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("Checkpoints.free releases a localCheckpoint's storage blocks") {
    val df = spark.range(1000).toDF("x").localCheckpoint(true)
    assert(df.count() == 1000)
    // identify the exact RDD rather than diffing counts: the shared
    // session's ContextCleaner unpersists other suites' stale
    // checkpoints asynchronously, so a count diff is racy
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.core.Checkpoints.free(df)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((before -- after).nonEmpty,
      "expected the checkpointed RDD to be unpersisted" +
        " — the reflective LogicalRDD accessor no longer matches this Spark version")
  }

  test("contamination_check equals brute-force 7-gram intersection against the eval slice") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def shingles(text: String): Set[String] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length < 7) Set.empty
      else toks.sliding(7).map(_.mkString(" ")).toSet
    }
    val evalS = docs.filter(_._1 % 10 == 0).map { case (id, t) => (id, shingles(t)) }
    val trainS = docs.filter(_._1 % 10 != 0).map { case (id, t) => (id, shingles(t)) }
    val expected = (for {
      (tid, ts) <- trainS; (eid, es) <- evalS
      shared = ts.intersect(es).size if shared > 0
    } yield ((tid, eid), (shared.toLong, math.round(shared.toDouble / ts.size * 1e6))))
      .toMap
    val got = Dedup.contamination(spark, sf)
      .select($"train_id", $"eval_id", $"shared", $"contamination_e6")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (t, e, s, c) => ((t, e), (s, c)) }.toMap
    assert(got == expected)
  }

  test("dedup_keep_best elects exactly one longest survivor per component and diverges from min-id") {
    val rows = Dedup.keepBest(spark, sf).collect()
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (c, members) =>
      val keepers = members.filter(_.getAs[Long]("keep") == 1L)
      assert(keepers.length == 1, s"component $c has ${keepers.length} keepers")
      val k = keepers.head
      // the survivor is maximal by (n_tokens, -doc_id)
      members.foreach { m =>
        val better = m.getAs[Long]("n_tokens") > k.getAs[Long]("n_tokens") ||
          (m.getAs[Long]("n_tokens") == k.getAs[Long]("n_tokens") &&
            m.getAs[Long]("doc_id") < k.getAs[Long]("doc_id"))
        assert(!better, s"non-maximal survivor in component $c")
      }
    }
    // quality election is load-bearing: some survivor is NOT the min id
    val divergent = byComp.values.count { members =>
      members.exists(m => m.getAs[Long]("keep") == 1L &&
        m.getAs[Long]("doc_id") != m.getAs[Long]("component"))
    }
    assert(divergent > 0, "keep-best never differs from min-id — election inert")
  }

  test("text_pii_scrub redacts emails/phones/IPs on synthetic rows; corpus stays identity") {
    import graft.text.TextOps
    val synthetic = Seq(
      (1L, "Contact Bob.Smith+spam@Example-Mail.co.uk or call 555-123-4567 now"),
      (2L, "server at 10.0.255.3 answered; backup 192.168.1.1 did not"),
      (3L, "two mails a@b.io c@d.org and a phone 111 222 3333"),
      (4L, "nothing sensitive here, just 1234 and a.b and x@y"),
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrubColumns(synthetic).orderBy($"doc_id").collect()
    def counts(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"), r.getAs[Long]("n_ip"),
        r.getAs[Boolean]("changed"))
    assert(counts(got(0)) == ((1L, 1L, 0L, true)))
    assert(counts(got(1)) == ((0L, 0L, 2L, true)))
    assert(counts(got(2)) == ((2L, 1L, 0L, true)))
    assert(counts(got(3)) == ((0L, 0L, 0L, false)))
    // redaction replaces rather than deletes: scrubbed text of row 1
    // hashes like the hand-scrubbed expectation
    val expected1 = "contact [EMAIL] or call [PHONE] now"
    val gotMd5 = got(0).getAs[String]("scrubbed_md5")
    val expMd5 = synthetic.sparkSession.range(1)
      .select(md5(lit(expected1))).head.getString(0)
    assert(gotMd5 == expMd5)
    // unchanged rows keep byte-identical text
    assert(got(3).getAs[String]("scrubbed_md5") == got(3).getAs[String]("orig_md5"))
    // the real corpus is clean — the registry oracle pins exactly that
    val corpus = TextOps.textPiiScrub(spark, sf).collect()
    assert(corpus.forall(!_.getAs[Boolean]("changed")))
  }

  test("bpe_train equals an independent in-test BPE; merges build on earlier merges") {
    // independent reference implementation (mirrors tools/golden_bpe.py)
    val freq = graft.core.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    for (rank <- 1 to 20) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, c) <- freq; Seq(a, b) <- vocab(w).sliding(2))
        pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
      if (pairs.nonEmpty) {
        val ((a, b), n) = pairs.minBy { case ((x, y), c) => (-c, x, y) }
        expected += ((rank.toLong, a, b, a + b, n))
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
      }
    }
    val got = graft.text.BpeTrain.bpeTrain(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == expected.toSeq)
    // subword growth is real: later merges consume earlier merged tokens
    val mergedTokens = got.map(_._4).toSet
    assert(got.exists(m => mergedTokens.contains(m._2) && m._2.length > 1),
      "no merge builds on an earlier merge — BPE degenerated to char bigrams")
  }

  test("q6_filter: all predicates reach the parquet scan, untouched columns pruned, value exact") {
    import spark.implicits._
    val df = graft.operators.Relational.q6Filter(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(scan.nonEmpty, "no parquet scan with PushedFilters in the plan")
    // every predicate family must be pushed to the scan, not applied post-read
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(scan.contains(c), s"predicate on $c not pushed:\n$scan")
    }
    // column pruning: the scan schema carries only the four involved
    // columns — reading all 11 for a 2-column product is the bug
    val readSchema = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    Seq("l_partkey", "l_returnflag", "l_orderkey").foreach { c =>
      assert(!readSchema.contains(c), s"unpruned column $c in scan:\n$readSchema")
    }
    // value check vs a driver-side recompute on the same rows
    val rows = graft.core.Tables.lineitem(spark, sf)
      .select(date_format($"l_shipdate", "yyyy-MM-dd"),
        $"l_extendedprice", $"l_discount", $"l_quantity")
      .as[(String, Double, Double, Double)].collect()
    val kept = rows.filter { case (day, _, d, q) =>
      day >= "1995-01-01" && day < "1996-01-01" && d >= 0.05 && d <= 0.07 && q < 24 }
    val got = df.collect().head
    assert(got.getAs[Long]("n_rows") == kept.length.toLong)
    val expRevenue = math.floor(kept.map { case (_, p, d, _) => p * d }.sum * 100.0 + 0.5).toLong
    // float-sum order differs driver vs distributed; e2 rounding absorbs it
    assert(math.abs(got.getAs[Long]("revenue") - expRevenue) <= 1L)
    assert(kept.nonEmpty)
  }

  test("bpe_apply equals an independent encode on every doc; totals and pins line up") {
    import spark.implicits._
    val merges = graft.text.BpeTrain.bpeTrain(spark, sf)
      .select($"lhs", $"rhs").as[(String, String)].collect().toSeq
    // independent greedy encode: fold the merge list in rank order
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        val res = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            res += (a + b); i += 2
          } else { res += syms(i); i += 1 }
        }
        res.result()
      }
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val encCache = scala.collection.mutable.Map.empty[String, Vector[String]]
    val expected = docs.flatMap { case (id, text) =>
      val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (words.isEmpty) None
      else Some(id -> ((words.length.toLong,
        words.map(_.length.toLong).sum,
        words.map(w => encCache.getOrElseUpdate(w, encode(w)).length.toLong).sum,
        words.take(3).flatMap(w => encCache(w)).mkString(" "))))
    }.toMap
    // the full per-doc frame matches the independent encode doc-by-doc
    val gotPerDoc = graft.text.BpeTrain.encodePerDoc(spark, sf, merges)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, w, c, t) => id -> ((w, c, t)) }.toMap
    assert(gotPerDoc == expected.view.mapValues { case (w, c, t, _) => (w, c, t) }.toMap)
    // encoding genuinely compresses: fewer tokens than chars somewhere
    assert(expected.valuesIterator.exists { case (_, c, t, _) => t < c })
    // the registry entry: pinned rows + the -1 total row
    val out = graft.text.BpeTrain.bpeApply(spark, sf).collect()
    val totalRow = out.filter(_.getAs[Long]("doc_id") == -1L)
    assert(totalRow.length == 1)
    assert(totalRow.head.getAs[Long]("n_words") == expected.valuesIterator.map(_._1).sum)
    assert(totalRow.head.getAs[Long]("n_bpe_tokens") == expected.valuesIterator.map(_._3).sum)
    val pins = out.filter(_.getAs[Long]("doc_id") != -1L)
    assert(pins.nonEmpty)
    pins.foreach { r =>
      val (w, c, t, head) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == w && r.getAs[Long]("n_chars") == c &&
        r.getAs[Long]("n_bpe_tokens") == t)
      assert(r.getAs[Long]("cpt_e6") == c * 1000000L / t)
      assert(r.getAs[String]("head_toks") == head)
    }
    // merges actually fire in the heads: some pinned head has a multi-char token
    assert(pins.exists(_.getAs[String]("head_toks").split(" ").exists(_.length > 1)))
  }

  test("events_asof equals a brute per-user scan; left rows and exact-tie semantics hold") {
    val ev = graft.core.Tables.events(spark, sf)
      // the nanos ts column reads as TIMESTAMP_NTZ on this Spark:
      // NTZ -> BIGINT is not a legal cast and unix_micros wants LTZ,
      // so hop through an LTZ cast (session tz is UTC — value-exact;
      // micros also preserve exact tie ordering where seconds don't)
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("ts_us"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val viewsByUser = ev.filter(_._4 == "view").groupBy(_._2)
      .map { case (u, rows) => u -> rows.map(r => (r._3, r._1)).sortBy(identity) }
    val expected = ev.filter(_._4 == "purchase").map { case (pid, u, pts, _) =>
      val prior = viewsByUser.getOrElse(u, Array.empty[(Long, Long)])
        .filter(_._1 <= pts)
      pid -> (if (prior.isEmpty) None else Some(prior.last._2))
    }.toMap
    val got = graft.operators.Relational.eventsAsof(spark, sf)
      .select($"event_id", $"view_event_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(1)) None else Some(r.getAs[Long]("view_event_id")))).toMap
    assert(got == expected)
    // left semantics are load-bearing: some purchases precede any view
    assert(got.valuesIterator.count(_.isEmpty) > 0)
    assert(got.valuesIterator.count(_.nonEmpty) > 0)
  }

  test("text_repetition equals brute-force gram coverage; both drop arms fire") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def grams(toks: Array[String], n: Int): Seq[String] =
      if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    def dupChars(gs: Seq[String]): Long =
      gs.groupBy(identity).valuesIterator
        .collect { case occ if occ.size > 1 => occ.size.toLong * occ.head.length }.sum
    def topChars(gs: Seq[String]): Long =
      if (gs.isEmpty) 0L
      else gs.groupBy(identity).valuesIterator
        .map(occ => occ.size.toLong * occ.head.length).max
    val expected = docs.map { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val tot = toks.map(_.length.toLong).sum
      val (d1, d2, d3) = (dupChars(toks.toSeq), dupChars(grams(toks, 2)), dupChars(grams(toks, 3)))
      val t2 = topChars(grams(toks, 2))
      val keep = tot > 0 && !(t2 * 5 > tot || d2 * 4 > tot)
      id -> ((toks.length.toLong, tot, d1, d2, d3, t2, keep))
    }.toMap
    val got = graft.text.TextOps.textRepetition(spark, sf)
      .select($"doc_id", $"n_tokens", $"sum_token_len", $"dup_word_chars",
        $"dup2_chars", $"dup3_chars", $"top2_chars", $"keep")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map { case (id, n, tot, d1, d2, d3, t2, k) => id -> ((n, tot, d1, d2, d3, t2, k)) }.toMap
    assert(got == expected)
    // the verdict must be load-bearing on this corpus: docs dropped by
    // the top-2-gram arm AND docs dropped by the duplicated-2-gram arm
    val byTop = expected.valuesIterator.count { case (_, tot, _, d2, _, t2, _) =>
      tot > 0 && t2 * 5 > tot }
    val byDup = expected.valuesIterator.count { case (_, tot, _, d2, _, _, _) =>
      tot > 0 && d2 * 4 > tot }
    val kept = expected.valuesIterator.count(_._7)
    assert(byTop > 0 && byDup > 0 && kept > 0,
      s"degenerate verdict split: byTop=$byTop byDup=$byDup kept=$kept")
  }

  test("curriculum_order: buckets are difficulty bands and sources round-robin within each") {
    val rows = graft.operators.Libraries.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // independent recompute of the full table
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong))
    val want = docs.map { case (id, src, nt) => (id, src, nt, nt / 16) }
      .groupBy(t => (t._4, t._2)).toSeq
      .flatMap { case (_, grp) =>
        grp.sortBy(_._1).zipWithIndex.map { case ((id, src, nt, b), i) =>
          (id, src, nt, b, (i + 1).toLong) }
      }.sortBy(t => (t._4, t._5, t._2, t._1))
    assert(rows.toSeq.sortBy(t => (t._4, t._5, t._2, t._1)) == want)
    // bucket IS the difficulty band: every bucket-b row has
    // n_tokens in [16b, 16b+16)
    rows.foreach { case (_, _, nt, b, _) => assert(nt / 16 == b) }
    // round-robin property: at training position (bucket, rr), every
    // source with >= rr docs in the bucket contributes EXACTLY one —
    // no source repeats before the others are exhausted
    rows.groupBy(_._4).foreach { case (b, grp) =>
      val perSource = grp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      grp.groupBy(_._5).foreach { case (rr, atRound) =>
        val expected = perSource.count(_._2 >= rr)
        assert(atRound.map(_._2).distinct.length == atRound.length,
          s"source repeated within round $rr of bucket $b")
        assert(atRound.length == expected,
          s"round $rr of bucket $b has ${atRound.length} sources, expected $expected")
      }
    }
    // interleaving is load-bearing: some bucket holds multiple sources
    assert(rows.groupBy(_._4).exists(_._2.map(_._2).distinct.length > 1))
  }
}
