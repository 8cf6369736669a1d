package graft

import org.scalatest.funsuite.AnyFunSuite

/** `index_recall_eval` is the nightly index-health table: every
  * approximate family's recall@k vs the exact scan under its own
  * metric, each with a spec-pinned bar. This spec IS the gate the
  * `meets_bar` column claims — if a family's recall regresses below
  * its published bar, the suite fails, not just the report row.
  */
class RecallEvalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every index family meets its recall bar and the table shape is exact") {
    val rows = graft.index.RecallEval.indexRecallEval(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("bq", "ivf", "ivf_bq", "ivf_filtered", "lsh", "nsw",
        "nsw_filtered", "nsw_pq", "nsw_pq_filtered", "nsw_pq_opq",
        "pca16", "pq", "pq_filtered", "pq_opq", "sq8"),
      "one row per family, sorted")
    // the rotated tiers serve at the family bar and within noise of
    // the unrotated builds: this synthetic corpus is near-isotropic
    // (the pca16 row documents the same property), so the OPQ lift is
    // ~0 here and quantization-boundary noise of ±1-2 neighbors out
    // of the hit pool is expected — a LARGER gap would mean the
    // rotation plumbing (fit/encode/query) is broken. Orthonormality
    // of the fitted basis is pinned exactly in PqSpec. The graph
    // twin's tolerance is wider (k=5 over 5 queries = 25 hits, so ONE
    // flipped neighbor moves the mean by 0.04; the walk also re-sorts
    // frontiers on the rotated distances, compounding the boundary
    // noise the flat ADC pre-rank doesn't have).
    val byIdx = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byIdx("pq_opq") >= byIdx("pq") - 40000L,
      s"OPQ rotation lost recall beyond noise: ${byIdx("pq_opq")} vs ${byIdx("pq")}")
    assert(byIdx("nsw_pq_opq") >= byIdx("nsw_pq") - 80000L,
      s"graph OPQ rotation lost recall beyond noise: " +
        s"${byIdx("nsw_pq_opq")} vs ${byIdx("nsw_pq")}")
    rows.foreach { r =>
      val (idx, nq, k, recall, bar, meets) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))
      assert(nq == 5, s"$idx evaluated the fixed 5-query workload")
      assert(k == (if (Set("nsw", "nsw_pq", "nsw_pq_opq")(idx)) 5L else 10L),
        s"$idx k")
      assert(recall >= 0L && recall <= 1000000L, s"$idx recall in [0,1e6]")
      assert(meets == (recall >= bar), s"$idx meets_bar consistent")
      assert(meets, s"$idx recall ${recall / 1e6} below bar ${bar / 1e6}")
    }
  }

  test("ivf_probe_curve: recall non-decreasing in nProbe, exact at full probe, load-bearing spread") {
    val rows = graft.index.RecallEval.ivfProbeCurve(spark, sf)
      .collect().map(r => (r.getAs[Long]("n_probe"), r.getAs[Long]("mean_recall_e6")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      graft.index.RecallEval.probeSweep.map(_.toLong).sorted)
    rows.sliding(2).foreach { case Array((pa, ra), (pb, rb)) =>
      assert(ra <= rb, s"recall dropped from nProbe=$pa ($ra) to $pb ($rb)")
    }
    // probing every cluster IS the exact scan — identity, not a bar
    assert(rows.last._2 == 1000000L, "full probe not exact")
    // the curve genuinely discriminates: a single-probe search must
    // lose recall vs the full scan on this near-uniform corpus
    assert(rows.head._2 < 1000000L, "nProbe=1 already exact — curve inert")
    // the checked grid the registry serves is all-true
    val grid = graft.index.RecallEval.ivfProbeCurveChecked(spark, sf).collect()
    assert(grid.length == rows.length)
    grid.foreach { r =>
      assert(r.getAs[Boolean]("recall_bounded") && r.getAs[Boolean]("not_below_prev") &&
        r.getAs[Boolean]("full_probe_exact"))
    }
  }

  test("nsw_beam_curve: grid monotone, exact at exhaustive point, load-bearing spread") {
    val rows = graft.index.RecallEval.nswBeamCurve(spark, sf)
      .collect().map(r => ((r.getAs[Long]("max_hops"), r.getAs[Long]("beam_width")),
        r.getAs[Long]("mean_recall_e6"))).toMap
    val hops = graft.index.RecallEval.hopSweep.map(_.toLong)
    val beams = graft.index.RecallEval.beamSweep.map(_.toLong)
    val exh = graft.index.RecallEval.exhaustiveBeam
    val prodHops = graft.index.NswIndex.hops.toLong
    assert(rows.keySet ==
      (for (h <- hops; b <- beams) yield (h, b)).toSet + ((prodHops, exh)))
    // measured monotone-in-beam within EVERY hops row (the hop-1 row
    // is provable; the production row is pinned here as measured)
    hops.foreach { h =>
      beams.sliding(2).foreach { case Seq(ba, bb) =>
        assert(rows((h, ba)) <= rows((h, bb)),
          s"recall dropped from beam=$ba to $bb at hops=$h")
      }
    }
    // monotone-in-hops at every beam (provable: supersteps only add)
    beams.foreach { b =>
      assert(rows((hops.head, b)) <= rows((prodHops, b)),
        s"recall dropped from hops=${hops.head} to $prodHops at beam=$b")
    }
    // seeding EVERY node scores the whole corpus at hop 0 — identity
    assert(rows((prodHops, exh)) == 1000000L, "exhaustive point not exact")
    // the curve genuinely discriminates: the starved corner must lose
    // recall vs the exhaustive scan, else the grid pins nothing
    assert(rows((hops.head, beams.head)) < 1000000L,
      "starved corner already exact — curve inert")
    // production cap with in-range beam clears the family's 0.9 bar
    assert(rows((prodHops, 32L)) >= 900000L, "recall@prod below 0.9 bar")
    val grid = graft.index.RecallEval.nswBeamCurveChecked(spark, sf).collect()
    assert(grid.length == rows.size)
    grid.foreach { r =>
      assert(r.getAs[Boolean]("recall_bounded") &&
        r.getAs[Boolean]("hop1_beam_monotone") &&
        r.getAs[Boolean]("not_below_hop1") &&
        r.getAs[Boolean]("exhaustive_exact"))
    }
  }
}
