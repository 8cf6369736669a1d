package graft

import graft.operators.{AnalyticsExtra, GraphOps, SkewJoin, TpchExtra}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for this session's operators — each
  * scaladoc's 100 TB claim checked against the EXECUTED plan.
  */
class Round8PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = SparkTestSession.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q12: returnflag+year predicates prune the lineitem SCAN, partial-agged rollup") {
    val p = plan(TpchExtra.q12Shipmode(spark, dir))
    // pushed into the parquet source, not a post-scan filter only
    assert(p.contains("In(l_returnflag"), s"returnflag not pushed to scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"year window not pushed:\n$p")
    // the CASE counts combine map-side before the 2-row group shuffle
    assert(p.contains("partial_sum"), s"no partial agg:\n$p")
    // (at sf0.001 AQE broadcasts the filtered orders side — correct
    // when it fits; the fact⋈fact shuffle claim is a scale behavior,
    // not assertable at test SF)
  }

  test("stats_corr: every moment rides ONE aggregation (no per-pair scans)") {
    val p = plan(AnalyticsExtra.statsCorr(spark, dir))
    // one partial + one final global agg over the feature frame; a
    // per-pair formulation would show 3+ aggregate pairs
    val nAggs = "HashAggregate|SortAggregate".r.findAllIn(p).size
    assert(nAggs <= 4, s"expected one partial+final agg chain, got $nAggs:\n$p")
  }

  test("events_dau_wau: no window operator — dedup-then-scatter only") {
    val p = plan(AnalyticsExtra.eventsDauWau(spark, dir))
    assert(!p.contains("Window"), s"window leaked into the DAU/WAU plan:\n$p")
    assert(p.contains("Generate explode"), s"no scatter explode:\n$p")
  }

  test("doc_len_hist: the cumulative window runs over the AGGREGATED frame") {
    val p = plan(AnalyticsExtra.docLenHist(spark, dir))
    // the Window must sit above an aggregate, and the only corpus-
    // volume operator is that aggregate's partial side
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, s"no window in plan:\n$p")
    assert(p.indexOf("HashAggregate") >= 0 || p.indexOf("SortAggregate") >= 0)
  }

  test("graph_pagerank: bounded supersteps, no cartesian product") {
    val df = GraphOps.graphPagerank(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in pagerank plan:\n$p")
    // ranks stay in the damped band — the integer recurrence cannot
    // escape [0.15e6, corpus mass]
    val ranks = df.collect().map(_.getLong(2))
    assert(ranks.nonEmpty && ranks.forall(_ >= 150000L))
  }

  test("join_salted: the dim side explodes over the salt; events side hashes the salt") {
    val p = plan(SkewJoin.joinSalted(spark, dir))
    assert(p.contains("Generate explode"), s"no salt explode:\n$p")
    assert(p.contains("pmod"), s"no deterministic salt hash:\n$p")
  }
}
