package graft

import graft.index.BqIndex
import graft.operators.TpchExtra
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-8 TPC-H adaptations and the BQ
  * serve — the properties the scaladocs claim must be visible in the
  * executed plan, not just asserted in prose.
  */
class TpchExtraSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = SparkTestSession.sf

  test("q21: the EXISTS/NOT-EXISTS self-joins plan as LeftSemi + LeftAnti") {
    val plan = TpchExtra.q21Waiting(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join in plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in plan:\n$plan")
  }

  test("q9/q2: dims broadcast into the fact scan") {
    Seq(
      "q9" -> TpchExtra.q9Profit(spark, dir),
      "q2" -> TpchExtra.q2MinCost(spark, dir)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: no broadcast dim join in plan:\n$plan")
    }
  }

  test("q11: partial aggregation before the part-key shuffle") {
    val plan = TpchExtra.q11Important(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"no partial agg in plan:\n$plan")
  }

  test("knn_brute_bq: heap-pruned Hamming rank, broadcast rerank fetch") {
    val plan = BqIndex.knnBruteBq(spark, dir)
      .queryExecution.executedPlan.toString
    // the top-R cut must run as WindowGroupLimit (per-partition R-row
    // heaps before the one rank shuffle), and the rerank must fetch
    // vectors by broadcasting the survivors INTO the corpus scan
    assert(plan.contains("WindowGroupLimit"), s"no group limit:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast rerank:\n$plan")
  }

  test("the six adapted queries are non-degenerate at sf0.001") {
    val counts = Seq(
      "q9_profit" -> TpchExtra.q9Profit(spark, dir).count(),
      "q11_important" -> TpchExtra.q11Important(spark, dir).count(),
      "q16_suppcnt" -> TpchExtra.q16SuppCnt(spark, dir).count(),
      "q21_waiting" -> TpchExtra.q21Waiting(spark, dir).count(),
      "q2_mincost" -> TpchExtra.q2MinCost(spark, dir).count(),
      "q20_excess" -> TpchExtra.q20Excess(spark, dir).count())
    counts.foreach { case (name, n) =>
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
