package graft

import graft.index.IvfIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 plan-shape pins for the compressed batch kNN join
  * (`knn_join_pq`): its scale claim over `knn_join_ivf` is that the
  * n²-shaped candidate stage moves NO full-width float arrays — the
  * cluster co-location exchange carries m-byte codes and keys only,
  * and each candidate pair costs m broadcast-table adds instead of a
  * d-float dot product. Raw vectors move only through the bounded
  * n×rerank shortlist attach. A plan regression (the embedding array
  * sneaking onto the co-location exchange, a per-query window spent
  * on probe ranking) would keep results correct while silently
  * re-introducing the exchange width the compressed tier removes.
  */
class Round13PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("knn_join_pq candidate stage: no float-array column rides any exchange; one window (the rerank cut)") {
    val base = IvfIndex.pqLayoutFor(spark, sf)
    // AQE wraps exchanges in query stages the tree collect can't see
    // (the Round11PlanSpec discipline): build AND inspect with it off
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = IvfIndex.knnJoinPqCand(spark, base,
        nProbe = IvfIndex.defaultNProbe, rerank = 200, sub = "pq")
      val plan = cand.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, "candidate stage lost its co-location shuffle?")
      exchanges.foreach { e =>
        val floatArrays = e.output.filter(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
        assert(floatArrays.isEmpty,
          s"candidate-stage exchange carries full-width float arrays " +
            s"${floatArrays.map(_.name).mkString(",")}:\n$e")
      }
      // probe ranking must stay map-side (the knn_join_ivf discipline):
      // the only Window is the per-query rerank cut
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.length == 1,
        s"expected exactly one Window (the rerank cut), got ${windows.length}")
      // and the stage still answers: every corpus vector shortlisted
      val n = graft.core.Tables.embeddings(spark, sf).count()
      assert(cand.select($"q_id").distinct().count() == n)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
