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
      // the co-location exchange must be SALTED: hashing on cluster_id
      // alone caps the n²/k candidate stage (and the map-side rerank
      // pre-cut below it) at cluster-count parallelism — measured on
      // the 10× replica, one task burned 400+ s while 31 cores idled
      val salted = exchanges.exists(_.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.exists(_.references.exists(_.name == "cosalt"))
        case _ => false
      })
      assert(salted,
        "no exchange hashes on the co-location salt — candidate-stage " +
          "parallelism is capped at the cluster count")
      // and the stage still answers: every corpus vector shortlisted
      val n = graft.core.Tables.embeddings(spark, sf).count()
      assert(cand.select($"q_id").distinct().count() == n)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("dedup_semantic_pq candidate stage: no float-array column rides any exchange") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = graft.dedup.Dedup.semanticDedupPqCand(spark, sf,
        tauE6 = 400000L, slack = graft.dedup.Dedup.sdcConfirmSlack)
      val plan = cand.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, "pair stage lost its cluster co-location shuffle?")
      exchanges.foreach { e =>
        val floatArrays = e.output.filter(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
        assert(floatArrays.isEmpty,
          s"pair-stage exchange carries full-width float arrays " +
            s"${floatArrays.map(_.name).mkString(",")}:\n$e")
      }
      // the pair-stage exchange must be salted (cluster-count ceiling)
      val salted = exchanges.exists(_.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.exists(_.references.exists(_.name == "cosalt"))
        case _ => false
      })
      assert(salted, "dedup pair stage is not salted")
      // and the stage still finds pairs on this corpus — an empty
      // candidate set would make the decisions-match pin vacuous
      assert(cand.count() > 0, "no candidate pairs at τ=0.40 + slack")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("knn_join_pq_asof candidate stage: no float-array column rides any exchange") {
    val path = graft.index.SnapshotLayout.pristineScenario(spark, sf)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = graft.index.SnapshotLayout.knnJoinPqAsOfCand(spark, path,
        batchId = 2L, nProbe = IvfIndex.defaultNProbe, rerank = 200, sub = "pq")
      val plan = cand.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, "as-of candidate stage lost its shuffles?")
      exchanges.foreach { e =>
        val floatArrays = e.output.filter(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
        assert(floatArrays.isEmpty,
          s"as-of candidate-stage exchange carries full-width float arrays " +
            s"${floatArrays.map(_.name).mkString(",")}:\n$e")
      }
      // the as-of candidate exchange must be salted too
      val salted = exchanges.exists(_.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.exists(_.references.exists(_.name == "cosalt"))
        case _ => false
      })
      assert(salted, "as-of candidate stage is not salted")
      // every live-as-of-2 vector shortlisted (tombstoned ids absent)
      val qs = cand.select($"q_id").distinct().collect().map(_.getLong(0)).toSet
      val live = graft.core.Tables.embeddings(spark, sf)
        .filter(!($"vec_id" < 25 && $"vec_id" % 7 === 0))
        .select($"vec_id").collect().map(_.getLong(0)).toSet
      assert(qs == live, "candidate q_id set != live-as-of-2 set")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
