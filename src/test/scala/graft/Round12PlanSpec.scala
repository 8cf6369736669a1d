package graft

import graft.index.NswIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 plan-shape pins for the ADC beam walk: the compressed
  * tier's scale claim is that full-width vectors move only through
  * the final bounded rerank — never through an exchange — and that
  * the rerank's joins are broadcasts of the |q|·rerank candidate set,
  * not corpus shuffles. A plan regression (a SortMergeJoin sneaking
  * into the rerank, an embedding array riding a shuffle) would keep
  * the results correct while silently re-introducing the memory/IO
  * ceiling the tier exists to remove.
  */
class Round12PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("nsw_search_pq serve: no array column rides an exchange; rerank joins are broadcasts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan12")
      .toString
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    NswIndex.persist(emb, NswIndex.edgesCached(spark, sf), dir)
    NswIndex.persistPq(spark, dir)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // AQE wraps exchanges in query stages the tree collect can't see
    // (the Round11PlanSpec discipline): build AND inspect with it off
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = NswIndex.searchPersistedPq(spark, dir, queries)
      val plan = served.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      exchanges.foreach { e =>
        val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(arrays.isEmpty,
          s"rerank exchange carries array columns " +
            s"${arrays.map(_.name).mkString(",")}:\n$e")
      }
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.isEmpty,
        s"rerank plan sort-merge-joins (a corpus shuffle):\n" +
          smj.map(_.toString).mkString("\n"))
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, "rerank plan has no broadcast join — shape changed?")
      // and the serve still answers
      assert(served.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
