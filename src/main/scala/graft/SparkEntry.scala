package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; every implemented operator has a `queries` entry and,
  * where DuckDB can express it, an `oracleSql` entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / analytics core
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join" -> (Relational.q3Join _),
    "q5_join" -> (Relational.q5Join _),
    "window_topk" -> (Relational.windowTopK _),
    "events_window_agg" -> (Relational.eventsWindowAgg _),
    "events_sessionize" -> (Relational.eventsSessionize _),
    // brute-force kNN family
    "knn_brute_cosine" -> (KnnSearch.bruteCosine _),
    "knn_brute_dot" -> (KnnSearch.bruteDot _),
    "knn_brute_l2" -> (KnnSearch.bruteL2 _),
    "knn_join_exact" -> (KnnSearch.knnJoinExact _),
  )

  /** DuckDB-runnable ANSI SQL twin for each oracle-checkable query. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_join" -> Relational.q3JoinSql,
    "q5_join" -> Relational.q5JoinSql,
    "window_topk" -> Relational.windowTopKSql,
    "events_window_agg" -> Relational.eventsWindowAggSql,
    "events_sessionize" -> Relational.eventsSessionizeSql,
    "knn_brute_cosine" -> KnnSearch.bruteCosineSql,
    "knn_brute_dot" -> KnnSearch.bruteDotSql,
    "knn_brute_l2" -> KnnSearch.bruteL2Sql,
    "knn_join_exact" -> KnnSearch.knnJoinExactSql,
  )
}
