package graft

import graft.functions.vectors._
import graft.plans.AnnRewrite
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `SparkSessionExtensions` ANN rewrite: inert by default, fires
  * only on the exact brute-force pattern under the flag, preserves
  * output resolution for downstream operators, and serves with the
  * IVF family's recall. */
class AnnRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  private def scansParquetCorpus(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains("embeddings.parquet"))
        case _ => false
      }
      case _ => false
    }

  private def queryVecs: Seq[(Long, Array[Float])] = {
    import spark.implicits._
    graft.core.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 5).select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toSeq
  }

  test("flag off: the brute plan scans the corpus, untouched") {
    spark.conf.unset("spark.graft.ann.rewrite")
    val df = AnnRewrite.brutePlan(spark, sf, queryVecs.head._2, 10)
    assert(scansParquetCorpus(df), "rule fired with the flag off")
    assert(df.count() == 10)
  }

  test("flag on: plan rewritten to the index, recall holds, parents still resolve") {
    val qs = queryVecs
    // exact baselines, flag off
    spark.conf.unset("spark.graft.ann.rewrite")
    val exact = qs.map { case (qid, qv) =>
      qid -> AnnRewrite.brutePlan(spark, sf, qv, 10)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    }.toMap
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      var hit = 0; var total = 0
      qs.foreach { case (qid, qv) =>
        val df = AnnRewrite.brutePlan(spark, sf, qv, 10)
        assert(!scansParquetCorpus(df),
          s"query $qid not rewritten:\n${df.queryExecution.optimizedPlan}")
        val got = df.collect().map(_.getAs[Long]("vec_id")).toSet
        assert(got.size == 10, s"query $qid returned ${got.size} rows")
        hit += (got & exact(qid)).size; total += 10
      }
      assert(hit.toDouble / total >= 0.9,
        s"rewrite recall@10 ${hit.toDouble / total} below the IVF family bar")
      // downstream operators above the rewritten limit keep resolving
      // (output exprIds preserved) — and the query's own vector leads
      val (qid, qv) = qs.head
      val top = AnnRewrite.brutePlan(spark, sf, qv, 10)
        .filter(col("score") > 0.99).select(col("vec_id")).collect()
      assert(top.map(_.getLong(0)).contains(qid))
    } finally spark.conf.unset("spark.graft.ann.rewrite")
  }

  test("guarded: a filter on a non-meta column stays exact under the flag") {
    import spark.implicits._
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val qv = queryVecs.head._2
      // references `embedding`, which the meta posting rows can't
      // replay as a metadata predicate — the rule must keep the
      // exact plan (meta-column filters like `label >= 0` DO rewrite
      // now; see the filtered tests below)
      val df = graft.core.Tables.embeddings(spark, sf)
        .filter(size($"embedding") === 64)
        .select($"vec_id", cosineSim($"embedding", typedlit(qv)).as("score"))
        .orderBy($"score".desc, $"vec_id".asc)
        .limit(10)
      assert(scansParquetCorpus(df), "rule fired on a guarded (non-meta filter) plan")
    } finally spark.conf.unset("spark.graft.ann.rewrite")
  }

  test("guarded: an id-equality predicate stays exact under the flag") {
    import spark.implicits._
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      val qv = queryVecs.head._2
      // `vec_id = 42` is a point predicate: under a fixed nProbe the
      // probe returns EMPTY whenever vector 42's cluster isn't probed
      // — the rule must decline and keep the exact plan, which always
      // returns exactly the one matching row
      val df = graft.core.Tables.embeddings(spark, sf)
        .filter($"vec_id" === 42L)
        .select($"vec_id", cosineSim($"embedding", typedlit(qv)).as("score"))
        .orderBy($"score".desc, $"vec_id".asc)
        .limit(10)
      assert(scansParquetCorpus(df), "rule fired on an id-equality plan")
      val got = df.collect()
      assert(got.length == 1 && got.head.getLong(0) == 42L)
      // IN-list shape declines identically
      val dfIn = graft.core.Tables.embeddings(spark, sf)
        .filter($"vec_id".isin(7L, 42L, 99L))
        .select($"vec_id", cosineSim($"embedding", typedlit(qv)).as("score"))
        .orderBy($"score".desc, $"vec_id".asc)
        .limit(10)
      assert(scansParquetCorpus(dfIn), "rule fired on an id-IN plan")
      assert(dfIn.collect().map(_.getLong(0)).toSet == Set(7L, 42L, 99L))
    } finally spark.conf.unset("spark.graft.ann.rewrite")
  }

  test("filtered rewrite: meta predicate fires, results match the exact filtered top-k") {
    import spark.implicits._
    val queries = graft.core.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 5).select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    // exact filtered baseline, computed flag-OFF (a join-shaped plan
    // would also dodge the rule, but flag-off is unambiguous)
    spark.conf.unset("spark.graft.ann.rewrite")
    val exact = queries.map { case (qid, qv, lbl) =>
      qid -> AnnRewrite.bruteFilteredPlan(spark, sf, qv, lbl, 10).collect()
        .map(r => (r.getAs[Long]("vec_id"),
          math.floor(r.getAs[Double]("score") * 1000000.0 + 0.5).toLong)).toSeq
    }.toMap
    spark.conf.set("spark.graft.ann.rewrite", "true")
    try {
      var hits = 0
      var total = 0
      queries.foreach { case (qid, qv, lbl) =>
        val df = AnnRewrite.bruteFilteredPlan(spark, sf, qv, lbl, 10)
        assert(!scansParquetCorpus(df), s"filtered rule did not fire for q=$qid")
        val got = df.collect().map(r => (r.getAs[Long]("vec_id"),
          math.floor(r.getAs[Double]("score") * 1000000.0 + 0.5).toLong)).toSeq
        // approximate serve: the IVF family's recall bar, with the
        // self-hit pinned (the query passes its own filter and
        // nProbe covers its own cluster)
        assert(got.head == exact(qid).head, s"top-1 diverged for q=$qid")
        hits += got.map(_._1).toSet.intersect(exact(qid).map(_._1).toSet).size
        total += exact(qid).size
      }
      assert(hits.toDouble / total >= 0.8,
        s"filtered rewrite recall ${hits.toDouble / total} below 0.8")
    } finally spark.conf.unset("spark.graft.ann.rewrite")
  }

  test("layout=nsw: filtered shape serves from the graph walk, all hits pass the filter") {
    import spark.implicits._
    val qs = graft.core.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 5).select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Int]("label")))
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    // exact filtered baselines, flag off
    spark.conf.unset("spark.graft.ann.rewrite")
    val exact = qs.map { case (qid, qv, lbl) =>
      qid -> AnnRewrite.bruteFilteredPlan(spark, sf, qv, lbl, 10)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    }.toMap
    spark.conf.set("spark.graft.ann.rewrite", "true")
    spark.conf.set("spark.graft.ann.rewrite.layout", "nsw")
    try {
      var hit = 0; var total = 0
      qs.foreach { case (qid, qv, lbl) =>
        val df = AnnRewrite.bruteFilteredPlan(spark, sf, qv, lbl, 10)
        assert(!scansParquetCorpus(df),
          s"filtered shape not rewritten under layout=nsw for q=$qid")
        val got = df.collect().map(_.getAs[Long]("vec_id"))
        assert(got.length == 10, s"q=$qid served ${got.length} rows")
        got.foreach(id => assert(labels(id) == lbl,
          s"q=$qid hit $id violates the label predicate"))
        hit += (got.toSet & exact(qid)).size; total += 10
      }
      assert(hit.toDouble / total >= 0.8,
        s"nsw-layout filtered recall ${hit.toDouble / total} below 0.8")
      // unfiltered shapes still serve from the IVF probe (10 rows, no scan)
      val un = AnnRewrite.brutePlan(spark, sf, qs.head._2, 10)
      assert(!scansParquetCorpus(un))
      assert(un.count() == 10)
    } finally {
      spark.conf.unset("spark.graft.ann.rewrite")
      spark.conf.unset("spark.graft.ann.rewrite.layout")
    }
  }

  test("layout=nsw: a vec_id-range predicate falls back to the IVF probe, not a crash") {
    import spark.implicits._
    // the beam walk's frames rename vec_id to node, so a replayed
    // vec_id predicate cannot resolve inside the nsw path — the rule
    // must serve these shapes from the IVF probe (whose posting rows
    // keep vec_id) instead of throwing AnalysisException mid-rule
    spark.conf.set("spark.graft.ann.rewrite", "true")
    spark.conf.set("spark.graft.ann.rewrite.layout", "nsw")
    try {
      val qv = queryVecs.head._2
      val df = graft.core.Tables.embeddings(spark, sf)
        .filter($"vec_id" > 100L)
        .select($"vec_id", cosineSim($"embedding", typedlit(qv)).as("score"))
        .orderBy($"score".desc, $"vec_id".asc)
        .limit(10)
      assert(!scansParquetCorpus(df),
        "vec_id-range shape under layout=nsw did not rewrite at all")
      val got = df.collect().map(_.getAs[Long]("vec_id"))
      assert(got.length == 10)
      got.foreach(id => assert(id > 100L, s"hit $id violates the range predicate"))
    } finally {
      spark.conf.unset("spark.graft.ann.rewrite")
      spark.conf.unset("spark.graft.ann.rewrite.layout")
    }
  }

  test("filtered registry grid is all-true including passes_filter") {
    val rows = AnnRewrite.annRewriteFilteredChecked(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      Seq("id_in_corpus", "score_exact", "top1_exact", "monotone",
        "passes_filter", "served_by_index").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c failed at q=${r.getAs[Long]("q_id")} rank=${r.getAs[Long]("rank")}")
      }
    }
  }

  test("registry contract grid is all-true including the served_by_index attestation") {
    val rows = AnnRewrite.annRewriteChecked(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      Seq("id_in_corpus", "score_exact", "top1_exact", "monotone",
        "served_by_index").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c failed at q=${r.getAs[Long]("q_id")} rank=${r.getAs[Long]("rank")}")
      }
    }
  }
}
