package graft

import graft.embed.Embedder
import graft.operators.{Collections, Libraries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the libraries level, the write-path invariants, and the
  * index-parameterized query surface — the parts the DuckDB oracle
  * cannot check (auto-embedding, index interchangeability). The
  * SQL-expressible outputs (crud_library, crud_integrity,
  * crud_library_cascade, crud_update_merge, meta_filter) are
  * hash-checked by the driver oracle instead. */
class LibrariesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("crud_upsert_embed re-embeds updated content and keeps stored vectors") {
    val out = Libraries.crudUpsertEmbed(spark, sf).cache()
    val docs = graft.core.Tables.documents(spark, sf)
    // expected: updated rows embed upper(text), kept rows embed text
    val expected = docs.select($"doc_id",
        when($"doc_id" % 10 === 0, lit("updated")).otherwise(lit("kept")).as("op"),
        when($"doc_id" % 10 === 0, Embedder.embedText(upper($"text")))
          .otherwise(Embedder.embedText($"text")).as("embedding"))
      .select($"doc_id", $"op",
        graft.core.Stab.e6(sqrt(graft.functions.vectors.dotProduct($"embedding", $"embedding"))).as("norm_e6"),
        graft.core.Stab.e6(element_at($"embedding", 1).cast("double")).as("c0_e6"))
    val got = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = expected.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(out.filter($"op" === "updated").count() > 0)
  }

  test("crud_integrity surfaces both orphan kinds with correct parents") {
    val out = Libraries.crudIntegrity(spark, sf).cache()
    val kinds = out.select($"kind").distinct().as[String].collect().toSet
    assert(kinds == Set("doc_no_library", "chunk_no_document"))
    // every doc orphan's parent is the deleted library
    assert(out.filter($"kind" === "doc_no_library")
      .filter($"parent" =!= "src1").count() == 0)
    // every chunk orphan's doc is in the deleted-doc set
    assert(out.filter($"kind" === "chunk_no_document")
      .filter($"doc_id" % 7 =!= 3).count() == 0)
  }

  test("query surface: cosine variant matches the brute kNN ids") {
    val viaQuery = Collections.queryWithIndex(spark, sf, "cosine")
      .select($"q_id", $"id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = SparkEntry.queries("knn_brute_cosine")(spark, sf)
      .select($"q_id", $"neighbor_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaQuery == brute)
  }

  test("text query surface: cosine variant equals the /query e2e path; ivf/nsw serve k rows") {
    val e2eIds = Collections.queryE2E(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val cosIds = Collections.queryText(spark, sf, "cosine")
      .select($"id").as[Long].collect().toSet
    assert(cosIds == e2eIds)
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", substring($"text", 1, 40).as("expected_content"))
    for (idx <- Seq("ivf", "nsw")) {
      val out = Collections.queryText(spark, sf, idx).cache()
      assert(out.count() == 10, s"$idx returned ${out.count()} rows")
      assert(out.join(docs, out("id") === docs("doc_id"))
        .filter($"content" =!= $"expected_content").count() == 0, s"$idx content mismatch")
    }
  }

  test("query surface: ivf and nsw variants serve the same contract") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", substring($"text", 1, 40).as("expected_content"))
    for (idx <- Seq("ivf", "nsw")) {
      val out = Collections.queryWithIndex(spark, sf, idx).cache()
      // k rows per query, confidence non-increasing within a query
      val perQ = out.groupBy($"q_id").count().as[(Long, Long)].collect().toMap
      assert(perQ.size == 5 && perQ.values.forall(_ == 10L), s"$idx per-query counts $perQ")
      val rows = out.orderBy($"q_id", $"rank").collect()
      rows.grouped(10).foreach { g =>
        val scores = g.map(_.getAs[Long]("confidence_e6"))
        assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"$idx not sorted")
      }
      // the content join returned the right document text
      assert(out.join(docs, out("id") === docs("doc_id"))
        .filter($"content" =!= $"expected_content").count() == 0, s"$idx content mismatch")
    }
  }
}
