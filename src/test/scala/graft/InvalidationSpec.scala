package graft

import java.nio.file.Files

import graft.operators.Collections
import graft.store.CollectionStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-then-search visibility: the reference reflects every write in
  * the next search because it rebuilds the index inside `search()`
  * (collection.py:195-200); the memoized Spark indexes must match that
  * contract via version invalidation (graft.store.VersionedMemo), not
  * by luck of cache lifetime. */
class InvalidationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val Sentinel = 424242L

  private def seedDocsDir(): String = {
    val tmp = Files.createTempDirectory("graft_inval").toFile.getAbsolutePath
    val docs = graft.core.Tables.documents(spark, sf).filter($"doc_id" < 80)
    new CollectionStore(spark, s"$tmp/documents.parquet", "doc_id")
      .upsert(docs, nowMs = 1000L)
    tmp
  }

  test("upsert invalidates memoized text-query indexes: brute/ivf/nsw see the new document") {
    val dir = seedDocsDir()
    val store = new CollectionStore(spark, s"$dir/documents.parquet", "doc_id")
    val indexes = Seq("cosine", "ivf", "nsw")
    val before = indexes.map { idx =>
      idx -> Collections.queryText(spark, dir, idx).select($"id").as[Long].collect().toSeq
    }.toMap
    before.foreach { case (idx, ids) =>
      assert(!ids.contains(Sentinel), s"$idx: sentinel visible before the write")
    }
    // upsert a document whose text IS the demo query text — an exact
    // embedding match, cosine 1.0, must be the #1 hit of a fresh index
    val newDoc = graft.core.Tables.documents(spark, sf).filter($"doc_id" === 0)
      .withColumn("doc_id", lit(Sentinel))
      .withColumn("text", lit(Collections.DemoQueryText))
    store.upsert(newDoc, nowMs = 2000L)
    indexes.foreach { idx =>
      val after = Collections.queryText(spark, dir, idx)
        .select($"id", $"rank").as[(Long, Long)].collect().toSeq
      assert(after.map(_._1).contains(Sentinel),
        s"$idx: upserted document missing from post-write query (stale index)")
      assert(after.find(_._1 == Sentinel).get._2 == 1L,
        s"$idx: exact-match document should rank first")
    }
  }

  test("reset invalidates too: a reseeded store no longer serves the upserted doc") {
    val dir = seedDocsDir()
    val store = new CollectionStore(spark, s"$dir/documents.parquet", "doc_id")
    val newDoc = graft.core.Tables.documents(spark, sf).filter($"doc_id" === 0)
      .withColumn("doc_id", lit(Sentinel))
      .withColumn("text", lit(Collections.DemoQueryText))
    store.upsert(newDoc, nowMs = 2000L)
    val withSentinel = Collections.queryText(spark, dir, "cosine")
      .select($"id").as[Long].collect()
    assert(withSentinel.contains(Sentinel))
    store.reset(graft.core.Tables.documents(spark, sf).filter($"doc_id" < 80),
      nowMs = 3000L)
    val afterReset = Collections.queryText(spark, dir, "cosine")
      .select($"id").as[Long].collect()
    assert(!afterReset.contains(Sentinel),
      "reset store still serves the pre-reset document (stale index)")
  }

  test("upsert invalidates the memoized IVF index over an embeddings store") {
    val tmp = Files.createTempDirectory("graft_inval_emb").toFile.getAbsolutePath
    val emb = graft.core.Tables.embeddings(spark, sf)
    val store = new CollectionStore(spark, s"$tmp/embeddings.parquet", "vec_id")
    store.upsert(emb, nowMs = 1000L)
    def top10ForQ0(): Seq[Long] = {
      val built = graft.index.IvfIndex.buildCached(spark, tmp)
      val q = graft.core.Tables.embeddings(spark, tmp).filter($"vec_id" === 0)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      graft.index.IvfIndex.search(built, q)
        .select($"neighbor_id").as[Long].collect().toSeq
    }
    assert(!top10ForQ0().contains(Sentinel))
    // a new vector identical to vector 0 → cosine 1.0 to query 0, must
    // appear in a fresh index's top-10
    val clone = emb.filter($"vec_id" === 0).withColumn("vec_id", lit(Sentinel))
    store.upsert(clone, nowMs = 2000L)
    assert(top10ForQ0().contains(Sentinel),
      "upserted vector missing from post-write IVF search (stale index)")
  }
}
