package graft

import graft.embed.Embedder
import graft.functions.vectors._
import graft.index.{IvfIndex, LshIndex, NswIndex}
import graft.store.CollectionStore
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class VectorFunctionsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("cosine/dot/l2 match hand computation and handle zero vectors") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal
      (Array(1f, 2f, 2f), Array(1f, 2f, 2f)), // identical
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f)), // zero norm
      (Array(3f, 4f, 0f), Array(4f, 3f, 0f)),
    ).toDF("a", "b")
    val rows = df.select(
      cosineSim($"a", $"b"), dotProduct($"a", $"b"), l2Distance($"a", $"b")
    ).collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getDouble(1) == 0.0)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    assert(rows(2).getDouble(0) == 0.0) // zero-norm guard, reference collection.py:311
    assert(math.abs(rows(3).getDouble(0) - 24.0 / 25.0) < 1e-12)
    assert(math.abs(rows(3).getDouble(2) - math.sqrt(2.0)) < 1e-12)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosineSim($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("expression family is callable from plain SQL after registration") {
    graft.functions.registry.register(spark)
    Seq(("the quick brown fox over the lazy dog", Array(3f, 4f), Array(4f, 3f)))
      .toDF("t", "a", "b").createOrReplaceTempView("reg_probe")
    val row = spark.sql(
      """SELECT cosine_sim(a, b), dot_product(a, b), l2_distance(a, b),
        |  simhash60(hashed_word_shingles(t, 1)),
        |  size(minhash_signature(hashed_word_shingles(t, 3), 16)),
        |  size(word_shingles(t, 2)),
        |  size(winnow_fingerprints(t, 8, 4)),
        |  size(text_embed(t, 64))
        |FROM reg_probe""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - 24.0 / 25.0) < 1e-12)
    assert(row.getDouble(1) == 24.0)
    assert(math.abs(row.getDouble(2) - math.sqrt(2.0)) < 1e-12)
    assert(row.getLong(3) >= 0L)
    assert(row.getInt(4) == 16)
    assert(row.getInt(5) == 7) // 8 tokens → 7 bigrams
    assert(row.getInt(6) > 0)
    assert(row.getInt(7) == 64)
  }
}

class EmbedderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("embedder is deterministic, unit-norm, dim-sized, case/punct-insensitive") {
    val df = Seq("the quick brown fox", "THE QUICK  brown, fox!", "", "   ").toDF("t")
    val rows = df.select(Embedder.embedText($"t").as("e")).collect()
      .map(_.getSeq[Float](0))
    assert(rows.forall(_.length == 64))
    assert(rows(0) == rows(1)) // tokenization normalizes case + punctuation
    val norm = math.sqrt(rows(0).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(rows(2).forall(_ == 0f) && rows(3).forall(_ == 0f)) // empty text → zero vector
  }
}

/** Recall of each ANN path against exact brute force on sf0.001. */
class AnnRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  private def neighborSets(df: DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(col("rank") <= k).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("neighbor_id")).toSet }

  private def recall(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double = {
    val per = want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }
    per.sum / per.size
  }

  lazy val brute = neighborSets(SparkEntry.queries("knn_brute_cosine")(spark, sf), 10)

  test("IVF probe search recall@10 >= 0.9 vs brute force") {
    // raw hit frame: the registry entry now serves the contract grid
    val ivf = neighborSets(IvfIndex.ivfSearch(spark, sf), 10)
    val r = recall(ivf, brute)
    assert(r >= 0.9, s"IVF recall $r")
  }

  test("LSH bucketed search recall@10 >= 0.6 vs brute force") {
    val lsh = neighborSets(LshIndex.annLshBucketed(spark, sf), 10)
    val r = recall(lsh, brute)
    assert(r >= 0.6, s"LSH recall $r")
  }

  test("persisted IVF layout (partitionBy cluster_id) returns identical results") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, sf)
    val built = IvfIndex.build(spark, emb)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.persist(built, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val inMem = IvfIndex.search(built, queries).collect().map(_.toString).sorted
    val onDisk = IvfIndex.searchPersisted(spark, dir, queries).collect().map(_.toString).sorted
    assert(inMem.nonEmpty && inMem.sameElements(onDisk))
  }

  test("NSW beam search recall@5 >= 0.9 vs brute force") {
    val bruteTop5 = brute.map { case (q, _) =>
      q -> neighborSets(SparkEntry.queries("knn_brute_cosine")(spark, sf), 5)(q)
    }
    val nsw = neighborSets(NswIndex.nswSearch(spark, sf), 5)
    val r = recall(nsw, bruteTop5)
    assert(r >= 0.9, s"NSW recall $r")
  }

  test("LSH-bucketed NSW graph build agrees >= 0.9 with the exact build") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val exact = NswIndex.buildEdges(emb).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val lsh = NswIndex.buildEdgesLsh(emb).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val agreement = lsh.intersect(exact).size.toDouble / exact.size
    assert(agreement >= 0.9, s"edge agreement $agreement (${lsh.size} lsh vs ${exact.size} exact)")
  }

  test("LSH-bucketed embedding near-dup recalls >= 0.9 of the exact threshold pairs") {
    import graft.functions.vectors.cosineSim
    val emb = graft.core.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val exact = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        graft.core.Stab.e6(cosineSim(col("a.embedding"), col("b.embedding"))).as("cos_e6"))
      .filter(col("cos_e6") >= 400000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.dedup.Dedup.embeddingNearDupLsh(spark, sf)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(exact.nonEmpty)
    // LSH candidates are a subset; every surviving pair is exact-confirmed
    assert(lsh.subsetOf(exact), s"${(lsh -- exact).size} non-exact pairs leaked")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"embedding-LSH pair recall $recall (${lsh.size}/${exact.size})")
  }

  test("persisted IVF probe scan is partition-pruned on cluster_id") {
    import org.apache.spark.sql.functions.col
    val emb = graft.core.Tables.embeddings(spark, sf)
    val built = IvfIndex.build(spark, emb)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-dpp").toString
    IvfIndex.persist(built, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val result = IvfIndex.searchPersisted(spark, dir, queries)
    val plan = result.queryExecution.executedPlan.toString
    // The probe join is a broadcast on the partition column, so DPP
    // must turn the index scan into a pruned read of the probed
    // cluster_id= directories, not a full-index scan.
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(4000)}")
    assert(result.count() > 0)
  }
}

class LshSaltSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("saltedCandidatePairs has no Window and bounds candidates on a one-bucket corpus") {
    // Degenerate corpus: every vector near-codirectional, so sign-LSH
    // piles ALL rows into one bucket per table — exactly the case the
    // salting guards. The old bucket-size window would shuffle that
    // whole bucket into a single task before splitting it.
    val n = 400
    val cap = 16
    val dim = graft.embed.Embedder.DefaultDim
    val rng = new scala.util.Random(7)
    val emb = (0 until n).map { i =>
      val v = Array.tabulate(dim)(d => 1f + (rng.nextFloat() - 0.5f) * 0.001f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val cp = graft.index.LshIndex.saltedCandidatePairs(
      emb, nTables = 2, nBits = 4, bucketCap = cap, seedBase = 99L)
    val pairs = cp.pairs
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bucket sizing must not use a window (hot bucket → one task):\n${plan.take(3000)}")
    val rows = pairs.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b) => a != b })
    // per-bucket salting bounds total candidates at ~n·cap·tables even
    // though every row landed in one bucket per table
    assert(rows.length <= n * cap * 2,
      s"candidate count ${rows.length} exceeds n*cap*tables bound ${n * cap * 2}")
    // symmetric emission: (a,b) present iff (b,a) present
    val set = rows.toSet
    assert(set.forall { case (a, b) => set.contains((b, a)) })
    // the scratch cache dies with the handle, not the session
    val cached = spark.sparkContext.getPersistentRDDs.size
    cp.release()
    assert(spark.sparkContext.getPersistentRDDs.size < cached ||
      cached == 0, "release() did not unpersist the tagged bucket cache")
  }
}

class CollectionStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("upsert preserves created_at, bumps updated_at; delete cascades by key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/docs"
    val store = new CollectionStore(spark, dir, "id")
    store.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"), nowMs = 1000L)
    assert(store.count() == 2)

    store.upsert(Seq((2L, "b2"), (3L, "c")).toDF("id", "payload"), nowMs = 2000L)
    val rows = store.load().orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    val r2 = rows(1)
    assert(r2.getAs[String]("payload") == "b2")
    assert(r2.getAs[Long]("created_at_ms") == 1000L) // preserved (collection.py:135)
    assert(r2.getAs[Long]("updated_at_ms") == 2000L) // bumped
    assert(rows(2).getAs[Long]("created_at_ms") == 2000L) // fresh insert

    store.delete(Seq(1L, 3L).toDF("id"))
    assert(store.load().collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
  }

  test("store-backed crud_upsert_store matches the in-plan crud_upsert simulation") {
    val inPlan = SparkEntry.queries("crud_upsert")(spark, sf)
      .collect().map(_.toString)
    val stored = SparkEntry.queries("crud_upsert_store")(spark, sf)
      .collect().map(_.toString)
    assert(stored.nonEmpty && stored.sameElements(inPlan))
  }

  test("updateMerge overwrites non-null fields, keeps null fields and created_at") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store-merge").toString + "/docs"
    val store = new CollectionStore(spark, dir, "id")
    store.upsert(Seq((1L, "a", "en"), (2L, "b", "de")).toDF("id", "payload", "lang"),
      nowMs = 1000L)
    // partial update: new payload for id=1, lang not supplied (null);
    // id=9 unknown → ignored (update, not upsert)
    store.updateMerge(
      Seq((1L, Some("a2"), Option.empty[String]), (9L, Some("x"), Some("fr")))
        .toDF("id", "payload", "lang"),
      nowMs = 2000L)
    val rows = store.load().orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    val r1 = rows(0)
    assert(r1.getAs[String]("payload") == "a2") // non-null overwrites
    assert(r1.getAs[String]("lang") == "en") // null keeps stored (collection.py:136)
    assert(r1.getAs[Long]("created_at_ms") == 1000L) // preserved
    assert(r1.getAs[Long]("updated_at_ms") == 2000L) // bumped
    val r2 = rows(1)
    assert(r2.getAs[String]("payload") == "b" && r2.getAs[Long]("updated_at_ms") == 1000L)

    // duplicate keys in one batch must not multiply stored rows
    store.updateMerge(
      Seq((2L, Some("x"), Option.empty[String]), (2L, Some("y"), Option.empty[String]))
        .toDF("id", "payload", "lang"),
      nowMs = 3000L)
    assert(store.load().filter(col("id") === 2L).count() == 1)
  }
}

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** FileStreamSource needs a directory — stage the events file. */
  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming windowed agg over events matches the batch twin") {
    val stream = EventStream.readStream(spark, eventsDir)
    val q = EventStream.windowedAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("hour"), col("event_type"), col("n_events"), col("sum_value"))
      val want = graft.core.Tables.events(spark, sf)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      assert(got.count() == want.count())
      assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup collapses a replayed source to exactly-once by event_id") {
    // stage the SAME events file twice — an at-least-once source
    val d = java.nio.file.Files.createTempDirectory("graft-dedup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), d.resolve("b.parquet"))
    val stream = EventStream.readStream(spark, d.toString)
    val q = graft.streaming.DedupStream.dedupEvents(stream)
      .select(col("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream").count()
      val distinctIds = graft.core.Tables.events(spark, sf)
        .select(col("event_id")).distinct().count()
      assert(got == distinctIds,
        s"stream emitted $got rows, expected $distinctIds distinct event_ids")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    val stream = EventStream.readStream(spark, eventsDir)
      .withWatermark("ts", "0 seconds")
    val sessions = graft.streaming.SessionStream.sessionize(spark, stream)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // Exactly the closed sessions are emitted: every non-last
      // session closes on its in-batch gap, and once the watermark
      // reaches the global max event time, the event-time timeout
      // closes each user's last session too — unless it ended within
      // the gap of the stream's end (still open, awaiting timeout).
      // Field-level parity with the batch twin: same (user, start,
      // end, n_events) keys, sums equal up to double-accumulation
      // order at the e2 scale.
      case class S(user: Long, start: Long, end: Long, n: Long)
      val got = spark.table("sessions").collect().map { r =>
        S(r.getAs[Long]("user_id"),
          Math.floorDiv(r.getAs[Long]("session_start_ms"), 1000L),
          Math.floorDiv(r.getAs[Long]("session_end_ms"), 1000L),
          r.getAs[Long]("n_events")) ->
          r.getAs[Double]("sum_value")
      }.toMap
      val batchRows = SparkEntry.queries("events_sessionize")(spark, sf).collect()
      val lastSeq = batchRows.groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.map(_.getAs[Long]("session_seq")).max }
      val maxTs = batchRows.map(_.getAs[Long]("session_end_epoch")).max
      val gapSec = 30L * 60
      val stillOpen = (r: org.apache.spark.sql.Row) =>
        r.getAs[Long]("session_seq") == lastSeq(r.getAs[Long]("user_id")) &&
          r.getAs[Long]("session_end_epoch") + gapSec >= maxTs
      val expected = batchRows
        .filterNot(stillOpen)
        .map { r =>
          S(r.getAs[Long]("user_id"),
            r.getAs[Long]("session_start_epoch"),
            r.getAs[Long]("session_end_epoch"),
            r.getAs[Long]("n_events")) ->
            r.getAs[Long]("sum_value_e2")
        }.toMap
      assert(got.nonEmpty)
      assert(got.keySet == expected.keySet,
        s"closed-session keys differ: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
      expected.foreach { case (k, sumE2) =>
        val streamE2 = Math.floor(got(k) * 100 + 0.5).toLong
        assert(Math.abs(streamE2 - sumE2) <= 1,
          s"session $k sum mismatch: stream=$streamE2 batch=$sumE2")
      }
    } finally q.stop()
  }
}
