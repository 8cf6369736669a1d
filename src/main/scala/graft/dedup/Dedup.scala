package graft.dedup

import graft.core.{Stab, Tables}
import graft.functions.vectors._
import graft.index.{LshIndex, PqCodebooks}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale design (100 TB): no operator ever materializes n² —
  * candidate pairs always come from an equality join on a bucket key
  * (band signature, simhash band, blocking key), which Spark executes
  * as a linear shuffle + per-bucket pair expansion. Exact dedup is a
  * single hash aggregate with map-side combine. Skewed buckets are
  * bounded: a band key collision set of size m yields m² pairs only
  * within that bucket, and AQE's skew-join split handles the rare hot
  * bucket.
  *
  * Determinism: every hash is the shared md5-based
  * [[TextOps.hash60]]; every float crossing the oracle boundary is
  * e6-stabilized, and thresholds are applied ON the stabilized
  * integer so the cut is identical in both engines.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for the permutation family
  private val numHashes = 32
  private val bandRows = 4 // 8 bands of 4 rows

  /** Exact dedup: group by md5(text); `keep_doc_id` is the canonical
    * survivor (min id), `n_docs > 1` marks duplicate groups. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_doc_id"))
      .orderBy($"text_md5")
  }

  val exactSql: String =
    """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin

  /** (doc_id, shingle-hash mod P) — distinct word-3-gram shingles. */
  private def shingleHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(graft.functions.hashes.hashedWordShingles($"text", 3)).as("h"))
      .select($"doc_id", ($"h" % P).as("x"))
      .distinct()
  }

  private val shingleHashesSql: String =
    s"""SELECT DISTINCT doc_id, ${TextOps.hash60Sql("s")} % $P AS x
       |FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 3)}) AS s
       |      FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))""".stripMargin

  /** Session-scoped signature memo: the MinHash sketch is an index
    * artifact (like IvfIndex.buildCached) — `dedup_minhash` and
    * `pipeline_clean` share one materialization instead of each
    * re-sketching the corpus. */
  private val sigCache =
    new graft.store.VersionedMemo[DataFrame](graft.core.Checkpoints.free)

  /** (doc_id, sig[numHashes]) MinHash signature table, cached per
    * (session, dir) and invalidated by store writes under the dir. */
  def signatures(spark: SparkSession, dir: String): DataFrame =
    sigCache.get(spark, dir, dir) {
      import spark.implicits._
      // Single-pass signature expression: the naive explode over 32
      // hash slots shuffles numShingles×32 rows; this shuffles only the
      // per-doc shingle sets and computes the signature in one loop.
      shingleHashes(spark, dir)
        .groupBy($"doc_id")
        .agg(collect_list($"x").as("xs"))
        .select($"doc_id", graft.functions.hashes.minHashSignature($"xs", numHashes).as("sig"))
        // localCheckpoint, NOT cache(): the columnar in-memory cache
        // pays a per-element conversion for array columns that costs
        // several times the signature computation itself (profiled at
        // sf0.1); checkpointed UnsafeRows store and re-read at memory
        // speed. Reused by bands (self-join) + the est-jaccard joins.
        .localCheckpoint(true)
    }

  /** MinHash signatures → LSH band buckets → candidate pairs.
    * Output: (doc_a, doc_b, n_bands, est_jaccard_e6) where est is the
    * fraction of the 32 minhashes agreeing.
    *
    * The permutation family is `(a_h·x + b_h) mod P` with
    * `a_h = (1000003·h + 12345) mod P`, `b_h = (999331·h + 54321) mod P`
    * — all arithmetic < 2^62, exact in BIGINT in both engines. */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = signatures(spark, dir)
    val nBands = numHashes / bandRows
    val bands = sig.select($"doc_id",
        explode(sequence(lit(0), lit(nBands - 1))).as("b"), $"sig")
      .select($"doc_id", $"b",
        array_join(slice($"sig", $"b" * bandRows + 1, lit(bandRows)), ",").as("key"))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
    pairs
      .join(sig.select($"doc_id".as("doc_a"), $"sig".as("sig_a")), "doc_a")
      .join(sig.select($"doc_id".as("doc_b"), $"sig".as("sig_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_bands",
        Stab.e6(size(filter(zip_with($"sig_a", $"sig_b", (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard_e6"))
      .orderBy($"doc_a", $"doc_b")
  }

  val minhashSql: String = {
    val nBands = numHashes / bandRows
    s"""WITH shd AS (
       |  $shingleHashesSql
       |), hs AS (SELECT unnest(generate_series(0, ${numHashes - 1})) AS h),
       |mh AS (
       |  SELECT doc_id, h,
       |    min(((1000003*h + 12345) % $P * x + (999331*h + 54321) % $P) % $P) AS mv
       |  FROM shd CROSS JOIN hs GROUP BY doc_id, h
       |), sig AS (
       |  SELECT doc_id, list(mv ORDER BY h) AS sig FROM mh GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, b,
       |    array_to_string(sig[$bandRows*b+1:$bandRows*b+$bandRows], ',') AS key
       |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, ${nBands - 1})) AS b)
       |), pairs AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_bands
       |  FROM bands x JOIN bands y
       |    ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id
       |)
       |SELECT doc_a, doc_b, n_bands,
       |  ${Stab.sqlE6(s"CAST(list_sum(list_prepend(0, list_transform(generate_series(1, $numHashes), i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))) AS DOUBLE) / $numHashes")} AS est_jaccard_e6
       |FROM pairs
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** 60-bit SimHash (term-frequency weighted) + banded near-dup pairs
    * with hamming distance ≤ 6 (4 bands of 15 bits — a pair must agree
    * on at least one full band to become a candidate, standard
    * pigeonhole blocking). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Single-pass expression: the naive formulation explodes
    // words × 60 bit-slots (15.6M shuffled rows at sf0.1); SimHash60
    // computes the whole sketch per row with zero shuffle.
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.hashes.hashedWordShingles($"text", 1).as("hs"))
      .select($"doc_id", graft.functions.hashes.simHash60($"hs").as("simhash"))
      .cache() // both sides of the band self-join
    val bands = sh.select($"doc_id", $"simhash",
        explode(sequence(lit(0), lit(3))).as("b"))
      .select($"doc_id", $"simhash", $"b",
        expr("shiftright(simhash, cast(b * 15 AS int)) & 32767").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").cast(LongType).as("hamming"))
      .distinct()
      .filter($"hamming" <= 6)
      .orderBy($"doc_a", $"doc_b")
  }

  val simhashSql: String =
    s"""WITH wh AS (
       |  SELECT doc_id, ${TextOps.hash60Sql("word")} AS h
       |  FROM (SELECT doc_id, unnest(${TextOps.tokensSql}) AS word FROM documents)
       |), bits AS (
       |  SELECT doc_id, j,
       |    CASE WHEN CAST(sum(((h >> j) & 1)*2 - 1) AS BIGINT) > 0 THEN 1 ELSE 0 END AS bit
       |  FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS j)
       |  GROUP BY doc_id, j
       |), sh AS (
       |  SELECT doc_id, CAST(sum(bit << j) AS BIGINT) AS simhash FROM bits GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, simhash, b, (simhash >> (b*15)) & 32767 AS bv
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
       |)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM bands x JOIN bands y
       |  ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
       |WHERE CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Word-3-gram Jaccard similarity: bounded query set (every 100th
    * doc) against the corpus via a shingle-equality join (shared
    * shingles counted once per pair — linear in postings, never n²).
    * Threshold applied on the e6-stabilized value. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shd = Tables.documents(spark, dir)
      .select($"doc_id", explode(graft.functions.hashes.wordShingles($"text", 3)).as("s"))
      .distinct()
      .cache() // reused: postings join + sizes + query side
    val sizes = shd.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val q = shd.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("q_id"), $"s".as("q_s"))
    // the 1% query side broadcasts; the corpus postings are scanned once
    val shared = broadcast(q)
      .join(shd, col("q_s") === col("s") && col("q_id") =!= col("doc_id"))
      .groupBy($"q_id", col("doc_id").as("d_id"))
      .agg(count(lit(1)).as("shared"))
    // `sizes` is a per-document aggregate over the WHOLE corpus —
    // broadcasting it is unbounded at 100 TB. Plain equi-joins on the
    // doc keys: AQE picks a broadcast only when it actually fits.
    shared
      .join(sizes.select($"doc_id".as("q_id"), $"n".as("n_q")), "q_id")
      .join(sizes.select($"doc_id".as("d_id"), $"n".as("n_d")), "d_id")
      .select($"q_id", $"d_id", $"shared",
        Stab.e6($"shared".cast("double") / ($"n_q" + $"n_d" - $"shared")).as("jaccard_e6"))
      .filter($"jaccard_e6" >= 10000) // jaccard >= 0.01 on the stabilized value
      .orderBy($"q_id", $"d_id")
  }

  val ngramJaccardSql: String =
    s"""WITH shd AS (
       |  SELECT DISTINCT doc_id, s
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 3)}) AS s
       |        FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))
       |), sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |q AS (SELECT doc_id AS q_id, s FROM shd WHERE doc_id % 100 = 0),
       |shared AS (
       |  SELECT q.q_id, shd.doc_id AS d_id, count(*) AS shared
       |  FROM q JOIN shd ON q.s = shd.s AND q.q_id <> shd.doc_id
       |  GROUP BY q.q_id, shd.doc_id
       |)
       |SELECT q_id, d_id, shared,
       |  ${Stab.sqlE6("CAST(shared AS DOUBLE) / (sq.n + sd.n - shared)")} AS jaccard_e6
       |FROM shared
       |JOIN sizes sq ON sq.doc_id = q_id
       |JOIN sizes sd ON sd.doc_id = d_id
       |WHERE ${Stab.sqlE6("CAST(shared AS DOUBLE) / (sq.n + sd.n - shared)")} >= 10000
       |ORDER BY q_id, d_id""".stripMargin

  /** `dedup_containment`: ASYMMETRIC n-gram containment — the
    * quote/subset detector Jaccard misses. A short doc fully quoted
    * inside a long one scores near-zero Jaccard (the union is
    * dominated by the long doc) but containment(q→d) =
    * |shingles(q) ∩ shingles(d)| / |shingles(q)| ≈ 1, and the
    * DIRECTION tells which side is the quote: contain_q high +
    * contain_d low ⇒ q is (mostly) inside d. The standard measure
    * for partial-overlap dedup decisions (remove the contained doc,
    * keep the superset) that `dedup_ngram_jaccard`'s symmetric score
    * cannot express.
    *
    * Same linear postings-join shape as ngramJaccard (shared
    * shingles counted via one equality join over the posting list —
    * never n² text comparison; the bounded 1% query side
    * broadcasts, corpus postings scanned once; per-doc sizes join by
    * key so nothing corpus-proportional broadcasts). Contract is
    * RANK-based, not threshold-based: the top 5 candidates per query
    * doc by containment(q→d) — a fixed absolute threshold is either
    * trivially empty at small SF or corpus-dependent at large SF,
    * while top-k is non-empty and bounded (|queries|·5 rows) at ANY
    * scale. The per-query window partitions on the bounded query
    * set; ties break on (contain_d, d_id) so both engines rank
    * identically. */
  def containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shd = Tables.documents(spark, dir)
      .select($"doc_id", explode(graft.functions.hashes.wordShingles($"text", 3)).as("s"))
      .distinct()
      .cache() // reused: postings join + sizes + query side
    val sizes = shd.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val q = shd.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("q_id"), $"s".as("q_s"))
    val shared = broadcast(q)
      .join(shd, col("q_s") === col("s") && col("q_id") =!= col("doc_id"))
      .groupBy($"q_id", col("doc_id").as("d_id"))
      .agg(count(lit(1)).as("shared"))
    val scored = shared
      .join(sizes.select($"doc_id".as("q_id"), $"n".as("n_q")), "q_id")
      .join(sizes.select($"doc_id".as("d_id"), $"n".as("n_d")), "d_id")
      .select($"q_id", $"d_id", $"shared", $"n_q", $"n_d",
        Stab.e6($"shared".cast("double") / $"n_q").as("contain_q_e6"),
        Stab.e6($"shared".cast("double") / $"n_d").as("contain_d_e6"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"q_id")
      .orderBy($"contain_q_e6".desc, $"contain_d_e6".desc, $"d_id")
    scored
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk".cast(LongType).as("rk"), $"d_id",
        $"shared", $"n_q", $"n_d", $"contain_q_e6", $"contain_d_e6")
      .orderBy($"q_id", $"rk")
  }

  val containmentSql: String =
    s"""WITH shd AS (
       |  SELECT DISTINCT doc_id, s
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 3)}) AS s
       |        FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))
       |), sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |q AS (SELECT doc_id AS q_id, s FROM shd WHERE doc_id % 100 = 0),
       |shared AS (
       |  SELECT q.q_id, shd.doc_id AS d_id, count(*) AS shared
       |  FROM q JOIN shd ON q.s = shd.s AND q.q_id <> shd.doc_id
       |  GROUP BY q.q_id, shd.doc_id
       |)
       |, scored AS (
       |  SELECT q_id, d_id, shared, sq.n AS n_q, sd.n AS n_d,
       |    ${Stab.sqlE6("CAST(shared AS DOUBLE) / sq.n")} AS contain_q_e6,
       |    ${Stab.sqlE6("CAST(shared AS DOUBLE) / sd.n")} AS contain_d_e6
       |  FROM shared
       |  JOIN sizes sq ON sq.doc_id = q_id
       |  JOIN sizes sd ON sd.doc_id = d_id
       |)
       |SELECT q_id, rk, d_id, shared, n_q, n_d, contain_q_e6, contain_d_e6
       |FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY contain_q_e6 DESC, contain_d_e6 DESC, d_id) AS BIGINT) AS rk
       |  FROM scored)
       |WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  /** Embedding-cosine near-duplicate pairs within `label` blocks
    * (the blocking key stands in for an LSH bucket — the 100 TB path
    * swaps it for `ann_lsh_bucketed`'s hyperplane bucket with the
    * same join shape). Threshold cosine ≥ 0.40 on the stabilized
    * value. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        Stab.e6(cosineSim(col("a.embedding"), col("b.embedding"))).as("cos_e6"))
      .filter($"cos_e6" >= 400000)
      .orderBy($"vec_a", $"vec_b")
  }

  /** Embedding near-dup with REAL LSH-bucketed candidates — the
    * 100 TB composition the label-blocked variant stands in for:
    * multi-table random-hyperplane bucketing (adaptive bit depth, one
    * pass, one self-join on (table, bucket) — never n²) generates the
    * candidate pairs, exact cosine ≥ 0.40 confirms. Rows-only driver
    * check; the spec asserts ≥ 0.9 recall of the exact threshold
    * pairs at sf0.001. */
  def embeddingNearDupLsh(spark: SparkSession, dir: String,
      nTables: Int = 8): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val bits = LshIndex.adaptiveBits(emb.count(), targetBucket = 64)
    val cp = LshIndex.saltedCandidatePairs(emb, nTables, bits,
      bucketCap = 128, seedBase = 7042L)
    val cand = cp.pairs
      .filter($"src" < $"dst")
      .select($"src".as("vec_a"), $"dst".as("vec_b"))
      .distinct()
    // materialize the (small) confirmed-pair set so the LSH scratch
    // cache can be released before the frame leaves this scope
    val confirmed = cand
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), Seq("vec_a"))
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), Seq("vec_b"))
      .select($"vec_a", $"vec_b",
        Stab.e6(cosineSim($"emb_a", $"emb_b")).as("cos_e6"))
      .filter($"cos_e6" >= 400000)
      .localCheckpoint(true)
    cp.release()
    confirmed.orderBy($"vec_a", $"vec_b")
  }

  /** `dedup_embedding_lsh` through a summary contract grid (same
    * oracle pattern as the checked index entries — ContractGrids):
    * the LSH-confirmed pair set is non-empty, ordered (a < b),
    * duplicate-free, entirely at-or-above the 0.40 threshold, and
    * every reported similarity equals the exact stabilized cosine
    * recomputed for its pair — which together pin the output to a
    * SUBSET of the exact threshold pairs (candidate-pair RECALL of
    * that set stays the measured ScalaTest bar, ≥ 0.9). The recompute
    * joins touch only |pairs| rows. */
  def embeddingNearDupLshChecked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    // already localCheckpoint'ed inside: probes below replay nothing
    val pairs = embeddingNearDupLsh(spark, dir)
    val n = pairs.count()
    val unordered = pairs.filter($"vec_a" >= $"vec_b").count()
    val dup = n - pairs.select($"vec_a", $"vec_b").distinct().count()
    val below = pairs.filter($"cos_e6" < 400000L).count()
    val wrong = pairs
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), Seq("vec_a"))
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), Seq("vec_b"))
      .filter(graft.core.Stab.e6(cosineSim($"emb_a", $"emb_b")) =!= $"cos_e6")
      .count()
    Seq(
      ("above_threshold", below == 0L),
      ("distinct_pairs", dup == 0L),
      ("nonempty", n > 0L),
      ("ordered", unordered == 0L),
      ("sims_exact", wrong == 0L))
      .toDF("invariant", "holds").orderBy($"invariant")
  }

  val embeddingNearDupLshCheckedSql: String =
    """SELECT t.invariant, true AS holds
      |FROM (VALUES ('above_threshold'), ('distinct_pairs'), ('nonempty'),
      |  ('ordered'), ('sims_exact')) t(invariant)
      |ORDER BY invariant""".stripMargin

  /** Exact-substring dedup: pairs of documents sharing at least one
    * verbatim `spanLen`-token run — the signal n-gram/minhash dedup
    * misses when two long documents share only a copied paragraph
    * (quote chains, syndicated passages, templated sections).
    *
    * Scale shape: a span-hash postings equality join, linear in
    * postings. The document-frequency cap is what keeps it linear on
    * REAL corpora: boilerplate spans (license headers, navigation
    * text) occur in millions of documents and would pair
    * quadratically within their posting; spans with df > `maxDf` are
    * boilerplate by definition, not duplication evidence, and are
    * excluded — bounding any span's pair contribution at maxDf². */
  def substringSpans(spark: SparkSession, dir: String, spanLen: Int = 20,
      maxDf: Int = 100): DataFrame = {
    import spark.implicits._
    // cache(), NOT localCheckpoint: the span table is the largest
    // intermediate (O(corpus tokens)) and is rebuilt per invocation —
    // cached blocks stay evictable/recomputable under memory pressure,
    // while stranded checkpoint blocks would pin storage until GC.
    // Plain (long, long) rows, so the columnar-cache conversion cost
    // that pushed the ARRAY-column memos to checkpoints doesn't apply.
    val sp = Tables.documents(spark, dir)
      .select($"doc_id",
        explode(graft.functions.hashes.hashedWordShingles($"text", spanLen)).as("h"))
      .distinct()
      .cache() // reused: df counts + both sides of the pair join
    val keep = sp.groupBy($"h").agg(count(lit(1)).as("ndocs"))
      .filter($"ndocs" <= maxDf).select($"h")
    val sk = sp.join(keep, Seq("h"))
    sk.as("a").join(sk.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_spans"))
      .orderBy($"doc_a", $"doc_b")
  }

  val substringSpansSql: String =
    s"""WITH sp AS (
       |  SELECT DISTINCT doc_id, ${TextOps.hash60Sql("s")} AS h
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 20)}) AS s
       |        FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))
       |), df AS (SELECT h, count(*) AS ndocs FROM sp GROUP BY h),
       |keep AS (SELECT h FROM df WHERE ndocs <= 100),
       |sk AS (SELECT sp.doc_id, sp.h FROM sp JOIN keep USING (h))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_spans
       |FROM sk a JOIN sk b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id ORDER BY doc_a, doc_b""".stripMargin

  /** `dedup_boilerplate`: the span population [[substringSpans]]
    * EXCLUDES, reported as a first-class output — high-df verbatim
    * spans (license headers, navigation text, templated sections) are
    * what a real pipeline strips BEFORE dedup and trains a stopspan
    * list from. One groupBy over the span postings (linear,
    * map-side-combined); shares the span derivation with
    * [[substringSpans]]. `minDf` = 3 matches this corpus's df range
    * (max df is 3-4 in the synthetic data), so here the report
    * OVERLAPS the pairing view; set `minDf` = substringSpans's
    * maxDf + 1 and the two views partition the span space exactly —
    * "boilerplate" = "what substring dedup refused to pair on". */
  def boilerplateSpans(spark: SparkSession, dir: String, spanLen: Int = 20,
      minDf: Int = 3): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        explode(graft.functions.hashes.hashedWordShingles($"text", spanLen)).as("span_h"))
      .distinct()
      .groupBy($"span_h")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .filter($"n_docs" >= minDf)
      .orderBy($"n_docs".desc, $"span_h".asc)
  }

  val boilerplateSpansSql: String =
    s"""WITH sp AS (
       |  SELECT DISTINCT doc_id, ${TextOps.hash60Sql("s")} AS span_h
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 20)}) AS s
       |        FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))
       |)
       |SELECT span_h, count(*) AS n_docs,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM sp GROUP BY span_h HAVING count(*) >= 3
       |ORDER BY n_docs DESC, span_h ASC""".stripMargin

  /** Connected-components canonicalization over the MinHash near-dup
    * pairs: every document gets a `component` id (the min doc_id
    * reachable through pairs with estimated Jaccard ≥ 0.5) and
    * `keep = 1` iff it is its component's canonical survivor. This is
    * the step a real pipeline runs AFTER pair generation — near-dup
    * is transitive in practice (A≈B, B≈C ⇒ keep one of {A,B,C}) and
    * pairwise "keep the smaller id" would keep B twice.
    *
    * Scale shape: iterative min-label propagation — each round is one
    * equi-join of the edge table against the label table plus a
    * map-side-combined min aggregate, i.e. a linear shuffle; rounds =
    * component diameter. Near-dup components are band-collision
    * cliques (diameter ≤ ~2-3), so the loop converges in a handful of
    * rounds regardless of corpus size; a hard cap fails loudly rather
    * than returning a half-propagated labeling. Each round
    * localCheckpoints (labels are one long pair per doc) so the plan
    * does not double per iteration. */
  def components(spark: SparkSession, dir: String,
      minEstJaccardE6: Long = 500000L): DataFrame = {
    import spark.implicits._
    val pairs = minhash(spark, dir)
      .filter($"est_jaccard_e6" >= minEstJaccardE6)
      .select($"doc_a", $"doc_b")
    // undirected propagation: materialize both directions once
    val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .localCheckpoint(true)
    var labels = Tables.documents(spark, dir)
      .select($"doc_id", $"doc_id".as("component"))
      .localCheckpoint(true)
    // labels only ever decrease, so sum(component) is a strictly
    // decreasing convergence measure. The sum rides the SAME action
    // that materializes the round (an Observation collected during the
    // eager localCheckpoint), so each round is ONE driver-blocking job
    // instead of checkpoint + separate convergence agg.
    var curSum = labels.agg(sum($"component")).first().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 32) {
      val nbrMin = edges
        .join(labels.select($"doc_id".as("src"), $"component".as("src_label")), Seq("src"))
        .groupBy($"dst")
        .agg(min($"src_label").as("nbr_min"))
        .select($"dst".as("doc_id"), $"nbr_min")
      val obs = org.apache.spark.sql.Observation(s"graft_components_r$rounds-${System.nanoTime()}")
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"component", coalesce($"nbr_min", $"component")).as("component"))
        .observe(obs, sum($"component").as("label_sum"))
        .localCheckpoint(true)
      val nextSum = obs.get("label_sum").asInstanceOf[Long]
      converged = nextSum == curSum
      curSum = nextSum
      labels = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"dedup_components did not converge in $rounds rounds — component diameter > cap")
    labels.select($"doc_id", $"component",
        ($"doc_id" === $"component").cast(LongType).as("keep"))
      .orderBy($"doc_id")
  }

  /** Oracle twin: min reachable doc_id via a recursive CTE (the
    * UNION-dedup makes the recursion terminate at the fixpoint). */
  val componentsSql: String =
    s"""WITH RECURSIVE cand AS (
       |  SELECT doc_a, doc_b FROM ($minhashSql) t WHERE est_jaccard_e6 >= 500000
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand
       |), reach AS (
       |  SELECT doc_id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.dst AS doc_id, reach.r FROM reach JOIN edges e ON e.src = reach.doc_id
       |)
       |SELECT doc_id, min(r) AS component, CAST(doc_id = min(r) AS BIGINT) AS keep
       |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `dedup_threshold_sweep`: the threshold-SELECTION table — pair
    * count, touched-document count, and corpus share at five
    * candidate Jaccard thresholds, from ONE pass over the MinHash
    * pair table (choosing the dedup threshold is the first decision
    * a dataset card records; sweeping it must not cost five dedup
    * runs). The pair table is linear (banded candidates); the sweep
    * adds a 5-row broadcast, one pair-keyed filter, and two
    * threshold-keyed partial aggs — output is |thresholds| rows at
    * any corpus size. Shares (doc count) crosses as an exact integer;
    * the share is an e6 floor division. */
  val sweepThresholds: Seq[Long] =
    Seq(200000L, 500000L, 950000L, 970000L, 1000000L)

  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = minhash(spark, dir)
      .select($"doc_a", $"doc_b", $"est_jaccard_e6").localCheckpoint(true)
    val nDocs = Tables.documents(spark, dir).count()
    val th = sweepThresholds.toDF("thresh_e6")
    val at = pairs.crossJoin(broadcast(th))
      .filter($"est_jaccard_e6" >= $"thresh_e6")
    val nPairs = at.groupBy($"thresh_e6").agg(count(lit(1)).as("n_pairs"))
    val touched = at
      .select($"thresh_e6", explode(array($"doc_a", $"doc_b")).as("doc"))
      .distinct()
      .groupBy($"thresh_e6").agg(count(lit(1)).as("n_docs_touched"))
    // max(nDocs, 1): on an EMPTY corpus Spark `div 0` yields NULL
    // while DuckDB `//` raises — both engines agree on 0 with the
    // guarded denominator (touched counts are 0 there anyway).
    // decimal(38,0) before the ×1e6: LongType wraps silently past
    // ~9.2e12 touched docs while DuckDB promotes.
    val denom = math.max(nDocs, 1L)
    th.join(nPairs, Seq("thresh_e6"), "left")
      .join(touched, Seq("thresh_e6"), "left")
      .select($"thresh_e6",
        coalesce($"n_pairs", lit(0L)).as("n_pairs"),
        coalesce($"n_docs_touched", lit(0L)).as("n_docs_touched"),
        expr(s"cast(cast(coalesce(n_docs_touched, 0) as decimal(38,0))" +
          s" * 1000000 div $denom as long)")
          .as("touched_share_e6"))
      .orderBy($"thresh_e6")
  }

  val thresholdSweepSql: String = {
    val ths = sweepThresholds.mkString(", ")
    s"""WITH pairs AS (
       |  SELECT doc_a, doc_b, est_jaccard_e6 FROM ($minhashSql) t
       |), th AS (SELECT CAST(unnest([$ths]) AS BIGINT) AS thresh_e6),
       |at_th AS (
       |  SELECT thresh_e6, doc_a, doc_b FROM pairs CROSS JOIN th
       |  WHERE est_jaccard_e6 >= thresh_e6),
       |np AS (SELECT thresh_e6, count(*) AS n_pairs FROM at_th GROUP BY 1),
       |nd AS (
       |  SELECT thresh_e6, count(*) AS n_docs_touched FROM (
       |    SELECT DISTINCT thresh_e6, doc FROM (
       |      SELECT thresh_e6, doc_a AS doc FROM at_th
       |      UNION ALL SELECT thresh_e6, doc_b FROM at_th))
       |  GROUP BY 1)
       |SELECT thresh_e6,
       |  coalesce(n_pairs, 0) AS n_pairs,
       |  coalesce(n_docs_touched, 0) AS n_docs_touched,
       |  CAST(CAST(coalesce(n_docs_touched, 0) AS HUGEINT) * 1000000
       |    // greatest((SELECT count(*) FROM documents), 1) AS BIGINT) AS touched_share_e6
       |FROM th LEFT JOIN np USING (thresh_e6) LEFT JOIN nd USING (thresh_e6)
       |ORDER BY thresh_e6""".stripMargin
  }

  /** `dedup_ensemble`: near-dup pair PROVENANCE across the three
    * text-level detectors — MinHash (set-resemblance), SimHash
    * (weighted-feature hamming), and verbatim-span sharing. Real
    * pipelines run several detectors because each misses a different
    * duplication mode (reorderings beat spans, short texts beat
    * minhash bands, topical twins beat simhash); the ensemble table
    * records, per candidate pair, WHICH methods fired as a bitmask
    * (1=minhash, 2=simhash, 4=substring) and how many agreed — the
    * evidence column a dedup-threshold review reads before choosing
    * what to drop.
    *
    * Scale shape: the three pair tables are each linear (banded/
    * posting joins, never n²); the ensemble adds ONE (doc_a, doc_b)
    * partial-agged shuffle over their union. Thresholds match each
    * method's own registry entry, so the union is exactly "what the
    * individual detectors reported", made joinable. */
  def ensemble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mh = minhash(spark, dir).filter($"est_jaccard_e6" >= 500000L)
      .select($"doc_a", $"doc_b", lit(1L).as("m"))
    val sh = simhash(spark, dir)
      .select($"doc_a", $"doc_b", lit(2L).as("m"))
    val ss = substringSpans(spark, dir)
      .select($"doc_a", $"doc_b", lit(4L).as("m"))
    mh.unionByName(sh).unionByName(ss)
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"m").as("method_mask"),
        count(lit(1)).as("n_methods"))
      .orderBy($"doc_a", $"doc_b")
  }

  val ensembleSql: String =
    s"""WITH mh AS (
       |  SELECT doc_a, doc_b, 1 AS m FROM ($minhashSql) t
       |  WHERE est_jaccard_e6 >= 500000
       |), sh AS (
       |  SELECT doc_a, doc_b, 2 AS m FROM ($simhashSql) t
       |), ss AS (
       |  SELECT doc_a, doc_b, 4 AS m FROM ($substringSpansSql) t
       |), u AS (
       |  SELECT * FROM mh UNION ALL SELECT * FROM sh UNION ALL SELECT * FROM ss
       |)
       |SELECT doc_a, doc_b, CAST(sum(m) AS BIGINT) AS method_mask,
       |  count(*) AS n_methods
       |FROM u GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin

  /** `dedup_keep_best`: component dedup with a QUALITY survivor — the
    * choice a real pipeline makes: within each near-dup component keep
    * the LONGEST member (most tokens, tie → smaller doc_id), not the
    * smallest id. Composes [[components]]' labeling with the token
    * count; on this corpus the two conventions disagree on 10 of 476
    * components (spec-pinned), so the quality choice is load-bearing.
    *
    * Scale shape: the propagation cost is [[components]]'; the
    * survivor election adds one broadcast-sized token-count join and
    * a window partitioned by component — WindowGroupLimit-class work
    * on groups whose size is the near-dup cluster size, never the
    * corpus. */
  def keepBest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val comp = components(spark, dir).select($"doc_id", $"component")
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(TextOps.tokens($"text")).cast(LongType).as("n_tokens"))
    val w = Window.partitionBy($"component")
      .orderBy($"n_tokens".desc, $"doc_id".asc)
    comp.join(toks, Seq("doc_id"))
      .withColumn("keep", (row_number().over(w) === 1).cast(LongType))
      .select($"doc_id", $"component", $"n_tokens", $"keep")
      .orderBy($"doc_id")
  }

  val keepBestSql: String =
    s"""WITH comp AS ($componentsSql),
       |toks AS (SELECT doc_id, CAST(len(${TextOps.tokensSql}) AS BIGINT) AS n_tokens
       |         FROM documents)
       |SELECT c.doc_id, c.component, t.n_tokens,
       |  CAST(row_number() OVER (PARTITION BY c.component
       |    ORDER BY t.n_tokens DESC, c.doc_id ASC) = 1 AS BIGINT) AS keep
       |FROM comp c JOIN toks t USING (doc_id)
       |ORDER BY c.doc_id""".stripMargin

  /** `dedup_cluster_stats`: the duplication PROFILE of the corpus —
    * how many near-dup clusters exist at each size, how many
    * documents they hold, and what fraction of the corpus deduping at
    * this threshold would remove. The histogram a curation run reads
    * to choose its threshold (a fat tail of giant clusters means
    * boilerplate, not duplication) and the number that goes in a
    * dataset card next to the retention rate.
    *
    * Scale shape: rides [[components]]' propagation, then two
    * dimension-collapsing aggregations (corpus → component →
    * size-histogram), all map-side-combinable; output is
    * histogram-cardinality. The removal ratio is integer floor
    * division of long counts — nothing float crosses the oracle. */
  def clusterStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = components(spark, dir)
      .groupBy($"component").agg(count(lit(1)).as("cluster_size"))
    val n = Tables.documents(spark, dir).count()
    sizes.groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").as("n_docs"),
        (($"cluster_size" - 1L) * $"n_clusters").as("n_removed"),
        expr(s"(cluster_size - 1L) * n_clusters * 1000000L div ${n}L")
          .as("removed_share_e6"))
      .orderBy($"cluster_size")
  }

  val clusterStatsSql: String =
    s"""WITH comp AS ($componentsSql),
       |sizes AS (
       |  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  cluster_size * count(*) AS n_docs,
       |  (cluster_size - 1) * count(*) AS n_removed,
       |  (cluster_size - 1) * count(*) * 1000000
       |    // (SELECT count(*) FROM documents) AS removed_share_e6
       |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Train/eval contamination check: which training documents share
    * verbatim word-7-grams with the held-out eval slice
    * (doc_id % 10 = 0 stands in for a benchmark suite), and how much
    * of each training document is covered. The industry-standard
    * pre-training hygiene step (n-gram overlap against benchmarks).
    *
    * Scale shape: a shingle-hash equality join between train postings
    * and eval postings — linear in postings, never |train|×|eval|; a
    * genuinely tiny eval side becomes a broadcast under AQE without
    * the code assuming it. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = Tables.documents(spark, dir)
      .select($"doc_id", explode(graft.functions.hashes.hashedWordShingles($"text", 7)).as("h"))
      .distinct()
    val evalSh = sh.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("eval_id"), $"h")
    val trainSh = sh.filter($"doc_id" % 10 =!= 0)
    val sizes = trainSh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val overlap = trainSh.join(evalSh, Seq("h"))
      .groupBy($"doc_id", $"eval_id")
      .agg(count(lit(1)).as("shared"))
    overlap.join(sizes, Seq("doc_id"))
      .select($"doc_id".as("train_id"), $"eval_id", $"shared",
        Stab.e6($"shared".cast("double") / $"n_sh").as("contamination_e6"))
      .orderBy($"train_id", $"eval_id")
  }

  val contaminationSql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ${TextOps.hash60Sql("s")} AS h
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("w", 7)}) AS s
       |        FROM (SELECT doc_id, ${TextOps.tokensSql} AS w FROM documents))
       |), ev AS (SELECT doc_id AS eval_id, h FROM sh WHERE doc_id % 10 = 0),
       |tr AS (SELECT doc_id, h FROM sh WHERE doc_id % 10 <> 0),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY doc_id),
       |ov AS (
       |  SELECT tr.doc_id, ev.eval_id, count(*) AS shared
       |  FROM tr JOIN ev USING (h) GROUP BY tr.doc_id, ev.eval_id
       |)
       |SELECT ov.doc_id AS train_id, eval_id, shared,
       |  ${Stab.sqlE6("CAST(shared AS DOUBLE) / n_sh")} AS contamination_e6
       |FROM ov JOIN sizes ON sizes.doc_id = ov.doc_id
       |ORDER BY train_id, eval_id""".stripMargin

  val embeddingNearDupSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    val cos = s"(${dot("a.embedding", "b.embedding")} / " +
      s"(sqrt(${dot("a.embedding", "a.embedding")}) * sqrt(${dot("b.embedding", "b.embedding")})))"
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       |  ${Stab.sqlE6(cos)} AS cos_e6
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${Stab.sqlE6(cos)} >= 400000
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then
    * prune near-identical members WITHIN each cluster — the published
    * recipe for web-scale semantic dedup, because clustering bounds
    * the pairwise work (E[cluster] = n/k rows; k grows with n, so the
    * per-cluster self-join never approaches n²; the rare hot cluster
    * is AQE skew-join territory, same as the band buckets above).
    *
    * Reuses the session's spherical-KMeans IVF build
    * ([[graft.index.IvfIndex.buildCached]]) — the dedup clustering IS
    * the index clustering, so a corpus that already serves ANN pays
    * nothing extra for dedup candidate generation.
    *
    * Removal rule, fully deterministic: within a cluster, a confirmed
    * dup pair (exact stabilized cosine ≥ `tauE6`) removes its
    * lower-PRIORITY member, where priority = (centroid cosine DESC,
    * vec_id ASC) — keep the member most central to its cluster, the
    * paper's "closest to centroid" variant with an id tie-break.
    * Chains resolve greedily: b may lose to a while c loses to b, so
    * a removed vector's witness is a strictly-higher-priority partner
    * that is itself kept OR removed by a yet-higher one — either way
    * every removal is justified by a confirmed ≥ τ pair.
    *
    * Returns the per-vector decision frame
    * `(vec_id, cluster_id, centroid_cos_e6, keep)`. */
  def semanticDedupDecisions(spark: SparkSession, dir: String,
      tauE6: Long = 400000L): DataFrame = {
    import spark.implicits._
    val saltS = graft.index.IvfIndex.coSaltBuckets(spark)
    val built = graft.index.IvfIndex.buildCached(spark, dir)
    val withC = built.assigned
      .join(broadcast(built.centroids), Seq("cluster_id"))
      .select($"cluster_id", $"vec_id", $"embedding",
        Stab.e6(cosineSim($"embedding", $"centroid")).as("centroid_cos_e6"))
      .localCheckpoint(true)
    val a = withC.select($"cluster_id", $"vec_id".as("a_id"),
      $"embedding".as("a_emb"), $"centroid_cos_e6".as("a_cc"))
    val b = withC.select($"cluster_id", $"vec_id".as("b_id"),
      $"embedding".as("b_emb"), $"centroid_cos_e6".as("b_cc"),
      graft.index.IvfIndex.coSaltOf($"vec_id", saltS).as("cosalt"))
    // the within-cluster pair join is salted (cluster_id, cosalt) —
    // the a-side explodes across all salts, so every (a, b) pair still
    // meets exactly once, in b's bucket; without the salt the pair
    // stage's parallelism is capped at the CLUSTER COUNT (see
    // IvfIndex.coSaltBuckets)
    val losers = a
      .withColumn("cosalt", explode(graft.index.IvfIndex.coSaltValues(saltS)))
      .join(b.hint("shuffle_hash"), Seq("cluster_id", "cosalt"))
      .filter($"a_id" < $"b_id")
      .filter(Stab.e6(cosineSim($"a_emb", $"b_emb")) >= tauE6)
      .select(when($"a_cc" < $"b_cc" ||
          ($"a_cc" === $"b_cc" && $"a_id" > $"b_id"), $"a_id")
        .otherwise($"b_id").as("vec_id"))
      .distinct()
    withC.join(losers.withColumn("lost", lit(true)), Seq("vec_id"), "left_outer")
      .select($"vec_id", $"cluster_id", $"centroid_cos_e6",
        coalesce(!$"lost", lit(true)).as("keep"))
  }

  /** `dedup_semantic` through a summary contract grid (the checked
    * pattern of ContractGrids / the LSH dedup entry): one row whose
    * `n_total` is the SQL-exact corpus count and whose booleans pin
    * the decision frame's invariants —
    *  - `partition_exact`: every vector got exactly one keep/remove
    *    decision (no dropped or duplicated ids);
    *  - `pairs_resolve`: for EVERY confirmed within-cluster dup pair,
    *    the lower-priority member is removed (no surviving dup pair);
    *  - `removed_justified`: every removed vector has a confirmed
    *    ≥ τ partner of strictly higher priority;
    *  - `removed_lt_total`: the prune never consumes the corpus.
    * The recompute self-join runs once more over the checkpointed
    * cluster frame — same bounded per-cluster shape as the decision
    * pass. Removal QUALITY (vs the exact label-blocked pair set)
    * stays covered by SemanticDedupSpec's independent brute recompute
    * at sf0.001. */
  def semanticDedupChecked(spark: SparkSession, dir: String,
      tauE6: Long = 400000L): DataFrame = {
    import spark.implicits._
    val dec = semanticDedupDecisions(spark, dir, tauE6).localCheckpoint(true)
    val saltS = graft.index.IvfIndex.coSaltBuckets(spark)
    val built = graft.index.IvfIndex.buildCached(spark, dir)
    val withC = built.assigned
      .join(broadcast(built.centroids), Seq("cluster_id"))
      .select($"cluster_id", $"vec_id", $"embedding",
        Stab.e6(cosineSim($"embedding", $"centroid")).as("centroid_cos_e6"))
      .localCheckpoint(true)
    val a = withC.select($"cluster_id", $"vec_id".as("a_id"),
      $"embedding".as("a_emb"), $"centroid_cos_e6".as("a_cc"))
    val b = withC.select($"cluster_id", $"vec_id".as("b_id"),
      $"embedding".as("b_emb"), $"centroid_cos_e6".as("b_cc"),
      graft.index.IvfIndex.coSaltOf($"vec_id", saltS).as("cosalt"))
    val pairs = a
      .withColumn("cosalt", explode(graft.index.IvfIndex.coSaltValues(saltS)))
      .join(b.hint("shuffle_hash"), Seq("cluster_id", "cosalt"))
      .filter($"a_id" < $"b_id")
      .filter(Stab.e6(cosineSim($"a_emb", $"b_emb")) >= tauE6)
      .select($"a_id", $"b_id", $"a_cc", $"b_cc")
      .localCheckpoint(true)
    val loserOf = pairs.select(
      when($"a_cc" < $"b_cc" || ($"a_cc" === $"b_cc" && $"a_id" > $"b_id"),
        $"a_id").otherwise($"b_id").as("vec_id"))
    val removed = dec.filter(!$"keep").select($"vec_id")
    val nTotal = Tables.embeddings(spark, dir).count()
    val nDecisions = dec.count()
    val nDistinctIds = dec.select($"vec_id").distinct().count()
    val nRemoved = removed.count()
    // every pair's loser is removed
    val unresolved = loserOf.distinct()
      .join(removed, Seq("vec_id"), "left_anti").count()
    // every removed id appears as some pair's loser
    val unjustified = removed
      .join(loserOf.distinct(), Seq("vec_id"), "left_anti").count()
    Seq((nTotal,
      nDecisions == nTotal && nDistinctIds == nTotal,
      unresolved == 0L,
      unjustified == 0L,
      nRemoved < nTotal)).toDF(
      "n_total", "partition_exact", "pairs_resolve",
      "removed_justified", "removed_lt_total")
  }

  val semanticDedupSql: String =
    """SELECT count(*) AS n_total, true AS partition_exact,
      |  true AS pairs_resolve, true AS removed_justified,
      |  true AS removed_lt_total
      |FROM embeddings""".stripMargin

  // ---- compressed semantic dedup (PQ-codes pair generation) -------------

  /** SDC confirm slack: the per-pair overshoot budget between the
    * symmetric quantized distance and the exact distance. The
    * prefilter keeps a candidate pair iff
    * `SDC(a,b) ≤ (2 − 2τ) + slack`; a confirmed-duplicate pair is
    * LOST (decisions diverge from the raw path) only if quantization
    * inflates its distance estimate by more than `slack`. Measured on
    * the test corpora (SemanticDedupSpec reports the max observed
    * inflation over every exact-confirmed within-cluster pair and
    * bars it at half this budget) — sized with ≥2× headroom.
    *
    * The identity guarantee is CORPUS-CONDITIONAL: the budget was
    * measured on these corpora's codebooks, and a corpus whose
    * quantization inflation exceeds it would silently drop true
    * duplicate pairs if [[semanticDedupPqDecisions]] is called
    * directly. Callers on a new corpus should go through
    * [[semanticDedupPqChecked]] (whose `decisions_match_raw` column
    * flips on any divergence) or re-measure the inflation bound for
    * their trained books before trusting the direct path. */
  val sdcConfirmSlack = 0.5

  /** Candidate stage of [[semanticDedupPqDecisions]] — pair
    * generation where the within-cluster self-join exchange carries
    * m-BYTE PQ codes instead of d×4-byte embeddings, factored out so
    * the plan spec can pin its scale shape in isolation (no
    * float-array column on any exchange). Scoring a candidate pair is
    * m byte-indexed adds against one broadcast symmetric-distance
    * table ([[PqCodebooks.sdcTable]]), not d float multiplies. */
  private[graft] def semanticDedupPqCand(spark: SparkSession, dir: String,
      tauE6: Long, slack: Double, sub: String = "pq"): DataFrame = {
    import spark.implicits._
    val saltS = graft.index.IvfIndex.coSaltBuckets(spark)
    val built = graft.index.IvfIndex.buildCached(spark, dir)
    // opportunistic sidecar reuse: if this session already persisted
    // a PQ layout for the dir (ivf_search_pq et al.), its UNROTATED
    // codes are byte-identical to a fresh encode — the fit is
    // deterministic over the same table (SemanticDedupSpec pins the
    // byte-identity) — so dedup skips the train AND the corpus
    // encode pass, reading m-byte code rows instead. peek never
    // forces the expensive build on sessions that only dedup.
    val sidecar = graft.index.IvfIndex.pqLayoutPeek(spark, dir)
    // sub selects a sidecar geometry ("pqr" = the OPQ-rotated books):
    // SDC in a rotated space estimates the SAME ||a-b|| (rotation is
    // an isometry), so the prefilter semantics are unchanged — only
    // the quantization inflation moves. Rotated measurement needs the
    // stored sidecar; the fresh-train fallback is unrotated-only.
    require(sub == "pq" || sidecar.isDefined,
      s"semantic dedup over sub=$sub needs a persisted sidecar")
    val books = sidecar match {
      case Some(path) => graft.index.IvfIndex.readCodebooks(spark, path, sub)
      case None => PqCodebooks.train(Tables.embeddings(spark, dir))
    }
    val sdcBc = spark.sparkContext.broadcast(PqCodebooks.sdcTable(books))
    // the checkpointed frame itself is code-width: the raw embedding
    // is consumed map-side by the encode + centroid-cosine pass (or
    // replaced by the stored code rows) and does not survive
    val base = built.assigned.join(broadcast(built.centroids), Seq("cluster_id"))
    val withCodes = (sidecar match {
      case Some(path) =>
        base.select($"cluster_id", $"vec_id",
            Stab.e6(cosineSim($"embedding", $"centroid")).as("centroid_cos_e6"))
          .join(spark.read.parquet(s"$path/$sub/codes")
            .select($"vec_id", $"code"), Seq("vec_id"))
      case None =>
        val booksBc = spark.sparkContext.broadcast(books)
        base.select($"cluster_id", $"vec_id",
          graft.functions.pq.pqEncode($"embedding", booksBc).as("code"),
          Stab.e6(cosineSim($"embedding", $"centroid")).as("centroid_cos_e6"))
    }).localCheckpoint(true)
    // on unit vectors ‖a−b‖² = 2 − 2·cos, so cos ≥ τ ⇔ dist ≤ 2−2τ;
    // SDC estimates that distance with both sides quantized — the
    // slack absorbs the quantization inflation (false positives cost
    // only exact confirms; false negatives would change decisions)
    val bound = 2.0 - 2.0 * tauE6.toDouble / 1e6 + slack
    val a = withCodes.select($"cluster_id", $"vec_id".as("a_id"),
      $"code".as("a_code"), $"centroid_cos_e6".as("a_cc"))
    val b = withCodes.select($"cluster_id", $"vec_id".as("b_id"),
      $"code".as("b_code"), $"centroid_cos_e6".as("b_cc"),
      graft.index.IvfIndex.coSaltOf($"vec_id", saltS).as("cosalt"))
    a.withColumn("cosalt", explode(graft.index.IvfIndex.coSaltValues(saltS)))
      .join(b.hint("shuffle_hash"), Seq("cluster_id", "cosalt"))
      .filter($"a_id" < $"b_id")
      .filter(graft.functions.pq.pqSdc($"a_code", $"b_code", sdcBc) <= lit(bound))
      .select($"a_id", $"b_id", $"a_cc", $"b_cc")
  }

  /** Compressed [[semanticDedupDecisions]]: same SemDeDup semantics,
    * same clusters, same removal rule — but the O(n²/k)-shaped
    * within-cluster pair stage runs over PQ codes
    * ([[semanticDedupPqCand]]), and raw embeddings move only for the
    * shortlisted candidate pairs (two narrow-key joins, the
    * [[graft.index.IvfIndex.knnJoinPq]] rerank discipline). Every
    * shortlisted pair is confirmed by the EXACT stabilized cosine, so
    * decisions are identical to the raw path as long as the SDC
    * prefilter drops no true pair — the `slack` budget's contract,
    * measured and barred in SemanticDedupSpec and pinned per-corpus
    * by the checked grid's `decisions_match_raw`.
    *
    * At 100 TB this is the difference between the dedup job's shuffle
    * moving n²/k · d×4 bytes and n²/k · m bytes (32× at d=64, m=8):
    * the pair stage, not the confirm, is the job. */
  def semanticDedupPqDecisions(spark: SparkSession, dir: String,
      tauE6: Long = 400000L, slack: Double = sdcConfirmSlack,
      sub: String = "pq"): DataFrame = {
    import spark.implicits._
    val cand = semanticDedupPqCand(spark, dir, tauE6, slack, sub)
      .localCheckpoint(true)
    val emb = Tables.embeddings(spark, dir)
    val losers = cand
      .join(emb.select($"vec_id".as("a_id"), $"embedding".as("a_emb")), Seq("a_id"))
      .join(emb.select($"vec_id".as("b_id"), $"embedding".as("b_emb")), Seq("b_id"))
      .filter(Stab.e6(cosineSim($"a_emb", $"b_emb")) >= tauE6)
      .select(when($"a_cc" < $"b_cc" ||
          ($"a_cc" === $"b_cc" && $"a_id" > $"b_id"), $"a_id")
        .otherwise($"b_id").as("vec_id"))
      .distinct()
    val built = graft.index.IvfIndex.buildCached(spark, dir)
    val withC = built.assigned
      .join(broadcast(built.centroids), Seq("cluster_id"))
      .select($"cluster_id", $"vec_id",
        Stab.e6(cosineSim($"embedding", $"centroid")).as("centroid_cos_e6"))
    withC.join(losers.withColumn("lost", lit(true)), Seq("vec_id"), "left_outer")
      .select($"vec_id", $"cluster_id", $"centroid_cos_e6",
        coalesce(!$"lost", lit(true)).as("keep"))
  }

  /** `dedup_semantic_pq` through a summary contract grid: `n_total`
    * is the SQL-exact corpus count; `partition_exact` pins one
    * decision per vector; `decisions_match_raw` pins the whole
    * decision frame IDENTICAL to the raw full-width path's (both
    * directions of exceptAll empty) — the compressed pair stage is
    * an optimization, not a semantics change; `removed_lt_total`
    * pins the prune never consuming the corpus. */
  def semanticDedupPqChecked(spark: SparkSession, dir: String,
      tauE6: Long = 400000L): DataFrame = {
    import spark.implicits._
    val pqDec = semanticDedupPqDecisions(spark, dir, tauE6).localCheckpoint(true)
    val rawDec = semanticDedupDecisions(spark, dir, tauE6).localCheckpoint(true)
    val nTotal = Tables.embeddings(spark, dir).count()
    val nDecisions = pqDec.count()
    val nDistinctIds = pqDec.select($"vec_id").distinct().count()
    val diff = pqDec.exceptAll(rawDec).count() + rawDec.exceptAll(pqDec).count()
    val nRemoved = pqDec.filter(!$"keep").count()
    Seq((nTotal,
      nDecisions == nTotal && nDistinctIds == nTotal,
      diff == 0L,
      nRemoved < nTotal)).toDF(
      "n_total", "partition_exact", "decisions_match_raw", "removed_lt_total")
  }

  val semanticDedupPqSql: String =
    """SELECT count(*) AS n_total, true AS partition_exact,
      |  true AS decisions_match_raw, true AS removed_lt_total
      |FROM embeddings""".stripMargin
}
