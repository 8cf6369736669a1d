package graft

import graft.functions.{pq, PqAdc, PqEncode}
import graft.index.{IvfIndex, PqCodebooks}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ (VERDICT r6 #1 + ADVICE): the PqEncode/PqAdc expressions'
  * interpreted and codegen paths must agree with an independent plain
  * -Scala reimplementation — including short/empty vectors and tied
  * centroids — PqAdc must reject an out-of-range query index in both
  * modes, codebook training must be partition-stable, and the
  * end-to-end ADC-probe + exact-rerank serve must clear a measured
  * recall@10 bar vs brute force.
  */
class PqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- independent reference implementation (no shared code) ----------

  private def refEncode(v: Array[Float],
      books: Array[Array[Array[Float]]]): Array[Byte] = {
    var norm = 0.0
    v.foreach(x => norm += x.toDouble * x.toDouble)
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    books.zipWithIndex.map { case (cb, s) =>
      val subDim = cb(0).length
      val off = s * subDim
      val dists = cb.map { cent =>
        cent.indices.map { i =>
          val xi = if (off + i < v.length) v(off + i).toDouble * inv else 0.0
          val t = xi - cent(i); t * t
        }.sum
      }
      // argmin, LOWEST index on ties
      dists.indices.minBy(i => (dists(i), i)).toByte
    }
  }

  private def refAdc(code: Array[Byte], lut: Array[Array[Double]]): Double =
    code.indices.take(lut.length).map(s => lut(s)(code(s).toInt & 0xff)).sum

  private val rng = new scala.util.Random(7L)

  private def randBooks(m: Int, codes: Int, subDim: Int): Array[Array[Array[Float]]] =
    Array.fill(m, codes, subDim)(rng.nextFloat() * 2f - 1f)

  private def randVec(d: Int): Array[Float] = Array.fill(d)(rng.nextFloat() * 2f - 1f)

  test("PqEncode: interpreted eval, codegen'd projection, and the reference impl agree") {
    val books = randBooks(m = 4, codes = 8, subDim = 3)
    val bc = spark.sparkContext.broadcast(books)
    val vecs: Seq[Array[Float]] = Seq(
      randVec(12), randVec(12), randVec(12),
      randVec(7),            // short: zero-padded tail
      randVec(1),            // very short
      Array[Float](),        // empty: norm 0 → all-zero subvectors
      Array.fill(12)(0f))    // zero vector
    val expected = vecs.map(refEncode(_, books))
    // codegen'd path: a projection over a DataFrame
    val got = vecs.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v").select($"i", pq.pqEncode($"v", bc).as("code"))
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Byte](1).toArray)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g.sameElements(e), s"codegen row $i: ${g.toSeq} != ${e.toSeq}")
    }
    // interpreted path: direct expression eval, no codegen anywhere
    vecs.zip(expected).foreach { case (v, e) =>
      val out = PqEncode(Literal.create(v, ArrayType(FloatType)), bc)
        .eval(null).asInstanceOf[ArrayData].toByteArray()
      assert(out.sameElements(e), s"interpreted: ${out.toSeq} != ${e.toSeq}")
    }
    bc.unpersist()
  }

  test("PqEncode ties break to the lowest code index, deterministically") {
    val cent = Array(0.5f, -0.25f)
    // codebook entries 1 and 3 are byte-identical: argmin must pick 1
    val books: Array[Array[Array[Float]]] =
      Array(Array(Array(9f, 9f), cent.clone(), Array(-9f, 9f), cent.clone()))
    val bc = spark.sparkContext.broadcast(books)
    val v = Array(0.5f, -0.25f)
    assert(refEncode(v, books).sameElements(Array[Byte](1)))
    val got = Seq(Tuple1(v)).toDF("v").select(pq.pqEncode($"v", bc))
      .collect()(0).getSeq[Byte](0)
    assert(got == Seq[Byte](1))
    val interp = PqEncode(Literal.create(v, ArrayType(FloatType)), bc)
      .eval(null).asInstanceOf[ArrayData].toByteArray()
    assert(interp.sameElements(Array[Byte](1)))
    bc.unpersist()
  }

  test("PqAdc: interpreted and codegen agree with the reference; bad q_idx throws in both modes") {
    val books = randBooks(m = 4, codes = 8, subDim = 3)
    val qs = Seq(randVec(12), randVec(12))
    val luts = qs.map(PqCodebooks.lut(_, books)).toArray
    val lutBc = spark.sparkContext.broadcast(luts)
    val codes: Seq[Array[Byte]] =
      Seq(Array[Byte](0, 7, 3, 1), Array[Byte](2, 2, 2, 2), Array[Byte](5, 0, 6, 4))
    val expected = for (c <- codes; qi <- luts.indices) yield refAdc(c, luts(qi))
    // Seq[Byte], not Array[Byte]: the encoder maps a byte ARRAY to
    // BinaryType, but PqAdc consumes array<byte> (what PqEncode emits)
    val got = (for (ci <- codes.indices; qi <- luts.indices)
        yield (ci * luts.length + qi, codes(ci).toSeq, qi))
      .toDF("row", "code", "qi")
      .select($"row", pq.pqAdc($"code", $"qi", lutBc).as("d"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    codes.foreach { c =>
      luts.indices.foreach { qi =>
        val interp = PqAdc(Literal.create(c.toSeq, ArrayType(org.apache.spark.sql.types.ByteType)),
          Literal.create(qi, IntegerType), lutBc).eval(null).asInstanceOf[Double]
        assert(interp == refAdc(c, luts(qi)))
      }
    }
    // out-of-range query index: IllegalArgumentException, not AIOOBE,
    // in BOTH the interpreted eval and the codegen'd projection
    val boom = intercept[IllegalArgumentException] {
      PqAdc(Literal.create(codes.head.toSeq, ArrayType(org.apache.spark.sql.types.ByteType)),
        Literal.create(luts.length, IntegerType), lutBc).eval(null)
    }
    assert(boom.getMessage.contains("outside the broadcast LUT"))
    val boomGen = intercept[Exception] {
      Seq((codes.head.toSeq, -1)).toDF("code", "qi")
        .select(pq.pqAdc($"code", $"qi", lutBc)).collect()
    }
    assert(boomGen.getMessage.contains("outside the broadcast LUT"),
      s"codegen path threw the wrong error: ${boomGen.getMessage}")
    lutBc.unpersist()
  }

  test("codebook training is partition-stable and deterministic") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val a = PqCodebooks.train(emb)
    val b = PqCodebooks.train(emb.repartition(13, $"vec_id"))
    assert(a.length == b.length)
    a.indices.foreach { s =>
      a(s).indices.foreach { c =>
        assert(a(s)(c).sameElements(b(s)(c)),
          s"codebook[$s][$c] differs across partition layouts")
      }
    }
  }

  test("IVF-PQ serve clears recall@10 >= 0.85 vs brute force; self is top-1 exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-recall").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    IvfIndex.persist(IvfIndex.build(spark, emb), dir)
    IvfIndex.persistPq(spark, dir)
    // 25 probes: a 5-probe recall estimate sits on the bar (memory of
    // MaintenanceSpec's borderline flake) — widen the sample
    val queries = emb.filter($"vec_id" < 25)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = IvfIndex.searchPersistedPq(spark, dir, queries)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val brute = emb.crossJoin(broadcast(queries))
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6"))
    val want = graft.operators.KnnSearch.topK(brute, 10, asc = false)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recall = want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }.sum / want.size
    assert(recall >= 0.85, s"IVF-PQ recall@10 $recall < 0.85")
    // every query vector is its own top-1 with exact score through the
    // quantized pipeline (ADC kept it, the exact rerank ranked it)
    val top1 = IvfIndex.searchPersistedPq(spark, dir, queries, k = 1)
      .collect()
    assert(top1.length == 25)
    top1.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id") &&
        r.getAs[Long]("score_e6") == 1000000L,
        s"q=${r.getAs[Long]("q_id")} top1 not exact self")
    }
  }

  test("OPQ rotation: orthonormal basis, norm-preserving, deterministic") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val rot = graft.index.PqCodebooks.fitRotation(emb)
    val d = emb.select(org.apache.spark.sql.functions.size($"embedding"))
      .head().getInt(0)
    assert(rot.length == d && rot.forall(_.length == d))
    // rows are an orthonormal set: unit norms, pairwise-orthogonal
    rot.foreach { r =>
      val n = r.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(n - 1.0) < 1e-4, s"row norm $n != 1")
    }
    for (i <- 0 until d; j <- (i + 1) until math.min(i + 5, d)) {
      val dot = (0 until d).map(t => rot(i)(t).toDouble * rot(j)(t).toDouble).sum
      assert(math.abs(dot) < 1e-4, s"rows $i,$j not orthogonal: $dot")
    }
    // norm preservation on a real corpus vector (driver + column path agree)
    val v = emb.filter($"vec_id" === 3L).head().getSeq[Float](1).toArray
    val rv = graft.index.PqCodebooks.rotateVec(v, rot)
    def norm(a: Array[Float]) = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm(rv) - norm(v)) < 1e-3)
    val colRv = emb.filter($"vec_id" === 3L)
      .select(graft.index.PqCodebooks.rotateCol($"embedding", rot))
      .head().getSeq[Float](0).toArray
    colRv.zip(rv).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3) }
    // refit is bit-identical (deterministic sample + driver math)
    val rot2 = graft.index.PqCodebooks.fitRotation(emb)
    assert(rot.zip(rot2).forall { case (a, b) => a.sameElements(b) })
  }

  test("maintained layout keeps PQ sidecars current: delta encode, remove prune, rebuild refresh") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-maint").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val base = emb.filter($"vec_id" >= 50)
    IvfIndex.persist(IvfIndex.build(spark, base), dir)
    IvfIndex.persistPq(spark, dir)
    IvfIndex.persistPq(spark, dir, rotate = true, sub = "pqr")
    def codeIds(sub: String): Seq[Long] =
      spark.read.parquet(s"$dir/$sub/codes")
        .select($"vec_id").collect().map(_.getLong(0)).toSeq
    def storedIds(): Set[Long] =
      spark.read.parquet(s"$dir/vectors")
        .select($"vec_id").collect().map(_.getLong(0)).toSet

    // delta batch: the sidecars must encode it with the FROZEN
    // codebooks, or the ADC pre-rank can never surface a delta row
    val delta = emb.filter($"vec_id" < 5)
    IvfIndex.addDeltaPersisted(spark, dir, delta)
    Seq("pq", "pqr").foreach { sub =>
      val ids = codeIds(sub)
      assert(ids.length == ids.distinct.length, s"$sub codes carry duplicates")
      assert(ids.toSet == storedIds(), s"$sub codes diverge from posting rows")
    }
    val queries = delta
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    Seq("pq", "pqr").foreach { sub =>
      val top1 = IvfIndex.searchPersistedPq(spark, dir, queries, k = 1, sub = sub)
        .collect()
      assert(top1.length == 5)
      top1.foreach(r => assert(
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id") &&
          r.getAs[Long]("score_e6") == 1000000L,
        s"$sub: delta q=${r.getAs[Long]("q_id")} not servable through the quantized path"))
    }

    // re-upsert with a MOVED embedding: exactly one code row for the
    // id, and the new position serves — a stale code would still rank
    // the old one
    val moved = delta.filter($"vec_id" === 0L)
      .select($"vec_id", transform($"embedding", x => -x).as("embedding"))
    IvfIndex.addDeltaPersisted(spark, dir, moved)
    assert(codeIds("pq").count(_ == 0L) == 1, "re-upsert duplicated the code row")
    val movedQ = moved.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val movedTop = IvfIndex.searchPersistedPq(spark, dir, movedQ, k = 1).collect()
    assert(movedTop.length == 1 &&
      movedTop.head.getAs[Long]("neighbor_id") == 0L &&
      movedTop.head.getAs[Long]("score_e6") == 1000000L)

    // remove prunes the codes alongside the raw rows
    IvfIndex.removeDeltaPersisted(spark, dir, Seq(3L, 4L).toDF("vec_id"))
    Seq("pq", "pqr").foreach { sub =>
      assert(!codeIds(sub).exists(id => id == 3L || id == 4L),
        s"$sub codes survive a remove")
      assert(codeIds(sub).toSet == storedIds())
    }

    // compaction folds the code sidecars' accumulated delta files
    // alongside the raw rows, with serve identity
    val q12 = emb.filter($"vec_id" === 1L || $"vec_id" === 2L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    def serveRows(): Seq[(Long, Long, Long, Long)] =
      IvfIndex.searchPersistedPq(spark, dir, q12).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val preCompact = serveRows()
    IvfIndex.compactPersisted(spark, dir, maxFilesPerPartition = 1)
    val fsC = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("pq", "pqr").foreach { sub =>
      fsC.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub/codes"))
        .filter(_.isDirectory).foreach { d =>
          val n = fsC.listStatus(d.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))
          assert(n <= 1, s"$sub/${d.getPath.getName} holds $n files post-compaction")
        }
    }
    assert(serveRows() == preCompact, "codes compaction changed serve results")

    // a drift-envelope rebuild refreshes BOTH sidecars wholesale (old
    // codebooks describe the pre-rebuild corpus)
    val big = emb.filter($"vec_id" < 50)
    assert(IvfIndex.maintain(spark, dir, big), "50-row batch must rebuild over a 450-row fit")
    Seq("pq", "pqr").foreach { sub =>
      assert(codeIds(sub).toSet == storedIds(), s"$sub codes stale after rebuild")
    }
    val lateQ = emb.filter($"vec_id" === 40L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val lateTop = IvfIndex.searchPersistedPq(spark, dir, lateQ, k = 1).collect()
    assert(lateTop.length == 1 &&
      lateTop.head.getAs[Long]("neighbor_id") == 40L &&
      lateTop.head.getAs[Long]("score_e6") == 1000000L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("filtered ADC serve: pre-filter semantics, recall >= 0.9 vs brute filtered, meta survives maintenance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-filt").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding", $"label")
    val base = emb.filter($"vec_id" >= 5)
    IvfIndex.persist(IvfIndex.build(spark, base, metaCols = Seq("label")), dir)
    IvfIndex.persistPq(spark, dir)
    // the sidecar mirrors the posting rows' metadata — the predicate
    // must evaluate in the code scan, not via a corpus-sized join
    assert(spark.read.parquet(s"$dir/pq/codes").columns.contains("label"),
      "codes sidecar does not carry the layout's metadata")

    val queries = emb.filter($"vec_id" >= 5 && $"vec_id" < 30)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val hits = IvfIndex.searchPersistedPqFiltered(spark, dir, queries,
      col("label") === col("q_label")).collect()
    // pre-filter shape: full top-10 per query, every hit legal
    assert(hits.length == 25 * 10, s"expected 250 rows, got ${hits.length}")
    val labelOf = base.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qLabelOf = queries.select($"q_id", $"q_label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    hits.foreach { r =>
      assert(labelOf(r.getAs[Long]("neighbor_id")) == qLabelOf(r.getAs[Long]("q_id")),
        "filtered ADC serve returned a neighbor violating the predicate")
    }
    // measured recall vs the brute FILTERED oracle at production
    // compensation (nProbe=13) — the bar index_recall_eval's
    // pq_filtered row publishes
    val got = hits.groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val brute = base.crossJoin(broadcast(queries))
      .filter($"label" === $"q_label")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6"))
    val want = graft.operators.KnnSearch.topK(brute, 10, asc = false)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recall = want.map { case (q, w) =>
      got.get(q).map(g => g.intersect(w).size.toDouble / w.size).getOrElse(0.0)
    }.sum / want.size
    assert(recall >= 0.9, s"filtered ADC recall@10 $recall < 0.9")

    // maintenance coupling: a label-bearing delta rides into BOTH the
    // posting rows and the code sidecar, and serves through the
    // filtered quantized path immediately
    val delta = emb.filter($"vec_id" < 5)
    IvfIndex.addDeltaPersisted(spark, dir, delta)
    val deltaQ = delta.select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
      $"label".as("q_label"))
    val deltaTop = IvfIndex.searchPersistedPqFiltered(spark, dir, deltaQ,
      col("label") === col("q_label"), k = 1).collect()
    assert(deltaTop.length == 5)
    deltaTop.foreach(r => assert(
      r.getAs[Long]("neighbor_id") == r.getAs[Long]("q_id") &&
        r.getAs[Long]("score_e6") == 1000000L,
      "delta row not servable through the filtered quantized path"))
    // a meta-less delta against a meta-bearing layout fails FAST —
    // appending it would leave NULL-label rows invisible to every
    // filtered serve
    val err = intercept[IllegalArgumentException] {
      IvfIndex.addDeltaPersisted(spark, dir,
        emb.filter($"vec_id" === 30L).select($"vec_id", $"embedding"))
    }
    assert(err.getMessage.contains("label"))

    // a drift-envelope rebuild re-fits WITH the layout's metaCols: the
    // label column survives in the posting rows and the re-encoded
    // sidecar, and the filtered serve still works. The batch MOVES 60
    // embeddings (identical re-adds count 0 drift), pushing past the
    // 10% envelope over the ~495-row fit.
    val big = emb.filter($"vec_id" >= 400 && $"vec_id" < 460)
      .select($"vec_id", transform($"embedding", x => -x).as("embedding"), $"label")
    assert(IvfIndex.maintain(spark, dir, big), "60 moved rows must rebuild")
    assert(spark.read.parquet(s"$dir/vectors").columns.contains("label"),
      "rebuild dropped the layout's metadata from the posting rows")
    assert(spark.read.parquet(s"$dir/pq/codes").columns.contains("label"),
      "rebuild dropped the layout's metadata from the code sidecar")
    val lateQ = big.filter($"vec_id" === 440L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"), $"label".as("q_label"))
    val lateTop = IvfIndex.searchPersistedPqFiltered(spark, dir, lateQ,
      col("label") === col("q_label"), k = 1).collect()
    assert(lateTop.length == 1 &&
      lateTop.head.getAs[Long]("neighbor_id") == 440L &&
      lateTop.head.getAs[Long]("score_e6") == 1000000L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  private def refSdc(a: Array[Byte], b: Array[Byte],
      table: Array[Array[Array[Double]]]): Double =
    a.indices.take(math.min(b.length, table.length))
      .map(s => table(s)(a(s).toInt & 0xff)(b(s).toInt & 0xff)).sum

  test("PqSdc: interpreted and codegen agree with the reference; table matches pairwise codebook distances") {
    val books = randBooks(m = 4, codes = 8, subDim = 3)
    val table = PqCodebooks.sdcTable(books)
    // the table IS the pairwise squared-L2 of codebook entries
    for (s <- books.indices; c1 <- books(s).indices; c2 <- books(s).indices) {
      val want = books(s)(c1).zip(books(s)(c2))
        .map { case (x, y) => val t = x.toDouble - y.toDouble; t * t }.sum
      assert(math.abs(table(s)(c1)(c2) - want) < 1e-12)
      assert(table(s)(c1)(c2) == table(s)(c2)(c1), "table must be symmetric")
      if (c1 == c2) assert(table(s)(c1)(c2) == 0.0)
    }
    val tableBc = spark.sparkContext.broadcast(table)
    val codes: Seq[Array[Byte]] =
      Seq(Array[Byte](0, 7, 3, 1), Array[Byte](2, 2, 2, 2), Array[Byte](5, 0, 6, 4))
    // codegen'd projection
    val got = (for (i <- codes.indices; j <- codes.indices)
        yield (i * codes.length + j, codes(i).toSeq, codes(j).toSeq))
      .toDF("row", "a", "b")
      .select($"row", pq.pqSdc($"a", $"b", tableBc).as("d"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val expected = for (a <- codes; b <- codes) yield refSdc(a, b, table)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    // interpreted eval
    import org.apache.spark.sql.types.ByteType
    for (a <- codes; b <- codes) {
      val interp = graft.functions.PqSdc(
        Literal.create(a.toSeq, ArrayType(ByteType)),
        Literal.create(b.toSeq, ArrayType(ByteType)), tableBc)
        .eval(null).asInstanceOf[Double]
      assert(interp == refSdc(a, b, table))
    }
    // SDC(code(x), code(y)) approximates the ADC LUT applied to a
    // quantized query: for encoded q, lut(q̂)(s)(c) sums to the same
    // table row (the "map-side LUT is a row-select" claim)
    tableBc.unpersist()
  }

  test("knn_join_pq: grid all-true, recall@5 >= 0.85 vs exact join") {
    val grid = IvfIndex.knnJoinPqChecked(spark, sf).collect()
    val emb = graft.core.Tables.embeddings(spark, sf)
    val n = emb.count()
    assert(grid.length.toLong == n * 5, "every corpus vector must get exactly 5 ranked hits")
    Seq("neighbor_in_corpus", "not_self", "score_exact", "monotone").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    val exact = graft.operators.KnnSearch.topK(
      emb.crossJoin(broadcast(emb.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6")),
      5, asc = false).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = IvfIndex.knnJoinPq(spark, IvfIndex.pqLayoutFor(spark, sf))
      .collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.keys.toSeq.sorted.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"knn_join_pq mean recall@5 vs exact = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.85, f"mean recall $mean%.3f below bar")
  }

  test("knn_join_pq_opq: rotated sidecar clears the bar and stays inside the parity band vs unrotated") {
    val grid = IvfIndex.knnJoinPqChecked(spark, sf, sub = "pqr").collect()
    val emb = graft.core.Tables.embeddings(spark, sf)
    assert(grid.length.toLong == emb.count() * 5)
    Seq("neighbor_in_corpus", "not_self", "score_exact", "monotone").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    val exact = graft.operators.KnnSearch.topK(
      emb.crossJoin(broadcast(emb.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6")),
      5, asc = false).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    def meanRecall(sub: String): Double = {
      val approx = IvfIndex.knnJoinPq(spark, IvfIndex.pqLayoutFor(spark, sf), sub = sub)
        .collect()
        .groupBy(_.getAs[Long]("q_id")).view
        .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
      val rs = exact.keys.toSeq.sorted.map(q =>
        approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0)
      rs.sum / rs.size
    }
    val (plain, rotated) = (meanRecall("pq"), meanRecall("pqr"))
    info(f"knn_join_pq recall@5: unrotated $plain%.3f, OPQ-rotated $rotated%.3f")
    assert(rotated >= 0.85, f"rotated batch join recall $rotated%.3f below bar")
    assert(math.abs(rotated - plain) <= 0.08,
      f"rotation moved batch-join recall by ${rotated - plain}%.3f — outside the parity band")
  }

  test("knn_join_pq_asof: grid all-true, recall@5 >= 0.85 vs the exact as-of join") {
    val grid = graft.index.SnapshotLayout.knnJoinPqAsofChecked(spark, sf).collect()
    val live = graft.core.Tables.embeddings(spark, sf)
      .filter(!($"vec_id" < 25 && $"vec_id" % 7 === 0))
      .select($"vec_id", $"embedding")
      .localCheckpoint(true)
    val n = live.count()
    assert(grid.length.toLong == n * 5,
      "every live-as-of-2 vector must get exactly 5 ranked hits")
    Seq("neighbor_live", "not_self", "score_exact", "monotone").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
    // exact as-of join: brute top-5 over the live set only
    val exact = graft.operators.KnnSearch.topK(
      live.crossJoin(broadcast(live.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id".as("neighbor_id"),
          graft.core.Stab.e6(graft.functions.vectors.cosineSim($"embedding", $"q_vec")).as("score_e6")),
      5, asc = false).collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val approx = graft.index.SnapshotLayout.knnJoinPqAsOf(spark,
        graft.index.SnapshotLayout.pristineScenario(spark, sf), 2L)
      .collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.keys.toSeq.sorted.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(f"knn_join_pq_asof mean recall@5 vs exact = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.85, f"mean recall $mean%.3f below bar")
    graft.core.Checkpoints.free(live)
  }

  test("knn_join_pq_asof refuses an unanswerable as-of loudly (mistyped future batch id)") {
    val path = graft.index.SnapshotLayout.pristineScenario(spark, sf)
    val e = intercept[IllegalArgumentException] {
      graft.index.SnapshotLayout.knnJoinPqAsOf(spark, path, 99L).count()
    }
    assert(e.getMessage.contains("above the newest manifested batch"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("knn_join_pq_gen: grid all-true across the cutover (successor's carried sidecar serves the batch join)") {
    val grid = graft.index.SnapshotLayout.knnJoinPqGenChecked(spark, sf).collect()
    val n = graft.core.Tables.embeddings(spark, sf)
      .filter(!($"vec_id" < 25 && $"vec_id" % 7 === 0)).count()
    assert(grid.length.toLong == n * 5,
      "every live-at-head vector must get exactly 5 ranked hits")
    Seq("neighbor_live", "not_self", "score_exact", "monotone",
      "routed_to_successor", "sidecar_carried").foreach { c =>
      assert(grid.forall(_.getAs[Boolean](c)), s"grid column $c not all-true")
    }
  }
}
