package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization codebook training and query LUT construction
  * — the driver-side half of the IVF-PQ layout ([[IvfIndex.persistPq]]
  * writes codes, [[IvfIndex.searchPersistedPq]] serves them).
  *
  * Scale shape (100 TB): the fit consumes a BOUNDED deterministic
  * sample (like [[IvfIndex.fitSampleCap]] — each Lloyd's iteration
  * would otherwise scan the corpus), runs on the driver over at most
  * `trainSampleCap × d` floats (2 MiB at d=64), and only the single
  * codegen'd [[graft.functions.PqEncode]] pass touches every row. A
  * PQ code is `m` bytes instead of `d×4` — the ADC scan of a probed
  * partition reads 32× less at d=64/m=8, which is the whole point for
  * corpora whose raw vectors don't fit cluster RAM (the reference
  * searches raw vectors only, ivf_index.py:139-185).
  *
  * Determinism: MLlib KMeans is not partition-stable (same rows,
  * different layout → different low bits), so the PQ fit does NOT use
  * it — the sample is taken by a total (xxhash64(vec_id), vec_id)
  * order and Lloyd's runs on the driver with seeded k-means++ init,
  * making codebooks (and therefore every code and every ADC score)
  * byte-identical across partition layouts.
  */
object PqCodebooks {

  /** 64-dim corpus → 8 subspaces of 8 dims, 16 codes each: an 8-byte
    * code (32× smaller than the raw vector) that still leaves the
    * exact rerank enough signal — measured recall@10 bar in PqSpec. */
  val defaultM = 8
  val defaultCodes = 16

  /** Driver-side fit budget: 8192 rows × 64 floats = 2 MiB. The
    * subspace estimation problem is m independent small-dim
    * clusterings — a bounded sample saturates it long before the
    * corpus does. */
  val trainSampleCap = 8192

  /** Train per-subspace codebooks on an L2-NORMALIZED bounded sample
    * of `emb` (vec_id, embedding). Codes quantize the normalized
    * vector because the search metric is cosine: on unit vectors
    * ‖q̂−v̂‖² = 2−2·cos orders identically (same rule as
    * [[graft.functions.PqEncode]]'s eval). Returns [sub][code][subDim]
    * with subDim = ⌈d/m⌉; short tails zero-pad, matching the encode
    * expression. */
  def train(emb: DataFrame, m: Int = defaultM, codes: Int = defaultCodes,
      seed: Long = 42L, cap: Int = trainSampleCap): Array[Array[Array[Float]]] = {
    // deterministic pseudo-random sample: TakeOrdered over a total
    // order — per-partition heaps, no full sort, no layout dependence
    val rows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cap)
      .collect()
      .sortBy(_.getLong(0))
    require(rows.nonEmpty, "pq train: empty corpus")
    val d = rows.head.getSeq[Float](1).length
    val subDim = (d + m - 1) / m
    // normalize + zero-pad once
    val data: Array[Array[Double]] = rows.map { r =>
      val v = r.getSeq[Float](1)
      var norm = 0.0
      v.foreach(x => norm += x.toDouble * x.toDouble)
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      val out = new Array[Double](m * subDim)
      var i = 0
      while (i < v.length) { out(i) = v(i) * inv; i += 1 }
      out
    }
    Array.tabulate(m) { s =>
      val pts = data.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyd(pts, codes, new scala.util.Random(seed + s))
    }
  }

  /** Plain Lloyd's with k-means++ seeding over a driver-resident point
    * set — deterministic given the point order and the seeded RNG.
    * Ties in assignment break toward the lowest centroid index (the
    * encode expression's rule); a centroid that loses all its points
    * keeps its previous position. */
  private def lloyd(pts: Array[Array[Double]], k: Int,
      rng: scala.util.Random, iters: Int = 25): Array[Array[Float]] = {
    val n = pts.length
    val dim = pts.head.length
    val kk = math.min(k, n)
    // k-means++ init
    val centers = Array.ofDim[Double](kk, dim)
    centers(0) = pts(rng.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var sum = 0.0
      var i = 0
      while (i < n) {
        val dd = sqDist(pts(i), centers(c - 1))
        if (dd < d2(i)) d2(i) = dd
        sum += d2(i)
        i += 1
      }
      val target = rng.nextDouble() * sum
      var acc = 0.0
      var pick = n - 1
      i = 0
      var found = false
      while (i < n && !found) {
        acc += d2(i)
        if (acc >= target) { pick = i; found = true }
        i += 1
      }
      centers(c) = pts(pick).clone()
      c += 1
    }
    val assign = new Array[Int](n)
    var it = 0
    var moved = true
    while (it < iters && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val dd = sqDist(pts(i), centers(j))
          if (dd < bestD) { bestD = dd; best = j }
          j += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      if (moved) {
        val sums = Array.ofDim[Double](kk, dim)
        val counts = new Array[Int](kk)
        i = 0
        while (i < n) {
          val a = assign(i)
          counts(a) += 1
          var j = 0
          while (j < dim) { sums(a)(j) += pts(i)(j); j += 1 }
          i += 1
        }
        var j = 0
        while (j < kk) {
          if (counts(j) > 0) {
            var t = 0
            while (t < dim) { centers(j)(t) = sums(j)(t) / counts(j); t += 1 }
          } // empty cluster keeps its previous centroid
          j += 1
        }
      }
      it += 1
    }
    centers.map(_.map(_.toFloat))
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  // ---- OPQ-style rotation (parametric, Ge et al. CVPR'13) ---------------

  /** Fit a d×d orthonormal rotation on the SAME bounded deterministic
    * sample the codebook fit uses: PCA basis (driver-side covariance +
    * cyclic Jacobi eigendecomposition — no MLlib, fully deterministic
    * for any partition layout, the codebook fit's own discipline),
    * with eigen-dimensions allocated to the m subspaces by BALANCED
    * variance product (greedy: next-largest eigenvalue goes to the
    * subspace with the smallest log-eigenvalue sum and free capacity).
    * Rotating into this basis decorrelates the subspaces and balances
    * their energy — the standard fix for PQ's independent-subspace
    * assumption; plain PCA order would instead pile all the variance
    * into subspace 0. Returns R with `out = R · v̂` (rows are the
    * reordered eigenvectors). */
  def fitRotation(emb: DataFrame, m: Int = defaultM,
      cap: Int = trainSampleCap): Array[Array[Float]] = {
    val rows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cap)
      .collect()
      .sortBy(_.getLong(0))
    require(rows.nonEmpty, "opq fit: empty corpus")
    val d = rows.head.getSeq[Float](1).length
    // normalized sample (rotation preserves norms, so fitting on unit
    // vectors matches the encode expression's normalize-then-quantize)
    val data = rows.map { r =>
      val v = r.getSeq[Float](1)
      var norm = 0.0
      v.foreach(x => norm += x.toDouble * x.toDouble)
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      Array.tabulate(d)(i => v(i) * inv)
    }
    val n = data.length
    // mean + covariance, driver-side doubles in fixed vec_id order
    val mean = new Array[Double](d)
    data.foreach { v => var i = 0; while (i < d) { mean(i) += v(i); i += 1 } }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](d, d)
    data.foreach { v =>
      var a = 0
      while (a < d) {
        val va = v(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += va * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { cov(i)(j) /= n; cov(j)(i) = cov(i)(j); j += 1 }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // eigenpairs descending by eigenvalue (ties by original index —
    // deterministic)
    val order = eigVals.indices.sortBy(k => (-eigVals(k), k))
    val subDim = (d + m - 1) / m
    // balanced allocation: subspace with the smallest log-λ product
    // (and free slots) takes the next-largest eigen-dimension
    val sums = new Array[Double](m)
    val slots = Array.fill(m)(0)
    val assigned = Array.fill(m)(List.empty[Int])
    order.foreach { k =>
      val s = (0 until m).filter(slots(_) < subDim)
        .minBy(s => (sums(s), s))
      assigned(s) = assigned(s) :+ k
      slots(s) += 1
      sums(s) += math.log(math.max(eigVals(k), 1e-12))
    }
    // R's row (s·subDim + slot) = the eigenvector assigned there;
    // unfilled tail rows (m·subDim > d) stay zero, matching the
    // encode expression's zero-pad
    val rot = Array.ofDim[Float](m * subDim, d)
    (0 until m).foreach { s =>
      assigned(s).zipWithIndex.foreach { case (k, slot) =>
        var j = 0
        while (j < d) { rot(s * subDim + slot)(j) = eigVecs(j)(k).toFloat; j += 1 }
      }
    }
    rot
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic sweep order, ~1e-10 off-diagonal convergence.
    * Returns (eigenvalues, eigenvectors as COLUMNS of V). */
  private def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-10) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += 2.0 * a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x => x
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Matrix-vector rotation as a column expression: `out[i] = Σ_j
    * R[i][j]·v[j]` via zip_with/aggregate — built-ins only, codegen'd,
    * one pass per row in the encode job. */
  def rotateCol(v: Column, rot: Array[Array[Float]]): Column = {
    val rows = array(rot.map(r => array(r.map(lit): _*)): _*)
    transform(rows, row =>
      aggregate(zip_with(row, v, (a, b) => a * b), lit(0.0f), (acc, x) => acc + x))
  }

  /** Driver-side rotation of one vector (the query path). */
  def rotateVec(q: Array[Float], rot: Array[Array[Float]]): Array[Float] =
    rot.map { row =>
      var s = 0.0
      var j = 0
      val n = math.min(row.length, q.length)
      while (j < n) { s += row(j).toDouble * q(j).toDouble; j += 1 }
      s.toFloat
    }

  /** Cross-distance table between two codebook sets over the same
    * subspace split: `table(s)(a)(b)` = squared L2 distance between
    * entry a of `aBooks(s)` and entry b of `bBooks(s)`, so
    * `Σ_s table(s)(aCode(s))(bCode(s))` ≈ ‖â − b̂‖² for vectors
    * encoded against the respective sets (ascending — the [[lut]]
    * ordering semantics with both sides quantized). m·|a|·|b| doubles:
    * 64 KiB at the batch join's 8×64×16 — one broadcast serves every
    * query of a batch kNN join, which is what kills the per-query
    * driver LUT state for corpus-as-queries shapes. */
  def crossTable(aBooks: Array[Array[Array[Float]]],
      bBooks: Array[Array[Array[Float]]]): Array[Array[Array[Double]]] = {
    require(aBooks.length == bBooks.length,
      "cross table: codebook sets differ in subspace count")
    aBooks.indices.toArray.map { s =>
      val ac = aBooks(s); val bc = bBooks(s)
      Array.tabulate(ac.length, bc.length) { (a, b) =>
        var d = 0.0
        var i = 0
        while (i < ac(a).length) {
          val t = ac(a)(i).toDouble - bc(b)(i).toDouble
          d += t * t
          i += 1
        }
        d
      }
    }
  }

  /** Symmetric-distance table for one codebook set: the
    * [[crossTable]] of the set against itself. */
  def sdcTable(books: Array[Array[Array[Float]]]): Array[Array[Array[Double]]] =
    crossTable(books, books)

  /** Query-side codebook resolution for the batch kNN join: the
    * CORPUS side is pinned to the sidecar's stored codes, but the
    * query side is encoded fresh per join — nothing stops it using a
    * finer alphabet. 64 codes (vs the stored 16) costs the same 1
    * byte per subspace on the co-location exchange and quarters the
    * query-side quantization error; measured on sf0.001 it is the
    * difference between the join clearing the exact-join recall bar
    * and missing it. */
  val fineCodes = 64

  /** Per-query ADC lookup table against trained codebooks:
    * `lut(s)(c)` = squared L2 distance between the NORMALIZED query's
    * s-th subvector (zero-padded, the encode rule) and codebook entry
    * c — so `Σ_s lut(s)(code(s))` ≈ ‖q̂ − v̂‖², ascending = most
    * similar first. */
  def lut(qVec: Array[Float],
      books: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    var norm = 0.0
    qVec.foreach(x => norm += x.toDouble * x.toDouble)
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val m = books.length
    val subDim = books(0)(0).length
    Array.tabulate(m) { s =>
      val off = s * subDim
      books(s).map { cent =>
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val qi = if (off + i < qVec.length) qVec(off + i).toDouble * inv else 0.0
          val t = qi - cent(i)
          d += t * t
          i += 1
        }
        d
      }
    }
  }
}
