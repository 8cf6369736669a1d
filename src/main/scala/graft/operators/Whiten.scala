package graft.operators

import graft.core.Tables
import org.apache.spark.ml.feature.{PCA, PCAModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA whitening over the embedding corpus (`embedding_whiten`) —
  * the dimensionality-reduction step a 100 TB pipeline runs BEFORE
  * indexing: a 64-d corpus projected to its top-16 principal axes is
  * 4× cheaper to scan, store, and shuffle in every downstream ANN
  * build, and whitened coordinates (unit variance per axis) are what
  * PQ/SQ quantizers assume when they allocate bits uniformly across
  * subspaces. The reference has no dimensionality reduction at all —
  * its vectors are scanned raw at full width on every search
  * (/root/reference/src/models/collection.py:195-208).
  *
  * Scale shape: the mean and the PCA fit reduce over one bounded
  * pass (MLlib computes the d×d covariance by treeAggregate — d²,
  * not n, state per task; d=64 here); when the corpus exceeds
  * [[fitCap]] the fit reads a deterministic hash-sampled subset (the
  * bounded-fit policy of the IVF KMeans, IvfIndex.scala:66) while
  * the PROJECTION always maps the full corpus. The whitened-
  * covariance probe expands each row to m² products with map-side
  * partial aggregation onto m²=256 keys — linear in the corpus,
  * output dimension-cardinality, never corpus-cardinality.
  *
  * The registry entry serves the summary contract grid (the oracle
  * pattern of ContractGrids): an eigendecomposition cannot
  * hash-match a SQL oracle — component signs alone are arbitrary —
  * but its CONTRACT can: every corpus row projected at width m,
  * orthonormal loadings, non-increasing captured variance down the
  * axes, and the whitened projection's covariance equal to the
  * identity within tolerance. Numeric quality beyond the booleans is
  * WhitenSpec's job.
  */
object Whiten {

  /** Projection width: 16 of 64 dims. On the near-isotropic synthetic
    * corpus this captures ~16/64 of total variance — the point is the
    * CONTRACT (orthonormality, decorrelation, unit variance), not a
    * variance-coverage claim. */
  val numComponents = 16

  /** Fit-sample row budget, mirroring the IVF KMeans bound: the d×d
    * covariance converges long before corpus scale; past the cap the
    * fit reads a deterministic hash sample, never the full corpus. */
  val fitCap = 131072L

  /** Absolute tolerance for orthonormality and (full-corpus-fit)
    * whitened-covariance probes: loose enough for float accumulation
    * order, far below any real decorrelation failure. */
  val tol = 1e-4

  final case class Fitted(mean: Array[Double], model: PCAModel,
      sampledFit: Boolean)

  /** Centered copy of an embedding column (double array). */
  private def centered(embedding: Column, mean: Array[Double]): Column =
    zip_with(embedding.cast("array<double>"), array(mean.map(lit): _*),
      (x, m) => x - m)

  /** Fit mean + loadings on (a bounded sample of) `emb`
    * (vec_id, embedding). */
  def fit(spark: SparkSession, emb: DataFrame, n: Long): Fitted = {
    import spark.implicits._
    val sampled = n > fitCap
    val fitRows = if (!sampled) emb
      else emb.filter(pmod(xxhash64($"vec_id"), lit(n / fitCap + 1)) === 0L)
    val d = emb.select(size($"embedding")).head().getInt(0)
    val meanRow = fitRows.select(
      (0 until d).map(i =>
        avg($"embedding".getItem(i).cast("double")).as(s"m$i")): _*).head()
    val mean = Array.tabulate(d)(meanRow.getDouble)
    val model = new PCA().setK(numComponents)
      .setInputCol("features").setOutputCol("proj")
      .fit(fitRows.select(
        array_to_vector(centered($"embedding", mean)).as("features")))
    Fitted(mean, model, sampled)
  }

  /** Full-corpus projection `(vec_id, proj: array<double> m)` onto
    * the fitted principal axes (centered, unscaled). */
  def projected(emb: DataFrame, fitted: Fitted): DataFrame =
    fitted.model.transform(
        emb.select(col("vec_id"),
          array_to_vector(centered(col("embedding"), fitted.mean))
            .as("features")))
      .select(col("vec_id"), vector_to_array(col("proj")).as("proj"))

  /** Whitened projection: each axis scaled to unit sample variance by
    * the FULL corpus' measured per-axis sd (not the fit sample's
    * eigenvalues — z must whiten what is actually served). Returns
    * the whitened frame and the measured per-axis variances in axis
    * order. */
  def whitened(spark: SparkSession, dir: String)
      : (DataFrame, Array[Double], Fitted) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val n = emb.count()
    val fitted = fit(spark, emb, n)
    // re-referenced by the variance pass, the whitening map, and the
    // grid's probes: one bounded materialization (n·m doubles)
    val proj = projected(emb, fitted).localCheckpoint(true)
    val varRows = proj
      .select(posexplode($"proj").as(Seq("axis", "y")))
      .groupBy($"axis").agg(var_samp($"y").as("v"))
      .orderBy($"axis").collect()
    val projVar = varRows.map(_.getAs[Double]("v"))
    val sdLit = array(projVar.map(v => lit(math.sqrt(v))): _*)
    val z = proj.select($"vec_id",
      zip_with($"proj", sdLit, (y, sd) => y / sd).as("z"))
    (z, projVar, fitted)
  }

  /** `embedding_whiten`: the whitening contract as a summary grid.
    *  - `rows_projected`: every corpus vector appears exactly once;
    *  - `proj_width`: every projection has exactly m components;
    *  - `components_orthonormal`: max |PᵀP − I| < [[tol]] over the
    *    d×m loading matrix (driver math on the bounded local matrix);
    *  - `variance_nonincreasing`: measured full-corpus per-axis
    *    variance never increases down the axis order (float-noise
    *    slack; sampling slack when the fit was capped);
    *  - `whitened_cov_identity`: the whitened projection's sample
    *    covariance is the identity within tolerance — diagonal by
    *    construction, off-diagonal the genuine PCA decorrelation
    *    claim (exact under a full-corpus fit; sampling-error-bounded
    *    under a capped fit, tolerance widened accordingly). */
  def embeddingWhitenGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (z, projVar, fitted) = whitened(spark, dir)
    val m = numComponents
    val n = Tables.embeddings(spark, dir).count()
    val nProj = z.count()
    val badWidth = z.filter(size($"z") =!= m).count()

    // PᵀP on the local d×m loading matrix (column-major values)
    val pc = fitted.model.pc.values
    val d = pc.length / m
    var maxOrtho = 0.0
    var i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        var s = 0.0
        var k = 0
        while (k < d) { s += pc(i * d + k) * pc(j * d + k); k += 1 }
        val dev = math.abs(s - (if (i == j) 1.0 else 0.0))
        if (dev > maxOrtho) maxOrtho = dev
        j += 1
      }
      i += 1
    }

    val varSlack = if (fitted.sampledFit) 0.05 else 1e-9
    val varMonotone = projVar.indices.drop(1)
      .forall(a => projVar(a) <= projVar(a - 1) * (1.0 + varSlack) + 1e-12)

    // whitened covariance: m² product sums + m axis sums, 256+16 keys
    val prods = z.select(posexplode(
        flatten(transform($"z", x => transform($"z", y => x * y))))
        .as(Seq("idx", "p")))
      .groupBy($"idx").agg(sum($"p").as("s"))
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Double]("s")).toMap
    val axisSums = z.select(posexplode($"z").as(Seq("axis", "zi")))
      .groupBy($"axis").agg(sum($"zi").as("s"))
      .collect().map(r => r.getAs[Int]("axis") -> r.getAs[Double]("s")).toMap
    val covTol = if (fitted.sampledFit) 5.0 / math.sqrt(fitCap.toDouble) else tol
    var maxCov = 0.0
    i = 0
    while (i < m) {
      var j = 0
      while (j < m) {
        val cov = (prods(i * m + j) - axisSums(i) * axisSums(j) / nProj) /
          (nProj - 1)
        val dev = math.abs(cov - (if (i == j) 1.0 else 0.0))
        if (dev > maxCov) maxCov = dev
        j += 1
      }
      i += 1
    }

    Seq(
      ("components_orthonormal", maxOrtho < tol),
      ("proj_width", badWidth == 0L),
      ("rows_projected", nProj == n && n > 0L),
      ("variance_nonincreasing", varMonotone),
      ("whitened_cov_identity", maxCov < covTol))
      .toDF("invariant", "holds").orderBy($"invariant")
  }

  val embeddingWhitenSql: String =
    """SELECT t.invariant, true AS holds
      |FROM (VALUES ('components_orthonormal'), ('proj_width'),
      |  ('rows_projected'), ('variance_nonincreasing'),
      |  ('whitened_cov_identity')) t(invariant)
      |ORDER BY invariant""".stripMargin
}
