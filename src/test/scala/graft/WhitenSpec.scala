package graft

import graft.operators.Whiten
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Numeric bars behind the `embedding_whiten` contract grid: the grid
  * reports booleans; these pin the magnitudes the booleans summarize
  * and the reconstruction/projection algebra the grid never touches.
  */
class WhitenSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("contract grid is all-true on the test corpus") {
    val grid = Whiten.embeddingWhitenGrid(spark, sf).collect()
    assert(grid.length == 5)
    val broken = grid.filter(!_.getAs[Boolean]("holds"))
      .map(_.getAs[String]("invariant"))
    assert(broken.isEmpty, s"broken invariants: ${broken.mkString(",")}")
  }

  test("loadings are orthonormal to float precision and projection matches manual P^T(x-mean)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val n = emb.count()
    val fitted = Whiten.fit(spark, emb, n)
    val m = Whiten.numComponents
    val pc = fitted.model.pc.values
    val d = pc.length / m
    // Gram deviation strictly tighter than the grid's 1e-4
    for (i <- 0 until m; j <- 0 until m) {
      val g = (0 until d).map(k => pc(i * d + k) * pc(j * d + k)).sum
      assert(math.abs(g - (if (i == j) 1.0 else 0.0)) < 1e-10,
        s"gram($i,$j)=$g")
    }
    // manual projection of one vector equals the served projection
    val row = emb.orderBy($"vec_id").head()
    val x = row.getSeq[Float](row.fieldIndex("embedding")).map(_.toDouble)
    val manual = Array.tabulate(m)(c =>
      (0 until d).map(k => (x(k) - fitted.mean(k)) * pc(c * d + k)).sum)
    val servedRow = Whiten.projected(emb, fitted)
      .filter($"vec_id" === row.getAs[Long]("vec_id")).head()
    val served = servedRow.getSeq[Double](servedRow.fieldIndex("proj"))
    manual.indices.foreach(c =>
      assert(math.abs(manual(c) - served(c)) < 1e-8,
        s"axis $c: manual ${manual(c)} vs served ${served(c)}"))
  }

  test("whitened axes have unit variance and pairwise |corr| < 1e-6 under a full-corpus fit") {
    val (z, projVar, fitted) = Whiten.whitened(spark, sf)
    assert(!fitted.sampledFit) // test corpus is far below fitCap
    assert(projVar.forall(_ > 0.0))
    // measured variance of every whitened axis is 1 to float precision
    val v = z.select(posexplode($"z").as(Seq("axis", "zi")))
      .groupBy($"axis").agg(var_samp($"zi").as("v"), avg($"zi").as("mu"))
      .orderBy($"axis").collect()
    assert(v.length == Whiten.numComponents)
    v.foreach { r =>
      assert(math.abs(r.getAs[Double]("v") - 1.0) < 1e-9,
        s"axis ${r.getAs[Int]("axis")} var ${r.getAs[Double]("v")}")
    }
    // decorrelation: every off-diagonal covariance ~ 0
    val rows = z.select(posexplode(
        flatten(transform($"z", x => transform($"z", y => x * y))))
        .as(Seq("idx", "p")))
      .groupBy($"idx").agg(sum($"p").as("s")).collect()
      .map(r => r.getAs[Int]("idx") -> r.getAs[Double]("s")).toMap
    val mu = v.map(r => r.getAs[Int]("axis") -> r.getAs[Double]("mu")).toMap
    val nP = z.count()
    val m = Whiten.numComponents
    for (i <- 0 until m; j <- 0 until m if i != j) {
      val cov = (rows(i * m + j) - mu(i) * mu(j) * nP) / (nP - 1)
      assert(math.abs(cov) < 1e-6, s"cov($i,$j)=$cov")
    }
  }
}
