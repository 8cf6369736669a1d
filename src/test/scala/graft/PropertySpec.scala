package graft

import graft.embed.Embedder
import graft.functions.hashes
import graft.functions.vectors._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the custom expressions: mathematical
  * invariants that must hold for arbitrary inputs, not just the
  * fixtures the oracle covers. Generators are driven with fixed
  * seeds so failures are reproducible. */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100f, 100f)).map(_.toArray))

  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ' ', ',', '.', '!', '\t')
    )).map(_.mkString)

  test("cosine similarity is bounded, symmetric, and 1 on self") {
    val pairs = samples(Gen.zip(vecGen, vecGen), 30).map { case (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      (a0.take(n), b0.take(n))
    }
    val rows = pairs.toDF("a", "b").select(
      cosineSim($"a", $"b"), cosineSim($"b", $"a"), cosineSim($"a", $"a"),
      $"a").collect()
    rows.foreach { row =>
      val (ab, ba, aa) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"unbounded: $ab")
      assert(ab == ba, "asymmetric") // identical accumulation order → bit equality
      val zero = row.getSeq[Float](3).forall(_ == 0f)
      assert(if (zero) aa == 0.0 else math.abs(aa - 1.0) < 1e-9, s"self-sim $aa")
    }
  }

  test("l2 distance satisfies identity and symmetry") {
    val rows = samples(vecGen, 30).map(a => (a, a.map(x => -x)))
      .toDF("a", "b").select(
        l2Distance($"a", $"a"), l2Distance($"a", $"b"), l2Distance($"b", $"a")
      ).collect()
    rows.foreach { row =>
      assert(row.getDouble(0) == 0.0)
      assert(row.getDouble(1) == row.getDouble(2))
    }
  }

  test("word shingles: count = max(0, tokens - k + 1); hashed variant aligns") {
    for (k <- 1 to 4) {
      val rows = samples(textGen, 40).toDF("text").select(
        size(filter(split(lower($"text"), "[^a-z0-9]+"), x => x =!= "")),
        size(hashes.wordShingles($"text", k)),
        size(hashes.hashedWordShingles($"text", k))).collect()
      rows.foreach { row =>
        val expected = math.max(0, row.getInt(0) - k + 1)
        assert(row.getInt(1) == expected, s"k=$k shingles")
        assert(row.getInt(2) == expected, s"k=$k hashed shingles")
      }
    }
  }

  test("embedder output is always unit-norm or exactly zero, any input") {
    val rows = samples(textGen, 50).toDF("text")
      .select(Embedder.embedText($"text").as("e"))
      .select(sqrt(dotProduct($"e", $"e"))).collect()
    rows.foreach { row =>
      val norm = row.getDouble(0)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-5, s"norm $norm")
    }
  }

  test("minhash signature values are within [0, P) with length numHashes") {
    val xsGen = Gen.nonEmptyListOf(Gen.choose(0L, 2147483646L)).map(_.toArray)
    val rows = samples(xsGen, 30).map(Tuple1(_)).toDF("xs")
      .select(hashes.minHashSignature($"xs", 8).as("sig")).collect()
    rows.foreach { row =>
      val sig = row.getSeq[Long](0)
      assert(sig.length == 8)
      assert(sig.forall(v => v >= 0L && v < 2147483647L))
    }
  }

  test("Stab.floorDiv floors on NEGATIVE dividends (Math.floorDiv semantics)") {
    // MEASURED (round 8, bq_build compare cycle): DuckDB's BIGINT `//`
    // TRUNCATES toward zero exactly like Spark `div` — the two engines
    // already agree on signed integer division, and Stab.floorDiv is
    // the MATHEMATICAL-floor variant whose oracle twin is
    // Stab.sqlFloorDiv (explicit floor emulation over `//`). This
    // pins floorDiv to Java's Math.floorDiv for b > 0. Grid covers
    // sign boundaries, exact multiples, and magnitudes past 2^53
    // (where a double round-trip would corrupt).
    val pairs = for {
      a <- Seq(-9007199254740993L, -1000000007L, -7L, -6L, -1L, 0L,
        1L, 7L, 1000000007L, 9007199254740993L)
      b <- Seq(1L, 2L, 3L, 7L, 1000000L)
    } yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(graft.core.Stab.floorDiv($"a", $"b")).as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == Math.floorDiv(a, b),
        s"floorDiv($a, $b) = $g, want ${Math.floorDiv(a, b)} " +
          s"(spark div would give ${a / b})")
    }
    // and the e6 form on a signed mean: -7/2 per-mille style
    val e6 = Seq((-7L, 2L)).toDF("a", "b")
      .select(graft.core.Stab.floorDivE6($"a", $"b")).as[Long].head()
    assert(e6 == -3500000L)
  }
}
