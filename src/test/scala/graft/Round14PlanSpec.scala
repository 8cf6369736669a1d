package graft

import graft.index.IvfIndex
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 pins for the SESSION-DERIVED scale knobs (VERDICT r13 #1):
  * `coSaltBuckets` and the IVF cluster count were constants (8 and
  * 16), giving the corpus-shaped joins a hard k×S parallelism ceiling
  * no bigger machine could lift — the exact failure class the r13 10×
  * DNF measured. Both now derive from the session/corpus with conf
  * overrides; these tests pin (a) the salt width actually FOLLOWS the
  * config into the exchange, (b) results are salt-width-INVARIANT
  * (the exactly-once pair property is what makes the wiring safe to
  * vary), and (c) the derivations themselves.
  */
class Round14PlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Explode-generator widths in a physical plan: the ×S fan-out the
    * salted joins build is `explode(array(0..S-1))`, which reaches the
    * executed plan either as a CreateArray or constant-folded to an
    * array Literal. */
  private def explodeWidths(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    val plan = df.queryExecution.executedPlan
    plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g.boundGenerator
    }.collect {
      case Explode(arr: CreateArray) => arr.children.length
      case Explode(Literal(a: ArrayData, _)) => a.numElements()
    }
  }

  private def withSalt[T](s: Option[Int])(body: => T): T = {
    val old = spark.conf.getOption(IvfIndex.coSaltConfKey)
    s match {
      case Some(v) => spark.conf.set(IvfIndex.coSaltConfKey, v.toString)
      case None => spark.conf.unset(IvfIndex.coSaltConfKey)
    }
    try body
    finally {
      spark.conf.unset(IvfIndex.coSaltConfKey)
      old.foreach(spark.conf.set(IvfIndex.coSaltConfKey, _))
    }
  }

  test("salt width follows the session config into the exchange fan-out") {
    val base = IvfIndex.pqLayoutFor(spark, sf)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      withSalt(Some(5)) {
        assert(IvfIndex.coSaltBuckets(spark) == 5)
        val cand = IvfIndex.knnJoinPqCand(spark, base,
          nProbe = IvfIndex.defaultNProbe, rerank = 200, sub = "pq")
        assert(explodeWidths(cand).contains(5),
          "no explode of width 5 in the candidate plan — the corpus-side " +
            "×S fan-out did not follow spark.graft.cosalt.buckets")
      }
      withSalt(Some(9)) {
        val cand = IvfIndex.knnJoinPqCand(spark, base,
          nProbe = IvfIndex.defaultNProbe, rerank = 200, sub = "pq")
        assert(explodeWidths(cand).contains(9))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("the probes STREAM and the codes BUILD: the measured orientation is pinned") {
    // Round 14 flipped the salt orientation, measured it 3× slower
    // (the probe-streamed join emits the pair stream grouped by q_id,
    // making the rank pre-cut's sort nearly free — SURVEY §19), and
    // kept the r13 shape. This pin makes that measured decision
    // suite-fatal: the shuffled hash join's BUILD side must be the
    // corpus codes and the probe side (q_code) must stream.
    val base = IvfIndex.pqLayoutFor(spark, sf)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val cand = IvfIndex.knnJoinPqCand(spark, base,
        nProbe = IvfIndex.defaultNProbe, rerank = 200, sub = "pq")
      val joins = cand.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "candidate stage lost its shuffled hash join")
      val j = joins.head
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      assert(build.output.exists(_.name == "code") &&
          !build.output.exists(_.name == "q_code"),
        "the corpus codes must BUILD and the probes must STREAM — " +
          s"build side outputs ${build.output.map(_.name).mkString(",")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("results are salt-width-invariant: S=3 and S=13 frames identical to the default") {
    def joinIvf() = IvfIndex.knnJoinIvf(IvfIndex.buildCached(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    def joinPq() = IvfIndex.knnJoinPq(spark, IvfIndex.pqLayoutFor(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    def dedup() = graft.dedup.Dedup.semanticDedupDecisions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).sortBy(_._1).toSeq
    val (ivfDefault, pqDefault, dedupDefault) = (joinIvf(), joinPq(), dedup())
    for (s <- Seq(3, 13)) withSalt(Some(s)) {
      assert(joinIvf() == ivfDefault, s"knn_join_ivf diverged at S=$s")
      assert(joinPq() == pqDefault, s"knn_join_pq diverged at S=$s")
      assert(dedup() == dedupDefault, s"dedup_semantic diverged at S=$s")
    }
  }

  test("derived defaults: S from parallelism, k from corpus size, nProbe from coverage") {
    // this suite runs local[4]: ceil(4/4)=1 clamps to the floor 8 —
    // the same width every r13 measurement used; a local[256] session
    // would derive 64 (the cap) with no code edit
    withSalt(None) {
      val p = spark.sparkContext.defaultParallelism
      assert(IvfIndex.coSaltBuckets(spark) ==
        math.min(64, math.max(8, math.ceil(p / 4.0).toInt)))
    }
    withSalt(Some(17))(assert(IvfIndex.coSaltBuckets(spark) == 17))

    // k ~ √n/3 past the measured small-corpus floor, capped
    assert(IvfIndex.kFor(spark, 500) == IvfIndex.defaultK)
    assert(IvfIndex.kFor(spark, 2304) == IvfIndex.defaultK)
    assert(IvfIndex.kFor(spark, 20000) == 48)
    assert(IvfIndex.kFor(spark, 1000000000L) == IvfIndex.maxAutoK)
    val oldK = spark.conf.getOption(IvfIndex.kConfKey)
    spark.conf.set(IvfIndex.kConfKey, "7")
    try assert(IvfIndex.kFor(spark, 1000000L) == 7)
    finally {
      spark.conf.unset(IvfIndex.kConfKey)
      oldK.foreach(spark.conf.set(IvfIndex.kConfKey, _))
    }

    // constant coverage: exactly the measured default at k = 16
    assert(IvfIndex.nProbeFor(IvfIndex.defaultK) == IvfIndex.defaultNProbe)
    assert(IvfIndex.nProbeFor(48) == 33)
  }

  test("auto-k build past the floor: kFor(n) centroids, serve still self-exact") {
    // replicate the test embeddings past the n = 2304 floor crossover
    // with distinct ids — the auto default must pick kFor(n), and the
    // coverage-scaled auto nProbe must keep the own-cluster guarantee
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val n0 = emb.count()
    val copies = math.ceil(3000.0 / n0).toInt
    val big = (0 until copies).map(i =>
      emb.select(($"vec_id" + lit(i.toLong * 100000L)).as("vec_id"),
        $"embedding")).reduce(_ unionByName _).localCheckpoint(true)
    val n = big.count()
    val expectK = IvfIndex.kFor(spark, n)
    assert(expectK > IvfIndex.defaultK, s"corpus of $n rows did not cross the floor")
    val built = IvfIndex.build(spark, big) // k = 0: the auto default
    assert(built.centroids.count() == expectK.toLong)
    // self-search through the auto-nProbe serve: own cluster is
    // always probed at the scaled coverage, so self is top-1 exact
    val queries = big.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val hits = IvfIndex.search(built, queries).localCheckpoint(true)
    val top1 = hits.filter($"rank" === 1L)
      .filter($"score_e6" === 1000000L).count()
    assert(top1 == queries.count(),
      "auto-k + auto-nProbe serve lost a self top-1")
  }
}
