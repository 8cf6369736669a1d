package graft

import graft.operators.Clusters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exemplar clustering + topic cards vs an INDEPENDENT plain-Scala
  * recomputation at sf0.001: assignment (cosine argmax with
  * lowest-exemplar ties), the per-cluster card, and the full smoothed
  * ratio topic scoring re-derived with BigInt arithmetic from raw
  * text — the whole served output must match set-exactly.
  */
class ClustersSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir = SparkTestSession.sf

  // ---- independent reference implementation ---------------------------

  private lazy val embs: Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def e6(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (0 until math.min(a.length, b.length)).foreach { i =>
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** vec_id → (cluster_id, cos_e6), argmax with lowest-cluster ties. */
  private lazy val refAssign: Map[Long, (Long, Long)] = {
    val ex = (0L until Clusters.K.toLong).map(c => c -> embs(c))
    embs.map { case (id, v) =>
      val best = ex.map { case (c, cv) => (c, e6(cos(v, cv))) }
        .minBy { case (c, s) => (-s, c) }
      id -> best
    }
  }

  test("cluster_assign matches the independent argmax recomputation") {
    val got = Clusters.clusterAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byCluster = refAssign.values.groupBy(_._1)
    val want = byCluster.toSeq.map { case (c, members) =>
      val scores = members.map(_._2).toSeq
      (c, scores.size.toLong,
        // truncating div, matching Spark `div` on possibly negative sums
        scores.sum / scores.size,
        scores.min, scores.max)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // every vector assigned; exemplars self-assign (their own cosine is
    // exactly 1.0 and ties break to the lowest id, which is themselves
    // unless an earlier exemplar duplicates them — assert directly)
    (0L until Clusters.K.toLong).foreach { c =>
      assert(refAssign(c)._1 == c, s"exemplar $c not self-assigned")
    }
    assert(refAssign.size == embs.size)
  }

  test("cluster_topics matches the independent BigInt ratio recomputation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // tokenize exactly like TextOps.tokens
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
    val tf = scala.collection.mutable.Map.empty[(Long, String), Long]
    docs.foreach { case (id, text) =>
      refAssign.get(id).foreach { case (c, _) =>
        toks(text).foreach(t => tf((c, t)) = tf.getOrElse((c, t), 0L) + 1L)
      }
    }
    val totC = tf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val tfG = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val totG = tf.values.sum
    val v = tfG.size.toLong
    val want = tf.toSeq.map { case ((c, t), n) =>
      val num = BigInt(n + 1) * BigInt((totG - totC(c)) + v) * BigInt(1000000)
      val den = BigInt((tfG(t) - n) + 1) * BigInt(totC(c) + v)
      (c, t, n, (num / den).toLong) // BigInt / truncates like div and //
    }
    val top = want.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
      rows.sortBy { case (_, t, _, s) => (-s, t) }.take(5).zipWithIndex
        .map { case ((_, t, n, s), i) => (c, t, n, s, i + 1L) }
    }.sortBy(r => (r._1, r._5))
    val got = Clusters.clusterTopics(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == top)
    // the cut is discriminative: top terms are cluster-enriched (>1e6)
    assert(got.forall(_._4 > 1000000L))
  }

  test("sample_kcenter replays the greedy recurrence; coverage is monotone") {
    val ids = embs.keys.toSeq.sorted
    var sel = List(0L)
    var want = List((1L, 0L, 1000000L))
    (2 to graft.operators.Coreset.k).foreach { rank =>
      val best = ids.map { id =>
        (sel.map(s => e6(cos(embs(id), embs(s)))).max, id)
      }.min // minimal max-cos, tie → smaller vec_id
      sel = sel :+ best._2
      want = want :+ ((rank.toLong, best._2, best._1))
    }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = graft.operators.Coreset.sampleKcenter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // every intermediate coverage checkpoint was freed (the bpeTrain
    // discipline): the op leaves NO new persistent RDDs behind
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"sample_kcenter leaked checkpoints: ${after -- before}")
    assert(got == want)
    // the coverage radius can only improve: max-cos non-decreasing
    // from rank 2 on (rank 1 is the seed's self-similarity)
    val curve = got.drop(1).map(_._3)
    assert(curve == curve.sorted)
    // picks are distinct vectors
    assert(got.map(_._2).distinct.size == got.size)
  }
}
