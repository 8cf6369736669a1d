package graft.text

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear bag-of-hashed-ngrams quality classifier — the
  * fasttext-style pretraining quality gate (Joulin et al.,
  * arXiv:1607.01759; the CCNet/LLaMA corpus-filter recipe trains
  * exactly this shape: hashed uni+bigram features into a linear
  * model, then scores every document). The DISCRIMINATIVE
  * counterpart to [[TextOps.dsirImportance]]'s generative
  * importance ratio, sharing its target slice (`lang = 'en'`) and
  * its hashed-feature space, so the two gates compose: documents the
  * two disagree on are the interesting review queue.
  *
  * Training is a driver-bounded PERCEPTRON, not float SGD, by
  * design: updates are integer (w ← w + y·tf), so the learned
  * weights are EXACT integers reproducible bit-for-bit by any
  * independent implementation — the property that lets
  * `quality_train` be golden-pinned value-exact (the bpe_train
  * pattern, tools/golden_quality.py) where float SGD would drift by
  * ulps across runtimes. The model is linear either way; fasttext's
  * own advantage is the hashed bag, not the loss.
  *
  * Scale shape: the training SAMPLE is a constant-cap deterministic
  * hash sample ([[trainCap]] ≈ 512 docs at any corpus size — the
  * Whiten.fitCap discipline), collected as sparse tf maps, epochs
  * run driver-side in doc_id order (deterministic); the corpus-wide
  * SCORING pass is the dsir shape exactly: one tokenize+explode scan
  * into (doc, bucket, tf) postings, the ≤B-row weight table
  * BROADCAST onto it, one per-doc partial-agged rollup — the model
  * never rides a shuffle, the corpus never collects. */
object Quality {

  /** Hashed feature buckets (uni+bigrams, md5-60-bit → mod B). */
  val buckets = 4096
  /** Training-sample row budget: the linear separator converges at a
    * few hundred docs; past the cap the sample is a deterministic
    * hash sample, never corpus-proportional. */
  val trainCap = 512L
  /** Fixed perceptron epochs (deterministic, golden-pinned). */
  val epochs = 3
  private val targetLang = "en"

  /** (doc_id, is_target, b, tf) hashed-ngram postings — dsir's
    * featurization with this model's own bucket count. */
  private def postings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", ($"lang" === targetLang).as("is_target"),
        TextOps.tokens($"text").as("w"))
    toks.select($"doc_id", $"is_target",
        explode(concat(TextOps.shingles($"w", 1), TextOps.shingles($"w", 2))).as("g"))
      .select($"doc_id", $"is_target",
        (TextOps.hash60($"g") % buckets).as("b"))
      .groupBy($"doc_id", $"is_target", $"b")
      .agg(count(lit(1)).as("tf"))
  }

  /** Trained model: integer weight per touched bucket, integer bias,
    * and the total mistake count (training-dynamics observability). */
  final case class Model(w: Map[Long, Long], bias: Long, mistakes: Long)

  /** Driver-bounded deterministic perceptron fit. The sample is the
    * `hash60(doc_id) % (n/trainCap+1) = 0` slice (same predicate
    * family as label_knn_eval / Whiten.fitCap); collected rows are
    * ≤ ~trainCap sparse tf maps. Epoch order is doc_id ascending;
    * prediction at the margin (score = 0) counts as NEGATIVE — every
    * tie broken the same way in tools/golden_quality.py. */
  def fit(spark: SparkSession, dir: String): Model = {
    import spark.implicits._
    val n = Tables.documents(spark, dir).count()
    val m = n / trainCap + 1
    val sample = postings(spark, dir)
      .filter(pmod(TextOps.hash60(col("doc_id").cast("string")), lit(m)) === 0L)
      .groupBy($"doc_id", $"is_target")
      .agg(collect_list(struct($"b", $"tf")).as("fs"))
      .collect()
      .map { r =>
        val fs = r.getSeq[org.apache.spark.sql.Row](2)
          .map(f => (f.getLong(0), f.getLong(1))).sortBy(_._1)
        (r.getLong(0), if (r.getBoolean(1)) 1L else -1L, fs)
      }
      .sortBy(_._1)
    val w = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
    var bias = 0L
    var mistakes = 0L
    (1 to epochs).foreach { _ =>
      sample.foreach { case (_, y, fs) =>
        var s = bias
        fs.foreach { case (b, tf) => s += w(b) * tf }
        val pred = if (s > 0L) 1L else -1L
        if (pred != y) {
          mistakes += 1
          fs.foreach { case (b, tf) => w.update(b, w(b) + y * tf) }
          bias += y
        }
      }
    }
    Model(w.filter(_._2 != 0L).toMap, bias, mistakes)
  }

  /** `quality_train`: the trained model's head — bias and mistake
    * count at rank 0 (bucket −1), then the top-32 weights by (|w|
    * desc, bucket asc). Golden-pinned value-exact against the
    * INDEPENDENT from-scratch Python trainer (tools/golden_quality.py
    * — own tokenizer, md5, perceptron) on the driver's verify corpus,
    * the bpe_train convention; integer training is what makes the pin
    * exact rather than ulp-lucky. */
  def qualityTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = fit(spark, dir)
    val top = model.w.toSeq
      .sortBy { case (b, wt) => (-math.abs(wt), b) }.take(32)
      .zipWithIndex
      .map { case ((b, wt), i) => (i + 1L, b, wt) }
    ((0L, -1L, model.bias) +: top)
      .toDF("rank", "bucket", "weight")
      .withColumn("mistakes",
        when($"rank" === 0L, lit(model.mistakes)).otherwise(lit(-1L)))
      .orderBy($"rank")
  }

  /** `quality_score`: every document scored by the trained separator
    * (score = b + Σ tf·w over its hashed ngrams, keep ⇔ score > 0),
    * served as the golden-pinned head rows (doc_id < 8) plus the
    * corpus-total row (doc_id = −1: Σ n_feats, Σ score, n_keep) that
    * forces the full corpus pass — the bpe_apply convention. The
    * scoring plan is dsir's: weights broadcast onto the postings
    * scan, one per-doc rollup, |output| bounded by the pin. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = fit(spark, dir)
    val wdf = broadcast(model.w.toSeq.toDF("b", "wt"))
    val perDoc = postings(spark, dir)
      .join(wdf, Seq("b"), "left")
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_feats"),
        (sum($"tf" * coalesce($"wt", lit(0L))) + model.bias).as("score"))
      .select($"doc_id", $"n_feats", $"score", ($"score" > 0L).as("keep"))
      .localCheckpoint(true)
    val head = perDoc.filter($"doc_id" < 8)
    val total = perDoc.agg(
        sum($"n_feats").as("n_feats"), sum($"score").as("score"),
        (count(when($"keep", 1)) * 2 > count(lit(1))).as("keep"))
      .select(lit(-1L).as("doc_id"), $"n_feats", $"score", $"keep")
    head.unionByName(total).orderBy($"doc_id")
  }

  /** Decision thresholds swept by [[qualityPrCurve]]. */
  val prThresholds: Seq[Long] = Seq(-40L, -20L, 0L, 20L, 40L)

  /** `quality_pr_curve`: the quality gate MEASURED, not asserted —
    * precision/recall of `score > t` against the true `lang == en`
    * label at five thresholds (the lang_id_eval convention applied
    * to the trained classifier: a filter whose operating point was
    * never measured is a guess). Everything is integer (scores are
    * integer perceptron sums, P/R are truncating cross-multiplies),
    * so the whole curve is value-exact and golden-pinned against the
    * INDEPENDENT Python scorer (tools/golden_quality.py pr), the
    * quality_train convention.
    *
    * Scale shape: per-doc scores ride the same broadcast-weights
    * postings rollup as quality_score (no new scan shape); the
    * 5-row threshold frame cross-joins BROADCAST onto the per-doc
    * frame, one partial-agged shuffle onto |thresholds| groups. */
  def qualityPrCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = fit(spark, dir)
    val wdf = broadcast(model.w.toSeq.toDF("b", "wt"))
    val perDoc = postings(spark, dir)
      .join(wdf, Seq("b"), "left")
      .groupBy($"doc_id", $"is_target")
      .agg((sum($"tf" * coalesce($"wt", lit(0L))) + model.bias).as("score"))
    val th = prThresholds.toDF("thresh")
    perDoc.crossJoin(broadcast(th))
      .groupBy($"thresh")
      .agg(
        sum(when($"score" > $"thresh" && $"is_target", 1L).otherwise(0L)).as("tp"),
        sum(when($"score" > $"thresh" && !$"is_target", 1L).otherwise(0L)).as("fp"),
        sum(when($"score" <= $"thresh" && $"is_target", 1L).otherwise(0L)).as("fn"))
      .select($"thresh", $"tp", $"fp", $"fn",
        expr("tp * 1000000 div greatest(tp + fp, 1)").as("precision_e6"),
        expr("tp * 1000000 div greatest(tp + fn, 1)").as("recall_e6"))
      .orderBy($"thresh")
  }
}
