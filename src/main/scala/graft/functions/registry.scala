package graft.functions

import graft.embed.TextEmbed
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the graft expression family, so the whole
  * surface is reachable from `spark.sql(...)` as well as the Column
  * API — a reference user can stay in SQL:
  *
  * {{{
  * graft.functions.registry.register(spark)
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object registry {

  private def intArg(e: Expression): Int =
    e.eval(null).toString.toInt

  /** name → builder, the single source for both registration paths. */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "l2_distance" -> (es => L2Distance(es(0), es(1))),
    "simhash60" -> (es => SimHash60(es(0))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intArg(es(1)))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1)))),
    "hashed_word_shingles" -> (es => HashedWordShingles(es(0), intArg(es(1)))),
    "winnow_fingerprints" ->
      (es => WinnowFingerprints(es(0), intArg(es(1)), intArg(es(2)))),
    "text_embed" -> (es => TextEmbed(es(0), intArg(es(1)))))

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      r.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  /** Extension-time injection ([[graft.plans.GraftExtensions]]): the
    * same functions, but present in EVERY session built with the
    * graft extensions — no per-session registration call. */
  def injectInto(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        b))
    }
}
