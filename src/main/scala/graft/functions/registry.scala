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

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimilarity(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("l2_distance",
      es => L2Distance(es(0), es(1)), "scala_udf")
    r.createOrReplaceTempFunction("simhash60",
      es => SimHash60(es(0)), "scala_udf")
    r.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es(0), intArg(es(1))), "scala_udf")
    r.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), intArg(es(1))), "scala_udf")
    r.createOrReplaceTempFunction("hashed_word_shingles",
      es => HashedWordShingles(es(0), intArg(es(1))), "scala_udf")
    r.createOrReplaceTempFunction("winnow_fingerprints",
      es => WinnowFingerprints(es(0), intArg(es(1)), intArg(es(2))), "scala_udf")
    r.createOrReplaceTempFunction("text_embed",
      es => TextEmbed(es(0), intArg(es(1))), "scala_udf")
  }
}
