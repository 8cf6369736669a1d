package graft.text

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (`bpe_train`) — the tokenizer-
  * training step of an LLM data pipeline, in the classic
  * Sennrich/GPT shape: learn the top-M byte-pair merges from corpus
  * statistics.
  *
  * Scale shape — the whole point of the word-frequency formulation:
  * the CORPUS is scanned exactly once (tokenize → word counts); every
  * one of the M iterations then runs on the WORD-FREQUENCY table
  * (|vocab| rows — ~10⁸ at 100 TB, trivially partitioned), never on
  * the corpus again. Per round: adjacent symbol pairs explode
  * map-side from each word's symbol array, ONE pair-keyed
  * partial-agged shuffle, a 1-row `orderBy.limit(1)` top-pair gather
  * (TakeOrdered k=1 heaps — the bounded ≤k-row driver collect the
  * IVF centroid path also uses), and a map-side left-to-right greedy
  * merge fold over the symbol arrays. The evolving vocab table is
  * localCheckpointed each round (iterative lineage cut, the
  * `dedup_components` discipline) with the previous checkpoint freed.
  *
  * Deterministic conventions (shared verbatim by the independent
  * Python reference, tools/golden_bpe.py, which pins the oracle):
  * words = the shared tokenizer (lower → split [^a-z0-9]+); no
  * end-of-word marker; pair counts weight every adjacent position
  * (overlapping) by word frequency; best pair = max by (count,
  * then lexicographic (left, right) ascending); merges apply
  * left-to-right greedily ("aaa" + (a,a) → ["aa", "a"]).
  */
object BpeTrain {

  /** One merge round's greedy left-to-right application as a fold:
    * append each symbol, but when the accumulator's last element is
    * `a` and the incoming symbol is `b`, replace that last element
    * with the merged token — which also prevents reuse of a
    * just-merged position, because the merged token no longer equals
    * `a` at the next step (and for a == b the fold consumes both). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  def bpeTrain(spark: SparkSession, dir: String, numMerges: Int = 20): DataFrame = {
    import spark.implicits._
    var words = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens($"text")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      // "(?!^)" splits between every pair of chars (never before the
      // first); Spark's split keeps trailing empty fragments (limit
      // -1 semantics, unlike java.lang.String.split), so drop them
      .select($"word", $"cnt",
        filter(split($"word", "(?!^)"), x => x =!= "").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 1
    var dry = false
    while (rank <= numMerges && !dry) {
      val top = words
        .select($"cnt", explode(when(size($"syms") >= 2,
          transform(sequence(lit(1), size($"syms") - 1),
            i => struct(element_at($"syms", i).as("a"), element_at($"syms", i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"cnt").as("n"))
        .orderBy($"n".desc, $"a".asc, $"b".asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank.toLong, a, b, a + b, n))
        val prev = words
        words = words
          .select($"word", $"cnt", applyMerge($"syms", a, b).as("syms"))
          .localCheckpoint(true)
        graft.core.Checkpoints.free(prev)
        rank += 1
      }
    }
    graft.core.Checkpoints.free(words)
    merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"rank")
  }
}
