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

  /** Session-scoped memo for trained merge tables, keyed on
    * (dir, numMerges, batch) and invalidated by store writes under the
    * dir — `bpe_train`, `bpe_apply`, and `tok_fertility` all consume
    * the SAME training run instead of each re-running the full
    * driver-coordinated loop (3× training cost per bench pass before
    * this; the Dedup.signatures pattern). The value is a ≤numMerges-row
    * driver-side Seq — no executor memory to evict. */
  private val mergeCache =
    new graft.store.VersionedMemo[Seq[(Long, String, String, String, Long)]]()

  /** Memoized merge-table training. `batchSize = 1` is the exact
    * sequential Sennrich loop; `batchSize = m > 1` selects up to m
    * non-interacting pairs per driver round (see [[bpeTrainBatched]]). */
  def trainedMerges(spark: SparkSession, dir: String, numMerges: Int,
      batchSize: Int = 1): Seq[(Long, String, String, String, Long)] =
    mergeCache.get(spark, s"bpe:$dir:$numMerges:$batchSize", dir) {
      trainLoop(spark, dir, numMerges, batchSize)
    }

  /** The training loop proper. One corpus scan builds the
    * word-frequency table; each round computes the pair-count frame,
    * gathers a BOUNDED top slice (8·batch rows — TakeOrdered heaps,
    * same ≤k-row driver-collect discipline as the IVF centroid path),
    * greedily keeps up to `batchSize` mutually NON-INTERACTING pairs
    * (no shared symbol and no pair consuming another's merged token —
    * for such pairs the old counts are exact, so the batch selects
    * precisely what sequential rounds would), applies them in rank
    * order in ONE pass over the vocab frame, and checkpoints once.
    * M merges therefore cost ~M/m driver rounds — the path to the
    * thousands-of-merges vocabularies a 100 TB tokenizer needs, where
    * one driver round per merge cannot. */
  private def trainLoop(spark: SparkSession, dir: String, numMerges: Int,
      batchSize: Int): Seq[(Long, String, String, String, Long)] = {
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
        .limit(math.max(1, 8 * batchSize)).collect()
      if (top.isEmpty) dry = true
      else {
        // greedy conflict-filtered batch: a candidate interacts with an
        // already-selected pair if it shares a symbol (b==c changes
        // (c,d)'s counts and vice versa) or touches its merged token
        // (the merge creates/consumes occurrences the old counts don't
        // reflect). Non-interacting ⇒ old counts stay exact for every
        // selected pair ⇒ the batch equals that many sequential rounds.
        val budget = math.min(batchSize, numMerges - rank + 1)
        val touched = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .foreach { case (a, b, n) =>
            if (picked.size < budget &&
                !Seq(a, b, a + b).exists(touched.contains)) {
              picked += ((a, b, n))
              touched ++= Seq(a, b, a + b)
            }
          }
        picked.foreach { case (a, b, n) =>
          merges += ((rank.toLong, a, b, a + b, n)); rank += 1
        }
        val prev = words
        words = words
          .select($"word", $"cnt",
            encodeSyms(picked.toSeq.map(p => (p._1, p._2)))($"syms").as("syms"))
          .localCheckpoint(true)
        graft.core.Checkpoints.free(prev)
      }
    }
    graft.core.Checkpoints.free(words)
    merges.toSeq
  }

  def bpeTrain(spark: SparkSession, dir: String, numMerges: Int = 20): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir, numMerges)
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"rank")
  }

  /** `bpe_train_batched`: the batched trainer surfaced as its own
    * oracled entry — 64 merges, 8 per driver round, golden-pinned
    * against `tools/golden_bpe.py batched` (the independent Python
    * trainer run with the identical selection rule). Where consecutive
    * picks don't interact, the table is identical to the sequential
    * trainer's (BpeBatchSpec asserts the prefix agreement directly). */
  def bpeTrainBatched(spark: SparkSession, dir: String, numMerges: Int = 64,
      batchSize: Int = 8): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir, numMerges, batchSize)
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy($"rank")
  }

  /** Fold a trained merge list (rank order) over a symbol array — the
    * BPE ENCODE step. Each rank applies greedily left-to-right exactly
    * as training did, so encode(word) reproduces training's final
    * segmentation of that word. The merges are driver-side constants
    * (≤ numMerges rows), so the whole encode is ONE column expression
    * evaluated per row — no per-rank jobs, no shuffles. */
  def encodeSyms(merges: Seq[(String, String)])(syms: Column): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => applyMerge(c, a, b) }

  /** Per-document encode statistics under a trained merge table — the
    * full-corpus frame `bpe_apply` and its spec both build on.
    *
    * Scale shape: the corpus tokenizes in one scan into per-(doc, word)
    * counts (partial-agged shuffle); the encode expression then runs
    * ONCE PER DISTINCT WORD (|vocab| rows — the same table training
    * iterated on), never once per corpus token — "the" encodes once,
    * not a billion times. One word-keyed join fans the token counts
    * back to the (doc, word) frame, and a doc-keyed aggregation
    * produces the per-doc stats. All four shuffles are partial-agged
    * or key-joins; nothing is corpus-quadratic and nothing collects.
    */
  def encodePerDoc(spark: SparkSession, dir: String,
                   merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val wordCounts = Tables.documents(spark, dir)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("cnt"))
    val encoded = wordCounts.select($"word").distinct()
      .select($"word",
        size(encodeSyms(merges)(
          filter(split($"word", "(?!^)"), x => x =!= ""))).as("n_toks"))
    wordCounts.join(encoded, "word")
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_words"),
        sum($"cnt" * length($"word")).as("n_chars"),
        sum($"cnt" * $"n_toks").as("n_bpe_tokens"))
  }

  /** Session-scoped memo for the per-doc encode frame — `bpe_apply`
    * and `tok_fertility` share ONE corpus-wide encode (checkpointed)
    * instead of each re-encoding; invalidated by store writes. */
  private val encodeCache =
    new graft.store.VersionedMemo[DataFrame](graft.core.Checkpoints.free)

  def encodePerDocCached(spark: SparkSession, dir: String,
      numMerges: Int): DataFrame =
    encodeCache.get(spark, s"bpe-encode:$dir:$numMerges", dir) {
      val merges = trainedMerges(spark, dir, numMerges).map(t => (t._2, t._3))
      encodePerDoc(spark, dir, merges).localCheckpoint(true)
    }

  /** BPE application (`bpe_apply`) — the encode half of the tokenizer
    * loop: train the merge table (`bpeTrain`), then segment the WHOLE
    * corpus with it and report per-document token counts under the
    * trained tokenizer — the real token-budget input `pack_token_
    * budget`-style packing needs (whitespace words overestimate; these
    * are the counts the tokenizer will actually produce).
    *
    * Output = six golden-pinned document rows (exact n_words/n_chars/
    * n_bpe_tokens/compression + the first three words' token
    * segmentation as a string) plus a `doc_id = -1` CORPUS-TOTAL row.
    * The total row is load-bearing for the bench label: it aggregates
    * the full per-doc frame, so Catalyst cannot push the pinned-id
    * filter into the scan and skip the corpus-wide encode. Oracle =
    * the same rows from the independent Python BPE
    * (tools/golden_bpe.py apply), the embed_text_golden pattern.
    */
  def bpeApply(spark: SparkSession, dir: String, numMerges: Int = 20,
               pinned: Seq[Long] = Seq(7L, 58L, 123L, 250L, 487L, 490L)): DataFrame = {
    import spark.implicits._
    val merges = trainedMerges(spark, dir, numMerges).map(t => (t._2, t._3))
    val perDoc = encodePerDocCached(spark, dir, numMerges)
    val cpt = (floor($"n_chars" * lit(1000000L) / $"n_bpe_tokens")).cast("long").as("cpt_e6")
    // first three words' segmentation, token order preserved via pos
    val head = Tables.documents(spark, dir)
      .filter($"doc_id".isin(pinned: _*))
      .select($"doc_id", posexplode(TextOps.tokens($"text")))
      .filter($"pos" < 3)
      .select($"doc_id", $"pos",
        encodeSyms(merges)(filter(split($"col", "(?!^)"), x => x =!= "")).as("toks"))
      .groupBy($"doc_id")
      .agg(concat_ws(" ", flatten(transform(
        array_sort(collect_list(struct($"pos", $"toks"))), s => s("toks")))).as("head_toks"))
    val pinnedRows = perDoc.filter($"doc_id".isin(pinned: _*))
      .join(head, "doc_id")
      .select($"doc_id", $"n_words", $"n_chars", $"n_bpe_tokens", cpt, $"head_toks")
    val total = perDoc
      .agg(sum($"n_words").as("n_words"), sum($"n_chars").as("n_chars"),
        sum($"n_bpe_tokens").as("n_bpe_tokens"))
      .select(lit(-1L).as("doc_id"), $"n_words", $"n_chars", $"n_bpe_tokens",
        cpt, lit("").as("head_toks"))
    pinnedRows.unionByName(total).orderBy($"doc_id")
  }

  /** `tok_fertility`: per-LANGUAGE tokenizer fertility under the
    * trained BPE — tokens-per-word and chars-per-token by language,
    * THE tokenizer-equity metric (a tokenizer trained on one
    * language's corpus fragments the others into more tokens per
    * word; high fertility = that language pays more compute per word
    * and fits less text per context window). Derived from the SAME
    * per-doc encode frame as bpe_apply, rolled onto the language dim
    * via one broadcast-joined lang column + one partial-agged
    * shuffle onto |langs| keys; both ratios truncating integer
    * cross-multiplies. Golden-pinned against the independent Python
    * BPE (tools/golden_bpe.py fertility), the bpe_apply convention —
    * value-exact because training, encoding, and the ratios are all
    * integer/deterministic. */
  def tokFertility(spark: SparkSession, dir: String,
      numMerges: Int = 20): DataFrame = {
    import spark.implicits._
    val langs = Tables.documents(spark, dir).select($"doc_id", $"lang")
    encodePerDocCached(spark, dir, numMerges)
      .join(langs, "doc_id")
      .groupBy($"lang")
      .agg(sum($"n_words").as("n_words"), sum($"n_chars").as("n_chars"),
        sum($"n_bpe_tokens").as("n_bpe_tokens"))
      .select($"lang", $"n_words", $"n_chars", $"n_bpe_tokens",
        expr("n_bpe_tokens * 1000000 div n_words").as("fertility_e6"),
        expr("n_chars * 1000000 div n_bpe_tokens").as("cpt_e6"))
      .orderBy($"lang")
  }

  /** Pins from `python3 tools/golden_bpe.py fertility` on sf0.01. */
  val tokFertilitySql: String =
    """SELECT lang, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
      |  CAST(fertility_e6 AS BIGINT) AS fertility_e6,
      |  CAST(cpt_e6 AS BIGINT) AS cpt_e6
      |FROM (VALUES
      |('de', 3549, 16046, 11506, 3242040, 1394576),
      |('en', 11757, 52898, 38241, 3252615, 1383279),
      |('es', 3958, 17871, 12924, 3265285, 1382776),
      |('fr', 3758, 16929, 12287, 3269558, 1377797),
      |('zh', 4143, 18765, 13601, 3282886, 1379677)
      |) t(lang, n_words, n_chars, n_bpe_tokens, fertility_e6, cpt_e6)
      |ORDER BY lang""".stripMargin
}
