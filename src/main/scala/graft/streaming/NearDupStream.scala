package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate candidate detection — the live twin of
  * the batch MinHash family ([[graft.dedup.Dedup.minhash]]): an
  * incoming document stream (a crawl frontier, an ingest queue) is
  * sketched per record and checked against watermark-bounded LSH
  * band-bucket state, emitting candidate pairs the moment the
  * near-dup arrives instead of waiting for the nightly batch pass.
  *
  * Same sketch, same banding as batch: distinct word-3-shingle
  * hashes mod P → 32-slot MinHash signature (a single per-row
  * expression — NO aggregation before the stateful operator, so the
  * plan stays a map + one keyed state exchange) → 8 bands of 4 rows;
  * a band's comma-joined slice is the bucket key. Each bucket
  * remembers up to [[defaultCap]] representative `(doc_id,
  * signature)` pairs; an arrival emits one candidate row per stored
  * representative with the signature-agreement estimate
  * (`est_jaccard_e6`, identical arithmetic to batch), then joins the
  * representatives itself.
  *
  * State is bounded two ways, the properties that make this viable
  * on an unbounded stream:
  *  - per bucket: ≤ cap representatives (the batch family's
  *    hot-bucket cap applied to state — a degenerate shingle that
  *    floods one bucket costs cap·|sig| longs, not the stream);
  *  - per key-space: event-time timeout at `watermark + delay` drops
  *    buckets the watermark has passed, so state is O(buckets per
  *    window), never O(all buckets ever) — the
  *    [[DedupStream]] discipline applied to near-dup state.
  *
  * Within a micro-batch, rows are processed in doc_id order, so a
  * batch's internal pairs are emitted exactly like the batch
  * operator's (smaller id first, one row per shared band). Replayed
  * doc_ids (at-least-once sources) are recognized in-state and
  * emit nothing.
  */
object NearDupStream {

  private val P = 2147483647L
  private val numHashes = 32
  private val bandRows = 4
  private val nBands = numHashes / bandRows
  val defaultCap = 64

  /** One LSH band arrival: `bkey` is the stateful grouping key
    * (band index + band signature). */
  private[streaming] case class BandRow(bkey: String, band: Int, doc_id: Long,
      sig: Seq[Long], ts: java.sql.Timestamp)

  /** Bucket state: representatives in arrival order + the newest
    * event time seen (drives the timeout). */
  private[streaming] case class Bucket(repIds: Seq[Long], repSigs: Seq[Seq[Long]],
      maxTsMs: Long)

  /** An emitted candidate: `doc_a < doc_b`, one row per shared band,
    * estimate = fraction of agreeing signature slots (e6). */
  case class Candidate(doc_a: Long, doc_b: Long, band: Int,
      est_jaccard_e6: Long)

  private def estE6(a: Seq[Long], b: Seq[Long]): Long = {
    var n = 0; var i = 0
    while (i < numHashes) { if (a(i) == b(i)) n += 1; i += 1 }
    math.floor(n.toDouble / numHashes * 1000000.0 + 0.5).toLong
  }

  /** Candidate pairs over a `(doc_id, text, ts)` stream; `delayMs`
    * is both the watermark delay and the bucket retention horizon. */
  def candidates(docs: DataFrame, delayMs: Long = 3600000L,
      cap: Int = defaultCap): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = docs
      .withWatermark("ts", s"$delayMs milliseconds")
      .withColumn("sh", array_distinct(transform(
        graft.functions.hashes.hashedWordShingles($"text", 3),
        h => pmod(h, lit(P)))))
      .filter(size($"sh") > 0)
      .withColumn("sig",
        graft.functions.hashes.minHashSignature($"sh", numHashes))
    val bands = sig
      .select($"doc_id", $"ts", $"sig",
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .select(
        concat($"band", lit(":"),
          array_join(slice($"sig", $"band" * bandRows + 1, lit(bandRows)), ","))
          .as("bkey"),
        $"band", $"doc_id", $"sig", $"ts")
      .as[BandRow]
    bands
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var bucket = state.getOption.getOrElse(Bucket(Nil, Nil, 0L))
            val out = Seq.newBuilder[Candidate]
            rows.toSeq.sortBy(_.doc_id).foreach { r =>
              if (!bucket.repIds.contains(r.doc_id)) {
                bucket.repIds.iterator.zip(bucket.repSigs.iterator)
                  .foreach { case (id, s) =>
                    out += Candidate(math.min(id, r.doc_id),
                      math.max(id, r.doc_id), r.band, estE6(s, r.sig))
                  }
                if (bucket.repIds.size < cap)
                  bucket = Bucket(bucket.repIds :+ r.doc_id,
                    bucket.repSigs :+ r.sig, bucket.maxTsMs)
              }
              bucket = bucket.copy(
                maxTsMs = math.max(bucket.maxTsMs, r.ts.getTime))
            }
            state.update(bucket)
            // a late bucket's own horizon may already trail the
            // global watermark — clamp so the timeout stays legal
            state.setTimeoutTimestamp(math.max(bucket.maxTsMs + delayMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
