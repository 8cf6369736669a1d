package graft.store

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Write-visibility registry for the session's index/sketch memos.
  *
  * The reference reflects every write in the next search because it
  * rebuilds the index inside `search()`
  * (/root/reference/src/models/collection.py:195-200). Here index
  * builds are memoized (a KMeans fit or graph build per query would
  * be the one thing slower than the reference), so write visibility
  * must be explicit: every [[CollectionStore]] mutation bumps the
  * version of its path, and [[VersionedMemo]] rebuilds any memo whose
  * data lives under a bumped path.
  */
object IndexVersions {
  private val bumps = new ConcurrentHashMap[String, AtomicLong]()

  /** Record a mutation of `path` — called by every store write. */
  def bump(path: String): Unit =
    bumps.computeIfAbsent(norm(path), _ => new AtomicLong()).incrementAndGet()

  /** Current version of everything under (or containing) `dir`: the
    * sum of bump counts whose path prefix-overlaps `dir`, so a write
    * to `dir/documents.parquet` invalidates memos keyed on `dir` and
    * a bump of `dir` itself invalidates memos on any table inside. */
  def version(dir: String): Long = {
    val d = norm(dir)
    var v = 0L
    bumps.forEach((k, n) => if (contains(k, d) || contains(d, k)) v += n.get())
    v
  }

  /** Path containment with a separator boundary: `/a/b` contains
    * `/a/b/c` but NOT `/a/bc` — raw startsWith would cross-invalidate
    * sibling dirs sharing a string prefix (sf1 vs sf10). */
  private def contains(parent: String, child: String): Boolean =
    child == parent || child.startsWith(parent + "/")

  private def norm(p: String): String = p.stripSuffix("/")
}

object VersionedMemo {
  /** Default entry cap. Sized for the heaviest user (the fine as-of
    * alphabet memo: one ~64 KB float block per swept as-of label —
    * VERDICT r14's long-lived-serving-session growth note); 64 bounds
    * any memo to a constant footprint while still covering every
    * concurrent layout/label a real session touches. */
  val defaultMaxEntries = 64
}

/** Session- and version-aware memo for built indexes/sketches.
  *
  *  - Keyed by (SparkSession, key): a DataFrame is bound to the
  *    session that created it, so a JVM-wide memo must never hand
  *    session A's plan to session B (a second driver in the same JVM
  *    would fail at action time against a stopped session).
  *  - Validated against [[IndexVersions]]: a store write under the
  *    memo's data dir invalidates the entry and the next lookup
  *    rebuilds, so upsert-then-query sees current data.
  *  - LRU-capped at `maxEntries`: a serving session sweeping an
  *    unbounded label space (one as-of fit per label) stays bounded —
  *    the least-recently-used entry is evicted (→ `onEvict`) and a
  *    re-access simply refits, byte-identical because every memoized
  *    build here is deterministic.
  *
  * `onEvict` releases the replaced value's executor memory (e.g.
  * `unpersist()` for cached plans).
  */
final class VersionedMemo[V](onEvict: V => Unit = (_: V) => (),
    maxEntries: Int = VersionedMemo.defaultMaxEntries) {
  private val tick = new AtomicLong()
  private final class Entry(val version: Long, val value: V) {
    @volatile var lastUsed: Long = tick.incrementAndGet()
  }
  private val m = new ConcurrentHashMap[(SparkSession, String), Entry]()

  /** Memoized `build`, rebuilt whenever `versionDir`'s data changes.
    * `key` distinguishes different corpora over the same dir. */
  def get(spark: SparkSession, key: String, versionDir: String)(build: => V): V = {
    // drop entries of stopped sessions first: they hold strong refs to
    // the dead session and its values, and their eviction hook frees
    // whatever executor/driver memory the value still pins — without
    // this a JVM cycling SparkSessions accumulates dead memos forever
    m.keySet.forEach { k =>
      if (k._1.sparkContext.isStopped) {
        val removed = m.remove(k)
        if (removed != null) evictQuietly(removed.value)
      }
    }
    val e = m.compute((spark, key), (_, old) =>
      if (old != null && old.version == IndexVersions.version(versionDir)) old
      else {
        if (old != null) evictQuietly(old.value)
        new Entry(IndexVersions.version(versionDir), build)
      })
    e.lastUsed = tick.incrementAndGet()
    // LRU trim AFTER the touch so the entry just served can never be
    // the eviction victim; the scan is O(entries) per insert against
    // a small constant cap. Entries touched within the last few ticks
    // are ALSO exempt (ADVICE r15): under concurrent gets at the cap,
    // the strict-LRU victim can be another thread's just-inserted,
    // just-returned entry — evicting it thrashes a Built whose cached
    // plan that thread is about to execute. Tolerating a brief
    // overshoot (return without evicting when every entry is recent)
    // costs a few extra entries for a moment; the next non-contended
    // insert trims back to the cap.
    val recentGrace = 4L
    while (m.size > maxEntries) {
      val now = tick.get()
      var victim: ((SparkSession, String), Entry) = null
      m.forEach { (k, v) =>
        if (v != e && now - v.lastUsed > recentGrace &&
            (victim == null || v.lastUsed < victim._2.lastUsed))
          victim = (k, v)
      }
      if (victim == null) return e.value // nothing evictable right now
      if (m.remove(victim._1, victim._2)) evictQuietly(victim._2.value)
    }
    e.value
  }

  /** The memoized value if present AND current — never builds. Lets
    * an operator OPPORTUNISTICALLY reuse an expensive sibling build
    * (e.g. dedup reading a session's persisted PQ sidecar codes
    * instead of re-encoding the corpus) without forcing that build
    * on sessions that never needed it. */
  def peek(spark: SparkSession, key: String, versionDir: String): Option[V] = {
    val e = m.get((spark, key))
    if (e != null && !spark.sparkContext.isStopped &&
        e.version == IndexVersions.version(versionDir)) {
      e.lastUsed = tick.incrementAndGet()
      Some(e.value)
    } else None
  }

  /** Live entry count — the LRU cap's observable (spec gate). */
  private[graft] def size: Int = m.size

  /** Eviction frees memory best-effort — it must never fail a lookup
    * (e.g. unpersist against an already-stopped session). */
  private def evictQuietly(v: V): Unit =
    try onEvict(v) catch { case _: Throwable => () }
}
