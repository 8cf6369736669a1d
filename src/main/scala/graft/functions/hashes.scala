package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Single-pass sketch expressions over pre-hashed token arrays.
  *
  * The naive column-algebra formulations explode tokens × hash-slots
  * (8–16M shuffled rows at sf0.1) and pay a full groupBy shuffle; the
  * whole computation is per-row, so these expressions do it in one
  * tight loop with zero shuffle. The arithmetic is bit-identical to
  * the DuckDB oracle SQL (see Dedup.simhashSql / minhashSql).
  */

/** 60-bit term-frequency SimHash over an `array<bigint>` of word
  * hashes: bit j set iff Σ_words ((h>>j)&1)*2-1 > 0. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        counts(j) += (((h >>> j) & 1L).toInt * 2) - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over an `array<bigint>` of (already mod-P)
  * shingle hashes: slot h = min_x ((a_h·x + b_h) mod P) with
  * a_h = (1000003·h+12345) mod P, b_h = (999331·h+54321) mod P,
  * P = 2^31−1. Empty input → all-P signature (sentinel). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  private val P = 2147483647L
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = Array.fill(numHashes)(P)
    var h = 0
    while (h < numHashes) {
      val a = (1000003L * h + 12345L) % P
      val b = (999331L * h + 54321L) % P
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * xs.getLong(i) + b) % P
        if (v < m) m = v
        i += 1
      }
      if (n > 0) sig(h) = m
      h += 1
    }
    ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object hashes {
  def simHash60(c: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(c)))
  def minHashSignature(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), numHashes))
  def wordShingles(c: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), k))
  def winnowFingerprints(c: Column, gram: Int, window: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), gram, window))
  def hashedWordShingles(c: Column, k: Int): Column =
    Bridge.column(HashedWordShingles(Bridge.expression(c), k))
}

/** Word k-shingles in one pass: tokenize ([a-z0-9]+ runs over the
  * lowercased text, identical to `TextOps.tokens`) and emit
  * space-joined k-grams. The column-algebra version
  * (`transform(sequence(...), i -> slice(tokens(text), i, k))`)
  * re-evaluates the tokenizer for every element after project
  * collapsing — O(shingles × split) per row; this is O(chars). */
case class WordShingles(child: org.apache.spark.sql.catalyst.expressions.Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = s.length
    while (i <= n) {
      val c0 = if (i < n) s.charAt(i) else ' '
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += 1
    }
    val m = toks.length
    val out =
      if (m < k) Array.empty[org.apache.spark.unsafe.types.UTF8String]
      else Array.tabulate(m - k + 1) { j =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks.slice(j, j + k).mkString(" "))
      }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c)
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken) in one pass:
  * lowercase → char 8-grams → md5-based 60-bit hash per gram → min of
  * each 4-gram window → distinct mins. Hash values are bit-identical
  * to `CAST('0x'||substr(md5(gram),1,15) AS BIGINT)` (first 60 bits
  * of the md5), so the DuckDB oracle is unchanged; computing the
  * digest directly avoids one interpreted Catalyst call per gram
  * (~550 per document). */
case class WinnowFingerprints(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    gram: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.toLowerCase
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = s.length
    val hs: Array[Long] =
      if (n < gram) Array.empty
      else Array.tabulate(n - gram + 1) { i =>
        md.reset()
        val d = md.digest(s.substring(i, i + gram).getBytes("UTF-8"))
        var v = 0L
        var j = 0
        while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        (v << 4) | ((d(7) & 0xffL) >>> 4) // first 15 hex digits = 60 bits
      }
    val mins =
      if (hs.length < window) hs
      else Array.tabulate(hs.length - window + 1) { i =>
        var m = hs(i)
        var j = 1
        while (j < window) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
        m
      }
    ArrayData.toArrayData(mins.distinct)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c)
}

/** Word k-shingles hashed in one pass: tokenize ([a-z0-9]+ runs over
  * the lowercased text, same as [[WordShingles]]), join each k-gram
  * with spaces, hash with md5 and keep the first 60 bits — the value
  * equals `CAST('0x'||substr(md5(shingle),1,15) AS BIGINT)`, so the
  * oracle SQL is unchanged while the interpreted per-element Catalyst
  * md5 call disappears. k=1 yields per-word hashes (SimHash input,
  * multiplicity preserved). */
case class HashedWordShingles(
    child: org.apache.spark.sql.catalyst.expressions.Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "hashed_word_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = s.length
    while (i <= n) {
      val c0 = if (i < n) s.charAt(i) else ' '
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      i += 1
    }
    val m = toks.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val out: Array[Long] =
      if (m < k) Array.empty
      else Array.tabulate(m - k + 1) { j =>
        md.reset()
        val d = md.digest(toks.slice(j, j + k).mkString(" ").getBytes("UTF-8"))
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        (v << 4) | ((d(7) & 0xffL) >>> 4)
      }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c)
}
