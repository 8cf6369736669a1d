package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Binary (1-bit) quantization primitives: a vector collapses to one
  * sign bit per dimension against a per-dimension threshold, packed
  * 32 bits per long word — d=64 floats (256 bytes) become 2 longs
  * (16 bytes), a 16× scan/storage reduction, and candidate scoring
  * becomes XOR + popcount (the RaBitQ/BQ family every large vector
  * store ships as its cheapest tier; the reference only ever scans
  * raw floats, /root/reference/src/models/collection.py:243-330).
  *
  * Both expressions are codegen'd tight loops over primitive words —
  * no higher-order-function allocation in the hot path — and both are
  * EXACT integer arithmetic, so a DuckDB twin (`1 << k` sums and
  * `bit_count(xor(..))`) matches bit-for-bit and the whole serve path
  * stays hash-oracle-able, unlike the float-scored index families
  * that need contract grids.
  *
  * 32 (not 64) bits per word: every per-word value stays strictly
  * below 2³¹, so the oracle can build words as SUMS of disjoint
  * powers of two without ever touching the sign bit — DuckDB's
  * `list_sum` HUGEINT widening then casts back to BIGINT losslessly.
  */
case class PackSignBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pack_sign_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(vec: Any, thr: Any): Any = {
    val x = vec.asInstanceOf[ArrayData]
    val t = thr.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), t.numElements())
    val out = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (x.getFloat(i).toDouble > t.getDouble(i))
        out(i / 32) |= 1L << (i % 32)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, t) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("words")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $t.numElements());
        long[] $out = new long[($n + 31) / 32];
        for (int $i = 0; $i < $n; $i++) {
          if ((double) $x.getFloat($i) > $t.getDouble($i)) {
            $out[$i / 32] |= 1L << ($i % 32);
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hamming distance between two packed signatures:
  * `Σ_w popcount(a[w] XOR b[w])` — the whole 64-dim comparison is two
  * XORs and two popcounts. */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "hamming_words"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long>, array<long>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 0L
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $h = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $h += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object bits {
  def packSignBits(vec: Column, thr: Column): Column =
    Bridge.column(PackSignBits(Bridge.expression(vec), Bridge.expression(thr)))

  def hammingWords(a: Column, b: Column): Column =
    Bridge.column(HammingWords(Bridge.expression(a), Bridge.expression(b)))
}
