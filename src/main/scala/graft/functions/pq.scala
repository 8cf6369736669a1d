package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization code for one vector, in one codegen'd pass:
  * the embedding is split into `m` contiguous subvectors and each is
  * assigned its argmin-L2 centroid in that subspace's codebook —
  * `code(s) = argmin_c ‖v[s·d/m : (s+1)·d/m] − codebook[s][c]‖²`.
  *
  * The codebooks ride a [[Broadcast]] shaped [sub][code][subDim]
  * (same discipline as [[HyperplaneBuckets]] — never plan literals),
  * and the output is `array<byte>`: m bytes per vector instead of
  * d×4 float bytes, the 100 TB storage/scan win PQ exists for.
  * Ties break toward the LOWEST code index, so encoding is
  * deterministic for any input partitioning.
  */
case class PqEncode(child: Expression,
    codebooksBc: Broadcast[Array[Array[Array[Float]]]])
    extends UnaryExpression {
  require(codebooksBc.value.nonEmpty, "pq_encode: no subspaces")
  require(codebooksBc.value.forall(cb =>
      cb.nonEmpty && cb.length <= 127 &&
        cb.forall(_.length == cb.head.length)),
    "pq_encode: empty, ragged, or >127-entry codebook")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val books = codebooksBc.value
    val m = books.length
    val out = new Array[Byte](m)
    // codes quantize the L2-NORMALIZED vector: the search metric is
    // cosine, and on unit vectors ‖q̂−v̂‖² = 2−2·cos orders identically
    // — the stored embedding stays raw, normalization happens here
    var norm = 0.0
    var j = 0
    while (j < x.numElements()) {
      val v = x.getFloat(j).toDouble; norm += v * v; j += 1
    }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = books(s)
      val subDim = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val xi = if (off + i < x.numElements()) x.getFloat(off + i).toDouble * inv else 0.0
          val diff = xi - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += subDim
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("codebooksBc", codebooksBc, bcClass)
    val books = ctx.addMutableState("float[][][]", "pqBooks",
      v => s"$v = (float[][][]) (($bcClass) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("codes"); val cb = ctx.freshName("cb")
      val cent = ctx.freshName("cent"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff"); val xi = ctx.freshName("xi")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val norm = ctx.freshName("norm"); val inv = ctx.freshName("inv")
      val j = ctx.freshName("j"); val vj = ctx.freshName("vj")
      s"""
        byte[] $out = new byte[$books.length];
        double $norm = 0.0;
        for (int $j = 0; $j < $x.numElements(); $j++) {
          double $vj = (double) $x.getFloat($j);
          $norm += $vj * $vj;
        }
        double $inv = ($norm == 0.0) ? 0.0 : 1.0 / java.lang.Math.sqrt($norm);
        int $off = 0;
        for (int $s = 0; $s < $books.length; $s++) {
          float[][] $cb = $books[$s];
          int $best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $cb.length; $c++) {
            float[] $cent = $cb[$c];
            double $d = 0.0;
            for (int $i = 0; $i < $cent.length; $i++) {
              double $xi = ($off + $i < $x.numElements())
                ? (double) $x.getFloat($off + $i) * $inv : 0.0;
              double $diff = $xi - (double) $cent[$i];
              $d += $diff * $diff;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $out[$s] = (byte) $best;
          $off += $cb[0].length;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score of a PQ code against one of the
  * per-query lookup tables: `Σ_s lut[q][s][code(s)]` — the query's
  * exact distance to each subspace centroid, precomputed ONCE per
  * query, turns scoring a vector into m byte-indexed adds. The LUT
  * rides a broadcast shaped [query][sub][code]; left = the
  * `array<byte>` code column, right = the query index. */
case class PqAdc(left: Expression, right: Expression,
    lutBc: Broadcast[Array[Array[Array[Double]]]])
    extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<byte>, int), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(codes: Any, qIdx: Any): Any = {
    val x = codes.asInstanceOf[ArrayData]
    val qi = qIdx.asInstanceOf[Int]
    val luts = lutBc.value
    if (qi < 0 || qi >= luts.length)
      throw new IllegalArgumentException(
        s"pq_adc: query index $qi outside the broadcast LUT [0, ${luts.length})")
    val lut = luts(qi)
    var d = 0.0
    var s = 0
    val m = math.min(x.numElements(), lut.length)
    while (s < m) { d += lut(s)(x.getByte(s).toInt & 0xff); s += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("lutBc", lutBc, bcClass)
    val luts = ctx.addMutableState("double[][][]", "pqLuts",
      v => s"$v = (double[][][]) (($bcClass) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, (codes, qIdx) => {
      val lut = ctx.freshName("lut"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val m = ctx.freshName("m")
      s"""
        if ($qIdx < 0 || $qIdx >= $luts.length) {
          throw new IllegalArgumentException(
            "pq_adc: query index " + $qIdx + " outside the broadcast LUT [0, " + $luts.length + ")");
        }
        double[][] $lut = $luts[$qIdx];
        double $d = 0.0;
        int $m = java.lang.Math.min($codes.numElements(), $lut.length);
        for (int $s = 0; $s < $m; $s++) {
          $d += $lut[$s][((int) $codes.getByte($s)) & 0xff];
        }
        ${ev.value} = $d;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric-distance (SDC) score of two PQ codes:
  * `Σ_s table[s][a(s)][b(s)]` where `table[s][c1][c2]` is the squared
  * L2 distance between codebook entries c1 and c2 of subspace s — so
  * the sum ≈ ‖â − b̂‖² on the normalized sphere (ascending = most
  * similar first, the [[PqAdc]] LUT's own ordering semantics).
  *
  * This is the BATCH-shape ADC: with a finite code alphabet, a
  * query's per-code LUT row is just a row-select of this one
  * code×code table by the query's own code — computed map-side with
  * ZERO per-query driver state, where the interactive path
  * ([[graft.index.IvfIndex.pqQueryState]]) collects the bounded query
  * set to build exact per-query LUTs. The table rides a broadcast
  * shaped [sub][leftCode][rightCode] — the two sides may use DIFFERENT
  * alphabets (the batch join encodes queries against a finer set, an
  * 8×64×16 cross table of 64 KiB) — and scoring a candidate pair
  * costs m table adds instead of d float multiplies. Both inputs are
  * `array<byte>` codes. */
case class PqSdc(left: Expression, right: Expression,
    tableBc: Broadcast[Array[Array[Array[Double]]]])
    extends BinaryExpression {
  override def prettyName: String = "pq_sdc"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<byte>, array<byte>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val table = tableBc.value
    var d = 0.0
    var s = 0
    val m = math.min(math.min(xa.numElements(), xb.numElements()), table.length)
    while (s < m) {
      d += table(s)(xa.getByte(s).toInt & 0xff)(xb.getByte(s).toInt & 0xff)
      s += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("sdcTableBc", tableBc, bcClass)
    val table = ctx.addMutableState("double[][][]", "pqSdcTable",
      v => s"$v = (double[][][]) (($bcClass) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
        double $d = 0.0;
        int $m = java.lang.Math.min(
          java.lang.Math.min($a.numElements(), $b.numElements()), $table.length);
        for (int $s = 0; $s < $m; $s++) {
          $d += $table[$s][((int) $a.getByte($s)) & 0xff][((int) $b.getByte($s)) & 0xff];
        }
        ${ev.value} = $d;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object pq {
  def pqEncode(v: Column, codebooksBc: Broadcast[Array[Array[Array[Float]]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(v), codebooksBc))

  def pqAdc(codes: Column, qIdx: Column,
      lutBc: Broadcast[Array[Array[Array[Double]]]]): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(qIdx), lutBc))

  def pqSdc(a: Column, b: Column,
      tableBc: Broadcast[Array[Array[Array[Double]]]]): Column =
    Bridge.column(PqSdc(Bridge.expression(a), Bridge.expression(b), tableBc))
}
