package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** All LSH tables' sign-hyperplane bucket ids for one vector, in one
  * codegen'd pass — `result(t) = Σ_p (dot(v, plane[t][p]) >= 0) << p`.
  *
  * The planes ride a [[Broadcast]] consumed by the expression, NOT
  * literal trees in the plan: the previous `typedlit`-per-plane
  * encoding (×bits ×tables ×plan references) serialized multi-MiB
  * task binaries on every stage that touched a bucket column, and at
  * real embedding dims (1k+) would grow linearly worse. The broadcast
  * ships the float data once per executor; the expression tree is a
  * single node whatever the dim/bit/table counts.
  *
  * Equality/canonicalization is by broadcast identity — two
  * invocations build distinct broadcasts, so plans never falsely
  * dedup across different plane sets.
  */
case class HyperplaneBuckets(child: Expression,
    planesBc: Broadcast[Array[Array[Array[Float]]]])
    extends UnaryExpression {
  // malformed planes must fail at construction, not as a garbage
  // bucket id three stages later: every table needs ≥1 plane and every
  // plane one consistent width (the dim the caller promised matches
  // the embedder is checked by the callers; rectangularity is ours)
  require(planesBc.value.nonEmpty, "hyperplane_buckets: no tables")
  require(planesBc.value.forall(t =>
      t.nonEmpty && t.forall(_.length == t.head.length)),
    "hyperplane_buckets: empty or ragged plane table")

  override def prettyName: String = "hyperplane_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** Non-float arrays must be an ANALYSIS error: `ArrayData.getFloat`
    * on an array<double> reads reinterpreted garbage (not a cast), so
    * without this check a mistyped embedding column would silently
    * hash noise instead of failing the query. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val planes = planesBc.value
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0L
      var p = 0
      while (p < tbl.length) {
        val plane = tbl(p)
        val n = math.min(x.numElements(), plane.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getFloat(i).toDouble * plane(i).toDouble; i += 1 }
        if (dot >= 0.0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcClass = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("planesBc", planesBc, bcClass)
    // resolve the broadcast once per operator instance, not per row
    val planes = ctx.addMutableState("float[][][]", "hyperplanes",
      v => s"$v = (float[][][]) (($bcClass) $bcRef).value();")
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("buckets"); val tbl = ctx.freshName("tbl")
      val pl = ctx.freshName("plane"); val bucket = ctx.freshName("bucket")
      val dot = ctx.freshName("dot"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val p = ctx.freshName("p"); val i = ctx.freshName("i")
      s"""
        long[] $out = new long[$planes.length];
        for (int $t = 0; $t < $planes.length; $t++) {
          float[][] $tbl = $planes[$t];
          long $bucket = 0L;
          for (int $p = 0; $p < $tbl.length; $p++) {
            float[] $pl = $tbl[$p];
            int $n = java.lang.Math.min($x.numElements(), $pl.length);
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += (double) $x.getFloat($i) * (double) $pl[$i];
            }
            if ($dot >= 0.0) $bucket |= 1L << $p;
          }
          $out[$t] = $bucket;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object lsh {
  /** Column of all tables' bucket ids (array<long>, one element per
    * table) for an `Array[Float]` embedding column. */
  def hyperplaneBuckets(v: Column,
      planesBc: Broadcast[Array[Array[Array[Float]]]]): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v), planesBc))
}
