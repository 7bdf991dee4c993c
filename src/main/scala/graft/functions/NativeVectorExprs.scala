package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path — same ordered
  * double-precision left folds as the `zip_with`/`aggregate`
  * formulations in [[VectorFunctions]] (bit-identical results, the
  * similarity oracles stay green), as one compiled loop per row with
  * `doGenCode` fusing the call into whole-stage codegen. */
object NativeVector {
  /** Ordered left-fold dot product of two float vectors in double.
    * PRECONDITION: equal lengths — callers ([[cosine]]) check once. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** cosine = dot / (sqrt(selfdot_a) * sqrt(selfdot_b)), ordered folds.
    * Length-mismatched vectors (a truncated/corrupt embedding) return
    * NaN — the library's "undefined similarity" sentinel (threshold
    * filters reject it, [[graft.operators.Similarity]] drops it before
    * ranking). An unchecked loop would read past the shorter array:
    * an exception on GenericArrayData, silent out-of-bounds GARBAGE on
    * UnsafeArrayData. */
  def cosine(a: ArrayData, b: ArrayData): Double =
    if (a.numElements() != b.numElements()) Double.NaN
    else dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Random-hyperplane LSH signature: plane p's component j is the
    * QUADRATICALLY-mixed value
    * `((idx² mod 1000003)·427799 + idx·653 + 7919) mod 1000003 /
    * 1000003 − 0.5` with idx = p·dim + j + 1; bit p =
    * [dot(a, plane_p) > 0], packed little-endian (ordered j-fold).
    * The mix must be NON-LINEAR in the flattened index: the previous
    * linear Weyl form (idx·2654435761 mod 1000003) made every plane a
    * 64-step window of ONE arithmetic sequence, so planes were
    * mutually correlated and the signature carried far fewer effective
    * bits than nPlanes — measured on 500 random unit vectors at 15
    * planes: 355 distinct buckets with an 8-member hottest (new form:
    * 492 / 2), i.e. bucket growth SATURATED as suggestedPlanes raised
    * the plane count, the exact failure the sim9 scale canary caught.
    * All integer steps stay < 2⁶³ for any idx the 62-plane cap allows,
    * and the same arithmetic is exact in the DuckDB oracle's BIGINT.
    * Vectors shorter than `dim` contribute only their present
    * components (missing ⇒ 0.0); longer ones ignore the excess.
    * Bounded reads either way — an unchecked getFloat(j) past the end
    * is an exception or unsafe-row garbage. (Parity with the HOF twin
    * is contracted for well-formed `dim`-length vectors only.) */
  def lshSignature(a: ArrayData, nPlanes: Int, dim: Int): Long = {
    val n = math.min(dim, a.numElements())
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0
      var j = 0
      while (j < n) {
        val idx = p.toLong * dim + j + 1
        val c = ((idx * idx % 1000003L * 427799L + idx * 653L + 7919L)
          % 1000003L).toDouble / 1000003.0 - 0.5
        d += a.getFloat(j).toDouble * c
        j += 1
      }
      if (d > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** [[VectorFunctions.cosine]] as a fused compiled loop. */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVector.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeVector.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

/** [[VectorFunctions.lshSignature]] as a fused compiled loop. */
case class LshSignatureExpr(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    NativeVector.lshSignature(input.asInstanceOf[ArrayData], nPlanes, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeVector.lshSignature($c, $nPlanes, $dim)")
  override protected def withNewChildInternal(newChild: Expression): LshSignatureExpr =
    copy(child = newChild)
}
