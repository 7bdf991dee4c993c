package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path — same ordered
  * double-precision left folds as the `zip_with`/`aggregate`
  * formulations in [[VectorFunctions]] (bit-identical results, the
  * similarity oracles stay green), as one compiled loop per row instead
  * of interpreted per-element lambda evaluation. */
object NativeVector {
  /** Ordered left-fold dot product of two float vectors in double. */
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
}

/** cosine(a, b) = dot/(sqrt(selfdot_a) * sqrt(selfdot_b)), each sum an
  * ordered left fold — the [[VectorFunctions.cosine]] contract. */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    NativeVector.dot(aa, bb) /
      (math.sqrt(NativeVector.dot(aa, aa)) * math.sqrt(NativeVector.dot(bb, bb)))
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: plane p's component j is the Weyl
  * sequence value ((p*dim + j) * 2654435761 mod 1000003)/1000003 - 0.5;
  * bit p = [dot(a, plane_p) > 0]; bits packed little-endian — exactly
  * [[VectorFunctions.lshSignature]] (ordered j-fold per plane). */
case class LshSignatureExpr(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0
      var j = 0
      while (j < dim) {
        val c = (((p.toLong * dim + j) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
        d += a.getFloat(j).toDouble * c
        j += 1
      }
      if (d > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression): LshSignatureExpr =
    copy(child = newChild)
}
