package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One field of a flat protobuf message: proto field number, output
  * column name, and Spark type. Supported types: LongType/IntegerType/
  * BooleanType (varint), DoubleType (fixed64), FloatType (fixed32),
  * StringType/BinaryType (length-delimited). */
case class ProtoField(number: Int, name: String, dataType: DataType)

/** Minimal proto3 wire-format decoder for flat messages — the
  * `ProtoSchema` analog (`/root/reference/arcon/src/stream/source/schema.rs:4-60`;
  * the reference's whole data model is prost/protobuf rows,
  * `arcon/src/data/mod.rs:25-43`). The spark-protobuf connector jar is
  * not bundled in this build, and the wire format is small and public
  * (varints + fixed32/64 + length-delimited), so the decode is a native
  * expression:
  *
  *  - proto3 presence semantics: absent fields decode to their default
  *    (0 / 0.0 / false / "" / empty bytes) — exactly what prost's
  *    `Default` gives the reference;
  *  - unknown fields are skipped by wire type (forward-compatible);
  *  - malformed bytes yield NULL, the report-not-fail source contract
  *    ([[SourceSchemas.decodedProto]] drops them).
  */
case class ProtoDecodeExpr(child: Expression, fields: Seq[ProtoField])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f.name, f.dataType)))
  override def nullable: Boolean = true

  private val slotByNumber: Map[Int, Int] =
    fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap

  private def defaultOf(dt: DataType): Any = dt match {
    case LongType    => 0L
    case IntegerType => 0
    case BooleanType => false
    case DoubleType  => 0.0
    case FloatType   => 0.0f
    case StringType  => UTF8String.EMPTY_UTF8
    case BinaryType  => Array.emptyByteArray
    case other => throw new IllegalArgumentException(s"unsupported proto type $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val values = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) { values(i) = defaultOf(fields(i).dataType); i += 1 }
      var pos = 0

      def varint(): Long = {
        var shift = 0
        var res = 0L
        var b = 0
        do {
          // protobuf caps varints at 10 bytes (shift 63); an overlong
          // encoding is malformed, not a mod-64 wraparound
          if (shift > 63) throw ProtoDecodeExpr.Malformed
          b = bytes(pos) & 0xFF
          pos += 1
          res |= (b & 0x7FL) << shift
          shift += 7
        } while ((b & 0x80) != 0)
        res
      }
      def fixed64(): Long = {
        var v = 0L
        var k = 0
        while (k < 8) { v |= (bytes(pos + k) & 0xFFL) << (8 * k); k += 1 }
        pos += 8
        v
      }
      def fixed32(): Int = {
        var v = 0
        var k = 0
        while (k < 4) { v |= (bytes(pos + k) & 0xFF) << (8 * k); k += 1 }
        pos += 4
        v
      }

      var bad = false
      while (!bad && pos < bytes.length) {
        val tag = varint()
        val fieldNo = (tag >>> 3).toInt
        val wire = (tag & 7).toInt
        val slot = slotByNumber.getOrElse(fieldNo, -1)
        wire match {
          case 0 =>
            val v = varint()
            if (slot >= 0) fields(slot).dataType match {
              case LongType    => values(slot) = v
              case IntegerType => values(slot) = v.toInt
              case BooleanType => values(slot) = v != 0L
              case _           => bad = true // wire/type mismatch
            }
          case 1 =>
            val v = fixed64()
            if (slot >= 0) fields(slot).dataType match {
              case DoubleType => values(slot) = java.lang.Double.longBitsToDouble(v)
              case LongType   => values(slot) = v
              case _          => bad = true
            }
          case 2 =>
            val len = varint().toInt
            if (len < 0 || pos + len > bytes.length) bad = true
            else {
              if (slot >= 0) {
                val chunk = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
                fields(slot).dataType match {
                  case StringType => values(slot) = UTF8String.fromBytes(chunk)
                  case BinaryType => values(slot) = chunk
                  case _          => bad = true
                }
              }
              pos += len
            }
          case 5 =>
            val v = fixed32()
            if (slot >= 0) fields(slot).dataType match {
              case FloatType   => values(slot) = java.lang.Float.intBitsToFloat(v)
              case IntegerType => values(slot) = v
              case _           => bad = true
            }
          case _ => bad = true // groups (3/4) unsupported
        }
      }
      if (bad) null else new GenericInternalRow(values)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null // truncated message
      case ProtoDecodeExpr.Malformed => null // overlong varint
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoDecodeExpr =
    copy(child = newChild)
}

object ProtoDecodeExpr {
  /** Stackless control-flow signal for malformed wire bytes. */
  private[sources] object Malformed
      extends RuntimeException with scala.util.control.NoStackTrace
}

object ProtoDecode {
  /** proto bytes column → struct column. */
  def protoValue(value: Column, fields: Seq[ProtoField]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ProtoDecodeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(value), fields))
}
