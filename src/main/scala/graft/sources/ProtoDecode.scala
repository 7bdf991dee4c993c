package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One field of a protobuf message: proto field number, output column
  * name, and Spark type. Scalar types: LongType/IntegerType/BooleanType
  * (varint — enums decode as IntegerType), DoubleType (fixed64),
  * FloatType (fixed32), StringType/BinaryType (length-delimited).
  * `repeated = true` decodes to `array<base type>` (packed and unpacked
  * wire encodings both accepted for numeric elements). A non-empty
  * `children` makes this a nested message field (wire type 2,
  * recursively decoded to a struct; combine with `repeated` for
  * `Vec<Message>`). */
case class ProtoField(number: Int, name: String, dataType: DataType = NullType,
    repeated: Boolean = false, children: Seq[ProtoField] = Nil) {
  /** The Spark-side type this field decodes to. */
  def sparkType: DataType = {
    val base =
      if (children.nonEmpty) StructType(children.map(c => StructField(c.name, c.sparkType)))
      else dataType
    if (repeated) ArrayType(base) else base
  }
}

object ProtoField {
  /** Nested message field (`Vec<Point>`-style when `repeated`). */
  def message(number: Int, name: String, children: Seq[ProtoField],
      repeated: Boolean = false): ProtoField =
    ProtoField(number, name, NullType, repeated, children)
}

/** Minimal proto3 wire-format decoder — the `ProtoSchema` analog
  * (`/root/reference/arcon/src/stream/source/schema.rs:4-60`; the
  * reference's whole data model is prost/protobuf rows,
  * `arcon/src/data/mod.rs:25-43`, including nested messages, `repeated`
  * fields, optionals and enums — exercised at
  * `/root/reference/arcon_tests/src/proto_derive_test.rs:29-60`). The
  * spark-protobuf connector jar is not bundled in this build, and the
  * wire format is small and public (varints + fixed32/64 +
  * length-delimited), so the decode is a native expression:
  *
  *  - proto3 presence semantics: absent scalars decode to their default
  *    (0 / 0.0 / false / "" / empty bytes) — exactly what prost's
  *    `Default` gives the reference; absent repeated fields decode to
  *    an empty array, absent nested messages to a NULL struct;
  *  - repeated numeric fields accept both packed (one length-delimited
  *    run) and unpacked (one tag per element) encodings, as proto3
  *    requires of parsers;
  *  - unknown fields are skipped by wire type (forward-compatible);
  *  - malformed bytes yield NULL, the report-not-fail source contract
  *    ([[SourceSchemas.decodedProto]] drops them).
  */
case class ProtoDecodeExpr(child: Expression, fields: Seq[ProtoField])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f.name, f.sparkType)))
  override def nullable: Boolean = true

  private def defaultOf(f: ProtoField): Any =
    if (f.repeated) null // lazily allocated buffer; empty array on emit
    else if (f.children.nonEmpty) null // absent message = NULL struct
    else f.dataType match {
      case LongType    => 0L
      case IntegerType => 0
      case BooleanType => false
      case DoubleType  => 0.0
      case FloatType   => 0.0f
      case StringType  => UTF8String.EMPTY_UTF8
      case BinaryType  => Array.emptyByteArray
      case other => throw new IllegalArgumentException(s"unsupported proto type $other")
    }

  /** proto3 merge of two decoded instances of the same message type:
    * scalar fields take the LATER instance's value unless it is the
    * proto3 default (an unset proto3 scalar is never encoded, so
    * default ⟺ absent-from-wire); repeated fields concatenate; nested
    * messages merge recursively. This is what a conforming decoder
    * (prost, protobuf-java) does when a singular embedded field occurs
    * more than once in one record.
    *
    * Known limitation: the field model tracks no wire-presence bit, so
    * "default" is decided by VALUE equality. An encoder that explicitly
    * writes a default scalar (legal wire, and observable under proto3
    * `optional` presence tracking) merges differently here than in
    * protobuf-java, which is last-VALUE-wins for any wire-present
    * scalar: an explicit later `0`/`""` is treated as absent and the
    * earlier value kept. Standard serializers never emit defaults, so
    * this diverges only on hand-crafted wire; fixing it would require a
    * per-slot presence flag threaded through [[decodeMessage]]. */
  private def mergeMessages(a: GenericInternalRow, b: GenericInternalRow,
      fs: Seq[ProtoField]): GenericInternalRow = {
    val out = new Array[Any](fs.length)
    var i = 0
    while (i < fs.length) {
      val f = fs(i)
      val av = a.values(i)
      val bv = b.values(i)
      out(i) =
        if (f.repeated) {
          val aa = av.asInstanceOf[GenericArrayData].array
          val ba = bv.asInstanceOf[GenericArrayData].array
          new GenericArrayData(aa ++ ba)
        } else if (f.children.nonEmpty) (av, bv) match {
          case (null, _) => bv
          case (_, null) => av
          case (ar: GenericInternalRow, br: GenericInternalRow) =>
            mergeMessages(ar, br, f.children)
        } else {
          val bIsDefault = bv match {
            case null => true
            case arr: Array[Byte] => arr.isEmpty
            case v => v == defaultOf(f)
          }
          if (bIsDefault) av else bv
        }
      i += 1
    }
    new GenericInternalRow(out)
  }

  /** Recursive message decode over bytes[start, end). Throws
    * [[ProtoDecodeExpr.Malformed]] on any wire violation. */
  private def decodeMessage(bytes: Array[Byte], start: Int, end: Int,
      fs: Seq[ProtoField]): GenericInternalRow = {
    val slotByNumber = ProtoDecodeExpr.slotCache(fs)
    val values = new Array[Any](fs.length)
    var i = 0
    while (i < fs.length) { values(i) = defaultOf(fs(i)); i += 1 }
    val buffers = new Array[scala.collection.mutable.ArrayBuffer[Any]](fs.length)
    var pos = start

    def fail(): Nothing = throw ProtoDecodeExpr.Malformed
    // length-delimited prefix, range-checked as a LONG before narrowing:
    // a declared length that is a multiple of 2^32 would wrap toInt to a
    // small non-negative value, pass an int-typed bounds check, and
    // silently misparse the remaining payload as tags instead of
    // failing to NULL
    def lenDelim(): Int = {
      val l = varint()
      if (l < 0L || l > (end - pos).toLong) fail()
      l.toInt
    }
    def varint(): Long = {
      var shift = 0
      var res = 0L
      var b = 0
      do {
        // protobuf caps varints at 10 bytes (shift 63); an overlong
        // encoding is malformed, not a mod-64 wraparound
        if (shift > 63 || pos >= end) fail()
        b = bytes(pos) & 0xFF
        pos += 1
        res |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      res
    }
    def fixed64(): Long = {
      if (end - pos < 8) fail()
      var v = 0L
      var k = 0
      while (k < 8) { v |= (bytes(pos + k) & 0xFFL) << (8 * k); k += 1 }
      pos += 8
      v
    }
    def fixed32(): Int = {
      if (end - pos < 4) fail()
      var v = 0
      var k = 0
      while (k < 4) { v |= (bytes(pos + k) & 0xFF) << (8 * k); k += 1 }
      pos += 4
      v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => fixed64(); ()
      case 2 =>
        val len = lenDelim()
        pos += len
      case 5 => fixed32(); ()
      case _ => fail() // groups (3/4) unsupported
    }
    def scalarOf(dt: DataType, wire: Int): Any = (dt, wire) match {
      case (LongType, 0)    => varint()
      case (IntegerType, 0) => varint().toInt
      case (BooleanType, 0) => varint() != 0L
      case (DoubleType, 1)  => java.lang.Double.longBitsToDouble(fixed64())
      case (LongType, 1)    => fixed64()
      case (FloatType, 5)   => java.lang.Float.intBitsToFloat(fixed32())
      case (IntegerType, 5) => fixed32()
      case _                => fail() // wire/type mismatch
    }
    def numericWireOf(dt: DataType): Int = dt match {
      case LongType | IntegerType | BooleanType => 0
      case DoubleType => 1
      case FloatType  => 5
      case _          => -1
    }
    def buf(slot: Int): scala.collection.mutable.ArrayBuffer[Any] = {
      if (buffers(slot) == null)
        buffers(slot) = scala.collection.mutable.ArrayBuffer.empty[Any]
      buffers(slot)
    }

    while (pos < end) {
      val tag = varint()
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val slot = slotByNumber.getOrElse(fieldNo, -1)
      if (slot < 0) skip(wire)
      else {
        val f = fs(slot)
        if (f.children.nonEmpty) {
          // nested message (possibly repeated): always length-delimited
          if (wire != 2) fail()
          val len = lenDelim()
          val row = decodeMessage(bytes, pos, pos + len, f.children)
          pos += len
          if (f.repeated) buf(slot) += row
          else values(slot) = values(slot) match {
            // proto3 concatenation-merge: a repeated occurrence of a
            // SINGULAR embedded message merges field-wise into the
            // previous instance (prost/protobuf semantics) — plain
            // replacement would silently revert subfields set only in
            // the earlier instance to their defaults
            case prev: GenericInternalRow =>
              mergeMessages(prev, row, f.children)
            case _ => row
          }
        } else if (f.repeated) {
          val numWire = numericWireOf(f.dataType)
          if (wire == 2 && numWire >= 0) {
            // packed numeric run: elements until the length runs out
            val len = lenDelim()
            val stop = pos + len
            while (pos < stop) buf(slot) += scalarOf(f.dataType, numWire)
            if (pos != stop) fail()
          } else if (wire == 2 || wire == numWire) {
            buf(slot) += (f.dataType match {
              case StringType if wire == 2 =>
                val len = lenDelim()
                val s = UTF8String.fromBytes(
                  java.util.Arrays.copyOfRange(bytes, pos, pos + len))
                pos += len; s
              case BinaryType if wire == 2 =>
                val len = lenDelim()
                val b = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
                pos += len; b
              case dt => scalarOf(dt, wire)
            })
          } else fail()
        } else wire match {
          case 2 =>
            val len = lenDelim()
            f.dataType match {
              case StringType => values(slot) = UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(bytes, pos, pos + len))
              case BinaryType => values(slot) =
                java.util.Arrays.copyOfRange(bytes, pos, pos + len)
              case _ => fail()
            }
            pos += len
          case w => values(slot) = scalarOf(f.dataType, w)
        }
      }
    }
    // emit: repeated slots become arrays (empty when never seen)
    i = 0
    while (i < fs.length) {
      if (fs(i).repeated)
        values(i) = new GenericArrayData(
          if (buffers(i) == null) Array.empty[Any] else buffers(i).toArray)
      i += 1
    }
    new GenericInternalRow(values)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try decodeMessage(bytes, 0, bytes.length, fields)
    catch {
      case ProtoDecodeExpr.Malformed => null // truncated/corrupt message
      // belt-and-braces: any index escape a guard misses is still a
      // malformed record, not a task failure (report-not-fail contract)
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoDecodeExpr =
    copy(child = newChild)
}

object ProtoDecodeExpr {
  /** Stackless control-flow signal for malformed wire bytes. */
  private[sources] object Malformed
      extends RuntimeException with scala.util.control.NoStackTrace

  /** field-number → slot maps, memoized per field list (the decode runs
    * per row; rebuilding the map per row per nesting level would be the
    * hot-path allocation). */
  private val slotMaps =
    new java.util.concurrent.ConcurrentHashMap[Seq[ProtoField], Map[Int, Int]]()
  private[sources] def slotCache(fs: Seq[ProtoField]): Map[Int, Int] =
    slotMaps.computeIfAbsent(fs,
      _ => fs.zipWithIndex.map { case (f, i) => f.number -> i }.toMap)
}

object ProtoDecode {
  /** proto bytes column → struct column. */
  def protoValue(value: Column, fields: Seq[ProtoField]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ProtoDecodeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(value), fields))
}
