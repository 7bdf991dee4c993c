package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit tests for the byte→record source schemas
  * (`/root/reference/arcon/src/stream/source/schema.rs:4-104`: decode
  * failures are reported, not fatal) and the Kafka sink serialization
  * projection (`/root/reference/arcon/src/stream/operator/sink/kafka.rs:15-94`:
  * JSON-serialized values), both broker-less.
  */
class SourceSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  test("json decode drops undecodable records (schema.rs report-not-fail)") {
    val frames = Seq("""{"a":1,"b":"x"}""", "not json at all", """{"a":2,"b":"y"}""")
      .toDF("value")
    val out = SourceSchemas.decoded(frames, schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "x"), (2L, "y")))
  }

  test("json decode tolerates schema evolution: added/removed/rearranged fields (flight_serde.rs analog)") {
    val frames = Seq(
      """{"a":1,"b":"x","new_field":99}""", // producer added a field: ignored
      """{"b":"y","a":2}""",                // rearranged: order-independent
      """{"a":3}"""                         // producer removed b: null
    ).toDF("value")
    val out = SourceSchemas.decoded(frames, schema).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(out == Set((1L, "x"), (2L, "y"), (3L, null)))
  }

  test("csv decode parses delimited lines") {
    val out = Seq("7,hello").toDF("value")
      .select(SourceSchemas.csvValue(col("value"), schema).as("r"))
      .select(col("r.a"), col("r.b")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((7L, "hello")))
  }

  test("kafka sink projection: JSON value + stringified key (kafka.rs serde_json analog)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val keyed = KafkaSink.projection(df, Some(col("id"))).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keyed == Set(
      ("1", """{"id":1,"s":"a"}"""),
      ("2", """{"id":2,"s":"b"}""")))
    val unkeyed = KafkaSink.projection(df).collect()
    assert(unkeyed.forall(_.isNullAt(0)))
    assert(unkeyed.map(_.getString(1)).toSet ==
      Set("""{"id":1,"s":"a"}""", """{"id":2,"s":"b"}"""))
  }

  test("protobuf decode: varint/string/double/float/bool + unknown-field skip (ProtoSchema analog)") {
    val fields = Seq(
      ProtoField(1, "n", LongType), ProtoField(2, "s", StringType),
      ProtoField(3, "d", DoubleType), ProtoField(4, "f", FloatType),
      ProtoField(5, "b", BooleanType))
    def msg(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    val full = msg(
      Array[Byte](0x08, 0x96.toByte, 0x01),                       // 1: varint 150
      Array[Byte](0x12, 0x07) ++ "testing".getBytes("UTF-8"),     // 2: "testing"
      Array[Byte](0x19, 0, 0, 0, 0, 0, 0, 0xF8.toByte, 0x3F),     // 3: double 1.5
      Array[Byte](0x25, 0, 0, 0x20, 0x40),                        // 4: float 2.5
      Array[Byte](0x28, 0x01),                                    // 5: bool true
      Array[Byte](0x48, 0x07))                                    // 9: unknown, skipped
    val sparse = Array[Byte](0x08, 0x2A)                          // only field 1 = 42
    val truncated = Array[Byte](0x12, 0x7F, 0x01)                 // len overruns buffer
    val frames = Seq(full, sparse, truncated).toDF("value")
    val out = SourceSchemas.decodedProto(frames, fields).collect()
    assert(out.length == 2) // truncated dropped, report-not-fail
    val byN = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getDouble(2), r.getFloat(3), r.getBoolean(4))).toMap
    assert(byN(150L) == (("testing", 1.5, 2.5f, true)))
    assert(byN(42L) == (("", 0.0, 0.0f, false))) // proto3 defaults
  }

  test("protobuf decode: nested messages, repeated (packed+unpacked), optional struct (proto_derive Advanced/Point)") {
    // the reference's Advanced { option: Option<u64>, bytes: Vec<u8>,
    // repeated: Vec<Point> } with Point { x: i32, y: i32 }
    // (/root/reference/arcon_tests/src/proto_derive_test.rs:29-60),
    // plus a repeated int64 to exercise packed vs unpacked encodings
    // and an absent nested message (NULL struct).
    val point = Seq(ProtoField(1, "x", IntegerType), ProtoField(2, "y", IntegerType))
    val fields = Seq(
      ProtoField(1, "option", LongType),
      ProtoField(2, "bytes", BinaryType),
      ProtoField.message(3, "repeated", point, repeated = true),
      ProtoField(4, "ids", LongType, repeated = true),
      ProtoField.message(5, "loc", point))
    val full = Array[Byte](
      0x08, 0x01,                         // option = 1
      0x12, 0x02, 0xAA.toByte, 0xBB.toByte, // bytes = [AA BB]
      0x1A, 0x02, 0x10, 0x01,             // repeated += Point{x:0(absent), y:1}
      0x1A, 0x04, 0x08, 0x05, 0x10, 0x07, // repeated += Point{x:5, y:7}
      0x22, 0x03, 0x03, 0x8E.toByte, 0x02, // ids (packed) = [3, 270]
      0x2A, 0x02, 0x08, 0x09)             // loc = Point{x:9, y:0(absent)}
    val unpackedIds = Array[Byte](
      0x20, 0x03,                         // ids += 3 (unpacked)
      0x20, 0x8E.toByte, 0x02)            // ids += 270 (unpacked)
    val badNested = Array[Byte](0x1A, 0x7F, 0x10) // nested len overruns buffer
    val out = SourceSchemas.decodedProto(
      Seq(full, unpackedIds, badNested).toDF("value"), fields).collect()
    assert(out.length == 2) // malformed nested dropped, report-not-fail
    val byOpt = out.map(r => r.getLong(0) -> r).toMap
    val f = byOpt(1L)
    assert(f.getAs[Array[Byte]]("bytes").toSeq == Seq(0xAA.toByte, 0xBB.toByte))
    val pts = f.getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getInt(0), p.getInt(1)))
    assert(pts == Seq((0, 1), (5, 7)))
    assert(f.getSeq[Long](3) == Seq(3L, 270L))
    assert(f.getStruct(4).getInt(0) == 9 && f.getStruct(4).getInt(1) == 0)
    val sparse = byOpt(0L) // the unpacked-ids message: everything else absent
    assert(sparse.getSeq[Long](3) == Seq(3L, 270L)) // unpacked ≡ packed
    assert(sparse.getSeq[org.apache.spark.sql.Row](2).isEmpty) // absent repeated = []
    assert(sparse.isNullAt(4)) // absent nested message = NULL struct
    assert(sparse.getAs[Array[Byte]]("bytes").isEmpty) // proto3 default
  }

  test("proto3 concatenation-merge: a repeated singular embedded message merges field-wise, not replaces") {
    val point = Seq(ProtoField(1, "x", IntegerType), ProtoField(2, "y", IntegerType))
    val fields = Seq(ProtoField(1, "n", LongType), ProtoField.message(5, "loc", point))
    // loc occurs twice: first instance sets x=9, second sets only y=4.
    // prost/protobuf merge the instances -> Point{x:9, y:4}; naive
    // replacement would revert x to 0.
    val concatenated = Array[Byte](
      0x08, 0x01,             // n = 1
      0x2A, 0x02, 0x08, 0x09, // loc = Point{x:9}
      0x2A, 0x02, 0x10, 0x04) // loc (again) = Point{y:4}
    val out = SourceSchemas.decodedProto(Seq(concatenated).toDF("value"), fields).collect()
    assert(out.length == 1)
    val loc = out(0).getStruct(1)
    assert((loc.getInt(0), loc.getInt(1)) == ((9, 4)), loc.toString)
  }

  test("declared field length of 2^32 is malformed (no int wraparound to a small length)") {
    val fields = Seq(ProtoField(1, "n", LongType), ProtoField(2, "s", StringType))
    // field 2 declares len = 2^32 (varint 80 80 80 80 10): a 32-bit
    // narrow would wrap it to 0, decode s as "" and misparse the
    // remaining payload as a fresh tag (n = 42) - a wrong-but-well-
    // formed row. The Long-range check drops the record instead.
    val wrapped = Array[Byte](
      0x12, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10,
      0x08, 0x2A)
    val ok = Array[Byte](0x08, 0x07) // n = 7
    val out = SourceSchemas.decodedProto(Seq(wrapped, ok).toDF("value"), fields).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("overlong varint (>10 bytes) is malformed and dropped, not wrapped mod 64") {
    val fields = Seq(ProtoField(1, "n", LongType))
    // 10-byte varint: the legal maximum; decodes to -1
    val maxLegal = (Array[Byte](0x08) ++ Array.fill[Byte](9)(0xFF.toByte)) :+ 0x01.toByte
    // 11-byte varint: shift would pass 63 — malformed per the spec
    val overlong = (Array[Byte](0x08) ++ Array.fill[Byte](10)(0x80.toByte)) :+ 0x01.toByte
    val out = SourceSchemas.decodedProto(
      Seq(maxLegal, overlong).toDF("value"), fields).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(-1L))
  }

  test("near-Int.MaxValue length prefixes are malformed, not negative-index crashes") {
    // a length whose `pos + len` wraps negative must hit the overflow-safe
    // guard (`len > end - pos`), yielding NULL/dropped — not an
    // ArrayIndexOutOfBoundsException escaping the task
    val huge = Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x07) // 2^31-1
    val point = Seq(ProtoField(1, "x", IntegerType))
    val fields = Seq(
      ProtoField(1, "s", StringType),
      ProtoField.message(2, "m", point),
      ProtoField(3, "ids", LongType, repeated = true))
    val cases = Seq(
      Array[Byte](0x0A) ++ huge,            // string field, huge len
      Array[Byte](0x12) ++ huge,            // nested message, huge len
      Array[Byte](0x1A) ++ huge,            // packed repeated, huge len
      Array[Byte](0x4A) ++ huge,            // unknown field skip, huge len
      Array[Byte](0x0A, 0x01, 'a'.toByte))  // control: valid record, s = "a"
    val out = SourceSchemas.decodedProto(cases.toDF("value"), fields).collect()
    assert(out.length == 1) // the four crafted records drop; control survives
    assert(out.head.getString(0) == "a")
  }

  test("socket source streams lines from a live TCP server (S6)") {
    val server = new java.net.ServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintStream(sock.getOutputStream)
        out.println("hello")
        out.println("world")
        out.flush()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val stream = graft.api.Stream.fromSocket(spark, "localhost", server.getLocalPort)
    val q = stream.ds.writeStream.format("memory").queryName("sock_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def n() = spark.sql("SELECT * FROM sock_out").count()
      while (n() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = spark.sql("SELECT value FROM sock_out").collect()
        .map(_.getString(0)).toSet
      assert(rows == Set("hello", "world"))
    } finally { q.stop(); server.close() }
  }

  test("foreachSink drives the writer contract on bounded data (socket.rs analog)") {
    import graft.api.{SourceConf, Stream}
    SinkProbe.reset()
    val ds = spark.createDataset(Seq(1L, 2L, 3L))
    new Stream(ds, SourceConf[Long]()).foreachSink(
      new org.apache.spark.sql.ForeachWriter[Long] {
        def open(partitionId: Long, epochId: Long): Boolean = true
        def process(value: Long): Unit = SinkProbe.add(value)
        def close(errorOrNull: Throwable): Unit = ()
      })
    assert(SinkProbe.sum() == 6L)
  }
}

/** JVM-wide probe for foreach-writer assertions (local-mode executors
  * share the JVM). */
object SinkProbe {
  private val total = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = total.set(0)
  def add(v: Long): Unit = total.addAndGet(v)
  def sum(): Long = total.get()
}
