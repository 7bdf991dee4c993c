package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Source configuration — the analog of the reference's `SourceConf`
  * (`/root/reference/arcon/src/dataflow/conf.rs:83-122`): an optional
  * event-time extractor (`ArconTime::Event` needs one; `Process` time is
  * assignment at ingest) plus a source name. Batch size / watermark
  * interval have no batch analog — in streaming they map to trigger
  * intervals on the writer.
  */
case class SourceConf[T](
    timeExtractor: Option[T => Long] = None,
    name: String = "source") {
  def withTimestampExtractor(f: T => Long): SourceConf[T] =
    copy(timeExtractor = Some(f))
}

/** A typed, possibly-unbounded stream of records — the analog of arcon's
  * `Stream<T: ArconType>` (`/root/reference/arcon/src/dataflow/stream/mod.rs:28-36`)
  * over a Spark `Dataset[T]` (bounded) or streaming `Dataset[T]`
  * (unbounded). Where arcon's combinators append nodes to a `DFG` executed
  * by an actor runtime, these append to a Catalyst logical plan that the
  * optimizer is free to rewrite — filters commute into scans, maps fuse
  * into whole-stage codegen, `keyBy` becomes hash partitioning.
  *
  * Closure-based combinators (`filter(T => Boolean)`) match the reference
  * API exactly; each also has a columnar twin (`where(Column)`) that keeps
  * the plan fully declarative — prefer the columnar form in hot paths at
  * scale since closures are opaque to predicate pushdown.
  */
class Stream[T](val ds: Dataset[T], val conf: SourceConf[T],
    val watermarked: Boolean = false) extends Serializable {

  private def spark: SparkSession = ds.sparkSession

  // ---- core transforms (SURVEY §2.2) ----

  /** T1 `filter` (arcon/src/dataflow/stream/filter.rs:14-38). */
  def filter(p: T => Boolean): Stream[T] =
    new Stream(ds.filter(p), conf, watermarked)

  /** Columnar filter — pushdown-friendly twin of [[filter]]. */
  def where(cond: org.apache.spark.sql.Column): Stream[T] =
    new Stream(ds.where(cond), conf, watermarked)

  /** T2 `map` (arcon/src/dataflow/stream/map.rs:26). May change type, so
    * the event-time extractor does not carry over (call
    * withTimestampExtractor on the result if windows follow). The
    * watermark survives: Spark keeps the `EventTimeWatermark` plan node
    * under typed transforms, so event-time timeouts stay legal. */
  def map[U: Encoder](f: T => U): Stream[U] =
    new Stream(ds.map(f), SourceConf[U](name = conf.name), watermarked)

  /** T3 `map_in_place` (arcon/src/dataflow/stream/map.rs:38) — type-
    * preserving map; in Spark there is no in-place distinction (Tungsten
    * rows are immutable), but the type-level contract is kept: the
    * timestamp extractor survives. */
  def mapInPlace(f: T => T): Stream[T] =
    new Stream(ds.map(f)(ds.encoder), conf, watermarked)

  /** T4 `flat_map` (arcon/src/dataflow/stream/map.rs:50-55). */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): Stream[U] =
    new Stream(ds.flatMap(t => f(t).iterator.toSeq),
      SourceConf[U](name = conf.name), watermarked)

  // ---- partitioning (SURVEY §2.3) ----

  /** P1 `key_by` (arcon/src/dataflow/stream/partition.rs:22-53): marks the
    * stream keyed; downstream stateful/window operators group on the key
    * (Spark hash-partitions on it — Murmur3, same family as the
    * reference's `arcon_util` MurmurHash3). */
  def keyBy[K: Encoder](f: T => K): KeyedStream[K, T] =
    new KeyedStream(this, f)

  /** P5 round-robin repartition (`ChannelKind::RoundRobin`, declared but
    * unimplemented in the reference — arcon/src/dataflow/dfg.rs:133). */
  def rebalance(n: Int): Stream[T] = new Stream(ds.repartition(n), conf, watermarked)

  /** P7 per-operator parallelism (`ParallelismStrategy::Static(n)`,
    * arcon/src/dataflow/conf.rs:23-67): hash-repartition on the given
    * columns to n partitions — the declarative Spark form of pinning one
    * operator's parallelism without touching the global shuffle conf. */
  def parallelism(n: Int, cols: org.apache.spark.sql.Column*): Stream[T] =
    new Stream(
      if (cols.isEmpty) ds.repartition(n) else ds.repartition(n, cols: _*),
      conf, watermarked)

  /** P4 broadcast hint (`ChannelKind::Broadcast`). */
  def broadcastHint: Stream[T] =
    new Stream(org.apache.spark.sql.functions.broadcast(ds), conf, watermarked)

  /** Exact dedup on the given columns (all columns when none given) —
    * the streaming face of [[graft.operators.Dedup.exact]]. On a
    * watermarked stream this uses `dropDuplicatesWithinWatermark`, so
    * dedup state is BOUNDED: a key's fingerprint expires once the
    * watermark passes it, which is what makes continuous dedup viable at
    * 100 TB/day (an unbounded exact-dedup state grows forever). A
    * streaming input WITHOUT a watermark is rejected rather than
    * silently falling back to unbounded `dropDuplicates` state — call
    * [[withWatermark]] first. Batch datasets dedup directly. */
  def dedup(cols: String*): Stream[T] = {
    if (ds.isStreaming && !watermarked)
      throw new IllegalStateException(
        "Stream.dedup on a streaming source requires a watermark " +
          "(state would grow without bound); call withWatermark(tsCol, delay) first")
    val out =
      if (ds.isStreaming)
        if (cols.isEmpty) ds.dropDuplicatesWithinWatermark()
        else ds.dropDuplicatesWithinWatermark(cols)
      else if (cols.isEmpty) ds.dropDuplicates()
      else ds.dropDuplicates(cols)
    new Stream(out, conf, watermarked)
  }

  def withTimestampExtractor(f: T => Long): Stream[T] =
    new Stream(ds, conf.withTimestampExtractor(f), watermarked)

  /** Declare the event-time watermark column + delay
    * (`withWatermark` on the underlying Dataset). This is what arms
    * event-time timers in [[KeyedStream.operator]]: the reference drives
    * `handle_timeout` from the watermark
    * (arcon/src/stream/node/mod.rs:379-395); Spark requires the watermark
    * be declared on a column before `EventTimeTimeout` is legal. The
    * `delay` is the allowed out-of-orderness (`late_arrival`). */
  def withWatermark(tsCol: String, delay: String): Stream[T] =
    new Stream(ds.withWatermark(tsCol, delay), conf, watermarked = true)

  /** Per-SIDE watermark: [[withWatermark]] composed with a
    * side-selecting predicate — the production shape for carving
    * independent logical streams (a views side and a purchases side)
    * out of one physical source before a stream-stream join, when the
    * sides' event times advance at different paces.
    *
    * The executed semantics are an optimizer interaction this method
    * turns into a documented contract (empirically pinned by the w17
    * driver oracle and the StreamingRunSpec progress-trace assertion):
    * `sidePredicate` must not reference the event-time column, so
    * Catalyst pushes it BELOW the `EventTimeWatermark` node — THIS
    * side's tracker therefore advances only on rows matching the
    * predicate, and a query joining two such sides runs under global
    * watermark = min(side trackers), exactly as two separate source
    * topics would. (Writing `.where(pred).withWatermark(...)` produces
    * the identical executed plan — the pushdown normalizes both; the
    * point of the method is that the per-side behavior is guaranteed,
    * not rediscovered.) A predicate that DOES reference the event-time
    * column would pin the filter above the watermark node and change
    * the tracker's population — rejected loudly. */
  def withPerSideWatermark(tsCol: String, delay: String,
      sidePredicate: org.apache.spark.sql.Column): Stream[T] = {
    import org.apache.spark.sql.catalyst.plans.logical.{EventTimeWatermark, Filter}
    val composed = ds.withWatermark(tsCol, delay).where(sidePredicate)
    // resolved-plan check (Column trees are lazy in Spark 4, so the
    // predicate's references are only knowable after analysis): the
    // topmost Filter is the side predicate; it must not reference the
    // watermark node's event-time attribute
    val analyzed = composed.queryExecution.analyzed
    val etAttr = analyzed.collectFirst {
      case w: EventTimeWatermark => w.eventTime }
    val refsEventTime = (for {
      et <- etAttr
      f <- analyzed.collectFirst { case f: Filter => f }
    } yield f.condition.references.exists(_.exprId == et.exprId))
      .getOrElse(false)
    require(!refsEventTime,
      s"withPerSideWatermark's side predicate must not reference the " +
        s"event-time column '$tsCol' — such a filter stays ABOVE the " +
        "watermark node and the side's tracker would see pre-filter rows")
    new Stream(composed, conf, watermarked = true)
  }

  // ---- sinks (SURVEY §2.5) ----

  /** K1 `print()` sink (ChannelKind::Console). Streaming returns the
    * query handle so callers can await/stop it. */
  def print(): Option[org.apache.spark.sql.streaming.StreamingQuery] =
    if (ds.isStreaming)
      Some(ds.writeStream.format("console").start())
    else { ds.show(20, truncate = false); None }

  /** K2 `ignore()` sink (ChannelKind::Mute) — materializes and discards. */
  def ignore(): Option[org.apache.spark.sql.streaming.StreamingQuery] =
    if (ds.isStreaming) Some(ds.writeStream.format("noop").start())
    else { ds.write.format("noop").mode("overwrite").save(); None }

  /** K3 `debug()` sink (DebugNode buffering for assertions,
    * arcon/src/stream/node/debug.rs:10-60). Batch only. */
  def debug(): Seq[T] = ds.collect().toSeq

  /** K4 `measure()` sink (arcon/src/stream/operator/sink/measure.rs):
    * batch throughput — executes the FULL plan (internal-row
    * materialization, so Catalyst cannot prune computed columns the way
    * a `count()` lets it) and returns (count, elapsedSec,
    * recordsPerSec). For streaming, attach a
    * [[graft.streaming.Measure]] listener instead — the engine's own
    * progress events are the continuous analog. */
  def measure(): (Long, Double, Double) = {
    val t0 = System.nanoTime()
    val n = ds.toDF().queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (n, sec, n / sec)
  }

  /** K5 `LocalFileSink` — line-wise text file (one toString per record). */
  def toLocalFile(path: String): Unit =
    ds.map(_.toString)(Encoders.STRING).write.mode("overwrite").text(path)

  /** K6 `KafkaSink` (arcon/src/stream/operator/sink/kafka.rs:15-94): the
    * reference JSON-serializes each element and produces it to a topic,
    * flushing on epoch — here the serialization is the declarative
    * projection [[graft.sources.KafkaSink.projection]] (unit-testable
    * without a broker) and flush/exactly-once is Spark's kafka sink +
    * checkpoint commit. */
  def toKafka(bootstrapServers: String, topic: String,
      checkpointDir: Option[String] = None): Option[org.apache.spark.sql.streaming.StreamingQuery] = {
    val frame = graft.sources.KafkaSink.projection(ds.toDF())
    if (ds.isStreaming) {
      val w = frame.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("topic", topic)
      Some(checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start())
    } else {
      frame.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("topic", topic).save()
      None
    }
  }

  /** K7 `SocketSink`-style foreach (arcon/src/stream/operator/sink/socket.rs:21-153):
    * per-element delivery through a user `ForeachWriter` (open/process/
    * close per partition-epoch) — the Spark idiom for side-channel sinks
    * like UDP/sockets. Batch datasets drive the same writer contract per
    * partition. */
  def foreachSink(writer: org.apache.spark.sql.ForeachWriter[T]): Option[org.apache.spark.sql.streaming.StreamingQuery] =
    if (ds.isStreaming) Some(ds.writeStream.foreach(writer).start())
    else {
      ds.foreachPartition { (it: Iterator[T]) =>
        // real partition id, as the streaming path provides: writers
        // legitimately use it for file naming / connection sharding,
        // and a constant 0 would make 200 concurrent partitions
        // clobber each other's outputs
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        if (writer.open(pid, 0L)) {
          try { it.foreach(writer.process); writer.close(null) }
          catch { case e: Throwable => writer.close(e); throw e }
        } else writer.close(null)
      }
      None
    }

  /** K8 Parquet export (arcon/src/table/mod.rs:295-341 analog). */
  def toParquet(path: String): Unit =
    ds.write.mode("overwrite").parquet(path)

  /** K8 Arrow IPC stream-file export (`write_arrow_file`,
    * arcon/src/table/mod.rs:334-341): one standard Arrow IPC file any
    * Arrow reader opens. For bounded state-table snapshots; parquet is
    * the at-scale path. Read back with [[Stream.fromArrowFile]]. */
  def toArrowFile(path: String): Unit =
    org.apache.spark.sql.graftbridge.ArrowBridge.writeArrowFile(ds.toDF(), path)

  def toDF: DataFrame = ds.toDF()
}

object Stream {

  /** S2 iterator/collection source
    * (arcon/src/stream/source/mod.rs:33-48). */
  def fromCollection[T: Encoder](spark: SparkSession, data: Seq[T],
      conf: SourceConf[T] = SourceConf[T]()): Stream[T] =
    new Stream(spark.createDataset(data), conf)

  /** S3 `LocalFileSource` (arcon/src/stream/source/local_file.rs:17-62):
    * line-by-line text file, parse each line, drop (don't fail on) parse
    * errors — matching the reference's report-not-fatal behavior. */
  def fromLocalFile[T: Encoder](spark: SparkSession, path: String,
      parse: String => Option[T]): Stream[T] = {
    import spark.implicits._
    new Stream(spark.read.textFile(path).flatMap(l => parse(l)), SourceConf[T]())
  }

  /** Typed parquet source. */
  def fromParquet[T: Encoder](spark: SparkSession, path: String): Stream[T] =
    new Stream(spark.read.parquet(path).as[T], SourceConf[T]())

  /** Untyped parquet source. */
  def fromParquetDF(spark: SparkSession, path: String): Stream[Row] =
    new Stream(spark.read.parquet(path), SourceConf[Row]())

  /** Arrow IPC stream-file source (`read_arrow_file`,
    * arcon/src/table/mod.rs:295-311 analog). */
  def fromArrowFile(spark: SparkSession, path: String): Stream[Row] =
    new Stream(
      org.apache.spark.sql.graftbridge.ArrowBridge.readArrowFile(spark, path),
      SourceConf[Row]())

  /** S4 Kafka source (arcon/src/stream/source/kafka.rs) — offsets,
    * partition assignment and replay are Spark's built-ins. Returns the
    * raw (key, value, topic, partition, offset, timestamp) frame; decode
    * the value column with a [[graft.sources.SourceSchemas]] decoder.
    * Requires the spark-sql-kafka connector jar on the cluster classpath
    * (deployment-provided; not bundled in this build — the decode/encode
    * projections around it are broker-lessly unit-tested instead). */
  def fromKafka(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): Stream[Row] =
    new Stream(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load(),
      SourceConf[Row](name = s"kafka:$topic"))

  /** S6 socket source (reference's is dead code; Spark's is built in). */
  def fromSocket(spark: SparkSession, host: String, port: Int): Stream[Row] =
    new Stream(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load(),
      SourceConf[Row](name = s"socket:$host:$port"))
}
