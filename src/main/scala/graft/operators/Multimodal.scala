package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media ride
  * along as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as BATCHED partition-local
  * operators so a real codec (libjpeg/ffmpeg/...) amortizes per-batch
  * setup. The codec itself is a pluggable [[MediaDecoder]] — this
  * container has no image/audio libraries, so [[MediaDecoder.stub]] is a
  * clearly-marked deterministic fake; the Spark-side contract (schema,
  * partition-preserving batch shape, generator-based frame explode) is
  * real and oracle-tested.
  *
  * Scale notes: decode is a narrow `mapPartitions` (no shuffle, codec
  * initialized once per partition); frame sampling is a generator
  * (`posexplode` of a bounded `sequence`) — pipelined, no shuffle, the
  * explode factor bounded by `maxFrames`.
  */
object Multimodal {

  /** Decoded media metadata (the typed half of the binary+metadata
    * column pair). */
  case class MediaMeta(nBytes: Long, width: Int, height: Int, nFrames: Int)

  /** Pluggable batch codec: one instance per partition, `decode` per
    * record. Real deployments back this with an image/video library. */
  trait MediaDecoder extends Serializable {
    /** Called once per partition before decoding (codec init). */
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): MediaMeta
  }

  object MediaDecoder {
    /** STUB codec (no media libs in this container): deterministic
      * header math standing in for a real decode — width/height/frames
      * derived from the byte length, so every engine (and the DuckDB
      * oracle) agrees on the result. Swap for a real codec in
      * production. */
    val stub: MediaDecoder = new MediaDecoder {
      def decode(bytes: Array[Byte]): MediaMeta =
        MediaMeta(bytes.length.toLong, bytes.length % 64,
          bytes.length / 64, bytes.length % 7 + 1)
    }
  }

  /** Batched decode: (id, media) → (id, n_bytes, width, height,
    * n_frames). Partition-local, codec opened once per partition.
    * Null media (a failed fetch) drops before the codec — a real
    * decoder would NPE on the first bad row and abort the job. */
  def decodeMeta(df: DataFrame, idCol: String, mediaCol: String,
      decoder: MediaDecoder = MediaDecoder.stub): DataFrame = {
    val typed = df.filter(col(mediaCol).isNotNull)
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    typed.mapPartitions { it =>
      decoder.open()
      it.map { case (id, bytes) =>
        val m = decoder.decode(bytes)
        (id, m.nBytes, m.width, m.height, m.nFrames)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt))
      .toDF(idCol, "n_bytes", "width", "height", "n_frames")
  }

  /** [[decodeMeta]] RETAINING the media bytes alongside the decoded
    * metadata — the shape a frame-extraction consumer needs: the bytes
    * must reach the frame step anyway, and carrying them through the
    * decode (one narrow partition-local pass) instead of re-joining
    * metadata back to media on the id key saves an id-keyed exchange of
    * the binary column — at scale, a shuffle of the raw media corpus
    * (caught by PlanAuditSpec's no-binary-on-exchange audit). */
  def decodeMetaWithMedia(df: DataFrame, idCol: String, mediaCol: String,
      decoder: MediaDecoder = MediaDecoder.stub): DataFrame = {
    val typed = df.filter(col(mediaCol).isNotNull)
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    typed.mapPartitions { it =>
      decoder.open()
      it.map { case (id, bytes) =>
        val m = decoder.decode(bytes)
        DecodedMedia(id, bytes, m.nBytes, m.width, m.height, m.nFrames)
      }
    }(Encoders.product[DecodedMedia])
      .toDF(idCol, mediaCol, "n_bytes", "width", "height", "n_frames")
  }

  /** Row shape of [[decodeMetaWithMedia]] (Encoders.tuple caps at 5).
    * Qualified-private, NOT `private`: a plain-private case class
    * compiles to JVM-private accessors, which Janino-generated encoder
    * code cannot call — Spark then silently falls back to an
    * INTERPRETED projection for every decoded row ("Expr codegen error
    * and falling back to interpreter mode" in the r18 verify log).
    * `private[operators]` is public in bytecode, Scala-hidden. */
  private[operators] case class DecodedMedia(id: Long, media: Array[Byte],
      nBytes: Long, width: Int, height: Int, nFrames: Int)

  /** STUB per-frame content extraction (the [[MediaDecoder.stub]]
    * convention): frame k's bytes = the media bytes with the first k
    * dropped — deterministic, length-varying per frame, and exactly
    * replayable by the DuckDB oracle as a hex-string suffix. A real
    * codec extracts the decoded k-th frame here; everything downstream
    * (per-frame signatures, aligned-frame banding, the pair rollup) is
    * contract-identical when one is swapped in. */
  def stubFrameBytes(mediaCol: org.apache.spark.sql.Column,
      frameNoCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mediaCol.substr(frameNoCol + 1, lit(Int.MaxValue))

  /** REAL image decode — javax.imageio, the one codec this container
    * does ship (it is the JDK's): media bytes → decoded image →
    * (width, height, row-major 8-bit grayscale grid). This is the
    * decoder front the aHash contract documents ("production swaps a
    * real decoder's grayscale grid in front of the hash and nothing
    * else changes" — [[graft.operators.Dedup.perceptualHashDup]]):
    * `aHash61(grid)` downstream is average-hash over REAL decoded
    * pixels, not byte pooling. Non-gray inputs are luma-converted
    * through an offscreen TYPE_BYTE_GRAY draw (headless-safe);
    * grayscale PNG round-trips bit-exactly (lossless format, no color
    * conversion), which is what lets a codec-less oracle replay the
    * hash from a known pixel pattern. Partition-local `mapPartitions`,
    * the [[decodeMeta]] batch shape; an undecodable blob fails loudly
    * naming the id — a silent skip would desynchronize any
    * count-carrying oracle. */
  def decodeLumaGrid(df: DataFrame, idCol: String,
      mediaCol: String): DataFrame = {
    val typed = df.filter(col(mediaCol).isNotNull)
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    typed.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, grid) = decodeOneLuma(id, bytes, 0, bytes.length)
        (id, w, h, grid)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, "width", "height", "grid")
  }

  /** One real ImageIO decode of `bytes[off, off+len)` to a row-major
    * 8-bit luma grid — the executor-side core of [[decodeLumaGrid]]
    * (whole-blob media) and [[decodeFrames]] (one container frame).
    * ImageIO's InputStream overload defaults to a DISK-backed stream
    * cache (a temp FileCacheImageInputStream per read) — for in-memory
    * byte sources that is pure I/O overhead and made decode throughput
    * track the host's page-cache state (observed: 0.7 s isolated vs
    * 1.1–3.3 s mid-sweep for the same 5000 decodes). Wrapping the bytes
    * in a per-call MemoryCacheImageInputStream picks the memory cache
    * for THIS read only — unlike ImageIO.setUseCache(false), which
    * flips a process-global flag every other ImageIO user in the
    * executor JVM would silently inherit. Non-gray inputs luma-convert
    * through an offscreen TYPE_BYTE_GRAY draw (headless-safe);
    * undecodable bytes fail loudly naming the id. */
  private def decodeOneLuma(id: Long, bytes: Array[Byte], off: Int,
      len: Int): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes, off, len)))
    require(img != null, s"undecodable media for id $id")
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new java.awt.image.BufferedImage(img.getWidth,
          img.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gfx = g.createGraphics()
        gfx.drawImage(img, 0, 0, null)
        gfx.dispose()
        g
      }
    val w = gray.getWidth
    val h = gray.getHeight
    val raster = gray.getRaster
    val grid = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        grid(y * w + x) = raster.getSample(x, y, 0).toByte
        x += 1
      }
      y += 1
    }
    (w, h, grid)
  }

  /** REAL multi-frame decode — the video-shaped path on a real codec:
    * `mediaCol` holds a LENGTH-PREFIXED FRAME CONTAINER (per frame, a
    * 4-byte big-endian length then one complete encoded image). The
    * container framing is the deterministic stand-in for a video
    * container this environment ships no codec for, but everything
    * inside it is real: each frame decodes through javax.imageio
    * ([[decodeOneLuma]]), so the batch shape, per-frame luma grids and
    * the aligned-frame banding downstream (pl14) all exercise
    * production plumbing — a real demuxer swaps in at the offset-parse
    * line and nothing else changes. One output row per
    * (id, frame_no, width, height, grid); a truncated or overrunning
    * frame header fails loudly naming the id and frame — a silent
    * partial parse would desynchronize any count-carrying oracle.
    * Partition-local flatMap: no shuffle, media bytes never leave the
    * scan-side task. */
  def decodeFrames(df: DataFrame, idCol: String,
      mediaCol: String): DataFrame = {
    val typed = df.filter(col(mediaCol).isNotNull)
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong,
        Encoders.BINARY))
    typed.flatMap { case (id, bytes) =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, Int, Int, Array[Byte])]
      var off = 0
      var f = 0
      while (off < bytes.length) {
        require(off + 4 <= bytes.length,
          s"truncated frame header for id $id at frame $f (offset $off)")
        val len = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
          ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        // Bound check in Long: a corrupt header with len near
        // Int.MaxValue must fail HERE naming the demux, not overflow
        // negative and reach the decoder with garbage bounds.
        require(len > 0 && off.toLong + 4L + len.toLong <= bytes.length,
          s"frame $f of id $id overruns the container " +
            s"(len $len at offset $off of ${bytes.length})")
        val (w, h, grid) = decodeOneLuma(id, bytes, off + 4, len)
        out += ((id, f, w, h, grid))
        off += 4 + len
        f += 1
      }
      out
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, "frame_no", "width", "height", "grid")
  }

  /** Multi-frame decode for a SECOND real container format — any
    * multi-image container the javax.imageio reader stack recognizes
    * and demuxes ITSELF (`getImageReaders` → `getNumImages` /
    * `read(f)`): multipage TIFF (the JDK ships a TIFF plugin since 9;
    * 8-bit gray pages round-trip bit-exactly) and gray-palette GIF.
    * [[decodeFrames]]'s claim that "a real demuxer swaps in at the
    * demux line and nothing else changes" becomes a receipt here, not
    * prose — the output shape, downstream resize/hash/banding, and
    * the oracle are all identical (mm8's oracle IS mm7's verbatim).
    * Exactness contract: gray rasters read directly; palette-coded
    * frames read their sample's palette entry (exact under any
    * palette PERMUTATION) — never an sRGB→gray draw, which is
    * gamma-curved, not identity. Non-gray palettes and other frame
    * types fail loudly naming id+frame. (The JDK's GIF WRITER was
    * probed and DROPS PIXELS — single frames and animation alike — so
    * the corpus side writes TIFF; the reader path handles both
    * palette-coded and gray-raster frames regardless of container.)
    * Partition-local flatMap, media bytes never leave the scan task
    * (the [[decodeFrames]] discipline). */
  def decodeFramesImageIO(df: DataFrame, idCol: String,
      mediaCol: String): DataFrame = {
    val typed = df.filter(col(mediaCol).isNotNull)
      .select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong,
        Encoders.BINARY))
    typed.flatMap { case (id, bytes) =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"no ImageIO reader recognizes the container of id $id")
      val reader = readers.next()
      reader.setInput(iis, false, false)
      try {
        val n = reader.getNumImages(true)
        require(n > 0, s"container of id $id holds no frames")
        (0 until n).map { f =>
          val img = reader.read(f)
          val (w, h, grid) = paletteLumaGrid(id, f, img)
          (id, f, w, h, grid)
        }
      } finally {
        // dispose() does NOT close the input stream (unlike the
        // ImageIO.read convenience path) — close it or every row
        // leaves a memory-cache stream to GC
        reader.dispose()
        iis.close()
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, "frame_no", "width", "height", "grid")
  }

  /** Exact luma of one palette-coded frame: sample → gray palette
    * entry. Requires r==g==b for every live entry (exactness under any
    * palette ORDER, but not under color quantization); direct
    * TYPE_BYTE_GRAY frames read their raster as in the PNG path. */
  private def paletteLumaGrid(id: Long, f: Int,
      img: java.awt.image.BufferedImage): (Int, Int, Array[Byte]) = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Byte](w * h)
    val raster = img.getRaster
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val size = icm.getMapSize
        val reds = new Array[Byte](size)
        val greens = new Array[Byte](size)
        val blues = new Array[Byte](size)
        icm.getReds(reds); icm.getGreens(greens); icm.getBlues(blues)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = raster.getSample(x, y, 0)
            require(reds(s) == greens(s) && greens(s) == blues(s),
              s"non-gray palette entry $s in frame $f of id $id — " +
                "the exact-luma contract needs a gray palette")
            grid(y * w + x) = reds(s)
            x += 1
          }
          y += 1
        }
      case _ if img.getType ==
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY =>
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            grid(y * w + x) = raster.getSample(x, y, 0).toByte
            x += 1
          }
          y += 1
        }
      case cm =>
        sys.error(s"frame $f of id $id decodes to ${cm.getClass.getName}" +
          " — not a gray palette or gray raster; exact luma undefined")
    }
    (w, h, grid)
  }

  /** Frame sampling: one output row per sampled frame index
    * (0, stride, 2*stride, ... < n_frames, capped at maxFrames rows) —
    * the video-to-training-examples explode, as a generator. */
  def sampleFrames(meta: DataFrame, idCol: String, stride: Int,
      maxFrames: Int = 1000, keepCols: Seq[String] = Nil): DataFrame = {
    require(stride > 0, "stride must be positive")
    val lastFrame = col("n_frames") - 1
    val upper = lastFrame - pmod(lastFrame, lit(stride)) // floor to stride grid
    // zero-frame media (a corrupt/empty file from a real codec) emits
    // zero rows instead of crashing: lastFrame = -1 makes the sequence
    // bounds inverted and Spark throws on start > stop with a positive
    // step. posexplode_outer + null-filter, not a bare posexplode, for
    // the InferFiltersFromGenerate reason documented on
    // [[Chunker.fixedWindows]].
    val frames = when(col("n_frames") > 0,
      sequence(lit(0),
        least(upper, lit((maxFrames - 1) * stride)), lit(stride)))
      .otherwise(array().cast("array<int>"))
    // keepCols ride the generator projection (e.g. the media bytes for
    // a downstream frame-content step) — pipelined, never re-joined
    meta.select(Seq(col(idCol), col("n_frames")) ++ keepCols.map(col) :+
        posexplode_outer(frames): _*)
      .filter(col("col").isNotNull)
      .withColumnRenamed("pos", "sample_no")
      .withColumnRenamed("col", "frame_no")
  }

  /** Nearest-neighbor RESIZE of decoded luma grids to a fixed
    * targetW × targetH — the canonical perceptual-hash front (resize to
    * a small fixed grid, then average-hash) and the normalization step
    * every image training pipeline runs before batching. Pure pixel
    * INDEXING, no interpolation arithmetic: resized(y', x') =
    * grid(⌊y'·h/targetH⌋·w + ⌊x'·w/targetW⌋), so bytes are copied
    * verbatim and the output is bit-reproducible on any engine —
    * integer source indices are exactly replayable by the oracle's
    * pattern arithmetic. Up- and down-sampling both land on this one
    * formula (sf docs are 4–8 px a side; the 8×8 target exercises
    * both).
    *
    * Input is [[decodeLumaGrid]]'s shape (id, width, height, grid);
    * output replaces (width, height, grid) with the resized triple.
    * Narrow typed map, no shuffle, output size fixed at
    * targetW·targetH bytes per row regardless of source resolution —
    * the property that makes downstream banding/batching volume
    * independent of the corpus's native image sizes at 100 TB. */
  def resizeNearest(decoded: DataFrame, idCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "resize target must be positive")
    import org.apache.spark.sql.Dataset
    val typed: Dataset[(Long, Int, Int, Array[Byte])] =
      decoded.select(col(idCol).cast("long"), col("width"),
        col("height"), col("grid"))
        .as[(Long, Int, Int, Array[Byte])](Encoders.tuple(
          Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt,
          Encoders.BINARY))
    typed.map { case (id, w, h, grid) =>
      (id, targetW, targetH, resizeOne(id, w, h, grid, targetW, targetH))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, "width", "height", "grid")
  }

  /** The one nearest-neighbor index-map kernel behind [[resizeNearest]]
    * (whole-image media) and [[resizeNearestFrames]] (per container
    * frame): resized(y', x') = grid(⌊y'·h/tH⌋·w + ⌊x'·w/tW⌋). */
  private def resizeOne(id: Long, w: Int, h: Int, grid: Array[Byte],
      targetW: Int, targetH: Int): Array[Byte] = {
    require(w > 0 && h > 0 && grid.length == w * h,
      s"malformed grid for id $id: ${grid.length} bytes for ${w}x$h")
    val out = new Array[Byte](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = y * h / targetH
      var x = 0
      while (x < targetW) {
        out(y * targetW + x) = grid(sy * w + x * w / targetW)
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[resizeNearest]] at FRAME granularity — input is
    * [[decodeFrames]]'s shape (id, frame_no, width, height, grid) and
    * the frame key rides the narrow map, so a multi-frame pipeline can
    * normalize every frame to the canonical hash grid before aligned-
    * frame banding (pl14). Same kernel, same bit-reproducibility, same
    * fixed per-row output volume. */
  def resizeNearestFrames(decoded: DataFrame, idCol: String,
      frameNoCol: String, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "resize target must be positive")
    val typed = decoded.select(col(idCol).cast("long"),
        col(frameNoCol).cast("int"), col("width"), col("height"),
        col("grid"))
      .as[(Long, Int, Int, Int, Array[Byte])](Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt,
        Encoders.scalaInt, Encoders.BINARY))
    typed.map { case (id, f, w, h, grid) =>
      (id, f, targetW, targetH, resizeOne(id, w, h, grid, targetW, targetH))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.scalaInt, Encoders.BINARY))
      .toDF(idCol, frameNoCol, "width", "height", "grid")
  }

  /** Per-image PIXEL MOMENTS of decoded luma grids — (n_pixels, sum,
    * sum of squares) as exact Longs, the narrow per-row reduction
    * behind corpus normalization statistics (the per-source pixel
    * mean/std every image training pipeline publishes on its dataset
    * card and bakes into its input-normalization transform). Folding
    * pixels HERE, before any shuffle, is the at-scale point: the
    * downstream per-source aggregate exchanges three Longs per image,
    * never a pixel — and the moments are integers, so the corpus stats
    * are bit-exact cross-engine (the x19 integer-quantization
    * discipline; a double mean folded in shuffle order would only
    * match to FP tolerance). Input is [[decodeLumaGrid]]'s shape;
    * unsigned 8-bit pixels (the `& 0xff` mirrors the raster's sample
    * range). */
  def pixelMoments(decoded: DataFrame, idCol: String): DataFrame = {
    val typed = decoded.select(col(idCol).cast("long"), col("grid"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong,
        Encoders.BINARY))
    typed.map { case (id, grid) =>
      var sum = 0L
      var sumSq = 0L
      var i = 0
      while (i < grid.length) {
        val v = (grid(i) & 0xff).toLong
        sum += v
        sumSq += v * v
        i += 1
      }
      (id, grid.length.toLong, sum, sumSq)
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "n_pixels", "sum_px", "sum_sq_px")
  }
}
