package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Edge cases the mm-series oracles can't reach: the stub codec never
  * returns zero frames and the oracle corpus has no null media. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("sampleFrames: zero-frame media emits zero rows instead of crashing on inverted sequence bounds") {
    val meta = Seq((1L, 0), (2L, 5), (3L, 1))
      .toDF("doc_id", "n_frames")
    val out = Multimodal.sampleFrames(meta, "doc_id", stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(!out.map(_._1).contains(1L), "zero-frame doc must emit no rows")
    assert(out.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 2, 4))
    assert(out.filter(_._1 == 3L).map(_._2).toSeq == Seq(0))
  }

  test("decodeMeta: null media drops before the codec instead of NPE-ing the partition") {
    val df = Seq(
      (1L, Option("abc".getBytes("UTF-8"))),
      (2L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeMeta(df, "doc_id", "media")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("resizeNearest: identity at same size, constant-fill upsample, known-corner downsample") {
    def grid(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h)(i => f(i % w, i / w).toByte)
    val rows = Seq(
      // 1: already 2x2 — resize to 2x2 must be the identity copy
      (1L, 2, 2, grid(2, 2)((x, y) => 10 * y + x)),
      // 2: 1x1 upsampled to 2x2 — every target pixel reads source (0,0)
      (2L, 1, 1, grid(1, 1)((_, _) => 99)),
      // 3: 4x4 downsampled to 2x2 — targets read sources (0,0)(2,0)(0,2)(2,2)
      (3L, 4, 4, grid(4, 4)((x, y) => 16 * y + x)))
      .toDF("doc_id", "width", "height", "grid")
    val out = Multimodal.resizeNearest(rows, "doc_id", 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]]("grid").toSeq)).toMap
    assert(out(1L) == (2, 2, Seq[Byte](0, 1, 10, 11)))
    assert(out(2L) == (2, 2, Seq[Byte](99, 99, 99, 99)))
    assert(out(3L) == (2, 2, Seq[Byte](0, 2, 32, 34)))
  }

  test("decodeFrames: demuxes length-prefixed PNG frames through the real codec; truncation and overrun fail loud with id and frame") {
    def png(w: Int, h: Int, v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, (v + x + y) % 256)))
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }
    def frame(b: Array[Byte]): Array[Byte] = {
      val n = b.length
      Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte,
        n.toByte) ++ b
    }
    val container = frame(png(2, 2, 10)) ++ frame(png(3, 2, 100))
    val out = Multimodal.decodeFrames(
        Seq((5L, container)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getAs[Array[Byte]]("grid").toSeq)).sortBy(_._1)
    assert(out.length == 2)
    // frame 0: 2x2 of (10 + x + y) — row-major 10,11,11,12
    assert(out(0) == ((0, 2, 2, Seq[Byte](10, 11, 11, 12))))
    // frame 1: 3x2 of (100 + x + y)
    assert(out(1) == ((1, 3, 2, Seq[Byte](100, 101, 102, 101, 102, 103))))
    // a frame length overrunning the container names id and frame
    val bad = container.take(container.length - 3)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFrames(
        Seq((7L, bad)).toDF("doc_id", "media"), "doc_id", "media").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("7") && msg.contains("frame 1"), msg.take(400))
  }

  test("decodeFramesImageIO: multipage TIFF and gray-palette GIF demux through the JDK's own readers; non-gray palettes fail loud") {
    // multipage TIFF of two gray frames — the mm8 corpus shape
    def tiff(frames: Seq[(Int, Int, Int)]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      try {
        w.setOutput(ios); w.prepareWriteSequence(null)
        frames.foreach { case (fw, fh, v) =>
          val img = new java.awt.image.BufferedImage(fw, fh,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          (0 until fh).foreach(y => (0 until fw).foreach(x =>
            img.getRaster.setSample(x, y, 0, (v + x + y) % 256)))
          w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        w.endWriteSequence()
      } finally { w.dispose(); ios.close() }
      bos.toByteArray
    }
    val out = Multimodal.decodeFramesImageIO(
        Seq((5L, tiff(Seq((2, 2, 10), (3, 2, 100)))))
          .toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getAs[Array[Byte]]("grid").toSeq)).sortBy(_._1)
    assert(out.length == 2)
    assert(out(0) == ((0, 2, 2, Seq[Byte](10, 11, 11, 12))))
    assert(out(1) == ((1, 3, 2, Seq[Byte](100, 101, 102, 101, 102, 103))))
    // a PALETTE-coded frame (palette PNG — the JDK GIF writer was
    // probed to DROP PIXELS even on single frames, so PNG carries the
    // IndexColorModel coverage) reads EXACT luma through the palette
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    def pal1(fw: Int, fh: Int, v: Int,
        model: java.awt.image.IndexColorModel): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(fw, fh,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, model)
      (0 until fh).foreach(y => (0 until fw).foreach(x =>
        img.getRaster.setSample(x, y, 0, (v + x + y) % 256)))
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }
    val gout = Multimodal.decodeFramesImageIO(
        Seq((6L, pal1(2, 2, 40, cm))).toDF("doc_id", "media"),
        "doc_id", "media")
      .collect().map(r => r.getAs[Array[Byte]]("grid").toSeq).toSeq
    assert(gout == Seq(Seq[Byte](40, 41, 41, 42)))
    // a COLOR palette breaks the exact-luma contract: loud, names both
    val colors = Array.tabulate(256)(i => ((i * 37) % 256).toByte)
    val colorCm = new java.awt.image.IndexColorModel(8, 256, ramp, colors, ramp)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFramesImageIO(
        Seq((9L, pal1(2, 2, 40, colorCm))).toDF("doc_id", "media"),
        "doc_id", "media").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("9") && msg.contains("non-gray palette"), msg.take(400))
  }

  test("resizeNearestFrames: the frame key rides the resize; kernel matches resizeNearest") {
    val rows = Seq(
      (1L, 0, 1, 1, Array[Byte](42)),
      (1L, 1, 2, 2, Array.tabulate(4)(i => (10 * i).toByte)))
      .toDF("doc_id", "frame_no", "width", "height", "grid")
    val out = Multimodal.resizeNearestFrames(rows, "doc_id", "frame_no", 2, 2)
      .collect().map(r => (r.getInt(1),
        r.getAs[Array[Byte]]("grid").toSeq)).sortBy(_._1)
    assert(out(0) == ((0, Seq[Byte](42, 42, 42, 42))))
    assert(out(1) == ((1, Seq[Byte](0, 10, 20, 30))))
  }

  test("pixelMoments: exact Long moments, unsigned byte range, empty grid yields zeros") {
    val rows = Seq(
      // bytes 1, 2, 3 → n 3, Σ 6, Σ² 14
      (1L, 3, 1, Array[Byte](1, 2, 3)),
      // byte -1 is unsigned 255 — signed folding would give Σ -1
      (2L, 1, 1, Array[Byte](-1)),
      (3L, 0, 0, Array.empty[Byte]))
      .toDF("doc_id", "width", "height", "grid")
    val out = Multimodal.pixelMoments(rows, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 6L, 14L)))
    assert(out(2L) == ((1L, 255L, 65025L)))
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("resizeNearest: a malformed grid fails loud with the offending id, not a silent out-of-bounds read") {
    val bad = Seq((7L, 3, 3, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "width", "height", "grid")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizeNearest(bad, "doc_id", 2, 2).collect()
    }
    assert(e.getMessage.contains("7") || Option(e.getCause)
      .exists(_.getMessage.contains("7")), e.getMessage.take(400))
  }
}
