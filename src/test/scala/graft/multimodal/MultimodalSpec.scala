package graft.multimodal

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf("sf0.001"))).cache()

  test("media table carries binary payloads with typed metadata") {
    val r = media.head()
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("n_bytes") ==
      r.getAs[Array[Byte]]("content").length.toLong)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("real PNG bytes decode to true dimensions, format, and histogram") {
    import spark.implicits._
    // paint a 31×17 PNG: left half black, right half white
    val img = new java.awt.image.BufferedImage(31, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 31)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val media = Seq((1L, "image", png), (2L, "image", "not an image".getBytes))
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()

    val real = rows(0)
    assert(real.getInt(2) == 31 && real.getInt(3) == 17) // true dims
    assert(real.getString(4) == "png" && real.getInt(5) == 0)
    val hist = real.getSeq[Float](6)
    // 16 of 31 columns black (bin 0), 15 white (bin 7), nothing between
    assert(math.abs(hist.head - 16f / 31f) < 1e-6)
    assert(math.abs(hist.last - 15f / 31f) < 1e-6)
    assert(hist.slice(1, 7).forall(_ == 0f))
    assert(math.abs(hist.sum - 1f) < 1e-5)

    // undecodable image payloads fall back to the deterministic fake
    val fake = rows(1)
    assert(fake.getInt(2) >= 64 && fake.getString(4) == "png")
  }

  test("real PCM WAV bytes decode to true rate, channels, duration, histogram") {
    import spark.implicits._
    // hand-assemble a 1-second 8 kHz mono 16-bit PCM WAV: 8000 samples,
    // first half silence (bin 0), second half a loud constant (bin 7)
    val rate = 8000
    val nSamples = 8000
    val byteRate = rate * 2 // mono, 16-bit
    val dataSize = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(byteRate)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    for (i <- 0 until nSamples)
      bb.putShort(if (i < nSamples / 2) 0 else 30000)
    val wav = bb.array()

    val media = Seq((1L, "audio", wav), (2L, "audio", "not audio".getBytes))
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()

    val real = rows(0)
    assert(real.getInt(2) == rate, "width carries the sample rate")
    assert(real.getInt(3) == 1, "height carries the channel count")
    assert(real.getString(4) == "wav")
    assert(real.getInt(5) == 1000, "1 s of data at the byte rate")
    val hist = real.getSeq[Float](6)
    assert(math.abs(hist.head - 0.5f) < 1e-6) // silent half
    assert(math.abs(hist.last - 0.5f) < 1e-6) // loud half (30000/4096 ≥ 7)
    assert(hist.slice(1, 7).forall(_ == 0f))

    // non-WAV audio payloads fall back to the deterministic fake
    val fake = rows(1)
    assert(fake.getString(4) == "wav" && fake.getInt(5) >= 1000)
  }

  test("real animated GIF decodes to true dims, frame-delay duration, histogram") {
    import spark.implicits._
    import javax.imageio.metadata.IIOMetadataNode
    // write a 3-frame 31×17 GIF, 25 cs (=250 ms) per frame, with the
    // JDK's own GIF writer; frame 1 is left-half black / right white
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (_ <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(31, 17,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 17; x <- 0 until 31)
        img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
      val md = writer.getDefaultImageMetadata(
        javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img),
        writer.getDefaultWriteParam)
      val fmt = md.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val existing = root.getElementsByTagName("GraphicControlExtension")
      val gce =
        if (existing.getLength > 0) existing.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode("GraphicControlExtension"); root.appendChild(n); n }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "25")
      gce.setAttribute("transparentColorIndex", "0")
      md.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
    }
    writer.endWriteSequence()
    ios.close()
    val gif = bos.toByteArray

    val media = Seq((1L, "video", gif), (2L, "video", "not a video".getBytes))
      .toDF("media_id", "kind", "content")
    val decoded = Multimodal.decode(media)
    val rows = decoded.orderBy("media_id").collect()

    val real = rows(0)
    assert(real.getInt(2) == 31 && real.getInt(3) == 17) // true dims
    assert(real.getString(4) == "gif")
    assert(real.getInt(5) == 750, "3 frames × 25 cs = 750 ms")
    val hist = real.getSeq[Float](6)
    assert(math.abs(hist.head - 16f / 31f) < 1e-6)
    assert(math.abs(hist.last - 15f / 31f) < 1e-6)
    assert(math.abs(hist.sum - 1f) < 1e-5)

    // non-GIF video payloads fall back to the deterministic fake
    val fake = rows(1)
    assert(fake.getString(4) == "mp4" && fake.getInt(5) >= 1000)

    // frame sampling over the real duration: 750 ms at 250 ms spacing
    // → frame indices 0..3 (sequence is end-inclusive)
    val frames = Multimodal.sampleFrames(decoded, everyMs = 250)
      .filter(col("media_id") === 1L)
    assert(frames.count() == 4)
    assert(frames.agg(max("frame_ms")).head().getInt(0) == 750)
  }

  test("real MJPEG-in-AVI bytes decode to true dims, frame-count duration, histogram") {
    import spark.implicits._
    val avi = Multimodal.syntheticAviMjpeg(nFrames = 3, w = 33, h = 21,
      usPerFrame = 200000)
    // valid RIFF/AVI magic but truncated before any movi frame chunk
    val truncated = java.util.Arrays.copyOf(avi, 40)
    val media = Seq((1L, "video", avi), (2L, "video", truncated))
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()

    val real = rows(0)
    assert(real.getInt(2) == 33 && real.getInt(3) == 21) // true dims
    assert(real.getString(4) == "avi")
    assert(real.getInt(5) == 600, "3 movi frames × 200 ms from avih")
    val hist = real.getSeq[Float](6)
    // half black / half white card: mass concentrates in the end bins
    // (JPEG ringing bleeds a little into the neighbors, so no exact
    // 16/33 + 17/33 like the lossless PNG test)
    assert(hist.head > 0.4f && hist.last > 0.4f, hist)
    assert(math.abs(hist.sum - 1f) < 1e-5)

    // a frameless AVI shell falls back to the deterministic fake
    val fake = rows(1)
    assert(fake.getString(4) == "mp4")

    // the q66 media fixture carries the clip: the real decoder runs
    // inside the oracled pipeline, not just in this unit test
    val fx = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf("sf0.001")))
    val clip = Multimodal.decode(fx.filter(col("media_id") === -1L)).head()
    assert(clip.getString(4) == "avi" && clip.getInt(5) == 600)
  }

  test("uncompressed-DIB and RLE8 AVI decode to EXACT dims and histogram") {
    import spark.implicits._
    val dib = Multimodal.syntheticAviDib(rle8 = false, nFrames = 2,
      w = 4, h = 2, usPerFrame = 100000)
    val rle = Multimodal.syntheticAviDib(rle8 = true, nFrames = 2,
      w = 4, h = 2, usPerFrame = 100000)
    val media = Seq((1L, "video", dib), (2L, "video", rle))
      .toDF("media_id", "kind", "content")
    val rows = Multimodal.decode(media).orderBy("media_id").collect()
    for (r <- rows) {
      assert(r.getInt(2) == 4 && r.getInt(3) == 2, r)
      assert(r.getString(4) == "avi", r)
      assert(r.getInt(5) == 200, "2 movi frames × 100 ms from avih")
      // no JPEG ringing: exactly half the pixels in bin 0, half in 7
      val hist = r.getSeq[Float](6)
      assert(hist.head == 0.5f && hist.last == 0.5f, hist)
      assert(hist.slice(1, 7).forall(_ == 0f), hist)
    }
    // both codec clips ride the q66 media fixture end-to-end
    val fx = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf("sf0.001")))
    val decoded = Multimodal.decode(
      fx.filter(col("media_id").isin(-2L, -3L))).collect()
    assert(decoded.length == 2 &&
      decoded.forall(r => r.getString(4) == "avi" && r.getInt(5) == 200),
      decoded.mkString(";"))
  }

  test("RLE8 temporal-delta inter-frames decode against the carried canvas") {
    import spark.implicits._
    // frame 1 (key): BBWW / BBWW -> hist [0.5, .., 0.5]
    // frame 2 (delta): skip to (2,1), paint 2 black; the OTHER 6 cells
    // persist from frame 1 -> BBWW / BBBB -> hist [0.75, .., 0.25]
    // clip mean: [0.625, 0, .., 0, 0.375]. A frame-independent decode
    // would read frame 2's skipped cells as palette index 0 (all
    // black, hist [1, .., 0]) and land on mean [0.75, .., 0.25] —
    // the exact values below only hold if temporal prediction ran.
    val clip = Multimodal.syntheticAviDib(rle8 = true, nFrames = 2,
      w = 4, h = 2, usPerFrame = 100000, deltaTail = true)
    val row = Multimodal.decode(
      Seq((1L, "video", clip)).toDF("media_id", "kind", "content")).head()
    assert(row.getInt(2) == 4 && row.getInt(3) == 2, row)
    assert(row.getString(4) == "avi" && row.getInt(5) == 200, row)
    val hist = row.getSeq[Float](6)
    assert(hist.head == 0.625f && hist.last == 0.375f, hist)
    assert(hist.slice(1, 7).forall(_ == 0f), hist)

    // and the q66 fixture carries the inter-frame clip end-to-end
    val fx = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf("sf0.001")))
    val d = Multimodal.decode(fx.filter(col("media_id") === -4L)).head()
    assert(d.getString(4) == "avi" && d.getInt(5) == 200, d)
  }

  test("MP4 container metadata parses for real; pixels stay the fake seam") {
    import spark.implicits._
    val clip = Multimodal.syntheticMp4(w = 640, h = 360, durationMs = 2500)
    val row = Multimodal.decode(
      Seq((1L, "video", clip)).toDF("media_id", "kind", "content")).head()
    // dims and duration come from the tkhd/mvhd boxes — REAL facts
    assert(row.getInt(2) == 640 && row.getInt(3) == 360, row)
    assert(row.getString(4) == "mp4" && row.getInt(5) == 2500, row)
    // the feature vector is the documented deterministic fake (the
    // transform-coded pixel decode is the one remaining seam)
    val h = clip.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    val want = Array.tabulate(8)(i =>
      (math.floorMod(h >> (i * 7), 1000) / 1000.0f))
    assert(row.getSeq[Float](6) == want.toSeq, row)

    // and the q66 fixture carries the mp4 clip end-to-end
    val fx = Multimodal.mediaFromDocuments(spark,
      graft.Tables.documents(spark, sf("sf0.001")))
    val d = Multimodal.decode(fx.filter(col("media_id") === -5L)).head()
    assert(d.getString(4) == "mp4" && d.getInt(2) == 640 &&
      d.getInt(5) == 2500, d)
  }

  test("GDCT mp4: the intra-DCT codec round-trips pixels for real") {
    import spark.implicits._
    // flat half-cards carry only DC coefficients → EXACT round-trip
    val clip = Multimodal.syntheticMp4Dct()
    val row = Multimodal.decode(
      Seq((1L, "video", clip)).toDF("media_id", "kind", "content")).head()
    assert(row.getInt(2) == 16 && row.getInt(3) == 8, row)
    assert(row.getString(4) == "mp4" && row.getInt(5) == 1500, row)
    assert(row.getSeq[Float](6) ==
      Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f), row)
    // and it is NOT the payload fake — the pixels were decoded
    val h = clip.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    val fake = Array.tabulate(8)(i =>
      (math.floorMod(h >> (i * 7), 1000) / 1000.0f))
    assert(row.getSeq[Float](6) != fake.toSeq)
    // fixture −6 carries the clip end-to-end
    val fx = Multimodal.mediaFromDocuments(spark,
      graft.Tables.documents(spark, sf("sf0.001")))
    val d = Multimodal.decode(fx.filter(col("media_id") === -6L)).head()
    assert(d.getSeq[Float](6) ==
      Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f), d)
  }

  test("GDCT codec: a non-flat block survives quantization within Q-bound") {
    // gradient block: the forward/inverse pair is a genuine lossy
    // transform codec — reconstruction error is bounded by the flat
    // quantizer, not zero (a fixture echo would be exact)
    val block = Array.tabulate(64)(i => (i * 4 + (i % 8) * 3) % 256)
    val back = Multimodal.idctDequant(Multimodal.fdctQuant(block))
    val maxErr = block.zip(back).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr > 0, "suspiciously exact: codec may be echoing input")
    assert(maxErr <= 16, s"max reconstruction error $maxErr > Q grid")
    // and a constant block IS exact (only DC, flat quantizer divides)
    val flat = Array.fill(64)(240)
    assert(Multimodal.idctDequant(Multimodal.fdctQuant(flat)).toSeq
      == flat.toSeq)
  }

  test("decode stub: batched, deterministic, schema-stable") {
    val d1 = Multimodal.decode(media, batchSize = 7)
    val d2 = Multimodal.decode(media, batchSize = 64)
    assert(d1.schema == Multimodal.decodedSchema)
    // batch size must not change results (pure per-row semantics,
    // batching is an execution detail)
    assert(d1.exceptAll(d2).count() == 0 && d2.exceptAll(d1).count() == 0)
    assert(d1.count() == media.count())
    // images have no duration; features are fixed-width
    assert(d1.filter(col("kind") === "image" && col("duration_ms") =!= 0)
      .count() == 0)
    assert(d1.filter(size(col("feature")) =!= 8).count() == 0)
  }

  test("resize clamps the long side, preserves aspect ratio direction") {
    val resized = Multimodal.resize(Multimodal.decode(media), maxSide = 256)
    assert(resized.filter(greatest(col("width"), col("height")) > 256)
      .count() == 0)
    assert(resized.filter(col("width") < 1 || col("height") < 1).count() == 0)
    // exact scaling: both dims must shrink by the SAME original-dims
    // factor (a chained-withColumn resize recomputed the height scale
    // against the already-resized width — q66's oracle caught it)
    import spark.implicits._
    val one = Seq((1L, "video", 833, 310)).toDF("media_id", "kind", "width", "height")
    val r = Multimodal.resize(one, maxSide = 256).select("width", "height").head()
    assert(r.getInt(0) == 256 && r.getInt(1) == 96, r)
  }

  test("frame sampling explodes one row per 5s frame for videos only") {
    val decoded = Multimodal.decode(media)
    val frames = Multimodal.sampleFrames(decoded, everyMs = 5000)
    val videos = decoded.filter(col("kind") === "video")
    assert(frames.select("media_id").distinct().count() == videos.count())
    // per-video frame count = floor(duration/5000) + 1
    val bad = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .join(videos.select(col("media_id"),
        ((col("duration_ms") / 5000).cast("int") + 1).as("expect")), "media_id")
      .filter(col("n") =!= col("expect"))
    assert(bad.count() == 0)
  }
}
