package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal
import graft.pipeline.Multimodal.{Codec, FakeCodec, JvmCodec}

/** The multimodal decode seam with REAL media: the JDK's own codecs
  * (javax.imageio, javax.sound.sampled) must decode real PNG/WAV payloads
  * through the same batch stages the opaque-blob path uses, while text
  * payloads keep riding the deterministic FakeCodec stub (which is what
  * the m1-m4 DuckDB gates replay). */
class MultimodalCodecSpec extends SparkTestBase {

  /** A w×h solid-color PNG. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A mono 16-bit PCM WAV with `frames` frames at 8 kHz. */
  private def wav(frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (math.sin(i / 8.0) * 8000).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real PNG decodes to its true dimensions through decodeBatch") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(40, 20, 0xff0000)),
      Multimodal.MediaRow(2L, "audio", wav(1000)),
      Multimodal.MediaRow(3L, "video", "not media at all".getBytes("UTF-8")))
      .toDF()
    val got = Multimodal.decodeBatch(media).collect().map(d => d.media_id -> d).toMap
    assert((got(1L).width, got(1L).height, got(1L).n_frames) == (40, 20, 1))
    // audio: (channels, sample bits, frame count) ride the same slots
    assert((got(2L).width, got(2L).height, got(2L).n_frames) == (1, 16, 1000))
    // opaque payload falls back to the deterministic stub exactly
    val p3 = "not media at all".getBytes("UTF-8")
    assert((got(3L).width, got(3L).height, got(3L).n_frames, got(3L).checksum) ==
      FakeCodec.decode(p3))
  }

  test("resizeBatch really downscales a decodable image") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "image", png(64, 64, 0x00ff00))).toDF()
    val out = Multimodal.resizeBatch(media, maxW = 16, maxH = 16).collect().head
    assert((out.width, out.height) == (16, 16))
    // the resized payload is itself a real PNG of the bounded dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert((back.getWidth, back.getHeight) == (16, 16))
  }

  test("featureBatch yields real luminance for images, stub for blobs") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(32, 32, 0xffffff)),
      Multimodal.MediaRow(2L, "image", png(32, 32, 0x000000))).toDF()
    val f = Multimodal.featureBatch(media, dims = 4).collect()
      .map(r => r.media_id -> r.features).toMap
    assert(f(1L).forall(v => v > 0.95f && v <= 1f), s"white: ${f(1L).toSeq}")
    assert(f(2L).forall(v => v >= 0f && v < 0.05f), s"black: ${f(2L).toSeq}")
  }

  test("magic-byte sniff keeps opaque payloads off the codec path") {
    assert(JvmCodec.sniffImage(png(2, 2, 0)) && JvmCodec.sniffAudio(wav(4)))
    val text = "RIFFxxxx but not WAVE".getBytes("UTF-8")
    assert(!JvmCodec.sniffImage(text) && !JvmCodec.sniffAudio(text))
    // dispatch equals the stub bit-for-bit on non-media
    assert(Codec.decode(text) == FakeCodec.decode(text))
    assert(Codec.features(text, 8).sameElements(FakeCodec.features(text, 8)))
  }

  /** An animated GIF: `frames` solid-color frames written as one
    * multi-image container via the JDK's own GIF writer sequence API. */
  private def animatedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    import javax.imageio.ImageIO
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val out = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { i =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(i * 40 % 256, 0, 0)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  test("sampleFramePayloads extracts REAL frames from a multi-frame GIF") {
    import spark.implicits._
    val gif = animatedGif(16, 12, 5)
    // the container really is multi-frame through the metadata decode
    assert(JvmCodec.decodeImage(gif).map(d => (d._1, d._2, d._3)) == Some((16, 12, 5)))
    val media = Seq(
      Multimodal.MediaRow(1L, "video", gif),
      Multimodal.MediaRow(2L, "video", "definitely not a video".getBytes("UTF-8")))
      .toDF()
    val got = Multimodal.sampleFramePayloads(media, everyNth = 2).collect()
    // GIF: frames 0, 2, 4 sampled, every payload a REAL decodable PNG of
    // the container's dimensions
    val gifFrames = got.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(gifFrames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(gifFrames.forall(_.decoded))
    gifFrames.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.payload))
      assert(img != null && img.getWidth == 16 && img.getHeight == 12)
    }
    // true video (no JDK codec): fan-out shape survives, payloads are
    // explicitly EMPTY with decoded=false — marked, not faked
    val stubFrames = got.filter(_.media_id == 2L)
    assert(stubFrames.nonEmpty)
    assert(stubFrames.forall(f => !f.decoded && f.payload.isEmpty))
    // out-of-range / non-image extraction answers None, never throws
    assert(JvmCodec.extractFrame(gif, 99).isEmpty)
    assert(JvmCodec.extractFrame("blob".getBytes("UTF-8"), 0).isEmpty)
  }

  /** A w×h solid-color baseline JPEG. */
  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG stream: real container parse, real decoded frames") {
    import spark.implicits._
    // motion-JPEG over-the-wire form: concatenated baseline JPEGs
    val frames = Seq(jpeg(24, 18, 0x0000ff), jpeg(24, 18, 0x00ff00), jpeg(24, 18, 0xff0000))
    val mjpeg = frames.reduce(_ ++ _)
    // boundary scan finds exactly the encoder's frame ranges
    assert(JvmCodec.mjpegFrames(mjpeg).size == 3)
    assert(JvmCodec.mjpegFrames(frames.head).isEmpty,
      "a single JPEG is an image, not a container")
    // container decode: frame-0 dimensions, true frame count
    assert(Codec.decode(mjpeg)._1 == 24)
    assert(Codec.decode(mjpeg)._2 == 18)
    assert(Codec.decode(mjpeg)._3 == 3)
    // the full sampling stage: every frame REAL (decoded=true, PNG raster
    // of the stream's dimensions) — the video seam is closed for MJPEG
    val media = Seq(Multimodal.MediaRow(1L, "video", mjpeg)).toDF()
    val got = Multimodal.sampleFramePayloads(media, everyNth = 1).collect()
      .sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(got.forall(_.decoded), "every MJPEG frame must really decode")
    got.zip(Seq(0x0000ff, 0x00ff00, 0xff0000)).foreach { case (f, rgb) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.payload))
      assert(img != null && img.getWidth == 24 && img.getHeight == 18)
      // JPEG is lossy; check the dominant channel survived the round-trip
      val px = img.getRGB(12, 9)
      val (r, g, b) = ((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)
      val dominant = Seq(b, g, r)(Seq(0x0000ff, 0x00ff00, 0xff0000).indexOf(rgb))
      assert(dominant > 180, s"frame ${f.frame_idx}: rgb=($r,$g,$b)")
    }
    // out-of-range answers None, never throws
    assert(JvmCodec.extractFrame(mjpeg, 3).isEmpty)
  }
}
