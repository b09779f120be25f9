package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** The multimodal plumbing is real (schemas, encoders, partition batching,
  * fan-out); only the codec is stubbed — these tests lock the plumbing.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sf(), "documents")
  private lazy val media = Multimodal.toMedia(Multimodal.mediaTable(docs))

  test("media table: binary payload + round-robin format, 1 row per doc") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("blob").dataType.typeName == "binary")
    assert(m.count() == docs.count())
    assert(m.select("format").distinct().collect().map(_.getString(0)).toSet ==
      Set("png", "jpeg", "webm"))
  }

  test("decode: deterministic metadata, features are 16-dim byte means") {
    val d = Multimodal.decodeAll(media).toDF()
    assert(d.count() == docs.count())
    val r = d.filter(col("media_id") === 0).collect().head
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 640)
    assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 480)
    val feats = r.getAs[scala.collection.Seq[Float]]("features")
    assert(feats.size == 16)
    // payload is ASCII text -> every byte-mean in the printable range
    assert(feats.forall(f => f > 32 && f < 127))
    // png rows decode with alpha
    val png = d.filter(col("format") === "png").select("channels").distinct().collect()
    assert(png.map(_.getInt(0)).toSeq == Seq(4))
  }

  test("REAL codec slot-in: JDK ImageIO decodes actual PNGs/BMPs through the same dataflow") {
    import spark.implicits._
    def imageBytes(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val media = Seq(
      // height >= 16 so every luminance band has pixels
      MediaRow(1L, "png", imageBytes("png", 17, 18, 0xFF8040)),
      MediaRow(2L, "png", imageBytes("png", 5, 23, 0x102030)),
      MediaRow(3L, "bmp", imageBytes("bmp", 31, 2, 0x000000))).toDS()
    val out = Multimodal.decodeAll(media, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    // TRUE pixel dimensions, not byte-derived fakes
    assert((out(0).width, out(0).height) == (17, 18))
    assert((out(1).width, out(1).height) == (5, 23))
    assert((out(2).width, out(2).height) == (31, 2))
    assert(out.forall(_.channels == 3))
    // uniform-color image: every luminance band equals the pixel luminance
    val lum = (0xFF + 0x80 + 0x40) / 3f
    assert(out(0).features.forall(f => math.abs(f - lum) <= 1f),
      s"luminance bands ${out(0).features.mkString(",")} != $lum")
    assert(out(2).features.forall(_ == 0f)) // black image
  }

  test("REAL codec slot-in: javax.sound.sampled decodes actual WAV/PCM through the same dataflow") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // sine WAV: 16-bit signed PCM, little-endian; amp in [0,1]
    def wavBytes(rateHz: Int, seconds: Double, freqHz: Double, amp: Double,
        channels: Int = 1): Array[Byte] = {
      val n = (rateHz * seconds).toInt
      val raw = new Array[Byte](n * 2 * channels)
      for (i <- 0 until n; ch <- 0 until channels) {
        val v = (amp * 32767 * math.sin(2 * math.Pi * freqHz * i / rateHz)).toInt
        val base = (i * channels + ch) * 2
        raw(base) = (v & 0xff).toByte
        raw(base + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rateHz.toFloat, 16, channels, true, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      MediaRow(1L, "wav", wavBytes(8000, 0.5, 440, 0.5)),
      MediaRow(2L, "wav", wavBytes(16000, 0.25, 1000, 0.9, channels = 2)),
      MediaRow(3L, "wav", wavBytes(8000, 0.5, 440, 0.0))).toDS()
    val out = Multimodal.decodeAll(media, Multimodal.WavCodec)
      .collect().sortBy(_.media_id)
    // TRUE audio metadata: (sample rate, frame count, channels)
    assert((out(0).width, out(0).height, out(0).channels) == (8000, 4000, 1))
    assert((out(1).width, out(1).height, out(1).channels) == (16000, 4000, 2))
    // duration follows: frames / rate
    assert(out(0).height.toDouble / out(0).width == 0.5)
    // per-band RMS of a steady sine ≈ amp/sqrt(2) in every time band
    val rms0 = 0.5 / math.sqrt(2)
    assert(out(0).features.length == 16)
    assert(out(0).features.forall(f => math.abs(f - rms0) < 0.02),
      s"RMS bands ${out(0).features.mkString(",")} != $rms0")
    val rms1 = 0.9 / math.sqrt(2)
    assert(out(1).features.forall(f => math.abs(f - rms1) < 0.04))
    // silence: every band exactly 0
    assert(out(2).features.forall(_ == 0f))
  }

  test("frame sampling fans out only video rows, pipelined (no shuffle)") {
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val nVideos = media.filter(_.format == "webm").count()
    assert(frames.count() >= nVideos) // ≥1 frame per video
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling should not shuffle:\n$plan")
  }

  test("resize preserves aspect ratio within bounds") {
    val resized = Multimodal.resizeMeta(Multimodal.decodeAll(media), 100, 100)
    val bad = resized.filter(col("resized_w") > 100 || col("resized_h") > 100).count()
    assert(bad == 0)
    // no upscaling
    assert(resized.filter(col("resized_w") > col("width")).count() == 0)
  }
}
