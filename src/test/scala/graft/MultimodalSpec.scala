package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Mp4, Multimodal}
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

  test("REAL codec slot-in: MJPEG-AVI parses through the RIFF walker, frames decode via ImageIO") {
    import spark.implicits._
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def avi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val avih = new Array[Byte](56)
      def put(off: Int, v: Int): Unit = le32(v).copyToArray(avih, off)
      put(16, frames.size) // dwTotalFrames
      put(24, 1)           // dwStreams
      put(32, w); put(36, h)
      val body = "AVI ".getBytes("US-ASCII") ++
        list("hdrl", chunk("avih", avih)) ++
        list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // 6-frame luminance ramp, 24x16
    val grays = Seq(0, 50, 100, 150, 200, 250)
    val clip = avi(24, 16, grays.map(jpegFrame(24, 16, _)))
    val media = Seq(MediaRow(1L, "avi", clip)).toDS()
    val out = Multimodal.decodeAll(media, Multimodal.AviMjpegCodec).collect().head
    // TRUE container metadata: dims from avih, frame count from movi
    assert((out.width, out.height, out.channels) == (24, 16, 6))
    // temporal luminance profile: per-band mean of the DECODED frames
    // follows the ramp (JPEG is lossy — loose tolerance)
    assert(out.features.length == 16)
    assert(math.abs(out.features.head - 0f) < 10f &&
      math.abs(out.features.last - 250f) < 10f,
      s"profile ends ${out.features.head}..${out.features.last}")
    assert(out.features.sliding(2).forall { case Array(a, b) => b >= a - 5f },
      s"luminance profile not a ramp: ${out.features.mkString(",")}")
    // real frame sampling: every 2nd ACTUAL JPEG frame, each decodable
    val frames = Multimodal.sampleFramesAvi(media, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_bytes))
      assert(img != null && img.getWidth == 24 && img.getHeight == 16)
    }
    // malformed container fails loudly, not silently
    intercept[IllegalArgumentException](
      Multimodal.AviMjpegCodec.decode("avi", "not an avi".getBytes))
    // untrusted size fields: negative / past-the-buffer chunk sizes and a
    // truncated avih must fail as IllegalArgumentException, never surface
    // as NegativeArraySizeException/OOM at the frame allocation
    def rawAvi(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + chunks.length) ++
        "AVI ".getBytes("US-ASCII") ++ chunks
    val negSize = rawAvi("00dc".getBytes("US-ASCII") ++ le32(-8))
    intercept[IllegalArgumentException](Multimodal.AviMjpegCodec.decode("avi", negSize))
    val hugeSize = rawAvi("00dc".getBytes("US-ASCII") ++ le32(Int.MaxValue - 16))
    intercept[IllegalArgumentException](Multimodal.AviMjpegCodec.decode("avi", hugeSize))
    val shortAvih = rawAvi(chunk("avih", new Array[Byte](8)))
    intercept[IllegalArgumentException](Multimodal.AviMjpegCodec.decode("avi", shortAvih))
  }

  test("MP4 synthesize→parse round-trip: geometry and payload content match the arithmetic") {
    // len 10 → n = 1 + 10%7 = 4 samples, keyframes 1 and 4; docId 5 →
    // width 16·(1+5%4)=32, height 16·(1+5%3)=48; sizes 8+(5+i)%9 for
    // i=1..4 → 14,15,16,8
    val payload = "abcdefghij".getBytes("US-ASCII")
    val blob = Mp4.synthesize(5L, payload)
    val t = Mp4.parse(blob)
    assert(t.codec == "avc1" && t.width == 32 && t.height == 48)
    assert(t.sampleCount == 4 && t.keyframes.map(_.sample) == Seq(1, 4))
    assert(t.keyframes.map(_.size) == Seq(14, 8))
    // mdat byte j = payload[j % len]: keyframe 1 covers bytes 0..13,
    // keyframe 4 covers bytes 45..52 (starts after sizes 14+15+16)
    val kf1 = Mp4.keyframeBytes(blob, t.keyframes(0))
    assert(kf1.toSeq == (0 until 14).map(j => payload(j % 10)))
    val kf4 = Mp4.keyframeBytes(blob, t.keyframes(1))
    assert(kf4.toSeq == (45 until 53).map(j => payload(j % 10)))
    // single-sample edge: len 7 → n = 1 + 7%7 = 1 → one chunk, one stsc
    // run, keyframe 1 only
    val one = Mp4.parse(Mp4.synthesize(2L, "0123456".getBytes("US-ASCII")))
    assert(one.sampleCount == 1 && one.keyframes.map(_.sample) == Seq(1))
  }

  test("MP4 sample tables: keyframe extraction pulls exactly the stss-marked payloads") {
    import spark.implicits._
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def full(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, new Array[Byte](4) ++ payload) // version 0, flags 0
    // five fake compressed samples; chunk 1 holds 1-2, chunk 2 holds 3-5
    val samples = (1 to 5).map(i => s"NAL-payload-$i!".getBytes("US-ASCII") ++
      Array.fill(i)(i.toByte))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mdatStart = ftyp.length + 8L
    val chunk1 = mdatStart
    val chunk2 = mdatStart + samples(0).length + samples(1).length
    val mdat = box("mdat", samples.reduce(_ ++ _))
    // VisualSampleEntry: 8-byte entry header + 8 SampleEntry + 16 pre_defined,
    // then u16 width/height (ISO 14496-12 §12.1.3)
    val avc1 = box("avc1", new Array[Byte](8 + 16) ++ be16(320) ++ be16(240) ++
      new Array[Byte](50))
    val stsd = full("stsd", be32(1) ++ avc1)
    val stsz = full("stsz", be32(0) ++ be32(5) ++ samples.flatMap(s => be32(s.length)))
    val stsc = full("stsc", be32(2) ++
      (be32(1) ++ be32(2) ++ be32(1)) ++ (be32(2) ++ be32(3) ++ be32(1)))
    val stco = full("stco", be32(2) ++ be32(chunk1.toInt) ++ be32(chunk2.toInt))
    val stss = full("stss", be32(2) ++ be32(1) ++ be32(4))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
    val hdlr = full("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12))
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    val mp4 = ftyp ++ mdat ++ moov

    val t = Mp4.parse(mp4)
    assert(t.codec == "avc1" && t.width == 320 && t.height == 240 && t.sampleCount == 5)
    assert(t.keyframes.map(_.sample) == Seq(1, 4))
    assert(Mp4.keyframeBytes(mp4, t.keyframes.head).toSeq == samples(0).toSeq)
    assert(Mp4.keyframeBytes(mp4, t.keyframes(1)).toSeq == samples(3).toSeq)
    // through the Spark dataflow: compressed keyframe payloads, pipelined
    val media = Seq(MediaRow(7L, "mp4", mp4)).toDS()
    val frames = Multimodal.sampleKeyframesMp4(media).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(1, 4))
    assert(frames(1).frame_bytes.toSeq == samples(3).toSeq)
    // no stss box ⇒ every sample is a sync point (ISO 14496-12 §8.6.2)
    val stblNoStss = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val noStss = ftyp ++ mdat ++ box("moov", box("trak",
      box("mdia", hdlr ++ box("minf", stblNoStss))))
    assert(Mp4.parse(noStss).keyframes.map(_.sample) == (1 to 5))
    // untrusted fields fail as malformed-media errors, not array errors
    intercept[IllegalArgumentException](Mp4.parse("notanmp4".getBytes))
    val badStss = full("stss", be32(2) ++ be32(1) ++ be32(99)) // sample 99 of 5
    val bad = ftyp ++ mdat ++ box("moov", box("trak", box("mdia",
      hdlr ++ box("minf", box("stbl", stsd ++ stsz ++ stsc ++ stco ++ badStss)))))
    intercept[IllegalArgumentException](Mp4.parse(bad))
  }

  test("MP4 walker survives hostile size fields (IllegalArgumentException, never OOM/array errors)") {
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32((v >> 32).toInt) ++ be32(v.toInt)
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    def full(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, new Array[Byte](4) ++ payload)
    val avc1 = box("avc1", new Array[Byte](8 + 16) ++ be16(320) ++ be16(240) ++
      new Array[Byte](50))
    val stsd = full("stsd", be32(1) ++ avc1)
    val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(5) ++ be32(1))
    val stco = full("stco", be32(1) ++ be32(16))
    val hdlr = full("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12))
    def mp4Of(stbl: Array[Byte]): Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
        box("mdat", new Array[Byte](64)) ++
        box("moov", box("trak", box("mdia", hdlr ++ box("minf", stbl))))
    def expectMalformed(blob: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](Mp4.parse(blob))
      assert(e.getMessage.contains("malformed MP4"), s"$what: ${e.getMessage}")
    }

    // uniform-size stsz with a hostile sample count: the offsets table
    // would be Int.MaxValue longs (17 GB) if the count were trusted
    val hugeUniform = full("stsz", be32(1) ++ be32(Int.MaxValue))
    expectMalformed(mp4Of(box("stbl", stsd ++ hugeUniform ++ stsc ++ stco)),
      "huge uniform stsz")
    // uniform samples that cannot fit in the input
    val tooBigUniform = full("stsz", be32(1 << 20) ++ be32(1 << 12))
    expectMalformed(mp4Of(box("stbl", stsd ++ tooBigUniform ++ stsc ++ stco)),
      "oversized uniform samples")
    // 64-bit largesize near Long.MaxValue: off + size64 overflows negative
    // and would slip past a naive boxEnd <= end bound
    val overflowBox = be32(1) ++ "stbl".getBytes("US-ASCII") ++
      be64(Long.MaxValue - 4)
    expectMalformed(mp4Of(overflowBox), "largesize overflow")
    // stsd shorter than the VisualSampleEntry fields the parser reads
    val shortStsd = full("stsd", be32(1))
    val okStsz = full("stsz", be32(0) ++ be32(1) ++ be32(8))
    expectMalformed(mp4Of(box("stbl", shortStsd ++ okStsz ++ stsc ++ stco)),
      "short stsd")
    // stsc run table declaring more runs than the box holds
    val badStsc = full("stsc", be32(1 << 28))
    expectMalformed(mp4Of(box("stbl", stsd ++ okStsz ++ badStsc ++ stco)),
      "stsc overflow")
    // co64 offset with the top bit set: a negative offset must be rejected
    // at the read bound, not wrap into the array
    val co64 = full("co64", be32(1) ++ be64(Long.MinValue + 7))
    val t = Mp4.parse(mp4Of(box("stbl", stsd ++ okStsz ++ stsc ++ co64)))
    intercept[IllegalArgumentException](Mp4.keyframeBytes(new Array[Byte](64),
      t.keyframes.head))

    // deterministic mutation fuzz: flip bytes of a VALID file one at a
    // time and in seeded random 4-byte bursts — any outcome is fine
    // except a non-IllegalArgument error (OOM, NegativeArraySize,
    // ArrayIndexOutOfBounds) escaping the walker
    val okStss = full("stss", be32(1) ++ be32(1))
    val valid = mp4Of(box("stbl", stsd ++ okStsz ++ stsc ++ stco ++ okStss))
    def fuzzOne(blob: Array[Byte], what: String): Unit =
      try { Mp4.parse(blob); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable => fail(s"$what escaped as ${e.getClass.getName}: $e")
      }
    for (i <- valid.indices; b <- Seq(0x00, 0xff, 0x80, 0x7f)) {
      val m = valid.clone(); m(i) = b.toByte
      fuzzOne(m, s"byte $i := 0x${b.toHexString}")
    }
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 2000) {
      val m = valid.clone()
      for (_ <- 0 until 4)
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      fuzzOne(m, s"random trial $trial")
    }
  }

  test("AVI/WAV codecs survive byte mutations and a LIST-nesting bomb (IAE or success, never stack/array errors)") {
    import graft.multimodal.Multimodal
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ padded
    }
    def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih", new Array[Byte](32) ++ le32(8) ++ le32(8) ++
      new Array[Byte](16))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      chunk("00dc", jpegFrame(8, 8, 40)) ++ chunk("00dc", jpegFrame(8, 8, 200)))
    val aviBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val aviBlob = "RIFF".getBytes("US-ASCII") ++ le32(aviBody.length) ++ aviBody
    // sanity: the unmutated fixtures are valid
    assert(Multimodal.AviMjpegCodec.decode("avi", aviBlob) == ((8, 8, 2)))

    val wavBlob = {
      val pcm = Array.tabulate[Byte](400)(i => (math.sin(i / 7.0) * 100).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(Multimodal.WavCodec.decode("wav", wavBlob)._3 == 1)

    def fuzz(parse: Array[Byte] => Any, valid: Array[Byte], what: String): Unit = {
      val rnd = new scala.util.Random(20260813L)
      for (trial <- 0 until 1500) {
        val m = valid.clone()
        for (_ <- 0 until 4) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        try { parse(m); () } catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$what trial $trial escaped as ${e.getClass.getName}: $e")
        }
      }
    }
    fuzz(b => Multimodal.AviMjpegCodec.decode("avi", b), aviBlob, "avi decode")
    fuzz(b => Multimodal.AviMjpegCodec.features(b), aviBlob, "avi features")
    fuzz(b => Multimodal.WavCodec.decode("wav", b), wavBlob, "wav decode")
    fuzz(b => Multimodal.WavCodec.features(b), wavBlob, "wav features")

    // 200 nested LISTs (each with its mandatory list-type fourcc): must
    // hit the depth bound as malformed media, not unwind the JVM stack
    var bomb: Array[Byte] = chunk("LIST", "movi".getBytes("US-ASCII"))
    for (_ <- 0 until 200)
      bomb = chunk("LIST", "nest".getBytes("US-ASCII") ++ bomb)
    val bombAvi = "RIFF".getBytes("US-ASCII") ++
      le32(4 + bomb.length) ++ "AVI ".getBytes("US-ASCII") ++ bomb
    val e = intercept[IllegalArgumentException](
      Multimodal.AviMjpegCodec.decode("avi", bombAvi))
    assert(e.getMessage.contains("nesting"))
  }

  test("image dHash: identical blobs at distance 0, a one-cell edit stays near, banding finds both") {
    import spark.implicits._
    import graft.multimodal.Multimodal.MediaRow
    val base = Array.tabulate[Byte](660)(i => (i % 251).toByte)
    // cell i samples byte (i*660)/66 = i*10 — edit a SAMPLED byte so the
    // luminance grid actually changes (one cell → at most 2 gradient bits)
    val tweaked = base.clone(); tweaked(30) = ((base(30) & 0xff) - 100).toByte
    val media = Seq(MediaRow(1L, "png", base), MediaRow(2L, "png", base.clone()),
      MediaRow(3L, "png", tweaked)).toDS()
    val dh = graft.multimodal.Multimodal.dhashTable(media)
    val hashes = dh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(3L))
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) <= 2)
    // the TEXT SimHash banding engine consumes the image signatures as-is
    val pairs = graft.operators.Dedup.simhashPairsOf(dh, maxDist = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    graft.engine.CacheScope.drain()
  }

  test("wide dHash: planted near-dups found; banding == brute force; candidate volume collapses vs 60-bit") {
    import spark.implicits._
    import graft.multimodal.Multimodal.MediaRow
    import graft.operators.Dedup
    val base = Array.tabulate[Byte](1320)(i => (i % 251).toByte)
    // wide grid cell i samples byte (i*1320)/132 = i*10 — edit a SAMPLED
    // byte so the 132-cell grid changes (one cell → at most 2 gradient bits)
    val tweaked = base.clone(); tweaked(30) = ((base(30) & 0xff) - 100).toByte
    val planted = Seq(MediaRow(1L, "png", base), MediaRow(2L, "png", base.clone()),
      MediaRow(3L, "png", tweaked)).toDS()
    val dh = Multimodal.dhashTableWide(planted)
    val sigs = dh.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    val pairs = Dedup.simhashPairsOfWide(dh, maxDist = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))

    // banding == brute force over the real corpus signatures: the pair
    // SET is the contract (the x79 oracle locks it again at sf0.01)
    val wt = Multimodal.dhashTableWide(media)
    val banded = Dedup.simhashPairsOfWide(wt, maxDist = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpus = wt.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ahi, alo) <- corpus; (b, bhi, blo) <- corpus if a < b
      if java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo) <= 14
    } yield (a, b)).toSet
    assert(banded == brute,
      s"banding missed ${(brute -- banded).size}, invented ${(banded -- brute).size}")

    // the STRUCTURAL claim (BASELINE.md round 8): same corpus, same
    // absolute bound — Σ C(bucket, 2) over the exact chunk-pair layouts
    // the joins use must collapse when the signature doubles (measured
    // 80× at sf0.1; the pin is a conservative 10×). chunkSpecOf(16) ==
    // simhashChunkSpec(15): the maxDist-14 two-chunk scheme's 16 chunks.
    def pairVolume(perDoc: Seq[Seq[(Int, Long)]]): Long = {
      val buckets = scala.collection.mutable.Map.empty[(Int, Int, Long, Long), Long]
      for (vals <- perDoc; i <- vals.indices; j <- i + 1 until vals.size) {
        val k = (vals(i)._1, vals(j)._1, vals(i)._2, vals(j)._2)
        buckets(k) = buckets.getOrElse(k, 0L) + 1
      }
      buckets.valuesIterator.map(n => n * (n - 1) / 2).sum
    }
    val nspec = Dedup.simhashChunkSpec(15)
    val narrowVol = pairVolume(Multimodal.dhashTable(media).collect().toSeq
      .map(r => nspec.map { case (c, off, m) => (c, (r.getLong(1) >>> off) & m) }))
    val wspec = Dedup.wideWordSpec(16)
    val wideVol = pairVolume(corpus.toSeq.map { case (_, hi, lo) =>
      wspec.map { case (c, w, off, m) =>
        (c, ((if (w == "sh_hi") hi else lo) >>> off) & m) }
    })
    assert(wideVol * 10 < narrowVol,
      s"wide banding candidate volume $wideVol vs narrow $narrowVol — structural gain lost")

    // the PRODUCTION entry point routes through the wide path: identical
    // pair set (round 9 made this the default surface; the 60-bit path
    // is the documented counter-example above)
    val prod = Multimodal.imageNearDupPairs(planted, maxDist = 14)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(prod == pairs, s"imageNearDupPairs diverged from the wide path: $prod vs $pairs")
    graft.engine.CacheScope.drain()
  }

  test("frame sampling fans out only video rows, pipelined (no shuffle)") {
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val nVideos = media.filter(_.format == "webm").count()
    assert(frames.count() >= nVideos) // ≥1 frame per video
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling should not shuffle:\n$plan")
  }

  test("WAV synthesize→decode round-trip: samples match the (b-128)/256 arithmetic exactly") {
    val text = "spark merge table row window batch"
    val blob = Multimodal.synthesizeWav(text)
    // decoded through the INDEPENDENT javax.sound path
    val s = Multimodal.WavCodec.samples(blob)
    val bytes = text.getBytes("UTF-8")
    val n = 256 + (bytes.length % 256) * 8
    assert(s.length == n, s"expected $n samples, got ${s.length}")
    s.indices.foreach { j =>
      val expect = ((bytes(j % bytes.length) & 0xff) - 128).toFloat / 256f
      assert(s(j) == expect, s"sample $j: ${s(j)} != $expect")
    }
  }

  test("audio fingerprint: identical texts at distance 0; banding == brute force on the corpus") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().take(60)
    // plant an exact duplicate of row 0's audio under a fresh id
    val planted = (rows :+ ((999999L, rows.head._2))).toSeq
      .map { case (id, t) => MediaRow(id, "wav", Multimodal.synthesizeWav(t)) }
    val media = spark.createDataset(planted)
    val sigs = Multimodal.audioFingerprintTable(media).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sigs(999999L) == sigs(rows.head._1), "identical audio, identical signature")
    val pairs = Multimodal.audioNearDupPairs(media, maxDist = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists(p => p._1 == rows.head._1 && p._2 == 999999L && p._3 == 0),
      "planted duplicate not found at distance 0")
    // banding is a lossless candidate generator: equals brute force
    val brute = (for {
      a <- planted; b <- planted if a.media_id < b.media_id
      (ha, la) = sigs(a.media_id); (hb, lb) = sigs(b.media_id)
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 20
    } yield (a.media_id, b.media_id, d)).toSet
    assert(pairs == brute, s"banded $pairs != brute $brute")
    graft.engine.CacheScope.drain()
  }

  test("resize preserves aspect ratio within bounds") {
    val resized = Multimodal.resizeMeta(Multimodal.decodeAll(media), 100, 100)
    val bad = resized.filter(col("resized_w") > 100 || col("resized_h") > 100).count()
    assert(bad == 0)
    // no upscaling
    assert(resized.filter(col("resized_w") > col("width")).count() == 0)
  }
}
