package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.C): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample as partition-batched transforms.
  *
  * The Spark-side plumbing — schemas, encoders, partition batching, fan-out
  * shape — is real and tested, and the decode step is a pluggable
  * [[Multimodal.MediaCodec]]. Four codecs ship: the deterministic
  * `StubCodec` (the default — the driver's synthetic payloads are UTF-8
  * text, not media containers, and determinism is what lets DuckDB oracle
  * the accounting), and three REAL ones covering every modality with no
  * external libraries: `ImageIoCodec` (JDK ImageIO — PNG/JPEG/BMP/GIF),
  * `WavCodec` (JDK javax.sound.sampled — WAV/PCM audio), and
  * `AviMjpegCodec` (pure-Scala RIFF walker + ImageIO frames — MJPEG-AVI
  * video, incl. real frame sampling via [[Multimodal.sampleFramesAvi]]).
  * MultimodalSpec drives all three through the same `decodeAll` dataflow
  * on actual encoded payloads. Inter-frame-compressed video (H.264…)
  * still needs an external binding behind the same seam.
  *
  * Scale notes: blobs ride through the scan as binary columns (parquet keeps
  * them out of dictionary encoding); decode is `mapPartitions`, so per-batch
  * library init (codec contexts, GPU handles) amortises across a partition —
  * the same shape a Pandas-UDF `mapInPandas` pipeline has in PySpark. Size
  * partitions by bytes (`spark.sql.files.maxPartitionBytes`), not rows,
  * when blobs dominate.
  */
object Multimodal {

  /** One media asset: the opaque payload + declared container format. */
  final case class MediaRow(media_id: Long, format: String, blob: Array[Byte])

  /** Decode output: typed metadata + a fixed-width feature vector. */
  final case class DecodedRow(
      media_id: Long, format: String, width: Int, height: Int,
      channels: Int, n_bytes: Long, features: Array[Float])

  /** One sampled frame of a (fake-)video asset. */
  final case class FrameRow(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** The codec seam: everything downstream (partition batching, schemas,
    * fan-out) is codec-agnostic. Four implementations ship — the
    * deterministic stub (default; the driver's synthetic payloads are not
    * real media, and the oracle checks its accounting) and three REAL
    * codecs: [[ImageIoCodec]] (images), [[WavCodec]] (WAV/PCM audio), and
    * [[AviMjpegCodec]] (MJPEG-AVI video). MultimodalSpec round-trips
    * generated PNGs/BMPs/WAVs/AVIs through the same `decodeAll` dataflow.
    */
  trait MediaCodec extends Serializable {
    def decode(format: String, blob: Array[Byte]): (Int, Int, Int)
    def features(blob: Array[Byte], dims: Int = 16): Array[Float]
  }

  /** THE STUB: deterministic pseudo-decode. The driver's synthetic blobs
    * are UTF-8 text, not media containers, so dimensions are derived from
    * the byte stream — deterministically, which is what lets DuckDB
    * oracle the accounting (x12/x36).
    */
  object StubCodec extends MediaCodec {
    def decode(format: String, blob: Array[Byte]): (Int, Int, Int) = {
      val n = blob.length
      val width = (n % 640) + 1
      val height = ((n * 7) % 480) + 1
      val channels = if (format == "png") 4 else 3
      (width, height, channels)
    }

    /** 16-bucket byte-mean "embedding" — real arithmetic over the payload
      * (only the pixel interpretation is fake).
      */
    def features(blob: Array[Byte], dims: Int = 16): Array[Float] = {
      if (blob.isEmpty) return Array.fill(dims)(0f)
      val out = new Array[Float](dims)
      val counts = new Array[Int](dims)
      var i = 0
      while (i < blob.length) {
        val b = i * dims / blob.length
        out(b) += (blob(i) & 0xff)
        counts(b) += 1
        i += 1
      }
      var d = 0
      while (d < dims) { if (counts(d) > 0) out(d) /= counts(d); d += 1 }
      out
    }
  }

  /** REAL image decode via the JDK's built-in ImageIO (PNG/JPEG/BMP/GIF —
    * no external libraries): true pixel dimensions and color components,
    * features = per-band mean luminance over `dims` horizontal bands.
    * This is the production shape for image columns; formats ImageIO
    * doesn't carry (video, audio) still need an external binding behind
    * the same [[MediaCodec]] seam.
    */
  object ImageIoCodec extends MediaCodec {
    private def read(blob: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      require(img != null, "payload is not a decodable image")
      img
    }

    def decode(format: String, blob: Array[Byte]): (Int, Int, Int) = {
      val img = read(blob)
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
    }

    def features(blob: Array[Byte], dims: Int = 16): Array[Float] = {
      val img = read(blob)
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](dims)
      val counts = new Array[Int](dims)
      var y = 0
      while (y < h) {
        val band = y * dims / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3f
          out(band) += lum
          counts(band) += 1
          x += 1
        }
        y += 1
      }
      var d = 0
      while (d < dims) { if (counts(d) > 0) out(d) /= counts(d); d += 1 }
      out
    }
  }

  /** REAL audio decode via the JDK's built-in javax.sound.sampled
    * (WAV/PCM — no external libraries), the second real modality behind
    * the [[MediaCodec]] seam. The (width, height, channels) triple carries
    * the audio metadata as (sample rate in Hz, frame count, channels) —
    * duration follows as frames / rate. Features = per-band RMS amplitude
    * over `dims` equal time bands of the normalized PCM signal (the audio
    * analogue of ImageIoCodec's per-band luminance): real signal
    * arithmetic, deterministic, and O(samples) in one pass.
    *
    * Supports the PCM encodings AudioSystem decodes without an external
    * SPI: signed/unsigned 8-bit and signed 16/24/32-bit, mono or
    * interleaved multi-channel, either endianness.
    */
  object WavCodec extends MediaCodec {
    private def open(blob: Array[Byte]) =
      // malformed audio is a data error (the MediaCodec contract), not a
      // checked-exception escape
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      catch {
        case e @ (_: javax.sound.sampled.UnsupportedAudioFileException |
            _: java.io.IOException) =>
          throw new IllegalArgumentException(
            s"malformed audio: ${e.getMessage}", e)
      }

    def decode(format: String, blob: Array[Byte]): (Int, Int, Int) = {
      val in = open(blob)
      try {
        val f = in.getFormat
        // frame length can exceed Int for multi-hour audio; the metadata
        // triple is Int-typed, so clamp (callers needing exactness read
        // n_bytes / frame size)
        val frames = math.min(in.getFrameLength, Int.MaxValue.toLong).toInt
        (f.getSampleRate.toInt, frames, f.getChannels)
      } finally in.close()
    }

    /** One normalized [-1, 1] sample per frame (channels averaged). */
    private[graft] def samples(blob: Array[Byte]): Array[Float] = {
      val in = open(blob)
      try {
        val f = in.getFormat
        val bytesPerSample = f.getSampleSizeInBits / 8
        require(bytesPerSample >= 1 && bytesPerSample <= 4,
          s"unsupported sample size: ${f.getSampleSizeInBits} bits")
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        require(signed || enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          s"unsupported encoding: $enc (PCM only)")
        // NOT readAllBytes: AudioInputStream.read returns 0 (not -1) when
        // the requested length is below one frame, and readAllBytes spins
        // forever on 0-returns — a hostile header with a huge frame size
        // (mutated channel count) is an infinite loop. Bound the payload
        // by the CONTAINER size, frame-aligned, and stop on r <= 0.
        val fs = f.getFrameSize
        require(fs >= 1 && fs <= blob.length,
          s"malformed audio: frame size $fs for a ${blob.length}-byte input")
        val cap = blob.length - (blob.length % fs)
        val raw0 = new Array[Byte](cap)
        var off = 0
        var r = 0
        while (off < cap && { r = in.read(raw0, off, cap - off); r > 0 }) off += r
        val raw = if (off == cap) raw0 else java.util.Arrays.copyOf(raw0, off)
        val nFrames = raw.length / fs
        val out = new Array[Float](nFrames)
        val full = (1L << (f.getSampleSizeInBits - 1)).toFloat
        var i = 0
        while (i < nFrames) {
          var ch = 0
          var acc = 0f
          while (ch < f.getChannels) {
            val base = i * f.getFrameSize + ch * bytesPerSample
            var v = 0L
            var b = 0
            while (b < bytesPerSample) {
              val idx = if (f.isBigEndian) base + b else base + (bytesPerSample - 1 - b)
              v = (v << 8) | (raw(idx) & 0xffL)
              b += 1
            }
            val bits = bytesPerSample * 8
            val s =
              if (signed) (v << (64 - bits)) >> (64 - bits) // sign-extend
              else v - (1L << (bits - 1)) // unsigned PCM centers at mid-scale
            acc += s / full
            ch += 1
          }
          out(i) = acc / f.getChannels
          i += 1
        }
        out
      } finally in.close()
    }

    def features(blob: Array[Byte], dims: Int = 16): Array[Float] = {
      val xs = samples(blob)
      val out = new Array[Float](dims)
      val counts = new Array[Int](dims)
      var i = 0
      while (i < xs.length) {
        val band = i * dims / xs.length
        out(band) += xs(i) * xs(i)
        counts(band) += 1
        i += 1
      }
      var d = 0
      while (d < dims) {
        if (counts(d) > 0) out(d) = math.sqrt(out(d) / counts(d)).toFloat
        d += 1
      }
      out
    }
  }

  /** REAL video decode for MJPEG-in-AVI via a pure-Scala RIFF container
    * parser + the JDK's ImageIO for the JPEG frames — the third real
    * modality behind the [[MediaCodec]] seam, no external libraries. AVI
    * is a RIFF file: little-endian FourCC chunks, an `hdrl` LIST whose
    * `avih` header carries frame dimensions, and a `movi` LIST whose
    * `00dc`/`01dc` chunks are the (JPEG, for MJPEG) frame payloads.
    * Inter-frame-compressed formats (H.264 etc.) genuinely need an
    * external binding; MJPEG is the standard intra-only profile this
    * dependency-free path can serve.
    *
    * decode → (width, height, frame count); features = per-frame mean
    * luminance of up to `dims` evenly-spaced DECODED frames (a temporal
    * luminance profile — real pixel arithmetic).
    */
  object AviMjpegCodec extends MediaCodec {

    /** Walk the RIFF tree: returns (width, height, frame payloads). */
    private[multimodal] def parse(blob: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
      val bb = java.nio.ByteBuffer.wrap(blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(bb.remaining >= 12 && fourcc() == "RIFF", "not a RIFF file")
      bb.getInt // riff size
      require(fourcc() == "AVI ", "not an AVI container")
      var width = 0; var height = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      // chunks: [fourcc][le32 size][payload, padded to even]; LIST chunks
      // nest — their payload starts with a list-type fourcc. Nesting depth
      // is bounded: a hostile blob of nothing but nested LISTs would
      // otherwise recurse once per 12 bytes and overflow the stack on a
      // megabyte input (real AVI nests 3-4 deep)
      def walk(end: Int, depth: Int): Unit = while (bb.position() + 8 <= end) {
        require(depth <= 64, "malformed RIFF: LIST nesting deeper than 64")
        val id = fourcc()
        val size = bb.getInt
        // size fields come from untrusted bytes: a negative or
        // past-the-buffer value must fail as a malformed-media error, not
        // surface as NegativeArraySizeException/OOM at the allocation
        require(size >= 0 && size <= bb.remaining,
          s"malformed RIFF: chunk '$id' declares $size bytes with ${bb.remaining} remaining")
        val next = bb.position() + size + (size & 1) // chunks pad to even
        if (id == "LIST" || id == "RIFF") {
          require(size >= 4, s"malformed RIFF: LIST chunk of $size bytes has no type")
          fourcc() // list type (hdrl / movi / strl…) — recurse through all
          walk(math.min(next, end), depth + 1)
        } else if (id == "avih") {
          require(size >= 40,
            s"malformed AVI: avih chunk of $size bytes (need >= 40 for dwWidth/dwHeight)")
          val base = bb.position()
          width = bb.getInt(base + 32)   // dwWidth / dwHeight offsets in
          height = bb.getInt(base + 36)  // the 56-byte main AVI header
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          // ##dc = compressed, ##db = uncompressed DIB frame chunk
          val f = new Array[Byte](size); bb.get(f); frames += f
        }
        bb.position(math.min(next, end))
      }
      walk(blob.length, 0)
      require(frames.nonEmpty, "AVI contains no frame chunks")
      (width, height, frames.toSeq)
    }

    def decode(format: String, blob: Array[Byte]): (Int, Int, Int) = {
      val (w, h, frames) = parse(blob)
      (w, h, frames.size)
    }

    def features(blob: Array[Byte], dims: Int = 16): Array[Float] = {
      val (_, _, frames) = parse(blob)
      val out = new Array[Float](dims)
      var d = 0
      while (d < dims) {
        // evenly-spaced frame per band (repeats frames when n < dims)
        val idx = d * frames.size / dims
        // a corrupt JPEG payload makes ImageIO THROW (IIOException on a
        // truncated stream), not just return null — both are data errors
        val img = try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(frames(idx)))
          catch {
            case e: java.io.IOException => throw new IllegalArgumentException(
              s"frame $idx is not a decodable image: ${e.getMessage}", e)
          }
        require(img != null, s"frame $idx is not a decodable image")
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        out(d) = (sum / (img.getWidth * img.getHeight)).toFloat
        d += 1
      }
      out
    }
  }

  /** REAL frame sampling over MJPEG-AVI payloads: every `stride`-th actual
    * JPEG frame from the container — the production counterpart of the
    * synthetic [[sampleFrames]] byte-slicer, same 1:N pipelined flatMap
    * shape (no shuffle), emitting decodable image bytes.
    */
  def sampleFramesAvi(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (_, _, frames) = AviMjpegCodec.parse(r.blob)
      (0 until frames.size by stride).map(i => FrameRow(r.media_id, i, frames(i)))
    }
  }

  /** Keyframe EXTRACTION for ISO-BMFF (MP4) — the container production
    * H.264/HEVC ships in: a per-partition walk of the `moov` sample tables
    * ([[Mp4]]) pulling every `stride`-th sync sample's COMPRESSED payload.
    * No decode happens here (inter-frame codecs need an external binding
    * behind [[MediaCodec]]; none exists in this environment) — but this is
    * the half a 100 TB pipeline runs fleet-wide: the cheap pure-JVM
    * keyframe pull that feeds only SELECTED frames to the expensive
    * (GPU/native) decode stage instead of whole videos. `frame_idx` is the
    * container's 1-based sample number so that stage can seek.
    */
  def sampleKeyframesMp4(media: Dataset[MediaRow], stride: Int = 1): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Mp4.sampleKeyframes(r.blob, stride).map { case (sampleNo, bytes) =>
        FrameRow(r.media_id, sampleNo, bytes) }
    }
  }

  /** Fake a media table from the documents table: UTF-8 payload bytes with a
    * round-robin container format. (Stands in for `spark.read.format
    * ("binaryFile")` or a parquet table with a binary column.)
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("webm")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("blob"))

  /** Partition-batched decode: one iterator pass per partition, codec init
    * amortised (a stateful codec would open its context once per
    * partition here). The codec is a parameter: the stub for the
    * synthetic/oracle path, [[ImageIoCodec]] (or an external binding) for
    * real media — the dataflow is identical.
    */
  def decodeAll(media: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a stateful codec context would be created here, once per partition
      rows.map { r =>
        val (w, h, c) = codec.decode(r.format, r.blob)
        DecodedRow(r.media_id, r.format, w, h, c, r.blob.length.toLong,
          codec.features(r.blob))
      }
    }
  }

  def toMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("format"), col("blob")).as[MediaRow]
  }

  /** Frame sampling for "video" rows: every `stride`-th 64-byte slice
    * becomes a frame — the 1:N fan-out shape of real frame extraction
    * (flatMap keeps it pipelined; no shuffle).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "webm").flatMap { r =>
      val frameSize = 64
      val n = math.max(r.blob.length / frameSize, 1)
      (0 until n by stride).map { i =>
        val from = i * frameSize
        FrameRow(r.media_id, i,
          r.blob.slice(from, math.min(from + frameSize, r.blob.length)))
      }
    }
  }

  /** Perceptual difference-hash (dHash) over a media blob — the standard
    * image near-duplicate signature (Krawetz's dHash: downsample to a
    * (gridW × gridH) luminance grid, emit one bit per horizontal
    * neighbour comparison). The grid samples the blob's bytes directly —
    * with a real decoder the same grid samples decoded luminance; the
    * dataflow and the 60-bit signature contract are identical, which is
    * the seam [[MediaCodec]] already established for decode.
    *
    * 60 bits ((gridW−1)·gridH = 10·6 by default) — deliberately the same
    * width as [[graft.operators.Dedup.simhashTable]]'s text signature, so
    * the hamming-banded pair search ([[graft.operators.Dedup
    * .simhashPairsOf]]: pigeonhole chunking, bucket join, exact hamming
    * verify) is REUSED unchanged: one signature table per modality, one
    * banding engine. Output columns (id, sh) are that contract.
    *
    * Per-row O(grid) work, no shuffle — at 100 TB this pipelines with the
    * scan like every per-row signature.
    *
    * ⚠ DOCUMENTED COUNTER-EXAMPLE, not the production default: at
    * maxDist 14 the 60-bit bands carry only ~7.5 effective key bits and
    * the measured candidate volume is a constant fraction of ALL pairs —
    * quadratic at any duplicate density (BASELINE.md §10×, round 8). Use
    * [[imageNearDupPairs]] (wide 120-bit signature) for real workloads;
    * this path is kept so MultimodalSpec can pin the volume gap.
    */
  def dhashTable(media: Dataset[MediaRow], gridW: Int = 11,
      gridH: Int = 6): DataFrame = {
    require((gridW - 1) * gridH <= 60,
      s"dHash needs (gridW-1)*gridH <= 60 bits, got ${(gridW - 1) * gridH}")
    import media.sparkSession.implicits._
    val n = gridW * gridH
    media.filter(_.blob.nonEmpty).map { r =>
      val len = r.blob.length
      // nearest-lower byte sampling: cell i reads byte (i*len) / n — the
      // integer-arithmetic downsample an oracle can replicate exactly
      val px = Array.tabulate(n)(i => r.blob(((i.toLong * len) / n).toInt) & 0xff)
      var h = 0L
      var row = 0
      while (row < gridH) {
        var c = 0
        while (c < gridW - 1) {
          h = (h << 1) | (if (px(row * gridW + c) > px(row * gridW + c + 1)) 1L else 0L)
          c += 1
        }
        row += 1
      }
      (r.media_id, h)
    }.toDF("id", "sh")
  }

  /** Wide (120-bit, two-long) dHash over an 11×12 luminance grid — the
    * production-scale signature for PERMISSIVE distance bounds. Same
    * construction as [[dhashTable]] (nearest-lower byte downsample, one
    * bit per horizontal neighbour comparison, MSB-first row-major fold),
    * but 12 grid rows instead of 6: rows 0-5 fold into `sh_hi`, rows
    * 6-11 into `sh_lo`, 60 bits each. Why: the 60-bit signature at
    * maxDist 14 leaves the pigeonhole bands ~7.5 effective key bits, and
    * the byte-sampled dHash bits are correlated enough that candidate
    * volume becomes a constant fraction of ALL pairs — quadratic at any
    * duplicate density (measured 26.9× on 10× constant-density data,
    * BASELINE.md round 8). Doubling signature width at the same absolute
    * bound doubles every band's key entropy; the pair search is
    * [[graft.operators.Dedup.simhashPairsOfWide]].
    *
    * Per-row O(grid) work, no shuffle — pipelines with the scan.
    */
  def dhashTableWide(media: Dataset[MediaRow], gridW: Int = 11,
      gridH: Int = 12): DataFrame = {
    val rowBits = gridW - 1
    require(rowBits * gridH > 60 && rowBits * gridH <= 120,
      s"wide dHash needs 60 < (gridW-1)*gridH <= 120 bits, got ${rowBits * gridH}")
    // rows land in sh_hi until it holds 60 bits, then in sh_lo
    val hiRows = 60 / rowBits
    import media.sparkSession.implicits._
    val n = gridW * gridH
    media.filter(_.blob.nonEmpty).map { r =>
      val len = r.blob.length
      val px = Array.tabulate(n)(i => r.blob(((i.toLong * len) / n).toInt) & 0xff)
      var hi = 0L; var lo = 0L
      var row = 0
      while (row < gridH) {
        var c = 0
        while (c < rowBits) {
          val bit = if (px(row * gridW + c) > px(row * gridW + c + 1)) 1L else 0L
          if (row < hiRows) hi = (hi << 1) | bit else lo = (lo << 1) | bit
          c += 1
        }
        row += 1
      }
      (r.media_id, hi, lo)
    }.toDF("id", "sh_hi", "sh_lo")
  }

  /** PRODUCTION image near-dup pair search — THE default entry point.
    * Routes through the wide 120-bit signature ([[dhashTableWide]] +
    * [[graft.operators.Dedup.simhashPairsOfWide]]): the round-8
    * constant-density 10× measurement showed the 60-bit path's candidate
    * volume is a constant fraction of ALL pairs (quadratic at any
    * duplicate density — 20.9× runtime on 10× data), while the wide
    * banding holds candidates to ~1.6% of pairs (5.3× on 10×,
    * BASELINE.md §10×). The narrow [[dhashTable]] /
    * `simhashPairsOf` combination remains ONLY as the documented
    * counter-example (MultimodalSpec pins the volume gap).
    *
    * Output: (id_a, id_b, hamming) with id_a < id_b, summed two-long
    * hamming ≤ maxDist. Exact for the 120-bit signature — the banding is
    * a candidate generator; every candidate is hamming-verified.
    */
  def imageNearDupPairs(media: Dataset[MediaRow], maxDist: Int = 14,
      maxBucket: Int = Int.MaxValue): DataFrame =
    graft.operators.Dedup.simhashPairsOfWide(
      graft.engine.CacheScope.persistTracked(dhashTableWide(media)),
      maxDist, maxBucket)

  /** Synthesize a structurally-REAL 16-bit PCM mono WAV (8 kHz) whose
    * samples are a pure integer function of the text bytes — the x102
    * device applied to audio: generation here, decode through the
    * independent javax.sound path ([[WavCodec]]), and an oracle/spec
    * that re-derives the signal from `ord()` arithmetic without touching
    * a BLOB. Sample j = ((byte(j mod len) − 128) << 7) — near-identical
    * texts produce near-identical waveforms, so the corpus's planted
    * near-dups survive into the audio modality.
    */
  def synthesizeWav(text: String): Array[Byte] = {
    val bytes = text.getBytes("UTF-8")
    require(bytes.nonEmpty, "synthesizeWav needs a nonempty payload")
    // the x187 DuckDB oracle re-derives these samples indexing the text
    // by CHARACTER (substr/ord); this side consumes UTF-8 BYTES — the
    // two agree only for ASCII. Fail loudly on a non-ASCII corpus
    // instead of silently desynchronizing generation from the oracle.
    require(bytes.length == text.length && text.forall(_ < 128),
      "synthesizeWav payload must be ASCII: the DuckDB oracle indexes " +
        "characters while this side indexes UTF-8 bytes")
    val n = 256 + (bytes.length % 256) * 8
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(8000); bb.putInt(8000 * 2) // rate, byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
    var j = 0
    while (j < n) {
      bb.putShort(((((bytes(j % bytes.length) & 0xff) - 128) << 7)).toShort)
      j += 1
    }
    bb.array()
  }

  /** Audio fingerprint — the dHash idea applied to the energy envelope:
    * decode to normalized samples (REAL javax.sound path), mean |s| over
    * `bands` equal time bands, one bit per band (energy above the
    * file's overall mean band energy). 120 bands fold into the SAME
    * two-long (sh_hi, sh_lo) contract as [[dhashTableWide]], so the
    * wide hamming-banded pair search is reused unchanged — one banding
    * engine across text, image, and audio. Per-row O(samples) work, no
    * shuffle; pipelines with the scan.
    */
  def audioFingerprintTable(media: Dataset[MediaRow],
      bands: Int = 120): DataFrame = {
    require(bands > 60 && bands <= 120,
      s"audio fingerprint needs 60 < bands <= 120, got $bands")
    import media.sparkSession.implicits._
    media.filter(_.blob.nonEmpty).map { r =>
      val s = WavCodec.samples(r.blob)
      val n = s.length
      val e = Array.tabulate(bands) { b =>
        val from = ((b.toLong * n) / bands).toInt
        val to = (((b + 1).toLong * n) / bands).toInt
        var acc = 0.0; var i = from
        while (i < to) { acc += math.abs(s(i)); i += 1 }
        if (to > from) acc / (to - from) else 0.0
      }
      val mean = e.sum / bands
      var hi = 0L; var lo = 0L
      var b = 0
      while (b < bands) {
        val bit = if (e(b) > mean) 1L else 0L
        if (b < 60) hi = (hi << 1) | bit else lo = (lo << 1) | bit
        b += 1
      }
      (r.media_id, hi, lo)
    }.toDF("id", "sh_hi", "sh_lo")
  }

  /** Audio near-dup pair search over the banded 120-bit fingerprint —
    * same production shape as [[imageNearDupPairs]]: banding generates
    * candidates, every candidate is hamming-verified exactly.
    */
  def audioNearDupPairs(media: Dataset[MediaRow], maxDist: Int = 12,
      maxBucket: Int = Int.MaxValue): DataFrame =
    graft.operators.Dedup.simhashPairsOfWide(
      graft.engine.CacheScope.persistTracked(audioFingerprintTable(media)),
      maxDist, maxBucket)

  /** "Resize": metadata-level transform (the pixel op is the stub's job);
    * keeps aspect ratio within a bounding box.
    */
  def resizeMeta(decoded: Dataset[DecodedRow], maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    decoded.toDF()
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** The full decode pipeline as a query (used by x12). */
  def decodePipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeAll(toMedia(mediaTable(documents))).toDF()
}
