package graft.multimodal

/** ISO-BMFF (MP4) container walker — the box format production H.264/HEVC
  * video ships in (reference treats media as out-of-band URLs only, e.g.
  * /root/reference/assets_generator.py handles no binary payloads; this is
  * part of the §2.C training-pipeline extension surface).
  *
  * What it does WITHOUT decoding: walks `moov/trak` to the video track's
  * sample tables and extracts
  *
  *  - codec fourcc + pixel dimensions (`stsd` sample entry),
  *  - the keyframe map (`stss` sync-sample numbers; absent ⇒ every sample
  *    is a sync point, per ISO 14496-12 §8.6.2),
  *  - per-sample byte ranges (`stsz` sizes × `stsc` sample→chunk runs ×
  *    `stco`/`co64` chunk offsets),
  *
  * and hands back the COMPRESSED keyframe payloads. Decoding inter-frame
  * codecs needs an external binding behind the [[Multimodal.MediaCodec]]
  * seam (none ships in this environment); extraction is the half a
  * 100 TB pipeline runs fleet-wide anyway — a pure-JVM, per-partition
  * keyframe-NAL pull feeding a downstream (GPU/native) decode stage, so
  * the expensive stage sees only the frames the sampler selected instead
  * of whole videos.
  *
  * All size/offset fields are untrusted input: every read is
  * bounds-checked and fails as IllegalArgumentException (malformed media),
  * never as a runtime array error — same contract as
  * [[Multimodal.AviMjpegCodec]]'s RIFF walker.
  */
object Mp4 {

  /** One keyframe: 1-based sample number + its byte range in the file. */
  final case class KeyframeSample(sample: Int, offset: Long, size: Int)

  /** The video track's extraction-relevant metadata. */
  final case class VideoTrack(codec: String, width: Int, height: Int,
      sampleCount: Int, keyframes: Seq[KeyframeSample])

  private final class Reader(blob: Array[Byte]) {
    def len: Long = blob.length.toLong
    private def checked(off: Long, n: Int): Int = {
      // off <= length - n (not off + n <= length): a hostile 64-bit offset
      // near Long.MaxValue would overflow off + n to a negative that
      // passes the naive comparison
      require(off >= 0 && n >= 0 && off <= blob.length.toLong - n,
        s"malformed MP4: read of $n bytes at $off past ${blob.length}")
      off.toInt
    }
    def u8(off: Long): Int = blob(checked(off, 1)) & 0xff
    def u16(off: Long): Int = (u8(off) << 8) | u8(off + 1)
    def u32(off: Long): Long = {
      val i = checked(off, 4)
      ((blob(i) & 0xffL) << 24) | ((blob(i + 1) & 0xffL) << 16) |
        ((blob(i + 2) & 0xffL) << 8) | (blob(i + 3) & 0xffL)
    }
    def u64(off: Long): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Long): String = {
      val i = checked(off, 4)
      new String(blob, i, 4, "US-ASCII")
    }
    def bytes(off: Long, n: Int): Array[Byte] = {
      val i = checked(off, n)
      java.util.Arrays.copyOfRange(blob, i, i + n)
    }
  }

  /** Box header: (type, payload start, payload end). Size 1 ⇒ 64-bit
    * largesize follows the type; size 0 ⇒ box extends to `end`.
    */
  private def walkBoxes(r: Reader, start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = r.u32(off)
      val typ = r.fourcc(off + 4)
      val (payload, boxEnd) = size32 match {
        case 0 => (off + 8, end) // to end of enclosing box
        case 1 =>
          val size64 = r.u64(off + 8)
          // size64 <= end - off (not off + size64 <= end): a hostile
          // largesize near Long.MaxValue overflows off + size64 negative
          // and would pass the naive bound
          require(size64 >= 16 && size64 <= end - off,
            s"malformed MP4: largesize $size64 in '$typ' past enclosing $end")
          (off + 16, off + size64)
        case s =>
          require(s >= 8 && s <= end - off,
            s"malformed MP4: box size $s in '$typ' past enclosing $end")
          (off + 8, off + s)
      }
      f(typ, payload, boxEnd)
      off = boxEnd
    }
  }

  private def findBox(r: Reader, start: Long, end: Long,
      typ: String): Option[(Long, Long)] = {
    var found: Option[(Long, Long)] = None
    walkBoxes(r, start, end) { (t, p, e) =>
      if (t == typ && found.isEmpty) found = Some((p, e))
    }
    found
  }

  private def path(r: Reader, start: Long, end: Long,
      types: Seq[String]): Option[(Long, Long)] =
    types.foldLeft(Option((start, end))) { case (acc, t) =>
      acc.flatMap { case (s, e) => findBox(r, s, e, t) }
    }

  /** Parse the FIRST video track ('vide' handler). */
  def parse(blob: Array[Byte]): VideoTrack = {
    val r = new Reader(blob)
    val (moovS, moovE) = findBox(r, 0, r.len, "moov")
      .getOrElse(throw new IllegalArgumentException("not an MP4: no moov box"))
    var track: Option[VideoTrack] = None
    walkBoxes(r, moovS, moovE) { (t, tS, tE) =>
      if (t == "trak" && track.isEmpty) {
        val isVideo = path(r, tS, tE, Seq("mdia", "hdlr")).exists {
          case (hS, _) => r.fourcc(hS + 8) == "vide" // version/flags + pre_defined
        }
        if (isVideo) track = Some(parseVideoTrak(r, tS, tE))
      }
    }
    track.getOrElse(throw new IllegalArgumentException(
      "MP4 contains no video track"))
  }

  private def parseVideoTrak(r: Reader, tS: Long, tE: Long): VideoTrack = {
    val (stblS, stblE) = path(r, tS, tE, Seq("mdia", "minf", "stbl"))
      .getOrElse(throw new IllegalArgumentException("malformed MP4: no stbl"))
    // stsd: first sample entry carries the codec fourcc and u16 dimensions
    // at fixed offsets (ISO 14496-12 §12.1.3 VisualSampleEntry)
    val (stsdS, stsdE) = findBox(r, stblS, stblE, "stsd")
      .getOrElse(throw new IllegalArgumentException("malformed MP4: no stsd"))
    // the fixed-offset VisualSampleEntry fields we read extend to
    // entry + 36; a shorter stsd would silently read the bytes of
    // whatever box follows
    require(stsdE - stsdS >= 8 + 36, "malformed MP4: stsd too short")
    val entryOff = stsdS + 8 // version/flags + entry_count, then first entry
    val codec = r.fourcc(entryOff + 4)
    val width = r.u16(entryOff + 32)
    val height = r.u16(entryOff + 34)

    def fullBox(typ: String): Option[(Long, Long)] =
      findBox(r, stblS, stblE, typ).map { case (s, e) => (s + 4, e) } // skip version/flags

    // stsz: sample_size (uniform when non-zero) + per-sample table
    val (stszS, stszE) = fullBox("stsz")
      .getOrElse(throw new IllegalArgumentException("malformed MP4: no stsz"))
    val uniformSize = r.u32(stszS)
    val sampleCount = r.u32(stszS + 4)
    require(sampleCount >= 0 && sampleCount <= Int.MaxValue &&
      (uniformSize != 0 || stszS + 8 + sampleCount * 4 <= stszE),
      s"malformed MP4: stsz declares $sampleCount samples beyond the box")
    // uniform-size path has no per-sample table to bound sampleCount, so a
    // hostile count up to Int.MaxValue would drive a multi-GB offsets
    // allocation before any offset is ever range-checked; the samples must
    // at least FIT in the blob (sampleCount <= len first: it keeps the
    // product under 2^63, so the second compare cannot overflow)
    require(uniformSize == 0 ||
      (sampleCount <= r.len && sampleCount * uniformSize <= r.len),
      s"malformed MP4: $sampleCount samples of $uniformSize bytes exceed " +
        s"the ${r.len}-byte input")
    val n = sampleCount.toInt
    def sampleSize(i: Int): Long = // 0-based
      if (uniformSize != 0) uniformSize else r.u32(stszS + 8 + i.toLong * 4)

    // stco/co64: chunk offsets
    val (chunkOffsets: IndexedSeq[Long]) = fullBox("stco") match {
      case Some((s, e)) =>
        val c = r.u32(s); require(s + 4 + c * 4 <= e, "malformed MP4: stco overflow")
        (0L until c).map(i => r.u32(s + 4 + i * 4))
      case None => fullBox("co64") match {
        case Some((s, e)) =>
          val c = r.u32(s); require(s + 4 + c * 8 <= e, "malformed MP4: co64 overflow")
          (0L until c).map(i => r.u64(s + 4 + i * 8))
        case None => throw new IllegalArgumentException("malformed MP4: no stco/co64")
      }
    }

    // stsc: (first_chunk, samples_per_chunk) runs → 0-based chunk index +
    // position-in-chunk per sample
    val (stscS, stscE) = fullBox("stsc")
      .getOrElse(throw new IllegalArgumentException("malformed MP4: no stsc"))
    val runCount = r.u32(stscS)
    require(stscS + 4 + runCount * 12 <= stscE, "malformed MP4: stsc overflow")
    val runs = (0L until runCount).map { i =>
      val base = stscS + 4 + i * 12
      (r.u32(base), r.u32(base + 4)) // (first_chunk 1-based, samples_per_chunk)
    }
    require(runs.nonEmpty && runs.head._1 == 1, "malformed MP4: stsc must start at chunk 1")

    // absolute byte offset per sample: walk chunks expanding the runs
    val offsets = new Array[Long](n)
    var sample = 0
    var chunk = 0 // 0-based
    var run = 0
    while (sample < n) {
      require(chunk < chunkOffsets.length,
        s"malformed MP4: sample ${sample + 1} has no chunk (of ${chunkOffsets.length})")
      while (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1) run += 1
      val inChunk = math.min(runs(run)._2, (n - sample).toLong)
      var pos = chunkOffsets(chunk)
      var j = 0L
      while (j < inChunk && sample < n) {
        offsets(sample) = pos
        pos += sampleSize(sample)
        sample += 1; j += 1
      }
      chunk += 1
    }

    // stss: sync (key) sample numbers, 1-based; absent ⇒ all samples sync
    val syncSamples: Seq[Int] = fullBox("stss") match {
      case Some((s, e)) =>
        val c = r.u32(s); require(s + 4 + c * 4 <= e, "malformed MP4: stss overflow")
        (0L until c).map(i => r.u32(s + 4 + i * 4).toInt)
      case None => (1 to n).toSeq
    }
    val keyframes = syncSamples.map { s1 =>
      require(s1 >= 1 && s1 <= n, s"malformed MP4: sync sample $s1 of $n")
      val sz = sampleSize(s1 - 1)
      require(sz <= Int.MaxValue, s"malformed MP4: sample $s1 size $sz")
      KeyframeSample(s1, offsets(s1 - 1), sz.toInt)
    }
    VideoTrack(codec, width, height, n, keyframes)
  }

  /** The compressed payload of one keyframe (bounds-checked). */
  def keyframeBytes(blob: Array[Byte], kf: KeyframeSample): Array[Byte] =
    new Reader(blob).bytes(kf.offset, kf.size)

  /** Parse + pull every `stride`-th keyframe's compressed payload. */
  def sampleKeyframes(blob: Array[Byte], stride: Int = 1): Seq[(Int, Array[Byte])] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val t = parse(blob)
    t.keyframes.zipWithIndex.collect { case (kf, i) if i % stride == 0 =>
      (kf.sample, keyframeBytes(blob, kf))
    }
  }

  // ---- deterministic synthesis (the x102 oracle gate) -------------------

  /** Build a structurally-real synthetic MP4 whose every parameter is
    * integer arithmetic over (docId, payload length) — so a SQL oracle can
    * predict the walker's output without parsing a byte:
    *
    *  - n_samples  = 1 + len % 7                       (1..7)
    *  - width      = 16·(1 + docId % 4), height = 16·(1 + docId % 3)
    *  - size(i)    = 8 + (docId + i) % 9, i 1-based    (8..16)
    *  - chunks     : samples 1..⌈n/2⌉ in chunk 1, the rest in chunk 2
    *                 (exercises real stsc run + stco offset math)
    *  - keyframes  : samples 1, 4, 7, … (every 3rd) in `stss`
    *  - mdat byte j (0-based, across samples in order) = payload[j % len]
    *
    * The boxes are the full ISO-BMFF shape [[parse]] walks: ftyp, mdat,
    * moov/trak/mdia(hdlr 'vide')/minf/stbl(stsd avc1 + stsz + stsc +
    * stco + stss). Generation and parsing are independent code paths over
    * the byte layout — the x102 gate breaks if EITHER drifts.
    */
  def synthesize(docId: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.nonEmpty, "synthesize needs a non-empty payload")
    def be32(v: Int): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
    def full(typ: String, body: Array[Byte]): Array[Byte] =
      box(typ, new Array[Byte](4) ++ body) // version 0, flags 0

    val len = payload.length
    val n = 1 + (len % 7)
    val width = 16 * (1 + (docId % 4)).toInt
    val height = 16 * (1 + (docId % 3)).toInt
    val sizes = (1 to n).map(i => (8 + ((docId + i) % 9)).toInt)
    val mdatBody = new Array[Byte](sizes.sum)
    var j = 0
    while (j < mdatBody.length) { mdatBody(j) = payload(j % len); j += 1 }

    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mdat = box("mdat", mdatBody)
    val mdatStart = ftyp.length + 8
    val c1 = (n + 1) / 2 // samples in chunk 1 (ceil)
    val chunk2Start = mdatStart + sizes.take(c1).sum
    // VisualSampleEntry: 8-byte entry header + 8 SampleEntry reserved +
    // 16 pre_defined, u16 width/height, then the remaining entry fields
    // (ISO 14496-12 §12.1.3)
    val avc1 = box("avc1",
      new Array[Byte](8 + 16) ++ be16(width) ++ be16(height) ++
        new Array[Byte](50))
    val stsd = full("stsd", be32(1) ++ avc1)
    val stsz = full("stsz",
      be32(0) ++ be32(n) ++ sizes.flatMap(be32).toArray)
    val stsc = full("stsc",
      if (n > c1)
        be32(2) ++ (be32(1) ++ be32(c1) ++ be32(1)) ++
          (be32(2) ++ be32(n - c1) ++ be32(1))
      else be32(1) ++ (be32(1) ++ be32(c1) ++ be32(1)))
    val stco = full("stco",
      if (n > c1) be32(2) ++ be32(mdatStart) ++ be32(chunk2Start)
      else be32(1) ++ be32(mdatStart))
    val kfSamples = (1 to n by 3).toSeq
    val stss = full("stss",
      be32(kfSamples.length) ++ kfSamples.flatMap(be32).toArray)
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
    val hdlr = full("hdlr",
      be32(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12))
    ftyp ++ mdat ++ box("moov",
      box("trak", box("mdia", hdlr ++ box("minf", stbl))))
  }
}
