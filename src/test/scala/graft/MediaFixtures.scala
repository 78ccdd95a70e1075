package graft

/** Shared REAL-codec media fixtures (round 16/17): tiny images encoded
  * through `javax.imageio`, MJPEG-style clips as concatenated stills,
  * and canonical PCM WAVs — used by MediaStreamSpec (batch ops) and
  * StreamOpsSpec (streaming gates). Builders return raw payload bytes;
  * specs wrap them into their own DataFrames.
  */
object MediaFixtures {
  def gradientImage(w: Int, h: Int, inverted: Boolean,
      seed: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 200 / w + y * 55 / h + seed) % 256
      val v = if (inverted) 255 - base else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** Checkerboard — structurally unlike any gradient (mixed-sign
    * block-mean gradients, where a gradient image's are monotone). */
  def checkerImage(w: Int, h: Int, cell: Int,
      phase: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if ((x / cell + y / cell + phase) % 2 == 0) 30 else 220
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def jpeg(img: java.awt.image.BufferedImage, q: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** MJPEG-style clip: whole still files concatenated. */
  def clip(frames: Seq[Array[Byte]]): Array[Byte] =
    frames.reduce(_ ++ _)

  /** Minimal valid ISO-BMFF wrapper (ftyp + mdat + moov) around still
    * frames: one `vide` track, `format` in stsd (e.g. "jpeg", "png ",
    * "avc1"), per-sample stsz sizes, `syncSamples` (1-based) as stss —
    * empty = no stss box (every sample is sync per ISO 14496-12
    * §8.6.2). `chunkSizes` splits the samples into chunks (empty = one
    * chunk with all; stsc entries are run-compressed as real muxers
    * write them); `wide` writes co64 64-bit chunk offsets instead of
    * stco. */
  def mp4Clip(frames: Seq[Array[Byte]], format: String = "jpeg",
      syncSamples: Seq[Int] = Nil, chunkSizes: Seq[Int] = Nil,
      wide: Boolean = false, emptyStss: Boolean = false,
      leadingFormats: Seq[String] = Nil): Array[Byte] = {
    def be32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def be64(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ tag.getBytes("US-ASCII") ++ payload
    require(format.length == 4, "stsd format must be 4 chars")
    val spc = if (chunkSizes.isEmpty) Seq(frames.length) else chunkSizes
    require(spc.sum == frames.length, "chunkSizes must cover all frames")
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.reduce(_ ++ _))
    val dataStart = ftyp.length + 8 // mdat payload's absolute offset
    // cumulative chunk offsets: chunk c starts where its first sample does
    val chunkOffs = spc.scanLeft(0)((acc, k) => acc + k).dropRight(1)
      .map(firstSample =>
        dataStart + frames.take(firstSample).map(_.length).sum)
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      (be32(16) ++ format.getBytes("US-ASCII") ++ new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    // run-compress stsc: one entry per run of equal samples-per-chunk
    val scEntries = spc.zipWithIndex
      .foldLeft(List.empty[(Int, Int)]) { case (acc, (k, c)) =>
        acc match {
          case (_, prevK) :: _ if prevK == k => acc
          case _ => (c + 1, k) :: acc
        }
      }.reverse
    val stsc = box("stsc", be32(0) ++ be32(scEntries.length) ++
      scEntries.flatMap { case (first, k) =>
        be32(first) ++ be32(k) ++ be32(1)
      }.toArray)
    val offsets = box(if (wide) "co64" else "stco",
      be32(0) ++ be32(chunkOffs.length) ++
        chunkOffs.flatMap(o =>
          if (wide) be64(o.toLong) else be32(o)).toArray)
    // emptyStss: an stss box PRESENT but declaring zero sync samples —
    // the "Some(empty)" degenerate the r19 refusal consistency spec pins
    val stss =
      if (emptyStss) box("stss", be32(0) ++ be32(0))
      else if (syncSamples.isEmpty) Array.emptyByteArray
      else box("stss", be32(0) ++ be32(syncSamples.length) ++
        syncSamples.flatMap(be32).toArray)
    val hdlr = box("hdlr",
      be32(0) ++ be32(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](12))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ offsets ++ stss)
    val mdia = box("mdia", hdlr ++ box("minf", stbl))
    // leadingFormats: minimal extra video traks (e.g. avc1) BEFORE the
    // still track — the two-track "H.264 first, jpeg second" shape
    val leading = leadingFormats.map { fmt =>
      val lstsd = box("stsd", be32(0) ++ be32(1) ++
        (be32(16) ++ fmt.getBytes("US-ASCII") ++ new Array[Byte](8)))
      box("trak", box("mdia", hdlr ++ box("minf", box("stbl", lstsd))))
    }.foldLeft(Array.emptyByteArray)(_ ++ _)
    val moov = box("moov", leading ++ box("trak", mdia))
    ftyp ++ mdat ++ moov
  }

  /** Patch the declared entry/sample COUNT of the first `tag` box
    * (e.g. "stsz" sample_count, "stss" entry_count) in an ISO-BMFF
    * payload — the lying-header fixtures for the over-bound refusal.
    * The count sits 8 bytes past the tag (ver/flags 4 + first field 4)
    * for stss, 12 past for stsz (ver/flags + uniform-size precede it);
    * pass the offset explicitly. */
  def patchBe32(payload: Array[Byte], tag: String, off: Int,
      value: Int): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val pos = payload.indices.find(i => i + 4 <= payload.length &&
      payload(i) == t(0) && payload(i + 1) == t(1) &&
      payload(i + 2) == t(2) && payload(i + 3) == t(3))
      .getOrElse(sys.error(s"tag $tag not found"))
    val out = payload.clone()
    val v = java.nio.ByteBuffer.allocate(4).putInt(value).array()
    System.arraycopy(v, 0, out, pos + 4 + off, 4)
    out
  }

  /** Minimal valid RIFF/AVI wrapper: one `vids` stream declared in
    * hdrl/strl/strh with `handler` (e.g. "MJPG", "H264", or NUL/space fill
    * for the blank-handler muxer case — then `strfComp` lands in
    * strf.biCompression), frames as 00dc chunks in the movi LIST. */
  def aviClip(frames: Seq[Array[Byte]], handler: String = "MJPG",
      strfComp: String = null,
      avixFrames: Seq[Array[Byte]] = Nil): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ data)
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++
        new Array[Byte](48))
    val strf =
      if (strfComp == null) Array.emptyByteArray
      else chunk("strf", new Array[Byte](16) ++
        strfComp.getBytes("US-ASCII") ++ new Array[Byte](4))
    val hdrl = list("hdrl", list("strl", strh ++ strf))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val primary = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    // OpenDML: extension frames land in a follow-on RIFF('AVIX')
    // container with its own movi LIST (how >1 GB AVIs are muxed)
    val avix =
      if (avixFrames.isEmpty) Array.emptyByteArray
      else {
        val xm = list("movi",
          avixFrames.map(f => chunk("00dc", f)).reduce(_ ++ _))
        val xbody = "AVIX".getBytes("US-ASCII") ++ xm
        "RIFF".getBytes("US-ASCII") ++ le32(xbody.length) ++ xbody
      }
    primary ++ avix
  }

  /** Multi-stream RIFF/AVI: one `strl` per (fccType, handler,
    * strfComp-or-null) in order — stream NUMBER = index — with `frames`
    * muxed as `NNdc` chunks of stream `frameStream`. The two-stream
    * "H.264 stream 0, MJPG stream 1" fixture shape. */
  def aviClipStreams(streams: Seq[(String, String, String)],
      frameStream: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ data)
    val strls = streams.map { case (typ, handler, strfComp) =>
      val strh = chunk("strh",
        typ.getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++
          new Array[Byte](48))
      val strf =
        if (strfComp == null) Array.emptyByteArray
        else chunk("strf", new Array[Byte](16) ++
          strfComp.getBytes("US-ASCII") ++ new Array[Byte](4))
      list("strl", strh ++ strf)
    }.reduce(_ ++ _)
    val sid = f"$frameStream%02d"
    val movi = list("movi",
      frames.map(f => chunk(s"${sid}dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ list("hdrl", strls) ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Canonical PCM WAV. samples are 16-bit mono values; bits=8 writes
    * the same waveform as unsigned 8-bit (>> 8, +128); bits=24 as the
    * exact << 8 upscale (3-byte LE) — so one waveform can be carried at
    * any depth and must fingerprint identically; channels=2 duplicates
    * the mono channel; `rate` lands in the fmt chunk (resample
    * fixtures). `extensible` muxes the SAME stream behind a
    * WAVE_FORMAT_EXTENSIBLE (0xFFFE) header whose SubFormat GUID is PCM
    * when `pcmGuid` (the pro-audio/multichannel muxer habit) or a bogus
    * GUID otherwise (must refuse). */
  def wav(samples: Array[Int], bits: Int, channels: Int,
      rate: Int = 16000, extensible: Boolean = false,
      pcmGuid: Boolean = true): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer * channels
    val fmtLen = if (extensible) 40 else 16
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); le32(20 + fmtLen + dataLen)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(fmtLen)
    le16(if (extensible) 0xFFFE else 1); le16(channels)
    le32(rate); le32(rate * bytesPer * channels); le16(bytesPer * channels)
    le16(bits)
    if (extensible) {
      le16(22) // cbSize
      le16(bits) // wValidBitsPerSample
      le32(0) // dwChannelMask
      val guid =
        if (pcmGuid) Array(0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10,
          0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71)
        else Array(0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10,
          0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71) // float
      guid.foreach(b => bos.write(b & 0xFF))
    }
    bos.write("data".getBytes); le32(dataLen)
    for (s <- samples; _ <- 0 until channels) {
      if (bits == 16) le16(s & 0xFFFF)
      else if (bits == 24) {
        val v = s << 8
        bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
        bos.write((v >> 16) & 0xFF)
      }
      else bos.write(((s >> 8) + 128) & 0xFF)
    }
    bos.toByteArray
  }

  /** Animated GIF via the JDK's own sequence writer: same-sized
    * opaque frames → full-screen descriptors at (0,0) with no
    * transparency, i.e. exactly the self-contained shape
    * [[graft.ops.MultimodalOps.gifSplit]] accepts. Use 2-color
    * checker frames when exact hash equality with a PNG twin matters
    * (a 256-color palette represents them losslessly). */
  def gifAnim(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { img =>
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** One EBML element: raw id bytes + a 1-byte size varint + content
    * (enough for hand-built Matroska census fixtures). */
  def ebmlEl(idBytes: Array[Int], content: Array[Byte]): Array[Byte] = {
    require(content.length < 127, "1-byte size varint fixture only")
    idBytes.map(_.toByte) ++ Array((0x80 | content.length).toByte) ++ content
  }

  /** FORM/AIFF (or AIFC when `comp` is given) fixture — the big-endian
    * mirror of [[wav]]: COMM carries channels / frame count / bits /
    * an 80-bit extended sample rate; SSND carries interleaved
    * big-endian signed PCM. `samples` are on the signed 16-bit scale
    * like [[wav]]'s, so the SAME array containered both ways must
    * fingerprint identically (the r20 acceptance-widening pin). */
  def aiff(samples: Array[Int], bits: Int, channels: Int,
      rate: Int = 16000, comp: String = ""): Array[Byte] = {
    val aifc = comp.nonEmpty
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer * channels
    val commLen = if (aifc) 24 else 18 // + compressionType + empty pstring
    val ssndLen = 8 + dataLen
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xFFFF); be16(v & 0xFFFF) }
    bos.write("FORM".getBytes)
    be32(4 + 8 + commLen + 8 + ssndLen + (ssndLen & 1))
    bos.write((if (aifc) "AIFC" else "AIFF").getBytes)
    bos.write("COMM".getBytes); be32(commLen)
    be16(channels); be32(samples.length); be16(bits)
    // 80-bit extended float: normalized mantissa, exp = 16383 + msb
    val msb = 31 - Integer.numberOfLeadingZeros(rate)
    be16(16383 + msb)
    var mant = rate.toLong << (63 - msb)
    for (k <- 7 to 0 by -1) bos.write(((mant >>> (8 * k)) & 0xFF).toInt)
    if (aifc) { bos.write(comp.getBytes); bos.write(0); bos.write(0) }
    bos.write("SSND".getBytes); be32(ssndLen); be32(0); be32(0)
    for (s <- samples; _ <- 0 until channels) {
      if (bits == 16) be16(s & 0xFFFF)
      else if (bits == 24) {
        val v = s << 8
        bos.write((v >> 16) & 0xFF); bos.write((v >> 8) & 0xFF)
        bos.write(v & 0xFF)
      }
      else bos.write((s >> 8) & 0xFF) // SIGNED 8-bit (AIFF, unlike WAV)
    }
    if ((ssndLen & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** G.711 µ-law compress (the standard reference formula) — the
    * fixture side of [[graft.ops.MultimodalOps.mulawToLinear]]. */
  def linearToMulaw(s0: Int): Byte = {
    var s = s0
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (s >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** Sun AU (".snd") fixture: 24-byte big-endian header + samples in
    * `enc` (1 = µ-law, 2/3/4 = signed linear 8/16/24 BE, 27 = A-law
    * via raw bytes — pass pre-companded samples for 27). `samples` are
    * on the signed 16-bit scale like [[wav]]'s. */
  def au(samples: Array[Int], enc: Int, channels: Int,
      rate: Int = 16000): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xFFFF); be16(v & 0xFFFF) }
    val bytesPer = enc match {
      case 1 | 2 | 27 => 1; case 3 => 2; case 4 => 3
      case other => sys.error(s"fixture: unsupported AU encoding $other")
    }
    bos.write(".snd".getBytes)
    be32(24); be32(samples.length * bytesPer * channels)
    be32(enc); be32(rate); be32(channels)
    for (s <- samples; _ <- 0 until channels) enc match {
      case 1 => bos.write(linearToMulaw(s) & 0xFF)
      case 27 => bos.write(s & 0xFF) // raw pre-companded byte
      case 2 => bos.write((s >> 8) & 0xFF)
      case 3 => be16(s & 0xFFFF)
      case 4 =>
        val v = s << 8
        bos.write((v >> 16) & 0xFF); bos.write((v >> 8) & 0xFF)
        bos.write(v & 0xFF)
    }
    bos.toByteArray
  }

  /** Sine with a per-segment amplitude envelope: a strong, unambiguous
    * energy contour (segment s at amplitude env(s)·A). Distinct
    * `freq`s give genuinely distinct material — same-pitch fixtures are
    * phase-locked at segment starts (period 400 divides segLen 800). */
  def melody(env: Seq[Int], ampl: Double = 8000.0,
      segLen: Int = 800, freq: Double = 440.0): Array[Int] = {
    val out = new Array[Int](env.length * segLen)
    for (s <- env.indices; i <- 0 until segLen) {
      val a = ampl * env(s) / env.max
      out(s * segLen + i) =
        (a * math.sin(2 * math.Pi * freq * (s * segLen + i) / 16000.0)).toInt
    }
    out
  }
}
