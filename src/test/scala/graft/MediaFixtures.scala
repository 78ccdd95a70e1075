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
    * "avc1"), one chunk holding all samples, per-sample stsz sizes,
    * `syncSamples` (1-based) as stss — empty = no stss box (every
    * sample is sync per ISO 14496-12 §8.6.2). */
  def mp4Clip(frames: Seq[Array[Byte]], format: String = "jpeg",
      syncSamples: Seq[Int] = Nil): Array[Byte] = {
    def be32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ tag.getBytes("US-ASCII") ++ payload
    require(format.length == 4, "stsd format must be 4 chars")
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.reduce(_ ++ _))
    val dataStart = ftyp.length + 8 // mdat payload's absolute offset
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      (be32(16) ++ format.getBytes("US-ASCII") ++ new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    val stsc = box("stsc",
      be32(0) ++ be32(1) ++ be32(1) ++ be32(frames.length) ++ be32(1))
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(dataStart))
    val stss =
      if (syncSamples.isEmpty) Array.emptyByteArray
      else box("stss", be32(0) ++ be32(syncSamples.length) ++
        syncSamples.flatMap(be32).toArray)
    val hdlr = box("hdlr",
      be32(0) ++ be32(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](12))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
    val mdia = box("mdia", hdlr ++ box("minf", stbl))
    val moov = box("moov", box("trak", mdia))
    ftyp ++ mdat ++ moov
  }

  /** Canonical 44-byte-header PCM WAV. samples are 16-bit mono values;
    * bits=8 writes the same waveform as unsigned 8-bit (>> 8, +128);
    * channels=2 duplicates the mono channel; `rate` lands in the fmt
    * chunk (resample fixtures). */
  def wav(samples: Array[Int], bits: Int, channels: Int,
      rate: Int = 16000): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer * channels
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); le32(36 + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(channels)
    le32(rate); le32(rate * bytesPer * channels); le16(bytesPer * channels)
    le16(bits)
    bos.write("data".getBytes); le32(dataLen)
    for (s <- samples; _ <- 0 until channels) {
      if (bits == 16) le16(s & 0xFFFF)
      else bos.write(((s >> 8) + 128) & 0xFF)
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
