package graft

import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

/** Video keyframe + audio fingerprint dedup (round 16): REAL decode on
  * both paths — MJPEG-style clips split into true still frames decoded
  * via javax.imageio, WAV parsed down to PCM — with planted re-encoded
  * fixtures that must collapse and distinct material that must not.
  */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  // ---- fixtures: real encoded frames and PCM ----

  private def gradientImage(w: Int, h: Int, inverted: Boolean,
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

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(img: java.awt.image.BufferedImage, q: Float): Array[Byte] = {
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

  private def clip(frames: Seq[Array[Byte]]): Array[Byte] =
    frames.reduce(_ ++ _)

  /** Canonical 44-byte-header PCM WAV. samples are 16-bit mono values;
    * bits=8 writes the same waveform as unsigned 8-bit (>> 8, +128);
    * channels=2 duplicates the mono channel. */
  private def wav(samples: Array[Int], bits: Int, channels: Int): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer * channels
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); le32(36 + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(channels)
    le32(16000); le32(16000 * bytesPer * channels); le16(bytesPer * channels)
    le16(bits)
    bos.write("data".getBytes); le32(dataLen)
    for (s <- samples; _ <- 0 until channels) {
      if (bits == 16) le16(s & 0xFFFF)
      else bos.write(((s >> 8) + 128) & 0xFF)
    }
    bos.toByteArray
  }

  /** Sine with a per-segment amplitude envelope: a strong, unambiguous
    * energy contour (segment s at amplitude env(s)·A). */
  private def melody(env: Seq[Int], ampl: Double = 8000.0,
      segLen: Int = 800): Array[Int] = {
    val out = new Array[Int](env.length * segLen)
    for (s <- env.indices; i <- 0 until segLen) {
      val a = ampl * env(s) / env.max
      out(s * segLen + i) =
        (a * math.sin(2 * math.Pi * 440 * (s * segLen + i) / 16000.0)).toInt
    }
    out
  }

  private def mediaDf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))

  // ---- video ----

  test("splitKeyframes recovers each concatenated still frame intact") {
    val f = Seq(png(gradientImage(32, 24, false, 0)),
      jpeg(gradientImage(32, 24, false, 40), 0.9f),
      png(gradientImage(32, 24, true, 0)))
    val media = mediaDf(1L -> clip(f))
    val frames = MultimodalOps.splitKeyframes(media)
      .orderBy("frame_idx").collect()
    assert(frames.length == 3)
    frames.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == i)
      assert(r.getAs[Array[Byte]]("media").toSeq == f(i).toSeq,
        s"frame $i bytes differ")
    }
    // every recovered frame REALLY decodes
    val lum = MultimodalOps.decodeLuminanceGrid(
      MultimodalOps.splitKeyframes(media)
        .select(col("frame_idx").as("doc_id"), col("media")), grid = 4)
    assert(lum.count() == 3)
  }

  test("re-encoded clip collapses through videoDedup; different clip survives") {
    val imgs = Seq(gradientImage(64, 48, false, 0),
      gradientImage(64, 48, false, 97), gradientImage(64, 48, false, 181))
    val clipPng = clip(imgs.map(png))
    // the production miss exact-dedup can never catch: the SAME
    // pictures re-encoded lossily (JPEG 0.9) — every byte differs
    val clipJpeg = clip(imgs.map(jpeg(_, 0.9f)))
    val clipOther = clip(Seq(
      png(gradientImage(64, 48, true, 0)), png(gradientImage(64, 48, true, 97)),
      png(gradientImage(64, 48, true, 181))))
    val media = mediaDf(1L -> clipPng, 2L -> clipJpeg, 3L -> clipOther)
    assert(MultimodalOps.mediaDupGroups(media).count() == 0,
      "byte digest must be blind here or the test is vacuous")
    val pairs = MultimodalOps.videoNearDupPairs(media, grid = 5,
      maxHamming = 3, minMatchFrac = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getLong(2) == 3L, s"all 3 frames should match: ${pairs.head}")
    val kept = MultimodalOps.videoDedup(media, grid = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("a repeated still frame earns one match credit, not quadratic credit") {
    val still = png(gradientImage(48, 32, false, 0))
    val media = mediaDf(
      1L -> clip(Seq.fill(6)(still)), // slideshow of one still
      2L -> clip(Seq(still, png(gradientImage(48, 32, true, 0)))))
    val pairs = MultimodalOps.videoNearDupPairs(media, grid = 5,
      maxHamming = 0, minMatchFrac = 0.4).collect()
    // clip 2 has 2 frames; 1 matches -> frac 0.5; n_matching counts
    // distinct frames of the SMALLER-id side that found a match (6 of
    // clip 1's frames each match once -> 6 distinct fa), never 6×1
    // cross products per frame
    assert(pairs.length == 1 && pairs.head.getLong(2) <= 6)
    assert(pairs.head.getDouble(3) >= 0.4)
  }

  // ---- audio ----

  test("audio fingerprint is volume- and bit-depth-invariant; stereo folds to mono") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val base = wav(m, 16, 1)
    val quiet = wav(m.map(_ / 2), 16, 1) // half volume
    val eightBit = wav(m, 8, 1) // re-encode at 8-bit depth
    val stereo = wav(m, 16, 2)
    val other = wav(melody(Seq(9, 1, 8, 2, 7, 3, 6, 4)), 16, 1)
    val media = mediaDf(1L -> base, 2L -> quiet, 3L -> eightBit,
      4L -> stereo, 5L -> other)
    val fp = MultimodalOps.audioFingerprint(media, windows = 33)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fp.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(1)._2 == fp(0)._2, "half volume must not move the contour")
    assert(fp(3)._2 == fp(0)._2, "duplicated-channel stereo == mono")
    assert(ham(fp(2)._2, fp(0)._2) <= 3, "8-bit re-encode within tolerance")
    assert(ham(fp(4)._2, fp(0)._2) > 8, "different melody stays distinct")
    val kept = MultimodalOps.audioDedup(media, windows = 33, maxHamming = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L))
  }

  test("compressed or truncated audio REFUSES loudly; non-WAV payloads flow through silently") {
    val m = melody(Seq(1, 2, 3, 4))
    val good = wav(m, 16, 1)
    // format code 2 (ADPCM): flip the fmt code bytes (offset 20)
    val adpcm = good.clone(); adpcm(20) = 2
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(mediaDf(1L -> adpcm)).collect()
    }
    assert(e.getMessage.contains("PCM") || e.getCause != null)
    // a text payload in the same table is just skipped (mixed media)
    val mixed = mediaDf(1L -> good, 2L -> "not audio".getBytes)
    assert(MultimodalOps.audioFingerprint(mixed).count() == 1)
  }
}
