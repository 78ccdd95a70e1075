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
  import MediaFixtures._

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
    // clip 2 is the smaller side (2 frames); exactly 1 of its frames
    // finds a match -> n_matching = 1 (distinct matched frames of the
    // SMALLER side, never the 6 cross-product credits of clip 1's
    // repeats), frac = 1/2
    assert(pairs.length == 1 && pairs.head.getLong(2) == 1L)
    assert(pairs.head.getDouble(3) == 0.5)
  }

  test("match_frac is coverage of the smaller clip, capped at 1.0") {
    val still = png(gradientImage(48, 32, false, 0))
    // the LOWER-id clip is the LARGER one: the old fa-only credit gave
    // 6 matches / least(6, 1) = frac 6.0 here — over-merge territory
    val media = mediaDf(
      1L -> clip(Seq.fill(6)(still)),
      2L -> clip(Seq(still)))
    val pairs = MultimodalOps.videoNearDupPairs(media, grid = 5,
      maxHamming = 0, minMatchFrac = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(2) == 1L, s"smaller side has 1 frame: ${pairs.head}")
    assert(pairs.head.getDouble(3) == 1.0)
  }

  test("a real video container REFUSES loudly instead of yielding zero frames") {
    def box(tag: String): Array[Byte] =
      Array[Byte](0, 0, 0, 24) ++ tag.getBytes("US-ASCII") ++
        "isom".getBytes("US-ASCII") ++ new Array[Byte](12)
    val mp4 = box("ftyp")
    val ebml = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
      new Array[Byte](16)
    val avi = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 0, 0) ++
      "AVI ".getBytes("US-ASCII") ++ new Array[Byte](16)
    for ((name, payload) <- Seq("mp4" -> mp4, "ebml" -> ebml, "avi" -> avi)) {
      val e = intercept[org.apache.spark.SparkException] {
        MultimodalOps.splitKeyframes(mediaDf(1L -> payload)).collect()
      }
      assert(e.getMessage.contains("container") ||
        (e.getCause != null && e.getCause.getMessage.contains("container")),
        s"$name payload must refuse with the container message")
    }
    // genuinely unknown payloads still flow through silently (mixed
    // media tables carry text/audio rows past the video ops)
    assert(MultimodalOps.splitKeyframes(
      mediaDf(1L -> "not a clip at all".getBytes)).count() == 0)
    // and a WAV is NOT a video container (RIFF/WAVE != RIFF/AVI)
    assert(MultimodalOps.splitKeyframes(
      mediaDf(1L -> wav(melody(Seq(1, 2)), 16, 1))).count() == 0)
  }

  test("PNG frames split at IEND, not at false magics inside IDAT") {
    // hand-built PNG whose IDAT bytes CONTAIN a JPEG SOI `FF D8 FF` —
    // the byte coincidence any ~1 MB zlib stream hits at percent-level
    // odds; the r17 magic scan truncated the frame there and the decode
    // refusal killed the job. The splitter walks chunk lengths, so the
    // false magic is invisible.
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      len ++ tag.getBytes("US-ASCII") ++ data ++ Array[Byte](0, 0, 0, 0)
    }
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val idat = Array(0x01, 0xFF, 0xD8, 0xFF, 0xE0, 0x02, 0x89, 0x50)
      .map(_.toByte) // a fake SOI AND a fake PNG-sig prefix
    val fakePng = sig ++ chunk("IHDR", new Array[Byte](13)) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
    val realJpeg = jpeg(gradientImage(32, 24, false, 7), 0.9f)
    val frames = MultimodalOps.splitKeyframes(
        mediaDf(1L -> (fakePng ++ realJpeg)))
      .orderBy("frame_idx").collect()
    assert(frames.length == 2, s"false IDAT magics split the clip: ${frames.length} frames")
    assert(frames(0).getAs[Array[Byte]]("media").toSeq == fakePng.toSeq)
    assert(frames(1).getAs[Array[Byte]]("media").toSeq == realJpeg.toSeq)
  }

  test("JPEG frames split at EOI, skipping EXIF-thumbnail APP segments") {
    // a camera-style JPEG: APP1 body carries a COMPLETE nested JPEG
    // thumbnail (a real SOI — the r17 magic scan false-split on every
    // such file). Build: outer imageio JPEG with an APP1 segment
    // spliced in right after SOI.
    val outer = jpeg(gradientImage(64, 48, false, 3), 0.9f)
    val thumb = jpeg(gradientImage(8, 6, false, 3), 0.5f)
    val app1Body = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ thumb
    val app1Len = app1Body.length + 2
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      ((app1Len >> 8) & 0xFF).toByte, (app1Len & 0xFF).toByte) ++ app1Body
    val withThumb = outer.take(2) ++ app1 ++ outer.drop(2)
    val other = png(gradientImage(32, 24, true, 5))
    val frames = MultimodalOps.splitKeyframes(
        mediaDf(1L -> (withThumb ++ other)))
      .orderBy("frame_idx").collect()
    assert(frames.length == 2,
      s"the EXIF thumbnail SOI split the frame: ${frames.length} frames")
    assert(frames(0).getAs[Array[Byte]]("media").toSeq == withThumb.toSeq)
    assert(frames(1).getAs[Array[Byte]]("media").toSeq == other.toSeq)
  }

  test("progressive JPEGs (multiple SOS scans) walk to their true EOI") {
    // progressive encoding emits ~10 SOS segments with entropy data
    // between them — the jpegEnd walk must chain scan after scan to
    // the real EOI, not stop at the first
    def progressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        wr.setOutput(ios)
        val p = wr.getDefaultWriteParam
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { wr.dispose(); ios.close() }
      bos.toByteArray
    }
    val f = Seq(progressive(gradientImage(64, 48, false, 2)),
      progressive(gradientImage(64, 48, true, 2)),
      jpeg(gradientImage(64, 48, false, 9), 0.9f))
    val sosCount = f.head.sliding(2).count(w =>
      w(0) == 0xFF.toByte && w(1) == 0xDA.toByte)
    assert(sosCount > 1, s"fixture not progressive: $sosCount SOS")
    val frames = MultimodalOps.splitKeyframes(mediaDf(1L -> clip(f)))
      .orderBy("frame_idx").collect()
    assert(frames.length == 3)
    f.indices.foreach { i =>
      assert(frames(i).getAs[Array[Byte]]("media").toSeq == f(i).toSeq,
        s"frame $i bytes differ")
    }
  }

  test("a frame magic at offset 0 beats the container sniff; corrupt frames fall back to magic-scan extent") {
    // SOI at 0 whose APP0 'length' bytes happen to spell "ft" and the
    // next four bytes "ftyp" sit exactly at offsets 4-7: the container
    // sniff alone would refuse a legitimate (if odd) still payload —
    // the magic-at-0 carve-out mirrors the RIFF/WAVE one
    val oddJpeg = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      "ftyp".getBytes("US-ASCII") ++ new Array[Byte](16)
    val frames = MultimodalOps.splitKeyframes(mediaDf(1L -> oddJpeg))
      .collect()
    // structural walk fails (declared APP0 length runs past the end):
    // best-effort magic-scan fallback yields ONE frame to payload end
    assert(frames.length == 1)
    assert(frames.head.getAs[Array[Byte]]("media").length == oddJpeg.length)
    // a genuine bare MP4 still refuses (no magic at 0)
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(1L ->
        (Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII") ++
          new Array[Byte](12)))).collect()
    }
  }

  test("ISO-BMFF still-codec tracks split byte-exactly via the sample tables; real codecs still refuse") {
    val f = Seq(jpeg(gradientImage(32, 24, false, 0), 0.9f),
      jpeg(gradientImage(32, 24, false, 97), 0.9f),
      jpeg(gradientImage(32, 24, true, 0), 0.9f))
    // stss [1, 3]: samples 1 and 3 are sync -> exactly those two frames
    val mp4 = mp4Clip(f, "jpeg", syncSamples = Seq(1, 3))
    val frames = MultimodalOps.splitKeyframes(mediaDf(1L -> mp4))
      .orderBy("frame_idx").collect()
    assert(frames.length == 2)
    assert(frames(0).getAs[Array[Byte]]("media").toSeq == f(0).toSeq)
    assert(frames(1).getAs[Array[Byte]]("media").toSeq == f(2).toSeq)
    // no stss box: every sample is a sync sample (ISO 14496-12 §8.6.2)
    val all = MultimodalOps.splitKeyframes(
      mediaDf(2L -> mp4Clip(f, "jpeg"))).orderBy("frame_idx").collect()
    assert(all.length == 3 &&
      all(1).getAs[Array[Byte]]("media").toSeq == f(1).toSeq)
    // PNG-in-MP4 (Apple 'png ') works through the same tables
    val pf = Seq(png(gradientImage(16, 12, false, 1)),
      png(gradientImage(16, 12, true, 1)))
    val pngFrames = MultimodalOps.splitKeyframes(
      mediaDf(3L -> mp4Clip(pf, "png "))).orderBy("frame_idx").collect()
    assert(pngFrames.length == 2 &&
      pngFrames(0).getAs[Array[Byte]]("media").toSeq == pf(0).toSeq)
    // an inter-frame codec (H.264) still refuses loudly — its keyframes
    // need a real decoder
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(
        mediaDf(4L -> mp4Clip(f, "avc1"))).collect()
    }
    assert(e.getMessage.contains("still-image") ||
      (e.getCause != null && e.getCause.getMessage.contains("still-image")))
  }

  test("MP4 sample tables: multi-chunk stsc runs and co64 offsets resolve byte-exactly") {
    val f = Seq(jpeg(gradientImage(24, 16, false, 1), 0.9f),
      jpeg(gradientImage(24, 16, false, 31), 0.9f),
      jpeg(gradientImage(24, 16, true, 1), 0.9f),
      jpeg(gradientImage(24, 16, true, 31), 0.9f),
      jpeg(gradientImage(24, 16, false, 61), 0.9f))
    // chunks [2, 2, 1]: stsc run-compresses to two entries
    // (first_chunk 1 spc 2; first_chunk 3 spc 1) — the run walk the
    // single-chunk fixture never exercised
    for (wide <- Seq(false, true)) {
      val frames = MultimodalOps.splitKeyframes(mediaDf(
          1L -> mp4Clip(f, "jpeg", chunkSizes = Seq(2, 2, 1), wide = wide)))
        .orderBy("frame_idx").collect()
      assert(frames.length == 5, s"wide=$wide: ${frames.length} frames")
      f.indices.foreach { i =>
        assert(frames(i).getAs[Array[Byte]]("media").toSeq == f(i).toSeq,
          s"wide=$wide frame $i bytes differ")
      }
    }
    // stss over a multi-chunk layout: samples 2 and 5 live in
    // different chunks
    val sync = MultimodalOps.splitKeyframes(mediaDf(
        2L -> mp4Clip(f, "jpeg", syncSamples = Seq(2, 5),
          chunkSizes = Seq(2, 2, 1))))
      .orderBy("frame_idx").collect()
    assert(sync.length == 2)
    assert(sync(0).getAs[Array[Byte]]("media").toSeq == f(1).toSeq)
    assert(sync(1).getAs[Array[Byte]]("media").toSeq == f(4).toSeq)
  }

  test("MJPEG-AVI splits via the movi chunks; inter-frame AVI codecs still refuse") {
    val f = Seq(jpeg(gradientImage(32, 24, false, 11), 0.9f),
      jpeg(gradientImage(32, 24, false, 53), 0.9f),
      jpeg(gradientImage(32, 24, true, 11), 0.9f))
    val frames = MultimodalOps.splitKeyframes(
        mediaDf(1L -> aviClip(f, "MJPG")))
      .orderBy("frame_idx").collect()
    assert(frames.length == 3)
    f.indices.foreach { i =>
      assert(frames(i).getAs[Array[Byte]]("media").toSeq == f(i).toSeq,
        s"frame $i bytes differ")
    }
    // blank handler word (common muxer habit): strf.biCompression decides
    val blank = MultimodalOps.splitKeyframes(
      mediaDf(2L -> aviClip(f, "    ", strfComp = "MJPG")))
    assert(blank.count() == 3)
    // a real inter-frame codec refuses loudly
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(
        mediaDf(3L -> aviClip(f, "H264"))).collect()
    }
    assert(e.getMessage.contains("MJPEG-family") ||
      (e.getCause != null && e.getCause.getMessage.contains("MJPEG-family")))
    // and a bare AVI header with no streams still refuses (container)
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(4L ->
        ("RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
          "AVI ".getBytes("US-ASCII") ++ new Array[Byte](12)))).collect()
    }
    // OpenDML: frames in a follow-on RIFF('AVIX') segment — how >1 GB
    // AVIs are muxed — must be recovered too, in order, never
    // silently dropped
    val extra = Seq(jpeg(gradientImage(32, 24, true, 53), 0.9f),
      jpeg(gradientImage(32, 24, true, 97), 0.9f))
    val odml = MultimodalOps.splitKeyframes(mediaDf(
        5L -> aviClip(f, "MJPG", avixFrames = extra)))
      .orderBy("frame_idx").collect()
    assert(odml.length == 5, s"AVIX frames dropped: ${odml.length} of 5")
    (f ++ extra).zipWithIndex.foreach { case (want, i) =>
      assert(odml(i).getAs[Array[Byte]]("media").toSeq == want.toSeq,
        s"frame $i bytes differ")
    }
  }

  test("an MP4-wrapped clip collapses with its concatenated-MJPEG twin through videoDedup") {
    val imgs = Seq(gradientImage(64, 48, false, 0),
      gradientImage(64, 48, false, 97), gradientImage(64, 48, false, 181))
    val media = mediaDf(
      1L -> clip(imgs.map(jpeg(_, 0.9f))), // bare concatenation
      2L -> mp4Clip(imgs.map(jpeg(_, 0.9f)), "jpeg"), // same frames, boxed
      3L -> clip(Seq(png(gradientImage(64, 48, true, 0)),
        png(gradientImage(64, 48, true, 97)))))
    val kept = MultimodalOps.videoDedup(media, grid = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"container wrapping must not hide identical keyframes: $kept")
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
    // a truncated fmt chunk refuses with the parser's own message, not
    // a raw ArrayIndexOutOfBoundsException from inside a task
    val shortFmt = good.clone(); shortFmt(16) = 8 // fmt size 16 -> 8
    val e2 = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(mediaDf(1L -> shortFmt)).collect()
    }
    assert(e2.getMessage.contains("fmt") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("fmt")))
  }

  test("audioDedup keeps non-WAV rows as singletons instead of dropping them") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val media = mediaDf(
      1L -> wav(m, 16, 1),
      2L -> wav(m.map(_ / 2), 16, 1), // re-encode: half volume
      3L -> "ID3 not actually decodable here".getBytes) // an MP3-ish row
    val kept = MultimodalOps.audioDedup(media, windows = 33, maxHamming = 3)
    // the survivor universe is the FULL media table: the unfingerprintable
    // row survives as its own singleton, original columns intact
    assert(kept.columns.toSeq == media.columns.toSeq)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    // an ALL-non-WAV corpus returns every row, never empty
    val allMp3 = mediaDf(7L -> "ID3 one".getBytes, 8L -> "ID3 two".getBytes)
    assert(MultimodalOps.audioDedup(allMp3, windows = 33)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(7L, 8L))
  }

  test("media chains decode ONCE: the materialized spine carries no decode stage") {
    val still = png(gradientImage(32, 24, false, 0))
    val media = mediaDf(1L -> clip(Seq(still, still)), 2L -> clip(Seq(still)))
    // default mat = Local: the per-frame decode runs at materialization
    // time and the pair plan reads the checkpointed hash frame — zero
    // MapPartitions (decode) stages anywhere downstream
    val pairs = MultimodalOps.videoNearDupPairs(media, grid = 5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), plan.take(3000))
    // the Inline probe shows what materialization is saving: the decode
    // stage is re-planned in every consuming branch
    val inline = MultimodalOps.videoNearDupPairs(media, grid = 5,
      mat = graft.ops.Materializer.Inline)
    val n = "MapPartitions".r
      .findAllIn(inline.queryExecution.executedPlan.toString).size
    assert(n >= 2, s"inline probe should branch the decode, saw $n")
    // audio: same discipline on the WAV decode
    val wavs = mediaDf(1L -> wav(melody(Seq(1, 2, 3)), 16, 1))
    val apairs = MultimodalOps.audioNearDupPairs(wavs)
    assert(!apairs.queryExecution.executedPlan.toString.contains("MapPartitions"))
    // the gate composition (r18): ONE materialized hash frame threads
    // through self-dedup AND the against-index check — neither branch
    // may re-plan a decode stage (gateVideoBatch/gateAudioBatch pass
    // these exact frames)
    val fh = MultimodalOps.videoFrameHashes(media, grid = 5)
    for (frame <- Seq(
        MultimodalOps.videoDedupFromHashes(media, fh, grid = 5),
        MultimodalOps.videoNearDupAgainstIndexFromHashes(fh, fh, grid = 5)))
      assert(!frame.queryExecution.executedPlan.toString
        .contains("MapPartitions"), "gate branch re-plans the decode")
    val fp = graft.ops.Materializer.Local(
      MultimodalOps.audioFingerprint(wavs, windows = 33)
        .select("doc_id", "afp"))
    assert(!MultimodalOps.audioDedupFromFp(wavs, fp, windows = 33)
      .queryExecution.executedPlan.toString.contains("MapPartitions"))
  }

  test("peak-anchored fingerprint is bit-exact under intro trim and leading silence") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7)) // peak in segment 5
    val base = wav(m, 16, 1)
    val trimmed = wav(m.drop(320), 16, 1) // 5% intro trim
    val padded = wav(Array.fill(300)(0) ++ m, 16, 1) // prepended silence
    // distinct material = a different PITCH (523 Hz vs 440): same-pitch
    // fixtures are phase-locked at the anchor (segments start at phase
    // 0 of a 400-sample period), which makes sign-of-change bits
    // envelope-blind — a real melody difference moves the per-frame
    // energy pattern itself
    val other = wav(melody(Seq(9, 1, 8, 2, 7, 3, 6, 4), freq = 523.25), 16, 1)
    val media = mediaDf(1L -> base, 2L -> trimmed, 3L -> padded, 4L -> other)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the relative-window contour hash provably misses the trim (its
    // documented envelope) — the anchored variant exists for exactly this
    val contour = MultimodalOps.audioFingerprint(media, windows = 49)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(contour(1) != contour(0), "a 5% trim must move the contour hash")
    val fp = MultimodalOps.audioFingerprintAnchored(media, windows = 49,
      frameLen = 32).orderBy("doc_id").collect().map(_.getLong(1))
    assert(fp(1) == fp(0), "intro trim must not move the anchored hash")
    assert(fp(2) == fp(0), "leading silence must not move the anchored hash")
    assert(ham(fp(3), fp(0)) > 8, "distinct melody stays distinct")
    val kept = MultimodalOps.audioDedup(media, windows = 49, maxHamming = 3,
      anchored = true, frameLen = 32)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("frameMs grid pairs a rate-converted re-encode; the sample grid provably cannot") {
    // piecewise-constant amplitude per 20 ms block, alternating sign:
    // an exact 3:1 decimation (48 kHz -> 16 kHz, the one resample this
    // container can do losslessly) preserves each block's sample SET
    // {+a, -a}, so per-frame mean-square energies — and the contour
    // bits — are EXACTLY equal when frames cover the same time spans.
    def blocky(amps: Seq[Int], spb: Int): Array[Int] = {
      val out = new Array[Int](amps.length * spb)
      for (b <- amps.indices; i <- 0 until spb) {
        val a = amps(b) * 600
        val idx = b * spb + i
        out(idx) = if (idx % 2 == 0) a else -a
      }
      out
    }
    // both sequences lead with their max (anchor = sample 0) but carry
    // genuinely different up/down contours (not two phases of one
    // alternation — that collided in an earlier draft of this fixture)
    val amps = Seq(9, 2, 3, 1, 8, 7, 2, 4, 5, 6, 1, 3, 2, 8, 4, 6, 5, 7)
    val hi = blocky(amps, 960) // 48 kHz: 20 ms = 960 samples
    val lo = hi.indices.collect { case i if i % 3 == 0 => hi(i) }.toArray
    val ampsOther = Seq(9, 8, 7, 6, 5, 4, 3, 2, 1, 2, 3, 4, 5, 6, 7, 8, 7, 6)
    val media = mediaDf(
      1L -> wav(hi, 16, 1, rate = 48000),
      2L -> wav(lo, 16, 1, rate = 16000), // SAME material, resampled
      3L -> wav(blocky(ampsOther, 960), 16, 1, rate = 48000))
    // the r17 sample grid misses the transcode (its documented gap)
    val sampleGrid = MultimodalOps.audioFingerprintAnchored(media,
        windows = 16, frameLen = 256)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(sampleGrid(1) != sampleGrid(0),
      "a 3:1 resample must move the sample-grid hash or this test is vacuous")
    // the time grid (frameMs = 20, exact at every standard rate) pairs it
    val timeGrid = MultimodalOps.audioFingerprintAnchored(media,
        windows = 16, frameMs = 20)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(timeGrid(1) == timeGrid(0),
      "rate-proportional frames must make the resampled track bit-exact")
    assert(timeGrid(2) != timeGrid(0), "distinct material stays apart")
    val kept = MultimodalOps.audioDedup(media, windows = 16, maxHamming = 0,
      anchored = true, frameMs = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  // ---- r19: container refusal consistency + track/stream selection ----

  test("an MP4 with an EMPTY sync set refuses like the AVI path — never a silent zero-frame pass") {
    val f = Seq(jpeg(gradientImage(24, 16, false, 3), 0.9f),
      jpeg(gradientImage(24, 16, true, 3), 0.9f))
    // stss present, entry_count 0: a parseable still track with zero
    // sync frames — r18 returned Some(empty) and splitKeyframes yielded
    // zero rows silently, violating its own "None is never zero frames"
    val zeroSync = mp4Clip(f, "jpeg", emptyStss = true)
    assert(MultimodalOps.mp4Keyframes(zeroSync).isEmpty,
      "Some(empty) must not escape the walk")
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(1L -> zeroSync)).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("still-image"), s"wrong refusal: $msg")
  }

  test("the MP4 frame-count bound refuses with the DIAL's name, not as an unparseable track") {
    val f = Seq(jpeg(gradientImage(24, 16, false, 5), 0.9f))
    // a lying stsz header declaring 2^20 + 1 samples: over the packing
    // bound — the refusal must name MaxFramesPerClip (r18 reported
    // "not a parseable still-image video track", the wrong dial)
    val overSz = patchBe32(mp4Clip(f, "jpeg"), "stsz", 8, (1 << 20) + 1)
    val e1 = intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(1L -> overSz)).collect()
    }
    val m1 = e1.getMessage +
      Option(e1.getCause).map(_.getMessage).getOrElse("")
    assert(m1.contains("MaxFramesPerClip"), s"wrong refusal: $m1")
    // same for a crafted stss whose ENTRY count exceeds the bound
    // (repeated entries could otherwise alias frame_idx into a
    // neighboring clip's packed (clip, frame) key)
    val overSync = patchBe32(mp4Clip(f, "jpeg", syncSamples = Seq(1)),
      "stss", 4, (1 << 20) + 1)
    val e2 = intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(2L -> overSync)).collect()
    }
    val m2 = e2.getMessage +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("MaxFramesPerClip"), s"wrong refusal: $m2")
  }

  test("a leading inter-frame track does not mask a splittable still track (MP4), nor a leading stream an MJPEG stream (AVI)") {
    val f = Seq(jpeg(gradientImage(32, 24, false, 7), 0.9f),
      jpeg(gradientImage(32, 24, true, 7), 0.9f))
    // track 1 avc1, track 2 jpeg: the jpeg track splits
    val twoTrack = MultimodalOps.splitKeyframes(mediaDf(
        1L -> mp4Clip(f, "jpeg", leadingFormats = Seq("avc1"))))
      .orderBy("frame_idx").collect()
    assert(twoTrack.length == 2 &&
      twoTrack(0).getAs[Array[Byte]]("media").toSeq == f(0).toSeq)
    // stream 0 H.264, stream 1 MJPG with the frames muxed as 01dc:
    // the splitter must select stream 1, not refuse on stream 0
    val twoStream = MultimodalOps.splitKeyframes(mediaDf(
        2L -> aviClipStreams(
          Seq(("vids", "H264", null), ("vids", "MJPG", null)), 1, f)))
      .orderBy("frame_idx").collect()
    assert(twoStream.length == 2 &&
      twoStream(1).getAs[Array[Byte]]("media").toSeq == f(1).toSeq)
  }

  test("the AVI strf fallback fires ONLY on a blank handler word — a contradictory H264/MJPG file refuses") {
    val f = Seq(jpeg(gradientImage(32, 24, false, 13), 0.9f),
      jpeg(gradientImage(32, 24, true, 13), 0.9f))
    // NUL handler (the real muxer habit, alongside the spaces variant
    // the older spec pins): biCompression decides
    val nulHandler = MultimodalOps.splitKeyframes(mediaDf(
      1L -> aviClip(f, "\u0000\u0000\u0000\u0000", strfComp = "MJPG")))
    assert(nulHandler.count() == 2)
    // contradictory: fccHandler H264 over biCompression MJPG — the
    // handler word is NOT blank, so strf must not overrule it
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.splitKeyframes(mediaDf(
        2L -> aviClip(f, "H264", strfComp = "MJPG"))).collect()
    }
  }

  // ---- r19: format-skip observability + strict dials ----

  test("non-WAV payloads are COUNTED skips in the audio fingerprints; strict mode refuses them") {
    graft.ops.CapTelemetry.clear()
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val fake = "ID3 not actually audio, an MP3-shaped payload".getBytes
    val media = mediaDf(1L -> wav(m, 16, 1), 2L -> fake,
      3L -> "OggS also undecodable here".getBytes)
    assert(MultimodalOps.audioFingerprint(media, windows = 16)
      .count() == 1)
    // the observation rides the count() above — poll for delivery
    val st = (1 to 50).iterator
      .map { _ =>
        Thread.sleep(20)
        graft.ops.CapTelemetry.lastSkipStats("audio_fingerprint")
      }
      .collectFirst { case Some(s) => s }
    assert(st.exists(s => s.skippedRows == 2 && s.totalRows == 3),
      s"skip telemetry missing or wrong: $st")
    // strict: the first undecodable payload refuses loudly
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(media, windows = 16, strict = true)
        .collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("RIFF/WAVE"), s"wrong refusal: $msg")
    // the multi-anchor variant counts through its own channel
    assert(MultimodalOps.audioFingerprintMultiAnchor(media, windows = 16,
      anchors = 2).select("doc_id").distinct().count() == 1)
    val stM = (1 to 50).iterator
      .map { _ =>
        Thread.sleep(20)
        graft.ops.CapTelemetry.lastSkipStats("audio_fingerprint_multi")
      }
      .collectFirst { case Some(s) => s }
    assert(stM.exists(s => s.skippedRows == 2 && s.totalRows == 3))
  }

  test("frameless payloads are COUNTED skips in splitKeyframes") {
    graft.ops.CapTelemetry.clear()
    val f = Seq(jpeg(gradientImage(24, 16, false, 9), 0.9f))
    val media = mediaDf(
      1L -> clip(f), // splits: not a skip
      2L -> wav(melody(Seq(2, 5, 1)), 16, 1), // known audio: skip
      3L -> "plain text payload with no frame magic".getBytes, // skip
      4L -> Array[Byte](1, 2)) // short stub: skip
    assert(MultimodalOps.splitKeyframes(media).count() == 1)
    val st = (1 to 50).iterator
      .map { _ =>
        Thread.sleep(20)
        graft.ops.CapTelemetry.lastSkipStats("split_keyframes")
      }
      .collectFirst { case Some(s) => s }
    assert(st.exists(s => s.skippedRows == 3 && s.totalRows == 4),
      s"skip telemetry missing or wrong: $st")
  }

  // ---- r19: multi-anchor fingerprint ----

  test("an outro-appended re-encode pairs through the multi-anchor fingerprint where the single anchor misses") {
    // base track: clear peak mid-stream, quiet tail long enough that
    // the anchored span [peak, peak + windows*frameLen) fits inside
    val base = melody(Seq(2, 4, 9, 3, 2, 1, 1, 1, 1, 1), ampl = 6000.0)
    // re-upload: the SAME material with a LOUDER outro appended — the
    // global peak moves into the outro, re-anchoring the single-anchor
    // hash; the original peak survives as the second anchor
    val outro = melody(Seq(10, 8), ampl = 9000.0, freq = 880.0)
    val edited = base ++ outro
    // distinct material: different contour, same family of amplitudes
    val other = melody(Seq(1, 7, 2, 9, 4, 3, 1, 2, 1, 1), ampl = 6000.0,
      freq = 523.25)
    val media = mediaDf(1L -> wav(base, 16, 1),
      2L -> wav(edited, 16, 1), 3L -> wav(other, 16, 1))
    // single anchor misses the pair (the documented envelope gap)
    val single = MultimodalOps.audioNearDupPairs(media, windows = 16,
      maxHamming = 0, anchored = true, frameLen = 128)
    assert(single.count() == 0,
      "the outro edit must defeat the single anchor or this test is vacuous")
    // multi-anchor (k = 2): the base peak's fingerprint is bit-exact on
    // both sides -> any-match pairs them; distinct material stays apart
    val multi = MultimodalOps.audioNearDupPairsMulti(media, windows = 16,
      frameLen = 128, anchors = 2, maxHamming = 0).collect()
    assert(multi.length == 1 &&
      multi.head.getLong(0) == 1L && multi.head.getLong(1) == 2L,
      s"expected exactly (1, 2): ${multi.mkString(",")}")
    val kept = MultimodalOps.audioDedupMulti(media, windows = 16,
      frameLen = 128, anchors = 2, maxHamming = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    // rank 0 IS the single-anchor fingerprint (the family anchor)
    val multiFp = MultimodalOps.audioFingerprintMultiAnchor(media,
        windows = 16, frameLen = 128, anchors = 2)
      .filter(col("anchor_rank") === 0)
      .select("doc_id", "afp", "anchor")
      .orderBy("doc_id").collect()
    val singleFp = MultimodalOps.audioFingerprintAnchored(media,
        windows = 16, frameLen = 128)
      .select("doc_id", "afp", "anchor").orderBy("doc_id").collect()
    assert(multiFp.map(_.toSeq).toSeq == singleFp.map(_.toSeq).toSeq)
  }

  test("a track with fewer separable peaks than anchors emits fewer rows, never a padded fake") {
    // constant-amplitude track: every later argmax falls inside the
    // first anchor's exclusion zone -> exactly ONE anchor row
    val flat = Array.fill(2048)(500)
    var i = 0
    while (i < flat.length) { flat(i) = -500; i += 2 }
    val rows = MultimodalOps.audioFingerprintMultiAnchor(
      mediaDf(1L -> wav(flat, 16, 1)), windows = 4, frameLen = 1024,
      anchors = 3).collect()
    assert(rows.length == 1, s"expected 1 anchor row, got ${rows.length}")
    assert(rows.head.getLong(1) == 0L)
  }

  // ---- r19: format census ----

  test("formatCensus classifies by container magic in one map-only pass") {
    val f = Seq(jpeg(gradientImage(16, 12, false, 1), 0.9f))
    val media = mediaDf(
      1L -> wav(melody(Seq(1, 3)), 16, 1),
      2L -> aviClip(f, "MJPG"),
      3L -> mp4Clip(f, "jpeg"),
      4L -> (Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
        new Array[Byte](16)),
      5L -> f.head,
      6L -> png(gradientImage(16, 12, true, 1)),
      7L -> Array[Byte](1, 2),
      8L -> "just text".getBytes)
    val census = MultimodalOps.formatCensus(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("wav" -> 1L, "avi" -> 1L, "mp4" -> 1L,
      "matroska" -> 1L, "jpeg" -> 1L, "png" -> 1L, "empty" -> 1L,
      "other" -> 1L), s"census: $census")
  }

  test("formatCensusDeep answers splittability with the splitters' own parsers") {
    val f = Seq(jpeg(gradientImage(16, 12, false, 2), 0.9f))
    val pcm = wav(melody(Seq(1, 3)), 16, 1)
    // ADPCM-shaped WAV: format code 2 at byte 20 (RIFF 12 + 'fmt ' 4 +
    // size 4) — the decoder refuses it, the census must label it
    val adpcm = pcm.clone(); adpcm(20) = 2
    val media = mediaDf(
      1L -> pcm, // wav-pcm
      2L -> adpcm, // wav-compressed
      3L -> clip(f), // frames (magic at 0)
      4L -> mp4Clip(f, "jpeg"), // mp4-still
      5L -> mp4Clip(f, "avc1"), // mp4-interframe
      6L -> aviClip(f, "MJPG"), // avi-mjpeg
      7L -> aviClip(f, "H264"), // avi-other
      8L -> (Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
        new Array[Byte](8)), // matroska
      9L -> Array[Byte](1, 2), // empty
      10L -> "just text".getBytes) // other
    val census = MultimodalOps.formatCensusDeep(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("wav-pcm" -> 1L, "wav-compressed" -> 1L,
      "frames" -> 1L, "mp4-still" -> 1L, "mp4-interframe" -> 1L,
      "avi-mjpeg" -> 1L, "avi-other" -> 1L, "matroska" -> 1L,
      "empty" -> 1L, "other" -> 1L), s"census: $census")
    // the header probe's acceptance EQUALS the decoder's — census and
    // fingerprint can never disagree about a WAV
    val truncFmt = pcm.clone(); truncFmt(16) = 8 // fmt declares 8 bytes
    val truncData = pcm.clone(); truncData(40) = (truncData(40) + 100).toByte
    val stereo8 = wav(melody(Seq(2, 5)), 8, 2)
    for ((p, i) <- Seq(pcm, adpcm, truncFmt, truncData, stereo8,
        "not wav".getBytes).zipWithIndex) {
      val probe = MultimodalOps.isPcmWavHeader(p)
      val decodes = scala.util.Try(MultimodalOps.decodeWavMono(p)).isSuccess
      assert(probe == decodes, s"payload $i: probe $probe vs decode $decodes")
    }
  }

  test("24-bit and WAVE_FORMAT_EXTENSIBLE PCM decode; the same waveform fingerprints identically at every depth/header") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val media = mediaDf(
      1L -> wav(m, 16, 1), // the plain 16-bit reference
      2L -> wav(m, 24, 1), // exact 24-bit upscale (<< 8)
      3L -> wav(m, 16, 1, extensible = true), // 0xFFFE + PCM GUID
      4L -> wav(m, 24, 2, extensible = true)) // ext, 24-bit, stereo
    val fps = MultimodalOps.audioFingerprint(media, windows = 16)
      .orderBy("doc_id").collect()
    assert(fps.length == 4)
    assert(fps.map(_.getLong(1)).distinct.length == 1,
      "one waveform, one fingerprint — depth and header are transport")
    // the pro-audio re-encode collapses through audioDedup like any other
    val kept = MultimodalOps.audioDedup(media, windows = 16,
      maxHamming = 0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // a float-PCM extensible GUID REFUSES — decode-or-refuse, never
    // fingerprint undecoded bytes
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(mediaDf(
        5L -> wav(m, 16, 1, extensible = true, pcmGuid = false)),
        windows = 16).collect()
    }
    // the census probe tracks the widened acceptance exactly — incl. a
    // HOSTILE chunk size near 2^32, which must refuse/label cleanly
    // (an Int cursor would wrap negative and crash on a raw index)
    val hostile = "RIFF".getBytes ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes ++ "JUNK".getBytes ++
      Array(0xF0, 0xFF, 0xFF, 0xFF).map(_.toByte) ++ new Array[Byte](8)
    assert(!MultimodalOps.isPcmWavHeader(hostile))
    for ((p, i) <- Seq(wav(m, 24, 1),
        wav(m, 16, 1, extensible = true),
        wav(m, 24, 2, extensible = true),
        wav(m, 16, 1, extensible = true, pcmGuid = false),
        hostile).zipWithIndex) {
      val probe = MultimodalOps.isPcmWavHeader(p)
      val decodes = scala.util.Try(MultimodalOps.decodeWavMono(p)).isSuccess
      assert(probe == decodes, s"payload $i: probe $probe vs decode $decodes")
    }
    // ... and the deep census LABELS the hostile payload, never crashes
    val labeled = MultimodalOps.formatCensusDeep(mediaDf(1L -> hostile))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labeled == Map("wav-compressed" -> 1L), s"got $labeled")
  }

  test("AIFF PCM decodes; a WAV<->AIFF re-container collapses through audioDedup; AIFC compressed refuses") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val media = mediaDf(
      1L -> wav(m, 16, 1), // the 16-bit WAV reference
      2L -> aiff(m, 16, 1), // same samples, big-endian container
      3L -> aiff(m, 24, 2), // depth and channel count are transport
      4L -> wav(m, 8, 1), // the 8-bit pair: WAV's unsigned vs
      5L -> aiff(m, 8, 1)) //   AIFF's signed 8 quantize IDENTICALLY
    val fps = MultimodalOps.audioFingerprint(media, windows = 16)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(fps(1)._2 == fps(0)._2 && fps(2)._2 == fps(0)._2,
      "one waveform, one fingerprint — the container is transport")
    assert(fps(4)._2 == fps(3)._2,
      "8-bit WAV and 8-bit AIFF round-trip to the same samples")
    // the re-container collapses through audioDedup like a re-encode
    val kept = MultimodalOps.audioDedup(media, windows = 16,
      maxHamming = 3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
    // AIFC with a real compression type REFUSES — decode-or-refuse
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(
        mediaDf(6L -> aiff(m, 16, 1, comp = "sowt")), windows = 16)
        .collect()
    }
    // probe == decoder acceptance on every branch (truncated: FORM +
    // full COMM but no SSND — labeled, never crashed)
    val truncated = aiff(m, 16, 1).take(40)
    for ((p, i) <- Seq(aiff(m, 16, 1), aiff(m, 24, 2), aiff(m, 8, 1),
        aiff(m, 16, 1, comp = "sowt"), aiff(m, 16, 1, comp = "NONE"),
        truncated).zipWithIndex) {
      val probe = MultimodalOps.isPcmAiffHeader(p)
      val decodes =
        scala.util.Try(MultimodalOps.decodeAiffMonoRate(p)).isSuccess
      assert(probe == decodes, s"payload $i: probe $probe vs decode $decodes")
    }
    // the deep census classes are the probe's answer, by construction
    val labeled = MultimodalOps.formatCensusDeep(mediaDf(
      1L -> aiff(m, 16, 1), 2L -> aiff(m, 16, 1, comp = "sowt"),
      3L -> truncated))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labeled == Map("aiff-pcm" -> 1L, "aiff-compressed" -> 2L),
      s"got $labeled")
  }

  test("Sun AU decodes: linear PCM is container transport, µ-law pairs within budget, G.72x refuses") {
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val media = mediaDf(
      1L -> wav(m, 16, 1), // the WAV reference
      2L -> au(m, 3, 1), // BE linear-16: bit-exact with WAV
      3L -> au(m, 4, 2), // linear-24 stereo: transport
      4L -> au(m, 1, 1)) // µ-law: companded, pairs within the budget
    val fps = MultimodalOps.audioFingerprint(media, windows = 16)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(fps(1)._2 == fps(0)._2 && fps(2)._2 == fps(0)._2,
      "linear AU is transport — fingerprints bit-equal with WAV")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(3)._2, fps(0)._2) <= 3,
      s"mu-law re-encode within tolerance, got ${ham(fps(3)._2, fps(0)._2)}")
    val kept = MultimodalOps.audioDedup(media, windows = 16,
      maxHamming = 3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
    // G.711 known points: the exact integer expansions
    assert(MultimodalOps.mulawToLinear(0xFF.toByte) == 0)
    assert(MultimodalOps.mulawToLinear(0x7F.toByte) == 0) // negative zero
    assert(MultimodalOps.alawToLinear(0xD5.toByte) == 8) // ^0x55 = 0x80
    assert(MultimodalOps.alawToLinear(0x55.toByte) == -8)
    // compress→expand roundtrip error bounded by the segment step
    for (s <- Seq(-30000, -1000, -1, 0, 1, 977, 8191, 30000))
      assert(math.abs(MultimodalOps.mulawToLinear(linearToMulaw(s)) - s) <=
        math.max(8, math.abs(s) / 16), s"mu-law roundtrip at $s")
    // A-law AU: raw companded bytes decode via the exact formula
    val rawA = Array(0xD5, 0x55, 0xC5, 0x45)
    val gotA = MultimodalOps.decodeAuMonoRate(au(rawA, 27, 1))._1
    assert(gotA.toSeq == rawA.map(b =>
      MultimodalOps.alawToLinear(b.toByte)).toSeq)
    // a compressed encoding (G.721 = 23) refuses loudly
    def patched(enc: Int): Array[Byte] = {
      val x = au(m, 3, 1); x(15) = enc.toByte; x
    }
    intercept[org.apache.spark.SparkException] {
      MultimodalOps.audioFingerprint(mediaDf(9L -> patched(23)),
        windows = 16).collect()
    }
    // probe == decoder acceptance on every branch
    for ((p, i) <- Seq(au(m, 1, 1), au(m, 3, 1), au(m, 4, 2),
        au(rawA, 27, 1), patched(23), au(m, 3, 1).take(20)).zipWithIndex) {
      val probe = MultimodalOps.isPcmAuHeader(p)
      val decodes =
        scala.util.Try(MultimodalOps.decodeAuMonoRate(p)).isSuccess
      assert(probe == decodes, s"payload $i: probe $probe vs decode $decodes")
    }
    // deep census: the probe's answer, by construction
    val labeled = MultimodalOps.formatCensusDeep(mediaDf(
      1L -> au(m, 1, 1), 2L -> patched(23)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labeled == Map("au-pcm" -> 1L, "au-compressed" -> 1L),
      s"got $labeled")
  }

  test("webp/avif/heic route as named undecodable classes, not other/mp4") {
    val webp = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WEBP".getBytes ++ "VP8 ".getBytes
    val avif = Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes ++
      "avif".getBytes ++ new Array[Byte](8)
    val heic = Array[Byte](0, 0, 0, 0x18) ++ "ftyp".getBytes ++
      "heic".getBytes ++ new Array[Byte](8)
    val media = mediaDf(1L -> webp, 2L -> avif, 3L -> heic)
    val magic = MultimodalOps.formatCensus(media)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(magic == Map("webp" -> 1L, "avif" -> 1L, "heic" -> 1L),
      s"got $magic")
    val deep = MultimodalOps.formatCensusDeep(media)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deep == Map("webp" -> 1L, "avif" -> 1L, "heic" -> 1L),
      s"got $deep")
  }

  // ---- r20: animated-GIF structural split + Matroska census depth ----

  // hand-built GIF walk fixtures: the walk never decodes LZW data, so
  // garbage pixel sub-blocks exercise it exactly like real ones
  private def gifLe16(v: Int) =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def gifGce(transparent: Boolean) = Array(0x21, 0xF9, 0x04,
    if (transparent) 0x01 else 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
  private def gifDesc(l: Int, t: Int, w: Int, h: Int) =
    Array(0x2C.toByte) ++ gifLe16(l) ++ gifLe16(t) ++ gifLe16(w) ++
      gifLe16(h) ++ Array(0x00.toByte)
  private val gifPix =
    Array(0x02, 0x02, 0xAA, 0xBB, 0x00).map(_.toByte) // lzwMin + subblock
  private val gifHdr = "GIF89a".getBytes ++ gifLe16(4) ++ gifLe16(3) ++
    Array(0x00, 0x00, 0x00).map(_.toByte) // 4x3 screen, no GCT
  private val gifFull = gifDesc(0, 0, 4, 3) ++ gifPix

  test("a two-frame GIF splits structurally; a PNG-clip re-encode of the same frames collapses through videoDedup") {
    val f1 = checkerImage(64, 48, 16)
    val f2 = checkerImage(64, 48, 16, 1)
    val g = gifAnim(Seq(f1, f2))
    // frames come out as standalone single-frame GIFs that REALLY decode
    val frames = MultimodalOps.splitKeyframes(mediaDf(1L -> g))
      .orderBy("frame_idx").collect()
    assert(frames.length == 2, s"got ${frames.length} frames")
    frames.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media")))
      assert(img != null && img.getWidth == 64 && img.getHeight == 48)
    }
    // the cross-container re-encode exact dedup can never catch: the
    // SAME frames as a concatenated-PNG clip (2-color frames — the GIF
    // palette is lossless, so the decoded luma is bit-identical)
    val twin = clip(Seq(png(f1), png(f2)))
    val fresh = clip(Seq(png(checkerImage(64, 48, 32)),
      png(checkerImage(64, 48, 32, 1))))
    val kept = MultimodalOps.videoDedup(
      mediaDf(1L -> g, 2L -> twin, 3L -> fresh))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }

  test("GIF delta/transparent/truncated payloads refuse; GIF89a prose stays a counted zero-frame skip") {
    graft.ops.CapTelemetry.clear()
    val anim = gifHdr ++ gifGce(false) ++ gifFull ++ gifGce(false) ++
      gifFull ++ Array(0x3B.toByte)
    MultimodalOps.gifSplit(anim) match {
      case MultimodalOps.GifFrames(he, fs) =>
        assert(he == 13 && fs.length == 2)
      case r => fail(s"expected 2 frames, got $r")
    }
    // an optimized (delta) second frame covers part of the screen
    val delta = gifHdr ++ gifGce(false) ++ gifFull ++ gifGce(false) ++
      (gifDesc(1, 0, 2, 3) ++ gifPix) ++ Array(0x3B.toByte)
    // a transparent second frame shows through to the previous canvas
    val trans = gifHdr ++ gifGce(false) ++ gifFull ++ gifGce(true) ++
      gifFull ++ Array(0x3B.toByte)
    assert(MultimodalOps.gifSplit(delta)
      .isInstanceOf[MultimodalOps.GifRefuse])
    assert(MultimodalOps.gifSplit(trans)
      .isInstanceOf[MultimodalOps.GifRefuse])
    // ... and through the splitter both REFUSE loudly (never a
    // wrong-content or zero-frame pass)
    for (bad <- Seq(delta, trans)) {
      val e = intercept[org.apache.spark.SparkException] {
        MultimodalOps.splitKeyframes(mediaDf(9L -> bad)).collect()
      }
      assert(e.getMessage.contains("render to full frames upstream") ||
        e.getCause.getMessage.contains("render to full frames upstream"))
    }
    // a walk running off the payload refuses too (corroborated GIF,
    // block structure truncated): trailer present, sub-block lies
    val lying = gifHdr ++ gifGce(false) ++ gifDesc(0, 0, 4, 3) ++
      Array(0x02, 0x7F).map(_.toByte) ++ Array(0x3B.toByte)
    assert(MultimodalOps.gifSplit(lying)
      .isInstanceOf[MultimodalOps.GifRefuse])
    // GIF89a PROSE (no trailer): not corroborated — zero frames,
    // COUNTED as a skip, never routed to the GIF walk
    val prose = ("GIF89a is an image format from 1989, " +
      "not a document about one.").getBytes("UTF-8")
    assert(MultimodalOps.splitKeyframes(mediaDf(1L -> prose)).count() == 0)
    val st = (1 to 50).iterator
      .map { _ =>
        Thread.sleep(20)
        graft.ops.CapTelemetry.lastSkipStats("split_keyframes")
      }
      .collectFirst { case Some(s) => s }
    assert(st.exists(s => s.skippedRows == 1 && s.totalRows == 1),
      s"prose skip not observed: $st")
  }

  test("deep census: gif-anim / gif-still / gif-refused and mkv-<codec> classes; truncated EBML labels matroska") {
    val anim = gifAnim(Seq(checkerImage(16, 12, 4), checkerImage(16, 12, 4, 1)))
    val still = gifAnim(Seq(checkerImage(16, 12, 4)))
    val delta = gifHdr ++ gifGce(false) ++ gifFull ++ gifGce(false) ++
      (gifDesc(1, 0, 2, 3) ++ gifPix) ++ Array(0x3B.toByte)
    // hand-built Matroska: EBML header + Segment > Tracks > TrackEntry
    // (video, V_MPEG4/ISO/AVC); a second file with an AUDIO track first
    // must still report the VIDEO track's codec
    val ebmlHdr = ebmlEl(Array(0x1A, 0x45, 0xDF, 0xA3), Array.empty)
    def trackEntry(kind: Int, codec: String) = ebmlEl(Array(0xAE),
      ebmlEl(Array(0x83), Array(kind.toByte)) ++
        ebmlEl(Array(0x86), codec.getBytes("US-ASCII")))
    def mkvOf(entries: Array[Byte]) = ebmlHdr ++
      ebmlEl(Array(0x18, 0x53, 0x80, 0x67),
        ebmlEl(Array(0x16, 0x54, 0xAE, 0x6B), entries))
    val mkvAvc = mkvOf(trackEntry(1, "V_MPEG4/ISO/AVC"))
    val mkvAudioFirst = mkvOf(trackEntry(2, "A_OPUS") ++
      trackEntry(1, "V_VP9"))
    val labeled = MultimodalOps.formatCensusDeep(mediaDf(
      1L -> anim, 2L -> still, 3L -> delta, 4L -> mkvAvc,
      5L -> mkvAudioFirst, 6L -> mkvAvc.dropRight(8)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labeled == Map("gif-anim" -> 1L, "gif-still" -> 1L,
      "gif-refused" -> 1L, "mkv-v_mpeg4/iso/avc" -> 1L,
      "mkv-v_vp9" -> 1L, "matroska" -> 1L), s"got $labeled")
    // the magic census (oracle-replayed tri-SF) counts the same GIFs
    // under its corroborated 'gif' class
    val magic = MultimodalOps.formatCensus(mediaDf(1L -> anim, 2L -> still))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(magic == Map("gif" -> 2L), s"got $magic")
  }

  test("the audio gate blocks AIFF and AU re-containers of an ingested WAV track (dispatch e2e)") {
    import graft.streaming.StreamOps
    val m = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val other = melody(Seq(9, 1, 8, 2, 7, 3, 6, 4), freq = 523.25)
    val fp = java.nio.file.Files.createTempDirectory("graft_augate")
      .toString + "/afp.parquet"
    val out = java.nio.file.Files.createTempDirectory("graft_augate_out")
      .toString
    // batch 0: the WAV original indexes its fingerprint
    StreamOps.gateAudioBatch(mediaDf(1L -> wav(m, 16, 1)), fp, out,
      16, 3, 100000, false, 256, 0, 0L)
    // batch 1: the SAME samples re-containered as AIFF and as AU
    // linear-16 (every byte differs) — both blocked through the
    // standing index; a fresh track passes
    StreamOps.gateAudioBatch(mediaDf(10L -> aiff(m, 16, 1),
      11L -> au(m, 3, 1), 12L -> wav(other, 16, 1)), fp, out,
      16, 3, 100000, false, 256, 0, 1L)
    val survivors = spark.read.parquet(s"$out/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(12L), s"got $survivors")
  }

  test("the video gate blocks a PNG-clip re-delivery of an ingested GIF animation (split path e2e)") {
    import graft.streaming.StreamOps
    val f1 = checkerImage(64, 48, 16)
    val f2 = checkerImage(64, 48, 16, 1)
    val fh = java.nio.file.Files.createTempDirectory("graft_gifgate")
      .toString + "/frames.parquet"
    val out = java.nio.file.Files.createTempDirectory("graft_gifgate_out")
      .toString
    def batchOf(rows: (Long, Array[Byte])*) = mediaDf(rows: _*)
    // batch 0: the GIF animation indexes its per-frame hashes
    StreamOps.gateVideoBatch(batchOf(1L -> gifAnim(Seq(f1, f2))),
      fh, out, 5, 3, 0.5, 10000, 0L)
    // batch 1: the SAME frames re-delivered as a concatenated-PNG clip
    // (every byte differs) — blocked through the standing index; a
    // fresh clip passes
    val fresh = clip(Seq(png(checkerImage(64, 48, 32)),
      png(checkerImage(64, 48, 32, 1))))
    StreamOps.gateVideoBatch(batchOf(
      10L -> clip(Seq(png(f1), png(f2))), 12L -> fresh),
      fh, out, 5, 3, 0.5, 10000, 1L)
    val survivors = spark.read.parquet(s"$out/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(12L), s"got $survivors")
  }

  test("NEGATIVE doc_ids route correctly through the packed frame/anchor keys (floor-div unpack)") {
    // ADVICE r19: the truncating-div unpack misrouted xxhash64-style
    // negative ids (anchors of track -5 unpacked as -4/-5); the
    // (x - pmod) div floor form pins them exact on both families
    val f = Seq(png(checkerImage(32, 24, 8)), png(checkerImage(32, 24, 8, 1)))
    val clips = mediaDf(-5L -> clip(f), -6L -> clip(f.reverse))
    val fh = MultimodalOps.videoFrameHashes(clips).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fh.map(_._1).toSet == Set(-5L, -6L), s"got ${fh.toSeq}")
    assert(fh.map(_._2).toSet == Set(0L, 1L))
    // the re-ordered twin pairs across the negative ids (2/2 frames
    // match under smaller-side coverage)
    val pairs = MultimodalOps.videoNearDupPairs(clips)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((-6L, -5L)), s"got $pairs")
    // audio multi-anchor: a planted duplicate with negative ids pairs
    val m = melody(Seq(2, 4, 9, 3, 2, 1, 1, 1))
    val tracks = mediaDf(-7L -> wav(m, 16, 1),
      -8L -> wav(m.map(_ / 2), 16, 1)) // half volume: envelope-invariant
    val apairs = MultimodalOps.audioNearDupPairsMulti(tracks,
      windows = 16, frameLen = 128, anchors = 2, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(apairs == Set((-8L, -7L)), s"got $apairs")
  }
}
