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
}
