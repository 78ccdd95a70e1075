package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Metadata

import graft.streaming.StreamOps

/** Stamp-and-refuse discipline for the MEDIA gates' standing indexes
  * (VERDICT r19 "What's wrong" #1): the audio plain/anchored/multi
  * families — and any dial drift on the video/media gates — produce
  * parquet-compatible index schemas, so a restarted gate with drifted
  * dials used to read the store successfully and compare cross-family
  * fingerprints (near-zero match rate, re-deliveries silently
  * admitted). The [[graft.streaming.StreamOps.GateStamp]] closes this
  * the way RpMeta closed it for the embedding gate in r12:
  * family + dials ride column metadata on the index's hash column and
  * every batch refuses a conflict by name. [[HashStampSpec]] is the
  * model for the text-side artifacts.
  */
class GateStampSpec extends SparkSpec {
  import spark.implicits._
  import MediaFixtures._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def rawMediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))

  private val mA = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
  private val mB = melody(Seq(9, 1, 8, 2, 7, 3, 6, 4), freq = 523.25)

  test("audio gate: a multi index read by an anchors=0 restart refuses (the schema-compatible silent case)") {
    val fp = tmpDir("graft_stamp_multi_fp") + "/afp.parquet"
    val out = tmpDir("graft_stamp_multi_out")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(1L -> wav(mA, 16, 1))),
      fp, out, 16, 0, 100000, false, 128, 0, 0L, anchors = 2)
    // the published index carries the family stamp through parquet
    val stored = spark.read.parquet(fp)
    val meta = stored.schema.fields.find(_.name == "afp").get.metadata
    assert(meta.getString(StreamOps.GateStamp.FamilyKey) == "audio-multi")
    assert(meta.getLong(StreamOps.GateStamp.DialPrefix + "anchors") == 2L)
    // restart with anchors=0 (plain family): same columns would read
    // fine pre-r20 — now refuses loudly, naming both families
    val e = intercept[IllegalArgumentException] {
      StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mB, 16, 1))),
        fp, out, 16, 0, 100000, false, 128, 0, 1L)
    }
    assert(e.getMessage.contains("audio-multi") &&
      e.getMessage.contains("audio-plain"), e.getMessage)
    // the refused batch left the index untouched
    assert(spark.read.parquet(fp).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("audio gate: plain <-> anchored flips and a windows drift each refuse by name") {
    val fp = tmpDir("graft_stamp_plain_fp") + "/afp.parquet"
    val out = tmpDir("graft_stamp_plain_out")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(1L -> wav(mA, 16, 1))),
      fp, out, 33, 3, 100000, false, 256, 0, 0L)
    // plain -> anchored: identical (doc_id, afp) schema, different family
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mB, 16, 1))),
        fp, out, 33, 3, 100000, true, 256, 0, 1L)
    }
    assert(e1.getMessage.contains("audio-plain") &&
      e1.getMessage.contains("audio-anchored"))
    // same family, drifted windows dial: refused naming the dial
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mB, 16, 1))),
        fp, out, 16, 3, 100000, false, 256, 0, 1L)
    }
    assert(e2.getMessage.contains("windows=33") &&
      e2.getMessage.contains("windows=16"), e2.getMessage)
    // matching dials: the restart proceeds and folds normally
    StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mB, 16, 1))),
      fp, out, 33, 3, 100000, false, 256, 0, 1L)
    assert(spark.read.parquet(fp).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 10L))
  }

  test("legacy unstamped audio index: same-dial batches proceed (WARN path) and re-publish stamped") {
    val fp = tmpDir("graft_stamp_legacy_fp") + "/afp.parquet"
    val out = tmpDir("graft_stamp_legacy_out")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(1L -> wav(mA, 16, 1))),
      fp, out, 33, 3, 100000, false, 256, 0, 0L)
    // forge a pre-round-20 store: same rows, metadata stripped (the
    // sidecar marker is dropped with the rewrite; foldStaged falls back
    // to the row-carried __last_batch, also a legacy-store trait)
    val legacy = tmpDir("graft_stamp_legacy_fp2") + "/afp.parquet"
    val rows = spark.read.parquet(fp)
    rows.select(rows.columns.toIndexedSeq.map(c =>
        col(c).as(c, Metadata.empty)): _*)
      .write.parquet(legacy)
    assert(spark.read.parquet(legacy).schema.fields
      .find(_.name == "afp").get.metadata.json == "{}")
    // an unstamped store does NOT refuse — caller's dials apply
    // (the documented fallback) — and the fold re-publishes stamped
    StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mB, 16, 1))),
      legacy, out, 33, 3, 100000, false, 256, 0, 1L)
    val meta = spark.read.parquet(legacy).schema.fields
      .find(_.name == "afp").get.metadata
    assert(meta.getString(StreamOps.GateStamp.FamilyKey) == "audio-plain")
    // ... so the check is live from the NEXT batch on
    intercept[IllegalArgumentException] {
      StreamOps.gateAudioBatch(rawMediaDf(Seq(20L -> wav(mB, 16, 1))),
        legacy, out, 16, 3, 100000, false, 256, 0, 2L)
    }
  }

  test("sketch folds: HLL lgK / CMS depth,log2w / KLL k drift each refuse; same dials fold on") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    // HLL: a drifted lgK would union at the SMALLER precision silently
    val hll = tmpDir("graft_stamp_hll") + "/sketch.parquet"
    StreamOps.foldSketchBatch(docs, hll, "doc_id", Nil, 12, 0L)
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.foldSketchBatch(docs, hll, "doc_id", Nil, 8, 1L)
    }
    assert(e1.getMessage.contains("lgK=12") &&
      e1.getMessage.contains("lgK=8"), e1.getMessage)
    StreamOps.foldSketchBatch(docs, hll, "doc_id", Nil, 12, 1L) // same: ok
    // CMS: a drifted log2w unions cells from DIFFERENT hash spaces —
    // every later estimate would read garbage with no warning
    val cms = tmpDir("graft_stamp_cms") + "/cells.parquet"
    StreamOps.foldCmsBatch(docs, cms, "text", 4, 14, 0L)
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.foldCmsBatch(docs, cms, "text", 4, 12, 1L)
    }
    assert(e2.getMessage.contains("log2w=14") &&
      e2.getMessage.contains("log2w=12"), e2.getMessage)
    StreamOps.foldCmsBatch(docs, cms, "text", 4, 14, 1L)
    // KLL: a drifted k silently changes the error envelope mid-stream
    val kll = tmpDir("graft_stamp_kll") + "/parts.parquet"
    val vals = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    StreamOps.foldQuantileBatch(vals, kll, "v", 256, 0L)
    val e3 = intercept[IllegalArgumentException] {
      StreamOps.foldQuantileBatch(vals, kll, "v", 128, 1L)
    }
    assert(e3.getMessage.contains("k=256") &&
      e3.getMessage.contains("k=128"), e3.getMessage)
    StreamOps.foldQuantileBatch(vals, kll, "v", 256, 1L)
  }

  test("media gate: a bits drift refuses; video gate: a grid drift refuses") {
    def mediaOf(rows: Seq[(Long, String)]) =
      graft.ops.MultimodalOps.attachFakeMedia(
        rows.toDF("doc_id", "text"), "doc_id", "text")
    val ph = tmpDir("graft_stamp_media_ph") + "/phash.parquet"
    val outM = tmpDir("graft_stamp_media_out")
    StreamOps.gateMediaBatch(mediaOf(Seq(1L -> "a sample document")),
      ph, outM, 48, 6, 100000, 0L)
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.gateMediaBatch(mediaOf(Seq(10L -> "another document")),
        ph, outM, 32, 6, 100000, 1L)
    }
    assert(e1.getMessage.contains("bits=48") &&
      e1.getMessage.contains("bits=32"), e1.getMessage)

    val imgs = Seq(gradientImage(64, 48, false, 0),
      gradientImage(64, 48, false, 97))
    val fh = tmpDir("graft_stamp_video_fh") + "/frames.parquet"
    val outV = tmpDir("graft_stamp_video_out")
    StreamOps.gateVideoBatch(rawMediaDf(Seq(1L -> clip(imgs.map(png)))),
      fh, outV, 5, 3, 0.5, 10000, 0L)
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.gateVideoBatch(
        rawMediaDf(Seq(10L -> clip(imgs.map(jpeg(_, 0.9f))))),
        fh, outV, 7, 3, 0.5, 10000, 1L)
    }
    assert(e2.getMessage.contains("grid=5") &&
      e2.getMessage.contains("grid=7"), e2.getMessage)
  }
}
