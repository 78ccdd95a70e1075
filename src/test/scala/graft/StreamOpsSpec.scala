package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("windowedCounts: event-time tumbling windows over a file stream") {
    val in = tmpDir("graft_stream_in")
    Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "view", 1.0),
      (Timestamp.valueOf("2024-01-01 00:50:00"), "view", 2.0),
      (Timestamp.valueOf("2024-01-01 01:10:00"), "click", 3.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(in)

    val stream = StreamOps.streamSource(spark, in,
      spark.read.parquet(in).schema)
    val q = StreamOps.windowedCounts(stream, "ts", "event_type")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("wc").orderBy("window_start", "event_type").collect()
    assert(got.map(r => (r.getTimestamp(0).toString, r.getString(1),
      r.getLong(2), r.getLong(3))).toSeq == Seq(
      ("2024-01-01 00:00:00.0", "view", 2L, 300L),
      ("2024-01-01 01:00:00.0", "click", 1L, 300L)))
  }

  test("indexSink: micro-batches fold into the dense parquet index") {
    val in = tmpDir("graft_stream_idx_in")
    val idx = tmpDir("graft_stream_idx") + "/index.parquet"
    val ckpt = tmpDir("graft_stream_ckpt")
    Seq((0L, "a", 1L), (2L, "c", 2L), (0L, "a2", 3L))
      .toDF("id", "v", "ord")
      .write.mode("overwrite").parquet(in)

    val stream = StreamOps.streamSource(spark, in, spark.read.parquet(in).schema)
    StreamOps.runCatchUp(stream, idx, "ord", ckpt)

    val got = spark.read.parquet(idx).orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // keep-last by ordinal: id 0 took the ord=3 row; gap id=1 is null
    assert(got(0).getString(1) == "a2")
    assert(got(1).isNullAt(1))
    assert(got(2).getString(1) == "c")
  }

  test("sketchIndexSink: streamed fold equals the one-shot batch sketch") {
    val in = tmpDir("graft_stream_sk_in")
    val sk = tmpDir("graft_stream_sk") + "/sketches.parquet"
    val ckpt = tmpDir("graft_stream_sk_ckpt")
    // three micro-batches with overlapping doc_ids per lang: the fold
    // must count each distinct id once, like the one-shot sketch
    Seq((0L, "en"), (1L, "en"), (2L, "de"))
      .toDF("doc_id", "lang").coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    Seq((1L, "en"), (3L, "en"), (2L, "de"))
      .toDF("doc_id", "lang").coalesce(1).write.parquet(s"$in/b2")
    Thread.sleep(50)
    Seq((4L, "de"), (0L, "en"))
      .toDF("doc_id", "lang").coalesce(1).write.parquet(s"$in/b3")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.sketchIndexSink(stream, sk, "doc_id", Seq("lang"))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def est(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), col("n_rows"),
          graft.ops.SketchOps.estimate(col("sketch")).as("d"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val streamed = est(spark.read.parquet(sk))
    val oneShot = est(graft.ops.SketchOps.distinctSketches(
      spark.read.parquet(s"$in/*"), "doc_id", groupCols = Seq("lang")))
    assert(streamed == oneShot)
    // exact at this tiny cardinality: en {0,1,3}, de {2,4}
    assert(streamed("en")._2 == 3L && streamed("de")._2 == 2L)
    assert(streamed("en")._1 == 5L && streamed("de")._1 == 3L) // raw rows

    // at-least-once replay: re-delivering the LAST folded epoch must be
    // a no-op (the published table pins __last_batch), not a double count
    val replay = Seq((0L, "en")).toDF("doc_id", "lang")
    StreamOps.foldSketchBatch(replay, sk, "doc_id", Seq("lang"),
      graft.ops.SketchOps.DefaultLgK, batchId = 2L)
    assert(est(spark.read.parquet(sk)) == streamed)
    // a genuinely new epoch folds
    StreamOps.foldSketchBatch(replay, sk, "doc_id", Seq("lang"),
      graft.ops.SketchOps.DefaultLgK, batchId = 3L)
    assert(est(spark.read.parquet(sk))("en") == (6L, 3L))
  }

  test("cmsIndexSink: streamed CMS fold equals the one-shot build; replay is a no-op") {
    val in = tmpDir("graft_stream_cms_in")
    val cms = tmpDir("graft_stream_cms") + "/cms.parquet"
    val ckpt = tmpDir("graft_stream_cms_ckpt")
    Seq((0L, "alpha beta alpha"), (1L, "beta gamma"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    Seq((2L, "alpha delta"), (3L, "gamma gamma beta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.cmsIndexSink(stream, cms, "text", depth = 3, log2w = 8)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("j", "pos", "cell").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = cells(spark.read.parquet(cms).drop("__last_batch"))
    val oneShot = cells(graft.ops.SketchOps.cmsCells(
      spark.read.parquet(s"$in/*"), "text", depth = 3, log2w = 8))
    assert(streamed == oneShot)
    // estimates answered from the folded table: exact at this width
    val terms = Seq("alpha", "beta", "gamma", "delta").toDF("term")
    val est = graft.ops.SketchOps.cmsEstimates(terms, "term",
        spark.read.parquet(cms).drop("__last_batch"), depth = 3, log2w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 3 && est("beta") >= 3 && est("gamma") >= 3 &&
      est("delta") >= 1) // one-sided: never an undercount
    // replaying the last epoch must not double the cells
    StreamOps.foldCmsBatch(
      Seq((3L, "gamma gamma beta")).toDF("doc_id", "text"),
      cms, "text", 3, 8, batchId = 1L)
    assert(cells(spark.read.parquet(cms).drop("__last_batch")) == streamed)
  }

  test("quantileSketchSink: streamed fold tracks exact quantiles; replay is a no-op") {
    val in = tmpDir("graft_stream_kll_in")
    val sk = tmpDir("graft_stream_kll") + "/qsketch.parquet"
    val ckpt = tmpDir("graft_stream_kll_ckpt")
    // three batches of a near-unique continuous column (3 x 1000 values)
    val all = (0 until 3000).map(i => ((i * 7919) % 3000) + 0.5)
    all.grouped(1000).zipWithIndex.foreach { case (vals, b) =>
      vals.toDF("x").coalesce(1).write.parquet(s"$in/b$b")
      Thread.sleep(50)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b0").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.quantileSketchSink(stream, sk, "x", k = 256)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stored = spark.read.parquet(sk)
    // bounded size + exactly-conserved weight (== rows ever streamed)
    val parts = stored.drop("__last_batch").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    assert(parts.length <= 256 * 8, s"sketch grew to ${parts.length} rows")
    assert(parts.map { case (lvl, _) => 1L << lvl }.sum == 3000L)
    // rolling quantiles stay within the sketch's rank-error bound
    val est = graft.ops.ProfileOps.quantilesFromSketchParts(
      stored.drop("__last_batch")).head()
    val sorted = all.sorted
    def rankErr(v: Double, target: Int): Int = {
      val lo = sorted.count(_ < v); val hi = sorted.count(_ <= v)
      if (target < lo) lo - target else if (target > hi) target - hi else 0
    }
    assert(rankErr(est.getDouble(0), 1500) <= 3000 * 5 / 100,
      s"median ${est.getDouble(0)} off by ${rankErr(est.getDouble(0), 1500)}")
    assert(rankErr(est.getDouble(1), 2700) <= 3000 * 5 / 100)
    // replaying the LAST epoch must NOT double the weights
    val lastBatch = stored.head().getAs[Long]("__last_batch")
    StreamOps.foldQuantileBatch(all.take(1000).toDF("x"), sk, "x", 256, lastBatch)
    val replayed = spark.read.parquet(sk).drop("__last_batch").collect()
      .map(r => 1L << r.getInt(0))
    assert(replayed.sum == 3000L, s"replay doubled weight: ${replayed.sum}")
    // a genuinely new epoch folds (weight grows by the batch size)
    StreamOps.foldQuantileBatch(all.take(500).toDF("x"), sk, "x", 256, lastBatch + 1)
    assert(spark.read.parquet(sk).drop("__last_batch").collect()
      .map(r => 1L << r.getInt(0)).sum == 3500L)
  }

  test("foldStaged: a ZERO-row publish keeps the epoch marker — replay stays a no-op") {
    // a row-carried marker alone dies with an empty table (e.g. a gate
    // batch with no survivors); the sidecar file must keep the guard
    val sk = tmpDir("graft_stream_marker") + "/qsketch.parquet"
    StreamOps.foldQuantileBatch(Seq.empty[Double].toDF("x"), sk, "x", 256,
      batchId = 0L)
    assert(spark.read.parquet(sk).isEmpty, "empty batch must publish 0 rows")
    assert(StreamOps.readBatchMarker(sk).contains(0L),
      "sidecar marker must survive a zero-row publish")
    // at-least-once redelivery of epoch 0 (now with rows) must be skipped
    StreamOps.foldQuantileBatch(Seq(1.5, 2.5).toDF("x"), sk, "x", 256, 0L)
    assert(spark.read.parquet(sk).isEmpty, "replayed epoch re-folded")
    // a genuinely new epoch folds on top of the empty table
    StreamOps.foldQuantileBatch(Seq(1.5, 2.5).toDF("x"), sk, "x", 256, 1L)
    assert(spark.read.parquet(sk).drop("__last_batch").collect()
      .map(r => 1L << r.getInt(0)).sum == 2L)
    assert(StreamOps.readBatchMarker(sk).contains(1L))
  }

  test("mediaGateSink: perceptual gate blocks re-encoded/corrupted re-uploads across batches") {
    import graft.ops.MultimodalOps
    def wave(n: Int): String =
      (0 until n).map { j =>
        val pos = j.toDouble / (n - 1)
        (40 + (86 * (1 - math.abs(2 * pos - 1))).toInt).toChar
      }.mkString
    val orig = wave(481)
    val unrelated = (0 until 481).map(j => (40 + (j * 37) % 87).toChar).mkString
    val perturbed = {
      val b = orig.toCharArray
      Seq(60, 200).foreach(i => b(i) = (b(i) + 5).toChar)
      new String(b)
    }
    val resizedUnrelated = unrelated.flatMap(c => s"$c$c")
    val fresh = (0 until 481).map(j => (40 + (j * 53 + 11) % 87).toChar).mkString
    val in = tmpDir("graft_stream_media_in")
    val ph = tmpDir("graft_stream_media_ph") + "/phash.parquet"
    val out = tmpDir("graft_stream_media_out")
    val ckpt = tmpDir("graft_stream_media_ckpt")
    def mediaOf(rows: Seq[(Long, String)]) =
      MultimodalOps.attachFakeMedia(rows.toDF("doc_id", "text"), "doc_id", "text")
    // batch 1 includes a ZERO-BYTE payload (99): dropped per the gate's
    // documented policy — no perceptual content, never survives/indexes
    mediaOf(Seq(0L -> orig, 3L -> unrelated, 99L -> ""))
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    mediaOf(Seq(10L -> perturbed, 11L -> resizedUnrelated, 12L -> fresh))
      .coalesce(1).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.mediaGateSink(stream, ph, out, maxHamming = 6)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val survivors = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch 1 both pass; batch 2: corrupted re-upload of 0 and resized
    // re-upload of 3 are BLOCKED by the standing index, only 12 lands
    assert(survivors == Set(0L, 3L, 12L), s"got $survivors")
    // the folded index holds exactly the survivors' phashes
    val indexed = spark.read.parquet(ph).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(indexed == Set(0L, 3L, 12L))
    // replaying the last epoch is a no-op (deterministic gate + skip)
    val lastBatch = spark.read.parquet(ph).head().getAs[Long]("__last_batch")
    StreamOps.gateMediaBatch(
      mediaOf(Seq(10L -> perturbed)), ph, out, 48, 6, 100000, lastBatch)
    assert(spark.read.parquet(ph).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L, 12L))
  }

  private def rawMediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))

  test("videoGateSink: keyframe-content gate blocks re-encoded clip re-deliveries across batches") {
    import MediaFixtures._
    val imgs = Seq(gradientImage(64, 48, false, 0),
      gradientImage(64, 48, false, 97))
    val clipPng = clip(imgs.map(png))
    // the re-delivery exact dedup can never catch: SAME frames, every
    // byte different (JPEG 0.9 re-encode)
    val clipJpeg = clip(imgs.map(jpeg(_, 0.9f)))
    val clipOther = clip(Seq(png(gradientImage(64, 48, true, 0)),
      png(gradientImage(64, 48, true, 97))))
    val clipFresh = clip(Seq(png(checkerImage(64, 48, 32)),
      png(checkerImage(64, 48, 32, 1))))
    val in = tmpDir("graft_stream_video_in")
    val fh = tmpDir("graft_stream_video_fh") + "/frames.parquet"
    val out = tmpDir("graft_stream_video_out")
    val ckpt = tmpDir("graft_stream_video_ckpt")
    // batch 1 includes a ZERO-BYTE payload (99): dropped per policy
    rawMediaDf(Seq(1L -> clipPng, 2L -> clipOther, 99L -> Array.empty[Byte]))
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    rawMediaDf(Seq(10L -> clipJpeg, 12L -> clipFresh))
      .coalesce(1).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.videoGateSink(stream, fh, out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val survivors = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 12L), s"got $survivors")
    // the standing index holds the admitted clips' per-FRAME hashes
    val idx = spark.read.parquet(fh)
    assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 12L))
    assert(idx.count() == 6, "2 keyframes per admitted clip")
    // replaying the last epoch is a no-op (deterministic gate + skip)
    val lb = idx.head().getAs[Long]("__last_batch")
    StreamOps.gateVideoBatch(rawMediaDf(Seq(10L -> clipJpeg)), fh, out,
      5, 3, 0.5, 10000, lb)
    assert(spark.read.parquet(fh).count() == 6)
  }

  test("audioGateSink: fingerprint gate blocks re-encoded track re-deliveries across batches") {
    import MediaFixtures._
    val mA = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val mB = melody(Seq(9, 1, 8, 2, 7, 3, 6, 4), freq = 523.25)
    val mC = melody(Seq(2, 9, 1, 7, 4, 8, 3, 6), freq = 659.25)
    val notAudio = "ID3 not actually audio".getBytes("UTF-8")
    val in = tmpDir("graft_stream_audio_in")
    val fp = tmpDir("graft_stream_audio_fp") + "/afp.parquet"
    val out = tmpDir("graft_stream_audio_out")
    val ckpt = tmpDir("graft_stream_audio_ckpt")
    rawMediaDf(Seq(1L -> wav(mA, 16, 1), 2L -> wav(mB, 16, 1),
      3L -> notAudio)).coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    // 10 = 8-bit re-encode of 1's track (every byte differs); 12 fresh;
    // 13 = byte-identical re-delivery of the non-WAV payload — passes
    // again per the documented policy (non-fingerprintable rows never
    // index; digest-gate them upstream)
    rawMediaDf(Seq(10L -> wav(mA, 8, 1), 12L -> wav(mC, 16, 1),
      13L -> notAudio)).coalesce(1).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.audioGateSink(stream, fp, out, windows = 33)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val survivors = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 3L, 12L, 13L), s"got $survivors")
    // the index holds fingerprints of the WAV survivors only
    val idx = spark.read.parquet(fp)
    assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 12L))
    // replaying the last epoch is a no-op
    val lb = idx.head().getAs[Long]("__last_batch")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(mA, 8, 1))), fp, out,
      33, 3, 100000, false, 256, 0, lb)
    assert(spark.read.parquet(fp).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 12L))
  }

  test("audio gate: a mostly-undecodable micro-batch is counted per batch, stays green non-strict, refuses strict") {
    import MediaFixtures._
    graft.ops.CapTelemetry.clear()
    val fp = tmpDir("graft_stream_skip_fp") + "/afp.parquet"
    val out = tmpDir("graft_stream_skip_out")
    // a mostly-MP3-shaped batch: 1 WAV, 3 undecodable payloads — the
    // silent-degradation class the r19 telemetry makes visible
    val batch = rawMediaDf(Seq(
      1L -> wav(melody(Seq(1, 4, 2, 8, 3, 9, 5, 7)), 16, 1),
      2L -> "ID3 fake mp3 payload one".getBytes("UTF-8"),
      3L -> "fLaC fake flac payload".getBytes("UTF-8"),
      4L -> "OggS fake ogg payload".getBytes("UTF-8")))
    StreamOps.gateAudioBatch(batch, fp, out, 33, 3, 100000, false, 256,
      0, 0L)
    // gate green: every undecodable row survives as its own singleton
    val survivors = spark.read.parquet(s"$out/batch=0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 3L, 4L))
    // ... and the skip fraction was OBSERVED for the batch (3 of 4 —
    // the dominating case the listener WARNs on); delivery is async
    val st = (1 to 50).iterator
      .map { _ =>
        Thread.sleep(20)
        graft.ops.CapTelemetry.lastSkipStats("audio_fingerprint")
      }
      .collectFirst { case Some(s) => s }
    assert(st.exists(s => s.skippedRows == 3 && s.totalRows == 4),
      s"gate batch skips not observed: $st")
    // strict mode: the same batch REFUSES instead of degrading
    val fpS = tmpDir("graft_stream_skip_fp_s") + "/afp.parquet"
    val outS = tmpDir("graft_stream_skip_out_s")
    intercept[org.apache.spark.SparkException] {
      StreamOps.gateAudioBatch(batch, fpS, outS, 33, 3, 100000, false,
        256, 0, 0L, strict = true)
    }
  }

  test("multi-anchor audio gate blocks an outro-edited re-delivery the single-anchor gate admits") {
    import MediaFixtures._
    val base = melody(Seq(2, 4, 9, 3, 2, 1, 1, 1, 1, 1), ampl = 6000.0)
    val outro = melody(Seq(10, 8), ampl = 9000.0, freq = 880.0)
    val edited = base ++ outro
    val other = melody(Seq(1, 7, 2, 9, 4, 3, 1, 2, 1, 1), ampl = 6000.0,
      freq = 523.25)
    // single-anchor gate: the louder outro moves the global peak, the
    // whole fingerprint re-anchors -> the re-delivery is ADMITTED (the
    // documented envelope gap this dial exists to close)
    val fpS = tmpDir("graft_sgate_fp") + "/afp.parquet"
    val outS = tmpDir("graft_sgate_out")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(1L -> wav(base, 16, 1))),
      fpS, outS, 16, 0, 100000, true, 128, 0, 0L)
    StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(edited, 16, 1))),
      fpS, outS, 16, 0, 100000, true, 128, 0, 1L)
    val sSurv = spark.read.parquet(s"$outS/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sSurv == Set(10L),
      "the outro edit must defeat the single-anchor gate or this test is vacuous")
    // multi-anchor gate (k = 2): the original peak survives as the
    // edited track's second anchor -> blocked through the index
    val fpM = tmpDir("graft_mgate_fp") + "/afp.parquet"
    val outM = tmpDir("graft_mgate_out")
    StreamOps.gateAudioBatch(rawMediaDf(Seq(1L -> wav(base, 16, 1))),
      fpM, outM, 16, 0, 100000, false, 128, 0, 0L, anchors = 2)
    StreamOps.gateAudioBatch(rawMediaDf(Seq(10L -> wav(edited, 16, 1),
        11L -> wav(other, 16, 1))),
      fpM, outM, 16, 0, 100000, false, 128, 0, 1L, anchors = 2)
    val mSurv = spark.read.parquet(s"$outM/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mSurv == Set(11L),
      s"edited re-delivery blocked, fresh track kept: $mSurv")
    // the index stores (doc_id, anchor_rank, afp) rows, survivors only
    val idx = spark.read.parquet(fpM)
    assert(idx.columns.contains("anchor_rank"))
    assert(idx.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L, 11L))
    // anchored and anchors > 0 fork the hash family: picking both refuses
    intercept[IllegalArgumentException] {
      StreamOps.gateAudioBatch(rawMediaDf(Seq(2L -> wav(base, 16, 1))),
        fpM, outM, 16, 0, 100000, true, 128, 0, 2L, anchors = 2)
    }
  }

  test("boilerplateCutSink: a line crossing the df threshold is cut forward-only; replay is a no-op") {
    val in = tmpDir("graft_stream_bpl_in")
    val idx = tmpDir("graft_stream_bpl_idx") + "/linedf.parquet"
    val out = tmpDir("graft_stream_bpl_out")
    val ckpt = tmpDir("graft_stream_bpl_ckpt")
    // batch 1: PROMO df 2 <= maxDf 3 -> kept; batch 2 pushes combined
    // df to 4 > 3 -> cut from batch 2's docs ONLY (history immutable)
    Seq((1L, "PROMO BANNER\nalpha"), (2L, "PROMO BANNER\nbeta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    Seq((10L, "PROMO BANNER\ngamma"), (11L, "PROMO BANNER\ndelta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.boilerplateCutSink(stream, idx, out, "doc_id",
      "text", maxDf = 3)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val texts = spark.read.parquet(s"$out/batch=*")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("clean_text")).toMap
    assert(texts == Map(
      1L -> "PROMO BANNER\nalpha", 2L -> "PROMO BANNER\nbeta",
      10L -> "gamma", 11L -> "delta"), s"got $texts")
    // the folded index carries combined dfs
    val dfs = spark.read.parquet(idx)
    assert(dfs.filter(col("df") === 4L).count() == 1, "PROMO df = 2 + 2")
    // replaying the last epoch is a no-op
    val lb = dfs.head().getAs[Long]("__last_batch")
    StreamOps.cutBoilerplateBatch(
      Seq((10L, "PROMO BANNER\ngamma")).toDF("doc_id", "text"),
      idx, out, "doc_id", "text", 3, true, lb)
    assert(spark.read.parquet(idx).filter(col("df") === 4L).count() == 1)
  }

  test("composed media gates: video -> audio over one mixed clip/track corpus, two batches") {
    import MediaFixtures._
    // one mixed-media table: clips and tracks share it; each gate judges
    // its own modality and passes the other through as singletons
    val clipA = clip(Seq(png(gradientImage(64, 48, false, 0)),
      png(gradientImage(64, 48, false, 97))))
    val clipAJpeg = clip(Seq(jpeg(gradientImage(64, 48, false, 0), 0.9f),
      jpeg(gradientImage(64, 48, false, 97), 0.9f)))
    val clipFresh = clip(Seq(png(checkerImage(64, 48, 32)),
      png(checkerImage(64, 48, 32, 1))))
    val trackB = melody(Seq(1, 4, 2, 8, 3, 9, 5, 7))
    val trackFresh = melody(Seq(9, 1, 8, 2, 7, 3, 6, 4), freq = 523.25)
    val root = tmpDir("graft_media_gate_chain")
    val (vIdx, aIdx) = (s"$root/frames.parquet", s"$root/afp.parquet")
    val (sVid, sAud) = (s"$root/s_vid", s"$root/s_aud")
    def runChain(rows: Seq[(Long, Array[Byte])], batchId: Long): Unit = {
      StreamOps.gateVideoBatch(rawMediaDf(rows), vIdx, sVid,
        5, 3, 0.5, 10000, batchId)
      StreamOps.gateAudioBatch(spark.read.parquet(s"$sVid/batch=$batchId"),
        aIdx, sAud, 33, 3, 100000, false, 256, 0, batchId)
    }
    def ids(path: String): Set[Long] =
      spark.read.parquet(path).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    // batch 0: one clip + one track, both novel -> both admitted
    runChain(Seq(1L -> clipA, 2L -> wav(trackB, 16, 1)), 0L)
    assert(ids(s"$sAud/batch=0") == Set(1L, 2L))
    assert(ids(vIdx) == Set(1L), "frame index holds only the clip")
    assert(ids(aIdx) == Set(2L), "fp index holds only the track")
    // batch 1: re-encoded clip blocked by the VIDEO stage, re-encoded
    // track blocked by the AUDIO stage, fresh one of each admitted
    runChain(Seq(10L -> clipAJpeg, 11L -> wav(trackB, 8, 1),
      12L -> clipFresh, 13L -> wav(trackFresh, 16, 1)), 1L)
    assert(ids(s"$sVid/batch=1") == Set(11L, 12L, 13L),
      "video stage blocks exactly the re-encoded clip")
    assert(ids(s"$sAud/batch=1") == Set(12L, 13L),
      "audio stage blocks exactly the re-encoded track")
    assert(ids(vIdx) == Set(1L, 12L))
    assert(ids(aIdx) == Set(2L, 13L))
    // at-least-once replay of the whole chained epoch is a no-op
    runChain(Seq(10L -> clipAJpeg), 1L)
    assert(ids(vIdx) == Set(1L, 12L))
    assert(ids(aIdx) == Set(2L, 13L))
    for (p <- Seq(vIdx, aIdx)) {
      assert(!new java.io.File(p + "__staging").exists(), p)
      assert(!new java.io.File(p + "__old").exists(), p)
    }
  }

  test("embeddingGateSink: semantic gate blocks re-embedded near-dups across batches") {
    val in = tmpDir("graft_stream_embed_in")
    val sig = tmpDir("graft_stream_embed_sig") + "/rpsigs.parquet"
    val out = tmpDir("graft_stream_embed_out")
    val ckpt = tmpDir("graft_stream_embed_ckpt")
    val dim = 8
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val vA = vec(1, 0, 0, 0, 0, 0, 0, 0)
    val vA2 = vec(1, 0.03, 0, 0, 0, 0, 0, 0) // cos(vA, vA2) ≈ 0.9996
    val vB = vec(0, 1, 0, 0, 0, 0, 0, 0)
    val vC = vec(0, 0, 1, 0, 0, 0, 0, 0)
    // batch 1: 0 and its exact re-embedding 1 -> within-batch dedup
    // keeps 0; 3 is semantically unrelated
    Seq((0L, vA), (1L, vA), (3L, vB)).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    // batch 2: 10 is a PERTURBED re-embedding of the already-ingested 0
    // (index hit across batches), 12 is new
    Seq((10L, vA2), (12L, vC)).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$in/b2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.embeddingGateSink(stream, sig, out, "vec_id",
        "embedding", dim, minCos = 0.95)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val survivors = spark.read.parquet(s"$out/batch=*").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 3L, 12L), s"got $survivors")
    // the folded index holds exactly the survivors' flat RP signatures
    val idx = spark.read.parquet(sig)
    assert(idx.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(0L, 3L, 12L))
    assert(idx.columns.contains("b0") && idx.columns.contains("qvec") &&
      idx.columns.contains("qnorm2"))
    // at-least-once replay of the last epoch is a no-op
    val lastBatch = StreamOps.readBatchMarker(sig).get
    StreamOps.gateEmbeddingBatch(Seq((10L, vA2)).toDF("vec_id", "embedding"),
      sig, out, "vec_id", "embedding", dim, 0.95, 8, 8, 42L, 1000, lastBatch)
    assert(spark.read.parquet(sig).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L, 12L))
    // a new epoch whose whole batch is blocked folds to an unchanged
    // index (zero survivors — the sidecar marker still advances)
    StreamOps.gateEmbeddingBatch(
      Seq((20L, vec(1, -0.02, 0, 0, 0, 0, 0, 0))).toDF("vec_id", "embedding"),
      sig, out, "vec_id", "embedding", dim, 0.95, 8, 8, 42L, 1000, lastBatch + 1)
    assert(spark.read.parquet(sig).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L, 12L))
    assert(StreamOps.readBatchMarker(sig).contains(lastBatch + 1))
  }

  test("nearDupGateSink: streamed batches dedup within-batch AND against the standing index") {
    val in = tmpDir("graft_stream_gate_in")
    val sig = tmpDir("graft_stream_gate_sig") + "/sigs.parquet"
    val out = tmpDir("graft_stream_gate_out") + "/survivors"
    val ckpt = tmpDir("graft_stream_gate_ckpt")
    val tA = "the quick brown fox jumps over the lazy dog tonight"
    val tB = "completely different words appear inside this other document here now"
    // batch 1: 0 and its exact copy 1 -> within-batch dedup keeps 0
    Seq((0L, tA), (1L, tA)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    // batch 2: 2 is a copy of the ALREADY-INGESTED 0 (index hit), 3 is new
    Seq((2L, tA), (3L, tB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.nearDupGateSink(stream, sig, out, "doc_id", "text")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val survivors = spark.read.parquet(out)
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(0L, 3L))
    // the index holds exactly the survivors' signatures
    val idx = spark.read.parquet(sig)
    assert(idx.select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L, 3L))
    assert(idx.columns.contains("mh0") && idx.columns.contains("__last_batch"))

    // at-least-once replay of the last epoch is a no-op (no double-fold,
    // no survivor rewrite with a now-different standing index)
    StreamOps.gateNearDupBatch(Seq((2L, tA), (3L, tB)).toDF("doc_id", "text"),
      sig, out, "doc_id", "text", 16, 3, 8, 0.5, 1000, batchId = 1L)
    assert(spark.read.parquet(sig).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L))
    // a genuinely new epoch gates against everything ingested so far:
    // a copy of tB is now dropped, a fresh doc survives
    val tC = "yet another corpus entry with its own unrepeated vocabulary words"
    StreamOps.gateNearDupBatch(Seq((4L, tB), (5L, tC)).toDF("doc_id", "text"),
      sig, out, "doc_id", "text", 16, 3, 8, 0.5, 1000, batchId = 2L)
    assert(spark.read.parquet(sig).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L, 5L))
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 3L, 5L))
  }

  test("urlGateSink: blocklist + canonical-URL dedup within-batch and against the standing index; replay is a no-op") {
    val in = tmpDir("graft_url_gate_in")
    val idx = tmpDir("graft_url_gate_idx") + "/urls.parquet"
    val out = tmpDir("graft_url_gate_out") + "/survivors"
    val ckpt = tmpDir("graft_url_gate_ckpt")
    // batch 1: 0 and 1 canonicalize to the SAME url (scheme/www/tracking
    // noise) -> keep 0; 2 is on a blocked domain -> dropped at the gate
    Seq(
      (0L, "https://news.example.com/a/1"),
      (1L, "HTTP://WWW.News.Example.com/a/1/?utm_source=x"),
      (2L, "https://cdn.spamhub.example/a/9"))
      .toDF("doc_id", "url").coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    // batch 2: 3 re-tracks the ALREADY-INGESTED canonical (index hit,
    // different tracking params), 4 is new
    Seq(
      (3L, "https://news.example.com/a/1?fbclid=z"),
      (4L, "https://news.example.com/a/2"))
      .toDF("doc_id", "url").coalesce(1).write.parquet(s"$in/b2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.urlGateSink(stream, idx, out, "doc_id", "url",
        blockedDomains = Seq("spamhub.example"))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 4L))
    val index = spark.read.parquet(idx)
    assert(index.select("canonical_url").collect().map(_.getString(0)).toSet ==
      Set("news.example.com/a/1", "news.example.com/a/2"))
    // replay of the last epoch is a no-op
    StreamOps.gateUrlBatch(
      Seq((3L, "https://news.example.com/a/1?fbclid=z"),
        (4L, "https://news.example.com/a/2")).toDF("doc_id", "url"),
      idx, out, "doc_id", "url", Seq("spamhub.example"), batchId = 1L)
    assert(spark.read.parquet(idx).count() == 2)
    // a genuinely new epoch still gates against everything ingested
    StreamOps.gateUrlBatch(
      Seq((5L, "http://www.news.example.com/a/2"),
        (6L, "https://news.example.com/a/3")).toDF("doc_id", "url"),
      idx, out, "doc_id", "url", Seq("spamhub.example"), batchId = 2L)
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 4L, 6L))
  }

  test("sessionizeStream: gap-closed sessions emit in-batch, open ones on watermark timeout") {
    val in = tmpDir("graft_stream_sess_in")
    // batch 1 (user 1): 00:00 + 00:10 form one session (gap 30m);
    // 01:00 closes it in-batch and opens a second session. The
    // null-user and null-value rows must not poison the query (encoder
    // primitives): null user drops, null value counts 0 cents
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), Some(1L), Some(1.0)),
      (Timestamp.valueOf("2024-01-01 00:10:00"), Some(1L), None),
      (Timestamp.valueOf("2024-01-01 00:10:00"), None, Some(9.0)),
      (Timestamp.valueOf("2024-01-01 01:00:00"), Some(1L), Some(4.0)))
      .toDF("ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50) // distinct mtimes: file order = batch order
    // batch 2 (user 2, much later): advances the watermark past the
    // 01:30 deadline of user 1's open session -> it times out
    Seq((Timestamp.valueOf("2024-01-01 05:00:00"), 2L, 8.0))
      .toDF("ts", "user_id", "value")
      .coalesce(1).write.parquet(s"$in/b2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    val q = StreamOps.sessionizeStream(stream, "ts", "user_id", "value",
        gapMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def usOf(s: String) = Timestamp.valueOf(s).getTime * 1000L
    val got = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    // session 1 closed by the 01:00 event inside batch 1 (null value
    // counted as 0 cents; the null-user row contributed nothing)
    assert(got.contains((1L, usOf("2024-01-01 00:00:00"),
      usOf("2024-01-01 00:10:00"), 2L, 100L, "gap")), got)
    // session 2 (open at 01:00, deadline 01:30) times out once batch 2
    // pushes the watermark to 04:50
    assert(got.contains((1L, usOf("2024-01-01 01:00:00"),
      usOf("2024-01-01 01:00:00"), 1L, 400L, "timeout")), got)
  }

  test("contaminationHitsStream flags streamed docs overlapping the static eval set") {
    val in = tmpDir("graft_stream_contam_in")
    Seq(
      (10L, "w1 w2 w3 w4 w5"),   // shares trigrams with the benchmark
      (11L, "z1 z2 z3 z4 z5"))   // clean
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val benchmark = Seq((0L, "w1 w2 w3 w4")).toDF("doc_id", "text")

    val stream = StreamOps.streamSource(spark, in, spark.read.parquet(in).schema)
    val q = StreamOps.contaminationHitsStream(stream, benchmark, "doc_id", "text", k = 3)
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("contam").collect().map(_.getLong(0))
    assert(got.nonEmpty && got.toSet == Set(10L)) // only the overlapping doc
    assert(got.length == 2) // its two benchmark trigrams
  }

  test("bloomGateStream: prebuilt bitmap gates a stream like the batch op") {
    val in = tmpDir("graft_stream_bloom_in")
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5"),   // shares trigrams with the benchmark
      (11L, "z1 z2 z3 z4 z5"))   // clean
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(in)
    val benchmark = Seq((0L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val bm = graft.ops.DedupOps.bloomBitmap(benchmark, "doc_id", "text",
      k = 3, probes = 3, log2m = 16)

    val stream = StreamOps.streamSource(spark, in, spark.read.parquet(in).schema)
    val q = StreamOps.bloomGateStream(stream, bm, "doc_id", "text", k = 3, probes = 3)
      .writeStream.format("memory").queryName("bloomgate")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("bloomgate").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical to the batch op on the same frames (literal == subquery)
    val batch = graft.ops.DedupOps.bloomDecontaminate(docs, benchmark,
      "doc_id", "text", k = 3, probes = 3, log2m = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(got.map(_._1) == Set(10L), got) // streamed doc 10 flagged, 11 clean
  }

  test("dsirGateStream: published-model importance gate equals batch scores; replay is a no-op") {
    val in = tmpDir("graft_stream_dsir_in")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(in)
    val target = docs.filter(col("doc_id") % 3 === 0)
    val tm = graft.ops.TextOps.dsirModelArtifact(target, "text")
    val rm = graft.ops.TextOps.dsirModelArtifact(docs, "text")

    val stream = StreamOps.streamSource(spark, in, spark.read.parquet(in).schema)
    val q = StreamOps.dsirGateStream(stream, tm, rm, "doc_id", "text",
      minAvgLogratioQ = 0L)
      .writeStream.format("memory").queryName("dsirgate")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dsirgate")
      .select("doc_id", "avg_logratio_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // equal to the batch join form gated at the same dial
    val batch = graft.ops.TextOps.dsirWeights(docs, "doc_id", "text",
        target, "text", docs, "text")
      .filter(col("avg_logratio_q") >= 0L)
      .select("doc_id", "avg_logratio_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch && got.nonEmpty && got.size < 60,
      s"gate must pass a strict non-empty subset, got ${got.size}")
    // replay no-op: the gate is stateless, so re-scoring the same
    // micro-batch (fresh stream over the same input) emits the
    // identical rows — nothing accumulates, nothing drifts
    val q2 = StreamOps.dsirGateStream(
      StreamOps.streamSource(spark, in, spark.read.parquet(in).schema),
      tm, rm, "doc_id", "text", minAvgLogratioQ = 0L)
      .writeStream.format("memory").queryName("dsirgate2")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val again = spark.table("dsirgate2")
      .select("doc_id", "avg_logratio_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got)
  }

  test("latestPerKey keeps the max-ordinal row per key") {
    val in = tmpDir("graft_stream_latest_in")
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 10L, "old"),
      (Timestamp.valueOf("2024-01-01 00:05:00"), 1L, 20L, "new"),
      (Timestamp.valueOf("2024-01-01 00:06:00"), 2L, 5L, "only"))
      .toDF("ts", "user_id", "ord", "v")
      .write.mode("overwrite").parquet(in)

    val stream = StreamOps.streamSource(spark, in, spark.read.parquet(in).schema)
    val q = StreamOps.latestPerKey(stream, "ts", "user_id", "ord")
      .writeStream.format("memory").queryName("lpk")
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("lpk").orderBy("user_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1),
      r.getStruct(2).getAs[String]("v"))).toSeq ==
      Seq((1L, 20L, "new"), (2L, 5L, "only")))
  }

  test("composed gate family: lexical -> perceptual -> semantic over one mixed corpus, two batches") {
    // One multimodal ingest pipeline: a doc must be lexically novel
    // (MinHash gate), perceptually novel (phash gate on its media
    // payload), AND semantically novel (RP-LSH gate on its embedding)
    // to be admitted. Gates CHAIN — each stage's survivors feed the
    // next — and every stage keeps its own foldStaged index of what IT
    // admitted, so a doc rejected downstream still guards its passed
    // modalities against future re-uploads of the same content.
    import graft.ops.MultimodalOps
    val dim = 8
    // seeded-random payloads: structured waves share adjacent-difference
    // patterns that dHash keeps — pseudo-random bytes give uniform,
    // decorrelated phashes (the round-9 stress fixture lesson)
    def wave(phase: Int): String = {
      val rnd = new scala.util.Random(7919L * (phase + 1))
      (0 until 512).map(_ => (40 + rnd.nextInt(87)).toChar).mkString
    }
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    def doc(id: Long, text: String, mediaText: String, emb: Seq[Float]) =
      (id, text, mediaText.getBytes("UTF-8"), emb)

    val tA = "the quick brown fox jumps over the lazy dog in the misty morning light"
    val tB = "completely different words appear inside this other document here right now today"
    val tC = "a third distinct passage about streaming gates and their replay discipline at scale"
    val tFresh1 = "yet another unrelated body of text mentioning clusters shuffles and partitions everywhere"
    val tFresh2 = "final genuinely novel sentence with vocabulary shared by no earlier document batch"
    val tFresh3 = "one more wholly original paragraph covering manifests shards and deterministic hashing"
    // re-upload of tA: VERBATIM, so the signature match is certain —
    // a one-word edit's band collision is probabilistic in the hash
    // (J≈0.6 ⇒ ~3% miss at 8 bands) and belongs to the recall
    // scorecards (q_lsh_recall), not to this composition test
    val tAdup = tA
    val mA = wave(1); val mB = wave(2); val mC = wave(3)
    val mBdup = { val b = mB.toCharArray; Seq(60, 200).foreach(i => b(i) = (b(i) + 5).toChar); new String(b) }
    val vA = vec(1, 0, 0, 0, 0, 0, 0, 0)
    val vB = vec(0, 1, 0, 0, 0, 0, 0, 0)
    val vC = vec(0, 0, 1, 0, 0, 0, 0, 0)
    val vCdup = vec(0, 0.03, 1, 0, 0, 0, 0, 0) // cos ≈ 0.9996
    val vF1 = vec(0, 0, 0, 1, 0, 0, 0, 0)
    val vF2 = vec(0, 0, 0, 0, 1, 0, 0, 0)
    val vF3 = vec(0, 0, 0, 0, 0, 1, 0, 0)

    val root = tmpDir("graft_gate_family")
    val (lexSig, phIdx, embSig) =
      (s"$root/lex.parquet", s"$root/phash.parquet", s"$root/rpsigs.parquet")
    val (sLex, sMed, sEmb) = (s"$root/s_lex", s"$root/s_med", s"$root/s_emb")

    def runChain(rows: Seq[(Long, String, Array[Byte], Seq[Float])], batchId: Long): Unit = {
      val batch = rows.toDF("doc_id", "text", "media", "embedding")
      StreamOps.gateNearDupBatch(batch, lexSig, sLex, "doc_id", "text",
        16, 3, 8, 0.5, 1000, batchId)
      StreamOps.gateMediaBatch(spark.read.parquet(s"$sLex/batch=$batchId"),
        phIdx, sMed, 48, 6, 100000, batchId)
      StreamOps.gateEmbeddingBatch(spark.read.parquet(s"$sMed/batch=$batchId"),
        embSig, sEmb, "doc_id", "embedding", dim, 0.95, 8, 8, 42L, 1000, batchId)
    }
    def ids(path: String): Set[Long] =
      spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0)).toSet

    // batch 1: three docs distinct in every modality -> all admitted
    runChain(Seq(doc(1L, tA, mA, vA), doc(2L, tB, mB, vB), doc(3L, tC, mC, vC)), 0L)
    assert(ids(s"$sEmb/batch=0") == Set(1L, 2L, 3L))

    // batch 2: one doc per rejection modality + one genuinely fresh
    runChain(Seq(
      doc(10L, tAdup, wave(4), vF1),  // lexical re-upload of 1
      doc(11L, tFresh1, mBdup, vF2),  // corrupted media copy of 2
      doc(12L, tFresh2, wave(5), vCdup), // re-embedding of 3
      doc(13L, tFresh3, wave(6), vF3)), 1L) // novel in all three
    assert(ids(s"$sLex/batch=1") == Set(11L, 12L, 13L),
      "lexical gate must catch exactly the text near-dup")
    assert(ids(s"$sMed/batch=1") == Set(12L, 13L),
      "media gate must catch exactly the corrupted media copy")
    assert(ids(s"$sEmb/batch=1") == Set(13L),
      "embedding gate must catch exactly the re-embedding")
    // per-stage indexes: each holds what ITS stage admitted
    assert(ids(lexSig) == Set(1L, 2L, 3L, 11L, 12L, 13L))
    assert(ids(phIdx) == Set(1L, 2L, 3L, 12L, 13L))
    assert(ids(embSig) == Set(1L, 2L, 3L, 13L))
    // survivors keep the full multimodal row through all three stages
    val surv = spark.read.parquet(s"$sEmb/batch=1")
    assert(surv.columns.toSet == Set("doc_id", "text", "media", "embedding"))

    // at-least-once replay of the whole chained epoch is a no-op at
    // every stage (shared foldStaged discipline)
    runChain(Seq(doc(10L, tAdup, wave(4), vF1)), 1L)
    assert(ids(lexSig) == Set(1L, 2L, 3L, 11L, 12L, 13L))
    assert(ids(phIdx) == Set(1L, 2L, 3L, 12L, 13L))
    assert(ids(embSig) == Set(1L, 2L, 3L, 13L))
    // no staged-swap residue at any index
    for (p <- Seq(lexSig, phIdx, embSig)) {
      assert(!new java.io.File(p + "__staging").exists(), p)
      assert(!new java.io.File(p + "__old").exists(), p)
    }
  }

  test("packedCorpusSink: per-epoch packed segments, replay no-op, sparse ids stable across epochs") {
    import graft.ops.{SampleOps, TextOps}
    val corpus = tmpDir("graft_packed_stream") + "/corpus"
    val d0 = Seq((1L, "the cat sat on the mat today"),
      (2L, "another document with different words entirely"))
      .toDF("doc_id", "text")
    val d1 = Seq((3L, "a third document arrives in the next epoch"))
      .toDF("doc_id", "text")
    StreamOps.appendPackedEpoch(d0, corpus, "doc_id", "text", seqLen = 8,
      targetTokens = 32L, buckets = 2, TextOps.DefaultBpeMerges, batchId = 0L)
    StreamOps.appendPackedEpoch(d1, corpus, "doc_id", "text", seqLen = 8,
      targetTokens = 32L, buckets = 2, TextOps.DefaultBpeMerges, batchId = 1L)
    // reader view: partition discovery exposes epoch + shard_id
    val back = spark.read.parquet(corpus)
    assert(back.columns.toSet ==
      Set("shard_id", "seq_key", "n_tokens", "text", "epoch"))
    assert(back.select("epoch").distinct().collect()
      .map(_.getInt(0)).toSet == Set(0, 1))
    // epoch 0's files are untouched by epoch 1 (self-contained segments)
    val e0files = new java.io.File(corpus, "epoch=0").listFiles()
      .filter(_.getName.startsWith("shard_id=")).flatMap(_.listFiles())
      .filter(_.isFile).map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    // replayed epoch (at-least-once delivery) is a no-op — even with
    // DIFFERENT content, the published segment wins
    StreamOps.appendPackedEpoch(d1.limit(0), corpus, "doc_id", "text",
      seqLen = 8, targetTokens = 32L, buckets = 2,
      TextOps.DefaultBpeMerges, batchId = 0L)
    e0files.foreach { case (p, sig) =>
      val f = new java.io.File(p)
      assert(f.exists() && (f.length(), f.lastModified()) == sig, s"$p changed")
    }
    assert(spark.read.parquet(corpus).filter(col("epoch") === 0)
      .agg(sum("n_tokens")).head().getLong(0) > 0)
    // the streamed segments carry exactly the batch-local packed streams:
    // ids are the SPARSE stable scheme, so re-encoding each batch offline
    // reproduces every epoch's token multiset
    for ((df, ep) <- Seq((d0, 0), (d1, 1))) {
      val want = TextOps.encodeBpe(df, "doc_id", "text",
          TextOps.DefaultBpeMerges, lossless = true)
        .agg(sum("n_tokens")).head().getLong(0) + df.count() // + one EOS per doc
      val got = spark.read.parquet(corpus).filter(col("epoch") === ep)
        .agg(sum("n_tokens")).head().getLong(0)
      assert(got == want, s"epoch $ep: $got != $want")
    }
    // the full sink wrapper drives the same body through a real stream
    val in = tmpDir("graft_packed_stream_in")
    val ckpt = tmpDir("graft_packed_stream_ckpt")
    val corpus2 = tmpDir("graft_packed_stream2") + "/corpus"
    d0.write.mode("overwrite").parquet(in)
    val q = StreamOps.packedCorpusSink(
        StreamOps.streamSource(spark, in, d0.schema),
        corpus2, "doc_id", "text", seqLen = 8, targetTokens = 32L, buckets = 2)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(corpus2).agg(sum("n_tokens")).head().getLong(0) ==
      spark.read.parquet(corpus).filter(col("epoch") === 0)
        .agg(sum("n_tokens")).head().getLong(0))
  }

  test("compactPackedEpochs: epoch segments re-cut into one dense-id corpus, stream-order-preserving, decodable") {
    import graft.ops.{SampleOps, TextOps}
    val root = tmpDir("graft_compact") + "/stream"
    val out = tmpDir("graft_compact_out") + "/corpus"
    val batches = Seq(
      Seq((1L, "the cat sat on the mat in the hat today"),
        (2L, "a second document with some different words")),
      Seq((3L, "the third arrives next epoch with more text")),
      Seq((4L, "and a fourth closes the stream for now"),
        (5L, "fifth document rides along too")))
    batches.zipWithIndex.foreach { case (rows, ep) =>
      StreamOps.appendPackedEpoch(rows.toDF("doc_id", "text"), root,
        "doc_id", "text", seqLen = 8, targetTokens = 64L, buckets = 2,
        TextOps.DefaultBpeMerges, batchId = ep.toLong)
    }
    val (manifest, vocab) = SampleOps.compactPackedEpochs(spark, root, out,
      epochSeqLen = 8, seqLen = 16, targetTokens = 64L, buckets = 2)
    // the compacted corpus: vocab sidecar dense, all-but-last full at
    // the NEW length, manifest totals match
    val back = spark.read.parquet(out)
    assert(back.filter(col("n_tokens") =!= 16).count() <= 1)
    val v = spark.read.parquet(out + "/_graft_vocab.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(v.map(_._1).sorted.toSeq == (0L until v.length.toLong))
    assert(manifest.collect().map(_.getLong(3)).sum ==
      back.agg(sum("n_tokens")).head().getLong(0))
    // stream-order preservation: the compacted stream mapped back to
    // sparse ids == the concatenation of the epoch streams in order
    val toSparse = v.map { case (d, t) => d -> t }.toMap
    val compacted = back.orderBy("seq_key")
      .select(explode(col("text"))).collect().map(r => toSparse(r.getLong(0)))
    val original = spark.read.parquet(root)
      .orderBy(col("epoch"), col("seq_key"))
      .select(explode(col("text"))).collect().map(_.getLong(0))
    assert(compacted.toSeq == original.toSeq)
    // full circle: split the sparse stream at the EOS and decode — the
    // standing stream still contains every ingested document verbatim
    val eos = TextOps.bpeEosId()
    val docsBack = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    var cur = scala.collection.mutable.ArrayBuffer[Long]()
    compacted.foreach { id =>
      if (id == eos) { docsBack += cur.toSeq; cur.clear() } else cur += id
    }
    assert(cur.isEmpty)
    val decoded = TextOps.decodeBpe(
        docsBack.toSeq.zipWithIndex.map { case (ids, i) => (i.toLong, ids) }
          .toDF("i", "token_ids"), "i", "token_ids")
      .collect().map(_.getString(1)).toSet
    assert(decoded == batches.flatten.map(_._2).toSet)
    // deterministic: re-compacting reproduces the manifest byte-for-byte
    val out2 = tmpDir("graft_compact_out2") + "/corpus"
    SampleOps.compactPackedEpochs(spark, root, out2,
      epochSeqLen = 8, seqLen = 16, targetTokens = 64L, buckets = 2)
    assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json")) ==
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(out2, "_graft_manifest.json")))
    // a stream reconfigured mid-life (segments cut at a different
    // length) refuses loudly — the wrong epochSeqLen would silently
    // mis-cut every token after the first mismatch
    val e = intercept[IllegalArgumentException] {
      SampleOps.compactPackedEpochs(spark, root,
        tmpDir("graft_compact_bad") + "/corpus",
        epochSeqLen = 5, seqLen = 16, targetTokens = 64L, buckets = 2)
    }
    assert(e.getMessage.contains("not well-formed"))
  }

  test("packedSftCorpusSink: mask-carrying epoch segments; replay no-op; compaction conserves supervision exactly") {
    import graft.ops.{SampleOps, TextOps}
    val root = tmpDir("graft_sft_stream") + "/stream"
    val batches = Seq(
      Seq((1L, "answer the question", "with four words here"),
        (2L, "another prompt", "and its completion text")),
      Seq((3L, "third prompt arrives", "in the second epoch now")))
    batches.zipWithIndex.foreach { case (rows, ep) =>
      StreamOps.appendPackedSftEpoch(
        rows.toDF("doc_id", "prompt", "completion"), root,
        "doc_id", "prompt", "completion", seqLen = 8, targetTokens = 64L,
        buckets = 2, TextOps.DefaultBpeMerges, batchId = ep.toLong)
    }
    val segs = spark.read.parquet(root)
    // token AND supervised-token conservation per epoch vs offline encode
    for ((rows, ep) <- batches.zipWithIndex) {
      val enc = TextOps.encodeSft(rows.toDF("doc_id", "prompt", "completion"),
        "doc_id", "prompt", "completion")
      val wantTok = enc.agg(sum("n_tokens")).head().getLong(0)
      val wantSup = enc.select(explode(col("loss_mask")).as("m"))
        .filter(col("m") === 1).count()
      val seg = segs.filter(col("epoch") === ep)
      assert(seg.agg(sum("n_tokens")).head().getLong(0) == wantTok)
      val gotSup = seg.select(explode(col("text")).as("z"))
        .filter(col("z.lm") === 1).count()
      assert(gotSup == wantSup, s"epoch $ep supervision: $gotSup != $wantSup")
    }
    // replay with different content is a no-op (published segment wins)
    StreamOps.appendPackedSftEpoch(
      Seq((9L, "x", "y")).toDF("doc_id", "prompt", "completion"), root,
      "doc_id", "prompt", "completion", seqLen = 8, targetTokens = 64L,
      buckets = 2, TextOps.DefaultBpeMerges, batchId = 0L)
    assert(spark.read.parquet(root).filter(col("epoch") === 0).count() ==
      segs.filter(col("epoch") === 0).count())
    // compaction: re-cut at a new length, dense ids, mask rides the
    // struct — totals conserved exactly, EOS resolvable via sidecar
    val out = tmpDir("graft_sft_compact") + "/corpus"
    val (manifest, vocab) = SampleOps.compactPackedSftEpochs(spark, root,
      out, epochSeqLen = 8, seqLen = 16, targetTokens = 64L, buckets = 2)
    val back = spark.read.parquet(out)
    assert(back.filter(col("n_tokens") =!= 16).count() <= 1)
    assert(manifest.collect().map(_.getLong(3)).sum ==
      segs.agg(sum("n_tokens")).head().getLong(0))
    val supIn = segs.select(explode(col("text")).as("z"))
      .filter(col("z.lm") === 1).count()
    val supOut = back.select(explode(col("text")).as("z"))
      .filter(col("z.lm") === 1).count()
    assert(supIn == supOut, "compaction must conserve supervision")
    // stream order preserved for (t, lm) pairs jointly
    val toSparse = vocab.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val compacted = back.orderBy("seq_key")
      .select(explode(col("text")).as("z")).select(col("z.t"), col("z.lm"))
      .collect().map(r => (toSparse(r.getLong(0)), r.getInt(1)))
    val original = segs.orderBy(col("epoch"), col("seq_key"))
      .select(explode(col("text")).as("z")).select(col("z.t"), col("z.lm"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(compacted.toSeq == original.toSeq)
    // specials sidecar rode the swap; its dense EOS id splits the
    // supervised stream at example boundaries
    val eosDense = spark.read.parquet(out + "/_graft_specials.parquet")
      .filter(col("name") === "eos").head().getLong(2)
    val nEos = back.select(explode(col("text")).as("z"))
      .filter(col("z.t") === eosDense).count()
    assert(nEos == batches.flatten.size)
  }

  test("packedMultimodalCorpusSink: inline attachments, placeholders masked 0, alignment recoverable from the packed corpus") {
    import graft.ops.{SampleOps, TextOps}
    val root = tmpDir("graft_mm_stream") + "/stream"
    val rows = Seq(
      (1L, "a captioned image", Seq(10L, 11L)),
      (2L, "plain text doc", Seq.empty[Long]),
      (3L, null.asInstanceOf[String], Seq(30L)))
    StreamOps.appendPackedMultimodalEpoch(
      rows.toDF("doc_id", "text", "media_ids"), root,
      "doc_id", "text", "media_ids", seqLen = 8, targetTokens = 64L,
      buckets = 2, TextOps.DefaultBpeMerges, batchId = 0L)
    val seg = spark.read.parquet(root)
    // every placeholder is masked 0; count matches the attachments
    val img = TextOps.bpeImageId()
    val ph = seg.select(explode(col("text")).as("z"))
      .filter(col("z.t") === img)
    assert(ph.count() == 3)
    assert(ph.filter(col("z.lm") =!= 0).isEmpty)
    // alignment from the packed corpus: coordinates hold placeholders
    val mat = seg.select(col("seq_key").as("seq_id"),
      transform(col("text"), x => x.getField("t")).as("token_ids"))
    val align = SampleOps.alignmentFromPacked(mat, img)
    assert(align.count() == 3)
    val joined = align.join(
      mat.select(col("seq_id"), posexplode(col("token_ids"))
        .as(Seq("seq_pos", "tok"))),
      Seq("seq_id", "seq_pos"))
    assert(joined.count() == 3 && joined.filter(col("tok") =!= img).isEmpty)
  }

  test("daily-loop composition: gate survivors publish into the sharded corpus by append") {
    import graft.ops.SampleOps
    val sig = tmpDir("graft_loop_sig") + "/sigs.parquet"
    val out = tmpDir("graft_loop_out") + "/survivors"
    val corpus = tmpDir("graft_loop_corpus") + "/corpus"
    val tA = "the quick brown fox jumps over the lazy dog tonight again"
    val tB = "completely different words appear inside this other document here now"
    val tC = "yet another corpus entry with its own unrepeated vocabulary words"
    def day(rows: Seq[(Long, String)], batch: Long) = {
      StreamOps.gateNearDupBatch(rows.toDF("doc_id", "text"), sig, out,
        "doc_id", "text", 16, 3, 8, 0.5, 1000, batchId = batch)
      spark.read.parquet(s"$out/batch=$batch")
        .withColumn("n_tok", length(col("text")).cast("long"))
    }
    // day 0: internal dup collapses; the two survivors seed the corpus
    val d0 = day(Seq((0L, tA), (1L, tA), (2L, tB)), 0L)
    SampleOps.writeSharded(d0, col("doc_id"), "n_tok", "text", corpus,
      targetTokens = 40L, buckets = 2)
    val standing = new java.io.File(corpus).listFiles()
      .filter(_.getName.startsWith("shard_id=")).flatMap(_.listFiles())
      .filter(_.isFile).map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    // day 1: the re-delivered tA copy is blocked by the standing index;
    // only the genuinely new doc reaches the corpus append
    val d1 = day(Seq((3L, tA), (4L, tC)), 1L)
    assert(d1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
    SampleOps.appendSharded(d1, col("doc_id"), "n_tok", "text", corpus,
      targetTokens = 40L, buckets = 2)
    // the published corpus is exactly the union of admitted docs, and
    // day 0's shard files were never touched by day 1's append
    val back = spark.read.parquet(corpus)
    assert(back.select("seq_key").collect().map(_.getLong(0)).toSet == Set(0L, 2L, 4L))
    standing.foreach { case (p, sigOld) =>
      val f = new java.io.File(p)
      assert(f.exists() && (f.length(), f.lastModified()) == sigOld, s"$p rewritten")
    }
    // manifest covers old + new shard ids contiguously
    val mf = java.nio.file.Files.readString(
      java.nio.file.Paths.get(corpus, "_graft_manifest.json"))
    val shardIds = """"shard_id":(\d+)""".r.findAllMatchIn(mf).map(_.group(1).toLong).toSeq
    assert(shardIds == (0L until shardIds.length).toSeq, s"manifest ids $shardIds")
  }

  test("span scrub is streaming-legal: scrub-on-arrival equals the batch scrub") {
    val in = tmpDir("graft_stream_scrub_in")
    val outDir = tmpDir("graft_stream_scrub_out")
    val ckpt = tmpDir("graft_stream_scrub_ckpt")
    Seq((1L, "x1 x2 BAD1 BAD2 BAD3 x3 x4"), (2L, "clean words only here"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b1")
    Thread.sleep(50)
    Seq((3L, "BAD1 BAD2 BAD3 tail words"), (4L, "also fine"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/b2")

    val bench = Seq((0L, "BAD1 BAD2 BAD3")).toDF("doc_id", "text")
    val grams = graft.ops.DedupOps.contaminationGramSet(
      bench, "doc_id", "text", k = 3)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
    // the scrub is a stateless map, so it drops straight into a stream
    val q = graft.ops.DedupOps.decontaminateSpansWithGrams(
        stream, grams, "doc_id", "text", k = 3)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "clean_text", "n_spans", "n_removed")
        .orderBy("doc_id").collect().map(_.toString).toSeq
    val streamed = norm(spark.read.parquet(outDir))
    val batch = norm(graft.ops.DedupOps.decontaminateSpansWithGrams(
      spark.read.parquet(s"$in/*"), grams, "doc_id", "text", k = 3))
    assert(streamed == batch)
    assert(streamed.size == 4)
  }
}
