package graft

import org.apache.spark.sql.functions._

import graft.ops.{EventOps, MultimodalOps}

class EventMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def minUs(m: Long) = m * 60L * 1000000L

  // user 10: events at t=0,10,50 min (gap 40 > 30 splits) -> 2 sessions;
  // user 20: single event.
  private val events = Seq(
    (0L, minUs(0), 10L, "view", 1.0),
    (1L, minUs(10), 10L, "click", 2.0),
    (2L, minUs(50), 10L, "view", 3.0),
    (3L, minUs(5), 20L, "view", 4.0))
    .toDF("event_id", "ts_us", "user_id", "event_type", "value")

  test("sessionize splits on gaps greater than the threshold") {
    val got = EventOps.sessionStats(events, gapMinutes = 30)
      .orderBy("user_id", "session_seq").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
    val s1 = got(0)
    assert(s1.getAs[Long]("duration_us") == minUs(10))
    assert(s1.getAs[Long]("value_cents") == 300L)
  }

  test("intervalJoin matches the inequality join, spanning buckets, no nested loop") {
    // intervals spanning multiple buckets, overlapping intervals, and
    // inclusive boundaries — all against a brute-force inequality join
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 100L), (5L, 30L))
      .toDF("pid", "t")
    val intervals = Seq((100L, 0L, 10L), (200L, 8L, 29L), (300L, 30L, 55L))
      .toDF("iid", "lo", "hi")
    val got = EventOps.intervalJoin(points, "t", intervals, "lo", "hi",
        bucketUs = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = points.join(intervals,
        col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // overlap region 8..10 matches BOTH intervals; bounds inclusive both
    // ends (t=10 in [0,10] and [8,29]; t=30 in [30,55]); t=100 matches none
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L), (5L, 300L)))
    // the whole point: a hash equi-join on the manufactured bucket key,
    // never a nested loop
    val plan = EventOps.intervalJoin(points, "t", intervals, "lo", "hi",
        bucketUs = 7L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      plan.take(2000))
    // keyed variant on the real events: every event attributes to exactly
    // its own session interval
    val ev = EventOps.loadEvents(spark, "/root/testdata/sf0.001")
    val sessions = EventOps.sessionStats(ev, gapMinutes = 30)
      .select(col("user_id"), col("session_seq"), col("start_us"), col("end_us"))
    val attributed = EventOps.intervalJoin(
      ev.select(col("event_id"), col("user_id"), col("ts_us")),
      "ts_us", sessions, "start_us", "end_us", keyCols = Seq("user_id"))
    assert(attributed.count() == ev.count())
  }

  test("intervalJoin: oversized intervals fail loudly; empty intervals drop") {
    val points = Seq((1L, 5L)).toDF("pid", "t")
    // sentinel open-ended interval: would explode ~Long.MaxValue/7 buckets
    val openEnded = Seq((100L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      EventOps.intervalJoin(points, "t", openEnded, "lo", "hi", bucketUs = 7L)
        .collect()
    }
    assert(e.getMessage.contains("maxBucketsPerInterval") ||
      Option(e.getCause).exists(_.getMessage.contains("maxBucketsPerInterval")),
      s"expected the loud guard, got: ${e.getMessage}")
    // the WORST sentinel: bucketUs = 1 makes the naive long bucket count
    // Long.MaxValue + 1 — the guard must still fire loudly, not overflow
    val e1 = intercept[Exception] {
      EventOps.intervalJoin(points, "t", openEnded, "lo", "hi", bucketUs = 1L)
        .collect()
    }
    assert(e1.getMessage.contains("maxBucketsPerInterval") ||
      Option(e1.getCause).exists(_.getMessage.contains("maxBucketsPerInterval")),
      s"expected the loud guard at bucketUs=1, got: ${e1.getMessage}")
    // a healthy interval alongside an EMPTY one (hi < lo): the empty one
    // matches nothing and must not explode a descending sequence
    val mixed = Seq((100L, 0L, 10L), (200L, 50L, 20L)).toDF("iid", "lo", "hi")
    val got = EventOps.intervalJoin(points, "t", mixed, "lo", "hi", bucketUs = 7L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L)))
    // guard sits below the cap: spanning-but-sane intervals still pass
    val sane = EventOps.intervalJoin(points, "t",
      Seq((300L, 0L, 70L)).toDF("iid", "lo", "hi"),
      "lo", "hi", bucketUs = 7L, maxBucketsPerInterval = 11L)
    assert(sane.count() == 1L)
  }

  test("property: intervalJoin equals the inequality join on random inputs") {
    val rnd = new scala.util.Random(17)
    for (round <- 0 until 3) {
      val points = (0 until 40).map(i => (i.toLong, rnd.nextInt(100).toLong))
        .toDF("pid", "t")
      val intervals = (0 until 15).map { i =>
        val lo = rnd.nextInt(90).toLong
        (100L + i, lo, lo + rnd.nextInt(30).toLong)
      }.toDF("iid", "lo", "hi")
      val bucket = 1L + rnd.nextInt(20)
      val got = EventOps.intervalJoin(points, "t", intervals, "lo", "hi",
          bucketUs = bucket)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = points.join(intervals,
          col("t") >= col("lo") && col("t") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"round $round bucketUs=$bucket")
    }
  }

  test("interEventGaps: exact per-user gap stats; single-event users drop") {
    val got = EventOps.interEventGaps(events).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 10: gaps 10min and 40min; user 20: one event, no gaps
    assert(got.toSeq == Seq((10L, 2L, minUs(50), minUs(40))))
  }

  test("hourlyAgg buckets into exact epoch-hour windows") {
    val got = EventOps.hourlyAgg(events).orderBy("hour_us", "event_type").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0L, "click", 1L), (0L, "view", 3L)))
  }

  test("retentionCohorts counts users per (cohort day, activity day)") {
    def dayUs(d: Long, m: Long) = d * 86400000000L + minUs(m)
    val ev = Seq(
      (0L, dayUs(0, 1), 1L, "view", 0.0), // u1 first seen day 0
      (1L, dayUs(0, 2), 1L, "view", 0.0), // same day dup -> one row
      (2L, dayUs(2, 0), 1L, "view", 0.0), // u1 returns day 2
      (3L, dayUs(0, 0), 2L, "view", 0.0), // u2 cohort day 0
      (4L, dayUs(1, 0), 3L, "view", 0.0)) // u3 cohort day 1
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val got = EventOps.retentionCohorts(ev).orderBy("cohort_day", "day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 2L, 0L), (0L, 2L, 1L, 2L), (1L, 1L, 1L, 0L)))
  }

  test("asofJoin attaches the latest at-or-before right row per key") {
    val left = Seq(
      (100L, 1L, minUs(10)), // matches right @10 (inclusive, tie on ord)
      (101L, 1L, minUs(30)), // matches right @20
      (102L, 1L, minUs(5)),  // before every right row -> nulls
      (103L, 2L, minUs(50))) // key with no right rows -> nulls
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, minUs(10), 7L, 111L),
      (1L, minUs(10), 8L, 222L), // same instant, higher ord wins
      (1L, minUs(20), 9L, 333L))
      .toDF("user_id", "ts_us", "r_ord", "r_val")
    val got = EventOps.asofJoin(left, right, "user_id", "ts_us",
        Seq("r_val"), ordCol = "r_ord")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("r_val")).map(_.toLong)))
    assert(got.toSeq == Seq(
      (100L, Some(222L)), (101L, Some(333L)), (102L, None), (103L, None)))
  }

  test("asofJoin forward direction and tolerance bound") {
    val left = Seq(
      (100L, 1L, minUs(10)),
      (101L, 1L, minUs(40))) // nearest-after is @41, outside 30s tolerance runs below
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, minUs(10), 1L, 111L), // equal instant: inclusive for forward too
      (1L, minUs(10), 2L, 222L), // forward tie -> LEAST ord wins
      (1L, minUs(41), 3L, 333L))
      .toDF("user_id", "ts_us", "r_ord", "r_val")
    def run(tol: Option[Long]) =
      EventOps.asofJoin(left, right, "user_id", "ts_us", Seq("r_val"),
        ordCol = "r_ord", direction = "forward", toleranceUs = tol)
        .orderBy("event_id").collect()
        .map(r => Option(r.getAs[java.lang.Long]("r_val")).map(_.toLong)).toSeq
    assert(run(None) == Seq(Some(111L), Some(333L)))
    // 30s tolerance: the @40 -> @41 match (60s away) nulls out
    assert(run(Some(30L * 1000000L)) == Seq(Some(111L), None))
    // a null-ts left row matches nothing in the forward scan either
    // (desc_nulls_first — it must not steal the minimum-ts payload)
    val nullTs = Seq((200L, Some(1L), None: Option[Long]))
      .toDF("event_id", "user_id", "ts_us")
    val gotNull = EventOps.asofJoin(nullTs, right, "user_id", "ts_us",
        Seq("r_val"), ordCol = "r_ord", direction = "forward")
      .collect().map(r => Option(r.getAs[java.lang.Long]("r_val"))).toSeq
    assert(gotNull == Seq(None))
  }

  test("asofJoin never matches through null keys or null right timestamps") {
    val left = Seq((100L, Some(1L), minUs(10)), (101L, None, minUs(10)))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (None, Some(minUs(5)), 1L, 111L),    // null key: unmatchable
      (Some(1L), None, 2L, 222L),          // null ts: unmatchable
      (Some(1L), Some(minUs(5)), 3L, 333L))
      .toDF("user_id", "ts_us", "r_ord", "r_val")
    val got = EventOps.asofJoin(left, right, "user_id", "ts_us",
        Seq("r_val"), ordCol = "r_ord")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("r_val")).map(_.toLong)))
    // left null-key row survives (left-outer) with a null payload
    assert(got.toSeq == Seq((100L, Some(333L)), (101L, None)))
  }

  test("asofJoin plans as one exchange + window — no join operator") {
    val left = Seq((1L, 2L, 3L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((2L, 1L, 4L, 5L)).toDF("user_id", "ts_us", "r_ord", "r_val")
    val plan = EventOps.asofJoin(left, right, "user_id", "ts_us",
        Seq("r_val"), ordCol = "r_ord")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("funnelCounts requires ordered steps within the window") {
    val ev = Seq(
      // u1 converts fully: signup @0 -> view @10 -> purchase @20
      (0L, minUs(0), 1L, "signup", 0.0),
      (1L, minUs(10), 1L, "view", 0.0),
      (2L, minUs(20), 1L, "purchase", 0.0),
      // u2 views BEFORE signing up -> stops at step 1
      (3L, minUs(5), 2L, "view", 0.0),
      (4L, minUs(6), 2L, "signup", 0.0),
      // u3 views too late (outside the window)
      (5L, minUs(0), 3L, "signup", 0.0),
      (6L, minUs(100), 3L, "view", 0.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val got = EventOps.funnelCounts(ev, Seq("signup", "view", "purchase"),
        withinUs = minUs(30))
      .orderBy("step_seq").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "signup", 3L), (2L, "view", 1L), (3L, "purchase", 1L)))
  }

  test("mediaDupGroups groups identical payloads by digest") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((0L, "same"), (1L, "same"), (2L, "other")).toDF("doc_id", "text"),
      "doc_id", "text")
    val got = MultimodalOps.mediaDupGroups(media).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 0L && got(0).getLong(2) == 2L)
  }

  test("perceptualHash: near-dup media pairs catch what exact digest provably misses") {
    // a smooth "image": luminance ramps up then down over 481 samples
    // (one broad peak — the shape real downscaled photos have; text is
    // NOT smooth, which is why this spine keys on the decoded payload)
    def wave(n: Int): String =
      (0 until n).map { j =>
        val pos = j.toDouble / (n - 1)              // relative position
        val lum = 40 + (86 * (1 - math.abs(2 * pos - 1))).toInt
        lum.toChar
      }.mkString
    val orig = wave(481)
    // "re-encoded at 2x resolution": every sample duplicated — byte
    // content entirely different, perceptual content identical
    val resized = orig.flatMap(c => s"$c$c")
    // "corrupted in transit": three bytes flipped at scattered offsets
    val perturbed = {
      val b = orig.toCharArray
      Seq(60, 200, 400).foreach(i => b(i) = (b(i) + 5).toChar)
      new String(b)
    }
    // genuinely different image: high-frequency sawtooth (NOT a shifted/
    // mirrored copy of the peak — dHash is invariant to uniform
    // brightness shifts, and the symmetric peak is its own mirror)
    val unrelated = (0 until 481).map(j => (40 + (j * 37) % 87).toChar).mkString
    val media = MultimodalOps.attachFakeMedia(
      Seq((0L, orig), (1L, resized), (2L, perturbed), (3L, unrelated))
        .toDF("doc_id", "text"), "doc_id", "text")
    // exact digest dedup finds NOTHING — no two payloads byte-identical
    assert(MultimodalOps.mediaDupGroups(media).count() == 0L)
    // the perceptual spine pairs the original with BOTH copies
    val pairs = MultimodalOps.mediaNearDupPairs(media, bits = 48, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)), s"resized copy missed: $pairs")
    assert(pairs.contains((0L, 2L)), s"perturbed copy missed: $pairs")
    // ... and does NOT pair the unrelated image with anything
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image spuriously paired: $pairs")
    // scattered byte flips touch at most 2 bits each
    assert(pairs((0L, 2L)) <= 6L)
    // hamming to the unrelated image is large (the signatures separate)
    val ph = MultimodalOps.perceptualHash(media, bits = 48)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(ph(0L) ^ ph(3L)) > 6,
      s"expected separation, got ${java.lang.Long.bitCount(ph(0L) ^ ph(3L))}")
    // map-only signature: no exchange in the phash plan
    val plan = MultimodalOps.perceptualHash(media, bits = 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("mediaDedup collapses perceptual duplicate sets onto the canonical payload") {
    def wave(n: Int): String =
      (0 until n).map { j =>
        val pos = j.toDouble / (n - 1)
        (40 + (86 * (1 - math.abs(2 * pos - 1))).toInt).toChar
      }.mkString
    val orig = wave(481)
    val resized = orig.flatMap(c => s"$c$c")
    val perturbed = {
      val b = orig.toCharArray
      Seq(60, 200, 400).foreach(i => b(i) = (b(i) + 5).toChar)
      new String(b)
    }
    val unrelated = (0 until 481).map(j => (40 + (j * 37) % 87).toChar).mkString
    val media = MultimodalOps.attachFakeMedia(
      Seq((0L, orig), (1L, resized), (2L, perturbed), (3L, unrelated))
        .toDF("doc_id", "text"), "doc_id", "text")
    val kept = MultimodalOps.mediaDedup(media, bits = 48, maxHamming = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // {0,1,2} is one perceptual set -> canonical 0 survives; 3 untouched
    assert(kept == Set(0L, 3L), s"got $kept")
  }

  test("mediaDedupAgainstIndex flags new payloads matching the stored phash index only") {
    def wave(n: Int): String =
      (0 until n).map { j =>
        val pos = j.toDouble / (n - 1)
        (40 + (86 * (1 - math.abs(2 * pos - 1))).toInt).toChar
      }.mkString
    val orig = wave(481)
    val indexed = MultimodalOps.perceptualHash(MultimodalOps.attachFakeMedia(
      Seq((0L, orig)).toDF("doc_id", "text"), "doc_id", "text"))
    // new batch: a corrupted copy of the indexed payload + an unrelated one
    val perturbed = {
      val b = orig.toCharArray
      Seq(60, 200).foreach(i => b(i) = (b(i) + 5).toChar)
      new String(b)
    }
    val unrelated = (0 until 481).map(j => (40 + (j * 37) % 87).toChar).mkString
    val batch = MultimodalOps.attachFakeMedia(
      Seq((10L, perturbed), (11L, unrelated)).toDF("doc_id", "text"),
      "doc_id", "text")
    val hits = MultimodalOps.mediaDedupAgainstIndex(batch, indexed, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((10L, 0L)), s"got ${hits.toSeq}")
    // the standing corpus is never re-hashed: the index side of the plan
    // reads the signature frame as-is (no decode/substring over it)
    val plan = MultimodalOps.mediaDedupAgainstIndex(batch, indexed)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("decode") || plan.indexOf("decode") == plan.lastIndexOf("decode"),
      "index side must not re-decode payloads:\n" + plan.take(2000))
  }

  test("hammingNearPairs: generic spine equals brute-force on any signature column") {
    val sigs = Seq((1L, 0L), (2L, 3L), (3L, 0xF0L), (4L, 0xF1L), (5L, 0x7FFFL))
      .toDF("id", "sig")
    val got = graft.ops.DedupOps.hammingNearPairs(sigs, "id", "sig",
        bits = 16, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = for {
      Seq(a, b) <- Seq(1L -> 0L, 2L -> 3L, 3L -> 0xF0L, 4L -> 0xF1L, 5L -> 0x7FFFL)
        .combinations(2).toSeq
      h = java.lang.Long.bitCount(a._2 ^ b._2)
      if h <= 2
    } yield (math.min(a._1, b._1), math.max(a._1, b._1), h.toLong)
    assert(got == brute.toSet)
  }

  test("loadEvents adapts to both ts encodings (timestamp[us] and int64 nanos)") {
    // fixture encoding (whatever the driver shipped): ts_us must agree
    // with unix_micros/epoch semantics of the ts column itself
    val ev = EventOps.loadEvents(spark, "/root/testdata/sf0.001")
    assert(ev.columns.contains("event_id"))
    val mismatch = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.filter(expr("ts div 1000") =!= col("ts_us")).count()
      case _ =>
        ev.filter(unix_micros(col("ts").cast("timestamp")) =!= col("ts_us")).count()
    }
    assert(mismatch == 0L)

    // synthetic int64-nanos encoding: the legacy branch must still work
    val dir = java.nio.file.Files.createTempDirectory("evlong").toString
    Seq((1L, 1700000000123456789L, 10L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val evLong = EventOps.loadEvents(spark, dir)
    assert(evLong.select("ts_us").head().getLong(0) == 1700000000123456L)

    // synthetic timestamp encoding: the unix_micros branch, exact micros
    val dir2 = java.nio.file.Files.createTempDirectory("evts").toString
    Seq((2L, new java.sql.Timestamp(1700000000123L), 11L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val evTs = EventOps.loadEvents(spark, dir2)
    assert(evTs.select("ts_us").head().getLong(0) == 1700000000123000L)
  }

  test("multimodal meta digests payload bytes without decoding") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((7L, "hello")).toDF("doc_id", "text"), "doc_id", "text")
    val r = MultimodalOps.mediaMeta(media).head()
    assert(r.getLong(1) == 5L)
    assert(r.getString(2) ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("decodeFeatures runs the stubbed decode per partition deterministically") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text"), "doc_id", "text")
    val got = MultimodalOps.decodeFeatures(media).orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getInt(1) == 16 + 3 % 32)
    assert(got(0).getSeq[Float](3).length == 8)
    // deterministic: same bytes -> same features on re-run
    val again = MultimodalOps.decodeFeatures(media).orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sampleFrames emits stride-aligned offsets") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((1L, "x" * 130)).toDF("doc_id", "text"), "doc_id", "text")
    val got = MultimodalOps.sampleFrames(media, stride = 64)
      .orderBy("frame_idx").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 0L), (1L, 64L), (2L, 128L)))
  }

  test("decodeFeatures stays one plan tree (no LogicalRDD severing the lineage)") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = MultimodalOps.decodeFeatures(media)
      .queryExecution.executedPlan.toString
    // the old .rdd round-trip planned as `Scan ExistingRDD` — an opaque
    // leaf that severed pushdown/AQE/codegen from the upstream scan; the
    // Dataset-native form keeps the decode an object stage INSIDE the plan
    assert(!plan.contains("ExistingRDD"), plan.take(1500))
    assert(plan.contains("SerializeFromObject"), plan.take(1500))
    assert(plan.contains("LocalTableScan") || plan.contains("Scan"), plan.take(1500))
  }

  test("2-D dHash catches a one-row-shifted raster the 1-D hash misses") {
    // synthetic 40x40 raster, ASCII-range luminance: a vertical ramp
    // (block structure the 2-D column gradients see) + row stripes
    // (high-frequency content that scrambles the flattened 1-D samples
    // when everything moves by one row)
    val w = 40; val h = 40
    def lum(r: Int): Int = 60 + (r / 8) * 10 + (if (r % 2 == 0) 15 else -15)
    def raster(shift: Int): Array[Byte] =
      Array.tabulate(w * h) { i => lum(i / w + shift).toByte }
    val media = Seq(
      (1L, raster(0)), (2L, raster(1))).toDF("doc_id", "media")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // 2-D: block means move one row out of eight -> hash barely moves
    val h2 = MultimodalOps.perceptualHash2D(media, grid = 5)
      .orderBy("doc_id").collect().map(_.getLong(1))
    val d2 = ham(h2(0), h2(1))
    assert(d2 <= 3, s"2-D hamming $d2 should be <= 3")
    // 1-D over the flattened sequence: every sample lands one stripe
    // off -> comparisons scramble far past any near-dup threshold
    val h1 = MultimodalOps.perceptualHash(media, bits = 48)
      .orderBy("doc_id").collect().map(_.getLong(1))
    val d1 = ham(h1(0), h1(1))
    assert(d1 > 10, s"1-D hamming $d1 should scramble (> 10)")
    // and the full 2-D pair path finds the pair
    val pairs = MultimodalOps.mediaNearDupPairs2D(media, grid = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // determinism: the decode->downsample->bits chain is pure
    val again = MultimodalOps.perceptualHash2D(media, grid = 5)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(again.toSeq == h2.toSeq)
  }

  // ---- real pixel fixtures (JDK javax.imageio — BufferedImage) ----

  /** Smooth 2-D gradient, optionally inverted: strong monotone block
    * structure in both axes (col-step ~40 luma, row-step ~11 at a 5×5
    * grid) so gradient-bit signs survive lossy re-encoding noise. */
  private def gradientImage(w: Int, h: Int,
      inverted: Boolean): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = x * 200 / w + y * 55 / h
      val v = if (inverted) 255 - base else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("real pixels: a quality-re-encoded JPEG collapses through perceptualHash2D -> mediaDedup2D; digest dedup provably misses") {
    val img = gradientImage(64, 48, inverted = false)
    val png = encodePng(img)
    val jpegHq = encodeJpeg(img, 0.9f)
    // the production scenario the stub could never catch: RE-ENCODE
    // yesterday's JPEG (decode its lossy pixels, compress again lower)
    val jpegReenc = encodeJpeg(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpegHq)), 0.6f)
    val other = encodePng(gradientImage(64, 48, inverted = true))
    assert(Set(png.toSeq, jpegHq.toSeq, jpegReenc.toSeq).size == 3,
      "fixtures must be byte-distinct or the digest comparison is vacuous")
    val media = Seq((1L, png), (2L, jpegHq), (3L, jpegReenc), (4L, other))
      .toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
    // byte digest sees NOTHING (different bytes, no dup groups) …
    assert(MultimodalOps.mediaDupGroups(media).count() == 0)
    // … the real-pixel 2-D hash sees the same picture
    val hashes = MultimodalOps.perceptualHash2D(media, grid = 5)
      .orderBy("doc_id").collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(0), hashes(1)) <= 3, "PNG vs JPEG(0.9)")
    assert(ham(hashes(0), hashes(2)) <= 3, "PNG vs re-encoded JPEG(0.6)")
    assert(ham(hashes(0), hashes(3)) > 10, "inverted gradient stays distinct")
    // the full dedup chain keeps the canonical payload + the distinct one
    val kept = MultimodalOps.mediaDedup2D(media, grid = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L))
    // decodeFeatures reads TRUE dimensions from the codec, and the
    // band-mean features of the re-encodes agree to JPEG noise
    val feats = MultimodalOps.decodeFeatures(media).orderBy("doc_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getSeq[Float](3)))
    assert(feats.take(3).forall { case (w, h, _) => w == 64 && h == 48 })
    val bandDiff = feats(0)._3.zip(feats(2)._3)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(bandDiff < 0.02f, s"band means drift $bandDiff under re-encode")
    // the gradient runs left->right, so band means must be increasing
    assert(feats(0)._3.sliding(2).forall(p => p(0) < p(1)))
  }

  test("a payload that sniffs as an image but fails to decode refuses loudly") {
    val jpeg = encodeJpeg(gradientImage(32, 32, inverted = false), 0.9f)
    val truncated = jpeg.take(24) // keeps the FF D8 FF magic, loses the body
    assert(MultimodalOps.isRealImage(truncated))
    val media = Seq((1L, truncated)).toDF("doc_id", "media")
    val e = intercept[Exception] {
      MultimodalOps.decodeLuminanceGrid(media).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("refusing to hash it as raw bytes")),
      s"got: ${msgs(e).mkString(" | ")}")
  }

  test("text payloads never sniff as images: the stub path (and its oracle rows) is untouched by the real decoder") {
    val media = MultimodalOps.attachFakeMedia(
      Seq((1L, "ordinary utf-8 text"), (2L, ""), (3L, "G"),
        // adversarial: ASCII prefixes colliding with the GIF/BMP magic —
        // the structural corroboration (BMP size field, GIF version +
        // trailer) must keep these on the stub path
        (4L, "BMW sales figures for GIF89a stickers"),
        (5L, "GIF89a is the image format this document discusses"),
        (6L, "BM"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val payloads = media.select("media").collect()
      .map(_.getAs[Array[Byte]](0))
    assert(payloads.forall(b => !MultimodalOps.isRealImage(b)))
    // raw-byte forms too (attachFakeMedia may prefix; pin the raw case)
    assert(!MultimodalOps.isRealImage(
      "BMW sales figures for 2026, quarter one".getBytes("UTF-8")))
    assert(!MultimodalOps.isRealImage(
      "GIF89a is the image format this doc discusses".getBytes("UTF-8")))
    // and the grid arithmetic on a text payload is still the byte-exact
    // stub: recompute one row's expected block means from raw bytes
    val text = "the quick brown fox jumps over the lazy dog 0123456789"
    val bytes = text.getBytes("UTF-8")
    val one = Seq((7L, bytes)).toDF("doc_id", "media")
    val got = MultimodalOps.decodeLuminanceGrid(one, grid = 2)
      .collect()(0).getSeq[Int](1)
    val w = math.max(1, math.ceil(math.sqrt(bytes.length.toDouble)).toInt)
    val h = math.max(1, (bytes.length + w - 1) / w)
    val exp = for (r <- 0 until 2; c <- 0 until 2) yield {
      val r0 = r * h / 2; val r1 = math.max(r0 + 1, (r + 1) * h / 2)
      val c0 = c * w / 2; val c1 = math.max(c0 + 1, (c + 1) * w / 2)
      var sum = 0L; var cnt = 0L
      for (rr <- r0 until r1; cc <- c0 until c1) {
        val idx = rr * w + cc
        if (idx < bytes.length) { sum += bytes(idx) & 0xFF; cnt += 1 }
      }
      (sum / cnt).toInt
    }
    assert(got.toSeq == exp.toSeq)
  }
}
