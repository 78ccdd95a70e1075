package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 stress harness (committed so the BASELINE round-19 rows are
  * reproducible):
  *
  *  `multianchor [reps]` — prices the multi-anchor audio fingerprint
  *  ([[graft.ops.MultimodalOps.audioFingerprintMultiAnchor]], k = 3)
  *  against the single-anchor one on the edit class the single anchor
  *  PROVABLY misses: every track re-uploaded with a LOUDER per-track
  *  outro appended (the global peak moves into the outro, re-anchoring
  *  the whole single-anchor hash). Ground truth is exact — pair (i,
  *  i + n) for every base track i — so recall has a denominator at
  *  every scale: the single anchor must find ZERO true pairs, the
  *  multi anchor ALL n, both verified distributedly (joins against the
  *  expected pair frame; only aggregates reach the driver). Stray
  *  (non-true) pairs are REPORTED, not forbidden: tracks sharing
  *  near-identical loud outro content pairing through the outro anchor
  *  is the any-match semantic working as designed, and the count
  *  prices that trade honestly.
  *
  * Replication uses per-track derived envelopes (the StressR12-18
  * convention); payloads are DISK_ONLY-persisted so synthesis stays out
  * of the timings; timers wrap construction (the pair spine's
  * materializer) exactly like the earlier rounds' chain numbers.
  */
object StressR19 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }
  private def report(label: String, v: Any): Unit =
    println(s"[stress] $label = $v")

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    args.headOption.getOrElse(
        sys.error("usage: StressR19 <multianchor|funnel> [reps]")) match {
      case "multianchor" =>
        multiAnchor(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case "funnel" =>
        funnelStress(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case other =>
        sys.error(s"unknown stress '$other' (multianchor|funnel)")
    }
    spark.stop()
  }

  /** The COMPLETE nine-stage web funnel (q_web_funnel_full's shape —
    * blocklist → url dedup → HTML extraction → boilerplate line cut →
    * normalize → quality → dedup → classifier → sample) over `reps`×
    * replicated sf0.1 documents, each wrapped as a per-line-block web
    * page with mostly-unique URLs (10% null — the null-exemption path
    * stays hot). The composition is the point: every stage is
    * individually stress-pinned in earlier rounds; this prices the
    * staged CHAIN (LocalLazy materializes each stage once for the nine
    * counts) and verifies the funnel invariants distributedly —
    * 9 ordinals, monotone counts, extraction never zero. */
  private def funnelStress(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.{Curation, Materializer}
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
    // replica-salt the TEXT (not just the id): an unsalted replica
    // makes every article line df = reps, so past maxDf the df-cut
    // eats the articles themselves and quality zeroes out (measured at
    // 100×: quality = 0 of 500k) — true df-cut behavior on literal
    // copies, but it would leave the tail stages vacuous here
    val replicated = docs
      .withColumn("r", explode(lit((0 until reps).toArray)))
      .select((col("doc_id") * reps + col("r")).as("doc_id"),
        col("source"),
        concat(col("text"), lit(" in copy "), col("r").cast("string"))
          .as("text"))
    val navLine =
      "NAVIGATION the home page and the about page and the contact page"
    val paged = replicated
      .withColumn("text", concat(
        lit("<html><head><title>S</title></head><body><nav>" +
          "<a href=\"/\">Home</a></nav><p>"),
        lit(navLine), lit("</p><p>"), col("text"), lit("</p><p>"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("this is the shared footer for group "),
            pmod(col("doc_id"), lit(2)).cast("string")))
          .otherwise(concat(lit("this is the unique tail of document "),
            col("doc_id").cast("string"))),
        lit("</p><div class=\"footer\"><a href=\"/t\">Terms</a>" +
          "</div></body></html>")))
      .withColumn("url",
        when(pmod(col("doc_id"), lit(10)) === 0,
          lit(null).cast("string"))
          .otherwise(concat(lit("http://"), col("source"),
            lit(".example.com/docs/"), col("doc_id").cast("string"))))
    paged.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"docs (reps=$reps)", paged.count())
    val weights = {
      import spark.implicits._
      Seq(("the", 1L), ("and", 1L), ("zzzneverseen", -100L))
        .toDF("term", "weight")
    }
    val funnel = time(s"nine-stage funnel (reps=$reps)") {
      Curation.funnel(paged, "doc_id", "text", weights,
        mat = Materializer.LocalLazy, urlCol = "url",
        blockedDomains = Seq("spamhub.example"), boilerplateMaxDf = 10,
        fromHtml = true)
        .orderBy("stage_ord").collect()
    }
    funnel.foreach(r => report(s"stage ${r.getLong(0)} ${r.getString(1)}",
      r.getLong(2)))
    require(funnel.length == 9, s"nine stages expected: ${funnel.length}")
    val counts = funnel.map(_.getLong(2))
    require(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      "funnel counts must be monotone non-increasing")
    require(counts(3) > 0, "extraction must keep documents")
    require(counts(5) > 0,
      "quality must keep documents — the salt keeps article lines " +
        "under the df-cut, so a zero here is a chain defect")
  }

  /** 16-bit mono PCM WAV around the samples (the MediaFixtures builder's
    * scale-generator twin — specs own the canonical copy). */
  private def wavBytes(samples: Array[Int], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); le32(36 + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16); le16(1); le16(1)
    le32(rate); le32(rate * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(dataLen)
    samples.foreach(s => le16(s & 0xFFFF))
    bos.toByteArray
  }

  private def sine(env: Seq[Int], ampl: Double, segLen: Int,
      freq: Double): Array[Int] = {
    val out = new Array[Int](env.length * segLen)
    val mx = env.max
    for (s <- env.indices; i <- 0 until segLen) {
      val a = ampl * env(s) / mx
      out(s * segLen + i) =
        (a * math.sin(2 * math.Pi * freq * (s * segLen + i) / 16000.0)).toInt
    }
    out
  }

  private val SegLen = 400

  /** Base track i: 24-segment envelope with the GLOBAL max pinned at
    * segment 2 (so the anchored span fits strictly inside the base
    * material) and a per-track derived tail; edited twin i + n: the
    * SAME samples with a LOUDER per-track outro appended. */
  private def corpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].mapPartitions { ids =>
      ids.flatMap { i =>
        val env = Seq(3, 5, 10) ++
          (3 until 24).map(s => 1 + ((i * 31 + s * 17 + i * s) % 9).toInt)
        // per-track base frequency: same-pitch corpora leave the contour
        // hash only the ~15 env-step sign bits of entropy (measured:
        // 56k accidental pairs over 2k tracks at 440 Hz flat) — distinct
        // pitches restore the intra-segment wiggle entropy real corpora
        // have, so stray counts price the op, not the fixture
        val base = sine(env, ampl = 6000.0, SegLen,
          freq = 300.0 + (i * 7 % 411))
        val outroEnv = Seq(12) ++
          (1 until 6).map(s => 1 + ((i * 13 + s * 29) % 11).toInt)
        val outro = sine(outroEnv, ampl = 9000.0, SegLen,
          freq = 880.0 + (i % 97))
        Iterator(
          (i, wavBytes(base, 16000)),
          (i + n, wavBytes(base ++ outro, 16000)))
      }
    }.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .repartition(64)
  }

  private def multiAnchor(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.MultimodalOps
    val n = 1000 * reps / 10 // 10× ≈ 1k true pairs = 2k tracks
    val tracks = corpus(spark, n)
    tracks.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"tracks (reps=$reps)", tracks.count())
    val truth = tracks.sparkSession.range(n)
      .select(col("id").as("id_a"), (col("id") + n).as("id_b"))

    val singlePairs = time(s"single-anchor pairs (reps=$reps)") {
      val p = MultimodalOps.audioNearDupPairs(tracks, windows = 48,
        maxHamming = 0, anchored = true, frameLen = 128)
      p.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY).count()
      p
    }
    val multiPairs = time(s"multi-anchor k=3 pairs (reps=$reps)") {
      val p = MultimodalOps.audioNearDupPairsMulti(tracks, windows = 48,
        frameLen = 128, anchors = 3, maxHamming = 0)
      p.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY).count()
      p
    }
    val singleTrue = singlePairs.join(truth, Seq("id_a", "id_b")).count()
    val multiTrue = multiPairs.join(truth, Seq("id_a", "id_b")).count()
    report("single-anchor: true pairs found", s"$singleTrue of $n")
    report("single-anchor: stray pairs",
      singlePairs.count() - singleTrue)
    report("multi-anchor:  true pairs found", s"$multiTrue of $n")
    report("multi-anchor:  stray pairs (shared-loud-content any-match)",
      multiPairs.count() - multiTrue)
    require(singleTrue == 0,
      "the outro edit must defeat the single anchor — fixture broken")
    require(multiTrue == n,
      s"multi-anchor must recover ALL $n outro-edited pairs, got $multiTrue")
  }
}
