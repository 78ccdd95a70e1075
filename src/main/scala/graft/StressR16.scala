package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, TextOps}

/** Round-16 stress harness (committed so every BASELINE round-16 row is
  * reproducible):
  *
  *  1. `passages [reps]` — the PRICED exactness option for passage
  *     dedup: stride-1 two-level exact ([[DedupOps.duplicatedPassagesExact]])
  *     vs the stride-1 string explode vs the stride-3 sampler, at
  *     10×/100×, in BOTH regimes: salted replicas (dup-free corpus —
  *     level-1 pruning's best case) and verbatim replicas (every window
  *     duplicated — its worst case). Exactness is verified
  *     distributedly against the byte-keyed brute force.
  *  2. `unigramguard [reps]` — the degenerate-corpus refusal: one
  *     space-free 200k-char "word" (a base64 blob) must REFUSE in
  *     seconds with maxWordLen named — before the substring explode —
  *     and the trainer must complete at 10×/100× on the real corpus.
  *
  * Documents replicate the sf0.1 table with per-replica keys (the
  * StressR12-15 convention); invariants verify distributedly — only
  * aggregate rows reach the driver.
  */
object StressR16 {
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    args.headOption.getOrElse(
        sys.error("usage: StressR16 <passages|unigramguard> [reps]")) match {
      case "passages" =>
        passages(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "unigramguard" =>
        unigramGuard(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "media" =>
        media(spark, args.lift(1).map(_.toInt).getOrElse(100))
      case other =>
        sys.error(s"unknown subcommand '$other' (passages|unigramguard|media)")
    }
    spark.stop()
  }

  private def replicatedDocs(spark: SparkSession, sfDir: String,
      reps: Int, salted: Boolean): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
    val text =
      if (!salted) col("text")
      // per-DOC word salt: every word carries its (replicated) doc key,
      // so NO window repeats across documents — the dup-free regime
      // (level-1 pruning's best case; verbatim replication is its
      // worst: every window duplicated)
      else regexp_replace(col("text"), lit("(^| )"),
        concat(lit("$1d"),
          (col("doc_id") * reps + col("__rep")).cast("string"), lit("_")))
    base.select((col("doc_id") * reps + col("__rep")).as("doc_id"),
        text.as("text"))
      .repartition(64, col("doc_id"))
  }

  private def passages(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    // win=6 is the oracle dial (tiny strings — the two-level plan's
    // 8-byte hashes buy little); win=20 approaches the ExactSubstr
    // production shape (Lee et al. use 50-token windows) where the
    // string explode shuffles ~15× more bytes per window
    for (reps <- Seq(10, maxReps).distinct; win <- Seq(6, 20);
         salted <- Seq(true, false)) {
      val tag = s"reps=$reps win=$win salted=$salted"
      val docs = replicatedDocs(spark, sfDir, reps, salted)
      docs.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      report(s"corpus rows ($tag)", docs.count())
      val exact = time(s"two-level exact stride-1 ($tag)") {
        DedupOps.duplicatedPassagesExact(docs, "doc_id", "text", win)
          .agg(count(lit(1)), coalesce(sum("n_occurrences"), lit(0L))).head()
      }
      report(s"exact passages/occurrences ($tag)", exact)
      val strings = time(s"string-explode stride-1 ($tag)") {
        DedupOps.duplicatedPassages(docs, "doc_id", "text", win,
            stride = 1, hashKey = true)
          .agg(count(lit(1)), coalesce(sum("n_occurrences"), lit(0L))).head()
      }
      report(s"string-explode passages/occurrences ($tag)", strings)
      val strided = time(s"stride-3 sampler ($tag)") {
        DedupOps.duplicatedPassages(docs, "doc_id", "text", win,
            stride = 3, hashKey = true)
          .agg(count(lit(1))).head()
      }
      report(s"stride-3 passages ($tag)", strided)
      // exactness: the two-level plan == byte-keyed brute force,
      // verified distributedly (anti-joins in both directions)
      if (reps == 10) {
        val a = DedupOps.duplicatedPassagesExact(docs, "doc_id", "text", win)
        val b = DedupOps.duplicatedPassages(docs, "doc_id", "text", win,
          stride = 1, hashKey = false)
        val onlyA = a.join(b, Seq("passage"), "left_anti").count()
        val onlyB = b.join(a, Seq("passage"), "left_anti").count()
        require(onlyA == 0 && onlyB == 0,
          s"two-level exact drifted from brute force: +$onlyA/-$onlyB")
        report(s"exact == brute force ($tag)", "verified")
      }
      docs.unpersist()
    }
  }

  /** Video + audio dedup at 10×/100× (n = 500·reps planted PAIRS each):
    * clips and wavs are REAL encodes generated IN THE EXECUTORS
    * (ImageIO / hand-rolled RIFF — payload bytes never visit the
    * driver), each pair = the same content under a different codec
    * (PNG vs JPEG 0.9; 16-bit full volume vs 8-bit half volume). The
    * invariant is pair-level RECALL, robust to accidental cross-pattern
    * merges on the limited synthetic pattern space: both members of
    * every planted pair must land in the same CC cluster — verified
    * distributedly (label equality per pair; one aggregate row to the
    * driver). */
  private def media(spark: SparkSession, maxReps: Int): Unit = {
    import spark.implicits._
    for (reps <- Seq(10, maxReps).distinct) {
      val n = 500 * reps
      // --- video ---
      val clips = spark.range(n).select(col("id")).as[Long].mapPartitions {
        ids =>
          // in-memory streams: the default per-encode FILE cache churns
          // one /tmp file per image — 300k encodes of 6 KB rasters
          // thrash the fd table long before memory matters
          javax.imageio.ImageIO.setUseCache(false)
          ids.flatMap { b =>
            def img(seed: Long) = {
              // 5×5 flat blocks, each block's luma a hash of (seed,
              // block): frame phashes are ~uniform over the 40-bit
              // space, so 300k frames stay DISTINCT — a realistic
              // corpus. (A gradient family has only ~1k distinct sign
              // patterns; at 100k clips that collapses every pigeonhole
              // bucket into a cap-dropped hotspot — an all-same-content
              // corpus, not a scale test.) Flat blocks also survive
              // JPEG 0.9 (block MEANS barely move), keeping planted
              // re-encode pairs within maxHamming.
              val w = 40; val h = 40
              val im = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              for (y <- 0 until h; x <- 0 until w) {
                val bx = x * 5 / w; val by = y * 5 / h
                // x^17 finalizer for real mixing (k·A's low byte is
                // LINEAR in k — every frame would be a shifted copy of
                // one progression, same sign pattern again)
                val m = graft.functions.HashKernels.finalizeHash(
                  seed * 25 + by * 5 + bx + 1)
                val v = (m % 256L).toInt
                im.setRGB(x, y, (v << 16) | (v << 8) | v)
              }
              im
            }
            def png(im: java.awt.image.BufferedImage) = {
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(im, "png", bos); bos.toByteArray
            }
            def jpg(im: java.awt.image.BufferedImage) = {
              val wr = javax.imageio.ImageIO
                .getImageWritersByFormatName("jpg").next()
              val bos = new java.io.ByteArrayOutputStream()
              val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
              try {
                wr.setOutput(ios)
                val p = wr.getDefaultWriteParam
                p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
                p.setCompressionQuality(0.9f)
                wr.write(null, new javax.imageio.IIOImage(im, null, null), p)
              } finally { wr.dispose(); ios.close() }
              bos.toByteArray
            }
            val frames = Seq(img(3 * b), img(3 * b + 1), img(3 * b + 2))
            Iterator((2 * b, frames.map(png).reduce(_ ++ _)),
              (2 * b + 1, frames.map(jpg).reduce(_ ++ _)))
          }
      }.toDF("doc_id", "media")
        .withColumn("n_bytes", length(col("media")).cast("long"))
        .repartition(64)
      clips.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      report(s"clips (reps=$reps)", clips.count())
      val vPairs = time(s"videoNearDupPairs (reps=$reps)") {
        val p = graft.ops.MultimodalOps.videoNearDupPairs(clips)
        p.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count(); p
      }
      val vClusters = graft.ops.DedupOps.nearDupClusters(
        vPairs.select("id_a", "id_b"), clips.select(col("doc_id")), "doc_id")
      val vMissed = vClusters
        .select(expr("doc_id div 2").as("pair"), col("cluster_id"))
        .groupBy("pair")
        .agg(countDistinct(col("cluster_id")).as("nl"))
        .filter(col("nl") =!= 1).count()
      require(vMissed == 0, s"$vMissed planted clip pairs did not collapse")
      report(s"planted clip-pair recall (reps=$reps)", "1.0")
      vPairs.unpersist(); clips.unpersist()
      // --- audio ---
      val wavs = spark.range(n).select(col("id")).as[Long].mapPartitions {
        ids =>
          ids.flatMap { b =>
            // 16-segment hashed amplitude envelope: ~9^16 contour
            // patterns, so 48-bit fingerprints spread across the
            // pigeonhole buckets. (An 8-segment/9-level envelope has
            // ~15 informative bits — at 80k wavs the chunk buckets go
            // HOT and the candidate join quadratic: measured 34 s at
            // 20k wavs but 1238 s at 80k. Low-entropy signatures are a
            // corpus property; the dial for real corpora like that is
            // maxBucket, whose cap telemetry names the drop.)
            val env = (0 until 16).map(s =>
              1 + (graft.functions.HashKernels.finalizeHash(
                b * 16 + s + 1) % 9).toInt)
            def pcm(ampl: Double) = {
              val segLen = 200
              val out = new Array[Int](env.length * segLen)
              for (s <- env.indices; i <- 0 until segLen) {
                val a = ampl * env(s) / 9.0 // envelope levels 1..9
                out(s * segLen + i) = (a * math.sin(
                  2 * math.Pi * 440 * (s * segLen + i) / 16000.0)).toInt
              }
              out
            }
            def wav(samples: Array[Int], bits: Int) = {
              val bytesPer = bits / 8
              val dataLen = samples.length * bytesPer
              val bos = new java.io.ByteArrayOutputStream()
              def le16(v: Int): Unit = {
                bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
              }
              def le32(v: Int): Unit = {
                le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF)
              }
              bos.write("RIFF".getBytes); le32(36 + dataLen)
              bos.write("WAVE".getBytes)
              bos.write("fmt ".getBytes); le32(16); le16(1); le16(1)
              le32(16000); le32(16000 * bytesPer); le16(bytesPer); le16(bits)
              bos.write("data".getBytes); le32(dataLen)
              for (s <- samples)
                if (bits == 16) le16(s & 0xFFFF)
                else bos.write(((s >> 8) + 128) & 0xFF)
              bos.toByteArray
            }
            Iterator((2 * b, wav(pcm(9000.0), 16)),
              (2 * b + 1, wav(pcm(4500.0), 8))) // re-encode: half vol, 8-bit
          }
      }.toDF("doc_id", "media")
        .withColumn("n_bytes", length(col("media")).cast("long"))
        .repartition(64)
      wavs.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      report(s"wavs (reps=$reps)", wavs.count())
      val aPairs = time(s"audioNearDupPairs (reps=$reps)") {
        val p = graft.ops.MultimodalOps.audioNearDupPairs(wavs,
          windows = 49, maxHamming = 3)
        p.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count(); p
      }
      val aClusters = graft.ops.DedupOps.nearDupClusters(
        aPairs.select("id_a", "id_b"), wavs.select(col("doc_id")), "doc_id")
      val aMissed = aClusters
        .select(expr("doc_id div 2").as("pair"), col("cluster_id"))
        .groupBy("pair")
        .agg(countDistinct(col("cluster_id")).as("nl"))
        .filter(col("nl") =!= 1).count()
      require(aMissed == 0, s"$aMissed planted wav pairs did not collapse")
      report(s"planted wav-pair recall (reps=$reps)", "1.0")
      aPairs.unpersist(); wavs.unpersist()
    }
  }

  private def unigramGuard(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    import spark.implicits._
    // 1. refusal speed: one pathological space-free 200k-char word in an
    // otherwise healthy corpus must refuse BEFORE the substring explode
    val blob = "A" * 200000
    val poisoned = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull).select("doc_id", "text")
      .unionByName(Seq((-1L, blob)).toDF("doc_id", "text"))
    val refused = time("refusal on a 200k-char space-free word") {
      try { TextOps.trainUnigramVocab(poisoned, "text", 200); false }
      catch {
        case e: IllegalArgumentException
            if e.getMessage.contains("maxWordLen") => true
      }
    }
    require(refused, "trainer must refuse the degenerate corpus")
    report("refusal", "maxWordLen named, pre-explode")
    // 2. trainer scale: the real corpus replicated (word histogram
    // absorbs replication — distinct words stay constant, frequencies
    // scale; wall must track the ONE corpus pass)
    for (reps <- Seq(10, maxReps).distinct) {
      val docs = replicatedDocs(spark, sfDir, reps, salted = false)
      val vocab = time(s"trainUnigramVocab (reps=$reps)") {
        TextOps.trainUnigramVocab(docs, "text", vocabSize = 200)
      }
      report(s"vocab size (reps=$reps)", vocab.size)
      require(vocab.nonEmpty && vocab.forall(_._2 < 0L))
    }
  }
}
