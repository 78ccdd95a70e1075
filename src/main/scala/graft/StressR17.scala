package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 stress harness (committed so every BASELINE round-17 row is
  * reproducible):
  *
  *  1. `mediamat [reps]` — the decode-once materialization win: the
  *     video/audio near-dup spines branch their fingerprint frame 2-4×
  *     (sizes + packed + the hamming spine's band/verify legs), so with
  *     `Materializer.Inline` the per-frame `javax.imageio` / WAV-PCM
  *     decode re-runs per branch. Measures videoNearDupPairs and
  *     audioNearDupPairs wall time at 10× under `Local` (the default —
  *     decode once at the checkpoint) vs `Inline` (the probe) on the
  *     SAME generated corpus. The round-16 verdict's media-decode
  *     recompute finding, priced.
  *
  *  2. `urlpct [reps]` — the percent-normalization chain cost: the r17
  *     rule is ~78 chained regex replaces guarded by one `instr` probe,
  *     so URLs without a `%` (most of a real crawl) must pay only the
  *     probe. Measures canonicalizeUrl throughput at 10× on (a) a
  *     %-free corpus and (b) an all-% corpus — the guard's saving and
  *     the chain's worst case, both named.
  *
  * Replication uses per-replica keys (the StressR12-16 convention);
  * invariants verify distributedly — only aggregates reach the driver.
  */
object StressR17 {
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
        sys.error("usage: StressR17 <mediamat|urlpct|boilerplate> [reps]")) match {
      case "mediamat" =>
        mediaMat(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case "urlpct" =>
        urlPct(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case "boilerplate" =>
        boilerplate(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case other =>
        sys.error(s"unknown stress '$other' (mediamat|urlpct|boilerplate)")
    }
    spark.stop()
  }

  /** Generated clip corpus: `n` clip pairs (PNG + JPEG re-encode of the
    * same 3 frames), payloads stay partition-local. Frames are 384×256
    * SINUSOIDAL plaids with per-seed frequency/phase: big enough that
    * the `javax.imageio` decode is the chain's dominant cost (the thing
    * `mediamat` prices), and phash-DIVERSE (mixed-sign block-mean
    * gradients per seed) so the pair graph stays small — a monotone
    * gradient corpus collapses to one all-zero-bit phash and the verify
    * join drowns the decode signal (measured: 9.2 s either way at 48×32
    * with 542k accidental pairs). */
  private[graft] def clipCorpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].mapPartitions { ids =>
      ids.flatMap { b =>
        def img(seed: Long): java.awt.image.BufferedImage = {
          val (w, h) = (384, 256)
          val im = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val fx = 1 + (seed % 5).toInt
          val fy = 1 + (seed % 3).toInt
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (128 + 100 * math.sin(
                2 * math.Pi * (x * fx + y * fy) / 96.0 + seed * 0.7)).toInt
              im.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          im
        }
        def png(im: java.awt.image.BufferedImage): Array[Byte] = {
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(im, "png", bos)
          bos.toByteArray
        }
        def jpg(im: java.awt.image.BufferedImage): Array[Byte] = {
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
  }

  /** Generated WAV corpus: `n` track pairs (16-bit + half-volume 8-bit
    * re-encode), 16-segment hashed envelopes (the StressR16 entropy
    * lesson: low-entropy fingerprints make chunk buckets hot). */
  private def wavCorpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].mapPartitions { ids =>
      ids.flatMap { b =>
        def env(seed: Long, s: Int): Int =
          (((seed * 2654435761L + s * 40503L) >>> 7) % 9 + 1).toInt
        def pcm(ampl: Double): Array[Int] = {
          val segLen = 8000 // 8 s tracks: the PCM decode is the cost priced
          val out = new Array[Int](16 * segLen)
          var s = 0
          while (s < 16) {
            val a = ampl * env(b, s) / 9.0
            var i = 0
            while (i < segLen) {
              val t = s * segLen + i
              out(t) = (a * math.sin(2 * math.Pi * 440 * t / 16000.0)).toInt
              i += 1
            }
            s += 1
          }
          out
        }
        def wav(samples: Array[Int], bits: Int): Array[Byte] = {
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
          samples.foreach { s =>
            if (bits == 16) le16(s & 0xFFFF)
            else bos.write(((s >> 8) + 128) & 0xFF)
          }
          bos.toByteArray
        }
        Iterator((2 * b, wav(pcm(9000.0), 16)),
          (2 * b + 1, wav(pcm(4500.0), 8)))
      }
    }.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .repartition(64)
  }

  private def mediaMat(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.{Materializer, MultimodalOps}
    val n = 1000L * reps / 10 // 10× ≈ 1k pairs = 2k clips / 2k tracks
    val clips = clipCorpus(spark, n.toInt)
    clips.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"clips (reps=$reps)", clips.count())
    // maxBucket 500: the generated corpus is deliberately hash-diverse,
    // but the residual accidental-candidate mass would still drown the
    // decode signal this row exists to price — cap it (the documented
    // low-entropy dial; identical caps on both arms, results must match)
    val nLocal = time(s"videoNearDupPairs mat=Local (reps=$reps)") {
      MultimodalOps.videoNearDupPairs(clips, maxBucket = 500).count()
    }
    val nInline = time(s"videoNearDupPairs mat=Inline (reps=$reps)") {
      MultimodalOps.videoNearDupPairs(clips, maxBucket = 500,
        mat = Materializer.Inline).count()
    }
    require(nLocal == nInline,
      s"materialization must not change results: $nLocal vs $nInline")
    report(s"video pair rows (reps=$reps)", nLocal)
    clips.unpersist()
    val wavs = wavCorpus(spark, n.toInt)
    wavs.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"wavs (reps=$reps)", wavs.count())
    val aLocal = time(s"audioNearDupPairs mat=Local (reps=$reps)") {
      MultimodalOps.audioNearDupPairs(wavs, maxBucket = 500).count()
    }
    val aInline = time(s"audioNearDupPairs mat=Inline (reps=$reps)") {
      MultimodalOps.audioNearDupPairs(wavs, maxBucket = 500,
        mat = Materializer.Inline).count()
    }
    require(aLocal == aInline,
      s"materialization must not change results: $aLocal vs $aInline")
    report(s"audio pair rows (reps=$reps)", aLocal)
    wavs.unpersist()
  }

  /** Scale shape of [[graft.ops.DedupOps.cutBoilerplateLines]]: 50k
    * docs per 10×, each 10 unique content lines + 3 lines drawn from a
    * 200-template boilerplate pool (every template's df far exceeds
    * maxDf) + 1 blank — the hot set stays POOL-sized while the corpus
    * grows, which is the broadcast anti-join's whole premise. Verifies
    * distributedly: no surviving doc carries a hot line, every doc
    * survives (content lines are unique), and exactly 3 lines were cut
    * per doc; only aggregate counts reach the driver. */
  private def boilerplate(spark: SparkSession, reps: Int): Unit = {
    import spark.implicits._
    import graft.ops.DedupOps
    val n = 50000L * reps / 10
    val docs = spark.range(n).select(col("id").as("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { i =>
          val sb = new StringBuilder
          sb.append("BOILER TEMPLATE ").append(i % 200).append('\n')
          var l = 0
          while (l < 10) {
            sb.append("content ").append(i).append(" line ").append(l)
              .append(" with some filler words ").append((i * 31 + l) % 997)
              .append('\n')
            l += 1
          }
          sb.append('\n') // blank structural line
          sb.append("BOILER TEMPLATE ").append((i + 7) % 200).append('\n')
          sb.append("BOILER FOOTER ").append((i * 3) % 200)
          (i, sb.toString)
        }
      }.toDF("doc_id", "text")
      .repartition(64)
    docs.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"docs (reps=$reps)", docs.count())
    val out = time(s"cutBoilerplateLines (reps=$reps)") {
      val o = DedupOps.cutBoilerplateLines(docs, "doc_id", "text",
        maxDf = 100)
      o.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      o.count(); o
    }
    // distributed invariants: every doc survives with exactly its 10
    // content lines + the blank kept and its 3 boilerplate lines cut
    val bad = out.filter(col("n_lines_kept") =!= 11 ||
      col("n_lines_cut") =!= 3 || col("clean_text").contains("BOILER"))
      .count()
    require(bad == 0, s"$bad docs violate the cut invariant")
    report(s"survivors (reps=$reps)", out.count())
    out.unpersist(); docs.unpersist()
  }

  private def urlPct(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.UrlOps
    val n = 600000L * reps / 10 // 10× ≈ 600k URLs
    val plain = spark.range(n).select(concat(
      lit("https://www.sub"), pmod(col("id"), lit(1000)),
      lit(".Example.com/docs/"), col("id"),
      lit("/?utm_source=feed&q="), col("id"), lit("#f")).as("url"))
    val pct = spark.range(n).select(concat(
      lit("https://www.sub"), pmod(col("id"), lit(1000)),
      lit(".Example.com/d%6Fcs%2fpath%7e"), col("id"),
      lit("/?utm%5Fsource=feed&q=%41%42"), col("id"), lit("#f")).as("url"))
    // xxhash64 fold: forces full evaluation, one long to the driver
    def drain(df: DataFrame, label: String): Unit = {
      val h = time(label) {
        df.select(UrlOps.canonicalizeUrl(col("url")).as("c"))
          .agg(bit_xor(xxhash64(col("c")))).head().getLong(0)
      }
      report(s"$label fold", h)
    }
    drain(plain, s"canonicalizeUrl percent-free (reps=$reps)")
    drain(pct, s"canonicalizeUrl all-percent (reps=$reps)")
    // the guard's contract: the %-free corpus must not pay the chain —
    // verified by the wall-time gap being reported above, and the
    // all-% corpus still canonicalizes correctly (spot invariant)
    val one = pct.limit(1)
      .select(UrlOps.canonicalizeUrl(col("url"))).head().getString(0)
    require(one.contains("/docs") && one.contains("%2F") &&
      !one.contains("utm"), s"percent rules must hold at scale: $one")
  }
}
