package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 stress harness (committed so the BASELINE round-20 rows are
  * reproducible):
  *
  *  `gifsplit [n]` — prices the animated-GIF structural split
  *  ([[graft.ops.MultimodalOps.gifSplit]] → standalone-frame synthesis
  *  → the imageio decode chain) at corpus scale: `n` distinct 4-frame
  *  animations, each built from web-safe gray block rasters (a palette
  *  GIF represents them LOSSLESSLY, so the concatenated-PNG
  *  re-container of the same frames decodes to identical luma), plus
  *  the `n` PNG twins. videoNearDupPairs over the 2n payloads must
  *  recover EVERY (gif, twin) ground-truth pair — verified
  *  distributedly (anti-join; only counts reach the driver) — and the
  *  wall clock prices the split+decode chain against a 10× rerun for
  *  the scaling shape. Stray pairs (distinct rasters whose 40-bit
  *  phashes collide within the hamming budget) are REPORTED, not
  *  forbidden — the StressR19 convention.
  *
  *  `aiff [n]` — prices the AIFF acceptance widening: `n` distinct
  *  synthetic tracks containered as 16-bit WAV plus the SAME samples
  *  re-containered as big-endian AIFF; audioNearDupPairs at
  *  maxHamming 0 must recover every (wav, aiff) pair — the decoders
  *  normalize to one scale, so fingerprints are bit-equal — and the
  *  timing prices the big-endian chunk walk against the WAV baseline
  *  on equal material.
  *
  * Payload synthesis runs DISTRIBUTED (mapPartitions on the executors,
  * the StressR12-19 convention) and is DISK_ONLY-persisted so encode
  * cost stays out of the dedup timings; timers wrap the pair chain
  * exactly like the earlier rounds'.
  */
object StressR20 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }
  private def report(label: String, v: Any): Unit =
    println(s"[stress] $label = $v")

  /** Twin ids live at base + Twin (the ground-truth pair shape). */
  private val Twin = 10000000L

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    args.headOption.getOrElse(
        sys.error("usage: StressR20 <gifsplit|aiff> [n]")) match {
      case "gifsplit" =>
        gifSplitStress(spark, args.lift(1).map(_.toInt).getOrElse(2000))
      case "aiff" =>
        aiffStress(spark, args.lift(1).map(_.toInt).getOrElse(5000))
      case other => sys.error(s"unknown stress '$other' (gifsplit|aiff)")
    }
    spark.stop()
  }

  /** True-pair recovery check: every (i, i + Twin) for i < m must be in
    * `pairs` (id_a < id_b, so the orientation is fixed); strays are
    * counted, not forbidden. Distributed — only the two counts and the
    * pair count reach the driver. */
  private def checkPairs(spark: SparkSession, pairs: DataFrame, m: Long,
      label: String): Unit = {
    val expected = spark.range(0, m)
      .select(col("id").as("id_a"), (col("id") + Twin).as("id_b"))
    val p = pairs.select("id_a", "id_b").persist()
    val found = p.count()
    val missing = expected.join(p, Seq("id_a", "id_b"), "left_anti").count()
    report(s"$label pairs found", found)
    report(s"$label true pairs missing (must be 0)", missing)
    report(s"$label stray pairs (reported, not forbidden)", found - m + missing)
    assert(missing == 0, s"$label: $missing ground-truth pairs missed")
    p.unpersist()
  }

  /** Deterministic 64-bit mix (splitmix64 finalizer) — the per-(clip,
    * frame, block) color source; distinct clips get distinct rasters
    * with near-certainty. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 50×50 raster of 10×10 blocks, each a web-safe gray (multiples of
    * 51 — exact under ANY sane GIF palette) keyed by (id, frame,
    * block); block-aligned with the default grid-5 phash cells, so the
    * GIF and PNG round trips decode identical luma. */
  private def raster(id: Long, frame: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(50, 50,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (by <- 0 until 5; bx <- 0 until 5) {
      val g = (((mix(id * 1000003L + frame * 31L + by * 5 + bx) >>> 8)
        % 6).toInt * 51)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- by * 10 until by * 10 + 10; x <- bx * 10 until bx * 10 + 10)
        img.setRGB(x, y, rgb)
    }
    img
  }

  private def gifOf(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    frames.foreach(f =>
      w.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    w.endWriteSequence(); w.dispose(); ios.close()
    bos.toByteArray
  }

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gifSplitStress(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    import graft.ops.MultimodalOps
    def corpus(m: Int): DataFrame =
      spark.range(0, m, 1, 32).as[Long].mapPartitions { ids =>
        ids.flatMap { i =>
          val frames = (0 until 4).map(f => raster(i, f))
          Iterator(
            (i, gifOf(frames)), // the animation
            (i + Twin, frames.map(pngOf).reduce(_ ++ _))) // PNG twin
        }
      }.toDF("doc_id", "media")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    def run(label: String, m: Int): Unit = {
      val media = corpus(m)
      report(s"$label payloads", media.count()) // materialize synthesis
      val pairs = time(s"$label videoNearDupPairs (split+decode+spine)") {
        val p = MultimodalOps.videoNearDupPairs(media)
          .select("id_a", "id_b").persist()
        p.count()
        p
      }
      checkPairs(spark, pairs, m, label)
      pairs.unpersist(); media.unpersist()
    }
    run("gif", n)
    run("gif10x", n * 10)
  }

  /** 16-bit LE WAV of signed-16 samples (the StressR19 synth shape). */
  private def wavOf(samples: Array[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    bos.write("RIFF".getBytes); le32(36 + samples.length * 2)
    bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
    bos.write("data".getBytes); le32(samples.length * 2)
    samples.foreach(le16)
    bos.toByteArray
  }

  /** The SAME samples as big-endian FORM/AIFF (COMM + SSND). */
  private def aiffOf(samples: Array[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xFFFF); be16(v & 0xFFFF) }
    val dataLen = samples.length * 2
    bos.write("FORM".getBytes); be32(4 + 26 + 16 + dataLen)
    bos.write("AIFF".getBytes); bos.write("COMM".getBytes); be32(18)
    be16(1); be32(samples.length); be16(16)
    // 80-bit extended 16000 Hz: exp = 16383 + 13, mantissa normalized
    be16(16383 + 13)
    val mant = 16000L << 50
    for (k <- 7 to 0 by -1) bos.write(((mant >>> (8 * k)) & 0xFF).toInt)
    bos.write("SSND".getBytes); be32(8 + dataLen); be32(0); be32(0)
    samples.foreach(be16)
    bos.toByteArray
  }

  private def aiffStress(spark: SparkSession, n: Int): Unit = {
    import spark.implicits._
    import graft.ops.MultimodalOps
    // per-track envelope melody (the StressR19 derivation), with ONE
    // segment per contour window (33 segments × 200 samples at
    // windows = 33): every fingerprint bit compares two independent
    // per-track amplitude levels, so distinct tracks collide in the
    // 32-bit space at the birthday floor instead of through
    // within-segment ties — strays stay a report, not the workload
    def track(i: Long): Array[Int] = {
      val out = new Array[Int](33 * 200)
      for (s <- 0 until 33; k <- 0 until 200) {
        val a = 2000.0 + 700.0 * ((mix(i * 33 + s) >>> 8) % 9).toInt
        out(s * 200 + k) =
          (a * math.sin(2 * math.Pi * 440.0 * (s * 200 + k) / 16000.0)).toInt
      }
      out
    }
    val media = spark.range(0, n, 1, 32).as[Long].mapPartitions { ids =>
      ids.flatMap { i =>
        val t = track(i)
        Iterator((i, wavOf(t)), (i + Twin, aiffOf(t)))
      }
    }.toDF("doc_id", "media")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report("aiff payloads", media.count())
    val pairs = time("aiff audioNearDupPairs (decode both containers + spine)") {
      val p = MultimodalOps.audioNearDupPairs(media, windows = 33,
        maxHamming = 0).select("id_a", "id_b").persist()
      p.count()
      p
    }
    checkPairs(spark, pairs, n, "aiff")
    pairs.unpersist(); media.unpersist()
  }
}
