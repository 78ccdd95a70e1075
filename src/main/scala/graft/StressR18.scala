package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 stress harness (committed so every BASELINE round-18 row is
  * reproducible):
  *
  *  1. `mp4split [reps]` — the ISO-BMFF structural split: the SAME
  *     frame sets once as bare MJPEG-style concatenation and once
  *     MP4-wrapped (`mp4Keyframes`' stss/stsz/stsc/stco walk). Prices
  *     the box-tree walk against the concatenation scan (both are
  *     byte-local and dwarfed by the imageio decode — the number that
  *     proves the wrapper is free at scale) and verifies distributedly
  *     that every concat↔MP4 twin collapses through videoNearDupPairs
  *     with full coverage: container wrapping must never hide
  *     identical keyframes.
  *
  *  2. `gatedecode [reps]` — the r18 decode-once gate win: one
  *     micro-batch against a standing frame-hash index composed the
  *     r17 way (videoDedup + videoNearDupAgainstIndex + a fresh
  *     videoFrameHashes of the survivors = THREE payload decodes) vs
  *     the r18 way (ONE materialized videoFrameHashes threaded through
  *     the same three consumers). Identical survivor sets required;
  *     the wall-clock ratio is the gate's per-batch saving.
  *
  * Replication uses per-replica keys (the StressR12-17 convention);
  * invariants verify distributedly — only aggregates reach the driver.
  */
object StressR18 {
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
        sys.error("usage: StressR18 <mp4split|gatedecode> [reps]")) match {
      case "mp4split" =>
        mp4Split(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case "gatedecode" =>
        gateDecode(spark, args.lift(1).map(_.toInt).getOrElse(10))
      case other =>
        sys.error(s"unknown stress '$other' (mp4split|gatedecode)")
    }
    spark.stop()
  }

  /** Minimal valid ISO-BMFF wrapper around still frames (one `vide`
    * trak, `jpeg` stsd format, one chunk, per-sample stsz, no stss —
    * every sample sync). The production parser's own fixtures live in
    * the specs; this is the scale-generator twin. */
  private def mp4Wrap(frames: Seq[Array[Byte]]): Array[Byte] = {
    def be32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ tag.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "isom".getBytes("US-ASCII"))
    val mdat = box("mdat", frames.reduce(_ ++ _))
    val stsd = box("stsd", be32(0) ++ be32(1) ++
      (be32(16) ++ "jpeg".getBytes("US-ASCII") ++ new Array[Byte](8)))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.length) ++
      frames.flatMap(f => be32(f.length)).toArray)
    val stsc = box("stsc",
      be32(0) ++ be32(1) ++ be32(1) ++ be32(frames.length) ++ be32(1))
    val stco = box("stco", be32(0) ++ be32(1) ++ be32(ftyp.length + 8))
    val hdlr = box("hdlr",
      be32(0) ++ be32(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](12))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
    val moov = box("moov", box("trak",
      box("mdia", hdlr ++ box("minf", stbl))))
    ftyp ++ mdat ++ moov
  }

  /** `n` twin pairs: even doc_id = bare JPEG concatenation, odd = the
    * SAME JPEG frames MP4-wrapped (the clipCorpus plaid generator for
    * decode-dominated, phash-diverse frames). */
  private def twinCorpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val jpegClips = StressR17.clipCorpus(spark, n)
      .filter(pmod(col("doc_id"), lit(2)) === 1) // the JPEG arm
      .select((col("doc_id") - 1).as("base"), col("media"))
    jpegClips.as[(Long, Array[Byte])].mapPartitions { rows =>
      rows.flatMap { case (base, concat) =>
        // re-split the concatenation into its 3 frames via the
        // production structural walk, then wrap the same frames
        var frames = List.empty[Array[Byte]]
        var pos = 0
        while (pos < concat.length) {
          val end = graft.ops.MultimodalOps.jpegEnd(concat, pos)
          require(end > pos, s"clip $base: structural walk failed at $pos")
          frames ::= java.util.Arrays.copyOfRange(concat, pos, end)
          pos = end
        }
        Iterator((base, concat), (base + 1, mp4Wrap(frames.reverse)))
      }
    }.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .repartition(64)
  }

  private def mp4Split(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.MultimodalOps
    val n = 1000 * reps / 10 // 10× ≈ 1k twin pairs = 2k clips, 6k frames
    val twins = twinCorpus(spark, n)
    twins.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"clips (reps=$reps)", twins.count())
    val concatFrames = time(s"splitKeyframes concat arm (reps=$reps)") {
      MultimodalOps.splitKeyframes(
        twins.filter(pmod(col("doc_id"), lit(2)) === 0)).count()
    }
    val mp4Frames = time(s"splitKeyframes mp4 arm (reps=$reps)") {
      MultimodalOps.splitKeyframes(
        twins.filter(pmod(col("doc_id"), lit(2)) === 1)).count()
    }
    require(concatFrames == mp4Frames && concatFrames == 3L * n,
      s"both arms must recover all frames: $concatFrames vs $mp4Frames")
    // the exact invariant, verified distributedly and independent of
    // bucket caps: every twin's MP4 frame hashes EQUAL its concat
    // twin's (wrapping must never change a frame's bytes, hence its
    // phash) — an inner join on (twin base, frame_idx) must match all
    // 3n frames with equal hashes
    val fh = MultimodalOps.videoFrameHashes(twins)
      .withColumn("base", expr("doc_id div 2"))
    val matched = fh.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("base"), col("frame_idx"), col("phash").as("pc"))
      .join(fh.filter(pmod(col("doc_id"), lit(2)) === 1)
        .select(col("base"), col("frame_idx"), col("phash").as("pm")),
        Seq("base", "frame_idx"))
      .filter(col("pc") === col("pm")).count()
    require(matched == 3L * n,
      s"container wrapping changed frame content: $matched of ${3L * n}")
    report(s"twin frames hash-identical (reps=$reps)", matched)
    // timing row only (candidate caps shared with mediamat's dial):
    // the pair spine over the mixed concat+MP4 corpus
    val pairs = time(s"videoNearDupPairs over twins (reps=$reps)") {
      MultimodalOps.videoNearDupPairs(twins, maxBucket = 500).count()
    }
    report(s"pair rows (reps=$reps)", pairs)
    twins.unpersist()
  }

  /** Checkerboard clip corpus — phash-DISTANT from the plaid corpus
    * (hard-edged alternating blocks vs smooth sinusoids: the 2-D
    * gradient signs differ at most grid cells), so against a plaid
    * index these clips are genuinely NEW material that must survive
    * into the index fold. Per-seed cell size/phase keeps them distinct
    * from each other too. */
  private def checkerCorpus(spark: SparkSession, m: Int,
      idOffset: Long): DataFrame = {
    import spark.implicits._
    spark.range(m).select(col("id")).as[Long].mapPartitions { ids =>
      ids.map { b =>
        def img(seed: Long): java.awt.image.BufferedImage = {
          val (w, h) = (384, 256)
          val im = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val cell = 6 + (seed % 11).toInt
          val ph = (seed % 2).toInt
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = if ((x / cell + y / cell + ph) % 2 == 0) 25 else 230
              im.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          im
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
        (idOffset + b, frames.map(jpg).reduce(_ ++ _))
      }
    }.toDF("doc_id", "media")
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .repartition(64)
  }

  private def gateDecode(spark: SparkSession, reps: Int): Unit = {
    import graft.ops.{Materializer, MultimodalOps}
    val n = 600 * reps / 10
    // batch = re-deliveries of indexed plaid material (drop at the
    // against-index check) + genuinely new checker clips (survive into
    // the fold — so the r17 shape's third decode has real work; an
    // all-dup batch would let it decode nothing and the comparison
    // would be vacuous)
    val plaids = StressR17.clipCorpus(spark, n / 2)
    val batch = plaids.unionByName(
      checkerCorpus(spark, n, 1000000L))
    batch.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    report(s"batch clips (reps=$reps)", batch.count())
    // standing index: the plaid seed range as stored longs
    val index = Materializer.Local(MultimodalOps.videoFrameHashes(plaids))
    def survivorsOf(selfDeduped: DataFrame, hits: DataFrame): DataFrame =
      selfDeduped.join(hits.select(col("id_new").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // r17 shape: three independent decodes of the batch payloads
    val ids17 = time(s"gate batch r17 shape, 3 decodes (reps=$reps)") {
      val self17 = MultimodalOps.videoDedup(batch, maxBucket = 500)
      val surv17 = survivorsOf(self17, MultimodalOps
        .videoNearDupAgainstIndex(self17, index, maxBucket = 500))
      MultimodalOps.videoFrameHashes(surv17) // the index-fold decode
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    }
    // r18 shape: ONE materialized hash frame threads all three uses
    val ids18 = time(s"gate batch r18 shape, 1 decode (reps=$reps)") {
      val fh = MultimodalOps.videoFrameHashes(batch)
      val self18 = MultimodalOps.videoDedupFromHashes(batch, fh,
        maxBucket = 500)
      val surv18 = survivorsOf(self18,
        MultimodalOps.videoNearDupAgainstIndexFromHashes(
          fh.join(self18.select("doc_id"), Seq("doc_id")), index,
          maxBucket = 500))
      fh.join(surv18.select("doc_id"), Seq("doc_id"))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    }
    require(ids17 == ids18,
      s"gate shapes disagree: ${ids17.size} vs ${ids18.size} survivors")
    require(ids18.nonEmpty, "fixture degenerated: zero survivors means " +
      "the index-fold arm decoded nothing and the comparison is vacuous")
    report(s"gate survivors (reps=$reps)", ids18.size)
    batch.unpersist()
  }
}
