package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{DedupOps, SampleOps, SimilarityOps, TextOps}

/** Round-14 stress harness (committed so every BASELINE round-14 row is
  * reproducible):
  *
  *  1. `respq [reps]` — residual IVF-PQ (classical IVFADC) at the 2M
  *     point: residual index build + standing-index query wall vs the
  *     raw-code mode at EQUAL code size, plus recall@10 of both against
  *     brute-force ground truth at 100× (trained codebooks, 20 queries
  *     spread across distinct base vectors).
  *  2. `padded [reps]` — no-straddle padded SFT packing at 100×: wall
  *     vs concat-and-cut over the same replicated supervised corpus,
  *     and the measured padding-waste fraction (the isolation trade).
  *
  * Vectors/documents replicate the sf0.1 tables with per-replica keys
  * (the StressR12/13 convention); invariants verify distributedly —
  * only aggregate rows reach the driver.
  */
object StressR14 {
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
        sys.error("usage: StressR14 <respq|padded> [reps]")) match {
      case "respq" =>
        resPq(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(1000))
      case "padded" =>
        padded(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "decontam" =>
        decontam(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "dsir" =>
        dsir(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case other =>
        sys.error(s"unknown subcommand '$other' (respq|padded|decontam|dsir)")
    }
    spark.stop()
  }

  /** Perturbed replicated vectors — the StressR13 generator verbatim
    * (per-replica hash jitter keeps neighbors non-degenerate). */
  private def perturbedVectors(spark: SparkSession, sfDir: String,
      reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__key", col("vec_id") * reps + col("__rep"))
      .select(col("__key").as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + ((pmod(xxhash64(col("__key"), i), lit(101)) - 50).cast("float")
            * lit(2e-3f))).cast("float")).as("embedding"))
      .repartition(64, col("vec_id"))

  private def resPq(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    // train on a deterministic sample OF THE INDEXED CORPUS (8k of the
    // 100× replicas), not the base rows: the centroids are trained from
    // the same distribution they will quantize, and the residual
    // codebook sees representative residuals — training on the base
    // rows (whose own residuals are degenerately small, since the
    // coarse centroids fit them directly) starves the residual
    // codebook of the variance it must cover (measured: that protocol
    // flips the residual-vs-raw comparison)
    val sample = SampleOps.hashSample(
        perturbedVectors(spark, sfDir, 100), col("vec_id"), 4, 100)
      .persist(StorageLevel.DISK_ONLY)
    report("training sample", sample.count())
    val centroids = time("trainCentroids K=256 (corpus sample)") {
      val c = SimilarityOps.trainCentroids(sample, "vec_id", "embedding",
        k = 256).persist(StorageLevel.DISK_ONLY)
      c.count(); c
    }
    val rawCb = time("trainPqCodebook m=8 ksub=64 (corpus sample)") {
      val c = SimilarityOps.trainPqCodebook(sample, "vec_id", "embedding",
        m = 8, ksub = 64).persist(StorageLevel.DISK_ONLY)
      c.count(); c
    }
    val resCb = time("trainPqResidualCodebook m=8 ksub=64 (corpus sample)") {
      val c = SimilarityOps.trainPqResidualCodebook(sample, centroids,
        "vec_id", "embedding", m = 8, ksub = 64)
        .persist(StorageLevel.DISK_ONLY)
      c.count(); c
    }
    sample.unpersist()
    // quality at 100×: CLUSTER precision@10, residual vs raw at EQUAL
    // code size. The replica corpus makes plain recall@10 vs brute
    // force meaningless: a query's 99 jittered siblings are mutually
    // unresolvable at any code size (jitter ≪ inter-cluster distance),
    // so brute-force top-10 is a tie-break among them and "recall"
    // measures luck (hypergeometric floor 10/99 ≈ 0.10 — the first run
    // of this harness measured exactly that family, 0.19-0.25 for both
    // variants, flat in nprobe). The resolvable question at scale is
    // "did ADC rank the RIGHT base cluster above the other clusters in
    // the probed cells" — precision of retrieved candidates against
    // the query's base-cluster membership (sibling set 99 ≥ k, ideal
    // 1.0), which is what shortlist quality bounds at 100 TB.
    locally {
      val reps = 100
      val vecs = perturbedVectors(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      val n = vecs.count()
      val queries = vecs.filter(col("vec_id") % (reps * 100L) === 0L)
      def precisionOf(cb: DataFrame, residual: Boolean, nprobe: Int): Double =
        SimilarityOps.ivfPqTopK(queries, vecs, centroids, cb,
            "vec_id", "embedding", k = 10, nprobe = nprobe,
            residual = residual)
          .agg(avg((expr(s"q_id div $reps") === expr(s"c_id div $reps"))
            .cast("double")))
          .head().getDouble(0)
      for (nprobe <- Seq(2, 8)) {
        val pr = time(s"precision residual ${reps}x ($n vectors) nprobe=$nprobe") {
          precisionOf(resCb, residual = true, nprobe)
        }
        val pw = time(s"precision raw ${reps}x nprobe=$nprobe") {
          precisionOf(rawCb, residual = false, nprobe)
        }
        report(s"cluster-precision@10 ${reps}x nprobe=$nprobe",
          f"residual=$pr%.3f raw=$pw%.3f (equal 64-bit codes)")
      }
      vecs.unpersist()
    }
    // the 2M point: index build + standing-index query wall, both modes
    locally {
      val reps = maxReps
      val vecs = perturbedVectors(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      val n = vecs.count()
      val queries = vecs.filter(col("vec_id") % (reps * 100L) === 0L)
      for ((label, cb, res) <- Seq(
          ("residual", resCb, true), ("raw", rawCb, false))) {
        val index = time(s"ivfPqIndex[$label] build ${reps}x ($n vectors)") {
          val ix = SimilarityOps.ivfPqIndex(vecs, centroids, cb,
            "vec_id", "embedding", residual = res)
            .persist(StorageLevel.DISK_ONLY)
          ix.count(); ix
        }
        time(s"ivfPqTopKFromIndex[$label] ${reps}x k=10 nprobe=2 K=256") {
          SimilarityOps.ivfPqTopKFromIndex(queries, index, centroids, cb,
            "vec_id", "embedding", k = 10, nprobe = 2, residual = res)
            .write.format("noop").mode("overwrite").save()
        }
        index.unpersist()
      }
      vecs.unpersist()
    }
    centroids.unpersist(); rawCb.unpersist(); resCb.unpersist()
  }

  /** Replicated supervised examples (prompt = head, completion = tail,
    * per-replica tag in the completion keeps every pair distinct). */
  private def sftDocs(spark: SparkSession, sfDir: String,
      reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(concat(col("doc_id"), lit("#"), col("__rep")).as("key"),
        substring(col("text"), 1, 48).as("prompt"),
        concat(substring(col("text"), 49, Int.MaxValue), lit(" #"),
          col("__rep")).as("completion"))
      .repartition(64, col("key"))

  /** Replicated documents with per-replica dense ids (texts identical
    * across replicas — decontamination/DSIR work is per-document, so
    * replication scales the corpus side without changing hit shape). */
  private def replicatedDocs(spark: SparkSession, sfDir: String,
      reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("doc_id") * reps + col("__rep")).as("doc_id"), col("text"))
      .repartition(64, col("doc_id"))

  /** Span decontamination at 100×: doc-flag vs join-scrub vs map-scrub
    * walls over the same corpus and eval set, map == join verified
    * distributedly (aggregate totals only reach the driver). */
  private def decontam(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    val k = 8
    val bench = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 100)
    for (reps <- Seq(10, maxReps).distinct) {
      val corpus = replicatedDocs(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      report(s"${reps}x corpus", s"${corpus.count()} docs")
      time(s"contaminationHits (doc flag) ${reps}x") {
        DedupOps.contaminationHits(corpus, bench, "doc_id", "text", k)
          .write.format("noop").mode("overwrite").save()
      }
      val joined = DedupOps.decontaminateSpans(corpus, bench,
        "doc_id", "text", k)
      time(s"decontaminateSpans (join) ${reps}x") {
        joined.write.format("noop").mode("overwrite").save()
      }
      val grams = time("contaminationGramSet build") {
        DedupOps.contaminationGramSet(bench, "doc_id", "text", k)
      }
      report("gram set size", grams.length)
      val mapped = DedupOps.decontaminateSpansWithGrams(corpus, grams,
        "doc_id", "text", k)
      time(s"decontaminateSpansWithGrams (map) ${reps}x") {
        mapped.write.format("noop").mode("overwrite").save()
      }
      val a = joined.agg(sum("n_spans"), sum("n_removed")).head()
      val b = mapped.agg(sum("n_spans"), sum("n_removed")).head()
      require(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1),
        s"map != join: $a vs $b")
      report(s"scrub totals ${reps}x",
        s"n_spans=${a.getLong(0)} n_removed=${a.getLong(1)}")
      corpus.unpersist()
    }
  }

  /** DSIR importance weights at 100×: two bigram models (target =
    * base-corpus en docs, raw = the replicated corpus) + one fused
    * score pass. */
  private def dsir(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val target = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en" && col("text").isNotNull)
    for (reps <- Seq(10, maxReps).distinct) {
      val corpus = replicatedDocs(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      report(s"${reps}x corpus", s"${corpus.count()} docs")
      val w = TextOps.dsirWeights(corpus, "doc_id", "text",
        target, "text", corpus, "text")
      time(s"dsirWeights ${reps}x") {
        w.write.format("noop").mode("overwrite").save()
      }
      // sanity at scale: ranking is non-degenerate (both signs present)
      val signs = w.agg(
        sum(when(col("logratio_q") > 0, 1L).otherwise(0L)),
        sum(when(col("logratio_q") < 0, 1L).otherwise(0L))).head()
      report(s"sign split ${reps}x",
        s"pos=${signs.getLong(0)} neg=${signs.getLong(1)}")
      corpus.unpersist()
    }
  }

  private def padded(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    for (reps <- Seq(10, maxReps).distinct) {
      val docs = sftDocs(spark, sfDir, reps).persist(StorageLevel.DISK_ONLY)
      docs.count()
      val enc = TextOps.encodeSft(docs, "key", "prompt", "completion")
        .persist(StorageLevel.DISK_ONLY)
      val nTok = enc.agg(sum("n_tokens")).head().getLong(0)
      report(s"${reps}x corpus", s"${docs.count()} examples, $nTok tokens")
      // seqLen sweep: waste = (maxExample − 1)/seqLen, so the
      // isolation price falls as the window grows past the examples
      for (seqLen <- Seq(1024, 4096)) {
        time(s"packSftSequences (concat-and-cut) ${reps}x seqLen=$seqLen") {
          SampleOps.packSftSequences(enc, col("key"), "token_ids",
              "loss_mask", seqLen, buckets = 64)
            .write.format("noop").mode("overwrite").save()
        }
        val packed = SampleOps.packSftSequencesPadded(enc, col("key"),
          "token_ids", "loss_mask", seqLen, buckets = 64)
        time(s"packSftSequencesPadded (no-straddle) ${reps}x seqLen=$seqLen") {
          packed.write.format("noop").mode("overwrite").save()
        }
        val w = SampleOps.paddingWaste(packed, seqLen).head()
        report(s"padding waste ${reps}x seqLen=$seqLen",
          s"n_seqs=${w.getAs[Long]("n_seqs")} n_tokens=${w.getAs[Long]("n_tokens")} " +
            s"waste_ppm=${w.getAs[Long]("waste_ppm")}")
        // conservation: no token lost or duplicated by the no-straddle move
        require(w.getAs[Long]("n_tokens") == nTok,
          s"padded pack lost tokens: ${w.getAs[Long]("n_tokens")} != $nTok")
      }
      enc.unpersist(); docs.unpersist()
    }
  }
}
