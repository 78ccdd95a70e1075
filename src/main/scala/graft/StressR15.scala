package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{SimilarityOps, TextOps}

/** Round-15 stress harness (committed so every BASELINE round-15 row is
  * reproducible):
  *
  *  1. `html [reps]` — HTML main-content extraction at 10×/100×: the
  *     codegen kernel over synthetically wrapped pages; replication
  *     conservation and byte-exact article survival verified
  *     distributedly.
  *  2. `unigram [reps]` — unigram-LM Viterbi encode at 10×/100× under
  *     the demo vocabulary; conservation + distributed lossless-
  *     reassembly check (pieces re-concatenate to the spaceless text).
  *  3. `dsirmap [reps]` — map-only DSIR scoring (published-model
  *     artifacts) vs the join form at 10×/100×, equality verified by
  *     distributed aggregate sums.
  *  4. `pqappend [reps]` — incremental IVF-PQ append at the 2M point:
  *     fold a 1%-sized daily batch into the standing index vs
  *     rebuilding the whole index; equality of the appended and
  *     rebuilt indexes verified distributedly.
  *
  * Documents/vectors replicate the sf0.1 tables with per-replica keys
  * (the StressR12-14 convention); invariants verify distributedly —
  * only aggregate rows reach the driver.
  */
object StressR15 {
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
        sys.error("usage: StressR15 <html|unigram|dsirmap|pqappend> [reps]")) match {
      case "html" =>
        html(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "unigram" =>
        unigram(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "dsirmap" =>
        dsirMap(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "pqappend" =>
        pqAppend(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(1000))
      case other =>
        sys.error(s"unknown subcommand '$other' (html|unigram|dsirmap|pqappend)")
    }
    spark.stop()
  }

  private def replicatedDocs(spark: SparkSession, sfDir: String,
      reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("doc_id") * reps + col("__rep")).as("doc_id"), col("text"))
      .repartition(64, col("doc_id"))

  /** HTML extraction at scale: the kernel is one map-only pass, so the
    * wall must track corpus size linearly with no exchange. */
  private def html(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val head = "<html><head><title>Synthetic</title><style>p{color:red}" +
      "</style><script>var x = 1;</script></head><body><nav>" +
      "<a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
      "<a href=\"/contact\">Contact</a></nav><p>"
    val tail = "</p><div class=\"footer\">Copyright 2026 " +
      "<a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>" +
      "</div></body></html>"
    var kept10 = 0L
    for (reps <- Seq(10, maxReps).distinct) {
      val pages = replicatedDocs(spark, sfDir, reps)
        .withColumn("html", concat(lit(head), col("text"), lit(tail)))
        .persist(StorageLevel.DISK_ONLY)
      report(s"${reps}x corpus", s"${pages.count()} pages")
      val out = TextOps.extractMainContent(pages, "doc_id", "html")
      time(s"extractMainContent ${reps}x") {
        out.write.format("noop").mode("overwrite").save()
      }
      val agg = out.agg(sum("n_kept"), sum("n_blocks")).head()
      report(s"kept/blocks ${reps}x", s"${agg.getLong(0)}/${agg.getLong(1)}")
      if (reps == 10) kept10 = agg.getLong(0)
      else require(agg.getLong(0) == kept10 / 10 * reps,
        s"replication conservation broke: ${agg.getLong(0)}")
      // byte-exact article survival, verified distributedly: every
      // kept page's main_text equals its whitespace-collapsed source
      val bad = out.filter(col("n_kept") === 1)
        .join(pages.select(col("doc_id"), col("text")), "doc_id")
        .filter(col("main_text") =!=
          trim(regexp_replace(col("text"), "\\s+", " ")))
        .count()
      require(bad == 0L, s"$bad kept pages diverged from their articles")
      pages.unpersist()
    }
  }

  /** Unigram Viterbi encode at scale: map-only kernel, linear wall. */
  private def unigram(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    val vocab = TextOps.unigramVocab(TextOps.DefaultUnigramVocab)
    var pieces10 = 0L
    for (reps <- Seq(10, maxReps).distinct) {
      val corpus = replicatedDocs(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      report(s"${reps}x corpus", s"${corpus.count()} docs")
      val enc = TextOps.unigramEncode(corpus, "doc_id", "text", vocab)
      time(s"unigramEncode ${reps}x") {
        enc.write.format("noop").mode("overwrite").save()
      }
      val agg = enc.agg(sum("n_pieces"), sum("score_q")).head()
      report(s"pieces/score ${reps}x", s"${agg.getLong(0)}/${agg.getLong(1)}")
      if (reps == 10) pieces10 = agg.getLong(0)
      else require(agg.getLong(0) == pieces10 / 10 * reps,
        s"replication conservation broke: ${agg.getLong(0)}")
      // lossless reassembly, verified distributedly: the pieces
      // re-concatenate to the text with spaces removed
      val bad = enc.join(corpus, "doc_id")
        .filter(concat_ws("", col("pieces")) =!=
          regexp_replace(col("text"), " ", ""))
        .count()
      require(bad == 0L, s"$bad docs failed lossless reassembly")
      corpus.unpersist()
    }
  }

  /** Map-only DSIR scoring vs the join form: the artifact path must be
    * flat-ish in corpus size (kernel scan) and equal bit-for-bit. */
  private def dsirMap(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    val target = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en" && col("text").isNotNull)
    for (reps <- Seq(10, maxReps).distinct) {
      val corpus = replicatedDocs(spark, sfDir, reps)
        .persist(StorageLevel.DISK_ONLY)
      report(s"${reps}x corpus", s"${corpus.count()} docs")
      val (tm, rm) = time(s"dsirModelArtifact x2 ${reps}x (raw model sees the full corpus)") {
        (TextOps.dsirModelArtifact(target, "text"),
          TextOps.dsirModelArtifact(corpus, "text"))
      }
      report("model sizes",
        s"target=${tm.pairKeys.length} raw=${rm.pairKeys.length} bigrams")
      val mapped = TextOps.dsirScoreWithModels(corpus, "doc_id", "text",
        tm, rm)
      time(s"dsirScoreWithModels (map) ${reps}x") {
        mapped.write.format("noop").mode("overwrite").save()
      }
      val joined = TextOps.dsirWeights(corpus, "doc_id", "text",
        target, "text", corpus, "text")
      time(s"dsirWeights (join) ${reps}x") {
        joined.write.format("noop").mode("overwrite").save()
      }
      val a = mapped.agg(count(lit(1)), sum("bits_target_q"),
        sum("bits_raw_q")).head()
      val b = joined.agg(count(lit(1)), sum("bits_target_q"),
        sum("bits_raw_q")).head()
      require(a == b, s"map != join: $a vs $b")
      report(s"score sums ${reps}x",
        s"docs=${a.getLong(0)} bt=${a.getLong(1)} br=${a.getLong(2)}")
      corpus.unpersist()
    }
  }

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

  /** Incremental append at the 2M point: the daily fold must cost a
    * small fraction of the rebuild and answer identically. */
  private def pqAppend(spark: SparkSession, sfDir: String,
      maxReps: Int): Unit = {
    val all = perturbedVectors(spark, sfDir, maxReps)
      .persist(StorageLevel.DISK_ONLY)
    val n = all.count()
    // standing corpus = 99%, daily batch = 1% (hash-split, disjoint ids)
    val batch = all.filter(pmod(xxhash64(col("vec_id")), lit(100)) === 0)
      .persist(StorageLevel.DISK_ONLY)
    val standingVecs = all.filter(pmod(xxhash64(col("vec_id")), lit(100)) =!= 0)
      .persist(StorageLevel.DISK_ONLY)
    report("corpus", s"$n vectors, batch=${batch.count()}, standing=${standingVecs.count()}")
    // deterministic ~8k training sample (direct modulus: charHash-based
    // hashSample is structured on short digit strings and undersamples)
    val sample = all.filter(col("vec_id") % 250 === 7)
      .persist(StorageLevel.DISK_ONLY)
    report("training sample", sample.count())
    val centroids = SimilarityOps.trainCentroids(sample, "vec_id",
      "embedding", k = 256).persist(StorageLevel.DISK_ONLY)
    centroids.count()
    val cb = SimilarityOps.trainPqResidualCodebook(sample, centroids,
      "vec_id", "embedding", m = 8, ksub = 64)
      .persist(StorageLevel.DISK_ONLY)
    cb.count()
    sample.unpersist()
    val standing = time(s"ivfPqIndex build (standing ${standingVecs.count()} vectors)") {
      val ix = SimilarityOps.ivfPqIndex(standingVecs, centroids, cb,
        "vec_id", "embedding").persist(StorageLevel.DISK_ONLY)
      ix.count(); ix
    }
    val appended = time(s"appendPqIndex (1% batch into the standing index)") {
      val ap = SimilarityOps.appendPqIndex(batch, standing, centroids, cb,
        "vec_id", "embedding").persist(StorageLevel.DISK_ONLY)
      ap.count(); ap
    }
    val rebuilt = time("ivfPqIndex full rebuild (append's alternative)") {
      val ix = SimilarityOps.ivfPqIndex(all, centroids, cb,
        "vec_id", "embedding").persist(StorageLevel.DISK_ONLY)
      ix.count(); ix
    }
    // distributed equality: append == rebuild
    val diff = appended.exceptAll(rebuilt).count() +
      rebuilt.exceptAll(appended).count()
    require(diff == 0L, s"append != rebuild: $diff differing rows")
    report("append == rebuild", s"verified on ${rebuilt.count()} rows")
    Seq(all, batch, standingVecs, standing, appended, rebuilt,
      centroids, cb).foreach(_.unpersist())
  }
}
