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
      case other =>
        sys.error(s"unknown subcommand '$other' (passages|unigramguard)")
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
