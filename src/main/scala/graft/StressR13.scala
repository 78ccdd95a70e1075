package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{DedupOps, SampleOps, TextOps}

/** Round-13 scale-stress harness (same BASELINE.md protocol as
  * [[StressR12]]: same-JVM timings, DISK_ONLY-persisted inputs,
  * local[32], default 8g heap). Subcommands:
  *
  *  - `pipeline [reps]` — the q_training_pipeline COMPOSITION as ONE
  *    plan (quality filter → exact-dedup keep-first → LOSSLESS BPE
  *    encode → fixed-length packing) on replicated sf0.1 documents at
  *    2×/10×/reps× (reps=100 → 500k input docs). Replica text is
  *    de-duplicated PAIRWISE (replicas 2k and 2k+1 share text, fixed-
  *    width tag so quality features are replica-invariant), so the
  *    dedup stage removes exactly half at every scale — the composed
  *    plan exercises all four stages with known survivor counts.
  *    Verifies: survivor count = passers × reps/2, packed-stream row
  *    count/EOS/dense-position invariants, bit-identical output under
  *    a different input partitioning, and composed wall vs the sum of
  *    separately-materialized stages (is one plan ≈ the sum of its
  *    stages, or does the composition pay a barrier?).
  *  - `epochshuffle [reps]` — epochShuffle at 100×/1000× (reps=1000 →
  *    5M rows; the assignShards stress scales, weight-1 variant):
  *    dense-bijection invariants verified DISTRIBUTEDLY (count /
  *    min / max / countDistinct), epoch-independence (different epoch
  *    → different permutation), partitioning independence, wall
  *    alongside the shards row it shares machinery with.
  *  - `pq [reps]` — product-quantization at scale: map-only encode
  *    wall at 10×/100×/reps× (linearity), parquet footprint codes vs
  *    raw vectors, IVF-PQ vs uncompressed IVF query wall at reps×,
  *    ADC/rerank recall vs brute ground truth at 100× on perturbed
  *    replicas (pairwise-distinct, cluster structure preserved).
  *  - `sft [reps]` — mask-carrying SFT pack vs the maskless
  *    pretraining pack over the same replicated corpus (the mask's
  *    marginal cost), plus multimodal alignment coordinate-exactness
  *    verified distributedly at reps×.
  *
  * Timings print as `[stress] <label>: <sec> s`; results as
  * `[stress] <label> = <value>`. Not part of the oracle surface — a
  * measurement tool like Bench, kept in-repo so the BASELINE.md rows
  * it produces stay reproducible.
  */
object StressR13 {
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
    args.headOption.getOrElse(sys.error(
        "usage: StressR13 <pipeline|epochshuffle|corpus|compact|pq|sft> [reps]")) match {
      case "pipeline" =>
        pipeline(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "epochshuffle" =>
        epochShuffle(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(1000))
      case "corpus" =>
        corpus(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "compact" =>
        compact(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "pq" =>
        pq(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(1000))
      case "sft" =>
        sft(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case other => sys.error(s"unknown subcommand '$other' (pipeline|epochshuffle|corpus|compact|pq|sft)")
    }
    spark.stop()
  }

  /** Replicated documents with PAIRWISE-duplicated text: replicas 2k
    * and 2k+1 of a document carry identical text (a fixed-width pair
    * tag, so every replica of a document has byte-identical quality
    * features), distinct pairs differ — exact dedup keep-first removes
    * exactly one of each pair. Map-only, no join. */
  private def pairedDocs(spark: SparkSession, sfDir: String, reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(concat(col("doc_id"), lit("#"), col("__rep")).as("key"),
        col("doc_id"),
        concat(col("text"), lit(" #"),
          lpad((col("__rep") / 2).cast("int").cast("string"), 6, "0")).as("text"))

  // -------------------------------------------------------------- pipeline

  private def pipeline(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val seqLen = 1024
    val eos = TextOps.bpeEosId()
    require(maxReps % 2 == 0, "pipeline stress wants an even reps (pairwise dedup)")
    // base passer count: distinct source documents surviving the
    // quality filter (replica-invariant by the fixed-width tag)
    for (reps <- Seq(2, 10, maxReps)) {
      val rep = pairedDocs(spark, sfDir, reps).persist(StorageLevel.DISK_ONLY)
      val nIn = rep.count()
      def composed(src: DataFrame) = SampleOps.packSequences(
        TextOps.encodeBpe(
          DedupOps.exactDedup(
            TextOps.qualityFilter(src, "text"), "key", "text"),
          "key", "text", TextOps.DefaultBpeMerges, lossless = true),
        col("key"), "token_ids", seqLen, eos, buckets = 64)
      val packed = composed(rep)
      time(s"pipeline ${reps}x ($nIn docs, one plan)") {
        packed.write.format("noop").mode("overwrite").save()
      }
      val p = packed.persist(StorageLevel.DISK_ONLY)
      val total = p.count()
      // survivors: the filter passes per-document (replica-invariant),
      // dedup halves the replicas — and ALSO collapses source documents
      // sharing identical text (the corpus carries a handful), so the
      // prediction counts distinct passing TEXTS, not passing docs
      val passers = TextOps.qualityFilter(
          spark.read.parquet(s"$sfDir/documents.parquet")
            .withColumn("text", concat(col("text"), lit(" #000000"))), "text")
        .select("text").distinct().count()
      val survivors = p.filter(col("token_id") === eos).count()
      val maxSeq = p.agg(max("seq_id")).head().getLong(0)
      val lens = p.groupBy("seq_id").agg(count(lit(1)).as("n"),
        min("seq_pos").as("lo"), max("seq_pos").as("hi"))
      val badFull = lens.filter(col("seq_id") < maxSeq &&
        (col("n") =!= seqLen || col("lo") =!= 0 || col("hi") =!= seqLen - 1)).count()
      val badLast = lens.filter(col("seq_id") === maxSeq &&
        (col("lo") =!= 0 || col("hi") =!= col("n") - 1)).count()
      report(s"pipeline ${reps}x",
        s"rows=$total survivors=$survivors (expect ${passers * reps / 2}, " +
          s"match=${survivors == passers * reps / 2}) " +
          s"seqs=${maxSeq + 1} bad_full=$badFull bad_last=$badLast")
      if (reps == maxReps) {
        // bit-identical under a different input partitioning: the whole
        // chain is a pure content function
        val again = composed(rep.repartition(13))
        val h1 = p.agg(bit_xor(xxhash64(col("seq_id"), col("seq_pos"),
          col("token_id")))).head().getLong(0)
        val h2 = again.agg(bit_xor(xxhash64(col("seq_id"), col("seq_pos"),
          col("token_id")))).head().getLong(0)
        report(s"pipeline ${reps}x partitioning-independent", h1 == h2)
        // stage-by-stage: does composing cost anything beyond its parts?
        val deduped = time(s"stage filter+dedup ${reps}x") {
          val d = DedupOps.exactDedup(
              TextOps.qualityFilter(rep, "text"), "key", "text")
            .select("key", "text").persist(StorageLevel.DISK_ONLY)
          d.count(); d
        }
        val enc = time(s"stage encode ${reps}x") {
          val e = TextOps.encodeBpe(deduped, "key", "text",
              TextOps.DefaultBpeMerges, lossless = true)
            .persist(StorageLevel.DISK_ONLY)
          e.count(); e
        }
        time(s"stage pack ${reps}x") {
          SampleOps.packSequences(enc, col("key"), "token_ids", seqLen,
              eos, buckets = 64)
            .write.format("noop").mode("overwrite").save()
        }
        val nTok = enc.agg(sum("n_tokens")).head().getLong(0)
        report(s"pipeline ${reps}x stream",
          s"tokens=$nTok rows_expected=${nTok + survivors} rows=$total " +
            s"match=${total == nTok + survivors}")
        enc.unpersist(); deduped.unpersist()
      }
      p.unpersist(); rep.unpersist()
    }
  }

  // -------------------------------------------------------------- corpus

  /** End-to-end `materializeTrainingCorpus` (the curate→encode→densify→
    * pack→publish capstone, incl. the parquet write + vocab sidecar) on
    * the paired corpus at 10×/reps× — what a full corpus BUILD costs,
    * where `pipeline` measures the in-memory chain alone. */
  private def corpus(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val seqLen = 1024
    for (reps <- Seq(10, maxReps)) {
      val rep = pairedDocs(spark, sfDir, reps).persist(StorageLevel.DISK_ONLY)
      val nIn = rep.count()
      val dir = java.nio.file.Files.createTempDirectory("graft_stress_corpus")
      val out = dir.toString + "/corpus"
      val (manifest, vocab) = time(s"materializeTrainingCorpus ${reps}x ($nIn docs)") {
        val r = graft.ops.SampleOps.materializeTrainingCorpus(rep, "key",
          "text", out, seqLen, targetTokens = 500000L, buckets = 64)
        r._1.count(); r
      }
      val m = manifest.collect()
      val v = vocab.count()
      val back = spark.read.parquet(out)
      val agg = back.agg(count(lit(1)).as("n"), sum("n_tokens").as("t"),
        max(array_max(col("text"))).as("mx")).head()
      report(s"corpus ${reps}x",
        s"shards=${m.length} seqs=${agg.getLong(0)} tokens=${agg.getLong(1)} " +
          s"vocab=$v ids_dense=${agg.getLong(2) < v} " +
          s"manifest_match=${m.map(_.getLong(3)).sum == agg.getLong(1)} " +
          s"nonfull_seqs=${back.filter(col("n_tokens") =!= seqLen).count()}")
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      rep.unpersist()
    }
  }

  // -------------------------------------------------------------- compact

  /** Stream-then-compact at scale: `reps/10` epoch segments of 10×
    * paired docs each (≈ reps× total) ingested via `appendPackedEpoch`
    * (epochSeqLen 1024), then ONE `compactPackedEpochs` into 8k-token
    * examples with a corpus-wide dense vocab — wall for both halves,
    * token conservation and re-cut invariants verified distributedly. */
  private def compact(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val nEpochs = math.max(2, maxReps / 10)
    val dir = java.nio.file.Files.createTempDirectory("graft_stress_compact")
    val root = dir.toString + "/stream"
    val out = dir.toString + "/corpus"
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    time(s"ingest $nEpochs epochs (10x docs each)") {
      for (ep <- 0 until nEpochs) {
        val batch = base.select(
          concat(col("doc_id"), lit("#"), lit(ep)).as("key"),
          concat(col("text"), lit(" #"), lit(ep)).as("text"))
          .withColumn("__rep", explode(sequence(lit(0), lit(9))))
          .select(concat(col("key"), lit("/"), col("__rep")).as("key"),
            col("text"))
        graft.streaming.StreamOps.appendPackedEpoch(batch, root, "key",
          "text", seqLen = 1024, targetTokens = 500000L, buckets = 64,
          graft.ops.TextOps.DefaultBpeMerges, batchId = ep.toLong)
      }
    }
    val standing = spark.read.parquet(root)
    val inTok = standing.agg(sum("n_tokens")).head().getLong(0)
    val (manifest, vocab) = time(s"compactPackedEpochs ($nEpochs epochs, $inTok tokens)") {
      val r = graft.ops.SampleOps.compactPackedEpochs(spark, root, out,
        epochSeqLen = 1024, seqLen = 8192, targetTokens = 500000L,
        buckets = 64)
      r._1.count(); r
    }
    val back = spark.read.parquet(out)
    val agg = back.agg(count(lit(1)).as("n"), sum("n_tokens").as("t"),
      max(array_max(col("text"))).as("mx")).head()
    report(s"compact ${nEpochs}ep",
      s"in_tokens=$inTok out_tokens=${agg.getLong(1)} " +
        s"conserved=${agg.getLong(1) == inTok} seqs=${agg.getLong(0)} " +
        s"nonfull=${back.filter(col("n_tokens") =!= 8192).count()} " +
        s"vocab=${vocab.count()} ids_dense=${agg.getLong(2) < vocab.count()} " +
        s"shards=${manifest.count()}")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  // ---------------------------------------------------------- epochshuffle

  private def epochShuffle(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    for (reps <- Seq(100, maxReps)) {
      val rep = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
        .select(concat(col("doc_id"), lit("#"), col("__rep")).as("key"))
        .persist(StorageLevel.DISK_ONLY)
      val n = rep.count()
      val shuffled = SampleOps.epochShuffle(rep, col("key"), epoch = 3L,
        buckets = 64)
      time(s"epochShuffle ${reps}x ($n rows)") {
        shuffled.write.format("noop").mode("overwrite").save()
      }
      // dense bijection, verified distributedly: n positions, exactly
      // [0, n), no repeats — one aggregate row reaches the driver
      val s = shuffled.persist(StorageLevel.DISK_ONLY)
      val agg = s.agg(count(lit(1)).as("n"), min("epoch_pos").as("lo"),
        max("epoch_pos").as("hi"),
        countDistinct(col("epoch_pos")).as("nd")).head()
      report(s"epochShuffle ${reps}x bijection",
        s"n=${agg.getLong(0)} lo=${agg.getLong(1)} hi=${agg.getLong(2)} " +
          s"distinct=${agg.getLong(3)} " +
          s"ok=${agg.getLong(0) == n && agg.getLong(1) == 0L &&
            agg.getLong(2) == n - 1 && agg.getLong(3) == n}")
      if (reps == maxReps) {
        // a different epoch is a different permutation (same key set)
        val other = SampleOps.epochShuffle(rep, col("key"), epoch = 4L,
          buckets = 64)
        val moved = s.join(other.withColumnRenamed("epoch_pos", "p4"), Seq("key"))
          .filter(col("epoch_pos") =!= col("p4")).count()
        report(s"epochShuffle ${reps}x epoch-independence",
          s"moved=$moved/$n (${100.0 * moved / n}%)")
        // partitioning independence: position is a pure content function
        val again = SampleOps.epochShuffle(rep.repartition(13), col("key"),
          epoch = 3L, buckets = 64)
        val h1 = s.agg(bit_xor(xxhash64(col("key"), col("epoch_pos"))))
          .head().getLong(0)
        val h2 = again.agg(bit_xor(xxhash64(col("key"), col("epoch_pos"))))
          .head().getLong(0)
        report(s"epochShuffle ${reps}x partitioning-independent", h1 == h2)
      }
      s.unpersist(); rep.unpersist()
    }
  }

  // ----------------------------------------------------------------- sft

  /** Supervised + multimodal packing at scale: the mask-carrying SFT
    * pack and the plain pretraining pack over the SAME replicated
    * corpus (prompt = first 48 chars, completion = rest), so the mask
    * column's marginal cost is directly read off; multimodal alignment
    * (doc_id % 3 attachments) verified coordinate-exact at scale
    * distributedly (every alignment row must land on a placeholder
    * token of its own doc). */
  private def sft(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    for (reps <- Seq(10, maxReps).distinct) {
      val rep = pairedDocs(spark, sfDir, reps)
        .select(col("key"), col("text"),
          substring(col("text"), 1, 48).as("prompt"),
          substring(col("text"), 49, Int.MaxValue).as("completion"))
        .persist(StorageLevel.DISK_ONLY)
      val nIn = rep.count()
      val enc = TextOps.encodeSft(rep, "key", "prompt", "completion")
      time(s"encodeSft+packSftSequences ${reps}x ($nIn docs, one plan)") {
        SampleOps.packSftSequences(enc, col("key"), "token_ids", "loss_mask",
            seqLen = 1024, buckets = 64)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"encodeBpe+packSequences (maskless baseline) ${reps}x") {
        SampleOps.packSequences(
            TextOps.encodeBpe(rep, "key", "text", TextOps.DefaultBpeMerges,
              lossless = true),
            col("key"), "token_ids", seqLen = 1024,
            sepId = TextOps.bpeEosId(), buckets = 64)
          .write.format("noop").mode("overwrite").save()
      }
      if (reps == maxReps) {
        // multimodal alignment exactness at scale, verified distributedly
        val media = rep.select(col("key"),
            posexplode(array_repeat(lit(1),
              (abs(xxhash64(col("key"))) % 3L).cast("int")))
              .as(Seq("ord", "__x")))
          .select(col("key"), concat(col("key"), lit("#m"),
            col("ord").cast("string")).as("media_id"))
        val mEnc = TextOps.encodeMultimodal(rep, media, "key", "text")
          .persist(StorageLevel.DISK_ONLY)
        mEnc.count()
        val packed = SampleOps.packSftSequences(mEnc, col("key"),
            "token_ids", "loss_mask", seqLen = 1024, buckets = 64)
          .persist(StorageLevel.DISK_ONLY)
        val align = SampleOps.multimodalAlignment(mEnc, media, col("key"),
          "media_id", seqLen = 1024, buckets = 64)
        val (nAlign, t0) = (align.count(), System.nanoTime())
        val img = TextOps.bpeImageId()
        val hits = align.join(packed, Seq("seq_id", "seq_pos"))
          .filter(col("token_id") === img && col("loss_mask") === 0 &&
            align("src_key") === packed("src_key"))
          .count()
        println(f"[stress] mm alignment verify ${reps}x: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        report(s"mm alignment ${reps}x",
          s"attachments=$nAlign placeholder_hits=$hits exact=${nAlign == hits}")
        packed.unpersist(); mEnc.unpersist()
      }
      rep.unpersist()
    }
  }

  // ------------------------------------------------------------------ pq

  /** Replicated embeddings with per-replica deterministic perturbation
    * (±0.1 uniform grid from a hash of the new id × element index) —
    * replicas stay near their source vector (cluster structure
    * survives) but are pairwise distinct, so neighbor sets at scale
    * are non-degenerate. Map-only, no join. */
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
      // the base table is ONE parquet partition; without this the whole
      // replicated corpus runs in a single task
      .repartition(64, col("vec_id"))

  /** PQ at scale: codebook trained once on the base sample, encode wall
    * at 10×/100×/reps× (map-only — MUST be linear), parquet footprint
    * of codes vs raw vectors at reps× (the compression that lets a
    * 100-TB embedding corpus live in cluster RAM), IVF-PQ vs
    * uncompressed IVF query wall at reps×, and ADC/rerank recall vs
    * brute-force ground truth at 100×. */
  private def pq(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    import graft.ops.SimilarityOps
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = time("trainPqCodebook m=8 ksub=64 (500-row sample)") {
      val c = SimilarityOps.trainPqCodebook(base, "vec_id", "embedding",
        m = 8, ksub = 64).persist(StorageLevel.DISK_ONLY)
      c.count(); c
    }
    for (reps <- Seq(10, 100, maxReps).distinct.filter(_ <= maxReps)) {
      val vecs = perturbedVectors(spark, sfDir, reps).persist(StorageLevel.DISK_ONLY)
      val n = vecs.count()
      val codes = SimilarityOps.pqEncode(vecs, "vec_id", "embedding", cb)
      time(s"pqEncode ${reps}x ($n vectors)") {
        codes.write.format("noop").mode("overwrite").save()
      }
      if (reps == maxReps) {
        // real parquet footprint, codes vs raw vectors
        val cdir = "/tmp/stress_pq_codes"
        val vdir = "/tmp/stress_pq_vecs"
        codes.write.mode("overwrite").parquet(cdir)
        vecs.write.mode("overwrite").parquet(vdir)
        def dirBytes(p: String): Long = {
          import scala.jdk.CollectionConverters._
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
          try s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size(_)).sum
          finally s.close()
        }
        val (cBytes, vBytes) = (dirBytes(cdir), dirBytes(vdir))
        report(s"parquet bytes ${reps}x",
          f"codes=$cBytes vectors=$vBytes ratio=${vBytes.toDouble / cBytes}%.1f")
        // query wall: IVF-PQ vs uncompressed IVF, same coarse layout
        val centroids = SimilarityOps.trainCentroids(base, "vec_id", "embedding", k = 256)
          .persist(StorageLevel.DISK_ONLY)
        centroids.count()
        // 20 queries SPREAD ACROSS distinct base vectors (keys are
        // base_id·reps + rep, so a plain vec_id < 20 filter would pick
        // 20 perturbed replicas of base vector 0 — a degenerate
        // single-cluster workload, caught in review)
        val queries = vecs.filter(col("vec_id") % (reps * 100L) === 0L)
        val index = time(s"ivfPqIndex build ${reps}x (one-time, persistable)") {
          val ix = SimilarityOps.ivfPqIndex(vecs, centroids, cb,
            "vec_id", "embedding", residual = false) // r13 raw-code shape
            .persist(StorageLevel.DISK_ONLY)
          ix.count(); ix
        }
        time(s"ivfPqTopKFromIndex ${reps}x k=10 nprobe=2 K=256 (standing index)") {
          SimilarityOps.ivfPqTopKFromIndex(queries, index, centroids, cb,
            "vec_id", "embedding", k = 10, nprobe = 2, residual = false)
            .write.format("noop").mode("overwrite").save()
        }
        time(s"ivfTopK (uncompressed, re-reads vectors) ${reps}x k=10 nprobe=2 K=256") {
          SimilarityOps.ivfTopK(queries, vecs, centroids,
            "vec_id", "embedding", k = 10, nprobe = 2)
            .write.format("noop").mode("overwrite").save()
        }
        index.unpersist(); centroids.unpersist()
      }
      if (reps == 100) {
        // recall vs brute ground truth at 100x — 20 queries spread
        // across distinct base vectors (see the spread note above)
        val queries = vecs.filter(col("vec_id") % (reps * 100L) === 0L)
        val exact = SimilarityOps.bruteForceTopK(queries, vecs,
            "vec_id", "embedding", k = 10)
          .select(col("q_id").as("id_a"), col("c_id").as("id_b"))
          .persist(StorageLevel.DISK_ONLY)
        exact.count()
        def recallOf(approx: DataFrame): Double =
          DedupOps.pairRecall(exact,
            approx.select(col("q_id").as("id_a"), col("c_id").as("id_b")))
            .head().getAs[Double]("recall")
        val adc = recallOf(SimilarityOps.pqTopK(queries, vecs, cb,
          "vec_id", "embedding", k = 10))
        val rr = recallOf(SimilarityOps.pqTopKRerank(queries, vecs, cb,
          "vec_id", "embedding", k = 10, cands = 100))
        report(s"recall@10 ${reps}x ($n-vector corpus)",
          f"adc=$adc%.2f rerank(cands=100)=$rr%.2f")
        exact.unpersist()
      }
      vecs.unpersist()
    }
    cb.unpersist()
  }
}
