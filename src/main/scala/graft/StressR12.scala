package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.{SampleOps, TextOps, SimilarityOps}

/** Round-12 scale-stress harness (BASELINE.md protocol: same-JVM
  * timings, DISK_ONLY-persisted inputs, local[32], default 8g heap).
  * Subcommands:
  *
  *  - `shards [reps]` — assignShards + writeSharded on replicated sf0.1
  *    documents (reps=100 → 500k rows): wall at 1×/10×/reps×, shard
  *    size/contiguity/total invariants verified distributedly, manifest
  *    vs data cross-check, and a partitioning-independence check at the
  *    top scale (same assignment from a different input partitioning).
  *  - `lm [reps]` — lmPerplexity train+score on replicated documents
  *    (model is replica-invariant, so this isolates CORPUS-side scaling)
  *    at 1×/10×/reps×, plus the forced shuffle-join strategy at reps×
  *    with a bit-equality checksum against the broadcast path.
  *  - `semkm [groups] [members] [singles]` — semDedup kept-rate on a
  *    PLANTED-cluster fixture (known ground truth: `groups` near-dup
  *    sets of `members` mutual near-dups each + `singles` decorrelated
  *    vectors) with KMeans-trained centroids — the round-11 verdict's
  *    "separate operator truth from sign-mask fixture noise" item.
  *
  * Timings print as `[stress] <label>: <sec> s`; results as
  * `[stress] <label> = <value>`. Not part of the oracle surface — a
  * measurement tool like Bench, kept in-repo so the BASELINE.md rows it
  * produces stay reproducible.
  */
object StressR12 {
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

  /** Replicate each document `reps` times with a distinct key per
    * replica — map-only (explode over a sequence; no join), text
    * unchanged, so token-weight distributions are scale-invariant. */
  private def replicatedDocs(spark: SparkSession, sfDir: String, reps: Int): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(concat(col("doc_id"), lit("#"), col("__rep")).as("key"),
        col("doc_id"), col("__rep"), col("n_chars").cast("long").as("n_tok"),
        col("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    args.headOption.getOrElse(sys.error(
        "usage: StressR12 <shards|lm|semkm|embed|pack|append> [args]")) match {
      case "shards" => shards(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "lm"     => lm(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "semkm"  => semkm(spark,
        args.lift(1).map(_.toInt).getOrElse(5000),
        args.lift(2).map(_.toInt).getOrElse(10),
        args.lift(3).map(_.toInt).getOrElse(50000),
        args.lift(4).map(_.toInt).getOrElse(2))
      case "embed"  => embed(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(500))
      case "pack"   => pack(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case "append" => append(spark, sfDir, args.lift(1).map(_.toInt).getOrElse(100))
      case other => sys.error(s"unknown subcommand '$other' (shards|lm|semkm|embed|pack|append)")
    }
    spark.stop()
  }

  // ---------------------------------------------------------------- shards

  private def shards(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val target = 500000L // ~ 131 shards at 100x (sf0.1 total n_chars ~ 655k per 1x)
    for (reps <- Seq(1, 10, maxReps)) {
      val rep = replicatedDocs(spark, sfDir, reps)
        .select("key", "n_tok").persist(StorageLevel.DISK_ONLY)
      val n = rep.count()
      val assigned = SampleOps.assignShards(rep, col("key"), "n_tok",
        targetTokens = target, buckets = 64)
      time(s"assignShards ${reps}x ($n rows)") {
        assigned.write.format("noop").mode("overwrite").save()
      }
      // invariants, verified distributedly (shard totals are S rows —
      // bounded by total/target — so the driver only sees aggregates):
      // contiguous ids 0..max, every shard total within one max-item of
      // target (except the last, which is only bounded above), totals
      // sum to the corpus total.
      val tot = rep.agg(sum("n_tok")).head().getLong(0)
      val maxItem = rep.agg(max("n_tok")).head().getLong(0)
      val st = assigned.groupBy("shard_id").agg(sum("n_tok").as("t"))
      val maxShard = st.agg(max("shard_id")).head().getLong(0)
      val nShards = st.count()
      val sumT = st.agg(sum("t")).head().getLong(0)
      val offenders = st.filter(col("shard_id") < maxShard &&
        (col("t") < target - maxItem + 1 || col("t") > target + maxItem - 1)).count()
      val lastOver = st.filter(col("shard_id") === maxShard &&
        col("t") > target + maxItem - 1).count()
      report(s"shards ${reps}x", s"n_shards=$nShards contiguous=${nShards == maxShard + 1} " +
        s"sum_ok=${sumT == tot} size_offenders=$offenders last_over=$lastOver " +
        s"(target=$target maxItem=$maxItem total=$tot)")
      if (reps == maxReps) {
        // partitioning independence at scale: same (key, shard_id) set
        // from a different physical partitioning of the same input
        val again = SampleOps.assignShards(rep.repartition(13), col("key"), "n_tok",
          targetTokens = target, buckets = 64)
        // bit_xor, not sum: an xxhash64 sum overflows long under ANSI
        val h1 = assigned.agg(bit_xor(xxhash64(col("key"), col("shard_id")))).head().getLong(0)
        val h2 = again.agg(bit_xor(xxhash64(col("key"), col("shard_id")))).head().getLong(0)
        report(s"shards ${reps}x partitioning-independent", h1 == h2)

        // writeSharded end-to-end at the top scale: wall + manifest
        // cross-check against the published parquet
        val out = s"/root/repo/target/stress/sharded_${reps}x"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
        val textRep = replicatedDocs(spark, sfDir, reps).persist(StorageLevel.DISK_ONLY)
        textRep.count()
        val manifest = time(s"writeSharded ${reps}x") {
          SampleOps.writeSharded(textRep, col("key"), "n_tok", "text",
            out, targetTokens = target, buckets = 64)
        }
        val m = manifest.agg(count(lit(1)), sum("n_seqs"), sum("n_tokens")).head()
        val back = spark.read.parquet(out)
        report(s"writeSharded ${reps}x manifest",
          s"shards=${m.getLong(0)} seqs=${m.getLong(1)} tokens=${m.getLong(2)} " +
            s"readback_rows=${back.count()} readback_tokens=${
              back.agg(sum("n_tokens")).head().getLong(0)} (expect seqs=$n tokens=$tot)")
        textRep.unpersist()
      }
      rep.unpersist()
    }
  }

  // ------------------------------------------------------------------- lm

  private def lm(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    for (reps <- Seq(1, 10, maxReps)) {
      val rep = replicatedDocs(spark, sfDir, reps)
        .select("key", "doc_id", "text").persist(StorageLevel.DISK_ONLY)
      val n = rep.count()
      val train = rep.filter(col("doc_id") % 10 =!= 0)
      def run(label: String, maxBroadcast: Long): Long = {
        val scored = TextOps.lmPerplexity(rep, "key", "text", train, "text",
          maxBroadcastModelRows = maxBroadcast)
        time(s"lmPerplexity $label ${reps}x ($n docs)") {
          scored.write.format("noop").mode("overwrite").save()
        }
        // strategy-independence checksum: exact Q16 values make this a
        // bit-equality check; bit_xor over a row hash cannot overflow
        scored.agg(bit_xor(xxhash64(col("key"), col("n_tokens"),
          col("sum_bits_q"), col("avg_bits_q")))).head().getLong(0)
      }
      val hb = run("broadcast", 4L << 20)
      if (reps == maxReps) {
        val hs = run("forced-shuffle", 0L)
        report(s"lm ${reps}x broadcast==shuffle checksum", hb == hs)
      }
      rep.unpersist()
    }
  }

  // --------------------------------------------------------------- append

  /** appendSharded's batch-sized-cost claim, measured: the same 10×
    * day appends onto a `reps`× standing corpus and onto a 10× standing
    * corpus — walls should match (append never re-reads the standing
    * data), standing files stay byte-untouched, and the combined
    * manifest equals the published data at both scales. */
  private def append(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    val target = 500000L
    def freshCorpus(label: String, r: Int): String = {
      val out = s"/root/repo/target/stress/append_$label"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      val docs = replicatedDocs(spark, sfDir, r).persist(StorageLevel.DISK_ONLY)
      docs.count()
      time(s"writeSharded $label (${r}x standing)") {
        graft.ops.SampleOps.writeSharded(docs, col("key"), "n_tok", "text",
          out, targetTokens = target, buckets = 64)
      }
      docs.unpersist(); out
    }
    // the day to append: 10x replicas re-keyed into a disjoint space
    def day(): org.apache.spark.sql.DataFrame =
      replicatedDocs(spark, sfDir, 10)
        .select(concat(lit("day2#"), col("key")).as("key"), col("n_tok"), col("text"))
    for ((label, r) <- Seq(("small", 10), ("big", reps))) {
      val out = freshCorpus(label, r)
      val d = day().persist(StorageLevel.DISK_ONLY)
      val nDay = d.count()
      val standing = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("shard_id=")).flatMap(_.listFiles())
        .filter(_.isFile).map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
      val manifest = time(s"appendSharded $label ($nDay day rows onto ${r}x standing)") {
        graft.ops.SampleOps.appendSharded(d, col("key"), "n_tok", "text",
          out, targetTokens = target, buckets = 64)
      }
      val untouched = standing.forall { case (p, sig) =>
        val f = new java.io.File(p); f.exists() && (f.length(), f.lastModified()) == sig
      }
      val m = manifest.agg(count(lit(1)), sum("n_seqs"), sum("n_tokens")).head()
      val back = spark.read.parquet(out)
      report(s"append $label", s"standing_untouched=$untouched " +
        s"manifest shards=${m.getLong(0)} seqs=${m.getLong(1)} tokens=${m.getLong(2)} " +
        s"readback_rows=${back.count()} readback_tokens=${
          back.agg(sum("n_tokens")).head().getLong(0)}")
      d.unpersist()
    }
  }

  // ----------------------------------------------------------------- pack

  /** encodeBpe → packSequences at 1×/10×/reps×: wall for the encode
    * pass and the pack (prefix-sum + explode), with the packing
    * invariants verified DISTRIBUTEDLY at every scale — token+EOS
    * volume conservation, one EOS per doc, every sequence but the last
    * dense and exactly seqLen — and the partitioning-independence hash
    * at the top scale. */
  private def pack(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    val seqLen = 1024
    val eos = graft.ops.TextOps.bpeEosId()
    for (reps <- Seq(1, 10, maxReps)) {
      val rep = replicatedDocs(spark, sfDir, reps)
        .select("key", "text").persist(StorageLevel.DISK_ONLY)
      val nDocs = rep.count()
      val enc = time(s"encodeBpe ${reps}x ($nDocs docs)") {
        val e = graft.ops.TextOps.encodeBpe(rep, "key", "text")
          .persist(StorageLevel.DISK_ONLY)
        e.count(); e
      }
      val nTok = enc.agg(sum("n_tokens")).head().getLong(0)
      val packed = graft.ops.SampleOps.packSequences(enc, col("key"),
        "token_ids", seqLen, eos, buckets = 64)
      time(s"packSequences ${reps}x ($nTok tokens, seqLen=$seqLen)") {
        packed.write.format("noop").mode("overwrite").save()
      }
      val p = packed.persist(StorageLevel.DISK_ONLY)
      val total = p.count()
      val nEos = p.filter(col("token_id") === eos).count()
      val maxSeq = p.agg(max("seq_id")).head().getLong(0)
      val lens = p.groupBy("seq_id").agg(count(lit(1)).as("n"),
        min("seq_pos").as("lo"), max("seq_pos").as("hi"))
      val badFull = lens.filter(col("seq_id") < maxSeq &&
        (col("n") =!= seqLen || col("lo") =!= 0 || col("hi") =!= seqLen - 1)).count()
      val badLast = lens.filter(col("seq_id") === maxSeq &&
        (col("lo") =!= 0 || col("hi") =!= col("n") - 1)).count()
      report(s"pack ${reps}x", s"rows=$total (expect ${nTok + nDocs}) " +
        s"eos=$nEos/$nDocs seqs=${maxSeq + 1} bad_full=$badFull bad_last=$badLast")
      if (reps == maxReps) {
        val again = graft.ops.SampleOps.packSequences(enc.repartition(13),
          col("key"), "token_ids", seqLen, eos, buckets = 64)
        val h1 = p.agg(bit_xor(xxhash64(col("seq_id"), col("seq_pos"),
          col("token_id")))).head().getLong(0)
        val h2 = again.agg(bit_xor(xxhash64(col("seq_id"), col("seq_pos"),
          col("token_id")))).head().getLong(0)
        report(s"pack ${reps}x partitioning-independent", h1 == h2)
        // sequence assembly: token-row exchange vs fragment exchange
        time(s"materializeSequences ${reps}x (token rows)") {
          graft.ops.SampleOps.materializeSequences(p)
            .write.format("noop").mode("overwrite").save()
        }
        time(s"materializePackedSequences ${reps}x (fragments)") {
          graft.ops.SampleOps.materializePackedSequences(enc, col("key"),
              "token_ids", seqLen, eos, buckets = 64)
            .write.format("noop").mode("overwrite").save()
        }
      }
      p.unpersist(); enc.unpersist(); rep.unpersist()
    }
  }

  // ---------------------------------------------------------------- embed

  /** The round-11 against-index protocol re-run at PURE defaults — the
    * round-12 verdict item 1 done-criterion. Corpus = sf0.1 embeddings
    * (2,000 × dim 64) replicated under per-replica seeded ±1 sign masks
    * (replica 0 = identity: intra-replica cosines preserved exactly,
    * cross-replica destroyed). The index is built by [[SimilarityOps
    * .rpSignatures]] with EVERY dial left at its default (AutoBits →
    * corpus-derived width) and round-tripped through parquet so the
    * stamped [[SimilarityOps.RpMeta]] dials — not session defaults —
    * drive the batch side. Batch = 1,000 planted exact copies of
    * indexed replica-0 vectors + 1,000 fresh decorrelated unit vectors.
    * Want at every scale: 1000/1000 planted hits, 0 fresh hits, caps
    * silent (dropped_buckets = 0). */
  private def embed(spark: SparkSession, sfDir: String, maxReps: Int): Unit = {
    import spark.implicits._
    val dim = 64
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseN = base.count() // 2,000 at sf0.1
    // fresh decorrelated batch half: driver-built (1,000 rows), ids
    // disjoint from every replica id space
    val rnd = new scala.util.Random(7L)
    val fresh = Seq.fill(1000) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }.zipWithIndex.map { case (v, i) => (1000000000L + i, v) }
      .toDF("vid", "vec")
    for (reps <- Seq(5, 50, maxReps)) {
      // sign flip per (replica, dimension): xxhash64 parity — map-only,
      // deterministic, replica 0 untouched
      val corpus = base
        .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
        .select((col("vec_id") + col("__rep").cast("long") * lit(baseN)).as("vid"),
          when(col("__rep") === 0, col("embedding")).otherwise(
            zip_with(col("embedding"),
              transform(sequence(lit(0), lit(dim - 1)),
                j => when(pmod(xxhash64(col("__rep"), j), lit(2)) === 0, lit(1.0f))
                  .otherwise(lit(-1.0f))),
              (x, s) => x * s)).as("vec"))
        .persist(StorageLevel.DISK_ONLY)
      val n = corpus.count()
      val idxPath = s"/root/repo/target/stress/rp_index_${reps}x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idxPath))
      time(s"rpSignatures ${reps}x ($n vectors, pure defaults)") {
        SimilarityOps.rpSignatures(corpus, "vid", "vec", dim).write.parquet(idxPath)
      }
      val index = spark.read.parquet(idxPath)
      report(s"embed ${reps}x stamped dials", SimilarityOps.rpParamsOf(index).get)
      // batch: 1,000 exact copies of replica-0 vectors, re-keyed into a
      // disjoint id space, plus the 1,000 decorrelated fresh vectors
      val planted = base.filter(col("vec_id") < 1000)
        .select((col("vec_id") + 2000000000L).as("vid"), col("embedding").as("vec"))
      val batch = planted.unionByName(fresh).persist(StorageLevel.DISK_ONLY)
      batch.count()
      val hits = SimilarityOps.embeddingNearDupAgainstIndex(
          batch, index, "vid", "vec", minCos = 0.9, dim = dim)
        .persist(StorageLevel.DISK_ONLY)
      time(s"embeddingNearDupAgainstIndex ${reps}x (pure defaults)") { hits.count() }
      val plantedHit = hits.filter(col("id_new") >= 2000000000L &&
        col("id_new") - 2000000000L === col("id_old")).select("id_new").distinct().count()
      val freshHit = hits.filter(col("id_new") < 2000000000L)
        .select("id_new").distinct().count()
      val cap = graft.ops.CapTelemetry.lastStats("embedding_against_index")
      report(s"embed ${reps}x recall", s"planted=$plantedHit/1000 fresh_hits=$freshHit " +
        s"cap=${cap.map(c => s"${c.droppedBuckets}/${c.totalBuckets} buckets, ${c.droppedRows} rows dropped").getOrElse("none")}")
      hits.unpersist(); batch.unpersist(); corpus.unpersist()
    }
  }

  // ---------------------------------------------------------------- semkm

  /** Planted-cluster fixture: `groups` ground-truth near-dup sets of
    * `members` vectors each (member = unit(center + σ·gauss), σ=0.25 →
    * within-group cosine ≈ 1/(1+σ²) ≈ 0.94) plus `singles` independent
    * unit vectors (cross cosines concentrate around 0 at dim 64, far
    * below the 0.85 threshold). Ground truth for semDedup at
    * minCos=0.85: keep exactly one per group + every single. */
  private def semkm(spark: SparkSession, groups: Int, members: Int,
      singles: Int, probes: Int): Unit = {
    val dim = 64
    val sigma = 0.25
    val rnd = new scala.util.Random(12L)
    def gauss(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Float])]()
    var id = 0L
    for (g <- 0 until groups) {
      val c = gauss()
      for (_ <- 0 until members) {
        val noise = gauss()
        rows += ((id, g.toLong, unit(c.zip(noise).map { case (a, b) => a + sigma * b })))
        id += 1
      }
    }
    for (_ <- 0 until singles) { rows += ((id, -1L, unit(gauss()))); id += 1 }
    import spark.implicits._
    val df = rows.toSeq.toDF("vid", "gid", "vec")
      .repartition(32).persist(StorageLevel.DISK_ONLY)
    val n = df.count()
    report("semkm fixture", s"n=$n groups=$groups members=$members singles=$singles")

    val k = math.max(2, (n / 250).toInt) // k ∝ N, the r11 protocol's rate
    val cents = time(s"trainCentroids k=$k") {
      SimilarityOps.trainCentroids(df, "vid", "vec", k, maxIter = 10)
        .persist(StorageLevel.MEMORY_ONLY)
    }
    cents.count()
    val kept = time(s"semDedup n=$n k=$k minCos=0.85 probes=$probes") {
      SimilarityOps.semDedup(df, cents, "vid", "vec", minCos = 0.85, probes = probes)
        .persist(StorageLevel.DISK_ONLY)
    }
    val nKept = kept.count()
    // ground-truth scoring: survivors per planted group (want exactly
    // 1); singles kept (want all — none are near-dups of anything)
    val perGroup = kept.filter(col("gid") >= 0).groupBy("gid").agg(count(lit(1)).as("s"))
    val collapsed = perGroup.filter(col("s") === 1).count()
    val under = groups - perGroup.count() // groups with zero survivors (impossible by construction)
    val over = perGroup.filter(col("s") > 1).count() // groups where recall missed pairs
    val singlesKept = kept.filter(col("gid") === -1L).count()
    report("semkm kept", s"$nKept/$n (expected ${groups + singles}) " +
      s"groups_collapsed_to_1=$collapsed/$groups groups_overkept=$over " +
      s"groups_lost=$under singles_kept=$singlesKept/$singles")
  }
}
