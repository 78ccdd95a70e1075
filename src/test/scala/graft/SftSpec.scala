package graft

import org.apache.spark.sql.functions._

import graft.ops.{SampleOps, TextOps}

/** SFT example encoding + mask-carrying packing. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private def sft = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull)
    .select(col("doc_id"), col("text"),
      substring(col("text"), 1, 48).as("prompt"),
      substring(col("text"), 49, Int.MaxValue).as("completion"))

  test("encodeSft: mask aligns with ids; prompt 0s then completion+EOS 1s") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val bad = enc.filter(size(col("token_ids")) =!= size(col("loss_mask")))
    assert(bad.isEmpty)
    // mask is a 0-run then a 1-run, ending supervised (the EOS)
    val notRuns = enc.filter(
      exists(zip_with(col("loss_mask"), slice(col("loss_mask"), 2, 1000000),
        (a, b) => a > b), x => x) ||
      element_at(col("loss_mask"), -1) =!= 1)
    assert(notRuns.isEmpty)
    // supervised-token count = completion tokens + 1
    val enc2 = enc.join(sft, "doc_id")
      .withColumn("n_sup", aggregate(col("loss_mask"), lit(0),
        (acc, x) => acc + x))
      .withColumn("n_c", size(graft.functions.exprs.bpeTokenIds(
        col("completion"), TextOps.DefaultBpeMerges, lossless = true)))
    assert(enc2.filter(col("n_sup") =!= col("n_c") + 1).isEmpty)
  }

  test("lossless SFT round trip: decode(ids minus EOS) == prompt ++ completion == text") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
      .withColumn("token_ids", slice(col("token_ids"), lit(1),
        size(col("token_ids")) - 1))
    val back = TextOps.decodeBpe(enc, "doc_id", "token_ids")
      .join(sft.select(col("doc_id"), col("text")), "doc_id")
    assert(back.filter(col("decoded") =!= col("text")).isEmpty)
  }

  test("null prompt/completion read as empty: every example still ends in a supervised EOS") {
    val rows = Seq((1L, null.asInstanceOf[String], "answer"),
      (2L, "question", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "prompt", "completion")
    val enc = TextOps.encodeSft(rows, "doc_id", "prompt", "completion")
      .orderBy("doc_id").collect()
    assert(enc.length == 3)
    val eos = TextOps.bpeEosId()
    enc.foreach { r =>
      val ids = r.getSeq[Long](1)
      val mask = r.getSeq[Int](2)
      assert(ids.last == eos && mask.last == 1)
    }
    assert(enc(2).getSeq[Long](1) == Seq(eos)) // both null -> bare EOS
  }

  test("packSftSequences: stream conserves every (token, mask) pair in order") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val packed = SampleOps.packSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val total = enc.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(packed.count() == total)
    // per-example reconstruction: tokens AND masks in stream order
    val back = packed.groupBy("src_key")
      .agg(
        transform(array_sort(collect_list(struct(col("seq_id"), col("seq_pos"),
          col("token_id"), col("loss_mask")))), x => x.getField("token_id")).as("ids"),
        transform(array_sort(collect_list(struct(col("seq_id"), col("seq_pos"),
          col("token_id"), col("loss_mask")))), x => x.getField("loss_mask")).as("mask"))
    val joined = back.join(enc.select(col("doc_id").as("src_key"),
      col("token_ids"), col("loss_mask")), "src_key")
    assert(joined.filter(col("ids") =!= col("token_ids") ||
      col("mask") =!= col("loss_mask")).isEmpty)
  }

  test("packSftSequences refuses misaligned ids/mask instead of truncating supervision") {
    val rows = Seq((1L, Array(5L, 6L, 7L), Array(0, 1)))
      .toDF("doc_id", "token_ids", "loss_mask")
    val e = intercept[Exception] {
      SampleOps.packSftSequences(rows, col("doc_id"), "token_ids", "loss_mask",
        seqLen = 8, buckets = 2).collect()
    }
    assert(e.getMessage != null)
    // the guard lives in the generator input, so even a count() — which
    // prunes every output column — must refuse (the pruning bypass a
    // column-level guard would allow, caught in review)
    val e2 = intercept[Exception] {
      SampleOps.packSftSequences(rows, col("doc_id"), "token_ids", "loss_mask",
        seqLen = 8, buckets = 2).count()
    }
    assert(e2.getMessage != null)
  }

  test("encodePreference: branches share the prompt's masked prefix byte-for-byte") {
    val d = sft.select(col("doc_id"), col("prompt"),
      col("completion").as("chosen"),
      concat(lit("not "), col("completion")).as("rejected"))
    val enc = TextOps.encodePreference(d, "doc_id", "prompt", "chosen", "rejected")
    // two branches per pair
    val counts = enc.groupBy("doc_id").agg(count(lit(1)).as("n"),
      countDistinct(col("branch")).as("nb"))
    assert(counts.filter(col("n") =!= 2 || col("nb") =!= 2).isEmpty)
    // the prompt prefix (ids AND mask) is identical across branches
    val np = graft.functions.exprs.bpeTokenIds(col("prompt"),
      TextOps.DefaultBpeMerges, lossless = true)
    val pfx = enc.join(sft.select(col("doc_id"), col("prompt")), "doc_id")
      .select(col("doc_id"), col("branch"),
        slice(col("token_ids"), lit(1), size(np)).as("p_ids"),
        slice(col("loss_mask"), lit(1), size(np)).as("p_mask"))
    val byPair = pfx.groupBy("doc_id")
      .agg(countDistinct(col("p_ids")).as("di"), countDistinct(col("p_mask")).as("dm"))
    assert(byPair.filter(col("di") =!= 1 || col("dm") =!= 1).isEmpty)
    // prompt tokens unsupervised in both branches
    assert(pfx.filter(exists(col("p_mask"), m => m =!= 0)).isEmpty)
    // branches diverge after the prompt (rejected carries the 'not ' prefix)
    val chosen = enc.filter(col("branch") === "chosen")
      .select(col("doc_id"), col("token_ids").as("c_ids"))
    val rejected = enc.filter(col("branch") === "rejected")
      .select(col("doc_id"), col("token_ids").as("r_ids"))
    assert(chosen.join(rejected, "doc_id")
      .filter(col("c_ids") === col("r_ids")).isEmpty)
  }

  test("pairPreferenceExamples: one row per pair, branches adjacent, shared-prompt guard") {
    val d = sft.select(col("doc_id"), col("prompt"),
      col("completion").as("chosen"),
      concat(lit("not "), col("completion")).as("rejected"))
    val enc = TextOps.encodePreference(d, "doc_id", "prompt", "chosen", "rejected")
    val pairs = SampleOps.pairPreferenceExamples(enc, col("doc_id"))
    assert(pairs.count() == d.count())
    // n_prompt = the shared masked prefix; both branches start with it
    val bad = pairs.filter(
      slice(col("chosen_ids"), lit(1), col("n_prompt").cast("int")) =!=
        slice(col("rejected_ids"), lit(1), col("n_prompt").cast("int")) ||
      size(col("chosen_ids")) =!= size(col("chosen_mask")) ||
      size(col("rejected_ids")) =!= size(col("rejected_mask")) ||
      col("n_tokens") =!=
        (size(col("chosen_ids")) + size(col("rejected_ids"))).cast("long"))
    assert(bad.isEmpty)
    // prompt tokens masked 0 in both branches; first supervised at n_prompt+1
    assert(pairs.filter(
      array_position(col("chosen_mask"), 1) =!= col("n_prompt") + 1 ||
      array_position(col("rejected_mask"), 1) =!= col("n_prompt") + 1).isEmpty)
    // a pair missing one branch refuses
    val e1 = intercept[Exception] {
      SampleOps.pairPreferenceExamples(
        enc.filter(col("branch") === "chosen" || col("doc_id") % 7 =!= 0),
        col("doc_id")).collect()
    }
    assert(e1.getMessage.contains("exactly one") ||
      Option(e1.getCause).exists(_.getMessage.contains("exactly one")))
    // a pair whose prompts differ between branches refuses
    val skew = enc.withColumn("token_ids",
      when(col("branch") === "rejected" && col("doc_id") === 0L,
        concat(array(lit(999999L)), slice(col("token_ids"), 2, 1000000)))
        .otherwise(col("token_ids")))
    val e2 = intercept[Exception] {
      SampleOps.pairPreferenceExamples(skew, col("doc_id")).collect()
    }
    assert(e2.getMessage.contains("aligned") ||
      Option(e2.getCause).exists(_.getMessage.contains("aligned")))
  }

  test("packPreferencePairs: pairs are atomic in batches; oversize pair refuses; layout is partition-independent") {
    val d = sft.select(col("doc_id"), col("prompt"),
      col("completion").as("chosen"),
      concat(lit("not "), col("completion")).as("rejected"))
    val enc = TextOps.encodePreference(d, "doc_id", "prompt", "chosen", "rejected")
    val packed = SampleOps.packPreferencePairs(enc, col("doc_id"),
      capacity = 1024, buckets = 8)
    // every pair appears exactly once, whole (adjacency by construction)
    assert(packed.count() == d.count())
    assert(packed.groupBy("pair_key").count().filter(col("count") =!= 1).isEmpty)
    // bins respect capacity up to the documented one-pair overrun:
    // the bin's weight minus its LAST pair (in (h, key) order) fits
    val h = TextOps.charHash(col("pair_key").cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_bucket"), col("bin_seq"))
      .orderBy(h.desc, col("pair_key").desc)
    val overrun = packed
      .withColumn("__rk", row_number().over(w))
      .groupBy("pack_bucket", "bin_seq")
      .agg(sum(when(col("__rk") > 1, col("n_tokens")).otherwise(0L)).as("wo"))
      .filter(col("wo") > 1024)
    assert(overrun.isEmpty)
    // partition-independent layout
    val p2 = SampleOps.packPreferencePairs(enc.repartition(11), col("doc_id"),
      capacity = 1024, buckets = 8)
    assert(packed.exceptAll(p2).isEmpty && p2.exceptAll(packed).isEmpty)
    // an oversize pair refuses loudly
    val e = intercept[Exception] {
      SampleOps.packPreferencePairs(enc, col("doc_id"),
        capacity = 4, buckets = 8).collect()
    }
    assert(e.getMessage.contains("capacity") ||
      Option(e.getCause).exists(_.getMessage.contains("capacity")))
  }

  test("packSftSequencesSegmented: segment_id is the example ordinal within each sequence") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val seg = SampleOps.packSftSequencesSegmented(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    // dropping segment_id reproduces packSftSequences exactly
    val plain = SampleOps.packSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val segDropped = seg.drop("segment_id")
    assert(segDropped.exceptAll(plain).isEmpty &&
      plain.exceptAll(segDropped).isEmpty)
    // within a sequence: segments start at 0, are dense, and change
    // exactly where the source example changes in position order
    val perSeq = seg.groupBy("seq_id")
      .agg(array_sort(collect_list(struct(col("seq_pos"), col("segment_id"),
        col("src_key")))).as("xs"))
      .select(col("seq_id"), col("xs"),
        transform(col("xs"), x => x.getField("segment_id")).as("segs"),
        transform(col("xs"), x => x.getField("src_key")).as("keys"))
    // head segment is 0; increments are 0 within an example, +1 across
    val bad = perSeq.filter(
      element_at(col("segs"), 1) =!= 0 ||
      exists(zip_with(col("segs"), slice(col("segs"), 2, 1000000),
        (a, b) => b =!= a && b =!= a + 1), x => x))
    assert(bad.isEmpty)
    // a segment increment happens iff the source example changes
    val badChange = perSeq.filter(
      exists(
        zip_with(
          zip_with(col("segs"), slice(col("segs"), 2, 1000000),
            (a, b) => b - a),
          zip_with(col("keys"), slice(col("keys"), 2, 1000000),
            (a, b) => when(a === b, 0).otherwise(1)),
          (ds, dk) => ds =!= dk), x => x))
    assert(badChange.isEmpty)
  }

  test("packSftSequencesPadded: no example straddles a sequence; capacity and conservation hold") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val seqLen = 2048
    val packed = SampleOps.packSftSequencesPadded(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = seqLen, buckets = 8)
    // conservation: every (token, mask) pair lands exactly once
    assert(packed.count() == enc.agg(sum(col("n_tokens"))).head().getLong(0))
    // no straddle: each example lives in exactly ONE sequence
    val spread = packed.groupBy("src_key")
      .agg(countDistinct(col("seq_id")).as("ns"))
    assert(spread.filter(col("ns") =!= 1).isEmpty)
    // per-example reconstruction in (seq_pos) order is exact
    val back = packed.groupBy("src_key")
      .agg(transform(array_sort(collect_list(struct(col("seq_pos"),
        col("token_id")))), x => x.getField("token_id")).as("ids"))
      .join(enc.select(col("doc_id").as("src_key"), col("token_ids")),
        "src_key")
    assert(back.filter(col("ids") =!= col("token_ids")).isEmpty)
    // capacity: no sequence exceeds seqLen tokens; positions in range,
    // no collisions
    val perSeq = packed.groupBy("seq_id").agg(count(lit(1)).as("n"),
      countDistinct(col("seq_pos")).as("np"), max("seq_pos").as("mx"))
    assert(perSeq.filter(col("n") > seqLen || col("np") =!= col("n") ||
      col("mx") >= seqLen).isEmpty)
    // multiple examples share sequences (the reserve scheme packs, it
    // does not degenerate to one example per sequence at this seqLen)
    assert(packed.groupBy("seq_id")
      .agg(countDistinct(col("src_key")).as("nk"))
      .filter(col("nk") > 1).count() > 0)
    // deterministic across partitionings; explicit maxExample with the
    // same bound reproduces the derived-bound layout exactly
    val eMax = enc.agg(max(size(col("token_ids")))).head().getInt(0)
    val p2 = SampleOps.packSftSequencesPadded(enc.repartition(17),
      col("doc_id"), "token_ids", "loss_mask", seqLen = seqLen,
      buckets = 8, maxExample = eMax)
    assert(packed.exceptAll(p2).isEmpty && p2.exceptAll(packed).isEmpty)
    // an example past the declared bound refuses in-plan (even count())
    val e = intercept[Exception] {
      SampleOps.packSftSequencesPadded(enc, col("doc_id"), "token_ids",
        "loss_mask", seqLen = seqLen, buckets = 8,
        maxExample = 4).count()
    }
    assert(e.getMessage.contains("maxExample") ||
      Option(e.getCause).exists(_.getMessage.contains("maxExample")))
    // a corpus whose largest example cannot fit refuses up front
    val e2 = intercept[IllegalArgumentException] {
      SampleOps.packSftSequencesPadded(enc, col("doc_id"), "token_ids",
        "loss_mask", seqLen = 16, buckets = 8)
    }
    assert(e2.getMessage.contains("never fit"))
    // measured waste: padding exists but stays under the reserve bound
    val w = SampleOps.paddingWaste(packed, seqLen).head()
    assert(w.getAs[Long]("waste_ppm") > 0L &&
      w.getAs[Long]("waste_ppm") < 1000000L)
  }

  test("materializePackedSftSequences: fragment-fused assembly equals assembled packSftSequences bit-for-bit") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val fused = SampleOps.materializePackedSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val assembled = SampleOps.packSftSequences(enc, col("doc_id"),
        "token_ids", "loss_mask", seqLen = 128, buckets = 8)
      .groupBy("seq_id")
      .agg(
        transform(array_sort(collect_list(struct(col("seq_pos"),
          col("token_id"), col("loss_mask")))),
          x => x.getField("token_id")).as("token_ids"),
        transform(array_sort(collect_list(struct(col("seq_pos"),
          col("token_id"), col("loss_mask")))),
          x => x.getField("loss_mask")).as("loss_mask"),
        count(lit(1)).as("n_tokens"))
    assert(fused.exceptAll(assembled).isEmpty &&
      assembled.exceptAll(fused).isEmpty)
    // misaligned ids/mask refuse even under count()
    val bad = Seq((1L, Array(5L, 6L, 7L), Array(0, 1)))
      .toDF("doc_id", "token_ids", "loss_mask")
    val e = intercept[Exception] {
      SampleOps.materializePackedSftSequences(bad, col("doc_id"),
        "token_ids", "loss_mask", seqLen = 8, buckets = 2).count()
    }
    assert(e.getMessage != null)
  }

  test("packing is a pure content function: bit-identical across partitionings") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val p1 = SampleOps.packSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val p2 = SampleOps.packSftSequences(enc.repartition(13), col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
  }

  test("materializeSftCorpus: one call to a mountable supervised corpus — (t,lm) shards, sidecars, curation, rebuild-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sft_corpus").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      // plant an exact duplicate PAIR (3 == 1) and a low-quality row (4)
      val base = Seq(
        (1L, "please summarize the following passage about distributed shuffles for me now",
          "the shuffle moves rows between executors grouped by key and it is the dominant network cost in large joins"),
        (2L, "translate this sentence about partitions into plain words a reader follows",
          "a partition is the unit of parallel work each task reads transforms and writes independently of the others"),
        (3L, "please summarize the following passage about distributed shuffles for me now",
          "the shuffle moves rows between executors grouped by key and it is the dominant network cost in large joins"),
        (4L, "too short", "tiny"))
        .toDF("doc_id", "prompt", "completion")
      // the fixture must be non-vacuous under the op's own curation key
      val keyed = base.withColumn("__t",
        concat_ws("\u0000", col("prompt"), col("completion")))
      val refSurv = graft.ops.DedupOps.exactDedup(
        TextOps.qualityFilter(keyed, "__t"), "doc_id", "__t").drop("__t")
      assert(refSurv.select("doc_id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L), "fixture: dup 3 and low-quality 4 must drop")
      val (manifest, vocab) = SampleOps.materializeSftCorpus(base, "doc_id",
        "prompt", "completion", out, seqLen = 32, targetTokens = 200L,
        buckets = 4)
      // published shape == the streaming/compacted packed-SFT schema
      val back = spark.read.parquet(out)
      assert(back.columns.toSet ==
        Set("shard_id", "seq_key", "n_tokens", "text"))
      // sidecars: dense [0, V) vocab + specials, in the same swap
      val v = spark.read.parquet(out + "/_graft_vocab.parquet")
        .orderBy("dense_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(v.map(_._1).toSeq == (0L until v.length.toLong))
      val specials = spark.read.parquet(out + "/_graft_specials.parquet")
      assert(specials.filter(col("name") === "eos").count() == 1)
      // every id is dense; manifest totals == data totals
      val toks = back.select(explode(col("text")).as("p"))
        .select(col("p.t").as("t"), col("p.lm").as("lm"))
      assert(toks.agg(max("t")).head().getLong(0) < v.length)
      assert(manifest.collect().map(_.getLong(3)).sum ==
        back.agg(sum("n_tokens")).head().getLong(0))
      // supervision conserved: per the encode contract, scored tokens =
      // completion tokens + EOS per surviving example; EOS count = docs
      val eosDense = TextOps.denseId(vocab, TextOps.bpeEosId())
      val refEnc = TextOps.encodeSft(refSurv, "doc_id", "prompt", "completion")
      val wantScored = refEnc.select(
        aggregate(col("loss_mask"), lit(0L), (a, m) => a + m).as("s"))
        .agg(sum("s")).head().getLong(0)
      assert(toks.filter(col("lm") === 1).count() == wantScored)
      assert(toks.filter(col("t") === eosDense).count() == 2,
        "one supervised EOS per surviving example")
      // rebuild from a different partitioning is byte-identical
      val out2 = new java.io.File(dir, "corpus2").getPath
      SampleOps.materializeSftCorpus(base.repartition(7, col("completion")),
        "doc_id", "prompt", "completion", out2, seqLen = 32,
        targetTokens = 200L, buckets = 4)
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(out,
          "_graft_manifest.json")) ==
        java.nio.file.Files.readString(java.nio.file.Paths.get(out2,
          "_graft_manifest.json")))
      val h = (p: String) => spark.read.parquet(p)
        .agg(bit_xor(xxhash64(col("seq_key"), col("text").cast("string"))))
        .head().getLong(0)
      assert(h(out) == h(out2))
      // curate = false keeps all four examples (EOS per example)
      val out3 = new java.io.File(dir, "corpus3").getPath
      val (_, vocab3) = SampleOps.materializeSftCorpus(base, "doc_id",
        "prompt", "completion", out3, seqLen = 32, targetTokens = 200L,
        buckets = 4, curate = false)
      val eos3 = TextOps.denseId(vocab3, TextOps.bpeEosId())
      assert(spark.read.parquet(out3).select(explode(col("text")).as("p"))
        .filter(col("p.t") === eos3).count() == 4)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
