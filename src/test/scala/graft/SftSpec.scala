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

  test("packing is a pure content function: bit-identical across partitionings") {
    val enc = TextOps.encodeSft(sft, "doc_id", "prompt", "completion")
    val p1 = SampleOps.packSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val p2 = SampleOps.packSftSequences(enc.repartition(13), col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
  }
}
