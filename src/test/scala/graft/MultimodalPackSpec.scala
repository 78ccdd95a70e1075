package graft

import org.apache.spark.sql.functions._

import graft.ops.{SampleOps, TextOps}

/** Interleaved multimodal encoding + embedding-slot alignment. */
class MultimodalPackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("text").isNotNull)

  private def media = docs
    .select(col("doc_id"),
      posexplode(array_repeat(lit(1), (col("doc_id") % 3).cast("int")))
        .as(Seq("ord", "__x")))
    .select(col("doc_id"), (col("doc_id") * 10 + col("ord")).as("media_id"))

  test("encodeMultimodal: placeholders lead, masked 0; text+EOS masked 1; media-less docs are plain") {
    val enc = TextOps.encodeMultimodal(docs, media, "doc_id", "text")
    val img = TextOps.bpeImageId()
    val eos = TextOps.bpeEosId()
    // first n_media ids are placeholders with mask 0
    val badLead = enc.filter(
      exists(zip_with(slice(col("token_ids"), lit(1), col("n_media").cast("int")),
        slice(col("loss_mask"), lit(1), col("n_media").cast("int")),
        (t, m) => t =!= img || m =!= 0), x => x))
    assert(badLead.isEmpty)
    // exactly n_media placeholders (none leak into the text tail)
    val badCount = enc.withColumn("n_img",
      size(filter(col("token_ids"), t => t === img)))
      .filter(col("n_img") =!= col("n_media"))
    assert(badCount.isEmpty)
    // ends with supervised EOS
    assert(enc.filter(element_at(col("token_ids"), -1) =!= eos ||
      element_at(col("loss_mask"), -1) =!= 1).isEmpty)
    // doc_id % 3 == 0 docs carry no media
    assert(enc.filter(col("doc_id") % 3 === 0 && col("n_media") =!= 0).isEmpty)
  }

  test("alignment coordinates hold image-placeholder tokens in the packed stream") {
    val enc = TextOps.encodeMultimodal(docs, media, "doc_id", "text")
    val packed = SampleOps.packSftSequences(enc, col("doc_id"),
      "token_ids", "loss_mask", seqLen = 128, buckets = 8)
    val align = SampleOps.multimodalAlignment(enc, media, col("doc_id"),
      "media_id", seqLen = 128, buckets = 8)
    // one alignment row per attachment
    assert(align.count() == media.count())
    // every coordinate resolves to an image token of the SAME doc, mask 0
    val img = TextOps.bpeImageId()
    val joined = align.join(packed, Seq("seq_id", "seq_pos"))
    assert(joined.count() == align.count())
    assert(joined.filter(col("token_id") =!= img || col("loss_mask") =!= 0 ||
      align("src_key") =!= packed("src_key")).isEmpty)
  }

  test("null-text doc encodes as an image-only example; its attachments survive") {
    val d = Seq((1L, "a caption"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Seq((2L, 20L), (2L, 21L)).toDF("doc_id", "media_id")
    val enc = TextOps.encodeMultimodal(d, m, "doc_id", "text")
    val r2 = enc.filter(col("doc_id") === 2).head()
    assert(r2.getAs[Long]("n_media") == 2L)
    assert(r2.getSeq[Long](1) ==
      Seq(TextOps.bpeImageId(), TextOps.bpeImageId(), TextOps.bpeEosId()))
    val align = SampleOps.multimodalAlignment(enc, m, col("doc_id"),
      "media_id", seqLen = 16, buckets = 2)
    assert(align.count() == 2)
  }

  test("alignment refuses a media table the encode never counted") {
    val d = Seq((1L, "some text here")).toDF("doc_id", "text")
    val m1 = Seq((1L, 10L)).toDF("doc_id", "media_id")
    val m2 = Seq((1L, 10L), (1L, 11L)).toDF("doc_id", "media_id") // extra row
    val enc = TextOps.encodeMultimodal(d, m1, "doc_id", "text")
    val e = intercept[Exception] {
      SampleOps.multimodalAlignment(enc, m2, col("doc_id"), "media_id",
        seqLen = 16, buckets = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("alignment refuses a media row keyed to a doc absent from the encode") {
    val d = Seq((1L, "some text here")).toDF("doc_id", "text")
    val m1 = Seq((1L, 10L)).toDF("doc_id", "media_id")
    // media for doc 2, which the encode never saw: must refuse, not
    // silently shrink the alignment table
    val m3 = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "media_id")
    val enc = TextOps.encodeMultimodal(d, m1, "doc_id", "text")
    val e = intercept[Exception] {
      SampleOps.multimodalAlignment(enc, m3, col("doc_id"), "media_id",
        seqLen = 16, buckets = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("alignment is a pure content function across partitionings") {
    val enc = TextOps.encodeMultimodal(docs, media, "doc_id", "text")
    val a1 = SampleOps.multimodalAlignment(enc, media, col("doc_id"),
      "media_id", seqLen = 128, buckets = 8)
    val a2 = SampleOps.multimodalAlignment(enc.repartition(13),
      media.repartition(7), col("doc_id"), "media_id", seqLen = 128, buckets = 8)
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
  }
}
