package graft

import org.apache.spark.sql.functions._

import graft.ops.{SampleOps, TextOps}

/** Multi-turn chat-template SFT encoding + the specials registry. */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val ids = TextOps.bpeSpecialIds()

  private def turns = Seq(
    (1L, 0L, "system", "be brief"),
    (1L, 1L, "user", "what is two plus two"),
    (1L, 2L, "assistant", "four"),
    (1L, 3L, "user", "and three more"),
    (1L, 4L, "assistant", "seven"),
    (2L, 0L, "user", "hello there"),
    (2L, 1L, "assistant", "hi")
  ).toDF("conv_id", "turn_ord", "role", "turn_text")

  test("specials registry: legacy slots unchanged, block moves together under extended merges") {
    assert(ids("eos") == TextOps.bpeEosId())
    assert(ids("image") == TextOps.bpeImageId())
    assert(ids("image") == ids("eos") + 1)
    assert(TextOps.bpeRoleId("assistant") == ids("role_assistant"))
    assert(TextOps.bpeEotId() == ids("eot"))
    // ids are consecutive in registry order
    assert(TextOps.SpecialTokenNames.map(ids) ==
      TextOps.SpecialTokenNames.indices.map(i => ids("eos") + i))
    // appending a merge rule shifts the WHOLE block by one
    val ext = TextOps.DefaultBpeMerges :+ ("zz", "qq")
    val extIds = TextOps.bpeSpecialIds(ext)
    assert(TextOps.SpecialTokenNames.forall(n => extIds(n) == ids(n) + 1))
    intercept[IllegalArgumentException] { TextOps.bpeRoleId("robot") }
  }

  test("encodeChat: per-turn template [role] text [EOT], conversation-final EOS") {
    val enc = TextOps.encodeChat(turns, "conv_id", "turn_ord", "role",
      "turn_text")
    val r = enc.filter(col("conv_id") === 1L).head()
    val tok = r.getSeq[Long](r.fieldIndex("token_ids"))
    val lm = r.getSeq[Int](r.fieldIndex("loss_mask"))
    assert(r.getAs[Long]("n_turns") == 5L)
    assert(tok.length == lm.length && r.getAs[Long]("n_tokens") == tok.length)
    // starts with the system marker, ends with EOS; five EOTs inside
    assert(tok.head == ids("role_system") && tok.last == ids("eos"))
    assert(tok.count(_ == ids("eot")) == 5)
    // role markers appear in turn order
    val markers = tok.filter(t => t >= ids("role_system") && t <= ids("role_assistant"))
    assert(markers == Seq(ids("role_system"), ids("role_user"),
      ids("role_assistant"), ids("role_user"), ids("role_assistant")))
    // mask: role markers always 0; EOS supervised
    tok.zip(lm).foreach { case (t, m) =>
      if (t >= ids("role_system") && t <= ids("role_assistant")) assert(m == 0)
    }
    assert(lm.last == 1)
    // assistant turns: text + EOT supervised — the supervised token
    // count is Σ over assistant turns of (n_text_ids + 1)
    val asst = Seq("four", "seven")
    val expSup = asst.map { t =>
      Seq(Tuple1(t)).toDF("t")
        .select(graft.functions.exprs.bpeTokenIds(col("t"),
          TextOps.DefaultBpeMerges, lossless = true))
        .head().getSeq[Long](0).length + 1
    }.sum + 1 // + final EOS
    assert(lm.count(_ == 1) == expSup)
  }

  test("encodeChat: round-trip — stripping specials and decoding yields the concatenated turn text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    // one doc = one conversation of 48-char slices: concatenated turn
    // texts ARE the document, so the decode must return it byte-exact
    val slices = Seq((0L, "system", 1), (1L, "user", 49),
      (2L, "assistant", 97), (3L, "user", 145))
    val tdf = slices.map { case (o, role, st) =>
      docs.select(col("doc_id"), lit(o).as("turn_ord"), lit(role).as("role"),
        substring(col("text"), st, 48).as("turn_text"))
    }.reduce(_ unionByName _).unionByName(
      docs.select(col("doc_id"), lit(4L).as("turn_ord"),
        lit("assistant").as("role"),
        substring(col("text"), 193, Int.MaxValue).as("turn_text")))
    val enc = TextOps.encodeChat(tdf, "doc_id", "turn_ord", "role",
      "turn_text")
    val textOnly = enc.select(col("doc_id"),
      filter(col("token_ids"), t => t < ids("eos")).as("token_ids"))
    val dec = TextOps.decodeBpe(textOnly, "doc_id", "token_ids")
    val bad = dec.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("decoded") =!= col("text"))
    assert(bad.isEmpty)
  }

  test("encodeChat: turn assembly is physical-order independent") {
    val enc1 = TextOps.encodeChat(turns, "conv_id", "turn_ord", "role",
      "turn_text")
    val enc2 = TextOps.encodeChat(turns.orderBy(rand(7)).repartition(5),
      "conv_id", "turn_ord", "role", "turn_text")
    assert(enc1.exceptAll(enc2).isEmpty && enc2.exceptAll(enc1).isEmpty)
  }

  test("encodeChat refusals: unknown role, null ordinal, duplicate ordinal") {
    val badRole = Seq((1L, 0L, "robot", "beep")).toDF(
      "conv_id", "turn_ord", "role", "turn_text")
    val e1 = intercept[Exception] {
      TextOps.encodeChat(badRole, "conv_id", "turn_ord", "role",
        "turn_text").collect()
    }
    assert(e1.getMessage.contains("unknown chat role") ||
      Option(e1.getCause).exists(_.getMessage.contains("unknown chat role")))
    val nullOrd = Seq((1L, Option.empty[Long], "user", "hi")).toDF(
      "conv_id", "turn_ord", "role", "turn_text")
    intercept[Exception] {
      TextOps.encodeChat(nullOrd, "conv_id", "turn_ord", "role",
        "turn_text").collect()
    }
    val dupOrd = Seq((1L, 0L, "user", "a"), (1L, 0L, "assistant", "b"))
      .toDF("conv_id", "turn_ord", "role", "turn_text")
    val e3 = intercept[Exception] {
      TextOps.encodeChat(dupOrd, "conv_id", "turn_ord", "role",
        "turn_text").select("token_ids").collect()
    }
    assert(e3.getMessage.contains("duplicate turn_ord") ||
      Option(e3.getCause).exists(_.getMessage.contains("duplicate turn_ord")))
    // the refusal must survive COLUMN PRUNING: a consumer projecting
    // only loss_mask (or only n_turns) drops token_ids — and with it
    // a guard that rode only the ids expression; the mask would then
    // carry content-dependent ordering and desync against ids read
    // elsewhere. The guard wraps the sorted turn list itself, so every
    // derived column evaluates it.
    for (onlyCol <- Seq("loss_mask", "n_turns")) {
      val e = intercept[Exception] {
        TextOps.encodeChat(dupOrd, "conv_id", "turn_ord", "role",
          "turn_text").select(onlyCol).collect()
      }
      assert(e.getMessage.contains("duplicate turn_ord") ||
        Option(e.getCause).exists(_.getMessage.contains("duplicate turn_ord")),
        s"projecting only $onlyCol must still refuse")
    }
  }

  test("encodeChat packs through packSftSequences with the mask riding along") {
    val enc = TextOps.encodeChat(turns, "conv_id", "turn_ord", "role",
      "turn_text")
    val packed = SampleOps.packSftSequences(enc, col("conv_id"),
      "token_ids", "loss_mask", seqLen = 16, buckets = 2)
    // token conservation: every encoded token lands exactly once
    val nEnc = enc.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(packed.count() == nEnc)
    // supervised-token conservation
    val supEnc = enc.select(explode(col("loss_mask")).as("m"))
      .filter(col("m") === 1).count()
    assert(packed.filter(col("loss_mask") === 1).count() == supEnc)
  }
}
