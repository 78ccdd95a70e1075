package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps
import graft.functions.HashKernels

/** Stamp-and-refuse discipline for persisted hash-derived artifacts
  * (ADVICE r15: a pre-migration gram set / signature index replayed
  * through post-migration consumers silently matches nothing — the
  * failure the graft_pq_residual stamp prevents for PQ indexes).
  */
class HashStampSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stamp").toString
    s"$d/$name"
  }

  test("gram set: publish stamps, load roundtrips, mismatch refuses") {
    val grams = DedupOps.contaminationGramSet(docs, "doc_id", "text", k = 5)
    val path = tmp("grams")
    DedupOps.publishGramSet(spark, grams, path)
    val loaded = DedupOps.loadGramSet(spark, path)
    assert(loaded.toSeq == grams.toSeq.sorted)
    // forge an artifact stamped with the previous family
    val forged = tmp("grams_old")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(HashKernels.FamilyStampKey, "p30-h3").build()
    grams.toSeq.toDF("gram").select(col("gram").as("gram", meta))
      .write.parquet(forged)
    val e = intercept[IllegalArgumentException] {
      DedupOps.loadGramSet(spark, forged)
    }
    assert(e.getMessage.contains("p30-h3") && e.getMessage.contains("rebuild"))
    // unstamped legacy artifact loads (with a warning), not a refusal
    val legacy = tmp("grams_legacy")
    grams.toSeq.toDF("gram").write.parquet(legacy)
    assert(DedupOps.loadGramSet(spark, legacy).length == grams.length)
  }

  test("bloom bitmap: publish/load roundtrip and mismatch refusal") {
    val bm = DedupOps.bloomBitmap(docs, "doc_id", "text", k = 5, log2m = 10)
    val path = tmp("bloom")
    DedupOps.publishBloomBitmap(spark, bm, path)
    assert(DedupOps.loadBloomBitmap(spark, path).toSeq == bm.toSeq)
    val forged = tmp("bloom_old")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(HashKernels.FamilyStampKey, "p30-h3").build()
    Seq(bm.toSeq).toDF("bm").select(col("bm").as("bm", meta)).write.parquet(forged)
    intercept[IllegalArgumentException] {
      DedupOps.loadBloomBitmap(spark, forged)
    }
  }

  test("minhash signature index: stamp survives parquet; stale index refused") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 8, 3)
    assert(DedupOps.hashFamilyOf(sigs, "mh0").contains(HashKernels.FamilyId))
    val path = tmp("sigs")
    sigs.write.parquet(path)
    val stored = spark.read.parquet(path)
    assert(DedupOps.hashFamilyOf(stored, "mh0").contains(HashKernels.FamilyId))
    // current-family stored index: accepted
    DedupOps.dedupAgainstIndex(docs, stored, "doc_id", "text",
      numHashes = 8, bands = 4).count()
    // stale-family stored index: refused
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(HashKernels.FamilyStampKey, "p30-h3").build()
    val stale = stored.select(col("mh0").as("mh0", meta) +:
      (1 until 8).map(j => col(s"mh$j")) :+ col("doc_id"): _*)
    val e = intercept[IllegalArgumentException] {
      DedupOps.dedupAgainstIndex(docs, stale, "doc_id", "text",
        numHashes = 8, bands = 4)
    }
    assert(e.getMessage.contains("p30-h3"))
  }

  test("simhash index: relative check — disagreeing stamps refuse") {
    val sigs = DedupOps.simhash(docs, "doc_id", "text", 60)
    assert(DedupOps.hashFamilyOf(sigs, "simhash").contains(HashKernels.FamilyId))
    // same family both sides: fine
    DedupOps.hammingAgainstIndex(sigs, sigs, "doc_id", "simhash", 60, 6).count()
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(HashKernels.FamilyStampKey, "p30-h3").build()
    val stale = sigs.select(col("doc_id"), col("simhash").as("simhash", meta))
    val e = intercept[IllegalArgumentException] {
      DedupOps.hammingAgainstIndex(sigs, stale, "doc_id", "simhash", 60, 6)
    }
    assert(e.getMessage.contains("p30-h3"))
    // unstamped signatures on BOTH sides (media phash flows): no check
    val bare = sigs.select(col("doc_id"), col("simhash").cast("long").as("simhash"))
    DedupOps.hammingAgainstIndex(bare, bare, "doc_id", "simhash", 60, 6).count()
  }
}
