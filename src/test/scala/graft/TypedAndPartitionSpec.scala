package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.ops.{Pipeline, TypedDocs}
import graft.streaming.StreamOps

class TypedAndPartitionSpec extends SparkSpec {
  import spark.implicits._

  test("typed facade loads, scores, and gates real documents") {
    val docs = TypedDocs.load(spark, "/root/testdata/sf0.001")
    assert(docs.head().text.nonEmpty)
    val scored = TypedDocs.score(docs)
    assert(scored.filter(_.n_words <= 0).isEmpty)
    val kept = TypedDocs.keepQuality(docs)
    assert(kept.count() > 0 && kept.count() <= docs.count())
    assert(kept.head().doc_id >= 0)
    // typed tail of the pipeline: gate -> chunk, still Dataset-shaped
    val chunks = TypedDocs.chunk(kept, chunkTokens = 32, overlap = 8)
    assert(chunks.count() >= kept.count()) // every doc yields >= 1 chunk
    assert(chunks.filter(_.n_tokens > 32).isEmpty)
  }

  test("partitioned index publish prunes partitions on range reads") {
    val path = Files.createTempDirectory("graft_part_idx").toFile.getAbsolutePath + "/idx"
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    Pipeline.writeIndexPartitioned(df, path, idsPerPartition = 100L)

    val rd = Pipeline.readIndexRange(spark, path, 100L, lo = 250, hi = 260)
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("id_bucket"), plan.take(1500))
    assert(rd.count() == 11)
    assert(rd.agg(min("id"), max("id")).head().toSeq == Seq(250L, 260L))
    // only buckets 2..2 (250/100=2, 260/100=2) are read
    assert(spark.read.parquet(path).select("id_bucket").distinct().count() == 10)
  }

  test("streaming firstSeenPerKey dedups across micro-batches") {
    val in = Files.createTempDirectory("graft_fsk_in").toFile.getAbsolutePath
    Seq(StreamOps.Keyed(1L, 0L, "first"), StreamOps.Keyed(2L, 1L, "only"),
      StreamOps.Keyed(1L, 2L, "dup"))
      .toDF().write.mode("overwrite").parquet(in)
    val stream = StreamOps.streamSource(spark, in,
      spark.read.parquet(in).schema).as[StreamOps.Keyed]
    val q = StreamOps.firstSeenPerKey(stream)
      .writeStream.format("memory").queryName("fsk")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("fsk").orderBy("key").collect()
    assert(got.length == 2)
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
