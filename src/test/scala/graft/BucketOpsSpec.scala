package graft

import org.apache.spark.sql.functions._

import graft.ops.BucketOps

class BucketOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join exchange-free with correct results") {
    val left = (0L until 100L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (50L until 150L).map(i => (i, i * 2)).toDF("id", "rv")
    BucketOps.writeBucketed(left, "bucket_left", "id", buckets = 4)
    BucketOps.writeBucketed(right, "bucket_right", "id", buckets = 4)

    // force the sort-merge path (tiny fixtures would broadcast, which
    // disables bucketed reading entirely) to show the exchange-free join
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketOps.bucketedJoin(spark, "bucket_left", "bucket_right", "id")
      assert(BucketOps.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
      assert(joined.count() == 50)
      assert(joined.filter(col("id") === 60L).head().getLong(2) == 120L)

      // the same join on plain (unbucketed) frames DOES shuffle — the
      // baseline that bucketing removes
      val plain = left.join(right, Seq("id"))
      assert(!BucketOps.isShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
