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

  test("zInterleave places bits on the Morton curve") {
    import graft.functions.HashKernels.zInterleave
    assert(zInterleave(0L, 0L, 8) == 0L)
    assert(zInterleave(1L, 0L, 8) == 1L)
    assert(zInterleave(0L, 1L, 8) == 2L)
    assert(zInterleave(1L, 1L, 8) == 3L)
    assert(zInterleave(2L, 0L, 8) == 4L)
    assert(zInterleave(0L, 2L, 8) == 8L)
    // by-hand interleave on random pairs
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val a = rnd.nextInt(1 << 15).toLong
      val b = rnd.nextInt(1 << 15).toLong
      val expected = (0 until 15).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
      assert(zInterleave(a, b, 15) == expected)
    }
    // out-of-domain values clamp instead of corrupting high bits
    assert(zInterleave(-5L, 1L << 40, 8) == zInterleave(0L, 255L, 8))
  }

  test("z-ordered layout makes file min/max stats selective on BOTH dimensions") {
    // two independent uniform dims; a single-column sort leaves the other
    // dimension's per-file spread at ~full range, the z-sort shrinks both
    val n = 1 << 14
    val rnd = new scala.util.Random(11)
    val rows = (0 until n).map(_ => (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("x", "y")
    val files = 16

    def meanSpread(path: String): (Double, Double) = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect()
      assert(per.length > 1)
      (per.map(_.getLong(1)).sum.toDouble / per.length,
        per.map(_.getLong(2)).sum.toDouble / per.length)
    }

    BucketOps.writeZOrdered(df, "/tmp/graft_zorder_test", "x", "y", files)
    df.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet("/tmp/graft_xsort_test")

    val (zx, zy) = meanSpread("/tmp/graft_zorder_test")
    val (sx, sy) = meanSpread("/tmp/graft_xsort_test")
    // the x-sort is near-perfect on x but unselective on y
    assert(sx < 200 && sy > 900, s"x-sort spreads: $sx / $sy")
    // the z-sort is selective on BOTH dims (16 files ~ 4x4 grid -> ~1/4
    // of the 1024 range each; allow slack for block boundaries)
    assert(zx < 600 && zy < 600, s"z-sort spreads: $zx / $zy")
    assert(zy < sy / 2, s"z-sort y-spread $zy should at least halve $sy")
  }

  test("z-order layout pays exactly ONE stats scan (literal bounds, no per-reference subqueries)") {
    // All four scaling bounds (min/max of both dims) come from one eager
    // min/max aggregate and are folded into the plan as LITERALS. The
    // previous shape — a scalar subquery per bound — re-scanned the
    // whole input four(+) times at layout time, because subquery
    // expressions clone per reference.
    // parquet-backed input (a local relation would constant-fold the
    // whole projection away, hiding the shape under test)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val zdf = BucketOps.zOrdered(df, "doc_id", "n_chars", files = 4)
    val plan = zdf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("scalar-subquery") && !plan.contains("Aggregate"),
      "stats bounds must be pre-collected literals, not in-plan aggregates:\n" +
        plan.take(3000))
    // the literal scaling divisor really is in the plan — computed the
    // same way the op does (max(mx - mn, 1e-300)); asserting on max()
    // alone only worked because min(doc_id) == 0 in this corpus
    val r = df.agg(min("doc_id").cast("double"), max("doc_id").cast("double")).head()
    val divisor = math.max(r.getDouble(1) - r.getDouble(0), 1e-300)
    assert(plan.contains(divisor.toString), s"expected literal divisor $divisor in:\n" +
      plan.take(3000))
  }
}
