package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** Spec gate for the HLL distinct-count sketches (no DuckDB oracle is
  * expressible for sketch bytes — different HLL implementation): error
  * bound vs exact, merge-vs-whole equality, partitioning invariance, and
  * the incremental daily fold. */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def est(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    df.select(col("lang"), col("n_rows"),
        SketchOps.estimate(col("sketch")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("estimate tracks exact distinct within the lgK error envelope") {
    val got = est(SketchOps.distinctSketches(docs, "doc_id", groupCols = Seq("lang")))
    val exact = docs.groupBy("lang").agg(
        countDistinct(col("doc_id")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(1))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (lang, (n, d)) =>
      val (en, ed) = exact(lang)
      assert(n == en, s"n_rows for $lang")
      // 3x the HLL standard error 1.04/sqrt(2^12) ~ 1.6% -> 5%
      assert(math.abs(d - ed).toDouble <= math.max(1.0, 0.05 * ed),
        s"estimate $d vs exact $ed for $lang")
    }
  }

  test("merging per-source sketches equals sketching the whole slice") {
    val perSource = SketchOps.distinctSketches(docs, "doc_id",
      groupCols = Seq("lang", "source"))
    val merged = est(SketchOps.mergeSketches(perSource, groupCols = Seq("lang")))
    val whole = est(SketchOps.distinctSketches(docs, "doc_id", groupCols = Seq("lang")))
    assert(merged == whole)
  }

  test("sketch estimate is invariant under partitioning") {
    val byPart = Seq(1, 3, 7, 32).map { p =>
      est(SketchOps.distinctSketches(docs.repartition(p), "doc_id",
        groupCols = Seq("lang")))
    }
    assert(byPart.distinct.size == 1)
  }

  test("incremental daily fold equals the one-shot sketch") {
    // three "days" carved by doc_id range, folded one at a time
    val days = Seq(
      docs.filter(col("doc_id") < 150),
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 350),
      docs.filter(col("doc_id") >= 350))
    val folded = days.tail.foldLeft(
      SketchOps.distinctSketches(days.head, "doc_id", groupCols = Seq("lang"))) {
      (stored, day) =>
        SketchOps.updateSketchIndex(stored,
          SketchOps.distinctSketches(day, "doc_id", groupCols = Seq("lang")),
          groupCols = Seq("lang"))
    }
    assert(est(folded) ==
      est(SketchOps.distinctSketches(docs, "doc_id", groupCols = Seq("lang"))))
  }

  test("mixed-precision slices still merge (coarser lgK wins)") {
    val a = SketchOps.distinctSketches(docs.filter(col("doc_id") < 250),
      "doc_id", lgK = 12, groupCols = Seq("lang"))
    val b = SketchOps.distinctSketches(docs.filter(col("doc_id") >= 250),
      "doc_id", lgK = 10, groupCols = Seq("lang"))
    val merged = est(SketchOps.mergeSketches(a.unionByName(b), groupCols = Seq("lang")))
    val exact = docs.groupBy("lang").agg(countDistinct(col("doc_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (lang, (_, d)) =>
      val ed = exact(lang)
      assert(math.abs(d - ed).toDouble <= math.max(1.0, 0.10 * ed),
        s"merged estimate $d vs exact $ed for $lang")
    }
  }

  test("updateSketchIndex: null group keys stay one group; no group keys fold globally") {
    import spark.implicits._
    import graft.ops.SketchOps
    // null lang on BOTH sides must merge into a single row (null-safe join)
    val a = SketchOps.distinctSketches(
      Seq((0L, Option.empty[String]), (1L, Some("en"))).toDF("id", "lang"),
      "id", groupCols = Seq("lang"))
    val b = SketchOps.distinctSketches(
      Seq((2L, Option.empty[String]), (3L, Some("en"))).toDF("id", "lang"),
      "id", groupCols = Seq("lang"))
    val folded = SketchOps.updateSketchIndex(a, b, Seq("lang"))
      .select(col("lang"), col("n_rows"),
        SketchOps.estimate(col("sketch")).as("d")).collect()
    assert(folded.length == 2)
    val byKey = folded.map(r =>
      Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey(None) == (2L, 2L) && byKey(Some("en")) == (2L, 2L))
    // no group keys: the two global rows merge instead of require-failing
    val ga = SketchOps.distinctSketches(Seq(0L, 1L).toDF("id"), "id")
    val gb = SketchOps.distinctSketches(Seq(1L, 2L).toDF("id"), "id")
    val g = SketchOps.updateSketchIndex(ga, gb, Nil)
      .select(col("n_rows"), SketchOps.estimate(col("sketch"))).head()
    assert(g.getLong(0) == 4L && g.getLong(1) == 3L)
  }

  test("HLL sketch index round-trips through parquet: rolling 7-of-30-day distinct users") {
    // The consumer path end-to-end: per-day slices sketched ONCE,
    // PERSISTED as a parquet sketch index, read back cold, the last 7
    // day-slices merged, and the rolling-window distinct answered from
    // ~2 KB buffers — no re-scan of the raw events. (Bytes survive the
    // parquet binary round-trip byte-for-byte or the union would
    // reject/garble them.)
    val events = graft.ops.EventOps.loadEvents(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
    val path = "/tmp/graft_sketch_index_rt"
    SketchOps.distinctSketches(events, "user_id", groupCols = Seq("day"))
      .write.mode("overwrite").parquet(path)

    val stored = spark.read.parquet(path)
    val days = stored.select("day").distinct().orderBy(col("day").desc)
      .collect().map(_.getDate(0))
    assert(days.length == 30, s"expected 30 day slices, got ${days.length}")
    val window = days.take(7).toSeq

    val merged = SketchOps.mergeSketches(stored.filter(col("day").isin(window: _*)))
    val (nRows, estD) = merged
      .select(col("n_rows"), SketchOps.estimate(col("sketch")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head

    val (exactRows, exactD) = events.filter(col("day").isin(window: _*))
      .agg(count(lit(1)), countDistinct(col("user_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(nRows == exactRows, s"n_rows fold $nRows vs exact $exactRows")
    assert(math.abs(estD - exactD).toDouble <= math.max(1.0, 0.05 * exactD),
      s"rolling estimate $estD vs exact $exactD")
  }

  test("CMS estimates are one-sided and exact when no collision") {
    import spark.implicits._
    import graft.ops.SketchOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cells = SketchOps.cmsCells(docs, "text", depth = 3, log2w = 5)
    val tc = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_true"))
    val est = tc.join(
      SketchOps.cmsEstimates(tc.select("term"), "term", cells, depth = 3, log2w = 5),
      Seq("term")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (t, nt, ne) =>
      assert(ne >= nt, s"CMS under-counted $t: $ne < $nt")
    }
    // a wide sketch (no collisions at this vocabulary) is exact
    val wide = SketchOps.cmsCells(docs, "text", depth = 3, log2w = 14)
    tc.join(SketchOps.cmsEstimates(tc.select("term"), "term", wide,
        depth = 3, log2w = 14), Seq("term"))
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
    // an unseen term reads 0 from the wide sketch (its cells are empty
    // there; in the 32-cell sketch occupied cells over-count it — the
    // standard CMS one-sided error, also asserted above)
    val unseen = SketchOps.cmsEstimates(Seq("never-seen-term-xyz").toDF("term"),
      "term", wide, depth = 3, log2w = 14).collect()
    assert(unseen.head.getLong(1) == 0L)
  }

  test("CMS cells merge by union+re-sum == whole-corpus build, any partitioning") {
    import graft.ops.SketchOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def cellMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => ((r.getInt(0).toLong, r.getLong(1)), r.getLong(2))).toMap
    val whole = cellMap(SketchOps.cmsCells(docs, "text", 3, 6))
    val merged = cellMap(SketchOps.cmsMerge(Seq(
      SketchOps.cmsCells(docs.filter(col("doc_id") < 250), "text", 3, 6),
      SketchOps.cmsCells(docs.filter(col("doc_id") >= 250), "text", 3, 6))))
    assert(whole == merged)
    val repart = cellMap(SketchOps.cmsCells(docs.repartition(7), "text", 3, 6))
    assert(whole == repart)
  }

  test("empty input yields an empty sketch table; estimate of union with empty is unchanged") {
    val empty = SketchOps.distinctSketches(docs.filter(lit(false)), "doc_id",
      groupCols = Seq("lang"))
    assert(empty.count() == 0L)
    val stored = SketchOps.distinctSketches(docs, "doc_id", groupCols = Seq("lang"))
    assert(est(SketchOps.updateSketchIndex(stored, empty, Seq("lang"))) == est(stored))
  }
}
