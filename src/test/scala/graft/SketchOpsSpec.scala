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

  test("empty input yields an empty sketch table; estimate of union with empty is unchanged") {
    val empty = SketchOps.distinctSketches(docs.filter(lit(false)), "doc_id",
      groupCols = Seq("lang"))
    assert(empty.count() == 0L)
    val stored = SketchOps.distinctSketches(docs, "doc_id", groupCols = Seq("lang"))
    assert(est(SketchOps.updateSketchIndex(stored, empty, Seq("lang"))) == est(stored))
  }
}
