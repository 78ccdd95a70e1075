package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.IndexOps
import graft.ops.IndexOps._

/** Ports of the reference's unit fixtures (FIXTURES.md §A; reference
  * test_tmdb_index.py line refs per test).
  */
class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- O1 align_id_col (test_tmdb_index.py:29-47) ---

  test("alignIdCol fills id gaps with null rows") {
    val df = Seq((0L, Some(10L)), (2L, Some(30L))).toDF("id", "value")
    val got = alignIdCol(df).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq ==
      Seq((0L, Some(10L)), (1L, None), (2L, Some(30L))))
  }

  test("alignIdCol passes empty frame through") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType))))
    assert(alignIdCol(df).count() == 0)
  }

  test("alignIdCol requires id column") {
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] { alignIdCol(df) }
  }

  test("alignIdCol preserves column order") {
    val df = Seq((5L, "a", 1L)).toDF("value", "name", "id")
    assert(alignIdCol(df).columns.toSeq == Seq("value", "name", "id"))
  }

  test("alignIdCol preserves the input id dtype") {
    val df = Seq((2, "a")).toDF("id", "v") // IntegerType id
    val out = alignIdCol(df)
    assert(out.schema("id").dataType == IntegerType)
    assert(out.count() == 3)
  }

  // --- O2 update_or_append (test_tmdb_index.py:50-92) ---

  test("updateOrAppend keep-last upsert") {
    val old = Seq((0L, 10L), (1L, 20L)).toDF("id", "value")
    val delta = Seq((1L, 200L), (2L, 30L)).toDF("id", "value")
    val got = updateOrAppend(old, delta).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 10L), (1L, 200L), (2L, 30L)))
  }

  test("updateOrAppend schema evolution: union order + enrichment join") {
    // reference test_tmdb_index.py:65-80 — the single most
    // behavior-defining test in the suite
    val old = Seq((1L, 10L, 11L), (2L, 20L, 22L)).toDF("id", "a", "b")
    val delta = Seq((2L, 222L, 42L), (3L, 333L, 43L)).toDF("id", "b", "c")
    val got = updateOrAppend(old, delta)
    assert(got.columns.toSeq == Seq("id", "a", "b", "c"))
    val rows = got.orderBy("id").collect()
    def opt(r: Row, i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    assert(rows.map(r => (r.getLong(0), opt(r, 1), opt(r, 2), opt(r, 3))).toSeq ==
      Seq(
        (1L, Some(10L), Some(11L), None),
        (2L, Some(20L), Some(222L), Some(42L)), // old `a` kept, new b, new c
        (3L, None, Some(333L), Some(43L))))
  }

  test("updateOrAppend with empty left bootstraps from delta") {
    val old = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType))))
    val delta = Seq((0L, 1L), (1L, 2L)).toDF("id", "value")
    val got = updateOrAppend(old, delta)
    assert(got.columns.toSeq == Seq("id", "value"))
    assert(got.count() == 2)
  }

  test("updateOrAppend rejects dtype collisions") {
    val old = Seq((1L, 1L)).toDF("id", "v")
    val delta = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] { updateOrAppend(old, delta) }
  }

  test("updateOrAppend rejects a delta with duplicate ids") {
    val old = Seq((0L, 1L)).toDF("id", "v")
    val delta = Seq((1L, 2L), (1L, 3L)).toDF("id", "v")
    intercept[IllegalArgumentException] { updateOrAppend(old, delta) }
  }

  test("updateOrAppend dedups delta keep-last by explicit ordinal") {
    val old = Seq((0L, 1L)).toDF("id", "v")
    val delta = Seq((1L, 2L, 0), (1L, 3L, 1)).toDF("id", "v", "ord")
    val got = updateOrAppend(old, delta, Some(col("ord")))
      .orderBy("id").select("id", "v").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L), (1L, 3L)))
  }

  // --- O3 validate (test via idCheck) ---

  test("idCheck dense id is valid") {
    val df = Seq(0L, 1L, 2L, 3L).toDF("id")
    assert(idCheck(df).head().getAs[Boolean]("valid"))
    validateId(df) // must not throw
  }

  test("idCheck detects gaps, dups, offset start") {
    assert(!idCheck(Seq(0L, 2L).toDF("id")).head().getAs[Boolean]("valid"))
    assert(!idCheck(Seq(0L, 1L, 1L).toDF("id")).head().getAs[Boolean]("valid"))
    assert(!idCheck(Seq(1L, 2L).toDF("id")).head().getAs[Boolean]("valid"))
    intercept[IllegalArgumentException] { validateId(Seq(1L, 2L).toDF("id")) }
  }

  test("idCheck empty frame is valid") {
    val df = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType))))
    assert(idCheck(df).head().getAs[Boolean]("valid"))
  }

  // --- O4 change_summary four quadrants (test_tmdb_index.py:95-148) ---

  private def summary(old: Seq[(Long, Long)], nw: Seq[(Long, Long)]) = {
    val r = changeSummary(old.toDF("id", "value"), nw.toDF("id", "value")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("changeSummary added") {
    assert(summary(Seq((0L, 1L)), Seq((0L, 1L), (1L, 2L))) == (1L, 0L, 0L))
  }
  test("changeSummary removed") {
    assert(summary(Seq((0L, 1L), (1L, 2L)), Seq((0L, 1L))) == (0L, 1L, 0L))
  }
  test("changeSummary updated") {
    assert(summary(Seq((0L, 1L), (1L, 2L)), Seq((0L, 9L), (1L, 8L))) == (0L, 0L, 2L))
  }
  test("changeSummary noop") {
    assert(summary(Seq((0L, 1L), (1L, 2L)), Seq((0L, 1L), (1L, 2L))) == (0L, 0L, 0L))
  }

  // --- O6 compute_stats (test_tmdb_index.py:652-795) ---

  test("computeStats null-propagating updated count and bool profile") {
    // old adult: [T, F, null]; new adult: [F, null, T, F]
    // padded compare: T!=F (1), F!=null (no), null!=T (no), null!=F (no)
    // → updated = 1; nulls=1, true=1, false=2 of 4 rows
    val old = Seq((0L, Some(true)), (1L, Some(false)), (2L, None: Option[Boolean]))
      .toDF("id", "adult")
    val nw = Seq((0L, Some(false)), (1L, None: Option[Boolean]),
      (2L, Some(true)), (3L, Some(false))).toDF("id", "adult")
    val r = computeStats(old, nw).filter($"name" === "adult").head()
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Long]("n_true") == 1L)
    assert(r.getAs[Long]("n_false") == 2L)
    assert(r.getAs[Long]("n_updated") == 1L)
  }

  test("computeStats on empty frames (test_tmdb_index.py:783-795)") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType), StructField("adult", BooleanType))))
    val got = computeStats(empty, empty).orderBy("name").collect()
    assert(got.length == 2)
    val byName = got.map(r => r.getString(0) -> r).toMap
    assert(byName("id").getBoolean(5)) // unique on empty = true
    assert(byName("adult").getString(1) == "boolean")
    assert(got.forall(r => r.getLong(2) == 0 && r.getLong(6) == 0))
  }

  test("computeStats uniqueness ignores nulls") {
    val old = Seq((0L, Some(1L))).toDF("id", "v")
    val nw = Seq((0L, Some(1L)), (1L, Some(2L)), (2L, None: Option[Long]),
      (3L, None: Option[Long])).toDF("id", "v")
    val r = computeStats(old, nw).filter($"name" === "v").head()
    assert(r.getAs[Boolean]("is_unique")) // nulls excluded from uniqueness
    assert(r.getAs[Long]("n_null") == 2L)
  }

  // --- O14 duplicate_ids (test_tmdb_index.py:185-188) ---

  test("duplicateIds finds ids occurring more than once") {
    val df = Seq(1L, 2L, 2L, 3L, 4L, 4L, 4L).toDF("id")
    assert(duplicateIds(df).as[Long].collect().sorted.toSeq == Seq(2L, 4L))
  }

  // --- O15 unionKeepFirst ---

  test("unionKeepFirst: primary beats secondary on id collision") {
    val movie = Seq((0L, "m0"), (1L, "m1")).toDF("id", "src")
    val coll = Seq((1L, "c1"), (2L, "c2")).toDF("id", "src")
    val got = unionKeepFirst(movie, coll).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "m0"), (1L, "m1"), (2L, "c2")))
  }

  // --- O16 update_tmdb_export_flag (test_tmdb_index.py:616-649) ---

  test("updateExportFlag appends flag preserving column order") {
    val df = Seq((0L, 1L), (1L, 2L), (9999999L, 3L)).toDF("id", "value")
    val export = Seq(0L, 1L).toDF("id")
    val got = updateExportFlag(alignless(df), export)
    assert(got.columns.toSeq == Seq("id", "value", "in_export"))
    val m = got.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(m(0L) && m(1L) && !m(9999999L))
  }

  private def alignless(df: org.apache.spark.sql.DataFrame) = df

  test("updateExportFlag replaces existing flag in place") {
    val df = Seq((0L, true, 1L), (1L, true, 2L)).toDF("id", "in_export", "value")
    val export = Seq(1L).toDF("id")
    val got = updateExportFlag(df, export)
    assert(got.columns.toSeq == Seq("id", "in_export", "value"))
    val m = got.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!m(0L) && m(1L))
  }

  // --- O20a round-to-nearest-day boundary (tmdb_index.py:493-495) ---

  test("roundToDay rounds 11:59:59.999 down and 12:00:00 up") {
    val df = Seq(
      (0L, Timestamp.valueOf("2024-03-10 11:59:59.999")),
      (1L, Timestamp.valueOf("2024-03-10 12:00:00")),
      (2L, Timestamp.valueOf("2024-03-10 00:00:00")),
      (3L, Timestamp.valueOf("2024-03-10 23:59:59"))).toDF("id", "ts")
    val got = df.select($"id", roundToDay($"ts").as("d")).orderBy("id")
      .collect().map(_.getDate(1).toString).toSeq
    assert(got == Seq("2024-03-10", "2024-03-11", "2024-03-10", "2024-03-11"))
  }

  // --- O20 fetch queue (tmdb_index.py:482-527) ---

  test("fetchQueue: stale + backfill-first-k + refresh-oldest-k, nulls excluded") {
    val rows = Seq(
      // (id, date, retrieved_at)
      (0L, Date.valueOf("2024-01-10"), Some(Timestamp.valueOf("2024-01-09 13:00:00"))), // stale: round→01-10 <= date
      (1L, Date.valueOf("2024-01-01"), Some(Timestamp.valueOf("2024-01-05 00:00:00"))), // fresh
      (2L, Date.valueOf("2024-01-01"), None), // backfill candidate 1
      (3L, Date.valueOf("2024-01-01"), None), // backfill candidate 2 (beyond limit 1)
      // refresh rows: date < round(retrieved_at) so they are NOT stale
      (4L, Date.valueOf("2022-12-31"), Some(Timestamp.valueOf("2023-01-01 00:00:00"))), // oldest → refresh
      (5L, Date.valueOf("2023-05-31"), Some(Timestamp.valueOf("2023-06-01 00:00:00"))) // 2nd oldest (beyond limit 1)
    ).toDF("id", "date", "retrieved_at")
    val got = fetchQueue(rows, backfillLimit = 1, refreshLimit = 1)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 2L, 4L))
  }

  test("fetchQueue without retrieved_at column: first k by id") {
    val df = Seq(3L, 0L, 2L, 1L).toDF("id")
    val got = fetchQueue(df, backfillLimit = 2, refreshLimit = 5)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L))
  }

  test("fetchQueue with retrieved_at but no date col skips stale branch") {
    val df = Seq(
      (0L, Some(Timestamp.valueOf("2023-01-01 00:00:00"))),
      (1L, None: Option[Timestamp]),
      (2L, Some(Timestamp.valueOf("2024-01-01 00:00:00"))))
      .toDF("id", "retrieved_at")
    val got = fetchQueue(df, backfillLimit = 1, refreshLimit = 1)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L)) // backfill id=1, refresh oldest id=0, no stale
  }

  test("fetchQueue with non-positive limits skips those branches") {
    val df = Seq(
      (0L, Date.valueOf("2024-01-10"), Some(Timestamp.valueOf("2024-01-09 13:00:00"))),
      (1L, Date.valueOf("2024-01-01"), None: Option[Timestamp]),
      (2L, Date.valueOf("2022-12-31"), Some(Timestamp.valueOf("2023-01-01 00:00:00"))))
      .toDF("id", "date", "retrieved_at")
    val got = fetchQueue(df, backfillLimit = 0, refreshLimit = -1)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(0L)) // only the stale row
    val none = fetchQueue(df.select("id"), backfillLimit = -5, refreshLimit = 0)
    assert(none.count() == 0)
  }

  // --- O18 clamp ---

  test("clampUInt32 nulls out-of-domain values") {
    val df = Seq(-1L, 0L, 5L, IndexOps.UINT32_MAX, IndexOps.UINT32_MAX + 1)
      .toDF("v")
    val got = df.select(clampUInt32($"v").as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(None, Some(0L), Some(5L), Some(IndexOps.UINT32_MAX), None))
  }

  // --- dedup helpers ---

  test("dedupKeepLast keeps highest ordinal per key") {
    val df = Seq((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "c")).toDF("id", "ord", "v")
    val got = dedupKeepLast(df, "id", col("ord")).orderBy("id")
      .select("v").as[String].collect().toSeq
    assert(got == Seq("b", "c"))
  }
}
