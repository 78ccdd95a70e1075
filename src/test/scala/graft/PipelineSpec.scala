package graft

import java.sql.{Date, Timestamp}
import java.time.{LocalDate, ZonedDateTime, ZoneOffset}

import org.apache.spark.sql.functions._

import graft.ops.{IndexOps, Pipeline}

/** Pipeline composition specs: cursor, sources, process e2e, golden
  * report (reference test_tmdb_index.py:438-613, 797-827 shapes).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("changesBackfillDateRange resumes one day before max(date)") {
    val df = Seq((0L, Date.valueOf("2024-03-10")), (1L, Date.valueOf("2024-03-12")))
      .toDF("id", "date")
    val got = Pipeline.changesBackfillDateRange(df,
      today = LocalDate.parse("2024-03-14"), epoch = LocalDate.parse("2024-01-01"))
    assert(got == (11 to 14).map(d => LocalDate.parse(f"2024-03-$d%02d")))
  }

  test("per-type epochs match the reference and apply to empty date cols") {
    // reference TMDB_CHANGES_EPOCH + test_tmdb_index.py:342-369
    assert(Pipeline.ChangesEpoch("movie").toString == "2012-10-05")
    assert(Pipeline.ChangesEpoch("tv").toString == "2012-12-31")
    assert(Pipeline.ChangesEpoch("person").toString == "2012-10-05")
    // date column present but EMPTY -> epoch start (max(date) is null)
    val empty = Seq((0L, Date.valueOf("2024-01-01"))).toDF("id", "date")
      .filter(col("id") < 0)
    val got = Pipeline.changesBackfillDateRange(empty,
      today = LocalDate.parse("2012-10-07"), epoch = Pipeline.ChangesEpoch("movie"))
    assert(got.map(_.toString) == Seq("2012-10-05", "2012-10-06", "2012-10-07"))
  }

  test("changesBackfillDateRange falls back to the epoch without a date col") {
    val df = Seq(Tuple1(0L)).toDF("id")
    val got = Pipeline.changesBackfillDateRange(df,
      today = LocalDate.parse("2024-01-03"), epoch = LocalDate.parse("2024-01-01"))
    assert(got.map(_.toString) == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
  }

  test("normalizeChangesDay stamps date, drops null ids, dedups keep-last") {
    val raw = Seq(
      (Some(1L), false, 0L), (Some(2L), false, 1L), (Some(1L), true, 2L), (None, true, 3L))
      .toDF("id", "adult", "ord")
    val got = Pipeline.normalizeChangesDay(raw, LocalDate.parse("2024-02-01"), col("ord"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getDate(1).toString, r.getBoolean(2))).toSeq ==
      Seq((1L, "2024-02-01", true), (2L, "2024-02-01", false)))
  }

  test("exportDate uses yesterday before 08:00 UTC") {
    val early = ZonedDateTime.of(2024, 3, 5, 7, 59, 0, 0, ZoneOffset.UTC)
    val late = ZonedDateTime.of(2024, 3, 5, 8, 0, 0, 0, ZoneOffset.UTC)
    assert(Pipeline.exportDate(early) == LocalDate.parse("2024-03-04"))
    assert(Pipeline.exportDate(late) == LocalDate.parse("2024-03-05"))
  }

  test("availableExport probes with previous-day fallback") {
    val d = LocalDate.parse("2024-03-05")
    assert(Pipeline.availableExport(_ == d.minusDays(1), d).contains(d.minusDays(1)))
    assert(Pipeline.availableExport(_ => false, d).isEmpty)
  }

  test("backoffSeconds honors Retry-After and clamps to [1, 60]") {
    assert(Pipeline.backoffSeconds(0) == 1L)
    assert(Pipeline.backoffSeconds(3) == 8L)
    assert(Pipeline.backoffSeconds(10) == 60L)
    assert(Pipeline.backoffSeconds(0, retryAfter = Some(42L)) == 42L)
    assert(Pipeline.backoffSeconds(0, retryAfter = Some(600L)) == 60L)
  }

  test("typeExternalIds extracts numeric ids, tvdb for tv only") {
    val raw = Seq(
      (0L, true, "tt0133093", "Q83495", Some(72521L)),
      (1L, true, "ttbad", "x", None),
      (2L, true, "tt99999999999", "Q1", Some(5000000000L))) // imdb overflows uint32
      .toDF("id", "success", "imdb_id", "wikidata_id", "tvdb_id")
    val tv = Pipeline.typeExternalIds(raw, "tv").orderBy("id").collect()
    assert(tv(0).getAs[Long]("imdb_numeric_id") == 133093L)
    assert(tv(0).getAs[Long]("wikidata_numeric_id") == 83495L)
    assert(tv(0).getAs[Long]("tvdb_id") == 72521L)
    assert(tv(1).isNullAt(tv(1).fieldIndex("imdb_numeric_id")))
    assert(tv(2).isNullAt(tv(2).fieldIndex("imdb_numeric_id"))) // clamped
    assert(tv(2).isNullAt(tv(2).fieldIndex("tvdb_id"))) // clamped
    val movie = Pipeline.typeExternalIds(raw, "movie")
    assert(!movie.columns.contains("tvdb_id"))
    val person = Pipeline.typeExternalIds(
      raw.withColumn("imdb_id", lit("nm0000206")), "person").orderBy("id").head()
    assert(person.getAs[Long]("imdb_numeric_id") == 206L)
  }

  test("liveExternalIdsFetcher drives the per-id loop through an injected transport") {
    LiveFetchProbe.reset()
    // transport factory runs INSIDE each task; the probe is a JVM-static
    // object because the closure is serialized per task (a driver-side
    // buffer would silently record nothing, even in local mode)
    val transport: () => String => Option[String] = () => {
      LiveFetchProbe.clients.incrementAndGet()
      url => {
        LiveFetchProbe.urls.add(url)
        if (url.contains("/tv/0/")) // id 1 is a 404 -> fetched-and-absent
          Some("""{"imdb_id": "tt100", "wikidata_id": "Q7", "tvdb_id": 5}""")
        else None
      }
    }
    // two explicit input partitions: mapPartitions consumes them as-is.
    // Inline materialization exposes the raw plan: the loop is part of
    // it — the queue is never collected to the driver (round-3 shape)
    val queue = spark.sparkContext.parallelize(Seq(0L, 1L), 2).toDF("id")
    val inlinePlan = Pipeline.liveExternalIdsFetcher(spark, "tv",
      id => s"https://host/3/tv/$id/external_ids", transport,
      Timestamp.valueOf("2024-01-02 12:00:00"),
      mat = graft.ops.Materializer.Inline)(queue)
      .queryExecution.executedPlan.toString
    assert(inlinePlan.contains("MapPartitions"))

    // default materialization: the fetch runs EXACTLY ONCE, eagerly —
    // the upsert references the fetched frame twice and the CLI follows
    // with more actions; a lazy frame would re-run the HTTP loop per pass
    LiveFetchProbe.reset()
    val df = Pipeline.liveExternalIdsFetcher(spark, "tv",
      id => s"https://host/3/tv/$id/external_ids", transport,
      Timestamp.valueOf("2024-01-02 12:00:00"))(queue)
    assert(LiveFetchProbe.clients.get() == 2) // eager: fetched at build, one client per partition
    val got = df.orderBy("id").collect()
    df.count() // a second action must NOT re-fetch
    assert(LiveFetchProbe.clients.get() == 2, "fetch must run exactly once")
    assert(LiveFetchProbe.urls.toArray.toSet == Set(
      "https://host/3/tv/0/external_ids", "https://host/3/tv/1/external_ids"))
    assert(got(0).getAs[Boolean]("success"))
    assert(got(0).getAs[Long]("imdb_numeric_id") == 100L)
    assert(got(0).getAs[Long]("wikidata_numeric_id") == 7L)
    assert(got(0).getAs[Long]("tvdb_id") == 5L)
    assert(!got(1).getAs[Boolean]("success"))
    assert(got(1).isNullAt(got(1).fieldIndex("imdb_numeric_id")))
    got.foreach(r => assert(!r.isNullAt(r.fieldIndex("retrieved_at"))))
  }

  test("liveExternalIdsFetcher paces each partition to maxRpsPerPartition") {
    val transport: () => String => Option[String] = () => _ => None
    val queue = spark.sparkContext.parallelize(Seq(0L, 1L, 2L), 1).toDF("id")
    val t0 = System.nanoTime()
    Pipeline.liveExternalIdsFetcher(spark, "movie", id => s"u/$id", transport,
      Timestamp.valueOf("2024-01-02 12:00:00"), maxRpsPerPartition = 5.0)(queue)
      .collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 3 requests at 5 rps = two enforced 200 ms gaps
    assert(elapsedMs >= 400.0, s"expected >= 400 ms of pacing, got $elapsedMs ms")
  }

  test("process folds changes, refreshes export flag, enriches the queue") {
    val base = Seq((0L, Date.valueOf("2024-01-01"), false)).toDF("id", "date", "adult")
    val day1 = Seq((1L, Date.valueOf("2024-01-02"), false),
      (3L, Date.valueOf("2024-01-02"), true)).toDF("id", "date", "adult")
    val exportIds = Seq(0L, 1L, 2L).toDF("id")
    val fetcher: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      queue => queue.select(col("id"), lit(true).as("success"),
        lit(Timestamp.valueOf("2024-01-02 12:00:00")).as("retrieved_at"))
    val got = Pipeline.process(base, Seq(day1), exportIds, fetcher,
      backfillLimit = 2, refreshLimit = 2)
    // exact column ORDER: left fields first, then novel enrichment fields
    // in delta order (reference test_tmdb_index.py:554-580 asserts the
    // analogous list)
    assert(got.columns.toSeq ==
      Seq("id", "date", "adult", "in_export", "success", "retrieved_at"))
    val rows = got.orderBy("id").collect()
    // ids densified 0..3 (2 materialized as the null gap row)
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // gap row id=2 materializes in the align BEFORE the flag refresh, and
    // 2 is in the export list -> true; id=3 absent from the export -> false
    assert(rows.map(_.getAs[Boolean]("in_export")).toSeq ==
      Seq(true, true, true, false))
    // backfill limit 2 fetched the first two never-fetched ids (0, 1)
    assert(!rows(0).isNullAt(rows(0).fieldIndex("retrieved_at")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("retrieved_at")))
    assert(rows(3).isNullAt(rows(3).fieldIndex("retrieved_at")))
    IndexOps.validateId(got)
  }

  test("heightGuard refuses a shrinking index") {
    val a = Seq(0L, 1L).toDF("id")
    val b = Seq(0L).toDF("id")
    Pipeline.heightGuard(a, a)
    intercept[IllegalArgumentException] { Pipeline.heightGuard(a, b) }
  }

  test("readOrInit bootstraps the single-column schema") {
    val df = Pipeline.readOrInit(spark, "/tmp/definitely_missing_graft_idx")
    assert(df.columns.toSeq == Seq("id"))
    assert(df.isEmpty)
  }

  test("writeIndex publishes id-sorted zstd parquet readable by consumers") {
    val df = Seq((1L, "b"), (0L, "a")).toDF("id", "v")
    val path = "/tmp/graft_pipelinespec_idx"
    Pipeline.writeIndex(df, path)
    val back = spark.read.parquet(path)
    assert(back.filter(col("id") === 1L).head().getString(1) == "b")
    assert(back.count() == 2)
  }

  test("formatSummary rss line and size estimate") {
    val df = Seq((0L, true), (1L, false)).toDF("id", "adult")
    val report = Pipeline.formatSummary(df, df, Some(5L * 1024 * 1024))
    assert(report.endsWith("rss: 5MB"))
    assert(Pipeline.estimatedSizeBytes(df) > 0L)
  }

  test("formatSummaryAscii matches the reference's ASCII_MARKDOWN golden") {
    // mirror of test_tmdb_index.py:797-827, byte-for-byte except the id
    // dtype: the reference's UInt32 renders u32; Spark has no unsigned,
    // so an IntegerType id renders i32 (declared rendering difference)
    val old = Seq((0, false), (1, false)).toDF("id", "adult")
    val neu = Seq((0, false), (1, true), (2, false)).toDF("id", "adult")
    val got = Pipeline.formatSummaryAscii(old, neu, "tmdb-movie.parquet", 0L)
    val expected =
      """|## tmdb-movie.parquet
         |
         || name (str) | dtype (str) | null (str) | true (str) | false (str) | unique (str) | updated (str) |
         ||------------|-------------|------------|------------|-------------|--------------|---------------|
         || id         | i32         |            |            |             | true         |               |
         || adult      | bool        |            | 1 (33.3%)  | 2 (66.7%)   |              | 1 (33.3%)     |
         |
         |shape: (3, 2)
         |changes: +1 -0 ~1
         |rss: 0.0MB""".stripMargin
    assert(got == expected)

    // with the declared-dtype override the output reproduces the
    // reference's own golden literally — INCLUDING the u32 cell Spark
    // has no physical type for (ids are uint32-clamped by clampUInt32,
    // so the annotation is truthful)
    val gotU32 = Pipeline.formatSummaryAscii(old, neu, "tmdb-movie.parquet", 0L,
      dtypeOverride = Map("id" -> "u32"))
    val referenceGolden =
      """|## tmdb-movie.parquet
         |
         || name (str) | dtype (str) | null (str) | true (str) | false (str) | unique (str) | updated (str) |
         ||------------|-------------|------------|------------|-------------|--------------|---------------|
         || id         | u32         |            |            |             | true         |               |
         || adult      | bool        |            | 1 (33.3%)  | 2 (66.7%)   |              | 1 (33.3%)     |
         |
         |shape: (3, 2)
         |changes: +1 -0 ~1
         |rss: 0.0MB""".stripMargin
    assert(gotU32 == referenceGolden)
  }

  test("formatSummaryAscii thousands separators on large counts") {
    val big = spark.range(0, 2500).toDF("id")
    val report = Pipeline.formatSummaryAscii(big, big, "x.parquet", 3 * 1024 * 1024 + 200 * 1024)
    assert(report.contains("shape: (2,500, 1)"))
    assert(report.contains("rss: 3.2MB"))
    assert(report.contains("changes: +0 -0 ~0"))
  }

  test("formatSummary golden report") {
    val old = Seq((0L, Some(false)), (1L, Some(true))).toDF("id", "adult")
    val neu = Seq((0L, Some(false)), (1L, Some(false)), (2L, None)).toDF("id", "adult")
    val got = Pipeline.formatSummary(old, neu)
    val expected =
      """|| column | dtype | null | true | false | unique | updated |
        || --- | --- | --- | --- | --- | --- | --- |
        || id | bigint | 0 (0.0%) |  |  | yes | 0 (0.0%) |
        || adult | boolean | 1 (33.3%) | 0 (0.0%) | 2 (66.7%) | no | 1 (33.3%) |
        |
        |shape: (3, 2)
        |changes: +1 -0 ~1""".stripMargin
    assert(got == expected)
  }
}

/** JVM-static probe for the serialized-into-task transport closures. */
object LiveFetchProbe {
  val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val clients = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { urls.clear(); clients.set(0) }
}
