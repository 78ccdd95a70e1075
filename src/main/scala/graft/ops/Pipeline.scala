package graft.ops

import java.time.{LocalDate, LocalTime, ZonedDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline composition — the reference's `process` entry point and its
  * sources/sinks (reference tmdb_index.py:546-568 and neighbors), HTTP-free:
  * network sources are injected as DataFrames / fetcher functions so unit
  * tests drive fixtures exactly like the reference's tests stub its feed.
  */
object Pipeline {
  import IndexOps._

  // --- O7: changes-feed day frame normalization (tmdb_index.py:192-217) ---

  /** Changes feed schema after normalization. */
  val changesSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("date", DateType),
    StructField("adult", BooleanType)))

  /** Normalize one day of the changes feed: stamp the date literal,
    * project (id, date, adult), drop null ids, dedup on id keep-LAST in
    * feed order — the caller supplies the fetch ordinal column that
    * defines feed order (Spark rows are unordered; reference :214 relies
    * on row order).
    */
  def normalizeChangesDay(raw: DataFrame, day: LocalDate, ordinal: Column): DataFrame = {
    val shaped = raw
      .withColumn("date", lit(java.sql.Date.valueOf(day)))
      .withColumn("__ord", ordinal)
      .select(col("id").cast(LongType).as("id"), col("date"), col("adult"), col("__ord"))
      .filter(col("id").isNotNull)
    dedupKeepLast(shaped, "id", col("__ord")).drop("__ord")
  }

  // --- O8: incremental cursor (tmdb_index.py:220-238) ---

  /** Per-type feed epochs (reference TMDB_CHANGES_EPOCH,
    * tmdb_index.py:185-189) — the cursor start when a table has no
    * history yet. */
  val ChangesEpoch: Map[String, LocalDate] = Map(
    "movie" -> LocalDate.of(2012, 10, 5),
    "tv" -> LocalDate.of(2012, 12, 31),
    "person" -> LocalDate.of(2012, 10, 5))

  /** Resume window: from `max(date) − 1 day` (the reference's one-day
    * late-data overlap re-read, :235) or from the type's epoch when the
    * table has no date column yet; inclusive daily range to `today`.
    */
  def changesBackfillDateRange(df: DataFrame, today: LocalDate,
      epoch: LocalDate): Seq[LocalDate] = {
    val start =
      if (!df.columns.contains("date")) epoch
      else {
        val m = df.agg(max(col("date"))).head()
        if (m.isNullAt(0)) epoch
        else m.getDate(0).toLocalDate.minusDays(1)
      }
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(today)).toSeq
  }

  // --- O9: daily micro-batch fold (tmdb_index.py:241-256) ---

  /** Fold each day's (already-normalized) changes frame into the table:
    * update-mode upsert per day, then one dense re-index. The "stream" is
    * a driver-side date cursor — source offsets are dates, state is the
    * table itself (SURVEY.md §2.9).
    */
  def insertLatestChanges(df: DataFrame, days: Seq[DataFrame],
      daysLimit: Int = Int.MaxValue,
      mat: Materializer = Materializer.Local): DataFrame = {
    // updateOrAppend references its left side twice (anti-join +
    // enrichment), so an N-day fold would otherwise build a plan whose
    // recompute cost doubles per day. Truncate lineage after each day —
    // the reference materializes the table daily anyway (its parquet
    // write); `mat` picks the local (fast) or reliable (fault-tolerant)
    // equivalent. Deltas are normalized (unique on id) by construction,
    // so the per-day uniqueness job is skipped.
    val merged = days.take(daysLimit).foldLeft(df) { (acc, day) =>
      mat(updateOrAppend(acc, day, None, assumeUniqueDelta = true))
    }
    if (merged.columns.contains(ID) && !merged.isEmpty) alignIdCol(merged) else merged
  }

  // --- O10/O13: bulk export source (tmdb_index.py:259-270, 298-324) ---

  /** JSONL(.gz) export file → (id, in_export=true). Spark's JSON source
    * decodes .gz transparently and parallelizes over files at scale. */
  def rawExport(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("id LONG").json(path)
      .filter(col("id").isNotNull)
      .select(col("id"), lit(true).as("in_export"))

  // --- O11: publication calendar (tmdb_index.py:273-276) ---

  /** Daily exports publish at 08:00 UTC; before that use yesterday's. */
  def exportDate(now: ZonedDateTime): LocalDate = {
    val utc = now.withZoneSameInstant(ZoneOffset.UTC)
    if (utc.toLocalTime.isBefore(LocalTime.of(8, 0))) utc.toLocalDate.minusDays(1)
    else utc.toLocalDate
  }

  // --- O12: availability probe with previous-day fallback (:282-295) ---

  def availableExport(probe: LocalDate => Boolean, day: LocalDate,
      maxBack: Int = 1): Option[LocalDate] =
    (0 to maxBack).map(day.minusDays(_)).find(probe)

  // --- O15: movie ∪ collection export, movie wins (:331-352) ---

  def combinedExport(movie: DataFrame, collection: DataFrame): DataFrame =
    unionKeepFirst(movie, collection)

  // --- O17: retry policy (pure; the HTTP client wires around it) ---

  /** Backoff for attempt n (0-based): honor Retry-After when given, else
    * exponential 2^n, clamped to [1, 60] seconds; callers re-raise after
    * `MaxAttempts` (reference tmdb_index.py:369-402).
    */
  val MaxAttempts = 5
  def backoffSeconds(attempt: Int, retryAfter: Option[Long] = None): Long =
    math.min(60L, math.max(1L, retryAfter.getOrElse(1L << attempt)))

  // --- O19: external-ids response typing (tmdb_index.py:414-466) ---

  /** Scalar extraction from a raw external-ids response frame with
    * string columns (imdb_id "tt123"/"nm123", wikidata_id "Q42", raw
    * tvdb_id): regex capture-group → long, uint32-clamped; tvdb kept for
    * tv only. `retrieved_at` is stamped by the caller (the fetch time).
    */
  def typeExternalIds(raw: DataFrame, kind: String): DataFrame = {
    def num(c: Column, pattern: String): Column =
      clampUInt32(nullif(regexp_extract(c, pattern, 1), lit("")).cast(LongType))
    val imdbPattern = if (kind == "person") "nm(\\d+)" else "tt(\\d+)"
    val base = raw
      .withColumn("imdb_numeric_id", num(col("imdb_id"), imdbPattern))
      .withColumn("wikidata_numeric_id", num(col("wikidata_id"), "Q(\\d+)"))
    val typed =
      if (kind == "tv") base.withColumn("tvdb_id", clampUInt32(col("tvdb_id").cast(LongType)))
      else base.drop("tvdb_id")
    typed.drop("imdb_id", "wikidata_id")
  }

  // --- O20 + O2: enrichment pass (tmdb_index.py:482-543) ---

  /** Build the fetch queue, run the injected fetcher over it, upsert the
    * typed result, re-index. `fetcher` stands in for the per-id HTTP
    * loop (at scale: mapPartitions with per-partition rate limiting).
    */
  def insertExternalIds(df: DataFrame, fetcher: DataFrame => DataFrame,
      backfillLimit: Int, refreshLimit: Int): DataFrame = {
    val queue = fetchQueue(df, backfillLimit, refreshLimit)
    val fetched = fetcher(queue)
    if (fetched.isEmpty) df
    else alignIdCol(updateOrAppend(df, fetched))
  }

  /** Fixture-backed enrichment fetcher: answers the queue from a local
    * external-ids JSONL file instead of the per-id HTTP loop (reference
    * tmdb_index.py:529-543) — same row contract as the live fetcher.
    * Queue ids present in the fixture get their typed numeric ids with
    * `success = true`; queue ids absent from it get a null row with
    * `success = false` (the reference's 404 → fetched-and-absent record).
    * All rows are stamped `retrieved_at = fetchedAt`.
    *
    * Scale: the fixture (like a day's fetch results) is delta-sized; the
    * queue-to-fixture join broadcasts, and the upsert downstream never
    * shuffles the big table.
    */
  def fixtureExternalIdsFetcher(spark: SparkSession, path: String, kind: String,
      fetchedAt: java.sql.Timestamp): DataFrame => DataFrame = { queue =>
    val raw = spark.read
      .schema("id LONG, imdb_id STRING, wikidata_id STRING, tvdb_id LONG")
      .json(path)
      .filter(col("id").isNotNull)
      .withColumn("success", lit(true))
    // one result row per queued id, like the live loop; a fixture with
    // duplicate ids is a broken input — updateOrAppend's uniqueness
    // enforcement downstream rejects the fan-out explicitly
    val typed = typeExternalIds(raw, kind)
    queue.join(typed, Seq(ID), "left")
      .withColumn("success", coalesce(col("success"), lit(false)))
      .withColumn("retrieved_at", lit(fetchedAt))
  }

  /** Live enrichment fetcher: the per-id JSON GET loop over the queue
    * (reference tmdb_index.py:529-543) run INSIDE the plan — a
    * `mapPartitions` over the queue ids with one transport instance per
    * partition, so the queue is never collected to the driver and a
    * queue of any size distributes across executors. `transport` is a
    * serializable FACTORY invoked once per partition (an HTTP client is
    * not serializable; each partition builds its own): pass
    * `() => new HttpJsonFetcher().fetch` in production, a stub lambda in
    * tests (the reference tests stub `urlopen` the same way).
    *
    * `maxRpsPerPartition` paces each partition's loop (min-interval
    * sleep between requests); the aggregate request rate is
    * `maxRpsPerPartition × queue partitions`, so size the two together
    * against the API's quota. 0 disables pacing. The reference's
    * sequential loop is the one-partition special case
    * (`queue.coalesce(1)`), giving the same global ordering and rate.
    *
    * The transport returns Some(body) on 2xx, None on 404 (recorded as
    * a failed row — fetched-and-absent); transport errors propagate
    * after the retry policy gives up, failing the task (Spark's task
    * retry then re-runs only that partition's ids — fetches are
    * idempotent GETs).
    *
    * The typed result is EAGERLY materialized through `mat` before it is
    * returned: the enrichment upsert references the fetched frame twice
    * (anti-join + union) and the CLI follows with count/write/summary
    * actions — left lazy, every one of those would re-run the whole HTTP
    * loop (multiplying load on the remote API and letting transient
    * answers diverge between passes). Exactly-once is spec-pinned. Pass
    * `Materializer.Reliable`/`Parquet` on a multi-node cluster where
    * executor loss must not fail the run ([[Materializer]] trade table);
    * `Inline` only if the caller materializes the result itself.
    */
  def liveExternalIdsFetcher(spark: SparkSession, kind: String,
      urlFor: Long => String, transport: () => String => Option[String],
      fetchedAt: java.sql.Timestamp,
      maxRpsPerPartition: Double = 0.0,
      mat: Materializer = Materializer.Local): DataFrame => DataFrame = { queue =>
    import spark.implicits._
    val minIntervalNanos =
      if (maxRpsPerPartition > 0) (1e9 / maxRpsPerPartition).toLong else 0L
    val bodies = queue.select(col(ID)).as[Long].mapPartitions { ids =>
      val fetch = transport() // one client per partition
      var nextAllowed = System.nanoTime()
      ids.map { id =>
        if (minIntervalNanos > 0) {
          val wait = nextAllowed - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          nextAllowed = math.max(System.nanoTime(), nextAllowed) + minIntervalNanos
        }
        (id, fetch(urlFor(id)))
      }
    }.toDF(ID, "body")
    val raw = bodies
      .withColumn("success", col("body").isNotNull)
      .withColumn("parsed", from_json(col("body"),
        StructType(Seq(
          StructField("imdb_id", StringType),
          StructField("wikidata_id", StringType),
          StructField("tvdb_id", LongType)))))
      .select(col(ID), col("success"),
        col("parsed.imdb_id").as("imdb_id"),
        col("parsed.wikidata_id").as("wikidata_id"),
        col("parsed.tvdb_id").as("tvdb_id"))
    mat(typeExternalIds(raw, kind).withColumn("retrieved_at", lit(fetchedAt)))
  }

  // --- O21: process (tmdb_index.py:546-568) ---

  def process(df: DataFrame, changeDays: Seq[DataFrame], exportIds: DataFrame,
      fetcher: DataFrame => DataFrame, backfillLimit: Int = 10000,
      refreshLimit: Int = 1000, daysLimit: Int = 30,
      mat: Materializer = Materializer.Local): DataFrame = {
    val afterChanges = insertLatestChanges(df, changeDays, daysLimit, mat)
    // the flagged table feeds the queue's predicate branches AND both
    // sides of the enrichment upsert — truncate lineage once here
    val afterExport = mat(updateExportFlag(afterChanges, exportIds))
    insertExternalIds(afterExport, fetcher, backfillLimit, refreshLimit)
  }

  // --- O22: markdown report sink (tmdb_index.py:571-600) ---

  private def pct(v: Long, n: Long): String =
    if (n == 0) s"$v" else f"$v (${100.0 * v / n}%.1f%%)"

  /** Render the run report: id validation, per-column profile, diff
    * line, and table shape — golden-tested byte-for-byte (our own
    * golden; the reference's is Polars' ASCII_MARKDOWN).
    */
  def formatSummary(dfOld: DataFrame, dfNew: DataFrame): String =
    formatSummary(dfOld, dfNew, rssBytes = None)

  /** As above with the reference's `rss` size line (tmdb_index.py:598);
    * pass e.g. [[estimatedSizeBytes]]. Optional so the golden test pins
    * a size-independent report. */
  def formatSummary(dfOld: DataFrame, dfNew: DataFrame,
      rssBytes: Option[Long]): String = {
    validateId(dfOld)
    validateId(dfNew)
    val n = dfNew.count()
    val stats = computeStats(dfOld, dfNew).collect()
    val diff = changeSummary(dfOld, dfNew).head()
    val header = "| column | dtype | null | true | false | unique | updated |"
    val sep = "| --- | --- | --- | --- | --- | --- | --- |"
    val rows = stats.map { r =>
      val isBool = r.getString(1) == "boolean"
      val t = if (isBool) pct(r.getLong(3), n) else ""
      val f = if (isBool) pct(r.getLong(4), n) else ""
      s"| ${r.getString(0)} | ${r.getString(1)} | ${pct(r.getLong(2), n)} | $t | $f | " +
        s"${if (r.getBoolean(5)) "yes" else "no"} | ${pct(r.getLong(6), n)} |"
    }
    val shape = s"shape: (${n}, ${dfNew.columns.length})"
    val changes = s"changes: +${diff.getLong(0)} -${diff.getLong(1)} ~${diff.getLong(2)}"
    val rss = rssBytes.map(b => s"rss: ${b / (1024 * 1024)}MB").toSeq
    (Seq(header, sep) ++ rows ++ Seq("", shape, changes) ++ rss).mkString("\n")
  }

  /** Catalyst's estimate of the table's in-memory size — the analog of
    * the reference's Arrow `estimated_size` (tmdb_index.py:598). */
  def estimatedSizeBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong

  // --- O22 byte-parity renderer (reference tmdb_index.py:571-600) ---

  private def commas(v: Long): String =
    String.format(java.util.Locale.US, "%,d", java.lang.Long.valueOf(v))

  /** Polars' `_string_repr()` for the Spark type, so the dtype column
    * renders like the reference's. Spark has no unsigned ints, so the
    * reference's `u32` id appears as `i32`/`i64` — the one declared
    * rendering difference. */
  private def polarsDtype(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "i8"
    case ShortType => "i16"
    case IntegerType => "i32"
    case LongType => "i64"
    case FloatType => "f32"
    case DoubleType => "f64"
    case StringType => "str"
    case DateType => "date"
    case _: TimestampType => "datetime[μs]"
    case other => other.simpleString
  }

  /** Render the run report byte-compatible with the reference's Polars
    * ASCII_MARKDOWN output (tmdb_index.py:571-600; golden
    * test_tmdb_index.py:797-827): `## filename`, the stats table with
    * inline `(str)` dtypes and width-padded cells (zero counts render as
    * empty cells), then shape / changes / rss lines with thousands
    * separators. [[formatSummary]] remains the compact variant.
    */
  def formatSummaryAscii(dfOld: DataFrame, dfNew: DataFrame,
      filename: String, rssBytes: Long,
      dtypeOverride: Map[String, String] = Map.empty): String = {
    validateId(dfOld)
    validateId(dfNew)
    val n = dfNew.count()
    val stats = computeStats(dfOld, dfNew).collect()
    val diff = changeSummary(dfOld, dfNew).head()
    val types = dfNew.schema.map(f => f.name -> f.dataType).toMap

    def fmt(v: Long): String =
      if (v == 0 || n == 0) ""
      else s"${commas(v)} (${String.format(java.util.Locale.US, "%.1f", Double.box(100.0 * v / n))}%)"

    val headers = Seq("name", "dtype", "null", "true", "false", "unique", "updated")
      .map(h => s"$h (str)")
    val cells = stats.map { r =>
      val isBool = types(r.getString(0)) == BooleanType
      Seq(r.getString(0),
        // declared-dtype override: Spark has no unsigned ints, so a
        // deployment that KNOWS a column is uint32-clamped (clampUInt32)
        // can annotate it `u32` and reproduce the reference's report
        // byte-for-byte — the physical Spark type stays i64
        dtypeOverride.getOrElse(r.getString(0), polarsDtype(types(r.getString(0)))),
        fmt(r.getLong(2)),
        if (isBool) fmt(r.getLong(3)) else "",
        if (isBool) fmt(r.getLong(4)) else "",
        if (r.getBoolean(5)) "true" else "",
        fmt(r.getLong(6)))
    }
    val widths = headers.indices.map(i => (headers(i) +: cells.map(_(i)).toSeq).map(_.length).max)
    def row(cs: Seq[String]) =
      cs.zip(widths).map { case (c, w) => " " + c.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    val sep = widths.map(w => "-" * (w + 2)).mkString("|", "|", "|")
    val table = (row(headers) +: sep +: cells.map(row).toSeq).mkString("\n")

    val mb = String.format(java.util.Locale.US, "%,.1f",
      Double.box(rssBytes / (1024.0 * 1024.0)))
    Seq(s"## $filename", "", table, "",
      s"shape: (${commas(n)}, ${commas(dfNew.columns.length.toLong)})",
      s"changes: +${commas(diff.getLong(0))} -${commas(diff.getLong(1))} ~${commas(diff.getLong(2))}",
      s"rss: ${mb}MB").mkString("\n")
  }

  // --- O23: CLI shell (tmdb_index.py:603-716) ---

  /** Read the persisted index or bootstrap the empty table (`id` only —
    * reference :672). Before bootstrapping, recover from a publish that
    * crashed between [[publishStaged]]'s two renames: a complete staging
    * dir (it is fully written, `_SUCCESS` marker and all, before any
    * rename starts) finishes its swap; otherwise the aside copy rolls
    * back. Bootstrapping empty while either exists would silently lose
    * the standing enrichment state — and then PASS `heightGuard`, which
    * compares against whatever `before` frame this function returns.
    */
  /** Recover an interrupted [[publishStaged]] swap at `path`: a fully
    * staged dir (_SUCCESS present) that never landed renames in; else an
    * orphaned aside copy renames back. Shared by every staged-swap
    * reader (the index and the streaming sketch table) so the recovery
    * protocol cannot drift from the publish protocol. */
  def recoverStaged(path: String): Unit = {
    val f = new java.io.File(path)
    if (!f.exists()) {
      val staging = new java.io.File(path + "__staging")
      val aside = new java.io.File(path + "__old")
      if (staging.exists() && new java.io.File(staging, "_SUCCESS").exists()) {
        if (!staging.renameTo(f)) sys.error(s"failed to recover $staging -> $path")
        org.apache.commons.io.FileUtils.deleteQuietly(aside)
      } else if (aside.exists()) {
        if (!aside.renameTo(f)) sys.error(s"failed to recover $aside -> $path")
      }
    }
  }

  def readOrInit(spark: SparkSession, path: String): DataFrame = {
    recoverStaged(path)
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(ID, LongType))))
  }

  /** Crash-safe swap of a fully-written staging dir into place: the old
    * index is renamed ASIDE first (never deleted before the new one has
    * landed), staging is renamed in, and only then is the aside copy
    * removed. A crash at any point leaves either the index file itself
    * or a recoverable staging/aside dir — [[readOrInit]] completes or
    * rolls back the interrupted swap on the next run.
    */
  def publishStaged(staging: String, file: String): Unit = {
    val dst = new java.io.File(file)
    val aside = new java.io.File(file + "__old")
    // stale aside from an earlier publish that crashed AFTER its swap
    // completed (dst exists): clear it so the rename below can land
    if (aside.exists()) org.apache.commons.io.FileUtils.forceDelete(aside)
    if (dst.exists() && !dst.renameTo(aside))
      sys.error(s"failed to set aside $file")
    if (!new java.io.File(staging).renameTo(dst)) {
      if (aside.exists()) aside.renameTo(dst) // roll back, never leave a gap
      sys.error(s"failed to publish $staging -> $file")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(aside)
  }

  /** Monotonic-growth publish gate (reference :688-694). */
  def heightGuard(before: DataFrame, after: DataFrame): Unit = {
    val (b, a) = (before.count(), after.count())
    require(a >= b, s"index shrank: $b -> $a rows; refusing to publish")
  }

  /** Publish: id-sorted zstd parquet with statistics — sorted so
    * consumers' id predicates prune row groups via min/max stats
    * (SURVEY.md §4). At 100 TB this becomes a partitioned directory
    * (`partitionBy(id div N)`); semantics unchanged.
    */
  def writeIndex(df: DataFrame, path: String): Unit =
    df.orderBy(ID).write.mode("overwrite")
      .option("compression", "zstd").parquet(path)

  /** 100 TB publish variant: directory partitioned on id ranges
    * (`id_bucket = id div idsPerPartition`), each partition internally
    * id-sorted. Consumers' id predicates prune whole directories (plus
    * row groups inside, via min/max stats); use [[readIndexRange]] to
    * get the pruning filter right.
    */
  def writeIndexPartitioned(df: DataFrame, path: String,
      idsPerPartition: Long): Unit =
    df.withColumn("id_bucket", expr(s"$ID div $idsPerPartition"))
      .repartition(col("id_bucket"))
      .sortWithinPartitions(ID)
      .write.mode("overwrite").partitionBy("id_bucket")
      .option("compression", "zstd").parquet(path)

  /** Range read over a partitioned index: the id_bucket predicate makes
    * partition pruning kick in (check PartitionFilters in the plan). */
  def readIndexRange(spark: SparkSession, path: String,
      idsPerPartition: Long, lo: Long, hi: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("id_bucket").between(lo / idsPerPartition, hi / idsPerPartition) &&
        col(ID).between(lo, hi))
      .drop("id_bucket")

  /** CLI parity shell (flags/env mirroring reference :603-653), wired to
    * local fixture sources instead of HTTP (no network here): changes
    * days, exports, and enrichment results are JSONL files under
    * `--source-dir`. Flag surface mirrors the reference's argparse:
    * `--tmdb-type --file --source-dir --backfill-limit --refresh-limit
    * --days-limit --tmdb-api-key --verbose --dry-run`, each with its env
    * fallback; the run report honors `$GITHUB_STEP_SUMMARY` (append, like
    * a GitHub Actions step) and falls back to stdout (reference :701-703).
    */
  def main(args: Array[String]): Unit = runCli(args, sys.env)

  /** CLI body with an injectable environment, so specs can pin the env
    * fallbacks (a JVM can't set real env vars for an in-process run). */
  def runCli(args: Array[String], env: Map[String, String]): Unit = {
    def opt(name: String, envName: String, default: String): String =
      optEnvs(name, Seq(envName), default)
    // flag wins; then the first set env var in order (the reference's
    // TMDB_-prefixed names first, this repo's historical names kept as
    // fallback so existing deployments don't silently change behavior)
    def optEnvs(name: String, envs: Seq[String], default: String): String = {
      val i = args.indexOf(s"--$name")
      if (i >= 0 && i + 1 < args.length) args(i + 1)
      else envs.iterator.flatMap(env.get).nextOption().getOrElse(default)
    }
    val kind = opt("tmdb-type", "TMDB_TYPE", "movie")
    val file = opt("file", "GRAFT_INDEX_FILE", s"/tmp/graft_$kind.parquet")
    val sourceDir = opt("source-dir", "GRAFT_SOURCE_DIR", "")
    val dryRun = args.contains("--dry-run")
    val verbose = args.contains("--verbose") ||
      env.get("VERBOSE").exists(_.nonEmpty)
    // accepted for parity; only consulted by the live-HTTP deployment
    // path (reference :613-617 requires it for its fetch loop — the
    // fixture fetcher here replaces that loop, see HttpJsonFetcher)
    val apiKey = opt("tmdb-api-key", "TMDB_API_KEY", "")
    // env names mirror the reference CLI's `envvar=` declarations
    // (reference tmdb_index.py:636,645,652)
    val backfill =
      optEnvs("backfill-limit", Seq("TMDB_BACKFILL_LIMIT", "BACKFILL_LIMIT"), "10000").toInt
    val refresh =
      optEnvs("refresh-limit", Seq("TMDB_REFRESH_LIMIT", "REFRESH_LIMIT"), "1000").toInt
    val daysLimit =
      optEnvs("days-limit", Seq("TMDB_DAYS_LIMIT", "DAYS_LIMIT"), "30").toInt

    // reuse an already-running session (tests drive main in-JVM); only
    // stop what this invocation created
    val active = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = active.getOrElse(SparkSession.builder().master(
        env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel(if (verbose) "INFO" else "WARN")
    if (verbose)
      println(s"graft: type=$kind file=$file sourceDir=$sourceDir " +
        s"backfill=$backfill refresh=$refresh daysLimit=$daysLimit " +
        s"apiKey=${if (apiKey.nonEmpty) "set" else "unset"} dryRun=$dryRun")

    // non-tv types never carry tvdb_id; drop a stray column left by a
    // type switch on the same file (reference tmdb_index.py:675-677)
    val read = readOrInit(spark, file)
    val before = if (kind != "tv") read.drop("tvdb_id") else read
    val changeDays =
      if (sourceDir.isEmpty) Seq.empty[DataFrame]
      else new java.io.File(s"$sourceDir/changes").listFiles().toSeq
        .sortBy(_.getName).map { f =>
          val day = LocalDate.parse(f.getName.stripSuffix(".jsonl").stripSuffix(".json"))
          normalizeChangesDay(
            spark.read.schema("id LONG, adult BOOLEAN, __ord LONG").json(f.getPath),
            day, col("__ord"))
        }
    // O15 parity: the movie path unions the movie and collection exports
    // keep-first (reference tmdb_index.py:331-352) — here as a second
    // fixture file alongside export.jsonl
    val collectionPath = s"$sourceDir/collection_export.jsonl"
    val exportIds =
      if (sourceDir.isEmpty || !new java.io.File(s"$sourceDir/export.jsonl").exists())
        before.sparkSession.emptyDataFrame.withColumn("id", lit(null).cast(LongType))
          .filter(lit(false)).select("id")
      else {
        val primary = rawExport(spark, s"$sourceDir/export.jsonl")
        val combined =
          if (kind == "movie" && new java.io.File(collectionPath).exists())
            combinedExport(primary, rawExport(spark, collectionPath))
          else primary
        combined.select("id")
      }
    // O20: enrichment priority mirrors the reference's deploy modes —
    // a local external-ids fixture when present (the zero-egress
    // stand-in), else the live per-id HTTP loop when an API key is
    // supplied (reference :613-617, :529-543), else a computed-but-idle
    // queue
    val externalIdsPath = s"$sourceDir/external_ids.jsonl"
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val fetcher: DataFrame => DataFrame =
      if (sourceDir.nonEmpty && new java.io.File(externalIdsPath).exists())
        fixtureExternalIdsFetcher(spark, externalIdsPath, kind, now)
      else if (apiKey.nonEmpty)
        liveExternalIdsFetcher(spark, kind,
          id => s"https://api.themoviedb.org/3/$kind/$id/external_ids?api_key=$apiKey",
          () => new HttpJsonFetcher().fetch, now,
          maxRpsPerPartition = 10.0)
      else queue => queue.limit(0)
    val after = process(before, changeDays, exportIds, fetcher,
      backfill, refresh, daysLimit)

    heightGuard(before, after)
    // reference-parity report (tmdb_index.py:698-703): ASCII_MARKDOWN
    // Publish via stage-then-swap (same discipline as StreamOps.indexSink):
    // the new index is written to a staging dir FIRST, so the summary's
    // `before` frame still reads the intact old file, and the swap is the
    // last step — the persisted index is never half-written. The rss line
    // is the staged artifact's on-disk size (the reference reports the
    // frame's in-memory Arrow size; Catalyst's sizeInBytes stat is a
    // planning estimate that wildly overshoots after joins, so disk size
    // is the honest analog); dry runs keep the estimate.
    val staging = file + "__staging"
    if (!dryRun) writeIndex(after, staging)
    val rssBytes =
      if (!dryRun) org.apache.commons.io.FileUtils.sizeOf(new java.io.File(staging))
      else estimatedSizeBytes(after)
    val summary = formatSummaryAscii(if (before.isEmpty) after else before,
      after, new java.io.File(file).getName, rssBytes)
    env.get("GITHUB_STEP_SUMMARY").filter(_.nonEmpty) match {
      case Some(p) =>
        val w = new java.io.FileWriter(p, true)
        try w.write(summary + "\n") finally w.close()
      case None => println(summary)
    }
    if (!dryRun) publishStaged(staging, file)
    if (active.isEmpty) spark.stop()
  }
}
