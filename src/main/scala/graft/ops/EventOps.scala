package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table.
  *
  * The fixture has shipped `ts` under two physical encodings: INT64
  * TIMESTAMP(NANOS) — which Spark's parquet reader rejects outright
  * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong`
  * surfaces it as a raw nanosecond long — and native `timestamp[us]`
  * (TIMESTAMP_NTZ to Spark). `loadEvents` adapts to whichever encoding
  * the file carries and normalizes to exact integer microseconds
  * (`ts_us`) end-to-end: timestamp arithmetic on exact integers is
  * deterministic and matches engines (like the DuckDB oracle, whose
  * `epoch_us(ts)` this reproduces byte-for-byte under the UTC session)
  * regardless of the on-disk representation.
  */
object EventOps {
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock taken AS UTC via an NTZ-only diff — casting
        // NTZ->TIMESTAMP instead would reinterpret the wall-clock in the
        // SESSION timezone and silently shift ts_us in non-UTC sessions
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    df.withColumn("ts_us", tsUs)
  }

  /** Tumbling-window aggregate: events per (hour-of-epoch, event_type)
    * with exact cent sums. One hash-aggregate shuffle; at scale this is
    * the canonical partial-agg-friendly shape (map-side combine on the
    * low-cardinality window×type key). `n_users` is an exact
    * countDistinct (a second expand/aggregate pass over the window's
    * rows) — at 100 TB substitute `approx_count_distinct` when a ±2%
    * HLL answer is acceptable, as SURVEY §2.1 does for n_unique.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("hour_us", expr("ts_us div 3600000000") * 3600000000L)
      .groupBy(col("hour_us"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))

  /** Session assignment: a new session starts when the gap since the
    * user's previous event exceeds `gapMinutes`. Window over (user_id
    * order by ts_us, event_id) — partitioned shuffle by user, no global
    * sort; the per-user cumulative sum is the standard sessionization
    * idiom and scales with the number of users.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(w))
  }

  /** Per-user inter-event gap statistics — the cadence signal behind
    * session-gap and churn thresholds: for each user, the count / exact
    * µs sum / max of consecutive-event gaps, ordered by (ts_us,
    * event_id) for a total order under timestamp ties. One lag window
    * PARTITIONED by user (the sessionize exchange exactly) and one
    * per-user aggregate — all exact integers, no date arithmetic.
    * Single-event users have no gaps and drop out.
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("user_id"), (col("ts_us") - col("__prev")).as("__gap"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap")).as("sum_gap_us"),
        max(col("__gap")).as("max_gap_us"))
  }

  /** Bucketed INTERVAL join — the open-source-Spark shape for
    * `left.ts BETWEEN right.start AND right.end`: the raw inequality
    * join has no equi-key, so Catalyst plans a nested loop
    * (BroadcastNestedLoopJoin or cartesian) — the plan shape this
    * library bans. Discretizing time into `bucketUs` buckets
    * MANUFACTURES the equi-key: each right interval explodes into the
    * buckets it covers, each left row keys by its single bucket, and
    * the join becomes a plain hash equi-join on (keyCols…, bucket)
    * plus the exact residual `BETWEEN` filter. Emits one row per
    * (left row, overlapping interval) — exactly the inequality join's
    * semantics (inclusive bounds).
    *
    * Cost: Σ(span/bucketUs + 1) explode rows on the interval side —
    * pick `bucketUs` near the median interval length so each interval
    * explodes into O(1) buckets; the join is hash-partitioned, skew
    * bounded by rows per (key, bucket). Column names must be disjoint
    * across the two inputs (standard join hygiene).
    *
    * Degenerate intervals fail LOUDLY (the [[ProfileOps.equiWidthHistogram]]
    * guard discipline): an interval spanning more than
    * `maxBucketsPerInterval` buckets — a sentinel open end
    * (`Long.MaxValue`) or a mis-sized `bucketUs` — would silently
    * explode 10⁵⁺ rows for one bad row (and past ~10⁸ dies in Spark's
    * opaque "too long sequence" error); instead the job raises with the
    * offending span and the dial to fix. Empty intervals (end < start)
    * match nothing under BETWEEN and are dropped before the explode —
    * Spark's `sequence(hi, lo)` would otherwise count DOWN and emit
    * phantom buckets.
    */
  def intervalJoin(left: DataFrame, tsCol: String, right: DataFrame,
      startCol: String, endCol: String, keyCols: Seq[String] = Nil,
      bucketUs: Long = 3600000000L,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be > 0, got $bucketUs")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    // the guard comparison runs in DOUBLE: the long form
    // `end DIV b - start DIV b + 1` overflows for the exact sentinel it
    // exists to catch (endCol = Long.MaxValue, bucketUs = 1 → MaxValue+1
    // — an ANSI crash or a silent wrap to MinValue depending on mode).
    // Doubles are exact to 2^53 and the threshold is ~10^5, so the
    // comparison cannot misfire within any sane dial range.
    val nb = expr(s"CAST(CAST(`$endCol` DIV ${bucketUs}L AS DOUBLE) - " +
      s"CAST(`$startCol` DIV ${bucketUs}L AS DOUBLE) + 1.0D AS DOUBLE)")
    val rb = right
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(
        when(nb > maxBucketsPerInterval.toDouble, raise_error(concat(
          lit(s"intervalJoin: interval [`$startCol`, `$endCol`] = ["),
          col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
          lit("] spans "), nb.cast("string"),
          lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval — " +
            s"raise bucketUs (now ${bucketUs}µs) or filter/clamp " +
            "degenerate intervals first"))))
          .otherwise(expr(s"CAST(`$startCol` DIV ${bucketUs}L AS BIGINT)")),
        expr(s"CAST(`$endCol` DIV ${bucketUs}L AS BIGINT)"))))
    val lb = left.withColumn("__bucket",
      expr(s"CAST(`$tsCol` DIV ${bucketUs}L AS BIGINT)"))
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Cohort retention: users bucketed by first-seen day (integer
    * day-of-epoch from exact µs — no timezone/date arithmetic), counted
    * per (cohort day, activity day). Two hash aggregates + one join on
    * user_id; the distinct day frame is ≤ users × active-days, far
    * smaller than events, and the cohort frame (one row per user)
    * co-partitions on the same key — canonical retention-matrix shape.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .groupBy("cohort_day", "day")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .withColumn("day_offset", col("day") - col("cohort_day"))
  }

  /** Ordered funnel: users completing each prefix of `steps` in order,
    * with every step inside `withinUs` of the FIRST step. Level i+1 is a
    * join of step-(i+1) events against level-i completions on user_id
    * (each level frame is one row per user — broadcastable long before
    * the event table would be), taking the earliest qualifying time; the
    * result is one row per step with the converted-user count. N−1
    * joins for N steps, each co-partitioned on user_id.
    */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      withinUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id")
      .agg(min(col("ts_us")).as("t_prev"))
      .withColumn("t_first", col("t_prev"))
    val levels = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .select(col("user_id"), col("ts_us"))
        .join(prev, Seq("user_id"))
        .filter(col("ts_us") > col("t_prev") &&
          col("ts_us") - col("t_first") <= withinUs)
        .groupBy("user_id", "t_first")
        .agg(min(col("ts_us")).as("t_prev"))
        .select(col("user_id"), col("t_prev"), col("t_first"))
    }
    levels.zip(steps).zipWithIndex
      .map { case ((lvl, step), i) =>
        lvl.select(lit(i + 1L).as("step_seq"), lit(step).as("step"),
          col("user_id"))
      }
      .reduce(_ unionByName _)
      .groupBy("step_seq", "step")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** As-of join: for each `left` row, the payload of the `right` row with
    * the same key and the nearest `tsCol` at-or-before it (`direction =
    * "backward"`, the default) or at-or-after it (`"forward"`), both
    * inclusive; nulls when no such row exists (left-outer semantics).
    * Ties among right rows at the same instant resolve to the greatest
    * `ordCol` backward / least forward — callers pass a unique ordinal
    * (event id) so the result is total-order deterministic. With
    * `toleranceUs`, matches farther than the tolerance from the left
    * row's time null out (the kdb/pandas `merge_asof` staleness bound;
    * requires a numeric time column — integer micros here).
    *
    * Spark has no as-of join; the naive encodings are a range join
    * (O(|L|·|R|) BroadcastNestedLoop per key) or a groupBy-max correlated
    * join (two shuffles of the big side). This is the scalable shape —
    * the kdb/Flink merge expressed relationally: tag the sides, UNION,
    * and run ONE window per key ordered by (ts, side, ord) carrying
    * `last(payload, ignoreNulls)`; right rows sort before left rows at
    * equal ts, so inclusive semantics fall out of the sort order. The
    * plan has NO join operator at all: one hash exchange on the key +
    * one per-partition sort, both sides streamed once. At 100 TB the
    * only hazard is per-key skew (a hot key's rows sort in one
    * partition) — same envelope as [[sessionize]], and the window sort
    * spills rather than OOMs.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String], ordCol: String,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(toleranceUs.forall(_ >= 0), s"tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payloadCols.contains),
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val backward = direction == "backward"
    // with a tolerance, the matched right timestamp rides inside the
    // payload struct so the bound can compare it against the left row's
    // time; without one, don't widen every row through the exchange+sort
    // for a field nothing reads
    val withMts = toleranceUs.isDefined
    val pFields = payloadCols.map(c => right.schema(c).copy(name = c))
    val pType = org.apache.spark.sql.types.StructType(
      if (withMts) pFields :+ org.apache.spark.sql.types.StructField(
        "__mts", right.schema(tsCol).dataType)
      else pFields)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ord", lit(null).cast("long"))
      .withColumn("__p", lit(null).cast(pType))
    // right rows with a null key or null ts can never match under SQL
    // equality / >= (null never equals, null ts is not at-or-before
    // anything) — drop them so the null-key window partition and the
    // nulls-first ts sort can't fabricate matches the join semantics
    // forbid. Null-key/null-ts LEFT rows stay and get null payloads
    // (left-outer), falling out of the same sort order.
    val rIn = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val r = rIn.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        col(ordCol).cast("long").as("__ord"),
        struct(payloadCols.map(col) ++
          (if (withMts) Seq(col(tsCol).as("__mts")) else Nil): _*).as("__p")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // backward scans time ascending (nearest-before = last right seen);
    // forward is its mirror image on descending time, with the ordinal
    // tie-break mirrored too so "nearest" tie resolves to the least ord.
    // Null-ts LEFT rows must sort BEFORE every right row in both scans
    // (they can match nothing) — asc puts nulls first by default, the
    // desc mirror needs desc_nulls_first or a null-ts left row would
    // sort after all right rows and steal the minimum-ts payload
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(
        (if (backward) col(tsCol).asc else col(tsCol).desc_nulls_first),
        col("__side").asc,
        (if (backward) col("__ord").asc else col("__ord").desc))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceUs match {
      case None => lit(true)
      case Some(t) =>
        val delta = if (backward) col(tsCol) - col("__m").getField("__mts")
        else col("__m").getField("__mts") - col(tsCol)
        delta <= t
    }
    matched.select(leftCols.map(col) ++
      payloadCols.map(c => when(inTol, col("__m").getField(c)).as(c)): _*)
  }

  /** Per-session rollup on top of [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
