package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling for pipeline QA: one-row exact summary
  * (counts, range, 2-decimal-exact sum, discrete median/p90) of a
  * numeric column.
  *
  * Quantiles are EXACT and discrete (the value at position
  * ⌈n/2⌉ / ⌈9n/10⌉ of the sorted non-null values — no interpolation,
  * so no cross-engine float blending) and computed from the
  * VALUE HISTOGRAM — a hash aggregate of counts per distinct value —
  * so cost scales with DISTINCT values, not rows.
  *
  * The running count over the histogram is a DISTRIBUTED prefix sum,
  * not a single-partition global window: `repartitionByRange` makes
  * ascending partition id == ascending value range, per-partition
  * subtotals (one row per partition, cluster-config-sized) get their
  * exclusive offsets from a broadcast triangular self-join, and the
  * within-partition running sum is a window PARTITIONED by partition
  * id. Every stage is partition-parallel; the only single-task step is
  * the final one-row quantile lookup aggregate.
  *
  * For near-unique columns (prices, ids) the distinct histogram
  * approaches the row count and the range shuffle becomes the cost —
  * there the 100 TB substitute is `approx_percentile` (documented
  * trade; same substitution SURVEY §2.1 makes for n_unique).
  *
  * Determinism: counts/min/max are arithmetic-free; the sum is exact
  * per-row integer cents; quantile positions use only integer-valued
  * double ops (exactly representable below 2^53); and the prefix sums
  * are exact integers wherever the range partitioner draws its
  * boundaries — so the DuckDB oracle reproduces every cell
  * bit-for-bit regardless of partitioning.
  *
  * The ranged histogram feeds three consumers (per-pid subtotals, the
  * triangular offsets join, and the running-sum probe side), so it is
  * materialized once through `mat` — exchange reuse across those
  * branches is otherwise not guaranteed, and recomputing the histogram
  * aggregate three times is the dominant avoidable cost. The default is
  * the LAZY local checkpoint: all consumers live inside the returned
  * plan, so the histogram computes exactly once, and the checkpoint's
  * result stage is deferred to the first action (under AQE the upstream
  * exchanges still materialize at construction — see
  * [[Materializer.LocalLazy]]).
  */
object ProfileOps {
  /** The shared quantile contract of both profile ops: k-th-smallest
    * positions k50 = ⌊(n+1)/2⌋ and k90 = ⌊(9n+9)/10⌋ (the ceil-position
    * formulas in integer-valued double arithmetic, exact below 2^53),
    * looked up as the first histogram value whose running count reaches
    * k. One definition so the global and per-group ops cannot drift. */
  private def k50(tot: Column): Column =
    floor((tot.cast("double") + 1.0) / 2.0)
  private def k90(tot: Column): Column =
    floor((tot.cast("double") * 9.0 + 9.0) / 10.0)
  private def kth(cum: Column, k: Column, value: Column): Column =
    min(when(cum >= k, value))

  /** The struct-valued (median, p90) scalar plan over a (val, c) value
    * histogram — the distributed prefix-sum machinery both the direct
    * and the incremental profile share. */
  private def quantilesFromHistogram(counts: DataFrame,
      mat: Materializer): DataFrame = {
    // ascending pid == ascending value range; pids are deterministic
    // (RangePartitioner seeds its reservoir sample per partition index)
    // and correctness never depends on where the boundaries land —
    // and materializing FREEZES the pid assignment besides
    val ranged = mat(counts.repartitionByRange(col("val"))
      .withColumn("pid", spark_partition_id()))
    val perPid = ranged.groupBy("pid").agg(sum(col("c")).as("psum"))
    // exclusive prefix offsets + grand total over the per-partition
    // subtotals: a P×P broadcast triangular join on a
    // cluster-config-sized (rows == shuffle partitions) table
    val offs = perPid
      .crossJoin(broadcast(
        perPid.select(col("pid").as("pid2"), col("psum").as("psum2"))))
      .groupBy(col("pid"))
      .agg(
        sum(when(col("pid2") < col("pid"), col("psum2")).otherwise(lit(0L)))
          .as("off"),
        sum(col("psum2")).as("tot"))
    val wpid = Window.partitionBy("pid").orderBy("val")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = ranged
      .withColumn("pcum", sum(col("c")).over(wpid))
      .join(broadcast(offs), "pid")
      .withColumn("cum", col("off") + col("pcum"))
    cum.agg(
      struct(kth(col("cum"), k50(col("tot")), col("val")).as("median"),
        kth(col("cum"), k90(col("tot")), col("val")).as("p90")).as("q"))
  }

  /** Attach the histogram-derived quantiles to a one-row stats frame —
    * the shared back half of the direct and incremental profiles. */
  private def withQuantiles(stats: DataFrame, hist: DataFrame,
      mat: Materializer): DataFrame =
    stats
      .withColumn("__q", quantilesFromHistogram(hist, mat).scalar())
      .select(col("n_rows"), col("n_null"), col("min_v"), col("max_v"),
        col("sum_cents"),
        col("__q").getField("median").as("median"),
        col("__q").getField("p90").as("p90"))

  def numericProfile(df: DataFrame, valueCol: String,
      mat: Materializer = Materializer.LocalLazy): DataFrame = {
    val (stats, hist) = profileParts(df, valueCol)
    withQuantiles(stats, hist, mat)
  }

  /** The INCREMENTAL form of [[numericProfile]]: each slice (day, shard,
    * source…) publishes its sufficient statistics once —
    * [[profileParts]] = one base-stat row (counts, min/max, cent sum;
    * all mergeable aggregates) plus the value histogram (mergeable by
    * union + re-sum, exactly like the CMS cells) — and
    * [[profileFromParts]] reconstructs the EXACT whole-corpus profile
    * from any union of slice parts without re-reading a single raw row
    * (spec-pinned == the direct profile; `q_profile_incremental`
    * hash-matches the direct oracle). This is how the profile row stays
    * maintainable when history can no longer be re-scanned: the daily
    * fold appends one parts pair and re-derives.
    */
  def profileParts(df: DataFrame, valueCol: String): (DataFrame, DataFrame) = {
    val v = col(valueCol)
    val stats = df.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(v)).as("n_null"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      sum(round(v * 100).cast("long")).as("sum_cents"))
    val hist = df.filter(v.isNotNull)
      .groupBy(v.as("val")).agg(count(lit(1)).as("c"))
    (stats, hist)
  }

  /** Rebuild the exact profile row from UNIONED slice parts (any number
    * of slices, any grouping of the folds). */
  def profileFromParts(stats: DataFrame, hist: DataFrame,
      mat: Materializer = Materializer.LocalLazy): DataFrame = {
    val merged = hist.groupBy(col("val")).agg(sum(col("c")).as("c"))
    val mergedStats = stats.agg(
      coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
      coalesce(sum(col("n_null")), lit(0L)).as("n_null"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"),
      sum(col("sum_cents")).as("sum_cents"))
    withQuantiles(mergedStats, merged, mat)
  }

  /** Mergeable quantile SKETCH parts — the third profile part, closing
    * the incremental-profile gap for NEAR-UNIQUE CONTINUOUS columns
    * where [[profileParts]]' exact value histogram is corpus-sized (its
    * documented `approx_percentile` substitute is accurate but NOT
    * mergeable across slices the way the HLL/CMS sinks are).
    *
    * The sketch is a deterministic KLL-lite
    * ([[graft.functions.KllAggregator]]): ≤ k·⌈log₂(N/k)⌉ (level, value)
    * rows per slice — KILOBYTES regardless of N — where a level-i row
    * stands for 2^i original rows and total weight is conserved exactly.
    * The contract mirrors the CMS cells: each slice publishes its part
    * rows once; any UNION of parts is itself a valid sketch
    * ([[quantilesFromSketchParts]] reads it directly); the daily fold
    * re-compacts a grown union back to one bounded part with
    * [[sketchFromParts]] — no raw-history re-scan, ever. Parquet
    * round-trip is trivial (two primitive columns; spec-pinned).
    *
    * Rank error ≈ H·N/(2k) for H occupied levels (≤ 3% at k=256,
    * spec-pinned); exact when a slice has ≤ k rows. Build cost: one
    * partial-aggregate pass (object buffers per partition, merge in the
    * combine stage — the plan shape of any built-in aggregate).
    */
  def quantileSketchParts(df: DataFrame, valueCol: String,
      k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("_1"), lit(0).as("_2"))
      .as[(Double, Int)]
    sketchToRows(items, k)
  }

  /** Re-compact a (possibly unioned, possibly parquet-round-tripped)
    * part table back to one bounded sketch — the fold step. Rides the
    * same aggregator: a stored (level, value) row re-enters at its own
    * level, so weights are preserved and error composes additively. */
  def sketchFromParts(parts: DataFrame, k: Int = 256): DataFrame = {
    val spark = parts.sparkSession
    import spark.implicits._
    val items = parts
      .select(col("value").cast("double").as("_1"), col("level").cast("int").as("_2"))
      .as[(Double, Int)]
    sketchToRows(items, k)
  }

  private def sketchToRows(items: org.apache.spark.sql.Dataset[(Double, Int)],
      k: Int): DataFrame = {
    val agg = new graft.functions.KllAggregator(k)
    items.select(agg.toColumn.name("sketch"))
      .select(explode(col("sketch")).as("e"))
      .select(col("e._1").as("level"), col("e._2").as("value"))
  }

  /** Quantile estimates from any union of sketch parts: weights 2^level
    * re-sum per distinct value into a (val, c) histogram, which then
    * flows through the SAME distributed prefix-sum machinery the exact
    * profile uses — one shared quantile definition, no new shuffle
    * shape. Output: one row (median_est, p90_est). */
  def quantilesFromSketchParts(parts: DataFrame,
      mat: Materializer = Materializer.LocalLazy): DataFrame = {
    val hist = parts.groupBy(col("value").as("val"))
      // exact integer weight 1L << level — the kernel's own formula;
      // pow(2, level) would route the conserved weight through floating
      // point for no reason
      .agg(sum(expr("shiftleft(1L, level)")).as("c"))
    quantilesFromHistogram(hist, mat)
      .select(col("q").getField("median").as("median_est"),
        col("q").getField("p90").as("p90_est"))
  }

  /** CANONICAL sketch build: the byte-stable form of
    * [[quantileSketchParts]] for oracle replay and golden files. The
    * distributed build is deterministic only up to Spark's
    * partial-merge order (two runs give different, equally bounded
    * sketches — correctly spec-gated, not hash-gated); here the input
    * is sorted ascending into ONE partition and folded through the
    * SAME [[graft.functions.KllAggregator]] one value at a time, so
    * the insertion order — and therefore every compaction and the
    * final (level, value) multiset — is a pure function of the value
    * multiset. Equal values are interchangeable through compaction
    * (buffers re-sort), so the row_number tie is immaterial.
    *
    * Deliberately fold via `mapPartitions`, NOT the aggregator plan:
    * Catalyst's EliminateSorts would strip a sort under an aggregate
    * (order-agnostic semantics) and silently restore nondeterminism;
    * an opaque mapPartitions pins the sorted order. Sketch-sized and
    * single-partition by design — this is the canonical READ/replay
    * path, not the distributed build. */
  def canonicalQuantileSketch(df: DataFrame, valueCol: String,
      k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"))
      .coalesce(1)
      .sortWithinPartitions("v")
      .as[Double]
      .mapPartitions { it =>
        val agg = new graft.functions.KllAggregator(k)
        var st = agg.zero
        it.foreach(v => st = agg.reduce(st, (v, 0)))
        agg.finish(st).iterator.map { case (lvl, v) => (lvl.toLong, v) }
      }
      .toDF("level", "value")
  }

  /** PER-GROUP quantile sketch parts: one bounded sketch per group
    * (language, source, day …) — the per-slice QA shape
    * [[numericProfileByGroup]] has for exact profiles and
    * [[SketchOps.distinctSketches]] has for distincts, for continuous
    * columns where the per-group value histogram is group-sized. One
    * hash aggregate keyed by the group (the KLL aggregator rides
    * `functions.udaf`, partial-combining per partition like any
    * built-in); output (groupCol, level, value) rows — each group's
    * slice is independently union-mergeable and foldable with the
    * global ops above.
    *
    * Groups whose values are ALL NULL contribute no parts and therefore
    * no estimate row (unlike [[numericProfileByGroup]], which emits the
    * group with null quantiles) — deliberate: an empty sketch is no
    * rows, so union-merging parts from a later slice where the group
    * HAS values just works. Consumers joining estimates back onto a
    * per-group profile should left-join from the profile side. */
  def quantileSketchPartsByGroup(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketchUdaf = udaf(new graft.functions.KllAggregator(k))
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sketchUdaf(col(valueCol).cast("double"), lit(0)).as("__sketch"))
      .select(col(groupCol), explode(col("__sketch")).as("e"))
      .select(col(groupCol), col("e._1").as("level"), col("e._2").as("value"))
  }

  /** Per-group quantile read over (groupCol, level, value) parts: the
    * weighted running count is a window PARTITIONED by the group (the
    * [[numericProfileByGroup]] shape — skew bounded by one group's
    * sketch rows, which are ≤ k·log₂(N/k) by construction, so the
    * window is bounded even when a group holds half the corpus).
    * Output: one row per group (groupCol, median_est, p90_est). */
  def quantilesFromSketchPartsByGroup(parts: DataFrame,
      groupCol: String): DataFrame =
    groupQuantileAgg(
      parts.groupBy(col(groupCol), col("value").as("val"))
        .agg(sum(expr("shiftleft(1L, level)")).as("c")),
      groupCol, "median_est", "p90_est")

  /** Equi-width histogram of an INTEGRAL column: `bins` buckets over
    * [min, max], bin index = (v − min)·bins div (max − min + 1) — exact
    * long arithmetic end-to-end, so bucket membership (and the oracle
    * hash) cannot drift with float rounding. Emits observed per-bin
    * bounds rather than computed edges (exact, and more useful for
    * skew-reading). Output: (bin, n_rows, lo, hi), only non-empty bins.
    *
    * Shape: ONE eager min/max stats job folded in as literals (the
    * [[BucketOps.zOrdered]] discipline — scalar subqueries clone per
    * reference and would re-scan per bound), then one map-only bin
    * projection + one hash aggregate on the bin key (≤ `bins`
    * post-aggregate rows regardless of corpus size — partial combine
    * does the work map-side).
    */
  def equiWidthHistogram(df: DataFrame, valueCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val v = col(valueCol)
    val row = df.filter(v.isNotNull)
      .agg(min(v).cast("long"), max(v).cast("long")).head()
    // empty / all-null input: degenerate [0, 0] bounds and fall through
    // to the SAME aggregate plan (zero rows in, zero rows out) — a
    // separately-constructed empty frame would carry different column
    // nullability and surprise a caller unioning histograms across slices
    val (mn, mx) =
      if (row.isNullAt(0)) (0L, 0L) else (row.getLong(0), row.getLong(1))
    // the exact-arithmetic contract needs (v − mn) · bins to fit a long
    // (and the width itself not to wrap) — require loudly instead of
    // overflowing (ANSI crash) or wrapping to negative bins; ultra-wide
    // columns (raw 63-bit hashes) should pre-transform, as the z-order
    // scaladoc prescribes for skewed dims
    require(BigInt(mx) - BigInt(mn) + 1 <= BigInt(Long.MaxValue) / bins,
      s"value range [$mn, $mx] * $bins bins overflows exact long binning — " +
        "pre-transform the column (hash-bucket / clamp) first")
    val width = mx - mn + 1
    // `div` = exact integral division (Column./ is double division, and
    // floor(double) drifts above 2^53 — the exactness contract forbids it)
    val bin = expr(
      s"CAST(((CAST(`$valueCol` AS BIGINT) - ${mn}L) * $bins) DIV ${width}L AS BIGINT)")
    df.filter(v.isNotNull)
      .select(bin.as("bin"), v.cast("long").as("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }

  // ------------------------------------------------------------- drift

  /** Categorical distribution drift between two corpus snapshots — the
    * monitoring row a recurring ingestion pipeline publishes per batch
    * ("did the language / source / bucket mix move?"). Per key:
    * baseline and snapshot counts, exact-integer ppm rates
    * (`n·10⁶ div total`, the [[SampleOps.mixtureRates]] discipline),
    * and a population-stability-index contribution in EXACT Q16
    * fixed-point: `psi_q16 = |sa − sb| · log2q16(max(sa,sb),
    * min(sa,sb))` with `s = max(ppm, 1)` smoothing (both factors share
    * a sign in the classic `(p_a−p_b)·log(p_a/p_b)` form, so the
    * absolute-value form is identical and keeps [[graft.functions
    * .Log2Fixed]]'s num ≥ den ≥ 1 contract). All-integer cells: the
    * oracle replays every row bit-for-bit, and summed contributions
    * are partitioning/engine-stable — no transcendental `ln` drift.
    *
    * Scale shape: one map-side-combined count aggregate per corpus
    * (group-sized outputs, materialized once via `mat` — the totals
    * are re-aggregates of the materialized group tables, not second
    * corpus passes), a group-sized full-outer join, and scalar-
    * subquery totals. The corpora are never joined row-to-row. */
  def categoryDrift(a: DataFrame, b: DataFrame, keyCol: String,
      mat: Materializer = Materializer.Local): DataFrame = {
    def counts(df: DataFrame, n: String): DataFrame =
      mat(df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as(n)))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val ta = ca.agg(coalesce(sum(col("n_a")), lit(0L)).as("t")).scalar()
    val tb = cb.agg(coalesce(sum(col("n_b")), lit(0L)).as("t")).scalar()
    val sa = greatest(col("ppm_a"), lit(1L))
    val sb = greatest(col("ppm_b"), lit(1L))
    ca.join(cb, Seq("key"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("__ta", ta)
      .withColumn("__tb", tb)
      .withColumn("ppm_a",
        when(col("__ta") > 0L, expr("n_a * 1000000L DIV __ta")).otherwise(lit(0L)))
      .withColumn("ppm_b",
        when(col("__tb") > 0L, expr("n_b * 1000000L DIV __tb")).otherwise(lit(0L)))
      .withColumn("psi_q16",
        (greatest(sa, sb) - least(sa, sb)) *
          graft.functions.exprs.log2Fixed(greatest(sa, sb), least(sa, sb), 16))
      .select(col("key"), col("n_a"), col("n_b"),
        col("ppm_a"), col("ppm_b"), col("psi_q16"))
  }

  /** One-row summary of a [[categoryDrift]] table: key counts, the
    * appeared/vanished tallies, the exact integer PSI total, and the
    * conventional double reading `psi = psi_q16_total / 2¹⁶ / 10⁶`
    * (two exactly-rounded divisions — deterministic; the standard
    * "investigate ≥ 0.1 / act ≥ 0.25" thresholds apply to a
    * natural-log PSI, so compare against `psi · ln 2`). */
  def categoryDriftSummary(drift: DataFrame): DataFrame =
    drift.agg(
      count(lit(1)).as("n_keys"),
      count(when(col("n_a") === 0L, 1)).as("n_new"),
      count(when(col("n_b") === 0L, 1)).as("n_gone"),
      coalesce(sum(col("psi_q16")), lit(0L)).as("psi_q16"),
      (coalesce(sum(col("psi_q16")), lit(0L)).cast("double")
        / lit(65536.0) / lit(1000000.0)).as("psi"))

  /** Numeric distribution drift: both snapshots are binned with ONE
    * shared exact-integer equi-width rule (edges from the UNION range,
    * the [[equiWidthHistogram]] arithmetic: `(v − mn)·bins div width`,
    * overflow refused loudly) and the bins flow through
    * [[categoryDrift]] — the key is the bin index. Two one-row range
    * aggregates up front; the same no-corpus-join scale shape after. */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
      bins: Int, mat: Materializer = Materializer.Local): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    // the exact bin rule casts to BIGINT: a fractional column (scores
    // in [0,1)) would silently collapse into one or two bins and the
    // monitor would report "no drift" on an arbitrarily large shift —
    // refuse loudly; pre-scale fractional columns to integers first
    // (e.g. round(score * 1000))
    import org.apache.spark.sql.types._
    Seq("a" -> a, "b" -> b).foreach { case (side, df) =>
      val dt = df.schema(valueCol).dataType
      require(dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }, s"histogramDrift needs an integral value column; `$valueCol` on side $side " +
        s"is ${dt.simpleString} — pre-scale it to integers (e.g. round(x * 1000)) first")
    }
    val v = col(valueCol)
    val row = a.select(v).union(b.select(v)).filter(v.isNotNull)
      .agg(min(v).cast("long"), max(v).cast("long")).head()
    val (mn, mx) =
      if (row.isNullAt(0)) (0L, 0L) else (row.getLong(0), row.getLong(1))
    require(BigInt(mx) - BigInt(mn) + 1 <= BigInt(Long.MaxValue) / bins,
      s"value range [$mn, $mx] * $bins bins overflows exact long binning — " +
        "pre-transform the column (hash-bucket / clamp) first")
    val width = mx - mn + 1
    def binned(df: DataFrame): DataFrame = df.filter(v.isNotNull).select(expr(
      s"CAST(((CAST(`$valueCol` AS BIGINT) - ${mn}L) * $bins) DIV ${width}L AS BIGINT)")
      .as("bin"))
    categoryDrift(binned(a), binned(b), "bin", mat)
  }

  /** Per-group profile: one [[numericProfile]] row per group (language,
    * source, day …) — the per-slice QA table a curation pipeline
    * publishes. Identical cell semantics (exact discrete k-th-smallest
    * quantiles from the per-group value histogram, integer-cent sums).
    *
    * The GLOBAL op needs its distributed prefix-sum machinery because a
    * corpus-wide running count has no partition key; per group the
    * running count is simply a window PARTITIONED by the group — the
    * standard sessionize shape, one hash exchange on the group key, skew
    * bounded by a single group's DISTINCT values. Groups whose values
    * are all null profile with null min/max/quantiles (left join from
    * the base stats). */
  def numericProfileByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy(col(groupCol), v.as("val")).agg(count(lit(1)).as("c"))
    val quantiles = groupQuantileAgg(counts, groupCol, "median", "p90")
      .withColumnRenamed(groupCol, "__g")
    // null-safe group join: groupBy treats a NULL key as a real group,
    // so the quantile row for it must attach too (plain equality would
    // silently null that group's quantiles)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(v)).as("n_null"),
        min(v).as("min_v"),
        max(v).as("max_v"),
        sum(round(v * 100).cast("long")).as("sum_cents"))
      .join(quantiles, col(groupCol) <=> col("__g"), "left")
      .drop("__g")
  }

  /** The ONE per-group discrete-quantile read over a (group, val, c)
    * histogram — group-partitioned running count + k-th lookup, shared
    * by [[numericProfileByGroup]] (exact counts) and
    * [[quantilesFromSketchPartsByGroup]] (sketch weights) so the
    * per-group quantile definition cannot drift from the global k50/k90
    * contract. */
  private def groupQuantileAgg(counts: DataFrame, groupCol: String,
      medianAs: String, p90As: String): DataFrame = {
    val wRun = Window.partitionBy(groupCol).orderBy("val")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(groupCol)
    counts
      .withColumn("cum", sum(col("c")).over(wRun))
      .withColumn("tot", sum(col("c")).over(wAll))
      .groupBy(col(groupCol))
      .agg(kth(col("cum"), k50(col("tot")), col("val")).as(medianAs),
        kth(col("cum"), k90(col("tot")), col("val")).as(p90As))
  }
}
