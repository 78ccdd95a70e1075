package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing for co-located joins — the standing-layout answer to "this
  * join shuffles 100 TB every day". Writing both sides bucketed AND
  * sorted by the join key lets Catalyst plan a SortMergeJoin with NO
  * exchange and NO per-query sort: the shuffle is paid once at write
  * time and amortized over every subsequent join/aggregate on that key.
  *
  * This is the table-layout rule for the index tables themselves at the
  * 100 TB north star: the dense-id table bucketed by `id` co-locates
  * the daily upsert's anti-join + enrichment join and the align range
  * join (SURVEY.md §7.3 item 6).
  */
object BucketOps {
  /** Persist `df` as a bucketed, per-bucket-sorted table. Drops a stale
    * registration/location first: with the in-memory catalog a previous
    * JVM's table directory survives while its registration doesn't, and
    * overwrite refuses the orphaned location. The stale location is
    * resolved through the Hadoop FileSystem for the warehouse URI, so
    * the helper works against any warehouse scheme (local fs, HDFS,
    * s3a/abfs object stores), not just `file:`. Default-database layout
    * (`<warehouse>/<table>`) assumed, matching the in-memory catalog.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts Catalyst plans the join exchange-free (check:
    * [[isExchangeFree]]). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Z-ordered (Morton-curve) parquet layout — multi-dimensional
    * row-group/file pruning for tables queried by MORE than one
    * predicate column (a single-column sort makes min/max stats
    * selective on that column only; the z-sort makes them selective on
    * BOTH). Each dimension is scaled into [0, 2^bits), the two scaled
    * values interleave into a z-value via the codegen
    * [[graft.functions.ZInterleave]], and the table is
    * range-partitioned + sorted by that z-value — the standard layout
    * idiom (Delta/Iceberg `OPTIMIZE ZORDER BY`) re-expressed in plain
    * open-source Spark.
    *
    * Both dimensions are min/max-scaled from ONE stats aggregate: a
    * single four-column min/max job collected eagerly at layout time,
    * embedded as literals in the z expression (four independent scalar
    * subqueries would re-scan the input four times — and per-reference
    * subquery cloning makes even a shared struct subquery multiply in
    * the optimized plan). The scaling itself is MAP-ONLY — no global
    * rank window, keeping the library's
    * no-partition-less-WindowExec invariant — so the only
    * shuffle is the final z range partition —
    * the same exchange a plain `orderBy` write pays; it runs once at
    * LAYOUT time and is amortized over every pruned read after.
    * Linear scaling leaves heavily-skewed dimensions unevenly spread
    * along the curve (the classic trade vs a rank scale); pre-transform
    * such a column (log-bucket, hash) before layout. Output: `files`
    * parquet files, each covering a z-contiguous block.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 15): Unit =
    zOrdered(df, colA, colB, files, bits)
      .write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** The pre-write z-layout plan (exposed so the one-stats-scan shape is
    * spec-pinnable): scale both dims by bounds collected from ONE
    * eager min/max aggregate, interleave, range-partition + sort by the
    * z-value. NOTE: building this frame runs the stats job (one small
    * collect) — writeZOrdered is an action anyway. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      files: Int, bits: Int = 15): DataFrame = {
    import org.apache.spark.sql.functions._
    require(files >= 1, s"files must be >= 1, got $files")
    val scale = (1L << bits) - 1
    // ONE stats scan for all four bounds, folded into the plan as
    // literals (scalar subqueries clone per reference — the optimized
    // plan would carry 4-6 copies of the same aggregate).
    val row = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty input / all-null dim: degenerate bounds, every value scales to 0
    def b(i: Int) = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    def scaled(c: String, mn: Double, mx: Double) =
      ((col(c).cast("double") - mn) / math.max(mx - mn, 1e-300) * scale)
        .cast("long")
    val z = graft.functions.exprs.zInterleave(
      scaled(colA, b(0), b(1)), scaled(colB, b(2), b(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** True when the physical plan contains no SHUFFLE exchange — the
    * property bucketing exists to buy. (A BroadcastExchange doesn't
    * count: broadcasting a small side is free of the repartitioning cost
    * bucketing removes, and Catalyst rightly prefers it when a side fits
    * under the broadcast threshold.) */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning") &&
      !plan.contains("ShuffleExchange")
  }
}
