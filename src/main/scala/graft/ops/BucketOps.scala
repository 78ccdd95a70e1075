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
