package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.IndexOps
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship on /root/testdata/sf0.001: the reference's `process` shape
    * (reference tmdb_index.py:546-568) — upsert a delta into a dense-id
    * table, re-index, refresh the presence flag, and emit the fetch
    * queue join — exercising O1/O2/O16/O20 end-to-end. Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.filter(col("doc_id") < 400)
      .select(col("doc_id").as("id"), col("lang"), col("n_chars"))
    val delta = docs.filter(col("doc_id") >= 350)
      .select(col("doc_id").as("id"), col("n_chars"), col("source"))
    val merged = IndexOps.alignIdCol(IndexOps.updateOrAppend(base, delta))
    val flagged = IndexOps.updateExportFlag(merged,
      docs.filter(pmod(col("doc_id"), lit(2)) === 0).select(col("doc_id").as("id")))
    val queue = IndexOps.fetchQueue(flagged
      .withColumn("retrieved_at",
        when(pmod(col("id"), lit(5)) === 0, lit(null).cast("timestamp"))
          .otherwise(timestamp_micros(lit(1704067200000000L) + col("id") * 3600000000L)))
      .withColumn("date", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        pmod(col("id"), lit(30)).cast("int"))),
      backfillLimit = 50, refreshLimit = 50)
    flagged.join(queue, Seq("id"), "left_semi")
  }

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data extension ops — see graft.queries.Queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-equivalent SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Queries.oracle
}
