package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB posture. AQE's skew-join
  * handling (on by default) covers sort-merge joins; explicit salting is
  * still the tool of choice when a hot key dominates a shuffle *aggregate*
  * or when the skewed side must stay a shuffled hash join (e.g. the
  * shingle-posting self-joins in DedupOps, whose df-cut is a coarser
  * form of the same idea).
  */
object SkewOps {
  /** Salted equi-join: replicate each `right` row `saltFactor` times and
    * scatter `left` rows uniformly across the salt buckets, so one hot
    * key spreads over `saltFactor` reducers instead of one. Use when
    * `right` is small enough to replicate but too big (or too skewed)
    * to broadcast whole.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial/final) aggregation with an explicit salt — the
    * classic hot-key count/sum split. Spark's hash aggregate already does
    * map-side partial aggregation; the salt additionally splits a single
    * hot reduce key across `saltFactor` reducers, which matters when one
    * key holds a large share of ALL rows (partial aggregation alone still
    * funnels that key's partials to one task).
    *
    * Supported aggs: algebraic ones (sum/count/min/max) — pass the partial
    * expression and the merge expression over the partial column.
    */
  def saltedAgg(df: DataFrame, key: String, partial: Column, partialName: String,
      merge: String => Column, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.as(partialName))
      .groupBy(col(key))
      .agg(merge(partialName).as(partialName))
  }

  /** Key-frequency profile: the standard pre-flight check before picking
    * a join strategy — emits the top-n heaviest keys with their share of
    * all rows. Driver-sized output (n rows). */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .withColumn("share", col("n_rows").cast("double") / total)
      .orderBy(col("n_rows").desc, col(key).asc)
      .limit(topN)
  }
}
