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
  * VALUE HISTOGRAM in ONE subquery pass: a hash aggregate of counts per
  * distinct value, one running-sum window (the total rides the same
  * sort as an unbounded frame — n needs no extra scan), and both
  * positional lookups folded into a single struct-valued scalar
  * subquery. Cost scales with DISTINCT values, not rows — for
  * bounded-cardinality columns (quantities, scores, bucketed lengths)
  * the window is tiny.
  * For near-unique columns (prices, ids) the distinct histogram
  * approaches the row count and its global sort becomes the cost —
  * there the 100 TB substitute is `approx_percentile` (documented
  * trade; same substitution SURVEY §2.1 makes for n_unique).
  *
  * Determinism: counts/min/max are arithmetic-free; the sum is exact
  * per-row integer cents; quantile positions use only integer-valued
  * double ops (exactly representable below 2^53), so the DuckDB oracle
  * reproduces every cell bit-for-bit.
  */
object ProfileOps {
  def numericProfile(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy(v.as("val")).agg(count(lit(1)).as("c"))
    val ordered = Window.orderBy("val")
    val cum = counts
      .withColumn("cum", sum(col("c"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("c"))
        .over(ordered.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // k-th smallest = first value whose running count reaches k;
    // k = floor((n+1)/2) and floor((9n+9)/10) = the ceil-position
    // formulas in integer-valued double arithmetic (exact below 2^53)
    def kth(k: Column): Column = min(when(col("cum") >= k, col("val")))
    val k50 = floor((col("tot").cast("double") + 1.0) / 2.0)
    val k90 = floor((col("tot").cast("double") * 9.0 + 9.0) / 10.0)
    val quantiles = cum.agg(
      struct(kth(k50).as("median"), kth(k90).as("p90")).as("q"))
    df.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(v)).as("n_null"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      sum(round(v * 100).cast("long")).as("sum_cents"))
      .withColumn("__q", quantiles.scalar())
      .select(col("n_rows"), col("n_null"), col("min_v"), col("max_v"),
        col("sum_cents"),
        col("__q").getField("median").as("median"),
        col("__q").getField("p90").as("p90"))
  }
}
