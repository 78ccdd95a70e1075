package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via Spark's
  * built-in `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
  * functions — codegen'd aggregates, not UDFs) — the incremental-analytics
  * primitive of the 100 TB posture: per-slice (per-day, per-source,
  * per-language) sketches are built ONCE at ingest and persisted as
  * kilobyte `binary` columns next to the index; any cross-slice distinct
  * count (rolling 30-day uniques, corpus-wide unique tokens, per-source
  * overlap) is then a register-max MERGE over the stored sketches — no
  * re-scan of raw data, no shuffle of raw keys, and the merge input is
  * `slices × ~2 KB` regardless of corpus size.
  *
  * Determinism: an HLL register holds the max leading-zero rank of a
  * 64-bit hash per bucket. Max is commutative and associative, so the
  * sketch — and therefore the estimate — is INVARIANT under row order,
  * partitioning, and merge grouping (one-shot == day-by-day fold ==
  * per-source merge; all spec-pinned). Estimates carry the standard HLL
  * relative-error envelope ~1.04/√2^lgK (≈1.6% at the default lgK = 12);
  * exact distinct counts stay available through the ordinary
  * `count(distinct …)` aggregates — this is the path that REPLACES them
  * when the raw slice can no longer be re-scanned economically.
  *
  * No DuckDB oracle is SQL-expressible for sketch bytes (different HLL
  * implementation), so per the SURVEY contract these are spec-gated:
  * error-bound, merge-vs-whole, partitioning-invariance, and
  * incremental-fold pins in SketchOpsSpec.
  */
object SketchOps {
  /** Default log2 of the register count: 4096 registers ≈ 1.6% standard
    * error, ~2 KB dense — broadcast- and row-group-friendly. */
  val DefaultLgK = 12

  /** One sketch per group: `(groupCols…, n_rows, sketch)`. A single
    * partial-aggregated hash aggregate — each task sketches its rows
    * locally and the exchange carries one ~2 KB buffer per (group ×
    * partition), never the keys. */
  def distinctSketches(df: DataFrame, keyCol: String, lgK: Int = DefaultLgK,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(keyCol)).as("n_rows"),
        hll_sketch_agg(col(keyCol), lgK).as("sketch"))
  }

  /** Roll sketches up to a coarser grouping (days → month, sources →
    * corpus): register-max union, `allowDifferentLgConfigK` so slices
    * sketched at different precisions still merge (result downgrades to
    * the coarsest input). */
  def mergeSketches(sketches: DataFrame, sketchCol: String = "sketch",
      groupCols: Seq[String] = Nil): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_rows"),
        hll_union_agg(col(sketchCol), true).as("sketch"))

  /** The distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Incremental maintenance of a stored per-group sketch table: sketch
    * only the DELTA rows, then full-outer merge onto the stored table by
    * group key — the daily fold that never re-reads history. Both sides
    * are (groupCols…, n_rows, sketch); group keys must be non-null. */
  def updateSketchIndex(stored: DataFrame, delta: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "updateSketchIndex needs group keys")
    val d = delta.select(
      groupCols.map(col) ++ Seq(col("n_rows").as("__d_n"), col("sketch").as("__d_s")): _*)
    stored.join(d, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__d_n"), lit(0L))).as("n_rows"),
        when(col("sketch").isNull, col("__d_s"))
          .when(col("__d_s").isNull, col("sketch"))
          .otherwise(hll_union(col("sketch"), col("__d_s"), true)).as("sketch")): _*)
  }
}
