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
  * No DuckDB oracle is SQL-expressible for the HLL sketch BYTES
  * (different implementation), so the HLL half is spec-gated per the
  * SURVEY contract: error-bound, merge-vs-whole, partitioning-
  * invariance, and incremental-fold pins in SketchOpsSpec. The
  * count-min half below uses deterministic modular hashing instead and
  * IS oracle-gated (`q_cms_terms`).
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
      groupCols: Seq[String] = Nil, countCol: String = "n_rows"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(coalesce(sum(col(countCol)), lit(0L)).as(countCol),
        hll_union_agg(col(sketchCol), true).as(sketchCol))

  /** The distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Count-min frequency sketch over whitespace terms — the mergeable
    * approximate-FREQUENCY complement of the HLL distinct sketch:
    * `depth` hash rows × `2^log2w` cells, cell (j, p) = summed count of
    * every term whose j-th permuted hash (the MinHash permutation
    * family — deterministic modular arithmetic) lands at p. The sketch
    * IS a small table, so it merges by union + re-sum
    * ([[cmsMerge]] — the fold that keeps a per-day term-frequency
    * index without re-scanning history) and, unlike the HLL bytes, the
    * DuckDB oracle reproduces cells and estimates EXACTLY.
    *
    * Estimates ([[cmsEstimates]]) are `min` over the depth rows:
    * one-sided — never an under-count; over-count ≤ e·N/2^log2w with
    * probability 1−e^−depth (Cormode & Muthukrishnan, J.Alg 2005).
    * Defaults (4 × 2^14 = 64 K cells) over-count a 10⁹-token corpus by
    * ≲ 170 k with p ≈ 0.98 — tune log2w to the tail you care about.
    *
    * Shape: one map-only token explode fanned ×depth, then a (j, pos)
    * hash aggregate that partial-combines to ≤ depth·2^log2w cells per
    * partition regardless of corpus size.
    */
  def cmsCells(df: DataFrame, textCol: String, depth: Int = 4,
      log2w: Int = 14): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(log2w >= 4 && log2w <= 24, s"log2w must be in [4, 24], got $log2w")
    val w = 1L << log2w
    val h = graft.ops.TextOps.charHash(col("__tok"))
    val entries = array(DedupOps.minhashParams(depth).zipWithIndex.map {
      case ((a, b), j) =>
        struct(lit(j).as("j"),
          pmod(h % graft.ops.TextOps.RehashP * a + b,
            lit(graft.ops.TextOps.RehashP)).%(w).as("pos"))
    }: _*)
    df.filter(col(textCol).isNotNull)
      .select(explode(graft.ops.TextOps.tokens(col(textCol))).as("__tok"))
      .select(explode(entries).as("__e"))
      .groupBy(col("__e.j").as("j"), col("__e.pos").as("pos"))
      .agg(count(lit(1)).as("cell"))
  }

  /** Merge CMS cell tables built with the SAME (depth, log2w): union +
    * re-sum. Exactly equals the whole-corpus build (spec-pinned) — cell
    * sums are order/partition/grouping invariant. */
  def cmsMerge(cells: Seq[DataFrame]): DataFrame = {
    require(cells.nonEmpty, "cmsMerge needs at least one cells table")
    cells.reduce(_ unionByName _)
      .groupBy(col("j"), col("pos"))
      .agg(sum(col("cell")).as("cell"))
  }

  /** Point estimates for `terms` (a column `termCol` of distinct terms)
    * against a CMS cells table: each term probes its `depth` cells and
    * takes the min; absent cells read 0, so a term none of whose cells
    * was ever hit estimates 0 (an unseen term whose cells ARE occupied
    * over-counts like any other — the standard CMS one-sided error).
    * The cells side is ≤ depth·2^log2w rows — broadcastable at the
    * defaults. */
  def cmsEstimates(terms: DataFrame, termCol: String, cells: DataFrame,
      depth: Int = 4, log2w: Int = 14): DataFrame = {
    val w = 1L << log2w
    val h = graft.ops.TextOps.charHash(col(termCol))
    val probes = array(DedupOps.minhashParams(depth).zipWithIndex.map {
      case ((a, b), j) =>
        struct(lit(j).as("j"),
          pmod(h % graft.ops.TextOps.RehashP * a + b,
            lit(graft.ops.TextOps.RehashP)).%(w).as("pos"))
    }: _*)
    terms.select(col(termCol), explode(probes).as("__p"))
      .join(broadcast(cells),
        col("__p.j") === cells("j") && col("__p.pos") === cells("pos"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cell"), lit(0L))).as("n_est"))
  }

  /** Incremental maintenance of a stored per-group sketch table: sketch
    * only the DELTA rows, then full-outer merge onto the stored table by
    * group key — the daily fold that never re-reads history. Both sides
    * are (groupCols…, n_rows, sketch). The join is NULL-SAFE per key
    * (`<=>`), so a NULL group value stays ONE group across folds, as it
    * is in `groupBy`; with no group keys the two global rows merge
    * directly. */
  def updateSketchIndex(stored: DataFrame, delta: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    if (groupCols.isEmpty)
      return mergeSketches(
        stored.select("n_rows", "sketch")
          .unionByName(delta.select("n_rows", "sketch")))
    val d = delta.select(
      groupCols.map(c => col(c).as(s"__d_$c")) ++
        Seq(col("n_rows").as("__d_n"), col("sketch").as("__d_s")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _)
    stored.join(d, cond, "full_outer")
      .select(groupCols.map(c => coalesce(col(c), col(s"__d_$c")).as(c)) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__d_n"), lit(0L))).as("n_rows"),
        when(col("sketch").isNull, col("__d_s"))
          .when(col("__d_s").isNull, col("sketch"))
          .otherwise(hll_union(col("sketch"), col("__d_s"), true)).as("sketch")): _*)
  }
}
