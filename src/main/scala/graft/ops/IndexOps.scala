package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core index-maintenance operators.
  *
  * The central contract is the dense-id invariant (reference:
  * tmdb_index.py:107-114): `id` is 0..N-1, unique, non-null. Every
  * order-dependent semantic of the reference ("keep last", ordinal rank,
  * positional slice) is re-expressed through the `id` key or an explicit
  * priority column so it is well-defined on Spark's unordered, distributed
  * DataFrames (SURVEY.md §7.0).
  *
  * All operators are pure `DataFrame => DataFrame` over Catalyst built-ins;
  * no custom rules/strategies are needed (SURVEY.md §4).
  */
object IndexOps {
  val ID = "id"

  /** O1 — dense re-index (reference tmdb_index.py:62-72).
    *
    * Generates `id = 0..max(id)` as a Range leaf and left-joins the data
    * onto it, so id gaps materialize as all-null rows. Column order of the
    * input is preserved. Empty input passes through.
    *
    * Scale: `spark.range` is a parallel leaf; the join shuffles both sides
    * on `id` (or broadcasts the range when small). Linear, no driver
    * materialization beyond the scalar max.
    */
  def alignIdCol(df: DataFrame): DataFrame = {
    require(df.columns.contains(ID), s"alignIdCol: missing '$ID' column")
    val maxRow = df.agg(max(col(ID).cast(LongType))).head()
    if (maxRow.isNullAt(0)) return df // empty frame: passthrough
    // Generated range is cast back to the input's id dtype so a round-trip
    // through alignIdCol never changes the table schema (reference keeps
    // UInt32 throughout, tmdb_index.py:67-68).
    val idType = df.schema(df.schema.fieldIndex(ID)).dataType
    val ids = df.sparkSession
      .range(maxRow.getLong(0) + 1)
      .select(col("id").cast(idType).as(ID))
    ids
      .join(df, Seq(ID), "left")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Output schema of a schema-merging upsert: left fields first, then
    * novel right fields in right order; dtype equality asserted on name
    * collisions (reference tmdb_index.py:75-88).
    */
  def unionSchema(left: StructType, right: StructType): Seq[StructField] = {
    val leftNames = left.fieldNames.toSet
    right.fields.foreach { f =>
      left.fields.find(_.name == f.name).foreach { g =>
        require(
          g.dataType == f.dataType,
          s"updateOrAppend: dtype mismatch on '${f.name}': ${g.dataType} vs ${f.dataType}")
      }
    }
    (left.fields ++ right.fields.filterNot(f => leftNames(f.name))).toSeq
  }

  /** Project `df` onto `fields` (in that order), inserting missing columns
    * as typed nulls — Polars `match_to_schema(missing_columns="insert")`
    * (reference tmdb_index.py:93,95).
    */
  def matchToSchema(df: DataFrame, fields: Seq[StructField]): DataFrame =
    df.select(fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)

  /** O2 — schema-merging upsert, the keystone operator (reference
    * tmdb_index.py:74-104).
    *
    * Semantics: rows of `other` win over rows of `df` with the same id
    * ("keep last" re-expressed as an anti-join, legal because `other` must
    * be unique on id — the reference dedups its deltas before merging,
    * tmdb_index.py:214). Columns `other` lacks are enriched from the old
    * row via a left join; novel columns appear after all left columns.
    *
    * Scale: the big side (`df`) is only anti-joined against the delta's
    * ids — when the delta is small Catalyst broadcasts it, so the 100 TB
    * table is never shuffled; a window-over-id formulation would shuffle
    * everything.
    */
  def updateOrAppend(df: DataFrame, other: DataFrame): DataFrame =
    updateOrAppend(df, other, None)

  /** As [[updateOrAppend]], but first dedups `other` on id keeping the row
    * with the highest `deltaOrdinal` — the Spark re-expression of the
    * reference's `unique(subset="id", keep="last")` on the delta itself
    * (tmdb_index.py:104). Pass the fetch ordinal / source priority that
    * defines "last".
    */
  def updateOrAppend(df: DataFrame, other: DataFrame,
      deltaOrdinal: Option[Column]): DataFrame =
    updateOrAppend(df, other, deltaOrdinal, assumeUniqueDelta = false)

  /** As above; `assumeUniqueDelta = true` skips the eager delta-uniqueness
    * check (it costs one Spark job per call — fine interactively, wrong
    * inside a per-day fold whose deltas are already normalized/deduped).
    */
  def updateOrAppend(df: DataFrame, other: DataFrame,
      deltaOrdinal: Option[Column], assumeUniqueDelta: Boolean): DataFrame = {
    val outFields = unionSchema(df.schema, other.schema)
    require(outFields.exists(_.name == ID), "output schema must have id column")

    // A delta that is not unique on id would fan out the enrichment join
    // and emit duplicate ids, breaking the dense-id invariant downstream.
    // Dedup by the caller's ordinal when given; otherwise enforce the
    // precondition (cheap: LocalLimit(1) early-exits the aggregate).
    val delta = deltaOrdinal match {
      case Some(ord) => dedupKeepLast(other, ID, ord)
      case None if assumeUniqueDelta => other
      case None =>
        require(duplicateIds(other).limit(1).isEmpty,
          "updateOrAppend: delta must be unique on id (pass deltaOrdinal to dedup keep-last)")
        other
    }

    if (df.isEmpty) return matchToSchema(delta, outFields)

    val left = matchToSchema(df, outFields)
    // enrich incoming rows with old values for columns the delta lacks
    val overlap = (delta.columns.toSet - ID).toSeq
    val enriched = delta.join(left.drop(overlap: _*), Seq(ID), "left")
    val right = matchToSchema(enriched, outFields)

    left.join(right.select(ID), Seq(ID), "left_anti").unionByName(right)
  }

  /** Keep-last / keep-first dedup with an EXPLICIT ordering column —
    * Spark has no row order, so Polars' `unique(keep="last")` (reference
    * tmdb_index.py:104,214,344-348) needs the caller to say what "last"
    * means (a fetch ordinal, a source priority, a date).
    */
  def dedupKeepLast(df: DataFrame, key: String, ordinal: Column): DataFrame =
    dedupBy(df, key, ordinal.desc)

  def dedupKeepFirst(df: DataFrame, key: String, ordinal: Column): DataFrame =
    dedupBy(df, key, ordinal.asc)

  private def dedupBy(df: DataFrame, key: String, ord: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ord)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** O15 — union two sources where rows of `primary` beat rows of
    * `secondary` on id collisions (reference tmdb_index.py:331-352,
    * keep-first under movie-then-collection concat order).
    */
  def unionKeepFirst(primary: DataFrame, secondary: DataFrame): DataFrame =
    primary.unionByName(
      secondary.join(primary.select(ID), Seq(ID), "left_anti"))

  /** O3 — dense-key invariant check (reference tmdb_index.py:107-114)
    * as a single aggregate pass: dense ⇔ min=0 ∧ max=n−1 ∧ distinct=n ∧
    * nulls=0 (physical sortedness is meaningless in Spark; density implies
    * the reference's sorted+consecutive asserts).
    */
  def idCheck(df: DataFrame): DataFrame = {
    df.agg(
        count(lit(1)).as("n_rows"),
        min(col(ID)).as("min_id"),
        max(col(ID)).as("max_id"),
        countDistinct(col(ID)).as("n_distinct"),
        coalesce(sum(when(col(ID).isNull, 1L)), lit(0L)).as("n_null"))
      .withColumn(
        "valid",
        col("n_rows") === 0 ||
          (col("min_id") === 0 && col("max_id") === col("n_rows") - 1 &&
            col("n_distinct") === col("n_rows") && col("n_null") === 0))
  }

  /** O3 — throwing form, mirroring the reference's asserts. */
  def validateId(df: DataFrame): Unit = {
    val r = idCheck(df).head()
    if (r.getLong(0) == 0L) return
    require(r.getBoolean(5),
      s"id column must be dense 0..N-1: rows=${r.getLong(0)} min=${r.get(1)} " +
        s"max=${r.get(2)} distinct=${r.getLong(3)} nulls=${r.getLong(4)}")
  }

  /** O4 — diff metric (reference tmdb_index.py:117-132): added/removed
    * from the length delta; `updated` = rows in the common id prefix
    * (`id < min(n_old, n_new)`, ≡ the reference's positional `[:min_len]`
    * slice under the dense invariant) whose row content differs. Row
    * equality via xxhash64 over all columns — only hash equality is used,
    * so Spark's hash need not match Polars' (SURVEY.md §2 O4).
    */
  def changeSummary(dfOld: DataFrame, dfNew: DataFrame): DataFrame = {
    val spark = dfNew.sparkSession
    import spark.implicits._
    val oldN = dfOld.count()
    val newN = dfNew.count()
    val minLen = math.min(oldN, newN)
    val added = math.max(0L, newN - oldN)
    val removed = math.max(0L, oldN - newN)

    def hashed(d: DataFrame, as: String) =
      d.filter(col(ID) < minLen)
        .select(col(ID), xxhash64(d.columns.map(col).toIndexedSeq: _*).as(as))

    val updated =
      if (minLen == 0) 0L
      else
        hashed(dfOld, "__h_old")
          .join(hashed(dfNew, "__h_new"), Seq(ID))
          .filter(col("__h_old") =!= col("__h_new"))
          .count()

    Seq((added, removed, updated)).toDF("added", "removed", "updated")
  }

  /** O6 — per-column profile (reference tmdb_index.py:142-175), numeric
    * form. One aggregate pass over `dfNew` for null/true/false/unique
    * counts; one full-outer self-join on id for per-column `updated`
    * counts. Polars `!=` is null-propagating and so is Spark's `=!=`:
    * null-vs-value positions are NOT counted as updated (pinned by the
    * reference's test_tmdb_index.py:774-780 — do not "fix" into a
    * null-safe compare).
    *
    * Output: one row per column of `dfNew`:
    * (name, dtype, n_null, n_true, n_false, is_unique, n_updated).
    */
  def computeStats(dfOld: DataFrame, dfNew: DataFrame): DataFrame = {
    val spark = dfNew.sparkSession
    import spark.implicits._
    val fields = dfNew.schema.fields

    val aggExprs = fields.flatMap { f =>
      val c = col(f.name)
      val isBool = f.dataType == BooleanType
      Seq(
        coalesce(sum(when(c.isNull, 1L)), lit(0L)).as(s"null__${f.name}"),
        (if (isBool) coalesce(sum(when(c === true, 1L)), lit(0L)) else lit(0L))
          .as(s"true__${f.name}"),
        (if (isBool) coalesce(sum(when(c === false, 1L)), lit(0L)) else lit(0L))
          .as(s"false__${f.name}"),
        (countDistinct(c) === count(c)).as(s"uniq__${f.name}"))
    }
    val base = dfNew.agg(aggExprs.head, aggExprs.tail.toIndexedSeq: _*).head()

    // updated: full outer join on id pads the shorter side with nulls —
    // the reference's _series_pad (tmdb_index.py:135-139) — then count
    // null-propagating inequality per column.
    val common = fields.map(_.name).filter(dfOld.columns.contains)
    val o = dfOld.select((ID +: common.filter(_ != ID)).map(n => col(n).as(s"o__$n")).toIndexedSeq: _*)
    val n = dfNew.select((ID +: common.filter(_ != ID)).map(n0 => col(n0).as(s"n__$n0")).toIndexedSeq: _*)
    val joined = o.join(n, col(s"o__$ID") === col(s"n__$ID"), "full_outer")
    val updExprs = fields.map { f =>
      val expr =
        if (f.name == ID) when(col(s"o__$ID") =!= col(s"n__$ID"), 1L)
        else if (!common.contains(f.name)) lit(null).cast(LongType)
        else when(col(s"o__${f.name}") =!= col(s"n__${f.name}"), 1L)
      coalesce(sum(expr), lit(0L)).as(s"upd__${f.name}")
    }
    val upd = joined.agg(updExprs.head, updExprs.tail.toIndexedSeq: _*).head()

    val rows = fields.zipWithIndex.map { case (f, i) =>
      (f.name, f.dataType.simpleString,
        base.getLong(i * 4), base.getLong(i * 4 + 1), base.getLong(i * 4 + 2),
        base.getBoolean(i * 4 + 3), upd.getLong(i))
    }
    spark
      .createDataFrame(rows.toIndexedSeq)
      .toDF("name", "dtype", "n_null", "n_true", "n_false", "is_unique", "n_updated")
  }

  /** O14 — ids occurring more than once (reference tmdb_index.py:327-328). */
  def duplicateIds(df: DataFrame): DataFrame =
    df.groupBy(col(ID)).count().filter(col("count") > 1).select(col(ID))

  /** O16 — presence-flag refresh (reference tmdb_index.py:355-366):
    * left-join current ids against the export's ids, absent → false,
    * replace `in_export` in place (or append it at the end), preserving
    * the original column order.
    */
  def updateExportFlag(df: DataFrame, exportIds: DataFrame,
      flag: String = "in_export"): DataFrame = {
    val orig = df.columns
    val joined = df
      .drop(flag)
      .join(exportIds.select(col(ID)).distinct().withColumn(flag, lit(true)),
        Seq(ID), "left")
      .withColumn(flag, coalesce(col(flag), lit(false)))
    val outCols = if (orig.contains(flag)) orig.toSeq else orig.toSeq :+ flag
    joined.select(outCols.map(col): _*)
  }

  /** O20a — round a timestamp to the NEAREST day (Polars `dt.round("1d")`,
    * reference tmdb_index.py:493-495). Not truncation: 11:59:59.999 rounds
    * down, 12:00:00 rounds up. No Spark builtin; composition suffices.
    */
  def roundToDay(ts: Column): Column =
    date_add(to_date(ts), when(hour(ts) >= 12, 1).otherwise(0))

  /** O20 — enrichment work queue (reference tmdb_index.py:482-527): ids
    * that are (a) stale: `date >= round_to_day(retrieved_at)`; (b) backfill
    * top-k: first k never-fetched ids in id order; (c) refresh top-k: k
    * oldest fetch timestamps (nulls excluded, ties by id). The reference's
    * global `rank("ordinal")` becomes `orderBy().limit(k)` so Catalyst
    * plans TakeOrderedAndProject — a distributed top-k with no
    * single-partition window (SURVEY.md §4).
    */
  def fetchQueue(df: DataFrame, backfillLimit: Int, refreshLimit: Int,
      retrievedAt: String = "retrieved_at", dateCol: String = "date"): DataFrame = {
    // Reference guards `backfill_limit > 0` / `refresh_limit > 0` and skips
    // those predicates entirely (tmdb_index.py:497,516); Spark's `limit`
    // additionally rejects negatives, so the guard is load-bearing here.
    val noIds = df.filter(lit(false)).select(col(ID))
    if (!df.columns.contains(retrievedAt)) {
      // fallback (c): first N by id (reference tmdb_index.py:511)
      if (backfillLimit <= 0) return noIds
      return df.select(col(ID)).orderBy(col(ID)).limit(backfillLimit)
    }
    val ra = col(retrievedAt)
    // stale predicate needs BOTH columns; with `date` absent the reference
    // still emits backfill+refresh (tmdb_index.py:491-495).
    val stale =
      if (df.columns.contains(dateCol))
        df.filter(col(dateCol) >= roundToDay(ra)).select(col(ID))
      else noIds
    val backfill =
      if (backfillLimit <= 0) noIds
      else df.filter(ra.isNull).select(col(ID)).orderBy(col(ID)).limit(backfillLimit)
    val refresh =
      if (refreshLimit <= 0) noIds
      else df.filter(ra.isNotNull).orderBy(ra.asc, col(ID).asc)
        .limit(refreshLimit).select(col(ID))
    stale.union(backfill).union(refresh).distinct()
  }

  /** O18 — uint32 domain guard (reference tmdb_index.py:405-411). */
  val UINT32_MAX: Long = (1L << 32) - 1
  def clampUInt32(c: Column): Column =
    when(c.between(0L, UINT32_MAX), c).otherwise(lit(null))
}
