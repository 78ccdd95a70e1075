package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation funnel — the library's training-data stages
  * composed in the canonical order a pretraining pipeline runs them
  * (each stage consumes the previous stage's survivors):
  *
  *  0. web corpora only (opt-in): `domain_block` + `url_dedup`
  *     ([[UrlOps]] — blocklisted domains out, one survivor per
  *     canonical URL), then `extract` (HTML main-content,
  *     [[TextOps.extractMainContent]]), then `boilerplate` (opt-in
  *     r18, `boilerplateMaxDf > 0`: frequency-cut line removal,
  *     [[DedupOps.cutBoilerplateLines]] — the CCNet position, BETWEEN
  *     extraction and quality, so nav/footer lines that survive
  *     main-content extraction never reach shingles or quality stats);
  *  1. `normalize`  — Unicode canonicalization (NFC, casefold,
  *     whitespace collapse) so every later stage keys on canonical text;
  *  2. `quality`    — the composite heuristic gate
  *     ([[TextOps.qualityFilter]]: length, stopword density, word shape);
  *  3. `dedup`      — exact dedup on the canonical text, keep-first by id
  *     ([[IndexOps.dedupKeepFirst]]);
  *  4. `classifier` — fastText-style linear score ≥ threshold
  *     ([[TextOps.classifierScore]] against a broadcast model);
  *  5. `sample`     — deterministic hash downsampling to the target rate
  *     ([[SampleOps.hashSample]] — partitioning/engine independent).
  *
  * [[curate]] returns the surviving documents; [[funnel]] the per-stage
  * count table `(stage_ord, stage, n_docs)` — the funnel report a
  * pipeline publishes per snapshot (every count is derived from exact
  * integer/deterministic stages, so the whole funnel hash-matches the
  * DuckDB oracle).
  *
  * Scale shape: every stage is itself scale-shaped (map-only filters,
  * one keyed window for dedup, broadcast model join, pure-row sample);
  * `mat` materializes each stage once so the funnel's five counts don't
  * recompute the chain (Inline recompute is fine at test scale — the
  * default mirrors the dedup ops' local-measured trade).
  */
object Curation {
  /** The staged frames, in order, each filtered through all previous
    * stages. Exposed so callers can report ([[funnel]]), checkpoint, or
    * fork the chain at any stage. */
  def stages(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, minWords: Long = 20, maxStopRatio: Double = 0.5,
      minAvgLen: Double = 2.0, maxAvgLen: Double = 12.0,
      bias: Long = 0L, threshold: Long = 0L,
      sampleNum: Int = 800, sampleDen: Int = 1000,
      mat: Materializer = Materializer.Inline,
      fromHtml: Boolean = false,
      urlCol: String = null,
      blockedDomains: Seq[String] = Nil,
      boilerplateMaxDf: Int = 0): Seq[(String, DataFrame)] = {
    val preUrl = df.filter(col(textCol).isNotNull)
    // stage -1 (web corpora with a URL column): URL-level curation runs
    // FIRST — domain blocklist, then canonical-URL dedup keep-first —
    // so a mirrored/re-tracked page never reaches text extraction, let
    // alone shingling (the CCNet stage order). Both map/broadcast-only
    // plus the one keep-first window.
    val urlStages: Seq[(String, DataFrame)] =
      if (urlCol == null) Nil
      else {
        val blocked = mat(
          UrlOps.domainBlocklistFilter(preUrl, urlCol, blockedDomains))
        val urlDeduped = mat(
          UrlOps.urlDedup(blocked, idCol, urlCol).drop("canonical_url"))
        Seq("domain_block" -> blocked, "url_dedup" -> urlDeduped)
      }
    val input = if (urlCol == null) preUrl else urlStages.last._2
    // stage 0 (web corpora): boilerplate extraction BEFORE anything
    // else — nav/footer/menu text would otherwise survive into dedup
    // shingles and quality stats. Documents with no kept content block
    // drop here (the funnel report narrates the cut).
    val raw =
      if (!fromHtml) input
      else mat(input
        .join(TextOps.extractMainContent(input, idCol, textCol)
          .filter(col("n_kept") > 0).select(col(idCol), col("main_text")),
          Seq(idCol))
        .withColumn(textCol, col("main_text")).drop("main_text")
        .select(input.columns.map(col): _*))
    // opt-in boilerplate line cut (CCNet order: after extraction,
    // before normalize/quality) — a doc whose every content line is
    // boilerplate disappears here, like the extract stage's n_kept = 0
    val deboiled =
      if (boilerplateMaxDf <= 0) raw
      else mat(raw
        .join(DedupOps.cutBoilerplateLines(raw, idCol, textCol,
            boilerplateMaxDf)
          .select(col(idCol), col("clean_text")), Seq(idCol))
        .withColumn(textCol, col("clean_text")).drop("clean_text")
        .select(raw.columns.map(col): _*))
    // `normalize` is deliberately NOT a reported funnel stage: it is a
    // per-row rewrite that drops nothing, so its count equals its
    // predecessor's by construction — a report row would be noise
    val normalized = mat(deboiled.withColumn(textCol,
      TextOps.normalizeText(col(textCol))))
    val quality = mat(TextOps.qualityFilter(normalized, textCol, minWords,
        maxStopRatio, minAvgLen, maxAvgLen)
      .select(raw.columns.map(col): _*))
    val deduped = mat(IndexOps.dedupKeepFirst(quality, textCol, col(idCol)))
    val kept = TextOps.classifierScore(deduped, idCol, textCol, weights,
        bias = bias, threshold = threshold)
      .filter(col("keep")).select(idCol)
    val classified = mat(deduped.join(kept, Seq(idCol)))
    val sampled = SampleOps.hashSample(classified, col(idCol),
      sampleNum, sampleDen)
    val head =
      Seq("raw" -> preUrl) ++ urlStages ++
        (if (fromHtml) Seq("extract" -> raw) else Nil) ++
        (if (boilerplateMaxDf > 0) Seq("boilerplate" -> deboiled) else Nil)
    head ++ Seq("quality" -> quality, "dedup" -> deduped,
      "classifier" -> classified, "sample" -> sampled)
  }

  /** The funnel's surviving documents (all stages applied). */
  def curate(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, mat: Materializer = Materializer.Inline,
      urlCol: String = null, blockedDomains: Seq[String] = Nil,
      boilerplateMaxDf: Int = 0, fromHtml: Boolean = false): DataFrame =
    stages(df, idCol, textCol, weights, mat = mat, urlCol = urlCol,
      blockedDomains = blockedDomains,
      boilerplateMaxDf = boilerplateMaxDf, fromHtml = fromHtml).last._2

  /** Per-stage survivor counts: `(stage_ord, stage, n_docs)` — ordinal
    * first so the report sorts stably. Pass `urlCol` (web corpora) to
    * run — and report — the URL stages first: `domain_block`,
    * `url_dedup`, then the text stages; `fromHtml` adds the `extract`
    * stage between them and the boilerplate/quality tail (the complete
    * nine-stage CCNet order when everything is on). */
  def funnel(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, mat: Materializer = Materializer.Inline,
      urlCol: String = null, blockedDomains: Seq[String] = Nil,
      boilerplateMaxDf: Int = 0, fromHtml: Boolean = false): DataFrame =
    stages(df, idCol, textCol, weights, mat = mat, urlCol = urlCol,
      blockedDomains = blockedDomains,
      boilerplateMaxDf = boilerplateMaxDf, fromHtml = fromHtml).zipWithIndex.map {
      case ((name, frame), i) =>
        frame.agg(count(lit(1)).as("n_docs"))
          .select(lit(i + 1).cast("long").as("stage_ord"),
            lit(name).as("stage"), col("n_docs"))
    }.reduce(_ unionByName _)
}
