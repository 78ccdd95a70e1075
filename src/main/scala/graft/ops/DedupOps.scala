package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Deduplication operators for training-data pipelines: exact, MinHash/LSH,
  * SimHash, and n-gram Jaccard (north-star extension, SURVEY.md §7.1 step 6).
  *
  * Scale posture (the 100 TB contract):
  *  - exact dedup is one hash-aggregate shuffle on the content key;
  *  - per-document sketches (MinHash signatures, SimHash) are computed by
  *    one-pass codegen kernels — MAP-ONLY, the corpus is never exploded
  *    or aggregated to build them (round-3 used explode + hash-aggregate;
  *    the kernels removed those exchanges, equivalence spec-pinned);
  *  - pair generation always goes through an inverted index (shingle or
  *    LSH-band bucket join), never a cross join; hot buckets are capped by
  *    `maxDf` (drop shingles/bands occurring in more than maxDf docs — the
  *    standard df-cut that bounds the quadratic term at web scale);
  *  - candidate verification is candidate-sized: per-pair array intersects
  *    over semi-filtered per-doc arrays, or the postings join where the
  *    caller already holds postings;
  *  - all hashes are exact integer arithmetic (TextOps.charHash) so the
  *    DuckDB oracle reproduces results exactly.
  */
object DedupOps {
  import TextOps.{RehashP, charHash, wordShingles}

  // named `logger`, not `log`: functions.log(base, col) shadows otherwise
  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact duplicate groups by content: one row per distinct text with the
    * canonical (minimum) id and the duplicate count. One hash aggregate;
    * by default the group key is `xxhash64(text)` so the map-side partial
    * aggregates shuffle an 8-byte key instead of the document — at 100 TB
    * the shuffle shrinks by the mean document size. The trade is the
    * 64-bit collision bound (~N²/2⁶⁵: ~3% chance of ONE conflated pair at
    * 10⁹ docs); pass `hashKey = false` for the byte-exact key.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String,
      hashKey: Boolean = true): DataFrame = {
    val key = if (hashKey) xxhash64(col(textCol)) else col(textCol)
    df.groupBy(key.as("__graft_key"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))
  }

  /** Rows surviving exact dedup: the canonical (min-id) row per text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    IndexOps.dedupKeepFirst(df, textCol, col(idCol))

  /** Chunk-level (paragraph/line-granularity) dedup, CCNet-style: split
    * every document into non-overlapping `chunkTokens`-token windows,
    * keep only the globally FIRST occurrence of each distinct chunk
    * (ordered by (id, chunk_idx)), and reassemble each document from its
    * surviving chunks. This is the operator that strips boilerplate
    * repeated across a crawl — headers, navigation, license blocks —
    * which document-level dedup cannot see. Documents whose every chunk
    * is a repeat disappear from the output (they contribute nothing).
    *
    * Output: (id, clean_text, n_chunks_kept, n_tokens_kept).
    *
    * Shape: chunking is map-only; first-occurrence is ONE hash aggregate
    * on the chunk key whose partial min combines map-side (the exchange
    * carries one row per distinct chunk per partition, not one per
    * chunk), then a co-partitioned join back; reassembly is one per-doc
    * aggregate whose `array_sort` pins chunk order against collect_list
    * nondeterminism. No window, no sort exchange anywhere.
    *
    * The occurrence ordinal is the packed long `id * 2^20 + chunk_idx`
    * so the min is a plain long aggregate (a `min(struct(...))` plans as
    * SortAggregate — struct keys are not hash-aggregable): ids must be
    * non-negative integral and docs shorter than 2^20 chunks (require'd
    * cheaply: ids are checked against 2^43 at runtime by the packing
    * itself only when violated — callers with string ids should map
    * them to longs first, as every id-packing op here documents).
    * `hashKey` mirrors [[exactDupGroups]]: the default shuffles an
    * 8-byte `xxhash64(chunk)` key; `false` shuffles chunk text for the
    * byte-exact key (the oracle form).
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, hashKey: Boolean = true): DataFrame = {
    val chunks = TextOps.chunkDocuments(df, idCol, textCol, chunkTokens)
    val key = if (hashKey) xxhash64(col("chunk_text")) else col("chunk_text")
    val ord = col(idCol).cast("long") * (1L << 20) + col("chunk_idx")
    val tagged = chunks.withColumn("__key", key).withColumn("__ord", ord)
    val winners = tagged.groupBy(col("__key"))
      .agg(min(col("__ord")).as("__w"))
    tagged.join(winners, Seq("__key"))
      .filter(col("__ord") === col("__w"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
            c => c.getField("chunk_text")),
          " ").as("clean_text"),
        count(lit(1)).as("n_chunks_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"))
  }

  /** WITHIN-document repeated-chunk removal — the per-doc half of
    * CCNet-style chunk dedup: split each document into non-overlapping
    * `chunkTokens`-token chunks and keep only the FIRST occurrence of
    * each distinct chunk inside that document (navigation blocks, menu
    * repeats, copy-pasted paragraphs). Unlike [[chunkDedup]] (global
    * first occurrence — one corpus-wide aggregate), this op needs no
    * cross-row state at all: chunking, `array_distinct` (order-
    * preserving, first occurrence wins), and re-join all happen inside
    * one row — MAP-ONLY, zero shuffle, scan-bandwidth-bound at 100 TB.
    * Run it BEFORE the global pass: it shrinks what the corpus-wide
    * aggregate must shuffle.
    *
    * Output: (id, clean_text, n_chunks, n_chunks_kept).
    */
  def dedupChunksWithinDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .withColumn("__nc", when(col("__n") <= chunkTokens, lit(1))
        .otherwise(((col("__n") - 1) / chunkTokens).cast("int") + 1))
    // chunks built from ATTRIBUTE references (materialized columns), so
    // the interpreted HOF evaluates the token array once per row, not
    // once per chunk (the round-6 interpreted-HOF trap)
    base
      .withColumn("__chunks", transform(sequence(lit(0), col("__nc") - 1),
        i => concat_ws(" ",
          slice(col("__ws"), i * chunkTokens + 1, lit(chunkTokens)))))
      .withColumn("__kept", array_distinct(col("__chunks")))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        col("__nc").cast("long").as("n_chunks"),
        size(col("__kept")).cast("long").as("n_chunks_kept"))
  }

  /** Frequency-CUT boilerplate line removal — the third member of the
    * line/chunk family, with REMOVE-ALL semantics the other two lack:
    * a NEWLINE-delimited line whose text occurs in MORE than `maxDf`
    * distinct documents is boilerplate ("© 2024 Example", cookie
    * banners, nav menus) and is cut from EVERY document — including its
    * first occurrence, which [[chunkDedup]]'s keep-first would enshrine
    * in one arbitrary host doc. Lines in ≤ `maxDf` docs (the content)
    * survive untouched, intra-doc repeats included — genuine repetition
    * inside a doc is [[dedupChunksWithinDocs]]' job, and legitimate
    * cross-doc quotes below the threshold are content, not template.
    * EMPTY / whitespace-only lines are STRUCTURE, not content: they are
    * never keyed, never cut, and survive in place (cutting them would
    * collapse paragraph breaks corpus-wide since the empty line's df is
    * always maximal). "Whitespace-only" is the ASCII class minus the
    * delimiter — space, tab, CR, FF, VT ([[blankLine]]) — so a CRLF
    * corpus's `"\r"` blank lines and a tab-indented `"\t"` blank are
    * structure too, not one corpus-wide hot key (r17 cut them, first
    * occurrences included, collapsing every CRLF paragraph break; the
    * r18 fix). A document whose every non-empty line is cut disappears
    * (nothing left — the family convention).
    *
    * Output: (id, clean_text, n_lines_kept, n_lines_cut) — clean_text
    * rejoined with `\n` in original line order.
    *
    * Shape: the split/explode is map-only; the df count is the house
    * TWO-LEVEL (key, doc) → key aggregate (per-doc line repeats
    * collapse map-side, df is a plain count — and deliberately COUNTS
    * DOCS, not occurrences, so a 1000-repeat inside one doc cannot fake
    * corpus-wide boilerplate); the > maxDf hot set is boilerplate-sized
    * (tiny by definition) and removes by BROADCAST anti-join — the
    * df-cut discipline ([[ngramJaccardPairs]]); reassembly is one
    * per-doc sort-pinned collect. `hashKey` mirrors [[exactDupGroups]]:
    * the default shuffles an 8-byte `xxhash64(line)` key, `false` the
    * line bytes (the oracle form). No windows, no cartesian; at 100 TB
    * the exchange carries one row per distinct line per partition.
    */
  /** True when a split-out line is blank STRUCTURE for the boilerplate
    * family: nothing but ASCII whitespace — space, tab, CR, FF, VT
    * (`\n` cannot appear; it is the split delimiter). Deliberately NOT
    * `trim(x) === ""` (Spark/DuckDB `trim` strips SPACES only, so a
    * CRLF corpus's `"\r"` lines read as content — one key whose df is
    * ~every doc, cut corpus-wide) and NOT a `^\s*$` regex (Java's `$`
    * matches before a trailing line terminator, RE2's does not — a
    * lone U+2028 line would diverge between the engines). `translate`
    * has identical semantics on both engines, so the oracle replays it
    * exactly: `translate(line, ' '||chr(9)||chr(13)||chr(12)||chr(11),
    * '') = ''`. */
  private def blankLine(line: Column): Column =
    translate(line, " \t\r\f\u000B", "") === ""

  def cutBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int, hashKey: Boolean = true): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("__idx", "__line")))
    val key = if (hashKey) xxhash64(col("__line")) else col("__line")
    val keyed = lines.withColumn("__key", key)
      .withColumn("__blank", blankLine(col("__line")))
    val hot = CapTelemetry.observeCap(
        keyed.filter(!col("__blank"))
          .groupBy(col("__key"), col(idCol)).agg(count(lit(1)).as("__n1"))
          .groupBy("__key").agg(count(lit(1)).as("__df")),
        "boilerplate_line_cut", col("__df"), maxDf, routine = true)
      .filter(col("__df") > maxDf).select("__key")
    keyed.join(broadcast(hot), Seq("__key"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__idx"), col("__line")))),
            l => l.getField("__line")),
          "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"),
        // at least one surviving CONTENT line, or the doc disappears
        // (blank lines are structure — they cannot carry a doc alone)
        max(when(col("__blank"), lit(0)).otherwise(lit(1))).as("__has"))
      .filter(col("__has") === 1)
      .join(
        lines.groupBy(col(idCol)).agg(count(lit(1)).as("__total")),
        Seq(idCol))
      .select(col(idCol), col("clean_text"), col("n_lines_kept"),
        (col("__total") - col("n_lines_kept")).as("n_lines_cut"))
  }

  /** The standing line-df index for INCREMENTAL boilerplate cutting:
    * one row per distinct non-blank line with its document frequency —
    * what [[cutBoilerplateAgainstIndex]] consumes and folds. `hashKey`
    * mirrors [[cutBoilerplateLines]] (8-byte `xxhash64(line)` key by
    * default; `false` stores line bytes, the oracle form — pick ONE for
    * the life of an index). Output: (line_key, df). */
  def boilerplateLineIndex(df: DataFrame, idCol: String, textCol: String,
      hashKey: Boolean = true): DataFrame = {
    val lines = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\n", -1)).as("__line"))
      .filter(!blankLine(col("__line")))
    val key = if (hashKey) xxhash64(col("__line")) else col("__line")
    lines.withColumn("line_key", key)
      .groupBy(col("line_key"), col(idCol)).agg(count(lit(1)).as("__n1"))
      .groupBy("line_key").agg(count(lit(1)).as("df"))
  }

  /** Incremental boilerplate-line cut of a NEW batch against a STANDING
    * line-df index ([[boilerplateLineIndex]] persisted and folded per
    * batch) — the daily-ingest form: a line is cut from the new docs
    * when its COMBINED document frequency (standing + this batch)
    * exceeds `maxDf`. The standing corpus is immutable — a line that
    * crosses the threshold today is cut from today's docs onward, never
    * retro-cut from published history (the same forward-only contract
    * every against-index op here carries); re-running the batch
    * CUMULATIVELY after folding would double-count, so fold exactly
    * once per epoch (the staged-fold gates' job). Blank lines are
    * structure and pass, as in [[cutBoilerplateLines]]. Returns
    * (cleaned batch docs in [[cutBoilerplateLines]]' output shape,
    * the FOLDED index = standing + batch dfs) — publish the second,
    * keep the first. Shape: one two-level batch aggregate, one
    * batch-keyed outer join against the index (index side is
    * line-df-sized, not corpus-sized), the same broadcast hot-set cut.
    */
  def cutBoilerplateAgainstIndex(newDocs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, maxDf: Int,
      hashKey: Boolean = true): (DataFrame, DataFrame) = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val batchIdx = boilerplateLineIndex(newDocs, idCol, textCol, hashKey)
    val folded = batchIdx.select(col("line_key"), col("df"))
      .unionByName(index.select(col("line_key"), col("df")))
      .groupBy("line_key").agg(sum(col("df")).as("df"))
    val lines = newDocs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("__idx", "__line")))
    val key = if (hashKey) xxhash64(col("__line")) else col("__line")
    val keyed = lines.withColumn("line_key", key)
      .withColumn("__blank", blankLine(col("__line")))
    val hot = CapTelemetry.observeCap(folded, "boilerplate_line_cut_inc",
        col("df"), maxDf, routine = true)
      .filter(col("df") > maxDf).select("line_key")
    val cleaned = keyed
      .join(broadcast(hot), Seq("line_key"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__idx"), col("__line")))),
            l => l.getField("__line")),
          "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"),
        max(when(col("__blank"), lit(0)).otherwise(lit(1))).as("__has"))
      .filter(col("__has") === 1)
      .join(lines.groupBy(col(idCol)).agg(count(lit(1)).as("__total")),
        Seq(idCol))
      .select(col(idCol), col("clean_text"), col("n_lines_kept"),
        (col("__total") - col("n_lines_kept")).as("n_lines_cut"))
    (cleaned, folded)
  }

  /** Duplicated-passage detection — the exact-substring half of the
    * Lee et al. pipeline ("Deduplicating Training Data Makes Language
    * Models Better", ACL 2022, suffix-array ExactSubstr), re-expressed
    * at word-window granularity: every `winTokens`-word window starting
    * at a stride-multiple offset is a candidate passage; a passage that
    * occurs in at least `minDocs` distinct documents is a duplicated
    * passage (cross-document boilerplate, licence blocks, templated
    * spans). `stride = 1` (the default) is exhaustive at word
    * granularity — a cross-doc repeat of >= winTokens words is always
    * caught because EVERY window inside it is shared; `stride > 1`
    * trades recall at the window-alignment boundary for a 1/stride
    * cheaper explode (the usual approximation when the corpus side is
    * huge — note a repeat is then found only when its occurrences start
    * at offsets congruent mod stride).
    *
    * Output: (passage, n_docs, n_occurrences, first_doc = min id).
    *
    * Shape: window build is map-only via the one-pass codegen kernel
    * [[graft.functions.WindowPassages]] (the composed
    * `transform(sequence, i => concat_ws(slice(ws, i, win)))` form
    * re-evaluates the split per window — the interpreted-HOF trap,
    * O(words²) per doc; measured 4× on this query at sf0.1); then a
    * TWO-LEVEL hash aggregate,
    * (key, doc) then key — per-doc repeats collapse map-side and
    * `n_docs` is a plain count, never a `countDistinct` expand. By
    * default the aggregate key is `xxhash64(passage)` (8-byte shuffle
    * key; the passage text rides along as a `min` that partial-combines
    * to one string per distinct key per partition) with the same
    * collision bound as [[exactDupGroups]]; `hashKey = false` keys by
    * the passage bytes (the oracle form). No windows, no joins.
    */
  def duplicatedPassages(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int, stride: Int = 1, minDocs: Int = 2,
      hashKey: Boolean = true): DataFrame = {
    require(winTokens >= 1, s"winTokens must be >= 1, got $winTokens")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val passages =
      graft.functions.exprs.windowPassages(col(textCol), winTokens, stride)
    val exploded = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__sid"), explode(passages).as("passage"))
    val key = if (hashKey) xxhash64(col("passage")) else col("passage")
    exploded
      .groupBy(key.as("__key"), col("__sid"))
      .agg(min(col("passage")).as("passage"), count(lit(1)).as("__n"))
      .groupBy(col("__key"))
      .agg(min(col("passage")).as("passage"),
        count(lit(1)).as("n_docs"), sum(col("__n")).as("n_occurrences"),
        min(col("__sid")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .select(col("passage"), col("n_docs"), col("n_occurrences"),
        col("first_doc"))
  }

  /** EXACT duplicated passages at stride 1, cost-bounded by TWO-LEVEL
    * hashing — the priced exactness option the stride dial lacked
    * ([[passageRecall]] documents span recall ≈ 1/stride at minimal
    * repeat lengths; this op has recall 1.0 BY CONSTRUCTION with a
    * bounded cost instead of [[duplicatedPassages]]' stride-1 string
    * explode):
    *
    *  - level 1 enumerates every word window as its 61-bit rolling HASH
    *    (the [[graft.functions.HashKernels.shingleHashes]] kernel — one
    *    text pass, no window strings materialized): 8 bytes per window
    *    through the shuffle instead of ~6·winTokens bytes;
    *  - candidate filter: hash values seen in ≥ `minDocs` docs. A true
    *    repeated passage ALWAYS shares its hash (no false negatives);
    *    collisions only over-admit candidates;
    *  - level 2 re-materializes passage BYTES only at candidate
    *    offsets (array-slice of the token array) and aggregates by the
    *    exact string — collision-admitted candidates die here, so the
    *    output is byte-exact, not hash-exact.
    *
    * Output matches [[duplicatedPassages]]: (passage, n_docs,
    * n_occurrences, first_doc). Scale shape: one map-only long explode,
    * one hash aggregate, one candidate-sized semi-join + slice, one
    * exact aggregate — candidate volume is the duplicated mass, not the
    * corpus.
    *
    * Measured trade (StressR16 `passages`, 500k docs, local[32]): on a
    * DUP-FREE corpus level 2 prunes to zero and the two plans tie
    * (5.5 s vs 7.0 s at win=6); on an ALL-dup corpus the join-back
    * costs ~3× the plain string aggregate (11 s vs 3 s). The byte
    * advantage (8 B/window vs ~6·winTokens B through the exchange) is
    * a NETWORK-shuffle argument a hot-page-cache single node cannot
    * show — prefer this plan when the exchange is network- or
    * spill-bound (wide windows, real clusters); prefer
    * [[duplicatedPassages]](stride=1, hashKey=true)'s one aggregate
    * when shuffles are local or the corpus is duplicate-heavy. */
  def duplicatedPassagesExact(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int, minDocs: Int = 2,
      mat: Materializer = Materializer.Local): DataFrame = {
    require(winTokens >= 1, s"winTokens must be >= 1, got $winTokens")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val base = df.filter(col(textCol).isNotNull)
    val h1 = base.select(col(idCol).as("__sid"),
      posexplode(graft.functions.exprs.shingleHashes(col(textCol), winTokens))
        .as(Seq("__off", "__h")))
    // two-level (key, doc) → key aggregate — the op family's house
    // shape: per-doc window repeats collapse map-side and the doc count
    // is a plain count, never a countDistinct expand
    val hot = h1.groupBy(col("__h"), col("__sid"))
      .agg(count(lit(1)).as("__n1"))
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs).select("__h")
    val cand = mat(h1.join(hot, Seq("__h")).select("__sid", "__off"))
    val passages = base
      .select(col(idCol).as("__sid"), TextOps.tokens(col(textCol)).as("__ws"))
      .join(cand, Seq("__sid"))
      .select(col("__sid"),
        array_join(slice(col("__ws"), col("__off") + 1, lit(winTokens)), " ")
          .as("passage"))
    passages.groupBy(col("passage"), col("__sid"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("passage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_occurrences"),
        min(col("__sid")).as("first_doc"))
      // re-filter on the EXACT key: hash-collision candidates that do
      // not actually repeat across minDocs docs die here
      .filter(col("n_docs") >= minDocs)
      .select("passage", "n_docs", "n_occurrences", "first_doc")
  }

  /** Distinct (id, shingle-hash) pairs — the inverted-index edge list
    * that every near-dup operator below shares. Per-doc dedup happens in
    * the array (`array_distinct`) BEFORE the explode, so building the
    * postings is map-only — no shuffle at all (a global `.distinct()`
    * would shuffle the whole edge list for rows that are already unique
    * within each document).
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("sid"),
        explode(array_distinct(graft.functions.exprs.shingleHashes(col(textCol), k))).as("sh"))

  /** The df-cut inverted index both n-gram pair generators share,
    * split into the NARROW postings `(sid, sh)` that feed the self-join
    * and the per-doc post-cut sizes `(sid, n_sh)` the callers join back
    * AFTER their pair aggregate — at sf0.1 the n_sh ride-along was a
    * third of the self-join's exchange bytes for a value that is
    * functionally dependent on sid (interleaved medians 2.21 → 1.99 s
    * on the Jaccard chain; the post-agg join touches only the
    * pair-table, and at 100 TB postings ≫ docs so the saving grows).
    *
    * r21 shape (broadcast path): the hot (> maxDf docs) shingle set —
    * boilerplate-sized by definition — rides a scalar-subquery ARRAY
    * and the cut is a map-only `array_except` on the per-doc
    * shingle-array kernel; `n_sh` is `size()` of the same cached
    * array. This removes BOTH post-cut exchanges the r6 form paid: the
    * postings anti-join AND the `Window.partitionBy(sid)` size
    * shuffle+sort (subtree plans in plans/r21). Only the ARRAYS
    * materialize (checkpoint barrier) — deriving explode/size in the
    * same un-materialized plan re-evaluates the kernel per reference
    * (measured ~5% SLOWER than the r6 shape; the barrier form is ~12%
    * faster). `broadcastHotSet = false` keeps the r6 anti-join cut for
    * a pathological maxDf whose over-the-cut set is too big to ship as
    * one array (sizes there come from one aggregate over the
    * materialized cut postings — the r6 window is gone on both paths).
    */
  private final case class CutPostings(postings: DataFrame, sizes: DataFrame)

  private def dfCutPostingsWithSizes(df: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Int, mat: Materializer,
      broadcastHotSet: Boolean, matPostings: Boolean): CutPostings = {
    if (broadcastHotSet) {
      val raw = shingleHashes(df, idCol, textCol, k)
      val hot = CapTelemetry.observeCap(
          raw.groupBy("sh").agg(count(lit(1)).as("df_cnt")),
          "ngram_df_cut", col("df_cnt"), maxDf, routine = true)
        .filter(col("df_cnt") > maxDf).select("sh")
      val hotArr = hot.agg(collect_list(col("sh")).as("hs"))
      // array_except dedups like the explode(array_distinct(...)) of
      // shingleHashes, so (sid, sh) rows and n_sh match the anti-join
      // form exactly
      val arrs = mat(df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("sid"),
          array_except(graft.functions.exprs.shingleHashes(col(textCol), k),
            coalesce(hotArr.scalar(), array().cast("array<bigint>")))
            .as("__sharr")))
      CutPostings(
        arrs.select(col("sid"), explode(col("__sharr")).as("sh")),
        arrs.select(col("sid"), size(col("__sharr")).cast("long").as("n_sh"))
          .filter(col("n_sh") > 0))
    } else {
      val raw = shingleHashes(df, idCol, textCol, k)
      val postings = if (matPostings) mat(raw) else raw
      val hot = CapTelemetry.observeCap(
          postings.groupBy("sh").agg(count(lit(1)).as("df_cnt")),
          "ngram_df_cut", col("df_cnt"), maxDf, routine = true)
        .filter(col("df_cnt") > maxDf).select("sh")
      val cut = mat(postings.join(hot, Seq("sh"), "left_anti"))
      CutPostings(cut,
        cut.groupBy("sid").agg(count(lit(1)).as("n_sh")))
    }
  }

  /** Persist an intermediate when asked. The postings/signatures below
    * feed 3-4 consumers each; measured on local[32] at test scale,
    * recomputing them (codegen'd hashing over a hot page cache) beats the
    * persist's materialization barrier + serialization by ~2x — so the
    * default is OFF. On a real cluster, where the upstream is a 100 TB
    * scan, flip `persistIntermediates` on (or checkpoint the postings to
    * parquet, the durable variant of the same trade).
    */
  private def maybePersist(df: DataFrame, on: Boolean): DataFrame =
    if (on) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else df

  /** Exact n-gram Jaccard pairs via PREFIX-FILTERED inverted index (the
    * AllPairs idiom — Bayardo, Ma & Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW 2007): only each doc's first
    * |d| − ⌈t·|d|⌉ + 1 sorted shingles are exploded and self-joined
    * (if all common elements sat outside a side's prefix they would
    * number ≤ ⌈t·|d|⌉ − 1 < ⌈t·|d|⌉ ≤ |∩|, so the smallest common
    * element is in BOTH prefixes — recall-lossless), and the candidate
    * pairs are verified with per-pair `array_intersect` over map-only
    * per-doc arrays. No window, no postings aggregate, nothing
    * corpus-sized shuffled by shingle.
    *
    * MEASURED TRADE vs [[ngramJaccardPairs]] (the full-join default):
    * with value-ordered prefixes (order is free — no global df pass) the
    * prefix prunes ~(1−t)² of candidate GENERATION but every surviving
    * candidate pays an O(|a|+|b|) array intersect, where the full join
    * counts common shingles at one aggregate row each. On the planted
    * near-dup corpus at t=0.5 that nets ~1.5x SLOWER (5.9s vs 3.4s at
    * sf0.1) — overlapping pairs here are mostly real near-dups, so
    * candidate pruning saves little. Prefer this form for HIGH
    * thresholds / low-overlap corpora (t=0.8+ prunes 24/25 of the
    * quadratic term); the published rare-first (df-ascending) ordering
    * would prune far better but needs a postings ⋈ df join + per-doc
    * re-sort — two more corpus-sized shuffles — before it starts.
    */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minJaccard: Double = 0.5, maxDf: Int = 1000,
      mat: Materializer = Materializer.Local,
      broadcastHotSet: Boolean = true): DataFrame = {
    val postings = shingleHashes(df, idCol, textCol, k)
    val hot = CapTelemetry.observeCap(
        postings.groupBy("sh").agg(count(lit(1)).as("df_cnt")),
        "ngram_df_cut", col("df_cnt"), maxDf, routine = true)
      .filter(col("df_cnt") > maxDf)
    // `broadcastHotSet = false` escape hatch: a corpus where a tiny
    // maxDf makes the over-the-cut set too big to ship as one array
    // falls back to the anti-join form of the cut
    // the n_sh > 0 cut happens AFTER materialization: placed above the
    // projection it would be pushed below it and re-run the shingle
    // kernel per row (under Inline the double evaluation remains — the
    // caller opted out of materialization)
    val arrays = mat(
      if (broadcastHotSet) {
        val hotArr = hot.agg(collect_list(col("sh")).as("hs"))
        df.filter(col(textCol).isNotNull &&
            size(split(col(textCol), " ")) >= k)
          .withColumn("__hot", hotArr.scalar())
          .select(col(idCol).as("sid"),
            array_sort(array_except(
              graft.functions.exprs.shingleHashes(col(textCol), k),
              coalesce(col("__hot"), array().cast("array<bigint>")))).as("sharr"))
          .withColumn("n_sh", size(col("sharr")).cast("long"))
      } else {
        postings.join(hot.select("sh"), Seq("sh"), "left_anti")
          .groupBy(col("sid"))
          .agg(sort_array(collect_list(col("sh"))).as("sharr"),
            count(lit(1)).as("n_sh"))
      }).filter(col("n_sh") > 0)
    // prefix length |d| − ⌈t·|d|⌉ + 1 (ceil on doubles is safe: n·t is
    // far below 2^53; a longer prefix would only add candidates)
    val prefLen = (col("n_sh") - ceil(col("n_sh") * minJaccard).cast("long") + 1)
      .cast("int")
    val pref = arrays.select(col("sid"), col("sharr"), col("n_sh"),
      explode(slice(col("sharr"), lit(1), prefLen)).as("sh"))
    val cands = pref.select(col("sid").as("id_a"), col("sh"))
      .join(pref.select(col("sid").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(arrays.select(col("sid").as("id_a"), col("sharr").as("arr_a"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(arrays.select(col("sid").as("id_b"), col("sharr").as("arr_b"),
        col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("n_common",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** Exact n-gram Jaccard similar pairs via inverted-index join — the
    * DEFAULT form: full postings self-join with the common-shingle count
    * taken by aggregate. intersection(a,b) = #common shingle hashes,
    * union = |a|+|b|−inter; emits pairs with jaccard >= minJaccard
    * (id_a < id_b). `maxDf` drops shingles in more than that many docs
    * first — the df-cut that keeps the self-join near-linear on
    * power-law corpora — applied as a broadcast ANTI-join against the
    * (few) over-the-cut shingles, so the postings never shuffle by
    * shingle for the cut and hot-shingle skew never materializes
    * (`broadcastHotSet = false` is the escape hatch for a pathological
    * maxDf). Per-doc sizes ride along the surviving rows (one window by
    * doc id — groups bounded by a doc's shingle count) and the edge
    * list materializes once (per `mat`) so the self-join reads it
    * instead of recomputing per side. With `matPostings` (default on)
    * the RAW postings also materialize once, so the df-cut aggregate
    * and the anti-join probe share one shingle pass — re-measured at
    * round 6 (best-of-2, sf0.1): 3.0s vs 3.4s, and 2× better cold; the
    * earlier recompute-wins measurement predated the one-pass shingle
    * kernel. See [[ngramJaccardPairsPrefix]] for the AllPairs
    * prefix-filtered alternative and the measured trade between the two.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minJaccard: Double = 0.5, maxDf: Int = 1000,
      mat: Materializer = Materializer.Local,
      broadcastHotSet: Boolean = true,
      matPostings: Boolean = true): DataFrame = {
    val cp = dfCutPostingsWithSizes(df, idCol, textCol, k, maxDf,
      mat, broadcastHotSet, matPostings)
    // narrow self-join: (sid, sh) only; sizes join onto the pair-sized
    // aggregate afterwards (the verifyPairsJaccard shape)
    val a = cp.postings.select(col("sid").as("id_a"), col("sh"))
    val b = cp.postings.select(col("sid").as("id_b"), col("sh"))
    a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      .join(cp.sizes.select(col("sid").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(cp.sizes.select(col("sid").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** The REMOVAL half of ExactSubstr dedup (Lee et al., ACL 2022 cut
    * the duplicated substrings out of the corpus; [[duplicatedPassages]]
    * only reports them): every word position covered by a non-canonical
    * occurrence of a duplicated window (the window's text occurs ≥ 2
    * times corpus-wide, counting intra-document repeats; the canonical
    * occurrence = the globally first by (id, offset)) is cut, and each
    * document is rebuilt from its surviving words. Exactly one copy of
    * every duplicated span survives, in its first host document; a doc
    * whose every word is covered disappears (nothing left — same
    * convention as [[chunkDedup]]).
    *
    * Output: (id, clean_text, n_words_kept, n_words_cut).
    *
    * Shape: windows explode via the one-pass codegen kernel (stride is
    * fixed at 1 — masking needs every offset); duplicate detection is
    * ONE hash aggregate keyed by `xxhash64(window)` carrying (count,
    * min packed ordinal); covered positions explode only from DUPLICATE
    * occurrences (bounded by win × dup-occurrences, not the corpus);
    * reassembly is a per-doc sort-pinned collect, as in [[chunkDedup]].
    * No windows, no cartesian. The packed ordinal `id·2^20 + offset`
    * requires non-negative integral ids and docs under 2^20 words —
    * same contract as [[chunkDedup]].
    */
  def cutDuplicatedPassages(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int, hashKey: Boolean = true,
      mat: Materializer = Materializer.Local): DataFrame = {
    require(winTokens >= 1, s"winTokens must be >= 1, got $winTokens")
    val ws = TextOps.tokens(col(textCol))
    val base = df.filter(col(textCol).isNotNull)
    val occ = base.select(col(idCol).as("__sid"),
        posexplode(graft.functions.exprs.windowPassages(col(textCol), winTokens, 1))
          .as(Seq("__off", "__p")))
    val key = if (hashKey) xxhash64(col("__p")) else col("__p")
    val ord = col("__sid").cast("long") * (1L << 20) + col("__off")
    // the window explode feeds BOTH the duplicate-group aggregate and
    // the join-back probe — materialize it once (the heaviest stream in
    // the op; Catalyst would otherwise recompute the explode per branch)
    val tagged = mat(occ.withColumn("__key", key).withColumn("__ord", ord))
    val groups = tagged.groupBy(col("__key"))
      .agg(count(lit(1)).as("__cnt"), min(col("__ord")).as("__w"))
    val dupOcc = tagged.join(groups, Seq("__key"))
      .filter(col("__cnt") >= 2 && col("__ord") =!= col("__w"))
      .select(col("__sid"), col("__off"))
    val covered = dupOcc
      .select(col("__sid"), explode(
        sequence(col("__off"), col("__off") + (winTokens - 1))).as("__pos"))
      .distinct()
    val toks = base.select(col(idCol).as("__sid"),
      posexplode(ws).as(Seq("__pos", "__w")))
    toks.join(covered, Seq("__sid", "__pos"), "left_anti")
      .groupBy(col("__sid"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__w")))),
          c => c.getField("__w")), " ").as("clean_text"),
        count(lit(1)).as("n_words_kept"))
      .join(base.select(col(idCol).as("__sid"),
        size(ws).cast("long").as("__n")), Seq("__sid"))
      .select(col("__sid").as(idCol), col("clean_text"), col("n_words_kept"),
        (col("__n") - col("n_words_kept")).as("n_words_cut"))
  }

  /** The full ExactSubstr production recipe (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022): detect
    * duplicated passages, cut every non-canonical occurrence
    * ([[cutDuplicatedPassages]]), then EXACT-dedup the cleaned
    * documents — cutting collapses documents that differed only in
    * their duplicated spans into byte-identical residues (two articles
    * wrapping different boilerplate around the same body), which only
    * a post-cut exact pass can remove. Docs cut to nothing vanish in
    * the cut stage; ties keep the min id.
    *
    * Scale shape = the two composed stages' shapes back to back: the
    * cut's two-level hash aggregate + bounded covered-position explode,
    * then one keep-first window partitioned by the cleaned text (never
    * partition-less). Output: (id, clean_text, n_words_kept,
    * n_words_cut), one canonical row per distinct cleaned text.
    */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int, hashKey: Boolean = true,
      mat: Materializer = Materializer.Local): DataFrame = {
    val cut = cutDuplicatedPassages(df, idCol, textCol, winTokens, hashKey, mat)
    IndexOps.dedupKeepFirst(cut, "clean_text", col(idCol))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: directed (id_a → id_b) rows
    * where containment(a→b) = |S(a) ∩ S(b)| / |S(a)| ≥ `minContainment`
    * over the word-k-shingle sets — the detector for documents EMBEDDED
    * in others (quote expansions, templated supersets, article-plus-
    * boilerplate wrappers) that symmetric Jaccard structurally misses:
    * a 100-word doc inside a 10 000-word doc has Jaccard ≈ 0.01 but
    * containment 1.0 (Broder's resemblance-vs-containment distinction,
    * SEQUENCES 1997).
    *
    * Same inverted-index shape as [[ngramJaccardPairs]] (shared shingle
    * pass, df-cut via broadcast anti-join, postings equi-join on the
    * gram hash, per-pair intersection count): each UNORDERED candidate
    * is counted once and then evaluated in BOTH directions from that
    * one count, so the asymmetry costs nothing extra. The df-cut drops
    * ultra-hot shingles from numerator and denominator alike — the same
    * bounded-recall trade the Jaccard op documents.
    *
    * Output: (id_a, id_b, n_common, n_a, n_b, containment), one row per
    * DIRECTION that clears the threshold (id_a is the contained side).
    */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minContainment: Double = 0.8, maxDf: Int = 1000,
      mat: Materializer = Materializer.Local,
      broadcastHotSet: Boolean = true,
      matPostings: Boolean = true): DataFrame = {
    val cp = dfCutPostingsWithSizes(df, idCol, textCol, k, maxDf,
      mat, broadcastHotSet, matPostings)
    // narrow self-join: (sid, sh) only (the ngramJaccardPairs shape);
    // sizes attach to the pair-sized aggregate BEFORE materialization,
    // so both direction branches read (id_x, id_y, n_common, n_x, n_y)
    // from the cached frame — the posting self-join (the op's dominant
    // stage) still executes exactly once
    val a = cp.postings.select(col("sid").as("id_x"), col("sh"))
    val b = cp.postings.select(col("sid").as("id_y"), col("sh"))
    val unordered = mat(
      a.join(b, Seq("sh")).filter(col("id_x") < col("id_y"))
        .groupBy("id_x", "id_y").agg(count(lit(1)).as("n_common"))
        .join(cp.sizes.select(col("sid").as("id_x"), col("n_sh").as("n_x")), Seq("id_x"))
        .join(cp.sizes.select(col("sid").as("id_y"), col("n_sh").as("n_y")), Seq("id_y")))
    val fwd = unordered.select(col("id_x").as("id_a"), col("id_y").as("id_b"),
      col("n_common"), col("n_x").as("n_a"), col("n_y").as("n_b"))
    val rev = unordered.select(col("id_y").as("id_a"), col("id_x").as("id_b"),
      col("n_common"), col("n_y").as("n_a"), col("n_x").as("n_b"))
    fwd.unionByName(rev)
      .withColumn("containment", col("n_common").cast("double") / col("n_a"))
      .filter(col("containment") >= minContainment)
  }

  /** Benchmark decontamination: corpus documents sharing at least one
    * word k-gram with any benchmark/eval text — the n-gram overlap test
    * used to scrub training corpora against evaluation sets (13-gram in
    * the GPT-3/PaLM writeups; k is a parameter because short eval items
    * need smaller k). Returns (id, n_hits) where n_hits counts the doc's
    * DISTINCT contaminated k-grams; join back and anti-filter to drop.
    *
    * Scale shape: the benchmark side is eval-set sized (10³-10⁶ grams) —
    * its distinct hash set broadcasts, so the corpus side is one map-only
    * shingle explode + broadcast semi-join + per-doc count. The 100 TB
    * corpus is never shuffled (the count aggregate shuffles only hit
    * rows, bounded by |benchmark grams| × df).
    */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val corpusSh = shingleHashes(corpus, idCol, textCol, k)
    val benchSh = shingleHashes(benchmark, idCol, textCol, k)
      .select("sh").distinct()
    corpusSh.join(broadcast(benchSh), Seq("sh"))
      .groupBy(col("sid").as(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Span-level decontamination: instead of DROPPING a document that
    * shares word k-grams with the eval set ([[contaminationHits]] +
    * anti-join), surgically CUT the contaminated spans and keep the
    * rest — the scrub used when whole-doc removal would throw away a
    * long book over one quoted benchmark item. A word is removed iff
    * it is covered by at least one contaminated k-gram (the union of
    * hit windows `[pos, pos+k)`); adjacent/overlapping windows merge
    * into maximal spans.
    *
    * Output: every corpus row as (id, clean_text, n_spans, n_removed)
    * — `clean_text` is the text with removed words excised (single-
    * space retokenized, same convention as the shingle tokenizer;
    * uncontaminated docs pass through byte-identical), `n_spans` the
    * count of maximal merged spans, `n_removed` the word count cut.
    * A fully-contaminated doc yields `clean_text = ""` — filter
    * `n_removed`/length downstream rather than here, so the caller
    * sees what the scrub did (the audit row IS the point).
    *
    * Scale shape: the eval side's distinct gram hashes broadcast; the
    * corpus side is one map-only positional-shingle explode + broadcast
    * semi-join, ONE aggregate over hit windows only (bounded by
    * |benchmark grams| × df × k, never corpus-sized), and one key-sized
    * left join back to the corpus — the 100 TB corpus itself is never
    * shuffled. The window-merge is per-doc array arithmetic on the
    * collected removal set (contaminated docs only, ≤ words/doc longs).
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val corpusSh = corpus.select(col(idCol).as("__sid"),
      posexplode(graft.functions.exprs.shingleHashes(col(textCol), k)))
      .toDF("__sid", "__pos", "__sh")
    val benchSh = shingleHashes(benchmark, idCol, textCol, k)
      .select(col("sh").as("__sh")).distinct()
    // hit window [pos, pos+k) → covered word indices; collect_set dedups
    // overlapping windows, so one shuffle (hit rows only) builds the
    // per-doc removal set
    val removal = corpusSh.join(broadcast(benchSh), Seq("__sh"))
      .select(col("__sid"),
        explode(sequence(col("__pos"), col("__pos") + lit(k - 1))).as("__w"))
      .groupBy("__sid").agg(sort_array(collect_set(col("__w"))).as("__rm"))
    val joined = corpus.join(removal, col(idCol) === col("__sid"), "left")
    val rm = col("__rm")
    // a span starts at removal element i iff it is not the successor of
    // element i-1 (rm is sorted distinct); when() keeps element_at off
    // the i=0 branch
    val nSpans = size(filter(rm, (x, i) =>
      when(i === lit(0), lit(true))
        .otherwise(x =!= element_at(rm, i) + lit(1))))
    val cleanText = array_join(
      filter(split(col(textCol), " ", -1), (_, i) => !array_contains(rm, i)),
      " ")
    joined.select(
      (corpus.columns.map(col) ++ Seq(
        when(rm.isNull, col(textCol)).otherwise(cleanText).as("clean_text"),
        when(rm.isNull, lit(0L)).otherwise(nSpans.cast("long")).as("n_spans"),
        when(rm.isNull, lit(0L)).otherwise(size(rm).cast("long"))
          .as("n_removed"))): _*)
  }

  // --- hash-family stamping (HashKernels.FamilyId) -----------------------
  // A persisted hash-derived artifact (gram set, bloom bitmap, signature
  // index) replayed under a DIFFERENT hash family silently matches
  // nothing — the exact failure the graft_pq_residual stamp prevents for
  // PQ indexes. Producers below stamp the family id into column metadata
  // (survives the parquet round trip); index consumers REFUSE a
  // mismatched stamp and warn once on an unstamped legacy artifact.

  private def familyMeta: types.Metadata = new types.MetadataBuilder()
    .putString(graft.functions.HashKernels.FamilyStampKey,
      graft.functions.HashKernels.FamilyId).build()

  /** The hash-family stamp on `colName`, if the artifact carries one. */
  def hashFamilyOf(df: DataFrame, colName: String): Option[String] =
    df.schema.fields.find(_.name == colName).map(_.metadata)
      .filter(_.contains(graft.functions.HashKernels.FamilyStampKey))
      .map(_.getString(graft.functions.HashKernels.FamilyStampKey))

  private def requireFamily(df: DataFrame, colName: String, op: String): Unit =
    hashFamilyOf(df, colName) match {
      case Some(f) => require(f == graft.functions.HashKernels.FamilyId,
        s"$op: stored index was built with hash family '$f' but this " +
          s"library computes '${graft.functions.HashKernels.FamilyId}' — " +
          "its keys can never match; rebuild the index (a mismatched " +
          "replay silently matches nothing)")
      case None => logger.warn(s"$op: index column '$colName' carries no " +
        s"${graft.functions.HashKernels.FamilyStampKey} stamp (legacy " +
        s"artifact) — if it predates hash family " +
        s"'${graft.functions.HashKernels.FamilyId}' it will silently match " +
        "nothing; re-publish through the current builder to stamp it")
    }

  /** Publish a [[contaminationGramSet]] as a one-column parquet artifact
    * with the hash family stamped in column metadata. [[loadGramSet]] is
    * the refusing reader. */
  def publishGramSet(spark: org.apache.spark.sql.SparkSession,
      grams: Array[Long], path: String): Unit = {
    import spark.implicits._
    grams.toSeq.toDF("gram")
      .select(col("gram").as("gram", familyMeta))
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Read a published gram set, refusing a hash-family mismatch (and
    * warning on an unstamped legacy artifact). Returns the grams sorted,
    * ready for [[decontaminateSpansWithGrams]]. */
  def loadGramSet(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Long] = {
    val df = spark.read.parquet(path)
    requireFamily(df, "gram", "loadGramSet")
    val arr = df.select("gram").collect().map(_.getLong(0))
    java.util.Arrays.sort(arr)
    arr
  }

  /** Publish a [[bloomBitmap]] with the hash family stamped;
    * [[loadBloomBitmap]] is the refusing reader. */
  def publishBloomBitmap(spark: org.apache.spark.sql.SparkSession,
      bitmap: Array[Long], path: String): Unit = {
    import spark.implicits._
    Seq(bitmap.toSeq).toDF("bm")
      .select(col("bm").as("bm", familyMeta))
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Read a published bloom bitmap, refusing a hash-family mismatch. */
  def loadBloomBitmap(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Long] = {
    val df = spark.read.parquet(path)
    requireFamily(df, "bm", "loadBloomBitmap")
    df.head().getSeq[Long](0).toArray
  }

  /** The eval set's distinct k-gram hashes as a SORTED driver artifact —
    * the exact-membership analog of [[bloomBitmap]] (build once, publish,
    * reuse across jobs/micro-batches; no false positives, at the price
    * of the full set instead of a bitmap). Guarded at `maxGrams`
    * (default 16M ≈ 128 MB of longs — a deliberate dial, not a silent
    * truncation): past it, use [[bloomDecontaminate]] + exact re-check,
    * or raise the dial knowingly. Persist via [[publishGramSet]] /
    * [[loadGramSet]] — the stamped pair that survives hash-family
    * migrations with a refusal instead of a silent no-match.
    */
  def contaminationGramSet(benchmark: DataFrame, idCol: String,
      textCol: String, k: Int = 13, maxGrams: Long = 16L << 20): Array[Long] = {
    val sh = shingleHashes(benchmark, idCol, textCol, k)
      .select("sh").distinct()
    val cnt = sh.count()
    require(cnt <= maxGrams,
      s"eval gram set has $cnt distinct grams, over the driver-safe bound " +
        s"$maxGrams — raise maxGrams deliberately or use bloomDecontaminate")
    val arr = sh.collect().map(_.getLong(0))
    java.util.Arrays.sort(arr)
    arr
  }

  /** [[decontaminateSpans]] as a pure MAP against a prebuilt
    * [[contaminationGramSet]]: the gram set rides into the scan as one
    * array literal and each document is scrubbed by the codegen kernel
    * [[graft.functions.HashKernels.spanScrub]] — no join, no explode,
    * no exchange anywhere in the plan, so the op is legal in Structured
    * Streaming (scrub documents as they arrive) and costs exactly one
    * corpus scan at 100 TB. Output is bit-identical to
    * [[decontaminateSpans]] (spec- and oracle-pinned): same merged-span
    * semantics, same (…, clean_text, n_spans, n_removed) columns. */
  def decontaminateSpansWithGrams(corpus: DataFrame, grams: Array[Long],
      idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val sorted = grams.clone()
    java.util.Arrays.sort(sorted)
    val scrub = graft.functions.exprs.spanScrub(
      col(textCol), typedLit(sorted), k)
    corpus.withColumn("__scrub", scrub)
      .select((corpus.columns.map(col) ++ Seq(
        col("__scrub.clean_text").as("clean_text"),
        coalesce(col("__scrub.n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("__scrub.n_removed"), lit(0L)).as("n_removed"))): _*)
  }

  /** The eval-side mirror of [[contaminationHits]]: per BENCHMARK item,
    * how much of it leaked into the corpus. For each benchmark row,
    * `n_grams` = its distinct word k-grams, `n_covered` = how many of
    * those occur anywhere in the corpus, `coverage` = the ratio — the
    * "is this eval still trustworthy after this corpus ships" QA row
    * (an item at coverage 1.0 is memorizable from training data even
    * after doc-level scrubbing misses, e.g. via paraphrase docs that
    * share every gram across different documents).
    *
    * Scale shape: the corpus side is one map-only shingle explode +
    * broadcast semi-join against the eval gram set, then a DISTINCT on
    * the hit gram hashes — both bounded by |benchmark grams|, never
    * corpus-sized; the per-item rollup is eval-set-sized. The 100 TB
    * corpus is never shuffled. Items with fewer than k words report
    * n_grams = 0 with coverage 0.0 (too short to test, surfaced rather
    * than dropped).
    */
  def benchmarkCoverage(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 13): DataFrame = {
    val benchSh = shingleHashes(benchmark, idCol, textCol, k)
    val benchSet = benchSh.select("sh").distinct()
    val found = shingleHashes(corpus, idCol, textCol, k)
      .join(broadcast(benchSet), Seq("sh")).select("sh").distinct()
    val perItem = benchSh.join(broadcast(found.withColumn("__hit", lit(1))),
        Seq("sh"), "left")
      .groupBy(col("sid").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_covered"))
    benchmark.select(col(idCol)).join(perItem, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("n_covered").cast("double") / col("n_grams"))
          .as("coverage"))
  }

  /** [[contaminationHits]] without the join: the eval set's k-gram
    * hashes build a DETERMINISTIC bloom bitmap (probe j's position =
    * the minhash-j permutation of the gram hash, mod `2^log2m`), the
    * bitmap rides into the corpus scan as one scalar-subquery
    * `array<long>` literal, and each document is scored by a codegen'd
    * probe over its own gram array. The corpus side is therefore
    * MAP-ONLY — no join, no explode, no exchange, not even a per-doc
    * aggregate; the only shuffles are eval-set-sized (the bitmap
    * build). The price is bloom false POSITIVES (never negatives):
    * ~(q·probes/m)^probes per distinct gram for q eval grams, so
    * returned docs are a slight superset to re-check exactly or accept
    * (decontamination errs toward dropping). Deterministic modular
    * arithmetic end-to-end: the DuckDB oracle rebuilds the identical
    * bitmap, so results hash-match bit-for-bit.
    *
    * Output: (id, n_hits) with n_hits = DISTINCT flagged grams, rows
    * where n_hits >= 1 — same shape as [[contaminationHits]].
    *
    * Reference analog: tmdb_index.py has no decontamination; this is
    * part of the LLM-pipeline extension surface (SURVEY §2 extension).
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 13, probes: Int = 3,
      log2m: Int = 20): DataFrame = {
    val m = 1L << log2m
    bloomScore(corpus,
      bloomBitmapPlan(benchmark, idCol, textCol, k, probes, log2m).scalar(),
      idCol, textCol, k, probes, m)
  }

  /** The eval-set bloom bitmap as a driver value — build once, reuse
    * across jobs/micro-batches. This is the multi-job form of
    * [[bloomDecontaminate]]: at 100 TB the eval set is fixed while the
    * corpus arrives continuously, so the bitmap is a publishable
    * artifact (≤ 16 MiB of longs), and scoring against it
    * ([[bloomDecontaminateWithBitmap]]) is a plan LITERAL — legal in
    * Structured Streaming plans, where scalar subqueries are not.
    */
  def bloomBitmap(benchmark: DataFrame, idCol: String, textCol: String,
      k: Int = 13, probes: Int = 3, log2m: Int = 20): Array[Long] =
    bloomBitmapPlan(benchmark, idCol, textCol, k, probes, log2m)
      .head().getSeq[Long](0).toArray

  /** [[bloomDecontaminate]] against a prebuilt [[bloomBitmap]]: pure
    * map-only scoring, streaming-legal. `m` is implied by the bitmap
    * length; `k`/`probes` must match the build call. */
  def bloomDecontaminateWithBitmap(corpus: DataFrame, bitmap: Array[Long],
      idCol: String, textCol: String, k: Int = 13,
      probes: Int = 3): DataFrame = {
    // a power-of-two word count is the only shape bloomBitmap produces;
    // anything else (a truncated/corrupted published artifact) would
    // probe a DIFFERENT modulus than the build used — silent false
    // negatives on the op whose headline guarantee is "never misses"
    require(bitmap.nonEmpty && java.lang.Integer.bitCount(bitmap.length) == 1,
      s"bitmap length must be a power of two (got ${bitmap.length}) — " +
        "not a bloomBitmap-built artifact")
    bloomScore(corpus, typedLit(bitmap), idCol, textCol, k, probes,
      bitmap.length.toLong * 64L)
  }

  private def bloomBitmapPlan(benchmark: DataFrame, idCol: String,
      textCol: String, k: Int, probes: Int, log2m: Int): DataFrame = {
    require(probes >= 1 && probes <= 16, s"probes must be in [1,16], got $probes")
    // 2^27 bits = a 16 MiB bitmap literal — the broadcast ceiling; below
    // 2^6 the single word is all-ones for any real eval set
    require(log2m >= 6 && log2m <= 27, s"log2m must be in [6,27], got $log2m")
    val m = 1L << log2m
    val nWords = m >>> 6
    val posCols = minhashParams(probes).map { case (a, b) =>
      // reduce the 61-bit hash into the rehash field first: products
      // (h mod RehashP)·a stay < 2^60 (HashKernels.RehashP doc)
      ((col("sh") % RehashP * a + b) % RehashP) % m
    }
    val words = shingleHashes(benchmark, idCol, textCol, k)
      .select(explode(array(posCols: _*)).as("pos"))
      .select(shiftrightunsigned(col("pos"), 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
    // dense assembly is a codegen'd O(nWords + entries) scatter — a
    // map_from_entries + per-index element_at form would be
    // O(nWords × entries) (Catalyst map lookup is a linear scan),
    // minutes stalled in the one-row subquery task at log2m ≥ 24
    words.agg(collect_list(struct(col("w"), col("bits"))).as("entries"))
      .select(graft.functions.exprs.bitmapFromEntries(
        col("entries"), nWords.toInt).as("bm", familyMeta))
  }

  private def bloomScore(corpus: DataFrame, bitmap: Column, idCol: String,
      textCol: String, k: Int, probes: Int, m: Long): DataFrame =
    corpus.filter(col(textCol).isNotNull)
      .select(col(idCol), graft.functions.exprs.bloomHits(
        array_distinct(graft.functions.exprs.shingleHashes(col(textCol), k)),
        bitmap, probes, m).as("n_hits"))
      .filter(col("n_hits") >= 1)

  /** Fuzzy cross-corpus decontamination: near-duplicate pairs BETWEEN two
    * corpora (training docs that nearly duplicate an eval item survive
    * the exact [[contaminationHits]] test when lightly paraphrased; LSH
    * catches them). Runs banded MinHash-LSH over the union and keeps only
    * pairs with one side in each corpus. Ids must be distinct across the
    * two inputs (re-key first otherwise).
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, sides in different
    * corpora. Same scale shape as [[minhashDedupPairs]] — banded buckets,
    * capped, candidate-only verification.
    */
  def crossCorpusNearDups(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 16, k: Int = 3, bands: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    val tagged = a.select(col(idCol), col(textCol)).withColumn("__graft_src", lit(0))
      .unionByName(b.select(col(idCol), col(textCol)).withColumn("__graft_src", lit(1)))
    val tags = tagged.select(col(idCol), col("__graft_src"))
    minhashDedupPairs(tagged, idCol, textCol, numHashes, k, bands, minJaccard)
      .join(tags.select(col(idCol).as("id_a"), col("__graft_src").as("src_a")), Seq("id_a"))
      .join(tags.select(col(idCol).as("id_b"), col("__graft_src").as("src_b")), Seq("id_b"))
      .filter(col("src_a") =!= col("src_b"))
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic MinHash permutation parameters: h_j(s) = (a_j*s + b_j)
    * mod RehashP, with odd a_j derived from the Knuth constant. Callers
    * reduce the 61-bit string hash mod RehashP first, so products stay
    * under 2^60 (both factors < RehashP ~ 2^30). */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { j =>
      (graft.functions.HashKernels.minhashA(j), graft.functions.HashKernels.minhashB(j))
    }

  /** MinHash signatures: one row per doc, columns mh0..mh{n-1}. Computed
    * per row by the one-pass codegen kernel
    * [[graft.functions.MinhashSignature]] — MAP-ONLY (Generate +
    * Project); the round-3 form exploded every shingle row and ran a
    * 16-way min aggregate, shuffling the postings by doc id. The kernel
    * returns a nested 0-or-1-element array so `explode` drops docs
    * shorter than k words (as the exploded aggregate did) while
    * evaluating once per row. Equality with the composed form is
    * spec-pinned; [[minhashSignaturesComposed]] is the reference.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, k: Int = 3): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.exprs.minhashSignature(col(textCol), k, numHashes))
          .as("__sig"))
      .select(col(idCol) +: (0 until numHashes).map(j =>
        // the hash-family stamp rides on mh0 (parquet persists it);
        // dedupAgainstIndex refuses a mismatched stored index
        if (j == 0) col("__sig").getItem(j).as("mh0", familyMeta)
        else col("__sig").getItem(j).as(s"mh$j")): _*)

  /** Round-3 formulation of [[minhashSignatures]] (explode + min
    * aggregate) — the spec's equivalence reference. */
  private[graft] def minhashSignaturesComposed(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, k: Int): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, k)
    val aggs = minhashParams(numHashes).zipWithIndex.map { case ((a, b), j) =>
      min(pmod(col("sh") % RehashP * a + b, lit(RehashP))).as(s"mh$j")
    }
    sh.groupBy(col("sid").as(idCol) :: Nil: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("sid", idCol)
  }

  /** LSH candidate pairs from minhash signatures: band the signature
    * (bands × rowsPerBand = numHashes), bucket-join on (band, band-key).
    * Emits distinct candidate pairs (id_a < id_b). Hot buckets capped at
    * maxBucket docs (skew guard — at 100 TB a single boilerplate bucket
    * would otherwise produce a quadratic blowup). The drop is observed,
    * never silent: [[CapTelemetry.observeCap]] rides the bucket-count
    * frame ("lsh_candidate_pairs") and WARNs when the cap binds.
    */
  def lshCandidatePairs(signatures: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int, maxBucket: Int = 1000,
      persistIntermediates: Boolean = false): DataFrame = {
    val banded = maybePersist(signatures.select(
      col(idCol).as("sid"),
      posexplode(array((0 until bands).map { b =>
        concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      }: _*)).as(Seq("band", "key"))), persistIntermediates)
    val small = banded.join(
      CapTelemetry.observeCap(
          banded.groupBy("band", "key").agg(count(lit(1)).as("bc")),
          "lsh_candidate_pairs", col("bc"), maxBucket)
        .filter(col("bc") <= maxBucket).select("band", "key"),
      Seq("band", "key"))
    val a = small.select(col("band"), col("key"), col("sid").as("id_a"))
    val b = small.select(col("band"), col("key"), col("sid").as("id_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash-LSH near-dup pairs: LSH candidates verified with exact
    * n-gram Jaccard (candidates ∩ verification — the standard two-phase
    * dedup; verification cost is proportional to candidates, not pairs²).
    */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, k: Int = 3, bands: Int = 8,
      minJaccard: Double = 0.5, persistIntermediates: Boolean = false,
      mat: Materializer = Materializer.Local): DataFrame = {
    // signatures come from the map-only kernel and verification works on
    // per-doc shingle ARRAYS — the minhash pipeline never explodes a
    // postings list anywhere. `mat` is threaded into verification (its
    // candidate-sized intermediates materialize eagerly at construction
    // — pass Reliable/Parquet on multi-node clusters, like the CC loop).
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, k)
    val cands = lshCandidatePairs(sigs, idCol, bands, numHashes / bands,
      persistIntermediates = persistIntermediates)
    verifyPairsJaccardArrays(df, idCol, textCol, k, cands, mat)
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Candidate verification from per-doc shingle ARRAYS: doc arrays are
    * built map-only by the shingle kernel, semi-filtered to the (few)
    * candidate ids — AQE broadcasts that small side at runtime, so the
    * corpus is scanned once with no shuffle — and each surviving pair
    * computes its intersection locally with `array_intersect` (codegen,
    * O(|a|+|b|)). The postings-based [[verifyPairsJaccard]] stays for
    * callers that already hold an exploded postings frame; the two are
    * spec-pinned equal (including candidates referencing docs shorter
    * than k words, which BOTH forms drop). The array form avoids the
    * |cands| × shingles row explosion the postings join pays before its
    * pair aggregate.
    */
  def verifyPairsJaccardArrays(docs: DataFrame, idCol: String, textCol: String,
      k: Int, cands: DataFrame, mat: Materializer = Materializer.Local): DataFrame = {
    // both materialized frames are candidate-sized, never corpus-sized:
    // candsM because the pair list is referenced three times (id
    // projection + both join sides) and would otherwise re-run the whole
    // LSH chain per reference; rel because both join sides read it and
    // the corpus should be array-scanned exactly once
    val candsM = mat(cands)
    // docs shorter than k words have no shingles: the postings form
    // drops their pairs via the inner join, so the array form must too.
    // The word-count predicate is equivalent (n-k+1 shingles exist iff
    // words >= k) and CHEAP — an n_sh > 0 filter above the projection
    // would be pushed below it and re-run the shingle kernel per row.
    val arrays = docs
      .filter(col(textCol).isNotNull &&
        size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("sid"),
        array_distinct(graft.functions.exprs.shingleHashes(col(textCol), k)).as("sharr"))
      .withColumn("n_sh", size(col("sharr")).cast("long"))
    val candIds = candsM.select(col("id_a").as("sid"))
      .unionByName(candsM.select(col("id_b").as("sid"))).distinct()
    val rel = mat(arrays.join(candIds, Seq("sid")))
    candsM
      .join(rel.select(col("sid").as("id_a"), col("sharr").as("arr_a"),
        col("n_sh").as("n_a")), Seq("id_a"))
      .join(rel.select(col("sid").as("id_b"), col("sharr").as("arr_b"),
        col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("n_common",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** Exact Jaccard restricted to candidate pairs: the verification cost
    * is |candidates| x shingles-per-doc, NOT all-overlapping-pairs —
    * this is what makes LSH pay off at scale (verifying every
    * overlapping pair would re-create the quadratic term LSH avoids).
    */
  def verifyPairsJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val aSide = cands.join(sh.withColumnRenamed("sid", "id_a"), Seq("id_a"))
    val common = aSide
      .join(sh.select(col("sid").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("sid").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("sid").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
  }

  /** Connected components over near-dup pair edges: assigns every id the
    * minimum id reachable through the pair graph — the cluster key a
    * dedup pipeline keeps ONE canonical doc per. Iterative min-label
    * propagation (the standard Spark CC idiom: hash-join per round,
    * lineage truncated per iteration) with POINTER-JUMPING path
    * compression (r21): the labels fed into each round are first
    * compressed one hop through the just-materialized mapping
    * (L(n) := min(L(n), L(L(n))) — a lazy join over the round's cached
    * frame, no extra materialization), so convergence needs
    * O(log diameter) rounds instead of O(diameter). Near-dup CHAINS
    * (A~B~C~…, the re-encode/quote-chain shape) previously paid one
    * round per hop — the sf0.1 simhash graph ran 12 rounds / 96 Spark
    * jobs; compressed it runs 7 rounds (interleaved medians 4.42 →
    * 2.91 s), and the 2-round minhash graph also reads faster (2.60 →
    * 1.91 s — the compressed mapping rides a broadcast hint, keeping
    * the round join exchange-free). Fixpoint and output are UNCHANGED
    * (compression only accelerates monotone min-propagation; sig-checked
    * bit-equal). Bonus correctness margin: `maxRounds` now bounds
    * components of diameter ~2^maxRounds instead of maxRounds — a
    * 40-hop chain under the default 20 rounds previously under-merged
    * SILENTLY; a spec now pins that case.
    *
    * Input: `pairs` with (id_a, id_b); `allIds` the full id universe (so
    * singletons appear as their own cluster). Output: (id, cluster_id).
    */
  def nearDupClusters(pairs: DataFrame, allIds: DataFrame, idCol: String,
      maxRounds: Int = 20, mat: Materializer = Materializer.Local,
      broadcastLabels: Boolean = true): DataFrame = {
    val edges = mat(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct())
    // Iterate over the EDGE-INDUCED subgraph only: a node with no edges
    // can never receive a smaller label, so the (usually dominant) mass
    // of singleton docs is excluded from every round and rejoined once at
    // the end. On a near-dup corpus the edge nodes are a few percent of
    // the ids — the loop's joins shrink by that factor.
    var labelsM = mat(edges.select(col("src").as("node"))
      .distinct().withColumn("label", col("node")))
    var labels = labelsM
    // The node's OWN previous label rides the min-aggregate as a second
    // column, so "did any node change" is a short-circuiting filter on
    // the SAME materialized frame — no separate label-sum aggregate per
    // round. Works uniformly for ALL label types (the decimal-cast sum
    // invariant and the string-side any-row-changed join this replaces
    // were two type-split paths for the same "no node changed"
    // criterion). Materialization stays EAGER (a lazy checkpoint whose
    // first action short-circuits leaves partitions uncached for the
    // next round's two label references — measured 1.2-1.6x SLOWER on
    // the CC bench family in r20). r21: the probe is a full COUNT, not
    // isEmpty — take(1)'s converged round scans the cached frame in
    // 1/4/16/… limit waves (one job launch each), where count is one
    // job over cached blocks; interleaved medians at sf0.1 read 2.06 s
    // (count) vs 2.41 s (isEmpty) for the pairs+CC chain.
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // candidate label per node = min(own, min over neighbors' labels);
      // __own is the node's previous label (exactly one labels row per
      // node, the viaEdges side contributes nulls max() ignores)
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("label"))
      val nextM = mat(
        labels.withColumn("__own", col("label"))
          .unionByName(viaEdges.withColumn("__own",
            lit(null).cast(labels.schema("label").dataType)))
          .groupBy("node").agg(min(col("label")).as("label"),
            max(col("__own")).as("__own")))
      converged = nextM.filter(col("label") =!= col("__own")).count() == 0L
      mat.release(labelsM)
      labelsM = nextM
      val flat = nextM.drop("__own")
      // pointer-jumping: compress one hop through the materialized
      // mapping before the next round reads it. L(x) <= x for every
      // label, so the left join + coalesce is the exact
      // min(L(n), L(L(n))); the mapping side is label-table-sized and
      // broadcasts under the same flag as the singleton rejoin (a
      // shuffle-join fallback inherits AQE's skew handling — component
      // minima are the natural hot keys)
      val mapping = flat.select(col("node").as("__jn"), col("label").as("__jl"))
      val mapSide = if (broadcastLabels) mapping.hint("broadcast") else mapping
      labels = flat.join(mapSide, col("label") === col("__jn"), "left")
        .select(col("node"),
          coalesce(col("__jl"), col("label")).as("label"))
      round += 1
    }
    // rejoin the singletons: every id keeps its own label unless the loop
    // assigned a smaller one. The label side is edge-nodes-only (small),
    // so it is broadcast and the id universe is never shuffled; on a
    // corpus whose near-dup subgraph outgrows executor memory, pass
    // `broadcastLabels = false` to fall back to a shuffle join.
    val labelSide = if (broadcastLabels) labels.hint("broadcast") else labels
    val out = allIds.select(col(idCol).as("node"))
      .join(labelSide, Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("label"), col("node")).as("cluster_id"))
    mat match {
      case p: Materializer.Parquet =>
        // `out` still reads the final labels parquet — retire only the
        // edge list, which nothing downstream references
        p.release(edges)
      case _ => ()
    }
    out
  }

  /** Incremental near-dup check of a NEW batch against an EXISTING
    * corpus whose MinHash signatures are already stored — the
    * daily-ingest shape: at 100 TB the standing corpus is never
    * re-shingled; its signature table (one row per doc, written once by
    * [[minhashSignatures]]) is read back and only BANDS are joined.
    * Verification is signature-level (fraction of agreeing minhash
    * components estimates Jaccard) because the old corpus' raw text may
    * be in cold storage.
    *
    * Returns (id_new, id_old, est_jaccard). `maxBucket` caps hot bands
    * on the index side. Ids across the two inputs must be disjoint.
    */
  def dedupAgainstIndex(newDocs: DataFrame, indexSigs: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 16, k: Int = 3,
      bands: Int = 8, minEstJaccard: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireFamily(indexSigs, "mh0", "dedupAgainstIndex")
    val rowsPer = numHashes / bands
    val newSigs = minhashSignatures(newDocs, idCol, textCol, numHashes, k)
    def banded(sigs: DataFrame, p: String) = sigs.select(
      col(idCol).as(p),
      posexplode(array((0 until bands).map { b =>
        concat_ws("_", (0 until rowsPer).map(r => col(s"mh${b * rowsPer + r}")): _*)
      }: _*)).as(Seq("band", "key")))
    val idxBands = banded(indexSigs, "id_old")
    val capped = idxBands.join(
      idxBands.groupBy("band", "key").agg(count(lit(1)).as("bc"))
        .filter(col("bc") <= maxBucket).select("band", "key"),
      Seq("band", "key"))
    val cands = banded(newSigs, "id_new").join(capped, Seq("band", "key"))
      .select("id_new", "id_old").distinct()
    val a = newSigs.select(col(idCol).as("id_new") +:
      (0 until numHashes).map(j => col(s"mh$j").as(s"a$j")): _*)
    val b = indexSigs.select(col(idCol).as("id_old") +:
      (0 until numHashes).map(j => col(s"mh$j").as(s"b$j")): _*)
    val est = (0 until numHashes)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _).cast("double") / numHashes
    cands.join(a, Seq("id_new")).join(b, Seq("id_old"))
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("id_new", "id_old", "est_jaccard")
  }

  /** Recall/volume scorecard of an approximate pair generator against an
    * exact one — the measurement harness behind every LSH dial in this
    * file (bands, maxBucket, maxDf, bits): one full-outer join on the
    * pair key, one aggregate row (n_exact, n_approx, n_both, recall).
    * Run it when retuning a dial at a new corpus scale (BASELINE.md's
    * 10× RP-LSH retuning is exactly this measurement); both inputs are
    * pair-sized, never corpus-sized. `recall` is one IEEE division of
    * exact counts — oracle-reproducible.
    *
    * Both inputs are `.distinct()`-ed internally (pair-sized, cheap):
    * this is a generic measurement harness, and a generator that emits
    * a (id_a, id_b) row twice would otherwise fan the full-outer join
    * out and silently inflate every count. Pair ORDER is still the
    * caller's contract — both sides must emit the same canonical
    * orientation (every generator in this file emits id_a < id_b).
    */
  def pairRecall(exactPairs: DataFrame, approxPairs: DataFrame): DataFrame =
    keyedRecall(exactPairs, approxPairs, Seq("id_a", "id_b"))

  /** The generic key-set recall harness behind [[pairRecall]] and
    * [[passageRecall]]: full-outer join of the two key sets, one
    * aggregate row. Inputs are `.distinct()`-ed internally (result-
    * sized, cheap) so a generator emitting a key twice cannot fan the
    * join out and inflate counts. */
  private def keyedRecall(exact: DataFrame, approx: DataFrame,
      keys: Seq[String]): DataFrame = {
    val e = exact.select(keys.map(col) :+ lit(true).as("__e"): _*).distinct()
    val a = approx.select(keys.map(col) :+ lit(true).as("__a"): _*).distinct()
    e.join(a, keys, "full_outer")
      .agg(
        count(col("__e")).as("n_exact"),
        count(col("__a")).as("n_approx"),
        count(when(col("__e").isNotNull && col("__a").isNotNull, 1)).as("n_both"))
      // NULL recall when the exact side is empty — its stated use case
      // (retuning a dial at a new scale) can legitimately hit zero exact
      // pairs, and ANSI-mode Divide would kill the measurement job there
      .withColumn("recall",
        when(col("n_exact") === 0, lit(null).cast("double"))
          .otherwise(col("n_both").cast("double") / col("n_exact")))
  }

  /** ExactSubstr STRIDE scorecard — the fourth member of the recall
    * family (text LSH / media / embeddings / passages): the duplicated
    * passages found at `stride` measured against the stride=1
    * exhaustive word-window baseline, keyed by the passage string.
    * Both sides run the same [[duplicatedPassages]] plan; the cost IS
    * the measurement (the exact side is the expensive one, exactly as
    * in [[pairRecall]]'s uses).
    *
    * The stride dial, analytically: windows start at offsets ≡ 0
    * (mod stride). A specific winTokens-word passage occurring at
    * offset o is ENUMERATED iff o ≡ 0 (mod stride) — for a cross-doc
    * repeat of length L at offsets a and b, some shared window is
    * enumerated on BOTH sides iff a ≡ b (mod stride) (probability
    * 1/stride under uniform alignment) AND the repeat covers an
    * aligned start (guaranteed once L ≥ winTokens + stride − 1). So
    * span-level detection recall ≈ 1/stride for minimal-length
    * repeats, and the passage-level recall this scorecard reports is
    * stricter still (≈ 1/stride per enumerated side, both sides
    * required): budget stride against that loss — it buys a 1/stride
    * cheaper explode, the usual trade when the corpus side is huge.
    * Run this scorecard when retuning the dial at a new corpus scale,
    * exactly like the LSH band scorecards. */
  def passageRecall(df: DataFrame, idCol: String, textCol: String,
      winTokens: Int, stride: Int, minDocs: Int = 2,
      hashKey: Boolean = true): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    keyedRecall(
      duplicatedPassages(df, idCol, textCol, winTokens, 1, minDocs, hashKey)
        .select("passage"),
      duplicatedPassages(df, idCol, textCol, winTokens, stride, minDocs, hashKey)
        .select("passage"),
      Seq("passage"))
  }

  /** Keep the best-scoring document per near-dup cluster — canonical
    * selection by QUALITY instead of minimum id (dedup pipelines keep
    * the longest / highest-quality copy, not an arbitrary one). `score`
    * is any deterministic column over `df` (e.g. `length(col("text"))`
    * or a [[TextOps.qualityFeatures]] output); ties break by id for a
    * total order. One join + one per-cluster window.
    */
  def dedupKeepBest(df: DataFrame, clusters: DataFrame, idCol: String,
      score: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(score.desc, col(idCol).asc)
    df.join(clusters, Seq(idCol))
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn", "cluster_id")
  }

  /** Hybrid near-dup pairs across modalities: the union of text-level
    * MinHash-LSH pairs and embedding-level IVF-bucketed pairs for the
    * same id space — lexical rewrites that keep semantics are caught by
    * the embedding side, boilerplate/templated text by the lexical side.
    * Output: (id_a, id_b, via ∈ {'text','embedding','both'}). Both
    * inputs are the scale-shaped pair generators (banded/bucketed, no
    * all-pairs), and the merge is a full outer join on the pair key.
    */
  def hybridNearDupPairs(textPairs: DataFrame, embedPairs: DataFrame): DataFrame = {
    val t = textPairs.select(col("id_a"), col("id_b"), lit(true).as("__t"))
    val e = embedPairs.select(col("id_a"), col("id_b"), lit(true).as("__e"))
    t.join(e, Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        when(col("__t").isNotNull && col("__e").isNotNull, "both")
          .when(col("__t").isNotNull, "text")
          .otherwise("embedding").as("via"))
  }

  /** Leakage-safe train/validation split: each document is routed by the
    * content hash of its near-dup CLUSTER id, so near-duplicates can
    * never straddle the split boundary (a plain per-doc split leaks: the
    * val copy of a near-dup trains the model on the val answer). Input
    * is [[nearDupClusters]] output; `valPerMille` of the hash space goes
    * to "val". Pure projection over the cluster frame — membership is
    * deterministic across runs and engines.
    */
  def splitByCluster(clusters: DataFrame, valPerMille: Int): DataFrame = {
    require(valPerMille >= 0 && valPerMille <= 1000,
      s"valPerMille must be in [0, 1000], got $valPerMille")
    clusters.withColumn("split",
      when(pmod(charHash(col("cluster_id").cast("string")), lit(1000L)) < valPerMille,
        "val").otherwise("train"))
  }

  /** Soft dedup: instead of collapsing each near-dup cluster to one
    * canonical doc ([[IndexOps.dedupKeepFirst]]/[[dedupKeepBest]]), DOWNWEIGHT
    * every member by its cluster size — weight_ppm = ⌊10⁶ / size⌋, so a
    * cluster's expected mass after weighted sampling is one document
    * while preserving the cluster's internal diversity (boilerplate
    * variants, near-identical rewrites: hard dedup keeps one arbitrary
    * variant, soft dedup keeps a random one per draw — the
    * repetition-discounting recipe used when duplicates carry signal
    * about natural frequency). Input is [[nearDupClusters]] output (or
    * any (id, cluster_id) frame, e.g. exact content-hash groups);
    * output: (id, cluster_id, cluster_size, weight_ppm). One
    * cluster-table-sized aggregate + join — the corpus text is never
    * touched. Exact integer division, oracle-replayable.
    */
  def softDedupWeights(clusters: DataFrame, idCol: String): DataFrame = {
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        expr("1000000L div cluster_size").as("weight_ppm"))
  }

  /** Realize [[softDedupWeights]] as a deterministic sample: keep each
    * row iff its key hash lands under the cluster's weight_ppm
    * threshold — each cluster survives with EXPECTED one member (a
    * cluster may yield zero or several; that variance is the "soft"
    * in soft dedup — use [[dedupKeepBest]] when exactly-one is
    * required). Same hash-membership law as every sampler in
    * SampleOps: stable across runs, partitionings, and engines.
    */
  def softDedupSample(df: DataFrame, clusters: DataFrame, idCol: String,
      key: Column): DataFrame = {
    val w = softDedupWeights(clusters, idCol)
      .select(col(idCol), col("weight_ppm"))
    df.join(w, Seq(idCol))
      .filter(pmod(charHash(key.cast("string")), lit(1000000L)) <
        col("weight_ppm"))
      .select(df.columns.map(col): _*)
  }

  /** Full dedup pass: near-dup pairs -> clusters -> keep the canonical
    * (minimum-id) doc per cluster. */
  def dedupByMinhash(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.8, mat: Materializer = Materializer.Local): DataFrame = {
    val pairs = minhashDedupPairs(df, idCol, textCol, minJaccard = minJaccard, mat = mat)
    val clusters = nearDupClusters(pairs, df.select(col(idCol)), idCol, mat = mat)
    df.join(clusters, Seq(idCol))
      .filter(col(idCol) === col("cluster_id"))
      .drop("cluster_id")
  }

  /** SimHash near-dup pairs via pigeonhole chunk-bucketing — the
    * scale-correct shape (no all-pairs join anywhere in the plan).
    *
    * The signature is split into `maxHamming + 1` bit-chunks; two
    * signatures within hamming distance `maxHamming` differ in at most
    * `maxHamming` chunks, so by pigeonhole they agree EXACTLY on at least
    * one chunk — bucket-joining on (chunk index, chunk value) is
    * recall-lossless. Hamming is then verified only on candidates, so the
    * cost is proportional to bucket collisions, not pairs².
    *
    * `maxBucket` caps hot buckets (a chunk value shared by more than that
    * many docs is dropped from candidate generation — the skew guard that
    * bounds the quadratic term on boilerplate-heavy corpora; recall on
    * pairs whose ONLY agreeing chunk is hot is sacrificed, documented
    * trade, same shape as [[lshCandidatePairs]]).
    *
    * Duplicate-heavy corpora: the OUTPUT itself is quadratic in exact
    * copies (every pair of identical docs is a near-dup pair — a lower
    * bound for any exact pair enumerator, measured 100× pairs at a 10×
    * replicated stress). Collapse exact copies with [[exactDedup]]
    * FIRST; the distinct texts' pair count returns to corpus scale
    * (BASELINE.md round-7 stress).
    */
  def simhashNearPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 60, maxHamming: Int = 6, maxBucket: Int = 100000): DataFrame =
    hammingNearPairs(simhash(df, idCol, textCol, bits), idCol, "simhash",
      bits, maxHamming, maxBucket)

  /** Pigeonhole hamming near-pairs over ANY precomputed `bits`-wide
    * signature column — the signature-agnostic spine behind
    * [[simhashNearPairs]] (text SimHash) and
    * [[MultimodalOps.mediaNearDupPairs]] (perceptual image dHash):
    * chunk the signature into `maxHamming + 1` bit-ranges, equi-join on
    * (chunk index, chunk value) — recall-lossless by pigeonhole — then
    * verify exact hamming on candidates only. One row per `idCol`
    * expected; output (id_a, id_b, hamming), canonical id_a < id_b.
    * A binding `maxBucket` is reported, never silent
    * ([[CapTelemetry]], op "hamming_near_pairs"); [[hammingAllPairs]]
    * is the declared exactness baseline for recall measurement.
    */
  def hammingNearPairs(sigs: DataFrame, idCol: String, sigCol: String,
      bits: Int, maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    // bits > 63 would overflow the signed-long chunk mask (1L << 64 == 0,
    // collapsing every signature into one bucket — silent zero recall
    // once maxBucket drops it); fewer than maxHamming+1 bits cannot give
    // every chunk at least one bit (the pigeonhole guarantee needs
    // maxHamming+1 non-empty chunks)
    require(bits >= maxHamming + 1 && bits <= 63,
      s"bits must be in [maxHamming+1, 63] = [${maxHamming + 1}, 63], got $bits")
    val banded = chunkBanded(sigs, idCol, sigCol, bits, maxHamming + 1,
      "sid", "simhash")
    val small = banded.join(
      CapTelemetry.observeCap(
          banded.groupBy("chunk", "ckey").agg(count(lit(1)).as("bc")),
          "hamming_near_pairs", col("bc"), maxBucket)
        .filter(col("bc") <= maxBucket).select("chunk", "ckey"),
      Seq("chunk", "ckey"))
    val a = small.select(col("chunk"), col("ckey"),
      col("sid").as("id_a"), col("simhash").as("h_a"))
    val b = small.select(col("chunk"), col("ckey"),
      col("sid").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "ckey")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Brute-force hamming near-pairs — the DECLARED all-pairs exactness
    * baseline for the pigeonhole spine ([[hammingNearPairs]]), the
    * hamming analog of [[SimilarityOps.embeddingNearDupPairs]]: feed
    * both into [[pairRecall]] to score a `maxBucket` dial (the media
    * recall scorecard). Test/measurement scale ONLY — the cross join is
    * quadratic by construction.
    */
  def hammingAllPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3): DataFrame = {
    val a = sigs.select(col(idCol).as("id_a"), col(sigCol).as("__ha"))
    val b = sigs.select(col(idCol).as("id_b"), col(sigCol).as("__hb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Incremental hamming near-dup check of a NEW batch of signatures
    * against a STORED signature index — [[dedupAgainstIndex]]'s daily
    * no-rescan path for the hamming family (SimHash text signatures,
    * perceptual media dHashes): pigeonhole-chunk BOTH sides, equi-join
    * new chunks against stored chunks (recall-lossless for hamming ≤
    * `maxHamming`, same guarantee as [[hammingNearPairs]]), verify exact
    * hamming on candidates only. The standing corpus is never
    * re-hashed — the index side is the stored (id, signature) table read
    * back as-is. `maxBucket` caps hot chunk values on the INDEX side
    * (the unbounded one). Output: (id_new, id_old, hamming).
    */
  def hammingAgainstIndex(newSigs: DataFrame, indexSigs: DataFrame,
      idCol: String, sigCol: String, bits: Int, maxHamming: Int = 3,
      maxBucket: Int = 100000): DataFrame = {
    require(bits >= maxHamming + 1 && bits <= 63,
      s"bits must be in [maxHamming+1, 63] = [${maxHamming + 1}, 63], got $bits")
    // this spine is signature-agnostic (media phash sigs are not
    // hash-family artifacts), so the family check is RELATIVE: refuse
    // only when both sides carry stamps that disagree; warn when the
    // fresh side is stamped (a text-simhash flow) but the stored index
    // is not (a legacy index that may predate the current family)
    (hashFamilyOf(newSigs, sigCol), hashFamilyOf(indexSigs, sigCol)) match {
      case (Some(a), Some(b)) => require(a == b,
        s"hammingAgainstIndex: new signatures are hash family '$a' but " +
          s"the stored index is '$b' — their bits can never agree; " +
          "rebuild the index under the current family")
      case (Some(a), None) => logger.warn("hammingAgainstIndex: stored index " +
        s"carries no hash-family stamp while new signatures are '$a' — " +
        "if the index predates this family it will silently match " +
        "nothing; re-publish it through simhash() to stamp it")
      case _ => ()
    }
    val nChunks = maxHamming + 1
    def banded(sigs: DataFrame, p: String): DataFrame =
      chunkBanded(sigs, idCol, sigCol, bits, nChunks, s"${p}_id", s"${p}_sig")
    val idx = banded(indexSigs, "old")
    val ok = CapTelemetry.observeCap(
        idx.groupBy("chunk", "ckey").agg(count(lit(1)).as("__bc")),
        "hamming_against_index", col("__bc"), maxBucket)
      .filter(col("__bc") <= maxBucket).select("chunk", "ckey")
    banded(newSigs, "new")
      .join(idx.join(ok, Seq("chunk", "ckey")), Seq("chunk", "ckey"))
      .select(col("new_id").as("id_new"), col("old_id").as("id_old"),
        col("new_sig"), col("old_sig")).distinct()
      .withColumn("hamming",
        bit_count(col("new_sig").bitwiseXOR(col("old_sig"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_new", "id_old", "hamming")
  }

  /** The ONE pigeonhole chunk projection both hamming paths share
    * ([[hammingNearPairs]] self-join, [[hammingAgainstIndex]] band
    * join): chunk i covers bits [i·bits/nChunks, (i+1)·bits/nChunks) —
    * even spread, first chunks absorb the remainder — exploded to one
    * (id, sig, chunk, ckey) row per chunk. A single definition so the
    * recall guarantee cannot drift between the self and index paths. */
  private def chunkBanded(sigs: DataFrame, idCol: String, sigCol: String,
      bits: Int, nChunks: Int, idAs: String, sigAs: String): DataFrame = {
    val bounds = (0 to nChunks).map(i => i * bits / nChunks)
    val chunkCols = (0 until nChunks).map { i =>
      val lo = bounds(i)
      val width = bounds(i + 1) - lo
      shiftright(col(sigAs), lo).bitwiseAND(lit((1L << width) - 1))
    }
    sigs.select(col(idCol).as(idAs), col(sigCol).as(sigAs))
      .select(col(idAs), col(sigAs),
        posexplode(array(chunkCols: _*)).as(Seq("chunk", "ckey")))
  }

  /** SimHash: `bits`-wide signature from the doc's token-hash bit votes,
    * computed per row by the one-pass codegen kernel
    * [[graft.functions.SimhashBits]] — MAP-ONLY. The round-3 form
    * exploded every token and ran a 24-way conditional-sum aggregate,
    * shuffling the word rows (10-100× the corpus row count) by doc id;
    * the kernel removes that exchange entirely. Element-wise equality
    * with the composed form is spec-pinned (including empty-token and
    * trailing-space edge cases). One row per doc expected (the old
    * groupBy would merge votes across duplicate-id rows — every caller
    * passes one-row-per-doc corpora); null texts are dropped, matching
    * the old explode's behavior on a null token array.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 60): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        // family-stamped: hammingAgainstIndex refuses a stored index
        // hashed under a different family
        graft.functions.exprs.simhashBits(col(textCol), bits)
          .as("simhash", familyMeta))

  /** Round-3 formulation of [[simhash]] in pure builtins (explode +
    * conditional-sum aggregate) — kept as the equivalence reference the
    * spec pins the kernel against. */
  private[graft] def simhashComposed(df: DataFrame, idCol: String, textCol: String,
      bits: Int): DataFrame = {
    val words = df.select(col(idCol).as("sid"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .select(col("sid"), charHash(col("w")).as("wh"))
    val votes = (0 until bits).map { b =>
      // bit extraction must be integer ops: hashes are 61-bit since r16,
      // and Column.divide is DOUBLE division (exact only below 2^53)
      sum(when(shiftrightunsigned(col("wh"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b")
    }
    val bitsum = (0 until bits).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    words.groupBy("sid").agg(votes.head, votes.tail: _*)
      .select(col("sid").as(idCol), bitsum.as("simhash"))
  }
}
