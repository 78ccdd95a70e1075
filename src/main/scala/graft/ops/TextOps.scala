package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, token counting, and
  * document fingerprinting (north-star extension beyond the reference's
  * own surface — SURVEY.md §7.1 step 6).
  *
  * Everything here is a pure Catalyst expression (higher-order array
  * functions + regexp builtins), so it stays inside whole-stage codegen:
  * no UDFs, no serialization boundary, and it scales linearly with a
  * plain parquet scan — no shuffle at all for the per-document columns.
  *
  * Determinism contract: all hashes are exact modular integer arithmetic
  * (Horner fold + x^17 finalizer mod the Mersenne prime 2^61−1 — see
  * HashKernels.P) so the DuckDB oracle can reproduce them bit-for-bit:
  * the oracle folds in HUGEINT (products ≤ 2^122 < 2^127), the kernels
  * via the Mersenne shift-fold mulmod, and the pure-builtin twin
  * [[charHashComposed]] in Spark Decimal(38,0) (128-bit).
  */
object TextOps {
  /** Modulus for all text hashes: M61 = 2^61−1 (HashKernels.P). */
  val HashP = graft.functions.HashKernels.P
  /** Modulus of the affine rehash families — minhash permutations, bloom
    * probes, CMS rows (HashKernels.RehashP): inputs are reduced
    * `h mod RehashP` first so products stay < 2^61 in plain Long / BIGINT
    * arithmetic on both engines. */
  val RehashP = graft.functions.HashKernels.RehashP
  /** Knuth multiplicative constant, the Horner base. */
  val HashA = 2654435761L

  /** Whitespace tokens. Single-space split so the oracle's
    * `string_split(t, ' ')` agrees exactly (testdata is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Order-sensitive exact string hash: sum_i cp_i * w(i) mod P with
    * w(i) = (i+1)*A mod P. Runs as the custom codegen expression
    * [[graft.functions.WeightedCharHash]] — Spark's higher-order array
    * functions (`transform`/`aggregate`) evaluate their lambdas
    * interpreted per element, which made the composed form ~20x slower
    * on the hot dedup paths. [[charHashComposed]] keeps the pure-builtin
    * formulation; both are pinned equal by TextOpsSpec, and the DuckDB
    * oracle reproduces the same weighted-sum formula.
    */
  def charHash(s: Column): Column = graft.functions.exprs.charHashFast(s)

  /** Reference formulation of [[charHash]] in pure Catalyst builtins:
    * the Horner fold `h ← h·(A mod P) + cp mod P` over the codepoints
    * (Rabin–Karp — see HashKernels.weightedCharHash for why the old
    * linear-weight sum was replaced: it collapsed to A·Σ(i+1)·cp, a
    * bijection of a small integer, with measured mass collisions).
    *
    * Arithmetic runs in Decimal(38,0) — Spark's 128-bit integer type —
    * exactly as the DuckDB oracle runs it in HUGEINT: with P = 2^61−1
    * every product h·A < 2^93 ≈ 1e28 overflows Long but sits comfortably
    * inside 38 decimal digits, and each step reduces back under 2^61.
    * The x^17 finalizer (HashKernels.finalizeHash) squares 61-bit values
    * (< 2^122 ≈ 5.3e36 < 1e38 — still in range) four times and
    * multiplies by h once. */
  def charHashComposed(s: Column): Column = {
    val dec = DataTypes.createDecimalType(38, 0)
    val pD = lit(new java.math.BigDecimal(HashP)).cast(dec)
    def m(x: Column): Column = pmod(x, pD).cast(dec)
    val h = aggregate(
      transform(split(s, ""), c => ascii(c).cast(dec)),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, x) => m(acc * lit(HashA % HashP) + x))
    // x^17 finalizer (bijective mod M61; see HashKernels.finalizeHash)
    val x2 = m(h * h)
    val x4 = m(x2 * x2)
    val x8 = m(x4 * x4)
    m(m(x8 * x8) * h).cast("long")
  }

  /** Word k-shingles as an array of space-joined strings; empty array for
    * documents shorter than k words. */
  def wordShingles(text: Column, k: Int): Column = {
    val ws = tokens(text)
    when(size(ws) >= k,
      transform(sequence(lit(1), size(ws) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of occurrences of an exact word among the whitespace tokens. */
  def wordCount(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word)).cast("long")

  /** Occurrence counts for a whole word list in one text pass — the
    * codegen expression [[graft.functions.WordOccurrenceCounts]]
    * (element-wise equal to [[wordCount]] per word, pinned by spec; the
    * composed form runs one interpreted `filter` lambda per word per
    * row, 20× for the language-ID marker matrix). 1-indexed via
    * `element_at`. */
  def wordCountsAll(text: Column, words: Seq[String]): Column =
    graft.functions.exprs.wordCounts(text, words)

  /** Language-ID by marker-word voting: each language scores the count of
    * its marker words; argmax with a fixed language-preference order for
    * ties. A real deployment swaps the marker lists for per-language
    * n-gram profiles; the scoring/argmax plumbing is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "fast"),
    "fr" -> Seq("le", "la", "les", "une"),
    "es" -> Seq("el", "los", "las", "una"),
    "de" -> Seq("der", "die", "das", "und"),
    "zh" -> Seq("zh0", "zh1", "zh2", "zh3"))

  def langScores(text: Column): Seq[(String, Column)] = {
    // one-pass counts over the whole marker matrix; identical expression
    // trees across the per-language sums, so whole-stage codegen CSE
    // evaluates the scan once per row
    val allWords = LangMarkers.flatMap(_._2)
    val counts = wordCountsAll(text, allWords)
    val offsets = LangMarkers.map(_._2.length).scanLeft(0)(_ + _)
    LangMarkers.zip(offsets).map { case ((lang, ws), off) =>
      lang -> ws.indices.map(i => element_at(counts, off + i + 1)).reduce(_ + _)
    }
  }

  /** Predicted language: first language (in LangMarkers order) whose score
    * is >= every other language's score. */
  def languageId(text: Column): Column = {
    val scores = langScores(text)
    val pred = scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), els) =>
        val rest = scores.drop(i + 1).map(_._2)
        if (rest.isEmpty) els
        else when(rest.map(o => s >= o).reduce(_ && _), lang).otherwise(els)
    }
    pred
  }

  /** Quality-scoring features: word count, char count, stopword count,
    * punctuation count, average word length and stopword ratio (both as
    * exact-integer divisions — bit-deterministic doubles). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  def qualityFeatures(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val nWords = size(tokens(t)).cast("long")
    val stopCounts = wordCountsAll(t, Stopwords)
    val nStop = Stopwords.indices.map(i => element_at(stopCounts, i + 1)).reduce(_ + _)
    val nPunct = regexp_count(t, lit("[.!?,;:]"))
    df.withColumn("n_words", nWords)
      .withColumn("n_text_chars", length(t).cast("long"))
      .withColumn("n_stopwords", nStop)
      .withColumn("n_punct", nPunct.cast("long"))
      .withColumn("avg_word_len",
        (length(t) - (nWords - 1)).cast("double") / nullif(nWords, lit(0L)))
      .withColumn("stopword_ratio",
        nStop.cast("double") / nullif(nWords, lit(0L)))
  }

  /** Quality gate: the composite keep/drop rule a training-data pipeline
    * runs after scoring — minimum length, bounded stopword density,
    * plausible word shape. Thresholds compare exact-integer-derived
    * doubles, so the rule is bit-deterministic.
    */
  def qualityFilter(df: DataFrame, text: String, minWords: Long = 20,
      maxStopRatio: Double = 0.5, minAvgLen: Double = 2.0,
      maxAvgLen: Double = 12.0): DataFrame =
    qualityFeatures(df, text)
      .filter(col("n_words") >= minWords &&
        col("stopword_ratio") <= maxStopRatio &&
        col("avg_word_len") >= minAvgLen && col("avg_word_len") <= maxAvgLen)

  /** Token counting: whitespace tokens plus a BPE-ish regex segmentation
    * (letter runs / digit runs / single other non-space chars) — the
    * standard pre-tokenizer shape for LLM data work. */
  val BpeishPattern = "[a-z]+|[A-Z][a-z]*|[0-9]|[^a-zA-Z0-9 ]"

  def tokenCounts(df: DataFrame, text: String): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(text))).cast("long"))
      .withColumn("n_bpeish_tokens", regexp_count(col(text), lit(BpeishPattern)).cast("long"))

  /** Demo byte-BPE merges table: rank-ordered common-English pairs
    * (later rules consume earlier rules' outputs — `th`+`e`, `a`+`t`
    * then `th`+`at`). Deterministic and tiny by design so the oracle can
    * replay it; a real trainer's 50k-rule table drops in unchanged (the
    * kernel ships it as a broadcast-style reference object). Every rule
    * has a ≠ b — the [[graft.functions.BpeTokenStats]] requirement that
    * keeps merge order implementation-independent. */
  val DefaultBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "r" -> "e", "o" -> "r", "e" -> "n", "a" -> "t",
    "e" -> "s", "o" -> "u", "an" -> "d", "in" -> "g", "t" -> "o",
    "e" -> "d", "i" -> "s", "i" -> "t", "a" -> "l", "a" -> "r",
    "s" -> "t", "l" -> "e", "o" -> "f", "c" -> "h", "u" -> "r",
    "w" -> "h", "c" -> "e", "m" -> "e", "d" -> "e", "b" -> "e",
    "th" -> "at", "o" -> "w")

  /** Demo unigram-LM vocabulary (the [[DefaultBpeMerges]] counterpart
    * for the NON-BPE tokenizer family): every lowercase letter and
    * digit at the character floor, common English bigrams/trigrams and
    * a few corpus words above it, Q16 log-probability scores shaped so
    * longer pieces win exactly when a real unigram LM would prefer
    * them (e.g. "the" at −14 beats "th"+"e" at −20). */
  val DefaultUnigramVocab: Seq[(String, Long)] =
    (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -(8L << 16)) ++
      Seq("th", "he", "er", "in", "ta", "ba", "at", "or", "ar", "st",
        "an", "re", "on", "en", "le").map(_ -> -(12L << 16)) ++
      Seq("the" -> -(14L << 16), "ing" -> -(15L << 16),
        "que" -> -(15L << 16), "and" -> -(15L << 16)) ++
      Seq("data" -> -(18L << 16), "join" -> -(18L << 16),
        "spark" -> -(20L << 16), "batch" -> -(20L << 16))

  /** Assemble a [[graft.functions.UnigramVocab]] artifact from (piece,
    * Q16 score) entries: validates shape, sorts for the kernel's
    * in-place binary search, records the max piece length (the DP's
    * lookback bound). */
  def unigramVocab(entries: Seq[(String, Long)]): graft.functions.UnigramVocab = {
    require(entries.nonEmpty, "unigramVocab: empty vocabulary")
    require(entries.forall { case (p, s) => p.nonEmpty && !p.contains(" ") && s < 0L },
      "unigramVocab: pieces must be non-empty, space-free, with negative Q16 scores")
    require(entries.map(_._1).distinct.size == entries.size,
      "unigramVocab: duplicate pieces")
    val sorted = entries.sortBy(_._1).toArray
    graft.functions.UnigramVocab(sorted.map(_._1), sorted.map(_._2),
      sorted.map(_._1.length).max)
  }

  /** Unigram-LM (SentencePiece-style) tokenization — the NON-BPE
    * tokenizer for corpora whose published tokenizer isn't BPE (Kudo,
    * "Subword Regularization", ACL 2018 — the Viterbi decode, which is
    * what inference-time SentencePiece runs): per space-split word,
    * the segmentation maximizing the summed Q16 piece log-probs, single
    * characters outside the vocabulary falling back to `<unk>` at
    * `unkScoreQ` (character coverage — every word segments). Objective
    * totally ordered (max score, then fewest pieces, then earliest
    * split), so the result is deterministic and the per-doc
    * (n_pieces, score_q) pair is oracle-replayable — the DuckDB oracle
    * (q_unigram_tokens) runs the SAME DP as a list-carrying recursive
    * CTE over the distinct words. One map-only codegen pass per row
    * ([[graft.functions.UnigramEncode]]; the vocab rides the plan as a
    * reference object) — no join, no exchange, streaming-legal.
    * Output: (id, pieces, n_pieces, score_q).
    */
  def unigramEncode(df: DataFrame, idCol: String, textCol: String,
      vocab: graft.functions.UnigramVocab,
      unkScoreQ: Long = -(32L << 16)): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), graft.functions.exprs
        .unigramEncode(col(textCol), vocab, unkScoreQ).as("__u"))
      .select(col(idCol), col("__u.pieces").as("pieces"),
        col("__u.n_pieces").as("n_pieces"), col("__u.score_q").as("score_q"))

  /** Unigram-LM vocabulary TRAINER — hard-EM (Viterbi-EM), the
    * deterministic exact-arithmetic counterpart of SentencePiece's EM
    * trainer (Kudo 2018 trains with expected counts; the hard variant
    * re-segments with the CURRENT scores and re-estimates from the
    * winning paths — every step exact integers, so training is
    * bit-reproducible):
    *
    *  1. SEED: substring candidates of the distinct words (length ≤
    *     `maxPieceLen`, corpus frequency ≥ `minCount`), top
    *     `maxSeedSize` by coverage mass (count·len, ties by piece) —
    *     plus every single character seen (coverage floor, always
    *     retained so any word segments without `<unk>`).
    *  2. E-step: Viterbi-segment the DISTINCT words under the current
    *     scores (the [[unigramEncode]] kernel — each word once, counts
    *     weighted by word frequency; distributed one-pass recount).
    *  3. M-step: `score_q(p) = −log2q(2·total, count(p))` — the exact
    *     Q16 log-probability, shifted one bit so scores stay strictly
    *     negative; the shift is a constant per piece, i.e. a mild
    *     fewer-pieces prior applied CONSISTENTLY in both E and M steps,
    *     so the shifted corpus objective is non-decreasing across
    *     iterations (the Viterbi-EM guarantee — spec-pinned).
    *     Multi-char pieces that won no path drop; characters floor at
    *     count 1.
    *  4. After `iters` rounds, prune to `vocabSize` by (count desc,
    *     piece asc), characters always kept.
    *
    * Scale shape: the corpus is touched ONCE (word histogram); every
    * later pass runs over the distinct-word table (vocabulary-sized,
    * the [[trainBpeMergesIncremental]] budget class) with the vocab
    * riding as a kernel artifact — no shuffle wider than the word
    * histogram. Returns (piece, score_q) entries for [[unigramVocab]].
    *
    * BMP restriction: the seed pass slices candidate pieces with Spark
    * `substring`/`length` (codepoint offsets) while the E-step
    * re-segments through the [[unigramEncode]] kernel (UTF-16 offsets).
    * On text containing supplementary-plane characters the two
    * disagree — seed pieces that split a surrogate pair are never
    * matched by the kernel and silently fall to `<unk>`, drifting the
    * trainer's counts from what the encoder can use. Train on
    * BMP-only corpora (or strip astral codepoints first); the ENCODER
    * itself ([[unigramEncode]]) handles any input.
    */
  def trainUnigramVocab(df: DataFrame, textCol: String, vocabSize: Int,
      iters: Int = 2, maxPieceLen: Int = 8, minCount: Long = 2L,
      maxSeedSize: Int = 50000, unkScoreQ: Long = -(32L << 16),
      maxWordLen: Int = 1 << 16): Seq[(String, Long)] = {
    require(vocabSize >= 1 && iters >= 1 && maxPieceLen >= 1 &&
      maxSeedSize >= 1 && maxWordLen >= 1,
      "trainUnigramVocab: dials must be positive")
    val spark = df.sparkSession
    // the ONE corpus pass: word histogram
    val words = df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    words.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // degenerate-corpus refusal (the trainBpeMergesIncremental
      // maxPairIndexEntries discipline): the seed pass explodes
      // |word|·maxPieceLen substring rows per DISTINCT word, so one
      // pathological space-free document (a base64 blob, a minified
      // bundle) becomes a one-task skew bomb and a Viterbi DP over a
      // 2^20-char "word". Fail FAST with the dial named — before the
      // explode, not minutes into it.
      val longest = words.agg(max(length(col("w")))).head()
      require(longest.isNullAt(0) || longest.getInt(0) <= maxWordLen,
        s"trainUnigramVocab: longest space-free word is " +
          s"${longest.getInt(0)} chars, over maxWordLen=$maxWordLen — " +
          "the substring seed table grows as |word|·maxPieceLen per " +
          "distinct word; pre-split or drop pathological inputs " +
          "(base64 blobs, minified code), or raise the dial knowingly")
      // seed: substring coverage mass over the distinct words
      val subs = words.select(col("w"), col("f"),
          explode(sequence(lit(0), length(col("w")) - 1)).as("j"))
        .select(col("w"), col("f"), col("j"),
          explode(sequence(col("j") + 1,
            least(col("j") + maxPieceLen, length(col("w"))))).as("i"))
        .select(expr("substring(w, j + 1, i - j)").as("piece"), col("f"))
        .groupBy("piece").agg(sum(col("f")).as("cnt"))
      val chars = subs.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val seed = subs
        .filter(length(col("piece")) > 1 && col("cnt") >= minCount)
        .orderBy((col("cnt") * length(col("piece"))).desc, col("piece").asc)
        .limit(maxSeedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      def scored(counts: Array[(String, Long)]): Seq[(String, Long)] = {
        val total = counts.map(_._2).sum
        counts.toSeq.map { case (p, c) =>
          p -> -graft.functions.HashKernels.log2q(2L * total, c, 16)
        }
      }
      var counts = (chars ++ seed).sortBy(_._1)
      var it = 0
      while (it < iters) {
        // E-step: segment the distinct words under the current scores;
        // M-step: frequency-weighted piece recount (distributed)
        val vocab = unigramVocab(scored(counts))
        val charSet = chars.map(_._1).toSet
        val recount = unigramEncode(words, "w", "w", vocab, unkScoreQ)
          .join(words, "w")
          .select(explode(col("pieces")).as("piece"), col("f"))
          .groupBy("piece").agg(sum(col("f")).as("cnt"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        counts = (chars.map { case (c, _) =>
            (c, math.max(recount.getOrElse(c, 0L), 1L)) } ++
          counts.filter(e => !charSet(e._1) && recount.contains(e._1))
            .map(e => (e._1, recount(e._1)))).sortBy(_._1)
        it += 1
      }
      // prune to vocabSize by mass, characters always kept
      val charSet = chars.map(_._1).toSet
      val kept = counts.filter(e => charSet(e._1)) ++
        counts.filter(e => !charSet(e._1))
          .sortBy { case (p, c) => (-c, p) }
          .take(math.max(0, vocabSize - charSet.size))
      scored(kept.sortBy(_._1))
    } finally words.unpersist()
  }

  /** Tokenizer-faithful token counting: canonical byte-BPE (Sennrich et
    * al., "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016) under a rank-ordered merges table — the budget a trainer
    * actually sees, where [[tokenCounts]]'s whitespace/regex counts are
    * pre-tokenizer approximations. One map-only codegen pass per row
    * ([[graft.functions.HashKernels.bpeTokenStats]]); the merges table
    * rides into generated code as a reference object (the
    * [[classifierScore]] broadcast-model shape). Output: (id, n_words,
    * n_bpe_tokens). Feed `n_bpe_tokens` straight into
    * [[SampleOps.packBins]] / [[ProfileOps.numericProfile]] for
    * BPE-budgeted packing and token-length profiles (spec-pinned).
    */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    val stats = graft.functions.exprs.bpeTokenStats(col(textCol), merges)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), stats.as("__s"))
      .select(col(idCol),
        element_at(col("__s"), 1).as("n_words"),
        element_at(col("__s"), 2).as("n_bpe_tokens"))
  }

  /** Tokenizer MATERIALIZATION: the per-document BPE token-ID sequence
    * itself — not just the counts — under a rank-ordered merges table;
    * what a training pipeline actually ships to the trainer, and the
    * input [[graft.ops.SampleOps.packSequences]] cuts into fixed-length
    * training examples. Ids are a pure function of the merges table
    * (single-codepoint token → codepoint value; merged token →
    * 0x110000 + rule rank — stable under vocabulary extension, SQL-
    * replayable; see [[graft.functions.BpeTokenIds]]). One map-only
    * codegen pass per row; null-text rows are dropped like
    * [[bpeTokenCounts]]; blank text encodes as the empty sequence.
    * Output: (idCol, token_ids array<long>, n_tokens).
    *
    * `lossless = true` is the TRAINER-FAITHFUL mode: every U+0020
    * space is emitted as its own token (id 32) in stream position, so
    * [[decodeBpe]] reconstructs the document BYTE-FOR-BYTE — code,
    * markdown, and indentation-sensitive text survive materialization
    * (the default mode reconstructs only modulo spacing). Merge rules
    * can never contain a space ([[graft.functions.BpeTokenStats.legalToken]]),
    * so the word-token subsequence is IDENTICAL to the default mode's
    * (filter out id 32 and the streams are equal — spec-pinned): the
    * id-stability contract is unchanged, and a corpus encoded under
    * either mode stays valid when rules are appended. */
  def encodeBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = false): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.exprs.bpeTokenIds(col(textCol), merges, lossless)
          .as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))

  /** Inverse of [[encodeBpe]] under the SAME merges table: token ids
    * back to text (`decoded`). Byte-exact on a `lossless = true`
    * encode; words-joined-without-spaces on the legacy stream. One
    * map-only codegen pass; unknown ids fail loudly (decoding under
    * the wrong merges table must never silently fabricate text).
    * Output: (idCol, decoded). */
  def decodeBpe(df: DataFrame, idCol: String, idsCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame =
    df.select(col(idCol),
      graft.functions.exprs.bpeDecode(col(idsCol), merges).as("decoded"))

  /** The AUTHORITATIVE specials-after-vocab registry, in id order: the
    * special token ids occupy the slots immediately past the last
    * merge rule's id (`VocabBase + merges.size + ordinal`), exactly
    * like a real tokenizer's specials-after-vocab convention. This
    * sequence IS the registry — [[bpeEosId]], [[bpeImageId]],
    * [[bpeRoleId]], [[bpeEotId]] all resolve through it, so a new
    * special is ONE entry here (append-only: reordering would renumber
    * every persisted corpus's specials). Appending merge rules moves
    * the whole block together; a PERSISTED corpus pins the resolved
    * table via the `_graft_specials.parquet` sidecar
    * ([[graft.ops.SampleOps.materializeTrainingCorpus]]), the
    * durable record of what each special's id was under the encoding
    * merges — never re-derive specials of a stored corpus from a
    * possibly-extended live merges table. */
  val SpecialTokenNames: Seq[String] =
    Seq("eos", "image", "role_system", "role_user", "role_assistant", "eot")

  /** The resolved registry under a merges table: name → token id. */
  def bpeSpecialIds(
      merges: Seq[(String, String)] = DefaultBpeMerges): Map[String, Long] = {
    val base = graft.functions.BpeTokenIds.VocabBase + merges.size
    SpecialTokenNames.zipWithIndex
      .map { case (n, i) => n -> (base + i) }.toMap
  }

  /** The registry as a model-sized frame (name, token_id) — the shape
    * the `_graft_specials.parquet` sidecar persists. */
  def specialsTable(spark: SparkSession,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    import spark.implicits._
    val ids = bpeSpecialIds(merges)
    SpecialTokenNames.map(n => (n, ids(n))).toDF("name", "token_id")
  }

  /** The id one past the last merge rule's — the conventional
    * end-of-document separator for [[encodeBpe]] output fed to
    * [[graft.ops.SampleOps.packSequences]]; slot 0 of the
    * [[SpecialTokenNames]] registry. Appending rules to the
    * table moves it, exactly like a real tokenizer's specials-after-
    * vocab convention; pin the table (or pass an explicit id) for a
    * persisted corpus. */
  def bpeEosId(merges: Seq[(String, String)] = DefaultBpeMerges): Long =
    bpeSpecialIds(merges)("eos")

  /** SFT (prompt, completion) example encoding — the supervised twin of
    * [[encodeBpe]]: one map-only pass emitting the concatenated id
    * stream `prompt_ids ++ completion_ids ++ [EOS]` and the aligned
    * `loss_mask` (0 over the prompt — context only — and 1 over the
    * completion and the EOS, the tokens the trainer scores). The two
    * parts are encoded INDEPENDENTLY (an SFT template defines them
    * independently; no whitespace is synthesized at the seam — put any
    * separator text in the prompt itself), both byte-faithful under
    * `lossless = true` (the default here: an instruction corpus is
    * exactly where indentation survives or dies). Null prompt or
    * completion reads as the empty string, so every non-null-keyed row
    * yields at least the supervised EOS. Output: (idCol, token_ids,
    * loss_mask, n_tokens) — feed to
    * [[graft.ops.SampleOps.packSftSequences]]. */
  def encodeSft(df: DataFrame, idCol: String, promptCol: String,
      completionCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = true): DataFrame = {
    val eos = bpeEosId(merges)
    df.select(col(idCol),
        graft.functions.exprs.bpeTokenIds(
          coalesce(col(promptCol), lit("")), merges, lossless).as("__p"),
        graft.functions.exprs.bpeTokenIds(
          coalesce(col(completionCol), lit("")), merges, lossless).as("__c"))
      .select(col(idCol),
        concat(col("__p"), col("__c"), array(lit(eos))).as("token_ids"),
        concat(
          array_repeat(lit(0), size(col("__p"))),
          array_repeat(lit(1), size(col("__c")) + 1)).as("loss_mask"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Preference-pair (DPO/RLHF reward-modeling) example encoding: one
    * (prompt, chosen, rejected) row becomes TWO supervised branches —
    * each encoded exactly as [[encodeSft]] encodes (prompt, completion)
    * (byte-faithful, independent parts, supervised EOS, 0/1 mask), with
    * a `branch` tag ("chosen"/"rejected") and the shared idCol as the
    * pair key. A DPO trainer consumes the two branches of a pair
    * side-by-side; pack each branch as its own example with
    * [[graft.ops.SampleOps.packSftSequences]] keyed by
    * `concat(idCol, '#', branch)`. The shared prompt encodes
    * identically in both branches (same bytes → same ids → same masked
    * prefix; spec-pinned), so per-branch logprob deltas are
    * prompt-aligned by construction. Output: (idCol, token_ids,
    * loss_mask, n_tokens, branch). */
  def encodePreference(df: DataFrame, idCol: String, promptCol: String,
      chosenCol: String, rejectedCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = true): DataFrame = {
    def branch(completion: String, tag: String): DataFrame =
      encodeSft(df.select(col(idCol), col(promptCol),
          col(completion).as("__completion")),
        idCol, promptCol, "__completion", merges, lossless)
        .withColumn("branch", lit(tag))
    branch(chosenCol, "chosen").unionByName(branch(rejectedCol, "rejected"))
  }

  /** The reserved image-placeholder id — slot 1 of the
    * [[SpecialTokenNames]] registry (appending merge rules moves the
    * whole specials block together; pin the table for a persisted
    * corpus). */
  def bpeImageId(merges: Seq[(String, String)] = DefaultBpeMerges): Long =
    bpeSpecialIds(merges)("image")

  /** The role-marker special for `role` ("system" / "user" /
    * "assistant") — slots 2–4 of the [[SpecialTokenNames]] registry.
    * Unknown roles refuse loudly: a chat corpus with a typo'd role
    * must never silently encode a wrong marker. */
  def bpeRoleId(role: String,
      merges: Seq[(String, String)] = DefaultBpeMerges): Long =
    bpeSpecialIds(merges).getOrElse(s"role_$role",
      throw new IllegalArgumentException(
        s"unknown chat role '$role' — the specials registry knows " +
          s"${SpecialTokenNames.filter(_.startsWith("role_"))
            .map(_.stripPrefix("role_")).mkString(", ")}"))

  /** The end-of-turn special — slot 5 of the [[SpecialTokenNames]]
    * registry: closes every chat turn ([[encodeChat]]), supervised on
    * assistant turns so the model learns to STOP a turn (the ChatML
    * `im_end` convention). */
  def bpeEotId(merges: Seq[(String, String)] = DefaultBpeMerges): Long =
    bpeSpecialIds(merges)("eot")

  /** Interleaved multimodal example encoding — the VLM twin of
    * [[encodeSft]]: each document becomes `n_media` image-placeholder
    * ids, then its byte-faithful text ids, then one EOS (the
    * images-first layout), with `loss_mask` 0 over the placeholders
    * (embedding slots, never scored) and 1 over text + EOS. `media` is
    * the (idCol, mediaIdCol, …) attachment table; its per-doc count is
    * one group-sized aggregate joined on the doc key — docs with no
    * media encode as plain text examples, and docs with NULL text
    * encode as image-only examples (placeholders + EOS) rather than
    * being dropped with their attachments — the [[encodeSft]]
    * null-reads-as-empty totality, NOT [[encodeBpe]]'s null filter
    * (silently losing attachments of a caption-less image is the
    * failure mode). Pack with
    * [[graft.ops.SampleOps.packSftSequences]] (the mask rides along)
    * and derive the embedding-slot coordinates with
    * [[graft.ops.SampleOps.multimodalAlignment]] — both consume the
    * SAME deterministic layout, so the alignment is exact by the
    * pure-content-function contract, not by a join against the packed
    * stream. Output: (idCol, token_ids, loss_mask, n_tokens, n_media). */
  def encodeMultimodal(docs: DataFrame, media: DataFrame, idCol: String,
      textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = true): DataFrame = {
    val img = bpeImageId(merges)
    val eos = bpeEosId(merges)
    val counts = media.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("__nm"))
    docs
      .join(counts, Seq(idCol), "left")
      .withColumn("__nm", coalesce(col("__nm"), lit(0)))
      .select(col(idCol), col("__nm"),
        graft.functions.exprs.bpeTokenIds(
          coalesce(col(textCol), lit("")), merges, lossless).as("__t"))
      .select(col(idCol),
        concat(array_repeat(lit(img), col("__nm")), col("__t"),
          array(lit(eos))).as("token_ids"),
        concat(array_repeat(lit(0), col("__nm")),
          array_repeat(lit(1), size(col("__t")) + 1)).as("loss_mask"),
        col("__nm").cast("long").as("n_media"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** [[encodeMultimodal]] with the attachments INLINE on the doc row
    * (`mediaIdsCol`: array of media ids — null reads as no media) —
    * the streaming-friendly shape, where a micro-batch row must be
    * self-contained (a separate attachment table cannot be
    * consistently joined against an in-flight batch). Same layout,
    * same mask, one map-only pass, no aggregate at all. `media_ord`
    * for alignment is the position in the array (the caller's order is
    * authoritative — there is no per-doc window to impose one).
    * Output: (idCol, token_ids, loss_mask, n_media, n_tokens). */
  def encodeMultimodalInline(docs: DataFrame, idCol: String,
      textCol: String, mediaIdsCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = true): DataFrame = {
    val img = bpeImageId(merges)
    val eos = bpeEosId(merges)
    docs
      .withColumn("__nm",
        coalesce(size(col(mediaIdsCol)), lit(0))
          .cast("int"))
      .select(col(idCol), col("__nm"),
        graft.functions.exprs.bpeTokenIds(
          coalesce(col(textCol), lit("")), merges, lossless).as("__t"))
      .select(col(idCol),
        concat(array_repeat(lit(img), col("__nm")), col("__t"),
          array(lit(eos))).as("token_ids"),
        concat(array_repeat(lit(0), col("__nm")),
          array_repeat(lit(1), size(col("__t")) + 1)).as("loss_mask"),
        col("__nm").cast("long").as("n_media"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Multi-turn chat-template SFT encoding — the conversation twin of
    * [[encodeSft]]: a (conversation id, turn_ord, role, text) TURN
    * table becomes one supervised example per conversation. Template
    * (the ChatML shape on this library's specials registry): each turn
    * renders as `[role marker] text-ids [EOT]` — role markers from
    * [[bpeRoleId]] (system/user/assistant; an unknown or null role
    * REFUSES loudly, a typo'd role must never silently encode a wrong
    * marker), per-turn text byte-faithful under `lossless = true`
    * (null text reads as empty — a role-only turn is a legal turn) —
    * and the conversation closes with one [[bpeEosId]] EOS. Loss
    * masks per the standard chat-SFT contract: ASSISTANT turns'
    * text + EOT are supervised (the EOT is what teaches the model to
    * STOP a turn), their role marker is not (it is prompt-side
    * control); system/user turns are fully masked; the final EOS is
    * supervised like [[encodeSft]]'s.
    *
    * Turn assembly is ONE conversation-keyed aggregate (group volume =
    * one conversation's turns) over map-only per-turn encode rows —
    * the turn order is `turnOrdCol` ascending, and a conversation
    * carrying DUPLICATE turn ordinals refuses in-plan (its assembly
    * order would be content-dependent, the nondeterminism this
    * library's layout contracts exist to kill); a null ordinal
    * refuses at the row. Output: (idCol, token_ids, loss_mask,
    * n_turns, n_tokens) — feed to
    * [[graft.ops.SampleOps.packSftSequences]] (concat-and-cut, the
    * mask rides along) or the segmented/padded variants. */
  def encodeChat(turns: DataFrame, idCol: String, turnOrdCol: String,
      roleCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultBpeMerges,
      lossless: Boolean = true): DataFrame = {
    val ids = bpeSpecialIds(merges)
    val roles = SpecialTokenNames.filter(_.startsWith("role_"))
      .map(_.stripPrefix("role_"))
    val roleId = roles.foldLeft(
      when(lit(false), lit(0L))) { (acc, r) =>
        acc.when(col(roleCol) === r, lit(ids(s"role_$r")))
      }.otherwise(raise_error(concat(
        lit("encodeChat: unknown chat role '"),
        coalesce(col(roleCol), lit("<null>")),
        lit(s"' — the specials registry knows ${roles.mkString(", ")}"))))
    val sup = (col(roleCol) === "assistant").cast("int")
    val perTurn = turns
      .select(col(idCol),
        when(col(turnOrdCol).isNull, raise_error(lit(
            "encodeChat: null turn_ord — a stable turn order needs a " +
              "non-null ordinal per turn")))
          .otherwise(col(turnOrdCol).cast("long")).as("__ord"),
        roleId.as("__role"), sup.as("__sup"),
        graft.functions.exprs.bpeTokenIds(
          coalesce(col(textCol), lit("")), merges, lossless).as("__t"))
      .select(col(idCol), col("__ord"),
        concat(array(col("__role")), col("__t"),
          array(lit(ids("eot")))).as("__ids"),
        concat(array(lit(0)), array_repeat(col("__sup"), size(col("__t"))),
          array(col("__sup"))).as("__lm"))
    perTurn
      .groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(col("__ord"),
          col("__ids").as("i"), col("__lm").as("m")))).as("__ts"),
        count(lit(1)).as("__n"),
        countDistinct(col("__ord")).as("__nd"))
      // the duplicate-turn_ord refusal guards the SORTED TURN LIST
      // itself, before any output column is carved from it: token_ids,
      // loss_mask, and n_turns all derive from the one guarded
      // expression, so a consumer projecting ONLY loss_mask (column
      // pruning drops token_ids and its guard with it) still refuses —
      // an unguarded mask would silently carry content-dependent
      // ordering and desync against ids read elsewhere
      .select(col(idCol),
        when(col("__n") === col("__nd"), col("__ts"))
          .otherwise(raise_error(lit(
            "encodeChat: duplicate turn_ord within a conversation — " +
              "the turn order would be content-dependent; renumber the " +
              "turns"))).as("__ts"),
        when(col("__n") === col("__nd"), col("__n"))
          .otherwise(raise_error(lit(
            "encodeChat: duplicate turn_ord within a conversation — " +
              "the turn order would be content-dependent; renumber the " +
              "turns"))).as("__n"))
      .select(col(idCol),
        concat(
          flatten(transform(col("__ts"), t => t.getField("i"))),
          array(lit(ids("eos")))).as("token_ids"),
        concat(flatten(transform(col("__ts"), t => t.getField("m"))),
          array(lit(1))).as("loss_mask"),
        col("__n").as("n_turns"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Codepoint script-class profile — the charset-distribution signal
    * the marker-word [[languageId]] cannot see (a Russian document with
    * zero marker hits still reads overwhelmingly Cyrillic; a base64
    * blob reads as 'other'-heavy). One map-only codegen pass
    * ([[graft.functions.ScriptClassCounts]]: explicit codepoint ranges,
    * engine-replayable) → per-class counts plus the dominant letter
    * script (argmax over latin/cyrillic/cjk/arabic; fixed tie order
    * latin > cyrillic > cjk > arabic; 'none' when no letter class
    * fires). Null-text rows are dropped. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val names = Seq("n_latin", "n_cyrillic", "n_cjk", "n_arabic",
      "n_digit", "n_space", "n_other")
    val counted = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.exprs.scriptClassCounts(col(textCol)).as("__c"))
      .select(col(idCol) +: names.zipWithIndex.map { case (nm, i) =>
        element_at(col("__c"), i + 1).as(nm) }: _*)
    counted.withColumn("script",
      when(greatest(col("n_latin"), col("n_cyrillic"), col("n_cjk"),
        col("n_arabic")) === 0L, "none")
      .when(col("n_latin") >= col("n_cyrillic") &&
        col("n_latin") >= col("n_cjk") &&
        col("n_latin") >= col("n_arabic"), "latin")
      .when(col("n_cyrillic") >= col("n_cjk") &&
        col("n_cyrillic") >= col("n_arabic"), "cyrillic")
      .when(col("n_cjk") >= col("n_arabic"), "cjk")
      .otherwise("arabic"))
  }

  /** The merge-derived vocabulary as a joinable table — one row per
    * MERGED token: (token_id = 0x110000 + min producing rank, token).
    * Single-codepoint tokens are the identity ids 0…0x10FFFF and appear
    * in no table. The reverse map [[encodeBpe]] consumers need for
    * decode/inspection/embedding rows; broadcast-sized by construction
    * (≤ one row per rule). */
  def bpeVocab(spark: SparkSession,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      val t = a + b
      if (!rows.contains(t))
        rows(t) = graft.functions.BpeTokenIds.VocabBase + r
    }
    import spark.implicits._
    rows.toSeq.map { case (t, i) => (i, t) }.toDF("token_id", "token")
  }

  /** Driver-safe bound for [[denseVocab]]'s collect: the dense remap is
    * a model artifact (one row per OBSERVED token), and real tokenizer
    * vocabularies top out in the hundreds of thousands; 16M rows
    * (~128 MB of longs) is far past any legitimate vocabulary and
    * catches a caller who exploded the wrong column. */
  val MaxDenseVocab: Int = 1 << 24

  /** DENSE vocabulary over an [[encodeBpe]] corpus: the observed sparse
    * ids (codepoint ∪ 0x110000+rank space) mapped to contiguous
    * [0, V) — what a real embedding table indexes by. Output:
    * (dense_id, token_id), dense_id = rank of token_id in ascending
    * sparse order — a pure function of the observed id SET, so the
    * same corpus (under any partitioning) and the DuckDB oracle derive
    * the identical table. `extraIds` reserves ids the corpus itself
    * may not contain (specials — pass [[bpeEosId]] when the stream
    * will be packed).
    *
    * Shape: per-doc `array_distinct` before the explode (map-only
    * dedup), one vocabulary-sized hash aggregate, then the
    * collect-the-model step every trainer artifact takes (the
    * [[bpeVocab]]/trainCentroids shape) — guarded at
    * [[MaxDenseVocab]]. The table is persistable (write it next to the
    * corpus) and joinable; [[densifyIds]] applies it as one codegen
    * pass, and applying the SWAPPED table (dense_id ↔ token_id)
    * inverts the remap exactly (spec-pinned). Composing vocab build +
    * remap re-evaluates `encoded`'s lineage twice — materialize it
    * first when that lineage is a corpus encode
    * ([[graft.ops.SampleOps.materializeTrainingCorpus]] does). */
  def denseVocab(encoded: DataFrame, idsCol: String,
      extraIds: Seq[Long] = Nil): DataFrame =
    denseVocabOfIds(
      encoded.select(explode(array_distinct(col(idsCol))).as("token_id")),
      "token_id", extraIds)

  /** [[denseVocab]] over an already-FLAT id column (one id per row) —
    * the delegation target the array form explodes into, exposed for
    * callers whose ids already arrive one per row (a stored token
    * table, an exploded stream). Same contract, same guard. */
  def denseVocabOfIds(ids: DataFrame, idCol: String,
      extraIds: Seq[Long] = Nil): DataFrame = {
    val spark = ids.sparkSession
    val observed = ids
      .select(col(idCol).cast("long").as("token_id"))
      .distinct()
      .limit(MaxDenseVocab + 1)
      .collect().map(_.getLong(0))
    require(observed.length <= MaxDenseVocab,
      s"denseVocab: more than $MaxDenseVocab distinct ids — this is not " +
        "a token vocabulary; was the right column exploded?")
    val all = (observed ++ extraIds).distinct.sorted
    import spark.implicits._
    all.toSeq.zipWithIndex.map { case (tid, d) => (d.toLong, tid) }
      .toDF("dense_id", "token_id")
  }

  /** Apply a [[denseVocab]] table to an id-array column: one codegen
    * map pass ([[graft.functions.RemapIds]] — the table rides into
    * generated code as a reference object, never a corpus-side join).
    * Replaces `idsCol` with the remapped array under `outCol`
    * (default `dense_ids`), keeping every other column. Ids absent
    * from the table FAIL the job — a silently-invented id would
    * corrupt a training corpus undetectably; extend the vocabulary
    * (extraIds) or rebuild it over this corpus instead. Pass the
    * swapped table (`select(dense_id AS token_id, token_id AS
    * dense_id)`) to invert. */
  def densifyIds(df: DataFrame, idsCol: String, vocab: DataFrame,
      outCol: String = "dense_ids"): DataFrame = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    vocab.select(col("token_id").cast("long"), col("dense_id").cast("long"))
      .collect().foreach { r =>
        val prev = m.put(java.lang.Long.valueOf(r.getLong(0)),
          java.lang.Long.valueOf(r.getLong(1)))
        require(prev == null,
          s"densifyIds: duplicate token_id ${r.getLong(0)} in the remap table")
      }
    val remapped =
      df.withColumn(outCol, graft.functions.exprs.remapIds(col(idsCol), m))
    if (outCol == idsCol) remapped else remapped.drop(idsCol)
  }

  /** The dense id a [[denseVocab]] table assigns to one sparse id —
    * the driver-side lookup for specials (e.g. the packed-stream
    * separator: `denseId(vocab, bpeEosId())`). Fails if absent. */
  def denseId(vocab: DataFrame, tokenId: Long): Long = {
    val rows = vocab.filter(col("token_id") === tokenId)
      .select(col("dense_id").cast("long")).collect()
    require(rows.nonEmpty, s"token id $tokenId is not in the remap table")
    rows.head.getLong(0)
  }

  /** TRAIN a byte-BPE merges table from the corpus (Sennrich et al.
    * 2016): iteratively pick the highest-frequency adjacent token pair
    * over the word-frequency table and add it as the next merge rule.
    * The corpus is scanned ONCE into a (word, freq) vocabulary (the
    * classical training input — persisted, vocabulary-sized not
    * corpus-sized); each of the `nMerges` iterations re-tokenizes the
    * vocabulary under the rules so far (map-only kernel pass), counts
    * adjacent pairs weighted by word frequency (one hash aggregate),
    * and takes a deterministic argmax (count desc, then pair
    * lexicographic — no arbitrary tie). A driver loop of `nMerges`
    * small jobs — the [[SimilarityOps.trainCentroids]] pattern; the
    * loop is training, run once, not a query path. Cost is
    * O(nMerges² × vocab × word length) — iteration i re-tokenizes under
    * all i rules — which is fine at the tens-of-rules scale this demo
    * table targets; [[trainBpeMergesIncremental]] is the production
    * trainer (identical rule sequence, spec-pinned; maintained pair
    * counts, near-linear — ≥1000 merges in seconds). This quadratic
    * form stays as the independent equivalence REFERENCE the spec pins
    * the incremental trainer against, exactly the
    * simhash/minhashComposed pattern.
    * May return FEWER than `nMerges` rules (possibly zero)
    * when the vocabulary has no a ≠ b adjacent pair left; the counting
    * kernels accept an empty table (codepoint-level tokenization).
    *
    * Equal-sided candidates (a == b, e.g. `l`+`l`) are SKIPPED: the
    * counting kernels require a ≠ b so encoded counts are
    * merge-order-independent (and oracle-reproducible); the cost is a
    * marginal compression loss on doubled-letter runs. Candidates whose
    * tokens violate [[graft.functions.BpeTokenStats.legalToken]] (',' or
    * control characters, reachable via vocab words carrying them — the
    * single-space `tokens()` split keeps tabs/newlines inside words) are
    * skipped too: every trained table must round-trip byte-identically
    * through the `graft_bpe_token_stats` SQL string-literal registration.
    * Output feeds [[bpeTokenCounts]] / [[chunkDocumentsByBudget]]
    * directly.
    */
  /** Production BPE trainer: identical greedy argmax sequence as
    * [[trainBpeMerges]] (spec-pinned prefix-equality) at near-linear
    * cost — the incremental pair-count maintenance the quadratic
    * trainer's scaladoc names. The CORPUS-sized work (building the
    * (word, freq) vocabulary) stays distributed — one shuffle, one
    * pass; the merge loop then runs on the DRIVER over the
    * vocabulary-sized table (the [[SimilarityOps.trainCentroids]]
    * collect-the-model shape: a tokenizer's training input IS the word
    * frequency table, KBs–MBs at any corpus scale, and is capped
    * deterministically at `maxVocab` most-frequent words regardless).
    *
    * Algorithm (Sennrich et al. 2016, the subword-nmt implementation
    * shape): words start as codepoint sequences; maintain (pair →
    * weighted count) and (pair → words containing it); each iteration
    * pops the argmax pair — count desc, then UTF-8-byte-order (a, b),
    * the exact tie-break the quadratic trainer's `orderBy` applies —
    * from a lazy max-heap (stale entries discarded on pop; every count
    * change pushes a fresh one), re-merges ONLY the words containing
    * the pair (the kernel's leftmost pass), and updates just the
    * counts those words touched. Equal-sided and
    * [[graft.functions.BpeTokenStats.legalToken]]-violating candidates
    * are skipped at push time, exactly as the quadratic trainer skips
    * them. Cost: one pass per touched word per merge —
    * O(nMerges × hot-word length) total vs the quadratic trainer's
    * O(nMerges² × vocab × word length).
    */
  def trainBpeMergesIncremental(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 1 << 22,
      maxPairIndexEntries: Long = 64L << 20): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    require(maxPairIndexEntries >= 1,
      s"maxPairIndexEntries must be >= 1, got $maxPairIndexEntries")
    val vocab = df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
    // DEGENERATE-VOCABULARY GUARD (BASELINE round-11 stress): the
    // trainer's maintained state — the pair→words index and pair counts
    // — is Θ(Σ word codepoints) over the vocabulary. Natural-text
    // vocabularies are short-worded (4M words ≈ 36M entries, measured
    // safe at the default 8g driver); an adversarial/non-linguistic
    // vocabulary (millions of LONG near-random words, e.g. 33-char hex
    // strings, where merges never compress) blows the index past the
    // heap minutes into the run. Fail FAST instead, naming the dials:
    // the check costs one pass over the already-collected vocab.
    val pairIndexEntries = {
      var s = 0L; var i = 0
      while (i < vocab.length) {
        s += vocab(i).getString(0).codePointCount(0, vocab(i).getString(0).length)
        i += 1
      }
      s
    }
    if (pairIndexEntries > maxPairIndexEntries)
      throw new IllegalArgumentException(
        s"trainBpeMergesIncremental: vocabulary pair-index footprint " +
          s"($pairIndexEntries entries = sum of word lengths over " +
          s"${vocab.length} words) exceeds maxPairIndexEntries " +
          s"($maxPairIndexEntries). This vocabulary shape (many long " +
          s"words, low compressibility) is non-linguistic and would " +
          s"exhaust the driver heap mid-training. Lower maxVocab, " +
          s"pre-filter tokens (e.g. drop words over a length cap or " +
          s"outside the target script), or raise maxPairIndexEntries " +
          s"with a driver heap sized ~100 bytes/entry.")

    import scala.collection.mutable
    // UTF-8 byte order == Spark's UTF8String string ordering, so the
    // tie-break matches the quadratic trainer's orderBy bit-for-bit
    // (String.compareTo would diverge on supplementary codepoints)
    def cmpStr(x: String, y: String): Int =
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    final case class Cand(c: Long, a: String, b: String)
    val heap = new java.util.PriorityQueue[Cand](new java.util.Comparator[Cand] {
      def compare(p: Cand, q: Cand): Int =
        if (p.c != q.c) java.lang.Long.compare(q.c, p.c)
        else { val ca = cmpStr(p.a, q.a); if (ca != 0) ca else cmpStr(p.b, q.b) }
    })
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    val words = new Array[mutable.ArrayBuffer[String]](vocab.length)
    val freqs = new Array[Long](vocab.length)

    def push(p: (String, String), c: Long): Unit =
      if (c > 0 && p._1 != p._2 &&
          graft.functions.BpeTokenStats.legalToken(p._1) &&
          graft.functions.BpeTokenStats.legalToken(p._2))
        heap.add(Cand(c, p._1, p._2))
    // add (sign +1) or retract (sign −1) one word's full adjacent-pair
    // contribution; rebuilding the whole word per touch is O(word
    // length) — same class as a neighbor-delta update, with no
    // boundary-case bookkeeping to get wrong
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val t = words(wi); val f = freqs(wi) * sign
      var i = 0
      while (i + 1 < t.length) {
        val p = (t(i), t(i + 1))
        val nc = counts.getOrElse(p, 0L) + f
        if (nc == 0L) counts.remove(p) else counts(p) = nc
        if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += wi
        else where.get(p).foreach { s => s -= wi; if (s.isEmpty) where.remove(p) }
        push(p, nc)
        i += 1
      }
    }
    // the kernel's per-rule replacement, verbatim (leftmost pass to
    // fixpoint; with a ≠ b one pass already suffices)
    def mergePass(t: mutable.ArrayBuffer[String], a: String, b: String)
        : mutable.ArrayBuffer[String] = {
      var toks = t
      var changed = true
      while (changed && toks.length > 1) {
        changed = false
        val out = new mutable.ArrayBuffer[String](toks.length)
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2; changed = true
          } else { out += toks(i); i += 1 }
        }
        toks = out
      }
      toks
    }

    var wi = 0
    while (wi < vocab.length) {
      val w = vocab(wi).getString(0)
      val buf = new mutable.ArrayBuffer[String](w.length)
      var j = 0
      while (j < w.length) { // codepoint segmentation, as the kernel
        val width = Character.charCount(w.codePointAt(j))
        buf += w.substring(j, j + width)
        j += width
      }
      words(wi) = buf
      freqs(wi) = vocab(wi).getLong(1)
      addWordPairs(wi, 1L)
      wi += 1
    }

    val merges = Vector.newBuilder[(String, String)]
    var got = 0
    while (got < nMerges && !heap.isEmpty) {
      // stale entries are normally discarded on pop, but a hot pair
      // touching most of the vocabulary pushes O(touched × word length)
      // fresh candidates per merge and the stale backlog compounds —
      // the round-11 adversarial OOM's second ingredient. When the heap
      // outgrows the live pair set by a wide factor, rebuild it from
      // `counts` (one push per LIVE pair — the same legality filter):
      // bounded churn, identical pop order for live candidates.
      // 16L: an Int product overflows past ~134M live pairs — exactly
      // the large-vocabulary regime the maxPairIndexEntries guard
      // message tells users to size their driver for — and a wrapped
      // negative threshold would force a full heap rebuild every merge
      if (heap.size > math.max(1L << 20, 16L * counts.size)) {
        heap.clear()
        counts.foreach { case (p, c) => push(p, c) }
      }
      val cand = heap.poll()
      if (cand != null && // compaction can empty the heap: training done
          counts.get((cand.a, cand.b)).contains(cand.c)) { // else: stale
        val touched = where.get((cand.a, cand.b))
          .map(_.toArray).getOrElse(Array.emptyIntArray)
        var k = 0
        while (k < touched.length) {
          val t = touched(k)
          addWordPairs(t, -1L)
          words(t) = mergePass(words(t), cand.a, cand.b)
          addWordPairs(t, 1L)
          k += 1
        }
        merges += ((cand.a, cand.b))
        got += 1
      }
    }
    merges.result()
  }

  def trainBpeMerges(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val vocab = df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .persist()
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        // attribute-reference the token array before the pair transform
        // so the interpreted HOF evaluates the kernel once per row
        val toks = vocab.select(col("freq"),
          graft.functions.exprs.bpeWordTokens(col("w"), merges).as("t"))
        val top = toks
          .select(col("freq"), explode(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS a, t[i + 1] AS b))"))
            .as("p"))
          .select(col("freq"), col("p.a").as("a"), col("p.b").as("b"))
          .filter(col("a") =!= col("b"))
          // kernel/SQL-literal alphabet contract (BpeTokenStats.legalToken):
          // a rule carrying ',', ''' or a control character could never
          // ride the graft_bpe_token_stats registration — skip it
          .filter(!col("a").rlike("[\\x00-\\x20\\x7f-\\x9f,']") &&
            !col("b").rlike("[\\x00-\\x20\\x7f-\\x9f,']"))
          .groupBy("a", "b").agg(sum("freq").as("c"))
          .orderBy(col("c").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else merges :+= ((top(0).getString(0), top(0).getString(1)))
      }
      merges
    } finally vocab.unpersist()
  }

  /** BPE-BUDGETED document chunking: split each document into word-run
    * chunks whose byte-BPE token load fits `budgetTokens` — the
    * tokenizer-faithful version of [[chunkDocuments]], whose budgets are
    * whitespace words (a trainer's context window is BPE tokens, and
    * word/token ratios vary 2-4× across languages and formats, so a
    * word-budgeted chunk over- or under-fills the window).
    *
    * Shape: one map-only word explode with the per-word
    * [[graft.functions.HashKernels.bpeTokenStats]] kernel count, one
    * running-sum window PARTITIONED BY document (the sessionize
    * exchange; skew bounded by a single document's words), one grouped
    * reassembly in explicit position order (`collect_list` is
    * partitioning-ordered — never rely on collection order). Chunk
    * assignment is the [[SampleOps.packBins]] exclusive-prefix rule: a
    * word crossing the boundary charges its overflow to the current
    * chunk — bounded overrun of one word per chunk, same trade.
    * Output: (id, chunk_idx, chunk_text, n_bpe_tokens).
    */
  def chunkDocumentsByBudget(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int,
      merges: Seq[(String, String)] = DefaultBpeMerges): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val words = df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .filter(col("__w") =!= "")
      .withColumn("__n",
        element_at(graft.functions.exprs.bpeTokenStats(col("__w"), merges), 2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    words
      .withColumn("__cum", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("chunk_idx", expr(s"__cum div ${budgetTokens}L"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_sort(collect_list(struct(col("__pos"), col("__w")))).as("__ws"),
        sum(col("__n")).as("n_bpe_tokens"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", transform(col("__ws"), x => x.getField("__w")))
          .as("chunk_text"),
        col("n_bpe_tokens"))
  }

  /** Per-group corpus profile (group = language, source, domain …): doc
    * count, token/char volume, and length extremes — the reporting table
    * a curation pipeline publishes per snapshot. One partial-aggregated
    * hash aggregate on a low-cardinality key; scales as a pure map-side
    * combine.
    */
  def corpusStats(df: DataFrame, groupCol: String, text: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col(text)))).cast("long").as("n_tokens"),
        sum(length(col(text))).cast("long").as("n_chars"),
        min(length(col(text))).cast("long").as("min_chars"),
        max(length(col(text))).cast("long").as("max_chars"))

  /** Within-document repetition features over word n-grams — the
    * Gopher-style repetition signals a quality pipeline thresholds on
    * (fraction of duplicate n-grams, most-frequent-n-gram share). Two
    * exact ratios from exact integer counts: `dup_ratio` =
    * (n_grams − n_distinct)/n_grams, `top_ratio` = top_count/n_grams;
    * single IEEE divisions, bit-reproducible in the oracle.
    *
    * Shape: one explode + a two-level hash aggregate keyed by (doc,
    * gram-hash) then doc — map-side partial aggregation applies to both
    * levels, no joins, no windows. Documents shorter than n words have
    * no grams and drop out (gate them by length first).
    */
  def repetitionStats(df: DataFrame, idCol: String, text: String,
      n: Int = 2): DataFrame = {
    // one-pass codegen kernel per row (sorted-run counting over this
    // doc's gram array) — MAP-ONLY; the round-3 two-level aggregate
    // shuffled every (doc, gram) pair. Zero-gram docs (shorter than n
    // words) are dropped by the CHEAP word-count pre-filter — a
    // post-kernel n_grams > 0 filter would be pushed below the
    // projection and re-run the kernel per row. One row per doc
    // expected (the old aggregate merged counts across duplicate-id
    // rows; every caller passes one-row-per-doc corpora). The composed
    // form stays below as the spec's equivalence reference.
    val c = graft.functions.exprs.repetitionCounts(col(text), n)
    df.filter(col(text).isNotNull &&
        size(split(col(text), " ")) >= n)
      .select(col(idCol), c.getItem(0).as("n_grams"),
        c.getItem(1).as("n_distinct"), c.getItem(2).as("top_count"))
      .select(col(idCol), col("n_grams"), col("n_distinct"), col("top_count"),
        ((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
          .as("dup_ratio"),
        (col("top_count").cast("double") / col("n_grams")).as("top_ratio"))
  }

  /** Round-3 formulation of [[repetitionStats]] (explode + two-level
    * aggregate) — the spec's equivalence reference. */
  private[graft] def repetitionStatsComposed(df: DataFrame, idCol: String,
      text: String, n: Int): DataFrame = {
    val grams = df.select(col(idCol).as("sid"),
      explode(graft.functions.exprs.shingleHashes(col(text), n)).as("g"))
    grams.groupBy("sid", "g").agg(count(lit(1)).as("c"))
      .groupBy("sid")
      .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
      .select(col("sid").as(idCol), col("n_grams"), col("n_distinct"),
        col("top_count"),
        ((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
          .as("dup_ratio"),
        (col("top_count").cast("double") / col("n_grams")).as("top_ratio"))
  }

  /** Split documents into fixed-size token windows with overlap — the
    * standard long-document preparation for context-window packing and
    * passage-level embedding. One row per chunk: (id, chunk_idx,
    * chunk_text, n_tokens); stride = chunkTokens − overlap, the final
    * chunk keeps the tail (may be shorter). Pure per-row array ops
    * (sequence + slice inside codegen) then one explode — map-only, no
    * shuffle; chunk count per doc is ⌈(n−overlap)/stride⌉-shaped, so
    * output size is predictable from token counts.
    */
  def chunkDocuments(df: DataFrame, idCol: String, text: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    val ws = tokens(col(text))
    val n = size(ws)
    val numChunks = when(n <= chunkTokens, lit(1))
      .otherwise((n - chunkTokens + (stride - 1)).divide(stride).cast("int") + 1)
    df.select(col(idCol), ws.as("__ws"), n.as("__n"), numChunks.as("__nc"))
      .select(col(idCol), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"),
        col("__ws"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__ws"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Top-k most frequent tokens per document (ties by token string for a
    * total order) — log-free keyword extraction: explode + two-level
    * count + per-doc window, all exact integers. */
  def topTerms(df: DataFrame, idCol: String, text: String, k: Int): DataFrame =
    // one-pass per-row kernel (count map + rank by count desc, term asc
    // in binary UTF-8 order — Spark's own string sort order) — MAP-ONLY;
    // the round-3 pipeline shuffled every (doc, term) pair and ranked
    // with a per-doc window. One row per doc expected (the old
    // aggregate merged token counts across duplicate-id rows; every
    // caller passes one-row-per-doc corpora). Composed reference below
    // for the spec.
    df.filter(col(text).isNotNull)
      .select(col(idCol).as("sid"),
        posexplode(graft.functions.exprs.topTermCounts(col(text), k))
          .as(Seq("pos", "e")))
      .select(col("sid").as(idCol), col("e.term").as("term"), col("e.n").as("n"),
        (col("pos") + 1).cast("long").as("rank"))

  /** Round-3 formulation of [[topTerms]] (explode + count + rank
    * window) — the spec's equivalence reference. */
  private[graft] def topTermsComposed(df: DataFrame, idCol: String,
      text: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("sid").orderBy(col("n").desc, col("term").asc)
    df.select(col(idCol).as("sid"), explode(tokens(col(text))).as("term"))
      .groupBy("sid", "term").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("sid").as(idCol), col("term"), col("n"),
        col("rank").cast("long").as("rank"))
  }

  /** Corpus vocabulary: the `topN` most frequent terms with total
    * occurrence count (tf), document frequency (df), and a total-order
    * rank (tf desc, term asc) — the tokenizer-prep / stopword-discovery
    * profile of a corpus.
    *
    * Shape: one explode + TWO-LEVEL hash aggregate — (term, doc) counts
    * partial-aggregate map-side (each doc's repeats collapse before the
    * exchange), then the per-term rollup gives tf as a sum and df as a
    * plain count without `countDistinct`'s expand. Top-N is
    * `orderBy.limit` (TakeOrderedAndProject — per-partition partial
    * top-N, never a global sort). Rank is derived WITHOUT a window:
    * the `topN` surviving rows collapse into one sorted array
    * (bounded by `topN` — a driver-config-sized constant, not data)
    * and `posexplode` restores them with the ordinal as rank, so no
    * plan in the library carries an unpartitioned WindowExec.
    */
  def vocabulary(df: DataFrame, idCol: String, text: String,
      topN: Int): DataFrame = {
    require(topN > 0, s"topN must be > 0, got $topN")
    val perDoc = df.filter(col(text).isNotNull)
      .select(col(idCol).as("sid"), explode(tokens(col(text))).as("term"))
      .groupBy("term", "sid").agg(count(lit(1)).as("c"))
    val top = perDoc.groupBy("term")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("term").asc)
      .limit(topN)
    // negated tf makes ascending struct order == (tf desc, term asc);
    // term is a group key, so the sort key is unique and rank total
    top.agg(sort_array(collect_list(
        struct(negate(col("tf")).as("ntf"), col("term"), col("df")))).as("ks"))
      .select(posexplode(col("ks")).as(Seq("pos", "e")))
      .select(col("e.term").as("term"), negate(col("e.ntf")).as("tf"),
        col("e.df").as("df"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Corpus collocations: the `topN` adjacent word pairs ranked by LIFT
    * = N·c(x,y) / (c(x)·c(y)) with a `minCount` support floor — the
    * multi-word-expression discovery pass of tokenizer/vocab prep
    * (word2vec's phrase score is this statistic with a discount; PMI is
    * its log, so the RANKING is identical while lift stays computable
    * EXACTLY: both products are exact integers < 2^53, and lift is then
    * ONE IEEE division — bit-reproducible by the DuckDB oracle).
    *
    * Scale shape: bigram and unigram counts are map-side-combined hash
    * aggregates; the `minCount` cut prunes the bigram long tail BEFORE
    * the two unigram joins (they carry only surviving bigrams, and the
    * unigram side is vocabulary-sized — AQE broadcasts it); the corpus
    * token total derives from the unigram table (no second corpus
    * scan); top-N is `orderBy.limit` (TakeOrderedAndProject). No
    * windows. Bigrams come from `zip_with` over two slices — the
    * lambda touches only its arguments, so the token array is NOT
    * re-evaluated per element (the [[wordShingles]] O(words²) trap).
    * The unigram table feeds three consumers (token total + both
    * joins), so it materializes once through `mat` — without it each
    * consumer re-scans the corpus for its own unigram aggregate.
    *
    * Exactness bound: the integer products N·c_xy and c_x·c_y must stay
    * under 2^63 (long) — N·c_xy ≤ N² caps N at ~3·10⁹ tokens per
    * invocation. Beyond that (trillion-token corpora), shard the corpus
    * or move the products to double first: ordering then loses only
    * last-ulp ties, which the bigram tie-break already absorbs.
    */
  def collocations(df: DataFrame, text: String,
      minCount: Int = 5, topN: Int = 50,
      mat: graft.ops.Materializer = graft.ops.Materializer.LocalLazy): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val ws = df.filter(col(text).isNotNull).select(tokens(col(text)).as("ws"))
    val uni = mat(ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")))
    val nTotal = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    val len = greatest(size(col("ws")) - 1, lit(0))
    val bi = ws
      .select(explode(zip_with(
        slice(col("ws"), lit(1), len), slice(col("ws"), lit(2), len),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    bi.join(uni.select(col("w").as("x"), col("c").as("n_x")), Seq("x"))
      .join(uni.select(col("w").as("y"), col("c").as("n_y")), Seq("y"))
      .select(concat(col("x"), lit(" "), col("y")).as("bigram"),
        col("n_xy"), col("n_x"), col("n_y"),
        ((nTotal.scalar() * col("n_xy")).cast("double") /
          (col("n_x") * col("n_y")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("bigram").asc)
      .limit(topN)
  }

  /** Unicode canonicalization — the normalization pass a pipeline runs
    * BEFORE hashing/dedup/tokenizing, so byte-different but
    * visually-identical texts collide: NFC composition (UAX #15),
    * codepoint-wise simple lower-casing, and trim + collapse of
    * whitespace runs to one space. Runs as the codegen expression
    * [[graft.functions.NormalizeText]] — map-only, one pass per row, no
    * shuffle; the DuckDB oracle reproduces it as
    * `regexp_replace(trim(lower(nfc_normalize(text))), '[ \t\n\r]+', ' ', 'g')`.
    */
  def normalizeText(c: Column): Column = graft.functions.exprs.normalizeText(c)

  /** HTML main-content extraction — the jusText/CCNet-style boilerplate
    * filter every web-corpus pipeline runs BEFORE the text funnel (web
    * documents arrive as HTML; nav bars, footers, cookie banners and
    * menus would otherwise dominate dedup shingles and poison quality
    * stats). Strip script/style/comment subtrees, segment on block-level
    * tags, keep a block iff it has ≥ `minWords` words AND anchor-text
    * chars ≤ 1/3 of its chars (link density — kills menus/footers) AND
    * stopword density ≥ 5 % (prose has function words) — all exact
    * integer arithmetic in the ONE-pass codegen kernel
    * [[graft.functions.ExtractMainContent]]. Map-only: no shuffle, no
    * UDF, scales as a pure scan at any corpus size. Output:
    * (id, main_text — kept blocks joined by newline in document order,
    * n_blocks, n_kept); a document with no kept blocks keeps its row
    * with main_text = '' (the funnel drops it at the next stage, and
    * the count survives for telemetry). Oracle: q_html_extract replays
    * the exact regex/replace chain in DuckDB (RE2 and Java regex agree
    * on every construct used — pinned in the kernel's scaladoc).
    */
  def extractMainContent(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5): DataFrame =
    df.select(col(idCol), graft.functions.exprs
        .extractMainContent(col(htmlCol), minWords).as("__e"))
      .select(col(idCol), col("__e.main_text").as("main_text"),
        col("__e.n_blocks").as("n_blocks"), col("__e.n_kept").as("n_kept"))

  /** The structural card-number shape [[redactPii]] redacts and
    * [[graft.functions.LuhnCardCount]] verifies: separator-grouped
    * 4-4-4-(1..7) (Visa/Mastercard/generic 13–19) or 4-6-5 (Amex)
    * digit groups. CONTIGUOUS 13+-digit runs are left to the phone
    * rule — they are redacted either way (what matters for a scrub);
    * the grouped forms are what card numbers look like in prose, and
    * keeping them a separate category preserves the phone rule's
    * date/thousands precision unchanged. */
  val CardPattern: String =
    "[0-9]{4}([ -][0-9]{4}){2}[ -][0-9]{1,7}|[0-9]{4}[ -][0-9]{6}[ -][0-9]{5}"

  /** PII patterns for [[redactPii]] — (count column, pattern,
    * placeholder), applied in this order. Chosen to parse identically
    * under Java regex (Spark) and RE2 (the DuckDB oracle): character
    * classes, bounded/greedy quantifiers, alternation and `\b` only —
    * no backreferences, no lookaround (RE2 has none). Order matters:
    * email first (its local part may contain digit runs the later
    * rules would shred); IPv6 before IPv4 (a full-form v6 must not
    * have hex groups nibbled); cards before phones (a separator-
    * grouped 16-digit number is a card, not a phone); the opaque-token
    * rule last (anything the typed rules claimed is already gone).
    *
    * Per-rule notes: the IPv6 rule covers full-form addresses and
    * `::`-compressed forms WITH at least one leading hex group
    * (`2001:db8::1`, `fe80::1`), `\b`-anchored so code like
    * `std::vector` (a trailing hex letter before `::`) cannot match.
    * LEADING-`::` addresses (`::1`, `::abcd:1`) are DELIBERATELY out
    * of scope: without lookbehind (RE2 has none) any `::hex` rule
    * also matches C++/Rust scope operators whose right side is
    * hex-alphabet (`std::add`, `ns::f`) — shredding every code corpus
    * to protect the loopback address is the wrong trade, and the
    * common v4-mapped `::ffff:1.2.3.4` still loses its dotted tail to
    * the IPv4 rule (spec-pinned, both directions). The residual
    * false-positive class of the compressed form: a PURE-hex-alphabet
    * identifier pair around a scope operator at word start (`be::add`,
    * `face::cafe`, `a::f` in C++/Rust) parses as `hexgroup::hexgroup`
    * and is rewritten to `<IPV6>` — both sides must be entirely
    * [0-9a-f] and ≤4 chars, so ordinary identifiers (`std`, `vec`,
    * `ns1`) break the match; audit a code corpus for short-hex-word
    * scope pairs before scrubbing, or pre-mask the `::` operator. The
    * phone
    * pattern counts DIGITS by construction — each repeat unit is
    * (≤2 separators + one digit), so a match needs ≥9 digits: ISO
    * dates (8 digits) and grouped thousands like "1 200 000" (7)
    * survive. The secret rule is the STRUCTURAL signature of keys /
    * tokens / base64 blobs — 40+ unbroken chars of the token alphabet
    * (no '/', so URL paths don't chain into one run); JWTs are caught
    * per base64url segment (dots break runs). KNOWN COLLISION: a bare
    * 40-hex git commit SHA or content hash — ubiquitous in code and
    * docs corpora — is structurally indistinguishable from a 40-char
    * hex API key (which real providers ship), so it IS rewritten to
    * `<SECRET>`; the rule deliberately keeps them (a hex-exclusion
    * carve-out would whitelist exactly the hex-keyed secrets). For a
    * code corpus where hash fidelity matters more than hex-key
    * coverage, pre-mask `\b[0-9a-f]{40}\b`/`{64}` runs to a
    * placeholder before this pass and restore after. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("n_emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ipv6", "\\b(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|" +
      "([0-9A-Fa-f]{1,4}:){1,7}:([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,5})?)",
      "<IPV6>"),
    ("n_ips", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("n_cards", CardPattern, "<CARD>"),
    ("n_phones", "\\+?[0-9]([ ()-]{0,2}[0-9]){8,}", "<PHONE>"),
    ("n_secrets", "[A-Za-z0-9+=_-]{40,}", "<SECRET>"))

  /** PII redaction — the standard pre-training scrub (emails, IPv6s,
    * IPv4s, card numbers, phone-style digit runs, opaque key/secret
    * runs → typed placeholder tokens), the compliance pass every
    * large-scale corpus gets before training. Each category is COUNTED
    * on the text state it actually matched against, then replaced, so
    * counts and replacements agree even when categories overlap (an
    * email is redacted as one `<EMAIL>`, not an email plus a phone).
    * `n_luhn_cards` additionally counts the card-pattern matches that
    * pass the Luhn mod-10 checksum ([[graft.functions.LuhnCardCount]],
    * measured on the same text state the card rule matched) — the
    * verified-PAN signal for auditing what the structural rule caught.
    * Output: (id, clean_text, n_emails, n_ipv6, n_ips, n_cards,
    * n_luhn_cards, n_phones, n_secrets, n_redactions); `n_redactions`
    * sums the replacement categories (not the Luhn audit count).
    *
    * Shape: map-only — `regexp_count`/`regexp_replace` are codegen'd
    * builtins evaluated once per row; no join, no aggregate, no
    * shuffle, so the op scales with scan bandwidth alone at 100 TB.
    * Redaction is idempotent: placeholders contain no pattern-matchable
    * characters (spec-pinned).
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val names = PiiPatterns.map(_._1)
    val (cleaned, counts) =
      PiiPatterns.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((t, cs), (n, re, repl)) =>
          val c = cs :+ regexp_count(t, lit(re)).cast("long").as(n)
          val withAudit =
            if (n == "n_cards")
              c :+ graft.functions.exprs.luhnCardCount(t, CardPattern)
                .as("n_luhn_cards")
            else c
          (regexp_replace(t, re, repl), withAudit)
      }
    df.filter(col(textCol).isNotNull)
      .select(Seq(col(idCol), cleaned.as("clean_text")) ++ counts: _*)
      .withColumn("n_redactions",
        names.map(col).reduce(_ + _).as("n_redactions"))
  }

  /** Shallow linear classifier scoring — the fastText-style quality /
    * domain classifier pass of a curation pipeline (Joulin et al., "Bag
    * of Tricks for Efficient Text Classification", EACL 2017): score =
    * `bias` + Σ_tokens weight(token) against a supplied `(term, weight)`
    * model table, `keep` = score ≥ `threshold`. Weights are INTEGER
    * (fixed-point — the caller scales float model weights, e.g. ×10⁶),
    * so the per-doc sum is exact long arithmetic: bit-reproducible
    * across partitionings, engines, and the DuckDB oracle, with no
    * float-add-order drift at any cluster size.
    *
    * Output: (id, n_tokens, n_hits, score, keep); `n_hits` counts
    * tokens found in the model (multiplicity included).
    *
    * Shape: one map-only explode, a BROADCAST left join against the
    * model (a fastText-sized vocabulary — a few million terms / tens of
    * MB — broadcasts; the corpus side is never shuffled by term), then
    * one per-doc hash aggregate that partial-combines map-side. For a
    * model too large to broadcast, drop the hint and the same plan
    * becomes a shuffle join keyed by term — still explode-sized, never
    * corpus×model.
    */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, termCol: String = "term",
      weightCol: String = "weight", bias: Long = 0L,
      threshold: Long = 0L): DataFrame = {
    val w = broadcast(weights.select(col(termCol).as("__term"),
      col(weightCol).cast("long").as("__w")))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .join(w, col("__tok") === col("__term"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(col("__w")).as("n_hits"),
        (coalesce(sum(col("__w")), lit(0L)) + bias).as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** N-gram (bigram) count-LM perplexity scoring — the CCNet/Gopher
    * quality signal next to [[classifierScore]] (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * LREC 2020): train an add-one-smoothed bigram LM on `train`, then
    * score every document by its total and per-token surprisal under
    * that model. Low average surprisal = text the model finds natural;
    * curation filters threshold on it exactly like a perplexity cut
    * (perplexity = 2^(avg_bits_q / 2^fracBits)).
    *
    * Determinism: p(w|c) = (c(c,w)+1)/(c(c)+V) stays an exact integer
    * rational; per-token surprisal -log2 p is the fixed-point Q-format
    * kernel [[graft.functions.HashKernels.log2q]] (exactly-rounded IEEE
    * op sequence only), so the per-doc sums are exact long arithmetic —
    * bit-reproducible across partitionings and engines; the DuckDB
    * oracle replays the identical recurrence with a recursive CTE.
    *
    * Shape: the TRAIN pass runs the corpus explode + bigram hash
    * aggregate ONCE and materializes the model (`mat`, default
    * localCheckpoint — everything downstream, context counts, the
    * vocabulary scalar, and both score-side joins, derives from the
    * model table, so the corpus is never re-exploded). The SCORE pass
    * is map-only bigram expansion, two BROADCAST left joins against
    * the model tables (an n-gram LM is fastText-sized — tens of MB;
    * the corpus side is never shuffled by term), and one per-doc hash
    * aggregate with map-side combine. At 100 TB: one train-corpus scan
    * + one score-corpus scan — same posture as [[classifierScore]];
    * for a model too big to broadcast the same plan DEGRADES to a
    * shuffle join keyed by (ctx, tok), still explode-sized, never
    * corpus x model. The degradation is automatic, not aspirational:
    * the broadcast hint is applied only while the materialized model
    * stays under `maxBroadcastModelRows` bigrams (the hint FORCES a
    * broadcast — on an over-sized model it would error out at the
    * broadcast limit instead of degrading); past the threshold both
    * model joins go hint-less and plan as shuffle equi-joins.
    *
    * Output: (id, n_tokens, sum_bits_q, avg_bits_q) with both surprisal
    * columns in Q`fracBits` fixed point (bits x 2^fracBits).
    */
  def lmPerplexity(df: DataFrame, idCol: String, textCol: String,
      train: DataFrame, trainTextCol: String,
      fracBits: Int = 16, mat: Materializer = Materializer.Local,
      maxBroadcastModelRows: Long = 4L << 20): DataFrame = {
    val m = bigramModel(train, trainTextCol, mat, maxBroadcastModelRows)
    def hint(x: DataFrame): DataFrame = if (m.small) broadcast(x) else x
    bigramPairs(df, Seq(col(idCol)), textCol)
      .join(hint(m.pairCnt), Seq("__ctx", "__tok"), "left")
      .join(hint(m.ctxCnt), col("__ctx") === col("__ctx2"), "left")
      .select(col(idCol),
        graft.functions.exprs.log2Fixed(
          coalesce(col("__c_ctx"), lit(0L)) + lit(math.max(m.vocab, 1L)),
          coalesce(col("__c_pair"), lit(0L)) + lit(1L), fracBits).as("__bits"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__bits")).as("sum_bits_q"))
      .withColumn("avg_bits_q", expr("sum_bits_q div n_tokens"))
  }

  /** "<s>"-anchored bigram expansion, map-only (no per-doc window):
    * positions are 1-based for element_at. The token array is PROJECTED
    * to a bound column before the transform lambda touches it — a
    * composite expression referenced inside an interpreted higher-order
    * lambda is re-evaluated per element (O(L²) per doc, the classic
    * transform trap); an attribute reference is O(1). */
  private def bigramPairs(d: DataFrame, id: Seq[Column],
      text: String): DataFrame = {
    val arr = concat(array(lit("<s>")), tokens(col(text)))
    val ps = transform(sequence(lit(1), size(col("__arr")) - 1),
      i => struct(element_at(col("__arr"), i).as("ctx"),
        element_at(col("__arr"), i + 1).as("tok")))
    d.filter(col(text).isNotNull)
      .select(id :+ arr.as("__arr"): _*)
      .select(id :+ explode(ps).as("__p"): _*)
      .select(id :+ col("__p.ctx").as("__ctx") :+ col("__p.tok").as("__tok"): _*)
  }

  /** Add-one-smoothed bigram count model over `train`, ONE corpus pass,
    * materialized: (ctx,tok) counts, context totals, vocabulary size,
    * and the broadcast-eligibility decision ([[lmPerplexity]]'s
    * contract — the hint is applied only while the model stays under
    * `maxBroadcastModelRows`; past it the score joins degrade to
    * shuffle equi-joins automatically). */
  private case class BigramModel(pairCnt: DataFrame, ctxCnt: DataFrame,
      vocab: Long, small: Boolean)

  private def bigramModel(train: DataFrame, textCol: String,
      mat: Materializer, maxBroadcastModelRows: Long): BigramModel = {
    // the ONE train-corpus pass, materialized: ctxCnt, vocab, and the
    // score-side joins all read this table, not the corpus
    val pairCnt = mat(bigramPairs(train, Seq.empty, textCol)
      .groupBy(col("__ctx"), col("__tok"))
      .agg(count(lit(1)).as("__c_pair")))
    val ctxCnt = pairCnt.groupBy(col("__ctx").as("__ctx2"))
      .agg(sum(col("__c_pair")).as("__c_ctx"))
    // (ctx, tok) rows are distinct in the model, so the vocabulary is a
    // distinct-count over the model table — model-sized, not corpus-
    // sized — and the broadcast-eligibility row count rides the SAME
    // aggregate: one driver action instead of two (r21 — each action is
    // a full job launch; dsirWeights builds two models, so this halves
    // four blocking actions to two per DSIR query)
    val stats = pairCnt
      .agg(countDistinct(col("__tok")).as("__v"), count(lit(1)).as("__n"))
      .head()
    BigramModel(pairCnt, ctxCnt, stats.getLong(0),
      stats.getLong(1) <= maxBroadcastModelRows)
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by the log-likelihood RATIO between an n-gram model
    * of the TARGET distribution (the small curated corpus you want more
    * of) and one of the RAW distribution (the big corpus you're
    * selecting from) — `logratio_q = bits_raw_q − bits_target_q` in
    * Q`fracBits` fixed point (positive = the target model finds the doc
    * more natural than the raw model does, i.e. select it). Both models
    * are the add-one-smoothed bigram LM of [[lmPerplexity]], so the
    * whole weight is exact long arithmetic — bit-reproducible and
    * oracle-replayable.
    *
    * Output: (id, n_tokens, bits_target_q, bits_raw_q, logratio_q,
    * avg_logratio_q) with avg = logratio div n_tokens (length-
    * normalized; raw total log-ratio correlates with length, so rank on
    * the average unless the paper-faithful bag weight is wanted).
    *
    * Shape: two model-corpus passes (one per model, materialized) and
    * ONE score-corpus pass — the bigram expansion runs once and joins
    * against both models in the same plan (four broadcast left joins
    * while the models stay under `maxBroadcastModelRows`, shuffle
    * equi-joins past it), then one per-doc aggregate with map-side
    * combine. The 100 TB raw corpus is exploded once, never twice.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String,
      fracBits: Int = 16, mat: Materializer = Materializer.Local,
      maxBroadcastModelRows: Long = 4L << 20): DataFrame = {
    val mt = bigramModel(target, targetTextCol, mat, maxBroadcastModelRows)
    val mr = bigramModel(raw, rawTextCol, mat, maxBroadcastModelRows)
    def hint(small: Boolean)(x: DataFrame): DataFrame =
      if (small) broadcast(x) else x
    val tPair = mt.pairCnt.select(col("__ctx"), col("__tok"),
      col("__c_pair").as("__cp_t"))
    val tCtx = mt.ctxCnt.select(col("__ctx2").as("__cx_t"),
      col("__c_ctx").as("__cc_t"))
    val rPair = mr.pairCnt.select(col("__ctx"), col("__tok"),
      col("__c_pair").as("__cp_r"))
    val rCtx = mr.ctxCnt.select(col("__ctx2").as("__cx_r"),
      col("__c_ctx").as("__cc_r"))
    def bits(cc: Column, cp: Column, vocab: Long): Column =
      graft.functions.exprs.log2Fixed(
        coalesce(cc, lit(0L)) + lit(math.max(vocab, 1L)),
        coalesce(cp, lit(0L)) + lit(1L), fracBits)
    bigramPairs(df, Seq(col(idCol)), textCol)
      .join(hint(mt.small)(tPair), Seq("__ctx", "__tok"), "left")
      .join(hint(mt.small)(tCtx), col("__ctx") === col("__cx_t"), "left")
      .join(hint(mr.small)(rPair), Seq("__ctx", "__tok"), "left")
      .join(hint(mr.small)(rCtx), col("__ctx") === col("__cx_r"), "left")
      .select(col(idCol),
        bits(col("__cc_t"), col("__cp_t"), mt.vocab).as("__bt"),
        bits(col("__cc_r"), col("__cp_r"), mr.vocab).as("__br"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__bt")).as("bits_target_q"),
        sum(col("__br")).as("bits_raw_q"))
      .withColumn("logratio_q", col("bits_raw_q") - col("bits_target_q"))
      // div truncates toward zero identically in Spark and DuckDB
      // (checked on negatives), so the oracle replays this exactly
      .withColumn("avg_logratio_q", expr("logratio_q div n_tokens"))
  }

  /** Deterministic top-k DSIR selection: the k documents with the
    * highest importance ratio (the paper's top-k variant of importance
    * resampling — the Gumbel-perturbed draw needs transcendental
    * doubles this library's exactness contract excludes). Ranks on the
    * length-normalized average by default; `byAverage = false` ranks on
    * the paper-faithful total bag ratio. Ties broken by id — totally
    * ordered, so the selection is reproducible. Plans as
    * TakeOrderedAndProject (distributed partial top-k), never a global
    * sort. */
  def dsirTopK(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String, k: Int,
      byAverage: Boolean = true, fracBits: Int = 16,
      mat: Materializer = Materializer.Local,
      maxBroadcastModelRows: Long = 4L << 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = dsirWeights(df, idCol, textCol, target, targetTextCol,
      raw, rawTextCol, fracBits, mat, maxBroadcastModelRows)
    val rank = if (byAverage) col("avg_logratio_q") else col("logratio_q")
    w.orderBy(rank.desc, col(idCol).asc).limit(k)
  }

  /** DSIR importance RESAMPLING — the paper's sampled variant (Xie et
    * al., 2023): draw k documents without replacement with inclusion
    * odds increasing in the importance weight, instead of the
    * deterministic cut of [[dsirTopK]] (which starves diversity: it
    * takes ONLY the most target-like docs; the sampled draw admits
    * lower-ratio docs at proportionally lower odds, which is the
    * paper's actual scheme). This is [[SampleOps.prioritySample]]'s
    * weight/uniform priority race run EXACTLY in the Q16 log domain —
    * the weight 2^(ratio_q/2^16) would need a transcendental pow2, but
    * its LOG is already the ratio. charHash(id) is uniform on [0, P)
    * with P = 2^61−1 (HashKernels.P), so u = (charHash(id)+1)/P is
    * uniform on (0, 1] and
    *   log2(w/u) = ratio_q/2^16 − log2q(charHash(id)+1)/2^16 + log2(P)
    * where log2(P) ≈ 61; the score `score_q = ratio_q − log2q(hash+1,
    * 1, fracBits)` ranks identically (the +log2(P)·2^fracBits term
    * shifts all docs equally, so it is dropped).
    * All exact integers (the [[graft.functions.Log2Fixed]] kernel's
    * exactly-rounded op sequence), so the DuckDB oracle hash-matches
    * (q_dsir_sample). Monotone: for a fixed id, a higher ratio can only
    * raise the score; the draw is a pure content function of (id,
    * corpus) — partitioning/engine independent (spec-pinned). Top-k by
    * score plans as TakeOrderedAndProject, never a global sort.
    */
  def dsirSample(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      raw: DataFrame, rawTextCol: String, k: Int,
      byAverage: Boolean = true, fracBits: Int = 16,
      mat: Materializer = Materializer.Local,
      maxBroadcastModelRows: Long = 4L << 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = dsirWeights(df, idCol, textCol, target, targetTextCol,
      raw, rawTextCol, fracBits, mat, maxBroadcastModelRows)
    val ratio = if (byAverage) col("avg_logratio_q") else col("logratio_q")
    val u = charHash(col(idCol).cast("string")) + lit(1L)
    w.withColumn("score_q",
        ratio - graft.functions.exprs.log2Fixed(u, lit(1L), fracBits))
      .orderBy(col("score_q").desc, col(idCol).asc).limit(k)
  }

  /** Publish a DSIR bigram model as a driver artifact — the
    * [[graft.ops.DedupOps.contaminationGramSet]] pattern applied to the
    * importance models: ONE train-corpus pass, counts collected under
    * the same `maxModelRows` bound the broadcast path uses, keys sorted
    * for the kernel's in-place binary search. The artifact makes DSIR
    * scoring a pure MAP ([[dsirScoreWithModels]]) — publishable beside
    * the corpus, reusable across jobs and micro-batches. Counting is
    * IDENTICAL to [[dsirWeights]]'s in-plan model (pair counts over the
    * `<s>`-prepended space-split bigrams; context totals and vocabulary
    * derived from the pair table), so the two score paths agree
    * bit-for-bit (spec-pinned).
    */
  def dsirModelArtifact(train: DataFrame, textCol: String,
      maxModelRows: Long = 4L << 20): graft.functions.DsirModel = {
    val pairCnt = bigramPairs(train, Seq.empty, textCol)
      .groupBy(col("__ctx"), col("__tok"))
      .agg(count(lit(1)).as("__c_pair"))
    val n = pairCnt.count()
    require(n <= maxModelRows,
      s"dsirModelArtifact: model has $n distinct bigrams, over the " +
        s"driver-safe bound $maxModelRows — raise maxModelRows " +
        "deliberately or stay on the join form (dsirWeights)")
    val rows = pairCnt.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val pairs = rows.map { case (c, t, n2) => (c + " " + t, n2) }.sortBy(_._1)
    val ctxs = rows.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toArray.sortBy(_._1)
    val vocab = rows.iterator.map(_._2).toSet.size.toLong
    graft.functions.DsirModel(pairs.map(_._1), pairs.map(_._2),
      ctxs.map(_._1), ctxs.map(_._2), vocab)
  }

  /** Map-only DSIR scoring against two published [[dsirModelArtifact]]
    * models — [[dsirWeights]] with the model joins replaced by the
    * codegen kernel [[graft.functions.DsirBits]], emitting the SAME
    * columns with the SAME exact-integer values (spec-pinned). No join,
    * no aggregate, no exchange: legal in a Structured Streaming plan
    * (the [[graft.streaming.StreamOps.dsirGateStream]] gate), and one
    * codegen scan at any corpus size. Original columns ride along.
    */
  def dsirScoreWithModels(df: DataFrame, idCol: String, textCol: String,
      target: graft.functions.DsirModel, raw: graft.functions.DsirModel,
      fracBits: Int = 16): DataFrame =
    df.filter(col(textCol).isNotNull)
      .withColumn("__t",
        graft.functions.exprs.dsirBits(col(textCol), target, fracBits))
      .withColumn("__r",
        graft.functions.exprs.dsirBits(col(textCol), raw, fracBits))
      .withColumn("n_tokens", col("__t.n_tokens"))
      .withColumn("bits_target_q", col("__t.bits_q"))
      .withColumn("bits_raw_q", col("__r.bits_q"))
      .withColumn("logratio_q", col("bits_raw_q") - col("bits_target_q"))
      .withColumn("avg_logratio_q", expr("logratio_q div n_tokens"))
      .drop("__t", "__r")

  /** Feature-hashing bag-of-words embedding (the signed hashing trick —
    * Weinberger et al., "Feature Hashing for Large Scale Multitask
    * Learning", ICML 2009): a `dim`-length exact-integer vector with
    * each token adding ±1 at `charHash(token) mod dim`. The model-free
    * text→vector bridge: its cosine approximates bag-of-words cosine,
    * so documents flow into the embedding ops (brute-force /IVF/RP-LSH
    * top-k and near-dup in [[SimilarityOps]], after a
    * `cast("array<double>")` or `exprs.quantizeVec`) with NO trained
    * model. Runs as the codegen expression
    * [[graft.functions.HashEmbedding]] — map-only, one text pass per
    * row; exact counts make the vector bit-reproducible in the oracle.
    */
  def hashEmbed(c: Column, dim: Int): Column =
    graft.functions.exprs.hashEmbedding(c, dim)

  /** Document fingerprint: whole-text rolling hash plus a shingle-sketch
    * summary (count + min shingle hash). The min-hash of the shingle set
    * is the 1-permutation MinHash — a compact near-dup signal; DedupOps
    * extends it to full signatures.
    */
  def fingerprint(df: DataFrame, idCol: String, text: String, k: Int = 3): DataFrame = {
    val hashes = graft.functions.exprs.shingleHashes(col(text), k)
    df.select(col(idCol),
      charHash(col(text)).as("fp"),
      size(hashes).cast("long").as("n_shingles"),
      array_min(hashes).as("min_shingle_hash"))
  }
}
