package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. */
object HashKernels {
  /** String-hash modulus: the Mersenne prime M61 = 2^61 − 1. Round 15's
    * P ≈ 2^30 carried a birthday bound of √P ≈ 32k distinct inputs per
    * hash-keyed domain — measured ~1.6% false-hit for EXACT-match
    * consumers at the 16M-gram decontamination dial. At 2^61 the same
    * bound is ~1.5e9 distinct inputs and the 16M-gram false-hit rate is
    * ~7e-12. M61 specifically (vs an arbitrary 61-bit prime) because
    * reduction needs no 128/64 division: 2^61 ≡ 1 (mod M61), so a
    * 122-bit product folds with shifts and one conditional subtract
    * (see [[mulmod]]) — the classic public rolling-hash modulus.
    * The DuckDB oracle replays every product exactly in HUGEINT
    * (≤ 2^122 < 2^127). */
  val P: Long = 2305843009213693951L
  val A: Long = 2654435761L
  /** The Horner multiplier `A mod P` (= A now that P > A). Kept < 2^32
    * so the pure-builtin Decimal(38,0) twin (TextOps.charHashComposed)
    * and the HUGEINT oracle share small per-step products. */
  val AM: Long = A % P
  /** Modulus of the affine REHASH families (minhash permutations, bloom
    * probes, CMS rows): `(h mod RehashP)·a + b mod RehashP` with
    * a, b < RehashP keeps every product under 2^61, so the Column-API
    * and DuckDB-BIGINT formulations stay overflow-free. Banding /
    * probing only needs per-slot uniformity, not 61-bit exactness —
    * EXACT-match consumers key on the full 61-bit hash, never on a
    * rehash. */
  val RehashP: Long = 1000000007L

  /** Version identifier of the string-hash family (modulus + Horner base
    * + finalizer). Changing any of those orphans every PERSISTED
    * hash-derived artifact — gram sets, bloom bitmaps, minhash/simhash
    * signature indexes: replaying an old artifact through new-hash
    * consumers silently matches nothing. Producers stamp this id into
    * the artifact (column metadata — survives the parquet round trip);
    * consumers REFUSE a mismatched stamp and warn on an unstamped
    * legacy artifact — the `graft_pq_residual` stamp-and-refuse
    * discipline. History: r15 "p30-h3" (Horner+cube mod 1e9+7),
    * r16 "m61-x17" (Horner+x^17 mod 2^61−1). */
  val FamilyId: String = "m61-x17"
  /** Column-metadata key carrying [[FamilyId]] on stamped artifacts. */
  val FamilyStampKey: String = "graft_hash_family"

  /** a·b mod M61 for a, b ∈ [0, P): split the 122-bit product into
    * hi·2^64 + lo (Math.multiplyHigh is an intrinsic), then fold with
    * 2^64 ≡ 8, 2^61 ≡ 1 (mod M61): r = (lo & P) + (lo >>> 61 | hi << 3).
    * hi < 2^58 so hi<<3 < 2^61 and the two OR-ed parts occupy disjoint
    * bits; r < 2^62 − 3 < 2·M61, so ONE conditional subtract
    * canonicalizes. */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = (lo & P) + ((lo >>> 61) | (hi << 3))
    if (r >= P) r - P else r
  }

  /** One Horner step h ← h·AM + cp (mod P). cp < 2^21 (max codepoint),
    * so the post-mulmod sum needs one conditional subtract. */
  @inline def foldStep(h: Long, cp: Long): Long = {
    val r = mulmod(h, AM) + cp
    if (r >= P) r - P else r
  }

  /** Hash finalizer: x^17 mod P — a PERMUTATION of Z_P (17 is coprime
    * to P−1 = 2·3²·5²·7·11·13·31·41·61·151·331·1321, the published
    * factorization of 2^61−2), so it costs zero collision entropy
    * while destroying the arithmetic-progression structure a Horner
    * fold leaves in its low-order residues (sequential keys "…18, …19"
    * differ only in the raw-added last codepoint, so their hashes are
    * CONSECUTIVE — fine for collisions, fatal for `pmod(h, den)`
    * sampling, which would keep or drop whole key decades together;
    * measured in r15: hashSample at 100/1000 kept 10 of 500 sequential
    * ids unfinalized). The r15 cube x³ is NOT a bijection mod M61
    * (3 | P−1 — it would triple-collide a third of the space); 17 is
    * the smallest exponent coprime to P−1, and costs 4 squarings + 1
    * multiply once per string. The DuckDB oracle replays it via nested
    * single-element list_transforms in HUGEINT. */
  def finalizeHash(h: Long): Long = {
    val x2 = mulmod(h, h)
    val x4 = mulmod(x2, x2)
    val x8 = mulmod(x4, x4)
    mulmod(mulmod(x8, x8), h)
  }

  /** Rolling polynomial (Rabin–Karp/Horner) codepoint hash:
    * h = Σ cp_i · AM^(n−i) mod P, folded as `h ← h·AM + cp mod P` per
    * codepoint. Semantically identical to the composed-expression form
    * `aggregate(transform(split(s,""), ...))` in TextOps.charHash — same
    * formula the DuckDB oracle reproduces via no-init `list_reduce` —
    * but it runs as one tight primitive loop instead of interpreted
    * lambda evaluation per char.
    *
    * WHY Horner and not the old linear-weight sum Σ cp_i·((i+1)A mod P):
    * every linear weight is a multiple of the SAME unit (w_i = (i+1)·A
    * mod P), so that form collapses to A·Σ(i+1)·cp_i — a bijection of a
    * SMALL integer. Measured: 100k distinct integer-string keys hashed
    * to 316 distinct values; 20,212 distinct corpus 13-gram shingles
    * collided 1,538 times (7.6%); pmod(h, 1000) hit 274 of 1000
    * residues, making fine-rate hashSample off 4×. The geometric
    * weights break the common factor: the same measurements read
    * 100k/100k distinct, 0 shingle collisions, and exact sample rates.
    * Round 16 widened P from ≈2^30 to M61 = 2^61−1 (see [[P]]): the
    * birthday bound moves from ~32k to ~1.5e9 distinct inputs per
    * domain, and the 16M-gram decontamination false-hit rate from
    * ~1.6% to ~7e-12. The oracle fold runs in DuckDB HUGEINT; kernels
    * reduce via the Mersenne [[mulmod]] fold.
    */
  def weightedCharHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = foldStep(h, cp)
      i += Character.charCount(cp)
    }
    finalizeHash(h)
  }

  /** Hashes of all word k-shingles of a single-space-tokenized text:
    * element i = weightedCharHash(words[i..i+k-1] joined by ' '), computed
    * without materializing the joined strings (the space codepoint is
    * streamed between words). Splitting happens ONCE per row — the
    * composed `transform(sequence, i => charHash(concat_ws(element_at..)))`
    * form re-evaluates the split per element access, which is O(words^2)
    * per document.
    */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    if (n < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) // the joining space
          h = foldStep(h, 32L)
        val w = words(i + j)
        var ci = 0
        val wn = w.length
        while (ci < wn) {
          val cp = w.codePointAt(ci)
          h = foldStep(h, cp)
          ci += Character.charCount(cp)
        }
        j += 1
      }
      out(i) = finalizeHash(h)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Occurrence count of each target word among the single-space tokens
    * of `s`, in ONE pass over the text (tokens are scanned in place, no
    * token array materialized). Semantically element-wise equal to
    * `size(filter(split(s," "), t => t === word))` per word — the
    * composed form evaluates an interpreted lambda per token per word
    * (20 filters/row for language-ID's marker matrix). Empty targets
    * never match (split-empty tokens are skipped by the length check
    * only matching non-empty words).
    */
  def wordCounts(s: UTF8String, words: Array[String]): ArrayData = {
    val text = s.toString
    val out = new Array[Long](words.length)
    val n = text.length
    var start = 0
    var done = false
    while (!done) {
      var end = text.indexOf(' ', start)
      if (end < 0) { end = n; done = true }
      val len = end - start
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        if (w.length == len && text.regionMatches(start, w, 0, len)) out(wi) += 1
        wi += 1
      }
      start = end + 1
    }
    ArrayData.toArrayData(out)
  }

  /** SimHash signature in ONE text pass: tokenize on single spaces
    * (empty tokens kept, mirroring `split(text, " ")` with Spark's
    * keep-trailing-empties semantics), weightedCharHash each token, vote
    * ±1 per bit, set bit where the vote sum is positive. Element-wise
    * equal to the explode → 24-way conditional-sum aggregate it replaces
    * (spec-pinned), but map-only: no word explosion, no shuffle.
    */
  def simhashBits(s: UTF8String, bits: Int): Long = {
    val text = s.toString
    val votes = new Array[Int](bits)
    val n = text.length
    var start = 0
    var done = false
    while (!done) {
      var end = text.indexOf(' ', start)
      if (end < 0) { end = n; done = true }
      var h = 0L
      var ci = start
      while (ci < end) {
        val cp = text.codePointAt(ci)
        h = foldStep(h, cp)
        ci += Character.charCount(cp)
      }
      h = finalizeHash(h)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      start = end + 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Repetition counts over the doc's word n-gram hashes in one pass:
    * [n_grams, n_distinct, top_count]. Equal to the two-level
    * (doc, gram) → doc aggregate it replaces (spec-pinned) — computed by
    * sorting this row's gram array and counting runs, no shuffle. Empty
    * gram lists (docs shorter than n words) return [0, 0, 0]; callers
    * filter them like the explode used to drop them.
    */
  def repetitionCounts(s: UTF8String, n: Int): ArrayData = {
    val grams = shingleHashes(s, n)
    val cnt = grams.numElements()
    if (cnt == 0) return ArrayData.toArrayData(Array(0L, 0L, 0L))
    val arr = new Array[Long](cnt)
    var i = 0
    while (i < cnt) { arr(i) = grams.getLong(i); i += 1 }
    java.util.Arrays.sort(arr)
    var distinct = 1L
    var top = 1L
    var run = 1L
    i = 1
    while (i < cnt) {
      if (arr(i) == arr(i - 1)) run += 1
      else { distinct += 1; if (run > top) top = run; run = 1 }
      i += 1
    }
    if (run > top) top = run
    ArrayData.toArrayData(Array(cnt.toLong, distinct, top))
  }

  /** Top-k (term, count) pairs of the doc's single-space tokens in one
    * pass, ranked (count DESC, term ASC by BINARY UTF-8 order — exactly
    * Spark's string sort order, which differs from Java's UTF-16
    * compareTo for supplementary characters). Tokenization mirrors
    * `split(text, " ")` including empty tokens. Replaces the
    * explode → (doc, term) count → per-doc rank window pipeline
    * (spec-pinned equal), shuffling nothing.
    */
  def topTermCounts(s: UTF8String, k: Int): ArrayData = {
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    val text = s.toString
    val n = text.length
    var start = 0
    var done = false
    while (!done) {
      var end = text.indexOf(' ', start)
      if (end < 0) { end = n; done = true }
      val term = UTF8String.fromString(text.substring(start, end))
      val c = counts.get(term)
      if (c == null) counts.put(term, Array(1L)) else c(0) += 1
      start = end + 1
    }
    val entries = new java.util.ArrayList(counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey) // binary UTF-8 order
    }
    val out = new Array[Any](math.min(k, entries.size()))
    var i = 0
    while (i < out.length) {
      val e = entries.get(i)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue()(0))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass span scrub: removes every word covered by a word-k-gram
    * whose hash (the [[shingleHashes]] arithmetic, bit-identical) is in
    * `grams` — which MUST be sorted ascending; each window is a binary
    * search. Returns struct(clean_text, n_spans, n_removed): the text
    * with removed words excised (single-space rejoin), the count of
    * maximal merged removal spans, and the removed word count. Too-short
    * texts and empty gram sets pass through with (text, 0, 0). The
    * map-only twin of the join-based DedupOps.decontaminateSpans —
    * same output bit-for-bit.
    */
  /** URL percent-normalization (round 17): byte-exact sequential replay
    * of `graft.ops.UrlOps.PercentRules` — decode unreserved escapes
    * (hex case-insensitive), then uppercase the hex of surviving
    * escapes — with NO regex machinery: one cheap byte scan per rule,
    * allocation only when a rule matches, early return when the input
    * carries no `%` at all (the overwhelming majority of a crawl).
    * Pass ORDER and per-pass semantics replicate Java's global
    * `regexp_replace` exactly (left-to-right, non-overlapping, the
    * scanner resumes AFTER each match), so even pathological inputs
    * where one decode CREATES a later rule's escape (`%4%412` → pass A
    * yields `%4A2` → pass J yields `J2`) land bit-identically — the
    * DuckDB oracle keeps replaying the regex rule list and the two are
    * spec-pinned equal over fuzzed inputs (UrlOpsSpec). ASCII-only
    * patterns make the byte scan ≡ the char scan on UTF-8 (multibyte
    * bytes are ≥ 0x80 and can never match `%` or a hex char).
    * Measured 4.5× on the urlpct stress's all-percent corpus vs the
    * 74-regex chain (17.8 s → 4.0 s at 600k URLs), with a bit-identical
    * xxhash64 fold — the strongest parity witness short of the spec. */
  def percentNormalize(s: UTF8String): UTF8String = {
    val in0 = s.getBytes
    var has = false
    var i = 0
    while (i < in0.length && !has) { if (in0(i) == '%') has = true; i += 1 }
    if (!has) return s
    var cur = in0
    var r = 0
    while (r < PctDecodeChars.length) {
      val c = PctDecodeChars(r)
      cur = pctDecodePass(cur, c, PctHex((c & 0xFF) >> 4), PctHex(c & 0xF))
      r += 1
    }
    // all escapes decoded? the 12 uppercase passes are then no-ops
    var pct = false
    i = 0
    while (i < cur.length && !pct) { if (cur(i) == '%') pct = true; i += 1 }
    if (pct) {
      var d = 'a'.toByte
      while (d <= 'f') { cur = pctUpperFirstPass(cur, d); d = (d + 1).toByte }
      d = 'a'.toByte
      while (d <= 'f') { cur = pctUpperSecondPass(cur, d); d = (d + 1).toByte }
    }
    if (cur eq in0) s else UTF8String.fromBytes(cur)
  }

  /** IDN host → canonical lowercase ASCII (see [[IdnAscii]]): the JDK's
    * IDNA ToASCII per label, lowercase fold; rejection falls back to
    * the lowercased input (total, never lossy). */
  def idnAscii(s: UTF8String): UTF8String = {
    val host = s.toString
    // NonFatal, not just IllegalArgumentException: the totality promise
    // ("total on crawl garbage") must hold against ANY unchecked
    // exception a pathological host shakes out of the JDK IDNA/punycode
    // machinery — one weird label must never kill a whole job
    val out =
      try java.net.IDN.toASCII(host)
      catch { case scala.util.control.NonFatal(_) => host }
    UTF8String.fromString(out.toLowerCase(java.util.Locale.ROOT))
  }

  /** Unreserved characters in PercentRules order (RFC 3986 §2.3). */
  private val PctDecodeChars: Array[Byte] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(_.toByte).toArray
  private val PctHex: Array[Byte] = "0123456789ABCDEF".getBytes

  /** Hex char uppercased as an Int, or -1 when not a hex char. */
  private def pctHexUp(b: Byte): Int =
    if (b >= '0' && b <= '9') b
    else if (b >= 'A' && b <= 'F') b
    else if (b >= 'a' && b <= 'f') b - 32
    else -1

  /** One `(?i)%XY` → c global replace (3 bytes → 1). */
  private def pctDecodePass(in: Array[Byte], c: Byte, hi: Byte,
      lo: Byte): Array[Byte] = {
    var out: Array[Byte] = null
    var w = 0
    var i = 0
    while (i < in.length) {
      if (i + 2 < in.length && in(i) == '%' &&
          pctHexUp(in(i + 1)) == hi && pctHexUp(in(i + 2)) == lo) {
        if (out == null) {
          out = new Array[Byte](in.length)
          System.arraycopy(in, 0, out, 0, i)
          w = i
        }
        out(w) = c; w += 1; i += 3
      } else {
        if (out != null) { out(w) = in(i); w += 1 }
        i += 1
      }
    }
    if (out == null) in else java.util.Arrays.copyOf(out, w)
  }

  /** One `%d([0-9A-Fa-f])` → `%D$1` global replace (same length). */
  private def pctUpperFirstPass(in: Array[Byte], d: Byte): Array[Byte] = {
    var out: Array[Byte] = null
    var i = 0
    while (i + 2 < in.length) {
      if (in(i) == '%' && in(i + 1) == d && pctHexUp(in(i + 2)) >= 0) {
        if (out == null) out = in.clone()
        out(i + 1) = (d - 32).toByte
        i += 3
      } else i += 1
    }
    if (out == null) in else out
  }

  /** One `%([0-9A-F])d` → `%$1D` global replace (same length; the
    * group class is UPPERCASE-or-digit only, exactly the rule's). */
  private def pctUpperSecondPass(in: Array[Byte], d: Byte): Array[Byte] = {
    var out: Array[Byte] = null
    var i = 0
    while (i + 2 < in.length) {
      val g = in(i + 1)
      if (in(i) == '%' && in(i + 2) == d &&
          ((g >= '0' && g <= '9') || (g >= 'A' && g <= 'F'))) {
        if (out == null) out = in.clone()
        out(i + 2) = (d - 32).toByte
        i += 3
      } else i += 1
    }
    if (out == null) in else out
  }

  def spanScrub(s: UTF8String, grams: ArrayData,
      k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val gLen = grams.numElements()
    val words = s.toString.split(" ", -1)
    val n = words.length
    if (n < k || gLen == 0)
      return org.apache.spark.sql.catalyst.InternalRow(s, 0L, 0L)
    val removed = new Array[Boolean](n)
    var any = false
    var i = 0
    while (i <= n - k) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) // the joining space
          h = foldStep(h, 32L)
        val w = words(i + j)
        var ci = 0
        val wn = w.length
        while (ci < wn) {
          val cp = w.codePointAt(ci)
          h = foldStep(h, cp)
          ci += Character.charCount(cp)
        }
        j += 1
      }
      h = finalizeHash(h)
      if (sortedLongArrayContains(grams, gLen, h)) {
        any = true
        var r = i
        while (r < i + k) { removed(r) = true; r += 1 }
      }
      i += 1
    }
    if (!any) return org.apache.spark.sql.catalyst.InternalRow(s, 0L, 0L)
    var nRemoved = 0L
    var nSpans = 0L
    val sb = new java.lang.StringBuilder
    var first = true
    var w = 0
    while (w < n) {
      if (removed(w)) {
        nRemoved += 1
        if (w == 0 || !removed(w - 1)) nSpans += 1
      } else {
        if (!first) sb.append(' ')
        sb.append(words(w))
        first = false
      }
      w += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(sb.toString), nSpans, nRemoved)
  }

  /** Binary search for `h` over a sorted ascending array<bigint> read
    * in place via ArrayData.getLong — no per-row toLongArray() copy.
    * The grams operand of [[spanScrub]] is a plan-constant Literal
    * (up to the documented 16M-gram / 128 MB contaminationGramSet
    * bound): copying it once per ROW would dominate the scan cost at
    * scale, so this reads the shared backing array directly, the same
    * no-copy discipline as [[bloomHits]].
    */
  private def sortedLongArrayContains(g: ArrayData, n: Int, h: Long): Boolean = {
    var lo = 0
    var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = g.getLong(mid)
      if (v < h) lo = mid + 1
      else if (v > h) hi = mid - 1
      else return true
    }
    false
  }

  // ---- HTML main-content extraction (jusText/CCNet-style) ----
  // Patterns compiled ONCE per JVM; every construct used ((?is) flags,
  // \b, [^>]*, non-greedy .*?, \s+, alternation) has IDENTICAL
  // semantics in Java regex and RE2, which is what lets the DuckDB
  // oracle replay the extraction byte-exactly.
  private val HtmlScriptRe =
    java.util.regex.Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val HtmlStyleRe =
    java.util.regex.Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val HtmlCommentRe =
    java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  /** Block-level separators. `\b` after the tag name keeps `<pre>` /
    * `<param>` / `<thead>` from splitting on their `p`/`t…` prefixes. */
  private val HtmlBlockSplitRe = java.util.regex.Pattern.compile(
    "(?i)</?(p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|section|article|" +
      "header|footer|nav|aside|blockquote|main|body|html|head|title|form)" +
      "\\b[^>]*>")
  private val HtmlAnchorRe =
    java.util.regex.Pattern.compile("(?is)<a\\b[^>]*>.*?</a>")
  private val HtmlTagRe = java.util.regex.Pattern.compile("<[^>]*>")
  private val HtmlWsRe = java.util.regex.Pattern.compile("\\s+")
  /** The word list [[graft.ops.TextOps.Stopwords]] publishes — kept in
    * sync by a spec; duplicated here so the kernel has no ops-layer
    * dependency. */
  private val HtmlStopSet = java.util.Set.of("the", "a", "of", "and")

  private def htmlDecodeEntities(s: String): String =
    // &amp; LAST: decoding it first would double-decode "&amp;lt;".
    // The oracle's replace() chain runs in this exact order.
    s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  /** Main-content extraction from raw HTML — the jusText/CCNet-style
    * stage-0 of a web-corpus curation funnel, as ONE deterministic
    * codegen kernel: strip script/style/comment subtrees, segment on
    * block-level tags, then keep a block iff (all exact integer
    * arithmetic, codepoint counts)
    *   - it has ≥ `minWords` words (after tag strip, entity decode,
    *     whitespace collapse),
    *   - its anchor-text chars are ≤ 1/3 of its text chars
    *     (3·link ≤ total — the link-density rule that kills nav bars,
    *     breadcrumbs, footers), and
    *   - its stopword density is ≥ 5 % (20·stops ≥ words — prose has
    *     function words; tag soup, menus and code mostly don't).
    * Returns (main_text: kept blocks joined by '\n' in document order,
    * n_blocks: non-blank blocks seen, n_kept). Every rule is a regex /
    * replace chain with identical Java-vs-RE2 semantics, so the DuckDB
    * oracle replays it byte-exactly (q_html_extract).
    */
  def extractMainContent(s: UTF8String,
      minWords: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val html = s.toString
    val noScript = HtmlCommentRe.matcher(
      HtmlStyleRe.matcher(
        HtmlScriptRe.matcher(html).replaceAll(" ")).replaceAll(" "))
      .replaceAll(" ")
    val blocks = HtmlBlockSplitRe.split(noScript, -1)
    var nBlocks = 0L
    var nKept = 0L
    val out = new java.lang.StringBuilder
    var bi = 0
    while (bi < blocks.length) {
      val b = blocks(bi)
      val text = HtmlWsRe.matcher(htmlDecodeEntities(
        HtmlTagRe.matcher(b).replaceAll(" "))).replaceAll(" ").trim
      if (text.nonEmpty) {
        nBlocks += 1
        // collapse guarantees single-space separation: words = spaces+1
        var nWords = 1L
        var nStop = 0L
        var i = 0
        var wStart = 0
        def countWord(w: String): Unit =
          if (HtmlStopSet.contains(w.toLowerCase(java.util.Locale.ROOT)))
            nStop += 1
        while (i < text.length) {
          if (text.charAt(i) == ' ') {
            nWords += 1
            countWord(text.substring(wStart, i))
            wStart = i + 1
          }
          i += 1
        }
        countWord(text.substring(wStart))
        // link density over the RAW (undecoded) tag-stripped block —
        // both sides of the inequality from the same representation
        val rawText = HtmlTagRe.matcher(b).replaceAll("")
        val rawChars = rawText.codePointCount(0, rawText.length).toLong
        var linkChars = 0L
        val m = HtmlAnchorRe.matcher(b)
        while (m.find()) {
          val lt = HtmlTagRe.matcher(m.group).replaceAll("")
          linkChars += lt.codePointCount(0, lt.length)
        }
        if (nWords >= minWords && 3L * linkChars <= rawChars &&
            20L * nStop >= nWords) {
          nKept += 1
          if (out.length > 0) out.append('\n')
          out.append(text)
        }
      }
      bi += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(out.toString), nBlocks, nKept)
  }

  /** Per-pair add-one-smoothed bigram surprisal sum over `s` against a
    * published [[DsirModel]] — the MAP-ONLY twin of the join form in
    * [[graft.ops.TextOps.dsirWeights]] (which it must equal bit-for-bit;
    * spec-pinned): tokenize exactly like `TextOps.tokens` (split on the
    * single space, trailing empties kept) with the `<s>` sentinel
    * prepended, look each (ctx, tok) pair and its context up in the
    * model's sorted arrays (binary search, in place), and accumulate
    * `log2q(c_ctx + max(vocab,1), c_pair + 1, fracBits)`. No join, no
    * explode, no exchange — legal in a Structured Streaming plan, one
    * codegen pass per arriving document. Returns (n_tokens, bits_q). */
  def dsirBitsQ(s: UTF8String, m: DsirModel,
      fracBits: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = s.toString.split(" ", -1)
    val v = math.max(m.vocab, 1L)
    var bits = 0L
    var ctx = "<s>"
    var i = 0
    while (i < toks.length) {
      val cPair = m.pairCount(ctx + " " + toks(i))
      val cCtx = m.ctxCount(ctx)
      bits += log2q(cCtx + v, cPair + 1L, fracBits)
      ctx = toks(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(toks.length.toLong, bits)
  }

  /** Exact unigram-LM (SentencePiece-style) word segmentation — the
    * non-BPE tokenizer, as ONE Viterbi DP per space-split word in exact
    * Q16 fixed point: maximize the summed piece scores over all
    * segmentations of the word, with any single character missing from
    * the vocabulary acting as the `<unk>` fallback at `unkScoreQ`
    * (guarantees every word segments — SentencePiece's character
    * coverage). Objective is totally ordered: maximize score, then
    * minimize piece count; among remaining path ties the earliest
    * (longest-first) split wins — deterministic, and the output pair
    * (n_pieces, score_q) is tie-free by construction, which is what the
    * DuckDB oracle replays (the piece PATH is spec-pinned on fixtures).
    * Exact longs only; word offsets are UTF-16 like the rest of the
    * word-level ops (identical to codepoints on the BMP corpora the
    * oracle covers). Returns (pieces, n_pieces, score_q). */
  def unigramEncode(s: UTF8String, v: UnigramVocab,
      unkScoreQ: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val words = s.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var nPieces = 0L
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      val L = w.length
      if (L > 0) {
        val dpS = new Array[Long](L + 1)
        val dpN = new Array[Long](L + 1)
        val back = new Array[Int](L + 1)
        var i = 1
        while (i <= L) {
          var bestS = Long.MinValue
          var bestN = Long.MinValue
          var bestJ = -1
          var j = math.max(0, i - v.maxLen)
          while (j < i) {
            val piece = w.substring(j, i)
            val vs = v.score(piece)
            val sc =
              if (vs != UnigramVocab.NoScore) vs
              else if (i - j == 1) unkScoreQ
              else Long.MinValue
            if (sc != Long.MinValue && dpS(j) != Long.MinValue) {
              val cs = dpS(j) + sc
              val cn = dpN(j) - 1L
              if (cs > bestS || (cs == bestS && cn > bestN)) {
                bestS = cs; bestN = cn; bestJ = j
              }
            }
            j += 1
          }
          dpS(i) = bestS; dpN(i) = bestN; back(i) = bestJ
          i += 1
        }
        // reconstruct the winning path back from the end of the word
        var pos = L
        var cut = out.length
        while (pos > 0) {
          val j = back(pos)
          out.insert(cut, UTF8String.fromString(w.substring(j, pos)))
          pos = j
        }
        nPieces += -dpN(L)
        total += dpS(L)
      }
      wi += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray),
      nPieces, total)
  }

  /** MinHash permutation parameters for slot j: a_j odd-ish multiplier,
    * b_j offset, both mod [[RehashP]] — the single source of truth
    * shared by the kernel below and the DuckDB oracle builders
    * (DedupOps.minhashParams delegates here). Consumers first reduce the
    * 61-bit string hash mod RehashP, so every product
    * (h mod RehashP)·a_j stays under 2^60 — overflow-free in plain Long
    * Column arithmetic and DuckDB BIGINT alike. */
  def minhashA(j: Int): Long = {
    val a = (A * (2 * j + 1)) % RehashP
    if (a == 0) 1L else a
  }
  def minhashB(j: Int): Long = (A * A % RehashP * (j + 7)) % RehashP

  /** MinHash signature of the doc's word k-shingles in one pass:
    * mins over (h * a_j + b_j) mod P for each permutation j. Returned
    * NESTED — an outer array holding zero (no shingles: docs shorter
    * than k words, which the old exploded aggregate dropped) or one
    * signature array — so `explode` drops empty docs while evaluating
    * the kernel exactly once per row (a separate size() filter would be
    * pushed below the projection and re-evaluate the kernel).
    */
  def minhashSignature(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val grams = shingleHashes(s, k)
    val m = grams.numElements()
    if (m == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { as(j) = minhashA(j); bs(j) = minhashB(j); j += 1 }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = grams.getLong(i) % RehashP // rehash field: products < 2^60
      j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % RehashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](ArrayData.toArrayData(mins)))
  }

  /** Bloom-membership hit count: how many grams have ALL `probes` bloom
    * positions set in `bm` (an array of 64-bit words, bit i of word w =
    * position w*64+i). Probe j's position is
    * ((h * minhashA(j) + minhashB(j)) mod P) mod m — the minhash
    * permutation family doubling as the bloom hash family, so the DuckDB
    * oracle reproduces every position with the same published params.
    * Callers pass an already-distinct gram array when counting DISTINCT
    * contaminated grams. m must be a multiple of 64 matching bm's size.
    */
  def bloomHits(grams: ArrayData, bm: ArrayData, probes: Int, m: Long): Long = {
    val n = grams.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      val h = grams.getLong(i) % RehashP // rehash field: products < 2^60
      var all = true
      var j = 0
      while (all && j < probes) {
        val pos = ((h * minhashA(j) + minhashB(j)) % RehashP) % m
        if (((bm.getLong((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
          all = false
        j += 1
      }
      if (all) hits += 1
      i += 1
    }
    hits
  }

  /** Scatter sparse (word-index, bits) entries into a dense length-n
    * bitmap array — O(n + entries), where the map_from_entries +
    * per-index element_at formulation is O(n · entries) (Catalyst map
    * lookup is a linear scan). Entries are structs (w, bits); w out of
    * [0, n) throws rather than silently truncating the bitmap.
    */
  def bitmapFromEntries(entries: ArrayData, n: Int): ArrayData = {
    val out = new Array[Long](n)
    val cnt = entries.numElements()
    var i = 0
    while (i < cnt) {
      // fail fast on null slots: ArrayData.getLong reads a null slot as
      // 0, which would silently OR bits into word 0 (a corrupt bitmap)
      require(!entries.isNullAt(i), s"null entry at $i in bitmap entries")
      val e = entries.getStruct(i, 2)
      require(!e.isNullAt(0) && !e.isNullAt(1),
        s"null field in bitmap entry at $i")
      val w = e.getLong(0)
      require(w >= 0 && w < n, s"bitmap word index $w out of [0, $n)")
      out(w.toInt) |= e.getLong(1)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Exact dot product of two long arrays (quantized embeddings). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Unit-sphere re-quantization of an already-quantized vector in ONE
    * O(dim) pass: n2 = Σx², then round(x / sqrt(n2) · scale) per
    * element — bit-identical to the composed
    * `transform(v, x -> x/sqrt(n2)) |> quantize` form (same widenings,
    * same exactly-rounded divide, same math.round), which evaluates
    * interpreted AND re-derives n2 per element when the norm expression
    * gets inlined into the lambda (O(dim²) per row). Zero norm → the
    * all-zero vector. The Σx² accumulation is EXACT-OVERFLOW-CHECKED
    * (addExact/multiplyExact intrinsics): a raw element ≥ ~3e9 — an
    * embedding quantized at a wildly wrong scale — would otherwise
    * wrap the long sum and silently emit an all-zero or mis-normalized
    * vector; the library's no-silent-mis-scoring contract says fail
    * loudly instead. (|x| ≲ 3.8e8 also keeps dim ≤ 64 sums exact; the
    * 1e-4-grid unit vectors every caller feeds are ≤ ~1e4.) */
  def unitQuantize(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    try {
      while (i < n) {
        val x = a.getLong(i)
        s = Math.addExact(s, Math.multiplyExact(x, x)); i += 1
      }
    } catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"unitQuantize: Σx² overflows long at element $i (|x| too large " +
          "for the quantization grid — was the vector quantized at the " +
          "wrong scale?)")
    }
    val out = new Array[Long](n)
    if (s > 0L) {
      val nrm = math.sqrt(s.toDouble)
      i = 0
      while (i < n) {
        out(i) = math.round(a.getLong(i).toDouble / nrm * scale)
        i += 1
      }
    }
    ArrayData.toArrayData(out)
  }

  /** Product-quantization ADC score: `lut` is the per-query lookup
    * table (array<array<bigint>>, one row per subspace, one entry per
    * sub-codebook centroid — exact integer dot products precomputed
    * ONCE per query), `code` the corpus row's PQ code (array<int>, one
    * dense centroid index per subspace). Returns Σ_j lut[j][code[j]] —
    * the asymmetric-distance approximation of the full dot product in m
    * adds instead of `dim` multiplies per scored pair. Exact long
    * arithmetic; malformed codes (null slot, index outside the lut row)
    * throw rather than silently mis-scoring. */
  def pqAdcScore(lut: ArrayData, code: ArrayData): Long = {
    val m = code.numElements()
    require(lut.numElements() == m,
      s"ADC lut has ${lut.numElements()} subspaces, code has $m")
    var s = 0L
    var j = 0
    while (j < m) {
      require(!code.isNullAt(j), s"null PQ code at subspace $j")
      val cj = code.getInt(j)
      val row = lut.getArray(j)
      require(cj >= 0 && cj < row.numElements(),
        s"PQ code $cj out of [0, ${row.numElements()}) at subspace $j")
      // getLong on a null slot reads 0 — that would be the silent
      // mis-scoring this kernel's contract forbids
      require(!row.isNullAt(cj), s"null ADC lut entry at subspace $j index $cj")
      s += row.getLong(cj)
      j += 1
    }
    s
  }

  /** Quantize a float/double array to exact integers at `scale`
    * resolution: round(double(x) * scale). Bit-deterministic (widening
    * is exact, one exactly-rounded multiply, ties never hit on binary
    * float inputs). */
  def quantizeFloat(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.round(a.getFloat(i).toDouble * scale); i += 1 }
    ArrayData.toArrayData(out)
  }

  def quantizeDouble(a: ArrayData, scale: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.round(a.getDouble(i) * scale); i += 1 }
    ArrayData.toArrayData(out)
  }

  /** All `win`-word windows of a single-space-tokenized text whose start
    * offset is a multiple of `stride`, as space-joined strings. Splits
    * ONCE per row — the composed `transform(sequence, i =>
    * concat_ws(slice(ws, i, win)))` form re-evaluates the split per
    * window (the interpreted-HOF trap: arrays referenced inside lambda
    * bodies are recomputed per element), O(words²) per document. */
  def windowPassages(s: UTF8String, win: Int, stride: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val n = words.length
    if (n < win) return ArrayData.toArrayData(Array.empty[UTF8String])
    val count = (n - win) / stride + 1
    val out = new Array[UTF8String](count)
    var o = 0
    var i = 0
    while (o < count) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < win) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(o) = UTF8String.fromString(sb.toString)
      i += stride
      o += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Morton/Z-order interleave of two non-negative ints: bit i of `a`
    * lands at output bit 2i, bit i of `b` at 2i+1, for the low `bits`
    * bits of each (values are clamped into [0, 2^bits) first — the
    * curve needs a bounded domain; callers pre-scale). Adjacent
    * z-values are 2-D-local, which is what makes min/max row-group
    * stats selective on BOTH dimensions after a z-sort. */
  def zInterleave(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val x = math.min(math.max(a, 0L), mask)
    val y = math.min(math.max(b, 0L), mask)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Fixed-point base-2 log of a rational: floor-approx of
    * 2^fracBits * log2(num/den) for longs num >= den >= 1, computed
    * with ONLY exactly-rounded IEEE double ops so the result is
    * bit-reproducible across engines (the DuckDB oracle replays the
    * identical op sequence):
    *  - integer exponent e = floor(log2(num/den)) via the exact
    *    identity floor(log2(n/d)) = bitlength(n div d) - 1;
    *  - mantissa m = (num/den as ONE rounded IEEE division) / 2^e
    *    (power-of-two scaling is exact), m in [1, 2];
    *  - fracBits rounds of the classic square-and-compare digit
    *    recurrence (x*x exactly rounded; conditional x/2 exact).
    * The n-gram LM surprisal kernel: -log2 p = log2q(den_p, num_p).
    */
  def log2q(num: Long, den: Long, fracBits: Int): Long = {
    // loud precondition, not silent garbage: den=0 would be an opaque
    // codegen '/ by zero', num < den would alias every sub-1 ratio to
    // the same wrong constant via the negative-exponent shift mask
    if (den < 1 || num < den)
      throw new IllegalArgumentException(
        s"log2q needs num >= den >= 1, got num=$num den=$den")
    val q = num / den
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    var x = (num.toDouble / den.toDouble) / (1L << e).toDouble
    var y = 0L
    var i = 0
    while (i < fracBits) {
      x = x * x
      if (x >= 2.0) { x = x / 2.0; y = y * 2 + 1 } else y = y * 2
      i += 1
    }
    (e.toLong << fracBits) + y
  }

  /** Feature-hashing bag-of-words embedding (the "hashing trick" —
    * Weinberger et al., ICML 2009): each whitespace token t contributes
    * sign(t) at bucket(t), with bucket = charHash(t) mod dim and sign =
    * ±1 from the next hash bit ((charHash(t) / dim) mod 2) — the signed
    * variant keeps the inner product unbiased. One pass, no token array
    * materialized; exact integer counts, so the oracle reproduces the
    * vector bit-for-bit from the same charHash formula. */
  def hashEmbedding(s: UTF8String, dim: Int): ArrayData = {
    val str = s.toString
    val acc = new Array[Long](dim)
    var start = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        // token = str[start, i): stream its charHash without substring
        var h = 0L
        var ci = start
        while (ci < i) {
          val cp = str.codePointAt(ci)
          h = foldStep(h, cp)
          ci += Character.charCount(cp)
        }
        h = finalizeHash(h)
        val bucket = (h % dim).toInt
        acc(bucket) += (if ((h / dim) % 2 == 0) 1L else -1L)
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(acc)
  }

  /** Unicode text normalization in one pass: NFC compose (UAX #15 —
    * same algorithm DuckDB's utf8proc `nfc_normalize` implements),
    * codepoint-wise SIMPLE lower-casing (`Character.toLowerCase` — the
    * UnicodeData 1:1 mapping, matching utf8proc's `lower`; Java's
    * String.toLowerCase FULL mapping would diverge on e.g. U+0130), and
    * trim + collapse of ASCII whitespace runs `[ \t\n\r]+` to a single
    * space. */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    var started = false
    val n = nfc.length
    while (i < n) {
      val cp = nfc.codePointAt(i)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') {
        pendingSpace = true
      } else {
        if (pendingSpace && started) sb.append(' ')
        sb.appendCodePoint(Character.toLowerCase(cp))
        started = true
        pendingSpace = false
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** 1-D difference hash (dHash) in one pass: sample `bits`+1 evenly
    * spaced codepoints (index i·(n−1) div bits — exact integer
    * positions), set bit i when sample i > sample i+1. The codepoint
    * array is collected ONCE per row — the composed builtin form
    * (array of 49 `ascii(substr(...))` + 48 `element_at` comparisons)
    * re-inlines the array construction into every reference under
    * project collapse, turning 49 substring scans into ~4700. Empty
    * strings hash to 0 (callers filter them — no perceptual content).
    */
  def dhashBits(s: UTF8String, bits: Int): Long = {
    val str = s.toString
    val len = str.length
    val cps = new Array[Int](str.codePointCount(0, len))
    var i = 0
    var j = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    val n = cps.length
    if (n == 0) return 0L
    var out = 0L
    var b = 0
    var prev = cps(0)
    while (b < bits) {
      val next = cps((((b + 1).toLong * (n - 1)) / bits).toInt)
      if (prev > next) out |= 1L << b
      prev = next
      b += 1
    }
    out
  }

  /** Byte-BPE token statistics in one text pass: [n_words, n_bpe_tokens]
    * under a rank-ordered merges table (flat [a0,b0,a1,b1,…]).
    *
    * Encoding is canonical Sennrich BPE (subword-nmt): each word starts
    * as its codepoint sequence; each merge rule, in rank order, replaces
    * ALL adjacent (a,b) occurrences (leftmost-first passes to fixpoint).
    * Every rule must have a ≠ b — equal-sided rules make leftmost
    * tie-breaking order-sensitive across implementations (the oracle's
    * string-replace form would diverge on runs like "aaaa"); with a ≠ b
    * occurrences are disjoint and the fixpoint is unique, so the SQL
    * `replace`-to-fixpoint oracle reproduces these counts exactly.
    *
    * Words are single-space-separated substrings; empty words (leading/
    * double/trailing spaces) contribute nothing. Multi-pass cost is
    * bounded: with a ≠ b the second pass only sweeps up occurrences
    * whose shared-boundary neighbor was consumed, so each rule is O(word
    * length) amortized; whole kernel O(rules × length) per row, map-only.
    */
  def bpeTokenStats(s: UTF8String, merges: Array[String]): ArrayData = {
    val text = s.toString
    val cache = bpeCacheTL.get()
    cache.resetIfChanged(merges, null)
    var nWords = 0L
    var nTok = 0L
    val n = text.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          nWords += 1
          val w = text.substring(start, i)
          var c = cache.counts.get(w)
          if (c == null) {
            c = java.lang.Long.valueOf(
              bpeWordTokenCount(text, start, i, merges))
            cache.putCount(w, c)
          }
          nTok += c.longValue()
        }
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(Array(nWords, nTok))
  }

  /** Per-task BPE memo (guide-§4.5 heavyweight-state amortization):
    * word→ids / word→count results of the PURE word tokenization under
    * ONE merges table. Words repeat heavily in natural text, so the
    * per-word Sennrich fixpoint (O(rules × length) with per-pass
    * allocation) runs once per DISTINCT word per task instead of once
    * per occurrence. Thread-local (codegen calls these kernels from
    * many task threads); keyed by the merges/ids REFERENCE identity —
    * the Expression ships both as reference objects, so within a task
    * they are fixed, and a different merges table (another query, the
    * trainer's growing table) resets the memo. Size-capped with
    * clear-on-overflow: bounded memory, amortized O(1), and a cleared
    * memo only costs recomputation — results are identical with or
    * without the cache (pure function), so this cannot change any
    * query's output. */
  private final class BpeMemo {
    var merges: Array[String] = null
    var ids: java.util.HashMap[String, java.lang.Long] = null
    val words = new java.util.HashMap[String, Array[Long]]()
    val counts = new java.util.HashMap[String, java.lang.Long]()
    def resetIfChanged(m: Array[String],
        i: java.util.HashMap[String, java.lang.Long]): Unit = {
      if ((merges ne m) || ((i ne null) && (ids ne i))) {
        words.clear(); counts.clear()
        merges = m
        if (i ne null) ids = i
      } else if ((i ne null) && (ids eq null)) ids = i
    }
    private val Cap = 1 << 16
    def putWord(w: String, v: Array[Long]): Unit = {
      if (words.size >= Cap) words.clear()
      words.put(w, v)
    }
    def putCount(w: String, v: java.lang.Long): Unit = {
      if (counts.size >= Cap) counts.clear()
      counts.put(w, v)
    }
  }

  private val bpeCacheTL: ThreadLocal[BpeMemo] =
    new ThreadLocal[BpeMemo] { override def initialValue(): BpeMemo = new BpeMemo }

  /** BPE token SEQUENCE of one word (no spaces expected) under the
    * merges table — the training loop's re-tokenizer ([[bpeTokenStats]]
    * only needs counts; pair counting needs the tokens themselves). */
  def bpeWordTokens(s: UTF8String, merges: Array[String]): ArrayData = {
    val str = s.toString
    val toks = bpeWordTokenList(str, 0, str.length, merges)
    val out = new Array[AnyRef](toks.size)
    var i = 0
    while (i < toks.size) {
      out(i) = UTF8String.fromString(toks.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def bpeWordTokenCount(text: String, from: Int, to: Int,
      merges: Array[String]): Long =
    bpeWordTokenList(text, from, to, merges).size.toLong

  private def bpeWordTokenList(text: String, from: Int, to: Int,
      merges: Array[String]): java.util.ArrayList[String] = {
    var toks = new java.util.ArrayList[String](to - from)
    var j = from
    while (j < to) {
      val cp = text.codePointAt(j)
      val w = Character.charCount(cp)
      toks.add(text.substring(j, j + w))
      j += w
    }
    var r = 0
    while (r + 1 < merges.length) {
      val a = merges(r)
      val b = merges(r + 1)
      var changed = true
      while (changed && toks.size > 1) {
        changed = false
        // find the first (a, b) adjacency WITHOUT allocating: most rules
        // never fire on a given word, and the original
        // always-allocate-a-pass ArrayList dominated the kernel's
        // profile (31 rules × one ArrayList + full copy per word)
        val sz = toks.size
        var first = -1
        var t = 0
        while (first < 0 && t + 1 < sz) {
          if (toks.get(t) == a && toks.get(t + 1) == b) first = t
          t += 1
        }
        if (first >= 0) {
          // same leftmost-first pass as before, prefix copied verbatim
          val out = new java.util.ArrayList[String](sz)
          var u = 0
          while (u < first) { out.add(toks.get(u)); u += 1 }
          while (u < sz) {
            if (u + 1 < sz && toks.get(u) == a && toks.get(u + 1) == b) {
              out.add(a + b)
              u += 2
              changed = true
            } else {
              out.add(toks.get(u))
              u += 1
            }
          }
          toks = out
        }
      }
      r += 2
    }
    toks
  }

  /** One-pass codepoint script-class counts (see
    * [[graft.functions.ScriptClassCounts]] for the class table): a
    * 7-long array [latin, cyrillic, cjk, arabic, digit, space, other]
    * counted per CODEPOINT (surrogate pairs advance once). Explicit
    * range arithmetic — not Java \\p{Script} classes — so the DuckDB
    * oracle replays the exact same buckets from `unicode(ch)`. */
  def scriptClassCounts(s: UTF8String): ArrayData = {
    val text = s.toString
    val out = new Array[Long](7)
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      val cls =
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= 0xC0 && cp <= 0x24F && cp != 0xD7 && cp != 0xF7))
          0 // Latin + Latin-1/Extended-A/B, minus the two non-letter
            // symbols embedded in Latin-1 (U+00D7 ×, U+00F7 ÷) — math-
            // symbol-heavy text must not skew the letter-script argmax
        else if (cp >= 0x400 && cp <= 0x52F) 1 // Cyrillic + Supplement
        else if ((cp >= 0x4E00 && cp <= 0x9FFF) ||
            (cp >= 0x3040 && cp <= 0x30FF)) 2 // CJK ideographs + kana
        else if (cp >= 0x600 && cp <= 0x6FF) 3 // Arabic
        else if (cp >= '0' && cp <= '9') 4
        else if (cp == ' ') 5
        else 6
      out(cls) += 1
      i += Character.charCount(cp)
    }
    ArrayData.toArrayData(out)
  }

  /** Whole-document BPE token-ID sequence (see [[graft.functions.BpeTokenIds]]
    * for the id scheme): words exactly as in [[bpeTokenStats]], per-word
    * canonical Sennrich encode, each token mapped to its id — a
    * single-codepoint token to its codepoint value, a merged token
    * through the rank-derived id map the Expression precomputes. */
  def bpeDocTokenIds(s: UTF8String, merges: Array[String],
      ids: java.util.HashMap[String, java.lang.Long]): ArrayData =
    bpeDocTokenIds(s, merges, ids, false)

  /** `lossless = true` additionally emits every U+0020 space as its own
    * single-codepoint token (id 32) in stream position — merge tokens
    * can never contain a space ([[graft.functions.BpeTokenStats.legalToken]]),
    * so the word-token subsequence is IDENTICAL to the lossless=false
    * stream and `decode(encode(text))` reconstructs the document
    * byte-for-byte (tabs/newlines already ride inside words as
    * unmergeable single-codepoint tokens in both modes). */
  def bpeDocTokenIds(s: UTF8String, merges: Array[String],
      ids: java.util.HashMap[String, java.lang.Long],
      lossless: Boolean): ArrayData = {
    val text = s.toString
    val cache = bpeCacheTL.get()
    cache.resetIfChanged(merges, ids)
    val n = text.length
    var buf = new Array[Long](math.max(8, n / 2))
    var len = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val w = text.substring(start, i)
          var idsArr = cache.words.get(w)
          if (idsArr == null) {
            idsArr = bpeWordIds(w, merges, ids)
            cache.putWord(w, idsArr)
          }
          if (len + idsArr.length > buf.length)
            buf = java.util.Arrays.copyOf(buf,
              math.max(buf.length * 2, len + idsArr.length))
          System.arraycopy(idsArr, 0, buf, len, idsArr.length)
          len += idsArr.length
        }
        if (i < n && lossless) {
          if (len == buf.length)
            buf = java.util.Arrays.copyOf(buf, buf.length * 2)
          buf(len) = 32L // the space token rides the stream in position
          len += 1
        }
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(
      if (len == buf.length) buf else java.util.Arrays.copyOf(buf, len))
  }

  /** One word's BPE token-id sequence (the memoized unit of
    * [[bpeDocTokenIds]]): the Sennrich fixpoint then the id map —
    * identical arithmetic to the previous inline loop, factored so the
    * per-task memo caches the RESULT per distinct word. Mode-free: the
    * lossless space tokens live BETWEEN words, so one cache serves both
    * encode modes. */
  private def bpeWordIds(w: String, merges: Array[String],
      ids: java.util.HashMap[String, java.lang.Long]): Array[Long] = {
    val toks = bpeWordTokenList(w, 0, w.length, merges)
    val arr = new Array[Long](toks.size)
    var j = 0
    while (j < arr.length) {
      val tok = toks.get(j)
      arr(j) =
        if (tok.codePointCount(0, tok.length) == 1) tok.codePointAt(0).toLong
        else {
          val v = ids.get(tok)
          if (v == null) throw new IllegalStateException(
            s"BPE token '$tok' missing from the merge-derived vocabulary — " +
              "impossible under a consistent merges table")
          v.longValue()
        }
      j += 1
    }
    arr
  }

  /** Count of card-pattern matches passing the Luhn mod-10 checksum —
    * the verification layer on top of the structural card regex (a
    * random 16-digit group passes Luhn 1 time in 10; a real PAN always
    * does). Digits are taken right-to-left, every second doubled with
    * the >9 − 9 fold; separators are stripped first. */
  def luhnCardCount(s: UTF8String, p: java.util.regex.Pattern): Long = {
    val m = p.matcher(s.toString)
    var n = 0L
    while (m.find()) if (luhnOk(m.group())) n += 1
    n
  }

  private def luhnOk(c: String): Boolean = {
    val ds = c.filter(Character.isDigit)
    if (ds.length < 13) false
    else {
      var sum = 0
      var i = 0
      while (i < ds.length) {
        var d = ds.charAt(ds.length - 1 - i) - '0'
        if (i % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        i += 1
      }
      sum % 10 == 0
    }
  }

  /** Element-wise id remap through a precomputed table (the dense-
    * vocabulary materialization step): every id must be covered — a
    * miss fails loudly, because a silently-invented id would corrupt a
    * training corpus undetectably. */
  def remapIds(arr: ArrayData,
      map: java.util.HashMap[java.lang.Long, java.lang.Long]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = map.get(java.lang.Long.valueOf(arr.getLong(i)))
      if (v == null) throw new IllegalStateException(
        s"id ${arr.getLong(i)} is not in the remap table — rebuild the " +
          "vocabulary over the corpus being remapped")
      out(i) = v.longValue()
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Inverse of [[bpeDocTokenIds]]: ids back to text — a codepoint id
    * (< 0x110000) appends its codepoint, a merged id appends its
    * rank-derived token string from the precomputed reverse map. On a
    * `lossless = true` stream this reconstructs the document
    * byte-for-byte; on the legacy stream it reconstructs it modulo
    * spaces (words concatenated). Unknown / invalid ids fail loudly —
    * decode under the wrong merges table must never fabricate text. */
  def bpeDecodeIds(arr: ArrayData,
      rev: java.util.HashMap[java.lang.Long, String]): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val id = arr.getLong(i)
      if (id >= 0L && id < 0x110000L) {
        sb.appendCodePoint(id.toInt)
      } else {
        val s = rev.get(java.lang.Long.valueOf(id))
        if (s == null) throw new IllegalStateException(
          s"token id $id is not in the merge-derived vocabulary — " +
            "decoding under a different merges table than the encoder's?")
        sb.append(s)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd TextOps.charHash (custom Catalyst Expression — the brief's
  * preference (b): native Expression with doGenCode over UDFs). */
/** Codegen'd IDN (punycode) host normalization: `java.net.IDN.toASCII`
  * (IDNA, in the JDK — zero new dependencies) over the whole host,
  * lowercased — `bücher.example` and `xn--bcher-kva.example` land on
  * the same canonical ASCII form, so internationalized mirrors of the
  * same site collapse under URL dedup and match ASCII blocklists. A
  * host IDNA rejects (overlong label, stray dot shapes) passes through
  * LOWERCASED but otherwise unchanged — conservative, never lossy, and
  * total on crawl garbage. KERNEL-ONLY by design: DuckDB has no IDNA,
  * so this is an OPT-IN rule (`graft.ops.UrlOps.idnAsciiHost`) outside
  * the oracle-replayed canonicalizer chain; the spec pins RFC-vector
  * behavior and idempotence instead. */
case class IdnAscii(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"idn_ascii needs string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.idnAscii(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.idnAscii($c)")
  override protected def withNewChildInternal(newChild: Expression): IdnAscii =
    copy(child = newChild)
}

/** Codegen'd URL percent-normalization (see
  * [[HashKernels.percentNormalize]]): byte-exact to the
  * `graft.ops.UrlOps.PercentRules` regex chain (spec-pinned, fuzzed),
  * one pass per rule with no regex machinery — the Spark-side fast
  * path under `UrlOps.canonicalizeUrl`; the DuckDB oracle keeps
  * replaying the rule list itself. */
case class PercentNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"percent_normalize needs string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.percentNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.percentNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): PercentNormalize =
    copy(child = newChild)
}

case class WeightedCharHash(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"weighted_char_hash needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.weightedCharHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.weightedCharHash($c)")
  override protected def withNewChildInternal(newChild: Expression): WeightedCharHash =
    copy(child = newChild)
}

/** Codegen'd word-k-shingle hash array (see HashKernels.shingleHashes);
  * equals `transform(wordShingles(text,k), charHash)` element-for-element
  * (pinned by TextOpsSpec) but splits the text exactly once per row. */
case class ShingleHashArray(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashArray =
    copy(child = newChild)
}

/** Codegen'd multi-word occurrence counter (see HashKernels.wordCounts):
  * one text pass for the whole word list instead of one interpreted
  * `filter` lambda per word. Word list is a literal parameter, shipped
  * into generated code as a reference object. */
case class WordOccurrenceCounts(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.forall(_.nonEmpty), "words must be non-empty")
  private lazy val wordsArr: Array[String] = words.toArray
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_counts needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.wordCounts(input.asInstanceOf[UTF8String], wordsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWords", wordsArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.wordCounts($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordOccurrenceCounts =
    copy(child = newChild)
}

/** Codegen'd one-pass byte-BPE token statistics (see
  * HashKernels.bpeTokenStats): [n_words, n_bpe_tokens] under a
  * rank-ordered merges table. The merges table ships into generated code
  * as a reference object — the same broadcast-small-model shape as
  * [[WordOccurrenceCounts]] (and TextOps.classifierScore); a production
  * 50k-rule vocabulary rides the same mechanism unchanged. */
case class BpeTokenStats(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  // empty allowed: zero rules = codepoint-level tokenization — what an
  // exhausted [[graft.ops.TextOps.trainBpeMerges]] legitimately returns
  require(merges.length % 2 == 0,
    "merges must be a flat [a0,b0,a1,b1,…] pair list (possibly empty)")
  require(merges.forall(BpeTokenStats.legalToken),
    "merge tokens must be non-empty and free of ' '/',' and control " +
      "characters (the graft_bpe_token_stats SQL registration parses the " +
      "table from a ','/' '-delimited literal — a token carrying a " +
      "delimiter could never round-trip through it)")
  require(merges.grouped(2).forall(p => p.length < 2 || p(0) != p(1)),
    "merge rules need a != b (equal sides make leftmost merge order " +
      "implementation-dependent — the oracle could not reproduce counts)")
  private lazy val mergesArr: Array[String] = merges.toArray
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_stats needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeTokenStats(input.asInstanceOf[UTF8String], mergesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeMerges", mergesArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.bpeTokenStats($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenStats =
    copy(child = newChild)
}

object BpeTokenStats {
  /** The merge-token alphabet contract shared by every BPE kernel AND
    * the trainer: non-empty, no ' ' (the within-pair delimiter), no ','
    * (the between-pair delimiter), no single quote (the in-repo
    * interpolation pattern feeds trained tables into
    * `graft_bpe_token_stats(text, '<table>')` verbatim — a quoted rule
    * would malform the literal), no control characters — exactly the
    * tokens the SQL string-literal registration can round-trip. */
  def legalToken(m: String): Boolean =
    m.nonEmpty && m.forall(c =>
      c > ' ' && (c < '\u007f' || c > '\u009f') && c != ',' && c != '\'')
}

/** Codegen'd per-word BPE token sequence (see HashKernels.bpeWordTokens)
  * — the training loop's re-tokenizer; same merges-as-reference-object
  * mechanism and a ≠ b constraint as [[BpeTokenStats]]. */
case class BpeWordTokens(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.length % 2 == 0,
    "merges must be a flat [a0,b0,a1,b1,…] pair list (possibly empty)")
  require(merges.forall(BpeTokenStats.legalToken),
    "merge tokens must be non-empty and free of ' '/',' and control " +
      "characters (see BpeTokenStats.legalToken)")
  require(merges.grouped(2).forall(p => p.length < 2 || p(0) != p(1)),
    "merge rules need a != b")
  private lazy val mergesArr: Array[String] = merges.toArray
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_word_tokens needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeWordTokens(input.asInstanceOf[UTF8String], mergesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeMerges", mergesArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.bpeWordTokens($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeWordTokens =
    copy(child = newChild)
}

/** Codegen'd whole-document BPE token-ID sequence (see
  * HashKernels.bpeDocTokenIds): tokenizes exactly like [[BpeTokenStats]]
  * and maps every token to a STABLE integer id — a single-codepoint
  * token to its codepoint value (0 … 0x10FFFF), a merged token to
  * `VocabBase + r` where r is the lowest rank of a rule producing that
  * string (two rules CAN produce the same string, e.g. a+bc and ab+c;
  * min-rank makes the map single-valued on both sides of the oracle).
  * Ids are a pure function of the merges table — appending rules never
  * renumbers existing ids, so sequences encoded under a vocabulary
  * prefix stay valid — and the map is replayable in SQL from the same
  * rules literal, which is what makes packed training sequences
  * hash-comparable. Merges and the precomputed id map ship into
  * generated code as reference objects. */
case class BpeTokenIds(child: Expression, merges: Seq[String],
    lossless: Boolean = false)
    extends UnaryExpression {
  require(merges.length % 2 == 0,
    "merges must be a flat [a0,b0,a1,b1,…] pair list (possibly empty)")
  require(merges.forall(BpeTokenStats.legalToken),
    "merge tokens must be non-empty and free of ' '/',' and control " +
      "characters (see BpeTokenStats.legalToken)")
  require(merges.grouped(2).forall(p => p.length < 2 || p(0) != p(1)),
    "merge rules need a != b")
  private lazy val mergesArr: Array[String] = merges.toArray
  private lazy val idMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var r = 0
    while (r + 1 < merges.length) {
      // putIfAbsent = min rank wins when two rules emit the same string
      m.putIfAbsent(merges(r) + merges(r + 1),
        java.lang.Long.valueOf(BpeTokenIds.VocabBase + r / 2))
      r += 2
    }
    m
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_ids needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeDocTokenIds(input.asInstanceOf[UTF8String], mergesArr, idMap, lossless)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("graftBpeMerges", mergesArr, "java.lang.String[]")
    val iref = ctx.addReferenceObj("graftBpeIds", idMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.bpeDocTokenIds($c, $mref, $iref, $lossless)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenIds =
    copy(child = newChild)
}

/** Codegen'd inverse of [[BpeTokenIds]] (see HashKernels.bpeDecodeIds):
  * a token-id array back to its text. Byte-exact on a `lossless`
  * encode; words-concatenated on the legacy (space-dropping) encode.
  * The reverse map covers EVERY rule rank (not just min-rank winners):
  * any id the id scheme could ever have assigned decodes to its rule's
  * output string; ids outside both the codepoint space and the rank
  * range fail loudly. */
case class BpeDecodeIds(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.length % 2 == 0,
    "merges must be a flat [a0,b0,a1,b1,…] pair list (possibly empty)")
  require(merges.forall(BpeTokenStats.legalToken),
    "merge tokens must be non-empty and free of ' '/',' and control " +
      "characters (see BpeTokenStats.legalToken)")
  private lazy val revMap: java.util.HashMap[java.lang.Long, String] = {
    val m = new java.util.HashMap[java.lang.Long, String]()
    var r = 0
    while (r + 1 < merges.length) {
      m.put(java.lang.Long.valueOf(BpeTokenIds.VocabBase + r / 2),
        merges(r) + merges(r + 1))
      r += 2
    }
    m
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode needs array<long>, got $other")
    }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.bpeDecodeIds(input.asInstanceOf[ArrayData], revMap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("graftBpeRev", revMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.bpeDecodeIds($c, $rref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
    copy(child = newChild)
}

/** Codegen'd one-pass codepoint script-class counter (see
  * HashKernels.scriptClassCounts): [latin, cyrillic, cjk, arabic,
  * digit, space, other] — the charset-distribution curation signal
  * complementary to the marker-word language ID (a Russian document
  * with zero marker hits still reads 90%+ cyrillic). Classes are
  * EXPLICIT codepoint ranges, not Java script properties, so the
  * counts replay exactly in any engine exposing the codepoint. */
case class ScriptClassCounts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"script_class_counts needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.scriptClassCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.scriptClassCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): ScriptClassCounts =
    copy(child = newChild)
}

object BpeTokenIds {
  /** First id past the Unicode codepoint space (0x110000 = 1,114,112):
    * merged-token ids start here — rule rank r maps to VocabBase + r —
    * so they can never collide with a codepoint id. */
  val VocabBase: Long = 0x110000L
}

/** Codegen'd Luhn-verified card-candidate counter (see
  * HashKernels.luhnCardCount): finds every match of the structural card
  * `pattern` and counts those passing the Luhn mod-10 checksum — exact
  * integer arithmetic, replayed by the DuckDB oracle from the same
  * pattern and digit rules. The compiled pattern ships into generated
  * code as a reference object. */
case class LuhnCardCount(child: Expression, pattern: String)
    extends UnaryExpression {
  private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"luhn_card_count needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.luhnCardCount(input.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("graftLuhnPat", compiled, "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.luhnCardCount($c, $pref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LuhnCardCount =
    copy(child = newChild)
}

/** Codegen'd element-wise id remap through a precomputed vocabulary
  * table (see HashKernels.remapIds) — the map ships into generated code
  * as a reference object (vocabulary-sized: the same broadcast-small-
  * model shape as the merges tables). Total function or loud failure:
  * an uncovered id throws rather than fabricating one. */
case class RemapIds(child: Expression,
    map: java.util.HashMap[java.lang.Long, java.lang.Long])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"remap_ids needs array<long>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.remapIds(input.asInstanceOf[ArrayData], map)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("graftRemap", map, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.remapIds($c, $mref)")
  }
  override protected def withNewChildInternal(newChild: Expression): RemapIds =
    copy(child = newChild)
}

/** Codegen'd one-pass 1-D dHash (see HashKernels.dhashBits). */
case class DhashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dhash_bits needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.dhashBits(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.dhashBits($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): DhashBits =
    copy(child = newChild)
}

/** Codegen'd one-pass SimHash (see HashKernels.simhashBits). */
case class SimhashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_bits needs string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhashBits(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhashBits($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

/** Codegen'd one-pass repetition counts (see HashKernels.repetitionCounts). */
case class RepetitionCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repetition_counts needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.repetitionCounts(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.repetitionCounts($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}

/** Codegen'd one-pass top-k term counts (see HashKernels.topTermCounts). */
case class TopTermCounts(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_term_counts needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.topTermCounts(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.topTermCounts($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): TopTermCounts =
    copy(child = newChild)
}

/** Codegen'd one-pass MinHash signature (see HashKernels.minhashSignature);
  * returns array<array<long>> with 0 or 1 signatures — explode the result. */
case class MinhashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1 && numHashes >= 1, s"bad minhash params: k=$k numHashes=$numHashes")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs string, got ${child.dataType}")
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.minhashSignature($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** Codegen'd exact dot product over two ArrayType(LongType) columns. */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) || left.dataType == ArrayType(LongType, true)) {
      if (right.dataType == ArrayType(LongType, false) || right.dataType == ArrayType(LongType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_long needs array<bigint>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_long needs array<bigint>, got ${left.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd one-pass unit-sphere re-quantization (see
  * HashKernels.unitQuantize): array<bigint> in, array<bigint> out. */
case class UnitQuantizeVector(child: Expression, scale: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unit_quantize needs array<bigint>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.unitQuantize(input.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.unitQuantize($c, ${scale}L)")
  override protected def withNewChildInternal(newChild: Expression): UnitQuantizeVector =
    copy(child = newChild)
}

/** Codegen'd PQ asymmetric-distance score (see HashKernels.pqAdcScore):
  * the per-query LUT on the left (array<array<bigint>>, computed once
  * per query row), the corpus row's PQ code on the right (array<int>).
  * This is the per-pair hot path of [[graft.ops.SimilarityOps.pqTopK]] —
  * m lookups+adds per scored pair in generated code; the composed
  * `aggregate(zip_with(...))` form evaluates interpreted per element. */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isLutType(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(LongType, _), _) => true
    case _ => false
  }
  private def isCodeType(t: DataType): Boolean = t match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!isLutType(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs array<array<bigint>> lut, got ${left.dataType}")
    else if (!isCodeType(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs array<int> code, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.pqAdcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.pqAdcScore($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd bloom probe (see HashKernels.bloomHits): grams array on the
  * left, the bitmap array on the right (normally a scalar-subquery
  * literal, evaluated ONCE — a higher-order-function formulation would
  * re-evaluate the 10⁴-element bitmap per gram, interpreted). */
case class BloomHitCount(left: Expression, right: Expression,
    probes: Int, m: Long) extends BinaryExpression {
  require(probes >= 1 && probes <= 16, s"probes must be in [1,16], got $probes")
  require(m >= 64 && (m & 63L) == 0L, s"m must be a positive multiple of 64, got $m")
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_hits needs two array<bigint>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.bloomHits(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], probes, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.bloomHits($a, $b, $probes, ${m}L)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHitCount =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd map-only span scrub (see HashKernels.spanScrub): text +
  * SORTED gram-hash array -> struct(clean_text, n_spans, n_removed).
  * The sortedness contract lives at the ops layer
  * (DedupOps.decontaminateSpansWithGrams sorts the driver artifact);
  * an unsorted array would silently miss grams, so never build the
  * literal by hand. */
case class SpanScrub(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"span_scrub needs (string, array<bigint>), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.spanScrub(a.asInstanceOf[UTF8String],
      b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.spanScrub($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanScrub =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sparse-to-dense bitmap scatter (see
  * HashKernels.bitmapFromEntries): array<struct<w:bigint,bits:bigint>>
  * -> array<bigint> of fixed length `n`. */
case class BitmapFromEntries(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"bitmap length must be >= 1, got $n")
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StructType(fs), _) =>
      fs.length == 2 && fs.forall(_.dataType == LongType)
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bitmap_from_entries needs array<struct<bigint,bigint>>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.bitmapFromEntries(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.bitmapFromEntries($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): BitmapFromEntries =
    copy(child = newChild)
}

/** Codegen'd quantizer: float/double array -> exact long array. */
case class QuantizeVector(child: Expression, scale: Long)
    extends UnaryExpression {
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    elemType match {
      case FloatType | DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vector needs array<float|double>, got ${child.dataType}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    elemType match {
      case FloatType => HashKernels.quantizeFloat(arr, scale)
      case DoubleType => HashKernels.quantizeDouble(arr, scale)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = elemType match {
      case FloatType => "quantizeFloat"
      case DoubleType => "quantizeDouble"
    }
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.$fn($c, ${scale}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}

/** Codegen'd word-window extractor (see HashKernels.windowPassages):
  * string -> array<string> of stride-sampled `win`-word windows. */
case class WindowPassages(child: Expression, win: Int, stride: Int)
    extends UnaryExpression {
  require(win >= 1, s"win must be >= 1, got $win")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"window_passages needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.windowPassages(input.asInstanceOf[UTF8String], win, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.windowPassages($c, $win, $stride)")
  override protected def withNewChildInternal(newChild: Expression): WindowPassages =
    copy(child = newChild)
}

/** Codegen'd Morton/Z-order interleave (see HashKernels.zInterleave):
  * (bigint, bigint) -> bigint z-value over the low `bits` bits each. */
case class ZInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"z_interleave needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.zInterleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.zInterleave($a, $b, $bits)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZInterleave = copy(left = newLeft, right = newRight)
}

/** Codegen'd fixed-point log2 of a rational (see HashKernels.log2q):
  * (bigint num, bigint den) -> bigint ~ 2^fracBits * log2(num/den),
  * bit-reproducible (exact-IEEE op sequence only). */
case class Log2Fixed(left: Expression, right: Expression, fracBits: Int)
    extends BinaryExpression {
  require(fracBits >= 1 && fracBits <= 30, s"fracBits must be in [1, 30], got $fracBits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"log2_fixed needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.log2q(a.asInstanceOf[Long], b.asInstanceOf[Long], fracBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashKernels.log2q($a, $b, $fracBits)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Log2Fixed = copy(left = newLeft, right = newRight)
}

/** Codegen'd feature-hashing embedding (see HashKernels.hashEmbedding):
  * string -> array<bigint> of length `dim`, exact signed bucket counts. */
case class HashEmbedding(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2, s"dim must be >= 2, got $dim")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hash_embedding needs string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.hashEmbedding(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.hashEmbedding($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): HashEmbedding =
    copy(child = newChild)
}

/** Codegen'd Unicode normalizer (see HashKernels.normalizeText): NFC +
  * simple lowercase + whitespace collapse, one pass per row. */
case class NormalizeText(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    HashKernels.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Codegen'd HTML main-content extraction (see
  * HashKernels.extractMainContent): raw HTML string ->
  * struct(main_text, n_blocks, n_kept). One kernel call per row — the
  * regex set is compiled once per JVM, and the whole block loop stays
  * inside whole-stage codegen. */
case class ExtractMainContent(child: Expression, minWords: Int)
    extends UnaryExpression {
  require(minWords >= 1, s"minWords must be >= 1, got $minWords")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"extract_main_content needs string, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("main_text", StringType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    HashKernels.extractMainContent(input.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.extractMainContent($c, $minWords)")
  override protected def withNewChildInternal(newChild: Expression): ExtractMainContent =
    copy(child = newChild)
}

/** Published bigram-LM artifact for map-only DSIR scoring — the
  * contaminationGramSet pattern applied to the two DSIR models: counts
  * collected ONCE (driver-bounded like the broadcast path's
  * maxBroadcastModelRows), keys sorted for in-place binary search, the
  * whole object shipped into the plan as a codegen reference (legal in
  * Structured Streaming where scalar subqueries and stateful joins are
  * not). Build with [[graft.ops.TextOps.dsirModelArtifact]] — never by
  * hand: UNSORTED keys would silently miss counts. */
case class DsirModel(pairKeys: Array[String], pairCnts: Array[Long],
    ctxKeys: Array[String], ctxCnts: Array[Long], vocab: Long) {
  require(pairKeys.length == pairCnts.length &&
    ctxKeys.length == ctxCnts.length,
    "DsirModel: key/count arrays must align")
  def pairCount(key: String): Long = {
    val i = java.util.Arrays.binarySearch(
      pairKeys.asInstanceOf[Array[AnyRef]], key)
    if (i >= 0) pairCnts(i) else 0L
  }
  def ctxCount(key: String): Long = {
    val i = java.util.Arrays.binarySearch(
      ctxKeys.asInstanceOf[Array[AnyRef]], key)
    if (i >= 0) ctxCnts(i) else 0L
  }
}

/** Codegen'd map-only DSIR surprisal (see HashKernels.dsirBitsQ): text
  * against a published [[DsirModel]] -> struct(n_tokens, bits_q). The
  * model rides the plan as a codegen reference object — no join, no
  * broadcast exchange, streaming-legal. */
case class DsirBits(child: Expression, model: DsirModel, fracBits: Int)
    extends UnaryExpression {
  require(fracBits >= 1 && fracBits <= 30,
    s"fracBits must be in [1, 30], got $fracBits")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dsir_bits needs string, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("bits_q", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    HashKernels.dsirBitsQ(input.asInstanceOf[UTF8String], model, fracBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirModel", model,
      "graft.functions.DsirModel")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.dsirBitsQ($c, $ref, $fracBits)")
  }
  override protected def withNewChildInternal(newChild: Expression): DsirBits =
    copy(child = newChild)
}

/** Published unigram-LM vocabulary for [[UnigramEncode]] — (piece,
  * Q16 log-probability score) pairs, keys sorted for in-place binary
  * search (the [[DsirModel]] artifact discipline). Build with
  * [[graft.ops.TextOps.unigramVocab]] — never by hand: unsorted keys
  * would silently miss pieces. */
case class UnigramVocab(pieces: Array[String], scores: Array[Long],
    maxLen: Int) {
  require(pieces.length == scores.length,
    "UnigramVocab: piece/score arrays must align")
  def score(piece: String): Long = {
    val i = java.util.Arrays.binarySearch(
      pieces.asInstanceOf[Array[AnyRef]], piece)
    if (i >= 0) scores(i) else UnigramVocab.NoScore
  }
}
object UnigramVocab {
  /** Lookup miss sentinel (never a legal Q16 score). */
  val NoScore: Long = Long.MinValue
}

/** Codegen'd unigram-LM segmentation (see HashKernels.unigramEncode):
  * text -> struct(pieces, n_pieces, score_q) under a published
  * [[UnigramVocab]] riding the plan as a codegen reference object —
  * map-only, streaming-legal. */
case class UnigramEncode(child: Expression, vocab: UnigramVocab,
    unkScoreQ: Long) extends UnaryExpression {
  // lower bound excludes UnigramVocab.NoScore (Long.MinValue) — that
  // sentinel would make unknown single characters unreachable DP states
  // and surface as an opaque substring(-1) error during reconstruction —
  // and rules out dpS accumulation overflow on pathological word lengths
  // (|score|·word ≤ 2^62 for words ≤ 2^20 chars at scores > MinValue/2)
  require(unkScoreQ < 0L && unkScoreQ > Long.MinValue / 2,
    s"unkScoreQ must be in (${Long.MinValue / 2}, 0), got $unkScoreQ")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_encode needs string, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("score_q", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    HashKernels.unigramEncode(input.asInstanceOf[UTF8String], vocab,
      unkScoreQ)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      "graft.functions.UnigramVocab")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.unigramEncode($c, $ref, ${unkScoreQ}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

/** Column-level entry points for the custom expressions. */
object exprs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.shims

  def charHashFast(c: Column): Column =
    shims.column(WeightedCharHash(shims.expression(c)))
  def percentNormalize(c: Column): Column =
    shims.column(PercentNormalize(shims.expression(c)))
  def idnAscii(c: Column): Column =
    shims.column(IdnAscii(shims.expression(c)))
  def shingleHashes(c: Column, k: Int): Column =
    shims.column(ShingleHashArray(shims.expression(c), k))
  def spanScrub(text: Column, grams: Column, k: Int): Column =
    shims.column(SpanScrub(shims.expression(text),
      shims.expression(grams), k))
  def dotLong(a: Column, b: Column): Column =
    shims.column(DotProductLong(shims.expression(a), shims.expression(b)))
  def pqAdc(lut: Column, code: Column): Column =
    shims.column(PqAdcScore(shims.expression(lut), shims.expression(code)))
  def unitQuantize(c: Column, scale: Long = 10000L): Column =
    shims.column(UnitQuantizeVector(shims.expression(c), scale))
  def quantizeVec(c: Column, scale: Long = 10000L): Column =
    shims.column(QuantizeVector(shims.expression(c), scale))
  def wordCounts(c: Column, words: Seq[String]): Column =
    shims.column(WordOccurrenceCounts(shims.expression(c), words))
  def simhashBits(c: Column, bits: Int): Column =
    shims.column(SimhashBits(shims.expression(c), bits))
  def repetitionCounts(c: Column, n: Int): Column =
    shims.column(RepetitionCounts(shims.expression(c), n))
  def minhashSignature(c: Column, k: Int, numHashes: Int): Column =
    shims.column(MinhashSignature(shims.expression(c), k, numHashes))
  def topTermCounts(c: Column, k: Int): Column =
    shims.column(TopTermCounts(shims.expression(c), k))
  def bloomHits(grams: Column, bitmap: Column, probes: Int, m: Long): Column =
    shims.column(BloomHitCount(shims.expression(grams), shims.expression(bitmap), probes, m))
  def bitmapFromEntries(entries: Column, n: Int): Column =
    shims.column(BitmapFromEntries(shims.expression(entries), n))
  def normalizeText(c: Column): Column =
    shims.column(NormalizeText(shims.expression(c)))
  def extractMainContent(c: Column, minWords: Int = 5): Column =
    shims.column(ExtractMainContent(shims.expression(c), minWords))
  def dsirBits(c: Column, model: DsirModel, fracBits: Int = 16): Column =
    shims.column(DsirBits(shims.expression(c), model, fracBits))
  def unigramEncode(c: Column, vocab: UnigramVocab, unkScoreQ: Long): Column =
    shims.column(UnigramEncode(shims.expression(c), vocab, unkScoreQ))
  def bpeTokenStats(c: Column, merges: Seq[(String, String)]): Column =
    shims.column(BpeTokenStats(shims.expression(c),
      merges.flatMap(p => Seq(p._1, p._2))))
  def dhashBits(c: Column, bits: Int): Column =
    shims.column(DhashBits(shims.expression(c), bits))
  def bpeWordTokens(c: Column, merges: Seq[(String, String)]): Column =
    shims.column(BpeWordTokens(shims.expression(c),
      merges.flatMap(p => Seq(p._1, p._2))))
  def bpeTokenIds(c: Column, merges: Seq[(String, String)],
      lossless: Boolean = false): Column =
    shims.column(BpeTokenIds(shims.expression(c),
      merges.flatMap(p => Seq(p._1, p._2)), lossless))
  def bpeDecode(c: Column, merges: Seq[(String, String)]): Column =
    shims.column(BpeDecodeIds(shims.expression(c),
      merges.flatMap(p => Seq(p._1, p._2))))
  def remapIds(c: Column, map: java.util.HashMap[java.lang.Long, java.lang.Long]): Column =
    shims.column(RemapIds(shims.expression(c), map))
  def luhnCardCount(c: Column, pattern: String): Column =
    shims.column(LuhnCardCount(shims.expression(c), pattern))
  def scriptClassCounts(c: Column): Column =
    shims.column(ScriptClassCounts(shims.expression(c)))
  def hashEmbedding(c: Column, dim: Int): Column =
    shims.column(HashEmbedding(shims.expression(c), dim))
  def zInterleave(a: Column, b: Column, bits: Int): Column =
    shims.column(ZInterleave(shims.expression(a), shims.expression(b), bits))
  def log2Fixed(num: Column, den: Column, fracBits: Int): Column =
    shims.column(Log2Fixed(shims.expression(num), shims.expression(den), fracBits))
  def windowPassages(c: Column, win: Int, stride: Int): Column =
    shims.column(WindowPassages(shims.expression(c), win, stride))

  /** Top-k (ord, value) pairs per group as an aggregate column —
    * `array<struct<ord, value>>` ranked (ord desc, value asc); the
    * shuffle-light replacement for a per-group ranking window. */
  def topKByOrd(ord: Column, value: Column, k: Int): Column =
    shims.column(TopKByOrdPairs(shims.expression(ord), shims.expression(value), k)
      .toAggregateExpression())

  /** Make the custom expressions callable from `spark.sql(...)` on a
    * LIVE session: graft_char_hash(s), graft_shingle_hashes(s, k),
    * graft_dot_long(a, b), graft_quantize(v, scale),
    * graft_top_k(ord, v, k), graft_word_counts(s, csv). The builders are
    * shared with [[GraftExtensions]] (the session-build-time
    * `spark.sql.extensions` path for pure-SQL deployments), so the two
    * registration routes cannot drift.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      shims.registerFunction(spark, name, builder)
    }
}
