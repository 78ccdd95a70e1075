package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the stage every web-corpus pipeline
  * (CCNet and successors) runs BEFORE text-level dedup: canonicalize
  * URLs with explicit replayable rules, collapse exact URL duplicates
  * keep-first, and drop blocklisted domains. Reference `tmdb_index.py`
  * has no analog (its ids are TMDB-native); this is brief-driven
  * extension surface, prepended to [[Curation.stages]] like the r15
  * HTML-extraction stage.
  *
  * Everything is pure Catalyst builtins (regexp/string/array functions)
  * with Java-regex ≡ RE2-safe constructs only (anchors, `[^/?]*`
  * classes, alternation, `\.`), so the DuckDB oracle replays each rule
  * literally and results hash-match. No UDFs, no shuffle for
  * canonicalization — it rides the scan.
  */
object UrlOps {
  /** Query parameters stripped by [[canonicalizeUrl]] — the standard
    * click-tracking set. Matching is case-insensitive on the NAME. */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref", "mc_cid", "mc_eid")

  /** One alternation regex over the tracking params: `utm_*` collapses
    * to a single branch. Anchored at param start, matches `name=` or a
    * bare valueless `name`. Shared (like the other Re constants) with
    * the catalyst-level SQL builder in GraftExtensions — the regexes
    * are the single source of truth; tree equality is spec-pinned. */
  private[graft] val TrackingRe =
    "^(utm_[a-z0-9]+|gclid|fbclid|ref|mc_cid|mc_eid)(=|$)"
  private[graft] val FragmentRe = "#.*$"
  private[graft] val SchemeRe = "^[A-Za-z][A-Za-z0-9+.\\-]*://"
  /** Rule 3b (r18): a PROTOCOL-RELATIVE url (`//example.com/x` — RFC
    * 3986 network-path reference, common in crawled hrefs) drops its
    * leading `//` after the scheme strip, so it keys and blocks like
    * its absolute twin. Without it [[HostRe]] (`^[^/?]*`) read an
    * EMPTY host: the canonical key kept the `//` (never collapsing
    * with the absolute form) and — worse — [[domainBlocklistFilter]]
    * saw host `""` and PASSED a blocklisted domain. `//+` (not `//`)
    * so the rule is IDEMPOTENT on pathological slash runs: `////x`
    * must not canonicalize to `//x`, which a second pass would then
    * rewrite to `x` — canonical keys are stored and re-canonicalized
    * by the incremental index, so every output must be a fixed
    * point. */
  private[graft] val ProtoRelRe = "^//+"
  private[graft] val HostRe = "^[^/?]*"
  private[graft] val WwwRe = "^www\\."
  private[graft] val DefaultPortRe = ":(80|443)$"
  private[graft] val PathRe = "^[^?]*"
  private[graft] val TrailingSlashRe = "/+$"

  /** Percent-encoding normalization as an ORDERED rule list of
    * (regex, replacement) replaces — RFC 3986 §6.2.2: percent escapes
    * of UNRESERVED characters (ALPHA / DIGIT / `-` `.` `_` `~`) decode
    * (hex matched case-insensitively), then the hex digits of every
    * REMAINING escape uppercase (`%3a` → `%3A`). Two URLs that encoders
    * percent-encoded differently (`a%2Db` vs `a-b`, `%7e` vs `%7E` vs
    * `~`) now collapse; reserved escapes (`%2F`, `%3F`, `%26`…) are
    * NEVER decoded — decoding them would move parsing boundaries, so
    * neither rule can introduce `/`, `?`, `#`, or `&` and the
    * host/path/query split stays stable around the rules. The
    * uppercase step uses capture-group replaces (`%a([0-9A-Fa-f])` →
    * `%A$1`, then `%([0-9A-F])a` → `%$1A`) because RE2 — the oracle's
    * engine — has no lookaround; a bare `%` followed by hex (malformed
    * input) is normalized best-effort by the same deterministic chain
    * on both engines. Replacements use Java `$1` syntax; the SQL oracle
    * builder swaps to RE2's `\1`. `+` is NOT decoded to space (its
    * meaning is scheme-specific) and `%20` stays an escape (space is
    * not unreserved) — documented non-rules. */
  private[graft] val PercentRules: Seq[(String, String)] = {
    val unreserved =
      (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
        .map(c => (f"(?i)%%${c.toInt}%02X", c.toString))
    val upperFirst =
      ('a' to 'f').map(d => (s"%$d([0-9A-Fa-f])", s"%${d.toUpper}$$1"))
    val upperSecond =
      ('a' to 'f').map(d => (s"%([0-9A-F])$d", s"%$$1${d.toUpper}"))
    unreserved ++ upperFirst ++ upperSecond
  }

  /** [[PercentRules]] applied via the one-pass-per-rule codegen kernel
    * [[graft.functions.PercentNormalize]] — bit-exact to folding the
    * regex chain (spec-pinned over witnesses AND fuzzed inputs,
    * UrlOpsSpec) with no regex machinery, and a free early-out for
    * URLs without a `%` (the overwhelming majority of a crawl). The
    * regex rule list stays the SPEC: the DuckDB oracle replays it
    * literally. */
  private def percentNormalize(s: Column): Column =
    graft.functions.exprs.percentNormalize(s)

  /** Canonical form of a URL, as explicit ordered rules (each one a
    * single replayable expression):
    *  1. trim surrounding whitespace;
    *  2. strip the fragment (`#…`);
    *  3. strip the scheme (`http://`, `https://`, any `x+y://`), then
    *     (3b) a leading `//` — a protocol-relative reference's host is
    *     a host, not an empty-host path ([[ProtoRelRe]]);
    *  4. host = everything before the first `/` or `?`, lowercased,
    *     `www.` prefix dropped, default `:80`/`:443` port dropped
    *     (the PATH keeps its case — only authority is case-insensitive
    *     per RFC 3986);
    *  5. percent normalization on the path+query ([[PercentRules]]):
    *     unreserved escapes decode, remaining escape hex uppercases —
    *     escapes in the AUTHORITY are left alone (percent-encoded
    *     hosts are pathological; a non-rule like punycode);
    *  6. path: trailing `/` runs dropped;
    *  7. query: tracking params ([[DefaultTrackingParams]], name
    *     matched case-insensitively, AFTER percent normalization — so
    *     `utm%5Fsource` is caught) and empty params dropped, the
    *     REST kept in original order (no reorder — two URLs differing
    *     in param order stay distinct, a deliberate conservative rule);
    *     an emptied query drops its `?`.
    * Nulls pass through. Credentials (`user@host`) are NOT normalized
    * (a documented non-rule); punycode/IDN normalization exists as the
    * OPT-IN kernel-only [[idnAsciiHost]] (it cannot join this chain —
    * the oracle engine has no IDNA).
    */
  def canonicalizeUrl(url: Column): Column = {
    val t1 = regexp_replace(trim(url), FragmentRe, "")
    val t2 = regexp_replace(regexp_replace(t1, SchemeRe, ""), ProtoRelRe, "")
    val hostRaw = regexp_extract(t2, HostRe, 0)
    val host = regexp_replace(
      regexp_replace(lower(hostRaw), WwwRe, ""), DefaultPortRe, "")
    val rest = percentNormalize(
      substring(t2, length(hostRaw) + 1, lit(1 << 30)))
    val path = regexp_extract(rest, PathRe, 0)
    val cleanPath = regexp_replace(path, TrailingSlashRe, "")
    val query = when(length(rest) > length(path),
      substring(rest, length(path) + 2, lit(1 << 30))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !lower(p).rlike(TrackingRe) && p =!= "")
    concat(host, cleanPath,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** The canonical host folded through IDN (punycode) normalization —
    * the OPT-IN eighth rule: `bücher.example`, `BÜCHER.example`, and
    * `xn--bcher-kva.example` all land on `xn--bcher-kva.example`, so
    * internationalized mirrors collapse under URL dedup and match
    * ASCII blocklists. Kernel-only ([[graft.functions.IdnAscii]] —
    * JDK IDNA; DuckDB has no IDNA, so this rule CANNOT join the
    * oracle-replayed [[canonicalizeUrl]] chain — use it as an explicit
    * extra key/pre-step where IDN traffic matters; spec-pinned on RFC
    * vectors + idempotence instead of an oracle row). A host IDNA
    * rejects passes through lowercased, never lossy. */
  def idnAsciiHost(url: Column): Column =
    graft.functions.exprs.idnAscii(hostOf(url))

  /** The canonical HOST alone (rule 4 of [[canonicalizeUrl]]) — the
    * domain-blocklist join key. */
  def hostOf(url: Column): Column = {
    val t2 = regexp_replace(regexp_replace(
      regexp_replace(trim(url), FragmentRe, ""), SchemeRe, ""), ProtoRelRe, "")
    regexp_replace(
      regexp_replace(lower(regexp_extract(t2, HostRe, 0)), WwwRe, ""),
      DefaultPortRe, "")
  }

  /** Exact URL-keyed dedup, keep-first: one survivor per canonical URL —
    * the row with the smallest `idCol` (deterministic, engine-replayable
    * — the [[IndexOps.dedupKeepFirst]] priority-window pattern keyed on
    * [[canonicalizeUrl]]). NULL-url rows are EXEMPT: a null has no
    * canonical key, so every null-url row passes through untouched
    * (`canonical_url` null) — without the exemption the window would
    * group ALL null-url rows into one partition and keep-first would
    * silently drop every document that merely lacks a URL. Implemented
    * as a second partition key that is the row's own id when (and only
    * when) the canonical key is null — still ONE hash-partitioned
    * window, no union, no second exchange. Emits the input columns plus
    * `canonical_url`. Scale bonus: the null id-salt also means a
    * null-URL-heavy crawl slice can never become one skewed partition.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
    val nullSalt = when(col("canonical_url").isNull,
      col(idCol).cast("string")).otherwise(lit(""))
    val w = Window.partitionBy(col("canonical_url"), nullSalt)
      .orderBy(col(idCol).asc)
    keyed.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Incremental URL dedup against a STANDING canonical-URL index — the
    * daily-batch form: new rows whose canonical URL already exists in
    * the index drop (left-anti join on the canonical key; the standing
    * corpus is never re-canonicalized — the index IS the canonical
    * keys). `indexUrls` carries one `canonical_url` column. Output =
    * the surviving new rows + their `canonical_url` (ready to fold back
    * into the index). Within-batch duplicates are ALSO collapsed
    * (keep-first by id) — two copies co-arriving must not both pass. */
  def urlDedupAgainstIndex(newDocs: DataFrame, indexUrls: DataFrame,
      idCol: String, urlCol: String): DataFrame =
    urlDedup(newDocs, idCol, urlCol)
      .join(indexUrls.select("canonical_url"), Seq("canonical_url"),
        "left_anti")

  /** Every label-boundary suffix of the canonical host:
    * `a.b.spam.example` → [a.b.spam.example, b.spam.example,
    * spam.example, example]. A blocked domain matches a host iff it
    * appears in this set — `host == d or host ends with ".d"` expressed
    * as set membership. */
  def hostSuffixes(url: Column): Column = {
    val labels = split(hostOf(url), "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Drop rows whose canonical host is a blocked domain or any of its
    * subdomains (`host == d` or `host` ends with `.d`). The blocklist
    * rides the plan as ONE array literal probed with `arrays_overlap`
    * against the host's label-boundary suffixes — MAP-ONLY, no join, no
    * exchange, whole-stage codegen (the bloom-bitmap-literal
    * discipline; a join formulation with the `endsWith` OR-condition
    * plans as a BroadcastNestedLoopJoin costing |blocklist| string
    * compares per corpus row). Per-row cost = #host labels (~2-6) hash
    * probes, independent of blocklist size. Bounded at `MaxBlocklist`
    * entries (~a few hundred MB of plan literal past it — split the
    * list or pre-join offline). Domains are matched lowercase; pass
    * registrable domains (`spam.example`), not hosts. NULL-url rows
    * PASS (a row with no URL has no host to block — the bare
    * `arrays_overlap` predicate would evaluate null and the filter
    * would silently drop them). */
  def domainBlocklistFilter(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    if (blocked.isEmpty) return df
    require(blocked.size <= MaxBlocklist,
      s"blocklist has ${blocked.size} domains, over MaxBlocklist=" +
        s"$MaxBlocklist (the plan-literal bound) — split it or " +
        "pre-filter offline")
    val bl = typedLit(blocked.map(_.toLowerCase))
    df.filter(
      coalesce(!arrays_overlap(hostSuffixes(col(urlCol)), bl), lit(true)))
  }

  /** Plan-literal bound for [[domainBlocklistFilter]] (~tens of MB of
    * UTF-8 at typical domain lengths). */
  val MaxBlocklist: Int = 1 << 20
}
