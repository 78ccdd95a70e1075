package graft

import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** Properties of the URL canonicalizer beyond the oracle rows: rule
  * unit cases, IDEMPOTENCE (canonical output is a fixed point — the
  * property that lets an index store canonical keys and re-canonicalize
  * arriving urls without drift), and totality on adversarial shapes. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(us: Seq[String]): Seq[String] =
    us.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("each rule, one witness") {
    val cases = Seq(
      "  https://a.example/x " -> "a.example/x", // trim + scheme
      "https://a.example/x#frag" -> "a.example/x", // fragment
      "HTTPS://WWW.A.Example.com:443/Docs/1" -> "a.example.com/Docs/1", // host case/www/port, path case kept
      "http://a.example:80/x" -> "a.example/x", // default port 80
      "http://a.example:8080/x" -> "a.example:8080/x", // non-default kept
      "https://a.example/x///" -> "a.example/x", // trailing slashes
      "https://a.example/x?utm_source=f&q=1&fbclid=z" -> "a.example/x?q=1", // tracking strip, order kept
      "https://a.example/x?UTM_SOURCE=f" -> "a.example/x", // name case-insensitive
      "https://a.example/x?refresh=1" -> "a.example/x?refresh=1", // 'ref' must not prefix-match
      "a.example/x?ref=tw" -> "a.example/x", // schemeless
      "https://a.example/?gclid=1" -> "a.example", // emptied query + bare slash
      "ftp+ssh://a.example/x" -> "a.example/x", // any scheme token
      // --- protocol-relative (r18 rule 3b) ---
      "//a.example/x" -> "a.example/x", // network-path ref = its absolute twin
      "//WWW.A.Example:443/x" -> "a.example/x", // host rules apply to it
      "////a.example/x" -> "a.example/x", // slash runs: one idempotent strip
      // --- percent normalization (r17) ---
      "https://a.example/a%2Db" -> "a.example/a-b", // unreserved decodes
      "https://a.example/%7euser" -> "a.example/~user", // %7e -> ~
      "https://a.example/%7Euser" -> "a.example/~user", // %7E -> ~ (same)
      "https://a.example/d%6Fcs/1" -> "a.example/docs/1", // letter decodes
      "https://a.example/a%2fb" -> "a.example/a%2Fb", // reserved: hex upper, NOT decoded
      "https://a.example/a%3a%3Db" -> "a.example/a%3A%3Db", // both digits upper
      "https://a.example/x?utm%5Fsource=f&q=1" -> "a.example/x?q=1", // tracking caught after decode
      "https://a.example/x?q=a%20b" -> "a.example/x?q=a%20b", // space stays escaped
      "https://a.example/x?q=a+b" -> "a.example/x?q=a+b", // + untouched (non-rule)
      "https://a.example/%2541" -> "a.example/%2541") // double-encoding NOT double-decoded
    val got = canon(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("canonical output is a fixed point (idempotence)") {
    val inputs = Seq(
      "HTTPS://WWW.A.Example.com:443/Docs/1/?utm_source=f&q=1&x=2#f",
      "a.example/x?ref=tw&q=1", "http://m.b.example//a//b/?gclid=1",
      "https://a.example", "a.example", "a.example:8080/p?a=1&b=2",
      // percent shapes: decoded output and surviving uppercased escapes
      // must both be fixed points
      "https://a.example/d%6Fcs/a%2fb%7E?utm%5Fsource=x&q=%2541",
      "a.example/%ZZ%2", "a.example/100%off", // malformed escapes too
      "//b.example/x?ref=1", "////x", "///") // protocol-relative + slash runs
    val once = canon(inputs)
    val twice = canon(once)
    once.zip(twice).foreach { case (a, b) =>
      assert(a == b, s"not idempotent: $a -> $b")
    }
  }

  test("total on adversarial shapes: no exceptions, nulls pass through") {
    val weird = Seq("", " ", "://", "?", "#", "?&&&", "http://",
      "https://?x=1", "a//b", ":8080", "????", "## #", "a.example?",
      "http://xn--bcher-kva.example/päth?ümlaut=1", "a b c")
    val got = canon(weird) // must not throw
    assert(got.length == weird.length)
    // idempotence holds even on the weird shapes
    assert(canon(got) == got)
    val n = Seq((1L, null: String)).toDF("id", "u")
      .select(UrlOps.canonicalizeUrl(col("u"))).head()
    assert(n.isNullAt(0))
  }

  test("percent kernel == the PercentRules regex chain, fuzzed, including created-escape pathologies") {
    def chain(c: org.apache.spark.sql.Column) =
      UrlOps.PercentRules.foldLeft(c) { case (acc, (p, r)) =>
        regexp_replace(acc, p, r)
      }
    val witnesses = Seq(
      "%2541",      // double-encoding: %25 reserved, 41 literal
      "%4%412",     // pass A (%41) CREATES %4A2; the later pass J (%4A)
                    // decodes it — SEQUENTIAL semantics, both engines
      "%%4141",     // % then a real escape
      "a%2Db", "%7e%7E~", "x%3a%3Db", "utm%5Fsource", "100%off",
      "%a", "%", "", "%ZZ%2", "päth%c3%a4", "%2f%2F%2d",
      "%6f%6F%4a%4A", "%%%%", "%0%00%000")
    val rnd = new scala.util.Random(4242L)
    val alpha = "%0123456789abcdefABCDEF-._~/?&=xyzä"
    val fuzz = (0 until 2000).map(_ =>
      (0 until rnd.nextInt(24)).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    val df = (witnesses ++ fuzz).toDF("s")
    val bad = df.select(col("s"),
        graft.functions.exprs.percentNormalize(col("s")).as("k"),
        chain(col("s")).as("c"))
      .filter(!(col("k") <=> col("c")))
    assert(bad.isEmpty, bad.take(5).toSeq.toString)
    // nulls pass through both ways
    assert(Seq((1L, null: String)).toDF("id", "s")
      .select(graft.functions.exprs.percentNormalize(col("s")))
      .head().isNullAt(0))
  }

  test("percent rule merges cross-encoded duplicates through urlDedup") {
    val df = Seq(
      (1L, "http://a.example/docs/7"),
      (2L, "http://a.example/d%6Fcs/7"), // same resource, encoder disagreed
      (3L, "http://a.example/docs%2F7") // %2F is NOT a path slash — distinct
    ).toDF("id", "u")
    val kept = UrlOps.urlDedup(df, "id", "u")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("null URLs are exempt: every null-url row passes dedup and the blocklist") {
    val df = Seq(
      (1L, "https://a.example/x"),
      (2L, null: String),
      (3L, null: String),
      (4L, "http://www.a.example/x"), // collapses with 1
      (5L, "https://spam.example/y")
    ).toDF("id", "u")
    val dedup = UrlOps.urlDedup(df, "id", "u")
    assert(dedup.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 5L), "both null rows must survive, not keep-first-one")
    assert(dedup.filter(col("id") === 2L).select("canonical_url")
      .head().isNullAt(0))
    // blocklist: nulls pass (no host to block); spam.example still drops
    val kept = UrlOps.domainBlocklistFilter(df, "u", Seq("spam.example"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
    // incremental: null-url batch rows survive the anti-join too
    val idx = Seq(Tuple1("a.example/x")).toDF("canonical_url")
    val inc = UrlOps.urlDedupAgainstIndex(df, idx, "id", "u")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(inc == Set(2L, 3L, 5L))
  }

  test("protocol-relative URLs collapse with their absolute twins and cannot bypass the blocklist") {
    // dedup: the network-path reference and the absolute form share one
    // canonical key (r17 kept the '//' and they never collapsed)
    val df = Seq(
      (1L, "http://a.example/x"),
      (2L, "//a.example/x"), // keep-first collapses onto 1
      (3L, "//b.example/y"), // its own key, survives
      (4L, "//spamhub.example/z"), // blocked domain via '//'
      (5L, "https://ok.example/w")
    ).toDF("id", "u")
    val kept = UrlOps.urlDedup(df, "id", "u")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
    // blocklist: r17's empty-host extract PASSED row 4 — a filter
    // BYPASS, not just a missed merge
    val unblocked = UrlOps.domainBlocklistFilter(
      df, "u", Seq("spamhub.example"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(unblocked == Set(1L, 2L, 3L, 5L),
      s"//spamhub.example must be dropped, got $unblocked")
    // hostOf reads the real host through the '//'
    assert(Seq(Tuple1("//www.Spamhub.example:443/z")).toDF("u")
      .select(UrlOps.hostOf(col("u"))).head().getString(0) ==
      "spamhub.example")
  }

  test("idnAsciiHost: unicode and punycode spellings of a host collapse; garbage passes lowercased") {
    def idn(us: Seq[String]): Seq[String] =
      us.toDF("u").select(UrlOps.idnAsciiHost(col("u"))).collect()
        .map(_.getString(0)).toSeq
    val cases = Seq(
      "https://bücher.example/x" -> "xn--bcher-kva.example",
      "https://BÜCHER.example/x" -> "xn--bcher-kva.example",
      "https://xn--bcher-kva.example/x" -> "xn--bcher-kva.example",
      "https://www.münchen.example.de/x" -> "xn--mnchen-3ya.example.de",
      "https://plain.example/x" -> "plain.example", // ASCII passthrough
      "https://MiXeD.Example/x" -> "mixed.example")
    cases.zip(idn(cases.map(_._1))).foreach { case ((in, want), got) =>
      assert(got == want, s"idnAsciiHost($in) = $got, want $want")
    }
    // total on garbage: an IDNA-rejecting host passes through lowercased
    val overlong = "https://" + "x" * 80 + ".example/x"
    assert(idn(Seq(overlong)) == Seq("x" * 80 + ".example"))
    // idempotent: the ASCII output is a fixed point
    val once = idn(cases.map(_._1))
    assert(idn(once.map(h => s"https://$h/")) == once)
    // composes with the blocklist: the unicode spelling matches the
    // ASCII blocklist entry through the IDN key
    val df = Seq((1L, "https://spam.bücher.example/x"),
      (2L, "https://fine.example/x")).toDF("id", "u")
    val kept = UrlOps.domainBlocklistFilter(
      df.withColumn("u2", concat(lit("https://"), UrlOps.idnAsciiHost(col("u")), lit("/"))),
      "u2", Seq("xn--bcher-kva.example"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("hostSuffixes walks label boundaries only") {
    val got = Seq(Tuple1("https://a.b.spam.example/x")).toDF("u")
      .select(UrlOps.hostSuffixes(col("u"))).head().getSeq[String](0)
    assert(got == Seq("a.b.spam.example", "b.spam.example",
      "spam.example", "example"))
    // 'am.example' is NOT a suffix at a label boundary -> never blocked
    val kept = UrlOps.domainBlocklistFilter(
      Seq((1L, "https://spam.example/x"), (2L, "https://notspam.example/x"))
        .toDF("id", "u"), "u", Seq("am.example", "spam.example"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }
}
