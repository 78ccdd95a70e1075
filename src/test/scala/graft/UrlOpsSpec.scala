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
      "ftp+ssh://a.example/x" -> "a.example/x") // any scheme token
    val got = canon(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("canonical output is a fixed point (idempotence)") {
    val inputs = Seq(
      "HTTPS://WWW.A.Example.com:443/Docs/1/?utm_source=f&q=1&x=2#f",
      "a.example/x?ref=tw&q=1", "http://m.b.example//a//b/?gclid=1",
      "https://a.example", "a.example", "a.example:8080/p?a=1&b=2")
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
