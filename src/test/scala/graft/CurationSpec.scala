package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("funnel drops the right doc at each stage") {
    // crafted so each stage removes exactly one known doc:
    // survivor ids 3 and 5 sit in the 800/1000 hash-sample keep window
    // under the m61-x17 family (charHash("3") % 1000 = 308, "5" -> 68);
    // the ids only matter for the sample stage, which keys on doc_id
    val fill = (1 to 20).map(i => s"x$i").mkString(" ")
    val d = Seq(
      (3L, s"GOOD  $fill"),       // survives everything (normalize fixes case/spaces)
      (1L, "too short"),           // quality: < 20 words
      (6L, s"good $fill"),         // dedup: same canonical text as doc 3 (keep-first: 3 < 6)
      (2L, s"bad bad bad $fill"),  // classifier: weight of 'bad' sinks it
      (5L, s"keep me $fill aa"))   // survives
      .toDF("doc_id", "text")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val funnel = Curation.funnel(d, "doc_id", "text", weights)
      .orderBy("stage_ord").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(funnel.toSeq == Seq(
      "raw" -> 5L, "quality" -> 4L, "dedup" -> 3L, "classifier" -> 2L,
      "sample" -> 2L)) // both survivor ids are in the sample keep window
    val survivors = Curation.curate(d, "doc_id", "text", weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(3L, 5L))
  }

  test("funnel counts are monotone non-increasing on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val weights = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .distinct()
      .withColumn("h", graft.ops.TextOps.charHash(col("term")))
      .filter(pmod(col("h"), lit(3)) === 0)
      .select(col("term"), (pmod(col("h"), lit(21)) - 10).as("weight"))
    val counts = Curation.funnel(docs, "doc_id", "text", weights)
      .orderBy("stage_ord").collect().map(_.getLong(2))
    assert(counts.length == 5 && counts.head > 0)
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    // the curated set is exactly the last stage's count
    assert(Curation.curate(docs, "doc_id", "text", weights).count() == counts.last)
  }

  test("url stages: blocklisted domain drops first, canonical-URL dupes collapse, then the text funnel runs") {
    import graft.ops.{Curation, UrlOps}
    val fill = (1 to 20).map(i => s"x$i").mkString(" ")
    val d = Seq(
      // 3 and 5: survivor ids in the hash-sample keep window (above)
      (3L, s"good $fill", "https://news.example.com/a/1"),
      // same canonical URL as doc 3 after scheme/www/tracking strip:
      // url_dedup keeps doc 3 (smaller id)
      (7L, s"keep me $fill aa", "HTTP://WWW.News.Example.com/a/1/?utm_source=x"),
      // blocked domain (subdomain of the blocklist entry)
      (1L, s"keep me $fill aa", "https://cdn.spamhub.example/a/2"),
      // distinct URL, survives URL stages; text survives the funnel
      (5L, s"keep me $fill aa", "https://news.example.com/a/2"))
      .toDF("doc_id", "text", "url")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val stages = Curation.stages(d, "doc_id", "text", weights,
      urlCol = "url", blockedDomains = Seq("spamhub.example"))
    assert(stages.map(_._1) == Seq("raw", "domain_block", "url_dedup",
      "quality", "dedup", "classifier", "sample"))
    val counts = stages.map { case (n, f) => n -> f.count() }.toMap
    assert(counts("raw") == 4 && counts("domain_block") == 3 &&
      counts("url_dedup") == 2)
    val survivors = stages.last._2.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(3L, 5L))
    // the canonicalizer itself: every rule in one value
    val canon = d.select(UrlOps.canonicalizeUrl(
      lit("HTTPS://WWW.News.Example.com:443/a/1/?utm_source=x&q=2&fbclid=z#f")))
      .head().getString(0)
    assert(canon == "news.example.com/a/1?q=2", canon)
  }

  test("fromHtml prepends the extraction stage: boilerplate-only pages drop, article pages feed the funnel clean") {
    val fill = (1 to 20).map(i => s"x$i").mkString(" ")
    val article = s"the story of a house and $fill"
    val d = Seq(
      (0L, s"<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
        s"<p>$article</p><div>Copyright <a href='/t'>Terms</a></div>"),
      (1L, "<nav><a href='/'>Home</a> <a href='/a'>About</a> " +
        "<a href='/c'>Contact</a> <a href='/d'>Docs</a></nav>")) // menu-only page
      .toDF("doc_id", "text")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val stages = Curation.stages(d, "doc_id", "text", weights,
      fromHtml = true)
    assert(stages.map(_._1) == Seq("raw", "extract", "quality", "dedup",
      "classifier", "sample"))
    val extract = stages(1)._2
    assert(extract.count() == 1L) // the menu-only page dropped
    val text = extract.filter(col("doc_id") === 0L)
      .select("text").collect()(0).getString(0)
    assert(text == article, s"funnel must see CLEAN text, got: $text")
    assert(!text.contains("Home") && !text.contains("Copyright"))
    // funnel report carries the extract stage count
    val funnel = Curation.funnel(d, "doc_id", "text", weights)
    assert(funnel.count() == 5) // default path unchanged
  }

  test("boilerplateMaxDf inserts the line-cut stage between extract and quality") {
    val fill = (1 to 20).map(i => s"w$i").mkString(" ")
    // every doc shares a nav line (df 4 > maxDf 2 -> cut); doc 9 is
    // nav+blank only and must DISAPPEAR at the boilerplate stage; the
    // rest carry unique content that survives to quality
    val d = Seq(
      (1L, s"NAV HOME ABOUT\ncontent one $fill\n\ntail 1"),
      (2L, s"NAV HOME ABOUT\ncontent two $fill\n\ntail 2"),
      (3L, s"NAV HOME ABOUT\ncontent three $fill\n\ntail 3"),
      (9L, "NAV HOME ABOUT\n\n")) // boilerplate-only page
      .toDF("doc_id", "text")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val stages = Curation.stages(d, "doc_id", "text", weights,
      boilerplateMaxDf = 2)
    assert(stages.map(_._1) == Seq("raw", "boilerplate", "quality",
      "dedup", "classifier", "sample"))
    val bp = stages(1)._2
    assert(bp.count() == 3L, "the nav-only page must drop at the boilerplate stage")
    val t1 = bp.filter(col("doc_id") === 1L).select("text").head().getString(0)
    assert(t1 == s"content one $fill\n\ntail 1",
      s"nav line cut, structure kept: $t1")
    // downstream stages consume the CUT text (the nav words are gone
    // before quality/dedup ever key on them)
    val quality = stages(2)._2
    assert(quality.count() == 3L)
    // composes with the URL stages in CCNet order
    val withUrl = d.withColumn("url",
      concat(lit("http://h"), col("doc_id"), lit(".example/p")))
    val names = Curation.stages(withUrl, "doc_id", "text", weights,
      urlCol = "url", boilerplateMaxDf = 2).map(_._1)
    assert(names == Seq("raw", "domain_block", "url_dedup", "boilerplate",
      "quality", "dedup", "classifier", "sample"))
    // funnel report carries the stage row
    val funnel = Curation.funnel(d, "doc_id", "text", weights,
      boilerplateMaxDf = 2).orderBy("stage_ord").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(funnel.toSeq.take(2) == Seq("raw" -> 4L, "boilerplate" -> 3L))
  }

  test("all opt-in stages together run the complete nine-stage CCNet order") {
    val fill = (1 to 25).map(i => s"of word$i").mkString(" ")
    // each page: url + html whose article lines are separate <p> blocks —
    // a shared nav line that PASSES extraction (long, stopword-bearing,
    // link-free: extraction cannot catch side-wide repeats) and a unique
    // tail; the nav line must then fall to the boilerplate df-cut
    val nav = "the navigation menu of the home page and the about page"
    val d = (1L to 4L).map { i =>
      (i, s"<html><body><nav><a href='/'>Home</a></nav><p>$nav</p>" +
        s"<p>content $i $fill</p><p>the unique tail of document $i</p>" +
        "</body></html>",
        s"http://h$i.example/p")
    }.toDF("doc_id", "text", "url")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val stages = Curation.stages(d, "doc_id", "text", weights,
      urlCol = "url", fromHtml = true, boilerplateMaxDf = 2)
    assert(stages.map(_._1) == Seq("raw", "domain_block", "url_dedup",
      "extract", "boilerplate", "quality", "dedup", "classifier",
      "sample"))
    // extraction kept the nav LINE (it passes the block gates) and
    // dropped the link-only template nav; the df-cut then removes it
    val extracted = stages(3)._2.filter(col("doc_id") === 1L)
      .select("text").head().getString(0)
    assert(extracted.contains(nav) && !extracted.contains("Home"))
    val deboiled = stages(4)._2.filter(col("doc_id") === 1L)
      .select("text").head().getString(0)
    assert(!deboiled.contains(nav) && deboiled.contains("content 1"))
    // funnel reports all nine ordinals; curate returns the tail stage
    // (the sample stage is a hash downsample, so its count is whatever
    // the 800/1000 hash gate keeps — compare against the stage itself,
    // and pin that everything upstream of it survived intact)
    val funnel = Curation.funnel(d, "doc_id", "text", weights,
        urlCol = "url", fromHtml = true, boilerplateMaxDf = 2)
      .orderBy("stage_ord").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(funnel.length == 9)
    assert(funnel.take(8).forall(_._2 == 4L), s"pre-sample drop: ${funnel.toSeq}")
    assert(Curation.curate(d, "doc_id", "text", weights, urlCol = "url",
      fromHtml = true, boilerplateMaxDf = 2).count() == funnel.last._2)
  }
}
