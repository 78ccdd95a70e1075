package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("funnel drops the right doc at each stage") {
    // crafted so each stage removes exactly one known doc:
    val fill = (1 to 20).map(i => s"x$i").mkString(" ")
    val d = Seq(
      (0L, s"GOOD  $fill"),       // survives everything (normalize fixes case/spaces)
      (1L, "too short"),           // quality: < 20 words
      (2L, s"good $fill"),         // dedup: same canonical text as doc 0
      (3L, s"bad bad bad $fill"),  // classifier: weight of 'bad' sinks it
      (4L, s"keep me $fill aa"))   // survives
      .toDF("doc_id", "text")
    val weights = Seq(("bad", -100L)).toDF("term", "weight")
    val funnel = Curation.funnel(d, "doc_id", "text", weights)
      .orderBy("stage_ord").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(funnel.toSeq == Seq(
      "raw" -> 5L, "quality" -> 4L, "dedup" -> 3L, "classifier" -> 2L,
      "sample" -> 2L)) // 800/1000 sample happens to keep both here
    val survivors = Curation.curate(d, "doc_id", "text", weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 4L))
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
}
