package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Pipeline

/** CLI end-to-end: `Pipeline.main` over a fixture source directory runs
  * the full O9 (changes fold) → O16 (export flag) → O20 (enrichment
  * fetch + upsert) composition and publishes the index — the Spark
  * analog of the reference's CLI test (test_tmdb_index.py:438-470),
  * with the per-id HTTP loop answered from external_ids.jsonl.
  */
class CliSpec extends SparkSpec {

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
  }

  private def freshDirs(tag: String): (String, String) = {
    val root = s"/tmp/graft_cli_$tag"
    val src = s"$root/src"
    val idx = s"$root/index.parquet"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    (src, idx)
  }

  test("main: changes + export + enrichment fixtures produce the full index") {
    val (src, idx) = freshDirs("e2e")
    // day feed: id 1 appears twice (keep-LAST in feed order wins), id 3 once
    writeLines(s"$src/changes/2024-01-02.jsonl", Seq(
      """{"id": 1, "adult": false, "__ord": 0}""",
      """{"id": 3, "adult": true, "__ord": 1}""",
      """{"id": 1, "adult": true, "__ord": 2}"""))
    writeLines(s"$src/export.jsonl", Seq(
      """{"id": 0}""", """{"id": 1}""", """{"id": 2}"""))
    // enrichment answers for ids 0 and 1 only; 2 and 3 are "404"s
    writeLines(s"$src/external_ids.jsonl", Seq(
      """{"id": 0, "imdb_id": "tt100", "wikidata_id": "Q7", "tvdb_id": 5}""",
      """{"id": 1, "imdb_id": "ttbad", "wikidata_id": "Q9000000000", "tvdb_id": null}"""))

    Pipeline.main(Array("--tmdb-type", "tv", "--file", idx, "--source-dir", src,
      "--tmdb-api-key", "k", "--verbose"))

    val got = spark.read.parquet(idx)
    // left fields (fold + flag) first, then the enrichment delta's novel
    // columns in delta order (queue id -> typed ids -> stamp)
    assert(got.columns.toSeq == Seq("id", "date", "adult", "in_export",
      "tvdb_id", "success", "imdb_numeric_id", "wikidata_numeric_id", "retrieved_at"))
    val rows = got.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L)) // dense ids
    def r(i: Int) = rows(i)
    // changes fold: id 1 keep-last adult=true; id 3 from the feed; 0/2 gaps
    assert(r(1).getAs[Boolean]("adult") && r(3).getAs[Boolean]("adult"))
    assert(r(1).getDate(r(1).fieldIndex("date")).toString == "2024-01-02")
    assert(r(0).isNullAt(r(0).fieldIndex("date")))
    // export flag: 0,1,2 exported (gap row 2 included), 3 not
    assert(rows.map(_.getAs[Boolean]("in_export")).toSeq ==
      Seq(true, true, true, false))
    // enrichment: fixture hits typed + clamped, misses recorded as failures
    assert(r(0).getAs[Boolean]("success"))
    assert(r(0).getAs[Long]("imdb_numeric_id") == 100L)
    assert(r(0).getAs[Long]("wikidata_numeric_id") == 7L)
    assert(r(0).getAs[Long]("tvdb_id") == 5L)
    assert(r(1).getAs[Boolean]("success"))
    assert(r(1).isNullAt(r(1).fieldIndex("imdb_numeric_id"))) // "ttbad"
    assert(r(1).isNullAt(r(1).fieldIndex("wikidata_numeric_id"))) // > uint32
    assert(!r(2).getAs[Boolean]("success")) // queued but absent from fixture
    assert(!r(3).getAs[Boolean]("success"))
    rows.foreach(row => assert(!row.isNullAt(row.fieldIndex("retrieved_at"))))
    graft.ops.IndexOps.validateId(got)
  }

  test("main: movie type unions the collection export keep-first") {
    val (src, idx) = freshDirs("collexp")
    writeLines(s"$src/changes/2024-01-02.jsonl", Seq(
      """{"id": 0, "adult": false, "__ord": 0}""",
      """{"id": 1, "adult": false, "__ord": 1}""",
      """{"id": 2, "adult": false, "__ord": 2}"""))
    writeLines(s"$src/export.jsonl", Seq("""{"id": 0}"""))
    writeLines(s"$src/collection_export.jsonl", Seq("""{"id": 1}""", """{"id": 0}"""))
    Pipeline.main(Array("--tmdb-type", "movie", "--file", idx, "--source-dir", src))
    val rows = spark.read.parquet(idx).orderBy("id").collect()
    // 0 from the movie export (dup in collection collapses keep-first),
    // 1 only from the collection export, 2 in neither
    assert(rows.map(r => (r.getLong(0), r.getAs[Boolean]("in_export"))).toSeq ==
      Seq((0L, true), (1L, true), (2L, false)))
  }

  test("main: second run refreshes from the persisted index; --dry-run does not publish") {
    val (src, idx) = freshDirs("rerun")
    writeLines(s"$src/changes/2024-01-02.jsonl", Seq(
      """{"id": 1, "adult": false, "__ord": 0}"""))
    writeLines(s"$src/external_ids.jsonl", Seq(
      """{"id": 0, "imdb_id": "tt1", "wikidata_id": "Q1", "tvdb_id": null}"""))
    Pipeline.main(Array("--tmdb-type", "movie", "--file", idx, "--source-dir", src))
    val first = spark.read.parquet(idx)
    assert(!first.columns.contains("tvdb_id")) // movie type drops tvdb
    assert(first.count() == 2)

    // second run re-reads the published index (now with retrieved_at) and
    // exercises the refresh branch of the queue; --dry-run must not write
    val firstRows = first.orderBy("id").collect().map(_.toString).toSeq
    Pipeline.main(Array("--tmdb-type", "movie", "--file", idx, "--source-dir", src,
      "--dry-run"))
    val second = spark.read.parquet(idx)
    assert(second.orderBy("id").collect().map(_.toString).toSeq == firstRows)
  }
}
