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

  test("runCli: TMDB_-prefixed env limits drive the run and win over legacy names") {
    val (src, idx) = freshDirs("envparity")
    writeLines(s"$src/changes/2024-01-02.jsonl", Seq(
      """{"id": 0, "adult": false, "__ord": 0}"""))
    writeLines(s"$src/external_ids.jsonl", Seq(
      """{"id": 0, "imdb_id": "tt1", "wikidata_id": "Q1", "tvdb_id": null}"""))
    // reference env names (tmdb_index.py:636,645,652) zero the queue; the
    // legacy names say 10000 — TMDB_* must win, so NO enrichment happens
    Pipeline.runCli(Array("--tmdb-type", "movie", "--file", idx, "--source-dir", src),
      Map("TMDB_BACKFILL_LIMIT" -> "0", "TMDB_REFRESH_LIMIT" -> "0",
        "BACKFILL_LIMIT" -> "10000", "REFRESH_LIMIT" -> "1000"))
    val cols = spark.read.parquet(idx).columns.toSeq
    assert(!cols.contains("success") && !cols.contains("retrieved_at"), cols.toString)

    // legacy names still work as fallback when the TMDB_ ones are unset
    val (src2, idx2) = freshDirs("envparity2")
    writeLines(s"$src2/changes/2024-01-02.jsonl", Seq(
      """{"id": 0, "adult": false, "__ord": 0}"""))
    writeLines(s"$src2/external_ids.jsonl", Seq(
      """{"id": 0, "imdb_id": "tt1", "wikidata_id": "Q1", "tvdb_id": null}"""))
    Pipeline.runCli(Array("--tmdb-type", "movie", "--file", idx2, "--source-dir", src2),
      Map("BACKFILL_LIMIT" -> "1", "REFRESH_LIMIT" -> "0"))
    assert(spark.read.parquet(idx2).columns.contains("success"))
  }

  test("publish crash recovery: interrupted swap is completed or rolled back, never empty") {
    import spark.implicits._
    val root = "/tmp/graft_cli_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val idx = s"$root/index.parquet"
    // crash AFTER the old index was set aside, BEFORE staging landed:
    // only __old exists -> readOrInit rolls it back
    Pipeline.writeIndex(Seq(1L, 2L).toDF("id"), idx)
    assert(new java.io.File(idx).renameTo(new java.io.File(idx + "__old")))
    assert(Pipeline.readOrInit(spark, idx).count() == 2)
    assert(new java.io.File(idx).exists() && !new java.io.File(idx + "__old").exists())

    // crash BETWEEN the renames with the (complete) staging dir present:
    // the NEW index finishes its swap and the aside copy is cleared
    Pipeline.writeIndex(Seq(1L, 2L, 3L).toDF("id"), idx + "__staging")
    assert(new java.io.File(idx).renameTo(new java.io.File(idx + "__old")))
    assert(Pipeline.readOrInit(spark, idx).count() == 3)
    assert(!new java.io.File(idx + "__old").exists())
    assert(!new java.io.File(idx + "__staging").exists())

    // normal publish path keeps working end to end
    Pipeline.writeIndex(Seq(1L, 2L, 3L, 4L).toDF("id"), idx + "__staging")
    Pipeline.publishStaged(idx + "__staging", idx)
    assert(spark.read.parquet(idx).count() == 4)
    assert(!new java.io.File(idx + "__old").exists())
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
