package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  // doc 0/1 near-identical (one word changed), doc 2 unrelated,
  // doc 3 exact dup of 0.
  private val docs = Seq(
    (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    (1L, "w1 w2 w3 w4 wX w6 w7 w8 w9 w10"),
    (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
    (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
    .toDF("doc_id", "text")

  test("exactDupGroups groups identical texts under the min id") {
    val got = DedupOps.exactDupGroups(docs, "doc_id", "text")
      .orderBy("canonical_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("exactDupGroups hashed key matches text key on the real corpus; plan shuffles the hash") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("canonical_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hashed = DedupOps.exactDupGroups(corpus, "doc_id", "text")
    assert(norm(hashed) ==
      norm(DedupOps.exactDupGroups(corpus, "doc_id", "text", hashKey = false)))
    // the aggregate key in the plan is the 8-byte hash, not the document
    assert(hashed.queryExecution.executedPlan.toString.contains("xxhash64"))
  }

  test("chunkDedup keeps first occurrence of repeated chunks and reassembles") {
    // 4-token chunks; "h1 h2 h3 h4" is boilerplate shared by docs 1 and 2
    val d = Seq(
      (1L, "h1 h2 h3 h4 a b c d"),
      (2L, "h1 h2 h3 h4 x y z w"),
      (3L, "h1 h2 h3 h4")) // all chunks repeated -> doc vanishes
      .toDF("doc_id", "text")
    val got = DedupOps.chunkDedup(d, "doc_id", "text", chunkTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "h1 h2 h3 h4 a b c d", 2L, 8L),
      (2L, "x y z w", 1L, 4L)))
  }

  test("cutBoilerplateLines: remove-ALL semantics, blanks are structure, df counts docs") {
    val d = Seq(
      (1L, "NAV\ncontent one\n\nNAV"), // NAV twice here; blank stays
      (2L, "NAV\ncontent two"),
      (3L, "NAV\ncontent three"),
      (4L, "NAV"), // only boilerplate -> disappears entirely
      (5L, "quote\ncontent five"),
      (6L, "quote\ncontent six")) // quote df=2 <= maxDf -> content, kept
      .toDF("doc_id", "text")
    val m = DedupOps.cutBoilerplateLines(d, "doc_id", "text", maxDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // NAV is in 4 docs > maxDf: cut EVERYWHERE, first occurrence included
    // (chunkDedup's keep-first would have enshrined it in doc 1)
    assert(!m.contains(4L), "a doc of pure boilerplate must disappear")
    assert(m(1L) == (("content one\n", 2L, 2L))) // blank line survives in place
    assert(m(2L) == (("content two", 1L, 1L)))
    assert(m(5L) == (("quote\ncontent five", 2L, 0L)))
    assert(m(6L)._1 == "quote\ncontent six")
    // hashed key equals byte key
    val h = DedupOps.cutBoilerplateLines(d, "doc_id", "text", maxDf = 2,
      hashKey = false).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(h == m)
    // df counts DOCS, not occurrences: a 50-fold repeat inside ONE doc
    // is within-doc repetition (dedupChunksWithinDocs' job), never
    // corpus boilerplate
    val rep = Seq(
      (1L, (Seq.fill(50)("again again") :+ "real content").mkString("\n")),
      (2L, "other text")).toDF("doc_id", "text")
    val kept1 = DedupOps.cutBoilerplateLines(rep, "doc_id", "text", maxDf = 2)
      .filter(col("doc_id") === 1L).head().getString(1)
    assert(kept1.contains("again again") && kept1.contains("real content"))
  }

  test("cutBoilerplateLines: CRLF/tab blank lines are structure — paragraph breaks survive a corpus-wide banner cut") {
    // CRLF corpus: every line ends in \r, blank lines split out as "\r".
    // Under a space-only trim test (the r17 bug) "\r" reads as content,
    // shares ONE key across all docs (df = 3 > maxDf), and every
    // paragraph break is cut corpus-wide. The r18 blank test (ASCII
    // whitespace class: space/tab/CR/FF/VT) keeps them in place.
    val crlf = Seq(
      (1L, "BANNER\r\npara one a\r\n\r\npara one b\r"),
      (2L, "BANNER\r\npara two a\r\n\r\npara two b\r"),
      (3L, "BANNER\r\npara three a\r\n\t\npara three b\r")) // tab-blank
      .toDF("doc_id", "text")
    val m = DedupOps.cutBoilerplateLines(crlf, "doc_id", "text", maxDf = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the banner (df 3 > 2) is cut everywhere; the structural blank
    // ("\r" / "\t") survives IN PLACE between the two paragraphs
    assert(m(1L) == (("para one a\r\n\r\npara one b\r", 3L, 1L)))
    assert(m(2L) == (("para two a\r\n\r\npara two b\r", 3L, 1L)))
    assert(m(3L) == (("para three a\r\n\t\npara three b\r", 3L, 1L)))
    // a doc of banner + blanks only still disappears (blanks cannot
    // carry a doc alone)
    val only = Seq(
      (1L, "BANNER\r\nx\r"), (2L, "BANNER\r\ny\r"), (3L, "BANNER\r\nz\r"),
      (4L, "BANNER\r\n\r\n\r")).toDF("doc_id", "text")
    assert(!DedupOps.cutBoilerplateLines(only, "doc_id", "text", maxDf = 2)
      .collect().map(_.getLong(0)).contains(4L))
    // the incremental form shares the same blank rule: "\r" blanks are
    // never keyed into the index and never cut against it
    val idx = DedupOps.boilerplateLineIndex(crlf, "doc_id", "text")
    assert(idx.filter(col("line_key") ===
      org.apache.spark.sql.functions.xxhash64(lit("\r"))).count() == 0)
    val day2 = Seq((10L, "BANNER\r\nnew a\r\n\r\nnew b\r")).toDF("doc_id", "text")
    val cleaned = DedupOps.cutBoilerplateAgainstIndex(
      day2, idx, "doc_id", "text", maxDf = 2)._1.collect()
    assert(cleaned.length == 1 &&
      cleaned.head.getString(1) == "new a\r\n\r\nnew b\r")
  }

  test("cutBoilerplateAgainstIndex: COMBINED df crosses the threshold; the index folds forward-only") {
    val day1 = Seq((1L, "PROMO BANNER\nalpha"), (2L, "PROMO BANNER\nbeta"))
      .toDF("doc_id", "text")
    val idx1 = DedupOps.boilerplateLineIndex(day1, "doc_id", "text",
      hashKey = false)
    assert(idx1.count() == 3) // PROMO df 2, alpha 1, beta 1
    val day2 = Seq((10L, "PROMO BANNER\ngamma"), (11L, "PROMO BANNER\ndelta"))
      .toDF("doc_id", "text")
    // batch df alone = 2 <= maxDf 3: cutBoilerplateLines on day2 would
    // keep the banner — only the STANDING index pushes it over
    assert(DedupOps.cutBoilerplateLines(day2, "doc_id", "text", maxDf = 3)
      .filter(col("clean_text").contains("PROMO")).count() == 2)
    val (cleaned, folded) = DedupOps.cutBoilerplateAgainstIndex(
      day2, idx1, "doc_id", "text", maxDf = 3, hashKey = false)
    val m = cleaned.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m == Map(
      10L -> (("gamma", 1L, 1L)),
      11L -> (("delta", 1L, 1L))))
    // the folded index carries combined dfs, ready to publish
    val dfs = folded.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs("PROMO BANNER") == 4L && dfs("gamma") == 1L &&
      dfs("alpha") == 1L)
    // hashed-key form cuts identically
    val idxH = DedupOps.boilerplateLineIndex(day1, "doc_id", "text")
    val cleanedH = DedupOps.cutBoilerplateAgainstIndex(
      day2, idxH, "doc_id", "text", maxDf = 3)._1.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleanedH == Map(10L -> "gamma", 11L -> "delta"))
  }

  test("duplicatedPassages finds cross-document repeated windows") {
    val d = Seq(
      (0L, "p q r s t"),
      (1L, "x p q r s"),
      (2L, "z z z"),
      (3L, "z z z z"))
      .toDF("doc_id", "text")
    val got = DedupOps.duplicatedPassages(d, "doc_id", "text", winTokens = 3)
      .orderBy("passage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("p q r", 2L, 2L, 0L),
      ("q r s", 2L, 2L, 0L),
      ("z z z", 2L, 3L, 2L)))
    // stride=2 samples offsets 0,2,…: only the z-run repeat still has an
    // occurrence on a sampled offset in BOTH docs (doc 3's offset-1 copy
    // is skipped, so its occurrence count drops to one per doc)
    val strided = DedupOps.duplicatedPassages(d, "doc_id", "text",
      winTokens = 3, stride = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(strided.toSeq == Seq(("z z z", 2L, 2L, 2L)))
    // docs shorter than the window contribute nothing
    assert(DedupOps.duplicatedPassages(d, "doc_id", "text", winTokens = 6)
      .count() == 0L)
  }

  test("duplicatedPassagesExact == byte-keyed stride-1 brute force (fixture + real corpus)") {
    val d = Seq(
      (0L, "p q r s t"), (1L, "x p q r s"), (2L, "z z z"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("passage")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(DedupOps.duplicatedPassagesExact(d, "doc_id", "text", 3)) ==
      rows(DedupOps.duplicatedPassages(d, "doc_id", "text", 3,
        stride = 1, hashKey = false)))
    // and on the real corpus: the two-level plan's candidate pruning
    // must not change the byte-exact answer
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(rows(DedupOps.duplicatedPassagesExact(corpus, "doc_id", "text", 6)) ==
      rows(DedupOps.duplicatedPassages(corpus, "doc_id", "text", 6,
        stride = 1, hashKey = false)))
  }

  test("passageRecall: stride 1 is exhaustive; stride misses only stride-misaligned repeats") {
    // the aligned repeat ("p q r" at offset 0 in both docs) survives any
    // stride; the misaligned one ("a b c" at offsets 0 vs 1) is missed
    // by every stride > 1 — the scaladoc's a ≡ b (mod stride) condition
    val d = Seq(
      (0L, "p q r s t u"),
      (1L, "p q r x y z"),
      (2L, "a b c m n o"),
      (3L, "k a b c n o"))
      .toDF("doc_id", "text")
    def rec(stride: Int) = {
      val r = DedupOps.passageRecall(d, "doc_id", "text",
        winTokens = 3, stride = stride).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    assert(rec(1) == ((2L, 2L, 2L, 1.0)))
    val (ne, na, nb, r2) = rec(2)
    assert(ne == 2L && na == 1L && nb == 1L && r2 == 0.5)
    // on the real corpus: approx passages are a SUBSET of exact (stride
    // multiples enumerate a subset of all offsets), so recall = na/ne
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val row = DedupOps.passageRecall(corpus, "doc_id", "text",
      winTokens = 6, stride = 3).head()
    assert(row.getLong(2) == row.getLong(1), "approx must nest in exact")
    assert(row.getLong(0) > 0 && row.getDouble(3) <= 1.0)
  }

  test("duplicatedPassages hashed key matches text key on the real corpus; two-level agg plan") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("passage").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val hashed = DedupOps.duplicatedPassages(corpus, "doc_id", "text", winTokens = 6)
    assert(norm(hashed).nonEmpty)
    assert(norm(hashed) ==
      norm(DedupOps.duplicatedPassages(corpus, "doc_id", "text", winTokens = 6,
        hashKey = false)))
    val plan = hashed.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
  }

  test("cutDuplicatedPassages removes repeats, keeps the canonical copy") {
    // "b1..b4" is boilerplate shared by docs 0 and 1 (and repeated twice
    // inside doc 2); win=4 covers it exactly
    val d = Seq(
      (0L, "b1 b2 b3 b4 u1 u2 u3 u4"),
      (1L, "v1 v2 v3 b1 b2 b3 b4"),
      (2L, "b1 b2 b3 b4 b1 b2 b3 b4"),
      (3L, "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text")
    val got = DedupOps.cutDuplicatedPassages(d, "doc_id", "text", winTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "b1 b2 b3 b4 u1 u2 u3 u4", 8L, 0L), // canonical host keeps it
      (1L, "v1 v2 v3", 3L, 4L),                // later copy cut
      (3L, "w1 w2 w3 w4 w5", 5L, 0L)))         // untouched
    // doc 2: offsets 1-4 are dup windows too (overlapping coverage) and
    // its offset-0 window loses to doc 0's canonical -> fully cut, vanishes
    assert(!got.map(_._1).contains(2L))
  }

  test("cutDuplicatedPassages on the real corpus: total volume conserved, no cartesian") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cut = DedupOps.cutDuplicatedPassages(corpus, "doc_id", "text", winTokens = 6)
    val plan = cut.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
    val Array(kept, cutN) = cut.agg(sum("n_words_kept"), sum("n_words_cut"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).flatMap(t => Array(t._1, t._2))
    val total = corpus.filter(col("text").isNotNull)
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    // vanished docs' words are all in n_words_cut of... no — vanished docs
    // emit no row, so kept + cut only covers surviving docs. Conservation:
    // kept + cut == total words of surviving docs
    val survivors = cut.select("doc_id")
    val survivorWords = corpus.join(survivors, "doc_id")
      .agg(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    assert(kept + cutN == survivorWords)
    assert(kept <= total)
    // hashed key equals byte-exact key end-to-end
    val exact = DedupOps.cutDuplicatedPassages(corpus, "doc_id", "text",
      winTokens = 6, hashKey = false)
    assert(cut.orderBy("doc_id").collect().toSeq ==
      exact.orderBy("doc_id").collect().toSeq)
  }

  test("pairRecall scores an approximate pair set against the exact one") {
    val exact = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val r = DedupOps.pairRecall(exact, approx).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (3L, 3L, 2L))
    assert(r.getDouble(3) == 2.0 / 3.0)
    // a verified-LSH generator on the real corpus: recall vs its own
    // exact counterpart is 1.0 at these dials (both sides seen in
    // q_ngram/q_minhash_lsh oracles; threshold-edge deltas would show
    // here first when a dial is mistuned)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val score = DedupOps.pairRecall(
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
        minJaccard = 0.5, maxDf = 1000),
      DedupOps.minhashDedupPairs(docs, "doc_id", "text", numHashes = 16,
        k = 3, bands = 8, minJaccard = 0.5)).collect()(0)
    assert(score.getLong(0) > 0)
    assert(score.getLong(2) <= score.getLong(0))
    // empty exact side: recall is NULL, never an ANSI divide-by-zero
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val z = DedupOps.pairRecall(none, approx).collect()(0)
    assert(z.getLong(0) == 0L && z.getLong(1) == 3L && z.isNullAt(3))
  }

  test("dedupChunksWithinDocs keeps first chunk occurrence per doc, map-only") {
    val d = Seq(
      (0L, "a b c d a b c d e f"),   // chunk "a b c d" repeats; tail "e f"
      (1L, "x y x y"),               // one 4-token chunk, nothing to cut
      (2L, "p q p q p q p q"),       // two identical chunks -> one kept
      (3L, "solo"))
      .toDF("doc_id", "text")
    val got = DedupOps.dedupChunksWithinDocs(d, "doc_id", "text", chunkTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "a b c d e f", 3L, 2L),
      (1L, "x y x y", 1L, 1L),
      (2L, "p q p q", 2L, 1L),
      (3L, "solo", 1L, 1L)))
    // cross-doc repeats are NOT touched (that's chunkDedup's job):
    // docs 1 and 2 share no fate here despite repeating content
    // map-only: zero exchanges on a real scan
    val plan = DedupOps.dedupChunksWithinDocs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", chunkTokens = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("property: dedupChunksWithinDocs equals an in-memory reference on random corpora") {
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 4) {
      val ct = 1 + rnd.nextInt(3)
      val docs = (0 until 12).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(10))(s"w${rnd.nextInt(3)}")
        (i.toLong, words.mkString(" "))
      }
      val got = DedupOps.dedupChunksWithinDocs(
          docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens = ct)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val expected = docs.map { case (id, text) =>
        val chunks = text.split(" ", -1).grouped(ct).map(_.mkString(" ")).toSeq
        val kept = chunks.distinct
        (id, kept.mkString(" "), chunks.size.toLong, kept.size.toLong)
      }.toSet
      assert(got == expected, s"chunkTokens=$ct")
    }
  }

  test("exactSubstrDedup: cutting exposes residue dups only the exact pass can collapse") {
    // docs 10/11 share residue "r1 r2 r3" but wrap DIFFERENT duplicated
    // passages (P hosted canonically by doc 0, Q by doc 1) — before the
    // cut they are not exact dups; after it they are byte-identical, so
    // the composed pipeline (detect -> cut -> exact dedup, Lee et al.
    // ACL 2022) keeps only the min-id residue
    val d = Seq(
      (0L, "p1 p2 p3 p4 x1 x2 x3"),
      (1L, "q1 q2 q3 q4 y1 y2 y3"),
      (10L, "r1 r2 r3 p1 p2 p3 p4"),
      (11L, "r1 r2 r3 q1 q2 q3 q4"))
      .toDF("doc_id", "text")
    val got = DedupOps.exactSubstrDedup(d, "doc_id", "text", winTokens = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "p1 p2 p3 p4 x1 x2 x3", 7L, 0L),
      (1L, "q1 q2 q3 q4 y1 y2 y3", 7L, 0L),
      (10L, "r1 r2 r3", 3L, 4L))) // doc 11's identical residue collapsed
    // the cut alone would NOT have collapsed 10/11
    assert(DedupOps.cutDuplicatedPassages(d, "doc_id", "text", winTokens = 4)
      .count() == 4L)
  }

  test("property: cutDuplicatedPassages equals brute force on random corpora") {
    val rnd = new scala.util.Random(31)
    for (c <- 0 until 4) {
      val docs = (0 until 10).map { i =>
        val words = Seq.fill(2 + rnd.nextInt(8))(s"w${rnd.nextInt(3)}")
        (i.toLong, words.mkString(" "))
      }
      val win = 2
      val got = DedupOps.cutDuplicatedPassages(docs.toDF("doc_id", "text"),
          "doc_id", "text", winTokens = win)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // brute force: all window occurrences, canonical = min (id, off),
      // cover positions of non-canonical occurrences of repeated windows
      val occ = docs.flatMap { case (id, text) =>
        val ws = text.split(" ", -1)
        (0 to ws.length - win).map(off => (id, off, ws.slice(off, off + win).mkString(" ")))
      }
      val byKey = occ.groupBy(_._3)
      val covered = occ.filter { case (id, off, p) =>
        val os = byKey(p)
        os.size >= 2 && os.minBy(o => (o._1, o._2)) != ((id, off, p))
      }.flatMap { case (id, off, _) => (off until off + win).map(pos => (id, pos)) }.toSet
      val want = docs.map { case (id, text) =>
        val ws = text.split(" ", -1)
        id -> ws.zipWithIndex.collect {
          case (w, pos) if !covered((id, pos)) => w }.mkString(" ")
      }.filter(_._2.nonEmpty).toMap
      assert(got == want, s"case $c docs=$docs")
    }
  }

  test("ngramContainmentPairs finds embedded documents Jaccard misses") {
    // doc 1 is doc 0's first third: containment(1 -> 0) = 1.0 while
    // Jaccard(0, 1) is far below any useful threshold
    val big = (1 to 30).map(i => s"t$i").mkString(" ")
    val small = (1 to 10).map(i => s"t$i").mkString(" ")
    val d = Seq((0L, big), (1L, small), (2L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val got = DedupOps.ngramContainmentPairs(d, "doc_id", "text",
        k = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(got.toSeq == Seq((1L, 0L, 1.0)))
    // the symmetric op at the same bar sees nothing
    assert(DedupOps.ngramJaccardPairs(d, "doc_id", "text",
      k = 3, minJaccard = 0.5).count() == 0L)
    // both directions emit when sets are identical
    val dup = Seq((0L, small), (1L, small)).toDF("doc_id", "text")
    val both = DedupOps.ngramContainmentPairs(dup, "doc_id", "text",
        k = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(both == Set((0L, 1L), (1L, 0L)))
  }

  test("ngramContainmentPairs plan: no cartesian, candidates from the posting join") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = DedupOps.ngramContainmentPairs(corpus, "doc_id", "text",
      k = 3, minContainment = 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(pairs.collect().forall(r => r.getDouble(5) >= 0.5 && r.getDouble(5) <= 1.0))
  }

  test("chunkDedup hashed key matches text key on the real corpus; no sort exchange") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val hashed = DedupOps.chunkDedup(corpus, "doc_id", "text", chunkTokens = 32)
    assert(norm(hashed) ==
      norm(DedupOps.chunkDedup(corpus, "doc_id", "text", chunkTokens = 32,
        hashKey = false)))
    // first-occurrence is a hash aggregate on a packed long — never a
    // row_number window (sort exchange) over all chunks
    val plan = hashed.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("exactDedup keeps the canonical row per text") {
    val ids = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L))
  }

  test("ngramJaccardPairs finds near and exact duplicates") {
    val got = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", k = 3, minJaccard = 0.2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // 8 trigrams each; 0 vs 1 share the trigrams not touching w5 -> 5/11.
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    val j01 = got.find(p => p._1 == 0L && p._2 == 1L).get._3
    assert(math.abs(j01 - 5.0 / 11.0) < 1e-12)
    assert(got.find(p => p._1 == 0L && p._2 == 3L).get._3 == 1.0)
  }

  test("ngramJaccardPairs maxDf drops ubiquitous shingles") {
    // with maxDf=1 every shared shingle is dropped -> no pairs
    assert(DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1, maxDf = 1).isEmpty)
  }

  test("minhash signatures agree for identical docs and differ across docs") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
      .orderBy("doc_id").collect()
    assert(sigs.length == 4)
    val row0 = sigs(0).toSeq.drop(1)
    assert(row0 == sigs(3).toSeq.drop(1)) // exact dup -> identical signature
    assert(row0 != sigs(2).toSeq.drop(1)) // unrelated -> different
  }

  test("minhashDedupPairs surfaces the exact dup through LSH + verification") {
    val got = DedupOps.minhashDedupPairs(docs, "doc_id", "text",
      numHashes = 8, bands = 4, minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.contains((0L, 3L)))
    assert(!got.exists(p => p._2 == 2L || p._1 == 2L))
  }

  test("nearDupClusters: transitive closure with min-id labels") {
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val ids = (1L to 9L).toDF("doc_id")
    val got = DedupOps.nearDupClusters(pairs, ids, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // {1,2,5} -> 1 (transitively), {7,8} -> 7, rest singleton
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 1L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("nearDupClusters handles STRING ids: multi-hop chains still merge fully") {
    // string labels are not decimal-castable — the label-sum convergence
    // shortcut would see null sums and stop after ONE propagation round;
    // a 3-hop chain needs two, so full merging proves the join-based
    // change check kicks in for non-numeric id types
    val pairs = Seq(("d", "c"), ("c", "b"), ("b", "a")).toDF("id_a", "id_b")
    val ids = Seq("a", "b", "c", "d", "e").toDF("doc_id")
    val got = DedupOps.nearDupClusters(pairs, ids, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "e"))
  }

  test("nearDupClusters: a chain LONGER than maxRounds still merges fully (pointer jumping)") {
    // diameter-40 path graph under the default maxRounds = 20: plain
    // min-label propagation moves one hop per round and would UNDER-
    // MERGE silently; the r21 pointer-jumping compression reaches
    // diameter ~2^rounds, so the whole chain must collapse to node 0
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ids = (0L to 41L).toDF("doc_id")
    val got = DedupOps.nearDupClusters(pairs, ids, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.take(41).forall(_._2 == 0L), got.mkString(","))
    assert(got(41) == (41L -> 41L)) // off-chain singleton untouched
  }

  test("simhashNearPairs rejects bit widths the long chunk math cannot hold") {
    intercept[IllegalArgumentException] {
      DedupOps.simhashNearPairs(docs, "doc_id", "text", bits = 64, maxHamming = 0)
    }
    intercept[IllegalArgumentException] {
      DedupOps.simhashNearPairs(docs, "doc_id", "text", bits = 3, maxHamming = 3)
    }
  }

  test("dedupByMinhash keeps one canonical doc per near-dup cluster") {
    val kept = DedupOps.dedupByMinhash(docs, "doc_id", "text", minJaccard = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 0 and 3 are exact dups -> cluster {0,3} keeps 0; 1 and 2 survive
    assert(kept.toSeq == Seq(0L, 1L, 2L))
  }

  test("LSH recall vs exact Jaccard on the real corpus (planted near-dups)") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashDedupPairs(corpus, "doc_id", "text",
        numHashes = 16, k = 3, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // the driver plants near-dup documents
    assert(lsh.subsetOf(exact)) // verification step guarantees precision 1.0
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.7, s"LSH recall $recall (${lsh.size}/${exact.size})")
  }

  test("lshCandidatePairs caps hot buckets") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
    val uncapped = DedupOps.lshCandidatePairs(sigs, "doc_id", 4, 2).count()
    val capped = DedupOps.lshCandidatePairs(sigs, "doc_id", 4, 2, maxBucket = 1).count()
    assert(uncapped >= 1 && capped == 0)
  }

  test("simhashNearPairs surfaces exact and near dups, not unrelated docs") {
    val got = DedupOps.simhashNearPairs(docs, "doc_id", "text", bits = 24, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 0L)) // exact dup
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated stays out
  }

  test("simhashNearPairs plans no all-pairs join (banded, scale shape)") {
    val plan = DedupOps.simhashNearPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("banded simhashNearPairs == all-pairs form on the real corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = DedupOps.simhash(corpus, "doc_id", "text", bits = 24)
    val a = sigs.select(col("doc_id").as("id_a"), col("simhash").as("h_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("simhash").as("h_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = DedupOps.simhashNearPairs(corpus, "doc_id", "text", bits = 24, maxHamming = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole: chunk-bucketing is recall-lossless for hamming <= chunks-1
    assert(banded == exact, s"banded=${banded.size} exact=${exact.size}")
  }

  test("simhashNearPairs maxBucket drops hot-chunk candidates") {
    // all four docs agree on at least one chunk; cap 1 removes every bucket
    assert(DedupOps.simhashNearPairs(docs, "doc_id", "text", maxBucket = 1).isEmpty)
  }

  test("contaminationHits flags docs overlapping the benchmark, via broadcast") {
    // benchmark = doc 0; doc 3 is its exact dup (all 8 trigrams hit),
    // doc 1 shares the trigrams not touching the changed word, doc 2 none
    val hits = DedupOps.contaminationHits(
      docs, docs.filter(col("doc_id") === 0), "doc_id", "text", k = 3)
    val got = hits.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 8L), (1L, 5L), (3L, 8L)))
    // eval-set side must broadcast: the corpus is never shuffled for the join
    assert(hits.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("dedupAgainstIndex surfaces new-vs-index dups from stored signatures") {
    // index = docs {0, 2}; new batch = {1, 3}. 3 is an exact dup of 0
    // (identical signature -> est 1.0); 1 is near 0; 2 unrelated.
    val idx = DedupOps.minhashSignatures(
      docs.filter(col("doc_id") === 0 || col("doc_id") === 2), "doc_id", "text", 8)
    val got = DedupOps.dedupAgainstIndex(
      docs.filter(col("doc_id") === 1 || col("doc_id") === 3), idx,
      "doc_id", "text", numHashes = 8, bands = 4, minEstJaccard = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists(p => p._1 == 3L && p._2 == 0L && p._3 == 1.0))
    assert(!got.exists(p => p._2 == 2L)) // unrelated index doc untouched
  }

  test("dedupAgainstIndex recall vs full recompute on the real corpus") {
    // The incremental path verifies candidates at SIGNATURE level
    // (fraction of agreeing minhash components estimates Jaccard — the
    // standing corpus' raw text may be in cold storage), while the full
    // recompute verifies at SHINGLE level. This pins what that loses:
    // every cross-boundary pair the full pipeline finds must also be
    // found incrementally, up to the pinned recall floor.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldDocs = corpus.filter(col("doc_id") < 450)
    val newDocs = corpus.filter(col("doc_id") >= 450)
    val full = DedupOps.minhashDedupPairs(corpus, "doc_id", "text",
        numHashes = 16, k = 3, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1))).toSet
    val crossFull = full.filter(p => (p._1 < 450) != (p._2 < 450))
    val indexSigs = DedupOps.minhashSignatures(oldDocs, "doc_id", "text", 16, k = 3)
    val inc = DedupOps.dedupAgainstIndex(newDocs, indexSigs, "doc_id", "text",
        numHashes = 16, k = 3, bands = 8, minEstJaccard = 0.5)
      .select("id_new", "id_old").collect()
      .map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1))).toSet
    assert(crossFull.nonEmpty) // driver plants near-dups across the split
    val recall = inc.intersect(crossFull).size.toDouble / crossFull.size
    // measured 1.0000 on this corpus across three splits (doc_id<450:
    // 4/4, doc_id<300: 13/13, doc_id%3: 14/14 — hashing is seeded, so
    // the figure is deterministic); 0.95 trips on ANY lost pair while
    // leaving headroom for a deliberate borderline-semantics change
    assert(recall >= 0.95,
      s"incremental recall $recall (${inc.intersect(crossFull).size}/${crossFull.size})")
  }

  test("bloomDecontaminate never misses an exact hit; corpus side is map-only") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval = corpus.filter(col("doc_id") < 10)
    val exact = DedupOps.contaminationHits(corpus, eval, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloomDf = DedupOps.bloomDecontaminate(corpus, eval, "doc_id", "text",
      k = 5, probes = 3, log2m = 16)
    val bloom = bloomDf.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // no false negatives, ever: every exact hit is flagged with at
    // least the exact count (extra hits are bloom false positives)
    for ((id, n) <- exact)
      assert(bloom.getOrElse(id, 0L) >= n, s"doc $id: exact=$n bloom=${bloom.get(id)}")
    // false-positive overhead stays within ~5× the independent-probe
    // model at this load factor: the 3 probes are affine images of ONE
    // ~30-bit gram hash (pos_j = h·A_j + B_j mod P mod m), so they are
    // NOT independent — measured overhead at this fixture is ~4-5× the
    // idealized (1−e^{−kn/m})^k estimate (25 of ~55k corpus gram
    // probes vs ~5 modeled). log2m is the dial when that matters; the
    // op's contract (no false NEGATIVES, ever) is the hard guarantee
    // and is pinned above.
    val extra = bloom.values.sum - exact.values.sum
    assert(extra.toDouble <= 0.05 * exact.values.sum + 10,
      s"fp overhead too high: exact=${exact.values.sum} bloom=${bloom.values.sum}")
    // corpus side plans NO join and NO aggregate — scan, project,
    // filter only (the bitmap build lives in the scalar subquery, which
    // logical collect does not descend into)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val heavy = bloomDf.queryExecution.optimizedPlan.collect {
      case j: Join => j.nodeName
      case a: Aggregate => a.nodeName
    }
    assert(heavy.isEmpty, s"corpus side not map-only: $heavy")
  }

  test("bloomDecontaminate kernel: unrelated text stays clean at honest m") {
    val corpus = Seq((100L, "zz1 zz2 zz3 zz4 zz5 zz6")).toDF("doc_id", "text")
    val eval = Seq((0L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    // k=3 grams share nothing; at m=2^16 with ~18 eval positions the
    // fp chance per gram is ~(18/65536)^3 — zero hits expected
    assert(DedupOps.bloomDecontaminate(corpus, eval, "doc_id", "text",
      k = 3, probes = 3, log2m = 16).isEmpty)
    // sanity: a shared gram IS flagged with the right count
    val hit = DedupOps.bloomDecontaminate(
      Seq((100L, "w1 w2 w3 other words here")).toDF("doc_id", "text"),
      eval, "doc_id", "text", k = 3, probes = 3, log2m = 16).collect()
    assert(hit.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 1L)))
  }

  test("dedupKeepBest keeps the highest-scoring doc per cluster") {
    val corpus = Seq((1L, "x", 5L), (2L, "y", 9L), (3L, "z", 7L))
      .toDF("doc_id", "text", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val kept = DedupOps.dedupKeepBest(corpus, clusters, "doc_id", col("n_chars"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // cluster {1,2}: 2 wins on n_chars; singleton 3 stays
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("incremental and cross-corpus dedup plans contain no all-pairs join") {
    val idx = DedupOps.minhashSignatures(
      docs.filter(col("doc_id") < 2), "doc_id", "text", 8)
    val p1 = DedupOps.dedupAgainstIndex(docs.filter(col("doc_id") >= 2), idx,
        "doc_id", "text", numHashes = 8, bands = 4)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"),
      p1.take(1500))
    val p2 = DedupOps.crossCorpusNearDups(
        docs.filter(col("doc_id") < 2), docs.filter(col("doc_id") >= 2),
        "doc_id", "text", numHashes = 8, bands = 4)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      p2.take(1500))
  }

  test("curation ops are total on empty inputs") {
    val empty = docs.filter(lit(false))
    assert(DedupOps.contaminationHits(docs, empty, "doc_id", "text", 3).isEmpty)
    assert(DedupOps.contaminationHits(empty, docs, "doc_id", "text", 3).isEmpty)
    assert(DedupOps.dedupAgainstIndex(empty,
      DedupOps.minhashSignatures(docs, "doc_id", "text", 8), "doc_id", "text",
      numHashes = 8, bands = 4).isEmpty)
    assert(DedupOps.crossCorpusNearDups(empty, docs, "doc_id", "text",
      numHashes = 8, bands = 4).isEmpty)
    assert(graft.ops.TextOps.repetitionStats(empty, "doc_id", "text").isEmpty)
    assert(graft.ops.TextOps.chunkDocuments(empty, "doc_id", "text", 32).isEmpty)
  }

  test("hybridNearDupPairs merges modalities with provenance") {
    val tp = Seq((0L, 1L), (2L, 3L)).toDF("id_a", "id_b")
    val ep = Seq((2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = DedupOps.hybridNearDupPairs(tp, ep)
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((0L, 1L, "text"), (2L, 3L, "both"), (4L, 5L, "embedding")))
  }

  test("splitByCluster routes whole near-dup clusters to one split") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (5L, 1L))
      .toDF("doc_id", "cluster_id")
    val got = DedupOps.splitByCluster(clusters, valPerMille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of cluster 1 lands on the same side
    val cluster1 = got.filter(_._2 == 1L).map(_._3).toSet
    assert(cluster1.size == 1)
    // 0 and 1000 per-mille are total routes
    assert(DedupOps.splitByCluster(clusters, 0)
      .filter(col("split") === "val").isEmpty)
    assert(DedupOps.splitByCluster(clusters, 1000)
      .filter(col("split") === "train").isEmpty)
  }

  test("crossCorpusNearDups keeps only pairs straddling the two corpora") {
    // corpus A = {0, 2}; corpus B = {1, 3}. Near/exact relations: 0~1,
    // 0~3 (exact dup), 1~3. Within-corpus pair (none among dups) and the
    // unrelated doc 2 must not appear.
    val a = docs.filter(col("doc_id") === 0 || col("doc_id") === 2)
    val b = docs.filter(col("doc_id") === 1 || col("doc_id") === 3)
    val got = DedupOps.crossCorpusNearDups(a, b, "doc_id", "text",
        numHashes = 8, bands = 4, minJaccard = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 3L))) // exact dup across corpora
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated absent
    // 1 and 3 are both corpus B: the within-B near-dup pair is filtered out
    assert(!got.contains((1L, 3L)))
  }

  test("reliable + parquet materializers reproduce the local results on the real corpus") {
    import graft.ops.Materializer
    val root = "/tmp/graft_mat_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairsWith(m: Materializer) =
      DedupOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, minJaccard = 0.5, mat = m)
        .orderBy("id_a", "id_b").collect().map(_.toString).toSeq
    val local = pairsWith(Materializer.Local)
    assert(pairsWith(Materializer.Reliable(Some(s"$root/ckpt"))) == local)
    assert(pairsWith(Materializer.Parquet(s"$root/pq")) == local)
    assert(pairsWith(Materializer.Inline) == local)
    assert(pairsWith(Materializer.LocalLazy) == local)
    // reliable checkpoint files actually landed in the durable dir
    assert(new java.io.File(s"$root/ckpt").exists())

    // iterative CC under the reliable strategy (per-round truncation)
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val ids = (1L to 9L).toDF("doc_id")
    val got = DedupOps.nearDupClusters(pairs, ids, "doc_id",
        mat = Materializer.Reliable(Some(s"$root/ckpt")))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L,
      5L -> 1L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))

    // Parquet strategy: CC's loop releases superseded rounds, so after
    // the final frame is consumed at most the final labels dir remains —
    // round-3 leaked one labels copy per round for the driver's lifetime
    val pqDir = s"$root/pq_cc"
    val pq = Materializer.Parquet(pqDir)
    val got2 = DedupOps.nearDupClusters(pairs, ids, "doc_id", mat = pq)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.toSeq == got.toSeq)
    val remaining = new java.io.File(pqDir).listFiles()
    assert(remaining != null && remaining.length <= 1,
      s"released dirs must be deleted, found: ${remaining.toSeq.mkString(", ")}")
  }

  test("one-pass minhash kernel == composed explode/aggregate form; map-only plan") {
    import spark.implicits._
    val edge = Seq((0L, ""), (1L, "a b"), (2L, "a b c"), (3L, "a b c d a b c"),
      (4L, "x  y z w")).toDF("doc_id", "text") // 0,1 shorter than k=3 -> dropped
    for (df <- Seq(edge, spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = DedupOps.minhashSignatures(df, "doc_id", "text", 16, k = 3)
        .collect().map(_.toString).sorted.toSeq
      val slow = DedupOps.minhashSignaturesComposed(df, "doc_id", "text", 16, 3)
        .collect().map(_.toString).sorted.toSeq
      assert(fast == slow && fast.nonEmpty)
    }
    val plan = DedupOps.minhashSignatures(edge, "doc_id", "text", 16, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
    assert(!plan.contains("HashAggregate"), plan.take(1500))
  }

  test("prefix-filtered ngram pairs == full postings self-join (recall-lossless)") {
    import graft.ops.Materializer
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((t, cut) <- Seq((0.5, 1000), (0.3, 1000), (0.8, 20))) {
      val full = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
          k = 3, minJaccard = t, maxDf = cut)
        .collect().map(_.toString).sorted.toSeq
      val prefix = DedupOps.ngramJaccardPairsPrefix(corpus, "doc_id", "text",
          k = 3, minJaccard = t, maxDf = cut)
        .collect().map(_.toString).sorted.toSeq
      assert(prefix == full, s"t=$t maxDf=$cut")
      if (t == 0.5) assert(prefix.nonEmpty)
      // the prefix form's non-broadcast fallback cut agrees too
      val fb = DedupOps.ngramJaccardPairsPrefix(corpus, "doc_id", "text",
          k = 3, minJaccard = t, maxDf = cut, mat = Materializer.Inline,
          broadcastHotSet = false)
        .collect().map(_.toString).sorted.toSeq
      assert(fb == full, s"fallback t=$t maxDf=$cut")
    }
  }

  test("array-based candidate verify == postings-based verify") {
    import spark.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = DedupOps.minhashSignatures(corpus, "doc_id", "text", 16, k = 3)
    val cands = DedupOps.lshCandidatePairs(sigs, "doc_id", bands = 8, rowsPerBand = 2)
    val sh = DedupOps.shingleHashes(corpus, "doc_id", "text", 3)
    val viaPostings = DedupOps.verifyPairsJaccard(sh, cands.select("id_a", "id_b"))
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
      .collect().map(_.toString).sorted.toSeq
    val viaArrays = DedupOps.verifyPairsJaccardArrays(
        corpus, "doc_id", "text", 3, cands.select("id_a", "id_b"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaArrays == viaPostings && viaArrays.nonEmpty)
  }

  test("one-pass simhash kernel == composed explode/aggregate form") {
    import spark.implicits._
    // edge cases the tokenizer must mirror from split(text, " "):
    // empty text, leading/trailing/double spaces (empty tokens kept),
    // multi-codepoint chars; plus the real corpus for breadth
    val edge = Seq((0L, ""), (1L, " "), (2L, "a "), (3L, " a"), (4L, "a  b"),
      (5L, "héllo wörld"), (6L, "a"), (7L, "𝕊 unicode 𝕋")).toDF("doc_id", "text")
    for (df <- Seq(edge, spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = DedupOps.simhash(df, "doc_id", "text", bits = 24)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val slow = DedupOps.simhashComposed(df, "doc_id", "text", bits = 24)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(fast == slow)
    }
    // and the kernel path is map-only: no exchange at all
    val plan = DedupOps.simhash(edge, "doc_id", "text", 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("simhash of identical docs matches; hamming-near for near dups") {
    val got = DedupOps.simhash(docs, "doc_id", "text", bits = 24)
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(got(0) == got(3))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(0), got(1)) < ham(got(0), got(2)))
  }

  test("cap telemetry: a binding bucket cap is REPORTED, never silent") {
    import graft.ops.CapTelemetry
    // listener delivery is asynchronous — poll for the op's stats
    def awaitStats(op: String): CapTelemetry.CapStats = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var st = CapTelemetry.lastStats(op)
      while (st.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50); st = CapTelemetry.lastStats(op)
      }
      st.getOrElse(fail(s"no cap stats reported for $op"))
    }
    // 40 identical signatures: every pigeonhole chunk bucket holds all
    // 40 rows; cap at 10 -> every bucket drops, recall goes to ZERO —
    // exactly the silent-loss shape the r6 stress measured (76% pair
    // loss with nothing to show for it). Now it must be reported.
    CapTelemetry.clear()
    val sigs = Seq.tabulate(40)(i => (i.toLong, 0x0F0FL)).toDF("doc_id", "phash")
    val capped = DedupOps.hammingNearPairs(sigs, "doc_id", "phash",
      bits = 48, maxHamming = 3, maxBucket = 10)
    assert(capped.count() == 0, "fixture: the cap must fully bind")
    val st = awaitStats("hamming_near_pairs")
    assert(st.droppedBuckets == 4 && st.droppedRows == 160 &&
      st.totalBuckets == 4, s"wrong report: $st")
    // the declared brute-force baseline quantifies what was sacrificed
    assert(DedupOps.hammingAllPairs(sigs, "doc_id", "phash").count() == 40L * 39 / 2)
    // a non-binding cap reports zero dropped (and loses nothing)
    CapTelemetry.clear()
    val free = DedupOps.hammingNearPairs(sigs, "doc_id", "phash",
      bits = 48, maxHamming = 3, maxBucket = 1000)
    assert(free.count() == 40L * 39 / 2)
    val st2 = awaitStats("hamming_near_pairs")
    assert(st2.droppedBuckets == 0 && st2.droppedRows == 0)
    // the LSH band family reports through the same channel: 30 exact
    // copies of one text -> every band bucket holds all 30 signatures
    CapTelemetry.clear()
    val copies = Seq.tabulate(30)(i =>
      (i.toLong, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val lsh = DedupOps.lshCandidatePairs(
      DedupOps.minhashSignatures(copies, "doc_id", "text", 16, 3),
      "doc_id", bands = 8, rowsPerBand = 2, maxBucket = 10)
    assert(lsh.count() == 0)
    val st3 = awaitStats("lsh_candidate_pairs")
    assert(st3.droppedBuckets == 8 && st3.droppedRows == 240, s"$st3")
  }

  // ------------------------------------------------------------------
  // span-level decontamination
  // ------------------------------------------------------------------

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "clean_text", "n_spans", "n_removed")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("decontaminateSpans cuts hit windows, merges spans, passes clean docs byte-identical") {
    val corpus = Seq(
      (10L, "x1 x2 BAD1 BAD2 BAD3 x3 x4 x5 x6 x7"), // one window at pos 2
      (11L, "y1 y2 y3 y4 y5"),                      // untouched
      (12L, "BAD1 BAD2 BAD3 z1 BAD1 BAD2 BAD3"))    // two disjoint spans
      .toDF("doc_id", "text")
    val bench = Seq((0L, "BAD1 BAD2 BAD3")).toDF("doc_id", "text")
    val got = spanRows(
      DedupOps.decontaminateSpans(corpus, bench, "doc_id", "text", k = 3))
    assert(got == Seq(
      (10L, "x1 x2 x3 x4 x5 x6 x7", 1L, 3L),
      (11L, "y1 y2 y3 y4 y5", 0L, 0L),
      (12L, "z1", 2L, 6L)))
  }

  test("decontaminateSpans merges overlapping windows into one span; full hit empties the doc") {
    val corpus = Seq((1L, "BAD1 BAD2 BAD3 BAD4")).toDF("doc_id", "text")
    val bench = Seq((0L, "BAD1 BAD2 BAD3 qq BAD2 BAD3 BAD4"))
      .toDF("doc_id", "text")
    // both 3-gram windows of the corpus doc hit; [0,3) ∪ [1,4) merge
    val got = spanRows(
      DedupOps.decontaminateSpans(corpus, bench, "doc_id", "text", k = 3))
    assert(got == Seq((1L, "", 1L, 4L)))
  }

  test("decontaminateSpans: eval side broadcasts; corpus never shuffled for the probe") {
    val out = DedupOps.decontaminateSpans(
      docs, docs.filter(col("doc_id") === 0), "doc_id", "text", k = 3)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("decontaminateSpansWithGrams == decontaminateSpans bit-for-bit on the corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = corpus.filter(col("doc_id") < 10)
    val joined = spanRows(DedupOps.decontaminateSpans(
      corpus, bench, "doc_id", "text", k = 5))
    val grams = DedupOps.contaminationGramSet(bench, "doc_id", "text", k = 5)
    val mapped = spanRows(DedupOps.decontaminateSpansWithGrams(
      corpus, grams, "doc_id", "text", k = 5))
    assert(mapped == joined)
    // the corpus-contaminated fixture docs really got scrubbed
    assert(mapped.count(_._4 > 0) >= 10)
  }

  test("decontaminateSpansWithGrams plans pure map: no join, no exchange") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = DedupOps.decontaminateSpansWithGrams(corpus,
      Array(12345L, 678L), "doc_id", "text", k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("contaminationGramSet refuses an eval set over the driver bound") {
    val e = intercept[IllegalArgumentException] {
      DedupOps.contaminationGramSet(docs, "doc_id", "text", k = 3,
        maxGrams = 2L)
    }
    assert(e.getMessage.contains("driver-safe bound"))
  }

  // ------------------------------------------------------------------
  // eval-side coverage report
  // ------------------------------------------------------------------

  test("benchmarkCoverage reports per-item gram coverage incl. too-short items") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "a b c d"),  // abc, bcd -> both in corpus
      (101L, "a b c q"),  // abc yes, bcq no
      (102L, "q r"),      // too short for k=3
      (103L, "m n o p"))  // none
      .toDF("doc_id", "text")
    val got = DedupOps.benchmarkCoverage(corpus, bench, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((100L, 2L, 2L, 1.0), (101L, 2L, 1L, 0.5),
      (102L, 0L, 0L, 0.0), (103L, 2L, 0L, 0.0)))
  }

  test("benchmarkCoverage counts distinct grams once regardless of corpus multiplicity") {
    // the covered gram appears twice in the corpus AND twice in the item
    val corpus = Seq((1L, "a b c x a b c")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c y a b c")).toDF("doc_id", "text")
    val r = DedupOps.benchmarkCoverage(corpus, bench, "doc_id", "text", k = 3)
      .collect()(0)
    // item grams: abc, bcy, cya, yab, abc(dup) -> 4 distinct, 1 covered
    assert((r.getLong(1), r.getLong(2)) == (4L, 1L))
  }

  // ------------------------------------------------------------------
  // soft dedup
  // ------------------------------------------------------------------

  test("softDedupWeights prices every member at floor(1e6 / cluster size)") {
    val clusters = Seq((0L, 0L), (1L, 0L), (3L, 0L), (2L, 2L))
      .toDF("doc_id", "cluster_id")
    val got = DedupOps.softDedupWeights(clusters, "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 0L, 3L, 333333L), (1L, 0L, 3L, 333333L),
      (2L, 2L, 1L, 1000000L), (3L, 0L, 3L, 333333L)))
  }

  test("softDedupSample keeps singletons always, is deterministic and partition-independent") {
    val clusters = DedupOps.nearDupClusters(
      DedupOps.minhashDedupPairs(docs, "doc_id", "text",
        numHashes = 16, k = 3, bands = 8, minJaccard = 0.5),
      docs.select(col("doc_id")), "doc_id")
    val s1 = DedupOps.softDedupSample(docs, clusters, "doc_id", col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 2 is a singleton cluster: weight 1e6 -> always kept
    assert(s1.contains(2L))
    val s2 = DedupOps.softDedupSample(docs.repartition(7), clusters,
      "doc_id", col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
  }

  test("softDedup expected mass: weights sum to ~1e6 per cluster") {
    val clusters = Seq((0L, 0L), (1L, 0L), (3L, 0L), (2L, 2L))
      .toDF("doc_id", "cluster_id")
    val sums = DedupOps.softDedupWeights(clusters, "doc_id")
      .groupBy("cluster_id").agg(sum("weight_ppm").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // floor rounding loses < cluster_size ppm
    assert(sums(0L) == 999999L && sums(2L) == 1000000L)
  }
}
