package graft

import org.apache.spark.sql.functions._

import graft.ops.{IndexOps, SkewOps}

/** Skew-helper specs plus property tests for the merge algebra
  * (SURVEY.md §5: updateOrAppend/alignIdCol laws). Cases are generated
  * from a fixed seed (the scalatest-scalacheck bridge isn't in the
  * offline cache, so generation is hand-rolled but equally exhaustive
  * for this small domain).
  */
class SkewAndPropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases(seed: Long, n: Int): Seq[List[(Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val size = rnd.nextInt(12)
      List.fill(size)(rnd.nextLong(16L)).distinct.map(i => (i, i * 10))
    }
  }

  test("saltedJoin equals the plain join, spread over salt buckets") {
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "lv")
    val right = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv")
      .collect().map(_.toSeq).toSeq
    val salted = SkewOps.saltedJoin(left, right, "k", saltFactor = 4)
      .orderBy("k", "lv").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedAgg equals the plain aggregate") {
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val salted = SkewOps.saltedAgg(df, "k", sum(col("v")), "s",
        c => sum(col(c)), saltFactor = 8)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }

  test("keySkewProfile surfaces the hot key first") {
    val df = (Seq.fill(90)(1L) ++ Seq.fill(10)(2L)).toDF("k")
    val top = SkewOps.keySkewProfile(df, "k", topN = 1).head()
    assert(top.getLong(0) == 1L && top.getLong(1) == 90L)
    assert(math.abs(top.getDouble(2) - 0.9) < 1e-12)
  }

  test("property: alignIdCol is idempotent and establishes the invariant") {
    for (rows <- cases(seed = 1, n = 15) if rows.nonEmpty) {
      val df = rows.toDF("id", "v")
      val once = IndexOps.alignIdCol(df)
      val twice = IndexOps.alignIdCol(once)
      assert(twice.orderBy("id").collect().toSeq == once.orderBy("id").collect().toSeq,
        s"case: $rows")
      IndexOps.validateId(once)
    }
  }

  test("property: updateOrAppend with an empty delta changes nothing") {
    for (rows <- cases(seed = 2, n = 10) if rows.nonEmpty) {
      val df = rows.toDF("id", "v")
      val got = IndexOps.updateOrAppend(df, df.filter(lit(false)))
      assert(got.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq,
        s"case: $rows")
    }
  }

  test("property: updateOrAppend is idempotent in the delta") {
    for ((a, b) <- cases(seed = 3, n = 10).zip(cases(seed = 4, n = 10))
         if a.nonEmpty && b.nonEmpty) {
      val once = IndexOps.updateOrAppend(a.toDF("id", "v"), b.toDF("id", "v"))
      val twice = IndexOps.updateOrAppend(once, b.toDF("id", "v"))
      assert(twice.orderBy("id").collect().toSeq == once.orderBy("id").collect().toSeq,
        s"case: $a / $b")
    }
  }

  test("property: chunkDocuments reconstructs random token streams") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 12) {
      val n = 1 + rnd.nextInt(40)
      val text = (0 until n).map(i => s"t${rnd.nextInt(9)}x$i").mkString(" ")
      val chunk = 2 + rnd.nextInt(8)
      val overlap = rnd.nextInt(chunk)
      val parts = graft.ops.TextOps.chunkDocuments(
          Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text", chunk, overlap)
        .orderBy("chunk_idx").collect().map(_.getString(2)).toSeq
      val rebuilt = parts.head.split(" ").toSeq ++
        parts.tail.flatMap(p => p.split(" ").drop(overlap).toSeq)
      assert(rebuilt == text.split(" ").toSeq,
        s"n=$n chunk=$chunk overlap=$overlap")
    }
  }

  test("property: lossless BPE round-trips random unicode byte-for-byte; legacy relation holds") {
    // random documents over a hostile alphabet: space runs, tabs,
    // newlines, merge-rule letters, digits, punctuation, Cyrillic,
    // CJK, and astral codepoints — plus random leading/trailing runs
    val rnd = new scala.util.Random(13)
    val alphabet: IndexedSeq[String] = IndexedSeq(
      " ", " ", " ", "\t", "\n", "t", "h", "e", "a", "n", "o", "r",
      "0", "7", ".", ",", "(", "д", "ж", "好", "の", "😀",
      "🤖", "x", "q")
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(80)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val enc = graft.ops.TextOps.encodeBpe(df, "doc_id", "text",
      graft.ops.TextOps.DefaultBpeMerges, lossless = true)
    val decoded = graft.ops.TextOps.decodeBpe(enc, "doc_id", "token_ids")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      assert(decoded(id) == text,
        s"doc $id round-trip mismatch for ${text.take(40).map(_.toInt)}")
    }
    // the lossless stream minus spaces IS the legacy stream, and token
    // counts obey n_lossless = n_legacy + n_spaces, for every document
    val legacy = graft.ops.TextOps.encodeBpe(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    enc.collect().foreach { r =>
      val ids = r.getSeq[Long](1)
      val spaces = docs(r.getLong(0).toInt)._2.count(_ == ' ')
      assert(ids.filter(_ != 32L) == legacy(r.getLong(0)))
      assert(ids.length == legacy(r.getLong(0)).length + spaces)
    }
  }

  test("property: packBins never loses or duplicates items at any capacity") {
    val rnd = new scala.util.Random(8)
    for (_ <- 0 until 8) {
      val rows = (0 until 1 + rnd.nextInt(60)).map(i => (i.toLong, 1L + rnd.nextInt(50)))
      val capacity = 1 + rnd.nextInt(128)
      val got = graft.ops.SampleOps.packBins(
          rows.toDF("id", "n_tokens"), col("id"), "n_tokens", capacity, buckets = 4)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == rows.map(_._1).sorted.toSeq, s"capacity=$capacity")
    }
  }

  test("property: hashSample partitions the corpus exactly across residue bands") {
    // disjoint residue bands [0,300) and [300,1000) cover every row once:
    // |sample(300)| + |band(300..1000)| == total, with no overlap
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lo = graft.ops.SampleOps.hashSample(docs, col("doc_id"), 300, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.ops.SampleOps.hashSample(docs, col("doc_id"), 1000, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = all -- lo
    assert(lo.intersect(hi).isEmpty && (lo.size + hi.size) == docs.count())
  }

  test("property: TopKPairsBuffer insert/merge/serde equal a sort reference") {
    import graft.functions.{TopKByOrdPairs, TopKPairsBuffer}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(11L)
    // ord pool stresses the edge ordering: NaN (ranks FIRST), signed
    // zeros (equal), and tie-heavy plain values (break by value asc)
    val ordPool = Array(Double.NaN, -0.0, 0.0, 1.5, 1.5, -2.25, 3.0, 0.5)
    def refTopK(pairs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
      pairs.sortWith { case ((o1, v1), (o2, v2)) =>
        // independent reference order: +0.0 normalizes -0.0; NaN sorts
        // greatest under Double.compare — rank = ord desc, value asc
        val c = java.lang.Double.compare(o2 + 0.0, o1 + 0.0)
        if (c != 0) c < 0 else v1 < v2
      }.take(k)
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(5)
      val pairs = Seq.fill(rnd.nextInt(30))(
        (ordPool(rnd.nextInt(ordPool.length)), rnd.nextLong(10L)))
      // split into random partial buffers, round-trip each through the
      // aggregate's serializer, then merge — the distributed life cycle
      val agg = TopKByOrdPairs(Literal(0.0), Literal(0L), k)
      val parts = pairs.grouped(math.max(1, 1 + rnd.nextInt(7))).map { chunk =>
        val b = new TopKPairsBuffer(k)
        chunk.foreach { case (o, v) => b.insert(o, v) }
        agg.deserialize(agg.serialize(b))
      }
      val merged = parts.foldLeft(new TopKPairsBuffer(k))(agg.merge)
      val got = (0 until merged.n).map(i => (merged.ords(i), merged.vals(i)))
      val want = refTopK(pairs, k)
      // compare on canonical bits: doubleToLongBits canonicalizes NaN,
      // +0.0 normalizes -0.0 — both sides are stable orders, so the
      // surviving representatives must match exactly
      def key(p: (Double, Long)) =
        (java.lang.Double.doubleToLongBits(p._1 + 0.0), p._2)
      assert(got.map(key) == want.map(key), s"pairs=$pairs k=$k got=$got want=$want")
    }
  }

  test("property: asofJoin equals the brute-force nearest-match on random streams") {
    val rnd = new scala.util.Random(7)
    for (c <- 0 until 8) {
      // small ts domain FORCES equal-instant ties; a few keys force
      // both matched and unmatched partitions
      val left = (0 until 20).map(i =>
        (i.toLong, rnd.nextLong(3), rnd.nextLong(8)))
      val right = (0 until 15).map(i =>
        (rnd.nextLong(4), rnd.nextLong(8), i.toLong, rnd.nextLong(100)))
      val ldf = left.toDF("event_id", "k", "ts")
      val rdf = right.toDF("k", "ts", "ord", "v")
      for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(2L))) {
        val got = graft.ops.EventOps.asofJoin(ldf, rdf, "k", "ts", Seq("v"),
            "ord", dir, tol)
          .collect().map(r => r.getLong(0) ->
            Option(r.getAs[java.lang.Long]("v")).map(_.toLong)).toMap
        val want = left.map { case (id, k, ts) =>
          val m = right
            .filter(r => r._1 == k &&
              (if (dir == "backward") r._2 <= ts else r._2 >= ts) &&
              tol.forall(t => (r._2 - ts).abs <= t))
          val pick = // nearest ts; tie -> max ord backward, min ord forward
            if (dir == "backward") m.sortBy(r => (r._2, r._3)).lastOption
            else m.sortBy(r => (-r._2, -r._3)).lastOption
          id -> pick.map(_._4)
        }.toMap
        assert(got == want, s"case $c dir=$dir tol=$tol\nleft=$left\nright=$right")
      }
    }
  }

  test("property: chunkDedup equals a reference keep-first on random corpora") {
    val rnd = new scala.util.Random(11)
    for (c <- 0 until 6) {
      // tiny vocabulary + short chunks force cross-doc chunk repeats
      val docs = (0 until 12).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(9))(s"w${rnd.nextInt(3)}")
        (i.toLong, words.mkString(" "))
      }
      val w = 2
      val got = graft.ops.DedupOps.chunkDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens = w)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // reference: chunk all docs, keep globally-first occurrences in
      // (doc_id, chunk_idx) order, reassemble
      val chunks = docs.flatMap { case (id, text) =>
        text.split(" ", -1).grouped(w).zipWithIndex
          .map { case (ws, idx) => (id, idx.toLong, ws.mkString(" ")) }
      }
      val firsts = chunks.groupBy(_._3).map { case (_, occ) =>
        occ.minBy(o => (o._1, o._2))
      }.toSet
      val want = chunks.filter(firsts.contains)
        .groupBy(_._1)
        .map { case (id, ch) =>
          id -> ch.sortBy(_._2).map(_._3).mkString(" ") }
      assert(got == want, s"case $c docs=$docs")
    }
  }

  test("property: duplicatedPassages equals brute force on random corpora at any partitioning") {
    val rnd = new scala.util.Random(23)
    for ((parts, c) <- Seq(1, 3, 7).zipWithIndex) {
      // tiny vocabulary + short windows force cross-doc repeats
      val docs = (0 until 14).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(10))(s"w${rnd.nextInt(4)}")
        (i.toLong, words.mkString(" "))
      }
      val win = 2
      val minDocs = 2
      val got = graft.ops.DedupOps.duplicatedPassages(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", winTokens = win, minDocs = minDocs)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // reference: every window of every doc, grouped by passage text
      val windows = docs.flatMap { case (id, text) =>
        val ws = text.split(" ", -1)
        (0 to ws.length - win).map(i => (id, ws.slice(i, i + win).mkString(" ")))
      }
      val want = windows.groupBy(_._2).collect {
        case (p, occ) if occ.map(_._1).distinct.size >= minDocs =>
          (p, occ.map(_._1).distinct.size.toLong, occ.size.toLong, occ.map(_._1).min)
      }.toSet
      assert(got == want, s"case $c parts=$parts docs=$docs")
    }
  }

  test("property: ngramContainmentPairs equals brute-force containment on random corpora") {
    val rnd = new scala.util.Random(41)
    for (c <- 0 until 4) {
      val docs = (0 until 10).map { i =>
        val words = Seq.fill(3 + rnd.nextInt(10))(s"w${rnd.nextInt(4)}")
        (i.toLong, words.mkString(" "))
      }
      val k = 2
      val minC = 0.5
      val got = graft.ops.DedupOps.ngramContainmentPairs(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          k = k, minContainment = minC, maxDf = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
      val sets = docs.map { case (id, text) =>
        val ws = text.split(" ", -1)
        id -> (0 to ws.length - k).map(i => ws.slice(i, i + k).mkString(" ")).toSet
      }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a != b && sa.nonEmpty
        inter = (sa intersect sb).size
        cont = inter.toDouble / sa.size
        if cont >= minC && inter > 0
      } yield (a, b, cont)).toSet
      assert(got == want, s"case $c docs=$docs")
    }
  }

  test("property: bloomDecontaminate ⊇ exact contamination on random corpora") {
    // The bloom op's contract is one-sided: NEVER a false negative, for
    // any corpus, gram size, probe count, or bitmap size — exercised
    // over random word soups whose tiny vocabulary forces real overlap.
    val rnd = new scala.util.Random(23)
    for (c <- 0 until 5) {
      val mkDoc = () => Seq.fill(3 + rnd.nextInt(10))(s"w${rnd.nextInt(8)}").mkString(" ")
      val corpus = (0 until 20).map(i => (i.toLong, mkDoc())).toDF("doc_id", "text")
      val eval = (100 until 103).map(i => (i.toLong, mkDoc())).toDF("doc_id", "text")
      val k = 2 + rnd.nextInt(2)
      val probes = 1 + rnd.nextInt(4)
      val log2m = 10 + rnd.nextInt(7)
      val exact = graft.ops.DedupOps.contaminationHits(corpus, eval, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val bloom = graft.ops.DedupOps.bloomDecontaminate(corpus, eval, "doc_id", "text",
          k, probes, log2m)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      for ((id, n) <- exact)
        assert(bloom.getOrElse(id, 0L) >= n,
          s"case $c (k=$k probes=$probes log2m=$log2m): doc $id exact=$n bloom=${bloom.get(id)}")
    }
  }

  test("property: collocations equals brute force on random corpora") {
    val rnd = new scala.util.Random(31)
    for (c <- 0 until 5) {
      val docs = (0 until 15).map { i =>
        (i.toLong, Seq.fill(2 + rnd.nextInt(12))(s"w${rnd.nextInt(6)}").mkString(" "))
      }
      val minCount = 1 + rnd.nextInt(3)
      val got = graft.ops.TextOps.collocations(
          docs.toDF("doc_id", "text"), "text", minCount, topN = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      // brute force: same counts, same single-division lift
      val toks = docs.flatMap(_._2.split(" ", -1))
      val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      val bi = docs.flatMap { case (_, t) =>
        val ws = t.split(" ", -1); ws.zip(ws.drop(1))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = bi.toSeq.collect { case ((x, y), cxy) if cxy >= minCount =>
        (s"$x $y", cxy, uni(x), uni(y), (n * cxy).toDouble / (uni(x) * uni(y)).toDouble)
      }.sortBy { case (bg, _, _, _, lift) => (-lift, bg) }
      assert(got == expect, s"case $c minCount=$minCount")
    }
  }

  test("property: delta rows always win; other rows survive") {
    for ((a, b) <- cases(seed = 5, n = 10).zip(cases(seed = 6, n = 10))
         if a.nonEmpty) {
      val delta = b.map { case (i, _) => (i, -1L) }.toDF("id", "v")
      val got = IndexOps.updateOrAppend(a.toDF("id", "v"), delta).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      b.foreach { case (i, _) => assert(got(i) == -1L, s"case: $a / $b") }
      a.filterNot(r => b.exists(_._1 == r._1)).foreach { case (i, v) =>
        assert(got(i) == v, s"case: $a / $b")
      }
    }
  }
}
