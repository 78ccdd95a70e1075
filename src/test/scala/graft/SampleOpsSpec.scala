package graft

import org.apache.spark.sql.functions._

import graft.ops.{ProfileOps, SampleOps, TextOps}

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is a pure function of the row: stable across partitionings") {
    val a = SampleOps.hashSample(corpus, col("doc_id"), 100, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = SampleOps.hashSample(corpus.repartition(17, col("lang")), col("doc_id"), 100, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // rate lands in a sane band around 10% (hash uniformity, not exactness)
    assert(a.size > 20 && a.size < 200, s"sampled ${a.size} of ${corpus.count()}")
    // every kept row satisfies the residue predicate
    val check = corpus.filter(col("doc_id").isInCollection(a))
      .select(pmod(TextOps.charHash(col("doc_id").cast("string")), lit(1000L)))
      .collect().map(_.getLong(0))
    assert(check.forall(_ < 100))
  }

  test("hashSample boundary rates keep none / all") {
    assert(SampleOps.hashSample(corpus, col("doc_id"), 0, 1000).isEmpty)
    assert(SampleOps.hashSample(corpus, col("doc_id"), 1000, 1000).count() == corpus.count())
  }

  test("numericProfile: exact discrete quantiles from the value histogram") {
    val df = Seq(Some(1.0), Some(2.0), Some(2.0), Some(3.0), Some(100.0), None)
      .toDF("x")
    val r = ProfileOps.numericProfile(df, "x").head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_null") == 1L)
    assert(r.getAs[Double]("min_v") == 1.0 && r.getAs[Double]("max_v") == 100.0)
    assert(r.getAs[Long]("sum_cents") == 10800L)
    // n=5 non-null: median = 3rd smallest = 2; p90 = ceil(4.5)=5th = 100
    assert(r.getAs[Double]("median") == 2.0)
    assert(r.getAs[Double]("p90") == 100.0)
  }

  test("numericProfileByGroup equals the global profile applied per group") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val perGroup = ProfileOps.numericProfileByGroup(docs, "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(perGroup.keySet == langs.toSet && langs.nonEmpty)
    langs.foreach { lang =>
      val whole = ProfileOps.numericProfile(
        docs.filter(col("lang") === lang), "n_chars").head().toSeq
      assert(perGroup(lang) == whole, s"group $lang")
    }
    // all-null group: base stats present, quantiles null
    import spark.implicits._
    val withNullGroup = Seq(("g1", Some(5L)), ("g2", None), ("g2", None))
      .toDF("g", "v")
    val r = ProfileOps.numericProfileByGroup(withNullGroup, "g", "v")
      .filter(col("g") === "g2").head()
    assert(r.getAs[Long]("n_rows") == 2L && r.getAs[Long]("n_null") == 2L)
    assert(r.isNullAt(r.fieldIndex("median")) && r.isNullAt(r.fieldIndex("p90")))
    // NULL group KEY with real values: groupBy keeps it as a group, and
    // the null-safe join must attach its quantiles (plain equality
    // would silently null them)
    val nullKey = Seq((Option.empty[String], 5L), (None, 7L), (Some("g1"), 9L))
      .toDF("g", "v")
    val nk = ProfileOps.numericProfileByGroup(nullKey, "g", "v")
      .filter(col("g").isNull).head()
    assert(nk.getAs[Long]("n_rows") == 2L)
    assert(nk.getAs[Long]("median") == 5L && nk.getAs[Long]("p90") == 7L)
    // every window in the plan is partitioned by the group key
    val plan = ProfileOps.numericProfileByGroup(docs, "lang", "n_chars")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(val"))
  }

  test("profileFromParts reconstructs the direct profile from slice parts") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val direct = ProfileOps.numericProfile(li, "l_quantity").head().toSeq
    // three disjoint slices + an EMPTY slice + an all-null-value slice:
    // the fold must absorb both degenerate publishers
    val empty = li.filter(lit(false))
    val allNull = Seq(Tuple1(Option.empty[Double])).toDF("l_quantity")
    val slices = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2),
      empty).map(ProfileOps.profileParts(_, "l_quantity"))
    val nullParts = ProfileOps.profileParts(
      allNull.select(col("l_quantity").cast("double")), "l_quantity")
    val rebuilt = ProfileOps.profileFromParts(
      (slices.map(_._1) :+ nullParts._1).reduce(_ unionByName _),
      (slices.map(_._2) :+ nullParts._2).reduce(_ unionByName _)).head().toSeq
    // the extra all-null row shifts n_rows/n_null by one; the rest is equal
    assert(rebuilt(0) == direct(0).asInstanceOf[Long] + 1)
    assert(rebuilt(1) == direct(1).asInstanceOf[Long] + 1)
    assert(rebuilt.drop(2) == direct.drop(2))
    // without the degenerate slices: exact equality
    val exact = ProfileOps.profileFromParts(
      slices.map(_._1).reduce(_ unionByName _),
      slices.map(_._2).reduce(_ unionByName _)).head().toSeq
    assert(exact == direct)
  }

  test("quantileSketchParts: bounded size, conserved weight, pinned rank error, merge + fold + parquet round-trip") {
    import spark.implicits._
    // a NEAR-UNIQUE continuous column — the case the exact value
    // histogram cannot profile incrementally (10 000 distinct doubles)
    val n = 10000
    val values = (0 until n).map(i => ((i * 7919) % n) + 0.25) // shuffled, unique
    val df = values.toDF("x").repartition(8)
    val k = 256
    val parts = ProfileOps.quantileSketchParts(df, "x", k).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    // KB-sized: ≤ k·⌈log2(n/k)⌉ + slack, never corpus-sized
    val maxLevels = (math.log(n.toDouble / k) / math.log(2)).ceil.toInt + 2
    assert(parts.length <= k * maxLevels,
      s"sketch has ${parts.length} rows; bound ${k * maxLevels}")
    // total weight is conserved exactly: sum of 2^level == N
    assert(parts.map { case (lvl, _) => 1L << lvl }.sum == n.toLong)
    // rank error of median/p90 estimates ≤ 3% of N (stated bound)
    val sorted = values.sorted
    def rankErr(est: Double, target: Int): Int = {
      val lo = sorted.count(_ < est)
      val hi = sorted.count(_ <= est)
      if (target < lo) lo - target else if (target > hi) target - hi else 0
    }
    val partsDf = ProfileOps.quantileSketchParts(df, "x", k)
    val est = ProfileOps.quantilesFromSketchParts(partsDf).head()
    assert(rankErr(est.getDouble(0), (n + 1) / 2) <= n * 3 / 100,
      s"median est ${est.getDouble(0)} off by ${rankErr(est.getDouble(0), (n + 1) / 2)}")
    assert(rankErr(est.getDouble(1), (9 * n + 9) / 10) <= n * 3 / 100,
      s"p90 est ${est.getDouble(1)} off by ${rankErr(est.getDouble(1), (9 * n + 9) / 10)}")
    // MERGE contract: four slices sketched independently, parts unioned
    // (the incremental publish path) — still within the bound
    val sliceParts = (0 until 4).map { s =>
      ProfileOps.quantileSketchParts(
        df.filter(pmod(col("x").cast("long"), lit(4)) === s), "x", k)
    }.reduce(_ unionByName _)
    val merged = ProfileOps.quantilesFromSketchParts(sliceParts).head()
    assert(rankErr(merged.getDouble(0), (n + 1) / 2) <= n * 3 / 100)
    assert(rankErr(merged.getDouble(1), (9 * n + 9) / 10) <= n * 3 / 100)
    // FOLD: re-compact the union back to one bounded part table; weight
    // still N, estimates still in bound (error composes, stays small)
    val folded = ProfileOps.sketchFromParts(sliceParts, k)
    val foldedRows = folded.collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(foldedRows.length <= k * (maxLevels + 2))
    assert(foldedRows.map { case (lvl, _) => 1L << lvl }.sum == n.toLong)
    val foldedEst = ProfileOps.quantilesFromSketchParts(folded).head()
    assert(rankErr(foldedEst.getDouble(0), (n + 1) / 2) <= n * 3 / 100)
    // PARQUET round-trip: two primitive columns, estimates identical
    val dir = java.nio.file.Files.createTempDirectory("kll").toString
    partsDf.write.mode("overwrite").parquet(s"$dir/parts")
    val back = ProfileOps.quantilesFromSketchParts(
      spark.read.parquet(s"$dir/parts")).head()
    assert(back.getDouble(0) == est.getDouble(0) &&
      back.getDouble(1) == est.getDouble(1))
    // EXACTNESS when N <= k: nothing compacts, the sketch IS the data
    val tiny = (1 to 100).map(_.toDouble).toDF("x").repartition(5)
    val tinyEst = ProfileOps.quantilesFromSketchParts(
      ProfileOps.quantileSketchParts(tiny, "x", k)).head()
    assert(tinyEst.getDouble(0) == 50.0 && tinyEst.getDouble(1) == 90.0)
  }

  test("canonicalQuantileSketch: byte-stable across runs, weight-conserving, same estimator family") {
    import spark.implicits._
    val n = 3000
    val values = (0 until n).map(i => ((i * 7919) % n) + 0.25)
    val df = values.toDF("x").repartition(8) // scrambled partitioning
    val k = 16 // small k: multi-level cascades at this n
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    val a = rows(ProfileOps.canonicalQuantileSketch(df, "x", k))
    // BYTE-stable: identical multiset on re-execution and under a
    // different input partitioning (the distributed build is only
    // bounded, not stable — this is the oracle/golden-file form)
    val b = rows(ProfileOps.canonicalQuantileSketch(df, "x", k))
    val c = rows(ProfileOps.canonicalQuantileSketch(
      values.reverse.toDF("x").repartition(3), "x", k))
    assert(a == b && a == c)
    // weight conserved exactly; size bounded
    assert(a.map { case (lvl, _) => 1L << lvl.toInt }.sum == n.toLong)
    val maxLevels = (math.log(n.toDouble / k) / math.log(2)).ceil.toInt + 2
    assert(a.length <= k * maxLevels)
    // reads through the same estimator with the same bound contract
    val est = ProfileOps.quantilesFromSketchParts(
      a.toDF("level", "value").selectExpr("CAST(level AS INT) AS level", "value"))
      .head()
    val sorted = values.sorted
    def rankErr(e: Double, target: Int): Int = {
      val lo = sorted.count(_ < e); val hi = sorted.count(_ <= e)
      if (target < lo) lo - target else if (target > hi) target - hi else 0
    }
    assert(rankErr(est.getDouble(0), (n + 1) / 2) <= n * 5 / 100)
    assert(rankErr(est.getDouble(1), (9 * n + 9) / 10) <= n * 5 / 100)
  }

  test("quantileSketchPartsByGroup: exact when groups fit k; bounded error beyond; group-partitioned read") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // every lang group has < k values -> nothing compacts -> the sketch
    // read must EQUAL the exact per-group profile's discrete quantiles
    val est = ProfileOps.quantilesFromSketchPartsByGroup(
      ProfileOps.quantileSketchPartsByGroup(docs, "lang", "n_chars", k = 256),
      "lang").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = ProfileOps.numericProfileByGroup(docs, "lang", "n_chars")
      .select(col("lang"), col("median").cast("double"), col("p90").cast("double"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est == exact, s"small-group sketch must be exact:\n$est\nvs\n$exact")
    // one group far beyond k: error bounded like the global sketch
    val n = 8000
    val big = (0 until n).map(i => ("g", ((i * 7919) % n) + 0.5)).toDF("g", "x")
      .repartition(8)
    val bigEst = ProfileOps.quantilesFromSketchPartsByGroup(
      ProfileOps.quantileSketchPartsByGroup(big, "g", "x", k = 256), "g")
      .head().getDouble(1)
    val sorted = (0 until n).map(i => ((i * 7919) % n) + 0.5).sorted
    val target = (n + 1) / 2
    val lo = sorted.count(_ < bigEst); val hi = sorted.count(_ <= bigEst)
    val err = if (target < lo) lo - target else if (target > hi) target - hi else 0
    assert(err <= n * 3 / 100, s"median est $bigEst rank error $err")
    // the read is group-partitioned (no unpartitioned window)
    val plan = ProfileOps.quantilesFromSketchPartsByGroup(
      ProfileOps.quantileSketchPartsByGroup(docs, "lang", "n_chars"), "lang")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(lang"), plan.take(2000))
    assert(!plan.contains("windowspecdefinition(val"),
      "unpartitioned window over the histogram reappeared:\n" + plan.take(2000))
  }

  test("numericProfile: prefix sum is distributed — no unpartitioned window") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val qe = ProfileOps.numericProfile(df, "l_quantity").queryExecution
    // the histogram running sum lives in a scalar subquery, so explain
    // the full tree (formatted mode inlines subquery plans)
    val plan = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("windowspecdefinition(pid"), plan.take(3000))
    assert(!plan.contains("windowspecdefinition(val"),
      "global unpartitioned window reappeared:\n" + plan.take(3000))
  }

  test("upsampleByWeight: floor copies + hash-decided stochastic unit, partitioning-stable") {
    val d = Seq(
      (0L, 2.0),   // exactly 2 copies, no stochastic unit
      (1L, 0.0),   // always drops
      (2L, 3.7),   // 3 or 4 copies, hash-decided
      (3L, 0.9),   // 0 or 1 copies
      (4L, 50.0))  // capped at maxRepeat
      .toDF("id", "w")
    val got = SampleOps.upsampleByWeight(d, col("id"), col("w"), maxRepeat = 10)
      .groupBy("id").agg(count(lit(1)).as("n"), max("copy").as("maxc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (2L, 1L))
    assert(!got.contains(1L))
    assert(Set(3L, 4L).contains(got(2L)._1))
    assert(got.get(3L).forall(_._1 == 1L))
    assert(got(4L) == (10L, 9L)) // maxRepeat cap, copy 0-based
    // runaway/garbage weights: clamped BEFORE the long cast (ANSI mode
    // would otherwise throw on floor(inf/2^63).cast(long)); NaN drops
    val bad = Seq((10L, Double.PositiveInfinity), (11L, Double.NaN),
      (12L, -3.0), (13L, 1e19)).toDF("id", "w")
    val gotBad = SampleOps.upsampleByWeight(bad, col("id"), col("w"), maxRepeat = 10)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBad == Map(10L -> 10L, 13L -> 10L)) // inf/1e19 capped; NaN + negative drop
    // expected-copies property on the real corpus: total within the
    // stochastic envelope of sum(w), and stable across partitionings
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sample(p: Int) = SampleOps.upsampleByWeight(docs.repartition(p),
        col("doc_id"), col("n_chars") / lit(256.0), maxRepeat = 5)
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = sample(3)
    assert(a == sample(11)) // pure row function
    val expected = docs.agg(sum(col("n_chars") / lit(256.0))).head().getDouble(0)
    assert(math.abs(a.size - expected) < 0.2 * expected,
      s"copies ${a.size} vs expected ~$expected")
  }

  test("equiWidthHistogram: exact integral binning, conservation, empty edge") {
    // values 0..9 into 5 bins of width 2: bin = v*5 div 10
    val d = (0L until 10L).flatMap(v => Seq.fill(v.toInt + 1)(v)).toDF("v")
    val got = ProfileOps.equiWidthHistogram(d, "v", bins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 3L, 0L, 1L), (1L, 7L, 2L, 3L), (2L, 11L, 4L, 5L),
      (3L, 15L, 6L, 7L), (4L, 19L, 8L, 9L)))
    assert(got.map(_._2).sum == d.count()) // every row lands in a bin
    // single-value column: one bin, observed bounds equal
    val one = Seq(7L, 7L, 7L).toDF("v")
    val g1 = ProfileOps.equiWidthHistogram(one, "v", bins = 4).collect()
    assert(g1.length == 1 && g1(0).getLong(1) == 3L &&
      g1(0).getLong(2) == 7L && g1(0).getLong(3) == 7L)
    // all-null / empty input: empty result, not a crash — and the SAME
    // schema (incl. nullability) as the populated path, so slice unions
    // can't hit a schema-merge surprise
    val empty = ProfileOps.equiWidthHistogram(Seq.empty[Long].toDF("v"), "v", bins = 3)
    assert(empty.count() == 0L)
    assert(empty.schema == ProfileOps.equiWidthHistogram(one, "v", bins = 3).schema)
    // ultra-wide range: loud require, not an ANSI overflow / wrapped bins
    val wide = Seq(Long.MinValue / 2, Long.MaxValue / 2).toDF("v")
    val e = intercept[IllegalArgumentException] {
      ProfileOps.equiWidthHistogram(wide, "v", bins = 10)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("topKPerGroup equals the ranking-window form; no window in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = SampleOps.topKPerGroup(docs, Seq("lang"), col("n_chars"), "doc_id", 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id").asc)
    val expected = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("lang"), col("rank"), col("doc_id"),
        col("n_chars").cast("double").as("ord"))
    assert(got.collect().toSet == expected.collect().toSet)
    assert(got.count() == 15) // 5 langs x 3
    // the whole point: the plan ranks via the bounded aggregate
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft_top_k_by_ord") && !plan.contains("Window"),
      plan.take(2000))
  }

  test("prioritySample: brute-force equal, weight-sensitive, partial top-k plan") {
    import graft.functions.HashKernels
    import org.apache.spark.unsafe.types.UTF8String
    // 2 groups x 100 rows; heavy rows get weight 1000, light rows 1
    val rows = (0L until 200L).map { i =>
      (i, if (i % 2 == 0) "g0" else "g1", if (i < 100) 1000L else 1L)
    }
    val df = rows.toDF("id", "g", "w")
    val got = SampleOps.prioritySample(df, "g", col("id"), col("w"), k = 25)
    // brute-force reference: same hash, same single-division priority,
    // same (priority desc, id) order — selection must be identical
    def pri(id: Long, w: Long): Double =
      w.toDouble / (HashKernels.weightedCharHash(UTF8String.fromString(id.toString)) + 1L).toDouble
    val expect = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy { case (id, _, w) => (-pri(id, w), id) }.take(25)
    }.map(_._1).toSet
    val gotIds = got.select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expect)
    // priority column is emitted and bit-equal to the reference formula
    got.select("id", "w", "priority").collect().foreach { r =>
      assert(r.getDouble(2) == pri(r.getLong(0), r.getLong(1)))
    }
    // weighted: heavy rows (weight 1000, half of each group) dominate
    val heavy = gotIds.count(_ < 100L)
    assert(heavy >= 40, s"only $heavy/50 sampled rows are heavy-weight")
    // k >= group size keeps everything
    assert(SampleOps.prioritySample(df, "g", col("id"), col("w"), k = 500)
      .count() == 200L)
    // membership is a pure row function + total order: identical
    // selection under any input partitioning
    val repart = SampleOps.prioritySample(df.repartition(7, col("w")),
        "g", col("id"), col("w"), k = 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(repart == gotIds)
    // rank filter compiles to a partial per-partition top-k, so only
    // ~k rows per group per partition reach the exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("property: numericProfile equals brute force across data shapes and partitionings") {
    // Pins the doc-comment claim mechanically: the distributed prefix
    // sum is exact wherever the range partitioner draws boundaries, so
    // every cell must be identical under ANY shuffle-partition count —
    // including the degenerate 1 and counts above the histogram size.
    val rnd = new scala.util.Random(17)
    val cases: Seq[Seq[Option[Double]]] = Seq(
      Seq.empty[Option[Double]],       // empty input
      Seq(None, None, None),           // all null
      Seq(Some(5.0)),                  // single row
    ) ++ (0 until 4).map { _ =>
      Seq.fill(50 + rnd.nextInt(150))(
        if (rnd.nextInt(10) == 0) None
        else Some((rnd.nextInt(40) + 1) * 0.25)) // duplicate-heavy histogram
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq(1, 3, 7, 32); data <- cases) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val r = ProfileOps.numericProfile(data.toDF("x"), "x").head()
        val nn = data.flatten.sorted
        val ctx = s"parts=$parts n=${data.size} nn=${nn.size}"
        assert(r.getAs[Long]("n_rows") == data.size, ctx)
        assert(r.getAs[Long]("n_null") == data.count(_.isEmpty), ctx)
        if (nn.isEmpty) {
          for (f <- Seq("min_v", "max_v", "median", "p90"))
            assert(r.isNullAt(r.fieldIndex(f)), s"$ctx $f")
        } else {
          val k50 = (nn.size + 1) / 2
          val k90 = (9 * nn.size + 9) / 10
          assert(r.getAs[Double]("min_v") == nn.head, ctx)
          assert(r.getAs[Double]("max_v") == nn.last, ctx)
          assert(r.getAs[Long]("sum_cents") == nn.map(v => Math.round(v * 100)).sum, ctx)
          assert(r.getAs[Double]("median") == nn(k50 - 1), ctx)
          assert(r.getAs[Double]("p90") == nn(k90 - 1), ctx)
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("temperatureSample flattens the mixture toward sqrt-share targets") {
    // heavily skewed groups: 400 / 100 / 25 rows
    val rows = (0L until 400L).map(i => (i, "big")) ++
      (400L until 500L).map(i => (i, "mid")) ++
      (500L until 525L).map(i => (i, "tiny"))
    val df = rows.toDF("id", "g")
    val got = SampleOps.temperatureSample(df, "g", col("id"), budget = 100)
    val perGroup = got.groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // w = floor(sqrt(n)) = 20/10/5, tw = 35; targets = 100*w/35 = 57/28/14
    // hash realization is approximate; shares must flatten: the big
    // group's keep-RATE far below the tiny group's
    val rateBig = perGroup.getOrElse("big", 0L).toDouble / 400
    val rateTiny = perGroup.getOrElse("tiny", 0L).toDouble / 25
    assert(rateTiny > rateBig * 2,
      s"expected flattening, got rates big=$rateBig tiny=$rateTiny ($perGroup)")
    // membership is a pure row function: partitioning-independent
    val again = SampleOps.temperatureSample(df.repartition(13, col("g")), "g",
      col("id"), budget = 100).select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
    // groups over-budget never exceed rate 1; a budget >= corpus keeps all
    val all = SampleOps.temperatureSample(df, "g", col("id"), budget = 100000)
    assert(all.count() == 525L)
    // a null group is a group like any other (null-safe join) — not dropped
    val withNull = rows.map { case (i, g) => (i, Some(g)) } :+ (525L, None)
    val nf = withNull.toDF("id", "g")
    assert(SampleOps.temperatureSample(nf, "g", col("id"), budget = 100000)
      .count() == 526L)
  }

  test("mixtureRates: exact thresholds, binding group keeps all, scale-invariant weights") {
    // tokens per group: a=2000 (4x500), b=600 (3x200), c=400 (2x200),
    // d unlisted, plus a null group. Weights 5/3/2 (sum 10):
    // T_out = min(2000*10/5, 600*10/3, 400*10/2) = 2000
    // -> a targets 1000 of 2000 tokens (thr 500000 ppm); b and c bind
    // (thr 10^6); d and null get no rate at all.
    val rows = Seq(
      (0L, Some("a"), 500L), (1L, Some("a"), 500L), (2L, Some("a"), 500L), (3L, Some("a"), 500L),
      (4L, Some("b"), 200L), (5L, Some("b"), 200L), (6L, Some("b"), 200L),
      (7L, Some("c"), 200L), (8L, Some("c"), 200L),
      (9L, Some("d"), 999L), (10L, None, 123L))
    val df = rows.toDF("id", "g", "tok")
    val w = Map("a" -> 5L, "b" -> 3L, "c" -> 2L)
    val rates = SampleOps.mixtureRates(df, "g", "tok", w)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rates == Map("a" -> ((2000L, 500000L)), "b" -> ((600L, 1000000L)),
      "c" -> ((400L, 1000000L))))
    // weights are RELATIVE: any positive rescaling yields the same table
    val scaled = SampleOps.mixtureRates(df, "g", "tok",
        w.map { case (k, v) => (k, v * 100) })
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(scaled == rates)

    val kept = SampleOps.rebalanceToShares(df, "g", col("id"), "tok", w)
    // groups with thr 10^6 keep every row; unlisted/null groups drop
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(Set(4L, 5L, 6L, 7L, 8L).subsetOf(keptIds))
    assert(!keptIds.contains(9L) && !keptIds.contains(10L))
    // membership is a pure row function: partitioning-independent
    val again = SampleOps.rebalanceToShares(df.repartition(13, col("g")), "g",
      col("id"), "tok", w).select("id").collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
    // schema passes through unchanged
    assert(kept.columns.toSeq == df.columns.toSeq)
  }

  test("rebalanceToShares realizes the target token mixture on the real corpus") {
    val target = Map("en" -> 500L, "zh" -> 300L, "de" -> 200L)
    val kept = SampleOps.rebalanceToShares(corpus, "lang", col("doc_id"),
      "n_chars", target)
    val byLang = kept.groupBy("lang").agg(sum("n_chars").as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byLang.keySet == Set("en", "zh", "de"))
    val total = byLang.values.sum.toDouble
    // hash realization over a few dozen rows per group: generous band
    assert(math.abs(byLang("en") / total - 0.5) < 0.15, byLang.toString)
    assert(math.abs(byLang("zh") / total - 0.3) < 0.15, byLang.toString)
    // the binding group's rate sits at (or within double-integer-floor
    // slack of) full keep — T_out = ⌊T·Σw/w⌋ re-floored through the
    // ppm division can land a hair under 10^6, never over
    val rates = SampleOps.mixtureRates(corpus, "lang", "n_chars", target)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rates.values.map(_._2).max >= 999000L, rates.toString)
    assert(rates.values.map(_._2).forall(_ <= 1000000L), rates.toString)
  }

  test("capPerGroup bounds every group and picks a stable subset") {
    val capped = SampleOps.capPerGroup(corpus, "source", col("doc_id"), 30)
    val perGroup = capped.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val full = corpus.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perGroup.values.forall(_ <= 30))
    full.foreach { case (g, n) => assert(perGroup(g) == math.min(n, 30L)) }
    // deterministic across physical layout
    val again = SampleOps.capPerGroup(corpus.repartition(13), "source", col("doc_id"), 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == capped.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("packBins: bins within a bucket fill contiguously under the budget") {
    val chunks = corpus
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = SampleOps.packBins(chunks, col("doc_id"), "n_tokens",
      capacity = 256, buckets = 8)
    val rows = packed.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(1))) // (bucket, bin, tokens)
    assert(rows.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    // every item is assigned, none lost or duplicated
    assert(rows.length == corpus.count())
    // per (bucket, bin): the tokens BELOW an item (exclusive prefix) stay
    // under capacity => each bin's pre-overflow load is < capacity + max item
    val byBin = rows.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum)
    val maxItem = rows.map(_._3).max
    assert(byBin.values.forall(_ < 256 + maxItem))
    // deterministic across partitionings
    val again = SampleOps.packBins(
      chunks.repartition(11), col("doc_id"), "n_tokens", 256, 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(again == packed.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet)
  }

  test("packBins: default bucket count tracks the configured parallelism") {
    val chunks = corpus
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // default (buckets <= 0) resolves to spark.sql.shuffle.partitions at
    // call time — the window's parallelism cap follows the cluster dial
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val auto = SampleOps.packBins(chunks, col("doc_id"), "n_tokens", capacity = 256)
      .select("pack_bucket").distinct().collect().map(_.getLong(0)).toSet
    assert(auto.subsetOf((0L until conf.toLong).toSet) && auto.size > 1,
      s"expected buckets in [0, $conf), got $auto")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try {
      val narrow = SampleOps.packBins(chunks, col("doc_id"), "n_tokens", capacity = 256)
        .select("pack_bucket").distinct().collect().map(_.getLong(0)).toSet
      assert(narrow.subsetOf((0L until 5L).toSet),
        s"expected buckets in [0, 5), got $narrow")
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf.toString)
  }

  test("materializePacked concatenates bin members in deterministic hash order") {
    val chunks = corpus
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = SampleOps.packBins(chunks, col("doc_id"), "n_tokens", 256, 4)
    val seqs = SampleOps.materializePacked(packed, col("doc_id"), "text")
    // no document lost: total member count equals the corpus size
    assert(seqs.agg(sum(col("n_items"))).head().getLong(0) == corpus.count())
    // deterministic across physical layout (collect order never leaks)
    val again = SampleOps.materializePacked(
      SampleOps.packBins(chunks.repartition(7), col("doc_id"), "n_tokens", 256, 4),
      col("doc_id"), "text")
      .orderBy("pack_bucket", "bin_seq").collect().map(_.getString(2)).toSeq
    assert(again == seqs.orderBy("pack_bucket", "bin_seq")
      .collect().map(_.getString(2)).toSeq)
  }

  test("hashSample is monotone in the rate: smaller samples nest in larger") {
    val s100 = SampleOps.hashSample(corpus, col("doc_id"), 100, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s300 = SampleOps.hashSample(corpus, col("doc_id"), 300, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s100.subsetOf(s300))
  }

  test("stratifiedHashSample applies per-group rates, default for the rest") {
    val sampled = SampleOps.stratifiedHashSample(
      corpus, "lang", col("doc_id"), Map("en" -> 0), default = 1000)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val full = corpus.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!byLang.contains("en")) // rate 0 drops the group entirely
    full.filterNot(_._1 == "en").foreach { case (g, n) =>
      assert(byLang(g) == n) // default 1000 keeps everything else
    }
    // per-group membership equals plain hashSample restricted to the group
    val zh = SampleOps.stratifiedHashSample(
        corpus, "lang", col("doc_id"), Map("zh" -> 300), default = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = SampleOps.hashSample(
        corpus.filter(col("lang") === "zh"), col("doc_id"), 300, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(zh == direct)
  }

  test("capPerGroup cap above group size keeps everything") {
    val df = Seq((0L, "a"), (1L, "a"), (2L, "b")).toDF("id", "g")
    assert(SampleOps.capPerGroup(df, "g", col("id"), 10).count() == 3)
    assert(SampleOps.capPerGroup(df, "g", col("id"), 0).isEmpty)
  }

  test("assignShards: globally consecutive size-targeted shards, stable across partitionings") {
    val target = 20000L
    val a = SampleOps.assignShards(corpus, col("doc_id"), "n_chars", target, 8)
      .select("doc_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SampleOps.assignShards(corpus.repartition(17, col("lang")),
        col("doc_id"), "n_chars", target, 8)
      .select("doc_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "assignment must be partitioning-independent")
    // shard ids are consecutive from 0 and each shard's pre-overrun
    // load fits the bounded-overrun envelope: < target + max item
    val total = corpus.agg(sum(col("n_chars"))).head().getLong(0)
    val maxItem = corpus.agg(max(col("n_chars"))).head().getLong(0)
    val ids = a.values.toSet
    assert(ids == (0L until (total / target + 1)).toSet.intersect(ids) &&
      ids.contains(0L) && ids.max == ids.size - 1L, s"non-consecutive: $ids")
    val loads = corpus.select(col("doc_id"), col("n_chars")).collect()
      .map(r => (a(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    // every shard except possibly the last is filled to >= target - maxItem
    loads.filter(_._1 < ids.max).values.foreach { l =>
      assert(l < target + maxItem && l + maxItem >= target, s"bad shard load $l")
    }
  }

  test("writeSharded manifest is byte-stable across partitionings and atomically published") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val p1 = s"$dir/corpus1"
    val p2 = s"$dir/corpus2"
    SampleOps.writeSharded(corpus, col("doc_id"), "n_chars", "text",
      p1, targetTokens = 20000L, buckets = 8)
    SampleOps.writeSharded(corpus.repartition(13, col("source")),
      col("doc_id"), "n_chars", "text", p2, targetTokens = 20000L, buckets = 8)
    val m1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p1, "_graft_manifest.json"))
    val m2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p2, "_graft_manifest.json"))
    assert(m1 == m2, "manifest must be a pure function of content")
    // the published dir reads back whole: every sequence present once,
    // shard dirs agree with the manifest
    val back = spark.read.parquet(p1)
    assert(back.count() == corpus.count())
    assert(back.select("seq_key").distinct().count() == corpus.count())
    val manifestShards = """"shard_id":(\d+)""".r
      .findAllMatchIn(m1).map(_.group(1).toLong).toSet
    val dirShards = back.select(col("shard_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(manifestShards == dirShards)
    // no staging residue after publish
    assert(!new java.io.File(p1 + "__staging").exists())
    assert(!new java.io.File(p1 + "__old").exists())
  }

  test("writeSharded: returned manifest survives the publish; empty input publishes cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("shards_edge").toString
    // the returned DataFrame must be actionable AFTER the staged swap
    // renamed the staging dir away (a lazy plan over staging would dangle)
    val m = SampleOps.writeSharded(corpus, col("doc_id"), "n_chars", "text",
      s"$dir/c", targetTokens = 50000L, buckets = 4)
    val got = m.orderBy("shard_id").collect()
    assert(got.nonEmpty && got.map(_.getLong(2)).sum == corpus.count())
    // empty input: an empty corpus + "[]" manifest publish, no crash,
    // no staging residue
    val m0 = SampleOps.writeSharded(corpus.filter(col("doc_id") < 0),
      col("doc_id"), "n_chars", "text", s"$dir/e", targetTokens = 1000L,
      buckets = 4)
    assert(m0.isEmpty)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/e", "_graft_manifest.json")) == "[]")
    assert(!new java.io.File(s"$dir/e__staging").exists())
  }

  test("writeSharded: all-NULL token shard gets n_tokens 0 in the manifest, not an NPE") {
    val dir = java.nio.file.Files.createTempDirectory("shards_null").toString
    // every row's token count NULL (weight 0 by the assignShards
    // contract): one shard, sum(NULL) must manifest as 0
    val nulls = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
      .withColumn("n_chars", lit(null).cast("long"))
    val m = SampleOps.writeSharded(nulls, col("doc_id"), "n_chars", "text",
      s"$dir/n", targetTokens = 1000L, buckets = 2)
    val got = m.collect()
    assert(got.map(_.getLong(3)).toSeq == Seq(0L))
    assert(got.map(_.getLong(2)).sum == 3L)
  }

  test("packSequences cuts the global id stream into fixed-length examples; lossless, stable") {
    val enc = TextOps.encodeBpe(corpus, "doc_id", "text")
    val eos = TextOps.bpeEosId()
    val seqLen = 64
    val packed = SampleOps.packSequences(enc, col("doc_id"), "token_ids",
      seqLen, eos, buckets = 8)
    val rows = packed.collect()
    val nDocs = enc.count()
    val nTok = enc.agg(sum("n_tokens")).head().getLong(0)
    // volume: every token plus exactly one EOS per doc
    assert(rows.length.toLong == nTok + nDocs)
    assert(rows.count(_.getLong(2) == eos).toLong == nDocs)
    // every sequence is dense 0..len-1; all but the last exactly seqLen
    val bySeq = rows.groupBy(_.getLong(0))
    val maxSeq = bySeq.keys.max
    bySeq.foreach { case (sid, rs) =>
      val poss = rs.map(_.getLong(1)).sorted
      assert(poss.head == 0L && poss.last == poss.length - 1L &&
        poss.distinct.length == poss.length, s"seq $sid positions not dense")
      if (sid < maxSeq) assert(rs.length == seqLen, s"seq $sid not full")
    }
    // per-doc slice of the global stream == the doc's own ids + EOS,
    // contiguous in stream order (docs never interleave)
    val encMap = enc.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.groupBy(_.getLong(3)).foreach { case (id, rs) =>
      val ids = rs.sortBy(r => (r.getLong(0), r.getLong(1))).map(_.getLong(2)).toSeq
      assert(ids == encMap(id) :+ eos, s"doc $id stream slice mismatch")
    }
    // pure content function: identical under a different partitioning
    val again = SampleOps.packSequences(enc.repartition(7), col("doc_id"),
      "token_ids", seqLen, eos, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // materializeSequences assembles ids in sequence order
    val mat = SampleOps.materializeSequences(packed).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    bySeq.foreach { case (sid, rs) =>
      assert(mat(sid) == rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq)
    }
  }

  test("materializePackedSequences (fragment path) == materializeSequences(packSequences)") {
    val enc = TextOps.encodeBpe(corpus, "doc_id", "text")
    val eos = TextOps.bpeEosId()
    for (seqLen <- Seq(64, 1024)) {
      val viaTokens = SampleOps.materializeSequences(
        SampleOps.packSequences(enc, col("doc_id"), "token_ids", seqLen, eos, 8))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaFrags = SampleOps.materializePackedSequences(enc, col("doc_id"),
        "token_ids", seqLen, eos, 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaFrags == viaTokens, s"fragment path diverged at seqLen=$seqLen")
      // stable under a different input partitioning too
      val again = SampleOps.materializePackedSequences(enc.repartition(7),
        col("doc_id"), "token_ids", seqLen, eos, 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(again == viaTokens)
    }
  }

  test("trainer corpus on disk: packed sequences shard and publish with an array payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seqcorpus").toFile
    val out = new java.io.File(dir, "packed").getPath
    try {
      val eos = TextOps.bpeEosId()
      val seqs = SampleOps.materializePackedSequences(
        TextOps.encodeBpe(corpus, "doc_id", "text"),
        col("doc_id"), "token_ids", 128, eos, buckets = 8)
      // writeSharded's payload column is type-agnostic: array<long>
      // sequences shard exactly like text documents
      val manifest = SampleOps.writeSharded(seqs, col("seq_id"), "n_tokens",
        "token_ids", out, targetTokens = 4000L, buckets = 4).collect()
      val back = spark.read.parquet(out)
      val expect = seqs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val got = back.collect().map(r =>
        r.getLong(r.fieldIndex("seq_key")) ->
          r.getSeq[Long](r.fieldIndex("text"))).toMap
      assert(got == expect, "published packed corpus must round-trip every sequence")
      assert(manifest.map(_.getLong(3)).sum ==
        seqs.agg(sum("n_tokens")).head().getLong(0))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("property: packSequences equals an in-memory reference across shapes") {
    val rnd = new scala.util.Random(42)
    import org.apache.spark.unsafe.types.UTF8String
    for (trial <- 1 to 8) {
      val nDocs = 1 + rnd.nextInt(40)
      val seqLen = 1 + rnd.nextInt(20)
      val buckets = 1 + rnd.nextInt(5)
      val sep = -1L
      val docs = (0 until nDocs).map { i =>
        val key = rnd.nextInt(1000).toLong * 10 + i // unique, non-dense
        (key, Seq.fill(rnd.nextInt(7))(rnd.nextInt(100).toLong))
      }
      // in-memory reference: the documented deterministic global order
      // (bucket, charHash(key), key), exclusive prefix offsets, stream
      val ordered = docs.sortBy { case (k, _) =>
        val h = graft.functions.HashKernels.weightedCharHash(
          UTF8String.fromString(k.toString))
        (((h % buckets) + buckets) % buckets, h, k)
      }
      val expected = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
      var g = 0L
      ordered.foreach { case (k, ids) =>
        (ids :+ sep).foreach { id =>
          expected += ((g / seqLen, g % seqLen, id, k)); g += 1
        }
      }
      val got = SampleOps.packSequences(
          docs.toDF("key", "ids").repartition(1 + rnd.nextInt(4)),
          col("key"), "ids", seqLen, sep, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected.toSet,
        s"trial $trial (nDocs=$nDocs seqLen=$seqLen buckets=$buckets) diverged")
    }
  }

  test("epochShuffle: dense bijective positions, epoch-dependent, partitioning-stable") {
    val n = corpus.count()
    val e3 = SampleOps.epochShuffle(corpus, col("doc_id"), epoch = 3L, buckets = 8)
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: positions are exactly 0..n-1
    assert(e3.values.toSeq.sorted == (0L until n).toSeq)
    // reproducible across input partitionings
    val again = SampleOps.epochShuffle(corpus.repartition(7), col("doc_id"),
        epoch = 3L, buckets = 8)
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == e3)
    // a different epoch draws a genuinely different permutation
    val e4 = SampleOps.epochShuffle(corpus, col("doc_id"), epoch = 4L, buckets = 8)
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e4.values.toSeq.sorted == (0L until n).toSeq)
    val moved = e3.count { case (k, p) => e4(k) != p }
    assert(moved > n / 2, s"epoch 4 moved only $moved/$n rows vs epoch 3")
  }

  test("unpackSequences inverts packSequences exactly, including empty and boundary-straddling docs") {
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L, 13L, 14L)), // straddles the 4-id boundary
      (2L, Seq.empty[Long]),              // empty doc: bare separator
      (3L, Seq(20L)),
      (4L, (30L to 45L).toSeq),           // multi-sequence doc
      (5L, null.asInstanceOf[Seq[Long]])) // null ids: pack coalesces to []
      .toDF("doc_id", "ids")
    val packed = SampleOps.packSequences(docs, col("doc_id"), "ids",
      seqLen = 4, sepId = 99L, buckets = 2)
    val back = SampleOps.unpackSequences(packed).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    docs.collect().foreach { r =>
      // the documented null-coalescing contract: null comes back EMPTY
      val want = Option(r.getSeq[Long](1)).getOrElse(Seq.empty[Long])
      assert(back(r.getLong(0)) == ((want, want.length.toLong)),
        s"doc ${r.getLong(0)}")
    }
    // and across the real corpus on the lossless stream
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val enc = TextOps.encodeBpe(corpus, "doc_id", "text",
      TextOps.DefaultBpeMerges, lossless = true)
    val p = SampleOps.packSequences(enc, col("doc_id"), "token_ids",
      seqLen = 128, sepId = TextOps.bpeEosId(), buckets = 8)
    val rows = SampleOps.unpackSequences(p)
      .join(enc.select(col("doc_id").as("src_key"),
        col("token_ids").as("orig")), Seq("src_key"))
    assert(rows.filter(col("token_ids") =!= col("orig")).count() == 0L)
    assert(rows.count() == enc.count())
  }

  test("packSequences: null arrays pack as the bare separator") {
    val df = Seq((1L, Seq(7L, 8L)), (2L, null.asInstanceOf[Seq[Long]]))
      .toDF("id", "ids")
    val p = SampleOps.packSequences(df, col("id"), "ids", 4, 99L, 2).collect()
    assert(p.length == 4) // 7, 8, sep | bare sep
    assert(p.filter(_.getLong(3) == 2L).map(_.getLong(2)).toSeq == Seq(99L))
  }

  test("appendSharded: day-append extends the corpus without touching standing shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_append").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      val day1 = corpus.filter(col("doc_id") % 2 === 0)
      val day2 = corpus.filter(col("doc_id") % 2 === 1)
      val m1 = SampleOps.writeSharded(day1, col("doc_id"), "n_chars", "text",
        out, targetTokens = 3000L, buckets = 4).collect()
      // fingerprint the standing shard files before the append
      val standingFiles = m1.map(_.getString(1)).flatMap { p =>
        new java.io.File(out, p).listFiles().filter(_.isFile)
          .map(f => f.getPath -> (f.length(), f.lastModified()))
      }.toMap
      val m2 = SampleOps.appendSharded(day2, col("doc_id"), "n_chars", "text",
        out, targetTokens = 3000L, buckets = 4).collect()
      // standing files untouched byte-for-byte (length + mtime)
      standingFiles.foreach { case (p, sig) =>
        val f = new java.io.File(p)
        assert(f.exists() && (f.length(), f.lastModified()) == sig, s"standing $p changed")
      }
      // combined manifest = old rows verbatim + new rows continuing the numbering
      val m2ById = m2.map(r => r.getLong(0) -> r).toMap
      m1.foreach(r => assert(m2ById(r.getLong(0)).toString == r.toString))
      val maxOld = m1.map(_.getLong(0)).max
      val fresh = m2.filter(_.getLong(0) > maxOld)
      assert(fresh.nonEmpty && m2.length == m1.length + fresh.length)
      assert(m2.map(_.getLong(0)).sorted.toSeq == (0L to m2.map(_.getLong(0)).max).toSeq)
      // the published corpus now carries every row of both days, exactly once
      val back = spark.read.parquet(out)
      assert(back.count() == corpus.count())
      assert(back.select("seq_key").distinct().count() == corpus.count())
      // manifest totals == data totals per shard (shard_id comes back
      // as INT from partition-dir inference — cast before comparing)
      val agg = back.groupBy(col("shard_id").cast("long").as("sid"))
        .agg(count(lit(1)).as("n"), sum("n_tokens").as("t")).collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      m2.foreach(r => assert(agg(r.getLong(0)) == ((r.getLong(2), r.getLong(3)))))
      // determinism: the same append on a copy yields byte-equal manifests
      val out2 = new java.io.File(dir, "corpus2").getPath
      SampleOps.writeSharded(day1, col("doc_id"), "n_chars", "text",
        out2, targetTokens = 3000L, buckets = 4)
      SampleOps.appendSharded(day2.repartition(7), col("doc_id"), "n_chars", "text",
        out2, targetTokens = 3000L, buckets = 4)
      val b1 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json"))
      val b2 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out2, "_graft_manifest.json"))
      assert(b1 == b2)
      // appending to a dir that was never writeSharded fails actionably
      val e = intercept[IllegalArgumentException] {
        SampleOps.appendSharded(day2, col("doc_id"), "n_chars", "text",
          new java.io.File(dir, "nope").getPath, 3000L, 4)
      }
      assert(e.getMessage.contains("writeSharded"))
      // empty append: manifest survives unchanged, corpus intact
      SampleOps.appendSharded(day2.limit(0), col("doc_id"), "n_chars", "text",
        out, targetTokens = 3000L, buckets = 4)
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json")) == b1)
      assert(spark.read.parquet(out).count() == corpus.count())
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("writeSharded accepts local paths with spaces and percent signs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_odd").toFile
    val out = new java.io.File(dir, "my corpus 100%done").getPath
    try {
      val m = SampleOps.writeSharded(corpus.limit(20), col("doc_id"), "n_chars",
        "text", out, targetTokens = 3000L, buckets = 2)
      assert(m.count() > 0 && spark.read.parquet(out).count() == 20)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("appendSharded refuses a manifest with ANY unparseable entry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badmf").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      SampleOps.writeSharded(corpus.limit(20), col("doc_id"), "n_chars",
        "text", out, targetTokens = 3000L, buckets = 2)
      val mf = java.nio.file.Paths.get(out, "_graft_manifest.json")
      val good = java.nio.file.Files.readString(mf)
      // corrupt ONE trailing entry: a partial parse would compute an
      // offset colliding with the live unparsed shard
      java.nio.file.Files.writeString(mf,
        good.dropRight(1) + ""","{"shard_id":9,"path":"shard_id=9","n_seqs":oops}]""")
      val e = intercept[IllegalArgumentException] {
        SampleOps.appendSharded(corpus.limit(5), col("doc_id"), "n_chars",
          "text", out, targetTokens = 3000L, buckets = 2)
      }
      assert(e.getMessage.contains("refusing to append"))
      // brace-free corruption (truncation, 'null', '[') must also refuse
      // — 0 parsed == 0 braces would otherwise zero the offset and
      // overwrite live shards
      for (garbage <- Seq("", "null", "[")) {
        java.nio.file.Files.writeString(mf, garbage)
        val g = intercept[IllegalArgumentException] {
          SampleOps.appendSharded(corpus.limit(5), col("doc_id"), "n_chars",
            "text", out, targetTokens = 3000L, buckets = 2)
        }
        assert(g.getMessage.contains("refusing to append"), s"garbage '$garbage'")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("epochShuffle fails loudly on a null key instead of a physical-order position") {
    val df = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "v")
    val e = intercept[Exception] {
      SampleOps.epochShuffle(df, col("k"), epoch = 1L, buckets = 2).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("null key") ||
      Option(e.getCause).exists(_.getMessage.contains("null key")))
  }

  test("assignShards refuses reserved working column names; writeSharded refuses remote schemes") {
    val clash = corpus.withColumn("__cum", lit(1L))
    val e = intercept[IllegalArgumentException] {
      SampleOps.assignShards(clash, col("doc_id"), "n_chars", 1000L, 4)
    }
    assert(e.getMessage.contains("__cum"))
    val r = intercept[IllegalArgumentException] {
      SampleOps.writeSharded(corpus, col("doc_id"), "n_chars", "text",
        "s3://bucket/corpus", targetTokens = 1000L, buckets = 4)
    }
    assert(r.getMessage.contains("local-filesystem"))
    // single-slash/opaque scheme URIs (Hadoop accepts them) must hit
    // the same gate — the data would go remote, the manifest local
    val r2 = intercept[IllegalArgumentException] {
      SampleOps.writeSharded(corpus, col("doc_id"), "n_chars", "text",
        "hdfs:/corpus", targetTokens = 1000L, buckets = 4)
    }
    assert(r2.getMessage.contains("local-filesystem"))
  }

  test("epochShuffle refuses an input that already carries epoch_pos; packers refuse __ids") {
    val clash = corpus.limit(5).withColumn("epoch_pos", lit(0L))
    val e = intercept[IllegalArgumentException] {
      SampleOps.epochShuffle(clash, col("doc_id"), epoch = 1L, buckets = 2)
    }
    assert(e.getMessage.contains("epoch_pos"))
    val ids = corpus.limit(5)
      .select(col("doc_id"), array(lit(1L)).as("tids"))
      .withColumn("__ids", lit(0L))
    for (op <- Seq(
        () => SampleOps.packSequences(ids, col("doc_id"), "tids", 8, 99L, 2),
        () => SampleOps.materializePackedSequences(ids, col("doc_id"), "tids", 8, 99L, 2))) {
      val p = intercept[IllegalArgumentException](op())
      assert(p.getMessage.contains("__ids"))
    }
  }

  test("appendSharded is single-writer: the append lock refuses a second writer and clears on completion") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lock").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      SampleOps.writeSharded(corpus.limit(20), col("doc_id"), "n_chars",
        "text", out, targetTokens = 3000L, buckets = 2)
      // simulate an in-flight (or crashed) append holding the lock
      val lock = new java.io.File(out, "_graft_append.lock")
      assert(lock.createNewFile())
      val e = intercept[IllegalArgumentException] {
        SampleOps.appendSharded(corpus.limit(5), col("doc_id"), "n_chars",
          "text", out, targetTokens = 3000L, buckets = 2)
      }
      assert(e.getMessage.contains("single-writer") &&
        e.getMessage.contains("remove the lock file"))
      // corpus untouched by the refused append
      assert(spark.read.parquet(out).count() == 20)
      lock.delete()
      // a successful append takes and RELEASES the lock
      SampleOps.appendSharded(corpus.filter(col("doc_id") >= 400).limit(5),
        col("doc_id"), "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      assert(!lock.exists(), "lock must be released after a completed append")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("appendSharded sweeps crash-orphan shard dirs a directory-listing reader would surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orphan").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      val m1 = SampleOps.writeSharded(corpus.limit(40), col("doc_id"), "n_chars",
        "text", out, targetTokens = 3000L, buckets = 2).collect()
      val offset = m1.map(_.getLong(0)).max + 1
      // plant a crashed append's orphan: a live shard dir above the
      // standing manifest's range, holding rows no manifest references
      val orphan = new java.io.File(out, s"shard_id=${offset + 7}")
      corpus.limit(3)
        .select(col("doc_id").as("seq_key"),
          col("n_chars").cast("long").as("n_tokens"), col("text"))
        .coalesce(1).write.parquet(orphan.getPath)
      assert(spark.read.parquet(out).count() == 43) // reader sees orphan rows
      SampleOps.appendSharded(corpus.filter(col("doc_id") >= 400).limit(5),
        col("doc_id"), "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      assert(!orphan.exists(), "orphan above the append's fresh range must be swept")
      // every surviving row is manifest-covered
      val mf = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json"))
      val covered = """"shard_id":(\d+)""".r.findAllMatchIn(mf).map(_.group(1).toLong).toSet
      val live = Option(new java.io.File(out).list()).get
        .filter(_.startsWith("shard_id=")).map(_.stripPrefix("shard_id=").toLong).toSet
      assert(live == covered, s"live $live vs manifest $covered")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("materializeTrainingCorpus: one call to a mountable corpus — shards + atomic vocab sidecar, dense ids, rebuild-identical, stream reconstructs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      val (manifest, vocab) = SampleOps.materializeTrainingCorpus(
        corpus, "doc_id", "text", out, seqLen = 128,
        targetTokens = 3000L, buckets = 4)
      val m = manifest.collect()
      // vocab sidecar published atomically with the corpus, dense [0, V)
      val v = spark.read.parquet(out + "/_graft_vocab.parquet")
        .orderBy("dense_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(v.map(_._1).toSeq == (0L until v.length.toLong))
      assert(v.map(_._2).toSeq == vocab.orderBy("dense_id").collect()
        .map(_.getLong(1)).toSeq)
      // plain readers see only the shards; every id is dense; all
      // sequences except the global last are exactly seqLen
      val back = spark.read.parquet(out)
      assert(back.columns.toSet ==
        Set("shard_id", "seq_key", "n_tokens", "text"))
      val nSeqs = back.count()
      assert(back.filter(col("n_tokens") =!= 128).count() <= 1)
      assert(back.select(max(array_max(col("text")))).head().getLong(0) <
        v.length)
      // manifest totals == data totals
      assert(m.map(_.getLong(2)).sum == nSeqs)
      assert(m.map(_.getLong(3)).sum ==
        back.agg(sum("n_tokens")).head().getLong(0))
      // the flattened global stream, split at the dense EOS and mapped
      // back through the SWAPPED vocab, is exactly the per-doc sparse
      // id arrays of the curated corpus — the artifact still contains
      // its documents
      val eosDense = TextOps.denseId(vocab, TextOps.bpeEosId())
      val toSparse = v.map { case (d, t) => d -> t }.toMap
      val stream = back.orderBy(col("seq_key"))
        .select(explode(col("text")).as("id")).collect().map(_.getLong(0))
      val docsBack = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long]()
      stream.foreach { id =>
        if (id == eosDense) { docsBack += cur.toSeq.map(toSparse); cur.clear() }
        else cur += id
      }
      assert(cur.isEmpty, "stream must end on a document boundary")
      val expected = TextOps.encodeBpe(
          graft.ops.DedupOps.exactDedup(
            TextOps.qualityFilter(corpus, "text"), "doc_id", "text"),
          "doc_id", "text", TextOps.DefaultBpeMerges, lossless = true)
        .select("token_ids").collect().map(_.getSeq[Long](0): Seq[Long])
      assert(docsBack.size == expected.length)
      assert(docsBack.groupBy(identity).view.mapValues(_.size).toMap ==
        expected.groupBy(identity).view.mapValues(_.size).toMap)
      // a rebuild from a different partitioning is byte-identical
      val out2 = new java.io.File(dir, "corpus2").getPath
      SampleOps.materializeTrainingCorpus(corpus.repartition(7, col("lang")),
        "doc_id", "text", out2, seqLen = 128, targetTokens = 3000L, buckets = 4)
      val mf1 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json"))
      val mf2 = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out2, "_graft_manifest.json"))
      assert(mf1 == mf2)
      val h1 = spark.read.parquet(out).agg(bit_xor(xxhash64(col("seq_key"),
        col("text")))).head().getLong(0)
      val h2 = spark.read.parquet(out2).agg(bit_xor(xxhash64(col("seq_key"),
        col("text")))).head().getLong(0)
      assert(h1 == h2)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest-as-commit: shards first, manifest PUT last; crash leaves old corpus intact; readers never list directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_commit").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      val m1 = SampleOps.writeShardedCommit(corpus.limit(40), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      val m1rows = m1.collect()
      assert(m1rows.nonEmpty)
      // data sits under immutable per-commit dirs; paths resolve
      assert(m1rows.forall(_.getString(1).startsWith("data/c0/shard_id=")))
      val (gen0, _) = SampleOps.readCommitManifest(spark, out)
      assert(gen0 == 0L)
      val r1 = SampleOps.readShardedCommit(spark, out)
      assert(r1.count() == 40)
      assert(r1.agg(sum("n_tokens")).head().getLong(0) ==
        m1rows.map(_.getLong(3)).sum)
      val mfBytes = java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json"))

      // SIMULATED CRASH between shard write and manifest PUT: a c1
      // commit dir full of data exists, but the manifest was never
      // replaced — the old corpus must read back exactly, because the
      // reader resolves through the manifest, never by listing
      val orphan = new java.io.File(out, "data/c1/shard_id=99")
      corpus.limit(3)
        .select(col("doc_id").as("seq_key"),
          col("n_chars").cast("long").as("n_tokens"), col("text"))
        .write.parquet(orphan.getPath)
      assert(SampleOps.readShardedCommit(spark, out).count() == 40)
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(out, "_graft_manifest.json")) == mfBytes)

      // the next successful append sweeps the crashed commit and
      // publishes old + new through one manifest PUT
      val m2 = SampleOps.appendShardedCommit(
        corpus.filter(col("doc_id") >= 400).limit(5), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2).collect()
      assert(!new java.io.File(out, "data/c1/shard_id=99").exists(),
        "crashed commit dir must be swept by the next writer")
      val (gen2, _) = SampleOps.readCommitManifest(spark, out)
      // the crashed c1 never committed, so the append sweeps it and
      // REUSES generation 1 — generation numbers are commit points,
      // not write attempts
      assert(gen2 == 1L)
      assert(SampleOps.readShardedCommit(spark, out).count() == 45)
      // standing shards untouched (same paths, same stats), fresh ones
      // in the new commit dir with ids past the standing range
      val oldIds = m1rows.map(_.getLong(0)).toSet
      assert(m2.filter(r => oldIds(r.getLong(0)))
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
        m1rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq)
      assert(m2.filter(r => !oldIds(r.getLong(0)))
        .forall(r => r.getString(1).startsWith("data/c1/shard_id=") &&
          r.getLong(0) > oldIds.max))
      // single-writer lock refuses a second concurrent writer
      new java.io.File(out, "_graft_commit.lock").createNewFile()
      val e = intercept[IllegalArgumentException] {
        SampleOps.appendShardedCommit(corpus.limit(2), col("doc_id"),
          "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      }
      assert(e.getMessage.contains("single-writer"))
      new java.io.File(out, "_graft_commit.lock").delete()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest-as-commit: a replace write moves the generation and sweeps prior commits after the PUT") {
    val dir = java.nio.file.Files.createTempDirectory("graft_commit2").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      SampleOps.writeShardedCommit(corpus.limit(20), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      SampleOps.writeShardedCommit(corpus.limit(30), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      val (gen, mf) = SampleOps.readCommitManifest(spark, out)
      assert(gen == 1L)
      assert(mf.collect().forall(_.getString(1).startsWith("data/c1/")))
      assert(!new java.io.File(out, "data/c0").exists(),
        "prior commit swept after the PUT")
      assert(SampleOps.readShardedCommit(spark, out).count() == 30)
      // rebuild determinism: same content -> byte-identical shard lists
      // across protocols (commit mode vs rename mode share assignShards)
      val renameOut = new java.io.File(dir, "rename").getPath
      val mRename = SampleOps.writeSharded(corpus.limit(30), col("doc_id"),
        "n_chars", "text", renameOut, targetTokens = 3000L, buckets = 2)
      val a = mf.select("shard_id", "n_seqs", "n_tokens").collect().toSeq
      val b = mRename.select("shard_id", "n_seqs", "n_tokens").collect().toSeq
      assert(a == b)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest-as-commit: a lost manifest with standing data REFUSES the sweep instead of deleting live commits") {
    val dir = java.nio.file.Files.createTempDirectory("graft_commit3").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      SampleOps.writeShardedCommit(corpus.limit(20), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      // simulate the manifest-lost state (object-store delete+rename
      // crash window, or operator error): data/c0 is LIVE but no
      // manifest references it — indistinguishable from a gen-0 crash
      // by the fs alone, so the next writer must NOT silently treat it
      // as orphaned and delete it
      val mf = new java.io.File(out, "_graft_manifest.json")
      assert(mf.delete())
      val e = intercept[IllegalArgumentException] {
        SampleOps.writeShardedCommit(corpus.limit(30), col("doc_id"),
          "n_chars", "text", out, targetTokens = 3000L, buckets = 2)
      }
      assert(e.getMessage.contains("Refusing to sweep") &&
        e.getMessage.contains("c0"))
      assert(new java.io.File(out, "data/c0").exists(),
        "refusal must leave the standing data untouched")
      // the explicit orphan assertion unlocks the sweep and rebuilds
      // from generation 0
      val m = SampleOps.writeShardedCommit(corpus.limit(30), col("doc_id"),
        "n_chars", "text", out, targetTokens = 3000L, buckets = 2,
        assumeCrashedOrphans = true)
      assert(m.collect().forall(_.getString(1).startsWith("data/c0/")))
      assert(SampleOps.readShardedCommit(spark, out).count() == 30)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("specials sidecar: registry pinned beside the vocab; extended merges stay resolvable through THEIR corpus's sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_specials").toFile
    try {
      val out = new java.io.File(dir, "corpus").getPath
      val (_, vocab) = SampleOps.materializeTrainingCorpus(
        corpus, "doc_id", "text", out, seqLen = 128,
        targetTokens = 3000L, buckets = 4)
      val sp = spark.read.parquet(out + "/_graft_specials.parquet")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      // every registry entry present; sparse ids are the live registry's
      assert(sp.keySet == TextOps.SpecialTokenNames.toSet)
      TextOps.bpeSpecialIds().foreach { case (n, id) =>
        assert(sp(n)._1 == id, s"specials sidecar sparse id for $n")
      }
      // the EOS resolves to the SAME dense id the packed stream uses
      assert(sp("eos")._2.contains(TextOps.denseId(vocab, TextOps.bpeEosId())))
      // a text-only corpus never observes the image placeholder
      assert(sp("image")._2.isEmpty)

      // rebuild under an EXTENDED merges table: the live registry block
      // moves, and the new corpus's sidecar records the MOVED ids — each
      // corpus resolves its specials through its own sidecar, never the
      // live registry
      val ext = TextOps.DefaultBpeMerges :+ ("qq", "zz")
      val out2 = new java.io.File(dir, "corpus2").getPath
      val (_, vocab2) = SampleOps.materializeTrainingCorpus(
        corpus, "doc_id", "text", out2, seqLen = 128,
        targetTokens = 3000L, buckets = 4, merges = ext)
      val sp2 = spark.read.parquet(out2 + "/_graft_specials.parquet")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(sp2("eos")._1 == TextOps.bpeEosId(ext))
      assert(sp2("eos")._1 == sp("eos")._1 + 1)
      assert(sp2("eos")._2.contains(
        TextOps.denseId(vocab2, TextOps.bpeEosId(ext))))
      // resolving the first corpus through ITS sidecar still works: the
      // recorded dense EOS splits its stream into exactly the doc count
      val eosDense = sp("eos")._2.get
      val nDocs = graft.ops.DedupOps.exactDedup(
        TextOps.qualityFilter(corpus, "text"), "doc_id", "text").count()
      val nSeps = spark.read.parquet(out)
        .select(explode(col("text")).as("id"))
        .filter(col("id") === eosDense).count()
      assert(nSeps == nDocs)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("manifest scale guard: shard counts past maxManifestShards refuse with sizing guidance") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toFile
    val out = new java.io.File(dir, "corpus").getPath
    try {
      val e = intercept[IllegalArgumentException] {
        SampleOps.writeSharded(corpus.limit(40), col("doc_id"), "n_chars",
          "text", out, targetTokens = 100L, buckets = 2, maxManifestShards = 3L)
      }
      assert(e.getMessage.contains("driver-safe manifest bound") &&
        e.getMessage.contains("targetTokens"))
      // the refusal fired BEFORE the staged corpus write (the pre-write
      // half of the gate): no staging dir was ever created
      assert(!new java.io.File(out + "__staging").exists())
      // a passing write, then an append that would push past the bound
      SampleOps.writeSharded(corpus.limit(40), col("doc_id"), "n_chars",
        "text", out, targetTokens = 3000L, buckets = 2)
      val a = intercept[IllegalArgumentException] {
        SampleOps.appendSharded(corpus.filter(col("doc_id") >= 400).limit(40),
          col("doc_id"), "n_chars", "text", out, targetTokens = 100L,
          buckets = 2, maxManifestShards = 5L)
      }
      assert(a.getMessage.contains("driver-safe manifest bound"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  // ------------------------------------------------------------------
  // annealed mixture schedule
  // ------------------------------------------------------------------

  test("mixtureRates budget cap: thresholds re-price to min(feasible, budget); 0 = uncapped") {
    // en = 1200 tokens (2x600), de = 600; weights 500/500 ->
    // feasible T_out = min(1200*1000/500, 600*1000/500) = 1200.
    // budget 800 binds: en thr = ((800*500)//1000)*1e6//1200 = 333333,
    // de thr = 400*1e6//600 = 666666.
    val df = Seq((0L, "en", 600L), (1L, "en", 600L), (2L, "de", 600L))
      .toDF("id", "g", "tok")
    val w = Map("en" -> 500L, "de" -> 500L)
    def rates(b: Long) = SampleOps.mixtureRates(df, "g", "tok", w, b)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rates(800L) == Map("en" -> 333333L, "de" -> 666666L))
    // a budget at/above feasible changes nothing; 0 = uncapped
    assert(rates(0L) == rates(5000L))
    assert(rates(0L) == Map("en" -> 500000L, "de" -> 1000000L))
  }

  test("mixtureSchedule: phase tags, salted independent draws, per-phase determinism") {
    val phases = Seq(
      SampleOps.MixturePhase("warmup", Map("en" -> 500L, "zh" -> 300L, "de" -> 200L)),
      SampleOps.MixturePhase("anneal", Map("en" -> 400L, "de" -> 600L),
        budgetTokens = 30000L))
    val out = SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"),
      "n_chars", phases)
    val byPhase = out.groupBy("phase_ord", "phase").count().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(byPhase.keySet == Set((0L, "warmup"), (1L, "anneal")))
    assert(byPhase.values.forall(_ > 0))
    // anneal phase never selects a language outside its weight table
    assert(out.filter(col("phase") === "anneal")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("en", "de")))
    // each phase's draw is a pure function of (key, phase name): adding
    // a phase in front changes NOTHING about the others' membership
    val shifted = SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"),
      "n_chars", SampleOps.MixturePhase("extra", Map("zh" -> 1L)) +: phases)
    def rows(df: org.apache.spark.sql.DataFrame, phase: String) =
      df.filter(col("phase") === phase).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(rows(out, "warmup") == rows(shifted, "warmup"))
    assert(rows(out, "anneal") == rows(shifted, "anneal"))
    // but ordinals follow schedule position
    assert(shifted.filter(col("phase") === "warmup")
      .select("phase_ord").distinct().head().getLong(0) == 1L)
    // salted hash: the warmup draw differs from the UNSALTED rebalance
    // at identical weights (same expected mass, different members)
    val unsalted = SampleOps.rebalanceToShares(corpus, "lang",
      col("doc_id"), "n_chars", phases(0).targetWeights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows(out, "warmup") != unsalted)
  }

  test("mixtureSchedule budget bounds the realized phase mass (law-of-large-numbers band)") {
    val out = SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"),
      "n_chars", Seq(SampleOps.MixturePhase("a",
        Map("en" -> 500L, "zh" -> 300L, "de" -> 200L), budgetTokens = 30000L)))
    val got = out.agg(sum("n_chars")).head().getLong(0)
    // hash-membership realization: generous band around the 30k target
    assert(got > 15000L && got < 45000L, s"realized $got")
  }

  test("mixtureSchedule refuses empty, duplicate-name, and empty-name schedules") {
    val w = Map("en" -> 1L)
    intercept[IllegalArgumentException] {
      SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"), "n_chars", Nil)
    }
    intercept[IllegalArgumentException] {
      SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"), "n_chars",
        Seq(SampleOps.MixturePhase("p", w), SampleOps.MixturePhase("p", w)))
    }
    intercept[IllegalArgumentException] {
      SampleOps.mixtureSchedule(corpus, "lang", col("doc_id"), "n_chars",
        Seq(SampleOps.MixturePhase("", w)))
    }
  }
}
