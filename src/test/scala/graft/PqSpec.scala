package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SimilarityOps}

/** Product-quantization (PQ / IVF-PQ) similarity search. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val em = "/root/testdata/sf0.001/embeddings.parquet"

  // dim=3 toy corpus: m=3 one-dim subspaces with the WHOLE corpus as
  // the codebook sample makes sub-quantization lossless (every
  // subvector is its own centroid), so PQ must reproduce brute-force
  // exactly — the degradation-from-exact anchor.
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("pqCodebookFromRows: dense ids, one row per (subspace, centroid), right widths") {
    val cb = SimilarityOps.pqCodebookFromRows(
      spark.read.parquet(em).filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val rows = cb.collect()
    assert(rows.length == 8 * 8)
    assert(rows.map(_.getInt(0)).distinct.sorted.toSeq == (0 until 8))
    assert(rows.map(_.getLong(1)).distinct.sorted.toSeq == (0L until 8L))
    assert(rows.forall(_.getSeq[Long](2).length == 8)) // dsub = 64/8
    // folding validates density and width agreement
    val folded = SimilarityOps.foldPqCodebook(cb)
    assert(folded.m == 8 && folded.dsub == 8)
  }

  test("foldPqCodebook refuses gapped cent_id (codes index the LUT by position)") {
    val cb = SimilarityOps.pqCodebookFromRows(
      spark.read.parquet(em).filter(col("vec_id") < 4), "vec_id", "embedding", m = 4)
    val gapped = cb.withColumn("cent_id",
      when(col("cent_id") === 2L, lit(7L)).otherwise(col("cent_id")))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.foldPqCodebook(gapped)
    }
    assert(e.getMessage.contains("dense"))
  }

  test("pqEncode: sampled rows encode to their own centroids; map-only determinism across partitionings") {
    val rows = spark.read.parquet(em)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val codes = SimilarityOps.pqEncode(rows, "vec_id", "embedding", cb)
    // a sampled row's unit subvector is distance-0 from its own centroid
    val self = codes.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("code")).collect()
    assert(self.forall(r => r.getSeq[Int](1).forall(_ == r.getLong(0).toInt)))
    // pure content function: bit-identical under a different layout
    val re = SimilarityOps.pqEncode(rows.repartition(7), "vec_id", "embedding", cb)
    assert(codes.exceptAll(re).isEmpty && re.exceptAll(codes).isEmpty)
  }

  test("lossless sub-codebooks: PQ top-k reproduces brute force exactly") {
    val cb = SimilarityOps.pqCodebookFromRows(vecs, "vec_id", "embedding", m = 3)
    val pq = SimilarityOps.pqTopK(vecs.filter(col("vec_id") === 0), vecs,
      cb, "vec_id", "embedding", k = 4).orderBy("rk").collect()
    val bf = SimilarityOps.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs,
      "vec_id", "embedding", k = 4).orderBy("rk").collect()
    assert(pq.map(_.getLong(1)).toSeq == bf.map(_.getLong(1)).toSeq)
    // adc_cos ≈ cos within the unit-requantization grid (1e-4 per element)
    pq.zip(bf).foreach { case (p, b) =>
      assert(math.abs(p.getDouble(2) - b.getDouble(2)) < 1e-3,
        s"adc_cos ${p.getDouble(2)} vs cos ${b.getDouble(2)}")
    }
  }

  test("ivfPqTopK with every cell probed equals flat ADC") {
    val rows = spark.read.parquet(em).filter(col("vec_id") < 100)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val cents = rows.filter(col("vec_id") < 4)
    val flat = SimilarityOps.pqTopK(rows.filter(col("vec_id") < 5), rows,
      cb, "vec_id", "embedding", k = 3)
    val ivf = SimilarityOps.ivfPqTopK(rows.filter(col("vec_id") < 5), rows,
      cents, cb, "vec_id", "embedding", k = 3, nprobe = 4, residual = false)
    assert(flat.exceptAll(ivf).isEmpty && ivf.exceptAll(flat).isEmpty)
  }

  test("zero-norm vectors: encode defined, ADC scores them 0, ranked last") {
    val withZero = vecs.union(Seq((5L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val cb = SimilarityOps.pqCodebookFromRows(vecs, "vec_id", "embedding", m = 3)
    val got = SimilarityOps.pqTopK(withZero.filter(col("vec_id") === 0), withZero,
      cb, "vec_id", "embedding", k = 5).orderBy("rk").collect()
    val zeroRow = got.find(_.getLong(1) == 5L).get
    assert(zeroRow.getDouble(2) == 0.0)
    // ranked below every positive-cosine neighbor
    assert(got.filter(_.getDouble(2) > 0).forall(_.getLong(3) < zeroRow.getLong(3)))
  }

  test("dimension mismatch fails loudly, not by silent prefix-dot") {
    val cb = SimilarityOps.pqCodebookFromRows(vecs, "vec_id", "embedding", m = 3)
    val short = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      SimilarityOps.pqEncode(short, "vec_id", "embedding", cb).collect()
    }
    assert(e.getMessage.contains("dimension") || e.getCause != null)
  }

  test("recall scorecard: code bits buy recall, exact rerank repairs shortlist rank noise") {
    // The fixture's synthetic embeddings are near-random — PQ's WORST
    // case (neighbor margins sit at noise scale, so sub-codebook
    // distortion swamps them; real low-intrinsic-dimension embeddings
    // quantize far better). The floors below are measured-on-fixture
    // with margin; the STRUCTURAL claims are the monotone ones: more
    // code bits → more recall, and ADC-shortlist + exact rerank →
    // recall ≈ the shortlist's candidate recall.
    val rows = spark.read.parquet(em)
    val queries = rows.filter(col("vec_id") < 20)
    val exact = SimilarityOps.bruteForceTopK(queries, rows, "vec_id", "embedding", k = 5)
      .select(col("q_id").as("id_a"), col("c_id").as("id_b"))
    def recallOf(approx0: org.apache.spark.sql.DataFrame): Double = {
      val approx = approx0.select(col("q_id").as("id_a"), col("c_id").as("id_b"))
      DedupOps.pairRecall(exact, approx).head().getAs[Double]("recall")
    }
    val cb64 = SimilarityOps.trainPqCodebook(rows, "vec_id", "embedding", m = 8, ksub = 4)
    val cb80 = SimilarityOps.trainPqCodebook(rows, "vec_id", "embedding", m = 16, ksub = 32)
    val adcSmall = recallOf(SimilarityOps.pqTopK(queries, rows, cb64, "vec_id", "embedding", k = 5))
    val adcBig = recallOf(SimilarityOps.pqTopK(queries, rows, cb80, "vec_id", "embedding", k = 5))
    info(s"ADC recall@5: 16-bit codes $adcSmall, 80-bit codes $adcBig")
    assert(adcBig > adcSmall, s"more code bits must buy recall: $adcSmall -> $adcBig")
    assert(adcBig > 0.35, s"80-bit trained ADC recall@5 $adcBig (measured 0.46)")
    val cbMid = SimilarityOps.trainPqCodebook(rows, "vec_id", "embedding", m = 8, ksub = 32)
    val adcMid = recallOf(SimilarityOps.pqTopK(queries, rows, cbMid, "vec_id", "embedding", k = 5))
    val reranked = recallOf(SimilarityOps.pqTopKRerank(queries, rows, cbMid,
      "vec_id", "embedding", k = 5, cands = 50))
    info(s"m=8 ksub=32: ADC-only $adcMid, rerank(cands=50) $reranked")
    assert(reranked > adcMid, s"rerank must improve on ADC-only: $adcMid -> $reranked")
    assert(reranked > 0.7, s"reranked recall@5 $reranked (measured 0.83)")
  }

  test("pqTopKRerank emits exact cosines for the rows it keeps") {
    // rerank output must be directly comparable to bruteForceTopK: for
    // every (q, c) it returns, the cos must equal the exact pairwise one
    val rows = spark.read.parquet(em).filter(col("vec_id") < 60)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val got = SimilarityOps.pqTopKRerank(rows.filter(col("vec_id") < 3), rows,
      cb, "vec_id", "embedding", k = 3, cands = 10)
    val exact = SimilarityOps.bruteForceTopK(rows.filter(col("vec_id") < 3), rows,
      "vec_id", "embedding", k = 60)
    val joined = got.select(col("q_id"), col("c_id"), col("cos").as("got_cos"))
      .join(exact.select(col("q_id"), col("c_id"), col("cos").as("exact_cos")),
        Seq("q_id", "c_id"))
    assert(joined.count() == 9)
    assert(joined.filter(col("got_cos") =!= col("exact_cos")).isEmpty)
  }

  test("residual IVFADC: trained residual codes match-or-beat raw codes at equal size; standing index identical to one-shot") {
    val rows = spark.read.parquet(em)
    val queries = rows.filter(col("vec_id") < 20)
    val cents = SimilarityOps.trainCentroids(rows, "vec_id", "embedding", k = 8)
    val rawcb = SimilarityOps.trainPqCodebook(rows, "vec_id", "embedding",
      m = 8, ksub = 32)
    val rescb = SimilarityOps.trainPqResidualCodebook(rows, cents,
      "vec_id", "embedding", m = 8, ksub = 32)
    val exact = SimilarityOps.bruteForceTopK(queries, rows,
        "vec_id", "embedding", k = 5)
      .select(col("q_id").as("id_a"), col("c_id").as("id_b"))
    def recallOf(cb: org.apache.spark.sql.DataFrame, residual: Boolean) =
      DedupOps.pairRecall(exact,
        SimilarityOps.ivfPqTopK(queries, rows, cents, cb,
            "vec_id", "embedding", k = 5, nprobe = 8, residual = residual)
          .select(col("q_id").as("id_a"), col("c_id").as("id_b")))
        .head().getAs[Double]("recall")
    val res = recallOf(rescb, residual = true)
    val raw = recallOf(rawcb, residual = false)
    info(s"equal 64-bit codes, every cell probed: residual $res vs raw $raw")
    // measured on the near-random fixture (PQ's worst case): the
    // residual path must at least hold the line at equal code size —
    // on clustered real embeddings the gap widens with coarse locality
    assert(res >= raw - 1e-9, s"residual $res must not lose to raw $raw")
    assert(res > 0.15, s"trained residual recall@5 $res (measured 0.25 " +
      "on the fixture; floor with margin)")
    // standing residual index answers identically to the one-shot op
    val dir = "/tmp/graft_test_respq_index"
    SimilarityOps.ivfPqIndex(rows, cents, rescb, "vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val fromIx = SimilarityOps.ivfPqTopKFromIndex(queries,
      spark.read.parquet(dir), cents, rescb, "vec_id", "embedding",
      k = 5, nprobe = 2)
    val oneShot = SimilarityOps.ivfPqTopK(queries, rows, cents, rescb,
      "vec_id", "embedding", k = 5, nprobe = 2)
    assert(fromIx.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fromIx).isEmpty)
  }

  test("OPQ permutation: balanced variance allocation buys recall on skewed dims; orthogonality is exact") {
    // fixture with ALL the signal in dims 0..3 (one natural subspace):
    // plain m=4 grouping burns three subspaces on noise while subspace
    // 0's ksub codewords saturate; the balanced permutation spreads the
    // signal dims one per subspace
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val sig = Array.fill(4)(rnd.nextGaussian().toFloat)
      val noise = Array.fill(12)(0.01f * rnd.nextGaussian().toFloat)
      (i.toLong, sig ++ noise)
    }.toDF("vec_id", "embedding")
    val perm = SimilarityOps.pqBalancedPermutation(rows, "embedding", m = 4)
    // each subspace gets exactly one high-variance dim (0..3)
    val groups = perm.grouped(4).toSeq
    assert(groups.forall(g => g.count(_ < 4) == 1), s"unbalanced: $groups")
    val permuted = rows.select(col("vec_id"),
      SimilarityOps.permuteVec(col("embedding"), perm).as("embedding"))
    // permutation preserves exact cosine structure (orthogonal transform)
    val q = rows.filter(col("vec_id") < 10)
    val qp = permuted.filter(col("vec_id") < 10)
    val bf = SimilarityOps.bruteForceTopK(q, rows, "vec_id", "embedding", k = 5)
    val bfp = SimilarityOps.bruteForceTopK(qp, permuted, "vec_id", "embedding", k = 5)
    assert(bf.exceptAll(bfp).isEmpty && bfp.exceptAll(bf).isEmpty)
    // recall at equal code size: permuted codes must win on this fixture
    val exact = bf.select(col("q_id").as("id_a"), col("c_id").as("id_b"))
    def recallOf(corpus: org.apache.spark.sql.DataFrame): Double = {
      val cb = SimilarityOps.trainPqCodebook(corpus, "vec_id", "embedding",
        m = 4, ksub = 8)
      val qs = corpus.filter(col("vec_id") < 10)
      DedupOps.pairRecall(exact,
        SimilarityOps.pqTopK(qs, corpus, cb, "vec_id", "embedding", k = 5)
          .select(col("q_id").as("id_a"), col("c_id").as("id_b")))
        .head().getAs[Double]("recall")
    }
    val plain = recallOf(rows)
    val opq = recallOf(permuted)
    info(s"equal 12-bit codes on skewed dims: permuted $opq vs plain $plain")
    assert(opq > plain, s"balanced permutation must buy recall here: " +
      s"plain $plain -> permuted $opq")
  }

  test("trainPqCodebook output passes codebook validation and compresses dim/m-fold") {
    val rows = spark.read.parquet(em)
    val cb = SimilarityOps.trainPqCodebook(rows, "vec_id", "embedding", m = 8, ksub = 4)
    val folded = SimilarityOps.foldPqCodebook(cb)
    assert(folded.m == 8 && folded.dsub == 8)
    val codes = SimilarityOps.pqEncode(rows, "vec_id", "embedding", cb)
    val r = codes.head()
    assert(r.getSeq[Int](1).length == 8) // 8 ints vs 64 floats stored
  }

  test("unit-quantize kernel is bit-identical to the composed transform|>quantize form") {
    // the oracle SQL replays the COMPOSED form; the kernel must match it
    // exactly on real data including near-tie rounding territory
    val rows = spark.read.parquet(em)
    val composed = rows.select(col("vec_id"),
      SimilarityOps.quantize(col("embedding")).as("vq"))
      .select(col("vec_id"), SimilarityOps.quantize(transform(col("vq"), x =>
        when(graft.functions.exprs.dotLong(col("vq"), col("vq")) > 0L,
          x.cast("double") / sqrt(graft.functions.exprs.dotLong(col("vq"), col("vq")).cast("double")))
          .otherwise(lit(0.0)))).as("u"))
    val kernel = rows.select(col("vec_id"),
      graft.functions.exprs.unitQuantize(SimilarityOps.quantize(col("embedding"))).as("u"))
    assert(kernel.exceptAll(composed).isEmpty && composed.exceptAll(kernel).isEmpty)
    // zero-norm → all-zero unit vector
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(graft.functions.exprs.unitQuantize(SimilarityOps.quantize(col("v"))))
      .head().getSeq[Long](0)
    assert(z == Seq(0L, 0L))
    // Σx² long overflow (element ≥ ~3e9 post-quantization — a vector
    // quantized at a wildly wrong scale) fails LOUDLY instead of
    // silently emitting an all-zero / mis-normalized unit vector
    val big = Seq(Tuple1(Array(4e5f, 1.0f))).toDF("v")
    val e = intercept[Exception] {
      big.select(graft.functions.exprs.unitQuantize(
        SimilarityOps.quantize(col("v")))).collect()
    }
    assert(e.getMessage.contains("overflow") ||
      Option(e.getCause).exists(_.getMessage.contains("overflow")))
  }

  test("ivfPqIndex: parquet-roundtripped standing index answers identically to the one-shot op") {
    val rows = spark.read.parquet(em).filter(col("vec_id") < 200)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val cents = rows.filter(col("vec_id") < 8)
    val dir = "/tmp/graft_test_pq_index"
    SimilarityOps.ivfPqIndex(rows, cents, cb, "vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fromIx = SimilarityOps.ivfPqTopKFromIndex(
      rows.filter(col("vec_id") < 5), stored, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 2)
    val oneShot = SimilarityOps.ivfPqTopK(rows.filter(col("vec_id") < 5), rows,
      cents, cb, "vec_id", "embedding", k = 3, nprobe = 2)
    assert(fromIx.exceptAll(oneShot).isEmpty && oneShot.exceptAll(fromIx).isEmpty)
  }

  test("ivfPqTopKFromIndex refuses an index whose residual stamp mismatches the dial") {
    val rows = spark.read.parquet(em).filter(col("vec_id") < 64)
    val cents = rows.filter(col("vec_id") < 4)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val queries = rows.filter(col("vec_id") < 3)
    // raw-code index queried as residual (the silent-mis-scoring path
    // the stamp closes: residual scoring would add the centroid base
    // to whole-vector codes) — must refuse, including through a
    // parquet round trip (column metadata survives the footer)
    val rawIx = SimilarityOps.ivfPqIndex(rows, cents, cb,
      "vec_id", "embedding", residual = false)
    val dir = "/tmp/graft_test_pq_stamp"
    rawIx.write.mode("overwrite").parquet(dir)
    for (ix <- Seq(rawIx, spark.read.parquet(dir))) {
      val e = intercept[IllegalArgumentException] {
        SimilarityOps.ivfPqTopKFromIndex(queries, ix, cents, cb,
          "vec_id", "embedding", k = 3, nprobe = 2, residual = true)
      }
      assert(e.getMessage.contains("graft_pq_residual=false"))
    }
    // residual index queried as raw — refuses the other way
    val resIx = SimilarityOps.ivfPqIndex(rows, cents, cb,
      "vec_id", "embedding", residual = true)
    val e2 = intercept[IllegalArgumentException] {
      SimilarityOps.ivfPqTopKFromIndex(queries, resIx, cents, cb,
        "vec_id", "embedding", k = 3, nprobe = 2, residual = false)
    }
    assert(e2.getMessage.contains("graft_pq_residual=true"))
    // an UNSTAMPED index (pre-stamp layout / hand-built) is only
    // accepted as raw: under residual=true (the default) it refuses
    val unstamped = rawIx.select(col("vec_id"), col("cluster"),
      col("code").as("code",
        org.apache.spark.sql.types.Metadata.empty)) // stripped stamp
    assert(!unstamped.schema("code").metadata
      .contains(SimilarityOps.ResidualStampKey))
    val e3 = intercept[IllegalArgumentException] {
      SimilarityOps.ivfPqTopKFromIndex(queries, unstamped, cents, cb,
        "vec_id", "embedding", k = 3, nprobe = 2)
    }
    assert(e3.getMessage.contains("no graft_pq_residual stamp"))
    // …and answers identically to the stamped raw index as raw
    val a = SimilarityOps.ivfPqTopKFromIndex(queries, unstamped, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 2, residual = false)
    val b = SimilarityOps.ivfPqTopKFromIndex(queries, rawIx, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 2, residual = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("appendPqIndex: append equals rebuild, standing rows never re-encode, drift/dup/empty guards refuse") {
    val rows = spark.read.parquet(em).filter(col("vec_id") < 96)
    val a = rows.filter(col("vec_id") < 64)
    val b = rows.filter(col("vec_id") >= 64)
    val cents = rows.filter(col("vec_id") < 4)
    val cb = SimilarityOps.pqCodebookFromRows(
      rows.filter(col("vec_id") < 8), "vec_id", "embedding", m = 8)
    val dir = "/tmp/graft_test_pq_append"
    SimilarityOps.ivfPqIndex(a, cents, cb, "vec_id", "embedding")
      .write.mode("overwrite").parquet(dir)
    val standing = spark.read.parquet(dir)
    val appended = SimilarityOps.appendPqIndex(b, standing, cents, cb,
      "vec_id", "embedding")
    // exact encode => append ∪ standing is ROW-IDENTICAL to a rebuild
    val rebuilt = SimilarityOps.ivfPqIndex(rows, cents, cb,
      "vec_id", "embedding")
    assert(appended.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(appended).isEmpty)
    assert(appended.count() == 96)
    // the standing branch of the union is a pure scan: the PQ encode
    // expression (zip_with over the codebook) must not appear in it
    val union = appended.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.head
    val standingSide = union.children.head.toString
    assert(!standingSide.contains("zip_with"),
      s"standing side must not re-encode:\n$standingSide")
    assert(standingSide.contains("parquet"), standingSide)
    // and the appended index queries like any stamped index
    val q = rows.filter(col("vec_id") < 2)
    val topk = SimilarityOps.ivfPqTopKFromIndex(q, appended, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 2)
    assert(topk.count() == 6)
    // duplicate-id refusal: a batch id already standing would shadow it
    val e1 = intercept[IllegalArgumentException] {
      SimilarityOps.appendPqIndex(a.limit(1), standing, cents, cb,
        "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("already exists"))
    // empty-batch refusal
    val e2 = intercept[IllegalArgumentException] {
      SimilarityOps.appendPqIndex(b.limit(0), standing, cents, cb,
        "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("empty"))
    // drift refusal: every batch vector collapsed onto ONE embedding —
    // the occupancy histogram concentrates into a single coarse cell
    val skewed = b.select(col("vec_id")).crossJoin(
      rows.filter(col("vec_id") === 64).select(col("embedding")))
    val e3 = intercept[IllegalArgumentException] {
      SimilarityOps.appendPqIndex(skewed, standing, cents, cb,
        "vec_id", "embedding", minDriftRows = 1L)
    }
    assert(e3.getMessage.contains("exceeds maxPsi"), e3.getMessage)
    // …a wider dial accepts the same batch, and under the DEFAULT
    // minDriftRows this 32-row batch is too small for PSI to mean
    // anything — the guard skips instead of refusing on noise
    assert(SimilarityOps.appendPqIndex(skewed, standing, cents, cb,
      "vec_id", "embedding", maxPsi = 1e6, minDriftRows = 1L).count() == 96)
    assert(SimilarityOps.appendPqIndex(skewed, standing, cents, cb,
      "vec_id", "embedding").count() == 96)
  }

  test("ADC kernel refuses malformed codes instead of mis-scoring") {
    val lut = Seq((Array(Array(1L, 2L)), Array(5))).toDF("lut", "code")
    val e = intercept[Exception] {
      lut.select(graft.functions.exprs.pqAdc(col("lut"), col("code"))).collect()
    }
    assert(e.getMessage != null)
    // a NULL lut entry would read as 0 through getLong — must throw too
    val nullEntry = spark.sql(
      "SELECT array(array(1L, CAST(NULL AS BIGINT))) AS lut, array(1) AS code")
    val e2 = intercept[Exception] {
      nullEntry.select(graft.functions.exprs.pqAdc(col("lut"), col("code"))).collect()
    }
    assert(e2.getMessage != null)
  }
}
