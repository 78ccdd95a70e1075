package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // near 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))) // opposite of 0
    .toDF("vec_id", "embedding")

  test("quantize produces exact integers at 1e-4 resolution") {
    val q = vecs.filter(col("vec_id") === 1)
      .select(SimilarityOps.quantize(col("embedding"))).head().getSeq[Long](0)
    assert(q == Seq(9000L, 1000L, 0L))
  }

  test("dotQ is an exact integer dot product") {
    val d = vecs.filter(col("vec_id") === 0).crossJoin(
        vecs.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(SimilarityOps.dotQ(
        SimilarityOps.quantize(col("embedding")),
        SimilarityOps.quantize(col("e2")))).head().getLong(0)
    assert(d == 10000L * 9000L)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak, self excluded") {
    val got = SimilarityOps.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 4)
      .orderBy("rk").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L)) // cos: .994, 0, 0, -1
    assert(math.abs(got(0).getDouble(2) - 0.9938) < 1e-3)
    assert(got(3).getDouble(2) == -1.0)
  }

  test("embeddingNearDupPairs finds only the close pair") {
    val got = SimilarityOps.embeddingNearDupPairs(vecs, "vec_id", "embedding", minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)))
  }

  test("trainCentroids: seeded KMeans codebook drives ivfTopK") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 4)
    assert(cents.count() == 4)
    assert(cents.head().getSeq[Float](1).length == 64)
    val got = SimilarityOps.ivfTopK(
      em.filter(col("vec_id") < 5), em, cents, "vec_id", "embedding", k = 3)
    assert(got.filter(col("rk") === 1).count() == 5) // every query answered
    // deterministic across runs (seeded)
    val cents2 = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 4)
    assert(cents.orderBy("vec_id").collect().map(_.toString).toSeq ==
      cents2.orderBy("vec_id").collect().map(_.toString).toSeq)
  }

  test("embeddingNearDupPairsIVF: within-cluster pairs only, subset of exact") {
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 2)
    val got = SimilarityOps.embeddingNearDupPairsIVF(
      vecs, centroids, "vec_id", "embedding", minCos = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 0 and 1 share cluster c0 -> the close pair survives bucketing
    assert(got.toSeq == Seq((0L, 1L)))
  }

  test("IVF near-dup recall vs exact baseline on the real embeddings") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = SimilarityOps.embeddingNearDupPairs(em, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 4)
    val ivf = SimilarityOps.embeddingNearDupPairsIVF(em, cents, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // driver plants near-dup embeddings
    assert(ivf.subsetOf(exact)) // within-cluster verify keeps precision 1.0
    val recall = ivf.size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF near-dup recall $recall (${ivf.size}/${exact.size})")
  }

  test("RP-LSH near-dup recall vs exact baseline on the real embeddings") {
    // this corpus's near pairs sit at cos 0.40-0.51, so the query-side
    // low-threshold parameterization (16 bands x 4 bits) applies;
    // theoretical recall at the 0.45 boundary is ~0.95
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = SimilarityOps.embeddingNearDupPairs(em, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rp = SimilarityOps.embeddingNearDupPairsRP(em, "vec_id", "embedding",
        0.45, dim = 64, bands = 16, bitsPerBand = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(rp.subsetOf(exact)) // exact-cosine verify keeps precision 1.0
    val recall = rp.size.toDouble / exact.size
    assert(recall >= 0.7, s"RP-LSH near-dup recall $recall (${rp.size}/${exact.size})")
  }

  test("RP-LSH default (8x8) catches true high-similarity duplicates") {
    // plant exact-direction duplicates (scaled copies, cos = 1): every
    // sign bit agrees, so every band collides — recall 1.0 by
    // construction exercises the full signature->band->verify pipeline
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 100).select("vec_id", "embedding")
    val planted = em.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val rp = SimilarityOps.embeddingNearDupPairsRP(em.unionByName(planted),
        "vec_id", "embedding", minCos = 0.99, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 100L).map(i => (i, i + 100000L)).toSet
    assert(want.subsetOf(rp), s"missing ${(want -- rp).size} planted dup pairs")
  }

  test("crossCorpusEmbeddingNearDups keeps only pairs straddling the corpora") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = SimilarityOps.embeddingNearDupPairsRP(em, "vec_id", "embedding",
        0.45, dim = 64, bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = SimilarityOps.crossCorpusEmbeddingNearDups(
        em.filter(col("vec_id") >= 250), em.filter(col("vec_id") < 250),
        "vec_id", "embedding", 0.45, dim = 64, bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross == all.filter { case (a, b) => (a < 250) != (b < 250) })
    assert(cross.forall { case (a, b) => (a < 250) != (b < 250) })
  }

  test("RP-LSH pair generation is banded equi-join, never all-pairs") {
    val plan = SimilarityOps.embeddingNearDupPairsRP(vecs, "vec_id", "embedding",
        0.9, dim = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("embeddingNearDupPairsIVF pair join is not all-pairs") {
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 2)
    val plan = SimilarityOps.embeddingNearDupPairsIVF(
      vecs, centroids, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    // centroid assignment legitimately broadcasts the tiny codebook; the
    // corpus-vs-corpus pair join must be an equi-join on cluster id
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("q_cluster"), plan.take(2000))
  }

  test("ivfTopK nprobe=K recovers brute-force results; recall rises with nprobe") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = em.filter(col("vec_id") < 20)
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 4)
    val exact = SimilarityOps.bruteForceTopK(queries, em, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(p: Int): Double = {
      val got = SimilarityOps.ivfTopK(queries, em, cents, "vec_id", "embedding", k = 5, nprobe = p)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recallAt(1); val r4 = recallAt(4)
    assert(r4 >= r1, s"recall@nprobe=4 ($r4) < recall@nprobe=1 ($r1)")
    assert(r4 == 1.0, s"probing all 4 clusters must equal brute force, got $r4")
  }

  test("bruteForceTopK supports non-integral id types via the window fallback") {
    // the bounded aggregate carries long values; string ids must keep
    // working (round-3 window semantics), routed through the fallback
    val svecs = vecs.select(concat(lit("d"), col("vec_id")).as("vec_id"), col("embedding"))
    val got = SimilarityOps.bruteForceTopK(
      svecs.filter(col("vec_id") === "d0"), svecs, "vec_id", "embedding", k = 2)
      .orderBy("rk").collect()
    // cos: d1 .994; d2/d3 tie at 0 -> lexicographic id tiebreak keeps d2
    assert(got.map(_.getString(1)).toSeq == Seq("d1", "d2"))
  }

  test("centroid assignment is map-only: no window/sort/shuffle of the side") {
    val side = vecs.select(col("vec_id").as("q_id"),
        SimilarityOps.quantize(col("embedding")).as("q_q"))
      .withColumn("q_n2", SimilarityOps.norm2Q(col("q_q")))
    val cents = vecs.filter(col("vec_id") === 0 || col("vec_id") === 2)
      .select(col("vec_id").as("cent_id"),
        SimilarityOps.quantize(col("embedding")).as("cent_q"))
      .withColumn("cent_n2", SimilarityOps.norm2Q(col("cent_q")))
    val asg = SimilarityOps.assignClusters(cents, side, "q", 2)
    val plan = asg.queryExecution.executedPlan.toString
    // round-3 shape was a row_number window = sort-shuffle of N×K scored
    // rows; the aggregate forms (max_by struct / collect_list) plan as
    // SortAggregate / sort-fallback ObjectHashAggregate. The map-only
    // shape has NONE of those: the only exchange anywhere is the
    // single-partition fold of the tiny codebook inside the scalar
    // subquery — the side itself is scan → project → generate.
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("SortAggregate"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(2000))
    // multi-probe tie semantics preserved: vec 3 ties both centroids
    // (cos 0), probes=2 assigns it to both, lowest centroid first
    val picks = asg.filter(col("q_id") === 3).collect().map(_.getLong(3)).toSeq
    assert(picks == Seq(0L, 2L), picks.toString)
  }

  test("top-k per query is the bounded aggregate, not a ranking window") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val topk = SimilarityOps.bruteForceTopK(
      em.filter(col("vec_id") < 5), em, "vec_id", "embedding", k = 4)
    val plan = topk.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("graft_top_k_by_ord"), plan.take(2000))
    // equivalence against an independent window-ranked reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    val scored = em.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"),
        SimilarityOps.quantize(col("embedding")).as("q_q"))
      .withColumn("q_n2", SimilarityOps.norm2Q(col("q_q")))
      .crossJoin(em.select(col("vec_id").as("c_id"),
          SimilarityOps.quantize(col("embedding")).as("c_q"))
        .withColumn("c_n2", SimilarityOps.norm2Q(col("c_q"))))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", SimilarityOps.cosineFromQ(
        SimilarityOps.dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
    val ref = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 4)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk").cast("long").as("rk"))
      .collect().map(_.toString).sorted.toSeq
    assert(topk.collect().map(_.toString).sorted.toSeq == ref)
  }

  test("ivfTopK searches within the assigned cluster only") {
    val centroids = vecs.filter(col("vec_id") === 0 || col("vec_id") === 2)
    val got = SimilarityOps.ivfTopK(
      vecs.filter(col("vec_id") === 1), vecs, centroids, "vec_id", "embedding", k = 2)
      .collect()
    // query 1 lands in cluster of centroid 0 (cos .99 vs .1). Corpus
    // assignment: 0 -> c0, 1 -> c0, 2 -> c2, 3 -> tie (cos 0 to both,
    // lowest centroid id wins) -> c0, 4 -> c2 (cos -1 vs 0). Cluster of
    // c0 = {0, 1, 3}; self excluded -> neighbors ranked by cos: 0, 3.
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 3L))
  }

  test("semDedup removes planted semantic duplicates, keeps the farthest-from-centroid one") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = em.count()
    // plant a slightly-perturbed semantic copy of vectors 0..9 (re-keyed
    // +100000): tiny deterministic rotation of one coordinate — near-cos-1
    // to the original, so each (orig, copy) is one semantic-duplicate set
    val planted = em.filter(col("vec_id") < 10).select(
      (col("vec_id") + 100000L).as("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(CASE WHEN i = 0 THEN x * CAST(1.02 AS FLOAT) ELSE x END AS FLOAT))")
        .as("embedding"))
    val corpus = em.unionByName(planted)
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 4)
    // recall check on the planted fixture: the IVF pair spine semDedup
    // composes must see every planted (orig, copy) pair — a near-exact
    // copy lands in its original's cluster by construction
    val plantedPairs = (0L until 10L).map(i => (i, i + 100000L)).toSet
    val ivfPairs = SimilarityOps.embeddingNearDupPairsIVF(
      corpus, cents, "vec_id", "embedding", minCos = 0.995)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = SimilarityOps.embeddingNearDupPairs(
      corpus, "vec_id", "embedding", minCos = 0.995)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plantedPairs.subsetOf(exactPairs), "fixture: copies must be near-dups")
    assert(plantedPairs.subsetOf(ivfPairs),
      s"IVF spine missed planted pairs: ${plantedPairs -- ivfPairs}")
    // semDedup: exactly one survivor per planted set; everything
    // non-duplicated survives untouched
    val kept = SimilarityOps.semDedup(corpus, cents, "vec_id", "embedding",
      minCos = 0.995).select("vec_id", "cent_cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // expected survivors = total - (duplicate-set members - sets), from
    // a reference union-find over the exact pair graph (sets can chain)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exactPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = exactPairs.flatMap(p => Seq(p._1, p._2))
    val nSets = members.map(find).size
    assert(kept.size == n + 10 - (members.size - nSets),
      s"expected one survivor per duplicate set, kept ${kept.size} of ${n + 10}")
    plantedPairs.foreach { case (a, b) =>
      assert(kept.contains(a) ^ kept.contains(b),
        s"exactly one of ($a, $b) must survive")
    }
    // the survivor is the set member FARTHEST from its centroid (the
    // SemDeDup diversity rule): its cent_cos is the pair's minimum
    val centCos = SimilarityOps.semDedup(corpus, cents, "vec_id", "embedding",
        minCos = 2.0) // no pairs at cos > 1 -> everything survives, scores intact
      .select("vec_id", "cent_cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    plantedPairs.foreach { case (a, b) =>
      val survivor = if (kept.contains(a)) a else b
      val other = if (survivor == a) b else a
      assert(centCos(survivor) <= centCos(other) ||
        math.abs(centCos(survivor) - centCos(other)) < 1e-12,
        s"survivor $survivor (cos ${centCos(survivor)}) should be no closer " +
          s"to the centroid than $other (cos ${centCos(other)})")
    }
  }

  test("semDedup: empty codebook degrades to the identity, never an empty frame") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val noCents = em.filter(col("vec_id") < 0)
    val kept = SimilarityOps.semDedup(em, noCents, "vec_id", "embedding",
      minCos = 0.995).select("vec_id", "cent_cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every row survives as a singleton with the sentinel diversity score
    assert(kept.size == em.count(), s"empty codebook dropped rows: ${kept.size}")
    assert(kept.values.forall(_ == 1.0))
  }

  test("two-level assignment: nCoarse=1 is bit-identical to flat; real-fixture agreement high") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 8)
    def pairsOf(nCoarse: Int, coarseProbes: Int = 2) =
      SimilarityOps.embeddingNearDupPairsIVF(em, cents, "vec_id", "embedding",
          minCos = 0.45, probes = 2, nCoarse = nCoarse, coarseProbes = coarseProbes)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = pairsOf(0)
    // one coarse group probing the whole codebook == the flat argmax,
    // bit-identical output (exact-equivalence anchor for the approximation)
    assert(pairsOf(1, 1) == flat)
    // real two-level config: precision stays 1 (cosine verify), recall
    // vs the flat spine stays high on the real fixture
    val two = pairsOf(3, 2)
    val exact = SimilarityOps.embeddingNearDupPairs(em, "vec_id", "embedding", 0.45)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(two.subsetOf(exact), "two-level pairs must stay cosine-verified true pairs")
    // k=8 under 3 coarse groups probing 2 covers ~2/3 of the codebook —
    // the tiny fixture is the PESSIMISTIC end of the canopy trade (at
    // production shape, k=800/nCoarse=28, the coarse and fine argmax
    // correlate and measured recall is higher; BASELINE round-11).
    // 0.857 was the round-11 STRIDE-sampled coarse level's recall here;
    // the trained (unit-sphere KMeans) coarse level must never fall
    // below the untrained baseline it replaced
    val recall = two.size.toDouble / math.max(flat.size, 1)
    assert(recall >= 0.857, s"two-level recall vs flat spine fell to $recall " +
      "(round-11 stride baseline: 0.857)")
    // semDedup through the two-level path keeps the planted-dup contract
    val keptFlat = SimilarityOps.semDedup(em, cents, "vec_id", "embedding", 0.45)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val keptTwo = SimilarityOps.semDedup(em, cents, "vec_id", "embedding", 0.45,
        nCoarse = 3, coarseProbes = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val agree = keptFlat.intersect(keptTwo).size.toDouble /
      math.max(keptFlat.size, 1)
    assert(agree >= 0.9, s"two-level semDedup survivor agreement fell to $agree")
  }

  test("trained coarse codebook is a pure content function: survivors stable across centroid partitionings") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 8)
    def survivors(c: org.apache.spark.sql.DataFrame) =
      SimilarityOps.semDedup(em, c, "vec_id", "embedding", minCos = 0.45,
          probes = 2, nCoarse = 3, coarseProbes = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    // the coarse KMeans trains on a content-pinned single-partition
    // layout, so re-partitioning the CENTROID frame must not change the
    // coarse centers — and therefore not the semDedup survivor corpus
    assert(survivors(cents.repartition(7)) == survivors(cents),
      "coarse codebook leaked centroid partitioning into the survivor set")
  }

  test("twoLevelCodebook: every coarse group is member-bearing; members cover the whole codebook") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 9)
    val cents = base.select(col("vec_id").as("cent_id"),
        SimilarityOps.quantize(col("embedding")).as("cent_q"))
      .withColumn("cent_n2", SimilarityOps.norm2Q(col("cent_q")))
    val allIds = cents.select("cent_id").collect().map(_.getLong(0)).toSet
    for (n <- Seq(1, 2, 3, 5, 9, 12)) {
      val cb = SimilarityOps.twoLevelCodebook(cents, n)
      val coarseIds = cb.coarse.select("g_id").collect().map(_.getLong(0)).toSet
      val groupIds = cb.grouped.select("gid").collect().map(_.getLong(0)).toSet
      // a trained center no fine centroid ranks nearest would strand
      // rows behind an empty group — the coarse level must carry
      // member-bearing groups ONLY, and every centroid must appear
      assert(coarseIds == groupIds, s"nCoarse=$n: empty coarse groups ${coarseIds -- groupIds}")
      val memberIds = cb.grouped.select(explode(col("members")).as("m"))
        .select("m.cent_id").collect().map(_.getLong(0)).toSet
      assert(memberIds == allIds, s"nCoarse=$n: members lost ${allIds -- memberIds}")
    }
  }

  test("nCoarse auto-selection: flat below the threshold, ceil(sqrt(2K)) above, explicit wins") {
    import SimilarityOps.{resolveNCoarse, AutoCoarse, TwoLevelAutoThreshold}
    // the selection rule, pinned: small codebooks keep the EXACT flat
    // argmax (fixture-scale results byte-identical to the flat era);
    // past the threshold the cost minimum nCoarse = ceil(sqrt(2K))
    assert(TwoLevelAutoThreshold == 256)
    assert(resolveNCoarse(AutoCoarse, 255L) == 0)
    assert(resolveNCoarse(AutoCoarse, 256L) == 23) // ceil(sqrt(512))
    assert(resolveNCoarse(AutoCoarse, 800L) == 40) // the 200k/k=800 stress point
    assert(resolveNCoarse(0, 100000L) == 0)  // flat opt-out at any K
    assert(resolveNCoarse(7, 100000L) == 7)  // explicit two-level wins
    intercept[IllegalArgumentException](resolveNCoarse(-2, 10L))
    // behavioral anchor: the auto default IS flat at fixture scale
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = SimilarityOps.trainCentroids(em, "vec_id", "embedding", k = 8)
    val auto = SimilarityOps.embeddingNearDupPairsIVF(
        em, cents, "vec_id", "embedding", minCos = 0.45)
      .collect().map(_.toString).sorted.toSeq
    val flat = SimilarityOps.embeddingNearDupPairsIVF(
        em, cents, "vec_id", "embedding", minCos = 0.45, nCoarse = 0)
      .collect().map(_.toString).sorted.toSeq
    assert(auto == flat)
  }

  test("autoBitsPerBand: analytic corpus-sized width, floored at 8, capped at 62") {
    import SimilarityOps.autoBitsPerBand
    // the round-11 1M stress point: the formula lands on the
    // measured-good 16-bit retune (BASELINE.md round-11 stress rows)
    assert(autoBitsPerBand(1000000L, 8) == 16)
    // test-scale corpora keep the historical 8-bit width — every
    // pre-round-12 small-scale result is byte-identical under AutoBits
    assert(autoBitsPerBand(600L, 8) == 8)
    assert(autoBitsPerBand(0L, 8) == 8)
    // monotone in N, and in bands at fixed N
    val widths = Seq(1L, 1000L, 100000L, 1000000L, 100000000L)
      .map(autoBitsPerBand(_, 8))
    assert(widths == widths.sorted, widths.toString)
    assert(autoBitsPerBand(1000000L, 16) >= autoBitsPerBand(1000000L, 8))
    // capped at the 62-bit long-key limit
    assert(autoBitsPerBand(Long.MaxValue, 8, targetBucket = 1) == 62)
  }

  test("AutoBits default resolves to the historical width at test scale — keys unchanged") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 100).select("vec_id", "embedding")
    val auto = SimilarityOps.rpSignatures(em, "vec_id", "embedding", dim = 64)
    assert(SimilarityOps.rpParamsOf(auto).contains(
      SimilarityOps.RpParams(8, 8, 42L, 64)))
    val legacy = SimilarityOps.rpSignatures(em, "vec_id", "embedding",
      dim = 64, bands = 8, bitsPerBand = 8)
    assert(auto.orderBy("vec_id").collect().map(_.toString).toSeq ==
      legacy.orderBy("vec_id").collect().map(_.toString).toSeq)
  }

  test("rpSignatures stamps its dials; they survive parquet; stored dials beat conflicting arguments") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_rpmeta")
      .toString + "/rpsigs.parquet"
    SimilarityOps.rpSignatures(em, "vec_id", "embedding", dim = 64,
        bands = 16, bitsPerBand = 4)
      .write.parquet(path)
    val idx = spark.read.parquet(path)
    // the dials round-trip through the parquet footer schema
    assert(SimilarityOps.rpParamsOf(idx).contains(
      SimilarityOps.RpParams(16, 4, 42L, 64)))
    // new batch: exact-direction copies of indexed vectors (every sign
    // bit agrees -> every band collides regardless of dial width)
    val planted = em.filter(col("vec_id") < 20).select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    def hits(bands: Int, bits: Int) = SimilarityOps.embeddingNearDupAgainstIndex(
        planted, idx, "vec_id", "embedding", minCos = 0.99, dim = 64,
        bands = bands, bitsPerBand = bits)
      .select("id_new", "id_old").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val matched = hits(16, 4)
    val want = (0L until 20L).map(i => (i + 100000L, i)).toSet
    assert(want.subsetOf(matched), s"missing ${(want -- matched).size} planted hits")
    // conflicting session dials (the old fixed 8x8 default) are
    // OVERRIDDEN by the index stamp: bit-identical result — the two
    // sides can never hash under different families
    assert(hits(8, 8) == matched)
  }

  test("unstamped legacy index takes the loud fallback path; a stamped one does not") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50).select("vec_id", "embedding")
    val stamped = SimilarityOps.rpSignatures(em, "vec_id", "embedding", dim = 64)
    // a pre-round-12 index: same columns, no RpMeta stamp on b0
    val unstamped = stamped.select(stamped.columns.map(c =>
      col(c).as(c, new org.apache.spark.sql.types.MetadataBuilder().build())): _*)
    assert(SimilarityOps.rpParamsOf(unstamped).isEmpty)
    val batch = em.filter(col("vec_id") < 5)
    def run(idx: org.apache.spark.sql.DataFrame): Long = {
      val before = SimilarityOps.legacyFallbacks.get()
      SimilarityOps.embeddingNearDupAgainstIndex(batch, idx, "vec_id",
        "embedding", minCos = 0.99, dim = 64).count()
      SimilarityOps.legacyFallbacks.get() - before
    }
    assert(run(stamped) == 0L, "stamped index must not take the legacy fallback")
    assert(run(unstamped) == 1L, "unstamped index must take (and count) the fallback")
  }
}
