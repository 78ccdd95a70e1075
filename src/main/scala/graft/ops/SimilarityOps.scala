package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, and an IVF-style
  * cluster-partitioned variant as the scale path (north-star extension,
  * SURVEY.md §7.1 step 6).
  *
  * Determinism: embeddings are quantized to integers
  * (round(double(x) * 10000)) so dot products and squared norms are exact
  * 64-bit arithmetic; cosine is then derived with single IEEE double ops
  * (division / sqrt are exactly rounded), which makes results
  * bit-reproducible across engines — the DuckDB oracle matches exactly.
  *
  * Scale posture: top-k per query is a bounded custom aggregate keyed
  * by query id (O(k) buffers, map-side combined — the exchange carries
  * answers, not candidates), never a global sort. Brute force is
  * O(|Q|·|C|): fine for |Q| small (broadcast the queries); the IVF path
  * prunes the corpus side by centroid assignment so the join is
  * |Q|·|C|/K per probed cluster.
  */
object SimilarityOps {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  /** Count of legacy unstamped-index fallbacks taken by
    * [[embeddingNearDupAgainstIndex]] this JVM — the synchronous,
    * spec-observable twin of the WARN it logs (log capture is
    * binding-dependent; this isn't). */
  private[graft] val legacyFallbacks = new java.util.concurrent.atomic.AtomicLong()

  /** Quantize a float/double vector to exact integers at 1e-4 resolution
    * (codegen expression; round(double(x)*10000) per element — identical
    * to the composed `transform(v, round(double(x)*1e4)::long)`). */
  def quantize(v: Column): Column = graft.functions.exprs.quantizeVec(v, 10000L)

  /** Exact integer dot product of two quantized vectors — the custom
    * codegen expression [[graft.functions.DotProductLong]] (the composed
    * `aggregate(zip_with(...))` form evaluates interpreted per element —
    * ~10x slower on the 2M-pair near-dup scan). Products are
    * <= (5·10^4)^2 per element; safe for dims << 2^33. */
  def dotQ(a: Column, b: Column): Column = graft.functions.exprs.dotLong(a, b)

  def norm2Q(a: Column): Column = dotQ(a, a)

  /** Cosine from exact integer dot and squared norms: each double op is
    * exactly rounded, so the result is deterministic bit-for-bit. */
  def cosineFromQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  private def withQ(df: DataFrame, idCol: String, vecCol: String, p: String): DataFrame =
    df.select(col(idCol).as(s"${p}_id"), quantize(col(vecCol)).as(s"${p}_q"))
      .withColumn(s"${p}_n2", norm2Q(col(s"${p}_q")))

  /** Brute-force cosine top-k: for every query row, the k nearest corpus
    * rows by cosine (self-matches excluded). Ties broken by corpus id —
    * fully deterministic. Queries side should be small (Catalyst
    * broadcasts it under the join threshold).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withQ(queries, idCol, vecCol, "q")
    val c = withQ(corpus, idCol, vecCol, "c")
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
    topKPerQuery(scored, k)
  }

  /** Top-k per query via the custom bounded aggregate
    * [[graft.functions.TopKByOrdPairs]] — same total order a
    * `row_number` window over (cos desc, c_id asc) would give, but the
    * candidates partial-aggregate map-side into O(k) buffers, so the
    * exchange carries |queries| × k pairs instead of sort-shuffling
    * EVERY candidate row (at IVF scale, candidates per query =
    * |cluster| × nprobe — orders of magnitude more than k).
    *
    * The aggregate carries long values, so non-long integral ids are
    * cast in and back losslessly; non-integral id types (string/UUID)
    * keep the window form — bounded-buffer ranking needs a fixed-width
    * value, and correctness beats the shuffle saving there.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = scored.schema("c_id").dataType
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral)
      scored.groupBy(col("q_id"))
        .agg(graft.functions.exprs.topKByOrd(
          col("cos"), col("c_id").cast("long"), k).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "pick")))
        .select(col("q_id"), col("pick.value").cast(idType).as("c_id"),
          col("pick.ord").as("cos"), (col("pos") + 1).cast("long").as("rk"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("c_id"), col("cos"), col("rk").cast("long").as("rk"))
    }
  }

  /** Assign each row of a `withQ`-prefixed side to its `probes` nearest
    * centroids (by cosine, ties to the lowest centroid id) — MAP-ONLY.
    *
    * The codebook is folded into ONE array-of-structs row by a scalar
    * subquery (computed once per query, reused by Catalyst), and each
    * side row ranks the centroids locally with higher-order functions:
    * `slice(array_sort(transform(cents, ...)), 1, probes)`. The big side
    * is never shuffled, sorted, windowed, or aggregated — assignment is
    * embarrassingly parallel, which is the plan you want at 10⁹ rows.
    *
    * Rejected alternatives (measured on Spark 4.1): the round-3
    * `row_number` window sort-shuffles all N×K scored rows;
    * `max_by(value, struct(ord, tiebreak))` plans as SortAggregate
    * (struct ordering keys are not HashAggregate-mutable buffer types),
    * and a `collect_list`-based ObjectHashAggregate falls back to
    * sort-based aggregation past 128 distinct keys per partition — every
    * aggregate form re-introduces a local sort of N×K rows plus a
    * shuffle of N vectors that the per-row ranking simply avoids.
    *
    * The dot product inside the lambda is the compiled
    * [[graft.functions.HashKernels.dotLong]] kernel (one interpreted
    * dispatch per centroid, O(dim) work inside the kernel).
    * `explode_outer` (not `explode`) keeps the optimizer from inferring
    * a non-empty pre-filter that would re-evaluate the K-centroid
    * ranking a second time per row; a null cluster (empty codebook) is
    * dropped by the downstream equi-join. Zero-norm vectors have NaN
    * cosine and rank last (the window ranked them first) — defined, and
    * the sane choice: a meaningless cosine should never win assignment.
    */
  private[graft] def assignClusters(cents: DataFrame, side: DataFrame, p: String,
      probes: Int): DataFrame = {
    val centArr = cents.agg(
      collect_list(struct(col("cent_id"), col("cent_q"), col("cent_n2"))).as("cents"))
    val ranked = transform(col("cents"), c =>
      struct(
        negate(cosineFromQ(dotQ(col(s"${p}_q"), c.getField("cent_q")),
          col(s"${p}_n2"), c.getField("cent_n2"))).as("neg_cos"),
        c.getField("cent_id").as("cent_id")))
    side
      .withColumn("cents", centArr.scalar())
      .withColumn("top", slice(array_sort(ranked), 1, probes))
      .select(col(s"${p}_id"), col(s"${p}_q"), col(s"${p}_n2"),
        explode_outer(col("top")).as("pick"))
      .select(col(s"${p}_id"), col(s"${p}_q"), col(s"${p}_n2"),
        col("pick").getField("cent_id").as(s"${p}_cluster"))
  }

  /** Two-level (coarse-quantizer) centroid assignment — the flat
    * [[assignClusters]] argmax costs N·K dot products per probe set,
    * which the round-11 100x stress measured as the SemDeDup scale
    * wall under the k ∝ N dial (407 s at 200k vectors, k = 800: the
    * assignment term, not the pair generation, dominates). The classic
    * IVF-IMI fix: group the codebook under `nCoarse` coarse centroids
    * (round 12: seeded unit-sphere KMeans over the fine centroids
    * themselves, model-sized input with a content-pinned layout so the
    * centers are a pure function of codebook content); each row
    * ranks the coarse array (nCoarse dots), keeps its `coarseProbes`
    * nearest groups, and ranks only THOSE groups' members —
    * N·(nCoarse + coarseProbes·K/nCoarse) dots, minimized at
    * nCoarse ≈ sqrt(coarseProbes·K) for a ~sqrt(K)-fold cut.
    *
    * Assignment stays MAP-ONLY (the [[assignClusters]] discipline):
    * both codebook levels fold into scalar-subquery literals BOUND TO
    * COLUMNS before any lambda touches them (a composite expression
    * inside an interpreted higher-order lambda re-evaluates per
    * element). Approximation contract: a row whose true nearest
    * centroid lives outside its probed coarse groups mis-assigns — the
    * canopy trade, bounded by `coarseProbes`; at nCoarse = 1 the
    * probed set is the whole codebook and assignment is EXACTLY the
    * flat one (spec-pinned bit-identical), so correctness degrades
    * continuously from an exact baseline.
    */
  /** The two codebook levels of [[assignClustersTwoLevel]], built ONCE
    * per op call and shared across every assignment side — the coarse
    * level trains on the model-sized centroid frame, and both level tables are
    * MATERIALIZED (localCheckpoint, model-sized) so the member
    * assignment is not re-executed as a fresh scalar subquery per
    * consuming side. */
  private[graft] final case class TwoLevelCodebook(coarse: DataFrame,
      grouped: DataFrame)

  /** Sentinel for `nCoarse` meaning "pick the assignment strategy from
    * the codebook size" — see [[resolveNCoarse]]. */
  val AutoCoarse: Int = -1

  /** Flat argmax stays the right call while N·K dot products are cheap;
    * past a few hundred centroids the assignment term dominates the
    * whole pipeline (round-11 100× stress: 407 s at 200k rows, K=800,
    * flat — the SemDeDup scale wall) and two-level cuts it ~√K-fold. */
  private[graft] val TwoLevelAutoThreshold = 256

  /** Resolve the `nCoarse` dial: [[AutoCoarse]] (the default) selects
    * flat assignment below [[TwoLevelAutoThreshold]] centroids — small
    * codebooks keep the exact argmax, so fixture-scale results are
    * byte-identical to the flat era — and two-level at
    * `nCoarse = ceil(sqrt(2K))` above it (the cost minimum of
    * N·(nCoarse + coarseProbes·K/nCoarse) at the default 2 coarse
    * probes). Explicit 0 = flat opt-out at any K; explicit positive =
    * that many coarse groups. */
  private[graft] def resolveNCoarse(nCoarse: Int, k: => Long): Int = {
    require(nCoarse >= AutoCoarse,
      s"nCoarse must be $AutoCoarse (auto), 0 (flat), or positive; got $nCoarse")
    if (nCoarse >= 0) nCoarse
    else {
      val kk = k
      if (kk < TwoLevelAutoThreshold) 0
      else math.ceil(math.sqrt(2.0 * kk)).toInt
    }
  }

  private[graft] def twoLevelCodebook(cents: DataFrame, nCoarse: Int,
      mat: Materializer = Materializer.Local, seed: Long = 42L,
      kHint: Long = -1L): TwoLevelCodebook = {
    require(nCoarse >= 1, s"need nCoarse >= 1, got $nCoarse")
    // TRAINED coarse level (round-12; replaces the round-11 stride
    // sample): seeded KMeans over the fine centroids themselves — the
    // [[trainCentroids]] machinery on a model-sized input (K rows), so
    // the coarse centers track the fine codebook's actual cluster
    // structure instead of its id ordering. A stride over sorted ids
    // ignored fine-centroid geometry entirely: two adjacent ids can sit
    // anywhere in the space, so coarse cells were arbitrary unions and
    // the canopy miss rate paid for it (0.857 tiny-fixture pair recall;
    // the KMeans coarse level is spec-pinned >= that). Determinism:
    // the training input is pinned to ONE partition sorted by cent_id
    // below, so fixed seed + same centroid CONTENT -> same centers
    // across runs AND input partitionings (spec-pinned) — KMeans||
    // sampling and float-sum order would otherwise vary with the
    // upstream layout; the codebook is model-sized, so the single
    // partition costs nothing. Degenerate shapes keep the round-11
    // contract: empty codebook -> empty levels; nCoarse >= K -> every
    // fine centroid is its own coarse group (no training); nCoarse = 1
    // -> one group holding the whole codebook, bit-identical to flat
    // assignment (spec anchor).
    val k = if (kHint >= 0L) kHint else cents.count()
    val n = math.min(nCoarse.toLong, k).toInt
    val coarse =
      if (n.toLong >= k)
        cents.select(col("cent_id").as("g_id"), col("cent_q").as("g_q"),
          col("cent_n2").as("g_n2"))
      else if (n == 1)
        // spark.ml KMeans needs k >= 2, and the single-group anchor is
        // center-independent (every member folds into the one group, so
        // the probed set is the whole codebook): lowest-id centroid
        cents.select(col("cent_id").as("g_id"), col("cent_q").as("g_q"),
            col("cent_n2").as("g_n2"))
          .orderBy(col("g_id")).limit(1)
      else {
        // train on UNIT vectors: members and rows rank the coarse level
        // by COSINE, and Euclidean KMeans on the unit sphere is monotone
        // in cosine — training on raw magnitudes would cluster by norm,
        // a dimension cosine ranking never sees. Dequantization is
        // exact-enough (KMeans is approximate; the 1e-4 grid sits far
        // below centroid-separation scale); the trained centers are
        // re-quantized so coarse ranking stays exact integer math.
        // Zero-norm centroids map to the origin (cosine NaN ranks them
        // last everywhere, same as flat assignment treats them).
        val floats = cents.select(col("cent_id"),
          transform(col("cent_q"), x =>
            when(col("cent_n2") > 0L,
              x.cast("double") / sqrt(col("cent_n2").cast("double")))
              .otherwise(lit(0.0)).cast("float")).as("__v"))
          // content-pinned physical layout (see determinism note above)
          .repartition(1).sortWithinPartitions(col("cent_id"))
        // best-of-4 seeded restarts by training cost: a single KMeans||
        // run on a tiny codebook is fragile (one bad init costs real
        // canopy recall); restart costs are model-sized and the pinned
        // input makes every cost — and therefore the argmin — a pure
        // function of codebook content. Ties break to the lowest seed.
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val feats = floats
          .select(array_to_vector(col("__v").cast("array<double>")).as("features"))
          .localCheckpoint(true)
        val model = (0 until 4).map { i =>
          val m = new KMeans().setK(n).setMaxIter(20).setSeed(seed + i).fit(feats)
          (m.summary.trainingCost, i.toLong, m)
        }.minBy(t => (t._1, t._2))._3
        // centers are collected into the model — release the
        // checkpointed training blocks now (repeated op calls would
        // otherwise accrete model-sized blocks until session end)
        feats.unpersist(blocking = false)
        val spark = cents.sparkSession
        import spark.implicits._
        withQ(model.clusterCenters.zipWithIndex.toSeq
            .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat)) }
            .toDF("cent_id", "__v"),
          "cent_id", "__v", "g")
      }
    // member table: every centroid under its nearest coarse group
    val members = assignClusters(
      coarse.select(col("g_id").as("cent_id"), col("g_q").as("cent_q"),
        col("g_n2").as("cent_n2")),
      cents.select(col("cent_id").as("m_id"), col("cent_q").as("m_q"),
        col("cent_n2").as("m_n2")),
      "m", 1)
    val grouped = mat(members
      .groupBy(col("m_cluster").as("gid"))
      .agg(collect_list(struct(col("m_id").as("cent_id"),
        col("m_q").as("cent_q"), col("m_n2").as("cent_n2"))).as("members")))
    // EMPTY coarse groups are unrankable hazards, not candidates: a
    // TRAINED center can end up no fine centroid's cosine-nearest
    // (KMeans assigns by Euclidean distance to non-unit centers, the
    // member table by cosine — different argmaxes), and a row whose
    // every probed group were empty would silently vanish from
    // assignment. Keep only member-bearing groups at the coarse level
    // (the stride-era construction had this by construction: each
    // coarse center WAS a fine centroid, so its group held >= itself);
    // with K >= 1 at least one group is non-empty, so every row probes
    // real candidates. Spec pins coarse == grouped keys + full member
    // coverage.
    val liveCoarse = coarse.join(grouped.select(col("gid")),
      col("g_id") === col("gid"), "left_semi")
    TwoLevelCodebook(mat(liveCoarse), grouped)
  }

  private[graft] def assignClustersTwoLevel(codebook: TwoLevelCodebook,
      side: DataFrame, p: String, probes: Int, coarseProbes: Int): DataFrame = {
    require(probes >= 1, s"need probes >= 1, got $probes")
    require(coarseProbes >= 1, s"need coarseProbes >= 1, got $coarseProbes")
    val groupedArr = codebook.grouped
      .agg(collect_list(struct(col("gid"), col("members"))).as("groups"))
    val coarseArr = codebook.coarse.agg(
      collect_list(struct(col("g_id"), col("g_q"), col("g_n2"))).as("coarse"))
    val rankCoarse = transform(col("__coarse"), g =>
      struct(
        negate(cosineFromQ(dotQ(col(s"${p}_q"), g.getField("g_q")),
          col(s"${p}_n2"), g.getField("g_n2"))).as("neg_cos"),
        g.getField("g_id").as("g_id")))
    val rankMembers = transform(col("__members"), c =>
      struct(
        negate(cosineFromQ(dotQ(col(s"${p}_q"), c.getField("cent_q")),
          col(s"${p}_n2"), c.getField("cent_n2"))).as("neg_cos"),
        c.getField("cent_id").as("cent_id")))
    side
      .withColumn("__coarse", coarseArr.scalar())
      .withColumn("__groups", groupedArr.scalar())
      .withColumn("__ctop", slice(array_sort(rankCoarse), 1, coarseProbes))
      .withColumn("__members",
        flatten(transform(col("__ctop"), g =>
          flatten(transform(
            filter(col("__groups"), e => e.getField("gid") === g.getField("g_id")),
            e => e.getField("members"))))))
      .withColumn("top", slice(array_sort(rankMembers), 1, probes))
      .select(col(s"${p}_id"), col(s"${p}_q"), col(s"${p}_n2"),
        explode_outer(col("top")).as("pick"))
      .select(col(s"${p}_id"), col(s"${p}_q"), col(s"${p}_n2"),
        col("pick").getField("cent_id").as(s"${p}_cluster"))
  }

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (by cosine, ties to the lowest centroid id), then answer queries by
    * searching only the query's `nprobe` nearest clusters. `centroids` is
    * any small DataFrame of (id, vec) — e.g. a sampled/trained codebook.
    * At scale the centroid assignment is a broadcast join + argmax
    * (linear), and the search join is bucketed by cluster — the classic
    * IVF trade of recall for a K-fold cost cut. `nprobe > 1` recovers
    * recall at cluster boundaries: each query fans out to its top-p
    * clusters (corpus rows stay uniquely assigned, so no result dedup is
    * needed), multiplying search cost by p.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cents = withQ(centroids, idCol, vecCol, "cent")
    // one count job feeds BOTH the strategy choice and the codebook
    // build (twoLevelCodebook would otherwise re-execute the centroid
    // lineage for its own count)
    lazy val kc = cents.count()
    val nc = resolveNCoarse(nCoarse, kc)
    lazy val codebook = twoLevelCodebook(cents, nc, kHint = kc)
    def assign(s: DataFrame, p: String, pr: Int): DataFrame =
      if (nc > 0) assignClustersTwoLevel(codebook, s, p, pr, coarseProbes)
      else assignClusters(cents, s, p, pr)
    val q = assign(withQ(queries, idCol, vecCol, "q"), "q", nprobe)
    val c = assign(withQ(corpus, idCol, vecCol, "c"), "c", 1)
    val scored = q.join(c, col("q_cluster") === col("c_cluster"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
    topKPerQuery(scored, k)
  }

  /** Train an IVF codebook with spark.ml KMeans (seeded) and return it
    * in the (id, vec) shape [[ivfTopK]] consumes. At scale train on a
    * sample (`df.sample`) — KMeans cost is iterations x |df| x k.
    *
    * Determinism contract: the fixed seed makes training reproducible
    * for a FIXED physical input layout; across different partitionings
    * KMeans|| sampling and float-sum order can shift the centers (an
    * inherent spark.ml property at corpus scale). When cross-layout
    * reproducibility matters and the input is model-sized, pin it first
    * (`repartition(1).sortWithinPartitions(id)`) — the two-level coarse
    * codebook does exactly that, with best-of-4 restarts (spec-pinned
    * survivor stability under centroid repartitioning).
    */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed).fit(feats)
    val spark = df.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray.map(_.toFloat)) }
      .toDF(idCol, vecCol)
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine >=
    * minCos. All-pairs — the exactness baseline for recall measurement
    * at test scale only; [[embeddingNearDupPairsIVF]] is the scale path.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    val a = withQ(df, idCol, vecCol, "q")
    val b = withQ(df, idCol, vecCol, "c")
    a.crossJoin(b).filter(col("q_id") < col("c_id"))
      .withColumn("cos", cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
      .filter(col("cos") >= minCos)
      .select(col("q_id").as("id_a"), col("c_id").as("id_b"), col("cos"))
  }

  /** Deterministic ±1 random-hyperplane matrix (`nPlanes` × `dim`),
    * seeded — the same call builds the Spark plan's literals and the
    * oracle SQL's, so signature parity holds by construction. */
  def rpHyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Long]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** Sentinel for `bitsPerBand` meaning "derive from the corpus size at
    * build time" — see [[autoBitsPerBand]]. */
  val AutoBits: Int = 0

  /** Corpus-size-safe band-key width: the smallest `bitsPerBand` whose
    * expected bucket occupancy `N·bands / 2^bits` stays at or under
    * `targetBucket`, floored at the historical 8-bit default and capped
    * at the 62-bit long-key limit:
    * `clamp(ceil(log2(N·bands / targetBucket)), 8, 62)`.
    *
    * The dial is analytic, not empirical — round-11's 1M stress
    * (BASELINE.md round-11 stress rows) measured both sides: at the
    * fixed 8-bit default the key space saturates (expected bucket 3,900
    * ≫ the 1000-row cap; 2,042/2,048 buckets dropped; 4/1000 recall),
    * and the formula's answer at N=1M, bands=8 — 16 bits — restores
    * 1000/1000 recall at +15% wall. `targetBucket` defaults to 125
    * (= the standard 1000-row hot-bucket cap / 8): real-embedding sign
    * keys concentrate well above the uniform expectation, so the mean
    * is sized an order under the cap to keep the tail inside it. Exact
    * duplicates always collide regardless of width (p = 1), so wider
    * keys never lose the pairs incremental dedup exists to catch.
    */
  def autoBitsPerBand(n: Long, bands: Int, targetBucket: Int = 125): Int = {
    require(bands > 0, s"need bands > 0, got $bands")
    require(targetBucket > 0, s"need targetBucket > 0, got $targetBucket")
    val needed = math.ceil(
      math.log(math.max(1L, n).toDouble * bands / targetBucket) / math.log(2.0)).toInt
    math.min(62, math.max(8, needed))
  }

  /** Resolve a caller-supplied `bitsPerBand` dial: [[AutoBits]] (the
    * default) derives the width from the corpus row count via
    * [[autoBitsPerBand]] — ONE count job at plan-build time (it
    * re-executes the input's lineage; persist upstream or pass explicit
    * bits when that lineage is expensive) — the price of a default that
    * survives a 1000× corpus without re-reading BASELINE.md; an
    * explicit positive value is used as-is. */
  private def resolveBits(bitsPerBand: Int, bands: Int, n: => Long): Int =
    if (bitsPerBand == AutoBits) autoBitsPerBand(n, bands) else bitsPerBand

  /** Column-metadata keys stamping RP-LSH dials onto a [[rpSignatures]]
    * index (on the `b0` field — survives the parquet round trip via the
    * Catalyst schema Spark persists in the footer), so later batches
    * re-derive the SAME band keys the stored corpus carries. */
  private[graft] object RpMeta {
    val Bands = "graft_rp_bands"
    val Bits = "graft_rp_bits"
    val Seed = "graft_rp_seed"
    val Dim = "graft_rp_dim"
  }

  /** The dials a [[rpSignatures]] index was built with. */
  final case class RpParams(bands: Int, bitsPerBand: Int, seed: Long, dim: Int)

  /** Read the stamped dials back from a stored index, if present (an
    * index written by pre-round-12 code has none — callers fall back to
    * their own dials there). */
  def rpParamsOf(index: DataFrame): Option[RpParams] =
    index.schema.fields.find(_.name == "b0").map(_.metadata)
      .filter(m => m.contains(RpMeta.Bits))
      .map(m => RpParams(m.getLong(RpMeta.Bands).toInt,
        m.getLong(RpMeta.Bits).toInt, m.getLong(RpMeta.Seed),
        m.getLong(RpMeta.Dim).toInt))

  /** Random-hyperplane LSH near-dup pairs (SimHash for cosine): each
    * vector gets `bands` keys of `bitsPerBand` sign bits
    * (bit j = [v · h_j ≥ 0]); two vectors are candidates when ANY band
    * key collides, and candidates are verified with the exact quantized
    * cosine. The codebook-free complement to
    * [[embeddingNearDupPairsIVF]]: no KMeans training pass, recall is
    * tunable analytically (P[bit agrees] = 1 − θ/π, band collision =
    * that^bits), and the hyperplanes are ±1 literals compiled into the
    * plan — signatures are exact integer arithmetic, so the DuckDB
    * oracle reproduces them bit-for-bit.
    *
    * Scale shape (mirrors the text MinHash-LSH spine): signature
    * computation is MAP-ONLY (`bands·bits` dot-product kernels per row,
    * no shuffle); candidates come from an equi-join on (band, key) with
    * hot buckets above `maxBucket` dropped deterministically (skew cap —
    * near-zero-norm vectors pile into degenerate sign buckets);
    * verification is candidate-sized. Never all-pairs.
    *
    * Tuning (recall at threshold τ = 1 − (1 − p^bits)^bands with
    * p = 1 − arccos(τ)/π): `bitsPerBand` defaults to [[AutoBits]] —
    * derived from the corpus row count via [[autoBitsPerBand]], which
    * keeps the historical 8-bit width at test scale and widens as
    * N·bands outgrows the bucket cap (the round-11 1M stress measured
    * the fixed 8-bit dial losing 996/1000 pairs to cap drops). The 8×8
    * regime is HIGH-similarity — recall ≈ 0.94 at τ = 0.9, ≈ 0.75 at
    * τ = 0.8 — with strong bucket pruning. For low thresholds (τ ≈
    * 0.45, p ≈ 0.65) flip to many short bands (bands = 16,
    * bitsPerBand = 4: recall ≈ 0.95); the price is weaker pruning,
    * intrinsic to hyperplane LSH when the target similarity sits close
    * to the background distribution.
    */
  def embeddingNearDupPairsRP(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, dim: Int, bands: Int = 8, bitsPerBand: Int = AutoBits,
      seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    val bits = resolveBits(bitsPerBand, bands, df.count())
    require(bands > 0 && bits > 0 && bits <= 62,
      s"need 0 < bitsPerBand <= 62, got bands=$bands bits=$bits")
    val planes = rpHyperplanes(dim, bands * bits, seed)
    val v = withQ(df, idCol, vecCol, "q")
    val bandKeys = array((0 until bands).map { b =>
      (0 until bits).map { j =>
        when(dotQ(col("q_q"), typedlit(planes(b * bits + j).toSeq)) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val banded = v.select(col("q_id"), posexplode(bandKeys).as(Seq("band", "key")))
    val ok = CapTelemetry.observeCap(
        banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("__n")),
        "embedding_rplsh", col("__n"), maxBucket)
      .filter(col("__n") <= maxBucket)
      .select("band", "key")
    val inOk = banded.join(ok, Seq("band", "key"))
    // multi-band duplicates are dropped AFTER the cosine filter, where
    // rows are narrowest (same trade as the IVF path): a distinct() on
    // the raw candidate set instead would shuffle every candidate pair
    // a second time to save re-verifying ≤`bands`-fold duplicates
    // (measured equal at sf0.1, where multiplicity is low; the exchange
    // it avoids grows with candidates, the duplication stays bounded)
    val cands = inOk.select(col("band"), col("key"), col("q_id").as("id_a"))
      .join(inOk.select(col("band"), col("key"), col("q_id").as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val a = v.select(col("q_id").as("id_a"), col("q_q").as("__qa"), col("q_n2").as("__na"))
    val b = v.select(col("q_id").as("id_b"), col("q_q").as("__qb"), col("q_n2").as("__nb"))
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("cos", cosineFromQ(dotQ(col("__qa"), col("__qb")),
        col("__na"), col("__nb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
      .distinct()
  }

  /** Semantic cross-corpus decontamination: embedding near-dup pairs
    * with one side in each corpus — the embedding-space complement of
    * [[graft.ops.DedupOps.crossCorpusNearDups]], catching PARAPHRASED
    * eval contamination that token-level n-gram/MinHash overlap misses
    * entirely (the rewritten benchmark answer has disjoint shingles but
    * a near-identical embedding). Runs [[embeddingNearDupPairsRP]] over
    * the tagged union and keeps cross-side pairs only. Ids must be
    * distinct across the two inputs (re-key first otherwise).
    *
    * Output: (id_a, id_b, cos) with id_a < id_b, sides in different
    * corpora. Same scale shape as the underlying RP-LSH: map-only
    * signatures, capped band buckets, candidate-only verification —
    * the training corpus is never cross-joined against the eval set.
    */
  def crossCorpusEmbeddingNearDups(a: DataFrame, b: DataFrame,
      idCol: String, vecCol: String, minCos: Double, dim: Int,
      bands: Int = 8, bitsPerBand: Int = AutoBits, seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    val union = a.select(col(idCol), col(vecCol))
      .unionByName(b.select(col(idCol), col(vecCol)))
    // the (id, side) frame comes from the inputs directly — one narrow
    // column per side instead of re-evaluating the vector union once
    // per tag join; the verified pair set is tiny relative to the
    // corpus, so AQE picks it as the broadcast/build side (no hint:
    // the tag frame itself is corpus-sized and must never broadcast)
    val tags = a.select(col(idCol), lit(0).as("__graft_src"))
      .unionByName(b.select(col(idCol), lit(1).as("__graft_src")))
    embeddingNearDupPairsRP(union, idCol, vecCol, minCos, dim,
        bands, bitsPerBand, seed, maxBucket)
      .join(tags.select(col(idCol).as("id_a"), col("__graft_src").as("src_a")), Seq("id_a"))
      .join(tags.select(col(idCol).as("id_b"), col("__graft_src").as("src_b")), Seq("id_b"))
      .filter(col("src_a") =!= col("src_b"))
      .select("id_a", "id_b", "cos")
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): semantic ε-dedup
    * WITHIN k-means clusters. Embeddings are assigned to their nearest
    * centroid; pairs with cosine ≥ `minCos` inside a cluster form
    * semantic-duplicate sets (connected components); each set keeps ONE
    * representative — per the paper, the example with the LOWEST cosine
    * to its centroid (the farthest / most atypical one, preserving
    * diversity), ties by id.
    *
    * Pure composition of the proven spine: pair generation is
    * [[embeddingNearDupPairsIVF]] (cluster-bucketed, never all-pairs;
    * `probes` > 1 recovers cluster-boundary pairs beyond the paper's
    * strict within-cluster formulation), components are
    * [[DedupOps.nearDupClusters]] (edge-induced iteration), and
    * selection is [[DedupOps.dedupKeepBest]] with score = −cent_cos
    * (cluster-bounded window). Two map-only assignment passes (one for
    * pairs, one for the centroid score) — both embarrassingly parallel.
    * `centroids` is any small (id, vec) codebook ([[trainCentroids]] or
    * a deterministic sample). Output: the surviving rows of `df` plus
    * their `cent_cos` diversity score. Rows that receive NO cluster
    * assignment (possible only under a degenerate/empty codebook, where
    * the pair side is empty too) survive as singletons with the
    * sentinel score `cent_cos = 1.0` — an empty codebook degrades to
    * the identity, never to a silently empty frame.
    */
  def semDedup(df: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, minCos: Double, probes: Int = 1,
      mat: Materializer = Materializer.Local,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val cents = withQ(centroids, idCol, vecCol, "cent")
    // one count job feeds BOTH the strategy choice and the codebook
    // build (twoLevelCodebook would otherwise re-execute the centroid
    // lineage for its own count)
    lazy val kc = cents.count()
    val nc = resolveNCoarse(nCoarse, kc)
    lazy val codebook = twoLevelCodebook(cents, nc, kHint = kc)
    def assign(s: DataFrame, p: String, pr: Int): DataFrame =
      if (nc > 0) assignClustersTwoLevel(codebook, s, p, pr, coarseProbes)
      else assignClusters(cents, s, p, pr)
    val scoreSide = assign(withQ(df, idCol, vecCol, "q"), "q", 1)
      .join(broadcast(cents), col("q_cluster") === col("cent_id"))
      .withColumn("cent_cos", cosineFromQ(dotQ(col("q_q"), col("cent_q")),
        col("q_n2"), col("cent_n2")))
      .select(col("q_id").as(idCol), col("cent_cos"))
    // the pair spine shares THIS call's codebook/assign — one coarse
    // selection and one member table per semDedup, not one per consumer
    val pairs = ivfPairsWith(df, idCol, vecCol, minCos,
      (s, p) => assign(s, p, probes))
    val clusters = DedupOps.nearDupClusters(
      pairs.select("id_a", "id_b"), df.select(col(idCol)), idCol, mat = mat)
    // LEFT join: an unassigned row (empty codebook) must not vanish —
    // it is a singleton in `clusters` and keeps itself regardless of
    // score; coalesce keeps the output score column well-defined
    val scored = df.join(scoreSide, Seq(idCol), "left")
      .withColumn("cent_cos", coalesce(col("cent_cos"), lit(1.0)))
    DedupOps.dedupKeepBest(scored, clusters, idCol, negate(col("cent_cos")))
  }

  /** Flat RP-LSH signature table — the STORABLE index shape for the
    * streaming embedding gate ([[graft.streaming.StreamOps.embeddingGateSink]]):
    * one row per vector carrying its `bands` sign-bucket keys
    * (b0..b{bands−1}, the [[embeddingNearDupPairsRP]] band keys,
    * computed once) plus the quantized vector and squared norm the
    * cosine verify needs. The standing corpus is never re-projected:
    * the index side of the gate reads these rows back as-is — the
    * [[graft.ops.DedupOps.minhashSignatures]] flat layout, RP-flavored.
    *
    * `bitsPerBand` defaults to [[AutoBits]]: the width is derived from
    * THIS corpus's row count ([[autoBitsPerBand]]) and the chosen dials
    * are stamped into column metadata on `b0` ([[RpMeta]]) — persisted
    * through the parquet round trip — so [[embeddingNearDupAgainstIndex]]
    * and the streaming gate re-derive the SAME keys for every later
    * batch regardless of session defaults. An index sized once at build
    * time stays self-describing for its whole life.
    */
  def rpSignatures(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 8, bitsPerBand: Int = AutoBits, seed: Long = 42L): DataFrame = {
    val bits = resolveBits(bitsPerBand, bands, df.count())
    require(bands > 0 && bits > 0 && bits <= 62,
      s"need 0 < bitsPerBand <= 62, got bands=$bands bits=$bits")
    val planes = rpHyperplanes(dim, bands * bits, seed)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(RpMeta.Bands, bands.toLong).putLong(RpMeta.Bits, bits.toLong)
      .putLong(RpMeta.Seed, seed).putLong(RpMeta.Dim, dim.toLong).build()
    val v = withQ(df, idCol, vecCol, "q")
    val keyCols = (0 until bands).map { b =>
      val key = (0 until bits).map { j =>
        when(dotQ(col("q_q"), typedlit(planes(b * bits + j).toSeq)) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      if (b == 0) key.as("b0", meta) else key.as(s"b$b")
    }
    v.select(col("q_id").as(idCol) +: keyCols
      :+ col("q_q").as("qvec") :+ col("q_n2").as("qnorm2"): _*)
  }

  /** Incremental RP-LSH near-dup check of a NEW batch of vectors against
    * a STORED [[rpSignatures]] index — [[graft.ops.DedupOps.hammingAgainstIndex]]'s
    * shape on RP bands: band both sides (the index by exploding its
    * stored keys — reshaping, not re-hashing), equi-join on (band, key)
    * with the hot-bucket cap on the unbounded INDEX side (observed via
    * [[CapTelemetry]], op "embedding_against_index"), then verify exact
    * quantized cosine on candidates only. Output:
    * (id_new, id_old, cos) — new vectors semantically matching an
    * already-indexed one.
    *
    * Dial resolution (the round-11 saturation footgun, closed): if the
    * index carries stamped [[RpMeta]] dials (any [[rpSignatures]] index
    * built by round-12+ code does), those WIN — bands, bits, seed and
    * dim all come from the index, because band keys are only comparable
    * when both sides hash identically; a session default or explicit
    * argument that disagrees with the stored corpus would silently
    * compare keys from different hash families. Unstamped (legacy,
    * pre-round-12) indexes fall back to the caller's dials; there
    * [[AutoBits]] resolves to the historical fixed 8 — the width every
    * unstamped index was actually hashed at — because deriving a wider
    * key against an 8-bit store would produce keys that NEVER collide
    * (silent zero hits), strictly worse than the legacy store's own
    * loudly-observed cap saturation. Rebuild the index through
    * round-12 [[rpSignatures]] to get the corpus-sized width. */
  def embeddingNearDupAgainstIndex(newVecs: DataFrame, index: DataFrame,
      idCol: String, vecCol: String, minCos: Double, dim: Int,
      bands: Int = 8, bitsPerBand: Int = AutoBits, seed: Long = 42L,
      maxBucket: Int = 1000): DataFrame = {
    val p = rpParamsOf(index).getOrElse {
      // loud at CALL time, not just in the scaladoc: the legacy width
      // is strictly better than any alternative for an unstamped store,
      // but the caller should know the corpus-sized AutoBits width is
      // OFF until the index is rebuilt through round-12+ rpSignatures
      legacyFallbacks.incrementAndGet()
      log.warn("embeddingNearDupAgainstIndex: index carries no stamped " +
        "RpMeta dials (pre-round-12 store) — falling back to the " +
        "caller's dials with the historical 8-bit band width; rebuild " +
        "the index through rpSignatures to stamp corpus-sized dials")
      RpParams(bands,
        if (bitsPerBand == AutoBits) 8 else bitsPerBand, seed, dim)
    }
    val newSigs = rpSignatures(newVecs, idCol, vecCol, p.dim, p.bands,
      p.bitsPerBand, p.seed)
    def banded(sigs: DataFrame, pre: String): DataFrame =
      sigs.select(col(idCol).as(s"${pre}_id"), col("qvec").as(s"${pre}_q"),
        col("qnorm2").as(s"${pre}_n2"),
        posexplode(array((0 until p.bands).map(b => col(s"b$b")): _*))
          .as(Seq("band", "key")))
    val idx = banded(index, "old")
    val ok = CapTelemetry.observeCap(
        idx.groupBy("band", "key").agg(count(lit(1)).as("__bc")),
        "embedding_against_index", col("__bc"), maxBucket)
      .filter(col("__bc") <= maxBucket).select("band", "key")
    banded(newSigs, "new")
      .join(idx.join(ok, Seq("band", "key")), Seq("band", "key"))
      .withColumn("cos", cosineFromQ(dotQ(col("new_q"), col("old_q")),
        col("new_n2"), col("old_n2")))
      .filter(col("cos") >= minCos)
      .select(col("new_id").as("id_new"), col("old_id").as("id_old"), col("cos"))
      .distinct() // multi-band duplicates dropped post-verify, where rows are narrowest
  }

  /** Corpus-vs-corpus near-duplicate pairs bucketed by IVF cluster: every
    * vector is assigned to its `probes` nearest centroids, and pairs are
    * generated only WITHIN a shared cluster — the join is
    * hash-partitioned on cluster id, never all-pairs, so cost is sum
    * over clusters of |cluster|² instead of N². Multi-probe assignment
    * (default 2) recovers pairs that straddle a single cluster boundary
    * — the canopy-clustering trade; a pair is missed only when the two
    * top-`probes` cluster sets are disjoint. Duplicate candidates (a
    * pair sharing several clusters) are deduplicated after the cosine
    * filter, where rows are narrowest. Spec pins measured recall against
    * the exact baseline on the real embedding fixture.
    */
  def embeddingNearDupPairsIVF(df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, minCos: Double, probes: Int = 2,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val cents = withQ(centroids, idCol, vecCol, "cent")
    // one count job feeds BOTH the strategy choice and the codebook
    // build (twoLevelCodebook would otherwise re-execute the centroid
    // lineage for its own count)
    lazy val kc = cents.count()
    val nc = resolveNCoarse(nCoarse, kc)
    lazy val codebook = twoLevelCodebook(cents, nc, kHint = kc)
    ivfPairsWith(df, idCol, vecCol, minCos, (s, p) =>
      if (nc > 0) assignClustersTwoLevel(codebook, s, p, probes, coarseProbes)
      else assignClusters(cents, s, p, probes))
  }

  /** The IVF pair join over a caller-supplied assignment function — so
    * [[semDedup]] shares ONE codebook build between its diversity-score
    * side and the pair spine instead of re-deriving it per consumer. */
  private def ivfPairsWith(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, assign: (DataFrame, String) => DataFrame): DataFrame = {
    val a = assign(withQ(df, idCol, vecCol, "q"), "q")
    val b = assign(withQ(df, idCol, vecCol, "c"), "c")
    a.join(b, col("q_cluster") === col("c_cluster"))
      .filter(col("q_id") < col("c_id"))
      .withColumn("cos", cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
      .filter(col("cos") >= minCos)
      .select(col("q_id").as("id_a"), col("c_id").as("id_b"), col("cos"))
      .distinct()
  }

  // ================= Product quantization (PQ / IVF-PQ) =================
  // Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  // Search" (TPAMI 2011): split each vector into `m` subvectors, vector-
  // quantize each subspace against its own `ksub`-entry codebook, and
  // answer queries by ASYMMETRIC distance computation — the query
  // precomputes one m × ksub lookup table of exact sub-dot-products, and
  // every corpus row is then scored with m table lookups + adds instead
  // of `dim` multiplies. The corpus stores only the m-byte-ish codes:
  // at dim=64 float32 → m=8 int codes that's a 32× memory cut, which is
  // the difference between "the embedding corpus fits in cluster RAM"
  // and "it doesn't" at 100 TB. Cosine comes from encoding UNIT-sphere
  // vectors: dot(q̂, recon(x̂)) ≈ cos(q, x), scored in exact integer
  // arithmetic on the 1e-4 quantization grid so results are
  // bit-reproducible across engines (the DuckDB oracle replays encode
  // and ADC exactly).

  /** Unit-sphere re-quantization: normalize an already-quantized vector
    * by its exact integer norm and re-quantize to the 1e-4 grid — the
    * ONE-PASS codegen kernel [[graft.functions.UnitQuantizeVector]]
    * (a composed `transform(v, x -> x/sqrt(n2)) |> quantize` form
    * evaluates interpreted and re-derives the norm expression per
    * element once project-collapse inlines it — O(dim²) per row; the
    * kernel is spec-pinned bit-identical to that form). Each element is
    * long→double widening (exact), one exactly-rounded divide against
    * sqrt(n2), and the shared round-to-grid — deterministic and
    * replayed verbatim by the oracle SQL. Zero-norm vectors map to the
    * all-zero unit vector (their cosine is undefined everywhere in
    * this file; ADC scores them 0, ranking them last with ties to the
    * lowest id — defined). */
  private[graft] def unitQCol(vq: Column): Column =
    graft.functions.exprs.unitQuantize(vq)

  /** A validated, fold-ready PQ codebook: `arr` is the ONE-row frame
    * holding the nested array-of-subspaces literal (bind with
    * `.scalar()` to a column before any lambda touches it — the
    * [[assignClusters]] discipline), `m` the subspace count, `dsub` the
    * subvector width. */
  private[graft] final case class PqFolded(arr: DataFrame, m: Int, dsub: Int)

  /** Validate a PQ codebook frame (sub_id, cent_id, cent_q, cent_n2)
    * and fold it into the nested scalar-subquery shape the encode/LUT
    * lambdas consume. Validation is one model-sized aggregate collected
    * to the driver: sub_id must be dense [0, m), cent_id dense
    * [0, ksub_j) per subspace (codes index the LUT by position, so
    * density is a correctness contract, not a convention), and every
    * cent_q the same width. */
  private[graft] def foldPqCodebook(codebook: DataFrame): PqFolded = {
    val stats = codebook.groupBy(col("sub_id"))
      .agg(count(lit(1)).as("n"), min(col("cent_id")).as("lo"),
        max(col("cent_id")).as("hi"),
        min(size(col("cent_q"))).as("dlo"), max(size(col("cent_q"))).as("dhi"))
      .collect() // model-sized: m rows
    require(stats.nonEmpty, "empty PQ codebook")
    val subIds = stats.map(_.getInt(0)).sorted
    require(subIds.sameElements(0 until stats.length),
      s"PQ codebook sub_id must be dense [0, m); got ${subIds.mkString(",")}")
    stats.foreach { r =>
      require(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1L,
        s"PQ codebook cent_id must be dense [0, ksub) in subspace ${r.getInt(0)}: " +
          s"min=${r.getLong(2)} max=${r.getLong(3)} n=${r.getLong(1)}")
      require(r.getInt(4) == r.getInt(5),
        s"ragged cent_q widths in subspace ${r.getInt(0)}: ${r.getInt(4)}..${r.getInt(5)}")
    }
    val dsubs = stats.map(_.getInt(4)).distinct
    require(dsubs.length == 1,
      s"PQ codebook subspaces disagree on subvector width: ${dsubs.mkString(",")}")
    val arr = codebook
      .groupBy(col("sub_id"))
      .agg(array_sort(collect_list(struct(col("cent_id"), col("cent_q"),
        col("cent_n2")))).as("cents"))
      .agg(array_sort(collect_list(struct(col("sub_id"), col("cents")))).as("cb"))
    PqFolded(arr, stats.length, dsubs.head)
  }

  /** Quantized input vector with its dimension enforced in-plan:
    * a ragged or wrong-dim vector would otherwise silently dot over
    * the shorter prefix and mis-encode. */
  private def dimChecked(vq: Column, dim: Int): Column =
    when(size(vq) === dim, vq).otherwise(raise_error(concat(
      lit(s"pq: vector dimension "), size(vq).cast("string"),
      lit(s" != codebook dimension $dim"))))

  /** Per-row subvector array: slices computed ONCE per row, so the
    * per-centroid lambdas below bind a plain lambda variable instead of
    * re-evaluating the slice per element (the interpreted-HOF
    * re-evaluation trap [[assignClusters]] documents). */
  private def subVectors(u: Column, m: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), j => slice(u, j * dsub + 1, lit(dsub)))

  /** The PQ code of a unit-quantized vector against the folded codebook
    * column: per subspace, the dense id of the centroid minimizing
    * exact squared distance. Ranked by the monotone surrogate
    * `cent_n2 - 2·dot(sub, cent)` (the `‖sub‖²` term is constant per
    * row×subspace), ties to the lowest cent_id — deterministic. */
  private def pqCodeCol(u: Column, cbCol: Column, m: Int, dsub: Int): Column =
    zip_with(cbCol, subVectors(u, m, dsub), (sub, sv) =>
      element_at(array_sort(transform(sub.getField("cents"), c =>
        struct((c.getField("cent_n2") - lit(2L) * dotQ(sv, c.getField("cent_q"))).as("d"),
          c.getField("cent_id").as("cent_id")))), 1)
        .getField("cent_id").cast("int"))

  /** The per-query ADC lookup table: lut[j][c] = exact integer dot of
    * the query's j-th unit subvector with centroid c of subspace j —
    * m × ksub dots ONCE per query row; every scored pair afterwards is
    * m lookups in the codegen [[graft.functions.PqAdcScore]] kernel. */
  private def pqLutCol(u: Column, cbCol: Column, m: Int, dsub: Int): Column =
    zip_with(cbCol, subVectors(u, m, dsub), (sub, sv) =>
      transform(sub.getField("cents"), c => dotQ(sv, c.getField("cent_q"))))

  /** Sampled PQ codebook: subspace j's centroids are the j-th unit
    * subvectors of `rows` (dense cent_id by ascending row id) — the
    * deterministic, SQL-replayable codebook the oracle queries use, and
    * a legitimate production seed when `rows` is a uniform sample.
    * [[trainPqCodebook]] is the quality path. Model-sized input: the
    * ranking window is over the codebook rows, never a corpus. */
  def pqCodebookFromRows(rows: DataFrame, idCol: String, vecCol: String,
      m: Int): DataFrame = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    // ONE model-sized collect feeds both the dimension probe and the
    // dense-id rank list (r21 — was a limit(1) job plus a distinct()
    // job per codebook build; q_pq_residual_recall builds two books)
    val idDims = rows
      .select(col(idCol).cast("long"), size(quantize(col(vecCol)))).collect()
    val dim = idDims.headOption.map(_.getInt(1))
      .getOrElse(throw new IllegalArgumentException("empty PQ codebook sample"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    // dense cent_id by ascending row id WITHOUT a window (the global
    // plan sweep rightly refuses unpartitioned windows, and a codebook
    // build inside a registered query must honor it): the id list is
    // model-sized by contract, so rank against a collected sorted
    // literal — array_position is O(ksub) per row over ksub rows
    val ids = idDims.map(_.getLong(0)).distinct.sorted
    require(ids.nonEmpty, "empty PQ codebook sample")
    val unit = rows
      .select(col(idCol).as("__rid"), quantize(col(vecCol)).as("__vq"))
      .withColumn("__vq", dimChecked(col("__vq"), dim))
      .withColumn("__u", unitQCol(col("__vq")))
      .withColumn("cent_id",
        array_position(lit(ids), col("__rid").cast("long")) - 1L)
    unit.select(col("cent_id"), col("__u"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"))
      .withColumn("cent_q", slice(col("__u"), col("sub_id") * dsub + 1, lit(dsub)))
      .select(col("sub_id"), col("cent_id"), col("cent_q"),
        norm2Q(col("cent_q")).as("cent_n2"))
  }

  /** Train a PQ codebook: per-subspace seeded spark.ml KMeans over the
    * corpus's unit subvectors, centers re-quantized to the shared 1e-4
    * grid. Same determinism contract as [[trainCentroids]]: the fixed
    * seed reproduces for a fixed physical layout; at corpus scale train
    * on a sample. Cost is m KMeans fits over dim/m-wide features. */
  def trainPqCodebook(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    require(ksub >= 2, s"need ksub >= 2 centroids per subspace, got $ksub")
    val dim = df.select(size(quantize(col(vecCol)))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("empty PQ training input"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val unit = df
      .select(quantize(col(vecCol)).as("__vq"))
      .withColumn("__vq", dimChecked(col("__vq"), dim))
      .select(unitQCol(col("__vq")).as("__u"))
    trainPqOnUnit(unit, df.sparkSession, m, dim / m, ksub, maxIter, seed)
  }

  /** The shared per-subspace KMeans loop of the PQ trainers over a
    * prepared `__u` vector frame (unit vectors for the raw codebook,
    * coarse residuals for the residual one). */
  private def trainPqOnUnit(unitDf: DataFrame,
      spark: org.apache.spark.sql.SparkSession, m: Int, dsub: Int,
      ksub: Int, maxIter: Int, seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val unit = unitDf.localCheckpoint(true) // m fits share one materialization
    import spark.implicits._
    try {
      (0 until m).map { j =>
        val feats = unit.select(array_to_vector(
          slice(col("__u"), j * dsub + 1, dsub).cast("array<double>")).as("features"))
        val model = new KMeans().setK(ksub).setMaxIter(maxIter)
          .setSeed(seed + j).fit(feats)
        model.clusterCenters.zipWithIndex.toSeq
          .map { case (c, i) =>
            (j, i.toLong, c.toArray.map(x => math.round(x)), 0L) }
          .toDF("sub_id", "cent_id", "cent_q", "cent_n2")
          .withColumn("cent_n2", norm2Q(col("cent_q")))
      }.reduce(_ union _)
    } finally unit.unpersist(blocking = false)
  }

  /** Encode a corpus against a PQ codebook — MAP-ONLY (the corpus is
    * never shuffled, sorted, or aggregated; the codebook folds into one
    * scalar-subquery literal). Output: (idCol, code array<int>) — the
    * compressed index a 100-TB deployment persists INSTEAD of the
    * vectors (m ints vs dim floats; 8 vs 64 here). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame): DataFrame =
    pqEncodeWith(df, idCol, vecCol, foldPqCodebook(codebook))

  private def pqEncodeWith(df: DataFrame, idCol: String, vecCol: String,
      pcb: PqFolded): DataFrame = {
    val dim = pcb.m * pcb.dsub
    df.select(col(idCol), quantize(col(vecCol)).as("__vq"))
      .withColumn("__vq", dimChecked(col("__vq"), dim))
      .withColumn("__u", unitQCol(col("__vq")))
      .withColumn("__cb", pcb.arr.scalar())
      .select(col(idCol), pqCodeCol(col("__u"), col("__cb"), pcb.m, pcb.dsub).as("code"))
  }

  /** Per-query LUT frame (q_id, __lut) over raw query vectors. */
  private def pqLutFrame(queries: DataFrame, idCol: String, vecCol: String,
      pcb: PqFolded): DataFrame = {
    val dim = pcb.m * pcb.dsub
    queries.select(col(idCol).as("q_id"), quantize(col(vecCol)).as("__vq"))
      .withColumn("__vq", dimChecked(col("__vq"), dim))
      .withColumn("__u", unitQCol(col("__vq")))
      .withColumn("__cb", pcb.arr.scalar())
      .select(col("q_id"), pqLutCol(col("__u"), col("__cb"), pcb.m, pcb.dsub).as("__lut"))
  }

  /** ADC top-k over a PRE-ENCODED corpus: every (query, code) pair is
    * scored by the codegen kernel in m adds, ranked by the bounded
    * top-k aggregate. The scan is |Q|·|C| pairs — the declared
    * flat-index baseline exactly like [[bruteForceTopK]] (queries side
    * small/broadcast); [[ivfPqTopK]] is the cluster-pruned scale path.
    * `adc_cos` = ADC score / 1e8 ≈ cosine(query, corpus) — an
    * approximation through the sub-codebooks, exact integer ranking. */
  def pqTopKFromCodes(queries: DataFrame, codes: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    pqTopKFromCodesWith(queries, codes, foldPqCodebook(codebook), idCol, vecCol, k)

  private def pqTopKFromCodesWith(queries: DataFrame, codes: DataFrame,
      pcb: PqFolded, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = pqLutFrame(queries, idCol, vecCol, pcb)
    val c = codes.select(col(idCol).as("c_id"), col("code"))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        graft.functions.exprs.pqAdc(col("__lut"), col("code")).cast("double") / lit(1e8))
    topKPerQuery(scored, k).withColumnRenamed("cos", "adc_cos")
  }

  /** Encode-then-search convenience over raw vectors — the codebook is
    * validated and folded ONCE, shared by encode and LUT sides. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val pcb = foldPqCodebook(codebook)
    pqTopKFromCodesWith(queries, pqEncodeWith(corpus, idCol, vecCol, pcb),
      pcb, idCol, vecCol, k)
  }

  /** ADC-retrieve-then-exact-rerank (the IVFADC "refine" step, Jégou
    * §V): the compressed scan shortlists `cands` candidates per query
    * by ADC, then ONLY those |Q|·cands rows are rescored with the
    * exact integer cosine against the full vectors and cut to top-k.
    * Result recall@k equals the shortlist's candidate recall — the
    * distortion the sub-codebooks cost at rank k is mostly rank noise
    * WITHIN the shortlist, which the exact pass repairs. The rescore
    * join broadcasts the candidate list (|Q|·cands ids) against the
    * corpus — at 100 TB the full vectors are touched for cands rows
    * per query, not the corpus: the scan stays compressed. Output is
    * exact `cos` (directly comparable to [[bruteForceTopK]]). */
  def pqTopKRerank(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int, cands: Int): DataFrame = {
    require(cands >= k, s"need cands >= k, got cands=$cands < k=$k")
    val shortlist = pqTopK(queries, corpus, codebook, idCol, vecCol, cands)
      .select(col("q_id"), col("c_id"))
    val q = withQ(queries, idCol, vecCol, "q")
    val c = withQ(corpus, idCol, vecCol, "c")
    val rescored = broadcast(shortlist)
      .join(q, "q_id").join(c, "c_id")
      .withColumn("cos",
        cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
    topKPerQuery(rescored, k)
  }

  /** IVF-PQ: the 100-TB shape. Corpus rows are coarse-assigned (IVF)
    * AND PQ-encoded in the same map-only pass; queries probe their
    * `nprobe` nearest coarse cells and ADC-score only those cells'
    * codes — |Q|·|C|·nprobe/K pairs through an equi-join on the cell
    * id, m adds each, against a corpus the cluster stores at dim/m-fold
    * compression. `residual = true` (default) is classical IVFADC
    * (Jégou §IV): codes are the RESIDUAL to the assigned cell centroid
    * — variance concentrates near zero, buying recall per bit at equal
    * code size (measured: the q_pq_residual_recall scorecard) — scored
    * as the per-(query, cell) centroid-dot constant plus the same
    * m-add ADC; pass a codebook trained on residuals
    * ([[trainPqResidualCodebook]] / [[pqResidualCodebookFromRows]]).
    * `residual = false` encodes the whole unit vector — one codebook
    * then serves every cell, so the same encoded corpus answers flat
    * ADC under any coarse layout (residual codes need re-encoding when
    * centroids/codebook rebuild — persist both beside the index).
    * Recall is governed by `nprobe` (cell boundary misses — same dial
    * as [[ivfTopK]]) times the PQ quantization loss (measured by the
    * [[DedupOps.pairRecall]] scorecard). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 1, nCoarse: Int = AutoCoarse, coarseProbes: Int = 2,
      residual: Boolean = true): DataFrame = {
    // ONE setup (codebook fold + centroid count + coarse codebook)
    // shared between the index build and the query side — the composed
    // form must not pay the two-codebook-builds tax the split publics
    // each pay alone (the ivfTopK one-count-job discipline)
    val st = ivfPqSetup(centroids, codebook, idCol, vecCol, nCoarse,
      coarseProbes, residual)
    ivfPqFromIndexWith(queries,
      ivfPqIndexWith(corpus, st, idCol, vecCol), st, idCol, vecCol, k, nprobe)
  }

  /** The shared per-call setup of the IVF-PQ ops: the folded codebook,
    * an assignment closure over the (lazily trained, at most once)
    * coarse codebook, the model-sized unit-quantized cell centroids
    * (the residual anchor), and the residual dial. */
  private final case class IvfPqSetup(pcb: PqFolded,
      assign: (DataFrame, String, Int) => DataFrame,
      centsU: DataFrame, residual: Boolean)

  private def ivfPqSetup(centroids: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, nCoarse: Int, coarseProbes: Int,
      residual: Boolean): IvfPqSetup = {
    val pcb = foldPqCodebook(codebook)
    val dim = pcb.m * pcb.dsub
    val cents = withQ(centroids, idCol, vecCol, "cent")
    lazy val kc = cents.count()
    val nc = resolveNCoarse(nCoarse, kc)
    lazy val cb2 = twoLevelCodebook(cents, nc, kHint = kc)
    val centsU = cents.select(col("cent_id").as("__cl"),
      unitQCol(dimChecked(col("cent_q"), dim)).as("__cu"))
    IvfPqSetup(pcb, (s, p, pr) =>
      if (nc > 0) assignClustersTwoLevel(cb2, s, p, pr, coarseProbes)
      else assignClusters(cents, s, p, pr),
      centsU, residual)
  }

  /** The persistable IVF-PQ index: every corpus row coarse-assigned AND
    * PQ-encoded in ONE map-only pass — (idCol, cluster, code), m ints +
    * a cell id per vector (the measured 25× parquet cut vs raw vectors,
    * BASELINE round-13 addendum 4). Build once, store, query with
    * [[ivfPqTopKFromIndex]] — re-deriving it per query call would pay
    * the whole corpus encode every time (the round-13 stress measured
    * exactly that mistake at 2M vectors: ~50 s re-encoding per call vs
    * ~4 s against the standing index — BASELINE round-13 addendum 4).
    * Contract: queries must present the
    * SAME `centroids` and `codebook` the index was built with — persist
    * both beside the index (the materializeTrainingCorpus vocab-sidecar
    * discipline); the codebook itself is a table, not a dial — nothing
    * compact enough to ride column metadata. The residual DIAL however
    * IS stamped: the `code` column carries metadata key
    * `graft_pq_residual` (parquet persists Spark column metadata, so it
    * survives the round trip), and [[ivfPqTopKFromIndex]] refuses a
    * mode mismatch instead of silently mis-scoring — a raw-code index
    * queried as residual would add the centroid base to whole-vector
    * codes with no error otherwise. */
  def ivfPqIndex(corpus: DataFrame, centroids: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2,
      residual: Boolean = true): DataFrame =
    ivfPqIndexWith(corpus,
      ivfPqSetup(centroids, codebook, idCol, vecCol, nCoarse, coarseProbes,
        residual),
      idCol, vecCol)

  private def ivfPqIndexWith(corpus: DataFrame, st: IvfPqSetup,
      idCol: String, vecCol: String): DataFrame = {
    val dim = st.pcb.m * st.pcb.dsub
    val assigned = st.assign(withQ(corpus, idCol, vecCol, "c"), "c", 1)
      .withColumn("__u", unitQCol(dimChecked(col("c_q"), dim)))
    // residual mode (classical IVFADC, Jégou §IV): encode
    // u − cell-centroid-unit — exact integer subtraction on the shared
    // 1e-4 grid against the broadcast model-sized centroid table. The
    // residual concentrates variance near zero, buying recall per bit
    // at the same code size; the price is that codes are only valid
    // under THIS coarse layout (a codebook/centroid rebuild means
    // re-encoding — persist both beside the index).
    val vec =
      if (st.residual)
        assigned.join(broadcast(st.centsU), col("c_cluster") === col("__cl"))
          .withColumn("__u",
            zip_with(col("__u"), col("__cu"), (a, b) => a - b))
      else assigned
    // stamp the encode mode onto the code column: a standing index read
    // back under the wrong `residual` dial must refuse, not mis-score
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean(ResidualStampKey, st.residual).build()
    vec
      .withColumn("__cb", st.pcb.arr.scalar())
      .select(col("c_id").as(idCol), col("c_cluster").as("cluster"),
        pqCodeCol(col("__u"), col("__cb"), st.pcb.m, st.pcb.dsub)
          .as("code", md))
  }

  /** Metadata key on an [[ivfPqIndex]] `code` column recording whether
    * codes are coarse-cell residuals (IVFADC) or whole-vector codes. */
  val ResidualStampKey = "graft_pq_residual"

  /** Refuses an index whose stamped encode mode contradicts the
    * caller's `residual` dial. Unstamped indexes (pre-stamp layout, or
    * hand-built) are only accepted as `residual = false`: the legacy
    * layout was raw codes, and scoring raw codes as residuals is the
    * exact silent-mis-scoring path this guard exists to close. */
  private def requireResidualStamp(index: DataFrame, residual: Boolean): Unit = {
    index.schema.find(_.name == "code") match {
      case Some(f) if f.metadata.contains(ResidualStampKey) =>
        val stamped = f.metadata.getBoolean(ResidualStampKey)
        require(stamped == residual,
          s"ivfPqTopKFromIndex: index is stamped $ResidualStampKey=$stamped " +
            s"but was queried with residual=$residual — scoring would " +
            "silently mis-rank. Pass the matching residual dial (and the " +
            "centroids/codebook persisted beside the index).")
      case Some(_) =>
        require(!residual,
          s"ivfPqTopKFromIndex: index carries no $ResidualStampKey stamp " +
            "(pre-stamp or hand-built layout — those encode WHOLE vectors) " +
            "but was queried with residual=true (the default since the " +
            "IVFADC change): residual scoring would add the centroid base " +
            "to whole-vector codes with no error. Pass residual=false for " +
            "a legacy raw-code index, or rebuild it with ivfPqIndex.")
      case None =>
        throw new IllegalArgumentException(
          "ivfPqTopKFromIndex: index has no `code` column — not an ivfPqIndex")
    }
  }

  /** Incremental IVF-PQ append — the daily-ingest fold of a NEW vector
    * batch into a STANDING compressed index WITHOUT re-encoding (or even
    * reading) the standing codes: encode the batch against the SAME
    * persisted centroids/codebook and union it under the standing rows
    * (the [[graft.ops.DedupOps]] `hammingAgainstIndex` discipline
    * applied to IVF-PQ). Exactness makes the fold trivially correct:
    * encoding is a pure function of (vector, centroids, codebook), so
    * `appendPqIndex(B, ivfPqIndex(A)) == ivfPqIndex(A ∪ B)` row-for-row
    * (spec-pinned) — the thing float-kmeans indexes can never promise.
    *
    * Guards, in order:
    *  - residual-stamp check — the batch must be encoded in the mode the
    *    standing codes use ([[ivfPqTopKFromIndex]]'s refusal);
    *  - DRIFT guard: coarse-cell occupancy PSI
    *    ([[graft.ops.ProfileOps.categoryDrift]]) between the standing
    *    index's `cluster` histogram and the new batch's assignment under
    *    the same centroids. A distribution that shifted past `maxPsi`
    *    (default 0.25 — the classical "significant shift" dial) means
    *    the frozen coarse layout no longer matches arriving data: codes
    *    stay VALID but recall decays silently, so refuse and rebuild
    *    instead. The check is one aggregate scan of the standing
    *    `cluster` column (map-side combine to K rows — codes and ids
    *    are never read, nothing standing is shuffled). Batches under
    *    `minDriftRows` skip the check: a tiny histogram is all
    *    sampling noise (one row "concentrates" in one cell), and
    *    refusing every small daily append would make the dial useless;
    *  - duplicate-id guard: a batch id already present would silently
    *    shadow its standing twin in every downstream top-k — one
    *    map-only standing scan against the BROADCAST batch ids.
    *
    * Output: the appended index (standing rows byte-identical, plan
    * shows them as a pure scan — spec-pinned that the PQ encode kernel
    * appears exactly once, on the batch branch).
    */
  def appendPqIndex(newBatch: DataFrame, index: DataFrame,
      centroids: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2,
      residual: Boolean = true, maxPsi: Double = 0.25,
      minDriftRows: Long = 100L): DataFrame = {
    require(maxPsi > 0.0, s"maxPsi must be positive, got $maxPsi")
    requireResidualStamp(index, residual)
    val st = ivfPqSetup(centroids, codebook, idCol, vecCol, nCoarse,
      coarseProbes, residual)
    // drift guard — standing occupancy vs the batch's assignment under
    // the SAME coarse layout
    val newAssign = st.assign(withQ(newBatch, idCol, vecCol, "c"), "c", 1)
      .select(col("c_cluster").as("cluster"))
    val driftRow = graft.ops.ProfileOps
      .categoryDrift(index.select("cluster"), newAssign, "cluster")
      .agg(coalesce(sum(col("psi_q16")), lit(0L)).as("psi_q16"),
        coalesce(sum(col("n_b")), lit(0L)).as("n_new"))
      .collect()(0)
    val psiQ = driftRow.getLong(0)
    require(driftRow.getLong(1) > 0L,
      "appendPqIndex: the new batch is empty (or all-null vectors) — nothing to append")
    val maxPsiQ = math.round(maxPsi * 65536.0 * 1000000.0)
    // a tiny batch's occupancy histogram is ALL sampling noise (one
    // row "concentrates" 100% of its mass in one cell) — PSI only
    // means drift once the batch is big enough to estimate rates
    require(driftRow.getLong(1) < minDriftRows || psiQ <= maxPsiQ,
      f"appendPqIndex: coarse-cell occupancy PSI ${psiQ / 65536.0 / 1e6}%.4f " +
        f"exceeds maxPsi $maxPsi%.4f — the arriving distribution no longer " +
        "matches the frozen coarse layout; recall under these centroids " +
        "would decay silently. Rebuild the index (ivfPqIndex) with " +
        "re-trained centroids/codebook, or raise maxPsi deliberately.")
    // duplicate-id guard — broadcast the (daily-sized) batch ids; the
    // standing side is a map-only single-column scan, never shuffled
    val dups = index
      .join(broadcast(newBatch.select(col(idCol).as("__nid"))),
        col(idCol) === col("__nid"))
      .limit(1).collect()
    require(dups.isEmpty,
      s"appendPqIndex: batch id ${dups.headOption.map(_.get(0)).orNull} " +
        "already exists in the standing index — appending would silently " +
        "shadow the standing row in every downstream top-k; dedup the " +
        "batch first (dedupAgainstIndex shape)")
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean(ResidualStampKey, residual).build()
    def restamp(d: DataFrame): DataFrame =
      d.select(col(idCol), col("cluster"), col("code").as("code", md))
    restamp(index).unionByName(
      restamp(ivfPqIndexWith(newBatch, st, idCol, vecCol)))
  }

  /** ADC top-k against a standing [[ivfPqIndex]]: queries are coarse-
    * assigned to their `nprobe` cells and build their LUTs (map-only,
    * query-sized); the join against the index is an equi-join on the
    * cell id scoring codes with the codegen kernel. The corpus's full
    * vectors are never read. */
  def ivfPqTopKFromIndex(queries: DataFrame, index: DataFrame,
      centroids: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 1,
      nCoarse: Int = AutoCoarse, coarseProbes: Int = 2,
      residual: Boolean = true): DataFrame = {
    requireResidualStamp(index, residual)
    ivfPqFromIndexWith(queries, index,
      ivfPqSetup(centroids, codebook, idCol, vecCol, nCoarse, coarseProbes,
        residual),
      idCol, vecCol, k, nprobe)
  }

  private def ivfPqFromIndexWith(queries: DataFrame, index: DataFrame,
      st: IvfPqSetup, idCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val dim = st.pcb.m * st.pcb.dsub
    val q0 = st.assign(withQ(queries, idCol, vecCol, "q"), "q", nprobe)
      .withColumn("__u", unitQCol(dimChecked(col("q_q"), dim)))
      .withColumn("__cb", st.pcb.arr.scalar())
    // residual mode: score(q, x) = dot(q̂, ĉ_cell) + ADC(lut, code) —
    // dot(q̂, ĉ + r) splits into the per-(query, cell) constant against
    // the broadcast centroid table plus the SAME m-add ADC kernel over
    // residual codewords; the per-pair cost is unchanged
    val q =
      if (st.residual)
        q0.join(broadcast(st.centsU), col("q_cluster") === col("__cl"))
          .select(col("q_id"), col("q_cluster"),
            pqLutCol(col("__u"), col("__cb"), st.pcb.m, st.pcb.dsub)
              .as("__lut"),
            dotQ(col("__u"), col("__cu")).as("__base"))
      else
        q0.select(col("q_id"), col("q_cluster"),
          pqLutCol(col("__u"), col("__cb"), st.pcb.m, st.pcb.dsub)
            .as("__lut"),
          lit(0L).as("__base"))
    val c = index.select(col(idCol).as("c_id"), col("cluster").as("c_cluster"),
      col("code"))
    val scored = q.join(c, col("q_cluster") === col("c_cluster"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos",
        (col("__base") +
          graft.functions.exprs.pqAdc(col("__lut"), col("code")))
          .cast("double") / lit(1e8))
    topKPerQuery(scored, k).withColumnRenamed("cos", "adc_cos")
  }

  /** Residual PQ codebook from sample rows — the deterministic,
    * SQL-replayable seed ([[pqCodebookFromRows]]' residual twin):
    * subspace j's codewords are the sample rows' RESIDUALS
    * (unit vector − assigned cell centroid unit vector, exact integer
    * subtraction on the shared grid) sliced at subspace j, dense
    * cent_id by ascending row id. Pass rows DISTINCT from the
    * centroids — a centroid's own residual is the zero vector, and a
    * zero-heavy codebook defeats the encoding.
    * [[trainPqResidualCodebook]] is the quality path. */
  def pqResidualCodebookFromRows(rows: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, m: Int): DataFrame = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    // one model-sized collect for dim + ids (see pqCodebookFromRows)
    val idDims = rows
      .select(col(idCol).cast("long"), size(quantize(col(vecCol)))).collect()
    val dim = idDims.headOption.map(_.getInt(1))
      .getOrElse(throw new IllegalArgumentException("empty PQ codebook sample"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val ids = idDims.map(_.getLong(0)).distinct.sorted
    require(ids.nonEmpty, "empty PQ codebook sample")
    val cents = withQ(centroids, idCol, vecCol, "cent")
    val centsU = cents.select(col("cent_id").as("__cl"),
      unitQCol(dimChecked(col("cent_q"), dim)).as("__cu"))
    val res = assignClusters(cents, withQ(rows, idCol, vecCol, "r"), "r", 1)
      .join(broadcast(centsU), col("r_cluster") === col("__cl"))
      .withColumn("__u",
        zip_with(unitQCol(dimChecked(col("r_q"), dim)), col("__cu"),
          (a, b) => a - b))
      .withColumn("cent_id",
        array_position(lit(ids), col("r_id").cast("long")) - 1L)
    res.select(col("cent_id"), col("__u"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"))
      .withColumn("cent_q", slice(col("__u"), col("sub_id") * dsub + 1, lit(dsub)))
      .select(col("sub_id"), col("cent_id"), col("cent_q"),
        norm2Q(col("cent_q")).as("cent_n2"))
  }

  /** Variance-balancing dimension permutation — the integer-exact
    * slice of OPQ (Ge et al., "Optimized Product Quantization", CVPR
    * 2013): a permutation IS an orthogonal transform, so it preserves
    * dots, norms, and the exact-integer grid (a general learned
    * rotation would break the bit-replayable arithmetic this file's
    * oracles pin), while still attacking OPQ's target — unbalanced
    * variance across subspaces, where one subspace holds most of the
    * signal and its ksub codewords saturate. Eigenvalue-allocation
    * greedy (the OPQ-P initialization): dims sorted by variance
    * descending, each assigned to the non-full subspace with the
    * smallest log-variance sum. One corpus aggregate (dim-sized
    * output); apply with [[permuteVec]] to BOTH corpus and queries
    * before any PQ op — the permutation is part of the codebook
    * contract, persist it beside the index. */
  def pqBalancedPermutation(df: DataFrame, vecCol: String, m: Int): Seq[Int] = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    val stats = df
      .select(unitQCol(quantize(col(vecCol))).as("__u"))
      .select(posexplode(col("__u")).as(Seq("__d", "__x")))
      .groupBy("__d")
      .agg(avg(col("__x")).as("__mu"),
        avg(col("__x") * col("__x")).as("__m2"))
      .select(col("__d"),
        (col("__m2") - col("__mu") * col("__mu")).as("__v"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    require(stats.nonEmpty, "empty permutation training input")
    val dim = stats.length
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val bySignal = stats.sortBy { case (d, v) => (-v, d) }
    val sums = Array.fill(m)(0.0)
    val members = Array.fill(m)(List.empty[Int])
    bySignal.foreach { case (d, v) =>
      val j = (0 until m).filter(members(_).size < dsub)
        .minBy(j => (sums(j), j))
      sums(j) += math.log(v + 1e-12)
      members(j) = d :: members(j)
    }
    members.toSeq.flatMap(_.sorted)
  }

  /** Gather `vec`'s elements in `perm` order (perm(i) = source index
    * of output position i, 0-based) — the applicator of
    * [[pqBalancedPermutation]]. Pass a plain column reference (not a
    * computed expression): interpreted higher-order functions
    * re-evaluate expressions referenced inside the lambda per
    * element. */
  def permuteVec(vec: Column, perm: Seq[Int]): Column = {
    require(perm.sorted == perm.indices,
      s"not a permutation of 0..${perm.length - 1}: $perm")
    transform(typedlit(perm.map(_ + 1)), i => element_at(vec, i))
  }

  /** Train a RESIDUAL PQ codebook (the [[trainPqCodebook]] quality
    * path for residual-mode [[ivfPqIndex]]): per-subspace seeded
    * KMeans over the corpus's coarse-assignment residuals. Same
    * determinism contract; cost adds one coarse assignment pass over
    * the training sample. */
  def trainPqResidualCodebook(df: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, m: Int, ksub: Int,
      maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    require(ksub >= 2, s"need ksub >= 2 centroids per subspace, got $ksub")
    val dim = df.select(size(quantize(col(vecCol)))).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("empty PQ training input"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val cents = withQ(centroids, idCol, vecCol, "cent")
    val centsU = cents.select(col("cent_id").as("__cl"),
      unitQCol(dimChecked(col("cent_q"), dim)).as("__cu"))
    val unit = assignClusters(cents, withQ(df, idCol, vecCol, "r"), "r", 1)
      .join(broadcast(centsU), col("r_cluster") === col("__cl"))
      .select(zip_with(unitQCol(dimChecked(col("r_q"), dim)), col("__cu"),
        (a, b) => a - b).as("__u"))
    trainPqOnUnit(unit, df.sparkSession, m, dim / m, ksub, maxIter, seed)
  }
}
