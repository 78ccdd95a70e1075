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
  * Scale posture: top-k per query is a window over the query id —
  * shuffle-partitioned by query, never a global sort. Brute force is
  * O(|Q|·|C|): fine for |Q| small (broadcast the queries); the IVF path
  * prunes the corpus side by centroid assignment so the join is
  * |Q|·|C|/K per probed cluster.
  */
object SimilarityOps {
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

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rk").cast("long").as("rk"))
  }

  /** IVF-style ANN: assign every corpus vector to its nearest centroid
    * (by cosine, ties to the lowest centroid id), then answer queries by
    * searching only the query's own cluster. `centroids` is any small
    * DataFrame of (id, vec) — e.g. a sampled/trained codebook. At scale
    * the centroid assignment is a broadcast join + argmax (linear), and
    * the search join is bucketed by cluster — the classic IVF trade of
    * recall for a K-fold cost cut.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val cents = withQ(centroids, idCol, vecCol, "cent")
    def assign(side: DataFrame, p: String): DataFrame = {
      val scored = side.crossJoin(cents)
        .withColumn("ccos",
          cosineFromQ(dotQ(col(s"${p}_q"), col("cent_q")), col(s"${p}_n2"), col("cent_n2")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(s"${p}_id")).orderBy(col("ccos").desc, col("cent_id").asc)
      scored.withColumn("crk", row_number().over(w)).filter(col("crk") === 1)
        .select(col(s"${p}_id"), col(s"${p}_q"), col(s"${p}_n2"),
          col("cent_id").as(s"${p}_cluster"))
    }
    val q = assign(withQ(queries, idCol, vecCol, "q"), "q")
    val c = assign(withQ(corpus, idCol, vecCol, "c"), "c")
    val scored = q.join(c, col("q_cluster") === col("c_cluster"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cosineFromQ(dotQ(col("q_q"), col("c_q")), col("q_n2"), col("c_n2")))
    topKPerQuery(scored, k)
  }

  /** Train an IVF codebook with spark.ml KMeans (seeded — deterministic)
    * and return it in the (id, vec) shape [[ivfTopK]] consumes. At scale
    * train on a sample (`df.sample`) — KMeans cost is iterations x |df| x k.
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
    * minCos. Brute force at test scale; the LSH/IVF bucketing above is
    * the scale path (bucket first, verify within buckets).
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
}
