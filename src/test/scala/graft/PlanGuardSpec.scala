package graft

import graft.queries.Queries

/** Structural plan guards for the properties PLANS.md claims: filters
  * reach the parquet scan, projections prune the read schema, top-k
  * plans TakeOrderedAndProject (never a global sort), and small
  * dimensions broadcast. Plan strings are checked on the sf0.001
  * fixtures — the properties are structural, not size-dependent.
  */
class PlanGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    Queries.all(q)(spark, dir).queryExecution.executedPlan.toString

  test("q3: segment filter is pushed into the customer scan; top-k is distributed") {
    val plan = planOf("q3_top_orders")
    assert(plan.contains("PushedFilters") && plan.contains("c_mktsegment"),
      plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q1: lineitem read schema is pruned to the referenced columns") {
    val plan = planOf("q1_pricing_summary")
    // q1 touches 7 of lineitem's 16 columns; the scan must not read the rest
    assert(!plan.contains("l_comment") && !plan.contains("l_partkey"),
      plan.take(2000))
  }

  test("q5: dimension joins broadcast") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("fetch queue: backfill/refresh top-k plans TakeOrderedAndProject") {
    val plan = planOf("q_fetch_queue")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("boilerplate cut: broadcast anti-join hot set, two-level df, no distinct expand") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text",
        org.apache.spark.sql.functions.concat_ws("\n",
          org.apache.spark.sql.functions.lit("NAV HOME"),
          org.apache.spark.sql.functions.col("text")))
    val plan = graft.ops.DedupOps
      .cutBoilerplateLines(docs, "doc_id", "text", maxDf = 10)
      .queryExecution.executedPlan.toString
    // the hot set (boilerplate-sized) removes via broadcast anti-join
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(3000))
    // df is the two-level (key, doc) -> key aggregate: a countDistinct
    // would plan an Expand; the default key is the 8-byte hash
    assert(!plan.contains("Expand"), plan.take(3000))
    assert(plan.contains("xxhash64"), plan.take(3000))
  }

  test("ngram pairs: the df-cut is a map-only scalar-array except — no window, no anti-join") {
    // probe with Inline materialization: the default localCheckpoint
    // truncates the plan, hiding the cut inside a checkpointed leaf
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.ops.DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, minJaccard = 0.5, mat = graft.ops.Materializer.Inline)
      .queryExecution.executedPlan.toString
    // r21 default shape: the hot (> maxDf) shingle set rides a scalar
    // subquery ARRAY and the cut is array_except in a map-only
    // projection with the per-doc size read off the same array — no
    // shingle-keyed window, no per-doc window, no anti-join exchange
    assert(plan.contains("array_except"), plan.take(3000))
    assert(!plan.contains("windowspecdefinition"), plan.take(3000))
    assert(!plan.contains("LeftAnti"), plan.take(3000))
    // the anti-join FALLBACK (broadcastHotSet = false) keeps the
    // anti-join cut, but sizes are an aggregate joined onto the pair
    // table — no window on either path since r21
    val fb = graft.ops.DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, minJaccard = 0.5, mat = graft.ops.Materializer.Inline,
        broadcastHotSet = false)
      .queryExecution.executedPlan.toString
    assert(fb.contains("LeftAnti"), fb.take(3000))
    assert(!fb.contains("windowspecdefinition"), fb.take(3000))
  }

  test("prefix ngram variant: window-free, scalar-subquery cut, array verify") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.ops.DedupOps.ngramJaccardPairsPrefix(docs, "doc_id", "text",
        k = 3, minJaccard = 0.5, mat = graft.ops.Materializer.Inline)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("array_intersect"), plan.take(3000))
    assert(plan.contains("array_except"), plan.take(3000))
    assert(plan.contains("slice("), plan.take(3000))
  }

  test("no query plans an unpartitioned Window anywhere (incl. subqueries)") {
    // A partition-less Window moves ALL rows to a single task — the one
    // plan shape that cannot survive a scale-up. Sweep every registered
    // query's optimized plan, descending into scalar/IN subqueries.
    // CAVEAT: checkpointing Materializers truncate lineage into a
    // LogicalRDD this sweep cannot see through — ops that materialize
    // internally get a supplemental Inline-mat probe (below, and the
    // ngram probes above).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = Queries.all.keys.toSeq.sorted.flatMap { q =>
      val plan = Queries.all(q)(spark, dir).queryExecution.optimizedPlan
      plan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty =>
          s"$q: ${w.simpleString(120)}"
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned Window found:\n" + offenders.mkString("\n"))
  }

  test("numericProfile full lineage (Inline mat) has no unpartitioned Window either") {
    // q_numeric_profile's default materializer hides the histogram
    // subtree from the sweep above; re-derive with Inline so the
    // pre-materialization stages are covered too
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
    val plan = graft.ops.ProfileOps.numericProfile(df, "l_quantity",
      graft.ops.Materializer.Inline).queryExecution.optimizedPlan
    val bad = plan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty => w.simpleString(120)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("collocations full lineage (Inline mat) has no unpartitioned Window either") {
    // same blind-spot closure as numericProfile: the default mat hides
    // the unigram-aggregate subtree from the global sweep
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.ops.TextOps.collocations(docs, "text",
        minCount = 5, topN = 50, mat = graft.ops.Materializer.Inline)
      .queryExecution.optimizedPlan
    val bad = plan.collectWithSubqueries {
      case w: LWindow if w.partitionSpec.isEmpty => w.simpleString(120)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("no query plans an UNCONDITIONED join except the declared exactness baselines") {
    // A condition-less Join (cross product) is the other plan shape that
    // cannot survive a scale-up. Sweep every registered query, allowing
    // only the queries built on DECLARED brute-force baselines.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val declared = Set(
      "q_embed_cosine_topk", // bruteForceTopK: exactness baseline (IVF is the scale path)
      "q_embed_near_dup",    // embeddingNearDupPairs: exactness baseline (IVF/RP-LSH scale paths)
      "q_embed_recall",      // pairRecall over the same declared baseline (RP recall scorecard)
      "q_pq_topk",           // flat ADC scan: declared flat-index baseline (ivfPqTopK is the scale path)
      "q_pq_recall",         // pairRecall over bruteForceTopK + the flat ADC scan (PQ recall scorecard)
      "q_media_recall",      // hammingAllPairs: exactness baseline (pigeonhole is the scale path)
      // the numeric-profile family carries the P×P broadcast triangular
      // offsets join — P = shuffle partition COUNT (a config constant,
      // not data) on both sides, broadcast-hinted; cleared by the
      // round-6 plan audit (ProfileOps.scala quantilesFromHistogram)
      "q_numeric_profile", "q_profile_incremental", "q_token_profile",
      "q_bpe_token_profile")
    val offenders = Queries.all.keys.toSeq.sorted
      .filterNot(declared.contains).flatMap { q =>
        val plan = Queries.all(q)(spark, dir).queryExecution.optimizedPlan
        plan.collectWithSubqueries {
          case j: Join if j.condition.isEmpty =>
            s"$q: ${j.simpleString(120)}"
        }
      }
    assert(offenders.isEmpty,
      "unconditioned join found outside the declared baselines:\n" +
        offenders.mkString("\n"))
  }

  test("flagship entry() returns rows (the driver's smoke contract)") {
    // the driver smoke-checks rows > 0 on SparkEntry.entry at sf0.001;
    // break it here first, not in the round gate
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query emits only atomic sortable columns (driver comparator contract)") {
    // The driver's oracle comparator sorts result rows with pandas, which
    // cannot sort array/map/struct cells (round-6 q_hash_embed failure:
    // "TypeError: unhashable type: 'numpy.ndarray'"). Vector-valued ops
    // must register FLATTENED projections (e0..eN / mh0..mhN); the
    // array-returning Column stays available to library callers.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType, BinaryType}
    val offenders = Queries.all.keys.toSeq.sorted.flatMap { q =>
      Queries.all(q)(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] ||
                  f.dataType == BinaryType =>
          s"$q.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      "non-atomic registered output column(s) — the driver comparator cannot sort these:\n" +
        offenders.mkString("\n"))
  }

  test("similarity top-k queries rank via the bounded aggregate, never a window") {
    for (q <- Seq("q_embed_cosine_topk", "q_ivf_topk", "q_topk_per_group")) {
      val plan = planOf(q)
      assert(!plan.contains("Window"), s"$q: ${plan.take(2000)}")
      assert(plan.contains("graft_top_k_by_ord"), s"$q: ${plan.take(2000)}")
    }
  }
}
