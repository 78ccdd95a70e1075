package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the env-selected
  * scale factor and prints one JSON line. Results are materialized
  * through the noop datasource so the full plan executes (a bare
  * `count()` would let Catalyst prune projections and skip most of the
  * work being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up file listings, parquet footers, and JIT/codegen paths so
    // the first timed query doesn't absorb one-time session costs.
    new java.io.File(sfDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => spark.read.parquet(f.getPath).count())
    // Best of two runs per query: a single cold run conflates the plan's
    // cost with one-off JIT/codegen and GC timing (measured swings of 2x
    // on the heaviest query); the min is the reproducible number.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // Watch list (BASELINE.md noisy-query watch): queries whose history
    // shows ±40% zero-code-change drift (GC/JIT-sensitive CC chains and
    // the tiny events rollup). These run >= 3 times and record the
    // MEDIAN — the min hides bimodal GC timing, the mean chases it.
    val watch = Set("q_events_props", "q_dedup_clusters", "q_dedup_keep_best",
      "q_cluster_split",
      // round-7 CC-family additions inherit the trio's GC-sensitivity
      "q_simhash_clusters", "q_dedup_by_minhash")
    // Watch-list inheritance rule (round-9, per the r8 verdict): the
    // round-7 addendum queries (q_session_attribution, the pack family
    // q_pack_bins/q_pack_materialize) and any future interval/pack
    // query are covered by the general >= 1s LATCH below — the moment
    // one crosses 1s at a future SF it records median-of->=3
    // automatically; add it to `watch` by NAME only if it shows the CC
    // family's ±40% drift while still under 1s.
    // A failed run must NOT masquerade as a fast one: its elapsed time is
    // excluded from the stat (a fast crash would otherwise read as a
    // legitimate sub-second result) and the failure is counted into the
    // emitted JSON, so bench.json cannot look green over broken queries.
    val failCounts = scala.collection.mutable.Map.empty[String, Int]
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failCounts(name) = failCounts.getOrElse(name, 0) + 1
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // release this query's persisted/localCheckpointed blocks so later
      // queries aren't measured under accumulated storage-memory pressure
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      System.gc() // settle between queries: attribute GC to no one
      if (ok) Some(dt) else None
    }
    // true median: average the two middle elements when the run count is
    // even (upper-middle alone systematically overstates)
    def median(times: Seq[Double]): Double = {
      val s = times.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // optional comma-separated subset for fast LOCAL iteration during
    // optimization (unset/empty = all queries; the driver never sets it
    // — a subset bench.json is for A/B spot checks, never a round
    // number). Mirrors Verify's SPARK_GRAFT_ONLY contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not registered: ${unknown.mkString(",")}")
      System.err.println(s"[bench] SUBSET run (${names.size} queries) — not a round number")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      val n = if (watch(name)) math.max(runs, 3) else runs
      var times = (1 to n).flatMap(_ => runOnce(name, fn))
      // round-8 protocol: ANY query whose fastest run is >= 1s gets the
      // median-of->=3 treatment, not just the named watch list — the
      // single-run totals of heavy queries drift ±10% with GC/JIT state
      // (BASELINE.md's 62→56→65→59 cross-round drift), and the min of 2
      // still chases lucky GC windows on multi-second queries. The
      // heavy decision is LATCHED on the initial runs: a lucky third
      // run dipping under 1s must not flip the stat back to min
      val heavy = watch(name) || times.nonEmpty && times.min >= 1.0
      if (heavy && times.length < 3)
        times = times ++ (times.length until 3).flatMap(_ => runOnce(name, fn))
      // a query with zero successful runs has no honest time at all: it
      // is omitted from "queries"/the total and shows only under "failures"
      if (times.isEmpty) None
      else Some(name -> (if (heavy) median(times) else times.min))
    }
    // Tail-capture robustness (round-3 BENCH had parsed:null — the
    // driver's tail window cut the head of the 2.6 KB line): per-query
    // times at millisecond resolution halve the line; the total is
    // emitted BOTH first ("value") and last ("total_sec") so either a
    // head- or tail-truncated window still shows it; and the full JSON
    // is also written to bench.json so the number survives any capture.
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fails = failCounts.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failures":$fails,"sf":"$sfDir","total_sec":${r3(total)}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: ${e.getMessage}") }
    println(json)
    spark.stop()
  }
}
