package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Production-time observability for every CAPPED candidate generator
  * (LSH bands, pigeonhole hamming chunks, RP-LSH sign buckets, the
  * n-gram df-cut): the skew caps deliberately trade recall for a
  * bounded quadratic term, and without telemetry that trade is SILENT —
  * the round-6 10× stress measured 76% of true pairs dropped when a cap
  * bound with nothing to show for it but missing output.
  *
  * Mechanism: [[observeCap]] attaches `Dataset.observe` metrics to the
  * bucket-count frame each generator already computes. The metrics ride
  * the NORMAL execution of whatever query consumes the generator — no
  * extra job, no extra pass, no change to results — and surface through
  * Spark's standard observed-metrics channel (visible to any
  * `QueryExecutionListener` / `StreamingQueryListener` a user already
  * runs, e.g. in the Spark UI's SQL metrics). On top of that, a
  * session-registered listener here mirrors the numbers into
  * [[lastStats]] and logs a WARN the moment `dropped_buckets > 0`, so a
  * binding cap is visible in plain logs BEFORE anyone notices recall
  * loss downstream.
  *
  * Per-op metric names are suffixed with a sequence number
  * (`graft_cap_<op>_<n>`) because observation names must be unique
  * within a query — composing two capped generators in one plan (e.g.
  * [[DedupOps.pairRecall]] over two LSH variants) must not collide.
  */
object CapTelemetry {
  /** One generator execution's cap report: how many buckets the cap
    * dropped, how many banded rows they carried, out of how many
    * buckets total. droppedRows is the better recall proxy — a dropped
    * bucket of b rows forfeits up to b·(b−1)/2 candidate pairs. */
  case class CapStats(droppedBuckets: Long, droppedRows: Long,
      totalBuckets: Long)

  /** One op execution's FORMAT-SKIP report (r19 — verdict "missing
    * #1/#2": undecodable media degrading dedup silently): how many rows
    * an op passed over because their format has no decoder/splitter
    * here (non-WAV audio, frameless payloads), out of how many total.
    * Mirrors [[CapStats]]' channel: rides `Dataset.observe` on the
    * op's input frame, surfaces per execution — per MICRO-BATCH in the
    * streaming gates — and WARNs when the skipped fraction DOMINATES
    * (≥ half): a mostly-MP3 corpus quietly reduced to digest-only
    * dedup is exactly the silent miss the refusal doctrine forbids,
    * and the strict dials on the ops turn it into a refusal. */
  case class SkipStats(skippedRows: Long, totalRows: Long)

  private[graft] val Prefix = "graft_cap_"
  /** Prefix for ROUTINE trims (the ngram df-cut): removing over-cap
    * buckets is those ops' designed steady-state — report the numbers,
    * but at info and in trim wording, so the genuinely exceptional
    * skew-cap WARNs aren't buried in expected noise. */
  private[graft] val TrimPrefix = "graft_trim_"
  /** Prefix for format-skip counters ([[SkipStats]]). */
  private[graft] val SkipPrefix = "graft_skip_"
  private val seq = new AtomicLong()
  // WEAK keys: a strong session set would pin every stopped session
  // (and its listener) in memory forever in a process that cycles
  // sessions; synchronized because WeakHashMap is not thread-safe
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private val last = new ConcurrentHashMap[String, CapStats]()
  private val lastSkip = new ConcurrentHashMap[String, SkipStats]()
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Attach cap metrics to a generator's bucket-count frame: rows with
    * `countCol > cap` are the buckets the caller is about to drop.
    * Returns the same frame with the observation node attached — the
    * caller filters on it exactly as before. */
  def observeCap(bucketCounts: DataFrame, op: String, countCol: Column,
      cap: Long, routine: Boolean = false): DataFrame = {
    ensureListener(bucketCounts.sparkSession)
    val prefix = if (routine) TrimPrefix else Prefix
    bucketCounts.observe(s"$prefix${op}_${seq.incrementAndGet()}",
      coalesce(sum(when(countCol > cap, 1L).otherwise(0L)), lit(0L))
        .as("dropped_buckets"),
      coalesce(sum(when(countCol > cap, countCol).otherwise(0L)), lit(0L))
        .as("dropped_rows"),
      count(lit(1)).as("total_buckets"))
  }

  /** Attach a format-skip counter to an op's input frame: rows where
    * `skipped` holds are the ones the op will pass over for lack of a
    * decoder (e.g. non-WAV payloads in the audio fingerprints). Returns
    * the same frame with the observation node attached — the metrics
    * ride whatever query consumes the op, one report per execution
    * (per micro-batch under `foreachBatch`). */
  def observeSkips(input: DataFrame, op: String,
      skipped: Column): DataFrame = {
    ensureListener(input.sparkSession)
    input.observe(s"$SkipPrefix${op}_${seq.incrementAndGet()}",
      coalesce(sum(when(skipped, 1L).otherwise(0L)), lit(0L))
        .as("skipped_rows"),
      count(lit(1)).as("total_rows"))
  }

  /** The most recent execution's stats for a generator (`op` as passed
    * to [[observeCap]]), None until one has executed in this session.
    * Listener delivery is asynchronous — tests poll. */
  def lastStats(op: String): Option[CapStats] = Option(last.get(op))

  /** The most recent execution's format-skip stats for an op (as passed
    * to [[observeSkips]]), None until one has executed. */
  def lastSkipStats(op: String): Option[SkipStats] = Option(lastSkip.get(op))

  /** All generators observed so far → their latest stats. */
  def snapshot: Map[String, CapStats] = {
    import scala.jdk.CollectionConverters._
    last.asScala.toMap
  }

  private[graft] def clear(): Unit = { last.clear(); lastSkip.clear() }

  /** `qe.observedMetrics` misses CollectMetrics nodes that AQE hid
    * inside materialized query-stage LEAVES (a broadcast build side is
    * the common case — exactly where a capped generator's small
    * bucket-count frame lands), and nodes whose whole subtree AQE's
    * empty-relation propagation ERASED from the final plan (a fully
    * binding cap: every bucket dropped → downstream join empty — the
    * very worst case, which must not also be the silent one). Recurse
    * through stage boundaries AND the pre-AQE initial plan — stage
    * fragments reuse the initial plan's node instances, so an erased
    * node's accumulator still carries the values from the stage that
    * materialized before the erasure. Tree traversal only, no job; a
    * duplicate/stale copy is resolved by taking the row that saw more
    * buckets (a never-run accumulator reads as all-zero). */
  private def deepMetrics(plan: org.apache.spark.sql.execution.SparkPlan,
      seen: java.util.IdentityHashMap[org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean])
      : Seq[(String, org.apache.spark.sql.Row)] =
    // reused subqueries/exchanges make the "tree" a DAG: without the
    // identity memo the same subtree is re-walked once per reference
    // path — exponential on reuse-heavy plans (measured as a listener
    // StackOverflowError that killed the shared bus)
    if (seen.put(plan, java.lang.Boolean.TRUE) != null) Nil
    else plan.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        deepMetrics(a.executedPlan, seen) ++ deepMetrics(a.initialPlan, seen) ++
          stageCachedPlans(a).flatMap(deepMetrics(_, seen))
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        deepMetrics(q.plan, seen)
      case c: org.apache.spark.sql.execution.CollectMetricsExec =>
        Seq(c.name -> c.collectedMetrics)
    }.flatten

  /** The materialized-stage plans AQE keeps in its per-query stage
    * cache — the only place an erased-but-executed node instance (and
    * its filled accumulator) survives when re-optimization replanned
    * between stages. Reflective because the context is
    * `private[adaptive]`; fail-safe: any access problem degrades to
    * "no extra plans", never to an error. */
  private def stageCachedPlans(a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    try {
      val ctx = a.getClass.getMethod("context").invoke(a)
      ctx.getClass.getMethod("stageCache").invoke(ctx)
        .asInstanceOf[scala.collection.concurrent.TrieMap[
          org.apache.spark.sql.execution.SparkPlan, _]]
        .values.toSeq.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
        }
    } catch { case scala.util.control.NonFatal(_) => Nil }

  private def ensureListener(spark: SparkSession): Unit =
    if (sessions.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = try {
          // cheap pre-filter: the ANALYZED logical plan always retains
          // CollectMetrics (AQE erasure is physical-only) — skip the
          // recursive physical walk entirely for the vast majority of
          // queries that observe nothing of ours
          val ours = qe.analyzed.collectWithSubqueries {
            case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
                if c.name.startsWith(Prefix) || c.name.startsWith(TrimPrefix) ||
                  c.name.startsWith(SkipPrefix) => ()
          }
          if (ours.nonEmpty) {
          val collected = (qe.observedMetrics.toSeq ++ deepMetrics(
              qe.executedPlan, new java.util.IdentityHashMap()))
            .filter { case (n, r) =>
              (n.startsWith(Prefix) || n.startsWith(TrimPrefix) ||
                n.startsWith(SkipPrefix)) && r != null }
          // the SKIP channel's rows carry (skipped_rows, total_rows) —
          // partitioned off BEFORE the cap pipeline reads cap columns
          collected.filter(_._1.startsWith(SkipPrefix))
            .groupMapReduce(_._1)(_._2)((a, b) =>
              if (a.getAs[Long]("total_rows") >= b.getAs[Long]("total_rows")) a else b)
            .toSeq
            .map { case (name, row) =>
              (name.stripPrefix(SkipPrefix).replaceAll("_\\d+$", ""),
                SkipStats(row.getAs[Long]("skipped_rows"),
                  row.getAs[Long]("total_rows")))
            }
            .groupMapReduce(_._1)(_._2)((a, b) => SkipStats(
              a.skippedRows + b.skippedRows, a.totalRows + b.totalRows))
            .foreach { case (op, st) =>
              lastSkip.put(op, st)
              if (st.skippedRows > 0 && st.skippedRows * 2 >= st.totalRows)
                log.warn(s"[graft-skip] $op skipped ${st.skippedRows} of " +
                  s"${st.totalRows} rows for lack of a decoder for their " +
                  "format — the MAJORITY of this batch: dedup has " +
                  "degraded to digest-only for these rows (re-encoded " +
                  "duplicates will NOT collapse). Route/transcode " +
                  "upstream, or set the op's strict dial to refuse.")
              else if (st.skippedRows > 0)
                log.info(s"[graft-skip] $op skipped ${st.skippedRows} of " +
                  s"${st.totalRows} rows (undecodable format — they pass " +
                  "through as singletons; re-encoded duplicates of them " +
                  "will not collapse)")
            }
          collected
            .filter { case (n, _) => !n.startsWith(SkipPrefix) }
            // two traversals can see the SAME observation (executed +
            // initial plan): resolve per NAME by the copy that ran
            .groupMapReduce(_._1)(_._2)((a, b) =>
              if (a.getAs[Long]("total_buckets") >= b.getAs[Long]("total_buckets")) a else b)
            .toSeq
            // a query composing the same generator twice (pairRecall
            // over two LSH variants, the two df-cut call sites) yields
            // DISTINCT observation names mapping to one op — SUM them,
            // else last-put-wins could report a clean cap while the
            // other instance dropped buckets
            .map { case (name, row) =>
              val routine = name.startsWith(TrimPrefix)
              val op = name.stripPrefix(TrimPrefix).stripPrefix(Prefix)
                .replaceAll("_\\d+$", "")
              ((op, routine),
                CapStats(row.getAs[Long]("dropped_buckets"),
                  row.getAs[Long]("dropped_rows"),
                  row.getAs[Long]("total_buckets")))
            }
            .groupMapReduce(_._1)(_._2)((a, b) => CapStats(
              a.droppedBuckets + b.droppedBuckets,
              a.droppedRows + b.droppedRows,
              a.totalBuckets + b.totalBuckets))
            .foreach { case ((op, routine), st) =>
              last.put(op, st)
              if (st.droppedBuckets > 0) {
                if (routine)
                  log.info(s"[graft-trim] $op removed ${st.droppedBuckets} " +
                    s"over-cap buckets of ${st.totalBuckets} " +
                    s"(${st.droppedRows} rows) — the op's designed trim " +
                    "(stop-shingle removal), reported for observability")
                else
                  log.warn(s"[graft-cap] $op dropped ${st.droppedBuckets} of " +
                    s"${st.totalBuckets} buckets (${st.droppedRows} rows) at the " +
                    "bucket cap: pairs agreeing ONLY in a dropped bucket are " +
                    "lost. Raise the cap, or collapse exact duplicates first " +
                    "(exactDedup) if the hot buckets are literal copies.")
              }
            }
          }
        } catch {
          // telemetry must NEVER hurt the query path: the listener runs
          // on the SHARED bus, where an escaped error (even a
          // StackOverflowError from a pathological plan) kills every
          // listener in the session
          case _: Throwable => ()
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
}
