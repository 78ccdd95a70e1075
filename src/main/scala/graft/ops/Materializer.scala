package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Materialization strategy for intermediates that feed several consumers
  * or iterative folds (dedup postings, connected-components labels, the
  * per-day upsert fold). The choice is a durability/throughput trade the
  * CALLER owns, because it depends on where the job runs:
  *
  *  - [[Materializer.Inline]] — no materialization; Catalyst keeps full
  *    lineage and recomputes per consumer. Correct everywhere; quadratic
  *    plan growth in iterative folds.
  *  - [[Materializer.Local]] (default) — `localCheckpoint`: truncates
  *    lineage into executor-local blocks. Fastest, and measured faster
  *    than persist at local[32]; but blocks die with an executor, so on a
  *    multi-node cluster a lost executor kills the job.
  *  - [[Materializer.Reliable]] — `checkpoint` to the context's
  *    checkpoint directory (HDFS/object store on a real cluster):
  *    survives executor loss — the 100 TB default.
  *  - [[Materializer.Parquet]] — explicit parquet round-trip: durable AND
  *    columnar (consumers get pushdown/pruning on the materialized form),
  *    at the cost of a write job per call. The right choice when the
  *    intermediate (e.g. the postings list) is itself worth keeping.
  */
sealed trait Materializer {
  def apply(df: DataFrame): DataFrame

  /** Release a frame previously returned by [[apply]], promising it will
    * never be read again (e.g. a superseded iteration of a loop). No-op
    * for the in-memory strategies (Spark's storage eviction owns those
    * blocks); [[Materializer.Parquet]] deletes the frame's backing
    * directory — without this, an iterative fold leaks one full copy of
    * its state per round for the life of the driver.
    */
  def release(df: DataFrame): Unit = ()
}

object Materializer {
  case object Inline extends Materializer {
    def apply(df: DataFrame): DataFrame = df
  }

  case object Local extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  /** Lazy [[Local]]: the checkpoint's RESULT stage is deferred to the
    * first action and reused by every later one. Strictly less eager
    * than [[Local]] (whose trailing count computes and stores every
    * block at call time) — but NOT fully job-free at construction:
    * wiring the checkpoint plans the physical RDD, and under AQE
    * (Spark's default) that synchronously materializes the UPSTREAM
    * exchanges so the final stages can be re-planned. The right default
    * when all consumers live inside one returned plan: the intermediate
    * computes exactly once. Same durability trade as [[Local]].
    */
  case object LocalLazy extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
    // r21 measured alternative, REJECTED: a lazy persist(MEMORY_AND_DISK)
    // strategy (job-free at wiring where this one materializes upstream
    // exchanges under AQE) ran the nine-stage funnel 2x SLOWER
    // (interleaved medians 8.37 s vs 4.00 s, identical results) — the
    // un-truncated lineage turns the staged chain into one enormous
    // composite plan whose planning/cache-scan overhead dwarfs the
    // wiring jobs it saves. Lineage truncation is load-bearing here.
  }

  /** Reliable RDD checkpoint. `dir` (when given) is installed as the
    * context's checkpoint directory if none is set yet; with `dir` empty
    * the caller must have called `sc.setCheckpointDir` already.
    */
  final case class Reliable(dir: Option[String] = None) extends Materializer {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        dir.foreach(sc.setCheckpointDir)
      require(sc.getCheckpointDir.nonEmpty,
        "Materializer.Reliable needs a checkpoint dir (pass one or call setCheckpointDir)")
      df.checkpoint()
    }
  }

  /** Parquet round-trip under `dir` (one numbered subdirectory per call).
    * Returned frames are tracked so [[release]] can delete a superseded
    * frame's directory (keyed by reference identity — DataFrame doesn't
    * override equals — and weakly, so frames the caller simply drops
    * don't pin plans in driver memory for the materializer's lifetime;
    * their directories stay, which is Parquet's "worth keeping" intent).
    * Deletion goes through the Hadoop FileSystem of the frame's session,
    * so any warehouse scheme works (local fs, HDFS, object stores).
    */
  final case class Parquet(dir: String) extends Materializer {
    private val n = new AtomicLong()
    private val backing =
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[DataFrame, String]())
    def apply(df: DataFrame): DataFrame = {
      val path = s"$dir/graft_mat_${n.getAndIncrement()}"
      df.write.mode("overwrite").parquet(path)
      val back = df.sparkSession.read.parquet(path)
      backing.put(back, path)
      back
    }
    override def release(df: DataFrame): Unit = {
      val path = backing.remove(df)
      if (path != null) {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        try fs.delete(p, true)
        catch { case _: java.io.IOException => () } // best-effort, like deleteQuietly
      }
    }
  }
}
