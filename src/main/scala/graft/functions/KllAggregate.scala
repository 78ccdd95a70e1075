package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Sketch state: `levels(i)` holds items of weight 2^i (each ≤ k items
  * after normalization); `flips(i)` counts compactions at level i so the
  * kept-index offset alternates (the deterministic MRL de-biasing —
  * always keeping even indices would drift the estimate low). */
case class KllState(levels: List[List[Double]], flips: List[Int])

/** Mergeable quantile sketch — a deterministic KLL-lite (the
  * Munro–Paterson / MRL compactor family; Karnin–Lang–Liberty's KLL is
  * the randomized refinement): values live in level buffers of at most
  * `k` items, where a level-i item represents 2^i original rows; an
  * overflowing buffer sorts, holds back at most one item, and promotes
  * every other remaining item to level i+1 (weight doubles, total weight
  * is conserved EXACTLY — so ranks read from the sketch are ranks out of
  * the true row count N).
  *
  * Runs as a typed Dataset [[Aggregator]]: partial sketches build
  * per-partition (object buffer, no per-row serialization), merge in the
  * combine stage — the same partial/merge contract every built-in
  * aggregate has, so Spark parallelizes it for free. Input is
  * (value, level) so RE-COMPACTING previously flattened part rows rides
  * the same aggregator (insert at the part's own level), which is what
  * makes a stored daily part table fold-able without re-reading raw rows.
  *
  * Size: ≤ k·⌈log₂(N/k)⌉ items regardless of N. Rank error: each level-i
  * compaction displaces ranks by ≤ 2^(i-1); with alternating offsets the
  * worst-case error is ≈ H·N/(2k) for H occupied levels (~1% of N at
  * k=256, N=10⁴ — spec-pinned at ≤ 3%). Compaction is deterministic
  * given an input order; Spark's partial-merge order is not guaranteed,
  * so two runs may produce different (equally bounded) sketches — pin
  * bounds in tests, not bytes. Exact (zero-error) whenever N ≤ k, since
  * nothing ever compacts.
  */
class KllAggregator(k: Int)
    extends Aggregator[(Double, Int), KllState, Seq[(Int, Double)]] {
  require(k >= 2, s"sketch parameter k must be >= 2, got $k")

  override def zero: KllState = KllState(Nil, Nil)

  /** Restore the ≤ k invariant bottom-up. Each level is visited once per
    * call; a compaction pushes at most (size/2) items up, so the cascade
    * terminates with every buffer ≤ k (holdout is a single item). */
  private def normalize(levelsIn: List[List[Double]],
      flipsIn: List[Int]): KllState = {
    val levels = scala.collection.mutable.ArrayBuffer(levelsIn: _*)
    val flips = scala.collection.mutable.ArrayBuffer(flipsIn: _*)
    while (flips.length < levels.length) flips += 0
    var i = 0
    while (i < levels.length) {
      if (levels(i).lengthCompare(k) > 0) {
        val sorted = levels(i).sorted
        val m = sorted.length
        val even = m & ~1
        // odd count: hold the max back at this level (weight conserved)
        val holdout = if (m % 2 == 1) List(sorted(m - 1)) else Nil
        val off = flips(i) & 1
        val promoted = Iterator.range(off, even, 2).map(sorted(_)).toList
        levels(i) = holdout
        flips(i) += 1
        if (i + 1 >= levels.length) { levels += Nil; flips += 0 }
        levels(i + 1) = promoted ::: levels(i + 1)
      }
      i += 1
    }
    KllState(levels.toList, flips.toList)
  }

  private def addAt(st: KllState, v: Double, lvl: Int): KllState = {
    require(lvl >= 0 && lvl < 62, s"level must be in [0, 62), got $lvl")
    val padded =
      if (st.levels.lengthCompare(lvl) > 0) st.levels
      else st.levels ::: List.fill(lvl + 1 - st.levels.length)(Nil)
    val levels = padded.zipWithIndex.map { case (b, i) =>
      if (i == lvl) v :: b else b
    }
    normalize(levels, st.flips)
  }

  override def reduce(st: KllState, in: (Double, Int)): KllState =
    addAt(st, in._1, in._2)

  override def merge(a: KllState, b: KllState): KllState = {
    val n = math.max(a.levels.length, b.levels.length)
    val levels = (0 until n).map { i =>
      (if (a.levels.lengthCompare(i) > 0) a.levels(i) else Nil) :::
        (if (b.levels.lengthCompare(i) > 0) b.levels(i) else Nil)
    }.toList
    val flips = (0 until n).map { i =>
      (if (a.flips.lengthCompare(i) > 0) a.flips(i) else 0) +
        (if (b.flips.lengthCompare(i) > 0) b.flips(i) else 0)
    }.toList
    normalize(levels, flips)
  }

  override def finish(st: KllState): Seq[(Int, Double)] =
    st.levels.zipWithIndex.flatMap { case (buf, i) => buf.map(v => (i, v)) }

  override def bufferEncoder: Encoder[KllState] = ExpressionEncoder[KllState]()
  override def outputEncoder: Encoder[Seq[(Int, Double)]] =
    ExpressionEncoder[Seq[(Int, Double)]]()
}
