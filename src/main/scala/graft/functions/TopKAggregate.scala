package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most `k` (ord, value) pairs kept sorted by
  * (ord DESC, value ASC) — the total order a ranking window would use
  * with `orderBy(ord.desc, value.asc)`. Insertion is a shift into a
  * fixed array (k is small: a top-k query's k), so a group's buffer is
  * O(k) regardless of how many rows it aggregates — unlike a
  * `collect_list` + sort, whose buffer grows with the group.
  */
final class TopKPairsBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val vals = new Array[Long](k)
  var n = 0

  /** Spark's total order for doubles: NaN greatest (ranks FIRST under
    * the descending ord), NaN == NaN, -0.0 == 0.0. */
  @inline private def cmpDouble(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else { // at least one NaN
      val xn = x != x
      val yn = y != y
      if (xn && yn) 0 else if (xn) 1 else -1
    }

  /** < 0 iff (o1, v1) ranks strictly before (o2, v2). */
  @inline private def rankCmp(o1: Double, v1: Long, o2: Double, v2: Long): Int = {
    val c = cmpDouble(o2, o1) // larger ord ranks earlier
    if (c != 0) c else java.lang.Long.compare(v1, v2)
  }

  def insert(o: Double, v: Long): Unit = {
    if (n == k && rankCmp(o, v, ords(k - 1), vals(k - 1)) >= 0) return
    var p = 0
    while (p < n && rankCmp(o, v, ords(p), vals(p)) >= 0) p += 1
    var j = math.min(n, k - 1)
    while (j > p) { ords(j) = ords(j - 1); vals(j) = vals(j - 1); j -= 1 }
    ords(p) = o
    vals(p) = v
    if (n < k) n += 1
  }
}

/** Custom Catalyst aggregate: top-k (ord, value) pairs per group, ranked
  * (ord DESC, value ASC), returned as `array<struct<ord, value>>` in rank
  * order. Replaces the `row_number().over(partitionBy(g).orderBy(...))
  * <= k` idiom: the window SORT-SHUFFLES every candidate row, while this
  * aggregate partial-aggregates map-side into O(k) buffers, so only
  * |groups| × k pairs ever cross the wire — the difference between
  * shuffling all candidates and shuffling the answer.
  *
  * Plans as ObjectHashAggregate (typed-imperative); with group counts in
  * the millions the exec's sort-based fallback can kick in per partition,
  * but it still merges O(k) buffers — the candidate rows themselves are
  * already combined map-side.
  */
case class TopKByOrdPairs(ord: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairsBuffer] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("value", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"ord must be double, got ${ord.dataType}")
    else if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"value must be bigint, got ${value.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(b: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    // null ord/value rows are dropped entirely (a desc window would rank
    // them last and only surface them when a group has < k candidates);
    // NaN ords rank FIRST, matching the window's desc NaN-greatest order
    val o = ord.eval(input)
    val v = value.eval(input)
    if (o != null && v != null)
      b.insert(o.asInstanceOf[Double], v.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < other.n) { b.insert(other.ords(i), other.vals(i)); i += 1 }
    b
  }

  override def eval(b: TopKPairsBuffer): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = InternalRow(b.ords(i), b.vals(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.ords(i)); bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKPairsBuffer(k)
    val n = bb.getInt
    // stored in rank order, so inserts append without shifting
    var i = 0
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByOrdPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByOrdPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByOrdPairs =
    copy(ord = newChildren(0), value = newChildren(1))
  override def prettyName: String = "graft_top_k_by_ord"
}
