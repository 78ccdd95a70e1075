package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

/** Session-extension entry point: registers every graft SQL function at
  * session build time, so a pure-SQL deployment enables them with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` and
  * never has to call [[exprs.registerSql]] from code. The function set
  * and semantics are identical to `registerSql` (spec-pinned).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) =>
      // .toInt at the use sites would silently wrap an out-of-range long
      // (4294967298L -> k=2); fail loudly here instead
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"$what out of int range: $v")
      v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Single source of truth for the SQL surface — shared with
    * [[exprs.registerSql]] so the two registration paths cannot drift. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_char_hash" -> (args => WeightedCharHash(args.head)),
    "graft_shingle_hashes" -> (args =>
      ShingleHashArray(args.head, intArg(args(1), "shingle size").toInt)),
    "graft_dot_long" -> (args => DotProductLong(args(0), args(1))),
    "graft_pq_adc" -> (args => PqAdcScore(args(0), args(1))),
    "graft_unit_quantize" -> (args => UnitQuantizeVector(args.head,
      if (args.length > 1) intArg(args(1), "scale") else 10000L)),
    "graft_quantize" -> (args => QuantizeVector(args.head,
      if (args.length > 1) intArg(args(1), "scale") else 10000L)),
    "graft_top_k" -> (args =>
      TopKByOrdPairs(args(0), args(1), intArg(args(2), "k").toInt)),
    // word list as a comma-separated string literal (SQL has no Seq arg)
    "graft_word_counts" -> (args => WordOccurrenceCounts(args.head, args(1) match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        v.toString.split(",").toSeq
      case other => throw new IllegalArgumentException(
        s"word list must be a string literal, got $other")
    })),
    "graft_normalize" -> (args => NormalizeText(args.head)),
    "graft_hash_embed" -> (args =>
      HashEmbedding(args.head, intArg(args(1), "dim").toInt)),
    "graft_z_interleave" -> (args =>
      ZInterleave(args(0), args(1), intArg(args(2), "bits").toInt)),
    "graft_window_passages" -> (args => WindowPassages(args.head,
      intArg(args(1), "win").toInt,
      if (args.length > 2) intArg(args(2), "stride").toInt else 1)),
    "graft_simhash" -> (args =>
      SimhashBits(args.head,
        if (args.length > 1) intArg(args(1), "bits").toInt else 24)),
    "graft_dhash" -> (args =>
      DhashBits(args.head,
        if (args.length > 1) intArg(args(1), "bits").toInt else 48)),
    // merges table as a comma-separated "a b" pair list literal, e.g.
    // 't h,th e' (SQL has no Seq arg; same convention as word_counts)
    "graft_bpe_token_stats" -> (args => BpeTokenStats(args.head, mergesArg(args(1)))),
    // optional 3rd arg: lossless spaces-as-tokens encoding (default false)
    "graft_bpe_token_ids" -> (args => BpeTokenIds(args.head, mergesArg(args(1)),
      args.length > 2 && boolArg(args(2), "lossless"))),
    "graft_bpe_decode" -> (args => BpeDecodeIds(args.head, mergesArg(args(1)))))

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def mergesArg(e: Expression): Seq[String] = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString.split(",").toSeq.flatMap { pair =>
        val halves = pair.split(" ")
        require(halves.length == 2,
          s"each merge must be 'a b', got '$pair'")
        halves.toSeq
      }
    case other => throw new IllegalArgumentException(
      s"merges must be a string literal, got $other")
  }
}
