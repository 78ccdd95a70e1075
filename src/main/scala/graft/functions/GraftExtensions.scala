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
        if (args.length > 1) intArg(args(1), "bits").toInt else 60)),
    "graft_dhash" -> (args =>
      DhashBits(args.head,
        if (args.length > 1) intArg(args(1), "bits").toInt else 48)),
    // merges table as a comma-separated "a b" pair list literal, e.g.
    // 't h,th e' (SQL has no Seq arg; same convention as word_counts)
    "graft_bpe_token_stats" -> (args => BpeTokenStats(args.head, mergesArg(args(1)))),
    // optional 3rd arg: lossless spaces-as-tokens encoding (default false)
    "graft_bpe_token_ids" -> (args => BpeTokenIds(args.head, mergesArg(args(1)),
      args.length > 2 && boolArg(args(2), "lossless"))),
    "graft_bpe_decode" -> (args => BpeDecodeIds(args.head, mergesArg(args(1)))),
    // --- round-15 kernels (round-16 registration: a pure-SQL deployment
    // could not reach them before) ---
    // grams may arrive unsorted from SQL (the kernel binary-searches a
    // sorted array); SortArray normalizes — same cost class as the scrub
    "graft_span_scrub" -> (args => SpanScrub(args(0),
      org.apache.spark.sql.catalyst.expressions.SortArray(args(1),
        Literal(true)),
      if (args.length > 2) intArg(args(2), "k").toInt else 13)),
    "graft_extract_main" -> (args => ExtractMainContent(args.head,
      if (args.length > 1) intArg(args(1), "minWords").toInt else 5)),
    "graft_script_counts" -> (args => ScriptClassCounts(args.head)),
    // vocabulary as a 'piece score_q' comma-separated literal (the
    // graft_word_counts/BPE-merges convention; pieces with ',' or ' '
    // are not expressible here — use the Column API)
    "graft_unigram_encode" -> (args => UnigramEncode(args.head,
      unigramVocabArg(args(1)),
      if (args.length > 2) longArg(args(2), "unkScoreQ") else -(32L << 16))),
    // DSIR model as two literals: bigram entries 'ctx tok count,…' and
    // context entries 'ctx count,…', plus the vocabulary size
    "graft_dsir_bits" -> (args => DsirBits(args.head,
      dsirModelArg(args(1), args(2), longArg(args(3), "vocab")),
      if (args.length > 4) intArg(args(4), "fracBits").toInt else 16)),
    // URL canonicalization (round 16): not a custom kernel — the rules
    // are pure builtins, composed here at the CATALYST level (an
    // injectFunction builder must return an analyzable Expression; the
    // Column DSL's lazy ColumnNode trees are not). Regex constants are
    // shared with graft.ops.UrlOps — tree equality is spec-pinned.
    "graft_url_canonical" -> (args => urlCanonicalExpr(args.head)),
    "graft_url_host" -> (args => urlHostExpr(args.head)),
    // round-17 URL kernels standalone: percent normalization (the
    // canonicalizer already runs it internally; exposed for callers
    // normalizing bare paths/queries) and the opt-in IDN host fold
    "graft_percent_normalize" -> (args => PercentNormalize(args.head)),
    "graft_idn_ascii" -> (args => IdnAscii(args.head)))

  import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayFilter,
    ArrayJoin, Concat, EqualTo, GreaterThan, If, LambdaFunction, Length,
    Lower, NamedLambdaVariable, Not, RegExpExtract, RegExpReplace, RLike,
    Size, StringSplit, StringTrim, Substring}
  import graft.ops.UrlOps

  private def rr(e: Expression, p: String): Expression =
    RegExpReplace(e, Literal(p), Literal(""))
  private def rex(e: Expression, p: String): Expression =
    RegExpExtract(e, Literal(p), Literal(0))

  /** graft.ops.UrlOps.hostOf at the catalyst level (rule 4). */
  private[graft] def urlHostExpr(u: Expression): Expression = {
    val t2 = rr(rr(rr(StringTrim(u), UrlOps.FragmentRe), UrlOps.SchemeRe),
      UrlOps.ProtoRelRe)
    rr(rr(Lower(rex(t2, UrlOps.HostRe)), UrlOps.WwwRe), UrlOps.DefaultPortRe)
  }

  /** graft.ops.UrlOps.canonicalizeUrl at the catalyst level — the same
    * seven ordered rules over the same shared regex constants
    * (including the r17 percent-normalization fold over
    * [[graft.ops.UrlOps.PercentRules]], behind the same instr guard). */
  private[graft] def urlCanonicalExpr(u: Expression): Expression = {
    val t2 = rr(rr(rr(StringTrim(u), UrlOps.FragmentRe), UrlOps.SchemeRe),
      UrlOps.ProtoRelRe)
    val hostRaw = rex(t2, UrlOps.HostRe)
    val host = rr(rr(Lower(hostRaw), UrlOps.WwwRe), UrlOps.DefaultPortRe)
    val restRaw = Substring(t2, Add(Length(hostRaw), Literal(1)),
      Literal(1 << 30))
    val rest = PercentNormalize(restRaw)
    val path = rex(rest, UrlOps.PathRe)
    val cleanPath = rr(path, UrlOps.TrailingSlashRe)
    val query = If(GreaterThan(Length(rest), Length(path)),
      Substring(rest, Add(Length(path), Literal(2)), Literal(1 << 30)),
      Literal(""))
    val p = NamedLambdaVariable("p", StringType, nullable = true)
    val keep = And(Not(RLike(Lower(p), Literal(UrlOps.TrackingRe))),
      Not(EqualTo(p, Literal(""))))
    val params = ArrayFilter(StringSplit(query, Literal("&"), Literal(-1)),
      LambdaFunction(keep, Seq(p)))
    Concat(Seq(host, cleanPath,
      If(GreaterThan(Size(params), Literal(0)),
        Concat(Seq(Literal("?"), ArrayJoin(params, Literal("&"), None))),
        Literal(""))))
  }

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def unigramVocabArg(e: Expression): UnigramVocab = {
    val entries = strArg(e, "unigram vocab").split(",").toSeq.map { ent =>
      val halves = ent.split(" ")
      require(halves.length == 2, s"each vocab entry must be 'piece score_q', got '$ent'")
      (halves(0), halves(1).toLong)
    }
    graft.ops.TextOps.unigramVocab(entries)
  }

  private def dsirModelArg(pairsE: Expression, ctxE: Expression,
      vocab: Long): DsirModel = {
    val pairs = strArg(pairsE, "dsir pair model").split(",").toSeq.map { ent =>
      val f = ent.split(" ")
      require(f.length == 3, s"each pair entry must be 'ctx tok count', got '$ent'")
      (f(0) + " " + f(1), f(2).toLong)
    }.sortBy(_._1)
    val ctxs = strArg(ctxE, "dsir ctx model").split(",").toSeq.map { ent =>
      val f = ent.split(" ")
      require(f.length == 2, s"each ctx entry must be 'ctx count', got '$ent'")
      (f(0), f(1).toLong)
    }.sortBy(_._1)
    DsirModel(pairs.map(_._1).toArray, pairs.map(_._2).toArray,
      ctxs.map(_._1).toArray, ctxs.map(_._2).toArray, vocab)
  }

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
