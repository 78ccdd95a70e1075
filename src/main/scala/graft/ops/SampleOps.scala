package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and per-group caps for training-data curation.
  *
  * `df.sample` is seed- AND partitioning-dependent (each partition draws
  * from its own stream), so the same call over the same data can keep
  * different rows after a repartition — useless for reproducible corpus
  * builds. Everything here keys the decision on an exact content hash
  * ([[TextOps.charHash]] of a key column), so membership is a pure
  * function of the row: stable across runs, partitionings, engines, and
  * incremental rebuilds, and reproducible by the DuckDB oracle.
  */
object SampleOps {
  private def keyHash(key: Column): Column =
    TextOps.charHash(key.cast("string"))

  /** Shared bucket-count resolution for the packed/sharded layouts:
    * positive = caller-fixed; otherwise `spark.sql.shuffle.partitions`
    * at call time. The AUTO default is deterministic per session CONF,
    * not per data — any layout that is PERSISTED or must reproduce
    * across environments must pass `buckets` explicitly (resizing a
    * cluster typically changes the conf and with it every bucket
    * stream). */
  private def resolveBuckets(df: DataFrame, buckets: Int): Int = {
    val nb = if (buckets > 0) buckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    require(nb > 0, s"resolved bucket count must be > 0, got $nb")
    nb
  }

  /** Deterministic Bernoulli sample at rate num/den: keeps rows whose
    * key-hash lands in the first `num` of `den` residue classes. A row's
    * membership never changes, so downstream incremental jobs see a
    * consistent subset as the corpus grows. Filter only — no shuffle,
    * stays inside whole-stage codegen next to the scan.
    */
  def hashSample(df: DataFrame, key: Column, num: Int, den: Int): DataFrame = {
    require(den > 0 && num >= 0 && num <= den, s"need 0 <= num <= den, got $num/$den")
    df.filter(pmod(keyHash(key), lit(den.toLong)) < num.toLong)
  }

  /** Greedy sequence packing: lay items (documents/chunks with a token
    * count) into fixed-capacity bins — the context-window packing step
    * of training prep. Truly sequential first-fit doesn't parallelize,
    * so items are packed in deterministic content-hash order within
    * `buckets` independent streams: bin = (bucket, exclusive running
    * token sum `div` capacity). An item crossing a capacity boundary
    * charges the overflow to the next bin — bounded overrun of one item
    * per bin, the standard batch-packing trade. Output adds
    * (pack_bucket, bin_seq); one shuffle on the bucket key, windows
    * partitioned per bucket.
    *
    * `buckets` CAPS the parallelism: the per-bucket running-sum window
    * is one task per bucket holding N/buckets rows, so at corpus scale
    * it must track the cluster — the default (`buckets <= 0`) resolves
    * to `spark.sql.shuffle.partitions` at call time, which a correctly
    * tuned job already sizes to the cluster. Pass an explicit count only
    * when downstream layout wants a specific stream count, and keep it
    * ≥ the cluster's parallelism. More buckets = more (slightly less
    * full) bins; membership stays deterministic per (key, buckets) —
    * which means the AUTO default is deterministic per session conf,
    * not per data: any packing that is PERSISTED (or must reproduce
    * across environments) must pass `buckets` explicitly.
    */
  def packBins(df: DataFrame, key: Column, tokenCol: String, capacity: Int,
      buckets: Int = 0): DataFrame = {
    require(capacity > 0, s"need positive capacity, got $capacity")
    val nb = resolveBuckets(df, buckets)
    val h = keyHash(key)
    val bucket = pmod(h, lit(nb.toLong))
    val w = Window.partitionBy(bucket).orderBy(h.asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_bucket", bucket)
      .withColumn("__graft_cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin_seq", expr(s"__graft_cum div $capacity"))
      .drop("__graft_cum")
  }

  /** Materialize [[packBins]] output into one training sequence per bin:
    * members are concatenated in the SAME deterministic hash order the
    * packer used (collect_list is partitioning-ordered, so the collected
    * structs are array_sort-ed by (hash, key) before joining — never
    * rely on collection order). One aggregate keyed by (bucket, bin).
    */
  def materializePacked(packed: DataFrame, key: Column,
      textCol: String): DataFrame = {
    val item = struct(keyHash(key).as("h"), key.as("k"), col(textCol).as("t"))
    packed.groupBy("pack_bucket", "bin_seq")
      .agg(array_sort(collect_list(item)).as("__items"))
      .select(col("pack_bucket"), col("bin_seq"),
        concat_ws(" ", transform(col("__items"), x => x.getField("t")))
          .as("sequence_text"),
        size(col("__items")).cast("long").as("n_items"))
  }

  /** Deterministic size-targeted shard assignment — the last mile after
    * [[packBins]]/[[materializePacked]]: lay sequences into consecutive
    * shards of ~`targetTokens` tokens each, with an assignment that is a
    * pure function of (row content, targetTokens, buckets) — stable
    * across runs, partitionings, and engines. As with [[packBins]], the
    * AUTO bucket default tracks the session conf, so a PERSISTED shard
    * layout must pass `buckets` explicitly or a cluster resize would
    * reshuffle it; null `tokenCol` values weigh 0.
    *
    * Order is the same two-level deterministic hash order [[packBins]]
    * uses — `buckets` independent content-hash streams, (hash, key)
    * within a stream — made GLOBAL by the classic distributed
    * exclusive-prefix-sum: per-bucket running sums (one window per
    * bucket partition, never an unpartitioned window), plus per-bucket
    * exclusive offsets computed from the B-row bucket-total aggregate
    * (collected at plan-build time — B = buckets, cluster-sized, tiny)
    * and broadcast back. `shard_id = (offset + within_bucket_cum) div
    * targetTokens`: shards are globally consecutive, ~targetTokens
    * each, with the usual one-item bounded overrun at boundaries.
    *
    * At 100 TB: one corpus shuffle on the bucket key (the window), one
    * tiny aggregate, one broadcast join — no global sort, no driver
    * data path beyond B longs.
    */
  def assignShards(df: DataFrame, key: Column, tokenCol: String,
      targetTokens: Long, buckets: Int = 0): DataFrame =
    assignShardsTotal(df, key, tokenCol, targetTokens, buckets)._1

  /** [[assignShards]] plus the exact shard count it will produce
    * (`grand total div targetTokens + 1` — shards are globally
    * consecutive cuts of the total token stream), known BEFORE any
    * corpus write from the prefix sum's own driver-side accumulator.
    * The sharded writers pre-check the manifest bound against this, so
    * a mis-sized `targetTokens` refuses up front instead of after the
    * full staged corpus write (hours at 100 TB). */
  private def assignShardsTotal(df: DataFrame, key: Column, tokenCol: String,
      targetTokens: Long, buckets: Int): (DataFrame, Long) = {
    require(targetTokens > 0, s"need positive targetTokens, got $targetTokens")
    val (started, total) =
      withGlobalStartTotal(df, key, col(tokenCol).cast("long"), buckets)
    val assigned = started
      .withColumn("shard_id", expr(s"__start div $targetTokens"))
      .drop("__start")
    (assigned, if (total <= 0L) 0L else (total - 1L) / targetTokens + 1L)
  }

  /** The PRE-write half of the manifest-scale gate: refuse a mis-sized
    * `targetTokens` from the prefix sum's grand total BEFORE the staged
    * corpus write burns hours at 100 TB. Upper bound (a shard is a
    * consecutive token-stream cut, so count ≤ ⌈total/target⌉); the
    * post-write listing check stays the authoritative gate. */
  private def requirePreShardBound(op: String, expected: Long,
      standing: Long, maxShards: Long): Unit = {
    val total = standing + expected
    val breakdown =
      if (standing > 0) s" ($standing standing + ~$expected new)" else ""
    require(total <= maxShards,
      s"$op: ~$total shards$breakdown would exceed the driver-safe " +
        s"manifest bound $maxShards (pre-write estimate from corpus " +
        "tokens / targetTokens) — raise targetTokens, re-shard the " +
        "standing corpus, or raise maxManifestShards deliberately; " +
        "refusing BEFORE the staged corpus write")
  }

  /** The packing ops install a `__ids` working column (ids + separator)
    * before the prefix sum; an input column of that name would be
    * silently overwritten — refuse loudly, like [[withGlobalStart]]'s
    * own reserved names. */
  private def requireNoIdsWorkingCol(df: DataFrame, op: String): Unit =
    require(!df.columns.contains("__ids"),
      s"$op reserves the working column name __ids; " +
        "input already has __ids — rename before packing")

  /** The distributed exclusive-prefix-sum shared by [[assignShards]]
    * and [[packSequences]]: every row's EXCLUSIVE global weight offset
    * (`__start`) in the deterministic two-level content-hash order
    * ([[packBins]]' order made global) — per-bucket running-sum windows
    * (never unpartitioned) plus per-bucket exclusive offsets from the
    * B-row bucket-total aggregate, collected once and broadcast back.
    * Null weights count 0. One corpus shuffle on the bucket key, one
    * tiny aggregate, one broadcast join — no global sort, no driver
    * data path beyond B longs. */
  private def withGlobalStart(df: DataFrame, key: Column, weight: Column,
      buckets: Int): DataFrame =
    withGlobalStartTotal(df, key, weight, buckets)._1

  /** [[withGlobalStart]] plus the corpus GRAND TOTAL weight — already
    * computed by the eager bucket-totals collect (the driver-side
    * prefix sum's accumulator), exposed so callers can pre-check
    * scale dials (e.g. the shard-count bound) BEFORE paying a corpus
    * write, at zero extra jobs. */
  private def withGlobalStartTotal(df: DataFrame, key: Column,
      weight: Column, buckets: Int): (DataFrame, Long) = {
    // the working columns installed below would silently overwrite (and
    // then drop) an input column of the same name — refuse loudly
    val reserved = Seq("__h", "__sb", "__w", "__cum", "__ob", "__off", "__start")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"assignShards reserves working column names ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")} — rename before assigning")
    val nb = resolveBuckets(df, buckets)
    val h = keyHash(key)
    val bucket = pmod(h, lit(nb.toLong))
    // materialize the input ONCE before the two consumers below (the
    // eager bucket-totals collect and the window plan): without this
    // the whole upstream — for the packers, the BPE encode over the
    // corpus — evaluates twice per query (guide §1.2: remove redundant
    // passes before tuning inside them; measured on the pack family)
    val dfm = Materializer.Local(df)
    // B-row totals -> exclusive global offsets (driver-side prefix sum
    // over the bucket ids, the zOrdered one-stats-scan idiom); an
    // all-null bucket sums to NULL -> 0, matching the window side
    val totals = dfm.select(bucket.as("__b"), weight.as("__t"))
      .groupBy("__b").agg(coalesce(sum(col("__t")), lit(0L)).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = (b, acc); acc += t; o }
    val offDf = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(offsets.toSeq.map {
        case (b, o) => org.apache.spark.sql.Row(b, o) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__ob",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy(col("__sb")).orderBy(col("__h").asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = dfm.withColumn("__h", h).withColumn("__sb", bucket)
      .withColumn("__w", weight)
      .withColumn("__cum", coalesce(sum(col("__w")).over(w), lit(0L)))
      .join(broadcast(offDf), col("__sb") === col("__ob"))
      .withColumn("__start", col("__off") + col("__cum"))
      .drop("__h", "__sb", "__w", "__cum", "__ob", "__off")
    (out, acc)
  }

  /** Pack per-row id arrays into fixed-length training sequences —
    * GPT-style example packing over [[graft.ops.TextOps.encodeBpe]]
    * output (or any `array<long>` column): rows are laid out in the
    * SAME deterministic global order as [[assignShards]], each row's
    * ids followed by one `sepId` (the document separator; see
    * [[graft.ops.TextOps.bpeEosId]]), and the global token stream cut
    * into consecutive sequences of exactly `seqLen` ids (only the last
    * may run short). The assignment is a pure function of (content,
    * seqLen, sepId, buckets) — stable across runs, partitionings, and
    * engines, so an incremental rebuild reproduces identical examples.
    * Null arrays pack as the bare separator.
    *
    * Output is the EXPLODED oracle/inspection shape
    * (seq_id, seq_pos, token_id, src_key); [[materializeSequences]]
    * assembles the per-sequence arrays for the trainer. Scale: one
    * bucket-keyed window exchange over the DOC-sized frame + a
    * broadcast offsets join; token-sized rows exist only downstream of
    * the map-only explode (and in materializeSequences' seq_id
    * exchange, whose per-group size is bounded by seqLen). */
  def packSequences(df: DataFrame, key: Column, idsCol: String, seqLen: Int,
      sepId: Long, buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    requireNoIdsWorkingCol(df, "packSequences")
    val ids = concat(
      coalesce(col(idsCol), array().cast("array<long>")), array(lit(sepId)))
    val withIds = df.withColumn("__ids", ids)
    withGlobalStart(withIds, key, size(col("__ids")).cast("long"), buckets)
      .select(key.as("src_key"), col("__start"),
        posexplode(col("__ids")).as(Seq("__p", "token_id")))
      .withColumn("__g", col("__start") + col("__p"))
      .select(expr(s"__g div $seqLen").as("seq_id"),
        expr(s"__g % $seqLen").as("seq_pos"),
        col("token_id"), col("src_key"))
  }

  /** The SFT twin of [[packSequences]]: pack supervised examples —
    * (ids, loss_mask) pairs from [[graft.ops.TextOps.encodeSft]] — into
    * the fixed-length global stream, carrying the mask through. Same
    * shape and cost as packSequences (the ONE corpus exchange moves a
    * row per example; token rows exist only after the explode): global
    * order is the deterministic two-level hash order, `seq_id/seq_pos`
    * from the shared exclusive prefix sum. NO separator is appended —
    * an encodeSft example already ends with its supervised EOS, so the
    * stream is exactly the examples back-to-back and example
    * boundaries are recoverable from the mask-1 EOS tokens. This is
    * concat-and-cut packing (examples MAY straddle sequence
    * boundaries) — the loss mask is what keeps prompt tokens unscored
    * wherever they land; a trainer wanting per-example attention
    * isolation derives segment resets from the EOS positions, the
    * standard packed-SFT contract. Ids and mask must be equal-length —
    * enforced in-plan (a silent zip would truncate supervision).
    * Output: (seq_id, seq_pos, token_id, loss_mask, src_key). */
  def packSftSequences(df: DataFrame, key: Column, idsCol: String,
      maskCol: String, seqLen: Int, buckets: Int = 0): DataFrame =
    sftExplodedWithStart(df, key, idsCol, maskCol, seqLen, buckets)
      .withColumn("__g", col("__start") + col("__p"))
      .select(expr(s"__g div $seqLen").as("seq_id"),
        expr(s"__g % $seqLen").as("seq_pos"),
        col("__tm").getField("t").as("token_id"),
        col("__tm").getField("lm").as("loss_mask"),
        col("src_key"))

  /** The shared exploded (token, mask) stream of the SFT packers:
    * (src_key, __start, __w, __p, __tm) — every example's aligned
    * pairs in the deterministic global order with its exclusive
    * global offset and weight. The zip-mismatch guard (and any
    * `extraGuard`) lives INSIDE the posexplode argument: the generator
    * input defines the row set, so column pruning can never remove a
    * check (a guard projected onto token_id/loss_mask WOULD be pruned
    * for consumers that read neither — count(), seq-length audits —
    * and the phantom padded slot would silently shift every later
    * doc's positions; caught in review). One exists() scan per
    * example, same order as the zip itself. (A per-example
    * size-equality CASE would also reference the lazy encode
    * expression ~4× — the inlining trap this op's first plan audit
    * caught.) */
  private def sftExplodedWithStart(df: DataFrame, key: Column,
      idsCol: String, maskCol: String, seqLen: Int, buckets: Int)
      : DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    require(!df.columns.contains("__pairs"),
      "packSftSequences reserves the working column name __pairs; " +
        "input already has __pairs — rename before packing")
    val ids = coalesce(col(idsCol), array().cast("array<long>"))
    val mask = coalesce(col(maskCol), array().cast("array<int>"))
    // zip_with pads the shorter array with nulls, so a length mismatch
    // surfaces as a null struct slot — refused in the generator input
    val pairs = zip_with(ids, mask, (i, m) => struct(i.as("t"), m.as("lm")))
    val withPairs = df.withColumn("__pairs", pairs)
    val guarded = when(
      !exists(col("__pairs"), p =>
        p.getField("t").isNull || p.getField("lm").isNull),
      col("__pairs"))
      .otherwise(raise_error(lit(
        "packSftSequences: token_ids and loss_mask lengths differ " +
          "(null-padded zip slot) — supervision would silently truncate")))
    withGlobalStart(withPairs, key, size(col("__pairs")).cast("long"), buckets)
      .select(key.as("src_key"), col("__start"),
        size(col("__pairs")).cast("long").as("__w"),
        posexplode(guarded).as(Seq("__p", "__tm")))
  }

  /** [[packSftSequences]] plus a per-token `segment_id` — the example
    * ordinal WITHIN its sequence (0-based), the column a trainer uses
    * to reset attention across packed examples without re-deriving
    * boundaries from EOS positions. Derived from the same layout
    * arithmetic: examples in a sequence are ordered by their global
    * start, so segment_id = dense rank of `__start` among the
    * sequence's example FRAGMENTS — the window ranks one row per
    * (example, covered sequence), so its exchange is doc-sized (≈ one
    * row per example), never token-sized, and its group volume is the
    * sequence's example count (≤ seqLen); tokens explode map-only
    * AFTER the ranking. A straddler's carried tail is segment 0 of
    * the new sequence (its start precedes every start inside it),
    * exactly the standard packed-attention contract. Output:
    * packSftSequences' columns + segment_id; dropping segment_id
    * reproduces packSftSequences bit-for-bit (spec-pinned). */
  def packSftSequencesSegmented(df: DataFrame, key: Column, idsCol: String,
      maskCol: String, seqLen: Int, buckets: Int = 0): DataFrame =
    sftFragmentsWithStart(df, key, idsCol, maskCol, seqLen, buckets)
      .withColumn("segment_id",
        (dense_rank().over(Window.partitionBy(col("seq_id"))
          .orderBy(col("__start"))) - 1).cast("long"))
      .withColumn("__from",
        greatest(lit(0L), col("seq_id") * seqLen - col("__start")))
      .withColumn("__len",
        least(size(col("__z")).cast("long"),
          (col("seq_id") + 1) * seqLen - col("__start")) - col("__from"))
      .select(col("seq_id"), col("segment_id"), col("src_key"),
        col("__start"), col("__from"),
        posexplode(slice(col("__z"), (col("__from") + 1).cast("int"),
          col("__len").cast("int"))).as(Seq("__p", "__tm")))
      .select(col("seq_id"),
        (col("__start") + col("__from") + col("__p") -
          col("seq_id") * seqLen).as("seq_pos"),
        col("__tm").getField("t").as("token_id"),
        col("__tm").getField("lm").as("loss_mask"),
        col("src_key"), col("segment_id"))

  /** One row per (example, covered sequence) with the guarded zipped
    * pairs and the example's global start — the doc-sized fragment
    * frame the segmented/padded packers rank before any token
    * explode. */
  private def sftFragmentsWithStart(df: DataFrame, key: Column,
      idsCol: String, maskCol: String, seqLen: Int, buckets: Int)
      : DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    require(!df.columns.contains("__pairs"),
      "packSftSequences reserves the working column name __pairs; " +
        "input already has __pairs — rename before packing")
    val ids = coalesce(col(idsCol), array().cast("array<long>"))
    val mask = coalesce(col(maskCol), array().cast("array<int>"))
    val pairs = zip_with(ids, mask, (i, m) => struct(i.as("t"), m.as("lm")))
    val withPairs = df.withColumn("__pairs", pairs)
    val guarded = when(
      !exists(col("__pairs"), p =>
        p.getField("t").isNull || p.getField("lm").isNull),
      col("__pairs"))
      .otherwise(raise_error(lit(
        "packSftSequences: token_ids and loss_mask lengths differ " +
          "(null-padded zip slot) — supervision would silently truncate")))
    withGlobalStart(withPairs, key, size(col("__pairs")).cast("long"),
        buckets)
      .filter(size(col("__pairs")) > 0)
      .select(key.as("src_key"), guarded.as("__z"), col("__start"))
      // the guard rides the generator input (size(__z)) — even a
      // count() of fragments forces the mismatch refusal
      .select(col("src_key"), col("__z"), col("__start"),
        explode(sequence(expr(s"__start div $seqLen"),
          expr(s"(__start + size(__z) - 1) div $seqLen"))).as("seq_id"))
  }

  /** NO-STRADDLE padded packing — the variant for trainers that want
    * hard per-example attention isolation WITHOUT segment masking:
    * every example lands entirely inside one sequence, sequences are
    * padded (sparsely — emitted rows are real tokens only; positions
    * absent from a sequence are padding, mask 0 by definition).
    * Deterministic arithmetic layout, no sequential first-fit: the
    * SHIFTED-BOUNDARY reserve scheme. Bins are cut on a VIRTUAL
    * capacity `C' = seqLen − maxExample + 1`: an example goes to
    * sequence `start div C'` and its tokens sit at `g − seq·C'`
    * (g = the global cum position). The bin's examples all START
    * inside a C'-wide window and each is ≤ maxExample long, so
    * content never exceeds `C' − 1 + maxExample = seqLen` — whole
    * examples, no straddle, by arithmetic alone. The reserve is the
    * price: average fill is EXACTLY C' (one bin's overhang is the next
    * bin's deficit — they cancel), so the padding fraction is
    * `(maxExample − 1)/seqLen` vs concat-and-cut's zero (measured at
    * 100×: 11.5% at seqLen 4096, 46% at 1024 with ~470-token examples
    * — BASELINE round-14; still below the 50% a move-straddlers-to-
    * singletons scheme costs at 1024). Hard isolation is priced by the
    * example-to-window ratio: size seqLen ≫ maxExample, or truncate
    * upstream. `maxExample = 0` derives the bound
    * with one tiny aggregate; passing it explicitly skips that job and
    * refuses in-plan if exceeded (the truncation-bound contract).
    * Pure function of (content, seqLen, maxExample, buckets); one
    * corpus exchange (the prefix sum) + one DOC-sized window exchange
    * ranking examples per sequence — tokens explode map-only after.
    * Output: packSftSequencesSegmented's columns. */
  def packSftSequencesPadded(df: DataFrame, key: Column, idsCol: String,
      maskCol: String, seqLen: Int, buckets: Int = 0,
      maxExample: Int = 0): DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    require(maxExample >= 0 && maxExample <= seqLen,
      s"maxExample must be in [0, seqLen]; got $maxExample")
    require(!df.columns.contains("__pairs"),
      "packSftSequencesPadded reserves the working column name __pairs; " +
        "input already has __pairs — rename before packing")
    val ids = coalesce(col(idsCol), array().cast("array<long>"))
    val mask = coalesce(col(maskCol), array().cast("array<int>"))
    val pairs = zip_with(ids, mask, (i, m) => struct(i.as("t"), m.as("lm")))
    val withPairs = df.withColumn("__pairs", pairs)
    val eMax =
      if (maxExample > 0) maxExample.toLong
      else withPairs.agg(max(size(col("__pairs")))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getInt(0).toLong
      }
    require(eMax <= seqLen,
      s"packSftSequencesPadded: largest example ($eMax tokens) exceeds " +
        s"seqLen $seqLen — it can never fit one sequence; raise seqLen " +
        "or chunk the example upstream")
    val cPrime = math.max(1L, seqLen - eMax + 1L)
    val guarded =
      when(exists(col("__pairs"), p =>
          p.getField("t").isNull || p.getField("lm").isNull),
        raise_error(lit(
          "packSftSequencesPadded: token_ids and loss_mask lengths " +
            "differ (null-padded zip slot) — supervision would silently " +
            "truncate")))
      .when(size(col("__pairs")) > eMax, raise_error(concat(
        lit("packSftSequencesPadded: example of "),
        size(col("__pairs")).cast("string"),
        lit(s" tokens exceeds the declared maxExample $eMax — the " +
          "no-straddle guarantee would break; raise maxExample/seqLen " +
          "or truncate upstream"))))
      .otherwise(col("__pairs"))
    // rank EXAMPLES per sequence (doc-sized window exchange), then
    // explode tokens map-only — the segmented packer's discipline
    withGlobalStart(withPairs, key,
        size(col("__pairs")).cast("long"), buckets)
      .select(key.as("src_key"), guarded.as("__z"), col("__start"))
      .withColumn("seq_id", expr(s"__start div $cPrime"))
      .withColumn("segment_id",
        (dense_rank().over(Window.partitionBy(col("seq_id"))
          .orderBy(col("__start"))) - 1).cast("long"))
      .select(col("seq_id"), col("segment_id"), col("src_key"),
        col("__start"), posexplode(col("__z")).as(Seq("__p", "__tm")))
      .select(col("seq_id"),
        (col("__start") + col("__p") - col("seq_id") * cPrime).as("seq_pos"),
        col("__tm").getField("t").as("token_id"),
        col("__tm").getField("lm").as("loss_mask"),
        col("src_key"), col("segment_id"))
  }

  /** The padding-waste row of a [[packSftSequencesPadded]] layout: one
    * aggregate over the packed rows — (n_seqs, n_tokens, capacity
    * tokens = n_seqs · seqLen, waste_ppm). The number the isolation
    * trade is judged by against concat-and-cut's zero. */
  def paddingWaste(packed: DataFrame, seqLen: Int): DataFrame =
    packed.agg(
        countDistinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_tokens"))
      .select(col("n_seqs"), col("n_tokens"),
        (col("n_seqs") * seqLen).as("n_capacity"),
        ((col("n_seqs") * seqLen - col("n_tokens")) * lit(1000000L) /
          (col("n_seqs") * seqLen)).cast("long").as("waste_ppm"))

  /** Pivot [[graft.ops.TextOps.encodePreference]] output into ONE ROW
    * PER PAIR — the shape a DPO trainer actually consumes (chosen and
    * rejected side by side, pair boundary guaranteed by construction):
    * (pair_key, chosen_ids, chosen_mask, rejected_ids, rejected_mask,
    * n_prompt, n_tokens = |chosen| + |rejected|). One pair-keyed
    * aggregate (group volume = 2 rows). Refusals, in-plan on the
    * chosen/weight path so any packing or scoring consumer evaluates
    * them: a pair without exactly one 'chosen' and one 'rejected'
    * branch, and a pair whose masked-0 prompt prefixes DIFFER between
    * branches (length or content) — a DPO objective subtracts the two
    * branch logprobs over a shared prompt, so silent prompt
    * misalignment corrupts every gradient it touches. `n_prompt` is
    * the shared masked-prefix length (first supervised position − 1;
    * an all-masked branch refuses — [[TextOps.encodeSft]] always
    * supervises at least the EOS). */
  def pairPreferenceExamples(encoded: DataFrame, key: Column,
      branchCol: String = "branch", idsCol: String = "token_ids",
      maskCol: String = "loss_mask"): DataFrame = {
    val isC = col(branchCol) === "chosen"
    val isR = col(branchCol) === "rejected"
    val g = encoded
      .select(key.as("pair_key"), col(branchCol),
        col(idsCol).as("__i"), col(maskCol).as("__m"))
      .groupBy(col("pair_key"))
      .agg(
        sum(when(isC, 1L).otherwise(0L)).as("__nc"),
        sum(when(isR, 1L).otherwise(0L)).as("__nr"),
        max(when(isC, struct(col("__i").as("i"), col("__m").as("m"))))
          .as("__c"),
        max(when(isR, struct(col("__i").as("i"), col("__m").as("m"))))
          .as("__r"))
    val ci = col("__c").getField("i")
    val ri = col("__r").getField("i")
    val pc = array_position(col("__c").getField("m"), 1)
    val pr = array_position(col("__r").getField("m"), 1)
    val aligned = pc > 0 && pr === pc &&
      slice(ci, lit(1), (pc - 1).cast("int")) ===
        slice(ri, lit(1), (pc - 1).cast("int"))
    val guardedChosen =
      when(col("__nc") =!= 1L || col("__nr") =!= 1L, raise_error(lit(
          "pairPreferenceExamples: a pair needs exactly one 'chosen' " +
            "and one 'rejected' branch — malformed preference table")))
        .when(!aligned, raise_error(lit(
          "pairPreferenceExamples: branch prompts are not aligned " +
            "(masked-0 prefixes differ in length or content) — a DPO " +
            "pair must share its prompt token-for-token")))
        .otherwise(ci)
    g.select(col("pair_key"),
      guardedChosen.as("chosen_ids"),
      col("__c").getField("m").as("chosen_mask"),
      ri.as("rejected_ids"),
      col("__r").getField("m").as("rejected_mask"),
      (pc - 1).as("n_prompt"),
      (size(guardedChosen) + size(ri)).cast("long").as("n_tokens"))
  }

  /** Pair-aligned DPO packing: [[pairPreferenceExamples]] rows laid
    * into fixed-budget training batches with the deterministic
    * [[packBins]] layout (two-level content-hash order on the pair
    * key, bin = exclusive running token sum div `capacity`). A pair is
    * an ATOMIC row — both branches land in the same batch, adjacent by
    * construction, and no pair can straddle a batch boundary; a pair
    * larger than `capacity` refuses (it could never fit one batch).
    * Bins inherit packBins' bounded one-item overrun at capacity
    * boundaries — the standard batch-packing trade; a trainer padding
    * to a hard token budget sizes `capacity` one max-pair short.
    * Same scale shape as every packed layout here: one bucket-keyed
    * exchange over pair-sized rows, per-bucket running-sum windows,
    * never a global sort. Output: pairPreferenceExamples' columns +
    * (pack_bucket, bin_seq); deterministic per (content, capacity,
    * buckets) — persisted layouts pass `buckets` explicitly. */
  def packPreferencePairs(encoded: DataFrame, key: Column, capacity: Int,
      buckets: Int = 0, branchCol: String = "branch",
      idsCol: String = "token_ids", maskCol: String = "loss_mask")
      : DataFrame = {
    require(capacity > 0, s"need positive capacity, got $capacity")
    val pairs =
      pairPreferenceExamples(encoded, key, branchCol, idsCol, maskCol)
        .withColumn("n_tokens",
          when(col("n_tokens") <= capacity, col("n_tokens"))
            .otherwise(raise_error(concat(
              lit("packPreferencePairs: pair of "),
              col("n_tokens").cast("string"),
              lit(s" tokens exceeds batch capacity $capacity — it can " +
                "never fit one batch; raise capacity or truncate the " +
                "branches upstream")))))
    packBins(pairs, col("pair_key"), "n_tokens", capacity, buckets)
  }

  /** Embedding-slot coordinates for an interleaved multimodal corpus
    * ([[graft.ops.TextOps.encodeMultimodal]] packed through
    * [[packSftSequences]]): each attached medium's image-placeholder
    * token sits at global position `example_start + media_ord`
    * (placeholders lead the example by construction), so its
    * (seq_id, seq_pos) falls out of the SAME prefix sum the packer ran
    * — no join against the packed token stream, no second corpus pass
    * over tokens. `media_ord` orders a doc's attachments by ascending
    * media id (a doc-partitioned window over the attachment table —
    * group volume = attachments per doc). The layout is a pure content
    * function, so running the prefix sum here reproduces the packer's
    * placement exactly (spec-pinned: every alignment coordinate holds
    * an image-placeholder token in the packed stream). Output:
    * (seq_id, seq_pos, src_key, media_ord, mediaIdCol). */
  def multimodalAlignment(encoded: DataFrame, media: DataFrame, key: Column,
      mediaIdCol: String, seqLen: Int, buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    val starts = withGlobalStart(encoded, key, col("n_tokens"), buckets)
      .select(key.as("src_key"), col("__start"), col("n_media"))
    val w = Window.partitionBy(key).orderBy(col(mediaIdCol))
    val ordered = media
      .withColumn("media_ord", row_number().over(w).cast("long") - 1L)
      .select(key.as("src_key"), col("media_ord"), col(mediaIdCol))
    // LEFT join from media: an attachment whose doc key has no encoded
    // row at all (a media table keyed to missing docs) must refuse,
    // not silently vanish — an inner join here would drop those rows
    // with no error, inconsistent with the media_ord guard below
    ordered.join(starts, Seq("src_key"), "left")
      // a media table inconsistent with the one the encode counted
      // (extra attachments, or attachments of unknown docs — __start
      // null from the left join) would otherwise label a TEXT token as
      // an embedding slot or shrink the table silently — refuse on the
      // coordinate path (seq_id/seq_pos derive from __g, so any
      // consumer reading coordinates evaluates the guard; a bare
      // count() of alignment rows does not force it)
      .withColumn("__g",
        when(col("__start").isNull,
          raise_error(lit(
            "multimodalAlignment: media row keyed to a doc absent from " +
              "the encoded corpus — the media table does not match the " +
              "encoded corpus")))
          .when(col("media_ord") < col("n_media"),
            col("__start") + col("media_ord"))
          .otherwise(raise_error(lit(
            "multimodalAlignment: media_ord >= the n_media the encode " +
              "counted — the media table does not match the encoded corpus"))))
      .select(expr(s"__g div $seqLen").as("seq_id"),
        expr(s"__g % $seqLen").as("seq_pos"),
        col("src_key"), col("media_ord"), col(mediaIdCol))
  }

  /** Inverse of [[packSequences]]: reconstruct each source row's id
    * array from the exploded packed stream — the audit path proving a
    * packed corpus still CONTAINS its documents. Each document's
    * tokens are contiguous in the global stream (its ids then exactly
    * one separator), so one src_key-keyed aggregate over
    * (seq_id, seq_pos)-sorted tokens, with the trailing separator
    * sliced off, returns the original arrays: `unpackSequences(
    * packSequences(df, …)) == df`'s (key, coalesce(ids, [])) set
    * exactly — pack is null-coalescing (a null array packs as the
    * bare separator), so a null-ids row comes back EMPTY, not null
    * (spec-pinned; the q_packed_roundtrip oracle closes the full
    * text → ids → packed → ids → text circle byte-for-byte on top of
    * the lossless codec). Same shape/cost notes as
    * [[materializeSequences]] (token-row exchange, per-group volume =
    * document length). Output: (src_key, token_ids, n_tokens). */
  def unpackSequences(packed: DataFrame): DataFrame =
    packed.groupBy("src_key")
      .agg(transform(array_sort(collect_list(struct(col("seq_id"),
          col("seq_pos"), col("token_id")))),
          x => x.getField("token_id")).as("__all"))
      .select(col("src_key"),
        slice(col("__all"), lit(1), size(col("__all")) - 1).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))

  /** Assemble [[packSequences]]' exploded rows into one array per
    * training sequence: (seq_id, token_ids, n_tokens), token ids in
    * sequence order. One seq_id-keyed hash aggregate; per-group volume
    * is bounded by seqLen, so there is no skew dimension. The exchange
    * carries one row per TOKEN — fine for inspection-sized frames; the
    * production writer is [[materializePackedSequences]], whose
    * exchange carries one row per document FRAGMENT instead. */
  def materializeSequences(packed: DataFrame): DataFrame =
    packed.groupBy("seq_id")
      .agg(transform(array_sort(collect_list(struct(col("seq_pos"), col("token_id")))),
          x => x.getField("token_id")).as("token_ids"),
        count(lit(1)).as("n_tokens"))

  /** [[packSequences]] + [[materializeSequences]] fused at FRAGMENT
    * granularity — the production path to trainer-ready rows. Each
    * document (ids + separator, global offset from the shared prefix
    * sum) covers at most ⌈n/seqLen⌉+1 consecutive sequences; a map-only
    * explode emits one (seq_id, in-seq offset, id-slice) row per
    * covered sequence, and one seq_id-keyed aggregate flattens the
    * offset-sorted fragments. Identical output to
    * `materializeSequences(packSequences(…))` (spec-pinned bit-equal)
    * with the exchange carrying ~one row per document instead of one
    * per token — the same bytes of ids move, but ~seqLen× fewer rows
    * and a fragment sort instead of a token sort. */
  def materializePackedSequences(df: DataFrame, key: Column, idsCol: String,
      seqLen: Int, sepId: Long, buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    requireNoIdsWorkingCol(df, "materializePackedSequences")
    val ids = concat(
      coalesce(col(idsCol), array().cast("array<long>")), array(lit(sepId)))
    val withIds = df.withColumn("__ids", ids)
    withGlobalStart(withIds, key, size(col("__ids")).cast("long"), buckets)
      .select(col("__ids"), col("__start"),
        explode(sequence(expr(s"__start div $seqLen"),
          expr(s"(__start + size(__ids) - 1) div $seqLen"))).as("seq_id"))
      // fragment = this sequence's slice of the doc's ids (1-based slice)
      .withColumn("__from", greatest(lit(0L), col("seq_id") * seqLen - col("__start")))
      .withColumn("__len",
        least(size(col("__ids")).cast("long"),
          (col("seq_id") + 1) * seqLen - col("__start")) - col("__from"))
      .withColumn("__off", greatest(lit(0L), col("__start") - col("seq_id") * seqLen))
      .select(col("seq_id"),
        struct(col("__off"),
          slice(col("__ids"), (col("__from") + 1).cast("int"),
            col("__len").cast("int")).as("__frag")).as("__piece"))
      .groupBy("seq_id")
      .agg(flatten(transform(array_sort(collect_list(col("__piece"))),
          x => x.getField("__frag"))).as("token_ids"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Materialize [[assignShards]] into a training-ready sharded corpus:
    * parquet partitioned by `shard_id` (each shard hash-clustered into
    * its own directory/file) plus a byte-stable `_graft_manifest.json`
    * sidecar — `[{path, n_seqs, n_tokens}]` sorted by shard — written
    * INSIDE the staged directory and published with the library's
    * staged swap ([[Pipeline.publishStaged]]): readers never observe a
    * shard dir without its manifest or vice versa. The manifest is
    * driver-built from the per-shard aggregate — shard count =
    * total tokens / targetTokens, so it stays driver-sized only when
    * `targetTokens` is sized WITH the corpus; a guard refuses past
    * `maxManifestShards` (default [[MaxManifestShards]]) — and is a
    * pure function of (content, targetTokens, buckets): re-building on
    * a different partitioning yields identical bytes (spec-pinned).
    * Returns the manifest as a DataFrame (shard_id, path, n_seqs,
    * n_tokens).
    *
    * LOCAL-FILESYSTEM CONTRACT: the staged publish
    * ([[Pipeline.publishStaged]]) and the manifest sidecar use
    * local-file renames/writes — atomic on a POSIX filesystem, the
    * contract of the whole staged-swap family. A remote path
    * (`s3://`, `hdfs://`) would write the parquet data through the
    * Hadoop FS but misplace the manifest and the swap, so it is
    * rejected up front; for object stores use the MANIFEST-AS-COMMIT
    * protocol instead — [[writeShardedCommit]]/[[appendShardedCommit]]
    * /[[readShardedCommit]] — which needs no directory rename at all
    * (shards first under immutable commit dirs, one manifest PUT as
    * the commit point, readers resolve through the manifest only).
    *
    * `textCol` is type-agnostic (it lands in the published `text`
    * column whatever its type): a PACKED token corpus —
    * [[materializePackedSequences]] rows keyed by seq_id with
    * `token_ids` as the payload — shards and publishes exactly like a
    * text corpus (spec-pinned).
    */
  /** Local-filesystem gate for the staged-rename publishers: reject a
    * non-file URI scheme WITHOUT parsing the whole string as a URI —
    * legitimate local paths carry spaces/'%'/backslashes that
    * `URI.create` would throw on. */
  private def requireLocalPath(op: String, path: String): Unit = {
    // colon form, not '://': Hadoop accepts single-slash/opaque scheme
    // URIs (hdfs:/x, s3a:bucket/key) — those must hit this gate too,
    // exactly as URI.create's scheme detection did
    val scheme = "^([A-Za-z][A-Za-z0-9+.-]*):".r
      .findFirstMatchIn(path).map(_.group(1))
    require(scheme.forall(_ == "file"),
      s"$op publishes via local-FS renames; got scheme '${scheme.get}' " +
        s"in '$path' — see the local-filesystem contract in the scaladoc")
  }

  /** Driver-safe shard-count bound for the manifest collect in
    * [[writeSharded]]/[[appendSharded]]: the manifest is one driver row
    * per shard, so shard count — corpus tokens / `targetTokens` — must
    * stay driver-sized. 1M rows ≈ 100 MB of manifest, a comfortable
    * ceiling; at 100 TB (~25T tokens) that means targetTokens ≥ ~25M.
    * Size `targetTokens` WITH the corpus — a fixed small target at a
    * growing corpus walks the shard count into this guard. */
  val MaxManifestShards: Long = 1000000L

  private def requireManifestScale(op: String, stagingDir: String,
      maxShards: Long, standing: Long = 0L): Unit = {
    // partition-dir count = shard count, from a pure listing (shard_id
    // is the partition column — no data read, no extra corpus scan)
    val n = Option(new java.io.File(stagingDir).list())
      .map(_.count(_.startsWith("shard_id="))).getOrElse(0)
    val total = standing + n
    val breakdown = if (standing > 0) s" ($standing standing + $n new)" else ""
    require(total <= maxShards,
      s"$op: $total shards$breakdown exceed the driver-safe manifest " +
        s"bound $maxShards — the manifest is collected to the driver " +
        "(one row per shard); raise targetTokens (shards = corpus " +
        "tokens / targetTokens), re-shard the standing corpus, or " +
        "raise maxManifestShards deliberately")
  }

  def writeSharded(df: DataFrame, key: Column, tokenCol: String,
      textCol: String, path: String, targetTokens: Long,
      buckets: Int, maxManifestShards: Long = MaxManifestShards,
      sidecar: Option[String => Unit] = None): DataFrame = {
    requireLocalPath("writeSharded", path)
    val spark = df.sparkSession
    val (shards, nShards) =
      assignShardsTotal(df, key, tokenCol, targetTokens, buckets)
    requirePreShardBound("writeSharded", nShards, 0L, maxManifestShards)
    val assigned = shards
      .select(col("shard_id"), key.as("seq_key"),
        col(tokenCol).cast("long").as("n_tokens"), col(textCol).as("text"))
    val tmp = path + "__staging"
    assigned
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_key"))
      .write.partitionBy("shard_id").mode("overwrite")
      .option("compression", "zstd").parquet(tmp)
    requireManifestScale("writeSharded", tmp, maxManifestShards)
    // manifest from the JUST-WRITTEN staged parquet (the gate sinks'
    // idiom): one corpus materialization instead of two, and the
    // manifest provably describes the files being published even if the
    // input lineage were nondeterministic. Read back with the KNOWN
    // schema — inference would crash on a zero-row dynamic-partition
    // write (no schema-bearing part file) and would type the shard_id
    // partition column as int.
    val rows = spark.read.schema(assigned.schema).parquet(tmp)
      .groupBy(col("shard_id"))
      // coalesce mirrors assignShards' totals: a shard whose rows all
      // carry NULL token counts (weight 0 by contract) sums to NULL,
      // and getLong below would NPE on the driver
      .agg(count(lit(1)).as("n_seqs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .select(col("shard_id"), concat(lit("shard_id="), col("shard_id")).as("path"),
        col("n_seqs"), col("n_tokens"))
      .orderBy("shard_id").collect()
    val lines = rows.map { r =>
      s"""{"shard_id":${r.getLong(0)},"path":"${r.getString(1)}"""" +
        s""","n_seqs":${r.getLong(2)},"n_tokens":${r.getLong(3)}}"""
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "_graft_manifest.json"),
      lines.mkString("[", ",\n", "]"))
    // sidecar artifacts (e.g. the dense-vocab table) write INTO the
    // staging dir so the swap publishes corpus + sidecars atomically;
    // underscore-prefixed names are invisible to Spark/Hive readers
    sidecar.foreach(write => write(tmp))
    graft.ops.Pipeline.publishStaged(tmp, path)
    // the returned frame is built from the COLLECTED rows — a lazy plan
    // over the staging dir would dangle once the swap renames it away
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_seqs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }


  /** [[materializePackedSequences]] for SUPERVISED corpora — the
    * fragment-fused production materializer of
    * [[graft.ops.TextOps.encodeSft]] / [[TextOps.encodeChat]] /
    * [[TextOps.encodeMultimodal]] output: (ids, mask) pairs packed
    * concat-and-cut (NO separator — a supervised example ends with its
    * own supervised EOS) and assembled into per-sequence arrays with
    * the exchange carrying one row per document FRAGMENT, never per
    * token. The zip-mismatch guard rides the fragment payload (any
    * consumer of the assembled arrays evaluates it); empty examples
    * contribute nothing (and must be filtered before the coverage
    * `sequence(...)`, whose start would otherwise exceed its stop).
    * Spec-pinned bit-equal to assembling
    * `packSftSequences(...)` per sequence. Output:
    * (seq_id, token_ids, loss_mask, n_tokens). */
  def materializePackedSftSequences(df: DataFrame, key: Column,
      idsCol: String, maskCol: String, seqLen: Int,
      buckets: Int = 0): DataFrame = {
    require(seqLen > 0, s"need positive seqLen, got $seqLen")
    require(!df.columns.contains("__pairs"),
      "materializePackedSftSequences reserves the working column name " +
        "__pairs; input already has __pairs — rename before packing")
    val ids = coalesce(col(idsCol), array().cast("array<long>"))
    val mask = coalesce(col(maskCol), array().cast("array<int>"))
    val pairs = zip_with(ids, mask, (i, m) => struct(i.as("t"), m.as("lm")))
    val withPairs = df.withColumn("__pairs", pairs)
    val guarded = when(
      !exists(col("__pairs"), p =>
        p.getField("t").isNull || p.getField("lm").isNull),
      col("__pairs"))
      .otherwise(raise_error(lit(
        "materializePackedSftSequences: token_ids and loss_mask lengths " +
          "differ (null-padded zip slot) — supervision would silently " +
          "truncate")))
    // the zip guard must live INSIDE the generator input (the
    // packSftSequences discipline): the coverage `sequence` below uses
    // size(guarded), so even a consumer that prunes every payload
    // column — count() of sequences — forces the mismatch refusal
    val zz = withGlobalStart(withPairs, key,
        size(col("__pairs")).cast("long"), buckets)
      .filter(size(col("__pairs")) > 0)
      .select(guarded.as("__z"), col("__start"))
      .select(col("__z"), col("__start"),
        explode(sequence(expr(s"__start div $seqLen"),
          expr(s"(__start + size(__z) - 1) div $seqLen"))).as("seq_id"))
      .withColumn("__from",
        greatest(lit(0L), col("seq_id") * seqLen - col("__start")))
      .withColumn("__len",
        least(size(col("__z")).cast("long"),
          (col("seq_id") + 1) * seqLen - col("__start")) - col("__from"))
      .withColumn("__off",
        greatest(lit(0L), col("__start") - col("seq_id") * seqLen))
      .select(col("seq_id"),
        struct(col("__off"),
          slice(col("__z"), (col("__from") + 1).cast("int"),
            col("__len").cast("int")).as("__frag")).as("__piece"))
      .groupBy("seq_id")
      .agg(flatten(transform(array_sort(collect_list(col("__piece"))),
        x => x.getField("__frag"))).as("__zz"))
    zz.select(col("seq_id"),
        transform(col("__zz"), x => x.getField("t")).as("token_ids"),
        transform(col("__zz"), x => x.getField("lm")).as("loss_mask"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Embedding-slot coordinates recovered from MATERIALIZED packed
    * rows by scanning for the placeholder id — the offline/compacted
    * counterpart of [[multimodalAlignment]] (which derives coordinates
    * arithmetically at pack time): one map-only posexplode + filter,
    * no join. For a densified corpus pass the placeholder's DENSE id
    * from the `_graft_specials.parquet` sidecar. Output:
    * (seq_id, seq_pos, slot_ord — the placeholder's ordinal within its
    * sequence). */
  def alignmentFromPacked(packed: DataFrame, imageId: Long): DataFrame =
    packed
      .select(col("seq_id"),
        posexplode(col("token_ids")).as(Seq("seq_pos", "__t")))
      .filter(col("__t") === imageId)
      .withColumn("slot_ord",
        (row_number().over(Window.partitionBy(col("seq_id"))
          .orderBy(col("seq_pos"))) - 1).cast("long"))
      .select(col("seq_id"), col("seq_pos").cast("long").as("seq_pos"),
        col("slot_ord"))

  // =====================================================================
  // Manifest-as-commit publish — the OBJECT-STORE-SAFE protocol.
  //
  // [[writeSharded]]/[[appendSharded]] publish via atomic directory
  // renames — correct on a POSIX filesystem, impossible on S3/GCS where
  // rename is copy+delete. This mode inverts the dependency: shard data
  // writes FIRST under immutable per-commit directories
  // (`data/c<generation>/shard_id=K`), invisible to readers until the
  // single small manifest object (`_graft_manifest.json`, carrying the
  // generation and the full shard list) is PUT LAST as the one commit
  // point. Readers resolve shards EXCLUSIVELY through the manifest —
  // never by directory listing — so a crash between shard write and
  // manifest PUT leaves the old manifest (and thus the old corpus)
  // fully intact, and the orphaned commit directory is swept by the
  // next successful writer. No published object is ever renamed or
  // rewritten; an append adds a new commit dir and a manifest that
  // references old + new shards across commit dirs.
  //
  // Portability seam: all IO goes through the Hadoop FileSystem of the
  // corpus path, so `s3a://`/`gs://`/`hdfs://` paths work as-is. Two
  // steps are atomic locally but only best-effort on plain object
  // stores — the manifest replace (here: write-new + rename; on a real
  // deployment back it with the store's conditional-put/if-match) and
  // the writer lock (O_CREAT|O_EXCL; back with a lease or conditional
  // put). Everything else relies only on "a PUT object appears fully
  // or not at all", which every object store guarantees.
  // =====================================================================

  private val ManifestName = "_graft_manifest.json"

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
      path: String): (org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Strict parse of a commit-mode manifest:
    * `{"generation":G,"shards":[{shard_id,path,n_seqs,n_tokens}...]}`.
    * Every object must parse (the appendSharded discipline — a partial
    * parse would collide shard ids with live unparsed shards). */
  private def parseCommitManifest(text: String): (Long, Array[(Long, String, Long, Long)]) = {
    val gen = """^\s*\{"generation":(\d+),"shards":\[""".r
      .findFirstMatchIn(text).map(_.group(1).toLong)
      .getOrElse(sys.error(
        s"unparseable commit manifest (no generation header): " +
          s"${text.take(80)}..."))
    val entry =
      """\{"shard_id":(\d+),"path":"([^"]*)","n_seqs":(-?\d+),"n_tokens":(-?\d+)\}""".r
    val shards = entry.findAllMatchIn(text).map(m =>
      (m.group(1).toLong, m.group(2), m.group(3).toLong, m.group(4).toLong))
      .toArray.sortBy(_._1)
    val objCount = text.count(_ == '{') - 1 // minus the header object
    require(shards.length == objCount,
      s"commit manifest carries $objCount shard entries but only " +
        s"${shards.length} parsed — refusing to act on it")
    (gen, shards)
  }

  private def renderCommitManifest(gen: Long,
      shards: Seq[(Long, String, Long, Long)]): String =
    shards.map { case (id, p, ns, nt) =>
      s"""{"shard_id":$id,"path":"$p","n_seqs":$ns,"n_tokens":$nt}"""
    }.mkString(s"""{"generation":$gen,"shards":[""", ",\n", "]}")

  private def readCommitManifestOpt(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Option[(Long, Array[(Long, String, Long, Long)])] = {
    val mf = new org.apache.hadoop.fs.Path(root, ManifestName)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      val text = try {
        new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      Some(parseCommitManifest(text))
    }
  }

  /** The manifest PUT — the commit point. Locally an atomic move; on
    * rename-capable filesystems (hdfs://, viewfs://) an atomic
    * FileContext replace — NO delete window, a crash leaves either the
    * old manifest or the new one, never neither. Only on a plain
    * object store with no FileContext binding does a delete+rename
    * window remain, which a real deployment closes with the store's
    * conditional put (this method is the one seam to swap). The
    * no-manifest-but-data state that window can produce is itself
    * guarded: [[writeShardedCommit]] REFUSES to sweep standing commit
    * dirs when no manifest exists (see `assumeCrashedOrphans`). */
  private def putManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, text: String): Unit = {
    val mf = new org.apache.hadoop.fs.Path(root, ManifestName)
    if ("file" == fs.getScheme) {
      val tmp = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(root, ManifestName + "__new").toUri.getPath)
      java.nio.file.Files.createDirectories(tmp.getParent)
      java.nio.file.Files.writeString(tmp, text)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(mf.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root, ManifestName + "__new")
      val out = fs.create(tmp, true)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val replaced =
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            root.toUri, fs.getConf)
          fc.rename(tmp, mf, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          true
        } catch {
          // no AbstractFileSystem binding for this scheme (bare object
          // stores): fall back to the documented delete+rename window
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException => false
        }
      if (!replaced) {
        fs.delete(mf, false)
        if (!fs.rename(tmp, mf)) sys.error(s"failed to publish manifest $mf")
      }
    }
  }

  /** Exclusive writer lock for the read→PUT window (single-writer, the
    * [[appendSharded]] discipline); released in a finally. */
  private def withCommitLock[T](fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)(body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(root, "_graft_commit.lock")
    fs.mkdirs(root)
    val out = try fs.create(lock, false) catch {
      case _: java.io.IOException => throw new IllegalArgumentException(
        s"commit lock $lock already exists — commit-mode writers are " +
          "single-writer (the manifest read -> PUT window must be " +
          "exclusive); if no other writer is running, a previous one " +
          "crashed: remove the lock and re-run")
    }
    out.close()
    try body finally fs.delete(lock, false)
  }

  /** Write a sharded corpus under the MANIFEST-AS-COMMIT protocol (see
    * the section banner above): shards to `data/c<G>/shard_id=K` first,
    * manifest PUT last. `G` is 0 for a fresh corpus, standing
    * generation + 1 when a manifest exists — in which case this is a
    * full REPLACE (the new manifest references only the new commit;
    * prior commit dirs become unreferenced and are swept AFTER the
    * PUT, when no reader resolving through the new manifest can reach
    * them; a reader mid-scan on the old manifest can race that sweep —
    * gate sweeps on reader-lease expiry in a real deployment, the
    * standard snapshot-retention trade). `sidecar` writes into the
    * commit dir, so sidecars version with their corpus. Returns the
    * manifest frame (shard_id, path, n_seqs, n_tokens). */
  def writeShardedCommit(df: DataFrame, key: Column, tokenCol: String,
      textCol: String, path: String, targetTokens: Long,
      buckets: Int, maxManifestShards: Long = MaxManifestShards,
      sidecar: Option[String => Unit] = None,
      assumeCrashedOrphans: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val (fs, root) = hadoopFs(spark, path)
    withCommitLock(fs, root) {
      val standing = readCommitManifestOpt(fs, root)
      // no-manifest-but-data guard: with NO standing manifest, commit
      // dirs on disk are ambiguous — a gen-0 writer that crashed before
      // its first PUT (genuinely orphaned) is indistinguishable from a
      // corpus whose manifest was LOST (the object-store delete+rename
      // window, or operator error), where the data is live and a sweep
      // destroys it. Sweeping on k > -1 unconditionally was the
      // data-loss path; refuse unless the caller asserts the orphan
      // reading explicitly.
      if (standing.isEmpty && !assumeCrashedOrphans) {
        val dirs = listCommitDirs(fs, root)
        require(dirs.isEmpty,
          s"writeShardedCommit: no $ManifestName under $path but commit " +
            s"dirs exist (${dirs.sorted.map("c" + _).mkString(", ")}) — " +
            "either a gen-0 writer crashed before its first PUT (safe to " +
            "sweep) or the manifest was lost and this data is LIVE. " +
            "Refusing to sweep: restore the manifest, or re-run with " +
            "assumeCrashedOrphans=true to delete these dirs.")
      }
      val gen = standing.map(_._1 + 1).getOrElse(0L)
      // sweep earlier CRASHED commits: any data/c<K> with K above the
      // standing generation is a write that never reached its PUT —
      // provably unreferenced (manifests only ever reference commits
      // <= their own generation)
      sweepCommits(fs, root,
        k => k > standing.map(_._1).getOrElse(-1L))
      val (shards, nShards) =
        assignShardsTotal(df, key, tokenCol, targetTokens, buckets)
      requirePreShardBound("writeShardedCommit", nShards, 0L,
        maxManifestShards)
      val commitDir = s"data/c$gen"
      val rows = writeCommitShards(spark, shards, key, tokenCol, textCol,
        path, commitDir, 0L, maxManifestShards, 0L)
      sidecar.foreach(_(new org.apache.hadoop.fs.Path(root, commitDir).toString))
      putManifest(fs, root, renderCommitManifest(gen,
        rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))))
      // sweep prior-generation data only AFTER the commit point
      sweepCommits(fs, root, k => k != gen)
      manifestFrame(spark, rows)
    }
  }

  /** Append under the manifest-as-commit protocol: new shards (ids past
    * the standing corpus's last) land in `data/c<G+1>`, the combined
    * manifest — standing entries verbatim + fresh — is the single PUT.
    * Standing shard objects are never touched; the log-structured
    * bounded-waste trade of [[appendSharded]] applies unchanged. */
  def appendShardedCommit(df: DataFrame, key: Column, tokenCol: String,
      textCol: String, path: String, targetTokens: Long,
      buckets: Int, maxManifestShards: Long = MaxManifestShards): DataFrame = {
    val spark = df.sparkSession
    val (fs, root) = hadoopFs(spark, path)
    withCommitLock(fs, root) {
      val (gen, standing) = readCommitManifestOpt(fs, root).getOrElse(
        throw new IllegalArgumentException(
          s"no $ManifestName under $path — appendShardedCommit extends a " +
            "writeShardedCommit corpus; run writeShardedCommit first"))
      // crashed-append sweep: commit dirs above the standing generation
      // never reached their PUT and are unreferenced
      sweepCommits(fs, root, k => k > gen)
      val offset = standing.lastOption.map(_._1 + 1).getOrElse(0L)
      val (shards, nShards) =
        assignShardsTotal(df, key, tokenCol, targetTokens, buckets)
      requirePreShardBound("appendShardedCommit", nShards,
        standing.length.toLong, maxManifestShards)
      val commitDir = s"data/c${gen + 1}"
      val fresh = writeCommitShards(spark, shards, key, tokenCol, textCol,
        path, commitDir, offset, maxManifestShards, standing.length.toLong)
      val all = standing ++ fresh.map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      putManifest(fs, root, renderCommitManifest(gen + 1, all.sortBy(_._1)))
      manifestFrame(spark,
        all.sortBy(_._1).map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)))
    }
  }

  /** Resolve a commit-mode corpus THROUGH its manifest — the only
    * legitimate read path (directory listing would surface crashed
    * commits). One multi-path parquet scan of exactly the listed shard
    * dirs; `shard_id` recovered from the partition-dir name in the
    * file path (codegen regexp over input_file_name — no per-shard
    * plan blowup at large N). Returns (shard_id, seq_key, n_tokens,
    * text). */
  def readShardedCommit(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (fs, root) = hadoopFs(spark, path)
    val (_, shards) = readCommitManifestOpt(fs, root).getOrElse(
      throw new IllegalArgumentException(
        s"no $ManifestName under $path — not a commit-mode corpus"))
    require(shards.nonEmpty, s"empty corpus manifest under $path")
    val paths = shards.map(s =>
      new org.apache.hadoop.fs.Path(root, s._2).toString)
    spark.read.parquet(paths.toIndexedSeq: _*)
      .withColumn("shard_id",
        regexp_extract(input_file_name(), "shard_id=([0-9]+)", 1)
          .cast("long"))
      .select(col("shard_id"), col("seq_key"), col("n_tokens"), col("text"))
  }

  /** The commit-mode manifest as a frame (shard_id, path, n_seqs,
    * n_tokens) plus its generation, for audits. */
  def readCommitManifest(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, DataFrame) = {
    val (fs, root) = hadoopFs(spark, path)
    val (gen, shards) = readCommitManifestOpt(fs, root).getOrElse(
      throw new IllegalArgumentException(
        s"no $ManifestName under $path — not a commit-mode corpus"))
    (gen, manifestFrame(spark, shards.map(t =>
      org.apache.spark.sql.Row(t._1, t._2, t._3, t._4))))
  }

  /** Generations of the `data/c<K>` commit dirs present on disk. */
  private def listCommitDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] = {
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    if (!fs.exists(dataDir)) Nil
    else fs.listStatus(dataDir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("c")) name.stripPrefix("c").toLongOption else None
    }
  }

  private def sweepCommits(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, dead: Long => Boolean): Unit = {
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("c"))
          name.stripPrefix("c").toLongOption
            .filter(dead).foreach(_ => fs.delete(st.getPath, true))
      }
  }

  /** Write one commit's shards (offset applied) and return the
    * aggregated manifest rows read back from the JUST-WRITTEN data. */
  private def writeCommitShards(spark: org.apache.spark.sql.SparkSession,
      shards: DataFrame, key: Column, tokenCol: String, textCol: String,
      path: String, commitDir: String, offset: Long,
      maxManifestShards: Long, standingCount: Long): Array[org.apache.spark.sql.Row] = {
    val assigned = shards
      .select((col("shard_id") + offset).as("shard_id"), key.as("seq_key"),
        col(tokenCol).cast("long").as("n_tokens"), col(textCol).as("text"))
    val dest = s"$path/$commitDir"
    assigned
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_key"))
      .write.partitionBy("shard_id").mode("overwrite")
      .option("compression", "zstd").parquet(dest)
    val rows = spark.read.schema(assigned.schema).parquet(dest)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_seqs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .select(col("shard_id"),
        concat(lit(s"$commitDir/shard_id="), col("shard_id")).as("path"),
        col("n_seqs"), col("n_tokens"))
      .orderBy("shard_id").collect()
    // authoritative post-write check (the requireManifestScale analog —
    // here the just-written shard count is already in hand)
    require(standingCount + rows.length <= maxManifestShards,
      s"commit-mode write: ${standingCount + rows.length} shards exceed " +
        s"the driver-safe manifest bound $maxManifestShards — raise " +
        "targetTokens or maxManifestShards; the crashed commit dir will " +
        "be swept by the next writer")
    rows
  }

  private def manifestFrame(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_seqs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType, nullable = false))))

  /** The `_graft_vocab.parquet` sidecar writer both corpus builders
    * hand to [[writeSharded]] — one recipe, one filename. */
  private def vocabSidecar(vocab: DataFrame): String => Unit =
    staging => vocab.coalesce(1).write
      .parquet(new java.io.File(staging, "_graft_vocab.parquet").getPath)

  /** The full sidecar set of a trainer-ready corpus: the dense-vocab
    * table PLUS the `_graft_specials.parquet` registry pin —
    * (name, token_id, dense_id) for every [[TextOps.SpecialTokenNames]]
    * entry under the ENCODING merges table, dense_id null when the
    * special never occurs in this corpus. Both write INSIDE the staged
    * swap, so a published corpus always carries the authoritative
    * record of what its specials' ids were: a live merges table
    * extended after publish moves the whole specials block, and
    * re-deriving from it would silently disagree with the stored ids —
    * readers resolve specials through the sidecar, never the registry.
    * The EOS must resolve to a dense id ([[TextOps.denseId]] fails
    * loudly if absent): every packed document carries one, so an
    * unresolvable EOS means the merges passed here are NOT the merges
    * the corpus was encoded with. */
  private[graft] def corpusSidecars(vocab: DataFrame,
      merges: Seq[(String, String)]): String => Unit = staging => {
    vocabSidecar(vocab)(staging)
    TextOps.denseId(vocab, TextOps.bpeEosId(merges))
    TextOps.specialsTable(vocab.sparkSession, merges)
      .join(vocab, Seq("token_id"), "left")
      .select(col("name"), col("token_id"), col("dense_id"))
      .coalesce(1).write
      .parquet(new java.io.File(staging, "_graft_specials.parquet").getPath)
  }

  /** ONE-CALL trainer-ready corpus: the whole round-13 materialization
    * chain — quality filter → exact-dedup keep-first (skipped when
    * `curate = false`: the caller already curated) → byte-faithful
    * LOSSLESS BPE encode → dense [0, V) vocabulary remap → fragment-
    * fused fixed-length packing → sharded atomic publish — with the
    * dense-vocab table written as a `_graft_vocab.parquet` sidecar
    * INSIDE the same staged swap (corpus and vocab appear together or
    * not at all; underscore prefix keeps it invisible to plain
    * `spark.read.parquet(path)` readers, who see only the shards of
    * (shard_id, seq_key = seq_id, n_tokens, text = dense id array)).
    *
    * What a trainer mounts: fixed-`seqLen` examples of contiguous
    * dense ids (separator = the EOS's dense id — its row is in the
    * vocab table), plus the vocab to wire an embedding table and to
    * decode ([[graft.ops.TextOps.densifyIds]] with the swapped table,
    * then [[graft.ops.TextOps.decodeBpe]] under the same merges).
    * Every stage is a pure content function, so a rebuild reproduces
    * the artifact byte-for-byte (spec-pinned); scale shape = the
    * composed q_training_pipeline plan (stressed at 100× as ONE plan,
    * BASELINE round-13) + the writeSharded publish.
    * Returns (manifest, denseVocab). */
  def materializeTrainingCorpus(docs: DataFrame, idCol: String,
      textCol: String, path: String, seqLen: Int, targetTokens: Long,
      buckets: Int,
      merges: Seq[(String, String)] = TextOps.DefaultBpeMerges,
      curate: Boolean = true,
      mat: Materializer = Materializer.Local): (DataFrame, DataFrame) = {
    val survivors =
      if (curate)
        DedupOps.exactDedup(TextOps.qualityFilter(docs, textCol),
          idCol, textCol)
      else docs
    // the encoded frame feeds THREE actions (the vocab collect, the
    // prefix-sum bucket totals, the staged write) — materialize it once
    // instead of re-running filter+dedup+encode per action; at 100 TB
    // pass Materializer.Reliable (executor-loss-safe), the class's
    // standard trade
    val enc = mat(TextOps.encodeBpe(survivors, idCol, textCol, merges,
      lossless = true))
    val vocab = TextOps.denseVocab(enc, "token_ids",
      Seq(TextOps.bpeEosId(merges)))
    val dense = TextOps.densifyIds(enc, "token_ids", vocab)
    val packed = materializePackedSequences(dense, col(idCol),
      "dense_ids", seqLen, TextOps.denseId(vocab, TextOps.bpeEosId(merges)),
      buckets)
    val manifest = writeSharded(packed, col("seq_id"), "n_tokens",
      "token_ids", path, targetTokens, buckets,
      sidecar = Some(corpusSidecars(vocab, merges)))
    (manifest, vocab)
  }

  /** ONE-CALL trainer-ready SUPERVISED corpus — the SFT twin of
    * [[materializeTrainingCorpus]]: quality filter + exact-dedup
    * keep-first on the FULL example (prompt and completion joined on a
    * NUL byte — the pair is the supervision unit, and NUL cannot
    * collide a (prompt, completion) re-split the way a printable
    * separator could; skipped when `curate = false`) → byte-faithful
    * [[graft.ops.TextOps.encodeSft]] (0-masked prompt, 1-masked
    * completion + EOS) → dense [0, V) vocabulary remap →
    * fragment-fused concat-and-cut packing
    * ([[materializePackedSftSequences]]) → sharded atomic publish in
    * the mask-carrying `(t, lm)` struct-stream schema — the SAME
    * published shape the streaming sink
    * ([[graft.streaming.StreamOps.packedSftCorpusSink]]) and
    * [[compactPackedSftEpochs]] emit, so every packed-SFT reader
    * applies unchanged — with the dense vocab and the specials table
    * as `_graft_vocab.parquet` / `_graft_specials.parquet` sidecars
    * inside the same staged swap.
    *
    * Every stage is a pure content function, so a rebuild reproduces
    * the artifact byte-for-byte; scale shape = the composed
    * q_sft_pipeline plan (map-only encode, ONE doc-sized prefix-sum
    * exchange, fragment-granularity assembly) + the writeSharded
    * publish. Returns (manifest, denseVocab). */
  def materializeSftCorpus(docs: DataFrame, idCol: String,
      promptCol: String, completionCol: String, path: String, seqLen: Int,
      targetTokens: Long, buckets: Int,
      merges: Seq[(String, String)] = TextOps.DefaultBpeMerges,
      curate: Boolean = true,
      mat: Materializer = Materializer.Local): (DataFrame, DataFrame) = {
    require(!docs.columns.contains("__sft_text"),
      "materializeSftCorpus reserves the working column name __sft_text " +
        "— rename it before materializing")
    val survivors =
      if (curate) {
        val keyed = docs.withColumn("__sft_text",
          concat_ws("\u0000", coalesce(col(promptCol), lit("")),
            coalesce(col(completionCol), lit(""))))
        DedupOps.exactDedup(TextOps.qualityFilter(keyed, "__sft_text"),
          idCol, "__sft_text").drop("__sft_text")
      } else docs
    // the encoded frame feeds the vocab collect, the prefix-sum totals,
    // and the staged write — materialize once (the
    // materializeTrainingCorpus trade; pass Materializer.Reliable at
    // 100 TB)
    val enc = mat(TextOps.encodeSft(survivors, idCol, promptCol,
      completionCol, merges, lossless = true))
    val vocab = TextOps.denseVocab(enc, "token_ids",
      Seq(TextOps.bpeEosId(merges)))
    val dense = TextOps.densifyIds(enc, "token_ids", vocab)
    val packed = materializePackedSftSequences(dense, col(idCol),
      "dense_ids", "loss_mask", seqLen, buckets)
    val rows = packed.withColumn("text",
        zip_with(col("token_ids"), col("loss_mask"),
          (t, m) => struct(t.as("t"), m.as("lm"))))
      .select(col("seq_id"), col("text"), col("n_tokens"))
    val manifest = writeSharded(rows, col("seq_id"), "n_tokens", "text",
      path, targetTokens, buckets,
      sidecar = Some(corpusSidecars(vocab, merges)))
    (manifest, vocab)
  }

  /** OFFLINE compaction of a [[graft.streaming.StreamOps.packedCorpusSink]]
    * epoch-segmented corpus into ONE dense-id sharded corpus — the
    * batch half of the log-structured contract (stream appends epoch
    * segments; this consumes them). The global token stream is the
    * concatenation of the epoch streams in (epoch, seq_key) order, and
    * it re-cuts WITHOUT unpacking documents: within an epoch every
    * sequence but the last is full, so a token's in-epoch position is
    * just `seq_key · seqLen + pos`, and the cross-epoch offset is a
    * driver-side prefix sum over the E-row epoch-total aggregate (the
    * [[withGlobalStart]] B-row shape — epochs, like buckets, are few).
    * One broadcast offsets join + the [[materializePackedSequences]]
    * fragment trick re-cut the stream with an exchange that carries
    * one row per input-sequence FRAGMENT, never per token; re-cut
    * sequences are exactly `seqLen` (only the corpus-global last may
    * run short) even when each epoch
    * ended with a short tail. Ids densify to [0, V) over the WHOLE
    * standing corpus ([[graft.ops.TextOps.denseVocab]] over observed
    * ids only — a packed stream already contains its EOS, one per
    * document) and the result publishes through [[writeSharded]] with
    * the vocab sidecar in the same atomic swap — byte-identical to
    * re-running the compaction (pure function of the segments).
    * Returns (manifest, denseVocab).
    *
    * `epochSeqLen` is the SEGMENTS' sequence length (how the stream
    * was cut at ingest); `seqLen` is the compacted output's — they may
    * differ (e.g. re-cut 1k-token stream segments into 8k trainer
    * examples). */
  def compactPackedEpochs(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String, epochSeqLen: Int, seqLen: Int,
      targetTokens: Long, buckets: Int,
      merges: Seq[(String, String)] = TextOps.DefaultBpeMerges)
      : (DataFrame, DataFrame) = {
    val segs = readEpochSegments(spark, path)
    val recut = recutEpochSegments(spark, segs, epochSeqLen, seqLen)
    // vocab purely from OBSERVED ids: a packed stream always already
    // contains its EOS (one per document), so there is nothing to
    // reserve — an eosId parameter here could only inject a phantom
    // never-observed id and shift every dense id above it
    val vocab = TextOps.denseVocab(segs, "text")
    // fail FAST on an encoder/corpus disagreement: the EOS id under
    // the caller's merges must be in the observed vocab (every packed
    // document carries one) — refuse before the re-cut corpus write,
    // not at the sidecar step after it
    TextOps.denseId(vocab, TextOps.bpeEosId(merges))
    val packed = TextOps.densifyIds(
        recut.withColumnRenamed("__zz", "__sparse"),
        "__sparse", vocab, "token_ids")
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
    // specials pinned from the ENCODER's merges: the EOS-resolves
    // guard inside corpusSidecars is the "compacted corpus can never
    // disagree with its encoder about a special id" contract
    val manifest = writeSharded(packed, col("seq_id"), "n_tokens",
      "token_ids", outPath, targetTokens, buckets,
      sidecar = Some(corpusSidecars(vocab, merges)))
    (manifest, vocab)
  }

  /** The SUPERVISED twin of [[compactPackedEpochs]], for epoch
    * segments written by the mask-carrying sinks
    * ([[graft.streaming.StreamOps.packedSftCorpusSink]] /
    * `packedMultimodalCorpusSink`): `text` is an array of (t, lm)
    * structs, re-cut by the SAME fragment arithmetic (the slice is
    * element-type-agnostic — the mask can never desynchronize from its
    * token because they travel as one struct), ids densified INSIDE
    * the structs over the corpus-wide observed vocabulary, specials
    * pinned via the sidecar. Mask totals are conserved exactly
    * (spec-pinned). Returns (manifest, denseVocab); the published
    * `text` column stays the zipped struct array — unzip with
    * `transform(text, x -> x.t)` / `x.lm`. */
  def compactPackedSftEpochs(spark: org.apache.spark.sql.SparkSession,
      path: String, outPath: String, epochSeqLen: Int, seqLen: Int,
      targetTokens: Long, buckets: Int,
      merges: Seq[(String, String)] = TextOps.DefaultBpeMerges)
      : (DataFrame, DataFrame) = {
    val segs = readEpochSegments(spark, path)
    val recut = recutEpochSegments(spark, segs, epochSeqLen, seqLen)
    val vocab = TextOps.denseVocab(
      segs.withColumn("__ids",
        transform(col("text"), x => x.getField("t"))), "__ids")
    TextOps.denseId(vocab, TextOps.bpeEosId(merges))
    val packed = TextOps.densifyIds(
        recut.withColumn("__sparse",
          transform(col("__zz"), x => x.getField("t"))),
        "__sparse", vocab, "__dense")
      .withColumn("text",
        zip_with(col("__dense"),
          transform(col("__zz"), x => x.getField("lm")),
          (t, m) => struct(t.as("t"), m.as("lm"))))
      .withColumn("n_tokens", size(col("text")).cast("long"))
      .select(col("seq_id"), col("text"), col("n_tokens"))
    val manifest = writeSharded(packed, col("seq_id"), "n_tokens",
      "text", outPath, targetTokens, buckets,
      sidecar = Some(corpusSidecars(vocab, merges)))
    (manifest, vocab)
  }

  private def readEpochSegments(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("epoch").cast("long").as("__e"),
        col("seq_key").cast("long").as("__s"),
        col("n_tokens").cast("long").as("__n"), col("text"))

  /** The shared re-cut core of the epoch compactors: validate the
    * segment set and re-cut the concatenated epoch streams at fragment
    * granularity into (seq_id, __zz) — `__zz` keeps `text`'s element
    * type, so the same arithmetic serves plain id streams and zipped
    * (t, lm) supervised streams. */
  private def recutEpochSegments(spark: org.apache.spark.sql.SparkSession,
      segs: DataFrame, epochSeqLen: Int, seqLen: Int): DataFrame = {
    require(epochSeqLen > 0 && seqLen > 0, "sequence lengths must be > 0")
    // ONE segment-sized aggregate (no token rows) yields both the
    // validation facts and the epoch totals. The position arithmetic is
    // valid ONLY for a well-formed `epochSeqLen`-cut segment set:
    // per epoch, seq_keys must be the contiguous distinct 0..N−1, every
    // sequence must be exactly epochSeqLen except at most ONE, and that
    // one must be the LAST — anything else (a stream reconfigured
    // mid-life, a hand-repacked or corrupted segment) would silently
    // mis-cut every token after the first mismatch; fail loudly instead.
    val perEpoch = segs.groupBy("__e")
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__t"),
        count(lit(1)).as("__c"),
        countDistinct(col("__s")).as("__d"),
        max(col("__s")).as("__m"),
        sum(when(col("__n") > epochSeqLen, 1L).otherwise(0L)).as("__over"),
        sum(when(col("__n") =!= epochSeqLen, 1L).otherwise(0L)).as("__nshort"),
        max(when(col("__n") =!= epochSeqLen, col("__s"))).as("__shortAt"))
      .collect()
    val bad = perEpoch.filter { r =>
      val (t, c, d, m) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (over, nshort) = (r.getLong(5), r.getLong(6))
      val shortAt = if (r.isNullAt(7)) -1L else r.getLong(7)
      over > 0 || nshort > 1 || d != c || m != c - 1 ||
        (nshort == 1 && shortAt != m) || t <= 0
    }.map(_.getLong(0))
    require(bad.isEmpty,
      s"compactPackedEpochs: epochs ${bad.mkString(", ")} are not " +
        s"well-formed $epochSeqLen-cut segments (contiguous seq_keys, " +
        "all-but-last exactly epochSeqLen, short one last) — pass the " +
        "seqLen the segments were actually ingested with, and only " +
        "compact segments this library published")
    // E-row epoch totals -> exclusive cross-epoch offsets (driver-side
    // prefix over epochs, the bucket-offsets shape)
    val totals = perEpoch.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (e, t) => val o = (e, acc); acc += t; o }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map {
        case (e, o) => org.apache.spark.sql.Row(e, o) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__oe",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // fragment-granularity re-cut, exactly [[materializePackedSequences]]'
    // shape: each input sequence (array + its arithmetic global start)
    // covers ≤ ⌈epochSeqLen/seqLen⌉+1 output sequences — emit one
    // (seq_id, offset, slice) row per covered sequence map-only and
    // flatten per output sequence, so the exchange carries fragments,
    // not tokens; the compactors' dense remap then rides the codegen
    // array kernel ([[graft.functions.RemapIds]] — loud on a miss)
    // over the assembled arrays
    val frags = segs
      .filter(col("__n") > 0)
      .join(broadcast(offDf), col("__e") === col("__oe"))
      // in-epoch position of a sequence's first token: every sequence
      // below it in seq_key order is FULL (only each epoch's last runs
      // short, and nothing sits above it)
      .withColumn("__g0", col("__off") + col("__s") * epochSeqLen)
      .select(col("text"), col("__g0"), col("__n"),
        explode(sequence(expr(s"__g0 div $seqLen"),
          expr(s"(__g0 + __n - 1) div $seqLen"))).as("seq_id"))
      .withColumn("__from",
        greatest(lit(0L), col("seq_id") * seqLen - col("__g0")))
      .withColumn("__len",
        least(col("__n"), (col("seq_id") + 1) * seqLen - col("__g0")) -
          col("__from"))
      .withColumn("__o", greatest(lit(0L), col("__g0") - col("seq_id") * seqLen))
      .select(col("seq_id"),
        struct(col("__o"),
          slice(col("text"), (col("__from") + 1).cast("int"),
            col("__len").cast("int")).as("__frag")).as("__piece"))
    frags.groupBy("seq_id")
      .agg(flatten(transform(array_sort(collect_list(col("__piece"))),
        x => x.getField("__frag"))).as("__zz"))
  }

  /** Deterministic per-epoch training permutation WITHOUT a global
    * sort: every row gets its dense position (`epoch_pos`, 0-based) in
    * the epoch-keyed content-hash order — order key =
    * charHash("<epoch>#<key>"), made global by the same two-level
    * distributed exclusive-prefix-sum as [[assignShards]] with weight 1.
    * Different epochs draw statistically independent permutations;
    * the same (content, epoch, buckets) reproduces the same positions
    * across runs, partitionings, and engines — the resumable-training
    * data-order contract. A trainer shards the epoch stream by
    * `epoch_pos div n` and can re-derive any worker's slice after a
    * restart. One bucket-keyed exchange + a broadcast offsets join —
    * no global range exchange, no driver data path beyond B longs. */
  def epochShuffle(df: DataFrame, key: Column, epoch: Long,
      buckets: Int = 0): DataFrame = {
    // the rename below would otherwise produce a frame with TWO
    // epoch_pos columns (ambiguous-reference errors downstream) — the
    // same loud refusal withGlobalStart applies to its working columns
    require(!df.columns.contains("epoch_pos"),
      "epochShuffle reserves the output column name epoch_pos; " +
        "input already has epoch_pos — rename before shuffling")
    // a null key must not silently collapse onto the bare epoch prefix
    // (concat_ws skips nulls): every null-key row would share one order
    // key and take a PHYSICAL-order-dependent position — the exact
    // nondeterminism this op exists to remove. Fail at the row instead.
    val ek = when(key.isNull, raise_error(lit(
        "epochShuffle: null key — a stable epoch order needs a non-null key per row")))
      .otherwise(concat_ws("#", lit(epoch), key.cast("string")))
    withGlobalStart(df, ek, lit(1L), buckets)
      .withColumnRenamed("__start", "epoch_pos")
  }

  /** Incremental day-append for a published [[writeSharded]] corpus:
    * shard a NEW batch into shards numbered AFTER the standing corpus's
    * last shard and publish atomically — the standing shard files are
    * never rewritten, re-read, or re-hashed; only the manifest is
    * re-written to cover old + new. The batch lays out by the SAME
    * deterministic assignment as a fresh [[assignShards]] of the batch
    * plus a constant shard offset, so an append is a pure function of
    * (standing manifest, batch content, dials). The standing corpus's
    * last shard may sit under target; appends never top it up — topping
    * up would rewrite a published file — so the bounded waste is one
    * partial shard per append (the log-structured trade; re-shard with
    * [[writeSharded]] when fragmentation matters).
    *
    * Publish discipline: new shard dirs write into an append-staging
    * dir (stale staging from a crashed append is cleared first), then
    * move INTO the live dir one rename per shard (each atomic; ids
    * disjoint from the standing set by construction), and the combined
    * manifest swaps in LAST via rename. A reader holding the old
    * manifest never references a missing shard; a crash mid-append
    * leaves the old manifest valid and at worst some orphan shard dirs,
    * which the NEXT successful append deletes after its swap (any live
    * shard id >= its offset absent from its fresh set is provably
    * unreferenced) — directory-listing readers (plain
    * `spark.read.parquet`) can surface orphan rows only in the window
    * between a crash and the next append; manifest-driven reads never
    * do. Appends are SINGLE-WRITER, enforced by an exclusive
    * `_graft_append.lock` beside the manifest held for the whole
    * read -> swap window (a crash leaves the lock behind; the refusal
    * message says how to clear it). Same local-filesystem contract
    * as [[writeSharded]]. Returns the combined manifest. */
  def appendSharded(df: DataFrame, key: Column, tokenCol: String,
      textCol: String, path: String, targetTokens: Long,
      buckets: Int, maxManifestShards: Long = MaxManifestShards): DataFrame = {
    requireLocalPath("appendSharded", path)
    val spark = df.sparkSession
    val mf = java.nio.file.Paths.get(path, "_graft_manifest.json")
    require(java.nio.file.Files.exists(mf),
      s"no _graft_manifest.json under $path — appendSharded extends a " +
        "writeSharded corpus; run writeSharded for the first build")
    // SINGLE-WRITER lock for the whole manifest-read -> swap window
    // (atomic O_CREAT|O_EXCL): two concurrent appends would read the
    // same manifest, compute the SAME shard offset, and the second
    // would destroy the first's just-published shards before silently
    // dropping its rows from the final manifest
    val lock = new java.io.File(path, "_graft_append.lock")
    require(lock.createNewFile(),
      s"append lock $lock already exists — appendSharded is " +
        "single-writer (the manifest read -> swap window must be " +
        "exclusive); if no other append is running, a previous one " +
        "crashed: remove the lock file and re-run")
    try {
    val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_seqs",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    // strict driver-side parse of the sidecar we wrote (manifest size =
    // shard count, bounded): a partial parse here would compute a shard
    // offset colliding with a LIVE unparsed shard and overwrite it —
    // every JSON object must parse, not merely one
    val mfText = java.nio.file.Files.readString(mf)
    val entry =
      """\{"shard_id":(\d+),"path":"([^"]*)","n_seqs":(-?\d+),"n_tokens":(-?\d+)\}""".r
    val standing = entry.findAllMatchIn(mfText).map(m =>
      org.apache.spark.sql.Row(m.group(1).toLong, m.group(2),
        m.group(3).toLong, m.group(4).toLong)).toArray.sortBy(_.getLong(0))
    val objCount = mfText.count(_ == '{')
    require(standing.length == objCount,
      s"manifest at $mf carries $objCount entries but only " +
        s"${standing.length} parsed — refusing to append against it")
    // a brace-free corrupt manifest (truncated to zero bytes, 'null',
    // '[') sails past the count equality at 0 == 0: only the literal
    // empty manifest legitimately parses to nothing
    require(standing.nonEmpty || mfText.trim == "[]",
      s"unparseable manifest at $mf — refusing to append against it")
    val offset = standing.lastOption.map(_.getLong(0) + 1).getOrElse(0L)
    val staging = path + "__append_staging"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    val (shards, nShards) =
      assignShardsTotal(df, key, tokenCol, targetTokens, buckets)
    requirePreShardBound("appendSharded", nShards, standing.length.toLong,
      maxManifestShards)
    val assigned = shards
      .select((col("shard_id") + offset).as("shard_id"), key.as("seq_key"),
        col(tokenCol).cast("long").as("n_tokens"), col(textCol).as("text"))
    assigned
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq_key"))
      .write.partitionBy("shard_id").mode("overwrite")
      .option("compression", "zstd").parquet(staging)
    requireManifestScale("appendSharded", staging, maxManifestShards,
      standing.length.toLong)
    val fresh = spark.read.schema(assigned.schema).parquet(staging)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_seqs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
      .select(col("shard_id"), concat(lit("shard_id="), col("shard_id")).as("path"),
        col("n_seqs"), col("n_tokens"))
      .orderBy("shard_id").collect()
    fresh.foreach { r =>
      val dir = s"shard_id=${r.getLong(0)}"
      val dst = new java.io.File(path, dir)
      // disjoint by construction; an existing dst means a prior append
      // crashed after moving this shard but before the manifest swap —
      // the orphan is unreferenced, replace it with this run's copy
      if (dst.exists()) org.apache.commons.io.FileUtils.forceDelete(dst)
      if (!new java.io.File(staging, dir).renameTo(dst))
        sys.error(s"failed to move $dir into $path")
    }
    val all = (standing ++ fresh).sortBy(_.getLong(0))
    val lines = all.map { r =>
      s"""{"shard_id":${r.getLong(0)},"path":"${r.getString(1)}"""" +
        s""","n_seqs":${r.getLong(2)},"n_tokens":${r.getLong(3)}}"""
    }
    val mfNew = java.nio.file.Paths.get(path, "_graft_manifest.json__new")
    java.nio.file.Files.writeString(mfNew, lines.mkString("[", ",\n", "]"))
    java.nio.file.Files.move(mfNew, mf,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // crash-orphan sweep: a PRIOR crashed append can have moved shard
    // dirs into the live path that its (never-swapped) manifest doesn't
    // cover; directory-listing readers (plain spark.read.parquet) would
    // surface those rows forever. Any live id >= offset absent from
    // this append's fresh set is provably unreferenced — the standing
    // manifest tops out below offset and the new one adds only `fresh`.
    val published = fresh.map(_.getLong(0)).toSet
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter { f =>
        f.isDirectory && f.getName.startsWith("shard_id=") &&
          f.getName.stripPrefix("shard_id=").toLongOption
            .exists(i => i >= offset && !published.contains(i))
      }.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    spark.createDataFrame(
      spark.sparkContext.parallelize(all.toSeq, 1), manifestSchema)
    } finally lock.delete()
  }

  /** Stratified deterministic sampling: a per-group keep-rate (per
    * mille), with groups absent from the map keeping the `default`. The
    * C4/multilingual rebalancing shape — downsample the over-represented
    * languages/domains, keep the rest — with [[hashSample]]'s guarantee
    * that membership is a pure row function. Still a single codegen
    * filter against the scan: the rate table compiles into a CASE chain.
    */
  def stratifiedHashSample(df: DataFrame, groupCol: String, key: Column,
      perMille: Map[String, Int], default: Int = 1000): DataFrame = {
    require((default +: perMille.values.toSeq).forall(r => r >= 0 && r <= 1000),
      s"rates must be in [0, 1000]: $perMille / $default")
    val rate = perMille.foldLeft(lit(default)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(pmod(keyHash(key), lit(1000L)) < rate)
  }

  /** Temperature-flattened mixture sampling (α = 0.5): downsample each
    * group (language/domain/source) to a share proportional to √n_g —
    * the standard multilingual/data-mixing rebalance that keeps
    * long-tail groups visible without letting the head dominate. The
    * caller gives a row `budget`; group g's target is
    * budget · w_g / Σw where w_g = ⌊√n_g⌋, realized as a deterministic
    * [[hashSample]]-style parts-per-million rate so membership stays a
    * pure row function (stable across runs, partitionings, engines).
    *
    * Everything is EXACT integer arithmetic — ⌊√n⌋ is one correctly-
    * rounded IEEE op on an exact integer, and rates are integer
    * divisions — so the DuckDB oracle reproduces membership bit-for-bit
    * (a general α would need a correctly-rounded `pow`, which neither
    * engine guarantees). Bounds: budget · w_g and target · SCALE must
    * stay under 2⁶³ — safe for budget ≤ 10¹², n_g ≤ 10¹².
    *
    * Shape: one tiny per-group count aggregate, broadcast back, then a
    * codegen filter at the scan — the corpus is never shuffled.
    */
  def temperatureSample(df: DataFrame, groupCol: String, key: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val Scale = 1000000L
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val rates = counts
      .withColumn("__tw", counts.agg(sum(col("__w"))).scalar())
      .withColumn("__thr", least(lit(Scale),
        expr(s"(($budget * __w) div __tw) * $Scale div __n")))
      .select(col(groupCol).as("__g"), col("__thr"))
    // null-safe join: a null group is a group like any other (groupBy
    // counted it and priced it a rate) — a plain equi-join would
    // silently drop every null-group row
    df.join(broadcast(rates), col(groupCol) <=> col("__g"))
      .filter(pmod(keyHash(key), lit(Scale)) < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Token-share-targeted mixture rates — the rate table behind
    * [[rebalanceToShares]], exposed for inspection and for reuse across
    * incremental builds. Given relative target weights per group (the
    * Pile/LLaMA-style mixture table: en 50%, zh 30%, de 20% ⇒
    * `Map("en"→500, "zh"→300, "de"→200)`; any positive scale works —
    * weights are normalized by their sum in exact integer arithmetic),
    * compute the per-group keep-threshold (parts per million of the key
    * hash space) of the LARGEST downsample-only corpus realizing those
    * token shares: output total T_out = min_g ⌊T_g·Σw / w_g⌋ (the group
    * that binds keeps everything; every other group downsamples to its
    * share of T_out). Groups absent from `targetWeights` — including a
    * null group, which no string key can name — get no rate and are
    * dropped by the rebalance; groups named in the map but absent from
    * the data constrain nothing.
    *
    * All integer divisions — T_out, per-group target tokens, and the
    * ppm threshold are exact — so the DuckDB oracle reproduces the
    * table bit-for-bit. Bounds: T_g·Σw and per-group target·10⁶ must
    * stay under 2⁶³ — safe for per-group token counts ≤ 9·10¹² at
    * Σw ≤ 10⁶. Null token values weigh 0 ([[assignShards]]'s
    * convention). Shape: one group-sized aggregate; the corpus is
    * touched once and never shuffled.
    *
    * The RATES are exact; the REALIZED token share of a hash-sampled
    * subset converges to the target as rows per group grow (membership
    * is decided per row while mass is priced per token — the same
    * law-of-large-numbers contract every deterministic hash sampler
    * here carries).
    */
  def mixtureRates(df: DataFrame, groupCol: String, tokenCol: String,
      targetWeights: Map[String, Long]): DataFrame =
    mixtureRates(df, groupCol, tokenCol, targetWeights, 0L)

  /** [[mixtureRates]] with an output-size cap: `budgetTokens > 0` caps
    * the realized total at `min(feasible T_out, budgetTokens)` — the
    * phase-budget form behind [[mixtureSchedule]], where a phase wants
    * its token shares AND a bounded size (an annealing phase is "20 B
    * tokens at the high-quality mixture", not "as much as fits").
    * `budgetTokens = 0` means uncapped (the largest downsample-only
    * corpus, identical to the 4-arg form). Same exact integer
    * arithmetic, same one-group-sized-aggregate shape.
    */
  def mixtureRates(df: DataFrame, groupCol: String, tokenCol: String,
      targetWeights: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(targetWeights.nonEmpty, "need at least one target group")
    require(targetWeights.values.forall(_ > 0),
      s"target weights must be positive: $targetWeights")
    require(budgetTokens >= 0L,
      s"budgetTokens must be >= 0 (0 = uncapped), got $budgetTokens")
    val sumW = targetWeights.values.sum
    require(sumW <= 1000000L, s"sum of target weights must be <= 10^6, got $sumW")
    val Scale = 1000000L
    val wExpr = targetWeights.foldLeft(lit(null).cast("long")) {
      case (acc, (g, w)) => when(col(groupCol) === g, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(col(groupCol))
      .agg(coalesce(sum(col(tokenCol).cast("long")), lit(0L)).as("n_tokens"))
      .withColumn("__w", wExpr)
      .filter(col("__w").isNotNull && col("n_tokens") > 0L)
    val feasible = counts.agg(min(expr(s"(n_tokens * ${sumW}L) div __w"))).scalar()
    val tout = if (budgetTokens > 0L) least(feasible, lit(budgetTokens))
      else feasible
    counts
      .withColumn("__tout", tout)
      .withColumn("thr_ppm", least(lit(Scale),
        expr(s"((__tout * __w) div ${sumW}L) * ${Scale}L div n_tokens")))
      .select(col(groupCol), col("n_tokens"), col("thr_ppm"))
  }

  /** Rebalance a corpus to prescribed per-group TOKEN shares by
    * deterministic downsampling — [[temperatureSample]]'s machinery
    * pointed at an explicit mixture table instead of a temperature:
    * keep rows whose key hash lands under the group's
    * [[mixtureRates]] threshold. Membership is a pure row function
    * (stable across runs, partitionings, engines, incremental
    * rebuilds); groups outside the mixture — null included — are
    * dropped. Two corpus passes (one tiny rate aggregate + one codegen
    * filter at the scan via a broadcast rate join); no shuffle of the
    * corpus.
    */
  def rebalanceToShares(df: DataFrame, groupCol: String, key: Column,
      tokenCol: String, targetWeights: Map[String, Long]): DataFrame = {
    val Scale = 1000000L
    val rates = mixtureRates(df, groupCol, tokenCol, targetWeights)
      .select(col(groupCol).as("__g"), col("thr_ppm"))
    df.join(broadcast(rates), col(groupCol) === col("__g"))
      .filter(pmod(keyHash(key), lit(Scale)) < col("thr_ppm"))
      .select(df.columns.map(col): _*)
  }

  /** One phase of an annealed mixture schedule: a name, the token-share
    * target weights for the phase (the [[mixtureRates]] contract), and
    * an optional token budget (0 = the largest downsample-only corpus
    * at those shares). */
  final case class MixturePhase(name: String,
      targetWeights: Map[String, Long], budgetTokens: Long = 0L)

  /** Annealed mixture schedule — the multi-phase form of
    * [[rebalanceToShares]]: pretraining curricula shift the domain
    * mixture over training (e.g. a long natural-mixture phase, then a
    * short "anneal" phase upweighting high-quality sources — the
    * LLaMA-3/MiniCPM-style two-stage recipe), so each phase carries its
    * OWN target shares and token budget. Returns the union of the
    * per-phase samples with `phase_ord` (0-based schedule position) and
    * `phase` (name) prepended — partition/order by `phase_ord` to feed
    * the trainer in schedule order.
    *
    * Phase draws are INDEPENDENT by design: membership hashes the row
    * key salted with the phase name, so phase 2 is not a subset of
    * phase 1 at higher rate, and a doc may legitimately appear in
    * several phases (an annealing phase re-reads the best data —
    * repetition across phases is the point; dedup WITHIN a phase is the
    * caller's upstream job). Deterministic per (key, phase name):
    * adding/removing/reordering phases never changes another phase's
    * sample — incremental schedule surgery re-materializes only the
    * phases it touches.
    *
    * Scale shape: one group-sized rate aggregate per phase over the
    * grouped corpus + one broadcast-rate filter pass per phase — the
    * corpus is scanned once per phase, never shuffled (schedules are
    * 2-5 phases; the scans are map-only and cheaper than materializing
    * a phase-tagged duplicate corpus). All arithmetic is the exact
    * integer [[mixtureRates]] arithmetic, oracle-replayable.
    */
  def mixtureSchedule(df: DataFrame, groupCol: String, key: Column,
      tokenCol: String, phases: Seq[MixturePhase]): DataFrame = {
    require(phases.nonEmpty, "need at least one phase")
    val names = phases.map(_.name)
    require(names.distinct.size == names.size,
      s"phase names must be distinct, got $names")
    require(names.forall(_.nonEmpty), "phase names must be non-empty")
    val Scale = 1000000L
    phases.zipWithIndex.map { case (p, ord) =>
      val rates = mixtureRates(df, groupCol, tokenCol, p.targetWeights,
          p.budgetTokens)
        .select(col(groupCol).as("__g"), col("thr_ppm"))
      df.join(broadcast(rates), col(groupCol) === col("__g"))
        .filter(pmod(keyHash(concat(key.cast("string"),
          lit("|" + p.name))), lit(Scale)) < col("thr_ppm"))
        .select((Seq(lit(ord).cast("long").as("phase_ord"),
          lit(p.name).as("phase")) ++ df.columns.map(col)): _*)
    }.reduce(_ unionByName _)
  }

  /** Cap every group (domain, source, language …) at `maxRows`, keeping
    * the deterministic hash-order prefix — the C4-style per-domain cap
    * that stops a handful of giant domains from dominating the corpus,
    * without sort-order bias (hash order is a stable shuffle of each
    * group; ties broken by the key itself).
    *
    * One shuffle on the group key + a per-group window; groups are
    * processed independently so skew is bounded by the largest group —
    * for pathological groups raise `spark.sql.shuffle.partitions` or
    * pre-filter with [[hashSample]].
    */
  def capPerGroup(df: DataFrame, groupCol: String, key: Column,
      maxRows: Int): DataFrame = {
    require(maxRows >= 0, s"maxRows must be >= 0, got $maxRows")
    val w = Window.partitionBy(col(groupCol)).orderBy(keyHash(key).asc, key.asc)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= maxRows)
      .drop("__graft_rn")
  }

  /** Weighted sampling without replacement: keep the `k` rows per group
    * with the highest PRIORITY w/u — priority sampling (Duffield, Lund
    * & Thorup, "Priority sampling for estimation of arbitrary subset
    * sums", JACM 54(6), 2007), which selects each row with probability
    * ≈ min(1, w/τ) for the group's k-th priority threshold τ, i.e.
    * approximately probability-proportional-to-weight — the
    * quality-weighted subsampling step of corpus curation.
    *
    * Deterministic like everything in this file: u comes from the row's
    * own key hash, priority = w / (hash+1) — ONE IEEE division of
    * exactly-representable integers (both < 2^53), so the value (and
    * therefore the selection AND the emitted priority column) is
    * bit-reproducible across runs, partitionings, and engines. Equal
    * priorities are possible from different (weight, hash) pairs (IEEE
    * quotients collide: 2/2 == 3/3), so the key tie-break is load-
    * bearing for determinism — never drop it from the ordering.
    *
    * Scale shape: priority is a pure row function; the per-group rank
    * filter plans a WindowGroupLimit (partial per-partition top-k
    * BEFORE the exchange since Spark 3.5), so only ~k·partitions rows
    * per group reach the shuffle — the same shape as a per-group
    * TakeOrdered. Null weights/keys cannot be sampled and are dropped.
    */
  /** Deterministic weighted UPSAMPLING — the data-mixing complement of
    * the samplers above: each row emits `floor(w)` copies plus one more
    * with probability frac(w), the fractional part decided by the row's
    * content hash (stochastic rounding, so an epoch's EXPECTED copy
    * count equals the prescribed mixture weight while every run emits
    * the identical concrete rows). `maxRepeat` caps runaway weights.
    * Output adds a 0-based `copy` ordinal so downstream exact-dedup and
    * packing can tell copies apart; rows with w < 1 survive only via
    * the stochastic unit (w <= 0 always drops).
    *
    * Shape: a pure row-function repeat count + one `explode(sequence)`
    * — map-only, no shuffle; output size = Σ copies, known in advance
    * from the weight column. All decisions are hash-of-content, so the
    * upsample is stable across runs, partitionings, and engines
    * (oracle-reproducible like every sampler here).
    */
  def upsampleByWeight(df: DataFrame, key: Column, weight: Column,
      maxRepeat: Int = 100): DataFrame = {
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    // clamp the DOUBLE before any long cast: floor(runaway).cast("long")
    // on w >= 2^63, Infinity, or NaN throws under Spark 4's default ANSI
    // mode — the cap must fire first. NaN maps to 0 copies (garbage
    // weight != max weight; Spark orders NaN greatest, so least() alone
    // would send NaN to maxRepeat).
    val w0 = weight.cast("double")
    val w = when(isnan(w0), lit(0d))
      .otherwise(least(greatest(w0, lit(0d)), lit(maxRepeat.toDouble)))
    val base = floor(w).cast("long")
    val extra = when(
      pmod(keyHash(key), lit(1000L)).cast("double") < (w - floor(w)) * 1000d,
      1L).otherwise(0L)
    val n = least(base + extra, lit(maxRepeat.toLong))
    df.filter(weight.isNotNull)
      .withColumn("__n", n)
      .filter(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Generic top-k rows per group WITHOUT a ranking window: the bounded
    * [[graft.functions.TopKByOrdPairs]] aggregate partial-combines
    * map-side into O(k) buffers, so the exchange carries |groups| × k
    * pairs — the ANSWER — where the `row_number().over(partitionBy(g))`
    * idiom sort-shuffles every candidate row (and WindowGroupLimit,
    * Spark's own mitigation, still shuffles ~k·partitions rows per
    * group plus pays the per-partition sort). Ranking order is
    * (ord DESC, id ASC) — ties break by id for a total order.
    *
    * Contract: `ord` casts losslessly to double (exact for integrals
    * < 2^53 — require'd by the aggregate's double buffer), `idCol` is
    * integral. Output: (groupCols…, rank 1..k, id, ord).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ord: Column,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.exprs.topKByOrd(ord.cast("double"),
        col(idCol).cast("long"), k).as("__topk"))
      .select(groupCols.map(col) :+
        posexplode(col("__topk")).as(Seq("__pos", "__p")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("long").as("rank"),
        col("__p.value").as(idCol),
        col("__p.ord").as("ord")): _*)
  }

  def prioritySample(df: DataFrame, groupCol: String, key: Column,
      weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // case-insensitive: Spark's default resolver would let
    // withColumn("priority", ...) silently replace a "Priority" column
    require(!df.columns.exists(_.equalsIgnoreCase("priority")),
      "input already has a 'priority' column — rename it first (prioritySample emits its own)")
    val pr = weight.cast("double") / (keyHash(key) + lit(1L)).cast("double")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("priority").desc, key.asc)
    df.filter(weight.isNotNull && key.isNotNull)
      .withColumn("priority", pr)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }
}
