package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The decode itself is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives a deterministic fake
  * width/height/feature vector from the bytes. Everything around it —
  * the binary schema, the partition-wise batch iteration shape
  * (`mapPartitions`, the Scala analog of `mapInPandas`), the output
  * schema — is real and is exactly what a production decoder would slot
  * into (replace `fakeDecode` with the real codec call).
  */
object MultimodalOps {
  /** Media row schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as fake media payloads (utf-8 bytes). Stands in
    * for reading real image/audio blobs from parquet. */
  def attachFakeMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("image/fake").as("media_type"),
      length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** Metadata extraction that needs no decode: size + content digest.
    * Pure codegen expressions — this is what dedup-by-content on media
    * uses at scale (digest once, shuffle the 32-byte digest, never the
    * payload). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("n_bytes"),
      sha2(col("media"), 256).as("digest"))

  /** Media exact-dedup groups by content digest: one row per duplicated
    * payload with the canonical (minimum) doc id and the copy count —
    * [[DedupOps.exactDupGroups]] specialized to binary columns. The
    * 32-byte digest is the shuffle key; the payload itself never moves
    * (the whole point of digest-then-shuffle at 100 TB of media). */
  def mediaDupGroups(media: DataFrame): DataFrame =
    mediaMeta(media)
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("digest", "canonical_id", "n_copies")

  /** Perceptual signature (1-D dHash) of each media payload — the
    * difference hash that survives re-encoding and resizing, where
    * [[mediaDupGroups]]'s exact sha-256 digest is defeated by a single
    * changed byte.
    *
    * Classic dHash: resample the image to a tiny fixed grid, set bit i
    * when cell i is brighter than cell i+1. The STUB decode here reads
    * the payload as a UTF-8 "luminance sequence" (one char = one
    * sample); a production build decodes real pixels first and hashes
    * the downsampled grayscale row — everything after the decode
    * (relative-position resampling, difference bits, the hamming spine)
    * is exactly this code. Because sampling is RELATIVE (`i/bits` of the
    * way through), a k×-upscaled copy of a smooth payload samples
    * near-identical luminance → hamming ≈ 0, and a few perturbed bytes
    * touch at most 2 bits each — both invisible to digest equality.
    *
    * Map-only via the one-pass codegen kernel
    * [[graft.functions.HashKernels.dhashBits]] (sample positions are
    * exact integer division — i·(n−1) div bits — so the oracle can't
    * drift; the round-8 composed-builtin form re-inlined its sample
    * array under project collapse, ~100× the substring work). Empty
    * payloads have no perceptual content and drop. Output:
    * (doc_id, phash).
    */
  def perceptualHash(media: DataFrame, bits: Int = 48): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    media
      .select(col("doc_id"), decode(col("media"), "UTF-8").as("__s"))
      .filter(length(col("__s")) >= 1)
      .select(col("doc_id"),
        graft.functions.exprs.dhashBits(col("__s"), bits).as("phash"))
  }

  /** Perceptual near-duplicate media pairs: [[perceptualHash]] fed
    * through the signature-agnostic pigeonhole hamming spine
    * ([[DedupOps.hammingNearPairs]] — the same chunk-bucketed equi-join
    * + candidate-only verify the text SimHash path uses; no all-pairs
    * join anywhere). This is the near-dup that catches re-encoded /
    * resized / slightly-corrupted copies of the same image that
    * [[mediaDupGroups]]'s byte-exact digest provably misses.
    * Output: (id_a, id_b, hamming), id_a < id_b.
    */
  def mediaNearDupPairs(media: DataFrame, bits: Int = 48, maxHamming: Int = 3,
      maxBucket: Int = 100000): DataFrame =
    DedupOps.hammingNearPairs(perceptualHash(media, bits), "doc_id", "phash",
      bits, maxHamming, maxBucket)

  /** Full perceptual media dedup chain: [[mediaNearDupPairs]] →
    * connected components → keep the canonical (minimum-id) payload per
    * perceptual-duplicate set — [[graft.ops.DedupOps.dedupByMinhash]]'s
    * shape on the media column. This is what replaces digest-exact
    * [[mediaDupGroups]] as the production media dedup: one re-encode or
    * a single corrupted byte no longer splits a duplicate set. Output:
    * the surviving rows of `media`, original columns intact.
    */
  def mediaDedup(media: DataFrame, bits: Int = 48, maxHamming: Int = 3,
      maxBucket: Int = 100000,
      mat: Materializer = Materializer.Local): DataFrame = {
    val pairs = mediaNearDupPairs(media, bits, maxHamming, maxBucket)
    val clusters = DedupOps.nearDupClusters(pairs.select("id_a", "id_b"),
      media.select(col("doc_id")), "doc_id", mat = mat)
    media.join(clusters, Seq("doc_id"))
      .filter(col("doc_id") === col("cluster_id"))
      .drop("cluster_id")
  }

  /** Incremental perceptual dedup of a NEW media batch against a STORED
    * phash index ((doc_id, phash) parquet — the output of
    * [[perceptualHash]] persisted once): the daily ingest path that
    * never re-decodes or re-hashes the standing corpus, mirroring the
    * MinHash [[graft.ops.DedupOps.dedupAgainstIndex]]. Output:
    * (id_new, id_old, hamming) — new payloads perceptually matching an
    * already-indexed one.
    */
  def mediaDedupAgainstIndex(newMedia: DataFrame, indexPhash: DataFrame,
      bits: Int = 48, maxHamming: Int = 3,
      maxBucket: Int = 100000): DataFrame =
    DedupOps.hammingAgainstIndex(perceptualHash(newMedia, bits), indexPhash,
      "doc_id", "phash", bits, maxHamming, maxBucket)

  /** STUB decode: deterministic fake dimensions/features from the bytes.
    * A real implementation decodes the codec here — per partition, so
    * the (expensive, native) decoder state is reused across the batch
    * and payloads never cross the driver.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = if (bytes == null) 0 else bytes.length
    val w = 16 + (n % 32)
    val h = 16 + ((n / 32) % 32)
    val feat = Array.tabulate(8)(i => ((n * (i + 1)) % 997).toFloat / 997f)
    (w, h, feat)
  }

  /** Partition-wise decode + feature extraction — Dataset-native
    * `mapPartitions` (the batch shape a Pandas-UDF/Arrow pipeline would
    * use). Payloads that sniff as real images ([[isRealImage]]) decode
    * through JDK `javax.imageio` ([[decodeLuma]]): TRUE width/height
    * from the codec, features = the 8 vertical-band mean-luma values
    * (integer band sums div count, one float division each — exact and
    * engine-reproducible). Everything else keeps the deterministic
    * fake ([[fakeDecode]]), the oracle-replayable path. Deliberately
    * NOT the `.rdd` round-trip: staying a Dataset transform keeps the
    * decode inside ONE plan tree, so the upstream scan's pushdown/
    * pruning, AQE, and downstream codegen all survive around the opaque
    * stage (the old LogicalRDD form severed the plan). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (isRealImage(bytes)) {
            val (w, h, lum) = decodeLuma(bytes)
            val bands = 8
            val feat = Array.tabulate(bands) { b =>
              // vertical band [c0, c1) of the raster, mean luma
              val c0 = b * w / bands
              val c1 = math.max(c0 + 1, (b + 1) * w / bands)
              var sum = 0L; var cnt = 0L
              var r = 0
              while (r < h) {
                var c = c0
                while (c < c1) { sum += lum(r * w + c); cnt += 1; c += 1 }
                r += 1
              }
              (sum.toDouble / cnt).toFloat / 255f
            }
            (id, w, h, feat)
          } else {
            val (w, h, f) = fakeDecode(bytes)
            (id, w, h, f)
          }
        }
      }
      .toDF("doc_id", "width", "height", "feature")
  }

  /** STUB raster geometry: payload bytes as a row-major luminance
    * raster, width ⌈√n⌉ (deterministic; a real decoder reads true
    * dimensions from the codec header instead). */
  private[graft] def fakeRaster(n: Int): (Int, Int) = {
    val w = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    (w, math.max(1, (n + w - 1) / w))
  }

  /** Magic-byte sniff for the codecs `javax.imageio` decodes out of the
    * box (PNG / JPEG / GIF / BMP). Sniffing — not try-decode — keeps
    * the dispatch deterministic and free for the fake-payload path:
    * text payloads keep the byte-exact stub arithmetic the oracle rows
    * replay, while real images route to the real decoder. PNG (0x89)
    * and JPEG (0xFF) lead bytes are ILLEGAL UTF-8 starts, so those two
    * sniff on magic alone. GIF ("GIF8") and BMP ("BM") magics are plain
    * ASCII — a document legitimately starting "BMW…" or "GIF89a…" must
    * NOT be routed to a decoder that will refuse it — so those two
    * additionally require structural corroboration no prose satisfies:
    * BMP's little-endian size field (offset 2) must equal the payload
    * length; GIF must carry a full "GIF87a"/"GIF89a" version AND the
    * 0x3B trailer as its final byte. (Spec-pinned with exactly those
    * adversarial text fixtures.) */
  private[graft] def isRealImage(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 8) return false
    val png = bytes(0) == 0x89.toByte && bytes(1) == 0x50.toByte &&
      bytes(2) == 0x4E.toByte && bytes(3) == 0x47.toByte
    val jpeg = bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
      bytes(2) == 0xFF.toByte
    def gif = bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == '8'.toByte &&
      (bytes(4) == '7'.toByte || bytes(4) == '9'.toByte) &&
      bytes(5) == 'a'.toByte && bytes(bytes.length - 1) == 0x3B.toByte
    def bmp = bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte && {
      val size = (bytes(2) & 0xFF) | ((bytes(3) & 0xFF) << 8) |
        ((bytes(4) & 0xFF) << 16) | ((bytes(5) & 0xFF).toLong << 24)
      size == bytes.length
    }
    png || jpeg || gif || bmp
  }

  /** REAL pixel decode — `javax.imageio` ships with the JDK, so the
    * perceptual ops hash true pixels with zero new dependencies.
    * Returns (width, height, row-major Rec.601 luma): integer
    * (299·R + 587·G + 114·B) / 1000 over the sRGB channels, exact
    * integer arithmetic so hashes are engine-reproducible. A payload
    * that SNIFFS as an image but fails to decode REFUSES loudly — a
    * truncated JPEG silently hashed as a fake byte-raster would never
    * collapse with its intact original, the exact silent-miss this
    * library's contracts forbid. Called per row inside a partition-wise
    * iterator: decoder state is JVM-static and payloads never cross
    * the driver. */
  private[graft] def decodeLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"media payload sniffs as an image but failed to decode " +
            s"(${e.getMessage}) — corrupted or truncated; refusing to " +
            "hash it as raw bytes (it would silently never match its " +
            "intact duplicates)", e)
      }
    if (img == null) throw new IllegalArgumentException(
      "media payload sniffs as an image but no installed reader decodes " +
        "it — corrupted, truncated, or an unsupported subformat; " +
        "refusing to hash it as raw bytes")
    val w = img.getWidth
    val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    val lum = new Array[Int](w * h)
    var i = 0
    while (i < lum.length) {
      val p = rgb(i)
      lum(i) =
        (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
          114 * (p & 0xFF)) / 1000
      i += 1
    }
    (w, h, lum)
  }

  /** Partition-wise decode → `grid`×`grid` block-mean luminance
    * downsample — the real 2-D perceptual-hash front end. Payloads that
    * SNIFF as real images ([[isRealImage]]) decode true pixels via
    * [[decodeLuma]] (JDK `javax.imageio` — PNG/JPEG/GIF/BMP, zero new
    * dependencies); anything else keeps the byte-exact STUB raster
    * ([[fakeRaster]]: payload bytes as luminance), which is the
    * oracle-replayable path the DuckDB rows pin. Both sources feed the
    * SAME block-mean loop in exact integer arithmetic (block sum div
    * count) so results are engine-reproducible. Empty payloads have no
    * pixels and drop. Output: (doc_id, lum: array of grid² row-major
    * cell means).
    */
  def decodeLuminanceGrid(media: DataFrame, grid: Int = 5): DataFrame = {
    require(grid >= 2 && grid <= 8, s"grid must be in [2, 8], got $grid")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            // (w, h, luma-at-index, valid-sample count): real images
            // have a full w·h raster; the stub raster's last row may
            // be ragged (w·h >= n), hence the idx < limit guard below
            val (w, h, at, limit) =
              if (isRealImage(bytes)) {
                val (rw, rh, l) = decodeLuma(bytes)
                (rw, rh, (i: Int) => l(i), l.length)
              } else {
                val (fw, fh) = fakeRaster(bytes.length)
                (fw, fh, (i: Int) => bytes(i) & 0xFF, bytes.length)
              }
            val cells = new Array[Int](grid * grid)
            var r = 0
            while (r < grid) {
              val r0 = r * h / grid
              val r1 = math.max(r0 + 1, (r + 1) * h / grid)
              var c = 0
              while (c < grid) {
                val c0 = c * w / grid
                val c1 = math.max(c0 + 1, (c + 1) * w / grid)
                var sum = 0L
                var cnt = 0L
                var rr = r0
                while (rr < r1) {
                  var cc = c0
                  while (cc < c1) {
                    val idx = rr * w + cc
                    if (idx < limit) { sum += at(idx); cnt += 1 }
                    cc += 1
                  }
                  rr += 1
                }
                cells(r * grid + c) = if (cnt == 0) 0 else (sum / cnt).toInt
                c += 1
              }
              r += 1
            }
            Iterator.single((id, cells.toSeq))
          }
        }
      }
      .toDF("doc_id", "lum")
  }

  /** Bit width of [[perceptualHash2D]] at a grid size: grid·(grid−1)
    * row-gradient + (grid−1)·grid column-gradient bits (40 at the
    * default 5×5 — under the hamming spine's 63-bit signature cap). */
  def bits2D(grid: Int): Int = 2 * grid * (grid - 1)

  /** 2-D perceptual hash: [[decodeLuminanceGrid]] → row AND column
    * gradient bits — the production dHash shape (row gradients alone
    * are blind to vertical structure; the column half catches it).
    * Bit layout (documented for index math): bit r·(grid−1)+c compares
    * cell (r,c) > (r,c+1); the column half starts at grid·(grid−1)
    * with bit r·grid+c comparing cell (r,c) > (r+1,c).
    *
    * Against [[perceptualHash]] (1-D over the flattened sequence): a
    * ONE-ROW shift of the raster relocates every flattened sample, so
    * the 1-D bits scramble; the 2-D block means move by one row out of
    * h/grid per cell, so the hash barely moves — spec-pinned. The
    * gradient assembly references the `lum` ATTRIBUTE from the decode
    * stage (not a composed expression), so project collapse cannot
    * re-inline the grid into its 40 comparisons. Output:
    * (doc_id, phash2d) — feed [[DedupOps.hammingNearPairs]] with
    * bits = [[bits2D]].
    */
  def perceptualHash2D(media: DataFrame, grid: Int = 5): DataFrame = {
    // the long-packed signature caps the grid at 6 (bits2D(6) = 60):
    // grid 7 would shift past bit 63 and SILENTLY alias gradient bits
    // (1L << 84 wraps to 1L << 20), corrupting every hash
    require(grid >= 2 && bits2D(grid) <= 63,
      s"grid must be in [2, 6] (bits2D(grid) <= 63), got $grid")
    val g = grid
    val lum = decodeLuminanceGrid(media, g)
    def cell(r: Int, c: Int) = element_at(col("lum"), r * g + c + 1)
    val rowBits = for (r <- 0 until g; c <- 0 until g - 1)
      yield when(cell(r, c) > cell(r, c + 1),
        lit(1L << (r * (g - 1) + c))).otherwise(lit(0L))
    val colBase = g * (g - 1)
    val colBits = for (r <- 0 until g - 1; c <- 0 until g)
      yield when(cell(r, c) > cell(r + 1, c),
        lit(1L << (colBase + r * g + c))).otherwise(lit(0L))
    lum.select(col("doc_id"),
      (rowBits ++ colBits).reduce(_ + _).as("phash2d"))
  }

  /** Perceptual near-duplicate pairs on the 2-D hash —
    * [[mediaNearDupPairs]] with [[perceptualHash2D]] signatures through
    * the same pigeonhole hamming spine. */
  def mediaNearDupPairs2D(media: DataFrame, grid: Int = 5,
      maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    DedupOps.hammingNearPairs(perceptualHash2D(media, grid), "doc_id",
      "phash2d", bits2D(grid), maxHamming, maxBucket)

  /** Full 2-D perceptual media dedup: [[mediaNearDupPairs2D]] →
    * connected components → keep the canonical (minimum-id) payload per
    * perceptual-duplicate set — [[mediaDedup]]'s chain on the REAL-
    * pixel 2-D hash. With the `javax.imageio` decode behind
    * [[decodeLuminanceGrid]], this is the op that collapses a
    * quality-re-encoded JPEG (or a PNG↔JPEG transcode) of the same
    * picture — different BYTES, so digest dedup and any byte-derived
    * hash provably miss it; near-identical PIXELS, so the block-mean
    * gradient hash lands within `maxHamming` (spec-pinned with real
    * encoded fixtures). Output: the surviving rows of `media`,
    * original columns intact.
    */
  def mediaDedup2D(media: DataFrame, grid: Int = 5, maxHamming: Int = 3,
      maxBucket: Int = 100000,
      mat: Materializer = Materializer.Local): DataFrame = {
    val pairs = mediaNearDupPairs2D(media, grid, maxHamming, maxBucket)
    val clusters = DedupOps.nearDupClusters(pairs.select("id_a", "id_b"),
      media.select(col("doc_id")), "doc_id", mat = mat)
    media.join(clusters, Seq("doc_id"))
      .filter(col("doc_id") === col("cluster_id"))
      .drop("cluster_id")
  }

  /** Deterministic frame sampling plumbing for video-shaped payloads:
    * every `stride`-th byte window as a "frame" — demonstrates the
    * explode-to-frames schema without a real container parser. Frame
    * count is exact integer `div` (a double division for an index
    * invites float drift at extreme payload sizes). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(
        col("doc_id"),
        posexplode(sequence(lit(0L),
          expr(s"greatest(0L, n_bytes - 1) div $stride"))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_idx"),
        (col("col") * stride).cast("long").as("byte_offset"))
}
