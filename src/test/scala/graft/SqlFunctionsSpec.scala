package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs

/** The custom codegen expressions exposed through spark.sql. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions equal the Column API") {
    exprs.registerSql(spark)
    Seq(("hello world", Array(0.5f, -0.25f))).toDF("t", "v")
      .createOrReplaceTempView("sqlfn_fixture")
    val viaSql = spark.sql(
      """SELECT graft_char_hash(t) AS h, graft_shingle_hashes(t, 1) AS sh,
        |  graft_quantize(v) AS q,
        |  graft_dot_long(graft_quantize(v), graft_quantize(v)) AS d
        |FROM sqlfn_fixture""".stripMargin).head()
    val viaCols = Seq(("hello world", Array(0.5f, -0.25f))).toDF("t", "v")
      .select(exprs.charHashFast(col("t")).as("h"),
        exprs.shingleHashes(col("t"), 1).as("sh"),
        exprs.quantizeVec(col("v")).as("q"),
        exprs.dotLong(exprs.quantizeVec(col("v")), exprs.quantizeVec(col("v"))).as("d"))
      .head()
    assert(viaSql.getLong(0) == viaCols.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaCols.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) == Seq(5000L, -2500L))
    assert(viaSql.getLong(3) == 5000L * 5000L + 2500L * 2500L)
  }

  test("graft_top_k aggregates the ranked pairs from SQL") {
    exprs.registerSql(spark)
    Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 7L), (2L, 0.1, 20L))
      .toDF("g", "ord", "v").createOrReplaceTempView("sqlfn_topk")
    val got = spark.sql(
      "SELECT g, graft_top_k(ord, v, 2) AS top FROM sqlfn_topk GROUP BY g ORDER BY g")
      .collect()
    // group 1: ties at 0.9 break by value asc -> 7 then 11; 0.5 dropped (k=2)
    assert(got(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getDouble(0), r.getLong(1))) == Seq((0.9, 7L), (0.9, 11L)))
    assert(got(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(20L))
  }

  test("GraftExtensions registers the same surface at session build time") {
    // a NEW session (sharing this JVM's SparkContext) built WITH the
    // extension: getOrCreate reuses an existing default session and
    // silently ignores extensions, so clear the default first and
    // restore it after — the functions must resolve from SQL with no
    // registerSql call
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val got = s2.sql(
        "SELECT graft_char_hash('hello world') AS h, graft_top_k(d, v, 1) AS t " +
          "FROM VALUES (0.5D, 1L), (0.9D, 2L) AS t(d, v) GROUP BY 1").head()
      val viaCol = spark.range(1)
        .select(exprs.charHashFast(lit("hello world"))).head().getLong(0)
      assert(got.getLong(0) == viaCol)
      assert(got.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(2L))
    } finally {
      SparkSession.clearActiveSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  test("round-6 functions (normalize, hash_embed, z_interleave, window_passages) from SQL") {
    exprs.registerSql(spark)
    Seq(("Hello  WORLD", "a b c d"))
      .toDF("t", "u").createOrReplaceTempView("sqlfn_r6")
    val got = spark.sql(
      """SELECT graft_normalize(t) AS n, graft_hash_embed(t, 8) AS e,
        |  graft_z_interleave(3L, 1L, 8) AS z,
        |  graft_window_passages(u, 2) AS w2,
        |  graft_window_passages(u, 2, 2) AS w2s
        |FROM sqlfn_r6""".stripMargin).head()
    assert(got.getString(0) == "hello world")
    val viaCol = Seq(("Hello  WORLD", "a b c d")).toDF("t", "u")
      .select(exprs.hashEmbedding(col("t"), 8)).head().getSeq[Long](0)
    assert(got.getSeq[Long](1) == viaCol)
    assert(got.getLong(2) == 7L) // x=3 (bits 0,1 -> out 0,2), y=1 (bit 0 -> out 1)
    assert(got.getSeq[String](3) == Seq("a b", "b c", "c d"))
    assert(got.getSeq[String](4) == Seq("a b", "c d"))
  }

  test("graft_word_counts takes its word list as a CSV string literal") {
    exprs.registerSql(spark)
    Seq(Tuple1("a b a c")).toDF("t").createOrReplaceTempView("sqlfn_wc")
    val got = spark.sql("SELECT graft_word_counts(t, 'a,b,z') AS c FROM sqlfn_wc")
      .head().getSeq[Long](0)
    assert(got == Seq(2L, 1L, 0L))
  }

  test("graft_simhash / graft_dhash / graft_bpe_token_stats register for pure SQL") {
    exprs.registerSql(spark)
    Seq(Tuple1("the that")).toDF("t").createOrReplaceTempView("sqlfn_r8")
    // simhash equals the Column-API kernel
    val sim = spark.sql("SELECT graft_simhash(t, 24) AS s FROM sqlfn_r8")
      .head().getLong(0)
    val simCol = Seq(Tuple1("the that")).toDF("t")
      .select(exprs.simhashBits(col("t"), 24)).head().getLong(0)
    assert(sim == simCol)
    // dhash equals the Column-API kernel (default 48 bits)
    val dh = spark.sql("SELECT graft_dhash(t) AS d FROM sqlfn_r8").head().getLong(0)
    val dhCol = Seq(Tuple1("the that")).toDF("t")
      .select(exprs.dhashBits(col("t"), 48)).head().getLong(0)
    assert(dh == dhCol)
    // bpe stats take the merges as an 'a b' CSV literal; 'the'+'that'
    // chain to one token each under these four rules
    val bpe = spark.sql(
      "SELECT graft_bpe_token_stats(t, 't h,th e,a t,th at') AS b FROM sqlfn_r8")
      .head().getSeq[Long](0)
    assert(bpe == Seq(2L, 2L), s"got $bpe")
    // token IDS under the same literal convention == the Column API
    val ids = spark.sql(
      "SELECT graft_bpe_token_ids(t, 't h,th e,a t,th at') AS i FROM sqlfn_r8")
      .head().getSeq[Long](0)
    val idsCol = Seq(Tuple1("the that")).toDF("t")
      .select(exprs.bpeTokenIds(col("t"),
        Seq("t" -> "h", "th" -> "e", "a" -> "t", "th" -> "at")))
      .head().getSeq[Long](0)
    assert(ids == idsCol && ids.length == 2, s"got $ids vs $idsCol")
    // 'the' = rule 1's output, 'that' = rule 3's: VocabBase + rank
    assert(ids == Seq(0x110000L + 1, 0x110000L + 3), s"got $ids")
    // lossless 3rd arg: the interleaved space token, and a pure-SQL
    // decode round trip back to the exact input bytes
    val lossless = spark.sql(
      "SELECT graft_bpe_token_ids(t, 't h,th e,a t,th at', true) AS i FROM sqlfn_r8")
      .head().getSeq[Long](0)
    assert(lossless == Seq(0x110000L + 1, 32L, 0x110000L + 3), s"got $lossless")
    val decoded = spark.sql(
      "SELECT graft_bpe_decode(graft_bpe_token_ids(t, 't h,th e,a t,th at', true), " +
        "'t h,th e,a t,th at') AS d FROM sqlfn_r8")
      .head().getString(0)
    assert(decoded == "the that")
  }

  test("round-15 kernels reach pure SQL: span_scrub, extract_main, script_counts, unigram_encode, dsir_bits") {
    exprs.registerSql(spark)
    val text = "alpha beta gamma delta alpha beta"
    Seq(Tuple1(text)).toDF("t").createOrReplaceTempView("sqlfn_r15")

    // span_scrub: gram list from SQL arrives UNSORTED — the builder
    // normalizes via SortArray, so the result equals the Column API
    // (which sorts before typedLit)
    val g1 = Seq(Tuple1(text)).toDF("t")
      .select(exprs.shingleHashes(col("t"), 2)).head().getSeq[Long](0)
    val grams = Array(g1(3), g1(0)).sorted // "delta alpha", "alpha beta"
    val viaCol = Seq(Tuple1(text)).toDF("t")
      .select(exprs.spanScrub(col("t"), typedLit(grams), 2).as("s"))
      .select("s.clean_text", "s.n_spans", "s.n_removed").head()
    val viaSql = spark.sql(
      s"SELECT graft_span_scrub(t, array(${g1(3)}L, ${g1(0)}L), 2) AS s FROM sqlfn_r15")
      .select("s.clean_text", "s.n_spans", "s.n_removed").head()
    assert(viaSql == viaCol && viaSql.getLong(2) > 0)

    // extract_main: one article block kept, nav dropped (the HTML
    // carries single quotes — feed it through a view, not a literal)
    val html = "<nav><a href='/'>Home</a> <a href='/b'>About</a></nav>" +
      "<p>the story of a house that was on the hill by the sea</p>"
    Seq(Tuple1(html)).toDF("h").createOrReplaceTempView("sqlfn_r15_html")
    val em = spark.sql(
      "SELECT graft_extract_main(h, 5) AS e FROM sqlfn_r15_html")
      .select("e.main_text", "e.n_kept").head()
    val emCol = Seq(Tuple1(html)).toDF("h")
      .select(exprs.extractMainContent(col("h"), 5).as("e"))
      .select("e.main_text", "e.n_kept").head()
    assert(em == emCol && em.getLong(1) == 1L)

    // script_counts: counts equal the Column kernel
    val sc = spark.sql("SELECT graft_script_counts('abc где 123') AS c").head().getSeq[Long](0)
    val scCol = Seq(Tuple1("abc где 123")).toDF("t")
      .select(exprs.scriptClassCounts(col("t"))).head().getSeq[Long](0)
    assert(sc == scCol && sc.head == 3L)

    // unigram_encode: 'piece score_q' CSV == Column API with the same vocab
    val vocabStr = "al -65536,pha -65536,alpha -98304,beta -65536"
    val vocab = graft.ops.TextOps.unigramVocab(Seq(
      "al" -> -65536L, "pha" -> -65536L, "alpha" -> -98304L, "beta" -> -65536L))
    val ue = spark.sql(
      s"SELECT graft_unigram_encode('alpha beta', '$vocabStr') AS u")
      .select("u.pieces", "u.n_pieces", "u.score_q").head()
    val ueCol = Seq(Tuple1("alpha beta")).toDF("t")
      .select(exprs.unigramEncode(col("t"), vocab, -(32L << 16)).as("u"))
      .select("u.pieces", "u.n_pieces", "u.score_q").head()
    assert(ue == ueCol && ue.getLong(1) == 2L)

    // dsir_bits: 'ctx tok count' / 'ctx count' CSV literals == Column API
    val model = graft.functions.DsirModel(
      Array("<s> alpha", "alpha beta"), Array(4L, 3L),
      Array("<s>", "alpha"), Array(5L, 4L), vocab = 10L)
    val db = spark.sql(
      "SELECT graft_dsir_bits('alpha beta', '<s> alpha 4,alpha beta 3', " +
        "'<s> 5,alpha 4', 10) AS d").select("d.n_tokens", "d.bits_q").head()
    val dbCol = Seq(Tuple1("alpha beta")).toDF("t")
      .select(exprs.dsirBits(col("t"), model).as("d"))
      .select("d.n_tokens", "d.bits_q").head()
    assert(db == dbCol && db.getLong(0) == 2L)
  }

  test("graft_url_canonical / graft_url_host compose the UrlOps rules from SQL") {
    exprs.registerSql(spark)
    val url = "HTTPS://WWW.News.Example.com:443/a/1/?utm_source=x&q=2#f"
    Seq(Tuple1(url)).toDF("u").createOrReplaceTempView("sqlfn_url")
    val got = spark.sql(
      "SELECT graft_url_canonical(u) AS c, graft_url_host(u) AS h FROM sqlfn_url")
      .head()
    val viaCol = Seq(Tuple1(url)).toDF("u")
      .select(graft.ops.UrlOps.canonicalizeUrl(col("u")).as("c"),
        graft.ops.UrlOps.hostOf(col("u")).as("h")).head()
    assert(got == viaCol)
    assert(got.getString(0) == "news.example.com/a/1?q=2")
    assert(got.getString(1) == "news.example.com")
    // the r17 percent rule rides the SQL surface too (SQL == Column)
    val purl = "https://a.example/d%6Fcs/a%2fb?utm%5Fsource=x&q=1"
    Seq(Tuple1(purl)).toDF("u").createOrReplaceTempView("sqlfn_url2")
    val got2 = spark.sql(
      "SELECT graft_url_canonical(u) AS c FROM sqlfn_url2").head()
    assert(got2.getString(0) == "a.example/docs/a%2Fb?q=1")
    assert(got2.getString(0) == Seq(Tuple1(purl)).toDF("u")
      .select(graft.ops.UrlOps.canonicalizeUrl(col("u"))).head().getString(0))
    // the r18 protocol-relative rule rides the SQL surface too
    val got2b = spark.sql(
      "SELECT graft_url_canonical('//WWW.A.Example/x') AS c, " +
        "graft_url_host('//WWW.A.Example/x') AS h").head()
    assert(got2b.getString(0) == "a.example/x" &&
      got2b.getString(1) == "a.example")
    // the standalone kernels reach pure SQL as well
    val got3 = spark.sql(
      "SELECT graft_percent_normalize('a%2Db%2f') AS p, " +
        "graft_idn_ascii('BÜCHER.example') AS h").head()
    assert(got3.getString(0) == "a-b%2F")
    assert(got3.getString(1) == "xn--bcher-kva.example")
  }
}
