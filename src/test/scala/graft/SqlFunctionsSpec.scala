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

  test("graft_word_counts takes its word list as a CSV string literal") {
    exprs.registerSql(spark)
    Seq(Tuple1("a b a c")).toDF("t").createOrReplaceTempView("sqlfn_wc")
    val got = spark.sql("SELECT graft_word_counts(t, 'a,b,z') AS c FROM sqlfn_wc")
      .head().getSeq[Long](0)
    assert(got == Seq(2L, 1L, 0L))
  }
}
