package graft

import org.apache.spark.sql.functions._

import graft.ops.ProfileOps

/** Corpus snapshot drift: categorical + numeric PSI in exact Q16. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("identical snapshots drift zero: psi 0, no new/gone keys") {
    val d = ProfileOps.categoryDrift(docs, docs, "lang")
    val s = ProfileOps.categoryDriftSummary(d).head()
    assert(s.getAs[Long]("psi_q16") == 0L)
    assert(s.getAs[Long]("n_new") == 0L && s.getAs[Long]("n_gone") == 0L)
    assert(s.getAs[Double]("psi") == 0.0)
  }

  test("per-key cells are the exact integer contract (hand-computed fixture)") {
    // baseline: 3 x, 1 y (total 4); snapshot: 1 x, 1 y, 2 z (total 4)
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("x", "y", "z", "z").toDF("k")
    val rows = ProfileOps.categoryDrift(a, b, "k")
      .orderBy("key").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    val x = rows(0)
    assert(x.getAs[Long]("n_a") == 3L && x.getAs[Long]("n_b") == 1L)
    assert(x.getAs[Long]("ppm_a") == 750000L && x.getAs[Long]("ppm_b") == 250000L)
    // psi_q16 = (750000-250000) * log2q16(750000, 250000); log2(3) in Q16
    val log2_3 = graft.functions.HashKernels.log2q(750000L, 250000L, 16)
    assert(x.getAs[Long]("psi_q16") == 500000L * log2_3)
    val y = rows(1) // unchanged 250000 ppm both sides -> zero contribution
    assert(y.getAs[Long]("psi_q16") == 0L)
    val z = rows(2) // new key: n_a = 0, smoothed to 1 ppm
    assert(z.getAs[Long]("n_a") == 0L && z.getAs[Long]("ppm_a") == 0L)
    assert(z.getAs[Long]("psi_q16") ==
      (500000L - 1L) * graft.functions.HashKernels.log2q(500000L, 1L, 16))
    val s = ProfileOps.categoryDriftSummary(
      ProfileOps.categoryDrift(a, b, "k")).head()
    assert(s.getAs[Long]("n_keys") == 3L)
    assert(s.getAs[Long]("n_new") == 1L && s.getAs[Long]("n_gone") == 0L)
  }

  test("drift is symmetric in magnitude and detects a planted mix shift") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val ab = ProfileOps.categoryDriftSummary(
      ProfileOps.categoryDrift(a, b, "lang")).head().getAs[Long]("psi_q16")
    val ba = ProfileOps.categoryDriftSummary(
      ProfileOps.categoryDrift(b, a, "lang")).head().getAs[Long]("psi_q16")
    assert(ab == ba, s"|psi| must be direction-symmetric: $ab vs $ba")
    // planted shift: drop one language entirely from the snapshot —
    // strictly more drift than the even/odd split noise
    val shifted = ProfileOps.categoryDriftSummary(ProfileOps.categoryDrift(
      docs, docs.filter(col("lang") =!= "en"), "lang")).head()
    assert(shifted.getAs[Long]("n_gone") >= 1L)
    assert(shifted.getAs[Long]("psi_q16") > ab)
  }

  test("histogramDrift: shared exact bins, shift detected, identical zero") {
    val same = ProfileOps.categoryDriftSummary(ProfileOps.histogramDrift(
      docs, docs, "n_chars", bins = 16)).head()
    assert(same.getAs[Long]("psi_q16") == 0L)
    // length distribution of short docs vs long docs must drift hard
    val med = docs.agg(expr("percentile_approx(n_chars, 0.5)")).head().get(0)
      .toString.toDouble.toLong
    val drifted = ProfileOps.categoryDriftSummary(ProfileOps.histogramDrift(
      docs.filter(col("n_chars") <= med), docs.filter(col("n_chars") > med),
      "n_chars", bins = 16)).head()
    assert(drifted.getAs[Long]("psi_q16") > same.getAs[Long]("psi_q16"))
    assert(drifted.getAs[Double]("psi") > 1.0) // disjoint supports: huge PSI
  }

  test("histogramDrift refuses fractional value columns instead of collapsing bins") {
    val frac = docs.select(col("doc_id"), (col("n_chars") / 1000.0).as("score"))
    val e = intercept[IllegalArgumentException] {
      ProfileOps.histogramDrift(frac, frac, "score", bins = 16)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("empty snapshot is total, defined drift — every key gone, rates 0") {
    val s = ProfileOps.categoryDriftSummary(ProfileOps.categoryDrift(
      docs, docs.filter(lit(false)), "lang")).head()
    assert(s.getAs[Long]("n_gone") == s.getAs[Long]("n_keys"))
    assert(s.getAs[Long]("psi_q16") > 0L)
  }

  test("determinism: drift cells identical across input partitionings") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val d1 = ProfileOps.categoryDrift(a, b, "source")
    val d2 = ProfileOps.categoryDrift(a.repartition(13), b.repartition(7), "source")
    assert(d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty)
  }
}
