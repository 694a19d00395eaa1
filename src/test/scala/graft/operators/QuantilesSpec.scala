package graft.operators

import org.apache.spark.storage.StorageLevel

import graft.SparkTestBase

/** Histogram quantiles: the type-1 definition against hand-computed ranks,
  * edge quantiles, tie handling, and gate membership.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def values(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "score")

  private def threshold(df: org.apache.spark.sql.DataFrame,
                        qNum: Long, qDen: Long): Double =
    Quantiles.quantileThreshold(df, "score", qNum, qDen, precision = 6)
      .as[Double].head()

  test("type-1 quantile: smallest v with count(<= v) >= ceil(q*N)") {
    val df = values(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
    threshold(df, 1L, 4L) shouldBe 0.3 // ceil(10/4)=3rd smallest
    threshold(df, 1L, 2L) shouldBe 0.5 // median, N even -> lower
    threshold(df, 9L, 10L) shouldBe 0.9
    threshold(df, 1L, 1L) shouldBe 1.0 // q=1 -> max
  }

  test("ties collapse into one histogram row but keep their full count") {
    // 5 copies of 0.2 then one 0.9: p50 rank = 3 -> still 0.2
    val df = values(0.2, 0.2, 0.2, 0.2, 0.2, 0.9)
    threshold(df, 1L, 2L) shouldBe 0.2
    threshold(df, 11L, 12L) shouldBe 0.9 // ceil(11*6/12)=6th
  }

  test("q=0 keeps everything; gate compares on ROUNDED values") {
    val df = values(0.30000004, 0.3, 0.7)
    // both 0.3-ish values round into the same histogram row at 6dp
    threshold(df, 0L, 1L) shouldBe 0.3
    Quantiles.quantileGate(df, "score", 0L, 1L, precision = 6)
      .select("id").as[Long].collect().toSet shouldBe Set(0L, 1L, 2L)
    // p66 threshold is the shared rounded value, so BOTH 0.3-ish rows pass
    Quantiles.quantileGate(df, "score", 2L, 3L, precision = 6)
      .select("id").as[Long].collect().toSet shouldBe Set(0L, 1L, 2L)
  }

  test("gate keeps exactly the rows at/above the threshold") {
    val df = values(0.1, 0.4, 0.4, 0.8, 0.9)
    // p50: rank ceil(5/2)=3 -> threshold 0.4; gate keeps ids 1,2,3,4
    val kept = Quantiles.quantileGate(df, "score", 1L, 2L, precision = 6)
      .select("id").as[Long].collect().toSet
    kept shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("NULL values are excluded from both N and the histogram") {
    val df = Seq(
      (1L, java.lang.Double.valueOf(0.2)), (2L, java.lang.Double.valueOf(0.4)),
      (3L, null.asInstanceOf[java.lang.Double]), (4L, null.asInstanceOf[java.lang.Double]),
      (5L, java.lang.Double.valueOf(0.8))).toDF("id", "score")
    // non-null distribution {0.2, 0.4, 0.8}: p50 rank ceil(3/2)=2 -> 0.4
    // (if NULLs counted, N=5 -> rank 3 -> 0.8)
    threshold(df, 1L, 2L) shouldBe 0.4
    Quantiles.quantileGate(df, "score", 1L, 2L, precision = 6)
      .select("id").as[Long].collect().toSet shouldBe Set(2L, 5L)
  }

  test("grouped thresholds: each group gets its own type-1 quantile") {
    val df = Seq(
      ("en", 0.1), ("en", 0.2), ("en", 0.9),   // p50 rank 2 -> 0.2
      ("fr", 0.5), ("fr", 0.6), ("fr", 0.7), ("fr", 0.8)) // rank 2 -> 0.6
      .toDF("lang", "score")
    val out = Quantiles.groupedQuantileThreshold(df, "lang", "score", 1L, 2L, 6)
      .as[(String, Double)].collect().toMap
    out shouldBe Map("en" -> 0.2, "fr" -> 0.6)
  }

  test("guards reject an out-of-range rational q") {
    val df = values(0.5)
    an[IllegalArgumentException] should be thrownBy threshold(df, 5L, 4L)
    an[IllegalArgumentException] should be thrownBy threshold(df, 1L, 0L)
    an[IllegalArgumentException] should be thrownBy threshold(df, -1L, 4L)
  }

  test("MAD gate: hand-computed medians; outliers cut, inliers keep their stats") {
    // group g: values 10,10,11,12,13,100 -> median 11 (type-1 lower),
    // devs 1,1,0,1,2,89 -> MAD 1 -> gate at 3*1: keeps devs <= 3 (drops 100)
    val rows = Seq((1L, "g", 10.0), (2L, "g", 10.0), (3L, "g", 11.0),
      (4L, "g", 12.0), (5L, "g", 13.0), (6L, "g", 100.0),
      (7L, "h", 5.0))   // singleton group: median 5, MAD 0, keeps itself
      .toDF("id", "grp", "x")
    val out = Quantiles.madOutlierGate(rows, "grp", "x", kNum = 3L, kDen = 1L,
        precision = 6, storage = StorageLevel.NONE)
      .select("id", "group_median", "abs_dev", "group_mad")
      .as[(Long, Double, Double, Double)].collect().toSet
    out shouldBe Set(
      (1L, 11.0, 1.0, 1.0), (2L, 11.0, 1.0, 1.0), (3L, 11.0, 0.0, 1.0),
      (4L, 11.0, 1.0, 1.0), (5L, 11.0, 2.0, 1.0),
      (7L, 5.0, 0.0, 0.0))
  }

  test("MAD gate: NULL group is real; NULL values carry no rank; guards reject bad k") {
    val rows = Seq((1L, Option("g"), Option(1.0)), (2L, Option("g"), Option(1.0)),
      (3L, Option("g"), Option.empty[Double]),      // NULL value: excluded from both medians
      (4L, Option.empty[String], Option(7.0)))      // NULL group: its own median/MAD
      .toDF("id", "grp", "x")
    val kept = Quantiles.madOutlierGate(rows, "grp", "x", kNum = 3L, kDen = 1L,
        precision = 6, storage = StorageLevel.NONE)
      .select("id").as[Long].collect().toSet
    // ids 1,2 inliers of g; 4 inlier of NULL group; 3's NULL value can't pass
    kept shouldBe Set(1L, 2L, 4L)
    an[IllegalArgumentException] should be thrownBy
      Quantiles.madOutlierGate(rows, "grp", "x", kNum = 1L, kDen = 0L, precision = 6)
  }

  test("percentile rank equals cume_dist on the rounded values, per group") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "lang", "CAST(n_chars AS DOUBLE) AS n_chars")
    val viaHistogram = Quantiles.percentileRank(docs, "lang", "n_chars", precision = 6)
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toMap
    val viaWindow = docs.selectExpr("doc_id",
        "round(cume_dist() OVER (PARTITION BY lang ORDER BY round(n_chars, 6)), 6) AS pct_rank")
      .as[(Long, Double)].collect().toMap
    viaHistogram shouldBe viaWindow
    // sanity: ranks span (0, 1] and the max doc of each lang ranks 1.0
    viaHistogram.values.max shouldBe 1.0
    all(viaHistogram.values) should be > 0.0
  }

  test("percentile rank: shuffle-join variant returns identical rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "lang", "CAST(n_chars AS DOUBLE) AS n_chars")
    def run(b: Boolean) = Quantiles.percentileRank(docs, "lang", "n_chars", 6, broadcastRanks = b)
      .select("doc_id", "pct_rank").as[(Long, Double)].collect().toSet
    run(true) shouldBe run(false)
  }

  test("histogram sum-merge of shards equals the single-pass histogram and its quantiles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("lang", "source", "CAST(n_chars AS DOUBLE) AS n_chars")
    val whole = Quantiles.groupedHistogram(docs, Seq("lang"), "n_chars", 6)
      .select("lang", "v", "cnt").as[(String, Double, Long)].collect().toSet
    val merged = Quantiles.mergeHistograms(
        Quantiles.groupedHistogram(docs, Seq("lang", "source"), "n_chars", 6), Seq("lang"))
      .select("lang", "v", "cnt").as[(String, Double, Long)].collect().toSet
    merged shouldBe whole
    // and the quantile read off merged bins equals the direct grouped quantile
    val viaMerge = Quantiles.thresholdFromHistogram(
        Quantiles.mergeHistograms(
          Quantiles.groupedHistogram(docs, Seq("lang", "source"), "n_chars", 6), Seq("lang")),
        "lang", 1L, 2L)
      .as[(String, Double)].collect().toMap
    val direct = Quantiles.groupedQuantileThreshold(docs, "lang", "n_chars", 1L, 2L, 6)
      .as[(String, Double)].collect().toMap
    viaMerge shouldBe direct
  }

  test("TV distance: hand-computed, zero on identical samples, one on disjoint") {
    def df(vs: Double*) = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    // a: {1:2, 2:2}; b: {1:1, 2:1, 3:2} -> p=(.5,.5,0), q=(.25,.25,.5)
    // TV = .5*(|.5-.25| + |.5-.25| + |0-.5|) = 0.5
    val out = Quantiles.tvDistance(df(1, 1, 2, 2), df(1, 2, 3, 3), "x", 6)
      .select("n_a", "n_b", "tv_distance").as[(Long, Long, Double)].head()
    out shouldBe ((4L, 4L, 0.5))
    Quantiles.tvDistance(df(1, 2, 3), df(1, 2, 3), "x", 6)
      .select("tv_distance").as[Double].head() shouldBe 0.0
    Quantiles.tvDistance(df(1, 2), df(3, 4), "x", 6)
      .select("tv_distance").as[Double].head() shouldBe 1.0
    // an empty side: TV undefined -> zero rows, never a NULL/NaN sentinel
    Quantiles.tvDistance(df(1, 2), df(), "x", 6).count() shouldBe 0L
    Quantiles.tvDistance(df(), df(), "x", 6).count() shouldBe 0L
  }

  test("decile profile: every decile matches the single-quantile operator; monotone in q") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("n_chars").cast("double").as("x"))
    val profile = Quantiles.groupedQuantileProfile(docs, "lang", "x", 10L, 6)
      .select("lang", "q", "threshold").as[(String, Long, Double)].collect()
    profile.length shouldBe docs.select("lang").distinct().count() * 9
    val byLang = profile.groupBy(_._1)
    // per-decile agreement with the one-quantile operator
    Seq(2L, 5L, 9L).foreach { q =>
      val single = Quantiles.groupedQuantileThreshold(docs, "lang", "x", q, 10L, 6)
        .select("lang", "threshold").as[(String, Double)].collect().toMap
      profile.filter(_._2 == q).foreach { case (lang, _, thr) =>
        withClue(s"lang=$lang q=$q:")(thr shouldBe single(lang))
      }
    }
    // thresholds never decrease as q grows
    byLang.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      sorted.zip(sorted.tail).foreach { case (a, b) => a should be <= b }
    }
    an[IllegalArgumentException] should be thrownBy
      Quantiles.groupedQuantileProfile(docs, "lang", "x", 1L, 6)
  }

  test("grouped TV drift matches the two-frame tvDistance per group; sole-group emits no row") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("n_chars").cast("double").as("x"))
    val drift = Quantiles.groupedTvDrift(docs, "source", "x", 6)
      .select("source", "tv_vs_rest").as[(String, Double)].collect().toMap
    val sources = docs.select("source").distinct().as[String].collect()
    drift.keySet shouldBe sources.toSet
    // every group's drift equals the explicit group-vs-rest comparison
    sources.take(4).foreach { s =>
      val direct = Quantiles.tvDistance(
        docs.filter(col("source") === s), docs.filter(col("source") =!= s), "x", 6)
        .select("tv_distance").as[Double].head()
      withClue(s"source $s:")(drift(s) shouldBe direct)
    }
    drift.values.foreach { tv => tv should (be >= 0.0 and be <= 1.0) }
    // a group owning the whole corpus has no "rest": no row
    val solo = docs.filter(col("source") === sources.head)
    Quantiles.groupedTvDrift(solo, "source", "x", 6).count() shouldBe 0L
  }

  test("standardize: hand-computed z, singleton and constant groups get NULL std") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a", 2L), ("a", 4L), ("a", 6L),  // mean 4, var_samp 4, std 2
      ("b", 9L),                        // singleton -> NULL std
      ("c", 5L), ("c", 5L))             // zero variance -> NULL std
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val out = Quantiles.standardize(df, "grp", "v").orderBy("id")
      .select("grp", "v", "group_mean", "group_std", "z")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].collect()
    out(0) shouldBe (("a", 2L, Some(4.0), Some(2.0), Some(-1.0)))
    out(1) shouldBe (("a", 4L, Some(4.0), Some(2.0), Some(0.0)))
    out(2) shouldBe (("a", 6L, Some(4.0), Some(2.0), Some(1.0)))
    out(3)._4 shouldBe None // singleton
    out(3)._5 shouldBe None
    out(4)._4 shouldBe None // constant group
    // rows all survive; the guard rejects non-integral values
    out should have length 6
    an[IllegalArgumentException] should be thrownBy
      Quantiles.standardize(df.withColumn("v", col("v").cast("double")), "grp", "v")
  }

  test("standardize agrees with Spark's stddev_samp on the real corpus") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val exact = Quantiles.standardize(docs, "lang", "n_chars")
      .select("lang", "group_std").distinct()
      .as[(String, Double)].collect().toMap
    val builtin = docs.groupBy("lang")
      .agg(stddev_samp(col("n_chars").cast("double")).as("s"))
      .as[(String, Double)].collect().toMap
    exact.keys.foreach { lang =>
      exact(lang) shouldBe (builtin(lang) +- 1e-6)
    }
  }

  test("winsorize: clamps into the per-group band, keeps every row, leaves the middle alone") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("v"))
    val out = Quantiles.winsorize(docs, "lang", "v", 1L, 19L, 20L, precision = 6,
      storage = org.apache.spark.storage.StorageLevel.NONE)
    out.count() shouldBe docs.count()
    out.filter(col("clamped") < col("group_lo") ||
      col("clamped") > col("group_hi")).count() shouldBe 0L
    // in-band values pass through; out-of-band pin to the violated edge
    out.filter(col("v") >= col("group_lo") && col("v") <= col("group_hi") &&
      col("clamped") =!= round(col("v"), 6)).count() shouldBe 0L
    out.filter(col("v") < col("group_lo") &&
      col("clamped") =!= col("group_lo")).count() shouldBe 0L
    out.filter(col("v") > col("group_hi") &&
      col("clamped") =!= col("group_hi")).count() shouldBe 0L
    // the band is real on this corpus: something actually clamps
    out.filter(col("clamped") =!= round(col("v"), 6)).count() should be > 0L
    an[IllegalArgumentException] should be thrownBy
      Quantiles.winsorize(docs, "lang", "v", 19L, 1L, 20L, 6)
  }

  test("logBucket: hand-computed buckets, sign symmetry, monotone, clamped top") {
    import org.apache.spark.sql.functions.col
    val vals = Seq(1234.567, -1234.567, 0.05, 0.0, 99.99, 100.0, 1.0e17)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val out = vals.select(col("id"),
        Quantiles.logBucket(col("x"), precision = 2, sigDigits = 2).as("b"))
      .as[(Long, Long)].collect().toMap
    out(0L) shouldBe 120000L  // m=123456 -> top-2 digits
    out(1L) shouldBe -120000L // sign restored after magnitude truncation
    out(2L) shouldBe 5L       // m=5: fewer digits than sigDigits -> exact
    out(3L) shouldBe 0L
    out(4L) shouldBe 9900L    // m=9999 -> 9900
    out(5L) shouldBe 10000L   // m=10000 -> 10000 (new decade)
    out(6L) shouldBe 9000000000000000000L // 1e19 fixed-point clamps to 9e18
    // ordering preserved: bucket is monotone in the value
    val pairs = out.toSeq.sortBy(_._1)
    val byValue = Seq(1234.567, -1234.567, 0.05, 0.0, 99.99, 100.0, 1.0e17)
      .zip(pairs.map(_._2)).sortBy(_._1)
    byValue.map(_._2).zip(byValue.map(_._2).tail).foreach { case (a, b) =>
      a should be <= b
    }
    an[IllegalArgumentException] should be thrownBy
      Quantiles.logBucket(col("x"), precision = 7, sigDigits = 2)
    an[IllegalArgumentException] should be thrownBy
      Quantiles.logBucket(col("x"), precision = 2, sigDigits = 0)
  }

  test("logBucket: the generated SQL CASE twin computes the identical bucket") {
    // the oracle twin is GENERATED from the same Pow10 constants — evaluate
    // it in Spark SQL over a wide value sweep and demand bit-equality with
    // the when-chain column (DuckDB-side parity is q94's oracle run)
    import org.apache.spark.sql.functions.{col, expr}
    val vals = spark.range(1, 20000)
      .selectExpr("CAST(id AS DOUBLE) * id / 7.0 AS x",
        "-(CAST(id AS DOUBLE) * id / 11.0) AS negx")
    Seq("x", "negx").foreach { c =>
      val twin = s"CASE WHEN $c < 0 THEN -1 ELSE 1 END * " +
        s"(${Quantiles.sigTruncCaseSql(Quantiles.fixedPointSql(c, 2), 2)})"
      vals.filter(
          Quantiles.logBucket(col(c), 2, 2) =!= expr(twin)).count() shouldBe 0L
    }
  }

  test("logBucket profile: bin count stays capped on a 1M-distinct heavy tail; thresholds bound the exact quantile") {
    import org.apache.spark.sql.functions.{col, lit}
    // planted heavy tail: v = id^2 / 7 — one million distinct doubles
    // spanning 11 decades; the exact rounded histogram would hold ~1e6
    // bins, the log-bucket one stays under the cap
    val heavy = spark.range(1, 1000001)
      .selectExpr("'g' AS g", "CAST(id AS DOUBLE) * id / 7.0 AS v")
    val hist = Quantiles.logBucketHistogram(heavy, "g", "v", precision = 0, sigDigits = 2)
    val bins = hist.count()
    bins should be < (90L * 19 + 1)   // sign x buckets-per-decade x decades
    bins should be < 2000L            // and nowhere near the 1e6 distinct values
    // every decile's bucket edge brackets the exact type-1 quantile:
    // edge <= exact <= edge * 1.1 + 1 (bucket width <= edge/10 at sig=2)
    val exact = Quantiles.groupedQuantileProfile(heavy, "g", "v", 10L, 0)
      .select("q", "threshold").as[(Long, Double)].collect().toMap
    val bucketed = Quantiles.logBucketQuantileProfile(heavy, "g", "v", 10L, 0, 2)
      .select("q", "threshold").as[(Long, Double)].collect().toMap
    bucketed.keySet shouldBe (1L to 9L).toSet
    (1L to 9L).foreach { q =>
      withClue(s"decile $q:") {
        bucketed(q) should be <= exact(q)
        exact(q) should be <= (bucketed(q) * 1.1 + 1.0)
      }
    }
    // single-quantile variant agrees with the profile row
    val p90 = Quantiles.groupedLogBucketQuantile(heavy, "g", "v", 9L, 10L, 0, 2)
      .select("threshold").as[Double].head()
    p90 shouldBe bucketed(9L)
  }

  test("grouped Pearson: agrees with Spark's corr; degenerate groups yield NULL") {
    import org.apache.spark.sql.functions.{col, corr, size => asize}
    val rows = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),        // perfect: r = 1
      ("b", 1L, 3L), ("b", 2L, 1L), ("b", 3L, 2L),        // hand case
      ("c", 5L, 7L),                                      // n = 1 -> NULL
      ("d", 2L, 1L), ("d", 2L, 9L))                       // zero x-variance -> NULL
      .toDF("g", "x", "y")
    val got = Quantiles.groupedPearson(rows, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    got("a").get shouldBe 1.0 +- 1e-12
    got("b").get shouldBe -0.5 +- 1e-12 // n=3: num = 3*17-6*6 = -15; vx=vy=6... -15/(sqrt(18)*sqrt(... )
    got("c") shouldBe None
    got("d") shouldBe None
    // real corpus: exact-moment r equals Spark's float corr to float tolerance
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("n_chars").cast("long").as("x"),
        asize(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("y"))
    val exact = Quantiles.groupedPearson(docs, "lang", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val viaCorr = docs.groupBy("lang").agg(corr("x", "y").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (lang, r) =>
      withClue(s"lang $lang:")(r shouldBe (viaCorr(lang) +- 1e-9))
    }
  }

  test("winsorize: a NULL value stays NULL, never silently clamps to the band edge") {
    val rows = Seq((1L, "g", Option(1.0)), (2L, "g", Option(2.0)),
      (3L, "g", Option(3.0)), (4L, "g", Option.empty[Double]))
      .toDF("id", "grp", "x")
    val out = Quantiles.winsorize(rows, "grp", "x", 1L, 3L, 4L, precision = 6,
        storage = StorageLevel.NONE)
      .select("id", "clamped").as[(Long, Option[Double])].collect().toMap
    out(4L) shouldBe None // least/greatest skip NULLs; the guard keeps it NULL
    out(1L) shouldBe defined
  }
}
