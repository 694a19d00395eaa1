package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Two-phase distinct must be result-identical to single-phase
  * countDistinct — including null handling and keys whose values are all
  * null (countDistinct yields 0, and the key must still appear).
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("distinctCountTwoPhase == countDistinct, nulls ignored") {
    val df = Seq(
      ("click", Some("u1")), ("click", Some("u1")), ("click", Some("u2")),
      ("view", Some("u1")), ("view", None),
      ("error", None)).toDF("event_type", "user_id")

    val twoPhase = Skew.distinctCountTwoPhase(df, Seq(col("event_type")), col("user_id"), "n")
      .as[(String, Long)].collect().toMap
    val singlePhase = df.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap

    twoPhase shouldBe singlePhase
    twoPhase("click") shouldBe 2L
    twoPhase("view") shouldBe 1L
    twoPhase("error") shouldBe 0L // all-null key survives with 0, like countDistinct
  }

  test("expression keys resolve (grouping happens on the projected output)") {
    val df = Seq(("Click", "u1"), ("CLICK", "u2"), ("view", "u1")).toDF("event_type", "user_id")
    val out = Skew.distinctCountTwoPhase(df, Seq(upper(col("event_type")).as("et")), col("user_id"), "n")
      .as[(String, Long)].collect().toMap
    out("CLICK") shouldBe 2L
    out("VIEW") shouldBe 1L
  }

  test("salted join is row-identical to the plain join, incl. a hot key") {
    // one pathological key owns most of the left side
    val left = ((1 to 200).map(i => ("hot", s"l$i")) ++
      Seq(("a", "x"), ("b", "y"), ("miss", "z"))).toDF("k", "lv")
    val right = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("other", "O"))
      .toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", numSalts = 8)
      .as[(String, String, String)].collect().sorted.toSeq
    val plain = left.join(right, "k")
      .as[(String, String, String)].collect().sorted.toSeq
    salted shouldBe plain
    salted.count(_._1 == "hot") shouldBe 200 // every hot pair exactly once
  }

  test("salted join: identical hot rows spread across salts; reserved column rejected") {
    // byte-identical duplicates of one hot key must still draw multiple
    // salts (position-based salting) — a whole-row hash would put them all
    // in one partition and deliver zero relief
    val left = (1 to 64).map(_ => ("hot", "same")).toDF("k", "lv").repartition(4)
    val right = Seq(("hot", "H")).toDF("k", "rv")
    val salts = left.withColumn("__probe",
        pmod(monotonically_increasing_id(), lit(8L)))
      .select("__probe").distinct().count()
    salts should be > 1L
    Skew.saltedJoin(left, right, "k", numSalts = 8).count() shouldBe 64
    // a real __salt column in the input must be a loud error, not silent
    // clobber-then-drop
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(left.withColumn("__salt", lit(1)), right, "k", 4)
  }

  test("salted join: null keys never match, multiple right rows fan out once per salt-match") {
    val left = Seq((Option("a"), "l1"), (Option.empty[String], "l2")).toDF("k", "lv")
    val right = Seq((Option("a"), "r1"), (Option("a"), "r2"), (Option.empty[String], "r3"))
      .toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", numSalts = 4)
      .as[(String, String, String)].collect().sorted.toSeq
    val plain = left.join(right, "k")
      .as[(String, String, String)].collect().sorted.toSeq
    salted shouldBe plain
    salted.map(_._3).sorted shouldBe Seq("r1", "r2") // null key dropped, dup right rows kept
  }

  test("grouped top-k: salted two-phase is row-identical to the single window, any salt count") {
    import org.apache.spark.sql.expressions.Window
    // hot group: 'en' holds most rows (the skew the operator exists for)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val single = docs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rank") <= 5)
      .select("doc_id", "lang", "n_chars", "rank")
      .as[(Long, String, Long, Int)].collect().toSet
    for (salts <- Seq(1, 3, 16, 64)) {
      val salted = Skew.groupedTopK(docs, "lang",
          Seq(col("n_chars").desc, col("doc_id").asc), k = 5, numSalts = salts)
        .select("doc_id", "lang", "n_chars", "rank")
        .as[(Long, String, Long, Int)].collect().toSet
      withClue(s"numSalts=$salts:")(salted shouldBe single)
    }
  }

  test("grouped top-k: k larger than any group returns whole groups, ranked") {
    val tiny = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("id", "g", "v")
    val out = Skew.groupedTopK(tiny, "g", Seq(col("v").desc, col("id").asc), k = 10)
      .select("id", "rank").as[(Long, Int)].collect().toMap
    out shouldBe Map(2L -> 1, 1L -> 2, 3L -> 1)
    an[IllegalArgumentException] should be thrownBy
      Skew.groupedTopK(tiny, "g", Seq(col("v").desc), k = 0)
  }
}
