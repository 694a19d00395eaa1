package graft.operators

import graft.SparkTestBase

/** Table profiling: native-type min/max ordering, modal tie-break, null
  * accounting (including an all-NULL column), and the exact ppm length.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile report: counts, native-order min/max, mode tie-break, nulls") {
    val df = Seq(
      (9L, Some("bb"), Option.empty[String]),
      (10L, Some("aa"), None), // numeric min is 9 but STRING min would be "10"
      (11L, Some("bb"), None),
      (12L, None, None)
    ).toDF("id", "s", "dead")
    val out = Profile.tableProfile(df, Seq("id", "s", "dead"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = out("id")
    id.getLong(1) shouldBe 4L      // n_rows
    id.getLong(2) shouldBe 0L      // n_null
    id.getLong(3) shouldBe 4L      // n_distinct
    id.getString(4) shouldBe "9"   // native numeric min, not lexicographic
    id.getString(5) shouldBe "12"
    id.getLong(7) shouldBe 1L      // every id unique -> mode count 1
    id.getString(6) shouldBe "10"  // tie on count -> smallest STRING wins
    id.getLong(8) shouldBe 1750000L // (1+2+2+2)/4 chars = 1.75

    val s = out("s")
    s.getLong(2) shouldBe 1L
    s.getLong(3) shouldBe 2L
    s.getString(4) shouldBe "aa"
    s.getString(5) shouldBe "bb"
    s.getString(6) shouldBe "bb"   // 2 occurrences beats aa's 1
    s.getLong(7) shouldBe 2L
    s.getLong(8) shouldBe 2000000L

    val dead = out("dead")
    dead.getLong(2) shouldBe 4L
    dead.getLong(3) shouldBe 0L
    assert(dead.isNullAt(4) && dead.isNullAt(5) && dead.isNullAt(6))
    assert(dead.isNullAt(7) && dead.isNullAt(8))
  }

  test("profile diff: statuses, ppm deltas, changed flags") {
    val before = Profile.tableProfile(
      Seq((1L, Some("x")), (2L, None)).toDF("id", "s"), Seq("id", "s"))
    val after = Profile.tableProfile(
      Seq((1L, 7L), (2L, 7L), (3L, 9L), (4L, 9L)).toDF("id", "v"), Seq("id", "v"))
    val d = Profile.diffProfiles(before, after)
      .collect().map(r => r.getString(0) -> r).toMap

    val id = d("id")
    id.getString(1) shouldBe "common"
    id.getLong(2) shouldBe 0L            // null ppm before
    id.getLong(3) shouldBe 0L
    id.getLong(4) shouldBe 0L            // delta
    id.getLong(5) shouldBe 2L            // distinct before
    id.getLong(6) shouldBe 4L
    id.getLong(7) shouldBe 2000000L      // distinct ratio 2x
    id.getInt(8) shouldBe 0              // min "1" unchanged
    id.getInt(9) shouldBe 1              // max "2" -> "4"
    id.getInt(10) shouldBe 0             // mode: tie -> "1" both sides
    id.getLong(11) shouldBe 0L           // all ids are 1 char

    val s = d("s")
    s.getString(1) shouldBe "removed"
    assert(s.isNullAt(3) && s.isNullAt(4) && s.isNullAt(6) && s.isNullAt(7))
    assert(s.isNullAt(8) && s.isNullAt(9) && s.isNullAt(10) && s.isNullAt(11))
    s.getLong(2) shouldBe 500000L        // 1 of 2 null before

    val v = d("v")
    v.getString(1) shouldBe "added"
    assert(v.isNullAt(2) && v.isNullAt(4) && v.isNullAt(5) && v.isNullAt(7))
    v.getLong(3) shouldBe 0L
    v.getLong(6) shouldBe 2L
  }

  test("empty table: one row per column, zero counts, NULL stats") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val out = Profile.tableProfile(empty, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    out.keySet shouldBe Set("id", "s")
    for (r <- out.values) {
      r.getLong(1) shouldBe 0L // n_rows
      r.getLong(2) shouldBe 0L // n_null
      r.getLong(3) shouldBe 0L // n_distinct
      assert((4 to 8).forall(r.isNullAt)) // min/max/mode/count/avg_len
    }
    // and diffing an empty-table snapshot against data is all-common with
    // NULL before-side ppms (den 0), never a divide error
    val d = Profile.diffProfiles(
      Profile.tableProfile(empty, Seq("id", "s")),
      Profile.tableProfile(Seq((1L, "a")).toDF("id", "s"), Seq("id", "s")))
      .collect().map(r => r.getString(0) -> r).toMap
    d("id").getString(1) shouldBe "common"
    assert(d("id").isNullAt(2))  // null_ppm_before: n_rows 0 -> NULL
    d("id").getLong(3) shouldBe 0L
  }

  test("unknown column is a loud error") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Profile.tableProfile(df, Seq("id", "nope"))
    }
    e.getMessage should include("nope")
  }

  test("heavy hitters: exact counts, threshold semantics, CMS filter invisible") {
    // skewed column: 'a' x 50, 'b' x 30, 'c' x 15, 'd' x 5 (n = 100)
    val rows = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(15)("c") ++ Seq.fill(5)("d")).zipWithIndex
      .map { case (v, i) => (i.toLong, v, s"uniq-$i") }
    val df = rows.toDF("id", "skewed", "unique")
    // 10% threshold: a/b/c pass, d (5%) drops; the all-distinct column
    // has no hitters at all
    val out = Profile.heavyHitters(df, Seq("skewed", "unique"), minSharePpm = 100000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    out.filter(_._1 == "unique") shouldBe empty
    val sk = out.filter(_._1 == "skewed").sortBy(_._5)
    sk.map(t => (t._2, t._3, t._4, t._5)) shouldBe Seq(
      ("a", 50L, 500000L, 1), ("b", 30L, 300000L, 2), ("c", 15L, 150000L, 3))
    // the top hitter IS tableProfile's exact mode — the CMS path answers
    // the modal-value question exactly (the sketch only pre-filters)
    val mode = Profile.tableProfile(df, Seq("skewed"))
      .select("mode_str", "mode_count").head()
    (sk.head._2, sk.head._3) shouldBe ((mode.getString(0), mode.getLong(1)))
  }

  test("k-anonymity: class sizes, the k boundary, NULL quasi values form a class") {
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"), // size 3: safe at k=3
      (4L, "en", "b"), (5L, "en", "b"),                  // size 2: at risk
      (6L, "de", null.asInstanceOf[String]),             // NULL class, size 1
      (7L, "de", "a")                                    // size 1: at risk
    ).toDF("id", "lang", "src")
    val out = Profile.kAnonymity(rows, Seq("lang", "src"), k = 3L)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getInt(3))).toSet
    out shouldBe Set(
      ("en", Some("a"), 3L, 0), ("en", Some("b"), 2L, 1),
      ("de", None, 1L, 1), ("de", Some("a"), 1L, 1))
    // exactly-k sits on the safe side of the boundary
    Profile.kAnonymity(rows, Seq("lang", "src"), k = 2L)
      .filter("lang = 'en' AND src = 'b'").head().getInt(3) shouldBe 0
    val e = intercept[IllegalArgumentException] {
      Profile.kAnonymity(rows, Seq("nope"))
    }
    e.getMessage should include("nope")
  }

  test("l-diversity: a k-large homogeneous class is flagged; NULL sensitive is its own value") {
    val rows = Seq(
      // class ("en", 0): 5 members, ALL source "a" — k-safe yet 1-diverse
      (1L, "en", 0L, "a"), (2L, "en", 0L, "a"), (3L, "en", 0L, "a"),
      (4L, "en", 0L, "a"), (5L, "en", 0L, "a"),
      // class ("en", 1): 3 members over sources a/a/b — diverse, modal 2/3
      (6L, "en", 1L, "a"), (7L, "en", 1L, "a"), (8L, "en", 1L, "b"),
      // class ("de", 0): NULL + "a" — NULL counts as a second value
      (9L, "de", 0L, null.asInstanceOf[String]), (10L, "de", 0L, "a")
    ).toDF("id", "lang", "bucket", "src")
    val out = Profile.lDiversity(rows, Seq("lang", "bucket"), "src", l = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    out(("en", 0L)) shouldBe ((5L, 1L, 1000000L, 1)) // homogeneous: flagged
    out(("en", 1L)) shouldBe ((3L, 2L, 666666L, 0))  // floor ppm of 2/3
    out(("de", 0L)) shouldBe ((2L, 2L, 500000L, 0))  // NULL diversifies
    // the sensitive column cannot double as a quasi-identifier
    val e = intercept[IllegalArgumentException] {
      Profile.lDiversity(rows, Seq("lang", "src"), "src")
    }
    e.getMessage should include("quasi-identifier")
  }

  test("t-closeness: point-mass classes score the missing-mass distance; global-matching classes score ~0") {
    // a single class IS the global distribution -> tvd exactly 0
    val one = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"), (4L, "x", "c"))
      .toDF("id", "q", "src")
    Profile.tCloseness(one, Seq("q"), "src", tPpm = 300000L)
      .head().getLong(2) shouldBe 0L
    // global over both classes: a 250000, b 125000, c 625000 ppm
    val rows = Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"), (4L, "x", "c"),
      (5L, "y", "c"), (6L, "y", "c"), (7L, "y", "c"), (8L, "y", "c")
    ).toDF("id", "q", "src")
    val out = Profile.tCloseness(rows, Seq("q"), "src", tPpm = 300000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // x (a 500000, b 250000, c 250000): (250000 + 125000 + 375000) / 2
    out("x") shouldBe ((4L, 375000L, 1))
    // y (point mass on c): present |1e6 - 625000| + missing (a + b
    // = 375000) = 750000 -> / 2
    out("y") shouldBe ((4L, 375000L, 1))
    // NULL sensitive values participate as their own value (window
    // partitioning, not an equi-join that would drop them)
    val withNull = rows.unionByName(
      Seq((9L, "z", null.asInstanceOf[String])).toDF("id", "q", "src"))
    val z = Profile.tCloseness(withNull, Seq("q"), "src", tPpm = 300000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // z is a point mass on NULL (global share 1/9) — far from global
    z("z") should be > 800000L
    val e = intercept[IllegalArgumentException] {
      Profile.tCloseness(rows, Seq("src"), "src")
    }
    e.getMessage should include("quasi-identifier")
  }

  test("suppressAtRisk: classes failing any enabled audit drop; generalize NULLs the quasi tuple") {
    val rows = Seq(
      // class ("en", 0): 5 members, a/a/b/b/c — k-safe, 3-diverse, and
      // near the global source distribution (tvd 266666 ppm) -> SURVIVES
      (1L, "en", 0L, "a"), (2L, "en", 0L, "a"), (3L, "en", 0L, "b"),
      (4L, "en", 0L, "b"), (5L, "en", 0L, "c"),
      // class ("en", 1): 2 members -> fails k=3
      (6L, "en", 1L, "a"), (7L, "en", 1L, "b"),
      // class ("de", 0): 4 members all "a" -> k-safe but 1-diverse
      (8L, "de", 0L, "a"), (9L, "de", 0L, "a"),
      (10L, "de", 0L, "a"), (11L, "de", 0L, "a"),
      // class (NULL, 0): singleton — the NULL-safe join must still catch it
      (12L, null.asInstanceOf[String], 0L, "a")
    ).toDF("id", "lang", "bucket", "src")
    val kept = Profile.suppressAtRisk(rows, Seq("lang", "bucket"), k = 3L,
      sensitiveCol = Some("src"), l = 2L, tPpm = Some(500000L))
    kept.columns.toSeq shouldBe rows.columns.toSeq // released schema == input
    kept.select("id").as[Long].collect().sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    // generalize: every row survives, at-risk rows' quasi tuple NULLs out
    // (top-of-hierarchy generalization), clean rows are untouched
    val gen = Profile.suppressAtRisk(rows, Seq("lang", "bucket"), k = 3L,
        sensitiveCol = Some("src"), l = 2L, tPpm = Some(500000L),
        generalize = true)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    gen.size shouldBe 12
    gen(1L) shouldBe ((Some("en"), 0L))
    gen(6L) shouldBe ((None, -1L))
    gen(8L) shouldBe ((None, -1L))
    gen(12L) shouldBe ((None, -1L))
    // k-anonymity alone: only the small classes go (1-diverse "de" stays)
    Profile.suppressAtRisk(rows, Seq("lang", "bucket"), k = 3L)
      .select("id").as[Long].collect().sorted shouldBe
      Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L, 11L)
    // tPpm without a sensitive column is the audit CLI's loud error
    val ex = intercept[IllegalArgumentException] {
      Profile.suppressAtRisk(rows, Seq("lang", "bucket"), tPpm = Some(1L))
    }
    ex.getMessage should include("sensitiveCol")
  }

  test("heavy hitters: boundary share passes, deterministic under repartition") {
    // 'x' at exactly 20% (the >= boundary), 'y' just under
    val rows = (Seq.fill(20)("x") ++ Seq.fill(19)("y") ++
      (0 until 61).map(i => s"v$i")).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "c")
    def hits(d: org.apache.spark.sql.DataFrame) =
      Profile.heavyHitters(d, Seq("c"), minSharePpm = 200000L)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    val a = hits(df)
    a shouldBe Set(("x", 20L))
    hits(df.repartition(13)) shouldBe a
  }
}
