package graft.operators

import graft.SparkTestBase

/** Declarative expectations: hand-planted violations per rule kind,
  * NULL-skip semantics, tolerance verdicts, FK broadcast/shuffle parity,
  * degenerate inputs.
  */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._
  import Expectations._

  // id 3 duplicates id 2's key; lang NULL on 4; score 99 out of range;
  // source "weird" breaks the regex
  private def docs = Seq(
    (1L, Option("aaa"), Option("en"), 10L, "src1"),
    (2L, Option("bbb"), Option("de"), 20L, "src2"),
    (2L, Option("ccc"), Option("xx"), 30L, "src3"),
    (4L, None, None, 99L, "weird")
  ).toDF("id", "text", "lang", "score", "source")

  private def verdicts(rules: Seq[Rule]) =
    Expectations.check(docs, rules)
      .select("rule", "target", "n_rows", "n_violations", "passed")
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

  test("every rule kind counts its planted violations exactly") {
    val out = verdicts(Seq(
      NotNull("text"), NotNull("id"),
      Unique(Seq("id")),
      InRange("score", 0L, 50L),
      InSet("lang", Seq("en", "de")),
      MatchesRegex("source", "^src[0-9]$"),
      RowCountBetween(1L, 3L)))
    out(("not_null", "text")) shouldBe ((4L, 1L, 0))
    out(("not_null", "id")) shouldBe ((4L, 0L, 1))
    out(("unique", "id")) shouldBe ((4L, 2L, 0)) // BOTH rows of key 2
    out(("in_range", "score")) shouldBe ((4L, 1L, 0))
    out(("in_set", "lang")) shouldBe ((4L, 1L, 0)) // NULL lang skipped
    out(("matches_regex", "source")) shouldBe ((4L, 1L, 0))
    out(("row_count_between", "[1, 3]")) shouldBe ((4L, 1L, 0))
  }

  test("NULLs violate ONLY not_null — range/set/regex skip them") {
    val out = verdicts(Seq(
      NotNull("lang"), InSet("lang", Seq("zz")), MatchesRegex("lang", "^z+$")))
    out(("not_null", "lang"))._2 shouldBe 1L
    out(("in_set", "lang"))._2 shouldBe 3L    // en, de, xx — not the NULL
    out(("matches_regex", "lang"))._2 shouldBe 3L
  }

  test("tolerance passes a bounded violation rate, cross-multiplied exactly") {
    // 1 violation in 4 rows = 250000 ppm: tol 249999 fails, 250000 passes
    verdicts(Seq(InRange("score", 0L, 50L, tolerancePpm = 249999L)))
      .head._2._3 shouldBe 0
    verdicts(Seq(InRange("score", 0L, 50L, tolerancePpm = 250000L)))
      .head._2._3 shouldBe 1
  }

  test("foreign key: orphan rows counted, NULL keys skipped, broadcast == shuffle") {
    val parent = Seq(1L, 2L).toDF("pid")
    def fk(bc: Boolean) = Expectations.check(docs,
      Seq(ForeignKey(Seq("id"), parent, Seq("pid"), broadcastParent = bc)))
      .select("n_rows", "n_violations", "passed")
      .as[(Long, Long, Int)].head()
    fk(bc = true) shouldBe ((4L, 1L, 0)) // only id 4 is an orphan
    fk(bc = false) shouldBe fk(bc = true)
    // NULL child keys skip the probe
    val withNull = docs.unionByName(
      Seq((Option.empty[Long], Option("x"), Option("en"), 1L, "src1"))
        .toDF("id", "text", "lang", "score", "source"))
    Expectations.check(withNull,
      Seq(ForeignKey(Seq("id"), parent, Seq("pid"))))
      .select("n_violations").as[Long].head() shouldBe 1L
  }

  test("parseRules: the one-string DSL round-trips every rule kind") {
    val parent = Seq(1L).toDF("pid")
    val rules = Expectations.parseRules(
      "not_null:text; unique:id,lang; in_set:lang=en|de; " +
        "in_range:score=0..50; regex:source=^src[0-9]$; row_count:1..10; " +
        "fk:id->p:pid",
      { p => p shouldBe "p"; parent })
    rules.map(_.getClass.getSimpleName) shouldBe Seq("NotNull", "Unique",
      "InSet", "InRange", "MatchesRegex", "RowCountBetween", "ForeignKey")
    rules(1) shouldBe Unique(Seq("id", "lang"))
    rules(2) shouldBe InSet("lang", Seq("en", "de"))
    rules(3) shouldBe InRange("score", 0L, 50L)
    // parsed rules drive check() identically to the constructed forms
    Expectations.check(docs, rules.take(6)).count() shouldBe 6L
    an[IllegalArgumentException] should be thrownBy
      Expectations.parseRules("uniq:id", _ => parent)
    an[IllegalArgumentException] should be thrownBy
      Expectations.parseRules("", _ => parent)
    an[IllegalArgumentException] should be thrownBy
      Expectations.parseRules("in_range:score=0", _ => parent)
  }

  test("parseRules: \\; and \\| escape the separators; malformed regex fails at parse time") {
    val parent = Seq(1L).toDF("pid")
    // a regex matching "a;b" and a set value containing '|' both survive
    val rules = Expectations.parseRules(
      """regex:text=^a\;b$; in_set:lang=en\|us|de; not_null:id""",
      _ => parent)
    rules.map(_.getClass.getSimpleName) shouldBe
      Seq("MatchesRegex", "InSet", "NotNull")
    rules(0) shouldBe MatchesRegex("text", "^a;b$")
    rules(1) shouldBe InSet("lang", Seq("en|us", "de"))
    // other backslashes pass through verbatim (\d stays a regex class)
    Expectations.parseRules("""regex:source=^src\d$""", _ => parent)
      .head shouldBe MatchesRegex("source", """^src\d$""")
    // a trailing-'|' typo must NOT admit "" as a valid set value
    // (String.split's trailing-empty drop, preserved); interior empties
    // survive explicitly
    Expectations.parseRules("in_set:lang=en|fr|", _ => parent)
      .head shouldBe InSet("lang", Seq("en", "fr"))
    Expectations.parseRules("in_set:lang=en||fr", _ => parent)
      .head shouldBe InSet("lang", Seq("en", "", "fr"))
    // an unescaped ';' inside a pattern mis-splits -> the fragment fails
    // loudly, and a malformed pattern fails AT PARSE with the escape hint
    an[IllegalArgumentException] should be thrownBy
      Expectations.parseRules("""regex:text=^a{2;3}$""", _ => parent)
    val e = intercept[IllegalArgumentException] {
      Expectations.parseRules("""regex:text=^a[;b$""", _ => parent)
    }
    e.getMessage should include("escaping")
  }

  test("0-row table passes everything except row-count floors; empty rules raise") {
    val empty = docs.filter("id < 0")
    val out = Expectations.check(empty, Seq(
      NotNull("text"), Unique(Seq("id")), RowCountBetween(1L, 10L)))
      .select("rule", "n_rows", "n_violations", "passed")
      .as[(String, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    out("not_null") shouldBe (("not_null", 0L, 0L, 1))
    out("unique") shouldBe (("unique", 0L, 0L, 1))
    out("row_count_between") shouldBe (("row_count_between", 0L, 1L, 0))
    an[IllegalArgumentException] should be thrownBy
      Expectations.check(docs, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      ForeignKey(Seq("a", "b"), docs, Seq("x"))
  }
}
