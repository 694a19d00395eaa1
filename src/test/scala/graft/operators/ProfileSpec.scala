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

  test("unknown column is a loud error") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Profile.tableProfile(df, Seq("id", "nope"))
    }
    e.getMessage should include("nope")
  }
}
