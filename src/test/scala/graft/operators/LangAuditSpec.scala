package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Window-level language consistency: planted monolingual, bilingual,
  * markerless, and empty docs with hand-computed rollups.
  */
class LangAuditSpec extends SparkTestBase {
  import spark.implicits._

  private val en20 = Seq.fill(5)("the of and a").mkString(" ")   // one 20-token en window
  private val de20 = Seq.fill(5)("der die und das").mkString(" ") // one 20-token de window

  test("mixed-language rollup: planted bilingual doc flagged, monolingual not") {
    val docs = Seq(
      (1L, s"$en20 $en20"),          // 2 en windows
      (2L, s"$en20 $en20 $de20"),    // 2 en + 1 de -> mixed, en dominant
      (3L, "zz qq ww rr"),           // markerless -> unknown
      (4L, "")                       // token-less -> zero windows
    ).toDF("doc_id", "text")
    val out = LangAudit.mixedLanguageReport(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String, Long, Int)].collect().toSeq
    out shouldBe Seq(
      (1L, 2L, 2L, 1L, "en", 1000000L, 0),
      (2L, 3L, 3L, 2L, "en", 666666L, 1),
      (3L, 1L, 0L, 0L, "unknown", 0L, 0),
      (4L, 0L, 0L, 0L, "unknown", 0L, 0))
  }

  test("dominant-language tie breaks to the lexicographically smallest lang") {
    // 1 en window + 1 de window: counts tie at 1 -> 'de' < 'en'
    val docs = Seq((1L, s"$en20 $de20")).toDF("doc_id", "text")
    val row = LangAudit.mixedLanguageReport(docs)
      .select("lang_top", "top_share_ppm", "mixed")
      .as[(String, Long, Int)].head()
    row shouldBe (("de", 500000L, 1))
  }

  test("window width is the sensitivity knob: doc-level argmax misses what windows catch") {
    // the en material out-votes de 2:1, so DOC-level lang-ID says 'en'
    // and sees nothing unusual — the window report still exposes the
    // embedded German third
    val docs = Seq((1L, s"$en20 $en20 $de20")).toDF("doc_id", "text")
    val docLevel = docs.select(graft.functions.TextFunctions
      .predictedLangText(col("text")).as("l")).as[String].head()
    docLevel shouldBe "en"
    LangAudit.mixedLanguageReport(docs)
      .select("mixed").as[Int].head() shouldBe 1
  }
}
