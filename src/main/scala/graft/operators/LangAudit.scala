package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Mixed-language document detection: language-ID per TOKEN WINDOW, then a
  * per-document consistency rollup — the curation audit that catches pages
  * whose doc-level language tag is "en" because an English nav bar
  * out-votes the German article body, or crawl concatenations that glue
  * two languages into one record. Doc-level lang-ID (q21) cannot see
  * either: its argmax collapses the whole doc to one label.
  *
  * Window granularity (fixed `windowTokens` tokens, not sentences) keeps
  * the segmentation a pure function of the token stream — no
  * punctuation-dependent splitting to disagree across engines — and each
  * window reuses the SAME marker scorer as q21 ([[TextFunctions
  * .predictedLang]]), so window verdicts and doc verdicts share one
  * definition of "looks like language X".
  *
  * Per doc: `n_windows` (all), `n_known` (windows with any marker hit),
  * `n_langs` (distinct known window languages), `lang_top` (most common
  * known window language; ties -> lexicographically smallest, fully
  * deterministic), `top_share_ppm` (integer ppm of known windows the top
  * language holds), `mixed` (1 when a second language is present). Every
  * input row survives — token-less docs report zeros and 'unknown'.
  *
  * Scale shape: windows explode row-locally (short token-array rows; the
  * text itself never shuffles), one (id, lang) count aggregate, one
  * group-sized rollup. The dominant-language argmax is a single
  * `min(struct(-cnt, lang))` — combinable, no window function, no second
  * corpus pass. All output math is integer, so the DuckDB twin matches
  * bit-for-bit.
  */
object LangAudit {

  def mixedLanguageReport(docs: DataFrame, windowTokens: Int = 20,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val wins = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__w"))
      .select(col(idCol), explode(expr(
        s"""IF(size(__w) > 0,
           |  transform(sequence(0, (size(__w) - 1) div $windowTokens),
           |    i -> slice(__w, i * $windowTokens + 1, $windowTokens)),
           |  array())""".stripMargin)).as("seg"))
    val segLang = wins.select(col(idCol),
      TextFunctions.predictedLang(col("seg")).as("seg_lang"))
    val perLang = segLang
      .groupBy(col(idCol), col("seg_lang"))
      .agg(count(lit(1)).as("cnt"))
    val known = col("seg_lang") =!= "unknown"
    val agg = perLang.groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_windows"),
        coalesce(sum(when(known, col("cnt"))), lit(0L)).as("n_known"),
        count(when(known, lit(1))).as("n_langs"),
        // dominant known language: min over (-cnt, lang) = highest count,
        // ties to the smallest lang — deterministic, combinable, NULL
        // (skipped by min) when no window is known
        min(when(known, struct((-col("cnt")).as("nc"), col("seg_lang").as("l"))))
          .as("__best"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        coalesce(col("n_langs"), lit(0L)).as("n_langs"),
        coalesce(col("__best.l"), lit("unknown")).as("lang_top"),
        when(coalesce(col("n_known"), lit(0L)) > 0,
          expr("((-`__best`.nc) * 1000000) div n_known")).otherwise(lit(0L))
          .as("top_share_ppm"),
        (coalesce(col("n_langs"), lit(0L)) >= 2).cast("int").as("mixed"))
  }
}
