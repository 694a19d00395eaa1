package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation shapes.
  *
  * AQE (on by default in every [[graft.PlatformProvider]] session) already
  * splits skewed JOIN partitions at runtime; what it cannot fix is an
  * aggregation whose per-key STATE is itself the problem — a
  * `countDistinct` where one group key owns most of the corpus packs that
  * key's entire distinct-set build into one task. These helpers re-shape
  * such aggregations so the heavy phase shuffles on a wider key.
  */
object Skew {

  /** Exact distinct count per key, two-phase: dedup on (key, value) first
    * — that shuffle spreads by BOTH columns, so a key with a billion rows
    * still fans across the cluster — then a plain count per key over the
    * deduped rows (map-side combinable). Result is identical to
    * `groupBy(key).agg(countDistinct(value))`; the difference is that no
    * single task ever holds one key's full distinct set during the wide
    * phase. Use when one key dominates the corpus; the single-phase form
    * is fine (and one shuffle cheaper) when keys are balanced.
    */
  def distinctCountTwoPhase(df: DataFrame, keyCols: Seq[Column],
      valueCol: Column, outName: String): DataFrame = {
    // group by the projected output's own column names, not the input
    // expressions — an expression key (e.g. upper(col)) would fail to
    // re-resolve against the post-select frame
    val projected = df.select(keyCols :+ valueCol.as("__v"): _*)
    val keyNames = projected.columns.dropRight(1)
    projected
      .distinct()
      .groupBy(keyNames.map(col).toIndexedSeq: _*)
      // count(col) skips nulls, so a key whose values are ALL null still
      // yields a row with 0 — exactly countDistinct's behavior (filtering
      // null rows out before the distinct would drop the key entirely)
      .agg(count(col("__v")).as(outName))
  }
}
