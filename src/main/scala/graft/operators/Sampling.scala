package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash

/** Deterministic, content-addressed sampling and dataset splitting for
  * training-data pipelines.
  *
  * Row membership is a pure function of the CONTENT (a portable rolling
  * hash of the text), not of row ids, file layout, or RNG state — so a
  * sample or split is stable across reruns, re-sharding, id reassignment,
  * and engines (the DuckDB oracle replays the same hash). This is the
  * standard way to cut train/val/test from a large corpus without a
  * coordination step: every executor decides membership row-locally, zero
  * shuffle.
  *
  * Caveat (documented, not hidden): content-hash splits put byte-identical
  * duplicates in the SAME split, but near-duplicates can still straddle
  * splits — run dedup ([[Dedup]]) before splitting when leakage across
  * splits matters.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the rolling hash of `text`.
    * polyHash is non-negative (mod 1e9+7), so plain `%` is exact.
    */
  def contentBucket(text: Column, buckets: Int = 100): Column = {
    // driver-side guard: buckets=0 would otherwise surface as an ANSI
    // divide-by-zero inside executor tasks
    require(buckets > 0, "buckets must be positive")
    polyHash(text) % buckets
  }

  /** Keep rows whose content bucket falls below `pct` of `buckets` — a
    * deterministic ~pct/buckets sample. Row-local; the filter runs inside
    * whole-stage codegen at the scan.
    */
  def deterministicSample(df: DataFrame, textCol: String, pct: Int,
                          buckets: Int = 100): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(pct >= 0 && pct <= buckets, s"pct must be in [0, $buckets]")
    df.filter(contentBucket(col(textCol), buckets) < pct)
  }

  /** Assign each row a train/val/test split by content bucket:
    * [0, trainPct) -> train, [trainPct, trainPct+valPct) -> val, rest ->
    * test. Disjoint and exhaustive by construction.
    */
  def assignSplit(df: DataFrame, textCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "trainPct/valPct must be non-negative and sum to <= 100")
    val b = contentBucket(col(textCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
