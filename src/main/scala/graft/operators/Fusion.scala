package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — combine N independently
  * ranked signals into one consensus ranking: each signal contributes
  * `1 / (kRrf + rank)` for the documents on its top-`m` list, and the
  * fused score is the sum. The multi-signal data-SELECTION primitive: a
  * curation pipeline ranks documents by classifier quality, by host
  * authority, by surprisal, by dedup-cluster size — RRF fuses them
  * without having to calibrate the scores against each other (only ranks
  * matter), which is exactly why retrieval stacks use it over weighted
  * score sums.
  *
  * Engine-exact by the pinned-integer discipline: contributions are
  * `1e9 div (kRrf + rank)` — integer floor division on an integer rank —
  * and the fuse is a BIGINT sum, so the fused ranking is bit-identical
  * across engines and partitionings (a float 1/(k+r) sum ties would
  * break on last-bit drift).
  *
  * Scale shape: each signal cuts to its top-`m` by (score desc, id asc)
  * via orderBy+limit — Spark's TakeOrderedAndProject, a distributed
  * partial top-k, never a global sort of the corpus. Ranks then number a
  * bounded m-row frame (the one window here runs on <= m rows), the
  * union carries <= signals x m rows, and the fuse is one combinable
  * aggregate. Documents outside every top-m list get no row — standard
  * RRF-over-retrieval-lists semantics, and the property that makes the
  * operator corpus-size-independent past the per-signal top-k cut.
  *
  * Input: one frame per signal carrying (idCol, scoreCol BIGINT,
  * higher = better). Output: (idCol, rrf_fp BIGINT, n_signals BIGINT,
  * best_rank INT, rank INT) — rank by (rrf_fp desc, id asc).
  */
object Fusion {

  def reciprocalRankFusion(signals: Seq[DataFrame], m: Int = 1000,
                           kRrf: Long = 60L,
                           idCol: String = "doc_id",
                           scoreCol: String = "score_fp",
                           strictDistinct: Boolean = false): DataFrame = {
    require(signals.nonEmpty, "reciprocalRankFusion needs at least one signal")
    require(m > 0, "m (per-signal list depth) must be positive")
    require(kRrf >= 0, "kRrf must be non-negative")
    val perList = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    val contribs = signals.map { s0 =>
      // A signal may carry duplicate ids (e.g. a raw posting list). Two
      // dedup placements, one semantic trade:
      //  - default (strictDistinct=false): keep each id's best row WITHIN
      //    the m-row cut. Shuffle-free (TakeOrdered, then a window over
      //    <= m rows), but a signal with in-cut duplicates contributes
      //    FEWER than m distinct docs.
      //  - strictDistinct=true: per-id best row BEFORE the cut — the
      //    conventional ranked-list-of-distinct-documents reading, always
      //    m distinct docs when the signal has them. Costs one combinable
      //    exchange per signal (groupBy max — map-side combine collapses
      //    duplicates before the shuffle, the frame is two narrow cols).
      // Either way one id can never contribute twice to a signal's sum or
      // inflate n_signals past the signal count, and unique-id signals
      // are bit-identical under both.
      val s =
        if (strictDistinct)
          s0.groupBy(col(idCol)).agg(max(col(scoreCol)).as(scoreCol))
        else s0.select(col(idCol), col(scoreCol))
      val cut = s.orderBy(col(scoreCol).desc, col(idCol).asc).limit(m)
      val dedup =
        if (strictDistinct) cut
        else cut.withColumn("__dup", row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col(scoreCol).desc)))
          .filter(col("__dup") === 1).drop("__dup")
      dedup.withColumn("rank", row_number().over(perList))
        .select(col(idCol), col("rank"),
          expr(s"CAST(1000000000L div ($kRrf + rank) AS BIGINT)").as("__c"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf_fp"),
        count(lit(1)).as("n_signals"),
        min(col("rank")).as("best_rank"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_fp").desc, col(idCol).asc)))
  }
}
