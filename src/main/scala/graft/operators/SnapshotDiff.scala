package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit between two versions of a dataset
  * (yesterday's crawl vs today's, table version N vs N+1): which documents
  * were added, removed, or changed, and which survived untouched? The
  * companion to [[graft.sources.VersionedTable]]'s time travel: retention
  * tells you WHAT you can compare, this tells you what actually moved —
  * the first question after any pipeline change ships.
  *
  * Change detection is by content hash (md5 of the text bytes — the same
  * fingerprint [[Dedup.exact]] groups on), so a byte-identical rewrite is
  * `unchanged` and any edit is `changed`. One FULL OUTER join on the id:
  * both sides contribute (id, hash) rows only — texts never shuffle.
  * Output: (idCol, status in {added, removed, changed, unchanged},
  * old_hash, new_hash) with NULL hashes on the absent side.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def hashed(df: DataFrame, h: String) =
      df.select(col(idCol), md5(col(textCol).cast("binary")).as(h))
    hashed(oldSnap, "old_hash")
      .join(hashed(newSnap, "new_hash"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** The one-row rollup a release gate reads: counts per status (absent
    * statuses reported as 0 — the schema is stable across diffs).
    */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = diff(oldSnap, newSnap, idCol, textCol)
    // coalesce: both snapshots empty -> zero diff rows -> sum is SQL NULL,
    // and the release gate should read zeros, not NPE
    d.agg(
      coalesce(sum(when(col("status") === "added", 1L).otherwise(0L)), lit(0L)).as("added"),
      coalesce(sum(when(col("status") === "removed", 1L).otherwise(0L)), lit(0L)).as("removed"),
      coalesce(sum(when(col("status") === "changed", 1L).otherwise(0L)), lit(0L)).as("changed"),
      coalesce(sum(when(col("status") === "unchanged", 1L).otherwise(0L)), lit(0L)).as("unchanged"))
  }
}
