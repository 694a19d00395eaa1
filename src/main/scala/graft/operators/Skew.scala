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

  /** Skew-immune grouped top-k, two-phase: the plain
    * `row_number() OVER (PARTITION BY group ORDER BY ...)` formulation
    * (q66) serializes each group's ENTIRE row set through one task — fine
    * for balanced groups, a straggler when one group owns the corpus.
    * Here every row first draws a deterministic position salt, phase one
    * takes a LOCAL top-k within each (group, salt) slice — bounding any
    * task's sort at the hot group's rows / numSalts — and phase two ranks
    * only the surviving <= numSalts x k candidates per group. A group's
    * true top-k always survives phase one (each candidate is top-k of
    * whatever slice it landed in), so the result is row-identical to the
    * single-window form for any numSalts (SkewSpec pins it; q69 rides it
    * against the single-window oracle).
    *
    * Ordering must be total for determinism — `orderCols` should end in a
    * unique tiebreak column, exactly like the single-window form.
    */
  def groupedTopK(df: DataFrame, groupCol: String, orderCols: Seq[Column],
                  k: Int, numSalts: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(numSalts > 0, "numSalts must be positive")
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__tk_salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    val local = Window.partitionBy(col(groupCol), col("__tk_salt"))
      .orderBy(orderCols: _*)
    val global = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    salted
      .withColumn("__tk_local", row_number().over(local))
      .filter(col("__tk_local") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .drop("__tk_salt", "__tk_local")
  }

  /** Salted inner equi-join for a skewed LEFT side: left rows get a salt
    * in [0, numSalts) from their partition-local row position
    * (`monotonically_increasing_id`), the right side is replicated once
    * per salt, and the join key becomes (key, salt) — one hot key's rows
    * now spread across numSalts partitions instead of one.
    *
    * The salt source matters: position-based salting spreads even
    * BYTE-IDENTICAL duplicate rows of a hot key (raw logs are full of
    * them), where a whole-row hash would send every duplicate to the same
    * salt and deliver zero relief; it also accepts any column types (a
    * row hash rejects maps). The RESULT is independent of salt values —
    * each left row carries exactly one salt and each right row exists once
    * per salt, so every (l, r) key match pairs exactly once regardless of
    * which salt a row drew (SkewSpec asserts row-identity with the plain
    * join; q41 rides it against a plain-join oracle).
    *
    * Cost: the right side shuffles numSalts times its size — use when the
    * right side is too big to broadcast and AQE's runtime skew split can't
    * apply (e.g. the join feeds a co-partitioned aggregation). Null join
    * keys never match, as in the plain inner equi-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    // the internal column must not clobber (then drop) a real user column
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename it in the inputs")
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
