package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the "know your data" report a training-data pipeline
  * runs before (and after) every curation stage: per-column row/null/distinct
  * counts, min/max, the modal value, and mean stringified length.
  *
  * Reference anchor: the reference engine exposes no profiling surface; this
  * is a beyond-reference component (SURVEY §7.4 scale extensions) — the
  * audit table data-quality dashboards and schema-drift alerts read from.
  *
  * Output, one row per profiled column (all driver-stable scalars):
  * {{{
  *   col_name     STRING  profiled column
  *   n_rows       BIGINT  total rows (same for every column)
  *   n_null       BIGINT  NULL count
  *   n_distinct   BIGINT  exact distinct non-NULL values
  *   min_str      STRING  min in NATIVE type order, then cast to string
  *   max_str      STRING  max in NATIVE type order, then cast to string
  *   mode_str     STRING  most frequent non-NULL value (ties: smallest
  *                        string) — NULL when the column is all-NULL
  *   mode_count   BIGINT  the mode's occurrence count
  *   avg_len_ppm  BIGINT  floor(1e6 * mean stringified length) over
  *                        non-NULL values — integer, no float compare
  * }}}
  *
  * Scale shape (the 100 TB read): two jobs, each one pass.
  *  1. min/max/counts collapse in a SINGLE combinable aggregate — one
  *     reduce, no shuffle of values, whatever the corpus size.
  *  2. distinct/mode/length ride ONE posting shuffle keyed by
  *     (column, value): partial map-side aggregation collapses repeated
  *     values before the exchange, then per-column stats are a second
  *     combinable aggregate over the distinct-value table. This is the
  *     honest EXACT-distinct cost (the value domain crosses the wire
  *     once); for corpora where that shuffle is the budget, the sketch
  *     path is [[Sketches.approxDistinct]] / [[Sketches.sketchVector]]
  *     (registers-only exchange), and `columns` lets the caller exclude
  *     wide text columns from the exact pass.
  *
  * Every min/max is taken in the column's native type (numeric order for
  * numerics) and stringified only for the uniform report schema; the modal
  * tie-break rides the `min(struct(-count, value))` struct ordering, so the
  * whole report is deterministic, and for integer/string/date columns the
  * DuckDB twin reproduces it bit-for-bit. CAVEAT for float/double columns:
  * n_distinct/mode/avg_len count distinct STRING REPRESENTATIONS (the
  * posting casts values to string for the uniform shuffle key), so 0.0 and
  * -0.0 count as two, and the rendering of large doubles is
  * engine-specific — profile floats for the min/max/null counts, not for
  * exact distinct parity.
  */
object Profile {

  def tableProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "tableProfile needs at least one column")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")

    // pass 1: one combinable aggregate row -> exploded to per-column rows
    val aggs: Seq[Column] = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = one.select(col("__n"),
      explode(array(columns.map(c => struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("__notnull"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"))): _*)).as("s"))
      .select(col("__n").as("n_rows"), col("s.*"))

    // pass 2: the (column, value) posting -> distinct-value table ->
    // per-column distinct/mode/length stats
    val pairs = df.select(explode(array(columns.map(c => struct(
        lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.*"))
      .filter(col("v").isNotNull)
    val valueCounts = pairs.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("c"))
    val post = valueCounts.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"),
        min(struct((-col("c")).as("nc"), col("v").as("vv"))).as("__m"),
        sum(col("c") * length(col("v"))).as("__lensum"),
        sum(col("c")).as("__cnt"))
      .select(col("col_name"), col("n_distinct"),
        col("__m.vv").as("mode_str"),
        (-col("__m.nc")).as("mode_count"),
        ExactPpm.ppm(col("__lensum"), col("__cnt")).as("avg_len_ppm"))

    perCol.join(post, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("__notnull")).as("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_str"), col("max_str"),
        col("mode_str"), col("mode_count"), col("avg_len_ppm"))
  }

  /** EXACT per-column heavy hitters with a CMS pre-filter — the 100 TB
    * path for the modal-value question [[tableProfile]] answers exactly:
    * `tableProfile`'s (column, value) posting shuffle is per-DISTINCT-value
    * exact, which for a high-cardinality text column is corpus-sized.
    * This variant keeps the ANSWER exact while bounding what crosses the
    * exchange: values whose share is below `minSharePpm` never shuffle.
    *
    * Mechanics (all deterministic — the sketch is a pure performance
    * filter, invisible in the result):
    *  1. one combinable pass builds the per-column count-min sketch
    *     ([[FrequencySketch]] — depth x width cells per column, corpus-
    *     size-independent) and the per-column non-null totals;
    *  2. a second scan estimates each row's value count map-side (the
    *     bounded sketch broadcasts; `Depth` broadcast joins, no exchange)
    *     and drops rows whose UPPER-BOUND estimate is already below the
    *     threshold — CMS never underestimates, so no heavy value is lost;
    *  3. survivors (only plausibly-heavy values) take the exact
    *     groupBy(column, value) count, and a final exact filter removes
    *     the CMS false positives.
    * Result: exactly the values with `count * 1e6 >= minSharePpm * n`
    * (per column, n = non-null rows), their exact counts, exact-ppm
    * shares, and a deterministic per-column rank — bit-identical to the
    * all-exact oracle at any partitioning. Cost: two corpus scans + a
    * shuffle bounded by `<= 1e6 / minSharePpm` values per column, vs
    * `tableProfile`'s one scan + corpus-sized posting shuffle.
    *
    * Output: (col_name, value STRING, cnt, share_ppm, rank INT).
    */
  def heavyHitters(df: DataFrame, columns: Seq[String],
                   minSharePpm: Long = 10000L,
                   storage: org.apache.spark.storage.StorageLevel =
                     org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(columns.nonEmpty, "heavyHitters needs at least one column")
    require(minSharePpm > 0 && minSharePpm <= 1000000L,
      "minSharePpm must be in (0, 1e6]")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val pairs = df.select(explode(array(columns.map(c => struct(
        lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.*"))
      .filter(col("v").isNotNull)
    // per-column non-null totals: |columns| rows, broadcast into both
    // threshold checks
    val totals = pairs.groupBy(col("col_name")).agg(count(lit(1)).as("__n"))
    // the persist bounds the sketch to ONE corpus pass: each of the Depth
    // broadcast joins below filters its own row out of the cell table
    val sk = Caching.maybePersist(
      FrequencySketch.merge(
        FrequencySketch.sketch(pairs, "v", Seq("col_name")), Seq("col_name")),
      storage)
    // map-side per-row estimate: min over the Depth probed cells (absent
    // cell = 0); decimal cross-multiply keeps the threshold exact at any
    // corpus size (cnt * 1e6 would pass 2^63 around 9e12 rows)
    val hashed = pairs.withColumn("__h",
      graft.functions.TextFunctions.polyHash(col("v")))
    val estimated = (0 until FrequencySketch.Depth).foldLeft(
      hashed.withColumn("__est", lit(Long.MaxValue))) { case (acc, i) =>
        val cells = sk.filter(col("r") === i)
          .select(col("col_name"), col("idx").as(s"__idx$i"), col("cnt").as(s"__c$i"))
        acc.withColumn(s"__idx$i", FrequencySketch.cellIdx(col("__h"), i))
          .join(broadcast(cells), Seq("col_name", s"__idx$i"), "left")
          .withColumn("__est", least(col("__est"), coalesce(col(s"__c$i"), lit(0L))))
      }
    def heavy(cnt: org.apache.spark.sql.Column) =
      cnt.cast("decimal(38,0)") * lit(1000000L) >=
        lit(minSharePpm).cast("decimal(38,0)") * col("__n")
    val survivors = estimated
      .join(broadcast(totals), "col_name")
      .filter(heavy(col("__est")))
      .select(col("col_name"), col("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("cnt").desc, col("value").asc)
    survivors.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), "col_name")
      .filter(heavy(col("cnt"))) // drop the CMS false positives exactly
      .select(col("col_name"), col("v").as("value"), col("cnt"),
        ExactPpm.ppm(col("cnt"), col("__n")).as("share_ppm"))
      .withColumn("rank", row_number().over(w))
  }

  /** K-anonymity audit over quasi-identifier columns — the
    * re-identification risk report a training-data release runs before
    * publishing (Sweeney 2002): every combination of quasi-identifiers
    * (language, source, length bucket, region, ...) forms an equivalence
    * class; a class smaller than `k` means its members are
    * distinguishable enough to re-identify or to memorize verbatim.
    * Output: one row per class — the quasi columns, `class_size`, and
    * `at_risk` (size < k). NULL quasi values form their own class (they
    * are exactly as distinguishing as any other shared value).
    *
    * Scale shape: ONE combinable aggregate keyed by the quasi tuple —
    * map-side partials collapse repeated combinations before the
    * exchange, so the shuffle is bounded by the distinct quasi domain,
    * not the corpus. Downstream: join `at_risk` classes back to drop or
    * generalize their members.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long = 5L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    val missing = quasiCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", (col("class_size") < k).cast("int"))
  }

  /** L-diversity companion to [[kAnonymity]] (Machanavajjhala et al.
    * 2007): a quasi-class can be k-LARGE yet 1-DIVERSE — every member
    * sharing one sensitive value, so "you are one of 50" still leaks the
    * value — which is exactly the disclosure k-anonymity misses. Per
    * quasi-class: `class_size`, `l_distinct` (distinct sensitive values,
    * NULL forming its own value — it is exactly as disclosing as any
    * other shared value), `modal_share_ppm` (the most common sensitive
    * value's share — 1e6 means homogeneous), and `at_risk`
    * (l_distinct < l). Downstream: join at-risk classes back to suppress
    * or generalize, like the k-anonymity report.
    *
    * Scale shape: TWO combinable aggregates — by (quasi, sensitive) then
    * by quasi — so the shuffles are bounded by the distinct
    * (quasi x sensitive) domain, never the corpus.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 l: Long = 2L): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi-identifier column")
    require(l >= 1, "l must be positive")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier " +
        "(every class would trivially be 1-diverse)")
    lDiversityFromCounts(pairCounts(df, quasiCols, sensitiveCol), quasiCols, l)
  }

  /** The shared (quasi x sensitive) count table — the ONE corpus-sized
    * aggregate every sensitive-aware audit derives from. */
  private def pairCounts(df: DataFrame, quasiCols: Seq[String],
                         sensitiveCol: String): DataFrame =
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))

  /** [[kAnonymity]] read off a pre-aggregated (quasi x sensitive) count
    * table instead of the corpus. */
  private def kAnonymityFromCounts(pv: DataFrame, quasiCols: Seq[String],
                                   k: Long): DataFrame =
    pv.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("class_size"))
      .withColumn("at_risk", (col("class_size") < k).cast("int"))

  /** [[lDiversity]] read off the pre-aggregated count table. */
  private def lDiversityFromCounts(pv: DataFrame, quasiCols: Seq[String],
                                   l: Long): DataFrame =
    pv.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("class_size"),
        count(lit(1)).as("l_distinct"),
        max(col("__c")).as("__modal"))
      .select(quasiCols.map(col) ++ Seq(col("class_size"), col("l_distinct"),
        ExactPpm.ppm(col("__modal"), col("class_size")).as("modal_share_ppm"),
        (col("l_distinct") < l).cast("int").as("at_risk")): _*)

  /** T-closeness companion to [[kAnonymity]]/[[lDiversity]] (Li et al.
    * 2007): a class can be k-large AND l-diverse yet still leak — its
    * sensitive-value DISTRIBUTION can sit far from the table's, so
    * membership alone shifts an attacker's posterior. Per quasi-class:
    * the total-variation distance between the class's sensitive
    * distribution and the global one, in exact floor ppm —
    * `tvd = (sum_present |p_c - p_g| + (S_g - sum_present p_g)) div 2`
    * where the second term covers global values ABSENT from the class —
    * plus `at_risk` (tvd > t). 0 = identical distribution; ~1e6 = the
    * class concentrates on values rare globally.
    *
    * Scale shape: one combinable (quasi x sensitive) aggregate, then
    * window sums OVER that domain-bounded frame (never the corpus — the
    * unpartitioned window sees one row per distinct (quasi, sensitive)
    * pair), one distinct-values 1-row aggregate broadcast back. Windows
    * instead of joins keep NULL quasi/sensitive values grouped exactly
    * like [[kAnonymity]] (an equi-join would silently drop them).
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 tPpm: Long = 500000L): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi-identifier column")
    require(tPpm >= 0 && tPpm <= 1000000L, "tPpm must be in [0, 1e6]")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier " +
        "(every class distribution would trivially be a point mass)")
    tClosenessFromCounts(pairCounts(df, quasiCols, sensitiveCol),
      quasiCols, sensitiveCol, tPpm)
  }

  /** [[tCloseness]] read off the pre-aggregated count table: the windows
    * run over the domain-bounded pv frame exactly as before. */
  private def tClosenessFromCounts(pv: DataFrame, quasiCols: Seq[String],
                                   sensitiveCol: String, tPpm: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withShares = pv
      .withColumn("class_size",
        sum(col("__c")).over(Window.partitionBy(quasiCols.map(col): _*)))
      .withColumn("__g",
        sum(col("__c")).over(Window.partitionBy(col(sensitiveCol))))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy()))
      .withColumn("__pc", ExactPpm.ppm(col("__c"), col("class_size")))
      .withColumn("__pg", ExactPpm.ppm(col("__g"), col("__n")))
    // S_g: the global floor-ppm shares summed once over DISTINCT values
    val sg = withShares.select(col(sensitiveCol), col("__pg")).distinct()
      .agg(coalesce(sum(col("__pg")), lit(0L)).as("__sg"))
    withShares
      .groupBy((quasiCols.map(col) :+ col("class_size")): _*)
      .agg(sum(abs(col("__pc") - col("__pg"))).as("__present"),
        sum(col("__pg")).as("__pgpresent"))
      .crossJoin(broadcast(sg))
      .select(quasiCols.map(col) ++ Seq(col("class_size"),
        expr("(__present + __sg - __pgpresent) div 2").as("tvd_ppm"),
        (expr("(__present + __sg - __pgpresent) div 2") > tPpm)
          .cast("int").as("at_risk")): _*)
  }

  /** Privacy ENFORCEMENT — closes the audit→apply loop the three audit
    * reports ([[kAnonymity]], [[lDiversity]], [[tCloseness]]) leave open
    * (contamination has its apply step in `decontaminate`; this is the
    * privacy twin): rows whose quasi-identifier class FAILS any enabled
    * audit are suppressed. Audits enable by their knobs — k-anonymity
    * always; l-diversity when `sensitiveCol` is set; t-closeness when
    * `tPpm` is ALSO set (a `tPpm` without a sensitive column is the same
    * loud error as the audit CLI).
    *
    * `generalize = false` (default) DROPS the at-risk rows — the q64
    * decontaminate anti-join shape. `generalize = true` keeps them but
    * NULLs every quasi column (generalization to the top of the
    * hierarchy): the released rows then merge into the all-NULL class,
    * trading precision for retention. Either way the released table has
    * the input's exact schema.
    *
    * NULL quasi values form their own class in every audit, so the join
    * back is NULL-SAFE (`<=>`) — a plain equi-join would silently leak
    * every at-risk NULL-quasi row into the release.
    *
    * Scale shape: ONE corpus scan total for every enabled audit — the
    * shared (quasi x sensitive) count aggregate is persisted and all
    * three audits read it (they are pure functions of those counts; the
    * naive composition re-scanned the corpus per audit) — then the
    * at-risk subset, bounded by the quasi domain and smaller still,
    * joins back as ONE broadcast against the corpus: two corpus scans
    * end to end, never a corpus-keyed shuffle.
    */
  def suppressAtRisk(df: DataFrame, quasiCols: Seq[String], k: Long = 5L,
                     sensitiveCol: Option[String] = None, l: Long = 2L,
                     tPpm: Option[Long] = None,
                     generalize: Boolean = false): DataFrame = {
    require(sensitiveCol.isDefined || tPpm.isEmpty,
      "suppressAtRisk: tPpm needs sensitiveCol (t-closeness measures the " +
        "sensitive distribution's distance from the global one)")
    // the shared-count fast path below bypasses the public audits, so it
    // must re-assert EVERY contract they enforce — a duplicated or
    // missing column, k/l/t out of range would otherwise silently
    // produce an audit that flags everything or nothing
    require(quasiCols.nonEmpty, "suppressAtRisk needs at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    require(l >= 1, "l must be positive")
    tPpm.foreach(t => require(t >= 0 && t <= 1000000L, "tPpm must be in [0, 1e6]"))
    val needed = quasiCols ++ sensitiveCol.toSeq
    val missing = needed.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    sensitiveCol.foreach(sc => require(!quasiCols.contains(sc),
      s"sensitive column $sc cannot also be a quasi-identifier"))
    def riskClasses(audit: DataFrame): DataFrame =
      audit.filter(col("at_risk") === 1).select(quasiCols.map(col): _*)
    val (audits, pvOwned) = sensitiveCol match {
      case None => (Seq(riskClasses(kAnonymity(df, quasiCols, k))), None)
      case Some(sc) =>
        // persistIfNew, not maybePersist: a logically-identical pairCounts
        // plan may already sit in the cache (an earlier audit in the same
        // session, or the user's own persist) — the unpersist below must
        // then stay with the owner, not evict a shared entry
        val (pv, pvIsOurs) = Caching.persistIfNew(pairCounts(df, quasiCols, sc),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the cache EAGERLY: the audit subtrees evaluate
        // concurrently, and concurrent stages racing on an unbuilt cache
        // each recompute it from the corpus — the one-count job here pins
        // the corpus scan count at one
        pv.count()
        (Seq(riskClasses(kAnonymityFromCounts(pv, quasiCols, k)),
          riskClasses(lDiversityFromCounts(pv, quasiCols, l))) ++
          tPpm.map(t => riskClasses(tClosenessFromCounts(pv, quasiCols, sc, t))),
          if (pvIsOurs) Some(pv) else None)
    }
    // persist + materialize the at-risk class list (bounded by the quasi
    // domain — tiny) BEFORE the release join: the optimizer pushes a
    // left-anti join through a Union left side into every branch
    // (PushdownLeftSemiAntiJoin), and an unmaterialized broadcast side
    // would rebuild the whole audit subtree once per branch — observed as
    // 10 copies of the window/aggregate machinery over a 10-replica
    // corpus, with no exchange reuse. Cached, each pushed-down join
    // broadcasts a cache read and the audits run exactly once.
    val risky = Caching.maybePersist(
      audits.reduce(_ unionByName _).distinct()
        .select(quasiCols.map(c => col(c).as(s"__r_$c")): _*),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    risky.count()
    // pv is dead once risky is materialized — release it so repeated
    // calls in a long-lived session don't accumulate cached aggregates
    pvOwned.foreach(_.unpersist(false))
    val hit = quasiCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    if (!generalize)
      df.join(broadcast(risky), hit, "left_anti")
    else {
      val nulled = df.columns.map { c =>
        if (quasiCols.contains(c))
          when(col("__rk").isNotNull, lit(null).cast(df.schema(c).dataType))
            .otherwise(col(c)).as(c)
        else col(c)
      }
      df.join(broadcast(risky.withColumn("__rk", lit(1))), hit, "left")
        .select(nulled.toSeq: _*)
    }
  }

  /** Drift report between two [[tableProfile]] snapshots — the
    * schema/data-quality alert a pipeline runs after every ingest or
    * curation stage: per column, the null-rate and distinct-count moves,
    * whether min/max/mode shifted, and the mean-length delta; columns
    * only one side knows are flagged `added`/`removed` (schema drift).
    * All integer ppm / flag / string outputs — engine-portable like the
    * profiles themselves. Scale: a full-outer join on a
    * columns-per-table-sized frame — driver-trivial at any corpus size
    * (the cost lives in producing the profiles).
    */
  def diffProfiles(before: DataFrame, after: DataFrame): DataFrame = {
    def side(df: DataFrame, sfx: String) = df.select(col("col_name") +:
      df.columns.filterNot(_ == "col_name").map(c => col(c).as(s"${c}_$sfx")).toSeq: _*)
    val ppm = (num: Column, den: Column) => ExactPpm.ppm(num, den)
    val j = side(before, "b").join(side(after, "a"), Seq("col_name"), "full_outer")
    val common = col("n_rows_b").isNotNull && col("n_rows_a").isNotNull
    def changed(c: String) =
      when(common, (!(col(s"${c}_b") <=> col(s"${c}_a"))).cast("int"))
    j.select(col("col_name"),
      when(common, lit("common"))
        .when(col("n_rows_a").isNotNull, lit("added"))
        .otherwise(lit("removed")).as("status"),
      ppm(col("n_null_b"), col("n_rows_b")).as("null_ppm_before"),
      ppm(col("n_null_a"), col("n_rows_a")).as("null_ppm_after"),
      (ppm(col("n_null_a"), col("n_rows_a")) -
        ppm(col("n_null_b"), col("n_rows_b"))).as("null_ppm_delta"),
      col("n_distinct_b").as("n_distinct_before"),
      col("n_distinct_a").as("n_distinct_after"),
      ppm(col("n_distinct_a"), col("n_distinct_b")).as("distinct_ratio_ppm"),
      changed("min_str").as("min_changed"),
      changed("max_str").as("max_changed"),
      changed("mode_str").as("mode_changed"),
      (col("avg_len_ppm_a") - col("avg_len_ppm_b")).as("avg_len_delta_ppm"))
  }
}
