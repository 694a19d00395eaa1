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

  /** Rebalance a corpus toward a per-category quota (the "data mixing"
    * step: cap the dominant language/source so the training mix isn't
    * whatever the crawl happened to fetch). Categories at or under `quota`
    * rows pass through untouched; an over-quota category is downsampled to
    * ~quota rows by CONTENT-HASH thresholding — a row is kept iff its
    * content bucket falls under the category's keep-rate, so membership
    * stays a pure row-local function of the text (same guarantees as
    * [[deterministicSample]]: stable across reruns, re-sharding, engines).
    *
    * The keep-rate is exact integer arithmetic — category counts (one tiny
    * map-side-combinable aggregate, one row per category) are joined back
    * by broadcast and the filter is `bucket * cnt < quota * buckets`, i.e.
    * bucket < buckets*quota/cnt without any float division — so the DuckDB
    * oracle replays the cut bit-for-bit. The kept count is approximate
    * (hash buckets are ~uniform, not exact-N): expected kept ≈ quota, not
    * == quota — an exact-N cut would need a per-category rank (a window
    * over the hot category, the very skew this operator exists to avoid).
    */
  def rebalanceToQuota(df: DataFrame, categoryCol: String, textCol: String,
                       quota: Long, buckets: Int = 10000): DataFrame =
    rebalanceToQuotaOnBucket(
      df.withColumn("__rebalance_bucket", contentBucket(col(textCol), buckets)),
      categoryCol, "__rebalance_bucket", quota, buckets)
      .drop("__rebalance_bucket")

  /** [[rebalanceToQuota]] over a PRECOMPUTED content-bucket column —
    * the incremental-pipeline path, where the text was hashed once at
    * ingest and only metadata flows through later runs. `bucketCol` must
    * hold `contentBucket(text, buckets)` values for the SAME `buckets`,
    * or the keep-rate arithmetic silently skews.
    */
  def rebalanceToQuotaOnBucket(df: DataFrame, categoryCol: String, bucketCol: String,
                               quota: Long, buckets: Int = 10000): DataFrame = {
    require(quota >= 0, "quota must be non-negative")
    require(buckets > 0, "buckets must be positive")
    require(quota <= Long.MaxValue / buckets,
      s"quota * buckets overflows a long: quota=$quota buckets=$buckets")
    val counts = df.groupBy(col(categoryCol))
      .agg(count(lit(1)).as("category_n"))
      .withColumnRenamed(categoryCol, "__rebalance_cat")
    // null-safe join: a NULL category (e.g. undetected language) is a real
    // category with a real count — a plain equi-join would silently drop
    // every such row instead of capping them
    df.join(broadcast(counts), col(categoryCol) <=> col("__rebalance_cat"))
      .drop("__rebalance_cat")
      .filter(
        col("category_n") <= quota ||
          col(bucketCol).cast("long") * col("category_n") < lit(quota * buckets))
  }

  /** Temperature-based source mixing (the "unigram^alpha" reweighting LLM
    * data recipes use, here at the standard alpha = 0.5): category c keeps
    * rows at rate `min(1, target * sqrt(n_c) / (S * n_c))` where
    * `S = sum_c sqrt(n_c)` — i.e. the kept corpus approximates `target`
    * rows distributed proportionally to sqrt(category size), flattening
    * the head without discarding the tail the way a hard quota does.
    *
    * Same scale shape as [[rebalanceToQuota]]: category counts are one
    * tiny combinable aggregate broadcast back; membership is row-local
    * content-hash thresholding (stable across reruns/engines). The only
    * float math is the rate itself, computed once per CATEGORY in a
    * pinned order the oracle replays exactly: sqrt of an exact integer is
    * correctly rounded IEEE, S folds over categories in category order
    * (NULL first), and the comparison threshold is `floor(rate * 1e6)`
    * against a ppm content bucket — so the cut is bit-stable even though
    * a temperature weight is irrational.
    */
  def temperatureMix(df: DataFrame, categoryCol: String, textCol: String,
                     targetTotal: Long): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    val counts = df.groupBy(col(categoryCol))
      .agg(count(lit(1)).as("category_n"))
      .withColumnRenamed(categoryCol, "__mix_cat")
    // ONE ordered fold over the per-category sqrt weights: sort_array on
    // (category, weight) structs orders by category with NULL first —
    // the same order the oracle's `list(... ORDER BY c NULLS FIRST)` uses
    val sumW = counts
      .agg(aggregate(
        sort_array(collect_list(struct(col("__mix_cat"),
          sqrt(col("category_n").cast("double")).as("w")))),
        lit(0.0), (acc, s) => acc + s.getField("w")).as("__sum_w"))
    val rates = counts.crossJoin(broadcast(sumW))
      .withColumn("mix_rate_ppm",
        floor(least(lit(1.0),
          lit(targetTotal.toDouble) * sqrt(col("category_n").cast("double"))
            / (col("__sum_w") * col("category_n").cast("double")))
          * lit(1000000.0)).cast("long"))
      .select(col("__mix_cat"), col("category_n"), col("mix_rate_ppm"))
    // null-safe category join, same rule as rebalanceToQuota
    df.join(broadcast(rates), col(categoryCol) <=> col("__mix_cat"))
      .drop("__mix_cat")
      .filter(contentBucket(col(textCol), 1000000) < col("mix_rate_ppm"))
  }

  /** Epoch-weighted corpus mixing with UPSAMPLING — the data-mixing step
    * [[temperatureMix]] and [[rebalanceToQuota]] can't express: those only
    * drop rows, but LLM data recipes repeat high-quality sources at
    * fractional epoch counts (e.g. wiki x 2.5, web x 0.7). Each row is
    * replicated `floor(w)` times for its category's weight `w`, plus one
    * more copy iff its content bucket falls under the fractional
    * remainder — so a category's expected output is exactly `w * n_c`
    * rows, the decision is a pure row-local function of the text (stable
    * across reruns, re-sharding, engines), and weights below 1 degrade to
    * deterministic downsampling.
    *
    * Output: the input row replicated, plus (epoch in [1, n_copies],
    * n_copies). Weights resolve DRIVER-side to exact integer literals
    * (whole copies + fractional ppm) — no float crosses the executors, so
    * an oracle can replay the mix bit-for-bit.
    *
    * Scale shape: one row-local explode of an at-most-ceil(w)-element
    * integer sequence — zero shuffle, zero aggregation; output volume is
    * the product the caller asked for, not an intermediate.
    */
  /** An epoch weight's whole-copy count — resolved DRIVER-side, exposed so
    * oracle generators embed the identical literal (never re-derived in
    * executor or oracle float math).
    */
  private[graft] def epochWhole(w: Double): Long = math.floor(w).toLong

  /** An epoch weight's fractional remainder as parts-per-million, floor
    * semantics — same driver-side-literal contract as [[epochWhole]].
    */
  private[graft] def epochFracPpm(w: Double): Long =
    math.floor((w - math.floor(w)) * 1e6).toLong

  def epochMix(df: DataFrame, categoryCol: String, textCol: String,
               weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "epoch weights must be non-negative")
    require(weights.values.forall(_ <= 1000) && defaultWeight <= 1000,
      "epoch weights above 1000 are almost certainly a bug")
    // category -> (whole, ppm) CASE chains from the driver-side literals;
    // sorted for a deterministic plan (Map order is not)
    val cases = weights.toSeq.sortBy(_._1)
    def caseChain(of: Double => Long, dflt: Long): Column =
      cases.foldRight(lit(dflt)) { case ((cat, w), rest) =>
        when(col(categoryCol) === lit(cat), lit(of(w))).otherwise(rest)
      }
    val nCopies = caseChain(epochWhole, epochWhole(defaultWeight)) +
      when(contentBucket(col(textCol), 1000000) <
        caseChain(epochFracPpm, epochFracPpm(defaultWeight)), 1L).otherwise(0L)
    df.withColumn("n_copies", nCopies)
      // sequence(1, 0) would count DOWN ([1, 0]); guard the empty case
      .withColumn("epoch",
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))))
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

  /** SITE-coherent split: every page of the same canonical HOST lands in
    * the same train/val/test split. Near-duplicates concentrate within
    * sites (templates, re-crawls, mirrored paths), so a per-document
    * content split leaks them across train and val — the host key closes
    * the site-level leak the way [[clusterCoherentSplit]] closes the
    * near-dup-cluster one. The host comes off
    * [[graft.functions.TextFunctions.canonicalizeUrl]], so scheme case,
    * ports, params, and fragments can never split a site; a schemeless
    * input contributes host "" (one shared bucket), and a NULL url
    * raises per-row (it has no site identity — the urlDedup rule).
    * Output: the input plus (host, split). Row-local end to end.
    */
  def hostCoherentSplit(docs: DataFrame, urlCol: String = "url",
                        trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val host = regexp_extract(
      when(col(urlCol).isNull,
        raise_error(lit("hostCoherentSplit: NULL url has no site identity")))
        .otherwise(graft.functions.TextFunctions.canonicalizeUrl(col(urlCol))),
      "^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    assignSplit(docs.withColumn("host", host), "host", trainPct, valPct)
  }

  /** Contingency audit of two categorical columns: observed count per
    * (a, b) cell vs the count independence would predict
    * (`n_a * n_b / N`), plus the observed/expected ratio — the balance
    * check a team runs after splitting (is `val` language-skewed?) or
    * after rebalancing (did the quota distort sources?). A ratio far from
    * 1 flags the cell; the chi-square statistic is one aggregate away,
    * left to the caller so the per-cell diagnostics stay visible.
    *
    * Scale shape: ONE combinable aggregate collapses the corpus to
    * ≤ |a|×|b| cells; the marginal windows then run over that bounded
    * frame (the sanctioned tiny-frame window, like packing's bucket
    * offsets — never over corpus rows). Integer products sit far below
    * 2^53, and each output is one pinned double division both engines
    * replay.
    */
  def contingencyAudit(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n_obs"))
    obs
      .withColumn("n_a", sum(col("n_obs")).over(Window.partitionBy(col(aCol))))
      .withColumn("n_b", sum(col("n_obs")).over(Window.partitionBy(col(bCol))))
      .withColumn("n_total", sum(col("n_obs")).over(Window.partitionBy()))
      .withColumn("expected",
        round((col("n_a") * col("n_b")).cast("double") / col("n_total"), 6))
      .withColumn("obs_over_exp",
        round((col("n_obs") * col("n_total")).cast("double") / (col("n_a") * col("n_b")), 6))
  }

  /** EXACT-N stratified sample: precisely `n` rows per category (every
    * category with >= n rows yields exactly n; smaller ones pass whole) —
    * the guarantee [[rebalanceToQuota]] explicitly trades away (its
    * hash-threshold cut is ~quota in expectation). Exact-N needs a
    * per-category rank; ranking a hot category in one task is the skew
    * this module avoids everywhere, so the rank rides
    * [[Skew.groupedTopK]]'s salted two-phase form — no task ever sorts
    * more than hot-category/numSalts rows. Order is the content hash
    * (ties by id), so the sample is pseudo-random yet deterministic,
    * stable across reruns and engines. Output adds `rank` in [1, n].
    */
  def exactNSample(df: DataFrame, categoryCol: String, textCol: String,
                   n: Int, idCol: String = "doc_id"): DataFrame =
    Skew.groupedTopK(df, categoryCol,
      Seq(polyHash(col(textCol)).asc, col(idCol).asc), k = n)

  /** CLUSTER-coherent split — [[assignSplit]]'s documented caveat, closed:
    * near-duplicates straddle content-hash splits because each member
    * hashes its own slightly-different text (the leakage
    * `Contamination.crossSplitCheck` then detects). Hashing the cluster
    * REPRESENTATIVE's text instead sends every member of a near-dup
    * cluster to the same split; singletons (their own representative)
    * degrade to exactly [[assignSplit]]. `clusters` is
    * [[Dedup.assignClusters]]' output — (idCol, cluster_id) where
    * cluster_id is the keeper's doc id.
    *
    * Scale shape: two id-keyed hash joins — docs x clusters on the doc id,
    * then members x representative text on the keeper id. The keeper side
    * has ONE row per cluster; a mega-cluster fans its single keeper row
    * out to its members (a join, never a pairwise product), and AQE's
    * skew split absorbs a hot keeper key.
    */
  def clusterCoherentSplit(docs: DataFrame, clusters: DataFrame,
                           idCol: String = "doc_id", textCol: String = "text",
                           trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "trainPct/valPct must be non-negative and sum to <= 100")
    val keeperText = docs.select(col(idCol).as("__ccs_kid"), col(textCol).as("__ccs_ktext"))
    val b = contentBucket(col("__ccs_ktext"), 100)
    docs
      .join(clusters.select(col(idCol).as("__ccs_id"), col("cluster_id")),
        col(idCol) === col("__ccs_id"))
      .drop("__ccs_id")
      .join(keeperText, col("cluster_id") === col("__ccs_kid"))
      .withColumn("split",
        when(b < trainPct, "train")
          .when(b < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__ccs_kid", "__ccs_ktext")
  }

  /** Priority column for [[weightedSample]]: the Efraimidis-Spirakis key
    * in log space. E-S samples without replacement with
    * P(selected) proportional to weight by keeping the n rows maximizing
    * `u^(1/w)`, u uniform in (0,1] — here u = (h+1)/2^61 from the 61-bit
    * avalanche content hash (deterministic, no RNG state, the house
    * sampling discipline), and the monotone log transform `ln(u)/w`
    * replaces the power: no exp() anywhere. ln is [[PinnedMath]]'s pinned
    * series in integer fixed point — `ln(u) = lnfp(h+1) - lnfp(2^61)`,
    * both terms the same series both engines evaluate — and the ONE float
    * op is the final division by the weight on identical integers, so the
    * ranking is engine-exact. Rows with non-positive weight get NULL
    * priority (excluded by the samplers).
    */
  def weightedPriority(df: DataFrame, weightCol: String,
                       textCol: String = "text"): DataFrame = {
    import graft.functions.PinnedMath
    val withLn = PinnedMath.lnFpSteps("__wp_lnu", "(__wp_h + 1)")
      .foldLeft(df.withColumn("__wp_h",
        graft.functions.PolyHash61.polyHash61(col(textCol)))) {
        case (d, (alias, e)) => d.withColumn(alias, expr(e))
      }
    withLn
      .withColumn("priority",
        when(col(weightCol) <= 0, lit(null)).otherwise(
          expr(s"CAST(__wp_lnu_lnfp - ${PinnedMath.LnFp2Pow61} AS DOUBLE)" +
            s" / CAST($weightCol AS DOUBLE)" +
            s" / CAST(${PinnedMath.FpScale} AS DOUBLE)")))
      .drop(PinnedMath.lnFpSteps("__wp_lnu", "x").map(_._1) :+ "__wp_h": _*)
  }

  /** Deterministic weighted sample WITHOUT replacement: the `n` rows with
    * the highest [[weightedPriority]] — inclusion probability proportional
    * to `weightCol` (sample docs by quality score, boost underrepresented
    * sources, downweight boilerplate-heavy domains). TakeOrdered plan:
    * per-partition top-n, never a global sort; ties (identical text AND
    * weight) break by id for a total replayable order.
    */
  def weightedSample(df: DataFrame, weightCol: String, n: Int,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n > 0, "sample size must be positive")
    // filter on the WEIGHT, not on priority.isNotNull: the two are
    // equivalent (priority is NULL iff weight is null/non-positive), but
    // a predicate on the derived column gets pushed below the projections
    // as the fully-inlined priority expression — a ~400KB re-derivation
    // of the hash + ln chain evaluated per scanned row (measured 14s vs
    // 0.4s at sf0.1)
    weightedPriority(df.filter(col(weightCol) > 0), weightCol, textCol)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(n)
  }

  /** Per-category [[weightedSample]] — exactly n per group, skew-safe via
    * [[Skew.groupedTopK]]'s salted two-phase rank (no group ever sorts in
    * one task).
    */
  def weightedSamplePerCategory(df: DataFrame, categoryCol: String,
                                weightCol: String, n: Int,
                                textCol: String = "text",
                                idCol: String = "doc_id"): DataFrame =
    Skew.groupedTopK(
      weightedPriority(df.filter(col(weightCol) > 0), weightCol, textCol),
      categoryCol, Seq(col("priority").desc, col(idCol).asc), k = n)

  /** Deterministic EPOCH SHUFFLE: the global training order for one epoch
    * — a reproducible permutation of the corpus that changes with the
    * epoch number and is a pure function of (epoch, id): no RNG state, no
    * driver involvement, re-runnable anywhere with identical output (the
    * property a resumable training job needs from its data order).
    *
    * position = global rank of (h, id) with h = polyHash61("epoch:id") —
    * the AVALANCHING hash (the HLL's), NOT the rolling polyHash: a plain
    * polynomial hash of "epoch:<id>" is nearly ORDER-PRESERVING in id
    * (consecutive ids differ only in the last term), which would make
    * every epoch's "shuffle" approximately the identity permutation; the
    * xor-shift/multiply finalizer is what actually decorrelates
    * (SamplingSpec pins that epochs produce different permutations).
    * The naive form is `row_number() OVER (ORDER BY h, id)` — an
    * UNPARTITIONED window that funnels the corpus through one task. This
    * uses the same two-phase decomposition as [[Packing]]'s prefix sum:
    * coarse bucket = `h div ceil(HashMod/hashBuckets)` (floor division —
    * monotone in h, so buckets are contiguous rank ranges; polyHash is
    * near-uniform so buckets are balanced by construction, unlike
    * id-derived buckets), per-bucket counts -> exclusive prefix sum over
    * the BUCKET TOTALS (hashBuckets rows — the only single-task frame),
    * broadcast back, rank within bucket. Identical to the naive rank for
    * every `hashBuckets` (SamplingSpec pins it).
    *
    * Output: (idCol, shuffle_pos) — dense 0..n-1, no collisions possible
    * (the (h, id) pair is unique because id is).
    */
  def epochShuffle(docs: DataFrame, epoch: Int, idCol: String = "doc_id",
                   hashBuckets: Int = 4096): DataFrame = {
    require(hashBuckets > 0, "hashBuckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val width =
      (graft.functions.PolyHash61Impl.Mod61 + hashBuckets - 1) / hashBuckets
    val hashed = docs.select(col(idCol),
        graft.functions.PolyHash61.polyHash61(
          concat(lit(s"$epoch:"), col(idCol).cast("string"))).as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L"))
    val counts = hashed.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    val exclusive = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.select(col("__b"),
      coalesce(sum(col("__n")).over(exclusive), lit(0L)).as("__off"))
    val inBucket = Window.partitionBy(col("__b"))
      .orderBy(col("__h").asc, col(idCol).asc)
    hashed.join(broadcast(offsets), Seq("__b"))
      .withColumn("__r", row_number().over(inBucket).cast("long"))
      .select(col(idCol), (col("__off") + col("__r") - 1).as("shuffle_pos"))
  }

  /** Materialize a [[mixturePlan]] — the apply step the planning table
    * leaves open (q106 emits integer repetition factors; nothing turned
    * them into the mixed corpus): each document joins its source's
    * `epochs_ppm` and expands through [[epochMix]]'s machinery —
    * `epochs_ppm div 1e6` whole copies plus ONE more iff the content
    * bucket falls under the fractional remainder — so each source's
    * EXPECTED realized tokens equal the plan's `target_tokens` (exact
    * when the plan lands on whole epochs; the fractional copy is a
    * deterministic content-hash gate, not RNG, so reruns and engines
    * replay the same mix bit-for-bit). Sources the plan weights 0 emit
    * nothing; sources ABSENT from the plan are dropped too (the plan
    * DEFINES the release — [[mixturePlan]] always carries every source it
    * saw, so absence means a foreign plan, and weight-0 is its only sane
    * reading). A NULL / negative / >1e9 (1000-epoch) factor raises
    * per-row — the [[epochMix]] weight guard, enforced on DATA because
    * the plan arrives as a frame, not driver literals.
    *
    * Output: the input row + (epochs_ppm, n_copies, epoch in
    * [1, n_copies]). Scale shape: the plan is group-sized — one
    * null-safe broadcast join + a row-local explode, zero shuffle;
    * output volume is the mix the plan asked for, never an intermediate.
    */
  def applyMixturePlan(docs: DataFrame, plan: DataFrame,
                       sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    require(plan.columns.contains("epochs_ppm"),
      "applyMixturePlan needs a mixturePlan frame (no epochs_ppm column)")
    require(plan.columns.contains(sourceCol),
      s"applyMixturePlan: plan has no '$sourceCol' column")
    val p = plan.select(col(sourceCol).as("__mp_src"),
      when(col("epochs_ppm").isNull || col("epochs_ppm") < 0 ||
          col("epochs_ppm") > 1000000000L,
        raise_error(concat(lit("applyMixturePlan: epochs_ppm "),
          col("epochs_ppm").cast("string"),
          lit(" outside [0, 1e9] — a repetition factor above 1000 epochs "),
          lit("(or below zero) is almost certainly a bug"))))
        .otherwise(col("epochs_ppm")).as("epochs_ppm"))
    docs.join(broadcast(p), col(sourceCol) <=> col("__mp_src"))
      .drop("__mp_src")
      .withColumn("n_copies",
        expr("epochs_ppm div 1000000") +
          when(contentBucket(col(textCol), 1000000) <
            col("epochs_ppm") % 1000000L, 1L).otherwise(0L))
      .withColumn("epoch",
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))))
  }

  /** Token-budget MIXTURE PLAN: given target mixture weights per source
    * (ppm, summing to <= 1e6) and a total token budget, report for every
    * source its inventory and the repetition factor that realizes the
    * target — the planning table behind "books 2.3 epochs, web 0.4
    * epochs" style training mixtures. All math is integer (ppm and
    * floor divisions), so both engines agree bit-for-bit.
    *
    *  - `target_tokens = budget * weight_ppm div 1e6`
    *  - `epochs_ppm = target_tokens * 1e6 div n_tokens` — over 1e6 means
    *    upsampling (repeat the source), under means a sampling rate;
    *    [[epochMix]] and [[applyMixturePlan]] consume exactly this shape
    *    of factor.
    *
    * Sources absent from `weightsPpm` get weight 0 (dropped from the
    * mix but still reported — the audit sees what the plan excludes).
    * Caller contract: `budgetTokens` below ~9e12 keeps
    * `target_tokens * 1e6` inside BIGINT on both engines.
    *
    * One combinable aggregate over the corpus (token counts), then
    * row-local arithmetic on the per-source rollup — group-sized output,
    * no second corpus pass.
    */
  def mixturePlan(docs: DataFrame, weightsPpm: Map[String, Long],
                  budgetTokens: Long,
                  sourceCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(weightsPpm.values.forall(_ >= 0), "weights must be non-negative")
    require(weightsPpm.values.sum <= 1000000L, "weights must sum to <= 1e6 ppm")
    // deterministic when-chain from the sorted constant map (epochMix's
    // caseChain pattern): unknown sources fall through to 0
    val wChain = weightsPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    docs.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        // NULL text counts 0 tokens explicitly: legacy size(NULL) = -1
        // would silently subtract from the inventory
        coalesce(sum(when(col(textCol).isNull, lit(0L))
          .otherwise(size(graft.functions.TextFunctions.tokens(col(textCol)))
            .cast("long"))), lit(0L)).as("n_tokens"))
      .withColumn("weight_ppm", wChain)
      .withColumn("target_tokens",
        expr(s"(weight_ppm * ${budgetTokens}L) div 1000000"))
      .withColumn("epochs_ppm",
        when(col("n_tokens") > 0,
          expr("(target_tokens * 1000000) div n_tokens")).otherwise(lit(0L)))
  }
}
