package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * check pass a production pipeline runs before promoting a table: a
  * rule list (non-null, unique key, value range, value set, regex shape,
  * row-count bounds, referential integrity) evaluated in bulk, emitting
  * one verdict row per rule with exact violation counts. Complements the
  * DESCRIPTIVE audits ([[Profile.tableProfile]] reports what IS;
  * expectations assert what MUST BE — the audit→gate step).
  *
  * Exactness: every count is integer, the pass verdict is the
  * cross-multiplied rational `n_violations · 1e6 ≤ tolerancePpm · n_rows`
  * (no division — holds for the 0-row table), and `violation_ppm` is
  * [[ExactPpm]] floor ppm. NULL semantics are separated by design: a
  * NULL value violates ONLY [[Expectations.NotNull]] — range/set/regex/
  * foreign-key rules skip NULLs rather than double-counting them, so a
  * column with nulls fails exactly the rule that names the problem.
  *
  * Scale shape: every row-local rule (non-null, range, set, regex,
  * row-count) folds into ONE shared combinable aggregate over a single
  * scan — adding a rule adds a conditional sum, never a pass. Each
  * [[Expectations.Unique]] adds one key-grouped aggregate (the exact
  * dedup shuffle shape); each [[Expectations.ForeignKey]] adds one
  * anti-join against the parent's distinct keys (broadcast for dimension
  * tables via `broadcastParent`, shuffle-hash otherwise). The verdict
  * output is |rules| rows.
  */
object Expectations {

  sealed trait Rule { def tolerancePpm: Long }

  /** `column` must not be NULL. */
  final case class NotNull(column: String, tolerancePpm: Long = 0L) extends Rule

  /** The `columns` tuple must identify rows uniquely; a violation is a
    * row that SHARES its key with at least one other row (so 3 copies
    * count 3 violations — the rows a dedup would have to adjudicate).
    * NULL key parts compare equal, as in GROUP BY.
    */
  final case class Unique(columns: Seq[String], tolerancePpm: Long = 0L) extends Rule

  /** Non-NULL values of `column` must sit in [min, max] (integer domain
    * — cast fixed-point first for decimals, the repo-wide convention).
    */
  final case class InRange(column: String, min: Long, max: Long,
                           tolerancePpm: Long = 0L) extends Rule

  /** Non-NULL values of `column` must be one of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String],
                         tolerancePpm: Long = 0L) extends Rule

  /** Non-NULL values of `column` must fully match `pattern` (rlike
    * anchored by the caller — pass `^...$` for a full match).
    */
  final case class MatchesRegex(column: String, pattern: String,
                                tolerancePpm: Long = 0L) extends Rule

  /** Total row count must sit in [min, max]; the verdict row reports
    * n_violations 0 or 1 (the check holds or it does not).
    */
  final case class RowCountBetween(min: Long, max: Long) extends Rule {
    val tolerancePpm = 0L
  }

  /** Referential integrity: every non-NULL `columns` tuple must exist as
    * a `parentColumns` tuple in `parent` (rows with any NULL key part
    * are skipped — that's [[NotNull]]'s job). `broadcastParent` for
    * dimension-sized parents; the 100 TB fact side never shuffles then.
    */
  final case class ForeignKey(columns: Seq[String], parent: DataFrame,
                              parentColumns: Seq[String],
                              tolerancePpm: Long = 0L,
                              broadcastParent: Boolean = true) extends Rule {
    require(columns.nonEmpty && columns.size == parentColumns.size,
      s"foreign key arity mismatch: $columns vs $parentColumns")
  }

  /** Parse the one-string rule DSL the CLI and the release capstone
    * share: ';'-separated `kind:body` items —
    * {{{
    *   not_null:col            unique:a,b          in_set:col=v1|v2
    *   in_range:col=lo..hi     regex:col=pattern   row_count:lo..hi
    *   fk:cols->parentPath:pcols
    * }}}
    * RESERVED CHARACTERS: ';' separates rules and '|' separates in_set
    * values; to use either inside a value (a regex matching semicolons, a
    * set value containing a pipe), escape it as `\;` / `\|` — the
    * backslash is removed at parse time. (In a regex body `\;` already
    * means a literal ';' to the regex engine, so the unescape is
    * semantics-preserving.) Every other backslash passes through
    * verbatim (`\d` stays `\d`). Regex patterns are compiled at parse
    * time so a mis-split or malformed pattern fails HERE, loudly, not
    * mid-scan on an executor.
    *
    * `loadParent` resolves an fk rule's parent path to a frame (the
    * caller's Fetcher, so the in-memory test double works).
    */
  def parseRules(spec: String,
                 loadParent: String => DataFrame): Seq[Rule] = {
    def split2(s: String, sep: String): (String, String) = {
      val at = s.indexOf(sep)
      require(at > 0, s"expectations: bad rule spec '$s' (missing '$sep')")
      (s.take(at).trim, s.drop(at + sep.length))
    }
    val rules = splitEscaped(spec, ';').map(_.trim).filter(_.nonEmpty).map { item =>
      val (kind, body) = split2(item, ":")
      kind match {
        case "not_null" => NotNull(body.trim)
        case "unique" => Unique(body.split(',').toSeq.map(_.trim))
        case "in_set" =>
          val (c, vs) = split2(body, "=")
          InSet(c, splitEscaped(vs, '|'))
        case "in_range" =>
          val (c, r) = split2(body, "=")
          val (lo, hi) = split2(r, "..")
          InRange(c, lo.toLong, hi.toLong)
        case "regex" =>
          val (c, p) = split2(body, "=")
          try java.util.regex.Pattern.compile(p)
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              throw new IllegalArgumentException(
                s"expectations: regex rule for '$c' has a malformed pattern " +
                  s"'$p' (did a ';' or '|' need escaping as \\; / \\|?): " +
                  e.getMessage)
          }
          MatchesRegex(c, p)
        case "row_count" =>
          val (lo, hi) = split2(body, "..")
          RowCountBetween(lo.toLong, hi.toLong)
        case "fk" =>
          val (childCols, rhs) = split2(body, "->")
          val (pPath, pCols) = split2(rhs, ":")
          ForeignKey(childCols.split(',').toSeq.map(_.trim),
            loadParent(pPath), pCols.split(',').toSeq.map(_.trim))
        case other => throw new IllegalArgumentException(
          s"expectations: unknown rule kind '$other' in '$item'")
      }
    }
    require(rules.nonEmpty, s"expectations: no rules in spec '$spec'")
    rules
  }

  /** Split on `sep` honouring `\sep` as a literal occurrence (the escape
    * backslash is removed); any other backslash passes through verbatim.
    * TRAILING empty segments drop (Java `String.split` semantics, which
    * this replaces): a trailing-'|' typo in an in_set rule must not
    * silently admit "" as a valid value. Interior empties survive.
    */
  private def splitEscaped(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == sep) {
        cur.append(sep); i += 2
      } else if (c == sep) {
        out += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.result().reverse.dropWhile(_.isEmpty).reverse
  }

  /** One verdict row per rule: `(rule, target, n_rows, n_violations,
    * violation_ppm, passed)` — rules evaluated over `df` in the passes
    * described above, in the given order.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: empty rule list")

    // ---- the single shared scan for every row-local rule ----
    val rowLocal: Seq[(Rule, String, String, Column)] = rules.zipWithIndex.collect {
      case (r @ NotNull(c, _), i) =>
        (r, "not_null", c,
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__v$i"))
      case (r @ InRange(c, lo, hi, _), i) =>
        (r, "in_range", c, coalesce(sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L)), lit(0L)).as(s"__v$i"))
      case (r @ InSet(c, allowed, _), i) =>
        (r, "in_set", c, coalesce(sum(when(col(c).isNotNull &&
          !col(c).isin(allowed: _*), 1L).otherwise(0L)), lit(0L)).as(s"__v$i"))
      case (r @ MatchesRegex(c, p, _), i) =>
        (r, "matches_regex", c, coalesce(sum(when(col(c).isNotNull &&
          !col(c).rlike(p), 1L).otherwise(0L)), lit(0L)).as(s"__v$i"))
    }
    // EVERY shared-scan rule (row-local + row-count) rides the single
    // aggregate row and explodes into its verdict rows there — a union
    // of per-rule selects over the agg frame would re-execute the whole
    // corpus scan once per branch (the plan audit caught exactly that)
    val sharedStructs: Seq[Column] = rules.zipWithIndex.flatMap {
      case (RowCountBetween(lo, hi), _) => Some(struct(
        lit("row_count_between").as("rule"),
        lit(s"[$lo, $hi]").as("target"),
        col("__n").as("n_rows"),
        when(col("__n") >= lo && col("__n") <= hi, 0L).otherwise(1L)
          .as("n_violations"),
        lit(0L).as("__tol")))
      case (r, i) if rowLocal.exists(_._1 eq r) =>
        val (_, kind, target, _) = rowLocal.find(_._1 eq r).get
        Some(struct(lit(kind).as("rule"), lit(target).as("target"),
          col("__n").as("n_rows"), col(s"__v$i").as("n_violations"),
          lit(r.tolerancePpm).as("__tol")))
      case _ => None
    }
    val sharedFrame: Option[DataFrame] =
      if (sharedStructs.isEmpty) None
      else Some(df.agg(count(lit(1)).as("__n"), rowLocal.map(_._4): _*)
        .select(explode(array(sharedStructs: _*)).as("r"))
        .select(col("r.rule").as("rule"), col("r.target").as("target"),
          col("r.n_rows").as("n_rows"), col("r.n_violations").as("n_violations"),
          col("r.__tol").as("__tol")))

    val heavyFrames: Seq[DataFrame] = rules.collect {
      case Unique(cols, tol) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)), lit(0L))
              .as("n_violations"))
          .select(lit("unique").as("rule"),
            lit(cols.mkString(",")).as("target"),
            col("n_rows"), col("n_violations"), lit(tol).as("__tol"))
      case ForeignKey(cols, parent, pCols, tol, bc) =>
        val pKeys = parent
          .select(pCols.zip(cols).map { case (p, c) => col(p).as(s"__fk_$c") }: _*)
          .distinct()
          .withColumn("__fk_hit", lit(1))
        val side = if (bc) broadcast(pKeys) else pKeys.hint("shuffle_hash")
        val keysPresent = cols.map(col(_).isNotNull).reduce(_ && _)
        // ONE pass counts rows AND orphans: distinct parent keys make the
        // left join match at most once, so the row count is preserved
        df.join(side, cols.map(c => col(c) === col(s"__fk_$c")).reduce(_ && _),
            "left_outer")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(when(keysPresent && col("__fk_hit").isNull, 1L)
              .otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit("foreign_key").as("rule"),
            lit(cols.mkString(",")).as("target"),
            col("n_rows"), col("n_violations"), lit(tol).as("__tol"))
    }

    // the pass verdict cross-multiplies (no division — exact for the
    // 0-row table); tolerance rides each frame as a literal so per-rule
    // thresholds survive the union. DECIMAL keeps 1e6 x trillion-row
    // counts inside the domain.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    (sharedFrame.toSeq ++ heavyFrames).reduce(_ unionByName _)
      .withColumn("violation_ppm", ExactPpm.ppm(col("n_violations"), col("n_rows")))
      .withColumn("passed",
        (dec(col("n_violations")) * dec(lit(1000000L)) <=
          dec(col("__tol")) * dec(col("n_rows"))).cast("int"))
      .drop("__tol")
  }
}
