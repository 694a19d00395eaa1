package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives for large-scale training-data
  * pipelines: tokenization, shingling, deterministic hashing, MinHash
  * signatures, SimHash inputs, quality metrics, and a language-ID heuristic.
  *
  * Everything here is a pure, row-local Column expression built from Spark's
  * codegen'd higher-order functions (`transform`/`aggregate`/`filter`) — no
  * UDFs, no shuffles, no state. At 100 TB these run map-side inside
  * whole-stage codegen; the only shuffles in the dedup pipelines built on top
  * (see [[graft.operators.Dedup]]) are the intentional LSH bucket joins.
  *
  * Hashing is a polynomial rolling hash with explicitly pinned arithmetic
  * (base 131, modulus 1e9+7, left fold) rather than Spark's `xxhash64` so the
  * DuckDB oracle can replicate it bit-for-bit in SQL. Collision rate at the
  * 1e9 modulus is ~n^2/2e9 per doc pair — acceptable for near-dup candidate
  * generation (and the oracle computes the identical function, so parity is
  * unaffected).
  */
object TextFunctions {

  /** Modulus/base of the portable rolling hash (shared with the oracle SQL). */
  val HashMod = 1000000007L
  val HashBase = 131L

  /** MinHash universal-hash family h_j(x) = (a_j * x + b_j) mod P, P = 2^31-1.
    * 16 signatures, banded 4x4 for LSH. a_j odd and fixed; literals are part
    * of the query contract (the oracle embeds the same table).
    */
  val MinhashMod = 2147483647L
  val MinhashA: Seq[Long] = Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)
  val MinhashB: Seq[Long] = Seq(17, 118, 219, 320, 421, 522, 623, 724, 825, 926, 1027, 1128, 1229, 1330, 1431, 1532)
  val MinhashK = 16
  val LshBands = 4
  val LshRows = 4 // MinhashK / LshBands

  /** SimHash uses the low 30 bits of the rolling hash (modulus < 2^30). */
  val SimhashBits = 30

  /** Lowercase word tokens; empty strings from split boundaries removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Portable rolling hash of a string: fold over characters of
    * (acc * 131 + ascii(c)) % (1e9+7). Row-local; the oracle's
    * `list_reduce` twin folds in the same order so values match exactly.
    * Backed by the native [[PolyHash]] expression — a tight byte loop
    * instead of one interpreted lambda frame per character.
    */
  def polyHash(s: Column): Column = PolyHash.polyHash(s)

  /** The original interpreted HOF fold, kept ONLY as the bit-parity witness
    * for [[PolyHash]] (PolyHashSpec asserts native == HOF on random strings).
    */
  def polyHashHof(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        sequence(lit(1), length(s)),
        lit(0L),
        (acc, i) => (acc * HashBase + ascii(s.substr(i, lit(1)))) % HashMod))

  /** Expression-level `let`: evaluate `value` ONCE per row and hand it to
    * `body` as a bound lambda variable — the binding Spark's expression
    * language lacks. Interpreted higher-order functions re-evaluate every
    * subtree reference on every lambda invocation, so a fold that consults
    * its source array per step turns an O(n) pass into O(n^2)
    * re-tokenizations; routing the array through a one-element `transform`
    * makes every inner reference a cheap variable read. (Column-level
    * projection would also work, but callers compose these as single
    * expressions — the binding keeps the fix inside the function.)
    */
  private def letBound(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Tokens with runs of CONSECUTIVE duplicates collapsed to one ("a a the"
    * -> "a the") — the cheap generator-stutter normalization a cleaning
    * pass runs before hashing/dedup (cross-doc dedup can't see it; q52's
    * repetition metrics only measure it). Row-local; position-indexed so
    * the oracle's `range`/`list_filter` twin keeps the identical order.
    */
  def collapseRepeats(toks: Column): Column =
    letBound(toks, w =>   // w: one tokenization per row, not one per element
      when(size(w) === 0, array().cast("array<string>")).otherwise(
        filter(
          transform(sequence(lit(1), size(w)), i =>
            when(i === 1 || element_at(w, i) =!= element_at(w, i - 1),
              element_at(w, i))),
          t => t.isNotNull)))

  /** Distinct n-gram word shingles ("w1 w2 w3") of a token array. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))))

  /** ALL n-gram word shingles in document order, duplicates KEPT — the
    * frequency-counting counterpart of [[wordShingles]]' set form (n-gram
    * tf needs every occurrence; dedup needs the set). letBound like
    * [[collapseRepeats]]: the token array evaluates once per row even
    * interpreted, not once per (element x n).
    */
  def wordShinglesAll(toks: Column, n: Int): Column =
    letBound(toks, w =>
      when(size(w) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*))))

  /** Distinct rolling-hash values of each shingle (the doc's shingle set as
    * a compact Long set — cheaper to intersect than the strings). Backed by
    * the native one-pass [[ShingleHashes]] expression.
    */
  def shingleHashes(text: Column, n: Int): Column =
    ShingleHashes.shingleHashes(text, n)

  /** The composed HOF formulation, kept ONLY as the parity witness for the
    * native [[ShingleHashes]] (ShingleHashesSpec asserts element equality).
    */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(transform(wordShingles(tokens(text), n), s => polyHash(s)))

  /** k-element MinHash signature of a hash set: sig_j = min_x h_j(x). Null
    * elements when the set is empty (docs shorter than the shingle width).
    * Backed by the native one-pass [[MinHashSignature]] expression.
    */
  def minhashSignature(hashes: Column): Column =
    MinHashSignature.minhashSignature(hashes)

  /** The composed k-chain formulation, kept ONLY as the parity witness for
    * the native [[MinHashSignature]] (MinHashSignatureSpec).
    */
  def minhashSignatureHof(hashes: Column): Column =
    array((0 until MinhashK).map { j =>
      array_min(transform(hashes, h => (lit(MinhashA(j)) * h + lit(MinhashB(j))) % lit(MinhashMod)))
    }: _*)

  /** LSH band key: signature rows [b*rows, (b+1)*rows) joined as a string.
    * Docs agreeing on any one band become candidate pairs.
    */
  def lshBandKey(sig: Column, band: Int): Column =
    concat_ws("-", (0 until LshRows).map(r => element_at(sig, band * LshRows + r + 1).cast("string")): _*)

  /** Exact Jaccard similarity of two SORTED pre-distinct long arrays, via
    * the native [[SortedIntersectCount]] merge kernel — the verify-join hot
    * path (one evaluation per candidate pair).
    */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = SortedIntersectCount.sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact Jaccard of two pre-distinct arrays in ANY order, via interpreted
    * `array_intersect` — kept as the parity witness for [[jaccardSorted]]
    * (SortedIntersectCountSpec) and for callers with unsorted sets.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ---- quality metrics -------------------------------------------------

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Whitespace token count, distinct ratio, mean token length, stopword
    * ratio, a BPE-ish subword estimate (ceil(len/4) per token), and a
    * composite quality score. Counting runs in the native one-pass
    * [[TextStats]] kernel; the ratio/score arithmetic below is identical to
    * the HOF witness, so outputs match bit-for-bit (TextStatsSpec).
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val st = TextStats.textStats(text)
    metricsFrom(
      st.getField("n_tokens"), st.getField("n_distinct"),
      st.getField("sum_len"), st.getField("est_subwords"), st.getField("n_stop"))
  }

  /** The composed HOF formulation, kept ONLY as the bit-parity witness for
    * [[TextStats]]-backed [[qualityMetrics]].
    */
  def qualityMetricsHof(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    // ceil(len/4) via floor((len+3)/4); Spark Column `/` is double division,
    // so floor() then cast — exact for these magnitudes, and the oracle twin
    // (DuckDB float division + floor) computes the same value.
    metricsFrom(
      size(toks),
      size(array_distinct(toks)),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)),
      aggregate(toks, lit(0L), (acc, t) => acc + floor((length(t) + lit(3)) / lit(4)).cast("long")),
      countIn(toks, Stopwords))
  }

  /** Shared ratio/score arithmetic over the five counts — one body, so the
    * native and witness paths cannot drift.
    */
  private def metricsFrom(n: Column, nd: Column, sumLen: Column,
      subwords: Column, nStop: Column): Seq[(String, Column)] = {
    val distinctRatio = nd.cast("double") / n
    val avgLen = sumLen.cast("double") / n
    val stopRatio = nStop.cast("double") / n
    val quality = round(
      lit(0.4) * distinctRatio + lit(0.3) * least(avgLen / 8.0, lit(1.0)) + lit(0.3) * (lit(1.0) - stopRatio), 6)
    Seq(
      "n_tokens" -> n.cast("long"),
      "n_distinct" -> nd.cast("long"),
      "est_subwords" -> subwords.cast("long"),
      "distinct_ratio" -> round(distinctRatio, 6),
      "avg_token_len" -> round(avgLen, 6),
      "stopword_ratio" -> round(stopRatio, 6),
      "quality_score" -> quality)
  }

  /** Gopher rule thresholds (Rae et al. 2021, Appendix A) — shared by the
    * Column builders and the oracle SQL generator so the two cannot drift.
    * Every threshold is applied CROSS-MULTIPLIED in integers (e.g.
    * `10 * symbols <= n_words` for the 0.1 ratio), so the flags are exact
    * on both engines — no float compare anywhere.
    */
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L
  val GopherStopSmall: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule bundle (Rae et al. 2021): the standard
    * web-corpus document filters, each reported as its raw metric plus an
    * integer 0/1 flag, with `gopher_keep` the conjunction. "Words" are
    * whitespace-split (punctuation kept — mean length and the alphabetic
    * test see the raw token); the stop-containment test uses the
    * lowercased alnum [[tokens]]. Row-local, no shuffle:
    *
    *  - r1 word count in [50, 1e5]      - r5 <= 30% lines end "..."
    *  - r2 mean word length in [3, 10]  - r6 >= 80% words have a letter
    *  - r3 symbol-to-word <= 0.1        - r7 >= 2 of 8 small stopwords
    *  - r4 <= 90% lines start a bullet
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    // ONE native byte-scan ([[GopherScan]]) computes every raw metric;
    // all sixteen outputs read fields of the SAME struct subtree, so
    // subexpression elimination evaluates the scan once per row and the
    // generated code is one kernel call + integer math — the HOF form
    // (kept below as the parity witness) split the text three ways and
    // re-walked it per output column, the largest codegen producer in
    // the corpus-quality family.
    val m = GopherScan.gopherScan(text)
    gopherDerived(
      n = m.getField("n_words"),
      sumLen = m.getField("sum_word_len"),
      alphaWords = m.getField("alpha_words"),
      symbols = m.getField("symbol_count"),
      nLines = m.getField("n_lines"),
      bulletLines = m.getField("bullet_lines"),
      ellipsisLines = m.getField("ellipsis_lines"),
      nStopPresent = m.getField("n_stop_present"))
  }

  /** The original HOF formulation of [[gopherRules]] — retained ONLY as
    * the bit-parity witness for [[GopherScan]] (GopherRulesSpec asserts
    * native == HOF on hand cases and random strings).
    */
  def gopherRulesHof(text: Column): Seq[(String, Column)] = {
    val words = filter(split(text, "\\s+"), w => length(w) > lit(0))
    val n = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    // '#' occurrences + '...' occurrences (each "..." is 3 chars)
    val symbols = (length(text) - length(regexp_replace(text, "#", ""))).cast("long") +
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val lines = filter(split(text, "\n"), l => length(trim(l)) > lit(0))
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => ltrim(l).rlike("^[-*]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => rtrim(l).endsWith("..."))).cast("long")
    val toks = tokens(text)
    val nStopPresent = GopherStopSmall
      .map(s => when(array_contains(toks, s), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    gopherDerived(n, sumLen, alphaWords, symbols, nLines, bulletLines,
      ellipsisLines, nStopPresent)
  }

  /** Rule flags + report columns from the eight raw metrics — shared by
    * the native and HOF formulations so parity is structural.
    */
  private def gopherDerived(n: Column, sumLen: Column, alphaWords: Column,
                            symbols: Column, nLines: Column,
                            bulletLines: Column, ellipsisLines: Column,
                            nStopPresent: Column): Seq[(String, Column)] = {
    val flag = (c: Column) => when(c, lit(1)).otherwise(lit(0))
    val r1 = flag(n >= GopherMinWords && n <= GopherMaxWords)
    val r2 = flag(n > 0 && sumLen >= lit(3L) * n && sumLen <= lit(10L) * n)
    val r3 = flag(lit(10L) * symbols <= n)
    val r4 = flag(lit(10L) * bulletLines <= lit(9L) * nLines)
    val r5 = flag(lit(10L) * ellipsisLines <= lit(3L) * nLines)
    val r6 = flag(lit(5L) * alphaWords >= lit(4L) * n)
    val r7 = flag(nStopPresent >= 2L)
    Seq(
      "n_words" -> n,
      // when(n > 0, ...): Spark non-ANSI 0.0/0 is NULL but DuckDB's is
      // NaN — a token-less doc must be NULL on both engines
      "mean_word_len" -> when(n > 0, round(sumLen.cast("double") / n, 6)),
      "symbol_count" -> symbols,
      "n_lines" -> nLines,
      "bullet_lines" -> bulletLines,
      "ellipsis_lines" -> ellipsisLines,
      "alpha_words" -> alphaWords,
      "n_stop_present" -> nStopPresent,
      "r1_word_count" -> r1, "r2_mean_len" -> r2, "r3_symbols" -> r3,
      "r4_bullets" -> r4, "r5_ellipsis" -> r5, "r6_alpha" -> r6,
      "r7_stopwords" -> r7,
      "gopher_keep" -> (r1 * r2 * r3 * r4 * r5 * r6 * r7))
  }

  /** C4 line-filter constants (Raffel et al. 2020 §2.2 and the released
    * c4_utils): a line survives iff it ends in a terminal mark, has >= 5
    * words, and mentions neither javascript nor a cookie/policy phrase;
    * a page survives iff >= 3 lines survive and it contains neither
    * "lorem ipsum" nor a curly brace.
    */
  val C4MinWordsPerLine = 5L
  val C4MinKeptLines = 3L
  val C4EndMarks: Seq[String] = Seq(".", "?", "!", "\"")
  val C4PolicyPhrases: Seq[String] = Seq(
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies")

  /** The C4 cleaning bundle (Raffel et al. 2020): LINE-level removal — the
    * C4 distinctive vs Gopher's document-level thresholds ([[gopherRules]])
    * — plus the page-level drops, all row-local (zero shuffle). Emits the
    * per-rule removal counts, integer flags, `c4_keep`, and `text_clean`
    * (the surviving lines re-joined — the transform a real pipeline feeds
    * downstream). Every rule is counted independently so the audit shows
    * WHY lines died, not just that they did.
    */
  def c4Rules(text: Column): Seq[(String, Column)] = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > lit(0))
    val nLines = size(lines).cast("long")
    def lineWords(l: Column) =
      size(filter(split(l, "\\s+"), w => length(w) > lit(0))).cast("long")
    def endsTerminal(l: Column) =
      C4EndMarks.map(m => rtrim(l).endsWith(m)).reduce(_ || _)
    def hasJs(l: Column) = lower(l).contains("javascript")
    def hasPolicy(l: Column) =
      C4PolicyPhrases.map(p => lower(l).contains(p)).reduce(_ || _)
    val keptLines = filter(lines, l =>
      endsTerminal(l) && lineWords(l) >= C4MinWordsPerLine &&
        !hasJs(l) && !hasPolicy(l))
    val nKept = size(keptLines).cast("long")
    def countRemoved(pred: Column => Column) =
      size(filter(lines, pred)).cast("long")
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    val flag = (c: Column) => when(c, lit(1)).otherwise(lit(0))
    val c1 = flag(nKept >= C4MinKeptLines)
    val c2 = flag(!hasLorem)
    val c3 = flag(!hasBrace)
    Seq(
      "n_lines" -> nLines,
      "kept_lines" -> nKept,
      "rm_no_terminal" -> countRemoved(l => !endsTerminal(l)),
      "rm_short" -> countRemoved(l => lineWords(l) < C4MinWordsPerLine),
      "rm_javascript" -> countRemoved(hasJs),
      "rm_policy" -> countRemoved(hasPolicy),
      "c1_min_lines" -> c1,
      "c2_lorem" -> c2,
      "c3_brace" -> c3,
      "c4_keep" -> (c1 * c2 * c3),
      "text_clean" -> array_join(keptLines, "\n"))
  }

  // ---- repetition metrics (Gopher-style within-doc filters) ------------

  /** Within-document repetition metrics — the Gopher/RefinedWeb-family
    * quality rules that catch boilerplate and generator loops n-gram
    * dedup can't (repetition INSIDE one doc, not across docs):
    *
    *  - `n_lines`               non-blank (trimmed) line count
    *  - `dup_line_ratio`        fraction of non-blank lines that are
    *                            repeats of an earlier line
    *  - `dup_line_char_ratio`   fraction of non-blank-line characters in
    *                            those repeats
    *  - `top_bigram_ratio`      characters covered by occurrences of the
    *                            most frequent word 2-gram / total text
    *                            chars (ties: lexicographically smallest
    *                            bigram, so engines agree)
    *
    * Counting runs in the native one-pass [[RepStats]] kernel (hash-map
    * line/bigram counts in a tight JIT'd loop); only the ratio arithmetic
    * stays in Column math. All counts are integer (order-independent),
    * the argmax tie-break is total, and each ratio is one rounded
    * division — so the DuckDB twin is bit-identical even though its
    * `list_distinct` order differs.
    */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val st = RepStats.repStats(text)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(round(num.cast("double") / den, 6))
    Seq(
      "n_lines" -> st.getField("n_lines"),
      "dup_line_ratio" -> ratio(
        st.getField("n_lines") - st.getField("nd_lines"), st.getField("n_lines")),
      "dup_line_char_ratio" -> ratio(
        st.getField("dup_line_chars"), st.getField("line_chars")),
      "top_bigram_ratio" -> ratio(
        st.getField("best_cnt") * st.getField("best_len"), length(text)))
  }

  /** The composed HOF formulation, kept ONLY as the bit-parity witness for
    * the native [[RepStats]] kernel (RepetitionMetricsSpec asserts value
    * equality on the corpus and the edge shapes). Let-bound arrays keep
    * even the witness polynomial: interpreted HOFs re-evaluate subtree
    * references per lambda frame, so the unbound original re-tokenized the
    * document per (distinct x element) pair.
    */
  def repetitionMetricsHof(text: Column): Seq[(String, Column)] = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    // toks let-bound here too: element_at inside the transform lambda
    // would otherwise re-tokenize the document per bigram element
    val grams = letBound(tokens(text), w =>
      when(size(w) < 2, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))))
    // both quadratic folds run over LET-BOUND arrays: `filter(ls, ...)` /
    // `filter(g, ...)` inside the fold lambdas reference a lambda VARIABLE
    // (an in-memory array), never the building expression tree. Without
    // the binding, interpreted HOF evaluation re-tokenizes the document
    // for every (distinct value x element) pair — a constant-factor
    // catastrophe that turned this row-local metric into minutes per
    // partition at sf0.1.
    val dupLineChars = letBound(lines, ls => aggregate(array_distinct(ls), lit(0L), (acc, dl) =>
      acc + (size(filter(ls, l => l === dl)) - 1).cast("long") * length(dl)))
    // argmax as ONE O(n) pass over the SORTED grams: equal grams are
    // adjacent, so the max count is the longest run, and strict `>` keeps
    // the FIRST (= lexicographically smallest) gram on ties — identical to
    // the distinct-then-count formulation it replaces, which cost
    // O(distinct x grams) interpreted lambda frames (the next constant
    // factor after the letBound fix; 80x fewer frames on typical docs)
    val best = letBound(sort_array(grams), g => aggregate(
      g,
      struct(lit(0).as("cnt"), lit("").as("g"), lit(0).as("run"), lit("").as("prev")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        val better = run > acc.getField("cnt")
        struct(
          when(better, run).otherwise(acc.getField("cnt")).as("cnt"),
          when(better, x).otherwise(acc.getField("g")).as("g"),
          run.as("run"),
          x.as("prev"))
      }))
    val nLines = size(lines)
    val totalLineChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0)).otherwise(round(num.cast("double") / den, 6))
    Seq(
      "n_lines" -> nLines.cast("long"),
      "dup_line_ratio" -> ratio(nLines - size(array_distinct(lines)), nLines),
      "dup_line_char_ratio" -> ratio(dupLineChars, totalLineChars),
      "top_bigram_ratio" -> ratio(
        best.getField("cnt").cast("long") * length(best.getField("g")),
        length(text)))
  }

  // ---- language ID -----------------------------------------------------

  /** Marker stopwords per language; argmax of per-doc marker counts with a
    * fixed preference order on ties. A real pipeline swaps in char-n-gram
    * profiles; the operator shape (row-local score -> argmax) is identical.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las"),
    "zh" -> Seq("de", "shi", "le", "zai"))

  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> countIn(toks, words) }

  /** Language-ID from raw text, marker counts from the native [[TextStats]]
    * kernel. Argmax with a fixed preference order on ties, exactly like the
    * token-based witness below.
    */
  def predictedLangText(text: Column): Column = {
    val st = TextStats.textStats(text)
    argmaxLang(LangMarkers.map { case (lang, _) => lang -> st.getField(s"s_$lang") })
  }

  /** Token-based formulation, kept as the parity witness for
    * [[predictedLangText]] (TextStatsSpec) and for callers that already
    * hold a token array.
    */
  def predictedLang(toks: Column): Column = argmaxLang(langScores(toks))

  private def argmaxLang(scores: Seq[(String, Column)]): Column = {
    // first language (in LangMarkers order) whose score equals the max
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("unknown")) { case ((lang, s), rest) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(rest)
    }
  }

  // ---- PII redaction -----------------------------------------------------

  /** PII patterns, ordered: each (name, regex, replacement token). The
    * regexes stay inside the syntax both Java's engine and RE2 (the
    * DuckDB oracle's) interpret identically — character classes, bounded
    * repetition, and `\b`; no backreferences or lookaround — and they are
    * applied in THIS order (emails first, so an address's digit runs are
    * gone before the looser numeric patterns scan). The list is the
    * minimal standard set (email, IPv4, NANP-style phone), not a
    * compliance-grade detector: real pipelines extend the table; the
    * operator shape (ordered regex chain + per-pattern counts, all
    * row-local) is what scales.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b", "<PHONE>"))

  /** Text with every [[PiiPatterns]] match replaced by its token — a
    * row-local chain of codegen'd regexp_replace calls (NULL in, NULL
    * out). Counting and redaction see the same matches by construction.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, re, tok)) =>
      regexp_replace(acc, re, tok)
    }

  /** Per-pattern match counts as (n_<name>, count) pairs, each counted on
    * the text AFTER the earlier patterns were redacted — the exact matches
    * [[redactPii]] replaces, so counts and redaction can never disagree
    * (an IP-looking run inside an email is an email, not an IP).
    */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val (_, counts) = PiiPatterns.foldLeft((text, Seq.empty[(String, Column)])) {
      case ((acc, out), (name, re, tok)) =>
        (regexp_replace(acc, re, tok),
          out :+ (s"n_$name" -> regexp_count(acc, lit(re)).cast("long")))
    }
    counts
  }

  /** Query parameters dropped by [[canonicalizeUrl]]: tracking noise that
    * makes byte-distinct URLs point at the same page. Case-insensitive
    * (query case is otherwise preserved, so `UTM_Source=` must still
    * match) and the `=` is optional (a bare `?gclid` is the same noise).
    */
  val TrackingParamRe: String =
    "(?i)^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)(=|$)"

  /** Canonical form of a URL — the standard web-corpus ingest step
    * (C4/CCNet dedup by URL before any content pass): scheme and host
    * case-fold, default ports drop (:80 on http, :443 on https),
    * fragments drop, tracking query params ([[TrackingParamRe]]) drop,
    * surviving params SORT (param order is transport noise), the empty
    * path becomes "/" and other paths lose ALL trailing slashes. Built
    * entirely from builtin string/array functions (codegen'd, and the
    * oracle replays it with the same regexes), row-local by definition.
    *
    * Honest scope: a syntactic canonicalizer — it does not resolve
    * dot-segments, decode percent-escapes, or consult redirects; http
    * and https remain DISTINCT (they can serve different content). An
    * input without a `scheme://` prefix falls back to lowercase-trim.
    */
  /** Version of the canonical-URL KEY FORMAT, stamped into persisted
    * url-dedup state (App `url-dedup --state-path`) and checked before
    * any shard fold. Bump whenever [[canonicalizeUrl]]'s output can
    * change for ANY input: state written under an older rule holds keys
    * a re-crawl will no longer produce, and urlDedupFromState would then
    * raise "page not in state" MID-JOB — the version check turns that
    * into a loud up-front "re-seed the state" error instead.
    *   v1: strip ONE trailing slash (rounds <= 12 pre-fix)
    *   v2: strip ALL trailing slashes (idempotence fix, f5c97c1 follow-up)
    */
  val UrlCanonVersion = 2

  def canonicalizeUrl(url: Column): Column = {
    val base = substring_index(trim(url), "#", 1)
    val scheme = lower(regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val path0 = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    // ALL trailing slashes strip (one pass) and an emptied path maps back
    // to "/" — stripping only one would break idempotence on ".../x//"
    // (canon of the canonical form would strip again), drifting dedup
    // keys across re-canonicalization passes
    val path1 = regexp_replace(path0, "/+$", "")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    val query0 = regexp_extract(base, "\\?(.*)$", 1)
    val params = array_join(array_sort(filter(split(query0, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))), "&")
    when(scheme === "", lower(trim(url)))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
  }
}
