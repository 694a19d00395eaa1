package graft.functions

/** Engine-portable transcendental math as GENERATED SQL steps — the
  * cross-engine parity trick behind the HLL's linear-counting correction
  * ([[graft.operators.Sketches]]), factored out for reuse: libm `ln`
  * results differ between engines in the last ulp, so both sides instead
  * evaluate the SAME pinned series over the same exact inputs — every
  * operation a single IEEE op with one correct answer, so the doubles are
  * bit-identical wherever they run.
  *
  * `ln(x)` for a positive integer-valued expression:
  *   1. range-reduce: k = floor(log2(x)) via a descending CASE over exact
  *      power-of-two literals (pure integer compares), y = x / 2^k in
  *      [1, 2) — the divisor is a power of two, so the division is exact;
  *   2. atanh series: ln(y) = 2(t + t^3/3 + ... + t^13/13) with
  *      t = (y-1)/(y+1) <= 1/3 — truncation < 1.1e-8;
  *   3. ln(x) = k * ln2 + ln(y), ln2 a pinned literal.
  *
  * [[lnFpSteps]] additionally quantizes to FIXED POINT (round-half-up to
  * 1e-9 via `floor(v * 1e9 + 0.5)` — floor of identical doubles, not an
  * engine-specific round()): integer ln values make downstream SUMS
  * order-free and exactly replayable, where a float fold would be
  * partition-order-sensitive.
  */
object PinnedMath {

  /** Pinned ln(2) literal (shortest double repr) — embedded in generated
    * SQL on both engines.
    */
  val Ln2Lit: String = java.lang.Double.toString(math.log(2.0))

  /** Fixed-point scale for [[lnFpSteps]]: 1e-9 (ppb of a nat). */
  val FpScale = 1000000000L

  /** Named steps computing `${p}_ln` = ln of the positive BIGINT-valued
    * SQL expression `x` (x <= 2^62). Apply in order: each step may
    * reference earlier aliases (Spark: successive withColumn; DuckDB:
    * lateral column aliases in one SELECT). `x` is interpolated verbatim
    * into the two CASE chains — pass a simple column name or a short
    * parenthesized expression.
    */
  def lnSteps(p: String, x: String): Seq[(String, String)] = {
    val arms = 62 to 1 by -1
    val kCase = arms.map(k => s"WHEN $x >= ${1L << k} THEN $k")
      .mkString("(CASE ", " ", " ELSE 0 END)")
    val scaleCase = arms.map(k => s"WHEN $x >= ${1L << k} THEN CAST(${1L << k} AS DOUBLE)")
      .mkString("(CASE ", " ", " ELSE CAST(1 AS DOUBLE) END)")
    Seq(
      s"${p}_y" -> s"CAST($x AS DOUBLE) / $scaleCase",
      s"${p}_t" -> s"(${p}_y - CAST(1 AS DOUBLE)) / (${p}_y + CAST(1 AS DOUBLE))",
      s"${p}_t2" -> s"${p}_t * ${p}_t",
      s"${p}_t3" -> s"${p}_t2 * ${p}_t",
      s"${p}_t5" -> s"${p}_t3 * ${p}_t2",
      s"${p}_t7" -> s"${p}_t5 * ${p}_t2",
      s"${p}_t9" -> s"${p}_t7 * ${p}_t2",
      s"${p}_t11" -> s"${p}_t9 * ${p}_t2",
      s"${p}_t13" -> s"${p}_t11 * ${p}_t2",
      s"${p}_ln" -> (s"CAST($kCase AS DOUBLE) * CAST($Ln2Lit AS DOUBLE)" +
        s" + CAST(2 AS DOUBLE) * (${p}_t" +
        s" + ${p}_t3 / CAST(3 AS DOUBLE) + ${p}_t5 / CAST(5 AS DOUBLE)" +
        s" + ${p}_t7 / CAST(7 AS DOUBLE) + ${p}_t9 / CAST(9 AS DOUBLE)" +
        s" + ${p}_t11 / CAST(11 AS DOUBLE) + ${p}_t13 / CAST(13 AS DOUBLE))"))
  }

  /** [[lnSteps]] plus `${p}_lnfp`: ln quantized to BIGINT units of 1e-9
    * nats (round-half-up via floor — deterministic on both engines).
    */
  def lnFpSteps(p: String, x: String): Seq[(String, String)] =
    lnSteps(p, x) :+
      (s"${p}_lnfp" ->
        s"CAST(floor(${p}_ln * CAST($FpScale AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)")

  /** Driver-side MIRROR of the generated steps: the same IEEE operations
    * in the same association order, so results are bit-identical to what
    * either engine computes from [[lnFpSteps]] — used to embed constants
    * (a literal in both SQL texts) and as the parity witness in
    * PinnedMathSpec.
    */
  def lnFp(x: Long): Long = {
    require(x >= 1 && x <= (1L << 62), s"lnFp domain is [1, 2^62]: got $x")
    var k = 0
    var d = 62
    while (k == 0 && d >= 1) { if (x >= (1L << d)) k = d else d -= 1 }
    val scale = if (k == 0) 1.0 else (1L << k).toDouble
    val y = x.toDouble / scale
    val t = (y - 1.0) / (y + 1.0)
    val t2 = t * t
    val t3 = t2 * t
    val t5 = t3 * t2
    val t7 = t5 * t2
    val t9 = t7 * t2
    val t11 = t9 * t2
    val t13 = t11 * t2
    val ln = k.toDouble * Ln2Lit.toDouble +
      2.0 * (t + t3 / 3.0 + t5 / 5.0 + t7 / 7.0 + t9 / 9.0 + t11 / 11.0 + t13 / 13.0)
    math.floor(ln * FpScale.toDouble + 0.5).toLong
  }

  /** lnfp(2^61) — the `ln(u)` offset for a hash-uniform u = (h+1)/2^61,
    * embedded as one shared literal on both engines.
    */
  val LnFp2Pow61: Long = lnFp(1L << 61)
}
