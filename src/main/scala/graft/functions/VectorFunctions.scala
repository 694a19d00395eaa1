package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built on
  * Spark's codegen'd higher-order functions (`zip_with` + `aggregate`) — no
  * UDFs, no driver round-trips.
  *
  * All arithmetic is pinned to double precision with a left-fold summation
  * order, so results are bit-identical across engines (the DuckDB oracle
  * folds the same way); IEEE-754 determinism means similarity thresholds and
  * top-k cuts can't flip between Spark and the oracle.
  *
  * Scale notes (100 TB): these expressions are row-local and run map-side.
  * The pairwise operators built on top ([[graft.operators.SimilaritySearch]])
  * control the quadratic term via broadcast query sets (brute-force top-k)
  * or sign-LSH band buckets (candidate generation), never an unbounded
  * shuffle-side cross product.
  */
object VectorFunctions {

  /** Cast an `array<float>` to `array<double>` once, up front — all math is
    * then double-only (float32 intermediate rounding would diverge from any
    * SQL oracle).
    */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product: sum_i a_i * b_i, summed in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double vectors (NaN when either norm is 0). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH band key: the sign bits of 8 consecutive dimensions, rendered
    * as an 8-char '0'/'1' string — or NULL when the vector is shorter than
    * the band's dimension range. Null keys never satisfy an equi-join, so a
    * band that falls off the end of the vector contributes no candidates;
    * without the guard every short vector would share a degenerate
    * all-zeros key and the candidate join would silently turn into the
    * all-pairs cross product the banding exists to avoid.
    *
    * Vectors agreeing on any (in-range) band are candidate neighbors.
    * Axis-aligned hyperplanes keep the key oracle-expressible; a production
    * variant rotates by a seeded random matrix first (same plan shape,
    * map-side projection then this key).
    */
  def signBandKey(v: Column, band: Int, width: Int = 8): Column =
    when(size(v) >= (band + 1) * width,
      concat_ws("", (1 to width).map { i =>
        when(element_at(v, band * width + i) > 0, lit("1")).otherwise(lit("0"))
      }: _*))
}
