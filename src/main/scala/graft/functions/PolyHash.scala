package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.SparkException
import org.apache.spark.unsafe.types.UTF8String

/** Shared implementation for [[PolyHash]]'s eval and generated code — a
  * standalone object so the static forwarder `PolyHashImpl.hash(byte[])` is
  * directly callable from janino-generated Java.
  */
object PolyHashImpl {
  /** Decode UTF-8 code points and left-fold
    * `acc = (acc * 131 + codePoint) % (1e9+7)`; empty input -> 0. The code
    * point per character is exactly what Spark's `ascii` returns on the
    * 1-char substring, so this reproduces the HOF fold byte-for-byte.
    */
  def hash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xE0) { cp = b0 & 0x1F; len = 2 }
      else if (b0 < 0xF0) { cp = b0 & 0x0F; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < n) {
        cp = (cp << 6) | (bytes(i + k) & 0x3F)
        k += 1
      }
      acc = (acc * TextFunctions.HashBase + cp) % TextFunctions.HashMod
      i += len
    }
    acc
  }
}

/** Native codegen'd polynomial rolling hash of a string:
  * `fold c in chars(s): acc = (acc * 131 + ascii(c)) % (1e9+7)`, empty -> 0.
  *
  * Bit-identical to the interpreted HOF fold it replaces
  * ([[TextFunctions.polyHashHof]]'s `aggregate(sequence(1, length(s)))` over
  * `ascii(substr(s, i, 1))`) and to the DuckDB oracle twin — Spark 4's
  * `ascii` yields the Unicode CODE POINT of the first character, so the fold
  * decodes UTF-8 code points (see [[PolyHashImpl.hash]]).
  *
  * Why native: the HOF fold evaluates one interpreted lambda frame per
  * CHARACTER — the dominant cost of the shingle/minhash dedup pipelines
  * (round-1 bench: q25 at 50s, ~3x recomputed). This loop runs inside
  * whole-stage codegen.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    PolyHashImpl.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PolyHashImpl.hash($a.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {

  /** DSL entry: `polyHash(s)` as a Column. */
  def polyHash(s: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(s)))

  private val info = new ExpressionInfo(classOf[PolyHash].getName, "poly_hash")
  private val builder = (exprs: Seq[Expression]) => {
    if (exprs.length != 1) {
      throw new SparkException("poly_hash takes exactly 1 argument")
    }
    PolyHash(exprs.head)
  }

  /** SQL registration for an existing session: `SELECT poly_hash(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("poly_hash"), info, builder)
}
