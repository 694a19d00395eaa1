package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row token-count kernel shared by eval and generated code. One
  * instance per expression (holds the prepared stopword / marker lookup
  * sets); referenced from codegen via `addReferenceObj`.
  */
class TextStatsImpl(stopwords: Array[String], markerSets: Array[Array[String]])
    extends Serializable {

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  @transient private lazy val markers: Array[java.util.HashSet[String]] =
    markerSets.map { ws => val s = new java.util.HashSet[String](); ws.foreach(s.add); s }

  /** Tokenize (identical to [[ShingleHashesImpl]]: UTF8String.toLowerCase,
    * maximal ASCII [a-z0-9] runs) and count everything the composed HOF
    * pipeline counts, in one pass: n_tokens, n_distinct, sum of token
    * lengths, BPE-ish subword estimate (ceil(len/4) per token), stopword
    * hits, and per-language marker hits.
    */
  def eval(s: UTF8String): InternalRow = {
    val bytes = s.toLowerCase.getBytes
    val seen = new java.util.HashSet[String]()
    var nTokens = 0L
    var sumLen = 0L
    var subwords = 0L
    var nStop = 0L
    val langHits = new Array[Long](markers.length)
    TokenScan.foreachRun(bytes) { (start, end) =>
      val len = end - start
      val tok = new String(bytes, start, len, java.nio.charset.StandardCharsets.US_ASCII)
      nTokens += 1
      sumLen += len
      subwords += (len + 3) / 4
      seen.add(tok)
      if (stopSet.contains(tok)) nStop += 1
      var m = 0
      while (m < markers.length) {
        if (markers(m).contains(tok)) langHits(m) += 1
        m += 1
      }
    }
    val out = new Array[Any](5 + markers.length)
    out(0) = nTokens
    out(1) = seen.size().toLong
    out(2) = sumLen
    out(3) = subwords
    out(4) = nStop
    var m = 0
    while (m < markers.length) { out(5 + m) = langHits(m); m += 1 }
    new GenericInternalRow(out)
  }
}

/** Native one-pass token statistics: struct(n_tokens, n_distinct, sum_len,
  * est_subwords, n_stop, s_<lang>...) — the counting substrate of the
  * quality metrics (q20) and language-ID (q21) queries.
  *
  * The composed pipeline re-tokenizes per metric and evaluates interpreted
  * lambda frames per token (`aggregate` for lengths/subwords, `filter` per
  * stopword/marker list); this computes every count in a single scan of
  * the text. The ratio/score arithmetic stays in Column math downstream, so
  * outputs are bit-identical to the HOF forms (witness: TextStatsSpec).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  private val impl = new TextStatsImpl(
    TextFunctions.Stopwords.toArray,
    TextFunctions.LangMarkers.map(_._2.toArray).toArray)

  override def dataType: DataType = TextStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_stats requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    impl.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsImpl", impl, classOf[TextStatsImpl].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  /** Fixed output schema: count fields then one `s_<lang>` per marker
    * language, in [[TextFunctions.LangMarkers]] order.
    */
  val schema: StructType = StructType(
    Seq("n_tokens", "n_distinct", "sum_len", "est_subwords", "n_stop")
      .map(StructField(_, LongType, nullable = false)) ++
      TextFunctions.LangMarkers.map { case (lang, _) =>
        StructField(s"s_$lang", LongType, nullable = false)
      })

  def textStats(text: Column): Column =
    GraftColumnBridge.column(TextStats(GraftColumnBridge.expression(text)))
}
