package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** One-call SQL registration for every native expression — the §2.8 "SQL
  * entry point" surface: a `spark.sql` user gets the same codegen'd
  * kernels the DataFrame operators use, under stable lowercase names.
  * [[graft.PlatformProvider]] calls this for every session it builds, so
  * the CLI and serving paths can be driven entirely from SQL.
  *
  * Idempotent: re-registration just overwrites the same builder.
  */
object SqlFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def register(spark: SparkSession, name: String, clazz: Class[_],
                       arity: Set[Int], builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        require(arity.contains(exprs.length),
          s"$name takes ${arity.toSeq.sorted.mkString(" or ")} arguments, got ${exprs.length}")
        builder(exprs)
      })

  def registerAll(spark: SparkSession): Unit = {
    PolyHash.register(spark)       // poly_hash(s)
    PolyHash61.register(spark)     // poly_hash61(s)
    VecDotProduct.register(spark)  // vec_dot(a, b)
    register(spark, "text_stats", classOf[TextStats], Set(1),
      es => TextStats(es.head))
    register(spark, "rep_stats", classOf[RepStats], Set(1),
      es => RepStats(es.head))
    register(spark, "minhash_signature", classOf[MinHashSignature], Set(1),
      es => MinHashSignature(es.head))
    register(spark, "sorted_intersect_count", classOf[SortedIntersectCount], Set(2),
      es => SortedIntersectCount(es.head, es(1)))
    register(spark, "shingle_hashes", classOf[ShingleHashes], Set(2),
      es => ShingleHashes(es.head, intLit(es(1), "shingle_hashes", "n")))
    register(spark, "simhash", classOf[SimHash], Set(1, 2),
      es => if (es.length == 1) SimHash(es.head)
            else SimHash(es.head, intLit(es(1), "simhash", "bits")))
    register(spark, "char_ngram_hash_buckets", classOf[CharNgramHashBuckets], Set(3),
      es => CharNgramHashBuckets(es.head,
        intLit(es(1), "char_ngram_hash_buckets", "n"),
        intLit(es(2), "char_ngram_hash_buckets", "buckets")))
    // redact_pii(s): the same ordered RegExpReplace chain
    // TextFunctions.redactPii composes — built directly as catalyst
    // expressions so the SQL surface shares one source of truth
    // (PiiPatterns) with the DataFrame operator
    register(spark, "redact_pii",
      classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace], Set(1),
      es => TextFunctions.PiiPatterns.foldLeft(es.head) { case (acc, (_, re, tok)) =>
        org.apache.spark.sql.catalyst.expressions.RegExpReplace(
          acc, Literal(re), Literal(tok))
      })
  }
}
