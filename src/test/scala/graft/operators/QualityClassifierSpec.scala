package graft.operators

import graft.SparkTestBase
import graft.functions.PinnedMath

/** NB log-odds: agrees with a transparent driver-side model built from
  * the same pinned-ln mirror (exact integer equality, not a tolerance),
  * separates planted classes, routes OOV through the prior+per-token
  * constant, and keeps token-less docs alive on the prior alone.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val pos = Seq(
    (101L, "good clean prose with meaning"),
    (102L, "clean writing with good structure")
  ).toDF("doc_id", "text")
  private val neg = Seq(
    (201L, "spam spam buy now click"),
    (202L, "click here buy spam now now")
  ).toDF("doc_id", "text")

  /** Driver-side mirror of the operator's math, off [[PinnedMath.lnFp]]
    * (the same integer series both engines run) — bit-exact, no floats.
    */
  private def referenceLogOdds(posSeed: Seq[String], negSeed: Seq[String],
                               scored: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tfp = posSeed.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val tfn = negSeed.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val vocab = tfp.keySet ++ tfn.keySet
    val perTok = PinnedMath.lnFp(tfn.values.sum + vocab.size) -
      PinnedMath.lnFp(tfp.values.sum + vocab.size)
    val prior = PinnedMath.lnFp(posSeed.size.toLong) -
      PinnedMath.lnFp(negSeed.size.toLong)
    scored.map { case (id, text) =>
      val ts = toks(text)
      val s = ts.map { w =>
        if (vocab.contains(w))
          PinnedMath.lnFp(tfp.getOrElse(w, 0L) + 1) -
            PinnedMath.lnFp(tfn.getOrElse(w, 0L) + 1)
        else 0L
      }.sum
      id -> (ts.size.toLong, prior + ts.size * perTok + s)
    }.toMap
  }

  test("bit-exact agreement with the driver-side pinned-ln model; classes separate") {
    val scored = Seq(
      (1L, "good clean meaning"),          // pure positive words
      (2L, "buy spam click now"),          // pure negative words
      (3L, "good spam"),                   // mixed
      (4L, "zyzzyva qwerty"),              // fully OOV: prior + constants only
      (5L, "")                             // token-less: prior alone
    )
    val out = QualityClassifier.nbLogOdds(
      scored.toDF("doc_id", "text"), pos, neg)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val ref = referenceLogOdds(
      Seq("good clean prose with meaning", "clean writing with good structure"),
      Seq("spam spam buy now click", "click here buy spam now now"),
      scored)
    ref.foreach { case (id, (n, lo)) =>
      withClue(s"doc $id:") {
        out(id)._1 shouldBe n
        out(id)._2 shouldBe lo
        out(id)._3 shouldBe (if (lo > 0) 1 else 0)
      }
    }
    out(1L)._3 shouldBe 1
    out(2L)._3 shouldBe 0
    out(5L)._1 shouldBe 0L // token-less doc survives, scored on the prior
  }

  test("partition-order invariance: integer sums make the score deterministic") {
    val scored = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "good clean meaning spam" else "buy click good now"))
    val df1 = scored.toDF("doc_id", "text").repartition(1)
    val df8 = scored.toDF("doc_id", "text").repartition(8)
    val a = QualityClassifier.nbLogOdds(df1, pos, neg)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = QualityClassifier.nbLogOdds(df8, pos, neg)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    a shouldBe b
  }
}
