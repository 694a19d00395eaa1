package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{PinnedMath, PolyHash61Impl, PolyHashImpl}

/** DSIR importance resampling: bit-exact agreement with a transparent
  * driver-side mirror of the hashed-n-gram model and the double-ln Gumbel
  * key, target-looking docs outweigh off-target ones, the sample is
  * exactly n and replayable, and a persisted model round-trips.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 64

  /** Driver-side mirror of the whole operator off the same pinned
    * primitives ([[PolyHashImpl.hash]], [[PinnedMath.lnFp]]) — exact
    * integer equality, no tolerances.
    */
  private object Mirror {
    def toks(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def feats(s: String): Seq[String] = {
      val t = toks(s)
      t ++ t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Long =
      PolyHashImpl.hash(f.getBytes("UTF-8")) % B
    def counts(docs: Seq[String]): Map[Long, Long] =
      docs.flatMap(feats).map(bucket).groupBy(identity)
        .map { case (b, o) => b -> o.size.toLong }

    case class Model(dw: Map[Long, Long], base: Long)
    def train(target: Seq[String], raw: Seq[String]): Model = {
      val cp = counts(target); val cq = counts(raw)
      val dw = (cp.keySet ++ cq.keySet).map { b =>
        b -> (PinnedMath.lnFp(cp.getOrElse(b, 0L) + 1) -
          PinnedMath.lnFp(cq.getOrElse(b, 0L) + 1))
      }.toMap
      Model(dw, PinnedMath.lnFp(cq.values.sum + B) -
        PinnedMath.lnFp(cp.values.sum + B))
    }
    def logw(m: Model, text: String): (Long, Long) = {
      val fs = feats(text)
      (fs.size.toLong,
        fs.map(f => m.dw.getOrElse(bucket(f), 0L)).sum + fs.size * m.base)
    }
    def key(m: Model, text: String): Long = {
      val h = PolyHash61Impl.hash(text.getBytes("UTF-8"))
      val g1 = math.max(PinnedMath.LnFp2Pow61 - PinnedMath.lnFp(h + 1), 1L)
      logw(m, text)._2 + PinnedMath.lnFp(PinnedMath.FpScale) - PinnedMath.lnFp(g1)
    }
  }

  private val targetTexts = Seq(
    "clean factual prose about science and history",
    "careful writing about science with clear structure")
  private val offTexts = Seq(
    "buy now click here spam offer deal",
    "click click buy buy now now spam")
  private val corpus = Seq(
    (1L, targetTexts.head), (2L, targetTexts(1)),
    (3L, offTexts.head), (4L, offTexts(1)),
    (5L, "prose about science"),          // target-leaning
    (6L, "spam deal now"),                // off-target
    (7L, "zyzzyva qwerty unseen tokens"), // OOV-ish: base constant only
    (8L, "")                              // token-less
  ).toDF("doc_id", "text")

  private def model = Dsir.trainModel(
    corpus.filter(col("doc_id") <= 2L), corpus, buckets = B)

  test("logWeights agrees bit-for-bit with the driver-side pinned mirror") {
    val m = Mirror.train(targetTexts, corpus.select("text").as[String].collect().toSeq)
    val out = Dsir.logWeights(corpus, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    corpus.as[(Long, String)].collect().foreach { case (id, text) =>
      withClue(s"doc $id:") { out(id) shouldBe Mirror.logw(m, text) }
    }
    out(8L) shouldBe (0L, 0L)
  }

  test("target-looking docs outweigh off-target docs; target-unseen docs score negative") {
    val out = Dsir.logWeights(corpus, model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every target-vocabulary doc above every spam doc
    Seq(1L, 2L, 5L).map(out).min should be > Seq(3L, 4L, 6L).map(out).max
    // a doc sharing no vocabulary with the target is penalized: each of
    // its features is raw-seen but target-unseen (ln1 - ln(cq+1) < 0)
    out(7L) should be < 0L
    out(7L) should be < Seq(1L, 2L, 5L).map(out).min
  }

  test("resample: Gumbel keys match the mirror; exactly n selected; replayable") {
    val m = Mirror.train(targetTexts, corpus.select("text").as[String].collect().toSeq)
    def run() = Dsir.resample(corpus, model, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
    val out = run()
    out.map(t => t._1 -> t._2).toMap.foreach { case (id, k) =>
      val text = corpus.filter(col("doc_id") === id).select("text").as[String].head()
      withClue(s"doc $id key:") { k shouldBe Mirror.key(m, text) }
    }
    out.count(_._3) shouldBe 3
    // the flag reproduces the rank: selected == top-3 by (key desc, id)
    val expect = out.sortBy(t => (-t._2, t._1)).take(3).map(_._1).toSet
    out.filter(_._3).map(_._1).toSet shouldBe expect
    run().toSet shouldBe out.toSet
  }

  test("one-pass resampleFromCorpus equals the composed trainModel + resample exactly") {
    val composed = Dsir.resample(corpus, model, n = 3).collect().toSet
    Dsir.resampleFromCorpus(corpus, col("doc_id") <= 2L, n = 3, buckets = B)
      .collect().toSet shouldBe composed
  }

  test("persisted model round-trips: parquet write/read scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    val m = model
    m.bucketLn.write.parquet(s"$dir/bucket")
    m.baseLn.write.parquet(s"$dir/base")
    val loaded = Dsir.DsirModel(
      spark.read.parquet(s"$dir/bucket"), spark.read.parquet(s"$dir/base"), B)
    Dsir.resample(corpus, loaded, n = 3).collect().toSet shouldBe
      Dsir.resample(corpus, m, n = 3).collect().toSet
  }

  test("n larger than the corpus selects everything; n must be positive") {
    Dsir.resample(corpus, model, n = 100)
      .filter(col("selected")).count() shouldBe 8L
    an[IllegalArgumentException] should be thrownBy
      Dsir.resample(corpus, model, n = 0)
  }
}
