package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.functions.WinnowFingerprints.winnowFingerprints

/** The winnowing kernel against a transparent brute-force reference: same
  * selections, the published guarantee (a shared substring of length
  * >= w + k - 1 yields a common fingerprint hash), and the short-doc /
  * null edges.
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force reference: hash every k-gram with the house polynomial
    * fold over code points, then for every window of w grams take the
    * minimal (hash, rightmost-pos) — no deque, no encoding tricks.
    */
  private def reference(s: String, k: Int, w: Int): Seq[(Long, Int)] = {
    val cps = s.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams < w) return Seq.empty
    val h = (0 until nGrams).map { i =>
      (0 until k).foldLeft(0L)((acc, j) =>
        (acc * TextFunctions.HashBase + cps(i + j)) % TextFunctions.HashMod)
    }
    (w - 1 until nGrams).map { e =>
      val window = (e - w + 1) to e
      val minH = window.map(h).min
      val pos = window.filter(i => h(i) == minH).max // rightmost tie-break
      (h(pos), pos + 1)
    }.distinct.sortBy(_._2)
  }

  private def kernel(s: String, k: Int, w: Int): Seq[(Long, Int)] =
    Seq(s).toDF("t")
      .select(winnowFingerprints(col("t"), k, w).as("fp")).head()
      .getSeq[Row](0).map(r => (r.getLong(0), r.getInt(1)))

  test("kernel == brute-force reference on random strings") {
    val doc = Gen.listOfN(120, Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString)
    (1 to 30).foreach { i =>
      val s = sample(doc, 7L + i)
      withClue(s"doc '$s':")(kernel(s, 5, 8) shouldBe reference(s, 5, 8))
    }
  }

  test("kernel == reference on unicode, repeats, and boundary lengths") {
    val docs = Seq(
      "héllo wörld héllo wörld héllo wörld again and again",
      "aaaaaaaaaaaaaaaaaaaaaaaa",        // all ties: rightmost wins per window
      "abcdefgh", "abcdefghi",            // exactly w grams / one more
      "日本語のテキストの重複検出テスト日本語のテキスト")
    docs.foreach { s =>
      withClue(s"doc '$s':")(kernel(s, 4, 5) shouldBe reference(s, 4, 5))
    }
  }

  test("guarantee: docs sharing a >= w+k-1 passage share a fingerprint hash") {
    val passage = "the quick brown fox jumps over the lazy dog near the bank"
    val a = s"completely unrelated preamble text here $passage and some trailing words"
    val b = s"zzz other filler $passage totally different ending material xyz"
    val k = 8
    val w = passage.length - k + 1 // guarantee holds at L = passage length
    val ha = kernel(a, k, w).map(_._1).toSet
    val hb = kernel(b, k, w).map(_._1).toSet
    (ha intersect hb) should not be empty
  }

  test("short docs emit nothing; null propagates; positions are 1-based and sorted") {
    kernel("tiny", 3, 5) shouldBe Seq.empty
    Seq(Option.empty[String]).toDF("t")
      .select(winnowFingerprints(col("t"), 3, 5)).head().isNullAt(0) shouldBe true
    val fps = kernel("a bc def ghij klmno pqrstu vwxyz 0123456789", 3, 4)
    fps.map(_._2) shouldBe fps.map(_._2).sorted
    all(fps.map(_._2)) should be >= 1
  }
}
