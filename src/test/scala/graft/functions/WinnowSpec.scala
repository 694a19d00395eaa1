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

  test("common extent: hand-computed, collision guard, edges, equals the spine predicate") {
    import graft.functions.CommonExtent.commonExtent
    def extent(a: String, pa: Int, b: String, pb: Int, k: Int = 3): Int =
      Seq((a, pa, b, pb)).toDF("a", "pa", "b", "pb")
        .select(commonExtent(col("a"), col("pa"), col("b"), col("pb"), k)).head().getInt(0)
    //      123456789012345          123456789012
    extent("xxABCDEFyy", 3, "zzzABCDEFw", 4) shouldBe 6   // ABCDEF both sides
    extent("ABC", 1, "ABC", 1) shouldBe 3                  // whole-string run
    extent("xxABCyy", 3, "ABQzz", 1) shouldBe 0            // anchor mismatch -> 0
    extent("xABCx", 2, "yABCy", 2) shouldBe 3              // distinct flanks stop both sides
    extent("AB", 1, "ABC", 1) shouldBe 0                   // k=3 gram off the end -> 0
    // equivalence with the offset-spine EXISTS (the oracle's form): for a
    // planted pair, extent >= L iff some aligned L-window matches
    val k = 16; val L = 48; val w = L - k + 1
    val quote = "a shared verbatim passage exactly long enough yes!"  // 50 chars
    val a = s"prefix one $quote suffix alpha"
    val b = s"other beginning text $quote different tail"
    val pa = a.indexOf(quote) + 1 + 10 // anchor 10 chars into the quote
    val pb = b.indexOf(quote) + 1 + 10
    val viaExtent = extent(a, pa, b, pb, k) >= L
    val viaSpine = (0 until w).exists { d =>
      val (sa, sb) = (pa - d, pb - d)
      sa >= 1 && sb >= 1 && sa + L - 1 <= a.length && sb + L - 1 <= b.length &&
        a.substring(sa - 1, sa - 1 + L) == b.substring(sb - 1, sb - 1 + L)
    }
    viaExtent shouldBe true
    viaSpine shouldBe viaExtent
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
