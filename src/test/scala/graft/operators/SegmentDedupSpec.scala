package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Segment-level dedup: first-occurrence keeper rule, in-order document
  * reassembly, survival of fully-deduped documents, and conservation
  * invariants on the real corpus.
  */
class SegmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("boilerplate repeated across docs survives only in its first doc") {
    val docs = Seq(
      (1L, "COOKIE BANNER\n\nreal content one"),
      (2L, "COOKIE BANNER\n\nreal content two"),
      (3L, "real content three\n\nCOOKIE BANNER"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs).orderBy("doc_id")
      .select("doc_id", "n_segments", "n_kept", "text_dedup")
      .as[(Long, Long, Long, String)].collect()
    out(0) shouldBe ((1L, 2L, 2L, "COOKIE BANNER\n\nreal content one"))
    out(1) shouldBe ((2L, 2L, 1L, "real content two"))
    out(2) shouldBe ((3L, 2L, 1L, "real content three"))
  }

  test("a doc whose every segment appeared earlier survives with empty text") {
    val docs = Seq(
      (1L, "a\n\nb"),
      (2L, "b\n\na")) // both segments already kept under doc 1
      .toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs).orderBy("doc_id")
      .select("doc_id", "n_kept", "n_dropped", "text_dedup")
      .as[(Long, Long, Long, String)].collect()
    out(0) shouldBe ((1L, 2L, 0L, "a\n\nb"))
    out(1) shouldBe ((2L, 0L, 2L, ""))
  }

  test("within-doc duplicate segments keep only the first position") {
    val docs = Seq((1L, "x\n\ny\n\nx\n\nz")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs)
      .select("n_segments", "n_kept", "text_dedup")
      .as[(Long, Long, String)].head()
    out shouldBe ((4L, 3L, "x\n\ny\n\nz"))
  }

  test("keeper choice orders by (doc_id, pos), not physical row order") {
    // present doc 2 first in the input; doc 1 must still win the segment
    val docs = Seq((2L, "dup"), (1L, "dup")).toDF("doc_id", "text")
    val kept = Dedup.dedupSegments(docs)
      .filter(col("n_kept") > 0).select("doc_id").as[Long].collect()
    kept shouldBe Array(1L)
  }

  test("regex metacharacters in the delimiter are literal") {
    val docs = Seq((1L, "a|+|b"), (2L, "b|+|c")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs, delimiter = "|+|").orderBy("doc_id")
      .select("text_dedup").as[String].collect()
    out shouldBe Array("a|+|b", "c")
  }

  test("conservation on the real corpus: every doc row survives; kept + dropped = segments") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.dedupSegments(docs, delimiter = " the ")
    out.count() shouldBe docs.count()
    out.filter(col("n_kept") + col("n_dropped") =!= col("n_segments")).count() shouldBe 0L
    // global first-occurrence rule: the union of kept segments over the
    // output equals the distinct segment population of the input
    val keptSegs = out.filter(col("n_kept") > 0)
      .select(explode(split(col("text_dedup"),
        java.util.regex.Pattern.quote(" the "))).as("seg"))
      .distinct().count()
    val allSegs = docs
      .select(explode(split(col("text"),
        java.util.regex.Pattern.quote(" the "))).as("seg"))
      .distinct().count()
    keptSegs shouldBe allSegs
  }

  test("guard rejects an empty delimiter") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.dedupSegments(docs, delimiter = "")
  }

  test("incremental == full recompute restricted to the new shard (real corpus)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stored = docs.filter(col("doc_id") <= 250)
    val shard = docs.filter(col("doc_id") > 250)
    val incr = Dedup.dedupSegmentsIncremental(shard,
        Dedup.segmentState(stored, delimiter = " the "), delimiter = " the ")
      .collect().map(_.toSeq).toSet
    val full = Dedup.dedupSegments(docs, delimiter = " the ")
      .filter(col("doc_id") > 250)
      .collect().map(_.toSeq).toSet
    incr shouldBe full
  }

  test("chained increments with state appends stay equivalent to one full pass") {
    val docs = Seq(
      (1L, "banner\n\none"), (2L, "banner\n\ntwo"),
      (3L, "two\n\nthree"), (4L, "three\n\nbanner\n\nfour"))
      .toDF("doc_id", "text")
    def shard(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") <= hi)
    // shard 1 initializes; shards 2 and 3 append increments
    var state = Dedup.segmentState(shard(1, 1))
    val out2 = Dedup.dedupSegmentsIncremental(shard(2, 3), state)
    state = state.unionByName(Dedup.incrementSegmentState(shard(2, 3), state))
    val out3 = Dedup.dedupSegmentsIncremental(shard(4, 4), state)
    val full = Dedup.dedupSegments(docs)
    val got = (out2.unionByName(out3)).collect().map(_.toSeq).toSet
    val exp = full.filter(col("doc_id") >= 2).collect().map(_.toSeq).toSet
    got shouldBe exp
    // the state after two appends covers exactly the distinct segments of docs 1-3
    state.count() shouldBe 4L // banner, one, two, three
  }
}
