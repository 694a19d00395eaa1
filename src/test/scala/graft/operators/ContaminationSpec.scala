package graft.operators

import graft.SparkTestBase

/** Contamination check: verbatim n-gram overlap against a benchmark set. */
class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val benchmark = Seq(
    (900L, "the quick brown fox jumps over the lazy dog"),
    (901L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  test("a doc quoting the benchmark is flagged; disjoint text is clean") {
    val train = Seq(
      // contains the benchmark 3-gram "quick brown fox" (and more)
      (1L, "we saw the quick brown fox jumps again"),
      // shares words but no 3-token window
      (2L, "brown dog and lazy fox sleep quietly"),
      // fully disjoint vocabulary
      (3L, "completely unrelated sentence about spark plans")
    ).toDF("doc_id", "text")
    val out = Contamination.check(train, benchmark).orderBy("doc_id")
      .select("doc_id", "n_shared", "contaminated")
      .as[(Long, Long, Int)].collect().toSeq
    out.map(_._1) shouldBe Seq(1L, 2L, 3L)
    out(0)._2 should be > 0L
    out(0)._3 shouldBe 1
    out(1) shouldBe ((2L, 0L, 0))
    out(2) shouldBe ((3L, 0L, 0))
  }

  test("an exact copy of a benchmark doc shares every shingle (ratio 1.0)") {
    val train = Seq((5L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val row = Contamination.check(train, benchmark).head()
    row.getAs[Long]("n_shared") shouldBe row.getAs[Long]("n_shingles")
    row.getAs[Double]("share_ratio") shouldBe 1.0
    row.getAs[Int]("contaminated") shouldBe 1
  }

  test("short docs (no full n-gram) are excluded from the report") {
    val train = Seq((7L, "two words"), (8L, "one two three"))
      .toDF("doc_id", "text")
    val ids = Contamination.check(train, benchmark)
      .select("doc_id").as[Long].collect().toSet
    ids shouldBe Set(8L) // doc 7 has < 3 tokens -> no shingles -> no row
  }

  test("crossSplitCheck flags a planted near-dup straddling train and a holdout split") {
    import org.apache.spark.sql.functions.col
    // near-dups: a shared core sentence plus a varying suffix. Split
    // membership is a pure function of the text hash, so probe suffixes
    // until one variant lands in train and another in val/test — the
    // straddle assignSplit's scaladoc warns about.
    val core = "large scale training corpora require careful deduplication before splitting"
    val candidates = (0 until 64)
      .map(i => (100L + i, s"$core variant$i"))
      .toDF("doc_id", "text")
    val bySplit = Sampling.assignSplit(candidates, "text")
      .select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    val trainId = bySplit.collectFirst { case (id, "train") => id }.get
    val holdoutId = bySplit.collectFirst { case (id, s) if s != "train" => id }.get
    val docs = candidates.filter(col("doc_id").isin(trainId, holdoutId)) // the straddling pair
      .union(Seq((1L, "completely unrelated filler text about catalyst plans")).toDF("doc_id", "text"))
    val rows = Contamination.crossSplitCheck(docs)
      .as[(Long, Long, Long, Double, Int)].collect().map(r => r._1 -> r).toMap
    // only train-split docs are reported
    rows.keySet should contain(trainId)
    rows.keySet should not contain holdoutId
    // the planted pair shares the core sentence's shingles
    withClue(s"train=$trainId holdout=$holdoutId: ") {
      rows(trainId)._3 should be > 0L
      rows(trainId)._5 shouldBe 1
    }
  }

  test("substringContamination: a verbatim benchmark quote inside a long page, exact extent") {
    import org.apache.spark.sql.functions.col
    // 60-char benchmark answer string quoted verbatim inside a long train
    // doc; the rest of the page is unrelated, so the token-shingle
    // share_ratio is tiny — but the quote is a leak, and the substring
    // check reports its exact character extent
    val answer = "the capital of the ancient empire was moved in the year 330."
    // diverse filler: repeated filler would collapse to a handful of
    // distinct shingles and inflate the ratio this test wants diluted
    val page = s"${(1 to 120).map(i => s"filler$i").mkString(" ")} $answer " +
      (121 to 200).map(i => s"tail$i").mkString(" ")
    val train = Seq((1L, page), (2L, "a totally clean training document"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"question about history? $answer"))
      .toDF("doc_id", "text")
    val out = Contamination.substringContamination(train, bench)
      .as[(Long, Long, Long, Long)].collect()
    out.map(_._1).toSet shouldBe Set(1L)
    val (_, nBench, nAnchors, maxExtent) = out.head
    nBench shouldBe 1L
    nAnchors should be >= 1L
    // extent = the quote plus the one shared leading space
    maxExtent shouldBe (answer.length + 1L)
    // the shingle-ratio view of the same leak: present but diluted
    val ratio = Contamination.check(train, bench)
      .filter(col("doc_id") === 1L).select("share_ratio").as[Double].head()
    ratio should be < 0.1
    // clean corpus -> empty result
    Contamination.substringContamination(
      train.filter(col("doc_id") === 2L), bench).count() shouldBe 0L
  }

  test("fuzzyContamination: paraphrase-grade near-dup flagged, argmax deterministic, clean docs absent") {
    import org.apache.spark.sql.functions.col
    val core = (1 to 40).map(i => s"token$i").mkString(" ")
    val bench = Seq(
      (100L, core),                                    // the leaked page
      (101L, core),                                    // byte-identical twin: argmax tie -> min id
      (102L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val train = Seq(
      // ~90% of shingles shared with 100/101 (paraphrased tail)
      (1L, (1 to 36).map(i => s"token$i").mkString(" ") + " changed tail here now"),
      // exact copy: jaccard 1.0
      (2L, core),
      // disjoint
      (3L, (1 to 40).map(i => s"clean$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Contamination.fuzzyContamination(train, bench, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(2L)._2 shouldBe 1.0
    out(2L)._1 shouldBe 2L        // matches both identical benchmark docs
    out(2L)._3 shouldBe 100L      // tie at jaccard 1.0 -> smallest id
    out(1L)._2 should (be >= 0.5 and be < 1.0)
    // threshold knob: at 0.99 only the exact copy survives
    Contamination.fuzzyContamination(train, bench, threshold = 0.99)
      .select("doc_id").as[Long].collect().toSet shouldBe Set(2L)
  }

  test("benchmarkLeakReport: per-item leak counts, worst offender, clean items keep zero rows") {
    // bench item 1: "alpha beta gamma delta" -> 3-gram shingles
    //   {abc-like: (alpha beta gamma), (beta gamma delta)} = 2 shingles
    // train 10 quotes the full item (shares both), train 11 quotes only
    // the first 3-gram (shares 1), train 12 is disjoint
    // bench item 2 is fully clean
    val bench = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "omicron sigma tau upsilon")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "intro alpha beta gamma delta outro filler words here"),
      (11L, "quote alpha beta gamma end of line"),
      (12L, "completely unrelated training content")).toDF("doc_id", "text")
    val out = Contamination.benchmarkLeakReport(train, bench)
      .as[(Long, Long, Long, Double, Long, Option[Long], Long)]
      .collect().sortBy(_._1)
    out.length shouldBe 2
    val (id1, nSh1, nLk1, ratio1, nDocs1, top1, topN1) = out(0)
    (id1, nSh1, nLk1, nDocs1, top1, topN1) shouldBe ((1L, 2L, 2L, 2L, Some(10L), 2L))
    ratio1 shouldBe 1.0
    out(1) shouldBe ((2L, 2L, 0L, 0.0, 0L, None, 0L))
    // offender ties break to the LOWEST train id: make 11 share both too
    val train2 = train.union(Seq(
      (9L, "also alpha beta gamma delta verbatim")).toDF("doc_id", "text"))
    val top = Contamination.benchmarkLeakReport(train2, bench)
      .filter($"doc_id" === 1L).select("top_offender_id").as[Long].head()
    top shouldBe 9L
  }
}
