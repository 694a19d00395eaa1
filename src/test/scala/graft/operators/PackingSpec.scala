package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sequence packing: hand-computed chunk math, and the property that makes
  * the two-phase prefix sum trustworthy — every bucketWidth produces the
  * identical assignment (the knob tunes parallelism, never results).
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk assignment matches hand-computed offsets; long docs span chunks") {
    // stream: 0 | 60 | 100 | 350 | 360 | 505 with budget 100
    val docs = Seq((1L, 60L), (2L, 40L), (3L, 250L), (4L, 10L), (5L, 145L), (6L, 30L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packChunks(docs, budget = 100L).orderBy("doc_id")
      .select("doc_id", "start_offset", "chunk_id", "chunk_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 0L, 0L, 0L),     // starts chunk 0
      (2L, 60L, 0L, 60L),
      (3L, 100L, 1L, 0L),   // 250 tokens: spans chunks 1..3 (stream semantics)
      (4L, 350L, 3L, 50L),
      (5L, 360L, 3L, 60L),
      (6L, 505L, 5L, 5L))
  }

  test("two-phase result is identical for every bucketWidth (incl. the real corpus)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), (expr("length(text)") % 97).cast("long").as("n_tokens"))
    def run(w: Long) = Packing.packChunks(docs, budget = 256L, bucketWidth = w)
      .select("doc_id", "start_offset", "chunk_id", "chunk_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ref = run(1L)   // one doc per bucket: degenerate but well-defined
    run(7L) shouldBe ref
    run(64L) shouldBe ref
    run(1000000L) shouldBe ref  // everything in one bucket = the naive window
    // and the naive single-window formulation agrees
    val naive = docs
      .withColumn("start_offset", coalesce(
        sum(col("n_tokens")).over(
          Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("start_offset"),
        floor(col("start_offset") / 256).cast("long").as("chunk_id"),
        (col("start_offset") % 256).as("chunk_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    ref shouldBe naive
  }

  test("guards reject non-positive budget and bucketWidth") {
    val docs = Seq((1L, 5L)).toDF("doc_id", "n_tokens")
    an[IllegalArgumentException] should be thrownBy Packing.packChunks(docs, budget = 0L)
    an[IllegalArgumentException] should be thrownBy
      Packing.packChunks(docs, budget = 10L, bucketWidth = 0L)
  }

  test("dirty input: string ids rejected at plan time, NULL id raises, NULL tokens = 0") {
    an[IllegalArgumentException] should be thrownBy
      Packing.packChunks(Seq(("a", 5L)).toDF("doc_id", "n_tokens"), budget = 10L)
    // a NULL id has no stream position: loud per-row failure, never a
    // silently-shifted offset
    val withNull = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(7L)))
      .toDF("doc_id", "n_tokens")
    a[Exception] should be thrownBy
      Packing.packChunks(withNull, budget = 10L).collect()
    // a NULL token count packs as zero width; the row keeps its position
    val nullTokens = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(6L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(4L)))
      .toDF("doc_id", "n_tokens")
    Packing.packChunks(nullTokens, budget = 10L).orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset")
      .as[(Long, Long, Long)].collect().toSeq shouldBe
      Seq((1L, 6L, 0L), (2L, 0L, 6L), (3L, 4L, 6L))
  }

  test("sliding windows: counts, starts, and short tails are exact") {
    val docs = Seq((1L, 0L), (2L, 50L), (3L, 96L), (4L, 97L), (5L, 224L), (6L, 225L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.slidingWindows(docs, windowTokens = 96L, strideTokens = 64L)
      .select("doc_id", "win_idx", "win_start", "win_len")
      .as[(Long, Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (2L, 0L, 0L, 50L),                       // short doc: one short window
      (3L, 0L, 0L, 96L),                       // exactly one full window
      (4L, 0L, 0L, 96L), (4L, 1L, 64L, 33L),   // one token over: overlap tail
      (5L, 0L, 0L, 96L), (5L, 1L, 64L, 96L), (5L, 2L, 128L, 96L),
      (6L, 0L, 0L, 96L), (6L, 1L, 64L, 96L), (6L, 2L, 128L, 96L), (6L, 3L, 192L, 33L))
    // doc 1 (zero tokens) emits nothing — asserted by the Set above
  }

  test("sliding windows: every window is non-empty and covers all tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "CAST(length(text) % 311 AS BIGINT) AS n_tokens")
    val wins = Packing.slidingWindows(docs, windowTokens = 96L, strideTokens = 64L)
    wins.filter("win_len <= 0 OR win_start >= n_tokens").count() shouldBe 0L
    // last window reaches the end of every doc
    wins.groupBy("doc_id", "n_tokens")
      .agg(max(col("win_start") + col("win_len")).as("covered"))
      .filter("covered <> n_tokens").count() shouldBe 0L
  }

  test("sliding windows: guards reject bad window/stride") {
    val docs = Seq((1L, 5L)).toDF("doc_id", "n_tokens")
    an[IllegalArgumentException] should be thrownBy
      Packing.slidingWindows(docs, windowTokens = 0L, strideTokens = 1L)
    an[IllegalArgumentException] should be thrownBy
      Packing.slidingWindows(docs, windowTokens = 10L, strideTokens = 11L)
    an[IllegalArgumentException] should be thrownBy
      Packing.slidingWindows(docs, windowTokens = 10L, strideTokens = 0L)
  }

  test("truncate to budget: short docs untouched, long docs cut to exactly N") {
    val docs = Seq(
      (1L, "one two three"),
      (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val out = Packing.truncateToBudget(docs, maxTokens = 5).orderBy("doc_id")
      .select("n_tokens", "n_kept", "truncated", "text_trunc")
      .as[(Long, Long, Int, String)].collect()
    out(0) shouldBe ((3L, 3L, 0, "one two three"))
    out(1) shouldBe ((7L, 5L, 1, "a b c d e"))
    an[IllegalArgumentException] should be thrownBy
      Packing.truncateToBudget(docs, maxTokens = 0)
  }

  test("length buckets: hand-computed batches and padding waste; zero-token docs drop") {
    val docs = Seq(3L, 5L, 15L, 17L, 20L, 31L, 0L).map(Tuple1(_)).toDF("n_tokens")
    val out = Packing.lengthBucketReport(docs, "n_tokens", bucketWidth = 16L, batchSize = 2L)
      .orderBy("bucket")
      .select("bucket", "bucket_lo", "bucket_hi", "n_docs", "sum_tokens",
        "max_tokens", "n_batches", "padding_waste", "waste_pct")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Double)].collect()
    // bucket 0: docs 3,5,15 -> max 15, waste 3*15-23 = 22
    out(0) shouldBe ((0L, 0L, 15L, 3L, 23L, 15L, 2L, 22L, 0.488889))
    // bucket 1: docs 17,20,31 -> max 31, waste 93-68 = 25
    out(1) shouldBe ((1L, 16L, 31L, 3L, 68L, 31L, 2L, 25L, 0.268817))
    out should have length 2 // the zero-token doc emits nothing
    an[IllegalArgumentException] should be thrownBy
      Packing.lengthBucketReport(docs, "n_tokens", 0L, 2L)
    an[IllegalArgumentException] should be thrownBy
      Packing.lengthBucketReport(docs, "n_tokens", 16L, 0L)
  }

  test("truncate to budget: corpus invariants — n_kept = min(n, N), re-cut is idempotent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Packing.truncateToBudget(docs, maxTokens = 32)
    out.filter(col("n_kept") =!=
      least(col("n_tokens"), lit(32L))).count() shouldBe 0L
    out.filter(col("truncated") === 0 && col("n_tokens") > 32).count() shouldBe 0L
    // cutting the already-cut text changes nothing
    val twice = Packing.truncateToBudget(
      out.select(col("doc_id"), col("text_trunc").as("text")), maxTokens = 32)
    twice.filter(col("truncated") =!= 0).count() shouldBe 0L
    twice.select(sum(col("n_tokens"))).as[Long].head() shouldBe
      out.select(sum(col("n_kept"))).as[Long].head()
  }

  test("greedy token counts: hand-computed longest-match, fallback, and bounded-fold leftover") {
    val pieces = Seq("ab", "abc", "de").toDF("piece")
    val docs = Seq(
      (1L, "abcde abcab"),   // abc+de = 2; abc+ab = 2
      (2L, "xyz"),           // no piece matches: 3 single-char fallbacks
      (3L, "abcx de"),       // abc+x = 2; de = 1
      (4L, "..."),           // tokenizes to nothing: row survives as 0/0
      (5L, "x" * 30))        // 24 fold steps + 6 leftover chars = 30
      .toDF("doc_id", "text")
    val out = Packing.greedyTokenCounts(docs, pieces)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    out(0) shouldBe ((1L, 2L, 4L))
    out(1) shouldBe ((2L, 1L, 3L))
    out(2) shouldBe ((3L, 2L, 3L))
    out(3) shouldBe ((4L, 0L, 0L))
    out(4) shouldBe ((5L, 1L, 30L))
    // longest match wins over first match: "abc" consumed over "ab"
    val one = Packing.greedyTokenCounts(
      Seq((9L, "abcabc")).toDF("doc_id", "text"), pieces)
      .select("n_tokens_bpe").as[Long].head()
    one shouldBe 2L
  }

  test("bpePieces: frequency-ranked n-grams, ties by piece, short words contribute nothing") {
    val docs = Seq((1L, "aaa aaa aaa bb cc"), (2L, "aaa bb")).toDF("doc_id", "text")
    val pieces = Packing.bpePieces(docs, "text", minN = 2, maxN = 3, k = 3)
      .as[(String, Long)].collect()
    // "aaa" x4 occurrences -> grams aa (2 per occurrence = 8), aaa (4);
    // bb x2 -> bb (2); cc x1 -> cc (1). Top-3: aa(8), aaa(4), bb(2)
    pieces shouldBe Array(("aa", 8L), ("aaa", 4L), ("bb", 2L))
    an[IllegalArgumentException] should be thrownBy
      Packing.bpePieces(docs, "text", minN = 1, maxN = 3, k = 3)
  }
  test("bpeMergeTable replays the classic merge sequence; merges drop into greedyTokenCounts") {
    // Sennrich et al.'s canonical example: low x5, lower x2, newest x6,
    // widest x3. Hand-derived merge sequence: (e,s) tf 9, then (es,t) 9,
    // (l,o) 7, (lo,w) 7 -- ties broken (left, right) lexicographic asc
    // ((e,s) beats (s,t) at 9; (l,o) beats (o,w) at 7).
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Packing.bpeMergeTable(docs, nMerges = 4)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    got shouldBe Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L))
    // the merge table IS a greedyTokenCounts vocabulary: with pieces
    // {es, est, lo, low}, "newest" counts n+e+w+est = 4 and "low"
    // counts 1 -- the trained inventory beats char fallback (6 / 3)
    val vocab = Packing.bpeMergeTable(docs, nMerges = 4)
      .select(col("merged").as("piece"))
    val counts = Packing.greedyTokenCounts(
        Seq((1L, "newest"), (2L, "low")).toDF("doc_id", "text"), vocab)
      .orderBy("doc_id")
      .select("n_tokens_bpe").as[Long].collect().toSeq
    counts shouldBe Seq(4L, 1L)
  }

  test("bpeMergeTable: pair exhaustion yields fewer rows, never a crash") {
    // one two-char word: a single merge is possible; rounds 2..4 find no
    // pairs and emit nothing
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val got = Packing.bpeMergeTable(docs, nMerges = 4)
      .as[(Int, String, String, String, Long)].collect().toSeq
    got shouldBe Seq((1, "a", "b", "ab", 3L))
    // a pair-less corpus (all 1-char words) yields the EMPTY table with
    // the contract schema, not a crash
    val none = Packing.bpeMergeTable(Seq((1L, "a b a")).toDF("doc_id", "text"),
      nMerges = 2, batchSize = 2)
    none.columns.toSeq shouldBe Seq("step", "pa", "pb", "merged", "pair_tf")
    none.count() shouldBe 0L
  }

  test("batched BPE: batchSize=1 reproduces the sequential table bit-for-bit") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    def rows(b: Int) = Packing.bpeMergeTable(docs, nMerges = 4, batchSize = b)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    rows(1) shouldBe Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L))
  }

  test("batched BPE: batchSize=2 selects mutually non-conflicting top pairs per round") {
    // classic corpus, hand-derived at B=2. Round-1 ranked pairs:
    // (e,s,9), (s,t,9), (w,e,8), (l,o,7), (o,w,7), ... Greedy: take
    // (e,s); skip (s,t) [shares s]; skip (w,e) [shares e]; take (l,o).
    // After applying both: low->[lo,w], lower->[lo,w,e,r],
    // newest->[n,e,w,es,t], widest->[w,i,d,es,t]. Round-2 ranked:
    // (es,t,9), (lo,w,7), ... Take (es,t); take (lo,w) [disjoint from
    // {es,t,est}]. Same 4 merges as sequential here, different ORDER
    // ((l,o) lands at step 2) — and pair_tf reads the count at the
    // round the pair was SELECTED.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Packing.bpeMergeTable(docs, nMerges = 4, batchSize = 2)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    got shouldBe Seq(
      (1, "e", "s", "es", 9L),
      (2, "l", "o", "lo", 7L),
      (3, "es", "t", "est", 9L),
      (4, "lo", "w", "low", 7L))
    // the batch-trained inventory is a drop-in vocabulary like the
    // sequential one: same 4 merged pieces
    got.map(_._4).toSet shouldBe Set("es", "est", "lo", "low")
  }

  test("batched BPE: under-filled rounds keep looping to nMerges; a hopeless fill fails loudly") {
    // "abababab...": every round has exactly ONE selectable merge (all
    // candidates share symbols), so B=4 rounds land 1 merge each — the
    // loop keeps going past ceil(nMerges/B) rounds and still reaches 3
    val chain = Seq((1L, ("ab" * 16) + " " + ("ab" * 16))).toDF("doc_id", "text")
    val got = Packing.bpeMergeTable(chain, nMerges = 3, batchSize = 4)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    got.map(m => (m._1, m._4)) shouldBe Seq((1, "ab"), (2, "abab"), (3, "abababab"))
    // but 1 merge/round against a 4x-ideal round budget exhausts at
    // nMerges=8, batchSize=8 (ideal 1 round, cap 4): loud, not quiet
    val ex = intercept[IllegalStateException] {
      Packing.bpeMergeTable(chain, nMerges = 8, batchSize = 8).collect()
    }
    ex.getMessage should include("under-filled")
    // and a round budget over 64 is rejected at plan time
    an[IllegalArgumentException] should be thrownBy
      Packing.bpeMergeTable(chain, nMerges = 200, batchSize = 2)
  }

  /** Hand merge table: (step, pa, pb, merged, pair_tf). */
  private def merges(rows: (Int, String)*) =
    rows.map { case (s, m) => (s, m.take(1), m.drop(1), m, 1L) }
      .toDF("step", "pa", "pb", "merged", "pair_tf")

  test("encodeToIds: hand-computed greedy ids — longest match, earliest-merge ties, sp separators") {
    // ids: chars a=3..z=28, 0=29..9=38; merge step s -> 38+s
    val mt = merges((1, "th"), (2, "the"))  // th=39, the=40
    val docs = Seq((1L, "the cat"), (2L, "thx"), (3L, "...")).toDF("doc_id", "text")
    val got = Packing.encodeToIds(docs, mt).orderBy("doc_id")
      .as[(Long, Seq[Int], Long)].collect().toSeq
    got shouldBe Seq(
      (1L, Seq(40, 2, 5, 3, 22), 5L),     // "the" | <sp> | c a t
      (2L, Seq(39, 26), 2L),              // "th" + x (greedy longest at pos 1 is th? no: "the" needs e — th wins)
      (3L, Seq(), 0L))                    // tokenizes to nothing
    // duplicate merged strings: the EARLIEST step's id wins
    val dup = Seq((1, "a", "b", "ab", 9L), (3, "a", "b", "ab", 5L))
      .toDF("step", "pa", "pb", "merged", "pair_tf")
    val one = Packing.encodeToIds(Seq((1L, "ab")).toDF("doc_id", "text"), dup)
      .select("ids").as[Seq[Int]].head()
    one shouldBe Seq(39)                  // 38+1, never 38+3
    // longer merge beats an earlier shorter one at the same position
    val longer = merges((1, "ab"), (2, "abc"))
    Packing.encodeToIds(Seq((1L, "abcd")).toDF("doc_id", "text"), longer)
      .select("ids").as[Seq[Int]].head() shouldBe Seq(40, 6) // abc, d
  }

  test("decode(encode(x)) == normalized text, hand case and the real corpus with trained merges") {
    val mt = merges((1, "th"), (2, "the"))
    val docs = Seq((1L, "The cat... sat 42 times!"), (2L, "")).toDF("doc_id", "text")
    val dec = Packing.decodeIds(Packing.encodeToIds(docs, mt), mt).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    dec shouldBe Seq((1L, "the cat sat 42 times"), (2L, ""))
    // real corpus + really-trained merges: round trip must hold for every doc
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val trained = Packing.bpeMergeTable(corpus, nMerges = 8)
    val normalized = corpus.select(col("doc_id"),
      expr("array_join(filter(split(lower(text), '[^a-z0-9]+'), t -> t != ''), ' ')").as("exp"))
    val roundTrip = Packing.decodeIds(Packing.encodeToIds(corpus, trained), trained)
      .join(normalized, "doc_id")
    roundTrip.filter(col("text") =!= col("exp")).count() shouldBe 0L
    roundTrip.count() shouldBe corpus.count()
  }

  test("packTokenRows: hand-computed rows — boundaries, spans, tail padding") {
    // stream: [0,5,6, 0,7, 0,8,9,10] (T=9), seqLen 4
    val enc = Seq((1L, Seq(5, 6)), (2L, Seq(7)), (3L, Seq(8, 9, 10)))
      .toDF("doc_id", "ids")
    val got = Packing.packTokenRows(enc, seqLen = 4).orderBy("row_id")
      .as[(Long, Seq[Int], Long)].collect().toSeq
    got shouldBe Seq(
      (0L, Seq(0, 5, 6, 0), 0L),
      (1L, Seq(7, 0, 8, 9), 0L),
      (2L, Seq(10, 1, 1, 1), 3L))
  }

  test("packTokenRows invariants on the real corpus: exact seqLen rows, stream reconstruction, bucketWidth-invariant") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val enc = Packing.encodeToIds(corpus, Packing.bpeMergeTable(corpus, nMerges = 4))
    val packed = Packing.packTokenRows(enc, seqLen = 64).cache()
    // every row is exactly seqLen ids; only the tail row is padded
    packed.filter(expr("size(ids) != 64")).count() shouldBe 0L
    val maxRow = packed.agg(max("row_id")).as[Long].head()
    packed.filter(col("n_pad") > 0 && col("row_id") =!= maxRow).count() shouldBe 0L
    // rows reassemble into the exact doc-order stream (pads stripped)
    val stream = packed.orderBy("row_id")
      .select(explode(col("ids")).as("t")).as[Int].collect().toSeq
    val expected = enc.orderBy("doc_id").as[(Long, Seq[Int], Long)].collect()
      .flatMap { case (_, ids, _) => 0 +: ids }.toSeq
    stream.take(expected.size) shouldBe expected
    stream.drop(expected.size).forall(_ == 1) shouldBe true
    // the two-phase offset knob never changes results
    val alt = Packing.packTokenRows(enc, seqLen = 64, bucketWidth = 7L)
      .orderBy("row_id").as[(Long, Seq[Int], Long)].collect().toSeq
    alt shouldBe packed.orderBy("row_id").as[(Long, Seq[Int], Long)].collect().toSeq
  }

  test("GreedyEncode witness: native kernel == composed fold, real corpus + adversarial pieces") {
    import org.apache.spark.sql.functions.{broadcast, collect_list, lit, struct}
    // words: the real corpus's distinct tokens plus crafted edge cases
    val corpusWords = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("w")).distinct()
    val edgeWords = Seq("a", "aa", "aaa", "abcabcabc", "0123456789" * 4,
      "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz").toDF("w")
    val words = corpusWords.unionByName(edgeWords).distinct()
    // pieces: overlapping, nested, duplicate-string, and 1-char entries —
    // every tie/fallback arm of the kernel
    val pieces = Seq((1, "ab"), (2, "abc"), (3, "ab"), (4, "a"), (5, "aaa"),
      (6, "23"), (7, "z"))
      .toDF("step", "m")
      .agg(collect_list(struct(col("m").as("piece"),
        (lit(38L) + col("step")).as("id"))).as("__mp"))
    val frame = words.crossJoin(broadcast(pieces))
      .withColumn("__best", Packing.composedBestAt)
    val diff = frame.select(col("w"),
        graft.functions.GreedyEncode.greedyEncode(col("w"), col("__mp"), 24).as("native"),
        Packing.greedyIdsComposed(24).as("composed"))
      .filter(expr("native != composed"))
    withClue(diff.limit(5).collect().mkString("\n")) { diff.count() shouldBe 0L }
    // and with an EMPTY piece inventory (pure char fallback)
    val empty = words.limit(50).crossJoin(broadcast(
        pieces.select(expr("CAST(array() AS array<struct<piece: string, id: bigint>>)").as("__mp"))))
      .withColumn("__best", Packing.composedBestAt)
      .select(graft.functions.GreedyEncode.greedyEncode(col("w"), col("__mp"), 24).as("native"),
        Packing.greedyIdsComposed(24).as("composed"))
      .filter(expr("native != composed"))
    empty.count() shouldBe 0L
  }

  test("packTokenRowsIncremental: chained shard appends equal the one-shot pack bit-for-bit") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mt = Packing.bpeMergeTable(corpus, nMerges = 4) // frozen across shards
    val enc = Packing.encodeToIds(corpus, mt)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("row_id").as[(Long, Seq[Int], Long)].collect().toSeq
    val oneShot = rows(Packing.packTokenRows(enc, seqLen = 48))
    // three id-ordered shards, chained
    def shard(lo: Long, hi: Long) = enc.filter(col("doc_id") > lo && col("doc_id") <= hi)
    val p0 = Packing.packTokenRows(shard(-1L, 15L), seqLen = 48)
    def graft(head: Seq[(Long, Seq[Int], Long)], tail: Seq[(Long, Seq[Int], Long)]) =
      head.filter(_._1 < tail.map(_._1).min) ++ tail
    val s1 = graft(rows(p0),
      rows(Packing.packTokenRowsIncremental(p0, shard(15L, 30L), seqLen = 48)))
    val p1 = s1.toDF("row_id", "ids", "n_pad")
    val s2 = graft(s1,
      rows(Packing.packTokenRowsIncremental(p1, shard(30L, Long.MaxValue), seqLen = 48)))
    s2 shouldBe oneShot
    // guard: an empty stored side rejects loudly instead of dropping the shard
    val err = intercept[IllegalArgumentException] {
      Packing.packTokenRowsIncremental(
        spark.emptyDataFrame.select(lit(0L).as("row_id"),
          expr("CAST(array() AS array<int>)").as("ids"), lit(0L).as("n_pad"))
          .filter(lit(false)),
        enc, seqLen = 48)
    }
    err.getMessage should include ("non-empty packed corpus")
  }
}
