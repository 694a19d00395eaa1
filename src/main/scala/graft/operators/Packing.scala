package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing: assign documents to fixed-size training chunks.
  *
  * An LLM training pipeline concatenates documents (in a deterministic
  * order) into one token stream and cuts it into context-window-sized
  * chunks. The operator computes, for every document, where in that stream
  * it starts — `start_offset` = total tokens of all preceding documents —
  * and derives `chunk_id = start_offset / budget` and
  * `chunk_offset = start_offset % budget`. A document longer than the
  * remaining space in its chunk simply spans into the next one (stream
  * semantics — the downstream loader handles splitting); the assignment is
  * a pure function of (id order, token counts, budget).
  *
  * The heart is a GLOBAL prefix sum, which is exactly the thing a naive
  * `Window.orderBy(id)` gets wrong at scale: an unpartitioned window
  * collapses the whole corpus into ONE task. This implementation uses the
  * standard two-phase decomposition instead:
  *
  *   1. coarse bucket = `id / bucketWidth` (floor division — monotone in
  *      id, so buckets are contiguous ranges of the global order);
  *   2. per-bucket token totals via one map-side-combinable aggregate;
  *   3. an exclusive running sum over the BUCKET TOTALS — a frame with one
  *      row per bucket, thousands of rows at most, where a single-task
  *      window is the right plan, not a bottleneck;
  *   4. bucket offsets broadcast back; within each bucket a window
  *      partitioned BY bucket computes the local exclusive prefix sum.
  *
  * The result is identical to the single-window formulation for every
  * `bucketWidth` (PackingSpec pins this), so the knob tunes parallelism
  * only. Sparse or skewed ids make buckets uneven — pick `bucketWidth`
  * so the densest id range fits a task (at 100 TB: ~1e6 rows/bucket).
  */
object Packing {

  /** Overlapping sliding-window chunking of long documents: windows of
    * `windowTokens` starting every `strideTokens` (stride < window =
    * overlap, the standard long-context training cut). Entirely row-local
    * — one explode of a per-row integer sequence, zero shuffle; the window
    * COUNT math is exact on both engines (token counts sit far below
    * 2^53, so floor-of-division can't round):
    * `n_wins = 1 + ceil((n - window) / stride)` for n > window, else 1
    * (docs with zero tokens emit no windows). The last window is short
    * (`win_len = min(window, n - start)`), never empty: the final start is
    * strictly below n by construction.
    */
  def slidingWindows(docs: DataFrame, windowTokens: Long, strideTokens: Long,
                     idCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      "strideTokens must be in (0, windowTokens]")
    val n = col(tokenCol).cast("long")
    val nWins = when(n <= windowTokens, lit(1L))
      .otherwise(lit(1L) + floor((n - windowTokens + strideTokens - 1L) / lit(strideTokens)).cast("long"))
    docs.filter(n > 0L)
      .select(col(idCol), n.as("n_tokens"), explode(sequence(lit(0L), nWins - 1L)).as("win_idx"))
      .withColumn("win_start", col("win_idx") * strideTokens)
      .withColumn("win_len", least(lit(windowTokens), col("n_tokens") - col("win_start")))
  }

  def packChunks(docs: DataFrame, budget: Long,
                 idCol: String = "doc_id", tokenCol: String = "n_tokens",
                 bucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the stream order is numeric-id order; a non-numeric id column would
    // cast to NULL row-by-row in a non-ANSI session (silently empty
    // output) — reject it at plan time instead
    require(docs.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packChunks orders by a NUMERIC id; '$idCol' is ${docs.schema(idCol).dataType.sql}")
    val base = docs.select(
      // a NULL id has no position in the stream: its bucket would sort
      // before every real bucket (NULLS FIRST) and poison every offset
      // while the bucket join dropped the row — fail loudly per-row
      when(col(idCol).isNull,
        raise_error(lit(s"packChunks: NULL $idCol has no stream position")))
        .otherwise(col(idCol).cast("long")).as("id"),
      // a NULL token count contributes no tokens (sum skips NULLs anyway);
      // make that explicit so the row itself still gets a chunk
      coalesce(col(tokenCol).cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("bucket", floor(col("id") / lit(bucketWidth)).cast("long"))
    // tiny frame: one row per bucket — the only unpartitioned window, by
    // design (see scaladoc step 3)
    val bucketOffsets = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(
          sum(col("bucket_total")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    val localWin = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bucketOffsets), "bucket")
      .withColumn("start_offset",
        col("bucket_offset") + coalesce(sum(col("n_tokens")).over(localWin), lit(0L)))
      .select(
        col("id").as(idCol),
        col("n_tokens"),
        col("start_offset"),
        floor(col("start_offset") / lit(budget)).cast("long").as("chunk_id"),
        (col("start_offset") % lit(budget)).as("chunk_offset"))
  }

  /** Length-bucketed batching report: bucket documents by token count
    * (`bucketWidth` tokens per bucket) and price the padding cost of
    * batching bucket-mates together — the standard efficiency estimate
    * for dynamic batching, where every sequence in a batch pads to the
    * longest and mixing a 10-token doc with a 1000-token doc burns 99%
    * of the compute. Per bucket: doc/token counts, the batch count at
    * `batchSize`, and the padding waste if every member pads to the
    * bucket max (integer-exact; `waste_pct` is the one pinned double
    * division). Zero-token docs emit nothing, like [[slidingWindows]].
    *
    * Row-local bucketing + ONE combinable aggregate — output is bounded
    * by the bucket count regardless of corpus size.
    */
  def lengthBucketReport(docs: DataFrame, tokenCol: String,
                         bucketWidth: Long, batchSize: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(batchSize > 0, "batchSize must be positive")
    val n = col(tokenCol).cast("long")
    docs.filter(n > 0)
      .select(floor(n / lit(bucketWidth)).cast("long").as("bucket"), n.as("__n"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).as("sum_tokens"),
        max(col("__n")).as("max_tokens"))
      .select(
        col("bucket"),
        (col("bucket") * bucketWidth).as("bucket_lo"),
        (col("bucket") * bucketWidth + (bucketWidth - 1)).as("bucket_hi"),
        col("n_docs"),
        col("sum_tokens"),
        col("max_tokens"),
        expr(s"(n_docs + ${batchSize - 1}) DIV $batchSize").as("n_batches"),
        (col("n_docs") * col("max_tokens") - col("sum_tokens")).as("padding_waste"),
        round((col("n_docs") * col("max_tokens") - col("sum_tokens")).cast("double")
          / (col("n_docs") * col("max_tokens")).cast("double"), 6).as("waste_pct"))
  }

  /** Context-length truncation: keep each document's first `maxTokens`
    * tokens (the hard cut every trainer applies when a document exceeds
    * the model's context and [[slidingWindows]]' overlap isn't wanted).
    * Entirely row-local — tokenize, slice, re-join inside one projection;
    * zero shuffle, and the fingerprint of the truncated text means
    * downstream exact-dedup can run on the cut form without materializing
    * it twice.
    *
    * Output: (idCol, n_tokens, n_kept = min(n_tokens, maxTokens),
    * truncated flag, text_trunc).
    */
  def truncateToBudget(docs: DataFrame, maxTokens: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    docs.select(
        col(idCol),
        toks.as("__tb_w"))
      .select(
        col(idCol),
        size(col("__tb_w")).cast("long").as("n_tokens"),
        least(size(col("__tb_w")).cast("long"), lit(maxTokens.toLong)).as("n_kept"),
        (size(col("__tb_w")) > maxTokens).cast("int").as("truncated"),
        array_join(slice(col("__tb_w"), 1, maxTokens), " ").as("text_trunc"))
  }

  // ==== tokenizer-aware counting ========================================

  /** Subword piece vocabulary for [[greedyTokenCounts]]: the `k` most
    * frequent character n-grams (lengths `minN..maxN`) across the
    * corpus's word occurrences, ties broken by piece string — the cheap
    * data-derived stand-in for a trained BPE merge table (both are
    * frequency-ranked subword inventories; the greedy longest-match
    * consumer below is identical either way, so swapping in a real
    * tokenizer's vocab file is a drop-in).
    *
    * Scale shape: n-grams explode from the DISTINCT-word table weighted
    * by term frequency, never from the corpus rows — the same
    * distinct-domain trick as [[greedyTokenCounts]]; one word shuffle,
    * one n-gram shuffle (both short rows), one top-k.
    */
  def bpePieces(docs: DataFrame, textCol: String = "text",
                minN: Int = 2, maxN: Int = 4, k: Int = 40): DataFrame = {
    require(minN >= 2 && maxN >= minN && k >= 1,
      s"need 2 <= minN <= maxN and k >= 1: got minN=$minN maxN=$maxN k=$k")
    val wordTf = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("tf"))
    wordTf
      // NB sequence(1, 0) DESCENDS in Spark (it is not empty like range):
      // words shorter than n must short-circuit to an empty piece list
      .select(col("tf"), explode(expr(
        s"""flatten(transform(sequence($minN, $maxN),
           |  n -> IF(length(w) >= n,
           |         transform(sequence(1, length(w) - n + 1),
           |           i -> substring(w, i, n)),
           |         array())))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("tf")).as("tf"))
      .orderBy(col("tf").desc, col("piece").asc)
      .limit(k)
  }

  /** Tokenizer-aware token counts: whitespace-token count AND a
    * vocab-driven greedy longest-match ("BPE-ish") piece count per
    * document — the counter that makes packing budgets approximate real
    * tokenizer lengths instead of assuming one token per word.
    *
    * Matching follows the real pretokenize-then-subword shape: each
    * whitespace word tokenizes independently, greedy longest vocab piece
    * at each position, single-character fallback when nothing matches
    * (byte-fallback semantics). The fold is BOUNDED: `maxWordLen` steps,
    * each consuming >= 1 char; characters past the bound count one piece
    * each (well-defined on both engines, and irrelevant for natural-word
    * domains — pick maxWordLen >= your longest token).
    *
    * Scale shape: the greedy fold — the only non-trivial compute — runs
    * once per DISTINCT word, not per corpus row: distinct word forms are
    * sublinear in corpus size (Heaps' law), so the interpreted HOF cost
    * that killed q52 stays off the corpus path. Per-word counts join back
    * on the word (short rows, content-uniform key) and per-doc totals are
    * one combinable aggregate. The piece vocabulary (top-k, a few hundred
    * bytes) broadcasts into the fold as one collected array column.
    *
    * Output: (idCol, n_tokens_ws, n_tokens_bpe); every input row
    * survives (token-less docs count 0/0).
    */
  def greedyTokenCounts(docs: DataFrame, pieces: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxWordLen: Int = 24): DataFrame = {
    require(maxWordLen >= 1, "maxWordLen must be positive")
    val words = docs.select(col(idCol).as("__gt_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
    val vocab = pieces.agg(sort_array(collect_list(col("piece"))).as("__pieces"))
    // greedy fold over ONE distinct-word row: at each step match the
    // longest piece at pos (0 matches -> consume 1 char), stop advancing
    // past the word end; leftover chars past maxWordLen steps count 1 each
    val nPieces = expr(
      s"""aggregate(sequence(1, $maxWordLen),
         |  named_struct('pos', 1, 'cnt', 0),
         |  (acc, step) -> IF(acc.pos > length(w), acc,
         |    named_struct(
         |      'pos', acc.pos + greatest(1, array_max(transform(__pieces,
         |         p -> IF(substring(w, acc.pos, length(p)) = p, length(p), 0)))),
         |      'cnt', acc.cnt + 1)),
         |  acc -> acc.cnt + greatest(0, length(w) - acc.pos + 1))""".stripMargin)
    val perWord = words.select(col("w")).distinct()
      .crossJoin(broadcast(vocab))
      .select(col("w").as("__pw_w"), nPieces.cast("long").as("__pw_n"))
    val counted = words.join(perWord, col("w") === col("__pw_w"))
      .groupBy(col("__gt_id"))
      .agg(count(lit(1)).as("n_tokens_ws"), sum(col("__pw_n")).as("n_tokens_bpe"))
    docs.select(col(idCol)).join(counted, col(idCol) === col("__gt_id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens_ws"), lit(0L)).as("n_tokens_ws"),
        coalesce(col("n_tokens_bpe"), lit(0L)).as("n_tokens_bpe"))
  }

  /** Fixed piece-id scheme shared by [[encodeToIds]], [[decodeIds]] and
    * [[packTokenRows]]: 0 = `<doc>` boundary, 1 = `<pad>`, 2 = `<sp>`
    * (inter-word space), 3..28 = 'a'..'z' (ascii - 94), 29..38 =
    * '0'..'9' (ascii - 19), 38 + step = the piece merged at `step` of a
    * [[bpeMergeTable]]. Pure arithmetic for the base alphabet means both
    * engines (and [[decodeIds]]) recover chars without a lookup table.
    */
  val DocId = 0
  val PadId = 1
  val SpId = 2
  val MergeIdBase = 38

  /** Encode documents to token-ID sequences with a trained merge table —
    * the step that turns `corpus-prep` output into an actual trainable
    * artifact (q97 counts pieces, q104 trains merges; this emits the
    * `array<int>` the training shards need).
    *
    * Per word: greedy longest-match against the merged-piece inventory
    * (single-character fallback = byte-fallback semantics; the house
    * alphabet [a-z0-9] makes the fallback total). Words join with
    * [[SpId]] between them, so decode can reconstruct the normalized
    * text exactly ([[decodeIds]]; PackingSpec pins the round trip).
    *
    * The greedy fold runs once per DISTINCT word (the [[greedyTokenCounts]]
    * scale shape): a per-position best-match table (`len * 1e6 - id`,
    * integer-packed so the longest piece wins and ties break to the
    * EARLIEST merge — portable max, no struct comparisons), then a
    * bounded `maxWordLen`-step walk appending ids; characters past the
    * bound encode one id each. Per-word id arrays join back on the word
    * and per-doc assembly is one keyed collect bounded by doc length.
    *
    * Output: (idCol, ids array<int>, n_ids) — every input row survives,
    * token-less docs carry an empty array.
    */
  def encodeToIds(docs: DataFrame, mergeTable: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  maxWordLen: Int = 24): DataFrame = {
    require(maxWordLen >= 1, "maxWordLen must be positive")
    val words = docs.select(col(idCol).as("__e_id"),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("__e_pos", "w")))
    // merged-piece inventory as ONE collected array column (a few KB,
    // broadcast): (piece, id = 38 + step); duplicate merged strings from
    // different steps keep distinct ids, the score packing below picks
    // the earliest
    val mp = mergeTable.agg(collect_list(struct(
      col("merged").as("piece"),
      (lit(MergeIdBase) + col("step")).cast("long").as("id"))).as("__mp"))
    val perWord = words.select(col("w")).distinct()
      .crossJoin(broadcast(mp))
      .select(col("w").as("__pw_w"),
        graft.functions.GreedyEncode.greedyEncode(
          col("w"), col("__mp"), maxWordLen).as("__pw_ids"))
    // doc assembly in word order: every word's ids get a trailing <sp>,
    // flatten, drop the trailing separator
    val perDoc = words.join(perWord, col("w") === col("__pw_w"))
      .groupBy(col("__e_id"))
      .agg(expr(
        s"""flatten(transform(
           |  array_sort(collect_list(struct(__e_pos, __pw_ids))),
           |  x -> concat(x.__pw_ids, array($SpId))))""".stripMargin).as("__flat"))
      .select(col("__e_id"),
        expr("slice(__flat, 1, size(__flat) - 1)").as("__ids"))
    docs.select(col(idCol))
      .join(perDoc, col(idCol) === col("__e_id"), "left")
      .select(col(idCol),
        coalesce(col("__ids"), expr("CAST(array() AS array<int>)")).as("ids"))
      .withColumn("n_ids", size(col("ids")).cast("long"))
  }

  /** The COMPOSED greedy fold [[encodeToIds]] replaced with the native
    * [[graft.functions.GreedyEncode]] kernel — kept ONLY as the
    * bit-parity witness (PackingSpec asserts native == composed on the
    * real corpus and random merge tables; the PolyHash/RepStats
    * discipline). Input shape matches the kernel's: one row per
    * (w, __mp) with __mp = array<struct<piece, id>>.
    */
  private[graft] def greedyIdsComposed(maxWordLen: Int): org.apache.spark.sql.Column = {
    def charId(pos: String): String =
      s"IF(ascii(substring(w, $pos, 1)) >= 97, ascii(substring(w, $pos, 1)) - 94, ascii(substring(w, $pos, 1)) - 19)"
    expr(
      s"""aggregate(sequence(1, $maxWordLen),
         |  named_struct('pos', 1, 'ids', CAST(array() AS array<int>)),
         |  (acc, step) -> IF(acc.pos > length(w), acc,
         |    named_struct(
         |      'pos', CAST(acc.pos + greatest(1L, (element_at(__best, acc.pos) + 999999L) div 1000000L) AS INT),
         |      'ids', concat(acc.ids, array(CAST(
         |        IF(element_at(__best, acc.pos) > 0L,
         |           ((element_at(__best, acc.pos) + 999999L) div 1000000L) * 1000000L
         |             - element_at(__best, acc.pos),
         |           ${charId("acc.pos")}) AS INT))))),
         |  acc -> concat(acc.ids,
         |    IF(acc.pos <= length(w),
         |       transform(sequence(acc.pos, length(w)),
         |         i -> CAST(${charId("i")} AS INT)),
         |       CAST(array() AS array<int>))))""".stripMargin)
  }

  /** [[greedyIdsComposed]]'s per-position best-match table. Piece ids
    * outside [0, 1e6) cannot be represented by the len*1e6-id score
    * packing; the native kernel throws on them (GreedyEncode.scala), so
    * the composed witness raises the SAME loud error instead of silently
    * decoding a shorter piece with a different id — bit-parity must hold
    * (or both sides fail) across the whole id domain. */
  private[graft] val composedBestAt: org.apache.spark.sql.Column = expr(
    s"""transform(sequence(1, length(w)),
       |  i -> greatest(0L, array_max(transform(__mp,
       |    p -> IF(p.id < 0L OR p.id >= 1000000L,
       |            CAST(raise_error(concat('greedy_encode: piece id ',
       |              CAST(p.id AS STRING),
       |              ' outside [0, 1000000) - the integer score packing',
       |              ' cannot represent it')) AS BIGINT),
       |         IF(substring(w, i, length(p.piece)) = p.piece,
       |            CAST(length(p.piece) AS BIGINT) * 1000000L - p.id,
       |            0L))))))""".stripMargin)

  /** Inverse of [[encodeToIds]]: ids back to the normalized text
    * (tokens joined by single spaces). `<doc>`/`<pad>` decode to
    * nothing, `<sp>` to a space, base ids by arithmetic, merge ids
    * through the merge table. PackingSpec pins
    * `decode(encode(x)) == normalized x` on the real corpus.
    */
  def decodeIds(encoded: DataFrame, mergeTable: DataFrame,
                idCol: String = "doc_id", idsCol: String = "ids"): DataFrame = {
    val mmap = mergeTable.agg(
      map_from_entries(collect_list(struct(
        (lit(MergeIdBase) + col("step")).cast("int").as("id"),
        col("merged").as("piece")))).as("__mmap"))
    // an id past MergeIdBase that is NOT in the merge table means the
    // caller decoded with a wrong / non-frozen table — element_at would
    // yield NULL and array_join would silently DROP it, producing
    // plausible-but-wrong text; raise instead (the frozen-artifact
    // contract must fail loudly, not drift)
    encoded.crossJoin(broadcast(mmap))
      .select(col(idCol), expr(
        s"""array_join(transform($idsCol, i -> CASE
           |  WHEN i = $SpId THEN ' '
           |  WHEN i <= $PadId THEN ''
           |  WHEN i <= 28 THEN char(i + 94)
           |  WHEN i <= $MergeIdBase THEN char(i + 19)
           |  WHEN element_at(__mmap, CAST(i AS INT)) IS NULL
           |    THEN raise_error(concat('decodeIds: id ', CAST(i AS STRING),
           |      ' is not in the merge table - wrong or non-frozen artifact'))
           |  ELSE element_at(__mmap, CAST(i AS INT)) END), '')""".stripMargin)
        .as("text"))
  }

  /** Cut the encoded corpus into fixed-length training rows: documents
    * concatenate in id order, each preceded by a `<doc>` boundary
    * marker, and the stream chops into `seqLen`-id rows; the final row
    * pads with `<pad>` — the standard packed pre-training layout, now
    * with real ids instead of counts.
    *
    * Scale shape: the global stream offset is [[packChunks]]'s two-phase
    * prefix sum (never an unpartitioned window); each doc then emits one
    * row PER TRAINING ROW IT SPANS carrying only the id slice that lands
    * there (row-local arithmetic), and rows assemble with a keyed
    * collect bounded by `seqLen` ids. The one-row total-token count
    * comes back as a broadcast to pad the tail row.
    *
    * The boundary-prefixed id table feeds BOTH the offset pass and the
    * slice/assembly pass; `storage` persists it across the two so the
    * upstream encode (tokenize + greedy match, or a whole BPE train in
    * the contract queries) runs once, not twice — measured 7.3 -> 4.5 s
    * on the q137 shape at sf0.1. Per-trigger callers (the streaming pack
    * gate) pass StorageLevel.NONE: they persist their own output and an
    * internal default persist would leak one cache entry per trigger.
    *
    * Output: (row_id, ids array<int> of exactly seqLen, n_pad).
    */
  def packTokenRows(encoded: DataFrame, seqLen: Int,
                    idCol: String = "doc_id", idsCol: String = "ids",
                    bucketWidth: Long = 4096L,
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val withBoundary = Caching.maybePersist(
      encoded.select(col(idCol),
        expr(s"concat(array(CAST($DocId AS INT)), $idsCol)").as("__arr"))
        .withColumn("__n", size(col("__arr")).cast("long")),
      storage)
    val offsets = packChunks(withBoundary, seqLen.toLong, idCol, "__n", bucketWidth)
      .select(col(idCol), col("start_offset"))
    assembleRows(withBoundary.join(offsets, idCol), seqLen)
  }

  /** Append shards to an already-packed corpus WITHOUT repacking: the
    * stored rows below the current tail are immutable (the stream only
    * grows at the end), so the increment computes offsets for the SHARD
    * alone, re-opens the tail row (its real tokens become the first
    * slice, its pads are discarded), and emits the REPLACEMENT TAIL —
    * every row with `row_id >=` the stored maximum. Full packed corpus =
    * stored rows below that id + this result; PackingSpec pins chained
    * shards == the one-shot [[packTokenRows]] bit-for-bit.
    *
    * Caller contract (the incremental-family discipline): shard doc ids
    * must exceed every already-packed id (the stream is id-ordered), and
    * the id-scheme/merge-table behind the encoding is FROZEN across
    * increments. The stored total recovers from the packed rows
    * themselves (max row_id and its pad count) — one tiny aggregate, no
    * side metadata to keep consistent.
    */
  def packTokenRowsIncremental(packed: DataFrame, encodedShard: DataFrame,
                               seqLen: Int,
                               idCol: String = "doc_id", idsCol: String = "ids",
                               bucketWidth: Long = 4096L,
                               storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // an empty stored side has no tail to re-open (and the crossJoin
    // below would silently drop the shard) — init with packTokenRows
    require(!packed.limit(1).isEmpty,
      "packTokenRowsIncremental needs a non-empty packed corpus; " +
        "initialize with packTokenRows")
    // 1-row tail descriptor: (last row id, its unpadded prefix) — the
    // quantile-threshold broadcast pattern, no collect
    val tail = packed
      .select(col("row_id"), col(idsCol).as("__tids"), col("n_pad"))
      .orderBy(col("row_id").desc).limit(1)
      .select(col("row_id").as("__trow"),
        expr(s"slice(__tids, 1, $seqLen - CAST(n_pad AS INT))").as("__tpre"))
    // same double consumption as packTokenRows (offset pass + slice pass)
    // — same persist knob, same streaming opt-out
    val withBoundary = Caching.maybePersist(
      encodedShard.select(col(idCol),
        expr(s"concat(array(CAST($DocId AS INT)), $idsCol)").as("__arr"))
        .withColumn("__n", size(col("__arr")).cast("long")),
      storage)
    // shard offsets start where the stored stream ends
    val shardRows = packChunks(withBoundary, seqLen.toLong, idCol, "__n", bucketWidth)
      .select(col(idCol), col("start_offset"))
      .join(withBoundary, idCol)
      .crossJoin(broadcast(tail))
      .select(col("__arr"), col("__n"),
        (col("start_offset") + col("__trow") * seqLen + size(col("__tpre"))).as("start_offset"))
    // the re-opened tail rides the same assembly as a pseudo-doc pinned
    // at its row start
    val tailRow = tail.select(col("__tpre").as("__arr"),
      size(col("__tpre")).cast("long").as("__n"),
      (col("__trow") * seqLen).as("start_offset"))
    assembleRows(shardRows.unionByName(tailRow), seqLen)
  }

  /** Stitch a [[packTokenRowsIncremental]] replacement tail onto the
    * stored rows: everything strictly below the tail's first row id is
    * immutable and survives; the tail replaces the rest. One code path
    * for the CLI (`pack --packed-path`) and the q140 contract — the
    * stored maximum comes back as a 1-row broadcast, no collect.
    */
  def replaceTail(stored: DataFrame, tail: DataFrame): DataFrame = {
    val cut = stored.agg(max(col("row_id")).as("__cut"))
    stored.crossJoin(broadcast(cut)).filter(col("row_id") < col("__cut"))
      .select(col("row_id"), col("ids"), col("n_pad"))
      .unionByName(tail)
  }

  /** Collapse an APPEND-ONLY packed-row log into the current packed
    * corpus: each ingest era appends its replacement tail (rows with
    * `row_id >=` the then-current maximum) tagged with a monotone `era`,
    * and this read keeps each row_id's LATEST version — so a streaming
    * pack gate writes O(batch) rows per trigger instead of rewriting the
    * corpus ([[replaceTail]]'s shape is O(corpus) per call, fine for a
    * one-shot CLI, wrong for a per-trigger fold). One row-keyed
    * combinable aggregate; a crash-replayed era re-appends identical
    * rows, and max_by picks an identical winner either way — idempotent.
    */
  def latestPackedRows(raw: DataFrame): DataFrame =
    raw.groupBy(col("row_id"))
      .agg(max_by(struct(col("ids"), col("n_pad")), col("era")).as("__v"))
      .select(col("row_id"), col("__v.ids").as("ids"), col("__v.n_pad").as("n_pad"))

  /** Per-shard integrity manifest over [[shardPacked]] output: row count
    * plus an ORDER-FREE content checksum (the sum of each row's xxhash64
    * over every column), so a loader — or `App verify-shards` — can
    * verify a shard file with one combinable aggregate and no ordering
    * assumption. Commutative sum means partial/parallel reads verify the
    * same; any flipped id, dropped row, or duplicated row moves the sum.
    */
  def shardManifest(sharded: DataFrame): DataFrame =
    sharded.groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        // DECIMAL(38,0) accumulator: a sum of 64-bit hashes overflows
        // BIGINT under ANSI mode after a handful of rows
        sum(xxhash64(col("shard_pos"), col("row_id"), col("ids"), col("n_pad"))
          .cast("decimal(38,0)")).as("content_sum"))

  /** Cut the packed training stream into export SHARDS: every packed row
    * gets (shard_id = position div rowsPerShard, shard_pos = position mod
    * rowsPerShard), so each shard holds at most `rowsPerShard` rows and
    * shard order concatenates back into the stream. `epoch = None` keeps
    * the stream's own order (position = row_id — concatenating the
    * shards reproduces [[packTokenRows]]'s output verbatim); `epoch =
    * Some(e)` orders by the deterministic epoch-`e` permutation
    * ([[Sampling.epochShuffle]] on row_id), so every training epoch
    * exports a DIFFERENT but replayable shard sequence — the data-loader
    * contract where the shuffle is baked into the shard layout and
    * readers just stream shards in filename order.
    *
    * Scale shape: the permutation is epochShuffle's two-phase bucket
    * prefix sum (no global window), the join back to the packed rows is
    * keyed on row_id, and shard assignment is row-local arithmetic —
    * nothing here materializes more than (row_id, position) pairs beyond
    * the packed rows themselves. Output: (shard_id, shard_pos, row_id,
    * ids, n_pad); the writer clusters by (shard_id, shard_pos) so each
    * shard lands as one bounded, internally-ordered file.
    */
  def shardPacked(packed: DataFrame, rowsPerShard: Int,
                  epoch: Option[Int] = None): DataFrame = {
    require(rowsPerShard >= 1, "rowsPerShard must be positive")
    val pos = epoch match {
      case None =>
        // row_id IS the contiguous stream position (packTokenRows contract)
        packed.select(col("row_id"), col("row_id").as("__pos"))
      case Some(e) =>
        Sampling.epochShuffle(packed.select(col("row_id")), e, idCol = "row_id")
          .select(col("row_id"), col("shuffle_pos").as("__pos"))
    }
    packed.join(pos, "row_id")
      .select(
        expr(s"__pos div ${rowsPerShard}L").as("shard_id"),
        expr(s"__pos % ${rowsPerShard}L").as("shard_pos"),
        col("row_id"), col("ids"), col("n_pad"))
  }

  /** Shared row assembly: (__arr, __n, start_offset) rows -> padded
    * seqLen-id training rows.
    */
  private def assembleRows(placed: DataFrame, seqLen: Int): DataFrame = {
    val spans = placed
      .select(col("__arr"), col("__n"), col("start_offset"),
        explode(sequence(
          expr(s"start_offset div $seqLen"),
          expr(s"(start_offset + __n - 1) div $seqLen"))).as("row_id"))
      .withColumn("__gfrom", greatest(col("start_offset"), col("row_id") * seqLen))
      .withColumn("__gto",
        least(col("start_offset") + col("__n"), (col("row_id") + 1) * seqLen))
      .select(col("row_id"),
        (col("__gfrom") - col("row_id") * seqLen).as("__slot"),
        expr("slice(__arr, CAST(__gfrom - start_offset + 1 AS INT), CAST(__gto - __gfrom AS INT))")
          .as("__piece"))
    spans.groupBy(col("row_id"))
      .agg(expr(
        """flatten(transform(array_sort(collect_list(struct(__slot, __piece))),
          |  x -> x.__piece))""".stripMargin).as("__ids"))
      // only the tail row is short (the stream is contiguous); NB Spark's
      // sequence(1, 0) DESCENDS, so the empty-pad case must short-circuit
      .select(col("row_id"),
        expr(
          s"""IF(size(__ids) < $seqLen,
             |   concat(__ids, transform(sequence(1, $seqLen - size(__ids)),
             |     i -> CAST($PadId AS INT))),
             |   __ids)""".stripMargin).as("ids"),
        (lit(seqLen) - size(col("__ids"))).cast("long").as("n_pad"))
  }

  /** REAL byte-pair-encoding training: the iterative merge loop (Sennrich
    * et al. 2016) rather than [[bpePieces]]' frequency-ranked n-gram
    * stand-in. Each round counts every adjacent symbol pair across the
    * corpus's word occurrences, merges the most frequent pair(s) (ties:
    * lexicographic (left, right) asc — fully deterministic), and rewrites
    * the symbolization. Output is the merge TABLE — (step, pa, pb,
    * merged, pair_tf), one row per merge, fewer if the corpus exhausts
    * its pairs — i.e. exactly what a tokenizer ships as its merges file;
    * feed the `merged` column to [[greedyTokenCounts]] for counting with
    * the trained inventory (PackingSpec pins the classic
    * low/lower/newest/widest merge sequence).
    *
    * BATCHED TRAINING (`batchSize` > 1) — the scale path to real
    * vocabularies: one full pass + one argmax PER MERGE means a 32k-merge
    * vocab would chain 32k Spark jobs; instead each round greedily
    * selects up to `batchSize` top-ranked pairs that are MUTUALLY
    * NON-CONFLICTING — no symbol of a later pick (pa, pb, or its merged
    * form) may appear among any earlier pick's {pa, pb, merged} — and
    * applies them all in one rewrite pass. Disjointness makes the batch
    * order-independent: a replace can neither create nor destroy another
    * batch-mate's occurrences (new symbols it mints are conflict-excluded
    * from the batch). `batchSize = 1` degenerates to the classic
    * sequential loop bit-for-bit (the selection fold always takes the
    * ranked argmax first — PackingSpec pins the parity). The selection
    * scans the top `8*batchSize + 64` ranked candidates per round; heavy
    * symbol sharing among top pairs (natural text: everything touches
    * 'e') under-fills a round, so the loop runs until `nMerges` merges
    * land, bounded at 4x the conflict-free round count — exhausting THAT
    * fails loudly (raise batchSize) rather than degenerating to the
    * per-merge chain.
    *
    * Spark shape: the loop is driver-side but every ITERATION is a plan,
    * not data on the driver — pair counting explodes the DISTINCT-word
    * symbolization (Heaps-sublinear, tf-weighted; the corpus is never
    * re-scanned), the ranked candidate prefix is an `orderBy.limit`
    * (TakeOrdered) collapsed to ONE sorted-array row, the greedy
    * selection is a row-local fold over that array, and the batch
    * rewrite is one row-local fold of `replace`s CROSS-joined back as a
    * 1-row broadcast (the quantile-threshold pattern — no collect; the
    * only per-round driver action is a count of the <= batchSize
    * selected-merge frame, needed to advance the loop — and it exists in
    * the BATCHED form only: batchSize = 1 keeps the pre-batching
    * action-free argmax plan, measured ~80ms/round cheaper). Each word's
    * symbolization is a `||`-fenced string ("||n||e||w||" — tokens are
    * [a-z0-9]+ so the fence never collides); a merge rewrites
    * `|a||b| -> |ab|`, and leftmost non-overlapping replace-all is
    * precisely BPE's merge-application semantics.
    *
    * Lineage discipline: each round's state references the previous one
    * TWICE (through the selection and through the rewrite), so the raw
    * logical plan doubles per round — at 8 rounds the plan STRING alone
    * is gigabytes and the driver dies before any data moves. `persist`
    * does not help (the analyzed logical tree keeps full lineage);
    * `localCheckpoint` is the standard iterative-algorithm cut (GraphX /
    * ALS do the same) — each round's state and merge rows become a
    * LogicalRDD, constant plan depth, data stays on executors.
    */
  def bpeMergeTable(docs: DataFrame, nMerges: Int, textCol: String = "text",
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                    batchSize: Int = 1): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive: got $nMerges")
    require(batchSize >= 1, s"batchSize must be positive: got $batchSize")
    val idealRounds = (nMerges + batchSize - 1) / batchSize
    require(idealRounds <= 64,
      s"ceil(nMerges / batchSize) = $idealRounds rounds and each round is a " +
        "full distinct-word pass — raise batchSize (round cap 64)")
    val candCap = 8 * batchSize + 64
    val wordTf = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("tf"))
    // initial symbolization: one character per symbol
    var state = Caching.maybePersist(
      wordTf.select(col("tf"),
        concat(regexp_replace(col("w"), "(.)", "||$1"), lit("||")).as("r")),
      storage).localCheckpoint(false)
    // adjacent-pair tf counts over the current symbolization — shared by
    // both loop forms
    def pairCounts(st: DataFrame): DataFrame = st
      .select(col("tf"), expr("split(trim(BOTH '|' FROM r), '\\\\|\\\\|')").as("__s"))
      .select(col("tf"), explode(expr(
        """IF(size(__s) >= 2,
          |  transform(sequence(1, size(__s) - 1),
          |    i -> struct(element_at(__s, i) AS pa, element_at(__s, i + 1) AS pb)),
          |  array())""".stripMargin)).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("tf")).as("pair_tf"))
    val merges = Seq.newBuilder[DataFrame]
    if (batchSize == 1) {
      // the sequential loop keeps its PRE-BATCHING plan: a limit(1) argmax
      // cross-joined back, ZERO driver actions per round — the batched
      // path's ranked-candidate fold + landed-count job cost ~80ms/round,
      // a measured 1.4-1.6x on the 8-round contract queries, pure
      // accounting overhead a batch of one never needs (exhaustion just
      // yields empty argmax frames, as it always did). PackingSpec pins
      // the classic table through this path; the batched path's
      // batch-degeneracy is pinned by the hand-derived batch=2 case.
      for (step <- 1 to nMerges) {
        val pairs = pairCounts(state)
        val best = pairs
          .orderBy(col("pair_tf").desc, col("pa").asc, col("pb").asc).limit(1)
          .select(lit(step).as("step"), col("pa"), col("pb"),
            concat(col("pa"), col("pb")).as("merged"), col("pair_tf"))
          .localCheckpoint(false)
        merges += best
        state = state
          .crossJoin(broadcast(best.select(col("pa").as("__ba"), col("pb").as("__bb"))))
          .select(col("tf"), expr(
            "replace(r, '|' || __ba || '||' || __bb || '|', '|' || __ba || __bb || '|')"
          ).as("r"))
          .localCheckpoint(false)
      }
      return merges.result().reduce(_ unionByName _)
    }
    var done = 0
    var rounds = 0
    var exhausted = false
    while (done < nMerges && !exhausted) {
      rounds += 1
      if (rounds > 4 * idealRounds) throw new IllegalStateException(
        s"bpeMergeTable: only $done/$nMerges merges after $rounds rounds — " +
          "symbol conflicts keep batches under-filled; raise batchSize")
      val want = math.min(batchSize, nMerges - done)
      val pairs = pairCounts(state)
      // ranked candidate prefix as ONE sorted-array row: negated tf makes
      // the struct sort reproduce (tf desc, pa asc, pb asc) exactly
      val cand = pairs
        .orderBy(col("pair_tf").desc, col("pa").asc, col("pb").asc).limit(candCap)
        .agg(array_sort(collect_list(struct((-col("pair_tf")).as("ntf"),
          col("pa"), col("pb")))).as("__cand"))
      // greedy non-conflicting selection in rank order: a candidate is
      // skipped when any of its symbols (pa, pb, or the string it would
      // mint) already belongs to an earlier pick's {pa, pb, merged}
      val sel = cand.select(posexplode(expr(
        s"""aggregate(__cand,
           |  named_struct(
           |    'used', CAST(array() AS array<string>),
           |    'sel', CAST(array() AS array<struct<ntf: BIGINT, pa: STRING, pb: STRING>>)),
           |  (acc, c) -> IF(size(acc.sel) >= $want
           |      OR array_contains(acc.used, c.pa)
           |      OR array_contains(acc.used, c.pb)
           |      OR array_contains(acc.used, concat(c.pa, c.pb)), acc,
           |    named_struct(
           |      'used', concat(acc.used, array(c.pa, c.pb, concat(c.pa, c.pb))),
           |      'sel', concat(acc.sel, array(c)))),
           |  acc -> acc.sel)""".stripMargin)).as(Seq("__i", "c")))
        .select((lit(done + 1) + col("__i")).cast("int").as("step"),
          col("c.pa").as("pa"), col("c.pb").as("pb"),
          concat(col("c.pa"), col("c.pb")).as("merged"),
          (-col("c.ntf")).as("pair_tf"))
        .localCheckpoint(false)
      // the one per-round driver action: how many merges landed (<= want
      // rows, already checkpointed — a bounded count, never corpus data)
      val landed = sel.count().toInt
      if (landed == 0) exhausted = true
      else {
        merges += sel
        done += landed
        val selArr = sel.agg(sort_array(collect_list(struct(
          col("step"), col("pa"), col("pb")))).as("__sel"))
        state = state
          .crossJoin(broadcast(selArr))
          .select(col("tf"), expr(
            """aggregate(__sel, r, (acc, m) ->
              |  replace(acc, '|' || m.pa || '||' || m.pb || '|',
              |             '|' || m.pa || m.pb || '|'))""".stripMargin).as("r"))
          .localCheckpoint(false)
      }
    }
    merges.result() match {
      case Seq() => // pair-less corpus: an EMPTY table with the contract schema
        docs.sparkSession.emptyDataFrame
          .select(lit(0).as("step"), lit("").as("pa"), lit("").as("pb"),
            lit("").as("merged"), lit(0L).as("pair_tf")).limit(0)
      case ms => ms.reduce(_ unionByName _)
    }
  }
}
