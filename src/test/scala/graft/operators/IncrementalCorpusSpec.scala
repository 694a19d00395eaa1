package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Incremental corpus-prep: state built per shard must be EXACTLY
  * equivalent to the one-shot full recompute — same pairs, same keepers,
  * same packed output — because every downstream statistic (quantile
  * threshold, language counts, chunk offsets) is corpus-wide.
  */
class IncrementalCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
      .toSeq.sortBy(_.mkString("|"))
  }

  test("shard pairs vs stored signatures reproduce the full-corpus pair set") {
    val old = docs.filter(col("doc_id") <= 250)
    val fresh = docs.filter(col("doc_id") > 250)
    val oldSigs = Dedup.signatures(old)
    val newSigs = Dedup.signatures(fresh)
    val incPairs = Dedup
      .lshPairsFromSignatures(oldSigs, oldSigs).select("id_a", "id_b")
      .union(Dedup.lshPairsFromSignatures(newSigs, oldSigs.unionByName(newSigs))
        .select("id_a", "id_b"))
    val fullPairs = Dedup.minhashLshPairs(docs).select("id_a", "id_b")
    canon(incPairs) shouldBe canon(fullPairs)
  }

  test("incremental prepareFromState == one-shot prepare, row for row") {
    val full = CorpusPipeline.prepare(docs)
    val st0 = CorpusPipeline.buildState(docs.filter(col("doc_id") <= 250))
    val st1 = CorpusPipeline.incrementState(st0, docs.filter(col("doc_id") > 250))
    canon(CorpusPipeline.prepareFromState(st1)) shouldBe canon(full)
  }

  test("three-shard chaining: increments compose associatively") {
    val s1 = docs.filter(col("doc_id") <= 150)
    val s2 = docs.filter(col("doc_id") > 150 && col("doc_id") <= 350)
    val s3 = docs.filter(col("doc_id") > 350)
    val st = CorpusPipeline.incrementState(
      CorpusPipeline.incrementState(CorpusPipeline.buildState(s1), s2), s3)
    canon(CorpusPipeline.prepareFromState(st)) shouldBe
      canon(CorpusPipeline.prepare(docs))
  }

  test("state meta covers every doc; signatures only shingled docs") {
    val st = CorpusPipeline.buildState(docs)
    st.meta.count() shouldBe docs.count()
    st.meta.columns.toSet shouldBe
      Set("doc_id", "lang", "n_tokens", "quality_score", "content_bucket")
    // signature population rule mirrors the dedup operators: >= 1 shingle
    val expected = docs.select(col("doc_id"),
      graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("h"))
      .filter(expr("size(h) > 0")).count()
    assert(st.signatures.count() == expected)
  }

  test("normalizeState repairs partial appends: orphans dropped, retry idempotent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half1 = docs.filter(col("doc_id") <= 250)
    val half2 = docs.filter(col("doc_id") > 250)
    val st1 = CorpusPipeline.buildState(half1)
    val inc = CorpusPipeline.shardIncrement(st1, half2)

    // crash BETWEEN appends: pairs + signatures landed, meta (the commit
    // anchor, written last) did not — the shard must be invisible
    val partial = CorpusPipeline.CorpusState(
      st1.meta,
      st1.signatures.unionByName(inc.signatures),
      st1.pairs.unionByName(inc.pairs))
    def canon(s: CorpusPipeline.CorpusState) = (
      s.meta.select("doc_id").as[Long].collect().toSet,
      s.signatures.select("id").as[Long].collect().toSet,
      s.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet)
    canon(CorpusPipeline.normalizeState(partial)) shouldBe canon(CorpusPipeline.normalizeState(st1))

    // retry after the crash: the shard's rows append AGAIN (duplicates of
    // the orphans) plus meta — normalize must converge on the clean state
    val retried = CorpusPipeline.CorpusState(
      st1.meta.unionByName(inc.meta),
      st1.signatures.unionByName(inc.signatures).unionByName(inc.signatures),
      st1.pairs.unionByName(inc.pairs).unionByName(inc.pairs))
    val clean = CorpusPipeline.incrementState(st1, half2)
    canon(CorpusPipeline.normalizeState(retried)) shouldBe canon(CorpusPipeline.normalizeState(clean))
  }
}
