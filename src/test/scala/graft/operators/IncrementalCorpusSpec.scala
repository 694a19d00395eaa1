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
}
