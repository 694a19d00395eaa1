package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions.shingleHashes

/** Relational Bloom filter: no false negatives against the exact
  * contamination gate, bounded state, and bit_or shard-merge = union.
  */
class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def sets: DataFrame = docs
    .select(col("doc_id").as("id"), shingleHashes(col("text"), 3).as("hashes"))
    .filter("size(hashes) > 0")

  test("NO false negatives: every doc the exact gate flags, the Bloom flags too") {
    val bench = sets.filter(col("id") <= 25)
      .select(explode(col("hashes")).as("h")).distinct()
    val bloom = BloomFilter.build(bench, "h")
    val posting = sets.filter(col("id") > 25)
      .select(col("id"), explode(col("hashes")).as("h"))
    val bloomHits = BloomFilter.mightContain(bloom, posting, "h", Seq("id"))
      .groupBy("id").agg(sum("in_bloom").as("n_bloom_hits"))
    val exact = Contamination.check(
      docs.filter(col("doc_id") > 25), docs.filter(col("doc_id") <= 25))
      .select(col("doc_id").as("id"), col("n_shared"))
    val joined = bloomHits.join(exact, "id")
      .select("id", "n_bloom_hits", "n_shared").as[(Long, Long, Long)].collect()
    joined.length should be > 100
    joined.foreach { case (id, bloomN, exactN) =>
      withClue(s"doc $id: bloom $bloomN < exact $exactN — a false negative: ")(
        bloomN should be >= exactN)
    }
    // and the filter actually prunes: contaminated docs are a subset, not
    // the whole corpus (false-positive rate is bounded)
    val flagged = joined.count { case (_, b, _) => b > 0 }
    val trulyClean = joined.count { case (_, _, e) => e == 0 }
    trulyClean should be > 0
    flagged should be < joined.length
  }

  test("state is bounded by the word count; every member is found") {
    val hs = Seq(1L, 2L, 3L, 999999999L, 123456789L).toDF("h")
    val bloom = BloomFilter.build(hs, "h")
    bloom.count() should be <= BloomFilter.Words.toLong
    val found = BloomFilter.mightContain(bloom, hs, "h", Seq.empty)
      .select("in_bloom").as[Int].collect()
    found should contain only 1
  }

  test("bit_or merge of shard filters equals the filter of the union") {
    val a = Seq(1L, 2L, 3L).toDF("h")
    val b = Seq(3L, 4L, 500L).toDF("h")
    val whole = BloomFilter.build(a.union(b).distinct(), "h")
      .select("word", "bits").as[(Int, Long)].collect().toSet
    val merged = BloomFilter.build(a, "h").union(BloomFilter.build(b, "h"))
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
      .select("word", "bits").as[(Int, Long)].collect().toSet
    merged shouldBe whole
  }

  test("NULL hashes are excluded from the build") {
    val hs = Seq(Some(1L), None, Some(2L)).toDF("h")
    val withNulls = BloomFilter.build(hs, "h")
      .select("word", "bits").as[(Int, Long)].collect().toSet
    val without = BloomFilter.build(Seq(1L, 2L).toDF("h"), "h")
      .select("word", "bits").as[(Int, Long)].collect().toSet
    withNulls shouldBe without
  }
}
