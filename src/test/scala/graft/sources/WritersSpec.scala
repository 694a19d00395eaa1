package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The clustered parquet writer's layout contract: per-file key ranges are
  * narrow and pairwise disjoint (what parquet min/max pruning needs), and
  * the plain write-order layout demonstrably lacks it.
  */
class WritersSpec extends SparkTestBase {
  import spark.implicits._

  private def fileRanges(path: String): Seq[(Long, Long)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.map { f =>
      spark.read.parquet(f).agg(min(col("user_id")), max(col("user_id")))
        .as[(Long, Long)].head()
    }
  }

  private def overlaps(rs: Seq[(Long, Long)]): Boolean =
    rs.sortBy(_._1).sliding(2).exists {
      case Seq((_, hi1), (lo2, _)) => lo2 <= hi1
      case _ => false
    }

  test("clustered write yields pairwise-disjoint per-file key ranges; plain write does not") {
    val dir = Files.createTempDirectory("graft_writers").toString
    // interleaved key order so write-order files each span the full domain
    val rows = (0 until 4000).map(i => (i.toLong % 100, s"payload-$i"))
      .toDF("user_id", "payload")
    try {
      ProdWriter.writeClusteredParquet(rows, s"$dir/clustered",
        clusterCols = Seq("user_id"), numFiles = 4)
      val clustered = fileRanges(s"$dir/clustered")
      clustered.size should be >= 2
      withClue(s"clustered ranges overlap: $clustered:")(
        overlaps(clustered) shouldBe false)

      ProdWriter.writeParquet(rows.repartition(4), s"$dir/plain")
      val plain = fileRanges(s"$dir/plain")
      plain.size should be >= 2
      withClue(s"plain ranges unexpectedly disjoint: $plain:")(
        overlaps(plain) shouldBe true)

      // layout changes bytes, never rows
      spark.read.parquet(s"$dir/clustered").count() shouldBe 4000L
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("numFiles = 0 sorts within existing partitions without a shuffle") {
    val dir = Files.createTempDirectory("graft_writers0").toString
    val rows = (0 until 1000).map(i => (i.toLong % 50, i)).toDF("user_id", "n")
    try {
      val df = rows.repartition(3)
      ProdWriter.writeClusteredParquet(df, s"$dir/sorted", Seq("user_id"))
      // rows intact; within each output file user_id is non-decreasing
      val files = new java.io.File(s"$dir/sorted").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      files.foreach { f =>
        val ids = spark.read.parquet(f).select("user_id").as[Long].collect()
        ids.toSeq shouldBe ids.sorted.toSeq
      }
      spark.read.parquet(s"$dir/sorted").count() shouldBe 1000L
      an[IllegalArgumentException] should be thrownBy
        ProdWriter.writeClusteredParquet(df, s"$dir/x", Seq.empty)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
