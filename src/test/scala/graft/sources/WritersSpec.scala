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

  test("bloom-filtered write records per-row-group filters for listed columns only; data round-trips") {
    val dir = Files.createTempDirectory("graft_bloom").toString
    val docs = (1L to 2000L).map(i => (i, s"content$i", i % 7)).toDF("doc_id", "text", "grp")
    ProdWriter.writeBloomFilteredParquet(docs, s"$dir/b", Seq("doc_id"), ndv = 2000L)
    ProdWriter.writeParquet(docs, s"$dir/plain")
    def bloomOffsets(path: String): Map[String, Seq[Long]] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      files.flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f),
          spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.flatMap(b =>
            b.getColumns.asScala.map(c =>
              c.getPath.toDotString -> c.getBloomFilterOffset))
        } finally r.close()
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    }
    val withBloom = bloomOffsets(s"$dir/b")
    withBloom("doc_id").foreach(_ should be >= 0L)   // filter present per row group
    withBloom("text").foreach(_ shouldBe -1L)        // unlisted columns: none
    bloomOffsets(s"$dir/plain")("doc_id").foreach(_ shouldBe -1L) // default write: none
    // data unchanged; a pushed point lookup still returns exactly its row
    spark.read.parquet(s"$dir/b").filter(col("doc_id") === 1234L)
      .select("text").as[String].collect() shouldBe Array("content1234")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
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

  test("interleave16 matches a driver-side Morton reference bit-for-bit") {
    def morton(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (43690L, 21845L), (12345L, 54321L), (65535L, 0L), (0L, 65535L))
    val got = pairs.toDF("x", "y")
      .select(ProdWriter.interleave16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    got shouldBe pairs.map { case (x, y) => morton(x, y) }
    // hand-pinned: x=1 -> bit 0; y=1 -> bit 1
    morton(1, 0) shouldBe 1L
    morton(0, 1) shouldBe 2L
    morton(65535, 65535) shouldBe (1L << 32) - 1
  }

  private def boxes(path: String): Seq[(Long, Long, Long, Long)] = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.map { f =>
      spark.read.parquet(f)
        .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
        .as[(Long, Long, Long, Long)].head()
    }
  }

  test("z-ordered files cover small 2D rectangles; single-key clustering spans the full secondary axis") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    // a full 100x100 grid in interleaved write order: both axes uniform,
    // no correlation a lexicographic sort could exploit
    val rows = (0 until 10000).map(i => (i % 100, (i * 37) % 100))
      .map { case (x, y) => (x.toLong, y.toLong, s"p$x-$y") }
      .toDF("x", "y", "payload")
    try {
      ProdWriter.writeZOrderedParquet(rows, s"$dir/z", "x", "y", numFiles = 16)
      val zb = boxes(s"$dir/z")
      zb.size should be >= 8
      // every file's bounding box is a small fraction of the 2D domain
      val areaFracs = zb.map { case (mnx, mxx, mny, mxy) =>
        ((mxx - mnx + 1) * (mxy - mny + 1)).toDouble / (100.0 * 100.0)
      }
      withClue(s"z-order boxes too large: $zb:")(
        areaFracs.sum / areaFracs.size should be < 0.3)
      // rows survive the layout change
      spark.read.parquet(s"$dir/z").count() shouldBe 10000L

      // the comparison layout: clustered on x alone — perfect on x, but
      // every file spans (essentially) the whole y domain
      ProdWriter.writeClusteredParquet(rows, s"$dir/lex",
        clusterCols = Seq("x", "y"), numFiles = 16)
      val lex = boxes(s"$dir/lex")
      val lexYSpan = lex.map { case (_, _, mny, mxy) => (mxy - mny + 1).toDouble / 100.0 }
      val zYSpan = zb.map { case (_, _, mny, mxy) => (mxy - mny + 1).toDouble / 100.0 }
      withClue(s"lex=$lex z=$zb:")(
        zYSpan.sum / zYSpan.size should be < 0.8 * (lexYSpan.sum / lexYSpan.size))

      // pruning in action: a selective 2D box touches a minority of files
      val qx = (0L, 20L); val qy = (0L, 20L)
      val touched = zb.count { case (mnx, mxx, mny, mxy) =>
        mnx <= qx._2 && mxx >= qx._1 && mny <= qy._2 && mxy >= qy._1
      }
      withClue(s"boxes=$zb:")(touched.toDouble / zb.size should be < 0.5)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("z-order: degenerate domains, NULL keys, and static bounds stay safe") {
    val dir = Files.createTempDirectory("graft_zorder2").toString
    try {
      // constant x: every row lands in bucket 0 on that axis; still writes
      val const = (0 until 100).map(i => (5L, i.toLong)).toDF("x", "y")
      ProdWriter.writeZOrderedParquet(const, s"$dir/c", "x", "y", numFiles = 2)
      spark.read.parquet(s"$dir/c").count() shouldBe 100L
      // NULL keys map to bucket 0, never lost
      val withNulls = Seq((Some(1L), Some(1L)), (None, Some(2L)), (Some(3L), None))
        .toDF("x", "y")
      ProdWriter.writeZOrderedParquet(withNulls, s"$dir/n", "x", "y", numFiles = 1)
      spark.read.parquet(s"$dir/n").count() shouldBe 3L
      // static bounds skip the min/max pass; out-of-bounds values clamp
      val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("x", "y")
      ProdWriter.writeZOrderedParquet(df, s"$dir/b", "x", "y", numFiles = 2,
        bounds = Some((0.0, 50.0, 0.0, 50.0)))
      spark.read.parquet(s"$dir/b").count() shouldBe 100L
      an[IllegalArgumentException] should be thrownBy
        ProdWriter.writeZOrderedParquet(df, s"$dir/x", "x", "y", numFiles = 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
