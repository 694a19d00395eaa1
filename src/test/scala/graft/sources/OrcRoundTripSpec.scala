package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ORC sink -> scan round trip: typed and lossless (exact long/int/string
  * and BIT-exact double), schema preserved, and the explicit-schema read
  * path returns the same frame as inference.
  */
class OrcRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  test("orc round trip is lossless and typed; null survives") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = Seq(
      (1L, Some("alpha"), 3, Some(0.1 + 0.2)), // a double with no short decimal form
      (2L, None, -7, Some(Double.MinPositiveValue)),
      (3L, Some("gamma"), 0, None)
    ).toDF("id", "name", "rank", "score")
    try {
      // file sources widen nullability on read (same as parquet); names
      // and types must survive exactly
      def loose(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).toSeq
      ProdWriter.writeOrc(src, s"$dir/t")
      val back = ProdFetcher.readOrc(spark, s"$dir/t", Some(src.schema))
      loose(back.schema) shouldBe loose(src.schema)
      val a = src.orderBy("id").collect().toSeq
      val b = back.orderBy("id").collect().toSeq
      b shouldBe a // Row equality: doubles compare bit-for-bit here
      // inference agrees with the explicit schema on ORC (self-describing)
      loose(ProdFetcher.readOrc(spark, s"$dir/t").schema) shouldBe loose(src.schema)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("orc scan prunes columns and pushes predicates") {
    val dir = Files.createTempDirectory("graft_orc2").toString
    try {
      ProdWriter.writeOrc((1L to 100L).map(i => (i, s"n$i", i * 2)).toDF("id", "name", "v"), s"$dir/t")
      val q = ProdFetcher.readOrc(spark, s"$dir/t").filter(col("id") > 90L).select("name")
      val plan = q.queryExecution.executedPlan.toString
      plan should include("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]")
      plan should include("ReadSchema: struct<id:bigint,name:string>")
      q.count() shouldBe 10L
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
