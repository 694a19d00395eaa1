package graft

import org.apache.spark.sql.functions._

/** The contract-type lint (round-12 gate): two rounds were lost to
  * contract-surface types the driver's pandas checker cannot sort or
  * hash stably (DECIMAL in r9-10, array<int> in r11) — the VALUES were
  * right, the REPRESENTATION broke the gate. This spec fails the build
  * locally before the driver ever sees such a column.
  */
class ContractLintSpec extends SparkTestBase {
  import spark.implicits._

  test("lint rejects arrays, maps, structs, binary and DECIMAL") {
    val df = Seq((1L, "x")).toDF("id", "s").select(
      col("id"),
      array(lit(1), lit(2)).as("arr"),
      map(lit("k"), lit(1)).as("m"),
      struct(lit(1).as("a")).as("st"),
      lit(Array[Byte](1, 2)).as("bin"),
      lit(BigDecimal(1.5)).as("dec"))
    val bad = ContractLint.violations(df.schema)
    bad.map(_.takeWhile(_ != ':')) shouldBe Seq("arr", "m", "st", "bin", "dec")
  }

  test("lint accepts every driver-stable scalar type") {
    val df = Seq((1L, "x")).toDF("id", "s").select(
      col("id"), col("s"), lit(true).as("b"), lit(1).as("i"),
      lit(1.5d).as("d"), lit(1.5f).as("f"),
      lit(java.sql.Date.valueOf("2024-01-01")).as("dt"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
    ContractLint.violations(df.schema) shouldBe empty
  }

  test("every contract query's output schema passes the lint on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val vs = ContractLint.violations(fn(spark, dir).schema)
      if (vs.isEmpty) Nil else Seq(s"$name -> ${vs.mkString("; ")}")
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
    SparkEntry.cleanupScratch(spark, dir)
  }
}
