package graft

import org.apache.spark.sql.SparkSession

/** Temporary plan/timing probe (deleted after use). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"[probe] $label: ${(System.nanoTime() - t0) / 1e9}"); r
    }
    val dir = "/root/testdata/sf0.1"
    val q14 = SparkEntry.queries("q14_backfill")
    val df = q14(spark, dir)
    df.explain("formatted")
    time("q14 noop 1st") { df.write.format("noop").mode("overwrite").save() }
    time("q14 noop 2nd") { q14(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
