package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PII redaction on real PII shapes (the oracle query q75 exercises
  * cross-engine parity on injected tails; this spec exercises the
  * detector itself): emails, IPv4s, NANP phones, ordering between
  * patterns, count/redaction agreement, and NULL safety.
  */
class PiiRedactSpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: String*) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val counts = TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    df.select(col("id") +: counts :+
        TextFunctions.redactPii(col("text")).as("red"): _*)
      .orderBy("id")
      .select("n_email", "n_ip", "n_phone", "red")
      .as[(Long, Long, Long, String)].collect()
  }

  test("each pattern redacts and counts its own shape") {
    val out = run(
      "write to alice.smith+tag@sub.example.co.uk today",
      "server at 192.168.0.1 and 10.0.0.255 responded",
      "call 555-867-5309 or 555 123 4567 now",
      "no pii here at all")
    out(0) shouldBe ((1L, 0L, 0L, "write to <EMAIL> today"))
    out(1) shouldBe ((0L, 2L, 0L, "server at <IP> and <IP> responded"))
    out(2) shouldBe ((0L, 0L, 2L, "call <PHONE> or <PHONE> now"))
    out(3) shouldBe ((0L, 0L, 0L, "no pii here at all"))
  }

  test("ordering: an address's digits never double-count as IP or phone") {
    // the email consumes its dotted-numeric domain before the IP pass runs
    val out = run("mail 12.34.56.78@10.11.12.13.example.com then 1.2.3.4")
    out(0) shouldBe ((1L, 1L, 0L, "mail <EMAIL> then <IP>"))
  }

  test("mixed text counts every pattern once and redacts in place") {
    val out = run("bob@x.io from 8.8.8.8 dialed 555-000-1111")
    out(0) shouldBe ((1L, 1L, 1L, "<EMAIL> from <IP> dialed <PHONE>"))
  }

  test("word boundaries: longer digit runs are not IPs or phones") {
    val out = run("version 1.2.3.4567 build 12345-678-90123")
    out(0)._2 shouldBe 0L // 4th octet is 4 digits -> \b fails
    out(0)._3 shouldBe 0L
    out(0)._4 shouldBe "version 1.2.3.4567 build 12345-678-90123"
  }

  test("NULL text stays NULL with NULL counts") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "text")
    val counts = TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }
    val row = df.select(counts :+ TextFunctions.redactPii(col("text")).as("red"): _*)
      .head()
    row.isNullAt(0) shouldBe true
    row.isNullAt(3) shouldBe true
  }
}
