package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** URL canonicalization: every rule hand-checked, plus the honest-scope
  * negatives (https stays distinct, dot-segments untouched).
  */
class UrlCanonicalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(TextFunctions.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq

  test("case folds scheme+host only; path and query keep their case") {
    canon("HTTP://ExAmple.COM/Path/File?Q=Abc") shouldBe
      Seq("http://example.com/Path/File?Q=Abc")
  }

  test("default ports drop per scheme; explicit non-default ports survive") {
    canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x") shouldBe Seq(
      "http://a.com/x", "https://a.com/x",
      "http://a.com:443/x", "https://a.com:80/x", "http://a.com:8080/x")
  }

  test("fragment drops; empty path becomes /; ALL trailing slashes drop") {
    // "x//" must strip BOTH slashes: stripping one at a time breaks
    // idempotence (canon of the canonical form would strip again)
    canon(
      "http://a.com/x#section-2", "http://a.com", "http://a.com/",
      "http://a.com/x/", "http://a.com/x//", "http://a.com//") shouldBe Seq(
      "http://a.com/x", "http://a.com/", "http://a.com/",
      "http://a.com/x", "http://a.com/x", "http://a.com/")
  }

  test("tracking params drop, survivors sort, empty query drops the ?") {
    canon(
      "http://a.com/x?utm_source=tw&utm_campaign=c&b=2&a=1",
      "http://a.com/x?b=2&a=1",
      "http://a.com/x?gclid=123",
      "http://a.com/x?fbclid=1&ref=home&mc_cid=9",
      "http://a.com/x?UTM_Source=tw&a=1",  // tracking match is case-blind
      "http://a.com/x?gclid",              // ...and = is optional
      "http://a.com/x?refresh=1") shouldBe Seq(  // prefix-only never matches
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x",
      "http://a.com/x",
      "http://a.com/x?a=1",
      "http://a.com/x",
      "http://a.com/x?refresh=1")
  }

  test("honest scope: https != http, dot-segments and percent-escapes untouched, schemeless falls back to lowercase") {
    canon("https://a.com/x").head should not be canon("http://a.com/x").head
    canon("http://a.com/x/../y") shouldBe Seq("http://a.com/x/../y")
    canon("http://a.com/%7Euser") shouldBe Seq("http://a.com/%7Euser")
    canon("  WWW.Example.com/X  ") shouldBe Seq("www.example.com/x")
  }

  test("urlDedup groups every syntactic variant of a page; distinct pages stay apart") {
    val rows = Seq(
      (1L, "http://site.com/a/b?a=1&b=2"),
      (2L, "HTTP://Site.COM/a/b?a=1&b=2"),
      (3L, "http://site.com:80/a/b?a=1&b=2"),
      (4L, "http://site.com/a/b/?a=1&b=2"),
      (5L, "http://site.com/a/b?a=1&b=2#frag"),
      (6L, "http://site.com/a/b?utm_source=x&a=1&b=2"),
      (7L, "http://site.com/a/b?b=2&a=1"),
      (8L, "https://site.com/a/b?a=1&b=2"),   // different scheme: distinct
      (9L, "http://site.com/a/c?a=1&b=2"))    // different path: distinct
      .toDF("doc_id", "url")
    val out = graft.operators.Dedup.urlDedup(rows)
      .select("doc_id", "keeper_id", "group_size", "is_dup")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    out.take(7).foreach { case (_, keeper, size, _) =>
      keeper shouldBe 1L; size shouldBe 7L
    }
    out.take(7).map(_._4).toSeq shouldBe (0 +: Seq.fill(6)(1))
    out(7) shouldBe ((8L, 8L, 1L, 0))
    out(8) shouldBe ((9L, 9L, 1L, 0))
  }

  test("NULL urls fail loudly — a NULL key would silently never equi-join against state") {
    val rows = Seq((1L, "http://a.com/x"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val e = intercept[Exception] {
      graft.operators.Dedup.urlDedup(rows).collect()
    }
    e.getMessage should include ("NULL url has no page identity")
  }

  test("canonicalization is idempotent and total on adversarial inputs") {
    // canon(canon(x)) == canon(x): a canonical form re-entering the
    // pipeline (re-crawl of an already-normalized url list) must be a
    // fixed point, or dedup keys drift across passes
    val rnd = new scala.util.Random(11)
    val schemes = Seq("http://", "https://", "HTTP://", "ftp://", "")
    val hosts = Seq("A.com", "a.b.c.org:8080", "x.com:80", "x.com:443", "")
    val paths = Seq("", "/", "//", "/p", "/p/", "/p//", "/p///", "/p//q/", "/%7E/../x")
    val queries = Seq("", "?", "?a=1", "?b=2&a=1&utm_x=9", "?&&", "?gclid", "?A=1&a=2")
    val frags = Seq("", "#f", "##")
    val urls = (1 to 200).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + hosts(rnd.nextInt(hosts.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size)) +
        frags(rnd.nextInt(frags.size))
    } ++ Seq("", "   ", "not a url at all", "http://", "://x", "http:///path")
    val once = urls.toDF("u")
      .select(col("u"), TextFunctions.canonicalizeUrl(col("u")).as("c1"))
      .withColumn("c2", TextFunctions.canonicalizeUrl(col("c1")))
    val broken = once.filter(col("c1") =!= col("c2") || col("c1").isNull)
    withClue(broken.limit(5).collect().mkString("\n")) {
      broken.count() shouldBe 0L
    }
  }

  test("hostCoherentSplit: one split per site whatever the URL noise; ratios near the knobs") {
    // 60 sites x 5 noisy variants each: every variant of a site must
    // land in the SAME split, and the site-level ratios track 80/10/10
    val rows = (0L until 300L).map { i =>
      val site = i / 5
      val u = (i % 5) match {
        case 0 => s"http://s$site.com/p"
        case 1 => s"HTTP://S$site.COM/p"
        case 2 => s"http://s$site.com:80/p"
        case 3 => s"http://s$site.com/p?utm_source=x"
        case _ => s"http://s$site.com/p#frag"
      }
      (i, u)
    }.toDF("doc_id", "url")
    val out = graft.operators.Sampling.hostCoherentSplit(rows)
      .select("doc_id", "host", "split").as[(Long, String, String)].collect()
    out.groupBy(_._2).values.foreach { site =>
      site.map(_._3).distinct.length shouldBe 1   // site-coherent
      site.length shouldBe 5                       // noise never splits a site
    }
    val bySplit = out.groupBy(_._3).view.mapValues(_.length).toMap
    bySplit.values.sum shouldBe 300
    bySplit.getOrElse("train", 0) should be > bySplit.getOrElse("val", 0)
    // and the assignment matches the content-bucket rule on the host key
    val h0 = out.find(_._1 == 0L).get._2
    h0 shouldBe "s0.com"
  }

  test("incremental url state: shard appends read off merged state == one-shot dedup") {
    val all = (0L until 40L).map(i =>
      (i, s"http://site${i % 5}.com/p${i % 10}?utm_source=x&v=${i % 2}"))
      .toDF("doc_id", "url")
    val oneShot = graft.operators.Dedup.urlDedup(all)
      .collect().map(_.toSeq).toSet
    val (s1, s2) = (all.filter("doc_id < 20"), all.filter("doc_id >= 20"))
    val grown = graft.operators.Dedup.incrementUrlState(
      graft.operators.Dedup.urlState(s1), s2)
    graft.operators.Dedup.urlDedupFromState(all, grown)
      .collect().map(_.toSeq).toSet shouldBe oneShot
  }
}
