package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Logged-stack watchdog: round 10's driver artifact captured a benign
    // caught analyzer stack as its entire 2000-char tail — exactly where a
    // real failure would need to surface. Count every log event that is
    // ERROR-level or carries a throwable at WARN+; the count ships in the
    // JSON line ("log_stacks") and the offenders print BEFORE it, so the
    // timing line stays the tail and a nonzero count is visible evidence.
    val stackEvents = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.LoggerContext
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-stack-watchdog", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
        override def append(ev: org.apache.logging.log4j.core.LogEvent): Unit =
          if (ev.getThrown != null || ev.getLevel.isMoreSpecificThan(Level.ERROR))
            stackEvents.add(ev.getLoggerName + ": " +
              ev.getMessage.getFormattedMessage.replaceAll("\\s+", " ").take(160))
      }
      app.start()
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
      ctx.updateLoggers()
    } catch { case scala.util.control.NonFatal(_) => () } // watchdog is best-effort
    // noop-format write: every expression executes (a count() would let
    // Spark prune the very columns the query exists to compute). A failed
    // run yields None — a crash must never enter the min as a fast sample.
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    // min of two consecutive successful runs: the box runs other tenants,
    // and a single sample regularly swings 2-3x on load spikes; the min is
    // the stable signal the 2x regression budget compares against. Both
    // runs failing reports -1 (visibly broken, not fast). The raw samples
    // are kept and reported alongside the min: a wide or uniformly-high
    // spread is the load-not-plan signature (round 9's q52 read 51x under
    // sustained box load with an unchanged plan), and without the samples
    // in the artifact that adjudication needs an out-of-band re-run.
    def sampled(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[Double] =
      Seq(once(fn), once(fn)).flatten
    def minOr(samples: Seq[Double]): Double =
      if (samples.isEmpty) -1.0 else samples.min
    // Sorted-name order, ALWAYS. `SparkEntry.queries` is an unordered Map
    // whose iteration order reshuffles whenever an entry is added, which
    // silently moves shared scan/cache build costs between queries across
    // rounds (round 7 recorded 13-15x apparent regressions on two
    // unchanged queries this way). Sorting pins who pays the first-touch
    // cost so per-query deltas across rounds compare like with like.
    // optional arg/env filter (Verify's prefix semantics) — dev-only fast
    // path to re-time a handful of queries; the driver passes nothing
    val filterSpec = args.headOption.orElse(sys.env.get("SPARK_GRAFT_ONLY"))
      .filter(_.nonEmpty)
    val only: String => Boolean = filterSpec match {
      case Some(spec) =>
        val pats = spec.split(',').toSeq
        name => pats.exists(p => name == p || name.startsWith(p + "_"))
      case None => _ => true
    }
    val sampledResults = SparkEntry.queries.toSeq.filter(kv => only(kv._1))
      .sortBy(_._1).map { case (name, fn) => name -> sampled(fn) }
    val results = sampledResults.map { case (name, s) => name -> minOr(s) }
    // Attribution twins (BASELINE.md "Bench attribution"): q15/q16/q17 time
    // backfill+operator together; the b-keys time the operator alone
    // against a pre-materialized features table. Reported alongside the
    // contract queries but EXCLUDED from the headline total, which stays
    // comparable across rounds.
    val featPath = s"/tmp/graft_bench_features_${spark.sparkContext.applicationId}"
    val attribution =
      if (filterSpec.isDefined) Seq.empty  // subset fast path: skip the twins
      else try {
        SparkEntry.materializeFeatures(spark, sfDir, featPath)
        SparkEntry.attributionQueries(featPath).toSeq.sortBy(_._1).map { case (name, fn) => name -> minOr(sampled(fn)) }
      } catch { case scala.util.control.NonFatal(_) =>
        // materialization failed: report every twin as the -1 sentinel —
        // same "visibly broken, not fast" convention as a failed query,
        // never silently-missing keys
        SparkEntry.attributionQueries(featPath).map { case (name, _) => name -> -1.0 }
      }
    val qs = (results ++ attribution).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Raw contract-query samples (rounded: they are diagnostics, not the
    // regression signal): [s1, s2] per query, fewer entries if a run
    // failed. "queries" stays the min — the cross-round comparable.
    val sm = sampledResults.map { case (k, s) =>
      "\"" + k + "\":[" + s.map(v => math.rint(v * 1000) / 1000).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Sum successes only: adding -1.0 sentinels into the total understates
    // it and makes cross-round totals incomparable whenever a query fails.
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Cleanup runs BEFORE the metric line prints: anything it logs lands
    // above the JSON, so the driver's 2000-char tail capture ends on the
    // timing line, not on whatever the teardown said.
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(featPath))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(featPath + "_tok"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(featPath + "_media"))
    SparkEntry.cleanupScratch(spark, sfDir)
    if (!stackEvents.isEmpty) {
      System.err.println(s"[bench] ${stackEvents.size} logged stack(s) during the run:")
      stackEvents.forEach(s => System.err.println(s"[bench]   $s"))
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$sm,"log_stacks":${stackEvents.size},"sf":"$sfDir"}"""
    println(line)
    // The driver's captured tail truncates at 2000 chars — half the suite's
    // per-query timings vanish from BENCH_r*.json. Persist the full line
    // in-repo so cross-round comparisons can diff complete suites.
    // a FILTERED run must never clobber the canonical full-suite artifact
    // with a partial total — print only
    if (filterSpec.isEmpty) try {
      val out = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/latest.json"))
      Option(out.getParentFile).foreach(_.mkdirs())
      java.nio.file.Files.write(out.toPath, (line + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(_) => () } // bench output must never fail the run
    spark.stop()
  }
}
