package graft

import org.apache.spark.sql.functions.{lit, to_date}

import graft.domain.{BackfillConfig, OnlineSyncConfig, PointInTimeJoinConfig}
import graft.operators.{BackfillPipeline, OnlineSyncPipeline, PointInTimeJoinPipeline}
import graft.serving.FeatureLookup
import graft.sources.{InMemoryKVStore, KVClient}

/** CLI entry point — same subcommands and flag names as the reference
  * (App.scala:33-126; parseArgs App.scala:150-156):
  *
  * {{{
  *   graft.App backfill --events-raw-path <path> --output-table <table>
  *                      --start-date <yyyy-MM-dd> --end-date <yyyy-MM-dd>
  *   graft.App point-in-time-join --labels-path <path>
  *                      --features-table <table> --output-path <path>
  *   graft.App online-sync --features-table <table>
  *                      [--hours-back <n=24>] [--cutoff <yyyy-MM-dd>]
  *                      [--kv memory]
  *   graft.App offline-lookup --features-table <table> --user-id <id>
  *                      --as-of <yyyy-MM-dd>
  * }}}
  *
  * The KV store behind online-sync is selected by `--kv`: `memory` (the
  * in-JVM store, default — this build is offline and ships no Redis
  * client). A Redis deployment implements [[graft.sources.KVClient]] over
  * its driver of choice and registers it here; pipelines and payload
  * format don't change. `--cutoff` pins the freshness cutoff for
  * reproducible runs (the reference anchors to current_date()).
  */
object App {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(1) }
    val platform = PlatformProvider.createLocal(s"graft-${args(0)}")
    try run(platform, args.toIndexedSeq)
    finally platform.stop()
  }

  /** Dispatch on a provided platform (tests inject the in-memory one). */
  def run(platform: Platform, args: Seq[String]): Unit = {
    val Platform(spark, fetcher, writer) = platform
    args.head match {
      case "backfill" =>
        val o = parseArgs(args.tail)
        val config = BackfillConfig(
          eventsRawPath = o("events-raw-path"),
          outputTable = o("output-table"),
          startDate = o("start-date"),
          endDate = o("end-date"))
        // --incremental true: replace only the range's day partitions
        // instead of overwriting the whole table
        val features =
          if (o.get("incremental").exists(_.toBoolean))
            BackfillPipeline.runIncremental(spark, fetcher, writer, config)
          else BackfillPipeline.run(spark, fetcher, writer, config)
        println(s"[graft] backfill: wrote ${features.count()} feature rows to ${o("output-table")}")

      case "point-in-time-join" =>
        val o = parseArgs(args.tail)
        val out = PointInTimeJoinPipeline.run(spark, fetcher, writer, PointInTimeJoinConfig(
          labelsPath = o("labels-path"),
          featuresTable = o("features-table"),
          outputPath = o("output-path")))
        out match {
          case Some(ds) => println(s"[graft] point-in-time-join: wrote ${ds.count()} training rows to ${o("output-path")}")
          case None => println("[graft] point-in-time-join: empty join, nothing written")
        }

      case "online-sync" =>
        val o = parseArgs(args.tail)
        val cutoff = o.get("cutoff").map(c => to_date(lit(c)))
        val n = OnlineSyncPipeline.run(spark, fetcher,
          OnlineSyncConfig(
            featuresTable = o("features-table"),
            hoursBack = o.get("hours-back").map(_.toInt).getOrElse(24)),
          kvFactory(o.getOrElse("kv", "memory")),
          cutoffOverride = cutoff)
        println(s"[graft] online-sync: wrote $n keys")

      case "serve" =>
        // single-process demo loop: sync the freshness window into the
        // in-JVM KV store, then serve it over HTTP until interrupted
        val o = parseArgs(args.tail)
        val cutoff = o.get("cutoff").map(c => to_date(lit(c)))
        val n = OnlineSyncPipeline.run(spark, fetcher,
          OnlineSyncConfig(
            featuresTable = o("features-table"),
            hoursBack = o.get("hours-back").map(_.toInt).getOrElse(24)),
          kvFactory(o.getOrElse("kv", "memory")),
          cutoffOverride = cutoff)
        val server = graft.serving.FeatureServer.start(
          o.getOrElse("port", "8080").toInt, InMemoryKVStore)
        println(s"[graft] serve: synced $n users; GET http://localhost:${server.port}/features/online/{user_id}")
        Thread.currentThread().join()

      case "offline-lookup" =>
        val o = parseArgs(args.tail)
        FeatureLookup.offlineFromTable(spark, fetcher,
          o("features-table"), o("user-id"), o("as-of")) match {
          case Some(row) => println(s"[graft] offline-lookup: $row")
          case None => println(s"[graft] offline-lookup: no snapshot for ${o("user-id")} (404)")
        }

      case other =>
        println(s"Unknown pipeline: $other\n$usage")
        sys.exit(1)
    }
  }

  /** Naive `--key value` pair parsing (reference: App.scala:150-156). */
  def parseArgs(args: Seq[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Seq(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def kvFactory(kind: String): () => KVClient = kind match {
    case "memory" => () => InMemoryKVStore
    case other => throw new IllegalArgumentException(
      s"unknown --kv '$other': this offline build ships only 'memory'; " +
        "implement graft.sources.KVClient over your store's driver and register it here")
  }

  private val usage =
    """Usage: <pipeline> [--flag value ...]
      |
      |Pipelines:
      |  backfill           --events-raw-path <path> --output-table <table>
      |                     --start-date <date> --end-date <date>
      |                     [--incremental true]
      |  point-in-time-join --labels-path <path> --features-table <table>
      |                     --output-path <path>
      |  online-sync        --features-table <table> [--hours-back <n=24>]
      |                     [--cutoff <date>] [--kv memory]
      |  offline-lookup     --features-table <table> --user-id <id> --as-of <date>
      |  serve              --features-table <table> [--port <p=8080>]
      |                     [--hours-back <n=24>] [--cutoff <date>]
      |""".stripMargin
}
