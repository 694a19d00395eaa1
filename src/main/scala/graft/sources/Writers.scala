package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-side platform abstraction (reference: platform/Writers.scala:27-110).
  *
  * Modes mirror `SaveMode` strings: overwrite | append | ignore | error.
  * `partitionBy` drives directory/partition layout — the features table is
  * partitioned by `day` so freshness / as-of filters prune partitions at
  * scale (reference: ProdWriter.scala:57-70, BackfillPipelineConfig.scala:31).
  */
trait Writer {

  /** Parquet sink (reference: ProdWriter.scala:23-35). */
  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Range-CLUSTERED parquet sink: rows are range-partitioned on
    * `clusterCols` and sorted within each file, so every output file (and
    * every parquet row group inside it) covers a narrow, pairwise-disjoint
    * key range. This is the data-LAYOUT lever for scan pruning at 100 TB:
    * parquet's min/max statistics then let a pushed key predicate skip
    * whole row groups — the same reads that scan everything on a
    * write-order layout, where every row group's [min, max] spans the full
    * key domain. Sorting costs one range shuffle at write time, paid once;
    * every selective read after that wins (WritersSpec asserts the
    * disjoint-range layout and that the plain writer does NOT have it).
    *
    * `numFiles` sizes the range partitioning (aim for ~128 MB-1 GB files
    * at scale); pass 0 to keep the input partitioning and only sort
    * within it (no extra shuffle — for data already clustered upstream).
    */
  def writeClusteredParquet(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int = 0, mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    require(numFiles >= 0, "numFiles must be >= 0")
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, cols: _*)
      else df
    ranged.sortWithinPartitions(cols: _*).write.mode(mode).parquet(path)
  }

  /** JSON sink (reference: ProdWriter.scala:37-42). */
  def writeJson(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** CSV sink (reference: ProdWriter.scala:44-55). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite",
      header: Boolean = true, delimiter: String = ","): Unit =
    df.write.mode(mode)
      .option("header", header.toString).option("delimiter", delimiter)
      .csv(path)

  /** Atomic full-table insert-overwrite into the session catalog
    * (reference: ProdWriter.scala:57-70 does the same against Iceberg).
    * Format is whatever the catalog defaults to (parquet here; Delta/Iceberg
    * in a deployment that registers those catalogs — the pipelines only name
    * this method, never a format).
    */
  def insertOverwriteTable(df: DataFrame, tableName: String,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    clearOrphanedLocation(df, tableName)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(tableName)
  }

  /** A session with a fresh catalog can find a stale table DIRECTORY left
    * by a previous session's warehouse; saveAsTable refuses to adopt it
    * (LOCATION_ALREADY_EXISTS). Insert-overwrite semantics replace the
    * table wholesale, so move the orphaned location ASIDE first — a rename,
    * not a delete: if the directory actually belongs to a table still live
    * in another metastore pointed at a shared warehouse, its data survives
    * at `<loc>.__orphan.<appId>` instead of being destroyed before the new
    * write even commits. A pre-existing aside dir with the same name is this
    * application's own earlier garbage and is removed first. The location
    * is derived from the owning DATABASE's registered locationUri (never a
    * guessed warehouse-relative path — a wrong guess could touch another
    * table's data); names whose database can't be resolved are left for
    * saveAsTable to report. A real deployment points the catalog at a
    * transactional format where orphaned locations cannot arise.
    */
  private def clearOrphanedLocation(df: DataFrame, tableName: String): Unit = {
    val spark = df.sparkSession
    // sweep stale asides on EVERY overwrite, not only the orphan branch:
    // once saveAsTable registers the table, tableExists is true forever in
    // a persistent metastore and a sweep gated behind it would never run
    resolveWarehouseLocation(spark, tableName).foreach { case (fs, loc) =>
      sweepStaleAsides(spark, fs, loc)
    }
    if (!spark.catalog.tableExists(tableName)) {
      resolveWarehouseLocation(spark, tableName).foreach { case (fs, loc) =>
        if (fs.exists(loc)) {
            val aside = new Path(
              loc.getParent, loc.getName + ".__orphan." + spark.sparkContext.applicationId)
            if (fs.exists(aside)) fs.delete(aside, true)
            // Hadoop rename reports failure by returning false, not
            // throwing — fail here with the real story rather than letting
            // saveAsTable die on LOCATION_ALREADY_EXISTS under a log line
            // claiming the location was cleared
            if (!fs.rename(loc, aside))
              throw new java.io.IOException(
                s"could not move orphaned table location $loc aside to $aside " +
                  s"before overwrite of $tableName (rename returned false)")
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"orphaned table location $loc moved aside to $aside before overwrite of $tableName")
        }
      }
    }
  }

  /** The table's default warehouse directory: `<db location>/<table>`,
    * derived from the owning DATABASE's registered locationUri (never a
    * guessed warehouse-relative path — a wrong guess could touch another
    * table's data). None when the name doesn't resolve to an existing
    * database.
    */
  private def resolveWarehouseLocation(
      spark: SparkSession, tableName: String): Option[(FileSystem, Path)] = {
    val parts = tableName.split('.').toSeq match {
      case "spark_catalog" +: rest => rest
      case other => other
    }
    val dbTable = parts match {
      case Seq(t) => Some((spark.catalog.currentDatabase, t))
      case Seq(d, t) => Some((d, t))
      case _ => None
    }
    dbTable.collect { case (db, tbl) if spark.catalog.databaseExists(db) =>
      val loc = new Path(new Path(spark.catalog.getDatabase(db).locationUri), tbl.toLowerCase)
      (loc.getFileSystem(spark.sparkContext.hadoopConfiguration), loc)
    }
  }

  /** Asides are keyed by application id, so every distinct app run that hits
    * an orphaned location leaves one behind — unbounded warehouse growth
    * unless something reaps them. Reap here, on the next overwrite of the
    * same table: delete `<table>.__orphan.*` siblings older than the
    * retention window (`spark.graft.orphanAsideRetentionHours`, default 168
    * = 7 days — long enough for an operator to notice the aside warning and
    * recover data from a genuinely shared warehouse), and log what is
    * retained so the pending garbage is visible, not silent.
    */
  private def sweepStaleAsides(spark: SparkSession, fs: FileSystem, loc: Path): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val retentionMs = spark.conf
      .get("spark.graft.orphanAsideRetentionHours", "168").toLong * 3600L * 1000L
    val cutoff = System.currentTimeMillis() - retentionMs
    val asides =
      try fs.globStatus(new Path(loc.getParent, loc.getName + ".__orphan.*"))
      catch { case _: java.io.FileNotFoundException => null }
    Option(asides).getOrElse(Array.empty).foreach { st =>
      if (st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, true))
          log.warn(s"deleted stale orphan aside ${st.getPath} " +
            s"(older than ${retentionMs / 3600000L}h)")
      } else {
        log.warn(s"retaining orphan aside ${st.getPath} until the " +
          s"${retentionMs / 3600000L}h retention window passes; delete it " +
          "manually once its data is confirmed recovered or unneeded")
      }
    }
  }

  /** Insert-overwrite a table BUCKETED by a key (and optionally
    * partitioned): rows are hash-clustered into `numBuckets` files per
    * partition by `bucketCol`, and the scan's output partitioning then
    * satisfies a downstream distribution requirement on that key — the
    * per-user window of the online sync reads a bucketed features table
    * WITHOUT an exchange (BucketedTableSpec), and a join's bucketed side
    * skips ITS exchange (the other side still shuffles; a union, as in the
    * as-of union plan, discards partitioning info entirely). The one-time
    * cost is the cluster-by at write.
    */
  def insertOverwriteBucketedTable(df: DataFrame, tableName: String,
      numBuckets: Int, bucketCol: String,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    clearOrphanedLocation(df, tableName)
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(tableName)
  }

  /** Replace ONLY the partitions present in `df`, leaving all others
    * untouched (dynamic partition overwrite). This is the incremental-write
    * primitive: a backfill of days [d1, d2] into a day-partitioned table
    * rewrites those day directories and nothing else — at 100 TB the
    * difference between touching a month and rewriting years. Falls back to
    * a full [[insertOverwriteTable]] when the table doesn't exist yet.
    *
    * `insertInto` matches columns BY POSITION (partition columns last in a
    * catalog table's schema), so the input is reordered by NAME against the
    * table's declared layout before writing.
    *
    * Overwrite mode: the per-writer `.option("partitionOverwriteMode",
    * "dynamic")` is honored only by the datasource-table insert path;
    * Hive-serde tables (the metastore catalog this repo runs against) read
    * the SESSION conf exclusively — verified: option-only leaves the full
    * table overwritten. So both are set: the option scopes the datasource
    * path per-write, and the session conf (try/finally restored) covers the
    * Hive path. The restore window is the one place a concurrent write on
    * the same session could observe the altered mode — documented residual,
    * removable only by a transactional catalog format.
    */
  def overwritePartitions(df: DataFrame, tableName: String,
      partitionBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(tableName)) {
      insertOverwriteTable(df, tableName, partitionBy)
    } else {
      val tableOrder = spark.table(tableName).columns
      val aligned = df.select(tableOrder.map(df.col).toIndexedSeq: _*)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try aligned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .insertInto(tableName)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

/** Production writer — trait defaults are production-grade. */
class ProdWriter extends Writer

object ProdWriter extends ProdWriter
