package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.{Fetcher, Writer}

/** In-memory I/O doubles (reference pattern: TestWriter.scala:16-92,
  * TestFetcher.scala:17-88): written DataFrames are materialized into a
  * shared map keyed by path/table-name; reads rebuild real DataFrames, so a
  * genuine local Spark session still executes every transformation — only
  * the storage boundary is faked.
  */
class InMemoryStorage {
  val rows: mutable.Map[String, Seq[Row]] = mutable.Map.empty
  val schemas: mutable.Map[String, StructType] = mutable.Map.empty
  /** Sentinel marker files: "dir/name" keys (the Writer.putMarker double). */
  val markers: mutable.Set[String] = mutable.Set.empty

  def write(key: String, df: DataFrame, mode: String): Unit = synchronized {
    val data = df.collect().toSeq
    mode match {
      case "overwrite" | "error" | "errorifexists" =>
        rows(key) = data; schemas(key) = df.schema
      case "append" =>
        rows(key) = rows.getOrElse(key, Seq.empty) ++ data
        schemas(key) = df.schema
      case "ignore" =>
        if (!rows.contains(key)) { rows(key) = data; schemas(key) = df.schema }
      case other => throw new IllegalArgumentException(s"mode $other")
    }
  }

  def contains(key: String): Boolean = synchronized { rows.contains(key) }

  def read(spark: SparkSession, key: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows(key), 2), schemas(key))

  def clear(): Unit = synchronized { rows.clear(); schemas.clear(); markers.clear() }
}

class TestFetcher(storage: InMemoryStorage) extends Fetcher {
  override def exists(spark: SparkSession, path: String): Boolean =
    storage.contains(path)
  override def readParquet(spark: SparkSession, path: String,
      schema: Option[StructType]): DataFrame = storage.read(spark, path)
  override def readJson(spark: SparkSession, path: String,
      schema: Option[StructType]): DataFrame = storage.read(spark, path)
  override def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType], header: Boolean,
      delimiter: String): DataFrame = storage.read(spark, path)
  override def readTable(spark: SparkSession, tableName: String): DataFrame =
    storage.read(spark, tableName)
  override def listMarkers(spark: SparkSession, dir: String): Seq[String] =
    storage.synchronized {
      storage.markers.toSeq.collect {
        case m if m.startsWith(dir + "/") => m.stripPrefix(dir + "/")
      }
    }
}

class TestWriter(storage: InMemoryStorage) extends Writer {
  override def writeParquet(df: DataFrame, path: String, mode: String,
      partitionBy: Seq[String]): Unit = storage.write(path, df, mode)
  override def writeJson(df: DataFrame, path: String, mode: String): Unit =
    storage.write(path, df, mode)
  override def writeCsv(df: DataFrame, path: String, mode: String,
      header: Boolean, delimiter: String): Unit = storage.write(path, df, mode)
  override def insertOverwriteTable(df: DataFrame, tableName: String,
      partitionBy: Seq[String]): Unit = storage.write(tableName, df, "overwrite")

  override def insertOverwriteBucketedTable(df: DataFrame, tableName: String,
      numBuckets: Int, bucketCol: String,
      partitionBy: Seq[String]): Unit = storage.write(tableName, df, "overwrite")

  override def putMarker(spark: SparkSession, dir: String, name: String): Unit =
    storage.synchronized { storage.markers += s"$dir/$name"; () }
  override def deleteMarker(spark: SparkSession, dir: String, name: String): Unit =
    storage.synchronized { storage.markers -= s"$dir/$name"; () }

  /** Dynamic-partition-overwrite emulation: replace stored rows whose
    * partition values appear in `df`, keep all others.
    */
  override def overwritePartitions(df: DataFrame, tableName: String,
      partitionBy: Seq[String]): Unit = storage.synchronized {
    storage.rows.get(tableName) match {
      case None => storage.write(tableName, df, "overwrite")
      case Some(existing) =>
        val idx = partitionBy.map(df.schema.fieldIndex)
        val newRows = df.collect().toSeq
        val touched = newRows.map(r => idx.map(r.get)).toSet
        val oldSchema = storage.schemas(tableName)
        val oldIdx = partitionBy.map(oldSchema.fieldIndex)
        storage.rows(tableName) =
          existing.filterNot(r => touched.contains(oldIdx.map(r.get))) ++ newRows
    }
  }
}
