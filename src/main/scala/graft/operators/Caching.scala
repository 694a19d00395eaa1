package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared persist policy for operators exposing a `storage` parameter. */
private[operators] object Caching {

  /** persist unless the caller opted out with StorageLevel.NONE */
  def maybePersist(df: DataFrame, storage: StorageLevel): DataFrame =
    if (storage == StorageLevel.NONE) df else df.persist(storage)
}
