package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared persist policy for operators exposing a `storage` parameter. */
private[operators] object Caching {

  /** persist unless the caller opted out with StorageLevel.NONE — or the
    * plan is ALREADY cached (`df.storageLevel` is a CacheManager lookup by
    * logical plan, so this also detects an identical plan persisted by an
    * earlier operator in the same session, e.g. the shingle-set stage
    * shared by the minhash/cluster/pipeline queries). Re-persisting would
    * be a no-op plus a "Asked to cache already cached data" warning per
    * call.
    */
  def maybePersist(df: DataFrame, storage: StorageLevel): DataFrame =
    persistIfNew(df, storage)._1

  /** [[maybePersist]] plus OWNERSHIP: returns whether THIS call persisted
    * the plan. Callers that later unpersist must gate on it — blindly
    * unpersisting would evict a cache entry some earlier operator in the
    * session still relies on (the skip above makes shared entries normal,
    * so eviction must stay with the owner).
    */
  def persistIfNew(df: DataFrame, storage: StorageLevel): (DataFrame, Boolean) =
    if (storage == StorageLevel.NONE || df.storageLevel != StorageLevel.NONE) (df, false)
    else (df.persist(storage), true)
}
