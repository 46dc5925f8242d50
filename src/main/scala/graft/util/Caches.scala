package graft.util

import org.apache.spark.sql.Dataset
import java.util.concurrent.ConcurrentLinkedQueue

/** Registry for operator-internal caches.
  *
  * Operators cache derive-once artifacts (the dedup pair table, LM
  * count tables, IVF centroids) that the RETURNED DataFrame still
  * reads lazily — so the operator itself can never unpersist them,
  * and before this registry existed a 198-query session accumulated
  * every such cache for its whole lifetime (round-7 verdict item 3:
  * pinned memory + cross-query bench flattery). Routing `.cache()`
  * through [[TrackedDataset.cacheTracked]] records the handle;
  * session drivers (Verify between queries, Bench between timed
  * runs) call [[releaseAll]] once the query's outputs are
  * materialized.
  *
  * At 100 TB the same seam is where an engine would swap the cache
  * for a persisted parquet artifact — the registry is the session
  * (local-mode) twin of that lifecycle.
  */
object Caches {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  implicit final class TrackedDataset[T](private val ds: Dataset[T])
      extends AnyVal {

    /** `cache()` + register the handle for [[releaseAll]]. */
    def cacheTracked(): Dataset[T] = {
      val c = ds.cache()
      tracked.add(c)
      c
    }
  }

  /** Handles registered and not yet released. */
  def pinnedCount: Int = tracked.size()

  /** Unpersist every tracked cache (blocking, so a following timed
    * run really starts cold). Safe against already-released or
    * stopped-session handles.
    */
  def releaseAll(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      try d.unpersist(blocking = true)
      catch { case _: Throwable => () }
      d = tracked.poll()
    }
  }
}
