package graft.core

import org.apache.spark.sql.DataFrame

/** Registry of operator-OWNED persisted frames (VERDICT r8 #4): an
  * operator that caches a frame purely for its own plan (a register
  * table read three times, a quantized corpus read per Lloyd's
  * iteration) cannot unpersist it before returning — the returned
  * DataFrame is lazy and still references the cache. So the operator
  * declares ownership with [[own]], and the HARNESS (Verify after each
  * query's write, Bench after each timed run, tests that audit
  * storage) calls [[release]] once the result has materialized.
  * Across a 149-query session this keeps executor storage at the
  * session-shared frames only, instead of accumulating ~20
  * operator-local caches until LRU eviction (correctness was never at
  * risk — the leak inflated GC pressure and contaminated per-query
  * bench attribution).
  *
  * Frames shared ACROSS queries (the dedup shingle-set build — four
  * queries plan-match it via the CacheManager) are deliberately NOT
  * owned: see the annotation at their cache sites.
  */
object OwnedCaches {
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Declare `df` (already persisted) as owned by the current
    * operator invocation; returns it unchanged.
    */
  def own(df: DataFrame): DataFrame = { pending.add(df); df }

  /** Unpersist every owned frame registered since the last release.
    * Safe to call at any time: releasing a cache is a performance
    * decision, never a correctness one (the plan recomputes).
    */
  def release(): Unit = {
    var df = pending.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = pending.poll()
    }
  }

  private[graft] def pendingCount: Int = pending.size
}
