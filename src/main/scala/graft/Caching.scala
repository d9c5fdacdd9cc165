package graft

import org.apache.spark.sql.DataFrame

/** Bounded registry for the library's internal `persist()` calls (the
  * Insights bases, the BM25 term-frequency table, LSH pair graphs feeding
  * iterative consumers).
  *
  * Spark's own cache is LRU over storage memory, but entries for
  * DataFrames the caller never sees cannot be unpersisted by the caller —
  * over a long-lived session they accumulate as clutter even when evicted
  * from memory. This registry caps the number of live library-internal
  * cache entries (FIFO beyond `MaxEntries`) and offers an explicit
  * [[clear]] for batch drivers between jobs.
  *
  * Eviction is plan-aware: Spark's CacheManager keys entries by logical
  * plan, so plan-identical DataFrames share ONE entry (that sharing is
  * what makes repeated endpoint calls cheap). An older handle is only
  * unpersisted when no newer tracked handle has the same plan, otherwise
  * eviction would tear the shared entry out from under the newer call.
  */
object Caching {

  val MaxEntries = 16

  private val tracked = scala.collection.mutable.Queue.empty[DataFrame]

  /** Persist `df` and register it; evicts the oldest tracked entries
    * beyond [[MaxEntries]]. Returns `df`. */
  def track(df: DataFrame): DataFrame = synchronized {
    df.persist()
    tracked.enqueue(df)
    while (tracked.size > MaxEntries) {
      val old = tracked.dequeue()
      val oldPlan = old.queryExecution.analyzed
      if (!tracked.exists(_.queryExecution.analyzed.sameResult(oldPlan)))
        old.unpersist(blocking = false)
    }
    df
  }

  /** Unpersist every tracked entry (batch drivers, test teardown). */
  def clear(): Unit = synchronized {
    tracked.dequeueAll(_ => true).foreach(_.unpersist(blocking = false))
  }

  /** Number of currently tracked entries (diagnostics). */
  def size: Int = synchronized(tracked.size)
}
