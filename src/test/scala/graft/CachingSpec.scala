package graft

import org.apache.spark.storage.StorageLevel

/** The bounded cache registry backs every library-internal persist — its
  * FIFO bound and plan-aware eviction are load-bearing for long-lived
  * sessions, so pin them. */
class CachingSpec extends SparkSpec {

  test("track bounds live entries and unpersists evictees") {
    Caching.clear()
    val dfs = (0 until Caching.MaxEntries + 3).map(i =>
      Caching.track(spark.range(100 + i).toDF("v")))
    assert(Caching.size == Caching.MaxEntries)
    // the first three (FIFO) evictees are actually unpersisted
    dfs.take(3).foreach(df =>
      assert(df.storageLevel == StorageLevel.NONE, "evictee still cached"))
    dfs.drop(3).foreach(df => assert(df.storageLevel != StorageLevel.NONE))
    Caching.clear()
    assert(Caching.size == 0)
    dfs.foreach(df => assert(df.storageLevel == StorageLevel.NONE))
  }

  test("plan-identical re-track does not tear the shared cache entry") {
    Caching.clear()
    val a = Caching.track(spark.range(42).toDF("v"))
    // fill the queue so `a` becomes the eviction candidate, with the LAST
    // entry sharing a's plan — eviction must skip unpersisting it
    (0 until Caching.MaxEntries - 1).foreach(i =>
      Caching.track(spark.range(500 + i).toDF("v")))
    val b = Caching.track(spark.range(42).toDF("v"))
    assert(Caching.size == Caching.MaxEntries)
    assert(b.storageLevel != StorageLevel.NONE,
      "shared plan entry was unpersisted by FIFO eviction")
    Caching.clear()
  }
}
