package graft.operators

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Query result cache analog (ref src/Interpreters/Cache/QueryResultCache.cpp,
  * src/Processors/Transforms/StreamInQueryResultCacheTransform.h).
  *
  * The reference caches materialized result blocks keyed by the query AST
  * + relevant settings, with an entry cap and staleness eviction. The
  * Spark-native translation: key on the CANONICALIZED analyzed plan (the
  * engine's AST-after-normalization, so `SELECT a+1` and `SELECT 1+a`
  * share an entry exactly when Catalyst proves them equivalent) and store
  * a persisted DataFrame — Spark's InMemoryRelation IS the result-block
  * store, partition-distributed rather than driver-resident, which is the
  * 100 TB-safe shape (no collect; blocks live on executors and spill).
  *
  * LRU with a bounded entry count; `unpersist` on eviction releases the
  * executor memory eagerly. Thread-safe via the intrinsic lock (cache
  * admission is control-plane, never per-row).
  */
final class ResultCache(maxEntries: Int = 64) {

  private case class Entry(df: DataFrame, var lastUsed: Long)

  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private val tick = new AtomicLong(0)
  private val hitCount = new AtomicLong(0)
  private val missCount = new AtomicLong(0)

  private def keyOf(df: DataFrame): String =
    df.queryExecution.analyzed.canonicalized.toString

  /** Return a cached equivalent of `df`, admitting it on first sight.
    * The returned frame reads from the persisted result blocks; the
    * first action materializes them. */
  def cached(df: DataFrame): DataFrame = synchronized {
    val k = keyOf(df)
    entries.get(k) match {
      case Some(e) =>
        hitCount.incrementAndGet()
        e.lastUsed = tick.incrementAndGet()
        e.df
      case None =>
        missCount.incrementAndGet()
        if (entries.size >= maxEntries) {
          val (oldK, oldE) = entries.minBy(_._2.lastUsed)
          oldE.df.unpersist(blocking = false)
          entries.remove(oldK)
        }
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(k, Entry(p, tick.incrementAndGet()))
        p
    }
  }

  def hits: Long = hitCount.get
  def misses: Long = missCount.get
  def size: Int = synchronized(entries.size)

  /** Drop everything (reference SYSTEM DROP QUERY CACHE). */
  def clear(): Unit = synchronized {
    entries.valuesIterator.foreach(_.df.unpersist(blocking = false))
    entries.clear()
  }
}
