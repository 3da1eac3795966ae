package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-lifetime artifact registry with EXPLICIT release.
  *
  * Several operators materialize derived artifacts once per (session, input
  * dir) and serve every subsequent query from them — the trained IVF index
  * (operators/Similarity), the decontamination blocklist + its broadcast
  * bloom filter (operators/CorpusStats), the streaming denylist
  * (streaming/StreamingQueries), the mixture-balance counts
  * (operators/Pipeline). That amortization is the right call at 100 TB
  * (an index is storage, not a recomputed view), but pinned executor
  * storage and driver broadcasts must also be RELEASABLE: a long-lived
  * session that has moved past a corpus should not accrete dead caches
  * forever. This registry is the one place all of those live, keyed by
  * (session, artifact key), each with a release hook (unpersist /
  * broadcast destroy) that [[release]] runs and forgets.
  *
  * Assumptions (documented, test-pinned in ArtifactsSpec):
  *  - artifact inputs are immutable per (session, dir) — re-deriving after
  *    the underlying files changed requires a [[release]] first;
  *  - release is cooperative: callers stop using handed-out DataFrames
  *    before releasing (Spark unpersist is safe mid-query — it degrades
  *    to recompute — but a destroyed broadcast is not).
  */
object Artifacts {

  private final case class Entry(value: AnyRef, releaseFn: () => Unit)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Entry]()

  /** Memoize an artifact with an explicit release hook. `build` runs at
    * most once per (session, key); the returned value is shared by every
    * caller until [[release]].
    */
  def cached[T <: AnyRef](s: SparkSession, key: String)(
      build: => (T, () => Unit)): T =
    entries.computeIfAbsent((s, key), { _ =>
      val (v, rel) = build
      Entry(v, rel)
    }).value.asInstanceOf[T]

  /** The common case: a persisted DataFrame whose release is unpersist. */
  def cachedDf(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached[DataFrame](s, key) {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      (df, () => { df.unpersist(blocking = true); () })
    }

  /** Release every artifact registered for `s`: run each release hook
    * (unpersist cached plans, destroy broadcasts) and forget the entries,
    * so the next query rebuilds from scratch. Call when a session is done
    * with a corpus (or before stopping it — entries keyed by a stopped
    * session would otherwise stay strongly referenced here).
    */
  def release(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val keys = entries.keySet.asScala.filter(_._1 eq s).toList
    keys.foreach { k =>
      val e = entries.remove(k)
      if (e != null) e.releaseFn()
    }
  }

  /** Registered artifact count for a session (test/observability hook). */
  def registered(s: SparkSession): Int = {
    import scala.jdk.CollectionConverters._
    entries.keySet.asScala.count(_._1 eq s)
  }
}
