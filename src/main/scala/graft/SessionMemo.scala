package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for materialized (localCheckpoint-pinned) frames —
  * the detect-once caches (`lpaLabels`, the ANN exact ground truth).
  *
  * Keyed on the LIVE session object through identity (a WeakHashMap),
  * not `System.identityHashCode`: identity hash codes are reusable
  * after GC, so an (identityHashCode, dir) tuple key could hand a NEW
  * session a checkpoint-pinned frame bound to a dead one. With object
  * identity a new session can never observe another session's entries.
  *
  * Note on reclamation: the cached DataFrames strongly reference their
  * session (value → key), so WeakHashMap entries are not collectable
  * while cached — the map bounds STALENESS (no cross-session reuse),
  * not memory. Per-session content is one small pinned frame per
  * (query-family, dir) by construction.
  *
  * CONCURRENCY CONTRACT: memo consumers are single-threaded per
  * session — Verify/Bench/ScaleProbe all run queries sequentially, so
  * the get/putIfAbsent two-step's duplicate-compute window never
  * opens. If concurrent query execution is ever enabled, the losing
  * first-caller of a localCheckpoint-ing block would leak its
  * checkpoint's executor blocks until driver GC (the bench-distorting
  * residue ScaleProbe's hygiene note flags); guard each key with a
  * putIfAbsent-ed lazy holder (so `f` runs at most once) before
  * turning that on.
  */
object SessionMemo {
  private val memo = new java.util.WeakHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def getOrCompute(s: SparkSession, key: String,
                   f: => DataFrame): DataFrame = {
    val inner = memo.synchronized {
      var m = memo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        memo.put(s, m)
      }
      m
    }
    // NOT computeIfAbsent: memo blocks nest (the maintained-label memo
    // computes the base-label memo, which computes the pair memo), and
    // a nested computeIfAbsent whose key hashes to the same bin throws
    // "Recursive update" — the codebookCache lesson. The two-step is
    // reentrant; a concurrent duplicate compute is benign because every
    // memoized frame is deterministic (and pinned via localCheckpoint
    // by its producer where identity matters).
    val cached = inner.get(key)
    if (cached != null) return cached
    val v = f
    val prev = inner.putIfAbsent(key, v)
    if (prev != null) prev else v
  }
}
