package graft

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo of analyzed relations (Tables' fixture reads,
  * ArtifactBuild's immutable-artifact reads), WEAKLY keyed by the
  * session itself: a session's entries become collectable with the
  * session, so a long-lived multi-session driver no longer accretes
  * dead sessions' relations, and the identity-hash collision a
  * `(identityHashCode, path)` key admitted after GC is structurally
  * impossible — the key IS the session reference.
  *
  * SparkSession does not override equals/hashCode, so WeakHashMap's
  * equals-based lookup degenerates to exactly the identity semantics
  * the old keying intended. The outer map is lock-synchronized (reads
  * are driver-side and rare); per-session inner maps stay concurrent
  * for the computeIfAbsent fast path. */
private[graft] final class SessionCache[V] {
  private val bySession = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, V]]()

  def get(s: SparkSession, key: String)(build: => V): V = {
    val inner = bySession.synchronized {
      bySession.computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, V]())
    }
    inner.computeIfAbsent(key, _ => build)
  }
}
