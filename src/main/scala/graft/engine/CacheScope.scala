package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Session-wide registry for operator-persisted intermediates.
  *
  * Several operators (Dedup's shingle/signature/fingerprint frames, the
  * x17 lang-id frame) MUST persist an intermediate: Catalyst inlines
  * projected aliases into every consumer and lambda-bearing expressions
  * get no subexpression elimination, so without a materialization barrier
  * the expensive expression re-evaluates once per consumer. But the
  * operator returns a LAZY frame — it cannot unpersist before the
  * caller's terminal action, and never unpersisting leaks storage memory
  * across a long session (observed: 52-query bench accumulating blocks →
  * eviction churn).
  *
  * Contract: operators register what they persist via [[persistTracked]]
  * (or [[track]] for frames they persisted themselves); whoever owns the
  * terminal action — the bench/verify runners after each query, the HTTP
  * server after each request — calls [[drain]] to unpersist everything
  * registered since the last drain. Draining after the action is safe:
  * the cache only exists to dedupe work WITHIN one query's DAG.
  */
object CacheScope {
  // The registry is session-global and drains assume one query in flight
  // at a time (Bench/Verify are sequential; GraftServer's cube surface
  // never registers frames). A concurrent multi-query driver would need
  // per-query scopes — thread the scope through the operator calls.
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for the next [[drain]]. */
  def persistTracked[T <: Dataset[_]](ds: T): T = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Register an already-persisted frame for the next [[drain]]. */
  def track[T <: Dataset[_]](ds: T): T = { tracked.add(ds); ds }

  /** Unpersist every tracked frame (non-blocking). Idempotent. */
  def drain(): Unit = {
    var ds = tracked.poll()
    while (ds != null) { ds.unpersist(blocking = false); ds = tracked.poll() }
  }
}
