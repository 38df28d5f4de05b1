package graft.pipeline

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd}

import scala.collection.concurrent.TrieMap

/** Per-executor task-outcome health — the engine-side facts behind the
  * reference's worker-health view (src/pipeline/api/main.py:441
  * `get_workers_health`: per-worker heartbeat/failure detail on top of
  * the plain inventory). Spark's public `StatusTracker` exposes the
  * INVENTORY (executors, running tasks, storage memory) but not task
  * failures, so this listener accumulates them from the event bus:
  * per-executor succeeded/failed task counts, the last task-finish
  * timestamp (the heartbeat analog), and removal with the scheduler's
  * reason. Installed once per application by [[graft.Sessions.tune]]
  * (and defensively by the CLI `workers` subcommand), so counts cover
  * the session's lifetime, not just the query that asks.
  *
  * Scale shape: state is one small record per executor — 1000 executors
  * is 1000 entries — and the listener does O(1) work per task end, off
  * the task path (the async listener bus). */
object WorkerHealth {

  /** One executor's accumulated health facts. */
  final case class ExecutorHealth(failed: Long = 0L, succeeded: Long = 0L,
                                  lastTaskMs: Long = 0L,
                                  removed: Boolean = false,
                                  removeReason: String = "") {
    /** Unhealthy = removed from the cluster, or failing at least as
      * often as succeeding (an idle or drained-but-alive executor stays
      * healthy; one flake on a busy executor does not flag it). */
    def unhealthy: Boolean =
      removed || (failed > 0 && failed >= math.max(succeeded, 1L))
  }

  /** Keyed by (applicationId, executorId): a JVM that creates a second
    * SparkContext (tests, long-lived drivers) must not mix the prior
    * app's entries — executor ids like "driver" and "0" collide across
    * applications — into the new app's health view. */
  private val counts = TrieMap[(String, String), ExecutorHealth]()
  private val installedApps = TrieMap[String, Boolean]()

  /** Single-threaded by the listener bus contract (one dispatch thread
    * per listener), so read-modify-write on the map is safe. The
    * listener captures its application id at install time — listener
    * instances are per-app, so each writes only its own namespace. */
  private final class Listener(appId: String) extends SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val ok = e.reason == org.apache.spark.Success
      val key = (appId, e.taskInfo.executorId)
      val prev = counts.getOrElse(key, ExecutorHealth())
      counts(key) = prev.copy(
        failed = prev.failed + (if (ok) 0L else 1L),
        succeeded = prev.succeeded + (if (ok) 1L else 0L),
        lastTaskMs = math.max(prev.lastTaskMs, e.taskInfo.finishTime))
    }
    override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
      val key = (appId, e.executorId)
      val prev = counts.getOrElse(key, ExecutorHealth())
      counts(key) = prev.copy(removed = true, removeReason = e.reason)
    }
  }

  /** Attach the listener once per application (idempotent across the
    * many [[graft.Sessions.tune]] call sites). */
  def install(sc: SparkContext): Unit =
    if (installedApps.putIfAbsent(sc.applicationId, true).isEmpty)
      sc.addSparkListener(new Listener(sc.applicationId))

  /** Current per-executor health OF THE GIVEN APPLICATION, keyed by
    * executor id ("driver" in local mode). */
  def snapshot(sc: SparkContext): Map[String, ExecutorHealth] = {
    val app = sc.applicationId
    counts.collect { case ((a, e), h) if a == app => e -> h }.toMap
  }
}
