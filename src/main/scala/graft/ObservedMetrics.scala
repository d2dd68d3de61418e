package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}

/** Collects the work-unit counters queries self-report via
  * `Dataset.observe` (x45 matched pairs, x72 triplets, the banded
  * dedup pair counts) so the sweep ladder's per-unit-output
  * adjudication reads its denominator from the SAME run.
  *
  * Delivery is asynchronous (QueryExecutionListener rides the shared
  * LiveListenerBus), and the r16 harvest waited behind a fixed
  * `Thread.sleep` — at big-rung job counts the bus can lag past any
  * fixed grace period and the committed JSON silently holds a STALE
  * value (notably the warmup-scale one, since warmup executes the same
  * instrumented queries and the map is last-delivered-wins). This
  * class makes the read path deterministic, with no sleep:
  *
  *  - [[drain]] runs a sentinel observe query and polls until the
  *    sentinel's metric arrives. Per-queue listener delivery is FIFO,
  *    so the sentinel's arrival proves every earlier event was
  *    delivered; a timeout is returned (never swallowed) so a dropped
  *    event surfaces as `observed_drained:false` in the artifact
  *    instead of as a silently-stale number.
  *  - callers [[clear]] the map between the warmup and measured
  *    phases, so a warmup-scale value cannot survive into the measured
  *    harvest at all — the belt over the drain's braces.
  *
  * Values are rendered through [[Json.value]] (strings quoted,
  * non-finite doubles → null) so a future observe metric of any type
  * keeps the artifact line parseable. */
final class ObservedMetrics(spark: SparkSession) {
  private val map =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  spark.listenerManager.register(
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          val fields = row.schema.fieldNames.zipWithIndex.map {
            case (f, i) => Json.str(f) + ":" + Json.value(row.get(i))
          }.mkString("{", ",", "}")
          map.put(name, fields)
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })

  /** Drop everything harvested so far (phase boundary: warmup →
    * measured). */
  def clear(): Unit = map.clear()

  /** Deterministic bus drain: run a one-row sentinel query carrying
    * its own observe metric named `tag`, then poll (no fixed sleep)
    * until that metric lands in the map — FIFO delivery per listener
    * queue means every event from earlier queries has then been
    * delivered too. Returns false on timeout (bus overloaded or an
    * event dropped), which callers must record, not swallow. The
    * sentinel entry itself is removed from the harvest. */
  def drain(tag: String, timeoutMs: Long = 30000L): Boolean = {
    map.remove(tag)
    spark.range(1).observe(tag, count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!map.containsKey(tag) && System.nanoTime() < deadline)
      Thread.sleep(10)
    map.remove(tag) != null
  }

  /** The harvested metrics as one sorted JSON object. */
  def json: String = {
    import scala.jdk.CollectionConverters._
    map.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => Json.str(k) + ":" + v }
      .mkString("{", ",", "}")
  }
}
