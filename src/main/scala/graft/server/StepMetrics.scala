package graft.server

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-step row metrics — the analog of the reference's
  * `miso-common/src/metrics.rs` step counters (every operator increments
  * `workflow_step_rows{step}`), re-expressed Spark-first: each physical
  * operator already maintains a `numOutputRows` SQLMetric, so a
  * QueryExecutionListener harvests them per executed plan instead of
  * every operator hand-counting. Counters accumulate per operator name
  * plus total queries and wall time, rendered Prometheus-style by
  * [[render]] for the server's `GET /metrics`.
  */
final class StepMetricsListener extends QueryExecutionListener {
  private[server] val stepRows = TrieMap[String, Long]()
  private val queriesOk = new java.util.concurrent.atomic.AtomicLong(0)
  private val queriesFailed = new java.util.concurrent.atomic.AtomicLong(0)
  private val wallNanos = new java.util.concurrent.atomic.AtomicLong(0)

  // Plain TreeNode traversal stops at AQE boundaries: AdaptiveSparkPlanExec
  // and the QueryStageExec leaves of its final plan both hide their real
  // subtrees outside `children` — unwrap them explicitly.
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
    case s: QueryStageExec => walk(s.plan)(f)
    case node =>
      f(node)
      node.children.foreach(walk(_)(f))
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    queriesOk.incrementAndGet()
    wallNanos.addAndGet(durationNs)
    try {
      walk(qe.executedPlan) { node =>
        node.metrics.get("numOutputRows").foreach { m =>
          val key = node.nodeName.takeWhile(_ != '(').trim
          stepRows.updateWith(key) {
            case Some(v) => Some(v + m.value)
            case None => Some(m.value)
          }
        }
      }
    } catch { case _: Throwable => () } // metrics must never break a query
  }

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = {
    queriesFailed.incrementAndGet()
  }

  /** Prometheus-style text exposition. */
  def render: String = {
    val sb = new StringBuilder
    sb ++= s"graft_queries_total{outcome=\"success\"} ${queriesOk.get()}\n"
    sb ++= s"graft_queries_total{outcome=\"failure\"} ${queriesFailed.get()}\n"
    sb ++= s"graft_query_wall_seconds_total ${wallNanos.get() / 1e9}\n"
    stepRows.toSeq.sortBy(_._1).foreach { case (step, rows) =>
      sb ++= s"graft_step_rows{step=\"$step\"} $rows\n"
    }
    sb.toString
  }
}
