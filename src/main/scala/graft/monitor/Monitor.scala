package graft.monitor

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Job/query monitoring (SURVEY §2 J1) — the Spark-native equivalent of
  * the reference's per-job wall/cpu/mem JSON emitter
  * (Art-Knowledge-Graph-AWS/monitor.py:13-40 monitor_job): a
  * QueryExecutionListener records every completed query's wall time and
  * output rows from the EXECUTED plan's metrics (no extra actions, no
  * recomputation), and `timed` wraps arbitrary stages with the same
  * wall/cpu/mem envelope monitor.py reports.
  */
object Monitor {

  /** Complete JSON string escape (backslash, quote, all control chars)
    * — user-chosen query names and error messages both route through
    * here; a partial escape produced invalid JSON on a name containing
    * a newline. */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  final case class QueryMetric(name: String, durationMs: Double,
      outputRows: Long, error: Option[String])

  /** Collects per-query metrics; attach with `register`. */
  final class MetricsCollector extends QueryExecutionListener {
    private val metrics = new ConcurrentLinkedQueue[QueryMetric]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      metrics.add(QueryMetric(funcName, durationNs / 1e6, rows, None))
    }

    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
      metrics.add(QueryMetric(funcName, -1, -1, Some(ex.getMessage)))

    def snapshot: Seq[QueryMetric] = metrics.asScala.toSeq

    def toJson: String = snapshot.map { m =>
      val err = m.error.map(e => "\"" + Monitor.jsonEscape(e) + "\"").getOrElse("null")
      s"""{"name":"${Monitor.jsonEscape(m.name)}","duration_ms":${m.durationMs},"output_rows":${m.outputRows},"error":$err}"""
    }.mkString("[", ",", "]")
  }

  def register(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.listenerManager.register(c)
    c
  }

  final case class StreamProgress(queryName: String, batchId: Long,
      inputRows: Long, stateRows: Long)

  /** J2: per-micro-batch progress collector — the streaming face of
    * the J1 envelope (monitor.py's per-job record, emitted per batch):
    * input volume and state-store size per progress event, the two
    * numbers a 100 TB/day stream is actually operated on (throughput
    * and state growth; unbounded state = the classic slow leak a
    * watermark misconfiguration causes). */
  final class StreamingMetricsCollector
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val progress = new ConcurrentLinkedQueue[StreamProgress]()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val state = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      progress.add(StreamProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows, state))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

    def snapshot: Seq[StreamProgress] = progress.asScala.toSeq

    def toJson: String = snapshot.map { m =>
      s"""{"query":"${Monitor.jsonEscape(m.queryName)}","batch_id":${m.batchId},"input_rows":${m.inputRows},"state_rows":${m.stateRows}}"""
    }.mkString("[", ",", "]")
  }

  def registerStreaming(spark: SparkSession): StreamingMetricsCollector = {
    val c = new StreamingMetricsCollector
    spark.streams.addListener(c)
    c
  }

  /** Wall/cpu/heap envelope around a stage — monitor.py's per-job
    * record, emitted as one JSON line. */
  def timed[A](jobName: String)(body: => A): (A, String) = {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val rt = Runtime.getRuntime
    val cpu0 = os.getProcessCpuTime
    val t0 = System.nanoTime()
    val result = body
    val wallMs = (System.nanoTime() - t0) / 1e6
    val cpuMs = (os.getProcessCpuTime - cpu0) / 1e6
    val heapMb = (rt.totalMemory() - rt.freeMemory()) / 1e6
    val json =
      s"""{"job":"${jsonEscape(jobName)}","wall_ms":$wallMs,"cpu_ms":$cpuMs,"heap_mb":$heapMb}"""
    (result, json)
  }
}
