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
      inputRows: Long, stateRows: Long, droppedByWatermark: Long = 0L)

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
      val ops = Option(p.stateOperators).toSeq.flatten
      val state = ops.map(_.numRowsTotal).sum
      // J7: the late-data audit counter — rows the watermark excluded
      // from stateful operators. At 100 TB/day this is the SLO number
      // a pipeline alerts on (silent late-drop = silent data loss; a
      // rising curve means the watermark delay no longer matches the
      // source's real lateness distribution).
      val dropped = ops.map(_.numRowsDroppedByWatermark).sum
      progress.add(StreamProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        state, dropped))
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

    def snapshot: Seq[StreamProgress] = progress.asScala.toSeq

    def toJson: String = snapshot.map { m =>
      s"""{"query":"${Monitor.jsonEscape(m.queryName)}","batch_id":${m.batchId},"input_rows":${m.inputRows},"state_rows":${m.stateRows},"late_dropped":${m.droppedByWatermark}}"""
    }.mkString("[", ",", "]")
  }

  def registerStreaming(spark: SparkSession): StreamingMetricsCollector = {
    val c = new StreamingMetricsCollector
    spark.streams.addListener(c)
    c
  }

  final case class TaskBytes(shuffleRead: Long, shuffleWrite: Long,
      spill: Long, input: Long = 0L) {
    def -(o: TaskBytes): TaskBytes = TaskBytes(shuffleRead - o.shuffleRead,
      shuffleWrite - o.shuffleWrite, spill - o.spill, input - o.input)
  }

  /** J3: cumulative task-level byte counters — shuffle read/write and
    * spill from task-end events. `delta()` reads-and-remarks so a
    * caller can bracket a query and attribute the bytes it moved (the
    * bench emits these per query). At 100 TB bytes-shuffled IS the
    * cost model — wall seconds on a shared cluster are noise, bytes
    * are physics; a query whose time regressed but whose bytes didn't
    * was a co-tenant, not a plan change (the r7 ev_markov episode).
    * Listener-bus delivery is asynchronous, so a delta can lag the
    * action's return by the bus drain — per-query MB attribution, not
    * accounting-exact. */
  final class TaskMetricsTracker extends org.apache.spark.scheduler.SparkListener {
    private val read = new java.util.concurrent.atomic.AtomicLong
    private val write = new java.util.concurrent.atomic.AtomicLong
    private val spill = new java.util.concurrent.atomic.AtomicLong
    private val input = new java.util.concurrent.atomic.AtomicLong
    @volatile private var mark = TaskBytes(0, 0, 0, 0)

    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        // K48: source bytes actually read — the live-read half of the
        // row-group pruning story (planned bytes live in RgPrunePlan)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }

    def totals: TaskBytes = TaskBytes(read.get, write.get, spill.get, input.get)

    /** Bytes since the previous delta()/construction; re-marks. */
    def delta(): TaskBytes = synchronized {
      val now = totals; val d = now - mark; mark = now; d
    }

    /** delta() after the async listener bus has settled: onTaskEnd
      * events can still be in flight when an action returns, so an
      * immediate delta() mis-attributes the stragglers to the NEXT
      * bracket. Polls `totals` until stable (bounded), then marks —
      * use at bracket boundaries whose attribution matters. */
    def settledDelta(stableChecks: Int = 2, pollMs: Long = 20,
        maxPolls: Int = 50): TaskBytes = {
      var last = totals
      var stable = 0
      var polls = 0
      while (stable < stableChecks && polls < maxPolls) {
        Thread.sleep(pollMs)
        val now = totals
        if (now == last) stable += 1 else { stable = 0; last = now }
        polls += 1
      }
      delta()
    }
  }

  def registerTasks(spark: SparkSession): TaskMetricsTracker = {
    val t = new TaskMetricsTracker
    spark.sparkContext.addSparkListener(t)
    t
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
