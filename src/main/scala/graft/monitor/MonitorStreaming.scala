package graft.monitor

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J9 STREAMING face (r13): drift monitoring as a production pipeline
  * actually deploys it — the BASELINE window is frozen (yesterday's
  * corpus: band edges and expected counts fixed up front), and the
  * live stream accumulates per-ingest-window bucket cells that the
  * finishing pass scores against that baseline. The batch J9 face
  * (dq_drift) splits one bounded frame at its midpoint; the streaming
  * face is the unbounded half of the same contract, following the
  * I13/I14 incremental-half / batch-finish split.
  *
  * State per open (window, event_type, bucket) cell is ONE counter;
  * band edges are integer-exact cents arithmetic frozen from the
  * baseline (values outside the baseline's range clamp into the edge
  * bins — the K5 histogram discipline: a frozen-edge monitor must
  * accept drift beyond its calibration range, and the edge-bin mass
  * IS that signal). */
object MonitorStreaming {

  /** Bucket count — matches the batch J9 face. */
  val PsiBuckets = 10

  /** Incremental half: per-(ingest-window, event_type, bucket) counts
    * with the band edges FROZEN from the baseline's [minC, maxC]
    * cents range. `events` needs (ts, event_type, value). */
  def psiCells(events: DataFrame, minC: Long, maxC: Long,
      windowDur: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val width = (maxC - minC) / PsiBuckets + 1
    val cents = round(col("value") * 100).cast("long")
    events.withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("event_type"),
        greatest(cents - minC, lit(0L)).as("_off"))
      // `div`, not `/`: Spark's / on longs is DOUBLE division
      .select(col("ts"), col("event_type"),
        least(expr(s"_off div $width"), lit((PsiBuckets - 1).toLong))
          .cast("int").as("bucket"))
      .groupBy(window(col("ts"), windowDur).as("w"),
        col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("bucket"), col("n"))
  }

  /** Finishing: PSI per (window, event_type) from emitted cells
    * against the baseline's per-(event_type, bucket) counts —
    * the SAME dense-grid + Laplace-smoothed fold as the batch face
    * (baseline plays 'a', the window plays 'b'). `baseline` needs
    * (event_type, bucket, a_n). */
  def psiFromCells(cells: DataFrame, baseline: DataFrame): DataFrame = {
    val spark = cells.sparkSession
    // the grid branch re-aliases its keys at the source: both
    // finishing branches read the SAME cells frame, and same-id join
    // sides trip the analyzer on streaming memory-sink views (the
    // TextStreaming.corpusStatsFromCells lesson)
    val grid = cells.select(col("window_start").as("g_ws"),
        col("event_type").as("g_et")).distinct()
      .crossJoin(spark.range(PsiBuckets)
        .select(col("id").cast("int").as("g_bucket")))
    val dense = grid
      .join(baseline, col("g_et") === col("event_type") &&
        col("g_bucket") === col("bucket"), "left")
      .drop("event_type", "bucket")
      .join(cells, col("g_ws") === col("window_start") &&
        col("g_et") === col("event_type") &&
        col("g_bucket") === col("bucket"), "left")
      .select(col("g_ws").as("window_start"), col("g_et").as("event_type"),
        col("g_bucket").as("bucket"),
        coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("n"), lit(0L)).as("b_n"))
    val tot = dense.groupBy("window_start", "event_type")
      .agg(sum("a_n").as("a_total"), sum("b_n").as("b_total"))
    val p = (col("a_n") + 1).cast("double") / (col("a_total") + PsiBuckets)
    val q = (col("b_n") + 1).cast("double") / (col("b_total") + PsiBuckets)
    dense.join(tot, Seq("window_start", "event_type"))
      .withColumn("_term", (p - q) * log(p / q))
      .groupBy(col("window_start"), col("event_type"),
        col("a_total"), col("b_total"))
      .agg(round(sum(col("_term")), 4).as("psi"))
      .select("window_start", "event_type", "a_total", "b_total", "psi")
  }
}
