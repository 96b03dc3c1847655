package graft.monitor

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** J9 streaming face: windowed PSI cells against a FROZEN baseline,
  * stream=batch pinned including a cell split across micro-batches
  * and the edge-bin clamp for values beyond the calibration range. */
class MonitorStreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("J9 streaming PSI cells + finishing match the batch run of the same functions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // frozen baseline over cents [100, 1099]: width (1099-100)/10+1 = 100
    val minC = 100L; val maxC = 1099L
    val baseline = Seq(
      ("click", 0, 40L), ("click", 5, 40L), ("click", 9, 20L),
      ("view", 2, 50L), ("view", 7, 50L),
    ).toDF("event_type", "bucket", "a_n")
    // hour-0 (click, bucket 0) gets events from BOTH micro-batches;
    // 99.0 (cents 9900) clamps into bucket 9; 0.5 (cents 50 < minC)
    // clamps into bucket 0
    val evs = Seq(
      (ts(1), "click", 1.2),    // cents 120 -> bucket 0
      (ts(5), "view", 3.5),     // 350 -> bucket 2
      (ts(8), "click", 1.5),    // 150 -> bucket 0 (same cell, batch 2)
      (ts(20), "click", 99.0),  // 9900 -> clamp bucket 9
      (ts(70), "click", 0.5),   // 50 -> clamp bucket 0, hour 1
      (ts(75), "view", 6.5),    // 650 -> bucket 5
    )
    val mem = MemoryStream[(Timestamp, String, Double)]
    val asEv = (df: org.apache.spark.sql.DataFrame) =>
      df.toDF("ts", "event_type", "value")
    val q = MonitorStreaming.psiCells(asEv(mem.toDF()), minC, maxC)
      .writeStream.format("memory").queryName("psi_cells")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(2): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2): _*)
      q.processAllAvailable()
      mem.addData((ts(100000), "flush", 1.0)); q.processAllAvailable()
      mem.addData((ts(200000), "flush", 1.0)); q.processAllAvailable()
      val streamedCells = spark.table("psi_cells")
        .filter(col("event_type") =!= "flush")
      def cells(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getInt(2), r.getLong(3))).toSet
      val batchCells = MonitorStreaming.psiCells(asEv(evs.toDF()), minC, maxC)
      assert(cells(streamedCells).nonEmpty &&
        cells(streamedCells) == cells(batchCells),
        s"streamed ${cells(streamedCells)} vs batch ${cells(batchCells)}")
      // the split cell merged: hour-0 (click, 0) counts 2; the clamp
      // legs landed in buckets 9 and 0
      assert(cells(streamedCells).exists(c =>
        c._2 == "click" && c._3 == 0 && c._4 == 2L), "split cell must merge")
      assert(cells(streamedCells).exists(c => c._2 == "click" && c._3 == 9),
        "out-of-range value must clamp into the top bin")
      // finishing agrees stream vs batch, and drift is visible: the
      // click windows' mass sits far from the baseline's spread
      def psi(df: org.apache.spark.sql.DataFrame) =
        MonitorStreaming.psiFromCells(df, baseline)
          .collect().map(r => (r.getTimestamp(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
      val sp = psi(streamedCells)
      assert(sp == psi(batchCells), "finishing must agree stream vs batch")
      assert(sp.forall(_._5 > 0.0), s"drifted windows must score psi > 0: $sp")
    } finally q.stop()
  }
}
