package graft.multimodal

import graft.SparkSpec
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Configurator
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The 64 KB-codegen tripwire (r8 verdict #3). Twice now a
  * bounded-unroll binary parser spelled its shared sub-reads inline,
  * blew Janino's 64 KB generated-method limit, and silently fell back
  * to interpreted evaluation (mm_tiff_dims in r7, mm_exif_gps in r8 —
  * 6.6 s where its sibling read 0.78 s). The fallback is invisible to
  * correctness tests — results are identical, only ~8× slower — so the
  * check has to live in machinery, not memory: every mm_* projection
  * is executed here under a log probe on Spark's codegen loggers, and
  * ANY compile-failure / interpreted-fallback event is a test failure.
  * New parsers are checked at birth by being registered in
  * [[Multimodal.queries]].
  */
class CodegenFallbackSpec extends SparkSpec {

  /** Loggers that announce every codegen degradation path in Spark 4:
    * CodeGenerator logs the Janino CompileException (the "Code grows
    * beyond 64 KB" text), WholeStageCodegenExec logs both the
    * compile-failure fallback ("Whole-stage codegen disabled") and the
    * hugeMethodLimit bailout ("Found too long generated codes"). */
  private val codegenLoggers = Seq(
    "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
    "org.apache.spark.sql.execution.WholeStageCodegenExec")

  private val fallbackMarkers = Seq(
    "grows beyond 64 KB",
    "Whole-stage codegen disabled",
    "Found too long generated codes",
    "ailed to compile") // Failed/failed

  private def withCodegenProbe[A](body: => A): (A, Seq[String]) = {
    val hits = new ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender(
        "graft-codegen-probe", null, null, true, Array.empty) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (fallbackMarkers.exists(m.contains))
          hits.add(s"${e.getLoggerName}: ${m.take(300)}")
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    // the bailout paths log at WARN except hugeMethodLimit (INFO):
    // drop the two loggers to INFO for the probe's duration
    val prior = codegenLoggers.map(l => l -> cfg.getLoggerConfig(l).getLevel)
    codegenLoggers.foreach(Configurator.setLevel(_, Level.INFO))
    // additivity routes accepted events to root's appenders without
    // re-checking ancestor levels, so one root-attached appender sees
    // every event the two loggers accept
    cfg.getRootLogger.addAppender(appender, Level.INFO, null)
    ctx.updateLoggers()
    try (body, hits.asScala.toSeq)
    finally {
      cfg.getRootLogger.removeAppender("graft-codegen-probe")
      prior.foreach { case (l, lv) => Configurator.setLevel(l, lv) }
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("probe plumbing: a synthetic fallback event is captured") {
    val (_, hits) = withCodegenProbe {
      LogManager.getLogger(codegenLoggers.head)
        .warn("probe self-test: Code grows beyond 64 KB (synthetic)")
    }
    assert(hits.exists(_.contains("grows beyond 64 KB")),
      "the appender must see events on Spark's codegen logger")
  }

  test("probe end-to-end: a REAL codegen bailout is detected") {
    // force the hugeMethodLimit path on a genuine query: any compiled
    // method is "too long" at limit 10, so WholeStageCodegenExec takes
    // the same interpreted-fallback branch a 64 KB blowout takes and
    // logs the event the probe must catch
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "10")
    try {
      val (_, hits) = withCodegenProbe {
        Multimodal.queries.head._2(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      assert(hits.exists(_.contains("Found too long generated codes")),
        s"expected a bailout event through the real path, saw: $hits")
    } finally spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
  }

  test("no mm_* projection falls back to interpreted evaluation") {
    val (_, hits) = withCodegenProbe {
      Multimodal.queries.foreach { case (name, fn) =>
        // noop sink, NOT count(): count() lets Catalyst prune every
        // projected column, deleting the very expressions under test
        // from the plan; the noop sink consumes full rows so the
        // parser columns must all be generated and compiled
        val df = fn(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        assert(df.limit(1).count() > 0, s"$name returned no rows at $sfDir")
      }
    }
    assert(hits.isEmpty,
      s"codegen fallback detected:\n${hits.mkString("\n")}")
  }
}
