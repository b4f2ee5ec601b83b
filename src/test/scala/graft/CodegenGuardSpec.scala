package graft

import scala.collection.mutable

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Engine-wide guard against SILENT codegen degradation: a generated class
  * that fails Janino compilation makes Spark log an ERROR and fall back to
  * interpreted execution — the query stays correct, so nothing else catches
  * it, but the hot path quietly loses codegen (round 3 shipped exactly this:
  * a `private` Dataset row case class whose generated serializer could not
  * see the constructor, costing an interpreted boundary per row plus a
  * 22-frame stack trace in every bench run).
  *
  * Two independent tripwires, both over EVERY SparkEntry query at sf0.001:
  *  1. `spark.sql.codegen.factoryMode=CODEGEN_ONLY` — encoder/projection
  *     codegen failures THROW instead of falling back, so the materializing
  *     loop itself fails loudly;
  *  2. a log4j2 appender on the root logger — any `ERROR CodeGenerator`
  *     (expression/serializer compile failure) or "Whole-stage codegen
  *     disabled" WARN (whole-stage compile failure / hugeMethodLimit trip)
  *     that slips through under fallback-permitting confs fails the spec
  *     with the offending query named.
  */
class CodegenGuardSpec extends SparkSpecBase {

  private final class Capture extends AbstractAppender(
      "graft-codegen-capture", null, null, false, Property.EMPTY_ARRAY) {
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(event: LogEvent): Unit = {
      val logger = event.getLoggerName
      val msg    = event.getMessage.getFormattedMessage
      val compileError = event.getLevel.isMoreSpecificThan(Level.ERROR) &&
        logger.contains("CodeGenerator")
      val wholeStageFallback = msg.contains("Whole-stage codegen disabled")
      if (compileError || wholeStageFallback)
        hits.add(s"[$logger] ${msg.take(300)}")
    }
  }

  test("no query trips a codegen compile fallback (engine-wide)") {
    val ctx      = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config   = ctx.getConfiguration
    val appender = new Capture
    appender.start()
    config.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevWsFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    // whole-stage compile failures are governed by a SEPARATE conf — flip
    // it too so they throw here instead of WARN-and-fall-back
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val failures = mutable.ListBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val before = appender.hits.size()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            failures += s"$name threw under CODEGEN_ONLY: ${e.getMessage}"
        }
        if (appender.hits.size() > before)
          failures += s"$name logged codegen fallback: " +
            appender.hits.toArray.mkString("; ")
      }
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.codegen.factoryMode", m)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      prevWsFb match {
        case Some(m) => spark.conf.set("spark.sql.codegen.fallback", m)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
      config.getRootLogger.removeAppender(appender.getName)
      ctx.updateLoggers()
      appender.stop()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
