package graft

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.logging.log4j.core.filter.AbstractFilter

/** Log hygiene for the batch mains (Verify/Bench). */
object Logs {

  /** Denies only the known-benign stale-accumulator stacks; every other
    * DAGScheduler event (job aborts, task-loss reasons) still flows — a
    * blanket Level.OFF would hide real cluster-side diagnostics.
    */
  private final class DenyStaleAccumulatorNoise extends AbstractFilter {
    override def filter(event: LogEvent): Filter.Result = {
      val msg =
        if (event.getMessage == null) null
        else event.getMessage.getFormattedMessage
      // the benign marker appears either in the message itself or (for
      // "Failed to update accumulator N (Unknown class)" events) only in
      // the attached SparkException
      val thrown =
        if (event.getThrown == null) null else event.getThrown.getMessage
      val benign =
        (msg != null && msg.contains("non-existent accumulator")) ||
          (msg != null && msg.startsWith("Failed to update accumulator") &&
            thrown != null && thrown.contains("non-existent accumulator"))
      if (benign) Filter.Result.DENY else Filter.Result.NEUTRAL
    }
  }

  /** Local-mode straggler tasks of already-finished jobs (e.g. after a
    * limit/take short-circuits, or once a localCheckpoint'd RDD is GC'd)
    * report to accumulators that were already unregistered, and the
    * DAGScheduler logs a full "attempted to access non-existent
    * accumulator" ERROR stack per task. Harmless, but it floods stderr
    * (100+ stacks per run) and buries real failures. A message-matching
    * filter on the DAGScheduler logger drops exactly those events and
    * nothing else.
    */
  def quietBenignErrors(): Unit = {
    val name = "org.apache.spark.scheduler.DAGScheduler"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val lc = cfg.getLoggerConfig(name) match {
      case c if c.getName == name => c
      case parent => // no dedicated config yet — add one that inherits
        val c = new LoggerConfig(name, parent.getLevel, true)
        cfg.addLogger(name, c)
        c
    }
    lc.addFilter(new DenyStaleAccumulatorNoise)
    ctx.updateLoggers()
  }
}
