package graft

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Log hygiene for the batch mains (Verify/Bench). */
object Logs {
  /** Local-mode straggler tasks of already-finished jobs (e.g. after a
    * limit/take short-circuits, or once a localCheckpoint'd RDD is GC'd)
    * report to accumulators that were already unregistered, and the
    * DAGScheduler logs a full "attempted to access non-existent
    * accumulator" ERROR stack per task. Harmless, but it floods stderr
    * (100+ stacks per run) and buries real failures — which in these
    * mains always surface as thrown exceptions, not logs. */
  def quietBenignErrors(): Unit =
    Configurator.setLevel("org.apache.spark.scheduler.DAGScheduler",
      Level.OFF)
}
