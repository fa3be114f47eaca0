package graft

/** Log tuning shared by the entry points (Verify, Bench). */
object Logging {
  /** Silence WindowExec's single-partition warning, one logger only.
    * A few queries (rolling7d, coreRounds, topUsersWindow, the
    * curriculum ntile) run a global window over a post-aggregate frame
    * that is tiny by construction (days / months / top-25 rows) — the
    * warning is by-design there and would drown real warnings in
    * every sweep's log.
    */
  def quietWindowExec(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
