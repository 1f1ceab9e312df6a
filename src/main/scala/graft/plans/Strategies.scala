package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.Strategy

/** Single registration seam for the library's planner strategies.
  *
  * Two installation paths exist: `GraftExtensions`
  * (SparkSessionExtensions — the canonical one, wired at session build)
  * and the DataFrame helpers' call-time fallback for sessions built
  * without it. Before this seam each helper mutated
  * `spark.experimental.extraStrategies` unconditionally, so a session
  * configured via extensions ALSO grew an experimental entry — two
  * mechanisms owning one concern. Now the fallback fires only when the
  * planner cannot already see the strategy.
  */
object Strategies {
  /** Make `strategy` visible to `spark`'s planner, preferring whatever
    * is already installed: `sessionState.planner.strategies` includes
    * both the extensions-injected strategies and
    * `experimental.extraStrategies`, so if the strategy shows up there
    * planning reaches it and nothing is mutated. Only otherwise is the
    * experimental fallback appended — under a lock, because two threads
    * doing read-append-write on the var concurrently could drop one
    * entry or double-register. */
  def ensure(spark: SparkSession, strategy: Strategy): Unit = {
    if (!spark.sessionState.planner.strategies.contains(strategy)) {
      spark.experimental.synchronized {
        if (!spark.experimental.extraStrategies.contains(strategy)) {
          spark.experimental.extraStrategies =
            spark.experimental.extraStrategies :+ strategy
        }
      }
    }
  }
}
