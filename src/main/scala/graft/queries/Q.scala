package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must
  * hash-match it on the same parquet tables. `oracle = None` degrades to
  * the driver's rows-only check (SparkEntry contract).
  *
  * Parity rules (SURVEY.md §5.4): identical output column NAMES on both
  * sides, a total-order ORDER BY on both sides, floating aggregates
  * rounded on both sides, integer aggregates CAST to BIGINT on the
  * DuckDB side (DuckDB widens sum(int) to HUGEINT).
  *
  * Cache lifecycle contract: some queries persist reused intermediates
  * (dd03/dd04/dd06/dd07/sm02/tx04 and the CC labels under dd06/dd07)
  * and — being lazy DataFrame builders — cannot unpersist them before
  * the caller materializes the result.
  * CALLERS OWN THE CACHE LIFECYCLE: run `spark.catalog.clearCache()`
  * between queries (as Verify/Bench do) or storage accumulates across
  * invocations.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.stripMargin.trim))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
