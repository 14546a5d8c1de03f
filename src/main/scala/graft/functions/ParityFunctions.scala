package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity helpers shared by every query. */
object ParityFunctions {

  /** DuckDB-exact double rounding (graft.expressions.DuckRound).
    * EVERY oracle-compared rounded double must use this instead of
    * Spark's `round`: Spark rounds the shortest decimal repr of the
    * double, DuckDB rounds the exact binary value — they disagree on
    * decimal half boundaries (observed at sf0.1). Registered by
    * `tables.load` like the other graft expressions.
    */
  def duckRound(c: Column, n: Int): Column =
    call_function("graft_round", c.cast("double"), lit(n))
}
