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

  /** Order-independent sum of a 2-decimal "money" double column (the
    * testdata stores prices/values as doubles within 1e-9 of exact
    * cents): sums EXACT integer cents as BIGINT and divides once.
    * A double `sum()` merges partial aggregates in task-completion
    * order, so two runs can differ in the last ULP and flip a
    * downstream rounding boundary against the oracle — the observed
    * pl09 flake class, and at money magnitudes (~1e9) the 2-decimal
    * boundary is within ULP noise ~1e-5 of the time per cell. The
    * integer sum is bit-stable under ANY merge order. SQL mirrors
    * below keep the op sequence identical. */
  def moneySum(c: Column): Column =
    sum(round(c * 100).cast("long")).cast("double") / 100.0

  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** Exact-cents sum of price·(1−discount): cents × (100−discount
    * cents) is an exact 4-implied-decimal integer per row. */
  def moneyDiscSum(price: Column, disc: Column): Column =
    sum(round(price * 100).cast("long") *
      (lit(100L) - round(disc * 100).cast("long"))).cast("double") / 10000.0

  def moneySumSql(x: String): String =
    s"CAST(sum(CAST(round(($x) * 100) AS BIGINT)) AS DOUBLE) / 100.0"

  def moneyAvgSql(x: String): String =
    s"(${moneySumSql(x)}) / count(*)"

  def moneyDiscSumSql(p: String, d: String): String =
    s"CAST(sum(CAST(round(($p) * 100) AS BIGINT) * " +
      s"(100 - CAST(round(($d) * 100) AS BIGINT))) AS DOUBLE) / 10000.0"
}
