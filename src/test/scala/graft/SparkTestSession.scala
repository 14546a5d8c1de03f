package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (getOrCreate reuses
  * across suites; forked JVM dies at the end so no explicit stop).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.VectorExpressions.ensureRegistered(s)
    s
  }
}
