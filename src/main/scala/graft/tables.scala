package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet testdata table loader (see TESTDATA.md / FIXTURES.md §2).
  *
  * All engine queries take `(spark, sfDir)` and resolve tables through
  * here so the same query text runs at any scale factor. Reads are plain
  * parquet scans: Catalyst pushes predicates / prunes columns into the
  * scan, so no eager caching — at the 100 TB design point the scan IS the
  * dominant cost and must stay lazy + columnar.
  */
object tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path resolves tables here — install the graft codegen
    // expressions (dot / l2sq / fingerprint) before plans reference them
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects by
      // default; read the raw INT64 nanos and convert to a micros
      // timestamp (lossless here — the generator emits micro precision;
      // session TZ is pinned UTC so the NTZ wall-clock is preserved).
      // DIV, not `/`: column `/` is DOUBLE division, and epoch nanos
      // (~1.7e18) exceed a double's 2^53 integer range — the rounding
      // shifts timestamps by ±1µs (caught by q27's raw-timestamp oracle).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
