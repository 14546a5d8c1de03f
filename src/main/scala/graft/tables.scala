package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Normalize the `ts` column of an events frame to TimestampType,
    * whatever physical parquet encoding it arrived under:
    *
    *  - INT64 raw epoch nanos (TIMESTAMP(NANOS) decoded with
    *    `nanosAsLong=true`) → `timestamp_micros(ts DIV 1000)`. DIV, not
    *    `/`: column `/` is DOUBLE division, and epoch nanos (~1.7e18)
    *    exceed a double's 2^53 integer range — the rounding shifts
    *    timestamps by ±1µs (caught by q27's raw-timestamp oracle).
    *  - TIMESTAMP (isAdjustedToUTC=true) → pass through.
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false, e.g. pyarrow
    *    `timestamp[us]`) → cast to TimestampType. The graft session TZ is
    *    pinned UTC, so reinterpreting the NTZ wall-clock as a UTC instant
    *    yields the same epoch value the nanos path produces; Spark
    *    queries and DuckDB oracles agree either way.
    *
    * Branching on the dtype Spark actually decoded — instead of
    * hard-coding one encoding — is what keeps a testdata regeneration
    * from becoming a correctness cliff (VERDICT r11: the INT64-only
    * loader threw DATATYPE_MISMATCH on MICROS files and took out every
    * events query). Shared by the batch loader below and the streaming
    * file source (`streaming/EventStreams.runFileStreamDemo`).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _: TimestampType => df
      case _: TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts decoded as unsupported type $other — expected " +
            "INT64 nanos (nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ")
    }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path resolves tables here — install the graft codegen
    // expressions (dot / l2sq / fingerprint) before plans reference them
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    if (name == "events") {
      // nanosAsLong only affects TIMESTAMP(NANOS) files (harmless for
      // MICROS/MILLIS); with it on, every historical encoding decodes to
      // a type normalizeEventTs can handle.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
