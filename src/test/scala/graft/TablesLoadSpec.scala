package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-adaptive events ingestion (VERDICT r11 task #1).
  *
  * The testdata generator has shipped `events.ts` under several physical
  * parquet encodings (INT64 TIMESTAMP(NANOS), TIMESTAMP(MICROS) UTC, and
  * TIMESTAMP(MICROS) NTZ). `tables.load` must return the SAME rows for
  * every encoding — a regeneration of /root/testdata must never again be
  * a correctness cliff.
  */
class TablesLoadSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // one logical dataset: (event_id, epoch-micros)
  private val rowsMicros: Seq[(Long, Long)] = Seq(
    (1L, 1700000000000000L),
    (2L, 1700000000123456L),
    (3L, 1712345678901234L))

  /** Write an events.parquet under `enc` into a fresh sfDir, return it. */
  private def writeEvents(enc: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$enc").toFile
    dir.deleteOnExit()
    val out = s"${dir.getAbsolutePath}/events.parquet"
    val df = enc match {
      case "nanosAsLong" =>
        // what a TIMESTAMP(NANOS) file decodes to with nanosAsLong=true:
        // a raw INT64 epoch-nanos column
        rowsMicros.map { case (id, us) => (id, us * 1000L) }
          .toDF("event_id", "ts")
      case "timestamp" =>
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rowsMicros.map { case (id, us) =>
            Row(id, java.sql.Timestamp.from(
              java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)))
          }), schema)
      case "timestamp_ntz" =>
        // pyarrow timestamp[us] without tz → TIMESTAMP_NTZ on read;
        // session TZ is UTC so the NTZ wall-clock carries the same epoch
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rowsMicros.map { case (id, us) =>
            Row(id, java.time.LocalDateTime.ofInstant(
              java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
              java.time.ZoneOffset.UTC))
          }), schema)
    }
    df.coalesce(1).write.mode("overwrite").parquet(out)
    dir.getAbsolutePath
  }

  private def loadRows(sfDir: String): Seq[(Long, Long)] =
    tables.load(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

  test("events loads identically under INT64-nanos, TIMESTAMP, and TIMESTAMP_NTZ encodings") {
    val expected = rowsMicros.sortBy(_._1)
    for (enc <- Seq("nanosAsLong", "timestamp", "timestamp_ntz")) {
      val got = loadRows(writeEvents(enc))
      assert(got == expected, s"encoding=$enc")
      // and the normalized dtype is always TimestampType so every
      // downstream events query sees one schema
      val dt = tables.load(spark, writeEvents(enc), "events").schema("ts").dataType
      assert(dt == TimestampType, s"encoding=$enc dtype=$dt")
    }
  }

  test("live testdata events loads with a TimestampType ts and rows > 0") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val ev = tables.load(spark, sfDir, "events")
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.limit(1).count() == 1L)
    }
  }
}
