package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink coverage beyond the harness's parquet path: CSV and
  * JSON-lines round-trips with explicit schemas (the only scale-sane
  * mode — schema inference re-reads the input), plus the partitioned
  * parquet write a 100 TB sink actually uses.
  */
class SourceSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val docs = Seq(
    (1L, "the quick brown fox", "en", 19L),
    (2L, "der schnelle braune fuchs", "de", 25L),
    (3L, "a, b — \"quoted\" text", "en", 20L)) // exercises quoting
    .toDF("doc_id", "text", "lang", "n_chars")

  test("csv round-trip preserves rows with explicit schema") {
    val dir = tmp("csv_rt")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(docs.schema) // never infer: inference is a second full scan
      .option("header", "true")
      .csv(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("json-lines round-trip preserves rows and types") {
    val dir = tmp("json_rt")
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("orc round-trip preserves rows and types") {
    val dir = tmp("orc_rt")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("part_pq")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    // partition pruning: a lang filter must turn into directory pruning,
    // visible as PartitionFilters in the scan (not a post-scan Filter)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not reach partition pruning:\n$plan")
    assert(q.count() == 2)
  }

  test("binaryFile source reads raw payloads with metadata") {
    // the multimodal ingestion path: image/audio files land as FILES,
    // and `binaryFile` turns a directory of them into (path, length,
    // content) rows — the input seam for mm01-mm03's binary columns.
    // pathGlobFilter prunes non-matching files at listing time (never
    // reads their bytes).
    val dir = tmp("binfiles")
    val payloads = Map(
      "a.img" -> Array[Byte](0x1, 0x2, 0x3, 0x7F, -0x80),
      "b.img" -> Array[Byte](0xA, 0xB),
      "skip.txt" -> Array[Byte](0x0))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val bf = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir)
    assert(bf.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val got = bf.select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length"), md5(col("content")).as("digest"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    def ref(name: String) = {
      val b = payloads(name)
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      (name, b.length.toLong, d.map("%02x".format(_)).mkString)
    }
    assert(got == Seq(ref("a.img"), ref("b.img")),
      s"binaryFile read mismatch: $got")
  }
}
