package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DatasheetMaintenance

/** The streaming datasheet must agree with batch pl34 over the union
  * corpus — INCLUDING exact duplicates that straddle micro-batches,
  * the case a per-batch dup count undercounts — plus the delivery
  * protocol: replay no-op, partial-partition crash-window overwrite,
  * committed-only serve.
  */
class DatasheetMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit =
    TestWarehouse.reset(spark, s"${name}_stats", s"${name}_digests",
      s"${name}_dups", s"${name}_marker", s"${name}_digestsc",
      s"${name}_digestsc_staging")

  private def served(name: String) =
    DatasheetMaintenance.datasheet(spark, name)
      .orderBy("source", "lang").collect().toSeq.map(_.toSeq)

  private def pl34On(dirPath: String) =
    SparkEntry.queries("pl34_corpus_datasheet")(spark, dirPath)
      .collect().toSeq.map(_.toSeq)

  test("streamed datasheet == batch pl34, dups straddling batches included") {
    reset("dsm")
    import spark.implicits._
    // craft a corpus with exact copies ACROSS batch boundaries: docs
    // 1/4 share text (different batches), 5/6 share text (same batch)
    val rows = Seq(
      (1L, "src1", "en", "alpha beta gamma delta"),
      (2L, "src1", "en", "one two three"),
      (3L, "src2", "fr", "un deux trois quatre cinq"),
      (4L, "src1", "en", "alpha beta gamma delta"),
      (5L, "src2", "fr", "six sept huit"),
      (6L, "src2", "fr", "six sept huit"),
      // cross-GROUP straddle: 3's copy arrives later under src3/de —
      // the k==1 flip must credit src2/fr (the holder), the new doc
      // src3/de
      (7L, "src3", "de", "un deux trois quatre cinq"))
      .map { case (id, s, l, t) => (id, s, l, t.length.toLong, t) }
    val df = rows.toDF("doc_id", "source", "lang", "n_chars", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsm").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val batches = Seq(rows.take(2), rows.slice(2, 4), rows.slice(4, 6),
      rows.drop(6))
    batches.zipWithIndex.foreach { case (b, i) =>
      DatasheetMaintenance.datasheetBatch(
        b.toDF("doc_id", "source", "lang", "n_chars", "text"), i.toLong, "dsm")
    }
    assert(served("dsm") == pl34On(tmp))
    // and the dup column really fired on both straddle classes
    val bySrc = DatasheetMaintenance.datasheet(spark, "dsm")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_exact_dup")).toMap
    assert(bySrc(("src1", "en")) == 2L, "cross-batch copies 1/4")
    assert(bySrc(("src2", "fr")) == 3L,
      "within-batch copies 5/6 plus doc 3 flipped by its src3 copy")
    assert(bySrc(("src3", "de")) == 1L, "the cross-group arriver itself")
    spark.catalog.clearCache()
  }

  test("streamed datasheet == batch pl34 on the sf0.001 corpus") {
    reset("dsf")
    import spark.implicits._
    val all = tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    all.grouped((all.length + 2) / 3).zipWithIndex.foreach { case (b, i) =>
      DatasheetMaintenance.datasheetBatch(
        b.toSeq.toDF("doc_id", "source", "lang", "n_chars", "text"),
        i.toLong, "dsf")
    }
    assert(served("dsf") == pl34On(dir))
    spark.catalog.clearCache()
  }

  test("digest compaction (incl. crashed swap) is invisible to the card") {
    import spark.implicits._
    val all = tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    reset("dsc"); reset("dsn")
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toSeq.toDF("doc_id", "source", "lang", "n_chars", "text")
      DatasheetMaintenance.datasheetBatch(df, i.toLong, "dsc")
      if (i == 0) {
        DatasheetMaintenance.compact(spark, "dsc")
        // crash between DROP and RENAME: staging left behind, adopted
        // at the next batch's probe
        spark.sql("ALTER TABLE dsc_digestsc RENAME TO dsc_digestsc_staging")
      }
      if (i == 1) DatasheetMaintenance.compact(spark, "dsc")
      DatasheetMaintenance.datasheetBatch(df, i.toLong, "dsn")
    }
    assert(served("dsc") == served("dsn"))
    assert(served("dsc") == pl34On(dir))
    assert(spark.catalog.tableExists("dsc_digestsc"))
    spark.catalog.clearCache()
  }

  test("replay no-op; partial partition overwritten, never adopted") {
    reset("dsr")
    import spark.implicits._
    val b0 = Seq((1L, "s", "en", 9L, "nine char"),
      (2L, "s", "en", 4L, "four")).toDF("doc_id", "source", "lang",
      "n_chars", "text")
    DatasheetMaintenance.datasheetBatch(b0, 0L, "dsr")
    val once = served("dsr")
    DatasheetMaintenance.datasheetBatch(b0, 0L, "dsr")
    assert(served("dsr") == once, "a committed batch must replay as a no-op")
    // crash window: a partial (wrong) stats row for batch 1, no marker
    Seq(("s", "en", 99L, 99L, 99L, 1L))
      .toDF("source", "lang", "n_docs", "n_tok", "sum_chars", "batch_id")
      .write.mode("append").insertInto("dsr_stats")
    assert(served("dsr") == once, "uncommitted partial rows must not serve")
    val b1 = Seq((3L, "s", "en", 5L, "fives")).toDF("doc_id", "source",
      "lang", "n_chars", "text")
    DatasheetMaintenance.datasheetBatch(b1, 1L, "dsr")
    val stats1 = spark.table("dsr_stats").filter(col("batch_id") === 1L)
      .collect()
    assert(stats1.length == 1 && stats1.head.getAs[Long]("n_docs") == 1L,
      "the partial row must be replaced by the deterministic recompute")
    spark.catalog.clearCache()
  }
}
