package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.{VectorGate, VectorMaintenance}

/** The streaming embedding-integrity gate must (1) classify exactly as
  * sm15's audit does, (2) let clean vectors through bit-identically to
  * the ungated ingest path, (3) keep every defective vector OUT of the
  * code table and IN the quarantine ledger, and (4) honor the replay /
  * crash-window protocol of the other maintainers.
  */
class VectorGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String, extra: String*): Unit =
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes").map(t => s"${name}_$t") ++ extra: _*)

  private def corpus() = tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def v(id: Long): Array[Double] =
    corpus().filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray

  test("defects quarantined per class; clean rows served; replay no-op") {
    import spark.implicits._
    reset("vg", "vg_q", "vg_rep", "vg_marker")
    VectorStore.build(corpus(), "vg")
    val base = v(50)

    val clean1 = (777001L, base)                      // exact copy of 50
    val clean2 = (777002L, base.map(_ * 0.5))         // valid variant
    val dNan = (888001L, base.updated(3, Double.NaN))
    val dInf = (888002L, base.updated(0, Double.NegativeInfinity))
    val dZero = (888003L, Array.fill(base.length)(0.0))
    val dShort = (888004L, base.take(base.length - 1)) // wrong dim
    val dShortNan = (888005L,                          // bad_dim wins
      base.take(base.length - 1).updated(0, Double.NaN))

    val stream = MemoryStream[(Long, Array[Double])](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-vg-ckpt").toString
    val q = VectorGate.maintain(
      stream.toDF().toDF("vec_id", "embedding"),
      "vg", "vg_q", "vg_rep", "vg_marker", ckpt)
    try {
      stream.addData(clean1, clean2, dNan, dInf, dZero, dShort, dShortNan)
      q.processAllAvailable()
    } finally q.stop()
    // a NULL embedding can't ride MemoryStream's Array encoder — feed
    // it through the batch entry point as the next batch
    VectorGate.gateBatch(
      Seq(999001L).toDF("vec_id")
        .select(col("vec_id"), lit(null).cast("array<double>")
          .as("embedding")),
      1L, "vg", "vg_q", "vg_rep", "vg_marker")

    // audit rows: counters match the hand classification
    val reps = VectorGate.gateReports(spark, "vg_rep", "vg_marker")
      .orderBy("batch_id").collect()
    assert(reps.length == 2)
    val r0 = reps(0)
    assert(r0.getAs[Long]("n_in") == 7 && r0.getAs[Long]("n_ok") == 2 &&
      r0.getAs[Long]("n_nonfinite") == 2 && r0.getAs[Long]("n_zero_norm") == 1 &&
      r0.getAs[Long]("n_bad_dim") == 2 && r0.getAs[Long]("n_null") == 0,
      s"batch-0 audit row wrong: $r0")
    val r1 = reps(1)
    assert(r1.getAs[Long]("n_in") == 1 && r1.getAs[Long]("n_null") == 1 &&
      r1.getAs[Long]("n_ok") == 0, s"batch-1 audit row wrong: $r1")

    // quarantine: exactly the defective ids, each under its class —
    // wrong-dim NaN is bad_dim (dimension checked before elements)
    val quar = VectorGate.quarantined(spark, "vg_q", "vg_marker")
      .select("vec_id", "defect").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(quar == Map(888001L -> "nonfinite", 888002L -> "nonfinite",
      888003L -> "zero_norm", 888004L -> "bad_dim",
      888005L -> "bad_dim", 999001L -> "null_vec"), s"quarantine: $quar")

    // code table: both clean ids in, NO quarantined id in
    val streamed = spark.table("vg_codes")
      .filter(col("vec_id") >= 777000L).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == Set(777001L, 777002L),
      s"codes must carry exactly the clean rows: $streamed")

    // the clean streamed copy serves as vector 50's top hit
    val served = VectorStore.serveTopK(
      Seq((50L, base)).toDF("probe_id", "pe"), "vg", k = 2)
    assert(served.collect().map(_.getLong(1)).contains(777001L))

    // replaying a committed batch id appends nothing anywhere
    val codesBefore = spark.table("vg_codes").count()
    val quarBefore = spark.table("vg_q").count()
    VectorGate.gateBatch(
      Seq(clean1, dNan).toDF("vec_id", "embedding"),
      0L, "vg", "vg_q", "vg_rep", "vg_marker")
    assert(spark.table("vg_codes").count() == codesBefore)
    assert(spark.table("vg_q").count() == quarBefore)
    assert(spark.table("vg_rep").count() == 2)
  }

  test("clean stream ingests bit-identically to the ungated path") {
    import spark.implicits._
    reset("vga", "vga_q", "vga_rep", "vga_marker")
    reset("vgb", "vgb_marker")
    VectorStore.build(corpus(), "vga")
    VectorStore.build(corpus(), "vgb")
    val rows = Seq((777001L, v(50)), (777002L, v(51).map(_ * 1.5)))

    VectorGate.gateBatch(rows.toDF("vec_id", "embedding"),
      0L, "vga", "vga_q", "vga_rep", "vga_marker")
    VectorMaintenance.appendBatch(rows.toDF("vec_id", "embedding"),
      0L, "vgb", "vgb_marker")

    val gated = spark.table("vga_codes").filter(col("vec_id") >= 777000L)
      .orderBy("vec_id").collect().toSeq
    val ungated = spark.table("vgb_codes").filter(col("vec_id") >= 777000L)
      .orderBy("vec_id").collect().toSeq
    assert(gated == ungated,
      "gate must not perturb the clean-row ingest path")
    assert(spark.table("vga_q").isEmpty)
  }

  test("crash windows: partial quarantine overwritten; orphan report adopted") {
    import spark.implicits._
    reset("vgc", "vgc_q", "vgc_rep", "vgc_marker")
    VectorStore.build(corpus(), "vgc")
    val base = v(50)

    // simulate a crash that left a PARTIAL quarantine partition for
    // batch 0 (one stale row) and no marker: the replay must REWRITE
    // the partition from scratch, never adopt the partial rows
    Seq((123456L, base, "nonfinite", 0L))
      .toDF("vec_id", "embedding", "defect", "batch_id")
      .write.partitionBy("batch_id").saveAsTable("vgc_q")
    // ... and an ORPHANED (complete, 1-row) report for the same batch:
    // the replay must keep it rather than duplicate it
    Seq((0L, 2L, 1L, 0L, 0L, 1L, 0L))
      .toDF("batch_id", "n_in", "n_ok", "n_null", "n_bad_dim",
        "n_nonfinite", "n_zero_norm")
      .write.saveAsTable("vgc_rep")

    VectorGate.gateBatch(
      Seq((777001L, base), (888001L, base.updated(3, Double.NaN)))
        .toDF("vec_id", "embedding"),
      0L, "vgc", "vgc_q", "vgc_rep", "vgc_marker")

    val quar = spark.table("vgc_q").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(quar == Set(888001L),
      s"partial pre-crash quarantine rows must be overwritten: $quar")
    assert(spark.table("vgc_rep").count() == 1,
      "orphaned report row must be adopted, not duplicated")
    assert(VectorGate.gateReports(spark, "vgc_rep", "vgc_marker")
      .count() == 1)
  }
}
