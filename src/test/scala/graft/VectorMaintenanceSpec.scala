package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.VectorMaintenance

/** Streaming vector ingest must honor the batch contract: streamed
  * vectors become retrievable from the store under the FROZEN
  * codebook, and a replayed batch id is a no-op (commit marker).
  */
class VectorMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String, marker: String): Unit =
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes").map(t => s"${name}_$t") :+ marker: _*)

  test("streamed vectors are served from the store; replay is a no-op") {
    import spark.implicits._
    reset("vm", "vm_marker")
    val e = tables.load(spark, dir, "embeddings")
    // build on the existing corpus; stream in two new vectors, one an
    // exact copy of vector 50's embedding under a fresh id
    VectorStore.build(e.select(col("vec_id"), col("embedding")), "vm")
    val v50 = e.filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray

    val stream = MemoryStream[(Long, Array[Double])](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-vm-ckpt").toString
    val q = VectorMaintenance.maintain(
      stream.toDF().toDF("vec_id", "embedding"), "vm", "vm_marker", ckpt)
    try {
      stream.addData((777001L, v50), (777002L, v50.map(_ * 0.5)))
      q.processAllAvailable()
    } finally q.stop()

    assert(VectorMaintenance.vecCount(spark, "vm_marker") == 2L)

    // the streamed copy of vector 50 must come back as its top hit
    val served = VectorStore.serveTopK(
      Seq((50L, v50)).toDF("probe_id", "pe"), "vm", k = 2)
    val neighbors = served.collect().map(_.getLong(1)).toSet
    assert(neighbors.contains(777001L),
      s"streamed duplicate not retrieved: $neighbors")

    // replaying the SAME batch id must not duplicate codes
    val before = spark.table("vm_codes")
      .filter(col("vec_id") >= 777000L).count()
    VectorMaintenance.appendBatch(
      Seq((777001L, v50)).toDF("vec_id", "embedding"), 0L, "vm", "vm_marker")
    val after = spark.table("vm_codes")
      .filter(col("vec_id") >= 777000L).count()
    assert(before == after, "replayed batch appended duplicate codes")
    assert(VectorMaintenance.vecCount(spark, "vm_marker") == 2L)
  }

  test("compact folds per-batch files; serving identical, still partitioned") {
    import spark.implicits._
    reset("vmc", "vmc_marker")
    val e = tables.load(spark, dir, "embeddings")
    VectorStore.build(e.select(col("vec_id"), col("embedding")), "vmc")
    val v50 = e.filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray

    // several streamed batches → several small file sets per hot cell
    (0 until 4).foreach { i =>
      VectorMaintenance.appendBatch(
        Seq((800000L + i, v50.map(_ * (1.0 + 0.01 * i))))
          .toDF("vec_id", "embedding"),
        i.toLong, "vmc", "vmc_marker")
    }

    def dataFiles(): Seq[java.io.File] = {
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      val root = new java.io.File(
        if (wh.getScheme == null) wh.toString else wh.getPath, "vmc_codes")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
          Seq(f)
        else Seq.empty
      walk(root)
    }
    val filesBefore = dataFiles().size
    val probes = Seq((50L, v50)).toDF("probe_id", "pe")
    val servedBefore = VectorStore.serveTopK(probes, "vmc", k = 6)
      .collect().toSeq

    VectorMaintenance.compact(spark, "vmc")

    // one file set per cell, strictly fewer files than the append trail
    val filesAfter = dataFiles().size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    val cells = spark.sql("SHOW PARTITIONS vmc_codes").count()
    assert(filesAfter <= cells,
      s"expected at most one file per cell, got $filesAfter over $cells cells")
    // the partition spec survives the rewrite — this is what keeps
    // serveTopK's candidate read partition-prunable
    val partCols = spark.catalog.listColumns("vmc_codes")
      .collect().filter(_.isPartition).map(_.name).toSeq
    assert(partCols == Seq("cid"),
      s"partition spec lost in compaction: $partCols")
    // serving is identical, including the streamed near-duplicates
    val servedAfter = VectorStore.serveTopK(probes, "vmc", k = 6)
      .collect().toSeq
    assert(servedAfter == servedBefore)
    assert(servedAfter.map(_.getLong(1)).exists(_ >= 800000L),
      "test premise: streamed vectors must appear in the served top-k")
  }

  test("compact crash window: staged codes adopted, serving identical") {
    import spark.implicits._
    reset("vmx", "vmx_marker")
    spark.sql("DROP TABLE IF EXISTS vmx_codes_staging")
    val e = tables.load(spark, dir, "embeddings")
    VectorStore.build(e.select(col("vec_id"), col("embedding")), "vmx")
    val v50 = e.filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    val probes = Seq((50L, v50)).toDF("probe_id", "pe")
    val servedBefore = VectorStore.serveTopK(probes, "vmx", k = 5)
      .collect().toSeq

    // simulate compact dying mid-swap: staging fully written, live
    // codes table gone (the overwrite's internal drop happened, the
    // recreate did not) — the exact window that used to PERMANENTLY
    // lose the code table under localCheckpoint→DROP→rewrite
    spark.table("vmx_codes").repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .saveAsTable("vmx_codes_staging")
    spark.sql("DROP TABLE vmx_codes")
    assert(!spark.catalog.tableExists("vmx_codes"))

    // the next serve recovers the artifact and returns identical rows
    val servedAfter = VectorStore.serveTopK(probes, "vmx", k = 5)
      .collect().toSeq
    assert(spark.catalog.tableExists("vmx_codes"), "staged codes not adopted")
    assert(!spark.catalog.tableExists("vmx_codes_staging"),
      "adoption must consume the staging table")
    assert(servedAfter == servedBefore,
      "recovered codes serve differently from the pre-crash artifact")

    // the adopted table keeps the cid partition spec (what keeps the
    // candidate read partition-prunable) — and is non-empty on disk
    // (the in-memory-catalog rename pitfall this copy-swap exists for)
    val partCols = spark.catalog.listColumns("vmx_codes")
      .collect().filter(_.isPartition).map(_.name).toSeq
    assert(partCols == Seq("cid"), s"partition spec lost: $partCols")
    assert(spark.table("vmx_codes").count() == e.count(),
      "adopted codes table lost rows")

    // an ingest landing in the crash window also recovers first
    spark.table("vmx_codes").repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .saveAsTable("vmx_codes_staging")
    spark.sql("DROP TABLE vmx_codes")
    VectorMaintenance.appendBatch(
      Seq((900001L, v50)).toDF("vec_id", "embedding"), 11L, "vmx", "vmx_marker")
    assert(!spark.catalog.tableExists("vmx_codes_staging"))
    assert(spark.table("vmx_codes").filter(col("vec_id") === 900001L)
      .count() == 1L, "append after adoption lost the new batch")
  }
}
