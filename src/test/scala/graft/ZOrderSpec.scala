package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ZOrder
import scala.jdk.CollectionConverters._

/** The layout op must actually deliver its skipping property: after
  * z-order clustering on (x, y), the per-FILE parquet min-max stats of
  * BOTH columns are tight enough that a box predicate on EITHER
  * dimension intersects only a few files — where a linear sort makes
  * only its own column prunable. Verified against the real parquet
  * footers, i.e. exactly the stats a file-skipping planner reads.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("zValue interleaves bits round-robin, clamps, nulls sort first") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (3L, 0L),   // x=0b11, y=0b00 → z = 0b0101 = 5
      (0L, 3L),   // x=0b00, y=0b11 → z = 0b1010 = 10
      (3L, 3L),   // z = 0b1111 = 15
      (-7L, 2L),  // negative clamps to 0 → z of (0, 2) = 0b1000 = 8
      (null, 1L)) // null → -1
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 2))
      .as[Long].collect().toSeq
    assert(got == Seq(5L, 10L, 15L, 8L, -1L))
  }

  test("z-ordered files are box-prunable on BOTH dimensions") {
    // uniform 256×256 grid, 16 output files ⇒ each z-range file should
    // cover one 64×64 tile of the key space
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), floor(col("id") / 256).as("y"),
      col("id").as("payload"))
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.cluster(grid, Seq("x", "y"), numFiles = 16)
      .mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    // files whose [min,max] stats (from the REAL parquet footers)
    // intersect lo <= c <= hi — what any stats-based planner prunes on
    def intersecting(dir: String, column: String, lo: Long, hi: Long): Int = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .count { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val ranges = r.getFooter.getBlocks.asScala.flatMap { b =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .map(c => (c.getStatistics.genericGetMin.asInstanceOf[Long],
                  c.getStatistics.genericGetMax.asInstanceOf[Long]))
            }
            ranges.exists { case (mn, mx) => mx >= lo && mn <= hi }
          } finally r.close()
        }
    }

    // ideal tiling intersects 4 files per box; repartitionByRange
    // SAMPLES its bounds, so files straddle tile edges — allow up to
    // half the files while still proving the contrast vs 16/16
    // x-box: both layouts prune (linear is sorted by x)
    assert(intersecting(ldir, "x", 64, 95) <= 8)
    assert(intersecting(zdir, "x", 64, 95) <= 8,
      "z-order lost x prunability")
    // y-box: linear files each span ALL of y (no pruning possible)
    assert(intersecting(ldir, "y", 64, 95) == 16,
      "test premise broken: linear layout should be unprunable on y")
    assert(intersecting(zdir, "y", 64, 95) <= 8,
      "z-order files are not y-prunable")
    // and the rewrite is lossless
    assert(spark.read.parquet(zdir).count() == 65536L)
    assert(spark.read.parquet(zdir).agg(sum("payload")).head.getLong(0) ==
      spark.range(0, 65536).agg(sum("id")).head.getLong(0))
  }
}
