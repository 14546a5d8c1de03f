package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.VectorMaintenance

/** Vector DELETION — the IndexMaintenance tombstone protocol applied
  * to the ANN artifact: a delete must hide the vector from serving
  * immediately at O(ids) cost, survive replay (idempotent), ride the
  * compaction rewrite as a physical purge, and survive a
  * drift-triggered rebuild even when the caller's raw embeddings table
  * still carries the deleted vector.
  */
class VectorDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit = TestWarehouse.reset(spark,
    (Seq("centroids", "stats", "codes", "tombstones", "version") ++
      Seq("v2_centroids", "v2_stats", "v2_codes", "v2_tombstones"))
      .map(t => s"${name}_$t"): _*)

  private def buildOn(name: String): (org.apache.spark.sql.DataFrame, Array[Double]) = {
    val e = tables.load(spark, dir, "embeddings")
    VectorStore.build(e.select(col("vec_id"), col("embedding")), name)
    val v50 = e.filter(col("vec_id") === 50)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0).toArray
    (e, v50)
  }

  private def serve(name: String, pe: Array[Double], k: Int) = {
    import spark.implicits._
    VectorStore.serveTopK(Seq((50L, pe)).toDF("probe_id", "pe"), name, k = k)
  }

  test("delete hides the vector at serve time; idempotent; broadcast anti-join") {
    reset("vd1")
    val (_, v50) = buildOn("vd1")
    val before = serve("vd1", v50, 6).collect().toSeq
    assert(before.size == 6, "test premise: probe must retrieve 6 rows")
    val victim = before.head.getLong(1) // the rank-1 neighbor

    VectorStore.deleteVecs(spark, Seq(victim), "vd1")
    val afterDf = serve("vd1", v50, 5)
    val after = afterDf.collect().toSeq
    // the victim vanishes and everything below it is promoted one rank
    // with identical cosines — post-delete top-5 == pre-delete ranks 2-6
    assert(!after.map(_.getLong(1)).contains(victim))
    assert(after.map(r => (r.getLong(1), r.getDouble(3))) ==
      before.drop(1).map(r => (r.getLong(1), r.getDouble(3))),
      "survivors must be promoted in order with unchanged cosines")
    assert(after.map(_.getInt(2)) == (1 to 5))

    // replayed delete appends nothing
    val n = spark.table("vd1_tombstones").count()
    VectorStore.deleteVecs(spark, Seq(victim, victim), "vd1")
    assert(spark.table("vd1_tombstones").count() == n,
      "replayed delete must be a no-op")

    // the subtraction is a BROADCAST anti-join on the pruned code scan,
    // and the serve plan still never touches the corpus
    val p = afterDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LeftAnti"), s"tombstone anti-join missing:\n$p")
    assert(!"SortMergeJoin[^\\n]*LeftAnti".r.findFirstIn(p).isDefined,
      s"tombstone anti-join must broadcast, not shuffle:\n$p")
    assert("Location:[^\\n]*embeddings".r.findAllIn(p).isEmpty,
      s"serve plan scans the corpus:\n$p")
  }

  test("compact purges tombstoned codes and clears tombstones; serving unchanged") {
    reset("vd2")
    val (_, v50) = buildOn("vd2")
    val victim = serve("vd2", v50, 1).collect().head.getLong(1)
    VectorStore.deleteVecs(spark, Seq(victim), "vd2")
    val beforeCompact = serve("vd2", v50, 5).collect().toSeq

    VectorMaintenance.compact(spark, "vd2")

    // physically gone, tombstones cleared, serving identical
    assert(spark.table("vd2_codes")
      .filter(col("vec_id") === victim).count() == 0L,
      "purge must drop the tombstoned codes from the rewritten table")
    assert(!spark.catalog.tableExists("vd2_tombstones"),
      "compact must clear the tombstone table after the swap")
    assert(serve("vd2", v50, 5).collect().toSeq == beforeCompact)
    // the rewrite keeps the cid partition spec (partition-pruned serve)
    val partCols = spark.catalog.listColumns("vd2_codes")
      .collect().filter(_.isPartition).map(_.name).toSeq
    assert(partCols == Seq("cid"), s"partition spec lost in purge: $partCols")
  }

  test("crash between swap and tombstone clear: stale tombstones are a no-op") {
    import spark.implicits._
    reset("vd3")
    val (_, v50) = buildOn("vd3")
    val victim = serve("vd3", v50, 1).collect().head.getLong(1)
    VectorStore.deleteVecs(spark, Seq(victim), "vd3")
    VectorMaintenance.compact(spark, "vd3")
    val healthy = serve("vd3", v50, 5).collect().toSeq

    // simulate the crash window: purge + swap committed but the clear
    // never ran — the tombstones name already-purged ids
    Seq(victim).toDF("vec_id").write.saveAsTable("vd3_tombstones")
    assert(serve("vd3", v50, 5).collect().toSeq == healthy,
      "already-purged tombstones must not change serving")
    VectorMaintenance.compact(spark, "vd3")
    assert(!spark.catalog.tableExists("vd3_tombstones"),
      "next compact must clear the stale tombstones")
    assert(serve("vd3", v50, 5).collect().toSeq == healthy)
  }

  test("deletes survive a rebuild fed the raw (undeleted) embeddings") {
    reset("vd4")
    val (e, v50) = buildOn("vd4")
    val victim = serve("vd4", v50, 1).collect().head.getLong(1)
    VectorStore.deleteVecs(spark, Seq(victim), "vd4")

    // the caller's raw table still carries the victim — rebuild must
    // subtract the serving version's tombstones before training
    val v = VectorStore.rebuild(
      e.select(col("vec_id"), col("embedding")), "vd4")
    assert(v == 2L)
    assert(spark.table("vd4_v2_codes")
      .filter(col("vec_id") === victim).count() == 0L,
      "rebuild resurrected a deleted vector")
    assert(!serve("vd4", v50, 5).collect().map(_.getLong(1)).contains(victim))
    // the consumed v1 tombstones are swept with the old version
    assert(!spark.catalog.tableExists("vd4_tombstones"))
  }
}
