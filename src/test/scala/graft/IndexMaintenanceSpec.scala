package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IndexMaintenance

/** Build-once/serve-many plus REFRESH under the staging-ledger
  * protocol: streaming document batches land in a batch_id-partitioned
  * ledger (crash-safe by partition overwrite), serving reads the
  * bucketed compact table UNION the committed tail, and compaction
  * folds the tail into the bucketed table behind a high-water mark.
  * Must (1) make streamed docs servable via the index alone, (2) keep
  * the compact part bucketed (the zero-exchange property), (3) advance
  * the stats ledger, and (4) survive a kill at EVERY crash point —
  * including the old postings-append window (partial append, no
  * marker) that direct bucketed appends could not close.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed docs are appended to the index and become servable") {
    import spark.implicits._
    val td = "idx_maint_termdoc"
    val st = "idx_maint_stats"
    TestWarehouse.reset(spark, td, st, td + "_ledger", td + "_staging")

    // initial artifact: two docs, bucketed like IndexStore's layout
    val base = Seq((1L, "alpha beta gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    graft.queries.Text.termDocPositionalOf(base)
      .write.bucketBy(8, "token").sortBy("token").saveAsTable(td)
    base.groupBy().agg(count(lit(1)).as("n_docs"))
      .withColumn("batch_id", lit(-1L)).select("batch_id", "n_docs")
      .write.saveAsTable(st)

    val stream = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-im-ckpt").toString
    val q = IndexMaintenance.maintain(
      stream.toDF().toDF("doc_id", "text"), td, st, ckpt)
    try {
      stream.addData((3L, "gamma epsilon zeta"), (4L, "epsilon zeta eta"))
      q.processAllAvailable()
      stream.addData((5L, "zeta eta theta"))
      q.processAllAvailable()
    } finally q.stop()

    // (3) ledger: 2 initial + 3 streamed
    assert(IndexMaintenance.docCount(spark, st) == 5L)

    // (1) served from the index alone: "epsilon zeta" only exists in
    // streamed docs; adjacency from stored positions
    def phraseDocs(): Seq[Long] = {
      val hits = IndexMaintenance.postings(spark, td, st)
        .filter(col("token").isin("epsilon", "zeta"))
        .select(col("doc_id"), col("token"),
          explode(col("positions")).as("pos"))
      val e = hits.filter(col("token") === "epsilon")
        .select(col("doc_id"), col("pos").as("p0"))
      val z = hits.filter(col("token") === "zeta")
        .select(col("doc_id"), col("pos").as("p1"))
      e.join(z, Seq("doc_id"))
        .filter(col("p1") === col("p0") + 1)
        .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    }
    assert(phraseDocs() == Seq(3L, 4L))

    // streamed postings live in the LEDGER until compaction — the
    // bucketed table still holds only the initial docs (direct
    // appends are gone: that was the uncloseable crash window)
    assert(spark.table(td).select("doc_id").distinct().count() == 2L)
    assert(spark.table(td + "_ledger").select("doc_id").distinct()
      .count() == 3L)

    // (2) the COMPACT PART keeps the bucket layout: a by-token
    // aggregation over it reads bucketed, no exchange below the agg
    def assertBucketed(): Unit = {
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val p = spark.table(td).groupBy("token")
          .agg(sum("cnt").as("df"))
          .queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
        assert(!p.contains("Exchange"), s"by-token agg re-shuffles:\n$p")
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    assertBucketed()

    // compaction folds the committed tail into the bucketed table:
    // serving is INVARIANT across the fold, the ledger empties, and
    // the serve plan is now a pure zero-exchange bucketed scan
    val servedBefore = IndexMaintenance.postings(spark, td, st)
      .orderBy("doc_id", "token").collect().toSeq
    IndexMaintenance.compact(spark, td, statsTable = Some(st))
    assert(IndexMaintenance.postings(spark, td, st)
      .orderBy("doc_id", "token").collect().toSeq == servedBefore,
      "compaction changed served postings")
    assert(spark.table(td).select("doc_id").distinct().count() == 5L,
      "fold did not move the tail into the bucketed table")
    assert(spark.table(td + "_ledger").isEmpty,
      "fold left committed partitions in the ledger")
    assertBucketed()
    assert(phraseDocs() == Seq(3L, 4L))

    // a SECOND compact with nothing to fold must be serve-invariant
    // too (the high-water excludes everything already folded)
    IndexMaintenance.compact(spark, td, statsTable = Some(st))
    assert(IndexMaintenance.postings(spark, td, st)
      .orderBy("doc_id", "token").collect().toSeq == servedBefore,
      "empty-fold compaction changed served postings")

    // replay safety: re-delivering an already-committed batch id must
    // be a no-op (the stats marker is the commit record)
    val replay = Seq((99L, "replayed doc zeta")).toDF("doc_id", "text")
    IndexMaintenance.appendBatch(replay, 1L, td, st) // batch 1 committed above
    assert(IndexMaintenance.docCount(spark, st) == 5L, "replay double-counted")
    assert(IndexMaintenance.postings(spark, td, st)
      .filter(col("doc_id") === 99L).isEmpty,
      "replayed batch appended postings")

    TestWarehouse.reset(spark, td, st, td + "_ledger")
  }

  test("kill between append and marker: replay yields exact postings") {
    import spark.implicits._
    val td = "idx_kill_termdoc"
    val st = "idx_kill_stats"
    TestWarehouse.reset(spark, td, st, td + "_ledger", td + "_staging")

    val b1 = Seq((1L, "alpha beta gamma"), (2L, "beta delta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "gamma epsilon zeta"), (4L, "epsilon zeta eta"))
      .toDF("doc_id", "text")
    IndexMaintenance.appendBatch(b1, 1L, td, st)

    // the old crash window, reproduced exactly: batch 2's write dies
    // midway — SOME of its postings rows are visible in its ledger
    // partition, the marker never landed
    graft.queries.Text.termDocPositionalOf(b2)
      .withColumn("batch_id", lit(2L))
      .filter(col("doc_id") === 3L && col("token") =!= "zeta") // partial!
      .write.mode("append").partitionBy("batch_id")
      .saveAsTable(td + "_ledger")

    // uncommitted partials are invisible to serving
    assert(IndexMaintenance.postings(spark, td, st)
      .filter(col("doc_id") >= 3L).isEmpty,
      "serving leaked an uncommitted partial batch")

    // replay of batch 2 (what the restarted stream does): the dynamic
    // partition overwrite replaces the partial partition WHOLE
    IndexMaintenance.appendBatch(b2, 2L, td, st)

    // served postings == batch-built postings over the same docs, with
    // no duplicate (doc, token) rows — the round-13 failure mode
    val served = IndexMaintenance.postings(spark, td, st)
      .select("doc_id", "token", "cnt", "positions")
      .orderBy("doc_id", "token").collect().toSeq
    val oracle = graft.queries.Text.termDocPositionalOf(b1.unionByName(b2))
      .select("doc_id", "token", "cnt", "positions")
      .orderBy("doc_id", "token").collect().toSeq
    assert(served == oracle,
      "replayed postings differ from the batch-built index")

    // and the fold keeps that exactness
    IndexMaintenance.compact(spark, td, statsTable = Some(st))
    assert(IndexMaintenance.postings(spark, td, st)
      .select("doc_id", "token", "cnt", "positions")
      .orderBy("doc_id", "token").collect().toSeq == oracle,
      "compacted postings differ from the batch-built index")

    // crash AFTER the fold swap but BEFORE the partition drops: fake a
    // leftover already-folded partition; serving must exclude it (the
    // high-water) and the next compact must sweep it without re-folding
    graft.queries.Text.termDocPositionalOf(b2)
      .withColumn("batch_id", lit(2L))
      .write.mode("append").partitionBy("batch_id")
      .saveAsTable(td + "_ledger")
    assert(IndexMaintenance.postings(spark, td, st)
      .select("doc_id", "token", "cnt", "positions")
      .orderBy("doc_id", "token").collect().toSeq == oracle,
      "a leftover folded partition leaked into serving")
    IndexMaintenance.compact(spark, td, statsTable = Some(st))
    assert(IndexMaintenance.postings(spark, td, st)
      .select("doc_id", "token", "cnt", "positions")
      .orderBy("doc_id", "token").collect().toSeq == oracle,
      "re-compacting with a leftover partition double-folded it")
    assert(spark.table(td + "_ledger").isEmpty,
      "the sweep left the stale partition in the ledger")

    TestWarehouse.reset(spark, td, st, td + "_ledger")
  }

  test("tombstone deletes hide docs at serve time and purge at compaction") {
    import spark.implicits._
    val td = "idx_del_termdoc"
    val st = "idx_del_stats"
    val tb = "idx_del_tombstones"
    TestWarehouse.reset(spark, td, st, tb, td + "_ledger", td + "_staging")

    val base = Seq((1L, "alpha beta gamma"), (2L, "beta delta"),
      (3L, "gamma delta epsilon")).toDF("doc_id", "text")
    graft.queries.Text.termDocPositionalOf(base)
      .write.bucketBy(8, "token").sortBy("token").saveAsTable(td)
    base.groupBy().agg(count(lit(1)).as("n_docs"))
      .withColumn("batch_id", lit(-1L)).select("batch_id", "n_docs")
      .write.saveAsTable(st)

    // no tombstone table yet → pass-through, doc 2 visible
    def servedDocs(): Seq[Long] =
      IndexMaintenance.withoutDeleted(
          IndexMaintenance.postings(spark, td, st), tb)
        .filter(col("token") === "beta")
        .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(servedDocs() == Seq(1L, 2L))

    // delete doc 2: hidden from serving, ledger decremented, and the
    // anti-join must be BROADCAST (serve plans keep their scan shape)
    IndexMaintenance.deleteDocs(spark, Seq(2L), tb, st)
    assert(servedDocs() == Seq(1L))
    assert(IndexMaintenance.docCount(spark, st) == 2L)
    val p = IndexMaintenance.withoutDeleted(spark.table(td), tb)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"tombstones must apply as a broadcast anti-join:\n$p")

    // replayed delete: no double-append, no double-decrement
    IndexMaintenance.deleteDocs(spark, Seq(2L), tb, st)
    assert(IndexMaintenance.docCount(spark, st) == 2L,
      "replayed delete double-decremented the ledger")
    assert(spark.table(tb).count() == 1L,
      "replayed delete double-appended the tombstone")

    // purge: postings physically dropped, tombstones cleared, layout
    // bucketed, serving unchanged (now via pass-through)
    IndexMaintenance.compact(spark, td, statsTable = Some(st),
      tombstoneTable = Some(tb))
    assert(spark.table(td).filter(col("doc_id") === 2L).isEmpty,
      "purge left deleted postings behind")
    assert(!spark.catalog.tableExists(tb), "purge must clear tombstones")
    assert(servedDocs() == Seq(1L))
    assert(IndexMaintenance.docCount(spark, st) == 2L)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p2 = spark.table(td).groupBy("token").agg(sum("cnt"))
        .queryExecution.executedPlan.toString
      assert(p2.contains("Bucketed: true") && !p2.contains("Exchange"),
        s"purged table lost its bucket layout:\n$p2")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)

    TestWarehouse.reset(spark, td, st, td + "_ledger")
  }

  test("compact crash window: staged postings adopted, serving survives") {
    import spark.implicits._
    val td = "idx_crash_termdoc"
    val st = "idx_crash_stats"
    TestWarehouse.reset(spark, td, st, td + "_ledger", td + "_staging")

    val base = Seq((1L, "alpha beta gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    graft.queries.Text.termDocPositionalOf(base)
      .write.bucketBy(8, "token").sortBy("token").saveAsTable(td)
    base.groupBy().agg(count(lit(1)).as("n_docs"))
      .withColumn("batch_id", lit(-1L)).select("batch_id", "n_docs")
      .write.saveAsTable(st)
    val rowsBefore = spark.table(td).orderBy("doc_id", "token")
      .collect().toSeq

    // simulate compact dying at its ONE vulnerable point — staging
    // fully written, live table dropped, rename never ran (exactly the
    // window that used to lose the artifact under drop-then-rewrite)
    spark.table(td).repartition(col("token"))
      .write.mode("overwrite").bucketBy(8, "token").sortBy("token")
      .saveAsTable(td + "_staging")
    spark.sql(s"DROP TABLE $td")
    assert(!spark.catalog.tableExists(td))

    // the next serving read recovers the artifact — identical contents
    val served = IndexMaintenance.postings(spark, td, st)
    assert(spark.catalog.tableExists(td), "staged postings not adopted")
    assert(!spark.catalog.tableExists(td + "_staging"),
      "adoption must consume the staging table")
    assert(served.orderBy("doc_id", "token").collect().toSeq == rowsBefore,
      "recovered postings differ from the pre-crash artifact")

    // the adopted table keeps the bucket layout (zero-exchange serving)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = spark.table(td).groupBy("token").agg(sum("cnt"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true") && !p.contains("Exchange"),
        s"adopted postings lost the bucket layout:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)

    // a maintenance append landing in the crash window also recovers
    // first (fresh-table stranding is unreachable): re-create the
    // window, then append a new batch
    spark.table(td).repartition(col("token"))
      .write.mode("overwrite").bucketBy(8, "token").sortBy("token")
      .saveAsTable(td + "_staging")
    spark.sql(s"DROP TABLE $td")
    IndexMaintenance.appendBatch(
      Seq((3L, "gamma zeta")).toDF("doc_id", "text"), 7L, td, st)
    assert(!spark.catalog.tableExists(td + "_staging"))
    assert(IndexMaintenance.postings(spark, td, st)
      .select("doc_id").distinct().count() == 3L,
      "append after adoption must see old AND new docs")

    TestWarehouse.reset(spark, td, st, td + "_ledger")
  }
}
