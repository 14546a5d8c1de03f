package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{FateMaintenance, Maintenance}

/** The streamed funnel-fate ledger must equal batch pl47 (round-17
  * verdict #1): fate assignment per micro-batch against frozen
  * release artifacts (eval band store, semantic store, rates epoch)
  * reproduces the batch report bit for bit under ascending arrival —
  * and a WRONG initial rates epoch heals at compaction, whose
  * re-stamp recomputes rates from the ledger's own survivors. Plus
  * the maintainer contracts: replay no-op, crash-window partition
  * overwrite, committed-only serve, compactAll/status wiring.
  */
class FateMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val Band = "fm_evalbands"
  private val Sem = "fm_sem"

  private def allTables(p: String) = Seq(
    s"${Band}_shingles", s"${Band}_sigs", s"${Band}_bands",
    s"${Sem}_cent", s"${Sem}_eval",
    s"${p}_ledger", s"${p}_marker", s"${p}_rates", s"${p}_ledger_staging")

  private def docsF = tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("lang"), col("text"))

  /** The maintainer's input frame: docs with their embedding attached
    * (null when the doc has no embeddings row — pl25's universe). */
  private def inputF = docsF.join(
    tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding")),
    Seq("doc_id"), "left")

  /** Three ascending doc_id slices — the arrival-order contract. */
  private def slices: Seq[DataFrame] = {
    val ids = docsF.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0))
    val cut1 = ids(ids.length / 3)
    val cut2 = ids(2 * ids.length / 3)
    val in = inputF
    Seq(in.filter(col("doc_id") < cut1),
      in.filter(col("doc_id") >= cut1 && col("doc_id") < cut2),
      in.filter(col("doc_id") >= cut2))
  }

  private def batchPl47: Seq[org.apache.spark.sql.Row] = {
    spark.catalog.clearCache()
    SparkEntry.queries("pl47_funnel_fate")(spark, dir).collect().toSeq
  }

  private def buildStores(): Unit = {
    graft.index.DedupStore.build(
      docsF.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")), Band)
    FateMaintenance.buildSemanticStore(
      tables.load(spark, dir, "embeddings"), Sem)
  }

  /** Stamp epoch 0 with the rates batch pl47 itself uses: recomputed
    * from the batch report's own survivors (the kept/rebalanced_out
    * rows ARE s3 — the survivor set is rate-independent). */
  private def stampOracleRates(p: String): Unit = {
    spark.catalog.clearCache()
    val survivors = SparkEntry.queries("pl47_funnel_fate")(spark, dir)
      .filter(col("fate").isin("kept", "rebalanced_out"))
      .join(docsF.select("doc_id", "lang"), "doc_id")
    FateMaintenance.stampRates(survivors, s"${p}_rates", 0L)
    spark.catalog.clearCache()
  }

  private def served(p: String): Seq[org.apache.spark.sql.Row] =
    FateMaintenance.fates(spark, s"${p}_ledger", s"${p}_marker")
      .select("doc_id", "fate", "twin_id").orderBy("doc_id")
      .collect().toSeq

  test("streamed fates == batch pl47 under the oracle-equal frozen epoch") {
    import spark.implicits._
    val p = "fm1"
    TestWarehouse.reset(spark, allTables(p): _*)
    buildStores()
    stampOracleRates(p)
    val want = batchPl47
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-fm-ckpt").toString
    val stream = MemoryStream[Long](spark)
    val in = inputF
    val q = FateMaintenance.maintain(
      stream.toDF().toDF("doc_id").join(in, Seq("doc_id")),
      s"${p}_ledger", s"${p}_marker", ckpt, Band, Sem, s"${p}_rates")
    try slices.foreach { s =>
      stream.addData(s.select("doc_id").collect().map(_.getLong(0)).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = served(p)
    assert(got.size == want.size,
      s"streamed ledger has ${got.size} fate rows, batch pl47 has ${want.size}")
    assert(got == want, "streamed fates diverged from batch pl47")
  }

  test("replayed batch is a no-op; crash-window partial partition is " +
      "invisible until its marker and overwritten WHOLE on replay") {
    import spark.implicits._
    val p = "fm2"
    TestWarehouse.reset(spark, allTables(p): _*)
    buildStores()
    stampOracleRates(p)
    val Seq(s0, s1, s2) = slices
    FateMaintenance.appendBatch(s0, 0L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    val after0 = served(p)
    // replay: marker exists, nothing changes
    FateMaintenance.appendBatch(s0, 0L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    assert(served(p) == after0, "replayed committed batch mutated the ledger")
    // crash window: a PARTIAL row-set lands under batch_id=1 with no
    // marker — it must not serve, and the eventual replay overwrites
    // the partition wholesale (the bogus row cannot survive)
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try Seq((-999L, "xx", "kept", Option.empty[Long], 0L, 1L))
      .toDF("doc_id", "lang", "fate", "twin_id", "epoch_id", "batch_id")
      .write.mode("overwrite").insertInto(s"${p}_ledger")
    finally spark.conf.unset(key)
    assert(served(p) == after0,
      "an uncommitted crash-window partition leaked into serving")
    FateMaintenance.appendBatch(s1, 1L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    val got = served(p)
    assert(!got.exists(_.getLong(0) == -999L),
      "replay adopted a partial crash-window row instead of overwriting")
    FateMaintenance.appendBatch(s2, 2L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    assert(served(p) == batchPl47)
  }

  test("a wrong initial rates epoch heals at compact: re-stamp from the " +
      "ledger's own survivors == batch pl47; other fates untouched") {
    import spark.implicits._
    val p = "fm3"
    TestWarehouse.reset(spark, allTables(p): _*)
    buildStores()
    // epoch 0 deliberately WRONG: keep everything (keep_prob 1.0)
    docsF.select("lang").distinct().collect().map(_.getString(0))
      .map(l => (0L, l, 1.0)).toSeq
      .toDF("epoch_id", "lang", "keep_prob")
      .write.saveAsTable(s"${p}_rates")
    slices.zipWithIndex.foreach { case (s, i) =>
      FateMaintenance.appendBatch(s, i.toLong, s"${p}_ledger",
        s"${p}_marker", Band, Sem, s"${p}_rates")
    }
    val want = batchPl47
    val before = served(p)
    assert(before != want,
      "keep-everything epoch should disagree with batch pl47 — " +
        "if it doesn't, this corpus can't exercise the re-stamp")
    // the survivor SET is rate-independent: only kept/rebalanced_out
    // labels may differ before compaction
    val nonSampling = (r: org.apache.spark.sql.Row) =>
      r.getString(1) != "kept" && r.getString(1) != "rebalanced_out"
    assert(before.filter(nonSampling) == want.filter(nonSampling),
      "non-sampling fates must not depend on the rates epoch")
    FateMaintenance.compact(spark, s"${p}_ledger", s"${p}_marker",
      s"${p}_rates")
    assert(served(p) == want,
      "compact's re-stamp must reproduce batch pl47's rates exactly")
    // the re-stamp recorded its epoch: ledger rows carry epoch 1 and
    // the rates table has the recomputed row-set under it
    val eps = FateMaintenance.fates(spark, s"${p}_ledger", s"${p}_marker")
      .select("epoch_id").distinct().collect().map(_.getLong(0)).toSeq
    assert(eps == Seq(1L), s"re-stamped ledger carries epochs $eps")
    // serving is invariant under a second compact (fixed point: same
    // survivors -> same rates -> same coins)
    FateMaintenance.compact(spark, s"${p}_ledger", s"${p}_marker",
      s"${p}_rates")
    assert(served(p) == want)
  }

  test("purgeDocs erases victims' rows AND twin references; refuses on " +
      "an orphan partition; wired into Erasure.Scope") {
    import spark.implicits._
    val p = "fm5"
    TestWarehouse.reset(spark, allTables(p): _*)
    TestWarehouse.reset(spark, s"${p}_ledger_erasure_staging", s"${p}_el")
    buildStores()
    stampOracleRates(p)
    slices.zipWithIndex.foreach { case (s, i) =>
      FateMaintenance.appendBatch(s, i.toLong, s"${p}_ledger",
        s"${p}_marker", Band, Sem, s"${p}_rates")
    }
    val all = FateMaintenance.fates(spark, s"${p}_ledger", s"${p}_marker")
      .collect().toSeq
    // pick a victim that other docs REFERENCE as twin (a url_dup
    // keeper), plus its referencing doc's subject row must survive
    // with the reference forgotten
    val referenced = all.filter(r => !r.isNullAt(3)).map(_.getLong(3))
    assert(referenced.nonEmpty, "regime check: some twin references exist")
    val victim = referenced.head
    val referrers = all.filter(r => !r.isNullAt(3) &&
      r.getLong(3) == victim).map(_.getLong(0)).toSet
    // erasure through the warehouse-wide scope surface
    graft.index.Erasure.record(spark, Seq(victim), s"${p}_el")
    graft.index.Erasure.enforceAll(spark, s"${p}_el",
      graft.index.Erasure.Scope(
        fateLedgers = Seq((s"${p}_ledger", s"${p}_marker"))))
    val after = FateMaintenance.fates(spark, s"${p}_ledger", s"${p}_marker")
      .collect().toSeq
    assert(!after.exists(_.getLong(0) == victim),
      "victim's own fate row survived the purge")
    assert(!after.exists(r => !r.isNullAt(3) && r.getLong(3) == victim),
      "a victim id survived in a twin_id reference")
    for (d <- referrers) {
      val row = after.find(_.getLong(0) == d)
      assert(row.isDefined && row.get.getString(2) == "url_dup" &&
        row.get.isNullAt(3),
        s"referrer $d must keep its fate with the twin forgotten")
    }
    assert(after.size == all.size - 1,
      "exactly the victim's row may disappear")
    // idempotent replay (the ledger already purged; victims still in
    // the erasure ledger)
    graft.index.Erasure.enforceAll(spark, s"${p}_el",
      graft.index.Erasure.Scope(
        fateLedgers = Seq((s"${p}_ledger", s"${p}_marker"))))
    assert(FateMaintenance.fates(spark, s"${p}_ledger", s"${p}_marker")
      .collect().toSeq == after)
    // the SEMANTIC store holds eval vectors' full embeddings: for an
    // eval-side victim the seam is rebuild-minus-suppression (the
    // geometry re-freezes); no victim id may survive in _cent/_eval
    val semVictim = spark.table(s"${Sem}_eval")
      .orderBy("eval_vec_id").limit(1)
      .select("eval_vec_id").collect().head.getLong(0)
    graft.index.Erasure.record(spark, Seq(semVictim), s"${p}_el")
    graft.index.Erasure.enforceAll(spark, s"${p}_el",
      graft.index.Erasure.Scope(
        fateLedgers = Seq((s"${p}_ledger", s"${p}_marker")),
        fateSemStores = Seq((Sem, dir))))
    assert(spark.table(s"${Sem}_eval")
      .filter(col("eval_vec_id") === semVictim).isEmpty,
      "victim embedding survives in the sem store's eval assignments")
    assert(spark.table(s"${Sem}_cent")
      .filter(col("cid") === semVictim).isEmpty,
      "victim embedding survives as a sem-store centroid")
    assert(spark.table(FateMaintenance.semErasedTable(Sem))
      .filter(col("vec_id") === semVictim).count() == 1,
      "suppression ledger must carry the victim")
    // a rebuild from a still-victim-bearing source cannot resurrect:
    // the suppression set gates every rebuild
    FateMaintenance.eraseSemStore(
      tables.load(spark, dir, "embeddings"), Sem, Seq(semVictim))
    assert(spark.table(s"${Sem}_eval")
      .filter(col("eval_vec_id") === semVictim).isEmpty)
    // rebuild the pristine store for later tests (fresh JVM semantics)
    TestWarehouse.reset(spark, FateMaintenance.semErasedTable(Sem))
    FateMaintenance.buildSemanticStore(
      tables.load(spark, dir, "embeddings"), Sem)
    // orphan refusal: an uncommitted crash-window partition present →
    // purge must refuse loudly, not silently skip the orphan
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "dynamic")
    try Seq((victim, "xx", "kept", Option.empty[Long], 0L, 99L))
      .toDF("doc_id", "lang", "fate", "twin_id", "epoch_id", "batch_id")
      .write.mode("overwrite").insertInto(s"${p}_ledger")
    finally spark.conf.unset(key)
    val e = intercept[IllegalArgumentException] {
      FateMaintenance.purgeDocs(spark, Seq(victim).toDF("doc_id"),
        s"${p}_ledger", s"${p}_marker")
    }
    assert(e.getMessage.contains("orphan"))
  }

  test("compactAll/status wire the fate family into the warehouse") {
    val p = "fm4"
    TestWarehouse.reset(spark, allTables(p): _*)
    buildStores()
    stampOracleRates(p)
    val Seq(s0, s1, _) = slices
    FateMaintenance.appendBatch(s0, 0L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    FateMaintenance.appendBatch(s1, 1L, s"${p}_ledger", s"${p}_marker",
      Band, Sem, s"${p}_rates")
    val wh = Maintenance.Warehouse(
      fateLedgers = Seq((s"${p}_ledger", s"${p}_marker", s"${p}_rates")))
    val st0 = Maintenance.status(spark, wh)
    assert(st0.size == 1 && st0.head.family == "fates" &&
      st0.head.exists && st0.head.committedBatches == 2 &&
      st0.head.orphanBatches == 0 && !st0.head.streamActive)
    val before = served(p)
    val walked = Maintenance.compactAll(spark, wh)
    assert(walked == Seq(s"${p}_ledger"))
    // fold: one partition tag; serving carries the re-stamped epoch
    // but the same doc set and the same non-sampling fates
    val ledger = spark.table(s"${p}_ledger")
    assert(ledger.select("batch_id").distinct().count() == 1)
    assert(served(p).map(_.getLong(0)) == before.map(_.getLong(0)))
  }
}
