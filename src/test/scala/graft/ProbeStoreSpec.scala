package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.ProbeStore
import graft.streaming.ProbeMaintenance

/** The cross-modal probe artifact: store-served probes must equal the
  * fresh derivation bit for bit (single source of truth — probesOf),
  * and erasure must re-elect each victim digest's next-min survivor
  * through the suppression-ledger rebuild, dropping a digest whose
  * re-elected survivor falls outside the % 25 probe subset.
  */
class ProbeStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val tmpDir = "/tmp/pbs_corpus"
  private def storeName: String =
    ProbeStore.erasedTable(tmpDir).stripSuffix("_erased")

  // digest T shared by 0/25/90 (survivor 0, a probe: 0 % 25 == 0);
  // 50 and 75 unique probes; 3/7 unique non-probes
  private val corpus = Seq(
    (0L, "shared payload"), (25L, "shared payload"),
    (90L, "shared payload"), (50L, "unique fifty"),
    (75L, "unique seventyfive"), (3L, "u-three"), (7L, "u-seven"))

  private def writeCorpus(): Unit = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmpDir/documents.parquet")
    corpus.map { case (i, _) =>
      (i, Seq.tabulate(4)(j => (i + j).toFloat)) }
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmpDir/embeddings.parquet")
  }

  private def servedIds: Set[Long] = {
    import spark.implicits._
    ProbeStore.probesFor(spark, tmpDir)
      .select("probe_id").as[Long].collect().toSet
  }

  test("store == fresh derivation; erasure re-elects the digest " +
      "survivor; a non-probe re-election drops the digest") {
    import spark.implicits._
    TestWarehouse.reset(spark, s"${storeName}_probes",
      s"${storeName}_erased")
    writeCorpus()

    assert(servedIds == Set(0L, 50L, 75L))
    // single source of truth: the stored frame IS probesOf's output
    val fresh = ProbeStore.probesOf(
        tables.load(spark, tmpDir, "documents"),
        tables.load(spark, tmpDir, "embeddings"))
      .select("blob_digest", "probe_id")
      .as[(String, Long)].collect().toSet
    assert(ProbeStore.probesFor(spark, tmpDir)
      .select("blob_digest", "probe_id")
      .as[(String, Long)].collect().toSet == fresh,
      "store-served probes differ from the fresh derivation")
    // the stored pe must be the probe's own embedding row
    val pe0 = ProbeStore.probesFor(spark, tmpDir)
      .filter(col("probe_id") === 0L)
      .select("pe").as[Seq[Float]].head()
    assert(pe0 == Seq.tabulate(4)(_.toFloat))

    // erase the shared digest's survivor: next-min 25 is re-elected
    // (25 % 25 == 0 — still a probe) and serves ITS embedding
    ProbeStore.eraseDocs(spark, tmpDir, Seq(0L))
    assert(servedIds == Set(25L, 50L, 75L),
      "victim digest must re-elect its next-min survivor")
    // replay is a no-op (ledger dedup: no new ids, no victim serving)
    val t0 = spark.table(s"${storeName}_probes").collect().toSet
    ProbeStore.eraseDocs(spark, tmpDir, Seq(0L))
    assert(spark.table(s"${storeName}_probes").collect().toSet == t0,
      "replayed erase rebuilt an already-gated artifact")

    // erase 25 too: the remaining owner 90 is NOT on the % 25 lattice —
    // the digest must LEAVE the probe set, not serve a stale row
    ProbeStore.eraseDocs(spark, tmpDir, Seq(25L))
    assert(servedIds == Set(50L, 75L),
      "digest whose re-elected survivor is a non-probe must drop out")
    // suppression ledger outlives the content
    assert(spark.table(s"${storeName}_erased")
      .select("doc_id").as[Long].collect().toSet == Set(0L, 25L))
  }
}

/** The streaming twin: the ledger's per-batch digest-min rows must
  * serve exactly what a one-shot probesOf over the same rows serves
  * (min-fold invariance across any batching — the % 25 filter applied
  * on the GLOBAL min only), skip replays, fold at compact without
  * changing serving, and purge victims through a gated digest rebuild
  * that refuses while an orphan row-set is pending.
  */
class ProbeMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val rows = Seq(
    (25L, "shared payload"), (90L, "shared payload"), (50L, "unique fifty"),
    (3L, "u-three"), (0L, "shared payload"), (75L, "unique seventyfive"),
    (7L, "u-seven"))

  private def emb: DataFrame = {
    import spark.implicits._
    rows.map { case (i, _) =>
      (i, Seq.tabulate(4)(j => (i + j).toFloat)) }
      .toDF("vec_id", "embedding")
  }

  private def served(lt: String, mt: String): Set[(String, Long)] = {
    import spark.implicits._
    ProbeMaintenance.servedProbes(spark, lt, mt, emb)
      .select("blob_digest", "probe_id")
      .as[(String, Long)].collect().toSet
  }

  private def freshOf(rs: Seq[(Long, String)]): Set[(String, Long)] = {
    import spark.implicits._
    ProbeStore.probesOf(rs.toDF("doc_id", "text"), emb)
      .select("blob_digest", "probe_id")
      .as[(String, Long)].collect().toSet
  }

  test("streamed ledger == one-shot derivation across batches that " +
      "split a digest; replay no-op; compact preserves serving") {
    import spark.implicits._
    val (lt, mt) = ("pbm_ledger", "pbm_marker")
    TestWarehouse.reset(spark, lt, mt, s"${lt}_staging")
    // digest T split across batches with the GLOBAL min (0) in the
    // SECOND batch: a serve that filtered % 25 per batch-local min
    // would still pass for 25 but the fold must pick 0
    val batches = Seq(rows.take(4), rows.drop(4))
    batches.zipWithIndex.foreach { case (b, i) =>
      ProbeMaintenance.appendBatch(
        b.toDF("doc_id", "text"), i.toLong, lt, mt)
    }
    assert(ProbeMaintenance.streamLength(spark, mt) == rows.size.toLong)
    assert(served(lt, mt) == freshOf(rows),
      "streamed ledger serves differently from a one-shot derivation")
    assert(served(lt, mt).map(_._2) == Set(0L, 50L, 75L))

    // replay of a committed batch: ledger + marker unchanged
    val n0 = spark.table(lt).count()
    ProbeMaintenance.appendBatch(
      batches(1).toDF("doc_id", "text"), 1L, lt, mt)
    assert(spark.table(lt).count() == n0, "replay appended rows")
    assert(spark.table(mt).count() == 2, "replay wrote a second marker")

    // compact folds to one row per digest, serving unchanged
    ProbeMaintenance.compact(spark, lt, mt)
    assert(served(lt, mt) == freshOf(rows), "compaction changed serving")
    val dup = spark.table(lt).groupBy("blob_digest")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dup == 0, "compaction left multi-row digests")
  }

  test("purgeDocs re-elects from the gated source; refuses with an " +
      "orphan pending and on an all-orphan ledger") {
    import spark.implicits._
    val (lt, mt) = ("pbmp_ledger", "pbmp_marker")
    TestWarehouse.reset(spark, lt, mt, s"${lt}_staging", s"${lt}_erased")
    val all = rows.toDF("doc_id", "text")
    ProbeMaintenance.appendBatch(all, 0L, lt, mt)

    // purge the shared digest's survivor: the ledger row must be
    // re-reduced from the gated source (next-min 25), no victim id left
    ProbeMaintenance.purgeDocs(spark, all, lt, mt, Seq(0L))
    assert(served(lt, mt) == freshOf(rows.filter(_._1 != 0L)),
      "purged ledger serves differently from a gated one-shot")
    assert(spark.table(lt).filter(col("cand_id") === 0L).isEmpty,
      "victim id survives in the ledger")

    // an uncommitted orphan row-set must refuse the purge loudly
    Seq((9L, "zz-orphan", 9L)).toDF("batch_id", "blob_digest", "cand_id")
      .write.mode("append").saveAsTable(lt)
    val e = intercept[IllegalArgumentException] {
      ProbeMaintenance.purgeDocs(spark, all, lt, mt, Seq(25L))
    }
    assert(e.getMessage.contains("orphan"),
      s"wrong refusal message: ${e.getMessage}")

    // all-orphan ledger (marker table exists but empty): an erasure
    // request must refuse, not silently no-op
    val (lo, mo) = ("pbmo_ledger", "pbmo_marker")
    TestWarehouse.reset(spark, lo, mo, s"${lo}_staging")
    Seq.empty[(Long, Long)].toDF("batch_id", "n_docs")
      .write.mode("overwrite").saveAsTable(mo)
    Seq((0L, "zz-orphan", 9L)).toDF("batch_id", "blob_digest", "cand_id")
      .write.mode("overwrite").saveAsTable(lo)
    val e2 = intercept[IllegalArgumentException] {
      ProbeMaintenance.purgeDocs(spark, all, lo, mo, Seq(9L))
    }
    assert(e2.getMessage.contains("orphan"),
      s"wrong refusal message: ${e2.getMessage}")
  }

  test("sequential purges on a shared digest never re-elect an " +
      "earlier victim; suppression outlives the purge call") {
    import spark.implicits._
    val (lt, mt) = ("pbms_ledger", "pbms_marker")
    TestWarehouse.reset(spark, lt, mt, s"${lt}_staging", s"${lt}_erased")
    val all = rows.toDF("doc_id", "text")
    ProbeMaintenance.appendBatch(all, 0L, lt, mt)

    // the shared digest elects 0; the live source keeps carrying ALL
    // rows (the purge contract allows victim rows still present).
    // purge(0) re-elects 25; purge(25) must then elect 90 — a gate
    // that only knew THIS call's victims would re-elect 0 from the
    // source (the round-16 ADVICE privacy bug)
    ProbeMaintenance.purgeDocs(spark, all, lt, mt, Seq(0L))
    ProbeMaintenance.purgeDocs(spark, all, lt, mt, Seq(25L))
    val cands = spark.table(lt).select("cand_id")
      .as[Long].collect().toSet
    assert(!cands.contains(0L) && !cands.contains(25L),
      s"an erased victim re-entered the ledger: $cands")
    assert(cands.contains(90L), s"shared digest lost its survivor: $cands")
    assert(served(lt, mt) ==
      freshOf(rows.filter(r => r._1 != 0L && r._1 != 25L)),
      "post-purge ledger serves differently from the fully-gated one-shot")
    // the suppression ledger recorded both calls' victims
    val erased = spark.table(s"${lt}_erased").select("doc_id")
      .as[Long].collect().toSet
    assert(erased == Set(0L, 25L), s"suppression ledger: $erased")

    // a victim RE-ARRIVING in a later batch must not re-enter either:
    // the append path reads the same suppression list
    ProbeMaintenance.appendBatch(
      Seq((0L, "shared payload"), (25L, "shared payload"))
        .toDF("doc_id", "text"), 1L, lt, mt)
    val after = spark.table(lt).select("cand_id").as[Long].collect().toSet
    assert(!after.contains(0L) && !after.contains(25L),
      s"a re-arriving victim re-entered via appendBatch: $after")
  }
}
