package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.index.VectorStore
import graft.streaming.RecallMonitor

/** Streaming ANN serving-quality monitor: per-batch recall@K of the
  * quantized serving path vs exact scores from the raw artifact
  * matches an independent pure-Scala computation; a healthy feed stays
  * above the alarm floor while a codebook-stale (drifted) feed dips
  * below it within one batch; replay is a no-op; the crash window
  * adopts the orphan row; a codes-only legacy store refuses loudly.
  */
class RecallMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String, extra: String*): Unit =
    TestWarehouse.reset(spark,
      Seq("centroids", "stats", "codes", "raw", "bits", "tombstones", "version")
        .map(t => s"${name}_$t") ++ extra: _*)

  private def corpus() = tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def loadVecs(): Map[Long, Array[Double]] = corpus()
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  // ---- independent reference implementation (pure Scala, the
  //      VectorRefineSpec conventions: engine operation order) ----
  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    if (n == 0.0) 0.0 else dot(a, b) / n
  }

  /** (mean, min, perProbe) recall of the quantized+pruned serve vs
    * exact over the stored vectors, for the monitor's capped lowest-id
    * probe sample of `batchIds` — no Spark plans at all. */
  private def refRecall(vecs: Map[Long, Array[Double]],
                        batchIds: Seq[Long]): (Double, Double, Map[Long, Double]) = {
    val cents = vecs.filter(_._1 < VectorStore.Cells).toSeq.sortBy(_._1)
    val dim = vecs.head._2.length
    val mns = (0 until dim).map(d => vecs.values.map(_(d)).min).toArray
    val mxs = (0 until dim).map(d => vecs.values.map(_(d)).max).toArray
    def deq(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { d =>
        if (mxs(d) == mns(d)) mns(d)
        else {
          val raw = (v(d) - mns(d)) / (mxs(d) - mns(d)) * 255.0
          val code = math.min(255.0, math.max(0.0, math.floor(raw + 0.5)))
          mns(d) + (code / 255.0) * (mxs(d) - mns(d))
        }
      }
    def cellsOf(v: Array[Double], keep: Int): Seq[Long] =
      cents.map { case (cid, ce) => (l2sq(v, ce), cid) }
        .sorted.take(keep).map(_._2)
    val assign = vecs.map { case (id, v) => id -> cellsOf(v, 1).head }
    val probes = batchIds.sorted.take(RecallMonitor.ProbeCap)
    val per = probes.map { p =>
      val pe = vecs(p)
      val pc = cellsOf(pe, VectorStore.NProbe).toSet
      val approx = vecs.toSeq
        .filter { case (id, _) => id != p && pc.contains(assign(id)) }
        .map { case (id, v) => (id, cosine(pe, deq(v))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(RecallMonitor.K).map(_._1).toSet
      val exact = vecs.toSeq
        .filter { case (id, _) => id != p }
        .map { case (id, v) => (id, cosine(pe, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(RecallMonitor.K).map(_._1).toSet
      p -> approx.intersect(exact).size.toDouble / exact.size
    }.toMap
    (per.values.sum / per.size, per.values.min, per)
  }

  test("streamed per-batch recall == independent math; replay/crash safe") {
    import spark.implicits._
    reset("rm", "rm_ledger", "rm_marker")
    VectorStore.build(corpus(), "rm")
    val vecs = loadVecs()

    val batch1 = vecs.keys.filter(_ % 3 == 0).toSeq.sorted.take(20)
    val batch2 = vecs.keys.filter(_ % 3 == 1).toSeq.sorted.take(20)

    val stream = MemoryStream[(Long, Array[Double])](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-rm-ckpt").toString
    val q = RecallMonitor.maintain(
      stream.toDF().toDF("vec_id", "embedding"), "rm", "rm_ledger",
      "rm_marker", ckpt)
    try {
      stream.addData(batch1.map(id => (id, vecs(id))))
      q.processAllAvailable()
      stream.addData(batch2.map(id => (id, vecs(id))))
      q.processAllAvailable()
    } finally q.stop()

    val served = RecallMonitor.recalls(spark, "rm_ledger", "rm_marker")
      .orderBy("batch_id").collect()
    assert(served.length == 2)
    Seq(batch1, batch2).zip(served).foreach { case (ids, row) =>
      val (mean, mn, per) = refRecall(vecs, ids)
      assert(row.getLong(row.fieldIndex("n_probes")) == per.size)
      assert(math.abs(row.getDouble(row.fieldIndex("mean_recall")) - mean) < 1e-6,
        s"mean ${row.getDouble(row.fieldIndex("mean_recall"))} != $mean")
      assert(math.abs(row.getDouble(row.fieldIndex("min_recall")) - mn) < 1e-6)
      // healthy feed: probes from the build corpus itself sit far
      // above the alarm floor (SQ near-exact; loss ≈ cell pruning)
      assert(!row.getBoolean(row.fieldIndex("alarm")),
        s"healthy batch alarmed at mean $mean")
    }

    // replay of a committed batch id is a no-op
    val before = spark.table("rm_ledger").count()
    RecallMonitor.recallBatch(
      batch1.map(id => (id, vecs(id))).toDF("vec_id", "embedding"),
      0L, "rm", "rm_ledger", "rm_marker")
    assert(spark.table("rm_ledger").count() == before)

    // crash window: ledger row landed, marker write died — replay
    // adopts the orphan row instead of duplicating it
    val crash = batch2.take(5).map(id => (id, vecs(id)))
      .toDF("vec_id", "embedding")
    RecallMonitor.recallRow(crash, "rm")
      .withColumn("batch_id", lit(77L))
      .select("batch_id", "n_probes", "mean_recall", "min_recall", "alarm")
      .write.mode("append").saveAsTable("rm_ledger")
    val orphaned = spark.table("rm_ledger").count()
    assert(RecallMonitor.recalls(spark, "rm_ledger", "rm_marker")
      .filter(col("batch_id") === 77L).count() == 0L,
      "uncommitted orphan row must not serve")
    RecallMonitor.recallBatch(crash, 77L, "rm", "rm_ledger", "rm_marker")
    assert(spark.table("rm_ledger").count() == orphaned,
      "crash-window replay duplicated the recall row")
    assert(RecallMonitor.recalls(spark, "rm_ledger", "rm_marker")
      .filter(col("batch_id") === 77L).count() == 1L)
    spark.catalog.clearCache()
  }

  test("codebook-stale feed alarms within one batch") {
    import spark.implicits._
    reset("rs", "rs_ledger", "rs_marker")
    VectorStore.build(corpus(), "rs")
    val vecs = loadVecs()
    // drift: the same vectors shifted far outside the frozen SQ range
    // — their codes CLAMP at the range edge, so quantized scores
    // collapse onto one corner and the shortlist degenerates to id
    // order while exact cosine still separates them
    val drifted = vecs.toSeq.sortBy(_._1).take(100)
      .map { case (id, v) => (id + 100000L, v.map(_ + 10.0)) }
    VectorStore.append(drifted.toDF("vec_id", "embedding"), "rs")

    val probeIds = drifted.map(_._1).take(RecallMonitor.ProbeCap)
    val row = RecallMonitor.recallRow(
      drifted.filter(d => probeIds.contains(d._1))
        .toDF("vec_id", "embedding"), "rs").collect().head
    val mean = row.getDouble(row.fieldIndex("mean_recall"))
    assert(row.getBoolean(row.fieldIndex("alarm")),
      s"stale-codebook feed did not alarm: mean recall $mean")
    assert(mean < RecallMonitor.AlarmFloor)
    spark.catalog.clearCache()
  }

  test("scoreEvery cadence: off-cadence batches commit without scoring") {
    import spark.implicits._
    reset("rc", "rc_ledger", "rc_marker")
    VectorStore.build(corpus(), "rc")
    val vecs = loadVecs()
    val ids = vecs.keys.toSeq.sorted.take(10)
    def frame(off: Int) = ids.map(id => (id, vecs(id)))
      .toDF("vec_id", "embedding")
    // every-2nd cadence: batch 0 scores, batch 1 commits unscored,
    // batch 2 scores
    (0L to 2L).foreach(b => RecallMonitor.recallBatch(frame(b.toInt), b,
      "rc", "rc_ledger", "rc_marker", scoreEvery = 2))
    val scored = RecallMonitor.recalls(spark, "rc_ledger", "rc_marker")
      .select("batch_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(scored == Seq(0L, 2L),
      s"every-2nd cadence must score batches 0 and 2 only: $scored")
    assert(spark.table("rc_marker").count() == 3L,
      "every batch must commit its marker, scored or not")
    // replay of the unscored batch stays a no-op — no late scoring
    RecallMonitor.recallBatch(frame(1), 1L, "rc", "rc_ledger", "rc_marker",
      scoreEvery = 2)
    assert(spark.table("rc_ledger").count() == 2L &&
      spark.table("rc_marker").count() == 3L)
    spark.catalog.clearCache()
  }

  test("auto cadence: small store scores every batch, large every Nth") {
    import spark.implicits._
    // small store (500 vecs, far under AutoSizeRows): the AutoCadence
    // default resolves to 1 — every batch writes a recall row
    reset("ras", "ras_ledger", "ras_marker")
    VectorStore.build(corpus(), "ras")
    val vecs = loadVecs()
    val ids = vecs.keys.toSeq.sorted.take(8)
    def frame() = ids.map(id => (id, vecs(id))).toDF("vec_id", "embedding")
    (0L to 1L).foreach(b =>
      RecallMonitor.recallBatch(frame(), b, "ras", "ras_ledger", "ras_marker"))
    assert(RecallMonitor.recalls(spark, "ras_ledger", "ras_marker")
      .count() == 2L, "small store must score every batch under auto")
    assert(spark.table("ras_marker").count() == 2L)

    // large store (past AutoSizeRows codes): auto resolves to
    // AutoEvery — off-cadence batches commit their marker unscored,
    // the AutoEvery-th scores. Ledger semantics identical to an
    // explicit scoreEvery = AutoEvery run.
    reset("ral", "ral_ledger", "ral_marker")
    val big = spark.range(RecallMonitor.AutoSizeRows + 1)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(3)),
          d => sin(col("id") * lit(0.7) + d.cast("double") * lit(1.3)))
          .as("embedding"))
    VectorStore.build(big, "ral", cells = 16) // explicit: keep the test fast
    val bids = (0L until 8L).toSeq
    def bframe() = bids.map(id => (id,
        Array.tabulate(4)(d => math.sin(id * 0.7 + d * 1.3))))
      .toDF("vec_id", "embedding")
    Seq(0L, 1L, RecallMonitor.AutoEvery.toLong).foreach(b =>
      RecallMonitor.recallBatch(bframe(), b, "ral", "ral_ledger", "ral_marker"))
    val scored = RecallMonitor.recalls(spark, "ral_ledger", "ral_marker")
      .select("batch_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(scored == Seq(0L, RecallMonitor.AutoEvery.toLong),
      s"large store must score only on the AutoEvery cadence: $scored")
    assert(spark.table("ral_marker").count() == 3L,
      "off-cadence batches must still commit markers")
    spark.catalog.clearCache()
  }

  test("alarm-gated rebuild retrains the codebook; recall recovers") {
    import spark.implicits._
    reset("rr", "rr_ledger", "rr_marker")
    TestWarehouse.reset(spark,
      (2 to 3).flatMap(v =>
        Seq("centroids", "stats", "codes", "raw", "bits", "tombstones")
          .map(t => s"rr_v${v}_$t")): _*)
    VectorStore.build(corpus(), "rr")
    val vecs = loadVecs()

    // a healthy committed row must NOT fire the gate
    val healthy = vecs.keys.toSeq.sorted.take(20)
    RecallMonitor.recallBatch(
      healthy.map(id => (id, vecs(id))).toDF("vec_id", "embedding"),
      0L, "rr", "rr_ledger", "rr_marker")
    assert(VectorStore.rebuildIfRecallLow(corpus(), "rr",
      "rr_ledger", "rr_marker").isEmpty,
      "healthy recall row must not trigger a rebuild")
    assert(VectorStore.currentVersion(spark, "rr") == 1L)

    // drifted ingest clamps against the frozen codebook; the monitor
    // commits an alarm row on the drifted probes
    val drifted = vecs.toSeq.sortBy(_._1).take(100)
      .map { case (id, v) => (id + 100000L, v.map(_ + 10.0)) }
    VectorStore.append(drifted.toDF("vec_id", "embedding"), "rr")
    val probeFrame = drifted.take(RecallMonitor.ProbeCap)
      .toDF("vec_id", "embedding")
    RecallMonitor.recallBatch(probeFrame, 1L, "rr", "rr_ledger", "rr_marker")
    val alarmRow = RecallMonitor.recalls(spark, "rr_ledger", "rr_marker")
      .filter(col("batch_id") === 1L).collect().head
    assert(alarmRow.getBoolean(alarmRow.fieldIndex("alarm")),
      "test premise: drifted feed must alarm")
    val staleMean = alarmRow.getDouble(alarmRow.fieldIndex("mean_recall"))

    // the gate fires on the committed alarm; the retrain runs on the
    // CURRENT population so the new per-dim range spans the drift
    val current = corpus().unionByName(drifted.toDF("vec_id", "embedding"))
    val fired = VectorStore.rebuildIfRecallLow(current, "rr",
      "rr_ledger", "rr_marker")
    assert(fired.contains(2L), s"alarmed ledger must trigger rebuild: $fired")
    assert(VectorStore.currentVersion(spark, "rr") == 2L)

    // the same probes against the rebuilt store: codes separate again,
    // recall recovers above the floor (and strictly above the stale
    // measurement — the rebuild must have bought something)
    val row = RecallMonitor.recallRow(probeFrame, "rr").collect().head
    val recovered = row.getDouble(row.fieldIndex("mean_recall"))
    assert(!row.getBoolean(row.fieldIndex("alarm")),
      s"rebuilt store still alarms: mean $recovered")
    assert(recovered > staleMean,
      s"rebuild did not improve recall: $staleMean -> $recovered")
    spark.catalog.clearCache()
  }

  test("codes-only legacy store refuses the recall surface") {
    import spark.implicits._
    reset("rl")
    VectorStore.build(corpus(), "rl")
    spark.sql("DROP TABLE IF EXISTS rl_raw")
    val probes = Seq((0L, loadVecs()(0L))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      RecallMonitor.recallRow(probes, "rl").collect()
    }
    assert(e.getMessage.contains("no raw-vector table"))
    spark.catalog.clearCache()
  }
}
