package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.VectorStore
import graft.functions.VectorFunctions

/** Streaming ANN serving-quality monitor (sm19's serving twin — the
  * 18th maintainer, and the missing half of the drift→rebuild arc):
  * per micro-batch of arriving PROBE vectors, measure the recall@k of
  * the quantized serving path ([[VectorStore.serveTopK]] — IVF-pruned
  * int8 codes) against exact cosine over the store's own full-precision
  * `_raw` artifact, and ledger one row per batch. [[DriftMonitor]] and
  * [[PsiMonitor]] watch the INPUT distribution; this watches the
  * OUTPUT quality — the number a vector-serving dashboard actually
  * alarms on, and the direct trigger for a versioned
  * [[VectorStore.rebuild]]: when arriving probes drift away from the
  * frozen codebook, their quantized shortlists degrade (clamped codes
  * collapse distinct vectors onto the range edges) and recall dips
  * BEFORE any input-histogram signal names a cause.
  *
  * Ground truth at ARTIFACT granularity, deliberately: exact scores
  * come from the `_raw` table (tombstones subtracted), never the
  * upstream corpus — the monitor measures what quantization+pruning
  * lose against what the store could serve at full precision, and it
  * keeps working when the corpus has moved on. The truth side is a
  * full raw-table scan per batch against ≤ [[ProbeCap]] broadcast
  * probes: an EVAL job riding the micro-batch cadence, priced like
  * one (SURVEY §6b — run it on the ingest feed directly, or on every
  * Nth batch where the artifact is large; the probe cap, not the
  * batch size, bounds the scoring work).
  *
  * Delivery: the PsiMonitor commit-marker protocol — ledger append
  * with orphan ADOPTION, marker last, committed-only serve, replay
  * no-op. Requires a DURABLE checkpointDir (stable batch ids).
  */
object RecallMonitor {

  /** Neighbors compared per probe (recall@K). */
  val K: Int = VectorStore.TopK

  /** Probes scored per batch — the DETERMINISTIC lowest-id sample, so
    * replayed batches score identically and the per-batch cost is
    * bounded no matter how large a batch the ingest delivers. */
  val ProbeCap = 16

  /** Mean-recall floor below which the batch row raises `alarm` —
    * calibrated under the normal loss of this store's configuration
    * (nprobe/Cells cell pruning ≈ 0.4 recall on uniform vectors, SQ
    * near-exact): a healthy feed sits far above, a codebook-stale
    * feed collapses toward random (K/n). */
  val AlarmFloor = 0.2

  /** Sentinel `scoreEvery`: pick the cadence from the serving
    * artifact's size — every batch while the store is small, every
    * [[AutoEvery]]-th once its code count passes [[AutoSizeRows]]
    * (the ground-truth side is a full raw-artifact scan per scored
    * batch, so per-batch scoring of a large store turns the monitor
    * into the dominant load). The size check is one codes-table count
    * (parquet footer metadata, no data scan). Appends only GROW the
    * store, so the cadence can only coarsen over time — a replay that
    * resolves a coarser cadence than the original run at worst skips
    * scoring a batch whose orphan recall row then rides in under its
    * marker (the row is still the correct recall of that batch). */
  val AutoCadence = 0
  val AutoSizeRows = 100000L
  val AutoEvery = 8

  private def resolveCadence(spark: SparkSession, storeName: String,
                             scoreEvery: Int): Int =
    if (scoreEvery > 0) scoreEvery
    else {
      val t = s"${VectorStore.servingPrefix(spark, storeName)}_codes"
      val n = if (spark.catalog.tableExists(t)) spark.table(t).count()
              else 0L
      if (n > AutoSizeRows) AutoEvery else 1
    }

  /** Starts the monitor: one recall row per SCORED micro-batch of
    * `newProbes` (`vec_id`, `embedding`) into `ledgerTable`.
    *
    * `scoreEvery`: eval cadence — batches with
    * `batchId % scoreEvery != 0` commit their marker but write no
    * recall row. Cadence is keyed on the STABLE batch id, so replays
    * skip and score identically. Defaults to [[AutoCadence]]: resolved
    * from the serving artifact's size per batch (see above). */
  def maintain(newProbes: DataFrame, storeName: String, ledgerTable: String,
               markerTable: String, checkpointDir: String,
               scoreEvery: Int = AutoCadence,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "RecallMonitor.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    require(scoreEvery >= 0, s"scoreEvery must be >= 0, got $scoreEvery")
    newProbes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recallBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            Seq("probe_id")),
          batchId, storeName, ledgerTable, markerTable, scoreEvery)
      }
      .start()
  }

  /** One micro-batch: recall row vs the serving artifact (when this
    * batch is on the scoring cadence), then the commit marker.
    * Replay-safe; crash window closed by adoption. */
  def recallBatch(batch: DataFrame, batchId: Long, storeName: String,
                  ledgerTable: String, markerTable: String,
                  scoreEvery: Int = AutoCadence): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      val scored = batchId % resolveCadence(spark, storeName, scoreEvery) == 0
      val orphaned = scored && spark.catalog.tableExists(ledgerTable) &&
        !spark.table(ledgerTable).filter(col("batch_id") === batchId).isEmpty
      if (scored && !orphaned) {
        VectorStore.clearOrphanLocation(spark, ledgerTable)
        recallRow(batch, storeName)
          .withColumn("batch_id", lit(batchId))
          .select("batch_id", "n_probes", "mean_recall", "min_recall",
            "alarm")
          .write.mode("append").saveAsTable(ledgerTable)
      }
      VectorStore.clearOrphanLocation(spark, markerTable)
      batch.groupBy().agg(count(lit(1)).as("n_arrived"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_arrived")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** The 1-row recall frame for a static probe slice vs the serving
    * artifact — shared by the streaming path and batch spot-checks.
    * Probe ids share the stored id space (the serveTopK contract);
    * per-probe recall = |approx@K ∩ exact@K| / |exact@K|, averaged
    * and min'd over the batch's capped probe sample. Rounds to 6
    * (ratios of small integer counts — far above ULP noise). */
  def recallRow(probeVecs: DataFrame, storeName: String): DataFrame = {
    val spark = probeVecs.sparkSession
    val prefix = VectorStore.servingPrefix(spark, storeName)
    VectorStore.recoverPartitionedStaging(spark, s"${prefix}_raw")
    require(spark.catalog.tableExists(s"${prefix}_raw"),
      s"store '$storeName' has no raw-vector table (built before the " +
        "refine surface): recall needs full-precision ground truth — " +
        "rebuild the store")
    val p = probeVecs
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .orderBy("probe_id").limit(ProbeCap)
    val approx = VectorStore.serveTopK(p, storeName, k = K)
      .select("probe_id", "neighbor_id")
    // ground truth: exact cosine against the FULL raw artifact (all
    // cells — the truth must not inherit the pruning it measures)
    val raw = VectorStore.purgedRaw(spark, prefix)
    val scored = raw.join(broadcast(p), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("pe"), col("vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val exact = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select("probe_id", "neighbor_id")
    val nx = exact.groupBy("probe_id").agg(count(lit(1)).as("n"))
    val hits = exact.join(approx, Seq("probe_id", "neighbor_id"))
      .groupBy("probe_id").agg(count(lit(1)).as("hits"))
    val perProbe = p.select("probe_id")
      .join(nx, Seq("probe_id"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n").cast("double")).as("recall"))
    perProbe.agg(
        count(lit(1)).as("n_probes"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(avg(col("recall")), lit(0.0)), 6).as("mean_recall"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(min(col("recall")), lit(0.0)), 6).as("min_recall"))
      .withColumn("alarm",
        col("n_probes") > 0 && col("mean_recall") < AlarmFloor)
      .select("n_probes", "mean_recall", "min_recall", "alarm")
  }

  /** Committed recall rows only (empty when nothing has committed). */
  def recalls(spark: SparkSession, ledgerTable: String,
              markerTable: String): DataFrame = {
    Freshness.refresh(spark, ledgerTable, markerTable)
    if (!spark.catalog.tableExists(ledgerTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0)
        .select(col("id").as("batch_id"), lit(0L).as("n_probes"),
          lit(0.0).as("mean_recall"), lit(0.0).as("min_recall"),
          lit(false).as("alarm"))
    spark.table(ledgerTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
