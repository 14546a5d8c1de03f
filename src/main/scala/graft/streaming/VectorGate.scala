package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.VectorStore

/** Streaming embedding-integrity GATE (sm15's serving twin — the 17th
  * maintainer, and the first one that QUARANTINES instead of only
  * reporting): `VectorMaintenance` ingests whatever arrives, and the
  * sm15 audit explains why that is dangerous — a NaN/Inf element
  * poisons every cosine its code touches, a zero vector cosines 0
  * against everything, a wrong-dimension vector breaks the quantize
  * fold, a NULL breaks assignment. Once such a vector is quantized
  * into the cid-partitioned code table the damage is baked into the
  * serving artifact until a compaction rewrite. This gate classifies
  * every arriving vector AT THE DOOR against the store's own recorded
  * dimensionality, appends only clean rows to the code table (the
  * unchanged `VectorStore.append` path), diverts defective rows to a
  * quarantine ledger for operator review, and emits one per-batch
  * audit row — sm15's counters, kept current as the stream runs.
  *
  * Defect classes and precedence (first match wins): `null_vec`
  * (embedding IS NULL), `bad_dim` (length ≠ the store codebook's
  * dimension — recorded, not configured: `len(mns)` of the SQ stats
  * row), `nonfinite` (any NaN/±Inf element), `zero_norm` (all
  * elements exactly 0). A wrong-dimension vector full of NaNs is
  * `bad_dim`: dimension is checked before element values because the
  * element predicates only mean anything at the right arity.
  *
  * Delivery: the quarantine write is MULTI-row → the SubstringDedup
  * partition-overwrite protocol (ledger partitioned by batch_id; a
  * replay landing in the crash window REWRITES its partition rather
  * than adopting possibly-partial rows). The 1-row audit report uses
  * orphan ADOPTION (the DriftMonitor device). Marker last;
  * committed-only serve. The codes append itself keeps
  * `VectorMaintenance`'s documented crash window (crash between
  * append and marker duplicates codes on replay — a transactional
  * table format closes it at that same seam). Requires a DURABLE
  * `checkpointDir` (stable batch ids — the IndexMaintenance
  * contract).
  */
object VectorGate {

  /** Starts the gate: each micro-batch of `newVecs` (`vec_id`,
    * `embedding`) is classified and routed by [[gateBatch]]. */
  def maintain(newVecs: DataFrame, storeName: String,
               quarantineTable: String, reportTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "VectorGate.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            Seq("vec_id")),
          batchId, storeName, quarantineTable, reportTable, markerTable)
      }
      .start()
  }

  /** The store's recorded embedding dimension — the arity every
    * arriving vector is checked against. Read from the SQ stats row
    * (its per-dim min/max arrays are exactly codebook-sized), so the
    * gate can never drift from what the codebook was trained on. */
  private def storedDim(spark: SparkSession, storeName: String): Int =
    spark.table(s"${VectorStore.servingPrefix(spark, storeName)}_stats")
      .select(size(col("mns"))).head.getInt(0)

  /** One micro-batch: classify → quarantine partition (dynamic
    * overwrite) → clean-row codes append → 1-row report (adopted if
    * orphaned) → commit marker. Replay-safe via the marker. */
  def gateBatch(batch: DataFrame, batchId: Long, storeName: String,
                quarantineTable: String, reportTable: String,
                markerTable: String): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return

    val dim = storedDim(spark, storeName)
    val nonfinite: Column = exists(col("embedding"),
      x => isnan(x) || abs(x) === lit(Double.PositiveInfinity))
    val zeroNorm: Column = forall(col("embedding"), _ === lit(0.0))
    val classified = batch
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
      .withColumn("defect",
        when(col("embedding").isNull, lit("null_vec"))
          .when(size(col("embedding")) =!= dim, lit("bad_dim"))
          .when(nonfinite, lit("nonfinite"))
          .when(zeroNorm, lit("zero_norm")))
      .persist()
    try {
      val byDefect = classified.groupBy("defect")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => Option(r.getString(0)).getOrElse("ok") -> r.getLong(1))
        .toMap.withDefaultValue(0L)

      // quarantine FIRST (replay-overwritable), codes append after —
      // the narrower the append→marker window, the better
      val quarantine = classified.filter(col("defect").isNotNull)
        .select(col("vec_id"), col("embedding"), col("defect"),
          lit(batchId).as("batch_id")) // partition column last
      // shared-warehouse orphan-location guard (the VectorMaintenance/
      // RecallMonitor convention): a leftover managed directory from a
      // previous JVM must not wedge the first-batch creates below
      VectorStore.clearOrphanLocation(spark, quarantineTable)
      if (!spark.catalog.tableExists(quarantineTable))
        quarantine.write.partitionBy("batch_id").saveAsTable(quarantineTable)
      else {
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try quarantine.write.mode("overwrite").insertInto(quarantineTable)
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }

      if (byDefect("ok") > 0L)
        VectorStore.append(classified.filter(col("defect").isNull)
          .select(col("vec_id"), col("embedding")), storeName)

      val orphaned = spark.catalog.tableExists(reportTable) &&
        !spark.table(reportTable).filter(col("batch_id") === batchId).isEmpty
      if (!orphaned) {
        import spark.implicits._
        VectorStore.clearOrphanLocation(spark, reportTable)
        Seq((batchId, byDefect.values.sum, byDefect("ok"),
            byDefect("null_vec"), byDefect("bad_dim"),
            byDefect("nonfinite"), byDefect("zero_norm")))
          .toDF("batch_id", "n_in", "n_ok", "n_null", "n_bad_dim",
            "n_nonfinite", "n_zero_norm")
          .write.mode("append").saveAsTable(reportTable)
      }

      VectorStore.clearOrphanLocation(spark, markerTable)
      classified.groupBy().agg(count(lit(1)).as("n_in"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_in")
        .write.mode("append").saveAsTable(markerTable)
    } finally classified.unpersist()
  }

  /** Committed audit rows only (empty-but-typed before any commit). */
  def gateReports(spark: SparkSession, reportTable: String,
                  markerTable: String): DataFrame = {
    Freshness.refresh(spark, reportTable, markerTable)
    if (!spark.catalog.tableExists(reportTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("batch_id"),
        lit(0L).as("n_in"), lit(0L).as("n_ok"), lit(0L).as("n_null"),
        lit(0L).as("n_bad_dim"), lit(0L).as("n_nonfinite"),
        lit(0L).as("n_zero_norm"))
    spark.table(reportTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }

  /** Committed quarantined vectors only — the operator review queue. */
  def quarantined(spark: SparkSession, quarantineTable: String,
                  markerTable: String): DataFrame = {
    Freshness.refresh(spark, quarantineTable, markerTable)
    if (!spark.catalog.tableExists(quarantineTable) ||
        !spark.catalog.tableExists(markerTable))
      return spark.range(0).select(col("id").as("vec_id"),
        lit(null).cast("array<double>").as("embedding"),
        lit("").as("defect"), col("id").as("batch_id"))
    spark.table(quarantineTable)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
  }
}
