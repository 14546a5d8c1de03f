package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the chunk-level boilerplate detectors (dd09
  * fixed-offset chunks / dd22 content-defined chunks — the batch
  * reports `Dedup.chunkReportOf` / `Dedup.cdcReportOf`): a crawl
  * ingests documents continuously, and re-chunking 100 TB per refresh
  * is exactly what an incremental ledger avoids. Each micro-batch
  * chunks ONLY its own documents (the same chunking its batch report
  * uses, so the two stay spec-equal by construction) and writes
  * per-chunk `(ch, nd)` distinct-doc-count increments into the
  * ledger's `batch_id=N` partition; global chunk frequency is the sum
  * per digest. Correct because doc ids are unique across batches (the
  * IndexMaintenance append contract), so per-batch distinct counts add
  * up to the corpus-wide distinct count.
  *
  * The two chunking schemes share this one ledger machinery but must
  * NEVER share a ledger: a fixed-offset digest and a CDC digest of the
  * same text differ, so a mixed table undercounts both schemes
  * silently. The commit marker therefore records the scheme and
  * appends REFUSE a ledger whose markers carry the other one (the
  * TokenizerStore mixed-vocab precedent).
  *
  * Scale shape: the shuffle key is the chunk md5 (32 fixed chars, high
  * uniform cardinality — no salting needed) and the ledger grows by
  * one row per distinct chunk per batch. Serving joins a corpus's
  * chunks against the aggregated ledger — at serve time nothing
  * re-reads past batches' raw text.
  *
  * Delivery: the SubstringDedup protocol — increments land in the
  * batch's own partition via dynamic partition overwrite, the
  * `(batch_id, n_docs, scheme)` marker row is written AFTER them, and
  * a replayed batch whose marker exists is skipped. A replay landing
  * in the crash window (increments visible — possibly PARTIALLY —
  * marker missing) overwrites its partition with the full
  * deterministic row-set, so neither double-counting nor
  * adopt-a-partial-batch undercounting is reachable.
  */
object ChunkDedup {

  /** A chunking scheme: how a `(doc_id, tk)` frame becomes `(doc_id,
    * ch)` digest rows, and the per-doc chunk count the serve report
    * denominates by. Sealed — the ledger marker records `name` and
    * appends refuse a scheme mismatch. */
  private[streaming] sealed abstract class Chunking(val name: String) {
    def digestsOf(tk: DataFrame): DataFrame
    def nChunksCol: Column
  }
  private[streaming] object Fixed extends Chunking("fixed") {
    def digestsOf(tk: DataFrame) = graft.queries.Dedup.chunkDigestsOf(tk)
    def nChunksCol =
      (size(col("tk")) / lit(graft.queries.Dedup.ChunkTokens)).cast("int")
  }
  private[streaming] object Cdc extends Chunking("cdc") {
    def digestsOf(tk: DataFrame) = graft.queries.Dedup.cdcChunkDigestsOf(tk)
    def nChunksCol = graft.queries.Dedup.cdcChunkCountCol
  }

  /** Starts the fixed-chunk ledger-maintenance query: each micro-batch
    * of `newDocs` (`doc_id`, `text`) is handed to [[appendBatch]].
    *
    * `checkpointDir` is REQUIRED and must be durable: the commit-marker
    * replay-skip keys on `batchId`, and batch ids are only stable
    * across restarts when the query resumes from the same checkpoint.
    * With a temp checkpoint a restarted query re-counts from 0 and
    * appendBatch would silently SKIP new data whose id collides with
    * an old marker. */
  def maintain(newDocs: DataFrame, chunkTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery =
    maintainWith(Fixed, newDocs, chunkTable, markerTable, checkpointDir,
      erasureLedger)

  /** [[maintain]] over content-defined chunks (dd22's scheme). */
  def maintainCdc(newDocs: DataFrame, chunkTable: String,
                  markerTable: String, checkpointDir: String,
                  erasureLedger: Option[String] = None): StreamingQuery =
    maintainWith(Cdc, newDocs, chunkTable, markerTable, checkpointDir,
      erasureLedger)

  private def maintainWith(scheme: Chunking, newDocs: DataFrame,
      chunkTable: String, markerTable: String, checkpointDir: String,
      erasureLedger: Option[String] = None): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchWith(scheme,
          graft.index.Erasure.gateBatch(batch, erasureLedger),
          batchId, chunkTable, markerTable)
      }
      .start()

  /** One fixed-chunk micro-batch: chunk the batch's docs, overwrite the
    * `batch_id=N` ledger partition with the `(ch, nd)` increments, then
    * the commit marker. Replay-safe via the marker + partition
    * overwrite. */
  def appendBatch(batch: DataFrame, batchId: Long,
                  chunkTable: String, markerTable: String): Unit =
    appendBatchWith(Fixed, batch, batchId, chunkTable, markerTable)

  /** [[appendBatch]] over content-defined chunks (dd22's scheme). */
  def appendBatchCdc(batch: DataFrame, batchId: Long,
                     chunkTable: String, markerTable: String): Unit =
    appendBatchWith(Cdc, batch, batchId, chunkTable, markerTable)

  private def appendBatchWith(scheme: Chunking, batch: DataFrame,
      batchId: Long, chunkTable: String, markerTable: String): Unit = {
    val spark = batch.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    assertScheme(spark, markerTable, scheme)
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (!committed) {
      // partition column last: matches the saveAsTable layout so the
      // insertInto below resolves positionally
      val increments = scheme.digestsOf(
          batch.select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("tk")))
        .groupBy("ch")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .select(col("ch"), col("nd"), lit(batchId).as("batch_id"))
      if (!spark.catalog.tableExists(chunkTable))
        increments.write.partitionBy("batch_id").saveAsTable(chunkTable)
      else {
        // refuse a pre-partitioned-layout (or foreign) ledger: the
        // positional insertInto would silently mis-map it, and STATIC
        // overwrite on an unpartitioned table truncates every
        // committed batch while the markers still claim them
        val partCols = spark.catalog.listColumns(chunkTable).collect()
          .filter(_.isPartition).map(_.name).toSeq
        require(partCols == Seq("batch_id"),
          s"ledger $chunkTable has partition columns " +
            partCols.mkString("[", ",", "]") + ", expected [batch_id]: " +
            "migrate the pre-partitioned-layout ledger (rewrite as " +
            "SELECT ch, nd, batch_id ... partitionBy(batch_id)) or start " +
            "a fresh ledger and replay from the checkpoint.")
        // session conf, not a write option: insertInto on a catalog
        // table ignores per-write options, and STATIC overwrite would
        // truncate every other batch's partition
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "dynamic")
        try increments.write.mode("overwrite").insertInto(chunkTable)
        finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
      batch.groupBy()
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("scheme", lit(scheme.name))
        .select("batch_id", "n_docs", "scheme")
        .write.mode("append").saveAsTable(markerTable)
    }
  }

  /** Scheme guard: a ledger whose committed markers carry the OTHER
    * chunking scheme (or a pre-scheme marker layout) must refuse the
    * append — mixed-scheme digests undercount both reports silently. */
  private def assertScheme(spark: SparkSession, markerTable: String,
                           scheme: Chunking): Unit = {
    if (spark.catalog.tableExists(markerTable)) {
      val cols = spark.table(markerTable).columns
      require(cols.contains("scheme"),
        s"marker table $markerTable predates the scheme column — " +
          "migrate it (add scheme = 'fixed') or start a fresh ledger.")
      val other = spark.table(markerTable)
        .filter(col("scheme") =!= scheme.name).limit(1).collect()
      require(other.isEmpty,
        s"ledger markers in $markerTable carry scheme " +
          s"'${other.head.getAs[String]("scheme")}' but this append " +
          s"chunks with '${scheme.name}' — one ledger serves one scheme.")
    }
  }

  /** Right-to-erasure seam: FORGET the chunk digests of `victimDocs`
    * (`doc_id`, `text` — the erased documents, with their text still
    * at hand: run this BEFORE deleting the source rows) from the
    * ledger. The ledger's rows are aggregated `(ch, nd)` counts with
    * no per-doc attribution, so the only faithful erasure is dropping
    * the digest rows outright — a shared boilerplate chunk loses its
    * frequency history and RE-LEARNS on its next occurrence (counts
    * restart at the next batch that carries it), which errs toward
    * privacy by construction. The scheme is read from the marker
    * table so victims chunk exactly the way the ledger was built.
    * Affected `batch_id` partitions are rewritten via
    * `Erasure.purgeRows` — O(victim batches), never O(ledger). */
  def purgeDigests(spark: SparkSession, victimDocs: DataFrame,
                   chunkTable: String, markerTable: String): Unit = {
    if (!spark.catalog.tableExists(chunkTable)) return
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val scheme =
      if (spark.catalog.tableExists(markerTable) &&
          spark.table(markerTable).columns.contains("scheme") &&
          !spark.table(markerTable)
            .filter(col("scheme") === Cdc.name).isEmpty) Cdc
      else Fixed
    val digests = scheme.digestsOf(
        victimDocs.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("tk")))
      .select("ch").distinct()
    graft.index.Erasure.purgeRows(spark, digests, chunkTable, Seq("ch"))
  }

  /** Corpus-wide chunk frequency from the ledger: sum of the per-batch
    * distinct-doc increments per digest. Empty-but-typed when no batch
    * has committed yet. */
  def chunkFrequency(spark: SparkSession, chunkTable: String): DataFrame =
    { Freshness.refresh(spark, chunkTable)
    if (!spark.catalog.tableExists(chunkTable))
      spark.range(0).select(lit("").as("ch"), lit(0L).as("nd")).limit(0)
    else spark.table(chunkTable).groupBy("ch").agg(sum("nd").as("nd"))
    }

  /** Serve-time report for `documents` (`doc_id`, `text`) against the
    * MAINTAINED fixed-chunk ledger — same schema as the batch report
    * (`doc_id`, `n_chunks`, `n_shared`, `shared_frac`). When the
    * ledger was fed exactly this corpus, the output equals
    * `Dedup.chunkReportOf(documents)` (spec-pinned). */
  def sharedChunkReport(documents: DataFrame, chunkTable: String): DataFrame =
    reportWith(Fixed, documents, chunkTable)

  /** [[sharedChunkReport]] over content-defined chunks — equals
    * `Dedup.cdcReportOf(documents)` when the ledger was fed exactly
    * this corpus (spec-pinned). */
  def sharedCdcReport(documents: DataFrame, chunkTable: String): DataFrame =
    reportWith(Cdc, documents, chunkTable)

  private def reportWith(scheme: Chunking, documents: DataFrame,
                         chunkTable: String): DataFrame = {
    val spark = documents.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val tk = documents.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("tk"))
    val perDoc = scheme.digestsOf(tk)
      .join(chunkFrequency(spark, chunkTable), "ch")
      .groupBy("doc_id")
      .agg(sum(when(col("nd") >= 2, 1).otherwise(0)).cast("int").as("n_shared"))
    tk.select(col("doc_id"), scheme.nChunksCol.as("n_chunks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_shared"), lit(0)).as("n_shared"),
        graft.functions.ParityFunctions.duckRound(
          coalesce(col("n_shared"), lit(0)).cast("double") /
            greatest(col("n_chunks"), lit(1)).cast("double"), 6)
          .as("shared_frac"))
      .orderBy("doc_id")
  }
}
