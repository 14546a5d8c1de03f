package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.queries.Dedup

/** Build-once/serve-many artifact for NEAR-DUP detection — the dedup
  * analog of `IndexStore`: a crawl ingests batches continuously, and
  * re-shingling 100 TB of already-ingested corpus to near-dup-check
  * each new batch is exactly what this artifact avoids. Three saved
  * tables per store:
  *
  *   - `<name>_shingles` (doc_id, shingle): the exact-verify side.
  *   - `<name>_sigs`     (doc_id, sz): shingle-set sizes for Jaccard.
  *   - `<name>_bands`    (doc_id, band, key): the LSH candidate join
  *     key space, bucketed by `key` so the incremental candidate join
  *     probes, not scans.
  *
  * All three derive from the SAME shingling/signature code dd03 runs
  * (`Dedup.shingleSetOf`/`signaturesOf`/`bandKeysOf`), so incremental
  * results are spec-equal to running the batch operator on the union
  * corpus — the same batch-vs-incremental contract as the index
  * maintenance and chunk-ledger twins.
  *
  * Scale shape of [[incrementalPairs]]: the new batch is shingled and
  * signed once (it is small); candidates come from ONE equi-join of
  * the batch's band keys against the stored band table plus the
  * batch-internal banding; the exact-Jaccard verify joins shingles
  * only for candidate docs. Nothing ever re-reads the stored corpus'
  * raw text. Caller contract: doc ids are unique across the store and
  * every appended batch (the IndexMaintenance contract).
  */
object DedupStore {

  /** Build the artifact from a `(doc_id, text)` corpus frame. */
  def build(documents: DataFrame, name: String): Unit = {
    val spark = documents.sparkSession
    val sh = Dedup.shingleSetOf(documents).persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = Dedup.signaturesOf(sh).persist(StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("overwrite")
      .bucketBy(8, "doc_id").saveAsTable(s"${name}_shingles")
    sigs.select(col("doc_id"), col("sz")).write.mode("overwrite")
      .bucketBy(8, "doc_id").saveAsTable(s"${name}_sigs")
    Dedup.bandKeysOf(sigs).write.mode("overwrite")
      .bucketBy(8, "key").saveAsTable(s"${name}_bands")
    sh.unpersist(); sigs.unpersist()
    spark.catalog.refreshTable(s"${name}_bands")
  }

  /** Near-dup pairs between `newDocs` and the stored corpus PLUS pairs
    * within `newDocs`, with exact Jaccard ≥ `tau` — what the batch
    * operator (dd03) would report for pairs touching the new docs if
    * run over the union corpus, without re-shingling the store.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard
    * UNROUNDED (callers round for display/oracles). */
  def incrementalPairs(newDocs: DataFrame, name: String,
                       tau: Double = 0.4): DataFrame = {
    val spark = newDocs.sparkSession
    val shNew = Dedup.shingleSetOf(newDocs).persist(StorageLevel.MEMORY_AND_DISK)
    val sigsNew = Dedup.signaturesOf(shNew).persist(StorageLevel.MEMORY_AND_DISK)
    val bandsNew = Dedup.bandKeysOf(sigsNew)
    // new-vs-store: equi-join on (band, key); the new side is the
    // small probe, the stored side the bucketed build
    val candOld = bandsNew.as("n")
      .join(spark.table(s"${name}_bands").as("o"),
        col("n.band") === col("o.band") && col("n.key") === col("o.key"))
      .select(least(col("n.doc_id"), col("o.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    // new-vs-new: the batch-internal banding — same Dedup.bandDefs
    // layout as the stored band table, by construction
    val candNew = graft.operators.Banding.candidatePairs(sigsNew, "doc_id",
        Dedup.bandDefs)
      .withColumnRenamed("doc_id_a", "doc_a")
      .withColumnRenamed("doc_id_b", "doc_b")
    val cand = candOld.union(candNew).distinct()
    // exact verify over shingles of CANDIDATE docs only
    val shAll = shNew.unionByName(spark.table(s"${name}_shingles"))
    val inter = cand
      .join(shAll.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(shAll.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val szAll = sigsNew.select(col("doc_id"), col("sz"))
      .unionByName(spark.table(s"${name}_sigs"))
    val out = inter
      .join(szAll.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(szAll.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      // materialize BEFORE unpersisting the batch-scale caches: in the
      // intended serve-many loop (one call per ingested crawl batch)
      // leaving shNew/sigsNew cached would accumulate blocks across
      // calls unboundedly. localCheckpoint truncates the lineage, so
      // the result (pair-scale, small) survives the unpersist and its
      // blocks are released by the ContextCleaner when the frame is
      // dropped.
      .localCheckpoint(true)
    shNew.unpersist()
    sigsNew.unpersist()
    out
  }

  /** BIPARTITE near-dup pairs of `corpus` docs against the STORED
    * side — `Dedup.bipartitePairs(corpus, probe, tau)` with the probe
    * side served from an artifact built over `probe`, equal by
    * construction (all three tables persist the same
    * shingleSetOf/signaturesOf/bandKeysOf frames the fresh path
    * derives). This is the decontamination serve path (round-17
    * verdict #3): the eval benchmark is FIXED per release, so its
    * shingling/signing/banding is build-once work — pl14/pl16/pl47
    * re-derived it on every run, and at 100× that derivation dominated
    * pl47's cost. Scale shape: the stored band table is eval-sized
    * (tiny vs the corpus) and BROADCAST, candidate generation stays a
    * map-side join against corpus bands, the exact verify joins stored
    * shingles only for candidate pairs — the corpus is never
    * self-joined, and the eval side is never re-read as text.
    * Output: (doc_id, probe_doc_id, jaccard), jaccard UNROUNDED.
    *
    * `eager = true` is the serve-many loop mode (the
    * [[incrementalPairs]] lifecycle): the result is localCheckpointed
    * and the corpus-side caches released before returning, so a
    * caller invoking this once per ingested micro-batch (the fate
    * maintainer) does not accumulate cached blocks across calls. The
    * default lazy mode keeps the Q.scala contract — callers clear the
    * cache between invocations. */
  def bipartitePairsFromStore(corpus: DataFrame, name: String,
                              tau: Double = 0.4,
                              eager: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    val shC = Dedup.shingleSetOf(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val sigsC = Dedup.signaturesOf(shC).persist(StorageLevel.MEMORY_AND_DISK)
    val cand = Dedup.bandKeysOf(sigsC)
      .join(broadcast(spark.table(s"${name}_bands")
          .withColumnRenamed("doc_id", "probe_doc_id")),
        Seq("band", "key"))
      .select(col("doc_id"), col("probe_doc_id"))
      .distinct()
    val inter = cand
      .join(shC, Seq("doc_id"))
      .join(spark.table(s"${name}_shingles")
          .select(col("doc_id").as("probe_doc_id"), col("shingle")),
        Seq("probe_doc_id", "shingle"))
      .groupBy("doc_id", "probe_doc_id").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sigsC.select(col("doc_id"), col("sz").as("sza")), Seq("doc_id"))
      .join(spark.table(s"${name}_sigs")
          .select(col("doc_id").as("probe_doc_id"), col("sz").as("szb")),
        Seq("probe_doc_id"))
      .select(col("doc_id"), col("probe_doc_id"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
    if (!eager) out
    else {
      val pinned = out.localCheckpoint(true)
      shC.unpersist(); sigsC.unpersist()
      pinned
    }
  }

  /** Right-to-erasure seam: physically rewrite all three tables
    * WITHOUT `victims`' rows (a single-column doc_id frame, request-
    * sized — it broadcasts). The shingle table is the one that
    * matters: shingles are RAW TEXT n-grams of the document, so a
    * tombstone that leaves them on disk would fail erasure's purpose.
    * Each rewrite keeps its bucket spec through a staged copy; a crash
    * mid-swap is adopted back from staging on the next call (tables
    * are rewritten independently — a half-erased store still serves
    * correct pairs for the surviving docs, and the replayed erase
    * finishes the rest). Idempotent; single-writer maintenance window
    * (the compaction contract). */
  def eraseDocs(spark: SparkSession, victims: DataFrame,
                name: String): Unit = {
    val v = broadcast(victims.toDF("erased_key"))
    Seq("shingles" -> "doc_id", "sigs" -> "doc_id", "bands" -> "key")
      .foreach { case (suffix, bucketCol) =>
        val table = s"${name}_$suffix"
        val staging = table + "_erasure_staging"
        // adopt a crashed prior erase before anything reads the table
        if (!spark.catalog.tableExists(table) &&
            spark.catalog.tableExists(staging))
          spark.sql(s"ALTER TABLE $staging RENAME TO $table")
        if (spark.catalog.tableExists(table)) {
          val t = spark.table(table)
          if (!t.join(v, t("doc_id") === v("erased_key"), "left_semi")
              .isEmpty) {
            spark.sql(s"DROP TABLE IF EXISTS $staging")
            t.join(v, t("doc_id") === v("erased_key"), "left_anti")
              .write.mode("overwrite")
              .bucketBy(8, bucketCol).saveAsTable(staging)
            spark.sql(s"DROP TABLE IF EXISTS $table")
            spark.sql(s"ALTER TABLE $staging RENAME TO $table")
            spark.catalog.refreshTable(table)
          }
        }
      }
  }

  /** Ingest `newDocs` into the artifact (after [[incrementalPairs]]
    * reviewed them): appends to all three tables with the same
    * bucketing. Idempotence is the caller's via unique doc ids. */
  def append(newDocs: DataFrame, name: String): Unit = {
    val sh = Dedup.shingleSetOf(newDocs).persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = Dedup.signaturesOf(sh).persist(StorageLevel.MEMORY_AND_DISK)
    sh.write.mode("append")
      .bucketBy(8, "doc_id").saveAsTable(s"${name}_shingles")
    sigs.select(col("doc_id"), col("sz")).write.mode("append")
      .bucketBy(8, "doc_id").saveAsTable(s"${name}_sigs")
    Dedup.bandKeysOf(sigs).write.mode("append")
      .bucketBy(8, "key").saveAsTable(s"${name}_bands")
    sh.unpersist(); sigs.unpersist()
  }
}
