package graft.index

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Build-once/serve-many surface for the inverted index — the
  * reference's whole contract: materialize the index as an artifact
  * once (`/root/reference/output/part-r-00000` is that artifact), then
  * answer many queries from it without touching the raw corpus again
  * (reference README.md "查询" usage).
  *
  * Two saved tables per corpus:
  *   - `graft_termdoc_<tag>`: POSITIONAL postings
  *     `(doc_id, token, cnt, positions)` BUCKETED AND SORTED BY `token`
  *     — per-term lookups prune to the right buckets, per-token
  *     aggregations and self-joins satisfy their hash-distribution
  *     requirement straight off the scan (zero exchange, the
  *     BucketingSpec machinery), and stored positions let phrase
  *     queries resolve adjacency without re-reading any document text.
  *   - `graft_docstats_<tag>`: one-row corpus stats (n_docs) so ranked
  *     retrieval's IDF term needs no corpus scan either.
  *
  * At 100 TB this is the difference between re-tokenizing the corpus
  * per query and reading a few sorted buckets.
  */
object IndexStore {

  /** Default bucket count: sized for test SFs; a 100 TB deployment
    * picks buckets so each bucket file lands in the 128–512 MB range
    * (SURVEY §6b — hundreds of buckets). The count used at BUILD time
    * is recorded in the stats side table and every later entry point
    * checks against it: bucketing is a physical co-partitioning
    * contract, and a consumer assuming a different count would
    * silently lose the zero-exchange property (or corrupt appends). */
  val DefaultBuckets = 8

  // one build per (JVM, sfDir): repeated queries in the same session
  // (Verify runs tx18 then tx19) reuse the artifact
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Collision-resistant per-corpus table tag: a 32-bit `hashCode`
    * would let two distinct corpus dirs silently share one table. */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Replace table `name` with `df`. Each JVM gets a fresh derby
    * metastore but SHARES the warehouse dir: a previous run may have
    * left the managed location behind with no catalog entry, which
    * CTAS refuses to reuse — drop both the entry and the location. */
  private def replaceTable(s: SparkSession, name: String,
                           write: DataFrameWriter[Row]): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    write.saveAsTable(name)
  }

  /** Name of the saved positional-postings table for `dir`, building
    * it (and the stats side table, which records the bucket count) on
    * first use in this JVM. A call whose `buckets` disagrees with the
    * count the artifact was BUILT with fails loudly — never serve a
    * table under a co-partitioning assumption it doesn't satisfy. */
  def termDocTable(s: SparkSession, dir: String,
                   buckets: Int = DefaultBuckets): String = {
    import org.apache.spark.sql.functions._
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val name = s"graft_termdoc_${tag(dir)}"
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      // every build honors past erasures: the per-dir erasure ledger
      // filters the corpus BEFORE tokenization, so a fresh JVM's
      // rebuild can never resurrect an erased document's tokens, and
      // the stats row counts the live corpus by construction
      val docs = withoutErased(s, dir,
        graft.tables.load(s, dir, "documents"))
      replaceTable(s, name,
        graft.queries.Text.termDocPositionalOf(docs)
          .write.mode("overwrite")
          .bucketBy(buckets, "token").sortBy("token"))
      // erased_n records the erasure-ledger size this artifact was
      // built against: eraseDocs compares it to the current ledger to
      // detect an artifact that predates a recorded erasure (the
      // crash-between-record-and-drop window) and re-drop it
      replaceTable(s, s"graft_docstats_${tag(dir)}",
        docs.agg(count(lit(1)).as("n_docs"))
          .withColumn("buckets", lit(buckets))
          .withColumn("erased_n", lit(erasedCount(s, dir)))
          .write.mode("overwrite"))
    })
    val rec = recordedBuckets(s, dir)
    require(rec == buckets,
      s"index artifact for $dir was built with $rec buckets but this " +
        s"consumer assumes $buckets: the bucket count is a physical " +
        "co-partitioning contract — read the recorded count via " +
        "recordedBuckets, or rebuild the artifact at the new count.")
    name
  }

  /** The bucket count the artifact for `dir` was built with — what a
    * consumer (a maintainer append, a co-located join planner) reads
    * instead of assuming a constant. */
  def recordedBuckets(s: SparkSession, dir: String): Int =
    s.table(s"graft_docstats_${tag(dir)}").select("buckets").head.getInt(0)

  /** The saved positional postings as a DataFrame (building if needed). */
  def termDoc(s: SparkSession, dir: String,
              buckets: Int = DefaultBuckets): DataFrame =
    s.table(termDocTable(s, dir, buckets))

  /** The saved one-row corpus stats (n_docs) — building if needed.
    * Projected to n_docs: the recorded bucket count is artifact
    * metadata, not query data (consumers crossJoin this frame). */
  def docStats(s: SparkSession, dir: String): DataFrame = {
    termDocTable(s, dir)
    s.table(s"graft_docstats_${tag(dir)}").select("n_docs")
  }

  // ---- Right-to-erasure ----------------------------------------------

  /** Per-dir erasure ledger: the DURABLE fact the artifact derives
    * from. The table outlives both the artifact (rebuilds re-apply it)
    * and the JVM (the in-memory `built` map does not), so an erased
    * doc can never resurface through the build-once-per-JVM path. */
  private[graft] def erasedTable(dir: String): String =
    s"graft_termdoc_${tag(dir)}_erased"

  private def withoutErased(s: SparkSession, dir: String,
                            docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    if (!s.catalog.tableExists(erasedTable(dir))) docs
    else docs.join(
      broadcast(s.table(erasedTable(dir)).select("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  private def erasedCount(s: SparkSession, dir: String): Long =
    if (!s.catalog.tableExists(erasedTable(dir))) 0L
    else s.table(erasedTable(dir)).count()

  /** Erase `docIds` from the build-once index artifact for `dir`:
    * record them in the per-dir erasure ledger (append, dedup'd —
    * replays no-op), then drop the artifact so the next consumer
    * rebuilds it from the FILTERED corpus. The rebuild is O(corpus) —
    * batch erasure requests to the operational cadence; serving
    * between the drop and the next use simply rebuilds on demand (the
    * artifact's whole contract is build-on-first-use). This is the
    * honest shape for a build-once artifact: a serve-side tombstone
    * would have to survive rebuilds anyway, and the ledger IS that
    * surviving fact. Idempotent AND crash-healing: a replay with no
    * new ids drops the artifact only when its recorded `erased_n`
    * trails the ledger (the crash-between-record-and-drop window) —
    * an artifact already built against the full ledger is left
    * serving. */
  def eraseDocs(s: SparkSession, dir: String, docIds: Seq[Long]): Unit = {
    import s.implicits._
    if (docIds.isEmpty) return
    val led = erasedTable(dir)
    val requested = docIds.distinct.toDF("doc_id")
    val fresh =
      if (s.catalog.tableExists(led))
        requested.join(s.table(led), Seq("doc_id"), "left_anti")
      else requested
    val newIds = !fresh.isEmpty
    if (newIds) {
      VectorStore.clearOrphanLocation(s, led)
      fresh.write.mode("append").saveAsTable(led)
    }
    val statsT = s"graft_docstats_${tag(dir)}"
    val stale = s.catalog.tableExists(statsT) && {
      val cols = s.table(statsT).columns
      val builtAgainst =
        if (cols.contains("erased_n"))
          s.table(statsT).select("erased_n").head.getLong(0)
        else 0L // pre-erasure artifact: built against an empty ledger
      builtAgainst < erasedCount(s, dir)
    }
    if (newIds || stale) {
      // drop the artifact (tables + this JVM's build memo) so the next
      // termDoc/docStats call rebuilds without the victims
      s.sql(s"DROP TABLE IF EXISTS graft_termdoc_${tag(dir)}")
      s.sql(s"DROP TABLE IF EXISTS $statsT")
      built.remove(
        s.sparkContext.applicationId + s"/graft_termdoc_${tag(dir)}")
    }
  }
}
