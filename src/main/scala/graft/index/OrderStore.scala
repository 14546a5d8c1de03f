package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many TRAINING-ORDER artifact — the data-layout
  * twin of `IndexStore` (postings), `VectorStore` (ANN codes),
  * `QualityStore` (classifier) and `TokenizerStore` (vocabulary):
  * pl33's packed order (which 2048-token training sequence each doc
  * starts in, at what offset, in pl28's deterministic shard order) is
  * computed once and frozen as a shard-partitioned table, next to the
  * pl31 per-shard manifest (doc/char counts + the order-sensitive
  * position-weighted checksum) snapshotted at build time. A training
  * run then
  *   - reads ONE shard partition-pruned per data-loader worker
  *     ([[serveShard]] — no corpus scan, no re-sort, no window), and
  *   - re-verifies on resume that the corpus it is about to read is
  *     byte-identical IN ORDER to what the order was built from
  *     ([[verify]] — stored manifest vs fresh recomputation; any
  *     dropped, substituted or reordered doc flags its shard).
  *
  * Single source of truth: the stored frames come from
  * `Pipeline.packedOrderOf`/`orderManifestOf` — the exact constructions
  * pl33/pl31's oracle-checked queries run — so serve equals a fresh
  * computation bit for bit (pinned by `OrderStoreSpec`).
  *
  * Versioning: the `TokenizerStore`/`VectorStore` pointer protocol,
  * verbatim rationale. `<name>_version` is a 1-row pointer (absent
  * means v=1, whose tables live under the bare `<name>_order` /
  * `<name>_manifest` names); version k>1 under `<name>_vk_*`. A
  * [[rebuild]] (corpus grew, or a re-shuffle under a new seed constant)
  * writes BOTH next-version tables fully before the one-row pointer
  * flip — order and manifest can never serve from different versions,
  * and a crash anywhere before the flip leaves serving on the old,
  * complete pair.
  */
object OrderStore {

  // one build per (JVM, corpus dir): repeated serve queries in the
  // same session reuse the artifact (the IndexStore device)
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Collision-resistant per-corpus table tag (IndexStore's rationale:
    * 32-bit hashCode would let two dirs silently share one table). */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Corpus-keyed build-if-absent (the IndexStore pattern): the frozen
    * order for `dir`'s documents, built on first use in this JVM.
    * Returns the store name to serve from. */
  /** The store name [[forCorpus]] would use for `dir` — WITHOUT
    * building (erasure wants the name even when nothing was built). */
  def corpusStoreName(dir: String): String = s"graft_order_${tag(dir)}"

  def forCorpus(s: SparkSession, dir: String): String = {
    val name = corpusStoreName(dir)
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      build(withoutErased(s, name, graft.tables.load(s, dir, "documents")),
        name)
    })
    name
  }

  // ---- Right-to-erasure ----------------------------------------------

  /** Per-store erasure ledger — the durable fact every (re)build
    * derives from, so an erased doc cannot resurface through a fresh
    * JVM's build-if-absent or a later rebuild. */
  private[graft] def erasedTable(name: String): String = s"${name}_erased"

  private def withoutErased(s: SparkSession, name: String,
                            docs: DataFrame): DataFrame =
    if (!s.catalog.tableExists(erasedTable(name))) docs
    else docs.join(
      broadcast(s.table(erasedTable(name)).select("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Erase `docIds` from the frozen training order: record them in the
    * store's erasure ledger (append, dedup'd), then — when the SERVING
    * order still carries any victim — re-freeze on the filtered corpus
    * as a new version behind the atomic pointer flip, so order and
    * manifest lose the victims together and a resumed training run
    * re-verifies against the rewritten manifest. An order row is a
    * doc's POSITION in the training corpus; there is no narrower
    * rewrite than re-freezing, because removing a doc shifts every
    * later offset in its shard (pl33's packing is prefix-cumulative).
    * Idempotent: a replay finds no victims in the new version and
    * skips the rebuild. */
  def eraseDocs(d: DataFrame, name: String, docIds: Seq[Long]): Unit = {
    val spark = d.sparkSession
    import spark.implicits._
    if (docIds.isEmpty) return
    val led = erasedTable(name)
    val requested = docIds.distinct.toDF("doc_id")
    val fresh =
      if (spark.catalog.tableExists(led))
        requested.join(spark.table(led), Seq("doc_id"), "left_anti")
      else requested
    if (!fresh.isEmpty) {
      VectorStore.clearOrphanLocation(spark, led)
      fresh.write.mode("append").saveAsTable(led)
    }
    val servingTable =
      s"${prefixOf(name, currentVersion(spark, name))}_order"
    val pending = spark.catalog.tableExists(servingTable) &&
      !spark.table(servingTable).join(
        broadcast(spark.table(led).select("doc_id")),
        Seq("doc_id"), "left_semi").isEmpty
    if (pending) rebuild(withoutErased(spark, name, d), name)
  }

  private def versionTable(name: String) = s"${name}_version"

  /** Current artifact version (1 when the pointer table is absent). */
  def currentVersion(spark: SparkSession, name: String): Long =
    if (!spark.catalog.tableExists(versionTable(name))) 1L
    else spark.table(versionTable(name)).head.getLong(0)

  private def prefixOf(name: String, v: Long): String =
    if (v <= 1L) name else s"${name}_v$v"

  /** IndexStore's replaceTable rationale: each JVM gets a fresh derby
    * metastore but SHARES the warehouse dir — a previous run may have
    * left the managed location behind with no catalog entry, which
    * CTAS refuses to reuse. Drop both the entry and the location. */
  private def replace(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write the packed order (shard_id-partitioned — [[serveShard]]
    * prunes to one partition) and the manifest snapshot at `prefix`. */
  private def buildAt(d: DataFrame, prefix: String): Unit = {
    val spark = d.sparkSession
    replace(spark, s"${prefix}_order")
    graft.queries.Pipeline.packedOrderOf(d)
      .write.partitionBy("shard_id")
      .mode("overwrite").saveAsTable(s"${prefix}_order")
    replace(spark, s"${prefix}_manifest")
    graft.queries.Pipeline.orderManifestOf(d)
      .coalesce(1) // shard-cardinality rows — one file
      .write.mode("overwrite").saveAsTable(s"${prefix}_manifest")
  }

  /** Freeze `d`'s packed order + manifest under `name`, resetting the
    * store to version 1 (the TokenizerStore.build contract: the
    * initial/offline path — overwrites in place; use [[rebuild]] for
    * the crash-isolated path while the store is serving). */
  def build(d: DataFrame, name: String): Unit = {
    buildAt(d, name)
    d.sparkSession.sql(s"DROP TABLE IF EXISTS ${versionTable(name)}")
    dropVersionsExcept(d.sparkSession, name, keep = 1L)
  }

  /** Re-freeze on the current corpus as a NEW VERSION behind the
    * atomic 1-row pointer flip: both next-version tables are complete
    * before the flip, so order and manifest stay version-consistent
    * through any crash, and old-version serving is untouched until the
    * flip commits. Old versions are dropped only after; a crash in
    * that window leaks tables, swept by the next rebuild/build. */
  def rebuild(d: DataFrame, name: String): Long = {
    val spark = d.sparkSession
    import spark.implicits._
    val next = currentVersion(spark, name) + 1L
    buildAt(d, prefixOf(name, next))
    Seq(next).toDF("v").write.mode("overwrite")
      .saveAsTable(versionTable(name)) // THE swap: one 1-row commit
    dropVersionsExcept(spark, name, keep = next)
    next
  }

  private def dropVersionsExcept(spark: SparkSession, name: String,
                                 keep: Long): Unit = {
    val re = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name) + "_v(\\d+)_(order|manifest)")
    spark.catalog.listTables().collect().foreach { t =>
      val m = re.matcher(t.name)
      if (m.matches() && m.group(1).toLong != keep)
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}")
    }
    if (keep > 1L) {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_order")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_manifest")
    }
  }

  /** The whole frozen order, version-resolved. */
  def order(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${prefixOf(name, currentVersion(spark, name))}_order")

  /** One shard of the frozen order — the per-data-loader-worker read.
    * The filter is on the PARTITION column, so the scan touches
    * exactly one of the store's shard directories (plan-guarded by
    * `OrderStoreSpec`); no corpus scan, no re-sort, no window. */
  def serveShard(spark: SparkSession, name: String,
                 shardId: Long): DataFrame =
    order(spark, name).filter(col("shard_id") === shardId)

  /** The manifest snapshotted at build time, version-resolved. */
  def manifest(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${prefixOf(name, currentVersion(spark, name))}_manifest")

  /** Resume-time integrity check: recompute the manifest on the corpus
    * `d` AT HAND and report every shard whose stored snapshot
    * disagrees — a dropped, substituted or REORDERED doc, or a shard
    * missing from either side. Empty result == safe to resume reading
    * this corpus under the frozen order. Cost: one fresh pl31 (the
    * corpus-linear manifest) against a shard-cardinality stored
    * table. */
  def verify(d: DataFrame, name: String): DataFrame = {
    val spark = d.sparkSession
    val stored = manifest(spark, name).select(col("shard_id"),
      col("n_docs").as("stored_n_docs"),
      col("sum_chars").as("stored_sum_chars"),
      col("checksum").as("stored_checksum"))
    val fresh = graft.queries.Pipeline.orderManifestOf(d)
      .select(col("shard_id"),
        col("n_docs").as("fresh_n_docs"),
        col("sum_chars").as("fresh_sum_chars"),
        col("checksum").as("fresh_checksum"))
    stored.join(fresh, Seq("shard_id"), "full_outer")
      .filter(not(col("stored_n_docs") <=> col("fresh_n_docs")) ||
        not(col("stored_sum_chars") <=> col("fresh_sum_chars")) ||
        not(col("stored_checksum") <=> col("fresh_checksum")))
  }
}
