package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once/serve-many TOKENIZER artifact — the learned-vocabulary
  * twin of `QualityStore` (classifier weights): tx38's iterative BPE
  * trainer runs once over corpus word counts and the ranked merge list
  * is frozen as a `<name>_merges` table, so segmenting any later frame
  * (a re-crawl batch, a candidate shard, a document stream) replays
  * the stored merges as ONE map-side projection and never re-runs the
  * training loop or re-reads the training corpus. The artifact is
  * bounded at `nMerges` rows (a production tokenizer's ~10^4-10^5
  * merge table — driver- and broadcast-safe at any corpus size).
  *
  * Single source of truth: training and apply both come from
  * `Text.bpeTrain`/`Text.bpeSegmented` — the exact code tx38/tx39's
  * oracle-checked queries run, so stored-vocab segmentation equals the
  * fresh train-and-apply bit for bit (pinned by `TokenizerStoreSpec`).
  *
  * At 100 TB this is the difference between 8+ vocabulary-sized
  * training jobs per segmentation pass and zero: serve cost is the one
  * scan of the frame BEING segmented, plus an ≤nMerges-row table read.
  */
object TokenizerStore {

  /** Default training depth — tx38's merge count, so the corpus-keyed
    * artifact serves tx39's exact semantics. */
  val DefaultMerges: Int = graft.queries.Text.BpeMerges

  // one build per (JVM, corpus dir): repeated serve queries in the
  // same session reuse the artifact (the IndexStore device)
  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Collision-resistant per-corpus table tag (IndexStore's rationale:
    * 32-bit hashCode would let two dirs silently share one table). */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ---- Versioning (the VectorStore protocol, verbatim rationale) ----
  // `<name>_version` is a 1-row pointer (v: long); absent means v=1,
  // whose merge table lives under the bare `<name>_merges` name (the
  // pre-versioning layout — existing stores keep working untouched).
  // Version k>1 lives under `<name>_vk_merges`. Every reader resolves
  // the pointer FIRST, so a retrain becomes visible exactly when the
  // 1-row pointer flip commits — serving stays on the old, complete
  // vocabulary through any crash before the flip.

  private def versionTable(name: String) = s"${name}_version"

  /** Current artifact version (1 when the pointer table is absent). */
  def currentVersion(spark: SparkSession, name: String): Long =
    if (!spark.catalog.tableExists(versionTable(name))) 1L
    else spark.table(versionTable(name)).head.getLong(0)

  /** Table-name prefix of version `v`: bare name for v=1 (legacy
    * layout), `<name>_v<k>` beyond. */
  private def prefixOf(name: String, v: Long): String =
    if (v <= 1L) name else s"${name}_v$v"

  /** Train `nMerges` merges on `wc` and write the ranked merge list at
    * `prefix`. `wc` is persisted for the training rounds and released
    * before return (the tx38 try/finally discipline). */
  private def buildAt(wc: DataFrame, prefix: String, nMerges: Int): Unit = {
    val spark = wc.sparkSession
    import spark.implicits._
    val cached = wc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = try graft.queries.Text.bpeTrain(cached, nMerges)
            finally cached.unpersist()
    // IndexStore's replaceTable rationale: each JVM gets a fresh derby
    // metastore but SHARES the warehouse dir — a previous run may have
    // left the managed location behind with no catalog entry, which
    // CTAS refuses to reuse. Drop both the entry and the location.
    val table = s"${prefix}_merges"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    m.toDF("rk", "lhs", "rhs", "n")
      .coalesce(1) // ≤nMerges rows — one file, rank-ordered
      .write.mode("overwrite").saveAsTable(table)
  }

  /** Train `nMerges` BPE merges on `wc` (`word`, `wn` — corpus word
    * counts, the vocab-sized frame tx38 loops over) and freeze the
    * ranked merge list as `<name>_merges` (rk, lhs, rhs, n).
    * Overwrites, and resets the store to version 1: the pointer is
    * dropped BEFORE versioned tables, so serving flips to the
    * freshly-built bare layout first and a crash mid-cleanup never
    * leaves the pointer naming dropped tables. */
  def build(wc: DataFrame, name: String,
            nMerges: Int = DefaultMerges): Unit = {
    buildAt(wc, name, nMerges)
    wc.sparkSession.sql(s"DROP TABLE IF EXISTS ${versionTable(name)}")
    dropVersionsExcept(wc.sparkSession, name, keep = 1L)
  }

  /** Drift-triggered RETRAIN — the tokenizer side of the drift→rebuild
    * arc (`VectorStore.rebuild` is the codebook side): train a fresh
    * merge list on current word counts and install it as a NEW VERSION
    * behind the atomic 1-row pointer flip. The old vocabulary keeps
    * serving until the flip commits; a crash anywhere before it leaves
    * serving on the old, complete merge table (a retried rebuild
    * overwrites the partial next-version table). Old versions are
    * dropped only AFTER the flip; a crash in that window leaks tables,
    * swept by the next rebuild/build. Returns the new version. */
  def rebuild(wc: DataFrame, name: String,
              nMerges: Int = DefaultMerges): Long = {
    val spark = wc.sparkSession
    import spark.implicits._
    val next = currentVersion(spark, name) + 1L
    buildAt(wc, prefixOf(name, next), nMerges)
    Seq(next).toDF("v").write.mode("overwrite")
      .saveAsTable(versionTable(name)) // THE swap: one 1-row commit
    dropVersionsExcept(spark, name, keep = next)
    next
  }

  /** [[rebuild]] gated on the KL-drift signal — distribution shift in
    * the token stream is EXACTLY the signal a learned vocabulary goes
    * stale on (novel tokens segment to characters under old merges).
    * Fires when the LATEST committed `DriftMonitor.drifts` row reports
    * unseen-token mass or KL above the thresholds. */
  def rebuildIfDrifted(wc: DataFrame, name: String,
                       driftLedger: String, driftMarkers: String,
                       maxUnseenFrac: Double = 0.1,
                       maxKl: Double = 0.5,
                       nMerges: Int = DefaultMerges): Option[Long] = {
    val spark = wc.sparkSession
    val last = graft.streaming.DriftMonitor
      .drifts(spark, driftLedger, driftMarkers)
      .orderBy(org.apache.spark.sql.functions.col("batch_id").desc)
      .limit(1).collect()
    val drifted = last.headOption.exists { r =>
      val n = r.getAs[Long]("n_tokens")
      val unseen = if (n == 0L) 0.0
        else r.getAs[Long]("n_unseen").toDouble / n
      unseen > maxUnseenFrac || r.getAs[Double]("kl") > maxKl
    }
    if (drifted) Some(rebuild(wc, name, nMerges)) else None
  }

  /** Drop every artifact version except `keep` (catalog-listed, so
    * leaked versions from a crashed post-flip cleanup are swept too). */
  private def dropVersionsExcept(spark: SparkSession, name: String,
                                 keep: Long): Unit = {
    val re = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name) + "_v(\\d+)_merges")
    spark.catalog.listTables().collect().foreach { t =>
      val m = re.matcher(t.name)
      if (m.matches() && m.group(1).toLong != keep)
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}")
    }
    if (keep > 1L) spark.sql(s"DROP TABLE IF EXISTS ${name}_merges")
  }

  /** The FROZEN ranked merge list — the only read path, a bounded
    * driver collect of ≤nMerges rows (BPE apply is defined as merge
    * replay in rank order, so the list must fold into the projection
    * driver-side, exactly like tx39's in-query list). Resolves the
    * version pointer first — version-atomic like `VectorStore`'s
    * serving reads. */
  def merges(spark: SparkSession, name: String): Seq[(Int, String, String, Long)] =
    spark.table(s"${prefixOf(name, currentVersion(spark, name))}_merges")
      .orderBy("rk")
      .collect()
      .toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  /** Segment `word` under the stored vocabulary: array of subword
    * units, a pure map-side projection (zero training jobs, zero
    * training-corpus scans — the plan touches only the caller's
    * frame). Callers holding many words amortize the one ≤nMerges-row
    * artifact read across the whole frame. */
  def segmented(spark: SparkSession, name: String,
                word: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.queries.Text.bpeSegmented(word, merges(spark, name))

  /** Corpus-keyed build-if-absent (the IndexStore pattern): the frozen
    * tokenizer for `dir`'s documents, trained on first use in this
    * JVM. Returns the store name to serve from. */
  def forCorpus(s: SparkSession, dir: String): String = {
    val name = s"graft_tokenizer_${tag(dir)}"
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      build(graft.queries.Text.wordCounts(s, dir), name)
    })
    name
  }

  /** Stored artifact size — the serve-time driver-collect bound a
    * deployment monitors (must stay ≤ the trained merge depth).
    * Pointer-resolved like [[merges]]. */
  def modelRows(spark: SparkSession, name: String): Long =
    spark.table(s"${prefixOf(name, currentVersion(spark, name))}_merges")
      .count()
}
