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

  /** bucket count: sized for test SFs; a 100 TB deployment picks
    * buckets so each bucket file lands in the 128–512 MB range. */
  private val Buckets = 8

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
    * it (and the stats side table) on first use in this JVM. */
  def termDocTable(s: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions._
    val name = s"graft_termdoc_${tag(dir)}"
    built.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      replaceTable(s, name,
        graft.queries.Text.termDocPositional(s, dir)
          .write.mode("overwrite")
          .bucketBy(Buckets, "token").sortBy("token"))
      replaceTable(s, s"graft_docstats_${tag(dir)}",
        graft.tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"))
          .write.mode("overwrite"))
    })
    name
  }

  /** The saved positional postings as a DataFrame (building if needed). */
  def termDoc(s: SparkSession, dir: String): DataFrame =
    s.table(termDocTable(s, dir))

  /** The saved one-row corpus stats (n_docs) — building if needed. */
  def docStats(s: SparkSession, dir: String): DataFrame = {
    termDocTable(s, dir)
    s.table(s"graft_docstats_${tag(dir)}")
  }
}
