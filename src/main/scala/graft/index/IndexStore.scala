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
      replaceTable(s, name,
        graft.queries.Text.termDocPositional(s, dir)
          .write.mode("overwrite")
          .bucketBy(buckets, "token").sortBy("token"))
      replaceTable(s, s"graft_docstats_${tag(dir)}",
        graft.tables.load(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("buckets", lit(buckets))
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
}
