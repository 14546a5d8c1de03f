package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.queries.Similarity

/** Build-once/serve-many artifact for ANN search — the vector analog of
  * `IndexStore` (postings) and `DedupStore` (near-dup): embedding a new
  * query should never re-scan, re-assign, or re-quantize the 100 TB
  * corpus. Three saved tables per store:
  *
  *   - `<name>_centroids` (cid, ce): the coarse quantizer (tiny).
  *   - `<name>_stats` (mns, mxs): per-dimension min/max, ONE row — the
  *     scalar-quantization codebook.
  *   - `<name>_codes` (vec_id, code: array<smallint>) PARTITIONED BY
  *     cid: one byte of information per dimension (4× memory cut vs
  *     float32) plus the vector's coarse cell. Partitioning by cid
  *     means a serve-time nprobe/cells candidate read is a PARTITION-
  *     PRUNED scan — untouched cells are never read from disk.
  *
  * Serving composes IVF pruning (sm03's cell equi-join) with scalar
  * quantization scoring (sm08's asymmetric dequantized cosine): probe
  * cells are a shuffle-free projection against the collected (8-row)
  * centroid set, candidates come from the pruned code partitions, and
  * the probe side stays full-precision. Nothing at serve time touches
  * the raw embeddings table — plan-guarded in `VectorStoreSpec`.
  */
object VectorStore {

  /** Fixed coarse quantizer: the vectors with vec_id < Cells (the sm03
    * convention — deterministic, and at build time any trained
    * centroid set can be dropped in instead). */
  val Cells = 8
  val NProbe = 2
  val TopK = 10

  /** Assignment + quantization of a vector frame against a codebook:
    * `(vec_id, cid, code)`. The SQ expression trees live in
    * `VectorFunctions` (shared with sm08); `sqQuantize` CLAMPS at the
    * range edges BEFORE the narrow cast here, so frozen-codebook
    * ingest of drifted data saturates at 0/255 instead of overflowing
    * the smallint (ANSI mode would otherwise fail the append job).
    * Stored as smallint: the VALUE range is 8-bit; a production
    * layout packs 4 codes per int32. */
  private def codesOf(e: DataFrame, stRow: DataFrame,
                      cent: Seq[(Long, Seq[Double])]): DataFrame =
    Similarity.nearestCells(
        e.crossJoin(broadcast(stRow)), "vec_id", "embedding", cent, 1,
        carry = Seq("embedding", "mns", "mxs"))
      .select(col("vec_id"), col("cid"),
        VectorFunctions.sqQuantize(col("embedding"), col("mns"), col("mxs"))
          .cast("array<smallint>").as("code"))

  /** Build the artifact from an `(vec_id, embedding)` frame. */
  def build(e: DataFrame, name: String): Unit = {
    val spark = e.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    e.filter(col("vec_id") < Cells)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("ce"))
      .write.mode("overwrite").saveAsTable(s"${name}_centroids")
    VectorFunctions.sqStatsRow(e, "embedding")
      .write.mode("overwrite").saveAsTable(s"${name}_stats")
    val cent = collectCentroids(spark, s"${name}_centroids")
    codesOf(e, spark.table(s"${name}_stats"), cent)
      .write.mode("overwrite").partitionBy("cid")
      .saveAsTable(s"${name}_codes")
  }

  /** Ingest new vectors into a built store: assign + quantize with the
    * STORED centroids and codebook (never retrained per batch — the
    * IndexMaintenance append contract: unique vec_ids, and the
    * artifact stays self-consistent because every code in it was
    * produced by the same codebook). Codebook drift — new data outside
    * the recorded per-dim [min, max] — saturates at the range edge
    * inside `sqQuantize`; rebuild when drift matters. */
  def append(newVecs: DataFrame, name: String): Unit = {
    val spark = newVecs.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val cent = collectCentroids(spark, s"${name}_centroids")
    codesOf(newVecs, spark.table(s"${name}_stats"), cent)
      .select(col("vec_id"), col("code"), col("cid"))
      .write.mode("append").partitionBy("cid")
      .saveAsTable(s"${name}_codes")
  }

  private def collectCentroids(spark: SparkSession,
                               table: String): Seq[(Long, Seq[Double])] =
    Similarity.collectCentroids(spark.table(table))

  /** Top-k cosine neighbors for `probes` (`probe_id`, `pe`), served
    * ENTIRELY from the artifact: probe cells via a projection against
    * the collected centroids, candidates from the partition-pruned
    * code table, asymmetric scoring of the full-precision probe
    * against dequantized codes. Output matches sm08's shape
    * (probe_id, neighbor_id, rank, cosine — cosine UNROUNDED).
    *
    * Id-space contract: `probe_id` values live in the SAME id space as
    * the stored `vec_id`s (the sm08 convention) — a stored vector
    * whose id equals the probe's is excluded as "the probe itself".
    * Probes with an unrelated id scheme must be re-keyed first, or a
    * colliding corpus neighbor would silently vanish from its
    * results. */
  def serveTopK(probes: DataFrame, name: String,
                nprobe: Int = NProbe, k: Int = TopK): DataFrame = {
    val spark = probes.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val cent = collectCentroids(spark, s"${name}_centroids")
    val pcells = Similarity.nearestCells(
      probes.select(col("probe_id"), col("pe").as("embedding")),
      "probe_id", "embedding", cent, nprobe)
    val cand = spark.table(s"${name}_codes")
      .join(pcells, Seq("cid"))
      .join(probes, Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .crossJoin(broadcast(spark.table(s"${name}_stats")))
    val scored = cand
      .select(col("probe_id"), col("pe"), col("vec_id"),
        VectorFunctions.sqDequantize(col("code"), col("mns"), col("mxs"))
          .as("deq"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("pe"), col("deq")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }
}
