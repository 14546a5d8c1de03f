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

  /** Per-dimension min/max of the corpus as ONE row of two ordered
    * arrays — the SQ codebook. 64-row aggregation, broadcastable. */
  private def statsRowOf(e: DataFrame): DataFrame =
    e.select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "xi")))
      .groupBy("pos").agg(min(col("xi")).as("mn"), max(col("xi")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          t => t.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          t => t.getField("mx")).as("mxs"))

  /** Quantize: float embedding → one code in [0, 255] per dimension.
    * floor(x·255 + 0.5), never round() — floor and the exact +0.5 add
    * are IEEE-identical across engines (the sm08 parity argument).
    * Stored as smallint (parquet INT32/INT16 annotated): the VALUE
    * range is 8-bit; a production layout packs 4 codes per int32. */
  private def codesOf(e: DataFrame, stRow: DataFrame,
                      cent: Seq[(Long, Seq[Double])]): DataFrame =
    Similarity.nearestCells(
        e.crossJoin(broadcast(stRow)), "vec_id", "embedding", cent, 1,
        carry = Seq("embedding", "mns", "mxs"))
      .select(col("vec_id"), col("cid"),
        transform(col("embedding").cast("array<double>"), (x, d) => {
          val mn = element_at(col("mns"), d + 1)
          val mx = element_at(col("mxs"), d + 1)
          when(mx === mn, lit(0L))
            .otherwise(floor((x - mn) / (mx - mn) * 255.0 + 0.5))
        }).cast("array<smallint>").as("code"))

  /** Dequantize a code array back to the cell of the original value —
    * the serve-time reconstruction ADC scores against. */
  private def dequantize(code: org.apache.spark.sql.Column,
                         mns: org.apache.spark.sql.Column,
                         mxs: org.apache.spark.sql.Column) =
    transform(code, (v, d) => {
      val mn = element_at(mns, d + 1)
      val mx = element_at(mxs, d + 1)
      when(mx === mn, mn)
        .otherwise(mn + (v.cast("double") / 255.0) * (mx - mn))
    })

  /** Build the artifact from an `(vec_id, embedding)` frame. */
  def build(e: DataFrame, name: String): Unit = {
    val spark = e.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    e.filter(col("vec_id") < Cells)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("ce"))
      .write.mode("overwrite").saveAsTable(s"${name}_centroids")
    statsRowOf(e).write.mode("overwrite").saveAsTable(s"${name}_stats")
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
    * the recorded per-dim [min, max] — clamps to the range edge (codes
    * saturate at 0/255); rebuild when drift matters. */
  def append(newVecs: DataFrame, name: String): Unit = {
    val spark = newVecs.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val cent = collectCentroids(spark, s"${name}_centroids")
    codesOf(newVecs, spark.table(s"${name}_stats"), cent)
      .select(col("vec_id"),
        transform(col("code"),
          v => greatest(lit(0), least(lit(255), v.cast("int"))))
          .cast("array<smallint>").as("code"),
        col("cid"))
      .write.mode("append").partitionBy("cid")
      .saveAsTable(s"${name}_codes")
  }

  private def collectCentroids(spark: SparkSession,
                               table: String): Seq[(Long, Seq[Double])] =
    spark.table(table)
      .select(col("cid").cast("long"), col("ce"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Top-k cosine neighbors for `probes` (`probe_id`, `pe`), served
    * ENTIRELY from the artifact: probe cells via a projection against
    * the collected centroids, candidates from the partition-pruned
    * code table, asymmetric scoring of the full-precision probe
    * against dequantized codes. Output matches sm08's shape
    * (probe_id, neighbor_id, rank, cosine — cosine UNROUNDED). */
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
        dequantize(col("code"), col("mns"), col("mxs")).as("deq"))
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
