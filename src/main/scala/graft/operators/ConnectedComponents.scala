package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via min-id label propagation — the
  * collapse step a dedup pipeline runs over near-dup candidate PAIRS
  * (a ~ b ~ c must yield one survivor even when (a, c) never met in an
  * LSH band).
  *
  * Each round is one shuffle join (neighbor labels) plus one
  * partial-aggregated min per node; rounds needed = max component
  * DIAMETER. Near-dup components are shallow clumps around a shared
  * template, so a small cap converges in practice; a graph that does
  * not converge fails LOUDLY rather than emitting silently-wrong
  * labels. (For adversarial long-chain graphs the O(log n) upgrade is
  * star-contraction — same join/agg primitives, more bookkeeping.)
  *
  * No driver-side graph is ever built: state per round is the
  * `(node, root)` label table, partitioned by node.
  */
object ConnectedComponents {

  /** Labels every node of the UNDIRECTED graph given by `pairs`
    * (two columns: endpoint a, endpoint b; one row per edge, either
    * orientation) with the min node id of its component.
    *
    * Returns `(node, root)` — one row per distinct endpoint. Nodes
    * outside `pairs` are absent (singleton components are the caller's
    * left-join default). Caller owns the cache lifecycle of the result
    * (it is returned persisted; `spark.catalog.clearCache()` releases).
    */
  def minLabel(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    val Seq(a, b) = pairs.columns.toSeq.map(col)
    val edges = pairs.select(a.as("src"), b.as("dst"))
      .union(pairs.select(b, a))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("root", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Propagate the min label one hop per round until a fixpoint. The
    // convergence probe piggybacks on the round's materialization
    // (isEmpty = LIMIT 1 scan of the joined diff).
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val msgs = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("root"))
      val next = labels.select("node", "root").union(msgs)
        .groupBy("node").agg(min("root").as("root"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      converged = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.root") =!= col("o.root"))
        .isEmpty
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    require(converged,
      s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
