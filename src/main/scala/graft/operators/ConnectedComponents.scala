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
    * Each round does (1) a neighbor-min step and (2) a POINTER-JUMP
    * (`root ← root(root)`) so long chains converge in O(log diameter)
    * rounds, not O(diameter) — the one-hop-only formulation paid a
    * full round of job latency per hop and dominated dd06/dd07 bench
    * time. Correctness rests on the neighbor-min fixpoint alone (at a
    * fixpoint both endpoints of every edge carry equal labels, so each
    * component is uniformly labeled by its min id); the jump only
    * accelerates, since any label it installs is still a node id of
    * the same component.
    *
    * Convergence probe: labels are monotone non-increasing, so the
    * label SUM is stable iff the round was a no-op — one cheap
    * aggregation per round, instead of a diff join.
    *
    * Lineage: each round EAGERLY `localCheckpoint`s its result. A
    * persist alone leaves every prior round nested inside the logical
    * plan, so analysis/codegen cost grows per round and the plan tree
    * eventually OOMs the driver just STRINGIFYING it (observed at
    * round ~10 of the one-hop formulation). Checkpointing resets the
    * plan to a constant-size `LogicalRDD` per round. (A cluster
    * deployment wanting executor-failure tolerance for long runs
    * would swap in reliable `checkpoint` against the checkpoint dir —
    * same truncation, durable blocks.)
    *
    * Returns `(node, root)` — one row per distinct endpoint. Nodes
    * outside `pairs` are absent (singleton components are the caller's
    * left-join default). Caller owns the cache lifecycle of the result
    * (it is returned persisted; `spark.catalog.clearCache()` releases).
    */
  def minLabel(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(pairs.columns.length == 2,
      s"pairs must have exactly two endpoint columns, got ${pairs.columns.mkString(", ")}")
    val Seq(a, b) = pairs.columns.toSeq.map(col)
    val edges = pairs.select(a.as("src"), b.as("dst"))
      .union(pairs.select(b, a))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("root", col("node"))
      .localCheckpoint(true)
    // decimal(38,0) accumulation: a Long sum of ~1e10 node ids can wrap,
    // and a wrapped sum could spuriously equal the previous round's
    // (same overflow class as the Lloyd-step oracle fix)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("root").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = labels.isEmpty // no edges → nothing to propagate
    while (!converged && round < maxRounds) {
      val msgs = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("root"))
      val m1 = labels.select("node", "root").union(msgs)
        .groupBy("node").agg(min("root").as("root"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val next = m1.as("x")
        .join(m1.as("y"), col("x.root") === col("y.node"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("y.root"), col("x.root")).as("root"))
        .localCheckpoint(true) // materializes the round, truncates lineage
      m1.unpersist()
      val newSum = labelSum(next)
      labels = next
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      round += 1
    }
    edges.unpersist()
    require(converged,
      s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
