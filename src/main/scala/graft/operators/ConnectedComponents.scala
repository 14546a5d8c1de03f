package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via min-id label propagation — the
  * collapse step a dedup pipeline runs over near-dup candidate PAIRS
  * (a ~ b ~ c must yield one survivor even when (a, c) never met in an
  * LSH band).
  *
  * Two interchangeable algorithms, both fully distributed (no
  * driver-side graph, state is a DataFrame partitioned by node):
  *
  *  - [[minLabel]]: neighbor-min propagation + pointer jumping.
  *    O(log diameter) rounds; the default for near-dup graphs, whose
  *    components are shallow clumps around a shared template.
  *  - [[starContract]]: alternating large-star / small-star edge
  *    contraction (Kiveris et al., "Connected Components in MapReduce
  *    and Beyond", SoCC'14). O(log n) rounds INDEPENDENT of diameter
  *    — the documented upgrade when adversarial long-chain graphs
  *    appear (e.g. containment chains across document revisions).
  *
  * Both converge-or-fail-LOUDLY rather than emitting silently-wrong
  * labels, and both return the same `(node, root)` contract.
  */
object ConnectedComponents {

  /** Decimal(38,0) sum of `root` observed DURING the eager
    * localCheckpoint job, so the convergence probe costs ZERO extra
    * Spark jobs (the previous formulation ran a separate aggregation
    * action per round — one full job of pure latency each).
    * Decimal, not Long: a Long sum of ~1e10 node ids can wrap, and a
    * wrapped sum could spuriously equal the previous round's (same
    * overflow class as the Lloyd-step oracle fix).
    *
    * Caller must guarantee `df` is non-empty: the observation resolves
    * when a job covering the CollectMetrics node completes, and a
    * zero-task job would leave `get` blocked forever.
    */
  private def checkpointObservingSum(df: DataFrame)
      : (DataFrame, java.math.BigDecimal, java.math.BigDecimal) = {
    val obs = Observation()
    val ck = df.observe(obs,
        coalesce(sum(col("root").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"),
        // sum of node ids, observed in the same job: it equals the
        // label sum of the identity labeling, so the FUSED first round
        // (below) can detect an already-converged graph without first
        // materializing an identity-labeled checkpoint
        coalesce(sum(col("node").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("n"))
      .localCheckpoint(true) // materializes the round, truncates lineage
    val m = obs.get
    (ck, m("s").asInstanceOf[java.math.BigDecimal],
      m("n").asInstanceOf[java.math.BigDecimal])
  }

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
    * label SUM is stable iff the round was a no-op — observed inside
    * the checkpoint job (see [[checkpointObservingSum]]).
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
    if (edges.isEmpty) { // no edges → nothing to propagate
      edges.unpersist()
      return pairs.sparkSession.emptyDataFrame
        .select(lit(0L).as("node"), lit(0L).as("root")).limit(0)
    }
    // FUSED first round (round-18 optimization): under the identity
    // initialization, round 1's message set `edges ⋈ labels` IS the
    // edge list itself (every label is its own node id), so the first
    // neighbor-min needs no join and no materialized identity
    // checkpoint — one checkpoint job and one shuffle fewer per CC
    // call, with identical labels by construction. Convergence for
    // the fused round compares against the identity label sum, which
    // the same observation measures as sum(node).
    def jump(m1: DataFrame): DataFrame =
      m1.as("x")
        .join(m1.as("y"), col("x.root") === col("y.node"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("y.root"), col("x.root")).as("root"))
    val m0 = edges.select(col("src").as("node"), col("src").as("root"))
      .union(edges.select(col("dst").as("node"), col("src").as("root")))
      .groupBy("node").agg(min("root").as("root"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var (labels, firstSum, nodeSum) = checkpointObservingSum(jump(m0))
    m0.unpersist()
    var prevSum = firstSum
    var converged = firstSum.compareTo(nodeSum) == 0
    var round = 1
    while (!converged && round < maxRounds) {
      val msgs = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("root"))
      val m1 = labels.select("node", "root").union(msgs)
        .groupBy("node").agg(min("root").as("root"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (next, newSum, _) = checkpointObservingSum(jump(m1))
      m1.unpersist()
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

  /** Star-contraction alternative: alternating LARGE-STAR / SMALL-STAR
    * operations over the EDGE set until it stabilizes as a forest of
    * stars, each rooted at its component's min id. Public algorithm —
    * Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (SoCC'14); O(log n) rounds regardless of graph diameter, where
    * [[minLabel]] needs O(log diameter).
    *
    * Per round, with Γ(u) the current neighborhood of u and
    * m(u) = min(Γ(u) ∪ {u}):
    *  - large-star: for every neighbor v ∈ Γ(u) with v > u, replace
    *    (u, v) by (v, m(u)) — strictly-larger neighbors re-hang on the
    *    local min.
    *  - small-star: canonicalize edges as (hi, lo); for every
    *    lo-neighbor v of u, emit (v, m(u)) plus (u, m(u)) — the
    *    smaller neighbors and u itself all attach to the local min.
    * Both are one groupBy-min plus one equi-join — the same shuffle
    * primitives as minLabel, just keyed on edges instead of labels.
    *
    * State per round is the canonical edge set, eagerly
    * localCheckpoint'ed (same lineage-truncation argument as
    * minLabel). Convergence probe: the canonical edge set only loses
    * total weight (every rewrite points an endpoint at a smaller id),
    * so `(count, sum(src), sum(dst))` observed during the checkpoint
    * is stable iff the round changed nothing.
    *
    * Returns `(node, root)` persisted, same contract as [[minLabel]].
    */
  def starContract(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    require(pairs.columns.length == 2,
      s"pairs must have exactly two endpoint columns, got ${pairs.columns.mkString(", ")}")
    val Seq(a, b) = pairs.columns.toSeq.map(col)

    // canonical (hi → lo) edge set, self-loops dropped, deduped
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    def checkpointObservingEdges(df: DataFrame)
        : (DataFrame, (Long, java.math.BigDecimal, java.math.BigDecimal)) = {
      val obs = Observation()
      val ck = df.observe(obs,
          count(lit(1)).as("n"),
          coalesce(sum(col("src").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")).as("ss"),
          coalesce(sum(col("dst").cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")).as("sd"))
        .localCheckpoint(true)
      val m = obs.get
      (ck, (m("n").asInstanceOf[Long],
        m("ss").asInstanceOf[java.math.BigDecimal],
        m("sd").asInstanceOf[java.math.BigDecimal]))
    }

    // node universe BEFORE canon: canon drops self-loops, so a node
    // appearing only as (a, a) would otherwise vanish from the output
    // while minLabel labels it with itself — the two must agree.
    // `pairs` may be an expensive derived plan (the MinHash verify
    // chain): persist it so the three consumers here (canon + the two
    // universe branches) evaluate it once, checkpoint both derivatives,
    // then release it before the rounds start.
    val p = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = p.select(a.as("node")).union(p.select(b.as("node")))
      .distinct()
      .localCheckpoint(true)
    val init = canon(p.select(a.as("src"), b.as("dst")))
    if (init.isEmpty) {
      p.unpersist()
      // only self-loops (or nothing): every node is its own root
      return nodes.select(col("node"), col("node").as("root"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    var (edges, prevSig) = checkpointObservingEdges(init)
    p.unpersist() // nodes and init are both checkpointed by now
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // ---- large-star: m(u) over the FULL neighborhood (both
      //      orientations), larger neighbors re-hang on m(u) ----
      val nbrs = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      val mins = nbrs.groupBy("src")
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      val large = canon(
        nbrs.filter(col("dst") > col("src"))
          .join(mins, "src")
          .select(col("dst").as("src"), col("m").as("dst")))
      // ---- small-star on the large-star output: edges are (hi, lo),
      //      so m(u) = min over lo-neighbors; everyone attaches to it ----
      val mins2 = large.groupBy("src").agg(min(col("dst")).as("m"))
      val small = canon(
        large.join(mins2, "src")
          .select(col("dst").as("src"), col("m").as("dst"))
          .union(mins2.select(col("src"), col("m").as("dst"))))
      val (next, sig) = checkpointObservingEdges(small)
      edges = next
      converged = sig == prevSig
      prevSig = sig
      round += 1
    }
    require(converged,
      s"star contraction did not converge in $maxRounds rounds")
    // fixpoint edge set is (child → component-min root) stars; add the
    // roots' self-labels to match minLabel's one-row-per-node contract,
    // plus self-labels for nodes canon() dropped (self-loop-only nodes)
    // — the anti-join probe side is node-scale, not edge-scale
    val stars = edges.select(col("src").as("node"), col("dst").as("root"))
      .union(edges.select(col("dst"), col("dst")).distinct())
      .distinct()
    val isolated = nodes.join(stars.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("root"))
    stars.union(isolated)
      .persist(StorageLevel.MEMORY_AND_DISK)
  }
}
