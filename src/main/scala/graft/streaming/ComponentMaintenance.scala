package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental connected-components maintenance (the 21st maintainer)
  * — the missing piece of the streaming dedup story: `DedupMaintenance`
  * ledgers near-dup PAIRS per batch, but component labels (the dd06/
  * dd17/dd19 consumers) were recomputed from the FULL pair set at
  * serve time — at 100 TB the pair ledger is the corpus-scale object,
  * and re-closing it per query is exactly what an artifact exists to
  * avoid. This maintainer folds each micro-batch of pairs into
  * PERSISTED labels with union-find semantics, touching only the
  * batch's frontier:
  *
  *   1. The batch's endpoints are mapped through the served labels
  *      (one equi-join; unseen nodes map to themselves), collapsing
  *      every edge into ROOT SPACE — a graph bounded by the batch,
  *      never the corpus.
  *   2. `ConnectedComponents.minLabel` closes that batch-sized graph.
  *      Because every existing root is already the MIN id of its
  *      component, the min over merged roots is the global min — so
  *      streamed labels equal the one-shot batch closure whatever the
  *      arrival order (spec-pinned against dd06's operator).
  *   3. Two batch_id-partitioned ledgers take the delta: `nodes`
  *      (first-seen endpoints with their root-at-arrival) and `remap`
  *      (old_root → new_root for components this batch merged). Both
  *      are written with dynamic partition overwrite — the
  *      IndexMaintenance protocol, so every crash point replays into
  *      an overwrite or a marker skip. Marker last.
  *
  * Serving resolves the remap CHAIN (old roots re-merged by later
  * batches) with pointer jumping over the remap ledger — a merge-
  * events-sized table, not corpus-sized — then applies it to the node
  * ledger with one equi-join. Remap targets strictly decrease (min-id
  * union), so chains are acyclic and O(log)-resolvable; old_roots are
  * unique across the ledger (a root leaves root-space the batch it is
  * remapped), so resolution never fans out.
  *
  * [[compact]] folds both ledgers into a node-bucketed compact table
  * of fully-resolved labels behind a high-water table property (the
  * IndexMaintenance stage-then-swap), after which serving is the
  * compact scan plus the small committed tail. A remap landing AFTER
  * a compact still rewrites folded rows at serve time via the chain —
  * the compact/tail split never wedges a merge.
  */
object ComponentMaintenance {

  private val HwProp = "graft.folded.hw"
  private def compactTable(nodesTable: String) = nodesTable + "c"

  /** Starts the maintainer over a stream of near-dup pair rows
    * (`doc_a`, `doc_b`) — e.g. the increments `DedupMaintenance`
    * ledgers. Requires a DURABLE checkpointDir (stable batch ids — the
    * IndexMaintenance contract). */
  def maintain(pairs: DataFrame, nodesTable: String, remapTable: String,
               markerTable: String, checkpointDir: String,
               erasureLedger: Option[String] = None): StreamingQuery = {
    require(checkpointDir.nonEmpty,
      "ComponentMaintenance.maintain requires a durable checkpointDir: " +
        "replay-skip markers are only valid against stable batch ids")
    pairs.writeStream
      .outputMode("append")
      .queryName(Maintenance.queryNameFor(nodesTable))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a pair is gated when EITHER endpoint was erased: a merge
        // event caused by a deleted doc must not re-enter the graph
        appendBatch(
          graft.index.Erasure.gateBatch(batch, erasureLedger,
            batch.columns.toSeq),
          batchId, nodesTable, remapTable, markerTable)
      }
      .start()
  }

  /** Auto-fold trigger (the `SplitAssignment.AutoCompactParts`
    * pattern): once the committed live tail of EITHER ledger exceeds
    * this many partitions, [[appendBatch]] folds before probing. The
    * round-14 100× exercise measured WHY the cadence matters: folding
    * after every one of 40 batches cost ~440s against 14.5s for one
    * fold at the end — per-fold job overhead dominates, so the fold
    * must amortize across batches while the remap chain (whose length
    * is what serve-time resolution pays for) stays bounded. Safe
    * inline: the maintainer is the ledgers' only writer, foreachBatch
    * runs serially, and serving is hw-correct at any crash point of a
    * fold. */
  val AutoCompactParts = 8

  private def tailParts(spark: SparkSession, t: String, hw: Long,
                        markerTable: String): Int =
    if (!spark.catalog.tableExists(t) ||
        !spark.catalog.tableExists(markerTable)) 0
    else spark.table(t).select("batch_id").distinct()
      .filter(col("batch_id") > hw)
      .join(broadcast(spark.table(markerTable).select("batch_id")),
        Seq("batch_id"), "left_semi")
      .count().toInt

  /** One micro-batch of pairs: map endpoints through served labels,
    * close the root-space graph, land first-seen nodes + root remaps
    * (both partition-overwritten), marker last. Replay-safe: the delta
    * is a deterministic function of the batch and the COMMITTED state,
    * and a crashed partial partition is overwritten whole.
    * `autoCompactParts` bounds the serve-side tail (and the remap
    * chain the per-batch probe resolves): any ledger whose committed
    * tail exceeds it is folded before this batch probes — pass
    * `Int.MaxValue` to disable. */
  def appendBatch(batch: DataFrame, batchId: Long, nodesTable: String,
                  remapTable: String, markerTable: String,
                  autoCompactParts: Int = AutoCompactParts): Unit = {
    val spark = batch.sparkSession
    val committed = spark.catalog.tableExists(markerTable) &&
      !spark.table(markerTable).filter(col("batch_id") === batchId).isEmpty
    if (committed) return
    if (autoCompactParts != Int.MaxValue) {
      val hw = hwOf(spark, compactTable(nodesTable))
      if (tailParts(spark, nodesTable, hw, markerTable) > autoCompactParts ||
          tailParts(spark, remapTable, hw, markerTable) > autoCompactParts)
        compact(spark, nodesTable, remapTable, markerTable)
    }
    val cols = batch.columns
    require(cols.length == 2,
      s"pair batches must have exactly two endpoint columns, got " +
        cols.mkString(", "))
    val p = batch
      .select(col(cols(0)).cast("long").as("a"),
        col(cols(1)).cast("long").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val served = labels(spark, nodesTable, remapTable, markerTable)
      val ends = p.select(col("a").as("node"))
        .union(p.select(col("b").as("node"))).distinct()
      // endpoint → current root (self when first seen); checkpointed so
      // the ledger writes below cannot re-read the tables they change
      val mapped = ends.join(served, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("root"), col("node")).as("root"))
        .localCheckpoint(true)
      val re = p
        .join(mapped.select(col("node").as("a"), col("root").as("ra")),
          Seq("a"))
        .join(mapped.select(col("node").as("b"), col("root").as("rb")),
          Seq("b"))
        .filter(col("ra") =!= col("rb"))
        .select(col("ra"), col("rb"))
      // batch-bounded closure: nodes of `re` are ROOTS, so this graph
      // is at most 2×|batch pairs| nodes regardless of corpus size
      val cc = graft.operators.ConnectedComponents.minLabel(re)
      val remaps = cc.filter(col("node") =!= col("root"))
        .select(col("node").as("old_root"), col("root").as("new_root"))
        .localCheckpoint(true)
      val ccMap = cc.select(col("node").as("root"), col("root").as("nr"))
      val newNodes = mapped
        .join(ccMap, Seq("root"), "left")
        .select(col("node"), coalesce(col("nr"), col("root")).as("root"))
        .join(served.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      overwritePartition(
        newNodes.withColumn("batch_id", lit(batchId)), nodesTable)
      overwritePartition(
        remaps.withColumn("batch_id", lit(batchId)), remapTable)
      batch.groupBy()
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("batch_id", lit(batchId))
        .select("batch_id", "n_pairs")
        .write.mode("append").saveAsTable(markerTable)
    } finally p.unpersist()
  }

  /** The maintained component labels `(node, root)` — compact table
    * (fully resolved as of its high-water) plus the committed ledger
    * tail, with tail remaps chain-resolved and applied to BOTH parts
    * (a post-compact merge must rewrite folded rows too). Root = min
    * doc id of the component, the dd06 contract. Empty-but-typed
    * before any commit. */
  def labels(spark: SparkSession, nodesTable: String, remapTable: String,
             markerTable: String): DataFrame = {
    val cT = compactTable(nodesTable)
    // the maintainer writes through a CLONED session (foreachBatch),
    // whose post-write refresh does not invalidate THIS session's
    // cached file listings — without an explicit refresh, a serve call
    // that planned against these tables before the latest batch would
    // keep reading the stale listing and miss committed rows (observed:
    // a marker append invisible to the session that had served earlier)
    Seq(nodesTable, remapTable, markerTable, cT).foreach(refresh(spark, _))
    recoverStaging(spark, cT)
    val hw = hwOf(spark, cT)
    val base = if (spark.catalog.tableExists(cT))
      Some(spark.table(cT).select("node", "root")) else None
    val haveMk = spark.catalog.tableExists(markerTable)
    def committedTail(t: String): Option[DataFrame] =
      if (!haveMk || !spark.catalog.tableExists(t)) None
      else Some(spark.table(t)
        .filter(col("batch_id") > hw)
        .join(broadcast(spark.table(markerTable).select("batch_id")),
          Seq("batch_id"), "left_semi"))
    val nTail = committedTail(nodesTable).map(_.select("node", "root"))
    val n = (base, nTail) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b).getOrElse(
        return spark.range(0).select(col("id").as("node"),
          col("id").as("root")))
    }
    committedTail(remapTable)
      .map(r => applyRemaps(n,
        resolveRemaps(r.select("old_root", "new_root"))))
      .getOrElse(n)
  }

  /** Chase remap chains to their final targets with pointer jumping.
    * Targets strictly decrease (min-id union), so chains are acyclic;
    * old_roots are unique, so every jump is 1:1. The remap set is
    * merge-events-sized — small next to the node ledger. */
  private def resolveRemaps(r: DataFrame): DataFrame = {
    var cur = r.localCheckpoint(true)
    var rounds = 0
    while (!cur.as("x").join(cur.as("y"),
        col("x.new_root") === col("y.old_root"), "left_semi").isEmpty) {
      require(rounds < 30,
        "remap chain resolution did not converge in 30 rounds")
      cur = cur.as("x")
        .join(cur.as("y"),
          col("x.new_root") === col("y.old_root"), "left")
        .select(col("x.old_root").as("old_root"),
          coalesce(col("y.new_root"), col("x.new_root")).as("new_root"))
        .localCheckpoint(true)
      rounds += 1
    }
    cur
  }

  private def applyRemaps(n: DataFrame, rStar: DataFrame): DataFrame =
    n.join(rStar, n("root") === rStar("old_root"), "left")
      .select(n("node"),
        coalesce(rStar("new_root"), n("root")).as("root"))

  private def hwOf(spark: SparkSession, cT: String): Long =
    if (!spark.catalog.tableExists(cT)) -1L
    else spark.sql(s"SHOW TBLPROPERTIES $cT")
      .collect().find(_.getString(0) == HwProp)
      .map(_.getString(1).toLong).getOrElse(-1L)

  private def refresh(spark: SparkSession, t: String): Unit =
    if (spark.catalog.tableExists(t))
      try spark.catalog.refreshTable(t)
      catch { case _: Exception => () }

  private def recoverStaging(spark: SparkSession, table: String): Unit = {
    val staging = table + "_staging"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(staging))
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  /** Fold both committed ledger tails into the node-bucketed compact
    * table of FULLY-RESOLVED labels (root chains applied), behind the
    * stage-then-swap + high-water-property protocol of
    * `IndexMaintenance.compact`: the hw commits in the same rename as
    * the rows, a crash between swap and partition drops leaves ≤hw
    * partitions every reader already excludes, and the next compact
    * re-drops them. Run in a maintenance window with the maintainer
    * stopped. */
  def compact(spark: SparkSession, nodesTable: String, remapTable: String,
              markerTable: String, buckets: Int = 8): Unit = {
    val cT = compactTable(nodesTable)
    recoverStaging(spark, cT)
    if (!spark.catalog.tableExists(markerTable)) return
    val committed = spark.table(markerTable).select("batch_id")
    val hw = hwOf(spark, cT)
    def ids(t: String, above: Boolean): Seq[Long] =
      if (!spark.catalog.tableExists(t)) Nil
      else spark.table(t).select("batch_id").distinct()
        .filter(if (above) col("batch_id") > hw else col("batch_id") <= hw)
        .join(broadcast(committed), Seq("batch_id"), "left_semi")
        .collect().map(_.getLong(0)).toSeq // bounded: batch count
    val foldIds = (ids(nodesTable, above = true) ++
      ids(remapTable, above = true)).distinct
    val staleIds = (ids(nodesTable, above = false) ++
      ids(remapTable, above = false)).distinct
    if (foldIds.nonEmpty) {
      val resolved = labels(spark, nodesTable, remapTable, markerTable)
      val staging = cT + "_staging"
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      resolved.repartition(col("node"))
        .write.mode("overwrite").bucketBy(buckets, "node")
        .saveAsTable(staging)
      val newHw = (hw +: foldIds).max
      spark.sql(
        s"ALTER TABLE $staging SET TBLPROPERTIES ('$HwProp'='$newHw')")
      spark.sql(s"DROP TABLE IF EXISTS $cT")
      spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
    }
    Seq(nodesTable, remapTable).foreach { t =>
      if (spark.catalog.tableExists(t))
        (foldIds ++ staleIds).foreach { b =>
          try spark.sql(
            s"ALTER TABLE $t DROP IF EXISTS PARTITION (batch_id=$b)")
          catch { case _: Exception => () }
        }
    }
  }

  /** Right-to-erasure seam: remove `victims`' (a single-column doc_id
    * frame) MEMBERSHIP rows and RELABEL any component whose root label
    * equals a victim id. Rides the existing compaction: [[compact]]
    * first folds both tails into the fully-resolved compact table
    * (which empties the remap chains — the only state where a label
    * rewrite is a per-row map), then the compact table is rewritten
    * without victim nodes and with victim-rooted components relabeled
    * to their minimum SURVIVING member (the dd06 min-id contract,
    * recomputed over the live membership). A component whose only
    * member was the victim disappears. The high-water property rides
    * the staged rewrite, so fold state survives. Idempotent;
    * maintenance window with the maintainer stopped. */
  def purgeDocs(spark: SparkSession, victims: DataFrame,
                nodesTable: String, remapTable: String,
                markerTable: String, buckets: Int = 8): Unit = {
    compact(spark, nodesTable, remapTable, markerTable, buckets)
    val cT = compactTable(nodesTable)
    recoverStaging(spark, cT)
    if (!spark.catalog.tableExists(cT)) return
    val v = broadcast(victims.toDF("erased_key"))
    val t = spark.table(cT)
    val touched =
      !t.join(v, t("node") === v("erased_key"), "left_semi").isEmpty ||
      !t.join(v, t("root") === v("erased_key"), "left_semi").isEmpty
    if (!touched) return
    val kept = t.join(v, t("node") === v("erased_key"), "left_anti")
    val relabel = kept
      .join(v, kept("root") === v("erased_key"), "left_semi")
      .groupBy("root").agg(min("node").as("new_root"))
    val rewritten = kept.join(broadcast(relabel), Seq("root"), "left")
      .select(col("node"),
        coalesce(col("new_root"), col("root")).as("root"))
    val hw = hwOf(spark, cT)
    val staging = cT + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    rewritten.repartition(col("node"))
      .write.mode("overwrite").bucketBy(buckets, "node")
      .saveAsTable(staging)
    spark.sql(s"ALTER TABLE $staging SET TBLPROPERTIES ('$HwProp'='$hw')")
    spark.sql(s"DROP TABLE IF EXISTS $cT")
    spark.sql(s"ALTER TABLE $staging RENAME TO $cT")
  }

  /** batch_id-partitioned dynamic overwrite (the SubstringDedup write
    * path — crashed partial partitions replaced whole on replay). */
  private def overwritePartition(rows: DataFrame, table: String): Unit = {
    val spark = rows.sparkSession
    if (!spark.catalog.tableExists(table))
      rows.write.partitionBy("batch_id").saveAsTable(table)
    else {
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try rows.write.mode("overwrite").insertInto(table)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
