package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * An optional fourth table, `<prefix>_tombstones` (vec_id), carries
  * DELETIONS between compactions — see [[deleteVecs]].
  */
object VectorStore {

  /** Coarse-quantizer floor: the vectors with vec_id < cells seed the
    * cell set (the sm03 convention — deterministic, and at build time
    * any trained centroid set can be dropped in instead). */
  val Cells = 8 // FLOOR of the adaptive default; every serve/append
  // path derives the actual cell count from the artifact's own
  // centroids table, so a store built at any `cells` (clusters want
  // hundreds — SURVEY §6b) is SELF-DESCRIBING and no consumer can
  // mismatch it
  val NProbe = 2
  val TopK = 10

  /** Target expected cell occupancy — `Similarity.adaptiveCells`'
    * rule (`Similarity.scala:151`), now the store's DEFAULT build
    * geometry: cells = max(Cells, n / CellTarget) holds occupancy at
    * ~CellTarget whatever the corpus, so per-probe verify work
    * (probes × nprobe × occupancy) stays bounded as the corpus grows
    * instead of scaling with n/8. At the test SFs (≤ 2000 vectors)
    * the formula floors at Cells, so every serve oracle is
    * unchanged — the knob engages past ~4000 vectors. */
  val CellTarget = 500L

  /** Sentinel `cells` value: resolve adaptively from the build frame. */
  val AdaptiveCells = 0

  /** DuckDB mirror of [[resolveCells]]' adaptive rule over the
    * `embeddings` table — every oracle that mirrors a store built at
    * the adaptive DEFAULT must interpolate THIS (not the `Cells`
    * constant): past ~4000 vectors the resolved count leaves the
    * floor, and an oracle pinned to 8 would silently score against a
    * different coarse quantizer than the served artifact. */
  val AdaptiveCellsSql: String =
    s"(SELECT greatest($Cells, count(*) // $CellTarget) FROM embeddings)"

  private def resolveCells(e: DataFrame, cells: Int): Int =
    if (cells > 0) cells
    else math.max(Cells.toLong, e.count() / CellTarget).toInt

  /** The SERVING artifact's cell count — read from its own centroids
    * table (the self-describing contract). None when no store exists. */
  def servingCells(spark: SparkSession, name: String): Option[Int] = {
    val t = s"${servingPrefix(spark, name)}_centroids"
    if (spark.catalog.tableExists(t)) Some(spark.table(t).count().toInt)
    else None
  }

  /** The assignment mode the serving artifact's codes were BUILT with
    * — "exact" (single-level argmin) or "two_level" (the ~2√C build
    * path past `Similarity.TwoLevelCellLimit`). None when no store
    * exists or the stats row predates the mode field. */
  def assignMode(spark: SparkSession, name: String): Option[String] = {
    val t = s"${servingPrefix(spark, name)}_stats"
    if (!spark.catalog.tableExists(t) ||
        !spark.table(t).columns.contains("assign_mode")) None
    else Some(spark.table(t).select("assign_mode").head.getString(0))
  }

  /** Per-testdata-dir store for registry queries (sm18), built on
    * first use in this JVM — the IndexStore.termDocTable convention:
    * the warehouse persists across JVMs while testdata regenerates,
    * so a fresh JVM always rebuilds rather than trusting a leftover
    * artifact. */
  private val builtByApp =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  def storeFor(s: SparkSession, dir: String): String = {
    val name = "graft_vecstore_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
    builtByApp.getOrElseUpdate(s.sparkContext.applicationId + "/" + name, {
      clearOrphanLocations(s, name)
      build(graft.tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding")), name)
    })
    name
  }

  /** Each JVM gets a fresh metastore but SHARES the warehouse dir
    * (the `IndexStore.replaceTable` hazard): a previous JVM's store
    * leaves managed locations behind with no catalog entry, which
    * `saveAsTable` refuses to reuse even in overwrite mode. Sweep any
    * `<name>_*` directory the CURRENT catalog doesn't know; known
    * tables are left alone — overwrite handles those. */
  private[graft] def clearOrphanLocations(s: SparkSession, name: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(wh))
      fs.listStatus(wh).foreach { st =>
        val t = st.getPath.getName
        if (t.startsWith(name + "_") && !s.catalog.tableExists(t))
          fs.delete(st.getPath, true)
      }
  }

  /** Same hazard, one table: before CREATING `table` via saveAsTable,
    * drop a leftover managed location the current catalog doesn't
    * know (a crashed previous JVM's write). Known tables are left
    * alone — overwrite mode handles those. Every table-creation site
    * in the store calls this, so a crash can never wedge the NEXT
    * build the way it wedged the round-13 spec runs. */
  private[graft] def clearOrphanLocation(s: SparkSession,
                                         table: String): Unit =
    if (!s.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      if (fs.exists(p)) fs.delete(p, true)
    }

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
    Similarity.assignCells(
        e.crossJoin(broadcast(stRow)), "vec_id", "embedding", cent,
        carry = Seq("embedding", "mns", "mxs"))
      .select(col("vec_id"), col("cid"),
        VectorFunctions.sqQuantize(col("embedding"), col("mns"), col("mxs"))
          .cast("array<smallint>").as("code"))

  // ---- Versioning ---------------------------------------------------
  // `<name>_version` is a 1-row pointer (v: long); absent means v=1,
  // whose tables live under the bare `<name>_*` names (the pre-
  // versioning layout — existing stores keep working untouched).
  // Version k>1 tables live under `<name>_vk_*`. Every reader resolves
  // the pointer FIRST, so a rebuild becomes visible exactly when the
  // 1-row pointer flip commits — the only multi-table-artifact swap
  // that is atomic under a plain file catalog.

  private def versionTable(name: String) = s"${name}_version"

  /** Current artifact version (1 when the pointer table is absent). */
  def currentVersion(spark: SparkSession, name: String): Long =
    if (!spark.catalog.tableExists(versionTable(name))) 1L
    else spark.table(versionTable(name)).head.getLong(0)

  /** Table-name prefix of version `v`: bare name for v=1 (legacy
    * layout), `<name>_v<k>` beyond. */
  private def prefixOf(name: String, v: Long): String =
    if (v <= 1L) name else s"${name}_v$v"

  /** The prefix serving reads resolve against — pointer first. */
  private[graft] def servingPrefix(spark: SparkSession, name: String): String =
    prefixOf(name, currentVersion(spark, name))

  /** Write the four artifact tables under `prefix`. The `_raw` table
    * carries the full-precision vectors cid-PARTITIONED like the
    * codes: it lives on disk (codes are the memory-resident scan),
    * and exists for [[serveTopKRefined]]'s exact-rerank fetch — which
    * therefore reads only the probed cells' raw partitions. */
  private def buildAt(e: DataFrame, prefix: String, cells: Int): Unit = {
    val spark = e.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    Seq("centroids", "stats", "codes", "raw", "bits")
      .foreach(t => clearOrphanLocation(spark, s"${prefix}_$t"))
    // seed from the first `cells` LIVE rows ordered by vec_id — NOT the
    // `vec_id < cells` predicate: a build frame missing a low id (a
    // deleteVecs of an id < cells followed by rebuild, whose training
    // frame excludes tombstoned vectors) would seed FEWER centroid rows
    // than requested, and recording the requested count would brick the
    // store on checkGeometry at every serve — with another rebuild
    // reproducing the same tear. On a contiguous-id frame (every
    // registry build) this is exactly the old vec_id < cells set.
    e.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("ce"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_centroids")
    val cent = collectCentroids(spark, s"${prefix}_centroids")
    // the stats row records the BUILD geometry next to the codebook:
    // consumers cross-check it against the centroids table and refuse
    // a store whose two tables disagree (a torn build). Record the
    // ACTUAL centroid count (== `cells` unless the frame has fewer
    // rows), so the two geometry records agree by construction — and
    // the ASSIGNMENT MODE the codes were built with ("exact" argmin vs
    // "two_level" past Similarity.TwoLevelCellLimit), so a serve path
    // can report which geometry produced the codes it scores against.
    VectorFunctions.sqStatsRow(e, "embedding")
      .withColumn("cells", lit(cent.size.toLong))
      .withColumn("assign_mode",
        lit(if (cent.size > Similarity.TwoLevelCellLimit) "two_level"
            else "exact"))
      .write.mode("overwrite").saveAsTable(s"${prefix}_stats")
    // ONE assignment pass feeds all three cid-partitioned tables:
    // assignment is the build's dominant cost (O(n·cells) exact, ~2√C
    // evals/vector two-level), and codes/raw/bits each deriving it
    // independently re-ran it per table (measured at 100×/400 cells:
    // three passes 159.2 s → one persisted pass). The persist lives
    // only for the three writes.
    // ... and each write CLUSTERS BY CELL first (the compact
    // convention): a direct partitionBy write from N scan tasks
    // commits N×cells files — 3 tables × 128 tasks × 400 cells ≈ 150k
    // file commits dominated the 100× build; one shuffle of the slim
    // assigned frame per table writes one file per cell instead.
    val assigned = Similarity.assignCells(
        e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, carry = Seq("embedding"))
      .repartition(col("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assigned
        .crossJoin(broadcast(spark.table(s"${prefix}_stats")
          .select("mns", "mxs")))
        .select(col("vec_id"), col("cid"),
          VectorFunctions.sqQuantize(col("embedding"), col("mns"),
            col("mxs")).cast("array<smallint>").as("code"))
        .write.mode("overwrite").partitionBy("cid")
        .saveAsTable(s"${prefix}_codes")
      assigned
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("vec"), col("cid"))
        .write.mode("overwrite").partitionBy("cid")
        .saveAsTable(s"${prefix}_raw")
      assigned
        .select(col("vec_id"),
          VectorFunctions.signWord(col("embedding"), 0).as("w0"),
          VectorFunctions.signWord(col("embedding"), 32).as("w1"),
          col("cid"))
        .write.mode("overwrite").partitionBy("cid")
        .saveAsTable(s"${prefix}_bits")
    } finally assigned.unpersist()
  }

  /** `(vec_id, w0, w1, cid)` — the BINARY-quantization side of the
    * artifact (the cheapest rung of its memory ladder, below the int8
    * codes): one SIGN BIT per dimension packed into two 32-bit words,
    * 16 bytes/vector where the codes take 64 and `_raw` 512 — the
    * structure a 100 TB deployment keeps RAM-resident when even int8
    * doesn't fit (a billion vectors = 16 GB of bit rows). Assigned
    * under the same centroids as the codes so all three tables'
    * partitions align. */
  private def bitsOf(e: DataFrame,
                     cent: Seq[(Long, Seq[Double])]): DataFrame =
    Similarity.assignCells(
        e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, carry = Seq("embedding"))
      .select(col("vec_id"),
        VectorFunctions.signWord(col("embedding"), 0).as("w0"),
        VectorFunctions.signWord(col("embedding"), 32).as("w1"),
        col("cid"))

  /** `(vec_id, vec: array<double>, cid)` — the full-precision side of
    * the artifact, assigned under the same centroids as the codes so
    * the two tables' partitions always align. */
  private def rawOf(e: DataFrame,
                    cent: Seq[(Long, Seq[Double])]): DataFrame =
    Similarity.assignCells(
        e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, carry = Seq("embedding"))
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"), col("cid"))

  /** Build the artifact from an `(vec_id, embedding)` frame. Resets
    * the store to version 1: the pointer is dropped BEFORE any
    * versioned tables, so serving flips to the freshly-built bare
    * layout first and a crash mid-cleanup never leaves the pointer
    * naming dropped tables. */
  def build(e: DataFrame, name: String, cells: Int = AdaptiveCells): Unit = {
    buildAt(e, name, resolveCells(e, cells))
    e.sparkSession.sql(s"DROP TABLE IF EXISTS ${versionTable(name)}")
    // a from-scratch build starts with no deletions: a stale tombstone
    // set from the store's previous life would silently hide vectors
    e.sparkSession.sql(s"DROP TABLE IF EXISTS ${name}_tombstones")
    dropVersionsExcept(e.sparkSession, name, keep = 1L)
  }

  /** Drift-triggered re-quantization — the rebuild arc DriftMonitor's
    * signal calls for: retrain the coarse quantizer and SQ codebook on
    * the CURRENT vectors and install the result as a NEW VERSION with
    * an atomic pointer flip. The old version keeps serving until the
    * flip commits; a crash anywhere before it leaves the pointer — and
    * therefore serving — on the old, complete artifact (a retried
    * rebuild overwrites the partial next-version tables). Old-version
    * tables are dropped only AFTER the flip; a crash in that window
    * leaks tables, swept by [[dropVersionsExcept]] on the next
    * rebuild/build. Deletes SURVIVE the rebuild: the serving version's
    * tombstones are subtracted from `e` before training — a vector the
    * caller's raw table still carries (the usual case: deletion
    * reached the index before the upstream table) can never be
    * resurrected by a drift-triggered retrain. Returns the new version
    * number. */
  def rebuild(e: DataFrame, name: String, cells: Int = AdaptiveCells): Long = {
    val spark = e.sparkSession
    import spark.implicits._
    val live = withoutDeleted(e, servingPrefix(spark, name), "vec_id")
    val next = currentVersion(spark, name) + 1L
    buildAt(live, prefixOf(name, next), resolveCells(live, cells))
    clearOrphanLocation(spark, versionTable(name))
    Seq(next).toDF("v").write.mode("overwrite")
      .saveAsTable(versionTable(name)) // THE swap: one 1-row commit
    dropVersionsExcept(spark, name, keep = next)
    next
  }

  /** Drop every artifact version except `keep` (catalog-listed, so
    * leaked versions from a crashed post-flip cleanup are swept too —
    * version-k table names match `<name>_v<k>_<suffix>` exactly). */
  private def dropVersionsExcept(spark: SparkSession, name: String,
                                 keep: Long): Unit = {
    val re = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(name) +
        "_v(\\d+)_(centroids|stats|codes|raw|bits|tombstones)")
    spark.catalog.listTables().collect().foreach { t =>
      val m = re.matcher(t.name)
      if (m.matches() && m.group(1).toLong != keep)
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}")
    }
    if (keep > 1L)
      Seq("centroids", "stats", "codes", "raw", "bits", "tombstones")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${name}_$s"))
  }

  /** [[rebuild]] gated on the drift signal: re-quantize only when the
    * LATEST committed drift row reports unseen-token/novel mass or KL
    * above the thresholds. Returns the new version when it fired. The
    * ledger row shape is `DriftMonitor.drifts` (batch_id, n_tokens,
    * n_unseen, kl). */
  def rebuildIfDrifted(e: DataFrame, name: String,
                       driftLedger: String, driftMarkers: String,
                       maxUnseenFrac: Double = 0.1,
                       maxKl: Double = 0.5): Option[Long] = {
    val spark = e.sparkSession
    val last = graft.streaming.DriftMonitor
      .drifts(spark, driftLedger, driftMarkers)
      .orderBy(col("batch_id").desc).limit(1).collect()
    val drifted = last.headOption.exists { r =>
      val n = r.getAs[Long]("n_tokens")
      val unseen = if (n == 0L) 0.0
        else r.getAs[Long]("n_unseen").toDouble / n
      unseen > maxUnseenFrac || r.getAs[Double]("kl") > maxKl
    }
    if (drifted) Some(rebuildPreservingGeometry(e, name)) else None
  }

  /** LIVE per-cell occupancy of the serving version (tombstones
    * subtracted) — a cells-sized collect, shared by [[rebalance]] and
    * the streaming `OccupancyMonitor`. */
  def liveOccupancy(spark: SparkSession, name: String): Map[Long, Long] = {
    val p = servingPrefix(spark, name)
    recoverCodesStaging(spark, p)
    if (!spark.catalog.tableExists(s"${p}_codes")) return Map.empty
    withoutDeleted(spark.table(s"${p}_codes"), p, "vec_id")
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** [[rebalance]] gated on the occupancy signal — the INPUT-shape
    * twin of [[rebuildIfRecallLow]]'s output gate: split only when the
    * LATEST committed `OccupancyMonitor` row alarms. Returns the split
    * cids when it fired. */
  def rebalanceIfSkewed(spark: SparkSession, name: String,
                        occLedger: String, occMarkers: String,
                        hotFactor: Double = 2.0): Seq[Long] = {
    val last = graft.streaming.OccupancyMonitor
      .profiles(spark, occLedger, occMarkers)
      .orderBy(col("batch_id").desc).limit(1).collect()
    if (last.headOption.exists(_.getAs[Boolean]("alarm")))
      rebalance(spark, name, hotFactor)
    else Nil
  }

  /** Member sample cap for computing a hot cell's two child centroids
    * — the SPLIT math runs on a bounded driver sample (lowest vec_ids,
    * deterministic); the member RE-ASSIGNMENT is distributed. */
  val RebalanceSampleRows = 10000

  /** Incremental cell REBALANCE — the cheap middle rung of the
    * maintenance ladder between a tombstone compact and a full
    * [[rebuild]]: every cell whose LIVE occupancy exceeds
    * `hotFactor`× the mean splits into two children, and the new
    * version copies every untouched partition AS-IS — zero assignment
    * or quantization compute outside the hot cells (a retrain is
    * O(n·assignment); this is O(copy) + O(hot members)). The split is
    * WITHIN-CELL by contract: each hot member goes to the nearer of
    * its own cell's two children (a local refinement — global argmin
    * optimality is restored by the next versioned rebuild; until then
    * probes see a finer partition of the same coverage). The SQ
    * codebook is per-dim GLOBAL, so the int8 codes stay valid
    * byte-for-byte — only the cid label moves. Installed through the
    * rebuild pointer-flip protocol, so a crash anywhere pre-flip
    * leaves the old version serving intact. Returns the split cids
    * (empty = nothing hot, no version consumed). */
  def rebalance(spark: SparkSession, name: String,
                hotFactor: Double = 2.0): Seq[Long] = {
    import spark.implicits._
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val p = servingPrefix(spark, name)
    recoverCodesStaging(spark, p)
    recoverPartitionedStaging(spark, s"${p}_raw")
    recoverPartitionedStaging(spark, s"${p}_bits")
    require(spark.catalog.tableExists(s"${p}_raw"),
      s"store '$name' has no raw-vector table: rebalance reads full " +
        "vectors to split a cell")
    val cent = collectCentroids(spark, s"${p}_centroids")
    checkGeometry(spark, p, cent.size)
    val occ = liveOccupancy(spark, name)
    val total = occ.values.sum
    if (total == 0L) return Nil
    // hotness is judged against the DESIGN occupancy (the adaptive
    // rule's target for this corpus size), NOT the current mean — a
    // mean-based threshold falls as splits add cells and chases
    // itself into splitting everything (observed: 12 rounds without
    // convergence on a 70%-skewed corpus)
    val target = math.max(1L,
      total / math.max(Cells.toLong, total / CellTarget))
    val hot = occ.filter(_._2.toDouble > hotFactor * target)
      .keys.toSeq.sorted
    if (hot.isEmpty) return Nil
    // children from a bounded lowest-id member sample per hot cell —
    // ONE windowed job for every hot cell at once (a per-cell
    // collect loop pays per-job overhead × hot cells, the
    // ComponentMaintenance fold-cadence lesson: measured 35.9 s for
    // 100 hot cells vs a full 200-cell rebuild's 11.2 s); the per-cell
    // sample shrinks when many cells are hot so the driver collect
    // stays bounded whatever the hot count. Child A REPLACES the hot
    // cell's centroid, child B appends.
    val perCell = math.max(256,
      RebalanceSampleRows / math.max(1, hot.size))
    val wSample = Window.partitionBy("cid").orderBy("vec_id")
    val samples = spark.table(s"${p}_raw")
      .filter(col("cid").isin(hot: _*))
      .withColumn("rn", row_number().over(wSample))
      .filter(col("rn") <= perCell)
      .select("cid", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    var nextCid = cent.map(_._1).max + 1L
    val centMap = scala.collection.mutable.LinkedHashMap(
      cent.map(c => c._1 -> c._2): _*)
    val childOf = hot.map { c =>
      val (a, b) = splitCell(samples(c))
      val bCid = nextCid; nextCid += 1L
      centMap(c) = a.toSeq
      centMap(bCid) = b.toSeq
      c -> bCid
    }.toMap
    // distributed within-cell re-assignment of the hot members only —
    // again ONE job: the children broadcast as a per-cid row and the
    // nearer-child pick is the codegen'd L2 expression (no per-cell
    // assignCells union, whose plan grew a leg per hot cell)
    val children = childOf.toSeq.map { case (c, bCid) =>
      (c, centMap(c), bCid, centMap(bCid)) }
      .toDF("cid", "ace", "bcid", "bce")
    val moves = spark.table(s"${p}_raw")
      .filter(col("cid").isin(hot: _*))
      .join(broadcast(children), Seq("cid"))
      .select(col("vec_id"),
        when(VectorFunctions.l2DistanceSq(col("vec"), col("ace")) <=
             VectorFunctions.l2DistanceSq(col("vec"), col("bce")),
          col("cid")).otherwise(col("bcid")).as("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val next = currentVersion(spark, name) + 1L
      val np = prefixOf(name, next)
      Seq("centroids", "stats", "codes", "raw", "bits", "tombstones")
        .foreach(t => clearOrphanLocation(spark, s"${np}_$t"))
      centMap.toSeq.toDF("cid", "ce")
        .write.mode("overwrite").saveAsTable(s"${np}_centroids")
      // codebook and assign_mode are untouched — only the cell count
      // moves, so the recorded geometry tracks the new centroid set
      spark.table(s"${p}_stats")
        .withColumn("cells", lit(centMap.size.toLong))
        .write.mode("overwrite").saveAsTable(s"${np}_stats")
      Seq("codes", "raw", "bits").foreach { t =>
        if (spark.catalog.tableExists(s"${p}_$t")) {
          val full = spark.table(s"${p}_$t")
          val untouched = full.filter(!col("cid").isin(hot: _*))
          val moved = full.filter(col("cid").isin(hot: _*))
            .drop("cid").join(moves, Seq("vec_id"))
          untouched.unionByName(moved, allowMissingColumns = false)
            .repartition(col("cid"))
            .write.mode("overwrite").partitionBy("cid")
            .saveAsTable(s"${np}_$t")
        }
      }
      val tomb = tombstoneTable(p)
      if (spark.catalog.tableExists(tomb))
        spark.table(tomb).write.mode("overwrite")
          .saveAsTable(tombstoneTable(np))
      clearOrphanLocation(spark, versionTable(name))
      Seq(next).toDF("v").write.mode("overwrite")
        .saveAsTable(versionTable(name)) // THE flip
      dropVersionsExcept(spark, name, keep = next)
      hot
    } finally moves.unpersist()
  }

  /** Deterministic MEDIAN-PROJECTION split over a bounded sample:
    * children = the means of the two rank-halves of the sample,
    * ordered by projection onto (farthest member − sample mean). A
    * 2-means split degenerates on dense high-dimensional balls
    * (distance concentration: the boundary sheds only outliers —
    * observed converging ~3 members/round on a 64-d Gaussian cell);
    * the rank split halves the SAMPLE by construction, so the
    * children's perpendicular bisector passes near the ball's center
    * and the distributed nearest-child assignment lands ~half the
    * members each. An all-identical sample degenerates to A = B —
    * every member keeps the lower cid (the argmin tiebreak) and the
    * empty child is harmless. */
  private def splitCell(sample: Array[Array[Double]])
      : (Array[Double], Array[Double]) = {
    require(sample.nonEmpty, "empty rebalance sample")
    val n = sample.length
    val dim = sample(0).length
    def meanOf(xs: Seq[Array[Double]]): Array[Double] = {
      val s = new Array[Double](dim)
      xs.foreach { v =>
        var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
      }
      s.map(_ / math.max(1, xs.size))
    }
    val mean = meanOf(sample.toSeq)
    def d2FromMean(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = v(i) - mean(i); s += d * d; i += 1 }
      s
    }
    val far = sample(sample.indices.maxBy(i => d2FromMean(sample(i))))
    val dir = far.indices.map(i => far(i) - mean(i)).toArray
    if (dir.forall(_ == 0.0)) return (mean, mean)
    def proj(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += (v(i) - mean(i)) * dir(i); i += 1 }
      s
    }
    val order = sample.zipWithIndex
      .sortBy { case (v, i) => (proj(v), i) }.map(_._1)
    val (lo, hi) = order.splitAt(n / 2)
    if (lo.isEmpty || hi.isEmpty) (mean, mean)
    else (meanOf(lo.toSeq), meanOf(hi.toSeq))
  }

  /** The gated-rebuild geometry contract: an alarm-triggered retrain
    * keeps the SERVING artifact's cell count (a store deliberately
    * built at hundreds of cells must not silently shrink to the
    * adaptive default), but never drops BELOW the adaptive rule for
    * the current corpus — drift usually means growth, and occupancy
    * is the thing the cell count exists to bound. */
  private def rebuildPreservingGeometry(e: DataFrame, name: String): Long = {
    val spark = e.sparkSession
    val keep = servingCells(spark, name).getOrElse(Cells)
    rebuild(e, name, math.max(keep, resolveCells(e, AdaptiveCells)))
  }

  /** [[rebuild]] gated on the serving-quality signal — the OUTPUT half
    * of the drift→rebuild arc ([[rebuildIfDrifted]] watches the INPUT
    * distribution): fire when the LATEST committed
    * [[graft.streaming.RecallMonitor]] row raised its alarm, i.e. the
    * quantized serving path measurably lost the arriving probes (a
    * stale codebook clamps drifted vectors onto the range corner long
    * before any input histogram names a cause). The retrain runs on
    * `e` — the CURRENT vector population, drift included — so the new
    * codebook's per-dim range spans what serving actually faces.
    * Returns the new version when it fired. */
  def rebuildIfRecallLow(e: DataFrame, name: String,
                         recallLedger: String,
                         recallMarkers: String): Option[Long] = {
    val spark = e.sparkSession
    val last = graft.streaming.RecallMonitor
      .recalls(spark, recallLedger, recallMarkers)
      .orderBy(col("batch_id").desc).limit(1).collect()
    if (last.headOption.exists(_.getAs[Boolean]("alarm")))
      Some(rebuildPreservingGeometry(e, name))
    else None
  }

  /** Ingest new vectors into a built store: assign + quantize with the
    * STORED centroids and codebook (never retrained per batch — the
    * IndexMaintenance append contract: unique vec_ids, and the
    * artifact stays self-consistent because every code in it was
    * produced by the same codebook). Codebook drift — new data outside
    * the recorded per-dim [min, max] — saturates at the range edge
    * inside `sqQuantize`; [[rebuild]] when drift matters (the appended
    * codes land in the CURRENT version, so ingest replayed after a
    * rebuild re-quantizes under the new codebook). */
  def append(newVecs: DataFrame, name: String): Unit = {
    val spark = newVecs.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val p = servingPrefix(spark, name)
    recoverCodesStaging(spark, p)
    val cent = collectCentroids(spark, s"${p}_centroids")
    checkGeometry(spark, p, cent.size)
    codesOf(newVecs, spark.table(s"${p}_stats"), cent)
      .select(col("vec_id"), col("code"), col("cid"))
      .write.mode("append").partitionBy("cid")
      .saveAsTable(s"${p}_codes")
    // raw side rides along (legacy codes-only stores skip it — they
    // predate the refine surface and refuse in serveTopKRefined)
    if (spark.catalog.tableExists(s"${p}_raw")) {
      recoverPartitionedStaging(spark, s"${p}_raw")
      rawOf(newVecs, cent)
        .write.mode("append").partitionBy("cid")
        .saveAsTable(s"${p}_raw")
    }
    // bit side too (stores predating the binary surface skip it and
    // refuse in serveTopKBinary — the raw-side convention)
    if (spark.catalog.tableExists(s"${p}_bits")) {
      recoverPartitionedStaging(spark, s"${p}_bits")
      bitsOf(newVecs, cent)
        .write.mode("append").partitionBy("cid")
        .saveAsTable(s"${p}_bits")
    }
  }

  /** Install a fully-written staged codes table as the live one and
    * drop the staging copy — by COPY, not `ALTER TABLE RENAME`: the
    * in-memory catalog's rename keeps each PARTITION's location
    * pointing at the old path (the SubstringDedup.swapFromStaging
    * rationale), silently emptying a partitioned table. Crash-safe:
    * the overwrite internally drops then recreates the live table, so
    * a crash mid-copy leaves no live table and an intact staged one —
    * [[recoverCodesStaging]] re-runs this swap; a crash after the copy
    * but before the staging drop leaves both, the live one wins and
    * the next compact overwrites the leftover. */
  private[graft] def swapCodesFromStaging(spark: SparkSession,
                                          prefix: String): Unit =
    swapPartitionedFromStaging(spark, s"${prefix}_codes")

  /** Crash recovery for the codes stage-then-swap: no live codes table
    * but a complete staged one means the swap died mid-copy — re-run
    * it. Called by every entry point that reads or writes the codes
    * table. */
  private[graft] def recoverCodesStaging(spark: SparkSession,
                                         prefix: String): Unit =
    recoverPartitionedStaging(spark, s"${prefix}_codes")

  /** Install a fully-written staged cid-partitioned table as the live
    * one (codes or raw) — by COPY, not rename (see
    * [[swapCodesFromStaging]]'s rationale on the in-memory catalog's
    * partition-location pitfall). */
  private[graft] def swapPartitionedFromStaging(spark: SparkSession,
                                                table: String): Unit = {
    spark.table(table + "_staging")
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").saveAsTable(table)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_staging")
  }

  private[graft] def recoverPartitionedStaging(spark: SparkSession,
                                               table: String): Unit =
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(table + "_staging"))
      swapPartitionedFromStaging(spark, table)

  private def collectCentroids(spark: SparkSession,
                               table: String): Seq[(Long, Seq[Double])] =
    Similarity.collectCentroids(spark.table(table))

  /** Cross-check the artifact's two geometry records — the centroids
    * table (what serving derives the cell set from) and the stats
    * row's recorded build `cells` (absent on pre-geometry stores,
    * where the check passes vacuously) — and refuse a store whose
    * records disagree: that is a torn build, and silently serving it
    * would score candidates against the wrong coarse quantizer. */
  private def checkGeometry(spark: SparkSession, prefix: String,
                            nCentroids: Int): Unit = {
    val st = s"${prefix}_stats"
    if (spark.catalog.tableExists(st) &&
        spark.table(st).columns.contains("cells")) {
      val recorded = spark.table(st).select("cells").head.getLong(0)
      require(recorded == nCentroids.toLong,
        s"store '$prefix' geometry mismatch: stats row records " +
          s"$recorded cells but the centroids table has $nCentroids — " +
          "torn build; rebuild the store")
    }
  }

  // ---- Deletion -----------------------------------------------------
  // The IndexMaintenance tombstone protocol, vector-side: a delete
  // never rewrites the cid-partitioned code table (an O(artifact) job
  // for an O(1) request — and the GDPR/erasure path must be cheap
  // enough to run on every request, not batched into rebuilds). Ids
  // are appended to a per-version tombstone side table; serving
  // subtracts them with one BROADCAST anti-join before scoring, so the
  // partition-pruned candidate read keeps its shape and per-probe
  // verify work SHRINKS. Physical purge rides the existing compaction
  // rewrite; [[rebuild]] subtracts tombstones from its training frame,
  // so deletion survives re-quantization too.

  private def tombstoneTable(prefix: String): String = s"${prefix}_tombstones"

  /** Tombstone `vecIds` in the SERVING version of the store — O(ids),
    * never O(artifact). Idempotent: already-tombstoned ids are
    * dropped, so a replayed delete request appends nothing. Callers
    * pass ids that exist in the store; tombstoning an absent id is
    * harmless (the anti-join never finds it). */
  def deleteVecs(spark: SparkSession, vecIds: Seq[Long],
                 name: String): Unit = {
    import spark.implicits._
    if (vecIds.nonEmpty) {
      val t = tombstoneTable(servingPrefix(spark, name))
      val requested = vecIds.distinct.toDF("vec_id")
      val fresh =
        if (spark.catalog.tableExists(t))
          requested.join(spark.table(t), Seq("vec_id"), "left_anti")
        else requested
      if (!fresh.isEmpty) {
        clearOrphanLocation(spark, t) // append CREATES on first delete
        fresh.write.mode("append").saveAsTable(t)
      }
    }
  }

  /** Of `ids`, those still PRESENT in the serving codes table —
    * tombstoned or not. The erasure enforce filter: tombstoning an id
    * the codes no longer carry would make every post-compaction
    * enforce replay resurrect the tombstone table with already-purged
    * ids (unbounded by pending work, and never cleared again). The
    * probe is one broadcast semi-join of the request-sized id set
    * against the codes scan. */
  private[graft] def presentIn(spark: SparkSession, ids: Seq[Long],
                               name: String): Seq[Long] = {
    import spark.implicits._
    if (ids.isEmpty) return Nil
    val p = servingPrefix(spark, name)
    recoverCodesStaging(spark, p)
    if (!spark.catalog.tableExists(s"${p}_codes")) Nil
    else spark.table(s"${p}_codes").select("vec_id")
      .join(broadcast(ids.distinct.toDF("vec_id")), Seq("vec_id"),
        "left_semi")
      .distinct().as[Long].collect().toSeq
  }

  /** Subtract `prefix`'s tombstones from `df` (on `idCol`) via a
    * broadcast anti-join; pass-through when none exist. The tombstone
    * set is small by construction — compaction clears it. */
  private def withoutDeleted(df: DataFrame, prefix: String,
                             idCol: String): DataFrame = {
    val spark = df.sparkSession
    val t = tombstoneTable(prefix)
    if (!spark.catalog.tableExists(t)) df
    else df.join(
      broadcast(spark.table(t).select(col("vec_id").as(idCol))),
      Seq(idCol), "left_anti")
  }

  /** Physical PURGE of tombstoned codes — called from the compaction
    * rewrite (`VectorMaintenance.compact`), which is already rewriting
    * every cell's files: the purge is a free anti-join folded into
    * that rewrite, never a standalone job. Clearing the tombstone
    * table afterwards returns serving to a pass-through; a crash
    * before the clear leaves tombstones anti-joining already-purged
    * ids — a no-op, cleared by the next compact. */
  private[graft] def purgedCodes(spark: SparkSession,
                                 prefix: String): DataFrame =
    withoutDeleted(spark.table(s"${prefix}_codes"), prefix, "vec_id")

  /** Raw-side purge for the compaction rewrite. The raw table is where
    * the erasure path MATTERS most: codes are lossy 8-bit projections,
    * but `_raw` carries the actual embedding — compaction must rewrite
    * it minus tombstones or the deleted payload survives on disk. */
  private[graft] def purgedRaw(spark: SparkSession,
                               prefix: String): DataFrame =
    withoutDeleted(spark.table(s"${prefix}_raw"), prefix, "vec_id")

  /** Bit-side purge for the compaction rewrite — sign words are lossy
    * 1-bit projections, but an erased vector's id must not survive in
    * ANY artifact table (the ErasureSweepSpec contract). */
  private[graft] def purgedBits(spark: SparkSession,
                                prefix: String): DataFrame =
    withoutDeleted(spark.table(s"${prefix}_bits"), prefix, "vec_id")

  private[graft] def clearTombstones(spark: SparkSession,
                                     prefix: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${tombstoneTable(prefix)}")

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
    val scored = scoredCandidates(probes, name, nprobe)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** [[serveTopK]] under a PRE-search eligibility predicate — sm14's
    * filtered-ANN contract served from the ARTIFACT (the production
    * "nearest neighbors WHERE ..." surface): `eligible` evaluates
    * against the code table's own columns (vec_id/cid) and is applied
    * BEFORE scoring, so the cid equi-join only ever sees eligible
    * candidates and every probe gets a full k of ELIGIBLE neighbors —
    * post-filtering an unfiltered top-k would silently return fewer
    * and lose exactly the rows the filter was meant to surface.
    * Scale shape: the predicate fuses into the partition-pruned codes
    * SCAN (a map-side filter, no join, no extra shuffle), so per-probe
    * verify work SHRINKS with selectivity; a predicate over attributes
    * the artifact does not carry routes through the caller as an id
    * frame semi-joined upstream (the corpus-sized fallback — document
    * the attribute into the code table instead when it is hot). */
  def serveTopKFiltered(probes: DataFrame, name: String,
                        eligible: Column, nprobe: Int = NProbe,
                        k: Int = TopK, widenTo: Int = 0): DataFrame = {
    if (widenTo <= nprobe)
      rankTopK(scoredCandidates(probes, name, nprobe, Some(eligible)), k)
        .orderBy("probe_id", "rank")
    else serveTopKWidening(probes, name, eligible, nprobe, k, widenTo)
  }

  /** The auto-widen loop behind [[serveTopKFiltered]]'s `widenTo`
    * (round-17 verdict #2): at extreme selectivity a probe's base
    * `nprobe` cells may hold fewer than `k` eligible vectors (the
    * measured 1%-selectivity short-k arc, SURVEY §6) — the fix
    * RE-PROBES exactly the short probes with a doubled nprobe,
    * bounded by `widenTo`, leaving full probes' results (and cost)
    * untouched: each widening round scores ONLY the still-short
    * probes' cells, and a probe whose round returned a full k never
    * re-enters. Per-probe semantics: results come from the FIRST
    * doubling level whose probed cells hold ≥ k eligible candidates
    * (or from the `widenTo` cap) — the sm28 oracle mirrors exactly
    * this rule. The level decision is a per-round driver read of
    * per-probe row counts: probes are request-sized by the serving
    * contract, and rounds are log2(widenTo/nprobe)-bounded, so the
    * control-plane cost is (probes × log) rows — never corpus-scale.
    * Each round's frame is localCheckpointed: it is read twice (count
    * + final union) and must not re-score on the second read. */
  private def serveTopKWidening(probes: DataFrame, name: String,
                                eligible: Column, nprobe: Int, k: Int,
                                widenTo: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    var np = nprobe
    var remaining = probes
    var current = rankTopK(
      scoredCandidates(remaining, name, np, Some(eligible)), k)
      .localCheckpoint(true)
    var finalized: Option[DataFrame] = None
    var continue = true
    while (continue && np < widenTo) {
      val shortIds = remaining.select("probe_id")
        .join(current.groupBy("probe_id").count(), Seq("probe_id"), "left")
        .filter(coalesce(col("count"), lit(0L)) < k)
        .select("probe_id").as[Long].collect().toSeq
      if (shortIds.isEmpty) continue = false
      else {
        val full = current.filter(!col("probe_id").isin(shortIds: _*))
        finalized = Some(finalized.map(_.union(full)).getOrElse(full))
        remaining = remaining.filter(col("probe_id").isin(shortIds: _*))
        np = math.min(np * 2, widenTo)
        current = rankTopK(
          scoredCandidates(remaining, name, np, Some(eligible)), k)
          .localCheckpoint(true)
      }
    }
    finalized.map(_.union(current)).getOrElse(current)
      .orderBy("probe_id", "rank")
  }

  /** Shared per-probe ranking tail of the serve surfaces: rank by
    * cosine desc (neighbor_id tiebreak), keep ≤ k. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** HARD-NEGATIVE mining from the artifact (the contrastive-training
    * pair surface): per probe, the top-`k` candidates whose cosine —
    * ROUNDED to 6dp, so the band edges can never ULP-flip between
    * engines (the dd21 convention) — sits inside [lo, hi]. `hi`
    * excludes suspected positives/duplicates (too close to be a
    * negative), `lo` excludes uninformative easy negatives; what
    * remains is exactly the "semantically close but wrong" band
    * contrastive recipes want. Same candidate pipeline as
    * [[serveTopK]] (partition-pruned cells, tombstones subtracted,
    * self excluded) — the band is a filter before the rank window, so
    * per-probe output stays ≤ k whatever the band density. */
  def serveHardNegatives(probes: DataFrame, name: String,
                         lo: Double, hi: Double,
                         nprobe: Int = NProbe, k: Int = TopK): DataFrame = {
    import graft.functions.ParityFunctions.duckRound
    val scored = scoredCandidates(probes, name, nprobe)
      .filter(duckRound(col("cosine"), 6).between(lo, hi))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** Shared candidate-scoring stage of [[serveTopK]] /
    * [[serveHardNegatives]] / [[serveTopKFiltered]]: (probe_id,
    * neighbor_id, cosine) for every live candidate in the probes'
    * pruned cells, self excluded, cosine UNROUNDED; `eligible` (a
    * predicate over the code table's columns) narrows the candidate
    * pool map-side BEFORE any join or scoring. */
  private def scoredCandidates(probes: DataFrame, name: String,
                               nprobe: Int,
                               eligible: Option[Column] = None): DataFrame = {
    val spark = probes.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val p = servingPrefix(spark, name) // pointer first: version-atomic
    recoverCodesStaging(spark, p)
    val cent = collectCentroids(spark, s"${p}_centroids")
    checkGeometry(spark, p, cent.size)
    // persisted: the request-sized probe frame fans out to the cell
    // projection AND the candidate join — unpersisted, each consumer
    // re-ran the probe derivation (an embeddings/probe-table scan).
    // Callers own the cache lifecycle (the Q.scala convention).
    val pp = probes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcells = Similarity.nearestCells(
      pp.select(col("probe_id"), col("pe").as("embedding")),
      "probe_id", "embedding", cent, nprobe)
    val pool = withoutDeleted(spark.table(s"${p}_codes"), p, "vec_id")
    eligible.map(pool.filter).getOrElse(pool)
      .join(pcells, Seq("cid"))
      .join(pp, Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .crossJoin(broadcast(spark.table(s"${p}_stats")
        .select("mns", "mxs")))
      .select(col("probe_id"), col("pe"), col("vec_id"),
        VectorFunctions.sqDequantize(col("code"), col("mns"), col("mxs"))
          .as("deq"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("pe"), col("deq")).as("cosine"))
  }

  /** [[serveTopK]] plus an exact REFINE stage — the sm17 "SQ + refine"
    * composition served from the ARTIFACT: the quantized scan ranks a
    * per-probe `shortlist` from the partition-pruned codes, then the
    * full-precision vectors for only those ≤ |probes|×shortlist rows
    * are fetched from the cid-partitioned `_raw` table (broadcast
    * semi-fetch — the bounded shortlist broadcasts into the raw scan,
    * never the reverse) and re-scored exactly. Output adds `qrank`
    * (the quantized rank) next to `rank`, so the result exhibits the
    * reorderings the refine performed. Tombstones are subtracted at
    * stage 1, so a deleted vector is neither scored nor fetched.
    * Refuses a codes-only legacy store loudly: serving a refine
    * surface without raw vectors would silently degrade to quantized
    * ranks. */
  def serveTopKRefined(probes: DataFrame, name: String,
                       nprobe: Int = NProbe, shortlist: Int = 50,
                       k: Int = TopK): DataFrame = {
    val spark = probes.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val p = servingPrefix(spark, name)
    recoverCodesStaging(spark, p)
    recoverPartitionedStaging(spark, s"${p}_raw")
    require(spark.catalog.tableExists(s"${p}_raw"),
      s"store '$name' has no raw-vector table (built before the refine " +
        "surface): rebuild it to serve refined top-k")
    val cent = collectCentroids(spark, s"${p}_centroids")
    checkGeometry(spark, p, cent.size)
    // persisted: probes has THREE consumers here (cell projection,
    // candidate join, exact-refine join) — unpersisted, each re-ran
    // the probe derivation. Callers own the cache lifecycle.
    val pp = probes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcells = Similarity.nearestCells(
      pp.select(col("probe_id"), col("pe").as("embedding")),
      "probe_id", "embedding", cent, nprobe)
    val cand = withoutDeleted(spark.table(s"${p}_codes"), p, "vec_id")
      .join(pcells, Seq("cid"))
      .join(pp, Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .crossJoin(broadcast(spark.table(s"${p}_stats")
        .select("mns", "mxs")))
    val qscored = cand
      .select(col("probe_id"), col("cid"), col("vec_id"),
        VectorFunctions.cosine(col("pe"),
          VectorFunctions.sqDequantize(col("code"), col("mns"), col("mxs")))
          .as("qcos"))
    val wq = Window.partitionBy("probe_id")
      .orderBy(col("qcos").desc, col("vec_id"))
    val short = qscored.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= shortlist)
      .select("probe_id", "cid", "vec_id", "qrank")
    val refined = spark.table(s"${p}_raw")
      .join(broadcast(short), Seq("cid", "vec_id"))
      .join(pp, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("qrank"),
        VectorFunctions.cosine(col("pe"), col("vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    refined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "qrank", "cosine")
      .orderBy("probe_id", "rank")
  }

  /** BINARY-quantization serving (the sm24 composition from the
    * ARTIFACT — the cheapest serving rung, below [[serveTopKRefined]]'s
    * int8 scan): stage 1 ranks a per-probe `shortlist` by HAMMING
    * distance over the partition-pruned `_bits` table — XOR + popcount
    * on two BIGINT words per candidate, 16 bytes/vector where the int8
    * codes take 64, the structure a deployment keeps RAM-resident when
    * even the code table doesn't fit — stage 2 fetches full-precision
    * vectors for only the ≤ |probes|×shortlist rows from `_raw` and
    * re-scores exactly. Output adds `hrank`/`hamming` next to `rank`
    * (the reorderings the refine performed). Tombstones subtracted at
    * stage 1; refuses a store predating the bit surface loudly (the
    * serveTopKRefined raw-side convention). Probe words derive from
    * the probe embedding with the same constant-0.0 sign rule the
    * build used. */
  def serveTopKBinary(probes: DataFrame, name: String,
                      nprobe: Int = NProbe, shortlist: Int = 50,
                      k: Int = TopK): DataFrame = {
    val spark = probes.sparkSession
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    val p = servingPrefix(spark, name)
    recoverPartitionedStaging(spark, s"${p}_bits")
    recoverPartitionedStaging(spark, s"${p}_raw")
    require(spark.catalog.tableExists(s"${p}_bits"),
      s"store '$name' has no bit table (built before the binary " +
        "surface): rebuild it to serve binary top-k")
    require(spark.catalog.tableExists(s"${p}_raw"),
      s"store '$name' has no raw-vector table: rebuild it to serve " +
        "binary top-k (the refine stage reads full-precision vectors)")
    val cent = collectCentroids(spark, s"${p}_centroids")
    checkGeometry(spark, p, cent.size)
    // persisted: probes has THREE consumers here (cell projection,
    // probe sign-words, exact-refine join) — unpersisted, each re-ran
    // the probe derivation. Callers own the cache lifecycle.
    val pp = probes
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pcells = Similarity.nearestCells(
      pp.select(col("probe_id"), col("pe").as("embedding")),
      "probe_id", "embedding", cent, nprobe)
    val pw = pp.select(col("probe_id"),
      VectorFunctions.signWord(col("pe"), 0).as("q0"),
      VectorFunctions.signWord(col("pe"), 32).as("q1"))
    val hscored = withoutDeleted(spark.table(s"${p}_bits"), p, "vec_id")
      .join(pcells, Seq("cid"))
      .join(broadcast(pw), Seq("probe_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cid"), col("vec_id"),
        VectorFunctions.hamming2(col("w0"), col("w1"),
          col("q0"), col("q1")).as("ham"))
    val wh = Window.partitionBy("probe_id")
      .orderBy(col("ham"), col("vec_id"))
    val short = hscored.withColumn("hrank", row_number().over(wh))
      .filter(col("hrank") <= shortlist)
      .select("probe_id", "cid", "vec_id", "ham", "hrank")
    val refined = spark.table(s"${p}_raw")
      .join(broadcast(short), Seq("cid", "vec_id"))
      .join(pp, Seq("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("ham"), col("hrank"),
        VectorFunctions.cosine(col("pe"), col("vec")).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    refined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "hrank", "ham", "cosine")
      .orderBy("probe_id", "rank")
  }
}
