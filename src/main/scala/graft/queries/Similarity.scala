package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables
import graft.functions.ParityFunctions.duckRound
import graft.functions.VectorFunctions._

/** Similarity search over `embeddings.embedding` (array<float>, dim 64) —
  * the north-star ANN surface:
  *
  *   - sm01: brute-force cosine top-k per probe — the exactness baseline.
  *     O(probes × corpus); fine when the probe set is small, and the
  *     cosine itself is one codegen'd fold (no UDF).
  *   - sm02: random-hyperplane LSH — signature → band equi-join
  *     candidates → cosine verify on candidates only. Same shape as
  *     dd03's MinHash banding: at 100 TB the candidate join is a plain
  *     shuffle-hash equi-join, never an all-pairs cross join.
  *
  * Oracle determinism: Spark's `aggregate()` and DuckDB's `list_reduce`
  * are both sequential left folds, and both sides promote float→double
  * element-wise before multiplying, so the pre-rounding doubles are
  * bit-identical and ranks/rounded values hash-match exactly.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    tables.load(s, dir, "embeddings") // registers the graft expressions

  /** DuckDB mirror of VectorFunctions.dot: element-wise double product,
    * sequential left fold from 0.0. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, x) -> acc + x)"

  private[queries] def cosineSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) = 0 THEN 0.0 " +
      s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"

  /** DuckDB mirror of VectorFunctions.hyperplaneBit's weighted fold. */
  private def planeDotSql(v: String, p: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(0, len($v)), d -> CAST($v[d + 1] AS DOUBLE) * " +
      s"CAST((1 + (${p * 31} + d * 7) % 97) - 49 AS DOUBLE))), (acc, x) -> acc + x)"

  /** 60-bit hyperplane signature banded as 5×12 bits (round-13 scale
    * lesson, the dd04 finding's vector twin): the original 16-bit
    * signature banded by BYTE had 256 buckets per band, making LSH
    * candidate volume ~2·n²/256 — quadratic in corpus size with a
    * fixed denominator. On the varied 100× corpus (200k genuinely
    * distinct vectors) candidate generation spilled past the disk
    * (dd07 and sm02 both died SPILL_OUT_OF_MEMORY). 12-bit bands give
    * 4096 buckets (16×), and FIVE bands raise near-clone recall at the
    * same time (cos .99: P(band) = .955¹² ≈ .58, miss all five ≈ 1.3%
    * vs the old two-byte-band ~10%). Still ~n²/4096 asymptotically —
    * banding over a FIXED key space can never be corpus-size-free
    * (dd03's MinHash band keys grow with content; these don't), so at
    * larger corpora widen again: these two constants are the knob. */
  private val SigBits = 60
  private val SigBands = 5
  private val BandBits = 12
  private val NearDupCos = 0.4 // dd07 near-dup threshold (corpus-calibrated)

  /** Shared DuckDB CTE chain ending in `scored(vec_a, vec_b, c)` — the
    * hyperplane-LSH banded candidate pairs with exact (unrounded)
    * cosine over `base` (a relation with vec_id, embedding). sm02
    * selects its report off it (over the dd12 semantic survivors);
    * dd07 feeds it into the connected-components dedup oracle; the
    * raw twins pass `embeddings`. */
  private def hyperplaneScoredCtes(base: String): String = {
    val sigTerms = (0 until SigBits)
      .map(p => s"(CASE WHEN ${planeDotSql("embedding", p)} >= 0 THEN ${1L << p} ELSE 0 END)")
      .mkString("\n         |      + ")
    val cos = cosineSql("ea.embedding", "eb.embedding")
    s"""sigs AS (
       |  SELECT vec_id, CAST(
       |        $sigTerms AS BIGINT) AS sig
       |  FROM $base),
       |bands AS (
       |  SELECT vec_id, sig, band, (sig >> (band * $BandBits)) & ${(1 << BandBits) - 1} AS key
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, $SigBands)) AS band)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.vec_a, c.vec_b, $cos AS c
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_a
       |  JOIN embeddings eb ON eb.vec_id = c.vec_b)"""
  }

  /** DuckDB CTE chain ending in `semsurv` = the dd12 SEMANTIC-dedup
    * survivors (full embeddings rows minus every vector a lower-id
    * in-cell vector covers at cosine ≥ τ) — the enforced FIRST stage
    * of the pair-materializing hyperplane paths (sm02/dd07), the dd04
    * exact-survivors precedent lifted to embedding space: a dense
    * similarity clique contributes ONE representative to the band
    * join, so pair output tracks genuine cross-cluster structure
    * instead of clique size squared. */
  private def semanticSurvivorCtes: String = {
    val dist = l2SqSql("e.embedding", "c.ce")
    val cos = cosineSql("ea.embedding", "eb.embedding")
    s"""cent AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |  WHERE vec_id < $AdaptiveCellsSql),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dist, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |spairs AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM assign a JOIN assign b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |sdrop AS (
       |  SELECT DISTINCT p.vb AS vec_id
       |  FROM spairs p
       |  JOIN embeddings ea ON ea.vec_id = p.va
       |  JOIN embeddings eb ON eb.vec_id = p.vb
       |  WHERE $cos >= $NearDupCos),
       |semsurv AS (
       |  SELECT e.* FROM embeddings e
       |  LEFT JOIN sdrop d ON d.vec_id = e.vec_id
       |  WHERE d.vec_id IS NULL)"""
  }

  /** The dd12 semantic-dedup survivor frame `(vec_id, embedding,
    * label)` — Spark side of [[semanticSurvivorCtes]], built from the
    * exact constructions dd12's oracle-checked query runs. */
  private def semanticSurvivors(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cent = collectCentroids(e.filter(col("vec_id") < adaptiveCells(e))
      .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val assign = nearestCells(e.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", cent, 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // embeddings pre-cast to double ONCE PER VECTOR: the within-cell
    // pair filter otherwise re-casts both float arrays per PAIR inside
    // dot() — ~2 casts × |pairs| (250k pairs at sf0.1) instead of
    // |vectors|; float→double is exact, so the fold is bit-identical
    val en = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val nrm = col("na") * col("nb")
    val dropped = assign.select(col("vec_id").as("va"), col("cid"))
      .join(assign.select(col("vec_id").as("vb"), col("cid")), Seq("cid"))
      .filter(col("va") < col("vb"))
      .join(en.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("nrm").as("na")), Seq("va"))
      .join(en.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("nrm").as("nb")), Seq("vb"))
      .filter(when(nrm === 0.0, lit(0.0))
        .otherwise(dot(col("ea"), col("eb")) / nrm) >= NearDupCos)
      .select(col("vb").as("vec_id")).distinct()
    e.join(dropped, Seq("vec_id"), "left_anti")
      .select("vec_id", "embedding", "label")
  }

  /** Hyperplane-LSH candidate pairs with raw cosine `(vec_a, vec_b,
    * cos)` over `e` (vec_id, embedding, ...) — sm02's chain: codegen'd
    * fused signature, band equi-join candidates (never all-pairs),
    * cosine verified on candidates only with per-side precomputed
    * norms and the cosine evaluated once (withColumn) instead of per
    * filter + per projection.
    */
  private def hyperplaneScored(e: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // dim=64 (FIXTURES.md): constant-literal hyperplanes, one
    // zip_with+fold per bit instead of per-row plane generation.
    // persist: the band self-join reuses sigs on both sides.
    val sigs = e.select(col("vec_id"),
      hyperplaneSignature(col("embedding"), SigBits, 64).cast("long").as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = graft.operators.Banding.candidatePairs(sigs, "vec_id",
      (0 until SigBands).map(band =>
        lit(band) -> shiftright(col("sig"), band * BandBits)
          .bitwiseAND(lit(((1L << BandBits) - 1)))))
      .withColumnRenamed("vec_id_a", "vec_a")
      .withColumnRenamed("vec_id_b", "vec_b")
    // not persisted: same float-array cache tax as sm01 — two scans
    // of the (small) embeddings table win. Pre-cast to double once per
    // vector so the per-candidate cosine doesn't re-cast per pair
    // (the semanticSurvivors note).
    val en = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val n = col("na") * col("nb")
    cand
      .join(en.select(col("vec_id").as("vec_a"), col("embedding").as("va"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(en.select(col("vec_id").as("vec_b"), col("embedding").as("vb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cos", when(n === 0.0, lit(0.0))
        .otherwise(dot(col("va"), col("vb")) / n))
  }

  /** DuckDB mirror of VectorFunctions.l2DistanceSq. */
  private[queries] def l2SqSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)))), " +
      s"(acc, x) -> acc + x)"

  private val IvfCells = 8 // fixed coarse centroids (vec_id < 8)
  private val IvfNProbe = 2 // cells searched per probe

  /** Target expected cell occupancy for the operators whose INTERNAL
    * work is per-cell QUADRATIC (dd12's within-cell pairs, pl25's
    * cell equi-join candidates): cells = max(8, n / CellTarget) holds
    * occupancy at ~CellTarget whatever the corpus size, so per-cell
    * pair volume stays ~C(CellTarget, 2) · cells — LINEAR in n — where
    * a fixed cell count makes it n²/cells (measured: the varied-100×
    * corpus at 8 fixed cells would put 25k vectors per cell). At the
    * test SFs (≤2000 vectors) the formula floors at 8, so every oracle
    * hash is unchanged — the knob only engages past ~4000 vectors.
    * The probe-bounded searchers (sm03/04/06/08: verify work =
    * probes × nprobe × occupancy, linear in occupancy) keep the fixed
    * 8-cell demo geometry; SURVEY §6b maps their cluster setting. */
  private val CellTarget = 500L
  private def adaptiveCells(e: DataFrame): Long =
    math.max(IvfCells.toLong, e.count() / CellTarget)
  private val AdaptiveCellsSql =
    s"(SELECT greatest($IvfCells, count(*) // $CellTarget) FROM embeddings)"
  /** sm07 radius. Declared BEFORE `qs` like every interpolated
    * constant: the oracle SQL captures it at object init (a later
    * declaration interpolates 0 — observed with pl12's budget). */
  private val RangeCos = 0.3
  private val BalancedQuota = 30 // sm11 per-cell sample cap
  /** sm12 fixed query: the tx19 demo terms paired with vec_id 0's
    * embedding as the probe; per-list truncation depth. Declared
    * before `qs` (oracle SQL interpolates at object init). */
  private val HybridTerms = Seq("table", "window", "stream")
  private val HybridK = 50
  // sm16/sm17 two-stage reranks: width of sm16's stage-1 prefix score
  // and the per-probe shortlist the exact stage-2 rerank re-scores
  private val PrefixDims = 16
  private val RerankShortlist = 50

  /** sm26's recall target for the auto-nprobe pick — compared on the
    * ROUNDED profiled mean (the pl04 rule: never branch on raw doubles
    * across engines). */
  private val AutoNprobeTarget = 0.6

  /** Shared CTE chain of sm22/sm26 (pre-stripped — call sites embed it
    * right after WITH): candidates scored ONCE at the widest level
    * with the cell rank carried, per-(np, probe) hit counts vs the
    * exact baseline landing in `base`. */
  private lazy val nprobeProfileCtes: String = {
    val dist = l2SqSql("e.embedding", "c.ce")
    val pdist = l2SqSql("p.pe", "c.ce")
    val icos = cosineSql("p.pe", "v.embedding")
    val xcos = cosineSql("p.pe", "x.embedding")
    s"""cent AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |  WHERE vec_id < $IvfCells),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |  WHERE vec_id % 25 = 0 AND vec_id < 500),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dist, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |pcells AS (
       |  SELECT probe_id, cid, rn FROM (
       |    SELECT p.probe_id, c.cid,
       |      row_number() OVER (PARTITION BY p.probe_id
       |                         ORDER BY $pdist, c.cid) AS rn
       |    FROM probes p CROSS JOIN cent c)
       |  WHERE rn <= 8),
       |iscored AS (
       |  SELECT p.probe_id, pc.rn, v.vec_id AS neighbor_id, $icos AS cosine
       |  FROM probes p
       |  JOIN pcells pc ON pc.probe_id = p.probe_id
       |  JOIN assign a ON a.cid = pc.cid
       |  JOIN embeddings v ON v.vec_id = a.vec_id AND v.vec_id <> p.probe_id),
       |levels AS (SELECT unnest([1, 2, 4, 8]) AS np),
       |ivf AS (
       |  SELECT np, probe_id, neighbor_id FROM (
       |    SELECT l.np, i.probe_id, i.neighbor_id,
       |      row_number() OVER (PARTITION BY l.np, i.probe_id
       |                         ORDER BY i.cosine DESC, i.neighbor_id)
       |        AS rank
       |    FROM levels l JOIN iscored i ON i.rn <= l.np)
       |  WHERE rank <= 10),
       |xscored AS (
       |  SELECT p.probe_id, x.vec_id AS neighbor_id, $xcos AS cosine
       |  FROM probes p JOIN embeddings x ON x.vec_id <> p.probe_id),
       |exact AS (
       |  SELECT probe_id, neighbor_id FROM (
       |    SELECT probe_id, neighbor_id,
       |      row_number() OVER (PARTITION BY probe_id
       |                         ORDER BY cosine DESC, neighbor_id) AS rank
       |    FROM xscored)
       |  WHERE rank <= 10),
       |nx AS (SELECT probe_id, count(*) AS n FROM exact GROUP BY probe_id),
       |hits AS (
       |  SELECT i.np, x.probe_id, count(*) AS hits
       |  FROM exact x JOIN ivf i
       |    ON i.probe_id = x.probe_id AND i.neighbor_id = x.neighbor_id
       |  GROUP BY i.np, x.probe_id),
       |base AS (
       |  SELECT l.np, p.probe_id, nx.n, coalesce(h.hits, 0) AS hits
       |  FROM levels l CROSS JOIN probes p
       |  JOIN nx ON nx.probe_id = p.probe_id
       |  LEFT JOIN hits h ON h.np = l.np AND h.probe_id = p.probe_id)""".stripMargin
  }

  /** Shared Spark stages of sm22/sm26: (probes, iscored, perLevel) —
    * probes and the once-scored widest-level candidate frame are
    * persisted (caller owns the cache lifecycle, the Q.scala
    * contract); perLevel is the per-np profile with ROUNDED
    * mean/min recall. */
  private def nprobeStages(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val e = emb(s, dir)
    val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ranked probe cells, shuffle-free (the nearestCells device with
    // the rank kept): sorted struct array, positional explode
    val cands = array(cent.map { case (cid, ce) =>
      struct(l2DistanceSq(col("pe"), typedlit(ce)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val pcells = probes
      .select(col("probe_id"), posexplode(transform(
        slice(array_sort(cands), 1, 8), c => c.getField("cid"))))
      .select(col("probe_id"), (col("pos") + 1).as("rn"),
        col("col").as("cid"))
    val assign = nearestCells(
      e.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      cent, 1)
    val en = e.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val pn = probes.withColumn("pnrm", l2Norm(col("pe")))
    val nrm = col("pnrm") * col("nrm")
    // candidates scored ONCE at the widest level, cell rank carried;
    // persisted — every level (and sm26's serve) ranks from this frame
    val iscored = pn
      .join(pcells, Seq("probe_id"))
      .join(assign, Seq("cid"))
      .join(en, Seq("vec_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("rn"),
        col("vec_id").as("neighbor_id"),
        when(nrm === 0.0, lit(0.0))
          .otherwise(dot(col("pe"), col("embedding")) / nrm).as("cosine"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wL = Window.partitionBy("np", "probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val ivf = iscored
      .select(col("probe_id"), col("rn"), col("neighbor_id"),
        col("cosine"), explode(typedlit(Seq(1, 2, 4, 8))).as("np"))
      .filter(col("rn") <= col("np"))
      .withColumn("rank", row_number().over(wL))
      .filter(col("rank") <= 10)
      .select("np", "probe_id", "neighbor_id")
    // exact baseline — the sm01 path at the same probe set
    val scoredX = en.join(broadcast(pn), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        when(nrm === 0.0, lit(0.0))
          .otherwise(dot(col("pe"), col("embedding")) / nrm).as("cosine"))
    val wX = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val exact = scoredX.withColumn("rank", row_number().over(wX))
      .filter(col("rank") <= 10)
      .select("probe_id", "neighbor_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nx = exact.groupBy("probe_id").agg(count(lit(1)).as("n"))
    val hits = exact.join(ivf, Seq("probe_id", "neighbor_id"))
      .groupBy("np", "probe_id").agg(count(lit(1)).as("hits"))
    val perLevel = probes
      .select(col("probe_id"), explode(typedlit(Seq(1, 2, 4, 8))).as("np"))
      .join(nx, Seq("probe_id"))
      .join(hits, Seq("np", "probe_id"), "left")
      .select(col("np"), col("probe_id"), col("n"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .groupBy("np")
      .agg(count(lit(1)).as("n_probes"),
        duckRound(sum(col("hits")).cast("double") /
          sum(col("n")).cast("double"), 4).as("mean_recall"),
        duckRound(min(col("hits").cast("double") /
          col("n").cast("double")), 4).as("min_recall"))
    (probes, iscored, perLevel)
  }

  // sm21 diversity suppression: a shortlist member too close (cosine)
  // to any BETTER-ranked member is dropped before the final top-k
  private[graft] val DiversityTau = 0.4

  /** Shared DuckDB CTE chain ending in `dq(vec_id, deq)` — the
    * scalar-quantized-then-dequantized corpus (sm08's codebook math,
    * one text so sm08 and sm17 can never drift). */
  private[queries] def sqDeqCtes: String =
    """x AS (
      |  SELECT vec_id, unnest(embedding) AS xi,
      |    unnest(range(1, len(embedding) + 1)) AS pos
      |  FROM embeddings),
      |st AS (
      |  SELECT pos, min(CAST(xi AS DOUBLE)) AS mn, max(CAST(xi AS DOUBLE)) AS mx
      |  FROM x GROUP BY pos),
      |sta AS (SELECT list(mn ORDER BY pos) AS mns,
      |               list(mx ORDER BY pos) AS mxs FROM st),
      |dq AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(embedding) + 1), d ->
      |      CASE WHEN sta.mxs[d] = sta.mns[d] THEN sta.mns[d]
      |           ELSE sta.mns[d]
      |             + (CAST(CAST(floor((CAST(embedding[d] AS DOUBLE) - sta.mns[d])
      |                 / (sta.mxs[d] - sta.mns[d]) * 255.0 + 0.5) AS BIGINT) AS DOUBLE)
      |                / 255.0) * (sta.mxs[d] - sta.mns[d])
      |      END) AS deq
      |  FROM embeddings, sta)"""

  /** Above this centroid count the per-centroid literal expression
    * tree exceeds the JVM's 64 KB generated-method limit when fused
    * into a larger stage (measured at 400 adaptive cells inside a sort
    * stage: janino "Code grows beyond 64 KB" → silent whole-stage
    * interpreted fallback), so big sets switch to the zip_with form
    * below. 64 is comfortably under the break point with headroom for
    * fusion into wide stages. */
  private val CodegenCellLimit = 64

  /** Shuffle-free coarse-quantizer assignment: each vector's `keep`
    * nearest centroids, computed as a per-row PROJECTION over the
    * (collected-once, tiny) centroid set — an array of (distSq, cid)
    * structs sorted by struct order (dist, then cid — the same total
    * order as `ORDER BY dist, cid`). The previous formulation
    * (crossJoin(broadcast(cent)) + row_number window partitioned by the
    * vector id) shuffled |centroids|× the full corpus just to rank a
    * handful of rows per vector — at 100 TB that exchange dominates;
    * this one plans zero exchanges (guarded by PlanSpec).
    *
    * Two builds of the top-keep candidates, same values (spec-pinned):
    * ≤ [[CodegenCellLimit]] centroids inline one literal distance tree
    * per centroid (whole-stage-codegens — fastest per row); larger
    * sets (adaptive-cell stores: n/500 grows unboundedly with the
    * corpus) route through the native
    * [[graft.expressions.NearestCellsTopK]] expression, which holds
    * the centroid matrix as a REFERENCE OBJECT — one fixed generated
    * loop, O(1) code size at ANY cell count, same sequential
    * (x−y)² fold, still inside whole-stage codegen.
    */
  def nearestCells(vecs: DataFrame, idCol: String, vecCol: String,
                   centroids: Seq[(Long, Seq[Double])], keep: Int,
                   carry: Seq[String] = Nil,
                   withDist: Boolean = false,
                   codegenLimit: Int = CodegenCellLimit): DataFrame = {
    require(!withDist || keep == 1, "withDist only defined for keep == 1")
    val small = centroids.size <= codegenLimit
    def cands = array(centroids.map { case (cid, ce) =>
      struct(l2DistanceSq(col(vecCol), typedlit(ce)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    def topK = {
      graft.expressions.VectorExpressions
        .ensureRegistered(vecs.sparkSession)
      // float vectors cast up exactly (the VectorFunctions convention)
      call_function("graft_nearest_cells", col(vecCol).cast("array<double>"),
        typedlit(centroids.map(_._2)), typedlit(centroids.map(_._1)),
        lit(keep))
    }
    val out = col(idCol) +: carry.map(col)
    if (keep == 1) {
      val m = if (small) array_min(cands) else element_at(topK, 1)
      val cols = out :+ m.getField("cid").as("cid")
      vecs.select(
        (if (withDist) cols :+ m.getField("d").as("d2") else cols): _*)
    } else {
      val top = if (small) slice(array_sort(cands), 1, keep) else topK
      vecs.select(out :+ explode(transform(
        top, c => c.getField("cid"))).as("cid"): _*)
    }
  }

  /** Above this cell count, BUILD-time corpus assignment switches to
    * the two-level approximate path — single-level assignment is
    * O(n·cells) (O(n²/500) under the adaptive rule, the documented
    * scale boundary of SURVEY §6); two-level is O(n·2√cells). Probe-
    * side cell selection and every oracle-checked query stay exact
    * (probe sets are bounded; oracles mirror exact argmin). */
  val TwoLevelCellLimit = 256

  /** Driver-side SPATIAL grouping of a centroid set for the two-level
    * assignment: seeds = the first ⌈√C⌉ centroids by cid, then
    * [[TwoLevelIters]] deterministic Lloyd iterations (sequential
    * driver math — same result every call), empty groups dropped. A
    * cid-contiguous grouping would NOT work: cell seeds are arbitrary
    * corpus vectors, so slice means collapse to the data centroid and
    * stage-1 degenerates to a coin flip (measured: 15% exact-argmin
    * agreement vs ~2/3 with spatial groups on uniform vectors).
    * Returns (supers, memberStart, members) with members grouped. */
  private[graft] val TwoLevelIters = 3
  private[graft] def twoLevelGroups(centroids: Seq[(Long, Seq[Double])])
      : (Seq[Seq[Double]], Seq[Int], Seq[(Long, Seq[Double])]) = {
    val sorted = centroids.sortBy(_._1)
    val g = math.ceil(math.sqrt(sorted.size.toDouble)).toInt
    val dim = sorted.head._2.length
    var supers: Seq[Seq[Double]] = sorted.take(g).map(_._2)
    var assign: Seq[Int] = Nil
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val dx = a(i) - b(i); s += dx * dx; i += 1 }
      s
    }
    (0 until TwoLevelIters).foreach { _ =>
      assign = sorted.map { case (_, ce) =>
        supers.zipWithIndex.map { case (s, i) => (d2(ce, s), i) }.min._2
      }
      supers = supers.indices.map { gi =>
        val members = sorted.zip(assign).collect { case (c, a) if a == gi => c }
        if (members.isEmpty) supers(gi)
        else (0 until dim).map(d => members.map(_._2(d)).sum / members.size)
      }
    }
    val byGroup = supers.indices.map { gi =>
      sorted.zip(assign).collect { case (c, a) if a == gi => c }
    }.filter(_.nonEmpty) // an empty group must never win stage 1
    val keptSupers = supers.indices
      .filter(gi => sorted.zip(assign).exists(_._2 == gi)).map(supers)
    (keptSupers, byGroup.map(_.size).scanLeft(0)(_ + _), byGroup.flatten)
  }

  /** BUILD-time cell assignment of a corpus frame: exact argmin
    * ([[nearestCells]], keep=1) up to [[TwoLevelCellLimit]] cells,
    * the two-level approximate assignment
    * ([[graft.expressions.TwoLevelNearestCell]]) past it — ~2√C
    * distance evaluations per vector instead of C, over the
    * [[twoLevelGroups]] spatial grouping. */
  def assignCells(vecs: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[(Long, Seq[Double])],
                  carry: Seq[String] = Nil): DataFrame =
    if (centroids.size <= TwoLevelCellLimit)
      nearestCells(vecs, idCol, vecCol, centroids, 1, carry)
    else {
      graft.expressions.VectorExpressions
        .ensureRegistered(vecs.sparkSession)
      val (supers, memberStart, members) = twoLevelGroups(centroids)
      val out = (col(idCol) +: carry.map(col)) :+
        call_function("graft_two_level_cell",
          col(vecCol).cast("array<double>"),
          typedlit(supers), typedlit(memberStart),
          typedlit(members.map(_._2)), typedlit(members.map(_._1))).as("cid")
      vecs.select(out: _*)
    }

  /** Collect a centroid frame `(cid, ce: array<float|double>)` to the
    * driver for literal embedding in `nearestCells`. Only ever called
    * on k-row frames (k = IvfCells). */
  private[graft] def collectCentroids(cent: DataFrame): Seq[(Long, Seq[Double])] =
    cent.select(col("cid").cast("long"),
        col("ce").cast("array<double>"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)

  /** pl25's bipartite corpus-vs-eval semantic near-dup pairs:
    * `(vec_id, eval_vec_id, cos)` for every corpus vector (vec_id % 5
    * ≠ 0) within `NearDupCos` cosine of an eval vector (% 5 = 0),
    * `cos` UNROUNDED (callers round the reported column only — the
    * threshold compares the same raw double in both engines). Factored
    * out of pl25 so the pl47 funnel-fate report attributes its
    * semantic rung with EXACTLY pl25's pair set — one construction,
    * no drift. Scale shape: pl14's broadcast-probe pattern over dd12's
    * cell equi-join — the corpus is never shuffled and never
    * self-joined. */
  private[queries] def semanticEvalPairsOf(s: SparkSession,
                                           dir: String): DataFrame = {
    val e = emb(s, dir)
    val (cent, ea) = semanticEvalSides(e)
    val en = e.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    semanticPairsAgainst(en.filter(col("vec_id") % 5 =!= 0), cent, ea)
  }

  /** The FROZEN sides of the semantic-eval rung — the centroid set and
    * the eval-side cell-assignment frame `(cid, eval_vec_id, eb, nb)`
    * — factored out of [[semanticEvalPairsOf]] so `FateMaintenance`
    * can persist them as a build-once release artifact (round-17
    * verdict #1): the eval set and the centroid geometry are fixed per
    * release, and an arriving micro-batch needs only these two sides
    * to attribute its semantic fate. */
  private[graft] def semanticEvalSides(e: DataFrame)
      : (Seq[(Long, Seq[Double])], DataFrame) = {
    val cent = collectCentroids(e.filter(col("vec_id") < adaptiveCells(e))
      .select(col("vec_id").as("cid"), col("embedding").as("ce")))
    val en = e.select(col("vec_id"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val ea = nearestCells(en.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", cent, IvfNProbe,
      carry = Seq("embedding", "nrm"))
      .select(col("cid"), col("vec_id").as("eval_vec_id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    (cent, ea)
  }

  /** pl25/pl47's semantic rung against GIVEN frozen sides: corpus
    * vectors `(vec_id, embedding, nrm)` each assigned to their ONE
    * nearest cell, the eval assignment broadcast onto the cell
    * equi-join, cosine ≥ the near-dup threshold. The one construction
    * shared by the batch path ([[semanticEvalPairsOf]]) and the
    * streaming fate maintainer — an edit to the assignment rule or the
    * threshold moves both, so streamed fates cannot drift from the
    * batch report. The corpus side is never self-joined and never
    * shuffled on anything but its cell id. */
  private[graft] def semanticPairsAgainst(corpusVecs: DataFrame,
      cent: Seq[(Long, Seq[Double])], evalAssigned: DataFrame): DataFrame = {
    // both sides pre-cast to double ONCE PER ROW before the cell
    // equi-join (the semanticSurvivors note) — dot() would otherwise
    // re-cast the float arrays per CANDIDATE pair; artifact schemas
    // (FateMaintenance's frozen eval side) stay float on disk.
    val ca = nearestCells(corpusVecs, "vec_id", "embedding", cent, 1,
      carry = Seq("embedding", "nrm"))
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val ea = evalAssigned
      .withColumn("eb", col("eb").cast("array<double>"))
    val nrm = col("nrm") * col("nb")
    ca.join(broadcast(ea), Seq("cid"))
      .withColumn("cos", when(nrm === 0.0, lit(0.0))
        .otherwise(dot(col("embedding"), col("eb")) / nrm))
      .filter(col("cos") >= NearDupCos)
      .select(col("vec_id"), col("eval_vec_id"), col("cos"))
  }

  /** DuckDB twin of [[semanticEvalPairsOf]]: CTE chain ending in
    * `sempairs(vec_id, eval_vec_id, cos)`. */
  private[queries] lazy val semanticEvalPairCtes: String = {
    val dc = l2SqSql("e.embedding", "c.ce")
    val cos = cosineSql("a.embedding", "b.embedding")
    s"""cent AS (
       |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |  WHERE vec_id < $AdaptiveCellsSql),
       |ca AS (
       |  SELECT vec_id, cid, embedding FROM (
       |    SELECT e.vec_id, c.cid, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dc, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id % 5 <> 0)
       |  WHERE rn = 1),
       |ea AS (
       |  SELECT vec_id, cid, embedding FROM (
       |    SELECT e.vec_id, c.cid, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dc, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id % 5 = 0)
       |  WHERE rn <= $IvfNProbe),
       |sempairs AS (
       |  SELECT a.vec_id, b.vec_id AS eval_vec_id, $cos AS cos
       |  FROM ca a JOIN ea b ON a.cid = b.cid
       |  WHERE $cos >= $NearDupCos)"""
  }

  /** IVF search given a (fixed or trained) centroid set: corpus cell
    * assignment and probe cell selection are shuffle-free projections
    * (`nearestCells`); the candidate join is an EQUI-join on cell id,
    * so the verify work scales with nprobe/cells of the corpus. */
  private def ivfTopK(e: DataFrame, cent: Seq[(Long, Seq[Double])],
                      nprobe: Int, k: Int,
                      candFilter: Option[Column] = None): DataFrame = {
    // candFilter (sm14): a metadata PRE-filter on the candidate corpus
    // — applied before cell assignment, so disqualified vectors never
    // enter the cid equi-join and every returned rank ≤ k is a rank
    // among ELIGIBLE vectors (post-filtering an unfiltered top-k would
    // silently return < k and lose recall). Probes stay unfiltered: a
    // query vector needn't satisfy its own predicate.
    val cand = candFilter.fold(e)(e.filter)
    val assign = nearestCells(
      cand.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      cent, 1)
    // fixed-size probe set — same boundedness argument as sm01
    val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val pcells = nearestCells(probes.select(col("probe_id"),
      col("pe").as("embedding")), "probe_id", "embedding", cent, nprobe)
    // norms once per side (sm01 pattern), not 3 folds per pair; the
    // products are the same IEEE ops as one-shot cosine, so results
    // stay bit-identical to the oracle
    val pn = probes.withColumn("pnrm", l2Norm(col("pe")))
    val nrm = col("pnrm") * col("nrm")
    val scored = pn
      .join(pcells, Seq("probe_id"))
      .join(assign, Seq("cid"))
      .join(e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm")), Seq("vec_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        when(nrm === 0.0, lit(0.0))
          .otherwise(dot(col("pe"), col("embedding")) / nrm).as("cosine"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("rank"),
        duckRound(col("cosine"), 6).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** One quantized-mean Lloyd iteration over the deterministic training
    * sample: assign (shuffle-free projection argmin) → per-(cell, dim)
    * mean. Determinism device: each component is accumulated as
    * `sum(floor(x · 2^20))` — an INTEGER sum, exact and order-independent
    * — then divided once; double `sum()` would add in engine-dependent
    * order (non-associative), so Spark and the DuckDB oracle could
    * diverge in the last ULP and flip a nearest-centroid tie. The 2^-20
    * quantization of the means costs nothing at ANN-recall granularity.
    *
    * Overflow safety: the per-term magnitude is ≤ max|x|·2^20, so a
    * 64-bit accumulator would wrap (silently, on Spark) once
    * |members|·max|x| exceeds 2^43 — reachable for a hot cell at the
    * 100 TB design point. Both engines therefore accumulate WIDE:
    * Spark sums `decimal(38,0)` (exact to 10^38), DuckDB sums BIGINT
    * natively as HUGEINT (exact to 2^127); each converts the exact
    * integer to double once, at the end, giving identical means.
    */
  // --- PQ machinery shared by sm05 (full ADC scan) and sm06 (IVF-PQ):
  //     8 subspaces × 8 sub-centroids (the sm03 seed-cell convention
  //     per subspace); codes are one byte per subspace ---
  private val PqM = 8   // subspaces
  private val PqSub = 8 // dims per subspace

  private def pqCentSlice(ce: Seq[Double], m: Int): Seq[Double] =
    ce.slice(m * PqSub, (m + 1) * PqSub)

  /** Same fold (0-seeded, left-to-right) as `l2SqSql`, for driver-side
    * LUT construction — keeps LUT distances bit-identical to the SQL
    * oracle's. */
  private def l2sqRef(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  /** Per-subspace shuffle-free argmin encoding (the nearestCells
    * pattern): one `code$m` column per subspace. */
  private def pqCodeCols(cents: Seq[(Long, Seq[Double])]): Seq[Column] =
    pqCodeColsOn(col("embedding"), cents)

  /** [[pqCodeCols]] over an arbitrary vector column — sm20 encodes
    * RESIDUALS, not raw embeddings, through the same argmin. */
  private def pqCodeColsOn(vec: Column,
                           cents: Seq[(Long, Seq[Double])]): Seq[Column] =
    (0 until PqM).map { m =>
      val cands = array(cents.map { case (cid, ce) =>
        struct(
          l2DistanceSq(slice(vec, m * PqSub + 1, PqSub),
            typedlit(pqCentSlice(ce, m))).as("d"),
          lit(cid).as("cid"))
      }: _*)
      array_min(cands).getField("cid").as(s"code$m")
    }

  /** Probe → (subspace → sub-centroid distance) lookup tables, built
    * driver-side on the tiny probe × centroid sets and broadcast. */
  private def pqLutDF(s: SparkSession, e: DataFrame,
                      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    val probeRows = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    probeRows.map { case (pid, pv) =>
      (pid, (0 until PqM).map(m =>
        cents.map { case (_, ce) =>
          l2sqRef(pv.slice(m * PqSub, (m + 1) * PqSub), pqCentSlice(ce, m))
        }))
    }.toDF("probe_id", "lut")
  }

  /** ADC score: 8 LUT lookups summed left-to-right (fixed order). */
  private def pqScore: Column = (0 until PqM)
    .map(m => element_at(element_at(col("lut"), m + 1),
      (col(s"code$m") + 1).cast("int")))
    .reduce(_ + _)

  /** DuckDB CTEs shared by the PQ oracles: centroids, per-subspace
    * slices, corpus codes, probes, probe LUTs. */
  private def pqCodeCtes: String = {
    val codeDist = l2SqSql("list_slice(e.embedding, s.m*8 + 1, s.m*8 + 8)", "s.cs")
    val lutDist = l2SqSql("list_slice(p.pe, s.m*8 + 1, s.m*8 + 8)", "s.cs")
    s"""cent AS (
       |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
       |  FROM embeddings WHERE vec_id < 8),
       |sub AS (
       |  SELECT cid, m, list_slice(ce, m*8 + 1, m*8 + 8) AS cs
       |  FROM cent CROSS JOIN (SELECT unnest(range(0, 8)) AS m)),
       |codes AS (
       |  SELECT vec_id, m, cid AS code FROM (
       |    SELECT e.vec_id, s.m, s.cid,
       |      row_number() OVER (PARTITION BY e.vec_id, s.m
       |                         ORDER BY $codeDist, s.cid) AS rn
       |    FROM embeddings e CROSS JOIN sub s)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |  WHERE vec_id % 25 = 0 AND vec_id < 500),
       |lut AS (
       |  SELECT p.probe_id, s.m, s.cid, $lutDist AS d
       |  FROM probes p CROSS JOIN sub s)"""
  }

  /** ADC total over the 8 per-subspace partial distances. */
  private val pqTotalSql: String = (0 until 8)
    .map(m => s"coalesce(sum(CASE WHEN m = $m THEN d END), 0.0)")
    .mkString(" + ")

  private val TrainMod = 4 // deterministic training sample: vec_id % 4 = 0
  private val LloydIters = 2
  private val QScale = 1L << 20

  private def lloydStep(e: DataFrame,
                        cents: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val members = nearestCells(
      e.filter(col("vec_id") % TrainMod === 0)
        .select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", cents, 1, carry = Seq("embedding"))
    keyedIntegerMeans(members, "cid")
  }

  /** Per-key exact-integer per-dim means of `embedding`, collected to
    * the driver as literal centroids — the parity-load-bearing device
    * (see the lloydSql scaladoc for the overflow/order analysis)
    * shared by Lloyd training (key = cell) and the per-label centroid
    * report (sm10, key = label): each component accumulates as
    * `sum(floor(x·2²⁰))` in decimal(38,0) — exact and
    * order-independent — then divides ONCE. One home so an overflow
    * or rounding fix moves both consumers (and their DuckDB mirrors
    * stay one pattern). */
  private def keyedIntegerMeans(vecs: DataFrame,
                                keyCol: String): Seq[(Long, Seq[Double])] = {
    val comps = vecs
      .select(col(keyCol).cast("long").as("k"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("k", "pos")
      .agg(sum(floor(col("x") * QScale.toDouble).cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("k"), col("pos"),
        (col("s").cast("double") / (col("n") * QScale).cast("double"))
          .as("comp"))
      .collect()
    comps.groupBy(_.getLong(0)).toSeq.map { case (k, rs) =>
      (k, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
    }.sortBy(_._1)
  }

  /** DuckDB mirror of one Lloyd iteration (CTE suffix `i`, reading
    * `cent${i-1}` and `train`). */
  private def lloydSql(i: Int): String = {
    val dist = l2SqSql("t.embedding", "c.ce")
    s"""a$i AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT t.vec_id, t.embedding, c.cid,
       |      row_number() OVER (PARTITION BY t.vec_id
       |                         ORDER BY $dist, c.cid) AS rn
       |    FROM train t CROSS JOIN cent${i - 1} c)
       |  WHERE rn = 1),
       |x$i AS (
       |  SELECT cid,
       |    unnest(range(1, len(embedding) + 1)) AS pos,
       |    unnest(list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT))) AS xi
       |  FROM a$i),
       |cent$i AS (
       |  SELECT cid, list(comp ORDER BY pos) AS ce FROM (
       |    SELECT cid, pos,
       |      CAST(sum(xi) AS DOUBLE)
       |        / CAST(count(*) * $QScale AS DOUBLE) AS comp
       |    FROM x$i GROUP BY cid, pos)
       |  GROUP BY cid)"""
  }

  val qs: Seq[Q] = Seq(

    // --- Brute-force cosine top-k: the exact baseline ---
    Q("sm01_cosine_topk", {
      val cos = cosineSql("p.pe", "c.embedding")
      s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
         |           FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |scored AS (
         |  SELECT p.probe_id, c.vec_id AS neighbor_id, $cos AS cosine
         |  FROM p JOIN embeddings c ON c.vec_id <> p.probe_id),
         |ranked AS (
         |  SELECT probe_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      // Norms are computed ONCE per side (not per pair): at k probes ×
      // n candidates that cuts 2/3 of the fold work vs a naive
      // cosine(a, b) per pair. The products sqrt(aa)*sqrt(bb) and
      // dot(a,b) are the same IEEE operations as the one-shot cosine,
      // so results stay bit-identical to the oracle.
      // NOT persisted: both uses are cheap parquet scans, and the
      // in-memory columnar cache (de)serializes the float arrays per
      // access — measured 4× slower than re-scanning.
      val e = emb(s, dir)
        .select(col("vec_id"), col("embedding"),
          l2Norm(col("embedding")).as("nrm"))
      // FIXED-SIZE probe set (≤ 20 ids, independent of SF): a plain
      // `vec_id % 25` probe set grows with the corpus, so the broadcast
      // and the O(probes × corpus) verify grow quadratically with SF —
      // the exactness baseline must stay runnable as SF scales.
      val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      // Probe set is small AND BOUNDED by construction — broadcast it so
      // the scan of the (100 TB-scale) corpus is shuffle-free.
      val n = col("pnrm") * col("nrm")
      val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          when(n === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n).as("cosine"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- Hyperplane-LSH ANN over the dd12 SEMANTIC survivors: banded
    //     candidates → cosine verify. Survivors-first is ENFORCED here
    //     (the dd04/mm04 exact-dedup-first precedent lifted to
    //     embedding space): the round-13 100x sweep measured the raw
    //     shape at x757 (28.3M materialized pairs) because dense
    //     similarity cliques make band-join OUTPUT quadratic in clique
    //     size — dd12's cell-local dedup collapses each clique to its
    //     min-id representative BEFORE any pair fan-out, so output
    //     tracks cross-cluster structure. sm23 keeps the raw all-docs
    //     shape as the oracle-checked, bench-excluded twin. ---
    Q("sm02_ann_hyperplane",
      s"""WITH $semanticSurvivorCtes,
         |${hyperplaneScoredCtes("semsurv")}
         |SELECT vec_a, vec_b, round(c, 6) AS cosine
         |FROM scored WHERE c >= 0.25
         |ORDER BY vec_a, vec_b""") { (s, dir) =>
      // persisted (the dd07 precedent): hyperplaneScored consumes its
      // input three ways (the signature frame and both norm-join
      // sides) — unpersisted, the whole survivors derivation
      // (assignment + cell near-dup drop + anti-join) re-planned per
      // consumer: 6 live embedding scans in the round-18 baseline plan
      val surv = semanticSurvivors(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hyperplaneScored(surv)
        .filter(col("cos") >= 0.25)
        .select(col("vec_a"), col("vec_b"), duckRound(col("cos"), 6).as("cosine"))
        .orderBy("vec_a", "vec_b")
    },

    // --- Raw all-docs hyperplane twin (the dd13 convention): same
    //     pipeline WITHOUT the semantic-survivors stage, oracle-checked
    //     at test SFs so the signature/banding math stays pinned
    //     independently of the survivors composition; excluded from
    //     bench (pair output is quadratic in similarity-clique size by
    //     construction — the failure mode sm02's composition
    //     prevents). ---
    Q("sm23_hyperplane_allpairs",
      s"""WITH ${hyperplaneScoredCtes("embeddings")}
         |SELECT vec_a, vec_b, round(c, 6) AS cosine
         |FROM scored WHERE c >= 0.25
         |ORDER BY vec_a, vec_b""") { (s, dir) =>
      hyperplaneScored(emb(s, dir).select("vec_id", "embedding"))
        .filter(col("cos") >= 0.25)
        .select(col("vec_a"), col("vec_b"), duckRound(col("cos"), 6).as("cosine"))
        .orderBy("vec_a", "vec_b")
    },

    // --- Embedding-cosine near-dup dedup ACTION over the dd12
    //     semantic survivors: LSH-banded candidate pairs among the
    //     survivors, thresholded as "near-duplicate", collapsed with
    //     connected components (a ~ b ~ c keeps exactly one vector),
    //     emitting the embedding set that survives BOTH rungs — dd12's
    //     cell-local pass and the banding's cross-cell pass. The 0.4
    //     threshold is calibrated to this corpus (max candidate cosine
    //     0.47 — the synthetic vectors have no true clones); the
    //     operator shape is threshold-independent. dd23 keeps the raw
    //     single-rung shape as the oracle-checked twin. ---
    Q("dd07_embedding_neardup",
      s"""WITH RECURSIVE $semanticSurvivorCtes,
         |${hyperplaneScoredCtes("semsurv")},
         |pairs AS (SELECT vec_a, vec_b FROM scored WHERE c >= $NearDupCos),
         |edges AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT vec_b, vec_a FROM pairs),
         |reach AS (
         |  SELECT DISTINCT src AS node, src AS r FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.r FROM reach r JOIN edges e ON e.src = r.node),
         |comp AS (SELECT node, CAST(min(r) AS BIGINT) AS root
         |         FROM reach GROUP BY node)
         |SELECT e.vec_id, e.label
         |FROM semsurv e
         |LEFT JOIN comp c ON c.node = e.vec_id
         |WHERE c.root IS NULL OR c.root = e.vec_id
         |ORDER BY vec_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val surv = semanticSurvivors(s, dir)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val pairs = hyperplaneScored(surv)
        .filter(col("cos") >= NearDupCos)
        .select("vec_a", "vec_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val labels = graft.operators.ConnectedComponents.minLabel(pairs)
      surv
        .join(labels, col("vec_id") === col("node"), "left")
        .filter(col("root").isNull || col("root") === col("vec_id"))
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // --- Raw single-rung near-dup twin (dd13 convention): LSH-CC over
    //     ALL embeddings, no survivors stage — oracle-checked at test
    //     SFs, bench-excluded. ---
    Q("dd23_embedding_neardup_raw",
      s"""WITH RECURSIVE ${hyperplaneScoredCtes("embeddings")},
         |pairs AS (SELECT vec_a, vec_b FROM scored WHERE c >= $NearDupCos),
         |edges AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT vec_b, vec_a FROM pairs),
         |reach AS (
         |  SELECT DISTINCT src AS node, src AS r FROM edges
         |  UNION
         |  SELECT e.dst AS node, r.r FROM reach r JOIN edges e ON e.src = r.node),
         |comp AS (SELECT node, CAST(min(r) AS BIGINT) AS root
         |         FROM reach GROUP BY node)
         |SELECT e.vec_id, e.label
         |FROM embeddings e
         |LEFT JOIN comp c ON c.node = e.vec_id
         |WHERE c.root IS NULL OR c.root = e.vec_id
         |ORDER BY vec_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val pairs = hyperplaneScored(emb(s, dir).select("vec_id", "embedding"))
        .filter(col("cos") >= NearDupCos)
        .select("vec_a", "vec_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val labels = graft.operators.ConnectedComponents.minLabel(pairs)
      emb(s, dir)
        .join(labels, col("vec_id") === col("node"), "left")
        .filter(col("root").isNull || col("root") === col("vec_id"))
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // --- IVF-style ANN: coarse cell assignment (shuffle-free argmin
    //     projection over the broadcast-as-literals centroids) → probe
    //     searches only its nprobe nearest cells. The search join is an
    //     EQUI-join on cell id, so work scales with nprobe/cells of the
    //     corpus, not all of it. The fixed centroids (vec_id < 8) are
    //     the deterministic seed set; sm04 is the same search with a
    //     TRAINED quantizer — identical plan shape. ---
    Q("sm03_ivf_topk",
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |${ivfSearchSql("cent", 5)}""") { (s, dir) =>
      val e = emb(s, dir)
      // centroid set is k rows — collect once and embed as literals so
      // the corpus-wide assignment is a shuffle-free projection
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      ivfTopK(e, cent, IvfNProbe, 5)
    },

    // --- IVF with a TRAINED coarse quantizer: k-means (2 quantized-mean
    //     Lloyd iterations, fixed seed set + fixed training sample, so
    //     the DuckDB oracle reproduces cell assignment bit-for-bit).
    //     Training is a bounded number of DataFrame passes over the
    //     vec_id % 4 sample; the search is byte-identical in shape to
    //     sm03 — swapping centroids changes no plan. ---
    Q("sm04_ivf_trained",
      s"""WITH cent0 AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |train AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % $TrainMod = 0),
         |${(1 to LloydIters).map(lloydSql).mkString(",\n         |")},
         |${ivfSearchSql(s"cent$LloydIters", 5)}""") { (s, dir) =>
      val e = emb(s, dir)
      val init = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val trained = (1 to LloydIters).foldLeft(init)((c, _) => lloydStep(e, c))
      ivfTopK(e, trained, IvfNProbe, 5)
    },

    // --- Product quantization (PQ) ANN: 8 subspaces × 8 sub-centroids
    //     (the sm03 seed-cell convention per subspace). Each vector is
    //     ENCODED as 8 one-byte codes — 32× compression of the 64-dim
    //     float vector, which is the operator's 100 TB point: the ADC
    //     scan touches the code table, never the raw embeddings.
    //     Encoding is a shuffle-free per-row argmin projection per
    //     subspace; probe→(subspace, code) distance LUTs are computed
    //     once on the tiny probe/centroid sets with the same
    //     left-to-right fold as the SQL oracle, so scores are
    //     bit-identical; ranks are taken on the ROUNDED distance.
    //     Cost note (dd04 class): the encoding projection embeds 64
    //     sub-centroid literals (8 subspaces × 8 candidates), so
    //     planning + codegen cost a few constant seconds regardless of
    //     data size — measured 7s cold / ~2s warm while the per-row
    //     work is 8 table lookups; it amortizes at scale exactly
    //     because it does NOT grow with the corpus. ---
    Q("sm05_pq_topk", {
      s"""WITH ${pqCodeCtes},
         |joined AS (
         |  SELECT l.probe_id, c.vec_id, c.m, l.d
         |  FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.code),
         |scored AS (
         |  SELECT probe_id, vec_id,
         |    round($pqTotalSql, 6) AS adist
         |  FROM joined GROUP BY probe_id, vec_id)
         |SELECT probe_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank, adist
         |FROM (
         |  SELECT probe_id, vec_id, adist,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY adist, vec_id) AS rank
         |  FROM scored WHERE vec_id <> probe_id)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val cents = collectCentroids(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      // persisted: a materialization boundary before the probe join —
      // without it the 64-literal-tree encode projection fuses into the
      // join stage and is re-evaluated per (vec, probe) OUTPUT row
      // (|probes|× redundant work, measured 2.2 s in one task at sf0.1)
      val coded = e.select(col("vec_id") +: pqCodeCols(cents): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lut = pqLutDF(s, e, cents)
      val w = Window.partitionBy("probe_id").orderBy(col("adist"), col("vec_id"))
      coded.crossJoin(broadcast(lut))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("adist", duckRound(pqScore, 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("adist"))
        .orderBy("probe_id", "rank")
    },

    // --- IVF-PQ (ADC over candidate cells): the production composition
    //     of sm03's coarse pruning and sm05's compressed scoring. The
    //     corpus is assigned to coarse cells (shuffle-free projection
    //     argmin) and PQ-encoded once; each probe searches only its
    //     nprobe cells, scoring CODES against its LUT — so per-probe
    //     work scales with nprobe/cells of the corpus AND never touches
    //     raw embeddings at query time. Codes quantize the raw vectors
    //     (IVF-Flat-PQ), not residuals: classic IVFADC subtracts the
    //     cell centroid first, which improves recall but changes no
    //     plan shape — the raw-vector variant keeps the oracle an
    //     exact replica. Candidate generation and LUT lookup are all
    //     EQUI-joins (cell id / vec_id / probe_id) — no cross join
    //     anywhere (plan-guarded). ---
    Q("sm06_ivfpq_topk", {
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      s"""WITH ${pqCodeCtes},
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM probes p CROSS JOIN cent c)
         |  WHERE rn <= $IvfNProbe),
         |cand AS (
         |  SELECT pc.probe_id, a.vec_id
         |  FROM pcells pc JOIN assign a ON a.cid = pc.cid
         |  WHERE a.vec_id <> pc.probe_id),
         |joined AS (
         |  SELECT cd.probe_id, c.vec_id, c.m, l.d
         |  FROM cand cd
         |  JOIN codes c ON c.vec_id = cd.vec_id
         |  JOIN lut l ON l.probe_id = cd.probe_id AND l.m = c.m AND l.cid = c.code),
         |scored AS (
         |  SELECT probe_id, vec_id,
         |    round($pqTotalSql, 6) AS adist
         |  FROM joined GROUP BY probe_id, vec_id)
         |SELECT probe_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank, adist
         |FROM (
         |  SELECT probe_id, vec_id, adist,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY adist, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val cents = collectCentroids(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val assign = nearestCells(
        e.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        cents, 1)
      // persisted: boundary before the candidate join (the sm05 note)
      val coded = e.select(col("vec_id") +: pqCodeCols(cents): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val pcells = nearestCells(probes.select(col("probe_id"),
        col("pe").as("embedding")), "probe_id", "embedding", cents, IvfNProbe)
      val lut = pqLutDF(s, e, cents)
      val w = Window.partitionBy("probe_id").orderBy(col("adist"), col("vec_id"))
      pcells.join(assign, Seq("cid"))
        .filter(col("vec_id") =!= col("probe_id"))
        .join(coded, Seq("vec_id"))
        .join(broadcast(lut), Seq("probe_id"))
        .withColumn("adist", duckRound(pqScore, 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("adist"))
        .orderBy("probe_id", "rank")
    },

    // --- Radius (range) search: ALL neighbors with cosine ≥ τ, not
    //     top-k — the retrieval mode decontamination runs ("find EVERY
    //     training doc near this benchmark item" has no k). Same IVF
    //     machinery as sm03 — shuffle-free cell assignment, cell
    //     equi-join — so candidate work still scales with nprobe/cells
    //     of the corpus; the threshold replaces the per-probe ranking
    //     window, so at 100 TB this is one equi-join plus a map-side
    //     filter with NO ranking shuffle at all. Both engines filter
    //     the UNROUNDED cosine (bit-identical folds, see file header),
    //     so the τ boundary cannot flip between them. ---
    Q("sm07_range_search",
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |${ivfRangeSql("cent", RangeCos)}""") { (s, dir) =>
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      ivfRange(e, cent, IvfNProbe, RangeCos)
    },

    // --- Scalar (int8) quantization ANN: per-dimension min/max over
    //     the corpus → each float becomes one byte (4× memory cut, the
    //     production default BEFORE reaching for PQ's 32×), scan scores
    //     probes against DEQUANTIZED codes (asymmetric: the probe stays
    //     full-precision). Two passes, both shuffle-light: pass 1 is a
    //     64-row min/max aggregation broadcast back; pass 2 is a
    //     shuffle-free projection (quantize→dequantize) + the same
    //     broadcast-probe scan as sm01. Quantization rounding uses
    //     floor(x·255 + 0.5), never round(): floor and the +0.5 add are
    //     exact-rounded IEEE on both engines, while round() hits the
    //     shortest-decimal-repr divergence DuckRound exists for. ---
    Q("sm08_sq_topk", {
      val cos = cosineSql("p.pe", "d.deq")
      s"""WITH $sqDeqCtes,
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |scored AS (
         |  SELECT p.probe_id, d.vec_id AS neighbor_id, $cos AS cosine
         |  FROM p JOIN dq d ON d.vec_id <> p.probe_id),
         |ranked AS (
         |  SELECT probe_id, neighbor_id, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      // codebook + quantize + dequantize all come from the ONE set of
      // SQ expression builders shared with the persisted-artifact path
      // (graft.index.VectorStore) — composed inline here because
      // Verify re-derives artifacts per query; a serving deployment
      // persists the codes and runs only the dequantize per scan
      val stRow = sqStatsRow(e, "embedding")
      val deq = e.crossJoin(broadcast(stRow))
        .select(col("vec_id"),
          sqDequantize(
            sqQuantize(col("embedding"), col("mns"), col("mxs")),
            col("mns"), col("mxs")).as("deq"))
      val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val scored = deq.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          cosine(col("pe"), col("deq")).as("cosine"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- IVF cell-stats report: per-cell occupancy and radius — the
    //     index-health profile an ANN deployment reviews before tuning
    //     nprobe/cells (an empty or bloated cell means the quantizer
    //     doesn't fit the data). Assignment is the same shuffle-free
    //     projection as sm03 (struct-ordered argmin, identical
    //     tie-break); the report is ONE O(cells) aggregation. The mean
    //     distance uses the exact-integer device (sum of
    //     floor(dist·2^20) as BIGINT, ONE final division): a double
    //     sum() merges in partition order and can flip the rounding
    //     boundary against the oracle — max() is order-independent and
    //     needs no such guard. ---
    Q("sm09_cell_stats", {
      val dist = l2SqSql("e.embedding", "c.ce")
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |assign AS (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT e.vec_id, c.cid, $dist AS d2,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |g AS (
         |  SELECT cid, count(*) AS n_vecs,
         |    round(CAST(CAST(sum(CAST(floor(sqrt(d2) * 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
         |          / 1048576.0 / count(*), 6) AS mean_dist,
         |    round(max(sqrt(d2)), 6) AS max_dist
         |  FROM assign GROUP BY cid)
         |SELECT c.cid, coalesce(g.n_vecs, 0) AS n_vecs,
         |  g.mean_dist, g.max_dist
         |FROM cent c LEFT JOIN g ON g.cid = c.cid
         |ORDER BY c.cid"""
    }) { (s, dir) =>
      import s.implicits._
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val assign = nearestCells(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, 1, withDist = true)
      val g = assign.groupBy("cid")
        .agg(count(lit(1)).as("n_vecs"),
          duckRound(
            sum(floor(sqrt(col("d2")) * 1048576.0).cast("long")).cast("double")
              / 1048576.0 / count(lit(1)), 6).as("mean_dist"),
          duckRound(max(sqrt(col("d2"))), 6).as("max_dist"))
      // LEFT JOIN from the centroid list (aggregate FIRST — both sides
      // of this join are O(cells)): an UNPOPULATED cell must show as
      // n_vecs = 0 with null distances — a silently missing row is
      // exactly the quantizer-misfit signal this report exists for.
      // (With corpus-vector centroids every cell holds its own
      // centroid; with a trained/external set it need not.)
      cent.map(_._1).toDF("cid")
        .join(g, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
          col("mean_dist"), col("max_dist"))
        .orderBy("cid")
    },

    // --- SemDeDup (Abbas et al. 2023): semantic dedup by clustering
    //     then within-cluster pairwise cosine — the other candidate
    //     path to dd07's LSH banding. Cells come from the sm03 coarse
    //     quantizer (shuffle-free argmin projection), so the pairwise
    //     stage is an EQUI-join on cell id: per-cell work is
    //     O((N/cells)²) and never all-pairs — at 100 TB cells scale
    //     with ~√N to bound it. The keep rule is deterministic: a
    //     vector is dropped iff a LOWER-id vector in its cell has
    //     cosine ≥ τ (the paper keeps one representative per group;
    //     min-id is the engine-exact variant). No rounding anywhere:
    //     both engines build bit-identical cosines (sm01 convention),
    //     so the τ comparison and the integer dup-counts match
    //     exactly. ---
    Q("dd12_semantic_dedup", {
      val dist = l2SqSql("e.embedding", "c.ce")
      val cos = cosineSql("ea.embedding", "eb.embedding")
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $AdaptiveCellsSql),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |dup AS (
         |  SELECT p.vb AS vec_id, count(*) AS n_dups
         |  FROM pairs p
         |  JOIN embeddings ea ON ea.vec_id = p.va
         |  JOIN embeddings eb ON eb.vec_id = p.vb
         |  WHERE $cos >= $NearDupCos
         |  GROUP BY p.vb)
         |SELECT a.vec_id, a.cid,
         |  CAST(coalesce(d.n_dups, 0) AS BIGINT) AS n_dups,
         |  coalesce(d.n_dups, 0) > 0 AS dropped
         |FROM assign a LEFT JOIN dup d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < adaptiveCells(e))
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      // persist: (vec_id, cid) longs feed both pair sides AND the
      // final report join — without it the corpus-wide argmin
      // projection runs three times (and the tiny row width means
      // none of the float-array cache tax that keeps `en` uncached)
      val assign = nearestCells(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // norms once per side (sm01 pattern); the equi-join on cid is the
      // bounded candidate generator — the filter then touches only
      // in-cell pairs. Pre-cast to double once per vector (the
      // semanticSurvivors note) so dot() doesn't re-cast per pair.
      val en = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val pairs = assign.select(col("vec_id").as("va"), col("cid"))
        .join(assign.select(col("vec_id").as("vb"), col("cid")), Seq("cid"))
        .filter(col("va") < col("vb"))
      val nrm = col("na") * col("nb")
      val dup = pairs
        .join(en.select(col("vec_id").as("va"), col("embedding").as("ea"),
          col("nrm").as("na")), Seq("va"))
        .join(en.select(col("vec_id").as("vb"), col("embedding").as("eb"),
          col("nrm").as("nb")), Seq("vb"))
        .filter(when(nrm === 0.0, lit(0.0))
          .otherwise(dot(col("ea"), col("eb")) / nrm) >= NearDupCos)
        .groupBy(col("vb").as("vec_id"))
        .agg(count(lit(1)).as("n_dups"))
      assign.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          (coalesce(col("n_dups"), lit(0L)) > 0).as("dropped"))
        .orderBy("vec_id")
    },

    // --- SEMANTIC eval decontamination (pl02/pl14's third rung): the
    //     contamination neither exact 5-grams (pl02) nor shingle
    //     MinHash (pl14) can see — an eval item REWRITTEN into the
    //     corpus shares no n-grams but sits next to it in embedding
    //     space. Bipartite corpus-vs-eval cosine via dd12's cell
    //     equi-join in pl14's broadcast-probe shape: both sides get
    //     sm03's shuffle-free coarse-quantizer assignment (corpus 1
    //     cell, eval IvfNProbe cells — the probe side over-assigns so
    //     a τ-near pair straddling a cell boundary is still caught
    //     when the eval copy probes the corpus copy's cell), then the
    //     TINY eval side (embeddings + norms carried) is BROADCAST
    //     into an equi-join on cid and cosine runs map-side on
    //     candidates only. The corpus is never shuffled AND never
    //     self-joined — at 100 TB this is one projection + one
    //     broadcast-join scan, the same per-row cost as pl23's
    //     scorer. ---
    Q("pl25_semantic_decontaminate",
      s"""WITH $semanticEvalPairCtes
         |SELECT vec_id, eval_vec_id, round(cos, 6) AS cosine
         |FROM sempairs
         |ORDER BY vec_id, eval_vec_id""") { (s, dir) =>
      semanticEvalPairsOf(s, dir)
        .select(col("vec_id"), col("eval_vec_id"),
          duckRound(col("cos"), 6).as("cosine"))
        .orderBy("vec_id", "eval_vec_id")
    },

    // --- Per-label centroid OUTLIERS: the embedding-quality filter a
    //     curation pipeline runs before training — vectors far from
    //     their group centroid are mislabeled/noise candidates. Two
    //     corpus passes: (1) per-(label, dim) EXACT integer sums
    //     (sum of floor(x·2²⁰) — double sum() merges in partition
    //     order and is not reproducible cross-engine; the Lloyd
    //     device from sm04) collected once (labels × dims = tiny);
    //     (2) a shuffle-free projection computes each vector's
    //     distance to ITS OWN label centroid (CASE over the 10
    //     label literals), then one top-5-per-label window
    //     (WindowGroupLimit-bounded). Ranks compare UNROUNDED
    //     distances — bit-identical on both engines — and only the
    //     reported column is rounded. ---
    Q("sm10_centroid_outliers",
      s"""WITH sums AS (
         |  SELECT label, pos, sum(xi) AS s, count(*) AS n FROM (
         |    SELECT label,
         |      unnest(range(1, len(embedding) + 1)) AS pos,
         |      unnest(list_transform(embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT))) AS xi
         |    FROM embeddings)
         |  GROUP BY label, pos),
         |cent AS (
         |  SELECT label, list(comp ORDER BY pos) AS ce FROM (
         |    SELECT label, pos,
         |      CAST(s AS DOUBLE) / CAST(n * $QScale AS DOUBLE) AS comp
         |    FROM sums)
         |  GROUP BY label),
         |d AS (
         |  SELECT e.vec_id, e.label,
         |    ${l2SqSql("e.embedding", "c.ce")} AS d2
         |  FROM embeddings e JOIN cent c ON c.label = e.label)
         |SELECT vec_id, label, CAST(rank AS INT) AS rank,
         |  round(sqrt(d2), 6) AS dist
         |FROM (
         |  SELECT vec_id, label, d2,
         |    row_number() OVER (PARTITION BY label
         |                       ORDER BY d2 DESC, vec_id) AS rank
         |  FROM d)
         |WHERE rank <= 5
         |ORDER BY label, rank""") { (s, dir) =>
      val e = emb(s, dir)
      // pass 1: per-(label, dim) exact integer sums → label centroids
      // on the driver (labels × 64 rows) — the shared Lloyd device
      val cents = keyedIntegerMeans(
        e.select(col("label"), col("embedding")), "label")
      // pass 2: distance to own-label centroid as a literal CASE chain
      // (shuffle-free projection), then one bounded ranking window
      val d2 = cents.foldLeft(lit(null).cast("double")) { case (acc, (l, ce)) =>
        when(col("label") === l,
          l2DistanceSq(col("embedding"), typedlit(ce))).otherwise(acc)
      }
      val w = Window.partitionBy("label")
        .orderBy(col("d2").desc, col("vec_id"))
      e.select(col("vec_id"), col("label"), d2.as("d2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("vec_id"), col("label"), col("rank"),
          duckRound(sqrt(col("d2")), 6).as("dist"))
        .orderBy("label", "rank")
    },

    // --- Cluster-balanced sampling (embedding-diversity coreset): cap
    //     every coarse cell at the same quota so the sample covers the
    //     embedding space instead of mirroring its density — the data-
    //     selection move for training mixtures (head clusters stop
    //     drowning out tail clusters). Cell assignment is sm03's
    //     shuffle-free argmin projection; within a cell the quota picks
    //     by a deterministic md5 coin (not similarity), so it's a
    //     uniform subsample of the cell. ONE exchange total (the
    //     per-cell ranking window, rank≤k ⇒ WindowGroupLimit prunes
    //     partial ranks map-side); cells scale with the corpus, so the
    //     per-cell partition stays bounded at 100 TB. ---
    Q("sm11_balanced_sample", {
      val dist = l2SqSql("e.embedding", "c.ce")
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |ranked AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY cid
         |                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rank
         |  FROM assign)
         |SELECT cid, CAST(rank AS BIGINT) AS rank, vec_id
         |FROM ranked WHERE rank <= $BalancedQuota
         |ORDER BY cid, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val assign = nearestCells(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", cent, 1)
      val w = Window.partitionBy("cid")
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      assign.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= BalancedQuota)
        .select(col("cid"), col("rank"), col("vec_id"))
        .orderBy("cid", "rank")
    },

    // --- HYBRID retrieval via Reciprocal Rank Fusion (the standard
    //     lexical+vector fusion every modern RAG stack runs): the
    //     lexical list is TF-IDF over fixed query terms (tx17's
    //     semantics — postings of the query terms only participate),
    //     the vector list is cosine-to-probe (sm01's bit-identical
    //     convention, probe = vec_id 0's embedding, the doc_id↔vec_id
    //     identification the fixtures define), each truncated to its
    //     top-$HybridK with deterministic (score DESC, id) ranks, then
    //     fused as Σ 1/(60 + rank) over the lists a doc appears in
    //     (Cormack et al.'s k=60). Determinism: lexical ranks compare
    //     ROUNDED scores (6 dp — sub-float-noise for ≤3-term sums),
    //     vector ranks compare bit-identical cosines, and the fused
    //     score is a sum of two small-integer reciprocals — exactly
    //     rounded IEEE on both engines. Scale shape: the lexical side
    //     touches only query-term postings (index-prune discipline);
    //     the vector side is ONE broadcast probe over a shuffle-free
    //     corpus projection + TakeOrdered; the fusion joins two
    //     $HybridK-row frames — at 100 TB the only corpus-width work
    //     is the two scans each side already needs. ---
    Q("sm12_hybrid_rrf", hybridRrfOracle) { (s, dir) =>
      val d = graft.tables.load(s, dir, "documents")
      val lex0 = d.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("token"))
        .filter(col("token").isin(HybridTerms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      hybridRrfFrom(s, dir, lex0, d.agg(count(lit(1)).as("n")))
    },

    // --- sm12 SERVED FROM THE INDEX ARTIFACT (tx18/tx19's build-once/
    //     query-many contract, extended to hybrid retrieval): the
    //     lexical side reads query-term postings and n_docs from the
    //     bucketed IndexStore tables instead of re-tokenizing the
    //     corpus — the plan's only raw-table scans are the embeddings
    //     the vector side genuinely needs (PlanSpec-guarded: zero
    //     `documents` scans). Same oracle text as sm12: the artifact
    //     must reproduce the fresh-scan fusion exactly. At 100 TB the
    //     lexical side's cost drops from a corpus re-tokenize to a few
    //     pruned bucket reads. ---
    Q("sm13_hybrid_rrf_from_index", hybridRrfOracle) { (s, dir) =>
      val td = graft.index.IndexStore.termDoc(s, dir)
      val lex0 = td.filter(col("token").isin(HybridTerms: _*))
        .select(col("doc_id"), col("token"), col("cnt").as("tf"))
      hybridRrfFrom(s, dir, lex0,
        graft.index.IndexStore.docStats(s, dir)
          .select(col("n_docs").as("n")))
    },

    // --- FILTERED vector search (the metadata-constrained ANN every
    //     production vector store exposes: "nearest neighbors WHERE
    //     label in allowed set"). The filter is applied PRE-search —
    //     candidates are filtered before cell assignment, so the cid
    //     equi-join only ever sees eligible vectors and every probe
    //     gets a full k of eligible neighbors; the naive alternative
    //     (post-filter an unfiltered top-k) returns < k results and
    //     loses exactly the neighbors the filter was supposed to
    //     surface. Scale shape: identical to sm03 — the predicate
    //     composes with the scan (parquet pushdown at the artifact
    //     tier), assignment stays a shuffle-free projection, and the
    //     per-probe verify work SHRINKS with filter selectivity. ---
    Q("sm14_filtered_ann",
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |${ivfSearchSql("cent", 5, s"label % 2 = 0")}""") { (s, dir) =>
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      ivfTopK(e, cent, IvfNProbe, 5, Some(col("label") % 2 === 0))
    },

    // Embedding-integrity AUDIT — the vector-side pl22: every defect
    // class that silently poisons ANN (a NaN/Inf propagates through
    // every cosine it touches, a zero vector cosines 0 against
    // everything, a dimension mismatch breaks the fold, exact
    // duplicates waste index space and skew recall measurement) is
    // counted in ONE corpus pass. The scan groups by the embedding
    // itself — the dup check needs that shuffle anyway, and every
    // other flag is a per-group projection on the key — so the audit
    // adds nothing beyond dd01's linear digest-group shape (production
    // keys the group on xxhash64 of the vector bytes; the array key
    // here is what both engines hash identically). Defects are
    // deterministically INJECTED from existing rows (the pl08/tx26
    // device) so every counter is observable on the clean testdata.
    Q("sm15_embedding_audit",
      """WITH inj AS (
        |  SELECT CAST(900001 AS BIGINT) AS vec_id,
        |    list_append(embedding[1:len(embedding)-1], CAST('nan' AS FLOAT))
        |      AS embedding
        |  FROM embeddings WHERE vec_id = 0
        |  UNION ALL
        |  SELECT 900002,
        |    list_append(embedding[1:len(embedding)-1], CAST('inf' AS FLOAT))
        |  FROM embeddings WHERE vec_id = 1
        |  UNION ALL
        |  SELECT 900003, list_transform(embedding, x -> CAST(0 AS FLOAT))
        |  FROM embeddings WHERE vec_id = 2
        |  UNION ALL
        |  SELECT 900004, embedding[1:len(embedding)-1]
        |  FROM embeddings WHERE vec_id = 3
        |  UNION ALL
        |  SELECT 900005, embedding FROM embeddings WHERE vec_id = 7
        |  UNION ALL
        |  SELECT 900006, CAST(NULL AS FLOAT[])),
        |allv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM inj),
        |grp AS (
        |  SELECT embedding, count(*) AS c FROM allv GROUP BY embedding)
        |SELECT
        |  CAST(sum(c) AS BIGINT) AS n_vecs,
        |  CAST(count(DISTINCT len(embedding)) AS BIGINT) AS n_dims,
        |  CAST(min(len(embedding)) AS BIGINT) AS dim_min,
        |  CAST(max(len(embedding)) AS BIGINT) AS dim_max,
        |  CAST(sum(CASE WHEN embedding IS NULL THEN c ELSE 0 END) AS BIGINT)
        |    AS n_null,
        |  CAST(sum(CASE WHEN len(list_filter(embedding,
        |      x -> isnan(x) OR isinf(x))) > 0 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_nonfinite,
        |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(list_filter(
        |      embedding, x -> x <> 0)) = 0 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_zero_norm,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_dup_vecs
        |FROM grp""") { (s, dir) =>
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      // persisted: the five injection seeds each point-scanned the
      // embeddings parquet — one 5-row scan feeds all five instead
      val seeds = e.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 7L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def pick(id: Long) = seeds.filter(col("vec_id") === id)
      val headless = slice(col("embedding"), lit(1),
        size(col("embedding")) - 1)
      def injected(id: Long, v: Column) =
        pick(id).select(lit(900000L + (id match {
          case 0 => 1; case 1 => 2; case 2 => 3; case 3 => 4; case 7 => 5
        })).as("vec_id"), v.as("embedding"))
      val inj = injected(0,
          concat(headless, array(lit(Float.NaN))))
        .unionByName(injected(1,
          concat(headless, array(lit(Float.PositiveInfinity)))))
        .unionByName(injected(2,
          transform(col("embedding"), _ => lit(0.0f))))
        .unionByName(injected(3, headless))
        .unionByName(injected(7, col("embedding")))
        .unionByName(s.range(1).select(lit(900006L).as("vec_id"),
          lit(null).cast("array<float>").as("embedding")))
      val grp = e.unionByName(inj)
        .groupBy("embedding").agg(count(lit(1)).as("c"))
      val nonfinite = size(filter(col("embedding"),
        x => isnan(x) || abs(x) === lit(Float.PositiveInfinity))) > 0
      val zeroNorm = col("embedding").isNotNull &&
        size(filter(col("embedding"), x => x =!= lit(0.0f))) === 0
      grp.agg(
        sum("c").as("n_vecs"),
        countDistinct(size(col("embedding"))).as("n_dims"),
        min(size(col("embedding"))).cast("long").as("dim_min"),
        max(size(col("embedding"))).cast("long").as("dim_max"),
        sum(when(col("embedding").isNull, col("c")).otherwise(0L)).as("n_null"),
        sum(when(nonfinite, col("c")).otherwise(0L)).as("n_nonfinite"),
        sum(when(zeroNorm, col("c")).otherwise(0L)).as("n_zero_norm"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_vecs"))
    },

    // Two-stage TRUNCATED-DIMENSION rerank (the Matryoshka/MRL serving
    // pattern — Kusupati et al. 2022): stage 1 scores every candidate
    // on only the first 16 of 64 dimensions, stage 2 reranks the
    // per-probe shortlist with the exact full-dimension cosine. Why
    // this is a distinct rung of the ladder (vs sm03's cell pruning or
    // sm08's quantization): the coarse representation is a PREFIX of
    // the same vector, so at 100 TB the stage-1 scan reads a ¼-width
    // column (stored as its own column, column-pruned at the scan —
    // here a `slice` projection over the one test column) and the
    // full-precision vectors are fetched for only |probes|×50 rows.
    // Plan shape: both probe frames broadcast (bounded, the sm01
    // argument); the stage-1 window is WindowGroupLimit-guarded so
    // only ≤ 50 rows per probe per partition reach the rank shuffle;
    // the stage-2 fetch is a BROADCAST semi-fetch of the ≤ 1000-row
    // shortlist into a second corpus scan — no shuffle anywhere.
    // Exactness: the output carries prefix_rank next to rank, so the
    // result itself exhibits the reorderings the rerank performed
    // (prefix_rank ≠ rank rows are the stage-1 mistakes stage 2
    // fixed). Cosines are the sm01 bit-identical convention on both
    // stages; the shortlist cut at rank 50 compares bit-identical
    // prefix cosines, so the candidate sets agree exactly.
    Q("sm16_prefix_rerank", {
      val pcos = cosineSql("p.qp", "c.pfx")
      val cos = cosineSql("q.pe", "f.embedding")
      s"""WITH c AS (
         |  SELECT vec_id, embedding[1:$PrefixDims] AS pfx FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, pfx AS qp FROM c
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |s1 AS (
         |  SELECT p.probe_id, c.vec_id, $pcos AS pcos
         |  FROM p JOIN c ON c.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, prank FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY pcos DESC, vec_id) AS prank
         |    FROM s1)
         |  WHERE prank <= $RerankShortlist),
         |q AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |rer AS (
         |  SELECT sh.probe_id, sh.vec_id AS neighbor_id, sh.prank,
         |    $cos AS cosine
         |  FROM short sh
         |  JOIN embeddings f ON f.vec_id = sh.vec_id
         |  JOIN q ON q.probe_id = sh.probe_id)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(prank AS INT) AS prefix_rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, neighbor_id, prank, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM rer)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      // stage 1: only the 16-float prefix travels through the scored
      // frame — norms once per side (sm01 pattern)
      val pfx = e.select(col("vec_id"),
          slice(col("embedding"), 1, PrefixDims).as("pfx"))
        .withColumn("pn", l2Norm(col("pfx")))
      val probes1 = pfx
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("pfx").as("qp"),
          col("pn").as("qn"))
      val n1 = col("qn") * col("pn")
      val s1 = pfx.join(broadcast(probes1), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          when(n1 === 0.0, lit(0.0))
            .otherwise(dot(col("qp"), col("pfx")) / n1).as("pcos"))
      val w1 = Window.partitionBy("probe_id")
        .orderBy(col("pcos").desc, col("vec_id"))
      val shortlist = s1.withColumn("prank", row_number().over(w1))
        .filter(col("prank") <= RerankShortlist)
        .select("probe_id", "vec_id", "prank")
      // stage 2: broadcast the ≤ |probes|×50-row shortlist into a
      // second corpus scan (the id fetch), exact full-dim rerank
      val full = e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val probes2 = full
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      val n2 = col("pnrm") * col("nrm")
      val rer = full.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes2), Seq("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("prank"),
          when(n2 === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n2).as("cosine"))
      val w2 = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      rer.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("prank").as("prefix_rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // QUANTIZED-shortlist + exact REFINE (the "SQ + refine" serving
    // composition every production vector store runs — sm16's rerank
    // stage over sm08's compressed representation instead of a
    // dimension prefix): stage 1 scores the whole corpus against the
    // int8-dequantized codes — at 100 TB that scan reads the 4×-
    // compressed code column, which is the memory-residency win SQ
    // exists for — stage 2 fetches full-precision vectors for only
    // the per-probe 50-shortlist and re-scores exactly. The refine
    // stage buys back the quantization error: recall@10 is pinned ≥
    // sm08's in `AnnRecallSpec` (structural dominance — sm08's top-10
    // is a subset of the shortlist) and measures near-exact. Plan
    // shape identical to sm16: bounded probe broadcasts, Window-
    // GroupLimit shortlist cut, broadcast semi-fetch, zero corpus
    // shuffles.
    Q("sm17_sq_rerank", {
      val qcos = cosineSql("p.pe", "d.deq")
      val cos = cosineSql("q.pe", "f.embedding")
      s"""WITH $sqDeqCtes,
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |s1 AS (
         |  SELECT p.probe_id, d.vec_id, $qcos AS qcos
         |  FROM p JOIN dq d ON d.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, qrank FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY qcos DESC, vec_id) AS qrank
         |    FROM s1)
         |  WHERE qrank <= $RerankShortlist),
         |q AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |rer AS (
         |  SELECT sh.probe_id, sh.vec_id AS neighbor_id, sh.qrank,
         |    $cos AS cosine
         |  FROM short sh
         |  JOIN embeddings f ON f.vec_id = sh.vec_id
         |  JOIN q ON q.probe_id = sh.probe_id)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(qrank AS INT) AS sq_rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, neighbor_id, qrank, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM rer)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      // stage 1: sm08's codebook chain — quantize+dequantize inline
      // (a serving deployment reads the persisted codes instead:
      // graft.index.VectorStore)
      val stRow = sqStatsRow(e, "embedding")
      val deq = e.crossJoin(broadcast(stRow))
        .select(col("vec_id"),
          sqDequantize(
            sqQuantize(col("embedding"), col("mns"), col("mxs")),
            col("mns"), col("mxs")).as("deq"))
      val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val s1 = deq.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosine(col("pe"), col("deq")).as("qcos"))
      val w1 = Window.partitionBy("probe_id")
        .orderBy(col("qcos").desc, col("vec_id"))
      val shortlist = s1.withColumn("qrank", row_number().over(w1))
        .filter(col("qrank") <= RerankShortlist)
        .select("probe_id", "vec_id", "qrank")
      // stage 2: exact rerank of the fetched shortlist (sm16 pattern)
      val full = e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val probes2 = full
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      val n2 = col("pnrm") * col("nrm")
      val rer = full.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes2), Seq("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("qrank"),
          when(n2 === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n2).as("cosine"))
      val w2 = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      rer.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("qrank").as("sq_rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // sm17 SERVED FROM THE ARTIFACT (the tx19/sm13 build-once/serve-
    // many contract, vector-side): `VectorStore.serveTopKRefined` —
    // IVF cell pruning over the cid-PARTITIONED int8 code table, a
    // 50-shortlist on the dequantized cosine, then the exact rerank
    // against the store's own cid-partitioned `_raw` table (broadcast
    // semi-fetch of the bounded shortlist). The plan touches ONLY
    // artifact tables — `VectorRefineSpec` additionally proves the
    // whole path bit-equal to an independent pure-Scala
    // implementation and that the raw side honors deletes through
    // compaction. Differs from sm17 exactly as sm06 differs from
    // sm05: candidates come from the probed cells, not a full scan —
    // the oracle composes the same IVF assignment on top of sm17's
    // quantize/refine chain.
    Q("sm18_refined_from_store", {
      val qcos = cosineSql("p.pe", "d.deq")
      val cos = cosineSql("q.pe", "f.embedding")
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      s"""WITH $sqDeqCtes,
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < ${graft.index.VectorStore.AdaptiveCellsSql}),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM p CROSS JOIN cent c)
         |  WHERE rn <= ${graft.index.VectorStore.NProbe}),
         |qscored AS (
         |  SELECT p.probe_id, d.vec_id, $qcos AS qcos
         |  FROM p
         |  JOIN pcells pc ON pc.probe_id = p.probe_id
         |  JOIN assign a ON a.cid = pc.cid
         |  JOIN dq d ON d.vec_id = a.vec_id AND d.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, qrank FROM (
         |    SELECT probe_id, vec_id,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY qcos DESC, vec_id) AS qrank
         |    FROM qscored)
         |  WHERE qrank <= $RerankShortlist),
         |q AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |rer AS (
         |  SELECT sh.probe_id, sh.vec_id AS neighbor_id, sh.qrank,
         |    $cos AS cosine
         |  FROM short sh
         |  JOIN embeddings f ON f.vec_id = sh.vec_id
         |  JOIN q ON q.probe_id = sh.probe_id)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(qrank AS INT) AS sq_rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, neighbor_id, qrank, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM rer)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val store = graft.index.VectorStore.storeFor(s, dir)
      val probes = emb(s, dir)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.index.VectorStore
        .serveTopKRefined(probes, store, shortlist = RerankShortlist)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          col("qrank").as("sq_rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- FILTERED ANN SERVED FROM THE ARTIFACT (sm27 — sm14's
    //     pre-filter contract on sm18's build-once path, completing
    //     the store's serving ladder sm06 → sm14 → sm18 → sm25 → this:
    //     the production "nearest neighbors WHERE ..." surface a
    //     deployment actually exposes): the eligibility predicate
    //     (vec_id % 3 = 0 — an attribute the code table itself
    //     carries) is applied BEFORE scoring via
    //     `VectorStore.serveTopKFiltered`, so candidates are filtered
    //     map-side INSIDE the partition-pruned codes scan — no join,
    //     no extra shuffle, per-probe verify work shrinks ~3× with
    //     selectivity — and every probe returns a full k of ELIGIBLE
    //     neighbors (post-filtering an unfiltered top-k silently
    //     returns fewer; the sm14 dominance argument). A predicate
    //     over attributes the artifact does not carry is the
    //     documented fallback: an id-frame semi-join upstream, or
    //     (the production move) write the hot attribute into the code
    //     table. Oracle = sm18's store mirror minus the refine, with
    //     the same predicate in the candidate CTE. ---
    Q("sm27_filtered_from_store", {
      val qcos = cosineSql("p.pe", "d.deq")
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      s"""WITH $sqDeqCtes,
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < ${graft.index.VectorStore.AdaptiveCellsSql}),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM p CROSS JOIN cent c)
         |  WHERE rn <= ${graft.index.VectorStore.NProbe}),
         |scored AS (
         |  SELECT p.probe_id, d.vec_id, $qcos AS cosine
         |  FROM p
         |  JOIN pcells pc ON pc.probe_id = p.probe_id
         |  JOIN assign a ON a.cid = pc.cid
         |  JOIN dq d ON d.vec_id = a.vec_id AND d.vec_id <> p.probe_id
         |    AND d.vec_id % 3 = 0)
         |SELECT probe_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
         |  round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val store = graft.index.VectorStore.storeFor(s, dir)
      val probes = emb(s, dir)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.index.VectorStore
        .serveTopKFiltered(probes, store, col("vec_id") % 3 === 0)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- sm28: sm27 under EXTREME selectivity with AUTO-WIDENING
    //     (round-17 verdict #2 — the measured 1%-selectivity arc left
    //     some probes with fewer than k eligible vectors IN their
    //     nprobe cells, and the fix was a documented manual knob):
    //     `serveTopKFiltered(widenTo = 64)` re-probes exactly the
    //     short probes with doubled nprobe until they fill or the cap
    //     hits, so every probe returns a full k of ELIGIBLE neighbors
    //     whenever ≥ k eligible vectors exist store-wide — while full
    //     probes' results and cost are untouched (their cells are
    //     never re-scanned; `AutoWidenSpec` pins it). Per-probe
    //     semantics — results from the FIRST doubling level
    //     (2,4,8,...,64) whose probed cells hold ≥ k eligible — are
    //     mirrored exactly by the oracle's level-counting CTEs. The
    //     % 37 predicate is the short-k regime at the test SFs
    //     (~2.7% eligible: base cells hold ~3 eligible per probe at
    //     sf0.001). ---
    Q("sm28_filtered_autowiden", {
      val qcos = cosineSql("p.pe", "d.deq")
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      s"""WITH $sqDeqCtes,
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < ${graft.index.VectorStore.AdaptiveCellsSql}),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pcells AS (
         |  SELECT probe_id, cid, rn FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM p CROSS JOIN cent c)),
         |elig AS (
         |  SELECT p.probe_id, d.vec_id, pc.rn, $qcos AS cosine
         |  FROM p
         |  JOIN pcells pc ON pc.probe_id = p.probe_id
         |  JOIN assign a ON a.cid = pc.cid
         |  JOIN dq d ON d.vec_id = a.vec_id AND d.vec_id <> p.probe_id
         |    AND d.vec_id % 37 = 0),
         |lv AS (SELECT unnest([2, 4, 8, 16, 32, 64]) AS np),
         |cnt AS (
         |  SELECT e.probe_id, lv.np, count(*) AS n
         |  FROM elig e JOIN lv ON e.rn <= lv.np
         |  GROUP BY e.probe_id, lv.np),
         |chosen AS (
         |  SELECT p.probe_id,
         |    coalesce((SELECT min(np) FROM cnt
         |              WHERE cnt.probe_id = p.probe_id
         |                AND cnt.n >= ${graft.index.VectorStore.TopK}),
         |             64) AS np
         |  FROM p),
         |scored AS (
         |  SELECT e.probe_id, e.vec_id, e.cosine
         |  FROM elig e JOIN chosen ch ON ch.probe_id = e.probe_id
         |  WHERE e.rn <= ch.np)
         |SELECT probe_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
         |  round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= ${graft.index.VectorStore.TopK}
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val store = graft.index.VectorStore.storeFor(s, dir)
      val probes = emb(s, dir)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.index.VectorStore
        .serveTopKFiltered(probes, store, col("vec_id") % 37 === 0,
          widenTo = 64)
        .select(col("probe_id"), col("neighbor_id"), col("rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- sm19: ANN serving-quality EVAL as a query — per-probe
    //     recall@10 of the IVF-pruned path (sm03's exact
    //     configuration) against the brute-force exact baseline
    //     (sm01's). The metric every ANN deployment watches ships here
    //     as a first-class operator instead of test-only plumbing
    //     (`AnnRecallSpec` pins FLOORS at build time; this measures the
    //     actual per-probe value on the serving corpus, which is what
    //     a recall dashboard ingests). Cost shape: the exact side is
    //     the sm01 boundedness argument (≤20 broadcast probes × one
    //     corpus scan — offline eval at sampled probes, not a serving
    //     path), the approx side is the partition-pruned IVF search
    //     itself; the intersection join carries ≤ probes×10 rows.
    //     Denominator = the probe's exact-neighbor count (= 10 unless
    //     the corpus has fewer candidates), so the metric stays defined
    //     at any SF. Rank boundaries are deterministic cross-engine:
    //     both sides order by the UNROUNDED cosine (bit-identical
    //     left-fold doubles) then neighbor_id. ---
    Q("sm19_ivf_recall", {
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      val icos = cosineSql("p.pe", "v.embedding")
      val xcos = cosineSql("p.pe", "x.embedding")
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < $IvfCells),
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |  WHERE vec_id % 25 = 0 AND vec_id < 500),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM probes p CROSS JOIN cent c)
         |  WHERE rn <= $IvfNProbe),
         |iscored AS (
         |  SELECT p.probe_id, v.vec_id AS neighbor_id, $icos AS cosine
         |  FROM probes p
         |  JOIN pcells pc ON pc.probe_id = p.probe_id
         |  JOIN assign a ON a.cid = pc.cid
         |  JOIN embeddings v ON v.vec_id = a.vec_id AND v.vec_id <> p.probe_id),
         |ivf AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM iscored)
         |  WHERE rank <= 10),
         |xscored AS (
         |  SELECT p.probe_id, x.vec_id AS neighbor_id, $xcos AS cosine
         |  FROM probes p JOIN embeddings x ON x.vec_id <> p.probe_id),
         |exact AS (
         |  SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY cosine DESC, neighbor_id) AS rank
         |    FROM xscored)
         |  WHERE rank <= 10),
         |nx AS (SELECT probe_id, count(*) AS n FROM exact GROUP BY probe_id),
         |hits AS (
         |  SELECT x.probe_id, count(*) AS hits
         |  FROM exact x JOIN ivf i
         |    ON i.probe_id = x.probe_id AND i.neighbor_id = x.neighbor_id
         |  GROUP BY x.probe_id)
         |SELECT p.probe_id,
         |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / nx.n, 4) AS recall
         |FROM probes p
         |JOIN nx ON nx.probe_id = p.probe_id
         |LEFT JOIN hits h ON h.probe_id = p.probe_id
         |ORDER BY p.probe_id"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val cent = collectCentroids(e.filter(col("vec_id") < IvfCells)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val ivf = ivfTopK(e, cent, IvfNProbe, 10)
        .select("probe_id", "neighbor_id")
      // exact baseline — the sm01 path at the same probe set
      val en = e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val probes = en.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      val n = col("pnrm") * col("nrm")
      val scored = en.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          when(n === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n).as("cosine"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      // persisted: the exact top-k frame (≤ probes × k rows) feeds
      // both the per-probe denominator and the hit join — unpersisted,
      // the whole brute-force score+rank pass planned and ran twice
      val exact = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("probe_id", "neighbor_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nx = exact.groupBy("probe_id").agg(count(lit(1)).as("n"))
      val hits = exact.join(ivf, Seq("probe_id", "neighbor_id"))
        .groupBy("probe_id").agg(count(lit(1)).as("hits"))
      probes.select("probe_id")
        .join(nx, Seq("probe_id"))
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          duckRound(coalesce(col("hits"), lit(0L)).cast("double") / col("n"), 4)
            .as("recall"))
        .orderBy("probe_id")
    },

    // --- IVF-PQ with RESIDUAL encoding (the FAISS production default
    //     sm06 simplifies away: codes quantize r = x − q1(x), the
    //     vector MINUS its coarse centroid, not x itself — residual
    //     norms are much smaller than raw norms, so the same 8
    //     sub-centroids quantize a tighter ball and the same byte
    //     budget reconstructs finer; Jégou et al. 2011 §IV.C). The LUT
    //     becomes per-(probe, CELL): the probe's residual differs in
    //     every probed cell, so the table carries probes × nprobe × M
    //     × K entries — still probe-bounded, still broadcast. Cost
    //     shape is EXACTLY sm06's otherwise: shuffle-free residual +
    //     code projections, cell equi-join candidates, no corpus
    //     self-join. Residual sub-codebook seeded from the residuals
    //     of vec_id 8..15 (the first 8 NON-centroid vectors — the
    //     centroids' own residuals are zero). ---
    Q("sm20_ivfpq_residual", {
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      val codeDist = l2SqSql("list_slice(r.rv, s.m*8 + 1, s.m*8 + 8)", "s.cs")
      val lutDist = l2SqSql("list_slice(pr.pr, s.m*8 + 1, s.m*8 + 8)", "s.cs")
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
         |  FROM embeddings WHERE vec_id < 8),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |resid AS (
         |  SELECT e.vec_id, a.cid,
         |    list_transform(range(1, len(e.embedding) + 1),
         |      i -> CAST(e.embedding[i] AS DOUBLE) - c.ce[i]) AS rv
         |  FROM embeddings e
         |  JOIN assign a ON a.vec_id = e.vec_id
         |  JOIN cent c ON c.cid = a.cid),
         |rcent AS (
         |  SELECT vec_id - 8 AS rid, rv AS rc FROM resid
         |  WHERE vec_id >= 8 AND vec_id < 16),
         |rsub AS (
         |  SELECT rid, m, list_slice(rc, m*8 + 1, m*8 + 8) AS cs
         |  FROM rcent CROSS JOIN (SELECT unnest(range(0, 8)) AS m)),
         |codes AS (
         |  SELECT vec_id, cid, m, rid AS code FROM (
         |    SELECT r.vec_id, r.cid, s.m, s.rid,
         |      row_number() OVER (PARTITION BY r.vec_id, s.m
         |                         ORDER BY $codeDist, s.rid) AS rn
         |    FROM resid r CROSS JOIN rsub s)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |  WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM probes p CROSS JOIN cent c)
         |  WHERE rn <= $IvfNProbe),
         |pres AS (
         |  SELECT pc.probe_id, pc.cid,
         |    list_transform(range(1, len(p.pe) + 1),
         |      i -> CAST(p.pe[i] AS DOUBLE) - c.ce[i]) AS pr
         |  FROM pcells pc
         |  JOIN probes p ON p.probe_id = pc.probe_id
         |  JOIN cent c ON c.cid = pc.cid),
         |lut AS (
         |  SELECT pr.probe_id, pr.cid, s.m, s.rid, $lutDist AS d
         |  FROM pres pr CROSS JOIN rsub s),
         |joined AS (
         |  SELECT pc.probe_id, cd.vec_id, cd.m, l.d
         |  FROM pcells pc
         |  JOIN codes cd ON cd.cid = pc.cid AND cd.vec_id <> pc.probe_id
         |  JOIN lut l ON l.probe_id = pc.probe_id AND l.cid = pc.cid
         |            AND l.m = cd.m AND l.rid = cd.code),
         |scored AS (
         |  SELECT probe_id, vec_id, round($pqTotalSql, 6) AS adist
         |  FROM joined GROUP BY probe_id, vec_id)
         |SELECT probe_id, vec_id AS neighbor_id,
         |  CAST(rank AS BIGINT) AS rank, adist
         |FROM (
         |  SELECT probe_id, vec_id, adist,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY adist, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      import s.implicits._
      val e = emb(s, dir)
      val cents = collectCentroids(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")))
      val centMap = map(cents.flatMap { case (cid, ce) =>
        Seq(lit(cid), typedlit(ce)) }: _*)
      // residual projection: shuffle-free (centroids are literals)
      val resid = nearestCells(
          e.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", cents, 1, carry = Seq("embedding"))
        .withColumn("rv", zip_with(
          col("embedding").cast("array<double>"),
          element_at(centMap, col("cid")),
          (x, c) => x - c))
      // residual sub-codebook: driver-computed residuals of vecs 8..15
      // under the SAME argmin/fold order as the engine projections
      val seedRows = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1)
      val rcents: Seq[(Long, Seq[Double])] = seedRows.map { case (id, v) =>
        val cid = cents.map { case (c, ce) => (l2sqRef(v, ce), c) }.min._2
        val ce = cents.find(_._1 == cid).get._2
        (id - 8, v.zip(ce).map { case (x, c) => x - c })
      }
      // persisted: boundary before the candidate join (the sm05 note)
      val coded = resid.select(
        col("vec_id") +: col("cid") +: pqCodeColsOn(col("rv"), rcents): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probeRows = e
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1)
      // per-(probe, cell) LUT: the probe residual differs per cell
      val plut = probeRows.flatMap { case (pid, pv) =>
        cents.map { case (c, ce) => (l2sqRef(pv, ce), c) }
          .sorted.take(IvfNProbe).map(_._2).map { cid =>
            val ce = cents.find(_._1 == cid).get._2
            val pr = pv.zip(ce).map { case (x, c) => x - c }
            (pid, cid, (0 until PqM).map(m =>
              rcents.map { case (_, rc) =>
                l2sqRef(pr.slice(m * PqSub, (m + 1) * PqSub),
                  pqCentSlice(rc, m))
              }))
          }
      }.toDF("probe_id", "cid", "lut")
      val w = Window.partitionBy("probe_id")
        .orderBy(col("adist"), col("vec_id"))
      plut.select("probe_id", "cid").join(coded, Seq("cid"))
        .filter(col("vec_id") =!= col("probe_id"))
        .join(broadcast(plut), Seq("probe_id", "cid"))
        .withColumn("adist", duckRound(pqScore, 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("adist"))
        .orderBy("probe_id", "rank")
    },

    // --- DIVERSITY-filtered top-k (result near-dup suppression — the
    //     rerank every RAG stack runs so the 10 slots aren't 10 copies
    //     of one passage): a shortlist member whose cosine to any
    //     BETTER-ranked member is ≥ τ drops before the final top-k.
    //     This is the ONE-SHOT dominance relaxation of greedy MMR
    //     (Carbonell & Goldstein 1998), chosen deliberately: a
    //     suppressed member here still suppresses others (greedy
    //     wouldn't let it), which over-suppresses slightly but makes
    //     the operator pure SET ALGEBRA — shortlist self-join +
    //     anti-join — instead of a k-step sequential loop no engine
    //     parallelizes. Cost shape: the sm01 scored scan, then
    //     everything is SHORTLIST-bounded — the pair join carries ≤
    //     probes × 50 × 50 rows at ANY corpus size. `short_rank`
    //     travels next to `rank` so the output exhibits exactly which
    //     slots diversity re-opened. ---
    Q("sm21_diverse_topk", {
      val cos = cosineSql("p.pe", "e.embedding")
      val pairCos = cosineSql("ea.embedding", "eb.embedding")
      s"""WITH p AS (
         |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |  WHERE vec_id % 25 = 0 AND vec_id < 500),
         |scored AS (
         |  SELECT p.probe_id, e.vec_id, $cos AS cosine
         |  FROM p JOIN embeddings e ON e.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, cosine, srank FROM (
         |    SELECT probe_id, vec_id, cosine,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY cosine DESC, vec_id) AS srank
         |    FROM scored)
         |  WHERE srank <= $RerankShortlist),
         |sup AS (
         |  SELECT DISTINCT a.probe_id, a.vec_id
         |  FROM short a
         |  JOIN short b ON b.probe_id = a.probe_id AND b.srank < a.srank
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE $pairCos >= $DiversityTau),
         |surv AS (
         |  SELECT s.probe_id, s.vec_id, s.cosine, s.srank
         |  FROM short s
         |  WHERE NOT EXISTS (SELECT 1 FROM sup
         |                    WHERE sup.probe_id = s.probe_id
         |                      AND sup.vec_id = s.vec_id))
         |SELECT probe_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(srank AS INT) AS short_rank, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, vec_id, cosine, srank,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY srank) AS rank
         |  FROM surv)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      val en = e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val probes = en
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      val n = col("pnrm") * col("nrm")
      val scored = en.join(broadcast(probes),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"), col("embedding"),
          col("nrm"),
          when(n === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n).as("cosine"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("vec_id"))
      // shortlist persists: it feeds both sides of the pair join AND
      // the survivor anti-join (callers own the cache lifecycle)
      val short = scored.withColumn("srank", row_number().over(w))
        .filter(col("srank") <= RerankShortlist)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = short.select(col("probe_id"), col("vec_id"),
        col("srank"), col("embedding").as("a_vec"), col("nrm").as("a_nrm"))
      val b = short.select(col("probe_id"),
        col("srank").as("b_rank"), col("embedding").as("b_vec"),
        col("nrm").as("b_nrm"))
      val pn = col("a_nrm") * col("b_nrm")
      val sup = a.join(b, Seq("probe_id"))
        .filter(col("b_rank") < col("srank"))
        .filter(when(pn === 0.0, lit(0.0))
          .otherwise(dot(col("a_vec"), col("b_vec")) / pn)
          >= DiversityTau)
        .select("probe_id", "vec_id").distinct()
      val w2 = Window.partitionBy("probe_id").orderBy("srank")
      short.join(sup, Seq("probe_id", "vec_id"), "left_anti")
        .withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("rank").cast("int").as("rank"),
          col("srank").cast("int").as("short_rank"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- nprobe TUNING PROFILE: recall@10 vs exact at nprobe ∈
    //     {1,2,4,8} in ONE query — the curve an operator reads before
    //     setting a store's serving nprobe (sm19 measures one point;
    //     tuning needs the whole frontier, and running sm19 per level
    //     re-scans candidates per level). Probe cells are ranked ONCE
    //     (shuffle-free sorted-struct projection, rn ≤ widest level);
    //     candidates are scored ONCE at the widest level carrying the
    //     cell rn; each level is then a GENERATOR fan-out (explode of
    //     the 4-literal level array — no join, no BNLJ) + rn filter +
    //     per-(level, probe) rank. Per-probe hit counts are monotone
    //     non-decreasing in nprobe by construction: a candidate that
    //     displaces a true top-10 hit has higher cosine, hence is a
    //     true hit itself (asserted in AnnRecallSpec). Mean recall via
    //     the exact-integer device — sum(hits)/sum(n) in ONE division
    //     (probes share n, so micro == macro average) — so no
    //     float-accumulation order can flip the round-4 hash. ---
    Q("sm22_nprobe_profile",
      s"""WITH $nprobeProfileCtes
         |SELECT np AS nprobe, CAST(count(*) AS BIGINT) AS n_probes,
         |  round(CAST(sum(hits) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4)
         |    AS mean_recall,
         |  round(min(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE)), 4)
         |    AS min_recall
         |FROM base GROUP BY np ORDER BY np""") { (s, dir) =>
      val (_, _, perLevel) = nprobeStages(s, dir)
      perLevel
        .select(col("np").as("nprobe"), col("n_probes"),
          col("mean_recall"), col("min_recall"))
        .orderBy("nprobe")
    },

    // --- sm26: AUTO-nprobe serving (sm22's profile turned into a
    //     DECISION, in-plan: the profile names the recall/cost
    //     frontier, this query picks the CHEAPEST level whose measured
    //     mean recall clears the target and serves the IVF top-k AT
    //     that level — the auto-tuning loop a deployment otherwise
    //     runs by hand, with zero driver-side decisions: the chosen
    //     level is a 1-row frame broadcast into the candidate filter,
    //     so the plan itself adapts to what the profile measured.
    //     Candidates are scored ONCE at the widest level (the sm22
    //     device) — choosing a level is a FILTER on the carried cell
    //     rank, never a re-scan. Falls back to the widest profiled
    //     level when nothing clears the target; the pick compares the
    //     ROUNDED mean (the pl04 rule: never branch on raw doubles
    //     across engines). ---
    Q("sm26_auto_nprobe", {
      val target = AutoNprobeTarget
      s"""WITH $nprobeProfileCtes,
         |profile AS (
         |  SELECT np,
         |    round(CAST(sum(hits) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 4)
         |      AS mean_recall
         |  FROM base GROUP BY np),
         |chosen AS (
         |  SELECT coalesce(min(np), 8) AS cnp FROM profile
         |  WHERE mean_recall >= $target)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(cnp AS INT) AS nprobe, round(cosine, 6) AS cosine
         |FROM (
         |  SELECT i.probe_id, i.neighbor_id, i.cosine, c.cnp,
         |    row_number() OVER (PARTITION BY i.probe_id
         |                       ORDER BY i.cosine DESC, i.neighbor_id)
         |      AS rank
         |  FROM iscored i CROSS JOIN chosen c
         |  WHERE i.rn <= c.cnp)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val (_, iscored, perLevel) = nprobeStages(s, dir)
      val chosen = perLevel
        .filter(col("mean_recall") >= AutoNprobeTarget)
        .agg(coalesce(min("np"), lit(8)).as("cnp"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      iscored.crossJoin(broadcast(chosen))
        .filter(col("rn") <= col("cnp"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"),
          col("rank").cast("int").as("rank"),
          col("cnp").cast("int").as("nprobe"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- BINARY (1-bit) quantization search + exact rerank (sm24 —
    //     the cheapest rung of the compression ladder, below sm08's
    //     int8 SQ and sm05's PQ: ONE SIGN BIT per dimension, 64 dims
    //     → two BIGINT words, 32× compression over float32 — the
    //     binary-quantization mode production vector stores ship
    //     because stage-1 candidate generation becomes XOR + popcount
    //     over register-resident words, no float math at all; at
    //     100 TB the whole bit index for a billion vectors is 16 GB).
    //     The corpus is zero-centered by construction (sm15 audits
    //     it), so the binarization threshold is the CONSTANT 0.0 —
    //     production would mean-center per dim first, but a float
    //     per-dim mean depends on engine summation order and the
    //     constant keeps every bit exactly reproducible cross-engine
    //     (the pl15 determinism rule). Hamming approximates angle
    //     (Charikar 2002: P[bit differs] = θ/π per hyperplane —
    //     axis-aligned planes here, the sign-bit special case), so
    //     stage 2 reranks the 50-shortlist with exact cosine (the
    //     sm16/sm17 composition) and ham_rank/hamming ride along to
    //     exhibit the reorderings. Bits pack as sums of DISJOINT
    //     powers of two — exact integers, stage 1 has zero float
    //     parity surface. ---
    Q("sm24_binary_rerank", {
      val cos = cosineSql("q.pe", "f.embedding")
      def wordSql(off: Int): String =
        s"CAST(list_sum(list_transform(range(1, 33), i -> " +
          s"CASE WHEN embedding[i + $off] >= 0 " +
          s"THEN (CAST(1 AS BIGINT) << (i - 1)) " +
          s"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
      s"""WITH w AS (
         |  SELECT vec_id, ${wordSql(0)} AS w0, ${wordSql(32)} AS w1
         |  FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, w0 AS q0, w1 AS q1 FROM w
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |s1 AS (
         |  SELECT p.probe_id, c.vec_id,
         |    bit_count(xor(c.w0, p.q0)) + bit_count(xor(c.w1, p.q1)) AS ham
         |  FROM p JOIN w c ON c.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, ham, hrank FROM (
         |    SELECT probe_id, vec_id, ham,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY ham, vec_id) AS hrank
         |    FROM s1)
         |  WHERE hrank <= $RerankShortlist),
         |q AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |rer AS (
         |  SELECT sh.probe_id, sh.vec_id AS neighbor_id, sh.ham,
         |    sh.hrank, $cos AS cosine
         |  FROM short sh
         |  JOIN embeddings f ON f.vec_id = sh.vec_id
         |  JOIN q ON q.probe_id = sh.probe_id)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(hrank AS INT) AS ham_rank, CAST(ham AS INT) AS hamming,
         |  round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, neighbor_id, ham, hrank, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM rer)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val e = emb(s, dir)
      // stage 1: only the two packed words travel through the scored
      // frame — disjoint powers of two sum exactly
      def word(off: Int): Column =
        aggregate(zip_with(slice(col("embedding"), off + 1, 32),
          array((0 until 32).map(i => lit(1L << i)): _*),
          (x, p) => when(x >= lit(0.0f), p).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x)
      val w = e.select(col("vec_id"), word(0).as("w0"), word(32).as("w1"))
      val probes1 = w
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("w0").as("q0"),
          col("w1").as("q1"))
      val s1 = w.join(broadcast(probes1), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (bit_count(col("w0").bitwiseXOR(col("q0"))) +
            bit_count(col("w1").bitwiseXOR(col("q1")))).as("ham"))
      val w1r = Window.partitionBy("probe_id")
        .orderBy(col("ham"), col("vec_id"))
      val shortlist = s1.withColumn("hrank", row_number().over(w1r))
        .filter(col("hrank") <= RerankShortlist)
        .select("probe_id", "vec_id", "ham", "hrank")
      // stage 2: exact full-precision rerank of the bounded shortlist
      // (the sm16 semi-fetch — broadcast the ≤ probes×50 rows)
      val full = e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm"))
      val probes2 = full
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("nrm").as("pnrm"))
      val n2 = col("pnrm") * col("nrm")
      val rer = full.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes2), Seq("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("ham"), col("hrank"),
          when(n2 === 0.0, lit(0.0))
            .otherwise(dot(col("pe"), col("embedding")) / n2).as("cosine"))
      val w2 = Window.partitionBy("probe_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      rer.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= 10)
        .select(col("probe_id"), col("neighbor_id"),
          col("rank").cast("int").as("rank"),
          col("hrank").cast("int").as("ham_rank"),
          col("ham").cast("int").as("hamming"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    },

    // --- sm25: BINARY serving FROM THE ARTIFACT (sm24's build-once/
    //     serve-many twin — the vector-side tx18→tx19 move for the
    //     cheapest ladder rung, completing the store's serving ladder
    //     sm06→sm14→sm18→this): stage 1 ranks by Hamming over the
    //     store's cid-partitioned `_bits` table — 16 bytes/vector
    //     where the int8 codes take 64 and `_raw` 512, the structure
    //     a 100 TB deployment keeps RAM-resident when even the code
    //     table doesn't fit — candidates partition-pruned to the
    //     probes' nprobe cells (sm24 scans ALL bits; the store path
    //     adds IVF pruning), stage 2 exact-reranks the 50-shortlist
    //     from `_raw`. Oracle mirrors bits + adaptive cells + rerank
    //     from the raw tables (the sm18 convention). ---
    Q("sm25_binary_from_store", {
      val cos = cosineSql("q.pe", "f.embedding")
      val dist = l2SqSql("e.embedding", "c.ce")
      val pdist = l2SqSql("p.pe", "c.ce")
      def wordSql(off: Int): String =
        s"CAST(list_sum(list_transform(range(1, 33), i -> " +
          s"CASE WHEN embedding[i + $off] >= 0 " +
          s"THEN (CAST(1 AS BIGINT) << (i - 1)) " +
          s"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
      s"""WITH bits AS (
         |  SELECT vec_id, ${wordSql(0)} AS w0, ${wordSql(32)} AS w1
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cid, embedding AS ce FROM embeddings
         |  WHERE vec_id < ${graft.index.VectorStore.AdaptiveCellsSql}),
         |assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $dist, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |p AS (SELECT vec_id AS probe_id, embedding AS pe
         |      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 500),
         |pcells AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT p.probe_id, c.cid,
         |      row_number() OVER (PARTITION BY p.probe_id
         |                         ORDER BY $pdist, c.cid) AS rn
         |    FROM p CROSS JOIN cent c)
         |  WHERE rn <= ${graft.index.VectorStore.NProbe}),
         |hscored AS (
         |  SELECT p.probe_id, b.vec_id,
         |    bit_count(xor(b.w0, pb.w0)) + bit_count(xor(b.w1, pb.w1))
         |      AS ham
         |  FROM p
         |  JOIN bits pb ON pb.vec_id = p.probe_id
         |  JOIN pcells pc ON pc.probe_id = p.probe_id
         |  JOIN assign a ON a.cid = pc.cid
         |  JOIN bits b ON b.vec_id = a.vec_id AND b.vec_id <> p.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, ham, hrank FROM (
         |    SELECT probe_id, vec_id, ham,
         |      row_number() OVER (PARTITION BY probe_id
         |                         ORDER BY ham, vec_id) AS hrank
         |    FROM hscored)
         |  WHERE hrank <= $RerankShortlist),
         |q AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
         |      WHERE vec_id % 25 = 0 AND vec_id < 500),
         |rer AS (
         |  SELECT sh.probe_id, sh.vec_id AS neighbor_id, sh.ham,
         |    sh.hrank, $cos AS cosine
         |  FROM short sh
         |  JOIN embeddings f ON f.vec_id = sh.vec_id
         |  JOIN q ON q.probe_id = sh.probe_id)
         |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
         |  CAST(hrank AS INT) AS ham_rank, CAST(ham AS INT) AS hamming,
         |  round(cosine, 6) AS cosine
         |FROM (
         |  SELECT probe_id, neighbor_id, ham, hrank, cosine,
         |    row_number() OVER (PARTITION BY probe_id
         |                       ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM rer)
         |WHERE rank <= 10
         |ORDER BY probe_id, rank"""
    }) { (s, dir) =>
      val store = graft.index.VectorStore.storeFor(s, dir)
      val probes = emb(s, dir)
        .filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      graft.index.VectorStore
        .serveTopKBinary(probes, store, shortlist = RerankShortlist)
        .select(col("probe_id"), col("neighbor_id"),
          col("rank").cast("int").as("rank"),
          col("hrank").cast("int").as("ham_rank"),
          col("ham").cast("int").as("hamming"),
          duckRound(col("cosine"), 6).as("cosine"))
        .orderBy("probe_id", "rank")
    }
  )

  /** One oracle text for sm12 and sm13 — the index-served twin must
    * hash-match the fresh-scan fusion. */
  private def hybridRrfOracle: String = {
      val cos = cosineSql("e.embedding", "p.pe")
      val toks =
        "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
      val terms = HybridTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH lex0 AS (
         |  SELECT doc_id, token, count(*) AS tf FROM (
         |    SELECT doc_id, unnest($toks) AS token FROM documents)
         |  WHERE token IN ($terms) GROUP BY doc_id, token),
         |dft AS (SELECT token, count(*) AS df FROM lex0 GROUP BY token),
         |nd AS (SELECT count(*) AS n FROM documents),
         |lscore AS (
         |  SELECT doc_id,
         |    round(sum(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))), 6) AS s
         |  FROM lex0 JOIN dft USING (token) CROSS JOIN nd GROUP BY doc_id),
         |ltop AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
         |  FROM (SELECT * FROM lscore ORDER BY s DESC, doc_id LIMIT $HybridK)),
         |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |vscore AS (
         |  SELECT e.vec_id AS doc_id, $cos AS c
         |  FROM embeddings e CROSS JOIN p),
         |vtop AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r
         |  FROM (SELECT * FROM vscore ORDER BY c DESC, doc_id LIMIT $HybridK))
         |SELECT doc_id,
         |  CAST(coalesce(l.r, 0) AS INT) AS r_lex,
         |  CAST(coalesce(v.r, 0) AS INT) AS r_vec,
         |  round(coalesce(1.0 / (60 + l.r), 0.0)
         |        + coalesce(1.0 / (60 + v.r), 0.0), 6) AS rrf
         |FROM ltop l FULL OUTER JOIN vtop v USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin.trim
  }

  /** Fusion core shared by sm12 (fresh-scan lexical side) and sm13
    * (index-served lexical side): `lex0` = `(doc_id, token, tf)`
    * restricted to the query terms, `nd` = 1-row `(n)` corpus count —
    * everything downstream (TF-IDF score, per-side top-K rank frames,
    * reciprocal-rank fusion) is side-agnostic. */
  private def hybridRrfFrom(s: SparkSession, dir: String,
      lex0: DataFrame, nd: DataFrame): DataFrame = {
      val dft = lex0.groupBy("token").agg(count(lit(1)).as("df"))
      val lscore = lex0
        .join(broadcast(dft), "token")
        .crossJoin(broadcast(nd))
        .groupBy("doc_id")
        .agg(duckRound(sum(col("tf") *
          log(col("n").cast("double") / col("df").cast("double"))), 6).as("s"))
      val ltop = lscore.orderBy(col("s").desc, col("doc_id")).limit(HybridK)
        .withColumn("r", row_number().over(
          Window.orderBy(col("s").desc, col("doc_id"))))
        .select(col("doc_id"), col("r"))
      val e = emb(s, dir)
      val pe = e.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .collect().head.getSeq[Double](0)
      val pn = col("nrm") * l2Norm(typedlit(pe))
      val vtop = e
        .select(col("vec_id").as("doc_id"), col("embedding"),
          l2Norm(col("embedding")).as("nrm"))
        .select(col("doc_id"), when(pn === 0.0, lit(0.0))
          .otherwise(dot(col("embedding"), typedlit(pe)) / pn).as("c"))
        .orderBy(col("c").desc, col("doc_id")).limit(HybridK)
        .withColumn("r", row_number().over(
          Window.orderBy(col("c").desc, col("doc_id"))))
        .select(col("doc_id"), col("r"))
      ltop.withColumnRenamed("r", "r_lex")
        .join(vtop.withColumnRenamed("r", "r_vec"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0)).as("r_lex"),
          coalesce(col("r_vec"), lit(0)).as("r_vec"),
          duckRound(
            coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)), 6)
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
  }

  /** IVF range search: ivfTopK minus the ranking window — candidates
    * from the same shuffle-free cell assignment + equi-join, then a
    * pure filter on the exact cosine. */
  private def ivfRange(e: DataFrame, cent: Seq[(Long, Seq[Double])],
                       nprobe: Int, tau: Double): DataFrame = {
    val assign = nearestCells(
      e.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      cent, 1)
    val probes = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val pcells = nearestCells(probes.select(col("probe_id"),
      col("pe").as("embedding")), "probe_id", "embedding", cent, nprobe)
    val pn = probes.withColumn("pnrm", l2Norm(col("pe")))
    val nrm = col("pnrm") * col("nrm")
    pn.join(pcells, Seq("probe_id"))
      .join(assign, Seq("cid"))
      .join(e.select(col("vec_id"), col("embedding"),
        l2Norm(col("embedding")).as("nrm")), Seq("vec_id"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        when(nrm === 0.0, lit(0.0))
          .otherwise(dot(col("pe"), col("embedding")) / nrm).as("cosine"))
      .filter(col("cosine") >= tau)
      .select(col("probe_id"), col("neighbor_id"),
        duckRound(col("cosine"), 6).as("cosine"))
      .orderBy("probe_id", "neighbor_id")
  }

  /** DuckDB mirror of `ivfRange` (ivfSearchSql minus the window). */
  private def ivfRangeSql(centCte: String, tau: Double): String = {
    val dist = l2SqSql("e.embedding", "c.ce")
    val pdist = l2SqSql("p.pe", "c.ce")
    val cos = cosineSql("p.pe", "v.embedding")
    s"""assign AS (
       |  SELECT vec_id, cid, rn FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dist, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN $centCte c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |  WHERE vec_id % 25 = 0 AND vec_id < 500),
       |pcells AS (
       |  SELECT probe_id, cid FROM (
       |    SELECT p.probe_id, c.cid,
       |      row_number() OVER (PARTITION BY p.probe_id
       |                         ORDER BY $pdist, c.cid) AS rn
       |    FROM probes p CROSS JOIN $centCte c)
       |  WHERE rn <= $IvfNProbe),
       |scored AS (
       |  SELECT p.probe_id, v.vec_id AS neighbor_id, $cos AS cosine
       |  FROM probes p
       |  JOIN pcells pc ON pc.probe_id = p.probe_id
       |  JOIN assign a ON a.cid = pc.cid
       |  JOIN embeddings v ON v.vec_id = a.vec_id AND v.vec_id <> p.probe_id)
       |SELECT probe_id, neighbor_id, round(cosine, 6) AS cosine
       |FROM scored
       |WHERE cosine >= $tau
       |ORDER BY probe_id, neighbor_id"""
  }

  /** DuckDB mirror of `ivfTopK` reading centroids from CTE `centCte`
    * (embedded in a WITH chain; Q.apply strips the margins). */
  private def ivfSearchSql(centCte: String, k: Int,
                           candPred: String = "TRUE"): String = {
    val dist = l2SqSql("e.embedding", "c.ce")
    val pdist = l2SqSql("p.pe", "c.ce")
    val cos = cosineSql("p.pe", "v.embedding")
    s"""assign AS (
       |  SELECT vec_id, cid, rn FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |                         ORDER BY $dist, c.cid) AS rn
       |    FROM (SELECT * FROM embeddings WHERE $candPred) e
       |    CROSS JOIN $centCte c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
       |  WHERE vec_id % 25 = 0 AND vec_id < 500),
       |pcells AS (
       |  SELECT probe_id, cid FROM (
       |    SELECT p.probe_id, c.cid,
       |      row_number() OVER (PARTITION BY p.probe_id
       |                         ORDER BY $pdist, c.cid) AS rn
       |    FROM probes p CROSS JOIN $centCte c)
       |  WHERE rn <= $IvfNProbe),
       |scored AS (
       |  SELECT p.probe_id, v.vec_id AS neighbor_id, $cos AS cosine
       |  FROM probes p
       |  JOIN pcells pc ON pc.probe_id = p.probe_id
       |  JOIN assign a ON a.cid = pc.cid
       |  JOIN embeddings v ON v.vec_id = a.vec_id AND v.vec_id <> p.probe_id)
       |SELECT probe_id, neighbor_id, CAST(rank AS INT) AS rank,
       |  round(cosine, 6) AS cosine
       |FROM (
       |  SELECT probe_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY probe_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY probe_id, rank"""
  }
}
