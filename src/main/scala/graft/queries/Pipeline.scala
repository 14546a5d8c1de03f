package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables
import graft.functions.TextFunctions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and training: benchmark-contamination detection and removal,
  * deterministic hash-based splitting/sampling, and per-source quota
  * capping. All shuffle-light by construction — contamination
  * generates candidate rows map-side and only hits reach the
  * aggregation; decontamination and splitting are pure projections
  * (single sort exchange, plan-pinned); the quota cap bounds each
  * source to K rows before its window sort (`WindowGroupLimit`,
  * plan-pinned).
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    tables.load(s, dir, "documents")

  private val DuckToks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** pl12 bin budget (tokens per packed training sequence). MUST be
    * declared before `qs`: the oracle SQL interpolates it at object
    * init, and a later declaration would interpolate 0 (observed —
    * the Spark lambda reads the initialized value at run time, so
    * only the oracle silently broke). */
  private val PackBudget = 512L

  /** pl28 shard count. Thousands at cluster scale (per-shard sort
    * volume = corpus/nShards); 8 keeps the test frames readable.
    * Declared before `qs` (oracle SQL interpolates at object init —
    * the PackBudget lesson above). */
  private val OrderShards = 8

  /** pl30 replicate count (production uses 100+; the fan-out is ×B
    * map-side rows, so B trades precision against one scan's width). */
  private val BootReps = 16

  /** pl31 checksum modulus (dd03's universal-hash prime): keeps every
    * per-term product under 2^60, exactly representable on both
    * engines' integer paths. */
  private val ChecksumP = 1000000007L

  /** pl32's expected per-domain cap: small enough that the synthetic
    * corpus's domains engage the cap at every test SF. (Must precede
    * `qs` — the oracle SQL interpolates it at object init.) */
  private val DomainCap = 5L

  /** pl33's training-sequence length in tokens (the context-window
    * size the packer cuts the concatenated shard stream into). */
  private val SeqTokens = 2048L

  /** ONE oracle text for pl33 and its serve-from-store twin pl35 —
    * the frozen `OrderStore` artifact must answer the exact packing
    * oracle a fresh computation answers. */
  private lazy val packOracle =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % $OrderShards AS shard_id,
       |    md5('ord' || CAST(doc_id AS VARCHAR)) AS ok
       |  FROM documents),
       |ord AS (
       |  SELECT shard_id, doc_id, row_number() OVER (
       |    PARTITION BY shard_id ORDER BY ok, doc_id) AS pos
       |  FROM sh),
       |t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |                         x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM documents)
       |SELECT o.shard_id, o.pos, o.doc_id, t.n_tok,
       |  CAST(coalesce(sum(t.n_tok) OVER (
       |      PARTITION BY o.shard_id ORDER BY o.pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $SeqTokens AS BIGINT) AS seq_id,
       |  CAST(coalesce(sum(t.n_tok) OVER (
       |      PARTITION BY o.shard_id ORDER BY o.pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    % $SeqTokens AS BIGINT) AS seq_offset
       |FROM ord o JOIN t ON t.doc_id = o.doc_id
       |ORDER BY shard_id, pos""".stripMargin

  /** Poisson(1) inverse-CDF thresholds: cumulative e^-1 · Σ 1/k! for
    * k = 0..6 (tail mass beyond 7 is ~1e-5·u32-granularity). LITERAL
    * doubles — both engines compare the same constants, so the weight
    * is a pure function of the md5 coin. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** The "benchmark" phrase set — stand-in for an eval-set n-gram
    * fingerprint list (at real scale: a broadcast table of millions of
    * n-gram hashes; here literal IN-list constants keep the filter
    * codegen'd). Two phrases occur in the corpus, one never does. */
  private val Benchmark5Grams = Seq(
    "big part merge table join",
    "sort slow value slow hash",
    "the quick brown fox jumps")

  private def sqlLit(t: String): String = "'" + t.replace("'", "''") + "'"
  private val BenchList = Benchmark5Grams.map(sqlLit).mkString("(", ", ", ")")

  // --- Temperature-sampling primitives, the ONE source shared by the
  //     standalone operator (pl15) and the composed funnel (pl16) —
  //     an edit to the coin or the rate formula moves both. ---

  /** Per-lang keep_prob = sqrt(n_min / n_lang) over any frame with a
    * `lang` column — the T=2 flattening rates, a tiny broadcastable
    * frame. Only IEEE exact-rounded ops (sqrt/div), so both engines
    * compute the same double. */
  private[graft] def temperatureRates(df: DataFrame): DataFrame = {
    // n_min via an unpartitioned window over the ALREADY-AGGREGATED
    // lang-cardinality frame (≤ |langs| rows, so the single-partition
    // window is harmless) instead of a crossJoin with a second
    // aggregate of the same counts: the old shape planned the
    // counting pass over `df` twice — a corpus scan per consumer for
    // direct callers like pl15. Same IEEE ops, same doubles.
    val counts = df.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    counts
      .withColumn("n_min", min(col("n_lang")).over(
        org.apache.spark.sql.expressions.Window
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col("lang"),
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double"))
          .as("keep_prob"))
  }

  /** Deterministic per-doc coin: first 8 md5 hex chars of the id as a
    * uniform u32, as a double for the keep_prob·2^32 comparison. */
  private[graft] def coinOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")

  /** DuckDB twins: `cAlias`/`rAlias` CTEs computing the rates over
    * `src`, and the coin expression over an id. UNSTRIPPED margins —
    * they embed into Q oracles (stripMargin runs once there). */
  private def duckTemperatureCtes(src: String, cAlias: String,
                                  rAlias: String): String =
    s"""$cAlias AS (SELECT lang, count(*) AS n_lang FROM $src GROUP BY lang),
        |$rAlias AS (SELECT lang,
        |        sqrt(CAST((SELECT min(n_lang) FROM $cAlias) AS DOUBLE)
        |             / CAST(n_lang AS DOUBLE)) AS keep_prob
        |      FROM $cAlias)"""

  private def duckCoin(idExpr: String): String =
    s"CAST(CAST(concat('0x', substr(md5(CAST($idExpr AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)"

  // --- Fuzzy-decontamination rung, the ONE construction shared by
  //     pl14 (the standalone report), pl16 (the funnel) and pl47 (the
  //     fate report): corpus-vs-eval bipartite MinHash pairs at
  //     j >= 0.4 over the doc_id % 5 eval slice. ---

  /** Session conf naming a `graft.index.DedupStore` artifact built
    * over the EVAL slice: when set (and the artifact exists), the
    * fuzzy rung's eval side serves from that store — the
    * release-pinned deployment path (FateMaintenance freezes against
    * the same artifact). When unset, the rung serves from a
    * per-(application, dir) auto-built store ([[evalBandStoreFor]]) —
    * the tx18/VectorStore build-once/serve-many convention: the eval
    * set is fixed per release, so its shingling/signing/banding is
    * build-once work (round-17 verdict #3; at 100× the eval-side
    * derivation dominated: pl14 fresh 111.0 s vs 15.8 s served, pl47
    * 226.8 s vs 44.9 s, §6). Either way the result equals the fresh
    * `Dedup.bipartitePairs` derivation by construction (the store
    * persists the same shingle/sig/band frames the fresh path
    * derives); the DuckDB oracle IS the fresh semantics, so the
    * correctness gate checks store-served == fresh on every run, and
    * `FuzzyServeSpec` pins the equality plus the
    * zero-eval-recompute plan shape. */
  val EvalBandStoreConf = "spark.graft.evalBandStore"

  /** Build-once per (application, dir) eval band store — the
    * `VectorStore.storeFor` convention: a fresh JVM rebuilds from the
    * current testdata (no cross-regeneration staleness), and the
    * build lands in Bench's pre-pass fingerprint phase, never inside
    * a timed query. */
  private val evalStoreBuilt =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def evalBandStoreFor(s: SparkSession, dir: String): String = {
    val name = "graft_evalbands_" + dir.replaceAll("[^A-Za-z0-9]+", "_")
    evalStoreBuilt.getOrElseUpdate(
      s.sparkContext.applicationId + "/" + name, {
        graft.index.VectorStore.clearOrphanLocations(s, name)
        graft.index.DedupStore.build(
          docs(s, dir).select(col("doc_id"), col("text"))
            .filter(col("doc_id") % 5 === 0), name)
        name
      })
    name
  }

  private def fuzzyEvalPairsOf(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 5 =!= 0)
    val store = s.conf.getOption(EvalBandStoreConf)
      .filter(n => s.catalog.tableExists(s"${n}_bands"))
      .getOrElse(evalBandStoreFor(s, dir))
    graft.index.DedupStore.bipartitePairsFromStore(corpus, store, 0.4)
  }

  // --- Quality-classifier primitives, the ONE source shared by the
  //     registered query (pl23), the saved model artifact
  //     (graft.index.QualityStore) and its streaming scorer — an edit
  //     to the hash, the smoothing, or the rounding moves all three. ---

  /** Feature-hash bucket count: the fastText hashing-trick bound.
    * The model is ≤ this many rows at ANY corpus size. */
  private[graft] val ClassifierBuckets = 4096

  /** Per-doc feature set: distinct tokens → distinct md5-u32 % B
    * buckets. All in-row array ops — map-side, no shuffle. */
  private[graft] def classifierFeatures(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_distinct(transform(
      array_distinct(graft.functions.TextFunctions.tokens(text)),
      t => (conv(substring(md5(t), 1, 8), 16, 10).cast("long")
        % ClassifierBuckets).cast("int")))

  /** Bernoulli-NB log-odds weights from a labeled feature frame
    * (`good` ∈ {0,1}, `fs` array<int>): one bucket-sized aggregation
    * plus a 1-row class-prior scalar. */
  private[graft] def classifierWeights(labeled: DataFrame): DataFrame = {
    val nf = labeled.agg(sum("good").as("ng"),
      (count(lit(1)) - sum("good")).as("nb"))
    labeled.select(col("good"), explode(col("fs")).as("b"))
      .groupBy("b").agg(sum("good").as("dfg"),
        (count(lit(1)) - sum("good")).as("dfb"))
      .crossJoin(broadcast(nf))
      // each operand casts to double BEFORE the multiply: a long
      // product overflows once doc counts reach ~3e9·3e9 (the 100 TB
      // regime this model is sized for); double products are exact
      // until 2^53 and merely lose ulps past it, and both engines
      // compute the same double either way
      .select(col("b"),
        log(((col("dfg") + 1).cast("double") * (col("nb") + 2).cast("double")) /
            ((col("dfb") + 1).cast("double") * (col("ng") + 2).cast("double")))
          .as("w"))
  }

  /** DuckDB twin of the training+scoring chain: CTEs `lab` (labeled
    * feature sets), `nf`/`dfreq`/`w` (the model) and `sc` (per-doc raw
    * scores) — shared verbatim by pl23's report and pl24's selection
    * so the two oracles can never train different models. */
  private lazy val DuckClassifierCtes: String =
    s"""lab AS (
       |  SELECT doc_id,
       |    CAST(substr(source, 4) AS INT) % 2 AS good,
       |    list_distinct(list_transform(list_distinct($DuckToks),
       |      t -> CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 4096 AS INT))) AS fs
       |  FROM documents),
       |nf AS (SELECT CAST(sum(good) AS BIGINT) AS ng,
       |              CAST(count(*) - sum(good) AS BIGINT) AS nb FROM lab),
       |bf AS (SELECT good, unnest(fs) AS b FROM lab),
       |dfreq AS (SELECT b, CAST(sum(good) AS BIGINT) AS dfg,
       |                 CAST(count(*) - sum(good) AS BIGINT) AS dfb
       |          FROM bf GROUP BY b),
       |w AS (SELECT b,
       |        ln((CAST(dfg + 1 AS DOUBLE) * CAST(nb + 2 AS DOUBLE))
       |           / (CAST(dfb + 1 AS DOUBLE) * CAST(ng + 2 AS DOUBLE))) AS w
       |      FROM dfreq, nf),
       |sc AS (SELECT l.doc_id, sum(w.w) AS score
       |       FROM (SELECT doc_id, unnest(fs) AS b FROM lab) l
       |       JOIN w USING (b) GROUP BY l.doc_id)"""

  /** Score a (doc_id, fs) frame under a (b, w) weight frame: broadcast
    * join + per-doc sum, 4-decimal DuckDB-exact rounding, keep flag on
    * the ROUNDED score. Output (doc_id, n_feats, score, keep). */
  private[graft] def classifierScore(feats: DataFrame,
                                     weights: DataFrame): DataFrame = {
    val sc = feats.select(col("doc_id"), explode(col("fs")).as("b"))
      .join(broadcast(weights), "b")
      .groupBy("doc_id").agg(sum("w").as("score"))
    feats.select(col("doc_id"), size(col("fs")).as("n_feats"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_feats"),
        graft.functions.ParityFunctions
          .duckRound(coalesce(col("score"), lit(0.0)), 4).as("score"))
      .withColumn("keep", (col("score") > 0).cast("int"))
  }

  /** pl26 PII patterns — the Java∩RE2 common subset only (explicit
    * [0-9] classes, non-capturing groups, \b boundaries; no
    * lookbehind), so Spark's java.util.regex and DuckDB's RE2 match
    * the same spans. Declared before `qs` (oracle SQL interpolates at
    * object init); DuckDB regular strings keep backslashes literal, so
    * the same Scala value feeds both engines unchanged. */
  private val PiiEmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PiiPhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val PiiIpRe = "\\b[0-9]{1,3}(?:\\.[0-9]{1,3}){3}\\b"

  val qs: Seq[Q] = Seq(

    // --- Contamination detection: which documents contain which
    //     benchmark n-grams. The 5-gram generation + IN filter are
    //     map-side (no shuffle until only the hit rows aggregate). ---
    Q("pl01_contamination",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 3),
         |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS ngram
         |  FROM tk)
         |SELECT doc_id, ngram, count(*) AS n_hits
         |FROM g WHERE ngram IN $BenchList
         |GROUP BY doc_id, ngram
         |ORDER BY doc_id, ngram""") { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), explode(wordNgramsOf(col("tk"), 5)).as("ngram"))
        .filter(col("ngram").isin(Benchmark5Grams: _*))
        .groupBy("doc_id", "ngram").agg(count(lit(1)).as("n_hits"))
        .orderBy("doc_id", "ngram")
    },

    // --- Decontamination ACTION: redact every benchmark phrase
    //     occurrence, report per-doc redaction count + the digest of
    //     the cleaned text (the digest is what a pipeline verifies
    //     downstream). Occurrence counts are computed per phrase on
    //     the ORIGINAL text by length arithmetic — no regex. ---
    Q("pl02_decontaminate", {
      val clean = Benchmark5Grams.foldLeft("text")((acc, p) =>
        s"replace($acc, ${sqlLit(p)}, '[REDACTED]')")
      val nRed = Benchmark5Grams.map(p =>
        s"(length(text) - length(replace(text, ${sqlLit(p)}, ''))) // ${p.length}")
        .mkString(" + ")
      s"""SELECT doc_id,
         |  CAST($nRed AS BIGINT) AS n_redactions,
         |  md5($clean) AS clean_md5
         |FROM documents
         |ORDER BY doc_id"""
    }) { (s, dir) =>
      val clean = Benchmark5Grams.foldLeft(col("text"))((acc, p) =>
        replace(acc, lit(p), lit("[REDACTED]")))
      val nRed = Benchmark5Grams.map(p =>
        (length(col("text")) - length(replace(col("text"), lit(p), lit(""))))
          .cast("long") / p.length)
        .reduce(_ + _)
      docs(s, dir)
        .select(col("doc_id"),
          nRed.cast("long").as("n_redactions"),
          md5(clean.cast("binary")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // --- Per-source quota capping: keep the K best documents (by
    //     quality score) from each source — how a pipeline stops one
    //     domain from dominating the mix. Ranks on the ROUNDED score
    //     (both engines round identically via DuckRound semantics;
    //     ranking raw doubles would let a last-ULP difference flip a
    //     rank-K boundary) with doc_id tiebreak. Spark 4.1 plans the
    //     rank filter as WindowGroupLimit: per-group top-K is bounded
    //     BEFORE the full sort, so a giant source can't OOM a window
    //     buffer. ---
    Q("pl04_source_quota", {
      val stopList = graft.queries.Text.Stop.map(sqlLit).mkString("(", ", ", ")")
      s"""WITH t AS (SELECT doc_id, source, $DuckToks AS tk FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    round(0.4 * least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
         |        + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |                 ELSE CAST(len(list_filter(tk, x -> x IN $stopList)) AS DOUBLE)
         |                      / CAST(len(tk) AS DOUBLE) END)
         |        + 0.3 * least((CASE WHEN len(tk) = 0 THEN 0.0
         |                 ELSE CAST(list_sum(list_transform(tk, x -> length(x)))
         |                           AS DOUBLE) / CAST(len(tk) AS DOUBLE) END) / 8.0, 1.0),
         |      6) AS quality
         |  FROM t),
         |r AS (
         |  SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id) AS rank
         |  FROM q)
         |SELECT doc_id, source, quality, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10
         |ORDER BY doc_id"""
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val q = graft.functions.ParityFunctions.duckRound(
        qualityScoreOf(tokens(col("text")), graft.queries.Text.Stop), 6)
      val w = Window.partitionBy("source")
        .orderBy(col("quality").desc, col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("source"), q.as("quality"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("doc_id"), col("source"), col("quality"),
          col("rank").cast("long").as("rank"))
        .orderBy("doc_id")
    },

    // --- Deterministic hash split + sampling: md5-bucket each doc id
    //     into train/val and flag a 10% sample — reproducible across
    //     engines AND runs (never `rand()` in a pipeline: re-runs must
    //     assign identically for caching/provenance). Pure projection;
    //     the md5-hex→int parity trick is the dd03-proven one. ---
    Q("pl03_hash_split",
      """SELECT doc_id, lang, source,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 90
        |       THEN 'train' ELSE 'val' END AS split,
        |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10 = 0 AS in_10pct_sample
        |FROM documents
        |ORDER BY doc_id""") { (s, dir) =>
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          when(h % 100 < 90, lit("train")).otherwise(lit("val")).as("split"),
          (h % 10 === 0).as("in_10pct_sample"))
        .orderBy("doc_id")
    },

    // --- Domain-mixture sampling: each source gets a target sampling
    //     rate and docs are kept by deterministic md5 bucket (pl03's
    //     device) — how a pipeline reweights domains (downsample web
    //     crawl, keep all code/books) without rand() so re-runs assign
    //     identically. Rates here derive from the source id so the
    //     whole thing stays one codegen'd map-side filter; at real
    //     scale the rates come from a broadcast-joined weights table —
    //     plan shape is unchanged (filter stays before any shuffle). ---
    Q("pl05_source_mixture",
      """SELECT doc_id, source,
        |  CAST((CAST(substr(source, 4) AS INT) % 4 + 1) * 25 AS INT) AS rate_pct
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000
        |      < (CAST(substr(source, 4) AS INT) % 4 + 1) * 250
        |ORDER BY doc_id""") { (s, dir) =>
      // Unbounded tail slice to mirror DuckDB's substr(source, 4) —
      // a length cap would diverge if a source id suffix grows >10 chars.
      val srcNum = expr("substring(source, 4)").cast("int")
      val rate = srcNum % 4 + 1 // quarters: 25/50/75/100 %
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
      docs(s, dir)
        .filter(h % 1000 < rate.cast("long") * 250)
        .select(col("doc_id"), col("source"), (rate * 25).as("rate_pct"))
        .orderBy("doc_id")
    },

    // --- Multi-rule quality gate (Gopher-style): each rule is its own
    //     boolean column so a pipeline can report WHY a doc was
    //     dropped, not just that it was. One tokens() projection feeds
    //     every rule; thresholds compare exact int/int divisions so the
    //     keep/drop decision cannot flip between engines; only the
    //     display columns are rounded. Pure projection — no shuffle
    //     before the final sort. ---
    Q("pl06_quality_rules", {
      val stopList = graft.queries.Text.Stop.map(sqlLit).mkString("(", ", ", ")")
      s"""WITH t AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(tk) AS INT) AS n_tokens,
         |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS DOUBLE)
         |      / CAST(greatest(len(tk), 1) AS DOUBLE) AS mean_len,
         |    CAST(len(list_filter(tk, x -> x IN $stopList)) AS INT) AS stop_hits,
         |    CAST(len(list_distinct(tk)) AS DOUBLE)
         |      / CAST(greatest(len(tk), 1) AS DOUBLE) AS distinct_ratio
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  round(mean_len, 4) AS mean_len,
         |  stop_hits,
         |  round(distinct_ratio, 6) AS distinct_ratio,
         |  n_tokens BETWEEN 20 AND 1000 AS r_len,
         |  mean_len >= 2.0 AND mean_len <= 12.0 AS r_mean,
         |  stop_hits >= 1 AS r_stop,
         |  distinct_ratio >= 0.2 AS r_distinct,
         |  (n_tokens BETWEEN 20 AND 1000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
         |    AND stop_hits >= 1 AND distinct_ratio >= 0.2 AS keep
         |FROM m ORDER BY doc_id"""
    }) { (s, dir) =>
      val stop = graft.queries.Text.Stop
      val meanLen =
        aggregate(col("tk"), lit(0L), (acc, x) => acc + length(x).cast("long"))
          .cast("double") / greatest(size(col("tk")), lit(1)).cast("double")
      val distinctRatio = size(array_distinct(col("tk"))).cast("double") /
        greatest(size(col("tk")), lit(1)).cast("double")
      val rLen = col("n_tokens").between(20, 1000)
      val rMean = col("mean_len_raw") >= 2.0 && col("mean_len_raw") <= 12.0
      val rStop = col("stop_hits") >= 1
      val rDistinct = col("distinct_ratio_raw") >= 0.2
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).as("n_tokens"),
          meanLen.as("mean_len_raw"),
          size(filter(col("tk"), t => t.isInCollection(stop))).as("stop_hits"),
          distinctRatio.as("distinct_ratio_raw"))
        .select(col("doc_id"), col("n_tokens"),
          graft.functions.ParityFunctions.duckRound(col("mean_len_raw"), 4)
            .as("mean_len"),
          col("stop_hits"),
          graft.functions.ParityFunctions.duckRound(col("distinct_ratio_raw"), 6)
            .as("distinct_ratio"),
          rLen.as("r_len"), rMean.as("r_mean"), rStop.as("r_stop"),
          rDistinct.as("r_distinct"),
          (rLen && rMean && rStop && rDistinct).as("keep"))
        .orderBy("doc_id")
    },

    // --- Dataset card: the per-(lang, source) corpus summary a
    //     pipeline publishes with a training set. Group-by is one
    //     partial+final agg; the corpus-share window runs over the
    //     POST-aggregation rows (|langs|×|sources| — tiny at any SF),
    //     so the unpartitioned window is not a scale hazard. ---
    Q("pl07_dataset_card",
      s"""WITH t AS (SELECT lang, source, len($DuckToks) AS n_tok FROM documents)
         |SELECT lang, source,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS mean_tokens,
         |  round(CAST(count(*) AS DOUBLE)
         |        / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS doc_share
         |FROM t GROUP BY lang, source
         |ORDER BY lang, source""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      docs(s, dir)
        .select(col("lang"), col("source"), tokenCount(col("text")).as("n_tok"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("total_tokens"))
        .select(col("lang"), col("source"), col("n_docs"), col("total_tokens"),
          graft.functions.ParityFunctions.duckRound(
            col("total_tokens").cast("double") / col("n_docs").cast("double"), 4)
            .as("mean_tokens"),
          graft.functions.ParityFunctions.duckRound(
            col("n_docs").cast("double") /
              sum(col("n_docs")).over(Window.partitionBy()).cast("double"), 6)
            .as("doc_share"))
        .orderBy("lang", "source")
    },

    // --- PII redaction: regex-scrub emails/phones, report per-doc hit
    //     counts and a digest of the redacted text. The corpus is
    //     synthetic word soup, so observable PII is INJECTED
    //     deterministically first (tx26's decomposed-suffix trick) and
    //     the scrub is verified against the injection schedule. Pure
    //     projection — regexp_count/replace are per-row, no shuffle
    //     before the output sort; at 100 TB this is the map-only pass
    //     it must be. ---
    Q("pl08_pii_redaction",
      """WITH injected AS (
        |  SELECT doc_id,
        |    text
        |      || CASE WHEN doc_id % 7 = 0
        |              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |              ELSE '' END
        |      || CASE WHEN doc_id % 11 = 0
        |              THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              ELSE '' END AS text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
        |    regexp_replace(regexp_replace(text,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM injected)
        |SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
        |  CAST(n_phones AS INT) AS n_phones,
        |  length(redacted) AS n_chars_redacted,
        |  md5(redacted) AS redacted_md5
        |FROM red
        |WHERE n_emails > 0 OR n_phones > 0
        |ORDER BY doc_id""") { (s, dir) =>
      val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val PhoneRe = "555-[0-9]{4}"
      val injected = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(""),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise("")).as("text"))
      val red = injected.select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(col("text"), lit(PhoneRe)).cast("int").as("n_phones"),
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("redacted"))
      red.filter(col("n_emails") > 0 || col("n_phones") > 0)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).as("n_chars_redacted"),
          md5(col("redacted").cast("binary")).as("redacted_md5"))
        .orderBy("doc_id")
    },

    // --- Per-domain corpus stats: synthesize a deterministic URL per
    //     doc (the corpus carries no provenance URL), extract the
    //     domain with the same regex on both engines, and aggregate
    //     docs/chars/mean-tokens per domain — the source-profiling
    //     report a crawl-curation pipeline starts from. Extraction is a
    //     projection; one O(domains) aggregation. ---
    Q("pl09_domain_stats",
      """WITH u AS (
        |  SELECT doc_id, n_chars, text,
        |    'https://' || source || '.example-' || lang || '.com/doc/'
        |      || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents)
        |SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS domain,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |                                 x -> x <> ''))) AS DOUBLE)
        |        / count(*), 4) AS mean_tokens
        |FROM u
        |GROUP BY 1
        |ORDER BY domain""") { (s, dir) =>
      docs(s, dir)
        .select(
          concat(lit("https://"), col("source"), lit(".example-"), col("lang"),
            lit(".com/doc/"), col("doc_id").cast("string")).as("url"),
          col("n_chars"), tokenCount(col("text")).as("n_tok"))
        .select(regexp_extract(col("url"), "^https://([^/]+)/", 1).as("domain"),
          col("n_chars"), col("n_tok"))
        .groupBy("domain")
        // mean via BIGINT sum + one final double division, so the
        // division input doesn't depend on partition merge order.
        // The r6/r7 red row was NOT this: DuckDB's sum(BIGINT) yields
        // HUGEINT (this was the only oracle emitting one), which the
        // driver's pandas bridge renders as float — "1234.0" vs
        // Spark's int64 "1234" hash-diverges with identical values.
        // The oracle therefore CASTs total_chars back to BIGINT.
        // (CORRECTNESS_r07 still showed red because the r7 gate ran the
        // round-7 SNAPSHOT, which predates that CAST; post-fix the row
        // re-verified bit-exact — dtypes and cells — at all three SFs.)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          graft.functions.ParityFunctions.duckRound(
            sum(col("n_tok")).cast("double") / count(lit(1)), 4)
            .as("mean_tokens"))
        .orderBy("domain")
    },

    // --- Filter funnel: docs surviving each successive quality rule,
    //     as one report row per stage. ONE corpus scan computes all the
    //     cumulative stage flags as columns; the conditional sums
    //     reduce to a single row map-side (partial aggregation), and
    //     stack() reshapes that row — at 100 TB the whole funnel is
    //     still exactly one pass over the data. ---
    Q("pl10_filter_funnel",
      """WITH f AS (
        |  SELECT n_chars >= 60 AS c1,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x <> '')) >= 12 AS c2,
        |    CAST(len(list_distinct(list_filter(
        |          string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS DOUBLE)
        |      / len(list_filter(string_split_regex(lower(text), '\s+'),
        |            x -> x <> '')) >= 0.3 AS c3,
        |    lang IN ('en', 'es', 'de') AS c4
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS s0,
        |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |    CAST(sum(CASE WHEN c1 AND c2 AND c3 AND c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
        |  FROM f)
        |SELECT CASE nm WHEN 's0' THEN '0_total' WHEN 's1' THEN '1_min_chars'
        |         WHEN 's2' THEN '2_min_tokens' WHEN 's3' THEN '3_distinct_ratio'
        |         ELSE '4_lang_allowlist' END AS stage,
        |  n_docs
        |FROM (UNPIVOT agg ON s0, s1, s2, s3, s4 INTO NAME nm VALUE n_docs)
        |ORDER BY stage""") { (s, dir) =>
      val tk = tokens(col("text"))
      val flags = docs(s, dir).select(
        (col("n_chars") >= 60).as("c1"),
        (size(tk) >= 12).as("c2"),
        (size(array_distinct(tk)).cast("double") / size(tk) >= 0.3).as("c3"),
        col("lang").isin("en", "es", "de").as("c4"))
      flags.agg(
          count(lit(1)).as("s0"),
          sum(when(col("c1"), 1L).otherwise(0L)).as("s1"),
          sum(when(col("c1") && col("c2"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("c1") && col("c2") && col("c3"), 1L).otherwise(0L))
            .as("s3"),
          sum(when(col("c1") && col("c2") && col("c3") && col("c4"), 1L)
            .otherwise(0L)).as("s4"))
        .select(expr(
          """stack(5,
            |  '0_total', s0, '1_min_chars', s1, '2_min_tokens', s2,
            |  '3_distinct_ratio', s3, '4_lang_allowlist', s4)
            |  AS (stage, n_docs)""".stripMargin))
        .orderBy("stage")
    },

    // --- CDC latest-wins snapshot: collapse a changelog to one row per
    //     key via max_by over a (ts, id) tie-broken ordering struct —
    //     ONE shuffle with map-side partials and O(1) state per key,
    //     where the window-rank formulation would sort every partition.
    //     The oracle uses the window form: same semantics, independent
    //     plan. ---
    Q("pl11_latest_snapshot",
      """SELECT user_id, event_type AS last_type, value AS last_value,
        |  last_ts, n_events
        |FROM (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    max(ts) OVER (PARTITION BY user_id) AS last_ts,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""") { (s, dir) =>
      val ord = struct(col("ts"), col("event_id"))
      tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(
          max_by(col("event_type"), ord).as("last_type"),
          max_by(col("value"), ord).as("last_value"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // --- Sequence packing: assign docs to fixed token-budget training
    //     bins, streaming greedily in (source, doc_id) order — the step
    //     that turns a curated corpus into context-window-sized
    //     sequences. Bin id derives from the PREFIX token sum (bin =
    //     floor((cumsum − n_tok) / B)): a doc opens a new bin exactly
    //     when the previous docs filled one, and an oversized doc
    //     overflows its bin rather than being split (documented
    //     semantics; a splitter would live downstream). One window
    //     partitioned by source over a unique (doc_id) order — total
    //     order, so both engines agree row-for-row; at 100 TB each
    //     shard's prefix sum is one partition-local sort, no global
    //     shuffle beyond the source partitioning. ---
    Q("pl12_sequence_packing",
      s"""SELECT source, doc_id, n_tok, bin,
         |  CAST(cum - n_tok - bin * $PackBudget AS BIGINT) AS bin_offset
         |FROM (
         |  SELECT source, doc_id, n_tok,
         |    CAST(floor(CAST(cum - n_tok AS DOUBLE) / $PackBudget) AS BIGINT) AS bin,
         |    cum
         |  FROM (
         |    SELECT source, doc_id,
         |      CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |               x -> x <> '')) AS BIGINT) AS n_tok,
         |      sum(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |              x -> x <> '')) AS BIGINT))
         |        OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |    FROM documents))
         |ORDER BY source, doc_id""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("n_tok")).cast("double") / PackBudget))
        .select(col("source"), col("doc_id"), col("n_tok"), col("bin"),
          (col("cum") - col("n_tok") - col("bin") * PackBudget)
            .cast("long").as("bin_offset"))
        .orderBy("source", "doc_id")
    },

    // --- End-to-end shard preparation: the COMPOSITION a training run
    //     actually executes — quality gate (pl06/pl10 rules) AND
    //     benchmark-decontamination drop (pl01's phrase set), then
    //     exact dedup keep-first (dd05), then token-budget packing
    //     (pl12) over the survivors — emitted as the final shard
    //     manifest. Each stage is the already-verified operator; the
    //     value here is the plan that composes them: one corpus scan
    //     feeds the gate (all flags map-side), dedup is one
    //     hash-shuffle on md5(text), packing one window per shard —
    //     three shuffles total at 100 TB, none avoidable in the
    //     semantics. ---
    Q("pl13_shard_prep", {
      val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
      val contaminated = Benchmark5Grams
        .map(p => s"contains(text, ${sqlLit(p)})").mkString("(", " OR ", ")")
      s"""WITH g AS (
         |  SELECT doc_id, source, text,
         |    CAST(len($toks) AS BIGINT) AS n_tok
         |  FROM documents
         |  WHERE n_chars >= 60
         |    AND len($toks) >= 12
         |    AND CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks) >= 0.3
         |    AND lang IN ('en', 'es', 'de')
         |    AND NOT $contaminated),
         |d AS (
         |  SELECT doc_id, source, n_tok FROM g
         |  WHERE doc_id IN (SELECT CAST(min(doc_id) AS BIGINT)
         |                   FROM g GROUP BY md5(text))),
         |p AS (
         |  SELECT source, doc_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM d)
         |SELECT source, doc_id, n_tok,
         |  CAST(floor(CAST(cum - n_tok AS DOUBLE) / $PackBudget) AS BIGINT) AS bin
         |FROM p
         |ORDER BY source, doc_id"""
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val contaminated = Benchmark5Grams
        .map(p => col("text").contains(p)).reduce(_ || _)
      // token array projected ONCE (the Dedup device) — three flag
      // expressions read it
      val g = docs(s, dir)
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
          col("lang"), tokens(col("text")).as("tk"))
        .filter(col("n_chars") >= 60 &&
          size(col("tk")) >= 12 &&
          size(array_distinct(col("tk"))).cast("double") / size(col("tk")) >= 0.3 &&
          col("lang").isin("en", "es", "de") &&
          !contaminated)
        .select(col("doc_id"), col("source"), col("text"),
          size(col("tk")).cast("long").as("n_tok"))
      val keepFirst = Window.partitionBy(md5(col("text").cast("binary")))
        .orderBy("doc_id")
      val d = g.withColumn("rn", row_number().over(keepFirst))
        .filter(col("rn") === 1)
        .select("source", "doc_id", "n_tok")
      val shard = Window.partitionBy("source").orderBy("doc_id")
      d.withColumn("cum", sum(col("n_tok")).over(shard))
        .select(col("source"), col("doc_id"), col("n_tok"),
          floor((col("cum") - col("n_tok")).cast("double") / PackBudget)
            .as("bin"))
        .orderBy("source", "doc_id")
    },

    // --- FUZZY decontamination: near-duplicate overlap between the
    //     training corpus and a held-out eval set — the contamination
    //     pl01/pl02 can't see (a paraphrased or lightly-edited eval doc
    //     shares no exact 5-gram but ~everything at the shingle level).
    //     Here the "eval set" is the doc_id % 5 == 0 slice standing in
    //     for a benchmark corpus. Scale shape (Dedup.bipartitePairs):
    //     the eval side is tiny vs a 100 TB corpus, so its band table
    //     is BROADCAST and candidate generation is a map-side join
    //     against corpus bands — the corpus is never self-joined; the
    //     exact-Jaccard verify touches only candidate pairs. ---
    Q("pl14_fuzzy_decontaminate", {
      val ctes = graft.queries.Dedup.bipartiteScoredCtes(
        id => s"$id % 5 <> 0", id => s"$id % 5 = 0")
      s"""WITH $ctes
         |SELECT doc_id, probe_doc_id AS eval_doc_id,
         |  round(j, 6) AS jaccard
         |FROM xscored WHERE j >= 0.4
         |ORDER BY doc_id, eval_doc_id"""
    }) { (s, dir) =>
      fuzzyEvalPairsOf(s, dir)
        .select(col("doc_id"), col("probe_doc_id").as("eval_doc_id"),
          graft.functions.ParityFunctions.duckRound(col("jaccard"), 6)
            .as("jaccard"))
        .orderBy("doc_id", "eval_doc_id")
    },

    // --- Temperature (T=2) language rebalancing: downsample each
    //     language to keep_prob = sqrt(n_min / n_lang) — the standard
    //     sqrt-flattening of a skewed language mix before training.
    //     Inclusion is a DETERMINISTIC per-doc coin: the first 8 md5
    //     hex chars of the doc_id as a uniform u32 vs keep_prob·2^32
    //     (reproducible across runs/engines; no RNG). Two passes, no
    //     corpus shuffle: pass 1 aggregates per-language counts (one
    //     tiny frame), pass 2 broadcast-joins the rates and filters
    //     map-side. Only sqrt/division/multiply touch the threshold —
    //     all exact-rounded IEEE ops, so both engines compare the
    //     SAME double (no rounding-boundary flake class). ---
    Q("pl15_temperature_sample",
      s"""WITH ${duckTemperatureCtes("documents", "c", "r")},
        |h AS (SELECT doc_id, lang, ${duckCoin("doc_id")} AS u
        |      FROM documents)
        |SELECT h.doc_id, h.lang
        |FROM h JOIN r ON h.lang = r.lang
        |WHERE h.u < r.keep_prob * 4294967296.0
        |ORDER BY h.doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      d.select(col("doc_id"), col("lang"), coinOf(col("doc_id")).as("u"))
        .join(broadcast(temperatureRates(d)), "lang")
        .filter(col("u") < col("keep_prob") * 4294967296.0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // --- The modern curation pipeline END-TO-END, as a funnel report:
    //     URL-canonicalization dedup (dd10, the crawl's first stage) →
    //     benchmark removal — BOTH the eval slice itself and every
    //     fuzzy near-dup of it (pl14's bipartite MinHash) → temperature
    //     rebalancing with rates computed on the POST-FILTER survivors
    //     (pl15's deterministic coin). One row per stage with doc and
    //     token counts — what a pipeline owner actually reviews before
    //     a training run. Scale shape: each stage reuses its operator's
    //     scale path (projection+hash-agg / broadcast band join /
    //     broadcast rate join); the stage frames carry (doc_id, lang,
    //     n_tok) — never text — so the funnel adds no corpus-width
    //     shuffles beyond its operators' own. ---
    Q("pl16_curation_funnel", {
      val ctes = graft.queries.Dedup.bipartiteScoredCtes(
        id => s"$id % 5 <> 0", id => s"$id % 5 = 0")
      s"""WITH $ctes,
         |u AS (
         |  SELECT doc_id, lang, len($DuckToks) AS n_tok,
         |    ${graft.queries.Dedup.DuckMessyUrl} AS url
         |  FROM documents),
         |canon AS (
         |  SELECT doc_id, lang, n_tok,
         |    ${graft.queries.Dedup.duckCanonicalUrl("url")} AS cu
         |  FROM u),
         |s1 AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY cu),
         |s1d AS (SELECT c.doc_id, c.lang, c.n_tok
         |        FROM canon c JOIN s1 ON c.doc_id = s1.doc_id),
         |hits AS (SELECT DISTINCT doc_id FROM xscored WHERE j >= 0.4),
         |s2 AS (SELECT * FROM s1d
         |       WHERE doc_id % 5 <> 0
         |         AND doc_id NOT IN (SELECT doc_id FROM hits)),
         |${duckTemperatureCtes("s2", "c2", "r")},
         |s3 AS (SELECT s2.doc_id, s2.lang, s2.n_tok
         |       FROM s2 JOIN r ON s2.lang = r.lang
         |       WHERE ${duckCoin("s2.doc_id")}
         |             < r.keep_prob * 4294967296.0),
         |f AS (
         |  SELECT 0 AS stage, 'corpus' AS label, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM u
         |  UNION ALL SELECT 1, 'url_dedup', count(*),
         |    CAST(sum(n_tok) AS BIGINT) FROM s1d
         |  UNION ALL SELECT 2, 'decontaminated', count(*),
         |    CAST(sum(n_tok) AS BIGINT) FROM s2
         |  UNION ALL SELECT 3, 'sampled', count(*),
         |    CAST(sum(n_tok) AS BIGINT) FROM s3)
         |SELECT CAST(stage AS INT) AS stage, label, n_docs, n_tokens
         |FROM f ORDER BY stage"""
    }) { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      import graft.queries.Dedup
      val base = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).cast("long").as("n_tok"),
          Dedup.canonicalUrl(Dedup.messyUrl(col("doc_id"))).as("cu"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val s1 = base.groupBy("cu").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val s1d = base.join(s1, "doc_id").select("doc_id", "lang", "n_tok")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val hits = fuzzyEvalPairsOf(s, dir)
        .select("doc_id").distinct()
      val s2 = s1d.filter(col("doc_id") % 5 =!= 0)
        .join(hits, Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val s3 = s2.join(broadcast(temperatureRates(s2)), "lang")
        .filter(coinOf(col("doc_id")) < col("keep_prob") * 4294967296.0)
        .select("doc_id", "lang", "n_tok")
      def row(stage: Int, label: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .select(lit(stage).as("stage"), lit(label).as("label"),
            col("n_docs"), col("n_tokens"))
      row(0, "corpus", base)
        .unionByName(row(1, "url_dedup", s1d))
        .unionByName(row(2, "decontaminated", s2))
        .unionByName(row(3, "sampled", s3))
        .orderBy("stage")
    },

    // --- Nucleus (top-p) selection: per source, keep the
    //     highest-value documents until 90% of the source's token
    //     mass is covered — the data-mixing move that caps each
    //     source at its densest core instead of a fixed row quota
    //     (pl04). Value rank here = n_tok desc (doc_id tiebreak);
    //     any per-doc score column drops in unchanged. ONE window
    //     partitioning per source: the prefix sum and the source
    //     total share the same exchange+sort (pl12's shape). The
    //     keep rule is nucleus-standard — include a doc iff the
    //     mass BEFORE it is under p — and is evaluated entirely in
    //     INTEGER arithmetic ((cum − n_tok)·10 < tot·9): no float
    //     division ever touches the cut boundary, so both engines
    //     agree exactly on every edge doc. ---
    Q("pl17_top_p",
      s"""SELECT source, doc_id, n_tok,
         |  (cum - n_tok) * 10 < tot * 9 AS kept
         |FROM (
         |  SELECT source, doc_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source
         |                     ORDER BY n_tok DESC, doc_id) AS cum,
         |    sum(n_tok) OVER (PARTITION BY source) AS tot
         |  FROM (
         |    SELECT source, doc_id,
         |      CAST(len($DuckToks) AS BIGINT) AS n_tok
         |    FROM documents))
         |ORDER BY source, doc_id""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy("source")
        .orderBy(col("n_tok").desc, col("doc_id"))
      val wAll = Window.partitionBy("source")
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(wOrd))
        .withColumn("tot", sum(col("n_tok")).over(wAll))
        .select(col("source"), col("doc_id"), col("n_tok"),
          ((col("cum") - col("n_tok")) * 10 < col("tot") * 9).as("kept"))
        .orderBy("source", "doc_id")
    },

    // --- Incremental crawl dedup with a Bloom-filter scan prune: flag
    //     which docs of TODAY'S batch were already ingested, against a
    //     history too big to broadcast-hash-join wholesale. The bloom
    //     is built over the BOUNDED new batch (~10 bits/key — fits the
    //     driver even when the batch is millions of docs, where a
    //     broadcast hash relation would not) and applied MAP-SIDE to
    //     the history scan, so only history rows colliding with the
    //     batch (|batch|·(1+fpp), not |history|) reach the exact join.
    //     Results are EXACT — the join removes bloom false positives,
    //     and blooms have no false negatives — which is why this is
    //     oracle-checkable. The batch is a synthesized re-crawl: the
    //     %5 slice unchanged (⇒ seen), the %7 slice modified (⇒ new);
    //     the corpus itself has no exact dup texts (dd01). ---
    Q("pl18_bloom_increment",
      """WITH newbatch AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5(text || ' updated') FROM documents
        |  WHERE doc_id % 7 = 0),
        |hist AS (SELECT DISTINCT md5(text) AS h FROM documents)
        |SELECT n.doc_id,
        |  EXISTS (SELECT 1 FROM hist WHERE hist.h = n.h) AS seen_before
        |FROM newbatch n ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val newBatch = d.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            md5(concat(col("text"), lit(" updated"))).as("h")))
      // sized from the ACTUAL batch (+25% headroom), never a literal:
      // an undersized bloom degrades fpp toward 1 and the map-side
      // history prune silently stops pruning (results stay exact — the
      // join removes false positives — but the scan-prune benefit is
      // the whole point). One extra count() pass over the bounded
      // batch projection is the price of a filter that stays ~10
      // bits/key at any batch size.
      val batchRows = newBatch.count()
      val bloom = newBatch.stat.bloomFilter("h",
        math.max(1000L, batchRows * 5 / 4), 0.01)
      val bloomBc = s.sparkContext.broadcast(bloom)
      // null-aware INSIDE the udf: md5(NULL text) is NULL, and WHERE
      // conjunct evaluation order is not guaranteed, so an external
      // isNotNull guard could still let NULL reach mightContainString
      // (NPE). A NULL hash is trivially not in the batch.
      val mightBeInBatch = udf((h: String) =>
        h != null && bloomBc.value.mightContainString(h))
      // the one deliberate UDF on a scan path: O(1)/row, and it exists
      // to DELETE the history shuffle, not to compute on it
      val histHits = d.select(md5(col("text")).as("hh"))
        .filter(mightBeInBatch(col("hh"))).distinct()
      newBatch.join(histHits, col("h") === col("hh"), "left")
        .select(col("doc_id"), col("hh").isNotNull.as("seen_before"))
        .orderBy("doc_id")
    },

    // --- [pl19 intentionally absent] The id was reserved for a
    //     packed-shard WRITER (pl12's packing materialized to
    //     size-bounded output files); that surface is covered by
    //     pl13_shard_prep + the IndexStore bucketed-table writers, so
    //     the id was retired rather than renumbering every later
    //     query. Coverage audits: pl01-pl18, pl20-pl22 are all
    //     registered; nothing is missing here. ---

    // --- Epoch-based mixture materialization: upsample/downsample each
    //     source to a FRACTIONAL epoch count (2.25× / 1× / 0.5× by
    //     source group) — the training-mixture move where high-quality
    //     sources repeat and low-quality ones subsample. floor(epochs)
    //     full copies per doc, plus one more iff the doc's md5 coin
    //     lands under the fractional part — deterministic, and with
    //     power-of-two fractions the u32 thresholds (2³⁰, 0, 2³¹) are
    //     exact integers, so both engines agree on every edge doc.
    //     Pure projection + bounded explode (fan-out = epochs), no
    //     shuffle before the output sort: at 100 TB the copies
    //     materialize map-side into the shard writer. ---
    Q("pl20_epoch_mixture",
      s"""WITH m AS (
         |  SELECT doc_id, source,
         |    CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INT) % 3 AS g,
         |    ${duckCoin("doc_id")} AS coin
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source,
         |    (CASE g WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN coin < CASE g WHEN 0 THEN 1073741824.0
         |                              WHEN 1 THEN 0.0
         |                              ELSE 2147483648.0 END
         |       THEN 1 ELSE 0 END) AS n
         |  FROM m)
         |SELECT doc_id, source, CAST(u AS INT) AS copy
         |FROM (SELECT doc_id, source, unnest(range(1, n + 1)) AS u
         |      FROM c WHERE n >= 1)
         |ORDER BY doc_id, copy""") { (s, dir) =>
      val g = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") % 3
      val base = when(g === 0, 2).when(g === 1, 1).otherwise(0)
      val thresh = when(g === 0, lit(1073741824.0))
        .when(g === 1, lit(0.0)).otherwise(lit(2147483648.0))
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          (base + when(coinOf(col("doc_id")) < thresh, 1).otherwise(0))
            .as("n"))
        // sequence(1, 0) yields [1, 0] (negative step), not empty —
        // zero-copy docs must be filtered before the explode
        .filter(col("n") >= 1)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1), col("n"))).as("copy"))
        .orderBy("doc_id", "copy")
    },

    // --- HTML main-content extraction (the crawl stage UPSTREAM of
    //     every other curation op): wrap each doc in deterministic page
    //     chrome — nav/script/footer boilerplate — then recover the
    //     article text by dropping script blocks wholesale, stripping
    //     tags, decoding entities, and collapsing whitespace. Pure
    //     regex projections (one corpus pass, no shuffle before the
    //     sort); at 100 TB extraction is embarrassingly parallel and
    //     fuses into the scan. The md5 pins byte-exact recovery: the
    //     extracted text must equal the original article + the nav/
    //     footer TEXT the real extractor would also keep (tags and
    //     scripts gone), so parity is provable, not eyeballed. ---
    Q("pl21_html_extract",
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><head><script>var t=' || CAST(doc_id AS VARCHAR)
        |      || ';track(t);</script></head><body>'
        |      || '<nav>Home &amp; About</nav>'
        |      || '<div class="main"><p>' || text || '</p></div>'
        |      || '<footer>&copy; 2024 corp</footer></body></html>' AS html
        |  FROM documents),
        |ext AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(html, '<script.*?</script>', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g'),
        |      '&amp;', '&', 'g'),
        |      '&copy;', '(c)', 'g'),
        |      '\s+', ' ', 'g')) AS extracted
        |  FROM page)
        |SELECT doc_id, length(extracted) AS n_chars,
        |  md5(extracted) AS extract_md5
        |FROM ext
        |ORDER BY doc_id""") { (s, dir) =>
      val page = docs(s, dir).select(col("doc_id"),
        concat(
          lit("<html><head><script>var t="), col("doc_id").cast("string"),
          lit(";track(t);</script></head><body>"),
          lit("<nav>Home &amp; About</nav>"),
          lit("<div class=\"main\"><p>"), col("text"), lit("</p></div>"),
          lit("<footer>&copy; 2024 corp</footer></body></html>")).as("html"))
      val extracted = trim(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(col("html"),
          "<script.*?</script>", " "),
          "<[^>]+>", " "),
          "&amp;", "&"),
          "&copy;", "(c)"),
          "\\s+", " "))
      page.select(col("doc_id"), extracted.as("extracted"))
        .select(col("doc_id"), length(col("extracted")).as("n_chars"),
          md5(col("extracted")).as("extract_md5"))
        .orderBy("doc_id")
    },

    // --- Data-quality audit (dbt-test / Great-Expectations shape): one
    //     report row per expectation — referential integrity via anti-
    //     join counts, column-range and consistency invariants via
    //     conditional sums. Each check is either a map-side conditional
    //     aggregation (one pass per table, partials combine) or an
    //     anti-join on the FK: BROADCAST when the referenced side is a
    //     dimension (customer), a shuffle anti-join when it is itself
    //     fact-sized (orders under lineitem — at 100 TB that key set
    //     does not broadcast, and the shuffle anti-join on the FK is
    //     the correct plan). Nothing materializes violating ROWS, only
    //     counts. All of a table's conditional invariants share ONE
    //     scan+agg (lineitem's two range checks, documents' two
    //     consistency checks); each FK check is its own anti-join scan
    //     — so a table costs one scan per check CLASS, not per check.
    //     A zero row proves the check RAN and passed (absent ≠
    //     passing). ---
    Q("pl22_data_audit",
      """SELECT check_name, n_violations FROM (
        |  SELECT 'orders_orphan_custkey' AS check_name,
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)) AS n_violations
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey',
        |    (SELECT count(*) FROM lineitem l
        |     WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_discount < 0 OR l_discount > 0.1)
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_qty',
        |    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
        |  UNION ALL
        |  SELECT 'documents_blank_text',
        |    (SELECT count(*) FROM documents
        |     WHERE text IS NULL OR trim(text) = '')
        |  UNION ALL
        |  SELECT 'documents_nchars_mismatch',
        |    (SELECT count(*) FROM documents WHERE n_chars <> length(text)))
        |ORDER BY check_name""") { (s, dir) =>
      def row(name: String, n: org.apache.spark.sql.DataFrame) =
        n.select(lit(name).as("check_name"),
          col("n").cast("long").as("n_violations"))
      val li = docs(s, dir) // documents
      val orders = tables.load(s, dir, "orders")
      val cust = tables.load(s, dir, "customer")
      val line = tables.load(s, dir, "lineitem")
      val orphanOrders = orders
        .join(broadcast(cust.select(col("c_custkey").as("o_custkey"))),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
      val orphanLines = line
        .join(orders.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
      // one scan + one agg carries BOTH lineitem invariants (and both
      // documents invariants): conditional sums over the same rows
      // must not each pay their own 100-TB pass
      val lineChecks = line.agg(
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("disc"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("qty"))
      val docChecks = li.agg(
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("blank"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("mismatch"))
      // stack() fans the one-row agg into report rows INSIDE the same
      // subtree — selecting each counter into its own union branch
      // would replant (and re-scan) the whole agg per branch
      val lineRows = lineChecks.select(expr(
        """stack(2, 'lineitem_discount_range', disc,
          |         'lineitem_nonpositive_qty', qty)
          |  AS (check_name, n_violations)""".stripMargin))
      val docRows = docChecks.select(expr(
        """stack(2, 'documents_blank_text', blank,
          |         'documents_nchars_mismatch', mismatch)
          |  AS (check_name, n_violations)""".stripMargin))
      row("orders_orphan_custkey", orphanOrders)
        .unionByName(row("lineitem_orphan_orderkey", orphanLines))
        .unionByName(lineRows)
        .unionByName(docRows)
        .orderBy("check_name")
    },

    // --- Linear quality classifier (fastText / CCNet shape): score
    //     every doc with a Bernoulli naive-Bayes log-odds model over
    //     HASHED bag-of-words features, trained on a good/bad source
    //     split of the corpus itself (the CCNet recipe: Wikipedia-like
    //     sources as positives, raw crawl as negatives — here the
    //     deterministic stand-in is source-number parity). The hashing
    //     trick is the scale contract: features are md5-u32 % 4096
    //     buckets, so the model is AT MOST 4096 rows no matter the
    //     corpus size — it broadcasts at 100 TB exactly as it does at
    //     sf0.001, and training is two bucket-sized aggregations.
    //     Feature extraction (distinct tokens → distinct buckets) is
    //     all in-row array ops — map-side, no shuffle. Weights
    //     w(b) = ln((df_good+1)(n_bad+2) / ((df_bad+1)(n_good+2))) are
    //     ln of an exact integer ratio; per-doc score sums ≤4096 such
    //     terms, so merge-order noise ~1e-13 sits far below the
    //     4-decimal rounding (the tx25 determinism argument). The
    //     keep flag thresholds the ROUNDED score so both engines
    //     compare identical doubles. ---
    Q("pl23_quality_classifier",
      s"""WITH $DuckClassifierCtes
         |SELECT lab.doc_id, CAST(len(lab.fs) AS INT) AS n_feats,
         |  round(coalesce(sc.score, 0), 4) AS score,
         |  CAST(round(coalesce(sc.score, 0), 4) > 0 AS INT) AS keep
         |FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id
         |ORDER BY lab.doc_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // persisted: THREE consumers (training doc-freqs, scoring
      // explode, final doc list) — uncached, each re-tokenizes the
      // corpus. Feature arrays are tiny (distinct buckets per doc).
      val lab = docs(s, dir).select(
          col("doc_id"),
          (expr("substring(source, 4)").cast("int") % 2).as("good"),
          classifierFeatures(col("text")).as("fs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      classifierScore(lab, classifierWeights(lab)).orderBy("doc_id")
    },

    // --- Classifier-driven SELECTION: keep the top 30% of each
    //     source by quality score (the DCLM/FineWeb recipe — a
    //     trained filter scores everything, a per-source quantile cut
    //     decides what trains). Composes the shared classifier
    //     primitives with a per-source rank: the cut
    //     rank ≤ ceil(0.3·n) is evaluated as 10·rk ≤ 3·n + 9 in
    //     exact integer arithmetic, and both engines rank on the
    //     ROUNDED score with doc_id tiebreak, so the kept set is
    //     deterministic cross-engine. One source-partitioned window
    //     exchange beyond the scoring itself; at 100 TB the sort is
    //     per-source-partition, never global. ---
    Q("pl24_classifier_topq",
      s"""WITH $DuckClassifierCtes,
         |scored AS (
         |  SELECT lab.doc_id, round(coalesce(sc.score, 0), 4) AS score
         |  FROM lab LEFT JOIN sc ON lab.doc_id = sc.doc_id),
         |r AS (
         |  SELECT d.source, s.doc_id, s.score,
         |    row_number() OVER (PARTITION BY d.source
         |                       ORDER BY s.score DESC, s.doc_id) AS rk,
         |    count(*) OVER (PARTITION BY d.source) AS n_s
         |  FROM scored s JOIN documents d USING (doc_id))
         |SELECT source, doc_id, score, CAST(rk AS INT) AS rk
         |FROM r WHERE rk * 10 <= n_s * 3 + 9
         |ORDER BY source, rk""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.storage.StorageLevel
      val lab = docs(s, dir).select(
          col("doc_id"), col("source"),
          (expr("substring(source, 4)").cast("int") % 2).as("good"),
          classifierFeatures(col("text")).as("fs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val scored = classifierScore(lab, classifierWeights(lab))
        .join(lab.select(col("doc_id"), col("source")), "doc_id")
      val bySrc = Window.partitionBy("source")
      val ranked = scored
        .withColumn("rk", row_number().over(
          bySrc.orderBy(col("score").desc, col("doc_id"))))
        .withColumn("n_s", count(lit(1)).over(bySrc))
      ranked.filter(col("rk") * 10 <= col("n_s") * 3 + 9)
        .select(col("source"), col("doc_id"), col("score"), col("rk"))
        .orderBy("source", "rk")
    },

    // --- PII REDACTION, full-coverage successor to round-5 pl08:
    //     pl08 pins the count+scrub+digest mechanics on
    //     email + a toy '555-dddd' phone and reports HIT DOCS ONLY —
    //     the oracle-parity core. This is the production-shaped pass a
    //     compliance review actually runs: adds IPv4, a real
    //     10-digit boundary-anchored phone pattern, and one row per
    //     DOC (zero-hit docs prove scrubbed-ness too — absence of
    //     evidence must be recorded evidence). Same deterministic
    //     doc_id synthesis device (~1/7 email, ~1/11 phone, ~1/13
    //     IP); patterns in the Java∩RE2 common subset ([0-9] classes,
    //     (?:) groups, \\b boundaries — no lookbehind); DuckDB
    //     replace under 'g' to match Spark's replace-all. Scale
    //     shape: pure map-side projection — zero shuffles before the
    //     output sort, the cheapest possible 100 TB pass. ---
    Q("pl26_pii_redact", {
      val enr = "text || " +
        s"(CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) || " +
        s"(CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END) || " +
        s"(CASE WHEN doc_id % 13 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) || '.' || CAST(doc_id % 254 + 1 AS VARCHAR) ELSE '' END)"
      s"""WITH e AS (SELECT doc_id, $enr AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$PiiEmailRe')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$PiiPhoneRe')) AS INT) AS n_phone,
         |  CAST(len(regexp_extract_all(t, '$PiiIpRe')) AS INT) AS n_ip,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '$PiiEmailRe', '<EMAIL>', 'g'),
         |    '$PiiPhoneRe', '<PHONE>', 'g'),
         |    '$PiiIpRe', '<IP>', 'g')) AS red_digest
         |FROM e ORDER BY doc_id"""
    }) { (s, dir) =>
      val id = col("doc_id")
      val enriched = concat(col("text"),
        when(id % 7 === 0, concat(lit(" contact user"), id.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
        when(id % 11 === 0, concat(lit(" call 555-"),
          (id % 900 + 100).cast("string"), lit("-"),
          (id % 9000 + 1000).cast("string"))).otherwise(lit("")),
        when(id % 13 === 0, concat(lit(" host 10."),
          (id % 256).cast("string"), lit("."),
          ((id * 3) % 256).cast("string"), lit("."),
          (id % 254 + 1).cast("string"))).otherwise(lit("")))
      val redacted = regexp_replace(regexp_replace(regexp_replace(
        col("t"), lit(PiiEmailRe), lit("<EMAIL>")),
        lit(PiiPhoneRe), lit("<PHONE>")),
        lit(PiiIpRe), lit("<IP>"))
      docs(s, dir).select(col("doc_id"), enriched.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(PiiEmailRe), lit(0)))
            .as("n_email"),
          size(regexp_extract_all(col("t"), lit(PiiPhoneRe), lit(0)))
            .as("n_phone"),
          size(regexp_extract_all(col("t"), lit(PiiIpRe), lit(0)))
            .as("n_ip"),
          md5(redacted.cast("binary")).as("red_digest"))
        .orderBy("doc_id")
    },

    // --- IMPORTANCE RESAMPLING against a target domain (the DSIR
    //     recipe — Xie et al. 2023, "Data Selection for Language
    //     Models via Importance Resampling": score every raw doc by
    //     how much more likely its tokens are under a TRUSTED-domain
    //     LM than under the raw-corpus LM, then sample by weight).
    //     Target = sources src0/src1 (the stand-in for "wiki-quality"
    //     domains); both LMs are add-1-smoothed unigram models over
    //     the corpus vocabulary, and the per-doc report is the
    //     per-token mean log2 likelihood ratio — the deterministic
    //     core of DSIR (production adds Gumbel noise at the final
    //     sample; a seeded coin like pl15's md5 device slots in
    //     unchanged). Scale shape (the tx40 pattern): ONE corpus
    //     tokenize persisted for LM build AND scoring; both LMs
    //     collapse to vocab-sized frames; the merged log-ratio table
    //     BROADCASTS onto the token stream; scoring is one map-side
    //     join + one doc-keyed aggregation — the corpus is never
    //     self-joined. Determinism: per-token ratios are exact-rounded
    //     double ops + libm log2; the 6-decimal rounding over a
    //     ≤doc-length mean absorbs ulp drift (the tx36/tx40 device).
    //     ---
    Q("pl27_importance_resample",
      s"""WITH t AS (
         |  SELECT doc_id, source, unnest($DuckToks) AS w FROM documents),
         |corp AS (SELECT w, count(*) AS cc FROM t GROUP BY w),
         |tgt AS (SELECT w, count(*) AS ct FROM t
         |        WHERE source IN ('src0', 'src1') GROUP BY w),
         |tot AS (SELECT
         |    (SELECT count(*) FROM t WHERE source IN ('src0', 'src1')) AS nt,
         |    (SELECT count(*) FROM t) AS nc,
         |    (SELECT count(DISTINCT w) FROM t) AS v),
         |lm AS (
         |  SELECT corp.w,
         |    log2(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE))
         |    - log2(CAST(cc + 1 AS DOUBLE) / CAST(nc + v AS DOUBLE)) AS lr
         |  FROM corp LEFT JOIN tgt ON tgt.w = corp.w CROSS JOIN tot),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_toks, avg(lr) AS s
         |  FROM t JOIN lm ON lm.w = t.w GROUP BY doc_id)
         |SELECT d.doc_id, d.source,
         |  CAST(coalesce(sc.n_toks, 0) AS BIGINT) AS n_toks,
         |  round(coalesce(sc.s, 0.0), 6) AS logw
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val t = dsirTokens(docs(s, dir))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sc = dsirScored(t, dsirLogRatios(t))
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_toks"), lit(0L)).as("n_toks"),
          graft.functions.ParityFunctions
            .duckRound(coalesce(col("s"), lit(0.0)), 6).as("logw"))
        .orderBy("doc_id")
    },

    // --- DETERMINISTIC TRAINING ORDER (the last batch step before a
    //     training run reads the corpus): every doc gets a shard and a
    //     position inside it, both pure functions of the doc id — so
    //     any two runs (or a resumed run, or an auditor re-deriving
    //     "what was example 31,337 of shard 5?") materialize the SAME
    //     order without coordination. Shard = md5-u32 % nShards;
    //     in-shard order = the md5 of a second salt (independent of
    //     the shard coin, so order within a shard is uniform too).
    //     Scale shape: ONE hash shuffle into shard-keyed partitions and
    //     one sort per shard — the sort IS the deliverable (an ordering
    //     cannot cost less), and per-shard volume is corpus/nShards
    //     with nShards in the thousands at 100 TB (8 here), so no task
    //     ever sees a corpus-sized sort. row_number (not a global
    //     offset) keeps positions dense per shard, which is what
    //     sharded data loaders index by. ---
    Q("pl28_training_order",
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % $OrderShards AS shard_id,
         |    md5('ord' || CAST(doc_id AS VARCHAR)) AS ok
         |  FROM documents)
         |SELECT shard_id, CAST(row_number() OVER (
         |    PARTITION BY shard_id ORDER BY ok, doc_id) AS BIGINT) AS pos,
         |  doc_id
         |FROM sh
         |ORDER BY shard_id, pos""") { (s, dir) =>
      trainingOrderOf(docs(s, dir)).orderBy("shard_id", "pos")
    },

    // --- FIRST-SEEN N-GRAM NOVELTY (the curriculum / incremental-value
    //     diagnostic): how much genuinely NEW content does each doc
    //     add, attributing every distinct corpus 5-gram to the lowest
    //     doc_id containing it (the ingestion-order "first seen").
    //     Docs full of already-seen shingles score ~0 (boilerplate,
    //     near-dups that survived exact dedup); novelty ~1 marks fresh
    //     material — the ordering signal data-curriculum recipes
    //     (and dedup post-mortems) read. Scale shape: shingles are
    //     md5 DIGESTS the moment they exist (32 fixed chars shuffle,
    //     never n-gram text — the tx32/dd09 discipline); first-seen is
    //     a digest-keyed min; attribution joins the per-doc distinct
    //     digest frame back on the digest — every stage is a linear
    //     digest- or doc-keyed equi-job, nothing pairwise. ---
    Q("pl29_ngram_novelty",
      """WITH ng AS (
        |  SELECT DISTINCT doc_id, md5(ng) AS d
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |           tk[i+3] || ' ' || tk[i+4])) AS ng
        |    FROM (SELECT doc_id,
        |            list_filter(string_split_regex(lower(text), '\s+'),
        |                        x -> x <> '') AS tk
        |          FROM documents))),
        |fs AS (SELECT d, min(doc_id) AS first_doc FROM ng GROUP BY d),
        |per AS (
        |  SELECT ng.doc_id, count(*) AS n_ng,
        |    sum(CASE WHEN fs.first_doc = ng.doc_id THEN 1 ELSE 0 END) AS n_novel
        |  FROM ng JOIN fs ON fs.d = ng.d
        |  GROUP BY ng.doc_id)
        |SELECT doc_id, CAST(n_ng AS BIGINT) AS n_ng,
        |  CAST(n_novel AS BIGINT) AS n_novel,
        |  round(CAST(n_novel AS DOUBLE) / CAST(n_ng AS DOUBLE), 6) AS novelty
        |FROM per
        |ORDER BY doc_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val ng = ngramDigestsOf(docs(s, dir))
        .persist(StorageLevel.MEMORY_AND_DISK) // per-doc count + first-seen agg
      // Attribution WITHOUT the digest-scale join back (round-18
      // optimization): every ng row joins exactly one fs row, so
      // n_novel(doc) == count of first-seen rows owned by the doc —
      // a doc-cardinality aggregate of fs replaces re-shuffling the
      // whole digest stream onto the first-seen table (the baseline's
      // dominant shuffle; at 100 TB that join ships every distinct
      // shingle digest a second time). n_ng is the same per-doc count
      // as before; rows and values are identical by the 1:1 join
      // argument, re-proved against the oracle at 3 SFs.
      val fs = ng.groupBy("d").agg(min(col("doc_id")).as("first_doc"))
      val novel = fs.groupBy(col("first_doc").as("doc_id"))
        .agg(count(lit(1)).as("n_novel"))
      ng.groupBy("doc_id").agg(count(lit(1)).as("n_ng"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_ng"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          graft.functions.ParityFunctions.duckRound(
            coalesce(col("n_novel"), lit(0L)).cast("double") /
              col("n_ng").cast("double"), 6)
            .as("novelty"))
        .orderBy("doc_id")
    },

    // --- POISSON BOOTSTRAP (Chamandy et al., "Estimating Uncertainty
    //     for Massive Data Streams", Google TR 2012 — the one-pass
    //     resampling scheme for data too big to actually resample):
    //     classical bootstrap draws n docs WITH replacement per
    //     replicate — a corpus-sized shuffle per replicate, B of them.
    //     The Poisson trick replaces the draw with an independent
    //     per-(doc, replicate) weight ~ Poisson(1); each replicate's
    //     statistic is then a WEIGHTED aggregate, so all B replicates
    //     compute in ONE corpus scan with a ×B map-side fan-out and a
    //     B-group aggregation — the spread across replicate means IS
    //     the standard error. Determinism (no RNG): the weight comes
    //     from the pl03/pl15 md5-u32 coin pushed through the
    //     Poisson(1) inverse CDF as a CASE ladder over literal
    //     cumulative-probability thresholds — both engines compare the
    //     same exactly-rounded double against the same literals.
    //     Replicate sums accumulate EXACT integers (w · n_chars), so
    //     merge order can't move the rounding boundary (the pl09
    //     device); only the final mean divides. ---
    Q("pl30_bootstrap", {
      val ladder = PoissonCdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString("\n        |      ", "\n        |      ", s"\n        |      ELSE ${PoissonCdf.size}")
      s"""WITH reps AS (SELECT unnest(range(0, $BootReps)) AS b),
        |coins AS (
        |  SELECT b, doc_id, n_chars,
        |    CAST(CAST(concat('0x', substr(md5('boot' || CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents CROSS JOIN reps),
        |weighted AS (
        |  SELECT b, doc_id, n_chars,
        |    CASE $ladder END AS w
        |  FROM coins)
        |SELECT b,
        |  CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * n_chars) AS BIGINT) AS sum_chars,
        |  round(CAST(sum(w * n_chars) AS DOUBLE)
        |        / CAST(greatest(sum(w), 1) AS BIGINT), 6) AS mean_chars
        |FROM weighted
        |GROUP BY b
        |ORDER BY b"""
    }) { (s, dir) =>
      val reps = s.range(0, BootReps).select(col("id").as("b"))
      val coins = docs(s, dir).select(col("doc_id"), col("n_chars"))
        .crossJoin(broadcast(reps))
        .withColumn("u",
          conv(substring(md5(concat(lit("boot"), col("b").cast("string"),
            lit(":"), col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("double") / 4294967296.0)
      val w = PoissonCdf.zipWithIndex.foldRight(
          lit(PoissonCdf.size): org.apache.spark.sql.Column) {
        case ((c, k), rest) => when(col("u") < c, lit(k)).otherwise(rest)
      }
      coins.withColumn("w", w.cast("long"))
        .groupBy("b")
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("n_chars")).as("sum_chars"))
        .select(col("b"), col("n_eff"), col("sum_chars"),
          graft.functions.ParityFunctions.duckRound(
            col("sum_chars").cast("double") /
              greatest(col("n_eff"), lit(1L)).cast("double"), 6)
            .as("mean_chars"))
        .orderBy("b")
    },

    // --- SHARD MANIFEST with an ORDER-SENSITIVE checksum (the
    //     integrity artifact a training run ships next to pl28's
    //     order): per shard, doc/char counts plus a position-weighted
    //     content checksum Σ (h(doc) mod P) · (pos mod P) mod P — any
    //     dropped, substituted OR REORDERED doc changes it, so a
    //     resumed run (or a different engine) can verify it is reading
    //     byte-identical data in the identical order. The naive
    //     order-sensitive digest (md5 over the position-concatenated
    //     doc digests) needs a shard-length string per shard — GBs at
    //     100 TB; the weighted mod-sum is ASSOCIATIVE (any partial-agg
    //     merge order) and constant-size, the checksum analogue of the
    //     pl09 exact-integer device. Accumulated as decimal(38,0) /
    //     HUGEINT so no shard size can wrap the sum. ---
    Q("pl31_order_manifest",
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % $OrderShards AS shard_id,
         |    md5('ord' || CAST(doc_id AS VARCHAR)) AS ok
         |  FROM documents),
         |ord AS (
         |  SELECT shard_id, doc_id, row_number() OVER (
         |    PARTITION BY shard_id ORDER BY ok, doc_id) AS pos
         |  FROM sh),
         |d AS (
         |  SELECT doc_id, n_chars,
         |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents)
         |SELECT shard_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(((h % $ChecksumP) * (pos % $ChecksumP)) % $ChecksumP)
         |       % $ChecksumP AS BIGINT) AS checksum
         |FROM ord JOIN d USING (doc_id)
         |GROUP BY shard_id
         |ORDER BY shard_id""") { (s, dir) =>
      orderManifestOf(docs(s, dir)).orderBy("shard_id")
    },

    // --- DOMAIN DOWNSAMPLING (the C4/RefinedWeb balancing stage that
    //     pl09 only REPORTS on): over-represented domains are
    //     rate-capped to ~$DomainCap expected docs each; domains at or
    //     under the cap pass whole. The keep decision is
    //     INTEGER-EXACT — keep iff md5-u32(doc) mod cnt < cap, so
    //     probability cap/cnt per doc with zero float parity risk and
    //     full pl28-style re-derivability. Scale shape: the per-domain
    //     count frame is DOMAIN-cardinality (tiny — broadcast into the
    //     corpus scan) and the decision is pure map-side; the exact-K
    //     alternative (row_number over a domain-partitioned window)
    //     would funnel corpus/n_domains rows into single partitions —
    //     a skew bomb at 100 TB that this shape never builds. ---
    Q("pl32_domain_downsample",
      s"""WITH u AS (
         |  SELECT doc_id,
         |    source || '.example-' || lang || '.com' AS domain,
         |    CAST(concat('0x',
         |      substr(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      AS h
         |  FROM documents),
         |c AS (SELECT domain, count(*) AS cnt FROM u GROUP BY domain)
         |SELECT u.doc_id, u.domain
         |FROM u JOIN c ON c.domain = u.domain
         |WHERE c.cnt <= $DomainCap OR u.h % c.cnt < $DomainCap
         |ORDER BY doc_id""") { (s, dir) =>
      val u = docs(s, dir).select(col("doc_id"),
        concat(col("source"), lit(".example-"), col("lang"), lit(".com"))
          .as("domain"),
        conv(substring(md5(concat(lit("cap"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long").as("h"))
      val cnt = u.groupBy("domain").agg(count(lit(1)).as("cnt"))
      u.join(broadcast(cnt), Seq("domain"))
        .filter(col("cnt") <= DomainCap || pmod(col("h"), col("cnt")) < DomainCap)
        .select("doc_id", "domain")
        .orderBy("doc_id")
    },

    // --- SEQUENCE PACKING (concat-then-chunk, the canonical LM
    //     pretraining prep): docs in pl28's deterministic shard order
    //     are laid end to end and cut into $SeqTokens-token training
    //     sequences; each doc's seq_id = tokens-before-it ÷ $SeqTokens,
    //     a doc-granularity map of the corpus onto fixed-length
    //     context windows (which sequence each doc starts in, and at
    //     what offset). All integer arithmetic — the running token
    //     count is an exact BIGINT prefix sum. Scale shape: ONE
    //     per-shard window prefix-sum on top of pl28's existing
    //     shard sort (per-partition volume = corpus/nShards, thousands
    //     of shards at 100 TB); no new shuffle beyond the n_tok join. ---
    Q("pl33_sequence_pack", packOracle) { (s, dir) =>
      packedOrderOf(docs(s, dir)).orderBy("shard_id", "pos")
    },

    // --- pl33 SERVED FROM THE FROZEN ARTIFACT (the tx41/sm13
    //     serve-from-store pattern): the same oracle as pl33, answered
    //     from `OrderStore`'s shard-partitioned table — the path a
    //     training run's data loader actually takes. The read is a
    //     plain scan of the frozen order (no corpus scan, no window,
    //     no re-sort beyond the output's presentation ORDER BY). ---
    Q("pl35_pack_from_store", packOracle) { (s, dir) =>
      val store = graft.index.OrderStore.forCorpus(s, dir)
      graft.index.OrderStore.order(s, store)
        .select("shard_id", "pos", "doc_id", "n_tok", "seq_id", "seq_offset")
        .orderBy("shard_id", "pos")
    },

    // --- CORPUS DATASHEET (the per-(source, lang) data card a
    //     pipeline publishes next to a release): volume, exact token
    //     mass, mean length, and exact-duplicate incidence — the
    //     stratified membership/size/duplication facts an auditor
    //     checks before the per-doc signals (quality pl23, novelty
    //     pl29, manifest pl31) even matter. Scale shape: one corpus
    //     scan into a digest-keyed dup count (dd01's linear shuffle)
    //     joined back doc-keyed, then a GROUP-cardinality aggregate;
    //     nothing wider than dd01 itself. ---
    Q("pl34_corpus_datasheet",
      """WITH d AS (
        |  SELECT source, lang, doc_id, n_chars,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        x -> x <> '')) AS n_tok,
        |    md5(text) AS dig
        |  FROM documents),
        |dc AS (SELECT dig, count(*) AS copies FROM d GROUP BY dig)
        |SELECT d.source, d.lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(d.n_tok) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(d.n_chars) AS DOUBLE) / count(*), 4) AS mean_chars,
        |  CAST(sum(CASE WHEN dc.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact_dup
        |FROM d JOIN dc ON dc.dig = d.dig
        |GROUP BY d.source, d.lang
        |ORDER BY source, lang""") { (s, dir) =>
      val d = docs(s, dir).select(col("source"), col("lang"), col("doc_id"),
        col("n_chars"), tokenCount(col("text")).cast("long").as("n_tok"),
        md5(col("text")).as("dig"))
      val dc = d.groupBy("dig").agg(count(lit(1)).as("copies"))
      d.join(dc, Seq("dig"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          graft.functions.ParityFunctions.duckRound(
            sum("n_chars").cast("double") /
              count(lit(1)).cast("double"), 4).as("mean_chars"),
          sum(when(col("copies") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
        .orderBy("source", "lang")
    },

    // --- PSI numeric-feature drift (Population Stability Index — the
    //     feature-store standard for "has this slice's DISTRIBUTION
    //     moved off the baseline", tx36's numeric twin): per source,
    //     PSI of its doc-length histogram against the corpus-wide
    //     histogram, over FIXED 50-char buckets (production freezes
    //     the edges with the baseline window — a data-derived edge
    //     would move under the drift it measures). Buckets the corpus
    //     occupies but the source doesn't are REPORTED as
    //     n_missing_buckets, not epsilon-smoothed into the sum (the
    //     DriftMonitor unseen-mass convention) — every summed term is
    //     then exactly defined, and 6-dp rounding sits above sum-order
    //     ULP noise (the tx36/q34 device). Scale shape: one corpus
    //     scan collapses to (source, bucket) counts — sources×buckets
    //     rows; every downstream join/agg is that size. ---
    Q("pl36_psi_drift",
      """WITH bk AS (
        |  SELECT source, CAST(floor(n_chars / 50) AS BIGINT) AS bucket
        |  FROM documents),
        |sb AS (SELECT source, bucket, count(*) AS c
        |       FROM bk GROUP BY source, bucket),
        |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
        |      FROM sb GROUP BY source),
        |cb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c_b
        |       FROM sb GROUP BY bucket),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sb),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets FROM cb)
        |SELECT sb.source, s.n_s AS n_docs,
        |  round(sum((CAST(sb.c AS DOUBLE) / s.n_s
        |             - CAST(cb.c_b AS DOUBLE) / n.n)
        |    * ln((CAST(sb.c AS DOUBLE) * n.n)
        |         / (CAST(s.n_s AS DOUBLE) * cb.c_b))), 6) AS psi,
        |  CAST(nb.n_buckets - count(*) AS BIGINT) AS n_missing_buckets
        |FROM sb JOIN s USING (source) JOIN cb USING (bucket)
        |  CROSS JOIN n CROSS JOIN nb
        |GROUP BY sb.source, s.n_s, nb.n_buckets
        |ORDER BY sb.source""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // persisted: the (source, bucket) count frame has four consumers
      // (both marginals, the grand total, the PSI join) — the tx36
      // cache rationale; the frame is sources×buckets rows at any SF
      val sb = docs(s, dir)
        .select(col("source"),
          floor(col("n_chars") / lit(50)).as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sTot = sb.groupBy("source").agg(sum("c").as("n_s"))
      val cb = sb.groupBy("bucket").agg(sum("c").as("c_b"))
      val n = sb.agg(sum("c").as("n"))
      val nb = cb.agg(count(lit(1)).as("n_buckets"))
      sb.join(broadcast(sTot), "source")
        .join(broadcast(cb), "bucket")
        .crossJoin(broadcast(n))
        .crossJoin(broadcast(nb))
        .groupBy(col("source"), col("n_s"), col("n_buckets"))
        .agg(
          sum((col("c").cast("double") / col("n_s").cast("double") -
               col("c_b").cast("double") / col("n").cast("double")) *
            log((col("c").cast("double") * col("n").cast("double")) /
                (col("n_s").cast("double") * col("c_b").cast("double"))))
            .as("psi_raw"),
          count(lit(1)).as("n_occupied"))
        .select(col("source"), col("n_s").as("n_docs"),
          graft.functions.ParityFunctions.duckRound(col("psi_raw"), 6)
            .as("psi"),
          (col("n_buckets") - col("n_occupied")).as("n_missing_buckets"))
        .orderBy("source")
    },

    // --- PER-EVAL-ITEM n-gram DIRTINESS (the GPT-3 appendix-C report,
    //     the third contamination angle: pl01 reports TRAINING docs
    //     carrying benchmark n-grams, pl14 finds fuzzy doc-level
    //     matches — this scores each EVAL item by the fraction of its
    //     distinct 5-grams found anywhere in the train side, the
    //     number a decontamination writeup actually publishes; any
    //     collision marks the item dirty, exactly the published rule,
    //     with 5-grams standing in for the paper's 13 on the short
    //     synthetic docs). Eval set = the doc_id % 5 = 0 slice (pl14's
    //     convention). Scale shape: the collided set is EVAL-BOUNDED —
    //     the corpus-width train n-gram stream is semi-joined against
    //     the broadcast eval n-gram set map-side (the
    //     ContaminationMonitor direction), never the reverse, and
    //     everything downstream is eval-sized. Counts are over
    //     DISTINCT per-doc n-grams (deterministic and
    //     repeat-insensitive). ---
    Q("pl38_token_budget", {
      val B = 100000L
      s"""WITH t AS (
         |  SELECT source, CAST(len($DuckToks) AS BIGINT) AS n
         |  FROM documents),
         |s AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens
         |      FROM t GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM s),
         |f AS (
         |  SELECT source, n_tokens,
         |    CAST(($B * n_tokens) // total AS BIGINT) AS fl,
         |    CAST(($B * n_tokens) % total AS BIGINT) AS rem
         |  FROM s CROSS JOIN tot),
         |k AS (SELECT CAST($B - sum(fl) AS BIGINT) AS k FROM f),
         |rk AS (
         |  SELECT source, n_tokens, fl, rem,
         |    row_number() OVER (ORDER BY rem DESC, source) AS rn
         |  FROM f)
         |SELECT rk.source, rk.n_tokens, rk.rem,
         |  CAST(rk.fl + CASE WHEN rk.rn <= k.k THEN 1 ELSE 0 END AS BIGINT)
         |    AS quota
         |FROM rk CROSS JOIN k
         |ORDER BY rk.source"""
    }) { (s, dir) =>
      // --- TOKEN-BUDGET apportionment (the planning step every data
      //     mixture runs before sampling: split a global training-token
      //     budget across sources so the integer quotas sum EXACTLY to
      //     the budget): Hamilton largest-remainder — quota = floor of
      //     the proportional share, then the k = B − Σfloor sources
      //     with the largest remainders get one extra. ENTIRELY
      //     INTEGER arithmetic ((B·n) div total, (B·n) mod total), so
      //     the apportionment cannot flip between engines on a float
      //     ULP the way a sqrt-temperature weighting could — the
      //     flattened variant plugs pl15's rates into the same frame
      //     downstream. Cost: one corpus scan collapsing to
      //     sources-sized frames; the remainder ranking is a global
      //     window over ≤|sources| rows. ---
      import org.apache.spark.sql.expressions.Window
      val B = 100000L
      val t = docs(s, dir).select(col("source"),
        size(tokens(col("text"))).cast("long").as("n"))
      // materialized once (the pl41 rationale): the per-source
      // aggregate fans out to the total, the floor/remainder frame,
      // the k count and the final ranking — unmaterialized, the
      // corpus tokenize pass ran four times for sources-sized algebra
      val srcTok = t.groupBy("source").agg(sum("n").as("n_tokens"))
        .localCheckpoint(true)
      val tot = srcTok.agg(sum("n_tokens").as("total"))
      val f = srcTok.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"),
          expr(s"($B * n_tokens) div total").as("fl"),
          ((lit(B) * col("n_tokens")) % col("total")).as("rem"))
      val k = f.agg((lit(B) - sum("fl")).as("k"))
      val w = Window.orderBy(col("rem").desc, col("source"))
      f.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(k))
        .select(col("source"), col("n_tokens"), col("rem"),
          (col("fl") + when(col("rn") <= col("k"), 1L).otherwise(0L))
            .as("quota"))
        .orderBy("source")
    },

    Q("pl37_eval_dirtiness",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(tk) - 3),
         |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS ngram
         |  FROM tk),
         |ev AS (SELECT DISTINCT doc_id, ngram FROM g WHERE doc_id % 5 = 0),
         |tr AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 5 <> 0),
         |hit AS (
         |  SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_dirty
         |  FROM ev JOIN tr ON tr.ngram = ev.ngram
         |  GROUP BY ev.doc_id),
         |base AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM ev GROUP BY doc_id)
         |SELECT t.doc_id,
         |  coalesce(b.n_grams, 0) AS n_grams,
         |  coalesce(h.n_dirty, 0) AS n_dirty,
         |  round(CAST(coalesce(h.n_dirty, 0) AS DOUBLE)
         |    / CAST(greatest(coalesce(b.n_grams, 0), 1) AS DOUBLE), 6)
         |    AS dirty_frac,
         |  CASE WHEN coalesce(h.n_dirty, 0) > 0 THEN 'dirty'
         |       ELSE 'clean' END AS status
         |FROM tk t
         |LEFT JOIN base b ON b.doc_id = t.doc_id
         |LEFT JOIN hit h ON h.doc_id = t.doc_id
         |WHERE t.doc_id % 5 = 0
         |ORDER BY t.doc_id""") { (s, dir) =>
      val tk = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
      val g = tk.select(col("doc_id"),
        explode(wordNgramsOf(col("tk"), 5)).as("ngram"))
      val isEval = col("doc_id") % 5 === 0
      // persisted: the eval-side distinct n-gram frame is consumed by
      // the broadcast probe set, the dirty-hit join AND the per-doc
      // denominator — unpersisted, the corpus n-gram explode+distinct
      // ran three times (5 live corpus scans in the baseline plan)
      val ev = g.filter(isEval).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val evSet = ev.select("ngram").distinct()
      // collided set: corpus-width train stream filtered map-side by
      // the broadcast eval n-grams, THEN distinct'd — eval-bounded
      val collided = g.filter(!isEval).join(broadcast(evSet), "ngram")
        .select("ngram").distinct()
      val hit = ev.join(broadcast(collided), "ngram")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dirty"))
      val base = ev.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"))
      tk.filter(isEval).select("doc_id")
        .join(base, Seq("doc_id"), "left")
        .join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dirty"), lit(0L)).as("n_dirty"),
          graft.functions.ParityFunctions.duckRound(
            coalesce(col("n_dirty"), lit(0L)).cast("double") /
              greatest(coalesce(col("n_grams"), lit(0L)), lit(1L))
                .cast("double"), 6).as("dirty_frac"),
          when(coalesce(col("n_dirty"), lit(0L)) > 0, "dirty")
            .otherwise("clean").as("status"))
        .orderBy("doc_id")
    },

    // --- CURRICULUM order construction (pl28's difficulty-aware
    //     sibling): pl28 shuffles uniformly; curriculum recipes order
    //     easy→hard — but a PURE difficulty sort is known-bad (all
    //     epochs start on the same degenerate slice), so the standard
    //     fix is a BLENDED key: 0.5·difficulty-percentile + 0.5·hash
    //     noise, a softened ramp that preserves the trend without the
    //     degeneracy. Per-SHARD, not global: a corpus-wide total order
    //     is a single-reader bottleneck at 100 TB (and a
    //     single-partition window here); each data-loader shard gets
    //     its own ramp, the pl28/OrderStore serving convention.
    //     Difficulty = mean token length (chars/token — the cheap
    //     proxy; any score column slots in). Cross-engine exactness:
    //     percent_rank is (rank−1)/(n−1) of INTEGER ranks over a
    //     tie-free (difficulty, doc_id) order, noise is md5-u32/2³²,
    //     blend is one multiply-add of identical doubles — every
    //     comparison is on bit-identical values. ---
    Q("pl39_curriculum_order",
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> x <> '') AS tk
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    CAST(length(array_to_string(tk, '')) AS BIGINT) AS n_chars,
         |    CAST(len(tk) AS BIGINT) AS n_tok
         |  FROM tk),
         |d AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5('shard' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      % $OrderShards AS shard_id,
         |    CASE WHEN n_tok = 0 THEN 0.0
         |         ELSE CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE)
         |    END AS difficulty,
         |    CAST(CAST(concat('0x', substr(md5('cur' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
         |      / 4294967296.0 AS u
         |  FROM f),
         |r AS (
         |  SELECT shard_id, doc_id, difficulty,
         |    0.5 * percent_rank() OVER (PARTITION BY shard_id
         |                               ORDER BY difficulty, doc_id)
         |      + 0.5 * u AS blend
         |  FROM d)
         |SELECT shard_id,
         |  CAST(row_number() OVER (PARTITION BY shard_id
         |                          ORDER BY blend, doc_id) AS BIGINT) AS pos,
         |  doc_id, round(difficulty, 4) AS difficulty,
         |  round(blend, 6) AS blend
         |FROM r
         |ORDER BY shard_id, pos""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val id = col("doc_id").cast("string")
      val f = docs(s, dir)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          length(concat_ws("", col("tk"))).cast("long").as("n_chars"),
          size(col("tk")).cast("long").as("n_tok"))
      val d = f.select(col("doc_id"),
        pmod(conv(substring(md5(concat(lit("shard"), id)), 1, 8), 16, 10)
          .cast("long"), lit(OrderShards.toLong)).as("shard_id"),
        when(col("n_tok") === 0, lit(0.0))
          .otherwise(col("n_chars").cast("double") /
            col("n_tok").cast("double")).as("difficulty"),
        (conv(substring(md5(concat(lit("cur"), id)), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0).as("u"))
      val wr = Window.partitionBy("shard_id")
        .orderBy(col("difficulty"), col("doc_id"))
      val r = d.select(col("shard_id"), col("doc_id"), col("difficulty"),
        (lit(0.5) * percent_rank().over(wr) + lit(0.5) * col("u"))
          .as("blend"))
      val wp = Window.partitionBy("shard_id")
        .orderBy(col("blend"), col("doc_id"))
      r.select(col("shard_id"),
          row_number().over(wp).cast("long").as("pos"),
          col("doc_id"),
          graft.functions.ParityFunctions.duckRound(col("difficulty"), 4)
            .as("difficulty"),
          graft.functions.ParityFunctions.duckRound(col("blend"), 6)
            .as("blend"))
        .orderBy("shard_id", "pos")
    },

    // --- LINE-level quality REWRITE (the C4/FineWeb line-filter
    //     family — Raffel et al. 2020 §2.2 drop short lines and lines
    //     carrying boilerplate markers, FineWeb additionally collapses
    //     in-doc duplicate lines — applied WITHIN a doc, keeping the
    //     doc: the line-granularity sibling of dd20's chunk-dedup
    //     rewrite). The synthetic corpus has no newlines, so "lines"
    //     use tx45's sentence device (determiner tokens 'the'/'a'
    //     terminate a line, +1 for the tail) and the boilerplate
    //     marker is the rare corpus token 'dup' (the "javascript"/
    //     "lorem ipsum" stand-in, ~29 occurrences); docs with
    //     doc_id % 23 = 5 get a fixed self-terminating line injected
    //     at BOTH ends (the tx26 injection convention) so the
    //     duplicate-line counter is observable on random token
    //     streams. Per line ONE drop reason with mm07's root-cause
    //     precedence: short (<3 tokens) > marker > duplicate-of-
    //     earlier-line; survivors reassemble in order. Scale shape:
    //     one corpus scan → positional explode; the line-id running
    //     sum partitions by doc_id (a partition = ONE doc's tokens,
    //     never corpus-sized), and every downstream stage — line
    //     grouping, the in-doc dup window, the per-doc report — is
    //     clustered by doc_id too, so Spark reuses that single
    //     exchange end-to-end (plan-pinned in PlanSpec: exactly one
    //     shuffle before the output sort). All counters integer,
    //     text exact — zero float parity surface. ---
    Q("pl40_line_quality_rewrite",
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 23 = 5
        |         THEN 'merge scan table the ' || text ||
        |              ' the merge scan table the'
        |         ELSE text END AS text
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t <> '') AS tk
        |  FROM base),
        |tok AS (
        |  SELECT doc_id, unnest(tk) AS token,
        |    unnest(range(1, len(tk) + 1)) AS pos
        |  FROM tk),
        |b AS (
        |  SELECT doc_id, token, pos,
        |    CASE WHEN token IN ('the', 'a') THEN 1 ELSE 0 END AS isb
        |  FROM tok),
        |l AS (
        |  SELECT doc_id, token, pos,
        |    sum(isb) OVER (PARTITION BY doc_id ORDER BY pos
        |                   ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) - isb AS line_id
        |  FROM b),
        |ln AS (
        |  SELECT doc_id, line_id,
        |    string_agg(token, ' ' ORDER BY pos) AS line_text,
        |    count(*) AS n_tok,
        |    max(CASE WHEN token = 'dup' THEN 1 ELSE 0 END) AS has_marker
        |  FROM l GROUP BY doc_id, line_id),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id, line_text
        |                               ORDER BY line_id) AS rn
        |  FROM ln),
        |c AS (
        |  SELECT doc_id, line_id, line_text,
        |    CASE WHEN n_tok < 3 THEN 'short'
        |         WHEN has_marker = 1 THEN 'marker'
        |         WHEN rn > 1 THEN 'dup_line'
        |         ELSE 'keep' END AS reason
        |  FROM r)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN reason = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  CAST(sum(CASE WHEN reason = 'marker' THEN 1 ELSE 0 END) AS BIGINT) AS n_marker,
        |  CAST(sum(CASE WHEN reason = 'dup_line' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_line,
        |  coalesce(string_agg(line_text, ' ' ORDER BY line_id)
        |    FILTER (WHERE reason = 'keep'), '') AS clean_text
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val injected = docs(s, dir).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(23L)) === 5L,
          concat(lit("merge scan table the "), col("text"),
            lit(" the merge scan table the")))
          .otherwise(col("text")).as("text"))
      val tok = injected.select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "token")))
      val isb = when(col("token").isin("the", "a"), 1L).otherwise(0L)
      val wRun = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lined = tok.withColumn("line_id", sum(isb).over(wRun) - isb)
      val lines = lined.groupBy("doc_id", "line_id").agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos").as("p"),
            col("token").as("t")))), x => x.getField("t")), " ")
          .as("line_text"),
        count(lit(1)).as("n_tok"),
        max(when(col("token") === "dup", 1).otherwise(0)).as("has_marker"))
      val wDup = Window.partitionBy("doc_id", "line_text").orderBy("line_id")
      val classed = lines
        .withColumn("rn", row_number().over(wDup))
        .withColumn("reason",
          when(col("n_tok") < 3, "short")
            .when(col("has_marker") === 1, "marker")
            .when(col("rn") > 1, "dup_line")
            .otherwise("keep"))
      classed.groupBy("doc_id").agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("reason") === "keep", 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("reason") === "short", 1L).otherwise(0L)).as("n_short"),
          sum(when(col("reason") === "marker", 1L).otherwise(0L)).as("n_marker"),
          sum(when(col("reason") === "dup_line", 1L).otherwise(0L)).as("n_dup_line"),
          array_join(transform(array_sort(collect_list(
            when(col("reason") === "keep",
              struct(col("line_id").as("l"), col("line_text").as("t"))))),
            x => x.getField("t")), " ").as("clean_text"))
        .orderBy("doc_id")
    },

    // --- DATA-CONSTRAINED epoch allocation (pl41 — Muennighoff et al.
    //     2023, "Scaling Data-Constrained Language Models": when the
    //     token budget EXCEEDS the unique corpus, repeat data — with
    //     diminishing returns past ~4 epochs — so each source carries a
    //     REPEAT CAP by quality class and the budget water-fills:
    //     every source gets budget proportional to size until its cap
    //     binds, and the surplus redistributes across the uncapped.
    //     pl38 splits a budget ≤ corpus; this is the other regime.
    //     Caps by source class (the deterministic device: numeric
    //     source suffix % 3 → 4 / 2 / 1 epochs — books-and-code class
    //     repeats, raw web doesn't), budget B = 2× the unique token
    //     mass, so the waterfill genuinely binds: cap-1 AND cap-2
    //     classes saturate and cap-4 sources land at 3 epochs.
    //     EXACT INTEGERS end to end: the waterfill level λ =
    //     (B−S)/U is never materialized as a float — each candidate
    //     saturation cutoff c is validated by cross-multiplication
    //     (c·U ≤ B−S < nextcap·U), and the unsaturated shares are
    //     pl38's Hamilton largest-remainder over the remaining budget,
    //     so Σ alloc == min(B, total supply) exactly and no engine can
    //     flip an allocation on a float ULP. Cost: one corpus scan
    //     collapsing to source-cardinality frames; the cutoff lattice
    //     is |distinct caps|+1 rows; every window is over ≤|sources|
    //     rows. ---
    Q("pl41_epoch_waterfill",
      s"""WITH t AS (
         |  SELECT source, CAST(len($DuckToks) AS BIGINT) AS n
         |  FROM documents),
         |src AS (
         |  SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
         |    CAST(CASE CAST(substr(source, 4) AS INT) % 3
         |         WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END AS BIGINT) AS cap
         |  FROM t GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
         |               CAST(2 * sum(n_tokens) AS BIGINT) AS b FROM src),
         |bycap AS (SELECT cap, CAST(sum(n_tokens) AS BIGINT) AS n_c
         |          FROM src GROUP BY cap),
         |lat AS (
         |  SELECT cap AS c,
         |    sum(cap * n_c) OVER (ORDER BY cap) AS s,
         |    (SELECT total FROM tot) - sum(n_c) OVER (ORDER BY cap) AS u,
         |    lead(cap) OVER (ORDER BY cap) AS nextcap
         |  FROM bycap
         |  UNION ALL
         |  SELECT 0, 0, (SELECT total FROM tot),
         |    (SELECT min(cap) FROM bycap)),
         |chosen AS (
         |  SELECT c, s, u FROM (
         |    SELECT lat.*, row_number() OVER (ORDER BY c) AS rn
         |    FROM lat CROSS JOIN tot
         |    WHERE c * u <= b - s
         |      AND (nextcap IS NULL OR b - s < nextcap * u))
         |  WHERE rn = 1),
         |unsat AS (
         |  SELECT source, n_tokens,
         |    CAST(((b - s) * n_tokens) // u AS BIGINT) AS fl,
         |    CAST(((b - s) * n_tokens) % u AS BIGINT) AS rem
         |  FROM src CROSS JOIN chosen CROSS JOIN tot
         |  WHERE cap > c),
         |k AS (SELECT CAST(b - s - sum(fl) AS BIGINT) AS k
         |      FROM unsat CROSS JOIN chosen CROSS JOIN tot
         |      GROUP BY b, s),
         |urk AS (
         |  SELECT source, fl,
         |    row_number() OVER (ORDER BY rem DESC, source) AS rn
         |  FROM unsat),
         |alloc AS (
         |  SELECT src.source, src.n_tokens, src.cap,
         |    CASE WHEN src.cap <= chosen.c THEN TRUE ELSE FALSE END
         |      AS saturated,
         |    CASE WHEN src.cap <= chosen.c THEN src.cap * src.n_tokens
         |         ELSE urk.fl +
         |           CASE WHEN urk.rn <= (SELECT k FROM k) THEN 1 ELSE 0 END
         |    END AS alloc
         |  FROM src CROSS JOIN chosen
         |  LEFT JOIN urk ON urk.source = src.source)
         |SELECT source, n_tokens, cap, saturated,
         |  CAST(alloc AS BIGINT) AS alloc,
         |  CAST((1000 * alloc) // n_tokens AS BIGINT) AS milli_epochs
         |FROM alloc
         |ORDER BY source""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = docs(s, dir).select(col("source"),
        size(tokens(col("text"))).cast("long").as("n"))
      // persisted: src is the ONE corpus pass this operator claims —
      // it fans out to tot/bycap/unsat/alloc, and unpersisted each
      // consumer replans the whole tokenize+aggregate chain (the
      // round-18 baseline plan carried 26 live corpus scans and 73
      // exchanges for what is otherwise source-cardinality algebra)
      val src = t.groupBy("source").agg(sum("n").as("n_tokens"))
        .withColumn("cap",
          expr("CAST(CASE CAST(substring(source, 4) AS INT) % 3 " +
            "WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END AS BIGINT)"))
        .localCheckpoint(true)
      val tot = src.agg(sum("n_tokens").as("total"),
        (lit(2L) * sum("n_tokens")).as("b"))
      val bycap = src.groupBy("cap").agg(sum("n_tokens").as("n_c"))
      val wCap = Window.orderBy("cap")
      val latRows = bycap
        .crossJoin(broadcast(tot.select("total")))
        .select(col("cap").as("c"),
          sum(col("cap") * col("n_c")).over(wCap).as("s"),
          (col("total") - sum(col("n_c")).over(wCap)).as("u"),
          lead(col("cap"), 1).over(wCap).as("nextcap"))
      val zeroRow = bycap.agg(min("cap").as("nextcap"))
        .crossJoin(broadcast(tot.select("total")))
        .select(lit(0L).as("c"), lit(0L).as("s"),
          col("total").as("u"), col("nextcap"))
      val lat = latRows.unionByName(zeroRow)
      val chosen = lat.crossJoin(broadcast(tot.select("b")))
        .filter(col("c") * col("u") <= col("b") - col("s") &&
          (col("nextcap").isNull ||
            col("b") - col("s") < col("nextcap") * col("u")))
        .orderBy("c").limit(1)
        .select("c", "s", "u")
      val unsat = src.crossJoin(broadcast(chosen))
        .crossJoin(broadcast(tot.select("b")))
        .filter(col("cap") > col("c"))
        .select(col("source"), col("n_tokens"),
          expr("((b - s) * n_tokens) div u").as("fl"),
          (((col("b") - col("s")) * col("n_tokens")) % col("u")).as("rem"))
      val k = unsat.crossJoin(broadcast(chosen.select("s")))
        .crossJoin(broadcast(tot.select("b")))
        .groupBy("b", "s").agg((col("b") - col("s") - sum("fl")).as("k"))
        .select("k")
      val wRem = Window.orderBy(col("rem").desc, col("source"))
      val urk = unsat.withColumn("rn", row_number().over(wRem))
        .crossJoin(broadcast(k))
        .select(col("source"),
          (col("fl") + when(col("rn") <= col("k"), 1L).otherwise(0L))
            .as("ualloc"))
      src.crossJoin(broadcast(chosen.select("c")))
        .join(urk, Seq("source"), "left")
        .select(col("source"), col("n_tokens"), col("cap"),
          (col("cap") <= col("c")).as("saturated"),
          when(col("cap") <= col("c"), col("cap") * col("n_tokens"))
            .otherwise(col("ualloc")).as("alloc"))
        .withColumn("milli_epochs",
          expr("(1000 * alloc) div n_tokens").cast("long"))
        .orderBy("source")
    },

    // --- K-ANONYMITY audit with a generalization ladder (pl42 — the
    //     privacy-audit sibling of pl08/pl26's redaction: redaction
    //     hides DIRECT identifiers, this measures whether the
    //     QUASI-identifiers that remain — here (event_type, day) —
    //     still single people out): a QI group with fewer than k=5
    //     distinct users is a re-identification risk (Sweeney's k;
    //     every release checklist runs this), and the standard fix is
    //     GENERALIZATION — coarsen the offending attribute one rung
    //     (day → ISO week) and re-test, trading utility for the floor.
    //     Output per day-level group: its own distinct-user count, the
    //     risk flag, the count its WEEK-level generalization reaches,
    //     and whether the rung cleared it. Scale shape: two partial-agg
    //     rollups of the event log (day level, week level — each one
    //     shuffle of group-cardinality rows) joined on the
    //     (type, week)-cardinality frame; no per-user state anywhere.
    //     The distinct-user counts are exact here (they carry the
    //     oracle hash); at 100 TB the day/week frames come from the
    //     same rollup the SketchStore (q62) serves approximately. ---
    Q("pl42_k_anonymity",
      """WITH e AS (
        |  SELECT event_type, user_id,
        |    date_trunc('day', ts) AS day,
        |    date_trunc('week', ts) AS week
        |  FROM events),
        |d AS (
        |  SELECT event_type, day, min(week) AS week,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM e GROUP BY event_type, day),
        |w AS (
        |  SELECT event_type, week,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_week
        |  FROM e GROUP BY event_type, week)
        |SELECT d.event_type, d.day, d.n_users,
        |  d.n_users < 5 AS at_risk,
        |  w.n_users_week,
        |  (d.n_users < 5 AND w.n_users_week >= 5) AS generalization_clears
        |FROM d JOIN w ON d.event_type = w.event_type AND d.week = w.week
        |ORDER BY d.event_type, d.day""") { (s, dir) =>
      val k = lit(5L)
      // day stays a TIMESTAMP on both sides (the q17 convention — a
      // DATE round-trips as a different pandas dtype than DuckDB's)
      val e = tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          date_trunc("DAY", col("ts")).as("day"),
          date_trunc("WEEK", col("ts")).as("week"))
      val d = e.groupBy("event_type", "day")
        .agg(min("week").as("week"),
          count_distinct(col("user_id")).as("n_users"))
      val w = e.groupBy("event_type", "week")
        .agg(count_distinct(col("user_id")).as("n_users_week"))
      d.join(w, Seq("event_type", "week"))
        .select(col("event_type"), col("day"), col("n_users"),
          (col("n_users") < k).as("at_risk"), col("n_users_week"),
          (col("n_users") < k && col("n_users_week") >= k)
            .as("generalization_clears"))
        .orderBy("event_type", "day")
    },

    // --- Deterministic PSEUDONYMIZATION rewrite (pl43 — the third
    //     privacy op: pl08/pl26 redact free text, pl42 audits
    //     quasi-identifiers, this replaces the DIRECT identifier
    //     column itself with a salted one-way token, the
    //     share-the-logs-without-the-ids rewrite): pseudo =
    //     md5(salt || user_id) — deterministic, so the SAME user maps
    //     to the SAME token across tables/batches/engines and every
    //     join or per-user aggregate still works on the pseudonymized
    //     release; one-way under a secret salt (rotate the salt to
    //     break linkage, the versioned-artifact convention). The
    //     referential-integrity contract is attested IN-BAND on every
    //     row (the q23 device): distinct users == distinct pseudonyms
    //     (collision-free on this corpus) — a collision would silently
    //     MERGE two users' histories in the release. Scale shape: the
    //     rewrite is a pure map-side projection (zero shuffles); the
    //     attestation is two countDistincts broadcast back as a 1-row
    //     frame (the pl15 scalar-broadcast class). ---
    Q("pl43_pseudonymize",
      """WITH p AS (
        |  SELECT event_id, event_type,
        |    md5('graft-pseudo-v1:' || CAST(user_id AS VARCHAR))
        |      AS pseudo_user
        |  FROM events),
        |ri AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(DISTINCT
        |      md5('graft-pseudo-v1:' || CAST(user_id AS VARCHAR)))
        |      AS BIGINT) AS n_pseudos
        |  FROM events)
        |SELECT event_id, event_type, pseudo_user,
        |  n_users, n_pseudos, n_users = n_pseudos AS ri_ok
        |FROM p CROSS JOIN ri
        |ORDER BY event_id""") { (s, dir) =>
      val e = tables.load(s, dir, "events")
      val pseudo = md5(concat(lit("graft-pseudo-v1:"),
        col("user_id").cast("string")).cast("binary"))
      val ri = e.agg(
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(md5(concat(lit("graft-pseudo-v1:"),
          col("user_id").cast("string")).cast("binary"))).as("n_pseudos"))
      e.select(col("event_id"), col("event_type"),
          pseudo.as("pseudo_user"))
        .crossJoin(broadcast(ri))
        .select(col("event_id"), col("event_type"), col("pseudo_user"),
          col("n_users"), col("n_pseudos"),
          (col("n_users") === col("n_pseudos")).as("ri_ok"))
        .orderBy("event_id")
    },

    // --- Corpus RELEASE DIFF (pl44 — the changelog between two corpus
    //     snapshots every dataset release publishes next to pl34's
    //     datasheet: per source, how many docs were added / removed /
    //     changed / unchanged since the last release — the number
    //     consumers read to decide whether to retrain and auditors
    //     read to see churn): snapshot B is synthesized from the
    //     corpus by deterministic md5 coins (pl03's device — ~5%
    //     removed, ~10% text-revised, ~3% appended under fresh ids) so
    //     both engines diff the identical pair; the diff itself is ONE
    //     doc_id hash join of the two snapshots (full outer — each
    //     side's orphans ARE the adds/removes) with a map-side content
    //     compare, collapsing to a (sources × 4) frame. At 100 TB the
    //     compare runs on stored content DIGESTS (the dd01 column),
    //     not text — the join shape is unchanged. ---
    Q("pl44_release_diff",
      """WITH a AS (SELECT doc_id, source, text FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |    CASE WHEN CAST(concat('0x', substr(md5('chg' ||
        |           CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 10
        |         THEN text || ' [rev2]' ELSE text END AS text
        |  FROM documents
        |  WHERE CAST(concat('0x', substr(md5('rm' ||
        |          CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 >= 5
        |  UNION ALL
        |  SELECT doc_id + 1000000000, source, text || ' [new]'
        |  FROM documents
        |  WHERE CAST(concat('0x', substr(md5('add' ||
        |          CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 3),
        |d AS (
        |  SELECT coalesce(a.source, b.source) AS source,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.text <> b.text THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT source, status, CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY source, status
        |ORDER BY source, status""") { (s, dir) =>
      def coin(salt: String) =
        conv(substring(md5(concat(lit(salt),
          col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long") % 100
      val a = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
      val kept = a.filter(coin("rm") >= 5)
        .select(col("doc_id"), col("source"),
          when(coin("chg") < 10, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
      val added = a.filter(coin("add") < 3)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("source"),
          concat(col("text"), lit(" [new]")).as("text"))
      val b = kept.unionAll(added)
        .select(col("doc_id").as("b_id"), col("source").as("b_source"),
          col("text").as("b_text"))
      a.join(b, col("doc_id") === col("b_id"), "full_outer")
        .select(coalesce(col("source"), col("b_source")).as("source"),
          when(col("doc_id").isNull, lit("added"))
            .when(col("b_id").isNull, lit("removed"))
            .when(col("text") =!= col("b_text"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .groupBy("source", "status")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    },

    // --- ERASURE ATTESTATION (pl45 — the round-15 verdict's
    //     version-pinned audit, pl22's data-audit shape over the
    //     right-to-erasure surfaces): given the erasure LEDGER and the
    //     release's pinned read surfaces, attest IN-BAND — counts,
    //     never victim rows — that zero victim ids are reachable
    //     through any of them. One report row per surface: the ingest
    //     gate (re-crawled victims must not re-enter), the release
    //     corpus (the purged snapshot a publish pins), the frozen
    //     training order (built through the REAL pl28 construction on
    //     the purged corpus — the frame OrderStore freezes and
    //     ReleaseManifest serves), the request ledger itself (the
    //     suppression list carries exactly the victim ids BY DESIGN —
    //     stated in-band, not hidden), and an unpurged control row
    //     proving the probes have power (victims ARE found where they
    //     should be). The ledger is synthesized by a deterministic md5
    //     coin (~2% of docs — pl44's snapshot device) so both engines
    //     audit the identical request set. Scale shape: the ledger is
    //     request-sized and BROADCASTS; every surface costs one linear
    //     pass with a broadcast left join — the n_victims sum and the
    //     n_served count ride the same aggregation, so the whole
    //     attestation is one scan per surface, counts only. ---
    Q("pl45_erasure_attest",
      """WITH led AS (
        |  SELECT doc_id FROM documents
        |  WHERE CAST(concat('0x', substr(md5('ers' ||
        |          CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 < 2),
        |purged AS (
        |  SELECT d.doc_id FROM documents d
        |  WHERE NOT EXISTS (SELECT 1 FROM led l WHERE l.doc_id = d.doc_id)),
        |report AS (
        |  SELECT 'ingest_gate' AS surface,
        |    (SELECT count(*) FROM purged) AS n_served,
        |    (SELECT count(*) FROM purged p JOIN led l
        |     ON p.doc_id = l.doc_id) AS n_victims_reachable
        |  UNION ALL
        |  SELECT 'release_corpus', (SELECT count(*) FROM purged),
        |    (SELECT count(*) FROM purged p JOIN led l ON p.doc_id = l.doc_id)
        |  UNION ALL
        |  SELECT 'release_order', (SELECT count(*) FROM purged),
        |    (SELECT count(*) FROM purged p JOIN led l ON p.doc_id = l.doc_id)
        |  UNION ALL
        |  SELECT 'request_ledger', (SELECT count(*) FROM led),
        |    (SELECT count(*) FROM led)
        |  UNION ALL
        |  SELECT 'unpurged_control', (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents d JOIN led l
        |     ON d.doc_id = l.doc_id))
        |SELECT surface, CAST(n_served AS BIGINT) AS n_served,
        |  CAST(n_victims_reachable AS BIGINT) AS n_victims_reachable
        |FROM report ORDER BY surface""") { (s, dir) =>
      val d = docs(s, dir).select("doc_id")
      // persisted: the request-sized ledger is consumed by every
      // surface (two anti-joins, five broadcast left joins and its own
      // report row) — unpersisted, each consumer replans the corpus
      // filter that synthesizes it, turning "one scan per surface"
      // into 13 live scans (round-18 baseline plan)
      val led = d.filter(conv(substring(md5(concat(lit("ers"),
        col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("long") % 100 < 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // each surface built through its REAL construction: the gate is
      // Erasure.gateBatch's broadcast anti-join; the order is pl28's
      // trainingOrderOf over the purged corpus (the frame OrderStore
      // freezes); the oracle mirrors the same counts
      val purged = d.join(broadcast(led), Seq("doc_id"), "left_anti")
      val gated = d.join(broadcast(led), Seq("doc_id"), "left_anti")
      val order = trainingOrderOf(purged).select("doc_id")
      val lv = led.withColumn("is_v", lit(1L))
      def surfaceRow(name: String, frame: DataFrame) =
        frame.join(broadcast(lv), Seq("doc_id"), "left")
          .agg(count(lit(1)).as("n_served"),
            coalesce(sum("is_v"), lit(0L)).as("n_victims_reachable"))
          .select(lit(name).as("surface"), col("n_served"),
            col("n_victims_reachable"))
      surfaceRow("ingest_gate", gated)
        .unionByName(surfaceRow("release_corpus", purged))
        .unionByName(surfaceRow("release_order", order))
        .unionByName(surfaceRow("request_ledger", led))
        .unionByName(surfaceRow("unpurged_control", d))
        .orderBy("surface")
    },

    // --- Per-doc curation FATE report (pl46 — the LINEAGE answer to
    //     "why is my document not in the release": pl10/pl16 report
    //     stage COUNTS, pl13 emits only the survivors; this attributes
    //     every corpus doc to exactly one fate — kept, or the FIRST
    //     rule that dropped it under mm07's root-cause precedence
    //     (short_chars > short_tokens > low_diversity > bad_lang >
    //     contaminated > exact_dup), with the surviving twin's id
    //     (`dup_of`) on exact-dup rows so an auditor can jump straight
    //     to the copy that was kept. Same rules and composition ORDER
    //     as pl13's shard prep (gate first, keep-first dedup among
    //     gate survivors only), so this report IS pl13's changelog.
    //     Scale shape: all gate flags are map-side projections over
    //     ONE token-array projection; the only shuffle is the dedup
    //     digest window (partitions = exact-dup clusters, bounded by
    //     copy count, never corpus-sized — the pl13/dd17 argument);
    //     the union is plan-level, no second scan. ---
    Q("pl46_doc_fate", {
      val toks =
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
      val contaminated = Benchmark5Grams
        .map(p => s"contains(text, ${sqlLit(p)})").mkString("(", " OR ", ")")
      s"""WITH f AS (
         |  SELECT doc_id, source, text, n_chars, lang, $toks AS tk
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, text,
         |    CASE WHEN n_chars < 60 THEN 'short_chars'
         |         WHEN len(tk) < 12 THEN 'short_tokens'
         |         WHEN CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) < 0.3
         |           THEN 'low_diversity'
         |         WHEN lang NOT IN ('en', 'es', 'de') THEN 'bad_lang'
         |         WHEN $contaminated THEN 'contaminated' END AS gate_fate
         |  FROM f),
         |k AS (
         |  SELECT doc_id, source,
         |    CAST(min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT)
         |      AS keeper
         |  FROM r WHERE gate_fate IS NULL)
         |SELECT doc_id, source, fate, dup_of FROM (
         |  SELECT doc_id, source, gate_fate AS fate,
         |    CAST(NULL AS BIGINT) AS dup_of
         |  FROM r WHERE gate_fate IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id, source,
         |    CASE WHEN doc_id = keeper THEN 'kept' ELSE 'exact_dup' END,
         |    CASE WHEN doc_id = keeper THEN NULL ELSE keeper END
         |  FROM k)
         |ORDER BY doc_id"""
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val contaminated = Benchmark5Grams
        .map(p => col("text").contains(p)).reduce(_ || _)
      val flagged = docs(s, dir)
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
          col("lang"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("source"), col("text"),
          when(col("n_chars") < 60, "short_chars")
            .when(size(col("tk")) < 12, "short_tokens")
            .when(size(array_distinct(col("tk"))).cast("double") /
              size(col("tk")) < 0.3, "low_diversity")
            .when(!col("lang").isin("en", "es", "de"), "bad_lang")
            .when(contaminated, "contaminated").as("gate_fate"))
      val gated = flagged.filter(col("gate_fate").isNotNull)
        .select(col("doc_id"), col("source"),
          col("gate_fate").as("fate"),
          lit(null).cast("long").as("dup_of"))
      val keepW = Window.partitionBy(md5(col("text").cast("binary")))
      val surv = flagged.filter(col("gate_fate").isNull)
        .withColumn("keeper", min(col("doc_id")).over(keepW))
        .select(col("doc_id"), col("source"),
          when(col("doc_id") === col("keeper"), "kept")
            .otherwise("exact_dup").as("fate"),
          when(col("doc_id") =!= col("keeper"), col("keeper"))
            .as("dup_of"))
      gated.unionByName(surv).orderBy("doc_id")
    },

    // --- FUNNEL-wide fate report (pl47 — closes pl46's gap: pl46
    //     attributes only pl13's shard-prep drops; docs dropped by the
    //     pl16 curation funnel's other stages got no fate row, so an
    //     auditor couldn't trace a URL-dup, a decontaminated near-dup,
    //     or a rebalanced-out doc). One row per corpus doc, fate = the
    //     FIRST stage that dropped it under pl16's composition order —
    //     url_dup (dd10 canonical-URL keeper; twin_id = the kept copy)
    //     > eval_slice (the benchmark docs themselves, excluded from
    //     training) > fuzzy_eval_neardup (pl14 bipartite MinHash
    //     j ≥ 0.4; twin_id = the smallest eval doc it matched) >
    //     semantic_eval_neardup (pl25's embedding rung, inserted where
    //     it naturally composes — after the n-gram rung, before
    //     sampling; twin_id = the smallest eval vec it neighbors; a
    //     doc with no embedding row cannot be semantically flagged —
    //     pl25's own universe) > rebalanced_out (pl15's deterministic
    //     coin, rates computed on THIS funnel's post-decontamination
    //     survivors) > kept. Each rung reuses its operator's ONE
    //     construction (canonicalUrl / bipartitePairs /
    //     semanticEvalPairsOf / temperatureRates) so the report can
    //     never drift from the funnel it explains; the first three
    //     fate classes partition pl16's stage deltas exactly
    //     (spec-pinned). Scale shape: every rung is its operator's
    //     scale path; the fate union is plan-level over narrow
    //     (doc_id, lang) frames — text touches only the rungs that
    //     already read it. ---
    Q("pl47_funnel_fate", {
      val ctes = graft.queries.Dedup.bipartiteScoredCtes(
        id => s"$id % 5 <> 0", id => s"$id % 5 = 0")
      s"""WITH $ctes,
         |${graft.queries.Similarity.semanticEvalPairCtes},
         |u AS (
         |  SELECT doc_id, lang, ${graft.queries.Dedup.DuckMessyUrl} AS url
         |  FROM documents),
         |canon AS (
         |  SELECT doc_id, lang,
         |    ${graft.queries.Dedup.duckCanonicalUrl("url")} AS cu
         |  FROM u),
         |kp AS (
         |  SELECT doc_id, lang,
         |    CAST(min(doc_id) OVER (PARTITION BY cu) AS BIGINT) AS keeper
         |  FROM canon),
         |s1 AS (SELECT doc_id, lang FROM kp WHERE doc_id = keeper),
         |fz AS (
         |  SELECT doc_id, CAST(min(probe_doc_id) AS BIGINT) AS ftwin
         |  FROM xscored WHERE j >= 0.4 GROUP BY doc_id),
         |sem AS (
         |  SELECT vec_id AS doc_id,
         |    CAST(min(eval_vec_id) AS BIGINT) AS stwin
         |  FROM sempairs GROUP BY vec_id),
         |s2 AS (SELECT doc_id, lang FROM s1
         |       WHERE doc_id % 5 <> 0
         |         AND doc_id NOT IN (SELECT doc_id FROM fz)),
         |s3 AS (SELECT doc_id, lang FROM s2
         |       WHERE doc_id NOT IN (SELECT doc_id FROM sem)),
         |${duckTemperatureCtes("s3", "c3", "r")},
         |fates AS (
         |  SELECT doc_id, 'url_dup' AS fate, keeper AS twin_id
         |  FROM kp WHERE doc_id <> keeper
         |  UNION ALL
         |  SELECT doc_id, 'eval_slice', CAST(NULL AS BIGINT)
         |  FROM s1 WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT s1.doc_id, 'fuzzy_eval_neardup', fz.ftwin
         |  FROM s1 JOIN fz ON s1.doc_id = fz.doc_id
         |  WHERE s1.doc_id % 5 <> 0
         |  UNION ALL
         |  SELECT s2.doc_id, 'semantic_eval_neardup', sem.stwin
         |  FROM s2 JOIN sem ON s2.doc_id = sem.doc_id
         |  UNION ALL
         |  SELECT s3.doc_id,
         |    CASE WHEN ${duckCoin("s3.doc_id")}
         |              < r.keep_prob * 4294967296.0
         |         THEN 'kept' ELSE 'rebalanced_out' END,
         |    CAST(NULL AS BIGINT)
         |  FROM s3 JOIN r ON s3.lang = r.lang)
         |SELECT doc_id, fate, twin_id FROM fates ORDER BY doc_id"""
    }) { (s, dir) =>
      // ONE wide frame + a when-chain, not a 5-branch union (round-18
      // optimization): the union form planned each rung's subtree
      // once per consumer (the fate join AND the next rung's
      // anti-join see different aggregates of the same rung, so
      // exchange reuse never fires — the baseline plan carried TWO
      // full copies of the MinHash band join, 72 Exchange nodes, and
      // ~50 AQE stages whose submission gaps dominated the 5.8 s
      // steady time). Here every rung lands once as a LEFT join onto
      // the keeper frame and the fate is the first-match when-chain —
      // same first-drop-wins order (url_dup > eval_slice > fuzzy >
      // semantic > sampling), so the result is row-identical: a
      // non-keeper never reaches the later whens, a fuzzy-matched
      // keeper never reaches the semantic when, and the s3 sampling
      // universe is exactly the all-nulls fall-through. Rates are
      // still computed on THIS funnel's post-decontamination
      // survivors (the s3 filter over the same cached frame); the
      // rate join is LEFT only to keep non-s3 rows — every s3 row's
      // lang is in the rate table by construction, so no row gains or
      // loses a match vs the old inner join.
      import org.apache.spark.storage.StorageLevel
      import graft.queries.Dedup
      val base = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          Dedup.canonicalUrl(Dedup.messyUrl(col("doc_id"))).as("cu"))
      val withK = base
        .withColumn("keeper", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cu")))
        .select("doc_id", "lang", "keeper")
      val fz = fuzzyEvalPairsOf(s, dir)
        .groupBy("doc_id").agg(min(col("probe_doc_id")).as("ftwin"))
      val sem = graft.queries.Similarity.semanticEvalPairsOf(s, dir)
        .groupBy(col("vec_id").as("doc_id"))
        .agg(min(col("eval_vec_id")).as("stwin"))
      // persisted: consumed twice (the s3 rate aggregation and the
      // final fate projection) — without it the whole rung chain
      // would run once per consumer
      val wide = withK
        .join(fz, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val isKeeper = col("doc_id") === col("keeper")
      val isEval = col("doc_id") % 5 === 0
      val s3 = wide.filter(isKeeper && !isEval &&
        col("ftwin").isNull && col("stwin").isNull)
      val keepCond =
        coinOf(col("doc_id")) < col("keep_prob") * 4294967296.0
      val nullTwin = lit(null).cast("long")
      wide.join(broadcast(temperatureRates(s3)), Seq("lang"), "left")
        .select(col("doc_id"),
          when(!isKeeper, "url_dup")
            .when(isEval, "eval_slice")
            .when(col("ftwin").isNotNull, "fuzzy_eval_neardup")
            .when(col("stwin").isNotNull, "semantic_eval_neardup")
            .when(keepCond, "kept")
            .otherwise("rebalanced_out").as("fate"),
          when(!isKeeper, col("keeper"))
            .when(isEval, nullTwin)
            .when(col("ftwin").isNotNull, col("ftwin"))
            .when(col("stwin").isNotNull, col("stwin"))
            .otherwise(nullTwin).as("twin_id"))
        .orderBy("doc_id")
    }
  )

  /** pl31's manifest frame — per shard (n_docs, sum_chars, checksum),
    * unsorted — the ONE construction shared by the manifest query and
    * `index.OrderStore` (whose stored snapshot must equal a fresh
    * recomputation bit for bit, or `verify` flags the shard). */
  private[graft] def orderManifestOf(d: DataFrame): DataFrame = {
    val ord = trainingOrderOf(d)
    val dd = d.select(col("doc_id"), col("n_chars"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
    val p = lit(ChecksumP)
    ord.join(dd, Seq("doc_id"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        pmod(sum((pmod(col("h"), p) * pmod(col("pos"), p) % p)
          .cast("decimal(38,0)")), p.cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  /** pl33's packed-order frame — per doc (shard_id, pos, doc_id,
    * n_tok, seq_id, seq_offset), unsorted — shared by the packing
    * query and `index.OrderStore`, so the frozen artifact always holds
    * exactly the sequence map pl33 computes. */
  private[graft] def packedOrderOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = trainingOrderOf(d)
    val t = d.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tok"))
    val w = Window.partitionBy("shard_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    ord.join(t, Seq("doc_id"))
      .withColumn("cum", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("shard_id"), col("pos"), col("doc_id"), col("n_tok"),
        (col("cum") - pmod(col("cum"), lit(SeqTokens)))
          .divide(lit(SeqTokens)).cast("long").as("seq_id"),
        pmod(col("cum"), lit(SeqTokens)).as("seq_offset"))
  }

  /** pl28's order frame — (shard_id, pos, doc_id), positions dense per
    * shard — the ONE construction shared by the order query and the
    * pl31 manifest, so the manifest always checksums exactly the order
    * pl28 materializes. */
  private[graft] def trainingOrderOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col("doc_id").cast("string")
    val sh = d.select(col("doc_id"),
      pmod(conv(substring(md5(concat(lit("shard"), id)), 1, 8), 16, 10)
        .cast("long"), lit(OrderShards.toLong)).as("shard_id"),
      md5(concat(lit("ord"), id)).as("ok"))
    val w = Window.partitionBy("shard_id").orderBy(col("ok"), col("doc_id"))
    sh.select(col("shard_id"),
      row_number().over(w).cast("long").as("pos"), col("doc_id"))
  }

  /** pl29's shingle frame: one row per (doc_id, DISTINCT 5-gram md5
    * digest) — the ONE construction shared by the batch novelty query
    * and the streaming `NoveltyMonitor`, so the stream's per-batch
    * novel counts stay batch-equal by construction (an edit to the
    * shingle width or the digest moves both). */
  private[graft] def ngramDigestsOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(wordNgramsOf(tokens(col("text")), 5)).as("ng"))
      .select(col("doc_id"), md5(col("ng").cast("binary")).as("d"))
      .distinct()

  // --- pl27's DSIR primitives, the ONE source shared by the query,
  //     the `ImportanceStore` artifact and the streaming scorer — an
  //     edit to the smoothing or the ratio formula moves all three. ---

  /** The trusted-domain sources DSIR upsamples toward (the stand-in
    * for "wiki-quality" domains in the synthetic corpus). */
  private[graft] val DsirTargetSources = Seq("src0", "src1")

  /** pl27's token stream: one row per (doc, token occurrence), source
    * carried for the target-domain split. */
  private[graft] def dsirTokens(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("source"),
      explode(tokens(col("text"))).as("w"))

  /** The vocab-sized DSIR log2 likelihood-ratio table (w, lr) over a
    * [[dsirTokens]] stream: add-1-smoothed target vs corpus unigram
    * LMs on the corpus vocabulary. Collapses the corpus to vocab-sized
    * frames — the broadcast-safety argument is language saturation
    * (the tx34/tx40 device); web-scale deployments bound it further
    * with the pl23 feature-hashing trick. */
  private[graft] def dsirLogRatios(t: DataFrame): DataFrame = {
    val isTarget = col("source").isin(DsirTargetSources: _*)
    val corp = t.groupBy("w").agg(count(lit(1)).as("cc"))
    val tgt = t.filter(isTarget).groupBy("w").agg(count(lit(1)).as("ct"))
    val tot = t.agg(
      sum(when(isTarget, lit(1L)).otherwise(lit(0L))).as("nt"),
      count(lit(1)).as("nc"),
      countDistinct(col("w")).as("v"))
    corp.join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("w"),
        (log2((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("nt") + col("v")).cast("double"))
          - log2((col("cc") + 1).cast("double") /
              (col("nc") + col("v")).cast("double"))).as("lr"))
  }

  /** Per-doc DSIR score under a ratio table: (doc_id, n_toks, s) with
    * s = mean lr over the doc's LM-known tokens — one broadcast join +
    * one doc-keyed aggregation, the corpus side never self-joined. */
  private[graft] def dsirScored(t: DataFrame, lm: DataFrame): DataFrame =
    t.join(broadcast(lm), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), avg(col("lr")).as("s"))
}
