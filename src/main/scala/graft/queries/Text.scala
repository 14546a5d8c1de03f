package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables
import graft.functions.ParityFunctions.duckRound
import graft.functions.TextFunctions._

/** Text-pipeline queries over the `documents` table: the reference's
  * tokenize→filter→count→invert pipeline (SURVEY.md §2.1 P1-O3)
  * re-targeted at the testdata corpus, plus the north-star text-analysis
  * operators (language ID, quality scoring, token stats, fingerprints).
  *
  * DuckDB oracle mapping: `tokens()` ≡
  * `list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')`.
  */
object Text {

  private def docs(s: SparkSession, dir: String): DataFrame =
    tables.load(s, dir, "documents")

  /** Exploded (doc_id, token) stream — the engine's `explode(split)`
    * mirror of the reference mapper (InvertedIndexer.java:111-113). */
  private def tokenStream(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), explode(tokens(col("text"))).as("token"))

  /** (doc_id, token, cnt) term frequencies — reference A1/A2. Also the
    * schema of the saved index artifact (graft.index.IndexStore). */
  private[graft] def termDoc(s: SparkSession, dir: String): DataFrame =
    tokenStream(s, dir).groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))

  private val DuckToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  /** Tiny demo stop list for the documents corpus (the reference's 318-word
    * list targets Shakespeare; the corpus here is synthetic). */
  val Stop: Seq[String] = Seq("the", "a", "and", "of", "to")
  private val StopSqlList = Stop.map(w => s"'$w'").mkString("(", ", ", ")")

  /** tx37 merge vocabulary — the ONE source for the Spark fold, the
    * DuckDB recursive-CTE oracle and `SubwordSegmentSpec`'s reference
    * walk (the walk stays independent; the vocab is the contract).
    * MUST be declared before `qs` (the oracle SQL interpolates at
    * object init — the PackBudget caveat). */
  private[graft] val SubwordV3: Seq[String] = Seq("ing", "ble", "art")
  private[graft] val SubwordV2: Seq[String] = Seq("er", "me", "ge", "jo",
    "in", "ta", "so", "rt", "ha", "sh", "va", "lu", "bi", "pa", "sl",
    "ow", "qu", "ck", "th", "he")
  private val SubV3Sql = SubwordV3.map(u => s"'$u'").mkString(", ")
  private val SubV2Sql = SubwordV2.map(u => s"'$u'").mkString(", ")

  /** Fixed demo search inputs (tx16-tx19). */
  private val Phrase = "key agg"
  private val RankTerms = Seq("table", "window", "stream")

  /** Positional `(doc_id, pos, token)` stream — the phrase-search input
    * and the source of the positional index artifact. */
  private[graft] def positionalStream(s: SparkSession, dir: String): DataFrame =
    positionalStreamOf(docs(s, dir))

  private[graft] def positionalStreamOf(docsDf: DataFrame): DataFrame =
    docsDf.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "token")))

  /** `(doc_id, token, cnt, positions)` — the POSITIONAL postings the
    * index artifact stores (graft.index.IndexStore): classic IR layout,
    * so phrase adjacency resolves from the index alone without ever
    * touching the corpus text again. */
  private[graft] def termDocPositional(s: SparkSession, dir: String): DataFrame =
    termDocPositionalOf(docs(s, dir))

  /** Same postings computed over an arbitrary `(doc_id, text, ...)`
    * frame — the per-micro-batch path of streaming index maintenance
    * (graft.streaming.IndexMaintenance). */
  private[graft] def termDocPositionalOf(docsDf: DataFrame): DataFrame =
    positionalStreamOf(docsDf)
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("cnt"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** DuckDB mirror of `phraseMatch`: true token-POSITION adjacency —
    * the phrase matches iff its words appear as consecutive tokens
    * (occurrence k at pos0 + k), never a raw substring ('donkey agg'
    * or a mid-token hit cannot match). */
  /** SQL string literal with quotes escaped — the phrase/term constants
    * are token-shaped today, but a future term containing `'` must break
    * loudly in the query, not silently corrupt the generated oracle. */
  private def sqlLit(t: String): String = "'" + t.replace("'", "''") + "'"

  private def phraseSql(phrase: String): String = {
    val words = phrase.split(" ").toSeq
    val joins = words.zipWithIndex.tail.map { case (wd, k) =>
      s"JOIN tok w$k ON w$k.doc_id = w0.doc_id AND w$k.pos = w0.pos + $k AND w$k.token = ${sqlLit(wd)}"
    }.mkString("\n       |  ")
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(tk) AS token,
       |    unnest(range(1, len(tk) + 1)) AS pos
       |  FROM tk),
       |hit AS (
       |  SELECT DISTINCT w0.doc_id
       |  FROM tok w0
       |  $joins
       |  WHERE w0.token = ${sqlLit(words.head)})
       |SELECT doc_id FROM hit ORDER BY doc_id""".stripMargin
  }

  /** Phrase search over a positional `(doc_id, pos, token)` stream —
    * fresh tokenize (tx16) or exploded index postings (tx18). The
    * stream is pruned to the phrase words FIRST, then one window pass
    * per doc checks that occurrence k sits at `pos0 + k`: true
    * positional adjacency, no corpus-text verify step at all. (An
    * earlier formulation verified candidates with an n-gram filter
    * over `tokens(text)`; Catalyst pushed the filter below the
    * semi-join and inlined the tokenize into the n-gram lambda —
    * O(tokens²) per document, 14 s at sf0.1 vs <1 s for this plan.) */
  private def phraseMatch(positional: DataFrame, words: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ts = positional.filter(col("token").isin(words: _*))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val cond = words.zipWithIndex.map { case (word, k) =>
      if (k == 0) col("token") === word
      else lead(col("token"), k).over(w) === word &&
        lead(col("pos"), k).over(w) === col("pos") + k
    }.reduce(_ && _)
    ts.withColumn("hit", cond)
      .filter(col("hit"))
      .select("doc_id").distinct()
      .orderBy("doc_id")
  }

  /** DuckDB mirror of `rankedSearch` — per-term partials summed in
    * FIXED term order on both engines: each (doc, term) contributes
    * exactly one product, and a plain sum() would add in
    * engine-dependent order — double addition is non-associative, and a
    * last-ULP difference can flip the 1e-6 rounding boundary (the tx08
    * failure class). */
  private def rankedSql(terms: Seq[String]): String = {
    val termList = terms.map(sqlLit).mkString("(", ", ", ")")
    val partials = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN td.token = ${sqlLit(t)} THEN CAST(td.cnt AS DOUBLE)\n" +
        s"         |      * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) END) AS s$i"
    }.mkString(",\n         |    ")
    val total = terms.indices.map(i => s"coalesce(s$i, 0.0)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
       |  FROM documents),
       |td AS (SELECT doc_id, token, count(*) AS cnt FROM tok WHERE token <> ''
       |       GROUP BY doc_id, token),
       |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM td
       |       WHERE token IN $termList GROUP BY token),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT td.doc_id,
       |    $partials
       |  FROM td JOIN df ON td.token = df.token CROSS JOIN n
       |  GROUP BY td.doc_id)
       |SELECT doc_id, round($total, 6) AS score FROM scored
       |ORDER BY score DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  /** DuckDB mirror of `bm25Search` — same fixed-term-order partial
    * trick as rankedSql, and the BM25 arithmetic written with the SAME
    * expression tree (literal constants, division order) so both
    * engines produce bit-identical doubles before rounding. */
  private def bm25Sql(terms: Seq[String]): String = {
    val termList = terms.map(sqlLit).mkString("(", ", ", ")")
    def w(t: String): String =
      s"ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))\n" +
        s"         |      * (CAST(td.cnt AS DOUBLE) * 2.2)\n" +
        s"         |      / (CAST(td.cnt AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)\n" +
        s"         |         / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))"
    val partials = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN td.token = ${sqlLit(t)} THEN ${w(t)} END) AS s$i"
    }.mkString(",\n         |    ")
    val total = terms.indices.map(i => s"coalesce(s$i, 0.0)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
       |  FROM documents),
       |td AS (SELECT doc_id, token, count(*) AS cnt FROM tok WHERE token <> ''
       |       GROUP BY doc_id, token),
       |dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl FROM td GROUP BY doc_id),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |             CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM td
       |       WHERE token IN $termList GROUP BY token),
       |scored AS (
       |  SELECT td.doc_id,
       |    $partials
       |  FROM td
       |  JOIN df ON td.token = df.token
       |  JOIN dl ON dl.doc_id = td.doc_id
       |  CROSS JOIN n
       |  GROUP BY td.doc_id)
       |SELECT doc_id, round($total, 6) AS score FROM scored
       |ORDER BY score DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  /** BM25 ranked retrieval (k1 = 1.2, b = 0.75, Lucene-form idf) —
    * the standard search-engine ranking over the same index shapes as
    * tx17. Per-doc length and the corpus (n_docs, Σdl) stats come from
    * integer aggregates (exact, order-free); only the final per-term
    * weights are floating point, summed in fixed term order. Doc
    * lengths are a corpus-wide (doc_id, dl) aggregate — same cost
    * class as tx03's df table — joined to the PRUNED posting set, so
    * the quadratic part of scoring still only touches query-term
    * postings.
    */
  private def bm25Search(index: DataFrame, terms: Seq[String]): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // persisted: dl (doc-cardinality lengths) feeds the corpus stats
    // AND the scoring join; td (query-term postings, tiny) feeds df
    // AND the scoring join — unpersisted, each consumer re-ran the
    // full index derivation (4 live index/corpus scans in the
    // round-18 baseline tx21/tx22 plans; 2 is the BM25 floor)
    val dl = index.groupBy("doc_id").agg(sum("cnt").as("dl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val td = index.filter(col("token").isin(terms: _*))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dft = td.groupBy("token").agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val cntd = col("cnt").cast("double")
    val avgdl = col("sum_dl").cast("double") / nd
    val weight = log(lit(1.0) + (nd - dfd + 0.5) / (dfd + 0.5)) *
      (cntd * 2.2) /
      (cntd + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    val partialCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, weight)).as(s"s$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduce(_ + _)
    td.join(broadcast(dft), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(partialCols.head, partialCols.tail: _*)
      .select(col("doc_id"), duckRound(total, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** TF-IDF ranked retrieval through a term-doc index: only postings of
    * the query terms participate (index prune); df is an aggregate over
    * the pruned term set and `nDocs` is a one-row (n_docs) frame — the
    * corpus count for tx17, the saved stats artifact for tx19 (so the
    * served query never touches the raw corpus). Deterministic:
    * duckRound'd score with per-term FIXED-ORDER partials + doc_id
    * tiebreak. */
  private def rankedSearch(index: DataFrame, terms: Seq[String],
                           nDocs: DataFrame): DataFrame = {
    // persisted: the pruned posting set (query-term rows only, tiny)
    // feeds both the df aggregate and the scoring join — unpersisted,
    // each consumer re-derived the index (2 corpus passes in tx17)
    val td = index.filter(col("token").isin(terms: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df over (doc, token) rows == distinct docs per term (see tx03)
    val df = td.groupBy("token").agg(count(lit(1)).as("df"))
    val n = nDocs
    val prod = col("cnt").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val partialCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, prod)).as(s"s$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduce(_ + _)
    td.join(broadcast(df), "token").crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(partialCols.head, partialCols.tail: _*)
      .select(col("doc_id"), duckRound(total, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** TF-IDF oracle + final projection, shared by tx04 (broadcast DF
    * join) and tx30 (salted shuffle DF join): the two queries differ
    * ONLY in join strategy, and keeping one copy of the scoring
    * formula/SQL is what makes "results ≡ tx04 by construction" an
    * enforced property rather than a manually-synced claim. */
  private val TfIdfOracleSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
      |  FROM documents),
      |td AS (SELECT doc_id, token, count(*) AS cnt FROM tok WHERE token <> ''
      |       GROUP BY doc_id, token),
      |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
      |       WHERE token <> '' GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT td.doc_id, td.token,
      |  round(CAST(td.cnt AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
      |FROM td JOIN df ON td.token = df.token CROSS JOIN n
      |WHERE td.cnt >= 3
      |ORDER BY td.doc_id, td.token"""

  /** The TF-IDF scoring tail over a joined (doc_id, token, cnt, df,
    * n_docs) frame — see [[TfIdfOracleSql]]. */
  private def tfIdfSelect(joined: DataFrame): DataFrame =
    joined.filter(col("cnt") >= 3)
      .select(col("doc_id"), col("token"),
        duckRound(col("cnt").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("tfidf"))
      .orderBy("doc_id", "token")

  // ---- Iterative BPE trainer (tx38/tx39) ----------------------------

  /** Merges tx38 trains (and tx39 applies). Before `qs`: the oracle
    * SQL interpolates at object init (the PackBudget caveat). */
  private[graft] val BpeMerges = 8

  /** Unit encoding for the merge-apply string trick: each subword unit
    * travels as chr(31)+unit+chr(30), so applying merge (a, b) is ONE
    * sequential replace of "␟a␞␟b␞" with "␟ab␞" — unit-boundary-safe
    * (the delimiters enclose every unit, so the pattern can never
    * match inside a longer unit) and overlap-free (an occurrence
    * consumes its two whole units and shares no delimiter with the
    * next, so consecutive pairs like a·b·a·b merge independently —
    * the failure a space-JOINED encoding has, where adjacent matches
    * share the separating space). Both engines run leftmost-
    * nonoverlapping replace on the same encoding, so training states
    * stay identical stage for stage. Corpus tokens are
    * whitespace-split text and cannot contain the two control
    * chars; even if one did, both engines would transform the same
    * bytes the same way (parity holds; only the unit split would be
    * off for that token). */
  private val UO = "\u001f" // unit open (ASCII unit separator)
  private val UC = "\u001e" // unit close (ASCII record separator)
  private val DuckUnitRe = "chr(31) || '([^' || chr(30) || ']*)' || chr(30)"

  /** word → wrapped single-char units (training state 0). */
  private def bpeEncode(word: Column): Column =
    array_join(transform(sequence(lit(1), length(word)),
      i => concat(lit(UO), word.substr(i, lit(1)), lit(UC))), "")

  private def bpeUnits(enc: Column): Column =
    regexp_extract_all(enc, lit(s"$UO([^$UC]*)$UC"), lit(1))

  private def bpeMergeApplied(enc: Column, a: String, b: String): Column =
    call_function("replace", enc,
      lit(UO + a + UC + UO + b + UC), lit(UO + a + b + UC))

  /** Vocab-sized (word, wn) counts — the frame the whole trainer loops
    * over: the corpus collapses to it in ONE shuffle (tx33's device)
    * and is never touched again. Callers persist it across rounds. */
  private[graft] def wordCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wn"))

  /** Iterative BPE training (Sennrich et al. 2016) — the loop whose
    * first iteration is tx33. Each round: adjacent-unit pair counts
    * weighted by word frequency (a vocabulary-sized aggregation),
    * argmax pair by (n DESC, a, b) — the ONLY driver collect, ONE row
    * per round — then the merge folded into the unit-string projection
    * via the boundary-safe replace. State stays a distributed frame of
    * |vocab| rows end to end: at 100 TB the corpus is read once into
    * `wc` and every round costs one vocabulary-sized job, so training
    * depth is a constant-per-round knob, not a corpus-scan multiplier.
    * Stops early when no adjacent pair remains. */
  def bpeTrain(wc: DataFrame, nMerges: Int): Seq[(Int, String, String, Long)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var enc: Column = bpeEncode(col("word"))
    var exhausted = false
    for (rk <- 1 to nMerges if !exhausted) {
      val st = wc.select(enc.as("enc"), col("wn"))
      val u = bpeUnits(col("enc"))
      val best = st
        // sequence(1, 0) yields [1, 0] (negative step), not empty —
        // single-unit words must be filtered out (the tx33 gotcha)
        .filter(size(u) >= 2)
        .select(col("wn"), explode(transform(sequence(lit(1), size(u) - 1),
          i => struct(element_at(u, i).as("a"),
            element_at(u, i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wn")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rk, a, b, n))
        enc = bpeMergeApplied(enc, a, b)
      }
    }
    merges.toSeq
  }

  /** Trained segmentation of `word` — [[bpeEncode]] with the merge
    * list folded in rank order (BPE apply IS replaying the merges). */
  def bpeSegmented(word: Column,
                   merges: Seq[(Int, String, String, Long)]): Column =
    bpeUnits(merges.foldLeft(bpeEncode(word)) {
      case (enc, (_, a, b, _)) => bpeMergeApplied(enc, a, b)
    })

  /** Unrolled DuckDB mirror of [[bpeTrain]]: stage CTEs s0..sN carry
    * (word, enc, wn); each stage k counts pairs (p_k), takes the
    * argmax (b_k) and applies it with the same boundary-safe replace.
    * LEFT JOIN ON TRUE keeps s_k populated when b_k is empty (pair-
    * exhausted corpus) — mirroring the Spark trainer's early stop. */
  private def bpeStageCtes(n: Int): String = {
    val uo = "chr(31)"; val uc = "chr(30)"
    val s0 =
      s"""wc AS (
         |  SELECT w AS word, count(*) AS wn FROM (
         |    SELECT unnest($DuckToks) AS w FROM documents)
         |  GROUP BY w),
         |s0 AS (
         |  SELECT word, array_to_string(list_transform(range(1, len(word) + 1),
         |    i -> $uo || substr(word, i, 1) || $uc), '') AS enc, wn
         |  FROM wc)"""
    val stages = (1 to n).map { k =>
      s"""p$k AS (
         |  SELECT u[i] AS a, u[i + 1] AS b, wn FROM (
         |    SELECT u, unnest(range(1, len(u))) AS i, wn FROM (
         |      SELECT regexp_extract_all(enc, $DuckUnitRe, 1) AS u, wn
         |      FROM s${k - 1})
         |    WHERE len(u) >= 2)),
         |b$k AS (
         |  SELECT a, b, CAST(sum(wn) AS BIGINT) AS n FROM p$k
         |  GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
         |s$k AS (
         |  SELECT word,
         |    CASE WHEN b$k.a IS NULL THEN enc
         |         ELSE replace(enc, $uo || b$k.a || $uc || $uo || b$k.b || $uc,
         |                      $uo || b$k.a || b$k.b || $uc) END AS enc, wn
         |  FROM s${k - 1} LEFT JOIN b$k ON TRUE)"""
    }
    (s0 +: stages).mkString(",\n")
  }

  /** tx39's corpus-budget semantics, shared with its serve-from-
    * artifact twin tx41: corpus-weighted subword-unit counts under a
    * BpeMerges-deep vocabulary — Spark side. */
  private def bpeUnitReport(wc: DataFrame,
      m: Seq[(Int, String, String, Long)]): DataFrame =
    wc.select(col("word"), col("wn"),
        explode(bpeSegmented(col("word"), m)).as("unit"))
      .groupBy("unit")
      .agg(sum("wn").as("n"), countDistinct(col("word")).as("n_words"))
      .orderBy("unit")

  /** ... and the DuckDB side (train-in-SQL then aggregate the final
    * stage's units): ONE oracle text for tx39 and tx41 — the stored
    * artifact must reproduce the fresh train-and-apply exactly. */
  private def bpeSegmentOracle: String =
    s"""WITH ${bpeStageCtes(BpeMerges)}
       |SELECT unit, CAST(sum(wn) AS BIGINT) AS n,
       |  CAST(count(DISTINCT word) AS BIGINT) AS n_words
       |FROM (
       |  SELECT word, wn,
       |    unnest(regexp_extract_all(enc, $DuckUnitRe, 1)) AS unit
       |  FROM s$BpeMerges)
       |GROUP BY unit ORDER BY unit"""

  val qs: Seq[Q] = Seq(

    // --- Tokenize + global token counts ---
    Q("tx01_token_counts",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      tokenStream(s, dir).groupBy("token").agg(count(lit(1)).as("n")).orderBy("token")
    },

    // --- Per-(doc, term) frequency + relative TF (two-level agg via window) ---
    Q("tx02_term_frequency",
      """WITH td AS (
        |  SELECT doc_id, token, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY doc_id, token)
        |SELECT doc_id, token, cnt,
        |  CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY doc_id) AS DOUBLE) AS tf
        |FROM td
        |ORDER BY doc_id, token""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byDoc = Window.partitionBy("doc_id")
      termDoc(s, dir)
        .withColumn("tf",
          col("cnt").cast("double") / sum(col("cnt")).over(byDoc).cast("double"))
        .orderBy("doc_id", "token")
    },

    // --- Document frequency ---
    Q("tx03_doc_frequency",
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      // termDoc already holds one row per (doc, token): counting rows
      // per token == countDistinct(doc_id) but the shuffle carries
      // pre-aggregated (doc, token) pairs, not raw token occurrences,
      // and needs no distinct-tracking state.
      termDoc(s, dir)
        .groupBy("token").agg(count(lit(1)).as("df"))
        .orderBy("token")
    },

    // --- TF-IDF (joins TF with DF and the corpus size) ---
    Q("tx04_tfidf", TfIdfOracleSql) { (s, dir) =>
      // persist: td feeds both the TF rows and the DF aggregation —
      // without it Spark re-tokenizes the corpus for each use.
      val td = termDoc(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // df derived from td (rows per token == distinct docs per token):
      // one tokenize pass feeds both TF and DF instead of two.
      val df = td.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      tfIdfSelect(
        td.join(broadcast(df), "token").crossJoin(broadcast(n)))
    },

    // --- Per-document keyword extraction: top-3 TF-IDF terms per doc
    //     (the tagging op a pipeline runs corpus-wide). Ranks on the
    //     ROUNDED score with token tiebreak; the rank filter plans as
    //     WindowGroupLimit, so a long document is bounded to k terms
    //     before the window sort. ---
    Q("tx24_keywords",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |td AS (SELECT doc_id, token, count(*) AS cnt FROM tok WHERE token <> ''
        |       GROUP BY doc_id, token),
        |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        |       WHERE token <> '' GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT td.doc_id, td.token,
        |    round(CAST(td.cnt AS DOUBLE)
        |      * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
        |  FROM td JOIN df ON td.token = df.token CROSS JOIN n)
        |SELECT doc_id, token, tfidf, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT doc_id, token, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, token) AS rank
        |  FROM scored)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val td = termDoc(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = td.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("token"))
      td.join(broadcast(df), "token").crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          duckRound(col("cnt").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6)
            .as("tfidf"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("tfidf"),
          col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")
    },

    // --- The flagship: ranked inverted index over documents.
    //     NOTE: the FULL index is the semantics here, so the per-term
    //     collect_list is inherently unbounded — a stop-word-scale term
    //     materializes its whole posting list in one aggregation
    //     buffer. At 100 TB run tx12 (window rank-before-collect) or
    //     tx13 (typed bounded Aggregator, O(k) buffer) instead, or
    //     stop-word-filter first (tx06); this variant exists for full
    //     reference parity. ---
    Q("tx05_inverted_index",
      """WITH td AS (
        |  SELECT doc_id, token, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY doc_id, token)
        |SELECT token,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(cnt) AS BIGINT) AS total_cnt,
        |  string_agg(doc_id || '#' || cnt, ', ' ORDER BY cnt DESC, doc_id) AS postings
        |FROM td
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      termDoc(s, dir)
        .groupBy("token")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("cnt")).as("total_cnt"),
          array_join(
            transform(
              sort_array(collect_list(struct(
                (-col("cnt")).as("neg"), col("doc_id"), col("cnt")))),
              p => concat(p.getField("doc_id"), lit("#"), p.getField("cnt"))),
            ", ").as("postings"))
        .orderBy("token")
    },

    // --- Stop-word anti-join (reference F3 as a real join) ---
    Q("tx06_stopword_filter",
      s"""SELECT token, count(*) AS n
         |FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
         |      FROM documents)
         |WHERE token <> '' AND length(token) >= 3
         |  AND token NOT IN $StopSqlList
         |GROUP BY token
         |ORDER BY token""") { (s, dir) =>
      import s.implicits._
      val stop = Stop.toDF("token")
      tokenStream(s, dir)
        .filter(length(col("token")) >= 3)
        .join(broadcast(stop), Seq("token"), "left_anti")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy("token")
    },

    // --- Language ID heuristic (marker-word argmax) ---
    Q("tx07_lang_id",
      s"""WITH sc AS (
         |  SELECT doc_id, lang,
         |    len(list_filter($DuckToks, t -> t IN ('the','a','and','of','to','is','in','that'))) AS s_en,
         |    len(list_filter($DuckToks, t -> t IN ('der','die','das','und','ist','nicht','ein'))) AS s_de,
         |    len(list_filter($DuckToks, t -> t IN ('el','la','los','que','de','es','un','una'))) AS s_es,
         |    len(list_filter($DuckToks, t -> t IN ('le','la','les','et','est','un','une','que'))) AS s_fr
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM sc
         |ORDER BY doc_id""") { (s, dir) =>
      // tokens projected ONCE (CollapseProject keeps multi-referenced
      // non-trivial projections), then 4 language scores read the array
      docs(s, dir)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("lang"), langIdOf(col("tk")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // --- Quality scoring ---
    Q("tx08_quality_score",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS tk FROM documents)
         |SELECT doc_id,
         |  round(0.4 * least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |               ELSE CAST(len(list_filter(tk, x -> x IN $StopSqlList)) AS DOUBLE)
         |                    / CAST(len(tk) AS DOUBLE) END)
         |      + 0.3 * least((CASE WHEN len(tk) = 0 THEN 0.0
         |               ELSE CAST(list_sum(list_transform(tk, x -> length(x)))
         |                         AS DOUBLE) / CAST(len(tk) AS DOUBLE) END) / 8.0, 1.0),
         |    6) AS quality
         |FROM t
         |ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), qualityScoreOf(col("tk"), Stop).as("quality"))
        .orderBy("doc_id")
    },

    // --- Token counting: whitespace + BPE-ish regex ---
    Q("tx09_token_stats",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  n_chars
        |FROM documents
        |ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"),
        col("n_chars"))
        .orderBy("doc_id")
    },

    // --- Rolling-hash fingerprint ---
    Q("tx10_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents
        |ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // --- Bounded inverted index: top-3 postings per term via window
    //     rank BEFORE collect_list — the skew-proof flagship variant
    //     (no aggregation buffer ever exceeds k entries) ---
    Q("tx12_inverted_index_topk",
      """WITH td AS (
        |  SELECT doc_id, token, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY doc_id, token),
        |r AS (
        |  SELECT doc_id, token, cnt,
        |    row_number() OVER (PARTITION BY token ORDER BY cnt DESC, doc_id) AS rn
        |  FROM td)
        |SELECT token,
        |  string_agg(doc_id || '#' || cnt, ', ' ORDER BY cnt DESC, doc_id) AS postings
        |FROM r WHERE rn <= 3
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("token").orderBy(col("cnt").desc, col("doc_id"))
      termDoc(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .groupBy("token")
        .agg(array_join(
          transform(
            sort_array(collect_list(struct(
              (-col("cnt")).as("neg"), col("doc_id"), col("cnt")))),
            p => concat(p.getField("doc_id"), lit("#"), p.getField("cnt"))),
          ", ").as("postings"))
        .orderBy("token")
    },

    // --- Same semantics via the typed BoundedTopK Aggregator: the
    //     aggregation BUFFER (not just the output) is capped at k,
    //     so one skewed term cannot OOM an executor at 100 TB ---
    Q("tx13_inverted_index_bounded_agg",
      """WITH td AS (
        |  SELECT doc_id, token, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
        |        FROM documents)
        |  WHERE token <> ''
        |  GROUP BY doc_id, token),
        |r AS (
        |  SELECT doc_id, token, cnt,
        |    row_number() OVER (PARTITION BY token ORDER BY cnt DESC, doc_id) AS rn
        |  FROM td)
        |SELECT token,
        |  string_agg(doc_id || '#' || cnt, ', ' ORDER BY cnt DESC, doc_id) AS postings
        |FROM r WHERE rn <= 3
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      import graft.operators.{BoundedTopK, Posting}
      val topk = udaf(new BoundedTopK(3), BoundedTopK.inputEncoder)
      termDoc(s, dir)
        .groupBy("token")
        .agg(topk(col("doc_id"), col("cnt")).as("top")) // one arg per Posting field
        .select(col("token"), array_join(
          transform(col("top"),
            p => concat(p.getField("doc"), lit("#"), p.getField("cnt"))),
          ", ").as("postings"))
        .orderBy("token")
    },

    // --- Salted skew-safe aggregation: identical result to tx01, but
    //     a hot token spreads over 16 reducers in phase 1 before the
    //     cheap per-token merge in phase 2 — the standard mitigation
    //     when one key (a stop-word-scale term at 100 TB) would
    //     otherwise pin a single reducer. Salt is derived from doc_id
    //     so the plan stays deterministic. ---
    Q("tx14_salted_token_counts",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY token""") { (s, dir) =>
      tokenStream(s, dir)
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
        .groupBy("token", "salt").agg(count(lit(1)).as("c"))
        .groupBy("token").agg(sum(col("c")).as("n"))
        .orderBy("token")
    },

    // --- Salted SKEW JOIN: tx14's device applied to a join. tx04
    //     broadcasts the DF side; at 100 TB the vocabulary doesn't
    //     broadcast, the TF⋈DF join shuffles on `token`, and Zipf
    //     skew parks the head tokens' entire posting mass on single
    //     tasks. Fix: salt the fat (TF) side with hash(doc_id)%16,
    //     replicate the skinny (DF) side ×16, equi-join on
    //     (token, salt) — every hot token now spreads over 16 tasks,
    //     at the cost of a bounded 16× blowup of the SMALL side only.
    //     shuffle_hash hint models the no-broadcast regime; results
    //     are identical to tx04 by construction (same expression
    //     trees, the salt never reaches an aggregate). ---
    Q("tx30_salted_join", TfIdfOracleSql) { (s, dir) =>
      val SaltN = 16
      val td = termDoc(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = td.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val tdSalted = td
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(SaltN)))
      val dfReplicated = df.withColumn("salt",
        explode(sequence(lit(0L), lit(SaltN - 1L))))
      tfIdfSelect(
        tdSalted
          .join(dfReplicated.hint("shuffle_hash"), Seq("token", "salt"))
          .crossJoin(broadcast(n)))
    },

    // --- Word bigram counts ---
    Q("tx11_bigrams",
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents)
        |SELECT bigram, count(*) AS n
        |FROM (SELECT unnest(list_transform(range(1, len(tk)),
        |                    i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |      FROM t)
        |GROUP BY bigram
        |ORDER BY bigram""") { (s, dir) =>
      docs(s, dir)
        .select(tokens(col("text")).as("tk")) // materialize once per doc
        .select(explode(wordNgramsOf(col("tk"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy("bigram")
    },

    // --- Phrase search THROUGH the index: the downstream use the
    //     reference builds its index for. Candidate docs come from the
    //     term-posting intersection (every phrase word present), and
    //     only candidates get the exact adjacency check — at 100 TB
    //     the adjacency scan touches the pruned candidate set, not
    //     the corpus. tx18 is the same search served from the SAVED
    //     index artifact instead of a fresh tokenize. ---
    Q("tx16_phrase_search", phraseSql(Phrase)) { (s, dir) =>
      phraseMatch(positionalStream(s, dir), Phrase.split(" ").toSeq)
    },

    // --- Ranked retrieval: TF-IDF-scored multi-term search, top 10,
    //     through a fresh tokenize. tx19 is the same search served from
    //     the SAVED index artifact. ---
    Q("tx17_ranked_search", rankedSql(RankTerms)) { (s, dir) =>
      rankedSearch(termDoc(s, dir), RankTerms,
        docs(s, dir).agg(count(lit(1)).as("n_docs")))
    },

    // --- The reference's build-once/query-many contract: tx18/tx19 are
    //     tx16/tx17 SERVED ENTIRELY FROM THE MATERIALIZED INDEX (a
    //     saved positional-postings table bucketed+sorted by token plus
    //     a corpus-stats side table, graft.index.IndexStore) — the
    //     served plans never scan the raw corpus at all
    //     (PlanSpec-guarded): phrase adjacency resolves from stored
    //     positions, n_docs from the stats artifact. Same oracles as
    //     tx16/tx17: serving from the artifact must be
    //     result-identical to recomputing. ---
    Q("tx18_phrase_from_index", phraseSql(Phrase)) { (s, dir) =>
      val words = Phrase.split(" ").toSeq
      // prune to the phrase words on the bucketed scan, THEN explode
      // the stored positions back into the positional stream
      val positional = graft.index.IndexStore.termDoc(s, dir)
        .filter(col("token").isin(words: _*))
        .select(col("doc_id"), col("token"),
          explode(col("positions")).as("pos"))
      phraseMatch(positional, words)
    },

    Q("tx19_ranked_from_index", rankedSql(RankTerms)) { (s, dir) =>
      rankedSearch(graft.index.IndexStore.termDoc(s, dir), RankTerms,
        graft.index.IndexStore.docStats(s, dir))
    },

    // --- BM25 served from the saved artifact (same oracle as tx21:
    //     the index is a materialization, never a semantics change) ---
    Q("tx22_bm25_from_index", bm25Sql(RankTerms)) { (s, dir) =>
      bm25Search(
        graft.index.IndexStore.termDoc(s, dir).select("doc_id", "token", "cnt"),
        RankTerms)
    },

    // --- Repetition signals (Gopher-style quality filters): duplicate
    //     bigram fraction + most-common-token dominance. Two shapes on
    //     purpose: the bigram metric is a per-row array projection (no
    //     shuffle at all), the dominance metric is the standard
    //     explode → two-level agg — both scale-safe. ---
    Q("tx15_repetition",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) < 2 THEN 0.0
         |         ELSE 1.0 - CAST(len(list_distinct(list_transform(
         |                range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])))
         |              AS DOUBLE)
         |            / CAST(len(toks) - 1 AS DOUBLE) END AS dup_bigram_frac
         |  FROM tk),
         |tc AS (SELECT doc_id, token, count(*) AS c
         |       FROM (SELECT doc_id, unnest(toks) AS token FROM tk)
         |       GROUP BY doc_id, token),
         |tt AS (SELECT doc_id,
         |         CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_frac,
         |         CAST(sum(c) AS BIGINT) AS n_tokens
         |       FROM tc GROUP BY doc_id)
         |SELECT bg.doc_id AS doc_id, round(bg.dup_bigram_frac, 6) AS dup_bigram_frac,
         |  round(coalesce(tt.top_frac, 0.0), 6) AS top_token_frac,
         |  coalesce(tt.n_tokens, 0) AS n_tokens
         |FROM bg LEFT JOIN tt ON tt.doc_id = bg.doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      val bg = docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          when(size(col("tk")) < 2, lit(0.0))
            .otherwise(lit(1.0) -
              size(array_distinct(wordNgramsOf(col("tk"), 2))).cast("double") /
                (size(col("tk")) - 1).cast("double"))
            .as("dup_bigram_frac"))
      val tt = termDoc(s, dir)
        .groupBy("doc_id")
        .agg((max(col("cnt")).cast("double") / sum(col("cnt")).cast("double"))
          .as("top_frac"), sum(col("cnt")).as("n_tokens"))
      bg.join(tt, Seq("doc_id"), "left")
        .select(col("doc_id"), duckRound(col("dup_bigram_frac"), 6).as("dup_bigram_frac"),
          duckRound(coalesce(col("top_frac"), lit(0.0)), 6).as("top_token_frac"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
        .orderBy("doc_id")
    },

    // --- BM25 ranked retrieval (k1=1.2, b=0.75): the standard search
    //     ranking over the tx17 index shapes ---
    Q("tx21_bm25", bm25Sql(RankTerms)) { (s, dir) =>
      bm25Search(termDoc(s, dir), RankTerms)
    },

    // --- PMI collocations: pointwise mutual information over corpus
    //     bigrams, min support 5. Counts are integer-exact; the one
    //     floating expression is written with the same tree on both
    //     engines, and ranking is on the ROUNDED score (the pl04
    //     lesson: never rank on raw doubles across engines). ---
    Q("tx23_collocations",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM tk),
         |bc AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram),
         |uni AS (SELECT unnest(tk) AS token FROM tk),
         |uc AS (SELECT token, count(*) AS c FROM uni GROUP BY token),
         |tot AS (SELECT CAST(sum(cab) AS BIGINT) AS bt FROM bc),
         |utot AS (SELECT CAST(sum(c) AS BIGINT) AS ut FROM uc)
         |SELECT bigram,
         |  CAST(cab AS BIGINT) AS support,
         |  round(ln((CAST(cab AS DOUBLE) / CAST(bt AS DOUBLE))
         |      / ((CAST(ca.c AS DOUBLE) / CAST(ut AS DOUBLE))
         |         * (CAST(cb.c AS DOUBLE) / CAST(ut AS DOUBLE)))), 6) AS pmi
         |FROM bc
         |JOIN uc ca ON ca.token = string_split(bigram, ' ')[1]
         |JOIN uc cb ON cb.token = string_split(bigram, ' ')[2]
         |CROSS JOIN tot CROSS JOIN utot
         |WHERE cab >= 5
         |ORDER BY pmi DESC, bigram""") { (s, dir) =>
      val toks = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("tk"))
      // persisted: both count frames are vocab-sized but fan out (uc
      // to its total and BOTH join sides, bc to its total and the
      // report) — unpersisted, each consumer re-ran the corpus
      // tokenize pass (5 live corpus scans in the baseline plan)
      import org.apache.spark.storage.StorageLevel
      val bc = toks
        .select(explode(wordNgramsOf(col("tk"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val uc = toks
        .select(explode(col("tk")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tot = bc.agg(sum("cab").as("bt"))
      val utot = uc.agg(sum("c").as("ut"))
      val pmi = log((col("cab").cast("double") / col("bt").cast("double")) /
        ((col("ca.c").cast("double") / col("ut").cast("double")) *
          (col("cb.c").cast("double") / col("ut").cast("double"))))
      bc.filter(col("cab") >= 5)
        .join(uc.as("ca"), col("ca.token") === split(col("bigram"), " ")(0))
        .join(uc.as("cb"), col("cb.token") === split(col("bigram"), " ")(1))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(utot))
        .select(col("bigram"), col("cab").as("support"),
          duckRound(pmi, 6).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
    },

    // --- Heavy hitters via a Misra–Gries typed Aggregator: an O(k)
    //     MERGEABLE sketch per partition, merged in O(k) — frequent
    //     tokens over 100 TB without shuffling the (token, count)
    //     stream. Sketch CONTENTS are encounter-order-dependent (no
    //     cross-engine value oracle exists for the raw estimates), but
    //     the Misra–Gries GUARANTEE is deterministic: every token with
    //     true count > n/(k+1) is in the sketch, with
    //     true − n/(k+1) ≤ est ≤ true. So the query emits the exact
    //     heavy hitters (oracle-able) with two booleans attesting the
    //     sketch honored both halves of the guarantee — a hash-green
    //     check that fails exactly when the sketch breaks its bound.
    //     Raw top-k estimates stay pinned by HeavyHittersSpec. ---
    Q("tx20_heavy_hitters",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |t AS (SELECT unnest(tk) AS token FROM tk),
         |c AS (SELECT token, count(*) AS cnt_exact FROM t GROUP BY token),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM t)
         |SELECT token, CAST(cnt_exact AS BIGINT) AS cnt_exact,
         |  TRUE AS in_sketch, TRUE AS est_ok
         |FROM c, n
         |WHERE cnt_exact > n_total / 21.0
         |ORDER BY cnt_exact DESC, token""") { (s, dir) =>
      import s.implicits._
      val toks = tokenStream(s, dir).select(col("token"))
      val sketch = toks
        .select(col("token").as[String])
        .select(new graft.operators.HeavyHitters(20).toColumn.name("sketch"))
        .select(explode(col("sketch")).as("e"))
        .select(col("e.item").as("token"), col("e.est").as("est"))
      val tot = toks.groupBy()
        .agg(count(lit(1)).cast("double").as("n_total"))
      val slack = col("n_total") / lit(21.0) // n/(k+1), k = 20
      toks.groupBy("token").agg(count(lit(1)).as("cnt_exact"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt_exact") > slack)
        .join(sketch, Seq("token"), "left")
        .select(col("token"), col("cnt_exact"),
          col("est").isNotNull.as("in_sketch"),
          (col("est").isNotNull && col("est") <= col("cnt_exact") &&
            col("est").cast("double") >= col("cnt_exact") - slack)
            .as("est_ok"))
        .orderBy(col("cnt_exact").desc, col("token"))
    },

    // --- Bigram language-model fluency score: train MLE bigram
    //     probabilities P(w2|w1) = c(w1 w2)/c(w1) on the corpus, score
    //     each doc by its mean bigram log-probability — the
    //     perplexity-proxy quality signal pipelines use to rank text
    //     naturalness (a KenLM stand-in with the same dataflow). No
    //     smoothing needed: every doc bigram is in the corpus counts by
    //     construction, so probabilities are never zero. Per-doc
    //     (doc, bigram) occurrence counts aggregate BEFORE the model
    //     joins, so join input is bounded by per-doc vocabulary, not
    //     token count. Rounded to 4 decimals: the per-doc sum of logs
    //     accumulates partial-merge-order noise ~1e-13, far below the
    //     rounding granularity. ---
    Q("tx25_lm_score",
      s"""WITH tk AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM tk),
         |db AS (SELECT doc_id, bigram, count(*) AS k FROM bg GROUP BY doc_id, bigram),
         |bc AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram),
         |uc AS (SELECT token, count(*) AS c
         |       FROM (SELECT unnest(tk) AS token FROM tk) GROUP BY token),
         |sc AS (
         |  SELECT db.doc_id,
         |    CAST(sum(db.k) AS BIGINT) AS n_bigrams,
         |    sum(CAST(db.k AS DOUBLE)
         |        * ln(CAST(bc.cab AS DOUBLE) / CAST(uc.c AS DOUBLE))) AS lp
         |  FROM db JOIN bc USING (bigram)
         |  JOIN uc ON uc.token = string_split(db.bigram, ' ')[1]
         |  GROUP BY db.doc_id)
         |SELECT t.doc_id,
         |  coalesce(s.n_bigrams, 0) AS n_bigrams,
         |  round(s.lp / CAST(s.n_bigrams AS DOUBLE), 4) AS mean_logprob
         |FROM tk t LEFT JOIN sc s ON t.doc_id = s.doc_id
         |ORDER BY t.doc_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // persisted: toks has THREE consumers (bigrams, unigrams, final
      // doc ids) — uncached, each would re-scan and re-tokenize the
      // corpus. bg's two consumers recompute from the cached arrays
      // (an explode — cheap), so only toks holds storage.
      val toks = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("tk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val bg = toks
        .select(col("doc_id"), explode(wordNgramsOf(col("tk"), 2)).as("bigram"))
      val db = bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("k"))
      val bc = bg.groupBy("bigram").agg(count(lit(1)).as("cab"))
      val uc = toks.select(explode(col("tk")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("c"))
      val sc = db.join(bc, "bigram")
        .join(uc, col("token") === split(col("bigram"), " ")(0))
        .groupBy("doc_id")
        .agg(sum("k").as("n_bigrams"),
          sum(col("k").cast("double") *
            log(col("cab").cast("double") / col("c").cast("double"))).as("lp"))
      toks.select(col("doc_id"))
        .join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          duckRound(col("lp") / col("n_bigrams").cast("double"), 4)
            .as("mean_logprob"))
        .orderBy("doc_id")
    },

    // --- Unicode NFC normalization: canonical composition before
    //     hashing, so `e + COMBINING ACUTE` and precomposed `é` dedup
    //     identically — a normalization pass every multilingual
    //     pipeline runs before exact/near dedup. The corpus is ASCII,
    //     so a decomposed suffix (e+́, a+̊) is appended to make the op
    //     observable: NFC composes it, shortening the string by the
    //     two combining marks. Spark side is the codegen'd
    //     `graft.expressions.NfcNormalize` (JDK Normalizer); oracle is
    //     DuckDB's utf8proc `nfc_normalize` — both implement the same
    //     Unicode algorithm. Lengths compare safely: all chars are
    //     BMP, where Spark's UTF-16 units == DuckDB's code points. ---
    Q("tx26_unicode_nfc",
      """SELECT doc_id,
        |  length(text || chr(101) || chr(769) || chr(97) || chr(778)) AS len_raw,
        |  length(nfc_normalize(text || chr(101) || chr(769) || chr(97) || chr(778))) AS len_nfc,
        |  md5(nfc_normalize(text || chr(101) || chr(769) || chr(97) || chr(778))) AS nfc_md5
        |FROM documents
        |ORDER BY doc_id""") { (s, dir) =>
      val sfx = "e\u0301a\u030A" // DECOMPOSED é and å (4 code points)
      val raw = concat(col("text"), lit(sfx))
      docs(s, dir)
        .select(col("doc_id"),
          length(raw).as("len_raw"),
          length(nfcNormalize(raw)).as("len_nfc"),
          md5(nfcNormalize(raw).cast("binary")).as("nfc_md5"))
        .orderBy("doc_id")
    },

    // --- Zipf fit: regress log(freq) on log(rank) over the top-K
    //     vocabulary — the corpus-health scalar (natural text ≈ −1
    //     slope). The top-K cut is orderBy+limit (TakeOrdered: per-
    //     partition heaps, no global sort of the vocabulary), so the
    //     only single-partition step — the rank window — sees exactly K
    //     rows regardless of corpus size; the regression itself is an
    //     O(1)-state aggregate. ---
    Q("tx27_zipf_fit",
      s"""WITH tc AS (
         |  SELECT token, count(*) AS n
         |  FROM (SELECT unnest($DuckToks) AS token FROM documents)
         |  GROUP BY token),
         |top AS (SELECT token, n FROM tc ORDER BY n DESC, token LIMIT 1000),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
         |      FROM top)
         |SELECT round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
         |  round(regr_intercept(ln(n), ln(rank)), 6) AS zipf_intercept,
         |  round(regr_r2(ln(n), ln(rank)), 6) AS fit_r2,
         |  count(*) AS n_ranks
         |FROM r""") { (s, dir) =>
      val top = tokenStream(s, dir)
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(1000)
      val ranked = top.select(col("n"),
        row_number().over(
          Window.orderBy(col("n").desc, col("token"))).as("rank"))
      ranked.agg(
        duckRound(regr_slope(log(col("n")), log(col("rank"))), 6)
          .as("zipf_slope"),
        duckRound(regr_intercept(log(col("n")), log(col("rank"))), 6)
          .as("zipf_intercept"),
        duckRound(regr_r2(log(col("n")), log(col("rank"))), 6).as("fit_r2"),
        count(lit(1)).as("n_ranks"))
    },

    // --- Character-entropy quality score: Shannon entropy over the
    //     per-doc character distribution — low entropy flags repeated-
    //     character gibberish and template spam that token-level rules
    //     (tx08) miss. ENTIRELY map-side: the char list, distinct set,
    //     counts, and entropy fold are per-row higher-order functions,
    //     so at 100 TB this is a single scan with zero shuffles before
    //     the final sort. Determinism: the fold runs over the SORTED
    //     distinct char set on both engines (same order, same IEEE op
    //     sequence), counts are exact ints, and log2 is spelled
    //     ln(x)/ln(2) on both sides (DuckDB's log2() builtin may differ
    //     from the quotient in the last ULP). ---
    Q("tx28_char_entropy",
      """WITH c AS (SELECT doc_id, lower(text) AS t FROM documents
        |           WHERE len(text) > 0),
        |e AS (
        |  SELECT doc_id, CAST(len(t) AS DOUBLE) AS n,
        |    list_transform(range(1, len(t) + 1), i -> t[i:i]) AS cs
        |  FROM c),
        |f AS (
        |  SELECT doc_id, n,
        |    list_transform(list_sort(list_distinct(cs)),
        |      ch -> CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE)) AS cnts
        |  FROM e)
        |SELECT doc_id, CAST(n AS INT) AS n_chars_lc,
        |  CAST(len(cnts) AS INT) AS n_distinct_chars,
        |  round(-list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(cnts, k -> (k / n) * ln(k / n) / ln(2))),
        |    (acc, x) -> acc + x), 6) AS entropy
        |FROM f
        |ORDER BY doc_id""") { (s, dir) =>
      // one codegen'd pass per doc (graft.expressions.CharEntropy):
      // the HOF formulation (char array → distinct → a filter().size
      // scan per distinct char → fold) was O(distinct × length)
      // interpreted work, measured 15 s at sf0.1 vs ~1 s for this
      docs(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          call_function("graft_char_entropy", lower(col("text"))).as("ce"))
        .select(col("doc_id"),
          col("ce.n_chars").as("n_chars_lc"),
          col("ce.n_distinct").as("n_distinct_chars"),
          duckRound(col("ce.entropy"), 6).as("entropy"))
        .orderBy("doc_id")
    },

    // --- Proximity search (NEAR/5): docs where the two query terms
    //     occur within 5 token positions — the IR operator between
    //     tx16's exact-adjacency phrase and tx17's bag-of-words
    //     ranking. Classic postings intersection: the positional
    //     stream is pruned to the TWO query tokens first (at serve
    //     time this is two index lookups, tx18's path), grouped to one
    //     positions-array row per (doc, term), equi-joined on doc_id,
    //     and the pairwise |pa−pb| check runs as an array HOF inside
    //     the row — per-doc work is |positions_a|·|positions_b|,
    //     bounded by doc length, never a corpus-scale blowup. Position
    //     BASE differs across engines (0- vs 1-based); only distances
    //     are compared, so the base cancels. ---
    Q("tx29_proximity_search", {
      val (ta, tb) = (sqlLit("join"), sqlLit("filter"))
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(tk) AS token,
         |    unnest(range(1, len(tk) + 1)) AS pos
         |  FROM tk),
         |a AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tok
         |      WHERE token = $ta GROUP BY doc_id),
         |b AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tok
         |      WHERE token = $tb GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id,
         |    list_filter(flatten(list_transform(a.ps,
         |      x -> list_transform(b.ps, y -> abs(x - y)))), d -> d <= 5) AS ds
         |  FROM a JOIN b ON a.doc_id = b.doc_id)
         |SELECT doc_id, CAST(len(ds) AS BIGINT) AS n_pairs,
         |  CAST(list_min(ds) AS BIGINT) AS min_dist
         |FROM p WHERE len(ds) > 0
         |ORDER BY doc_id"""
    }) { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val pruned = positionalStream(s, dir)
        .filter(col("token").isin("join", "filter"))
        .groupBy("doc_id", "token")
        .agg(sort_array(collect_list(col("pos"))).as("ps"))
        .persist(StorageLevel.MEMORY_AND_DISK) // both term branches read it
      val a = pruned.filter(col("token") === "join")
        .select(col("doc_id"), col("ps").as("pa"))
      val b = pruned.filter(col("token") === "filter")
        .select(col("doc_id"), col("ps").as("pb"))
      val ds = filter(
        flatten(transform(col("pa"),
          x => transform(col("pb"), y => abs(x - y)))),
        d => d <= 5)
      a.join(b, "doc_id")
        .select(col("doc_id"), ds.as("ds"))
        .filter(size(col("ds")) > 0)
        .select(col("doc_id"),
          size(col("ds")).cast("long").as("n_pairs"),
          array_min(col("ds")).cast("long").as("min_dist"))
        .orderBy("doc_id")
    },

    // --- TextRank (Mihalcea & Tarau 2004): PageRank over the word
    //     graph — corpus-level keyword salience beyond raw counts
    //     (tx01) or TF-IDF (tx04). Nodes = vocabulary, directed edges
    //     = bigram counts, 3 power iterations with damping 0.85. The
    //     determinism device is INTEGER PageRank: ranks start at 10⁶
    //     and every update is  150000 + Σ (r·w·17) div (outw·20)  —
    //     pure integral multiply/divide/sum, so both engines agree
    //     bit-for-bit with no rounding guard (a double formulation
    //     would accumulate contributions in engine-dependent order).
    //     The r·w·17 product accumulates WIDE (Spark decimal(38,0),
    //     DuckDB HUGEINT): with a web-scale vocabulary a hub token's
    //     rank times a head bigram weight exceeds 2⁶³, where the
    //     engines diverge differently (Spark wraps, DuckDB raises) —
    //     the sm04 Lloyd-sum overflow rule applied to products. The
    //     QUOTIENT fits BIGINT (total mass is conserved at N·10⁶),
    //     so only the product is wide.
    //     Scale shape: the edge list aggregates map-side to vocab²
    //     (bounded by observed bigrams); each iteration is one
    //     equi-join on src + one sum by dst — vocabulary-sized
    //     shuffles, never corpus-sized; the corpus is scanned once. ---
    Q("tx31_textrank",
      """WITH tks AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
        |                     x -> x <> '') AS tk
        |  FROM documents),
        |e AS (
        |  SELECT src, dst, count(*) AS w FROM (
        |    SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS src,
        |           unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS dst
        |    FROM tks)
        |  GROUP BY src, dst),
        |nodes AS (
        |  SELECT src AS token FROM e UNION SELECT dst FROM e),
        |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
        |r0 AS (SELECT token, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS token,
        |         sum((CAST(r.r AS HUGEINT) * e.w * 17) // (o.outw * 20)) AS c
        |       FROM e JOIN r0 r ON r.token = e.src
        |              JOIN ow o ON o.src = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.token, CAST(150000 + coalesce(c.c, 0) AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c1 c ON c.token = n.token),
        |c2 AS (SELECT e.dst AS token,
        |         sum((CAST(r.r AS HUGEINT) * e.w * 17) // (o.outw * 20)) AS c
        |       FROM e JOIN r1 r ON r.token = e.src
        |              JOIN ow o ON o.src = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.token, CAST(150000 + coalesce(c.c, 0) AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c2 c ON c.token = n.token),
        |c3 AS (SELECT e.dst AS token,
        |         sum((CAST(r.r AS HUGEINT) * e.w * 17) // (o.outw * 20)) AS c
        |       FROM e JOIN r2 r ON r.token = e.src
        |              JOIN ow o ON o.src = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.token, CAST(150000 + coalesce(c.c, 0) AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN c3 c ON c.token = n.token)
        |SELECT token, r AS rank FROM r3
        |ORDER BY rank DESC, token""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val e = docs(s, dir)
        .select(tokens(col("text")).as("tk"))
        .select(explode(wordNgramsOf(col("tk"), 2)).as("bg"))
        .select(substring_index(col("bg"), " ", 1).as("src"),
          substring_index(col("bg"), " ", -1).as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK) // read by ow + 3 iterations
      val nodes = e.select(col("src").as("token"))
        .union(e.select(col("dst"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ew = e.join(e.groupBy("src").agg(sum("w").as("outw")), "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val r3 = (1 to 3).foldLeft(nodes.withColumn("r", lit(1000000L))) {
        (r, _) =>
          val c = ew.join(r.withColumnRenamed("token", "src"), "src")
            .select(col("dst").as("token"),
              expr("(CAST(r AS DECIMAL(38,0)) * w * 17) div (outw * 20)").as("term"))
            .groupBy("token").agg(sum("term").as("c"))
          nodes.join(c, Seq("token"), "left")
            .select(col("token"),
              (lit(150000L) + coalesce(col("c"), lit(0L))).as("r"))
      }
      r3.select(col("token"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("token"))
    },

    // --- Cross-source n-gram overlap matrix: which sources copy from
    //     each other (mirrors, scraped re-posts, shared boilerplate) —
    //     the between-subset contamination report, where pl01/pl14
    //     check corpus-vs-benchmark. Per source, the DISTINCT 5-gram
    //     set keyed by md5 DIGEST (32 fixed chars shuffle, never
    //     n-gram text); the pair counts come from a self-equi-join on
    //     the digest — per-digest fan-out is bounded by sources², and
    //     the join output is integer counts only. Jaccard divides two
    //     exact integers, identically on both engines. ---
    Q("tx32_source_overlap",
      """WITH sh AS (
        |  SELECT DISTINCT source,
        |    md5(ng) AS d
        |  FROM (
        |    SELECT source, unnest(list_transform(range(1, len(tk) - 3),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |           tk[i+3] || ' ' || tk[i+4])) AS ng
        |    FROM (SELECT source,
        |            list_filter(string_split_regex(lower(text), '\s+'),
        |                        x -> x <> '') AS tk
        |          FROM documents))),
        |cnt AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |ov AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.d = b.d AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT ov.source_a, ov.source_b,
        |  CAST(ov.n_shared AS BIGINT) AS n_shared,
        |  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
        |  round(CAST(ov.n_shared AS DOUBLE)
        |        / CAST(ca.n + cb.n - ov.n_shared AS DOUBLE), 6) AS jaccard
        |FROM ov JOIN cnt ca ON ca.source = ov.source_a
        |        JOIN cnt cb ON cb.source = ov.source_b
        |ORDER BY source_a, source_b""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val sh = docs(s, dir)
        .select(col("source"),
          explode(wordNgramsOf(tokens(col("text")), 5)).as("ng"))
        .select(col("source"), md5(col("ng").cast("binary")).as("d"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK) // counts + both join sides
      val cnt = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val ov = sh.select(col("source").as("source_a"), col("d"))
        .join(sh.select(col("source").as("source_b"), col("d")), Seq("d"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_shared"))
      ov.join(broadcast(cnt.select(col("source").as("source_a"),
          col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(cnt.select(col("source").as("source_b"),
          col("n").as("n_b"))), Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("n_a"), col("n_b"),
          duckRound(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("source_a", "source_b")
    },

    // --- BPE merge-pair statistics (tokenizer training, iteration 1):
    //     count adjacent CHARACTER pairs across the corpus, weighted by
    //     word frequency — the argmax pair is the first merge a
    //     byte-pair-encoding vocabulary build would apply. The corpus
    //     collapses to vocabulary-sized word counts FIRST (one shuffle,
    //     map-side partials), then pair extraction runs over the tiny
    //     (word, count) frame — at 100 TB the second agg sees |vocab|
    //     rows, not |corpus| tokens. Each position contributes one
    //     pair ("aaa" → "aa" twice), matching BPE's occurrence count. ---
    Q("tx33_bpe_pairs",
      s"""WITH words AS (
         |  SELECT w, count(*) AS wn FROM (
         |    SELECT unnest($DuckToks) AS w FROM documents)
         |  GROUP BY w),
         |pairs AS (
         |  SELECT unnest(list_transform(range(1, len(w)),
         |                               i -> substr(w, i, 2))) AS pair, wn
         |  FROM words WHERE len(w) >= 2)
         |SELECT pair, CAST(sum(wn) AS BIGINT) AS n
         |FROM pairs GROUP BY pair
         |ORDER BY n DESC, pair LIMIT 50""") { (s, dir) =>
      tokenStream(s, dir)
        .groupBy("token").agg(count(lit(1)).as("wn"))
        // sequence(1, 0) would yield [1, 0] (negative step), not empty
        // like DuckDB's range(1, 1) — 1-char words must be filtered out
        .filter(length(col("token")) >= 2)
        .select(explode(transform(
            sequence(lit(1), length(col("token")) - 1),
            i => col("token").substr(i, lit(2)))).as("pair"),
          col("wn"))
        .groupBy("pair").agg(sum(col("wn")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(50)
    },

    // --- Triangle enumeration over the word co-occurrence graph: edges
    //     = canonicalized (a < b) bigram pairs seen ≥ 2×, triangles =
    //     the 3-cycle join e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c (the
    //     canonical orientation counts each triangle exactly once —
    //     the classic distributed triangle-count shape). The corpus
    //     collapses to the VOCAB-sized edge list first (441 edges at
    //     sf0.01, 465 at sf0.1 — vocabulary saturates), so the two
    //     self-joins run on frames whose size is set by the language,
    //     not the corpus: at 100 TB the joins are unchanged while the
    //     one corpus pass feeding them scales out. ---
    Q("tx34_word_triangles",
      s"""WITH t AS (SELECT $DuckToks AS tk FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |                i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM t),
         |bc AS (SELECT bigram FROM bg GROUP BY bigram HAVING count(*) >= 2),
         |e AS (
         |  SELECT DISTINCT
         |    least(string_split(bigram, ' ')[1], string_split(bigram, ' ')[2]) AS a,
         |    greatest(string_split(bigram, ' ')[1], string_split(bigram, ' ')[2]) AS b
         |  FROM bc
         |  WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2])
         |SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |FROM e e1
         |JOIN e e2 ON e2.a = e1.b
         |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
         |ORDER BY a, b, c""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val sp = split(col("bigram"), " ")
      // persisted: e is self-joined 3× (triangle enumeration) — unpersisted,
      // each join side re-ran the corpus bigram pass; the edge list itself
      // is vocab-sized (~465 rows), so one corpus pass feeds all three sides.
      val e = docs(s, dir)
        .select(tokens(col("text")).as("tk"))
        .select(explode(wordNgramsOf(col("tk"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(least(sp.getItem(0), sp.getItem(1)).as("a"),
          greatest(sp.getItem(0), sp.getItem(1)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.as("e1")
        .join(e.as("e2"), col("e2.a") === col("e1.b"))
        .join(e.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
        .orderBy("a", "b", "c")
    },

    // --- Suffix-strip stemming (index-time normalization, the light-
    //     Porter shape): ies→i, sses→ss, plural-s drop, ing/ed strip —
    //     anchored regex projections, zero shuffle before the stem
    //     aggregation, so at 100 TB stemming fuses into the token scan
    //     exactly like lowercasing (reference P1). The corpus is
    //     uninflected (synthetic tech vocabulary), so deterministic
    //     inflection families are injected per doc_id — the pl08/pl18
    //     observability device — and the report pins CONFLATION: each
    //     family (joins/joining/joined + the natural base form "join")
    //     must collapse to one stem with n_forms counting its variants. ---
    Q("tx35_stem",
      """WITH injected AS (
        |  SELECT doc_id,
        |    text || CASE doc_id % 3
        |      WHEN 0 THEN ' joins joining joined'
        |      WHEN 1 THEN ' filters filtering filtered'
        |      ELSE ' sorts sorting sorted' END AS text
        |  FROM documents),
        |w AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x <> '')) AS t
        |  FROM injected),
        |st AS (
        |  SELECT t,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(t,
        |      'ies$', 'i'), 'sses$', 'ss'), '([^s])s$', '\1'),
        |      '([a-z][a-z])ing$', '\1'), '([a-z][a-z])ed$', '\1') AS stem
        |  FROM w)
        |SELECT stem, count(*) AS n,
        |  CAST(count(DISTINCT t) AS BIGINT) AS n_forms
        |FROM st GROUP BY stem
        |HAVING count(DISTINCT t) >= 2
        |ORDER BY stem""") { (s, dir) =>
      val injected = docs(s, dir).select(concat(col("text"),
        when(col("doc_id") % 3 === 0, " joins joining joined")
          .when(col("doc_id") % 3 === 1, " filters filtering filtered")
          .otherwise(" sorts sorting sorted")).as("text"))
      val stem = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(col("t"),
        "ies$", "i"), "sses$", "ss"), "([^s])s$", "$1"),
        "([a-z][a-z])ing$", "$1"), "([a-z][a-z])ed$", "$1")
      injected
        .select(explode(tokens(col("text"))).as("t"))
        .select(col("t"), stem.as("stem"))
        .groupBy("stem")
        .agg(count(lit(1)).as("n"), countDistinct(col("t")).as("n_forms"))
        .filter(col("n_forms") >= 2)
        .orderBy("stem")
    },

    // --- Per-source token-distribution drift: KL(P_source ∥ P_corpus)
    //     — the domain-drift monitor a pipeline runs per ingest batch
    //     to catch a source whose language shifted (scraper broke,
    //     spam flood, wrong-language feed). The corpus collapses to
    //     (source, token) counts in ONE partial-aggregated pass;
    //     everything after is vocabulary-sized (marginals, the KL
    //     join), so 100 TB of text costs one scan + model-sized math.
    //     P_corpus dominates P_source by construction (corpus ⊇
    //     source), so no smoothing and no log-of-zero. Each KL term is
    //     (c/n_s)·ln(c·n / (n_s·c_t)) on exactly-representable
    //     integer-valued doubles; per-source sums run over ≤|vocab|
    //     terms, merge-order noise ~1e-15 ≪ the 6-decimal rounding.
    //     KL ≥ 0 (Gibbs) is pinned in KlDriftSpec — a sign/ratio flip
    //     in either engine's formula cannot pass. ---
    Q("tx36_kl_drift",
      s"""WITH tk AS (SELECT source, unnest($DuckToks) AS token FROM documents),
         |st AS (SELECT source, token, count(*) AS c FROM tk GROUP BY source, token),
         |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY source),
         |ct AS (SELECT token, CAST(sum(c) AS BIGINT) AS c_t FROM st GROUP BY token),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM st)
         |SELECT st.source, s.n_s AS n_tokens,
         |  round(sum((CAST(st.c AS DOUBLE) / s.n_s)
         |    * ln((CAST(st.c AS DOUBLE) * n.n)
         |          / (CAST(s.n_s AS DOUBLE) * ct.c_t))), 6) AS kl
         |FROM st JOIN s USING (source) JOIN ct USING (token) CROSS JOIN n
         |GROUP BY st.source, s.n_s
         |ORDER BY st.source""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      // persisted: the (source, token) count frame has four consumers
      // (both marginals, the grand total, the KL join) — uncached,
      // each would re-scan and re-tokenize the corpus. The frame is
      // |sources|×|vocab| rows, trivially cacheable at any scale.
      val st = docs(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("token"))
        .groupBy("source", "token").agg(count(lit(1)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sTot = st.groupBy("source").agg(sum("c").as("n_s"))
      val ct = st.groupBy("token").agg(sum("c").as("c_t"))
      val n = st.agg(sum("c").as("n"))
      st.join(broadcast(sTot), "source")
        .join(broadcast(ct), "token")
        .crossJoin(broadcast(n))
        .groupBy(col("source"), col("n_s"))
        .agg(sum((col("c").cast("double") / col("n_s").cast("double")) *
          log((col("c").cast("double") * col("n").cast("double")) /
              (col("n_s").cast("double") * col("c_t").cast("double"))))
          .as("kl_raw"))
        .select(col("source"), col("n_s").as("n_tokens"),
          duckRound(col("kl_raw"), 6).as("kl"))
        .orderBy("source")
    },

    // --- Subword segmentation (WordPiece/BPE APPLY — tx33 is
    //     tokenizer TRAINING iteration 1, this is inference): greedy
    //     maximal-munch over a fixed merge vocabulary, single-char
    //     fallback, reported as corpus-weighted subword-unit counts —
    //     the "how many tokens is this corpus under tokenizer X" pass
    //     every training-data budget starts from. Scale contract: the
    //     corpus collapses to (word, count) FIRST, so the per-word
    //     state machine — a left-to-right fold trying 3-char then
    //     2-char units then 1 char — runs on |distinct words| rows,
    //     corpus-size-independent, and needs no broadcast at all.
    //     Spark drives it as an `aggregate` HOF whose state is
    //     (pos, acc); the skip guard `i < pos` turns the fixed
    //     1..len(word) iteration into the variable-stride walk. The
    //     DuckDB oracle implements the same walk as a recursive CTE —
    //     two independent state-machine encodings that must agree
    //     unit-for-unit. SubwordSegmentSpec pins losslessness:
    //     concat(units) == word for every distinct word. ---
    Q("tx37_subword_segment", {
      val v3 = SubV3Sql
      val v2 = SubV2Sql
      s"""WITH RECURSIVE tk AS (SELECT unnest($DuckToks) AS word FROM documents),
         |wc AS (SELECT word, count(*) AS c FROM tk GROUP BY word),
         |r AS (
         |  SELECT word, 1 AS pos, CAST([] AS VARCHAR[]) AS acc FROM wc
         |  UNION ALL
         |  SELECT word,
         |    pos + CASE WHEN substr(word, pos, 3) IN ($v3) THEN 3
         |               WHEN substr(word, pos, 2) IN ($v2) THEN 2
         |               ELSE 1 END,
         |    list_append(acc,
         |      CASE WHEN substr(word, pos, 3) IN ($v3) THEN substr(word, pos, 3)
         |           WHEN substr(word, pos, 2) IN ($v2) THEN substr(word, pos, 2)
         |           ELSE substr(word, pos, 1) END)
         |  FROM r WHERE pos <= len(word)),
         |fin AS (SELECT word, acc FROM r WHERE pos > len(word)),
         |u AS (SELECT word, unnest(acc) AS unit FROM fin)
         |SELECT u.unit, CAST(sum(wc.c) AS BIGINT) AS n,
         |  CAST(count(DISTINCT u.word) AS BIGINT) AS n_words
         |FROM u JOIN wc USING (word)
         |GROUP BY u.unit ORDER BY u.unit"""
    }) { (s, dir) =>
      val v3 = SubV3Sql
      val v2 = SubV2Sql
      val wc = docs(s, dir).select(explode(tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
      val seg =
        s"""aggregate(
           |  sequence(1, length(word)),
           |  named_struct('pos', 1, 'acc', cast(array() as array<string>)),
           |  (s, i) -> IF(i < s.pos, s,
           |    CASE WHEN substring(word, s.pos, 3) IN ($v3) THEN
           |           named_struct('pos', s.pos + 3,
           |             'acc', array_append(s.acc, substring(word, s.pos, 3)))
           |         WHEN substring(word, s.pos, 2) IN ($v2) THEN
           |           named_struct('pos', s.pos + 2,
           |             'acc', array_append(s.acc, substring(word, s.pos, 2)))
           |         ELSE named_struct('pos', s.pos + 1,
           |             'acc', array_append(s.acc, substring(word, s.pos, 1)))
           |    END),
           |  s -> s.acc)""".stripMargin
      wc.withColumn("unit", explode(expr(seg)))
        .groupBy("unit")
        .agg(sum("c").as("n"), countDistinct(col("word")).as("n_words"))
        .orderBy("unit")
    },

    // --- Iterative BPE TRAINING (tx33 is iteration 1 of exactly this
    //     loop; tx37 applies a hand-fixed vocabulary — this LEARNS
    //     one): [[BpeMerges]] rounds of weighted adjacent-pair argmax
    //     + merge, emitting the ranked merge table a tokenizer build
    //     persists. Scale shape in [[bpeTrain]]: one corpus shuffle
    //     into vocab-sized (word, wn), then every round is a
    //     vocabulary-sized job with a 1-ROW driver collect. The DuckDB
    //     oracle unrolls the same loop as stage CTEs over the same
    //     delimiter-encoded unit strings — two independent encodings
    //     of the training recursion that must agree merge for merge
    //     (and `SubwordSegmentSpec` pins a third, plain-Scala
    //     reference trainer against both). ---
    Q("tx38_bpe_train",
      s"""WITH ${bpeStageCtes(BpeMerges)}
         |SELECT * FROM (
         |  ${(1 to BpeMerges).map(k =>
              s"SELECT $k AS rk, a AS lhs, b AS rhs, n FROM b$k")
              .mkString("\n  |  UNION ALL ")})
         |ORDER BY rk""") { (s, dir) =>
      import s.implicits._
      val wc = wordCounts(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // fully materialized by the per-round collects — safe to release
      val m = try bpeTrain(wc, BpeMerges) finally wc.unpersist()
      m.toDF("rk", "lhs", "rhs", "n").orderBy("rk")
    },

    // --- TRAINED-tokenizer corpus budget: tx37's report (corpus-
    //     weighted subword-unit counts) under the vocabulary tx38 just
    //     learned — train + apply end to end, the "how many tokens is
    //     this corpus under OUR tokenizer" pass. Apply is merge
    //     REPLAY in rank order (BPE inference is defined as replaying
    //     the training merges), folded into one projection over the
    //     same persisted vocab frame the trainer looped on. ---
    Q("tx39_bpe_segment", bpeSegmentOracle) { (s, dir) =>
      val wc = wordCounts(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // eager-checkpoint the unit-vocab-sized report so wc can be
      // released here (tx38's try/finally discipline): without it each
      // execution leaks a cached corpus-vocab frame for the session
      try {
        val m = bpeTrain(wc, BpeMerges)
        bpeUnitReport(wc, m).localCheckpoint(true)
      } finally wc.unpersist()
    },

    // --- LM PERPLEXITY quality filter (CCNet/KenLM-style, the
    //     standard "does this read like language" curation stage): a
    //     bigram LM trained on the corpus itself scores each doc's
    //     cross-entropy H(d) = -avg(log2 P(b|a)) over its bigrams;
    //     high-H docs are the gibberish/boilerplate candidates a
    //     pipeline prunes (perplexity = 2^H, derivable). Self-trained
    //     ⇒ every doc bigram exists in the LM — no smoothing and no
    //     log(0) by construction. Scale shape: the LM collapses the
    //     corpus to DISTINCT-bigram rows (the tx34 saturation
    //     argument — bigram vocabulary is language-bounded, 441→465
    //     edges sf0.01→0.1, while the corpus scales away from it), so
    //     conditionals join LM-to-LM on the first token and the
    //     vocab-sized prob table BROADCASTS onto the corpus bigram
    //     stream: per-doc scoring is one map-side join + one doc-keyed
    //     aggregation. Determinism: each doc's H sums ≤ doc-length
    //     log2 terms (~1e-15 noise, the tx36 device) — only the
    //     reported 6-decimal rounding touches engine floats. ---
    Q("tx40_bigram_perplexity",
      s"""WITH t AS (SELECT doc_id, $DuckToks AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |                        i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM t),
         |lm AS (SELECT bigram, count(*) AS cab FROM bg GROUP BY bigram),
         |ca AS (
         |  SELECT string_split(bigram, ' ')[1] AS a, sum(cab) AS cn
         |  FROM lm GROUP BY a),
         |probs AS (
         |  SELECT bigram, CAST(cab AS DOUBLE) / CAST(cn AS DOUBLE) AS p
         |  FROM lm JOIN ca ON string_split(lm.bigram, ' ')[1] = ca.a),
         |sc AS (
         |  SELECT doc_id, count(*) AS nb, -avg(log2(p)) AS x
         |  FROM bg JOIN probs USING (bigram) GROUP BY doc_id)
         |SELECT t.doc_id, CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
         |  round(coalesce(sc.x, 0.0), 6) AS xent
         |FROM t LEFT JOIN sc USING (doc_id)
         |ORDER BY t.doc_id""") { (s, dir) =>
      import org.apache.spark.storage.StorageLevel
      val d = docs(s, dir)
      // persisted: the bigram stream feeds LM training AND scoring
      val bg = d.select(col("doc_id"),
          explode(wordNgramsOf(tokens(col("text")), 2)).as("bigram"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val lm = bg.groupBy("bigram").agg(count(lit(1)).as("cab"))
      val ca = lm
        .groupBy(split(col("bigram"), " ").getItem(0).as("a"))
        .agg(sum("cab").as("cn"))
      val probs = lm
        .join(ca, split(col("bigram"), " ").getItem(0) === col("a"))
        .select(col("bigram"),
          (col("cab").cast("double") / col("cn").cast("double")).as("p"))
      val sc = bg.join(broadcast(probs), "bigram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"), (-avg(log2(col("p")))).as("x"))
      d.select(col("doc_id")).join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nb"), lit(0L)).as("n_bigrams"),
          duckRound(coalesce(col("x"), lit(0.0)), 6).as("xent"))
        .orderBy("doc_id")
    },

    // --- tx39 SERVED FROM THE FROZEN TOKENIZER ARTIFACT
    //     (graft.index.TokenizerStore — the QualityStore pattern for
    //     learned vocabularies): same oracle text as tx39, but the
    //     serve path replays merges read from the stored ≤BpeMerges-row
    //     table instead of re-running the training loop — zero training
    //     jobs at serve time, one scan of the frame being segmented
    //     (plan-guarded in PlanSpec: the ONLY corpus-scan in the plan
    //     is the segmentation input; no persisted-wc training scans).
    //     The build-once/serve-many contract tx18/tx19 establish for
    //     postings, extended to the tokenizer. ---
    Q("tx41_bpe_segment_stored", bpeSegmentOracle) { (s, dir) =>
      val store = graft.index.TokenizerStore.forCorpus(s, dir)
      bpeUnitReport(wordCounts(s, dir),
        graft.index.TokenizerStore.merges(s, store))
    },

    // --- Tokenizer FERTILITY by source (units-per-word under the
    //     tx38-trained vocabulary): the standard tokenizer-quality
    //     metric — a source whose text fragments into many units per
    //     word is paying more sequence length for the same content
    //     (the multilingual-tokenizer-fairness number, Rust et al.
    //     2021). Scale shape: the per-WORD segmentation runs once on
    //     the distinct-word frame (vocab-sized, corpus-size-
    //     independent); per-(source, word) counts collapse the corpus
    //     in ONE partial-agg pass and join the vocab-sized unit-count
    //     frame — the corpus is never segmented row by row. Fertility
    //     is an exact-integer ratio rounded at 6 decimals (the one
    //     float step, identical IEEE division both engines). ---
    Q("tx42_bpe_fertility",
      s"""WITH ${bpeStageCtes(BpeMerges)},
         |seg AS (
         |  SELECT word, len(regexp_extract_all(enc, $DuckUnitRe, 1)) AS nu
         |  FROM s$BpeMerges),
         |sw AS (
         |  SELECT source, w AS word, count(*) AS swn
         |  FROM (SELECT source, unnest($DuckToks) AS w FROM documents)
         |  GROUP BY source, w)
         |SELECT source, CAST(sum(swn) AS BIGINT) AS n_words,
         |  CAST(sum(swn * nu) AS BIGINT) AS n_units,
         |  round(CAST(sum(swn * nu) AS DOUBLE) / CAST(sum(swn) AS DOUBLE), 6)
         |    AS fertility
         |FROM sw JOIN seg USING (word)
         |GROUP BY source ORDER BY source""") { (s, dir) =>
      val wc = wordCounts(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val m = bpeTrain(wc, BpeMerges)
        // vocab-sized: one row per distinct word with its unit count
        val seg = wc.select(col("word"),
          size(bpeSegmented(col("word"), m)).as("nu"))
        val sw = docs(s, dir)
          .select(col("source"), explode(tokens(col("text"))).as("word"))
          .groupBy("source", "word").agg(count(lit(1)).as("swn"))
        sw.join(seg, "word")
          .groupBy("source")
          .agg(sum("swn").as("n_words"),
            sum(col("swn") * col("nu")).as("n_units"),
            duckRound(sum(col("swn") * col("nu")).cast("double") /
              sum(col("swn")).cast("double"), 6).as("fertility"))
          .orderBy("source")
          // sources-sized report: eager-checkpoint so wc can release
          // in this scope (tx39's discipline)
          .localCheckpoint(true)
      } finally wc.unpersist()
    },

    // --- PREFIX (wildcard) search from the index artifact: docs
    //     ranked by total occurrences of any 's…' term — the `s*`
    //     query of a search surface, served entirely from the saved
    //     postings (zero corpus scans, PlanSpec-guarded with
    //     tx18/tx19). Scale honesty: hash bucketing by token cannot
    //     BUCKET-prune a prefix — what prunes instead is the
    //     `StartsWith` filter PUSHED into the postings scan, where the
    //     token-SORTED files give tight per-row-group min/max stats
    //     (the artifact's sortBy exists for exactly this class of
    //     range/prefix predicate). Work after the scan is
    //     |matching postings|, never corpus-sized; top-10 is a
    //     TakeOrdered, never a global sort. ---
    Q("tx43_prefix_from_index",
      s"""WITH td AS (
         |  SELECT doc_id, token, count(*) AS c
         |  FROM (SELECT doc_id, unnest($DuckToks) AS token FROM documents)
         |  WHERE token LIKE 's%'
         |  GROUP BY doc_id, token)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(c) AS BIGINT) AS n_hits
         |FROM td GROUP BY doc_id
         |ORDER BY n_hits DESC, doc_id LIMIT 10""") { (s, dir) =>
      graft.index.IndexStore.termDoc(s, dir)
        .filter(col("token").startsWith("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("cnt").as("n_hits"))
        .orderBy(col("n_hits").desc, col("doc_id"))
        .limit(10)
    },

    // --- SCRIPT-MIX detection (the writing-system profile that runs
    //     BEFORE n-gram lang-id: tx07 assumes the text is in a Latin
    //     script at all — a Cyrillic spam feed, CJK content routed to
    //     the wrong pipeline, or mixed-script homoglyph obfuscation
    //     all need catching first): per-codepoint-class counts via
    //     count = len − len(class stripped), pure map-side projections
    //     fused into the scan; output restricted to docs carrying any
    //     non-Latin script. The ASCII corpus would make every counter
    //     zero, so non-Latin suffixes are deterministically INJECTED
    //     on doc_id residue classes (the tx26 device); codepoints are
    //     spelled chr()/\\u-escaped on both sides — no raw UTF-8
    //     travels through the oracle dump. ---
    Q("tx44_script_mix", {
      val cyrCls = "'['||chr(1072)||'-'||chr(1103)||chr(1105)||']'"
      val cjkCls = "'['||chr(19968)||'-'||chr(40869)||']'"
      s"""WITH r AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 37 = 5
         |         THEN ' '||chr(1084)||chr(1080)||chr(1088) ELSE '' END
         |    || CASE WHEN doc_id % 41 = 7
         |         THEN ' '||chr(20013)||chr(25991) ELSE '' END AS t
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
         |      AS BIGINT) AS n_latin,
         |    CAST(length(t) - length(regexp_replace(t, $cyrCls, '', 'g'))
         |      AS BIGINT) AS n_cyr,
         |    CAST(length(t) - length(regexp_replace(t, $cjkCls, '', 'g'))
         |      AS BIGINT) AS n_cjk,
         |    CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
         |      AS BIGINT) AS n_digit
         |  FROM r)
         |SELECT doc_id, n_latin, n_cyr, n_cjk, n_digit,
         |  CASE WHEN n_cyr > 0 AND n_cjk > 0 THEN 'mixed'
         |       WHEN n_cyr > 0 THEN 'cyrillic'
         |       WHEN n_cjk > 0 THEN 'cjk'
         |       ELSE 'latin' END AS script
         |FROM c WHERE n_cyr + n_cjk > 0
         |ORDER BY doc_id"""
    }) { (s, dir) =>
      val t = concat(col("text"),
        when(col("doc_id") % 37 === 5, lit(" \u043c\u0438\u0440"))
          .otherwise(lit("")),
        when(col("doc_id") % 41 === 7, lit(" \u4e2d\u6587"))
          .otherwise(lit("")))
      def classCount(cls: String) =
        (length(col("t")) - length(regexp_replace(col("t"), cls, "")))
          .cast("long")
      docs(s, dir)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          classCount("[A-Za-z]").as("n_latin"),
          classCount("[\u0430-\u044f\u0451]").as("n_cyr"),
          classCount("[\u4e00-\u9fa5]").as("n_cjk"),
          classCount("[0-9]").as("n_digit"))
        .filter(col("n_cyr") + col("n_cjk") > 0)
        .withColumn("script",
          when(col("n_cyr") > 0 && col("n_cjk") > 0, "mixed")
            .when(col("n_cyr") > 0, "cyrillic")
            .when(col("n_cjk") > 0, "cjk")
            .otherwise("latin"))
        .orderBy("doc_id")
    },

    // --- READABILITY scoring (Flesch reading-ease + Flesch–Kincaid
    //     grade — the classic words/sentence × syllables/word quality
    //     family, the curation companion to tx08's stopword/length
    //     heuristics): syllables via the standard vowel-group-run
    //     heuristic (maximal [aeiouy]+ runs; runs never cross the
    //     space between words, so one whole-text regexp count equals
    //     the per-word sum with no explode). The corpus carries no
    //     sentence punctuation, so sentence boundaries use a
    //     deterministic device (the tx26/tx44 convention): determiner
    //     tokens 'the'/'a' terminate a sentence, +1 for the tail —
    //     per-doc variation comes from real token frequencies and
    //     both engines count the same rule. Entirely map-side: one
    //     corpus scan, three in-row counts, zero pre-sort shuffles
    //     (the pl26 shape). The band classifies on the ROUNDED score,
    //     so the 60/30 cutpoints compare identical doubles. ---
    Q("tx45_readability",
      s"""WITH c AS (
        |  SELECT doc_id,
        |    CAST(len($DuckToks) AS BIGINT) AS n_words,
        |    CAST(len(list_filter($DuckToks, t -> t IN ('the', 'a')))
        |      + 1 AS BIGINT) AS n_sent,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syll
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words, n_sent, n_syll,
        |    round(206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |      - 84.6 * (CAST(n_syll AS DOUBLE)
        |                / CAST(greatest(n_words, 1) AS DOUBLE)), 4) AS flesch,
        |    round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
        |      + 11.8 * (CAST(n_syll AS DOUBLE)
        |                / CAST(greatest(n_words, 1) AS DOUBLE))
        |      - 15.59, 4) AS grade
        |  FROM c)
        |SELECT doc_id, n_words, n_sent, n_syll, flesch, grade,
        |  CASE WHEN flesch >= 60 THEN 'easy'
        |       WHEN flesch >= 30 THEN 'medium' ELSE 'hard' END AS band
        |FROM r ORDER BY doc_id""") { (s, dir) =>
      val counted = docs(s, dir)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_words"),
          (size(filter(col("tk"), t => t === "the" || t === "a")) + 1)
            .cast("long").as("n_sent"),
          size(regexp_extract_all(lower(col("text")),
            lit("[aeiouy]+"), lit(0))).cast("long").as("n_syll"))
      val wps = col("n_words").cast("double") / col("n_sent").cast("double")
      val spw = col("n_syll").cast("double") /
        greatest(col("n_words"), lit(1L)).cast("double")
      counted
        .withColumn("flesch", duckRound(
          lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4))
        .withColumn("grade", duckRound(
          lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4))
        .withColumn("band",
          when(col("flesch") >= 60, "easy")
            .when(col("flesch") >= 30, "medium")
            .otherwise("hard"))
        .select("doc_id", "n_words", "n_sent", "n_syll",
          "flesch", "grade", "band")
        .orderBy("doc_id")
    },

    // --- HEAPS'-LAW vocabulary-growth fit (V = k·Nᵝ, Heaps 1978 —
    //     the corpus statistic that predicts how a tokenizer's
    //     vocabulary grows with corpus size, i.e. how tx38's merge
    //     table will scale before anyone trains it): each document
    //     contributes one (log tokens, log types) point, the power law
    //     is fit by least squares in log-log space with the q44
    //     regression aggregates. 100 TB shape: the type count is
    //     `array_distinct` WITHIN the row (no explode, no shuffle —
    //     per-doc dedup is map-side), and the fit itself is a 6-moment
    //     partial aggregate, so the whole query is one corpus scan
    //     collapsing to a single row. Rounding at 4 is the q44
    //     convention for cross-engine regression-moment parity. ---
    Q("tx46_heaps_fit",
      s"""WITH d AS (
         |  SELECT CAST(len($DuckToks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_distinct($DuckToks)) AS BIGINT) AS n_types
         |  FROM documents),
         |pts AS (
         |  SELECT ln(CAST(n_tokens AS DOUBLE)) AS lx,
         |         ln(CAST(n_types AS DOUBLE)) AS ly
         |  FROM d WHERE n_tokens >= 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  round(regr_slope(ly, lx), 4) AS beta,
         |  round(exp(regr_intercept(ly, lx)), 4) AS k,
         |  round(regr_r2(ly, lx), 4) AS r2
         |FROM pts""") { (s, dir) =>
      docs(s, dir)
        .select(tokens(col("text")).as("tk"))
        .select(size(col("tk")).cast("long").as("n_tokens"),
          size(array_distinct(col("tk"))).cast("long").as("n_types"))
        .filter(col("n_tokens") >= 2)
        .select(log(col("n_tokens").cast("double")).as("lx"),
          log(col("n_types").cast("double")).as("ly"))
        .agg(count(lit(1)).as("n_docs"),
          duckRound(regr_slope(col("ly"), col("lx")), 4).as("beta"),
          duckRound(exp(regr_intercept(col("ly"), col("lx"))), 4).as("k"),
          duckRound(regr_r2(col("ly"), col("lx")), 4).as("r2"))
    },

    // --- CODE-vs-PROSE detection (the pretraining-corpus routing
    //     filter: code goes to a code mixture, prose to text — every
    //     open corpus pipeline carries one; cf. the rule families in
    //     Gopher/RefinedWeb appendix filters): symbol density (`;{}()=`
    //     per 100 chars) plus code-keyword token hits, combined into a
    //     score classified on the ROUNDED value (the tx45 band
    //     convention, so the cutpoint compares identical doubles).
    //     The synthetic corpus carries no real code, so — the
    //     tx44/sm15 observability convention — a deterministic code
    //     snippet is injected for doc_id % 37 = 3, making both
    //     branches of the classifier observable on clean testdata.
    //     Entirely map-side: one scan, in-row char/keyword counts,
    //     zero pre-sort shuffles. ---
    Q("tx47_code_detect",
      s"""WITH r AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 37 = 3
         |         THEN ' int x = 0; if (x > 1) { return y(x); }'
         |         ELSE '' END AS t
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(length(t) AS BIGINT) AS n_chars,
         |    CAST(length(t) - length(regexp_replace(t, '[;{}()=]', '', 'g'))
         |      AS BIGINT) AS n_sym,
         |    CAST(len(list_filter(
         |        list_filter(string_split_regex(lower(t), '\\s+'), w -> w <> ''),
         |        w -> w IN ('int', 'if', 'return', 'for', 'while', 'def')))
         |      AS BIGINT) AS n_kw
         |  FROM r),
         |sc AS (
         |  SELECT doc_id, n_chars, n_sym, n_kw,
         |    round(100.0 * CAST(n_sym AS DOUBLE)
         |            / CAST(greatest(n_chars, 1) AS DOUBLE)
         |          + 5.0 * CAST(n_kw AS DOUBLE)
         |            / CAST(greatest(n_chars, 1) AS DOUBLE) * 100.0, 4)
         |      AS code_score
         |  FROM c)
         |SELECT doc_id, n_chars, n_sym, n_kw, code_score,
         |  CASE WHEN code_score >= 2.0 THEN 'code' ELSE 'prose' END AS kind
         |FROM sc ORDER BY doc_id""") { (s, dir) =>
      val kw = Seq("int", "if", "return", "for", "while", "def")
      val t = concat(col("text"),
        when(col("doc_id") % 37 === 3,
          lit(" int x = 0; if (x > 1) { return y(x); }"))
          .otherwise(lit("")))
      val counted = docs(s, dir)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          length(col("t")).cast("long").as("n_chars"),
          (length(col("t")) -
            length(regexp_replace(col("t"), "[;{}()=]", "")))
            .cast("long").as("n_sym"),
          size(filter(tokens(col("t")),
            w => w.isInCollection(kw))).cast("long").as("n_kw"))
      val dchars = greatest(col("n_chars"), lit(1L)).cast("double")
      counted
        .withColumn("code_score", duckRound(
          lit(100.0) * col("n_sym").cast("double") / dchars +
            lit(5.0) * col("n_kw").cast("double") / dchars * lit(100.0), 4))
        .withColumn("kind",
          when(col("code_score") >= 2.0, "code").otherwise("prose"))
        .select("doc_id", "n_chars", "n_sym", "n_kw", "code_score", "kind")
        .orderBy("doc_id")
    }
  )
}
