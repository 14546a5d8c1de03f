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
    }
  )
}
