package graft.index

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Spark-native ranked inverted index — the reference's entire capability
  * (/root/reference/src/InvertedIndexer.java, 263 lines of Hadoop
  * MapReduce) re-expressed as one declarative DataFrame chain.
  *
  * Stage mapping (SURVEY.md §2.1):
  *   - S1/S2 scan+provenance  → `spark.read.text` + `input_file_name()`
  *   - P1-P3 normalize/tokenize → `lower` + fused `regexp_replace` +
  *     `explode(split)` (one compiled regex per task, vs the reference's
  *     per-token Pattern.compile, InvertedIndexer.java:120)
  *   - F1-F3 filters          → `length`, `rlike`, broadcast anti-join
  *   - A1/A2 combiner+sum     → `groupBy(term, doc).count()` (Catalyst
  *     plans partial+final HashAggregate automatically — the combiner,
  *     InvertedIndexer.java:139-151, costs zero code here)
  *   - X1/A3 one-shuffle two-level agg → `repartition($"term")` before
  *     the first agg so the second groupBy reuses the exchange (§4)
  *   - O1 ranking             → `sort_array` over struct (numeric) or
  *     packed string (legacy byte-parity) postings
  *   - O2/O3/O4 format+sort+sink → `concat`/`array_join`, `orderBy`
  *
  * Scale notes (100 TB design point): the pipeline is two exchanges —
  * one hash partition on `term` serving BOTH aggregation levels, one
  * range partition for the global sort (drop `sorted=true` to skip it).
  * Skewed stop-word-like terms are bounded by `topK` (per-group limit
  * pushed into the aggregation via window rank), so no single
  * `collect_list` can OOM an executor.
  */
object InvertedIndex {

  /** S1+S2: read every line of every file under `dir`, tagging each row
    * with the source document's basename (InvertedIndexer.java:104-105).
    */
  def scanTextDir(spark: SparkSession, dir: String): DataFrame = {
    // text-corpus entry point (doesn't pass through tables.load, which
    // registers for the parquet paths): the tokenize stage downstream
    // resolves graft_tokenize from the session registry
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    spark.read.textFile(dir).toDF("line")
      .withColumn("doc", regexp_extract(input_file_name(), "[^/]+$", 0))
  }

  /** P1-P3 + F1/F2: lowercase, scrub punctuation chars to spaces,
    * explode whitespace tokens, drop short + numeric tokens.
    */
  def tokenize(lines: DataFrame, punctuation: Seq[Char],
               minLength: Int = 3): DataFrame = {
    val scrubbed = TextFunctions.scrubPunctuation(lower(col("line")), punctuation)
    lines
      .select(col("doc"), explode(TextFunctions.tokens(scrubbed)).as("term"))
      .filter(length(col("term")) >= minLength)
      .filter(!TextFunctions.isNumericToken(col("term")))
  }

  /** F3: stop-word anti-filter as a broadcast LEFT ANTI join — the join
    * the reference fakes with a DistributedCache HashSet
    * (InvertedIndexer.java:124-126). Broadcast keeps it shuffle-free.
    */
  def removeStopWords(tokens: DataFrame, stopWords: Seq[String])
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val stop = stopWords.toDF("term")
    tokens.join(broadcast(stop), Seq("term"), "left_anti")
  }

  /** A1+A2: per-(term, doc) frequency. Partial (map-side) aggregation is
    * automatic — `groupBy.count` plans partial+final HashAggregate, the
    * reference's combiner (InvertedIndexer.java:139-151) for free.
    *
    * `oneShuffle = true` repartitions on `term` FIRST so the per-term
    * grouping reuses the exchange (the reference's custom-partitioner
    * trick, :154-160) — but it ships every RAW token occurrence across
    * the network, defeating map-side combining. At scale two shuffles of
    * partially-aggregated (term, doc, cnt) rows beat one shuffle of all
    * tokens, so the combiner-preserving plan is the default; the
    * repartition variant stays as a benchmarked opt-in.
    */
  def termDocCounts(tokens: DataFrame, oneShuffle: Boolean = false): DataFrame = {
    val in = if (oneShuffle) tokens.repartition(col("term")) else tokens
    in.groupBy("term", "doc").agg(count(lit(1)).as("cnt"))
  }

  /** O1/A3: per-term posting lists ranked by count desc, doc asc —
    * the sane numeric ordering.
    *
    * `topK > 0` bounds each list BEFORE aggregation: a `row_number`
    * window over (term) drops rows past rank k, so the `collect_list`
    * buffer for a stop-word-scale term holds at most k entries — no
    * single executor can OOM on a skewed term. (The window sorts within
    * term partitions; combined with the aggregation that follows it,
    * the plan stays at one hash exchange on `term` plus a sort.)
    */
  def postingLists(tdc: DataFrame, topK: Int = 0): DataFrame = {
    val bounded = if (topK > 0) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("term").orderBy(col("cnt").desc, col("doc"))
      tdc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topK).drop("rn")
    } else tdc
    bounded.groupBy("term").agg(
      transform(
        sort_array(collect_list(struct(
          (-col("cnt")).as("negCnt"), col("doc"), col("cnt")))),
        p => struct(p.getField("doc").as("doc"), p.getField("cnt").as("cnt")))
        .as("postings"))
  }

  /** O1 legacy byte-parity variant: the reference reverse-sorts packed
    * `"count#filename"` STRINGS (InvertedIndexer.java:178,180), so count
    * 10 ranks below count 2 and ties break by filename DESC — verified
    * in /root/reference/output/part-r-00000:23595. Reproduced exactly.
    */
  def postingListsLegacy(tdc: DataFrame): DataFrame =
    tdc.groupBy("term").agg(
      reverse(sort_array(collect_list(
        concat(col("cnt").cast("string"), lit("#"), col("doc")))))
        .as("packed"))

  /** O2: `term: doc#cnt, doc#cnt, ...` lines from numeric postings. */
  def formatIndex(postings: DataFrame): DataFrame =
    postings.select(concat(
      col("term"), lit(": "),
      array_join(transform(col("postings"),
        p => concat(p.getField("doc"), lit("#"), p.getField("cnt"))), ", "))
      .as("value"))

  /** O2 legacy: unpack `count#doc` → `doc#count` display order
    * (InvertedIndexer.java:189-196).
    */
  private def formatLegacy(packed: DataFrame): DataFrame =
    packed.select(concat(
      col("term"), lit(": "),
      array_join(transform(col("packed"), p => concat(
        substring_index(p, "#", -1), lit("#"), substring_index(p, "#", 1))), ", "))
      .as("value"))

  /** M1 metrics: tag the surviving-token stream with an `observe` named
    * `metrics` — the reference's INPUT_WORDS counter
    * (InvertedIndexer.java:37,130-133) without a second pass; read it
    * back via a QueryExecutionListener or `Observation`.
    */
  def observeTokens(tokens: DataFrame): DataFrame =
    tokens.observe("metrics", count(lit(1)).as("input_words"))

  /** End-to-end numeric-ranked index over a text directory. */
  def build(spark: SparkSession, inputDir: String, stopWords: Seq[String],
            punctuation: Seq[Char], topK: Int = 0,
            sorted: Boolean = true): DataFrame = {
    implicit val s: SparkSession = spark
    val tdc = termDocCounts(observeTokens(
      removeStopWords(tokenize(scanTextDir(spark, inputDir), punctuation), stopWords)))
    val idx = postingLists(tdc, topK)
    if (sorted) idx.orderBy("term") else idx
  }

  /** O4 text sink. Partitioned output is the scale default; the
    * reference's single `part-r-00000` (`coalesce(1)`) is an opt-in for
    * golden parity only — one writer task is the anti-scale pattern.
    */
  def writeIndex(lines: Dataset[String], outDir: String,
                 singleFile: Boolean = false): Unit = {
    val out = if (singleFile) lines.coalesce(1) else lines
    out.write.mode("overwrite").text(outDir)
  }

  /** Byte-for-byte reproduction of the reference job: same inputs →
    * identical lines to /root/reference/output/part-r-00000 (golden
    * parity, SURVEY.md §5.1). Returns one formatted line per term,
    * globally sorted ascending.
    */
  def buildLegacy(spark: SparkSession, inputDir: String,
                  stopWordFile: String, punctuationFile: String): Dataset[String] = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val stop = readLines(stopWordFile)
    // punctuation.txt holds single-char Java regexes like `\!` — the
    // char is the last character of each line (skip/punctuation.txt:1-33).
    val punct = readLines(punctuationFile).filter(_.nonEmpty).map(_.last)
    val tdc = termDocCounts(
      removeStopWords(tokenize(scanTextDir(spark, inputDir), punct), stop))
    // Sort on the TERM column (Hadoop's key order), not the formatted
    // line — a digit right after a shared prefix would sort before ':'.
    formatLegacy(postingListsLegacy(tdc).orderBy("term")).as[String]
  }

  /** The reference job WITHOUT `-skip` (InvertedIndexer.java:53-64:
    * `wordcount.skip.patterns` unset ⇒ both cached pattern sets stay
    * empty, and :107-126 then runs lowercase → whitespace tokenize →
    * length/numeric filters with NO punctuation scrub and NO stop-word
    * filter — tokens keep their attached punctuation, e.g. `lord,`).
    * Same packed ranking, formatting, term sort and single-file
    * contract as [[buildLegacy]]; only the two filter inputs differ.
    */
  def buildLegacyNoSkip(spark: SparkSession, inputDir: String): Dataset[String] = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val tdc = termDocCounts(tokenize(scanTextDir(spark, inputDir), Nil))
    formatLegacy(postingListsLegacy(tdc).orderBy("term")).as[String]
  }

  private def readLines(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.trim).filter(_.nonEmpty).toList
    finally src.close()
  }
}
