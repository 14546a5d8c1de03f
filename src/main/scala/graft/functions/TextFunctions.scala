package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions, all built from codegen'd Catalyst
  * built-ins (`functions._`) — no Scala UDFs, so every one of these stays
  * inside WholeStageCodegen and benefits from predicate pushdown /
  * column pruning around it.
  *
  * Generalizes the reference's map-side text pipeline
  * (lowercase → punctuation scrub → tokenize → filters,
  * /root/reference/src/InvertedIndexer.java:107-126) into reusable
  * column expressions, plus the north-star text-analysis surface
  * (language ID, quality scoring, token counting, fingerprinting).
  */
object TextFunctions {

  /** Whitespace tokenizer with empty-token suppression — a native
    * one-pass codegen'd expression (graft.expressions.Tokenize).
    * Replaces `filter(split(lower(text), "\\s+"), t -> length(t) > 0)`
    * — `split` keeps empty leading tokens where Java's StringTokenizer
    * (reference :111-113) drops them, and the HOF filter that restored
    * parity dispatched an interpreted lambda per token. Equality with
    * the composed form and StringTokenizer is spec-pinned.
    */
  def tokens(text: Column): Column =
    call_function("graft_tokenize", text)

  /** Unicode NFC normalization (graft.expressions.NfcNormalize) —
    * canonical composition so decomposed and precomposed forms hash
    * identically; mirror of DuckDB's `nfc_normalize`. */
  def nfcNormalize(text: Column): Column =
    call_function("graft_nfc", text)

  /** Reference punctuation scrub (InvertedIndexer.java:108-110): each
    * single-char pattern replaced by a space. Fused into ONE
    * regexp_replace over a character class — one compiled regex per task
    * instead of the reference's per-token Pattern.compile.
    */
  def scrubPunctuation(text: Column, chars: Seq[Char]): Column =
    if (chars.isEmpty) text // "[]" is an invalid (empty) char class
    else {
      val cls = chars.distinct.map(c => "\\" + c).mkString("[", "", "]")
      regexp_replace(text, cls, " ")
    }

  /** Reference numeric-literal filter (InvertedIndexer.java:120-122). */
  def isNumericToken(tok: Column): Column = tok.rlike("^[-+]?[0-9]*$")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alnum-non-space chars each count as one token — a cheap
    * deterministic proxy for subword tokenizers.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Fraction of tokens present in `stop` (0.0 for empty docs), over an
    * already-projected token array. Like `wordNgramsOf`, the `-Of`
    * variants exist so multi-metric queries tokenize each document ONCE:
    * project `tokens(text)` into a real column first — `CollapseProject`
    * won't inline a non-trivial expression referenced multiple times, so
    * the split runs once per doc instead of once per metric.
    */
  def stopwordRatioOf(toks: Column, stop: Seq[String]): Column = {
    val hits = size(filter(toks, t => t.isInCollection(stop)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Fraction of tokens present in `stop` (0.0 for empty docs). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column =
    stopwordRatioOf(tokens(text), stop)

  /** Mean token length in characters (0.0 for empty docs), over an
    * already-projected token array. */
  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
          .cast("double") / size(toks).cast("double"))

  /** Mean token length in characters (0.0 for empty docs). */
  def meanTokenLength(text: Column): Column =
    meanTokenLengthOf(tokens(text))

  /** Marker-word vocabularies for the n-gram-heuristic language ID.
    * Deliberately tiny and deterministic; real pipelines would swap in a
    * fastText-style model via the same column signature.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "que", "de", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"))

  /** Per-language marker-hit count over an already-projected token
    * array (see `stopwordRatioOf` for why the `-Of` shape matters). */
  def langScoreOf(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Per-language marker-hit count over the token list. */
  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOf(tokens(text), markers)

  /** Heuristic language ID over an already-projected token array:
    * argmax marker-hit count, ties broken by language code ascending,
    * "und" when nothing matches. Implemented as a greatest-of-structs
    * fold so it stays one codegen'd expression.
    */
  def langIdOf(toks: Column): Column = {
    // struct(score DESC, code ASC) — greatest() picks max score and,
    // on ties, the lexicographically LARGEST code; invert the code by
    // comparing on score first via array_max over reversed tie order.
    val scored = LangMarkers.map { case (code, words) =>
      struct(langScoreOf(toks, words).as("s"), lit(code).as("c"))
    }
    // array_min of (negated score, code) = best score, then code asc.
    val best = array_min(array(scored.map(s =>
      struct((-s.getField("s")).as("ns"), s.getField("c").as("c"))): _*))
    when(best.getField("ns") === 0, lit("und")).otherwise(best.getField("c"))
  }

  /** Heuristic language ID straight from text — one-shot convenience;
    * pipelines should project `tokens(text)` and use `langIdOf`. */
  def langId(text: Column): Column = langIdOf(tokens(text))

  /** Composite document quality score in [0,1] over an
    * already-projected token array; deterministic double arithmetic
    * (fixed operation order) so a SQL oracle can reproduce it
    * bit-for-bit before rounding.
    */
  def qualityScoreOf(toks: Column, stop: Seq[String]): Column = {
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val stopScore = stopwordRatioOf(toks, stop) // some stopwords = natural text
    val lenOk = least(meanTokenLengthOf(toks) / lit(8.0), lit(1.0))
    // duckRound, not round: the composite lands on decimal half
    // boundaries (seen at sf0.1) where Spark's shortest-repr rounding
    // and DuckDB's exact-binary rounding disagree
    ParityFunctions.duckRound(
      lit(0.4) * lenScore + lit(0.3) * stopScore + lit(0.3) * lenOk, 6)
  }

  /** Composite quality score straight from text (see qualityScoreOf). */
  def qualityScore(text: Column, stop: Seq[String]): Column =
    qualityScoreOf(tokens(text), stop)

  /** Polynomial rolling-hash document fingerprint over characters:
    * acc = (acc * 31 + codepoint) mod 1e9+7. Order-sensitive (a rolling
    * hash, not a bag hash) and expressible in ANSI SQL for the oracle.
    * Routes through the codegen'd `graft.expressions.RollingFingerprint`
    * — a single pass over the decoded string, versus the HOF
    * `aggregate(transform(split(text, "")))` formulation that allocates
    * one array element per character (~10× memory amplification on
    * large docs). Callers reach it through `tables.load`, which
    * installs the temp function. For pure whole-document identity
    * prefer `xxhash64`/`sha2` (dd01 pattern) — cheaper still.
    */
  def fingerprint(text: Column): Column =
    call_function("graft_fingerprint", text)

  /** Independent second rolling hash (base 131 mod 998244353) — paired
    * with [[fingerprint]] to widen hash-derived signatures past one
    * prime's ~30 bits (the 60-bit SimHash device; both halves stay
    * ANSI-SQL-reproducible for the oracle, unlike xxhash64). */
  def fingerprint2(text: Column): Column =
    call_function("graft_fingerprint2", text)

  /** Jaro-Winkler similarity of two strings — the codegen'd
    * `graft.expressions.JaroWinkler`, semantics pinned to DuckDB's
    * `jaro_winkler_similarity` (which is therefore its own oracle):
    * boost only past jaro 0.7, prefix capped at 4, zero-match → 0.0. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** Character n-gram shingles of the normalized text (distinct).
    * The dedup building block: MinHash/Jaccard run over these.
    */
  def charShingles(text: Column, n: Int): Column = {
    val norm = lower(text)
    // sequence(1, k) with k < 1 would count DOWN — guard short texts.
    when(length(norm) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), length(norm) - (n - 1)),
          i => substring(norm, i, lit(n)))))
  }

  /** Word n-grams over an ALREADY-MATERIALIZED token array column.
    * Callers should project `tokens(text)` into a real column first:
    * referencing the tokenize expression inside the transform lambda
    * would re-evaluate the whole split/filter per n-gram element
    * (O(tokens²) per document).
    */
  def wordNgramsOf(toks: Column, n: Int): Column =
    // native codegen'd one-pass expression; the composed HOF form
    // (`transform(sequence...)` + n element_at walks per gram) is its
    // interpreted reference, pinned equal in TextFunctionsSpec
    call_function("graft_word_ngrams", toks, lit(n))

  /** Word n-grams straight from text — convenience for one-shot use;
    * prefer projecting `tokens(text)` + `wordNgramsOf` in pipelines. */
  def wordNgrams(text: Column, n: Int): Column = wordNgramsOf(tokens(text), n)
}
