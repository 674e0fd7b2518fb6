package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (BASELINE.json north star; SURVEY §2.l). All built from codegen'd
  * `org.apache.spark.sql.functions` so they stay inside whole-stage codegen;
  * every function here has a 1:1 ANSI-SQL formulation used by the oracles.
  *
  * Fixed-point convention: ratio-valued scores are returned as integer
  * parts-per-thousand (`*_ppm`/`*_pm`) computed with integer division —
  * float rounding at engine boundaries can differ on exact half-way values,
  * integers cannot.
  */
object TextFunctions {

  /** Whitespace word count: number of single-space-separated tokens. */
  def wordCount(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** Token count with a BPE-ish regex: runs of lowercase letters, digits,
    * or single non-alphanumeric marks (mirrors a byte-level pre-tokenizer). */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"))

  /** Non-overlapping occurrences of `needle` — the classic
    * (len(s) - len(replace(s, needle, ''))) / len(needle) identity, exact
    * in any SQL dialect. */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), "")))
      / lit(needle.length)).cast("long")

  /** Tiny deterministic language-ID heuristic: score = stopword hits per
    * language over a fixed marker list; argmax with fixed tie order.
    * (A real n-gram model plugs into the same shape; the point is the
    * operator: per-language scoring + argmax, all codegen'd.) */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " de "),
    "fr" -> Seq(" le ", " les ", " des "),
  )

  def langScore(text: Column, lang: String): Column =
    langMarkers(lang).map(m => countOccurrences(text, m))
      .reduce(_ + _)

  /** Predicted language: argmax of langScore with deterministic tie-break
    * (first in de/en/es/fr order wins — matches the SQL CASE chain). */
  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scores = langs.map(l => langScore(text, l))
    val best = scores.reduce((a, b) => when(a >= b, a).otherwise(b))
    langs.zip(scores).foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Document quality score in parts-per-thousand: rewards mid-length
    * documents and word structure, penalizes non-letter density.
    * score_pm = min(1000, 200 + n_words + 10*avg_word_len - 2*n_punct),
    * floored at 0 — all integer arithmetic. The DuckDB oracle mirror is
    * `SparkEntry.qualityScoreSql` — any change here must land there too. */
  def qualityScore(text: Column): Column = {
    val nWords = wordCount(text)
    val nChars = length(text).cast("long")
    val nPunct = (nChars - length(regexp_replace(text, "[^a-z ]", "")).cast("long"))
    val avgWordLen = ((nChars - nWords + lit(1L)) / nWords).cast("long")
    greatest(lit(0L),
      least(lit(1000L), lit(200L) + nWords + lit(10L) * avgWordLen - lit(2L) * nPunct))
  }

  /** All character k-shingles of a document (with duplicates), lowercased.
    * Built with higher-order array functions (sequence → transform), no
    * UDF. Min-hashing is multiset-invariant, so the minhash path uses this
    * directly — `array_distinct` is O(n²) per document and only needed
    * where set semantics matter (use [[shingles]]). */
  def shinglesAll(text: Column, k: Int): Column = {
    val lower = org.apache.spark.sql.functions.lower(text)
    val last = length(lower) - lit(k - 1)
    // Guard: sequence(1, 0) steps DOWN ([1, 0]), it is not empty — a
    // text shorter than k must yield zero shingles, not two partials.
    // The outer when() preserves NULL-in → NULL-out (the short-text guard
    // alone would silently map NULL text to an empty array, changing the
    // contract for callers that distinguish the two).
    when(lower.isNotNull,
      transform(
        when(last >= 1, sequence(lit(1), last)).otherwise(array().cast("array<int>")),
        i => lower.substr(i, lit(k))))
  }

  /** Distinct character k-shingles — the unit set for exact Jaccard. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(shinglesAll(text, k))

  /** All word k-grams in order (space-joined), the decontamination /
    * repetition unit. Same guard discipline as [[shinglesAll]]: short
    * text yields an empty array, NULL stays NULL. */
  def wordGrams(text: Column, k: Int): Column = {
    val ws = split(text, " ")
    val last = size(ws) - lit(k - 1)
    when(text.isNotNull,
      transform(
        when(last >= 1, sequence(lit(1), last)).otherwise(array().cast("array<int>")),
        i => array_join(slice(ws, i, lit(k)), " ")))
  }
}
