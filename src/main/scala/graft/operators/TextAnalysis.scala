package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table (SURVEY §2.l):
  * corpus statistics, token counting, quality scoring, language ID.
  * Everything is built from codegen'd built-ins (see TextFunctions) and
  * has an exact integer-arithmetic SQL oracle.
  */
object TextAnalysis {

  /** Corpus rollup per (lang, source): doc counts and integer-exact
    * word/token/quality sums. The group-by is the only shuffle. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("lang"), col("source"),
        wordCount(col("text")).as("n_words"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        qualityScore(col("text")).as("quality_pm"),
        col("n_chars"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("quality_pm")).as("sum_quality"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))

  /** Per-document token metrics + quality score (integer fixed-point). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        wordCount(col("text")).as("n_words"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_measured"),
        qualityScore(col("text")).as("quality_pm"))
      .orderBy(col("doc_id"))

  /** Language identification via the deterministic stopword-marker
    * heuristic; emits the per-language scores so the oracle can replay the
    * argmax exactly. */
  def languageId(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), col("lang").as("lang_claimed"),
        langId(col("text")).as("lang_pred"),
        langScore(col("text"), "de").as("score_de"),
        langScore(col("text"), "en").as("score_en"),
        langScore(col("text"), "es").as("score_es"),
        langScore(col("text"), "fr").as("score_fr"))
      .orderBy(col("doc_id"))
}
