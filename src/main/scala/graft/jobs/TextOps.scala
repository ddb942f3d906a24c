package graft.jobs

import graft.expr.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language-ID heuristic, document fingerprinting. All scores
  * that feed oracle checks are emitted as scaled integers (floor(x *
  * 10^k)) — cross-engine float formatting never enters the comparison.
  */
object TextOps {

  private def words(text: Column): Column = split(text, " ")

  /** Per-doc stats: token count (whitespace + regex token variants),
    * char count, distinct-token ratio and mean token length (scaled ints),
    * stopword ratio.
    */
  def stats(corpus: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nTok = size(w)
    val nChars = length(col("text"))
    val stop = filter(w, t => t === "the" || t === "a" || t === "of")
    corpus.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      size(split(col("text"), "[^a-zA-Z0-9]+")).cast("long").as("n_tokens_re"),
      nChars.cast("long").as("n_chars"),
      size(array_distinct(w)).cast("long").as("n_distinct"),
      floor(size(array_distinct(w)).cast("double") / nTok.cast("double") * 10000).cast("long")
        .as("distinct_ratio_x10000"),
      floor(nChars.cast("double") / nTok.cast("double") * 100).cast("long")
        .as("mean_tok_len_x100"),
      floor(size(stop).cast("double") / nTok.cast("double") * 10000).cast("long")
        .as("stopword_ratio_x10000"))
  }

  /** Language-ID heuristic: marker-stopword presence, checked in a fixed
    * priority order (a real n-gram profile model would slot in here; the
    * classifier itself is deliberately simple and fully oracle-replayable).
    */
  def langId(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      when(col("text").like("% the %") || col("text").like("the %"), "en")
        .when(col("text").like("% le %") || col("text").like("% la %"), "fr")
        .when(col("text").like("% der %") || col("text").like("% und %"), "de")
        .when(col("text").like("% el %") || col("text").like("% los %"), "es")
        .otherwise("und").as("lang_pred"))

  /** Fingerprints: order-sensitive rolling hash + winnowing min-shingle. */
  def fingerprints(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      gmFingerprint(col("text")).as("fp"),
      gmMinShingleFp(col("text")).as("min_shingle_fp"))
}
