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

  /** TF-IDF distinctive terms: lowercase alnum tokens, per-(doc, term)
    * TF, per-term DF, integer `idf_milli = round(1000 * ln(N / df))`
    * (integer-safe cross-engine: the round boundary is never within 8e-6
    * of any reachable N/df at verify scale, vs ~1e-13 double ulp error),
    * `score = tf * idf_milli`, top-k terms per doc by (score desc, term).
    *
    * Scale shape: one explode -> map-side-combined (doc, term) count ->
    * map-side-combined term count (the DF table is vocabulary-sized, far
    * smaller than the corpus) -> equi-join TF x DF on term (Catalyst/AQE
    * picks broadcast while the vocabulary fits, shuffle-hash past it; no
    * hint so the 100 TB plan degrades gracefully) -> corpus count joined
    * as a broadcast single row -> per-doc window top-k (bounded state).
    * The corpus is scanned once for tokens and once for N — N comes from
    * the same narrow scan Catalyst prunes to zero data columns.
    */
  def tfidfTop(corpus: DataFrame, k: Int): DataFrame = {
    val toks = corpus.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "[^a-z0-9]+"), t => length(t) > 0)).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = corpus.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * round(log(col("n_docs") / col("df")) * 1000).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }

  /** Fingerprints: order-sensitive rolling hash + winnowing min-shingle. */
  def fingerprints(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      gmFingerprint(col("text")).as("fp"),
      gmMinShingleFp(col("text")).as("min_shingle_fp"))
}
