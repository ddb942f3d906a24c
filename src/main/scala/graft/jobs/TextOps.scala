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

  /** Lowercased alphanumeric tokens; NULL text tokenizes to an empty list
    * (the DuckDB oracles COALESCE the same way) so downstream size/gram
    * math never sees Spark's legacy size(NULL) = -1.
    */
  private def tokens(text: Column): Column =
    coalesce(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0),
      array().cast("array<string>"))

  /** Space-joined word n-grams of a token array. `sequence(a, b)` DESCENDS
    * when b < a, so sub-n-token docs are guarded to an empty gram list.
    */
  private def wordGrams(ts: Column, n: Int): Column =
    transform(
      when(size(ts) >= n, sequence(lit(0), size(ts) - n))
        .otherwise(array().cast("array<int>")),
      i => concat_ws(" ", slice(ts, i + 1, lit(n))))

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
    val toks = corpus.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = corpus.agg(count(lit(1)).cast("double").as("n_docs"))
    // r6: per-doc top-k via a BOUNDED typed aggregator instead of a
    // row_number window (guide §2.3 "aggregate before you shuffle"): the
    // window repartitioned the full scored TF table by doc_id and sorted
    // every partition; the aggregator's map-side combine cuts each doc to
    // <= k rows BEFORE the exchange, so the doc_id shuffle carries O(k)
    // rows per doc per map partition instead of the doc's whole
    // vocabulary. Order (score desc, term binary asc) and rank semantics
    // are the window's exactly — locked by the brute-equivalence test
    // and the q58 oracle.
    val topk = udaf(new TermTopKAgg(k),
      org.apache.spark.sql.Encoders.product[TfTerm])
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * round(log(col("n_docs") / col("df")) * 1000).cast("long"))
      .groupBy("doc_id")
      .agg(topk(col("term"), col("tf"), col("df"), col("score")).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.term").as("term"), col("col.tf").as("tf"),
        col("col.df").as("df"), col("col.score").as("score"))
  }

  final case class TfTerm(term: String, tf: Long, df: Long, score: Long)

  /** Bounded exact top-k over (term, tf, df, score), ordered by
    * (score desc, term UTF-8-binary asc — Spark's and DuckDB's string
    * order, matching the window ORDER BY it replaces; terms are unique
    * per doc so the order is total). Buffer IS the sorted top-k: O(k)
    * state per doc per task, map-side combined.
    */
  final class TermTopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[TfTerm, Seq[TfTerm], Seq[TfTerm]] {
    private def lt(a: TfTerm, b: TfTerm): Boolean =
      if (a.score != b.score) a.score > b.score
      else if (a.term == null) b.term != null
      else if (b.term == null) false
      else org.apache.spark.unsafe.types.UTF8String.fromString(a.term)
        .binaryCompare(org.apache.spark.unsafe.types.UTF8String.fromString(b.term)) < 0
    private def insert(buf: Seq[TfTerm], c: TfTerm): Seq[TfTerm] =
      if (buf.length >= k && !lt(c, buf.last)) buf
      else {
        val idx = buf.indexWhere(x => lt(c, x))
        val i = if (idx < 0) buf.length else idx
        (buf.take(i) :+ c) ++ buf.drop(i).take(k - i - 1)
      }
    override def zero: Seq[TfTerm] = Vector.empty
    override def reduce(buf: Seq[TfTerm], c: TfTerm): Seq[TfTerm] = insert(buf, c)
    override def merge(a: Seq[TfTerm], b: Seq[TfTerm]): Seq[TfTerm] = b.foldLeft(a)(insert)
    override def finish(r: Seq[TfTerm]): Seq[TfTerm] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[TfTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TfTerm]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[TfTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TfTerm]]()
  }

  /** BM25 retrieval: rank documents against a fixed query-term set with
    * the standard Okapi BM25+1 formula (k1 = 1.2, b = 0.75,
    * idf = ln((N - df + 0.5) / (df + 0.5) + 1) — always positive). Like
    * [[tfidfTop]], both factors are emitted as integer millis
    * (round(1000 * x)) before the product, so the score replays
    * hash-exact cross-engine: the double math inside each round is the
    * identical IEEE expression on both sides and the round boundary is
    * never within ulps of a reachable input at verify scale.
    *
    * Scale shape: tokens are FILTERED to the query terms before the
    * (doc, term) count, so the tf table is bounded by docs-matching-query,
    * not the corpus vocabulary; df aggregates that same small table; the
    * corpus-level N/avgdl pair is one row cross-joined broadcast. Doc
    * length comes from a codegen'd per-row expression on the same narrow
    * text scan — no second shuffle. The final top-k is orderBy+limit,
    * which Spark plans as TakeOrderedAndProject (per-partition heaps, no
    * global sort). Ties at the boundary break by doc_id, so the k rows
    * are deterministic.
    */
  def bm25Top(corpus: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25Top needs at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val docs = corpus.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idfMilli = round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1000)
      .cast("long")
    val tfnormMilli = round(lit(1000.0) * (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .cast("long")
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idfMilli * tfnormMilli)
      .groupBy("doc_id")
      .agg(sum(col("term_score")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Repetition-based quality scores (the Gopher/C4 family of filters):
    * duplicate word / 2-gram / 3-gram fractions per document, emitted as
    * floor-milli integers so the DuckDB oracle replays exactly. Highly
    * repetitive documents (boilerplate, keyword stuffing, decode garbage)
    * score high and get dropped by a threshold filter downstream.
    *
    * Pure per-row projection over builtin `transform`/`slice`/
    * `array_distinct` — whole-stage codegen, ZERO shuffles at any scale;
    * short docs (< n tokens) score 0 rather than dividing by zero.
    */
  def repetition(corpus: DataFrame): DataFrame = {
    def dupMilli(g: Column): Column =
      when(size(g) > 0,
        floor(lit(1000.0) * (size(g) - size(array_distinct(g))) / size(g)))
        .otherwise(lit(0))
        .cast("long")
    corpus
      .withColumn("t", tokens(col("text")))
      .withColumn("g2", wordGrams(col("t"), 2))
      .withColumn("g3", wordGrams(col("t"), 3))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        dupMilli(col("t")).as("dup_word_milli"),
        dupMilli(col("g2")).as("dup_2gram_milli"),
        dupMilli(col("g3")).as("dup_3gram_milli"))
  }

  /** Test-set decontamination: flag corpus documents that share any exact
    * word n-gram with a benchmark document set — the standard pre-training
    * hygiene pass (distinct from near-dup dedup: this is cross-set EXACT
    * n-gram containment, the criterion eval suites publish).
    *
    * `benchPred` selects the benchmark rows out of `docs` (in production
    * the benchmark suite is its own small table; the shape is identical).
    * Returns (doc_id, n_hits = distinct contaminated n-grams), benchmark
    * rows excluded, unordered (sort at the caller if dumping).
    *
    * Scale shape: the benchmark side is tiny (eval suites are KBs against
    * a 100 TB corpus), so the gram probe is `broadcast()` — the corpus
    * gram stream is filtered map-side, never shuffled at full width. The
    * plan is not exchange-free: the benchmark side is a second
    * (filter-pruned) scan plus its own small `distinct` exchange, and the
    * per-doc `countDistinct` plans as Spark's two-level distinct
    * aggregation — but everything that shuffles is post-broadcast-filter,
    * i.e. proportional to the CONTAMINATED gram count, not the corpus.
    * Gram explosion is `transform` over builtin `slice`/`concat_ws` —
    * whole-stage codegen, no UDF. At production scale hash each gram to
    * 16 bytes before broadcast (halves the broadcast and the probe
    * width); kept as raw strings here so the DuckDB oracle replays
    * byte-for-byte.
    */
  def contaminated(docs: DataFrame, benchPred: Column, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    // NULL-predicate rows are CORPUS rows (coalesce to false): without
    // this, a nullable benchPred silently dropped such rows from BOTH
    // sides (where(p) and where(!p) each filter NULL) — ADVICE r5
    val g = docs.select(col("doc_id"), tokens(col("text")).as("toks"),
      coalesce(benchPred, lit(false)).as("is_bench"))
      .select(col("doc_id"), col("is_bench"), explode(wordGrams(col("toks"), n)).as("gram"))
    val bench = g.where(col("is_bench")).select("gram").distinct()
    g.where(!col("is_bench"))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_hits"))
  }

  /** Fingerprints: order-sensitive rolling hash + winnowing min-shingle. */
  def fingerprints(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      gmFingerprint(col("text")).as("fp"),
      gmMinShingleFp(col("text")).as("min_shingle_fp"))
}
