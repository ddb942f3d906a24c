package graft.jobs

import graft.expr.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines: exact
  * (hash groupBy), word-n-gram Jaccard, MinHash+LSH banding, SimHash with
  * lossless chunk blocking, and embedding-cosine near-dup. Every method is
  * designed shuffle-light: one groupBy for exact, shared-shingle candidate
  * generation (never an all-pairs cross join) for the similarity methods.
  *
  * Corpus contract: (doc_id: bigint, text: string). The deterministic
  * test corpus ([[corpusWithDups]]) injects exact duplicates (id+1_000_000,
  * every 5th doc) and near duplicates (id+2_000_000, every 7th doc, one
  * appended token) so dedup behavior is oracle-checkable.
  */
object Dedup {

  /** documents.parquet + injected exact/near duplicates (SQL-replayable). */
  def corpusWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    d.unionByName(
        d.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(
        d.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" xtra token")).as("text")))
  }

  val OracleSqlCorpus: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL SELECT doc_id + 2000000, text || ' xtra token' FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  /** Exact dedup: md5(text) groups of size >= 2 with their canonical
    * (minimum) member. One map-side-combined groupBy; at 100 TB this is
    * the standard first pass and shuffles only (hash, id) pairs.
    */
  def exact(corpus: DataFrame): DataFrame =
    corpus
      .select(md5(col("text").cast("binary")).as("text_md5"), col("doc_id"))
      .groupBy("text_md5")
      .agg(count(lit(1)).as("n"), min("doc_id").as("canonical_id"))
      .where(col("n") >= 2)

  /** Distinct word trigrams of a text column (the shared shingle unit). */
  def shingles(text: Column): Column = {
    val words = split(text, " ")
    val grams = transform(sequence(lit(1), size(words) - 2), i =>
      concat_ws(" ", element_at(words, i), element_at(words, i + 1), element_at(words, i + 2)))
    when(size(words) >= 3, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Shingle document-frequency cap for candidate generation. A trigram
    * shared by more docs than this produces df^2/2 all-pairs candidates —
    * the classic quadratic blowup at 100 TB — so hot shingles switch from
    * ALL-PAIRS to ANCHOR-STAR generation: every doc sharing the hot
    * shingle pairs with the minimum doc_id among the shingle's docs *in
    * the doc's own shingle-set-size bucket* (O(df) pairs per shingle).
    * Jaccard itself is always computed on the full shingle sets.
    *
    * Why size buckets: Jaccard >= t forces |A|/|B| >= t, so near-dups
    * have near-equal shingle counts — anchoring within log2-size buckets
    * keeps a mass-duplicated boilerplate cluster connected through its
    * own members (a huge diverse doc that merely CONTAINS the boilerplate
    * lands in a different bucket and cannot become the cluster's anchor
    * and fail verification on its behalf). Because a qualifying pair CAN
    * straddle one log2 boundary (the ratio bound, not the bucket, is what
    * Jaccard guarantees), each bucket's anchor also stars into BOTH
    * adjacent buckets, bridging the boundary regardless of which side
    * the shingle is hot on.
    *
    * Semantics with the cap active: exact pair list for pairs sharing at
    * least one rare shingle; hot-shingle-only duplicates are recovered as
    * a verified anchor star per size bucket (+ the adjacent-bucket
    * bridge) — connected for the connected-component canonicalization
    * pass without the quadratic pair set. Corpora where even this
    * heuristic matters at scale should run [[minhashLsh]], whose per-doc
    * signatures are df-independent.
    */
  val DefaultMaxShingleDf = 10000

  /** Exact Jaccard computed ONLY for the given candidate (id_a, id_b)
    * pairs — cost proportional to |pairs|, not |collisions|^2. Joins the
    * pairs to the per-doc distinct-shingle arrays and intersects; equal to
    * the exploded groupBy-count formulation because [[shingles]] is
    * distinct.
    */
  def jaccardOnPairs(corpus: DataFrame, pairs: DataFrame, thresholdX10000: Long): DataFrame = {
    val sets = corpus.select(col("doc_id"), shingles(col("text")).as("sh_set"))
    pairs
      .join(sets.select(col("doc_id").as("id_a"), col("sh_set").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh_set").as("sh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jacc_x10000",
        floor(col("common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("common")).cast("double") * 10000).cast("long"))
      .where(col("jacc_x10000") >= thresholdX10000)
      .select("id_a", "id_b", "jacc_x10000")
  }

  /** n-gram Jaccard near-dup pairs (>= threshold): candidates from a
    * shared-shingle equi-join over DF-capped shingles (hot shingles
    * anti-joined away), then exact Jaccard
    * on the candidate pairs only. Cost proportional to capped collisions +
    * |candidates|, never |corpus|^2.
    */
  def ngramJaccard(corpus: DataFrame, thresholdX10000: Long,
                   maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    // size bucket: log2 of the doc's distinct-shingle count (Jaccard>=t
    // bounds the size ratio, so near-dups sit in the same/adjacent bucket)
    val sh = corpus
      .withColumn("szb", floor(log2(size(shingles(col("text"))) + 1)).cast("int"))
      .withColumn("sh", explode(shingles(col("text"))))
      .select(col("doc_id"), col("szb"), col("sh"))
    // hot (shingle, bucket) anchors stay DISTRIBUTED (|shingles|/maxDf is
    // data-dependent and can be 10^7+ at corpus scale — never a driver
    // collect and never a FORCED broadcast, which would re-materialize
    // that data-dependent size on the driver. localCheckpoint (eager),
    // not persist: the two joins below reuse the materialized blocks
    // without re-running the full explode+aggregate, AND the blocks are
    // ContextCleaner-managed (freed on GC) — a CacheManager persist with
    // no unpersist would leak session cache on every call. AQE picks
    // broadcast vs shuffle from the hot set's actual size.
    val hot = sh.groupBy("sh", "szb")
      .agg(count(lit(1)).as("df"), min("doc_id").as("anchor"))
      .where(col("df") > maxShingleDf)
      .select("sh", "szb", "anchor")
      .localCheckpoint(true)
    val capped = sh.join(hot.select("sh", "szb"), Seq("sh", "szb"), "left_anti")
    val a = capped.as("a"); val b = capped.as("b")
    val rarePairs = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    // anchor-star pairs per (hot shingle, size bucket): O(df) rows, keeps
    // the mass-dup cluster connected through one of ITS OWN members. Each
    // hot (sh, szb) anchor ALSO reaches docs in buckets szb±1..±maxShift:
    // Jaccard >= t only bounds the size RATIO (|A|/|B| <= 1/t), so a
    // genuine near-dup pair can sit up to ceil(log2(1/t)) log2-buckets
    // apart (1 bucket for t >= 0.5, more below), and the shared shingle
    // may be hot on EITHER side alone: a hot pile in the upper bucket
    // must still reach a rare-side near-dup in the lower bucket, and vice
    // versa — up-shift alone covers only half the straddle cases. least/
    // greatest keeps the (id_a < id_b) pair orientation for cross-bucket
    // anchors, whose doc_id need not exceed the other bucket's anchor.
    require(thresholdX10000 >= 1 && thresholdX10000 <= 10000,
      s"thresholdX10000 must be in [1, 10000]; got $thresholdX10000")
    val maxShift = math.max(1,
      math.ceil(math.log(10000.0 / thresholdX10000) / math.log(2.0)).toInt)
    val hotAdj = (-maxShift to maxShift).map(d => hot.withColumn("szb", col("szb") + d))
      .reduce(_ unionByName _)
    val anchorPairs = sh.join(hotAdj, Seq("sh", "szb"))
      .where(col("doc_id") =!= col("anchor"))
      .select(least(col("anchor"), col("doc_id")).as("id_a"),
        greatest(col("anchor"), col("doc_id")).as("id_b"))
    val candidates = rarePairs.unionByName(anchorPairs).distinct()
    jaccardOnPairs(corpus, candidates, thresholdX10000)
  }

  val NumHashes = 32
  val Bands = 8 // 4 rows per band

  /** The 60-bit hash family behind MinHash: one md5 per shingle yields
    * two independent 60-bit uniforms h1/h2 (hex prefix halves), and
    * h_k = h1 XOR rot_k(h2) derives the 32 functions with pure bit ops —
    * cheaper than 32 independent string hashes AND exactly replayable by
    * the DuckDB oracle (which has md5 but not Spark's xxhash64). 60 bits
    * (15 hex chars) keeps every value positive in a signed i64 on both
    * engines.
    */
  def md5Half(c: Column, firstHexChar: Int): Column =
    conv(substring(md5(c.cast("binary")), firstHexChar, 15), 16, 10).cast("long")

  /** rotate-left of a 60-bit value by k (0 <= k < 60), overflow-free:
    * low (60-k) bits shifted up, top k bits wrapped down.
    */
  def rot60(v: Column, k: Int): Column =
    if (k == 0) v
    else shiftleft(v.bitwiseAND(lit((1L << (60 - k)) - 1)), k)
      .bitwiseOR(shiftrightunsigned(v, 60 - k))

  /** MinHash signatures: h_k(sh) = h1(sh) XOR rot_k(h2(sh)), element-wise
    * min per doc in ONE groupBy pass (32 min aggregates over two md5
    * halves, no 32x row explosion).
    */
  def minhashSignatures(corpus: DataFrame): DataFrame = {
    val sh = corpus.withColumn("sh", explode(shingles(col("text"))))
      .select(col("doc_id"),
        md5Half(col("sh"), 1).as("h1"), md5Half(col("sh"), 17).as("h2"))
    val mins = (0 until NumHashes).map(k =>
      min(col("h1").bitwiseXOR(rot60(col("h2"), k))).as(s"mh$k"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: candidate pairs sharing at least one band bucket, then
    * verified against true n-gram Jaccard (>= thresholdX10000). Output is a
    * strict subset of [[ngramJaccard]] with LSH-probabilistic recall; the
    * test suite asserts all injected near-dups are recovered.
    */
  def minhashLsh(corpus: DataFrame, thresholdX10000: Long): DataFrame = {
    val sig = minhashSignatures(corpus)
    val rowsPerBand = NumHashes / Bands
    val bandStructs = (0 until Bands).map { bnd =>
      val cols = (bnd * rowsPerBand until (bnd + 1) * rowsPerBand).map(k => col(s"mh$k"))
      // band bucket = md5 of the comma-joined row values (decimal
      // rendering is identical in Spark and DuckDB, so the oracle
      // reproduces the buckets bit-for-bit)
      struct(lit(bnd).as("band"), md5Half(concat_ws(",", cols: _*), 1).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = buckets.as("a"); val b = buckets.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verify ONLY the candidate pairs against the exact measure (join the
    // pairs to per-doc shingle sets) — cost proportional to |candidates|.
    // Never recompute the full shared-shingle pairwise join here: that
    // would pay exactly the all-collisions cost LSH exists to avoid.
    jaccardOnPairs(corpus, candidates, thresholdX10000)
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<= 3):
    * blocking on the four 16-bit chunks is lossless for hamming <= 3
    * (pigeonhole), so this equals the brute-force hamming join.
    *
    * Candidate generation runs over DISTINCT sim values, not docs: a pile
    * of identical-hash docs (the round-2 "residual hot-chunk quadratic" —
    * e.g. every near-empty doc hashing to the same value) contributes ONE
    * representative to the chunk-blocked join instead of df^2 collision
    * rows. Doc pairs are then reconstructed exactly: cross-value pairs by
    * expanding each qualifying (sim_a < sim_b) value pair to its members,
    * within-value pairs (hamming 0) by a plain equi-self-join on sim —
    * both proportional to TRUE output size, which is the semantic floor.
    */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "chunk blocking is lossless only for hamming <= 3")
    val sims = corpus.select(col("doc_id"), gmSimhash(split(col("text"), " ")).as("sim"))
    val uniq = sims.select("sim").distinct()
    val chunked = uniq.select(col("sim"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), shiftrightunsigned(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("cc"))
      .select(col("sim"), col("cc.c").as("c"), col("cc.chunk").as("chunk"))
    val a = chunked.as("a"); val b = chunked.as("b")
    val simPairs = a.join(b, col("a.c") === col("b.c") && col("a.chunk") === col("b.chunk") &&
        col("a.sim") < col("b.sim"))
      .select(col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
    val cross = simPairs
      .join(sims.select(col("sim").as("sim_a"), col("doc_id").as("da")), Seq("sim_a"))
      .join(sims.select(col("sim").as("sim_b"), col("doc_id").as("db")), Seq("sim_b"))
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("hamming"))
    val x = sims.as("x"); val y = sims.as("y")
    val within = x.join(y, col("x.sim") === col("y.sim") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0).as("hamming"))
    cross.unionByName(within)
  }

  /** Near-dup CLUSTERING: connected components over candidate pairs
    * (from [[ngramJaccard]], [[minhashLsh]] or [[simhashPairs]]) plus a
    * canonical pick — the pipeline stage that turns pairwise dup evidence
    * into "keep this doc, drop those". Iterative min-label propagation
    * with POINTER JUMPING (each round a vertex also adopts its label's
    * own label), so convergence is O(log diameter) distributed joins
    * instead of O(diameter) — dup chains (A~B~C~... from near-dup drift)
    * do not serialize the job. Each round is two shuffles on the vertex
    * id; intermediates are `localCheckpoint`ed (lineage cut,
    * ContextCleaner-managed) so the loop's plan never grows. Singletons
    * keep their own id; `is_canonical` marks the component minimum — the
    * deterministic survivor regardless of algorithm or partitioning.
    */
  /** Lineage cut cadence: with a RELIABLE checkpoint dir configured on the
    * SparkContext, every k-th round (and the loop-invariant edge set)
    * checkpoints to that directory instead of executor-local storage —
    * `localCheckpoint` cuts lineage into executor blocks, so on a real
    * cluster losing ONE executor mid-loop made the labels RDD
    * unrecoverable and failed the whole job (at 100 TB the loop runs
    * ~10+ rounds over billions of dup vertices; executor loss is
    * routine). Intermediate rounds keep the cheap local cut: a loss
    * then replays at most k-1 rounds from the last reliable snapshot.
    * Without a checkpoint dir the r5 behavior is unchanged.
    */
  val ReliableEvery = 5

  def cluster(pairs: DataFrame, corpus: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    def cutEdges(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    def cutRound(df: DataFrame, round: Int): DataFrame =
      if (reliable && round % ReliableEvery == ReliableEvery - 1) df.checkpoint(true)
      else df.localCheckpoint(true)
    val half = pairs.select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
    val edges = cutEdges(half.union(half.select(col("b").as("a"), col("a").as("b"))))
    // iterate ONLY over pair-touched vertices — near-dup pairs are a tiny
    // fraction of the corpus, and shuffling every document through every
    // propagation round would make the loop O(rounds x corpus) instead of
    // O(rounds x dup-vertices). Untouched docs join in once at the end as
    // their own singletons.
    var labels = edges.select(col("a").as("v"))
      .distinct().withColumn("label", col("v")).localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged) {
      require(round < maxRounds, s"cluster did not converge in $maxRounds rounds " +
        "(component diameter over 2^rounds — raise maxRounds)")
      val nbrMin = edges
        .join(labels.select(col("v").as("b"), col("label").as("nl")), "b")
        .groupBy("a").agg(min("nl").as("nmin"))
        .withColumnRenamed("a", "v")
      val stepped = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val jumped = stepped.as("x")
        .join(stepped.select(col("v").as("lv"), col("label").as("ll")).as("p"),
          col("x.label") === col("lv"), "left")
        .select(col("x.v").as("v"),
          least(col("x.label"), coalesce(col("ll"), col("x.label"))).as("label"))
      val cut = cutRound(jumped, round)
      converged = cut.join(labels.withColumnRenamed("label", "old"), "v")
        .where(col("label") =!= col("old")).isEmpty
      labels = cut
      round += 1
    }
    corpus.select(col("doc_id").cast("long").as("doc_id")).distinct()
      .join(labels.withColumnRenamed("v", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"),
        (col("doc_id") === coalesce(col("label"), col("doc_id"))).as("is_canonical"))
  }

  /** Brute-force hamming join (test oracle for [[simhashPairs]]). */
  def simhashBrute(corpus: DataFrame, maxHamming: Int): DataFrame = {
    val sims = corpus.select(col("doc_id"), gmSimhash(split(col("text"), " ")).as("sim"))
    val a = sims.as("a"); val b = sims.as("b")
    a.crossJoin(b).where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", bit_count(col("a.sim").bitwiseXOR(col("b.sim"))))
      .where(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("hamming"))
  }
}
