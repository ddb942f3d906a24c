package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  *
  *  - [[bruteTopK]] — exact cosine top-k: the baseline, and correct at any
  *    scale where |queries| is broadcastable (the doc side is never
  *    shuffled; one window per query partition).
  *  - [[lshTopK]] — random-hyperplane LSH buckets + multiprobe: the scale
  *    path. Buckets are a plain equi-join key, so the 100 TB version is a
  *    shuffle-on-bucket instead of |docs| x |queries| work.
  *  - [[cosinePairs]] — all near-dup pairs above a cosine threshold,
  *    candidates from shared LSH buckets (embedding-cosine near-dup).
  *
  * Cosine is computed in double with strict left-to-right accumulation
  * (functions.aggregate), making the value bit-reproducible and
  * replayable by the DuckDB oracle.
  */
object Similarity {

  /** dot(a, b) in double, sequential accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** embeddings: (vec_id, embedding). queries: (query_id, q_embedding).
    * Exact top-k neighbors per query by cosine desc (self-match excluded
    * when ids collide), ties broken on vec_id.
    */
  def bruteTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    embeddings.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_embedding")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Default plane count: tune so expected bucket occupancy ~ O(candidates
    * needed); at 10^12 docs, ~30 planes; tiny test corpora want 4-8.
    */
  val DefaultPlanes = 16

  /** Deterministic random hyperplanes (seeded), as literal nested arrays.
    * Public so the DuckDB oracle can interpolate the SAME plane literals
    * into SQL (shortest-repr Double rendering round-trips exactly).
    */
  def planes(dim: Int, numPlanes: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of an embedding under the hyperplane set. */
  def bucketOf(emb: Column, dim: Int, numPlanes: Int = DefaultPlanes): Column = {
    val ps = planes(dim, numPlanes)
    (0 until numPlanes).map { p =>
      val plane = lit(ps(p))
      val d = aggregate(zip_with(emb, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: candidates share the query's bucket or any bucket within
    * hamming distance `probeRadius` (multiprobe — O(numPlanes^radius)
    * probes per query; queries are broadcast so probe fan-out is free on
    * the doc side), exact cosine rank among candidates. Approximate; the
    * test suite asserts a >= 0.9 recall floor vs [[bruteTopK]] at the
    * DEFAULT radius (3 — measured 0.98 recall@5 on the test corpus;
    * radius 2 measured 0.76, below the quality bar for a default).
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
              numPlanes: Int = DefaultPlanes, probeRadius: Int = 3): DataFrame = {
    val docs = embeddings.withColumn("bucket", bucketOf(col("embedding"), dim, numPlanes))
    // all bit-flip masks of popcount <= probeRadius (recall/cost dial),
    // enumerated combinatorially so large plane counts stay cheap
    def combos(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until numPlanes).flatMap(p => combos(p + 1, left - 1).map(m => m | (1L << p)))
    val masks = (0 to probeRadius).flatMap(combos(0, _))
    val probes = masks.map(m => col("bucket").bitwiseXOR(lit(m)))
    val qs = queries.withColumn("bucket", bucketOf(col("q_embedding"), dim, numPlanes))
      .withColumn("probe", explode(array_distinct(array(probes: _*))))
      .drop("bucket")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    docs.join(broadcast(qs), docs("bucket") === qs("probe"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_embedding")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Codebook training sample: hash-mod thinning (xxhash64 spreads evenly
    * even when vec_ids are clustered) under a HARD row cap, so the driver
    * collect is O(maxTrainRows) regardless of corpus size — never a
    * corpus-proportional collect (a 10^9-vector corpus collects exactly
    * maxTrainRows rows, not 1/sampleEvery of everything).
    */
  def trainSample(embeddings: DataFrame, sampleEvery: Int, maxTrainRows: Int): Array[Array[Double]] =
    embeddings.where(xxhash64(col("vec_id")) % sampleEvery === 0)
      // orderBy(hash) + limit plans TakeOrdered (per-partition bounded
      // top-k, then one merge of <= maxTrainRows rows): the sample is
      // DETERMINISTIC at any parallelism/file order, not just capped
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(maxTrainRows)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .filter(v => v.exists(_ != 0.0))

  /** IVF (inverted-file) ANN top-k — the classic coarse-quantizer scale
    * path: a small spherical k-means codebook is trained DRIVER-SIDE on a
    * bounded deterministic sample ([[trainSample]] — hash-thinned and
    * hard-capped at `maxTrainRows`, Lloyd's iterations over normalized
    * vectors), every doc is assigned to its nearest centroid (`list` —
    * the inverted file key, a plain equi-join column), and each query
    * probes its `nProbe` closest centroids, ranking exact cosine among
    * those lists only. Work per query is proportional to the probed
    * lists' sizes, not |docs|; the shuffle key is `list`, so at 100 TB
    * this is one broadcast (queries) hash join over a clustered-by-list
    * layout, and the only driver-side state is <= maxTrainRows vectors.
    *
    * nProbe = nLists probes every list and is EXACT (equals
    * [[bruteTopK]] — every doc is in exactly one list) REGARDLESS of the
    * codebook, which is how the driver oracle checks it; smaller nProbe
    * trades recall for cost (ladder asserted in tests).
    */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nLists: Int = 16, nProbe: Int = 4, sampleEvery: Int = 7,
              iterations: Int = 10, maxTrainRows: Int = 100000): DataFrame = {
    // --- train the codebook on a bounded deterministic sample -----------
    val sample = trainSample(embeddings, sampleEvery, maxTrainRows)
    require(sample.length >= nLists, s"sample ${sample.length} < nLists $nLists")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    var centroids: Array[Array[Double]] = sample.take(nLists).map(normalize)
    val normSample = sample.map(normalize)
    for (_ <- 0 until iterations) {
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Int](nLists)
      normSample.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < nLists) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }.toArray
    }

    // --- assign docs to lists; queries to their nProbe closest lists ----
    // argmax over unit centroids needs no doc normalization:
    // argmax cos(v, c) = argmax dot(v, c-hat)
    def dotsOf(emb: Column) = array(centroids.map(c => dot(emb, lit(c))): _*)
    val docs = embeddings
      .withColumn("_d", dotsOf(col("embedding")))
      .withColumn("list", (array_position(col("_d"), array_max(col("_d"))) - 1).cast("int"))
      .drop("_d")
    val probeStructs = centroids.indices.map(i =>
      struct((-dot(col("q_embedding"), lit(centroids(i)))).as("negd"), lit(i).as("list")))
    val qProbes = queries
      .withColumn("p", explode(slice(array_sort(array(probeStructs: _*)), 1, nProbe)))
      .select(col("query_id"), col("q_embedding"), col("p.list").as("list"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    docs.join(broadcast(qProbes), Seq("list"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_embedding")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Embedding-cosine near-duplicate pairs (cos >= threshold).
    *
    * The scale path uses EXACT grid blocking — guaranteed to return the
    * same pairs as the cross join: for unit-normalized vectors,
    * cos(a,b) >= t implies ||a_hat - b_hat|| <= delta = sqrt(2-2t);
    * projecting onto a unit vector is 1-Lipschitz, so each of `numAxes`
    * fixed unit projections differs by <= delta too. Quantizing every
    * projection at cell width delta, a qualifying pair differs by at most
    * one cell per axis — so side A explodes to its 3^numAxes neighbor
    * cells, side B keys by its exact cell, and the shuffled equi-join is a
    * provable candidate superset (unlike sign-bit LSH, which drops pairs).
    * Exact cosine then filters. At 100 TB choose data-informed axes (top
    * PCA directions) so cells actually spread; random axes keep
    * correctness regardless.
    *
    * bruteForce=true keeps the cross-join candidate generator (test
    * oracle / tiny corpora).
    */
  def cosinePairs(embeddings: DataFrame, thresholdX10000: Long, dim: Int,
                  bruteForce: Boolean = false, numAxes: Int = 2): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val candidates =
      if (bruteForce) a.crossJoin(b).where(col("id_a") < col("id_b"))
      else {
        val t = thresholdX10000.toDouble / 10000.0
        val delta = math.sqrt(math.max(2.0 - 2.0 * t, 1e-12))
        val axes = planes(dim, numAxes).map { p =>
          val n = math.sqrt(p.map(x => x * x).sum); p.map(_ / n)
        }
        def cells(emb: Column): Seq[Column] = axes.toSeq.map { ax =>
          floor(dot(emb, lit(ax)) / (norm(emb) * delta)).cast("long")
        }
        val offsets = Seq(-1L, 0L, 1L)
        val probeCombos = (0 until numAxes).foldLeft(Seq(Seq.empty[Long])) { (acc, _) =>
          acc.flatMap(c => offsets.map(o => c :+ o))
        }
        val l = embeddings.select(
          col("vec_id").as("id_a"), col("embedding").as("emb_a"),
          explode(array(probeCombos.map { combo =>
            struct(cells(col("embedding")).zip(combo).zipWithIndex.map {
              case ((c, o), i) => (c + lit(o)).as(s"c$i")
            }: _*)
          }: _*)).as("gcell"))
        val r = embeddings.select(
          col("vec_id").as("id_b"), col("embedding").as("emb_b"),
          struct(cells(col("embedding")).zipWithIndex.map {
            case (c, i) => c.as(s"c$i")
          }: _*).as("gcell"))
        l.join(r, Seq("gcell")).where(col("id_a") < col("id_b")).drop("gcell")
      }
    candidates
      .withColumn("cos_x10000", floor(cosine(col("emb_a"), col("emb_b")) * 10000).cast("long"))
      .where(col("cos_x10000") >= thresholdX10000)
      .select("id_a", "id_b", "cos_x10000")
  }
}
