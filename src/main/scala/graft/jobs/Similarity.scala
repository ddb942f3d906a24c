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

  /** Deterministic random hyperplanes (seeded), as literal nested arrays. */
  private def planes(dim: Int, numPlanes: Int): Array[Array[Double]] = {
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

  /** ANN top-k: candidates share the query's bucket or any 1-bit-flipped
    * bucket (multiprobe), exact cosine rank among candidates. Approximate;
    * the test suite measures recall vs [[bruteTopK]].
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
              numPlanes: Int = DefaultPlanes): DataFrame = {
    val docs = embeddings.withColumn("bucket", bucketOf(col("embedding"), dim, numPlanes))
    val probes = (0 until numPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))) :+ col("bucket")
    val qs = queries.withColumn("bucket", bucketOf(col("q_embedding"), dim, numPlanes))
      .withColumn("probe", explode(array(probes: _*)))
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

  /** Embedding-cosine near-duplicate pairs (cos >= threshold), exact values
    * on LSH-bucket candidates; pass bruteForce=true to generate candidates
    * by cross join (test oracle / small scale).
    */
  def cosinePairs(embeddings: DataFrame, thresholdX10000: Long, dim: Int,
                  bruteForce: Boolean = false, numPlanes: Int = DefaultPlanes): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val candidates =
      if (bruteForce) a.crossJoin(b).where(col("id_a") < col("id_b"))
      else {
        val withBucket = embeddings.withColumn("bucket", bucketOf(col("embedding"), dim, numPlanes))
        val l = withBucket.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
        val r = withBucket.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
        l.join(r, Seq("bucket")).where(col("id_a") < col("id_b")).drop("bucket").distinct()
      }
    candidates
      .withColumn("cos_x10000", floor(cosine(col("emb_a"), col("emb_b")) * 10000).cast("long"))
      .where(col("cos_x10000") >= thresholdX10000)
      .select("id_a", "id_b", "cos_x10000")
  }
}
