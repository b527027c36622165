package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Vectors
import graft.sources.Tables

/** Similarity search over embedding columns (array<float>[64]).
  *
  * Baseline: exact brute-force cosine top-k with a broadcast query
  * set — the corpus side streams, only k rows per query survive, so
  * the pattern holds at 100 TB (queries broadcast, corpus scanned
  * once, per-partition top-k before the final shuffle). Scale path:
  * random-hyperplane LSH bucketing bounds the candidate set.
  */
object Similarity {

  /** Exact cosine top-k for the query set vec_id < nQueries.
    * Similarities are rounded to 6 decimals BEFORE ranking so the
    * ordering is FP-stable and matches the sequential oracle;
    * ties break on neighbor_id.
    */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    annBruteForce(Tables.embeddings(spark, dir))

  def annBruteForce(e: DataFrame,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = broadcast(e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = e.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Vectors.cosine(col("qe"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs (cos >= tau, id_a < id_b).
    * All-pairs here (the exact oracle); the LSH variant below is the
    * sub-quadratic scale path.
    */
  def embeddingNearDupPairs(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(spark, dir))

  def embeddingNearDupPairs(emb: DataFrame,
      tau: Double = 0.45): DataFrame = {
    // Pre-compute each vector's norm once (not once per pair — that
    // would redo O(n) work n times under the all-pairs join).
    val e = emb
      .select(col("vec_id"), col("embedding"),
        Vectors.norm2(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(Vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= tau)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Random-hyperplane LSH bucketing: sign-bit sketch from h
    * deterministic pseudo-random hyperplanes (hash-derived, no RNG
    * state), then search only within buckets. Approximate — recall
    * is spec-tested against the brute-force baseline.
    */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame =
    annLshBuckets(Tables.embeddings(spark, dir))

  def annLshBuckets(e: DataFrame,
      planes: Int = 8): DataFrame = {
    // plane p, dim d coefficient: deterministic hash in [-1, 1)
    val sketch = transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(zip_with(col("embedding").cast("array<double>"),
        sequence(lit(0), size(col("embedding")) - 1).cast("array<double>"),
        (x, d) => x * (pmod(xxhash64(concat(p.cast("string"), lit(":"),
          d.cast("string"))), lit(2000001L)).cast("double") / 1000000.0
          - lit(1.0))),
        lit(0.0), (acc, v) => acc + v) > 0.0, 1).otherwise(0))
    e.select(col("vec_id"), col("label"),
      aggregate(sketch, lit(0), (acc, bit) => acc * 2 + bit).as("bucket"))
  }
}
