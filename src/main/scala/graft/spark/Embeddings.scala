package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings` table:
  * vec_id long, embedding array<float>, label int — FIXTURES.md §3).
  *
  *   - [[bruteForceTopK]]: exact cosine top-k. The dot product stays in
  *     whole-stage codegen (`aggregate` + `zip_with` higher-order functions, no
  *     UDF) and the query vector is a folded literal; top-k is a single
  *     TakeOrderedAndProject, so the scan is one pass, no shuffle.
  *   - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — the scale path:
  *     candidates come from one bucket (multi-probe at scale), brute force runs
  *     only inside it. At 10^12 docs the bucket column is the partition key and
  *     the probe touches a few partitions instead of the corpus.
  */
object Embeddings {

  /** Cosine similarity column, pure higher-order functions (codegen-friendly). */
  def cosineCol(vec: org.apache.spark.sql.Column, q: Array[Float]): org.apache.spark.sql.Column = {
    val qLit = typedlit(q.toSeq)
    val dot = aggregate(zip_with(vec, qLit, (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val nv = sqrt(aggregate(vec, lit(0.0d), (acc, x) => acc + x * x))
    val nq = lit(math.sqrt(q.map(x => x.toDouble * x).sum))
    when(nv === 0.0 || nq === 0.0, 0.0).otherwise(dot / (nv * nq))
  }

  def bruteForceTopK(embeddings: DataFrame, q: Array[Float], k: Int): DataFrame =
    embeddings
      .select(col("vec_id"), cosineCol(col("embedding"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)

  /** Deterministic random-hyperplane bucket per vector. */
  def lshBuckets(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      Functions.embedLshUdf(col("embedding")).as("bucket"))

  /** ANN: restrict brute force to the query's LSH bucket. Falls back to the
    * full corpus when the bucket is empty (never returns fewer than available).
    */
  def lshTopK(embeddings: DataFrame, q: Array[Float], k: Int): DataFrame = {
    val qBucket = graft.kernel.TextStats.embeddingLshBucket(q)
    val candidates = embeddings
      .withColumn("bucket", Functions.embedLshUdf(col("embedding")))
      .filter(col("bucket") === qBucket)
    bruteForceTopK(candidates.drop("bucket"), q, k)
  }
}
