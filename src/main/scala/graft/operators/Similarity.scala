package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`), SURVEY.md §2.6.
  *
  * Scale design: the query set is small and **broadcast**; the corpus streams
  * partition-parallel. Brute force is the exact baseline; [[lshTopK]] is the
  * 100-TB path — random-hyperplane buckets bound the per-query candidate set,
  * trading recall for a ~(#buckets) reduction in dot products. Both share the
  * same ordered-double cosine kernel so results are deterministic.
  */
object Similarity {

  /** Cosine similarity of two equal-length double arrays, summed in element
    * order (deterministic + engine-portable: DuckDB's list_dot_product
    * produces the identical IEEE sequence). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. Broadcast-join (queries are tiny), then per-query
    * window top-k; ranking uses the rounded score + id tie-break so the
    * result is stable across engines and partitionings. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Exact near-dup pairs: all pairs with cosine ≥ threshold (test-scale
    * ground truth; at scale run it over LSH bucket candidates instead). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("vec_a"), asDouble(col(vecCol)).as("va"))
    val r = df.select(col(idCol).as("vec_b"), asDouble(col(vecCol)).as("vb"))
    l.crossJoin(r)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
  }

  /** Sign-bucket LSH: bucket id = sign bits of the first `planes` components
    * (a fixed, data-independent hyperplane set — deterministic and cheap;
    * production would rotate with seeded random planes, same plan shape).
    * Candidates = corpus rows in the query's bucket; then exact cosine +
    * top-k within the bucket. Approximate: recall < 1, cost ÷ 2^planes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4): DataFrame = {
    def bucket(v: Column): Column =
      (0 until planes).map { i =>
        when(get(v, lit(i)) >= 0, lit(1L << i)).otherwise(lit(0L)): Column
      }.reduce(_ + _)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", bucket(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", bucket(col("cv")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }
}
